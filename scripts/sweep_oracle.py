"""Full differential oracle sweep at an arbitrary scale factor.

The pytest suite pins sf0.01 (the driver's gate); this script re-runs
every oracle-checked query at another SF — the build-notes invariant is
that the sweep also passes at sf0.1 whenever rounding/ordering logic
changes (tie behavior only shows up when a rounding boundary lands on
real data, which is SF-dependent).

Run: python scripts/sweep_oracle.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from debezium_incubator_spark.registry import all_oracles, all_queries  # noqa: E402
from debezium_incubator_spark.session import get_spark  # noqa: E402
from tests.compare import assert_frames_match  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = all_queries(), all_oracles()
    failed = []
    for name in sorted(oracles):
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            oracle_pdf = con.execute(oracles[name]).df()
            assert_frames_match(spark_pdf, oracle_pdf, name)
            print(f"ok   {name}")
        except Exception:
            failed.append(name)
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} passed at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
