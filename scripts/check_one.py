"""Verify a subset of oracled queries at one or more scale factors.

Run: python scripts/check_one.py KEY [KEY...] [--sf DIR ...]
Defaults to all three driver SFs. Exits nonzero on any mismatch.
"""

from __future__ import annotations

import argparse
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

DEFAULT_SFS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def main() -> int:
    # argparse (r10 ADVICE): a trailing --sf without a value and an
    # unknown KEY both fail with a clear message, not a traceback.
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("keys", nargs="+", metavar="KEY")
    ap.add_argument("--sf", action="append", dest="sfs", metavar="DIR")
    ns = ap.parse_args()
    keys, sfs = ns.keys, ns.sfs or list(DEFAULT_SFS)
    queries, oracles = all_queries(), all_oracles()
    unknown = [k for k in keys if k not in queries]
    if unknown:
        ap.error(f"no such query: {', '.join(unknown)}")
    spark = get_spark("check-one")
    failed = []
    for sf_dir in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in keys:
            try:
                spark_pdf = queries[name](spark, sf_dir).toPandas()
                if name in oracles:
                    oracle_pdf = con.execute(oracles[name]).df()
                    assert_frames_match(spark_pdf, oracle_pdf, name)
                    print(f"ok   {name} @ {sf_dir} ({len(spark_pdf)} rows)")
                else:
                    print(f"rows {name} @ {sf_dir} ({len(spark_pdf)} rows)")
            except Exception:
                failed.append((name, sf_dir))
                print(f"FAIL {name} @ {sf_dir}")
                traceback.print_exc(limit=5)
        con.close()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
