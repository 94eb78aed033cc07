"""Driver-window simulation: exactly what the grading driver does —
import __spark_entry__ under a PLAIN SparkSession (no engine configs;
catches worker-import and runtime-conf regressions), run the first 50
registered queries at sf0.01 next to their DuckDB oracles, and
strict-compare (tests/compare.py: per-column dtype-class assertion,
exact float equality, −0.0 ≠ 0.0).

ALWAYS run from a cwd OUTSIDE the repo (pytest's repo cwd masks
worker-import failures — .claude/skills/verify/SKILL.md): the script
re-executes itself from /tmp if started inside the repo.

Usage: python scripts/window_sim.py [--sf DIR] [--n N]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50,
                    help="audited window size (first N registered keys)")
    ns = ap.parse_args()

    cwd = os.path.realpath(os.getcwd())
    if cwd == os.path.realpath(REPO) or cwd.startswith(
        os.path.realpath(REPO) + os.sep
    ):
        # re-exec from /tmp so the repo cwd can't mask import issues
        return subprocess.call(
            [sys.executable, os.path.abspath(__file__),
             "--sf", ns.sf, "--n", str(ns.n)],
            cwd="/tmp",
        )

    sys.path.insert(0, REPO)
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # plain!
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E  # noqa: E402
    from tests.compare import assert_frames_match  # noqa: E402

    entry_rows = len(E.entry(spark).collect())
    print(f"entry rows: {entry_rows}")
    assert entry_rows >= 0

    Q, O = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{ns.sf}/{t}.parquet')"
        )
    keys = list(Q)[:ns.n]
    t0 = time.time()
    bad = []
    for name in keys:
        try:
            s = Q[name](spark, ns.sf).toPandas()
            o = con.execute(O[name]).df()
            assert_frames_match(s, o, name)
        except Exception as ex:  # noqa: BLE001 — report, keep going
            bad.append(name)
            print(f"FAIL {name}: {str(ex)[:300]}")
    print(
        f"window sim: {len(keys) - len(bad)}/{len(keys)} green "
        f"in {time.time() - t0:.0f}s at {ns.sf}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
