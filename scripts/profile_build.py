"""Profile driver-side plan-BUILD cost for named queries (r13 verdict #1).

For each query: build the plan N times in one warm JVM/process, timing
each build (the first build pays any per-process memo fills; later
builds show the steady per-invocation cost a caller sees), and
optionally cProfile one build to attribute the time (py4j round trips
show up as socket recv; analysis shows up inside py4j-called methods).

Usage: python scripts/profile_build.py q1 q2 ... [--n=3] [--cprofile]
Run idle (CLAUDE.md probe protocol).
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_incubator_spark.registry import all_queries  # noqa: E402
from debezium_incubator_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = list(sys.argv[1:])
    n = 3
    do_prof = False
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in list(args):
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
            args.remove(a)
        elif a == "--cprofile":
            do_prof = True
            args.remove(a)
    spark = get_spark("profile_build")
    queries = all_queries()
    # warm the session: one trivial plan so the first target doesn't
    # absorb catalyst/codegen class-loading
    spark.range(1).selectExpr("id + 1 as x").write.format("noop").mode("overwrite").save()
    for name in args:
        fn = queries[name]
        times = []
        for i in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: builds {times}")
        if do_prof:
            pr = cProfile.Profile()
            pr.enable()
            fn(spark, sf_dir)
            pr.disable()
            buf = io.StringIO()
            pstats.Stats(pr, stream=buf).sort_stats("cumulative").print_stats(25)
            print(buf.getvalue())
        del df
    return 0


if __name__ == "__main__":
    sys.exit(main())
