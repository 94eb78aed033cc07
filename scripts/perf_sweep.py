"""Round-13 optimization measurement sweep (guide §1: measure first).

For EVERY registered query at $SPARK_GRAFT_SF_DIR (default sf0.1):
  - build the plan (timed: py4j plan construction + analysis)
  - run it to the noop sink twice (guide §1.4 — computes every column of
    every row, no result fetch): first run includes codegen/warm-up,
    second run is the steady-state engine time
  - capture ``explain('formatted')`` and extract plan-shape stats:
    Exchange count, join strategies, BatchEvalPython/ArrowEvalPython
    nodes, CartesianProduct/BroadcastNestedLoopJoin, whether parquet
    scans carry PushedFilters.

Writes PERF_SWEEP_r13.json (list of per-query dicts, sorted by warm
noop time descending) — the ranked hotspot list this optimization round
works from.

Run idle (never concurrently with another Spark job — CLAUDE.md probe
protocol).  Usage: python scripts/perf_sweep.py [sf_dir] [--only=a,b,c]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_incubator_spark.registry import all_queries  # noqa: E402
from debezium_incubator_spark.session import get_spark  # noqa: E402


def plan_stats(df) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    stats = {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", txt)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", txt)),
        "py_eval": len(re.findall(r"\b(?:Batch|Arrow)EvalPython\b", txt)),
        "map_in_py": len(re.findall(r"\b(?:MapInPandas|PythonMapInArrow|FlatMapGroupsInPandas|MapInArrow)\b", txt)),
        "sorts": len(re.findall(r"^\s*\(\d+\) Sort\b", txt, re.M)),
        "window": len(re.findall(r"\bWindow\b", txt)),
        "scans_with_pushed": len(re.findall(r"PushedFilters: \[[^\]]", txt)),
        "scans": len(re.findall(r"Scan parquet", txt)),
    }
    return stats


def main() -> int:
    args = [a for a in sys.argv[1:]]
    only = None
    for a in list(args):
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("perf_sweep_r13")
    queries = all_queries()
    names = [n for n in queries if only is None or n in only]
    out = []
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"perf_sweep: {name}")
        rec: dict = {"name": name}
        try:
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            rec["build_sec"] = round(time.perf_counter() - t0, 4)
            rec.update(plan_stats(df))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            rec["noop_first_sec"] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            rec["noop_warm_sec"] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        out.append(rec)
        print(
            f"[{i + 1}/{len(names)}] {name}: "
            f"build={rec.get('build_sec', '-')} first={rec.get('noop_first_sec', '-')} "
            f"warm={rec.get('noop_warm_sec', '-')} ex={rec.get('exchanges', '-')}"
            + (f" ERR={rec['err']}" if "err" in rec else ""),
            flush=True,
        )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PERF_SWEEP_r13.json")
    if only is not None and os.path.exists(path):
        # --only MERGES into the existing artifact (re-measured rows
        # replace their old entries; the full sweep is never clobbered)
        old = json.load(open(path))["rows"]
        merged = {r["name"]: r for r in old}
        merged.update({r["name"]: r for r in out})
        out = list(merged.values())
    out.sort(key=lambda r: r.get("noop_warm_sec", 0.0), reverse=True)
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "rows": out}, f, indent=1)
    print(f"wrote {path} ({len(out)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
