"""Full-registry optimization measurement sweep (guide §1: measure first).

Round-14 protocol (one honest protocol — the r13 verdict's what's-wrong
#2): for EVERY registered query at $SPARK_GRAFT_SF_DIR (default sf0.1):
  - build the plan (timed: py4j plan construction + analysis; for the
    trainer/ANN queries this also includes their by-construction
    driver-paced build actions)
  - run it to the noop sink (guide §1.4 — computes every column of
    every row, no result fetch) FOUR times: the first run includes
    codegen/warm-up; ``noop_warm_sec`` is the MIN of the three
    subsequent runs (a 2-run protocol over-reports steady state for
    giant generated agg methods that need ~2 runs of C2 warmup — the
    dedup_minhash_prod finding), and ``noop_runs`` keeps all four.
  - ``fresh_sec`` = build + first action: the honest PER-INVOCATION
    cost.  For checkpoint-bearing queries the warm number measures only
    post-checkpoint work (AQE finalizes lazy localCheckpoints at call
    time), so fresh_sec is the number to compare across rounds for
    those.
  - capture ``explain('formatted')`` and extract plan-shape stats:
    Exchange count, join strategies, BatchEvalPython/ArrowEvalPython
    nodes, CartesianProduct/BroadcastNestedLoopJoin, whether parquet
    scans carry PushedFilters.

Writes PERF_SWEEP_r14.json by default (``--out=NAME`` to redirect, e.g.
the round-start snapshot PERF_SWEEP_r14_before.json — plan-stat fields
are emitted on every run so the before/after plan-shape diff stays
machine-checkable; never overwrite the before file).

Run idle (never concurrently with another Spark job — CLAUDE.md probe
protocol).  Usage:
  python scripts/perf_sweep.py [sf_dir] [--only=a,b,c] [--out=FILE.json]
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
    out_name = "PERF_SWEEP_r14.json"
    for a in list(args):
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
            args.remove(a)
        elif a.startswith("--out="):
            out_name = a.split("=", 1)[1]
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("perf_sweep_r14")
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
            runs = []
            for _ in range(4):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 4))
            rec["noop_first_sec"] = runs[0]
            rec["noop_warm_sec"] = min(runs[1:])
            rec["noop_runs"] = runs
            rec["fresh_sec"] = round(rec["build_sec"] + runs[0], 4)
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
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), out_name)
    if only is not None and os.path.exists(path):
        # --only MERGES into the existing artifact (re-measured rows
        # replace their old entries; the full sweep is never clobbered)
        old = json.load(open(path))["rows"]
        merged = {r["name"]: r for r in old}
        merged.update({r["name"]: r for r in out})
        out = list(merged.values())
    out.sort(key=lambda r: r.get("noop_warm_sec", 0.0), reverse=True)
    protocol = (
        "r14: build_sec = plan build (py4j + analysis + any by-construction "
        "driver-paced build actions); noop_runs = 4 noop-sink executions; "
        "noop_warm_sec = min(runs[1:]); fresh_sec = build + first run = the "
        "honest per-invocation cost (for checkpoint-bearing queries the warm "
        "number measures only post-checkpoint work)"
    )
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "protocol": protocol, "rows": out}, f, indent=1)
    print(f"wrote {path} ({len(out)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
