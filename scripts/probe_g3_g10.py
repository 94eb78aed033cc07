"""Round-8 (r7 verdict #8): the THIRD scale decade — probe the five
heaviest queries at the g3→g10 pair (g10 = 100× the driver's sf0.1
recipe), turning the "flat at 3×" claims into measured behavior at
10× more data than any prior probe. Writes SCALEPROBE_g3_g10.json.

Generate the fixture first (~2.5 GB, deterministic):
    python scripts/gen_scale_fixture.py .scaleprobe/g10 10

Reuses scale_probe.run_suite (same protocol: cached tables, fresh plan
per sample, 1 discarded warm run, min of 2, engine defaults / AQE on).
`semdedup_scaled` follows the production nlist ∝ n rule (k-means build
included); `s1_cosine_topk` is the labeled quadratic baseline — its
exponent is expected ~2 BY SPEC, everything else must stay ~1 or below.
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scale_probe import run_suite  # noqa: E402

from debezium_incubator_spark.registry import all_queries  # noqa: E402
from debezium_incubator_spark.session import get_spark  # noqa: E402

#: the five heaviest audited paths (r7 verdict #8's list)
ONLY = [
    "s1_cosine_topk",        # exact all-pairs blocked gemm (quadratic BY SPEC)
    "t25_substring_dedup",
    "semdedup_scaled",       # dedup_semantic's production-rule spelling
    "cdc_cassandra_cell_lww",
    "t32_bm25_topk",
]

QUADRATIC = {"s1_cosine_topk"}


def main() -> None:
    only = ONLY
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    g3 = os.path.join(REPO, ".scaleprobe", "g3")
    g10 = os.path.join(REPO, ".scaleprobe", "g10")
    if not os.path.isdir(g10):
        raise SystemExit(
            "g10 fixture missing — run: "
            "python scripts/gen_scale_fixture.py .scaleprobe/g10 10"
        )
    spark = get_spark("scaleprobe-g10")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    print("== g3", flush=True)
    t3 = run_suite(spark, g3, queries, only)
    print("== g10", flush=True)
    t10 = run_suite(spark, g10, queries, only)
    out_path = os.path.join(REPO, "SCALEPROBE_g3_g10.json")
    result = {
        "metric": "scale_probe_g3_g10",
        "scales": {"g3": g3, "g10": g10},
        "protocol": (
            "cached tables, fresh plan per sample (no stage reuse), "
            "1 discarded warm run, min of 2, engine defaults (AQE on); "
            "ratio is over 10/3 = 3.33x data"
        ),
        "queries": {},
        "linear_violations_ratio_ge_15": [],
    }
    if os.path.exists(out_path):
        with open(out_path) as f:
            result = json.load(f)
    violations = list(result.get("linear_violations_ratio_ge_15", []))
    for name in only:
        ratio = t10[name] / t3[name]
        result["queries"][name] = {
            "t_g3_sec": round(t3[name], 4),
            "t_g10_sec": round(t10[name], 4),
            "ratio_3.33x_data": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(10 / 3), 3),
            "tier": "quadratic-baseline" if name in QUADRATIC else "linear",
        }
        if name not in QUADRATIC and ratio >= 15:
            violations.append(name)
    result["linear_violations_ratio_ge_15"] = sorted(set(violations))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if violations:
        raise SystemExit(f"super-linear blowup in: {violations}")


if __name__ == "__main__":
    main()
