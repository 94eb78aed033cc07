"""Empirical scale probe (round-3 verdict item 1): run the headline +
dedup/ANN/clustering tier at TWO scale factors generated from the same
recipe (scripts/gen_scale_fixture.py: g0.1 ~= the driver's sf0.1 sizes,
g1 = 10x) and measure the wall-time scaling exponent per query.

exponent = log(t_g1 / t_g0.1) / log(10)
  ~0   -> overhead-floor (fixed per-query cost dominates at both sizes)
  ~1   -> linear in data (what every bucketed path must be)
  ~2   -> quadratic (only the explicitly-labeled all-pairs baseline may
          show this; s1's blocked gemm is O(n^2 d) BY SPEC)

Protocol: engine defaults (AQE on — this is throughput, not the frozen
ms-scale bench profile), tables cached + counted before timing, 1
warm-up run per query (plan compile + codegen), then median of 3 timed
runs with full materialization. Writes SCALEPROBE.json at the repo
root; SCALEPROBE.md narrates the result.

Usage: python scripts/scale_probe.py [g0.1_dir g1_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from debezium_incubator_spark.catalog import TABLES, table  # noqa: E402
from debezium_incubator_spark.registry import all_queries  # noqa: E402
from debezium_incubator_spark.session import get_spark  # noqa: E402

# Linear tier: every one of these must scale ~O(n). The threshold is
# wall-ratio < 15 for 10x data — generous headroom for per-query fixed
# overhead shifting between regimes (a ratio of 100x would mean a
# quadratic path escaped its bucketing).
LINEAR = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "w1_topk_per_group",
    "e1_tumbling_window",
    "e2_latest_per_user",
    "t1_token_stats",
    "t13_ngram_novelty",
    "cdc_materialize",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "sim_knn",
    "sim_lsh_topk",
    "sim_ivf_portable",
]
# Labeled quadratic verification baseline — reported, not gated.
QUADRATIC = ["s1_cosine_topk"]


def run_suite(spark, sf_dir: str, queries) -> dict[str, float]:
    cached = []
    for t in TABLES:
        df = table(spark, sf_dir, t).cache()
        df.count()
        cached.append(df)
    out: dict[str, float] = {}
    for name in LINEAR + QUADRATIC:
        df = queries[name](spark, sf_dir)
        df.toPandas()  # warm: optimize + codegen + first execution
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.toPandas()
            samples.append(time.perf_counter() - t0)
        out[name] = sorted(samples)[1]
    for df in cached:
        df.unpersist()
    spark.catalog.clearCache()
    return out


def main() -> None:
    g01 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaleprobe", "g0.1")
    g1 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scaleprobe", "g1")
    spark = get_spark("scaleprobe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    t01 = run_suite(spark, g01, queries)
    t1 = run_suite(spark, g1, queries)
    rows = {}
    violations = []
    for name in LINEAR + QUADRATIC:
        ratio = t1[name] / t01[name]
        exponent = math.log(ratio) / math.log(10) if ratio > 0 else 0.0
        rows[name] = {
            "t_g0.1_sec": round(t01[name], 4),
            "t_g1_sec": round(t1[name], 4),
            "ratio_10x_data": round(ratio, 2),
            "exponent": round(exponent, 3),
            "tier": "quadratic-baseline" if name in QUADRATIC else "linear",
        }
        if name in LINEAR and ratio >= 15:
            violations.append(name)
    result = {
        "metric": "scale_probe",
        "scales": {"g0.1": g01, "g1": g1},
        "protocol": "cached tables, 1 warm-up, median of 3, engine defaults (AQE on)",
        "queries": rows,
        "linear_total_g0.1_sec": round(sum(t01[n] for n in LINEAR), 3),
        "linear_total_g1_sec": round(sum(t1[n] for n in LINEAR), 3),
        "linear_violations_ratio_ge_15": violations,
    }
    with open(os.path.join(REPO, "SCALEPROBE.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if violations:
        raise SystemExit(f"super-linear blowup in: {violations}")


if __name__ == "__main__":
    main()
