"""Empirical scale probe (round-3 verdict item 1): run the headline +
dedup/ANN/clustering tier at TWO scale factors generated from the same
recipe (scripts/gen_scale_fixture.py: g0.1 ~= the driver's sf0.1 sizes,
g1 = 10x) and measure the wall-time scaling exponent per query.

exponent = log(t_g1 / t_g0.1) / log(10)
  ~0   -> overhead-floor (fixed per-query cost dominates at both sizes)
  ~1   -> linear in data (what every bucketed path must be)
  ~2   -> quadratic (only the explicitly-labeled all-pairs baseline may
          show this; s1's blocked gemm is O(n^2 d) BY SPEC)

The probe's first run also produced a real finding, now fixed in the
engine: the UNCAPPED n-gram Jaccard join is quadratic on any realistic
(Zipf-vocabulary) corpus because pair space is sum(df(shingle)^2) —
ubiquitous shingles dominate. dedup_ngram_capped / the max_df knob in
ngram_jaccard_pairs bound per-shingle fan-out; the capped spellings are
what this probe times (the uncapped ones are small-fixture verification
baselines, like the all-pairs cosine).

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

from pyspark.sql import functions as F  # noqa: E402

from debezium_incubator_spark.catalog import TABLES, table  # noqa: E402
from debezium_incubator_spark.registry import all_queries  # noqa: E402
from debezium_incubator_spark.session import get_spark  # noqa: E402


def _lsh_scaled(spark, sf_dir):
    """sim_lsh_topk with bucket granularity scaled to the corpus
    (rows_per_band ~ log2(n/64)): the sieve's per-bucket occupancy —
    and so its pair work — stays constant as n grows. The registered
    query pins small-fixture constants for oracle parity; THIS is the
    spelling a 100 TB deployment runs."""
    import math as m

    from debezium_incubator_spark.llm.similarity import (
        _vectors,
        dot,
        lsh_candidate_pairs,
        norm_sq,
    )

    e = _vectors(spark, sf_dir).withColumn("nsq", norm_sq("v"))
    n = e.count()  # control-plane
    r = max(4, int(m.ceil(m.log2(max(n, 2) / 64))))
    cands = lsh_candidate_pairs(e, bands=8, rows_per_band=r)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nsq").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nsq").alias("nb"))
    cos_raw = dot("va", "vb") / (F.sqrt("na") * F.sqrt("nb"))
    return (
        cands.join(a, "vec_a").join(b, "vec_b")
        .withColumn("cos_raw", cos_raw)
        .orderBy(F.desc("cos_raw"), "vec_a", "vec_b")
        .limit(20)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


def _clusters_capped(spark, sf_dir):
    """dedup_clusters with the scale-knob edge generation (max_df cap):
    capped Jaccard edges -> large-star/small-star components."""
    from debezium_incubator_spark.llm.clustering import connected_components
    from debezium_incubator_spark.llm.dedup import ngram_jaccard_pairs

    d = table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(d, min_jaccard=0.5, max_df=20).select(
        "doc_a", "doc_b"
    )
    return connected_components(edges).withColumn(
        "is_representative", F.col("doc_id") == F.col("cluster_id")
    )


def _semdedup_scaled(spark, sf_dir):
    """dedup_semantic with the quantizer scaled per the SemDeDup rule:
    nlist ∝ corpus (target cell ≈ 500 vectors), so per-cell pair work
    stays ~constant as n grows. The registered query pins nlist=16 (the
    shared IVF audit index) for oracle parity; THIS spelling is what a
    100 TB deployment runs. Timing includes the index build — the
    k-means fit is itself part of the op's cost model (fixed iters × n,
    linear)."""
    import shutil
    import tempfile

    from debezium_incubator_spark.llm.similarity import (
        SEMDEDUP_TAU,
        _vectors,
        build_ivf_index,
        semdedup,
    )

    v = _vectors(spark, sf_dir)
    n = v.count()
    nlist = max(16, n // 500)
    idx = tempfile.mkdtemp(prefix="semdedup_probe_")
    try:
        build_ivf_index(v, idx, nlist=nlist)
        return semdedup(spark, idx, tau=SEMDEDUP_TAU).drop("cos_sim")
    finally:
        # the returned plan is consumed by run_suite's toPandas before
        # the next call; defer cleanup to atexit to keep this lazy-safe
        import atexit

        atexit.register(shutil.rmtree, idx, True)


def _ann_refresh_scaled(spark, sf_dir):
    """cdc_ann_refresh at production sizing AND production kernels:
    fold the change log, then refresh the index with the deployed
    components — build_ivf_index at nlist ∝ n (capped-sample fit +
    VECTORIZED MLlib assignment) and semdedup over the persisted
    cell-partitioned store. The registered query pins the 16-cell
    audit index + the interpreted fold-argmin for oracle parity; both
    are fixture-regime choices the probes showed quadratic at scale
    (fixed nlist → per-cell pairs ∝ n²; fold-argmin → O(n·nlist)
    interpreted FLOPs with nlist ∝ n). THIS composition is what a
    100 TB deployment runs; timing includes the full rebuild.

    Round 12: the composition moved into the engine as the REGISTERED
    ``ann_refresh_scaled`` (cdc/ann_refresh.py — exact tier first,
    nlist ∝ n, near-dup clone wave; oracled at all 3 SFs). This probe
    form calls the same shared builders but rebuilds into a tempdir
    per sample so the index build stays inside the measurement (the
    registered form reuses a stamped audit artifact)."""
    import atexit
    import shutil
    import tempfile

    from debezium_incubator_spark.cdc.ann_refresh import (
        ANN_TAU,
        build_scaled_index,
    )
    from debezium_incubator_spark.llm.similarity import semdedup

    idx = tempfile.mkdtemp(prefix="annrefresh_probe_")
    build_scaled_index(spark, sf_dir, idx)
    atexit.register(shutil.rmtree, idx, True)
    removals = semdedup(spark, idx, tau=ANN_TAU).select("vec_id")
    vecs = spark.read.parquet(f"{idx}/vectors").select(
        "vec_id", F.col("cluster").cast("bigint").alias("cell")
    )
    return vecs.join(removals, "vec_id", "left_anti").orderBy("vec_id")


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
    "dedup_ngram_capped",
    "clusters_capped",
    "sim_knn",
    "lsh_scaled",
    "sim_ivf_portable",
    "t25_substring_dedup",
    "semdedup_scaled",
    # round-7 additions: the connector folds (cell-LWW, capture-table,
    # commit-order — all single-shuffle fold variants) and the map-side
    # pipeline ops (partition routing hash, content-keyed split) plus
    # the per-domain WindowGroupLimit cap
    "cdc_cassandra_cell_lww",
    "cdc_db2_capture_fold",
    "cdc_logminer_commit_order",
    "cdc_partition_routing",
    "t28_hash_split",
    "t29_domain_cap",
    # round-11: the CDC→ANN capstone at the production quantizer sizing
    "ann_refresh_scaled",
    # round-12: the grand capstone + the 16×8 production MinHash banding
    # + weighted sampling
    "cdc_training_shards",
    "dedup_minhash_prod",
    "t61_weighted_sample",
]
# Labeled quadratic verification baseline — reported, not gated.
QUADRATIC = ["s1_cosine_topk"]


def run_suite(spark, sf_dir: str, queries,
              only: list[str] | None = None) -> dict[str, float]:
    cached = []
    for t in TABLES:
        df = table(spark, sf_dir, t).cache()
        df.count()
        cached.append(df)
    out: dict[str, float] = {}
    for name in only if only is not None else LINEAR + QUADRATIC:
        # local `_name` probe forms take precedence over same-named
        # registered queries: the probe spellings rebuild their index
        # artifacts inside the timed run (the registered
        # ann_refresh_scaled reuses a stamped audit artifact for oracle
        # parity, which would drop the build out of the measurement)
        fn = globals().get(f"_{name}") or queries[name]
        # Every sample builds a FRESH plan: re-collecting one DataFrame
        # reuses completed shuffle stages (stage skipping), which times
        # only the final stage — the first probe run measured exactly
        # that artifact. Fresh lineage re-executes the whole query; the
        # first (warm) sample additionally pays codegen/JIT and is
        # discarded. min-of-2 thereafter (min resists VM load bursts;
        # these are seconds-scale runs, not the ms-scale bench).
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        warm = time.perf_counter() - t0
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            samples.append(time.perf_counter() - t0)
        out[name] = min(samples)
        print(
            f"  {name}: warm {warm:.2f}s, fresh-min {out[name]:.3f}s",
            flush=True,
        )
    for df in cached:
        df.unpersist()
    spark.catalog.clearCache()
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--only")]
    only: list[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    g01 = args[0] if len(args) > 0 else os.path.join(
        REPO, ".scaleprobe", "g0.1")
    g1 = args[1] if len(args) > 1 else os.path.join(
        REPO, ".scaleprobe", "g1")
    spark = get_spark("scaleprobe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    print(f"== suite at {g01}", flush=True)
    t01 = run_suite(spark, g01, queries, only)
    print(f"== suite at {g1}", flush=True)
    t1 = run_suite(spark, g1, queries, only)
    rows = {}
    violations = []
    for name in only if only is not None else LINEAR + QUADRATIC:
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
    out_path = os.path.join(REPO, "SCALEPROBE.json")
    if only is not None:
        # merge mode: update only the probed entries in the existing
        # report (new queries added after a full run)
        with open(out_path) as f:
            result = json.load(f)
        result["queries"].update(rows)
        result["linear_violations_ratio_ge_15"] = sorted(
            set(result.get("linear_violations_ratio_ge_15", []))
            | set(violations)
        )
    else:
        result = {
            "metric": "scale_probe",
            "scales": {"g0.1": g01, "g1": g1},
            "protocol": "cached tables, fresh plan per sample (no stage reuse), 1 discarded warm run, min of 2, engine defaults (AQE on)",
            "queries": rows,
            "linear_total_g0.1_sec": round(sum(t01[n] for n in LINEAR), 3),
            "linear_total_g1_sec": round(sum(t1[n] for n in LINEAR), 3),
            "linear_violations_ratio_ge_15": violations,
        }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if violations:
        raise SystemExit(f"super-linear blowup in: {violations}")


if __name__ == "__main__":
    main()
