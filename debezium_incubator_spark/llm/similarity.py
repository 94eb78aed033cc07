"""Similarity search over embedding vectors (SURVEY.md §2J J3/J4/J9).

Brute-force cosine is the correctness baseline (expression-level: zip_with
dot products inside whole-stage codegen — no Python). The scale path is
LSH bucketing (random-hyperplane signs) which cuts the pair space from
O(n²) to within-bucket; both are implemented below.

Parity: the oracle folds dot products left-to-right exactly like Spark's
F.aggregate, so doubles are bit-identical — ordering by raw cosine is
engine-stable, ROUND(,6) on output is belt-and-braces.

Scale notes (100 TB of embeddings): brute-force top-k against a QUERY
vector is a broadcast + single pass (fine at any scale). ALL-PAIRS must
go through LSH/IVF bucketing — the crossJoin baseline exists for
verification only. For batched matrix kernels, swap the expression dot
product for a numpy pandas_udf over mapInPandas (Arrow-vectorized); at
fixture scale the JVM expression path is faster than Python round-trips.
"""

from __future__ import annotations

import atexit
import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..registry import register


def dot(a, b) -> Column:
    """Left-fold dot product (bit-reproducible across engines)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda s, x: s + x)


def norm_sq(v) -> Column:
    return F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0),
                       lambda s, x: s + x)


def l2_normalize(v) -> Column:
    """J9: x / ||x|| (expression-level)."""
    n = F.sqrt(norm_sq(v))
    return F.transform(v, lambda x: x / n)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


_PAIR_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x) AS nsq
  FROM e
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
             (s, x) -> s + x) / (sqrt(a.nsq) * sqrt(b.nsq)) AS cos_raw
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
"""


# --- J3: all-pairs cosine top-k ------------------------------------------

BLOCK_TARGET_ROWS = 512  # per-block target; measured fastest at sf0.1
# (4 blocks → 10 block-pair tasks saturate local[32]; 1-2 blocks leave
# cores idle, ≤128 rows pays more scheduling than gemm)
MAX_BLOCKS = 64  # replication is O(B) copies of the corpus — cap it; past
# the cap, blocks grow instead (the gemm work, O(n²·d), dominates long
# before block transfer does on a brute-force all-pairs)


@register(
    "s1_cosine_topk",
    oracle=_PAIR_ORACLE
    + """
SELECT vec_a, vec_b, ROUND(cos_raw, 6) AS cos_sim
FROM p
ORDER BY cos_raw DESC, vec_a, vec_b
LIMIT 20
""",
)
def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar pairs via BLOCKED exact pairwise gemm: split
    the corpus into B row-blocks (vec_id % B), materialize every block
    pair (bi ≤ bj) through a cogrouped applyInPandas, gemm the two
    blocks in numpy, and keep a local top-k per block pair before the
    final k-row merge.

    This is the fully distributed brute-force pattern — NO driver-side
    collect and NO whole-table broadcast (the round-1 version built the
    gemm's right side with toPandas(), a driver bottleneck past ~1e7
    vectors). Work per task is |block|² dots, replication factor is B
    (each block joins B block-pairs), and B scales with the corpus:
    memory per task stays ~BLOCK_TARGET_ROWS² regardless of n. The
    expression-level crossJoin (sim_neardup_cosine) remains the
    verification baseline; LSH/IVF remain the sub-quadratic paths when
    approximate recall is acceptable.
    """
    import numpy as np
    import pandas as pd

    k = 20
    e = _vectors(spark, sf_dir)
    n = e.count()  # parquet metadata count — cheap planning step
    nblocks = min(MAX_BLOCKS, max(1, -(-n // BLOCK_TARGET_ROWS)))
    pairs = [(i, j) for i in range(nblocks) for j in range(i, nblocks)]

    def side(df: DataFrame, anchor: str) -> DataFrame:
        bp = spark.createDataFrame(pairs, "bi INT, bj INT")
        blk = (F.col("vec_id") % nblocks).alias("blk")
        return (
            df.select("vec_id", "v", blk)
            .join(F.broadcast(bp), F.col("blk") == F.col(anchor))
            .select("bi", "bj", "vec_id", "v")
        )

    # fresh scans per side: cogroup requires distinct lineages (a shared
    # plan trips the ambiguous-self-join check)
    left = side(_vectors(spark, sf_dir), "bi")
    right = side(_vectors(spark, sf_dir), "bj")

    def gemm_topk(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos_raw": []})
        if lpdf.empty or rpdf.empty:
            return empty
        a_ids = lpdf["vec_id"].to_numpy()
        b_ids = rpdf["vec_id"].to_numpy()
        a = np.stack(lpdf["v"].to_numpy()).astype(np.float64)
        b = np.stack(rpdf["v"].to_numpy()).astype(np.float64)
        a /= np.sqrt((a * a).sum(axis=1, keepdims=True))
        b /= np.sqrt((b * b).sum(axis=1, keepdims=True))
        sims = a @ b.T
        if key[0] == key[1]:  # diagonal block: halve to i<j
            mask = a_ids[:, None] < b_ids[None, :]
        else:  # off-diagonal: every cross pair appears exactly once
            mask = np.ones_like(sims, dtype=bool)
        ai, bj = np.nonzero(mask)
        s = sims[ai, bj]
        if len(s) > k:  # local top-k before the shuffle
            idx = np.argpartition(-s, k)[:k]
            ai, bj, s = ai[idx], bj[idx], s[idx]
        la, lb = a_ids[ai], b_ids[bj]
        return pd.DataFrame(
            {  # orient pairs (vec_a < vec_b) regardless of block order
                "vec_a": np.minimum(la, lb),
                "vec_b": np.maximum(la, lb),
                "cos_raw": s,
            }
        )

    cand = (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(gemm_topk, "vec_a LONG, vec_b LONG, cos_raw DOUBLE")
    )
    return (
        cand.orderBy(F.desc("cos_raw"), "vec_a", "vec_b")
        .limit(k)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


# --- J4: KNN for one query vector ----------------------------------------

@register(
    "sim_knn",
    oracle="""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x) AS nsq
  FROM e
), q AS (SELECT v AS qv, nsq AS qn FROM n WHERE vec_id = 0),
s AS (
  SELECT n.vec_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(n.v) + 1), i -> n.v[i] * q.qv[i])),
             (s, x) -> s + x) / (sqrt(n.nsq) * sqrt(q.qn)) AS cos_raw
  FROM n, q
  WHERE n.vec_id <> 0
)
SELECT vec_id, ROUND(cos_raw, 6) AS cos_sim
FROM s
ORDER BY cos_raw DESC, vec_id
LIMIT 10
""",
)
def sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 nearest neighbors of vec_id=0: broadcast the 1-row query side,
    single scan of the corpus, TakeOrderedAndProject for the top-k —
    this shape is 100 TB-safe as-is."""
    e = _vectors(spark, sf_dir).withColumn("nsq", norm_sq("v"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nsq").alias("qn")
    )
    cos_raw = dot("v", "qv") / (F.sqrt("nsq") * F.sqrt("qn"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_raw", cos_raw)
        .orderBy(F.desc("cos_raw"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


# --- J2/J3: embedding-cosine near-duplicate pairs ------------------------

@register(
    "sim_neardup_cosine",
    oracle=_PAIR_ORACLE
    + """
SELECT vec_a, vec_b, ROUND(cos_raw, 6) AS cos_sim
FROM p
WHERE cos_raw >= 0.9
ORDER BY vec_a, vec_b
""",
)
def sim_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection in embedding space (threshold 0.9).

    Round-13 (measured, three spellings at sf0.1): the optimizer pushes
    the threshold filter INTO the BroadcastNestedLoopJoin condition, so
    the per-pair cosine runs for every one of the n² candidate pairs —
    and the conjunct ORDER in that condition is evaluation order.  As
    written originally (filter merged after the join) the condition came
    out ``(cos ≥ 0.9) AND (vec_a < vec_b)``: the expensive fold ran for
    all n² pairs (54.6 s warm).  A generated straight-line 64-term chain
    is WORSE here (127 s): one ~127-op expression tree becomes a single
    huge generated method that HotSpot refuses to JIT, and it runs as
    interpreted bytecode per pair — straight-line codegen is the right
    spelling per ROW (sim_jl_projection), not per PAIR.  The fix is to
    spell the join condition explicitly with the cheap half FIRST:
    ``(vec_a < vec_b) AND (cos ≥ 0.9)`` short-circuits the fold down to
    the n²/2 ordered pairs — 25.4 s, ~2.2× — while the HOF fold keeps
    its JIT-hot Scala loop.  The remaining cost is the honest O(n²·d)
    of an index-free exact all-pairs scan: this query is the
    verification baseline for the blocked-gemm/LSH/IVF scale paths
    (documented above) and is not meant to run at corpus scale."""
    e = _vectors(spark, sf_dir).withColumn("nsq", norm_sq("v"))
    # round-13: the BNLJ's parallelism is its STREAM side's partition
    # count — one split at bench SFs put the whole n²·d loop on one
    # core.  spread() the stream side (broadcast side unaffected);
    # no-op at production split counts.
    a = spread(e).select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nsq").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nsq").alias("nb"))
    cos_raw = dot("va", "vb") / (F.sqrt("na") * F.sqrt("nb"))
    pairs = a.join(b, (F.col("vec_a") < F.col("vec_b")) & (cos_raw >= 0.9)).select(
        "vec_a", "vec_b", F.round(cos_raw, 6).alias("cos_sim")
    )
    # round-13: the global sort's range sampler re-executes everything
    # above the last shuffle — here the entire n²·d BNLJ cosine loop
    # (the spread exchange sits BELOW the join, so stage reuse doesn't
    # cover it).  The surviving pair set is tiny; a lazy localCheckpoint
    # materializes it once and the sampler reads memory (the un-movable-
    # sort rule: the sort can't move below a join that PRODUCES its key).
    return pairs.localCheckpoint(eager=False).orderBy("vec_a", "vec_b")


# --- J3 scale path: random-hyperplane LSH bucketing — rows-only ----------

# Multi-band hyperplane LSH: B bands × r planes. A pair is a candidate
# iff ALL r sign bits agree in AT LEAST ONE band — recall for a pair at
# angle θ is 1 - (1 - p^r)^B with p = 1 - θ/π. These defaults target the
# near-dup regime (cos ≥ 0.9 ⇒ p ≥ 0.86 ⇒ recall ≥ 0.99); candidate
# volume for unrelated pairs (p ≈ 0.5) is ~1 - (1 - 2^-r)^B ≈ B/2^r of
# the pair space. Tune r up / B up together at 100 TB for sharper
# sieving of ever-larger corpora.
LSH_BANDS = 8
LSH_ROWS_PER_BAND = 4
N_PLANES = LSH_BANDS * LSH_ROWS_PER_BAND


def _hyperplanes(dim: int, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from SHA-256 (seeded; no
    runtime RNG — resumable and engine-independent)."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.sha256(f"plane{p}:{i}".encode()).digest()
            row.append(int.from_bytes(h[:4], "big") / 2**31 - 1.0)
        planes.append(row)
    return planes


def lsh_band_values(v, planes: list[list[float]],
                    rows_per_band: int = LSH_ROWS_PER_BAND) -> Column:
    """Array of per-band bucket ids: sign bits of plane dot products,
    packed r-per-band."""
    bits = []
    for plane in planes:
        d = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bits.append(F.when(d > 0, 1).otherwise(0))
    bands = []
    for b in range(0, len(planes), rows_per_band):
        val = F.lit(0)
        for i, bit in enumerate(bits[b: b + rows_per_band]):
            val = val + bit * F.lit(1 << i)
        bands.append(val)
    return F.array(*bands)


def lsh_candidate_pairs(
    e: DataFrame,
    bands: int = LSH_BANDS,
    rows_per_band: int = LSH_ROWS_PER_BAND,
) -> DataFrame:
    """Candidate (vec_a, vec_b) pairs sharing at least one LSH band
    bucket. Input needs columns (vec_id, v); the self-join runs only
    within (band_id, band_val) buckets — the sub-quadratic sieve.

    ``rows_per_band`` MUST grow with the corpus (the round-4 scale
    probe's finding): a band has 2^r buckets, so expected bucket
    occupancy is n/2^r and candidate volume is B·n²/2^r — with r fixed
    the sieve is quadratic BY CONSTRUCTION (measured 24× wall at 10×
    data with r=4). Scaling r ≈ log2(n / target_bucket_size) keeps
    bucket occupancy — and therefore per-bucket pair work — constant;
    raise B alongside to hold recall (collision prob for similarity s
    is 1-(1-s^r)^B). The module defaults are small-fixture settings;
    the registered query pins them for oracle parity."""
    planes = _hyperplanes(64, bands * rows_per_band)
    banded = e.select(
        "vec_id",
        F.posexplode(lsh_band_values(F.col("v"), planes, rows_per_band)).alias(
            "band_id", "band_val"
        ),
    )
    a = banded.select("band_id", "band_val", F.col("vec_id").alias("vec_a"))
    b = banded.select("band_id", "band_val", F.col("vec_id").alias("vec_b"))
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )


def _lsh_oracle() -> str:
    """DuckDB twin of the FULL LSH pipeline. The hyperplanes are
    deterministic SHA-256 constants (dyadic rationals — repr()
    round-trips exactly), so they inline as literals; every dot product
    is the same left fold both engines use (list_prepend-0.0 reduce ==
    F.aggregate), so sign bits, band ids, the candidate-pair set, and
    the rerank order are all bit-identical. This upgrades sim_lsh_topk
    from rows-only to a true differential check of sieve + rerank."""
    planes = _hyperplanes(64)
    rows = ",\n".join(
        f"  ({p}, [{', '.join(repr(x) for x in row)}]::DOUBLE[])"
        for p, row in enumerate(planes)
    )
    return f"""
WITH planes(plane_id, pv) AS (VALUES
{rows}
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x) AS nsq
  FROM e
), bits AS (
  SELECT e.vec_id, p.plane_id,
         CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(1, 65), i -> e.v[i] * p.pv[i])),
                (s, x) -> s + x) > 0 THEN 1 ELSE 0 END AS bit
  FROM e CROSS JOIN planes p
), bands AS (
  SELECT vec_id, plane_id // {LSH_ROWS_PER_BAND} AS band_id,
         SUM(bit * (1 << (plane_id % {LSH_ROWS_PER_BAND}))) AS band_val
  FROM bits GROUP BY vec_id, plane_id // {LSH_ROWS_PER_BAND}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
), rer AS (
  SELECT c.vec_a, c.vec_b,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, 65), i -> na.v[i] * nb.v[i])),
             (s, x) -> s + x) / (sqrt(na.nsq) * sqrt(nb.nsq)) AS cos_raw
  FROM cand c
  JOIN n na ON na.vec_id = c.vec_a
  JOIN n nb ON nb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, ROUND(cos_raw, 6) AS cos_sim
FROM rer
ORDER BY cos_raw DESC, vec_a, vec_b
LIMIT 20
"""


@register("sim_lsh_topk", oracle=_lsh_oracle())
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-pairs top-20: multi-band hyperplane LSH generates
    candidate pairs (within-bucket self-join — sub-quadratic), then the
    EXACT cosine reranks the candidates. Recall follows the banding
    formula above: ≈1.0 for near-dup pairs (the workload LSH exists
    for — asserted by the planted-duplicate recall test), but genuinely
    partial on corpora with no high-similarity structure, where no
    sub-quadratic sieve can find "nearest of the unrelated" pairs —
    s1_cosine_topk is the exact path there.

    Differentially checked end-to-end (round-4 upgrade from rows-only):
    the SHA-256 hyperplanes inline as SQL literals and the oracle
    replays sign bits → band packing → bucket self-join → exact-cosine
    rerank with bit-identical folds (see _lsh_oracle)."""
    e = _vectors(spark, sf_dir).withColumn("nsq", norm_sq("v"))
    # round-13: AQE coalesces the small-byte candidate-pair shuffle to
    # ~6 partitions while the per-pair 64-term cosine rerank above it
    # is the query's dominant CPU (measured 7.2 s executor over 6
    # tasks); the explicit repartition spreads the rerank to full
    # width (scale-adaptive; a band-key repartition BELOW the join was
    # also measured and HURTS — the join itself is cheap here).
    cands = lsh_candidate_pairs(e).repartition(
        spark.sparkContext.defaultParallelism
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nsq").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nsq").alias("nb"))
    cos_raw = dot("va", "vb") / (F.sqrt("na") * F.sqrt("nb"))
    return (
        cands.join(a, "vec_a")
        .join(b, "vec_b")
        .withColumn("cos_raw", cos_raw)
        .orderBy(F.desc("cos_raw"), "vec_a", "vec_b")
        .limit(20)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


# --- J4 scale path: IVF (KMeans coarse quantizer + cluster probing) ------

IVF_NLIST = 16
IVF_NPROBE = 4

# Fixed-path audit copy of the persisted IVF index. The differential
# oracle for the KMeans IVF queries must SEE the trained cluster
# assignment (KMeans is not SQL-replicable), so the engine persists the
# index — assignment as a partition column plus the centroid routing
# table, exactly the artifacts a production IVF index is — at a path the
# static oracle SQL can read_parquet. Single-writer test artifact: the
# sweep always runs the Spark query (which ensures/refreshes the index
# for its sf_dir) before the oracle; cleaned at exit like the temp-dir
# indexes.
IVF_AUDIT_DIR = "/tmp/dis_ivf_index_current"

_FOLD = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), (s, x) -> s + x)"
)

_IVF_INDEX_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, v, nsq, CAST(cluster AS BIGINT) AS cell
  FROM read_parquet('{IVF_AUDIT_DIR}/vectors/*/*.parquet',
                    hive_partitioning = true)
), cents AS (
  SELECT cluster, centroid
  FROM read_parquet('{IVF_AUDIT_DIR}/centroids/*.parquet')
), q AS (
  SELECT v AS qv,
         {_FOLD.format(terms="list_transform(v, x -> x * x)")} AS qn
  FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
), probe AS (
  SELECT cluster FROM (
    SELECT c.cluster,
           row_number() OVER (ORDER BY
             {_FOLD.format(terms=(
                 "list_transform(range(1, len(c.centroid) + 1),"
                 " i -> (c.centroid[i] - q.qv[i]) * (c.centroid[i] - q.qv[i]))"
             ))},
             c.cluster) AS rn
    FROM cents c, q
  ) WHERE rn <= {IVF_NPROBE}
), cand AS (
  SELECT vec_id, cell, v, nsq
  FROM vecs JOIN probe p ON vecs.cell = p.cluster
  WHERE vec_id <> 0
), cos AS (
  SELECT cand.vec_id, cand.cell,
         {_FOLD.format(terms=(
             "list_transform(range(1, len(cand.v) + 1),"
             " i -> cand.v[i] * q.qv[i])"
         ))} / (sqrt(cand.nsq) * sqrt(q.qn)) AS cos_raw
  FROM cand, q
)
SELECT vec_id, cell, ROUND(cos_raw, 6) AS cos_sim
FROM cos ORDER BY cos_raw DESC, vec_id LIMIT 10
"""


def _sq_l2(a, b) -> float:
    """Driver-side squared-L2 as a sequential LEFT FOLD of (a_i-b_i)²
    (plain Python floats = IEEE doubles). Mirrors the oracle's
    list_reduce fold and Spark's F.aggregate exactly — numpy's pairwise
    summation would differ in the last ulp and could flip a probe-cell
    ranking at a near-tie."""
    d = 0.0
    for x, y in zip(a, b):
        d += (float(x) - float(y)) * (float(x) - float(y))
    return d


def _norm_fold(v) -> float:
    """Left-fold ||v||² in Python doubles (same fold as norm_sq / the
    oracle's list_reduce)."""
    s = 0.0
    for x in v:
        s += float(x) * float(x)
    return s


@register("sim_ivf_knn", oracle=_IVF_INDEX_ORACLE)
def sim_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate KNN via IVF: KMeans coarse quantizer (nlist=16)
    partitions the corpus; a query probes only its nprobe=4 nearest
    cells, scanning ~25% of vectors instead of 100%.

    This is the standard ANN index structure at scale: the cluster
    assignment is a one-time indexing pass (at 100 TB: persist
    `cluster` as a partition column so probing prunes parquet
    partitions); per-query work shrinks by nlist/nprobe. Exact baseline:
    sim_knn.

    Differential check (round 5): the query ensures the persisted audit
    index (same seed/nlist ⇒ the SAME deterministic KMeans fit as the
    in-query one, equality test-pinned in test_ivf_index.py) exists at
    IVF_AUDIT_DIR, and the oracle recomputes routing + rerank in SQL
    from those artifacts — so the oracle ALSO re-checks that the
    one-shot fit and the persisted fit agree."""
    import math

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    k, nprobe = 10, IVF_NPROBE
    _ensure_ivf_index(spark, sf_dir)  # audit artifacts for the oracle
    e = _vectors(spark, sf_dir).withColumn("nsq", norm_sq("v"))
    vec = e.withColumn("fv", array_to_vector("v"))
    model = KMeans(
        k=16, seed=42, maxIter=10, featuresCol="fv", predictionCol="cluster"
    ).fit(vec)
    assigned = model.transform(vec)

    # rank cells by distance to the query vector (driver-side constants:
    # 16 centroids + 1 query row — the IVF routing table); fold + ties
    # on cell id, mirroring the oracle
    qrow = e.filter(F.col("vec_id") == 0).select("v", "nsq").first()
    qv = [float(x) for x in qrow.v]
    dists = sorted(
        (_sq_l2(c, qv), i) for i, c in enumerate(model.clusterCenters())
    )
    probe = [i for _, i in dists[:nprobe]]

    qlit = F.array(*[F.lit(x) for x in qv])
    cos_raw = dot("v", qlit) / (F.sqrt("nsq") * F.lit(math.sqrt(qrow.nsq)))
    return (
        assigned.filter(F.col("cluster").isin(probe))
        .filter(F.col("vec_id") != 0)
        .withColumn("cos_raw", cos_raw)
        .orderBy(F.desc("cos_raw"), "vec_id")
        .limit(k)
        .select(
            "vec_id",
            F.col("cluster").cast("bigint").alias("cell"),
            F.round("cos_raw", 6).alias("cos_sim"),
        )
    )


# --- J4 scale path: PERSISTED IVF index lifecycle -------------------------
#
# sim_ivf_knn above is the one-shot demo (fit + probe in one call). At
# scale the index build is a separate persisted stage: fit once, write
# the corpus cluster-partitioned, and every probe afterwards reads ONLY
# its nprobe partition directories (parquet partition pruning) — per-
# query I/O drops by nlist/nprobe with zero recompute.

#: Cap on rows fed to the KMeans FIT (not the assignment). Production
#: IVF builds (faiss trains on a bounded training set) fit centroids on
#: a sample: fit cost is O(sample · nlist · iters) instead of
#: O(n · nlist · iters), which under the nlist ∝ n sizing rule would be
#: quadratic in the corpus (the g3→g10 probe measured exponent 1.217
#: before this cap). Assignment stays distributed and EXACT over all n
#: rows. Fixture SFs sit far below the cap, so test builds are
#: bit-identical to the uncapped fit.
IVF_FIT_SAMPLE_CAP = 50_000


def build_ivf_index(source: DataFrame, index_dir: str, nlist: int = IVF_NLIST,
                    seed: int = 42, max_iter: int = 10,
                    fit_sample_cap: int = IVF_FIT_SAMPLE_CAP) -> None:
    """One-time IVF indexing pass over ``source`` (vec_id, v:array<double>):

    - ``{index_dir}/vectors``   — the corpus + precomputed ``nsq``,
      written ``partitionBy("cluster")`` so probes prune directories;
    - ``{index_dir}/centroids`` — the nlist routing rows.

    100 TB posture: the KMeans fit runs on a bounded DETERMINISTIC
    sample (``fit_sample_cap`` rows via a hash-mod filter on vec_id —
    no RNG, no partitioning dependence), so build cost is
    O(cap · nlist) ∝ n under the nlist ∝ n rule, not O(n · nlist) ∝ n².
    The cluster ASSIGNMENT runs distributed over every row — only the
    centroid estimate is sampled, exactly faiss's train/add split. The
    partitioned write is a single shuffle on ``cluster`` (bounded
    cardinality — no skew beyond cluster imbalance, which nlist sizing
    controls); probes never touch the fit again. Rebuild cadence is a
    deployment decision (drift), not per query."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = source.sparkSession
    vec = source.withColumn("fv", array_to_vector("v"))
    n = vec.count()
    # the sample must still hold ≥ nlist points (k-means needs k ≤ n);
    # a few points per centroid beats the floor without re-growing the
    # fit toward O(n·nlist)
    cap = max(fit_sample_cap, 4 * nlist)
    fit_rows = vec
    if n > cap:
        # deterministic ~cap-row sample: keep vec_id hashes ≡ 0 (mod m)
        m = n // cap + 1
        fit_rows = vec.filter(F.xxhash64("vec_id") % m == 0)
    model = KMeans(
        k=nlist, seed=seed, maxIter=max_iter,
        featuresCol="fv", predictionCol="cluster",
    ).fit(fit_rows)
    assigned = (
        model.transform(vec)
        .withColumn("nsq", norm_sq("v"))
        .select("vec_id", "v", "nsq", "cluster")
    )
    # repartition on the partition column: one output file per cluster
    # directory instead of one-per-task-per-cluster
    (assigned.repartition(nlist, "cluster")
     .write.mode("overwrite").partitionBy("cluster")
     .parquet(f"{index_dir}/vectors"))
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster INT, centroid ARRAY<DOUBLE>",
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")


def ivf_index_append(spark: SparkSession, index_dir: str,
                     batch: DataFrame) -> int:
    """Incremental IVF maintenance: assign NEW vectors (vec_id,
    v:array<double>) to the EXISTING centroids and append them into the
    cluster-partitioned vector store — no KMeans refit, no rewrite of
    existing cells. Probes see appended vectors immediately (they read
    partition directories).

    Assignment is expression-level: per centroid a left-fold squared-L2
    (the same fold ivf_probe routes with), argmin via array_min over
    (dist, cluster) structs — lexicographic ordering breaks ties toward
    the lower cluster id, matching the probe's routing. The centroid
    table is control-plane (nlist rows, read driver-side and inlined as
    literals); at nlist beyond a few hundred, switch to a broadcast
    join + groupBy-argmin instead of plan literals. The append write
    touches ONLY the new vectors' cluster directories (dynamic
    partition append, one file per touched cluster).

    Rebuild cadence remains a deployment decision: appends do not move
    centroids, so a heavily drifted corpus eventually wants a refit —
    the same tradeoff every production IVF index (FAISS et al.)
    documents. Returns the number of appended rows."""
    cents = sorted(
        spark.read.parquet(f"{index_dir}/centroids").collect(),
        key=lambda r: r.cluster,
    )
    structs = []
    for r in cents:
        clit = F.array(*[F.lit(float(x)) for x in r.centroid])
        d = F.aggregate(
            F.zip_with("v", clit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        structs.append(
            F.struct(d.alias("d"), F.lit(int(r.cluster)).alias("c"))
        )
    best = F.array_min(F.array(*structs))
    assigned = (
        batch.withColumn("nsq", norm_sq("v"))
        .withColumn("cluster", best["c"])
        .select("vec_id", "v", "nsq", "cluster")
    )
    n = assigned.count()
    (
        assigned.repartition(len(cents), "cluster")
        .write.mode("append").partitionBy("cluster")
        .parquet(f"{index_dir}/vectors")
    )
    return n


def ivf_probe(spark: SparkSession, index_dir: str, query_v: list[float],
              k: int = 10, nprobe: int = IVF_NPROBE,
              exclude_vec_id: int | None = None) -> DataFrame:
    """Probe a persisted IVF index: rank cells by centroid distance
    (driver-side — the routing table is nlist rows, control-plane),
    then scan ONLY the nprobe matching partition directories. The
    ``cluster IN (...)`` filter lands in PartitionFilters, so the scan
    reads nprobe/nlist of the corpus (plan-audited in tests).

    Routing arithmetic is the engine's bit-reproducible LEFT FOLD
    (ties → lower cell id), matching the differential oracle."""
    import math

    cents = spark.read.parquet(f"{index_dir}/centroids").collect()
    qv = [float(x) for x in query_v]
    order = sorted(cents, key=lambda r: (_sq_l2(r.centroid, qv), r.cluster))
    probe = [r.cluster for r in order[:nprobe]]

    vecs = spark.read.parquet(f"{index_dir}/vectors").filter(
        F.col("cluster").isin(probe)
    )
    if exclude_vec_id is not None:
        vecs = vecs.filter(F.col("vec_id") != exclude_vec_id)
    qn = math.sqrt(_norm_fold(qv))
    qlit = F.array(*[F.lit(x) for x in qv])
    cos_raw = dot("v", qlit) / (F.sqrt("nsq") * F.lit(qn))
    return (
        vecs.withColumn("cos_raw", cos_raw)
        .orderBy(F.desc("cos_raw"), "vec_id")
        .limit(k)
        .select(
            "vec_id",
            F.col("cluster").cast("bigint").alias("cell"),
            F.round("cos_raw", 6).alias("cos_sim"),
        )
    )


#: build dirs THIS process created (see llm/_audit.py: since round 12
#: an exiting process that merely reused the artifact must not delete
#: a dir another process may be mid-build/mid-read on)
_IVF_BUILT: set = set()


def _cleanup_ivf_audit_dir() -> None:
    """atexit hook: the audit index lives at a fixed /tmp path (the
    static oracle SQL must be able to read_parquet it) and the
    driver/sweep harness never cleans it explicitly. Removes the
    stamped build dirs THIS PROCESS created, plus the symlink when it
    points at one of them."""
    import glob
    import os
    import shutil

    mine = [d for d in glob.glob(IVF_AUDIT_DIR + "-*") if d in _IVF_BUILT]
    try:
        if os.path.islink(IVF_AUDIT_DIR):
            if os.path.realpath(IVF_AUDIT_DIR) in (
                os.path.realpath(d) for d in mine
            ):
                os.remove(IVF_AUDIT_DIR)
        else:
            shutil.rmtree(IVF_AUDIT_DIR, ignore_errors=True)  # legacy
    except OSError:
        pass
    for d in mine:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_ivf_audit_dir)


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) the persisted IVF index for ``sf_dir`` at the
    fixed audit path. A marker file records which source (path + mtime +
    size of embeddings.parquet) the index was built from; mismatch —
    sf switch mid-process, stale leftovers from a crashed run, fixture
    regeneration — triggers a rebuild.

    The fixed path is a SYMLINK to a stamp-named build dir, swapped by
    atomic ``os.replace`` — so a concurrent reader (another pytest
    process, an ad-hoc session) mid-query on the old target keeps a
    consistent index instead of racing a mode=overwrite rewrite, and
    the static oracle SQL still reads one fixed path. Build-then-marker
    ordering inside the build dir makes a crash mid-build leave a
    missing marker, never a lying one."""
    import hashlib
    import os
    import shutil

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    stamp = f"{src}\n{st.st_mtime_ns}:{st.st_size}"
    build_dir = (
        IVF_AUDIT_DIR + "-"
        + hashlib.md5(stamp.encode()).hexdigest()[:10]
    )
    marker = os.path.join(build_dir, "_source")
    valid = False
    try:
        with open(marker) as fh:
            valid = fh.read() == stamp
    except OSError:
        pass
    if not valid:
        build_ivf_index(_vectors(spark, sf_dir), build_dir)
        with open(marker, "w") as fh:
            fh.write(stamp)
        _IVF_BUILT.add(build_dir)
    # point the fixed path at the build atomically
    if os.path.realpath(IVF_AUDIT_DIR) != os.path.realpath(build_dir):
        if os.path.isdir(IVF_AUDIT_DIR) and not os.path.islink(IVF_AUDIT_DIR):
            shutil.rmtree(IVF_AUDIT_DIR, ignore_errors=True)  # legacy layout
        tmp_link = f"{build_dir}.lnk"
        try:
            os.remove(tmp_link)
        except OSError:
            pass
        os.symlink(build_dir, tmp_link)
        os.replace(tmp_link, IVF_AUDIT_DIR)
    return IVF_AUDIT_DIR


@register("sim_ivf_probe", oracle=_IVF_INDEX_ORACLE)
def sim_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index lifecycle as a registered query: build the
    IVF index ONCE per process (fixed audit path, keyed by a source
    marker), then answer the same KNN as sim_ivf_knn by probing nprobe
    partitions.

    Differentially checked (round 5): the oracle reads the persisted
    assignment + centroid artifacts and recomputes cell routing, the
    probed candidate set, and the in-cell exact rerank in SQL with the
    same left-fold arithmetic — closing the last rows-only gap where a
    real oracle was possible. Partition-pruning plan + one-shot equality
    remain test-pinned (test_ivf_index.py)."""
    index_dir = _ensure_ivf_index(spark, sf_dir)
    qrow = (
        _vectors(spark, sf_dir).filter(F.col("vec_id") == 0).select("v").first()
    )
    return ivf_probe(spark, index_dir, list(qrow.v), k=10, exclude_vec_id=0)


# --- IVF mechanics, portably (differential twin for the KMeans paths) ----

_IVF_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])),"
    " (s, x) -> s + x)"
)

_IVF_PORTABLE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x) AS nsq
  FROM e
), seeds AS (
  SELECT vec_id AS seed_id, v AS sv, nsq AS snsq
  FROM n WHERE vec_id BETWEEN 1 AND 8
), q AS (
  SELECT v AS qv, nsq AS qn FROM n WHERE vec_id = 0
), assign AS (
  SELECT vec_id, seed_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, seed_id) AS rn
  FROM (
    SELECT n.vec_id, s.seed_id,
           n.nsq - 2 * {_IVF_DOT.format(a="n.v", b="s.sv")} + s.snsq AS dist
    FROM n CROSS JOIN seeds s
  )
), cells AS (
  SELECT vec_id, seed_id AS cell FROM assign WHERE rn = 1
), probe AS (
  SELECT seed_id AS cell FROM (
    SELECT s.seed_id,
           row_number() OVER (
             ORDER BY q.qn - 2 * {_IVF_DOT.format(a="s.sv", b="q.qv")} + s.snsq,
                      s.seed_id) AS rn
    FROM seeds s, q
  ) WHERE rn <= 2
), cand AS (
  SELECT c.vec_id, c.cell
  FROM cells c JOIN probe p ON c.cell = p.cell
  WHERE c.vec_id <> 0
), cos AS (
  SELECT cand.vec_id, cand.cell,
         {_IVF_DOT.format(a="n.v", b="q.qv")}
           / (sqrt(n.nsq) * sqrt(q.qn)) AS cos_raw
  FROM cand JOIN n ON n.vec_id = cand.vec_id, q
)
SELECT vec_id, CAST(cell AS BIGINT) AS cell, ROUND(cos_raw, 6) AS cos_sim
FROM cos ORDER BY cos_raw DESC, vec_id LIMIT 10
"""


@register("sim_ivf_portable", oracle=_IVF_PORTABLE_ORACLE)
def sim_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF mechanics (coarse-quantize → route query to nprobe
    nearest cells → exact top-k inside probed cells) with a DETERMINISTIC
    portable quantizer, so the whole structure is differentially
    checked: cells are defined by argmin squared-L2 distance to 8 seed
    vectors (the embeddings of vec_id 1–8 — data the oracle can see),
    distance folds are the repo's bit-reproducible left folds, and ties
    break on seed id. sim_ivf_knn / sim_ivf_probe run the SAME structure
    under a trained KMeans quantizer (better cells, engine-specific →
    rows-only + plan/recall tests); this twin is the candidate-set
    differential the round-3 verdict asked for: assignment, routing, and
    in-cell exact rerank each hash-checked against SQL.

    Scale posture matches the persisted path: assignment is one
    broadcast-join pass (8 seed rows), routing is control-plane, the
    rerank touches only probed cells."""
    nprobe, k = 2, 10
    e = _vectors(spark, sf_dir).withColumn("nsq", norm_sq("v"))
    seeds = (
        e.filter(F.col("vec_id").between(1, 8))
        .select(
            F.col("vec_id").alias("seed_id"),
            F.col("v").alias("sv"),
            F.col("nsq").alias("snsq"),
        )
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nsq").alias("qn")
    )

    from pyspark.sql.window import Window as W

    dist = F.col("nsq") - 2 * dot("v", "sv") + F.col("snsq")
    assign = (
        e.crossJoin(F.broadcast(seeds))
        .withColumn("dist", dist)
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy("dist", "seed_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nsq", F.col("seed_id").alias("cell"))
    )
    qdist = F.col("qn") - 2 * dot("sv", "qv") + F.col("snsq")
    probe = (
        seeds.crossJoin(F.broadcast(q))
        .withColumn("qdist", qdist)
        .withColumn(
            "rn", F.row_number().over(W.orderBy("qdist", "seed_id"))
        )
        .filter(F.col("rn") <= nprobe)
        .select(F.col("seed_id").alias("cell"))
    )
    cos_raw = dot("v", "qv") / (F.sqrt("nsq") * F.sqrt("qn"))
    return (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_raw", cos_raw)
        .orderBy(F.desc("cos_raw"), "vec_id")
        .limit(k)
        .select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.round("cos_raw", 6).alias("cos_sim"),
        )
    )


# --- label centroids (grouped vector aggregation) ------------------------

@register(
    "sim_label_centroid",
    oracle="""
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
), x AS (
  SELECT label, unnest(v) AS val,
         generate_subscripts(v, 1) AS dim
  FROM e
)
SELECT label, COUNT(DISTINCT dim) AS dims,
       CAST(SUM(CASE WHEN dim = 1 THEN CAST(val AS DECIMAL(38,10)) END) AS DOUBLE) AS centroid_d1,
       CAST(SUM(CASE WHEN dim = 2 THEN CAST(val AS DECIMAL(38,10)) END) AS DOUBLE) AS centroid_d2
FROM x
GROUP BY label
ORDER BY label
""",
)
def sim_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector sums (centroid numerators) for the first two
    dimensions, in exact decimal — grouped vector aggregation via
    posexplode (the relational form of a vector reduce)."""
    e = _vectors(spark, sf_dir)
    x = e.select(
        "label", F.posexplode("v").alias("pos", "val")
    ).withColumn("dim", F.col("pos") + 1)
    return (
        x.groupBy("label")
        .agg(
            F.countDistinct("dim").alias("dims"),
            F.sum(F.when(F.col("dim") == 1, F.col("val").cast("decimal(38,10)")))
            .cast("double").alias("centroid_d1"),
            F.sum(F.when(F.col("dim") == 2, F.col("val").cast("decimal(38,10)")))
            .cast("double").alias("centroid_d2"),
        )
        .orderBy("label")
    )


# --- J9 scale path: int8 embedding quantization ---------------------------

def quantize_embedding(v, bits: int = 8) -> Column:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i / scale + 0.5). Shrinks vector storage/shuffle bytes
    4× (float32→int8; 8× vs float64) — at 100 TB the scan is the cost,
    so this is the single biggest ANN lever. Expression-level (no
    Python); returns struct{q: array<tinyint>, scale: double}.

    The rounding is the repo's portable half-up form (floor(x+0.5), not
    engine ROUND): pure IEEE double ops both engines compute
    identically, which is what lets sim_quantized_knn carry a full
    DuckDB differential oracle instead of a rows-only check."""
    qmax = float(2 ** (bits - 1) - 1)
    absmax = F.aggregate(
        F.transform(v, lambda x: F.abs(x)), F.lit(0.0),
        lambda s, x: F.greatest(s, x),
    )
    scale = absmax / F.lit(qmax)
    q = F.transform(
        v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint")
    )
    return F.struct(q.alias("q"), scale.alias("scale"))


def dequantize_embedding(qs) -> Column:
    """Approximate reconstruction: x_i ≈ q_i * scale."""
    return F.transform(qs["q"], lambda x: x.cast("double") * qs["scale"])


_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sc AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> abs(x))), (s, x) -> greatest(s, x))
           / 127.0 AS scale
  FROM e
), dq AS (
  SELECT vec_id,
         list_transform(v, x -> floor(x / scale + 0.5) * scale) AS w
  FROM sc
), n AS (
  SELECT vec_id, w,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(w, x -> x * x)), (s, x) -> s + x) AS nsq
  FROM dq
), qv AS (
  SELECT w AS qw, nsq AS qn FROM n WHERE vec_id = 0
), cos AS (
  SELECT n.vec_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(n.w) + 1), i -> n.w[i] * qv.qw[i])),
             (s, x) -> s + x) / (sqrt(n.nsq) * sqrt(qv.qn)) AS cos_raw
  FROM n, qv WHERE n.vec_id <> 0
)
SELECT vec_id, ROUND(cos_raw, 6) AS cos_sim
FROM cos ORDER BY cos_raw DESC, vec_id LIMIT 10
"""


@register("sim_quantized_knn", oracle=_QUANT_ORACLE)
def sim_quantized_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN of vec_id=0 over int8-quantized vectors: quantize (4-8× less
    I/O), dequantize, exact cosine on the reconstruction.

    Fully differentially checked (round-4 upgrade from rows-only): the
    quantizer is pure portable IEEE arithmetic (absmax fold → scale →
    floor-half-up → reconstruct), so the oracle replays quantize →
    dequantize → cosine with bit-identical folds and the top-10 must
    hash-match — the quantization LOSS itself is what's being pinned,
    not just the ranking. The recall-vs-exact bound is additionally
    pinned by test_quantized_knn_recall."""
    e = _vectors(spark, sf_dir).withColumn(
        "qs", quantize_embedding(F.col("v"))
    ).withColumn("dq", dequantize_embedding(F.col("qs"))).drop("v")
    e = e.withColumn("nsq", norm_sq("dq"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("dq").alias("qv"), F.col("nsq").alias("qn")
    )
    cos_raw = dot("dq", "qv") / (F.sqrt("nsq") * F.sqrt("qn"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_raw", cos_raw)
        .orderBy(F.desc("cos_raw"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


# --- J4 batch serving: top-k for a SET of query vectors ------------------

@register(
    "sim_batch_knn",
    oracle="""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x) AS nsq
  FROM e
), q AS (
  SELECT vec_id AS qid, v AS qv, nsq AS qn FROM n WHERE vec_id < 10
), c AS (
  SELECT vec_id, v, nsq FROM n WHERE vec_id >= 10
), s AS (
  SELECT q.qid, c.vec_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(c.v) + 1), i -> c.v[i] * q.qv[i])),
             (s, x) -> s + x) / (sqrt(c.nsq) * sqrt(q.qn)) AS cos_raw
  FROM c, q
), r AS (
  SELECT qid, vec_id, cos_raw,
         row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vec_id) AS rn
  FROM s
)
SELECT qid, vec_id, ROUND(cos_raw, 6) AS cos_sim, rn
FROM r
WHERE rn <= 5
ORDER BY qid, rn
""",
)
def sim_batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 at serving shape: top-5 neighbors for a BATCH of query vectors
    (qids 0–9) in one corpus pass — broadcast the query set, dot-product
    expression per (corpus row x query), per-query top-k via
    row_number + WindowGroupLimit (ranks beyond k pruned pre-sort).

    100 TB posture: query batches are KBs–MBs (broadcast), the corpus is
    scanned ONCE regardless of batch size, and the only shuffle is the
    per-qid window — hash-partitioned on qid, so it scales with the
    batch, not the corpus. Contrast with one-query-at-a-time sim_knn:
    batch amortizes the scan across all queries."""
    from pyspark.sql.window import Window as W

    e = _vectors(spark, sf_dir).withColumn("nsq", norm_sq("v"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nsq").alias("qn"),
    )
    cos_raw = dot("v", "qv") / (F.sqrt("nsq") * F.sqrt("qn"))
    w = W.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        e.filter(F.col("vec_id") >= 10)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_raw", cos_raw)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "qid", "vec_id",
            F.round("cos_raw", 6).alias("cos_sim"), "rn",
        )
        .orderBy("qid", "rn")
    )


# --- SemDeDup: embedding-space semantic deduplication ---------------------
#
# Semantic dedup per Abbas et al. 2023 ("SemDeDup: Data-efficient
# learning at web-scale through semantic deduplication", arXiv
# 2303.09540): cluster the corpus embeddings with a coarse quantizer
# (k-means — the SAME persisted IVF index the ANN tier uses), then
# compare pairs ONLY within a cluster and drop all but one member of
# each semantic-duplicate pair. Pairwise work is bounded per cell
# (~(n/nlist)² per cell, nlist ∝ n at scale — never all-pairs), which
# is exactly why the paper scales to web corpora.
#
# τ: production SemDeDup uses ~0.9+ on corpora with true semantic
# duplicates. The synthetic embeddings table has NO planted near-dups
# (measured max within-cell cosine at sf0.01 is 0.51), so the
# registered query uses τ=0.4 — the top ~0.2% cosine tail — to keep
# the differential check exercising a real, non-empty drop set at both
# audit SFs. The threshold comparison is safe cross-engine because both
# sides compute the identical sequential IEEE fold.

SEMDEDUP_TAU = 0.4

_SEMDEDUP_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, v, nsq, CAST(cluster AS BIGINT) AS cell
  FROM read_parquet('{IVF_AUDIT_DIR}/vectors/*/*.parquet',
                    hive_partitioning = true)
), pairs AS (
  SELECT b.vec_id, b.cell, a.vec_id AS kept,
         {_FOLD.format(terms=(
             "list_transform(range(1, len(a.v) + 1),"
             " i -> a.v[i] * b.v[i])"
         ))} / (sqrt(a.nsq) * sqrt(b.nsq)) AS cos_raw
  FROM vecs a JOIN vecs b ON a.cell = b.cell AND a.vec_id < b.vec_id
), qual AS (
  SELECT vec_id, cell, kept, cos_raw,
         row_number() OVER (PARTITION BY vec_id ORDER BY kept) AS rn
  FROM pairs WHERE cos_raw >= {SEMDEDUP_TAU}
)
SELECT vec_id, cell, kept AS dup_of, ROUND(cos_raw, 6) AS cos_sim
FROM qual WHERE rn = 1 ORDER BY vec_id
"""


def semdedup(spark: SparkSession, index_dir: str,
             tau: float = 0.9, min_vec_id: int | None = None) -> DataFrame:
    """SemDeDup over a persisted IVF index (the public API — pass any
    index built by :func:`build_ivf_index` / appended by
    :func:`ivf_index_append`): a vector is REMOVED iff some lower-id
    vector in the SAME k-means cell has cosine ≥ ``tau`` with it;
    ``dup_of`` reports the smallest such keeper (min-id owner rule —
    deterministic, same convention as t13's novelty owner). Returns
    the removal list (vec_id, cell, dup_of, cos_sim); anti-join it
    against the corpus to materialize the deduplicated set.

    ``min_vec_id`` is the dedup-on-ingest mode: with ids assigned
    monotonically (``ivf_index_append`` batches), passing the first id
    of the newest batch restricts the REMOVAL-candidate side to that
    batch — the result equals the batch's slice of a full run (owners
    are always lower-id, so nothing outside the batch can change), but
    the join costs O(batch × cell) instead of O(store × cell). This is
    how a 100 TB ingest pipeline runs semantic dedup continuously:
    append to the index, dedup only the delta.

    100 TB posture: the self-join is an equi-join on ``cell`` (one
    shuffle, cardinality nlist); per-task pair work is bounded by the
    cell size the quantizer controls (nlist ∝ corpus size, the paper's
    own scaling rule). No all-pairs path exists here."""
    import os

    from pyspark.sql.window import Window as W

    vecs = spark.read.parquet(os.path.join(index_dir, "vectors")).select(
        "vec_id", "v", "nsq", F.col("cluster").cast("bigint").alias("cell")
    )
    if min_vec_id is not None:
        # candidate (removal) side only; the owner side stays the full
        # store — Catalyst pushes this filter into the left scan
        candidates = vecs.filter(F.col("vec_id") >= min_vec_id)
    else:
        candidates = vecs
    a = vecs.select(
        F.col("vec_id").alias("kept"), F.col("cell").alias("ca"),
        F.col("v").alias("va"), F.col("nsq").alias("na"),
    )
    # zero-magnitude vectors (failed-encoder rows in real corpora) have
    # undefined cosine: exclude them from BOTH sides up front — they can
    # neither be removed nor own a removal, and the guard keeps ANSI
    # mode's divide-by-zero from killing the job
    candidates = candidates.filter(F.col("nsq") > 0)
    a = a.filter(F.col("na") > 0)
    cos_raw = dot("va", "v") / (F.sqrt("na") * F.sqrt("nsq"))
    w = W.partitionBy("vec_id").orderBy("kept")
    return (
        candidates.join(a, (F.col("ca") == F.col("cell"))
                        & (F.col("kept") < F.col("vec_id")))
        .withColumn("cos_raw", cos_raw)
        .filter(F.col("cos_raw") >= tau)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", F.col("kept").alias("dup_of"),
                F.round("cos_raw", 6).alias("cos_sim"))
        .orderBy("vec_id")
    )


@register("dedup_semantic", oracle=_SEMDEDUP_ORACLE)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup differential: :func:`semdedup` over the SHARED audit
    index, τ=SEMDEDUP_TAU (0.4 — see module note: the synthetic corpus
    has no true near-dups; production runs ~0.9).

    Reads the cluster-partitioned index artifacts (not the raw table),
    so the oracle recomputes the identical pair set from the identical
    persisted assignment — the same differential pattern as
    sim_ivf_knn/sim_ivf_probe. Cosine is the left-fold dot over the
    precomputed ``nsq`` norms, bit-equal to the oracle's list_reduce."""
    return semdedup(spark, _ensure_ivf_index(spark, sf_dir),
                    tau=SEMDEDUP_TAU)


# --- J4+: two-stage retrieval via dimension truncation (MRL-style) -------

TRUNC_DIMS = 8
TRUNC_CANDIDATES = 50


@register(
    "sim_truncated_rerank",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         (embedding::DOUBLE[])[1:{TRUNC_DIMS}] AS tv
  FROM embeddings
), n AS (
  SELECT vec_id, v, tv,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x) AS nsq,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(tv, x -> x * x)), (s, x) -> s + x) AS tnsq
  FROM e
), q AS (
  SELECT v AS qv, tv AS qtv, nsq AS qn, tnsq AS qtn FROM n WHERE vec_id = 0
), cand AS (
  SELECT n.vec_id, n.v, n.nsq, q.qv, q.qn,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, {TRUNC_DIMS} + 1),
                            i -> n.tv[i] * q.qtv[i])),
             (s, x) -> s + x) / (sqrt(n.tnsq) * sqrt(q.qtn)) AS tcos
  FROM n, q
  WHERE n.vec_id <> 0
  ORDER BY tcos DESC, n.vec_id
  LIMIT {TRUNC_CANDIDATES}
), rer AS (
  SELECT vec_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])),
             (s, x) -> s + x) / (sqrt(nsq) * sqrt(qn)) AS cos_raw
  FROM cand
)
SELECT vec_id, ROUND(cos_raw, 6) AS cos_sim
FROM rer
ORDER BY cos_raw DESC, vec_id
LIMIT 10
""",
)
def sim_truncated_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval by DIMENSION TRUNCATION (the
    Matryoshka/adaptive-retrieval pattern): stage 1 scores cosine on
    the first 8 components only and keeps the top
    50 candidates (deterministic (tcos, vec_id) cut);
    stage 2 reranks just those with the exact full-dimension cosine.
    Differentially proven END TO END — the oracle recomputes both the
    candidate cut and the rerank, so a truncation or tie-break drift
    anywhere in the funnel flips the final rows.

    Scale: stage 1 reads 8/d of the vector payload when
    embeddings are stored prefix-sliced (a column of the first dims —
    the MRL storage layout); both stages are broadcast-query scans with
    TakeOrderedAndProject cuts, and the rerank touches only
    50 rows. Composes with the IVF router for the
    production path (route → truncated sieve → exact rerank).

    RECALL caveat, measured: the fixture embeddings are isotropic
    random vectors, so an 8/64 prefix carries only ~1/8 of the cosine
    signal — recall@10 vs exact is 0.6 at sf0.01 (500 vectors) and 0.0
    at sf0.1 (5k vectors, top-50 cut). That is the information-
    theoretic behavior of UNTRAINED prefixes, not a funnel defect (the
    funnel itself is oracle-proven end to end); production MRL
    embeddings are trained to front-load signal, and the candidate
    budget scales like lsh_scaled's granularity rule (candidates ∝ n
    holds recall roughly constant)."""
    e = _vectors(spark, sf_dir).select(
        "vec_id", "v", F.slice("v", 1, TRUNC_DIMS).alias("tv")
    )
    e = e.withColumn("nsq", norm_sq("v")).withColumn("tnsq", norm_sq("tv"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("tv").alias("qtv"),
        F.col("nsq").alias("qn"), F.col("tnsq").alias("qtn"),
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "tcos", dot("tv", "qtv") / (F.sqrt("tnsq") * F.sqrt("qtn"))
        )
        .orderBy(F.desc("tcos"), "vec_id")
        .limit(TRUNC_CANDIDATES)
    )
    rer = cand.withColumn(
        "cos_raw", dot("v", "qv") / (F.sqrt("nsq") * F.sqrt("qn"))
    )
    return (
        rer.orderBy(F.desc("cos_raw"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


# --- J9c scale path: binary (1-bit) quantization + Hamming prefilter ------

#: Hamming-prefilter candidate pool (rerank reads raw vectors for these).
BINARY_CANDIDATES = 50


def binarize_embedding(v) -> Column:
    """1-bit sign quantization: bit i set iff ``v[i] > 0``, packed into
    TWO bigints of 32 bits each (lo = dims 1-32, hi = dims 33-64).
    The 32-bit halves keep every partial sum strictly below 2^32, so
    plain integer addition of distinct powers is exact and overflow-free
    in BOTH engines under ANSI semantics — packing the full 64 dims into
    one bigint would put dim 64 on the sign bit, where engines disagree
    about shift overflow. Returns struct{lo, hi}.

    At 100 TB this is the cheapest ANN prefilter there is: 16 bytes per
    vector vs 256-512 for the floats (16-32× less scan I/O), and the
    distance is two XORs + two popcounts — whole-stage-codegen integer
    ops, no floating point at all."""
    def _half(start: int) -> Column:
        # 2^i via pow: exact in IEEE doubles for i <= 31 (shiftleft's
        # numBits arg must be a Python int, so it can't take the
        # transform index), and the bigint cast of an exact power is
        # exact in both engines.
        return F.aggregate(
            F.transform(
                F.slice(v, start, 32),
                lambda x, i: F.when(
                    x > 0, F.pow(F.lit(2.0), i).cast("bigint")
                ).otherwise(F.lit(0).cast("bigint")),
            ),
            F.lit(0).cast("bigint"),
            lambda s, x: s + x,
        )

    return F.struct(_half(1).alias("lo"), _half(33).alias("hi"))


def hamming_distance(a, b) -> Column:
    """Popcount Hamming distance between two packed signatures
    (struct{lo, hi})."""
    return (
        F.bit_count(a["lo"].bitwiseXOR(b["lo"]))
        + F.bit_count(a["hi"].bitwiseXOR(b["hi"]))
    )


_BINARY_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sig AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, 33), i ->
                 CASE WHEN v[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
                      ELSE CAST(0 AS BIGINT) END)),
             (s, x) -> s + x) AS lo,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(33, 65), i ->
                 CASE WHEN v[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 33))
                      ELSE CAST(0 AS BIGINT) END)),
             (s, x) -> s + x) AS hi
  FROM e
), q AS (
  SELECT v AS qv, lo AS qlo, hi AS qhi FROM sig WHERE vec_id = 0
), ham AS (
  SELECT sig.vec_id, sig.v,
         bit_count(xor(sig.lo, q.qlo)) + bit_count(xor(sig.hi, q.qhi))
           AS hamming,
         q.qv
  FROM sig, q WHERE sig.vec_id <> 0
), cand AS (
  SELECT * FROM ham ORDER BY hamming, vec_id LIMIT 50
), rer AS (
  SELECT vec_id, hamming,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])),
             (s, x) -> s + x)
           / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(v, x -> x * x)), (s, x) -> s + x))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(qv, x -> x * x)), (s, x) -> s + x)))
           AS cos_raw
  FROM cand
)
SELECT vec_id, hamming, ROUND(cos_raw, 6) AS cos_sim
FROM rer ORDER BY cos_raw DESC, vec_id LIMIT 10
"""


@register("sim_binary_hamming", oracle=_BINARY_ORACLE)
def sim_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN of vec_id=0 through the binary-quantization funnel: pack
    sign bits (16 B/vector), Hamming-prefilter to a 50-candidate pool
    (TakeOrderedAndProject — integer XOR/popcount over the packed
    signatures, the only full-corpus pass), exact cosine rerank on the
    candidates' raw vectors.

    Fully differentially checked: the packing is deterministic integer
    arithmetic (distinct powers of two summed within 32-bit halves) and
    the oracle re-derives signatures, Hamming distances, the candidate
    cut AND the rerank from the raw embeddings in SQL — hash equality
    pins the entire funnel, not just the final ranking. The candidate
    ORDER BY carries vec_id so the pool is deterministic under Hamming
    ties (sign patterns collide often at 64 bits)."""
    e = _vectors(spark, sf_dir).withColumn(
        "sig", binarize_embedding(F.col("v"))
    ).withColumn("nsq", norm_sq("v"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("sig").alias("qsig"),
        F.col("v").alias("qv"),
        F.col("nsq").alias("qn"),
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("hamming", hamming_distance(F.col("sig"), F.col("qsig")))
        .orderBy("hamming", "vec_id")
        .limit(BINARY_CANDIDATES)
    )
    rer = cand.withColumn(
        "cos_raw", dot("v", "qv") / (F.sqrt("nsq") * F.sqrt("qn"))
    )
    return (
        rer.orderBy(F.desc("cos_raw"), "vec_id")
        .limit(10)
        .select(
            "vec_id", "hamming", F.round("cos_raw", 6).alias("cos_sim")
        )
    )


# --- J9d scale path: Johnson-Lindenstrauss sign projection ----------------

#: Projected dimensionality (64 -> 32: 2x less prefilter compute/IO;
#: the synthetic corpus is near-random — cosine margins are tiny — so
#: harder reductions lose too much separation to prefilter reliably).
JL_DIM = 32


def _jl_sign(i: int, j: int) -> int:
    """Deterministic PORTABLE ±1 for matrix cell (i, j): +1 iff the
    first hex digit of md5("i-j") is 0-7 (the top bit of the digest).
    hashlib on the Spark side and DuckDB's md5() agree bit-for-bit, so
    the oracle can re-derive the projection matrix — the same portable
    -hash precedent as the minhash/simhash twins."""
    import hashlib

    return 1 if hashlib.md5(f"{i}-{j}".encode()).hexdigest()[0] in "01234567" else -1


def jl_project(v, in_dim: int = 64, out_dim: int = JL_DIM):
    """Sparse-sign Johnson-Lindenstrauss projection: out_j = Σ_i
    s(i,j)·v_i with a deterministic ±1 sign matrix (Achlioptas'
    database-friendly variant with density 1). Terms are added in
    ascending-i LEFT-FOLD order — the one float-parity rule that lets
    the DuckDB oracle reproduce the projection bit-for-bit.

    Scale: halving the dimensionality shrinks the ANN prefilter's
    compute and (if the projection is persisted) its scan I/O, while
    JL keeps relative distances within (1±ε); the exact rerank on
    survivors erases the residual error in top-k terms.

    The projection compiles to a STRAIGHT-LINE ±-term expression built
    as one SQL string (a single py4j round-trip) — whole-stage codegen
    turns it into branch-free scalar arithmetic, measured flat per row
    at 10× and 3× corpus growth. The two rejected spellings both fail
    at one end: per-term Column objects cost thousands of py4j
    round-trips (~11 s of driver-side plan construction), and
    zip_with+aggregate constructs instantly but is INTERPRETED per
    element — per-row array allocation turned the g1→g3 probe
    super-linear (6.9× at 3× data) from GC pressure alone. The
    left-assoc +/- chain parses to the same left-fold order the
    oracle's list_reduce replays, so bit-for-bit parity holds.

    ``v`` is the NAME of an array<double> column (the SQL fragment has
    to reference it by name; Spark SQL array indexing is 0-based)."""
    if not isinstance(v, str):
        raise TypeError("jl_project takes the input COLUMN NAME")
    terms = []
    for j in range(out_dim):
        chain = "".join(
            (" + " if _jl_sign(i, j) > 0 else " - ") + f"`{v}`[{i}]"
            for i in range(in_dim)
        )
        # leading " + x" / " - x" → "x" / "-x" (IEEE negation of the
        # first term equals the oracle's CASE-negated first element)
        terms.append(
            chain[3:] if chain.startswith(" + ") else "-" + chain[3:]
        )
    return F.expr("array(" + ", ".join(terms) + ")")


_JL_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), p AS (
  SELECT vec_id, v,
         list_transform(range(0, 32), j ->
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(0, 64), i ->
                     CASE WHEN substr(md5(CAST(i AS VARCHAR) || '-' ||
                                      CAST(j AS VARCHAR)), 1, 1)
                               BETWEEN '0' AND '7'
                          THEN v[i + 1] ELSE -v[i + 1] END)),
                 (s, x) -> s + x)) AS w
  FROM e
), n AS (
  SELECT vec_id, v, w,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(w, x -> x * x)), (s, x) -> s + x) AS wsq,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x) AS vsq
  FROM p
), q AS (
  SELECT v AS qv, w AS qw, wsq AS qwsq, vsq AS qvsq FROM n WHERE vec_id = 0
), cand AS (
  SELECT n.vec_id, n.v, n.vsq, q.qv, q.qvsq,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, 33), i -> n.w[i] * q.qw[i])),
             (s, x) -> s + x) / (sqrt(n.wsq) * sqrt(q.qwsq)) AS pcos
  FROM n, q WHERE n.vec_id <> 0
  ORDER BY pcos DESC, vec_id LIMIT 100
), rer AS (
  SELECT vec_id, ROUND(pcos, 6) AS proj_cos,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, 65), i -> v[i] * qv[i])),
             (s, x) -> s + x) / (sqrt(vsq) * sqrt(qvsq)) AS cos_raw
  FROM cand
)
SELECT vec_id, proj_cos, ROUND(cos_raw, 6) AS cos_sim
FROM rer ORDER BY cos_raw DESC, vec_id LIMIT 10
"""


@register("sim_jl_projection", oracle=_JL_ORACLE)
def sim_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN of vec_id=0 through the JL funnel: project 64→16 dims with
    the deterministic sign matrix, cosine prefilter in projected space
    to a 50-candidate pool (TakeOrderedAndProject), exact 64-dim rerank.
    Fully differentially checked — the oracle re-derives the SIGN
    MATRIX itself from md5, replays the projection with the identical
    left-fold order, and recomputes prefilter, cut and rerank; hash
    equality pins the whole funnel including the projection
    arithmetic.

    Round-14 (r13 verdict #6 profile): without a barrier, CollapseProject
    folds the 2048-term ``w`` chain INTO every consumer expression
    (``pcos``, ``wsq``, the prefilter sort key) — and an expression that
    size falls out of whole-stage codegen into interpreted eval, so each
    row re-evaluates the mega-expression several times with no CSE.  The
    ``repartition("vec_id")`` exchange materializes (w, wsq, vsq) ONCE;
    downstream stages reference them as attributes (small, codegen-able
    expressions).  It also spreads the single-split scan to full width —
    the round-9 "exchange materializes the chain" rule; interleaved A/B
    min-of-6: 3.26 → 2.31 s, rows identical."""
    e = _vectors(spark, sf_dir).withColumn("w", jl_project("v"))
    e = e.withColumn("wsq", norm_sq("w")).withColumn("vsq", norm_sq("v"))
    e = e.repartition("vec_id")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("w").alias("qw"), F.col("wsq").alias("qwsq"),
        F.col("v").alias("qv"), F.col("vsq").alias("qvsq"),
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("pcos", dot("w", "qw") / (F.sqrt("wsq") * F.sqrt("qwsq")))
        .orderBy(F.desc("pcos"), "vec_id")
        .limit(100)
    )
    rer = cand.withColumn(
        "cos_raw", dot("v", "qv") / (F.sqrt("vsq") * F.sqrt("qvsq"))
    )
    return (
        rer.orderBy(F.desc("cos_raw"), "vec_id")
        .limit(10)
        .select(
            "vec_id",
            F.round("pcos", 6).alias("proj_cos"),
            F.round("cos_raw", 6).alias("cos_sim"),
        )
    )


# --- J4+/J2+ streaming ingest: continuous dedup-on-ingest -------------------


def semdedup_ingest_foreach_batch(index_dir: str, out_dir: str,
                                  tau: float = 0.9):
    """foreachBatch handler for CONTINUOUS dedup-on-ingest: each
    micro-batch of (vec_id, v) is (1) appended to the persisted IVF
    index with no refit and (2) delta-semdeduped
    (``min_vec_id`` = the batch's smallest id — the L111 invariant:
    owners are always lower-id, so the delta equals the batch's slice
    of a full run), with the removal list written to
    ``out_dir/batch=<epoch_id>``.

    Restart semantics (exactly-once effect without a transactional
    store): a replayed batch (crash before the checkpoint commit) is
    made idempotent two ways — the APPEND anti-joins the batch against
    vec_ids already in the store (replayed vectors fold away, the
    same RF×-duplicates-fold-to-one-copy discipline the Cassandra
    tests pin), and the RESULT write overwrites the deterministic
    per-batch directory. Requires vec_ids assigned monotonically
    across batches (the dedup-on-ingest contract).

    Scale: the anti-join reads only the store's vec_id column
    (column-pruned); the delta join is O(batch × cell). At 100 TB the
    vec_id read becomes a bloom/ledger lookup — this is the semantics
    seam, not the physical index."""
    import os

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        first = batch.agg(F.min("vec_id")).first()
        if first is None or first[0] is None:
            return
        min_id = first[0]
        existing = spark.read.parquet(
            os.path.join(index_dir, "vectors")
        ).select("vec_id")
        fresh = batch.select("vec_id", "v").join(
            existing, "vec_id", "left_anti"
        )
        if fresh.limit(1).count():
            # the delta-dedup contract REQUIRES monotone ids across
            # batches (owners are lower-id). A genuinely new vector
            # below the store's high-water is not a replay — it would
            # silently produce wrong deltas, so refuse loudly.
            hw = existing.agg(F.max("vec_id")).first()[0]
            lo = fresh.agg(F.min("vec_id")).first()[0]
            if hw is not None and lo <= hw:
                raise ValueError(
                    f"dedup-on-ingest requires monotone vec_ids: batch "
                    f"{batch_id} carries NEW id {lo} at or below the "
                    f"store's high-water {hw} — re-id the stream or "
                    f"rebuild the index"
                )
            ivf_index_append(spark, index_dir, fresh)
        (
            semdedup(spark, index_dir, tau=tau, min_vec_id=min_id)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={batch_id}"))
        )

    return handle


def start_semdedup_ingest_stream(
    spark: SparkSession,
    stage_dir: str,
    schema,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    tau: float = 0.9,
):
    """Run the continuous dedup-on-ingest pipeline as a real Structured
    Streaming query over a parquet file source (one file per
    micro-batch, availableNow — drains what exists, then stops;
    re-invoke after a restart and the checkpoint resumes from the
    first unprocessed file). Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    return (
        stream.writeStream
        .foreachBatch(semdedup_ingest_foreach_batch(index_dir, out_dir, tau))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
