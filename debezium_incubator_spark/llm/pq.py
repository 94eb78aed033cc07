"""Product quantization (PQ) ANN — the memory-bound scale path of the
similarity tier (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; the codebook layout FAISS calls
``IndexPQ``).

IVF (similarity.py) bounds how much of the corpus a query SCANS; PQ
bounds how many bytes per vector the scan READS: each d-dim vector is
split into ``m`` subspaces of ``d/m`` dims, each subvector quantized to
one of ``ksub`` per-subspace centroids, and the vector stored as ``m``
small codes. A query never touches the original vectors — it precomputes
an m×ksub lookup table of squared-L2 distances from its own subvectors
to every centroid (asymmetric distance computation, ADC), and a
candidate's approximate distance is m table lookups + (m−1) adds.

Spark mapping (all expression-level, no UDF):

- **build**: one deterministic KMeans per subspace over ``F.slice`` of
  the vector column; codes assigned by the same argmin-over-structs
  expression the IVF append path uses (ties → lower code id);
- **store**: ``codes.parquet`` holds (vec_id, codes) ONLY — at 100 TB
  the ADC scan reads m ints per vector instead of d floats (here
  4 vs 64 doubles), and column pruning keeps the original vectors out
  of the plan entirely (ReadSchema audited in tests);
- **query**: the LUT is m·ksub doubles — control-plane, computed
  driver-side with the engine's bit-reproducible left fold and inlined
  as array literals (beyond a few thousand entries, switch to a
  broadcast join). Top-k is orderBy+limit (TakeOrderedAndProject — no
  global sort materialization).

Differential oracle: DuckDB reads the PERSISTED codebooks, re-derives
every vector's codes from the raw embeddings by the same argmin
(tie → lower code), rebuilds the LUT with the same left fold, and sums
the m lookups in the same fixed subspace order — so equality proves the
persisted codes are the true argmin assignment AND the ADC arithmetic,
not just that two copies of one pipeline agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._audit import ensure_artifact
from .similarity import _sq_l2, _vectors

PQ_M = 4          # subspaces
PQ_KSUB = 16      # centroids per subspace
PQ_DIM = 64       # fixture embedding dim (build validates)
PQ_AUDIT_DIR = "/tmp/dis_pq_index_current"

_FOLD = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), (s, x) -> s + x)"
)
_DSUB = PQ_DIM // PQ_M


def _sub_slice(v, sub: int, dsub: int):
    return F.slice(v, sub * dsub + 1, dsub)


def _fold_sq_l2(sv, centroid: list[float]):
    """Squared L2 between a subvector column and a centroid literal as
    the engine's canonical left fold (zip, square, sequential sum) —
    bit-identical to the oracle's list_reduce and the driver-side
    _sq_l2."""
    clit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(sv, clit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_code(sv, codebook: list[list[float]]):
    """argmin over the subspace codebook; lexicographic struct min
    breaks exact distance ties toward the lower code id (the oracle's
    ORDER BY d, code)."""
    structs = [
        F.struct(_fold_sq_l2(sv, c).alias("d"), F.lit(i).alias("c"))
        for i, c in enumerate(codebook)
    ]
    return F.array_min(F.array(*structs))["c"]


def build_pq_index(
    source: DataFrame,
    index_dir: str,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    seed: int = 42,
    max_iter: int = 10,
) -> None:
    """One-time PQ indexing pass over ``source`` (vec_id, v:array<double>):

    - ``{index_dir}/codebooks`` — m·ksub rows (sub, code, centroid);
    - ``{index_dir}/codes``     — (vec_id, codes:array<int>), the ONLY
      thing queries scan.

    The per-subspace KMeans fits are seeded (seed+sub) and the encoding
    uses the PERSISTED centroid doubles, so codes are exactly the argmin
    against what the codebook file says — the property the differential
    oracle checks. 100 TB posture: m bounded passes for the fits (or one
    pass over a sample), then ONE scan to encode; the codes table is
    m/d·(code width/8) of the vector bytes."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = source.sparkSession
    # round-14 (guide §2.6 + §5): the m per-subspace fits each run
    # ~maxIter driver-paced jobs over the corpus — persist it for the
    # build's duration (within-run only, unpersisted below: CacheManager
    # reuse across invocations cannot happen once released) and OVERLAP
    # the fits from a thread pool.  Each fit is an independent seeded
    # KMeans over its own deterministic slice, so concurrent scheduling
    # cannot change any codebook — only the idle tail between one fit's
    # sequential iterations is reclaimed.
    source = source.persist()
    try:
        dim = len(source.select("v").first().v)
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        dsub = dim // m

        def _fit(s: int) -> list[list[float]]:
            sub = source.select(
                array_to_vector(_sub_slice("v", s, dsub)).alias("fv")
            )
            model = KMeans(
                k=ksub, seed=seed + s, maxIter=max_iter,
                featuresCol="fv", predictionCol="code",
            ).fit(sub)
            return [[float(x) for x in c] for c in model.clusterCenters()]

        with ThreadPoolExecutor(max_workers=m) as pool:
            codebooks: list[list[list[float]]] = list(
                pool.map(_fit, range(m))
            )
        codes = source.select(
            "vec_id",
            F.array(*[
                _argmin_code(_sub_slice("v", s, dsub), codebooks[s])
                for s in range(m)
            ]).alias("codes"),
        )
        codes.write.mode("overwrite").parquet(f"{index_dir}/codes")
    finally:
        source.unpersist()
    cb_rows = [
        (s, c, codebooks[s][c])
        for s in range(m) for c in range(ksub)
    ]
    spark.createDataFrame(
        cb_rows, "sub INT, code INT, centroid ARRAY<DOUBLE>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/codebooks")


def pq_adc(
    spark: SparkSession,
    index_dir: str,
    query_v: list[float],
    k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """ADC top-k over a persisted PQ index: LUT built driver-side from
    the codebook file (control-plane, m·ksub rows) with the canonical
    left fold, approximate distance = fixed-order sum of the m lookups,
    candidates ranked ascending (ties → vec_id). Scans codes only."""
    cb = spark.read.parquet(f"{index_dir}/codebooks").collect()
    m = 1 + max(r.sub for r in cb)
    dsub = len(cb[0].centroid)
    qv = [float(x) for x in query_v]
    if len(qv) != m * dsub:
        raise ValueError(
            f"query dim {len(qv)} != index dim {m * dsub}"
        )
    lut: dict[int, dict[int, float]] = {s: {} for s in range(m)}
    for r in cb:
        lut[r.sub][r.code] = _sq_l2(qv[r.sub * dsub:(r.sub + 1) * dsub],
                                    r.centroid)
    codes = spark.read.parquet(f"{index_dir}/codes")
    if exclude_vec_id is not None:
        codes = codes.filter(F.col("vec_id") != exclude_vec_id)
    approx = None
    for s in range(m):
        lut_s = F.array(*[
            F.lit(lut[s][c]) for c in range(len(lut[s]))
        ])
        term = F.element_at(lut_s, F.element_at("codes", s + 1) + 1)
        approx = term if approx is None else approx + term
    return (
        codes.withColumn("approx_raw", approx)
        .orderBy("approx_raw", "vec_id")
        .limit(k)
    )


def _ensure_pq_index(spark: SparkSession, sf_dir: str) -> str:
    import os

    return ensure_artifact(
        os.path.join(sf_dir, "embeddings.parquet"),
        PQ_AUDIT_DIR,
        lambda d: build_pq_index(_vectors(spark, sf_dir), d),
    )


_PQ_ORACLE = f"""
WITH cb AS (
  SELECT sub, code, centroid
  FROM read_parquet('{PQ_AUDIT_DIR}/codebooks/*.parquet')
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0
), vd AS (
  SELECT b.vec_id, cb.sub, cb.code,
         {_FOLD.format(terms=(
             f"list_transform(range(1, {_DSUB} + 1),"
             f" i -> (b.v[cb.sub * {_DSUB} + i] - cb.centroid[i])"
             f" * (b.v[cb.sub * {_DSUB} + i] - cb.centroid[i]))"
         ))} AS d
  FROM base b CROSS JOIN cb
), codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (
             PARTITION BY vec_id, sub ORDER BY d, code) AS rn
    FROM vd
  ) WHERE rn = 1
), lut AS (
  SELECT cb.sub, cb.code,
         {_FOLD.format(terms=(
             f"list_transform(range(1, {_DSUB} + 1),"
             f" i -> (q.qv[cb.sub * {_DSUB} + i] - cb.centroid[i])"
             f" * (q.qv[cb.sub * {_DSUB} + i] - cb.centroid[i]))"
         ))} AS d
  FROM cb CROSS JOIN q
), adc AS (
  SELECT c.vec_id,
         max(CASE WHEN c.sub = 0 THEN l.d END)
         + max(CASE WHEN c.sub = 1 THEN l.d END)
         + max(CASE WHEN c.sub = 2 THEN l.d END)
         + max(CASE WHEN c.sub = 3 THEN l.d END) AS dist
  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
  GROUP BY c.vec_id
)
SELECT vec_id, ROUND(dist, 6) AS approx_dist
FROM adc ORDER BY dist, vec_id LIMIT 10
"""


def pq_index_append(spark: SparkSession, index_dir: str,
                    batch: DataFrame) -> int:
    """Incremental PQ maintenance: encode NEW vectors (vec_id,
    v:array<double>) against the EXISTING codebooks and append their
    codes — no refit, no rewrite (mirrors ivf_index_append; the same
    drift-vs-refit tradeoff applies). Returns appended row count."""
    cb: dict[int, dict[int, list[float]]] = {}
    for r in spark.read.parquet(f"{index_dir}/codebooks").collect():
        cb.setdefault(r.sub, {})[r.code] = list(r.centroid)
    m = len(cb)
    dsub = len(cb[0][0])
    codebooks = [[cb[s][c] for c in range(len(cb[s]))] for s in range(m)]
    codes = batch.select(
        "vec_id",
        F.array(*[
            _argmin_code(_sub_slice("v", s, dsub), codebooks[s])
            for s in range(m)
        ]).alias("codes"),
    )
    n = codes.count()
    codes.write.mode("append").parquet(f"{index_dir}/codes")
    return n


# ---------------------------------------------------------------------------
# IVF-PQ: residual product quantization inside IVF cells (FAISS IndexIVFPQ)
# ---------------------------------------------------------------------------
#
# The two bounds composed: IVF prunes WHICH vectors a query scans
# (nprobe/nlist of the corpus, parquet partition pruning), PQ prunes the
# BYTES per scanned vector (m codes instead of d floats). Quantizing the
# RESIDUAL v − centroid(cell) instead of v itself is what makes the
# composition better than either part: residuals concentrate near zero,
# so the same ksub spends its codes on a much smaller volume.

IVFPQ_NLIST = 8
IVFPQ_NPROBE = 3
IVFPQ_AUDIT_DIR = "/tmp/dis_ivfpq_index_current"


def build_ivfpq_index(
    source: DataFrame,
    index_dir: str,
    nlist: int = IVFPQ_NLIST,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    seed: int = 42,
    max_iter: int = 10,
) -> None:
    """One-time IVF-PQ indexing pass:

    - ``{index_dir}/coarse``    — nlist coarse centroids (the router);
    - ``{index_dir}/codebooks`` — m·ksub PQ centroids fit on RESIDUALS;
    - ``{index_dir}/codes``     — (vec_id, codes), partitionBy(cluster)
      so probes prune cell directories AND read only code bytes.

    The encode derives each vector's residual with the PERSISTED coarse
    centroid doubles (broadcast join on cluster — nlist rows next to
    the corpus scan) and assigns codes with the engine's canonical fold
    argmin, so the persisted codes are exactly reproducible from the
    persisted artifacts — the differential oracle's premise."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = source.sparkSession
    dim = len(source.select("v").first().v)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    vec = source.withColumn("fv", array_to_vector("v"))
    coarse = KMeans(
        k=nlist, seed=seed, maxIter=max_iter,
        featuresCol="fv", predictionCol="cluster",
    ).fit(vec)
    centers = [[float(x) for x in c] for c in coarse.clusterCenters()]
    cents_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "cluster INT, centroid ARRAY<DOUBLE>",
    )
    resid = (
        coarse.transform(vec)
        .join(F.broadcast(cents_df), "cluster")
        .withColumn("r", F.zip_with("v", "centroid", lambda a, b: a - b))
        .select("vec_id", "cluster", "r")
    )
    resid.persist()
    try:
        # round-14 (guide §2.6): the m residual-subspace fits are
        # independent seeded KMeans jobs over the persisted residuals —
        # overlap them (see build_pq_index; codebooks are unchanged by
        # concurrent scheduling)
        from concurrent.futures import ThreadPoolExecutor

        def _fit(s: int) -> list[list[float]]:
            sub = resid.select(
                array_to_vector(_sub_slice("r", s, dsub)).alias("fv")
            )
            model = KMeans(
                k=ksub, seed=seed + 1 + s, maxIter=max_iter,
                featuresCol="fv", predictionCol="code",
            ).fit(sub)
            return [[float(x) for x in c] for c in model.clusterCenters()]

        with ThreadPoolExecutor(max_workers=m) as pool:
            codebooks: list[list[list[float]]] = list(
                pool.map(_fit, range(m))
            )
        codes = resid.select(
            "vec_id",
            F.array(*[
                _argmin_code(_sub_slice("r", s, dsub), codebooks[s])
                for s in range(m)
            ]).alias("codes"),
            "cluster",
        )
        (codes.repartition(nlist, "cluster")
         .write.mode("overwrite").partitionBy("cluster")
         .parquet(f"{index_dir}/codes"))
    finally:
        resid.unpersist()
    cents_df.coalesce(1).write.mode("overwrite") \
        .parquet(f"{index_dir}/coarse")
    cb_rows = [
        (s, c, codebooks[s][c]) for s in range(m) for c in range(ksub)
    ]
    spark.createDataFrame(
        cb_rows, "sub INT, code INT, centroid ARRAY<DOUBLE>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/codebooks")


def ivfpq_adc(
    spark: SparkSession,
    index_dir: str,
    query_v: list[float],
    k: int = 10,
    nprobe: int = IVFPQ_NPROBE,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """ADC top-k over a persisted IVF-PQ index. Routing ranks coarse
    cells by the canonical fold (ties → lower cluster); the LUT is
    PER-CELL (the query residual differs per probed cell) — nprobe·m·
    ksub doubles, still control-plane. The codes scan prunes to the
    nprobe partition directories and reads (vec_id, codes) only;
    per-candidate cost is a CASE over nprobe cells + m lookups."""
    coarse = {
        r.cluster: list(r.centroid)
        for r in spark.read.parquet(f"{index_dir}/coarse").collect()
    }
    cb: dict[int, dict[int, list[float]]] = {}
    for r in spark.read.parquet(f"{index_dir}/codebooks").collect():
        cb.setdefault(r.sub, {})[r.code] = list(r.centroid)
    m = len(cb)
    dsub = len(cb[0][0])
    qv = [float(x) for x in query_v]
    if len(qv) != m * dsub:
        raise ValueError(f"query dim {len(qv)} != index dim {m * dsub}")
    order = sorted(
        (( _sq_l2(c, qv), cl) for cl, c in coarse.items()),
    )
    probe = [cl for _, cl in order[:nprobe]]
    # per-cell LUTs from the query residual
    lut: dict[int, list[list[float]]] = {}
    for cl in probe:
        qr = [qv[i] - coarse[cl][i] for i in range(len(qv))]
        lut[cl] = [
            [_sq_l2(qr[s * dsub:(s + 1) * dsub], cb[s][c])
             for c in range(len(cb[s]))]
            for s in range(m)
        ]
    codes = spark.read.parquet(f"{index_dir}/codes").filter(
        F.col("cluster").isin(probe)
    )
    if exclude_vec_id is not None:
        codes = codes.filter(F.col("vec_id") != exclude_vec_id)
    approx = None
    for s in range(m):
        term = None
        for cl in probe:
            arr = F.array(*[F.lit(x) for x in lut[cl][s]])
            hit = F.element_at(arr, F.element_at("codes", s + 1) + 1)
            term = (
                F.when(F.col("cluster") == cl, hit) if term is None
                else term.when(F.col("cluster") == cl, hit)
            )
        # a cluster outside the probe set can't reach here (the scan is
        # filtered), but if it ever did, a NULL distance would sort
        # FIRST ascending — surface it instead of crowning a phantom
        term = term.otherwise(F.raise_error(F.concat(
            F.lit("unprobed cluster in ADC scan: "),
            F.col("cluster").cast("string"),
        )))
        approx = term if approx is None else approx + term
    return (
        codes.withColumn("approx_raw", approx)
        .orderBy("approx_raw", "vec_id")
        .limit(k)
    )


def ivfpq_index_append(spark: SparkSession, index_dir: str,
                       batch: DataFrame) -> int:
    """Incremental IVF-PQ maintenance: route NEW vectors to the
    EXISTING coarse centroids (fold argmin, ties → lower cluster — the
    probe's own routing), encode their residuals against the EXISTING
    codebooks, and append into the cluster-partitioned codes store —
    probes see them immediately via partition listing. No refit of
    either quantizer; the drift-vs-refit cadence is the deployment's
    call (same contract as ivf_index_append / pq_index_append).
    Returns appended row count."""
    coarse = sorted(
        spark.read.parquet(f"{index_dir}/coarse").collect(),
        key=lambda r: r.cluster,
    )
    cb: dict[int, dict[int, list[float]]] = {}
    for r in spark.read.parquet(f"{index_dir}/codebooks").collect():
        cb.setdefault(r.sub, {})[r.code] = list(r.centroid)
    m = len(cb)
    dsub = len(cb[0][0])
    codebooks = [[cb[s][c] for c in range(len(cb[s]))] for s in range(m)]
    cell_structs = [
        F.struct(
            _fold_sq_l2("v", list(r.centroid)).alias("d"),
            F.lit(int(r.cluster)).alias("c"),
        )
        for r in coarse
    ]
    routed = batch.withColumn(
        "cluster", F.array_min(F.array(*cell_structs))["c"]
    )
    cents_df = spark.createDataFrame(
        [(int(r.cluster), [float(x) for x in r.centroid]) for r in coarse],
        "cluster INT, centroid ARRAY<DOUBLE>",
    )
    resid = routed.join(F.broadcast(cents_df), "cluster").withColumn(
        "r", F.zip_with("v", "centroid", lambda a, b: a - b)
    )
    codes = resid.select(
        "vec_id",
        F.array(*[
            _argmin_code(_sub_slice("r", s, dsub), codebooks[s])
            for s in range(m)
        ]).alias("codes"),
        "cluster",
    )
    n = codes.count()
    (codes.repartition(len(coarse), "cluster")
     .write.mode("append").partitionBy("cluster")
     .parquet(f"{index_dir}/codes"))
    return n


def _ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    import os

    return ensure_artifact(
        os.path.join(sf_dir, "embeddings.parquet"),
        IVFPQ_AUDIT_DIR,
        lambda d: build_ivfpq_index(_vectors(spark, sf_dir), d),
    )


_IVFPQ_ORACLE = f"""
WITH coarse AS (
  SELECT cluster, centroid
  FROM read_parquet('{IVFPQ_AUDIT_DIR}/coarse/*.parquet')
), cb AS (
  SELECT sub, code, centroid
  FROM read_parquet('{IVFPQ_AUDIT_DIR}/codebooks/*.parquet')
), assign AS (
  SELECT vec_id, CAST(cluster AS BIGINT) AS cell
  FROM read_parquet('{IVFPQ_AUDIT_DIR}/codes/*/*.parquet',
                    hive_partitioning = true)
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), probe AS (
  SELECT cluster, centroid FROM (
    SELECT c.cluster, c.centroid,
           row_number() OVER (ORDER BY
             {_FOLD.format(terms=(
                 "list_transform(range(1, len(c.centroid) + 1),"
                 " i -> (c.centroid[i] - q.qv[i])"
                 " * (c.centroid[i] - q.qv[i]))"
             ))},
             c.cluster) AS rn
    FROM coarse c, q
  ) WHERE rn <= {IVFPQ_NPROBE}
), base AS (
  SELECT b.vec_id, a.cell, p.centroid,
         list_transform(range(1, len(b.v) + 1),
                        i -> b.v[i] - p.centroid[i]) AS r
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id <> 0) b
  JOIN assign a ON b.vec_id = a.vec_id
  JOIN probe p ON a.cell = p.cluster
), vd AS (
  SELECT base.vec_id, base.cell, cb.sub, cb.code,
         {_FOLD.format(terms=(
             f"list_transform(range(1, {_DSUB} + 1),"
             f" i -> (base.r[cb.sub * {_DSUB} + i] - cb.centroid[i])"
             f" * (base.r[cb.sub * {_DSUB} + i] - cb.centroid[i]))"
         ))} AS d
  FROM base CROSS JOIN cb
), rcodes AS (
  SELECT vec_id, cell, sub, code FROM (
    SELECT vec_id, cell, sub, code,
           row_number() OVER (
             PARTITION BY vec_id, sub ORDER BY d, code) AS rn
    FROM vd
  ) WHERE rn = 1
), qres AS (
  SELECT p.cluster,
         list_transform(range(1, len(p.centroid) + 1),
                        i -> q.qv[i] - p.centroid[i]) AS qr
  FROM probe p, q
), lut AS (
  SELECT qres.cluster, cb.sub, cb.code,
         {_FOLD.format(terms=(
             f"list_transform(range(1, {_DSUB} + 1),"
             f" i -> (qres.qr[cb.sub * {_DSUB} + i] - cb.centroid[i])"
             f" * (qres.qr[cb.sub * {_DSUB} + i] - cb.centroid[i]))"
         ))} AS d
  FROM qres CROSS JOIN cb
), adc AS (
  SELECT rc.vec_id,
         max(CASE WHEN rc.sub = 0 THEN l.d END)
         + max(CASE WHEN rc.sub = 1 THEN l.d END)
         + max(CASE WHEN rc.sub = 2 THEN l.d END)
         + max(CASE WHEN rc.sub = 3 THEN l.d END) AS dist
  FROM rcodes rc JOIN lut l
    ON rc.cell = l.cluster AND rc.sub = l.sub AND rc.code = l.code
  GROUP BY rc.vec_id
)
SELECT vec_id, ROUND(dist, 6) AS approx_dist
FROM adc ORDER BY dist, vec_id LIMIT 10
"""


@register("sim_ivfpq_adc", oracle=_IVFPQ_ORACLE)
def sim_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ADC approximate KNN, differentially proven against the
    persisted index: the engine routes with the coarse centroids, scans
    only the probed cells' code partitions and ranks by per-cell LUT
    lookups; the oracle re-derives every probed vector's RESIDUAL codes
    from the raw embeddings + persisted artifacts and rebuilds the
    per-cell LUTs in SQL. Equality proves residual encoding, routing,
    and the composed ADC arithmetic. vec_id 0 is the query."""
    _ensure_ivfpq_index(spark, sf_dir)
    qrow = _vectors(spark, sf_dir).filter(F.col("vec_id") == 0).first()
    top = ivfpq_adc(
        spark, IVFPQ_AUDIT_DIR, [float(x) for x in qrow.v],
        k=10, exclude_vec_id=0,
    )
    return top.select(
        "vec_id", F.round("approx_raw", 6).alias("approx_dist")
    )


@register("sim_pq_adc", oracle=_PQ_ORACLE)
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate KNN, differentially proven against the
    persisted index: the engine ranks by m table lookups over the codes
    file; the oracle re-derives every code from the raw embeddings +
    persisted codebooks and rebuilds the LUT in SQL. vec_id 0 is the
    query (excluded from candidates), mirroring the IVF queries."""
    _ensure_pq_index(spark, sf_dir)
    qrow = _vectors(spark, sf_dir).filter(F.col("vec_id") == 0).first()
    top = pq_adc(
        spark, PQ_AUDIT_DIR, [float(x) for x in qrow.v],
        k=10, exclude_vec_id=0,
    )
    return top.select(
        "vec_id", F.round("approx_raw", 6).alias("approx_dist")
    )
