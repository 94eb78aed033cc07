"""CDC→ANN-index end-to-end (the r10 verdict #4 capstone — the
``cdc_corpus_refresh`` discipline applied to the VECTOR tier): embedding
rows arrive as Debezium-shaped CDC envelopes over an ``embeddings``-
shaped source table, fold to latest state, route against the PERSISTED
IVF centroids (no refit — the ``ivf_index_append`` posture), and
semantically dedup per cell (SemDeDup) — producing the refreshed,
deduplicated ANN index. ONE oracle re-derives every stage — log
synthesis, fold, centroid routing, per-cell dedup — from the raw
``embeddings`` table plus the persisted centroid artifacts.

Why this needs its own differential: the vector stages are individually
oracled (envelope wire, I6 folds, sim_ivf* routing, dedup_semantic),
but no standalone stage proves CDC semantics *reach the index*: a
DELETED source row must leave the index, a RE-EMBEDDED (updated) row
must RE-ROUTE on its new vector, and replayed deliveries must change
nothing. The synthetic change history makes each path load-bearing:

- every vector INSERTS first as a NEGATED draft (``-v`` element-wise —
  exact in IEEE, and it routes to a *different* cell than ``v`` in
  general, so update-reroutes are observable);
- ``vec_id % 5 == 0`` drafts insert ONE shared placeholder vector
  (all-ones) — identical vectors land in one cell at cosine ~1, so the
  SemDeDup stage live-collapses them to the min-id keeper;
- ``vec_id % 3 == 0`` rows are UPDATED to the real fixture embedding —
  the re-embed/re-route path;
- ``vec_id % 7 == 0`` rows are DELETED last — the leave path.

The wire is the JSON envelope round-trip (``to_json``/``from_json``):
exact for these payloads because Java's double→string rendering is
round-trip-exact by contract (every parsed-back double is bit-identical
to the written one); binary/Avro wires for vectors are covered by
``cdc_binary_wire``.

Routing is centroid-as-DATA: the persisted centroids (a bounded
control-plane table) broadcast-join the folded vectors, squared-L2 as
the engine's bit-reproducible left fold, argmin by the (distance,
cluster) tuple — identical tie-break to ``ivf_probe``/
``ivf_index_append``. Dedup is the ``semdedup`` pair rule (same cell,
lower-id owner, cosine ≥ τ) at the production τ=0.9.

Streaming (:func:`start_ann_refresh_stream`): per micro-batch the
envelopes merge into the bucket-partitioned state tier, then the index
snapshot is RECOMPUTED from current state and committed cell-partitioned
under ``out_dir/epoch=<id>`` with an atomic ``_LATEST`` pointer —
refresh semantics (dedup owners are corpus-global), not per-batch
append; the append-only ingest form is ``semdedup_ingest`` +
``ivf_index_append``. Restart-safe exactly like the corpus twin: the
state apply is epoch-idempotent, the snapshot rewrite deterministic,
the pointer atomic.

Scale posture (100 TB): parse/unwrap expression-only; fold =
partitioned-state apply (touched buckets only, probed flat in state
size); routing = one broadcast join (centroids are nlist rows) over
current state with a window argmin partitioned by vec_id; dedup = one
equi-join on cell with per-cell pair work bounded by the quantizer
(nlist ∝ n). A full refresh per trigger is the semantics of
corpus-global dedup; its cost is over CURRENT state, never the
unbounded log.

MEASURED caveat (round-11 probe): the quantizer sizing is
load-bearing TWICE over — a FIXED nlist makes per-cell pair work grow
quadratically with the corpus (the registered query pins the shared
16-cell audit index for oracle parity; its g1→g3 probe read ratio
18.3 at 3× data), AND the cell equi-join's parallelism is capped at
nlist distinct keys (16 cells = at most 16 tasks — the probe JVM sat
near 2 of 32 cores). ``ann_refresh_scaled`` in scripts/scale_probe.py
is the production spelling (nlist ∝ n, cell ≈ 500): both problems
dissolve together and the probe reads sub-linear at both pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from ..catalog import table
from ..registry import register
from ..llm.similarity import IVF_AUDIT_DIR, _ensure_ivf_index, dot, norm_sq
from .envelope import parse_envelope, unwrap
from .materialize import materialize_latest

#: embedding dimensionality of the testdata fixture.
DIM = 64
#: SemDeDup threshold — the production regime (the fixture's max true
#: within-cell cosine is ~0.51, so only the planted placeholder dups
#: collapse; the τ=0.4 exploratory regime is dedup_semantic's).
ANN_TAU = 0.9

EMB_ROW_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("v", T.ArrayType(T.DoubleType())),
])
EMB_KEY_SCHEMA = T.StructType([T.StructField("vec_id", T.LongType())])

def _placeholder_v():
    """The shared placeholder draft vector (all-ones) — planted exact
    dups. Built lazily: Column construction needs an active session,
    so no module-level F.expr (the import-time invariant)."""
    return F.expr(
        f"transform(sequence(1, {DIM}), i -> cast(1.0 as double))"
    )


def embeddings_change_log(emb: DataFrame) -> DataFrame:
    """Deterministic synthetic CDC history over a (vec_id, v) frame
    (module docstring): flat change rows ``(vec_id, v, __op, __pos)``,
    re-derivable in SQL."""
    vid = F.col("vec_id")
    ins = emb.select(
        "vec_id",
        F.when(vid % 5 == 0, _placeholder_v())
        .otherwise(F.transform("v", lambda x: -x))
        .alias("v"),
        F.lit("c").alias("__op"),
        (vid * 10 + 1).alias("__pos"),
    )
    upd = emb.filter(vid % 3 == 0).select(
        "vec_id", "v",
        F.lit("u").alias("__op"), (vid * 10 + 2).alias("__pos"),
    )
    dels = emb.filter(vid % 7 == 0).select(
        "vec_id", F.lit(None).cast("array<double>").alias("v"),
        F.lit("d").alias("__op"), (vid * 10 + 3).alias("__pos"),
    )
    return ins.unionByName(upd).unionByName(dels)


def embeddings_envelopes(log: DataFrame, as_json: bool = True) -> DataFrame:
    """The Debezium wire shape for the embeddings log: (key, value)
    JSON envelope strings (deletes carry the vectorless image in
    ``before``); ``source.pos`` is the log position."""
    row = F.struct(F.col("vec_id"), F.col("v"))
    null_row = F.lit(None).cast(EMB_ROW_SCHEMA)
    op = F.col("__op")
    env = log.select(
        F.struct(F.col("vec_id")).alias("key"),
        F.struct(
            F.when(op == "d", row).otherwise(null_row).alias("before"),
            F.when(op != "d", row).otherwise(null_row).alias("after"),
            F.struct(
                F.lit("sim").alias("connector"),
                F.lit("testdb").alias("db"),
                F.lit("embeddings").alias("table"),
                F.lit(False).alias("snapshot"),
                F.col("__pos").alias("pos"),
            ).alias("source"),
            op.alias("op"),
            F.col("__pos").alias("ts_ms"),
        ).alias("value"),
    )
    if as_json:
        env = env.select(
            F.to_json("key").alias("key"), F.to_json("value").alias("value")
        )
    return env


def unwrap_embeddings(wire: DataFrame) -> DataFrame:
    """JSON wire → flat change rows (the consumer side)."""
    parsed = parse_envelope(wire, EMB_ROW_SCHEMA, key_schema=EMB_KEY_SCHEMA)
    return unwrap(parsed).select("vec_id", "v", "__op", "__pos")


def route_to_cells(state: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign every (vec_id, v) to its nearest persisted centroid —
    centroids-as-DATA broadcast join, left-fold squared L2, argmin by
    the (distance, cluster) tuple (ties → lower cell id, the
    ivf_probe/ivf_index_append convention). Returns
    (vec_id, v, nsq, cell)."""
    d = F.aggregate(
        F.zip_with("v", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    w = W.partitionBy("vec_id").orderBy("d", "cluster")
    return (
        state.withColumn("nsq", norm_sq("v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("d", d)
        .withColumn("__rrn", F.row_number().over(w))
        .filter(F.col("__rrn") == 1)
        .select("vec_id", "v", "nsq",
                F.col("cluster").cast("bigint").alias("cell"))
    )


def semdedup_survivors(assigned: DataFrame, tau: float = ANN_TAU) -> DataFrame:
    """SemDeDup the routed set in place: drop every vector that has a
    lower-id same-cell neighbor at cosine ≥ ``tau`` (the
    :func:`~..llm.similarity.semdedup` pair rule, applied to a frame
    instead of a persisted store). Zero vectors are kept verbatim —
    cosine is undefined for them, so they can neither own nor suffer
    a removal."""
    a = assigned.select(
        F.col("vec_id").alias("kept"), F.col("cell").alias("ca"),
        F.col("v").alias("va"), F.col("nsq").alias("na"),
    ).filter(F.col("na") > 0)
    cos_raw = dot("va", "v") / (F.sqrt("na") * F.sqrt("nsq"))
    removals = (
        assigned.filter(F.col("nsq") > 0)
        .join(a, (F.col("ca") == F.col("cell"))
              & (F.col("kept") < F.col("vec_id")))
        .withColumn("cos_raw", cos_raw)
        .filter(F.col("cos_raw") >= tau)
        .select("vec_id")
        .distinct()
    )
    return assigned.join(removals, "vec_id", "left_anti")


_ORACLE = f"""
WITH log AS (
  SELECT vec_id,
         CASE WHEN vec_id % 5 = 0
              THEN list_transform(range(1, {DIM} + 1),
                                  i -> CAST(1.0 AS DOUBLE))
              ELSE list_transform(embedding::DOUBLE[], x -> -x) END AS v,
         'c' AS op, vec_id * 10 + 1 AS pos
  FROM embeddings
  UNION ALL
  SELECT vec_id, embedding::DOUBLE[], 'u', vec_id * 10 + 2
  FROM embeddings WHERE vec_id % 3 = 0
  UNION ALL
  SELECT vec_id, NULL, 'd', vec_id * 10 + 3
  FROM embeddings WHERE vec_id % 7 = 0
), lr AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY pos DESC)
    AS lrn
  FROM log
), state AS MATERIALIZED (
  SELECT vec_id, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x) AS nsq
  FROM lr WHERE lrn = 1 AND op <> 'd'
), cents AS MATERIALIZED (
  SELECT cluster, centroid
  FROM read_parquet('{IVF_AUDIT_DIR}/centroids/*.parquet')
), routed AS (
  SELECT s.vec_id, s.v, s.nsq, c.cluster,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, {DIM} + 1),
                 i -> (s.v[i] - c.centroid[i]) * (s.v[i] - c.centroid[i]))),
             (a, x) -> a + x) AS d
  FROM state s, cents c
), arg AS MATERIALIZED (
  SELECT vec_id, v, nsq, CAST(cluster AS BIGINT) AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster)
      AS rrn
    FROM routed
  ) WHERE rrn = 1
), rem AS (
  SELECT DISTINCT b.vec_id
  FROM arg a JOIN arg b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE a.nsq > 0 AND b.nsq > 0
    AND list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, {DIM} + 1),
                           i -> a.v[i] * b.v[i])),
            (s, x) -> s + x) / (sqrt(a.nsq) * sqrt(b.nsq)) >= {ANN_TAU}
)
SELECT s.vec_id, s.cell
FROM arg s LEFT JOIN rem r ON s.vec_id = r.vec_id
WHERE r.vec_id IS NULL
ORDER BY s.vec_id
"""


@register("cdc_ann_refresh", oracle=_ORACLE)
def cdc_ann_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC→ANN capstone, batch form (module docstring): synth
    change log → JSON envelope wire round-trip → latest-state fold →
    persisted-centroid routing → per-cell SemDeDup; output = the
    refreshed index membership (vec_id, cell). The oracle re-derives
    the entire chain from the raw embeddings table + the persisted
    centroid artifacts."""
    _ensure_ivf_index(spark, sf_dir)  # centroid artifacts for both sides
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    wire = embeddings_envelopes(embeddings_change_log(emb))
    flat = unwrap_embeddings(wire)
    state = materialize_latest(
        flat, keys=["vec_id"], position=["__pos"]
    ).select("vec_id", "v")
    cents = spark.read.parquet(f"{IVF_AUDIT_DIR}/centroids")
    survivors = semdedup_survivors(route_to_cells(state, cents))
    return survivors.select("vec_id", "cell").orderBy("vec_id")


# --- streaming form: continuous index refresh ------------------------------


def ann_refresh_foreach_batch(
    centroids_dir: str, state_dir: str, out_dir: str, n_buckets: int = 8
):
    """foreachBatch handler: merge the micro-batch of envelope wire
    records into the bucket-partitioned state, then RECOMPUTE the
    index snapshot (route + dedup over CURRENT state) and commit it
    cell-partitioned under ``out_dir/epoch=<id>`` with an atomic
    ``_LATEST`` pointer. Epoch replays are idempotent end-to-end."""
    from ..streaming.partitioned_state import (
        _atomic_write,
        apply_changes_partitioned,
        read_state_partitioned,
    )

    def handle(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        flat = unwrap_embeddings(batch)
        apply_changes_partitioned(
            spark, flat, epoch, state_dir,
            keys=["vec_id"], position=["__pos"], n_buckets=n_buckets,
        )
        state = read_state_partitioned(spark, state_dir).select("vec_id", "v")
        cents = spark.read.parquet(centroids_dir)
        snap = semdedup_survivors(route_to_cells(state, cents))
        snap_dir = os.path.join(out_dir, f"epoch={epoch}")
        # hash-repartition on the partition column: each cell's rows
        # land in one task → one file per cell directory, with write
        # parallelism = number of cells (the build_ivf_index rule;
        # repartition(1, ...) would serialize the whole snapshot)
        (
            snap.repartition("cell")
            .write.mode("overwrite").partitionBy("cell").parquet(snap_dir)
        )
        _atomic_write(os.path.join(out_dir, "_LATEST"), f"epoch={epoch}")

    return handle


def read_latest_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The committed index snapshot (follows the ``_LATEST`` pointer)."""
    with open(os.path.join(out_dir, "_LATEST")) as f:
        return spark.read.parquet(os.path.join(out_dir, f.read().strip()))


def start_ann_refresh_stream(
    spark: SparkSession,
    stage_dir: str,
    centroids_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint: str,
    n_buckets: int = 8,
):
    """The capstone as a real Structured Streaming query: a file
    source of JSON envelope records, availableNow — drains what
    exists then stops; re-invoke after a restart and the checkpoint
    resumes from the first unprocessed file."""
    os.makedirs(state_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)
    stream = (
        spark.readStream.schema("key STRING, value STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    return (
        stream.writeStream
        .foreachBatch(
            ann_refresh_foreach_batch(
                centroids_dir, state_dir, out_dir, n_buckets
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
