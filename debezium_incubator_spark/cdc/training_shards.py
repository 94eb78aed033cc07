"""CDC→training-shards — the GRAND capstone (r11 verdict #4): the
project's thesis statement in one registered differential. Debezium-
shaped change events in, ready-to-load training shards out:

  change log → JSON envelope wire round-trip → latest-state fold →
  exact dedup → curation v3 (LM perplexity gate → WordPiece → UNK gate
  → per-source piece budget) → unigram-LM Viterbi tokenization with the
  TRAINED vocab → deterministic epoch shuffle + shard assignment →
  token-budget sequence packing.

Every stage is individually oracled elsewhere (cdc_corpus_refresh, t54,
t59, t24, t11); THIS differential proves they compose: the one SQL
oracle re-derives all eight stages from the raw ``documents`` table —
the heaviest oracle composition in the registry (the CDC fold CTEs +
the v3 chain's bigram-LM CTEs + WordPiece recursive scan + unigram
recursive Viterbi + the shard/pack windows, in ONE ``WITH RECURSIVE``).

Stage spellings (all reused, none re-implemented):

- fold/dedup: :mod:`.corpus_refresh` (``documents_change_log`` /
  ``documents_envelopes`` / ``unwrap_documents`` / ``dedup_keepers``;
  oracle ``_LOG_CTES``) — deletes leave the corpus, updates re-curate,
  planted placeholder dups collapse;
- selection: :func:`..llm.pipeline_v2.curate_docs_v3` (oracle
  ``v3_kept_cte``) — survivors only are tokenized;
- tokenization: :func:`..llm.unigram.unigram_tokenize` (oracle
  ``oracle_unigram_cte`` — u-prefixed CTEs compose with the WordPiece
  builder's w0/fin, the t60 precedent); shard token counts are REAL
  trained-vocab piece counts, not whitespace proxies;
- shuffle/shard: the t24 rule — ord_key = md5(seed || doc_id)
  (engine-portable bytes), shard = first hex char's ascii mod
  N_SHARDS, position = row_number per shard over (ord_key, doc_id);
- packing: the t11 rule per SHARD in shuffled order — bin = exclusive
  running token count DIV PACK budget (integer arithmetic end to end;
  a doc starts a new bin when the budget is crossed).

Scale posture (100 TB): parse/unwrap expression-only; fold = one
window by key (streaming twin: partitioned-state apply, touched
buckets only); dedup = one window by text; v3 = the probed t54
pipeline over survivors; tokenization folds per DISTINCT word against
a broadcast vocab row (dictionary-bounded — the t52/t59 production
shape); shuffle/shard/pack = one window per shard partition, which is
exactly how the loader consumes the output. No collects, no
crossJoins, no all-pairs anywhere.

Streaming (:func:`start_training_shards_stream`): per micro-batch the
envelopes merge into the bucket-partitioned state tier, then the shard
snapshot is RECOMPUTED from current state — refresh semantics (the v3
budget, the LM, and the packing bins are all corpus-global) — and
committed under ``out_dir/epoch=<id>`` with an atomic ``_LATEST``
pointer; restart == one-shot batch, test-pinned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..registry import register
from ..llm.pipeline_v2 import curate_docs_v3, v3_kept_cte_filled
from ..llm.unigram import oracle_unigram_cte, unigram_tokenize
from .corpus_refresh import (
    _LOG_CTES,
    dedup_keepers,
    documents_change_log,
    documents_envelopes,
    unwrap_documents,
)
from .materialize import materialize_latest

#: number of training shards (the t24 convention).
N_SHARDS = 4
#: per-bin token budget, denominated in unigram pieces.
SHARD_PACK_BUDGET = 2048
#: epoch seed for the deterministic shuffle — change to re-shuffle.
SHARD_SEED = "shards:"


def training_shards(spark: SparkSession, corpus: DataFrame) -> DataFrame:
    """Selection → tokenization → shuffle/shard → packing over ANY
    (doc_id, text, source) corpus frame (module docstring). Output:
    one row per selected document —
    (doc_id, source, shard, pos, n_tokens, bin), ordered by
    (shard, pos)."""
    kept = curate_docs_v3(spark, corpus).select("doc_id")
    surv = corpus.join(kept, "doc_id")
    tok = unigram_tokenize(spark, surv.select("doc_id", "text")).select(
        "doc_id", F.col("n_pieces").cast("bigint").alias("n_tokens")
    )
    keyed = (
        surv.select("doc_id", "source")
        .join(tok, "doc_id")
        .withColumn(
            "ord_key",
            F.md5(F.concat(F.lit(SHARD_SEED),
                           F.col("doc_id").cast("string"))),
        )
        .withColumn(
            "shard",
            (F.ascii(F.substring("ord_key", 1, 1)) % N_SHARDS).cast("int"),
        )
    )
    w = W.partitionBy("shard").orderBy("ord_key", "doc_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .withColumn("cs", F.sum("n_tokens").over(wsum))
        .select(
            "doc_id", "source", "shard", "pos", "n_tokens",
            F.expr(f"CAST((cs - n_tokens) DIV {SHARD_PACK_BUDGET} "
                   "AS BIGINT)").alias("bin"),
        )
        .orderBy("shard", "pos")
    )


_ORACLE = (
    "WITH RECURSIVE "
    + _LOG_CTES
    + ",\n"
    + v3_kept_cte_filled("corpus")
    + f""",
surv AS MATERIALIZED (
  SELECT c.doc_id, c.text, c.source
  FROM corpus c JOIN v3kept USING (doc_id)
),
{oracle_unigram_cte("surv")},
utok AS (
  SELECT uw0.doc_id, CAST(sum(len(f.pieces)) AS BIGINT) AS n_tokens
  FROM uw0 JOIN ufin f USING (w) GROUP BY uw0.doc_id
),
skeyed AS (
  SELECT s.doc_id, s.source, t.n_tokens,
         md5('{SHARD_SEED}' || CAST(s.doc_id AS VARCHAR)) AS ord_key
  FROM surv s JOIN utok t USING (doc_id)
),
ssharded AS (
  SELECT *, CAST(ascii(substr(ord_key, 1, 1)) % {N_SHARDS} AS INT)
    AS shard
  FROM skeyed
),
sordered AS (
  SELECT doc_id, source, shard, n_tokens,
         CAST(row_number() OVER (
           PARTITION BY shard ORDER BY ord_key, doc_id
         ) AS BIGINT) AS pos,
         SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY ord_key, doc_id
           ROWS UNBOUNDED PRECEDING) AS cs
  FROM ssharded
)
SELECT doc_id, source, shard, pos, n_tokens,
       CAST((cs - n_tokens) // {SHARD_PACK_BUDGET} AS BIGINT) AS bin
FROM sordered ORDER BY shard, pos
"""
)


@register("cdc_training_shards", oracle=_ORACLE)
def cdc_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grand capstone, batch form (module docstring): synth change
    log → wire round-trip → fold → exact dedup → curation v3 → unigram
    tokenization → epoch shuffle/shard → token-budget packing. The
    oracle re-derives all eight stages from the raw documents table."""
    docs = table(spark, sf_dir, "documents")
    wire = documents_envelopes(documents_change_log(docs))
    state = materialize_latest(
        unwrap_documents(wire), keys=["doc_id"], position=["__pos"]
    ).select("doc_id", "text", "source")
    return training_shards(spark, dedup_keepers(state))


# --- streaming form: continuous shard refresh -------------------------------


def training_shards_foreach_batch(
    state_dir: str, out_dir: str, n_buckets: int = 8
):
    """foreachBatch handler: merge the micro-batch of envelope wire
    records into the bucket-partitioned state, then RECOMPUTE the shard
    snapshot from current state (shards/bins/budgets are corpus-global
    → refresh semantics) and commit it under ``out_dir/epoch=<id>``
    with an atomic ``_LATEST`` pointer. Epoch replays are idempotent
    end-to-end (the corpus-refresh discipline)."""
    from ..streaming.partitioned_state import (
        _atomic_write,
        apply_changes_partitioned,
        read_state_partitioned,
    )

    def handle(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        flat = unwrap_documents(batch)
        apply_changes_partitioned(
            spark, flat, epoch, state_dir,
            keys=["doc_id"], position=["__pos"], n_buckets=n_buckets,
        )
        state = read_state_partitioned(spark, state_dir)
        corpus = dedup_keepers(state.select("doc_id", "text", "source"))
        snap_dir = os.path.join(out_dir, f"epoch={epoch}")
        training_shards(spark, corpus).write.mode("overwrite").parquet(
            snap_dir
        )
        _atomic_write(os.path.join(out_dir, "_LATEST"), f"epoch={epoch}")

    return handle


def read_latest_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """The committed shard snapshot (follows the ``_LATEST`` pointer)."""
    from ..streaming.partitioned_state import read_latest_pointer

    return read_latest_pointer(spark, out_dir)


def start_training_shards_stream(
    spark: SparkSession,
    stage_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint: str,
    n_buckets: int = 8,
):
    """The capstone as a real Structured Streaming query over a PARQUET
    file source of (key, value) JSON envelope STRINGS, availableNow —
    drains what exists then stops; re-invoke after a restart and the
    checkpoint resumes from the first unprocessed file."""
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
            training_shards_foreach_batch(state_dir, out_dir, n_buckets)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
