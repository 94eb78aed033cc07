"""Curation pipeline v2 (t48/t49): the round-9 stages COMPOSED — the
same proof obligation t33 (rule-based clean pipeline) and t40
(near-dup funnel) discharge for their tiers. Each stage is already
individually oracled (t39 BPE, t44 LID, t45 PII, t46 quality model);
these queries pin that they compose without semantic drift, with the
oracle re-deriving EVERY stage from scratch via the reusable CTE
builders (`bpe.oracle_docs_with_counts`, `langid.oracle_lid_cte`,
`quality_model.oracle_quality_cte`, `pii.oracle_redact_sql`).

- **t48_tokenizer_fertility**: tokens-per-word and chars-per-token by
  PREDICTED language — the standard tokenizer-equity report (how many
  subword tokens a language pays per word; high-fertility languages
  get shortchanged at a fixed token budget). Joins the BPE per-doc
  counts with LID predictions: two independently-derived per-doc
  frames, one hash join on doc_id, one small agg.

- **t49_curation_v2**: the model-era counterpart of t33's rule-based
  pipeline — LID gate (keep predicted 'en') → model-quality gate
  (pure-integer keep) → PII redaction of the survivors (on the
  planted-span augmentation so the redaction is live, not identity)
  — per-doc output with the redacted-text md5, so the differential
  covers which docs survive AND every redacted byte they carry.

Scale posture: both queries add only doc_id hash joins between
per-doc frames that are each linear single-scan pipelines; nothing
quadratic, no new shuffle class. t49's gates FILTER before the
redaction pass, so the expensive regex work runs only on survivors —
the order a production pipeline uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import oracle_round4x, round4x_col
from ..registry import register
from .bpe import bpe_token_count, oracle_docs_with_counts
from .langid import language_id, oracle_lid_cte
from .pii import ORACLE_PLANT_SQL, _planted, oracle_redact_sql, pii_redact
from .quality_model import oracle_quality_cte, quality_scores

_T48_ORACLE = f"""
WITH {oracle_docs_with_counts('bpe')},
{oracle_lid_cte('lid')}
SELECT l.pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(b.n_tok) AS BIGINT) AS total_tokens,
       {oracle_round4x(
           "CAST(sum(b.n_tok) AS DOUBLE) / "
           "CAST(sum(len(string_split(b.text, ' '))) AS DOUBLE)",
           'tokens_per_word')},
       {oracle_round4x(
           'CAST(sum(b.n_chars) AS DOUBLE) / CAST(sum(b.n_tok) AS DOUBLE)',
           'chars_per_token')}
FROM bpe b JOIN lid l USING (doc_id)
GROUP BY l.pred_lang ORDER BY l.pred_lang
"""


@register("t48_tokenizer_fertility", oracle=_T48_ORACLE)
def t48_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE fertility by predicted language (module docstring): the
    tokenizer-equity numbers a multilingual training pipeline reports.
    Both ratios are integer-derived → round4x policy."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        bpe_token_count("text").alias("n_tok"),
    )
    lid = language_id(docs).select("doc_id", "pred_lang")
    return (
        d.join(lid, "doc_id")
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            round4x_col(
                F.sum("n_tok").cast("double")
                / F.sum("n_words").cast("double")
            ).alias("tokens_per_word"),
            round4x_col(
                F.sum("n_chars").cast("double")
                / F.sum("n_tok").cast("double")
            ).alias("chars_per_token"),
        )
        .orderBy("pred_lang")
    )


_T49_ORACLE = f"""
WITH {oracle_lid_cte('lid')},
{oracle_quality_cte('qs')},
survivors AS (
  SELECT d.doc_id, d.source, q.n_feat, q.sum_w,
         {ORACLE_PLANT_SQL} AS aug
  FROM documents d
  JOIN lid l USING (doc_id)
  JOIN qs q USING (doc_id)
  WHERE l.pred_lang = 'en' AND 2 * q.sum_w > 3 * q.n_feat
)
SELECT doc_id, source, n_feat, sum_w,
       md5({oracle_redact_sql('aug')}) AS red_md5
FROM survivors ORDER BY doc_id
"""


def curate_docs(docs: DataFrame, sort_first: bool = False) -> DataFrame:
    """The v2 curation pipeline over any (doc_id, text, source, ...)
    frame: LID gate → model-quality gate → PII redaction of survivors.
    Every gate is PER-DOCUMENT (stateless), so running it per
    micro-batch on ingest produces exactly the batch run's slice —
    the property `start_curation_ingest_stream`'s restart test pins.
    ``sort_first`` orders by doc_id BELOW the redaction projection
    (see t49's docstring for why the sort must not sit above it)."""
    spark = docs.sparkSession
    lid = language_id(docs).where(F.col("pred_lang") == "en").select("doc_id")
    qs = quality_scores(spark, docs).where(F.col("keep")).select(
        "doc_id", "n_feat", "sum_w"
    )
    survivors = (
        docs.select(
            "doc_id",
            "source",
            F.concat(
                F.col("text"), _planted(F.col("doc_id"), F.col("source"))
            ).alias("aug"),
        )
        .join(lid, "doc_id")
        .join(qs, "doc_id")
    )
    if sort_first:
        survivors = survivors.orderBy("doc_id")
    return survivors.select(
        "doc_id",
        "source",
        "n_feat",
        "sum_w",
        F.md5(pii_redact("aug")).alias("red_md5"),
    )


@register("t49_curation_v2", oracle=_T49_ORACLE)
def t49_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-era curation capstone (module docstring): LID gate →
    model-quality gate → PII redaction of survivors, one differential.

    The orderBy sits UNDER the redaction projection (sort_first in
    curate_docs): a global sort above the regex chain would make the
    range partitioner's sample job re-execute it (the t45 finding —
    see llm/pii.py); below it, the sample re-runs only the join whose
    shuffle stages are reused across jobs."""
    return curate_docs(table(spark, sf_dir, "documents"), sort_first=True)


# --- curation-on-ingest (streaming twin of t49) ---------------------------


def curation_ingest_foreach_batch(out_dir: str):
    """foreachBatch handler for CONTINUOUS curation-on-ingest: each
    micro-batch of raw documents runs the FULL v2 pipeline (LID gate →
    quality gate → PII redaction) and writes its survivors to
    ``out_dir/batch=<epoch_id>``. All gates are per-document, so no
    cross-batch state exists; replay idempotence is the deterministic
    per-batch overwrite (a crash-before-commit replay rewrites the
    same directory with the same rows). The streamed union across any
    file slicing equals the one-shot batch run — the same
    stream==batch discipline as dedup-on-ingest, without the monotone-
    id contract (nothing here depends on arrival order)."""
    import os

    def handle(batch: DataFrame, batch_id: int) -> None:
        (
            curate_docs(batch)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={batch_id}"))
        )

    return handle


def start_curation_ingest_stream(
    spark: SparkSession,
    stage_dir: str,
    schema,
    out_dir: str,
    checkpoint: str,
):
    """Run curation-on-ingest as a real Structured Streaming query over
    a parquet file source (one file per micro-batch, availableNow —
    drains what exists then stops; re-invoke after a restart and the
    checkpoint resumes from the first unprocessed file)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    return (
        stream.writeStream
        .foreachBatch(curation_ingest_foreach_batch(out_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
