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

from ..catalog import spread, table
from ..lineage import cut
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
    d = spread(docs).select(
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


# --- t54: curation v3 — LM perplexity gate → WordPiece budget --------------

#: per-source WordPiece-token budget for the v3 selection.
V3_BUDGET = 1500
#: UNK-fraction gate: drop docs where n_unk/n_words > 5% (pure-integer
#: compare n_unk * 20 > n_words — no float boundary).
V3_UNK_NUM = 20


def v3_kept_cte(src: str = "documents") -> str:
    """The v3 pipeline as a composable CTE chain ending in
    ``v3kept(doc_id, source, ppl_bucket, n_words, n_pieces, n_unk,
    cum_pieces)`` — the selected documents. Callers that keep composing
    (the CDC→training-shards capstone tokenizes + shards the
    survivors) append further CTEs after it; ``_v3_oracle`` puts the
    plain final SELECT on top. Carries the ``{{T1}}`` placeholder —
    use :func:`v3_kept_cte_filled` / :func:`_v3_oracle_filled` for the
    bound form."""
    from .lm import PPL_T2_X1E4, oracle_bigram_cte
    from .wordpiece import oracle_wordpiece_cte

    return f"""{oracle_bigram_cte(src)},
s1 AS (
  SELECT d.doc_id, d.text, d.source,
         CASE WHEN nll_sum_x1e4 < {{T1}} * n_bigrams THEN 'head'
              ELSE 'middle' END AS ppl_bucket
  FROM {src} d JOIN docsc USING (doc_id)
  WHERE nll_sum_x1e4 < {PPL_T2_X1E4} * n_bigrams
),
{oracle_wordpiece_cte("s1")},
d2 AS (
  SELECT w0.doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
         CAST(sum(CAST(unk AS INT)) AS BIGINT) AS n_unk
  FROM w0 JOIN fin USING (w) GROUP BY w0.doc_id
),
s2 AS (
  SELECT s1.doc_id, s1.source, s1.ppl_bucket,
         d2.n_words, d2.n_pieces, d2.n_unk
  FROM d2 JOIN s1 USING (doc_id)
  WHERE n_unk * {V3_UNK_NUM} <= n_words
),
r AS (
  SELECT *, CAST(sum(n_pieces) OVER (
    PARTITION BY source
    ORDER BY md5('v3|' || CAST(doc_id AS VARCHAR)), doc_id
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pieces
  FROM s2
),
v3kept AS (
  SELECT doc_id, source, ppl_bucket, n_words, n_pieces, n_unk,
         cum_pieces
  FROM r WHERE cum_pieces <= {V3_BUDGET}
)"""


def v3_kept_cte_filled(src: str = "documents") -> str:
    from .lm import PPL_T1_X1E4

    return v3_kept_cte(src).replace("{T1}", str(PPL_T1_X1E4))


def _v3_oracle(src: str = "documents", with_kw: bool = True) -> str:
    """The v3 pipeline re-derived in SQL over ``src`` (any table/CTE
    with doc_id/text/source). ``with_kw=False`` omits the leading
    ``WITH RECURSIVE`` so callers can prepend their own CTEs (the
    corpus-refresh capstone folds a CDC log first)."""
    head = "\nWITH RECURSIVE " if with_kw else ""
    return f"""{head}{v3_kept_cte(src)}
SELECT doc_id, source, ppl_bucket, n_words, n_pieces, n_unk, cum_pieces
FROM v3kept ORDER BY doc_id
"""


def _v3_oracle_filled(src: str = "documents", with_kw: bool = True) -> str:
    from .lm import PPL_T1_X1E4

    return _v3_oracle(src, with_kw).replace("{T1}", str(PPL_T1_X1E4))


def curate_docs_v3(spark: SparkSession, docs: DataFrame,
                   cut_strategy: str = "local_disk") -> DataFrame:
    """The v3 selection pipeline over ANY (doc_id, text, source) frame:
    perplexity gate (LM trained on ``docs`` itself) → WordPiece
    tokenization of survivors → UNK-fraction gate → per-source greedy
    piece budget. Reused by t54 (fixture corpus) and the CDC→corpus
    refresh capstone (folded latest state).

    ``cut_strategy`` is the storage/recovery posture of the CORPUS-SIZED
    survivor materialization (lineage.py contract): default
    ``local_disk`` (executor local disk, non-fault-tolerant — the 100 TB
    memory-safe spelling); pass ``"parquet"`` for a fault-tolerant
    scratch tier, ``"local"`` for the bounded-frame MEMORY_AND_DISK
    form."""
    from pyspark.sql.window import Window as W

    from .lm import bigram_lm_scores
    from .wordpiece import wordpiece_tokenize

    lm = bigram_lm_scores(spark, docs)
    s1 = docs.join(
        lm.filter(F.col("ppl_bucket") != "tail")
        .select("doc_id", "ppl_bucket"),
        "doc_id",
    )
    # round-13 (guide §4.4 duplicated evaluation / the DLQ shared_scan
    # precedent): s1 is consumed three times (the tokenizer's word
    # explode + its distinct-words tier + the s2 join-back), and each
    # consumer would re-execute the LM-train-and-gate join above it.
    # The lazy cut materializes the survivor frame ONCE per run (batch
    # contexts only — every caller is a registered batch query or a
    # foreachBatch body).  Rows identical; measured ~1 s off t54 and
    # compounding in the two CDC capstones that call this.
    s1 = cut(s1, cut_strategy)
    wp = wordpiece_tokenize(spark, s1)
    s2 = wp.join(
        s1.select("doc_id", "source", "ppl_bucket"), "doc_id"
    ).filter(F.col("n_unk") * V3_UNK_NUM <= F.col("n_words"))
    w = (
        W.partitionBy("source")
        .orderBy(
            F.md5(F.concat(F.lit("v3|"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r = s2.withColumn("cum_pieces", F.sum("n_pieces").over(w))
    out = r.filter(F.col("cum_pieces") <= V3_BUDGET).select(
        "doc_id", "source", "ppl_bucket", "n_words", "n_pieces",
        "n_unk", "cum_pieces",
    )
    # un-movable sort (the k4/HLL rule): the trailing sort's range
    # sampler re-runs the budget window + UNK-gate join above the last
    # exchange; the kept set is budget-bounded, so fold it once
    return out.localCheckpoint(eager=False).orderBy("doc_id")


@register("t54_curation_v3", oracle=_v3_oracle_filled())
def t54_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation v3 — the LM-era selection pipeline, composing the two
    newest stages under ONE differential: CCNet perplexity gate (LM
    trained on the FULL corpus, tail bucket dropped) → WordPiece
    tokenization of the survivors → UNK-fraction quality gate
    (pure-integer, >5% drops) → per-source greedy token budget
    denominated in REAL WordPiece pieces (hash-ordered, cumulative cut
    at V3_BUDGET). The oracle re-derives every stage from scratch via
    the reusable CTE builders (`lm.oracle_bigram_cte`,
    `wordpiece.oracle_wordpiece_cte` over the survivor CTE) — the
    t48/t49 composition discipline extended to the new tier.

    Scale posture: each stage is its own individually-probed linear
    pipeline; the composition adds only doc_id hash joins, the gates
    filter BEFORE the tokenizer so the fold runs on survivors, and the
    budget window partitions per source."""
    return curate_docs_v3(spark, table(spark, sf_dir, "documents"))


# --- t55: tokenizer A/B — BPE vs WordPiece cost per document ---------------


def _t55_oracle() -> str:
    from .wordpiece import oracle_wordpiece_cte

    return f"""
WITH RECURSIVE {oracle_docs_with_counts("bpe_d")},
{oracle_wordpiece_cte()},
wp AS (
  SELECT w0.doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(len(pieces)) AS BIGINT) AS wp_tokens
  FROM w0 JOIN fin USING (w) GROUP BY w0.doc_id
)
SELECT b.doc_id,
       CAST(b.n_tok AS BIGINT) AS bpe_tokens,
       wp.wp_tokens, wp.n_words,
       floor(CAST(wp.wp_tokens AS DOUBLE) / CAST(b.n_tok AS DOUBLE)
             * 10000 + 0.5) / 10000 AS wp_over_bpe,
       (wp.wp_tokens < b.n_tok) AS wordpiece_cheaper
FROM bpe_d b JOIN wp USING (doc_id)
WHERE b.n_tok > 0
ORDER BY b.doc_id
"""


@register("t55_tokenizer_ab", oracle=_t55_oracle())
def t55_tokenizer_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer A/B report: per-document cost of the engine's TWO
    tokenizer families — byte-level BPE (t39's ranked-merge replay)
    vs WordPiece (t52's greedy position scan) — the comparison a team
    sizing a token budget actually runs before choosing a tokenizer.
    Both counts are independently re-derived by the oracle (the BPE
    staged-CTE chain AND the WordPiece recursive scan composed in ONE
    query — the heaviest oracle composition in the registry); the
    ratio goes through the 4dp floor and the `cheaper` flag is an
    integer compare.

    Scale posture: two independent linear per-doc pipelines joined on
    doc_id — no new shuffle class; the BPE chain is zero-shuffle
    expression work, WordPiece is dictionary-bounded. The BPE side is
    explicitly repartitioned on the join key: without an exchange the
    chain is a shuffle-free expensive projection under the global
    sort, and the range-partitioner's SAMPLE job re-executes it (the
    round-9 SCALE.md rule — the probe caught exactly this as a 17×
    cliff at g1 before the fix; the exchange materializes the chain
    once and every later job reuses the shuffle stage)."""
    from .wordpiece import wordpiece_tokenize

    docs = table(spark, sf_dir, "documents")
    # round-13 (guide §4.4 duplicated-evaluation class, for expressions):
    # a post-join ``bpe_tokens > 0`` filter was pushed below the spread
    # exchange, re-evaluating the whole 1024-pass fold a SECOND time on
    # the un-spread single partition (measured as a 1-task 10 s stage).
    # ``n_tok > 0`` ⟺ non-NULL, non-empty text (NULL→NULL, ''→0, else ≥1),
    # so the equivalent CHEAP input predicate runs before the fold and no
    # filter references the expensive column at all.
    b = spread(docs.filter(F.length("text") > 0)).select(
        "doc_id",
        bpe_token_count("text").cast("bigint").alias("bpe_tokens"),
    ).repartition("doc_id")
    wp = wordpiece_tokenize(spark, docs).select(
        "doc_id", "n_words", F.col("n_pieces").alias("wp_tokens")
    )
    j = b.join(wp, "doc_id")
    return j.select(
        "doc_id",
        "bpe_tokens",
        "wp_tokens",
        "n_words",
        round4x_col(
            F.col("wp_tokens").cast("double")
            / F.col("bpe_tokens").cast("double")
        ).alias("wp_over_bpe"),
        (F.col("wp_tokens") < F.col("bpe_tokens"))
        .alias("wordpiece_cheaper"),
    ).orderBy("doc_id")


# --- t60: tokenizer A/B/C — all three families per document ----------------


def _t60_oracle() -> str:
    from .unigram import oracle_unigram_cte
    from .wordpiece import oracle_wordpiece_cte

    return f"""
WITH RECURSIVE {oracle_docs_with_counts("bpe_d")},
{oracle_wordpiece_cte()},
{oracle_unigram_cte()},
wpt AS (
  SELECT w0.doc_id, CAST(sum(len(pieces)) AS BIGINT) AS wp_tokens
  FROM w0 JOIN fin USING (w) GROUP BY w0.doc_id
),
ugt AS (
  SELECT uw0.doc_id,
         CAST(sum(len(pieces)) AS BIGINT) AS ug_tokens,
         CAST(sum(cost) AS BIGINT) AS ug_nll
  FROM uw0 JOIN ufin USING (w) GROUP BY uw0.doc_id
)
SELECT b.doc_id,
       CAST(b.n_tok AS BIGINT) AS bpe_tokens,
       wpt.wp_tokens, ugt.ug_tokens, ugt.ug_nll
FROM bpe_d b JOIN wpt USING (doc_id) JOIN ugt USING (doc_id)
WHERE b.n_tok > 0
ORDER BY b.doc_id
"""


@register("t60_tokenizer_abc", oracle=_t60_oracle())
def t60_tokenizer_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer A/B/C report: per-document cost of ALL THREE engine
    tokenizer families — byte-level BPE (ranked-merge replay),
    WordPiece (greedy position scan) and unigram-LM (Viterbi DP) —
    plus the unigram's integer NLL. The oracle composes the registry's
    three heaviest chain families in ONE query: the staged BPE CTE
    chain, the WordPiece recursive scan, and the unigram recursive
    Viterbi (t55's two-family record, extended). Pure integers — no
    float anywhere. (A winner column would be DECORATIVE: on the
    fixture the order is strictly bpe < unigram < wordpiece for every
    document — measured; the cross-family ordering and its crafted
    flips are pinned in tests/test_unigram.py instead.)

    Scale posture: three independent linear per-doc pipelines joined
    on doc_id. The BPE side keeps t55's repartition fix (a shuffle-
    free expensive projection under a global sort re-executes in the
    range-sampler otherwise — the round-9 rule); the WordPiece and
    unigram sides are dictionary-bounded folds behind shuffle-backed
    aggregates."""
    from .unigram import unigram_tokenize
    from .wordpiece import wordpiece_tokenize

    docs = table(spark, sf_dir, "documents")
    # round-13 (guide §4.4 duplicated-evaluation class, for expressions):
    # a post-join ``bpe_tokens > 0`` filter was pushed below the spread
    # exchange, re-evaluating the whole 1024-pass fold a SECOND time on
    # the un-spread single partition (measured as a 1-task 10 s stage).
    # ``n_tok > 0`` ⟺ non-NULL, non-empty text (NULL→NULL, ''→0, else ≥1),
    # so the equivalent CHEAP input predicate runs before the fold and no
    # filter references the expensive column at all.
    b = spread(docs.filter(F.length("text") > 0)).select(
        "doc_id",
        bpe_token_count("text").cast("bigint").alias("bpe_tokens"),
    ).repartition("doc_id")
    wp = wordpiece_tokenize(spark, docs).select(
        "doc_id", F.col("n_pieces").alias("wp_tokens")
    )
    ug = unigram_tokenize(spark, docs).select(
        "doc_id",
        F.col("n_pieces").alias("ug_tokens"),
        F.col("total_nll").alias("ug_nll"),
    )
    j = b.join(wp, "doc_id").join(ug, "doc_id")
    return j.select(
        "doc_id", "bpe_tokens", "wp_tokens", "ug_tokens", "ug_nll",
    ).orderBy("doc_id")
