"""Text-analysis operators for training-data pipelines (SURVEY.md §2J
J5/J6/J7 + language-ID, quality scoring, fingerprinting).

All expression-level (split / explode / higher-order array functions) —
no Python in the hot path. Scale notes: token explosion multiplies rows
by ~tokens/doc before the term aggregation; map-side combine collapses
it to |vocab|·|partitions|. Per-doc scores are embarrassingly parallel
(no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..exprs import round4
from ..registry import register

EN_MARKERS = ("the", "a", "an", "of", "and", "is")


def tokens(text_col: str = "text") -> Column:
    return F.split(F.lower(F.col(text_col)), " ")


# --- J5/J7: token stats per language slice -------------------------------

@register(
    "t1_token_stats",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens,
       ROUND(AVG(len(string_split(lower(text), ' '))), 4) AS avg_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    ntok = F.size(tokens())
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ntok.cast("bigint")).alias("total_tokens"),
            F.round(F.avg(ntok), 4).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


# --- J6: term frequencies -------------------------------------------------

@register(
    "t2_term_freq",
    oracle="""
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
)
SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM t
GROUP BY term
ORDER BY tf DESC, term
LIMIT 20
""",
)
def t2_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequencies (the TF and DF halves of TF-IDF),
    top-20 terms."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(tokens()).alias("term"))
    return (
        t.groupBy("term")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(20)
    )


# --- J6 full: TF-IDF (top term per doc) ----------------------------------

@register(
    "t6_tfidf_top_term",
    oracle="""
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1
), nd AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(nd.n / df.df) AS tfidf
  FROM tf JOIN df USING (term), nd
), ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term AS top_term, ROUND(tfidf, 4) AS tfidf
FROM ranked WHERE rn = 1
ORDER BY doc_id
""",
)
def t6_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: tf(term,doc) · ln(N/df(term)); highest-scoring term per
    doc. The doc-frequency side carries NO broadcast hint — the term
    vocabulary scales with the corpus (heavy-tailed; billions of
    distinct terms at 100 TB), so AQE picks broadcast only when it is
    genuinely small. Parity: ln(n/df) is one libm call on identical
    int ratios → identical doubles; tf multiplier integer."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(tokens()).alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = t.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size rides a one-row broadcast (t32/t50 shape) instead of a
    # blocking driver-side count() at plan-build (guide §5.1); ln(N/df)
    # sees the identical integer ratio either way
    nrow = d.agg(F.count("*").alias("__n"))
    scored = tf.join(df, "term").crossJoin(F.broadcast(nrow)).withColumn(
        "tfidf", F.col("tf") * F.log(F.col("__n") / F.col("df"))
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"),
                F.round("tfidf", 4).alias("tfidf"))
        .orderBy("doc_id")
    )


# --- quality scoring ------------------------------------------------------

@register(
    "t3_quality_score",
    oracle="""
WITH x AS (
  SELECT doc_id, n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_distinct(string_split(lower(text), ' '))) AS n_distinct
  FROM documents
)
SELECT doc_id, n_tokens, n_distinct,
       floor(n_distinct / n_tokens * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS ttr,
       floor((0.5 * (n_distinct / n_tokens)
              + 0.5 * least(n_tokens / 100.0, 1.0)) * 10000 + 0.5)
           / CAST(10000 AS DOUBLE) AS quality
FROM x
ORDER BY doc_id
""",
)
def t3_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality: type-token ratio blended with a length factor —
    the classic cheap quality gate before expensive pipeline stages."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    ttr = n_distinct / n_tokens
    quality = 0.5 * ttr + 0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (F.floor(ttr * 10000 + 0.5) / F.lit(10000.0)).alias("ttr"),
        (F.floor(quality * 10000 + 0.5) / F.lit(10000.0)).alias("quality"),
    ).orderBy("doc_id")


# --- language-ID heuristic ------------------------------------------------

@register(
    "t4_lang_id",
    oracle="""
WITH x AS (
  SELECT doc_id, lang,
         string_split(lower(text), ' ') AS ts
  FROM documents
), s AS (
  SELECT doc_id, lang,
         len(list_filter(ts, t -> t IN ('the', 'a', 'an', 'of', 'and', 'is'))) AS hits,
         len(ts) AS n
  FROM x
)
SELECT doc_id, lang, floor(hits / n * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS en_ratio,
       CASE WHEN hits / n >= 0.03 THEN 'en' ELSE 'other' END AS guessed
FROM s
ORDER BY doc_id
""",
)
def t4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic (n-gram/stopword family): ratio of
    English marker tokens. On the synthetic shared-vocabulary fixture the
    guess is degenerate by construction — the operator shape (profile
    match → argmax/threshold) is what scales to real corpora."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_MARKERS)))
    ratio = hits / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        (F.floor(ratio * 10000 + 0.5) / F.lit(10000.0)).alias("en_ratio"),
        F.when(ratio >= 0.03, "en").otherwise("other").alias("guessed"),
    ).orderBy("doc_id")


# --- document fingerprinting (rolling hash) ------------------------------

@register(
    "t5_fingerprint",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(lower(text), ' '),
                          t -> CAST(length(t) * 7 + ascii(t) AS BIGINT))),
         (h, v) -> (h * 31 + v) % 1000000007) AS fingerprint
FROM documents
ORDER BY doc_id
""",
)
def t5_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint (h = h·31 + f(token) mod
    p) — detects exact reorder-free duplication; cheap enough to run on
    every doc. Fold is left-to-right on both engines."""
    d = table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.transform(
            tokens(), lambda t: (F.length(t) * 7 + F.ascii(t)).cast("bigint")
        ),
        F.lit(0).cast("bigint"),
        lambda h, v: (h * 31 + v) % 1000000007,
    )
    return d.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


# --- source-slice metrics (J7) -------------------------------------------

@register(
    "t7_source_slices",
    oracle="""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents
GROUP BY source, lang
ORDER BY source, lang
""",
)
def t7_source_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            round4("AVG(n_chars)", "avg_chars"),
        )
        .orderBy("source", "lang")
    )


# --- J5+: BPE-style regex pre-tokenization --------------------------------

# GPT-2-style pretokenizer, simplified to the RE2-compatible subset
# (no contraction lookarounds) so the oracle can run the SAME pattern:
# letter runs, digit runs, punctuation runs (each with optional leading
# space), whitespace runs. Unicode classes, not [a-z] — documents.lang
# includes zh.
BPE_PRETOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


@register(
    "t8_bpe_token_count",
    oracle=rf"""
SELECT lang,
       CAST(SUM(len(regexp_extract_all(lower(text), '{BPE_PRETOKEN_RE}'))) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS total_ws_tokens,
       ROUND(AVG(len(regexp_extract_all(lower(text), '{BPE_PRETOKEN_RE}'))), 4) AS avg_bpe_tokens
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def t8_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways (the training-data budget metric):
    whitespace tokens and BPE-ish pretokens per language. Pure
    expression (regexp_extract_all + size) — counting never explodes
    rows, so it's a single scan + one small aggregate at any corpus
    size."""
    d = table(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(BPE_PRETOKEN_RE), F.lit(0))
    )
    ws = F.size(tokens())
    return (
        d.groupBy("lang")
        .agg(
            F.sum(bpe.cast("bigint")).alias("total_bpe_tokens"),
            F.sum(ws.cast("bigint")).alias("total_ws_tokens"),
            F.round(F.avg(bpe), 4).alias("avg_bpe_tokens"),
        )
        .orderBy("lang")
    )


# --- J5+: quality ratios (length / punctuation / stopwords) ---------------

STOPWORDS = (
    "the", "a", "of", "and", "to", "in",      # en
    "de", "la", "el", "que", "y",             # es/fr
    "und", "der", "die", "das",               # de
    "le", "les", "un", "une",                 # fr
)


@register(
    "t9_quality_ratios",
    oracle=f"""
WITH x AS (
  SELECT doc_id, lang,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^\\p{{L}}\\p{{N}}\\s]', '', 'g')) AS n_alnum_ws,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({list(STOPWORDS)}, t))) AS n_stop,
         length(replace(text, ' ', '')) AS n_nonspace
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       floor(CAST(n_chars - n_alnum_ws AS DOUBLE) / n_chars * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS punct_ratio,
       floor(CAST(n_stop AS DOUBLE) / n_tokens * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS stopword_ratio,
       floor(CAST(n_nonspace AS DOUBLE) / n_tokens * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS mean_token_len
FROM x
ORDER BY doc_id
""",
)
def t9_quality_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard cheap quality gates over a document corpus:
    punctuation density, stopword density (multilingual list), mean
    token length — all single-pass expressions, no explode, so the scan
    is the whole cost at any corpus size."""
    d = table(spark, sf_dir, "documents")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = tokens()
    n_chars = F.length("text")
    n_alnum_ws = F.length(F.regexp_replace("text", r"[^\p{L}\p{N}\s]", ""))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        (F.floor((n_chars - n_alnum_ws).cast("double") / n_chars * 10000 + 0.5)
         / F.lit(10000.0)).alias("punct_ratio"),
        (F.floor(n_stop.cast("double") / n_tokens * 10000 + 0.5)
         / F.lit(10000.0)).alias("stopword_ratio"),
        (F.floor(n_nonspace.cast("double") / n_tokens * 10000 + 0.5)
         / F.lit(10000.0)).alias("mean_token_len"),
    ).orderBy("doc_id")


# --- J7+: stratified source sampling (training-mixture weights) ----------

# Per-source keep thresholds out of 16 md5 hex buckets: mixture weights
# for corpus construction (e.g. upsample curated sources, downsample
# crawl). Class = source number % 4 → 16/8/4/2 buckets = 100%/50%/25%/12.5%.
@register(
    "t10_stratified_sample",
    oracle="""
SELECT doc_id, source, lang
FROM documents
WHERE strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))
      <= CASE CAST(substring(source, 4) AS INT) % 4
           WHEN 0 THEN 16 WHEN 1 THEN 8 WHEN 2 THEN 4 ELSE 2 END
""",
)
def t10_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: each source keeps a different
    fraction of documents (training-data mixture weights), membership
    decided by an md5 key-hash bucket — reproducible across engines,
    runs, and repartitioning, and PER-ROW (a pure filter: no shuffle,
    survives pushdown). At 100 TB this is how mixture construction
    stays a single scan; changing weights is a constant edit, not a
    reshuffle."""
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(
        "instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1))"
    )
    # Uncapped substring to mirror the oracle's substring(source, 4)
    # exactly — a length-capped substr would diverge on long source ids.
    src_num = F.expr("substring(source, 4)").cast("int")
    threshold = (
        F.when(src_num % 4 == 0, 16)
        .when(src_num % 4 == 1, 8)
        .when(src_num % 4 == 2, 4)
        .otherwise(2)
    )
    return d.filter(bucket <= threshold).select("doc_id", "source", "lang")


# --- J5+: sequence packing (token-budget binning) ------------------------

PACK_BUDGET = 2048


@register(
    "t11_sequence_pack",
    oracle=f"""
WITH t AS (
  SELECT lang, doc_id, len(string_split(lower(text), ' ')) AS tok
  FROM documents
), c AS (
  SELECT lang, doc_id, tok,
         SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cs
  FROM t
)
SELECT lang, CAST((cs - tok) // {PACK_BUDGET} AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS bin_tokens
FROM c
GROUP BY lang, bin
ORDER BY lang, bin
""",
)
def t11_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order sequence packing: assign documents (per language,
    in doc_id order) to training bins of ~{PACK_BUDGET} tokens by
    bucketing the EXCLUSIVE running token count — the streaming-friendly
    packing rule (a doc starts a new bin when the budget is crossed;
    no bin-packing search). One window shuffle on the partition key; at
    100 TB partition by (source, shard) so packing parallelizes and
    bins stay shard-local for sequential reads."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents")
    tok = F.size(F.split(F.lower("text"), " "))
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = d.select("lang", "doc_id", tok.alias("tok")).withColumn(
        "cs", F.sum("tok").over(w)
    )
    return (
        c.groupBy(
            "lang",
            F.expr(f"CAST((cs - tok) DIV {PACK_BUDGET} AS BIGINT)").alias("bin"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("lang", "bin")
    )


# --- J6+: heavy hitters via count-min sketch -----------------------------

CMS_EPS = 0.001   # over-estimate bound: eps * total_tokens
CMS_CONF = 0.99


@register("t12_heavy_hitters_cms")
def t12_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-term mining with a count-min sketch: ONE mergeable
    aggregate over the exploded term stream builds the sketch (counter
    matrices add element-wise, so partial aggregation is exact and
    order-independent — the 100 TB path: no per-term shuffle, the
    sketch is KBs however large the corpus). The top-10 exact terms are
    then point-queried against the sketch; output is (term, exact count,
    sketch estimate). CMS guarantees estimate ≥ exact and, w.h.p.,
    ≤ exact + eps·N — asserted by test. Rows-only: DuckDB has no CMS;
    the exact counts are oracle-covered by t2_term_freq.

    The sketch collect is control-plane (one binary blob), like the
    signal table — not a data-scale collect."""
    d = table(spark, sf_dir, "documents")
    t = d.select(F.explode(tokens()).alias("term"))
    sk_row = t.agg(
        F.expr(
            f"count_min_sketch(term, CAST({CMS_EPS} AS DOUBLE), "
            f"CAST({CMS_CONF} AS DOUBLE), 42)"
        ).alias("sk")
    ).first()
    top = (
        t.groupBy("term")
        .agg(F.count("*").alias("exact"))
        .orderBy(F.desc("exact"), F.asc("term"))
        .limit(10)
        .collect()
    )
    jvm = spark.sparkContext._jvm
    bio = jvm.java.io.ByteArrayInputStream(bytes(sk_row.sk))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bio)
    rows = [
        (r.term, int(r.exact), int(cms.estimateCount(r.term))) for r in top
    ]
    return spark.createDataFrame(rows, "term STRING, exact BIGINT, estimate BIGINT")


@register(
    "t12_cms_exact",
    oracle="""
WITH t AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
), cnt AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact FROM t GROUP BY term
)
SELECT term, exact, exact AS estimate
FROM cnt ORDER BY exact DESC, term LIMIT 10
""",
)
def t12_cms_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The t12 count-min pipeline pinned in the sketch's EXACT regime:
    eps 10^-4 gives width 20000 ≫ the corpus vocabulary, so the
    probability that some term collides with another in ALL depth=7 hash
    rows is (V²/2w)^7-scale — effectively zero, and deterministic for
    the fixed seed anyway. In that regime min-over-rows returns the true
    count and the estimate column EQUALS exact, so the whole build →
    serialize → JVM point-query path is differentially checked (oracle
    states estimate = exact). t12_heavy_hitters_cms keeps the
    production eps (overestimate-bounded, error-bound-tested) — same
    operator, collision behavior exercised there."""
    d = table(spark, sf_dir, "documents")
    t = d.select(F.explode(tokens()).alias("term"))
    sk_row = t.agg(
        F.expr(
            "count_min_sketch(term, CAST(0.0001 AS DOUBLE), "
            "CAST(0.99 AS DOUBLE), 42)"
        ).alias("sk")
    ).first()
    top = (
        t.groupBy("term")
        .agg(F.count("*").alias("exact"))
        .orderBy(F.desc("exact"), F.asc("term"))
        .limit(10)
        .collect()
    )
    jvm = spark.sparkContext._jvm
    bio = jvm.java.io.ByteArrayInputStream(bytes(sk_row.sk))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bio)
    rows = [
        (r.term, int(r.exact), int(cms.estimateCount(r.term))) for r in top
    ]
    return spark.createDataFrame(rows, "term STRING, exact BIGINT, estimate BIGINT")


# --- t13: n-gram novelty (repetition / boilerplate filter) ---------------

_SHINGLE_CTE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
), sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                  i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
    FROM toks WHERE len(ts) >= 3
  )
)"""


@register(
    "t13_ngram_novelty",
    oracle=_SHINGLE_CTE + """,
dfreq AS (
  SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh
), per AS (
  SELECT s.doc_id, COUNT(*) AS n_sh,
         CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
  FROM sh s JOIN dfreq d USING (sh)
  GROUP BY s.doc_id
)
SELECT doc_id, n_sh, n_unique,
       floor(CAST(n_unique AS DOUBLE) / n_sh * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS novelty
FROM per
ORDER BY novelty DESC, doc_id
LIMIT 100
""",
)
def t13_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty = fraction of its distinct 3-gram shingles that
    occur in NO other document — the standard repetition/boilerplate
    filter in training-data curation (low novelty ⇒ templated text).

    Scale (rewritten join-free after the round-4 scale probe): the naive
    spelling joins every shingle instance back to the df table — a
    corpus-sized equi-join on long strings that falls off a cliff the
    moment the df side outgrows the broadcast threshold (measured 24×
    wall at 10× data). But no join is needed: a df=1 shingle belongs to
    exactly ONE document, so min(doc_id) inside the frequency aggregate
    IS that owner — n_unique is a second tiny aggregate over the
    filtered df table, and n_sh is a per-row expression
    (size ∘ array_distinct), no explode at all. What remains: one
    explode + one hash aggregate over shingles + a per-doc-sized join
    (measured 4× wall at 10× data, sub-linear). Tie-free floor-rounding
    and a doc_id tie-break keep the LIMIT deterministic (parity
    policy)."""
    from .dedup import shingles

    d = spread(table(spark, sf_dir, "documents")).filter(
        F.size(tokens()) >= 3
    )
    n_doc = d.select(
        "doc_id", F.size(F.array_distinct(shingles("text"))).alias("n_sh")
    )
    uniq = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text"))).alias("sh"),
        )
        .groupBy("sh")
        .agg(F.count("*").alias("df"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_unique"))
    )
    per = n_doc.join(uniq, "doc_id", "left").select(
        "doc_id",
        "n_sh",
        F.coalesce("n_unique", F.lit(0)).cast("bigint").alias("n_unique"),
    )
    from ..exprs import round4x

    return (
        per.select(
            "doc_id", "n_sh", "n_unique",
            round4x("CAST(n_unique AS DOUBLE) / n_sh").alias("novelty"),
        )
        .orderBy(F.desc("novelty"), "doc_id")
        .limit(100)
    )


# --- t14: benchmark decontamination (n-gram containment) -----------------

# Shared by t14 (broadcast-set membership) and t22_decontam_bloom (Bloom
# pre-filter + exact confirm, defined below): both spellings compute the
# SAME exact containment, so one SQL twin checks both — which is the
# point of t22's design (the Bloom filter may only change WORK, never
# the answer).
_DECONTAM_ORACLE = _SHINGLE_CTE + """,
bench AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0
), per AS (
  SELECT s.doc_id, COUNT(*) AS n_sh,
         CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM sh s LEFT JOIN bench b ON s.sh = b.sh
  WHERE s.doc_id % 20 <> 0
  GROUP BY s.doc_id
)
SELECT doc_id, n_sh, n_hit,
       floor(CAST(n_hit AS DOUBLE) / n_sh * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS containment
FROM per
ORDER BY containment DESC, doc_id
LIMIT 100
"""


@register(
    "t14_decontaminate",
    oracle=_DECONTAM_ORACLE,
)
def t14_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: containment of each training doc's
    3-gram shingle set in the evaluation set's shingle pool (docs with
    doc_id % 20 == 0 stand in for the benchmark). High containment ⇒
    the training doc leaks eval content and must be dropped — the
    decontamination pass every serious pretraining pipeline runs.

    Scale: the benchmark shingle pool is small by construction
    (benchmarks are MBs, corpora are TBs) — it BROADCASTS, so the
    containment join is map-side with zero shuffle of the corpus
    shingles; the only shuffle is the per-doc aggregate."""
    from .dedup import shingles

    # round-13: spread the single-split scan under the shingle explode
    # (guide §2.5; same diagnosis as t22 — no-op at production splits).
    d = spread(table(spark, sf_dir, "documents"))
    sh = (
        d.filter(F.size(tokens()) >= 3)
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text"))).alias("sh"),
        )
    )
    bench = (
        sh.filter(F.col("doc_id") % 20 == 0)
        .select("sh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per = (
        sh.filter(F.col("doc_id") % 20 != 0)
        .join(F.broadcast(bench), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
        )
    )
    from ..exprs import round4x

    return (
        per.select(
            "doc_id", "n_sh", "n_hit",
            round4x("CAST(n_hit AS DOUBLE) / n_sh").alias("containment"),
        )
        .orderBy(F.desc("containment"), "doc_id")
        .limit(100)
    )


# --- t22: decontamination with a Bloom pre-filter -------------------------

BLOOM_M_BITS = 1 << 20  # bitmap width (1 Mbit = 16k words of 64)
BLOOM_K = 3             # hash functions


def bloom_build(keys: DataFrame, col: str) -> DataFrame:
    """Aggregate a key column into a 1-row Bloom bitmap: MAP<word_idx,
    bits> over BLOOM_M_BITS bits, BLOOM_K positions per key
    (pmod(xxhash64(seed_i, key), m)). Pure expressions — the build is
    one explode + one bit_or aggregate + one map_from_entries; the
    result row broadcasts at 16 KB-per-set-word scale regardless of key
    count."""
    pos = F.array(*[
        F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(BLOOM_M_BITS))
        for i in range(BLOOM_K)
    ])
    return (
        keys.select(F.explode(pos).alias("p"))
        .select((F.col("p") / 64).cast("long").alias("word"),
                (F.col("p") % 64).cast("int").alias("bit"))
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "bits")))
             .alias("bloom"))
    )


def bloom_maybe(col, bloom_col="bloom"):
    """Membership probe against a bloom_build() bitmap column: true iff
    every one of the BLOOM_K bit positions is set (no false negatives;
    false positives bounded by m/k sizing)."""
    def bit_set(i):
        p = F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(BLOOM_M_BITS))
        word = F.coalesce(
            F.element_at(F.col(bloom_col), (p / 64).cast("long")),
            F.lit(0).cast("long"),
        )
        # NB: the seed literal must stay INT to hash identically to the
        # build side (xxhash64 hashes INT and LONG literals differently)
        mask = F.expr(
            f"shiftleft(1L, CAST(pmod(xxhash64({i}, {col}),"
            f" {BLOOM_M_BITS}) % 64 AS INT))"
        )
        return word.bitwiseAND(mask) != 0

    cond = bit_set(0)
    for i in range(1, BLOOM_K):
        cond = cond & bit_set(i)
    return cond


@register("t22_decontam_bloom", oracle=_DECONTAM_ORACLE)
def t22_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t14's decontamination with a Bloom PRE-FILTER: corpus shingles
    first probe a 1 Mbit bitmap of the benchmark set (pure expressions,
    no join); only probable members carry into the exact broadcast
    confirm, which removes the Bloom's false positives. Answer-identical
    to t14 by construction — the shared oracle hash-checks that the
    filter changed work, never results.

    Scale rationale: at 100 TB the exact benchmark set may be GBs (too
    big to broadcast cheaply, or the join becomes a corpus-wide
    shuffle), while the Bloom bitmap is KBs at any benchmark size. The
    pre-filter drops the overwhelmingly-clean corpus rows before they
    touch the join, shrinking probe volume (broadcast case) or shuffle
    volume (sort-merge case) to ~the contaminated fraction + fpp. Here
    the maybe-condition is part of the join predicate, so the plan stays
    one scan wide."""
    from .dedup import shingles

    # round-13: the shingle explode + Bloom probe ran on the scan's ONE
    # split (measured as a 1-task 4.6 s stage); spread() widens it —
    # no-op at production split counts (guide §2.5).
    d = spread(table(spark, sf_dir, "documents"))
    sh = (
        d.filter(F.size(tokens()) >= 3)
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text"))).alias("sh"),
        )
    )
    bench = sh.filter(F.col("doc_id") % 20 == 0).select("sh").distinct()
    bloom = bloom_build(bench, "sh")
    probe = (
        sh.filter(F.col("doc_id") % 20 != 0)
        .crossJoin(F.broadcast(bloom))
        .withColumn("maybe", bloom_maybe("sh"))
        .drop("bloom")
    )
    bench_b = bench.select(F.col("sh").alias("sh_b"), F.lit(1).alias("hit"))
    per = (
        probe.join(
            F.broadcast(bench_b),
            probe["maybe"] & (probe["sh"] == bench_b["sh_b"]),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
        )
    )
    from ..exprs import round4x

    return (
        per.select(
            "doc_id", "n_sh", "n_hit",
            round4x("CAST(n_hit AS DOUBLE) / n_sh").alias("containment"),
        )
        .orderBy(F.desc("containment"), "doc_id")
        .limit(100)
    )


# --- t15: declarative data-quality expectations (Deequ-style) ------------

@register(
    "t15_data_quality",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       floor(AVG(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
             * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS empty_rate,
       floor(AVG(CASE WHEN n_chars = len(text) THEN 1 ELSE 0 END)
             * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS len_ok_rate,
       floor(AVG(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END)
             * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS lang_valid_rate,
       floor(AVG(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
             * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS short_rate,
       CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS dup_ids
FROM documents
GROUP BY source
ORDER BY source
""",
)
def t15_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint/expectation metrics per source slice (the Deequ-style
    audit every ingest runs before training): null/empty rate, metadata
    consistency (n_chars == len(text)), lang-domain validity, short-doc
    rate, duplicate-id count. One hash aggregate over one scan — every
    check is an expression, so adding expectations never adds passes.
    Integer-derived ratios use tie-free floor rounding (parity policy)."""
    d = table(spark, sf_dir, "documents")

    def rate(cond: str, alias: str):
        from ..exprs import round4x

        return round4x(f"AVG(CASE WHEN {cond} THEN 1 ELSE 0 END)").alias(alias)

    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            rate("text IS NULL OR text = ''", "empty_rate"),
            rate("n_chars = length(text)", "len_ok_rate"),
            rate("lang IN ('en','de','fr','es','zh')", "lang_valid_rate"),
            rate("n_chars < 100", "short_rate"),
            (F.count("*") - F.countDistinct("doc_id")).alias("dup_ids"),
        )
        .orderBy("source")
    )


# --- t16: distribution drift between slices (PSI) ------------------------

@register(
    "t16_drift_psi",
    oracle="""
WITH c AS (
  SELECT source, CAST(floor(n_chars / 100) AS BIGINT) AS b, COUNT(*) AS n
  FROM documents GROUP BY 1, 2
), t AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY source
), p AS (
  SELECT c.source, c.b, CAST(c.n AS DOUBLE) / t.t AS p
  FROM c JOIN t USING (source)
), base AS (
  SELECT b, p AS pb FROM p WHERE source = 'src0'
)
SELECT p.source,
       ROUND(SUM((p.p - base.pb) * ln(p.p / base.pb)), 4) AS psi
FROM p JOIN base USING (b)
WHERE p.source <> 'src0'
GROUP BY p.source
ORDER BY p.source
""",
)
def t16_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's doc-length
    distribution against the src0 baseline (the standard drift alarm
    between a new crawl slice and the corpus it should resemble).
    Fixed-width buckets keep the histogram deterministic; buckets are
    compared where both slices have mass (inner join — the PSI
    epsilon-smoothing decision is the caller's).

    Scale: two hash aggregates over one scan + a BROADCAST of the
    baseline histogram (a histogram is always tiny); per-slice PSI is
    one more aggregate. ln-derived sums use plain ROUND (continuous
    values — parity policy)."""
    d = table(spark, sf_dir, "documents")
    cnts = (
        d.groupBy("source", F.floor(F.col("n_chars") / 100).alias("b"))
        .agg(F.count("*").alias("n"))
    )
    tots = cnts.groupBy("source").agg(F.sum("n").alias("t"))
    p = cnts.join(tots, "source").select(
        "source", "b", (F.col("n") / F.col("t")).alias("p")
    )
    base = p.filter(F.col("source") == "src0").select(
        "b", F.col("p").alias("pb")
    )
    return (
        p.filter(F.col("source") != "src0")
        .join(F.broadcast(base), "b")
        .groupBy("source")
        .agg(
            F.round(
                F.sum((F.col("p") - F.col("pb")) * F.log(F.col("p") / F.col("pb"))),
                4,
            ).alias("psi")
        )
        .orderBy("source")
    )


# --- t17: PII redaction (regex scrubbing) --------------------------------

@register(
    "t17_pii_redact",
    oracle=r"""
WITH aug AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0 THEN 'reach me at user' || CAST(doc_id AS VARCHAR) || '@mail.example ' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0 THEN 'call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ELSE '' END)
    || text AS raw
  FROM documents
), red AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(raw,
      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
  FROM aug
)
SELECT doc_id,
  CAST((length(redacted) - length(replace(redacted, '<EMAIL>', ''))) // 7 AS BIGINT) AS n_emails,
  CAST((length(redacted) - length(replace(redacted, '<PHONE>', ''))) // 7 AS BIGINT) AS n_phones,
  CAST(length(redacted) AS BIGINT) AS red_len,
  substring(redacted, 1, 40) AS head
FROM red ORDER BY doc_id
""",
)
def t17_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing, the first transform of any web-scale curation
    pipeline: regex-redact emails and phone numbers, count what was
    removed. The fixture corpus is synthetic word-soup with no real PII,
    so both sides deterministically plant PII derived from doc_id before
    redacting — the differential check still exercises the actual
    operator (global regexp_replace semantics, char-class/quantifier
    parity between Java regex and RE2) on every row.

    Scale: pure per-row expressions (regexp_replace stays in codegen) —
    embarrassingly parallel, survives any partitioning, no shuffle
    except the output sort."""
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("reach me at user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example "),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" "),
            ),
        ).otherwise(F.lit("")),
        F.col("text"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            raw, r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"
        ),
        r"\+1-555-[0-9]{4}",
        "<PHONE>",
    )
    def occurrences(col, token):
        return (
            (F.length(col) - F.length(F.regexp_replace(col, token, "")))
            / len(token)
        ).cast("bigint")
    return (
        d.select("doc_id", red.alias("redacted"))
        .select(
            "doc_id",
            occurrences(F.col("redacted"), "<EMAIL>").alias("n_emails"),
            occurrences(F.col("redacted"), "<PHONE>").alias("n_phones"),
            F.length("redacted").cast("bigint").alias("red_len"),
            F.substring("redacted", 1, 40).alias("head"),
        )
        .orderBy("doc_id")
    )


# --- t18: RAG-style overlapping chunking ---------------------------------

@register(
    "t18_chunk_documents",
    oracle="""
WITH c AS (
  SELECT doc_id, text,
         unnest(generate_series(0, (length(text) - 1) // 80)) AS i
  FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(i * 80 + 1 AS BIGINT) AS chunk_start,
       CAST(length(substring(text, CAST(i * 80 + 1 AS INT), 120)) AS BIGINT) AS chunk_len,
       md5(substring(text, CAST(i * 80 + 1 AS INT), 120)) AS fp
FROM c ORDER BY doc_id, chunk_id
""",
)
def t18_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunking (window 120 chars, stride 80 →
    40-char overlap): the retrieval/embedding prep step that turns each
    document into indexable passages. Chunk text is fingerprinted (md5)
    rather than carried — the differential check covers content without
    hauling every chunk through the comparator.

    Scale: sequence()+explode fans each row out to ceil(len/stride)
    chunks with no shuffle (explode is pipeline-local); substring stays
    in codegen. Downstream embedding is a mapInPandas over these rows."""
    d = table(spark, sf_dir, "documents")
    chunk = F.expr("substring(text, CAST(i * 80 + 1 AS INT), 120)")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(
                F.expr("sequence(0, (length(text) - 1) DIV 80)")
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("chunk_id"),
            (F.col("i") * 80 + 1).cast("bigint").alias("chunk_start"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
            F.md5(chunk).alias("fp"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# --- t19: repetition filter (Gopher top-bigram fraction) ------------------

@register(
    "t19_rep_2gram",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS w,
         generate_subscripts(string_split(lower(text), ' '), 1) AS i
  FROM documents
), seq AS (
  SELECT doc_id, w, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nxt FROM tok
), bg AS (
  SELECT doc_id, w || ' ' || nxt AS bg FROM seq WHERE nxt IS NOT NULL
), cnt AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_count,
       floor(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS top_frac
FROM cnt GROUP BY doc_id
ORDER BY top_frac DESC, doc_id LIMIT 100
""",
)
def t19_rep_2gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's word
    bigrams taken by its single most frequent bigram (high ⇒ templated /
    looping text, a standard pre-training quality filter).

    Scale: bigrams are built with an array transform over the token
    array (adjacent pairs, no self-join, no window, stays codegen-side),
    then one explode + two hash aggregates keyed by doc_id — the
    per-document group is bounded by document length. The oracle builds
    the same pairs with lead() — different construction, same value.
    Tie-free floor rounding + doc_id tie-break (parity policy)."""
    d = table(spark, sf_dir, "documents")
    bg = (
        d.select("doc_id", F.split(F.lower("text"), " ").alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
                )
            ).alias("bg"),
        )
    )
    cnt = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    from ..exprs import round4x

    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_count"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "top_count",
            round4x(
                "CAST(top_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE)"
            ).alias("top_frac"),
        )
        .orderBy(F.desc("top_frac"), "doc_id")
        .limit(100)
    )


# --- t20: inverted index (posting lists) ---------------------------------

@register(
    "t20_inverted_index",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), post AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         list_sort(array_agg(doc_id))[1:20] AS postings
  FROM tok GROUP BY term
)
SELECT term, df, postings FROM post ORDER BY df DESC, term LIMIT 50
""",
)
def t20_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency + sorted posting
    list (capped at 20 ids — the retrieval-shard head; full lists go to
    a partitioned sink, not the comparator). The core of any corpus
    search/dedup-lookup side structure.

    Scale: explode over distinct per-doc terms, ONE hash aggregate keyed
    by term; collect_list is bounded by the cap after sort+slice. Posting
    lists for the full index would be written bucketed by term (see
    bucketed_sink) so lookups are exchange-free. Stop-word-frequency
    terms are the skew risk at 100 TB: the df aggregate map-side-combines,
    and the capped slice bounds the reduce-side row size."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("term"),
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20).alias(
                "postings"
            ),
        )
        .orderBy(F.desc("df"), "term")
        .limit(50)
    )


# --- t21: Zipf exponent of the term-frequency distribution ----------------

@register(
    "t21_zipf_slope",
    oracle="""
WITH t AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
), f AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM t GROUP BY term
), ranked AS (
  SELECT term, freq,
         row_number() OVER (ORDER BY freq DESC, term) AS rnk
  FROM f
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(regr_slope(ln(freq), ln(rnk)), 4) AS zipf_slope,
       ROUND(regr_r2(ln(freq), ln(rnk)), 4) AS r2
FROM ranked
""",
)
def t21_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent of the corpus: OLS slope of ln(freq) over
    ln(rank) — the one-number corpus-health check (natural language sits
    near −1; synthetic/templated corpora deviate, as this fixture does).

    Scale: term frequencies are one hash aggregate; the global rank is a
    single-partition window over |vocab| rows (vocabulary is always
    tiny next to the corpus — rank the top-K vocab slice if it were
    not), and the regression is a mergeable second-moment aggregate.
    ln() of identical integers is one libm call on both engines; plain
    ROUND per the continuous-value policy."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents")
    t = d.select(F.explode(tokens()).alias("term"))
    f = t.groupBy("term").agg(F.count("*").alias("freq"))
    ranked = f.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("freq"), "term"))
    )
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(
            F.expr("regr_slope(ln(freq), ln(rnk))"), 4
        ).alias("zipf_slope"),
        F.round(F.expr("regr_r2(ln(freq), ln(rnk))"), 4).alias("r2"),
    )


# --- t23: temperature-weighted source mixing -----------------------------

@register(
    "t23_source_mixture",
    oracle="""
WITH c AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), den AS (
  SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS den FROM c
), s AS (
  SELECT d.source, COUNT(*) AS sampled_n
  FROM documents d JOIN c ON d.source = c.source
  WHERE CAST(CAST('0x' || substring(md5('p0|' || CAST(doc_id AS VARCHAR)), 1, 15)
             AS BIGINT) AS DOUBLE) / 1152921504606846976.0
        < 4.0 * sqrt(CAST(n_docs AS DOUBLE)) / n_docs
  GROUP BY d.source
)
SELECT c.source,
       CAST(c.n_docs AS BIGINT) AS n_docs,
       ROUND(sqrt(CAST(c.n_docs AS DOUBLE)) / den.den, 4) AS q,
       CAST(COALESCE(s.sampled_n, 0) AS BIGINT) AS sampled_n
FROM c CROSS JOIN den LEFT JOIN s ON c.source = s.source
ORDER BY c.source
""",
)
def t23_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing — the corpus-composition step
    of LLM training-data prep (alpha = 0.5, the standard "unigram
    smoothing" temperature: small sources are up-weighted relative to
    proportional sampling, q_s ∝ sqrt(n_s)). Two halves, both exact:

    - the MIXTURE WEIGHTS q_s = sqrt(n_s) / Σ sqrt(n_s) (continuous →
      plain ROUND(,4) per the parity policy);
    - a REALIZED deterministic sample at per-source rate 4/sqrt(n_s):
      doc kept iff phash(doc_id)/2^60 < 4·sqrt(n_s)/n_s. The threshold
      is parity-SAFE by construction: sqrt is IEEE exact-rounded, the
      multiply/divide happen in one fixed order on both engines, and
      the 60-bit hash→double conversion rounds identically — so no
      cross-engine boundary flip can change a count (unlike a
      threshold derived from the Σ sqrt denominator, whose summation
      order differs between engines).

    Scale posture: weights are one map-side-combined groupBy over the
    corpus + a 20-row broadcast; the sample is a stateless per-row
    predicate (no shuffle beyond the count agg). At 100 TB the same
    plan holds — the mixing table stays KB-sized however large the
    corpus."""
    from .dedup import _phash_spark

    d = table(spark, sf_dir, "documents").select("source", "doc_id")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    den = counts.agg(
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("den")
    )
    q = counts.crossJoin(F.broadcast(den))
    sampled = (
        d.join(F.broadcast(counts), "source")
        .withColumn(
            "h", F.expr(_phash_spark("CAST(doc_id AS STRING)", 0))
        )
        .filter(
            F.col("h").cast("double") / F.lit(float(1 << 60))
            < F.lit(4.0) * F.sqrt(F.col("n_docs").cast("double"))
            / F.col("n_docs")
        )
        .groupBy("source")
        .agg(F.count("*").alias("sampled_n"))
    )
    return (
        q.join(sampled, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round(
                F.sqrt(F.col("n_docs").cast("double")) / F.col("den"), 4
            ).alias("q"),
            F.coalesce("sampled_n", F.lit(0)).cast("bigint")
            .alias("sampled_n"),
        )
        .orderBy("source")
    )


@register(
    "t24_epoch_shuffle",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         md5('ep1:' || CAST(doc_id AS VARCHAR)) AS ord_key
  FROM documents
), sharded AS (
  SELECT doc_id, ord_key,
         CAST(ascii(substr(ord_key, 1, 1)) % 4 AS INT) AS shard
  FROM keyed
)
SELECT shard, doc_id,
       CAST(row_number() OVER (
         PARTITION BY shard ORDER BY ord_key, doc_id
       ) AS BIGINT) AS pos
FROM sharded
ORDER BY shard, pos
""",
)
def t24_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment — the data-loader
    primitive a distributed training job needs: every worker, engine,
    and re-run must agree on example order WITHOUT coordination.
    Order key = md5(epoch_seed || doc_id) (portable: identical bytes in
    Spark and DuckDB — the engine-neutral analog of xxhash64-seeded
    shuffling); shard = first hex nibble's ascii mod n_shards (portable
    integer derivation — no engine hash involved); position =
    row_number per shard over the hash order with doc_id tie-break
    (md5 collisions are improbable but ties must not flip ranks).

    Scale: one window per shard partition — the shuffle is BY SHARD
    (each task sorts one training shard), which is exactly how the
    loader consumes it; changing the seed string re-shuffles every
    epoch with zero state. No RNG, no driver participation."""
    docs = table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("ep1:"), F.col("doc_id").cast("string")))
        .alias("ord_key"),
    )
    sharded = keyed.withColumn(
        "shard", (F.ascii(F.substring("ord_key", 1, 1)) % 4).cast("int")
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("shard").orderBy("ord_key", "doc_id")
    return (
        sharded.select(
            "shard", "doc_id",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


# --- t61: weighted sampling without replacement (Efraimidis–Spirakis) ----

#: docs kept per source by the weighted reservoir rule.
WSAMPLE_K = 25


@register(
    "t61_weighted_sample",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST('0x' || substring(md5('ws|' || CAST(doc_id AS VARCHAR)),
                                1, 15) AS BIGINT) AS h
  FROM documents
), keyed AS (
  SELECT doc_id, source, w,
         -ln((CAST(h AS DOUBLE) + 1.0) / 1152921504606846976.0)
           / CAST(w AS DOUBLE) AS k
  FROM d
), ranked AS (
  SELECT doc_id, source, w, k,
         row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
           AS rn
  FROM keyed
)
SELECT doc_id, source, w AS weight,
       floor(k * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) AS es_key,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {WSAMPLE_K}
ORDER BY source, rank
""",
)
def t61_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement per source — the
    Efraimidis–Spirakis (2006) reservoir rule, the standard primitive
    for weight-proportional data mixing (longer/higher-quality docs
    drawn more often, no RNG state, no driver pass): every doc gets
    key ``-ln(u)/w`` from a PORTABLE deterministic uniform
    u = (md5-60bit + 1)/2^60 and weight w = token count; the k
    smallest keys per source are exactly a weight-proportional sample
    without replacement. The whole derivation is the identical IEEE op
    sequence on both engines (one ln, one divide — the t27/t30
    ln-parity precedent), so even rank BOUNDARIES agree bit-exactly;
    ties (impossible with distinct hashes, pinned anyway) break by
    doc_id.

    Scale: one expression pass + one per-source window with
    WindowGroupLimit pruning at k — the t29 domain-cap shape; changing
    the seed string re-draws the sample with zero state. This is the
    doc-level complement of t23's source-level temperature mixing."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("bigint")
    # the portable 60-bit hash (dedup._phash_spark shape, 'ws|' seed)
    h = F.expr(
        "CAST(conv(substring(md5(concat('ws|', CAST(doc_id AS STRING)))"
        ", 1, 15), 16, 10) AS BIGINT)"
    )
    k = -F.log(
        (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    ) / F.col("w").cast("double")
    win = W.partitionBy("source").orderBy("k", "doc_id")
    return (
        d.select("doc_id", "source", w.alias("w"))
        .withColumn("k", k)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= WSAMPLE_K)
        .select(
            "doc_id", "source", F.col("w").alias("weight"),
            (F.floor(F.col("k") * 1000000 + F.lit(0.5))
             / F.lit(1000000.0)).alias("es_key"),
            F.col("rn").cast("bigint").alias("rank"),
        )
        .orderBy("source", "rank")
    )


# --- t25: exact-substring (segment) dedup across the corpus --------------

SUBSTR_DEDUP_K = 5  # words per segment; production ~50-token spans


@register(
    "t25_substring_dedup",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), segs AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(
           words[(i*{SUBSTR_DEDUP_K}+1):(i*{SUBSTR_DEDUP_K}+{SUBSTR_DEDUP_K})],
           ' ') AS seg
  FROM w, unnest(range(0,
        CAST(ceil(len(words) / {SUBSTR_DEDUP_K}.0) AS BIGINT))) AS t(i)
), ranked AS (
  SELECT doc_id, pos, seg,
         row_number() OVER (PARTITION BY md5(seg)
                            ORDER BY doc_id, pos) AS rn
  FROM segs
)
SELECT doc_id,
       count(*) AS n_segments,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                           ORDER BY pos), '') AS cleaned
FROM ranked GROUP BY doc_id ORDER BY doc_id
""",
)
def t25_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring deduplication (the RefinedWeb / C4 cleaning
    stage: remove text spans that occur verbatim elsewhere in the
    corpus, keeping only the FIRST occurrence). Documents are segmented
    into non-overlapping K-word spans; a span occurrence survives iff
    it is the globally first (min (doc_id, pos)) occurrence of that
    exact text; each doc is reassembled from its surviving spans.

    Plan: segment expression-level (split + slice inside a transform —
    no UDF), ONE shuffle partitioned on md5(span) (fixed-width key, not
    the span text) for the first-occurrence window, then a per-doc
    aggregate reassembles. Duplicate-heavy spans concentrate on few
    hash keys, but the window only ranks — per-row work is O(1), so a
    pathological hot span costs one task an O(m log m) local sort of
    its m copies (AQE has no skew remedy for window shuffles — same-
    key rows can't split under a rank; the cost is bounded by the
    span's own duplication, not squared). No joins, no driver
    collection; linear in corpus size at any scale."""
    from pyspark.sql.window import Window as W

    K = SUBSTR_DEDUP_K
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    nseg = F.ceil(F.size(words) / F.lit(float(K))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(words, i * K + 1, K), " "),
    )
    e = docs.select("doc_id", F.posexplode(segs).alias("pos", "seg")).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "seg",
        F.md5("seg").alias("h"),
    )
    w = W.partitionBy("h").orderBy("doc_id", "pos")
    ranked = e.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct("pos", "seg")
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.filter(
                            F.collect_list(kept_struct),
                            lambda x: x.isNotNull(),
                        )
                    ),
                    lambda x: x.seg,
                ),
                " ",
            ).alias("cleaned"),
        )
        .orderBy("doc_id")
    )


# --- t26: tokenizer vocab coverage / OOV rate ----------------------------

# 20 < the fixture's 31-word vocabulary, so every doc carries REAL
# OOV mass and the differential exercises the rate, not just the
# token counts (500 would cover the whole fixture vocab → oov ≡ 0).
# Production: the size of the tokenizer vocab under audit.
VOCAB_N = 20


@register(
    "t26_vocab_coverage",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
    FROM toks GROUP BY tok
  ) WHERE rn <= {VOCAB_N}
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       floor((CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*)) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id ORDER BY t.doc_id
""",
)
def t26_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage (the pre-training fit check: what
    fraction of each document falls outside a fixed-size vocabulary?).
    The vocab is DERIVED in-query — the top VOCAB_N tokens by corpus
    frequency (count DESC, token ASC tie-break, the deterministic-LIMIT
    rule) — then every token is membership-tested against it.

    Plan: token frequency is one shuffled agg; the vocab (≤ VOCAB_N
    rows — KBs at ANY corpus size) is broadcast for a map-side LEFT
    join, so the membership test costs zero extra shuffles; the per-doc
    agg shuffles on doc_id. At 100 TB the vocab side stays constant
    size — the broadcast never grows with the corpus, and a real
    deployment would pass a persisted tokenizer vocab instead of
    deriving it (same plan from the join onward). oov_rate is an
    integer-derived ratio → round4x-style tie-free rounding."""
    from ..exprs import round4x

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    # top-N via orderBy+limit → TakeOrderedAndProject (per-partition
    # partial top-K, no single-partition global window — the vocab
    # derivation stays distributed over millions of distinct tokens)
    vocab = (
        toks.groupBy("tok").agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(VOCAB_N)
        .select(F.col("tok").alias("vtok"))
    )
    joined = toks.join(
        F.broadcast(vocab), toks.tok == vocab.vtok, "left"
    )
    oov = F.sum(F.col("vtok").isNull().cast("long"))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            oov.alias("n_oov"),
        )
        .select(
            "doc_id", "n_tokens", "n_oov",
            round4x("CAST(n_oov AS DOUBLE) / n_tokens").alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


# --- t27: unigram LM negative-log-likelihood (perplexity proxy) ----------


@register(
    "t27_unigram_logprob",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       ROUND(-sum(ln(CAST(f.c AS DOUBLE) / tot.n)) / count(*), 4)
         AS avg_nll
FROM toks t JOIN freq f ON t.tok = f.tok CROSS JOIN tot
GROUP BY t.doc_id ORDER BY t.doc_id
""",
)
def t27_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram negative log-likelihood — the CCNet-style
    perplexity signal used to bucket web text by LM fit (here the LM is
    the corpus's own unigram distribution, so the whole statistic is
    recomputable in SQL: p(w) = count(w)/total, score = −mean ln p).

    Plan: one token-frequency agg, then the scoring equi-join of the
    token stream against the frequency table — the standard LM-scoring
    shape (at 100 TB the frequency side is vocab-sized; the per-doc
    agg is a map-side-combining hash agg on doc_id). Zipf-hot tokens,
    MEASURED (r11, test_scale_posture::test_aqe_skew_split_on_hot_
    token_scoring_join): in THIS compact spelling the frequency
    aggregate shares the join's tok-partitioning, so AQE's skew-join
    split structurally cannot engage (OptimizeSkewedJoin needs bare
    shuffle-read join children) and the hot-token partition is a
    straggler; the 100 TB mitigation is to MATERIALIZE the frequency
    table (corpus stats are persisted once in production anyway),
    which restores the split — both facts plan-pinned in that test.
    The corpus total rides in as a literal (one control-plane scalar
    job, same as t2's N).
    Parity: ln on bit-identical doubles (tfidf/PSI precedent); the
    per-doc double sum reorder drift (~1e-13) sits far below ROUND 4dp
    except on measure-zero boundaries."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = float(freq.agg(F.sum("c")).first()[0])
    p = F.col("c").cast("double") / F.lit(total)
    return (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(-F.sum(F.log(p)) / F.count("*"), 4).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


# --- t28: content-keyed train/val/test split ------------------------------

@register(
    "t28_hash_split",
    oracle="""
SELECT doc_id,
       CAST(CAST('0x' || substring(md5('sp|' || text), 1, 15) AS BIGINT)
            % 100 AS INT) AS bucket,
       CASE WHEN CAST('0x' || substring(md5('sp|' || text), 1, 15)
                 AS BIGINT) % 100 < 98 THEN 'train'
            WHEN CAST('0x' || substring(md5('sp|' || text), 1, 15)
                 AS BIGINT) % 100 = 98 THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
""",
)
def t28_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment, keyed on CONTENT
    (md5 of the text), not the id: exact duplicates land in the same
    split regardless of their ids, so a dup surviving upstream dedup
    can never leak train text into eval. 98/1/1 by 60-bit-hash bucket;
    portable hash so DuckDB recomputes the exact assignment.

    Scale: one map-side projection — no shuffle, no RNG, no state; any
    worker can re-derive any document's split in isolation (the
    property a 1000-executor loader actually needs). Growing the corpus
    never reassigns an existing document."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sp|"), F.col("text"))), 1, 15),
            16, 10,
        ).cast("bigint") % 100
    ).cast("int")
    return (
        docs.select(
            "doc_id",
            bucket.alias("bucket"),
            F.when(F.col("bucket") < 98, "train")
            .when(F.col("bucket") == 98, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


# --- t29: per-domain document cap -----------------------------------------

DOMAIN_CAP = 15  # docs kept per source; production: per-domain budgets


@register(
    "t29_domain_cap",
    oracle=f"""
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {DOMAIN_CAP}
ORDER BY source, doc_id
""",
)
def t29_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the Gopher/RefinedWeb anti-dominance
    rule: no single source may exceed its budget in the training mix).
    Selection is a deterministic uniform sample WITHIN each source —
    hash-ordered row_number, not first-k-by-position, so the kept set
    is unbiased by crawl order and stable across engines/re-runs.

    Scale: the window partitions BY SOURCE — per-task work is one
    domain's documents, never a global sort; domains parallelize
    independently (WindowGroupLimit prunes each partition at the cap,
    so the sort never materializes past k per domain)."""
    from pyspark.sql.window import Window as W

    docs = table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("cap|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= DOMAIN_CAP)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


# --- t30: DSIR-style importance weights ------------------------------------

@register(
    "t30_dsir_weights",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
), raw_f AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tgt_f AS (
  SELECT tok, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY tok
), consts AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM toks) AS n_raw,
         (SELECT CAST(count(*) AS DOUBLE) FROM toks WHERE lang = 'en')
           AS n_tgt,
         (SELECT CAST(count(*) AS DOUBLE) FROM raw_f) AS v
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       floor((CAST(sum(CAST(
         ln((CAST(COALESCE(g.c, 0) AS DOUBLE) + 1) / (consts.n_tgt + consts.v))
         - ln((CAST(r.c AS DOUBLE) + 1) / (consts.n_raw + consts.v))
       AS DECIMAL(38,10))) AS DOUBLE) / count(*)) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS avg_log_ratio
FROM toks t
JOIN raw_f r ON t.tok = r.tok
LEFT JOIN tgt_f g ON t.tok = g.tok
CROSS JOIN consts
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def t30_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    per document, the average log-ratio of an add-1-smoothed unigram LM
    fit on the TARGET distribution (here: the English slice) vs one fit
    on the RAW corpus — documents whose token mix looks target-like
    score high and get up-sampled. The full paper hashes n-grams into
    buckets; the unigram-exact form here is the same estimator with
    bucket = token (the hashed variant is this plus one pmod — the
    expensive part, the two-LM join, is identical).

    Scale: two token-frequency aggregates (map-side combining) + ONE
    equi-join of the token stream against the vocab-sized LM table —
    the same join shape as t27's scoring pass (Zipf-hot keys: see the
    t27 docstring's measured skew note — materialize the stats table
    to enable AQE's skew split); corpus totals and vocab size ride a
    one-row broadcast derived from the frequency tables (no driver
    count() jobs in the query path). Everything expression-level.

    Parity: each per-token ln value is a deterministic scalar (ln parity
    per the t27/tfidf/PSI precedent), but the PER-DOC SUM of ~hundreds
    of them is order-dependent in double arithmetic — at 500 docs one
    average landed within an ulp of a ROUND boundary and flipped between
    the engines' aggregation orders. The sum therefore goes through
    DECIMAL(38,10) (exact, associative — the money_sum policy applied to
    log-space), making both engines divide IDENTICAL sums, and the final
    rounding is round4x (floor-form) — the fixture has a document whose
    average rounds to −0.0 in DuckDB's double ROUND but +0.0 in Spark's
    BigDecimal ROUND; floor(x·10⁴+0.5)/10⁴ kills the signed zero on both
    sides (the CLAUDE.md rounding policy, hit live)."""
    from ..exprs import round4x as _r4x

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    )
    raw_f = toks.groupBy("tok").agg(F.count("*").alias("rc"))
    tgt_f = (
        toks.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count("*").alias("gc"))
    )
    # Corpus totals and vocab size ride a ONE-ROW broadcast (the t32
    # corpus-stats / t50 bigram-LM shape) instead of three driver-side
    # count() jobs at plan-build (guide §5.1): n_raw = Σ rc, v = |vocab|,
    # n_tgt = Σ gc are exact integer rollups of the frequency tables, so
    # (n_tgt + v) as double is bit-identical to the old literal.
    consts = raw_f.agg(
        F.sum("rc").alias("n_raw"), F.count("*").alias("v")
    ).crossJoin(
        tgt_f.agg(F.coalesce(F.sum("gc"), F.lit(0)).alias("n_tgt"))
    )
    lm = raw_f.join(tgt_f, "tok", "left").crossJoin(F.broadcast(consts)).select(
        "tok",
        (
            F.log((F.coalesce(F.col("gc"), F.lit(0)).cast("double") + 1)
                  / (F.col("n_tgt") + F.col("v")).cast("double"))
            - F.log((F.col("rc").cast("double") + 1)
                    / (F.col("n_raw") + F.col("v")).cast("double"))
        ).alias("log_ratio"),
    )
    return (
        toks.join(lm, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            _r4x(
                "CAST(SUM(CAST(log_ratio AS DECIMAL(38,10))) AS DOUBLE)"
                " / count(*)"
            ).alias("avg_log_ratio"),
        )
        .orderBy("doc_id")
    )


# --- t31: the Gopher quality rule set (repetition-free subset) -----------

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word: float = 3.0,
    max_mean_word: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop: int = 2,
) -> DataFrame:
    """The Gopher paper's document-level quality rules (Rae et al. 2021,
    §A1.1 — public), as one single-pass expression block:

    1. word count in [min_words, max_words];
    2. mean word length in [min_mean_word, max_mean_word];
    3. symbol-to-word ratio ('#' and '...' occurrences) <= max_symbol_ratio;
    4. fraction of lines starting with a bullet (- • *) <= max_bullet_ratio;
    5. fraction of lines ending with an ellipsis <= max_ellipsis_ratio;
    6. fraction of words containing a letter >= min_alpha_ratio;
    7. at least ``min_stop`` DISTINCT Gopher stopwords present.

    (The paper's duplicate-line/-ngram rules live separately in
    t19_rep_2gram / t25_substring_dedup.) Every metric is computed from
    builtin string/array expressions over the text column — no explode,
    no shuffle, no UDF: at 100 TB the scan is the entire cost and the
    filter composes with predicate pushdown on any upstream column.

    Adds metric columns + an integer ``keep`` flag; thresholds are
    parameters because real corpora calibrate them (the registered
    query uses min_stop=1 on the synthetic fixture, whose vocabulary
    carries at most one Gopher stopword per doc — Gopher's own default
    stays 2)."""
    toks = tokens(text_col)
    text = F.col(text_col)
    n_words = F.size(toks)
    nw = n_words.cast("double")
    mean_wl = (
        F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("double") / nw
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ell).cast("double") / nw
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("double")
    bullet_ratio = (
        F.size(F.filter(
            lines,
            lambda ln: F.substring(F.trim(ln), 1, 1).isin("-", "•", "*"),
        )).cast("double") / n_lines
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda ln: F.rtrim(ln).endswith("...")))
        .cast("double") / n_lines
    )
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike(r"\p{L}"))).cast("double")
        / nw
    )
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, sw))
    keep = (
        n_words.between(min_words, max_words)
        & mean_wl.between(min_mean_word, max_mean_word)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_ratio <= max_bullet_ratio)
        & (ellipsis_ratio <= max_ellipsis_ratio)
        & (alpha_ratio >= min_alpha_ratio)
        & (n_stop >= min_stop)
    )
    return df.select(
        "*",
        n_words.alias("n_words"),
        mean_wl.alias("__mean_wl"),
        symbol_ratio.alias("__symbol_ratio"),
        bullet_ratio.alias("__bullet_ratio"),
        ellipsis_ratio.alias("__ellipsis_ratio"),
        alpha_ratio.alias("__alpha_ratio"),
        n_stop.alias("n_gopher_stop"),
        keep.cast("int").alias("keep"),
    )


@register(
    "t31_gopher_rules",
    oracle=f"""
WITH x AS (
  SELECT doc_id,
         len(string_split(lower(text), ' ')) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / len(string_split(lower(text), ' ')) AS mean_wl,
         CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS DOUBLE)
           / len(string_split(lower(text), ' ')) AS symbol_ratio,
         CAST(len(list_filter(string_split(text, chr(10)),
               l -> substring(trim(l), 1, 1) IN ('-', '•', '*'))) AS DOUBLE)
           / len(string_split(text, chr(10))) AS bullet_ratio,
         CAST(len(list_filter(string_split(text, chr(10)),
               l -> rtrim(l) LIKE '%...')) AS DOUBLE)
           / len(string_split(text, chr(10))) AS ellipsis_ratio,
         CAST(len(list_filter(string_split(lower(text), ' '),
               t -> regexp_matches(t, '\\p{{L}}'))) AS DOUBLE)
           / len(string_split(lower(text), ' ')) AS alpha_ratio,
         len(list_intersect(string_split(lower(text), ' '),
             {GOPHER_STOPWORDS})) AS n_stop
  FROM documents
)
SELECT doc_id, n_words,
       floor(mean_wl * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS mean_wl,
       floor(symbol_ratio * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS symbol_ratio,
       floor(bullet_ratio * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS bullet_ratio,
       floor(ellipsis_ratio * 10000 + 0.5) / CAST(10000 AS DOUBLE)
         AS ellipsis_ratio,
       floor(alpha_ratio * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS alpha_ratio,
       n_stop AS n_gopher_stop,
       CAST(n_words BETWEEN 50 AND 100000
            AND mean_wl BETWEEN 3 AND 10
            AND symbol_ratio <= 0.1
            AND bullet_ratio <= 0.9
            AND ellipsis_ratio <= 0.3
            AND alpha_ratio >= 0.8
            AND n_stop >= 1 AS INT) AS keep
FROM x
ORDER BY doc_id
""",
)
def t31_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-set filter, differentially proven per document: all
    seven rule metrics + the composite keep flag recomputed in DuckDB.
    On the synthetic corpus rules 1 (word count, 277/500 pass at the
    default 50) and 7 (stopword presence, min_stop=1 here) genuinely
    split the corpus; the symbol/bullet/ellipsis ratios are exercised
    as live arithmetic (the fixture text contains none, so they check
    identical zero-handling); mean word length and alpha ratio pass
    everywhere by construction. keep is surfaced as INT (no bare
    booleans per the parity policy)."""
    from ..exprs import round4x_col

    d = table(spark, sf_dir, "documents")
    g = gopher_quality(d, min_stop=1)
    r4 = lambda c: round4x_col(F.col(c))  # noqa: E731
    return g.select(
        "doc_id",
        "n_words",
        r4("__mean_wl").alias("mean_wl"),
        r4("__symbol_ratio").alias("symbol_ratio"),
        r4("__bullet_ratio").alias("bullet_ratio"),
        r4("__ellipsis_ratio").alias("ellipsis_ratio"),
        r4("__alpha_ratio").alias("alpha_ratio"),
        "n_gopher_stop",
        "keep",
    ).orderBy("doc_id")


# --- t32: BM25 retrieval over the corpus (Robertson/Lucene formula) ------

BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "t32_bm25_topk",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks,
         len(string_split(lower(text), ' ')) AS dl
  FROM documents
), tf AS (
  SELECT doc_id, dl,
         len(list_filter(toks, t -> t = 'spark'))  AS tf1,
         len(list_filter(toks, t -> t = 'merge'))  AS tf2,
         len(list_filter(toks, t -> t = 'window')) AS tf3
  FROM d
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
         CAST(sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
  FROM tf
), scored AS (
  SELECT doc_id, dl, tf1, tf2, tf3,
         ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
           * (CAST(tf1 AS DOUBLE) * 2.2)
           / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
         + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
           * (CAST(tf2 AS DOUBLE) * 2.2)
           / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
         + ln((n - df3 + 0.5) / (df3 + 0.5) + 1.0)
           * (CAST(tf3 AS DOUBLE) * 2.2)
           / (CAST(tf3 AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
           AS score
  FROM tf, s
)
SELECT doc_id, dl,
       floor(score * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS score
FROM scored
ORDER BY floor(score * 10000 + 0.5) / CAST(10000 AS DOUBLE) DESC, doc_id
LIMIT 10
""",
)
def t32_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Robertson idf with Lucene's +1, k1=1.2,
    b=0.75) for the 3-term query {spark, merge, window}, differentially
    proven: per-doc tf via token-filter counts, corpus stats (N, avgdl,
    per-term df) in ONE one-row aggregate cross-joined back (broadcast
    of a single row — the tpch scalar-subquery shape), and the score as
    a FIXED-ORDER 3-term expression so both engines add the same
    doubles in the same order (no aggregation-order drift — the t30
    lesson applied by construction rather than by decimal rescue).

    Scale: one corpus scan + a 5-number aggregate; scoring is map-side
    expression work and the top-k is TakeOrderedAndProject. For ad-hoc
    multi-term queries at 100 TB the same shape holds — the stats row
    stays O(query terms) and broadcastable."""
    d = table(spark, sf_dir, "documents")
    toks = tokens()
    base = d.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("dl")
    )
    terms = ["spark", "merge", "window"]

    def _tf(w: str) -> F.Column:
        # NB: a `lambda t, w=w:` two-arg signature would be read by
        # F.filter as the (element, index) form — the index silently
        # shadows the bound term; close over w via this helper instead.
        return F.size(F.filter("toks", lambda t: t == F.lit(w)))

    tf = base.select(
        "doc_id",
        "dl",
        *[_tf(w).alias(f"tf{i+1}") for i, w in enumerate(terms)],
    )
    stats = tf.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count("*").cast("double"))
        .alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i+1}") > 0).cast("int")).cast("double")
            .alias(f"df{i+1}")
            for i in range(3)
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))
    part = lambda i: (  # noqa: E731
        F.log((F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1.0)
        * (F.col(f"tf{i}").cast("double") * 2.2)
        / (
            F.col(f"tf{i}").cast("double")
            + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
        )
    )
    from ..exprs import round4x_col

    score = part(1) + part(2) + part(3)
    r4 = round4x_col(score)
    return (
        scored.select("doc_id", "dl", r4.alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


# --- t33: curation pipeline capstone (filter -> dedup -> split) ----------


@register(
    "t33_clean_pipeline",
    oracle="""
WITH g AS (
  SELECT doc_id, text,
         len(string_split(lower(text), ' ')) AS n_words,
         len(list_intersect(string_split(lower(text), ' '),
             ['the','be','to','of','and','that','have','with'])) AS n_stop
  FROM documents
), kept AS (
  SELECT doc_id, text, n_words FROM g
  WHERE n_words BETWEEN 50 AND 100000 AND n_stop >= 1
), dedup AS (
  SELECT doc_id, text, n_words FROM (
    SELECT doc_id, text, n_words,
           min(doc_id) OVER (PARTITION BY text) AS owner
    FROM kept
  ) WHERE doc_id = owner
), split AS (
  SELECT n_words,
         CASE WHEN CAST('0x' || substring(md5('sp|' || text), 1, 15)
                   AS BIGINT) % 100 < 98 THEN 'train'
              WHEN CAST('0x' || substring(md5('sp|' || text), 1, 15)
                   AS BIGINT) % 100 = 98 THEN 'val'
              ELSE 'test' END AS split
  FROM dedup
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words_total
FROM split GROUP BY split
ORDER BY split
""",
)
def t33_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-pipeline CAPSTONE: the training-data ops COMPOSED the
    way a real corpus build runs them — Gopher gates (the two
    fixture-live rules: word count >= 50, stopword presence) → exact
    dedup (min-doc_id winner per identical text) → content-keyed
    98/1/1 hash split (t28's portable hash) → per-split doc and token
    budgets. One differential over the whole chain: a drift in ANY
    stage (filter boundary, dedup winner rule, split hash) moves the
    final counts.

    Scale: filter and split are map-side; the dedup window shuffles on
    the text hash once; the final agg is 3 groups. Nothing here exceeds
    the cost of its standalone stage — composition adds no shuffle."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents")
    g = gopher_quality(d, min_stop=1)
    kept = g.filter(
        F.col("n_words").between(50, 100_000)
        & (F.col("n_gopher_stop") >= 1)
    ).select("doc_id", "text", "n_words")
    owner = F.min("doc_id").over(W.partitionBy("text"))
    dedup = (
        kept.withColumn("__owner", owner)
        .filter(F.col("doc_id") == F.col("__owner"))
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sp|"), F.col("text"))), 1, 15),
            16, 10,
        ).cast("bigint") % 100
    )
    split = (
        F.when(bucket < 98, "train")
        .when(bucket == 98, "val")
        .otherwise("test")
    )
    return (
        dedup.select(split.alias("split"), "n_words")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words_total"),
        )
        .orderBy("split")
    )


# --- t35: cross-document line-level boilerplate removal (C4-style) --------

#: Segment width (tokens) standing in for a "line" — the fixture corpus
#: is a single-line word stream, so lines are fixed 3-token segments.
BOILER_SEG = 3
#: A segment appearing in >= this many DISTINCT documents is boilerplate.
BOILER_MIN_DF = 3


@register(
    "t35_boilerplate_lines",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, i - 1 AS segno,
         array_to_string(toks[((i-1)*3+1):((i-1)*3+3)], ' ') AS seg
  FROM t, LATERAL unnest(
      range(1, CAST(ceil(len(toks) / 3.0) AS BIGINT) + 1)) AS u(i)
), f AS (
  SELECT seg FROM s GROUP BY seg HAVING count(DISTINCT doc_id) >= 3
), k AS (
  SELECT s.* FROM s ANTI JOIN f USING (seg)
), r AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY segno) AS clean_text
  FROM k GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS n_seg FROM s GROUP BY doc_id
)
SELECT tot.doc_id, tot.n_seg, r.n_kept, r.clean_text
FROM tot JOIN r USING (doc_id)
ORDER BY tot.doc_id
""",
)
def t35_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document boilerplate removal: a "line" (3-token
    segment here — the fixture corpus is a single-line word stream)
    that appears in >= 3 DISTINCT documents is removed from EVERY
    document, and documents left with nothing are dropped. This is the
    frequency-based counterpart of t25's keeper-based substring dedup:
    t25 keeps one owner per repeated span; boilerplate removal deletes
    all occurrences of corpus-frequent spans (nav bars, cookie banners,
    license headers) regardless of owner.

    Scale shape: one shuffle to build the segment document-frequency
    table, then the boilerplate SET (df >= threshold — tiny by Zipf:
    231 segments of 7460 at sf0.01) broadcasts into a left_anti join,
    and one final per-doc shuffle reassembles surviving segments in
    position order. No self-joins, nothing quadratic; the df table is
    the same cardinality class as a vocabulary."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n_seg = F.ceil(F.size("toks") / BOILER_SEG).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.array_join(
                    F.slice("toks", i * BOILER_SEG + 1, BOILER_SEG), " "
                ),
            )
        ).alias("segno", "seg"),
    )
    boiler = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DF)
        .select("seg")
    )
    # boilerplate-segment set scales with the corpus — no forced
    # broadcast; AQE broadcasts when genuinely small
    kept = segs.join(boiler, "seg", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("segno", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = segs.groupBy("doc_id").agg(F.count("*").alias("n_seg"))
    return (
        totals.join(rebuilt, "doc_id")
        .select("doc_id", "n_seg", "n_kept", "clean_text")
        .orderBy("doc_id")
    )


# --- t36: per-source token-budget selection --------------------------------

#: Token budget per source (the mixture recipe's per-source cap).
TOKEN_BUDGET = 800


@register(
    "t36_token_budget",
    oracle="""
WITH d AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), c AS (
  SELECT source, n_tok,
         sum(n_tok) OVER (
           PARTITION BY source ORDER BY h, doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tokens_kept
FROM c WHERE cum <= 800
GROUP BY source ORDER BY source
""",
)
def t36_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: every training-mixture recipe
    ends in "take N tokens from each source" — rendered as a
    deterministic per-source document order (content-independent
    md5(doc_id) key, so reruns and engines agree and no quality bias
    sneaks in via the sort) and a running token sum cut at the budget.
    A doc is kept iff the budget is not yet exhausted INCLUDING it —
    the greedy prefix rule every sampler uses.

    One window per source partition (hash-partitioned by source, so it
    scales with source count × docs-per-source, never global), one
    final aggregation. At 100 TB the window ordering key is the only
    sort, and it's per-source."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.filter(F.col("cum") <= TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens_kept"),
        )
        .orderBy("source")
    )


# --- t37: character-bigram entropy quality filter --------------------------

#: Docs below this bigram entropy (nats) read as repetitive/boilerplate.
ENTROPY_KEEP_MIN = 3.0


@register(
    "t37_entropy_quality",
    oracle="""
WITH bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(text)), i ->
             substr(text, CAST(i AS INT), 2))) AS bigram
  FROM documents WHERE len(text) >= 2
), cnt AS (
  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
), tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY doc_id
), ent AS (
  SELECT c.doc_id, t.n,
         CAST(-sum(CAST((CAST(c.c AS DOUBLE) / t.n)
                        * ln(CAST(c.c AS DOUBLE) / t.n)
                        AS DECIMAL(38,10))) AS DOUBLE) AS h_raw
  FROM cnt c JOIN tot t USING (doc_id)
  GROUP BY c.doc_id, t.n
)
SELECT doc_id, n AS n_bigrams,
       floor(h_raw * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS entropy,
       h_raw >= 3.0 AS keep
FROM ent ORDER BY doc_id
""",
)
def t37_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram Shannon entropy as a quality gate: repetitive
    or boilerplate text has a collapsed bigram distribution (low
    entropy in nats), natural prose sits high — a compression-ratio
    proxy computable entirely in SQL (the zlib-ratio variant of this
    filter needs a UDF; the entropy spelling keeps it differential).

    Parity per the t30/ln precedent: each −p·ln p term is computed in
    doubles (bit-identical across engines), the per-doc sum rides
    through DECIMAL(38,10) so aggregation order can't flip a 4dp
    boundary, and the final value uses the repo's floor-half-up
    rounding. The keep flag compares the RAW (pre-round) sum — both
    engines hold the identical double, so no boundary flip exists.

    Scale: bigram fan-out is len(text) per doc (one explode), the
    count agg is (doc, bigram)-keyed — hash-partitioned, no skew worse
    than the text itself; nothing global."""
    # round-13: the char-bigram explode (len(text) rows per doc) ran on
    # the scan's ONE split (1-task 2.6 s stage); spread() widens it —
    # no-op at production split counts (guide §2.5).
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 2
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 1),
                lambda i: F.col("text").substr(i, F.lit(2)),
            )
        ).alias("bigram"),
    )
    cnt = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    ent = (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", "n")
        .agg(
            (-F.sum((p * F.log(p)).cast("decimal(38,10)")))
            .cast("double")
            .alias("h_raw")
        )
    )
    return ent.select(
        "doc_id",
        F.col("n").alias("n_bigrams"),
        (F.floor(F.col("h_raw") * 10000 + 0.5)
         / F.lit(10000.0)).alias("entropy"),
        (F.col("h_raw") >= ENTROPY_KEEP_MIN).alias("keep"),
    ).orderBy("doc_id")


# --- t38: duplicate-multiplicity keeper weights ----------------------------

@register(
    "t38_keeper_weights",
    oracle="""
WITH g AS (
  SELECT md5(text) AS h,
         min(doc_id) AS keeper,
         CAST(count(*) AS BIGINT) AS weight,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM documents GROUP BY md5(text)
)
SELECT keeper AS doc_id, weight, n_sources
FROM g ORDER BY doc_id
""",
)
def t38_keeper_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-multiplicity weights: after exact dedup, the keeper
    carries its cluster's SIZE so a trainer can re-weight the loss
    instead of silently flattening the natural distribution (the
    'deduplicating trainers' correction), plus the distinct-source
    count (a cross-source duplicate is boilerplate evidence; a
    within-source one is a crawl artifact). ONE hash aggregation on
    the content hash — the same shuffle exact dedup already pays, the
    weights are free."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("weight"),
            F.countDistinct("source").alias("n_sources"),
        )
        .select("doc_id", "weight", "n_sources")
        .orderBy("doc_id")
    )


# --- t51: cross-split contamination audit ----------------------------------

#: Shingle width for the leakage audit. 5-grams: long enough that the
#: fixture's random word soup rarely collides, so a hit means genuinely
#: shared span text (the planted near-duplicates), not chance.
LEAK_K = 5


def split_leakage(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Leakage audit over a ``(doc_id, text)`` frame (t51 docstring):
    t28's content-keyed split + LEAK_K-gram containment of each
    val/test doc in the train gram set. The seam the registered query
    and the semantic tests share."""
    toks = F.split("text", " ")
    n = F.size(toks)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sp|"), F.col("text"))), 1, 15),
            16, 10,
        ).cast("bigint") % 100
    )
    split_col = (
        F.when(bucket < 98, "train")
        .when(bucket == 98, "val")
        .otherwise("test")
    )
    grams = F.when(
        n >= LEAK_K,
        F.transform(
            F.sequence(F.lit(1), n - (LEAK_K - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, LEAK_K)),
        ),
    )
    # round-13: the LEAK_K-gram explode ran on the scan's ONE split
    # (1-task 1.8 s stage); spread() widens it — no-op at production
    # split counts (guide §2.5).
    sh = spread(docs).select(
        "doc_id",
        split_col.alias("split"),
        F.explode(F.array_distinct(grams)).alias("sh"),
    )
    tr = (
        sh.filter(F.col("split") == "train")
        .select("sh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ev = (
        sh.filter(F.col("split") != "train")
        # train-gram set scales with the corpus — no broadcast hint
        .join(tr, "sh", "left")
        .groupBy("doc_id", "split")
        .agg(
            F.count("*").alias("n_sh"),
            F.count("hit").alias("n_hit"),
        )
    )
    from ..exprs import round4x

    return ev.select(
        "doc_id",
        "split",
        "n_sh",
        "n_hit",
        round4x("CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE)")
        .alias("containment"),
        (F.col("n_hit") > 0).alias("leaked"),
    )


@register(
    "t51_split_leakage",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CASE WHEN CAST('0x' || substring(md5('sp|' || text), 1, 15)
                   AS BIGINT) % 100 < 98 THEN 'train'
              WHEN CAST('0x' || substring(md5('sp|' || text), 1, 15)
                   AS BIGINT) % 100 = 98 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, split,
         array_to_string(toks[i:i+{LEAK_K - 1}], ' ') AS sh
  FROM d, LATERAL unnest(range(1, len(toks) - {LEAK_K - 2})) AS u(i)
  WHERE len(toks) >= {LEAK_K}
), tr AS (
  SELECT DISTINCT sh FROM sh WHERE split = 'train'
), ev AS (
  SELECT s.doc_id, s.split,
         CAST(count(*) AS BIGINT) AS n_sh,
         CAST(count(tr.sh) AS BIGINT) AS n_hit
  FROM sh s LEFT JOIN tr ON s.sh = tr.sh
  WHERE s.split <> 'train'
  GROUP BY s.doc_id, s.split
)
SELECT doc_id, split, n_sh, n_hit,
       floor(CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE)
             * 10000 + 0.5) / 10000 AS containment,
       n_hit > 0 AS leaked
FROM ev ORDER BY doc_id
""",
)
def t51_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit — the check a training pipeline
    runs AFTER t28's content-keyed split: does any val/test document
    share verbatim LEAK_K-gram spans with the train split? Exact
    duplicates cannot leak by construction (content-keyed hashing puts
    byte-identical docs in the same split — t28's whole point), so
    every hit here is a NEAR-duplicate crossing the split boundary,
    exactly the leakage class content hashing cannot prevent and the
    reason eval decontamination (t14) exists as a separate stage.
    Composes two audited stages under one differential: the t28 split
    rule and the t14-style n-gram containment join.

    Plan: the split is a map-side md5 projection (no shuffle); one
    distinct over (doc, gram); the train-gram set is corpus-sized so it
    is NOT broadcast-hinted (AQE decides — at 100 TB this is a plain
    shuffle join on the gram string; for a Zipf-hot gram, materialize
    the train-gram set first so AQE's skew split can engage — the t27
    measured skew note);
    eval-side per-doc agg is a hash agg. Eval docs shorter than LEAK_K
    tokens carry no gram and drop out (no span can leak from them).
    Parity: counts are integers; the one ratio goes through the 4dp
    floor policy; the leaked flag compares an integer to zero."""
    docs = table(spark, sf_dir, "documents")
    return split_leakage(spark, docs).orderBy("doc_id")
