"""Statistical language-model scoring (t50) — the CCNet perplexity
bucketing stage: score every document with an interpolated BIGRAM
language model and bucket the corpus into head / middle / tail by
model fit (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020). CCNet trains a KenLM on a
trusted corpus and splits the crawl at fixed per-language perplexity
cutoffs computed OFFLINE; the head bucket feeds training first.

This module is the bigram upgrade of `t27_unigram_logprob` (which has
no context conditioning and no bucketing): the score is

    p(w2 | w1) = LAMBDA * c(w1,w2)/c(w1.) + (1-LAMBDA) * c(.w2)/N

— Jelinek–Mercer interpolation of the bigram MLE with the unigram
backoff, all counts derived from the SAME bigram stream so the three
frequency tables are self-consistent (no off-by-one at document
edges). Every count is an integer; the only float work is the two
divisions + ln, in the SAME expression shape on both engines.

Parity design (the part that makes this oracle-checkable):
- each bigram OCCURRENCE's negative log-probability is quantized to a
  fixed-point integer ``q = floor(-ln(p) * 1e4 + 0.5)`` BEFORE the
  per-document sum — integer sums are aggregation-order-free, so
  Spark's partial/final aggregation cannot drift from DuckDB's
  sequential fold (the round-7 t30 lesson, applied one step earlier);
- the reported avg_nll is ONE double division of exact integers —
  bit-identical cross-engine;
- bucket assignment is a PURE-INTEGER comparison
  ``sum_q < T * n_bigrams`` (T = threshold x 1e4), so no float
  boundary exists for the head/middle/tail split — the same trick as
  t46's keep threshold.

Bucket thresholds are fixed corpus-calibrated constants (CCNet's
production shape: cutoffs are computed offline and shipped as config;
here T1/T2 sit at the sf0.01 terciles and stay non-degenerate at
sf0.1, where the sharper corpus-trained LM shifts mass tailward).

Scale posture (100 TB): one shuffle builds each frequency table (all
three are vocab²-bounded, i.e. distinct-bigram-sized — the class of a
vocabulary, not the corpus); the scoring equi-join of the bigram
stream against the pair table is the standard LM-scoring shape (Zipf
heat on hot bigrams: materialize the pair table first so AQE's skew
split can engage — the inline-agg spelling shares the join's
partitioning and cannot split, measured in the t27 skew test); the
per-doc agg is a
map-side-combining hash agg; bucketing is map-side integer compares
against constants. No windows, no driver-side loops or collects — the
corpus bigram total rides a one-row broadcast (t32's corpus-stats
shape), and c1/c2/N are rollups of the c12 pair table so the corpus
stream is exploded exactly twice (c12 build + scoring join).
Docs with fewer than two tokens carry no bigram and drop out (they
have no LM score; CCNet drops them at its length gate anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

#: Jelinek–Mercer interpolation weight on the bigram MLE term.
LAMBDA = 0.8

#: head/middle/tail cutoffs, as avg-NLL x 1e4 integers (fixed offline
#: calibration, CCNet-style: sf0.01 terciles; verified non-degenerate
#: at sf0.001 / sf0.01 / sf0.1).
PPL_T1_X1E4 = 33760
PPL_T2_X1E4 = 33970


def bigram_lm_scores(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Score a ``(doc_id, text)`` frame with the corpus-trained
    interpolated bigram LM (module docstring): returns one row per doc
    with >= 1 bigram — ``doc_id, n_bigrams, nll_sum_x1e4, avg_nll,
    ppl_bucket``. The reusable seam the registered query and the tests
    share."""
    toks = F.split("text", " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    )
    big = docs.select(
        "doc_id", F.explode(bigrams).alias("bg")
    ).select("doc_id", "bg.w1", "bg.w2")

    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # round-13 (guide §2.3 aggregate-before-you-shuffle, applied to the
    # frequency tables themselves): c1, c2 and the corpus total are
    # ROLLUPS of c12 — c1(w) = Σ_w2 c12, c2(w) = Σ_w1 c12,
    # N = Σ c12 — so they aggregate the vocab²-bounded pair table, not
    # the corpus bigram stream.  The old spelling re-ran the bigram
    # explode + a corpus-wide shuffle for EACH of c1/c2 plus a blocking
    # driver-side big.count() job at plan-build time; now the corpus is
    # exploded exactly twice (the c12 exchange — reused by all three
    # rollups — and the scoring join), and the total rides a one-row
    # broadcast (the t32 corpus-stats precedent) instead of a collect.
    # Integer sums of counts are exact, so p is bit-identical.
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    tot = c12.agg(F.sum("c12").cast("double").alias("n_total"))

    # pair table is distinct-bigram-sized (vocab class) but SCALES with
    # the corpus — no forced broadcast; AQE broadcasts when small
    p = (
        F.lit(LAMBDA)
        * (F.col("c12").cast("double") / F.col("c1").cast("double"))
        + F.lit(1.0 - LAMBDA)
        * (F.col("c2").cast("double") / F.col("n_total"))
    )
    pairs = (
        c12.join(c1, "w1").join(c2, "w2").crossJoin(F.broadcast(tot))
        .select("w1", "w2", p.alias("p"))
    )
    q = F.floor(-F.log(F.col("p")) * 10000 + 0.5).cast("bigint")
    scored = big.join(pairs, ["w1", "w2"]).select("doc_id", q.alias("q"))
    docsc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("q").alias("nll_sum_x1e4"),
    )
    return docsc.select(
        "doc_id",
        "n_bigrams",
        "nll_sum_x1e4",
        (
            F.col("nll_sum_x1e4").cast("double")
            / (F.col("n_bigrams").cast("double") * F.lit(10000.0))
        ).alias("avg_nll"),
        F.when(
            F.col("nll_sum_x1e4") < F.lit(PPL_T1_X1E4) * F.col("n_bigrams"),
            "head",
        )
        .when(
            F.col("nll_sum_x1e4") < F.lit(PPL_T2_X1E4) * F.col("n_bigrams"),
            "middle",
        )
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


def oracle_bigram_cte(src: str = "documents") -> str:
    """Reusable CTE fragment: defines ``docsc(doc_id, n_bigrams,
    nll_sum_x1e4)`` — the interpolated-bigram-LM scores re-derived in
    SQL over ``src`` (a table/CTE with doc_id + text), for composition
    by other oracles (the t48-builder pattern). NOTE: the LM trains on
    ``src`` itself, so composing stages must gate AFTER scoring, never
    feed a pre-filtered src unless that is the intended corpus."""
    return f"""t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM {src}
), big AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM t, LATERAL unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
), c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM big GROUP BY w1
), c2 AS (
  SELECT w2, count(*) AS c2 FROM big GROUP BY w2
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM big
), pairs AS (
  SELECT c12.w1, c12.w2,
         {LAMBDA} * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
       + {1.0 - LAMBDA} * (CAST(c2 AS DOUBLE) / tot.n) AS p
  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tot
), scored AS (
  SELECT b.doc_id,
         CAST(floor(-ln(p.p) * 10000 + 0.5) AS BIGINT) AS q
  FROM big b JOIN pairs p ON b.w1 = p.w1 AND b.w2 = p.w2
), docsc AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(q) AS BIGINT) AS nll_sum_x1e4
  FROM scored GROUP BY doc_id
)"""


@register(
    "t50_bigram_lm",
    oracle=f"""
WITH {oracle_bigram_cte()}
SELECT doc_id, n_bigrams, nll_sum_x1e4,
       CAST(nll_sum_x1e4 AS DOUBLE)
         / (CAST(n_bigrams AS DOUBLE) * 10000.0) AS avg_nll,
       CASE WHEN nll_sum_x1e4 < {PPL_T1_X1E4} * n_bigrams THEN 'head'
            WHEN nll_sum_x1e4 < {PPL_T2_X1E4} * n_bigrams THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM docsc ORDER BY doc_id
""",
)
def t50_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram-LM perplexity bucketing (module docstring).

    The bigram stream is generated expression-level — a ``transform``
    over ``sequence(1, n-1)`` guarded by ``size >= 2`` (Spark's
    ``sequence(1, 0)`` DESCENDS — the round-9 langid gotcha; here the
    guard's NULL branch also makes <2-token docs vanish at the
    explode, which is the intended drop)."""
    docs = table(spark, sf_dir, "documents")
    return bigram_lm_scores(spark, docs).orderBy("doc_id")
