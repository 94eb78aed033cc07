"""Model-based quality scoring (t46) — the modern counterpart of the
rule-based gates in `text.py`: DCLM and FineWeb-Edu both select
pre-training data with a LEARNED text classifier rather than (only)
heuristics. The public recipe is fastText's supervised model (Joulin
et al., "Bag of Tricks for Efficient Text Classification", 2016): a
linear model over HASHED unigram + adjacent-bigram features. This
module runs exactly that shape — features hashed into a fixed bucket
space, per-bucket weights from a small model table, the document
scored by its mean feature weight — with the model weights as a KB
control-plane literal (the table is data, not code: a real deployment
loads trained fastText weights; here they are derived at import time
from md5 so the differential is deterministic end to end).

Spark mapping:

- features: ``explode(split(lower(text)))`` unigrams UNION ALL
  exploded adjacent bigrams (``transform(sequence(...))`` — the same
  JVM shingle shape as `dedup.py`);
- hashing: the portable 60-bit md5 hash (`dedup._phash_spark`) mod
  NBUCKETS — bit-identical in DuckDB, so the WHOLE pipeline
  (tokenize → feature-hash → weight lookup → score) is differential,
  not just row counts;
- weights: a NBUCKETS-row broadcast join (bounded: fixed model size,
  independent of corpus — the justified-broadcast class);
- score: one hash aggregate per doc. ``sum_w`` is an exact BIGINT sum
  of integer weights; ``mean_w`` goes through round4x (integer-derived
  ratio policy); the keep decision is PURE INTEGER arithmetic
  (``2·sum_w > 3·n_feat`` ⇔ mean > 1.5), so no float boundary can
  flip it between engines — stronger than t37's raw-double compare.

100 TB posture: one scan, one explode (output ~2× token count), one
shuffle on doc_id; the model join is a fixed-size broadcast at any
corpus size. fastText's real vocabulary hashing (2M buckets) changes
the literal's size class to MB — still control-plane.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import oracle_round4x, round4x
from ..registry import register
from .dedup import _phash_duck, _phash_spark

#: feature-hash space. fastText defaults to 2M for bigram buckets; 64
#: keeps the oracle VALUES list readable while every bucket still gets
#: hundreds of fixture features (all 64 weights exercised).
NBUCKETS = 64


def _weight(bucket: int) -> int:
    """Deterministic integer weight in [-50, 50] from md5 — stands in
    for a trained coefficient; integer so sums are exact."""
    return int(hashlib.md5(f"w|{bucket}".encode()).hexdigest()[:8], 16) % 101 - 50


#: the model table: (bucket, weight) — KB control-plane literal.
WEIGHTS: list[tuple[int, int]] = [(b, _weight(b)) for b in range(NBUCKETS)]

_VALUES = ", ".join(f"({b}, {w})" for b, w in WEIGHTS)

def oracle_quality_cte(cte_name: str = "qs") -> str:
    """DuckDB WITH-clause body re-deriving per-doc quality scores from
    scratch; the final CTE ``cte_name`` holds (doc_id, n_feat, sum_w) —
    reusable by composed oracles (t49), like bpe/langid's builders."""
    return f"""__qtoks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
), __qfeats AS (
  SELECT doc_id, unnest(ts) AS f FROM __qtoks
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                i -> ts[i] || '_' || ts[i + 1])) AS f
  FROM __qtoks WHERE len(ts) >= 2
), __qb AS (
  SELECT doc_id, {_phash_duck('f', 0)} % {NBUCKETS} AS bucket
  FROM __qfeats
), __qw(bucket, wt) AS (VALUES {_VALUES}),
{cte_name} AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
         CAST(sum(wt) AS BIGINT) AS sum_w
  FROM __qb JOIN __qw USING (bucket) GROUP BY doc_id
)"""


_T46_ORACLE = f"""
WITH {oracle_quality_cte()}
SELECT doc_id, n_feat, sum_w,
       {oracle_round4x('CAST(sum_w AS DOUBLE) / n_feat', 'mean_w')},
       (2 * sum_w > 3 * n_feat) AS keep
FROM qs ORDER BY doc_id
"""


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, f) — lowercased unigrams plus adjacent ``a_b`` bigrams
    (fastText's feature set). Spark's sequence(1, 0) DESCENDS, so the
    bigram array is explicitly empty for one-token docs."""
    base = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ts")
    )
    uni = base.select("doc_id", F.explode("ts").alias("f"))
    bigrams = F.when(
        F.size("ts") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ts") - 1),
            lambda i: F.concat_ws(
                "_", F.element_at("ts", i), F.element_at("ts", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = base.select("doc_id", F.explode(bigrams).alias("f"))
    return uni.unionAll(bi)


def quality_scores(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Score each doc with the hashed-linear model: exact integer
    sum_w, round4x mean_w, integer-arithmetic keep."""
    feats = quality_features(docs)
    bucketed = feats.select(
        "doc_id",
        (F.expr(_phash_spark("f", 0)) % NBUCKETS).alias("bucket"),
    )
    # model table: fixed NBUCKETS rows at ANY corpus size — the
    # justified-broadcast class (control-plane literal)
    wdf = F.broadcast(
        spark.createDataFrame(WEIGHTS, "bucket LONG, wt LONG")
    )
    scored = (
        bucketed.join(wdf, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feat"),
            F.sum("wt").alias("sum_w"),
        )
    )
    return scored.select(
        "doc_id",
        "n_feat",
        "sum_w",
        round4x("CAST(sum_w AS DOUBLE) / n_feat").alias("mean_w"),
        (2 * F.col("sum_w") > 3 * F.col("n_feat")).alias("keep"),
    ).orderBy("doc_id")


@register("t46_quality_classifier", oracle=_T46_ORACLE)
def t46_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped hashed-feature linear quality scoring over
    documents (module docstring) — tokenize → feature-hash → weight
    join → per-doc score, every stage recomputed by the oracle."""
    return quality_scores(spark, table(spark, sf_dir, "documents"))
