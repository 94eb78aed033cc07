"""Hard-negative mining (t53) — the contrastive-training data op: for
each anchor embedding, the top-K most-similar vectors with a DIFFERENT
label. High-cosine different-label neighbors are the "hard negatives"
that make contrastive objectives (SimCLR/InfoNCE-style, dense-retriever
training à la DPR, Karpukhin 2020) actually learn — random negatives
are trivially separable. This is the one op in the tier that consumes
the fixture's ``label`` column as a supervision signal.

Plan shape (the sim_batch_knn / t47 pattern): the anchor batch is
BOUNDED by construction (mining runs per training batch, its size is
corpus-independent) → broadcast; one scan of the corpus computes every
anchor×candidate cosine via the left-fold dot product (F.aggregate ≡
DuckDB list_reduce, bit-exact both engines — the t47 precedent); the
different-label gate filters BEFORE the per-anchor top-K window
(partitioned by anchor — WindowGroupLimit prunes at K, never a global
sort). At 100 TB this is exactly one corpus pass per mining batch.

Parity: cosines are bit-identical left-folds, ranking uses
(cos DESC, vec_id ASC) so equal-cosine ties (duplicate vectors) break
deterministically; the surfaced score is quantized AFTER ranking with
the floor-half-up 6dp spelling (exprs.round6x_col — plain ROUND(,6)
diverges across engines at binary-exact halves and preserves -0.0 in
DuckDB, the documented round-7 gotcha).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..exprs import oracle_round6x, round6x_col
from ..registry import register
from .similarity import _vectors, dot, norm_sq

#: anchor batch: every 37th vector, capped — batch size is
#: corpus-independent (the broadcast-safety invariant).
ANCHOR_MOD = 37
ANCHOR_N = 30

#: hard negatives kept per anchor.
NEG_K = 5

_FOLD = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), (s, x) -> s + x)"
)

_T53_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, label, v,
         {_FOLD.format(terms='list_transform(v, x -> x * x)')} AS nsq
  FROM e
), anchors AS (
  SELECT vec_id, label, v, nsq FROM n WHERE vec_id % {ANCHOR_MOD} = 0
  ORDER BY vec_id LIMIT {ANCHOR_N}
), scored AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         c.vec_id AS neg_id, c.label AS neg_label,
         {_FOLD.format(terms='list_transform(range(1, len(c.v) + 1), i -> c.v[i] * a.v[i])')}
           / (sqrt(c.nsq) * sqrt(a.nsq)) AS cos_raw
  FROM n c CROSS JOIN anchors a
  WHERE c.label <> a.label
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY anchor_id ORDER BY cos_raw DESC, neg_id
  ) AS rn
  FROM scored
)
SELECT anchor_id, rn, neg_id, anchor_label, neg_label,
       {oracle_round6x('cos_raw', 'cos')}
FROM ranked WHERE rn <= {NEG_K}
ORDER BY anchor_id, rn
"""


def hard_negatives(
    corpus: DataFrame, anchors: DataFrame, k: int = NEG_K
) -> DataFrame:
    """Top-k highest-cosine DIFFERENT-label candidates per anchor.
    Both frames need (vec_id, label, v, nsq); the anchor side is
    broadcast — bounded by construction (a mining batch)."""
    a = F.broadcast(
        anchors.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.col("v").alias("av"),
            F.col("nsq").alias("ansq"),
        )
    )
    cos = dot(F.col("v"), F.col("av")) / (
        F.sqrt(F.col("nsq")) * F.sqrt(F.col("ansq"))
    )
    scored = (
        corpus.crossJoin(a)
        .filter(F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            cos.alias("cos_raw"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos_raw"), "neg_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "anchor_id", "rn", "neg_id", "anchor_label", "neg_label",
            round6x_col(F.col("cos_raw")).alias("cos"),
        )
    )


@register("t53_hard_negatives", oracle=_T53_ORACLE)
def t53_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining over the embeddings table (module
    docstring): every 37th vector (capped at ANCHOR_N) anchors a
    top-NEG_K different-label nearest-neighbor search; anchors
    themselves remain candidates for OTHER anchors (self is excluded
    by the label gate plus identity — a vector never differs from its
    own label)."""
    vecs = _vectors(spark, sf_dir).select(
        "vec_id", "label", "v", norm_sq(F.col("v")).alias("nsq")
    )
    anchors = (
        vecs.where(F.col("vec_id") % ANCHOR_MOD == 0)
        .orderBy("vec_id")
        .limit(ANCHOR_N)
    )
    return hard_negatives(vecs, anchors).orderBy("anchor_id", "rn")
