"""Semantic (embedding-level) decontamination (t47): the third member
of the decontamination tier. t14 removes exact n-gram overlap with a
benchmark pool and t22 pre-filters it with a Bloom bitmap — but
paraphrased benchmark leakage survives both (public finding: Yang et
al. 2023 "Rethinking Benchmark and Contamination ... n-gram overlap is
insufficient"; rephrased MMLU/GSM8K items evade string matching).
The standard countermeasure is EMBEDDING similarity against the
benchmark: any training doc whose vector sits within cosine τ of a
benchmark item is flagged.

Shape: benchmark pools are FIXED SIZE (a benchmark has a few thousand
items regardless of corpus scale), so this is a bounded-side broadcast
join BY CONSTRUCTION — corpus × pool map work with a per-vector
aggregate, one shuffle carrying one row per corpus vector (max/count
partial-aggregate map-side). The fixture pool is the 40 smallest
vec_ids ≡ 0 (mod 23): deterministic, LIMIT-bounded at any SF.

Parity: dot products use the same left-fold spelling as every sim_*
oracle (Spark F.aggregate ≡ DuckDB list_reduce, bit-exact), max over
the pool is order-independent, the hit count and the contaminated
flag compare the RAW fold double against τ (identical bits on both
engines — the t37 precedent), and only the REPORTED max_cos is
rounded (continuous value → plain ROUND(,6), per the s1 policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .similarity import _vectors, dot, norm_sq

#: cosine radius: calibrated so the synthetic fixture (random-ish
#: vectors, max observed pairwise cosine ~0.5) splits — production
#: deployments use ~0.9 with a real benchmark pool.
TAU = 0.35
#: fixture pool bound — a benchmark's size is corpus-independent.
POOL_N = 40

_FOLD = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), (s, x) -> s + x)"
)

_T47_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v,
         {_FOLD.format(terms='list_transform(v, x -> x * x)')} AS nsq
  FROM e
), pool AS (
  SELECT vec_id, v, nsq FROM n WHERE vec_id % 23 = 0
  ORDER BY vec_id LIMIT {POOL_N}
), corpus AS (
  SELECT vec_id, v, nsq FROM n
  WHERE vec_id NOT IN (SELECT vec_id FROM pool)
), p AS (
  SELECT c.vec_id,
         {_FOLD.format(terms='list_transform(range(1, len(c.v) + 1), i -> c.v[i] * b.v[i])')}
           / (sqrt(c.nsq) * sqrt(b.nsq)) AS cos_raw
  FROM corpus c CROSS JOIN pool b
), s AS (
  SELECT vec_id, max(cos_raw) AS mc,
         CAST(sum(CASE WHEN cos_raw >= {TAU} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM p GROUP BY vec_id
)
SELECT vec_id, n_hits, ROUND(mc, 6) AS max_cos,
       (mc >= {TAU}) AS contaminated
FROM s ORDER BY vec_id
"""


def semantic_decontam(
    corpus: DataFrame, pool: DataFrame, tau: float = TAU
) -> DataFrame:
    """Flag corpus vectors within cosine ``tau`` of any pool vector.
    Both frames need (vec_id, v, nsq); the pool side is broadcast —
    bounded by construction (benchmark size is corpus-independent)."""
    b = F.broadcast(
        pool.select(
            F.col("vec_id").alias("pool_id"),
            F.col("v").alias("pv"),
            F.col("nsq").alias("pnsq"),
        )
    )
    cos = dot(F.col("v"), F.col("pv")) / (
        F.sqrt(F.col("nsq")) * F.sqrt(F.col("pnsq"))
    )
    return (
        corpus.crossJoin(b)
        .select("vec_id", cos.alias("cos_raw"))
        .groupBy("vec_id")
        .agg(
            F.count(F.when(F.col("cos_raw") >= tau, 1)).alias("n_hits"),
            F.max("cos_raw").alias("mc"),
        )
        .select(
            "vec_id",
            "n_hits",
            F.round("mc", 6).alias("max_cos"),
            (F.col("mc") >= tau).alias("contaminated"),
        )
        .orderBy("vec_id")
    )


@register("t47_semantic_decontam", oracle=_T47_ORACLE)
def t47_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine contamination scan of the corpus against the
    deterministic fixture pool (module docstring)."""
    vecs = _vectors(spark, sf_dir).select(
        "vec_id", "v", norm_sq(F.col("v")).alias("nsq")
    )
    pool = (
        vecs.where(F.col("vec_id") % 23 == 0)
        .orderBy("vec_id")
        .limit(POOL_N)
    )
    corpus = vecs.join(
        F.broadcast(pool.select("vec_id")), "vec_id", "left_anti"
    )
    return semantic_decontam(corpus, pool)
