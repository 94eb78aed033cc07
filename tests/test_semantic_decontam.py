"""Semantic decontamination (t47): planted-contamination semantics on
crafted vectors (an exact duplicate and a paraphrase-like near-copy of
pool items must flag; an orthogonal vector must not). The registered
query's full differential is covered by the oracle sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.llm.semantic_decontam import semantic_decontam
from debezium_incubator_spark.llm.similarity import norm_sq


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id LONG, v ARRAY<DOUBLE>"
    ).select("vec_id", "v", norm_sq(F.col("v")).alias("nsq"))


def test_planted_contamination(spark):
    pool = _df(spark, [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])])
    corpus = _df(
        spark,
        [
            (1, [2.0, 0.0, 0.0]),        # scaled copy of pool 100: cos 1.0
            (2, [0.9, 0.1, 0.0]),        # near-copy: cos ~0.994
            (3, [0.0, 0.0, 5.0]),        # orthogonal to both: cos 0.0
        ],
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_decontam(corpus, pool, tau=0.9).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["max_cos"] == 1.0
    assert rows[2]["contaminated"] and rows[2]["n_hits"] == 1
    assert not rows[3]["contaminated"] and rows[3]["n_hits"] == 0
