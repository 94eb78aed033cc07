"""t53_hard_negatives: crafted-geometry pins (known 2-D cosines → the
exact expected ranking), the different-label invariant, and the
anchor-cap bound. Oracle parity of the registered query is covered by
the sweep."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from debezium_incubator_spark.llm.negatives import NEG_K, hard_negatives
from debezium_incubator_spark.llm.similarity import norm_sq


def _frame(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id LONG, label INT, v ARRAY<DOUBLE>"
    )
    return df.select("vec_id", "label", "v",
                     norm_sq(F.col("v")).alias("nsq"))


def test_crafted_ranking(spark):
    # anchor along +x; candidates at known angles; labels: 0 = same
    # as anchor (must be excluded however close), 1 = different
    rows = [
        (0, 0, [1.0, 0.0]),                         # anchor
        (1, 0, [1.0, 0.001]),                       # near-identical but SAME label
        (2, 1, [math.cos(0.1), math.sin(0.1)]),     # cos ~0.995
        (3, 1, [math.cos(0.5), math.sin(0.5)]),     # cos ~0.878
        (4, 1, [math.cos(1.2), math.sin(1.2)]),     # cos ~0.362
        (5, 1, [-1.0, 0.0]),                        # cos -1
    ]
    vecs = _frame(spark, rows)
    anchors = vecs.where(F.col("vec_id") == 0)
    got = hard_negatives(vecs, anchors, k=3).orderBy("rn").collect()
    assert [r["neg_id"] for r in got] == [2, 3, 4]
    assert [r["rn"] for r in got] == [1, 2, 3]
    assert got[0]["cos"] > got[1]["cos"] > got[2]["cos"]
    assert all(r["neg_label"] != r["anchor_label"] for r in got)


def test_same_label_never_returned(spark):
    rows = [(i, i % 2, [float(i + 1), 1.0]) for i in range(20)]
    vecs = _frame(spark, rows)
    anchors = vecs.where(F.col("vec_id") < 3)
    got = hard_negatives(vecs, anchors, k=50).collect()
    assert len(got) > 0
    assert all(r["neg_label"] != r["anchor_label"] for r in got)
    # self never appears (a vector shares its own label)
    assert all(r["neg_id"] != r["anchor_id"] for r in got)


def test_equal_cosine_tie_breaks_on_neg_id(spark):
    # two DIFFERENT candidates with identical direction → equal cosine
    rows = [
        (0, 0, [1.0, 0.0]),
        (7, 1, [2.0, 0.0]),   # cos 1.0
        (3, 1, [3.0, 0.0]),   # cos 1.0 — same direction, smaller id
    ]
    vecs = _frame(spark, rows)
    anchors = vecs.where(F.col("vec_id") == 0)
    got = hard_negatives(vecs, anchors, k=2).orderBy("rn").collect()
    assert [r["neg_id"] for r in got] == [3, 7]


def test_registered_query_shape(spark):
    from debezium_incubator_spark.registry import all_queries

    from .conftest import SF_SMOKE

    df = all_queries()["t53_hard_negatives"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    per = {}
    for r in rows:
        per.setdefault(r["anchor_id"], []).append(r)
    for vid, rs in per.items():
        assert len(rs) <= NEG_K
        ranks = sorted(r["rn"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
