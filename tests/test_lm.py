"""Bigram-LM perplexity bucketing (t50): a pure-Python three-way
reference fold on crafted docs (counts → interpolated p → quantized q →
bucket, independently of both engines), the <2-token drop rule, and the
fixture's bucket non-degeneracy. Oracle parity of the registered query
is covered by the sweep."""

from __future__ import annotations

import math

from debezium_incubator_spark.llm.lm import (
    LAMBDA,
    PPL_T1_X1E4,
    PPL_T2_X1E4,
    bigram_lm_scores,
)

CRAFTED = [
    (0, "a b a b a"),
    (1, "a b c"),
    (2, "c c c c"),
    (3, "spark"),          # one token: no bigrams, must drop out
    (4, "b a"),
]


def _py_scores(crafted):
    """Reference fold: integer counts, IEEE double interpolation in the
    SAME expression shape as both engines, per-occurrence fixed-point
    quantization BEFORE the per-doc sum."""
    bigs = []
    for doc_id, text in crafted:
        ts = text.split(" ")
        bigs += [(doc_id, a, b) for a, b in zip(ts, ts[1:])]
    c12, c1, c2 = {}, {}, {}
    for _, a, b in bigs:
        c12[(a, b)] = c12.get((a, b), 0) + 1
        c1[a] = c1.get(a, 0) + 1
        c2[b] = c2.get(b, 0) + 1
    n = float(len(bigs))
    out = {}
    for doc_id, a, b in bigs:
        p = LAMBDA * (float(c12[(a, b)]) / float(c1[a])) + (
            1.0 - LAMBDA
        ) * (float(c2[b]) / n)
        q = int(math.floor(-math.log(p) * 10000 + 0.5))
        nb, sq = out.get(doc_id, (0, 0))
        out[doc_id] = (nb + 1, sq + q)
    return out


def test_scores_match_python_reference(spark):
    docs = spark.createDataFrame(CRAFTED, "doc_id LONG, text STRING")
    rows = {r["doc_id"]: r for r in bigram_lm_scores(spark, docs).collect()}
    ref = _py_scores(CRAFTED)
    assert set(rows) == set(ref)  # doc 3 (one token) absent from both
    for doc_id, (nb, sq) in ref.items():
        r = rows[doc_id]
        assert (r["n_bigrams"], r["nll_sum_x1e4"]) == (nb, sq)
        # bucket is the pure-integer comparison — no float boundary
        if sq < PPL_T1_X1E4 * nb:
            want = "head"
        elif sq < PPL_T2_X1E4 * nb:
            want = "middle"
        else:
            want = "tail"
        assert r["ppl_bucket"] == want


def test_one_token_doc_drops(spark):
    docs = spark.createDataFrame(
        [(1, "spark"), (2, "a b")], "doc_id LONG, text STRING"
    )
    got = {r["doc_id"] for r in bigram_lm_scores(spark, docs).collect()}
    assert got == {2}


def test_fixture_buckets_non_degenerate(spark):
    """All three CCNet buckets must be populated at the smoke SF — a
    degenerate split would make the differential prove nothing about
    the thresholds."""
    from debezium_incubator_spark.registry import all_queries

    from .conftest import SF_SMOKE

    q = all_queries()["t50_bigram_lm"]
    buckets = {
        r["ppl_bucket"]: r["n"]
        for r in q(spark, SF_SMOKE)
        .groupBy("ppl_bucket")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(buckets) == {"head", "middle", "tail"}
    assert all(v > 0 for v in buckets.values())
