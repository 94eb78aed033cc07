"""Model-based quality scoring (t46): model-table shape, a pure-Python
three-way reference fold on crafted docs (hashlib md5 → bucket →
weight → score, independently of both engines), and the one-token
bigram edge. Oracle parity of the registered query is covered by the
sweep."""

from __future__ import annotations

import hashlib

from debezium_incubator_spark.llm.quality_model import (
    NBUCKETS,
    WEIGHTS,
    quality_scores,
)

CRAFTED = [
    (0, "the fast key order sort"),
    (1, "spark"),                      # one token: no bigrams
    (2, "data data data"),             # repeated features count each time
    (3, "a b a b a"),
]


def _py_score(text: str) -> tuple[int, int]:
    """Reference fold: hashlib md5 60-bit hash, same seed string as
    _phash_spark/_phash_duck (p=0)."""
    ts = text.lower().split(" ")
    feats = list(ts) + [
        f"{a}_{b}" for a, b in zip(ts, ts[1:])
    ]
    wmap = dict(WEIGHTS)
    total = 0
    for f in feats:
        h = int(hashlib.md5(f"p0|{f}".encode()).hexdigest()[:15], 16)
        total += wmap[h % NBUCKETS]
    return len(feats), total


def test_model_table_shape():
    assert len(WEIGHTS) == NBUCKETS
    assert [b for b, _ in WEIGHTS] == list(range(NBUCKETS))
    assert all(-50 <= w <= 50 for _, w in WEIGHTS)
    # the weights are not degenerate (all-equal would make keep trivial)
    assert len({w for _, w in WEIGHTS}) > 10


def test_scores_match_python_reference(spark):
    docs = spark.createDataFrame(CRAFTED, "doc_id LONG, text STRING")
    rows = {r["doc_id"]: r for r in quality_scores(spark, docs).collect()}
    assert len(rows) == len(CRAFTED)
    for doc_id, text in CRAFTED:
        n_feat, sum_w = _py_score(text)
        r = rows[doc_id]
        assert (r["n_feat"], r["sum_w"]) == (n_feat, sum_w), text
        assert r["keep"] == (2 * sum_w > 3 * n_feat)


def test_one_token_doc_has_no_bigrams(spark):
    docs = spark.createDataFrame([(1, "spark")], "doc_id LONG, text STRING")
    r = quality_scores(spark, docs).collect()[0]
    assert r["n_feat"] == 1  # sequence(1,0) must not descend into [1,0]
