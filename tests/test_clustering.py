"""Connected components (large-star/small-star) — convergence depth,
ground-truth labels, and the dedup_clusters registry surface."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from debezium_incubator_spark.llm.clustering import connected_components
from debezium_incubator_spark.registry import all_queries

from .conftest import SF_SMOKE


def _labels(spark, pairs, max_iter=25):
    df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")
    out = connected_components(df, max_iter=max_iter)
    return {r.doc_id: r.cluster_id for r in out.collect()}


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize to component-min labels
    roots = {}
    for x in list(parent):
        roots.setdefault(find(x), []).append(x)
    out = {}
    for r, members in roots.items():
        m = min(members + [r])
        for x in members:
            out[x] = m
    return out


def test_chain_longer_than_old_iteration_cap(spark):
    """A 200-node chain has diameter 199 — plain min-label propagation
    capped at 10 rounds would leave it mislabeled. Star contraction
    converges in O(log n) rounds and must label every node 0."""
    pairs = [(i, i + 1) for i in range(199)]
    random.Random(7).shuffle(pairs)
    got = _labels(spark, pairs)
    assert len(got) == 200
    assert set(got.values()) == {0}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    pairs = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(180)
    ]
    pairs = [p for p in pairs if p[0] != p[1]]
    got = _labels(spark, pairs)
    want = _union_find(pairs)
    assert got == want


def test_self_loops_and_duplicate_edges(spark):
    pairs = [(5, 5), (1, 2), (2, 1), (1, 2), (9, 9)]
    got = _labels(spark, pairs)
    # self-loop-only nodes are their own singleton components
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}


def test_nonconvergence_raises(spark):
    pairs = [(i, i + 1) for i in range(50)]
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        _labels(spark, pairs, max_iter=1)


def test_property_random_graphs_match_union_find(spark):
    """Property check across many small random graphs (deterministic
    seeds; hypothesis's spark-session interplay is poor, so this is a
    seed sweep with the same shrink-friendly shape)."""
    for seed in range(12):
        rng = random.Random(seed)
        n = rng.randrange(2, 40)
        m = rng.randrange(1, 60)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = [p for p in pairs if p[0] != p[1]] or [(0, 1)]
        got = _labels(spark, pairs)
        assert got == _union_find(pairs), f"seed={seed} pairs={pairs}"


def test_dedup_clusters_still_green(spark):
    """Registry surface: deterministic rows, representative flag set
    exactly on cluster minima."""
    df = all_queries()["dedup_clusters"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows, "expected at least one near-dup cluster"
    for r in rows:
        assert r.is_representative == (r.doc_id == r.cluster_id)
        assert r.cluster_id <= r.doc_id
    # every cluster has exactly one representative
    reps = (
        df.groupBy("cluster_id")
        .agg(F.sum(F.col("is_representative").cast("int")).alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in reps)
