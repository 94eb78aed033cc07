"""Unit tests for the pointer-doubling hierarchy operator beyond the
registry oracle (which covers the binary-heap tree): a deep chain (depth
≫ one doubling round), a forest with several roots, and cycle detection.
"""

from __future__ import annotations

import math

import pytest

from debezium_incubator_spark.operators.hierarchy import hierarchy_depth


def _nodes(spark, pairs):
    return spark.createDataFrame(
        [(int(k), int(p)) for k, p in pairs], "k BIGINT, parent BIGINT"
    )


def test_chain_depths(spark):
    """A 60-node chain: depth(k) = k. Needs ceil(log2(60)) = 6 doubling
    rounds — far past what a single hop would resolve."""
    n = 60
    nodes = _nodes(spark, [(k, max(k - 1, 0)) for k in range(n)])
    got = {r.k: r.depth for r in hierarchy_depth(nodes).collect()}
    assert got == {k: k for k in range(n)}


def test_forest_multiple_roots(spark):
    """Two trees: chain rooted at 0 and a star rooted at 100."""
    pairs = [(k, max(k - 1, 0)) for k in range(5)]
    pairs += [(100, 100)] + [(100 + k, 100) for k in range(1, 4)]
    got = {r.k: r.depth for r in hierarchy_depth(_nodes(spark, pairs)).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 100: 0, 101: 1, 102: 1, 103: 1}


def test_cycle_raises(spark):
    """A rootless 3-cycle can never converge: the operator must raise,
    not silently return a wrong depth."""
    nodes = _nodes(spark, [(1, 3), (2, 1), (3, 2)])
    with pytest.raises(RuntimeError, match="convergence"):
        hierarchy_depth(nodes, max_rounds=4)


def test_doubling_round_count(spark):
    """The loop is O(log depth): a depth-31 chain must converge within
    ceil(log2(31)) + 1 = 6 rounds (the raise bound proves the algorithm
    doubles, i.e. it is not per-level BFS which would need 31)."""
    nodes = _nodes(spark, [(k, max(k - 1, 0)) for k in range(32)])
    got = hierarchy_depth(nodes, max_rounds=math.ceil(math.log2(31)) + 1)
    assert got.count() == 32


def test_chunks_tile_documents(spark):
    """t18 chunks must tile each document: chunk 0 starts at 1, starts
    step by the 80-char stride, every chunk is 120 chars except the last,
    and the final chunk ends exactly at the document's last character."""
    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.llm.text import t18_chunk_documents
    from .conftest import SF_DIR

    import pyspark.sql.functions as F

    chunks = t18_chunk_documents(spark, SF_DIR).toPandas()
    lens = {
        r.doc_id: r.n
        for r in table(spark, SF_DIR, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    for doc_id, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_id").reset_index(drop=True)
        n = lens[doc_id]
        assert list(g.chunk_id) == list(range(len(g)))
        assert list(g.chunk_start) == [i * 80 + 1 for i in range(len(g))]
        assert list(g.chunk_len) == [
            min(120, n - (i * 80 + 1) + 1) for i in range(len(g))
        ]
        last = g.iloc[-1]
        assert last.chunk_start + last.chunk_len - 1 == n
        assert len(g) == (n - 1) // 80 + 1
