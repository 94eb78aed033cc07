"""Distributed WordPiece training (t57): equivalence against a pure
Python reference of the public likelihood-scored trainer, the
objective-difference pin vs BPE, and edge refusals. Oracle parity of
the registered query is covered by the oracle sweep."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.llm.bpe_train import train_bpe_merges
from debezium_incubator_spark.llm.wordpiece_train import (
    train_wordpiece_merges,
)

from .conftest import SF_SMOKE


def ref_train(texts: list[str], n: int) -> list[tuple[str, str]]:
    """Reference WordPiece trainer: word-frequency weighted pair
    scores c12/(ca*cb), (score DESC, a, b) tie-break, minted-string
    skip, greedy left-to-right merge pass per word."""
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    seqs = {w: [w[0]] + ["##" + c for c in w[1:]] for w in wf}
    merges: list[tuple[str, str]] = []
    minted: set[str] = set()
    for _ in range(n):
        tc: Counter = Counter()
        pc: Counter = Counter()
        for w, f in wf.items():
            s = seqs[w]
            for t in s:
                tc[t] += f
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        best, best_key = None, None
        for (a, b), c12 in pc.items():
            if a + b[2:] in minted:
                continue
            # float each factor BEFORE the product — the engine's IEEE
            # op sequence (double*double then divide); a Python exact
            # int product would diverge in the last ulp past 2^53
            key = (-(c12 / (float(tc[a]) * float(tc[b]))), a, b)
            if best_key is None or key < best_key:
                best_key, best = key, (a, b)
        if best is None:
            break
        a, b = best
        merges.append((a, b))
        minted.add(a + b[2:])
        for w in wf:
            s = seqs[w]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b[2:])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_train_matches_reference_on_seeded_corpora(spark):
    for seed in (11, 37):
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(2, 7)))
                for _ in range(rng.randint(4, 10))
            )
            for _ in range(6)
        ]
        want = ref_train(texts, 8)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
        )
        got = train_wordpiece_merges(docs, 8)
        assert got == want, f"seed {seed}"


def test_train_matches_reference_on_fixture(spark):
    docs = table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want = ref_train(texts, 10)
    got = train_wordpiece_merges(docs, 10)
    assert got == want and len(got) == 10


def test_objective_differs_from_bpe(spark):
    """The likelihood score is NOT the count argmax: on the fixture
    corpus the two trainers must pick observably different merge
    boundaries (char content compared, prefixes stripped — the reason
    to keep both trainers)."""
    docs = table(spark, SF_SMOKE, "documents")
    bpe = [a + b for a, b in train_bpe_merges(docs, 6)]
    wp = [
        (a + b[2:]).replace("##", "")
        for a, b in train_wordpiece_merges(docs, 6)
    ]
    assert bpe != wp


def test_single_word_degenerate(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id LONG, text STRING")
    assert train_wordpiece_merges(docs, 5) == [("a", "##b")]


def test_refusals(spark):
    docs = spark.createDataFrame(
        [(0, "bad\x1f")], "doc_id LONG, text STRING"
    )
    with pytest.raises(ValueError, match="separator"):
        train_wordpiece_merges(docs, 2)
    docs2 = spark.createDataFrame([(0, "a#b")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="ambiguous"):
        train_wordpiece_merges(docs2, 2)
