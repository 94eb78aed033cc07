"""Distributed BPE training (t56): bit-equality against the checked-in
merges table and the offline reference trainer. The registered query's
oracle parity (the exactly-unrolled staged-CTE re-derivation) is
covered by the oracle sweep."""

from __future__ import annotations

import importlib.util
import pathlib
import random

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.llm.bpe import load_merges
from debezium_incubator_spark.llm.bpe_train import train_bpe_merges

from .conftest import SF_SMOKE

_SCRIPT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "scripts" / "gen_bpe_merges.py"
)


def _reference():
    spec = importlib.util.spec_from_file_location("genbpe", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_matches_checked_in_table_prefix(spark):
    """THE equality (r9 verdict #2): the distributed trainer on the
    sf0.001 corpus must reproduce the checked-in ``bpe_merges.tsv``
    bit-for-bit — greedy training is prefix-deterministic, so first-40
    equality on the training corpus is exact, and depth 40 crosses two
    localCheckpoint lineage cuts (checkpoint_every=16)."""
    docs = table(spark, SF_SMOKE, "documents")
    got = train_bpe_merges(docs, 40, checkpoint_every=16)
    assert got == load_merges()[:40]


def test_train_matches_reference_on_seeded_corpora(spark):
    """Seeded random corpora over a tiny alphabet: the engine loop and
    the script's pure-Python train() must agree pair-for-pair —
    adversarial tie-break territory (tiny alphabets collide counts
    constantly)."""
    ref = _reference()
    for seed in (7, 23):
        rng = random.Random(seed)
        texts = [
            "".join(rng.choice("ab ") for _ in range(rng.randint(30, 80)))
            for _ in range(6)
        ]
        want = ref.train(texts, 10)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
        )
        got = train_bpe_merges(docs, 10)
        assert got == want, f"seed {seed}"


def test_train_single_symbol_degenerate(spark):
    """Pure-'a' corpus: every pair is some (a^i, a^j) and counts tie
    pervasively — the (count DESC, a, b) tie-break carries the whole
    output. Engine must match the reference exactly."""
    ref = _reference()
    texts = ["a" * 13, "a" * 9, "a" * 7, "a" * 5, "a" * 4, "a" * 3]
    want = ref.train(texts, 7)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    assert train_bpe_merges(docs, 7) == want


def test_train_stops_when_pairs_exhausted(spark):
    """A corpus that runs out of adjacent pairs stops early instead of
    padding: 'ab' mints one merge, then no pair remains."""
    docs = spark.createDataFrame([(0, "ab")], "doc_id LONG, text STRING")
    assert train_bpe_merges(docs, 10) == [("a", "b")]


def test_train_refuses_separator_in_corpus(spark):
    import pytest

    docs = spark.createDataFrame(
        [(0, "ok"), (1, "bad\x1ftext")], "doc_id LONG, text STRING"
    )
    with pytest.raises(ValueError, match="render separator"):
        train_bpe_merges(docs, 2)
