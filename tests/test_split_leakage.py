"""t51_split_leakage semantics, pinned on crafted docs (the fixture's
leak set is incidental): exact duplicates CANNOT leak (content-keyed
hashing co-locates them in one split), a near-duplicate crossing the
boundary IS flagged, and sub-LEAK_K docs drop out. Oracle parity of
the registered query is covered by the sweep."""

from __future__ import annotations

import hashlib

from debezium_incubator_spark.llm.text import LEAK_K, split_leakage

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _bucket(text: str) -> int:
    return int(hashlib.md5(f"sp|{text}".encode()).hexdigest()[:15], 16) % 100


def _find(tag: str, want_train: bool) -> str:
    """Deterministic search for a BASE+suffix text landing in the
    requested split (train = bucket < 98, eval = bucket >= 98)."""
    for i in range(100000):
        t = f"{BASE} {tag}{i}"
        b = _bucket(t)
        if (b < 98) == want_train:
            return t
    raise AssertionError("no text found")


def test_near_duplicate_crossing_split_leaks(spark):
    train_txt = _find("tr", want_train=True)
    eval_txt = _find("ev", want_train=False)
    # the two texts share every 5-gram of BASE (9 tokens of overlap)
    docs = spark.createDataFrame(
        [(1, train_txt), (2, eval_txt)], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r for r in split_leakage(spark, docs).collect()}
    assert set(rows) == {2}  # only the eval doc is audited
    r = rows[2]
    assert r["leaked"] is True and r["n_hit"] > 0
    assert r["split"] in ("val", "test")


def test_exact_duplicates_cannot_leak(spark):
    """Byte-identical docs hash to the SAME split — the t28 invariant
    this audit relies on. With no train copy, the eval pair shows
    zero containment."""
    txt = _find("dup", want_train=False)
    docs = spark.createDataFrame(
        [(1, txt), (2, txt)], "doc_id LONG, text STRING"
    )
    rows = split_leakage(spark, docs).collect()
    assert len(rows) == 2
    splits = {r["split"] for r in rows}
    assert len(splits) == 1  # co-located
    assert all(r["leaked"] is False and r["n_hit"] == 0 for r in rows)


def test_short_doc_drops(spark):
    short = " ".join(BASE.split()[: LEAK_K - 1])
    # ensure the short doc would be eval-split if it had grams; either
    # way it must not appear
    docs = spark.createDataFrame(
        [(1, short), (2, _find("x", want_train=False))],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"] for r in split_leakage(spark, docs).collect()}
    assert 1 not in got


def test_fuzz_random_corpora_match_reference(spark):
    """Deterministic fuzz: 3 seeded random corpora — split assignment,
    per-doc gram counts, hit counts, and the leaked flag all compared
    to a pure-Python reference (hashlib md5 split + set algebra)."""
    import random

    vocab = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    rng = random.Random(0x5EED)
    for _ in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 14))))
            for i in range(40)
        ]
        # python reference
        splits, grams = {}, {}
        for i, t in docs:
            b = _bucket(t)
            splits[i] = "train" if b < 98 else ("val" if b == 98 else "test")
            ts = t.split(" ")
            grams[i] = {
                " ".join(ts[j:j + LEAK_K])
                for j in range(len(ts) - LEAK_K + 1)
            }
        train_pool = set().union(
            *(grams[i] for i in splits if splits[i] == "train"),
            set(),
        )
        expect = {}
        for i in splits:
            if splits[i] == "train" or not grams[i]:
                continue
            hits = grams[i] & train_pool
            expect[i] = (splits[i], len(grams[i]), len(hits),
                         bool(hits))
        df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
        got = {
            r["doc_id"]: (r["split"], r["n_sh"], r["n_hit"], r["leaked"])
            for r in split_leakage(spark, df).collect()
        }
        assert got == expect
