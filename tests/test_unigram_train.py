"""t58 unigram-LM (SentencePiece) trainer vs a pure-Python reference:
hard-EM with integer fixed-point NLLs, pinned Viterbi tie-breaks,
alphabet retention, unused-piece pruning."""

from __future__ import annotations

import math
import random
from collections import Counter

from debezium_incubator_spark.llm.unigram_train import (
    PLEN,
    SEED_N,
    seed_vocab,
    train_unigram,
    _viterbi_counts,
    _words,
)


def _ref_unigram(texts, rounds=2, plen=PLEN, seed_n=SEED_N):
    """Reference trainer: same seed rule, same quantized NLL (floats
    multiplied in the engine's IEEE order), same (score, np, bp)
    Viterbi tuple min, same alphabet/prune vocab update. Returns the
    final {piece: cnt} vocabulary."""
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    seed: Counter = Counter()
    for w, f in wf.items():
        for s in range(len(w)):
            for ln in range(1, min(plen, len(w) - s) + 1):
                seed[w[s:s + ln]] += f
    vocab = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_n]
    vocab.update(dict(multi))
    for _ in range(rounds):
        t, v = sum(vocab.values()), len(vocab)
        nll = {
            p: math.floor(math.log((t + v) / (c + 1)) * 1000000.0 + 0.5)
            for p, c in vocab.items()
        }
        nc: Counter = Counter()
        for w, f in wf.items():
            acc = [(0, 0, -1)]
            for i in range(1, len(w) + 1):
                cands = [
                    (acc[j][0] + nll[w[j:i]], acc[j][1] + 1, j)
                    for j in range(max(0, i - plen), i)
                    if w[j:i] in nll
                ]
                acc.append(min(cands))
            i = len(w)
            while i > 0:
                bp = acc[i][2]
                nc[w[bp:i]] += f
                i = bp
        nxt = {p: nc.get(p, 0) for p in vocab if len(p) == 1}
        nxt.update(
            {p: nc[p] for p in vocab if len(p) >= 2 and nc.get(p, 0) >= 1}
        )
        vocab = nxt
    return vocab


def _engine_vocab(spark, texts, rounds=2, plen=PLEN, seed_n=SEED_N):
    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    rows = train_unigram(docs, rounds, plen, seed_n).collect()
    return {r["piece"]: r["cnt"] for r in rows}


FIXTURE = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a bat and a rat",
    "mats and hats and bats",
    "the rat sat on a hat",
]


def test_matches_reference_on_fixture(spark):
    got = _engine_vocab(spark, FIXTURE)
    want = _ref_unigram(FIXTURE)
    assert got == want
    # alphabet retained even when unused; multi-char survivors used
    assert all(len(p) == 1 or c >= 1 for p, c in got.items())


def test_small_seed_cap_tiebreak(spark):
    # seed_n smaller than the candidate pool exercises the
    # (cnt DESC, piece ASC) cap boundary on both sides
    got = _engine_vocab(spark, FIXTURE, rounds=2, seed_n=6)
    want = _ref_unigram(FIXTURE, rounds=2, seed_n=6)
    assert got == want


def test_seeded_fuzz_vs_reference(spark):
    for seed in range(4):
        rng = random.Random(1000 + seed)
        texts = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
                for _ in range(rng.randint(3, 10))
            )
            for _ in range(rng.randint(4, 12))
        ]
        got = _engine_vocab(spark, texts, rounds=2, seed_n=12)
        want = _ref_unigram(texts, rounds=2, seed_n=12)
        assert got == want, f"seed {seed}"


def test_pure_a_degenerate(spark):
    # single-letter corpus: pieces are 'a'*k; EM keeps what Viterbi
    # uses and the reference agrees exactly
    texts = ["a aa aaa aaaa aaaaa a aa"]
    got = _engine_vocab(spark, texts)
    assert got == _ref_unigram(texts)
    assert "a" in got  # alphabet never pruned


def test_viterbi_is_global_not_greedy(spark):
    """The family-objective differential vs WordPiece (t52/t57):
    greedy longest-match-first takes 'ab' then pays for expensive 'c';
    Viterbi takes 'a' + cheap 'bc' — the global optimum. (BPE would
    merge by raw pair count, a third objective; test_wordpiece_train
    pins BPE-vs-WordPiece.)"""
    words = spark.createDataFrame([("abc", 1)], "w STRING, freq LONG")
    # counts chosen so nll(ab) + nll(c) > nll(a) + nll(bc)
    vocab = spark.createDataFrame(
        [("a", 50), ("b", 1), ("c", 1), ("ab", 60), ("bc", 60)],
        "piece STRING, cnt LONG",
    )
    got = {
        r["piece"]: r["cnt"]
        for r in _viterbi_counts(words, vocab).collect()
    }
    assert got == {"a": 1, "bc": 1}


def test_keep_all_retention_matches_reference(spark):
    """prune_unused=False (the round-12 vocab-artifact mode): unused
    multi-char pieces are RETAINED at count 0 instead of pruned —
    engine == reference exactly, superset of the pruned run's pieces,
    and winners' counts unchanged by the retention rule."""
    texts = ["xyz xyz xyz xyz", "qx zy qx"]
    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = {
        r["piece"]: r["cnt"]
        for r in train_unigram(docs, 2, prune_unused=False).collect()
    }
    want = _ref_unigram_keep_all(texts, rounds=2)
    assert got == want
    pruned = _engine_vocab(spark, texts, rounds=2)
    assert set(pruned) < set(got)
    assert all(got[p] == c for p, c in pruned.items())
    assert got["xy"] == 0 and got["yz"] == 0  # retained, zero-count


def _ref_unigram_keep_all(texts, rounds=2, plen=PLEN, seed_n=SEED_N):
    """The keep-all reference: identical to _ref_unigram except the
    multi-char retention keeps zero-count pieces (mirrors
    scripts/gen_unigram_vocab.ref_unigram(prune_unused=False))."""
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    seed: Counter = Counter()
    for w, f in wf.items():
        for s in range(len(w)):
            for ln in range(1, min(plen, len(w) - s) + 1):
                seed[w[s:s + ln]] += f
    vocab = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_n]
    vocab.update(dict(multi))
    for _ in range(rounds):
        t, v = sum(vocab.values()), len(vocab)
        nll = {
            p: math.floor(math.log((t + v) / (c + 1)) * 1000000.0 + 0.5)
            for p, c in vocab.items()
        }
        nc: Counter = Counter()
        for w, f in wf.items():
            acc = [(0, 0, -1)]
            for i in range(1, len(w) + 1):
                cands = [
                    (acc[j][0] + nll[w[j:i]], acc[j][1] + 1, j)
                    for j in range(max(0, i - plen), i)
                    if w[j:i] in nll
                ]
                acc.append(min(cands))
            i = len(w)
            while i > 0:
                bp = acc[i][2]
                nc[w[bp:i]] += f
                i = bp
        vocab = {p: nc.get(p, 0) for p in vocab}
    return vocab


def test_em_prunes_unused_multichar(spark):
    # 'xy' is seeded (occurs in words) but Viterbi never uses it when
    # 'xyz' fully covers its occurrences — round 1 must prune it
    texts = ["xyz xyz xyz xyz"]
    got = _engine_vocab(spark, texts, rounds=1)
    want = _ref_unigram(texts, rounds=1)
    assert got == want
    assert "xyz" in got and got["xyz"] == 4
    assert "xy" not in got and "yz" not in got


def test_seed_vocab_shapes(spark):
    docs = spark.createDataFrame([("ab ab ba",)], "text STRING")
    rows = seed_vocab(_words(docs), plen=2, seed_n=10).collect()
    got = {r["piece"]: r["cnt"] for r in rows}
    assert got == {"a": 3, "b": 3, "ab": 2, "ba": 1}
