"""t59 unigram-LM Viterbi inference vs a pure-Python reference over
the SAME checked-in artifact: DP + tie-break equivalence, the three
cost tiers (EM core < alphabet fill < unknown-char fallback), md5
stream integrity, empty-token exclusion."""

from __future__ import annotations

import hashlib

from debezium_incubator_spark.llm.unigram import (
    LMAX,
    UNK_NLL,
    VOCAB,
    unigram_tokenize,
)


def _ref_word(w):
    """Reference Viterbi over the artifact: (pieces, cost), the t58
    tuple tie-break (score, n_pieces, backpointer)."""
    acc = [(0, 0, -1)]
    for i in range(1, len(w) + 1):
        cands = []
        for j in range(max(0, i - LMAX), i):
            p = w[j:i]
            if i - j == 1:
                cands.append(
                    (acc[j][0] + VOCAB.get(p, UNK_NLL), acc[j][1] + 1, j)
                )
            elif p in VOCAB:
                cands.append((acc[j][0] + VOCAB[p], acc[j][1] + 1, j))
        acc.append(min(cands))
    pieces, i = [], len(w)
    while i > 0:
        bp = acc[i][2]
        pieces.append(w[bp:i])
        i = bp
    return list(reversed(pieces)), acc[len(w)][0]


def _ref_doc(text):
    words = [w for w in text.split(" ") if w]
    per = [_ref_word(w) for w in words]
    stream = " ".join(" ".join(p) for p, _ in per)
    return (
        len(words),
        sum(len(p) for p, _ in per),
        sum(c for _, c in per),
        hashlib.md5(stream.encode()).hexdigest(),
    )


def _run(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    return {
        r["doc_id"]: (
            r["n_words"], r["n_pieces"], r["total_nll"], r["tokens_md5"]
        )
        for r in unigram_tokenize(spark, docs).collect()
    }


def test_matches_reference_on_crafted_texts(spark):
    texts = [
        "customer order by the fast query",   # mined-core words
        "join scan filter groupagg",          # concatenation: DP splits
        "zz qqq xyzzy",                       # fill-tier segmentations
        "a b c a",                            # single chars
        "data  stream   window",              # multi-space: empties drop
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _ref_doc(t), f"doc {i}: {t!r}"


def test_unknown_char_fallback(spark):
    # '#' and 'Z' are not in the corpus alphabet → per-char UNK_NLL,
    # the word still segments (no whole-word UNK in the unigram family)
    texts = ["Z#q order"]
    got = _run(spark, texts)
    assert got[0] == _ref_doc(texts[0])
    # the cost reflects exactly the unknown chars' fallback tier
    _, _, cost_ref, _ = _ref_doc("Z#q")
    assert cost_ref > 2 * UNK_NLL  # two unknown chars + 'q'


def test_cost_tiers_order_segmentations(spark):
    """Core beats fill beats unknown: a mined word is one cheap piece,
    a same-length alphabet-only nonsense word pays the fill tier, and
    both beat unknown chars."""
    (_, _, c_core, _) = _ref_doc("order")
    (_, _, c_fill, _) = _ref_doc("rdreo")  # same chars, unmined order
    (_, _, c_unk, _) = _ref_doc("ZZZZZ")
    assert c_core < c_fill < c_unk
    # and the engine agrees bit-for-bit
    got = _run(spark, ["order", "rdreo", "ZZZZZ"])
    assert got[0][2] == c_core and got[1][2] == c_fill
    assert got[2][2] == c_unk == 5 * UNK_NLL


def test_viterbi_prefers_global_optimum(spark):
    """The family differential vs WordPiece's greedy longest-match:
    Viterbi picks the CHEAPEST segmentation, not the longest first
    piece. 'thedata' — greedy would eat the longest matching prefix;
    Viterbi weighs whole-path cost ('the' + 'data', two core pieces)."""
    pieces, _ = _ref_word("thedata")
    assert pieces == ["the", "data"]
    got = _run(spark, ["thedata"])
    assert got[0][1] == 2  # two pieces, engine-side


def test_fuzz_vs_reference(spark):
    import random

    rng = random.Random(59)
    alpha = "abcdehjklmnoprstuwyz"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(2, 8))
        )
        for _ in range(30)
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _ref_doc(t), f"fuzz doc {i}: {t!r}"


def test_t60_cross_family_ordering_and_flips(spark):
    """The three-family report's semantics: on the fixture the order
    is strictly bpe < unigram < wordpiece per document (the reason t60
    carries counts, not a decorative winner column); crafted corpora
    FLIP both comparisons — an unknown word is 1 [UNK] piece for
    WordPiece but ceil(len/3) fill pieces for unigram (wp < ug), and
    alien text the BPE merges never fire on costs len chars for BPE
    but ceil(len/3) for unigram (ug < bpe)."""
    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.llm.bpe import bpe_token_count
    from debezium_incubator_spark.llm.pipeline_v2 import t60_tokenizer_abc
    from debezium_incubator_spark.llm.wordpiece import wordpiece_tokenize
    from debezium_incubator_spark.llm.unigram import unigram_tokenize
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    rows = t60_tokenizer_abc(spark, SF_SMOKE).collect()
    assert rows
    assert all(
        r["bpe_tokens"] < r["ug_tokens"] < r["wp_tokens"] for r in rows
    )

    crafted = spark.createDataFrame(
        [(0, "zzzzzz zzzzzz")], "doc_id LONG, text STRING"
    )
    wp = wordpiece_tokenize(spark, crafted).collect()[0]
    ug = unigram_tokenize(spark, crafted).collect()[0]
    bpe = crafted.select(
        bpe_token_count("text").alias("n")
    ).collect()[0]["n"]
    assert wp["n_pieces"] < ug["n_pieces"] < bpe  # both comparisons flip


def test_viterbi_global_optimality_property(spark):
    """Property: on random words, the engine's Viterbi cost is (a)
    equal to the reference DP, (b) ≤ the greedy longest-match path's
    cost under the SAME cost table, and (c) ≤ the all-single-chars
    path — i.e. it is a true minimum over segmentations, not merely
    agreeing with another heuristic."""
    import random

    rng = random.Random(60)
    alpha = "abcdehjklmnorstuwyz"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        for _ in range(60)
    ]

    def greedy_cost(w):
        cost, i = 0, 0
        while i < len(w):
            for ln in range(min(LMAX, len(w) - i), 0, -1):
                p = w[i:i + ln]
                if p in VOCAB:
                    cost += VOCAB[p]
                    i += ln
                    break
            else:
                cost += UNK_NLL
                i += 1
        return cost

    got = _run(spark, words)
    for i, w in enumerate(words):
        _, _, vit_cost, _ = _ref_doc(w)
        assert got[i][2] == vit_cost
        assert vit_cost <= greedy_cost(w)
        assert vit_cost <= sum(VOCAB.get(c, UNK_NLL) for c in w)
