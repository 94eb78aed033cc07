"""WordPiece (t52): a pure-Python reference implementation of the BERT
greedy longest-match-first rule (HF `tokenizers` semantics) pinned
against the Spark fold on crafted words covering every branch —
whole-word-over-prefix greed, multi-piece splits, continuation '##'
spelling, whole-word [UNK] on a mid-word dead end, the excluded-char
UNK, and the MAX_WORD_CHARS cap. Vocab artifact shape pinned. Oracle
parity of the registered query is covered by the sweep."""

from __future__ import annotations

from debezium_incubator_spark.llm.wordpiece import (
    LMAX,
    MAX_WORD_CHARS,
    UNK,
    VOCAB,
    wordpiece_result_col,
    wordpiece_tokenize,
)

from pyspark.sql import functions as F


def _py_wordpiece(word: str) -> tuple[list[str], bool]:
    """Reference greedy scan (BERT's WordpieceTokenizer semantics)."""
    if len(word) > MAX_WORD_CHARS:
        return [UNK], False
    pos, toks = 0, []
    while pos < len(word):
        best = None
        for ln in range(min(LMAX, len(word) - pos), 0, -1):
            cand = word[pos:pos + ln]
            if pos > 0:
                cand = "##" + cand
            if cand in VOCAB:
                best = cand
                break
        if best is None:
            return [UNK], False
        toks.append(best)
        pos += len(best) - (2 if best.startswith("##") else 0)
    return toks, True


CRAFTED = [
    "customer",          # whole-word piece beats the 'cus' prefix
    "customers",         # whole word + '##s' continuation
    "merge",             # whole piece
    "merges",
    "stream",            # 'str' prefix + '##eam' long suffix
    "join",              # excluded char → [UNK]
    "jo",                # dead end at position 0
    "aj",                # dead end mid-word → WHOLE word [UNK]
    "vector",
    "a",
    "zz",                # 'z' not in corpus alphabet → [UNK]
    "x" * (MAX_WORD_CHARS + 1),  # over the cap → [UNK]
    "batchbatchbatch",   # 15 chars: repeated whole pieces, under cap
]


def test_vocab_artifact_shape():
    assert len(VOCAB) >= 50
    assert all(v == len(k) - (2 if k.startswith("##") else 0)
               for k, v in VOCAB.items())
    assert "j" not in VOCAB and "##j" not in VOCAB  # the UNK plant
    assert "customer" in VOCAB                      # whole-word piece
    assert any(len(k) >= 4 and k.startswith("##") for k in VOCAB)


def test_fold_matches_python_reference(spark):
    df = spark.createDataFrame([(w,) for w in CRAFTED], "w STRING")
    rows = {
        r["w"]: r
        for r in df.select(
            "w", wordpiece_result_col(F.col("w")).alias("r")
        ).select("w", "r.pieces", "r.ok").collect()
    }
    for w in CRAFTED:
        ref_pieces, ref_ok = _py_wordpiece(w)
        assert list(rows[w]["pieces"]) == ref_pieces, w
        assert rows[w]["ok"] == ref_ok, w


def test_greedy_prefers_longest():
    pieces, ok = _py_wordpiece("customer")
    assert ok and pieces == ["customer"]  # not ['cus', '##tomer']
    assert "cus" in VOCAB and "##tomer" in VOCAB  # the competition is real


def test_mid_word_dead_end_unks_whole_word(spark):
    # 'a' matches at position 0, then 'j' has no continuation — BERT
    # semantics: the WHOLE word is [UNK], not ['a', '[UNK]']
    df = spark.createDataFrame([("aj",)], "w STRING")
    r = df.select(wordpiece_result_col(F.col("w")).alias("r")).collect()[0]
    assert list(r["r"]["pieces"]) == [UNK] and r["r"]["ok"] is False


def test_doc_level_counts(spark):
    docs = spark.createDataFrame(
        [(1, "customer join stream")], "doc_id LONG, text STRING"
    )
    r = wordpiece_tokenize(spark, docs).collect()[0]
    # customer → 1 piece, join → [UNK], stream → str + ##eam
    assert r["n_words"] == 3
    assert r["n_unk"] == 1
    assert r["n_pieces"] == 1 + 1 + len(_py_wordpiece("stream")[0])


def test_fuzz_random_words_match_reference(spark):
    """Deterministic fuzz: 300 seeded random words over the corpus
    alphabet + the excluded char + a foreign char, lengths 0..18 —
    one Spark job, every word compared to the Python reference."""
    import random

    rng = random.Random(0xC0FFEE)
    alpha = "abcdefgjmstz"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 18)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "i LONG, w STRING")
    rows = {
        r["i"]: r
        for r in df.select(
            "i", "w", wordpiece_result_col(F.col("w")).alias("r")
        ).select("i", "r.pieces", "r.ok").collect()
    }
    for i, w in enumerate(words):
        ref_pieces, ref_ok = _py_wordpiece(w)
        assert list(rows[i]["pieces"]) == ref_pieces, repr(w)
        assert rows[i]["ok"] == ref_ok, repr(w)


def test_tokenize_ingest_stream_across_restart(spark, tmp_path):
    """Streamed tokenization (one file per micro-batch, availableNow,
    a RESTART between file 2 and file 3) unions to exactly the
    one-shot batch run — the fixed vocab makes tokenization strictly
    per-document."""
    import glob
    import os

    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.llm.wordpiece import (
        start_tokenize_ingest_stream,
        wordpiece_tokenize,
    )

    from .conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents").cache()
    expected = {
        (r["doc_id"], r["tokens_md5"], r["n_unk"])
        for r in wordpiece_tokenize(spark, docs).collect()
    }
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = docs.schema

    def stage_slice(j):
        tmp = str(tmp_path / f"tmp{j}")
        docs.where(F.col("doc_id") % 3 == j).coalesce(1).write.parquet(tmp)
        src = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        os.rename(src, os.path.join(stage, f"b{j}.parquet"))

    stage_slice(0)
    stage_slice(1)
    q = start_tokenize_ingest_stream(spark, stage, schema, out, ckpt)
    q.awaitTermination(120)
    stage_slice(2)
    q2 = start_tokenize_ingest_stream(spark, stage, schema, out, ckpt)
    q2.awaitTermination(120)
    got = {
        (r["doc_id"], r["tokens_md5"], r["n_unk"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected and len(got) == 500
