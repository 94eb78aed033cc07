"""Byte-level BPE tokenizer (llm/bpe.py): the pinned-merges spec, the
rank-order replace-chain ≡ priority-algorithm equivalence (the property
the oracle's SQL re-derivation rests on), the Arrow token-extraction
UDF, and the loud separator refusal."""

from __future__ import annotations

import duckdb
import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.llm.bpe import (
    SEP,
    bpe_encode,
    bpe_token_count,
    bpe_tokens,
    count_sql,
    load_merges,
    merge_pass,
    merge_ranks,
)

from .conftest import SF_SMOKE

MERGES = load_merges()
RANKS = merge_ranks(MERGES)


def _chain_count_py(text: str) -> int:
    """The replace-chain algorithm, in Python: one greedy left-to-right
    pass per merge, in rank order."""
    seq = list(text)
    for a, b in MERGES:
        seq = merge_pass(seq, a, b)
    return len(seq)


def test_merges_table_pinned_shape():
    assert len(MERGES) == 1024
    assert len(set(MERGES)) == 1024  # no duplicate merges
    # merged token STRINGS unique too — the chain ≡ priority-algorithm
    # lemma breaks if two merges mint the same output string (a later
    # pass could recreate a lower-rank pair); the trainer skips
    # colliding candidates, this pins the shipped table
    assert len({a + b for a, b in MERGES}) == len(MERGES)
    for a, b in MERGES:
        assert a and b and SEP not in a + b and "\t" not in a + b
        # tokens are inlined into Spark F.expr and DuckDB SQL literals:
        # backslash/quote would be escape-processed by one dialect only
        assert "\\" not in a + b and "'" not in a + b


def test_training_is_deterministic():
    from scripts.gen_bpe_merges import train

    corpus = ["the small query table", "fast hash join order",
              "the the the a a a", "window group value"]
    assert train(corpus, 16) == train(corpus, 16)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwy ", max_size=60))
def test_chain_equals_priority_algorithm(text):
    """The oracle's correctness keystone: one greedy pass per rank
    (what nested SQL replace() computes) produces the SAME tokenization
    as the GPT-2-style priority algorithm, because completing pass k
    cannot create an occurrence of any pair of rank <= k."""
    assert _chain_count_py(text) == len(bpe_encode(text, RANKS))


def test_chain_equals_priority_on_out_of_alphabet_text():
    for text in ["héllo wörld", "UPPER case 123", "a\nb\tc", "zzz"]:
        assert _chain_count_py(text) == len(bpe_encode(text, RANKS))


def test_spark_count_matches_reference_on_fixture(spark):
    rows = (
        table(spark, SF_SMOKE, "documents")
        .select("text", bpe_token_count("text").alias("n"))
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r.n == len(bpe_encode(r.text, RANKS))


def test_duckdb_chain_matches_reference_small_merges():
    """count_sql's duckdb spelling (usable under the binder's 128-depth
    cap with a short merges list) agrees with the reference encoder."""
    sub = MERGES[:60]
    ranks = merge_ranks(sub)
    con = duckdb.connect()
    texts = ["the customer order", "fast fast fast", "", "a", "zzz top"]
    for t in texts:
        got = con.execute(
            f"SELECT {count_sql('t', sub, 'duckdb')} "
            f"FROM (SELECT '{t}' AS t)"
        ).fetchone()[0]
        assert got == len(bpe_encode(t, ranks)) if t else got == 0
    con.close()


def test_count_sql_duckdb_full_table_refused():
    with pytest.raises(ValueError, match="expression depth"):
        count_sql("text", MERGES, "duckdb")


def test_null_and_empty_text(spark):
    df = spark.createDataFrame([("ab c",), (None,), ("",)], "text STRING")
    got = {r.text: r.n for r in
           df.select("text", bpe_token_count("text").alias("n")).collect()}
    assert got[""] == 0
    assert got[None] is None
    assert got["ab c"] == len(bpe_encode("ab c", RANKS))


def test_separator_in_text_raises(spark):
    df = spark.createDataFrame([(f"bad{SEP}doc",)], "text STRING")
    with pytest.raises(Exception, match="render separator"):
        df.select(bpe_token_count("text").alias("n")).collect()


def test_token_extraction_udf_lossless_and_consistent(spark):
    """bpe_tokens (Arrow UDF, priority algorithm) is lossless — the
    concatenated tokens reproduce the text — and its token count equals
    the JVM replace-chain column."""
    d = table(spark, SF_SMOKE, "documents").limit(50)
    out = bpe_tokens(d).select(
        "text",
        "bpe_tokens",
        bpe_token_count("text").alias("n_chain"),
    ).collect()
    for r in out:
        assert "".join(r.bpe_tokens) == r.text
        assert len(r.bpe_tokens) == r.n_chain


def test_jvm_tokens_col_matches_udf_and_reference(spark):
    """bpe_tokens_col (pure JVM split of the chain) returns the SAME
    token arrays as the priority-algorithm UDF path, plus the
    empty/NULL contracts."""
    from debezium_incubator_spark.llm.bpe import bpe_tokens_col

    d = table(spark, SF_SMOKE, "documents").limit(40)
    rows = d.select("text", bpe_tokens_col("text").alias("toks")).collect()
    for r in rows:
        assert r.toks == bpe_encode(r.text, RANKS)
    edge = spark.createDataFrame([(None,), ("",)], "text STRING")
    got = {r.text: r.toks for r in
           edge.select("text", bpe_tokens_col("text").alias("toks")).collect()}
    assert got[None] is None and got[""] == []


def test_fold_memo_keys_on_merge_content_not_identity(spark):
    """Round-12 regression: the fold memo was keyed on id(merges), and
    CPython reuses a freed list's address — a LATER same-length merge
    table could alias the stale fold (caught live as an off-by-one
    token count in the vocab-refresh replay test). Content-keyed memo:
    two different same-length tables MUST produce their own folds,
    with the first list explicitly freed so address reuse is possible,
    and equal-content lists (distinct objects) must HIT one entry."""
    import gc

    from debezium_incubator_spark.llm import bpe
    from debezium_incubator_spark.llm.bpe import bpe_token_count

    df = spark.createDataFrame([("abab",)], "text STRING")

    def count(merges):
        return df.select(
            bpe_token_count("text", merges).alias("n")
        ).collect()[0]["n"]

    a = [("a", "b")]
    assert count(a) == 2  # ab ab
    del a
    gc.collect()
    b = [("b", "a")]  # same length, different content, fresh object
    assert count(b) == 3  # a (ba) b
    # equal content from a distinct object is a HIT, not a rebuild
    before = len(bpe._FOLD_COL_MEMO)
    assert count(list([("b", "a")])) == 3
    assert len(bpe._FOLD_COL_MEMO) == before
