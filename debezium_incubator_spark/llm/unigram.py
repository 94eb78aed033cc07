"""Unigram-LM (SentencePiece) Viterbi tokenization (t59) — the
INFERENCE twin of the t58 trainer, completing the train/infer pair for
the THIRD tokenizer family (BPE: t39/t56; WordPiece: t52/t57;
unigram: t58/t59).

Algorithm (public: Kudo 2018; the SentencePiece runtime): given a
vocabulary of piece costs, segment each word by the MINIMUM-total-cost
path — dynamic programming over word positions, not greedy scanning
(WordPiece) and not ranked-merge replay (BPE); the three families'
inference loops are structurally disjoint, which is why each gets its
own engine spelling and differential.

The vocabulary is the checked-in artifact ``unigram_vocab.tsv``
(regenerate: ``scripts/gen_unigram_vocab.py``): piece → INTEGER
fixed-point NLL (the t58 quantization). Round-12 artifact (r11 #5):
the trainer runs in KEEP-ALL retention (``prune_unused=False``) over
the ENTIRE expressible piece space — the fixture corpus has exactly
31 distinct words, a 24-char alphabet, and 235 multi-char substrings
total (measured; "1024 competitive pieces" has no referent on it) —
so all 259 real pieces carry TRAINED costs: hard-EM winners at their
count-derived NLLs, never-used substrings at the EM's own uniform
zero-count tier ln(t+V). Only the pad to the production-shape 1024 is
synthetic: alphabet combinations that are NOT substrings of any
corpus word (provably dead DP candidates, there to exercise
vocab-size-insensitivity of the map plumbing). Three cost tiers stay
live in segmentation of arbitrary input: trained winners <
zero-count/pad tier < unknown-char fallback (a character absent from
the vocab costs ``UNK_NLL`` and emits itself — unigram segmentation
never UNKs a whole word, unlike WordPiece; the per-char fallback is
exactly SentencePiece's byte/character fallback behavior).

ZERO floats: the artifact carries integers, the DP sums integers, the
outputs are counts + an integer total cost + the md5 of the piece
stream. The Viterbi tie-break is the t58 trainer's pinned integer
tuple (score, n_pieces, backpointer) — fewer pieces first, then the
longest final piece.

Engine spelling: tokenization runs once per DISTINCT word (dictionary
encoding, the t52 production shape) — vocab-as-DATA one-row broadcast
map, the DP as an expression-level ``aggregate`` fold (array-of-struct
accumulator, ``array_min`` tuple argmin), a backtrack fold, then the
join back to the word stream (the only corpus-scale operation; no
broadcast hint — the distinct-word side is corpus-derived).

Oracle: the DP re-derived as a recursive CTE over distinct words +
a recursive backtrack, piece streams reassembled in word order, every
byte differential via md5 (the t52 discipline).

Scale posture (100 TB): per-word work is bounded by len·LMAX integer
map lookups; the corpus-scale cost is one shuffle to distinct the
words and one join back; the vocab map is KB control plane. Same
class as t52 (probed 0.65/flat there).
"""

from __future__ import annotations

import pathlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_VOCAB_PATH = pathlib.Path(__file__).with_name("unigram_vocab.tsv")

#: piece → integer fixed-point NLL (the t58 quantization; artifact)
VOCAB: dict[str, int] = {
    line.split("\t")[0]: int(line.split("\t")[1])
    for line in _VOCAB_PATH.read_text().splitlines()
    if line
}
assert len(VOCAB) > 0 and all(v >= 1 for v in VOCAB.values())

#: longest piece — the DP's per-position candidate window
LMAX = max(len(p) for p in VOCAB)

#: cost of a character absent from the vocab (emits itself) — above
#: every vocab tier so known pieces always win when they match
UNK_NLL = 20_000_000
assert UNK_NLL > max(VOCAB.values())


def _vocab_row(spark: SparkSession) -> DataFrame:
    """The vocab as DATA: one row ``(_vm map<string,bigint>)`` built
    from a 1024-row control-plane frame (the t52 vocab-as-DATA rule —
    a literal map of this size costs ~10 s of analyzer walk per
    query)."""
    items = sorted(VOCAB.items())
    return (
        spark.createDataFrame(items, "piece STRING, nll LONG")
        .agg(
            F.map_from_arrays(
                F.collect_list("piece"), F.collect_list("nll")
            ).alias("_vm")
        )
    )


def viterbi_acc_col(w: str = "w", vm: str = "_vm") -> Column:
    """The per-word Viterbi DP accumulator (array of (s, np, bp)
    structs, one per prefix length) against the vocab map column
    ``vm``. Single-char steps fall back to UNK_NLL when the char is
    unknown, so every word segments; multi-char candidates require
    vocab membership. Ties break by the t58 tuple
    (score, n_pieces, backpointer)."""
    return F.expr(f"""
aggregate(
  sequence(1, length({w}), 1),
  array(struct(cast(0 as bigint) as s, 0 as np, -1 as bp)),
  (acc, i) -> acc || array(
    array_min(
      transform(sequence(greatest(0, i - {LMAX}), i - 1),
        j -> CASE
          WHEN i - j = 1 THEN struct(
            element_at(acc, j + 1).s
              + coalesce(element_at({vm}, substr({w}, j + 1, 1)),
                         cast({UNK_NLL} as bigint)) AS s,
            element_at(acc, j + 1).np + 1 AS np,
            cast(j as int) AS bp)
          WHEN element_at({vm}, substr({w}, j + 1, i - j))
               IS NOT NULL THEN struct(
            element_at(acc, j + 1).s
              + element_at({vm}, substr({w}, j + 1, i - j)) AS s,
            element_at(acc, j + 1).np + 1 AS np,
            cast(j as int) AS bp)
          END)))
)
""")


def viterbi_pieces_col(w: str = "w", acc: str = "__acc") -> Column:
    """Backtrack the DP accumulator into the chosen piece list;
    the walk emits pieces end-first, ``reverse`` restores word
    order."""
    return F.expr(f"""
reverse(aggregate(
  sequence(1, length({w}), 1),
  struct(length({w}) as i, cast(array() as array<string>) as ps),
  (st, _x) -> CASE WHEN st.i > 0
    THEN struct(element_at({acc}, st.i + 1).bp AS i,
                st.ps || array(substr({w},
                                      element_at({acc}, st.i + 1).bp + 1,
                                      st.i - element_at({acc}, st.i + 1).bp))
                  AS ps)
    ELSE st END,
  st -> st.ps
))
""")


def viterbi_cost_col(w: str = "w", acc: str = "__acc") -> Column:
    """The word's minimum total NLL (the DP's final cell)."""
    return F.expr(f"element_at({acc}, length({w}) + 1).s")


def unigram_tokenize(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Tokenize a ``(doc_id, text)`` frame: per doc — ``n_words,
    n_pieces, total_nll, tokens_md5`` (md5 of the space-joined piece
    stream in word order — every byte differential). Empty tokens
    (double spaces) are excluded on both engine and oracle sides."""
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("wno", "w")
    ).filter(F.length("w") > 0)
    wp = (
        words.select("w").distinct()
        .crossJoin(F.broadcast(_vocab_row(spark)))
        .withColumn("__acc", viterbi_acc_col("w", "_vm"))
        .select(
            "w",
            viterbi_pieces_col("w", "__acc").alias("pieces"),
            viterbi_cost_col("w", "__acc").alias("cost"),
        )
    )
    j = words.join(wp, "w")
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(F.size("pieces")).alias("n_pieces"),
        F.sum("cost").alias("total_nll"),
        F.md5(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("wno", "pieces"))
                        ),
                        lambda s: s["pieces"],
                    )
                ),
                " ",
            )
        ).alias("tokens_md5"),
    )


def _vocab_values_sql() -> str:
    items = sorted(VOCAB.items())
    return ", ".join(f"('{k}', {v})" for k, v in items)


def oracle_unigram_cte(src: str = "documents") -> str:
    """Reusable CTE prelude: ``uw0(doc_id, wno, w)``, ``ufin(w,
    pieces, cost)`` — the Viterbi DP + backtrack re-derived over
    ``src``; every CTE name is u-prefixed so the builder composes with
    the WordPiece builder's w0/fin in ONE query (the t48/t55
    composable-oracle pattern)."""
    return f"""
uvocab(piece, nll) AS (
  VALUES {_vocab_values_sql()}
), uvm AS MATERIALIZED (
  SELECT map_from_entries(list((piece, CAST(nll AS BIGINT))
                               ORDER BY piece)) AS m
  FROM uvocab
), uw0 AS MATERIALIZED (
  SELECT doc_id, i - 1 AS wno, toks[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
       LATERAL unnest(range(1, len(toks) + 1)) AS u(i)
  WHERE len(toks[i]) > 0
), udw AS (
  SELECT DISTINCT w FROM uw0
), uvit AS (
  SELECT w, 0 AS i,
         [{{'s': CAST(0 AS BIGINT), 'np': 0, 'bp': -1}}] AS acc
  FROM udw
  UNION ALL
  SELECT w, i + 1,
    list_append(acc, (
      SELECT min(c) FROM (
        SELECT unnest(list_filter(list_transform(
          range(greatest(0, i + 1 - {LMAX}), i + 1),
          j -> CASE
            WHEN i + 1 - CAST(j AS INT) = 1 THEN
              {{'s': acc[CAST(j AS INT) + 1].s
                     + coalesce(m[substr(w, CAST(j AS INT) + 1, 1)][1],
                                CAST({UNK_NLL} AS BIGINT)),
                'np': acc[CAST(j AS INT) + 1].np + 1,
                'bp': CAST(j AS INT)}}
            WHEN len(m[substr(w, CAST(j AS INT) + 1,
                              i + 1 - CAST(j AS INT))]) > 0 THEN
              {{'s': acc[CAST(j AS INT) + 1].s
                     + m[substr(w, CAST(j AS INT) + 1,
                                i + 1 - CAST(j AS INT))][1],
                'np': acc[CAST(j AS INT) + 1].np + 1,
                'bp': CAST(j AS INT)}}
            END), x -> x IS NOT NULL)) AS c)
    ))
  FROM uvit, uvm WHERE i < len(w)
), uback AS (
  SELECT w, len(w) AS i, acc FROM uvit WHERE i = len(w)
  UNION ALL
  SELECT w, acc[i + 1].bp, acc FROM uback WHERE i > 0
), ufin AS MATERIALIZED (
  SELECT w,
         list(substr(w, acc[i + 1].bp + 1, i - acc[i + 1].bp)
              ORDER BY i) AS pieces,
         acc[len(w) + 1].s AS cost
  FROM uback WHERE i > 0 GROUP BY w, acc
)"""


@register(
    "t59_unigram_tokens",
    oracle=f"""
WITH RECURSIVE {oracle_unigram_cte()},
j AS (
  SELECT uw0.doc_id, uw0.wno, f.pieces, f.cost
  FROM uw0 JOIN ufin f USING (w)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
       CAST(sum(cost) AS BIGINT) AS total_nll,
       md5(string_agg(array_to_string(pieces, ' '), ' ' ORDER BY wno))
         AS tokens_md5
FROM j GROUP BY doc_id ORDER BY doc_id
""",
)
def t59_unigram_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM Viterbi tokenization over the corpus (module
    docstring): per-doc piece counts, the integer total NLL cost of
    the chosen segmentations, and the md5 of the full piece stream in
    word order."""
    docs = table(spark, sf_dir, "documents")
    return unigram_tokenize(spark, docs).orderBy("doc_id")
