"""WordPiece tokenization (t52) — the SECOND real tokenizer family
(BERT's), next to the BPE family (t39–t43): greedy
longest-match-first subword segmentation against a fixed vocabulary
(public algorithm: Wu et al. 2016 "Google's Neural Machine
Translation System"; the exact inference rule is the one HuggingFace
`tokenizers` documents and BERT's reference implementation ships):

    at each position take the LONGEST vocabulary piece that matches
    (continuation positions use the '##' spelling); if at any
    position nothing matches, the ENTIRE word becomes [UNK].

This differs from BPE structurally — BPE replays ranked merges
(iteration over RULES), WordPiece scans positions (iteration over the
WORD) — so the engine spelling is different too: a per-word
``F.aggregate`` fold over a bounded position sequence, with the vocab
as a MAP literal from piece → chars-consumed (KB control plane, the
same class as the BPE merges table). Zero Python in the hot path.

Dictionary-encoding: tokenization runs once per DISTINCT word and
joins back to the word stream — the production shape (a tokenizer's
work is vocab-bounded, not corpus-bounded; the join is the only
corpus-scale operation and carries no broadcast hint).

The vocabulary is the checked-in artifact
``wordpiece_vocab.tsv`` (regenerate: ``scripts/gen_wordpiece_vocab.py``)
— rule-built from the corpus so every algorithm branch is
load-bearing on the fixture: whole-word pieces compete with their
3-char prefixes (greedy must prefer long), long '##' suffixes compete
with char-by-char continuations, and the excluded char 'j' makes the
corpus's most frequent word ('join') take the whole-word-[UNK] path.

Oracle: DuckDB re-runs the SAME greedy scan as a recursive CTE over
distinct words (vocab as a VALUES table, longest match via
`ORDER BY adv DESC LIMIT 1`), joins back, and reassembles each doc's
piece stream — every byte differential via md5 of the stream.

Parity: everything is strings and integers — no float exists in the
whole operator.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_VOCAB_PATH = pathlib.Path(__file__).with_name("wordpiece_vocab.tsv")

#: piece → chars consumed (the '##' spelling costs 0 extra chars)
VOCAB: dict[str, int] = {
    p: len(p) - 2 if p.startswith("##") else len(p)
    for p in _VOCAB_PATH.read_text().splitlines()
    if p
}
assert len(VOCAB) > 0 and all(v >= 1 for v in VOCAB.values())

#: longest piece in chars — the greedy scan tries lengths LMAX..1
LMAX = max(VOCAB.values())

#: BERT's max_input_chars_per_word analog: longer words are [UNK]
#: without scanning (also the fold's iteration bound — every matching
#: step consumes >= 1 char, so MAX_WORD_CHARS steps always finish).
MAX_WORD_CHARS = 16

UNK = "[UNK]"


def _vocab_map() -> Column:
    """The vocab as a MAP literal piece → chars-consumed (KB-bounded
    control plane; built per call — no module-level column, the
    no-active-session import rule).

    Each array goes through ONE ``F.lit(list)`` call: at the 1024-piece
    production vocab, per-element ``F.lit`` construction is ~2k py4j
    round-trips and measured ~12 s of client-side plan build PER QUERY
    (t52 warm build+exec 16.7 s); the single array literal builds in
    milliseconds and the JVM tree carries two shallow-copied Literal
    nodes instead of 2k (t52 warm build+exec back to ~1 s)."""
    items = sorted(VOCAB.items())
    return F.map_from_arrays(
        F.lit([k for k, _ in items]),
        F.lit([v for _, v in items]),
    )


def _vocab_row(spark: SparkSession) -> DataFrame:
    """The vocab as DATA: a ONE-ROW frame ``(_vm map<string,int>)``
    built from a 1024-row control-plane DataFrame. The production path
    (``wordpiece_tokenize``) broadcast-cross-joins this row to the
    distinct words so the fold references an ATTRIBUTE — at the
    1024-piece vocab the literal-map spelling inlines ~17 copies of a
    2048-literal array into the expression tree and the analyzer walk
    alone costs ~10 s per query (measured; the BPE merges-as-DATA
    lesson, r8 #5, applied to the map shape). Map lookups are linear
    scans either way (Catalyst has no literal-map hash fast path), so
    runtime is identical — only plan build/analysis changes."""
    items = sorted(VOCAB.items())
    return (
        spark.createDataFrame(items, "piece STRING, adv INT")
        .agg(
            F.map_from_arrays(
                F.collect_list("piece"), F.collect_list("adv")
            ).alias("_vm")
        )
    )


def wordpiece_result_col(w: Column, vmap: Column | None = None) -> Column:
    """Greedy longest-match fold over one word column: returns
    ``struct(pieces array<string>, ok boolean)`` — ok=false means the
    word took the whole-word-[UNK] path (no match at some position,
    or longer than MAX_WORD_CHARS). Pass ``vmap`` (an attribute column
    carrying the piece→adv map, see :func:`_vocab_row`) on hot paths;
    the default literal-map spelling is semantics-identical but pays
    an O(|vocab|) analyzer walk per reference."""
    if vmap is None:
        vmap = _vocab_map()

    def _piece(pos: Column, length: int) -> Column:
        raw = w.substr(pos, F.lit(length))
        return F.when(pos == 1, raw).otherwise(F.concat(F.lit("##"), raw))

    def _step(acc: Column, _i: Column) -> Column:
        pos, toks, ok = acc["pos"], acc["toks"], acc["ok"]
        active = ok & (pos <= F.length(w))
        cand = F.coalesce(
            *[
                F.when(
                    F.map_contains_key(vmap, _piece(pos, n)), _piece(pos, n)
                )
                for n in range(LMAX, 0, -1)
            ]
        )
        hit = active & cand.isNotNull()
        return F.struct(
            F.when(hit, pos + F.element_at(vmap, cand)).otherwise(pos)
            .alias("pos"),
            F.when(hit, F.concat(toks, F.array(cand))).otherwise(toks)
            .alias("toks"),
            F.when(active & cand.isNull(), F.lit(False)).otherwise(ok)
            .alias("ok"),
        )

    init = F.struct(
        F.lit(1).alias("pos"),
        F.array().cast("array<string>").alias("toks"),
        F.lit(True).alias("ok"),
    )
    res = F.aggregate(
        F.sequence(F.lit(1), F.lit(MAX_WORD_CHARS)), init, _step
    )
    # the explicit over-cap gate: BERT UNKs long words WITHOUT
    # scanning — multi-char pieces could otherwise finish a >cap word
    # within the step budget (caught by the fuzz test)
    done = (
        res["ok"]
        & (res["pos"] == F.length(w) + 1)
        & (F.length(w) <= MAX_WORD_CHARS)
    )
    return F.struct(
        F.when(done, res["toks"]).otherwise(F.array(F.lit(UNK)))
        .alias("pieces"),
        done.alias("ok"),
    )


#: memo for the standard (w, _vm) fold column — the bpe._fold_col
#: precedent: building the LMAX-wide greedy-scan step tree costs a few
#: hundred py4j round trips per call, paid by EVERY wordpiece-family
#: query build (t52/t54/t55/t60/t48/t49).  Column objects are immutable
#: and session-independent; VOCAB is a fixed per-process artifact, so a
#: single-slot memo is content-stable (round 14, r13 verdict #1).
_RESULT_COL_MEMO: dict = {}


def _result_col_std() -> Column:
    hit = _RESULT_COL_MEMO.get("std")
    if hit is None:
        hit = wordpiece_result_col(F.col("w"), F.col("_vm"))
        _RESULT_COL_MEMO["std"] = hit
    return hit


def wordpiece_tokenize(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Tokenize a ``(doc_id, text)`` frame: per doc —
    ``n_words, n_pieces, n_unk, tokens_md5`` (md5 of the space-joined
    piece stream in word order, the every-byte differential)."""
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("wno", "w")
    )
    wp = (
        words.select("w").distinct()
        .crossJoin(F.broadcast(_vocab_row(spark)))
        .select(
            "w",
            _result_col_std().alias("r"),
        )
        .select("w", F.col("r.pieces").alias("pieces"), F.col("r.ok").alias("ok"))
    )
    # distinct-word table is vocab-class but corpus-derived: no hint
    j = words.join(wp, "w")
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(F.size("pieces")).alias("n_pieces"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("n_unk"),
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
    """The vocab as a SQL VALUES list (piece, adv) — pieces are
    quote-free ASCII (asserted at generation)."""
    items = sorted(VOCAB.items())
    return ", ".join(f"('{k}', {v})" for k, v in items)


def oracle_wordpiece_cte(src: str = "documents") -> str:
    """Reusable CTE prelude: defines ``w0(doc_id, wno, w)``,
    ``fin(w, pieces, unk)`` — the per-word greedy scan re-derived as a
    recursive CTE over ``src`` (a table/CTE with doc_id + text), for
    composition by other oracles (the t48-builder pattern)."""
    return f"""
vocab(piece, adv) AS (
  VALUES {_vocab_values_sql()}
), w0 AS (
  SELECT doc_id, i - 1 AS wno, toks[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
       LATERAL unnest(range(1, len(toks) + 1)) AS u(i)
), dw AS (
  SELECT DISTINCT w FROM w0
), st AS (
  SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS toks, true AS ok,
         0 AS step
  FROM dw
  UNION ALL
  SELECT w,
         CASE WHEN best IS NULL THEN pos
              ELSE pos + len(best)
                   - CASE WHEN pos > 1 THEN 2 ELSE 0 END END AS pos,
         CASE WHEN best IS NULL THEN toks
              ELSE list_append(toks, best) END AS toks,
         best IS NOT NULL AS ok,
         step + 1 AS step
  FROM (
    SELECT w, pos, toks, step,
           (SELECT v.piece FROM vocab v
             WHERE v.piece = (CASE WHEN pos > 1 THEN '##' ELSE '' END)
                             || substr(w, pos, v.adv)
             ORDER BY v.adv DESC LIMIT 1) AS best
    FROM st
    WHERE ok AND pos <= len(w) AND step < {MAX_WORD_CHARS}
  )
), fin AS (
  SELECT w,
         CASE WHEN ok AND pos > len(w) AND len(w) <= {MAX_WORD_CHARS}
              THEN toks ELSE ['{UNK}'] END AS pieces,
         NOT (ok AND pos > len(w) AND len(w) <= {MAX_WORD_CHARS}) AS unk
  FROM st
  WHERE NOT ok OR pos > len(w) OR step >= {MAX_WORD_CHARS}
)"""


@register(
    "t52_wordpiece",
    oracle=f"""
WITH RECURSIVE {oracle_wordpiece_cte()},
j AS (
  SELECT w0.doc_id, w0.wno, f.pieces, f.unk
  FROM w0 JOIN fin f USING (w)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
       CAST(sum(CAST(unk AS INT)) AS BIGINT) AS n_unk,
       md5(string_agg(array_to_string(pieces, ' '), ' ' ORDER BY wno))
         AS tokens_md5
FROM j GROUP BY doc_id ORDER BY doc_id
""",
)
def t52_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match tokenization over the corpus
    (module docstring): per-doc piece counts, whole-word-[UNK] counts
    ('join' carries the excluded char, so n_unk is a high-frequency
    live signal), and the md5 of the full piece stream in word order —
    every byte of every tokenization is differential."""
    docs = table(spark, sf_dir, "documents")
    return wordpiece_tokenize(spark, docs).orderBy("doc_id")


# --- tokenize-on-ingest (streaming twin of t52) ----------------------------


def tokenize_ingest_foreach_batch(out_dir: str):
    """foreachBatch handler for CONTINUOUS tokenization-on-ingest:
    each micro-batch of raw documents is WordPiece-tokenized and its
    per-doc stats written to ``out_dir/batch=<epoch_id>``. The vocab
    is a FIXED artifact (tokenizers ship with the model), so — unlike
    the corpus-trained LM/BM25 stats — tokenization is strictly
    per-document: no cross-batch state, replay idempotence is the
    deterministic per-batch overwrite, and the streamed union across
    ANY file slicing equals the one-shot batch run (the
    stream==batch discipline of curation-on-ingest; the batch-local
    distinct-word dictionary is an optimization, not semantics)."""
    import os

    def handle(batch: DataFrame, batch_id: int) -> None:
        (
            wordpiece_tokenize(batch.sparkSession, batch)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={batch_id}"))
        )

    return handle


def start_tokenize_ingest_stream(
    spark: SparkSession,
    stage_dir: str,
    schema,
    out_dir: str,
    checkpoint: str,
):
    """Tokenize-on-ingest as a real Structured Streaming query over a
    parquet file source (one file per micro-batch, availableNow —
    drains what exists then stops; re-invoke after a restart and the
    checkpoint resumes from the first unprocessed file)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    return (
        stream.writeStream
        .foreachBatch(tokenize_ingest_foreach_batch(out_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
