"""Distributed unigram-LM (SentencePiece) vocabulary TRAINING (t58) —
the THIRD tokenizer family's learner, completing the set: BPE (t56,
merge-count argmax), WordPiece (t57, likelihood-ratio argmax), and now
unigram-LM (Kudo 2018, "Subword Regularization: Improving Neural
Network Translation Models with Multiple Subword Candidates"), the
segmentation-model trainer SentencePiece implements.

Algorithm (public; deterministic hard-EM variant):

1. SEED: the candidate vocabulary is every single character of the
   corpus (the alphabet — never pruned, so every word stays
   segmentable) plus the ``SEED_N`` most frequent substrings of length
   2..``PLEN`` (frequency-weighted by word count; (cnt DESC, piece
   ASC) tie-break). SentencePiece seeds the same way (its
   ``seed_sentencepiece_size`` from suffix-array substring counts).
2. EM rounds: E-step segments every distinct word with the VITERBI
   (single best) segmentation under the current piece probabilities
   and counts piece occurrences frequency-weighted; M-step
   re-estimates probabilities from those counts (add-one smoothed so
   zero-count alphabet pieces keep a finite cost). Pieces of length
   ≥ 2 that no best segmentation used are pruned (SentencePiece's
   prune-by-contribution, in the limit hard-EM makes exact: an unused
   piece contributes nothing to the corpus likelihood).
3. Output: the top ``VOCAB_N`` pieces by final E-step count.

Determinism contract (what makes this oracle-checkable bit-exactly):

- HARD EM, not soft: production SentencePiece's E-step uses lattice
  forward-backward marginals — fractional expected counts whose
  cross-word double aggregation is order-dependent and therefore not
  reproducible across engines. The Viterbi (hard) E-step yields exact
  INTEGER counts, order-free under any aggregation (the t50 NLL
  discipline applied to a trainer).
- Piece costs are integer fixed-point NLLs quantized ONCE per round:
  ``floor(ln((total+V)/(cnt+1)) * 1e6 + 0.5)`` with the identical
  IEEE op sequence on both engines (CAST-to-double, one divide, one
  ln — the t27/t50 ln-parity precedent); every Viterbi comparison is
  then pure bigint arithmetic.
- Viterbi ties are pinned by the integer tuple
  ``(score, n_pieces, backpointer)`` — fewer pieces first, then the
  longest final piece (smallest backpointer). The tuple's third
  component is unique per candidate, so no comparison is ever a tie.

Spark mapping: the corpus is scanned ONCE (word-frequency count);
all EM state is dictionary-sized — (word, freq) rows and a
vocab-sized (piece, cnt) table. Each round is: one-row total/size
aggregate → NLL projection → vocab-as-DATA one-row broadcast map (the
t52 plan-build fix — never a wide literal) cross-joined to the
distinct words → Viterbi DP as an expression-level ``aggregate`` fold
(array-of-struct accumulator, ``array_min`` tuple argmin) → backtrack
fold → explode + hash-agg for the new counts. No driver-side argmax
at all: unlike t56/t57 the round count is fixed, so the WHOLE
training run is one lazy plan — zero ``collect()`` on any data path.

Oracle: the full run re-derived in DuckDB — seed CTEs, per-round
NLL + map, the Viterbi DP as a recursive CTE over word positions, the
backtrack as a second recursive CTE, counts re-aggregated; every
multiply-referenced state ``AS MATERIALIZED`` (the t56
exponential-inlining finding).

100 TB posture: the only corpus-scale operation is the word-frequency
groupBy (one shuffle on ``w``). Everything after is bounded by the
dictionary (distinct words) and the vocab (≤ SEED_N + |alphabet|):
the per-round folds are map-side projections over the word table, the
count aggregations shuffle vocab-sized keys, and the one-row map
broadcast is KB-scale. Scaling the corpus 1000× grows the dictionary
sub-linearly (Heaps' law) and the EM cost with it, not with raw bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

#: max candidate piece length (SentencePiece max_sentencepiece_length
#: is 16 by default; 4 keeps the unrolled oracle's DP windows tight).
PLEN = 4
#: multi-char seed pieces kept, top by (cnt DESC, piece ASC).
SEED_N = 256
#: EM rounds the registered query runs (each = one unrolled oracle
#: stage: NLL + Viterbi + backtrack + recount).
T58_ROUNDS = 2
#: output vocabulary rows.
T58_VOCAB_N = 32


def _words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): the single corpus-scale scan."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def seed_vocab(words: DataFrame, plen: int = PLEN,
               seed_n: int = SEED_N) -> DataFrame:
    """(piece, cnt): full alphabet + top-``seed_n`` multi-char
    substrings, frequency-weighted occurrence counts."""
    subs = F.expr(
        "flatten(transform(sequence(1, length(w)), s -> "
        f"transform(sequence(1, least({plen}, length(w) - s + 1)), "
        "l -> substring(w, s, l))))"
    )
    seed = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    alpha = seed.filter(F.length("piece") == 1)
    multi = (
        seed.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), "piece")  # TakeOrderedAndProject
        .limit(seed_n)
    )
    return alpha.unionAll(multi)


def _nll_map_row(vocab: DataFrame) -> DataFrame:
    """One row: map piece → integer fixed-point NLL under add-one
    smoothing. The quantization makes every downstream comparison
    exact integer arithmetic (module docstring)."""
    tot = vocab.agg(
        F.sum("cnt").alias("t"), F.count("*").alias("v")
    )
    nv = vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.floor(
            F.log(
                (F.col("t") + F.col("v")).cast("double")
                / (F.col("cnt") + F.lit(1)).cast("double")
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).alias("nll"),
    )
    return nv.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("piece", "nll")))
        ).alias("m")
    )


def _viterbi_counts(words: DataFrame, vocab: DataFrame,
                    plen: int = PLEN) -> DataFrame:
    """E-step: Viterbi-segment every word under the vocab's NLL map,
    return (piece, cnt) frequency-weighted occurrence counts.

    The DP accumulator is an array of (s, np, bp) structs — best
    integer score, piece count, and backpointer per prefix length;
    ``array_min`` is the tuple argmin (NULL candidates are skipped,
    and the alphabet guarantees at least one candidate per position).
    """
    vit = F.expr(f"""
aggregate(
  sequence(1, length(w)),
  array(struct(cast(0 as bigint) as s, 0 as np, -1 as bp)),
  (acc, i) -> acc || array(
    array_min(
      transform(sequence(greatest(0, i - {plen}), i - 1),
        j -> CASE WHEN element_at(m, substr(w, j + 1, i - j)) IS NOT NULL
             THEN struct(
               element_at(acc, j + 1).s
                 + element_at(m, substr(w, j + 1, i - j)) AS s,
               element_at(acc, j + 1).np + 1 AS np,
               cast(j as int) AS bp)
             END)))
)
""")
    back = F.expr("""
aggregate(
  sequence(1, length(w)),
  struct(length(w) as i, cast(array() as array<string>) as ps),
  (st, _x) -> CASE WHEN st.i > 0
    THEN struct(element_at(acc, st.i + 1).bp AS i,
                st.ps || array(substr(w, element_at(acc, st.i + 1).bp + 1,
                                      st.i - element_at(acc, st.i + 1).bp))
                  AS ps)
    ELSE st END,
  st -> st.ps
)
""")
    seg = (
        words.crossJoin(F.broadcast(_nll_map_row(vocab)))
        .withColumn("acc", vit)
        .withColumn("pieces", back)
    )
    return (
        seg.select(F.explode("pieces").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def em_round(words: DataFrame, vocab: DataFrame,
             plen: int = PLEN, prune_unused: bool = True) -> DataFrame:
    """One hard-EM round: E-step counts, then the next vocab —
    alphabet retained at coalesce(cnt, 0), multi-char pieces pruned
    when unused (inner join against the new counts).

    ``prune_unused=False`` is the KEEP-ALL retention mode (the vocab
    artifact generator): unused multi-char pieces are retained at
    count 0 instead of pruned, so every seeded piece ends the run with
    a TRAINED cost — winners at their count-derived NLLs, never-used
    pieces at the EM's own uniform zero-count tier ln(t+V). Same
    E-step, same quantization; only the retention join changes."""
    nc = _viterbi_counts(words, vocab, plen)
    # both sides are vocab-sized (≤ SEED_N + |alphabet|) — AQE
    # broadcasts on its own, no hint (r8 broadcast-inventory rule)
    alpha = (
        vocab.filter(F.length("piece") == 1)
        .select("piece")
        .join(nc, "piece", "left")
        .select(
            "piece",
            F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt"),
        )
    )
    multi = vocab.filter(F.length("piece") >= 2).select("piece")
    if prune_unused:
        multi = multi.join(nc, "piece", "inner").select("piece", "cnt")
    else:
        multi = multi.join(nc, "piece", "left").select(
            "piece",
            F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt"),
        )
    return alpha.unionAll(multi)


def train_unigram(
    docs: DataFrame,
    rounds: int = T58_ROUNDS,
    plen: int = PLEN,
    seed_n: int = SEED_N,
    text_col: str = "text",
    checkpoint_every: int = 1,
    prune_unused: bool = True,
) -> DataFrame:
    """Full trainer: seed → ``rounds`` hard-EM rounds → final
    (piece, cnt) vocabulary counts (unranked; callers cut/rank).
    ``prune_unused=False`` = keep-all retention (see ``em_round``).

    Round-13 plan-depth control (guide §4.4 duplicated evaluation):
    each EM round references the incoming vocab FOUR times (the NLL
    map's total + entries, the alphabet-retention join, the multi
    join), so an unckeckpointed chain replicates the previous round's
    whole subtree 4× per round — t58's 2-round plan carried 352
    Exchanges and its wall time was driver planning/scheduling, not
    compute. The dictionary-sized word-frequency table and the
    KB-scale vocab state are now lazily localCheckpoint'd (the word
    table once, the vocab every ``checkpoint_every`` rounds, default
    1), so every round plans against materialized control-plane
    state. Identical counts — the materialization is a barrier, not a
    semantic change."""
    words = _words(docs, text_col).localCheckpoint(eager=False)
    vocab = seed_vocab(words, plen, seed_n)
    for r in range(rounds):
        vocab = em_round(words, vocab, plen, prune_unused)
        if (r + 1) % checkpoint_every == 0 and r + 1 < rounds:
            vocab = vocab.localCheckpoint(eager=False)
    return vocab


def _oracle_t58(rounds: int = T58_ROUNDS, plen: int = PLEN,
                seed_n: int = SEED_N, vocab_n: int = T58_VOCAB_N) -> str:
    """The training run exactly re-derived: seed CTEs + per-round
    (NLL projection, one-row map, recursive-CTE Viterbi DP,
    recursive-CTE backtrack, recount, prune). Multiply-referenced
    states MATERIALIZED (the t56 exponential-inlining finding)."""
    blocks = [f"""words AS MATERIALIZED (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE len(w) > 0 GROUP BY w
), seed AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT substr(w, CAST(s AS INT), CAST(l AS INT)) AS piece, freq
    FROM words,
         LATERAL unnest(range(1, len(w) + 1)) AS a(s),
         LATERAL unnest(range(1, least({plen}, len(w) - CAST(s AS INT) + 1) + 1)) AS b(l)
  ) GROUP BY piece
), v1 AS MATERIALIZED (
  SELECT piece, cnt FROM seed WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM seed WHERE len(piece) >= 2
    ORDER BY cnt DESC, piece LIMIT {seed_n}
  )
)"""]
    for r in range(1, rounds + 1):
        blocks.append(f"""nv{r} AS MATERIALIZED (
  SELECT piece,
         CAST(floor(ln(CAST(t.t + t.v AS DOUBLE) / CAST(cnt + 1 AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS nll
  FROM v{r}, (SELECT CAST(sum(cnt) AS BIGINT) AS t, count(*) AS v
              FROM v{r}) t
), vm{r} AS MATERIALIZED (
  SELECT map_from_entries(list((piece, nll) ORDER BY piece)) AS m
  FROM nv{r}
), vit{r} AS (
  SELECT w, freq, 0 AS i,
         [{{'s': CAST(0 AS BIGINT), 'np': 0, 'bp': -1}}] AS acc
  FROM words
  UNION ALL
  SELECT w, freq, i + 1,
    list_append(acc, (
      SELECT min(c) FROM (
        SELECT unnest(list_filter(list_transform(
          range(greatest(0, i + 1 - {plen}), i + 1),
          j -> CASE WHEN len(m[substr(w, CAST(j AS INT) + 1,
                                      i + 1 - CAST(j AS INT))]) > 0
               THEN {{'s': acc[CAST(j AS INT) + 1].s
                            + m[substr(w, CAST(j AS INT) + 1,
                                       i + 1 - CAST(j AS INT))][1],
                     'np': acc[CAST(j AS INT) + 1].np + 1,
                     'bp': CAST(j AS INT)}}
               END), x -> x IS NOT NULL)) AS c)
    ))
  FROM vit{r}, vm{r} WHERE i < len(w)
), back{r} AS (
  SELECT w, freq, len(w) AS i, acc FROM vit{r} WHERE i = len(w)
  UNION ALL
  SELECT w, freq, acc[i + 1].bp, acc FROM back{r} WHERE i > 0
), nc{r} AS MATERIALIZED (
  SELECT substr(w, acc[i + 1].bp + 1, i - acc[i + 1].bp) AS piece,
         CAST(sum(freq) AS BIGINT) AS cnt
  FROM back{r} WHERE i > 0 GROUP BY 1
), v{r + 1} AS MATERIALIZED (
  SELECT a.piece, coalesce(n.cnt, CAST(0 AS BIGINT)) AS cnt
  FROM (SELECT piece FROM v{r} WHERE len(piece) = 1) a
  LEFT JOIN nc{r} n ON n.piece = a.piece
  UNION ALL
  SELECT mu.piece, n.cnt
  FROM (SELECT piece FROM v{r} WHERE len(piece) >= 2) mu
  JOIN nc{r} n ON n.piece = mu.piece
)""")
    return (
        "WITH RECURSIVE " + ",\n".join(blocks)
        + f"""
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INT)
         AS mrank, piece, cnt
FROM (SELECT piece, cnt FROM v{rounds + 1}
      ORDER BY cnt DESC, piece LIMIT {vocab_n})
ORDER BY mrank"""
    )


@register("t58_unigram_train", oracle=_oracle_t58())
def t58_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece) vocabulary training (module
    docstring): seed + 2 hard-EM rounds over the documents corpus,
    top-32 final pieces; the oracle re-runs the whole trainer as
    staged recursive CTEs."""
    docs = table(spark, sf_dir, "documents")
    vocab = train_unigram(docs, T58_ROUNDS)
    top = vocab.orderBy(F.desc("cnt"), "piece").limit(T58_VOCAB_N)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), "piece"))
        .alias("mrank"),
        "piece",
        "cnt",
    )
