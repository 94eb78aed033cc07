"""Distributed WordPiece vocabulary TRAINING (t57) — the second
tokenizer family's learner, completing what t56 (`bpe_train`) started:
BOTH tokenizer families' vocab fitting are now engine ops.

Algorithm (public: Schuster & Nakajima 2012 "Japanese and Korean voice
search"; the exact scoring rule is the one HuggingFace `tokenizers`
documents for its WordPiece trainer): words split into a first bare
character plus ``##``-prefixed continuations; each step merges the
adjacent token pair maximizing the LIKELIHOOD score

    score(A, B) = freq(A, B) / (freq(A) * freq(B))

(the pair whose fusion most increases unigram-LM likelihood) — NOT
BPE's raw count argmax, which is the whole point of keeping both
trainers: same loop shape, different objective, observably different
vocabularies on the same corpus (test-pinned). The merged token is
``A + B[2:]`` (the continuation prefix folds away). Tie-breaks are
pinned exactly like the BPE trainer's: (score DESC, a ASC, b ASC),
skipping any candidate whose merged string was already minted.

Spark mapping — the t56 skeleton with WordPiece's twists:

- state is one row per DISTINCT word: ``(seq, freq)`` — WordPiece (and
  production BPE) trainers weight by word frequency instead of
  rescanning running text, so the state is dictionary-sized and the
  per-iteration aggregates scan the WORD table, not the corpus (the
  corpus is touched once, for the word-frequency count);
- per iteration: token-frequency aggregate + pair-frequency aggregate
  (both weighted by ``freq``), a join attaching freq(A)/freq(B) to
  each pair, the scored LIMIT-1 argmax to the driver, one
  expression-level replace pass, localCheckpoint lineage cuts;
- the score is two IEEE double ops from exact integer counts — each
  count factor cast to DOUBLE before the multiply (a bigint product
  would wrap at 64 bits for counts > ~3e9 while DuckDB widens to
  HUGEINT), then one division — bit-identical on both engines at any
  corpus scale, so the oracle's ORDER BY reproduces the argmax
  exactly.

Oracle: the training loop exactly unrolled as K staged CTE blocks,
every multiply-referenced state ``AS MATERIALIZED`` (the t56 finding:
plain chained CTEs inline EXPONENTIALLY in DuckDB — measured 27 GB on
t56 before the hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .bpe import SEP

#: merges the registered query learns (one unrolled CTE block each).
T57_K = 6


def _initial_state(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(seq, freq) per distinct word: first char bare, continuations
    ``##``-prefixed, every token SEP-wrapped."""
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    seq = F.expr(
        "array_join(transform(sequence(1, length(w)), i -> "
        f"concat('{SEP}', CASE WHEN i = 1 THEN substring(w, i, 1) "
        f"ELSE concat('##', substring(w, i, 1)) END, '{SEP}')), '')"
    )
    return words.select(seq.alias("seq"), "freq")


def _scored_pairs(state: DataFrame) -> DataFrame:
    """One iteration's candidates: (a, b, c12, ca, cb, score) with all
    frequencies weighted by word freq."""
    toks = F.split(F.btrim(F.col("seq"), F.lit(SEP)), SEP + SEP)
    tokens = state.select(
        F.explode(toks).alias("t"), "freq"
    ).groupBy("t").agg(F.sum("freq").alias("c"))
    pairs = F.expr(
        "CASE WHEN size(__toks) >= 2 THEN "
        "transform(sequence(1, size(__toks) - 1), "
        "i -> struct(__toks[i - 1] AS a, __toks[i] AS b)) "
        "ELSE array() END"
    )
    pc = (
        state.select(toks.alias("__toks"), "freq")
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("c12"))
    )
    # token-frequency side is bounded (|alphabet| + merges so far) —
    # AQE broadcasts it on its own, no hint
    return (
        pc.join(tokens.select(F.col("t").alias("a"),
                              F.col("c").alias("ca")), "a")
        .join(tokens.select(F.col("t").alias("b"),
                            F.col("c").alias("cb")), "b")
        .withColumn(
            # each factor cast to DOUBLE BEFORE the multiply (r10
            # ADVICE): a bigint*bigint product silently wraps at 64
            # bits for counts > ~3e9, while DuckDB would compute it in
            # HUGEINT — double*double is the same IEEE op sequence on
            # both engines at every scale.
            "score",
            F.col("c12").cast("double")
            / (F.col("ca").cast("double") * F.col("cb").cast("double")),
        )
    )


def train_wordpiece_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 32,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` WordPiece merges (module docstring). Returns
    the ranked (a, b) pair list; the minted piece is ``a + b[2:]``."""
    if docs.filter(F.col(text_col).contains(SEP)).limit(1).count():
        raise ValueError(
            "train_wordpiece_merges: corpus contains the \\x1f separator"
        )
    if docs.filter(F.col(text_col).contains("#")).limit(1).count():
        raise ValueError(
            "train_wordpiece_merges: corpus contains '#' — the "
            "continuation prefix would be ambiguous"
        )
    state = _initial_state(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    minted: set[str] = set()
    for step in range(n_merges):
        cands = _scored_pairs(state)
        if minted:
            cands = cands.filter(
                ~F.concat(F.col("a"), F.expr("substring(b, 3)"))
                .isin(sorted(minted))
            )
        best = cands.orderBy(F.desc("score"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merged = a + b[2:]
        merges.append((a, b))
        minted.add(merged)
        state = state.withColumn(
            "seq",
            F.replace(
                "seq",
                F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
                F.lit(f"{SEP}{merged}{SEP}"),
            ),
        )
        if (step + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
    return merges


def _oracle_t57(k: int = T57_K) -> str:
    """Training exactly unrolled: per stage — token/pair frequency
    aggregates, the likelihood-score argmax with the pinned tie-break
    and minted exclusion, one replace pass. States MATERIALIZED (the
    t56 exponential-inlining finding)."""
    blocks = [f"""wf AS MATERIALIZED (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE len(w) > 0 GROUP BY w
), s0 AS MATERIALIZED (
  SELECT list_aggregate(list_transform(range(1, len(w) + 1), i ->
           '{SEP}' || CASE WHEN i = 1 THEN substr(w, CAST(i AS INT), 1)
                      ELSE '##' || substr(w, CAST(i AS INT), 1) END
           || '{SEP}'), 'string_agg', '') AS seq,
         freq
  FROM wf
), m0(ms) AS (SELECT NULL WHERE false)"""]
    for i in range(1, k + 1):
        p = i - 1
        blocks.append(f"""tk{i} AS MATERIALIZED (
  SELECT string_split(trim(seq, '{SEP}'), '{SEP}{SEP}') AS toks, freq
  FROM s{p}
), tc{i} AS MATERIALIZED (
  SELECT t, sum(freq) AS c FROM (
    SELECT unnest(toks) AS t, freq FROM tk{i}
  ) GROUP BY t
), pc{i} AS (
  SELECT toks[CAST(j AS INT)] AS a, toks[CAST(j AS INT) + 1] AS b,
         sum(freq) AS c12
  FROM tk{i}, LATERAL unnest(range(1, len(toks))) AS u(j)
  GROUP BY 1, 2
), w{i} AS MATERIALIZED (
  SELECT p.a, p.b FROM pc{i} p
  JOIN tc{i} ta ON ta.t = p.a
  JOIN tc{i} tb ON tb.t = p.b
  WHERE p.a || substr(p.b, 3) NOT IN (SELECT ms FROM m{p})
  ORDER BY CAST(p.c12 AS DOUBLE)
             / (CAST(ta.c AS DOUBLE) * CAST(tb.c AS DOUBLE)) DESC,
           p.a, p.b
  LIMIT 1
), m{i}(ms) AS MATERIALIZED (
  SELECT ms FROM m{p}
  UNION ALL SELECT a || substr(b, 3) FROM w{i}
), s{i} AS MATERIALIZED (
  SELECT replace(seq, '{SEP}' || a || '{SEP}{SEP}' || b || '{SEP}',
                 '{SEP}' || a || substr(b, 3) || '{SEP}') AS seq,
         freq
  FROM s{p} CROSS JOIN w{i}
)""")
    ranks = "\nUNION ALL\n".join(
        f"SELECT {i} AS mrank, a, b, a || substr(b, 3) AS piece FROM w{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH " + ",\n".join(blocks)
        + f"\nSELECT * FROM (\n{ranks}\n) ORDER BY mrank"
    )


@register("t57_wordpiece_train", oracle=_oracle_t57())
def t57_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed WordPiece vocabulary training (module docstring):
    learn the first K likelihood-scored merges from the documents
    corpus; the oracle re-runs the whole loop as K exactly-unrolled
    MATERIALIZED CTE stages."""
    docs = table(spark, sf_dir, "documents")
    merges = train_wordpiece_merges(docs, T57_K)
    return spark.createDataFrame(
        [(i + 1, a, b, a + b[2:]) for i, (a, b) in enumerate(merges)],
        "mrank INT, a STRING, b STRING, piece STRING",
    )
