"""Deduplication operators for training-data pipelines (SURVEY.md §2J).

Four dedup tiers, cheapest-first — the standard LLM-corpus pipeline:
exact (hash groupBy) → near-dup candidates (MinHash-LSH bands) →
SimHash (hamming buckets) → exact n-gram Jaccard verification.

Scale notes (100 TB): everything here is pure DataFrame ops — no Python
in the hot path. Exact dedup is one shuffle on the text hash. MinHash:
the signature computation is a single groupBy over exploded shingles
(num_perm aggregate columns, map-side combined); LSH banding turns the
O(n²) pair space into |bucket|² within bands — the only quadratic step
is inside buckets, which stay small when bands/rows are tuned. SimHash
pairs are bucketed by signature prefix for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..registry import register

NUM_PERM = 16
BANDS = 4  # 4 bands × 4 rows
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_K = 3


def normalized_text(col: str = "text") -> Column:
    return F.lower(F.trim(F.col(col)))


def dedup_exact_op(df: DataFrame, text_col: str = "text") -> DataFrame:
    """J1: drop exact duplicates by normalized-text hash; deterministic
    winner = min doc_id. Returns the surviving rows."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(F.xxhash64(normalized_text(text_col)))
    return (
        df.withColumn("__keep", F.min("doc_id").over(w) == F.col("doc_id"))
        .filter("__keep")
        .drop("__keep")
    )


def shingles(text_col: str, k: int = SHINGLE_K) -> Column:
    """k-token shingles as an array column (empty-safe)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = NUM_PERM,
) -> DataFrame:
    """MinHash signature per doc: num_perm seeded xxhash64 permutations
    over the distinct shingle set, all computed in ONE aggregation pass
    (each permutation is an agg column → single shuffle)."""
    sh = spread(df).select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col))).alias("sh")
    )
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"p{p}|"), F.col("sh")))).alias(f"mh{p}")
        for p in range(num_perm)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id",
    bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (docs sharing any
    band). Self-join per (band_id, band_hash) bucket — quadratic only
    within buckets."""
    sig_arr = F.array(*[F.col(f"mh{p}") for p in range(bands * rows_per_band)])
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(sig_arr, b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


# --- J1: exact dedup ------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY lower(trim(text))
ORDER BY doc_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: winner doc_id + multiplicity per normalized
    text. (The engine API form — surviving full rows — is
    :func:`dedup_exact_op`; the group view is what the oracle can state
    portably, since xxhash64 has no DuckDB twin.)"""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(normalized_text())
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


# --- J2: MinHash-LSH near-dup candidates — rows-only (seeded xxhash64) ---

@register("dedup_minhash")
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash-LSH, with the estimated
    Jaccard (fraction of matching signature positions). Deterministic
    (seeded hash family) but engine-specific → rows-only check."""
    d = table(spark, sf_dir, "documents")
    sigs = minhash_signatures(d)
    cands = lsh_candidates(sigs)
    sig_arr = F.array(*[F.col(f"mh{p}") for p in range(NUM_PERM)])
    sa = sigs.select(F.col("doc_id").alias("doc_a"), sig_arr.alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), sig_arr.alias("sig_b"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(NUM_PERM))
            ).alias("est_jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --- J2-exact: n-gram Jaccard similarity (oracle-checked) ----------------

_NGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
), sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                  i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
    FROM toks WHERE len(ts) >= 3
  )
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       floor(i.i / (sa.n + sb.n - i.i) * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.i / (sa.n + sb.n - i.i) >= 0.1
ORDER BY doc_a, doc_b
"""


def ngram_jaccard_pairs(
    d: DataFrame,
    min_jaccard: float = 0.1,
    max_df: int | None = None,
) -> DataFrame:
    """Exact k-gram Jaccard pair generation over (doc_id, text): explode
    distinct shingles → self-equi-join on shingle → |A∩B| /
    (|A|+|B|−|A∩B|) ≥ min_jaccard. Returns (doc_a, doc_b, jaccard).

    ``max_df`` is THE scale knob (found empirically by the round-4 scale
    probe): the equi-join's pair space is Σ df(shingle)², so a shingle
    appearing in f documents alone contributes f² candidate rows —
    ubiquitous shingles (stopword runs, boilerplate) make the join
    quadratic in corpus size while carrying zero dedup signal (sharing
    'of the and' identifies nothing). Dropping shingles with document
    frequency > max_df bounds per-shingle fan-out, making the join
    O(corpus · max_df); Jaccard is then over the FILTERED shingle sets
    on both sides of the ratio (near-dup pairs share rare shingles, so
    recall is unaffected — this is the standard frequent-shingle
    treatment in web-dedup pipelines). None = no cap (the small-fixture
    default; the driver fixture's 31-word vocabulary makes every
    shingle frequent, so a cap there would gut the signal)."""
    sh = (
        spread(d)  # shingle transform is compute-bound; widen narrow scans
        .filter(F.size(F.split(F.lower("text"), " ")) >= 3)
        .select("doc_id", F.explode(F.array_distinct(shingles("text"))).alias("sh"))
        .distinct()
    )
    if max_df is not None:
        keep = (
            sh.groupBy("sh").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("sh")
        )
        sh = sh.join(keep, "sh")
    # round-13 (guide §4.4): the shingle tier is consumed four times
    # (sizes + both join sides + the df-cap join-back), each re-running
    # the explode + distinct; the lazy localCheckpoint folds it once
    # per run (measured 4.1 → 3.3 s steady on the capped form, and a
    # much cheaper first run). Batch-only callers.
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= min_jaccard)
        .select(
            "doc_a",
            "doc_b",
            (F.floor(jac * 10000 + 0.5) / F.lit(10000.0)).alias("jaccard"),
        )
    )


@register("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over shingle SETS, computed relationally:
    explode distinct shingles → self-equi-join on shingle → |A∩B| /
    (|A|+|B|−|A∩B|). This is the verification stage after LSH candidate
    generation; at 100 TB you run it only on candidate pairs, never
    all-pairs (the equi-join here IS the bounded version: docs sharing
    no shingle never meet) — AND with a document-frequency cap on
    shingles (see ngram_jaccard_pairs: uncapped, the join is quadratic
    in Σ df²; dedup_ngram_capped is the capped twin)."""
    d = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d).orderBy("doc_a", "doc_b")


@register(
    "dedup_ngram_capped",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                  i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
    FROM toks WHERE len(ts) >= 3
  )
), keep AS (
  SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 20
), sh AS (
  SELECT sh0.doc_id, sh0.sh FROM sh0 JOIN keep USING (sh)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       floor(i.i / (sa.n + sb.n - i.i) * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.i / (sa.n + sb.n - i.i) >= 0.5
ORDER BY doc_a, doc_b
""",
)
def dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frequency-capped Jaccard twin (max_df=20, j ≥ 0.5): the
    100 TB spelling of dedup_ngram_jaccard, differentially checked —
    the oracle applies the identical df-cap before sizing, so the
    capped SEMANTICS (Jaccard over filtered shingle sets), not just the
    mechanism, is hash-pinned. On the 31-word-vocabulary fixture the
    cap bites hard (most shingles are frequent), which makes it a sharp
    test: both engines must agree on exactly which shingles survive and
    every resulting ratio."""
    d = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, min_jaccard=0.5, max_df=20).orderBy(
        "doc_a", "doc_b"
    )


# --- J2-alt: SimHash — rows-only (xxhash64 bit algebra) ------------------

def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: per distinct token, xxhash64 → ±1 vote per
    bit position; signature bit i set iff the summed vote is positive.
    All expression-level (the 64× bit explosion over tokens is bounded
    and JVM-side; the input is spread() first — tokens × 64 bit-rows is
    the most compute-amplified path in the module and must not run on a
    single narrow scan split)."""
    tok = spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.lower(text_col), " "))).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    bits = tok.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        F.col("h"),
    ).withColumn(
        "vote",
        F.when(F.expr("(shiftright(h, bit) & 1) = 1"), 1).otherwise(-1),
    )
    return (
        bits.groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("v"))
        .withColumn("bitval", F.when(F.col("v") > 0, 1).otherwise(0))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.expr("CAST(bitval AS BIGINT) * shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("simhash")
        )
    )


SIMHASH_HAMMING_MAX = 8
# Pigeonhole banding: a pair within hamming distance h differs in at most
# h bands, so splitting the 64-bit signature into h+1 disjoint bands
# guarantees the pair agrees EXACTLY on at least one band — bucketed
# pairing finds the identical result set as all-pairs, never a subset.
# 9 bands for h=8: eight 7-bit bands + one 8-bit band.
_SIMHASH_BANDS = [(i * 7, 7) for i in range(8)] + [(56, 8)]


@register("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc + near-dup pairs at hamming distance ≤ 8.

    Per token: xxhash64 → ±1 vote per bit position; signature bit i set
    iff the summed vote is positive. All expression-level (explode over
    64 bit positions is a 64× row expansion over tokens — bounded and
    JVM-side). Pairing is BUCKETED, not all-pairs: signatures band into
    9 disjoint segments (pigeonhole: hamming ≤ 8 ⇒ at least one band
    identical, so recall vs all-pairs is exactly 1.0) and candidate
    pairs form only within (band_id, band_value) buckets — the same
    shape as :func:`lsh_candidates`, quadratic only inside buckets.
    At 100 TB, widen bands (more bits) for a lower hamming threshold to
    keep buckets small.

    Round-13 dedup-at-the-source (guide §2.3 shuffle fewer bytes): a
    close pair shares SEVERAL bands on this corpus (measured 6.5M
    joined rows deduping to 1.57M pairs), and the old `.distinct()`
    shuffled every copy. Both signatures ride the joined row, so the
    FIRST band on which ``ha ^ hb`` agrees is computable inline — each
    pair is kept exactly where ``band_id`` equals that first matching
    band and every other copy dies in the join stage, no distinct
    exchange at all. The band explode is also explicitly repartitioned
    on the bucket key: the banded frame is small enough that AQE
    coalesced the self-join to ONE task (measured 2× ~5.5 s single-task
    stages) while the join's m² bucket expansion is the expensive part
    — the user repartition pins full-width execution (scale-adaptive:
    defaultParallelism). Together 9.9 s → ~5 s warm at sf0.1,
    bit-identical output."""
    d = table(spark, sf_dir, "documents")
    sig = simhash_signatures(d)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    # arithmetic shiftright sign-extends; the width mask
                    # strips the extension bits
                    F.expr(f"shiftright(simhash, {start}) & {(1 << width) - 1}")
                    for start, width in _SIMHASH_BANDS
                ]
            )
        ).alias("band_id", "band_val"),
    )
    banded = banded.repartition(
        spark.sparkContext.defaultParallelism, "band_id", "band_val"
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"),
        "band_id", "band_val",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"),
        "band_id", "band_val",
    )
    # first band (in _SIMHASH_BANDS order) on which the two signatures
    # agree — defined for every joined row (the pair met in SOME band)
    first_band = F.when(
        F.expr(
            f"(shiftright(ha ^ hb, {_SIMHASH_BANDS[0][0]}) "
            f"& {(1 << _SIMHASH_BANDS[0][1]) - 1}) = 0"
        ),
        F.lit(0),
    )
    for _i, (_start, _width) in list(enumerate(_SIMHASH_BANDS))[1:]:
        first_band = first_band.when(
            F.expr(
                f"(shiftright(ha ^ hb, {_start}) "
                f"& {(1 << _width) - 1}) = 0"
            ),
            F.lit(_i),
        )
    pairs = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        # keep each pair exactly once: at its first shared band
        .filter(F.col("band_id") == first_band)
        .select("doc_a", "doc_b", "ha", "hb")
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )
    # un-movable sort: the band repartition is the last exchange below
    # the trailing sort, so the range sampler would re-run the whole m²
    # bucket expansion; the surviving pair set is small — fold it once
    return pairs.localCheckpoint(eager=False).orderBy("doc_a", "doc_b")


# --- J2-portable: the SAME MinHash-LSH pipeline, oracle-checked ----------
#
# The engine-path variants above use seeded xxhash64 (fastest JVM hash)
# and therefore can only be rows-only checked. These twins swap in a
# portable hash — the first 15 hex chars of md5 as a 60-bit integer,
# computable identically in Spark (conv(hex,16,10)) and DuckDB
# (CAST('0x'||hex AS BIGINT)) — so the ENTIRE pipeline (shingling →
# minhash signatures → LSH banding → candidate pairs → exact-Jaccard
# verification) is hash-parity checked end to end, not just row counts.

_PORT_PERM = 8
_PORT_BANDS = 4
_PORT_ROWS = _PORT_PERM // _PORT_BANDS
_PORT_JACCARD_MIN = 0.5


def _phash_spark(expr: str, p: int) -> str:
    """Portable 60-bit hash, Spark SQL form."""
    return (
        f"CAST(conv(substring(md5(concat('p{p}|', {expr})), 1, 15), 16, 10)"
        " AS BIGINT)"
    )


def _phash_duck(expr: str, p: int) -> str:
    """Portable 60-bit hash, DuckDB form (bit-identical to the Spark
    form — verified over the md5 hex alphabet)."""
    return f"CAST('0x' || substring(md5('p{p}|' || {expr}), 1, 15) AS BIGINT)"


_PORT_SHINGLE_CTE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
), sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                  i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
    FROM toks WHERE len(ts) >= 3
  )
)"""


def portable_pairs_cte(perm: int = _PORT_PERM, bands_n: int = _PORT_BANDS,
                       rows_n: int = _PORT_ROWS) -> str:
    """The CTE chain (no leading WITH) rebuilding the portable funnel
    in DuckDB up to ``inter``/``sizes`` — shared by the
    ``dedup_minhash_portable`` oracle, the ``t40`` capstone oracle, and
    the 16×8 production-banding twin, so every SQL twin re-derives the
    SAME funnel at its own (bands × rows) config."""
    assert bands_n * rows_n == perm
    mins = ",\n         ".join(
        f"MIN({_phash_duck('sh', p)}) AS mh{p}" for p in range(perm)
    )
    bands = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_id, {expr} AS bh FROM sigs".format(
            b=b,
            expr=" || ',' || ".join(
                f"CAST(mh{b * rows_n + r} AS VARCHAR)"
                for r in range(rows_n)
            ),
        )
        for b in range(bands_n)
    )
    return f"""{_PORT_SHINGLE_CTE.lstrip().removeprefix("WITH ")},
sigs AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
), banded AS (
{bands}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band_id = b.band_id AND a.bh = b.bh
              AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS i
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY 1, 2
)"""


def _minhash_portable_oracle() -> str:
    return f"""WITH {portable_pairs_cte()}
SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS n_common,
       floor(i.i / (sa.n + sb.n - i.i) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.i / (sa.n + sb.n - i.i) >= {_PORT_JACCARD_MIN}
ORDER BY doc_a, doc_b
"""


def _portable_minhash_query(spark: SparkSession, sf_dir: str,
                            perm: int, bands_n: int,
                            rows_n: int) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    inter = portable_neardup_pairs(d, perm, bands_n, rows_n)
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.filter(jac >= _PORT_JACCARD_MIN)
        .select(
            "doc_a",
            "doc_b",
            F.col("i").cast("bigint").alias("n_common"),
            (F.floor(jac * 10000 + 0.5) / F.lit(10000.0)).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register("dedup_minhash_portable", oracle=_minhash_portable_oracle())
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, hash-parity checked end to end:
    8 portable minhash permutations → 4 bands × 2 rows → candidate
    pairs within shared (band, value) buckets → exact Jaccard rerank
    (≥ 0.5) on candidates only.

    Scale: identical shape to the xxhash64 engine path — signatures are
    ONE aggregation over exploded distinct shingles (8 agg columns,
    map-side combined), pairing is quadratic only inside LSH buckets,
    and the exact-Jaccard join touches candidate pairs, never all
    pairs. The portable hash costs one md5 per (shingle, permutation) —
    use the xxhash64 variant in production; this twin exists so the
    pipeline's *semantics* are differentially verified."""
    return _portable_minhash_query(
        spark, sf_dir, _PORT_PERM, _PORT_BANDS, _PORT_ROWS
    )


# --- J2-prod-banding: the measured 16×8 production config ----------------

#: 16 bands × 8 rows (128 permutations) — the r11 recall sweep's
#: recommended production config (MINHASH_RECALL.json): recall 0.999 on
#: the 999 planted g1 dups with a ~4× sharper low-similarity cutoff
#: than 4×4 (collision P at j=0.5: 0.23 → 0.06) — production corpora
#: are dirtier than the fixture, so the sharper S-curve buys candidate
#: volume headroom at equal recall.
_PROD_BANDS = 16
_PROD_ROWS = 8
_PROD_PERM = _PROD_BANDS * _PROD_ROWS


def _minhash_prod_oracle() -> str:
    return f"""WITH {portable_pairs_cte(_PROD_PERM, _PROD_BANDS, _PROD_ROWS)}
SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS n_common,
       floor(i.i / (sa.n + sb.n - i.i) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.i / (sa.n + sb.n - i.i) >= {_PORT_JACCARD_MIN}
ORDER BY doc_a, doc_b
"""


@register("dedup_minhash_prod", oracle=_minhash_prod_oracle())
def dedup_minhash_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH at the PRODUCTION banding (r11 verdict #6): 128
    portable permutations → 16 bands × 8 rows → bucket-join candidates
    → exact Jaccard rerank — hash-parity checked end to end through
    the same parameterized funnel as the 4×2 twin. The banding sweep
    (scripts/minhash_recall_sweep.py, MINHASH_RECALL.json) measured
    this config at recall 0.999 / verified precision 1.0 over g1's 999
    planted dup pairs, with a 4× sharper low-similarity collision
    cutoff than the default config — fewer junk candidates per true
    pair on dirty corpora.

    Scale note: 128 aggregate columns = 16× the signature-build work of
    the 4×2 twin, all map-side combined in ONE pass over distinct
    shingles; the banding join cost DROPS vs coarser configs (r=8 rows
    per band → far fewer false bucket collisions)."""
    return _portable_minhash_query(
        spark, sf_dir, _PROD_PERM, _PROD_BANDS, _PROD_ROWS
    )


def portable_neardup_pairs(d: DataFrame, perm: int = _PORT_PERM,
                           bands_n: int = _PORT_BANDS,
                           rows_n: int = _PORT_ROWS) -> DataFrame:
    """The portable-md5 MinHash-LSH candidate funnel with exact-Jaccard
    verification numbers attached: shingling → ``perm`` portable
    minhash permutations → ``bands_n × rows_n`` LSH bands → bucket-join
    candidates → shingle intersection counts. Returns
    ``(doc_a, doc_b, i, na, nb)`` — callers apply their own Jaccard
    threshold (``i/(na+nb-i)``). Shared by ``dedup_minhash_portable``
    (4×2), ``dedup_minhash_prod`` (16×8, the measured production
    config) and the ``t40`` near-dup pipeline capstone, so every
    differential exercises ONE code path.

    Round-13 (guide §2.5 input skew / the repo's round-4 spread rule):
    the documents scan is ONE split at bench SFs, so the ``perm`` md5
    permutation hashes per shingle occurrence — the funnel's dominant
    CPU (measured 31 s of dedup_minhash_prod's 37 s at sf0.1) — ran on
    one core with 31 idle. ``spread()`` round-robins the narrow doc
    rows to full parallelism before shingling/hashing (31 s → 3.3 s);
    it is a no-op at production split counts. A
    hash-per-DISTINCT-shingle + join-back spelling was also measured
    (10× fewer md5 calls on this Zipf corpus) and does NOT win once
    parallelism is fixed (3.8 s vs 3.3 s — the extra shuffle offsets
    the saved CPU); kept the join-free shape."""
    assert bands_n * rows_n == perm
    sh = (
        spread(d.filter(F.size(F.split(F.lower("text"), " ")) >= 3))
        .select("doc_id", F.explode(F.array_distinct(shingles("text"))).alias("sh"))
    )
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(F.expr(_phash_spark("sh", p))).alias(f"mh{p}")
            for p in range(perm)
        ]
    )
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{b * rows_n + r}").cast("string")
                            for r in range(rows_n)
                        ],
                    )
                    for b in range(bands_n)
                ]
            )
        ).alias("band_id", "bh"),
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band_id", "bh")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band_id", "bh")
    pairs = (
        a.join(b, ["band_id", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        pairs.join(sha, "doc_a")
        .join(shb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )


# --- J2-alt-portable: 16-bit SimHash signatures, oracle-checked ----------

_SIM_PORT_BITS = 16


def _simhash_portable_oracle() -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(_SIM_PORT_BITS)
    )
    sig = "\n         + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_SIM_PORT_BITS)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
  )
), h AS (
  SELECT doc_id, {_phash_duck('tok', 0)} AS h FROM tok
), v AS (
  SELECT doc_id,
         {votes}
  FROM h GROUP BY doc_id
)
SELECT doc_id,
       CAST({sig} AS BIGINT) AS simhash16
FROM v ORDER BY doc_id
"""


@register("dedup_simhash_portable", oracle=_simhash_portable_oracle())
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signature per document with the portable hash —
    the full bit pipeline (token hash → per-bit ±1 votes → sign →
    packed signature) is hash-parity checked against DuckDB. The 64-bit
    engine variant (:func:`dedup_simhash`) adds pigeonhole-banded
    pairing; its recall is pinned by a planted-duplicate test, while
    THIS twin pins the signature arithmetic itself.

    Scale: one explode over distinct tokens, one hash agg with 16
    SUM columns (map-side combined), one projection. No joins."""
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("tok"),
        )
        .withColumn("h", F.expr(_phash_spark("tok", 0)))
    )
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h DIV {1 << j}) % 2 = 1"), 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(_SIM_PORT_BITS)
        ]
    )
    sig = None
    for j in range(_SIM_PORT_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return (
        votes.select("doc_id", sig.cast("bigint").alias("simhash16"))
        .orderBy("doc_id")
    )
