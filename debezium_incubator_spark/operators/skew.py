"""Skew-handling helpers (SURVEY.md §4.3 "100 TB posture").

AQE's skew-join splitting (on in session defaults) handles most runtime
skew; these helpers are the explicit tools for the cases AQE can't see:
a hot key known in advance (celebrity user, null-heavy FK) in a join
AQE won't re-plan (e.g. already-broadcast exchange reuse, streaming).

Pattern: SALT the skewed side (append random salt 0..n-1 to the key) and
EXPLODE the other side (replicate each row n times, one per salt) — the
hot key's rows spread over n partitions instead of one straggler task.
Aggregations use two-phase salting instead: partial agg on (key, salt),
final agg on key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side exploded.

    Cost: the other side is replicated n_salts× — use only when the
    other side is much smaller than the skew penalty (or restrict
    salting to the known-hot keys and union with a plain join for the
    rest). Deterministic salt via xxhash64 of a per-row unique-ish tuple
    (not rand(): resumable & test-stable).
    """
    salted = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)),
    )
    exploded = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted.join(exploded, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame, key: str, aggs: list, n_salts: int = 8
) -> DataFrame:
    """Skew-proof aggregation: partial agg on (key, salt), final on key.

    ``aggs``: list of (col_expr_str, partial_fn_name, final_fn_name,
    alias) — e.g. ("value", "sum", "sum", "total"). Catalyst's own
    partial aggregation usually makes this unnecessary; it matters for
    aggregates without map-side combine (exact distinct via sets,
    collect_list) over hot keys.
    """
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )
    partial = salted.groupBy(key, "__salt").agg(
        *[
            getattr(F, pfn)(c).alias(f"__p_{alias}")
            for c, pfn, _ffn, alias in aggs
        ]
    )
    final = partial.groupBy(key).agg(
        *[
            getattr(F, ffn)(f"__p_{alias}").alias(alias)
            for _c, _pfn, ffn, alias in aggs
        ]
    )
    return final
