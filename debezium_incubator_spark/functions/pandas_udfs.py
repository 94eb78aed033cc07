"""Pandas-UDF surface (SURVEY.md §2K): the Arrow-vectorized escape hatch,
each kind demonstrated with an oracle-checked query.

K1 (row-at-a-time Python UDF) is deliberately absent — it is never the
right tool (serde per row, no vectorization); everything here moves
whole Arrow batches.

Scale: pandas UDFs stream Arrow batches through worker processes —
constant memory, no driver involvement; applyInPandas shuffles once on
the group key and requires each GROUP to fit in a worker's memory (per
user histories here: fine; unbounded groups must pre-bucket).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


# --- K1: row-at-a-time Python UDF (the documented anti-pattern) ----------

def slug_udf():
    def _slug(lang, source):
        return f"{lang}/{source}".lower()

    return F.udf(_slug, "string")


@register(
    "k1_scalar_udf",
    oracle="""
SELECT doc_id, lower(lang || '/' || source) AS slug
FROM documents
ORDER BY doc_id
""",
)
def k1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 exists to complete the UDF matrix and to measure WHY it is
    last-resort: each row round-trips driver-pickled Python
    (serialize → interpret → deserialize, no Arrow batching, breaks
    codegen). The expression twin is lower(concat_ws('/', ...)). Never
    on a 100 TB hot path — use built-ins (H-families) or pandas UDFs
    (K2) instead."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", slug_udf()("lang", "source").alias("slug")
    ).orderBy("doc_id")


# --- K2: scalar (vectorized) pandas UDF ----------------------------------
# NOTE: @pandas_udf parses its return type through the active session, so
# UDFs are constructed lazily inside the query functions (module import
# must not require a SparkContext — the driver imports the registry
# before building its session).

def token_count_udf():
    @F.pandas_udf("int")
    def _udf(text: pd.Series) -> pd.Series:
        return text.str.split(" ").str.len().astype("int32")

    return _udf


@register(
    "k2_pandas_scalar",
    oracle="""
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
FROM documents
ORDER BY doc_id
""",
)
def k2_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF vs the expression twin: identical results, but
    the expression (size(split(...))) stays in codegen — the UDF exists
    to prove the Arrow path, not to replace built-ins (SURVEY.md §2K)."""
    d = table(spark, sf_dir, "documents")
    # round-13 sort-narrow-first: sort the raw input, evaluate the UDF
    # ABOVE the sort — otherwise the range sampler re-executes the
    # Arrow round-trip a second time (guide §4.4's duplicated-eval
    # class, sampler flavor).
    return (
        d.select("doc_id", "text")
        .orderBy("doc_id")
        .select("doc_id", token_count_udf()("text").alias("n_tokens"))
    )


# --- K3: grouped-map applyInPandas (as-of join via merge_asof) -----------

@register(
    "k3_asof_grouped_map",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     j AS (
       SELECT p.event_id AS purchase_id, p.user_id,
              c.event_id AS click_id,
              row_number() OVER (PARTITION BY p.event_id
                                 ORDER BY c.ts DESC, c.event_id DESC) AS rn
       FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
     )
SELECT purchase_id, user_id, click_id
FROM j WHERE rn = 1
ORDER BY purchase_id
""",
)
def k3_asof_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join as applyInPandas + pd.merge_asof — the SURVEY.md §4.3
    alternative to the relational rank formulation (join_asof), sharing
    its oracle semantics. Preferable at scale when per-key histories are
    long (merge_asof is O(n log n) per group vs the join's row
    expansion).

    Round-13 (guide §4.5 — amortize per-call overhead): grouping
    directly by user_id invoked the Python function once per user
    (~15k calls at sf0.1, each paying pandas slicing + merge_asof fixed
    cost on a handful of rows — measured ~25 s to the noop sink).  The
    grouped-map now keys on a DETERMINISTIC coarse bucket
    (pmod(xxhash64(user_id), 4 × defaultParallelism) — guide §2.5:
    derived hash, never rand()) and lets ``pd.merge_asof(by="user_id")``
    vectorize the per-user backward search across every user in the
    bucket in ONE call.  Rows are identical (same per-user semantics,
    same tie-break: clicks sorted by (ts, event_id), backward pick takes
    the LAST in frame order = max event_id).  Bucket count scales with
    the cluster (4 × defaultParallelism → 128 locally, tens of
    thousands on a real cluster), keeping per-call batches fat at any
    scale.  Measured 25 s → ~2 s; still the applyInPandas grouped-map
    operator end to end."""
    ev = table(spark, sf_dir, "events")
    n_buckets = 4 * spark.sparkContext.defaultParallelism
    both = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id", "event_id", "ts", "event_type"
    ).withColumn("b", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)))

    def asof(pdf: pd.DataFrame) -> pd.DataFrame:
        p = (
            pdf[pdf.event_type == "purchase"]
            .sort_values(["ts", "event_id"])
            .rename(columns={"event_id": "purchase_id"})
        )
        # merge_asof picks the last row ≤ ts; sort clicks by (ts, event_id)
        # so ties resolve to the max event_id, matching the rank oracle.
        c = (
            pdf[pdf.event_type == "click"]
            .sort_values(["ts", "event_id"])
            .rename(columns={"event_id": "click_id", "ts": "c_ts"})
        )
        if p.empty or c.empty:
            return pd.DataFrame(columns=["purchase_id", "user_id", "click_id"])
        m = pd.merge_asof(
            p[["purchase_id", "user_id", "ts"]],
            c[["click_id", "user_id", "c_ts"]],
            left_on="ts",
            right_on="c_ts",
            by="user_id",
            direction="backward",
        )
        m = m.dropna(subset=["click_id"])
        return pd.DataFrame(
            {
                "purchase_id": m.purchase_id.astype("int64"),
                "user_id": m.user_id.astype("int64"),
                "click_id": m.click_id.astype("int64"),
            }
        )

    # round-13: lazy localCheckpoint before the global sort — the range
    # sampler otherwise re-executes the whole Python grouped-map a
    # second time (measured as two ~1 s FlatMapGroupsInPandas stages
    # per run; the k4 fix applied to the grouped-map shape).
    return (
        both.groupBy("b")
        .applyInPandas(asof, "purchase_id LONG, user_id LONG, click_id LONG")
        .localCheckpoint(eager=False)
        .orderBy("purchase_id")
    )


# --- K4: grouped-aggregate pandas UDF ------------------------------------

def mean_udf():
    @F.pandas_udf("double")
    def _mean(v: pd.Series) -> float:
        # Fixed-point mean (engine parity policy): quantize to 4dp ints,
        # integer-sum (exact, order-free), then two double divisions in
        # the same association as the oracle SQL — bit-identical across
        # engines, immune to the ROUND(,4) boundary flips a naive
        # float mean hits at scale (seen at sf0.1: 46.99625 halfway case).
        import numpy as np

        q = np.floor(v.to_numpy(dtype="float64") * 10000 + 0.5).astype("int64")
        # round-to-4dp via floor(x+0.5) — ROUND() tie rules differ between
        # engines exactly when S/n lands on a binary-exact half; floor on
        # the identical double is deterministic on both.
        units = float(q.sum()) / len(q)
        import math

        return math.floor(units + 0.5) / 10000.0

    return _mean


def count_udf():
    @F.pandas_udf("long")
    def _count(v: pd.Series) -> int:
        return int(len(v))

    return _count


@register(
    "k4_grouped_agg",
    oracle="""
SELECT user_id,
       floor(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT))
             / CAST(COUNT(*) AS DOUBLE) + 0.5) / 10000.0 AS avg_value,
       COUNT(*) AS n
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def k4_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDFs (mean + count per group) vs AVG/COUNT
    oracle — parity via round(4); per-group values ≤500 keep drift
    ~1e-13. Note: grouped-agg pandas UDFs cannot mix with JVM aggregates
    in one agg(), so count is a pandas UDF here too."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        mean_udf()("value").alias("avg_value"),
        count_udf()("value").alias("n"),
    )
    # round-13: the global sort's range sampler re-executed the whole
    # Python grouped-agg a second time (measured as two ~0.9 s
    # AggregateInPandas stages per run); the sort can't move below a
    # per-group aggregate, so the lazy localCheckpoint materializes
    # the 1.5k-row result once and the sampler reads memory.
    return agg.localCheckpoint(eager=False).orderBy("user_id")
