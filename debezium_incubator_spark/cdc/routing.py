"""Routing SMTs (SURVEY.md §2B B4/B5/B6/B9) — Debezium's Kafka Connect
single-message-transform surface, re-expressed as declarative column
operations. Reconstructed per SURVEY.md §0 ([D] rows; no SMT source
exists in the archived checkout).

Scale: all per-record projections — zero shuffle; the routed topic/key
column rides to the Kafka sink (sinks.py) which fans records out by the
`topic` column natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .envelope import OP_CASE


def content_based_router(
    df: DataFrame, rules: list[tuple[Column, str]], default: str
) -> DataFrame:
    """B4 ContentBasedRouter: pick a destination topic per record from
    boolean expressions (first match wins), like the scripting SMT."""
    expr = None
    for cond, topic in rules:
        expr = F.when(cond, topic) if expr is None else expr.when(cond, topic)
    expr = expr.otherwise(default) if expr is not None else F.lit(default)
    return df.withColumn("topic", expr)


def logical_table_router(
    df: DataFrame, topic_col: str, pattern: str, replacement: str
) -> DataFrame:
    """B5 ByLogicalTableRouter: regex-rewrite topic names to merge
    sharded physical tables into one logical topic."""
    return df.withColumn(topic_col, F.regexp_replace(F.col(topic_col), pattern, replacement))


def outbox_event_router(
    outbox: DataFrame,
    aggregate_id: str = "aggregateid",
    aggregate_type: str = "aggregatetype",
    payload: str = "payload",
    topic_prefix: str = "outbox.event.",
    expand_schema=None,
) -> DataFrame:
    """B6 Outbox EventRouter: route rows of an outbox table to
    per-aggregate topics, keyed by the aggregate id.

    ``expand_schema`` enables the SMT's ``table.expand.json.payload``
    option: the JSON-string payload parses into a typed struct value
    (consumers get columns, not a blob). A DDL string or StructType —
    explicit by policy, same as every other schema in this engine;
    Debezium likewise expands against the registered schema, never by
    sniffing."""
    value = F.col(payload)
    if expand_schema is not None:
        value = F.from_json(value.cast("string"), expand_schema)
    return outbox.select(
        F.col(aggregate_id).cast("string").alias("key"),
        value.alias("value"),
        F.concat(F.lit(topic_prefix), F.col(aggregate_type)).alias("topic"),
    )


def rekey(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """B9 message.key.columns: override the record key (and therefore
    the partitioning) — pair with repartition on the new key when the
    downstream operator needs co-location."""
    return df.withColumn("key", F.struct(*key_cols))


# --- oracle-checked queries exercising the routers ------------------------

@register(
    "route_content_based",
    oracle="""
SELECT event_id, event_type,
       CASE WHEN event_type = 'error' THEN 'alerts'
            WHEN event_type = 'purchase' AND value > 400 THEN 'bigspend'
            WHEN event_type IN ('click', 'view') THEN 'clickstream'
            ELSE 'other' END AS topic
FROM events
ORDER BY event_id
""",
)
def route_content_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    routed = content_based_router(
        ev,
        [
            (F.col("event_type") == "error", "alerts"),
            ((F.col("event_type") == "purchase") & (F.col("value") > 400), "bigspend"),
            (F.col("event_type").isin("click", "view"), "clickstream"),
        ],
        default="other",
    )
    return routed.select("event_id", "event_type", "topic").orderBy("event_id")


@register(
    "route_logical_table",
    oracle="""
SELECT DISTINCT
       regexp_replace('srv1.shard_' || CAST(user_id % 8 AS VARCHAR) || '.events',
                      'shard_[0-9]+', 'shards', 'g') AS topic,
       user_id % 8 AS shard
FROM events
ORDER BY shard
""",
)
def route_logical_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: merge per-shard topics (srv1.shard_N.events) into one logical
    topic — the consumer-side union of a sharded capture."""
    ev = table(spark, sf_dir, "events").withColumn(
        "topic",
        F.concat(
            F.lit("srv1.shard_"),
            (F.col("user_id") % 8).cast("string"),
            F.lit(".events"),
        ),
    ).withColumn("shard", F.col("user_id") % 8)
    routed = logical_table_router(ev, "topic", "shard_[0-9]+", "shards")
    return routed.select("topic", "shard").distinct().orderBy("shard")


@register(
    "route_outbox",
    oracle="""
SELECT CAST(user_id AS VARCHAR) AS key,
       props AS value,
       'outbox.event.' ||
       CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
            WHEN 'view' THEN 'r' ELSE 'u' END AS topic
FROM events
ORDER BY CAST(user_id AS VARCHAR), value, topic
""",
)
def route_outbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: events as an outbox table — aggregateid=user_id,
    aggregatetype=op class, payload=props JSON."""
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("aggregateid"),
        F.expr(OP_CASE).alias("aggregatetype"),
        F.col("props").alias("payload"),
    )
    return outbox_event_router(ev).orderBy("key", "value", "topic")


@register(
    "route_outbox_expand",
    oracle="""
SELECT CAST(user_id AS VARCHAR) AS key,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       'outbox.event.' ||
       CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
            WHEN 'view' THEN 'r' ELSE 'u' END AS topic
FROM events
ORDER BY CAST(user_id AS VARCHAR), k, topic
""",
)
def route_outbox_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 + ``table.expand.json.payload=true``: the payload JSON blob
    expands into a typed struct; the oracle re-extracts the same field
    straight from the source JSON — equality proves the expansion is
    lossless typing, not reformatting."""
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("aggregateid"),
        F.expr(OP_CASE).alias("aggregatetype"),
        F.col("props").alias("payload"),
    )
    routed = outbox_event_router(ev, expand_schema="k INT")
    return routed.select(
        "key", F.col("value.k").alias("k"), "topic"
    ).orderBy("key", "k", "topic")


def default_topic_name(env: DataFrame,
                       topic_prefix: str) -> DataFrame:
    """Debezium's default topic naming (``topic.prefix`` config):
    every change event publishes to ``{prefix}.{db}.{table}`` derived
    from the envelope's source block — one expression-level concat, the
    input the routing SMTs above then rewrite."""
    return env.withColumn(
        "topic",
        F.concat_ws(".", F.lit(topic_prefix),
                    F.col("value.source.db"),
                    F.col("value.source.table")),
    )
