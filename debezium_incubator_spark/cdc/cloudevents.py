"""CloudEvents converter — public Debezium's ``CloudEventsConverter``
(reconstructed per SURVEY.md §0 from the public Debezium docs and the
CNCF CloudEvents 1.0 spec, JSON binary-mode mapping).

Debezium can emit each change event wrapped in a CloudEvents envelope:
required context attributes ``specversion``/``id``/``source``/``type``,
optional ``time`` + ``datacontenttype``, the connector's own fields as
``iodebezium…`` extension attributes, and the change payload under
``data``. Consumers that speak CloudEvents (Knative, EventBridge-style
routers) then handle CDC traffic without knowing Debezium's envelope.

Spark mapping: encode is one ``to_json(struct(...))`` — JVM-side,
zero shuffle; decode is ``from_json`` with an explicit schema plus a
loud specversion gate (an unversioned or future-majored event must not
silently parse as 1.0). Both directions are per-record expressions —
the converter adds no scale cost at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

CE_SPECVERSION = "1.0"
CE_CONTENTTYPE = "application/json"


def to_cloudevents(
    df: DataFrame,
    source: str,
    ce_type: str,
    id_col: Column,
    time_col: Column,
    op_col: Column,
    data: Column,
    out_col: str = "ce",
) -> DataFrame:
    """Wrap each row in a CloudEvents 1.0 JSON envelope (binary-mode
    JSON mapping): ``id`` is ``<source-suffix>-<id_col>`` per Debezium's
    unique-per-stream contract, ``time`` the UTC ISO-8601 instant,
    ``iodebeziumop`` the op extension attribute, ``data`` the payload
    struct verbatim."""
    suffix = source.rsplit("/", 1)[-1]
    env = F.struct(
        F.lit(CE_SPECVERSION).alias("specversion"),
        F.concat(F.lit(suffix + "-"), id_col.cast("string")).alias("id"),
        F.lit(source).alias("source"),
        F.lit(ce_type).alias("type"),
        F.lit(CE_CONTENTTYPE).alias("datacontenttype"),
        F.date_format(time_col.cast("timestamp"),
                      "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("time"),
        op_col.alias("iodebeziumop"),
        data.alias("data"),
    )
    return df.withColumn(out_col, F.to_json(env))


def from_cloudevents(
    df: DataFrame,
    data_schema: str,
    ce_col: str = "ce",
    out_col: str = "event",
) -> DataFrame:
    """Parse CloudEvents JSON back into a typed struct. The specversion
    gate raises on anything but 1.0 IN THE SAME SELECT that still sees
    the parsed struct (a later filter could be reordered around the
    error by the optimizer); a missing/NULL specversion fails too —
    CloudEvents requires the attribute.

    round-13 (guide §4.4 duplicated-evaluation class, for expressions):
    the gate used to inline ``from_json`` into BOTH the WHEN condition
    and the THEN branch — conditional branches defeat codegen
    subexpression elimination, and the condition's copy gets
    schema-pruned to specversion-only, so every row paid TWO full
    JSON text parses (the pruned parse still scans the whole string).
    Parsing once into its own projection (``from_json`` is non-cheap,
    so CollapseProject keeps it materialized) leaves ONE JsonToStructs
    in the optimized plan — measured 1.4 s → 1.0 s warm at sf0.1, and
    the parse IS this operator's whole cost at any scale."""
    schema = (
        "struct<specversion string, id string, source string, "
        "type string, datacontenttype string, time string, "
        f"iodebeziumop string, data {data_schema}>"
    )
    # temp-column name derived from out_col and checked absent: this is
    # a public seam taking arbitrary frames — a fixed name would
    # silently clobber a caller column (r13 ADVICE)
    tmp = f"__{out_col}_ce_parsed"
    if tmp in df.columns:
        raise ValueError(
            f"from_cloudevents: temp column {tmp!r} already exists in "
            "the input frame — rename it or pass a different out_col"
        )
    parsed_df = df.withColumn(tmp, F.from_json(F.col(ce_col), schema))
    parsed = F.col(tmp)
    gated = F.when(
        parsed["specversion"] == CE_SPECVERSION, parsed
    ).otherwise(
        F.raise_error(F.concat(
            F.lit("unsupported CloudEvents specversion: "),
            F.coalesce(parsed["specversion"], F.lit("<missing>")),
        ))
    )
    return parsed_df.withColumn(out_col, gated).drop(tmp)


@register(
    "cdc_cloudevents_wire",
    oracle="""
SELECT event_id,
       'events-' || CAST(event_id AS VARCHAR) AS ce_id,
       '/debezium/spark/events' AS ce_source,
       'io.debezium.spark.events.DataChangeEvent' AS ce_type,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ce_time,
       CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
            WHEN 'view' THEN 'r' ELSE 'u' END AS op,
       user_id AS user_id_rt
FROM events
ORDER BY event_id
""",
)
def cdc_cloudevents_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CloudEvents round-trip, differentially proven: events are wrapped
    by to_cloudevents (real to_json), parsed back by from_cloudevents
    (real from_json + specversion gate), and every extracted attribute —
    id construction, source/type constants, the UTC time render, the op
    extension, the data payload — must equal the oracle's direct
    derivation from the source rows. Hash parity proves the envelope is
    lossless and the attribute encoders agree cross-engine; the JSON
    bytes themselves are engine formatting and deliberately not the
    compared surface."""
    from .envelope import OP_CASE

    # sort the NARROW input, project above it: a global orderBy above
    # this shuffle-free to_json/from_json chain makes the range
    # partitioner's sample job re-execute the whole chain (the t45
    # finding, SCALE.md round-9) — measured 30 s -> ~3 s at g1
    ev = table(spark, sf_dir, "events").orderBy("event_id")
    wrapped = to_cloudevents(
        ev,
        source="/debezium/spark/events",
        ce_type="io.debezium.spark.events.DataChangeEvent",
        id_col=F.col("event_id"),
        time_col=F.col("ts"),
        op_col=F.expr(OP_CASE),
        data=F.struct(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("event_id"),
        ),
    )
    parsed = from_cloudevents(
        wrapped.select("event_id", "ce"),
        "struct<user_id bigint, event_id bigint>",
    )
    e = F.col("event")
    return parsed.select(
        "event_id",
        e["id"].alias("ce_id"),
        e["source"].alias("ce_source"),
        e["type"].alias("ce_type"),
        e["time"].alias("ce_time"),
        e["iodebeziumop"].alias("op"),
        e["data"]["user_id"].alias("user_id_rt"),
    )
