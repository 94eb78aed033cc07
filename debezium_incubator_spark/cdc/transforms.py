"""Record-shaping SMTs beyond the routing family: PartitionRouting,
HeaderToValue, TimezoneConverter, and the Debezium temporal wire types
(``io.debezium.time.*``). Reconstructed per SURVEY.md §0 from the public
Debezium SMT / data-type documentation (the archived checkout has no SMT
source).

Scale posture: every transform here is a per-record column expression —
zero shuffle, whole-stage-codegen eligible, riding whatever partitioning
the surrounding plan already has. PartitionRouting in particular exists
so the SINK controls placement without a Spark-side repartition: the
computed ``__partition`` column is metadata the Kafka writer consumes,
not a clustering the engine must move data for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# PartitionRouting SMT (public Debezium io.debezium.transforms.partitions.
# PartitionRouting: partition.payload.fields + partition.topic.num)
# ---------------------------------------------------------------------------


def _portable_hash(cols: list[Column]) -> Column:
    """60-bit md5-derived hash over '|'-joined field renders — the same
    portable construction the dedup twins use (llm/dedup.py), computable
    bit-identically in DuckDB as
    ``CAST('0x' || substring(md5('pr|' || ...), 1, 15) AS BIGINT)``."""
    joined = F.concat_ws("|", *[c.cast("string") for c in cols])
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("pr|"), joined)), 1, 15), 16, 10
    ).cast("bigint")


def partition_routing(
    df: DataFrame,
    payload_fields: list[str],
    partition_count: int,
    hash: str = "xxhash64",
    out_col: str = "__partition",
) -> DataFrame:
    """PartitionRouting SMT: pin each event's sink partition to a hash
    of the declared payload fields modulo ``partition.topic.num`` — the
    Debezium answer to "all events of one entity must land in one
    partition even when the record key differs".

    ``hash="xxhash64"`` is the engine path (JVM, codegen);
    ``hash="portable"`` swaps in the md5-60-bit hash so the assignment
    is differentially checkable against DuckDB. Both are stable across
    runs/restarts — a rebalance never moves an entity's partition unless
    ``partition_count`` changes (Debezium documents the same contract).
    """
    cols = [F.col(c) for c in payload_fields]
    if hash == "portable":
        h = _portable_hash(cols)
    else:
        h = F.xxhash64(*cols)
    # pmod: xxhash64 is signed — Java's abs-then-mod and pmod agree for
    # every value except Long.MIN_VALUE, which pmod handles and abs
    # overflows on (we keep the well-defined form)
    return df.withColumn(
        out_col, F.pmod(h, F.lit(partition_count)).cast("int")
    )


@register(
    "cdc_partition_routing",
    oracle="""
SELECT event_id,
       CAST(CAST('0x' || substring(
              md5('pr|' || CAST(user_id AS VARCHAR) || '|' || event_type),
              1, 15) AS BIGINT) % 16 AS INT) AS partition
FROM events
ORDER BY event_id
""",
)
def cdc_partition_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PartitionRouting over the events stream: entity = (user_id,
    event_type), 16 sink partitions, portable hash so DuckDB recomputes
    the exact assignment. Hash parity proves the SMT's placement
    function, not just its shape."""
    ev = table(spark, sf_dir, "events")
    routed = partition_routing(
        ev, ["user_id", "event_type"], 16, hash="portable",
        out_col="partition",
    )
    return routed.select("event_id", "partition").orderBy("event_id")


# ---------------------------------------------------------------------------
# HeaderToValue SMT (public Debezium io.debezium.transforms.HeaderToValue:
# headers / fields / operation = move | copy)
# ---------------------------------------------------------------------------


def header_to_value(
    df: DataFrame,
    headers: list[str],
    fields: list[str] | None = None,
    operation: str = "move",
    headers_col: str = "headers",
) -> DataFrame:
    """HeaderToValue SMT: lift named record headers into value fields.
    ``operation="copy"`` keeps the headers; ``"move"`` also removes them
    from the header map (``map_filter`` — expression-level, no UDF).
    ``fields`` renames the targets (defaults to the header names with
    dots flattened, the SMT's convention). A header absent on a record
    surfaces as NULL, exactly like the Connect SMT."""
    if operation not in ("move", "copy"):
        raise ValueError(f"operation must be move|copy, got {operation!r}")
    fields = fields or [h.replace(".", "_") for h in headers]
    if len(fields) != len(headers):
        raise ValueError("headers and fields must have equal length")
    out = df
    for h, f_ in zip(headers, fields):
        out = out.withColumn(f_, F.col(headers_col)[h])
    if operation == "move":
        moved = headers
        out = out.withColumn(
            headers_col,
            F.map_filter(F.col(headers_col), lambda k, _: ~k.isin(moved)),
        )
    return out


@register(
    "cdc_header_to_value",
    oracle="""
SELECT event_id,
       CAST(event_id AS VARCHAR) AS corr,
       event_type AS src,
       'trace' AS remaining
FROM events
ORDER BY event_id
""",
)
def cdc_header_to_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HeaderToValue round-trip: synthesize a 3-key header map per
    record, MOVE two of them into value fields, and show exactly the
    untouched key survives in the map. The oracle recomputes the moved
    values from the source columns — equality proves the map lookup and
    the map_filter removal both did precisely what the SMT contract
    says."""
    ev = table(spark, sf_dir, "events").withColumn(
        "headers",
        F.create_map(
            F.lit("corr"), F.col("event_id").cast("string"),
            F.lit("src"), F.col("event_type"),
            F.lit("trace"), F.lit("t-1"),
        ),
    )
    lifted = header_to_value(ev, ["corr", "src"], operation="move")
    return lifted.select(
        "event_id",
        "corr",
        "src",
        F.array_join(F.array_sort(F.map_keys("headers")), ",").alias(
            "remaining"
        ),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# TimezoneConverter SMT (public Debezium io.debezium.transforms.
# TimezoneConverter: converted.timezone + include/exclude field lists)
# ---------------------------------------------------------------------------


def timezone_converter(
    df: DataFrame,
    target_tz: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    source_tz: str = "UTC",
) -> DataFrame:
    """TimezoneConverter SMT: rewrite temporal column VALUES from the
    connector's timezone (Debezium emits UTC) to a target zone — the
    wall-clock form downstream consumers in one business timezone want.
    Applies to every timestamp-typed column, scoped by ``include`` /
    ``exclude`` name lists like the SMT's field selectors. DST is
    handled by the IANA zone rules (``convert_timezone`` is
    instant-correct, not a fixed offset)."""
    cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    ]
    if include is not None:
        cols = [c for c in cols if c in include]
    if exclude is not None:
        cols = [c for c in cols if c not in exclude]
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.convert_timezone(
                F.lit(source_tz), F.lit(target_tz),
                F.col(c).cast("timestamp_ntz"),
            ),
        )
    return out


@register(
    "cdc_timezone_convert",
    oracle="""
SELECT event_id,
       timezone('America/Chicago', timezone('UTC', ts)) AS chicago_wall,
       CAST((epoch_us(timezone('America/Chicago', timezone('UTC', ts)))
             - epoch_us(ts)) / 60000000 AS BIGINT) AS chicago_offset_min,
       timezone('Asia/Kolkata', timezone('UTC', ts)) AS kolkata_wall
FROM events
ORDER BY event_id
""",
)
def cdc_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimezoneConverter differential: UTC event times rendered as
    Chicago and Kolkata wall clocks (one DST zone, one half-hour-offset
    zone), plus the realized offset in minutes recomputed from epoch
    arithmetic — both engines apply their own IANA rules, so equality
    proves instant-correct conversion, not string formatting."""
    ev = table(spark, sf_dir, "events")
    chi = timezone_converter(ev, "America/Chicago", include=["ts"])
    kol = timezone_converter(ev, "Asia/Kolkata", include=["ts"])
    wall = chi.select("event_id", F.col("ts").alias("chicago_wall"))
    kwall = kol.select("event_id", F.col("ts").alias("kolkata_wall"))
    base = ev.select("event_id", "ts")
    return (
        base.join(wall, "event_id")
        .join(kwall, "event_id")
        .select(
            "event_id",
            "chicago_wall",
            (
                (
                    F.unix_micros(F.col("chicago_wall").cast("timestamp"))
                    - F.unix_micros(F.col("ts").cast("timestamp"))
                )
                / 60_000_000
            ).cast("bigint").alias("chicago_offset_min"),
            "kolkata_wall",
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Temporal wire types (public Debezium io.debezium.time.* — the adaptive
# time.precision.mode encodings plus the Connect-mode millisecond form)
# ---------------------------------------------------------------------------


EPOCH_DATE = "1970-01-01"


def to_wire_date(col: Column) -> Column:
    """``io.debezium.time.Date``: days since epoch as INT32 — the
    adaptive wire form of a DATE column."""
    return F.datediff(col.cast("date"), F.lit(EPOCH_DATE).cast("date")).cast(
        "int"
    )


def from_wire_date(col: Column) -> Column:
    """Decode ``io.debezium.time.Date`` back to a date."""
    return F.date_add(F.lit(EPOCH_DATE).cast("date"), col)


def to_wire_micro_timestamp(col: Column) -> Column:
    """``io.debezium.time.MicroTimestamp``: epoch microseconds as INT64
    (``time.precision.mode=adaptive_time_microseconds``)."""
    return F.unix_micros(col.cast("timestamp"))


def from_wire_micro_timestamp(col: Column) -> Column:
    """Decode MicroTimestamp to a timestamp."""
    return F.timestamp_micros(col)


def to_wire_connect_timestamp(col: Column) -> Column:
    """``org.apache.kafka.connect.data.Timestamp``: epoch MILLIseconds
    as INT64 — ``time.precision.mode=connect`` trades sub-ms precision
    for Connect-native types (the documented lossy mode)."""
    return F.unix_millis(col.cast("timestamp"))


def to_wire_zoned_timestamp(col: Column) -> Column:
    """``io.debezium.time.ZonedTimestamp``: ISO-8601 string in UTC —
    the wire form for timezone-aware source columns."""
    return F.date_format(
        col.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )


@register(
    "cdc_temporal_wire",
    oracle="""
SELECT o_orderkey,
       CAST(date_diff('day', DATE '1970-01-01',
                      CAST(o_orderdate AS DATE)) AS INT) AS wire_days,
       epoch_us(o_orderdate) AS wire_micros,
       epoch_ms(o_orderdate) AS wire_millis,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS wire_zoned,
       CAST(DATE '1970-01-01'
            + CAST(date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS INT)
            AS TIMESTAMP) AS date_rt,
       make_timestamp(epoch_us(o_orderdate)) AS ts_rt
FROM orders
ORDER BY o_orderkey
""",
)
def cdc_temporal_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adaptive temporal wire encodings round-tripped: DATE → epoch
    days (io.debezium.time.Date), TIMESTAMP → epoch micros
    (MicroTimestamp) and epoch millis (Connect mode), plus the
    ZonedTimestamp UTC render — then decoded back and emitted alongside,
    so hash parity proves encode AND decode are exact inverses on both
    engines' epoch arithmetic."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    days = to_wire_date(d)
    micros = to_wire_micro_timestamp(d)
    return o.select(
        "o_orderkey",
        days.alias("wire_days"),
        micros.alias("wire_micros"),
        to_wire_connect_timestamp(d).alias("wire_millis"),
        to_wire_zoned_timestamp(d).alias("wire_zoned"),
        from_wire_date(days).cast("timestamp_ntz").alias("date_rt"),
        from_wire_micro_timestamp(micros).cast("timestamp_ntz").alias(
            "ts_rt"
        ),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# interval.handling.mode (public Debezium: INTERVAL columns wire as
# numeric micros — io.debezium.time.MicroDuration — or ISO-8601 strings)
# ---------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000
_US_PER_MIN = 60_000_000
_US_PER_SEC = 1_000_000


def interval_micros(start: Column, end: Column) -> Column:
    """``interval.handling.mode=numeric`` (io.debezium.time.
    MicroDuration): a duration as INT64 microseconds — here derived
    from two instants (the only way a columnar engine sees intervals)."""
    return (
        F.unix_micros(end.cast("timestamp"))
        - F.unix_micros(start.cast("timestamp"))
    )


def interval_iso(micros: Column) -> Column:
    """``interval.handling.mode=string``: ISO-8601 duration
    ``PdDThHmMs.ffffffS`` built with pure integer arithmetic + concat —
    the identical construction runs in the SQL oracle, so the string
    form is differentially checkable (no engine interval-formatting
    involved, which would never agree across engines)."""
    d = (micros / _US_PER_DAY).cast("long")
    rem = micros - d * _US_PER_DAY
    h = (rem / _US_PER_HOUR).cast("long")
    rem = rem - h * _US_PER_HOUR
    m = (rem / _US_PER_MIN).cast("long")
    rem = rem - m * _US_PER_MIN
    s = (rem / _US_PER_SEC).cast("long")
    us = rem - s * _US_PER_SEC
    return F.concat(
        F.lit("P"), d.cast("string"), F.lit("DT"),
        h.cast("string"), F.lit("H"),
        m.cast("string"), F.lit("M"),
        s.cast("string"), F.lit("."),
        F.lpad(us.cast("string"), 6, "0"), F.lit("S"),
    )


@register(
    "cdc_interval_wire",
    oracle="""
WITH d AS (
  SELECT event_id,
         epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS us
  FROM events
)
SELECT event_id, us AS wire_micros,
       'P' || CAST(us // 86400000000 AS VARCHAR) || 'DT'
           || CAST((us % 86400000000) // 3600000000 AS VARCHAR) || 'H'
           || CAST((us % 3600000000) // 60000000 AS VARCHAR) || 'M'
           || CAST((us % 60000000) // 1000000 AS VARCHAR) || '.'
           || lpad(CAST(us % 1000000 AS VARCHAR), 6, '0') || 'S'
         AS wire_iso
FROM d
ORDER BY event_id
""",
)
def cdc_interval_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interval.handling.mode, both modes on one duration (time-of-day
    of each event = ts minus its midnight): numeric micros and the
    ISO-8601 string, each rebuilt in the oracle with identical integer
    arithmetic — proving the encoders, not an engine's formatter."""
    ev = table(spark, sf_dir, "events")
    us = interval_micros(F.date_trunc("day", F.col("ts")), F.col("ts"))
    return ev.select(
        "event_id",
        us.alias("wire_micros"),
        interval_iso(us).alias("wire_iso"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# binary.handling.mode wire encodings (bytes / base64 / hex)
# ---------------------------------------------------------------------------


@register(
    "cdc_binary_wire",
    oracle="""
SELECT c_custkey,
       to_base64(encode(c_name)) AS b64,
       lower(hex(encode(c_name))) AS hx,
       c_name AS roundtrip
FROM customer
ORDER BY c_custkey
""",
)
def cdc_binary_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binary.handling.mode`` wire encodings, differentially proven:
    customer names become BinaryType payloads; the connector config
    surface (`connector.type_handling_casts`, mode=base64) renders the
    wire string, hex rides the identical builtin chain the mode uses
    (lowercase, Debezium's documented render), and the consumer-side
    decode (unbase64 → UTF-8) must round-trip to the source string.
    The oracle recomputes all three in DuckDB — byte-level encoder
    agreement across engines, not just self-consistency. All per-record
    expressions: zero shuffle at any scale."""
    from ..connector import type_handling_casts

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name",
        F.encode(F.col("c_name"), "UTF-8").alias("payload"),
    )
    enc = type_handling_casts(cust, {"binary.handling.mode": "base64"})
    return enc.select(
        "c_custkey",
        F.col("payload").alias("b64"),
        F.lower(F.hex(F.encode(F.col("c_name"), "UTF-8"))).alias("hx"),
        F.decode(F.unbase64(F.col("payload")), "UTF-8").alias("roundtrip"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Kafka Connect core SMTs Debezium users chain alongside the Debezium ones
# (org.apache.kafka.connect.transforms.{ReplaceField,InsertField,Flatten})
# ---------------------------------------------------------------------------


def replace_field(
    df: DataFrame,
    renames: dict[str, str] | None = None,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Connect ``ReplaceField``: drop excluded fields, keep only
    included ones (when an include list is given), then rename —
    Connect's documented application order. Unknown names in any list
    raise (a typo'd rename silently passing through is how fields leak
    past a compliance config). Pure projection, zero cost at scale."""
    cols = list(df.columns)
    for name in (list(renames or {}) + list(include or [])
                 + list(exclude or [])):
        if name not in cols:
            raise ValueError(f"ReplaceField references unknown field "
                             f"'{name}' (have {cols})")
    kept = [c for c in cols if not (exclude and c in exclude)]
    if include:
        kept = [c for c in kept if c in include]
    ren = renames or {}
    return df.select(*[F.col(f"`{c}`").alias(ren.get(c, c)) for c in kept])


def insert_field(
    df: DataFrame,
    static_field: str | None = None,
    static_value: str | None = None,
    timestamp_field: str | None = None,
    topic_field: str | None = None,
) -> DataFrame:
    """Connect ``InsertField``: add a static literal and/or record
    metadata as value fields. The topic comes from the engine's
    ``topic`` routing column (this engine's record coordinate);
    the timestamp is the processing-time instant, which is
    NON-DETERMINISTIC by nature — keep it out of differential
    fixtures (Connect's own semantics; tests pin the static/topic
    forms, the timestamp form only for type). Connect's ``!``/``?``
    required/optional name suffixes are accepted and stripped."""
    strip = lambda n: n.rstrip("!?") if n else n  # noqa: E731
    static_field, timestamp_field, topic_field = (
        strip(static_field), strip(timestamp_field), strip(topic_field)
    )
    if static_field:
        if static_value is None:
            raise ValueError("static.field requires static.value")
        df = df.withColumn(static_field, F.lit(static_value))
    if topic_field:
        df = df.withColumn(topic_field, F.col("topic"))
    if timestamp_field:
        df = df.withColumn(timestamp_field, F.current_timestamp())
    return df


def flatten_struct(df: DataFrame, delimiter: str = ".") -> DataFrame:
    """Connect ``Flatten``: recursively hoist nested struct fields to
    top-level columns named ``outer<delimiter>inner``. Arrays and maps
    pass through unflattened (Connect's Flatten does the same). Name
    collisions with existing columns raise — Connect would produce an
    invalid schema; this engine refuses up front."""
    out: list[Column] = []
    names: list[str] = []

    def walk(col: Column, name: str, dtype) -> None:
        from pyspark.sql import types as T

        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(col.getField(f.name), f"{name}{delimiter}{f.name}",
                     f.dataType)
        else:
            out.append(col.alias(name))
            names.append(name)

    for f in df.schema.fields:
        walk(F.col(f"`{f.name}`"), f.name, f.dataType)
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"Flatten produces colliding names: {sorted(dupes)}")
    return df.select(*out)


@register(
    "cdc_connect_smt_chain",
    oracle="""
SELECT event_id AS record_id,
       user_id AS uid,
       event_type AS meta_kind,
       value AS meta_score,
       'cdc' AS origin,
       'events.' || event_type AS src_topic
FROM events
WHERE event_type <> 'error'
ORDER BY record_id
""",
)
def cdc_connect_smt_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Connect core SMTs chained FROM PROPERTIES (the literal keys
    a Connect worker config carries, $Value suffixes included):
    Filter → ReplaceField (exclude + renames) → InsertField (static +
    topic) → Flatten. The oracle recomputes every surviving column
    directly from the source rows — equality proves the chain's
    application ORDER (rename before flatten changes the dotted names)
    and each SMT's field algebra, not just that the code runs."""
    from ..catalog import table as _table
    from ..connector import transform_chain

    ev = _table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").alias("seen_at"),
        F.col("event_type").alias("etype"),
        F.struct(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("kind"),
            F.col("value").alias("score"),
        ).alias("meta"),
        F.concat(F.lit("events."), F.col("event_type")).alias("topic"),
    )
    out = transform_chain(ev, {
        "transforms": "f,rf,ins,fl",
        "transforms.f.type":
            "org.apache.kafka.connect.transforms.Filter$Value",
        "transforms.f.condition": "etype <> 'error'",
        "transforms.rf.type":
            "org.apache.kafka.connect.transforms.ReplaceField$Value",
        "transforms.rf.exclude": "seen_at,etype",
        "transforms.rf.renames": "event_id:record_id",
        "transforms.ins.type":
            "org.apache.kafka.connect.transforms.InsertField$Value",
        "transforms.ins.static.field": "origin!",
        "transforms.ins.static.value": "cdc",
        "transforms.ins.topic.field": "src_topic",
        "transforms.fl.type":
            "org.apache.kafka.connect.transforms.Flatten$Value",
        "transforms.fl.delimiter": "_",
    })
    return out.select(
        "record_id",
        F.col("meta_uid").alias("uid"),
        F.col("meta_kind"),
        F.col("meta_score"),
        "origin",
        "src_topic",
    ).orderBy("record_id")


# ---------------------------------------------------------------------------
# Connect core: Cast, TimestampConverter, ValueToKey, HoistField
# (org.apache.kafka.connect.transforms.*; reconstructed per SURVEY.md §0
# from the public Kafka Connect SMT documentation)
# ---------------------------------------------------------------------------

#: Connect Cast schema-type names → Spark SQL type names.
CONNECT_CAST_TYPES = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
}


def connect_cast(df: DataFrame, spec: str) -> DataFrame:
    """Connect ``Cast`` SMT: ``spec`` is ``field:type,field:type`` with
    the Connect schema-type vocabulary (int8..int64, float32/float64,
    boolean, string). Unknown fields and unknown types raise — a typo'd
    cast silently passing through would ship the wrong wire type to
    every sink consumer. Connect's whole-value form (a bare type with
    no field) is refused: records here are value-shaped structs, not
    primitive values. Pure projection; zero cost at scale."""
    out = df
    for pair in (p.strip() for p in spec.split(",") if p.strip()):
        if ":" not in pair:
            raise ValueError(
                f"Cast spec entry {pair!r}: whole-value casts are not "
                "supported — records are value-shaped; use field:type"
            )
        field_name, ctype = pair.split(":", 1)
        if ctype not in CONNECT_CAST_TYPES:
            raise ValueError(
                f"Cast spec entry {pair!r}: unknown Connect type "
                f"{ctype!r} (have {sorted(CONNECT_CAST_TYPES)})"
            )
        if field_name not in out.columns:
            raise ValueError(
                f"Cast references unknown field {field_name!r} "
                f"(have {out.columns})"
            )
        out = out.withColumn(
            field_name, F.col(f"`{field_name}`").cast(CONNECT_CAST_TYPES[ctype])
        )
    return out


def timestamp_converter(
    df: DataFrame,
    field: str,
    target_type: str,
    fmt: str | None = None,
) -> DataFrame:
    """Connect ``TimestampConverter`` SMT: convert one field between
    the wire representations ``unix`` (epoch millis, int64), ``string``
    (formatted, ``format`` required), ``Timestamp``, ``Date``, and
    ``Time`` (millis since midnight, int32 — Connect's Time logical
    type). The SOURCE representation is inferred from the column's
    type, exactly like the SMT infers it from the record schema:
    integer → epoch millis, string → parsed with ``format``,
    date/timestamp → as-is. Expression-level; the engine's pinned UTC
    session zone makes every conversion deterministic."""
    if field not in df.columns:
        raise ValueError(f"TimestampConverter: unknown field {field!r}")
    dt = df.schema[field].dataType
    col = F.col(f"`{field}`")
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        ts = F.timestamp_millis(col.cast("bigint"))
    elif isinstance(dt, T.StringType):
        if not fmt:
            raise ValueError(
                "TimestampConverter: a string-typed source field "
                "requires format"
            )
        ts = F.to_timestamp(col, fmt)
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        ts = col.cast("timestamp")
    else:
        raise ValueError(
            f"TimestampConverter: unsupported source type "
            f"{dt.simpleString()} for field {field!r}"
        )
    if target_type == "unix":
        out = F.unix_millis(ts)
    elif target_type == "string":
        if not fmt:
            raise ValueError(
                "TimestampConverter: target.type=string requires format"
            )
        out = F.date_format(ts, fmt)
    elif target_type == "Timestamp":
        out = ts
    elif target_type == "Date":
        out = F.to_date(ts)
    elif target_type == "Time":
        out = (
            F.unix_millis(ts) - F.unix_millis(F.date_trunc("DAY", ts))
        ).cast("int")
    else:
        raise ValueError(
            f"TimestampConverter: unknown target.type {target_type!r} "
            "(want unix|string|Timestamp|Date|Time)"
        )
    return df.withColumn(field, out)


def value_to_key(df: DataFrame, fields: list[str]) -> DataFrame:
    """Connect ``ValueToKey`` SMT: replace the record key with a struct
    of the named value fields — this engine's record-key convention is
    the ``__key`` struct column (the same one ``message.key.columns``
    builds), so downstream repartition/sink placement keys on it."""
    missing = [c for c in fields if c not in df.columns]
    if missing:
        raise ValueError(
            f"ValueToKey references unknown fields {missing} "
            f"(have {df.columns})"
        )
    if not fields:
        raise ValueError("ValueToKey: fields must be non-empty")
    return df.withColumn(
        "__key", F.struct(*[F.col(f"`{c}`") for c in fields])
    )


def hoist_field(
    df: DataFrame,
    field: str,
    meta: tuple[str, ...] = ("topic", "headers", "key"),
) -> DataFrame:
    """Connect ``HoistField$Value``: wrap the record's value into a
    single-field struct named ``field``. Engine records are value
    columns plus routing metadata — the metadata (``topic``/``headers``/
    ``key`` and every ``__``-prefixed engine column) stays top-level;
    everything else nests, mirroring the SMT wrapping only the value
    side of the record."""
    value_cols = [
        c for c in df.columns if c not in meta and not c.startswith("__")
    ]
    if not value_cols:
        raise ValueError("HoistField: record has no value columns to wrap")
    if field in set(df.columns) - set(value_cols):
        raise ValueError(
            f"HoistField target {field!r} collides with a metadata column"
        )
    kept = [c for c in df.columns if c not in value_cols]
    return df.select(
        *[F.col(f"`{c}`") for c in kept],
        F.struct(*[F.col(f"`{c}`") for c in value_cols]).alias(field),
    )


@register(
    "cdc_connect_predicates",
    oracle="""
SELECT event_id,
       CASE WHEN event_type IN ('click', 'view')
            THEN 'web.' || event_type
            ELSE 'app.' || event_type END AS topic,
       user_id AS uid,
       CASE WHEN event_id % 2 = 0 THEN 'traced' END AS channel,
       CASE WHEN event_id % 2 <> 0 THEN 'y' END AS bulk
FROM events
WHERE event_id % 7 <> 0
ORDER BY event_id
""",
)
def cdc_connect_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connect predicate-gated SMT chain, driven from worker-config
    properties: RecordIsTombstone gates a Connect-core Filter (the
    canonical drop-tombstones idiom — Filter has no condition, it
    exists to pair with a predicate), TopicNameMatches gates a
    RegexRouter (only click/view topics are renamed; the pattern is a
    Java full match), and HasHeaderKey gates InsertField twice — once
    plain, once with ``negate=true`` — so every record lands in exactly
    one of the two inserted fields. The oracle recomputes all four
    gates from the source columns; equality proves the gate split, the
    by-name union, and the negation each did precisely what Connect's
    per-record contract says."""
    from ..connector import transform_chain

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("app."), F.col("event_type")).alias("topic"),
        F.when(
            F.col("event_id") % 2 == 0,
            F.create_map(F.lit("trace"), F.col("event_id").cast("string")),
        )
        .otherwise(F.create_map(F.lit("src"), F.col("event_type")))
        .alias("headers"),
        F.when(
            F.col("event_id") % 7 != 0,
            F.struct(F.col("user_id").alias("uid")),
        ).alias("value"),
    )
    out = transform_chain(ev, {
        "predicates": "IsTomb,IsWeb,HasTrace",
        "predicates.IsTomb.type":
            "org.apache.kafka.connect.transforms.predicates.RecordIsTombstone",
        "predicates.IsWeb.type":
            "org.apache.kafka.connect.transforms.predicates.TopicNameMatches",
        "predicates.IsWeb.pattern": r"app\.(click|view)",
        "predicates.HasTrace.type":
            "org.apache.kafka.connect.transforms.predicates.HasHeaderKey",
        "predicates.HasTrace.name": "trace",
        "transforms": "drop,route,tag,mark",
        "transforms.drop.type":
            "org.apache.kafka.connect.transforms.Filter$Value",
        "transforms.drop.predicate": "IsTomb",
        "transforms.route.type":
            "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": r"app\.(.*)",
        "transforms.route.replacement": "web.$1",
        "transforms.route.predicate": "IsWeb",
        "transforms.tag.type":
            "org.apache.kafka.connect.transforms.InsertField$Value",
        "transforms.tag.static.field": "channel",
        "transforms.tag.static.value": "traced",
        "transforms.tag.predicate": "HasTrace",
        "transforms.mark.type":
            "org.apache.kafka.connect.transforms.InsertField$Value",
        "transforms.mark.static.field": "bulk",
        "transforms.mark.static.value": "y",
        "transforms.mark.predicate": "HasTrace",
        "transforms.mark.negate": "true",
    })
    return out.select(
        "event_id",
        "topic",
        F.col("value.uid").alias("uid"),
        "channel",
        "bulk",
    ).orderBy("event_id")


@register(
    "cdc_connect_cast_ts",
    oracle="""
SELECT CAST(event_id AS INTEGER) AS event_id,
       CAST(user_id AS VARCHAR) AS uid_s,
       CAST(CAST(value AS FLOAT) AS DOUBLE) AS val_f32,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       epoch_ms(epoch_ms(ts)) AS ts_ms_rt
FROM events
ORDER BY event_id
""",
)
def cdc_connect_cast_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connect ``Cast`` + ``TimestampConverter`` from properties:
    timestamp→formatted-string, epoch-millis→Timestamp (the int64
    source inference), and a three-field Cast (int64→int32,
    int64→string, float64→float32). The float32 narrowing is re-widened
    to double on BOTH sides so the comparison pins the precision LOSS
    itself (IEEE round-to-nearest is engine-invariant), per the
    registry's no-bare-float32 parity policy; the millis round-trip
    pins timestamp_millis/unix_millis against DuckDB's epoch_ms pair
    under the pinned UTC session zone."""
    from ..connector import transform_chain

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        "ts",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("epoch_ms"),
    )
    out = transform_chain(ev, {
        "transforms": "tstr,tts,c",
        "transforms.tstr.type":
            "org.apache.kafka.connect.transforms.TimestampConverter$Value",
        "transforms.tstr.field": "ts",
        "transforms.tstr.target.type": "string",
        "transforms.tstr.format": "yyyy-MM-dd HH:mm:ss",
        "transforms.tts.type":
            "org.apache.kafka.connect.transforms.TimestampConverter$Value",
        "transforms.tts.field": "epoch_ms",
        "transforms.tts.target.type": "Timestamp",
        "transforms.c.type":
            "org.apache.kafka.connect.transforms.Cast$Value",
        "transforms.c.spec": "event_id:int32,user_id:string,value:float32",
    })
    return out.select(
        "event_id",
        F.col("user_id").alias("uid_s"),
        F.col("value").cast("double").alias("val_f32"),
        F.col("ts").alias("ts_str"),
        F.col("epoch_ms").alias("ts_ms_rt"),
    ).orderBy("event_id")
