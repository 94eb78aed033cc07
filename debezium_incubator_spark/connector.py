"""Debezium connector-properties front end (SURVEY.md §2A A4/A5, §2B):
accept the SAME configuration keys a Debezium user writes in their
connector properties file and drive this engine's operators with them —
the switch-over surface for an existing Debezium deployment.

Supported keys (semantics per public Debezium connector docs; the
archived checkout contains no code — SURVEY.md §0):

- ``table.include.list`` / ``table.exclude.list`` — comma-separated
  regexes, fullmatched against the table identifier; include wins when
  both are set (Debezium forbids both; we follow include).
- ``column.include.list`` / ``column.exclude.list`` — regexes matched
  against ``table.column``.
- ``column.mask.with.<n>.chars`` — star-mask listed columns to n chars.
- ``column.mask.hash.v2.with.salt.<salt>`` — salted SHA-256 hash-mask.
- ``column.truncate.to.<n>.chars`` — truncate listed string columns.
- ``snapshot.select.statement.overrides.<table>`` — full SELECT the
  snapshot runs instead of the bare scan (predicate/projection reach
  the parquet scan via Catalyst pushdown).
- ``message.key.columns`` — ``table:col1,col2;...`` → ``__key`` struct
  (B9 re-key; also the repartition key for co-located downstream joins).
- ``transforms`` + ``transforms.<name>.type``/``.<prop>`` — SMT chain:
  ExtractNewRecordState (unwrap), Filter (condition), RegexRouter
  (topic rewrite), Cast, TimestampConverter, ValueToKey, HoistField,
  ... — applied in declared order.
- ``predicates`` + ``predicates.<name>.type``/``.<prop>`` — Connect
  predicate declarations (TopicNameMatches / HasHeaderKey /
  RecordIsTombstone), attached to a transform via
  ``transforms.<t>.predicate`` (+ optional ``.negate``) so the SMT
  applies only to the records the predicate selects.

Scale: everything here compiles to stateless projections/filters that
Catalyst pushes into the scan — config parsing adds zero runtime cost
and no shuffles.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TABLES, table
from .operators.scans import mask_columns, project, truncate_columns


@dataclass
class ConnectorConfig:
    """Parsed connector properties."""

    table_include: list[str] = field(default_factory=list)
    table_exclude: list[str] = field(default_factory=list)
    column_include: list[str] = field(default_factory=list)
    column_exclude: list[str] = field(default_factory=list)
    mask_chars: dict[int, list[str]] = field(default_factory=dict)
    hash_mask: dict[str, list[str]] = field(default_factory=dict)  # salt -> cols
    truncate_chars: dict[int, list[str]] = field(default_factory=dict)
    snapshot_overrides: dict[str, str] = field(default_factory=dict)
    message_key_columns: dict[str, list[str]] = field(default_factory=dict)
    transforms: list[tuple[str, dict[str, str]]] = field(default_factory=list)
    predicates: dict[str, dict[str, str]] = field(default_factory=dict)


_MASK = re.compile(r"^column\.mask\.with\.(\d+)\.chars$")
_HASH = re.compile(r"^column\.mask\.hash(?:\.v2)?\.with\.salt\.(.*)$")
_TRUNC = re.compile(r"^column\.truncate\.to\.(\d+)\.chars$")
_OVERRIDE = re.compile(r"^snapshot\.select\.statement\.overrides\.(.+)$")


def _csv(v: str) -> list[str]:
    return [s.strip() for s in v.split(",") if s.strip()]


def parse_config(props: dict[str, str]) -> ConnectorConfig:
    cfg = ConnectorConfig()
    cfg.table_include = _csv(props.get("table.include.list", ""))
    cfg.table_exclude = _csv(props.get("table.exclude.list", ""))
    cfg.column_include = _csv(props.get("column.include.list", ""))
    cfg.column_exclude = _csv(props.get("column.exclude.list", ""))
    for k, v in props.items():
        if m := _MASK.match(k):
            cfg.mask_chars[int(m.group(1))] = _csv(v)
        elif m := _HASH.match(k):
            cfg.hash_mask[m.group(1)] = _csv(v)
        elif m := _TRUNC.match(k):
            cfg.truncate_chars[int(m.group(1))] = _csv(v)
        elif m := _OVERRIDE.match(k):
            cfg.snapshot_overrides[m.group(1)] = v
    for spec in props.get("message.key.columns", "").split(";"):
        if ":" in spec:
            t, cols = spec.split(":", 1)
            cfg.message_key_columns[t.strip()] = _csv(cols)
    for name in _csv(props.get("transforms", "")):
        prefix = f"transforms.{name}."
        t_props = {
            k[len(prefix):]: v for k, v in props.items() if k.startswith(prefix)
        }
        cfg.transforms.append((name, t_props))
    for name in _csv(props.get("predicates", "")):
        prefix = f"predicates.{name}."
        cfg.predicates[name] = {
            k[len(prefix):]: v for k, v in props.items() if k.startswith(prefix)
        }
    return cfg


def _any_fullmatch(patterns: list[str], ident: str) -> bool:
    return any(re.fullmatch(p, ident) for p in patterns)


def captured_tables(cfg: ConnectorConfig,
                    available: list[str] | None = None) -> list[str]:
    """A5: resolve include/exclude regexes against the table registry."""
    names = available if available is not None else list(TABLES)
    if cfg.table_include:
        return [t for t in names if _any_fullmatch(cfg.table_include, t)]
    if cfg.table_exclude:
        return [t for t in names if not _any_fullmatch(cfg.table_exclude, t)]
    return list(names)


def apply_column_policies(df: DataFrame, table_name: str,
                          cfg: ConnectorConfig) -> DataFrame:
    """B1/B7/B8 per-table: column lists, masks, truncation, re-key."""
    cols = df.columns
    if cfg.column_include:
        keep = [c for c in cols
                if _any_fullmatch(cfg.column_include, f"{table_name}.{c}")]
        df = project(df, include=keep)
    elif cfg.column_exclude:
        drop = [c for c in cols
                if _any_fullmatch(cfg.column_exclude, f"{table_name}.{c}")]
        df = project(df, exclude=drop)
    for n, patterns in cfg.mask_chars.items():
        hits = {c: n for c in df.columns
                if _any_fullmatch(patterns, f"{table_name}.{c}")}
        if hits:
            df = mask_columns(df, mask_with_length=hits)
    for salt, patterns in cfg.hash_mask.items():
        for c in df.columns:
            if _any_fullmatch(patterns, f"{table_name}.{c}"):
                df = df.withColumn(
                    c, F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), 256)
                )
    for n, patterns in cfg.truncate_chars.items():
        hits = {c: n for c in df.columns
                if _any_fullmatch(patterns, f"{table_name}.{c}")}
        if hits:
            df = truncate_columns(df, hits)
    if key_cols := cfg.message_key_columns.get(table_name):
        df = df.withColumn("__key", F.struct(*key_cols))
    return df


def snapshot(spark: SparkSession, sf_dir: str,
             props: dict[str, str]) -> dict[str, DataFrame]:
    """A3/A4: config-driven initial snapshot — one DataFrame per captured
    table, with statement overrides and column policies applied (rows
    are the ``op='r'`` image; envelope wrapping is cdc.envelope's job)."""
    cfg = parse_config(props)
    out: dict[str, DataFrame] = {}
    for t in captured_tables(cfg):
        if sql := cfg.snapshot_overrides.get(t):
            table(spark, sf_dir, t).createOrReplaceTempView(t)
            df = spark.sql(sql)
        else:
            df = table(spark, sf_dir, t)
        out[t] = apply_column_policies(df, t, cfg)
    return out


def predicate_column(df: DataFrame, spec: dict[str, str]) -> Column:
    """Compile a Kafka Connect predicate declaration (the
    ``predicates.<name>.*`` keys) into a boolean Column over this
    engine's record frame. The three Connect-core predicate types:

    - ``TopicNameMatches`` (``pattern``): Java ``matches()`` is a FULL
      match, so the regex is anchored here — an unanchored ``rlike``
      would silently widen the gate to substring matches.
    - ``HasHeaderKey`` (``name``): key present in the ``headers`` map
      (present-with-null-value still counts, exactly like Connect).
    - ``RecordIsTombstone``: the record value is NULL.

    NULL inputs (no topic / no headers map) gate to false, never NULL —
    a three-valued gate would make ``negate`` and the complement filter
    disagree about the same row."""
    ptype = spec.get("type", "").split("$")[0]
    if ptype.endswith("TopicNameMatches"):
        gate = F.col("topic").rlike(f"^(?:{spec['pattern']})$")
    elif ptype.endswith("HasHeaderKey"):
        gate = F.map_contains_key(F.col("headers"), spec["name"])
    elif ptype.endswith("RecordIsTombstone"):
        gate = F.col("value").isNull()
    else:
        raise ValueError(f"unsupported predicate type: {ptype!r}")
    return F.coalesce(gate, F.lit(False))


def transform_chain(df: DataFrame, props: dict[str, str]) -> DataFrame:
    """B2/B3/B5 SMT chain over an envelope/event DataFrame, applied in
    the order declared by ``transforms``. Each transform may carry the
    Connect worker's ``predicate`` (+ ``negate``) keys, referencing a
    ``predicates.<name>.*`` declaration: the SMT then applies ONLY to
    records the predicate selects, and the rest pass through unchanged —
    rendered relationally as a split on the gate, the transform over the
    matching branch, and a by-name union (records the SMT never saw
    simply lack any field it would have added, exactly Connect's
    per-record outcome). Both branches are filters over the same
    upstream plan — stateless, pushdown-eligible, no shuffle."""
    cfg = parse_config(props) if not isinstance(props, ConnectorConfig) else props
    for name, t in cfg.transforms:
        t = dict(t)
        pred_name = t.pop("predicate", None)
        negate = t.pop("negate", "false").strip().lower() == "true"
        if pred_name is None:
            if negate:
                raise ValueError(
                    f"transform '{name}': negate without predicate"
                )
            df = _apply_transform(df, name, t)
            continue
        if pred_name not in cfg.predicates:
            raise ValueError(
                f"transform '{name}': predicate '{pred_name}' is not "
                f"declared (have {sorted(cfg.predicates)})"
            )
        gate = predicate_column(df, cfg.predicates[pred_name])
        if negate:
            gate = ~gate
        df = _apply_transform(df.filter(gate), name, t).unionByName(
            df.filter(~gate), allowMissingColumns=True
        )
    return df


def _apply_transform(df: DataFrame, name: str,
                     t: dict[str, str]) -> DataFrame:
    """Apply ONE SMT declaration to a record frame (the transform_chain
    loop body; split out so predicate gating can route a sub-frame
    through the same dispatch)."""
    from .cdc.envelope import unwrap

    # Connect SMT classes carry a $Value/$Key suffix. This engine's
    # records are value-shaped — a $Key transform targets the record
    # key and silently applying it to value columns would transform
    # the wrong part of the record, so it must stay a loud error.
    raw_type = t.get("type", "")
    if raw_type.endswith("$Key"):
        raise ValueError(
            f"transform '{name}': key transforms (…$Key) are not "
            "supported — records here are value-shaped; use the "
            "$Value form or rekey() explicitly"
        )
    ttype = raw_type.split("$")[0]
    if ttype.endswith("ExtractNewRecordState"):
        meta = [c for c in df.columns if c not in ("key", "value")]
        add = [p.strip() for p in t.get("add.fields", "").split(",")
               if p.strip()]
        df = unwrap(
            df,
            drop_deletes=t.get("delete.handling.mode", "drop") == "drop"
            and t.get("drop.tombstones", "true") == "true",
            passthrough=meta,
            add_fields=add or None,
        )
        # route.by.field: the unwrapped record's own field value BECOMES
        # the topic — Debezium's data-driven routing (e.g. an outbox-ish
        # `aggregate_type` column). Unknown field refuses loudly.
        if route_by := t.get("route.by.field"):
            if route_by not in df.columns:
                raise ValueError(
                    f"route.by.field references unknown field "
                    f"{route_by!r} (have {df.columns})"
                )
            df = df.withColumn("topic", F.col(route_by).cast("string"))
    elif ttype.endswith("ExtractChangedRecordState"):
        from .cdc.envelope import changed_record_state

        # row schema introspected from the envelope's after image
        after = df.schema["value"].dataType["after"].dataType
        df = changed_record_state(df, after)
    elif ttype.endswith("Filter"):
        # Debezium's Filter keeps records matching `condition`; the
        # Connect-core Filter has NO condition — it drops every record
        # it applies to, existing purely to pair with a predicate.
        # The drop-all default is ONLY correct for the Connect-core
        # class; a Debezium Filter missing its condition is a config
        # error and must not become a silent drop-everything path.
        cond = t.get("condition")
        if cond is None and "debezium" in raw_type.lower():
            raise ValueError(
                f"transform '{name}' ({raw_type}) requires a "
                f"'condition' property — only the Connect-core "
                f"org.apache.kafka.connect.transforms.Filter drops "
                f"records unconditionally"
            )
        df = df.filter(F.expr(cond) if cond is not None else F.lit(False))
    elif ttype.endswith("RegexRouter"):
        df = df.withColumn(
            "topic",
            F.regexp_replace(
                F.col("topic"), t["regex"], t["replacement"]
            ),
        )
    elif ttype.endswith("PartitionRouting"):
        from .cdc.transforms import partition_routing

        fields = [p.strip()
                  for p in t["partition.payload.fields"].split(",")
                  if p.strip()]
        df = partition_routing(
            df, fields, int(t["partition.topic.num"]),
            hash=t.get("partition.hash.function", "xxhash64"),
        )
    elif ttype.endswith("HeaderToValue"):
        from .cdc.transforms import header_to_value

        headers = [p.strip() for p in t["headers"].split(",")
                   if p.strip()]
        fields = [p.strip() for p in t.get("fields", "").split(",")
                  if p.strip()]
        df = header_to_value(
            df, headers, fields=fields or None,
            operation=t.get("operation", "move"),
        )
    elif ttype.endswith("TimezoneConverter"):
        from .cdc.transforms import timezone_converter

        inc = [p.strip() for p in t.get("include.list", "").split(",")
               if p.strip()]
        exc = [p.strip() for p in t.get("exclude.list", "").split(",")
               if p.strip()]
        df = timezone_converter(
            df, t["converted.timezone"],
            include=inc or None, exclude=exc or None,
        )
    elif ttype.endswith("ReplaceField"):
        from .cdc.transforms import replace_field

        bad = [p for p in _csv(t.get("renames", "")) if ":" not in p]
        if bad:
            raise ValueError(
                f"transform '{name}': malformed renames entries "
                f"{bad} (want old:new) — a silently skipped rename "
                "is how fields leak past a compliance config"
            )
        renames = dict(
            pair.split(":", 1) for pair in _csv(t.get("renames", ""))
        )
        df = replace_field(
            df,
            renames=renames or None,
            include=_csv(t.get("include", "")) or None,
            exclude=_csv(t.get("exclude", "")) or None,
        )
    elif ttype.endswith("InsertField"):
        from .cdc.transforms import insert_field

        df = insert_field(
            df,
            static_field=t.get("static.field"),
            static_value=t.get("static.value"),
            timestamp_field=t.get("timestamp.field"),
            topic_field=t.get("topic.field"),
        )
    elif ttype.endswith("Flatten"):
        from .cdc.transforms import flatten_struct

        df = flatten_struct(df, delimiter=t.get("delimiter", "."))
    elif ttype.endswith("TimestampConverter"):
        from .cdc.transforms import timestamp_converter

        df = timestamp_converter(
            df, t["field"], t["target.type"], fmt=t.get("format")
        )
    elif ttype.endswith("Cast"):
        from .cdc.transforms import connect_cast

        df = connect_cast(df, t["spec"])
    elif ttype.endswith("ValueToKey"):
        from .cdc.transforms import value_to_key

        df = value_to_key(df, _csv(t["fields"]))
    elif ttype.endswith("HoistField"):
        from .cdc.transforms import hoist_field

        df = hoist_field(df, t["field"])
    else:
        raise ValueError(f"unsupported transform type for '{name}': {ttype}")
    return df


def propagate_source_types(
    df: DataFrame,
    column_types: dict[str, str],
    patterns: list[str] | None = None,
) -> DataFrame:
    """``column.propagate.source.type``: attach the ORIGINAL database
    type of each column as field metadata (`__debezium.source.column.
    type`), so consumers that must re-create the column faithfully
    (sink connectors building DDL) see ``NUMERIC(10,2)``, not just the
    lossy engine type. Debezium puts this in Connect schema parameters;
    the Spark twin is StructField metadata — carried by the schema,
    zero data-plane cost, and surviving projections.

    ``column_types``: column → source type string (harvested from the
    schema-history DDL parse); ``patterns``: optional regex list
    scoping which columns propagate (the config's value), default
    all."""
    import re as _re

    for c, t in column_types.items():
        if c not in df.columns:
            continue
        if patterns is not None and not any(
            _re.fullmatch(p, c) for p in patterns
        ):
            continue
        df = df.withMetadata(c, {"__debezium.source.column.type": t})
    return df


def type_handling_casts(df: DataFrame, props: dict[str, str]) -> DataFrame:
    """B10: Debezium's capture-time type-coercion modes, applied by
    schema introspection (the user keeps their existing config keys):

    - ``decimal.handling.mode`` — precise (keep DecimalType, default) /
      double / string, applied to every DecimalType column.
    - ``time.precision.mode`` — adaptive (keep source precision,
      default) / connect (Kafka Connect Time/Timestamp = millisecond
      precision), applied to every timestamp column.
    - ``binary.handling.mode`` — bytes (default) / base64 / hex
      (Debezium emits lowercase hex), applied to every BinaryType column.

    All casts are built-in expressions — column-at-a-time, codegen'd,
    no Python; at 100 TB this is a free map-side projection."""
    from pyspark.sql import types as T

    dec = props.get("decimal.handling.mode", "precise")
    tpm = props.get("time.precision.mode", "adaptive")
    binm = props.get("binary.handling.mode", "bytes")
    for mode, allowed in (
        (dec, {"precise", "double", "string"}),
        (tpm, {"adaptive", "adaptive_time_microseconds", "connect"}),
        (binm, {"bytes", "base64", "hex"}),
    ):
        if mode not in allowed:
            raise ValueError(f"unsupported mode '{mode}' (one of {sorted(allowed)})")
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.DecimalType) and dec != "precise":
            df = df.withColumn(f.name, c.cast("double" if dec == "double" else "string"))
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)) and tpm == "connect":
            # ms precision: truncate sub-millisecond digits, keep the type
            df = df.withColumn(
                f.name,
                F.timestamp_micros(
                    (F.unix_micros(c.cast("timestamp")) / 1000).cast("long") * 1000
                ).cast(f.dataType.simpleString()),
            )
        elif isinstance(f.dataType, T.BinaryType) and binm != "bytes":
            df = df.withColumn(
                f.name, F.base64(c) if binm == "base64" else F.lower(F.hex(c))
            )
    return df


def _avro_sanitize(name: str, unicode_mode: bool) -> str:
    """Avro name rules: ``[A-Za-z_][A-Za-z0-9_]*``. avro mode replaces
    each invalid character with ``_``; avro_unicode with ``_uXXXX``
    (lowercase hex code point — reversible, Debezium's documented
    variant). A leading digit is escaped the same way."""
    out = []
    for i, ch in enumerate(name):
        valid = (
            ch == "_"
            or ("a" <= ch <= "z") or ("A" <= ch <= "Z")
            or (i > 0 and "0" <= ch <= "9")
        )
        if valid:
            out.append(ch)
        elif unicode_mode:
            out.append(f"_u{ord(ch):04x}")
        else:
            out.append("_")
    return "".join(out)


def _adjust_dtype(dt, unicode_mode: bool):
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        names = [_avro_sanitize(f.name, unicode_mode) for f in dt.fields]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ValueError(
                f"field name adjustment collides on {sorted(dupes)}: "
                "two source fields sanitize to one Avro name — rename "
                "at the source or use avro_unicode mode"
            )
        return T.StructType([
            T.StructField(n, _adjust_dtype(f.dataType, unicode_mode),
                          f.nullable, f.metadata)
            for n, f in zip(names, dt.fields)
        ])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(
            _adjust_dtype(dt.elementType, unicode_mode), dt.containsNull
        )
    if isinstance(dt, T.MapType):
        return T.MapType(
            dt.keyType, _adjust_dtype(dt.valueType, unicode_mode),
            dt.valueContainsNull,
        )
    return dt


def adjust_field_names(df: DataFrame, props: dict[str, str]) -> DataFrame:
    """``field.name.adjustment.mode`` (and the schema-name twin):
    sanitize every field name — top-level and nested struct fields —
    to Avro's ``[A-Za-z_][A-Za-z0-9_]*`` rule before the record meets
    an Avro/Confluent serializer. ``none`` (default) is identity;
    ``avro`` replaces invalid characters with ``_`` and REFUSES
    collisions loudly (a silent merge would alias two source columns);
    ``avro_unicode`` escapes as reversible ``_uXXXX``.

    Nested renames ride a cast to the adjusted StructType (casts match
    struct fields by position, names are free) — a zero-cost projection
    at any scale."""
    mode = props.get(
        "field.name.adjustment.mode",
        props.get("schema.name.adjustment.mode", "none"),
    )
    if mode == "none":
        return df
    if mode not in ("avro", "avro_unicode"):
        raise ValueError(
            f"unsupported field.name.adjustment.mode '{mode}'"
        )
    adjusted = _adjust_dtype(df.schema, mode == "avro_unicode")
    return df.select(*[
        F.col(f"`{old.name}`").cast(new.dataType).alias(new.name)
        for old, new in zip(df.schema.fields, adjusted.fields)
    ])


# --- Oracle-checked demo: a Debezium properties file drives the engine ---

from .registry import register  # noqa: E402


@register(
    "connector_snapshot",
    oracle="""
SELECT c_custkey,
       '********' AS c_name,
       sha256('pepper' || c_mktsegment) AS c_mktsegment
FROM customer
WHERE c_acctbal > 1000
""",
)
def connector_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A filtered, masked snapshot configured ENTIRELY by Debezium
    connector properties — the literal keys a Debezium user already has
    in their connector config."""
    props = {
        "table.include.list": "customer",
        "column.include.list": (
            r"customer\.c_custkey,customer\.c_name,customer\.c_mktsegment"
        ),
        "column.mask.with.8.chars": r"customer\.c_name",
        "column.mask.hash.v2.with.salt.pepper": r"customer\.c_mktsegment",
        "snapshot.select.statement.overrides.customer": (
            "SELECT * FROM customer WHERE c_acctbal > 1000"
        ),
    }
    return snapshot(spark, sf_dir, props)["customer"]


SNAPSHOT_MODES = ("initial", "initial_only", "no_data", "never",
                  "when_needed", "always", "recovery")


def snapshot_mode_plan(props: dict[str, str],
                       state_exists: bool = False,
                       offsets_valid: bool = True) -> dict[str, bool]:
    """``snapshot.mode`` → which phases to run (Debezium semantics:
    initial = snapshot then stream; initial_only = snapshot, no stream;
    no_data/schema-only = stream only, no row snapshot; never = stream
    only; when_needed = snapshot only if no prior committed state OR
    the stored offsets are unusable; always = data snapshot on EVERY
    connector start regardless of state; recovery = rebuild the schema
    history from the current catalog — schema phase only, no data
    snapshot, stream resumes from stored offsets).

    ``recovery`` additionally REQUIRES usable offsets: Debezium
    documents it as a history-repair mode, not a data-loss escape
    hatch — recovering history while the stored offset predates the
    retained log would silently skip changes, so that combination
    raises here.

    ``offsets_valid=False`` models the second ``when_needed`` trigger:
    the stored offset points BEFORE the retained head of the log
    (binlog purged / archive redo aged out), so streaming from it
    would silently skip changes — Debezium re-snapshots instead. Use
    :func:`offsets_available` to derive it from positions.

    The two booleans drive composition: ``run_snapshot`` → the
    ``snapshot()`` backfill (op='r' rows, or cdc/incremental_snapshot
    chunked variant at scale); ``run_stream`` → the Structured
    Streaming pipeline from the stored offset."""
    mode = props.get("snapshot.mode", "initial")
    if mode not in SNAPSHOT_MODES:
        raise ValueError(
            f"unsupported snapshot.mode '{mode}' (one of {SNAPSHOT_MODES})"
        )
    if mode == "recovery" and not (state_exists and offsets_valid):
        raise ValueError(
            "snapshot.mode=recovery requires committed state with "
            "usable offsets — it repairs a lost/corrupted schema "
            "history, it does not replace a data snapshot (use "
            "when_needed or initial)"
        )
    run_snapshot = {
        "initial": True,
        "initial_only": True,
        "no_data": False,
        "never": False,
        "when_needed": not (state_exists and offsets_valid),
        "always": True,
        "recovery": False,
    }[mode]
    run_stream = mode != "initial_only"
    return {
        "run_snapshot": run_snapshot,
        "run_stream": run_stream,
        "rebuild_schema_history": mode == "recovery",
    }


def offsets_available(offset_pos: int | None, log_start_pos: int) -> bool:
    """Can streaming resume from ``offset_pos``? True iff an offset is
    stored AND the log still retains everything after it
    (``offset_pos >= log_start_pos - 1`` — the entry AT the stored
    offset has been consumed; the next needed entry is offset_pos + 1).
    A stored offset below the retained head means changes were purged
    unread; resuming would silently lose them."""
    if offset_pos is None:
        return False
    return offset_pos >= log_start_pos - 1


def apply_skipped_operations(df: DataFrame, props: dict[str, str],
                             op_col: str = "__op") -> DataFrame:
    """``skipped.operations`` (public Debezium): comma-separated list
    of operation types dropped DURING STREAMING — ``c`` (inserts),
    ``u`` (updates), ``d`` (deletes), ``t`` (truncates); default ``t``;
    ``none`` disables skipping entirely. Snapshot ``r`` events are not
    skippable (the option governs streamed changes only, matching the
    connector docs). One codegen'd NOT-IN filter — free at any scale."""
    raw = props.get("skipped.operations", "t").strip()
    if raw == "none" or not raw:
        return df
    ops = [o.strip() for o in raw.split(",") if o.strip()]
    bad = set(ops) - {"c", "u", "d", "t"}
    if bad:
        raise ValueError(
            f"skipped.operations: unknown op(s) {sorted(bad)} "
            "(allowed: c, u, d, t, none)"
        )
    return df.filter(~F.col(op_col).isin(ops))


def connector_bootstrap(
    spark: SparkSession,
    props: dict[str, str],
    changes: DataFrame,
    key: str,
    pos_col: str,
    snapshot_pos: int,
    state_exists: bool = False,
    op_col: str = "__op",
    offsets_valid: bool = True,
    channel=None,
) -> dict:
    """E2e composition of the connector's phases for one captured table,
    driven by ``snapshot.mode`` (Debezium startup semantics):

    1. SCHEMA phase — always runs, every mode (even ``never`` registers
       the captured schema so the stream can be decoded).
    2. SNAPSHOT phase — when the mode's plan says so: the table image
       as of ``snapshot_pos`` (latest state folded from the log up to
       it), stamped ``op='r'`` at that position — exactly what an
       initial backfill SELECT sees.
    3. STREAMING phase — when the plan says so: change events with
       position > ``snapshot_pos`` (offsets begin where the snapshot
       ended), folded together with the backfill into current state.

    Mode consequences a consumer observes (asserted in
    tests/test_streaming.py): ``no_data``/``never`` emit ZERO op='r'
    rows yet the stream still folds (keys untouched after
    ``snapshot_pos`` are simply absent — "start fresh from the log");
    ``initial_only`` stops after the backfill (state = the snapshot
    image, no later change applied); ``when_needed`` backfills only
    when no committed state exists.

    Returns ``{"mode", "run_snapshot", "run_stream", "schema",
    "backfill", "state"}`` — ``backfill`` is None when the snapshot
    phase is skipped; ``state`` is the folded outcome of whichever
    phases ran."""
    from .cdc.materialize import materialize_latest

    plan = snapshot_mode_plan(props, state_exists, offsets_valid)
    out: dict = {
        "mode": props.get("snapshot.mode", "initial"),
        **plan,
        "schema": changes.schema,  # schema phase: always registered
        "backfill": None,
        "state": None,
    }
    delivered = None
    if plan["run_snapshot"]:
        # public Debezium emits "Initial Snapshot" aggregate
        # notifications (STARTED/COMPLETED; SKIPPED when the mode's
        # plan runs no backfill) — same channel as the incremental tier
        if channel is not None:
            channel.notify("Initial Snapshot", "STARTED",
                           position=snapshot_pos)
        out["backfill"] = (
            materialize_latest(
                changes.filter(F.col(pos_col) <= snapshot_pos),
                [key], [pos_col], op_col,
            )
            .withColumn(pos_col, F.lit(snapshot_pos).cast("long"))
            .withColumn(op_col, F.lit("r"))
        )
        delivered = out["backfill"]
        if channel is not None:
            channel.notify("Initial Snapshot", "COMPLETED",
                           position=snapshot_pos)
    elif channel is not None:
        channel.notify("Initial Snapshot", "SKIPPED",
                       position=snapshot_pos,
                       reason=out["mode"])
    if plan["run_stream"]:
        stream = apply_skipped_operations(
            changes.filter(F.col(pos_col) > snapshot_pos), props, op_col
        )
        delivered = (
            stream if delivered is None
            else delivered.unionByName(stream)
        )
    if delivered is not None:
        out["state"] = materialize_latest(
            delivered, [key], [pos_col], op_col
        )
    return out


def incremental_snapshot_plan(props: dict[str, str],
                              table_rows: int) -> dict[str, int]:
    """``incremental.snapshot.chunk.size`` (public Debezium, default
    1024 rows) → chunk count for ``cdc.incremental_snapshot.
    chunk_bounds`` / the lifecycle runner. The chunk is the unit of
    bounded work AND the commit granularity, so this one key is the
    user's operability dial: smaller chunks = finer pause/resume and
    smaller re-scan on fault, more commit overhead."""
    size = int(props.get("incremental.snapshot.chunk.size", "1024"))
    if size <= 0:
        raise ValueError("incremental.snapshot.chunk.size must be positive")
    return {
        "chunk_size": size,
        "n_chunks": max(1, -(-int(table_rows) // size)),  # ceil div
    }


def signal_config(props: dict[str, str]) -> dict:
    """Signal-channel wiring keys (public Debezium): ``signal.data.
    collection`` names the watched signal table/topic (→ the directory
    ``streaming.sources.signal_file_stream`` tails in this engine);
    ``signal.enabled.channels`` lists the active channels (``source``
    = the signal table; ``file``/``kafka`` analogs map onto the same
    stream source here)."""
    return {
        "collection": props.get("signal.data.collection"),
        "enabled_channels": _csv(
            props.get("signal.enabled.channels", "source")
        ),
    }


def streaming_options(props: dict[str, str]) -> dict[str, str]:
    """Debezium batching/backpressure tuning → Spark reader options
    (SURVEY.md §4.1 row 4: max.batch.size etc. are Debezium's only
    throughput knobs; Structured Streaming's per-trigger caps are the
    direct analog — applied via ``reader.options(**streaming_options(p))``).

    - ``max.batch.size``       → ``maxOffsetsPerTrigger`` (Kafka) and
                                  ``maxFilesPerTrigger`` stays caller-set
    - ``poll.interval.ms``     → trigger processingTime (returned under
                                  the pseudo-key ``_trigger_ms`` for the
                                  writer side)
    - ``max.queue.size``       → no direct analog: Spark's micro-batch
                                  admission replaces the bounded queue;
                                  ignored with a comment, not an error.
    - ``heartbeat.interval.ms``→ ``_heartbeat_rps`` (pseudo-key): rate
                                  for ``heartbeat_source`` (A6) so quiet
                                  tables still advance offsets at the
                                  configured cadence.
    """
    out: dict[str, str] = {}
    if v := props.get("max.batch.size"):
        out["maxOffsetsPerTrigger"] = v
    if v := props.get("poll.interval.ms"):
        out["_trigger_ms"] = v
    if v := props.get("heartbeat.interval.ms"):
        out["_heartbeat_rps"] = str(max(1, round(1000 / int(v))))
    return out


@register(
    "cdc_connector_e2e",
    oracle="""
WITH log AS (
  SELECT user_id, event_id AS pos, value, '****' AS props,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
              WHEN 'view' THEN 'r' ELSE 'u' END AS op
  FROM events
  WHERE user_id % 10 <> 7
)
SELECT user_id, value, props FROM (
  SELECT user_id, value, props, op,
         row_number() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn
  FROM log
) WHERE rn = 1 AND op <> 'd'
ORDER BY user_id
""",
)
def cdc_connector_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connector front end END TO END under one differential: the
    captured table resolved from ``table.include.list``, column
    policies (``column.mask.with.4.chars``) applied to the change
    stream, the property-driven Filter SMT, and the two-phase
    ``snapshot.mode=initial`` bootstrap (backfill image at position
    600, streaming after it) folded to current state. The oracle folds
    the masked+filtered log DIRECTLY — equality proves the
    snapshot+stream split is invisible (image rows re-stamped at the
    snapshot position can never beat a later streamed change), the
    mask reached BOTH phases, and the filter semantics match Debezium's
    (filtered events simply never existed for the consumer)."""
    from .cdc.envelope import OP_CASE

    props = {
        "table.include.list": "events",
        "column.mask.with.4.chars": "events.props",
        "transforms": "f",
        "transforms.f.type": "io.debezium.transforms.Filter",
        "transforms.f.condition": "user_id % 10 <> 7",
    }
    cfg = parse_config(props)
    (captured,) = captured_tables(cfg, available=list(TABLES))
    ev = table(spark, sf_dir, captured)
    changes = ev.select(
        "user_id",
        "value",
        "props",
        F.col("event_id").alias("__pos"),
        F.expr(OP_CASE).alias("__op"),
    )
    changes = apply_column_policies(changes, captured, cfg)
    changes = transform_chain(changes, cfg)
    boot = connector_bootstrap(
        spark, props, changes, "user_id", "__pos", snapshot_pos=600
    )
    return (
        boot["state"]
        .select("user_id", "value", "props")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# topic.creation.* — Connect topic auto-creation groups (public Debezium
# config: docs "Customization of Kafka Connect automatic topic creation")
# ---------------------------------------------------------------------------


def topic_creation_settings(
    props: dict[str, str], topic: str
) -> dict[str, object]:
    """Resolve the auto-creation settings for ``topic``.

    Public semantics: ``topic.creation.groups`` lists custom groups in
    PRIORITY order; a topic gets the FIRST group whose ``include``
    regex list matches it and whose ``exclude`` list does not; topics
    matching no group fall through to the ``default`` group.
    ``default`` needs no include (it is the catch-all and may not
    declare one); every custom group MUST declare ``include`` —
    silently matching nothing would hide a config typo, so that is a
    loud error, as is listing ``default`` among the custom groups.
    Per-group keys override the default's; ``partitions`` /
    ``replication.factor`` surface as ints, anything else (e.g.
    ``cleanup.policy``) passes through as topic-level config.

    Offline-provable config semantics: the broker round-trip is the
    jar-gated Kafka wire (A1/A7); the resolution rule is what this
    models, the same way signal/notification channels are modeled."""
    import re as _re

    if props.get("topic.creation.enable", "true").lower() == "false":
        return {"enabled": False, "group": None, "config": {}}

    def _group_keys(group: str) -> dict[str, str]:
        prefix = f"topic.creation.{group}."
        return {
            k[len(prefix):]: v
            for k, v in props.items()
            if k.startswith(prefix)
        }

    groups = _csv(props.get("topic.creation.groups", ""))
    if "default" in groups:
        raise ValueError(
            "topic.creation.groups must not list 'default' — it is "
            "the implicit catch-all group"
        )
    chosen = "default"
    for g in groups:
        keys = _group_keys(g)
        if "include" not in keys:
            raise ValueError(
                f"topic.creation group '{g}' declares no include "
                f"patterns — it would silently match nothing"
            )
        inc = [p.strip() for p in keys["include"].split(",") if p.strip()]
        exc = [
            p.strip()
            for p in keys.get("exclude", "").split(",")
            if p.strip()
        ]
        if any(_re.fullmatch(p, topic) for p in inc) and not any(
            _re.fullmatch(p, topic) for p in exc
        ):
            chosen = g
            break
    merged = _group_keys("default")
    if chosen != "default":
        merged.update(_group_keys(chosen))
    merged.pop("include", None)
    merged.pop("exclude", None)
    config: dict[str, object] = {}
    for k, v in merged.items():
        config[k] = (
            int(v) if k in ("partitions", "replication.factor") else v
        )
    return {"enabled": True, "group": chosen, "config": config}


# ---------------------------------------------------------------------------
# converters — Debezium's custom converter SPI (public: the
# `CustomConverter` interface + `converters=<name>` / `<name>.type` /
# `<name>.*` property contract)
# ---------------------------------------------------------------------------

#: registered converter factories: type-name → factory(params) →
#: (matcher(table, column, dtype) -> bool,
#:  convert(Column) -> Column, output_dtype: str | None).
CONVERTER_TYPES: dict[str, object] = {}


def register_converter_type(name: str):
    """Register a converter factory under the name users reference via
    ``<converter>.type`` — the engine analog of putting a
    CustomConverter implementation on the connector classpath."""
    def deco(factory):
        CONVERTER_TYPES[name] = factory
        return factory

    return deco


def apply_custom_converters(
    df: DataFrame, table_name: str, props: dict[str, str]
) -> DataFrame:
    """Apply the ``converters=a,b`` chain, Debezium-shaped.

    Public semantics honored: ``converters`` lists instance names in
    APPLICATION ORDER; each instance resolves its implementation via
    ``<name>.type`` (an unregistered type refuses loudly — the
    classpath-missing error) and receives every other ``<name>.*``
    property as its parameters; each converter's matcher is consulted
    PER COLUMN with (table, column, Spark dtype simpleString) and, on
    registration, rewrites that column's value (and schema — Debezium
    converters override the SchemaBuilder too). A converter that
    matches nothing is fine (Debezium logs, we no-op); a declared
    instance with no ``.type`` refuses."""
    names = _csv(props.get("converters", ""))
    for name in names:
        type_key = f"{name}.type"
        if type_key not in props:
            raise ValueError(
                f"converter '{name}' declares no {type_key}"
            )
        tname = props[type_key]
        if tname not in CONVERTER_TYPES:
            raise ValueError(
                f"converter type '{tname}' is not registered "
                f"(known: {sorted(CONVERTER_TYPES)})"
            )
        params = {
            k[len(name) + 1:]: v
            for k, v in props.items()
            if k.startswith(f"{name}.") and k != type_key
        }
        matcher, convert, out_dtype = CONVERTER_TYPES[tname](params)
        for f_ in df.schema.fields:
            if matcher(table_name, f_.name, f_.dataType.simpleString()):
                col = convert(F.col(f_.name))
                if out_dtype is not None:
                    col = col.cast(out_dtype)
                df = df.withColumn(f_.name, col)
    return df


@register_converter_type("epoch-days-to-iso")
def _epoch_days_converter(params: dict[str, str]):
    """Reference converter (the Debezium tutorial's date-to-string
    shape): integer epoch-day columns whose names match
    ``columns`` (csv) render as ISO yyyy-MM-dd strings."""
    cols = set(_csv(params.get("columns", "")))

    def matcher(table: str, column: str, dtype: str) -> bool:
        return column in cols and dtype in ("int", "bigint")

    def convert(c):
        # date_add accepts only INT-or-narrower for the day count; the
        # matcher admits bigint epoch-day columns, so cast first. The
        # cast is non-ANSI: a bigint outside int32 would silently WRAP
        # into a plausible-but-wrong date (r10 ADVICE), so out-of-range
        # epoch-days surface as NULL instead.
        days = F.when(c.between(-2147483648, 2147483647), c.cast("int"))
        return F.date_format(
            F.date_add(F.lit("1970-01-01"), days), "yyyy-MM-dd"
        )

    return matcher, convert, "string"


@register_converter_type("money-cents-to-decimal")
def _money_cents_converter(params: dict[str, str]):
    """Reference converter: integer cent columns (suffix-matched) to
    DECIMAL(18,2) units — the classic money normalization."""
    suffix = params.get("suffix", "_cents")

    def matcher(table: str, column: str, dtype: str) -> bool:
        return column.endswith(suffix) and dtype in ("int", "bigint")

    def convert(c):
        return c.cast("decimal(18,2)") / F.lit(100).cast("decimal(18,2)")

    return matcher, convert, "decimal(18,2)"
