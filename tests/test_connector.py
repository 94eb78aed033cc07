"""Connector-properties front end: Debezium config keys must drive the
engine's operators with Debezium's semantics (include-wins, regex
fullmatch on table.column, ordered SMT chain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.envelope import to_envelope, unwrap
from debezium_incubator_spark.connector import (
    captured_tables,
    parse_config,
    snapshot,
    transform_chain,
)

from .conftest import SF_SMOKE


def test_table_include_exclude_regexes():
    inc = parse_config({"table.include.list": "order.*, nation"})
    assert captured_tables(inc, ["orders", "nation", "customer"]) == [
        "orders", "nation",
    ]
    exc = parse_config({"table.exclude.list": "events|documents|embeddings"})
    got = captured_tables(exc, ["orders", "events", "documents"])
    assert got == ["orders"]
    # include wins over exclude (Debezium forbids both; include governs)
    both = parse_config(
        {"table.include.list": "nation", "table.exclude.list": "nation"}
    )
    assert captured_tables(both, ["nation", "region"]) == ["nation"]


def test_snapshot_column_policies(spark):
    props = {
        "table.include.list": "nation",
        "column.exclude.list": r"nation\.n_regionkey",
        "column.truncate.to.3.chars": r"nation\.n_name",
    }
    out = snapshot(spark, SF_SMOKE, props)
    assert list(out) == ["nation"]
    df = out["nation"]
    assert df.columns == ["n_nationkey", "n_name"]
    assert df.filter(F.length("n_name") > 3).count() == 0


def test_message_key_columns(spark):
    props = {
        "table.include.list": "orders",
        "message.key.columns": "orders:o_orderkey,o_custkey",
    }
    df = snapshot(spark, SF_SMOKE, props)["orders"]
    assert "__key" in df.columns
    row = df.select("__key").first()
    assert row["__key"]["o_orderkey"] is not None


def test_transform_chain_matches_direct_composition(spark):
    env = to_envelope(table(spark, SF_SMOKE, "events")).withColumn(
        "topic", F.lit("srv1.testdb.events")
    )
    props = {
        "transforms": "unwrap,keep,route",
        "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
        "transforms.unwrap.drop.tombstones": "true",
        "transforms.keep.type": "io.debezium.transforms.Filter",
        "transforms.keep.condition": "value > 50.0",
        "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": r"srv1\.testdb\.(.*)",
        "transforms.route.replacement": "cdc.$1",
    }
    got = transform_chain(env, props)
    assert got.select("topic").distinct().collect()[0].topic == "cdc.events"
    want = unwrap(env, drop_deletes=True).filter(F.col("value") > 50.0)
    assert got.count() == want.count() > 0


def test_unknown_transform_type_raises(spark):
    env = to_envelope(table(spark, SF_SMOKE, "events"))
    props = {
        "transforms": "x",
        "transforms.x.type": "com.example.Unknown",
    }
    try:
        transform_chain(env, props)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "Unknown" in str(e)


def test_type_handling_modes(spark):
    """decimal/time.precision/binary handling modes coerce by schema
    introspection, preserving Debezium's key names and semantics."""
    import datetime
    from decimal import Decimal

    from pyspark.sql import types as T

    from debezium_incubator_spark.connector import type_handling_casts

    schema = T.StructType([
        T.StructField("amt", T.DecimalType(10, 2)),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("blob", T.BinaryType()),
    ])
    df = spark.createDataFrame(
        [(Decimal("12.34"),
          datetime.datetime(2024, 1, 1, 12, 0, 0, 123456),
          b"\x01\xab")],
        schema,
    )

    kept = type_handling_casts(df, {})
    assert dict(kept.dtypes) == {"amt": "decimal(10,2)", "ts": "timestamp_ntz",
                                 "blob": "binary"}
    r = kept.first()
    assert r.ts.microsecond == 123456  # adaptive: source precision kept

    dbl = type_handling_casts(df, {"decimal.handling.mode": "double"})
    assert dict(dbl.dtypes)["amt"] == "double"
    assert dbl.first().amt == 12.34

    s = type_handling_casts(df, {"decimal.handling.mode": "string"})
    assert dict(s.dtypes)["amt"] == "string"
    assert s.first().amt == "12.34"

    ms = type_handling_casts(df, {"time.precision.mode": "connect"})
    assert dict(ms.dtypes)["ts"] == "timestamp_ntz"
    assert ms.first().ts.microsecond == 123000  # truncated to ms

    b64 = type_handling_casts(df, {"binary.handling.mode": "base64"})
    assert b64.first().blob == "Aas="
    hx = type_handling_casts(df, {"binary.handling.mode": "hex"})
    assert hx.first().blob == "01ab"

    import pytest

    with pytest.raises(ValueError, match="unsupported mode"):
        type_handling_casts(df, {"decimal.handling.mode": "bogus"})


def test_skipped_operations(spark):
    """`skipped.operations` drops the named op types from the streamed
    phase only: skipping 'd' keeps a deleted key alive in folded state;
    default ('t') and 'none' change nothing on a c/u/d log; snapshot
    'r' rows are never skippable; unknown ops raise."""
    import pytest

    from debezium_incubator_spark.connector import (
        apply_skipped_operations,
        connector_bootstrap,
    )

    log = spark.createDataFrame(
        [
            (1, "a", 10, "c"),
            (1, "a2", 11, "u"),
            (2, "b", 12, "c"),
            (2, None, 13, "d"),
        ],
        "k INT, v STRING, pos LONG, __op STRING",
    )
    # default 't' and 'none' are no-ops on a c/u/d log
    assert apply_skipped_operations(log, {}).count() == 4
    assert apply_skipped_operations(
        log, {"skipped.operations": "none"}).count() == 4
    # skip deletes → key 2 survives the fold
    out = connector_bootstrap(
        spark, {"snapshot.mode": "no_data", "skipped.operations": "d"},
        log, key="k", pos_col="pos", snapshot_pos=0,
    )
    state = {r.k: r.v for r in out["state"].collect()}
    assert state == {1: "a2", 2: "b"}
    # without skipping, the delete wins
    out2 = connector_bootstrap(
        spark, {"snapshot.mode": "no_data"},
        log, key="k", pos_col="pos", snapshot_pos=0,
    )
    assert {r.k: r.v for r in out2["state"].collect()} == {1: "a2"}
    with pytest.raises(ValueError, match="skipped.operations"):
        apply_skipped_operations(log, {"skipped.operations": "d,x"})


def test_transform_chain_new_smts(spark):
    """Config-driven chain supports add.fields on ExtractNewRecordState
    and the ExtractChangedRecordState type (row schema introspected
    from the envelope), equal to direct composition."""
    from debezium_incubator_spark.cdc.envelope import (
        EVENT_ROW_SCHEMA,
        changed_record_state,
        to_envelope,
        unwrap,
    )
    from debezium_incubator_spark.connector import transform_chain

    ev = table(spark, SF_SMOKE, "events").limit(200)
    env = to_envelope(ev)

    props = {
        "transforms": "unwrap",
        "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
        "transforms.unwrap.add.fields": "source.table, source.pos",
    }
    got = transform_chain(env, props)
    want = unwrap(env, drop_deletes=True,
                  add_fields=["source.table", "source.pos"])
    assert got.columns == want.columns
    assert "__source_table" in got.columns
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    props2 = {
        "transforms": "delta",
        "transforms.delta.type":
            "io.debezium.transforms.ExtractChangedRecordState",
    }
    got2 = transform_chain(env, props2)
    want2 = changed_record_state(env, EVENT_ROW_SCHEMA)
    assert got2.columns == want2.columns
    a = {r.key.id: list(r["__changed"]) for r in got2.collect()}
    b = {r.key.id: list(r["__changed"]) for r in want2.collect()}
    assert a == b


def test_transform_chain_drives_new_smts_from_properties(spark):
    """The Debezium properties file is the API: PartitionRouting,
    HeaderToValue, and TimezoneConverter run from `transforms.*` keys
    exactly like the Connect worker would load them — chained in the
    declared order over one frame."""
    import datetime as dt

    from pyspark.sql import functions as F

    from debezium_incubator_spark.connector import transform_chain

    df = spark.createDataFrame(
        [
            (1, "alpha", dt.datetime(2024, 1, 15, 12, 0),
             {"corr": "c-1", "keep": "k"}),
            (2, "beta", dt.datetime(2024, 7, 15, 12, 0),
             {"corr": "c-2", "keep": "k"}),
        ],
        "id LONG, name STRING, ts TIMESTAMP_NTZ, headers MAP<STRING,STRING>",
    )
    props = {
        "transforms": "part,lift,tz",
        "transforms.part.type":
            "io.debezium.transforms.partitions.PartitionRouting",
        "transforms.part.partition.payload.fields": "name",
        "transforms.part.partition.topic.num": "4",
        "transforms.lift.type": "io.debezium.transforms.HeaderToValue",
        "transforms.lift.headers": "corr",
        "transforms.lift.fields": "correlation",
        "transforms.lift.operation": "move",
        "transforms.tz.type": "io.debezium.transforms.TimezoneConverter",
        "transforms.tz.converted.timezone": "America/Chicago",
        "transforms.tz.include.list": "ts",
    }
    out = {r.id: r for r in transform_chain(df, props).collect()}
    assert 0 <= out[1]["__partition"] < 4
    # same payload field value -> same partition on a second run
    again = {r.id: r for r in transform_chain(df, props).collect()}
    assert out[1]["__partition"] == again[1]["__partition"]
    assert out[1].correlation == "c-1" and out[2].correlation == "c-2"
    assert set(out[1].headers) == {"keep"}  # move removed corr
    assert out[1].ts.hour == 6 and out[2].ts.hour == 7  # CST vs CDT


def test_propagate_source_types_metadata(spark):
    """column.propagate.source.type: the original database type rides
    the schema as field metadata, scoped by the config's regex list,
    and SURVIVES projection (a consumer three selects downstream can
    still build faithful DDL)."""
    from debezium_incubator_spark.connector import propagate_source_types

    df = spark.createDataFrame(
        [(1, 9.5, "x")], "id LONG, price DOUBLE, note STRING"
    )
    out = propagate_source_types(
        df,
        {"price": "NUMERIC(10,2)", "note": "VARCHAR2(40)", "id": "BIGINT"},
        patterns=["price", "note"],
    )
    meta = {f.name: f.metadata for f in out.schema.fields}
    assert meta["price"] == {"__debezium.source.column.type": "NUMERIC(10,2)"}
    assert meta["note"] == {"__debezium.source.column.type": "VARCHAR2(40)"}
    assert meta["id"] == {}  # scoped out by the pattern list

    projected = out.select("price")
    assert projected.schema.fields[0].metadata == {
        "__debezium.source.column.type": "NUMERIC(10,2)"
    }


def test_heartbeat_action_query_runs_per_tick(spark, tmp_path):
    """heartbeat.action.query: the action runs once per heartbeat
    micro-batch (the WAL-advancing side effect on an idle source), not
    per row; the query stops cleanly."""
    import time

    from debezium_incubator_spark.streaming.sources import (
        start_heartbeat_action,
    )

    ran = []
    q = start_heartbeat_action(
        spark, str(tmp_path / "ckpt"),
        action=lambda s, bid: ran.append(bid),
        rows_per_second=10,
    )
    try:
        deadline = time.time() + 60
        while len(ran) < 2 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(ran) >= 2  # fired on successive ticks


def test_field_name_adjustment_modes(spark):
    """field.name.adjustment.mode: avro replaces invalid chars with _,
    avro_unicode escapes reversibly, nested struct fields included,
    collisions refuse loudly, none is identity."""
    from debezium_incubator_spark.connector import adjust_field_names

    df = spark.createDataFrame(
        [(1, 2, (3,))],
        "`a-b` LONG, `9lives` LONG, `nest` STRUCT<`x.y`: LONG>",
    )
    out = adjust_field_names(df, {"field.name.adjustment.mode": "avro"})
    assert out.columns == ["a_b", "_lives", "nest"]
    assert out.schema["nest"].dataType.fieldNames() == ["x_y"]
    assert out.select("nest.x_y").first()[0] == 3

    uni = adjust_field_names(
        df, {"field.name.adjustment.mode": "avro_unicode"}
    )
    assert uni.columns == ["a_u002db", "_u0039lives", "nest"]
    assert uni.schema["nest"].dataType.fieldNames() == ["x_u002ey"]

    same = adjust_field_names(df, {})
    assert same.columns == df.columns

    clash = spark.createDataFrame([(1, 2)], "`a-b` LONG, `a.b` LONG")
    import pytest as _pt
    with _pt.raises(ValueError, match="collides"):
        adjust_field_names(
            clash, {"field.name.adjustment.mode": "avro"}
        )


def test_debezium_filter_without_condition_raises(spark):
    """Round-7 ADVICE: io.debezium.transforms.Filter REQUIRES a
    condition — a missing/typo'd key must raise, not silently drop
    every record. Only the Connect-core Filter (which has no condition
    by contract, pairing with a predicate) keeps the drop-all default."""
    import pytest

    from debezium_incubator_spark.connector import transform_chain

    env = to_envelope(table(spark, SF_SMOKE, "events")).withColumn(
        "topic", F.lit("srv1.testdb.events")
    )
    with pytest.raises(ValueError, match="requires a 'condition'"):
        transform_chain(env, {
            "transforms": "f",
            "transforms.f.type": "io.debezium.transforms.Filter",
            # note: no transforms.f.condition
        })
    # Connect-core Filter without a condition: drop-all is the contract
    out = transform_chain(env, {
        "transforms": "f",
        "transforms.f.type": "org.apache.kafka.connect.transforms.Filter",
    })
    assert out.count() == 0


def test_topic_creation_group_resolution():
    import pytest

    from debezium_incubator_spark.connector import topic_creation_settings

    props = {
        "topic.creation.default.replication.factor": "3",
        "topic.creation.default.partitions": "10",
        "topic.creation.groups": "inventory, applicationlogs",
        "topic.creation.inventory.include": r"dbserver1\.inventory\..*",
        "topic.creation.inventory.partitions": "20",
        "topic.creation.applicationlogs.include": r"dbserver1\.logs\..*",
        "topic.creation.applicationlogs.exclude": r"dbserver1\.logs\.secret.*",
        "topic.creation.applicationlogs.cleanup.policy": "delete",
    }
    # first matching group wins, its keys override default's
    r = topic_creation_settings(props, "dbserver1.inventory.orders")
    assert r["group"] == "inventory"
    assert r["config"]["partitions"] == 20
    assert r["config"]["replication.factor"] == 3  # inherited
    # exclude beats include within a group → falls through to default
    r = topic_creation_settings(props, "dbserver1.logs.secretstuff")
    assert r["group"] == "default"
    assert r["config"] == {"replication.factor": 3, "partitions": 10}
    # non-matching topic → default
    r = topic_creation_settings(props, "dbserver1.other.t")
    assert r["group"] == "default"
    # pass-through topic-level config keys survive as strings
    r = topic_creation_settings(props, "dbserver1.logs.app")
    assert r["group"] == "applicationlogs"
    assert r["config"]["cleanup.policy"] == "delete"
    # disabled → inert
    off = dict(props)
    off["topic.creation.enable"] = "false"
    assert topic_creation_settings(off, "x")["enabled"] is False

    # a group with no include is a loud error, not a silent no-match
    bad = dict(props)
    del bad["topic.creation.inventory.include"]
    with pytest.raises(ValueError, match="declares no include"):
        topic_creation_settings(bad, "dbserver1.inventory.orders")

    # 'default' must not be listed as a custom group
    bad2 = dict(props)
    bad2["topic.creation.groups"] = "default,inventory"
    with pytest.raises(ValueError, match="must not list 'default'"):
        topic_creation_settings(bad2, "anything")


def test_custom_converter_spi(spark):
    """Debezium CustomConverter SPI contract: instance chain in
    declared order, <name>.type resolution with loud classpath-missing
    refusal, <name>.* params delivered, per-column matcher on
    (table, column, dtype), value AND schema override."""
    import pytest
    from decimal import Decimal

    from debezium_incubator_spark.connector import apply_custom_converters

    df = spark.createDataFrame(
        [(1, 19000, 19000, 1999, "x")],
        "id LONG, d INT, d_big LONG, amount_cents LONG, name STRING",
    )
    props = {
        "converters": "dates, money",
        "dates.type": "epoch-days-to-iso",
        "dates.columns": "d,d_big",
        "money.type": "money-cents-to-decimal",
        "money.suffix": "_cents",
    }
    out = apply_custom_converters(df, "orders", props)
    row = out.collect()[0]
    assert row["d"] == "2022-01-08"  # 19000 days from epoch
    # the advertised BIGINT path (r9 ADVICE): date_add needs an INT
    # day count — the converter must cast, not AnalysisException
    assert row["d_big"] == "2022-01-08"
    assert row["amount_cents"] == Decimal("19.99")
    assert row["name"] == "x" and row["id"] == 1
    # schema override happened, not just the value
    types = dict((f.name, f.dataType.simpleString()) for f in out.schema)
    assert types["d"] == "string"
    assert types["d_big"] == "string"
    assert types["amount_cents"] == "decimal(18,2)"

    # matcher consults dtype: a STRING column named 'd' is untouched
    df2 = spark.createDataFrame([("notadate",)], "d STRING")
    out2 = apply_custom_converters(df2, "orders", props)
    assert out2.collect()[0]["d"] == "notadate"

    # out-of-int32 epoch-days surface as NULL (r10 ADVICE) — the bare
    # cast would wrap 2^31+5 to a plausible-but-wrong date string
    df3 = spark.createDataFrame([(2**31 + 5,), (-(2**31) - 1,), (19000,)],
                                "d LONG")
    got = {r["d"] for r in
           apply_custom_converters(df3, "orders", props).collect()}
    assert got == {None, "2022-01-08"}

    # unregistered type = the classpath-missing error, loud
    with pytest.raises(ValueError, match="not registered"):
        apply_custom_converters(
            df, "orders", {"converters": "x", "x.type": "nope"}
        )
    # declared instance with no .type is loud
    with pytest.raises(ValueError, match="declares no x.type"):
        apply_custom_converters(df, "orders", {"converters": "x"})
    # empty converters list is inert
    assert apply_custom_converters(df, "orders", {}).collect() == df.collect()
