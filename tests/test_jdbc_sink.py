"""JDBC sink connector config semantics over the upsert tier:
primary.key.mode, insert.mode, delete.enabled, schema.evolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_incubator_spark.cdc.jdbc_sink import jdbc_sink_apply
from debezium_incubator_spark.streaming.upsert import read_state


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k LONG, v DOUBLE, __op STRING, pos LONG"
    )


def _rows(spark, state_dir):
    df = read_state(spark, state_dir)
    return {r.k: r.v for r in df.collect()} if df is not None else {}


def test_upsert_mode_with_delete_toggle(spark, tmp_path):
    """upsert folds by position; delete.enabled=false makes delete
    events invisible (the key survives), =true drops the key."""
    base = {"primary.key.mode": "record_value",
            "primary.key.fields": "k", "insert.mode": "upsert"}
    for flag, expect in (("true", {2: 2.0}), ("false", {1: 1.0, 2: 2.0})):
        sd = str(tmp_path / f"t_{flag}")
        jdbc_sink_apply(
            spark, _batch(spark, [(1, 1.0, "c", 1), (2, 2.0, "c", 2)]),
            0, sd, base | {"delete.enabled": flag}, ["pos"],
        )
        jdbc_sink_apply(
            spark, _batch(spark, [(1, 0.0, "d", 3)]),
            1, sd, base | {"delete.enabled": flag}, ["pos"],
        )
        assert _rows(spark, sd) == expect, flag


def test_update_mode_never_inserts(spark, tmp_path):
    """insert.mode=update: existing keys change, unknown keys are
    dropped (SQL UPDATE semantics) — including against an empty
    target."""
    props = {"primary.key.mode": "record_value",
             "primary.key.fields": "k", "insert.mode": "update"}
    sd = str(tmp_path / "upd")
    jdbc_sink_apply(spark, _batch(spark, [(1, 9.0, "u", 1)]),
                    0, sd, props, ["pos"])
    assert _rows(spark, sd) == {}  # empty target: no-op

    up = {"primary.key.mode": "record_value",
          "primary.key.fields": "k", "insert.mode": "upsert"}
    jdbc_sink_apply(spark, _batch(spark, [(1, 1.0, "c", 2)]),
                    1, sd, up, ["pos"])
    jdbc_sink_apply(
        spark, _batch(spark, [(1, 5.0, "u", 3), (2, 7.0, "c", 3)]),
        2, sd, props, ["pos"],
    )
    assert _rows(spark, sd) == {1: 5.0}  # 1 updated, 2 never inserted


def test_insert_mode_appends_everything(spark, tmp_path):
    """insert.mode=insert is the audit-log target: duplicates and
    superseded versions all persist as rows."""
    props = {"primary.key.mode": "record_value",
             "primary.key.fields": "k", "insert.mode": "insert"}
    sd = str(tmp_path / "ins")
    jdbc_sink_apply(spark, _batch(spark, [(1, 1.0, "c", 1)]),
                    0, sd, props, ["pos"])
    jdbc_sink_apply(spark, _batch(spark, [(1, 2.0, "u", 2)]),
                    1, sd, props, ["pos"])
    df = read_state(spark, sd, include_tombstones=True)
    assert df.count() == 2  # both versions retained


def test_record_key_mode_flattens_key_struct(spark, tmp_path):
    props = {"primary.key.mode": "record_key", "insert.mode": "upsert"}
    sd = str(tmp_path / "rk")
    batch = spark.createDataFrame(
        [((7,), 1.5, "c", 1)],
        "key STRUCT<id LONG>, v DOUBLE, __op STRING, pos LONG",
    )
    jdbc_sink_apply(spark, batch, 0, sd, props, ["pos"])
    got = read_state(spark, sd).collect()
    assert [(r.id, r.v) for r in got] == [(7, 1.5)]

    with pytest.raises(ValueError, match="record_key"):
        jdbc_sink_apply(
            spark, _batch(spark, [(1, 1.0, "c", 1)]), 1, sd, props, ["pos"]
        )


def test_schema_evolution_none_refuses_new_columns(spark, tmp_path):
    """schema.evolution=none fails loudly BEFORE any write when the
    batch carries columns the target lacks; =basic widens and old rows
    read NULL."""
    pv = {"primary.key.mode": "record_value", "primary.key.fields": "k",
          "insert.mode": "upsert"}
    sd = str(tmp_path / "evo")
    jdbc_sink_apply(spark, _batch(spark, [(1, 1.0, "c", 1)]),
                    0, sd, pv, ["pos"])
    wide = spark.createDataFrame(
        [(2, 2.0, "extra", "c", 2)],
        "k LONG, v DOUBLE, w STRING, __op STRING, pos LONG",
    )
    with pytest.raises(ValueError, match="schema.evolution=none"):
        jdbc_sink_apply(spark, wide, 1, sd,
                        pv | {"schema.evolution": "none"}, ["pos"])
    # refused BEFORE writing: target unchanged
    assert _rows(spark, sd) == {1: 1.0}

    jdbc_sink_apply(spark, wide, 1, sd,
                    pv | {"schema.evolution": "basic"}, ["pos"])
    got = {r.k: (r.v, r.w) for r in read_state(spark, sd).collect()}
    assert got == {1: (1.0, None), 2: (2.0, "extra")}


def test_source_to_sink_round_trip_capstone(spark, tmp_path):
    """The full pipeline a reference user runs: source connector
    bootstrap (snapshot.mode=initial: backfill image + streamed
    changes) delivers op-rows; the JDBC sink connector applies them in
    TWO micro-batches (the backfill, then the stream) in upsert mode —
    and the sink's target table equals the log's latest state exactly.
    Deletes streamed after the snapshot remove their keys from the
    target (delete.enabled=true end-to-end)."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.cdc.envelope import OP_CASE
    from debezium_incubator_spark.cdc.materialize import materialize_latest
    from debezium_incubator_spark.connector import connector_bootstrap

    from .conftest import SF_SMOKE

    ch = table(spark, SF_SMOKE, "events").select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("pos"),
        F.col("value").alias("v"),
        F.expr(OP_CASE).alias("__op"),
    ).cache()
    max_pos = ch.agg(F.max("pos")).first()[0]
    snapshot_pos = int(max_pos * 0.6)

    boot = connector_bootstrap(
        spark, {"snapshot.mode": "initial"}, ch, "k", "pos", snapshot_pos
    )
    sink_props = {"primary.key.mode": "record_value",
                  "primary.key.fields": "k", "insert.mode": "upsert",
                  "delete.enabled": "true"}
    sd = str(tmp_path / "target")
    jdbc_sink_apply(spark, boot["backfill"], 0, sd, sink_props, ["pos"])
    streamed = ch.filter(F.col("pos") > snapshot_pos)
    jdbc_sink_apply(spark, streamed, 1, sd, sink_props, ["pos"])

    got = {r.k: r.v for r in read_state(spark, sd).collect()}
    want = {
        r.k: r.v for r in materialize_latest(ch, ["k"], ["pos"]).collect()
    }
    assert got == want
    # a post-snapshot delete genuinely removed its key from the target
    deleted = {
        r.k for r in streamed.filter(F.col("__op") == "d").collect()
    } - {r.k for r in streamed.filter(
        (F.col("__op") != "d")
    ).join(
        streamed.filter(F.col("__op") == "d"), "k", "semi"
    ).groupBy("k").agg(F.max("pos").alias("p")).join(
        streamed.filter(F.col("__op") == "d").groupBy("k")
        .agg(F.max("pos").alias("dp")), "k"
    ).filter(F.col("p") > F.col("dp")).collect()}
    if deleted:
        assert not (deleted & set(got))
    ch.unpersist()
