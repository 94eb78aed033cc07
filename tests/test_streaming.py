"""Streaming smoke tests: stream results must equal the oracle-checked
batch twins on the same fixture data (SURVEY.md §7 M4)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.envelope import OP_CASE
from debezium_incubator_spark.events.analytics import sessionize
from debezium_incubator_spark.registry import all_queries
from debezium_incubator_spark.streaming.pipeline import (
    latest_state_stream,
    run_available_now,
    session_counts,
    tumbling_counts,
    watermark_dedup,
)
from debezium_incubator_spark.streaming.sources import events_file_stream

from .conftest import SF_SMOKE


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


def test_stream_tumbling_equals_batch(spark):
    stream = events_file_stream(spark, SF_SMOKE)
    run_available_now(tumbling_counts(stream), "t_tumbling")
    got = _sorted(spark.sql("SELECT * FROM t_tumbling").toPandas())
    want = all_queries()["e1_tumbling_window"](spark, SF_SMOKE).toPandas()
    # Append mode only emits windows finalized past the watermark — the
    # trailing window(s) within (max_ts - 10min) are correctly withheld.
    max_ts = table(spark, SF_SMOKE, "events").agg(F.max("ts")).first()[0]
    watermark = max_ts - pd.Timedelta(minutes=10)
    want = _sorted(
        want[want.bucket + pd.Timedelta(hours=1) <= watermark].reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_dedup_within_watermark(spark):
    stream = events_file_stream(spark, SF_SMOKE)
    deduped = watermark_dedup(stream, "ts", ["event_id"])
    run_available_now(deduped, "t_dedup")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM t_dedup").first()
    n_batch = table(spark, SF_SMOKE, "events").count()
    assert got.n == got.d == n_batch


def test_stream_session_equals_batch_sessionize(spark):
    stream = events_file_stream(spark, SF_SMOKE)
    run_available_now(session_counts(stream), "t_sessions", output_mode="append")
    got = _sorted(
        spark.sql(
            "SELECT user_id, session_start, n_events FROM t_sessions"
        ).toPandas()
    )
    # Batch twin: lag-gap sessionization; append mode withholds sessions
    # not yet closed past the watermark (end = last event + gap).
    ev = table(spark, SF_SMOKE, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    watermark = max_ts - pd.Timedelta(minutes=10)
    batch = (
        sessionize(ev, "user_id", "ts", 1_800_000_000)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
        )
        .toPandas()
    )
    batch = batch[
        batch.last_ts + pd.Timedelta(minutes=30) <= watermark
    ]
    batch = _sorted(batch[["user_id", "session_start", "n_events"]].reset_index(drop=True))
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_latest_state_stream_matches_batch(spark):
    ev = table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
        F.expr(OP_CASE).alias("op"),
    )
    # stream the same rows through the stateful fold via an in-memory
    # file source round-trip: use availableNow over a temp parquet copy
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ev.write.mode("overwrite").parquet(f"{td}/changes")
        stream = spark.readStream.schema(ev.schema).parquet(f"{td}/changes")
        run_available_now(
            latest_state_stream(stream), "t_state", output_mode="update"
        )
        got = _sorted(
            spark.sql(
                "SELECT user_id, current_value, ts FROM t_state"
            ).toPandas()
        )
    batch = _sorted(
        ev.groupBy("user_id")
        .agg(
            F.expr("max_by(value, struct(ts_us, event_id))").alias("current_value"),
            F.max("ts_us").alias("ts"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_latest_state_tws_gated(spark):
    """TWS (Spark 4 transformWithStateInPandas) path: runs the full
    stream==batch check when protobuf exists; otherwise asserts the
    clear environment-gate error (this container has no protobuf)."""
    from debezium_incubator_spark.streaming.tws import (
        latest_state_tws,
        tws_available,
    )

    ev = table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
        F.expr(OP_CASE).alias("op"),
    )
    if not tws_available():
        with pytest.raises(ImportError, match="protobuf"):
            latest_state_tws(ev)
        return
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ev.write.mode("overwrite").parquet(f"{td}/changes")
        stream = spark.readStream.schema(ev.schema).parquet(f"{td}/changes")
        run_available_now(latest_state_tws(stream), "t_tws", output_mode="update")
        got = _sorted(
            spark.sql("SELECT user_id, current_value, ts FROM t_tws").toPandas()
        )
    batch = _sorted(
        ev.groupBy("user_id")
        .agg(
            F.expr("max_by(value, struct(ts_us, event_id))").alias("current_value"),
            F.max("ts_us").alias("ts"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_snapshot_mode_plan():
    from debezium_incubator_spark.connector import snapshot_mode_plan

    def plan(props, **kw):
        full = snapshot_mode_plan(props, **kw)
        return {k: full[k] for k in ("run_snapshot", "run_stream")}

    assert plan({}) == {"run_snapshot": True, "run_stream": True}
    assert plan({"snapshot.mode": "initial_only"}) == {
        "run_snapshot": True, "run_stream": False,
    }
    assert plan({"snapshot.mode": "never"}) == {
        "run_snapshot": False, "run_stream": True,
    }
    # always: data snapshot on EVERY start, even with healthy state
    assert plan({"snapshot.mode": "always"}, state_exists=True,
                offsets_valid=True) == {
        "run_snapshot": True, "run_stream": True,
    }
    # recovery: schema-history repair only — no data snapshot, stream
    # resumes; requires usable offsets (else it would skip changes)
    rec = snapshot_mode_plan({"snapshot.mode": "recovery"},
                             state_exists=True, offsets_valid=True)
    assert rec == {"run_snapshot": False, "run_stream": True,
                   "rebuild_schema_history": True}
    with pytest.raises(ValueError, match="recovery requires"):
        snapshot_mode_plan({"snapshot.mode": "recovery"},
                           state_exists=True, offsets_valid=False)
    assert snapshot_mode_plan({"snapshot.mode": "when_needed"},
                              state_exists=True)["run_snapshot"] is False
    assert snapshot_mode_plan({"snapshot.mode": "when_needed"},
                              state_exists=False)["run_snapshot"] is True
    with pytest.raises(ValueError, match="snapshot.mode"):
        snapshot_mode_plan({"snapshot.mode": "bogus"})


def test_streaming_progress_metrics(spark):
    from debezium_incubator_spark.streaming.metrics import (
        history_metrics,
        progress_metrics,
    )

    stream = events_file_stream(spark, SF_SMOKE)
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.format("memory").queryName("t_metrics")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    m = progress_metrics(q)
    assert m["totalNumberOfEventsSeen"] >= 0
    assert m["batchId"] is not None
    assert m["stateRowsTotal"] >= 5  # one state row per event_type
    hist = history_metrics(q)
    assert len(hist) >= 1 and sum(h["numInputRows"] for h in hist) == 1000


def test_cep_stream_matches_batch(spark):
    """I6/K6-family CEP: the stateful path-fold + regex verdicts must
    equal the batch e9_sequence_pattern query (itself oracle-checked),
    per user, on the same data."""
    from debezium_incubator_spark.streaming.cep import sequence_pattern_stream

    ev = table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ev.write.mode("overwrite").parquet(f"{td}/ev")
        stream = spark.readStream.schema(ev.schema).parquet(f"{td}/ev")
        run_available_now(
            sequence_pattern_stream(stream), "t_cep", output_mode="update"
        )
        got = _sorted(spark.sql("SELECT * FROM t_cep").toPandas())
    want = _sorted(
        all_queries()["e9_sequence_pattern"](spark, SF_SMOKE).toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_distinct_users_equals_batch(spark):
    """The streaming running-distinct-count twin: final update-mode
    counts equal the batch COUNT(DISTINCT user_id) per type (and the
    final value of the batch w_count_distinct_running window query)."""
    from debezium_incubator_spark.streaming.pipeline import (
        distinct_user_counts,
    )

    stream = events_file_stream(spark, SF_SMOKE)
    run_available_now(
        distinct_user_counts(stream), "t_distinct_users",
        output_mode="update",
    )
    got = (
        spark.sql(
            "SELECT event_type, max(count) AS n FROM t_distinct_users"
            " GROUP BY event_type"
        )
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    want = (
        table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # ties to the batch window query: its per-type maximum running value
    # is the same audience size
    from debezium_incubator_spark.registry import all_queries

    w = all_queries()["w_count_distinct_running"](spark, SF_SMOKE).toPandas()
    final = (
        w.groupby("event_type").distinct_users_so_far.max()
        .sort_index().to_numpy()
    )
    assert list(final) == list(want.n)


def test_snapshot_mode_e2e_phases(spark):
    """snapshot.mode drives WHICH phases actually run, observed end to
    end on a real change log (verdict r5 #2): no_data registers the
    schema and emits ZERO op='r' rows while the stream still folds;
    initial_only stops after the backfill (no post-snapshot change
    applied); initial equals plain latest state; when_needed backfills
    only when no committed state exists."""
    from debezium_incubator_spark.cdc.materialize import materialize_latest
    from debezium_incubator_spark.connector import connector_bootstrap

    ch = (
        table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            F.col("event_id").alias("pos"),
            "value",
            F.expr(OP_CASE).alias("__op"),
        )
        .cache()
    )
    snap_pos = int(ch.agg(F.max("pos")).first()[0] * 0.99)

    def state_map(df):
        return {r.user_id: r.value for r in df.select("user_id", "value").collect()}

    full = state_map(materialize_latest(ch, ["user_id"], ["pos"]))

    # initial: backfill + stream fold == plain latest state
    b = connector_bootstrap(spark, {}, ch, "user_id", "pos", snap_pos)
    assert b["run_snapshot"] and b["run_stream"]
    assert b["backfill"].filter(F.col("__op") != "r").count() == 0
    assert state_map(b["state"]) == full

    # no_data (a.k.a. schema_only): schema registered, ZERO 'r' rows,
    # stream still folds — only keys changed after snap_pos appear
    nd = connector_bootstrap(
        spark, {"snapshot.mode": "no_data"}, ch, "user_id", "pos", snap_pos
    )
    assert nd["schema"] == ch.schema  # schema phase ran anyway
    assert nd["backfill"] is None     # zero op='r' rows delivered
    nd_state = state_map(nd["state"])
    streamed_keys = {
        r.user_id
        for r in ch.filter(F.col("pos") > snap_pos).select("user_id").collect()
    }
    assert set(nd_state) <= streamed_keys
    assert nd_state == {k: v for k, v in full.items() if k in nd_state}
    assert len(nd_state) < len(full)  # genuinely no backfill

    # never behaves like no_data for row delivery
    nv = connector_bootstrap(
        spark, {"snapshot.mode": "never"}, ch, "user_id", "pos", snap_pos
    )
    assert nv["backfill"] is None and state_map(nv["state"]) == nd_state

    # initial_only: stops after backfill — state is the image AT the
    # snapshot position, later changes NOT applied
    io = connector_bootstrap(
        spark, {"snapshot.mode": "initial_only"}, ch, "user_id", "pos", snap_pos
    )
    assert io["run_stream"] is False
    want_at = state_map(
        materialize_latest(
            ch.filter(F.col("pos") <= snap_pos), ["user_id"], ["pos"]
        )
    )
    assert state_map(io["state"]) == want_at
    assert want_at != full

    # when_needed: backfills only without committed state
    wn0 = connector_bootstrap(
        spark, {"snapshot.mode": "when_needed"}, ch, "user_id", "pos",
        snap_pos, state_exists=False,
    )
    wn1 = connector_bootstrap(
        spark, {"snapshot.mode": "when_needed"}, ch, "user_id", "pos",
        snap_pos, state_exists=True,
    )
    assert wn0["run_snapshot"] and not wn1["run_snapshot"]
    assert state_map(wn0["state"]) == full
    assert state_map(wn1["state"]) == nd_state
    ch.unpersist()


def test_when_needed_resnapshots_on_purged_log():
    """when_needed's second trigger: committed state EXISTS but the
    stored offset points before the retained log head (binlog purged /
    archive redo aged out) — resuming would silently skip changes, so
    the plan re-snapshots. offsets_available derives the validity."""
    from debezium_incubator_spark.connector import (
        offsets_available,
        snapshot_mode_plan,
    )

    wn = {"snapshot.mode": "when_needed"}
    # healthy resume: no snapshot
    healthy = snapshot_mode_plan(wn, state_exists=True, offsets_valid=True)
    assert (healthy["run_snapshot"], healthy["run_stream"]) == (False, True)
    # purged log: re-snapshot even though state exists
    purged = snapshot_mode_plan(wn, state_exists=True, offsets_valid=False)
    assert (purged["run_snapshot"], purged["run_stream"]) == (True, True)
    # initial/never are indifferent to offset validity
    assert snapshot_mode_plan(
        {"snapshot.mode": "never"}, state_exists=True, offsets_valid=False
    )["run_snapshot"] is False

    assert offsets_available(None, 0) is False          # nothing stored
    assert offsets_available(99, 100) is True           # exactly at head
    assert offsets_available(100, 100) is True
    assert offsets_available(98, 100) is False          # entry 99 purged


def test_bootstrap_emits_initial_snapshot_notifications(spark):
    """connector_bootstrap surfaces the public 'Initial Snapshot'
    notification aggregate: STARTED+COMPLETED around a backfill,
    SKIPPED (with the mode as reason) when the plan runs none."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.cdc.notifications import (
        NotificationChannel,
    )
    from debezium_incubator_spark.connector import connector_bootstrap

    ch = spark.createDataFrame(
        [(1, 10, 1.0, "c"), (1, 20, 2.0, "u"), (2, 30, 3.0, "c")],
        "user_id LONG, pos LONG, value DOUBLE, __op STRING",
    )
    nc = NotificationChannel()
    b = connector_bootstrap(spark, {}, ch, "user_id", "pos", 20,
                            channel=nc)
    assert b["backfill"] is not None
    seq = [(r[1], r[2]) for r in nc._rows]
    assert seq == [("Initial Snapshot", "STARTED"),
                   ("Initial Snapshot", "COMPLETED")]

    nc2 = NotificationChannel()
    connector_bootstrap(spark, {"snapshot.mode": "no_data"}, ch,
                        "user_id", "pos", 20, channel=nc2)
    seq2 = [(r[1], r[2]) for r in nc2._rows]
    assert seq2 == [("Initial Snapshot", "SKIPPED")]
