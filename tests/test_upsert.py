"""foreachBatch CDC upsert: multi-batch incremental apply must converge
to the same state as the one-shot batch materialization."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.envelope import OP_CASE
from debezium_incubator_spark.cdc.materialize import materialize_latest
from debezium_incubator_spark.streaming.upsert import (
    read_state,
    start_upsert_stream,
)

from .conftest import SF_SMOKE


def _write_single_file(df, dest_file: str) -> None:
    """Write a DataFrame as ONE parquet file directly inside the stream
    source dir (df.write creates a directory; file streams don't
    recurse into subdirectories)."""
    import glob
    import shutil
    import tempfile as tf

    d = tf.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(d)
    shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dest_file)
    shutil.rmtree(d)


def _changes(spark):
    return (
        table(spark, SF_SMOKE, "events")
        .withColumn("__op", F.expr(OP_CASE))
        .select("user_id", "event_id", "value", "ts", "__op")
    )


def test_foreachbatch_upsert_matches_batch_materialize(spark):
    ev = _changes(spark)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "incoming")
        os.makedirs(src)
        # two arrival files → maxFilesPerTrigger=1 forces 2 micro-batches
        _write_single_file(
            ev.filter(F.col("event_id") % 2 == 0), os.path.join(src, "chunk_a.parquet")
        )
        _write_single_file(
            ev.filter(F.col("event_id") % 2 == 1), os.path.join(src, "chunk_b.parquet")
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        state_dir = os.path.join(td, "state")
        q = start_upsert_stream(
            stream,
            state_dir,
            keys=["user_id"],
            position=["ts", "event_id"],
            checkpoint=os.path.join(td, "cp"),
        )
        q.awaitTermination()
        assert q.lastProgress is not None
        got = (
            read_state(spark, state_dir)
            .select("user_id", "value")
            .toPandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
    # NOTE: incremental upsert applies deletes per batch; a key whose
    # LAST change overall is a delete is absent, matching the batch fold.
    # But a delete followed (in a later batch) by an update re-appears —
    # also matching. The batch twin is the same fold over all changes.
    want = (
        materialize_latest(ev, ["user_id"], ["ts", "event_id"])
        .select("user_id", "value")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_upsert_delete_removes_key(spark):
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        df1 = spark.createDataFrame(
            [(1, 1, 10.0, "c"), (2, 2, 20.0, "c")],
            "k LONG, pos LONG, v DOUBLE, __op STRING",
        )
        df2 = spark.createDataFrame(
            [(1, 3, None, "d"), (2, 4, 25.0, "u")],
            "k LONG, pos LONG, v DOUBLE, __op STRING",
        )
        _write_single_file(df1, os.path.join(src, "b1.parquet"))
        _write_single_file(df2, os.path.join(src, "b2.parquet"))
        stream = (
            spark.readStream.schema(df1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        state = os.path.join(td, "state")
        q = start_upsert_stream(
            stream, state, keys=["k"], position=["pos"],
            checkpoint=os.path.join(td, "cp"),
        )
        q.awaitTermination()
        got = read_state(spark, state).toPandas().sort_values("k")
        assert list(got.k) == [2]
        assert list(got.v) == [25.0]


def test_streaming_scd2_matches_batch_history(spark):
    from debezium_incubator_spark.cdc.scd2 import scd2_history
    from debezium_incubator_spark.streaming.upsert import start_scd2_stream

    ev = _changes(spark)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        # split by time, NOT key: chunk_b reopens chunk_a's current rows
        cut = ev.selectExpr(
            "percentile_approx(unix_micros(CAST(ts AS TIMESTAMP)), 0.5) AS c"
        ).first().c
        us = "unix_micros(CAST(ts AS TIMESTAMP))"
        _write_single_file(ev.filter(F.expr(f"{us} <= {cut}")), os.path.join(src, "a.parquet"))
        _write_single_file(ev.filter(F.expr(f"{us} > {cut}")), os.path.join(src, "b.parquet"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        state = os.path.join(td, "state")
        q = start_scd2_stream(
            stream, state, keys=["user_id"], position=["ts", "event_id"],
            checkpoint=os.path.join(td, "cp"),
        )
        q.awaitTermination()
        cols = ["user_id", "event_id", "valid_from", "valid_to", "is_current"]
        got = (
            read_state(spark, state, include_tombstones=True)
            .select(*cols).toPandas()
            .sort_values(["user_id", "valid_from", "event_id"])
            .reset_index(drop=True)
        )
    want = (
        scd2_history(ev, ["user_id"], ["ts", "event_id"])
        .select(*cols).toPandas()
        .sort_values(["user_id", "valid_from", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_upsert_epoch_replay_is_idempotent(spark):
    """I9 exactly-once: re-running a micro-batch with the same epoch id
    (what a post-crash replay does) must leave state identical — the
    versioned write keyed by epoch makes the apply idempotent."""
    from debezium_incubator_spark.streaming.upsert import apply_changes_batch

    with tempfile.TemporaryDirectory() as td:
        state = os.path.join(td, "state")
        os.makedirs(state)
        b1 = spark.createDataFrame(
            [(1, 1, 10.0, "c"), (2, 2, 20.0, "c")],
            "k LONG, pos LONG, v DOUBLE, __op STRING",
        )
        b2 = spark.createDataFrame(
            [(1, 3, 15.0, "u")], "k LONG, pos LONG, v DOUBLE, __op STRING"
        )
        apply_changes_batch(spark, b1, 0, state, ["k"], ["pos"])
        apply_changes_batch(spark, b2, 1, state, ["k"], ["pos"])
        before = read_state(spark, state).toPandas().sort_values("k").reset_index(drop=True)
        # crash-replay of epoch 1
        apply_changes_batch(spark, b2, 1, state, ["k"], ["pos"])
        after = read_state(spark, state).toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    assert list(after.v) == [15.0, 20.0]


def test_streaming_options_mapping():
    from debezium_incubator_spark.connector import streaming_options

    m = streaming_options({"max.batch.size": "4096", "poll.interval.ms": "500",
                           "max.queue.size": "8192",
                           "heartbeat.interval.ms": "250"})
    assert m["maxOffsetsPerTrigger"] == "4096"
    assert m["_trigger_ms"] == "500"
    assert m["_heartbeat_rps"] == "4"
    assert "max.queue.size" not in m


def test_time_travel_read_state_at(spark):
    """Point-in-time reads over the versioned state: each epoch's state
    stays queryable; an orphan version past _LATEST is never served."""
    import tempfile

    from debezium_incubator_spark.streaming.upsert import (
        apply_changes_batch,
        list_versions,
        read_state_at,
    )

    b0 = spark.createDataFrame(
        [(1, 1, 10.0, "c"), (2, 1, 20.0, "c")],
        "k LONG, pos LONG, v DOUBLE, __op STRING",
    )
    b1 = spark.createDataFrame(
        [(1, 2, 15.0, "u")], "k LONG, pos LONG, v DOUBLE, __op STRING"
    )
    b2 = spark.createDataFrame(
        [(2, 3, 0.0, "d")], "k LONG, pos LONG, v DOUBLE, __op STRING"
    )
    with tempfile.TemporaryDirectory() as state:
        apply_changes_batch(spark, b0, 0, state, ["k"], ["pos"])
        apply_changes_batch(spark, b1, 1, state, ["k"], ["pos"])
        apply_changes_batch(spark, b2, 2, state, ["k"], ["pos"])
        assert list_versions(state) == [0, 1, 2]

        at0 = {(r.k, r.v) for r in read_state_at(spark, state, 0).collect()}
        at1 = {(r.k, r.v) for r in read_state_at(spark, state, 1).collect()}
        at2 = {(r.k, r.v) for r in read_state_at(spark, state, 2).collect()}
        assert at0 == {(1, 10.0), (2, 20.0)}
        assert at1 == {(1, 15.0), (2, 20.0)}
        assert at2 == {(1, 15.0)}  # k=2 deleted; tombstone filtered
        # epoch between commits resolves downward; before the retained
        # horizon raises loudly (round-4 contract: GC'd-or-never-existed
        # history must not read as an empty state)
        assert read_state_at(spark, state, 10) is not None
        import pytest

        with pytest.raises(ValueError, match="predates"):
            read_state_at(spark, state, -1)

        # simulate crash: version dir written but marker not advanced
        import shutil

        shutil.copytree(
            os.path.join(state, "v2"), os.path.join(state, "v9")
        )
        assert list_versions(state) == [0, 1, 2]
        assert {(r.k, r.v) for r in read_state_at(spark, state, 99).collect()} == at2


def test_checkpoint_restart_processes_only_new_files(spark):
    """I9 offset recovery: a stream restarted on the SAME checkpoint must
    not reprocess committed batches — epoch numbering continues, the old
    version is untouched on disk, and only newly-arrived input is merged."""
    import glob

    from debezium_incubator_spark.streaming.upsert import list_versions

    ev = _changes(spark)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "incoming")
        os.makedirs(src)
        state = os.path.join(td, "state")
        cp = os.path.join(td, "cp")

        def run():
            stream = spark.readStream.schema(ev.schema).parquet(src)
            q = start_upsert_stream(
                stream, state, keys=["user_id"],
                position=["ts", "event_id"], checkpoint=cp,
            )
            q.awaitTermination()

        _write_single_file(first, os.path.join(src, "chunk_a.parquet"))
        run()
        assert list_versions(state) == [0]
        v0_files = sorted(glob.glob(os.path.join(state, "v0", "part-*")))
        v0_mtimes = [os.path.getmtime(p) for p in v0_files]

        _write_single_file(second, os.path.join(src, "chunk_b.parquet"))
        run()  # restart from the same checkpoint
        assert list_versions(state) == [0, 1]  # one NEW epoch, not a replay
        assert [os.path.getmtime(p) for p in v0_files] == v0_mtimes

        got = (
            read_state(spark, state)
            .select("user_id", "value")
            .toPandas().sort_values("user_id").reset_index(drop=True)
        )
    want = (
        materialize_latest(ev, ["user_id"], ["ts", "event_id"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_partitioned_state_rewrites_only_touched_buckets(spark):
    """The 100 TB apply path: a batch touching few keys rewrites only
    the buckets those keys hash into; untouched buckets keep their old
    version dirs byte-for-byte, and the assembled state still equals the
    one-shot fold."""
    import glob

    from debezium_incubator_spark.streaming.partitioned_state import (
        apply_changes_partitioned,
        read_state_partitioned,
    )

    ev = _changes(spark)
    with tempfile.TemporaryDirectory() as state:
        # epoch 0: full history
        apply_changes_partitioned(
            spark, ev, 0, state, ["user_id"], ["ts", "event_id"], n_buckets=8
        )
        dirs0 = sorted(glob.glob(os.path.join(state, "v0", "__bucket=*")))
        assert len(dirs0) == 8  # all buckets written by the backfill

        # epoch 1: a tiny batch touching exactly 3 users
        small = ev.filter(F.col("user_id").isin(1, 2, 3)).limit(3).withColumn(
            "ts", F.col("ts") + F.expr("INTERVAL 100 DAYS")
        ).withColumn("event_id", F.col("event_id") + 10_000_000)
        apply_changes_partitioned(
            spark, small, 1, state, ["user_id"], ["ts", "event_id"], n_buckets=8
        )
        dirs1 = sorted(glob.glob(os.path.join(state, "v1", "__bucket=*")))
        assert 1 <= len(dirs1) <= 3  # only touched buckets got a v1

        got = (
            read_state_partitioned(spark, state)
            .select("user_id", "value")
            .toPandas().sort_values("user_id").reset_index(drop=True)
        )
    want = (
        materialize_latest(
            ev.unionByName(small), ["user_id"], ["ts", "event_id"]
        )
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_partitioned_stream_matches_monolithic(spark):
    """Streaming twin: the partitioned foreachBatch apply converges to
    the same state as the monolithic upsert over the same arrivals."""
    from debezium_incubator_spark.streaming.partitioned_state import (
        read_state_partitioned,
        start_partitioned_upsert_stream,
    )

    ev = _changes(spark)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "incoming")
        os.makedirs(src)
        _write_single_file(
            ev.filter(F.col("event_id") % 2 == 0), os.path.join(src, "a.parquet")
        )
        _write_single_file(
            ev.filter(F.col("event_id") % 2 == 1), os.path.join(src, "b.parquet")
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        state = os.path.join(td, "state")
        q = start_partitioned_upsert_stream(
            stream, state, keys=["user_id"], position=["ts", "event_id"],
            n_buckets=8, checkpoint=os.path.join(td, "cp"),
        )
        q.awaitTermination()
        got = (
            read_state_partitioned(spark, state)
            .select("user_id", "value")
            .toPandas().sort_values("user_id").reset_index(drop=True)
        )
    want = (
        materialize_latest(ev, ["user_id"], ["ts", "event_id"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_vacuum_keeps_live_bucket_versions(spark):
    """GC must keep OLD epoch dirs that the latest manifest still
    references (buckets untouched by recent batches) and remove only
    unreachable (bucket, epoch) data."""
    import glob

    from debezium_incubator_spark.streaming.partitioned_state import (
        apply_changes_partitioned,
        read_state_partitioned,
        vacuum_partitioned,
    )

    ev = _changes(spark)
    with tempfile.TemporaryDirectory() as state:
        apply_changes_partitioned(
            spark, ev, 0, state, ["user_id"], ["ts", "event_id"], n_buckets=8
        )
        small = ev.filter(F.col("user_id") == 1).limit(1).withColumn(
            "ts", F.col("ts") + F.expr("INTERVAL 100 DAYS")
        )
        apply_changes_partitioned(
            spark, small, 1, state, ["user_id"], ["ts", "event_id"], n_buckets=8
        )
        apply_changes_partitioned(
            spark, small.withColumn("value", F.lit(7.0)), 2, state,
            ["user_id"], ["ts", "event_id"], n_buckets=8,
        )
        before = (
            read_state_partitioned(spark, state)
            .select("user_id", "value")
            .toPandas().sort_values("user_id").reset_index(drop=True)
        )
        removed = vacuum_partitioned(state, keep_last=1)
        assert removed  # v1's superseded bucket + old manifests went away
        # v0 dirs for untouched buckets MUST survive (still referenced)
        assert glob.glob(os.path.join(state, "v0", "__bucket=*"))
        after = (
            read_state_partitioned(spark, state)
            .select("user_id", "value")
            .toPandas().sort_values("user_id").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(before, after)


def test_vacuum_versions_monolithic(spark):
    from debezium_incubator_spark.streaming.upsert import (
        apply_changes_batch,
        list_versions,
        read_state,
        vacuum_versions,
    )

    b = lambda rows: spark.createDataFrame(
        rows, "k LONG, pos LONG, v DOUBLE, __op STRING"
    )
    with tempfile.TemporaryDirectory() as state:
        apply_changes_batch(spark, b([(1, 1, 1.0, "c")]), 0, state, ["k"], ["pos"])
        apply_changes_batch(spark, b([(1, 2, 2.0, "u")]), 1, state, ["k"], ["pos"])
        apply_changes_batch(spark, b([(1, 3, 3.0, "u")]), 2, state, ["k"], ["pos"])
        removed = vacuum_versions(state, keep_last=2)
        assert removed == ["v0"]
        assert list_versions(state) == [1, 2]
        assert read_state(spark, state).first().v == 3.0


def test_crash_before_manifest_commit_is_invisible_and_replayable(spark):
    """Fault injection for the manifest-last atomic-commit claim
    (partitioned_state.py): kill the writer AFTER the bucket parquet
    write but BEFORE the manifest/_LATEST commit. Readers must still see
    the previous epoch (uncommitted data is unreachable), and replaying
    the same epoch after restart must converge to exactly the state a
    no-failure run produces."""
    from unittest import mock

    from debezium_incubator_spark.streaming import partitioned_state as ps

    ev = _changes(spark)
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    args = dict(keys=["user_id"], position=["ts", "event_id"], n_buckets=8)

    def snap(state):
        df = ps.read_state_partitioned(spark, state)
        return (
            df.select("user_id", "value").toPandas()
            .sort_values("user_id").reset_index(drop=True)
        )

    with tempfile.TemporaryDirectory() as ref, \
            tempfile.TemporaryDirectory() as state:
        # reference: both epochs, no failure
        ps.apply_changes_partitioned(spark, b1, 0, ref, **args)
        ps.apply_changes_partitioned(spark, b2, 1, ref, **args)
        want = snap(ref)

        ps.apply_changes_partitioned(spark, b1, 0, state, **args)
        epoch0 = snap(state)
        # crash point: right after the bucket write, before any commit
        # file (stats -> manifest -> pointer); _write_stats is the first
        # post-write step. (Was json.dumps, but round-6's pre-write
        # split-brain check moved the first dumps call BEFORE the data
        # write, which made the injected crash fire too early.)
        with mock.patch.object(
            ps, "_write_stats", side_effect=RuntimeError("killed mid-batch")
        ):
            try:
                ps.apply_changes_partitioned(spark, b2, 1, state, **args)
                raise AssertionError("fault injection did not fire")
            except RuntimeError:
                pass
        # torn v1 data exists on disk, but the commit point was never
        # reached: readers still serve epoch 0
        assert os.path.isdir(os.path.join(state, "v1"))
        assert not os.path.exists(os.path.join(state, "manifest_v1.json"))
        with open(os.path.join(state, "_LATEST")) as f:
            assert f.read().strip() == "manifest_v0.json"
        pd.testing.assert_frame_equal(snap(state), epoch0)

        # restart: foreachBatch re-delivers the same epoch; the rewrite
        # is deterministic and the overwrite replaces the torn files
        ps.apply_changes_partitioned(spark, b2, 1, state, **args)
        pd.testing.assert_frame_equal(snap(state), want)


def test_crash_between_manifest_and_pointer_is_replayable(spark):
    """Second crash window: the epoch manifest was written but _LATEST
    (the commit point) was not updated. The orphan manifest must not be
    served, and epoch replay converges."""
    from debezium_incubator_spark.streaming import partitioned_state as ps

    ev = _changes(spark)
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    args = dict(keys=["user_id"], position=["ts", "event_id"], n_buckets=8)

    def snap(state):
        df = ps.read_state_partitioned(spark, state)
        return (
            df.select("user_id", "value").toPandas()
            .sort_values("user_id").reset_index(drop=True)
        )

    with tempfile.TemporaryDirectory() as ref, \
            tempfile.TemporaryDirectory() as state:
        ps.apply_changes_partitioned(spark, b1, 0, ref, **args)
        ps.apply_changes_partitioned(spark, b2, 1, ref, **args)
        want = snap(ref)

        ps.apply_changes_partitioned(spark, b1, 0, state, **args)
        epoch0 = snap(state)
        # run epoch 1 fully, then roll the pointer back: equivalent to a
        # crash after manifest_v1.json landed but before _LATEST moved
        ps.apply_changes_partitioned(spark, b2, 1, state, **args)
        with open(os.path.join(state, "_LATEST"), "w") as f:
            f.write("manifest_v0.json")
        assert os.path.exists(os.path.join(state, "manifest_v1.json"))
        pd.testing.assert_frame_equal(snap(state), epoch0)

        ps.apply_changes_partitioned(spark, b2, 1, state, **args)
        pd.testing.assert_frame_equal(snap(state), want)


def test_vacuum_respects_time_travel_horizon(spark):
    """Point-in-time reads under GC: a version inside the kept horizon
    keeps serving after vacuum; a vacuumed epoch raises (never an empty
    result that could be mistaken for 'no state existed then')."""
    import pytest

    from debezium_incubator_spark.streaming.upsert import (
        apply_changes_batch,
        read_state_at,
        vacuum_versions,
    )

    b = lambda rows: spark.createDataFrame(
        rows, "k LONG, pos LONG, v DOUBLE, __op STRING"
    )
    with tempfile.TemporaryDirectory() as state:
        apply_changes_batch(spark, b([(1, 1, 1.0, "c")]), 0, state, ["k"], ["pos"])
        apply_changes_batch(spark, b([(1, 2, 2.0, "u")]), 1, state, ["k"], ["pos"])
        apply_changes_batch(spark, b([(1, 3, 3.0, "u")]), 2, state, ["k"], ["pos"])
        # pre-vacuum: every epoch is time-travelable
        assert read_state_at(spark, state, 0).first().v == 1.0
        assert read_state_at(spark, state, 1).first().v == 2.0
        removed = vacuum_versions(state, keep_last=2)
        assert removed == ["v0"]
        # kept version still serves the same point-in-time result
        assert read_state_at(spark, state, 1).first().v == 2.0
        assert read_state_at(spark, state, 2).first().v == 3.0
        # vacuumed epoch fails loudly
        with pytest.raises(ValueError, match="vacuum horizon"):
            read_state_at(spark, state, 0)


def test_streaming_lob_apply_matches_batch_resolve(spark):
    """Oracle-LOB streaming twin: two-epoch incremental apply with
    placeholder resolution against persisted state must converge to the
    same table as a one-shot resolve-then-fold over all changes —
    including a placeholder whose last real write arrived in an EARLIER
    epoch, and an explicit NULL write that later placeholders inherit."""
    from debezium_incubator_spark.cdc.materialize import (
        UNAVAILABLE_VALUE as PH,
        apply_changes_lob_batch,
        materialize_latest,
        resolve_unavailable,
    )
    from debezium_incubator_spark.streaming.upsert import read_state

    schema = "k LONG, pos LONG, body STRING, __op STRING"
    b1 = spark.createDataFrame(
        [
            (1, 1, "v1", "c"),      # real body in epoch 0
            (2, 1, "w1", "c"),
            (3, 1, None, "c"),      # real NULL from the start
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (1, 2, PH, "u"),        # must inherit "v1" across epochs
            (2, 2, None, "u"),      # explicit NULL write
            (2, 3, PH, "u"),        # must inherit the NULL, not "w1"
            (3, 2, PH, "u"),        # inherits NULL
        ],
        schema,
    )
    with tempfile.TemporaryDirectory() as state:
        apply_changes_lob_batch(
            spark, b1, 0, state, ["k"], ["pos"], lob_cols=["body"]
        )
        apply_changes_lob_batch(
            spark, b2, 1, state, ["k"], ["pos"], lob_cols=["body"]
        )
        got = (
            read_state(spark, state)
            .select("k", "body")
            .toPandas().sort_values("k").reset_index(drop=True)
        )
    allc = b1.unionByName(b2)
    want = (
        materialize_latest(
            resolve_unavailable(allc, ["k"], ["pos"], ["body"]),
            ["k"], ["pos"],
        )
        .select("k", "body")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert dict(zip(got.k, got.body)) == {1: "v1", 2: None, 3: None}


def test_compact_state_collapses_epochs_and_preserves_state(spark, tmp_path):
    """Maintenance compaction: after epochs scatter buckets across many
    v-dirs, compact_state rewrites every live bucket under ONE epoch
    (one file per bucket), state is unchanged, and vacuum then reclaims
    every older epoch — which it could NOT do before compaction while
    old epochs were still referenced by untouched buckets."""
    import os

    from pyspark.sql import functions as F

    from debezium_incubator_spark.streaming.partitioned_state import (
        BUCKET_COL,
        apply_changes_partitioned,
        compact_state,
        read_state_partitioned,
        vacuum_partitioned,
    )

    state = str(tmp_path / "state")
    nb = 8

    def batch(lo, hi, ep, op="u"):
        # pos grows with the epoch so later batches really supersede
        return spark.createDataFrame(
            [(k, 1000 * ep + k, float(k), op) for k in range(lo, hi)],
            "k LONG, pos LONG, v DOUBLE, __op STRING",
        )

    # epoch 0 seeds all buckets; epochs 1-3 touch shrinking key ranges,
    # leaving untouched buckets pointing at older epochs
    apply_changes_partitioned(
        spark, batch(0, 64, 0), 0, state, ["k"], ["pos"], nb
    )
    apply_changes_partitioned(
        spark, batch(0, 24, 1), 1, state, ["k"], ["pos"], nb
    )
    apply_changes_partitioned(
        spark, batch(0, 8, 2), 2, state, ["k"], ["pos"], nb
    )
    # one delete -> a tombstone survives in state
    apply_changes_partitioned(
        spark, batch(3, 4, 3, op="d"), 3, state, ["k"], ["pos"], nb
    )
    before = (
        read_state_partitioned(spark, state)
        .select("k", "v").toPandas().sort_values("k").reset_index(drop=True)
    )
    v_dirs = lambda: sorted(  # noqa: E731
        d for d in os.listdir(state) if d.startswith("v") and d[1:].isdigit()
    )
    assert len(v_dirs()) == 4

    stats = compact_state(spark, state, 10, ["k"], nb)
    assert stats["buckets"] == nb and stats["dropped_tombstones"] == 0

    after = (
        read_state_partitioned(spark, state)
        .select("k", "v").toPandas().sort_values("k").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(after, before)
    # tombstone retained by default (guards replayed stale positions)
    assert (
        read_state_partitioned(spark, state, include_tombstones=True)
        .filter(F.col("__op") == "d").count() == 1
    )

    removed = vacuum_partitioned(state, keep_last=1)
    assert removed  # old manifests/epochs actually reclaimed
    assert v_dirs() == ["v10"]
    # one file per bucket in the compacted epoch
    vdir = os.path.join(state, "v10")
    buckets = [d for d in os.listdir(vdir) if d.startswith(BUCKET_COL)]
    assert len(buckets) == nb
    for b in buckets:
        files = [f for f in os.listdir(os.path.join(vdir, b))
                 if f.endswith(".parquet")]
        assert len(files) == 1
    # state still reads correctly post-vacuum
    pd.testing.assert_frame_equal(
        read_state_partitioned(spark, state)
        .select("k", "v").toPandas().sort_values("k").reset_index(drop=True),
        before,
    )

    # drop_tombstones: the delete marker goes away and is counted
    stats2 = compact_state(
        spark, state, 11, ["k"], nb, drop_tombstones=True
    )
    assert stats2["dropped_tombstones"] == 1
    assert (
        read_state_partitioned(spark, state, include_tombstones=True)
        .filter(F.col("__op") == "d").count() == 0
    )


def test_schema_widened_batch_merges_into_state(spark, tmp_path):
    """Mid-stream DDL widening (ALTER TABLE ADD COLUMN, replayed by the
    schema history): a batch carrying a NEW column merges into existing
    state in BOTH apply forms — pre-widening rows surface NULL for the
    new column, post-widening rows carry it, and the partitioned form's
    cross-epoch reads reconcile the differing bucket schemas
    (mergeSchema). A subsequent NARROWER batch (producer behind the
    registry) also applies, its missing column NULL."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.streaming.partitioned_state import (
        apply_changes_partitioned,
        read_state_partitioned,
    )
    from debezium_incubator_spark.streaming.upsert import (
        apply_changes_batch,
        read_state,
    )

    b1 = spark.createDataFrame(
        [(1, 10, 1.0, "u"), (2, 11, 2.0, "u")],
        "k LONG, pos LONG, v DOUBLE, __op STRING",
    )
    b2 = spark.createDataFrame(  # widened: new column v2
        [(2, 20, 2.5, "x2", "u"), (3, 21, 3.0, "x3", "u")],
        "k LONG, pos LONG, v DOUBLE, v2 STRING, __op STRING",
    )
    b3 = spark.createDataFrame(  # narrower again (stale producer)
        [(4, 30, 4.0, "u")],
        "k LONG, pos LONG, v DOUBLE, __op STRING",
    )

    for name, apply_fn, read_fn in [
        ("mono",
         lambda b, e, d: apply_changes_batch(spark, b, e, d, ["k"], ["pos"]),
         lambda d: read_state(spark, d)),
        ("part",
         lambda b, e, d: apply_changes_partitioned(
             spark, b, e, d, ["k"], ["pos"], n_buckets=4),
         lambda d: read_state_partitioned(spark, d)),
    ]:
        state = str(tmp_path / name)
        apply_fn(b1, 0, state)
        apply_fn(b2, 1, state)
        apply_fn(b3, 2, state)
        got = {
            r.k: (r.v, r.v2)
            for r in read_fn(state).select("k", "v", "v2").collect()
        }
        assert got == {
            1: (1.0, None),     # pre-widening row: new column NULL
            2: (2.5, "x2"),     # superseded by the widened batch
            3: (3.0, "x3"),
            4: (4.0, None),     # narrower late batch: missing col NULL
        }, (name, got)


def test_compact_state_drops_fully_tombstoned_bucket_from_manifest(
    spark, tmp_path
):
    """Round-6 ADVICE regression: when drop_tombstones=True empties a
    bucket ENTIRELY (every key in it deleted), no partition dir is
    written for it under the compaction epoch — the manifest must drop
    the bucket rather than keep a dangling reference that makes every
    subsequent read raise path-not-found."""
    from debezium_incubator_spark.streaming.partitioned_state import (
        _read_manifest,
        apply_changes_partitioned,
        compact_state,
        read_state_partitioned,
    )

    state = str(tmp_path / "state")
    nb = 4
    up = spark.createDataFrame(
        [(k, 10 + k, float(k), "u") for k in range(16)],
        "k LONG, pos LONG, v DOUBLE, __op STRING",
    )
    apply_changes_partitioned(spark, up, 0, state, ["k"], ["pos"], nb)

    # find one bucket's full key membership via the same hash the state
    # uses, then delete every key in it (tombstones at higher positions)
    from pyspark.sql import functions as F

    from debezium_incubator_spark.streaming.partitioned_state import _bucket

    keys_by_bucket = {}
    for r in up.withColumn("b", _bucket(["k"], nb)).select("k", "b").collect():
        keys_by_bucket.setdefault(r.b, []).append(r.k)
    victim_bucket, victim_keys = next(
        (b, ks) for b, ks in sorted(keys_by_bucket.items()) if ks
    )
    dels = spark.createDataFrame(
        [(k, 100 + k, 0.0, "d") for k in victim_keys],
        "k LONG, pos LONG, v DOUBLE, __op STRING",
    )
    apply_changes_partitioned(spark, dels, 1, state, ["k"], ["pos"], nb)

    stats = compact_state(spark, state, 5, ["k"], nb, drop_tombstones=True)
    assert stats["dropped_tombstones"] == len(victim_keys)
    manifest = _read_manifest(state)
    assert victim_bucket not in manifest, (
        "fully-tombstoned bucket must leave the manifest"
    )
    # the state is still READABLE (the old bug raised path-not-found
    # here) and contains exactly the surviving keys
    got = read_state_partitioned(spark, state)
    assert sorted(r.k for r in got.select("k").collect()) == sorted(
        set(range(16)) - set(victim_keys)
    )
    assert got.filter(F.col("v").isNull()).count() == 0


def test_compact_state_rebuckets_with_new_bucket_count(spark, tmp_path):
    """Round-6 ADVICE regression: compacting with a DIFFERENT n_buckets
    re-buckets rows into new bucket ids; the manifest must track the
    buckets actually written (the old bug kept stale ids — reads hit
    missing dirs and the new buckets were silently orphaned)."""
    import pandas as pd

    from debezium_incubator_spark.streaming.partitioned_state import (
        _read_manifest,
        apply_changes_partitioned,
        compact_state,
        read_state_partitioned,
    )

    state = str(tmp_path / "state")
    up = spark.createDataFrame(
        [(k, 10 + k, float(k), "u") for k in range(64)],
        "k LONG, pos LONG, v DOUBLE, __op STRING",
    )
    apply_changes_partitioned(spark, up, 0, state, ["k"], ["pos"], 4)
    before = (
        read_state_partitioned(spark, state)
        .select("k", "v").toPandas().sort_values("k").reset_index(drop=True)
    )

    # grow the bucket count 4 -> 16 (the operational reason the
    # parameter exists: state grew, rewrite granularity must shrink)
    compact_state(spark, state, 7, ["k"], 16)
    manifest = _read_manifest(state)
    # manifest = exactly the NEW bucket ids the rows actually hash to
    # (a hash-empty bucket gets no dir and no manifest entry)
    from debezium_incubator_spark.streaming.partitioned_state import _bucket

    want_buckets = {
        r.b for r in up.withColumn("b", _bucket(["k"], 16)).select("b").collect()
    }
    assert set(manifest) == want_buckets and set(manifest.values()) == {7}
    after = (
        read_state_partitioned(spark, state)
        .select("k", "v").toPandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(after, before)

    # subsequent batches apply at the NEW granularity and fold correctly
    upd = spark.createDataFrame(
        [(3, 1000, 33.0, "u")], "k LONG, pos LONG, v DOUBLE, __op STRING"
    )
    apply_changes_partitioned(spark, upd, 8, state, ["k"], ["pos"], 16)
    got = {
        r.k: r.v for r in read_state_partitioned(spark, state).collect()
    }
    assert got[3] == 33.0 and got[5] == 5.0


def test_partitioned_time_travel_and_vacuum_horizon(spark, tmp_path):
    """read_state_partitioned_at resolves the largest committed
    manifest <= epoch (a manifest pick, not a data copy) and raises
    LOUDLY past the vacuum horizon — both when every retained manifest
    is newer and when the resolved manifest references reclaimed bucket
    dirs (mirrors test_vacuum_respects_time_travel_horizon for the
    monolithic layout)."""
    import pytest

    from debezium_incubator_spark.streaming.partitioned_state import (
        apply_changes_partitioned,
        read_state_partitioned_at,
        vacuum_partitioned,
    )

    state = str(tmp_path / "state")
    nb = 4

    def batch(rows, ep):
        return spark.createDataFrame(
            [(k, 1000 * ep + k, v, "u") for k, v in rows],
            "k LONG, pos LONG, v DOUBLE, __op STRING",
        )

    apply_changes_partitioned(
        spark, batch([(1, 1.0), (2, 2.0)], 0), 0, state, ["k"], ["pos"], nb
    )
    apply_changes_partitioned(
        spark, batch([(2, 20.0), (3, 3.0)], 1), 1, state, ["k"], ["pos"], nb
    )
    apply_changes_partitioned(
        spark, batch([(1, 100.0)], 2), 2, state, ["k"], ["pos"], nb
    )

    at = lambda e: {  # noqa: E731
        r.k: r.v for r in read_state_partitioned_at(spark, state, e).collect()
    }
    assert at(0) == {1: 1.0, 2: 2.0}
    assert at(1) == {1: 1.0, 2: 20.0, 3: 3.0}
    # epoch 5 > newest manifest: resolves to the latest committed state
    assert at(5) == {1: 100.0, 2: 20.0, 3: 3.0}

    # empty dir: no state was ever committed -> None, not an error
    assert read_state_partitioned_at(spark, str(tmp_path / "nope"), 0) is None

    # vacuum to the latest manifest only: older epochs are GC'd
    vacuum_partitioned(state, keep_last=1)
    assert at(5) == {1: 100.0, 2: 20.0, 3: 3.0}  # current still reads
    with pytest.raises(ValueError, match="vacuum horizon"):
        read_state_partitioned_at(spark, state, 0)


def test_manifest_stats_answer_counts_without_scans(spark, tmp_path):
    """Per-bucket row stats ride the commit protocol (data → stats →
    manifest → _LATEST): bucket_row_counts / state_row_count /
    bucket_skew answer from KB-scale JSON and must equal a physical
    recount after multi-epoch applies (tombstones counted — physical
    rows), survive compaction with a DIFFERENT n_buckets, and vacuum
    must reclaim exactly the stats of dead epochs while keeping every
    referenced one."""
    import os

    from pyspark.sql import functions as F

    from debezium_incubator_spark.streaming.partitioned_state import (
        apply_changes_partitioned,
        bucket_row_counts,
        bucket_skew,
        compact_state,
        read_state_partitioned,
        state_row_count,
        vacuum_partitioned,
    )

    state = str(tmp_path / "state")
    nb = 4

    def batch(rows, ep, op="u"):
        return spark.createDataFrame(
            [(k, 1000 * ep + k, float(k), op) for k in rows],
            "k LONG, pos LONG, v DOUBLE, __op STRING",
        )

    apply_changes_partitioned(
        spark, batch(range(32), 0), 0, state, ["k"], ["pos"], nb
    )
    apply_changes_partitioned(
        spark, batch(range(8), 1), 1, state, ["k"], ["pos"], nb
    )
    apply_changes_partitioned(  # a tombstone: physical row, logical gone
        spark, batch([3], 2, op="d"), 2, state, ["k"], ["pos"], nb
    )

    def physical():
        df = read_state_partitioned(spark, state, include_tombstones=True)
        from debezium_incubator_spark.streaming.partitioned_state import (
            _bucket,
        )

        return {
            r.b: r.cnt
            for r in df.withColumn("b", _bucket(["k"], nb))
            .groupBy("b").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }

    assert bucket_row_counts(spark, state) == physical()
    assert state_row_count(spark, state) == 32  # 32 keys, folds kept 1 row each
    sk = bucket_skew(spark, state)
    assert sk["rows"] == 32 and sk["buckets"] == nb and sk["ratio"] >= 1.0

    # compaction with a LARGER bucket count: stats re-derive at the new
    # granularity and still match physical truth
    compact_state(spark, state, 10, ["k"], 16)
    from debezium_incubator_spark.streaming.partitioned_state import _bucket

    df = read_state_partitioned(spark, state, include_tombstones=True)
    phys16 = {
        r.b: r.cnt
        for r in df.withColumn("b", _bucket(["k"], 16))
        .groupBy("b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert bucket_row_counts(spark, state) == phys16
    assert state_row_count(spark, state) == 32

    # vacuum: dead epochs' stats reclaimed, the live epoch's kept
    removed = vacuum_partitioned(state, keep_last=1)
    assert {"stats_v0.json", "stats_v1.json", "stats_v2.json"} <= set(removed)
    assert os.path.exists(os.path.join(state, "stats_v10.json"))
    assert state_row_count(spark, state) == 32

    # legacy fallback: delete the stats file — counts still resolve by
    # reading the bucket parquet (pre-feature states stay readable)
    os.remove(os.path.join(state, "stats_v10.json"))
    assert bucket_row_counts(spark, state) == phys16


def test_concurrent_commit_guard_allows_replay_rejects_divergence(
    spark, tmp_path
):
    """Split-brain guard on the epoch-manifest commit: a crash-replay
    of the SAME batch recommits byte-identical content (idempotent,
    allowed — the existing replay guarantee), but a second writer
    committing DIFFERENT content under the same epoch id (two drivers
    resumed from one checkpoint) is refused loudly instead of silently
    overwriting one history with the other."""
    import pytest

    from debezium_incubator_spark.streaming.partitioned_state import (
        ConcurrentCommitError,
        apply_changes_partitioned,
        read_state_partitioned,
    )

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, 10, 1.0, "u"), (2, 11, 2.0, "u")],
        "k LONG, pos LONG, v DOUBLE, __op STRING",
    )
    apply_changes_partitioned(spark, b1, 0, state, ["k"], ["pos"], 4)
    # replay of the identical batch at the same epoch: allowed
    apply_changes_partitioned(spark, b1, 0, state, ["k"], ["pos"], 4)
    assert read_state_partitioned(spark, state).count() == 2

    # divergent writer: different batch, same epoch id — refused
    b_other = spark.createDataFrame(
        [(99, 12, 9.0, "u")], "k LONG, pos LONG, v DOUBLE, __op STRING"
    )
    with pytest.raises(ConcurrentCommitError, match="epoch 0"):
        apply_changes_partitioned(
            spark, b_other, 0, state, ["k"], ["pos"], 4
        )
    # state remains the committed history
    assert sorted(r.k for r in read_state_partitioned(spark, state).collect()) == [1, 2]


def test_compaction_crash_replay_tolerates_manifest_key_order(
    spark, tmp_path
):
    """The split-brain guard compares the PARSED bucket→epoch mapping,
    never raw bytes: a crash-replayed compaction rebuilds its manifest
    from ``os.listdir`` order, which the filesystem does not guarantee —
    the same mapping serialized in a different key order must pass the
    guard (it is the idempotent replay the guard's docstring promises),
    while a genuinely different mapping still raises."""
    import json

    import pytest

    from debezium_incubator_spark.streaming.partitioned_state import (
        ConcurrentCommitError,
        _commit_manifest,
        compact_state,
        read_state_partitioned,
        apply_changes_partitioned,
    )

    state = str(tmp_path / "state")
    rows = [(k, 10 + k, float(k), "u") for k in range(12)]
    b1 = spark.createDataFrame(
        rows, "k LONG, pos LONG, v DOUBLE, __op STRING"
    )
    apply_changes_partitioned(spark, b1, 0, state, ["k"], ["pos"], 4)
    compact_state(spark, state, 5, ["k"], 4)

    # simulate a crash BETWEEN the manifest commit and the _LATEST
    # pointer update, where the committed manifest happens to be
    # serialized in a DIFFERENT key order (legacy writer / listdir
    # order): rewind the pointer and scramble the manifest bytes
    with open(os.path.join(state, "manifest_v5.json")) as f:
        mapping = json.load(f)
    scrambled = "{" + ", ".join(
        f'"{k}": {v}' for k, v in reversed(list(mapping.items()))
    ) + "}"
    assert scrambled != json.dumps(mapping, sort_keys=True)
    with open(os.path.join(state, "manifest_v5.json"), "w") as f:
        f.write(scrambled)
    with open(os.path.join(state, "_LATEST"), "w") as f:
        f.write("manifest_v0.json")

    # replay of the compaction: same mapping, different byte order —
    # must NOT be misclassified as split-brain
    out = compact_state(spark, state, 5, ["k"], 4)
    assert out["rows"] == 12
    assert read_state_partitioned(spark, state).count() == 12

    # a genuinely different mapping under the same epoch still refuses
    diverged = dict(mapping)
    first = next(iter(diverged))
    diverged[first] = 99
    with pytest.raises(ConcurrentCommitError):
        _commit_manifest(state, 5, json.dumps(diverged, sort_keys=True))

def test_apply_changes_caller_touched_verified(spark, tmp_path):
    """Round-13: the optional precomputed ``touched`` list (job-count
    saver for callers that already collected the batch's key set) is
    verified against the physically written bucket dirs — an exact list
    commits identically to the computed path; a wrong list (bucket ids
    the batch never writes) must refuse BEFORE committing a manifest
    that points at missing directories."""
    import pytest

    from debezium_incubator_spark.streaming.partitioned_state import (
        _bucket,
        apply_changes_partitioned,
        read_state_partitioned,
    )

    batch = spark.createDataFrame(
        [(1, "a", "c", 1), (2, "b", "c", 2), (17, "q", "c", 3)],
        "id LONG, v STRING, __op STRING, __pos LONG",
    )
    good = sorted(
        r["b"]
        for r in batch.select(_bucket(["id"], 4).alias("b"))
        .distinct().collect()
    )
    st = str(tmp_path / "st")
    apply_changes_partitioned(
        spark, batch, 0, st, keys=["id"], position=["__pos"],
        n_buckets=4, touched=good,
    )
    got = {
        (r["id"], r["v"])
        for r in read_state_partitioned(spark, st).collect()
    }
    assert got == {(1, "a"), (2, "b"), (17, "q")}
    st2 = str(tmp_path / "st2")
    with pytest.raises(ValueError, match="lying manifest"):
        apply_changes_partitioned(
            spark, batch, 0, st2, keys=["id"], position=["__pos"],
            n_buckets=4, touched=[0, 1, 2, 3],
        )
