"""Signal-driven lifecycle of the chunked incremental snapshot:
pause-snapshot halts chunk scans at the next boundary, resume-snapshot
continues from the persisted bookmark (result identical to an
uninterrupted snapshot), stop-snapshot aborts — with the
PAUSED/RESUMED/ABORTED notification sequence asserted, emitted at
EXECUTION time (after the chunk's write), not plan assembly."""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.envelope import OP_CASE
from debezium_incubator_spark.cdc.incremental_snapshot import chunk_bounds
from debezium_incubator_spark.cdc.materialize import materialize_latest
from debezium_incubator_spark.cdc.notifications import NotificationChannel
from debezium_incubator_spark.cdc.signals import dispatch_signals
from debezium_incubator_spark.cdc.snapshot_lifecycle import (
    ABORTED,
    COMPLETED,
    PAUSED,
    ChunkedSnapshotRunner,
)

from .conftest import SF_SMOKE


def _changes(spark):
    return table(spark, SF_SMOKE, "events").select(
        "user_id",
        F.col("event_id").alias("pos"),
        "value",
        F.expr(OP_CASE).alias("__op"),
    )


def _fixture(spark, ch, n_chunks=4):
    max_pos = ch.agg(F.max("pos")).first()[0]
    hs = [int(max_pos * (i + 1) / n_chunks) for i in range(n_chunks)]
    # DBLog watermarks bracket the chunk SELECT *narrowly* (L is noted
    # just before the read, H just after): a window of ±5 positions.
    # A quarter-log-wide window would reconcile away EVERY chunk row on
    # this 15-hot-key fixture (all keys change inside any wide window),
    # leaving a degenerate empty snapshot.
    watermarks = [(max(h - 5, 0), h) for h in hs]
    bounds = chunk_bounds(ch, "user_id", n_chunks)

    calls = []

    def snapshot_at(pos):
        calls.append(pos)
        return materialize_latest(
            ch.filter(F.col("pos") <= pos), ["user_id"], ["pos"]
        ).select("user_id", "value")

    return bounds, watermarks, snapshot_at, calls


def _signal(spark, sid, stype, data="null"):
    return spark.createDataFrame(
        [(sid, stype, data)], "id STRING, type STRING, data STRING"
    )


def test_pause_resume_completes_from_bookmark(spark, tmp_path):
    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, calls = _fixture(spark, ch)
    chan = NotificationChannel()
    runner = ChunkedSnapshotRunner(
        spark, snapshot_at, ch, "user_id", "pos", bounds, watermarks,
        str(tmp_path / "snap"), channel=chan,
    )

    # a pause-snapshot signal arrives between chunk 1 and chunk 2,
    # delivered through the REAL signal dispatch path
    pending = [None, None, _signal(spark, "s1", "pause-snapshot")]

    def poll():
        if pending and (sig := pending.pop(0)) is not None:
            dispatch_signals(sig, handlers=runner.signal_handlers())

    assert runner.run(poll=poll) == PAUSED
    assert runner.status == PAUSED
    # exactly two chunk scans ran, two chunk dirs persisted, none after
    assert len(calls) == 2
    chunk_dirs = sorted(
        d for d in os.listdir(tmp_path / "snap") if d.startswith("chunk_")
    )
    assert chunk_dirs == ["chunk_0", "chunk_1"]
    assert [t for (_, _, t, _, _) in chan.rows] == [
        "STARTED", "TABLE_SCAN_COMPLETED", "TABLE_SCAN_COMPLETED", "PAUSED",
    ]
    # paused bookmark points at the next chunk to run
    assert chan.rows[-1][3]["next_chunk"] == "2"

    # run() while still paused (no resume signal) is a no-op
    assert runner.run() == PAUSED
    assert len(calls) == 2

    # resume-snapshot → completion from the bookmark (chunks 2, 3 only)
    dispatch_signals(
        _signal(spark, "s2", "resume-snapshot"),
        handlers=runner.signal_handlers(),
    )
    assert runner.run() == COMPLETED
    assert len(calls) == 4
    assert [t for (_, _, t, _, _) in chan.rows] == [
        "STARTED", "TABLE_SCAN_COMPLETED", "TABLE_SCAN_COMPLETED", "PAUSED",
        "RESUMED", "TABLE_SCAN_COMPLETED", "TABLE_SCAN_COMPLETED",
        "COMPLETED",
    ]

    # the paused-then-resumed snapshot folds to EXACTLY the state an
    # uninterrupted run produces (which equals plain latest state)
    combined = runner.result().select(
        "user_id", "pos", "value", "__op"
    ).unionByName(ch.select("user_id", "pos", "value", "__op"))
    got = (
        materialize_latest(combined, ["user_id"], ["pos"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    want = (
        materialize_latest(ch, ["user_id"], ["pos"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    ch.unpersist()


def test_stop_snapshot_aborts(spark, tmp_path):
    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, calls = _fixture(spark, ch)
    chan = NotificationChannel()
    runner = ChunkedSnapshotRunner(
        spark, snapshot_at, ch, "user_id", "pos", bounds, watermarks,
        str(tmp_path / "snap"), channel=chan,
    )
    pending = [None, _signal(spark, "s1", "stop-snapshot")]

    def poll():
        if pending and (sig := pending.pop(0)) is not None:
            dispatch_signals(sig, handlers=runner.signal_handlers())

    assert runner.run(poll=poll) == ABORTED
    assert len(calls) == 1  # chunk 0 ran, the stop landed before chunk 1
    assert [t for (_, _, t, _, _) in chan.rows] == [
        "STARTED", "TABLE_SCAN_COMPLETED", "ABORTED",
    ]
    # aborted is terminal: no further scans, result() refuses
    assert runner.run() == ABORTED
    assert len(calls) == 1
    try:
        runner.result()
        raise AssertionError("result() must refuse on an aborted snapshot")
    except RuntimeError as e:
        assert "aborted" in str(e)
    ch.unpersist()


def test_execute_snapshot_additional_conditions_e2e(spark, tmp_path):
    """Predicate-filtered ad-hoc snapshot (Debezium's
    additional-conditions): the signal carries a SQL filter per
    collection; the chunk scans apply it; the delivered snapshot +
    the (same-predicate) stream fold to exactly the predicate-filtered
    latest state. The predicate is on the KEY (immutable), so the
    filter commutes with reconciliation."""
    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, _ = _fixture(spark, ch)
    result = {}

    def run_filtered(sig: dict) -> None:
        cond = sig["additional_conditions"]["public.events"]
        runner = ChunkedSnapshotRunner(
            spark, snapshot_at, ch, "user_id", "pos", bounds, watermarks,
            str(tmp_path / "snap"), condition=cond,
        )
        assert runner.run() == COMPLETED
        result["snap"] = runner.result()
        result["cond"] = cond

    sig_rows = spark.createDataFrame(
        [(
            "sig-1", "execute-snapshot",
            '{"data-collections": ["public.events"],'
            ' "additional-conditions": [{"data-collection": "public.events",'
            ' "filter": "user_id % 3 = 0"}]}',
        )],
        "id STRING, type STRING, data STRING",
    )
    actions = dispatch_signals(
        sig_rows, handlers={"execute-snapshot": run_filtered}
    )
    assert actions[0]["handled"]

    # every snapshot row honors the predicate
    assert result["snap"].filter(~F.expr(result["cond"])).count() == 0
    combined = result["snap"].select(
        "user_id", "pos", "value", "__op"
    ).unionByName(
        ch.filter(F.expr(result["cond"]))
        .select("user_id", "pos", "value", "__op")
    )
    got = (
        materialize_latest(combined, ["user_id"], ["pos"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    want = (
        materialize_latest(ch.filter(F.expr(result["cond"])),
                           ["user_id"], ["pos"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    ch.unpersist()


def test_crash_recovery_resumes_from_bookmark(spark, tmp_path):
    """A process crash mid-snapshot (simulated: the runner object is
    thrown away, every in-memory flag lost) resumes from the persisted
    bookmark: a FRESH runner over the same work_dir re-runs NO completed
    chunk, emits no second STARTED, and a paused bookmark stays paused
    until an explicit resume-snapshot — restart must not silently
    resume what an operator paused."""
    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, calls = _fixture(spark, ch)
    wd = str(tmp_path / "snap")

    r1 = ChunkedSnapshotRunner(
        spark, snapshot_at, ch, "user_id", "pos", bounds, watermarks, wd
    )
    # "crash" after chunk 1: pause gives us a clean two-chunk bookmark,
    # then the object is discarded (flags die with the process)
    pending = [None, None]

    def poll():
        if not pending:
            r1.request_pause()
        else:
            pending.pop(0)

    assert r1.run(poll=poll) == PAUSED
    assert len(calls) == 2
    del r1

    chan = NotificationChannel()
    r2 = ChunkedSnapshotRunner(
        spark, snapshot_at, ch, "user_id", "pos", bounds, watermarks, wd,
        channel=chan,
    )
    # durable pause: fresh process may NOT auto-resume
    assert r2.run() == PAUSED
    assert len(calls) == 2 and chan.rows == []
    r2.request_resume()
    assert r2.run() == COMPLETED
    assert len(calls) == 4  # chunks 0/1 never re-scanned
    assert [t for (_, _, t, _, _) in chan.rows] == [
        "RESUMED", "TABLE_SCAN_COMPLETED", "TABLE_SCAN_COMPLETED",
        "COMPLETED",
    ]
    assert r2.result().count() > 0
    ch.unpersist()


def test_execute_snapshot_multi_collection(spark, tmp_path):
    """One execute-snapshot signal naming TWO collections: sequential
    per-collection runners, per-collection notifications
    (data_collection in additional_data), additional-conditions applied
    only to the collection they name, and an uncaptured collection
    raising loudly."""
    import pytest

    from debezium_incubator_spark.cdc.snapshot_lifecycle import (
        execute_snapshot,
    )

    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, _ = _fixture(spark, ch)
    src = {
        "snapshot_at": snapshot_at, "changes": ch, "key": "user_id",
        "pos_col": "pos", "bounds": bounds, "watermarks": watermarks,
    }
    sources = {"public.events": src, "public.events_b": dict(src)}
    result = {}
    chan = NotificationChannel()

    def handler(sig):
        result["runners"] = execute_snapshot(
            spark, sig, sources, str(tmp_path / "snaps"), channel=chan
        )

    sig_rows = spark.createDataFrame(
        [(
            "sig-1", "execute-snapshot",
            '{"data-collections": ["public.events", "public.events_b"],'
            ' "additional-conditions": [{"data-collection": "public.events_b",'
            ' "filter": "user_id % 2 = 0"}]}',
        )],
        "id STRING, type STRING, data STRING",
    )
    dispatch_signals(sig_rows, handlers={"execute-snapshot": handler})

    runners = result["runners"]
    assert list(runners) == ["public.events", "public.events_b"]
    assert all(r.status == COMPLETED for r in runners.values())
    # the condition bound only to the collection that named it
    assert runners["public.events"].condition is None
    assert runners["public.events_b"].condition == "user_id % 2 = 0"
    assert (
        runners["public.events_b"].result()
        .filter(F.expr("user_id % 2 <> 0")).count() == 0
    )
    assert runners["public.events"].result().count() > \
        runners["public.events_b"].result().count()
    # per-collection notification streams, strictly sequential
    colls = [d.get("data_collection") for (_, _, _, d, _) in chan.rows]
    first_b = colls.index("public.events_b")
    assert set(colls[:first_b]) == {"public.events"}
    assert set(colls[first_b:]) == {"public.events_b"}
    types_a = [t for (_, _, t, d, _) in chan.rows
               if d.get("data_collection") == "public.events"]
    assert types_a[0] == "STARTED" and types_a[-1] == "COMPLETED"

    # uncaptured collection: loud error
    with pytest.raises(ValueError, match="uncaptured"):
        execute_snapshot(
            spark,
            {"data_collections": ["public.nope"], "additional_conditions": {}},
            sources, str(tmp_path / "snaps2"),
        )
    ch.unpersist()


def test_coordinator_scoped_stop_removes_only_named_collections(
    spark, tmp_path
):
    """Debezium stop-snapshot scoping: a stop signal CARRYING
    data-collections removes just those from the in-flight snapshot
    (here: arrives while collection A runs, names B → A completes, B is
    never scanned and reports 'removed' with an ABORTED notification,
    C completes); a stop WITHOUT collections aborts everything still
    outstanding."""
    from debezium_incubator_spark.cdc.snapshot_lifecycle import (
        SnapshotCoordinator,
    )

    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, calls = _fixture(spark, ch)
    src = {
        "snapshot_at": snapshot_at, "changes": ch, "key": "user_id",
        "pos_col": "pos", "bounds": bounds, "watermarks": watermarks,
    }
    sources = {"db.a": dict(src), "db.b": dict(src), "db.c": dict(src)}
    chan = NotificationChannel()
    coord = SnapshotCoordinator(
        spark, sources, str(tmp_path / "s1"), channel=chan
    )
    sig = {
        "data_collections": ["db.a", "db.b", "db.c"],
        "additional_conditions": {},
    }
    # scoped stop naming db.b arrives during db.a's second chunk window
    pending = [None, None, _signal(
        spark, "s1", "stop-snapshot", '{"data-collections": ["db.b"]}'
    )]

    def poll():
        if pending and (s := pending.pop(0)) is not None:
            dispatch_signals(s, handlers=coord.signal_handlers())

    status = coord.run(sig, poll=poll)
    assert status == {
        "db.a": COMPLETED, "db.b": "removed", "db.c": COMPLETED,
    }
    # db.b never scanned: a + c each ran 4 chunks
    assert len(calls) == 8
    assert "db.b" not in coord.runners
    removed_notes = [
        (t, d) for (_, _, t, d, _) in chan.rows
        if d.get("data_collection") == "db.b"
    ]
    assert removed_notes == [("ABORTED", {
        "data_collection": "db.b", "reason": "stop-snapshot",
    })]

    # unscoped stop: aborts the running collection, removes the rest
    calls.clear()
    coord2 = SnapshotCoordinator(spark, sources, str(tmp_path / "s2"))
    # poll fires once before the collection and once before each chunk:
    # [coord, chunk0, STOP-before-chunk1]
    pending2 = [None, None, _signal(spark, "s2", "stop-snapshot")]

    def poll2():
        if pending2 and (s := pending2.pop(0)) is not None:
            dispatch_signals(s, handlers=coord2.signal_handlers())

    status2 = coord2.run(sig, poll=poll2)
    assert status2 == {
        "db.a": "removed", "db.b": "removed", "db.c": "removed",
    }
    assert len(calls) == 1  # db.a's first chunk only, then the stop
    ch.unpersist()


def test_coordinator_pause_resume_spans_collections(spark, tmp_path):
    """Whole-snapshot pause during collection A leaves B queued; a
    resume-snapshot arriving BETWEEN coordinator.run() invocations
    reaches the paused runner, and the second run() finishes A from its
    bookmark and then runs B — nothing re-scanned."""
    from debezium_incubator_spark.cdc.snapshot_lifecycle import (
        SnapshotCoordinator,
    )

    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, calls = _fixture(spark, ch)
    src = {
        "snapshot_at": snapshot_at, "changes": ch, "key": "user_id",
        "pos_col": "pos", "bounds": bounds, "watermarks": watermarks,
    }
    sources = {"db.a": dict(src), "db.b": dict(src)}
    coord = SnapshotCoordinator(spark, sources, str(tmp_path / "s"))
    sig = {"data_collections": ["db.a", "db.b"], "additional_conditions": {}}

    # [coord, chunk0, chunk1, PAUSE-before-chunk2]
    pending = [None, None, None, _signal(spark, "p1", "pause-snapshot")]

    def poll():
        if pending and (s := pending.pop(0)) is not None:
            dispatch_signals(s, handlers=coord.signal_handlers())

    status = coord.run(sig, poll=poll)
    assert status == {"db.a": PAUSED}  # db.b still queued
    assert len(calls) == 2

    dispatch_signals(
        _signal(spark, "p2", "resume-snapshot"),
        handlers=coord.signal_handlers(),
    )
    status = coord.run(sig)
    assert status == {"db.a": COMPLETED, "db.b": COMPLETED}
    assert len(calls) == 8  # a: its 2 remaining chunks, b: all 4 — no re-scan
    ch.unpersist()


def test_connector_main_loop_no_data_plus_adhoc_snapshot_converges(
    spark, tmp_path
):
    """The assembled Debezium story (§1.1 capstone): a connector starts
    with snapshot.mode=no_data (schema only, no backfill) and folds the
    live change stream into bucket-partitioned state; keys that never
    change after the start position are MISSING — until an
    execute-snapshot signal arrives mid-stream, its chunked runner
    reads the current table image, and the op='r' chunks are applied
    into the SAME state as just another epoch. After the remaining
    stream epochs, state equals exactly what snapshot.mode=initial
    would have produced — including a post-snapshot delete overriding
    the image. Every piece is the production path: signal dispatch →
    coordinator → runner with persisted chunks → partitioned apply."""
    from debezium_incubator_spark.cdc.snapshot_lifecycle import (
        SnapshotCoordinator,
    )
    from debezium_incubator_spark.streaming.partitioned_state import (
        apply_changes_partitioned,
        read_state_partitioned,
    )

    # synthetic log with a REAL backfill gap: keys 0..19 created at
    # pos 0..19; keys 10..19 updated at pos 110..119; key 3 deleted at
    # pos 300 (after the snapshot will run); connector starts at S=90
    rows = [(k, k, float(k), "c") for k in range(20)]
    rows += [(k, 100 + k, k + 0.5, "u") for k in range(10, 20)]
    rows += [(3, 300, None, "d")]
    ch = spark.createDataFrame(
        rows, "user_id LONG, pos LONG, value DOUBLE, __op STRING"
    )
    state = str(tmp_path / "state")

    # epoch 1: stream from S to the snapshot point (pos in (90, 200])
    apply_changes_partitioned(
        spark, ch.filter("pos > 90 AND pos <= 200"), 1, state,
        ["user_id"], ["pos"], n_buckets=4,
    )
    pre = read_state_partitioned(spark, state)
    assert sorted(r.user_id for r in pre.collect()) == list(range(10, 20)), \
        "no_data start: never-restreamed keys must be missing pre-snapshot"

    # mid-stream execute-snapshot signal → coordinator → runner; the
    # snapshot reads the table AS OF pos 200 in 2 PK chunks
    def snapshot_at(p):
        return materialize_latest(
            ch.filter(F.col("pos") <= p), ["user_id"], ["pos"]
        ).select("user_id", "value")

    sources = {"db.t": {
        "snapshot_at": snapshot_at, "changes": ch, "key": "user_id",
        "pos_col": "pos", "bounds": [(-1, 9), (9, 19)],
        "watermarks": [(195, 200), (195, 200)],
    }}
    coord = SnapshotCoordinator(spark, sources, str(tmp_path / "snap"))
    done = {}

    def handler(sig):
        done["status"] = coord.run(sig)

    dispatch_signals(
        _signal(
            spark, "sig-1", "execute-snapshot",
            '{"data-collections": ["db.t"]}',
        ),
        handlers={"execute-snapshot": handler},
    )
    assert done["status"] == {"db.t": COMPLETED}

    # epoch 2: the snapshot's op='r' chunks apply as a normal batch
    apply_changes_partitioned(
        spark, coord.runners["db.t"].result(), 2, state,
        ["user_id"], ["pos"], n_buckets=4,
    )
    # epoch 3: the rest of the stream — including the delete of key 3,
    # which must override its freshly-snapshotted image
    apply_changes_partitioned(
        spark, ch.filter("pos > 200"), 3, state,
        ["user_id"], ["pos"], n_buckets=4,
    )

    got = {
        r.user_id: r.value
        for r in read_state_partitioned(spark, state).collect()
    }
    want = {
        r.user_id: r.value
        for r in materialize_latest(ch, ["user_id"], ["pos"]).collect()
    }
    assert got == want          # == snapshot.mode=initial outcome
    assert 3 not in got         # post-snapshot delete beat the image
    assert got[0] == 0.0 and got[15] == 15.5


def test_chunk_scan_pushes_key_range_and_condition_to_parquet(
    spark, tmp_path
):
    """The DBLog scale argument depends on chunk scans being INDEX
    RANGE scans, not table scans: the PK-range predicate and the
    signal's additional-conditions filter must reach the parquet source
    (PushedFilters), so a chunk reads only its row groups. At 100 TB a
    chunk that scanned the whole table would make the snapshot
    quadratic in chunks x table."""
    from debezium_incubator_spark.cdc.incremental_snapshot import (
        snapshot_chunk,
    )

    src = str(tmp_path / "t")
    spark.range(0, 10000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "id % 7 AS grp"
    ).write.parquet(src)
    snap = spark.read.parquet(src)
    changes = spark.createDataFrame([], "k LONG, pos LONG")
    chunk = snapshot_chunk(
        snap, "k", (1000, 2000), changes, "pos", 10, 20,
        condition="grp = 3",
    )
    plan = chunk._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    pf = pushed[0]
    assert "GreaterThan(k,1000)" in pf
    assert "LessThanOrEqual(k,2000)" in pf
    assert "EqualTo(grp,3)" in pf


def test_signal_ledger_makes_dispatch_idempotent_and_contains_errors(
    spark, tmp_path
):
    """Replayed micro-batches must not re-execute signals (Debezium
    marks signals processed): with a SignalLedger, a second dispatch of
    the same batch skips every id as 'duplicate' and the handler runs
    exactly once — including across a PROCESS RESTART (fresh ledger
    object over the same file). A handler exception is contained on the
    action entry and — by the at-least-once ack policy — left UNACKED,
    so the failed signal retries on the next replay and succeeds once
    the transient cause clears; it never stops later signals in the
    batch. Unknown signal types are acked permanently (retrying can't
    help), and ``ack_failures=True`` opts into at-most-once."""
    from debezium_incubator_spark.cdc.signals import SignalLedger

    ledger = SignalLedger(str(tmp_path / "signals.ledger"))
    runs = []

    def ok(sig):
        runs.append(sig["id"])

    def boom(sig):
        raise RuntimeError("snapshot source unreachable")

    batch = spark.createDataFrame(
        [
            ("sig-a", "execute-snapshot", '{"data-collections": ["t"]}'),
            ("sig-b", "pause-snapshot", "null"),
            ("sig-c", "execute-snapshot", '{"data-collections": ["t"]}'),
        ],
        "id STRING, type STRING, data STRING",
    )
    handlers = {"execute-snapshot": ok, "pause-snapshot": boom}
    a1 = dispatch_signals(batch, handlers=handlers, ledger=ledger)
    assert [e["handled"] for e in a1] == [True, False, True]
    assert "handler failed: snapshot source unreachable" == a1[1]["error"]
    assert runs == ["sig-a", "sig-c"]  # the failure didn't stop sig-c

    # same batch replayed with the transient cause CLEARED: the handled
    # signals skip as duplicates, the failed one retries and succeeds —
    # the at-least-once ack policy (a contained failure is not acked)
    handlers["pause-snapshot"] = ok
    a2 = dispatch_signals(batch, handlers=handlers, ledger=ledger)
    assert [e.get("skipped") for e in a2] == ["duplicate", None, "duplicate"]
    assert a2[1]["handled"] and runs == ["sig-a", "sig-c", "sig-b"]

    # restart: a FRESH ledger over the same file still remembers all 3
    ledger2 = SignalLedger(str(tmp_path / "signals.ledger"))
    a3 = dispatch_signals(batch, handlers=handlers, ledger=ledger2)
    assert [e.get("skipped") for e in a3] == ["duplicate"] * 3
    assert runs == ["sig-a", "sig-c", "sig-b"]

    # a genuinely new signal still dispatches
    extra = _signal(spark, "sig-d", "execute-snapshot",
                    '{"data-collections": ["t"]}')
    a4 = dispatch_signals(extra, handlers=handlers, ledger=ledger2)
    assert a4[0]["handled"] and runs == ["sig-a", "sig-c", "sig-b", "sig-d"]

    # unknown signal types are PERMANENT errors: acked on first sight,
    # never retried (a replay skips them as duplicates)
    bad = _signal(spark, "sig-e", "no-such-type", "null")
    b1 = dispatch_signals(bad, handlers=handlers, ledger=ledger2)
    assert "unknown signal type" in b1[0]["error"]
    b2 = dispatch_signals(bad, handlers=handlers, ledger=ledger2)
    assert b2[0].get("skipped") == "duplicate"

    # ack_failures=True: at-most-once — a contained failure is acked
    # and a replay does NOT retry it
    ledger3 = SignalLedger(str(tmp_path / "amo.ledger"))
    failing = {"pause-snapshot": boom}
    c1 = dispatch_signals(
        _signal(spark, "sig-f", "pause-snapshot", "null"),
        handlers=failing, ledger=ledger3, ack_failures=True,
    )
    assert "handler failed" in c1[0]["error"]
    c2 = dispatch_signals(
        _signal(spark, "sig-f", "pause-snapshot", "null"),
        handlers=failing, ledger=ledger3, ack_failures=True,
    )
    assert c2[0].get("skipped") == "duplicate"


def test_signal_channel_stream_dispatches_once_across_restarts(
    spark, tmp_path
):
    """The signal channel as a REAL stream (§1.1): signal rows land as
    jsonlines files in a watched directory; each availableNow run
    drains them through dispatch_signals on the driver. The ledger
    layer guarantees a signal executes ONCE even when the stream
    restarts WITHOUT its checkpoint (the worst replay case: every file
    re-delivered) — and new files arriving later still dispatch."""
    import json as _json
    import os

    from debezium_incubator_spark.cdc.signals import SignalLedger
    from debezium_incubator_spark.streaming.sources import (
        signal_file_stream,
        start_signal_dispatch_stream,
    )

    sig_dir = str(tmp_path / "signals")
    os.makedirs(sig_dir)

    def drop(name, rows):
        with open(os.path.join(sig_dir, name), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    drop("b1.json", [
        {"id": "sig-1", "type": "execute-snapshot",
         "data": '{"data-collections": ["t"]}'},
        {"id": "sig-2", "type": "log", "data": '{"message": "hi"}'},
    ])

    runs, logs = [], []
    handlers = {
        "execute-snapshot": lambda s: runs.append(s["id"]),
        "log": lambda s: logs.append(s["data"]["message"]),
    }
    ledger = SignalLedger(str(tmp_path / "ledger"))
    all_actions = []

    def run_stream(checkpoint):
        q = start_signal_dispatch_stream(
            signal_file_stream(spark, sig_dir), handlers, ledger=ledger,
            checkpoint=checkpoint,
            on_actions=lambda ep, acts: all_actions.extend(acts),
        )
        q.awaitTermination()

    run_stream(str(tmp_path / "cp1"))
    assert runs == ["sig-1"] and logs == ["hi"]

    # restart with a FRESH checkpoint: every file re-delivered, ledger
    # must stop re-execution
    run_stream(str(tmp_path / "cp2"))
    assert runs == ["sig-1"] and logs == ["hi"]
    assert [a.get("skipped") for a in all_actions].count("duplicate") == 2

    # a NEW signal file still dispatches on the next run
    drop("b2.json", [
        {"id": "sig-3", "type": "execute-snapshot",
         "data": '{"data-collections": ["t"]}'},
    ])
    run_stream(str(tmp_path / "cp2"))
    assert runs == ["sig-1", "sig-3"]


def test_execute_snapshot_handler_routes_on_snapshot_kind(spark, tmp_path):
    """One handler for the execute-snapshot signal TYPE routes on the
    signal's data.type the way the connector does: kind 'incremental'
    runs the chunked coordinator; kind 'blocking' produces the
    consistent-image delivery (whose fold equals latest state, overlap
    and all). Both dispatched through the real signal path."""
    from debezium_incubator_spark.cdc.incremental_snapshot import (
        resolve_blocking_delivery,
    )
    from debezium_incubator_spark.cdc.snapshot_lifecycle import (
        make_execute_snapshot_handler,
    )

    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, _ = _fixture(spark, ch)
    max_pos = ch.agg(F.max("pos")).first()[0]
    sources = {"db.t": {
        "snapshot_at": snapshot_at, "changes": ch, "key": "user_id",
        "pos_col": "pos", "bounds": bounds, "watermarks": watermarks,
        "blocking_window": (int(max_pos * 0.6), int(max_pos * 0.8)),
    }}
    results = {}
    handler = make_execute_snapshot_handler(
        spark, sources, str(tmp_path / "w"), results=results
    )
    batch = spark.createDataFrame(
        [
            ("sig-inc", "execute-snapshot",
             '{"data-collections": ["db.t"]}'),
            ("sig-blk", "execute-snapshot",
             '{"data-collections": ["db.t"], "type": "blocking"}'),
        ],
        "id STRING, type STRING, data STRING",
    )
    acts = dispatch_signals(batch, handlers={"execute-snapshot": handler})
    assert all(a["handled"] for a in acts)

    assert results["sig-inc"]["kind"] == "incremental"
    assert results["sig-inc"]["status"] == {"db.t": COMPLETED}
    assert results["sig-inc"]["runners"]["db.t"].result().count() > 0

    assert results["sig-blk"]["kind"] == "blocking"
    state = resolve_blocking_delivery(
        results["sig-blk"]["deliveries"]["db.t"], "user_id", "pos"
    )
    want = materialize_latest(ch, ["user_id"], ["pos"])
    got = {r.user_id: r.value for r in state.collect()}
    assert got == {r.user_id: r.value for r in want.collect()}
    ch.unpersist()


def test_mid_snapshot_schema_widening_survives_in_result(spark, tmp_path):
    """A DDL widening LANDING MID-SNAPSHOT (routine during an
    hours-long 100 TB snapshot): chunks read before the ALTER are
    narrower than chunks read after. result() must surface the union
    schema — pre-widening chunk rows NULL for the new column, not a
    silently dropped column (the same mergeSchema failure mode the
    partitioned-state tier fixed for cross-epoch buckets)."""
    rows = [(k, k, float(k), "u") for k in range(20)]
    ch = spark.createDataFrame(
        rows, "k LONG, pos LONG, v DOUBLE, __op STRING"
    )
    widened = {"on": False}

    def snapshot_at(p):
        base = materialize_latest(
            ch.filter(F.col("pos") <= p), ["k"], ["pos"]
        ).select("k", "v")
        if widened["on"]:  # the source table gained a column
            base = base.withColumn("v2", F.concat(F.lit("x"), F.col("k")))
        return base

    runner = ChunkedSnapshotRunner(
        spark, snapshot_at, ch, "k", "pos",
        bounds=[(-1, 9), (9, 19)], watermarks=[(95, 100), (95, 100)],
        work_dir=str(tmp_path / "snap"),
    )
    # chunk 0 before the DDL, chunk 1 after — pause between them
    pending = [None]

    def poll():
        if pending:
            pending.pop()
        else:
            runner.request_pause()

    assert runner.run(poll=poll) == PAUSED
    widened["on"] = True
    runner.request_resume()
    assert runner.run() == COMPLETED

    got = runner.result()
    assert "v2" in got.columns
    vals = {r.k: r.v2 for r in got.collect()}
    assert all(vals[k] is None for k in vals if k <= 9)      # pre-DDL chunk
    assert all(vals[k] == f"x{k}" for k in vals if k > 9)    # post-DDL chunk
    assert len(vals) == 20


def test_chunk_size_config_drives_runner(spark, tmp_path):
    """The literal Debezium keys drive the new machinery:
    incremental.snapshot.chunk.size sizes the chunk count the runner
    executes (commit granularity = the user's operability dial), and
    signal.data.collection / signal.enabled.channels wire the signal
    channel."""
    import pytest

    from debezium_incubator_spark.connector import (
        incremental_snapshot_plan,
        signal_config,
    )

    ch = _changes(spark).cache()
    n_rows = ch.count()  # 1000 at sf0.001
    plan = incremental_snapshot_plan(
        {"incremental.snapshot.chunk.size": "250"}, n_rows
    )
    assert plan == {"chunk_size": 250, "n_chunks": 4}
    assert incremental_snapshot_plan({}, 10)["n_chunks"] == 1  # default 1024
    with pytest.raises(ValueError):
        incremental_snapshot_plan(
            {"incremental.snapshot.chunk.size": "0"}, 10
        )

    # the configured chunk count is what the runner actually executes
    bounds, watermarks, snapshot_at, calls = _fixture(
        spark, ch, n_chunks=plan["n_chunks"]
    )
    runner = ChunkedSnapshotRunner(
        spark, snapshot_at, ch, "user_id", "pos", bounds, watermarks,
        str(tmp_path / "snap"),
    )
    assert runner.run() == COMPLETED
    assert len(calls) == plan["n_chunks"]

    sc = signal_config({
        "signal.data.collection": "ops.debezium_signal",
        "signal.enabled.channels": "source,file",
    })
    assert sc == {"collection": "ops.debezium_signal",
                  "enabled_channels": ["source", "file"]}
    ch.unpersist()


def test_source_table_signal_channel_extracts_inserts_only(spark, tmp_path):
    """Public Debezium's primary signal channel is a CAPTURED TABLE
    (`signal.data.collection`): signals ride the change stream itself.
    Only INSERTs on that collection act — updates/deletes to the signal
    table, snapshot re-reads of old signal rows (op='r'), other tables'
    events, and tombstones are all ignored — and the ledger still
    dedups a log-rewind re-delivery of the same signal row."""
    import json as _json

    from debezium_incubator_spark.cdc.signals import (
        SignalLedger,
        signals_from_change_stream,
    )

    def wire(table_name, op, after):
        return _json.dumps(
            {"after": after, "source": {"table": table_name}, "op": op}
        )

    sig = {"id": "sig-1", "type": "execute-snapshot",
           "data": '{"data-collections": ["db.users"]}'}
    old_sig = {"id": "sig-0", "type": "log", "data": "{}"}
    rows = [
        # data-plane event on another table: ignored
        (wire("events", "c", {"id": "9", "type": "x", "data": "y"}),),
        # snapshot re-read of a historic signal row: must NOT re-execute
        (wire("dbz.signal", "r", old_sig),),
        # the actual signal insert
        (wire("dbz.signal", "c", sig),),
        # operator UPDATE/DELETE on the signal table: ignored
        (wire("dbz.signal", "u", dict(sig, id="sig-2")),),
        (wire("dbz.signal", "d", None),),
        # tombstone after the delete
        (None,),
    ]
    raw = spark.createDataFrame(rows, "value STRING")
    got = signals_from_change_stream(raw, "dbz.signal").collect()
    assert [(r.id, r.type) for r in got] == [("sig-1", "execute-snapshot")]

    # dispatch through the real path with a ledger; then re-deliver the
    # SAME change rows (offset rewind) — the ledger dedups
    ledger = SignalLedger(str(tmp_path / "ledger"))
    seen = []
    handlers = {"execute-snapshot": lambda req: seen.append(req["id"])}
    a1 = dispatch_signals(
        signals_from_change_stream(raw, "dbz.signal"), handlers, ledger
    )
    a2 = dispatch_signals(
        signals_from_change_stream(raw, "dbz.signal"), handlers, ledger
    )
    assert seen == ["sig-1"]
    assert a1[0]["handled"] and a2[0].get("skipped") == "duplicate"


def test_source_table_signal_channel_streams(spark, tmp_path):
    """The extractor is plan-level: the same function on a readStream
    source dispatches through foreachBatch exactly as in batch (the
    signal collection is just another table in the log)."""
    import json as _json

    from debezium_incubator_spark.cdc.signals import (
        SignalLedger,
        signals_from_change_stream,
    )

    src = tmp_path / "wire"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(
            _json.dumps({"value": v})
            for v in [
                _json.dumps({"after": {"id": "s-1", "type": "log",
                                       "data": "{}"},
                             "source": {"table": "dbz.signal"}, "op": "c"}),
                _json.dumps({"after": {"id": "x", "type": "log",
                                       "data": "{}"},
                             "source": {"table": "events"}, "op": "c"}),
            ]
        )
    )
    raw = (
        spark.readStream.schema("value STRING")
        .json(str(src))
    )
    ledger = SignalLedger(str(tmp_path / "ledger"))
    seen = []

    def on_batch(batch_df, _bid):
        dispatch_signals(
            signals_from_change_stream(batch_df, "dbz.signal"),
            {"log": lambda req: seen.append(req["id"])},
            ledger,
        )

    q = (
        raw.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert seen == ["s-1"]


def test_source_table_signal_triggers_snapshot_e2e(spark, tmp_path):
    """Full source-channel loop: an execute-snapshot row INSERTed into
    the signal collection rides the same JSON wire as data events; the
    extractor lifts exactly it, dispatch routes through the real
    handler, and the resulting blocking delivery folds to the captured
    table's latest state — signal-in-the-log → snapshot-out, end to
    end."""
    import json as _json

    from debezium_incubator_spark.cdc.incremental_snapshot import (
        resolve_blocking_delivery,
    )
    from debezium_incubator_spark.cdc.signals import (
        SignalLedger,
        signals_from_change_stream,
    )
    from debezium_incubator_spark.cdc.snapshot_lifecycle import (
        make_execute_snapshot_handler,
    )

    ch = _changes(spark).cache()
    max_pos = ch.agg(F.max("pos")).first()[0]
    sources = {"db.t": {
        "changes": ch, "key": "user_id", "pos_col": "pos",
        "blocking_window": (int(max_pos * 0.6), int(max_pos * 0.8)),
    }}
    # the wire: data events on db.t plus ONE signal insert; only the
    # signal row may reach dispatch
    wire_rows = [
        (_json.dumps({"after": {"id": str(i), "type": "x", "data": "y"},
                      "source": {"table": "db.t"}, "op": "c"}),)
        for i in range(5)
    ] + [
        (_json.dumps({
            "after": {"id": "sig-e2e", "type": "execute-snapshot",
                      "data": _json.dumps({
                          "data-collections": ["db.t"],
                          "type": "blocking"})},
            "source": {"table": "dbz.signal"}, "op": "c"}),),
    ]
    wire = spark.createDataFrame(wire_rows, "value STRING")
    results = {}
    handler = make_execute_snapshot_handler(
        spark, sources, str(tmp_path / "w"), results=results
    )
    acts = dispatch_signals(
        signals_from_change_stream(wire, "dbz.signal"),
        handlers={"execute-snapshot": handler},
        ledger=SignalLedger(str(tmp_path / "ledger")),
    )
    assert [a["id"] for a in acts] == ["sig-e2e"] and acts[0]["handled"]
    state = resolve_blocking_delivery(
        results["sig-e2e"]["deliveries"]["db.t"], "user_id", "pos"
    )
    want = materialize_latest(ch, ["user_id"], ["pos"])
    assert {r.user_id: r.value for r in state.collect()} == {
        r.user_id: r.value for r in want.collect()
    }
    ch.unpersist()


def test_file_notification_channel_durable(spark, tmp_path):
    """The sink notification channel survives restarts: a lifecycle
    snapshot's notification sequence lands in the jsonlines file, a
    FRESH channel over the same file resumes ids after the persisted
    tail, and the consumer-side typed read returns the full ordered
    sequence."""
    from debezium_incubator_spark.cdc.notifications import (
        FileNotificationChannel,
        read_notifications,
    )

    path = str(tmp_path / "notifications.jsonl")
    ch = FileNotificationChannel(path)
    ch.notify("Incremental Snapshot", "STARTED", position=5, table="db.t")
    ch.notify("Incremental Snapshot", "TABLE_SCAN_COMPLETED", position=9)
    # restart: fresh channel resumes numbering, history visible
    ch2 = FileNotificationChannel(path)
    assert [r[0] for r in ch2.rows] == ["n-0", "n-1"]
    ch2.notify("Incremental Snapshot", "COMPLETED", position=12)
    got = (
        read_notifications(spark, path)
        .orderBy("id")
        .collect()
    )
    assert [r.type for r in got] == [
        "STARTED", "TABLE_SCAN_COMPLETED", "COMPLETED"
    ]
    assert [r.id for r in got] == ["n-0", "n-1", "n-2"]
    assert got[0].additional_data == {"table": "db.t"}
    assert [r.timestamp for r in got] == [5, 9, 12]


def test_file_notification_channel_concurrent_writers_unique_ids(
    spark, tmp_path
):
    """Two live channel instances over the SAME path (a writer racing a
    resumed one — the multi-writer case the sink-channel contract must
    survive): ids are minted from the max PERSISTED id under an
    exclusive flock, so interleaved notifies never collide, and the
    consumer's per-path dedup key stays globally unique."""
    import json

    from debezium_incubator_spark.cdc.notifications import (
        FileNotificationChannel,
    )

    path = str(tmp_path / "notifications.jsonl")
    a = FileNotificationChannel(path)
    a.notify("Incremental Snapshot", "STARTED", position=1)
    # second instance opened while the first is still live — it resumes
    # from the persisted tail and the two then interleave writes
    b = FileNotificationChannel(path)
    b.notify("Incremental Snapshot", "TABLE_SCAN_COMPLETED", position=2)
    a.notify("Incremental Snapshot", "TABLE_SCAN_COMPLETED", position=3)
    b.notify("Incremental Snapshot", "COMPLETED", position=4)

    with open(path) as fh:
        rows = [json.loads(ln) for ln in fh if ln.strip()]
    ids = [r["id"] for r in rows]
    assert ids == ["n-0", "n-1", "n-2", "n-3"]  # unique AND gapless
    assert [r["timestamp"] for r in rows] == [1, 2, 3, 4]


def test_malformed_signal_rows_are_contained(spark, tmp_path):
    """A bad row in the signal collection (missing type, null id, data
    that isn't JSON) must not stop the connector: dispatch records an
    error/skip entry per bad signal and still executes the good one —
    the DLQ philosophy applied to the control plane."""
    import json as _json

    from debezium_incubator_spark.cdc.signals import (
        SignalLedger,
        signals_from_change_stream,
    )

    def wire(after):
        return (_json.dumps({"after": after,
                             "source": {"table": "dbz.signal"},
                             "op": "c"}),)

    rows = [
        wire({"id": "s-good", "type": "log", "data": "{}"}),
        wire({"id": "s-no-type", "type": None, "data": "{}"}),
        wire({"id": "s-bad-data", "type": "log", "data": "!!not json"}),
        wire({"id": None, "type": "log", "data": "{}"}),
    ]
    raw = spark.createDataFrame(rows, "value STRING")
    seen = []
    acts = dispatch_signals(
        signals_from_change_stream(raw, "dbz.signal"),
        handlers={"log": lambda req: seen.append(req["id"])},
        ledger=SignalLedger(str(tmp_path / "ledger")),
    )
    by_id = {a["id"]: a for a in acts}
    assert by_id["s-good"]["handled"]
    assert "error" in by_id[None] and not by_id[None]["handled"]
    assert "error" in by_id["s-no-type"] and not by_id["s-no-type"]["handled"]
    assert "error" in by_id["s-bad-data"] and not by_id["s-bad-data"]["handled"]
    # the good signal ran exactly once despite the surrounding garbage
    assert seen == ["s-good"]


def test_readonly_watermarks_snapshot_folds_to_latest_state(
    spark, tmp_path
):
    """`read.only=true` twin: a runner given NO watermarks derives its
    (L,H] brackets by OBSERVING the log's positions (one driver job) —
    no signal-table writes anywhere in the protocol — and the chunked
    result still folds to exactly the latest state. The fold is
    watermark-placement-invariant (property-tested elsewhere), so
    observation-derived brackets are as correct as written ones; this
    test pins the derivation itself: per-chunk, in-range, narrow, and
    non-degenerate (the snapshot image is not reconciled away)."""
    from debezium_incubator_spark.cdc.incremental_snapshot import (
        readonly_watermarks,
    )

    ch = _changes(spark).cache()
    bounds, _, snapshot_at, calls = _fixture(spark, ch)

    wm = readonly_watermarks(ch, "pos", len(bounds))
    lo = ch.agg(F.min("pos")).first()[0]
    hi = ch.agg(F.max("pos")).first()[0]
    assert len(wm) == len(bounds)
    assert all(L < H and H <= hi and L >= lo - 1 for L, H in wm)
    assert all(H - L <= 5 for L, H in wm)  # narrow DBLog brackets
    assert wm[-1][1] == hi  # last bracket closes at the observed head

    runner = ChunkedSnapshotRunner(
        spark, snapshot_at, ch, "user_id", "pos", bounds, None,  # derive
        str(tmp_path / "snap"),
    )
    assert runner.run() == COMPLETED
    snap = runner.result()
    assert snap.count() > 0  # image survives reconciliation (narrow L,H)

    folded = materialize_latest(
        snap.select("user_id", "pos", "value", "__op").unionByName(
            ch.select("user_id", "pos", "value", "__op")
        ),
        ["user_id"], ["pos"],
    )
    want = materialize_latest(ch, ["user_id"], ["pos"])
    assert {r.user_id: r.value for r in folded.collect()} == {
        r.user_id: r.value for r in want.collect()
    }
    ch.unpersist()


def test_execute_snapshot_surrogate_key(spark, tmp_path):
    """The signal's ``surrogate-key`` chunks on the NAMED column while
    reconciliation stays on the real event key: ranges on a non-unique
    `bucket` column must not dedup whole buckets when one member key
    changed in-window, and the delivered snapshot + stream still fold
    to plain latest state. An unknown surrogate column refuses."""
    from debezium_incubator_spark.cdc.snapshot_lifecycle import (
        SnapshotCoordinator,
    )

    ch = _changes(spark).cache()
    max_pos = ch.agg(F.max("pos")).first()[0]

    def snapshot_at(p):
        return materialize_latest(
            ch.filter(F.col("pos") <= p), ["user_id"], ["pos"]
        ).select(
            "user_id", "value", (F.col("user_id") % 7).alias("bucket")
        )

    src = {
        "snapshot_at": snapshot_at, "changes": ch, "key": "user_id",
        "pos_col": "pos",
        "bounds": chunk_bounds(ch, "user_id", 4),
        "watermarks": [(max_pos - 5, max_pos)] * 4,
    }
    coord = SnapshotCoordinator(
        spark, {"db.t": src}, str(tmp_path / "snap")
    )
    done = {}
    dispatch_signals(
        _signal(
            spark, "sig-sk", "execute-snapshot",
            '{"data-collections": ["db.t"], "surrogate-key": "bucket"}',
        ),
        handlers={"execute-snapshot": lambda s: done.update(
            status=coord.run(s))},
    )
    assert done["status"] == {"db.t": COMPLETED}
    runner = coord.runners["db.t"]
    assert runner.key == "bucket" and runner.dedup_key == "user_id"
    snap = runner.result()
    assert snap.count() > 0
    combined = snap.select("user_id", "pos", "value", "__op").unionByName(
        ch.select("user_id", "pos", "value", "__op")
    )
    got = {(r.user_id, r.value) for r in materialize_latest(
        combined, ["user_id"], ["pos"]).select("user_id", "value").collect()}
    want = {(r.user_id, r.value) for r in materialize_latest(
        ch, ["user_id"], ["pos"]).select("user_id", "value").collect()}
    assert got == want and want

    # unknown surrogate column refuses loudly (contained by dispatch)
    coord2 = SnapshotCoordinator(
        spark, {"db.t": dict(src)}, str(tmp_path / "snap2")
    )
    acts = dispatch_signals(
        _signal(
            spark, "sig-bad", "execute-snapshot",
            '{"data-collections": ["db.t"], "surrogate-key": "ghost"}',
        ),
        handlers={"execute-snapshot": lambda s: coord2.run(s)},
    )
    assert "surrogate-key 'ghost'" in acts[0].get("error", "")
    ch.unpersist()


def test_snapshot_chunk_surrogate_dedup_separation(spark):
    """Unit pin of the dedup/range split: chunking on a non-unique
    column with reconciliation on the real key drops ONLY the changed
    key's row — a reconcile on the surrogate would erase every row in
    the changed row's bucket."""
    snap = spark.createDataFrame(
        [(1, 0, 10.0), (2, 0, 20.0), (3, 1, 30.0)],
        "user_id LONG, bucket LONG, value DOUBLE",
    )
    ch = spark.createDataFrame(
        [(2, 100, 21.0, "u")], "user_id LONG, pos LONG, value DOUBLE, __op STRING"
    )
    from debezium_incubator_spark.cdc.incremental_snapshot import (
        snapshot_chunk,
    )

    out = snapshot_chunk(
        snap, "bucket", (-1, 1), ch, "pos", 50, 150,
        dedup_key="user_id",
    )
    assert {r.user_id for r in out.collect()} == {1, 3}


def test_coordinator_rebuilds_runner_when_signal_options_change(
    spark, tmp_path
):
    """Round-7 ADVICE: a second execute-snapshot for the same
    collection with a DIFFERENT additional-condition must not silently
    reuse the first runner's condition — rebuilt (fresh work dir) when
    the old snapshot finished, refused loudly while one is in flight."""
    import pytest

    from debezium_incubator_spark.cdc.snapshot_lifecycle import (
        SnapshotCoordinator,
    )

    ch = _changes(spark).cache()
    bounds, watermarks, snapshot_at, calls = _fixture(spark, ch)
    src = {
        "snapshot_at": snapshot_at, "changes": ch, "key": "user_id",
        "pos_col": "pos", "bounds": bounds, "watermarks": watermarks,
    }
    coord = SnapshotCoordinator(spark, {"db.a": dict(src)},
                                str(tmp_path / "opts"))
    sig_all = {"data_collections": ["db.a"], "additional_conditions": {}}
    assert coord.run(sig_all) == {"db.a": COMPLETED}
    n_all = coord.runners["db.a"].result().count()

    # same collection, NEW condition: old runner completed → rebuild
    sig_cond = {
        "data_collections": ["db.a"],
        "additional_conditions": {"db.a": "user_id <= 5"},
    }
    assert coord.run(sig_cond) == {"db.a": COMPLETED}
    n_cond = coord.runners["db.a"].result().count()
    assert 0 < n_cond < n_all
    assert coord.runners["db.a"].result().agg(
        F.max("user_id")
    ).first()[0] <= 5

    # pause a third snapshot mid-run, then signal different options:
    # refused while in flight
    coord2 = SnapshotCoordinator(spark, {"db.a": dict(src)},
                                 str(tmp_path / "opts2"))
    pending = [None, None, _signal(spark, "pz", "pause-snapshot")]

    def poll():
        if pending and (s := pending.pop(0)) is not None:
            dispatch_signals(s, handlers=coord2.signal_handlers())

    assert coord2.run(sig_all, poll=poll) == {"db.a": PAUSED}
    with pytest.raises(ValueError, match="different\\s+options"):
        coord2.run(sig_cond)
    ch.unpersist()
