"""DBLog-style incremental snapshot: chunked snapshot reads interleaved
with a live change stream must reconcile to exactly the final table
state — chunk rows for keys changed inside a chunk's watermark window
are superseded by the change events, never lost, never resurrected."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.envelope import OP_CASE
from debezium_incubator_spark.cdc.incremental_snapshot import (
    chunk_bounds,
    incremental_snapshot,
)
from debezium_incubator_spark.cdc.materialize import materialize_latest

from .conftest import SF_SMOKE


def _changes(spark):
    return (
        table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            F.col("event_id").alias("pos"),
            "value",
            F.expr(OP_CASE).alias("__op"),
        )
    )


def test_incremental_snapshot_reconciles_to_final_state(spark):
    ch = _changes(spark).cache()
    final = (
        materialize_latest(ch, ["user_id"], ["pos"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )

    # 4 sequential chunk reads, each while the stream advanced further:
    # chunk i's scan sees the table at position H_i
    max_pos = ch.agg(F.max("pos")).first()[0]
    hs = [int(max_pos * f) for f in (0.25, 0.5, 0.75, 1.0)]
    watermarks = [(0, hs[0]), (hs[0], hs[1]), (hs[1], hs[2]), (hs[2], hs[3])]

    def snapshot_at(pos):
        # the table as a chunk SELECT would see it mid-stream
        return materialize_latest(
            ch.filter(F.col("pos") <= pos), ["user_id"], ["pos"]
        ).select("user_id", "value")

    bounds = chunk_bounds(ch, "user_id", 4)
    snap = incremental_snapshot(
        snapshot_at, ch, key="user_id", pos_col="pos",
        bounds=bounds, watermarks=watermarks,
    )
    # the consumer folds snapshot chunks + the live stream by position
    combined = snap.select("user_id", "pos", "value", "__op").unionByName(
        ch.select("user_id", "pos", "value", "__op")
    )
    got = (
        materialize_latest(combined, ["user_id"], ["pos"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, final, check_dtype=False)


def test_chunk_bounds_cover_key_space(spark):
    ch = _changes(spark)
    bounds = chunk_bounds(ch, "user_id", 4)
    lo = ch.agg(F.min("user_id")).first()[0]
    hi = ch.agg(F.max("user_id")).first()[0]
    assert bounds[0][0] < lo and bounds[-1][1] == hi
    # contiguous, non-overlapping (lo, hi] ranges
    for (a, b), (c, d) in zip(bounds, bounds[1:]):
        assert b == c and a < b and c < d


def test_blocking_snapshot_signal_flow_dedups_overlap(spark):
    """End-to-end signal path for the ad-hoc BLOCKING snapshot: an
    execute-snapshot signal with data.type='blocking' dispatches a
    handler that runs the pause → image-at-H → resume-from-L protocol.
    The consumer's delivery genuinely contains the overlap window twice
    (asserted), yet the fold equals plain latest-state — the
    overlap-window dedup proof the blocking kind requires (Debezium
    documents possible duplicate events after a blocking snapshot)."""
    from debezium_incubator_spark.cdc.incremental_snapshot import (
        blocking_snapshot_delivery,
        resolve_blocking_delivery,
    )
    from debezium_incubator_spark.cdc.signals import dispatch_signals

    ch = _changes(spark).cache()
    max_pos = ch.agg(F.max("pos")).first()[0]
    low, high = int(max_pos * 0.6), int(max_pos * 0.8)

    result = {}

    def run_blocking(sig: dict) -> None:
        assert sig["snapshot_kind"] == "blocking"
        assert sig["data_collections"] == ["public.events"]
        delivered = blocking_snapshot_delivery(
            ch, "user_id", "pos", low, high
        ).cache()
        result["delivered"] = delivered
        result["state"] = resolve_blocking_delivery(
            delivered, "user_id", "pos"
        )

    sig_rows = spark.createDataFrame(
        [(
            "sig-1", "execute-snapshot",
            '{"data-collections": ["public.events"], "type": "blocking"}',
        )],
        "id STRING, type STRING, data STRING",
    )
    actions = dispatch_signals(
        sig_rows, handlers={"execute-snapshot": run_blocking}
    )
    assert actions == [{
        "id": "sig-1", "type": "execute-snapshot", "handled": True,
        "data_collections": ["public.events"],
    }]

    # the overlap window is really delivered twice (and contains deletes,
    # so resurrection is genuinely at stake)
    overlap = result["delivered"].filter(
        (F.col("pos") > low) & (F.col("pos") <= high) & (F.col("__src") == 1)
    )
    n_overlap_events = ch.filter(
        (F.col("pos") > low) & (F.col("pos") <= high)
    ).count()
    assert n_overlap_events > 0
    assert overlap.count() == 2 * n_overlap_events
    assert overlap.filter(F.col("__op") == "d").count() > 0

    got = (
        result["state"].select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    want = (
        materialize_latest(ch, ["user_id"], ["pos"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    ch.unpersist()
    result["delivered"].unpersist()


def test_notification_channel_reports_snapshot_progress(spark):
    """Outbound notification channel (the connector-side twin of the
    signal channel): an incremental snapshot emits STARTED, one
    TABLE_SCAN_COMPLETED per chunk with the chunk bounds + watermarks,
    then COMPLETED; a blocking snapshot emits STARTED (with the resume
    position) and COMPLETED (with the overlap window). IDs are
    deterministic sequence numbers and timestamps are stream positions
    — replayable control plane, no wall-clock."""
    from debezium_incubator_spark.cdc.incremental_snapshot import (
        blocking_snapshot_delivery,
        chunk_bounds,
        incremental_snapshot,
    )
    from debezium_incubator_spark.cdc.notifications import (
        AGGREGATE_BLOCKING,
        AGGREGATE_INCREMENTAL,
        NotificationChannel,
    )

    ch = _changes(spark).cache()
    max_pos = ch.agg(F.max("pos")).first()[0]
    hs = [int(max_pos * f) for f in (0.5, 1.0)]
    watermarks = [(0, hs[0]), (hs[0], hs[1])]
    bounds = chunk_bounds(ch, "user_id", 2)

    def snapshot_at(pos):
        return materialize_latest(
            ch.filter(F.col("pos") <= pos), ["user_id"], ["pos"]
        ).select("user_id", "value")

    chan = NotificationChannel()
    incremental_snapshot(
        snapshot_at, ch, key="user_id", pos_col="pos",
        bounds=bounds, watermarks=watermarks, channel=chan,
    ).count()
    blocking_snapshot_delivery(
        ch, "user_id", "pos", int(max_pos * 0.6), int(max_pos * 0.8),
        channel=chan,
    ).count()

    ndf = chan.to_df(spark).toPandas()
    assert list(ndf["id"]) == [f"n-{i}" for i in range(len(ndf))]
    inc = ndf[ndf["aggregate_type"] == AGGREGATE_INCREMENTAL]
    assert list(inc["type"]) == [
        "STARTED", "TABLE_SCAN_COMPLETED", "TABLE_SCAN_COMPLETED",
        "COMPLETED",
    ]
    scans = inc[inc["type"] == "TABLE_SCAN_COMPLETED"]
    assert [int(d["chunk"]) for d in scans["additional_data"]] == [0, 1]
    assert [int(d["high_watermark"]) for d in scans["additional_data"]] == hs
    assert int(inc.iloc[-1]["timestamp"]) == hs[-1]
    blk = ndf[ndf["aggregate_type"] == AGGREGATE_BLOCKING]
    assert list(blk["type"]) == ["STARTED", "COMPLETED"]
    done = blk[blk["type"] == "COMPLETED"].iloc[0]
    assert done["additional_data"]["overlap_from"] == str(int(max_pos * 0.6))
    assert done["additional_data"]["overlap_to"] == str(int(max_pos * 0.8))
    ch.unpersist()


def test_snapshot_isolation_modes_fold_identically(spark):
    """snapshot.isolation.mode: frozen-image modes read every chunk at
    ONE position, read-committed reads each chunk at its own — the
    chunk IMAGES genuinely differ between the two plans, yet both fold
    (with the stream) to the same latest state, because watermark
    reconciliation absorbs exactly the cross-chunk drift the cheaper
    isolation admits."""
    import pytest
    from pyspark.sql import functions as F

    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.cdc.envelope import OP_CASE
    from debezium_incubator_spark.cdc.incremental_snapshot import (
        chunk_bounds,
        incremental_snapshot,
        snapshot_isolation_positions,
    )
    from debezium_incubator_spark.cdc.materialize import materialize_latest

    from .conftest import SF_SMOKE

    ch = table(spark, SF_SMOKE, "events").select(
        "user_id", F.col("event_id").alias("pos"), "value",
        F.expr(OP_CASE).alias("__op"),
    ).cache()
    max_pos = ch.agg(F.max("pos")).first()[0]
    bounds = chunk_bounds(ch, "user_id", 4)
    n = len(bounds)
    per_chunk = [int(max_pos * (i + 1) / n) for i in range(n)]

    frozen = snapshot_isolation_positions("repeatable_read", per_chunk)
    relaxed = snapshot_isolation_positions("read_committed", per_chunk)
    assert frozen == [per_chunk[0]] * n and relaxed == per_chunk

    def snapshot_at(pos):
        return materialize_latest(
            ch.filter(F.col("pos") <= pos), ["user_id"], ["pos"]
        ).select("user_id", "value")

    def run(positions):
        wm = [(max(h - 5, 0), h) for h in positions]
        snap = incremental_snapshot(
            lambda pos: snapshot_at(pos), ch, key="user_id",
            pos_col="pos", bounds=bounds, watermarks=wm,
        )
        folded = materialize_latest(
            snap.select("user_id", "pos", "value", "__op").unionByName(
                ch.select("user_id", "pos", "value", "__op")
            ),
            ["user_id"], ["pos"],
        )
        return snap, {r.user_id: r.value for r in folded.collect()}

    snap_f, state_f = run(frozen)
    snap_r, state_r = run(relaxed)

    # the images differ (read-committed chunks see later writes) ...
    img_f = {(r.user_id, r.value) for r in snap_f.collect()}
    img_r = {(r.user_id, r.value) for r in snap_r.collect()}
    assert img_f != img_r
    # ... but both fold to the same (correct) latest state
    want = {
        r.user_id: r.value
        for r in materialize_latest(ch, ["user_id"], ["pos"]).collect()
    }
    assert state_f == want and state_r == want

    with pytest.raises(ValueError, match="isolation"):
        snapshot_isolation_positions("serializable", per_chunk)
    ch.unpersist()
