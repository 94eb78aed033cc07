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
