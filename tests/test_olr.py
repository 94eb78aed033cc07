"""OpenLogReplicator adapter: sub-SCN idx tie semantics on a crafted
fixture (two changes to one key inside one SCN — idx is the ONLY
separator), in-flight withholding, and the confirm protocol's
exactly-once effect (any poll/confirm/crash schedule accumulates the
one-shot stream). The registered `cdc_olr_fold` differential is
covered by the oracle sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.cdc.olr import (
    merge_olr_confirmed,
    olr_deliver,
    olr_stream,
)

REDO_SCHEMA = (
    "user_id LONG, rec LONG, scn LONG, value DOUBLE, op STRING, xid LONG"
)


def _fixture(spark):
    redo = spark.createDataFrame(
        [
            # SCN 10 carries TWO changes to user 1 (redo order: rec 1
            # then rec 2) — (commit_scn, scn) alone cannot order them
            (1, 1, 10, 100.0, "c", 1),
            (1, 2, 10, 200.0, "u", 1),
            (2, 3, 11, 50.0, "c", 1),
            # xid 2 commits later but its scn interleaves
            (2, 4, 11, 75.0, "u", 2),
            # xid 3 never commits: must never be delivered
            (1, 5, 12, 999.0, "u", 3),
        ],
        REDO_SCHEMA,
    )
    commits = spark.createDataFrame(
        [(1, 20), (2, 30)], "xid LONG, commit_scn LONG"
    )
    return redo, commits


def test_idx_breaks_same_scn_ties_and_withholds_inflight(spark):
    redo, commits = _fixture(spark)
    stream = olr_stream(redo, commits)
    rows = {(r["user_id"], r["rec"]): r for r in stream.collect()}
    # in-flight xid 3 never delivered
    assert (1, 5) not in rows and len(rows) == 4
    # same-SCN changes separated by idx in redo order
    assert rows[(1, 1)]["idx"] == 1 and rows[(1, 2)]["idx"] == 2
    # position strings sort as (scn, idx) numerically
    ordered = [
        k for k, _ in sorted(rows.items(), key=lambda kv: kv[1]["position"])
    ]
    assert ordered == [(1, 1), (1, 2), (2, 3), (2, 4)]
    # the fold must pick rec 2 (idx 2) for user 1, not rec 1
    from debezium_incubator_spark.cdc.materialize import materialize_latest

    state = {
        r["user_id"]: r["value"]
        for r in materialize_latest(
            stream, ["user_id"], ["__commit_scn", "scn", "idx"],
            op_col="op",
        ).collect()
    }
    assert state == {1: 200.0, 2: 75.0}


def test_confirm_protocol_any_schedule_equals_one_shot(spark):
    redo, commits = _fixture(spark)
    stream = olr_stream(redo, commits).cache()
    one_shot = sorted(r["position"] for r in stream.collect())

    # schedule: poll 1 (first two events) confirmed; poll 2 delivered
    # but the client CRASHES before confirming; poll 3 = the resend
    # (overlaps poll 2 entirely) plus the tail
    positions = one_shot
    p1 = stream.where(F.col("position") <= positions[1])
    p2 = stream.where(
        (F.col("position") > positions[1])
        & (F.col("position") <= positions[2])
    )
    p3 = stream  # full resend from the last CONFIRMED position

    acc, conf = merge_olr_confirmed(None, p1, None)
    acc, conf_after_crash = merge_olr_confirmed(acc, p2, conf, confirm=False)
    assert conf_after_crash == conf  # crash-before-ack: watermark holds
    acc, conf = merge_olr_confirmed(acc, p3, conf)
    assert sorted(r["position"] for r in acc.collect()) == one_shot
    assert conf == positions[-1]
    # a pure replay after full confirmation is a no-op
    acc2, conf2 = merge_olr_confirmed(acc, p3, conf)
    assert acc2.count() == len(one_shot) and conf2 == conf


def test_deliver_filters_strictly_above_confirmed(spark):
    redo, commits = _fixture(spark)
    stream = olr_stream(redo, commits)
    all_pos = sorted(r["position"] for r in stream.collect())
    resent = olr_deliver(stream, all_pos[1])
    assert sorted(r["position"] for r in resent.collect()) == all_pos[2:]
