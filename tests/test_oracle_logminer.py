"""Oracle LogMiner visibility semantics: commit-order delivery genuinely
differs from SCN order, in-flight transactions are withheld, and the
commit join broadcasts."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.cdc.materialize import materialize_latest
from debezium_incubator_spark.cdc.oracle_logminer import (
    logminer_commit_ordered,
)


def _redo(spark, rows):
    return spark.createDataFrame(
        rows, "k LONG, scn LONG, v DOUBLE, __op STRING, xid LONG"
    )


def _commits(spark, rows):
    return spark.createDataFrame(rows, "xid LONG, commit_scn LONG")


def test_commit_order_beats_scn_order_and_withholds_inflight(spark):
    """Txn 1 writes k=1 EARLY (scn 10) but commits LATE (200); txn 2
    writes k=1 later (scn 50) and commits at 60. Commit-order fold must
    pick txn 1's value (it committed last) — a plain scn fold picks
    txn 2's. Txn 3 never commits: its delete must not apply."""
    redo = _redo(spark, [
        (1, 10, 111.0, "u", 1),   # early write, late commit
        (1, 50, 222.0, "u", 2),   # later write, early commit
        (1, 55, 0.0, "d", 3),     # in-flight delete — withheld
    ])
    commits = _commits(spark, [(1, 200), (2, 60)])
    visible = logminer_commit_ordered(redo, commits)
    assert visible.count() == 2  # txn 3 withheld

    got = materialize_latest(visible, ["k"], ["__commit_scn", "scn"])
    assert got.first().v == 111.0  # commit order wins

    naive = materialize_latest(redo.filter(F.col("xid") != 3),
                               ["k"], ["scn"])
    assert naive.first().v == 222.0  # scn order would be WRONG


def test_within_transaction_scn_order_holds(spark):
    """Two changes to one key inside ONE transaction: the later SCN
    wins (the composite position's second component)."""
    redo = _redo(spark, [
        (1, 10, 1.0, "u", 7),
        (1, 11, 2.0, "u", 7),
    ])
    got = materialize_latest(
        logminer_commit_ordered(redo, _commits(spark, [(7, 20)])),
        ["k"], ["__commit_scn", "scn"],
    )
    assert got.first().v == 2.0


def test_commit_join_broadcasts(spark):
    redo = _redo(spark, [(1, 10, 1.0, "u", 1)])
    plan = logminer_commit_ordered(
        redo, _commits(spark, [(1, 20)])
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
