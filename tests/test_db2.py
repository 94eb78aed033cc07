"""Db2 ASN capture-table path: staging-row mapping, fixed-width hex
sequence ordering, and the failure mode unpadded hex would cause."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_incubator_spark.cdc.db2 import db2_capture_envelope, seq_hex
from debezium_incubator_spark.cdc.materialize import materialize_latest


def _capture(spark, rows):
    return spark.createDataFrame(
        rows,
        "k LONG, v DOUBLE, IBMSNAP_OPERATION STRING, "
        "IBMSNAP_COMMITSEQ STRING, IBMSNAP_INTENTSEQ STRING",
    )


def test_capture_mapping_and_fold(spark):
    """I/U/D map to c/u/d; the (commitseq, intentseq) hex vector folds
    in commit order, intentseq breaking ties within one commit."""
    h = lambda n: f"{n:016X}"  # noqa: E731
    ch = db2_capture_envelope(_capture(spark, [
        (1, 1.0, "I", h(10), h(0)),
        (1, 2.0, "U", h(20), h(0)),
        (1, 3.0, "U", h(20), h(1)),   # same commit, later intent wins
        (2, 5.0, "I", h(10), h(0)),
        (2, 0.0, "D", h(30), h(0)),   # delete drops the key
    ]))
    assert set(ch.columns) == {"k", "v", "__op", "__commitseq",
                               "__intentseq"}
    state = materialize_latest(ch, ["k"], ["__commitseq", "__intentseq"])
    assert {(r.k, r.v) for r in state.collect()} == {(1, 3.0)}


def test_fixed_width_hex_is_the_correctness_condition(spark):
    """The lexicographic==numeric property REQUIRES fixed width: with
    unpadded hex, commit 10 (0x'A') sorts AFTER commit 144 (0x'90') and
    the fold resurrects the older row — the exact corruption the padded
    seq_hex renderer exists to prevent."""
    df = spark.range(1).select(
        seq_hex(F.lit(10)).alias("a"), seq_hex(F.lit(144)).alias("b"),
    ).first()
    assert df.a < df.b  # padded: numeric order preserved
    assert "A" > "90"   # unpadded hex: inverted — the bug

    ch = db2_capture_envelope(_capture(spark, [
        (1, 1.0, "I", "A", "0"),     # commit 10, UNPADDED
        (1, 2.0, "U", "90", "0"),    # commit 144, UNPADDED
    ]))
    bad = materialize_latest(ch, ["k"], ["__commitseq", "__intentseq"])
    assert bad.first().v == 1.0  # the OLD row wins — corruption shown


def test_unknown_operation_code_raises(spark):
    ch = db2_capture_envelope(_capture(spark, [(1, 1.0, "X", "0", "0")]))
    with pytest.raises(Exception, match="IBMSNAP_OPERATION"):
        ch.collect()


def test_prune_point_is_min_subscriber_and_width_checked():
    from debezium_incubator_spark.cdc.db2 import prune_point
    import pytest

    assert prune_point(["00A0", "0090", "00FF"]) == "0090"
    with pytest.raises(ValueError, match="no subscribers"):
        prune_point([])
    with pytest.raises(ValueError, match="mixed-width"):
        prune_point(["A0", "0090"])  # 'A0' > '0090' lexicographically!


def test_pruning_preserves_every_fold(spark):
    """state(synchpoint) ⊕ fold(retained rows) == fold(unpruned table):
    the invariant that makes CD pruning safe for all consumers. The
    synchpoint splits mid-log, with deletes on BOTH sides of it."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.cdc.db2 import (
        prune_capture_table, seq_hex)
    from debezium_incubator_spark.cdc.materialize import materialize_latest

    rows = [
        (1, 1.0, "c", 1), (1, 2.0, "u", 3), (2, 5.0, "c", 2),
        (2, 0.0, "d", 4),                      # delete BELOW synchpoint
        (3, 7.0, "c", 5),
        (1, 0.0, "d", 7),                      # delete ABOVE synchpoint
        (3, 8.0, "u", 8), (4, 9.0, "c", 9),
    ]
    cd = spark.createDataFrame(
        rows, "k LONG, v DOUBLE, __op STRING, pos LONG"
    ).withColumn("__commitseq", seq_hex(F.col("pos"))).drop("pos")

    full = {(r.k, r.v) for r in
            materialize_latest(cd, ["k"], ["__commitseq"]).collect()}

    sp = seq_hex(F.lit(5))
    sp_str = cd.select(sp.alias("s")).first().s
    below = cd.filter(F.col("__commitseq") <= sp_str)
    state = materialize_latest(below, ["k"], ["__commitseq"])
    retained = prune_capture_table(cd, sp_str)
    # replay: state as op='u' rows positioned AT the synchpoint (their
    # true positions are <= it), then the retained tail on top
    replay = state.select(
        "k", "v", F.lit("u").alias("__op"), F.lit(sp_str).alias("__commitseq")
    ).unionByName(retained)
    got = {(r.k, r.v) for r in
           materialize_latest(replay, ["k"], ["__commitseq"]).collect()}
    # k=1 and k=2 end deleted; k=3 updated above the synchpoint; k=4 new
    assert full == {(3, 8.0), (4, 9.0)}
    assert got == full


def test_uow_join_withholds_inflight_and_orders_by_commit(spark):
    """A CD row whose UOWID has no UOW row is withheld (in-flight /
    rolled back — Capture never records it); and the UOW table's
    commit position, not the CD intent position, decides the fold."""
    from debezium_incubator_spark.cdc.db2 import db2_uow_join, seq_hex
    from pyspark.sql import functions as F

    cd = spark.createDataFrame(
        [
            (1, 10.0, "u", 1, 100),   # uow 1: commits LATE (pos 500)
            (1, 20.0, "u", 2, 200),   # uow 2: commits at 250
            (2, 30.0, "u", 3, 300),   # uow 3: never commits
        ],
        "k LONG, v DOUBLE, __op STRING, IBMSNAP_UOWID LONG, intent LONG",
    ).withColumn("IBMSNAP_INTENTSEQ", seq_hex(F.col("intent"))).drop("intent")
    uow = spark.createDataFrame(
        [(1, 500), (2, 250)], "IBMSNAP_UOWID LONG, cpos LONG"
    ).withColumn("IBMSNAP_COMMITSEQ", seq_hex(F.col("cpos"))).drop("cpos")

    joined = db2_uow_join(cd, uow)
    rows = joined.collect()
    assert {r["k"] for r in rows} == {1}          # uow 3 withheld
    from debezium_incubator_spark.cdc.materialize import materialize_latest

    state = materialize_latest(
        joined.withColumnRenamed("IBMSNAP_INTENTSEQ", "__intentseq"),
        ["k"], ["__commitseq", "__intentseq"],
    ).collect()
    # uow 1 committed LAST (500 > 250) — its value wins despite the
    # earlier intent position
    assert [(r["k"], r["v"]) for r in state] == [(1, 10.0)]
