"""SQL Server CT path: op-3/op-4 update-pair reassembly, torn-group
detection, unwrap→fold composition, and the property that pairing is
batching-invariant (a pure per-position aggregation)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_incubator_spark.cdc.materialize import materialize_latest
from debezium_incubator_spark.cdc.sqlserver import (
    pair_update_rows,
    unwrap_paired,
)

_SCHEMA = ("k LONG, v DOUBLE, `__$start_lsn` STRING, `__$seqval` STRING, "
           "`__$operation` INT")


def _ct(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _h(n: int) -> str:
    return f"{n:016X}"


def test_pairing_builds_single_envelopes(spark):
    """Insert → after only; delete → before only; the 3/4 pair merges
    into ONE row carrying both images."""
    paired = pair_update_rows(_ct(spark, [
        (1, 1.0, _h(10), _h(0), 2),
        (1, 0.5, _h(20), _h(0), 3),   # before-image of the update
        (1, 2.0, _h(20), _h(0), 4),   # after-image, same position
        (2, 9.0, _h(30), _h(0), 1),
    ]))
    rows = {r.start_lsn: r for r in paired.collect()}
    assert len(rows) == 3  # the update pair collapsed to one envelope
    ins, upd, dele = rows[_h(10)], rows[_h(20)], rows[_h(30)]
    assert (ins["__op"], ins.before, ins.after.v) == ("c", None, 1.0)
    assert (upd["__op"], upd.before.v, upd.after.v) == ("u", 0.5, 2.0)
    assert (dele["__op"], dele.before.v, dele.after) == ("d", 9.0, None)


@pytest.mark.parametrize("ops", [
    [3],          # torn pair: before without after
    [4],          # torn pair: after without before
    [1, 2],       # delete colliding with insert at one position
    [2, 3, 4],    # update pair colliding with an insert
    [2, 2],       # duplicated insert — set-collapse must not hide it
    [3, 3, 4],    # duplicated before-image inside a 'legal-looking' pair
])
def test_torn_or_colliding_groups_raise(spark, ops):
    rows = [(1, float(i), _h(7), _h(0), op) for i, op in enumerate(ops)]
    with pytest.raises(Exception, match="unpairable"):
        pair_update_rows(_ct(spark, rows)).collect()


def test_unwrap_fold_takes_after_image(spark):
    """Through unwrap + materialize_latest the AFTER image must win; a
    before/after mix-up would surface 0.5 here. Deletes drop the key."""
    st_ = materialize_latest(
        unwrap_paired(pair_update_rows(_ct(spark, [
            (1, 1.0, _h(10), _h(0), 2),
            (1, 0.5, _h(20), _h(0), 3),
            (1, 2.0, _h(20), _h(0), 4),
            (2, 9.0, _h(10), _h(1), 2),
            (2, 9.0, _h(30), _h(0), 1),
        ]))),
        ["k"], ["__start_lsn", "__seqval"],
    )
    assert {(r.k, r.v) for r in st_.collect()} == {(1, 2.0)}


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5)),  # (kind, key)
    min_size=1, max_size=12,
))
def test_pairing_matches_sequential_reader(spark, seq):
    """Differential vs the obvious sequential reader: for ANY mix of
    inserts/deletes/update-pairs at distinct positions, the distributed
    pairing emits exactly the envelopes a row-by-row scan would."""
    rows, expect = [], {}
    for pos, (kind, key) in enumerate(seq):
        lsn, sq = _h(pos), _h(0)
        if kind == 0:
            rows.append((key, float(pos), lsn, sq, 2))
            expect[(lsn, sq)] = ("c", None, float(pos))
        elif kind == 1:
            rows.append((key, float(pos), lsn, sq, 1))
            expect[(lsn, sq)] = ("d", float(pos), None)
        else:
            rows.append((key, float(pos) - 0.5, lsn, sq, 3))
            rows.append((key, float(pos), lsn, sq, 4))
            expect[(lsn, sq)] = ("u", float(pos) - 0.5, float(pos))
    got = {
        (r.start_lsn, r.seqval): (
            r.__getitem__("__op"),
            r.before.v if r.before else None,
            r.after.v if r.after else None,
        )
        for r in pair_update_rows(_ct(spark, rows)).collect()
    }
    assert got == expect


def test_buffer_withholds_torn_pair_until_partner_arrives(spark):
    """op-3 alone in poll 1 is withheld, not emitted and not an error;
    poll 2 delivers the op-4 partner and the pair emits whole."""
    from debezium_incubator_spark.cdc.sqlserver import (
        merge_sqlserver_buffer,
    )

    b1 = _ct(spark, [
        (1, 1.0, _h(10), _h(0), 2),
        (1, 0.5, _h(20), _h(0), 3),     # partner arrives next poll
    ])
    buf, em1 = merge_sqlserver_buffer(None, b1)
    assert [r["__op"] for r in em1.collect()] == ["c"]
    assert buf.count() == 1             # the lone before-image waits
    b2 = _ct(spark, [(1, 2.0, _h(20), _h(0), 4)])
    buf2, em2 = merge_sqlserver_buffer(buf, b2)
    got = em2.first()
    assert (got["__op"], got.before.v, got.after.v) == ("u", 0.5, 2.0)
    assert buf2.count() == 0


def test_buffer_still_raises_on_true_corruption(spark):
    from debezium_incubator_spark.cdc.sqlserver import (
        merge_sqlserver_buffer,
    )

    b = _ct(spark, [
        (1, 1.0, _h(5), _h(0), 1),
        (1, 2.0, _h(5), _h(0), 2),      # delete + insert at one position
    ])
    _, em = merge_sqlserver_buffer(None, b)
    with pytest.raises(Exception, match="unpairable"):
        em.collect()


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 4)),
             min_size=1, max_size=10),
    st.data(),
)
def test_buffered_pairing_equals_one_shot_under_any_batching(
    spark, seq, data
):
    """ANY cut of the CT row stream into polls — including cuts through
    the middle of an update pair — emits, across all polls, exactly the
    one-shot pairing of the whole stream."""
    from debezium_incubator_spark.cdc.sqlserver import (
        merge_sqlserver_buffer,
    )

    rows = []
    for pos, (kind, key) in enumerate(seq):
        if kind == 0:
            rows.append((key, float(pos), _h(pos), _h(0), 2))
        elif kind == 1:
            rows.append((key, float(pos), _h(pos), _h(0), 1))
        else:
            rows.append((key, float(pos) - 0.5, _h(pos), _h(0), 3))
            rows.append((key, float(pos), _h(pos), _h(0), 4))
    cuts = sorted(data.draw(st.sets(
        st.integers(1, max(1, len(rows) - 1)), max_size=3
    )))
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        if c > prev:
            batches.append(rows[prev:c])
            prev = c
    one_shot = {
        (r.start_lsn, r.seqval, r["__op"])
        for r in pair_update_rows(_ct(spark, rows)).collect()
    }
    buf, emitted = None, set()
    for b in batches:
        buf, em = merge_sqlserver_buffer(buf, _ct(spark, b))
        emitted |= {
            (r.start_lsn, r.seqval, r["__op"]) for r in em.collect()
        }
        buf = spark.createDataFrame(buf.collect(), buf.schema)  # cut lineage
    assert emitted == one_shot
    assert buf.count() == 0  # every pair eventually completed


def test_pairing_is_one_shuffle_no_join(spark):
    """Plan audit: the pairing is a hash aggregation with a partial
    (map-side) phase and NO join — the naive op3-join-op4 spelling
    would show a Join node and a second Exchange."""
    plan = pair_update_rows(_ct(spark, [
        (1, 1.0, _h(10), _h(0), 2),
    ]))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_sqlserver_e2e_ddl_pairing_fold_and_widening(spark):
    """The connector path composed end-to-end: T-SQL DDL replay types
    the table; CT rows conforming to schema v1 pair and fold; a
    mid-stream ALTER adds a column; the v2 batch merges with
    allowMissingColumns — old keys surface NULL for the new column,
    the re-paired update carries it."""
    from pyspark.sql import types as T

    from debezium_incubator_spark.cdc.materialize import (
        materialize_latest,
    )
    from debezium_incubator_spark.cdc.schema_history import (
        replay_history,
    )

    reg = replay_history(
        ["CREATE TABLE [dbo].[users] (id BIGINT NOT NULL, v FLOAT)"],
        dialect="sqlserver",
    )
    s1 = reg.latest("users")
    assert [f.dataType for f in s1.fields] == [T.LongType(), T.DoubleType()]

    ct1 = spark.createDataFrame(
        [(1, 1.0, _h(10), _h(0), 2),
         (2, 5.0, _h(11), _h(0), 2),
         (1, 1.0, _h(20), _h(0), 3),
         (1, 2.0, _h(20), _h(0), 4)],
        "id LONG, v DOUBLE, `__$start_lsn` STRING, `__$seqval` STRING, "
        "`__$operation` INT",
    )
    env1 = unwrap_paired(pair_update_rows(ct1))

    reg = replay_history(
        ["ALTER TABLE [dbo].[users] ADD note NVARCHAR(50)"],
        registry=reg, dialect="sqlserver",
    )
    assert reg.latest("users").fieldNames() == ["id", "v", "note"]

    ct2 = spark.createDataFrame(
        [(2, 6.0, "hi", _h(30), _h(0), 3),
         (2, 7.0, "hi", _h(30), _h(0), 4)],
        "id LONG, v DOUBLE, note STRING, `__$start_lsn` STRING, "
        "`__$seqval` STRING, `__$operation` INT",
    )
    env2 = unwrap_paired(pair_update_rows(ct2))

    merged = env1.unionByName(env2, allowMissingColumns=True)
    state = materialize_latest(
        merged, ["id"], ["__start_lsn", "__seqval"]
    )
    got = {(r.id): (r.v, r.note) for r in state.collect()}
    assert got == {1: (2.0, None), 2: (7.0, "hi")}


def test_buffer_streaming_e2e_with_persisted_state(spark, tmp_path):
    """The pairing buffer in the real streaming harness: CT polls
    arrive as files (maxFilesPerTrigger=1 — one poll per micro-batch,
    an update pair deliberately torn across two polls), the buffer is
    persisted to parquet between batches, and the emitted envelopes
    across the run equal the one-shot pairing of all rows."""
    import os

    from debezium_incubator_spark.cdc.sqlserver import (
        merge_sqlserver_buffer,
    )

    src = str(tmp_path / "polls")
    buf_dir = str(tmp_path / "buffer")
    out_dir = str(tmp_path / "emitted")
    os.makedirs(src)
    polls = [
        [(1, 1.0, _h(10), _h(0), 2),
         (1, 0.5, _h(20), _h(0), 3)],      # torn: op-4 in next poll
        [(1, 2.0, _h(20), _h(0), 4),
         (2, 9.0, _h(30), _h(0), 2)],
        [(2, 9.0, _h(40), _h(0), 1)],
    ]
    for i, rows in enumerate(polls):
        _ct(spark, rows).coalesce(1).write.parquet(f"{src}/poll={i}")

    schema = _ct(spark, polls[0]).schema

    def step(batch_df, batch_id):
        import shutil

        buf = (
            spark.read.parquet(buf_dir)
            if os.path.isdir(buf_dir) else None
        )
        new_buf, emitted = merge_sqlserver_buffer(buf, batch_df)
        emitted.write.mode("append").parquet(out_dir)
        # stage-then-swap: the new buffer's lineage READS buf_dir, so
        # writing to the staged dir materializes it before the replace
        staged = buf_dir + ".next"
        new_buf.write.mode("overwrite").parquet(staged)
        if os.path.isdir(buf_dir):
            shutil.rmtree(buf_dir)
        os.replace(staged, buf_dir)

    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )

    got = {
        (r.start_lsn, r["__op"])
        for r in spark.read.parquet(out_dir).collect()
    }
    one_shot = {
        (r.start_lsn, r["__op"])
        for r in pair_update_rows(
            _ct(spark, [r for p in polls for r in p])
        ).collect()
    }
    assert got == one_shot
    assert spark.read.parquet(buf_dir).count() == 0


# --- multiple capture instances (online schema evolution) -----------------


def test_capture_instance_merge_dedups_overlap_and_widens(spark):
    """The overlap window captured by BOTH instances appears exactly
    once in the merge (from the NEW instance, new column populated);
    pre-switch rows surface NULL for the new column."""
    from debezium_incubator_spark.cdc.sqlserver import (
        merge_capture_instances,
    )

    old = _ct(spark, [
        (1, 1.0, _h(10), _h(0), 2),
        (2, 2.0, _h(20), _h(0), 2),   # overlap: also in `new`
        (2, 2.5, _h(30), _h(0), 3),   # past-switch update pair the old
        (2, 3.5, _h(30), _h(0), 4),   # instance kept capturing — cut
    ])
    new = spark.createDataFrame(
        [
            (2, 2.0, "fresh", _h(20), _h(0), 2),
            (2, 2.5, "fresh", _h(30), _h(0), 3),
            (2, 3.5, "fresh", _h(30), _h(0), 4),
        ],
        "k LONG, v DOUBLE, tag STRING, `__$start_lsn` STRING, "
        "`__$seqval` STRING, `__$operation` INT",
    )
    merged = merge_capture_instances([(old, _h(0)), (new, _h(20))])
    env = {(r["start_lsn"], r["__op"]): r
           for r in pair_update_rows(merged).collect()}
    assert set(env) == {(_h(10), "c"), (_h(20), "c"), (_h(30), "u")}
    assert env[(_h(10), "c")]["after"]["tag"] is None   # old instance
    assert env[(_h(20), "c")]["after"]["tag"] == "fresh"  # from new
    assert env[(_h(30), "u")]["before"]["v"] == 2.5     # pair intact


def test_capture_instance_merge_validation(spark):
    from debezium_incubator_spark.cdc.sqlserver import (
        merge_capture_instances,
    )

    df = _ct(spark, [(1, 1.0, _h(1), _h(0), 2)])
    with pytest.raises(ValueError, match="no instances"):
        merge_capture_instances([])
    with pytest.raises(ValueError, match="strictly increasing"):
        merge_capture_instances([(df, _h(5)), (df, _h(5))])
    with pytest.raises(ValueError, match="mixed-width"):
        merge_capture_instances([(df, "00"), (df, _h(5))])


def test_capture_migration_fold_matches_single_instance(spark):
    """Folding the MERGED two-instance stream to latest state must
    equal folding a single full-history instance — the migration is
    invisible to the downstream fold except for the widened column."""
    from debezium_incubator_spark.cdc.sqlserver import (
        _ct_fixture,
        merge_capture_instances,
        seq_hex,
    )
    from debezium_incubator_spark.cdc.sqlserver import (
        MIGRATION_OLD_END,
        MIGRATION_SWITCH,
    )

    from .conftest import SF_SMOKE

    old = _ct_fixture(spark, SF_SMOKE).filter(
        F.col("__$start_lsn") < seq_hex(F.lit(MIGRATION_OLD_END))
    )
    new = _ct_fixture(spark, SF_SMOKE, extra=("event_type",)).filter(
        F.col("__$start_lsn") >= seq_hex(F.lit(MIGRATION_SWITCH))
    )
    merged = merge_capture_instances(
        [(old, _h(0)), (new, _h(MIGRATION_SWITCH))]
    )
    folded = materialize_latest(
        unwrap_paired(pair_update_rows(merged)),
        ["user_id"], ["__start_lsn", "__seqval"],
    ).select("user_id", "value").orderBy("user_id").collect()
    single = materialize_latest(
        unwrap_paired(pair_update_rows(
            _ct_fixture(spark, SF_SMOKE, extra=("event_type",))
        )),
        ["user_id"], ["__start_lsn", "__seqval"],
    ).select("user_id", "value").orderBy("user_id").collect()
    assert folded == single


@settings(max_examples=10, deadline=None)
@given(
    switch=st.integers(min_value=1, max_value=9),
    overlap=st.integers(min_value=0, max_value=5),
)
def test_capture_instance_merge_invariant_under_any_switch(
    spark, switch, overlap
):
    """ANY switch LSN and ANY overlap width: the two-instance merge is
    row-identical to the single full-history change table (modulo the
    widened column) — overlap never duplicates, the cut never loses."""
    from debezium_incubator_spark.cdc.sqlserver import (
        merge_capture_instances,
    )

    full_rows = []
    for n in range(10):
        if n % 3 == 0:
            full_rows.append((n, float(n), _h(n), _h(0), 2))
        else:
            full_rows.append((n, float(n) - 1, _h(n), _h(0), 3))
            full_rows.append((n, float(n), _h(n), _h(0), 4))
    full = _ct(spark, full_rows)
    old_end = min(switch + overlap, 10)
    old = _ct(spark, [r for r in full_rows if int(r[2], 16) < old_end])
    new = _ct(spark, [r for r in full_rows if int(r[2], 16) >= switch])
    merged = merge_capture_instances([(old, _h(0)), (new, _h(switch))])
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want
