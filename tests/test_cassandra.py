"""Cassandra connector semantics: cell-level LWW, partition tombstones
that shadow by TIMESTAMP (not arrival order), TTL expiry, and the
sparse-write property that distinguishes cell folds from row folds."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.cdc.cassandra import fold_cassandra_cells


def _changes(spark, rows):
    """rows: (key, op, ts, {col: (v, ts, ttl)})"""
    data = [
        (k, op, ts,
         {c: (v, cts, ttl) for c, (v, cts, ttl) in cells.items()})
        for k, op, ts, cells in rows
    ]
    return spark.createDataFrame(
        data,
        "user_id LONG, op STRING, ts LONG, "
        "cells MAP<STRING, STRUCT<v DOUBLE, ts LONG, ttl LONG>>",
    )


def _state(df):
    return {(r.user_id, r.column): r.v for r in df.collect()}


def test_sparse_write_does_not_null_untouched_columns(spark):
    """THE cell-semantics property: a later event touching only column
    'b' must leave 'a' at its older value — a row-LWW fold of these
    partial images would null 'a' out."""
    ch = _changes(spark, [
        (1, "w", 10, {"a": (1.0, 10, None), "b": (2.0, 10, None)}),
        (1, "w", 20, {"b": (9.0, 20, None)}),  # partial update
    ])
    assert _state(fold_cassandra_cells(ch, ["user_id"])) == {
        (1, "a"): 1.0, (1, "b"): 9.0,
    }


def test_tombstone_shadows_by_timestamp_not_arrival(spark):
    """A partition delete at D hides cells stamped <= D even when the
    cell event ARRIVES after the delete (out-of-order delivery), while
    a write stamped after D survives — row order in the input must not
    change the result."""
    rows = [
        (1, "w", 10, {"a": (1.0, 10, None)}),
        (1, "d", 15, {}),
        (1, "w", 12, {"a": (7.0, 12, None)}),   # late arrival, ts <= D
        (1, "w", 20, {"a": (3.0, 20, None)}),   # resurrects the column
        (2, "w", 10, {"a": (5.0, 10, None)}),
        (2, "d", 30, {}),                        # shadows everything
    ]
    for perm in (rows, rows[::-1]):
        got = _state(fold_cassandra_cells(_changes(spark, perm),
                                          ["user_id"]))
        assert got == {(1, "a"): 3.0}  # key 2 fully shadowed


def test_ttl_expiry_against_read_position(spark):
    """A TTL'd cell is visible while ts + ttl > as_of and gone after —
    same events, different read positions, different state."""
    ch = _changes(spark, [
        (1, "w", 10, {"a": (1.0, 10, 50)}),     # expires at 60
        (1, "w", 10, {"b": (2.0, 10, None)}),   # durable
    ])
    early = _state(fold_cassandra_cells(ch, ["user_id"], as_of=59))
    late = _state(fold_cassandra_cells(ch, ["user_id"], as_of=60))
    assert early == {(1, "a"): 1.0, (1, "b"): 2.0}
    assert late == {(1, "b"): 2.0}


def test_identical_writetime_ties_break_by_value(spark):
    """Cassandra's documented tie rule for equal writetimes: the higher
    cell value wins (deterministic convergence across replicas)."""
    ch = _changes(spark, [
        (1, "w", 10, {"a": (3.0, 10, None)}),
        (1, "w", 10, {"a": (8.0, 10, None)}),
    ])
    assert _state(fold_cassandra_cells(ch, ["user_id"])) == {(1, "a"): 8.0}


def test_fold_plan_broadcasts_tombstones(spark):
    """The tombstone join must broadcast the delete side: deletes are a
    sliver of any real stream, and a shuffled join on the 100 TB cell
    side for them would dominate the fold."""
    ch = _changes(spark, [
        (1, "w", 10, {"a": (1.0, 10, None)}),
        (1, "d", 5, {}),
    ])
    plan = fold_cassandra_cells(
        ch, ["user_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_incremental_merge_equals_one_shot_fold(spark):
    """Sequential micro-batch merges over ANY batching — including a
    late cell arriving AFTER the tombstone that shadows it, in a later
    batch — equal the one-shot fold of the full stream. The tombstone
    watermark retained in state is what makes the late-arrival case
    hold (drop-after-apply would resurrect the cell)."""
    from debezium_incubator_spark.cdc.cassandra import (
        fold_cassandra_cells,
        merge_cassandra_cells,
        read_cassandra_state,
    )

    rows = [
        (1, "w", 10, {"a": (1.0, 10, None), "b": (4.0, 10, None)}),
        (2, "w", 12, {"a": (2.0, 12, 100)}),       # TTL'd
        (1, "d", 15, {}),                           # tombstone at 15
        (1, "w", 14, {"a": (9.9, 14, None)}),       # late, shadowed
        (1, "w", 20, {"b": (5.0, 20, None)}),       # resurrects b only
        (2, "w", 30, {"a": (3.0, 30, None)}),
        (3, "w", 40, {"c": (7.0, 40, 60)}),         # expires at 100
    ]
    full = _changes(spark, rows)
    as_of = 101  # key 3's TTL cell just expired; key 2's (ts12+100=112) alive

    want = _state(fold_cassandra_cells(full, ["user_id"], as_of=as_of))

    for cut1, cut2 in [(2, 4), (3, 5), (1, 6)]:
        cells, tombs = None, None
        for chunk in (rows[:cut1], rows[cut1:cut2], rows[cut2:]):
            if not chunk:
                continue
            cells, tombs = merge_cassandra_cells(
                cells, tombs, _changes(spark, chunk), ["user_id"]
            )
        got = _state(read_cassandra_state(cells, as_of, ["user_id"]))
        assert got == want, f"batching ({cut1},{cut2}) diverged"

    # and the state is compact: one row per surviving (key, column)
    assert cells.count() == cells.select("user_id", "column").distinct().count()


def test_range_tombstone_overlaps_and_resurrection(spark):
    """Overlapping range tombstones: the binding one per cell is the
    max-ts MATCHING range; a write stamped above it resurrects; cells
    outside every range are untouched; the range join broadcasts."""
    from debezium_incubator_spark.cdc.cassandra import (
        shadow_range_tombstones,
    )

    cells = spark.createDataFrame(
        [
            (1, 5, 1.0, 10),    # in both ranges; max del_ts 30 > 10 → gone
            (1, 5, 2.0, 31),    # same slot, written after → survives
            (1, 9, 3.0, 10),    # only in [8,12] (ts 20); 10 <= 20 → gone
            (1, 20, 4.0, 5),    # outside every range → survives
            (2, 5, 5.0, 10),    # other partition, no tombstones
        ],
        "pk LONG, ck LONG, v DOUBLE, cell_ts LONG",
    )
    tombs = spark.createDataFrame(
        [(1, 0, 6, 30), (1, 3, 12, 20)],
        "pk LONG, lo LONG, hi LONG, ts LONG",
    )
    live = shadow_range_tombstones(cells, tombs)
    got = {(r.pk, r.ck, r.v) for r in live.collect()}
    assert got == {(1, 5, 2.0), (1, 20, 4.0), (2, 5, 5.0)}
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_streaming_cell_merge_e2e_with_replay(spark, tmp_path):
    """The incremental merge under real streaming plumbing: cell events
    arrive as files, foreachBatch merges each micro-batch into
    parquet-persisted (cells, tombs) state; the final read equals the
    one-shot fold. Then a restart WITHOUT the checkpoint re-delivers
    every file — and because the merge is a max-fold, replay is
    idempotent: state is unchanged."""
    import json

    from pyspark.sql import functions as F

    from debezium_incubator_spark.cdc.cassandra import (
        fold_cassandra_cells,
        merge_cassandra_cells,
        read_cassandra_state,
    )

    rows = [
        (1, "w", 10, {"a": [1.0, 10, None]}),
        (1, "d", 15, {}),
        (1, "w", 20, {"a": [3.0, 20, None], "b": [4.0, 20, 50]}),
        (2, "w", 12, {"a": [5.0, 12, None]}),
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, (k, op, ts, cells) in enumerate(rows):
        with open(src / f"b{i}.json", "w") as fh:
            fh.write(json.dumps({
                "user_id": k, "op": op, "ts": ts,
                "cells": {c: {"v": x[0], "ts": x[1], "ttl": x[2]}
                          for c, x in cells.items()},
            }) + "\n")

    schema = ("user_id LONG, op STRING, ts LONG, "
              "cells MAP<STRING, STRUCT<v DOUBLE, ts LONG, ttl LONG>>")
    cells_dir, tombs_dir = str(tmp_path / "cells"), str(tmp_path / "tombs")

    def run(ckpt):
        import os

        def on_batch(batch_df, bid):
            cur_c = (spark.read.parquet(cells_dir)
                     if os.path.isdir(cells_dir) else None)
            cur_t = (spark.read.parquet(tombs_dir)
                     if os.path.isdir(tombs_dir) else None)
            nc, nt = merge_cassandra_cells(
                cur_c, cur_t, batch_df, ["user_id"]
            )
            # break lineage before overwriting the dirs being read
            nc_rows, nt_rows = nc.collect(), nt.collect()
            spark.createDataFrame(nc_rows, nc.schema).write.mode(
                "overwrite").parquet(cells_dir)
            spark.createDataFrame(nt_rows, nt.schema).write.mode(
                "overwrite").parquet(tombs_dir)

        q = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 2)
            .json(str(src))
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))
    as_of = 49  # b's TTL (20+50) still alive
    got = {
        (r.user_id, r.column, r.v)
        for r in read_cassandra_state(
            spark.read.parquet(cells_dir), as_of, ["user_id"]
        ).collect()
    }
    full = spark.createDataFrame(
        [(k, op, ts, {c: tuple(x) for c, x in cells.items()})
         for k, op, ts, cells in rows],
        schema,
    )
    want = {
        (r.user_id, r.column, r.v)
        for r in fold_cassandra_cells(
            full, ["user_id"], as_of=as_of
        ).collect()
    }
    assert got == want and (1, "a", 3.0) in got

    # restart without the checkpoint: every file re-delivered; the
    # max-fold merge makes replay a no-op
    run(str(tmp_path / "ckpt2"))
    again = {
        (r.user_id, r.column, r.v)
        for r in read_cassandra_state(
            spark.read.parquet(cells_dir), as_of, ["user_id"]
        ).collect()
    }
    assert again == got


# ---------------------------------------------------------------------------
# Non-frozen collections: element cells + overwrite tombstones
# ---------------------------------------------------------------------------

from debezium_incubator_spark.cdc.cassandra import (
    fold_cassandra_collection_cells,
)


def _elems(spark, rows):
    """(key, column, path, v, cell_ts)"""
    return spark.createDataFrame(
        rows, "k LONG, column STRING, path STRING, v DOUBLE, cell_ts LONG"
    )


def _ctombs(spark, rows):
    """(key, column, del_ts)"""
    return spark.createDataFrame(rows, "k LONG, column STRING, del_ts LONG")


def _coll_state(spark, cells, tombs):
    return {
        (r.k, r.path, r.v)
        for r in fold_cassandra_collection_cells(
            _elems(spark, cells), _ctombs(spark, tombs), ["k"]
        ).collect()
    }


def test_collection_overwrite_keeps_own_elements_sheds_older(spark):
    """SET m = {...} at ts=20 plants a tombstone at 19: elements written
    at ts<=19 vanish, the overwrite's own ts=20 cells survive — the
    documented write_ts-1 off-by-one."""
    got = _coll_state(
        spark,
        [
            (1, "m", "a", 1.0, 10),   # old element — shadowed
            (1, "m", "b", 2.0, 19),   # boundary: ts == del_ts — shadowed
            (1, "m", "c", 3.0, 20),   # the overwrite's own element
        ],
        [(1, "m", 19)],
    )
    assert got == {(1, "c", 3.0)}


def test_collection_element_tombstone_removes_only_its_path(spark):
    """DELETE m['a'] is a NULL cell: path 'a' disappears, 'b' stays;
    a LATER write to 'a' resurrects it."""
    got = _coll_state(
        spark,
        [
            (1, "m", "a", 1.0, 10),
            (1, "m", "b", 2.0, 10),
            (1, "m", "a", None, 15),   # element tombstone
        ],
        [],
    )
    assert got == {(1, "b", 2.0)}
    got2 = _coll_state(
        spark,
        [
            (1, "m", "a", 1.0, 10),
            (1, "m", "a", None, 15),
            (1, "m", "a", 9.0, 16),    # resurrect
        ],
        [],
    )
    assert got2 == {(1, "a", 9.0)}


def test_collection_equal_writetime_delete_beats_write(spark):
    """Cassandra's tie rule: at identical writetime a tombstone shadows
    the write (NULLS FIRST in the descending tie-break)."""
    got = _coll_state(
        spark,
        [
            (1, "m", "a", 5.0, 10),
            (1, "m", "a", None, 10),   # same ts — delete wins
        ],
        [],
    )
    assert got == set()


def test_collection_tombstone_shadows_late_arrivals(spark):
    """Delivery order is irrelevant: an element stamped below the
    collection tombstone stays shadowed no matter when it arrives
    (the fold is declarative over the whole batch)."""
    got = _coll_state(
        spark,
        [
            (1, "m", "z", 7.0, 5),    # stamped before the overwrite,
        ],                             # "arrives" after it in the frame
        [(1, "m", 19)],
    )
    assert got == set()


def test_static_cell_visible_on_every_row_of_partition(spark):
    """A static write carried by ONE row's mutation appears on ALL rows
    of the partition — including rows written before it — and a
    pk-scoped tombstone shadows rows AND statics below its timestamp."""
    from debezium_incubator_spark.cdc.cassandra import (
        attach_static_columns,
        fold_cassandra_cells,
    )
    from pyspark.sql import functions as F

    def changes(rows, schema):
        return spark.createDataFrame(rows, schema)

    rows_ch = changes(
        [(1, 10, "w", 100, {"v": (1.0, 100, None)}),
         (1, 11, "w", 101, {"v": (2.0, 101, None)}),
         (2, 20, "w", 102, {"v": (3.0, 102, None)}),
         (2, None, "d", 150, None),                 # pk-scoped tombstone
         (2, 21, "w", 160, {"v": (4.0, 160, None)})],  # post-tombstone
        "pk LONG, ck LONG, op STRING, ts LONG, "
        "cells MAP<STRING, STRUCT<v DOUBLE, ts LONG, ttl LONG>>",
    )
    static_ch = changes(
        [(1, "w", 120, {"sv": (9.0, 120, None)}),   # written "by" ck=10's
         (2, "w", 103, {"sv": (8.0, 103, None)}),   # pre-tombstone static
         (2, "d", 150, None)],
        "pk LONG, op STRING, ts LONG, "
        "cells MAP<STRING, STRUCT<v DOUBLE, ts LONG, ttl LONG>>",
    )
    rows_lww = fold_cassandra_cells(
        rows_ch, ["pk", "ck"], tomb_cols=["pk"]
    ).select("pk", "ck", "v")
    static_lww = fold_cassandra_cells(static_ch, ["pk"]).select(
        "pk", F.col("v").alias("sv")
    )
    got = {
        (r.pk, r.ck, r.v, r.sv)
        for r in attach_static_columns(rows_lww, static_lww, ["pk"]).collect()
    }
    # pk=1: both rows see the ts=120 static; pk=2: tombstone killed the
    # old row AND the old static, the ts=160 row survives with NULL sv
    assert got == {
        (1, 10, 1.0, 9.0),
        (1, 11, 2.0, 9.0),
        (2, 21, 4.0, None),
    }


def test_collection_merge_equals_one_shot_under_any_batching(spark):
    """Sequential merge_cassandra_collection_cells over several
    batchings (in-order, out-of-order, singleton) == the one-shot
    fold — NULL winners retained in state keep shadowing across batch
    boundaries, collection tombstones keep shadowing late arrivals."""
    from debezium_incubator_spark.cdc.cassandra import (
        fold_cassandra_collection_cells,
        merge_cassandra_collection_cells,
        read_cassandra_collection_state,
    )

    cells = [
        (1, "m", "a", 1.0, 10),
        (1, "m", "a", None, 15),   # element tombstone
        (1, "m", "b", 2.0, 18),
        (1, "m", "a", 9.0, 25),    # resurrect after tombstone
        (1, "m", "c", 3.0, 30),    # overwrite's own element
        (2, "m", "x", 4.0, 5),     # stays below pk=2's tombstone
    ]
    tombs = [(1, "m", 29), (2, "m", 40)]
    c_schema = "k LONG, column STRING, path STRING, v DOUBLE, cell_ts LONG"
    t_schema = "k LONG, column STRING, del_ts LONG"

    want = {
        (r.k, r.path, r.v)
        for r in fold_cassandra_collection_cells(
            spark.createDataFrame(cells, c_schema),
            spark.createDataFrame(tombs, t_schema),
            ["k"],
        ).collect()
    }
    assert want == {(1, "c", 3.0)}  # tombstone@29 sheds a@25/b@18; x shadowed

    batchings = [
        [cells[:3], cells[3:]],                      # in-order halves
        [cells[3:], cells[:3]],                      # out-of-order
        [[c] for c in cells],                        # singletons
    ]
    tomb_batches = [
        [tombs, []],
        [[], tombs],
        [tombs[:1], tombs[1:]] + [[]] * 4,
    ]
    for bs, ts in zip(batchings, tomb_batches):
        state_c, state_t = None, None
        for bc, bt in zip(bs, ts + [[]] * (len(bs) - len(ts))):
            state_c, state_t = merge_cassandra_collection_cells(
                state_c, state_t,
                spark.createDataFrame(bc, c_schema),
                spark.createDataFrame(bt or [(0, "m", -1)], t_schema),
                ["k"],
            )
        got = {
            (r.k, r.path, r.v)
            for r in read_cassandra_collection_state(
                state_c, ["k"]
            ).collect()
        }
        assert got == want, (bs, ts)


def test_cross_replica_duplicates_fold_idempotently(spark):
    """Debezium's Cassandra connector runs an agent per NODE, so a
    keyspace at RF=3 delivers every mutation up to three times (the
    docs call consumers 'idempotent by construction'). The cell LWW
    fold IS that idempotence: folding the 3x-duplicated union of
    per-replica streams equals folding one copy — including tombstone
    shadowing and equal-writetime ties, where a naive 'count wins'
    or arrival-order fold would diverge."""
    base = [
        (1, "w", 10, {"a": (1.0, 10, None), "b": (2.0, 10, None)}),
        (1, "w", 20, {"b": (9.0, 20, None)}),
        (2, "w", 10, {"a": (5.0, 10, None)}),
        (2, "d", 15, {}),                       # partition tombstone
        (3, "w", 30, {"a": (7.0, 30, None)}),
        (3, "w", 30, {"a": (4.0, 30, None)}),   # equal-ts value tie
    ]
    one = _changes(spark, base)
    # three replicas deliver the same mutations (bag union, arbitrary
    # interleave via a shuffled copy order)
    replicas = _changes(spark, base + base[::-1] + base[2:] + base[:2])
    got = _state(fold_cassandra_cells(replicas, ["user_id"]))
    want = _state(fold_cassandra_cells(one, ["user_id"]))
    assert got == want
    assert (1, "a") in want and (2, "a") not in want


def test_cell_tombstone_semantics(spark):
    """Single-column deletes: a NULL-v cell (1) wins the equal-
    writetime tie against a value write (delete-beats-write), (2)
    makes the column ABSENT from the assembled row, (3) is resurrected
    by a strictly later write, and (4) retained in merged STATE keeps
    shadowing a lower-ts cell arriving in a later batch."""
    from debezium_incubator_spark.cdc.cassandra import (
        fold_cassandra_cells,
        merge_cassandra_cells,
        read_cassandra_state,
    )

    def chg(rows):
        return spark.createDataFrame(
            rows,
            "pk LONG, op STRING, ts LONG, cells MAP<STRING, "
            "STRUCT<v: DOUBLE, ts: BIGINT, ttl: BIGINT>>",
        )

    changes = chg([
        # pk 1: write a@10, delete a@10 (equal-ts tie → delete wins),
        # b stays live
        (1, "w", 10, {"a": {"v": 1.0, "ts": 10, "ttl": None},
                      "b": {"v": 2.0, "ts": 10, "ttl": None}}),
        (1, "w", 11, {"a": {"v": None, "ts": 10, "ttl": None}}),
        # pk 2: delete a@20, later write a@30 resurrects
        (2, "w", 20, {"a": {"v": None, "ts": 20, "ttl": None}}),
        (2, "w", 21, {"a": {"v": 5.0, "ts": 30, "ttl": None}}),
    ])
    got = {(r.pk, r.column): r.v
           for r in fold_cassandra_cells(changes, ["pk"]).collect()}
    assert got == {(1, "b"): 2.0, (2, "a"): 5.0}

    # retention: batch 1 delivers the tombstone, batch 2 a LOWER-ts
    # write for the same column — state keeps it shadowed
    b1 = chg([(3, "w", 50, {"a": {"v": None, "ts": 50, "ttl": None}})])
    b2 = chg([(3, "w", 51, {"a": {"v": 9.0, "ts": 40, "ttl": None}})])
    cells, tombs = merge_cassandra_cells(None, None, b1, ["pk"])
    cells, tombs = merge_cassandra_cells(cells, tombs, b2, ["pk"])
    state = cells.collect()
    assert len(state) == 1 and state[0].v is None  # tombstone retained
    assert read_cassandra_state(
        cells, as_of=100, key_cols=["pk"]
    ).count() == 0  # but reads as absent
