"""Cassandra commitlog segment reader: round-trip property, every
refusal branch forward-encoded, and the capstone — a binary segment
stream folded through the EXISTING cell-LWW path equals folding the
same mutations delivered as a cell-change frame."""

from __future__ import annotations

import struct
import zlib

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from debezium_incubator_spark.cdc.cassandra import fold_cassandra_cells
from debezium_incubator_spark.cdc.commitlog import (
    MAGIC,
    commitlog_to_cells,
    encode_commitlog_segment,
    encode_mutation,
    parse_commitlog_segment,
)

_cell = st.tuples(
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                   width=64)),
    st.integers(0, 2**40),                       # writetime
    st.one_of(st.none(), st.integers(0, 2**31 - 1)),  # ttl
)

_mutation = st.fixed_dictionaries({
    "keyspace": st.text(alphabet="abcxyz_", min_size=1, max_size=8),
    "table": st.text(alphabet="abcxyz_", min_size=1, max_size=8),
    "pk": st.integers(-2**62, 2**62),
    "op": st.sampled_from(["w", "d"]),
    "ts": st.integers(0, 2**40),
    "cells": st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=6), _cell,
        max_size=4,
    ),
})


@settings(max_examples=120, deadline=None)
@given(st.lists(_mutation, max_size=10), st.integers(1, 5),
       st.integers(0, 64))
def test_roundtrip_any_mutations(muts, per_section, padding):
    data = encode_commitlog_segment(
        muts, segment_id=7, mutations_per_section=per_section,
        tail_padding=padding,
    )
    assert parse_commitlog_segment(data) == muts


def _base():
    return [
        {"keyspace": "ks", "table": "t", "pk": 1, "op": "w", "ts": 100,
         "cells": {"v": (1.5, 100, None), "s": (None, 100, 3600)}},
        {"keyspace": "ks", "table": "t", "pk": 2, "op": "d", "ts": 200,
         "cells": {}},
    ]


def test_refusal_branches_are_loud():
    good = encode_commitlog_segment(_base())

    with pytest.raises(ValueError, match="magic"):
        parse_commitlog_segment(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="version"):
        bad = bytearray(good)
        bad[4:6] = struct.pack(">H", 99)
        # re-stamp header CRC so version is the failing check
        bad[14:18] = struct.pack(">I", zlib.crc32(bytes(bad[:14])))
        parse_commitlog_segment(bytes(bad))
    with pytest.raises(ValueError, match="header CRC"):
        bad = bytearray(good)
        bad[6] ^= 0xFF  # corrupt segment id, keep stored CRC
        parse_commitlog_segment(bytes(bad))
    with pytest.raises(ValueError, match="section CRC"):
        bad = bytearray(good)
        bad[-10] ^= 0x01  # flip a payload byte near the tail
        parse_commitlog_segment(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        parse_commitlog_segment(good[:10])
    with pytest.raises(ValueError, match="truncated"):
        parse_commitlog_segment(good[:-6])  # cut inside final payload
    with pytest.raises(ValueError, match="corrupted tail"):
        parse_commitlog_segment(good + b"\x00garbage")
    # zero padding after the terminator is the preallocated-file norm
    assert parse_commitlog_segment(good + b"\x00" * 100) == _base()

    with pytest.raises(ValueError, match="unknown mutation op"):
        m = encode_mutation(_base()[0])
        body = bytearray(m[4:])
        # op byte sits after the two length-prefixed names + pk
        op_off = 1 + 2 + 1 + 1 + 8
        body[op_off] = 9
        payload = struct.pack(">I", len(body)) + bytes(body)
        head = MAGIC + struct.pack(">HQ", 1, 1)
        seg = (head + struct.pack(">I", zlib.crc32(head))
               + struct.pack(">II", len(payload), zlib.crc32(payload))
               + payload + struct.pack(">I", 0))
        parse_commitlog_segment(seg)
    with pytest.raises(ValueError, match="flag bits"):
        m = encode_mutation(
            {"keyspace": "k", "table": "t", "pk": 0, "op": "w",
             "ts": 1, "cells": {"c": (1.0, 1, None)}}
        )
        body = bytearray(m[4:])
        flag_off = 1 + 1 + 1 + 1 + 17 + 2 + 1 + 1  # ... + col len + col
        assert body[flag_off] == 1
        body[flag_off] = 0x80 | 1
        payload = struct.pack(">I", len(body)) + bytes(body)
        head = MAGIC + struct.pack(">HQ", 1, 1)
        seg = (head + struct.pack(">I", zlib.crc32(head))
               + struct.pack(">II", len(payload), zlib.crc32(payload))
               + payload + struct.pack(">I", 0))
        parse_commitlog_segment(seg)
    with pytest.raises(ValueError, match="overruns"):
        m = encode_mutation(_base()[0])
        payload = struct.pack(">I", len(m) + 50) + m[4:]
        head = MAGIC + struct.pack(">HQ", 1, 1)
        seg = (head + struct.pack(">I", zlib.crc32(head))
               + struct.pack(">II", len(payload), zlib.crc32(payload))
               + payload + struct.pack(">I", 0))
        parse_commitlog_segment(seg)
    with pytest.raises(ValueError, match="stray bytes"):
        m = encode_mutation(_base()[0])
        body = m[4:] + b"\x01\x02"  # correct everything, stray tail
        payload = struct.pack(">I", len(body)) + body
        head = MAGIC + struct.pack(">HQ", 1, 1)
        seg = (head + struct.pack(">I", zlib.crc32(head))
               + struct.pack(">II", len(payload), zlib.crc32(payload))
               + payload + struct.pack(">I", 0))
        parse_commitlog_segment(seg)


def test_binary_segments_fold_equals_cell_stream_fold(spark):
    """Connector #1 'real format' e2e: mutations exercising every cell
    semantic (sparse writes, NULL-value cells, TTL vs head, partition
    tombstone shadowing late-arriving cells, equal-writetime value
    tie) are forward-encoded into SEGMENT BLOBS split across rows,
    decoded through the mapInPandas seam, and folded — equal to
    folding the same mutations as a plain cell-change frame."""
    muts = [
        # pk 1: two writers, later sparse write must not null col a
        {"keyspace": "ks", "table": "users", "pk": 1, "op": "w",
         "ts": 10, "cells": {"a": (1.0, 10, None), "b": (2.0, 10, None)}},
        {"keyspace": "ks", "table": "users", "pk": 1, "op": "w",
         "ts": 20, "cells": {"b": (9.0, 20, None)}},
        # pk 2: tombstone at 50 shadows the LATER-ARRIVING ts-40 cell,
        # the ts-60 write resurrects
        {"keyspace": "ks", "table": "users", "pk": 2, "op": "w",
         "ts": 60, "cells": {"a": (6.0, 60, None)}},
        {"keyspace": "ks", "table": "users", "pk": 2, "op": "d",
         "ts": 50, "cells": {}},
        {"keyspace": "ks", "table": "users", "pk": 2, "op": "w",
         "ts": 40, "cells": {"a": (4.0, 40, None), "b": (4.0, 40, None)}},
        # pk 3: TTL'd cell expired vs head (head ts = 60), live one not
        {"keyspace": "ks", "table": "users", "pk": 3, "op": "w",
         "ts": 5, "cells": {"a": (5.0, 5, 10), "b": (5.0, 5, 1000)}},
        # pk 4: equal writetime — higher value wins
        {"keyspace": "ks", "table": "users", "pk": 4, "op": "w",
         "ts": 30, "cells": {"a": (3.0, 30, None)}},
        {"keyspace": "ks", "table": "users", "pk": 4, "op": "w",
         "ts": 31, "cells": {"a": (7.0, 30, None)}},
    ]
    blobs = [
        encode_commitlog_segment(muts[:3], segment_id=1,
                                 mutations_per_section=2),
        encode_commitlog_segment(muts[3:], segment_id=2,
                                 mutations_per_section=2,
                                 tail_padding=37),
    ]
    segments = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)],
        "seg_id INT, segment BINARY",
    )
    decoded = commitlog_to_cells(segments)
    assert decoded.count() == len(muts)
    via_binary = fold_cassandra_cells(
        decoded.filter(
            (F.col("keyspace") == "ks") & (F.col("table_name") == "users")
        ),
        ["pk"],
    ).orderBy("pk", "column").collect()

    direct = spark.createDataFrame(
        [
            (m["pk"], m["op"], m["ts"],
             {c: {"v": v, "ts": cts, "ttl": ttl}
              for c, (v, cts, ttl) in m["cells"].items()} or None)
            for m in muts
        ],
        "pk BIGINT, op STRING, ts BIGINT, cells MAP<STRING, "
        "STRUCT<v: DOUBLE, ts: BIGINT, ttl: BIGINT>>",
    )
    via_frame = fold_cassandra_cells(direct, ["pk"]) \
        .orderBy("pk", "column").collect()
    assert via_binary == via_frame
    got = {(r.pk, r.column): r.v for r in via_binary}
    assert got == {
        (1, "a"): 1.0, (1, "b"): 9.0,     # sparse write kept col a
        (2, "a"): 6.0,                    # resurrection; ts-40 shadowed
        (3, "b"): 5.0,                    # TTL'd 'a' expired vs head 60
        (4, "a"): 7.0,                    # equal-writetime value tie
    }


def test_commitlog_directory_stream_with_restart(spark, tmp_path):
    """Connector #1's operating loop: tail a commitlog DIRECTORY as a
    binaryFile stream, merge each segment into persisted cell state,
    restart from checkpoint when a new segment lands — final state
    equals the one-shot fold over all mutations, include-list applied,
    and a simulated replayed epoch leaves state unchanged."""
    import os

    from debezium_incubator_spark.cdc.commitlog import (
        commitlog_merge_foreach_batch,
        start_commitlog_stream,
    )
    from debezium_incubator_spark.cdc.cassandra import (
        fold_cassandra_cells,
        read_cassandra_state,
    )

    def mut(pk, op, ts, cells, table="users"):
        return {"keyspace": "ks", "table": table, "pk": pk, "op": op,
                "ts": ts, "cells": cells}

    seg1 = [
        mut(1, "w", 10, {"a": (1.0, 10, None), "b": (2.0, 10, None)}),
        mut(2, "w", 11, {"a": (3.0, 11, None)}),
        mut(9, "w", 12, {"x": (9.0, 12, None)}, table="other"),  # excluded
    ]
    seg2 = [
        mut(1, "d", 20, {}),                       # partition tombstone
        mut(2, "w", 21, {"b": (4.0, 21, None)}),
    ]
    seg3 = [
        mut(1, "w", 30, {"a": (7.0, 30, None)}),   # resurrects pk 1
    ]
    logs = tmp_path / "commitlog"
    logs.mkdir()
    for i, muts in enumerate([seg1, seg2]):
        (logs / f"seg{i}.log").write_bytes(
            encode_commitlog_segment(muts, segment_id=i)
        )
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = start_commitlog_stream(
        spark, str(logs), state, ckpt, ["pk"],
        keyspace="ks", table="users",
    )
    q.awaitTermination(120)

    # third segment lands; RESTART resumes from the checkpoint
    (logs / "seg2.log").write_bytes(
        encode_commitlog_segment(seg3, segment_id=2)
    )
    q2 = start_commitlog_stream(
        spark, str(logs), state, ckpt, ["pk"],
        keyspace="ks", table="users",
    )
    q2.awaitTermination(120)

    from debezium_incubator_spark.streaming.upsert import _latest_path

    final = _latest_path(state)
    cells = spark.read.parquet(os.path.join(final, "cells"))
    streamed = sorted(
        (r.pk, r.column, r.v)
        for r in read_cassandra_state(cells, as_of=10**9,
                                      key_cols=["pk"]).collect()
    )
    # one-shot fold over the same mutations (include-list applied)
    all_muts = [m for m in seg1 + seg2 + seg3 if m["table"] == "users"]
    direct = spark.createDataFrame(
        [
            (m["pk"], m["op"], m["ts"],
             {c: {"v": v, "ts": cts, "ttl": ttl}
              for c, (v, cts, ttl) in m["cells"].items()} or None)
            for m in all_muts
        ],
        "pk BIGINT, op STRING, ts BIGINT, cells MAP<STRING, "
        "STRUCT<v: DOUBLE, ts: BIGINT, ttl: BIGINT>>",
    )
    one_shot = sorted(
        (r.pk, r.column, r.v)
        for r in fold_cassandra_cells(direct, ["pk"]).collect()
    )
    assert streamed == one_shot
    assert (1, "a", 7.0) in streamed          # resurrection landed
    assert all(pk != 9 for pk, _, _ in streamed)  # include-list held

    # simulated crash-replay of the LAST epoch: re-invoking the handler
    # with the same epoch id must leave the final state identical
    # epoch dirs are lineage-qualified (v{epoch}_{run_id}) — recover
    # both parts and replay under the SAME lineage the stream used
    from debezium_incubator_spark.cdc.commitlog import _checkpoint_run_id

    base = os.path.basename(final)
    last_epoch = int(base[1:].split("_")[0])
    assert base.endswith(_checkpoint_run_id(ckpt))
    seg_df = spark.createDataFrame(
        [(encode_commitlog_segment(seg3, segment_id=2),)],
        "content BINARY",
    )
    handler = commitlog_merge_foreach_batch(
        state, ["pk"], keyspace="ks", table="users",
        run_id=_checkpoint_run_id(ckpt))
    handler(seg_df, last_epoch)
    cells2 = spark.read.parquet(
        os.path.join(_latest_path(state), "cells"))
    replayed = sorted(
        (r.pk, r.column, r.v)
        for r in read_cassandra_state(cells2, as_of=10**9,
                                      key_cols=["pk"]).collect()
    )
    assert replayed == one_shot


def test_fresh_checkpoint_does_not_step_back_foreign_lineage(spark, tmp_path):
    """ADVICE r8: a FRESH checkpoint run against an existing state_dir
    must never collide with (or step back past) a foreign lineage's
    v{epoch} — the old heuristic refolded from only the current batch
    (state loss). Lineage-qualified epoch dirs + the committed _PREV
    pointer make run B's epoch 0 merge ON TOP of run A's state, and a
    same-lineage replay of run B's epoch 0 follow _PREV back to run A's
    state (not arithmetic v{-1}) — idempotent with zero loss."""
    import os

    from debezium_incubator_spark.cdc.cassandra import read_cassandra_state
    from debezium_incubator_spark.cdc.commitlog import (
        commitlog_merge_foreach_batch,
    )
    from debezium_incubator_spark.streaming.upsert import _latest_path

    def seg_df(muts, sid):
        return spark.createDataFrame(
            [(encode_commitlog_segment(muts, segment_id=sid),)],
            "content BINARY",
        )

    def mut(pk, ts, cells):
        return {"keyspace": "ks", "table": "users", "pk": pk, "op": "w",
                "ts": ts, "cells": cells}

    state = str(tmp_path / "state")
    # run A (old lineage): epoch 0 writes pk=1, pointer lands on v0
    ha = commitlog_merge_foreach_batch(
        state, ["pk"], keyspace="ks", table="users", run_id="run-A")
    ha(seg_df([mut(1, 10, {"a": (1.0, 10, None)})], 0), 0)
    assert os.path.basename(_latest_path(state)) == "v0_run-A"

    # run B (FRESH checkpoint, new lineage): its first epoch is ALSO 0.
    # pk=1 from run A must survive the merge.
    hb = commitlog_merge_foreach_batch(
        state, ["pk"], keyspace="ks", table="users", run_id="run-B")
    hb(seg_df([mut(2, 20, {"a": (2.0, 20, None)})], 1), 0)
    cells = spark.read.parquet(
        os.path.join(_latest_path(state), "cells"))
    got = sorted(
        (r.pk, r.column, r.v)
        for r in read_cassandra_state(
            cells, as_of=10**9, key_cols=["pk"]).collect()
    )
    assert got == [(1, "a", 1.0), (2, "a", 2.0)]  # nothing lost

    # same-lineage replay of run B's epoch 0 (crash before checkpoint
    # commit): steps back past its own v0 to run A's state — final
    # state identical (idempotent replay)
    hb(seg_df([mut(2, 20, {"a": (2.0, 20, None)})], 1), 0)
    cells2 = spark.read.parquet(
        os.path.join(_latest_path(state), "cells"))
    got2 = sorted(
        (r.pk, r.column, r.v)
        for r in read_cassandra_state(
            cells2, as_of=10**9, key_cols=["pk"]).collect()
    )
    assert got2 == got


# --- round-9 fidelity notch: v2 multi-table envelopes + _cdc.idx ----------

T_USERS = "0123456789abcdef0123456789abcdef"
T_ORDERS = "fedcba9876543210fedcba9876543210"
TABLE_MAP = {T_USERS: "users", T_ORDERS: "orders"}


def _v2_env(pk, ts, updates):
    return {"keyspace": "ks", "pk": pk, "ts": ts, "updates": updates}


def test_v2_multi_table_envelope_roundtrip():
    """One mutation envelope carrying partition updates for TWO tables
    fans out to one cell-stream row per table, names routed through
    the table map."""
    from debezium_incubator_spark.cdc.commitlog import (
        encode_commitlog_segment,
        parse_commitlog_segment,
    )

    seg = encode_commitlog_segment(
        [_v2_env(1, 10, [
            (T_USERS, "w", {"a": (1.0, 10, None)}),
            (T_ORDERS, "w", {"amt": (9.5, 10, 60)}),
        ]),
         _v2_env(2, 11, [(T_USERS, "d", {})])],
        version=2, tail_padding=32,
    )
    muts = parse_commitlog_segment(seg, table_map=TABLE_MAP)
    assert [(m["table"], m["pk"], m["op"]) for m in muts] == [
        ("users", 1, "w"), ("orders", 1, "w"), ("users", 2, "d"),
    ]
    assert muts[1]["cells"]["amt"] == (9.5, 10, 60)


def test_v2_refusals_are_loud():
    import pytest

    from debezium_incubator_spark.cdc.commitlog import (
        encode_commitlog_segment,
        parse_commitlog_segment,
    )

    seg = encode_commitlog_segment(
        [_v2_env(1, 10, [(T_USERS, "w", {"a": (1.0, 10, None)})])],
        version=2,
    )
    # v2 without a table map
    with pytest.raises(ValueError, match="needs a table_map"):
        parse_commitlog_segment(seg)
    # unknown table id — committed data for an unknown table is loss,
    # never skipped
    with pytest.raises(ValueError, match="unknown table id"):
        parse_commitlog_segment(seg, table_map={T_ORDERS: "orders"})
    # zero-update envelope
    with pytest.raises(ValueError, match="zero table updates"):
        parse_commitlog_segment(
            encode_commitlog_segment([_v2_env(1, 10, [])], version=2),
            table_map=TABLE_MAP,
        )
    # truncated table id (cut the segment mid-envelope, fix no CRC —
    # the section CRC catches it first, which is also a loud refusal)
    with pytest.raises(ValueError):
        parse_commitlog_segment(seg[:-10], table_map=TABLE_MAP)


def test_cdc_index_roundtrip_and_refusals():
    import pytest

    from debezium_incubator_spark.cdc.commitlog import (
        cdc_index_path,
        encode_cdc_index,
        parse_cdc_index,
    )

    assert parse_cdc_index(encode_cdc_index(1234)) == (1234, False)
    assert parse_cdc_index(encode_cdc_index(99, True)) == (99, True)
    assert cdc_index_path("/x/seg7.log") == "/x/seg7_cdc.idx"
    with pytest.raises(ValueError, match="not an offset"):
        parse_cdc_index(b"xyz\n")
    with pytest.raises(ValueError, match="COMPLETED"):
        parse_cdc_index(b"12\ngarbage\n")
    with pytest.raises(ValueError, match="empty"):
        parse_cdc_index(b"")
    with pytest.raises(ValueError, match="negative"):
        parse_cdc_index(b"-5\n")


def test_open_segment_watermark_bounds_the_parse():
    """An OPEN segment (no COMPLETED) is parsed only up to the flushed
    watermark: fully-contained sections are consumed, a straddling
    section is withheld, and torn garbage beyond the watermark is
    ignored — while a LYING watermark (past EOF) refuses."""
    import pytest

    from debezium_incubator_spark.cdc.commitlog import (
        encode_commitlog_segment,
        parse_commitlog_segment,
    )

    def mut(pk, ts):
        return {"keyspace": "ks", "table": "users", "pk": pk, "op": "w",
                "ts": ts, "cells": {"a": (float(pk), ts, None)}}

    # 2 sections of 1 mutation each + terminator
    full = encode_commitlog_segment(
        [mut(1, 10), mut(2, 20)], mutations_per_section=1)
    # find the boundary: header 18 + (8 + len(sec1)) — recompute by
    # parsing the length prefix
    import struct
    (sec1_len,) = struct.unpack(">I", full[18:22])
    sec1_end = 18 + 8 + sec1_len
    # simulate an in-flight file: section 2 half-written torn garbage
    torn = full[:sec1_end] + b"\x99" * 40
    got = parse_commitlog_segment(torn, cdc_index=(sec1_end, False))
    assert [m["pk"] for m in got] == [1]
    # watermark straddling section 2 withholds it
    got = parse_commitlog_segment(full, cdc_index=(sec1_end + 6, False))
    assert [m["pk"] for m in got] == [1]
    # watermark at EOF of the full file with COMPLETED → strict parse
    got = parse_commitlog_segment(full, cdc_index=(len(full), True))
    assert [m["pk"] for m in got] == [1, 2]
    # lying index: watermark beyond the file
    with pytest.raises(ValueError, match="lying index"):
        parse_commitlog_segment(torn, cdc_index=(len(torn) + 9, False))
    # nothing flushed yet
    assert parse_commitlog_segment(torn, cdc_index=(4, False)) == []


def test_directory_stream_consumes_index_watermark(spark, tmp_path):
    """The directory tail stops where each segment's _cdc.idx says:
    an open segment's unflushed (torn) tail is invisible, a completed
    segment folds fully, and a segment WITHOUT its sidecar refuses."""
    import os
    import struct

    from debezium_incubator_spark.cdc.cassandra import read_cassandra_state
    from debezium_incubator_spark.cdc.commitlog import (
        cdc_index_path,
        encode_cdc_index,
        start_commitlog_stream,
    )
    from debezium_incubator_spark.streaming.upsert import _latest_path

    def mut(pk, ts, table="users"):
        return {"keyspace": "ks", "table": table, "pk": pk, "op": "w",
                "ts": ts, "cells": {"a": (float(pk), ts, None)}}

    logs = tmp_path / "commitlog"
    logs.mkdir()
    # seg0: completed
    seg0 = encode_commitlog_segment([mut(1, 10), mut(2, 11)],
                                    segment_id=0)
    p0 = logs / "seg0.log"
    p0.write_bytes(seg0)
    (logs / "seg0_cdc.idx").write_bytes(
        encode_cdc_index(len(seg0), True))
    # seg1: OPEN — flushed through section 1 (pk=3), torn bytes beyond
    seg1 = encode_commitlog_segment([mut(3, 20), mut(4, 21)],
                                    segment_id=1,
                                    mutations_per_section=1)
    (s1_len,) = struct.unpack(">I", seg1[18:22])
    wm = 18 + 8 + s1_len
    p1 = logs / "seg1.log"
    p1.write_bytes(seg1[:wm] + b"\x7f" * 16)   # torn in-flight tail
    (logs / "seg1_cdc.idx").write_bytes(encode_cdc_index(wm, False))

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = start_commitlog_stream(
        spark, str(logs), state, ckpt, ["pk"],
        keyspace="ks", table="users", require_cdc_index=True,
    )
    q.awaitTermination(120)
    cells = spark.read.parquet(
        os.path.join(_latest_path(state), "cells"))
    got = sorted(
        r.pk for r in read_cassandra_state(
            cells, as_of=10**9, key_cols=["pk"]).collect()
    )
    assert got == [1, 2, 3]   # pk=4 is beyond the watermark — invisible

    # a segment without its sidecar refuses loudly on the next run
    seg2 = encode_commitlog_segment([mut(5, 30)], segment_id=2)
    (logs / "seg2.log").write_bytes(seg2)
    q2 = start_commitlog_stream(
        spark, str(logs), state, ckpt, ["pk"],
        keyspace="ks", table="users", require_cdc_index=True,
    )
    import pytest

    with pytest.raises(Exception, match="no _cdc.idx sidecar"):
        q2.awaitTermination(120)
        raise RuntimeError("stream should have failed")


def test_cdc_enabled_table_property_gate():
    """The `cdc = true` table-property semantics: segments carry EVERY
    table's mutations (a segment lands in cdc_raw when any enabled
    table wrote into it); the reader keeps only cdc-enabled tables.
    Known-but-disabled → deliberate drop; unknown id → still refusal;
    enabled-name typo → refusal at entry; v1 → refusal (no table
    ids)."""
    import pytest

    from debezium_incubator_spark.cdc.commitlog import (
        encode_commitlog_segment,
        parse_commitlog_segment,
    )

    seg = encode_commitlog_segment(
        [_v2_env(1, 10, [
            (T_USERS, "w", {"a": (1.0, 10, None)}),
            (T_ORDERS, "w", {"amt": (9.5, 10, None)}),
        ]),
         _v2_env(2, 11, [(T_ORDERS, "w", {"amt": (3.0, 11, None)})])],
        version=2,
    )
    # only 'users' is cdc-enabled: orders mutations drop, users stay
    muts = parse_commitlog_segment(
        seg, table_map=TABLE_MAP, cdc_enabled={"users"}
    )
    assert [(m["table"], m["pk"]) for m in muts] == [("users", 1)]
    # both enabled == unfiltered
    both = parse_commitlog_segment(
        seg, table_map=TABLE_MAP, cdc_enabled={"users", "orders"}
    )
    assert len(both) == 3
    # unknown table id refuses even when that table would be filtered
    with pytest.raises(ValueError, match="unknown table id"):
        parse_commitlog_segment(
            seg, table_map={T_USERS: "users"}, cdc_enabled={"users"}
        )
    # a typo in the enabled set is loud, not a silent empty capture
    with pytest.raises(ValueError, match="not in table_map"):
        parse_commitlog_segment(
            seg, table_map=TABLE_MAP, cdc_enabled={"userz"}
        )
    # the property gate needs table routing — version 1 refuses
    v1 = encode_commitlog_segment(
        [{"keyspace": "ks", "table": "users", "pk": 1, "op": "w",
          "ts": 10, "cells": {"a": (1.0, 10, None)}}]
    )
    with pytest.raises(ValueError, match="version-1 segments carry no"):
        parse_commitlog_segment(v1, cdc_enabled={"users"})
