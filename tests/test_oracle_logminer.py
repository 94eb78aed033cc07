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


# ---------------------------------------------------------------------------
# Partial rollback (ROLLBACK=1): LIFO matching semantics
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_incubator_spark.cdc.oracle_logminer import (
    apply_partial_rollback,
)


def _rredo(spark, rows):
    """rows: (xid, row_id, scn, rollback)"""
    return spark.createDataFrame(
        rows, "xid LONG, row_id LONG, scn LONG, rollback INT"
    )


def _surviving(spark, rows):
    return sorted(
        r.scn for r in apply_partial_rollback(_rredo(spark, rows)).collect()
    )


def test_partial_rollback_lifo_cases(spark):
    """The rollback entry cancels the MOST RECENT prior change to its
    rowid (stack discipline), not the first — each scenario would come
    out differently under FIFO or flag-blind folds."""
    # o1 o2 r  -> r cancels o2, o1 survives
    assert _surviving(spark, [
        (1, 1, 10, 0), (1, 1, 11, 0), (1, 1, 12, 1),
    ]) == [10]
    # o1 r o2  -> r cancels o1, o2 survives
    assert _surviving(spark, [
        (1, 1, 10, 0), (1, 1, 11, 1), (1, 1, 12, 0),
    ]) == [12]
    # o1 o2 r r -> both cancelled
    assert _surviving(spark, [
        (1, 1, 10, 0), (1, 1, 11, 0), (1, 1, 12, 1), (1, 1, 13, 1),
    ]) == []
    # o1 o2 r o3 r -> first r cancels o2, second cancels o3; o1 survives
    assert _surviving(spark, [
        (1, 1, 10, 0), (1, 1, 11, 0), (1, 1, 12, 1),
        (1, 1, 13, 0), (1, 1, 14, 1),
    ]) == [10]
    # unmatched rollback (no prior change) is consumed silently
    assert _surviving(spark, [(1, 1, 10, 1), (1, 1, 11, 0)]) == [11]


def test_partial_rollback_scoped_per_txn_and_rowid(spark):
    """A rollback only undoes work on ITS (transaction, rowid) — other
    rowids in the same txn and the same rowid in other txns keep their
    changes."""
    assert _surviving(spark, [
        (1, 1, 10, 0),   # xid 1, row 1 — survives (rb targets row 2)
        (1, 2, 11, 0),   # xid 1, row 2 — cancelled
        (1, 2, 12, 1),
        (2, 2, 13, 0),   # xid 2, row 2 — survives (other txn)
    ]) == [10, 13]


def _stack_fold(seq):
    """Sequential LIFO reference: returns surviving change scns."""
    stack = []
    for scn, rb in seq:
        if rb:
            if stack:
                stack.pop()
        else:
            stack.append(scn)
    return sorted(stack)


_SEQ = st.lists(st.booleans(), min_size=0, max_size=14)


@settings(max_examples=12, deadline=None)
@given(_SEQ, _SEQ)
def test_partial_rollback_matches_stack_fold(spark, seq_a, seq_b):
    """The closed-form window test equals the sequential stack fold for
    ANY interleaving of changes and rollbacks, across two independent
    (xid, rowid) groups folded in one frame."""
    rows = [(1, 1, i, int(rb)) for i, rb in enumerate(seq_a)]
    rows += [(2, 7, 100 + i, int(rb)) for i, rb in enumerate(seq_b)]
    if not rows:
        return
    want = _stack_fold([(i, rb) for i, rb in enumerate(seq_a)])
    want += [100 + s for s in _stack_fold(
        [(i, rb) for i, rb in enumerate(seq_b)])]
    assert _surviving(spark, rows) == sorted(want)


def test_rollback_plan_single_exchange(spark):
    """Both window passes (running depth + following max) must ride ONE
    (xid, row_id) exchange — a second shuffle would double the fold's
    cost at any scale."""
    redo = _rredo(spark, [(1, 1, 10, 0), (1, 1, 11, 1)])
    plan = apply_partial_rollback(redo)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# Transaction buffer: incremental ≡ one-shot under any batching
# ---------------------------------------------------------------------------


def test_txn_buffer_emits_on_commit_and_matches_one_shot(spark):
    """Sequential merge_logminer_buffer over three different batchings
    (position-ordered, commit-late, singleton) emits exactly the
    one-shot visible set: a txn spanning batches is held until its
    commit arrives, rollback entries cancel at emit time, and the
    never-committing txn is never delivered."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.cdc.oracle_logminer import (
        apply_partial_rollback,
        logminer_commit_ordered,
        merge_logminer_buffer,
    )

    redo_rows = [
        # xid 1: two writes to row 1, the second rolled back
        (1, 1, 10, 0, 1.0), (1, 1, 12, 0, 2.0), (1, 1, 14, 1, 0.0),
        # xid 2: spans batches, commits late
        (2, 2, 11, 0, 5.0), (2, 2, 21, 0, 6.0),
        # xid 3: never commits
        (3, 3, 13, 0, 9.0),
        # xid 4: single write, quick commit
        (4, 1, 22, 0, 7.0),
    ]
    commit_rows = [(1, 15), (2, 30), (4, 23)]
    r_schema = "xid LONG, row_id LONG, scn LONG, rollback INT, v DOUBLE"
    c_schema = "xid LONG, commit_scn LONG"

    redo = spark.createDataFrame(redo_rows, r_schema)
    commits = spark.createDataFrame(commit_rows, c_schema)
    one_shot = logminer_commit_ordered(
        apply_partial_rollback(redo), commits
    )
    want = {(r.xid, r.row_id, r.scn, r.v, r["__commit_scn"])
            for r in one_shot.collect()}
    assert {w[2] for w in want} == {10, 11, 21, 22}  # 12 rolled back, 13 in-flight

    def by_pred(rp, cp):
        return ([r for r in redo_rows if rp(r[2])],
                [c for c in commit_rows if cp(c[1])])

    batchings = [
        # position-ordered halves (xid 2 spans the cut)
        [by_pred(lambda s: s <= 15, lambda c: c <= 15),
         by_pred(lambda s: s > 15, lambda c: c > 15)],
        # all redo first, commits only in the second batch
        [(redo_rows, []), ([], commit_rows)],
        # singleton batches, redo then commits
        [([r], []) for r in redo_rows] + [([], [c]) for c in commit_rows],
    ]
    for batches in batchings:
        buf, got = None, set()
        for br, bc in batches:
            buf, emitted = merge_logminer_buffer(
                buf,
                spark.createDataFrame(br or [], r_schema),
                spark.createDataFrame(bc or [], c_schema),
            )
            got |= {(r.xid, r.row_id, r.scn, r.v, r["__commit_scn"])
                    for r in emitted.collect()}
        assert got == want, batches
        # only the in-flight txn remains buffered
        assert {r.xid for r in buf.collect()} == {3}


def test_partial_rollback_composite_position_resolves_scn_ties(spark):
    """Real LogMiner streams tie on SCN (uniqueness lives in (SCN,
    RS_ID, SSN)): the composite pos_col makes the LIFO match
    deterministic — here the rollback (ssn=2) cancels the change at
    ssn=1 within the same SCN, leaving the earlier change alive."""
    from debezium_incubator_spark.cdc.oracle_logminer import (
        apply_partial_rollback,
    )

    redo = spark.createDataFrame(
        [
            (1, 1, 10, 0, 0, 1.0),   # earlier SCN — survives
            (1, 1, 11, 1, 0, 2.0),   # same SCN, ssn 1 — cancelled
            (1, 1, 11, 2, 1, 0.0),   # same SCN, ssn 2 — the rollback
        ],
        "xid LONG, row_id LONG, scn LONG, ssn LONG, rollback INT, v DOUBLE",
    )
    got = sorted(
        (r.scn, r.ssn)
        for r in apply_partial_rollback(
            redo, pos_col=["scn", "ssn"]
        ).collect()
    )
    assert got == [(10, 0)]


# --- RAC multi-node redo threads -------------------------------------------


def test_rac_merge_emits_only_to_min_watermark(spark):
    from debezium_incubator_spark.cdc.oracle_logminer import (
        merge_rac_threads,
    )

    n0 = _redo(spark, [(1, 10, 1.0, "c", 0), (1, 80, 2.0, "u", 2)])
    n1 = _redo(spark, [(2, 20, 5.0, "c", 1), (2, 50, 6.0, "u", 3)])
    emittable, withheld, wm = merge_rac_threads([(n0, 80), (n1, 50)])
    assert wm == 50
    assert sorted(r["scn"] for r in emittable.collect()) == [10, 20, 50]
    assert [r["scn"] for r in withheld.collect()] == [80]


def test_rac_merge_raises_on_lying_high_water(spark):
    import pytest as _pytest

    from debezium_incubator_spark.cdc.oracle_logminer import (
        merge_rac_threads,
    )

    n0 = _redo(spark, [(1, 99, 1.0, "c", 0)])
    emittable, _, _ = merge_rac_threads([(n0, 50)])
    with _pytest.raises(Exception, match="beyond its node's claimed"):
        # the illegal row is ABOVE the watermark, so force full
        # evaluation through the withheld side too
        merge_rac_threads([(n0, 50)])[1].collect()
    with _pytest.raises(ValueError, match="no threads"):
        merge_rac_threads([])


@settings(max_examples=15, deadline=None)
@given(
    hw_steps=st.lists(
        st.integers(min_value=0, max_value=120), min_size=1, max_size=4
    )
)
def test_rac_polling_to_completion_equals_one_shot(spark, hw_steps):
    """Advancing the lagging node's high-water through ANY sequence of
    polls and unioning the emittable increments reproduces the one-shot
    merge — no row is lost, duplicated, or emitted early."""
    from debezium_incubator_spark.cdc.oracle_logminer import (
        merge_rac_threads,
    )

    rows0 = [(1, s, float(s), "u", 0) for s in (5, 40, 90, 110)]
    rows1 = [(2, s, float(s), "u", 1) for s in (15, 60, 100)]
    n0 = _redo(spark, rows0)
    full1 = rows1
    seen: list[tuple] = []
    prev_wm = -1
    hws = sorted(set(hw_steps)) + [120]
    for hw in hws:
        n1 = _redo(spark, [r for r in full1 if r[1] <= hw])
        emittable, _, wm = merge_rac_threads([(n0, 120), (n1, hw)])
        inc = [tuple(r) for r in emittable.filter(
            F.col("scn") > prev_wm).collect()]
        assert all(prev_wm < r[1] <= wm for r in inc)
        seen += inc
        prev_wm = wm
    one_shot = merge_rac_threads(
        [(n0, 120), (_redo(spark, full1), 120)]
    )[0].collect()
    assert sorted(seen, key=lambda r: r[1]) == sorted(
        [tuple(r) for r in one_shot], key=lambda r: r[1]
    )


# --- XStream adapter (LCR commit-order delivery) ---------------------------


def _fold_py(entries, order_key):
    """Per-user latest-state python fold under an arbitrary total
    order: entries = (user, scn, xid, seq, commit_scn, op, value)."""
    state = {}
    for e in sorted(entries, key=order_key):
        user, op, value = e[0], e[5], e[6]
        if op == "d":
            state.pop(user, None)
        else:
            state[user] = value
    return state


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_xstream_order_equals_logminer_order(data):
    """The adapter-equivalence keystone, pure-python: with UNIQUE
    commit SCNs per transaction, folding in XStream LCR order
    (commit_scn, sequence) equals folding in LogMiner order
    (commit_scn, scn) for ANY log."""
    n_txn = data.draw(st.integers(2, 6))
    entries = []
    scn = 0
    for xid in range(n_txn):
        for seq in range(1, data.draw(st.integers(1, 4)) + 1):
            scn += 1
            entries.append([
                data.draw(st.integers(0, 3)),       # user
                scn, xid, seq, None,
                data.draw(st.sampled_from(["c", "u", "d"])),
                data.draw(st.integers(0, 99)),      # value
            ])
    # unique commit scns, arbitrary commit ORDER (a permutation)
    commit_order = data.draw(st.permutations(list(range(n_txn))))
    commit_scn = {xid: 10_000 + i for i, xid in enumerate(commit_order)}
    for e in entries:
        e[4] = commit_scn[e[2]]
    lm = _fold_py(entries, lambda e: (e[4], e[1]))   # (commit_scn, scn)
    xs = _fold_py(entries, lambda e: (e[4], e[3]))   # (commit_scn, seq)
    assert lm == xs


def test_xstream_lcrs_positions_and_withholding(spark):
    from debezium_incubator_spark.cdc.oracle_logminer import xstream_lcrs

    redo = spark.createDataFrame(
        [
            # xid 0: two entries, interleaved with xid 1's scns
            (1, 10, 0, "c", 1.0),
            (1, 30, 0, "u", 3.0),
            # xid 1 commits FIRST despite later scns
            (1, 20, 1, "u", 2.0),
            # xid 2 never commits
            (2, 40, 2, "c", 9.0),
        ],
        "user_id LONG, scn LONG, xid LONG, __op STRING, value DOUBLE",
    )
    # commit scns cross the 9→10 hex-digit boundary: unpadded hex would
    # order '1000000000' < 'FF' lexicographically — lpad(16) must not
    commits = spark.createDataFrame(
        [(1, 255), (0, 1 << 36)], "xid LONG, commit_scn LONG"
    )
    rows = {
        (r.xid, r.scn): r
        for r in xstream_lcrs(redo, commits).collect()
    }
    assert (2, 40) not in rows  # in-flight withheld
    assert rows[(0, 10)].sequence == 1 and rows[(0, 30)].sequence == 2
    # byte-comparable: xid 1 (commit 255) sorts BEFORE xid 0 (2^36)
    assert rows[(1, 20)].position < rows[(0, 10)].position
    assert len(rows[(0, 10)].position) == 24  # 16 + 8 fixed width
    st8 = materialize_latest(
        xstream_lcrs(redo, commits), ["user_id"], ["position"]
    ).collect()
    # xid 0 committed later, so its scn-30 value wins for user 1
    assert {(r.user_id, r.value) for r in st8} == {(1, 3.0)}


def test_xstream_fixture_flips_plain_scn_fold(spark):
    """The registered fixture is load-bearing: folding the same
    visible set by plain scn yields a DIFFERENT state than the
    commit-ordered fold (so parity is proving visibility semantics,
    not a rename)."""
    from debezium_incubator_spark.cdc.oracle_logminer import (
        cdc_xstream_fold, logminer_commit_ordered, xstream_lcrs,
    )
    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.cdc.envelope import OP_CASE

    from .conftest import SF_SMOKE

    ev = table(spark, SF_SMOKE, "events")
    redo = ev.select(
        "user_id", F.col("event_id").alias("scn"), "value",
        F.expr(OP_CASE).alias("__op"),
        (F.col("event_id") / 5).cast("long").alias("xid"),
    )
    gmax = redo.agg(F.max("scn").alias("gmax"))
    commits = (
        redo.groupBy("xid").agg(F.max("scn").alias("last_scn"))
        .filter(F.col("xid") % 97 != 0)
        .crossJoin(F.broadcast(gmax))
        .select("xid", F.when(
            F.col("xid") % 2 == 1, F.col("gmax") + F.col("xid")
        ).otherwise(F.col("last_scn")).alias("commit_scn"))
    )
    xs = cdc_xstream_fold(spark, SF_SMOKE).collect()
    plain = (
        materialize_latest(
            logminer_commit_ordered(redo, commits), ["user_id"], ["scn"]
        )
        .select("user_id", "value").orderBy("user_id").collect()
    )
    assert {(r.user_id, r.value) for r in xs} != \
        {(r.user_id, r.value) for r in plain}
    # and the engine-side LogMiner fold agrees with the XStream fold
    lm = (
        materialize_latest(
            logminer_commit_ordered(redo, commits),
            ["user_id"], ["__commit_scn", "scn"],
        )
        .select("user_id", "value").orderBy("user_id").collect()
    )
    assert [(r.user_id, r.value) for r in xs] == \
        [(r.user_id, r.value) for r in lm]


def test_log_mining_strategy_gate():
    """online_catalog refuses a mined range containing DDL against a
    CAPTURED table (decode corruption, not degradation); uncaptured
    DDL and out-of-range DDL pass; redo_log_catalog/hybrid always
    pass with ddl_tracking on."""
    import pytest

    from debezium_incubator_spark.cdc.oracle_logminer import (
        validate_mining_strategy,
    )

    ddls = [(150, "orders"), (300, "noise")]
    with pytest.raises(ValueError, match="online_catalog cannot decode"):
        validate_mining_strategy(
            "online_catalog", ddls, 100, 200, captured_tables=["orders"]
        )
    # out of range / uncaptured: fine
    ok = validate_mining_strategy(
        "online_catalog", ddls, 200, 400, captured_tables=["orders"]
    )
    assert ok["ddl_tracking"] is False and ok["ddl_in_range"] == []
    # boundary: scn == lo is OUTSIDE the (lo, hi] range
    assert validate_mining_strategy(
        "online_catalog", [(100, "orders")], 100, 200,
        captured_tables=["orders"],
    )["ddl_in_range"] == []
    for s in ("redo_log_catalog", "hybrid"):
        plan = validate_mining_strategy(
            s, ddls, 100, 400, captured_tables=["orders"]
        )
        assert plan["ddl_tracking"] is True
        assert plan["ddl_in_range"] == [(150, "orders")]
    with pytest.raises(ValueError, match="unsupported log.mining"):
        validate_mining_strategy("bogus", [], 0, 1)


def test_supplemental_logging_gate():
    import pytest

    from debezium_incubator_spark.cdc.oracle_logminer import (
        validate_supplemental_logging,
    )

    # database-level minimal logging off → refuse everything, with the
    # remediation DDL in the message
    with pytest.raises(ValueError, match="ALTER DATABASE ADD SUPPLEMENTAL"):
        validate_supplemental_logging(False, {"orders": "all"}, ["orders"])

    # captured table unconfigured → refuse, remediation names the table
    with pytest.raises(
        ValueError,
        match=r"ALTER TABLE customer ADD SUPPLEMENTAL LOG DATA \(ALL\)",
    ):
        validate_supplemental_logging(
            True, {"orders": "all"}, ["orders", "customer"]
        )

    # 'none' explicitly configured is the same refusal
    with pytest.raises(ValueError, match="not configured"):
        validate_supplemental_logging(
            True, {"orders": "none"}, ["orders"]
        )

    # unknown level is loud
    with pytest.raises(ValueError, match="unknown supplemental log level"):
        validate_supplemental_logging(
            True, {"orders": "bogus"}, ["orders"]
        )

    # pk-level tables are admitted but flagged for the LOB-style
    # partial-image inheritance fold; case-insensitive table match
    plan = validate_supplemental_logging(
        True, {"Orders": "ALL", "lineitem": "pk"},
        ["orders", "lineitem"],
    )
    assert plan["full_image"] == ["orders"]
    assert plan["needs_inheritance"] == ["lineitem"]

    # uncaptured tables' levels are irrelevant
    plan = validate_supplemental_logging(
        True, {"orders": "all", "ignored": "none"}, ["orders"]
    )
    assert plan == {"full_image": ["orders"], "needs_inheritance": []}


def test_pk_only_supplemental_logging_routes_through_inheritance(spark):
    """The L207 claim, run end-to-end: a PK-only-logged table's update
    redo carries placeholders for unchanged non-key columns (the same
    wire shape as unavailable LOBs). Routing the stream through
    `resolve_unavailable` on the columns the gate flags, then folding,
    must reproduce the state a FULL-image stream yields — including an
    explicit NULL write, which inheritance must preserve (not skip in
    favor of the older real value)."""
    from debezium_incubator_spark.cdc.materialize import (
        UNAVAILABLE_VALUE,
        materialize_latest,
        resolve_unavailable,
    )
    from debezium_incubator_spark.cdc.oracle_logminer import (
        validate_supplemental_logging,
    )

    plan = validate_supplemental_logging(
        True, {"orders": "pk"}, ["orders"]
    )
    assert plan["needs_inheritance"] == ["orders"]

    PH = UNAVAILABLE_VALUE
    # full-image truth: (key, pos, op, status, note)
    full = [
        (1, 1, "c", "new", "a"),
        (1, 2, "u", "paid", "a"),       # update touches status only
        (1, 3, "u", "paid", None),      # explicit NULL write of note
        (1, 4, "u", "shipped", None),   # later update; note stays NULL
        (2, 1, "c", "new", "x"),
        (2, 2, "d", None, None),
    ]
    # pk-only wire: unchanged non-key columns arrive as the placeholder
    pk_only = [
        (1, 1, "c", "new", "a"),
        (1, 2, "u", "paid", PH),
        (1, 3, "u", PH, None),
        (1, 4, "u", "shipped", PH),
        (2, 1, "c", "new", "x"),
        (2, 2, "d", None, None),
    ]
    schema = "k LONG, pos LONG, __op STRING, status STRING, note STRING"
    want = {
        (r["k"], r["status"], r["note"])
        for r in materialize_latest(
            spark.createDataFrame(full, schema), ["k"], ["pos"]
        ).collect()
    }
    wire = spark.createDataFrame(pk_only, schema)
    resolved = resolve_unavailable(
        wire, ["k"], ["pos"], ["status", "note"]
    )
    got = {
        (r["k"], r["status"], r["note"])
        for r in materialize_latest(resolved, ["k"], ["pos"]).collect()
    }
    assert got == want == {(1, "shipped", None)}

    # WITHOUT the inheritance fold the placeholder leaks into state —
    # the defect the gate's flag exists to prevent
    raw = {
        (r["k"], r["status"], r["note"])
        for r in materialize_latest(wire, ["k"], ["pos"]).collect()
    }
    assert raw == {(1, "shipped", PH)}
