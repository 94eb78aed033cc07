"""Oracle connector semantics — the archived repo's third connector
(`/root/reference/README.md:23`; reconstructed per SURVEY.md §0 from
the public debezium-connector-oracle LogMiner documentation).

The LogMiner path differs from a plain position-ordered log in one
load-bearing way: redo entries are read in SCN order, but a change
becomes VISIBLE only when its transaction commits, and the event order
consumers see is **(COMMIT_SCN, SCN)** — all changes of an earlier-
committing transaction precede all changes of a later-committing one,
even when their SCNs interleave; within a transaction the original SCN
order holds. Changes of in-flight (never-committed) transactions must
never be delivered at all (Debezium buffers them per-XID and discards
on ROLLBACK).

Spark mapping: the commit table (one row per committed XID) joins onto
the redo stream — an inner join both assigns the commit position AND
withholds in-flight/rolled-back work (no buffered state needed: the
batch twin sees the commit set declaratively). The fold then uses the
composite position (commit_scn, scn) with the SAME materialize_latest
every other connector path uses. Per micro-batch the commit side is one
row per transaction — broadcastable next to a 100 TB redo stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..registry import register
from .materialize import materialize_latest


def logminer_commit_ordered(
    redo: DataFrame,
    commits: DataFrame,
    xid_col: str = "xid",
    broadcast: bool = True,
) -> DataFrame:
    """Join redo entries to their transaction's commit record: committed
    changes gain ``__commit_scn`` (the fold's primary position), changes
    of transactions absent from ``commits`` (in-flight or rolled back)
    are withheld. ``commits``: one ``(xid, commit_scn)`` row per
    committed transaction.

    Scale caveat (``broadcast``): per POLL / micro-batch the commit side
    is open-txn-count-sized — genuinely broadcastable, the default. But
    this same function is the ONE-SHOT batch twin, where ``commits``
    holds every transaction of the WHOLE mined log — a side that grows
    with the data, unlike the bounded per-poll form in
    ``merge_logminer_buffer``. Whole-log callers must pass
    ``broadcast=False`` and let AQE pick the strategy (an explicit
    F.broadcast is a hint AQE cannot override; at 100× it OOMs the
    executors instead of degrading to a shuffle join)."""
    commit_side = commits.select(
        F.col(xid_col),
        F.col("commit_scn").alias("__commit_scn"),
    )
    if broadcast:
        commit_side = F.broadcast(commit_side)
    return redo.join(commit_side, xid_col)


@register(
    "cdc_logminer_commit_order",
    oracle="""
WITH redo AS (
  SELECT user_id, event_id AS scn, value,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
              WHEN 'view' THEN 'r' ELSE 'u' END AS op,
         event_id // 5 AS xid
  FROM events
), commits AS (
  -- odd transactions are long-running: they commit 1000 SCNs after
  -- their last entry, flipping commit order vs SCN order; every 97th
  -- transaction never commits (in-flight) and must be withheld
  SELECT xid,
         max(scn) + CASE WHEN xid % 2 = 1 THEN 1000 ELSE 0 END
           AS commit_scn
  FROM redo GROUP BY xid
  HAVING xid % 97 <> 0
), visible AS (
  SELECT r.user_id, r.scn, r.value, r.op, c.commit_scn
  FROM redo r JOIN commits c ON r.xid = c.xid
)
SELECT user_id, value FROM (
  SELECT user_id, value, op,
         row_number() OVER (
           PARTITION BY user_id ORDER BY commit_scn DESC, scn DESC
         ) AS rn
  FROM visible
) WHERE rn = 1 AND op <> 'd'
ORDER BY user_id
""",
)
def cdc_logminer_commit_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogMiner commit-order fold, differentially proven: events become
    redo entries grouped into transactions of 5 (xid = scn // 5); odd
    transactions commit 1000 SCNs late (so commit order genuinely
    DIFFERS from SCN order — a plain scn fold gives a different state),
    every 97th transaction never commits and is withheld. The engine
    joins redo to the broadcast commit set and folds by
    (commit_scn, scn); the oracle recomputes identically. Equality
    proves composite-position visibility semantics, not just a rename
    of the ordinary fold."""
    from .envelope import OP_CASE

    ev = table(spark, sf_dir, "events")
    redo = ev.select(
        "user_id",
        F.col("event_id").alias("scn"),
        "value",
        F.expr(OP_CASE).alias("__op"),
        (F.col("event_id") / 5).cast("long").alias("xid"),
    )
    commits = (
        redo.groupBy("xid")
        .agg(
            (
                F.max("scn")
                + F.when(F.col("xid") % 2 == 1, 1000).otherwise(0)
            ).alias("commit_scn")
        )
        .filter(F.col("xid") % 97 != 0)
    )
    # whole-log one-shot: commit side grows with the data -> no forced broadcast
    visible = logminer_commit_ordered(redo, commits, broadcast=False)
    state = materialize_latest(
        visible, ["user_id"], ["__commit_scn", "scn"]
    )
    return state.select("user_id", "value").orderBy("user_id")


# ---------------------------------------------------------------------------
# Partial rollback (ROLLBACK=1 redo entries): LogMiner's undo mechanic
# ---------------------------------------------------------------------------


def apply_partial_rollback(
    redo: DataFrame,
    txn_col: str = "xid",
    row_col: str = "row_id",
    pos_col: str | list[str] = "scn",
    rollback_col: str = "rollback",
) -> DataFrame:
    """Remove changes undone by LogMiner ``ROLLBACK=1`` entries.

    Oracle's redo log is physical: a rollback to savepoint (or a
    constraint-violation undo) does not erase prior entries — it APPENDS
    counter-entries flagged ``ROLLBACK=1``, each undoing one earlier
    change to the same ROWID within the same transaction. Public
    debezium-connector-oracle's transaction buffer removes the matched
    change on seeing the counter-entry; a fold that ignored the flag
    would deliver phantom changes the database itself never committed.

    Matching is LIFO per (transaction, rowid): a rollback entry cancels
    the most recent prior not-yet-cancelled change. That stack
    discipline is expressible in closed form with window functions —
    no stateful scan needed. Let y = +1 for a rollback entry, −1 for a
    change, T = the running sum of y in SCN order within
    (xid, rowid). A change at position p is cancelled iff
    ``max(T) over the rows AFTER p  >=  T(p) + 1`` — the classic
    bracket-matching characterization (a following suffix accumulates
    more undo than redo back to this entry's depth). Equivalence to the
    sequential stack fold is pinned by a hypothesis property over
    arbitrary op/rollback interleavings (tests/test_oracle_logminer.py).

    Returns the surviving CHANGE rows (rollback markers themselves are
    consumed). Scale: two window passes over the same
    (xid, rowid)-partitioned sort — ONE shuffle, no joins, no UDF;
    partition width is bounded by per-row churn within one transaction.

    PRECONDITION: ``pos_col`` must totally order entries within each
    (txn, rowid) group. Oracle's SCN alone is NOT unique per change —
    Debezium orders LogMiner rows by (SCN, RS_ID, SSN); pass the
    composite as a list (``pos_col=["scn", "rs_id", "ssn"]``) when the
    source can tie, or the running-sum order (hence which change a
    rollback cancels) is undefined.
    """
    pos_cols = [pos_col] if isinstance(pos_col, str) else list(pos_col)
    w_ord = W.partitionBy(txn_col, row_col).orderBy(*pos_cols)
    w_fol = w_ord.rowsBetween(1, W.unboundedFollowing)
    y = F.when(F.col(rollback_col) == 1, F.lit(1)).otherwise(F.lit(-1))
    depth = redo.withColumn("__t", F.sum(y).over(w_ord)).withColumn(
        "__m", F.max(F.col("__t")).over(w_fol)
    )
    return depth.filter(
        (F.col(rollback_col) == 0)
        & (F.col("__m").isNull() | (F.col("__m") < F.col("__t") + 1))
    ).drop("__t", "__m")


@register(
    "cdc_logminer_rollback",
    oracle="""
WITH redo AS (
  SELECT event_id AS scn, event_id // 5 AS xid, user_id % 3 AS row_id,
         value,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS rb
  FROM events
), t AS (
  SELECT *, sum(CASE WHEN rb = 1 THEN 1 ELSE -1 END) OVER (
           PARTITION BY xid, row_id ORDER BY scn) AS tt
  FROM redo
), m AS (
  SELECT *, max(tt) OVER (
           PARTITION BY xid, row_id ORDER BY scn
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mm
  FROM t
)
SELECT xid, row_id, scn, value FROM m
WHERE rb = 0 AND (mm IS NULL OR mm < tt + 1)
ORDER BY scn
""",
)
def cdc_logminer_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogMiner partial rollback, differentially proven: events become
    redo entries in transactions of 5 (xid = scn // 5) touching rowids
    user_id % 3 (so one transaction genuinely revisits a rowid);
    'error' events are ROLLBACK=1 counter-entries. The engine cancels
    LIFO-matched changes via the closed-form window test; the oracle
    recomputes the identical bracket-matching in SQL. Equality proves
    the undo semantics — surviving SCNs shift whenever a rollback lands
    after multiple changes to its rowid, which a flag-blind fold (or a
    FIFO matcher) gets wrong on this fixture."""
    ev = table(spark, sf_dir, "events")
    redo = ev.select(
        F.col("event_id").alias("scn"),
        (F.col("event_id") / 5).cast("long").alias("xid"),
        (F.col("user_id") % 3).alias("row_id"),
        "value",
        F.when(F.col("event_type") == "error", 1).otherwise(0)
        .alias("rollback"),
    )
    kept = apply_partial_rollback(redo)
    return kept.select("xid", "row_id", "scn", "value").orderBy("scn")


@register(
    "cdc_logminer_full_fold",
    oracle="""
WITH redo AS (
  SELECT user_id, event_id AS scn, value, event_id // 5 AS xid,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS rb
  FROM events
), t AS (
  SELECT *, sum(CASE WHEN rb = 1 THEN 1 ELSE -1 END) OVER (
           PARTITION BY xid, user_id ORDER BY scn) AS tt
  FROM redo
), m AS (
  SELECT *, max(tt) OVER (
           PARTITION BY xid, user_id ORDER BY scn
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mm
  FROM t
), kept AS (
  SELECT user_id, scn, value, xid FROM m
  WHERE rb = 0 AND (mm IS NULL OR mm < tt + 1)
), commits AS (
  SELECT xid, max(scn) + CASE WHEN xid % 2 = 1 THEN 1000 ELSE 0 END
           AS commit_scn
  FROM redo GROUP BY xid
  HAVING xid % 97 <> 0
), vis AS (
  SELECT k.user_id, k.scn, k.value, c.commit_scn
  FROM kept k JOIN commits c ON k.xid = c.xid
)
SELECT user_id, value FROM (
  SELECT user_id, value, row_number() OVER (
           PARTITION BY user_id ORDER BY commit_scn DESC, scn DESC) AS rn
  FROM vis
) WHERE rn = 1
ORDER BY user_id
""",
)
def cdc_logminer_full_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE LogMiner pipeline composed: partial-rollback
    filtering (ROLLBACK=1 counter-entries, LIFO per (xid, rowid)) →
    commit-visibility join (in-flight xids withheld, odd transactions
    commit late so commit order differs from SCN order) →
    (commit_scn, scn) fold to latest row state. One differential over
    the whole chain — the stages are the same functions the standalone
    queries audit, proven here to COMPOSE (rollback runs on the raw
    redo BEFORE visibility, as LogMiner's transaction buffer does; the
    commit set is computed over all entries, matching Oracle where a
    partial rollback does not move the commit record)."""
    ev = table(spark, sf_dir, "events")
    redo = ev.select(
        "user_id",
        F.col("event_id").alias("scn"),
        "value",
        (F.col("event_id") / 5).cast("long").alias("xid"),
        F.when(F.col("event_type") == "error", 1).otherwise(0)
        .alias("rollback"),
    )
    kept = apply_partial_rollback(redo, row_col="user_id")
    commits = (
        redo.groupBy("xid")
        .agg(
            (
                F.max("scn")
                + F.when(F.col("xid") % 2 == 1, 1000).otherwise(0)
            ).alias("commit_scn")
        )
        .filter(F.col("xid") % 97 != 0)
    )
    visible = logminer_commit_ordered(
        kept, commits, broadcast=False
    ).withColumn(
        "__op", F.lit("u")
    )
    state = materialize_latest(visible, ["user_id"], ["__commit_scn", "scn"])
    return state.select("user_id", "value").orderBy("user_id")


# ---------------------------------------------------------------------------
# Transaction buffer: the incremental (micro-batch) form of the pipeline
# ---------------------------------------------------------------------------


def merge_logminer_buffer(
    buffer: DataFrame | None,
    batch_redo: DataFrame,
    batch_commits: DataFrame,
    txn_col: str = "xid",
    row_col: str = "row_id",
    pos_col: str = "scn",
    rollback_col: str = "rollback",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch step of Debezium's LogMiner TRANSACTION BUFFER:
    redo entries are withheld per-XID until that transaction's commit
    record arrives, then released rollback-filtered and stamped with
    ``__commit_scn``.

    ``buffer`` — retained entries of still-open transactions (None on
    the first batch); ``batch_redo`` — this batch's raw redo entries
    (rollback markers included); ``batch_commits`` — ``(xid,
    commit_scn)`` commit records observed this batch. Returns
    ``(new_buffer, emitted)``:

    - entries whose xid committed in THIS batch are emitted —
      :func:`apply_partial_rollback` runs at emit time, which is exactly
      when it is safe: redo positions precede the commit record, so the
      transaction's entries are complete in (buffer ∪ batch);
    - everything else (in-flight xids) is the new buffer. A transaction
      that never commits stays buffered and is never delivered — the
      same discard-on-timeout surface Debezium exposes.

    Union of ``emitted`` across ANY batching of the stream equals the
    one-shot :func:`cdc_logminer_full_fold` visible set
    (equivalence-tested). Scale: the commit side is txn-count-sized and
    broadcast for both the emit join and the anti-join; buffer size is
    O(open-transaction entries) — Oracle's own UNDO bound, not the
    stream's length."""
    all_redo = (
        batch_redo if buffer is None
        else buffer.unionByName(batch_redo)
    )
    commits = F.broadcast(batch_commits.select(
        F.col(txn_col),
        F.col("commit_scn").alias("__commit_scn"),
    ))
    emitted_raw = all_redo.join(commits, txn_col)
    new_buffer = all_redo.join(commits.select(txn_col), txn_col, "left_anti")
    emitted = apply_partial_rollback(
        emitted_raw, txn_col, row_col, pos_col, rollback_col
    )
    return new_buffer, emitted


# ---------------------------------------------------------------------------
# RAC multi-node redo threads (public Debezium `rac.nodes`)
# ---------------------------------------------------------------------------


def merge_rac_threads(
    threads: list[tuple[DataFrame, int]],
    scn_col: str = "scn",
) -> tuple[DataFrame, DataFrame, int]:
    """Oracle RAC: each cluster node writes its OWN redo thread, mined
    independently, while SCNs are cluster-global. A merged reader may
    only emit changes up to ``min`` of the per-thread high-water SCNs —
    past that horizon a lagging node can still surface a LOWER-SCN
    entry, and emitting early would deliver out of order (public
    Debezium's multi-node resume position is exactly this min).

    ``threads``: ``(redo_frame, high_water_scn)`` per node, the
    high-water being the SCN that node has been READ to this poll.
    Returns ``(emittable, withheld, watermark)``: the union split at
    ``watermark = min(high_waters)``; ``withheld`` rows must be
    re-presented next poll. A row above its OWN node's claimed
    high-water means the poll lied about its read position — that
    raises at execution time rather than silently re-ordering.

    Scale: the split is two pushed scan predicates over the union —
    no shuffle, no state; the watermark is driver-side arithmetic over
    node-count integers. A transaction's redo lives on one node in RAC,
    so no cross-thread reassembly is needed; the commit join downstream
    is unchanged."""
    if not threads:
        raise ValueError("merge_rac_threads: no threads")
    watermark = min(hw for _, hw in threads)
    merged: DataFrame | None = None
    for df, hw in threads:
        scn = F.col(scn_col)
        checked = df.withColumn(
            scn_col,
            F.when(scn <= F.lit(hw), scn).otherwise(
                F.raise_error(F.concat(
                    F.lit("redo entry at SCN "), scn.cast("string"),
                    F.lit(f" beyond its node's claimed high-water {hw}"),
                ))
            ),
        )
        merged = checked if merged is None else merged.unionByName(checked)
    emittable = merged.filter(F.col(scn_col) <= F.lit(watermark))
    withheld = merged.filter(F.col(scn_col) > F.lit(watermark))
    return emittable, withheld, watermark


#: RAC fixture: node 1 lags — it has only been read to SCN 600.
RAC_LAG_HW = 600


@register(
    "cdc_logminer_rac_merge",
    oracle="""
WITH redo AS (
  SELECT user_id, event_id AS scn, value,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
              WHEN 'view' THEN 'r' ELSE 'u' END AS op,
         event_id // 5 AS xid
  FROM events
), commits AS (
  SELECT xid,
         max(scn) + CASE WHEN xid % 2 = 1 THEN 1000 ELSE 0 END
           AS commit_scn
  FROM redo GROUP BY xid
  HAVING xid % 97 <> 0
), visible AS (
  SELECT r.user_id, r.scn, r.value, r.op, c.commit_scn
  FROM redo r JOIN commits c ON r.xid = c.xid
  WHERE r.scn <= 600 AND c.commit_scn <= 600
)
SELECT user_id, value FROM (
  SELECT user_id, value, op,
         row_number() OVER (
           PARTITION BY user_id ORDER BY commit_scn DESC, scn DESC
         ) AS rn
  FROM visible
) WHERE rn = 1 AND op <> 'd'
ORDER BY user_id
""",
)
def cdc_logminer_rac_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAC two-node merge at a lagging watermark, differentially
    proven: transactions land on node xid%2 (a transaction's redo
    stays on one node, as in real RAC), node 0 is fully caught up
    while node 1 has only been read to SCN 600 — so the emittable
    horizon is 600 for BOTH nodes, and the commit horizon cuts with
    it (a commit record past the watermark is itself unreadable redo:
    odd transactions committing +1000 late fall out even when their
    changes are below 600). The oracle recomputes the doubly-cut
    visible set and its fold; equality proves the min-watermark is
    applied to data AND commit visibility, not just rows."""
    from .envelope import OP_CASE

    ev = table(spark, sf_dir, "events")
    redo = ev.select(
        "user_id",
        F.col("event_id").alias("scn"),
        "value",
        F.expr(OP_CASE).alias("__op"),
        (F.col("event_id") / 5).cast("long").alias("xid"),
    )
    commits = (
        redo.groupBy("xid")
        .agg(
            (
                F.max("scn")
                + F.when(F.col("xid") % 2 == 1, 1000).otherwise(0)
            ).alias("commit_scn")
        )
        .filter(F.col("xid") % 97 != 0)
    )
    node0 = redo.filter(F.col("xid") % 2 == 0)
    # node 1 lags: it has not READ past SCN 600 yet
    node1 = redo.filter(
        (F.col("xid") % 2 == 1) & (F.col("scn") <= RAC_LAG_HW)
    )
    emittable, _withheld, wm = merge_rac_threads(
        [(node0, 2_000_000_000), (node1, RAC_LAG_HW)]
    )
    visible = logminer_commit_ordered(
        emittable,
        commits.filter(F.col("commit_scn") <= F.lit(wm)),
        broadcast=False,
    )
    state = materialize_latest(
        visible, ["user_id"], ["__commit_scn", "scn"]
    )
    return state.select("user_id", "value").orderBy("user_id")


# ---------------------------------------------------------------------------
# XStream adapter (public Debezium `database.connection.adapter=xstream`)
# ---------------------------------------------------------------------------


def xstream_lcrs(
    redo: DataFrame,
    commits: DataFrame,
    xid_col: str = "xid",
    broadcast: bool = True,
) -> DataFrame:
    """Model the XStream Out delivery: the Oracle server hands Debezium
    Logical Change Records ALREADY in commit order — in-flight
    transactions never appear, each LCR carries its transaction's
    commit position plus a within-transaction statement sequence, and
    the connector's resume position is a single byte-comparable blob.

    Construction from the same redo/commit model LogMiner uses:
    committed entries (the same broadcast commit join — absence IS the
    withholding), ``sequence`` = statement order within the
    transaction (row_number over scn), and ``position`` = fixed-width
    hex ``commit_scn`` ‖ ``sequence`` — lexicographic order equals
    numeric (commit_scn, sequence) order, the Db2 position-vector
    trick applied to XStream's opaque position blob.

    Equivalence to the LogMiner fold (proven by `cdc_xstream_fold`'s
    oracle, which folds in LogMiner (commit_scn, scn) order): when
    commit SCNs are unique per transaction, ordering by
    (commit_scn, sequence) and by (commit_scn, scn) induce the same
    total order — blocks sort by commit_scn either way, and within a
    transaction sequence is scn-monotonic by construction."""
    joined = logminer_commit_ordered(redo, commits, xid_col, broadcast=broadcast)
    w = W.partitionBy(xid_col).orderBy("scn")
    return (
        joined.withColumn("sequence", F.row_number().over(w))
        .withColumn(
            "position",
            F.concat(
                F.lpad(F.hex(F.col("__commit_scn")), 16, "0"),
                F.lpad(F.hex(F.col("sequence")), 8, "0"),
            ),
        )
    )


@register(
    "cdc_xstream_fold",
    oracle="""
WITH redo AS (
  SELECT user_id, event_id AS scn, value,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
              WHEN 'view' THEN 'r' ELSE 'u' END AS op,
         event_id // 5 AS xid
  FROM events
), gm AS (
  SELECT max(event_id) AS gmax FROM events
), commits AS (
  -- odd transactions commit after EVERY even one (gmax + xid keeps
  -- commit SCNs unique — the precondition for LCR-order equivalence);
  -- every 97th transaction never commits and must be withheld
  SELECT xid,
         CASE WHEN xid % 2 = 1 THEN gm.gmax + xid
              ELSE max(scn) END AS commit_scn
  FROM redo, gm GROUP BY xid, gm.gmax
  HAVING xid % 97 <> 0
), visible AS (
  SELECT r.user_id, r.scn, r.value, r.op, c.commit_scn
  FROM redo r JOIN commits c ON r.xid = c.xid
)
SELECT user_id, value FROM (
  SELECT user_id, value, op,
         row_number() OVER (
           PARTITION BY user_id ORDER BY commit_scn DESC, scn DESC
         ) AS rn
  FROM visible
) WHERE rn = 1 AND op <> 'd'
ORDER BY user_id
""",
)
def cdc_xstream_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Oracle connector's SECOND adapter, differentially proven:
    the engine folds the XStream LCR stream by its byte-comparable
    position (fixed-width hex commit_scn ‖ sequence), while the ORACLE
    folds the same log in LogMiner (commit_scn, scn) order — hash
    parity IS the proof that the two adapters' visibility semantics
    coincide, which is exactly the public contract (adapter choice
    must not change the materialized state).

    Fixture: transactions of 5; odd transactions commit after every
    even one (commit_scn = global-max-SCN + xid — unique per
    transaction, the equivalence precondition), every 97th transaction
    stays in flight and is withheld. Commit order genuinely differs
    from SCN order, so a plain scn fold gives a different state
    (pinned by test).

    Scale: one commit join (AQE-chosen strategy; whole-log commit side
    so no forced broadcast) + ONE per-transaction window for
    sequence numbers (partitioned by xid — transaction-sized, never
    global) + the usual per-key fold. The global-max scalar is a
    one-row broadcast."""
    from .envelope import OP_CASE

    ev = table(spark, sf_dir, "events")
    redo = ev.select(
        "user_id",
        F.col("event_id").alias("scn"),
        "value",
        F.expr(OP_CASE).alias("__op"),
        (F.col("event_id") / 5).cast("long").alias("xid"),
    )
    gmax = redo.agg(F.max("scn").alias("gmax"))
    commits = (
        redo.groupBy("xid")
        .agg(F.max("scn").alias("last_scn"))
        .filter(F.col("xid") % 97 != 0)
        .crossJoin(F.broadcast(gmax))
        .select(
            "xid",
            F.when(
                F.col("xid") % 2 == 1, F.col("gmax") + F.col("xid")
            ).otherwise(F.col("last_scn")).alias("commit_scn"),
        )
    )
    # whole-log one-shot: commit side grows with the data -> no forced broadcast
    lcrs = xstream_lcrs(redo, commits, broadcast=False)
    state = materialize_latest(lcrs, ["user_id"], ["position"])
    return state.select("user_id", "value").orderBy("user_id")


# ---------------------------------------------------------------------------
# log.mining.strategy (public Debezium Oracle connector config)
# ---------------------------------------------------------------------------

LOG_MINING_STRATEGIES = ("redo_log_catalog", "online_catalog", "hybrid")


def validate_mining_strategy(
    strategy: str,
    ddl_positions: list[tuple[int, str]],
    lo: int,
    hi: int,
    captured_tables: list[str] | None = None,
) -> dict:
    """``log.mining.strategy`` semantics as a decode-plan gate.

    - ``redo_log_catalog`` (default): the data dictionary is written
      INTO the redo log, so LogMiner can decode every row against the
      schema current at its SCN — DDL against captured tables
      mid-stream is supported (the schema-history replay path).
    - ``online_catalog``: faster (no dictionary extraction), but rows
      are decoded against the CURRENT catalog — a DDL against a
      captured table inside the mined range means rows before it
      would silently decode against the post-DDL shape. That is data
      corruption, not a degraded mode: this gate REFUSES the range.
    - ``hybrid``: online catalog for speed, DDL tracked via the schema
      history — supported, like redo_log_catalog.

    ``ddl_positions``: ``(scn, table)`` per DDL seen in the redo;
    the mined range is ``(lo, hi]``. Control-plane: runs driver-side
    on DDL-count-sized input before any scan is planned."""
    if strategy not in LOG_MINING_STRATEGIES:
        raise ValueError(
            f"unsupported log.mining.strategy '{strategy}' "
            f"(one of {LOG_MINING_STRATEGIES})"
        )
    captured = (
        None if captured_tables is None
        else {t.lower() for t in captured_tables}
    )
    in_range = [
        (scn, tbl) for scn, tbl in ddl_positions
        if lo < scn <= hi and (captured is None or tbl.lower() in captured)
    ]
    if strategy == "online_catalog" and in_range:
        scn, tbl = in_range[0]
        raise ValueError(
            f"log.mining.strategy=online_catalog cannot decode across "
            f"a schema change: DDL against captured table '{tbl}' at "
            f"SCN {scn} falls inside the mined range ({lo}, {hi}] — "
            f"rows before it would silently decode against the "
            f"post-DDL catalog; use redo_log_catalog or hybrid"
        )
    return {
        "strategy": strategy,
        "dictionary": "redo" if strategy == "redo_log_catalog"
        else "online",
        "ddl_tracking": strategy != "online_catalog",
        "ddl_in_range": in_range,
    }


# ---------------------------------------------------------------------------
# Supplemental logging prerequisite (public Debezium Oracle connector
# requirement: the connector VALIDATES it at startup and refuses with
# the remediation DDL — without supplemental log data the redo stream
# simply does not carry the columns CDC needs)
# ---------------------------------------------------------------------------

#: per-table supplemental log-group levels (Oracle's own tiers)
SUPPLOG_LEVELS = ("none", "pk", "all")


def validate_supplemental_logging(
    db_minimal: bool,
    table_levels: dict[str, str],
    captured_tables: list[str],
) -> dict:
    """Start-up prerequisite check, Debezium-Oracle-shaped.

    - ``db_minimal`` models ``ALTER DATABASE ADD SUPPLEMENTAL LOG
      DATA`` (minimal database-level logging): without it redo records
      carry no usable row identification at all — refuse everything,
      with the remediation DDL in the message (the connector's actual
      behavior).
    - per captured table, the log-group level:
      ``all`` (``... ADD SUPPLEMENTAL LOG DATA (ALL) COLUMNS``) →
      update redo carries the FULL row image — the level Debezium
      documents as required for complete events;
      ``pk`` (``... (PRIMARY KEY) COLUMNS``) → updates carry only the
      key + changed columns: unchanged columns arrive as placeholders,
      the SAME partial-image shape as unavailable LOBs, so these
      tables MUST route through the `resolve_unavailable` inheritance
      fold (materialize.py) or state silently nulls out — the
      returned plan lists them under ``needs_inheritance``;
      ``none`` / unconfigured → refuse with the per-table remediation
      DDL.

    Control-plane: dict-sized input, runs before any scan is planned.
    """
    if not db_minimal:
        raise ValueError(
            "supplemental logging not enabled at the database level; "
            "CDC cannot run. Remediation: ALTER DATABASE ADD "
            "SUPPLEMENTAL LOG DATA"
        )
    levels = {t.lower(): lv.lower() for t, lv in table_levels.items()}
    for lv in levels.values():
        if lv not in SUPPLOG_LEVELS:
            raise ValueError(
                f"unknown supplemental log level '{lv}' "
                f"(one of {SUPPLOG_LEVELS})"
            )
    full, needs_inheritance, missing = [], [], []
    for t in captured_tables:
        lv = levels.get(t.lower(), "none")
        if lv == "all":
            full.append(t)
        elif lv == "pk":
            needs_inheritance.append(t)
        else:
            missing.append(t)
    if missing:
        ddl = "; ".join(
            f"ALTER TABLE {t} ADD SUPPLEMENTAL LOG DATA (ALL) COLUMNS"
            for t in missing
        )
        raise ValueError(
            f"supplemental logging not configured for captured "
            f"table(s) {missing}; update events would carry no "
            f"before-image columns. Remediation: {ddl}"
        )
    return {
        "full_image": full,
        "needs_inheritance": needs_inheritance,
    }
