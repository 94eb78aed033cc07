"""Cassandra connector semantics — the data model of the archived
repo's first connector (`/root/reference/README.md:21`; no source
survives there, semantics reconstructed per SURVEY.md §0 from the
public debezium-connector-cassandra documentation and Cassandra's own
storage model).

Cassandra CDC differs from the relational connectors in ways that make
ROW-level fold semantics (materialize_latest) actively WRONG:

- **No before-images.** The commitlog carries only what was written;
  an UPDATE event holds just the touched cells. A row-LWW fold applied
  to such partial images would null out every untouched column.
- **Cell-level last-write-wins.** Every cell carries its own writetime;
  the current row is assembled per-COLUMN (the latest surviving cell of
  each column), not per-row. Concurrent writers touching different
  columns of one key both win.
- **Tombstones shadow by timestamp, not arrival order.** A partition
  delete at timestamp D hides cells with ts <= D — including cells that
  ARRIVE later (out-of-order delivery), while a WRITE stamped later
  than D resurrects the column. Delivery order must not matter.
- **TTL.** A cell with a TTL is visible only until ts + ttl; expiry is
  evaluated against the read position, not by any background job.

Spark mapping: events arrive as (key, cells: map<col, {v, ts, ttl}>,
op). The fold explodes cells (map-side), takes per-(key, column) the
max-(ts, v) cell — Cassandra's documented tie-break is the higher cell
value — filtered by the partition-tombstone watermark and TTL. One
shuffle on (key, column); the per-column winner uses the same
WindowGroupLimit-friendly row_number pattern as every top-1 in this
engine. All expression-level, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import spread, table
from ..registry import register

OP_WRITE = "w"
OP_PARTITION_DELETE = "d"


def fold_cassandra_cells(
    changes: DataFrame,
    key_cols: list[str],
    as_of: int | None = None,
    cells_col: str = "cells",
    op_col: str = "op",
    ts_col: str = "ts",
    tomb_cols: list[str] | None = None,
    drop_cell_tombstones: bool = True,
) -> DataFrame:
    """Assemble current row state from cell-level change events.

    ``changes`` rows: key columns + ``op`` ('w' write / 'd' partition
    delete) + ``ts`` (the event's own timestamp — used as the tombstone
    watermark for deletes) + ``cells`` (map<column, struct<v, ts, ttl>>,
    empty/NULL for deletes).

    Returns long form ``(key..., column, v)`` — one row per surviving
    cell. Semantics, in order:

    1. partition tombstone: per key, D = max ts over delete events;
       cells with ``ts <= D`` are shadowed (arrival order irrelevant);
    2. TTL: a cell with non-null ttl is visible iff ``ts + ttl > as_of``
       (``as_of`` defaults to the max event ts — "state as of the head");
    3. cell LWW: per (key, column), the surviving cell with the highest
       (ts, v) wins — the v tie-break is Cassandra's documented rule for
       identical writetimes.

    ``tomb_cols`` (default = ``key_cols``) sets the tombstone SCOPE:
    a table whose cells are keyed (pk, ck) but whose deletes are
    partition-level passes ``tomb_cols=[pk]`` so one tombstone shadows
    every clustering row of the partition (the static-columns query
    exercises this).

    CELL tombstones (single-column deletes — ``DELETE col FROM t``):
    a cell whose ``v`` is NULL deletes the column at its writetime. It
    competes in the per-column LWW like any cell, WINNING an
    equal-writetime tie against a value cell (Cassandra's
    delete-beats-write rule, same as the collection fold), and a
    winning tombstone makes the column ABSENT from the assembled row
    (``drop_cell_tombstones=True``, the read semantics; pass False to
    retain winners for state-merge callers where the tombstone must
    keep shadowing later-arriving lower-ts cells).
    """
    if tomb_cols is None:
        tomb_cols = key_cols
    keys = [F.col(k) for k in key_cols]
    writes = changes.filter(F.col(op_col) == OP_WRITE)
    deletes = changes.filter(F.col(op_col) == OP_PARTITION_DELETE)

    if as_of is None:
        as_of = changes.agg(F.max(ts_col)).first()[0]  # control-plane

    cells = writes.select(
        *keys, F.explode(cells_col).alias("column", "cell")
    ).select(
        *key_cols,
        "column",
        F.col("cell.v").alias("v"),
        F.col("cell.ts").alias("cell_ts"),
        F.col("cell.ttl").alias("ttl"),
    )
    # partition-tombstone watermark per tombstone scope; broadcast —
    # deletes are a sliver of any real change stream
    tomb = deletes.groupBy(*tomb_cols).agg(F.max(ts_col).alias("del_ts"))
    cells = cells.join(F.broadcast(tomb), tomb_cols, "left").filter(
        F.col("del_ts").isNull() | (F.col("cell_ts") > F.col("del_ts"))
    )
    cells = cells.filter(
        F.col("ttl").isNull() | (F.col("cell_ts") + F.col("ttl") > F.lit(as_of))
    )
    w = W.partitionBy(*key_cols, "column").orderBy(
        F.desc("cell_ts"), F.col("v").isNotNull().asc(), F.desc("v")
    )
    out = (
        cells.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*key_cols, "column", "v")
    )
    if drop_cell_tombstones:
        out = out.filter(F.col("v").isNotNull())
    return out


def merge_cassandra_cells(
    cells: DataFrame | None,
    tombs: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    cells_col: str = "cells",
    op_col: str = "op",
    ts_col: str = "ts",
) -> tuple[DataFrame, DataFrame]:
    """Incremental (micro-batch) form of the cell fold: merge one batch
    of cell events into persisted state, returning the new
    ``(cells, tombs)`` pair.

    State is TWO small-schema frames, exactly what Cassandra itself
    keeps: surviving cells long-form ``(key..., column, v, cell_ts,
    ttl)`` and the per-key tombstone watermark ``(key..., del_ts)``.
    The watermark must be RETAINED (Cassandra's gc_grace idea): a
    late-arriving cell stamped below an old tombstone must stay
    shadowed in whatever batch it arrives — dropping the tombstone
    after applying it would let that cell resurrect.

    TTL is NOT applied here: expiry depends on the READ position, so it
    belongs to :func:`read_cassandra_state`. The merge keeps only the
    max-(ts, v) cell per (key, column) — state stays O(live cells)
    regardless of update volume.

    Sequential merges over any batching of a stream equal the one-shot
    :func:`fold_cassandra_cells` (equivalence-tested, out-of-order
    deliveries included)."""
    keys = [F.col(k) for k in key_cols]
    writes = batch.filter(F.col(op_col) == OP_WRITE)
    b_cells = writes.select(
        *keys, F.explode(cells_col).alias("column", "cell")
    ).select(
        *key_cols,
        "column",
        F.col("cell.v").alias("v"),
        F.col("cell.ts").alias("cell_ts"),
        F.col("cell.ttl").alias("ttl"),
    )
    b_tombs = (
        batch.filter(F.col(op_col) == OP_PARTITION_DELETE)
        .groupBy(*key_cols)
        .agg(F.max(ts_col).alias("del_ts"))
    )
    new_tombs = (
        b_tombs if tombs is None
        else tombs.unionByName(b_tombs)
        .groupBy(*key_cols)
        .agg(F.max("del_ts").alias("del_ts"))
    )
    all_cells = b_cells if cells is None else cells.unionByName(b_cells)
    live = all_cells.join(F.broadcast(new_tombs), key_cols, "left").filter(
        F.col("del_ts").isNull() | (F.col("cell_ts") > F.col("del_ts"))
    ).drop("del_ts")
    # tie order matches the one-shot fold: cell tombstones (NULL v)
    # beat value writes at equal writetime. NULL winners are RETAINED
    # in state — the cell tombstone must keep shadowing lower-ts cells
    # arriving in later batches; the read path drops them.
    w = W.partitionBy(*key_cols, "column").orderBy(
        F.desc("cell_ts"), F.col("v").isNotNull().asc(), F.desc("v")
    )
    new_cells = (
        live.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return new_cells, new_tombs


def read_cassandra_state(
    cells: DataFrame, as_of: int, key_cols: list[str]
) -> DataFrame:
    """Current row state from merged cell state at read position
    ``as_of``: TTL expiry applied here (it is a property of WHEN you
    read, not of the merge), and cell-tombstone winners (NULL ``v`` —
    retained in state so they keep shadowing) read as ABSENT."""
    return cells.filter(
        (F.col("ttl").isNull() | (F.col("cell_ts") + F.col("ttl") > as_of))
        & F.col("v").isNotNull()
    ).select(*key_cols, "column", "v")


CASSANDRA_TTL = 400  # fixture TTL (positions); production: seconds


@register(
    "cdc_cassandra_cell_lww",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id AS ts, value, event_type,
         CASE WHEN event_type = 'error' THEN 'd' ELSE 'w' END AS op
  FROM events
), head AS (
  SELECT max(ts) AS as_of FROM ev
), cells AS (
  -- column 'v': written by every non-delete event, no TTL
  SELECT user_id, 'v' AS column, value AS v, ts,
         CAST(NULL AS BIGINT) AS ttl
  FROM ev WHERE op = 'w'
  UNION ALL
  -- column 'w': written when event_id % 3 = 0, value doubled
  SELECT user_id, 'w' AS column, value * 2 AS v, ts,
         CAST(NULL AS BIGINT) AS ttl
  FROM ev WHERE op = 'w' AND ts % 3 = 0
  UNION ALL
  -- column 's': 'view' events only, TTL'd (session-style column)
  SELECT user_id, 's' AS column, value AS v, ts,
         CAST({CASSANDRA_TTL} AS BIGINT) AS ttl
  FROM ev WHERE op = 'w' AND event_type = 'view'
), tomb AS (
  SELECT user_id, max(ts) AS del_ts FROM ev WHERE op = 'd'
  GROUP BY user_id
), live AS (
  SELECT c.user_id, c.column, c.v, c.ts
  FROM cells c
  LEFT JOIN tomb t ON c.user_id = t.user_id
  CROSS JOIN head
  WHERE (t.del_ts IS NULL OR c.ts > t.del_ts)
    AND (c.ttl IS NULL OR c.ts + c.ttl > head.as_of)
)
SELECT user_id, "column", v FROM (
  SELECT user_id, "column", v,
         row_number() OVER (
           PARTITION BY user_id, "column" ORDER BY ts DESC, v DESC
         ) AS rn
  FROM live
) WHERE rn = 1
ORDER BY user_id, "column"
""",
)
def cdc_cassandra_cell_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cassandra cell-level LWW materialization, differentially proven:
    events synthesize a cell-structured change stream (three columns
    with different write patterns — one always-written, one sparse, one
    TTL'd — plus 'error' events as partition tombstones), the engine
    folds it with fold_cassandra_cells, and the oracle recomputes the
    per-column arg-max with tombstone shadowing and TTL expiry in plain
    SQL. Equality proves the CELL semantics: a later sparse write must
    NOT null the untouched columns (row-LWW would), tombstones shadow
    by timestamp, TTL'd cells expire against the head position."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("ts"),
        "value",
        "event_type",
        F.when(F.col("event_type") == "error", OP_PARTITION_DELETE)
        .otherwise(OP_WRITE)
        .alias("op"),
    )
    cell = lambda v, ts, ttl: F.struct(  # noqa: E731
        v.alias("v"), ts.cast("long").alias("ts"),
        ttl.cast("long").alias("ttl"),
    )
    null_l = F.lit(None).cast("long")
    changes = ev.withColumn(
        "cells",
        F.when(
            F.col("op") == OP_WRITE,
            F.map_filter(
                F.map_from_arrays(
                    F.array(F.lit("v"), F.lit("w"), F.lit("s")),
                    F.array(
                        cell(F.col("value"), F.col("ts"), null_l),
                        F.when(
                            F.col("ts") % 3 == 0,
                            cell(F.col("value") * 2, F.col("ts"), null_l),
                        ),
                        F.when(
                            F.col("event_type") == "view",
                            cell(F.col("value"), F.col("ts"),
                                 F.lit(CASSANDRA_TTL)),
                        ),
                    ),
                ),
                lambda _, c: c.isNotNull(),
            ),
        ),
    )
    state = fold_cassandra_cells(changes, ["user_id"])
    return state.orderBy("user_id", "column")


# ---------------------------------------------------------------------------
# Range tombstones (clustering-key ranges): Cassandra's third delete form
# ---------------------------------------------------------------------------


def shadow_range_tombstones(
    cells: DataFrame,
    tombs: DataFrame,
    pk_col: str = "pk",
    ck_col: str = "ck",
    ts_col: str = "cell_ts",
) -> DataFrame:
    """Cassandra RANGE tombstones: a delete of a clustering-key range
    within one partition (``DELETE ... WHERE pk=? AND ck >= ? AND ck
    <= ?``) shadows every cell whose clustering key falls in the range
    AND whose timestamp is <= the tombstone's — later writes into the
    range resurrect, exactly like partition tombstones but scoped by
    the interval.

    ``cells``: long-form cell rows carrying ``(pk, ck, ..., cell_ts)``;
    ``tombs``: ``(pk, lo, hi, ts)`` inclusive ranges. A cell can match
    SEVERAL overlapping tombstones — the binding one is the max-ts
    match, computed by a broadcast range join (tombstones are a sliver
    of any real stream) + per-cell max aggregation. Returns the
    surviving cells (all input columns, tombstone columns dropped).

    Scale: the range join is tombstone-side broadcast — the cell side
    never shuffles for shadowing; the per-cell max is a map-side-
    combining aggregate on the cell's own identity columns."""
    cell_cols = cells.columns
    joined = cells.join(
        F.broadcast(tombs.select(
            F.col(pk_col),
            F.col("lo"), F.col("hi"),
            F.col("ts").alias("__tomb_ts"),
        )),
        on=[
            cells[pk_col] == tombs[pk_col],
            F.col(ck_col) >= F.col("lo"),
            F.col(ck_col) <= F.col("hi"),
        ],
        how="left",
    ).drop(tombs[pk_col]).drop("lo", "hi")
    shadowed = joined.groupBy(*cell_cols).agg(
        F.max("__tomb_ts").alias("__del_ts")
    )
    return shadowed.filter(
        F.col("__del_ts").isNull() | (F.col(ts_col) > F.col("__del_ts"))
    ).drop("__del_ts")


@register(
    "cdc_cassandra_range_tombstone",
    oracle="""
WITH cells AS (
  SELECT user_id % 10 AS pk, user_id AS ck, value AS v, event_id AS ts
  FROM events WHERE event_type <> 'error'
), tombs AS (
  SELECT user_id % 10 AS pk, user_id - 2 AS lo, user_id + 2 AS hi,
         event_id AS ts
  FROM events WHERE event_type = 'error'
), shadow AS (
  SELECT c.pk, c.ck, c.v, c.ts,
         (SELECT max(t.ts) FROM tombs t
          WHERE t.pk = c.pk AND c.ck BETWEEN t.lo AND t.hi) AS del_ts
  FROM cells c
), live AS (
  SELECT pk, ck, v, ts FROM shadow
  WHERE del_ts IS NULL OR ts > del_ts
)
SELECT pk, ck, v FROM (
  SELECT pk, ck, v,
         row_number() OVER (
           PARTITION BY pk, ck ORDER BY ts DESC, v DESC
         ) AS rn
  FROM live
) WHERE rn = 1
ORDER BY pk, ck
""",
)
def cdc_cassandra_range_tombstone(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range-tombstone shadowing, differentially proven: events become
    clustered rows (partition = user_id%10, clustering = user_id);
    'error' events become range tombstones over [user_id−2, user_id+2]
    in their partition. The engine shadows via the broadcast range join
    + per-cell max-tombstone aggregate, then folds LWW per (pk, ck);
    the oracle recomputes with a correlated max subquery. Equality
    proves interval-scoped, timestamp-ordered shadowing with
    resurrection — on real data where tombstone ranges overlap."""
    ev = table(spark, sf_dir, "events")
    # round-13: the broadcast range join + per-cell max-tombstone agg
    # ran on the scan's ONE split (1-task 2.0 s stage); spread() the
    # cells side (stream side of the broadcast join) — no-op at
    # production split counts (guide §2.5).
    cells = spread(ev.filter(F.col("event_type") != "error")).select(
        (F.col("user_id") % 10).alias("pk"),
        F.col("user_id").alias("ck"),
        F.col("value").alias("v"),
        F.col("event_id").alias("cell_ts"),
    )
    tombs = ev.filter(F.col("event_type") == "error").select(
        (F.col("user_id") % 10).alias("pk"),
        (F.col("user_id") - 2).alias("lo"),
        (F.col("user_id") + 2).alias("hi"),
        F.col("event_id").alias("ts"),
    )
    live = shadow_range_tombstones(cells, tombs)
    w = W.partitionBy("pk", "ck").orderBy(F.desc("cell_ts"), F.desc("v"))
    return (
        live.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("pk", "ck", "v")
        .orderBy("pk", "ck")
    )


# ---------------------------------------------------------------------------
# Non-frozen collections: element cells, element tombstones, and the
# collection-overwrite tombstone (Cassandra's fourth delete form)
# ---------------------------------------------------------------------------


def fold_cassandra_collection_cells(
    elem_cells: DataFrame,
    coll_tombs: DataFrame,
    key_cols: list[str],
    column_col: str = "column",
    path_col: str = "path",
    ts_col: str = "cell_ts",
    v_col: str = "v",
    broadcast_tombs: bool = True,
) -> DataFrame:
    """Assemble the current contents of non-frozen collection columns
    (map / set / list) from element-level cell events.

    Cassandra stores a non-frozen collection as one cell PER ELEMENT,
    keyed by the cell path (map key / set element / list timeuuid), each
    with its own writetime — an ``UPDATE t SET m['k'] = v`` touches one
    cell, and the commitlog (hence the CDC stream) carries exactly that.
    Three delete forms interact:

    - **element tombstone** (``DELETE m['k'] ...``): a cell whose value
      is NULL — it competes in per-path LWW and, when it wins, the
      element is absent from the assembled collection;
    - **collection overwrite** (``SET m = {...}``): Cassandra plants a
      collection-level range tombstone stamped ``write_ts - 1`` and
      inserts the new element cells at ``write_ts`` — the off-by-one is
      the documented trick that lets the overwrite's OWN elements
      survive its own tombstone while every older element is shadowed;
    - at EQUAL writetime a delete beats a write (NULLS FIRST in the
      descending value tie-break below); between two live writes the
      higher value wins, as for regular cells.

    ``elem_cells``: long form ``(key..., column, path, v, cell_ts)``
    with ``v`` NULL for element tombstones. ``coll_tombs``:
    ``(key..., column, del_ts)`` collection tombstones (already stamped
    ``write_ts - 1`` by the producer). Returns surviving elements
    ``(key..., column, path, v)``.

    Scale: the tombstone side aggregates to one row per tombstoned
    (key, column); element cells shuffle ONCE on (key, column, path)
    for the LWW window. No UDF, no driver state. UNLIKE partition
    deletes (a sliver of any stream), collection OVERWRITES each plant
    a tombstone — on an overwrite-heavy stream the aggregate
    approaches key cardinality, so ``broadcast_tombs=False`` switches
    the shadowing join to a shuffle join (same semantics); the default
    True fits delete/overwrite-light streams."""
    grp = [*key_cols, column_col]
    tomb = coll_tombs.groupBy(*grp).agg(F.max("del_ts").alias("__del_ts"))
    if broadcast_tombs:
        tomb = F.broadcast(tomb)
    live = (
        elem_cells.join(tomb, grp, "left")
        .filter(
            F.col("__del_ts").isNull()
            | (F.col(ts_col) > F.col("__del_ts"))
        )
        .drop("__del_ts")
    )
    w = W.partitionBy(*grp, path_col).orderBy(
        F.desc(ts_col), F.desc_nulls_first(v_col)
    )
    return (
        live.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(v_col).isNotNull())
        .select(*key_cols, column_col, path_col, v_col)
    )


@register(
    "cdc_cassandra_collection_merge",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type AS path, value AS v, event_id AS ts,
         event_id % 7 = 0 AS ow,
         event_id % 11 = 0 AND event_id % 7 <> 0 AS ed
  FROM events
), cells AS (
  -- element tombstones carry NULL v; overwrites contribute their own
  -- element cell at ts (which must survive the ts-1 tombstone)
  SELECT user_id, 'm' AS col, path,
         CASE WHEN ed THEN NULL ELSE v END AS v, ts
  FROM ev
), tombs AS (
  SELECT user_id, 'm' AS col, max(ts - 1) AS del_ts
  FROM ev WHERE ow GROUP BY user_id
), live AS (
  SELECT c.user_id, c.col, c.path, c.v, c.ts
  FROM cells c LEFT JOIN tombs t
    ON c.user_id = t.user_id AND c.col = t.col
  WHERE t.del_ts IS NULL OR c.ts > t.del_ts
)
SELECT user_id, path, v FROM (
  SELECT user_id, path, v, row_number() OVER (
           PARTITION BY user_id, col, path
           ORDER BY ts DESC, v DESC NULLS FIRST) AS rn
  FROM live
) WHERE rn = 1 AND v IS NOT NULL
ORDER BY user_id, path
""",
)
def cdc_cassandra_collection_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Non-frozen collection assembly, differentially proven: events
    become element cells of one map column m (path = event_type, one
    cell per event); every 7th event is a collection OVERWRITE (range
    tombstone at ts-1 + its own element cell at ts), every 11th
    non-overwrite event an element tombstone (NULL cell). The engine
    folds with fold_cassandra_collection_cells; the oracle recomputes
    shadowing + per-path LWW + tombstone-wins-ties in SQL. Equality
    proves the off-by-one overwrite semantics — shifting the tombstone
    to ts (or dropping element tombstones) visibly changes the result
    on this fixture."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("path"),
        F.col("value").alias("v"),
        F.col("event_id").alias("ts"),
        (F.col("event_id") % 7 == 0).alias("ow"),
        ((F.col("event_id") % 11 == 0) & (F.col("event_id") % 7 != 0))
        .alias("ed"),
    )
    cells = ev.select(
        "user_id",
        F.lit("m").alias("column"),
        "path",
        F.when(F.col("ed"), F.lit(None).cast("double"))
        .otherwise(F.col("v"))
        .alias("v"),
        F.col("ts").alias("cell_ts"),
    )
    tombs = ev.filter("ow").select(
        "user_id", F.lit("m").alias("column"),
        (F.col("ts") - 1).alias("del_ts"),
    )
    state = fold_cassandra_collection_cells(cells, tombs, ["user_id"])
    return state.select("user_id", "path", "v").orderBy("user_id", "path")


# ---------------------------------------------------------------------------
# Static columns: partition-scoped cells projected onto every row
# ---------------------------------------------------------------------------


def attach_static_columns(
    row_state: DataFrame,
    static_state: DataFrame,
    pk_cols: list[str],
) -> DataFrame:
    """Project folded STATIC cells onto folded regular rows.

    A Cassandra static column belongs to the PARTITION, not the
    clustering row: its cell is keyed by the partition key alone, and a
    read returns the same static value on every row of the partition —
    including rows written long before the static cell. In cell terms
    statics are ordinary cells with an empty clustering suffix, so the
    existing :func:`fold_cassandra_cells` (keyed on the partition key
    only) already computes their LWW state; the NEW semantics is this
    attach step. ``static_state`` columns other than the partition key
    are taken as the static values.

    Scale: an equi-join on the partition key — the static side is one
    row per partition, NOT broadcastable at 100 TB; both sides shuffle
    on the same key (or stay exchange-free when the row state is
    bucket-partitioned on pk, the partitioned-state layout)."""
    return row_state.join(static_state, pk_cols, "left")


@register(
    "cdc_cassandra_static_columns",
    oracle="""
WITH ev AS (
  SELECT user_id % 10 AS pk, user_id AS ck, value AS v, event_id AS ts,
         event_type, event_id % 5 = 0 AS is_static
  FROM events WHERE event_type <> 'error'
), tomb AS (
  SELECT user_id % 10 AS pk, max(event_id) AS del_ts
  FROM events WHERE event_type = 'error' GROUP BY user_id % 10
), rows_lww AS (
  SELECT pk, ck, v FROM (
    SELECT e.pk, e.ck, e.v,
           row_number() OVER (PARTITION BY e.pk, e.ck
                              ORDER BY e.ts DESC, e.v DESC) AS rn
    FROM ev e LEFT JOIN tomb t ON e.pk = t.pk
    WHERE NOT e.is_static AND (t.del_ts IS NULL OR e.ts > t.del_ts)
  ) WHERE rn = 1
), static_lww AS (
  SELECT pk, sv FROM (
    SELECT e.pk, e.v * 10 AS sv,
           row_number() OVER (PARTITION BY e.pk
                              ORDER BY e.ts DESC, e.v * 10 DESC) AS rn
    FROM ev e LEFT JOIN tomb t ON e.pk = t.pk
    WHERE e.is_static AND (t.del_ts IS NULL OR e.ts > t.del_ts)
  ) WHERE rn = 1
)
SELECT r.pk, r.ck, r.v, s.sv
FROM rows_lww r LEFT JOIN static_lww s ON r.pk = s.pk
ORDER BY r.pk, r.ck
""",
)
def cdc_cassandra_static_columns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Static-column attach, differentially proven: events split into
    regular cells (pk = user_id%10, ck = user_id) and static cells
    (every 5th event, value×10, keyed by pk alone); 'error' events are
    partition tombstones shadowing BOTH tiers. Regular and static
    states fold with the SAME fold_cassandra_cells (keys (pk, ck) vs
    (pk)); the attach join projects the partition's latest static onto
    every surviving row. The oracle recomputes both folds + the join.
    Equality proves partition-scoped visibility — a static written by
    one row's mutation appears on ALL rows of that partition."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("pk"),
        F.col("user_id").alias("ck"),
        F.col("value").alias("v"),
        F.col("event_id").alias("ts"),
        "event_type",
        (F.col("event_id") % 5 == 0).alias("is_static"),
        F.when(F.col("event_type") == "error", OP_PARTITION_DELETE)
        .otherwise(OP_WRITE)
        .alias("op"),
    )
    cell = lambda v: F.struct(  # noqa: E731
        v.alias("v"), F.col("ts").cast("long").alias("ts"),
        F.lit(None).cast("long").alias("ttl"),
    )
    rows_changes = ev.filter(
        (F.col("op") == OP_PARTITION_DELETE) | ~F.col("is_static")
    ).withColumn(
        "cells",
        F.when(
            F.col("op") == OP_WRITE,
            F.create_map(F.lit("v"), cell(F.col("v"))),
        ),
    )
    static_changes = ev.filter(
        (F.col("op") == OP_PARTITION_DELETE) | F.col("is_static")
    ).withColumn(
        "cells",
        F.when(
            F.col("op") == OP_WRITE,
            F.create_map(F.lit("sv"), cell(F.col("v") * 10)),
        ),
    )
    rows_lww = (
        fold_cassandra_cells(rows_changes, ["pk", "ck"], tomb_cols=["pk"])
        .select("pk", "ck", "v")
    )
    static_lww = (
        fold_cassandra_cells(static_changes, ["pk"])
        .select("pk", F.col("v").alias("sv"))
    )
    out = attach_static_columns(rows_lww, static_lww, ["pk"])
    return out.select("pk", "ck", "v", "sv").orderBy("pk", "ck")


def merge_cassandra_collection_cells(
    cells: DataFrame | None,
    tombs: DataFrame | None,
    b_cells: DataFrame,
    b_tombs: DataFrame,
    key_cols: list[str],
    column_col: str = "column",
    path_col: str = "path",
    ts_col: str = "cell_ts",
    v_col: str = "v",
    broadcast_tombs: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Incremental (micro-batch) form of the collection fold: merge one
    batch of element cells + collection tombstones into persisted
    state, returning the new ``(cells, tombs)`` pair.

    Two retention rules make replay/out-of-order delivery safe:

    - the collection-tombstone watermark per (key, column) is RETAINED
      (gc_grace-style) — a late element stamped below an old overwrite
      stays shadowed whenever it arrives;
    - a NULL-value winner (element tombstone) is KEPT IN STATE, not
      dropped — it must keep shadowing older writes to its path that
      arrive in later batches. Dropping NULLs is read-time work
      (:func:`read_cassandra_collection_state`).

    Sequential merges over any batching equal the one-shot
    :func:`fold_cassandra_collection_cells` (equivalence-tested).
    State stays O(live paths + tombstoned paths) per key."""
    grp = [*key_cols, column_col]
    new_tombs = (
        b_tombs if tombs is None
        else tombs.unionByName(b_tombs)
    ).groupBy(*grp).agg(F.max("del_ts").alias("del_ts"))
    all_cells = b_cells if cells is None else cells.unionByName(b_cells)
    tomb_side = new_tombs.withColumnRenamed("del_ts", "__del_ts")
    if broadcast_tombs:  # see fold_cassandra_collection_cells on sizing
        tomb_side = F.broadcast(tomb_side)
    live = (
        all_cells.join(tomb_side, grp, "left")
        .filter(
            F.col("__del_ts").isNull()
            | (F.col(ts_col) > F.col("__del_ts"))
        )
        .drop("__del_ts")
    )
    w = W.partitionBy(*grp, path_col).orderBy(
        F.desc(ts_col), F.desc_nulls_first(v_col)
    )
    new_cells = (
        live.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return new_cells, new_tombs


def read_cassandra_collection_state(
    cells: DataFrame,
    key_cols: list[str],
    column_col: str = "column",
    path_col: str = "path",
    v_col: str = "v",
) -> DataFrame:
    """Current collection contents from merged state: element-tombstone
    winners (NULL v) are dropped HERE — they are state, not data."""
    return cells.filter(F.col(v_col).isNotNull()).select(
        *key_cols, column_col, path_col, v_col
    )


# ---------------------------------------------------------------------------
# Cell tombstones (single-column deletes: `DELETE col FROM t WHERE pk=…`)
# ---------------------------------------------------------------------------


@register(
    "cdc_cassandra_cell_tombstones",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id AS ts, value, event_type,
         CASE WHEN event_type = 'error' THEN 'd' ELSE 'w' END AS op
  FROM events
), cells AS (
  -- column 'v': every write event; 'purchase' DELETES the column
  -- (cell tombstone: NULL value at the event's writetime)
  SELECT user_id, 'v' AS column,
         CASE WHEN event_type = 'purchase' THEN NULL ELSE value END AS v,
         ts AS wt
  FROM ev WHERE op = 'w'
  UNION ALL
  -- column 'w': clicks write, views delete — writetime ts - ts%2
  -- COLLIDES across adjacent events, making the delete-beats-write
  -- equal-writetime rule load-bearing
  SELECT user_id, 'w',
         CASE WHEN event_type = 'view' THEN NULL ELSE value END,
         ts - ts % 2
  FROM ev WHERE op = 'w' AND event_type IN ('click', 'view')
), tomb AS (
  SELECT user_id, max(ts) AS del_ts FROM ev WHERE op = 'd'
  GROUP BY user_id
), live AS (
  SELECT c.user_id, c.column, c.v, c.wt
  FROM cells c LEFT JOIN tomb t ON c.user_id = t.user_id
  WHERE t.del_ts IS NULL OR c.wt > t.del_ts
)
SELECT user_id, "column", v FROM (
  SELECT user_id, "column", v,
         row_number() OVER (
           PARTITION BY user_id, "column"
           ORDER BY wt DESC, (v IS NOT NULL) ASC, v DESC
         ) AS rn
  FROM live
) WHERE rn = 1 AND v IS NOT NULL
ORDER BY user_id, "column"
""",
)
def cdc_cassandra_cell_tombstones(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Single-column deletes, differentially proven: 'purchase' events
    delete column 'v' (a NULL-value cell at the event's writetime) and
    'view' events delete column 'w' — whose writetime ``ts - ts%2``
    collides with the neighboring click's write, so the
    delete-beats-write equal-writetime rule decides real rows, not
    just a unit fixture. The oracle recomputes the LWW with the same
    (wt DESC, tombstone-first, v DESC) order and drops NULL winners;
    equality proves a winning tombstone makes the column ABSENT while
    a later write resurrects it, with partition tombstones composing
    on top. Same single-shuffle plan as cdc_cassandra_cell_lww."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("ts"),
        "value",
        "event_type",
        F.when(F.col("event_type") == "error", OP_PARTITION_DELETE)
        .otherwise(OP_WRITE)
        .alias("op"),
    )
    cell = lambda v, ts: F.struct(  # noqa: E731
        v.alias("v"), ts.cast("long").alias("ts"),
        F.lit(None).cast("long").alias("ttl"),
    )
    changes = ev.withColumn(
        "cells",
        F.when(
            F.col("op") == OP_WRITE,
            F.map_filter(
                F.map_from_arrays(
                    F.array(F.lit("v"), F.lit("w")),
                    F.array(
                        cell(
                            F.when(F.col("event_type") != "purchase",
                                   F.col("value")),
                            F.col("ts"),
                        ),
                        F.when(
                            F.col("event_type").isin("click", "view"),
                            cell(
                                F.when(F.col("event_type") == "click",
                                       F.col("value")),
                                F.col("ts") - F.col("ts") % 2,
                            ),
                        ),
                    ),
                ),
                lambda _, c: c.isNotNull(),
            ),
        ),
    )
    state = fold_cassandra_cells(changes, ["user_id"])
    return state.orderBy("user_id", "column")
