"""SQL Server CDC semantics — the capture-table read path of the
connector that GRADUATED from the archived incubator repo
(`/root/reference/README.md:21-23` names the surviving incubator trio;
the SQL Server connector is the incubator's best-known alumnus and its
T-SQL DDL dialect already lives in ``schema_history.py``). Reconstructed
from the public debezium-connector-sqlserver documentation and the
Microsoft ``cdc.fn_cdc_get_all_changes_*`` contract.

Like Db2, SQL Server CDC stages committed changes into per-table change
tables (``cdc.<instance>_CT``) ordered by fixed-width binary LSNs
(``__$start_lsn`` = commit LSN, ``__$seqval`` = order within the
transaction). The mechanic that is UNIQUE to this connector: an UPDATE
is stored as **two physical rows** sharing the same ``(__$start_lsn,
__$seqval)`` — ``__$operation = 3`` carries the before-image and
``__$operation = 4`` the after-image. Deletes (1) and inserts (2) are
single rows. The connector must re-pair the 3/4 rows into one update
envelope; a reader that treats them as independent changes double-counts
every update and folds the BEFORE image as if it were a later write.

Spark mapping: pairing is a hash aggregation on the shared position —
``groupBy(__$start_lsn, __$seqval)`` with conditional struct extraction
(at most one before-row and one after-row per group, so ``max`` over a
nullable struct IS the extraction). ONE shuffle, no self-join (the naive
op3⋈op4 spelling shuffles the change table twice and breaks on
deletes/inserts which have no partner). Torn groups — an op-3 without
its op-4, or impossible op mixes — raise loudly at pairing time; public
Debezium treats an unpairable row as a connector error, and a silent
drop here would lose the before-image audit trail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .db2 import seq_hex
from .materialize import materialize_latest

#: __$operation codes (Microsoft cdc.fn_cdc_get_all_changes contract)
OP_DELETE, OP_INSERT, OP_UPDATE_BEFORE, OP_UPDATE_AFTER = 1, 2, 3, 4


def pair_update_rows(
    ct: DataFrame,
    start_lsn_col: str = "__$start_lsn",
    seqval_col: str = "__$seqval",
    operation_col: str = "__$operation",
) -> DataFrame:
    """Re-pair a SQL Server change table into one envelope row per
    change: ``(start_lsn, seqval, __op, before, after)`` where
    ``before``/``after`` are structs of the data columns (NULL where the
    operation has no such image — inserts have no before, deletes no
    after; updates have both, taken from the op-3/op-4 row pair).

    Group composition is validated in the same aggregation: the only
    legal operation sets per (start_lsn, seqval) are {1}, {2} and {3,4}.
    Anything else — a torn update pair, a duplicated insert, an op-3
    colliding with a delete — raises at execution time with the
    offending position in the message.

    Scale: one hash aggregation on the change-table's own position
    columns (partial aggregation applies — the op-3/op-4 rows of one
    update are adjacent in the staging table's physical order, so the
    map-side combine usually finishes the pair before the shuffle).
    No join, no window, no UDF.
    """
    meta = (start_lsn_col, seqval_col, operation_col)
    data = [c for c in ct.columns if c not in meta]
    if not data:
        raise ValueError("change table has no data columns to pair")
    op = F.col(operation_col)
    img = F.struct(*[F.col(c) for c in data])
    paired = ct.groupBy(
        F.col(start_lsn_col).alias("start_lsn"),
        F.col(seqval_col).alias("seqval"),
    ).agg(
        F.max(F.when(op.isin(OP_DELETE, OP_UPDATE_BEFORE), img))
        .alias("before"),
        F.max(F.when(op.isin(OP_INSERT, OP_UPDATE_AFTER), img))
        .alias("after"),
        F.sort_array(F.collect_set(op)).alias("__ops"),
        F.count(F.lit(1)).alias("__n"),
    )
    ops, n = F.col("__ops"), F.col("__n")
    # the row COUNT is part of legality: collect_set collapses
    # duplicates, so {2,2} or {3,3,4} would otherwise pass as legal and
    # max() would pick an arbitrary image from a corrupted table
    legal_d = (ops == F.array(F.lit(OP_DELETE))) & (n == 1)
    legal_c = (ops == F.array(F.lit(OP_INSERT))) & (n == 1)
    legal_u = (
        ops == F.array(F.lit(OP_UPDATE_BEFORE), F.lit(OP_UPDATE_AFTER))
    ) & (n == 2)
    return paired.select(
        "start_lsn",
        "seqval",
        F.when(legal_d, F.lit("d"))
        .when(legal_c, F.lit("c"))
        .when(legal_u, F.lit("u"))
        .otherwise(
            F.raise_error(F.concat(
                F.lit("unpairable __$operation set "),
                F.col("__ops").cast("string"),
                F.lit(" at (start_lsn, seqval) = ("),
                F.col("start_lsn"), F.lit(", "), F.col("seqval"),
                F.lit(")"),
            ))
        )
        .alias("__op"),
        "before",
        "after",
    )


def unwrap_paired(paired: DataFrame) -> DataFrame:
    """Flatten paired envelopes into the engine change shape every fold
    consumes: after-image columns for c/u (before-image for d, so key
    columns survive the delete), ``__op``, and the LSN position vector.
    ``materialize_latest(..., ["__start_lsn", "__seqval"])`` then yields
    current state — string-descending IS commit-descending because the
    LSNs are fixed-width hex (the Db2 module's invariant, shared)."""
    img = F.when(F.col("__op") == "d", F.col("before")) \
        .otherwise(F.col("after"))
    fields = paired.schema["after"].dataType.fieldNames()
    return paired.select(
        *[img.getField(f).alias(f) for f in fields],
        "__op",
        F.col("start_lsn").alias("__start_lsn"),
        F.col("seqval").alias("__seqval"),
    )


def merge_sqlserver_buffer(
    buffer: DataFrame | None,
    batch_ct: DataFrame,
    start_lsn_col: str = "__$start_lsn",
    seqval_col: str = "__$seqval",
    operation_col: str = "__$operation",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch step of the pairing under ARBITRARY batch cuts:
    a reader polling the change table can see an update's op-3 row in
    one poll and its op-4 partner in the next (the pair is atomic in the
    database but not in the reader's windowing). Emitting the lone op-3
    would surface the before-image as a change; raising on it would
    fail-stop on every unluckily-cut poll.

    ``buffer`` — retained rows of still-incomplete groups (None on the
    first batch). Returns ``(new_buffer, emitted)``: groups whose
    operation set is exactly {3} or {4} are withheld; every other group
    goes through :func:`pair_update_rows`, which still raises on truly
    illegal compositions ({1,2}, {2,3,4}, …) — incompleteness is
    deferred, corruption is not.

    Union of ``emitted`` across ANY batching equals the one-shot
    pairing (hypothesis-tested). Scale: the completeness tag is a
    window over the SAME (start_lsn, seqval) keys the pairing groups on
    — one shuffle serves both (no joins); the buffer holds only rows of
    updates torn across one poll boundary (per-poll churn, not stream
    length).

    CALLER CONTRACT: persist the returned ``new_buffer`` (write it out,
    or at least localCheckpoint) before feeding it to the next poll —
    the DataFrames returned here are lazy plans over ``buffer ∪ batch``,
    so chaining them unpersisted accretes a lineage over every prior
    poll (the streaming e2e test shows the stage-then-swap parquet
    pattern)."""
    all_rows = (
        batch_ct if buffer is None else buffer.unionByName(batch_ct)
    )
    from pyspark.sql.window import Window as W

    op = F.col(operation_col)
    w = W.partitionBy(start_lsn_col, seqval_col)
    tagged = all_rows.withColumn(
        "__gops", F.sort_array(F.collect_set(op).over(w))
    )
    lone_before = F.col("__gops") == F.array(F.lit(OP_UPDATE_BEFORE))
    lone_after = F.col("__gops") == F.array(F.lit(OP_UPDATE_AFTER))
    incomplete = lone_before | lone_after
    new_buffer = tagged.filter(incomplete).drop("__gops")
    emitted = pair_update_rows(
        tagged.filter(~incomplete).drop("__gops"),
        start_lsn_col, seqval_col, operation_col,
    )
    return new_buffer, emitted


_CT_FROM_EVENTS = """
WITH base AS (
  SELECT user_id, value, event_id, event_type FROM events
), ct AS (
  SELECT user_id, value, event_id, 2 AS op FROM base
  WHERE event_type = 'signup'
  UNION ALL
  SELECT user_id, value, event_id, 1 FROM base
  WHERE event_type = 'error'
  UNION ALL
  SELECT user_id, value - 1, event_id, 3 FROM base
  WHERE event_type NOT IN ('signup', 'error')
  UNION ALL
  SELECT user_id, value, event_id, 4 FROM base
  WHERE event_type NOT IN ('signup', 'error')
)
"""


def _ct_fixture(spark: SparkSession, sf_dir: str,
                extra: tuple[str, ...] = ()) -> DataFrame:
    """events → a synthetic cdc.<instance>_CT: signups are inserts,
    errors deletes, everything else an op-3/op-4 UPDATE PAIR (before
    value = value − 1, exact in IEEE for the fixture's magnitudes).
    One change per event: start_lsn = hex(event_id), seqval = 0.
    ``extra`` carries additional source columns into the CT — the
    capture-migration fixture uses it as the column a NEW capture
    instance captures that the old one doesn't."""
    ev = table(spark, sf_dir, "events")
    rows = ev.select(
        "user_id",
        "event_id",
        *extra,
        F.when(
            F.col("event_type") == "signup",
            F.array(F.struct(F.lit(OP_INSERT).alias("op"),
                             F.col("value").alias("v"))),
        ).when(
            F.col("event_type") == "error",
            F.array(F.struct(F.lit(OP_DELETE).alias("op"),
                             F.col("value").alias("v"))),
        ).otherwise(
            F.array(
                F.struct(F.lit(OP_UPDATE_BEFORE).alias("op"),
                         (F.col("value") - 1).alias("v")),
                F.struct(F.lit(OP_UPDATE_AFTER).alias("op"),
                         F.col("value").alias("v")),
            )
        ).alias("changes"),
    ).select(
        "user_id", "event_id", *extra, F.explode("changes").alias("ch")
    )
    return rows.select(
        "user_id",
        F.col("ch.v").alias("value"),
        *extra,
        seq_hex(F.col("event_id")).alias("__$start_lsn"),
        seq_hex(F.lit(0)).alias("__$seqval"),
        F.col("ch.op").alias("__$operation"),
    )


@register(
    "cdc_sqlserver_update_pairs",
    oracle=_CT_FROM_EVENTS + """
SELECT upper(lpad(to_hex(event_id), 16, '0')) AS start_lsn,
       CASE min(op) WHEN 1 THEN 'd' WHEN 2 THEN 'c' ELSE 'u' END AS op,
       max(user_id) AS user_id,
       max(CASE WHEN op IN (1, 3) THEN value END) AS before_value,
       max(CASE WHEN op IN (2, 4) THEN value END) AS after_value
FROM ct GROUP BY event_id
ORDER BY start_lsn
""",
)
def cdc_sqlserver_update_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL Server op-3/op-4 update pairing, differentially proven: the
    engine re-pairs the physical CT rows by shared (start_lsn, seqval)
    into single envelopes with both images; the oracle regroups the
    identical synthetic CT with conditional aggregation. Equality proves
    the pairing assigns each image to the right side of the right change
    — a reader folding CT rows independently would emit two 'changes'
    per update and surface value−1 as a real write."""
    paired = pair_update_rows(_ct_fixture(spark, sf_dir))
    return paired.select(
        "start_lsn",
        F.col("__op").alias("op"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id"))
        .alias("user_id"),
        F.col("before.value").alias("before_value"),
        F.col("after.value").alias("after_value"),
    ).orderBy("start_lsn")


@register(
    "cdc_sqlserver_capture_fold",
    oracle=_CT_FROM_EVENTS + """
, env AS (
  SELECT event_id,
         CASE min(op) WHEN 1 THEN 'd' WHEN 2 THEN 'c' ELSE 'u' END AS op,
         max(user_id) AS user_id,
         max(CASE WHEN op IN (2, 4) THEN value END) AS after_value
  FROM ct GROUP BY event_id
)
SELECT user_id, after_value AS value FROM (
  SELECT user_id, after_value, op,
         row_number() OVER (
           PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM env
) WHERE rn = 1 AND op <> 'd'
ORDER BY user_id
""",
)
def cdc_sqlserver_capture_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pairing COMPOSED with the standard fold: pair → unwrap
    (after-images win, deletes keep their key from the before-image) →
    materialize_latest by the hex LSN vector. The oracle folds the
    paired envelopes by the NUMERIC event id; equality proves unwrap
    feeds the fold the after-image (a before/after mix-up here would
    leave every surviving update at value − 1) and that hex-LSN order
    is commit order through the whole chain."""
    state = materialize_latest(
        unwrap_paired(pair_update_rows(_ct_fixture(spark, sf_dir))),
        ["user_id"],
        ["__start_lsn", "__seqval"],
    )
    return state.select("user_id", "value").orderBy("user_id")


# ---------------------------------------------------------------------------
# Multiple capture instances (online schema evolution)
# ---------------------------------------------------------------------------


def merge_capture_instances(
    instances: list[tuple[DataFrame, str]],
    start_lsn_col: str = "__$start_lsn",
) -> DataFrame:
    """SQL Server online schema evolution: a capture instance has a
    FIXED schema, so a DDL change means the DBA creates a SECOND
    instance capturing the new shape, and both run concurrently until
    the old one is dropped. The connector (public Debezium's
    ``cdc.change_tables`` discovery) must stream from the old instance
    up to the new instance's start LSN, switch there, and never read
    the overlap window twice.

    ``instances``: ``(change_table, from_lsn)`` pairs ordered by
    ``from_lsn`` ascending — each instance is read exactly on
    ``[from_lsn_i, from_lsn_{i+1})``, the last unbounded above. The
    per-instance range filter IS the overlap dedup: rows the old
    instance kept capturing past the switch LSN are cut, not
    distinct-ed (no shuffle — the cut is a pushed scan predicate).
    Schemas merge by name, old-instance rows surfacing NULL for
    columns only the new instance captures (exactly the shape change a
    Debezium consumer sees at the switch). An update's op-3/op-4 rows
    share their start LSN, so an instance switch can never tear a pair.

    ``from_lsn`` strings must be same-width (hex-lexicographic order is
    only commit order at fixed width — the Db2 invariant) and strictly
    increasing; violations raise up front."""
    if not instances:
        raise ValueError("merge_capture_instances: no instances")
    lsns = [lsn for _, lsn in instances]
    widths = {len(x) for x in lsns}
    if len(widths) != 1:
        raise ValueError(
            f"mixed-width from_lsns {lsns} — hex-lexicographic order is "
            "only commit order at fixed width"
        )
    if any(a >= b for a, b in zip(lsns, lsns[1:])):
        raise ValueError(
            f"from_lsns must be strictly increasing, got {lsns}"
        )
    out: DataFrame | None = None
    for i, (df, lo) in enumerate(instances):
        sel = df.filter(F.col(start_lsn_col) >= lo)
        if i + 1 < len(instances):
            sel = sel.filter(F.col(start_lsn_col) < instances[i + 1][1])
        out = sel if out is None else out.unionByName(
            sel, allowMissingColumns=True
        )
    return out


#: capture-migration fixture boundaries: the new instance is created at
#: LSN hex(600); the old one keeps capturing until hex(700) (overlap).
MIGRATION_SWITCH, MIGRATION_OLD_END = 600, 700


@register(
    "cdc_sqlserver_capture_migration",
    oracle="""
WITH base AS (
  SELECT user_id, value, event_id, event_type FROM events
), ct AS (
  SELECT user_id, value, event_id, event_type, 2 AS op FROM base
  WHERE event_type = 'signup'
  UNION ALL
  SELECT user_id, value, event_id, event_type, 1 FROM base
  WHERE event_type = 'error'
  UNION ALL
  SELECT user_id, value - 1, event_id, event_type, 3 FROM base
  WHERE event_type NOT IN ('signup', 'error')
  UNION ALL
  SELECT user_id, value, event_id, event_type, 4 FROM base
  WHERE event_type NOT IN ('signup', 'error')
)
SELECT upper(lpad(to_hex(event_id), 16, '0')) AS start_lsn,
       CASE min(op) WHEN 1 THEN 'd' WHEN 2 THEN 'c' ELSE 'u' END AS op,
       max(user_id) AS user_id,
       max(CASE WHEN op IN (1, 3) THEN value END) AS before_value,
       max(CASE WHEN op IN (2, 4) THEN value END) AS after_value,
       CASE WHEN event_id >= 600 THEN min(event_type) END AS etype
FROM ct GROUP BY event_id
ORDER BY start_lsn
""",
)
def cdc_sqlserver_capture_migration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Capture-instance migration, differentially proven: the OLD
    instance captures (user_id, value) for every change below
    hex(700); the NEW instance — created at LSN hex(600) after a DDL
    added a column — captures (user_id, value, event_type) from there
    on. The [600, 700) window exists in BOTH change tables. The merged
    stream must contain each change exactly ONCE (the oracle groups
    the plain one-copy CT — any overlap leak would double rows and
    fail the {3,4} pairing legality check too), with the new column
    NULL below the switch and populated from it. Pairing runs on the
    MERGED stream, proving the switch boundary never tears an op-3/4
    pair (both rows share their start LSN by construction)."""
    old_ct = _ct_fixture(spark, sf_dir).filter(
        F.col("__$start_lsn") < seq_hex(F.lit(MIGRATION_OLD_END))
    )
    new_ct = _ct_fixture(spark, sf_dir, extra=("event_type",)).filter(
        F.col("__$start_lsn") >= seq_hex(F.lit(MIGRATION_SWITCH))
    )
    merged = merge_capture_instances([
        (old_ct, f"{0:016X}"),
        (new_ct, f"{MIGRATION_SWITCH:016X}"),
    ])
    paired = pair_update_rows(merged)
    return paired.select(
        "start_lsn",
        F.col("__op").alias("op"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id"))
        .alias("user_id"),
        F.col("before.value").alias("before_value"),
        F.col("after.value").alias("after_value"),
        F.coalesce(F.col("after.event_type"), F.col("before.event_type"))
        .alias("etype"),
    ).orderBy("start_lsn")
