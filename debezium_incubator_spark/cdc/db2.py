"""Db2 connector semantics — the archived repo's second connector
(`/root/reference/README.md:22`; no source survives, reconstructed per
SURVEY.md §0 from the public debezium-connector-db2 documentation and
IBM's SQL-Replication capture model).

Db2 CDC does not tail a log directly: the database's ASN Capture
program copies committed changes into per-table **staging (CD) tables**,
and the connector reads those. The mechanics that differ from the other
connectors:

- rows carry ``IBMSNAP_OPERATION`` ('I'/'U'/'D'),
- ordering is ``(IBMSNAP_COMMITSEQ, IBMSNAP_INTENTSEQ)`` — **binary
  sequence values**, conventionally surfaced as fixed-width uppercase
  hex strings, whose LEXICOGRAPHIC order is the commit order (this only
  holds because the width is fixed: unpadded hex would sort 'A' after
  '90' and corrupt every fold — pinned by test),
- only COMMITTED changes ever appear (Capture filters uncommitted
  work), so there is no in-flight-transaction reassembly on this path.

Spark mapping: a pure projection renames/maps the staging columns into
the engine's change shape; every downstream fold (materialize_latest,
partitioned apply, SCD2) works unchanged with the two hex sequences as
the position vector — string descending order IS commit-descending
order. Zero extra shuffle beyond the fold the caller already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .materialize import materialize_latest

#: IBMSNAP_OPERATION → engine op codes
_OP_MAP = {"I": "c", "U": "u", "D": "d"}

SEQ_WIDTH = 16  # hex chars of a 8-byte sequence (Db2 uses 10-byte LSNs;
#                 the fixture's 8-byte width proves the same mechanic)


def seq_hex(col, width: int = SEQ_WIDTH):
    """Render a numeric sequence as the fixed-width uppercase hex form a
    CD table surfaces. Fixed width is THE correctness condition for
    treating the column as a sortable position."""
    return F.lpad(F.upper(F.hex(col.cast("long"))), width, "0")


def db2_capture_envelope(
    capture: DataFrame,
    commitseq_col: str = "IBMSNAP_COMMITSEQ",
    intentseq_col: str = "IBMSNAP_INTENTSEQ",
    operation_col: str = "IBMSNAP_OPERATION",
) -> DataFrame:
    """Map ASN staging rows into the engine change shape: op codes
    translated, the two binary sequences kept verbatim as the position
    vector ``(__commitseq, __intentseq)``. Refuses unknown operation
    codes loudly (a silent NULL op would make deletes look like
    updates three folds later)."""
    op = F.col(operation_col)
    mapped = (
        F.when(op == "I", "c").when(op == "U", "u").when(op == "D", "d")
    )
    data = [c for c in capture.columns
            if c not in (commitseq_col, intentseq_col, operation_col)]
    return capture.select(
        *data,
        F.when(mapped.isNotNull(), mapped)
        .otherwise(
            F.raise_error(F.concat(
                F.lit("unknown IBMSNAP_OPERATION: "), op.cast("string")
            ))
        )
        .alias("__op"),
        F.col(commitseq_col).alias("__commitseq"),
        F.col(intentseq_col).alias("__intentseq"),
    )


@register(
    "cdc_db2_capture_fold",
    oracle="""
WITH mapped AS (
  SELECT user_id, event_id AS pos, value,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
              WHEN 'view' THEN 'r' ELSE 'u' END AS op
  FROM events
)
SELECT user_id, value FROM (
  SELECT user_id, value, op,
         row_number() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn
  FROM mapped
) WHERE rn = 1 AND op <> 'd'
ORDER BY user_id
""",
)
def cdc_db2_capture_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Db2 capture-table path, differentially proven: events become CD
    staging rows (ops as I/U/D letters, position as fixed-width hex
    IBMSNAP sequences — commitseq from the event position, intentseq a
    synthetic within-commit counter), mapped by db2_capture_envelope and
    folded BY THE HEX STRINGS. The oracle folds by the plain NUMERIC
    position; equality proves lexicographic-hex ordering is exactly
    commit ordering — the property the whole Db2 path rests on."""
    from .envelope import OP_CASE

    ev = table(spark, sf_dir, "events")
    capture = ev.select(
        "user_id",
        "value",
        F.expr(OP_CASE).alias("_op0"),
        seq_hex(F.col("event_id")).alias("IBMSNAP_COMMITSEQ"),
        seq_hex(F.col("event_id") % 7).alias("IBMSNAP_INTENTSEQ"),
    ).select(
        "user_id", "value", "IBMSNAP_COMMITSEQ", "IBMSNAP_INTENTSEQ",
        # engine op → CD-table letter, so the mapping round-trips
        F.when(F.col("_op0") == "c", "I")
        .when(F.col("_op0") == "d", "D")
        .otherwise("U")
        .alias("IBMSNAP_OPERATION"),
    )
    ch = db2_capture_envelope(capture)
    # 'r' images collapsed to U above is fine for the fold: op='r' and
    # op='u' fold identically (only 'd' drops a key)
    state = materialize_latest(
        ch, ["user_id"], ["__commitseq", "__intentseq"]
    )
    return state.select("user_id", "value").orderBy("user_id")


# ---------------------------------------------------------------------------
# CD-table pruning (IBMSNAP_PRUNCNTL / SYNCHPOINT semantics)
# ---------------------------------------------------------------------------


def prune_point(subscriber_synchpoints: list[str]) -> str:
    """The prune point is the MINIMUM synchpoint across subscribers
    (IBMSNAP_PRUNCNTL): Capture may only discard CD rows every consumer
    has applied. Plain ``min`` over the fixed-width hex strings IS the
    numeric minimum — the same width property the fold rests on."""
    if not subscriber_synchpoints:
        raise ValueError("no subscribers — nothing may be pruned")
    widths = {len(s) for s in subscriber_synchpoints}
    if len(widths) != 1:
        raise ValueError(
            f"mixed-width synchpoints {sorted(widths)}: lexicographic min "
            "is not numeric min without fixed width"
        )
    return min(subscriber_synchpoints)


def prune_capture_table(
    capture: DataFrame,
    synchpoint: str,
    commitseq_col: str = "__commitseq",
    width: int = SEQ_WIDTH,
) -> DataFrame:
    """ASN Capture's pruning: discard CD rows with
    ``COMMITSEQ <= synchpoint`` (every subscriber has applied them).
    Retention invariant (tested): state folded at the synchpoint,
    merged with the fold of the RETAINED rows, equals the fold of the
    unpruned table — pruning never changes any consumer's result.
    A pure pushed-down filter: at 100 TB this prunes parquet row
    groups by the commitseq min/max statistics.

    The synchpoint must have the TABLE's fixed hex width (``width``,
    default the module's SEQ_WIDTH) — a narrower subscriber-reported
    point compared lexicographically against wider positions would
    silently prune UNAPPLIED rows (the same corruption mode
    :func:`prune_point` refuses among subscribers); checked loudly
    here because the table side can't be validated without a scan."""
    if len(synchpoint) != width:
        raise ValueError(
            f"synchpoint width {len(synchpoint)} != table width {width}: "
            "lexicographic pruning would discard unapplied rows"
        )
    return capture.filter(F.col(commitseq_col) > F.lit(synchpoint))


# ---------------------------------------------------------------------------
# UOW-table commit join (SQL Replication IBMSNAP_UOW semantics)
# ---------------------------------------------------------------------------


def db2_uow_join(
    cd: DataFrame,
    uow: DataFrame,
    uowid_col: str = "IBMSNAP_UOWID",
    commitseq_col: str = "IBMSNAP_COMMITSEQ",
    broadcast: bool = True,
) -> DataFrame:
    """SQL Replication's split position: a CD row carries only its
    INTENT sequence and the transaction's ``IBMSNAP_UOWID`` — the
    COMMIT sequence lives in the shared ``IBMSNAP_UOW`` table, one row
    per committed unit of work. The reader joins CD rows to UOW to gain
    the commit position; a CD row whose UOWID has no UOW row belongs to
    an in-flight (or rolled-back, the Capture program never records it)
    transaction and must be withheld — the same visibility rule the
    LogMiner path proves for Oracle, surfaced through Db2's
    table-shaped idiom.

    Scale caveat (``broadcast``): per POLL the UOW side is one row per
    open transaction — genuinely broadcastable, the default. But this
    same function is the ONE-SHOT batch twin, where ``uow`` holds every
    unit of work of the WHOLE captured history — a side that grows with
    the data, unlike the bounded per-poll form. Whole-history callers
    must pass ``broadcast=False`` and let AQE pick the strategy (an
    explicit F.broadcast is a hint AQE cannot override; at 100× it OOMs
    executors instead of degrading to a shuffle join). The inner join IS
    the withholding either way (no buffered state)."""
    uow_side = uow.select(
        F.col(uowid_col),
        F.col(commitseq_col).alias("__commitseq"),
    )
    if broadcast:
        uow_side = F.broadcast(uow_side)
    return cd.join(uow_side, uowid_col)


@register(
    "cdc_db2_uow_fold",
    oracle="""
WITH cd AS (
  SELECT user_id, value, event_id,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
              ELSE 'u' END AS op,
         event_id // 5 AS uowid
  FROM events
), uow AS (
  -- odd units of work commit 1000 positions late (commit order differs
  -- from intent order); every 97th never commits and is withheld
  SELECT uowid,
         max(event_id) + CASE WHEN uowid % 2 = 1 THEN 1000 ELSE 0 END
           AS commitpos
  FROM cd GROUP BY uowid
  HAVING uowid % 97 <> 0
), visible AS (
  SELECT c.user_id, c.value, c.op, u.commitpos, c.event_id
  FROM cd c JOIN uow u ON c.uowid = u.uowid
)
SELECT user_id, value FROM (
  SELECT user_id, value, op,
         row_number() OVER (
           PARTITION BY user_id ORDER BY commitpos DESC, event_id DESC
         ) AS rn
  FROM visible
) WHERE rn = 1 AND op <> 'd'
ORDER BY user_id
""",
)
def cdc_db2_uow_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UOW commit join, differentially proven: CD rows carry only
    (uowid, intentseq) — the fixture groups five events per unit of
    work, odd UOWs commit 1000 positions late (commit order genuinely
    differs from intent order) and every 97th UOW never commits. The
    engine joins CD→UOW (broadcast) and folds by the fixed-width-hex
    (commitseq, intentseq) vector; the oracle recomputes with plain
    numeric positions. Equality proves the UOW join assigns commit
    visibility exactly like LogMiner's commit table does for Oracle,
    AND that hex-lexicographic order still equals commit order through
    the split-position path."""
    from .envelope import OP_CASE

    ev = table(spark, sf_dir, "events")
    cd = ev.select(
        "user_id",
        "value",
        F.expr(OP_CASE).alias("_op0"),
        seq_hex(F.col("event_id")).alias("IBMSNAP_INTENTSEQ"),
        (F.col("event_id") / 5).cast("long").alias("IBMSNAP_UOWID"),
        F.col("event_id").alias("_eid"),
    )
    uow = (
        cd.groupBy("IBMSNAP_UOWID")
        .agg(
            seq_hex(
                F.max("_eid")
                + F.when(F.col("IBMSNAP_UOWID") % 2 == 1, 1000).otherwise(0)
            ).alias("IBMSNAP_COMMITSEQ")
        )
        .filter(F.col("IBMSNAP_UOWID") % 97 != 0)
    )
    # whole-history one-shot: UOW side grows with the data -> no forced broadcast
    visible = db2_uow_join(cd.drop("_eid"), uow, broadcast=False)
    # 'r' folds like 'u' (only 'd' drops a key) — map for the fold
    ch = visible.select(
        "user_id",
        "value",
        F.when(F.col("_op0") == "r", "u").otherwise(F.col("_op0"))
        .alias("__op"),
        "__commitseq",
        F.col("IBMSNAP_INTENTSEQ").alias("__intentseq"),
    )
    state = materialize_latest(
        ch, ["user_id"], ["__commitseq", "__intentseq"]
    )
    return state.select("user_id", "value").orderBy("user_id")
