"""Debezium signal channel (public Debezium signaling: a designated
``signal`` table/topic with rows ``(id, type, data)``; inserting e.g.
``('uuid', 'execute-snapshot', '{"data-collections": ["s.t"]}')``
triggers an incremental snapshot of those tables mid-stream; other
types pause/resume/stop. Reconstructed per SURVEY.md §0 — no signal
source exists in the archived checkout).

Spark mapping: signals are just another (tiny) stream unioned into the
control loop; parsing is one ``from_json``; dispatch is a driver-side
loop over a micro-batch's signal rows (control plane — a handful of
rows, never data-plane scale).
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIGNAL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("data", T.StringType()),
    ]
)

KNOWN_SIGNALS = (
    "execute-snapshot",
    "stop-snapshot",
    "pause-snapshot",
    "resume-snapshot",
    "log",
)


def parse_signals(raw: DataFrame) -> DataFrame:
    """Typed signal rows; ``data`` stays a JSON string (its shape is
    signal-type-specific), with the common fields lifted out.
    ``additional-conditions`` (public Debezium: predicate-filtered
    ad-hoc snapshots) surfaces as an array of (data_collection, filter)
    structs — the filter is a SQL predicate the snapshot scan applies
    to that collection's chunks."""
    return raw.select(
        "id",
        "type",
        "data",
        F.from_json(
            "data",
            "`data-collections` ARRAY<STRING>, `type` STRING, "
            "`surrogate-key` STRING, "
            "`additional-conditions` ARRAY<STRUCT<"
            "`data-collection` STRING, `filter` STRING>>",
        ).alias("_d"),
    ).select(
        "id",
        "type",
        "data",
        F.col("_d.data-collections").alias("data_collections"),
        F.coalesce(F.col("_d.type"), F.lit("incremental")).alias("snapshot_kind"),
        F.col("_d.surrogate-key").alias("surrogate_key"),
        F.transform(
            F.col("_d.additional-conditions"),
            lambda c: F.struct(
                c["data-collection"].alias("data_collection"),
                c["filter"].alias("filter"),
            ),
        ).alias("additional_conditions"),
    )


class SignalLedger:
    """Durable processed-signal ids (public Debezium marks signals
    processed so a restart/replayed batch never re-executes one — an
    execute-snapshot dispatched twice would re-run a whole snapshot).
    One id per line, appended with fsync after each dispatch; append of
    a line is atomic on POSIX for these sizes and replaying a partially
    recorded batch is safe because dispatch itself skips recorded ids.
    Control-plane scale: thousands of lines, not data-plane."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._seen: set[str] = set()
        if os.path.exists(path):
            with open(path) as f:
                self._seen = {ln.strip() for ln in f if ln.strip()}

    def __contains__(self, sig_id: str) -> bool:
        return sig_id in self._seen

    def record(self, sig_id: str) -> None:
        if sig_id in self._seen:
            return
        with open(self.path, "a") as f:
            f.write(sig_id + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._seen.add(sig_id)


def dispatch_signals(
    signals: DataFrame,
    handlers: dict[str, Callable[[dict], None]] | None = None,
    ledger: SignalLedger | None = None,
    ack_failures: bool = False,
) -> list[dict]:
    """Process a micro-batch of signal rows in id order: invoke the
    handler per known type, record an action log (unknown types are
    logged and skipped — a bad signal must not stop the connector,
    matching the DLQ philosophy). A handler EXCEPTION is likewise
    contained: recorded on the action entry (``error``), never
    propagated into the connector loop. Driver-side by design: signals
    are control-plane rows (O(1) per batch).

    ``ledger`` (optional :class:`SignalLedger`) makes dispatch
    idempotent across restarts/replayed micro-batches: already-recorded
    ids are skipped (``skipped: duplicate``), handled ids are recorded
    AFTER their handler returns — a crash mid-handler re-dispatches on
    replay, which every lifecycle handler tolerates (runner bookmarks
    make re-runs no-ops). Ack policy on failure: a signal whose handler
    RAISED is **not** recorded by default, so a transiently failed
    execute-snapshot retries on the next replay/restart (at-least-once,
    matching the crash-mid-handler semantics above — handlers are
    idempotent either way). Permanent errors — an unknown signal type —
    ARE recorded: retrying them can never succeed. Pass
    ``ack_failures=True`` for at-most-once semantics (a failed handler
    is permanently acked and never retried)."""
    handlers = handlers or {}
    actions: list[dict] = []
    for row in parse_signals(signals).orderBy("id").collect():
        entry = {
            "id": row.id,
            "type": row.type,
            "handled": False,
            "data_collections": row.data_collections,
        }
        if row.id is None:
            # a signal without an id cannot be deduplicated or acked —
            # contain it like any other bad signal (never crash the
            # connector loop, never invoke a handler for it)
            entry["error"] = "signal has no id"
            actions.append(entry)
            continue
        if ledger is not None and row.id in ledger:
            entry["skipped"] = "duplicate"
            actions.append(entry)
            continue
        permanent_error = False
        if row.type not in KNOWN_SIGNALS:
            entry["error"] = f"unknown signal type '{row.type}'"
            permanent_error = True
        elif h := handlers.get(row.type):
            # parse the payload BEFORE invoking the handler: a malformed
            # data blob is a PERMANENT defect of the signal row (it will
            # never parse on retry), distinct from a transient handler
            # failure — it gets acked, the handler failure does not
            try:
                data = json.loads(row.data) if row.data else {}
            except ValueError as e:
                entry["error"] = f"malformed signal data: {e}"
                permanent_error = True
            else:
                try:
                    h(
                        {
                            "id": row.id,
                            "data": data,
                            "data_collections": row.data_collections or [],
                            "snapshot_kind": row.snapshot_kind,
                            "surrogate_key": row.surrogate_key,
                            "additional_conditions": {
                                c.data_collection: c.filter
                                for c in (row.additional_conditions or [])
                            },
                        }
                    )
                    entry["handled"] = True
                except Exception as e:  # noqa: BLE001 — containment is the contract
                    entry["error"] = f"handler failed: {e}"
        if ledger is not None and (
            entry["handled"]
            or permanent_error
            or (ack_failures and "error" in entry)
        ):
            ledger.record(row.id)
        actions.append(entry)
    return actions


def signals_from_change_stream(
    raw: DataFrame, collection: str = "dbz.signal"
) -> DataFrame:
    """Source-table signal channel — public Debezium's PRIMARY channel:
    ``signal.data.collection`` names a real table in the captured
    database with columns ``(id, type, data)``; operators signal the
    connector by INSERTing into it, and the rows arrive through the
    same change stream as the data (total order with the data events —
    a signal inserted after transaction T is seen after T's changes,
    which file/Kafka channels cannot guarantee).

    Input is the JSON wire shape (``value`` JSON string per change
    event, any mixture of tables). Matching Debezium semantics:

    - only the signal collection's events are considered (matched on
      ``source.table`` — other tables' rows pass through untouched
      elsewhere; this extractor never sees data-plane volume because
      the filter prunes on a metadata field);
    - only INSERTs (``op = 'c'``) act — updates/deletes to the signal
      table and snapshot ``op = 'r'`` re-reads of old signal rows are
      ignored (re-executing a signal on re-snapshot would be wrong);
    - tombstones (NULL value) are dropped.

    Output is SIGNAL_SCHEMA rows ordered upstream of
    :func:`dispatch_signals`; the ledger still applies on top, so even
    a signal row RE-DELIVERED by the log (connector offset rewind)
    executes once.
    """
    v = F.from_json(
        F.col("value").cast("string"),
        "after STRUCT<id STRING, type STRING, data STRING>, "
        "source STRUCT<table STRING>, op STRING",
    )
    return (
        raw.filter(F.col("value").isNotNull())
        .select(v.alias("v"))
        .filter(
            (F.col("v.source.table") == collection)
            & (F.col("v.op") == "c")
        )
        .select(
            F.col("v.after.id").alias("id"),
            F.col("v.after.type").alias("type"),
            F.col("v.after.data").alias("data"),
        )
    )
