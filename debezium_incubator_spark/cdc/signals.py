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
            "`additional-conditions` ARRAY<STRUCT<"
            "`data-collection` STRING, `filter` STRING>>",
        ).alias("_d"),
    ).select(
        "id",
        "type",
        "data",
        F.col("_d.data-collections").alias("data_collections"),
        F.coalesce(F.col("_d.type"), F.lit("incremental")).alias("snapshot_kind"),
        F.transform(
            F.col("_d.additional-conditions"),
            lambda c: F.struct(
                c["data-collection"].alias("data_collection"),
                c["filter"].alias("filter"),
            ),
        ).alias("additional_conditions"),
    )


def dispatch_signals(
    signals: DataFrame,
    handlers: dict[str, Callable[[dict], None]] | None = None,
) -> list[dict]:
    """Process a micro-batch of signal rows in id order: invoke the
    handler per known type, record an action log (unknown types are
    logged and skipped — a bad signal must not stop the connector,
    matching the DLQ philosophy). Driver-side by design: signals are
    control-plane rows (O(1) per batch)."""
    handlers = handlers or {}
    actions: list[dict] = []
    for row in parse_signals(signals).orderBy("id").collect():
        entry = {
            "id": row.id,
            "type": row.type,
            "handled": False,
            "data_collections": row.data_collections,
        }
        if row.type not in KNOWN_SIGNALS:
            entry["error"] = f"unknown signal type '{row.type}'"
        elif h := handlers.get(row.type):
            h(
                {
                    "id": row.id,
                    "data": json.loads(row.data) if row.data else {},
                    "data_collections": row.data_collections or [],
                    "snapshot_kind": row.snapshot_kind,
                    "additional_conditions": {
                        c.data_collection: c.filter
                        for c in (row.additional_conditions or [])
                    },
                }
            )
            entry["handled"] = True
        actions.append(entry)
    return actions
