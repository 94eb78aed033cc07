"""Debezium notification channel (outbound): the connector-side twin of
the signal channel. Public Debezium emits JSON notifications
``{id, aggregate_type, type, additional_data, timestamp}`` about
connector lifecycle — most prominently incremental-snapshot progress
(aggregate_type "Incremental Snapshot"; types STARTED /
TABLE_SCAN_COMPLETED / COMPLETED / ABORTED / PAUSED / RESUMED) — to a
configured channel (sink topic, log, JMX). Reconstructed per SURVEY.md
§0 (the archived checkout has no source); semantics from the public
Debezium notification documentation.

Spark mapping: notifications are control-plane rows (a handful per
snapshot, never data-plane scale). The channel is an in-process
collector whose contents convert to a typed DataFrame for sinking via
any batch/stream writer. IDs are deterministic sequence numbers and
timestamps are caller-supplied positions, NOT wall-clock — the engine's
determinism policy (replayable, testable) applies to the control plane
too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

AGGREGATE_INCREMENTAL = "Incremental Snapshot"
AGGREGATE_BLOCKING = "Blocking Snapshot"

NOTIFICATION_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("aggregate_type", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("additional_data", T.MapType(T.StringType(), T.StringType())),
    T.StructField("timestamp", T.LongType()),
])


class NotificationChannel:
    """In-process notification collector with deterministic ids
    (``n-<seq>``). ``timestamp`` is the stream position the event
    refers to (deterministic), mirroring how every other control-plane
    artifact in this engine is keyed by position rather than
    wall-clock."""

    def __init__(self) -> None:
        self._rows: list[tuple] = []

    def notify(
        self,
        aggregate_type: str,
        type_: str,
        position: int = 0,
        **additional: object,
    ) -> None:
        self._rows.append((
            f"n-{len(self._rows)}",
            aggregate_type,
            type_,
            {k: str(v) for k, v in additional.items()},
            int(position),
        ))

    @property
    def rows(self) -> list[tuple]:
        return list(self._rows)

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self._rows, NOTIFICATION_SCHEMA)


class FileNotificationChannel(NotificationChannel):
    """Durable 'sink' channel (public Debezium's
    ``notification.enabled.channels=sink`` writes notifications to a
    topic; the offline twin is an fsync'd jsonlines file — same
    append-only, consumer-tails-it contract as the signal ledger).
    Sequence ids continue across restarts: a fresh channel over an
    existing file resumes numbering after the last persisted id, so a
    consumer's dedup key stays globally unique per path."""

    def __init__(self, path: str) -> None:
        import json
        import os

        super().__init__()
        self.path = path
        if os.path.exists(path):
            with open(path) as fh:
                for ln in fh:
                    if ln.strip():
                        self._rows.append(tuple(
                            json.loads(ln)[k] for k in (
                                "id", "aggregate_type", "type",
                                "additional_data", "timestamp")
                        ))

    def notify(self, aggregate_type: str, type_: str,
               position: int = 0, **additional: object) -> None:
        """Append one notification under an exclusive ``flock`` on the
        file: the next id is derived from the MAX id already persisted
        (read back under the same lock), so two concurrent channel
        instances — or a writer racing a resumed one — never mint
        duplicate ids or interleave partial rows. ``a``-mode writes are
        kernel-atomic appends; the lock serializes the read-max/write
        pair. Control-plane cost: the re-read is O(notifications so
        far), a handful of KB for any real snapshot."""
        import fcntl
        import json
        import os

        with open(self.path, "a+") as fh:
            fcntl.flock(fh.fileno(), fcntl.LOCK_EX)
            fh.seek(0)
            seq = -1
            for ln in fh:
                if ln.strip():
                    nid = json.loads(ln)["id"]
                    seq = max(seq, int(nid.rsplit("-", 1)[1]))
            row = {
                "id": f"n-{seq + 1}",
                "aggregate_type": aggregate_type,
                "type": type_,
                "additional_data": {
                    k: str(v) for k, v in additional.items()
                },
                "timestamp": int(position),
            }
            fh.write(json.dumps(row) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        self._rows.append(tuple(row[k] for k in (
            "id", "aggregate_type", "type", "additional_data", "timestamp")))


def read_notifications(spark: SparkSession, path: str) -> DataFrame:
    """Typed frame over a sink-channel file (consumer side)."""
    return (
        spark.read.schema(NOTIFICATION_SCHEMA).json(path)
    )
