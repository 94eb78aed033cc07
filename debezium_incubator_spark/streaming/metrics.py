"""Streaming-progress metrics (Debezium exposes connector metrics over
JMX — MilliSecondsBehindSource, TotalNumberOfEventsSeen, QueueRemaining
etc.; the Spark twin reads StructuredStreaming's progress JSON, which
carries the same operational signals per micro-batch).

No extra instrumentation: Spark already tracks rows/sec, batch
durations, watermark lag, and state-store size — this module just maps
them to the Debezium-shaped names an operator's dashboards expect.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def progress_metrics(query: StreamingQuery) -> dict:
    """Latest micro-batch → Debezium-style metric names."""
    p = query.lastProgress
    if p is None:
        return {}
    state_rows = sum(
        s.get("numRowsTotal", 0) for s in (p.get("stateOperators") or [])
    )
    sources = p.get("sources") or [{}]
    return {
        "totalNumberOfEventsSeen": p.get("numInputRows", 0),
        "eventsPerSecond": p.get("processedRowsPerSecond", 0.0),
        "batchId": p.get("batchId"),
        "batchDurationMs": (p.get("durationMs") or {}).get("triggerExecution"),
        "sourceDescription": sources[0].get("description"),
        "stateRowsTotal": state_rows,
        "watermark": (p.get("eventTime") or {}).get("watermark"),
    }


def history_metrics(query: StreamingQuery) -> list[dict]:
    """All retained micro-batches (the recentProgress ring buffer)."""
    last = query.lastProgress
    out = []
    for p in query.recentProgress:
        out.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows", 0),
                "processedRowsPerSecond": p.get("processedRowsPerSecond", 0.0),
            }
        )
    return out
