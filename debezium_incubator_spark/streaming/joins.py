"""Streaming joins (SURVEY.md §2C C10/C11) and transaction-metadata
reassembly (§1.1).

Debezium optionally emits a transaction-metadata topic (BEGIN/END with
id + event_count); consumers reassemble transaction boundaries by
joining the data stream to it — the canonical stream-stream join, bound
by watermarks on both sides so state stays finite.

Scale: stream-stream joins keep both sides' unmatched rows in the state
store until the watermark passes the join-condition time bound — the
tighter the interval, the smaller the state. Stream-static joins keep NO
state (the static side is a broadcast/lookup per micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         on, how: str = "left",
                         broadcast: bool = True) -> DataFrame:
    """C11: enrich a CDC stream with a dimension table. The static side
    re-resolves per micro-batch (picks up dim updates between batches).
    ``broadcast=True`` (default) is for genuinely dim-sized sides; pass
    False for dimensions that scale with the data (user/account tables
    at 1e9 rows) — an explicit hint cannot be overridden by AQE and
    would OOM executors instead of degrading to a shuffle join."""
    dim_side = F.broadcast(dim) if broadcast else dim
    return stream.join(dim_side, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    delay: str = "10 minutes",
    interval: str = "INTERVAL 1 HOUR",
    how: str = "inner",
) -> DataFrame:
    """C10: join two streams on a key within a time interval. Both sides
    watermarked; the interval bound lets Spark GC matched/expired state.

    ``how`` also supports the watermarked outer modes (``left_outer``,
    ``right_outer``, ``full_outer``): unmatched rows are emitted with
    nulls once the watermark passes their join-interval bound — i.e. an
    outer result is only declared "unmatched" when no future input can
    still match it. That emission happens in a LATER micro-batch than
    the row's own (state must outlive the bound), which is why the
    batch-twin equivalence test drives the stream with multiple
    triggers and a watermark-advancing flush."""
    l = left.withWatermark(left_ts, delay).alias("l")
    r = right.withWatermark(right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.expr(f"l.{left_ts} + {interval}")
        )
    )
    return l.join(r, cond, how)


def transaction_reassembly(
    data: DataFrame,
    tx_meta: DataFrame,
    tx_col: str = "tx_id",
    delay: str = "10 minutes",
    max_tx_span: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """§1.1 transaction-metadata pattern: attach BEGIN/END metadata to
    each data event of the same transaction id within the watermark,
    enabling downstream consumers to emit transactionally-complete
    groups. tx_meta columns: (tx_id, tx_ts, event_count)."""
    d = data.withWatermark("ts", delay).alias("d")
    m = tx_meta.withWatermark("tx_ts", delay).alias("m")
    cond = (
        (F.col(f"d.{tx_col}") == F.col(f"m.{tx_col}"))
        & (F.col("d.ts") >= F.col("m.tx_ts"))
        & (F.col("d.ts") <= F.expr(f"m.tx_ts + {max_tx_span}"))
    )
    return d.join(m, cond, "inner").select(
        "d.*", F.col("m.event_count").alias("tx_event_count")
    )
