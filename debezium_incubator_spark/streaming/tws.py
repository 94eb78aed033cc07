"""Spark 4 `transformWithStateInPandas` CDC fold (SURVEY.md §2I I6 /
§2K K6 — the successor API to `applyInPandasWithState`: typed state
variables, timers, TTL, state-schema evolution).

ENVIRONMENT GATE: the TransformWithState state-server protocol speaks
protobuf between the JVM and the Python worker; this container has no
`google.protobuf`, so any TWS query fails at state-schema validation
with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (verified: the
driver worker raises `ImportError: cannot import name 'descriptor'
from 'google.protobuf'`). `tws_available()` probes for it; the engine's
tested I6 path is `pipeline.latest_state_stream`
(applyInPandasWithState), which is protocol-free. The processor below
is the production-form implementation for protobuf-equipped clusters —
same fold, same output schema, stream==batch contract identical.

Scale: one ValueState row per live key in RocksDB
(`spark.sql.streaming.stateStore.providerClass` must point at the
RocksDB provider; set automatically by `latest_state_tws`); changelog
checkpointing keeps commit cost O(delta), not O(state).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming import StatefulProcessorHandle

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
OUT_SCHEMA = "user_id LONG, current_value DOUBLE, ts LONG, op STRING"


def tws_available() -> bool:
    """True iff the TWS python protocol dependency (protobuf) exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_processor():
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class LatestStateProcessor(StatefulProcessor):
        """Keep the change with the greatest (ts_us, event_id) per key —
        identical fold to pipeline._latest_state_fn."""

        def init(self, handle: "StatefulProcessorHandle") -> None:
            schema = StructType(
                [
                    StructField("ts", LongType()),
                    StructField("value", DoubleType()),
                    StructField("op", StringType()),
                ]
            )
            self._latest = handle.getValueState("latest", schema)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            if self._latest.exists():
                ts, value, op = self._latest.get()
            else:
                ts, value, op = -1, None, None
            for pdf in rows:
                pdf = pdf.sort_values(["ts_us", "event_id"])
                for row in pdf.itertuples(index=False):
                    if row.ts_us >= ts:
                        ts, value, op = int(row.ts_us), float(row.value), str(row.op)
            self._latest.update((ts, value, op))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "current_value": [value],
                    "ts": [ts],
                    "op": [op],
                }
            )

        def close(self) -> None:
            pass

    return LatestStateProcessor()


def latest_state_tws(changes: DataFrame) -> DataFrame:
    """I6 via transformWithStateInPandas. Input columns: user_id,
    event_id, ts_us (long), value, op. Raises a clear error when the
    environment lacks protobuf (see module docstring)."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf (the "
            "TWS state-server protocol); not installed in this "
            "environment — use streaming.pipeline.latest_state_stream "
            "(applyInPandasWithState) instead."
        )
    changes.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass", _ROCKSDB
    )
    return changes.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(),
        outputStructType=OUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
