"""Streaming complex-event processing (CEP): per-key row-pattern
detection with applyInPandasWithState — the streaming twin of the batch
``e9_sequence_pattern`` query (events/analytics.py), which is itself
oracle-checked against DuckDB, so stream == batch pins these semantics
transitively.

State per key is the accumulated ordered type-path (plus its event
count). That is exact w.r.t. the batch fold and bounded by per-user
history; a production CEP deployment would instead keep the bounded
NFA/DFA state of the pattern automaton (O(pattern) per key, not
O(history)) — the fold structure and the per-key state-store shape are
identical, which is what this module demonstrates. In-order delivery
within a micro-batch is established by the explicit (ts_us, event_id)
sort; cross-batch order relies on the source's watermark contract, the
same assumption every stateful operator here makes.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_RE = re.compile(r"view(>click)+>purchase")
BURST_RE = re.compile(r"error>error")

_STATE_SCHEMA = "path STRING, n LONG"
_OUT_SCHEMA = (
    "user_id LONG, n_events LONG, has_funnel INT, n_err_bursts LONG,"
    " path_len LONG"
)


def _cep_fn(
    key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        path, n = state.get
    else:
        path, n = "", 0
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for t in pdf["event_type"]:
            path = t if not path else f"{path}>{t}"
        n += len(pdf)
    state.update((path, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "has_funnel": [1 if FUNNEL_RE.search(path) else 0],
            "n_err_bursts": [len(BURST_RE.findall(path))],
            "path_len": [len(path)],
        }
    )


def sequence_pattern_stream(changes: DataFrame) -> DataFrame:
    """CEP over a change stream: per-user funnel / error-burst detection,
    update mode (each micro-batch re-emits the keys it touched with their
    post-batch verdict). Input columns: user_id, event_id, ts_us (long),
    event_type."""
    return changes.groupBy("user_id").applyInPandasWithState(
        _cep_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
