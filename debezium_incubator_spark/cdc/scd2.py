"""SCD2 history tracking (slowly-changing dimension type 2) from a
change stream — the other standard Debezium-consumer materialization:
instead of latest-state (I6), keep every version with a validity
interval.

Scale: one shuffle on the key + per-key sort (same cost shape as
materialize_latest); at 100 TB partition the history table by
valid_from date for time-travel pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..registry import register
from .envelope import OP_CASE


def scd2_history(
    df: DataFrame, keys: list[str], position: list[str], op_col: str = "__op"
) -> DataFrame:
    """Build validity intervals per key: each change row becomes a
    version valid from its position until the next change (NULL = still
    current). Delete events close the interval without opening one
    (their row carries ``__deleted`` = true)."""
    w = W.partitionBy(*keys).orderBy(*position)
    out = df.withColumn("valid_from", F.col(position[0])).withColumn(
        "valid_to", F.lead(position[0]).over(w)
    )
    return out.withColumn(
        "is_current", F.col("valid_to").isNull() & (F.col(op_col) != "d")
    )


@register(
    "cdc_scd2_history",
    oracle="""
WITH mapped AS (
  SELECT user_id, event_id, value, ts,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd'
              WHEN 'view' THEN 'r' ELSE 'u' END AS op
  FROM events
)
SELECT user_id, event_id, value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL AND op <> 'd') AS is_current
FROM mapped
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from, event_id
""",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("__op", F.expr(OP_CASE))
    hist = scd2_history(
        ev.select("user_id", "event_id", "value", "ts", "__op"),
        keys=["user_id"],
        position=["ts", "event_id"],
    )
    return hist.select(
        "user_id", "event_id", "value", "valid_from", "valid_to", "is_current"
    ).orderBy("user_id", "valid_from", "event_id")
