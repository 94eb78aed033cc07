"""Sinks (SURVEY.md §2A A7/A8): Kafka producer and materialized-state
file sinks, batch and streaming.

Scale notes: the parquet sink partitions by a date-derived column so a
100 TB materialization prunes at read time; sortWithinPartitions on the
cluster key gives row-group min/max locality without a global sort.
Bucketed writes (bucketBy on the join key) pre-co-locate future joins —
saveAsTable requires a metastore-backed catalog, present on a real
cluster, local-only here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_sink_batch(df: DataFrame, brokers: str, topic: str | None = None):
    """A7 batch: write (key, value[, topic]) rows to Kafka. When the
    DataFrame carries a `topic` column (ContentBasedRouter output), omit
    the topic option and Kafka fans out per record."""
    writer = (
        df.write.format("kafka").option("kafka.bootstrap.servers", brokers)
    )
    if topic:
        writer = writer.option("topic", topic)
    return writer.save()


def kafka_sink_stream(df: DataFrame, brokers: str, checkpoint: str,
                      topic: str | None = None):
    """A7 streaming: exactly-once-ish Kafka producer with checkpointed
    offsets (I9)."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )
    if topic:
        writer = writer.option("topic", topic)
    return writer.start()


def materialized_parquet_sink(
    df: DataFrame,
    path: str,
    partition_by_day_of: str | None = None,
    cluster_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """A8 batch: write materialized state as parquet, partitioned by day
    (partition pruning at 100 TB) and clustered within partitions for
    row-group min/max pruning."""
    out = df
    writer_cols = []
    if partition_by_day_of:
        out = out.withColumn(
            "__dt", F.to_date(F.date_trunc("day", F.col(partition_by_day_of)))
        )
        writer_cols = ["__dt"]
    if cluster_by:
        out = (
            out.repartition(*(writer_cols or []))
            if writer_cols
            else out
        )
        out = out.sortWithinPartitions(cluster_by)
    w = out.write.mode(mode)
    if writer_cols:
        w = w.partitionBy(*writer_cols)
    w.parquet(path)
