"""Sinks (SURVEY.md §2A A7/A8): Kafka producer and materialized-state
file sinks, batch and streaming.

Scale notes: the parquet sink partitions by a date-derived column so a
100 TB materialization prunes at read time; sortWithinPartitions on the
cluster key gives row-group min/max locality without a global sort.
Bucketed writes (``bucketed_sink``) pre-co-locate future joins: two
tables bucketed on the join key with the same bucket count join with
ZERO exchanges — the shuffle is paid once at write time, then every
downstream join/aggregate on that key is shuffle-free (plan-audited in
tests/test_scale_posture.py). Works against Spark's in-memory session
catalog locally and any metastore on a cluster.
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


def bucketed_sink(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """A8 scale path: write ``df`` as a BUCKETED parquet table.

    100 TB posture: hash-bucketing on the join/aggregation key moves the
    shuffle to write time. Readers joining two tables bucketed on the
    same key with equal bucket counts get a SortMergeJoin with no
    Exchange on either side; groupBy on the bucket key is likewise
    exchange-free. ``sort_cols`` adds in-bucket ordering so the join
    also skips its Sort. Bucket count is a layout contract — pick it for
    the big table's target partition size and reuse it fleet-wide."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
