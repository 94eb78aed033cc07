"""Format-agnostic snapshot scans (§2A): the same query over parquet,
ORC, CSV, and JSON extracts of the same table produces identical
results, and the plan audit shows where each format's scan-time
capabilities differ (pushdown for columnar, filter-in-scan-stage for
row formats)."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import read_snapshot, table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def format_dirs(spark):
    """lineitem sf0.001 re-staged in every supported format."""
    src = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag",
    )
    with tempfile.TemporaryDirectory() as td:
        dirs = {}
        for fmt in ("parquet", "orc", "csv", "json"):
            d = os.path.join(td, fmt)
            w = src.write.mode("overwrite")
            if fmt == "csv":
                w = w.option("header", "false")
            getattr(w, fmt)(d)
            dirs[fmt] = d
        yield spark, src.schema, dirs


def _agg(df):
    return (
        df.filter(F.col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
        .orderBy("l_returnflag")
        .toPandas()
    )


def test_same_results_across_all_formats(format_dirs):
    spark, schema, dirs = format_dirs
    want = _agg(read_snapshot(spark, dirs["parquet"], "parquet"))
    for fmt in ("orc", "csv", "json"):
        got = _agg(read_snapshot(spark, dirs[fmt], fmt, schema=schema))
        assert got.equals(want), f"{fmt} diverges:\n{got}\nvs\n{want}"


def test_pushdown_by_format(format_dirs):
    """EVERY format's scan receives the pushed predicate and the pruned
    column set (Spark pushes into CSV/JSON too — there it
    short-circuits row PARSING; only parquet/ORC can additionally skip
    I/O via row-group statistics, which a plan string can't show — the
    ReadSchema pruning line is the auditable part)."""
    spark, schema, dirs = format_dirs

    def plan_of(fmt):
        df = read_snapshot(
            spark, dirs[fmt], fmt,
            schema=None if fmt in ("parquet", "orc") else schema,
        ).filter(F.col("l_quantity") > 25).select("l_returnflag")
        return df._jdf.queryExecution().executedPlan().toString()

    for fmt in ("parquet", "orc", "csv", "json"):
        p = plan_of(fmt)
        pushed = p.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "GreaterThan(l_quantity" in pushed, f"{fmt} lost pushdown:\n{p}"
        # column pruning: the scan's ReadSchema carries only needed cols
        assert "l_extendedprice" not in p.split("ReadSchema")[-1], fmt


def test_csv_json_require_schema(format_dirs):
    spark, schema, dirs = format_dirs
    for fmt in ("csv", "json"):
        with pytest.raises(ValueError, match="explicit schema"):
            read_snapshot(spark, dirs[fmt], fmt)


def test_csv_snapshot_streams_like_batch(format_dirs):
    """The format tier holds under Structured Streaming: a readStream
    over the CSV extract (schema-explicit, availableNow) produces the
    same aggregate as the batch scan — the snapshot format is
    orthogonal to batch-vs-stream execution."""
    spark, schema, dirs = format_dirs
    want = _agg(read_snapshot(spark, dirs["csv"], "csv", schema=schema))
    stream = (
        spark.readStream.schema(schema)
        .option("header", "false")
        .csv(dirs["csv"])
    )
    agg = (
        stream.filter(F.col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("csv_stream_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("csv_stream_agg").toPandas()
        .sort_values("l_returnflag").reset_index(drop=True)
    )
    assert got.equals(want.sort_values("l_returnflag").reset_index(drop=True))
