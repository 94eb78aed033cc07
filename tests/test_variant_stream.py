"""VariantType ahead-of-schema streaming twin (r10 verdict #8): the
payload JSON widens mid-stream; the variant path extracts the new
field the moment it appears (NULL before), streamed == one-shot batch
across a restart, and the static from_json contrast shows why the
variant path exists."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from debezium_incubator_spark.streaming.variant import (
    start_variant_ingest_stream,
    variant_extract,
    variant_ingest_foreach_batch,
)

SCHEMA = "event_id LONG, props STRING"
PATHS = {
    "k_int": ("$.k", "int"),
    "extra_z": ("$.extra.z", "int"),  # exists only after the widening
}

OLD = [(i, f'{{"k":{i}}}') for i in range(10)]
NEW = [(i, f'{{"k":{i},"extra":{{"z":{i * 7}}}}}') for i in range(10, 20)]


def _stage_file(spark, tmp_path, stage, rows, i):
    tmp = str(tmp_path / f"tmp{i}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    src = glob.glob(os.path.join(tmp, "*.parquet"))[0]
    os.rename(src, os.path.join(stage, f"b{i}.parquet"))


def test_widened_field_extractable_without_redeclare(spark, tmp_path):
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)

    # pre-widening batch, stream drains, stops (a restart boundary)
    _stage_file(spark, tmp_path, stage, OLD, 0)
    q = start_variant_ingest_stream(spark, stage, SCHEMA, out, ckpt, PATHS)
    q.awaitTermination(300)

    # the producer widens; SAME stream definition resumes on the same
    # checkpoint — no schema re-declaration anywhere
    _stage_file(spark, tmp_path, stage, NEW, 1)
    q2 = start_variant_ingest_stream(spark, stage, SCHEMA, out, ckpt, PATHS)
    q2.awaitTermination(300)

    got = {
        r["event_id"]: (r["k_int"], r["extra_z"])
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 20
    for i in range(10):
        assert got[i] == (i, None)  # pre-widening rows: new path NULL
    for i in range(10, 20):
        assert got[i] == (i, i * 7)  # post-widening rows: typed value

    # streamed union == one-shot batch over the full record set
    batch = {
        r["event_id"]: (r["k_int"], r["extra_z"])
        for r in variant_extract(
            spark.createDataFrame(OLD + NEW, SCHEMA), PATHS
        ).collect()
    }
    assert got == batch

    # the canon preserves the FULL widened payload (nothing dropped)
    canons = {
        r["event_id"]: r["canon"]
        for r in spark.read.parquet(out).collect()
    }
    assert '"extra"' in canons[15] and '"extra"' not in canons[5]


def test_static_from_json_drops_the_widened_field(spark):
    """The contrast that motivates variant: a consumer pinned to the
    OLD declared schema silently loses the new field."""
    df = spark.createDataFrame(NEW, SCHEMA)
    static = df.select(
        F.from_json("props", "k INT").alias("p")
    ).select("p.*")
    assert "extra" not in static.columns
    # while the variant path reads it from the same records
    v = variant_extract(df, PATHS)
    assert all(r["extra_z"] is not None for r in v.collect())


def test_epoch_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "out")
    handle = variant_ingest_foreach_batch(out, PATHS)
    batch = spark.createDataFrame(OLD, SCHEMA)
    handle(batch, 0)
    first = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    handle(batch, 0)  # replay
    again = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert first == again and first
