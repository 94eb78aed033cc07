"""End-to-end integration: the full Debezium-consumer pipeline, each
stage configured/driven the way a switching Debezium user would —
wire-format JSON envelopes (+ injected poison + tombstone) → DLQ split
→ connector-properties SMT chain (unwrap) → streaming foreachBatch
upsert → materialized state == the one-shot batch fold."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.dlq import parse_with_dlq
from debezium_incubator_spark.cdc.envelope import (
    EVENT_ROW_SCHEMA,
    OP_CASE,
    to_envelope,
)
from debezium_incubator_spark.cdc.materialize import materialize_latest
from debezium_incubator_spark.connector import transform_chain
from debezium_incubator_spark.streaming.upsert import (
    read_state,
    start_upsert_stream,
)

from .conftest import SF_SMOKE

SMT_PROPS = {
    "transforms": "unwrap",
    "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
    # keep delete events as rows: the upsert fold needs them to tombstone
    "transforms.unwrap.drop.tombstones": "false",
}


def test_config_driven_cdc_pipeline_end_to_end(spark):
    ev = table(spark, SF_SMOKE, "events")
    wire = to_envelope(ev, as_json=True)
    poison = spark.createDataFrame(
        [('{"id": -1}', "garbage {{{"), ('{"id": -2}', None)],
        "key STRING, value STRING",
    )
    raw = wire.unionByName(poison)

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "wire")
        raw.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("key STRING, value STRING").parquet(src)

        valid, dead = parse_with_dlq(stream, EVENT_ROW_SCHEMA, "srv.testdb.events")
        flat = transform_chain(valid, SMT_PROPS)
        changes = flat.select(
            "user_id", "event_id", "value", F.col("__op").alias("__op"), "__pos"
        )
        state = os.path.join(td, "state")
        q = start_upsert_stream(
            changes, state, keys=["user_id"], position=["__pos"],
            checkpoint=os.path.join(td, "cp"),
        )
        # the DLQ side runs as its own sink, as it would in production
        dq = (
            dead.writeStream.format("memory").queryName("t_dlq")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        dq.awaitTermination()

        got = (
            read_state(spark, state)
            .select("user_id", "value")
            .toPandas().sort_values("user_id").reset_index(drop=True)
        )
        dlq = spark.sql("SELECT * FROM t_dlq").toPandas()

    # batch twin: same fold over the original change rows
    batch_changes = ev.select(
        "user_id", "event_id", "value",
        F.expr(OP_CASE).alias("__op"),
        F.col("event_id").alias("__pos"),
    )
    want = (
        materialize_latest(batch_changes, ["user_id"], ["__pos"])
        .select("user_id", "value")
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # exactly the injected poison record reached the DLQ (tombstone stayed valid)
    assert len(dlq) == 1
    assert dlq.iloc[0]["value"] == "garbage {{{"
    assert dlq.iloc[0]["__error_topic"] == "srv.testdb.events"
