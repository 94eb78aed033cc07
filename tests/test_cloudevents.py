"""CloudEvents converter: envelope shape, round-trip fidelity, and the
specversion gate's failure modes."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from debezium_incubator_spark.cdc.cloudevents import (
    from_cloudevents,
    to_cloudevents,
)


def _wrapped(spark):
    df = spark.createDataFrame(
        [(7, 3, "u", "2024-05-01 10:30:00")],
        "event_id LONG, user_id LONG, op STRING, ts STRING",
    )
    return to_cloudevents(
        df,
        source="/debezium/spark/users",
        ce_type="io.debezium.spark.users.DataChangeEvent",
        id_col=F.col("event_id"),
        time_col=F.col("ts"),
        op_col=F.col("op"),
        data=F.struct("user_id", "event_id"),
    )


def test_envelope_carries_required_attributes(spark):
    ce = json.loads(_wrapped(spark).first().ce)
    assert ce["specversion"] == "1.0"
    assert ce["id"] == "users-7"            # unique-per-stream id
    assert ce["source"] == "/debezium/spark/users"
    assert ce["type"] == "io.debezium.spark.users.DataChangeEvent"
    assert ce["datacontenttype"] == "application/json"
    assert ce["time"] == "2024-05-01T10:30:00Z"
    assert ce["iodebeziumop"] == "u"
    assert ce["data"] == {"user_id": 3, "event_id": 7}


def test_round_trip_is_lossless(spark):
    parsed = from_cloudevents(
        _wrapped(spark), "struct<user_id bigint, event_id bigint>"
    ).first().event
    assert parsed.id == "users-7"
    assert parsed.data.user_id == 3
    assert parsed.iodebeziumop == "u"


@pytest.mark.parametrize("bad", [
    '{"specversion":"2.0","id":"x","data":{"user_id":1,"event_id":1}}',
    '{"id":"x","data":{"user_id":1,"event_id":1}}',   # missing attribute
])
def test_specversion_gate_raises(spark, bad):
    df = spark.createDataFrame([(bad,)], "ce STRING")
    with pytest.raises(Exception, match="specversion"):
        from_cloudevents(
            df, "struct<user_id bigint, event_id bigint>"
        ).collect()
