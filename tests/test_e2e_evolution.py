"""End-to-end schema-evolution pipeline — the full Debezium consumer
story stitched from the round-2 pieces:

DDL history replay → versioned StructTypes → Avro-encoded envelopes
captured under schema v0 → ALTER TABLE adds a column → v1 envelopes →
per-version decode → registry ``upgrade`` normalization → union →
materialized latest state.

This is what "a user of the reference could switch to this repo" means
operationally: consume the schema-history topic, decode each log
segment against the schema current at its position, and fold to state.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_incubator_spark.cdc.envelope import (
    envelope_schema,
    envelope_to_avro_py,
    parse_envelope_avro,
    unwrap,
)
from debezium_incubator_spark.cdc.materialize import materialize_latest
from debezium_incubator_spark.cdc.schema_history import replay_history
from debezium_incubator_spark.cdc.schema_registry import SchemaRegistry


def _make_envelopes(spark, row_schema: T.StructType, rows):
    """rows: list of (id, row_dict, pos, op) — deletes (op='d') carry the
    row as the before-image, like a real connector emits them."""
    env_schema = T.StructType(
        [
            T.StructField("key", T.StructType([T.StructField("id", T.LongType())])),
            T.StructField("value", envelope_schema(row_schema)),
        ]
    )
    data = []
    for rid, row, pos, op in rows:
        src = {
            "connector": "sim", "db": "testdb", "table": "accounts",
            "snapshot": False, "pos": pos,
        }
        value = {
            "before": row if op == "d" else None,
            "after": None if op == "d" else row,
            "source": src, "op": op, "ts_ms": 1_700_000_000_000 + pos,
        }
        data.append({"key": {"id": rid}, "value": value})
    return spark.createDataFrame(data, env_schema)


def test_ddl_evolution_avro_pipeline(spark):
    # 1. replay the schema-history topic
    reg: SchemaRegistry = replay_history([
        "CREATE TABLE accounts (id BIGINT NOT NULL, bal DOUBLE)",
        "ALTER TABLE accounts ADD COLUMN tier VARCHAR(8)",
    ])
    v0 = reg.version("accounts", 0)
    v1 = reg.latest("accounts")
    assert [f.name for f in v0.fields] == ["id", "bal"]
    assert [f.name for f in v1.fields] == ["id", "bal", "tier"]

    # 2. log segment captured under v0, Avro on the wire
    seg0 = _make_envelopes(spark, v0, [
        (1, {"id": 1, "bal": 10.0}, 1, "c"),
        (2, {"id": 2, "bal": 20.0}, 2, "c"),
        (1, {"id": 1, "bal": 15.0}, 3, "u"),
    ])
    wire0 = envelope_to_avro_py(seg0, v0)

    # 3. segment captured after the ALTER, under v1
    seg1 = _make_envelopes(spark, v1, [
        (2, {"id": 2, "bal": 25.0, "tier": "gold"}, 4, "u"),
        (3, {"id": 3, "bal": 30.0, "tier": "base"}, 5, "c"),
        (1, {"id": 1, "bal": 15.0, "tier": None}, 6, "d"),  # delete id=1
    ])
    wire1 = envelope_to_avro_py(seg1, v1)

    # 4. decode each segment against ITS schema version, flatten
    #    (unwrap emits row fields + metadata), normalize the old-version
    #    segment to the latest schema, union
    meta = ["__op", "__pos"]
    flat0 = unwrap(parse_envelope_avro(wire0, v0)).select("id", "bal", *meta)
    flat1 = unwrap(parse_envelope_avro(wire1, v1)).select(
        "id", "bal", "tier", *meta
    )
    norm0 = reg.upgrade(flat0, "accounts", keep=tuple(meta))
    changes = norm0.unionByName(flat1)

    # 5. fold to current state
    state = materialize_latest(changes, keys=["id"], position=["__pos"])
    got = {r.id: (r.bal, r.tier) for r in state.collect()}
    assert got == {2: (25.0, "gold"), 3: (30.0, "base")}  # id=1 deleted
    assert dict(state.dtypes)["tier"] == "string"


def test_oracle_dialect_confluent_pipeline(spark):
    """Round-3 pieces stitched end-to-end for the reference's flagship
    source (Oracle): Oracle-dialect DDL history → versioned StructTypes
    (NUMBER → exact DecimalType) → Confluent-framed Avro envelopes on a
    MIXED-version "topic" → relational writer-schema dispatch on the
    embedded schema id → per-version decode (decimal.handling.mode=
    string wire) → upgrade → latest-state fold."""
    from decimal import Decimal

    from debezium_incubator_spark.cdc.avro_codec import ConfluentAvroRegistry
    from debezium_incubator_spark.cdc.envelope import envelope_avro_schema_json

    reg: SchemaRegistry = replay_history(
        [
            'CREATE TABLE "HR"."ACCOUNTS" ('
            '"ID" NUMBER(10) NOT NULL, "BAL" NUMBER(12,2))',
            'ALTER TABLE "HR"."ACCOUNTS" ADD ("TIER" VARCHAR2(8))',
        ],
        dialect="oracle",
    )
    v0, v1 = reg.version("accounts", 0), reg.latest("accounts")
    assert v0["BAL"].dataType == T.DecimalType(12, 2)
    assert [f.name for f in v1.fields] == ["ID", "BAL", "TIER"]

    creg = ConfluentAvroRegistry()
    sid0 = creg.register("accounts-value", envelope_avro_schema_json(v0))
    sid1 = creg.register("accounts-value", envelope_avro_schema_json(v1))

    def key_of(rid):
        return {"id": rid}

    def envs(schema, rows):
        env_schema = T.StructType(
            [
                T.StructField(
                    "key", T.StructType([T.StructField("id", T.LongType())])
                ),
                T.StructField("value", envelope_schema(schema)),
            ]
        )
        data = []
        for rid, row, pos, op in rows:
            src = {
                "connector": "oracle", "db": "XE", "table": "accounts",
                "snapshot": False, "pos": pos,
            }
            data.append(
                {
                    "key": key_of(rid),
                    "value": {
                        "before": row if op == "d" else None,
                        "after": None if op == "d" else row,
                        "source": src, "op": op,
                        "ts_ms": 1_700_000_000_000 + pos,
                    },
                }
            )
        return spark.createDataFrame(data, env_schema)

    seg0 = envs(v0, [
        (1, {"ID": Decimal(1), "BAL": Decimal("10.00")}, 1, "c"),
        (2, {"ID": Decimal(2), "BAL": Decimal("20.00")}, 2, "c"),
        (1, {"ID": Decimal(1), "BAL": Decimal("15.50")}, 3, "u"),
    ])
    seg1 = envs(v1, [
        (2, {"ID": Decimal(2), "BAL": Decimal("25.75"), "TIER": "gold"}, 4, "u"),
        (3, {"ID": Decimal(3), "BAL": Decimal("30.00"), "TIER": "base"}, 5, "c"),
    ])

    def framed(env_df, schema, sid):
        wire = envelope_to_avro_py(env_df, schema)
        header = bytes([0]) + sid.to_bytes(4, "big")
        return wire.withColumn("value", F.concat(F.lit(header), F.col("value")))

    # one mixed-version topic, like a real registry-framed Kafka topic
    topic = framed(seg0, v0, sid0).unionByName(framed(seg1, v1, sid1))

    # relational writer-schema dispatch: read the embedded BE32 id
    sid_col = F.conv(F.hex(F.expr("substring(value, 2, 4)")), 16, 10).cast("int")
    body = F.expr("substring(value, 6, 2147483647)")
    parts = {}
    for sid, schema in ((sid0, v0), (sid1, v1)):
        part = topic.filter(sid_col == sid).withColumn("value", body)
        parts[sid] = unwrap(parse_envelope_avro(part, schema))

    meta = ["__op", "__pos"]
    flat0 = parts[sid0].select("ID", "BAL", *meta)
    flat1 = parts[sid1].select("ID", "BAL", "TIER", *meta)
    norm0 = reg.upgrade(flat0, "accounts", keep=tuple(meta))
    changes = norm0.unionByName(flat1)
    state = materialize_latest(changes, keys=["ID"], position=["__pos"])
    got = {int(r.ID): (r.BAL, r.TIER) for r in state.collect()}
    assert got == {
        1: (Decimal("15.50"), None),
        2: (Decimal("25.75"), "gold"),
        3: (Decimal("30.00"), "base"),
    }
    assert dict(state.dtypes)["BAL"] == "decimal(12,2)"
