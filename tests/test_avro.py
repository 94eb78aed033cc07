"""Avro wire path: pure-Python spec codec round-trips, wire
compatibility against the JVM reference implementation (org.apache.avro
ships on Spark's classpath), and the distributed envelope
encode→decode round trip through mapInPandas."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.avro_codec import AvroCodec
from debezium_incubator_spark.cdc.envelope import (
    EVENT_ROW_SCHEMA,
    envelope_avro_schema_json,
    envelope_to_avro_py,
    parse_envelope_avro,
    to_envelope,
)

from .conftest import SF_SMOKE

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": "double"},
        {"name": "d", "type": "boolean"},
        {"name": "e", "type": ["null", {
            "type": "record", "name": "inner",
            "fields": [{"name": "x", "type": "int"}],
        }]},
        {"name": "f", "type": {"type": "array", "items": "long"}},
    ],
}

CASES = [
    {"a": 0, "b": None, "c": 0.0, "d": False, "e": None, "f": []},
    {"a": -1, "b": "", "c": -2.5, "d": True, "e": {"x": -42}, "f": [1, -2, 3]},
    {"a": 2**62, "b": "héllo 世界", "c": 1e300, "d": True,
     "e": {"x": 2**31 - 1}, "f": [0]},
    {"a": -(2**62), "b": "x" * 1000, "c": -1e-300, "d": False,
     "e": {"x": -(2**31)}, "f": list(range(50))},
]


def test_codec_roundtrip():
    codec = AvroCodec(SCHEMA)
    for case in CASES:
        assert codec.decode(codec.encode(case)) == case


def test_codec_wire_compatible_with_jvm_reference(spark):
    """Decode THIS codec's bytes with org.apache.avro (the reference
    implementation, on Spark's classpath) — proves the binary format is
    spec-true, not merely self-consistent."""
    codec = AvroCodec(SCHEMA)
    jvm = spark.sparkContext._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
    factory = jvm.org.apache.avro.io.DecoderFactory.get()
    for case in CASES:
        data = codec.encode(case)
        dec = factory.binaryDecoder(data, None)
        rec = reader.read(None, dec)
        got = json.loads(str(rec))  # GenericRecord.toString is JSON
        want = dict(case)
        for k, v in list(got.items()):
            if isinstance(v, float) and isinstance(want[k], float):
                assert v == want[k], (k, v, want[k])
                got[k] = want[k]
        assert got == want


def test_envelope_avro_roundtrip_distributed(spark):
    """Producer half (envelope_to_avro_py) → consumer half
    (parse_envelope_avro, which takes the Python-codec path in this
    jar-less container): the decoded envelopes equal the originals."""
    events = table(spark, SF_SMOKE, "events").limit(200)
    env = to_envelope(events)
    wire = envelope_to_avro_py(env, EVENT_ROW_SCHEMA)
    assert dict(wire.dtypes) == {"key": "string", "value": "binary"}
    back = parse_envelope_avro(wire, EVENT_ROW_SCHEMA)
    want = sorted(
        (r.asDict(recursive=True) for r in env.collect()),
        key=lambda d: d["key"]["id"],
    )
    got = sorted(
        (r.asDict(recursive=True) for r in back.collect()),
        key=lambda d: d["key"]["id"],
    )
    assert got == want


def test_envelope_schema_json_parses_in_jvm(spark):
    """The generated envelope Avro schema is valid per the reference
    parser — a registry would accept it as-is."""
    jvm = spark.sparkContext._jvm
    js = envelope_avro_schema_json(EVENT_ROW_SCHEMA)
    jschema = jvm.org.apache.avro.Schema.Parser().parse(js)
    assert jschema.getType().getName() == "record"


def test_avro_wire_stream_equals_batch(spark):
    """The Avro wire path under Structured Streaming: envelopes encoded
    to (key JSON, value Avro binary) parquet, streamed with availableNow,
    decoded by parse_envelope_avro (Python-codec path here), unwrapped —
    must equal the batch decode of the same files."""
    import tempfile

    from debezium_incubator_spark.cdc.envelope import unwrap
    from debezium_incubator_spark.streaming.pipeline import run_available_now

    events = table(spark, SF_SMOKE, "events").limit(300)
    wire = envelope_to_avro_py(to_envelope(events), EVENT_ROW_SCHEMA)
    with tempfile.TemporaryDirectory() as td:
        wire.write.mode("overwrite").parquet(f"{td}/wire")
        stream = spark.readStream.schema(wire.schema).parquet(f"{td}/wire")
        flat = unwrap(parse_envelope_avro(stream, EVENT_ROW_SCHEMA))
        run_available_now(flat, "t_avro_wire", output_mode="append")
        got = spark.sql("SELECT * FROM t_avro_wire").toPandas()
        want = unwrap(
            parse_envelope_avro(
                spark.read.parquet(f"{td}/wire"), EVENT_ROW_SCHEMA
            )
        ).toPandas()
    key = ["event_id", "__pos"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_codec_property_roundtrip_vs_jvm(spark):
    """Property test: random schema-conformant values round-trip through
    the Python codec AND decode identically in the JVM reference
    implementation."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    values = st.fixed_dictionaries(
        {
            "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "b": st.one_of(st.none(), st.text(max_size=40)),
            "c": st.floats(allow_nan=False, allow_infinity=False, width=64),
            "d": st.booleans(),
            "e": st.one_of(
                st.none(),
                st.fixed_dictionaries(
                    {"x": st.integers(min_value=-(2**31), max_value=2**31 - 1)}
                ),
            ),
            "f": st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=8
            ),
        }
    )
    codec = AvroCodec(SCHEMA)
    jvm = spark.sparkContext._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
    factory = jvm.org.apache.avro.io.DecoderFactory.get()

    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(values)
    def check(v):
        data = codec.encode(v)
        assert codec.decode(data) == v
        rec = reader.read(None, factory.binaryDecoder(data, None))
        assert rec.get("a") == v["a"]
        assert rec.get("d") == v["d"]
        jf = rec.get("f")
        assert [jf.get(i) for i in range(jf.size())] == v["f"]
        jc = rec.get("c")
        assert float(jc) == v["c"] or (v["c"] == 0.0)  # -0.0 survives too

    check()


def test_codec_rejects_multi_branch_union():
    """The codec's documented subset is ['null', X] unions — with >1
    non-null branch a null/non-null discriminator would silently encode
    the wrong branch, so it must fail loudly at encode time."""
    import pytest

    codec = AvroCodec({
        "type": "record", "name": "bad",
        "fields": [{"name": "u", "type": ["null", "string", "long"]}],
    })
    with pytest.raises(TypeError, match="non-null branches"):
        codec.encode({"u": "x"})


def test_codec_raises_on_truncated_input():
    """Truncated bytes must raise EOFError, never silently decode to
    wrong values (b'' == False for booleans, shortened strings)."""
    import pytest

    codec = AvroCodec(SCHEMA)
    full = codec.encode(CASES[2])
    for cut in (0, 1, 3, len(full) // 2, len(full) - 1):
        with pytest.raises(EOFError):
            codec.decode(full[:cut])


# --- Confluent wire framing ----------------------------------------------

def test_confluent_frame_roundtrip_and_errors():
    import pytest

    from debezium_incubator_spark.cdc.avro_codec import (
        frame_confluent,
        unframe_confluent,
    )

    framed = frame_confluent(1234, b"\x02\x06abc")
    assert framed[:5] == b"\x00\x00\x00\x04\xd2"
    assert unframe_confluent(framed) == (1234, b"\x02\x06abc")
    with pytest.raises(ValueError, match="magic"):
        unframe_confluent(b"\x01\x00\x00\x00\x01payload")
    with pytest.raises(EOFError, match="truncated"):
        unframe_confluent(b"\x00\x00\x00")
    with pytest.raises(ValueError, match="range"):
        frame_confluent(1 << 32, b"")


def test_confluent_registry_evolution_roundtrip():
    """Two registered envelope-schema versions on one subject: messages
    written under each id decode with their WRITER schema — the mixed-
    version topic case the framing exists for."""
    import pytest
    from pyspark.sql import types as T

    from debezium_incubator_spark.cdc.avro_codec import ConfluentAvroRegistry
    from debezium_incubator_spark.cdc.envelope import envelope_avro_schema_json

    v1 = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
        ]
    )
    v2 = T.StructType(
        v1.fields + [T.StructField("score", T.DoubleType(), True)]
    )
    reg = ConfluentAvroRegistry()
    id1 = reg.register("orders-value", envelope_avro_schema_json(v1))
    id2 = reg.register("orders-value", envelope_avro_schema_json(v2))
    assert id1 != id2
    # content dedup: identical schema re-registers to the same id
    assert reg.register("orders-value", envelope_avro_schema_json(v1)) == id1
    assert reg.latest_id("orders-value") == id2

    env1 = {
        "op": "c",
        "before": None,
        "after": {"id": 7, "name": "a"},
        "ts_ms": 1000,
        "source": {"table": "orders", "lsn": 1},
    }
    env2 = {
        "op": "u",
        "before": {"id": 7, "name": "a", "score": None},
        "after": {"id": 7, "name": "b", "score": 2.5},
        "ts_ms": 2000,
        "source": {"table": "orders", "lsn": 2},
    }
    old_msg = reg.encode("orders-value", env1, schema_id=id1)
    new_msg = reg.encode("orders-value", env2)  # latest
    # writer-schema dispatch per message
    sid_a, dec_a = reg.decode(old_msg)
    sid_b, dec_b = reg.decode(new_msg)
    assert (sid_a, sid_b) == (id1, id2)
    assert dec_a["after"] == {"id": 7, "name": "a"}
    assert dec_b["after"] == {"id": 7, "name": "b", "score": 2.5}
    assert dec_b["before"]["score"] is None
    with pytest.raises(KeyError, match="unknown schema id"):
        reg.decode(b"\x00\x00\x00\x00\x63" + b"\x00")


# --- Confluent compatibility modes (public registry semantics) ------------

from debezium_incubator_spark.cdc.avro_codec import (
    ConfluentAvroRegistry,
    IncompatibleSchemaError,
    can_read,
)


def _rec(*fields):
    return {
        "type": "record",
        "name": "R",
        "fields": [dict(f) for f in fields],
    }


A_INT = {"name": "a", "type": "int"}
A_LONG = {"name": "a", "type": "long"}
B_DEF = {"name": "b", "type": "long", "default": 0}
B_NODEF = {"name": "b", "type": "long"}


def test_can_read_resolution_rules():
    assert can_read(_rec(A_LONG), _rec(A_INT)) is None        # int->long
    assert can_read(_rec(A_INT), _rec(A_LONG))                # narrowing
    assert can_read(_rec(A_INT, B_DEF), _rec(A_INT)) is None  # default
    assert can_read(_rec(A_INT, B_NODEF), _rec(A_INT))        # no default
    assert can_read(_rec(A_INT), _rec(A_INT, B_NODEF)) is None  # ignore extra
    # union reader reads plain writer; plain reader refuses union writer
    # unless every branch is readable
    assert can_read(["null", "int"], "int") is None
    assert can_read("long", ["int", "string"])
    assert can_read("long", ["int", "long"]) is None


def test_backward_mode_enforced():
    r = ConfluentAvroRegistry(default_compatibility="BACKWARD")
    r.register("s-value", _rec(A_INT))
    r.register("s-value", _rec(A_INT, B_DEF))       # add WITH default: ok
    try:
        r.register("s-value", _rec(A_INT, B_DEF, {"name": "c", "type": "int"}))
        assert False, "BACKWARD must refuse an added field without default"
    except IncompatibleSchemaError as e:
        assert "no default" in str(e)
    # widening int->long is backward-compatible (new long reads old int)
    r.register("s-value", _rec(A_LONG, B_DEF))


def test_forward_and_full_modes():
    r = ConfluentAvroRegistry()
    r.set_compatibility("t-value", "FORWARD")
    r.register("t-value", _rec(A_INT, B_NODEF))
    # dropping b: old reader has no default for it -> FORWARD refused
    try:
        r.register("t-value", _rec(A_INT))
        assert False
    except IncompatibleSchemaError as e:
        assert "old cannot read new" in str(e)
    r2 = ConfluentAvroRegistry()
    r2.set_compatibility("u-value", "FULL")
    r2.register("u-value", _rec(A_INT))
    try:
        r2.register("u-value", _rec(A_LONG))  # widening: old can't read new
        assert False
    except IncompatibleSchemaError:
        pass


def test_backward_transitive_checks_all_versions():
    r = ConfluentAvroRegistry(default_compatibility="BACKWARD")
    v1, v2 = _rec(A_INT), _rec(A_INT, B_DEF)
    v3 = _rec(A_INT, B_NODEF)  # reads v2 (b present) but NOT v1
    r.register("w-value", v1)
    r.register("w-value", v2)
    r.register("w-value", v3)  # plain BACKWARD: vs latest only -> ok
    rt = ConfluentAvroRegistry(default_compatibility="BACKWARD_TRANSITIVE")
    rt.register("w-value", v1)
    rt.register("w-value", v2)
    try:
        rt.register("w-value", v3)
        assert False, "transitive must check v1 too"
    except IncompatibleSchemaError as e:
        assert "schema id" in str(e)


def test_reregister_identical_skips_check_and_dedups():
    r = ConfluentAvroRegistry(default_compatibility="FULL")
    s = _rec(A_INT)
    sid = r.register("x-value", s)
    assert r.register("x-value", s) == sid  # no-op, no raise
