"""Pure-Python Avro binary codec (Apache Avro 1.x specification subset).

Debezium deployments serialize envelopes as Avro via a schema registry
in practice [/root/reference/README.md:21-23 — the connectors target
Kafka Connect, whose converter of record is Avro]. This container has
neither the ``spark-avro`` datasource module nor a Python Avro library
(offline sandbox — see README "Environment-gated paths"), so this module
implements the binary encoding itself from the public spec:

- long/int: zigzag varint; float/double: little-endian IEEE;
- string/bytes: varint length + payload; boolean: one byte;
- unions: varint branch index + branch value;
- records: field values in schema order; arrays: varint-counted blocks.

That subset covers the whole envelope schema family this engine emits
(``envelope_avro_schema_json``). Wire compatibility is proven in tests
by decoding this codec's output with the JVM reference implementation
(``org.apache.avro`` ships on Spark's classpath) via py4j.

Scale: the codec is invoked through Arrow-batched ``mapInPandas``
(see ``envelope.parse_envelope_avro``) — a per-record Python decode,
~10× slower than the JVM ``from_avro`` expression. It is the FALLBACK
for jar-less environments; deployments with spark-avro on the classpath
take the expression path automatically.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any

_MASK64 = (1 << 64) - 1


def _write_varint(out: io.BytesIO, z: int) -> None:
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_long(out: io.BytesIO, n: int) -> None:
    _write_varint(out, ((n << 1) ^ (n >> 63)) & _MASK64)


def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated Avro varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc
        shift += 7


def _read_long(buf: io.BytesIO) -> int:
    z = _read_varint(buf)
    return (z >> 1) ^ -(z & 1)


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    """Read exactly ``n`` bytes or raise — a short read means truncated
    or corrupt input, and returning fewer bytes would silently yield
    wrong values (b'' == False for booleans, truncated strings)."""
    raw = buf.read(n)
    if len(raw) != n:
        raise EOFError(f"truncated Avro input: wanted {n} bytes, got {len(raw)}")
    return raw


class AvroCodec:
    """Encoder/decoder bound to one parsed Avro schema (JSON str/dict)."""

    def __init__(self, schema: str | dict):
        self.schema = json.loads(schema) if isinstance(schema, str) else schema

    # -- encode ------------------------------------------------------------

    def encode(self, value: Any) -> bytes:
        out = io.BytesIO()
        self._enc(value, self.schema, out)
        return out.getvalue()

    def _enc(self, v: Any, sch: Any, out: io.BytesIO) -> None:
        if isinstance(sch, list):  # union: branch index, then value
            idx, branch = self._pick_branch(v, sch)
            _write_long(out, idx)
            self._enc(v, branch, out)
            return
        t = sch["type"] if isinstance(sch, dict) else sch
        if t == "null":
            return
        if t == "boolean":
            out.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            _write_long(out, int(v))
        elif t == "float":
            out.write(struct.pack("<f", float(v)))
        elif t == "double":
            out.write(struct.pack("<d", float(v)))
        elif t == "string":
            raw = str(v).encode("utf-8")
            _write_long(out, len(raw))
            out.write(raw)
        elif t == "bytes":
            _write_long(out, len(v))
            out.write(bytes(v))
        elif t == "record":
            for f in sch["fields"]:
                self._enc(None if v is None else v.get(f["name"]), f["type"], out)
        elif t == "array":
            items = list(v or [])
            if items:
                _write_long(out, len(items))
                for item in items:
                    self._enc(item, sch["items"], out)
            _write_long(out, 0)
        else:
            raise TypeError(f"unsupported Avro type: {t!r}")

    @staticmethod
    def _pick_branch(v: Any, union: list) -> tuple[int, Any]:
        # Documented subset: unions must be ["null", X]. With >1 non-null
        # branch the null/non-null discriminator below could pick the
        # wrong branch and emit bytes that decode as the wrong type —
        # fail loudly at encode time instead of corrupting the wire.
        non_null = [
            b for b in union
            if (b if isinstance(b, str) else b.get("type")) != "null"
        ]
        if len(non_null) > 1:
            raise TypeError(
                f"unsupported union with {len(non_null)} non-null branches "
                f"(codec subset is ['null', X]): {union}"
            )
        for i, branch in enumerate(union):
            name = branch if isinstance(branch, str) else branch.get("type")
            if (v is None) == (name == "null"):
                return i, branch
        raise TypeError(f"no union branch for {type(v)} in {union}")

    # -- decode ------------------------------------------------------------

    def decode(self, data: bytes) -> Any:
        return self._dec(self.schema, io.BytesIO(data))

    def _dec(self, sch: Any, buf: io.BytesIO) -> Any:
        if isinstance(sch, list):
            return self._dec(sch[_read_long(buf)], buf)
        t = sch["type"] if isinstance(sch, dict) else sch
        if t == "null":
            return None
        if t == "boolean":
            return _read_exact(buf, 1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", _read_exact(buf, 4))[0]
        if t == "double":
            return struct.unpack("<d", _read_exact(buf, 8))[0]
        if t == "string":
            return _read_exact(buf, _read_long(buf)).decode("utf-8")
        if t == "bytes":
            return _read_exact(buf, _read_long(buf))
        if t == "record":
            return {f["name"]: self._dec(f["type"], buf) for f in sch["fields"]}
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec option)
                    _read_long(buf)
                    n = -n
                out.extend(self._dec(sch["items"], buf) for _ in range(n))
        raise TypeError(f"unsupported Avro type: {t!r}")
