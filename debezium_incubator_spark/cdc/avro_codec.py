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


# --- Confluent schema-registry wire framing -------------------------------
#
# Kafka Connect's Avro converter does not ship bare Avro: every message
# is framed as [magic 0x00][schema id: 4-byte big-endian][avro payload]
# (the public Confluent wire format). The id resolves the WRITER schema
# at a registry, which is what makes schema evolution decodable: old
# messages carry old ids. This models that framing plus a minimal
# in-process registry (subject -> versioned schema ids, content-dedup),
# so envelope streams with mixed schema versions round-trip.

CONFLUENT_MAGIC = 0x00


def frame_confluent(schema_id: int, payload: bytes) -> bytes:
    """Wrap an Avro binary payload in the Confluent wire format."""
    if not 0 <= schema_id < 1 << 32:
        raise ValueError(f"schema id out of range: {schema_id}")
    return bytes([CONFLUENT_MAGIC]) + schema_id.to_bytes(4, "big") + payload


def unframe_confluent(data: bytes) -> tuple[int, bytes]:
    """Split framed wire bytes into (schema_id, avro_payload); raises on
    a wrong magic byte or truncated header — never silently misreads."""
    if len(data) < 5:
        raise EOFError(f"truncated Confluent frame: {len(data)} bytes")
    if data[0] != CONFLUENT_MAGIC:
        raise ValueError(f"bad magic byte 0x{data[0]:02x} (want 0x00)")
    return int.from_bytes(data[1:5], "big"), data[5:]


class IncompatibleSchemaError(ValueError):
    """A register() rejected by the subject's compatibility mode —
    the same 409 the Confluent Schema Registry returns."""


#: Avro schema-resolution promotions (writer type → reader types that
#: can read it), per the public Avro spec resolution rules.
_PROMOTABLE = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


def can_read(reader, writer) -> str | None:
    """Avro schema-resolution check over the codec's supported subset
    (records / unions / arrays / primitives): can data WRITTEN with
    ``writer`` be READ with ``reader``? Returns None when compatible,
    else a human-readable reason (the first incompatibility found).
    This is the primitive both Confluent directions are built from:
    BACKWARD = can_read(new, old); FORWARD = can_read(old, new)."""
    # union writer: every branch a reader must be able to read
    if isinstance(writer, list) and not isinstance(reader, list):
        for br in writer:
            why = can_read(reader, br)
            if why:
                return f"union branch unreadable: {why}"
        return None
    # union reader: some branch must read the writer
    if isinstance(reader, list):
        ws = writer if isinstance(writer, list) else [writer]
        for w in ws:
            if not any(can_read(r, w) is None for r in reader):
                return f"no reader union branch reads writer type {w!r}"
        return None
    if isinstance(reader, str) and isinstance(writer, str):
        if reader in _PROMOTABLE.get(writer, ()):
            return None
        return f"type {writer!r} not promotable to {reader!r}"
    rt = reader.get("type") if isinstance(reader, dict) else reader
    wt = writer.get("type") if isinstance(writer, dict) else writer
    if rt == "array" and wt == "array":
        return can_read(reader["items"], writer["items"])
    if rt == "record" and wt == "record":
        wfields = {f["name"]: f for f in writer["fields"]}
        for rf in reader["fields"]:
            wf = wfields.get(rf["name"])
            if wf is None:
                if "default" not in rf:
                    return (
                        f"reader field {rf['name']!r} absent from writer "
                        "and has no default"
                    )
                continue
            why = can_read(rf["type"], wf["type"])
            if why:
                return f"field {rf['name']!r}: {why}"
        return None
    # dict-wrapped primitive (e.g. {"type": "long"})
    if isinstance(rt, str) and isinstance(wt, str):
        return can_read(rt, wt)
    return f"unsupported schema pair reader={rt!r} writer={wt!r}"


#: mode → (check new-vs-old?, check old-vs-new?, against all versions?)
_COMPAT_MODES = {
    "NONE": (False, False, False),
    "BACKWARD": (True, False, False),
    "FORWARD": (False, True, False),
    "FULL": (True, True, False),
    "BACKWARD_TRANSITIVE": (True, False, True),
    "FORWARD_TRANSITIVE": (False, True, True),
    "FULL_TRANSITIVE": (True, True, True),
}


class ConfluentAvroRegistry:
    """Minimal Confluent-style registry: monotonically assigned global
    schema ids, per-subject version lists, content dedup (re-registering
    an identical schema returns the existing id), and per-subject
    COMPATIBILITY enforcement (the public Confluent modes: BACKWARD /
    FORWARD / FULL, each with a _TRANSITIVE variant checking every
    version instead of just the latest). Control-plane only — a
    deployment points this at a real registry URL; the wire format is
    identical either way.

    ``default_compatibility``: this in-memory registry defaults to
    NONE (check nothing) so callers opt in explicitly; note the real
    Confluent SERVER default is BACKWARD — production deployments
    should construct with that."""

    def __init__(self, default_compatibility: str = "NONE") -> None:
        if default_compatibility not in _COMPAT_MODES:
            raise ValueError(
                f"unknown compatibility mode {default_compatibility!r}"
            )
        self._by_id: dict[int, dict] = {}
        self._codecs: dict[int, AvroCodec] = {}
        self._subjects: dict[str, list[int]] = {}
        self._ids_by_canon: dict[str, int] = {}
        self._next_id = 1
        self._default_compat = default_compatibility
        self._compat: dict[str, str] = {}

    def set_compatibility(self, subject: str, mode: str) -> None:
        if mode not in _COMPAT_MODES:
            raise ValueError(f"unknown compatibility mode {mode!r}")
        self._compat[subject] = mode

    def compatibility(self, subject: str) -> str:
        return self._compat.get(subject, self._default_compat)

    def _check_compat(self, subject: str, new: dict) -> None:
        mode = self.compatibility(subject)
        new_reads_old, old_reads_new, transitive = _COMPAT_MODES[mode]
        versions = self._subjects.get(subject, [])
        if not versions:
            return
        against = versions if transitive else versions[-1:]
        for sid in against:
            old = self._by_id[sid]
            if new_reads_old:
                why = can_read(new, old)
                if why:
                    raise IncompatibleSchemaError(
                        f"{mode} violated for {subject!r} vs schema id "
                        f"{sid}: new cannot read old — {why}"
                    )
            if old_reads_new:
                why = can_read(old, new)
                if why:
                    raise IncompatibleSchemaError(
                        f"{mode} violated for {subject!r} vs schema id "
                        f"{sid}: old cannot read new — {why}"
                    )

    def register(self, subject: str, schema: str | dict) -> int:
        sch = json.loads(schema) if isinstance(schema, str) else schema
        canon = json.dumps(sch, sort_keys=True, separators=(",", ":"))
        sid = self._ids_by_canon.get(canon)
        # an id already in the subject's version list re-registers as a
        # no-op (content dedup) WITHOUT a compatibility check, like the
        # real registry; a schema new TO THIS SUBJECT is checked even
        # if another subject already minted its id
        if sid is None or sid not in self._subjects.get(subject, []):
            self._check_compat(subject, sch)
        if sid is None:
            sid = self._next_id
            self._next_id += 1
            self._ids_by_canon[canon] = sid
            self._by_id[sid] = sch
            self._codecs[sid] = AvroCodec(sch)
        versions = self._subjects.setdefault(subject, [])
        if sid not in versions:
            versions.append(sid)
        return sid

    def schema_by_id(self, schema_id: int) -> dict:
        if schema_id not in self._by_id:
            raise KeyError(f"unknown schema id {schema_id}")
        return self._by_id[schema_id]

    def latest_id(self, subject: str) -> int:
        return self._subjects[subject][-1]

    def encode(self, subject: str, value, schema_id: int | None = None) -> bytes:
        """Encode ``value`` under the subject's latest (or an explicit)
        schema id and frame it for the wire."""
        sid = schema_id if schema_id is not None else self.latest_id(subject)
        return frame_confluent(sid, self._codecs[sid].encode(value))

    def decode(self, data: bytes) -> tuple[int, dict]:
        """Unframe + decode with the embedded WRITER schema — mixed-
        version topics decode correctly message by message."""
        sid, payload = unframe_confluent(data)
        if sid not in self._codecs:
            raise KeyError(f"unknown schema id {sid}")
        return sid, self._codecs[sid].decode(payload)
