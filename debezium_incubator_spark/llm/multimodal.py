"""Multimodal column plumbing (SURVEY.md §2J J8): image/audio/video as
opaque binary columns with typed metadata, processed via Arrow-batched
mapInPandas.

The actual media codecs (PIL/ffmpeg/torchaudio) are NOT in this
container — the decode kernel is stubbed behind ``decode_image`` (raises
NotImplementedError) with a deterministic fake
(``fake_decode_features``) standing in so the Spark-side plumbing —
schema, batch iteration, partitioning, UDF signatures — is real and
tested end-to-end.

Scale notes (100 TB of media): binary payloads ride Parquet binary
columns; mapInPandas streams Arrow batches so one task never holds more
than spark.sql.execution.arrow.maxRecordsPerBatch payloads; decode is
embarrassingly parallel (no shuffle). Co-locate bytes with metadata at
write time (same row) to avoid a payload join. For very large assets,
store object-store URIs in the column instead and fetch inside the
kernel — same operator shape.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)


def decode_image(payload: bytes) -> dict:
    """Real media decode — requires an image codec library.

    STUB: PIL/opencv are not installed in this environment. Swap this
    for e.g. ``PIL.Image.open(io.BytesIO(payload))`` in a deployment
    with codecs; the surrounding Spark plumbing is unchanged.
    """
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use fake_decode_features for plumbing tests"
    )


def decode_bmp(payload: bytes) -> dict:
    """Real-format decode kernel with zero external deps: parses the
    uncompressed-BMP header (the public BITMAPFILEHEADER /
    BITMAPINFOHEADER layout) — it proves the ``decode_image`` swap-in
    seam with an actual codec, not a byte-derived fake. Returns the
    same feature dict shape as ``fake_decode_features`` so
    ``decode_features(media, kernel=decode_bmp)`` is a drop-in."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width = struct.unpack_from("<i", payload, 18)[0]
    height = abs(struct.unpack_from("<i", payload, 22)[0])  # may be top-down
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError("compressed BMP unsupported")
    pixels = payload[data_offset:]
    return {
        "width": width,
        "height": height,
        "checksum": sum(pixels[:4096]) % 65536,
        "n_bytes": len(payload),
    }


def fake_decode_features(payload: bytes) -> dict:
    """Deterministic stand-in for decode: derives pseudo 'dimensions' and
    a content checksum from the bytes alone."""
    n = len(payload)
    return {
        "width": (payload[0] % 64) + 1 if n else 0,
        "height": (payload[-1] % 64) + 1 if n else 0,
        "checksum": sum(payload[:256]) % 65536,
        "n_bytes": n,
    }


def to_media_table(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: payload =
    UTF-8 bytes of the text (a deterministic opaque blob), metadata
    struct alongside — the J8 storage shape."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


DECODED_SCHEMA = (
    "doc_id LONG, source STRING, width INT, height INT, checksum INT, n_bytes LONG"
)


def decode_features(media: DataFrame, kernel=fake_decode_features) -> DataFrame:
    """J8 decode / feature-extract over Arrow batches (mapInPandas).

    ``kernel`` is the per-payload decoder — ``fake_decode_features`` in
    this environment, a real codec in production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "source": [m["source"] for m in pdf["meta"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "n_bytes": [f["n_bytes"] for f in feats],
                }
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = "doc_id LONG, payload BINARY, width INT, height INT"


def resize_media(media: DataFrame, width: int = 32, height: int = 32,
                 kernel=None) -> DataFrame:
    """J8 resize: payload → payload' at (width, height), 1 row in → 1 row
    out. STUB kernel: a real deployment passes e.g.
    ``lambda p, w, h: pil_resize(p, w, h)``; the deterministic default
    resamples the byte stream to w*h bytes by striding — preserving the
    operator contract (binary in, binary out, fixed target dims) so the
    Spark plumbing (Arrow batches, schema, no shuffle) is real."""

    def fake_resize(payload: bytes, w: int, h: int) -> bytes:
        n = w * h
        if not payload:
            return b"\x00" * n
        step = max(1, len(payload) // n)
        out = payload[::step][:n]
        return out + b"\x00" * (n - len(out))

    k = kernel or fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [k(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id LONG, frame_idx INT, frame BINARY"


def sample_frames(media: DataFrame, frame_bytes: int = 64,
                  every_n: int = 4) -> DataFrame:
    """J8 frame-sample: video payload → every-nth frame, 1 row in → N
    rows out (the mapInPandas fan-out shape). STUB codec: frames are
    fixed-size byte windows; a real deployment decodes containers
    (ffmpeg) inside the same batch loop. No shuffle — expansion is
    partition-local; at 100 TB cap output row width via frame_bytes and
    let AQE coalesce the (larger) output partitions downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


@register("mm_frame_sample")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: frame-sampling fan-out + per-doc frame stats
    (deterministic: byte-window frames of the synthesized payload)."""
    media = to_media_table(table(spark, sf_dir, "documents"))
    frames = sample_frames(media)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max("frame_idx").alias("last_idx"),
            F.sum(F.length("frame")).alias("sampled_bytes"),
        )
        .orderBy("doc_id")
    )


@register(
    "mm_frame_portable",
    oracle="""
WITH f AS (
  SELECT doc_id, strlen(text) AS n,
         greatest(strlen(text) // 64, 1) AS nf
  FROM documents
), s AS (
  SELECT doc_id, list_transform(range(0, nf, 4), i -> i) AS idxs, n
  FROM f
)
SELECT doc_id,
       CAST(len(idxs) AS BIGINT) AS n_frames,
       CAST(idxs[-1] AS INT) AS last_idx,
       CAST(list_sum(list_transform(idxs,
            i -> least(greatest(n - i * 64, 0), 64))) AS BIGINT) AS sampled_bytes
FROM s ORDER BY doc_id
""",
)
def mm_frame_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential twin for the J8 frame-sampling fan-out (1 row in →
    N rows out through mapInPandas): the byte-window framing rule
    (nf = max(len/64, 1) frames, every 4th sampled, window i carries
    min(64, len−64i) bytes) is recomputed arithmetically in SQL from
    strlen(text), so the Arrow fan-out's row multiplicity, indices, and
    byte accounting are all hash-pinned. ASCII byte/codepoint caveat as
    in mm_decode_portable. mm_frame_sample stays the rows-only
    generic-binary exhibit."""
    media = to_media_table(table(spark, sf_dir, "documents"))
    frames = sample_frames(media)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max("frame_idx").alias("last_idx"),
            F.sum(F.length("frame")).cast("bigint").alias("sampled_bytes"),
        )
        .orderBy("doc_id")
    )


@register("mm_decode_stats")
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: full multimodal pipeline — binary payload column +
    metadata struct → Arrow-batched decode kernel → per-source feature
    stats. Deterministic (fake decoder is byte-derived)."""
    docs = table(spark, sf_dir, "documents")
    decoded = decode_features(to_media_table(docs))
    return (
        decoded.groupBy("source")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.max("checksum").alias("max_checksum"),
        )
        .orderBy("source")
    )


@register(
    "mm_decode_portable",
    oracle="""
WITH f AS (
  SELECT source,
         ascii(text[1]) % 64 + 1 AS width,
         ascii(text[-1]) % 64 + 1 AS height,
         list_sum(list_transform(range(1, least(strlen(text), 256) + 1),
                  i -> ascii(text[i]))) % 65536 AS checksum,
         strlen(text) AS n_bytes
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_assets,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       floor(CAST(SUM(width) AS DOUBLE) / COUNT(*) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS avg_width,
       CAST(SUM(height) AS BIGINT) AS sum_height,
       CAST(SUM(checksum) AS BIGINT) AS sum_checksum
FROM f GROUP BY source ORDER BY source
""",
)
def mm_decode_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential twin for the J8 decode seam (round-4 upgrade): the
    synthesized payload is the UTF-8 bytes of `text` and the stand-in
    kernel's features are pure byte arithmetic, so the ORACLE can
    recompute width/height/checksum/n_bytes character-wise in SQL while
    the engine runs the real pipeline — binary column construction →
    Arrow mapInPandas batches → Python kernel → per-source aggregation.
    Hash equality proves the Arrow round trip is byte-faithful and the
    batch iteration loses/duplicates nothing.

    Parity note: byte-vs-codepoint equivalence holds because the
    fixture text is ASCII (vocabulary words + spaces); a regenerated
    non-ASCII fixture would fail this sweep loudly rather than
    silently drifting (the checksum sums pin EVERY payload, not just
    extrema). mm_decode_stats stays rows-only as the generic-binary
    exhibit; this is its portable twin, like dedup_minhash_portable."""
    docs = table(spark, sf_dir, "documents")
    decoded = decode_features(to_media_table(docs))
    return (
        decoded.groupBy("source")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.expr(
                "floor(CAST(SUM(width) AS DOUBLE) / COUNT(*) * 10000 + 0.5)"
                " / CAST(10000 AS DOUBLE)"
            ).alias("avg_width"),
            F.sum("height").cast("bigint").alias("sum_height"),
            F.sum("checksum").cast("bigint").alias("sum_checksum"),
        )
        .orderBy("source")
    )


# --- audio modality (real zero-dep format: WAV/RIFF + PCM16) -------------

def make_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Build a minimal PCM16 WAV file (RIFF + fmt + data chunks) — the
    deterministic test-fixture generator for the audio kernel.
    ``samples`` are interleaved int16 values."""
    import struct

    pcm = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """Audio analog of ``decode_bmp``: parses the public RIFF/WAVE
    container with zero external deps — walks chunks to the ``fmt `` and
    ``data`` sections and computes exact integer PCM16 statistics. Proves
    the audio decode seam with a REAL format; swap for soundfile/librosa
    kernels in a deployment with codecs (same dict shape)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_ck, data_ck = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_ck = body
        elif cid == b"data":
            data_ck = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_ck is None or data_ck is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", fmt_ck, 0)
    bits = struct.unpack_from("<H", fmt_ck, 14)[0]
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    n = len(data_ck) // 2
    samples = struct.unpack(f"<{n}h", data_ck[: n * 2])
    peak = max((abs(s) for s in samples), default=0)
    energy = sum(s * s for s in samples)
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "n_samples": n // max(channels, 1),
        "peak": peak,
        "energy": energy,
    }


AUDIO_SCHEMA = (
    "doc_id LONG, channels INT, sample_rate INT, n_samples LONG,"
    " peak INT, energy LONG"
)


def audio_features(media: DataFrame, kernel=decode_wav) -> DataFrame:
    """J8 audio decode / feature-extract over Arrow batches — identical
    plumbing to ``decode_features`` (mapInPandas, partition-local, no
    shuffle); only the kernel and the typed output schema differ."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "channels": [f["channels"] for f in feats],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_samples": [f["n_samples"] for f in feats],
                    "peak": [f["peak"] for f in feats],
                    "energy": [f["energy"] for f in feats],
                }
            )

    return media.mapInPandas(run, AUDIO_SCHEMA)


def decode_features_arrow(media: DataFrame, kernel=fake_decode_features) -> DataFrame:
    """J8/K7 decode via ``mapInArrow`` — the Arrow-native sibling of
    :func:`decode_features`: batches stay as Arrow RecordBatches end to
    end (no pandas materialization, no index/dtype coercion), which is
    the cheapest Python seam Spark offers for binary-payload kernels.
    Same kernel contract and output schema as the pandas path; the
    equality test pins the two seams to identical results."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            payloads = tbl.column("payload").to_pylist()
            metas = tbl.column("meta").to_pylist()
            feats = [kernel(p) for p in payloads]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": tbl.column("doc_id").combine_chunks(),
                    "source": pa.array([m["source"] for m in metas]),
                    "width": pa.array(
                        [f["width"] for f in feats], type=pa.int32()
                    ),
                    "height": pa.array(
                        [f["height"] for f in feats], type=pa.int32()
                    ),
                    "checksum": pa.array(
                        [f["checksum"] for f in feats], type=pa.int32()
                    ),
                    "n_bytes": pa.array(
                        [f["n_bytes"] for f in feats], type=pa.int64()
                    ),
                }
            )

    return media.mapInArrow(run, DECODED_SCHEMA)


def decode_ppm(payload: bytes) -> dict:
    """Second real-format kernel (binary PPM, 'P6' — the Netpbm spec):
    unlike decode_bmp this one walks the WHOLE pixel payload, proving
    the seam carries full-image decode work, not just header parsing.
    Handles the spec's whitespace/comment grammar ('#' to end-of-line
    anywhere between header tokens); refuses maxval != 255 and short
    pixel data loudly. Same feature-dict shape as the other kernels, so
    ``decode_features(media, kernel=decode_ppm)`` is a drop-in."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM payload (missing 'P6' magic)")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos:pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while (pos < len(payload)
                   and not payload[pos:pos + 1].isspace()):
                pos += 1
            tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw RGB
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = width * height * 3
    pixels = payload[pos:pos + need]
    if len(pixels) < need:
        raise ValueError(
            f"short PPM pixel data: {len(pixels)} < {need}"
        )
    return {
        "width": width,
        "height": height,
        "checksum": sum(pixels) % 65536,   # full-payload decode
        "n_bytes": len(payload),
    }


def decode_png(payload: bytes) -> dict:
    """Third real-format kernel — PNG (non-interlaced, 8-bit RGB/RGBA/
    gray), decoded with nothing but the standard library: chunk walk,
    zlib-inflate of the IDAT stream, and full scanline UNFILTERING
    (all five filter types of the spec, including Paeth prediction).
    Unlike BMP/PPM this proves the seam carries real per-pixel
    COMPUTE — every byte passes through the predictor — not just a
    compressed-payload checksum. Same feature-dict shape as the other
    kernels, so ``decode_features(media, kernel=decode_png)`` is a
    drop-in. Interlaced (Adam7), paletted, and 16-bit images refuse
    loudly rather than decode wrongly."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG not supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise ValueError(
                    f"unsupported PNG color type {color_type} "
                    "(paletted images need a PLTE decoder)"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected "
            f"{(stride + 1) * height}"
        )
    prev = bytearray(stride)
    checksum = 0
    for y in range(height):
        row = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        ftype = raw[y * (stride + 1)]
        if ftype == 1:    # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:  # None
            raise ValueError(f"unknown PNG filter type {ftype}")
        checksum = (checksum + sum(row)) % 65536
        prev = row
    return {
        "width": width,
        "height": height,
        "checksum": checksum,     # sum over UNFILTERED pixel bytes
        "n_bytes": len(payload),
    }


def decode_qoi(payload: bytes) -> dict:
    """Fourth real-format kernel — QOI ("Quite OK Image", the 2021
    one-page spec): a stateful per-pixel decode (64-slot color hash
    index, previous-pixel runs, DIFF/LUMA deltas) that no SQL
    expression could express — exactly the kind of sequential codec
    the mapInPandas seam exists to host. All six op types decoded;
    truncated streams and bad magic refuse loudly. Same feature-dict
    shape as the other kernels."""
    import struct

    if payload[:4] != b"qoif":
        raise ValueError("not a QOI payload (bad magic)")
    if len(payload) < 14 + 8:
        raise ValueError("truncated QOI header")
    width, height = struct.unpack(">II", payload[4:12])
    channels, _colorspace = payload[12], payload[13]
    if channels not in (3, 4):
        raise ValueError(f"unsupported QOI channels {channels}")
    n_px = width * height
    pos = 14
    r = g = b = 0
    a = 255
    index = [(0, 0, 0, 0)] * 64
    checksum = 0
    decoded = 0
    end = len(payload) - 8  # stream end marker: 7x00 + 01
    while decoded < n_px:
        if pos >= end:
            raise ValueError(
                f"truncated QOI stream: {decoded} of {n_px} pixels"
            )
        b1 = payload[pos]
        pos += 1
        run = 1
        if b1 == 0xFE:                      # QOI_OP_RGB
            r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
            pos += 3
        elif b1 == 0xFF:                    # QOI_OP_RGBA
            r, g, b, a = (payload[pos], payload[pos + 1],
                          payload[pos + 2], payload[pos + 3])
            pos += 4
        else:
            tag = b1 >> 6
            if tag == 0:                    # QOI_OP_INDEX
                r, g, b, a = index[b1 & 0x3F]
            elif tag == 1:                  # QOI_OP_DIFF (bias 2)
                r = (r + ((b1 >> 4) & 3) - 2) & 0xFF
                g = (g + ((b1 >> 2) & 3) - 2) & 0xFF
                b = (b + (b1 & 3) - 2) & 0xFF
            elif tag == 2:                  # QOI_OP_LUMA (bias 32 / 8)
                b2 = payload[pos]
                pos += 1
                dg = (b1 & 0x3F) - 32
                r = (r + dg - 8 + ((b2 >> 4) & 0x0F)) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg - 8 + (b2 & 0x0F)) & 0xFF
            else:                           # QOI_OP_RUN (bias -1)
                run = (b1 & 0x3F) + 1
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        take = min(run, n_px - decoded)
        checksum = (checksum + take * (r + g + b + a)) % 65536
        decoded += take
    if payload[end:] != b"\x00" * 7 + b"\x01":
        raise ValueError("missing QOI end marker")
    return {
        "width": width,
        "height": height,
        "checksum": checksum,
        "n_bytes": len(payload),
    }
