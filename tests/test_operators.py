"""Unit tests for the reusable engine operator functions (the API a
consumer calls directly, beyond the registered queries)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.envelope import (
    EVENT_ROW_SCHEMA,
    parse_envelope,
    to_envelope,
    unwrap,
)
from debezium_incubator_spark.cdc.materialize import materialize_latest
from debezium_incubator_spark.llm.dedup import dedup_exact_op
from debezium_incubator_spark.llm.multimodal import (
    decode_features,
    fake_decode_features,
    to_media_table,
)
from debezium_incubator_spark.llm.similarity import l2_normalize, norm_sq
from debezium_incubator_spark.operators.joins import asof_join
from debezium_incubator_spark.operators.scans import (
    mask_columns,
    project,
    truncate_columns,
)
from debezium_incubator_spark.operators.windows import topk_per_group

from .conftest import SF_SMOKE


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 25), (3, "x", 5)], "id INT, key STRING, t INT"
    )
    right = spark.createDataFrame(
        [("k", 5, "a"), ("k", 20, "b"), ("k", 30, "c"), ("x", 9, "d")],
        "key STRING, t INT, val STRING",
    )
    out = asof_join(left, right, ["key"], "id", "t", "t").select(
        "__l.id", "__r.val"
    ).toPandas().sort_values("id")
    # id=1: latest right t<=10 is t=5 → a; id=2: t=20 → b; id=3: none ≤5
    assert out.set_index("id")["val"].to_dict() == {1: "a", 2: "b"}


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, "k", 10)], "id INT, key STRING, t INT")
    right = spark.createDataFrame(
        [("k", 5, "a"), ("k", 20, "b")], "key STRING, t INT, val STRING"
    )
    out = asof_join(
        left, right, ["key"], "id", "t", "t", direction="forward"
    ).select("__r.val").toPandas()
    assert list(out.val) == ["b"]


def test_envelope_roundtrip_and_unwrap(spark):
    ev = table(spark, SF_SMOKE, "events").limit(100)
    wire = to_envelope(ev, as_json=True)
    parsed = parse_envelope(wire, EVENT_ROW_SCHEMA)
    flat = unwrap(parsed)
    pdf = flat.toPandas()
    assert len(pdf) == 100
    assert set(["event_id", "user_id", "value", "__op", "__ts_ms", "__deleted", "__pos"]) <= set(pdf.columns)
    # deletes carry the before-image and the flag
    assert (pdf[pdf.__op == "d"].__deleted).all()
    assert pdf.event_id.notna().all()


def test_unwrap_drops_tombstones(spark):
    ev = table(spark, SF_SMOKE, "events").limit(10)
    env = to_envelope(ev)
    # synthesize tombstones: null value rows appended
    tomb = env.select("key", F.lit(None).cast(env.schema["value"].dataType).alias("value"))
    with_tomb = env.unionByName(tomb)
    flat = unwrap(with_tomb)
    assert flat.count() == 10  # tombstones filtered


def test_materialize_latest_deletes_win(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "c", 10.0),
            (1, 2, "u", 20.0),
            (2, 1, "c", 5.0),
            (2, 2, "d", None),
        ],
        "k INT, pos INT, __op STRING, v DOUBLE",
    )
    out = materialize_latest(df, ["k"], ["pos"]).toPandas()
    assert list(out.k) == [1]
    assert list(out.v) == [20.0]


def test_dedup_exact_op_keeps_min_doc_id(spark):
    df = spark.createDataFrame(
        [(1, "Hello World "), (2, "hello world"), (3, "other")],
        "doc_id LONG, text STRING",
    )
    out = dedup_exact_op(df).toPandas()
    assert sorted(out.doc_id) == [1, 3]


def test_topk_per_group(spark):
    o = table(spark, SF_SMOKE, "orders")
    out = topk_per_group(
        o.select("o_custkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice")],
        2,
    )
    counts = out.groupBy("o_custkey").count().toPandas()
    assert (counts["count"] <= 2).all()


def test_l2_normalize(spark):
    em = table(spark, SF_SMOKE, "embeddings").limit(50)
    v = em.withColumn("v", F.col("embedding").cast("array<double>"))
    normed = v.withColumn("nv", l2_normalize(F.col("v")))
    check = normed.select(norm_sq("nv").alias("n")).toPandas()
    assert ((check.n - 1.0).abs() < 1e-9).all()


def test_scan_transforms(spark):
    c = table(spark, SF_SMOKE, "customer").limit(5)
    p = project(c, include=["c_custkey", "c_name"])
    assert p.columns == ["c_custkey", "c_name"]
    m = mask_columns(p, mask_with_length={"c_name": 4}).toPandas()
    assert (m.c_name == "****").all()
    t = truncate_columns(
        c.select("c_name"), {"c_name": 3}
    ).toPandas()
    assert (t.c_name.str.len() <= 3).all()


def test_multimodal_decode_plumbing(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(20)
    media = to_media_table(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = decode_features(media).toPandas()
    assert len(decoded) == 20
    # kernel determinism: checksum derived from payload bytes
    one = docs.select("text").first().text.encode()
    assert decoded.iloc[0].checksum == sum(one[:256]) % 65536
    assert (decoded.n_bytes > 0).all()


def test_decode_image_refuses_unknown_formats():
    # round 13: decode_image is REAL (dispatches to the JPEG/PNG/BMP/
    # PPM/QOI kernels — tests/test_jpeg.py covers the decode paths);
    # unknown or truncated magics must refuse loudly, never guess.
    from debezium_incubator_spark.llm.multimodal import decode_image

    with pytest.raises(ValueError, match="unrecognized image payload"):
        decode_image(b"\x89PNG")  # truncated magic: not a real PNG
    with pytest.raises(ValueError, match="unrecognized image payload"):
        decode_image(b"GIF89a\x00\x00")


def test_multimodal_resize_plumbing(spark):
    from debezium_incubator_spark.llm.multimodal import resize_media

    docs = table(spark, SF_SMOKE, "documents").limit(10)
    out = resize_media(to_media_table(docs), width=8, height=4).toPandas()
    assert len(out) == 10
    assert (out.width == 8).all() and (out.height == 4).all()
    # contract: every output payload is exactly w*h bytes
    assert all(len(p) == 32 for p in out.payload)


def test_multimodal_frame_sample_fanout(spark):
    from debezium_incubator_spark.llm.multimodal import sample_frames

    docs = table(spark, SF_SMOKE, "documents").limit(10)
    media = to_media_table(docs)
    frames = sample_frames(media, frame_bytes=16, every_n=2).toPandas()
    # 1 → N expansion: more frame rows than assets, stride honored
    assert len(frames) > 10
    assert set(frames.frame_idx % 2) == {0}
    n0 = len(media.first().payload) // 16
    got0 = frames[frames.doc_id == frames.doc_id.iloc[0]]
    assert len(got0) == (max(1, n0) + 1) // 2


def _make_bmp(width: int, height: int, seed: int) -> bytes:
    """Minimal 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up padded pixel rows)."""
    import struct

    row = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    pixel_bytes = bytearray()
    for y in range(height):
        for x in range(width):
            pixel_bytes += bytes(
                ((seed + x * 7 + y * 13 + c) % 256 for c in range(3))
            )
        pixel_bytes += b"\x00" * (row - width * 3)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixel_bytes), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixel_bytes), 2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(pixel_bytes)


def test_multimodal_bmp_decode_seam(spark):
    """The decode_image swap-in seam with a REAL format: generated BMP
    payloads flow through the same Arrow mapInPandas plumbing with
    decode_bmp as the kernel, and the parsed dimensions come from the
    actual header bytes, not a fake."""
    from debezium_incubator_spark.llm.multimodal import (
        DECODED_SCHEMA,
        decode_bmp,
        decode_features,
    )

    dims = [(5, 3), (16, 16), (7, 1), (33, 2)]
    rows = [
        (i, _make_bmp(w, h, seed=i), ("image/bmp", None, f"src_{i % 2}"))
        for i, (w, h) in enumerate(dims)
    ]
    media = spark.createDataFrame(
        rows, "doc_id LONG, payload BINARY, "
        "meta STRUCT<mime: STRING, n_bytes: LONG, source: STRING>"
    )
    out = (
        decode_features(media, kernel=decode_bmp)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(zip(out.width, out.height)) == dims
    # checksum is content-derived: same image twice → equal, different
    # seed → different
    again = decode_bmp(_make_bmp(5, 3, seed=0))
    assert again["checksum"] == out.iloc[0].checksum
    assert decode_bmp(_make_bmp(5, 3, seed=99))["checksum"] != again["checksum"]
    # schema is the shared decode contract
    assert decode_features(media, kernel=decode_bmp).schema.simpleString() \
        == spark.createDataFrame([], DECODED_SCHEMA).schema.simpleString()
    # loud errors on non-BMP payloads
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"\x89PNG....")
    with pytest.raises(ValueError, match="compressed"):
        import struct

        bad = bytearray(_make_bmp(4, 4, seed=1))
        struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
        decode_bmp(bytes(bad))


def test_register_external_table_with_ns_timestamps(spark, tmp_path):
    """Arbitrary user parquet — including timestamp[ns] columns Spark
    can't read natively — registers and queries like a fixture table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_incubator_spark.catalog import (
        normalize_ns_timestamps,
        register_external,
    )

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [1704067200_000_000_000 + i * 1_000_000_500 for i in range(3)],
                pa.timestamp("ns"),
            ),
        }
    )
    p = str(tmp_path / "user_table.parquet")
    pq.write_table(t, p)
    df = register_external(spark, "user_table", p)
    assert dict(df.dtypes)["ts"] == "bigint"  # nanosAsLong read
    fixed = normalize_ns_timestamps(df, ["ts"])
    assert dict(fixed.dtypes)["ts"] == "timestamp_ntz"
    got = fixed.agg(F.min("ts").cast("string")).first()[0]
    assert got == "2024-01-01 00:00:00"
    assert spark.sql("SELECT count(*) n FROM user_table").first().n == 3


def test_quantized_knn_recall(spark):
    """int8 quantization must preserve neighborhood structure: the
    quantized top-10 of vec_id=0 overlaps the exact top-10 in >= 8 ids,
    and reconstruction error is bounded (cos(x, dequant(x)) > 0.999)."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.llm.similarity import (
        dequantize_embedding,
        dot,
        norm_sq,
        quantize_embedding,
    )
    from debezium_incubator_spark.registry import all_queries

    from .conftest import SF_SMOKE

    Q = all_queries()
    exact = {r.vec_id for r in Q["sim_knn"](spark, SF_SMOKE).collect()}
    quant = {r.vec_id for r in Q["sim_quantized_knn"](spark, SF_SMOKE).collect()}
    assert len(exact & quant) >= 8

    e = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .limit(50)
    )
    e = e.withColumn("dq", dequantize_embedding(quantize_embedding(F.col("v"))))
    fidelity = e.select(
        (dot("v", "dq") / (F.sqrt(norm_sq("v")) * F.sqrt(norm_sq("dq")))).alias("c")
    )
    assert fidelity.agg(F.min("c")).first()[0] > 0.999


def test_lsh_planted_neardup_recall(spark):
    """The LSH sieve's contract: pairs in the near-dup regime (cos ≈
    0.999 planted perturbations) are recovered as candidates with
    recall ≈ 1.0, while the candidate set stays well below all-pairs —
    the property that makes it the sub-quadratic path at scale."""
    from debezium_incubator_spark.llm.similarity import lsh_candidate_pairs

    from .conftest import SF_SMOKE

    e = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .filter(F.col("vec_id") < 100)
    )
    dup = e.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "v",
            lambda x, i: x
            + 0.02 * F.sin(i.cast("double") + F.col("vec_id").cast("double")),
        ).alias("v"),
    )
    corpus = e.union(dup)
    cands = {(r.vec_a, r.vec_b) for r in lsh_candidate_pairs(corpus).collect()}
    planted = {(i, i + 10000) for i in range(100)}
    recall = len(planted & cands) / len(planted)
    assert recall >= 0.95, f"planted near-dup recall {recall}"
    n = 200
    assert len(cands) < 0.6 * n * (n - 1) / 2, "sieve did not prune"


def test_simhash_banding_is_exact(spark):
    """Pigeonhole guarantee: banding the 64-bit signature into
    hamming_max+1 segments finds EXACTLY the all-pairs result set."""
    from debezium_incubator_spark.llm.dedup import (
        SIMHASH_HAMMING_MAX,
        simhash_signatures,
    )
    from debezium_incubator_spark.registry import all_queries

    from .conftest import SF_SMOKE

    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in all_queries()["dedup_simhash"](spark, SF_SMOKE).collect()
    }
    sig = simhash_signatures(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
            .select("doc_a", "doc_b", "hamming")
        ).collect()
    }
    assert banded == brute


def test_s1_blocked_matches_tiny_brute_force(spark):
    """The blocked cogroup gemm must equal a local numpy brute force at
    smoke scale (exactness of the block decomposition, incl. diagonal
    halving and cross-block orientation)."""
    import numpy as np

    from debezium_incubator_spark.registry import all_queries

    from .conftest import SF_SMOKE

    got = [
        (r.vec_a, r.vec_b)
        for r in all_queries()["s1_cosine_topk"](spark, SF_SMOKE).collect()
    ]
    pdf = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .toPandas()
    )
    ids = pdf["vec_id"].to_numpy()
    m = np.stack(pdf["v"].to_numpy())
    m /= np.sqrt((m * m).sum(axis=1, keepdims=True))
    s = m @ m.T
    mask = ids[:, None] < ids[None, :]
    ai, bj = np.nonzero(mask)
    order = np.lexsort((ids[bj], ids[ai], -s[ai, bj]))[:20]
    want = [(int(ids[ai[i]]), int(ids[bj[i]])) for i in order]
    assert got == want


def test_cms_heavy_hitters_accuracy(spark):
    """Count-min guarantee: estimate >= exact always, and within
    eps * total_tokens (w.h.p.; deterministic here with the fixed
    seed)."""
    from debezium_incubator_spark.llm.text import CMS_EPS, tokens
    from debezium_incubator_spark.registry import all_queries

    from .conftest import SF_SMOKE

    rows = all_queries()["t12_heavy_hitters_cms"](spark, SF_SMOKE).collect()
    assert len(rows) == 10
    total = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(tokens()).alias("t"))
        .count()
    )
    for r in rows:
        assert r.estimate >= r.exact, (r.term, r.exact, r.estimate)
        assert r.estimate <= r.exact + CMS_EPS * total, (r.term, r.exact, r.estimate)


def test_multimodal_wav_decode_seam(spark):
    """The audio analog of the BMP seam: generated PCM16 WAV payloads
    flow through the same Arrow mapInPandas plumbing with decode_wav as
    the kernel; channels/rate come from the real fmt chunk and the PCM
    stats are exact integers (verifiable in pure Python)."""
    from debezium_incubator_spark.llm.multimodal import (
        AUDIO_SCHEMA,
        audio_features,
        decode_wav,
        make_wav,
    )

    specs = [
        (8000, 1, [0, 100, -200, 300]),
        (16000, 2, [1000, -1000, 500, -500, 250, -250]),
        (44100, 1, list(range(-50, 50))),
    ]
    rows = [
        (i, make_wav(sr, ch, s), ("audio/wav", None, "src"))
        for i, (sr, ch, s) in enumerate(specs)
    ]
    media = spark.createDataFrame(
        rows, "doc_id LONG, payload BINARY, "
        "meta STRUCT<mime: STRING, n_bytes: LONG, source: STRING>"
    )
    out = (
        audio_features(media)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, (sr, ch, s) in enumerate(specs):
        r = out.iloc[i]
        assert (r.sample_rate, r.channels) == (sr, ch)
        assert r.n_samples == len(s) // ch
        assert r.peak == max(abs(x) for x in s)
        assert r.energy == sum(x * x for x in s)
    assert audio_features(media).schema.simpleString() \
        == spark.createDataFrame([], AUDIO_SCHEMA).schema.simpleString()
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")
    with pytest.raises(ValueError, match="PCM16"):
        import struct

        bad = bytearray(make_wav(8000, 1, [1, 2, 3]))
        struct.pack_into("<H", bad, 20, 3)  # IEEE-float fmt tag
        decode_wav(bytes(bad))


def test_decode_arrow_equals_pandas_seam(spark):
    """K7 mapInArrow: the Arrow-native decode seam produces exactly the
    rows of the mapInPandas seam (same kernel, same schema) — the two
    Python batch interfaces are interchangeable for binary kernels."""
    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.llm.multimodal import (
        decode_features,
        decode_features_arrow,
        to_media_table,
    )

    media = to_media_table(table(spark, SF_SMOKE, "documents").limit(200))
    a = decode_features_arrow(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    p = decode_features(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, p)
    assert decode_features_arrow(media).schema == decode_features(media).schema


def test_gopher_rules_line_and_symbol_gates(spark):
    """The rules the synthetic corpus can't exercise, pinned on crafted
    docs: bullet-line ratio, ellipsis-line ratio, symbol ratio, and the
    alpha-word gate each independently flip keep."""
    from debezium_incubator_spark.llm.text import gopher_quality

    base = ("the be to of and that have with " + "word " * 50).strip()
    docs = spark.createDataFrame(
        [
            (1, base),                                    # clean — keep
            (2, "\n".join("- item " + base for _ in range(3))),  # bullets
            (3, "\n".join(base + " more..." for _ in range(3))),  # ellipses
            (4, base + " " + "# " * 40),                  # symbol-heavy
            (5, base.replace("word", "1234")),            # low alpha
        ],
        "doc_id LONG, text STRING",
    )
    g = {
        r.doc_id: r
        for r in gopher_quality(docs, max_bullet_ratio=0.5).collect()
    }
    assert g[1].keep == 1
    assert g[2].keep == 0 and g[2]["__bullet_ratio"] == 1.0
    assert g[3].keep == 0 and g[3]["__ellipsis_ratio"] == 1.0
    assert g[4].keep == 0 and g[4]["__symbol_ratio"] > 0.1
    assert g[5].keep == 0 and g[5]["__alpha_ratio"] < 0.8
    # stopword gate: distinct-count, not occurrences
    assert g[1].n_gopher_stop == 8
    rep = spark.createDataFrame(
        [(9, "the the the be " + "word " * 60)], "doc_id LONG, text STRING"
    )
    # 4 stopword OCCURRENCES but only 2 distinct — occurrence-count
    # semantics would report 4 here
    assert gopher_quality(rep).collect()[0].n_gopher_stop == 2


def test_truncated_rerank_funnel_properties(spark):
    """The funnel's mechanical guarantees (what holds on ANY data, as
    opposed to recall, which depends on prefix informativeness — see
    the docstring's measured caveat): exactly k results, every result
    drawn from the stage-1 candidate cut, scores equal the exact
    cosine for those ids."""
    from debezium_incubator_spark.registry import all_queries

    Q = all_queries()
    sf = "/root/testdata/sf0.001"
    out = Q["sim_truncated_rerank"](spark, sf).collect()
    assert len(out) == 10
    exact = {r.vec_id: r.cos_sim for r in Q["sim_knn"](spark, sf).collect()}
    # any funnel id that IS in the exact top-10 must carry the exact score
    for r in out:
        if r.vec_id in exact:
            assert r.cos_sim == exact[r.vec_id]


def _make_ppm(w, h, seed=0, comment=False):
    head = b"P6\n"
    if comment:
        head += b"# a netpbm comment\n"
    head += f"{w} {h}\n255\n".encode()
    px = bytes((seed + i) % 256 for i in range(w * h * 3))
    return head + px


def test_decode_ppm_kernel_full_pixel_decode(spark):
    """The PPM kernel walks the whole pixel payload (checksum moves
    with ANY pixel change), honors header comments, and refuses
    truncated data — through the same mapInPandas seam as BMP."""
    import pytest as _pt

    from debezium_incubator_spark.llm.multimodal import (
        decode_features,
        decode_ppm,
    )

    d = decode_ppm(_make_ppm(4, 3, seed=1, comment=True))
    assert (d["width"], d["height"]) == (4, 3)
    base = decode_ppm(_make_ppm(4, 3, seed=1))["checksum"]
    bumped = bytearray(_make_ppm(4, 3, seed=1))
    bumped[-1] = (bumped[-1] + 1) % 256       # last pixel byte changes
    assert decode_ppm(bytes(bumped))["checksum"] != base

    with _pt.raises(ValueError, match="short PPM"):
        decode_ppm(_make_ppm(4, 3)[:-5])
    with _pt.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\0" * 24)

    from pyspark.sql import functions as _F

    media = spark.createDataFrame(
        [(1, _make_ppm(6, 2, seed=7)), (2, _make_ppm(3, 5, seed=9))],
        "doc_id LONG, payload BINARY",
    ).withColumn("meta", _F.struct(
        _F.lit("image/x-portable-pixmap").alias("mime"),
        _F.length("payload").cast("long").alias("n_bytes"),
        _F.lit("test").alias("source"),
    ))
    rows = {r.doc_id: (r.width, r.height)
            for r in decode_features(media, kernel=decode_ppm).collect()}
    assert rows == {1: (6, 2), 2: (3, 5)}


def test_binary_hamming_funnel_recall_and_identities(spark):
    """64-bit sign signatures must preserve neighborhood structure
    (the binary top-10 of vec_id=0 overlaps the exact top-10 in >= 7
    ids on the smoke fixture — measured 8, deterministic), and the
    packed Hamming distance satisfies the metric identities: d(x,x)=0,
    d(x,-x)=64 for a vector with no zero components."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.llm.similarity import (
        binarize_embedding,
        hamming_distance,
    )
    from debezium_incubator_spark.registry import all_queries

    from .conftest import SF_SMOKE

    Q = all_queries()
    exact = {r.vec_id for r in Q["sim_knn"](spark, SF_SMOKE).collect()}
    binr = {r.vec_id for r in Q["sim_binary_hamming"](spark, SF_SMOKE).collect()}
    assert len(exact & binr) >= 7

    e = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .limit(20)
        .withColumn("neg", F.transform("v", lambda x: -x))
        .withColumn("sig", binarize_embedding(F.col("v")))
        .withColumn("nsig", binarize_embedding(F.col("neg")))
        .withColumn("d_self", hamming_distance(F.col("sig"), F.col("sig")))
        .withColumn("d_flip", hamming_distance(F.col("sig"), F.col("nsig")))
        .withColumn(
            "zeros", F.size(F.filter("v", lambda x: x == 0))
        )
    )
    rows = e.collect()
    assert all(r["d_self"] == 0 for r in rows)
    assert all(r["d_flip"] == 64 for r in rows if r["zeros"] == 0)


def test_boilerplate_removal_semantics(spark):
    """A segment in >= MIN_DF distinct docs vanishes from EVERY doc
    (including repeat occurrences inside one doc), a doc that is pure
    boilerplate is dropped entirely, and within-one-doc repetition
    alone does NOT trigger removal (df counts DISTINCT docs)."""
    from pyspark.sql import functions as F

    import debezium_incubator_spark.llm.text as X

    banner = "cookie notice here"
    docs = spark.createDataFrame(
        [
            (1, banner + " alpha beta gamma"),
            (2, banner + " delta eps zeta"),
            (3, banner),                          # pure boilerplate
            (4, "self rep one self rep one self rep one"),  # df=1, 3x
        ],
        "doc_id bigint, text string",
    )
    docs.createOrReplaceTempView("boiler_docs")
    orig_table = X.table
    try:
        X.table = lambda spark_, sf_dir_, name_: docs
        out = {r["doc_id"]: r for r in
               X.t35_boilerplate_lines(spark, "unused").collect()}
    finally:
        X.table = orig_table
    assert set(out) == {1, 2, 4}                  # doc 3 dropped
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[2]["clean_text"] == "delta eps zeta"
    assert out[1]["n_seg"] == 2 and out[1]["n_kept"] == 1
    # df counts DISTINCT docs: doc 4's thrice-repeated segment survives
    assert out[4]["n_kept"] == 3
    assert out[4]["clean_text"] == "self rep one self rep one self rep one"


def test_jl_projection_recall_and_matrix_portability(spark):
    """The 64→32 sign projection preserves enough neighborhood
    structure on the (near-random — tiny cosine margins) smoke corpus
    to recall >= 8/10 of the exact top-10 through a 100-candidate
    funnel; and the Python-side sign matrix equals the md5 derivation
    the oracle uses (portability of the matrix IS the oracle's
    premise)."""
    import hashlib

    from debezium_incubator_spark.llm.similarity import _jl_sign
    from debezium_incubator_spark.registry import all_queries

    from .conftest import SF_SMOKE

    for i, j in [(0, 0), (5, 3), (63, 31), (17, 29)]:
        top = hashlib.md5(f"{i}-{j}".encode()).hexdigest()[0]
        assert _jl_sign(i, j) == (1 if top in "01234567" else -1)

    Q = all_queries()
    exact = {r.vec_id for r in Q["sim_knn"](spark, SF_SMOKE).collect()}
    jl = {r.vec_id for r in Q["sim_jl_projection"](spark, SF_SMOKE).collect()}
    assert len(exact & jl) >= 8


def test_token_budget_greedy_prefix_semantics(spark):
    """A document is kept iff the running per-source token sum
    INCLUDING it fits the budget; once a doc overshoots, everything
    after it in the deterministic order is out (cum is monotone), and
    budgets are per-source (one source exhausting doesn't cut
    another)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    import debezium_incubator_spark.llm.text as X

    docs = spark.createDataFrame(
        [(i, "a", "tok " * 300) for i in range(5)]
        + [(10 + i, "b", "tok " * 100) for i in range(3)],
        "doc_id bigint, source string, text string",
    ).withColumn("text", F.trim("text"))
    orig = X.table
    try:
        X.table = lambda s_, d_, n_: docs
        out = {r["source"]: r for r in
               X.t36_token_budget(spark, "unused").collect()}
    finally:
        X.table = orig
    # source a: 300-token docs, budget 800 -> exactly 2 kept (600);
    # the third would reach 900 > 800
    assert out["a"]["n_docs"] == 2 and out["a"]["tokens_kept"] == 600
    # source b: all 3 fit (300 <= 800) regardless of a's exhaustion
    assert out["b"]["n_docs"] == 3 and out["b"]["tokens_kept"] == 300


def _make_png(w, h, channels=3, filters=None, seed=0):
    """Forward-filter known pixel rows per the PNG spec and wrap them
    in real chunks — the decoder must invert every filter exactly to
    recover the original pixel sum."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    rows = [
        bytes((seed + y * 31 + i * 7) % 256 for i in range(w * channels))
        for y in range(h)
    ]
    filters = filters or [0] * h
    stride = w * channels
    raw = bytearray()
    prev = bytes(stride)
    for y, row in enumerate(rows):
        f = filters[y]
        out = bytearray(row)
        if f == 1:
            for i in range(stride - 1, channels - 1, -1):
                out[i] = (row[i] - row[i - channels]) & 0xFF
        elif f == 2:
            for i in range(stride):
                out[i] = (row[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                out[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b, c = prev[i], (prev[i - channels] if i >= channels else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                out[i] = (row[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(out)
        prev = row

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    expect = sum(sum(r) for r in rows) % 65536
    return png, expect


def test_decode_png_kernel_unfilters_all_filter_types(spark):
    """The PNG kernel zlib-inflates and INVERTS every spec filter
    (None/Sub/Up/Average/Paeth) — the checksum over unfiltered bytes
    must equal the known pixel sum for each filter mix — and refuses
    16-bit, interlaced, and paletted payloads loudly; the same
    mapInPandas seam as the other kernels carries it."""
    import struct

    import pytest as _pt

    from debezium_incubator_spark.llm.multimodal import (
        decode_features,
        decode_png,
    )

    for filters in ([0, 0, 0, 0], [1, 2, 3, 4], [4, 4, 4, 4],
                    [2, 1, 4, 3]):
        png, expect = _make_png(5, 4, channels=3, filters=filters, seed=3)
        d = decode_png(png)
        assert (d["width"], d["height"]) == (5, 4)
        assert d["checksum"] == expect, filters
    png_rgba, expect = _make_png(3, 3, channels=4, filters=[4, 2, 1])
    assert decode_png(png_rgba)["checksum"] == expect

    with _pt.raises(ValueError, match="bad signature"):
        decode_png(b"nope")
    bad_depth = bytearray(_make_png(2, 2)[0])
    bad_depth[8 + 8 + 8] = 16          # IHDR bit-depth byte
    with _pt.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad_depth))
    bad_inter = bytearray(_make_png(2, 2)[0])
    bad_inter[8 + 8 + 12] = 1          # IHDR interlace byte
    with _pt.raises(ValueError, match="interlaced"):
        decode_png(bytes(bad_inter))
    pal = bytearray(_make_png(2, 2)[0])
    pal[8 + 8 + 9] = 3                 # IHDR color-type byte -> palette
    with _pt.raises(ValueError, match="color type"):
        decode_png(bytes(pal))

    from pyspark.sql import functions as _F

    p1, e1 = _make_png(6, 2, filters=[4, 3], seed=7)
    p2, e2 = _make_png(3, 5, filters=[1, 2, 4, 0, 3], seed=9)
    media = spark.createDataFrame(
        [(1, p1), (2, p2)], "doc_id LONG, payload BINARY",
    ).withColumn("meta", _F.struct(
        _F.lit("image/png").alias("mime"),
        _F.length("payload").cast("long").alias("n_bytes"),
        _F.lit("test").alias("source"),
    ))
    rows = {r.doc_id: r.checksum
            for r in decode_features(media, kernel=decode_png).collect()}
    assert rows == {1: e1, 2: e2}


def test_entropy_quality_separates_repetitive_text(spark):
    """A repetitive doc (one bigram dominating) scores near zero and is
    dropped; varied prose scores high and is kept — the semantic the
    filter exists for."""
    from pyspark.sql import functions as F

    import debezium_incubator_spark.llm.text as X

    docs = spark.createDataFrame(
        [
            (1, "ababababababababababababababab" * 4),   # 2 bigrams
            (2, "the quick brown fox jumps over the lazy dog and then "
                "runs far away into the green field near the old barn"),
            (3, "x"),                                     # too short: out
        ],
        "doc_id bigint, text string",
    )
    orig = X.table
    try:
        X.table = lambda s_, d_, n_: docs
        out = {r["doc_id"]: r for r in
               X.t37_entropy_quality(spark, "unused").collect()}
    finally:
        X.table = orig
    assert set(out) == {1, 2}
    assert out[1]["entropy"] < 1.1 and out[1]["keep"] is False
    assert out[2]["entropy"] > 3.0 and out[2]["keep"] is True


def test_decode_qoi_kernel_all_ops(spark):
    """Hand-crafted QOI streams hit every op type with hand-computed
    expected pixels — the decoder's 64-slot index, delta arithmetic,
    and run expansion are pinned against literal arithmetic, not a
    re-implementation; refusals are loud."""
    import struct

    import pytest as _pt

    from debezium_incubator_spark.llm.multimodal import (
        decode_features,
        decode_qoi,
    )

    def qoi(w, h, body):
        return (b"qoif" + struct.pack(">II", w, h) + bytes([3, 0])
                + body + b"\x00" * 7 + b"\x01")

    # pixels: RGB(10,20,30); RUN of 2 more; DIFF(+1,+1,+1) -> (11,21,31);
    # INDEX back to (10,20,30) (hash slot (30+100+210+2805)%64 = 9);
    # LUMA dg=+10, dr-dg=-3, db-dg=+2 -> (17,30,42). Total 7 pixels.
    body = bytes([
        0xFE, 10, 20, 30,        # RGB
        0xC0 | 1,                # RUN 2
        0x40 | (3 << 4) | (3 << 2) | 3,   # DIFF +1,+1,+1
        0x00 | 9,                # INDEX slot 9 -> (10,20,30)
        0x80 | (10 + 32), ((-3 + 8) << 4) | (2 + 8),  # LUMA
        0xC0 | 0,                # RUN 1 (repeat LUMA pixel)
    ])
    expect = (
        3 * (10 + 20 + 30 + 255)
        + (11 + 21 + 31 + 255)
        + (10 + 20 + 30 + 255)
        + 2 * (17 + 30 + 42 + 255)
    ) % 65536
    d = decode_qoi(qoi(7, 1, body))
    assert (d["width"], d["height"], d["checksum"]) == (7, 1, expect)

    # RGBA op changes alpha; subsequent RGB keeps it
    body2 = bytes([0xFF, 1, 2, 3, 100, 0xFE, 4, 5, 6])
    d2 = decode_qoi(qoi(2, 1, b"" + body2))
    assert d2["checksum"] == ((1 + 2 + 3 + 100) + (4 + 5 + 6 + 100)) % 65536

    with _pt.raises(ValueError, match="bad magic"):
        decode_qoi(b"nope")
    with _pt.raises(ValueError, match="truncated QOI stream"):
        decode_qoi(qoi(5, 1, bytes([0xFE, 1, 2, 3])))
    with _pt.raises(ValueError, match="unsupported QOI channels"):
        decode_qoi(b"qoif" + struct.pack(">II", 1, 1) + bytes([5, 0])
                   + bytes([0xFE, 1, 2, 3]) + b"\x00" * 7 + b"\x01")

    from pyspark.sql import functions as _F

    media = spark.createDataFrame(
        [(1, qoi(7, 1, body)), (2, qoi(2, 1, body2))],
        "doc_id LONG, payload BINARY",
    ).withColumn("meta", _F.struct(
        _F.lit("image/qoi").alias("mime"),
        _F.length("payload").cast("long").alias("n_bytes"),
        _F.lit("test").alias("source"),
    ))
    rows = {r.doc_id: r.checksum
            for r in decode_features(media, kernel=decode_qoi).collect()}
    assert rows == {1: expect, 2: d2["checksum"]}


def test_keeper_weights_semantics(spark):
    """Cluster size and distinct-source count land on the MIN-doc_id
    keeper; singletons carry weight 1 (the sf fixtures hold no exact
    duplicates, so the multiplicity semantics are pinned here)."""
    import debezium_incubator_spark.llm.text as X

    docs = spark.createDataFrame(
        [
            (1, "same text", "a"),
            (5, "same text", "b"),
            (9, "same text", "a"),
            (2, "unique", "a"),
        ],
        "doc_id bigint, text string, source string",
    )
    orig = X.table
    try:
        X.table = lambda s_, d_, n_: docs
        out = {r["doc_id"]: (r["weight"], r["n_sources"]) for r in
               X.t38_keeper_weights(spark, "unused").collect()}
    finally:
        X.table = orig
    assert out == {1: (3, 2), 2: (1, 1)}


def test_k3_bucketed_grouped_map_matches_per_user_grouping(spark):
    """Round-13: k3_asof_grouped_map groups by a coarse deterministic
    bucket (pmod(xxhash64(user_id), 4*parallelism)) and relies on
    pd.merge_asof(by="user_id") for per-user semantics.  Pin that the
    bucketed spelling is row-identical to a per-user pandas reference
    (groupby user, backward as-of, ties broken by max event_id)."""
    import pandas as pd

    from debezium_incubator_spark.functions.pandas_udfs import (
        k3_asof_grouped_map,
    )

    got = (
        k3_asof_grouped_map(spark, SF_SMOKE)
        .toPandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )

    ev = table(spark, SF_SMOKE, "events")
    pdf = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id", "event_id", "ts", "event_type")
        .toPandas()
    )
    rows = []
    for uid, g in pdf.groupby("user_id"):
        clicks = g[g.event_type == "click"].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        for _, p in g[g.event_type == "purchase"].iterrows():
            prior = clicks[clicks.ts <= p.ts]
            if len(prior):
                rows.append((p.event_id, uid, prior.iloc[-1].event_id))
    want = (
        pd.DataFrame(rows, columns=["purchase_id", "user_id", "click_id"])
        .sort_values("purchase_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)
