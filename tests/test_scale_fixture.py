"""Foundation tests for the empirical scale probe (SCALEPROBE.md):
the fixture generator must be deterministic, schema-faithful to the
driver fixture, and must actually contain the planted near-dup signal
the dedup tier is probed on."""

from __future__ import annotations

import tempfile

import duckdb
import pytest

from scripts.gen_scale_fixture import generate

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
    # probe-only change-stream table (no driver counterpart — excluded
    # from the schema-fidelity test below)
    "changes",
)


@pytest.fixture(scope="module")
def gen_dir():
    with tempfile.TemporaryDirectory() as td:
        generate(td, 0.02)
        yield td


def test_generator_is_deterministic(gen_dir):
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as td2:
        generate(td2, 0.02)
        for t in TABLES:
            a = con.execute(
                f"SELECT COUNT(*), bit_xor(hash(COLUMNS(*)::VARCHAR)) "
                f"FROM read_parquet('{gen_dir}/{t}.parquet')"
            ).fetchall()
            b = con.execute(
                f"SELECT COUNT(*), bit_xor(hash(COLUMNS(*)::VARCHAR)) "
                f"FROM read_parquet('{td2}/{t}.parquet')"
            ).fetchall()
            assert a == b, f"{t} not deterministic"
    con.close()


def test_schemas_match_driver_fixture(gen_dir, spark):
    from debezium_incubator_spark.catalog import table

    for t in TABLES:
        if t == "changes":
            continue
        want = table(spark, "/root/testdata/sf0.001", t).schema
        got = table(spark, gen_dir, t).schema
        assert [(f.name, f.dataType) for f in got.fields] == [
            (f.name, f.dataType) for f in want.fields
        ], f"{t} schema drift"


def test_planted_near_dups_are_found_by_capped_jaccard(gen_dir, spark):
    """Docs at ids (i-1, i) for i in 50,100,... are planted near-dups
    (first word changed). The frequency-capped Jaccard — the 100 TB
    spelling — must recover the overwhelming majority of them, proving
    the df-cap drops only ubiquitous (signal-free) shingles."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.llm.dedup import ngram_jaccard_pairs

    d = table(spark, gen_dir, "documents")
    n_doc = d.count()
    planted = {(i - 1, i) for i in range(50, n_doc, 50)}
    pairs = ngram_jaccard_pairs(d, min_jaccard=0.5, max_df=20)
    got = {
        (r.doc_a, r.doc_b)
        for r in pairs.select("doc_a", "doc_b").collect()
    }
    recall = len(planted & got) / len(planted)
    assert recall >= 0.9, f"planted-dup recall {recall} (found {len(got)})"


def test_embeddings_planted_dups_cosine(gen_dir, spark):
    """Embedding near-dups (sigma-0.01 perturbations every 50 ids) must
    appear as >0.99-cosine pairs — the signal the LSH/ANN probes rely
    on."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.llm.similarity import dot, norm_sq

    e = table(spark, gen_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nsq", norm_sq("v"))
    a = e.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"),
                 F.col("nsq").alias("na"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"),
                 F.col("nsq").alias("nb"))
    planted = a.join(
        b, (F.col("ib") == F.col("ia") + 1) & (F.col("ib") % 50 == 0)
    ).withColumn(
        "cos", dot("va", "vb") / (F.sqrt("na") * F.sqrt("nb"))
    )
    rows = planted.select("cos").collect()
    assert rows and all(r.cos > 0.99 for r in rows)


def test_scaled_lsh_keeps_recall_on_planted_dups(gen_dir, spark):
    """The r ~ log2(n/bucket) scaling knob must not cost recall on the
    near-dup workload LSH exists for: with 8 bands at the scaled r, the
    candidate sieve still surfaces >=90% of planted >0.99-cosine pairs,
    while the bucket self-join stays sub-quadratic (bounded bucket
    occupancy — the round-4 probe's LSH finding)."""
    import math

    from pyspark.sql import functions as F

    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.llm.similarity import (
        lsh_candidate_pairs,
        norm_sq,
    )

    e = table(spark, gen_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()
    planted = {(i - 1, i) for i in range(50, n, 50)}
    r = max(4, int(math.ceil(math.log2(max(n, 2) / 64))))
    cands = lsh_candidate_pairs(e, bands=8, rows_per_band=r)
    got = {(x.vec_a, x.vec_b) for x in cands.collect()}
    recall = len(planted & got) / len(planted)
    assert recall >= 0.9, f"scaled-LSH planted recall {recall}"


def test_spread_widens_narrow_and_leaves_wide_alone(spark):
    from debezium_incubator_spark import catalog
    from debezium_incubator_spark.catalog import spread

    narrow = spark.range(1000).coalesce(1)
    wide = spark.range(1000).repartition(64)
    target = spark.sparkContext.defaultParallelism
    assert spread(narrow).rdd.getNumPartitions() == target
    # already at/above parallelism: identity (no extra shuffle)
    assert spread(wide) is wide
    # row preservation
    assert spread(narrow).count() == 1000
    # the partition-count probe is memoized per logical plan: a repeat
    # call (even on a NEW DataFrame object of the same plan) must hit
    # the cache, never the physical-plan conversion
    narrow2 = spark.range(1000).coalesce(1)
    # round 6: keyed on applicationId (stable across the app, immune to
    # id() reuse after a stopped session is GC'd), not id(session)
    key = (spark.sparkContext.applicationId, narrow2.semanticHash())
    assert key in catalog._SPREAD_CACHE
    catalog._SPREAD_CACHE[key] = 999  # poison: cache hit -> no repartition
    try:
        assert spread(narrow2) is narrow2
    finally:
        catalog._SPREAD_CACHE[key] = 1
    # distinct explicit partitioning hashes differently (no collision)
    assert spark.range(1000).repartition(2).semanticHash() != narrow2.semanticHash()


def test_changes_fixture_shape(gen_dir, spark):
    """The CDC-probe change log: deterministic slice cutoffs must carry
    real work — the fixed-key-cutoff delta is nonempty and ~constant
    across scales by construction (k uniform; cutoff absolute)."""
    chg = spark.read.parquet(f"{gen_dir}/changes.parquet")
    n = chg.count()
    assert n == 2 * int(500_000 * 0.02)
    from pyspark.sql import functions as F

    tail = chg.filter(F.col("pos") >= int(n * 0.9))
    d = tail.filter(F.col("k") < 150)
    assert 0 < d.count() < 100  # ~30 expected at every scale
    ops = {r["__op"] for r in chg.select("__op").distinct().collect()}
    assert ops == {"c", "u", "d"}
    bodies = chg.select("body").toPandas()["body"]
    assert bodies.isna().any()
    assert (bodies == "__debezium_unavailable_value").any()


def test_partitioned_write_emits_one_file_per_bucket(spark, tmp_path):
    """Scale posture of the touched-bucket apply: rows are clustered on
    the bucket column before the dynamic-partition write, so each
    touched bucket lands as exactly ONE parquet file — without the
    clustering, the window fold's key-hash distribution makes every
    task write into every bucket dir (tasks x buckets near-empty files
    per epoch; found by the round-5 CDC scale probe)."""
    import os

    from debezium_incubator_spark.streaming.partitioned_state import (
        BUCKET_COL,
        apply_changes_partitioned,
    )

    rows = [(i, i, float(i), "u") for i in range(200)]
    df = spark.createDataFrame(rows, "k LONG, pos LONG, v DOUBLE, __op STRING")
    state = str(tmp_path / "state")
    apply_changes_partitioned(
        spark, df, 0, state, ["k"], ["pos"], n_buckets=8
    )
    vdir = os.path.join(state, "v0")
    bucket_dirs = [d for d in os.listdir(vdir) if d.startswith(BUCKET_COL)]
    assert len(bucket_dirs) == 8  # 200 uniform keys touch all 8
    for b in bucket_dirs:
        files = [f for f in os.listdir(os.path.join(vdir, b))
                 if f.endswith(".parquet")]
        assert len(files) == 1, f"{b}: {files}"
