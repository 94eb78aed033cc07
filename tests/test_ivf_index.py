"""Persisted IVF index lifecycle (SURVEY.md §2 J4 scale path): build
once (cluster-partitioned parquet + centroid routing table), probe many
— each probe reads only its nprobe partition directories."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from debezium_incubator_spark.llm.similarity import (
    IVF_NLIST,
    IVF_NPROBE,
    _vectors,
    build_ivf_index,
    ivf_probe,
)
from debezium_incubator_spark.registry import all_queries

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ivf_build_then_probe_matches_one_shot(spark):
    """The persisted build+probe path answers the SAME query as the
    one-shot sim_ivf_knn (identical seed/nlist/nprobe ⇒ identical cells
    ⇒ identical top-k)."""
    q = all_queries()
    one_shot = q["sim_ivf_knn"](spark, SF_SMOKE).collect()
    persisted = q["sim_ivf_probe"](spark, SF_SMOKE).collect()
    assert [tuple(r) for r in persisted] == [tuple(r) for r in one_shot]


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """The probe's scan must touch only nprobe of nlist cluster
    directories — `cluster IN (...)` lands in PartitionFilters and the
    actual file set read is the pruned one."""
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(_vectors(spark, SF_SMOKE), index_dir)

    # the build wrote one directory per cluster
    vec_dir = os.path.join(index_dir, "vectors")
    cluster_dirs = [d for d in os.listdir(vec_dir) if d.startswith("cluster=")]
    assert len(cluster_dirs) == IVF_NLIST

    qrow = (
        _vectors(spark, SF_SMOKE).filter(F.col("vec_id") == 0).select("v").first()
    )
    probed = ivf_probe(spark, index_dir, list(qrow.v), k=10, exclude_vec_id=0)
    plan = _plan(probed)
    assert "PartitionFilters" in plan and "cluster" in plan

    # ground truth for the audit: the files the pruned scan enumerates
    # span exactly nprobe distinct cluster directories
    scan = spark.read.parquet(vec_dir)
    cents = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    import numpy as np

    qv = np.asarray(qrow.v)
    order = sorted(
        cents, key=lambda r: float(((np.asarray(r.centroid) - qv) ** 2).sum())
    )
    probe = [r.cluster for r in order[:IVF_NPROBE]]
    pruned = scan.filter(F.col("cluster").isin(probe))
    # execution-level audit: the files actually opened span exactly the
    # nprobe probed cluster directories (inputFiles() would be pre-prune)
    touched = {
        r[0].split("cluster=")[1].split("/")[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert touched == {str(c) for c in probe}
    assert len(touched) == IVF_NPROBE


def test_ivf_probe_recall_on_clustered_data(spark, tmp_path):
    """IVF's contract: when neighbors share cluster structure (the
    regime IVF indexes exist for — on isotropic-random corpora no
    coarse quantizer can help), a probe recovers the true top-k with
    recall ≈ 1.0. Plant near-duplicates of the query vector and assert
    they are all found via only nprobe partitions."""
    e = (
        _vectors(spark, SF_SMOKE)
        .filter(F.col("vec_id") < 100)
        .select("vec_id", "v")
    )
    # 10 planted near-copies of vec_id=0 (cos ≈ 0.999): the true top-10
    dup = (
        e.filter(F.col("vec_id") == 0)
        .crossJoin(spark.range(1, 11).select(F.col("id").alias("i")))
        .select(
            (F.col("i") + 10000).alias("vec_id"),
            F.transform(
                "v",
                lambda x, j: x
                + 0.01 * F.sin(j.cast("double") + F.col("i").cast("double")),
            ).alias("v"),
        )
    )
    corpus = e.union(dup)
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(corpus, index_dir, nlist=8)
    qrow = e.filter(F.col("vec_id") == 0).select("v").first()
    got = {
        r.vec_id
        for r in ivf_probe(
            spark, index_dir, list(qrow.v), k=10, nprobe=2, exclude_vec_id=0
        ).collect()
    }
    planted = set(range(10001, 10011))
    recall = len(got & planted) / len(planted)
    assert recall == 1.0, f"planted-neighbor recall {recall}"


def test_ivf_index_build_is_idempotent(spark):
    """mode=overwrite: rebuilding into the same dir replaces the index."""
    with tempfile.TemporaryDirectory() as td:
        index_dir = os.path.join(td, "ivf")
        src = _vectors(spark, SF_SMOKE)
        build_ivf_index(src, index_dir)
        n1 = spark.read.parquet(os.path.join(index_dir, "vectors")).count()
        build_ivf_index(src, index_dir)
        n2 = spark.read.parquet(os.path.join(index_dir, "vectors")).count()
        assert n1 == n2 == src.count()


def test_ivf_index_append_routes_and_self_retrieves(spark, tmp_path):
    """Incremental maintenance: build on half the corpus, append the
    other half — no refit, existing cells untouched. Invariants:
    (a) total stored rows = full corpus; (b) every appended vector's
    stored cluster equals the python argmin over the PERSISTED
    centroids (same fold, ties to lower id); (c) self-retrieval — a
    probe with an appended vector's own embedding returns that vec_id
    at rank 1 with cosine 1.0 (the query routes to its own argmin
    cell, where the append placed it)."""
    from debezium_incubator_spark.llm.similarity import (
        _sq_l2,
        ivf_index_append,
    )

    src = _vectors(spark, SF_SMOKE)
    built = src.filter(F.col("vec_id") % 2 == 0)
    appended = src.filter(F.col("vec_id") % 2 == 1)
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(built, index_dir, nlist=8)
    n_app = ivf_index_append(spark, index_dir, appended)
    assert n_app == appended.count()

    vecs = spark.read.parquet(f"{index_dir}/vectors")
    assert vecs.count() == src.count()

    cents = sorted(
        spark.read.parquet(f"{index_dir}/centroids").collect(),
        key=lambda r: r.cluster,
    )
    sample = (
        spark.read.option("basePath", f"{index_dir}/vectors")
        .parquet(f"{index_dir}/vectors")
        .filter(F.col("vec_id") % 2 == 1)
        .limit(20).collect()
    )
    assert sample
    for r in sample:
        want = min((_sq_l2(c.centroid, r.v), c.cluster) for c in cents)[1]
        assert r.cluster == want, r.vec_id

    q = appended.limit(1).first()
    top = ivf_probe(spark, index_dir, list(q.v), k=3, nprobe=1).collect()
    assert top[0].vec_id == q.vec_id
    assert abs(float(top[0].cos_sim) - 1.0) < 1e-9


def test_audit_index_symlink_swap_is_atomic_for_readers(spark):
    """The fixed audit path is a symlink to a stamp-named build dir:
    switching source fixtures swaps the link atomically and the OLD
    target directory remains intact (a concurrent reader mid-query
    keeps a consistent index instead of racing an overwrite)."""
    import os

    from debezium_incubator_spark.llm.similarity import (
        IVF_AUDIT_DIR,
        _ensure_ivf_index,
    )

    _ensure_ivf_index(spark, "/root/testdata/sf0.001")
    assert os.path.islink(IVF_AUDIT_DIR)
    t1 = os.path.realpath(IVF_AUDIT_DIR)
    _ensure_ivf_index(spark, "/root/testdata/sf0.01")
    t2 = os.path.realpath(IVF_AUDIT_DIR)
    assert t1 != t2
    # the old build is untouched — a reader holding t1 still works
    assert os.path.exists(os.path.join(t1, "_source"))
    assert os.path.isdir(os.path.join(t1, "vectors"))
    # idempotent re-ensure keeps the link stable
    _ensure_ivf_index(spark, "/root/testdata/sf0.01")
    assert os.path.realpath(IVF_AUDIT_DIR) == t2


def test_semdedup_delta_equals_full_run_slice(spark, tmp_path):
    """Dedup-on-ingest: append a batch to the index, then
    semdedup(min_vec_id=batch_start) — the delta result equals the
    batch slice of a full run over the appended store (owners are
    always lower-id, so pre-batch results cannot change), at
    O(batch × cell) join cost."""
    from debezium_incubator_spark.llm.similarity import (
        build_ivf_index,
        ivf_index_append,
        semdedup,
    )

    base = [(i, [float(i % 5) + 0.1, float((i * 3) % 7) + 0.1])
            for i in range(40)]
    batch = [(100 + i, [float(i % 5), float((i * 2) % 7) + 0.01])
             for i in range(15)]
    idx = str(tmp_path / "idx")
    build_ivf_index(
        spark.createDataFrame(base, "vec_id LONG, v ARRAY<DOUBLE>"),
        idx, nlist=3, seed=11,
    )
    ivf_index_append(
        spark, idx,
        spark.createDataFrame(batch, "vec_id LONG, v ARRAY<DOUBLE>"),
    )
    full = {
        r.vec_id: (r.dup_of, r.cos_sim)
        for r in semdedup(spark, idx, tau=0.95).collect()
        if r.vec_id >= 100
    }
    delta = {
        r.vec_id: (r.dup_of, r.cos_sim)
        for r in semdedup(spark, idx, tau=0.95, min_vec_id=100).collect()
    }
    assert delta == full and delta  # non-trivial


def test_semdedup_tolerates_zero_vectors(spark, tmp_path):
    """Zero-magnitude embeddings (failed-encoder rows) have undefined
    cosine: they are excluded from both sides — never removed, never an
    owner — instead of killing the job with ANSI divide-by-zero."""
    from debezium_incubator_spark.llm.similarity import (
        build_ivf_index,
        semdedup,
    )

    rows = [
        (0, [0.0, 0.0]),          # failed encoder
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),          # exact dup of 1
        (3, [0.0, 0.0]),          # another zero
        (4, [0.0, 1.0]),
    ]
    idx = str(tmp_path / "idx")
    build_ivf_index(
        spark.createDataFrame(rows, "vec_id LONG, v ARRAY<DOUBLE>"),
        idx, nlist=2, seed=3,
    )
    got = {r.vec_id: r.dup_of for r in semdedup(spark, idx, tau=0.99).collect()}
    assert got == {2: 1}  # zeros neither removed nor owning


def test_streaming_dedup_on_ingest_across_restart(spark, tmp_path):
    """r7 verdict #5: ivf_index_append + semdedup delta inside a REAL
    foreachBatch stream — two batches drained, a simulated uncommitted-
    batch replay, then a checkpoint restart over a third file. The
    accumulated per-batch removal lists equal the batch-mode full-run
    slice over the final index, and the store holds no duplicate
    vectors despite the replay."""
    import glob
    import os

    from debezium_incubator_spark.llm.similarity import (
        build_ivf_index,
        ivf_index_append,
        semdedup,
        semdedup_ingest_foreach_batch,
        start_semdedup_ingest_stream,
    )

    schema = "vec_id LONG, v ARRAY<DOUBLE>"
    base = [(i, [float(i % 5) + 0.1, float((i * 3) % 7) + 0.1])
            for i in range(40)]
    idx = str(tmp_path / "idx")
    build_ivf_index(
        spark.createDataFrame(base, schema), idx, nlist=3, seed=11,
    )

    def batch_rows(start):
        return [(start + i, [float(i % 5), float((i * 2) % 7) + 0.01])
                for i in range(12)]

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for j, start in enumerate([100, 200]):
        spark.createDataFrame(batch_rows(start), schema) \
            .coalesce(1).write.parquet(str(tmp_path / f"tmp{j}"))
        src = glob.glob(str(tmp_path / f"tmp{j}" / "*.parquet"))[0]
        os.rename(src, os.path.join(stage, f"b{j}.parquet"))

    q = start_semdedup_ingest_stream(
        spark, stage, schema, idx, out, ckpt, tau=0.95,
    )
    q.awaitTermination(120)
    vecs = spark.read.parquet(f"{idx}/vectors")
    assert vecs.count() == 40 + 24

    # simulate a crash-replay of the last batch (checkpoint commit
    # lost): re-invoking the handler must not double-append or change
    # the persisted results
    before = sorted(
        (r.vec_id, r.dup_of)
        for r in spark.read.parquet(out).drop("batch").collect()
    )
    handler = semdedup_ingest_foreach_batch(idx, out, tau=0.95)
    handler(spark.createDataFrame(batch_rows(200), schema), 1)
    assert spark.read.parquet(f"{idx}/vectors").count() == 64
    assert sorted(
        (r.vec_id, r.dup_of)
        for r in spark.read.parquet(out).drop("batch").collect()
    ) == before

    # third file lands; RESTART from the same checkpoint processes it
    spark.createDataFrame(batch_rows(300), schema) \
        .coalesce(1).write.parquet(str(tmp_path / "tmp2"))
    src = glob.glob(str(tmp_path / "tmp2" / "*.parquet"))[0]
    os.rename(src, os.path.join(stage, "b2.parquet"))
    q2 = start_semdedup_ingest_stream(
        spark, stage, schema, idx, out, ckpt, tau=0.95,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{idx}/vectors").count() == 76

    streamed = sorted(
        (r.vec_id, r.dup_of, float(r.cos_sim))
        for r in spark.read.parquet(out).collect()
    )
    full_slice = sorted(
        (r.vec_id, r.dup_of, float(r.cos_sim))
        for r in semdedup(spark, idx, tau=0.95).collect()
        if r.vec_id >= 100
    )
    assert streamed == full_slice and len(streamed) > 0


def test_streaming_ingest_refuses_non_monotone_ids(spark, tmp_path):
    """A genuinely NEW vec_id at/below the store's high-water is not a
    replay — silent acceptance would corrupt the delta-dedup contract
    (owners are lower-id), so the handler refuses loudly."""
    import pytest

    from debezium_incubator_spark.llm.similarity import (
        build_ivf_index,
        semdedup_ingest_foreach_batch,
    )

    schema = "vec_id LONG, v ARRAY<DOUBLE>"
    base = [(i, [float(i % 5) + 0.1, float((i * 3) % 7) + 0.1])
            for i in range(40)]
    idx = str(tmp_path / "idx")
    build_ivf_index(spark.createDataFrame(base, schema), idx,
                    nlist=3, seed=11)
    handler = semdedup_ingest_foreach_batch(
        idx, str(tmp_path / "out"), tau=0.95)
    # a proper batch raises the high-water to 104...
    handler(spark.createDataFrame(
        [(100 + i, [1.0, float(i)]) for i in range(5)], schema), 0)
    # ...replay of EXISTING ids still folds away silently (idempotence)
    handler(spark.createDataFrame(base[:5], schema), 0)
    # ...but a genuinely NEW id below the high-water refuses
    bad = spark.createDataFrame([(50, [9.0, 9.0]), (200, [1.0, 1.0])],
                                schema)
    with pytest.raises(ValueError, match="monotone vec_ids"):
        handler(bad, 1)
