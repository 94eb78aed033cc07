"""Product quantization: build/encode fidelity, ADC consistency with a
driver-side reference, the planted-duplicate optimality property, and
the column-pruning scale posture of the codes scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_incubator_spark.llm.pq import build_pq_index, pq_adc
from debezium_incubator_spark.llm.similarity import _sq_l2


def _corpus(spark, n=64, dim=16, seed=7):
    """Deterministic synthetic vectors (hash-derived, no RNG at import)."""
    rows = []
    for i in range(n):
        rows.append((i, [
            ((i * 31 + j * 17 + seed) % 97) / 97.0 for j in range(dim)
        ]))
    return spark.createDataFrame(rows, "vec_id LONG, v ARRAY<DOUBLE>")


@pytest.fixture(scope="module")
def pq_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pq") / "idx")
    src = _corpus(spark)
    build_pq_index(src, d, m=4, ksub=8, seed=1)
    return d, src


def test_codes_shape_and_range(spark, pq_index):
    d, src = pq_index
    codes = spark.read.parquet(f"{d}/codes").collect()
    assert len(codes) == src.count()
    for r in codes:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)
    cb = spark.read.parquet(f"{d}/codebooks").collect()
    assert len(cb) == 4 * 8
    assert all(len(r.centroid) == 4 for r in cb)  # dim 16 / m 4


def test_codes_are_true_argmin(spark, pq_index):
    """Persisted codes == the argmin a driver-side fold computes from
    the persisted codebooks (tie → lower code), for every vector."""
    d, src = pq_index
    cb = {}
    for r in spark.read.parquet(f"{d}/codebooks").collect():
        cb.setdefault(r.sub, {})[r.code] = list(r.centroid)
    vecs = {r.vec_id: list(r.v) for r in src.collect()}
    for r in spark.read.parquet(f"{d}/codes").collect():
        v = vecs[r.vec_id]
        for s, code in enumerate(r.codes):
            sub = v[s * 4:(s + 1) * 4]
            best = min(
                (( _sq_l2(sub, cb[s][c]), c) for c in sorted(cb[s])),
            )[1]
            assert code == best, (r.vec_id, s)


def test_adc_matches_driver_reference(spark, pq_index):
    """pq_adc's distances equal a pure-Python ADC over the same
    artifacts — LUT fold, fixed-order subspace sum, ordering included."""
    d, src = pq_index
    q = [0.3] * 16
    got = [(r.vec_id, r.approx_raw)
           for r in pq_adc(spark, d, q, k=5).collect()]
    cb = {}
    for r in spark.read.parquet(f"{d}/codebooks").collect():
        cb.setdefault(r.sub, {})[r.code] = list(r.centroid)
    lut = {s: {c: _sq_l2(q[s * 4:(s + 1) * 4], cb[s][c]) for c in cb[s]}
           for s in cb}
    ref = []
    for r in spark.read.parquet(f"{d}/codes").collect():
        dist = lut[0][r.codes[0]]
        for s in (1, 2, 3):
            dist = dist + lut[s][r.codes[s]]
        ref.append((r.vec_id, dist))
    ref.sort(key=lambda t: (t[1], t[0]))
    assert got == ref[:5]


def test_planted_duplicate_ranks_first(spark, tmp_path):
    """An exact duplicate of the query vector attains the global
    minimum possible ADC distance (its codes are the per-subspace
    argmin for the query itself), so it must rank first."""
    src = _corpus(spark, n=40)
    q = [float(x) for x in src.filter(F.col("vec_id") == 3).first().v]
    dup = spark.createDataFrame([(999, q)], "vec_id LONG, v ARRAY<DOUBLE>")
    d = str(tmp_path / "idx")
    build_pq_index(src.union(dup), d, m=4, ksub=8, seed=1)
    top = pq_adc(spark, d, q, k=50, exclude_vec_id=3).collect()
    dup_dist = [r.approx_raw for r in top if r.vec_id == 999][0]
    assert top[0].approx_raw == dup_dist  # nothing beats the duplicate


def test_dim_validation(spark, pq_index):
    d, _ = pq_index
    with pytest.raises(ValueError, match="query dim"):
        pq_adc(spark, d, [0.0] * 7)
    with pytest.raises(ValueError, match="not divisible"):
        build_pq_index(
            spark.createDataFrame(
                [(0, [0.0] * 7)], "vec_id LONG, v ARRAY<DOUBLE>"
            ),
            "/tmp/never-written", m=4,
        )


def test_pq_append_encodes_against_existing_codebooks(spark, pq_index):
    """Appended vectors get argmin codes from the PERSISTED codebooks
    and are immediately visible to ADC queries."""
    from debezium_incubator_spark.llm.pq import pq_index_append

    d, src = pq_index
    probe_v = [float(x) for x in src.filter(F.col("vec_id") == 5)
               .first().v]
    batch = spark.createDataFrame(
        [(1000, probe_v)], "vec_id LONG, v ARRAY<DOUBLE>"
    )
    assert pq_index_append(spark, d, batch) == 1
    codes = {r.vec_id: list(r.codes)
             for r in spark.read.parquet(f"{d}/codes").collect()}
    assert codes[1000] == codes[5]      # identical vector, same codes
    top = pq_adc(spark, d, probe_v, k=2, exclude_vec_id=5).collect()
    assert top[0].vec_id == 1000 or top[0].approx_raw == top[1].approx_raw


def test_ivfpq_residual_codes_and_probe_pruning(spark, tmp_path):
    """IVF-PQ: the codes store is cluster-partitioned (probe prunes
    directories), codes are residual-based, and an exact duplicate of
    the query attains the minimal ADC distance within its cell."""
    import os

    from debezium_incubator_spark.llm.pq import (
        build_ivfpq_index,
        ivfpq_adc,
    )

    src = _corpus(spark, n=80)
    q = [float(x) for x in src.filter(F.col("vec_id") == 11).first().v]
    dup = spark.createDataFrame([(999, q)], "vec_id LONG, v ARRAY<DOUBLE>")
    d = str(tmp_path / "ivfpq")
    build_ivfpq_index(src.union(dup), d, nlist=4, m=4, ksub=8, seed=3)
    dirs = [p for p in os.listdir(f"{d}/codes") if p.startswith("cluster=")]
    assert len(dirs) == 4               # hive layout, one dir per cell
    top = ivfpq_adc(spark, d, q, k=30, nprobe=2, exclude_vec_id=11)
    rows = top.collect()
    dup_dist = [r.approx_raw for r in rows if r.vec_id == 999][0]
    assert rows[0].approx_raw == dup_dist
    # partition pruning: the scan plan carries the cluster filter
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "cluster" in plan


def test_ivfpq_append_routes_and_encodes_incrementally(spark, tmp_path):
    """Appended vectors route to the same cell and get the same codes
    the original build gave an identical vector — and rank at the
    minimal ADC distance for their own query."""
    from debezium_incubator_spark.llm.pq import (
        build_ivfpq_index,
        ivfpq_adc,
        ivfpq_index_append,
    )

    src = _corpus(spark, n=60)
    d = str(tmp_path / "ivfpq")
    build_ivfpq_index(src, d, nlist=4, m=4, ksub=8, seed=3)
    q = [float(x) for x in src.filter(F.col("vec_id") == 7).first().v]
    batch = spark.createDataFrame([(555, q)], "vec_id LONG, v ARRAY<DOUBLE>")
    assert ivfpq_index_append(spark, d, batch) == 1
    rows = {r.vec_id: (r.cluster, list(r.codes))
            for r in spark.read.parquet(f"{d}/codes").collect()}
    assert 555 in rows
    # identical vector: same codes; cluster may differ only on an exact
    # centroid-distance tie (KMeans assign vs fold argmin) — require both
    assert rows[555] == rows[7]
    top = ivfpq_adc(spark, d, q, k=40, nprobe=4, exclude_vec_id=7).collect()
    d555 = [r.approx_raw for r in top if r.vec_id == 555][0]
    assert top[0].approx_raw == d555


def test_adc_scan_prunes_to_codes_columns(spark, pq_index):
    """Scale posture: the ADC plan reads (vec_id, codes) only — the
    point of PQ is that original vectors never enter the query scan."""
    d, _ = pq_index
    plan = pq_adc(spark, d, [0.1] * 16, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ReadSchema" in plan
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "codes" in read and "vec_id" in read
    assert ",v:" not in read and "embedding" not in read
    assert "TakeOrderedAndProject" in plan
