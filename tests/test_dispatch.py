"""Fused multi-query dispatch (r10 verdict #3): run_batch results are
row-identical to per-query runs; run_batch_digest's one-action fold
matches per-query digests."""

from __future__ import annotations

import pandas as pd
import pytest

from debezium_incubator_spark.dispatch import (
    digest_plan,
    run_batch,
    run_batch_digest,
)
from debezium_incubator_spark.registry import all_queries

from .conftest import SF_SMOKE

# schema diversity on purpose: decimals + doubles (q1), timestamps
# (e1), argmax rows (e2 — the dispatch-floor query this API answers),
# strings + ints (t1)
KEYS = [
    "q1_pricing_summary",
    "e1_tumbling_window",
    "e2_latest_per_user",
    "t1_token_stats",
]


def test_run_batch_row_identical_to_per_query(spark):
    batch = run_batch(spark, KEYS, SF_SMOKE)
    queries = all_queries()
    assert set(batch) == set(KEYS)
    for k in KEYS:
        solo = queries[k](spark, SF_SMOKE).toPandas()
        pd.testing.assert_frame_equal(batch[k], solo)


def test_run_batch_digest_matches_per_query_folds(spark):
    fused = run_batch_digest(spark, KEYS, SF_SMOKE)
    queries = all_queries()
    assert set(fused) == set(KEYS)
    for k in KEYS:
        solo = digest_plan(queries[k](spark, SF_SMOKE), k).collect()[0]
        assert fused[k] == (solo["n"], solo["h"]), k
        assert fused[k][0] > 0  # fixture queries all return rows


def test_run_batch_digest_distinguishes_queries(spark):
    # the tag column keeps identical-digest branches attributable and
    # the union can't collapse them
    fused = run_batch_digest(
        spark, ["q1_pricing_summary", "t1_token_stats"], SF_SMOKE
    )
    assert len(fused) == 2


def test_run_batch_rejects_unknown_and_duplicate_keys(spark):
    with pytest.raises(KeyError, match="unknown query keys"):
        run_batch(spark, ["nope_not_a_query"], SF_SMOKE)
    with pytest.raises(ValueError, match="duplicate"):
        run_batch_digest(
            spark, ["t1_token_stats", "t1_token_stats"], SF_SMOKE
        )


def test_repeat_run_batch_reuses_plans_and_stays_identical(spark):
    """The r11 #7 memo: a repeat call must hit the per-application plan
    cache (no second build) AND return frames identical to a
    fresh-lineage call."""
    from debezium_incubator_spark import dispatch

    dispatch._PLAN_CACHE.clear()
    first = run_batch(spark, KEYS, SF_SMOKE)
    cached = dict(dispatch._PLAN_CACHE)
    assert len(cached) == len(KEYS)
    again = run_batch(spark, KEYS, SF_SMOKE)
    # same DataFrame objects reused — the py4j build was skipped
    assert dict(dispatch._PLAN_CACHE) == cached
    for k in KEYS:
        pd.testing.assert_frame_equal(again[k], first[k])
    fresh = run_batch(spark, KEYS, SF_SMOKE, reuse_plans=False)
    for k in KEYS:
        pd.testing.assert_frame_equal(fresh[k], first[k])


def test_plan_cache_keys_on_application_id(spark):
    """A NEW session (new applicationId) must never see another
    session's cached plans — the id()-reuse hazard the spread() memo
    documented."""
    from debezium_incubator_spark import dispatch

    dispatch._PLAN_CACHE.clear()
    run_batch(spark, ["t1_token_stats"], SF_SMOKE)
    (app_id, key, sf, stamp), = dispatch._PLAN_CACHE.keys()
    assert app_id == spark.sparkContext.applicationId
    assert key == "t1_token_stats" and sf == SF_SMOKE
    assert stamp == dispatch._sf_stamp(SF_SMOKE)
    # a foreign application id resolves to a MISS, not a stale plan
    assert dispatch._PLAN_CACHE.get(("other-app", key, sf, stamp)) is None


def test_plan_cache_invalidates_on_source_change(spark, tmp_path):
    """r12 ADVICE: a memoized plan captured its parquet file listing at
    build time — if the files under sf_dir change, the memo must MISS
    (new source stamp → new cache key), never serve the stale frame."""
    import os
    import shutil

    from debezium_incubator_spark import dispatch

    sf2 = str(tmp_path / "sfcopy")
    shutil.copytree(SF_SMOKE, sf2)
    dispatch._PLAN_CACHE.clear()
    first = run_batch(spark, ["t1_token_stats"], sf2)
    assert len(dispatch._PLAN_CACHE) == 1
    # regenerate a source file (mtime bump is what a rewrite leaves)
    doc = os.path.join(sf2, "documents.parquet")
    st = os.stat(doc)
    os.utime(doc, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    again = run_batch(spark, ["t1_token_stats"], sf2)
    assert len(dispatch._PLAN_CACHE) == 2, (
        "changed source files must mint a new cache key"
    )
    pd.testing.assert_frame_equal(again["t1_token_stats"],
                                  first["t1_token_stats"])


def test_digest_refuses_unhashable_columns(spark):
    """MAP/VARIANT outputs are refused with the key and columns named
    (r11 ADVICE) — including a map nested inside a struct."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.dispatch import digest_plan

    df = spark.range(3).select(
        "id", F.create_map(F.lit("k"), F.col("id")).alias("m")
    )
    with pytest.raises(TypeError, match=r"'mapq'.*\['m'\]"):
        digest_plan(df, "mapq")
    nested = spark.range(3).select(
        F.struct(F.create_map(F.lit("k"), F.col("id")).alias("m"))
        .alias("s")
    )
    with pytest.raises(TypeError, match="unhashable"):
        digest_plan(nested, "nestedq")
    # plain arrays/structs stay hashable and digest fine
    ok = spark.range(3).select(F.array("id").alias("a"))
    assert digest_plan(ok, "okq").collect()[0]["n"] == 3
