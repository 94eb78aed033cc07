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
