"""e16_stickiness: the interval-merge + diff-array rolling-distinct
must equal the brute-force "count users active in the trailing W days"
on the real fixture (where >W-day gaps make the merge logic
load-bearing — 4 multi-interval users at sf0.001). Oracle parity of
the registered query is covered by the sweep."""

from __future__ import annotations

import duckdb

from debezium_incubator_spark.events.timeseries import STICKY_W
from debezium_incubator_spark.registry import all_queries

from .conftest import SF_SMOKE


def _brute_force(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS di
            FROM read_parquet('{sf_dir}/events.parquet')
            WHERE event_type = 'purchase'"""
    ).fetchall()
    days = sorted({d for _, d in rows})
    lo, hi = days[0], days[-1]
    out = {}
    for d in range(lo, hi + 1):
        dau = len({u for u, dd in rows if dd == d})
        wau = len({u for u, dd in rows if d - STICKY_W < dd <= d})
        out[d] = (dau, wau)
    return out


def test_rolling_distinct_matches_brute_force(spark):
    q = all_queries()["e16_stickiness"]
    got = {
        r["day_no"]: (r["dau"], r["wau"])
        for r in q(spark, SF_SMOKE).collect()
    }
    ref = _brute_force(SF_SMOKE)
    assert got == ref


def test_fixture_exercises_interval_merge():
    """At least one user must have a >W-day gap between active days —
    otherwise every user collapses to a single interval and the merge
    path is fixture-untested."""
    con = duckdb.connect()
    n = con.execute(
        f"""WITH ad AS (
              SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS di
              FROM read_parquet('{SF_SMOKE}/events.parquet')
              WHERE event_type = 'purchase'
            ), g AS (
              SELECT di - lag(di) OVER (PARTITION BY user_id ORDER BY di)
                     AS gap FROM ad
            )
            SELECT count(*) FROM g WHERE gap > {STICKY_W}"""
    ).fetchone()[0]
    assert n > 0


def test_zscore_fixture_non_degenerate(spark):
    """e17: the anomaly flag and the NULL-z warm-up rule must both be
    live on the fixture, or the differential proves nothing."""
    q = all_queries()["e17_rolling_zscore"]
    rows = q(spark, SF_SMOKE).collect()
    n_anom = sum(1 for r in rows if r["is_anomaly"])
    n_null = sum(1 for r in rows if r["z"] is None)
    assert n_anom > 0
    assert n_null == 20  # ZS_MIN_N warm-up days x 5 event types
    # leave-current-out: a NULL-z day is never flagged
    assert all(not r["is_anomaly"] for r in rows if r["z"] is None)


from hypothesis import given, settings
from hypothesis import strategies as st

PAIRS = st.sets(
    st.tuples(st.integers(0, 5), st.integers(0, 40)),
    min_size=1, max_size=60,
)
WIN = st.integers(1, 9)


@settings(max_examples=12, deadline=None)
@given(PAIRS, WIN)
def test_rolling_distinct_property(spark, pairs, w):
    """ANY activity-pair set and ANY window width: the interval-merge
    + diff-array pipeline equals the brute-force trailing-w distinct
    count on every spine day."""
    from debezium_incubator_spark.events.timeseries import (
        rolling_active_counts,
    )

    rows = sorted(pairs)
    df = spark.createDataFrame(rows, "user_id LONG, di LONG")
    got = {
        r["day_no"]: (r["dau"], r["wau"])
        for r in rolling_active_counts(df, w).collect()
    }
    lo = min(d for _, d in rows)
    hi = max(d for _, d in rows)
    assert set(got) == set(range(lo, hi + 1))
    for d in range(lo, hi + 1):
        dau = len({u for u, dd in rows if dd == d})
        wau = len({u for u, dd in rows if d - w < dd <= d})
        assert got[d] == (dau, wau), (d, w)
