"""Tests for the 100 TB posture tools: salting, two-phase agg, bucketed
writes, late-data and update-mode streaming semantics."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.operators.skew import salted_join, two_phase_agg
from debezium_incubator_spark.streaming.pipeline import run_available_now
from debezium_incubator_spark.streaming.sources import events_file_stream

from .conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    """Salting must not change the result set — only the distribution."""
    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    salted = salted_join(li, o, "l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    assert plain.n == salted.n
    assert abs(plain.q - salted.q) < 1e-6


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows land in multiple salt partitions."""
    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "x")], "k LONG, v STRING")
    out = salted_join(hot, dim, "k")
    assert out.count() == 10000
    # distribution check: recompute the salts the helper assigns
    salts = hot.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
    ).select("__salt").distinct().count()
    assert salts == 8  # hot key spread across all salt buckets


def test_two_phase_agg_matches_direct(spark):
    ev = table(spark, SF_SMOKE, "events")
    direct = (
        ev.groupBy("event_type").agg(F.count("*").alias("n")).toPandas()
        .sort_values("event_type").reset_index(drop=True)
    )
    salted = (
        two_phase_agg(ev, "event_type", [("event_id", "count", "sum", "n")])
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, salted, check_dtype=False)


def test_bucketed_write_coLocates_join(spark):
    """bucketBy pre-co-locates future joins on the bucket key (scale:
    repeated joins on the same key skip their shuffle)."""
    try:
        o = table(spark, SF_SMOKE, "orders")
        (
            o.write.mode("overwrite")
            .bucketBy(4, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("orders_bucketed")
        )
        b = spark.table("orders_bucketed")
        assert b.count() == o.count()
        # self-join on the bucket key: plan must have NO shuffle exchange
        j = b.join(b.withColumnRenamed("o_orderkey", "k2"), "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_sink_two_table_join_is_exchange_free(spark):
    """The A8 bucketed_sink product API: two DIFFERENT tables written
    with the same bucket spec join via SortMergeJoin with zero
    Exchange on either side AND no per-side Sort (sortBy in the layout)
    — the write-once-shuffle, join-forever-free contract."""
    from debezium_incubator_spark.cdc.sinks import bucketed_sink

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed_sink(
            table(spark, SF_SMOKE, "orders"), "orders_bk",
            ["o_custkey"], n_buckets=4, sort_cols=["o_custkey"],
        )
        bucketed_sink(
            table(spark, SF_SMOKE, "customer"), "customer_bk",
            ["c_custkey"], n_buckets=4, sort_cols=["c_custkey"],
        )
        o, c = spark.table("orders_bk"), spark.table("customer_bk")
        j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").agg(
            F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # join sides read pre-bucketed + pre-sorted: the ONLY exchange
        # allowed is the final single-key aggregate's
        assert plan.count("Exchange hashpartitioning") == 1
        assert "c_mktsegment" in plan.split("Exchange hashpartitioning")[0]
        # results identical to the unbucketed join
        direct = (
            table(spark, SF_SMOKE, "orders")
            .join(
                table(spark, SF_SMOKE, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        got = {(r.c_mktsegment, r.n) for r in j.collect()}
        want = {(r.c_mktsegment, r.n) for r in direct.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bk")
        spark.sql("DROP TABLE IF EXISTS customer_bk")


def test_late_data_dropped_past_watermark(spark):
    """I7: with availableNow over one file batch the watermark starts at
    -inf, so a second run is needed to observe dropping; here we verify
    the aggregate state contract instead: windows older than the final
    watermark are emitted exactly once (append) and the trailing window
    is withheld — the mechanism that makes late data droppable."""
    from debezium_incubator_spark.streaming.pipeline import tumbling_counts

    stream = events_file_stream(spark, SF_SMOKE)
    run_available_now(tumbling_counts(stream), "t_late")
    emitted = spark.sql("SELECT max(bucket) b FROM t_late").first().b
    max_ts = table(spark, SF_SMOKE, "events").agg(F.max("ts")).first()[0]
    # the bucket containing max_ts must NOT be emitted (not yet final)
    assert emitted < max_ts.replace(minute=0, second=0, microsecond=0)


def test_update_mode_running_aggregate(spark):
    """D7/I8: update-mode streaming aggregate — running per-type counts
    (no watermark needed; state is the running total)."""
    stream = events_file_stream(spark, SF_SMOKE)
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    run_available_now(agg, "t_update", output_mode="update")
    got = spark.sql(
        "SELECT event_type, max(n) AS n FROM t_update GROUP BY event_type"
    ).toPandas().sort_values("event_type").reset_index(drop=True)
    want = (
        table(spark, SF_SMOKE, "events")
        .groupBy("event_type").agg(F.count("*").alias("n"))
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_more_plan_shapes(spark):
    """Physical-plan audit of the TPC-H shape sweep: dims broadcast,
    EXISTS/NOT EXISTS stay semi/anti joins, scalar-subquery thresholds
    arrive via broadcast (no collect), scan-level pushdown survives."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    # q4: EXISTS compiles to a semi join, never a distinct+inner rewrite
    p4 = _plan(q["q4_order_priority"](spark, SF_SMOKE))
    assert "LeftSemi" in p4
    # q22: NOT EXISTS stays an anti join; threshold is a broadcast NLJ
    p22 = _plan(q["q22_idle_rich_customers"](spark, SF_SMOKE))
    assert "LeftAnti" in p22
    assert "BroadcastNestedLoopJoin" in p22
    # q9: all three dims (part/supplier/nation) broadcast to the fact
    p9 = _plan(q["q9_product_profit"](spark, SF_SMOKE))
    assert p9.count("BroadcastHashJoin") >= 3
    # q9's p_type filter reaches the parquet scan
    assert "PushedFilters: [" in p9 and "p_type" in p9
    # q15: the scalar max arrives as a 1-row broadcast, not a collect
    # (Catalyst turns crossJoin+equality into an equi BroadcastHashJoin)
    p15 = _plan(q["q15_top_supplier"](spark, SF_SMOKE))
    assert "BroadcastExchange" in p15


def test_connector_override_pushdown(spark):
    """snapshot.select.statement.overrides predicates reach the scan."""
    from debezium_incubator_spark.connector import snapshot

    df = snapshot(
        spark,
        SF_SMOKE,
        {
            "table.include.list": "orders",
            "snapshot.select.statement.overrides.orders": (
                "SELECT o_orderkey, o_totalprice FROM orders "
                "WHERE o_totalprice > 100000"
            ),
        },
    )["orders"]
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "o_totalprice" in plan
    # projection pruning: scan reads only the two selected columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan


def test_compact_small_files(spark):
    """Many small micro-batch files → few target-sized files, rows intact."""
    from debezium_incubator_spark.maintenance import compact

    ev = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    with tempfile.TemporaryDirectory() as td:
        src, dst = os.path.join(td, "small"), os.path.join(td, "big")
        ev.repartition(40).write.parquet(src)  # simulate 40 micro-batches
        n_small = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
        assert n_small == 40
        n_out = compact(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
        assert n_out < n_small
        assert spark.read.parquet(dst).count() == ev.count()


def test_cluster_layout_prunes(spark):
    """Range clustering: each output file covers a narrow user_id range
    (the parquet min/max data-skipping precondition)."""
    from debezium_incubator_spark.maintenance import compact_and_cluster

    ev = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    with tempfile.TemporaryDirectory() as td:
        src, dst = os.path.join(td, "src"), os.path.join(td, "dst")
        ev.repartition(8).write.parquet(src)  # user_ids scattered per file
        compact_and_cluster(spark, src, dst, by=["user_id"],
                            target_file_bytes=4 * 1024)
        files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
        assert len(files) > 1
        spans, total_span = [], 0
        import pyarrow.parquet as pq

        for f in files:
            t = pq.read_table(os.path.join(dst, f), columns=["user_id"])
            u = t.column("user_id").to_pylist()
            spans.append((min(u), max(u)))
            total_span += max(u) - min(u)
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        # clustered: per-file ranges are (near-)disjoint slices, so the
        # sum of spans ≈ global span, not n_files × global span
        assert total_span <= (hi - lo) * 1.5


def test_zorder_cluster_boxes_both_dims(spark):
    """Z-order layout: over a uniform 256x256 grid written to 16 files,
    each file must cover a small BOX in both dimensions — the sum of
    per-file (span_x x span_y) areas ~ the global area, where a
    scattered layout would sum to ~16x and single-column clustering
    would leave the other dimension's spans full-width."""
    from debezium_incubator_spark.maintenance import zorder_cluster

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    with tempfile.TemporaryDirectory() as td:
        dst = os.path.join(td, "z")
        zorder_cluster(grid, ["x", "y"], num_files=16, bits=8).write.parquet(dst)
        import pyarrow.parquet as pq

        files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
        assert len(files) == 16
        area = 0
        for f in files:
            t = pq.read_table(os.path.join(dst, f))
            xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
            area += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        # perfect tiling = 1.0x the global area; z-curve seams allow a
        # little overlap, scattered data would be ~16x
        assert area <= 2.0 * 256 * 256, f"sum of file boxes = {area}"

    # guard: key must fit a long
    import pytest

    with pytest.raises(ValueError, match="63-bit"):
        zorder_cluster(grid, ["x", "y", "x", "y"], bits=16)


def test_new_operator_plan_shapes(spark):
    """Plan audit for the post-sweep additions: grouping sets run as ONE
    Expand + aggregate (not a union of scans), the LATERAL top-k is
    decorrelated into a window/join (no per-row re-execution node), and
    unpivot expands map-side before its single shuffle."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    pgs = _plan(q["agg_grouping_sets"](spark, SF_SMOKE))
    assert "Expand" in pgs
    assert pgs.count("FileScan") + pgs.count("Scan parquet") <= 2  # one read
    assert "Union" not in pgs

    plat = _plan(q["sql_lateral_topk"](spark, SF_SMOKE))
    # decorrelated: a rank/limit over a join — no lateral loop operator
    assert "Window" in plat or "Join" in plat

    pun = _plan(q["agg_unpivot"](spark, SF_SMOKE))
    assert "Expand" in pun
    assert "Union" not in pun


def test_round3_plan_shapes(spark):
    """Scale-posture audit for the round-3 queries: the decontamination
    join broadcasts its benchmark pool (no corpus shuffle for the
    probe), batch KNN broadcasts the query set and prunes ranks via
    WindowGroupLimit, and the RANGE-frame window runs as a single
    window over one scan."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    p14 = _plan(q["t14_decontaminate"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p14 and "BroadcastExchange" in p14

    pbk = _plan(q["sim_batch_knn"](spark, SF_SMOKE))
    assert "BroadcastExchange" in pbk  # query batch broadcast
    assert "WindowGroupLimit" in pbk  # rank>k pruned pre-materialization

    prf = _plan(q["w_range_frame"](spark, SF_SMOKE))
    assert "Window" in prf and "RangeFrame" in prf or "rangeframe" in prf.lower()
    assert prf.count("Exchange hashpartitioning") <= 1  # one window shuffle


def test_round3_late_plan_shapes(spark):
    """Scale-posture audit for the late round-3 queries: gap-fill
    broadcasts the tiny spine grid (the raw table never shuffles against
    it), the chunker explodes pipeline-locally (no Exchange feeding the
    Generate), the histogram is one partial+final hash aggregate, and
    the bigram repetition filter builds pairs with an array transform
    (Generate over transform — no self-join of the token table)."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    pgf = _plan(q["e7_gapfill_locf"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in pgf  # grid side broadcast, fact side streams

    pch = _plan(q["t18_chunk_documents"](spark, SF_SMOKE))
    assert "Generate" in pch  # explode present
    # nothing between scan and explode requires a shuffle
    assert "Exchange hashpartitioning" not in pch.split("Generate")[-1]

    phist = _plan(q["agg_histogram"](spark, SF_SMOKE))
    assert phist.count("HashAggregate") >= 2  # partial + final
    assert phist.count("Exchange hashpartitioning") <= 1

    prep = _plan(q["t19_rep_2gram"](spark, SF_SMOKE))
    assert "Generate" in prep
    assert "SortMergeJoin" not in prep  # no token-table self-join


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning_plan_and_dirs(spark):
    """scan_partition_static_prune: the literal IN-predicate must land in
    the scan's PartitionFilters (directory-level skipping, resolved at
    planning time), and the partitioned copy must actually have one
    directory per event type."""
    from debezium_incubator_spark.operators import pruning

    df = pruning.scan_partition_static_prune(spark, SF_SMOKE)
    plan = _executed_plan(df)
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "event_type" in scan[0].split("PartitionFilters")[1], plan
    # layout: 5 hive directories, the filter keeps 2
    part_dir = pruning._EVENTS_PART_DIRS[SF_SMOKE]
    vals = pruning._dir_partitions(part_dir, "event_type")
    assert vals == ["click", "error", "purchase", "signup", "view"]
    assert df.count() == 2


def test_dpp_join_plants_dynamic_pruning_subquery(spark):
    """join_dpp: the fact scan must carry a dynamicpruningexpression —
    the dim filter's surviving keys prune fact directories at RUNTIME
    (star-schema shape; a static filter cannot express this)."""
    from debezium_incubator_spark.operators import pruning

    df = pruning.join_dpp(spark, SF_SMOKE)
    plan = _executed_plan(df)
    assert "dynamicpruning" in plan, plan
    assert df.count() == 2  # conversion types: purchase, signup


def test_runtime_bloom_filter_injected_and_result_unchanged(spark):
    """runtime_filter_conf: with the join key NOT the partition column
    and the dim side too big to broadcast, Spark must inject a
    might_contain(bloom) filter on the fact side — rows that cannot
    join die before the shuffle. Results must equal the unfiltered
    join's."""
    from debezium_incubator_spark.operators.pruning import runtime_filter_conf

    with tempfile.TemporaryDirectory() as td:
        table(spark, SF_SMOKE, "lineitem").write.parquet(f"{td}/fact")
        table(spark, SF_SMOKE, "part").write.parquet(f"{td}/dim")

        def q():
            fact = spark.read.parquet(f"{td}/fact")
            dim = spark.read.parquet(f"{td}/dim").filter(F.col("p_size") == 1)
            return (
                fact.join(dim, fact.l_partkey == dim.p_partkey)
                .groupBy("p_brand").count().orderBy("p_brand")
            )

        want = q().collect()
        saved = {
            "spark.sql.autoBroadcastJoinThreshold":
                spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        }
        confs = runtime_filter_conf(
            creation_side_threshold="100MB", application_side_threshold="0"
        )
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            df = q()
            plan = _executed_plan(df)
            assert "might_contain" in plan, plan
            assert df.collect() == want
        finally:
            for k in confs:
                spark.conf.unset(k)
            for k, v in saved.items():
                spark.conf.set(k, v)


def test_new_family_plan_shapes(spark):
    """Scale-posture audit for the graph/ER/timeseries additions:
    triangle counting broadcasts only the 25-row nation dims (the wedge
    join is an equi-join, no cartesian anywhere), the EWMA query is ONE
    window exchange (no join, no extra shuffle), the fuzzy join's
    levenshtein runs AFTER the block equi-join (never all-pairs), and
    the checksum is a partial+final hash aggregate."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    ptri = _plan(q["iter_triangles"](spark, SF_SMOKE))
    assert "CartesianProduct" not in ptri
    assert "BroadcastNestedLoopJoin" not in ptri

    pew = _plan(q["w_ewma"](spark, SF_SMOKE))
    assert "Window" in pew
    assert "Join" not in pew
    assert pew.count("Exchange hashpartitioning") == 1

    # round 13: the registered form checkpoints before its trailing
    # sort (sampler re-ran the pair expansion), so the join shape is
    # audited on the unsorted seam and the checkpoint on the query
    from debezium_incubator_spark.operators.joins import fuzzy_blocked_agg

    pfz = _plan(fuzzy_blocked_agg(spark, SF_SMOKE))
    assert "CartesianProduct" not in pfz
    assert "BroadcastNestedLoopJoin" not in pfz
    assert "levenshtein" in pfz
    pfzq = _plan(q["join_fuzzy_blocked"](spark, SF_SMOKE))
    assert "ExistingRDD" in pfzq  # the pre-sort checkpoint

    pck = _plan(q["cdc_table_checksum"](spark, SF_SMOKE))
    assert pck.count("HashAggregate") >= 2  # partial + final, exact XOR merge

    pns = _plan(q["join_null_safe"](spark, SF_SMOKE))
    assert "HashJoin" in pns  # <=> hash-joins on (coalesce, isnull)
    assert "BroadcastNestedLoopJoin" not in pns

    pcd = _plan(q["w_count_distinct_running"](spark, SF_SMOKE))
    assert pcd.count("Window") == 2  # flag window + running-sum window
    assert "collect_set" not in pcd  # no per-row distinct-set state

    pudf = _plan(q["fn_sql_udf"](spark, SF_SMOKE))
    assert "BatchEvalPython" not in pudf  # SQL UDFs inline, never Python
    assert "ArrowEvalPython" not in pudf
    assert pudf.count("HashAggregate") >= 2  # partial+final survives inlining


def test_round5_curation_plan_shapes(spark):
    """Plan audit for the round-5 curation queries — the broadcast-cliff
    lesson (r4's t13 silently flipped broadcast->SMJ at 10x) applied
    proactively:
    - t22_decontam_bloom: the Bloom bitmap AND the exact confirm set
      both broadcast (two BroadcastHashJoin/NestedLoop sides, zero
      SortMergeJoin — corpus shingles are never shuffled for a join);
    - t23_source_mixture: the mixing table joins broadcast, no
      SortMergeJoin anywhere (the corpus is scanned, aggregated
      map-side, and probed against KB-scale broadcasts only)."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    p22 = _plan(q["t22_decontam_bloom"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in p22
    assert "BroadcastHashJoin" in p22 or "BroadcastNestedLoopJoin" in p22

    p23 = _plan(q["t23_source_mixture"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in p23
    assert "BroadcastHashJoin" in p23


def test_q6_predicates_all_pushed(spark):
    """q6 is the canonical pushdown query: every predicate (shipdate
    range, discount band, quantity cap) reaches the parquet scan, the
    scan reads only the four referenced columns, and the plan is a
    two-phase HashAggregate with no join."""
    from debezium_incubator_spark.registry import all_queries

    p = _plan(all_queries()["q6_forecast_revenue"](spark, SF_SMOKE))
    assert "PushedFilters: [" in p
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in p or col in p.split("PushedFilters")[1][:400]
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2  # partial + final
    m = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert m and all(
        c in m[0] for c in
        ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
    ) and "l_orderkey" not in m[0]


def test_round7_fold_plan_shapes(spark):
    """Round-7 connector folds keep the engine's audited plan shapes:
    the Cassandra cell fold runs Partial+Final WindowGroupLimit at
    limit 1 (the shuffle carries candidates, never all cells) with the
    tombstone side broadcast; the LogMiner fold broadcasts the commit
    set; the per-domain cap prunes at k on both sides of its shuffle."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    p = _plan(q["cdc_cassandra_cell_lww"](spark, SF_SMOKE))
    assert p.count("WindowGroupLimit") >= 2      # partial + final
    assert "BroadcastHashJoin" in p              # tombstone watermark
    assert "SortMergeJoin" not in p

    p = _plan(q["cdc_logminer_commit_order"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p              # commit set
    assert "SortMergeJoin" not in p

    p = _plan(q["t29_domain_cap"](spark, SF_SMOKE))
    assert p.count("WindowGroupLimit") >= 2


def _hint_count(df) -> int:
    """Number of user-forced join-strategy hints in the ANALYZED plan.

    F.broadcast() becomes a ResolvedHint node before optimization; a
    join the optimizer broadcasts on its own (size statistics / AQE)
    carries none. Zero hints on a data-scaling side means AQE can
    degrade the join to shuffle at 100× instead of OOMing on a hint it
    is not allowed to override."""
    return df._jdf.queryExecution().analyzed().toString().count(
        "ResolvedHint"
    )


def test_no_forced_broadcast_of_data_scaling_sides(spark):
    """Round-9 broadcast-inventory audit (r8 verdict #1): the plans
    whose broadcast side GROWS with the data must carry no F.broadcast
    hint — only genuinely bounded sides (one-row aggregates) may keep
    one. BroadcastHashJoin may still appear in the small-SF physical
    plan (statistics-chosen) — that is the point: the choice belongs to
    the optimizer, not a hint."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    # e15: three one-row summary crossJoins keep hints; the
    # user-cardinality stage joins (s, v) must carry none
    assert _hint_count(q["e15_funnel"](spark, SF_SMOKE)) == 3
    # whole-log one-shot commit joins: zero forced broadcasts (the
    # commit/UOW side holds every transaction of the mined history)
    assert _hint_count(q["cdc_logminer_commit_order"](spark, SF_SMOKE)) == 0
    assert _hint_count(q["cdc_db2_uow_fold"](spark, SF_SMOKE)) == 0
    # xstream one-shot: only the one-row gmax broadcast survives
    assert _hint_count(q["cdc_xstream_fold"](spark, SF_SMOKE)) == 1


def test_sort_sits_below_expensive_projections(spark):
    """Round-9 probe finding (SCALE.md): a global Sort ABOVE a
    shuffle-free expensive projection makes the range partitioner's
    sample job re-execute the whole chain (t45 measured 47 s -> 1.9 s
    at g3 after moving it). Pin the optimized-plan shape: the heavy
    Project must sit ABOVE the Sort for the fixed queries."""
    from debezium_incubator_spark.registry import all_queries

    q = all_queries()
    for name, marker in [
        ("t45_pii_redact", "regexp_replace"),
        ("t49_curation_v2", "regexp_replace"),
        ("cdc_cloudevents_wire", "from_json"),
    ]:
        plan = (
            q[name](spark, SF_SMOKE)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        pi, si = plan.find(marker), plan.find("Sort ")
        assert 0 <= pi, f"{name}: expected {marker} in the plan"
        assert 0 <= si, f"{name}: expected a global Sort in the plan"
        # toString prints top-down: the projection node must appear
        # BEFORE (above) the Sort node
        assert pi < si, f"{name}: {marker} project sits below the Sort"


def test_aqe_skew_split_on_hot_token_scoring_join(spark):
    """Pin the LM-scoring skew story with MEASURED plans, not prose
    (r10 verdict #6). Two facts, both load-bearing at 100 TB:

    1. With the frequency side MATERIALIZED (the production shape —
       corpus statistics are computed once and persisted, then the
       scoring join reads them back), AQE's skew-join split engages
       on a Zipf-hot token: ``SortMergeJoin(skew=true)`` + a skewed
       ``AQEShuffleRead`` in the executed plan, results unchanged.
    2. With the frequency aggregate INLINE (the compact spelling the
       registered t27/t50 use — correct at fixture scale), the final
       HashAggregate sits between the join and its shuffle, so
       OptimizeSkewedJoin's pattern (both children = bare shuffle
       reads) can NOT match and no split happens — the hot partition
       is a straggler AQE cannot fix. This round CORRECTED the
       docstrings that claimed otherwise; materialize-the-stats is
       the documented mitigation.
    """
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
        # AQE must not coalesce everything into one partition first
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def scoring_join(materialize: bool):
        # the t27 shape: token stream ⋈ token-frequency table; 90% of
        # tokens are one hot key
        docs = spark.range(0, 20000).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("the the the the the the the the the u"),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        toks = docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
        if materialize:
            freq = freq.localCheckpoint(eager=True)
        return (
            toks.join(freq, "tok")
            .groupBy("doc_id")
            .agg(F.sum("c").alias("s"))
        )

    baseline = {
        (r["doc_id"], r["s"]) for r in scoring_join(False).collect()
    }
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = scoring_join(True)
        got = {(r["doc_id"], r["s"]) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE skew-join split did not engage on the hot token:\n"
            + plan[:4000]
        )
        assert got == baseline

        # fact 2: the inline-agg spelling structurally can't split
        df2 = scoring_join(False)
        assert {(r["doc_id"], r["s"]) for r in df2.collect()} == baseline
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan2, (
            "inline-agg scoring join unexpectedly split — update the "
            "t27/t50 docstrings, the mitigation note is now stale"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
