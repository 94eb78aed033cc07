"""CDC→ANN capstone: fold semantics reach the index (deletes leave,
re-embeds re-route, placeholder dups collapse), streamed == batch
across a restart, replay idempotence. Hash parity vs the all-SQL
oracle is covered by the oracle sweep."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.ann_refresh import (
    ANN_TAU,
    ann_refresh_foreach_batch,
    cdc_ann_refresh,
    embeddings_change_log,
    embeddings_envelopes,
    read_latest_index,
    route_to_cells,
    semdedup_survivors,
    start_ann_refresh_stream,
    unwrap_embeddings,
)
from debezium_incubator_spark.cdc.materialize import materialize_latest
from debezium_incubator_spark.llm.similarity import (
    IVF_AUDIT_DIR,
    _ensure_ivf_index,
)

from .conftest import SF_SMOKE


def _emb(spark):
    return table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _folded_state(spark):
    emb = _emb(spark)
    wire = embeddings_envelopes(embeddings_change_log(emb))
    flat = unwrap_embeddings(wire)
    return emb, materialize_latest(
        flat, keys=["vec_id"], position=["__pos"]
    ).select("vec_id", "v")


def test_fold_semantics_delete_update_draft(spark):
    """Deleted vectors LEAVE the state, updated ones carry the REAL
    embedding, never-updated ones keep their negated/placeholder
    draft — and the JSON wire round-trip is bit-exact for doubles."""
    emb, state = _folded_state(spark)
    fixture = {r["vec_id"]: list(r["v"]) for r in emb.collect()}
    got = {r["vec_id"]: list(r["v"]) for r in state.collect()}
    assert got, "folded state is empty"
    for vid, v in got.items():
        assert vid % 7 != 0, f"deleted vec {vid} still in state"
        if vid % 3 == 0:
            assert v == fixture[vid], f"update not applied to {vid}"
        elif vid % 5 == 0:
            assert v == [1.0] * 64
        else:
            assert v == [-x for x in fixture[vid]], f"draft lost on {vid}"
    assert set(got) == {v for v in fixture if v % 7 != 0}


def test_update_reroutes_to_real_cell(spark):
    """The re-embed path is observable in the INDEX: an updated vector
    must sit in the cell of its REAL embedding, and at least one
    never-updated draft must sit in a different cell than its real
    vector would (the negation moves it) — otherwise routing wouldn't
    distinguish draft from real and the update path would be
    decorative."""
    _ensure_ivf_index(spark, SF_SMOKE)
    emb, state = _folded_state(spark)
    cents = spark.read.parquet(f"{IVF_AUDIT_DIR}/centroids")
    folded = {
        r["vec_id"]: r["cell"]
        for r in route_to_cells(state, cents).collect()
    }
    real = {
        r["vec_id"]: r["cell"]
        for r in route_to_cells(emb, cents).collect()
    }
    updated = [v for v in folded if v % 3 == 0 and v % 5 != 0]
    assert updated and all(folded[v] == real[v] for v in updated)
    drafts = [v for v in folded if v % 3 != 0 and v % 5 != 0]
    moved = [v for v in drafts if folded[v] != real[v]]
    assert moved, "no draft re-routed — negation isn't load-bearing"


def test_placeholder_dups_collapse_to_min_keeper(spark):
    _ensure_ivf_index(spark, SF_SMOKE)
    _, state = _folded_state(spark)
    cents = spark.read.parquet(f"{IVF_AUDIT_DIR}/centroids")
    assigned = route_to_cells(state, cents)
    survivors = {
        r["vec_id"] for r in semdedup_survivors(assigned, ANN_TAU).collect()
    }
    ph = sorted(
        v for v in {r["vec_id"] for r in state.collect()}
        if v % 5 == 0 and v % 3 != 0
    )
    assert len(ph) > 1, "fixture must plant multiple placeholders"
    assert min(ph) in survivors
    assert not (set(ph) - {min(ph)}) & survivors


def test_stream_equals_batch_across_restart(spark, tmp_path):
    """Envelopes delivered as 3 micro-batch files, stream killed after
    the first and restarted on the same checkpoint — the final
    committed index snapshot must equal the one-shot batch query, and
    the mid-stream snapshot must differ (deletes arrive last)."""
    import glob

    idx = _ensure_ivf_index(spark, SF_SMOKE)
    emb = _emb(spark)
    wire = embeddings_envelopes(embeddings_change_log(emb)).withColumn(
        "__pos_sort",
        F.get_json_object("value", "$.source.pos").cast("long"),
    )
    stage = str(tmp_path / "stage")
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)
    rows = wire.orderBy("__pos_sort").drop("__pos_sort").collect()
    cut1, cut2 = len(rows) // 3, 2 * len(rows) // 3
    slices = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]

    def stage_file(i):
        tmp = str(tmp_path / f"tmp{i}")
        spark.createDataFrame(
            slices[i], "key STRING, value STRING"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        os.rename(src, os.path.join(stage, f"b{i}.parquet"))

    cents_dir = os.path.join(idx, "centroids")
    stage_file(0)
    q = start_ann_refresh_stream(
        spark, stage, cents_dir, state_dir, out_dir, ckpt
    )
    q.awaitTermination(300)
    mid = {
        (r["vec_id"], r["cell"])
        for r in read_latest_index(spark, out_dir).collect()
    }
    assert mid, "prefix index is empty"

    stage_file(1)
    stage_file(2)
    q2 = start_ann_refresh_stream(
        spark, stage, cents_dir, state_dir, out_dir, ckpt
    )
    q2.awaitTermination(300)

    batch = {
        (r["vec_id"], r["cell"])
        for r in cdc_ann_refresh(spark, SF_SMOKE).collect()
    }
    streamed = {
        (r["vec_id"], r["cell"])
        for r in read_latest_index(spark, out_dir)
        .select("vec_id", "cell").collect()
    }
    assert streamed == batch
    assert mid != batch  # the prefix saw a pre-delete world


def test_epoch_replay_is_idempotent(spark, tmp_path):
    idx = _ensure_ivf_index(spark, SF_SMOKE)
    emb = _emb(spark).limit(60)
    wire = embeddings_envelopes(embeddings_change_log(emb))
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    os.makedirs(state_dir)
    os.makedirs(out_dir)
    handle = ann_refresh_foreach_batch(
        os.path.join(idx, "centroids"), state_dir, out_dir, n_buckets=4
    )
    handle(wire, 0)
    first = sorted(
        (r["vec_id"], r["cell"])
        for r in read_latest_index(spark, out_dir).collect()
    )
    handle(wire, 0)  # replay
    again = sorted(
        (r["vec_id"], r["cell"])
        for r in read_latest_index(spark, out_dir).collect()
    )
    assert first == again and first
