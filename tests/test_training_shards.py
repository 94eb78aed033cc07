"""CDC→training-shards grand capstone: stage semantics (only v3
survivors are sharded, shards/positions/bins follow the deterministic
rules, packing respects the budget), streamed == batch across a
restart, replay idempotence. Hash parity vs the all-SQL oracle is
covered by the oracle sweep + check_one at 3 SFs."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from debezium_incubator_spark.catalog import table
from debezium_incubator_spark.cdc.corpus_refresh import (
    cdc_corpus_refresh,
    documents_change_log,
    documents_envelopes,
)
from debezium_incubator_spark.cdc.training_shards import (
    N_SHARDS,
    SHARD_PACK_BUDGET,
    SHARD_SEED,
    cdc_training_shards,
    read_latest_shards,
    start_training_shards_stream,
    training_shards_foreach_batch,
)

from .conftest import SF_SMOKE


def test_only_v3_survivors_are_sharded(spark):
    """Shard membership == the curation-v3 selection over the refreshed
    corpus (cdc_corpus_refresh's output ids), and token counts are the
    REAL unigram piece counts (positive, never whitespace counts)."""
    shards = cdc_training_shards(spark, SF_SMOKE).collect()
    kept = {r["doc_id"] for r in cdc_corpus_refresh(spark, SF_SMOKE).collect()}
    assert {r["doc_id"] for r in shards} == kept and kept
    assert all(r["n_tokens"] > 0 for r in shards)


def test_shard_order_and_packing_rules(spark):
    """Re-derive shard, position order, and bin assignment in Python
    from the output rows: shard = ascii(first md5 hex char) % N_SHARDS,
    positions are contiguous per shard in (ord_key, doc_id) order, and
    bin = exclusive running token sum DIV budget."""
    rows = cdc_training_shards(spark, SF_SMOKE).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        key = hashlib.md5(
            f"{SHARD_SEED}{r['doc_id']}".encode()
        ).hexdigest()
        assert r["shard"] == ord(key[0]) % N_SHARDS
        by_shard.setdefault(r["shard"], []).append((key, r))
    for shard, items in by_shard.items():
        items.sort(key=lambda t: (t[0], t[1]["doc_id"]))
        cs = 0
        for i, (_, r) in enumerate(items, start=1):
            assert r["pos"] == i, f"shard {shard} position gap at {i}"
            assert r["bin"] == cs // SHARD_PACK_BUDGET
            cs += r["n_tokens"]


def test_bins_respect_budget_except_oversized_docs(spark):
    """A bin only exceeds the budget when a SINGLE document does (the
    greedy streaming rule: a doc is never split)."""
    rows = cdc_training_shards(spark, SF_SMOKE).collect()
    bins: dict[tuple, list[int]] = {}
    for r in rows:
        bins.setdefault((r["shard"], r["bin"]), []).append(r["n_tokens"])
    assert len(bins) > N_SHARDS, "packing produced no multi-bin shards"
    for (shard, b), toks in bins.items():
        if sum(toks) > SHARD_PACK_BUDGET + max(toks):
            raise AssertionError(
                f"shard {shard} bin {b} overfilled beyond one doc"
            )


def test_stream_equals_batch_across_restart(spark, tmp_path):
    """Envelopes delivered as 3 micro-batch files, stream killed after
    the first and restarted on the same checkpoint — the final
    committed shard snapshot equals the one-shot batch query; the
    mid-stream snapshot differs (deletes arrive last)."""
    import glob

    docs = table(spark, SF_SMOKE, "documents")
    wire = documents_envelopes(documents_change_log(docs)).withColumn(
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

    stage_file(0)
    q = start_training_shards_stream(
        spark, stage, state_dir, out_dir, ckpt
    )
    q.awaitTermination(300)
    mid = sorted(
        tuple(r) for r in read_latest_shards(spark, out_dir).collect()
    )
    assert mid, "prefix snapshot is empty"

    stage_file(1)
    stage_file(2)
    q2 = start_training_shards_stream(
        spark, stage, state_dir, out_dir, ckpt
    )
    q2.awaitTermination(300)

    batch = sorted(
        tuple(r) for r in cdc_training_shards(spark, SF_SMOKE).collect()
    )
    streamed = sorted(
        tuple(r) for r in read_latest_shards(spark, out_dir).collect()
    )
    assert streamed == batch
    assert mid != batch  # the prefix saw a pre-delete world


def test_epoch_replay_is_idempotent(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents").limit(80)
    wire = documents_envelopes(documents_change_log(docs))
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    os.makedirs(state_dir)
    os.makedirs(out_dir)
    handle = training_shards_foreach_batch(state_dir, out_dir, n_buckets=4)
    handle(wire, 0)
    first = sorted(
        tuple(r) for r in read_latest_shards(spark, out_dir).collect()
    )
    handle(wire, 0)  # replay
    again = sorted(
        tuple(r) for r in read_latest_shards(spark, out_dir).collect()
    )
    assert first == again and first
