"""Curation pipeline v2 (t48/t49) — engine-internal composition
consistency: the capstone's survivor set must equal the intersection
of the individually-registered gates, and t48's per-lang token totals
must re-aggregate t39's per-source totals (same BPE counts underneath).
Oracle parity of both queries is covered by the sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


def test_t49_survivors_are_gate_intersection(spark):
    lid = {
        r["doc_id"]
        for r in QUERIES["t44_language_id"](spark, SF_SMOKE)
        .where(F.col("pred_lang") == "en")
        .select("doc_id")
        .collect()
    }
    keep = {
        r["doc_id"]
        for r in QUERIES["t46_quality_classifier"](spark, SF_SMOKE)
        .where(F.col("keep"))
        .select("doc_id")
        .collect()
    }
    surv = {
        r["doc_id"]
        for r in QUERIES["t49_curation_v2"](spark, SF_SMOKE)
        .select("doc_id")
        .collect()
    }
    assert surv == (lid & keep)
    assert 0 < len(surv) < 500  # both gates actually cut something


def test_t48_totals_reaggregate_t39(spark):
    by_lang = QUERIES["t48_tokenizer_fertility"](spark, SF_SMOKE).agg(
        F.sum("total_tokens").alias("t"), F.sum("n_docs").alias("n")
    ).collect()[0]
    by_source = QUERIES["t39_bpe_tokens"](spark, SF_SMOKE).agg(
        F.sum("total_tokens").alias("t"), F.sum("n_docs").alias("n")
    ).collect()[0]
    # every fixture doc is >=3 chars, so LID drops none and the two
    # partitions of the corpus carry identical token mass
    assert (by_lang["t"], by_lang["n"]) == (by_source["t"], by_source["n"])


def test_curation_ingest_stream_across_restart(spark, tmp_path):
    """Streamed curation (one file per micro-batch, availableNow, a
    RESTART between file 2 and file 3) unions to exactly the one-shot
    batch run — no gate depends on arrival order or cross-batch state."""
    import os

    from debezium_incubator_spark.catalog import table
    from debezium_incubator_spark.llm.pipeline_v2 import (
        curate_docs,
        start_curation_ingest_stream,
    )

    import glob

    docs = table(spark, SF_SMOKE, "documents").cache()
    expected = {
        (r["doc_id"], r["red_md5"]) for r in curate_docs(docs).collect()
    }
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = docs.schema

    def stage_slice(j):
        tmp = str(tmp_path / f"tmp{j}")
        docs.where(F.col("doc_id") % 3 == j).coalesce(1).write.parquet(tmp)
        src = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        os.rename(src, os.path.join(stage, f"b{j}.parquet"))

    # stage two slices, drain, then a third slice after a "restart"
    stage_slice(0)
    stage_slice(1)
    q = start_curation_ingest_stream(spark, stage, schema, out, ckpt)
    q.awaitTermination(120)
    stage_slice(2)
    q2 = start_curation_ingest_stream(spark, stage, schema, out, ckpt)
    q2.awaitTermination(120)
    got = {
        (r["doc_id"], r["red_md5"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected and len(got) > 0
