"""Probe: cell-scoped incremental ANN refresh — per-epoch cost must
scale with the TOUCHED CELLS of the delta, not with index size
(r11 verdict #3's "done" criterion).

Protocol: build the incremental index by bulk epoch 0 over g0.1's
embeddings and over g1's (10× vectors; centroids from the matching
corpus-sized build so cell population stays ~constant), then time the
SAME fixed small delta epoch against each. Near-flat wall time across
the 10× index = the epoch reads/writes only the delta's touched cells
and buckets. The delta must be SMALL relative to nlist for the bound
to bind at fixture scale (a 32-vector delta touches ~64 cells — the
entire 16-cell g0.1 index AND most of g1's 100; at 4 vectors the
touched set is ≤8 cells at both scales, so the per-epoch data work is
genuinely constant and the residual ratio is fixed job overhead +
driver-side manifest work). n_buckets and nlist both scale ∝ n (the
production sizing rules) — with them FIXED the lookup fold and the
per-cell pair work are O(state), measured ratio 2.4 before the rule
was applied here.
Contrast row: the FULL-recompute handler (`ann_refresh_foreach_batch`)
on the same delta, which re-routes + re-dedups the whole index per
epoch and must scale ~linearly with it.

Idle-box rule applies (CLAUDE.md): never run concurrently with other
Spark jobs; re-run suspicious numbers fresh.

Usage: python scripts/probe_ann_incremental.py [g0.1_dir g1_dir]
Writes SCALEPROBE_ANN_INCR.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from debezium_incubator_spark.cdc.ann_refresh import (  # noqa: E402
    ann_refresh_foreach_batch,
    ann_refresh_incremental_foreach_batch,
    embeddings_change_log,
    embeddings_envelopes,
)
from debezium_incubator_spark.llm.similarity import (  # noqa: E402
    _vectors,
    build_ivf_index,
)
from debezium_incubator_spark.session import get_spark  # noqa: E402

DELTA_N = 4


def _setup(spark, sf_dir: str, work: str):
    """Bulk-load epoch 0 for both handler kinds over sf_dir's
    embeddings; returns (inc_handle, full_handle, delta_wire)."""
    emb = _vectors(spark, sf_dir).select("vec_id", "v")
    n = emb.count()
    idx0 = os.path.join(work, "base_index")
    build_ivf_index(emb, idx0, nlist=max(16, n // 500))
    cents = os.path.join(idx0, "centroids")
    wire_all = embeddings_envelopes(embeddings_change_log(emb))

    inc_dir = os.path.join(work, "inc")
    # n_buckets scales with state (the partitioned-state production
    # rule — fixed buckets make the lookup-tier fold O(state)); cells
    # are already ∝ n via nlist, so bucket sizing is the only knob
    inc = ann_refresh_incremental_foreach_batch(
        cents, inc_dir, n_buckets=max(8, n // 500)
    )
    inc(wire_all, 0)

    full_state = os.path.join(work, "full_state")
    full_out = os.path.join(work, "full_out")
    os.makedirs(full_state)
    os.makedirs(full_out)
    full = ann_refresh_foreach_batch(cents, full_state, full_out)
    full(wire_all, 0)

    # fixed small delta: re-embed DELTA_N early vectors (update wave)
    delta = embeddings_envelopes(
        embeddings_change_log(
            emb.filter((F.col("vec_id") % 3 == 0)).limit(DELTA_N)
        ).filter(F.col("__op") == "u")
    )
    return inc, full, delta


def _time_epochs(handle, delta, first_epoch: int, n: int = 3) -> float:
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        handle(delta, first_epoch + k)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    g01 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaleprobe", "g0.1")
    g1 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scaleprobe", "g1")
    spark = get_spark("annincrprobe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    for label, sf in (("g0.1", g01), ("g1", g1)):
        work = tempfile.mkdtemp(prefix=f"annincr_{label.replace('.','')}_")
        try:
            inc, full, delta = _setup(spark, sf, work)
            delta = delta.localCheckpoint()  # freeze the delta input
            rows[label] = {
                "incremental_epoch_sec": round(
                    _time_epochs(inc, delta, 1), 3),
                "full_recompute_epoch_sec": round(
                    _time_epochs(full, delta, 1), 3),
            }
            print(label, rows[label], flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    inc_ratio = (rows["g1"]["incremental_epoch_sec"]
                 / rows["g0.1"]["incremental_epoch_sec"])
    full_ratio = (rows["g1"]["full_recompute_epoch_sec"]
                  / rows["g0.1"]["full_recompute_epoch_sec"])
    result = {
        "metric": "ann_incremental_epoch_probe",
        "delta_vectors": DELTA_N,
        "scales": {"g0.1": g01, "g1": g1},
        "epochs": rows,
        "incremental_ratio_10x_index": round(inc_ratio, 2),
        "full_recompute_ratio_10x_index": round(full_ratio, 2),
        "protocol": "bulk epoch 0 per scale, then median-of-3 fixed "
                    f"{DELTA_N}-vector delta epochs; idle box",
    }
    with open(os.path.join(REPO, "SCALEPROBE_ANN_INCR.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
