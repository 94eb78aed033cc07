"""CDC-apply scale probe (round-4 verdict item 4): measure the stateful
apply tier at two scales, testing the touched-bucket design's central
claim (debezium_incubator_spark/streaming/partitioned_state.py):

    per-batch cost is O(touched buckets x bucket size)
      -> SUB-LINEAR in total state (flat, for a fixed delta, once
         n_buckets scales with state so bucket size stays constant)
      -> LINEAR in delta size (touched buckets grow with delta keys)

and, as contrasts on the same fixture:
  - apply_changes_batch (monolithic rewrite): O(state) per batch BY
    DESIGN — expected to scale ~linearly with state at fixed delta;
  - apply_changes_lob_batch (versioned monolithic + placeholder
    inheritance): O(state) per batch by design, same expectation;
  - scd2_history: stateless over the full log — linear in changes.

Fixture: the `changes` table from scripts/gen_scale_fixture.py
(generate_changes — own rng stream; 1M*s rows over 500k*s keys).
Deltas are sliced from the log tail by FIXED ABSOLUTE key cutoffs
(k < 150 ~= 30 rows at EVERY scale; k < 1500 ~= 300 rows), so the
fixed-delta measurement holds the delta constant while state grows 10x.

Production bucket-sizing rule applied per scale: n_buckets =
max(16, state_rows / 1024) — bucket size constant as state grows
(the 100 TB rule "size buckets so one fits executor memory", scaled to
fixture size so touched-fraction dynamics are realistic).

Protocol: engine defaults (AQE on), 1 discarded warm apply then min of
2 timed applies per measurement (each apply is a REAL epoch: reads the
latest manifest/state, writes a new version — no stage reuse between
samples since lineage roots at freshly-written files). Writes
SCALEPROBE_CDC.json at the repo root; SCALEPROBE.md narrates.

Usage: python scripts/cdc_scale_probe.py [g0.1_dir g1_dir]
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

from debezium_incubator_spark.cdc.materialize import (  # noqa: E402
    apply_changes_lob_batch,
)
from debezium_incubator_spark.cdc.scd2 import scd2_history  # noqa: E402
from debezium_incubator_spark.session import get_spark  # noqa: E402
from debezium_incubator_spark.streaming.partitioned_state import (  # noqa: E402
    BUCKET_COL,
    _bucket,
    apply_changes_partitioned,
    compact_state,
    read_state_partitioned,
)
from debezium_incubator_spark.streaming.upsert import (  # noqa: E402
    apply_changes_batch,
    read_state,
)

ROWS_PER_BUCKET = 1024
DELTA_SMALL_KEYS = 150    # |delta| ~= 30 rows at every scale (see module doc)
DELTA_BIG_KEYS = 1500     # ~10x the small delta


def _timed_applies(fn, n_warm: int = 1, n_timed: int = 2) -> float:
    """fn(epoch) -> None; runs n_warm discarded + n_timed timed epochs,
    returns min of the timed ones. Epoch numbers keep increasing so
    every sample does the full real work against committed state."""
    epoch = [100]

    def run() -> float:
        t0 = time.perf_counter()
        fn(epoch[0])
        dt = time.perf_counter() - t0
        epoch[0] += 1
        return dt

    for _ in range(n_warm):
        run()
    return min(run() for _ in range(n_timed))


def probe_scale(spark, sf_dir: str) -> dict:
    chg = spark.read.parquet(os.path.join(sf_dir, "changes.parquet"))
    n_chg = chg.count()
    cut = int(n_chg * 0.9)
    boot = chg.filter(F.col("pos") < cut)
    tail = chg.filter(F.col("pos") >= cut)
    state_keys = boot.select("k").distinct().count()
    n_buckets = max(16, state_keys // ROWS_PER_BUCKET)
    d_small = tail.filter(F.col("k") < DELTA_SMALL_KEYS).cache()
    d_big = tail.filter(F.col("k") < DELTA_BIG_KEYS).cache()
    small_rows, small_keys = (
        d_small.count(), d_small.select("k").distinct().count(),
    )
    big_rows, big_keys = d_big.count(), d_big.select("k").distinct().count()
    touched_small = (
        d_small.select(_bucket(["k"], n_buckets).alias(BUCKET_COL))
        .distinct().count()
    )
    out: dict = {
        "changes_rows": n_chg,
        "state_keys": state_keys,
        "n_buckets": n_buckets,
        "delta_small": {"rows": small_rows, "keys": small_keys,
                        "touched_buckets": touched_small},
        "delta_big": {"rows": big_rows, "keys": big_keys},
    }

    work = tempfile.mkdtemp(prefix="dis_cdcprobe_")
    try:
        # --- partitioned (touched-bucket) apply --------------------------
        pstate = os.path.join(work, "part")
        t0 = time.perf_counter()
        apply_changes_partitioned(
            spark, boot, 0, pstate, ["k"], ["pos"], n_buckets=n_buckets
        )
        out["partitioned_bootstrap_sec"] = round(time.perf_counter() - t0, 3)
        out["partitioned_state_rows"] = read_state_partitioned(
            spark, pstate
        ).count()
        out["partitioned_apply_small_sec"] = round(_timed_applies(
            lambda e: apply_changes_partitioned(
                spark, d_small, e, pstate, ["k"], ["pos"], n_buckets=n_buckets
            )
        ), 3)
        out["partitioned_apply_big_sec"] = round(_timed_applies(
            lambda e: apply_changes_partitioned(
                spark, d_big, e + 50, pstate, ["k"], ["pos"],
                n_buckets=n_buckets
            )
        ), 3)

        # --- maintenance compaction (O(state) BY DESIGN) -----------------
        # every live bucket rewritten under one epoch; after the first
        # compaction all state is in one epoch so repeat samples do the
        # same-size work — _timed_applies' fresh epochs stay honest
        out["compact_state_sec"] = round(_timed_applies(
            lambda e: compact_state(
                spark, pstate, 900 + e, ["k"], n_buckets
            )
        ), 3)

        # --- monolithic full-rewrite contrast ----------------------------
        mstate = os.path.join(work, "mono")
        apply_changes_batch(spark, boot, 0, mstate, ["k"], ["pos"])
        out["monolithic_apply_small_sec"] = round(_timed_applies(
            lambda e: apply_changes_batch(
                spark, d_small, e, mstate, ["k"], ["pos"]
            )
        ), 3)
        assert read_state(spark, mstate) is not None

        # --- LOB-aware monolithic apply ----------------------------------
        lstate = os.path.join(work, "lob")
        apply_changes_lob_batch(
            spark, boot, 0, lstate, ["k"], ["pos"], lob_cols=["body"]
        )
        out["lob_apply_small_sec"] = round(_timed_applies(
            lambda e: apply_changes_lob_batch(
                spark, d_small, e, lstate, ["k"], ["pos"], lob_cols=["body"]
            )
        ), 3)

        # --- SCD2 over the full log (stateless, linear in changes) -------
        def scd2_run() -> float:
            t0 = time.perf_counter()
            (
                scd2_history(chg, ["k"], ["pos"])
                .agg(F.sum(F.col("is_current").cast("long")).alias("cur"),
                     F.count("*").alias("n"))
                .collect()
            )
            return time.perf_counter() - t0

        scd2_run()  # warm
        out["scd2_full_log_sec"] = round(min(scd2_run() for _ in range(2)), 3)
    finally:
        d_small.unpersist()
        d_big.unpersist()
        shutil.rmtree(work, ignore_errors=True)
    return out


# dir-basename -> fixture scale, for auto-generation of missing fixtures
SCALES = {"g0.1": 0.1, "g1": 1.0, "g3": 3.0}


def main() -> None:
    """argv: [lo_dir hi_dir [out_json]] — defaults g0.1 -> g1 into
    SCALEPROBE_CDC.json; a second pair (e.g. g1 -> g3) writes its own
    out_json. Labels in the output come from the dir basenames."""
    lo = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaleprobe", "g0.1")
    hi = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scaleprobe", "g1")
    out_json = sys.argv[3] if len(sys.argv) > 3 else "SCALEPROBE_CDC.json"
    lo_name = os.path.basename(lo.rstrip("/"))
    hi_name = os.path.basename(hi.rstrip("/"))
    for d in (lo, hi):
        if not os.path.exists(os.path.join(d, "changes.parquet")):
            from scripts.gen_scale_fixture import generate_changes

            s = SCALES[os.path.basename(d.rstrip("/"))]
            print(f"generating changes fixture at {d} (scale {s})",
                  flush=True)
            generate_changes(d, s)
    spark = get_spark("cdcprobe")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"== probe at {lo}", flush=True)
    r01 = probe_scale(spark, lo)
    print(json.dumps(r01, indent=1), flush=True)
    print(f"== probe at {hi}", flush=True)
    r1 = probe_scale(spark, hi)
    print(json.dumps(r1, indent=1), flush=True)

    def ratio(key: str) -> float:
        return round(r1[key] / max(r01[key], 1e-9), 2)

    result = {
        "metric": "cdc_apply_scale_probe",
        "scales": {lo_name: lo, hi_name: hi},
        "protocol": (
            "engine defaults (AQE on); bootstrap = first 90% of the log; "
            "deltas sliced from the tail by fixed absolute key cutoff "
            "(constant across scales); 1 discarded warm apply, min of 2 "
            "timed real epochs; n_buckets = state_keys/1024 per scale"
        ),
        lo_name: r01,
        hi_name: r1,
        "fixed_delta_state_scaleup": {
            "partitioned_ratio": ratio("partitioned_apply_small_sec"),
            "monolithic_ratio": ratio("monolithic_apply_small_sec"),
            "lob_ratio": ratio("lob_apply_small_sec"),
            "prediction": (
                "partitioned ~flat (touched x bucket_size is constant); "
                "monolithic/lob ~linear in state BY DESIGN (they are the "
                "small-state forms; partitioned is the scale path)"
            ),
        },
        "delta_10x_same_hi_state": {
            "hi_small_sec": r1["partitioned_apply_small_sec"],
            "hi_big_sec": r1["partitioned_apply_big_sec"],
            "ratio": round(
                r1["partitioned_apply_big_sec"]
                / max(r1["partitioned_apply_small_sec"], 1e-9), 2
            ),
            "prediction": "<= ~10 (linear in delta keys, plus fixed floor)",
        },
        "scd2_full_log_scaleup_ratio": ratio("scd2_full_log_sec"),
        "compact_state_scaleup_ratio": ratio("compact_state_sec"),
        "compact_note": (
            "compaction is O(state) BY DESIGN (maintenance cadence, "
            "not per-batch) — the ratio is expected to track the state "
            "growth factor, reported not gated"
        ),
    }
    violations = []
    if result["fixed_delta_state_scaleup"]["partitioned_ratio"] >= 4:
        violations.append("partitioned_apply_not_flat_in_state")
    if result["delta_10x_same_hi_state"]["ratio"] >= 15:
        violations.append("partitioned_apply_superlinear_in_delta")
    if result["scd2_full_log_scaleup_ratio"] >= 15:
        violations.append("scd2_superlinear")
    result["violations"] = violations
    with open(os.path.join(REPO, out_json), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if violations:
        raise SystemExit(f"scale violations: {violations}")


if __name__ == "__main__":
    main()
