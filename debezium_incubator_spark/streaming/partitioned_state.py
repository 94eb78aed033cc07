"""Bucket-partitioned CDC state with manifest-tracked versions: the
100 TB path for continuous upsert.

``upsert.apply_changes_batch`` rewrites the whole state every batch —
correct, but O(state) writes. Here state is hash-bucketed by key
(``pmod(xxhash64(keys), n_buckets)``) and each micro-batch rewrites ONLY
the buckets its keys touch: O(touched buckets), not O(state). A JSON
manifest maps bucket -> the epoch that last rewrote it; the manifest
write is the atomic commit point (same protocol as upsert's ``_LATEST``
marker — data first, then pointer). This is the minimal table-format
idea (Iceberg/Delta manifests) expressed with plain parquet + JSON,
since this environment has no table-format jars.

Layout:
    state_dir/
      v{epoch}/__bucket={b}/*.parquet -- touched buckets of that epoch
      manifest_v{epoch}.json          -- {"bucket": epoch_that_wrote_it}
      _LATEST                         -- name of the committed manifest

Scale notes: n_buckets is the write-parallelism and rewrite granularity
knob — size buckets so one bucket's rows fit an executor's memory
(e.g. 100 TB / 4 GB ≈ 25k buckets). Bucket routing reuses the same hash
for every batch, so merges are per-bucket local after one shuffle of the
(small) batch; the big current-state side is read only for touched
buckets and never shuffled (parquet dirs are bucket-aligned).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

BUCKET_COL = "__bucket"


def _bucket(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")


def _atomic_write(path: str, content: str) -> None:
    """Crash-atomic small-file write: sibling .tmp + os.replace (POSIX
    rename atomicity). Readers never observe a partial file."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, path)


def read_latest_pointer(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the parquet artifact the ``_LATEST`` pointer names — the
    shared reader for every atomic-pointer snapshot tier (corpus/ANN/
    shards refresh, vocab refresh; r11 ADVICE: one copy, not four).
    The pointer content is a path RELATIVE to ``out_dir`` (epoch dir or
    manifest name), committed by ``_atomic_write``."""
    with open(os.path.join(out_dir, "_LATEST")) as f:
        return spark.read.parquet(os.path.join(out_dir, f.read().strip()))


class ConcurrentCommitError(RuntimeError):
    """Two writers produced DIFFERENT manifests for the same epoch —
    split-brain (e.g. two drivers resumed from the same checkpoint).
    A crash-replay of the SAME batch is fine (same mapping, idempotent);
    a different bucket→epoch mapping under one epoch id means the
    histories diverged and continuing would silently lose one of them."""


def _manifest_dumps(manifest: dict) -> str:
    """Canonical manifest serialization: sorted keys, so the bytes are
    a pure function of the mapping — never of dict insertion order or
    ``os.listdir`` order (a crash-replayed compaction rebuilds the same
    mapping from directory listings whose order the filesystem does not
    guarantee)."""
    return json.dumps(
        {str(k): int(v) for k, v in manifest.items()}, sort_keys=True
    )


def _same_manifest(a: str, b: str) -> bool:
    """Split-brain equality on the PARSED mapping, not raw bytes: a
    legitimate replay must pass even against a manifest serialized by
    an older writer with a different key order."""
    try:
        return json.loads(a) == json.loads(b)
    except ValueError:
        return a == b


def _commit_manifest(state_dir: str, epoch: int, content: str) -> None:
    """Epoch-manifest commit with a split-brain guard: if this epoch's
    manifest already exists with a DIFFERENT mapping, refuse loudly
    (Delta/Iceberg solve the same race with conditional commits; on a
    plain filesystem, mapping equality of the deterministic manifest is
    the equivalent check — replays rebuild the same mapping by
    construction, divergent writers do not)."""
    mf_path = os.path.join(state_dir, f"manifest_v{epoch}.json")
    if os.path.exists(mf_path):
        with open(mf_path) as f:
            existing = f.read()
        if not _same_manifest(existing, content):
            raise ConcurrentCommitError(
                f"epoch {epoch} already has a committed manifest with "
                f"different content in {state_dir} — concurrent writer "
                "detected; refusing to overwrite a diverged history"
            )
    _atomic_write(mf_path, content)


def _read_manifest(state_dir: str) -> dict[int, int] | None:
    marker = os.path.join(state_dir, "_LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    with open(os.path.join(state_dir, name)) as f:
        return {int(k): int(v) for k, v in json.load(f).items()}


def _write_stats(spark: SparkSession, state_dir: str, epoch: int,
                 vdir: str) -> dict[int, int]:
    """Per-bucket PHYSICAL row counts (tombstones included) of the
    buckets written under ``epoch`` → ``stats_v{epoch}.json``, committed
    by atomic rename BEFORE the manifest (commit order: data → stats →
    manifest → _LATEST, so a committed manifest always has its stats).
    This is the table-format statistics idea (Iceberg/Delta manifests
    carry row counts): planning questions — total state size, bucket
    skew, when to grow ``n_buckets`` via ``compact_state`` — are
    answered from KB-scale JSON, never a state scan. The counting job
    reads back only THIS epoch's delta (touched buckets), O(batch)."""
    if not os.path.isdir(vdir) or not any(
        d.startswith(f"{BUCKET_COL}=") for d in os.listdir(vdir)
    ):
        counts: dict[int, int] = {}
    else:
        counts = {
            int(r[BUCKET_COL]): int(r["cnt"])
            for r in spark.read.parquet(vdir)
            .groupBy(BUCKET_COL)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
    _atomic_write(
        os.path.join(state_dir, f"stats_v{epoch}.json"),
        json.dumps({str(k): v for k, v in counts.items()}, sort_keys=True),
    )
    return counts


def pinned_bucket_count(
    meta_path: str,
    requested: int | None,
    n_keys,
    target: int = 1000,
    floor: int = 8,
) -> int:
    """Resolve a tier's bucket count against its persisted sidecar
    (round 13, r12 verdict #4 + ADVICE): the FIRST resolution derives
    ``max(floor, ceil(n_keys() / target))`` (``n_keys`` is a lazy
    callable — the bulk load sizes the tier; fixed bucket counts
    measured the lookup fold O(state) in the round-12 ANN probe) or
    takes an explicit ``requested``, and persists it at ``meta_path``;
    every later resolution returns the persisted value and RAISES on a
    disagreeing explicit ``requested`` — re-bucketing an existing tier
    is only legal through ``compact_state``'s guarded path (a silently
    different bucketing computes wrong bucket ids for targeted reads
    and corrupts state with no error)."""
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            persisted = int(json.load(fh)["n_buckets"])
        if requested is not None and requested != persisted:
            raise ValueError(
                f"n_buckets={requested} disagrees with the tier's "
                f"persisted bucketing {persisted} in {meta_path} — "
                "re-bucketing an existing tier is only legal via "
                "compact_state"
            )
        return persisted
    nb = requested if requested is not None else max(
        floor, -(-int(n_keys()) // target)
    )
    _atomic_write(meta_path, json.dumps({"n_buckets": nb}))
    return nb


def bucket_row_counts(spark: SparkSession, state_dir: str) -> dict[int, int]:
    """Current per-bucket physical row counts, resolved manifest-style:
    bucket b's count comes from the stats file of the epoch that last
    wrote b. Falls back to counting a bucket's parquet directly when its
    epoch predates the stats feature (legacy states stay readable)."""
    manifest = _read_manifest(state_dir) or {}
    by_epoch: dict[int, list[int]] = {}
    for b, e in manifest.items():
        by_epoch.setdefault(e, []).append(b)
    out: dict[int, int] = {}
    for e, buckets in by_epoch.items():
        sp = os.path.join(state_dir, f"stats_v{e}.json")
        if os.path.exists(sp):
            with open(sp) as f:
                stats = {int(k): int(v) for k, v in json.load(f).items()}
        else:
            stats = {}
        for b in buckets:
            if b in stats:
                out[b] = stats[b]
            else:  # legacy epoch without stats: count that bucket once
                out[b] = spark.read.parquet(
                    os.path.join(state_dir, f"v{e}", f"{BUCKET_COL}={b}")
                ).count()
    return out


def state_row_count(spark: SparkSession, state_dir: str) -> int:
    """Total physical rows in current state from manifest stats — the
    O(KB) answer to "how big is my state" that at 100 TB replaces a
    full scan."""
    return sum(bucket_row_counts(spark, state_dir).values())


def bucket_skew(spark: SparkSession, state_dir: str) -> dict:
    """Planning signal from stats alone: ``max/mean`` bucket-size ratio
    plus the extremes. A ratio far above ~2 says the bucketing is too
    coarse (or keys are skewed) — the operational trigger for
    ``compact_state`` with a larger ``n_buckets``."""
    counts = bucket_row_counts(spark, state_dir)
    if not counts:
        return {"buckets": 0, "rows": 0, "max": 0, "mean": 0.0, "ratio": 0.0}
    vals = list(counts.values())
    mean = sum(vals) / len(vals)
    return {
        "buckets": len(vals),
        "rows": sum(vals),
        "max": max(vals),
        "mean": mean,
        "ratio": (max(vals) / mean) if mean else 0.0,
    }


def apply_changes_partitioned(
    spark: SparkSession,
    batch: DataFrame,
    epoch: int,
    state_dir: str,
    keys: list[str],
    position: list[str],
    n_buckets: int = 16,
    op_col: str = "__op",
    touched: list[int] | None = None,
) -> None:
    """Merge one micro-batch, rewriting only touched buckets. Replaying
    a committed epoch is idempotent: the rewrite is deterministic and
    the manifest commit happens last.

    ``touched`` (optional): the batch's bucket ids, precomputed by a
    caller that already collected the batch's key set (the incremental
    ANN handler does, for its lookup-tier read) — skips the
    distinct-collect driver job. Contract: it must be EXACTLY the ids
    ``_bucket(keys, n_buckets)`` assigns to the batch; verified against
    the written partition directories after the write (a wrong list
    would otherwise commit manifest rows pointing at directories that
    were never written — silent data loss on the next read)."""
    manifest = _read_manifest(state_dir) or {}
    batch = batch.withColumn(BUCKET_COL, _bucket(keys, n_buckets))
    caller_touched = touched is not None
    if touched is None:
        touched = sorted(
            r[BUCKET_COL]
            for r in batch.select(BUCKET_COL).distinct().collect()
        )
    else:
        touched = sorted(touched)
    # Split-brain check BEFORE any data write: the manifest this apply
    # WILL commit is already determined by (current manifest, touched,
    # epoch). If this epoch's manifest exists with different content, a
    # divergent writer got here first — refusing NOW protects its
    # committed bucket dirs from our overwrite; refusing only at commit
    # time would be too late. A replay of the same batch rebuilds the
    # same mapping and passes (idempotency preserved; comparison is on
    # the parsed mapping, serialization is canonical sort_keys).
    expected_manifest = _manifest_dumps(
        {**manifest, **{b: epoch for b in touched}}
    )
    mf_path = os.path.join(state_dir, f"manifest_v{epoch}.json")
    if os.path.exists(mf_path):
        with open(mf_path) as f:
            if not _same_manifest(f.read(), expected_manifest):
                raise ConcurrentCommitError(
                    f"epoch {epoch} already has a committed manifest with "
                    f"different content in {state_dir} — concurrent "
                    "writer detected; refusing before overwriting its data"
                )
    current_paths = [
        os.path.join(state_dir, f"v{manifest[b]}", f"{BUCKET_COL}={b}")
        for b in touched if b in manifest
    ]
    merged = batch
    if current_paths:
        # mergeSchema: buckets live in DIFFERENT epochs, which can have
        # different schemas after a mid-stream DDL widening — without it
        # the read picks one file's schema and silently drops the rest
        current = spark.read.option(
            "mergeSchema", "true"
        ).parquet(*current_paths).withColumn(
            BUCKET_COL, _bucket(keys, n_buckets)
        )
        # allowMissingColumns: schema-widened batches (mid-stream DDL
        # ADD COLUMN) merge cleanly; old bucket rows surface NULL
        merged = current.unionByName(batch, allowMissingColumns=True)
    w = W.partitionBy(*keys).orderBy(*[F.desc(p) for p in position])
    folded = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # ONE job writes every touched bucket (dynamic partition dirs under
    # this epoch); untouched buckets are never read or written. Cluster
    # rows by bucket BEFORE the partitionBy write: the fold's window
    # shuffle distributes by key hash, so without this every task holds
    # rows of many buckets and the dynamic-partition write emits up to
    # tasks x touched_buckets files (at 32 tasks x 488 buckets that is
    # ~15k near-empty parquet files PER EPOCH — found by the round-5 CDC
    # scale probe). Repartitioning on the bucket column lands each
    # bucket wholly in one task → exactly one file per touched bucket,
    # and per-bucket write parallelism = touched buckets. Same move
    # Iceberg/Delta make (cluster by partition expression before write).
    vdir = os.path.join(state_dir, f"v{epoch}")
    (
        folded.repartition(max(len(touched), 1), F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(vdir)
    )
    if caller_touched:
        # the precomputed list is only trusted after verification: every
        # touched bucket must have been physically written (the fold
        # keeps ≥1 row per key — tombstones are retained rows — so an
        # exact list always matches) and nothing outside it may exist
        written = {
            int(d.split("=", 1)[1])
            for d in os.listdir(vdir)
            if d.startswith(f"{BUCKET_COL}=")
        } if os.path.isdir(vdir) else set()
        if written != set(touched):
            raise ValueError(
                f"caller-provided touched buckets {sorted(touched)} do "
                f"not match written partition dirs {sorted(written)} in "
                f"{vdir} — refusing to commit a lying manifest"
            )
    _write_stats(spark, state_dir, epoch, vdir)
    manifest.update({b: epoch for b in touched})
    # Both commit files land by ATOMIC RENAME (write sibling .tmp, then
    # os.replace): a truncate-in-place `open(..., "w")` can leave a torn
    # manifest or — far worse — a torn _LATEST pointer if the writer
    # dies mid-write, bricking every reader. With rename-commit, a crash
    # at ANY byte leaves either the old file or the new one, never a
    # partial (fault-injection-tested in tests/test_upsert.py). The
    # manifest commit additionally refuses split-brain (same epoch,
    # different content) — pre-checked above, re-checked here in case a
    # racer landed between the check and this commit.
    mf = f"manifest_v{epoch}.json"
    assert _manifest_dumps(manifest) == expected_manifest
    _commit_manifest(state_dir, epoch, expected_manifest)
    _atomic_write(os.path.join(state_dir, "_LATEST"), mf)  # commit point


def read_state_partitioned(
    spark: SparkSession, state_dir: str,
    include_tombstones: bool = False, op_col: str = "__op",
) -> DataFrame | None:
    """Assemble current state from each bucket's latest version."""
    manifest = _read_manifest(state_dir)
    if not manifest:
        return None
    paths = [
        os.path.join(state_dir, f"v{v}", f"{BUCKET_COL}={b}")
        for b, v in manifest.items()
    ]
    # mergeSchema: see apply_changes_partitioned — cross-epoch buckets
    # may differ in schema after a mid-stream DDL widening
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    if not include_tombstones:
        df = df.filter(F.col(op_col) != "d").drop(op_col)
    return df


def read_state_partitioned_at(
    spark: SparkSession, state_dir: str, epoch: int,
    include_tombstones: bool = False, op_col: str = "__op",
) -> DataFrame | None:
    """Point-in-time read of the bucket-partitioned state: resolve the
    largest COMMITTED manifest <= ``epoch`` (a manifest counts only if
    it is, or precedes, the one ``_LATEST`` points at — a crash between
    manifest write and pointer update must stay invisible, mirroring
    upsert.list_versions) and assemble state from its bucket → epoch
    references. This is the manifest-pick analog of upsert's full-copy
    ``read_state_at``: at 100 TB the historical state is reachable
    through KB-scale manifests, never a second copy of the data.

    Raises ValueError when ``epoch`` predates the vacuum horizon —
    either every retained manifest is newer, or the resolved manifest
    references bucket dirs that vacuum already reclaimed ("that history
    was GC'd" must be loud, not an empty result). Returns None only
    when no manifest was ever committed."""
    marker = os.path.join(state_dir, "_LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        committed_name = f.read().strip()
    committed_epoch = int(committed_name.split("_v")[1].split(".")[0])
    manifests = sorted(
        int(n.split("_v")[1].split(".")[0])
        for n in os.listdir(state_dir)
        if n.startswith("manifest_v") and n.endswith(".json")
    )
    manifests = [m for m in manifests if m <= committed_epoch]
    if not manifests:
        # _LATEST exists but its manifest is gone: corrupted/hand-pruned
        # state — loud, never a silent empty read
        raise ValueError(
            f"{state_dir} has a _LATEST pointer but no committed "
            f"manifest files (pointer: {committed_name})"
        )
    eligible = [m for m in manifests if m <= epoch]
    if not eligible:
        raise ValueError(
            f"epoch {epoch} predates the vacuum horizon of {state_dir}; "
            f"oldest retained manifest is v{manifests[0]}"
        )
    with open(
        os.path.join(state_dir, f"manifest_v{eligible[-1]}.json")
    ) as f:
        manifest = {int(k): int(v) for k, v in json.load(f).items()}
    paths = [
        os.path.join(state_dir, f"v{v}", f"{BUCKET_COL}={b}")
        for b, v in manifest.items()
    ]
    missing = [p for p in paths if not os.path.isdir(p)]
    if missing:
        raise ValueError(
            f"state at epoch {epoch} is past the vacuum horizon: manifest "
            f"v{eligible[-1]} references reclaimed buckets "
            f"(e.g. {missing[0]})"
        )
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    if not include_tombstones:
        df = df.filter(F.col(op_col) != "d").drop(op_col)
    return df


def start_partitioned_upsert_stream(
    changes: DataFrame,
    state_dir: str,
    keys: list[str],
    position: list[str],
    n_buckets: int = 16,
    checkpoint: str | None = None,
):
    """foreachBatch driver for the partitioned apply (I6 at scale)."""
    os.makedirs(state_dir, exist_ok=True)
    spark = changes.sparkSession

    def handle(batch: DataFrame, epoch: int) -> None:
        apply_changes_partitioned(
            spark, batch, epoch, state_dir, keys, position, n_buckets
        )

    writer = changes.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def vacuum_partitioned(state_dir: str, keep_last: int = 1) -> list[str]:
    """GC: drop epoch data not reachable from the last `keep_last`
    committed manifests. A bucket untouched for many epochs still points
    at an OLD epoch dir, so reachability is the union of bucket->epoch
    references in the kept manifests — never just "delete old v dirs"
    (that would tear live state). Time-travel reads older than the kept
    horizon stop working, by design. Returns removed paths."""
    import shutil

    manifests = sorted(
        (int(n.split("_v")[1].split(".")[0]), n)
        for n in os.listdir(state_dir)
        if n.startswith("manifest_v") and n.endswith(".json")
    )
    if not manifests:
        return []
    with open(os.path.join(state_dir, "_LATEST")) as f:
        committed = f.read().strip()
    # keep the committed manifest plus keep_last-1 predecessors
    c_idx = [i for i, (_, n) in enumerate(manifests) if n == committed][0]
    kept = manifests[max(0, c_idx - keep_last + 1): c_idx + 1]
    live: set[tuple[int, int]] = set()
    for _, name in kept:
        with open(os.path.join(state_dir, name)) as f:
            for b, v in json.load(f).items():
                live.add((int(b), int(v)))
    removed = []
    kept_names = {n for _, n in kept}
    for _, name in manifests:
        if name not in kept_names:
            os.remove(os.path.join(state_dir, name))
            removed.append(name)
    # stats files share v-dir liveness: keep stats_v{e} while any kept
    # manifest still references epoch e, reclaim otherwise
    live_epochs = {v for (_, v) in live}
    for entry in os.listdir(state_dir):
        if entry.startswith("stats_v") and entry.endswith(".json"):
            e = int(entry[len("stats_v"):-len(".json")])
            if e not in live_epochs:
                os.remove(os.path.join(state_dir, entry))
                removed.append(entry)
    for entry in os.listdir(state_dir):
        if not (entry.startswith("v") and entry[1:].isdigit()):
            continue
        epoch = int(entry[1:])
        vdir = os.path.join(state_dir, entry)
        for bdir in os.listdir(vdir):
            if not bdir.startswith(f"{BUCKET_COL}="):
                continue
            b = int(bdir.split("=")[1])
            if (b, epoch) not in live:
                shutil.rmtree(os.path.join(vdir, bdir))
                removed.append(os.path.join(entry, bdir))
        if not any(n.startswith(f"{BUCKET_COL}=") for n in os.listdir(vdir)):
            shutil.rmtree(vdir)
    return removed


def compact_state(
    spark: SparkSession,
    state_dir: str,
    epoch: int,
    keys: list[str],
    n_buckets: int,
    drop_tombstones: bool = False,
    op_col: str = "__op",
) -> dict | None:
    """Maintenance compaction: rewrite EVERY live bucket under one new
    epoch and commit, collapsing version sprawl (a long-running upsert
    stream leaves each bucket's file in whichever epoch last touched
    it, so reads fan out across many v-dirs and vacuum can reclaim
    nothing older than the most-scattered reference). After compaction
    the manifest points every bucket at ``epoch`` and
    ``vacuum_partitioned`` reclaims all prior epochs. O(state) by
    design — maintenance cadence, not per-batch; same atomic
    rename-commit as the apply path, so a crash mid-compaction leaves
    the old state fully live.

    ``drop_tombstones=True`` additionally drops delete markers. Only
    safe when upstream delivery is position-monotonic: a tombstone
    guards against an idempotent REPLAY of an older position
    resurrecting the key (the fold would pick the stale row if the
    newer delete is gone). Default keeps them.

    Returns {"buckets", "rows", "dropped_tombstones"} or None if no
    committed state exists."""
    manifest = _read_manifest(state_dir)
    if not manifest:
        return None
    # compaction must target a NEW epoch: writing into an epoch the
    # manifest still references would overwrite live bucket dirs WHILE
    # reading them. (A crashed compaction replays fine — its epoch was
    # never committed, so it's still > the committed epoch.)
    committed = max(manifest.values())
    if epoch <= committed:
        raise ValueError(
            f"compaction epoch {epoch} must exceed the newest committed "
            f"epoch {committed} (writing into a live epoch would "
            "overwrite bucket dirs the compaction is reading)"
        )
    paths = [
        os.path.join(state_dir, f"v{v}", f"{BUCKET_COL}={b}")
        for b, v in manifest.items()
    ]
    # mergeSchema: see apply_changes_partitioned — cross-epoch buckets
    # may differ in schema after a mid-stream DDL widening
    df = spark.read.option("mergeSchema", "true").parquet(*paths).withColumn(
        BUCKET_COL, _bucket(keys, n_buckets)
    )
    dropped = 0
    if drop_tombstones:
        dropped = df.filter(F.col(op_col) == "d").count()
        df = df.filter(F.col(op_col) != "d")
    # one file per bucket, full-width write parallelism
    vdir = os.path.join(state_dir, f"v{epoch}")
    (
        df.repartition(n_buckets, F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(vdir)
    )
    # The manifest MUST reflect the buckets ACTUALLY written, not the old
    # manifest's ids: (1) drop_tombstones can empty a bucket entirely —
    # no dir is written for it, and a stale manifest entry would make
    # every subsequent read raise path-not-found; (2) compacting with a
    # different n_buckets re-buckets rows into NEW ids — keeping the old
    # ids both points reads at missing dirs and silently orphans the
    # newly written buckets (data loss). Listing the partition dirs of
    # the epoch just written is the ground truth for both.
    new_manifest = {
        int(d.split("=")[1]): epoch
        for d in os.listdir(vdir)
        if d.startswith(f"{BUCKET_COL}=")
    } if os.path.isdir(vdir) else {}
    counts = _write_stats(spark, state_dir, epoch, vdir)
    mf = f"manifest_v{epoch}.json"
    # canonical serialization (sort_keys): new_manifest is rebuilt from
    # os.listdir order here, so a crash-replay of this compaction must
    # not trip the split-brain guard on a mere key-order difference
    _commit_manifest(state_dir, epoch, _manifest_dumps(new_manifest))
    _atomic_write(os.path.join(state_dir, "_LATEST"), mf)
    rows = sum(counts.values())
    return {
        "buckets": len(new_manifest),
        "rows": rows,
        "dropped_tombstones": dropped,
    }
