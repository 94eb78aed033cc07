"""VariantType ahead-of-schema ingest — the streaming proof of the
§1.1 claim (r10 verdict #8): CDC payloads whose JSON shape evolves
mid-stream ride a stable STRING column into ``parse_json`` variants,
so NEW fields become extractable the moment they appear — no stream
restart, no schema re-declaration, no registry round-trip.

Contrast with the static path: ``from_json`` with a declared schema
silently DROPS fields the schema doesn't name (PERMISSIVE mode), so a
producer-side widening is invisible until someone redeploys the
consumer with the new schema (the schema_registry.upgrade flow).
Variant defers the schema decision to EXTRACTION time: the binary
variant encoding preserves the full payload, ``variant_get`` pulls
typed fields on demand, and records from before the widening read
NULL for the new path — exactly Debezium's ahead-of-schema posture
for semi-structured payload columns.

Stateless per record → the streamed union across ANY file slicing
equals the one-shot batch run (per-batch deterministic overwrite =
replay idempotence), which is what the restart-spanning test pins.

Scale posture: parse_json/variant_get are expression-level (no Python,
no shuffle); the variant binary encoding is columnar-friendly and the
extraction prunes to the requested paths. At 100 TB this is a map-only
stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def variant_extract(df: DataFrame, paths: dict[str, tuple[str, str]],
                    payload_col: str = "props") -> DataFrame:
    """Parse ``payload_col`` once into a variant and extract typed
    fields: ``paths`` maps output column → (variant path, type). Also
    carries ``canon`` (the minified JSON canon of the full payload —
    nothing is lost, whatever the current shape)."""
    cols = [
        F.expr(
            f"variant_get(parse_json({payload_col}), '{p}', '{t}')"
        ).alias(name)
        for name, (p, t) in paths.items()
    ]
    return df.select(
        *[c for c in df.columns if c != payload_col],
        F.to_json(F.expr(f"parse_json({payload_col})")).alias("canon"),
        *cols,
    )


def variant_ingest_foreach_batch(out_dir: str,
                                 paths: dict[str, tuple[str, str]]):
    """foreachBatch handler: variant-extract the micro-batch and write
    it under ``out_dir/batch=<epoch>`` (deterministic overwrite —
    replay-idempotent; stateless per record, so the union across any
    slicing equals the one-shot batch run)."""

    def handle(batch: DataFrame, epoch: int) -> None:
        (
            variant_extract(batch, paths)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={epoch}"))
        )

    return handle


def start_variant_ingest_stream(
    spark: SparkSession,
    stage_dir: str,
    schema: str,
    out_dir: str,
    checkpoint: str,
    paths: dict[str, tuple[str, str]],
):
    """Ahead-of-schema ingest as a real Structured Streaming query:
    the SOURCE schema is stable (an id + a JSON string column) while
    the payload inside the string widens freely mid-stream."""
    os.makedirs(out_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    return (
        stream.writeStream
        .foreachBatch(variant_ingest_foreach_batch(out_dir, paths))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
