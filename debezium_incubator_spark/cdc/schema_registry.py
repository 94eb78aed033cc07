"""Schema-history / versioned schema registry (SURVEY.md §2A A9, §1.1).

Debezium keeps a schema-history Kafka topic of DDL events so old log
entries decode against the schema current at their position; consumers
see per-record schema versions. The Spark-side analog: a versioned
StructType registry + a normalizing reader that upgrades any historical
version to the latest (add columns as nulls, drop removed ones, widen
types) — the consumer half of schema evolution, with Parquet
``mergeSchema`` covering storage-side drift.

Scale: normalization is a projection per version — no shuffle; unioning
N historical versions is unionByName(allowMissingColumns), zero-copy
per partition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _coerce(col, src: T.DataType, dst: T.DataType):
    """Expression-level type coercion that, unlike CAST, supports struct
    widening (missing target fields become typed nulls) and recurses
    through array elements and map keys/values."""
    if src == dst:
        return col
    if isinstance(dst, T.StructType) and isinstance(src, T.StructType):
        have = {f.name: f for f in src.fields}
        parts = []
        for f in dst.fields:
            if f.name in have:
                parts.append(
                    _coerce(
                        col.getField(f.name), have[f.name].dataType, f.dataType
                    ).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        rebuilt = F.struct(*parts)
        # struct(...) of null fields is a non-null struct — keep null rows null
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(rebuilt)
    if isinstance(dst, T.ArrayType) and isinstance(src, T.ArrayType):
        return F.transform(
            col, lambda x: _coerce(x, src.elementType, dst.elementType)
        )
    if isinstance(dst, T.MapType) and isinstance(src, T.MapType):
        return F.transform_values(
            F.transform_keys(
                col, lambda k, v: _coerce(k, src.keyType, dst.keyType)
            ),
            lambda k, v: _coerce(v, src.valueType, dst.valueType),
        )
    return col.cast(dst)


@dataclass
class SchemaRegistry:
    """Monotonic per-table schema versions (the schema-history topic)."""

    versions: dict[str, list[T.StructType]] = field(default_factory=dict)

    def register(self, table: str, schema: T.StructType) -> int:
        self.versions.setdefault(table, []).append(schema)
        return len(self.versions[table]) - 1

    def latest(self, table: str) -> T.StructType:
        return self.versions[table][-1]

    def version(self, table: str, v: int) -> T.StructType:
        return self.versions[table][v]

    def upgrade(
        self, df: DataFrame, table: str, keep: tuple[str, ...] = ()
    ) -> DataFrame:
        """Project a DataFrame of ANY historical version to the latest
        schema: missing columns → typed nulls; extra columns → dropped;
        common columns → coerced to the latest type. Nested struct
        evolution (a CQL UDT gaining a field) is rebuilt field-wise —
        Spark's CAST refuses struct widening — recursing through
        arrays and maps; everything stays expression-level (no UDF).

        ``keep`` passes pipeline metadata columns (``__op``, ``__pos``,
        …) through unchanged. A CDC fold must carry its ordering column
        alongside the payload — re-attaching it afterwards via a join on
        the business key silently cross-pairs payloads with positions
        whenever a key has several change rows in the batch."""
        target = self.latest(table)
        cols = []
        have = {f.name: f for f in df.schema.fields}
        for f in target.fields:
            if f.name in have:
                col = _coerce(F.col(f.name), have[f.name].dataType, f.dataType)
                cols.append(col.alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        cols.extend(F.col(name) for name in keep)
        return df.select(*cols)

    def union_versions(self, dfs: list[tuple[DataFrame, str]]) -> DataFrame:
        """Union snapshots captured under different schema versions into
        one latest-schema DataFrame (the replay-old-log-entries path)."""
        out = None
        for df, table in dfs:
            up = self.upgrade(df, table)
            out = up if out is None else out.unionByName(up)
        return out
