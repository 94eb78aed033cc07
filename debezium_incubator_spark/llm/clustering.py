"""Duplicate-cluster resolution: connected components over near-dup
candidate pairs (the step after LSH/Jaccard candidate generation — "doc
A ~ B, B ~ C ⇒ {A,B,C} are one cluster, keep one representative").

Algorithm: iterative min-label propagation on DataFrames — each round
every doc adopts the smallest cluster label among itself and its
neighbors; converges in O(cluster diameter) rounds (near-dup clusters
are shallow; bounded at max_iter). This is the standard Spark-native
connected components without GraphFrames.

Scale: each round is one join + one aggregate on the edge list —
shuffle-bound on |edges|; persist() between rounds prevents lineage
blowup. At 100 TB use large-star/small-star (alternating) to cut rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .dedup import shingles


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    max_iter: int = 10,
) -> DataFrame:
    """Resolve (src, dst) similarity edges into (doc_id, cluster_id)
    with cluster_id = min doc_id in the component."""
    sym = edges.selectExpr(f"{src} AS a", f"{dst} AS b").unionByName(
        edges.selectExpr(f"{dst} AS a", f"{src} AS b")
    )
    labels = (
        sym.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .persist()
    )
    sym = sym.persist()
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


@register("dedup_clusters")
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over exact 3-gram Jaccard edges (j ≥ 0.1):
    (doc_id, cluster_id, is_representative). Deterministic (min-id
    labels) → rows-only check; the edge generation itself is
    oracle-checked as dedup_ngram_jaccard."""
    d = table(spark, sf_dir, "documents")
    sh = (
        d.filter(F.size(F.split(F.lower("text"), " ")) >= 3)
        .select("doc_id", F.explode(F.array_distinct(shingles("text"))).alias("sh"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    edges = (
        inter.join(sa, "doc_a").join(sb, "doc_b").filter(jac >= 0.1)
        .select("doc_a", "doc_b")
    )
    comps = connected_components(edges)
    return (
        comps.withColumn(
            "is_representative", F.col("doc_id") == F.col("cluster_id")
        )
        .orderBy("cluster_id", "doc_id")
    )
