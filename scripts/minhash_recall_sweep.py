"""MinHash-LSH band-configuration recall/precision sweep (r10 verdict
#5): run the banded candidate generator at several (bands × rows)
configurations — including the production 128-perm 16×8 — over the g1
scale fixture's planted near-dups, verify every candidate with the
EXACT shingle Jaccard, and record the curve.

What the numbers mean: with b bands of r rows, a pair at true Jaccard
j becomes a candidate with p = 1 - (1 - j^r)^b (the standard S-curve).
More rows per band sharpen the cutoff (fewer low-j false candidates →
higher precision at the verifier), more bands raise recall near the
knee. The default 4×4 is the fixture-sized demo the oracled portable
twin pins; 16×8 is the production shape (the Spark cost is one groupBy
with 128 agg columns — still a single shuffle — plus 4× the band rows).

Writes MINHASH_RECALL.json and prints a markdown table for
SCALEPROBE.md. Planted ground truth: docs (i-1, i) for i in multiples
of 50 (gen_scale_fixture.py), near-identical after the first word.

Usage: python scripts/minhash_recall_sweep.py [g1_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from debezium_incubator_spark.catalog import spread, table  # noqa: E402
from debezium_incubator_spark.llm.dedup import (  # noqa: E402
    lsh_candidates,
    minhash_signatures,
    shingles,
)
from debezium_incubator_spark.session import get_spark  # noqa: E402

#: (bands, rows_per_band) — num_perm = bands * rows
CONFIGS = [(4, 4), (8, 4), (8, 8), (16, 8)]
#: a candidate pair is a TRUE near-dup when exact shingle Jaccard ≥ τ
VERIFY_J = 0.5


def main() -> None:
    g1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaleprobe", "g1")
    spark = get_spark("minhash-recall")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, g1, "documents").select("doc_id", "text").cache()
    n_doc = docs.count()
    planted = {(i - 1, i) for i in range(50, n_doc, 50)}

    # exact shingle sets once, reused by every config's verifier
    sh = spread(docs).select(
        "doc_id", F.array_distinct(shingles("text")).alias("sh")
    ).cache()
    sh.count()

    rows = {}
    for bands, rpb in CONFIGS:
        num_perm = bands * rpb
        sigs = minhash_signatures(docs, num_perm=num_perm)
        cand = lsh_candidates(sigs, bands=bands, rows_per_band=rpb)
        verified = (
            cand.join(sh.select(F.col("doc_id").alias("doc_a"),
                                F.col("sh").alias("sha")), "doc_a")
            .join(sh.select(F.col("doc_id").alias("doc_b"),
                            F.col("sh").alias("shb")), "doc_b")
            .select(
                "doc_a", "doc_b",
                (F.size(F.array_intersect("sha", "shb"))
                 / F.size(F.array_union("sha", "shb"))).alias("j"),
            )
        )
        agg = verified.agg(
            F.count("*").alias("n_cand"),
            F.sum(F.when(F.col("j") >= VERIFY_J, 1).otherwise(0))
            .alias("n_true"),
        ).collect()[0]
        got = {
            (r["doc_a"], r["doc_b"])
            for r in cand.join(
                spark.createDataFrame(
                    sorted(planted), "doc_a LONG, doc_b LONG"
                ),
                ["doc_a", "doc_b"],
            ).collect()
        }
        rows[f"{bands}x{rpb}"] = {
            "num_perm": num_perm,
            "planted_recall": round(len(got) / len(planted), 4),
            "candidates": int(agg["n_cand"]),
            "verified_precision": round(
                (agg["n_true"] or 0) / max(agg["n_cand"], 1), 4
            ),
            "planted_pairs": len(planted),
        }
        print(f"{bands}x{rpb}: {rows[f'{bands}x{rpb}']}", flush=True)

    out = {
        "metric": "minhash_band_sweep",
        "fixture": g1,
        "verify_jaccard": VERIFY_J,
        "configs": rows,
    }
    with open(os.path.join(REPO, "MINHASH_RECALL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("| config | perms | planted recall | candidates | "
          "verified precision |")
    print("|---|---|---|---|---|")
    for k, v in rows.items():
        print(f"| {k} | {v['num_perm']} | {v['planted_recall']} "
              f"| {v['candidates']} | {v['verified_precision']} |")


if __name__ == "__main__":
    main()
