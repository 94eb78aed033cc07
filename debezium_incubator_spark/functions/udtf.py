"""UDTF surface (SURVEY.md §2K K5): Python table functions (Spark 3.5+).

The shingle expander is the planned use — one input row (doc) fans out
to many output rows (shingles). The expression route
(explode(transform(sequence(...)))) is faster (JVM-side) and is what
llm/dedup.py uses; the UDTF form exists for cases where the expansion
logic outgrows expressions (tokenizer-aware shingling, byte-pair merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def shingle_udtf():
    """Lazily construct the UDTF (decorator needs an active session)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id BIGINT, shingle STRING")
    class ShingleExpander:
        def eval(self, doc_id: int, text: str, k: int):
            toks = text.lower().split(" ")
            if len(toks) < k:
                yield doc_id, " ".join(toks)
                return
            seen = set()
            for i in range(len(toks) - k + 1):
                sh = " ".join(toks[i : i + k])
                if sh not in seen:  # distinct shingles per doc
                    seen.add(sh)
                    yield doc_id, sh

    return ShingleExpander


@register(
    "k5_udtf_shingles",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents WHERE doc_id < 50
)
SELECT doc_id, COUNT(*) AS n_shingles
FROM (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
  FROM toks WHERE len(ts) >= 3
)
GROUP BY doc_id
ORDER BY doc_id
""",
)
def k5_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-gram shingle counts via a Python UDTF (SQL LATERAL
    join), verified against the relational unnest oracle."""
    spark.udtf.register("shingle_expander", shingle_udtf())
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT s.doc_id, count(*) AS n_shingles
        FROM __udtf_docs d, LATERAL shingle_expander(d.doc_id, d.text, 3) s
        GROUP BY s.doc_id
        ORDER BY s.doc_id
        """
    )
