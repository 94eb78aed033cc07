"""URL canonicalization + URL-level dedup (t34) — the first dedup stage
of web-scale corpus pipelines (CCNet, C4, RefinedWeb all dedup by URL
before touching content): crawl snapshots carry the same page under
scheme-case, host-case, default-port, tracking-parameter, param-order
and fragment variations, and collapsing those is pure string algebra —
no content comparison, no shuffle beyond the final group-by.

Canonical form implemented here (the common core of the published
pipelines):

- scheme and host lowercased;
- explicit default ports dropped (``:443`` for https, ``:80`` for http);
- trailing slashes stripped from the path;
- tracking parameters removed (``utm_*``, ``ref``, ``fbclid``, ``gclid``),
  remaining parameters SORTED (param order is not identity);
- fragment dropped.

Everything is builtin expressions (regexp extraction + higher-order
array functions) — JVM-side, whole-stage-codegen, linear at any corpus
size. The dedup itself is one hash aggregation on the canonical string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

#: query parameters that never change page identity. The t34 oracle
#: spells these literally in SQL — extending this list means extending
#: the oracle's LIKE chain too (the doc-fixture never exercises extras,
#: so parity stays green either way, but keep them in step).
TRACKING_PREFIXES = ("utm_", "ref=", "fbclid=", "gclid=")


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a single expression chain (see module doc).

    Scheme-less or otherwise unparseable strings fall back to the
    ORIGINAL value as their own canonical form — without the guard,
    every malformed URL would canonicalize to the same ``://`` string
    and url_dedup would silently merge distinct documents."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([^:]+)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]+)", 1))
    host = F.when(scheme == "https",
                  F.regexp_replace(host, r":443$", "")) \
        .when(scheme == "http", F.regexp_replace(host, r":80$", "")) \
        .otherwise(host)
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[^:]+://[^/?#]+([^?#]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)

    def _keep(p: Column) -> Column:
        cond = p != ""
        for pref in TRACKING_PREFIXES:
            cond = cond & ~p.startswith(pref)
        return cond

    kept = F.sort_array(F.filter(F.split(query, "&"), _keep))
    qs = F.array_join(kept, "&")
    built = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when((scheme == "") | (host == ""), u).otherwise(built)


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """URL-level dedup: one row per canonical URL with the KEEPER (the
    lowest id — deterministic, the convention every published pipeline
    uses) and the duplicate count. One hash aggregation; at 100 TB the
    group-by key is the canonical string (bounded skew — no single page
    dominates a crawl the way a hot shingle dominates n-gram joins)."""
    return (
        df.withColumn("__canon", canonicalize_url(url_col))
        .groupBy(F.col("__canon").alias("canonical_url"))
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


_URL_FIXTURE = """
  SELECT doc_id,
         'HTTPS://WWW.' || upper(source) || '.Example.COM:443/docs/'
           || CAST(doc_id % 37 AS VARCHAR) || '/?utm_source=feed&ref='
           || CAST(doc_id AS VARCHAR) || '&q=' || CAST(doc_id % 5 AS VARCHAR)
           || '#frag' AS url
  FROM documents
"""


@register(
    "t34_url_dedup",
    oracle=f"""
WITH urls AS ({_URL_FIXTURE}),
canon AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^([^:]+)://', 1)) || '://'
         || regexp_replace(
              lower(regexp_extract(url, '^[^:]+://([^/?#]+)', 1)),
              ':443$', '')
         || regexp_replace(
              regexp_extract(url, '^[^:]+://[^/?#]+([^?#]*)', 1),
              '/+$', '')
         || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
  FROM (
    SELECT doc_id, url,
           array_to_string(list_sort(list_filter(
             str_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
             p -> p <> '' AND NOT p LIKE 'utm\\_%' ESCAPE '\\'
                  AND NOT p LIKE 'ref=%' AND NOT p LIKE 'fbclid=%'
                  AND NOT p LIKE 'gclid=%'
           )), '&') AS qs
    FROM urls
  )
)
SELECT canonical_url, min(doc_id) AS keeper,
       CAST(count(*) AS BIGINT) AS n_dups
FROM canon GROUP BY canonical_url
ORDER BY canonical_url
""",
)
def t34_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL dedup, differentially proven on a noisy synthetic crawl: each
    document gets a URL with uppercase scheme/host, an explicit :443,
    tracking parameters (utm_source, ref), a real parameter (q), a
    trailing slash and a fragment. Engine canonicalization + group-by
    must match the oracle's independent SQL spelling of the same rules
    — docs sharing (doc_id % 37, doc_id % 5) collapse; the keeper is
    the lowest doc_id."""
    d = table(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW."), F.upper("source"),
            F.lit(".Example.COM:443/docs/"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit("/?utm_source=feed&ref="),
            F.col("doc_id").cast("string"),
            F.lit("&q="), (F.col("doc_id") % 5).cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    )
    return url_dedup(urls, "url", "doc_id").orderBy("canonical_url")
