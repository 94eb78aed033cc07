"""URL canonicalization: each rule isolated, plus the dedup contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.llm.urls import canonicalize_url, url_dedup


def _canon(spark, url):
    return spark.createDataFrame([(url,)], "u STRING").select(
        canonicalize_url("u").alias("c")
    ).first().c


def test_rules_individually(spark):
    # case + default port + trailing slash + fragment + tracking params
    assert _canon(
        spark, "HTTPS://WWW.Site.COM:443/a/b/?utm_source=x&ref=1#top"
    ) == "https://www.site.com/a/b"
    # http default port; non-default port kept
    assert _canon(spark, "http://s.com:80/x") == "http://s.com/x"
    assert _canon(spark, "http://s.com:8080/x") == "http://s.com:8080/x"
    # :443 kept under http (not that scheme's default)
    assert _canon(spark, "http://s.com:443/x") == "http://s.com:443/x"
    # param order normalized, real params kept, gclid/fbclid dropped
    assert _canon(spark, "https://s.com/p?b=2&a=1&gclid=9&fbclid=8") == \
        "https://s.com/p?a=1&b=2"
    # bare root path, no query
    assert _canon(spark, "https://s.com/") == "https://s.com"


def test_variants_collapse_and_distinct_pages_survive(spark):
    df = spark.createDataFrame([
        (1, "https://s.com/page?a=1&b=2"),
        (2, "HTTPS://S.COM:443/page/?b=2&a=1&utm_campaign=z"),
        (3, "https://s.com/page?a=1&b=3"),       # different real param
        (4, "https://s.com/other?a=1&b=2"),      # different path
    ], "doc_id LONG, url STRING")
    got = {r.canonical_url: (r.keeper, r.n_dups)
           for r in url_dedup(df, "url", "doc_id").collect()}
    assert got == {
        "https://s.com/page?a=1&b=2": (1, 2),    # 1 and 2 collapsed
        "https://s.com/page?a=1&b=3": (3, 1),
        "https://s.com/other?a=1&b=2": (4, 1),
    }


def test_dedup_is_single_hash_aggregate(spark):
    df = spark.createDataFrame(
        [(1, "https://s.com/x")], "doc_id LONG, url STRING"
    )
    plan = url_dedup(df, "url", "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_malformed_urls_do_not_merge(spark):
    """Scheme-less strings canonicalize to THEMSELVES — without the
    guard every malformed URL became '://' and distinct documents
    silently merged into one keeper."""
    df = spark.createDataFrame([
        (1, "example.com/a"),
        (2, "other.org/b"),
        (3, "https://s.com/x"),
    ], "doc_id LONG, url STRING")
    got = {r.canonical_url: r.n_dups
           for r in url_dedup(df, "url", "doc_id").collect()}
    assert got == {
        "example.com/a": 1, "other.org/b": 1, "https://s.com/x": 1,
    }
