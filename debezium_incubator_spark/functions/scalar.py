"""Scalar-function surface (SURVEY.md §2H) — one oracle-checked query per
family. All JVM-side built-ins (whole-stage codegen; no Python UDFs).

Cross-engine parity notes are inline per query; the general rules:
- regexp_replace: Spark replaces ALL matches by default, DuckDB only the
  first → the oracle passes the 'g' flag.
- dayofweek: Spark is 1=Sunday, DuckDB 0=Sunday → oracle adds 1.
- Integer results of floor/ceil are cast to BIGINT on both sides
  (Spark returns BIGINT natively, DuckDB DOUBLE).
- No float→string rendering anywhere (engine-specific formatting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


# --- H1: strings ----------------------------------------------------------

@register(
    "fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS uname,
       lower(p_brand) AS lbrand,
       length(p_name) AS name_len,
       substring(p_type, 1, 4) AS type4,
       concat(p_brand, ':', p_type) AS brand_type,
       lpad(p_brand, 12, '.') AS padded,
       trim(concat(' ', p_name, ' ')) AS trimmed,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel,
       replace(p_brand, 'Brand#', 'B') AS brand_short,
       instr(p_type, 'O') AS o_pos,
       translate(p_brand, '#', '-') AS brand_dash,
       (p_brand LIKE 'Brand#1%') AS is_b1,
       reverse(p_brand) AS rev,
       split_part(p_brand, '#', 2) AS brand_id_str
FROM part
ORDER BY p_partkey
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.lpad("p_brand", 12, ".").alias("padded"),
        F.trim(F.concat(F.lit(" "), "p_name", F.lit(" "))).alias("trimmed"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("devowel"),
        F.expr("replace(p_brand, 'Brand#', 'B')").alias("brand_short"),
        F.expr("instr(p_type, 'O')").alias("o_pos"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.col("p_brand").like("Brand#1%").alias("is_b1"),
        F.reverse("p_brand").alias("rev"),
        F.expr("split_part(p_brand, '#', 2)").alias("brand_id_str"),
    ).orderBy("p_partkey")


@register(
    "fn_levenshtein",
    oracle="""
SELECT n.n_name, r.r_name,
       levenshtein(n.n_name, r.r_name) AS edit_dist,
       CASE WHEN levenshtein(n.n_name, r.r_name) > 5 THEN -1
            ELSE levenshtein(n.n_name, r.r_name) END AS edit_dist_max5
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY n.n_name
""",
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 extension: edit distance (fuzzy matching / entity resolution).
    Spark's 3-arg form short-circuits the DP once the running minimum
    exceeds the threshold (returns -1) — use it at 100 TB where most
    pairs are far apart; the oracle emulates with CASE (DuckDB has no
    threshold arg). Exact integers on both sides — no parity risk."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "n_name", "r_name",
            F.levenshtein("n_name", "r_name").alias("edit_dist"),
            F.levenshtein("n_name", "r_name", 5).alias("edit_dist_max5"),
        )
        .orderBy("n_name")
    )


# --- H2: date / time ------------------------------------------------------

@register(
    "fn_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       day(o_orderdate) AS dom,
       quarter(o_orderdate) AS q,
       dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(make_date(2024, month(o_orderdate), 1) AS TIMESTAMP) AS anchor
FROM orders
ORDER BY o_orderkey
""",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity: Spark dayofweek is 1=Sunday, DuckDB 0=Sunday (oracle +1);
    datediff(end, start) ≡ date_diff('day', start, end)."""
    o = table(spark, sf_dir, "orders")
    ts = "timestamp_ntz"  # DATE outputs rendered as midnight timestamps
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast(ts).alias("d"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast(ts).alias("plus30"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).cast(ts).alias("month_end"),
        F.make_date(F.lit(2024), F.month("o_orderdate"), F.lit(1)).cast(ts).alias("anchor"),
    ).orderBy("o_orderkey")


# --- H3: math -------------------------------------------------------------

@register(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_r1,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       abs(l_discount - 0.05) AS disc_dev,
       ROUND(power(l_quantity, 2), 4) AS qty_sq,
       ROUND(sqrt(l_quantity), 4) AS qty_sqrt,
       ROUND(exp(l_discount), 4) AS disc_exp,
       ROUND(ln(l_quantity + 1), 4) AS qty_ln,
       ROUND(log10(l_extendedprice), 4) AS price_log10,
       CAST(sign(l_discount - 0.05) AS INT) AS disc_sign,
       greatest(l_quantity, 25.0) AS qty_hi,
       least(l_quantity, 25.0) AS qty_lo,
       l_linenumber % 3 AS ln_mod3
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendentals (exp/ln/log10) differ across libm implementations
    only in the last ulp at these magnitudes — far inside ROUND(,4).
    abs/greatest/least/% are exact.

    Round-13: sort the NARROW 5-column input first, project the 14
    computed columns above it (order-preserving) — the round-9 SCALE.md
    rule: under the original projection-then-orderBy the range
    partitioner's sample job re-executed the math chain and the shuffle
    carried 14 computed doubles instead of 5 inputs. 4.0 s → 1.5 s at
    sf0.1 (noop sink)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
        "l_quantity",
    ).orderBy("l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 4).alias("disc_exp"),
        F.round(F.log(F.col("l_quantity") + 1), 4).alias("qty_ln"),
        F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
        (F.col("l_linenumber") % 3).alias("ln_mod3"),
    )


@register(
    "fn_bitwise",
    oracle="""
SELECT event_type,
       bit_and(user_id) AS k_and,
       bit_or(user_id) AS k_or,
       bit_xor(user_id) AS k_xor,
       bit_or(event_id << 2) AS shifted_or,
       bit_and(event_id & user_id) AS masked_and,
       CAST(SUM(CAST(bit_count(event_id) AS BIGINT)) AS BIGINT) AS total_bits
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 extension: bitwise scalars (&, |, ^, shifts, popcount) and the
    bit_and/or/xor aggregates — flag-word and bitmap manipulation. All
    exact integers; aggregates are associative+commutative, so they
    partial-aggregate map-side like any sum."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and("user_id").alias("k_and"),
            F.bit_or("user_id").alias("k_or"),
            F.bit_xor("user_id").alias("k_xor"),
            F.bit_or(F.shiftleft("event_id", 2)).alias("shifted_or"),
            F.bit_and(F.expr("event_id & user_id")).alias("masked_and"),
            F.sum(F.bit_count("event_id").cast("long")).alias("total_bits"),
        )
        .orderBy("event_type")
    )


# --- H4: conditional / null handling -------------------------------------

@register(
    "fn_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       (c_acctbal IS NULL) AS bal_is_null,
       CASE WHEN c_nationkey IS NOT NULL THEN 'known' ELSE 'unknown' END AS nation_known,
       coalesce(NULLIF(c_nationkey % 5, 0), -1) AS mod_or_neg
FROM customer
ORDER BY c_custkey
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.when(F.col("c_nationkey").isNotNull(), "known")
        .otherwise("unknown")
        .alias("nation_known"),
        F.coalesce(
            F.nullif(F.col("c_nationkey") % 5, F.lit(0)), F.lit(-1)
        ).alias("mod_or_neg"),
    ).orderBy("c_custkey")


# --- H5: arrays (incl. higher-order functions) ---------------------------

@register(
    "fn_array",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       len(v) AS dim,
       ROUND(v[1], 6) AS first_elem,
       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v), (s, x) -> s + x), 6) AS elem_sum,
       ROUND(list_aggregate(v, 'max'), 6) AS elem_max,
       ROUND(list_aggregate(v, 'min'), 6) AS elem_min,
       len(list_filter(v, x -> x > 0.1)) AS n_big,
       (len(list_filter(v, x -> x > 0.5)) > 0) AS has_huge,
       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (s, x) -> s + x), 6) AS norm_sq
FROM e
ORDER BY vec_id
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embedding vectors. Parity: both
    sides fold left-to-right over the same element order, so double sums
    are bit-identical (ROUND(,6) is belt-and-braces)."""
    em = table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    return em.select(
        "vec_id",
        F.size("v").alias("dim"),
        F.round(F.element_at("v", 1), 6).alias("first_elem"),
        F.round(
            F.aggregate("v", F.lit(0.0), lambda s, x: s + x), 6
        ).alias("elem_sum"),
        F.round(F.array_max("v"), 6).alias("elem_max"),
        F.round(F.array_min("v"), 6).alias("elem_min"),
        F.size(F.filter("v", lambda x: x > 0.1)).alias("n_big"),
        F.exists("v", lambda x: x > 0.5).alias("has_huge"),
        F.round(
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x
            ),
            6,
        ).alias("norm_sq"),
    ).orderBy("vec_id")


# --- H6: maps -------------------------------------------------------------

@register(
    "fn_map",
    oracle="""
SELECT event_id,
       event_type AS mtype,
       CAST(user_id AS VARCHAR) AS muid,
       CAST(2 AS INT) AS msize,
       'type,uid' AS mkeys
FROM events
ORDER BY event_id
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map, then read everything back out via map functions —
    the oracle states the expected scalars directly (maps are engine-
    internal; DuckDB's MAP accessors return lists, so scalar extraction
    is the portable contract)."""
    ev = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("mtype"),
        F.element_at(m, "uid").alias("muid"),
        F.size(m).alias("msize"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("mkeys"),
    ).orderBy("event_id")


# --- H7: JSON -------------------------------------------------------------

@register(
    "fn_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       (json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
       json_extract_string(props, '$.missing') AS missing_val
FROM events
ORDER BY event_id
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props ('{"k": 87}'): path extraction,
    typed parse via from_json, null on missing path.

    Round-13: sort the narrow (event_id, props) input first and extract
    above it (round-9 SCALE.md rule — the sample job of the original
    top-level orderBy re-ran all four JSON parses; order-preserving
    projection, identical rows). 1.5 s → 0.9 s at sf0.1 (noop sink)."""
    ev = table(spark, sf_dir, "events").select("event_id", "props") \
        .orderBy("event_id")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


# --- H9: hashing / encoding ----------------------------------------------

@register(
    "fn_hash",
    oracle="""
SELECT n_nationkey,
       md5(n_name) AS h_md5,
       sha256(n_name) AS h_sha256,
       base64(n_name::BLOB) AS b64,
       length(md5(n_name)) AS md5_len
FROM nation
ORDER BY n_nationkey
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing (also the B7 hash-mask primitive). xxhash64/crc32
    exist only Spark-side (no DuckDB twin) — exercised in the MinHash
    operators instead."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5("n_name").alias("h_md5"),
        F.sha2("n_name", 256).alias("h_sha256"),
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.length(F.md5("n_name")).alias("md5_len"),
    ).orderBy("n_nationkey")


# --- H7+: Spark 4 VariantType (ahead-of-schema payloads) ------------------

@register(
    "fn_variant",
    oracle="""
SELECT event_id,
       json_extract(props, '$.k')::INT AS k_int,
       REPLACE(CAST(props::JSON AS VARCHAR), ' ', '') AS canon,
       CAST(json_extract_string(props, '$.missing') AS INT) AS missing_val
FROM events
ORDER BY event_id
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType over events.props (SURVEY.md §1.2: the
    ahead-of-schema payload path — parse once into the binary variant
    encoding, extract typed fields without a declared schema). The
    oracle normalizes DuckDB's whitespace-preserving JSON canon to
    Spark's minified to_json(variant) (fixture payloads carry no string
    values, so the space-strip is exact)."""
    ev = table(spark, sf_dir, "events")
    v = F.expr("parse_json(props)")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
        F.to_json(v).alias("canon"),
        F.expr("variant_get(parse_json(props), '$.missing', 'int')").alias(
            "missing_val"
        ),
    ).orderBy("event_id")


# --- H11: XML (io.debezium.data.Xml semantic type, SURVEY.md §1.2) -------

@register(
    "fn_xml",
    oracle="""
WITH x AS (
  SELECT event_id, '<e><t>' || event_type || '</t><k>' ||
         json_extract_string(props, '$.k') || '</k></e>' AS xml
  FROM events)
SELECT event_id,
       regexp_extract(xml, '<t>(.*)</t>', 1) AS t,
       CAST(regexp_extract(xml, '<k>([0-9]+)</k>', 1) AS INT) AS k,
       CAST(regexp_extract(xml, '<k>([0-9]+)</k>', 1) AS INT) AS k2
FROM x
ORDER BY event_id
""",
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML payload columns (Debezium ships XML as strings): xpath_*
    scalar extraction and Spark 4 native from_xml schema parse, round-
    tripped from a synthesized wire payload. The oracle re-extracts with
    regexp (DuckDB has no XML) — values must agree exactly. XML parse is
    JVM-side; at scale prefer from_xml once into a struct over repeated
    xpath calls (one parse vs N) — measured HERE: each xpath_* call DOM-
    parses the document per row, and as originally spelled (2 xpath + 1
    from_xml UNDER a global orderBy) this ran ~30 s at sf0.1 to the noop
    sink. Round-13: (1) ``k`` now comes from the same from_xml struct as
    ``k2`` (identical value — the schema parse of <k> is the int cast
    xpath_int did); (2) the sort moved BELOW the extraction onto
    the narrow (event_id, xml) input — the round-9 SCALE.md rule: a
    global orderBy above a shuffle-free expensive projection makes the
    range-partitioner's sample job re-execute the whole chain, and the
    shuffle then carries the computed columns instead of the narrow
    input. Measured 30.4 s → 5.3 s (plans/r13/fn_xml_{before,after}).
    Round-13 second pass: the remaining xpath_string call — kept as
    the xpath-family demonstration — was isolated at 5.3 s of the
    6.9 s query (xpath_* DOM-parses the document PER CALL PER ROW;
    from_xml's one StAX schema parse measured 1.3 s for all three
    fields). ``t`` now comes from the same from_xml struct —
    byte-identical for these payloads (oracle re-extracts with regexp
    and stays green) — and xpath_* is retired from the hot path as
    exactly the per-row-DOM anti-pattern the docstring warns about.
    6.9 s → 1.3 s warm."""
    ev = table(spark, sf_dir, "events")
    x = ev.select(
        "event_id",
        F.concat(
            F.lit("<e><t>"), "event_type", F.lit("</t><k>"),
            F.get_json_object("props", "$.k"), F.lit("</k></e>"),
        ).alias("xml"),
    ).orderBy("event_id")
    parsed = F.from_xml("xml", "t STRING, k INT")
    return x.select(
        "event_id",
        parsed.getField("t").alias("t"),
        parsed.getField("k").alias("k"),
        parsed.getField("k").alias("k2"),
    )


# --- H12: URL parsing ------------------------------------------------------

@register(
    "fn_url",
    oracle="""
WITH u AS (
  SELECT event_id,
         'https://app.example.com/t/' || event_type || '?k=' ||
         json_extract_string(props, '$.k') || '&u=' ||
         CAST(user_id AS VARCHAR) AS url
  FROM events)
SELECT event_id,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '://([^/]+)/', 1) AS host,
       regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]k=([^&]*)', 1) AS k_param
FROM u
ORDER BY event_id
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL deconstruction (clickstream/referrer analytics): parse_url
    extracts protocol/host/path/query and a single query parameter —
    JVM-side java.net.URI, no regex authored per field. The oracle
    re-derives each part with regexp (DuckDB has no URL functions) over
    the same synthesized URLs.

    Round-13: sort-narrow-first (the round-9 SCALE.md rule, items 3-4
    of OPTIMIZATION_r13.md) — the global sort now runs on the RAW
    input columns and the JSON extraction + URL synthesis + five
    parse_url calls project ABOVE it (projects preserve order), so the
    range sampler no longer re-executes the parse chain and the
    exchange carries narrow input instead of six computed strings."""
    ev = table(spark, sf_dir, "events")
    src = ev.select("event_id", "event_type", "props", "user_id").orderBy(
        "event_id"
    )
    u = src.select(
        "event_id",
        F.concat(
            F.lit("https://app.example.com/t/"), "event_type",
            F.lit("?k="), F.get_json_object("props", "$.k"),
            F.lit("&u="), F.col("user_id").cast("string"),
        ).alias("url"),
    )
    return u.select(
        "event_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k")).alias("k_param"),
    )


@register(
    "fn_try_safe",
    oracle="""
WITH t AS (
  SELECT event_type, event_id, user_id, value,
    TRY_CAST(CAST(event_id AS VARCHAR)
             || CASE WHEN value < 50 THEN 'x' ELSE '' END AS BIGINT) AS c,
    value / nullif(event_id % 3, 0) AS d,
    string_split(event_type, '')[(1 + event_id % 7)] AS e,
    CASE WHEN user_id % 2 = 0 THEN NULL
         ELSE 9223372036854775807 END AS o
  FROM events
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(c) AS BIGINT) AS n_cast_ok,
  CAST(SUM(c) AS BIGINT) AS sum_cast,
  CAST(SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
  SUM(CAST(floor(d * 10000000000 + 0.5) AS BIGINT)) / CAST(10000000000 AS DOUBLE) AS sum_div,
  CAST(SUM(CASE WHEN e IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_elem_null,
  CAST(SUM(CASE WHEN o IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow
FROM t GROUP BY event_type ORDER BY event_type
""",
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe expression family (`try_cast` / `try_divide` /
    `try_element_at` / `try_add`): malformed input, division by zero,
    out-of-bounds access, and integer overflow become NULLs instead of
    job-killing exceptions — the B10 coercion-mode story extended to
    runtime errors (Debezium's `errors.tolerance=all` analog at the
    expression level: one poison row must not fail a 100 TB batch).

    Oracle mapping: DuckDB TRY_CAST is a direct twin; try_divide ↦
    x / nullif(y, 0); try_element_at ↦ 1-based list index (OOB → NULL
    natively); try_add's overflow leg is encoded as its expected
    result (DuckDB raises on real overflow — the CASE states the
    semantics being pinned). Every probe discriminates per row (mixed
    success/failure), so the aggregate sums pin the element-level
    behavior, not just counts."""
    ev = table(spark, sf_dir, "events")
    probes = ev.select(
        "event_type",
        F.expr(
            "try_cast(concat(CAST(event_id AS STRING),"
            " CASE WHEN value < 50 THEN 'x' ELSE '' END) AS BIGINT)"
        ).alias("c"),
        F.expr("try_divide(value, event_id % 3)").alias("d"),
        F.expr(
            "try_element_at(split(event_type, ''), CAST(1 + event_id % 7 AS INT))"
        ).alias("e"),
        F.expr(
            "try_add(9223372036854775807,"
            " CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)"
        ).alias("o"),
    )
    return (
        probes.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("c").alias("n_cast_ok"),
            F.sum("c").cast("bigint").alias("sum_cast"),
            F.sum(F.when(F.col("d").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_div_null"),
            # Fixed-point (10 dp) sum: floor(d*1e10+0.5) is pure IEEE
            # double math spelled identically on both engines — no
            # reliance on double->DECIMAL conversion rounding modes.
            F.expr(
                "SUM(CAST(floor(d * 10000000000 + 0.5) AS BIGINT))"
                " / CAST(10000000000 AS DOUBLE)"
            ).alias("sum_div"),
            F.sum(F.when(F.col("e").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_elem_null"),
            F.sum(F.when(F.col("o").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_overflow"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_sql_udf",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 10000 + 0.5)
                AS BIGINT)) / CAST(10000 AS DOUBLE) AS disc_revenue,
       SUM(CAST(floor((l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))
                      * 10000 + 0.5) AS BIGINT))
         / CAST(10000 AS DOUBLE) AS charged
FROM lineitem
WHERE l_quantity < 10
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 ``CREATE FUNCTION … RETURN
    expr``): business logic named once in the catalog and reused across
    queries — unlike Python UDFs these are INLINED into the plan at
    analysis time, so whole-stage codegen, pushdown, and partial
    aggregation are identical to writing the expression by hand (the
    oracle is exactly that hand-inlined form). The zero-cost way to
    share expression logic at 100 TB; K1's row-at-a-time Python UDF is
    the priced alternative."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION fx_money(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(x * 10000 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d) * (1.0 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(fx_money(disc_price(l_extendedprice, l_discount)))
                 / CAST(10000 AS DOUBLE) AS disc_revenue,
               SUM(fx_money(charge(l_extendedprice, l_discount, l_tax)))
                 / CAST(10000 AS DOUBLE) AS charged
        FROM lineitem
        WHERE l_quantity < 10
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@register(
    "fn_collation",
    oracle="""
WITH m AS (
  SELECT event_type,
         CASE WHEN event_id % 2 = 0
              THEN upper(substring(event_type, 1, 1)) || substring(event_type, 2)
              ELSE event_type END AS mixed
  FROM events
)
SELECT event_type,
       CAST(COUNT(DISTINCT mixed) AS BIGINT) AS n_variants_binary,
       CAST(COUNT(DISTINCT lower(mixed)) AS BIGINT) AS n_variants_ci,
       CAST(SUM(CASE WHEN mixed = event_type THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_eq,
       CAST(COUNT(*) AS BIGINT) AS n_ci_eq
FROM m GROUP BY event_type ORDER BY event_type
""",
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 ``COLLATE UTF8_LCASE``):
    case-insensitivity expressed as a COLUMN PROPERTY instead of
    lower()-wrapping every predicate — distinct counts, equality, and
    grouping all follow the collation. The oracle spells the same
    semantics with explicit lower() (equivalent for this data; the
    collation form additionally survives into sort orders and join keys
    without rewriting expressions)."""
    ev = table(spark, sf_dir, "events")
    mixed = F.expr(
        "CASE WHEN event_id % 2 = 0"
        " THEN concat(upper(substring(event_type, 1, 1)),"
        "             substring(event_type, 2))"
        " ELSE event_type END"
    )
    m = ev.select("event_type", mixed.alias("mixed"))
    return (
        m.groupBy("event_type")
        .agg(
            F.countDistinct("mixed").alias("n_variants_binary"),
            F.expr("COUNT(DISTINCT mixed COLLATE UTF8_LCASE)")
            .alias("n_variants_ci"),
            F.sum(F.when(F.col("mixed") == F.col("event_type"), 1).otherwise(0))
            .cast("bigint").alias("n_exact_eq"),
            F.sum(
                F.when(
                    F.expr("mixed COLLATE UTF8_LCASE = event_type"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_ci_eq"),
        )
        .orderBy("event_type")
    )
