"""PII detection + redaction (t45) — the standard pre-training scrub
stage: C4 drops lines with the word "javascript" and pages with bad
words, but every modern pipeline (Dolma, FineWeb, CCNet derivatives)
additionally detects and REDACTS personally identifiable spans before
anything else ships. Public recipe (Dolma's `pii` tagger, Soldaini et
al. 2024; FineWeb's pii filter): regex families for email addresses,
phone numbers, IP addresses and national-id-shaped numbers, replaced
with typed placeholder tokens so downstream token accounting still
sees a span.

Spark mapping — pure builtin regexp expressions, JVM-side, zero
Python, zero shuffle (per-row map work, the same cost class as every
quality gate in `text.py`):

- detection: ``size(regexp_extract_all(s, pattern))`` per family —
  counts, not booleans, so a doc with two emails differs from one;
- redaction: sequential ``regexp_replace`` passes (email → phone →
  ip → ssn), each replacing ALL occurrences with ``<FAMILY>``;
  placeholders contain no digits, so later passes cannot match inside
  earlier replacements — pass order is therefore load-bearing and
  pinned identically in both engines.

Differential design: the synthetic ``documents`` fixture contains no
digits at all, so a raw-text differential would only prove "no false
positives on word text". The registered query therefore PLANTS
deterministic PII spans inside the query itself — email / phone / IP
built from ``doc_id``/``source`` arithmetic (SSN-shaped only for
``doc_id % 3 = 0`` so counts vary), appended to the real text — and
both engines must then find, count and redact the identical spans.
Integer-only span construction (no floats) keeps the differential
boundary-proof; the surrounding fixture text exercises the
false-positive path on every row.

Regex dialect parity (Java on the Spark side, RE2 in DuckDB): the
patterns below use only character classes, bounded repetition and
``\\b`` ASCII word boundaries — semantics identical in both engines
(no backreferences or lookarounds, which RE2 lacks). DuckDB's
``regexp_replace`` needs the explicit ``'g'`` flag to replace all
occurrences (Spark replaces all by default) — the known gotcha,
applied in the oracle.

100 TB posture: embarrassingly parallel single-pass map work; the
four patterns compile once per task. At scale this runs fused into
the same stage as the other quality gates (one scan, many columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

#: the four public-recipe regex families. Identical strings are used
#: verbatim on both engines (Java + RE2 common subset — see module
#: docstring); order is the redaction pass order.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\([0-9]{3}\) [0-9]{3}-[0-9]{4}"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
]


def pii_counts(col: F.Column | str) -> dict[str, F.Column]:
    """Per-family match counts (cast long — oracle len() is BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for name, pat in PII_PATTERNS
    }


def pii_redact(col: F.Column | str) -> F.Column:
    """Sequential redaction passes in PII_PATTERNS order; each family's
    spans become ``<FAMILY>`` (digit-free, so later passes can't match
    inside earlier placeholders)."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


def _planted(doc_id: F.Column, source: F.Column) -> F.Column:
    """The deterministic PII suffix both engines must agree on (see
    module docstring). Integer-only arithmetic; SSN-shaped span only
    for doc_id % 3 = 0."""
    s = doc_id.cast("string")
    area = (doc_id % 900 + 100).cast("string")          # always 3 digits
    last4 = F.lpad((doc_id % 10000).cast("string"), 4, "0")
    o2 = (doc_id % 256).cast("string")
    o3 = ((doc_id * 7) % 256).cast("string")
    o4 = (doc_id % 100).cast("string")
    ssn = F.when(
        doc_id % 3 == 0,
        F.concat(
            F.lit(" ssn "), area, F.lit("-"),
            (doc_id % 90 + 10).cast("string"), F.lit("-"), last4,
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit(" contact user"), s, F.lit("@"), source,
        F.lit(".example.com or call ("), area, F.lit(") 555-"), last4,
        F.lit(" from 10."), o2, F.lit("."), o3, F.lit("."), o4, ssn,
    )


#: the planted-PII augmentation as a DuckDB expression over `documents`
#: columns — reusable by composed oracles (t49).
ORACLE_PLANT_SQL = """text || ' contact user' || doc_id || '@' || source
         || '.example.com or call (' || (doc_id % 900 + 100)
         || ') 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || ' from 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
         || '.' || (doc_id % 100)
         || CASE WHEN doc_id % 3 = 0
                 THEN ' ssn ' || (doc_id % 900 + 100) || '-'
                      || (doc_id % 90 + 10) || '-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END"""


def oracle_redact_sql(expr: str) -> str:
    """The redaction pass chain as a DuckDB expression over ``expr`` —
    nested in PII_PATTERNS order with the 'g' flag (the replace-all
    gotcha)."""
    out = expr
    for name, pat in PII_PATTERNS:
        out = f"regexp_replace({out},\n    '{pat}', '<{name.upper()}>', 'g')"
    return out


def _oracle_count_sql(expr: str, pat: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT)"
    )


_T45_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, lang, {ORACLE_PLANT_SQL} AS t
  FROM documents
), red AS (
  SELECT doc_id, lang, t,
    {oracle_redact_sql('t')} AS redacted
  FROM aug
)
SELECT doc_id, lang,
  {_oracle_count_sql('t', PII_PATTERNS[0][1])} AS n_email,
  {_oracle_count_sql('t', PII_PATTERNS[1][1])} AS n_phone,
  {_oracle_count_sql('t', PII_PATTERNS[2][1])} AS n_ip,
  {_oracle_count_sql('t', PII_PATTERNS[3][1])} AS n_ssn,
  CAST(length(redacted) AS BIGINT) AS red_len,
  md5(redacted) AS red_md5
FROM red
ORDER BY doc_id
"""


@register("t45_pii_redact", oracle=_T45_ORACLE)
def t45_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect + redact the four PII families over documents with
    planted deterministic spans (module docstring): per-doc counts,
    redacted length, and the md5 of the redacted text — the md5 makes
    every redacted BYTE part of the differential, so a single
    mis-placed placeholder or missed occurrence hash-fails."""
    docs = table(spark, sf_dir, "documents")
    # Sort FIRST, on the narrow input, then project: a global orderBy
    # ABOVE a shuffle-free expensive map chain makes the range
    # partitioner's sample job re-execute the whole chain (shuffle
    # stages are reused across jobs, map-only chains are not) —
    # measured 2-3x the query at g3 before this ordering. Project
    # preserves the sort order.
    aug = docs.orderBy("doc_id").select(
        "doc_id",
        "lang",
        F.concat(F.col("text"), _planted(F.col("doc_id"), F.col("source")))
        .alias("t"),
    )
    counts = pii_counts("t")
    red = pii_redact("t")
    return aug.select(
        "doc_id",
        "lang",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ip"].alias("n_ip"),
        counts["ssn"].alias("n_ssn"),
        F.length(red).cast("long").alias("red_len"),
        F.md5(red).alias("red_md5"),
    )
