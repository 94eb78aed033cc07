"""PII detection/redaction (t45): pinned semantics on crafted strings
(every family, multiplicity, overlap-order and boundary behavior) plus
the false-positive guard on the digit-free fixture text. The
differential parity of the registered query is covered by the oracle
sweep (tests/test_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.llm.pii import (
    PII_PATTERNS,
    pii_counts,
    pii_redact,
)
from tests.conftest import SF_SMOKE

CRAFTED = [
    # (text, n_email, n_phone, n_ip, n_ssn, redacted)
    ("mail a@b.co and c.d+x@e-f.org now", 2, 0, 0, 0,
     "mail <EMAIL> and <EMAIL> now"),
    ("call (213) 555-0042 twice (213) 555-0042", 0, 2, 0, 0,
     "call <PHONE> twice <PHONE>"),
    ("host 10.0.0.1 peer 192.168.255.254", 0, 0, 2, 0,
     "host <IP> peer <IP>"),
    # naive-regex boundary behavior, pinned: the first four octets of a
    # five-octet dotted string match (the 4th octet ends at a \b)
    ("v 1.2.3.4.5 w", 0, 0, 1, 0, "v <IP>.5 w"),
    ("id 123-45-6789 ok", 0, 0, 0, 1, "id <SSN> ok"),
    # phone tail (3-4) is NOT ssn-shaped (3-2-4); ssn is not phone-shaped
    ("(900) 555-1234 vs 900-55-1234", 0, 1, 0, 1, "<PHONE> vs <SSN>"),
    # all four families in one string, redacted in pass order
    ("u@v.io (111) 222-3333 8.8.8.8 111-22-3333", 1, 1, 1, 1,
     "<EMAIL> <PHONE> <IP> <SSN>"),
    # digit-free text is untouched
    ("the fast key order sort table scan", 0, 0, 0, 0,
     "the fast key order sort table scan"),
]


def test_pii_semantics_pinned(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CRAFTED)], "i LONG, t STRING"
    )
    counts = pii_counts("t")
    rows = (
        df.select(
            "i",
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
            counts["ip"].alias("ip"),
            counts["ssn"].alias("s"),
            pii_redact("t").alias("red"),
        )
        .orderBy("i")
        .collect()
    )
    for r, (t, e, p, ip, s, red) in zip(rows, CRAFTED):
        assert (r["e"], r["p"], r["ip"], r["s"]) == (e, p, ip, s), t
        assert r["red"] == red, t


def test_no_false_positives_on_fixture_text(spark):
    """The synthetic corpus is digit-free word text: every family must
    count 0 and redaction must be the identity on every row."""
    from debezium_incubator_spark.catalog import table

    docs = table(spark, SF_SMOKE, "documents")
    counts = pii_counts("text")
    bad = docs.select(
        (sum(counts.values()) > 0).alias("hit"),
        (pii_redact("text") != F.col("text")).alias("changed"),
    ).where(F.col("hit") | F.col("changed"))
    assert bad.count() == 0


def test_patterns_re2_safe():
    """The patterns are shared verbatim with the DuckDB (RE2) oracle:
    no backreferences or lookarounds (RE2 lacks them), and they must
    compile under Python's re (a superset check on the Java side)."""
    import re

    for name, pat in PII_PATTERNS:
        re.compile(pat)
        assert "\\1" not in pat and "(?=" not in pat and "(?<" not in pat
        assert "(?!" not in pat, name


# --- hypothesis: Spark regex counts == Python re on arbitrary text --------

from hypothesis import given, settings, strategies as st

WORD = st.text(alphabet="abcdefgh ", min_size=0, max_size=30)
PII_BITS = st.lists(
    st.sampled_from([
        "a@b.co", "x.y+z@mail-host.org", "(123) 456-7890",
        "10.0.0.1", "255.255.255.255", "123-45-6789",
        "1.2.3.4.5", "900-55-1234", "no pii here", "1234567",
    ]),
    min_size=0, max_size=4,
)


@settings(max_examples=25, deadline=None)
@given(WORD, PII_BITS, WORD)
def test_counts_match_python_re(spark, pre, bits, post):
    """The four patterns are shared verbatim with Java (Spark) and RE2
    (DuckDB); Python's re is the independent third implementation —
    on the common dialect subset all three must agree on arbitrary
    compositions of PII spans and word text."""
    import re

    text = pre + " " + " ".join(bits) + " " + post
    df = spark.createDataFrame([(text,)], "t STRING")
    counts = pii_counts("t")
    row = df.select(
        *[counts[n].alias(n) for n, _ in PII_PATTERNS]
    ).collect()[0]
    for name, pat in PII_PATTERNS:
        assert row[name] == len(re.findall(pat, text)), (name, text)
