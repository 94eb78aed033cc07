"""Doc-sync guard: SURVEY.md §2L and COVERAGE.md are hand-maintained
maps from capability rows to registry keys / pytest references / package
files. They drifted mid-round-3 before commits caught them by eye; this
test makes the drift a CI failure instead.

Checks, per doc row:
- every backtick token that looks like a registry key (matches an entry
  in ``registry.QUERIES``' naming families) actually exists in the
  registry, and rows claiming "(oracle...)" have oracle SQL registered;
- every ``tests/test_*.py::test_fn`` reference points at a real file and
  a real test function in that file;
- every package file cited in the last column exists on disk.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from debezium_incubator_spark import registry

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "debezium_incubator_spark"

registry.load_all()

# Known query-key prefixes (one per registry family). A backtick token is
# treated as a claimed registry key iff it starts with one of these and
# is a lowercase identifier — file paths and code identifiers don't match.
_KEY_PREFIXES = (
    "q1_", "q3_", "q5_", "w1_", "w_", "e1_", "e2_", "e3_", "e4_", "e5_",
    "e6_", "e7_", "e8_", "e9_", "e10_", "e11_", "s1_", "t1_", "t2_", "t3_", "t4_",
    "t5_", "t6_", "t7_", "t8_", "t9_", "t10_", "t11_", "t12_", "t13_",
    "t14_", "t15_", "t16_", "t17_", "t18_", "t19_", "t20_", "t21_", "t22_",
    "t23_", "t24_", "t25_", "t26_", "t27_", "t28_", "t29_", "t30_",
    "t31_", "t32_", "t33_", "t34_", "t35_", "t36_", "t37_", "t38_",
    "t39_", "t40_", "t41_", "t42_", "t43_", "t44_", "t45_", "t46_", "t47_",
    "scan_", "connector_", "filter_", "mask_", "truncate_", "cast_",
    "cdc_", "route_", "join_", "agg_", "sort_", "set_", "fn_", "sql_",
    "k1_", "k2_", "k3_", "k4_", "k5_", "dedup_", "sim_", "mm_", "iter_",
)

_TEST_REF = re.compile(r"tests/(test_\w+\.py)(?:::(\w+))?")
_BACKTICK = re.compile(r"`([^`]+)`")


def _looks_like_key(tok: str) -> bool:
    return bool(re.fullmatch(r"[a-z][a-z0-9_]+", tok)) and tok.startswith(
        _KEY_PREFIXES
    )


def _survey_2l_rows() -> list[str]:
    text = (REPO / "SURVEY.md").read_text()
    start = text.index("### 2L.")
    end = text.index("\n## ", start)
    rows = [
        ln
        for ln in text[start:end].splitlines()
        if re.match(r"\| L\d+ \|", ln)
    ]
    assert len(rows) >= 59, f"§2L table shrank to {len(rows)} rows"
    return rows


def test_survey_2l_keys_and_tests_exist():
    missing: list[str] = []
    for row in _survey_2l_rows():
        rownum = row.split("|")[1].strip()
        cells = row.split("|")
        check_cell, file_cell = cells[3], cells[4]
        for tok in _BACKTICK.findall(check_cell):
            m = _TEST_REF.search(tok)
            if m:
                fpath = REPO / "tests" / m.group(1)
                if not fpath.exists():
                    missing.append(f"{rownum}: test file {tok}")
                elif m.group(2) and f"def {m.group(2)}(" not in fpath.read_text():
                    missing.append(f"{rownum}: test fn {tok}")
                continue
            if tok.startswith("tests/"):
                if not (REPO / tok).exists():
                    missing.append(f"{rownum}: test file {tok}")
                continue
            if _looks_like_key(tok):
                if tok not in registry.QUERIES:
                    missing.append(f"{rownum}: registry key {tok}")
                elif "(oracle" in check_cell and tok not in registry.ORACLE:
                    missing.append(f"{rownum}: {tok} claimed oracled, has none")
        for tok in _BACKTICK.findall(file_cell):
            rel = tok.split(":")[0]
            if rel.endswith(".py") and not (
                (PKG / rel).exists() or (REPO / rel).exists()
            ):
                missing.append(f"{rownum}: file {tok}")
    assert not missing, "SURVEY.md §2L drift:\n" + "\n".join(missing)


def test_coverage_md_keys_and_files_exist():
    text = (REPO / "COVERAGE.md").read_text()
    missing: list[str] = []
    for i, ln in enumerate(text.splitlines(), 1):
        if not ln.startswith("|"):
            continue
        for tok in _BACKTICK.findall(ln):
            m = _TEST_REF.search(tok)
            if m:
                fpath = REPO / "tests" / m.group(1)
                if not fpath.exists():
                    missing.append(f"line {i}: test file {tok}")
                elif m.group(2) and f"def {m.group(2)}(" not in fpath.read_text():
                    missing.append(f"line {i}: test fn {tok}")
                continue
            # dis/<path>.py:symbol citations
            if tok.startswith("dis/"):
                rel = tok[len("dis/"):].split(":")[0]
                if not (PKG / rel).exists():
                    missing.append(f"line {i}: file {tok}")
                continue
            if _looks_like_key(tok) and tok not in registry.QUERIES:
                # COVERAGE prose may name a key with `oracle <key>`
                missing.append(f"line {i}: registry key {tok}")
    assert not missing, "COVERAGE.md drift:\n" + "\n".join(missing)


def test_oracle_claims_in_coverage_are_real():
    """Rows saying 'oracle `key`' must have oracle SQL registered."""
    text = (REPO / "COVERAGE.md").read_text()
    bad = []
    for m in re.finditer(r"oracle `([a-z0-9_]+)`", text):
        key = m.group(1)
        if key not in registry.ORACLE:
            bad.append(key)
    assert not bad, f"COVERAGE.md claims oracles that don't exist: {bad}"


def test_advertised_counts_match_registry():
    """The 'N queries, M oracle-checked' lines in COVERAGE.md and
    README.md must equal the live registry — count drift was hand-fixed
    four times before this guard."""
    n, m = len(registry.QUERIES), len(registry.ORACLE)
    cov = (REPO / "COVERAGE.md").read_text()
    readme = (REPO / "README.md").read_text()
    assert f"Registry: {n} queries, {m} oracle-checked" in cov, (
        f"COVERAGE.md count line != registry ({n}/{m})"
    )
    assert f"{n} registered queries, {m} with exact oracle-SQL twins" in readme, (
        f"README.md count line != registry ({n}/{m})"
    )
