"""Differential comparison of a Spark result vs the DuckDB oracle,
approximating the driver's check: row count + schema (column names) +
order-insensitive value comparison (sorted columns, sorted rows).

DRIVER-STRICT (round-2 hardening): the driver hashes the *surfaced*
values, so representation drift that is numerically equal still fails
there. This comparator therefore treats as mismatches:
- different surfaced dtype classes per column (int64 vs float64,
  Decimal vs float, date vs timestamp) — the exact classes behind all
  four round-1 driver hash failures;
- any nonzero float difference (no 1e-9 tolerance — the parity policy
  is supposed to make both sides bit-identical);
- ``-0.0`` vs ``0.0`` (IEEE signed zero survives ROUND and hashes
  differently).
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd


def _canon_value(v):
    if v is None:
        return ("z", "")  # sort nulls last, stable
    if isinstance(v, float) and math.isnan(v):
        return ("z", "nan")
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date, np.datetime64)):
        return ("t", str(pd.Timestamp(v)))
    if isinstance(v, (bool, np.bool_)):
        return ("b", str(bool(v)))
    if isinstance(v, (int, np.integer, float, np.floating, decimal.Decimal)):
        # One canon for ALL numerics so Decimal vs float columns sort rows
        # identically in both frames (the key only needs consistency, not
        # numeric order). Type-class mismatches are caught separately.
        return ("n", f"{float(v):+.17e}")
    if isinstance(v, (bytes, bytearray)):
        return ("y", v.hex())
    if isinstance(v, (list, np.ndarray)):
        return ("l", str([_canon_value(x) for x in v]))
    return ("s", str(v))


def _is_null(v) -> bool:
    if v is None or v is pd.NaT:
        return True
    if isinstance(v, (float, np.floating)) and math.isnan(float(v)):
        return True
    if isinstance(v, (list, np.ndarray, dict)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _dtype_class(v) -> str:
    """Surfaced-representation class — the granularity the driver's value
    hash distinguishes (bool < int checked first: bool is an int subclass)."""
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (pd.Timestamp, datetime.datetime, np.datetime64)):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, (list, np.ndarray)):
        return "list"
    if isinstance(v, dict):
        return "map"
    return "str"


def _column_classes(values) -> set[str]:
    return {_dtype_class(v) for v in values if not _is_null(v)}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    # Build sort keys column-wise: df.apply(axis=1) would coerce uniformly
    # numeric rows to float64, corrupting int canon forms.
    cols = [[_canon_value(v) for v in df[c]] for c in df.columns]
    keys = list(zip(*cols)) if cols else []
    order = sorted(range(len(df)), key=lambda i: keys[i])
    df = df.iloc[order].reset_index(drop=True)
    return df


def _values_equal(a, b, col: str) -> tuple[bool, float]:
    """Return (equal, float_diff). Driver-strict: exact equality only."""
    a_null, b_null = _is_null(a), _is_null(b)
    if a_null or b_null:
        return (a_null == b_null, 0.0)
    if isinstance(
        a, (pd.Timestamp, datetime.datetime, datetime.date, np.datetime64)
    ) or isinstance(b, (pd.Timestamp, datetime.datetime, datetime.date, np.datetime64)):
        return pd.Timestamp(a) == pd.Timestamp(b), 0.0
    if isinstance(a, (float, np.floating)) or isinstance(b, (float, np.floating)):
        fa, fb = float(a), float(b)
        if fa == fb:
            if fa == 0.0 and math.copysign(1.0, fa) != math.copysign(1.0, fb):
                return False, 0.0  # -0.0 vs 0.0 hashes differently
            return True, 0.0
        denom = max(abs(fa), abs(fb), 1e-300)
        return False, abs(fa - fb) / denom
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        if not (isinstance(a, decimal.Decimal) and isinstance(b, decimal.Decimal)):
            return False, 0.0  # Decimal vs non-Decimal: representation drift
        return a == b and a.as_tuple().exponent == b.as_tuple().exponent, 0.0
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        la, lb = list(a), list(b)
        if len(la) != len(lb):
            return False, 0.0
        return all(_values_equal(x, y, col)[0] for x, y in zip(la, lb)), 0.0
    return a == b, 0.0


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                        name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for c in s.columns:
        sc, oc = _column_classes(s[c].values), _column_classes(o[c].values)
        assert sc == oc, (
            f"{name}: col={c} surfaced dtype class {sorted(sc)} (spark) != "
            f"{sorted(oc)} (oracle) — the driver's value hash distinguishes "
            f"these even when values are numerically equal"
        )
    for c in s.columns:
        sv, ov = s[c].values, o[c].values
        for i in range(len(sv)):
            eq, rel = _values_equal(sv[i], ov[i], c)
            assert eq, (
                f"{name}: mismatch col={c} row={i}: spark={sv[i]!r} "
                f"oracle={ov[i]!r}" + (f" (rel={rel:.2e})" if rel else "")
            )
