"""Differential comparison of a Spark result vs the DuckDB oracle,
approximating the driver's check: row count + schema (column names) +
order-insensitive value comparison (sorted columns, sorted rows).

Stricter than a hash where we can be: exact equality for ints/strings/
bools/decimals/timestamps; floats must agree to 1e-9 relative (engine
rounding policy should make them exactly equal — any nonzero float diff
is reported so drift is visible before it becomes a hash miss).
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
        # numeric order).
        return ("n", f"{float(v):+.17e}")
    if isinstance(v, (bytes, bytearray)):
        return ("y", v.hex())
    if isinstance(v, (list, np.ndarray)):
        return ("l", str([_canon_value(x) for x in v]))
    return ("s", str(v))


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
    """Return (equal, float_diff)."""
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    try:
        a_null = a_null or bool(pd.isna(a))
        b_null = b_null or bool(pd.isna(b))
    except (TypeError, ValueError):
        pass
    if a_null or b_null:
        return (a_null == b_null, 0.0)
    if isinstance(
        a, (pd.Timestamp, datetime.datetime, datetime.date, np.datetime64)
    ) or isinstance(b, (pd.Timestamp, datetime.datetime, datetime.date, np.datetime64)):
        return pd.Timestamp(a) == pd.Timestamp(b), 0.0
    if isinstance(a, (float, np.floating)) or isinstance(b, (float, np.floating)):
        fa, fb = float(a), float(b)
        if fa == fb:
            return True, 0.0
        denom = max(abs(fa), abs(fb), 1e-300)
        rel = abs(fa - fb) / denom
        return rel < 1e-9, rel
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        return decimal.Decimal(str(a)) == decimal.Decimal(str(b)), 0.0
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
    max_float_rel = 0.0
    for c in s.columns:
        sv, ov = s[c].values, o[c].values
        for i in range(len(sv)):
            eq, rel = _values_equal(sv[i], ov[i], c)
            max_float_rel = max(max_float_rel, rel)
            assert eq, (
                f"{name}: mismatch col={c} row={i}: spark={sv[i]!r} oracle={ov[i]!r}"
            )
    if max_float_rel > 0:
        print(f"  [{name}] max float rel-diff {max_float_rel:.2e}")
