"""Shared oracle-comparison helpers (used by tools/selfcheck.py and tests).

Mirrors the driver's correctness gate: sort columns by name, order-insensitive
row comparison, floats rounded to 9 digits before comparing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    """Return 'OK' or a description of the first difference."""
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) != len(b):
        return f"ROWCOUNT {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return f"COLUMNS {list(a.columns)} vs {list(b.columns)}"
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = [c for c in a.columns if neq[c].any()]
        msg = f"VALUES differ in {bad}"
        for c in bad[:2]:
            i = neq[c].idxmax()
            msg += f" e.g. {c}[{i}]: {a[c][i]!r} vs {b[c][i]!r}"
        return msg
    return "OK"
