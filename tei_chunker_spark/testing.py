"""Shared oracle-comparison helpers (used by both the fast pytest gate and
scripts/check_oracles.py so the two gates can never disagree about what
"matches the oracle" means)."""
from __future__ import annotations

import pandas as pd


def normalize_for_compare(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for engine-independent value comparison: columns
    sorted by name, strings/timestamps stringified, floats rounded to 9
    decimals, ints widened to int64, rows sorted by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
