"""THE canonical result normalization for oracle comparisons.

One definition shared by ``tests/test_entry.py`` (pytest surface) and
``scripts/driver_sim.py`` (standalone replica of the per-round driver check)
— the two surfaces must grade the identical mismatch surface, so the rules
(column sort, int64 widening, float64 round-9, row sort) live in exactly one
place.
"""

from __future__ import annotations

import pandas as pd


def norm_result(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize dtypes: ints -> int64, floats -> rounded float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)
