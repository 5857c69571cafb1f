"""DuckDB-oracle comparison helper mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison (columns
sorted by name, rows sorted by all values)."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        # timestamps -> ISO strings so tz-naive/aware renderings align
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].map(lambda v: v.isoformat() if v is not None else None)
    df = df.sort_values(list(df.columns), ignore_index=True, na_position="last")
    return df


def assert_same(spark_df, duck_df: pd.DataFrame, float_tol: float = 1e-9):
    a = _normalize(spark_df.toPandas())
    b = _normalize(duck_df)
    assert list(a.columns) == list(b.columns), f"columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                xnan = x is None or (isinstance(x, float) and math.isnan(x))
                ynan = y is None or (isinstance(y, float) and math.isnan(y))
                if xnan and ynan:
                    continue
                assert not (xnan or ynan), f"{c}[{i}]: {x} != {y}"
                assert math.isclose(float(x), float(y), rel_tol=float_tol, abs_tol=float_tol), (
                    f"{c}[{i}]: {x} != {y}"
                )
            else:
                assert x == y, f"{c}[{i}]: {x!r} != {y!r}"
