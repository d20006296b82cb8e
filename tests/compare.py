"""Canonical result comparison mirroring the driver's t2 gate:
row-count + column names + order-insensitive value equality
(FIXTURES.md §A canonicalization: NULL literal, rounded floats,
dates/timestamps reduced before compare)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.4f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (dt.datetime,)):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, np.ndarray):
        # Spark's Arrow path yields ndarrays where DuckDB yields lists (or
        # vice versa across versions) — canonicalize both identically
        return "[" + ",".join(_canon_value(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """(sorted column names, canonical rows sorted as strings)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort()
    return cols, out


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    scols, srows = canon_rows(spark_pdf)
    dcols, drows = canon_rows(duck_pdf)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"{name}: first differing row #{i}:\n  spark={a}\n  duck ={b}"
