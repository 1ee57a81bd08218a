"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's check: row count, column names, and a value hash
computed on rows sorted by all columns, with floats reduced to fixed
precision and timestamps normalized. Used by test_oracle.py for every
registered (query, oracle) pair.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

FLOAT_DECIMALS = 6


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, FLOAT_DECIMALS)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dt.timedelta):
        return v.total_seconds()
    return v


def normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, then rows by value — order-insensitive form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, out


def compare(
    spark_cols: list[str],
    spark_rows: list[tuple],
    duck_cols: list[str],
    duck_rows: list[tuple],
) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    sc, sr = normalize(spark_cols, spark_rows)
    dc, dr = normalize(duck_cols, duck_rows)
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duck={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"row count differs: spark={len(sr)} duck={len(dr)}")
        return problems
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            problems.append(f"row {i} differs:\n  spark={a}\n  duck ={b}")
            if len(problems) >= 5:
                problems.append("... (truncated)")
                break
    return problems
