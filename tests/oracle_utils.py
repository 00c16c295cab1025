"""Order-insensitive result comparison, mirroring the driver's correctness
gate (row-count + schema-by-name + order-insensitive value hash).

Normalization: columns sorted by name; every value mapped to a hashable
canonical form (floats rounded to 9 significant decimals, timestamps to ISO
strings, arrays to tuples); rows compared as sorted multisets.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm(v.item())
        if isinstance(v, np.ndarray):
            return tuple(_norm(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def spark_result(df):
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def assert_query_matches_oracle(spark_df, duck_con, oracle: str, name: str = "?") -> None:
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(duck_con, oracle)
    assert sorted(s_cols) == sorted(d_cols), (
        f"[{name}] column names differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_canon = canonical_rows(s_cols, s_rows)
    d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
        ][:5]
        raise AssertionError(
            f"[{name}] values differ (first {len(diffs)} rows, cols={sorted(s_cols)}):\n"
            + "\n".join(f"  row {i}:\n    spark={a}\n    duck ={b}" for i, a, b in diffs)
        )
