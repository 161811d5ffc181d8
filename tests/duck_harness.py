"""Local replica of the driver's correctness harness: run each
__spark_entry__ query on Spark AND its oracle SQL on DuckDB over the same
parquet tables; compare row count, column names, and order-insensitive
values (columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        else:
            df[c] = s.astype(object).where(pd.notna(s), None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) < 1e-12
    return a == b


def compare(name: str, spark_df, sql: str, con) -> list[str]:
    """Returns list of problems; empty == match."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    if len(sp) != len(du):
        problems.append(f"{name}: row count spark={len(sp)} duckdb={len(du)}")
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"{name}: columns spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
        return problems
    if problems:
        return problems
    a, b = _normalize(sp), _normalize(du)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
        ]
        if bad:
            problems.append(f"{name}: column {c} first mismatches {bad[:3]}")
    return problems
