"""Local twin of the driver's DuckDB-oracle comparison: run a Spark
query and its DuckDB oracle SQL on the same parquet tables, compare
row count, column names, and sorted values exactly."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from pqc.io import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "") -> None:
    spk = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        ora = con.execute(oracle_sql).df()
    finally:
        con.close()

    assert sorted(spk.columns) == sorted(ora.columns), (
        f"{name}: column mismatch spark={sorted(spk.columns)} oracle={sorted(ora.columns)}"
    )
    assert len(spk) == len(ora), f"{name}: row count spark={len(spk)} oracle={len(ora)}"
    s = _normalize(spk)
    o = _normalize(ora)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            assert _values_equal(x, y), (
                f"{name}: value mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
            )
