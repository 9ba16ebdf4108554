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


_KINDS = {"i": "int", "u": "int", "f": "float", "b": "bool", "O": "object", "M": "datetime"}


def dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the representation class the driver's
    value-hash is sensitive to: int vs float vs bool vs object vs datetime.
    DuckDB HUGEINT (SUM of BIGINT) surfaces in pandas as float64 while
    Spark emits int64 — same values, different hash. This check makes
    that class of drift fail locally (it shipped red twice: r2+r3)."""
    return _KINDS.get(dtype.kind, dtype.kind)


def assert_dtype_kinds_match(spk: pd.DataFrame, ora: pd.DataFrame, name: str = "") -> None:
    for c in sorted(spk.columns):
        sk, ok = dtype_kind(spk[c].dtype), dtype_kind(ora[c].dtype)
        # A column that is entirely NULL is representation-free: pandas
        # gives Spark object/None and DuckDB float64/NaN arbitrarily.
        if spk[c].isna().all() and ora[c].isna().all():
            continue
        assert sk == ok, (
            f"{name}: dtype-kind mismatch col={c}: spark={spk[c].dtype} ({sk}) "
            f"oracle={ora[c].dtype} ({ok}) — the driver's value-hash is "
            f"type-sensitive; cast the oracle output column (e.g. HUGEINT "
            f"SUM -> CAST(... AS BIGINT))"
        )


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
    if len(spk):
        assert_dtype_kinds_match(spk, ora[spk.columns], name=name)
    s = _normalize(spk)
    o = _normalize(ora)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            assert _values_equal(x, y), (
                f"{name}: value mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
            )
