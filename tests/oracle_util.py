"""Replicates the driver's Spark-vs-DuckDB comparison: register the
testdata parquet as DuckDB views, run the oracle SQL, and compare row
multisets column-name-sorted against the Spark result."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")  # unify ns/us units
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = canon(spark_df.toPandas())
    con = duck_conn(sf_dir)
    try:
        want = canon(con.execute(oracle_sql).df())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (list(got.columns), list(want.columns))
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    # check_dtype=True: DuckDB sum(BIGINT) yields HUGEINT -> pandas float64,
    # which the driver's value hash distinguishes from Spark's int64 even when
    # values are identical — oracles must CAST the outer sum to BIGINT.
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
