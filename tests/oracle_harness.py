"""Local mirror of the driver's DuckDB-oracle comparison: run a registry
query and its oracle SQL at a given sf_dir, compare row count + sorted-column
values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from haystack_traces_spark.sources.events import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _assert_dtype_faces(got_raw: pd.DataFrame, want_raw: pd.DataFrame, name: str) -> None:
    """Driver-faithful dtype gate (VERDICT r9 §wrong #2): the driver's
    normalize-then-hash distinguishes int64 `49015` from float64 `49015.0`,
    so an integer-dtyped column on one face against a float-dtyped column
    on the other (the DuckDB HUGEINT→pandas-float64 leak class) must FAIL
    here even though Python `==` would pass it. Skipped for empty frames
    (no values reach the driver hash; pandas dtypes of empty frames are
    engine artifacts)."""
    if not len(got_raw) or not len(want_raw):
        return
    for c in got_raw.columns:
        if c not in want_raw.columns:
            continue  # column-set mismatch reported by compare() itself
        gi = pd.api.types.is_integer_dtype(got_raw[c])
        gf = pd.api.types.is_float_dtype(got_raw[c])
        oi = pd.api.types.is_integer_dtype(want_raw[c])
        of = pd.api.types.is_float_dtype(want_raw[c])
        assert not ((gi and of) or (gf and oi)), (
            f"{name}: col {c} dtype face mismatch: spark={got_raw[c].dtype} "
            f"vs oracle={want_raw[c].dtype} — the driver hash fails this "
            "even when values compare equal (HUGEINT/DECIMAL leak? CAST "
            "the oracle column to BIGINT or the Spark column to double)"
        )


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    got_raw = spark_df.toPandas()
    _assert_dtype_faces(got_raw, oracle_df, name)
    got = _norm(got_raw)
    want = _norm(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) and isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or math.isclose(
                    x, y, rel_tol=1e-9, abs_tol=1e-9
                )
            else:
                ok = x == y
            assert ok, f"{name}: col {c} row {i}: spark={x!r} oracle={y!r}"
