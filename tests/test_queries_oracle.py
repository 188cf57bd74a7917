"""Replicates the driver's correctness gate locally: run every queries() entry
at sf0.001 and compare row count + order-insensitive values against its
oracle_sql() DuckDB result."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.usefixtures("ray_session")
def test_all_sql_checked_queries_match_oracle():
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        got = _canon(_to_pandas(qs[name](SF_DIR)))
        want = _canon(_duck(sql))
        try:
            assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
            assert list(got.columns) == list(want.columns), (
                f"{name}: cols {list(got.columns)} vs {list(want.columns)}"
            )
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=0, atol=0
            )
        except AssertionError as ex:
            failures.append(f"{name}: {str(ex)[:300]}")
    assert not failures, "\n".join(failures)


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run():
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    for name in set(qs) - set(oracles):
        df = _to_pandas(qs[name](SF_DIR))
        assert df is not None and len(df.columns) > 0, name


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) >= 0
    assert "r_text" in df.columns
