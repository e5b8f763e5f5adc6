"""Mirror of the driver's correctness gate, run locally at sf0.001.

For every ``queries()`` entry with an ``oracle_sql()`` string, run the Ray
pipeline AND the DuckDB SQL on the same inputs and compare row count,
column names, and order-insensitive values — the same contract the driver
checks at sf0.01.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


GATED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", GATED)
def test_query_matches_oracle(ray_session, sf_small, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    # the driver runs at sf0.01; locally we substitute the sf0.001 fixtures
    sql = sql.replace("/root/repo/fixtures/sf0.01", sf_small)

    got = _canon(_to_df(q(SF_DIR)))
    want = _canon(con.sql(sql).df())

    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    if len(got):
        eq = got.reset_index(drop=True).equals(want.reset_index(drop=True))
        if not eq:
            merged = got.compare(want, result_names=("ray", "duckdb"))
            raise AssertionError(f"{name}: value mismatch\n{merged.head(20)}")
