"""Randomized-corpus sweeps for the round-5c aggregate kernels (moments
limbs, interpolated percentile ranks, mode tie-breaks, first/last
argmin folds, path truncation, checksum canon, unpivot): seeded random
tables WITH adversarial structure — negative balances, a discrete value
grid forcing mode ties, coarse timestamps forcing (ts, event_id)
tie-breaks — compared value-exact against DuckDB."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SEEDS = (0, 1, 2)

R5C_QUERIES = ("value_moments_by_type", "percentile_cont_by_type",
               "mode_value_by_type", "user_event_paths",
               "user_first_last_event", "corr_price_discount",
               "acctbal_moments_by_nation", "table_checksum",
               "lineitem_unpivot")


def _gen(tmp: str, seed: int):
    rng = np.random.default_rng(seed)
    n_ev, n_li, n_cust, n_ord = 400, 300, 60, 100
    base = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)

    # events: discrete value grid (mode ties guaranteed, negatives
    # included) + coarse second-granularity ts (ordering tie-breaks)
    grid = np.array([-7.13, -0.5, 0.0, 0.25, 3.999, 3.999, 42.0, 99.99])
    ets = base + rng.integers(0, 30, n_ev) * 1_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ets.view("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 12, n_ev).astype(np.int64)),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase"], n_ev)),
        "value": pa.array(rng.choice(grid, n_ev)),
    }), os.path.join(tmp, "events.parquet"))

    # lineitem: prices hugging the cents boundary, tiny discount domain
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li)
                               .astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li)
                                 .astype(np.int32)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_quantity": pa.array(rng.integers(1, 50, n_li)
                               .astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(rng.choice(
            [0.0, 0.01, 0.05, 0.1], n_li)),
        "l_tax": pa.array(rng.choice([0.0, 0.04, 0.08], n_li)),
    }), os.path.join(tmp, "lineitem.parquet"))

    # customers with NEGATIVE balances (the signed first-moment path)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_nationkey": pa.array(rng.integers(0, 5, n_cust)
                                .astype(np.int32)),
        "c_acctbal": pa.array(np.round(
            rng.uniform(-999.99, 9999.99, n_cust), 2)),
    }), os.path.join(tmp, "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(5, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(5)]),
    }), os.path.join(tmp, "nation.parquet"))

    odate = base + rng.integers(0, 700, n_ord) * 86_400_000_000
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)
                              .astype(np.int64)),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], n_ord)),
        "o_orderdate": pa.array(odate.view("datetime64[us]")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord)),
    }), os.path.join(tmp, "orders.parquet"))


def _check(name: str, sf: str):
    import __ray_entry__ as e
    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("events", "lineitem", "customer", "nation", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    got = qs[name](sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(sqls[name]).df()
    assert len(got) == len(want), (name, len(got), len(want))
    cols = sorted(got.columns)
    assert cols == sorted(want.columns), name
    if len(want):
        g = got[cols].sort_values(cols, ignore_index=True).astype(object)
        w = want[cols].sort_values(cols, ignore_index=True).astype(object)
        assert g.equals(w), name


@pytest.mark.parametrize("seed", SEEDS)
def test_random_corpus_round5c_kernels(ray_session, tmp_path, seed):
    tmp = str(tmp_path)
    _gen(tmp, seed)
    for name in R5C_QUERIES:
        _check(name, tmp)


def test_round5c_kernels_on_empty_tables(ray_session, tmp_path):
    """Zero-row inputs (correct schemas) must yield zero-row, correctly
    shaped results — no exchange/fold edge may throw."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    tmp = str(tmp_path)
    schemas = {
        "events": pa.schema([("event_id", pa.int64()),
                             ("ts", pa.timestamp("us")),
                             ("user_id", pa.int64()),
                             ("event_type", pa.string()),
                             ("value", pa.float64())]),
        "lineitem": pa.schema([("l_orderkey", pa.int64()),
                               ("l_linenumber", pa.int32()),
                               ("l_returnflag", pa.string()),
                               ("l_quantity", pa.float64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64()),
                               ("l_tax", pa.float64())]),
        "customer": pa.schema([("c_custkey", pa.int64()),
                               ("c_nationkey", pa.int32()),
                               ("c_acctbal", pa.float64())]),
        "nation": pa.schema([("n_nationkey", pa.int32()),
                             ("n_name", pa.string())]),
        "orders": pa.schema([("o_orderkey", pa.int64()),
                             ("o_custkey", pa.int64()),
                             ("o_orderstatus", pa.string()),
                             ("o_orderdate", pa.timestamp("us")),
                             ("o_orderpriority", pa.string())]),
    }
    for name, sch in schemas.items():
        pq.write_table(sch.empty_table(), os.path.join(
            tmp, f"{name}.parquet"))
    import __ray_entry__ as e
    qs = e.queries()
    for name in R5C_QUERIES + ("quartiles_cont_by_type",
                               "table_checksum_fast"):
        got = qs[name](tmp)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        assert len(got) == 0, name
