"""Randomized-corpus sweeps for the round-5b kernels (Q12/Q13/Q21 folds,
moving-sum frames, cube sentinels, full-outer zero-fill): seeded random
tables WITH adversarial structure — dangling foreign keys, duplicate
(order, supplier) lineitems, shipdates straddling the lateness
boundary — compared value-exact against DuckDB."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SEEDS = (0, 1, 2)


def _gen(tmp: str, seed: int):
    rng = np.random.default_rng(seed)
    n_cust, n_ord, n_li, n_ev = 40, 120, 400, 300
    base = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
    day = 86_400_000_000
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
    }), os.path.join(tmp, "customer.parquet"))
    odate = base + rng.integers(0, 700, n_ord) * day
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        # ~10% dangling custkeys (beyond the customer table)
        "o_custkey": pa.array(rng.integers(0, n_cust + 5, n_ord)
                              .astype(np.int64)),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], n_ord)),
        "o_orderdate": pa.array(odate.view("datetime64[us]")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"], n_ord)),
    }), os.path.join(tmp, "orders.parquet"))
    # lineitems: ~5% dangling orderkeys; shipdates clustered around the
    # 60/90-day lateness boundaries; few suppliers so (okey, skey) repeats
    lok = rng.integers(0, n_ord + 6, n_li).astype(np.int64)
    lag_days = rng.choice([58, 59, 60, 61, 62, 89, 90, 91, 120, 5], n_li)
    ship = np.where(lok < n_ord, odate[np.minimum(lok, n_ord - 1)],
                    base) + lag_days * day
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lok),
        "l_suppkey": pa.array(rng.integers(0, 6, n_li).astype(np.int64)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": pa.array(ship.view("datetime64[us]")),
    }), os.path.join(tmp, "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(6, dtype=np.int64)),
        "s_name": pa.array([f"S{i}" for i in range(6)]),
    }), os.path.join(tmp, "supplier.parquet"))
    ets = base + rng.integers(0, 40 * 24, n_ev) * 3_600_000_000 \
        + rng.integers(0, 3_600_000_000, n_ev)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ets.view("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 25, n_ev).astype(np.int64)),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], n_ev)),
        "value": pa.array(np.round(rng.uniform(0, 100, n_ev), 4)),
    }), os.path.join(tmp, "events.parquet"))


def _check(name: str, sf: str):
    import __ray_entry__ as e
    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "events"):
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
def test_random_corpus_round5b_kernels(ray_session, tmp_path, seed):
    tmp = str(tmp_path)
    _gen(tmp, seed)
    for name in ("q12_late_priority", "q13_custdist",
                 "q21_waiting_suppliers", "events_moving_sum",
                 "events_cube", "events_orders_full_outer"):
        _check(name, tmp)
