"""Micro-corpus edge cases for the relational2 TPC-H shapes — the
semantics the sf-corpus gate mirror cannot isolate: Q21's sole-late
exists/not-exists logic, Q13's left-join zeros, Q22's strict
above-average inequality and recent-order anti-join, Q12's exact
60-day lateness boundary, Q16's cross-batch distinct, and the Q2/Q15
minimum/maximum tie contracts."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp, name, table):
    pq.write_table(table, os.path.join(tmp, f"{name}.parquet"))


def _ts(s):
    return np.datetime64(s, "us")


@pytest.fixture()
def q21_dir(tmp_path):
    """Four 'F' orders, one 'O' order, all dated 2000-01-01:
    o1: suppliers 1,2 — only 1 late        -> supplier 1 waits
    o2: suppliers 1,2 — both late          -> nobody (not sole)
    o3: supplier 1 only, late              -> nobody (no other supplier)
    o4: suppliers 2,3 — only 3 late, and 3's lateness comes from the
        MAX of two shipments (early + late)  -> supplier 3 waits
    o5: status 'O', suppliers 1,2, 1 late  -> nobody (status filter)
    """
    tmp = str(tmp_path)
    d0 = _ts("2000-01-01T00:00:00")
    ok = d0 + np.timedelta64(10, "D")         # well inside 90d
    late = d0 + np.timedelta64(120, "D")
    _write(tmp, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_orderstatus": ["F", "F", "F", "F", "O"],
        "o_orderdate": pa.array([d0] * 5),
    }))
    _write(tmp, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 4, 4, 5, 5], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 1, 2, 3, 3, 1, 2], pa.int64()),
        "l_shipdate": pa.array([late, ok, late, late, late,
                                ok, ok, late, late, ok]),
    }))
    _write(tmp, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": ["S1", "S2", "S3"],
    }))
    return tmp


def test_q21_sole_late_logic(ray_session, q21_dir):
    from engine.relational2 import q_q21_waiting_suppliers
    out = q_q21_waiting_suppliers(q21_dir)
    assert out["s_name"].to_pylist() == ["S1", "S3"]
    assert out["numwait"].to_pylist() == [1, 1]


def test_q13_left_join_zero_counts(ray_session, tmp_path):
    """Customers with no orders land in the c_count=0 bucket; orders
    referencing unknown customers drop."""
    tmp = str(tmp_path)
    _write(tmp, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64())}))
    _write(tmp, "orders", pa.table({
        "o_custkey": pa.array([1, 1, 2, 99], pa.int64())}))
    from engine.relational2 import q_q13_custdist
    out = q_q13_custdist(tmp)
    got = dict(zip(out["c_count"].to_pylist(), out["custdist"].to_pylist()))
    assert got == {0: 2, 1: 1, 2: 1}


def test_q12_late_boundary(ray_session, tmp_path):
    """Shipped exactly 60 days after the order date is NOT late; one
    microsecond past is."""
    tmp = str(tmp_path)
    d0 = _ts("1996-03-01T00:00:00")
    exact = d0 + np.timedelta64(60, "D")
    past = exact + np.timedelta64(1, "us")
    _write(tmp, "orders", pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([d0]),
        "o_orderpriority": ["1-URGENT"],
    }))
    _write(tmp, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1], pa.int64()),
        "l_linestatus": ["F", "F"],
        "l_shipdate": pa.array([exact, past]),
    }))
    from engine.relational2 import q_q12_late_priority
    out = q_q12_late_priority(tmp)
    assert out["l_linestatus"].to_pylist() == ["F"]
    assert out["high_line_count"].to_pylist() == [1]
    assert out["low_line_count"].to_pylist() == [0]


def test_q22_strict_avg_and_recent_anti_join(ray_session, tmp_path):
    """cents x N > S is strict (a customer exactly AT the average is
    excluded); only orders at/after the cutoff disqualify."""
    tmp = str(tmp_path)
    # nation 1 customers: balances 10.00, 20.00, 30.00 -> avg 20.00
    _write(tmp, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([1, 1, 1], pa.int32()),
        "c_acctbal": pa.array([10.0, 20.0, 30.0]),
    }))
    # customer 3 has only a PRE-cutoff order -> still dormant
    _write(tmp, "orders", pa.table({
        "o_custkey": pa.array([3], pa.int64()),
        "o_orderdate": pa.array([_ts("1997-06-01T00:00:00")]),
    }))
    from engine.relational2 import q_q22_global_sales
    out = q_q22_global_sales(tmp)
    assert out["cntrycode"].to_pylist() == [1]
    assert out["numcust"].to_pylist() == [1]          # only cust 3 (> avg)
    assert out["totacctbal_cents"].to_pylist() == [3000]
    # a recent order disqualifies customer 3 entirely
    _write(tmp, "orders", pa.table({
        "o_custkey": pa.array([3], pa.int64()),
        "o_orderdate": pa.array([_ts("1999-06-01T00:00:00")]),
    }))
    out2 = q_q22_global_sales(tmp)
    assert out2.num_rows == 0


def test_q16_distinct_across_batches(ray_session, tmp_path):
    """The same (part, supplier) pair repeated — including across
    row-group boundaries — counts once per attr triple."""
    tmp = str(tmp_path)
    _write(tmp, "part", pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": ["Brand#1", "Brand#1"],
        "p_type": ["LARGE", "LARGE"],
        "p_size": pa.array([1, 1], pa.int32()),
    }))
    li = pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 7, 7], pa.int64()),
    })
    pq.write_table(li, os.path.join(tmp, "lineitem.parquet"),
                   row_group_size=2)
    from engine.relational2 import q_q16_supplier_cnt
    out = q_q16_supplier_cnt(tmp)
    # both parts share one attr triple; suppliers {7, 8}
    assert out["supplier_cnt"].to_pylist() == [2]
    assert out["p_brand"].to_pylist() == ["Brand#1"]


def test_q2_min_ties_all_returned(ray_session, tmp_path):
    """Two regional suppliers tied at the per-part minimum balance both
    appear; a cheaper OUT-of-region supplier is invisible."""
    tmp = str(tmp_path)
    _write(tmp, "region", pa.table({
        "r_regionkey": pa.array([0, 3], pa.int32()),
        "r_name": ["AFRICA", "EUROPE"],
    }))
    _write(tmp, "nation", pa.table({
        "n_nationkey": pa.array([0, 3], pa.int32()),
        "n_name": ["NATION_0", "NATION_3"],
        "n_regionkey": pa.array([0, 3], pa.int32()),
    }))
    _write(tmp, "part", pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_size": pa.array([15, 14], pa.int32()),   # part 2 filtered out
    }))
    _write(tmp, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": ["SA", "SB", "SC"],
        "s_nationkey": pa.array([3, 3, 0], pa.int32()),  # SC out of region
        "s_acctbal": pa.array([50.0, 50.0, 1.0]),
    }))
    _write(tmp, "lineitem", pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 1], pa.int64()),
    }))
    from engine.relational2 import q_q2_min_cost_supplier
    out = q_q2_min_cost_supplier(tmp)
    assert out["s_name"].to_pylist() == ["SA", "SB"]
    assert out["s_acctbal_cents"].to_pylist() == [5000, 5000]
    assert out["p_partkey"].to_pylist() == [1, 1]


def test_q15_global_max_tie(ray_session, tmp_path):
    """Suppliers tied at the global max all return, sorted by key."""
    tmp = str(tmp_path)
    d = _ts("1996-02-01T00:00:00")
    _write(tmp, "lineitem", pa.table({
        "l_suppkey": pa.array([1, 2, 3, 2], pa.int64()),
        "l_shipdate": pa.array([d, d, d, d]),
        "l_extendedprice": pa.array([20.0, 10.0, 5.0, 10.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
    }))
    _write(tmp, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": ["S1", "S2", "S3"],
    }))
    from engine.relational2 import q_q15_top_supplier
    out = q_q15_top_supplier(tmp)
    assert out["s_suppkey"].to_pylist() == [1, 2]
    assert out["total_revenue_micro"].to_pylist() == [200000, 200000]


def test_q7_direction_and_same_nation_excluded(ray_session, tmp_path):
    """Same-nation supplier/customer pairs drop; the two directions
    accumulate separately."""
    tmp = str(tmp_path)
    ship = _ts("1996-06-01T00:00:00")
    _write(tmp, "nation", pa.table({
        "n_nationkey": pa.array([7, 12], pa.int32()),
        "n_name": ["NATION_7", "NATION_12"],
    }))
    _write(tmp, "customer", pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([7, 12], pa.int32()),
    }))
    _write(tmp, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([7, 12], pa.int32()),
    }))
    _write(tmp, "orders", pa.table({
        "o_orderkey": pa.array([10, 20], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
    }))
    # o10 (cust nation 7): supp 12 -> direction (12, 7); supp 7 same-nation
    # o20 (cust nation 12): supp 7 -> direction (7, 12)
    _write(tmp, "lineitem", pa.table({
        "l_orderkey": pa.array([10, 10, 20], pa.int64()),
        "l_suppkey": pa.array([2, 1, 1], pa.int64()),
        "l_shipdate": pa.array([ship, ship, ship]),
        "l_extendedprice": pa.array([10.0, 99.0, 20.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
    }))
    from engine.relational2 import q_q7_nation_volume
    out = q_q7_nation_volume(tmp)
    rows = list(zip(out["supp_nation"].to_pylist(),
                    out["cust_nation"].to_pylist(),
                    out["revenue_micro"].to_pylist()))
    assert rows == [("NATION_12", "NATION_7", 100000),
                    ("NATION_7", "NATION_12", 200000)]


def test_q11_q20_threshold_exactness(ray_session, tmp_path):
    """Q11: value x |part| > 2 x total is strict.  Three parts with
    values 6/2/1 (total 9, |part|=3): only 6x3 > 18 fails strictly ->
    6 is excluded at exactly the boundary, so values 7/1/1 include 7."""
    tmp = str(tmp_path)
    _write(tmp, "region", pa.table({
        "r_regionkey": pa.array([3], pa.int32()),
        "r_name": ["EUROPE"]}))
    _write(tmp, "nation", pa.table({
        "n_nationkey": pa.array([3], pa.int32()),
        "n_name": ["NATION_3"],
        "n_regionkey": pa.array([3], pa.int32())}))
    _write(tmp, "supplier", pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_nationkey": pa.array([3], pa.int32())}))
    _write(tmp, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64())}))
    # revenues (micros): part1 6x100x100, parts 2,3: 1x100x100 each +
    # part2 an extra 1x100x100 -> values 60000/20000/10000, total 90000
    _write(tmp, "lineitem", pa.table({
        "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_extendedprice": pa.array([6.0, 1.0, 1.0, 1.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
    }))
    from engine.relational2 import q_q11_important_parts
    out = q_q11_important_parts(tmp)
    # thresholds: v*3 > 2*90000 -> v > 60000 strictly: part1 at 60000 fails
    assert out["p_partkey"].to_pylist() == []


def test_new_shapes_match_duckdb_at_sf0001(ray_session):
    """All 13 new shapes value-match their oracles on the committed
    sf0.001 corpus (the gate mirror at micro scale)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as e
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders "
              "lineitem").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, sqls = e.queries(), e.oracle_sql()
    for name in ("q2_min_cost_supplier", "q7_nation_volume",
                 "q8_market_share", "q9_product_profit",
                 "q11_important_parts", "q12_late_priority",
                 "q13_custdist", "q15_top_supplier", "q16_supplier_cnt",
                 "q19_discounted_revenue", "q20_excess_suppliers",
                 "q21_waiting_suppliers", "q22_global_sales"):
        got = qs[name](sf)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.sql(sqls[name]).df()
        assert len(got) == len(want), name
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        if len(want):
            g = got[cols].sort_values(cols, ignore_index=True) \
                .astype(object)
            w = want[cols].sort_values(cols, ignore_index=True) \
                .astype(object)
            assert g.equals(w), name
