"""Q3 join-plan edge cases the sf-corpus gate mirror cannot isolate:
inner-join semantics (orders with no qualifying lineitem drop), the
segment and date filters, and revenue-fold exactness across batches."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.relational import Q3_CUTOFF


def _write(tmp, name, table):
    pq.write_table(table, os.path.join(tmp, f"{name}.parquet"))


@pytest.fixture()
def micro_dir(tmp_path):
    tmp = str(tmp_path)
    before = Q3_CUTOFF - np.timedelta64(10, "D")
    after = Q3_CUTOFF + np.timedelta64(10, "D")
    _write(tmp, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": ["BUILDING", "MACHINERY", "BUILDING"],
    }))
    _write(tmp, "orders", pa.table({
        # o1: qualifies fully; o2: wrong segment; o3: order after cutoff;
        # o4: qualifies but its only lineitem shipped before the cutoff
        "o_orderkey": pa.array([10, 20, 30, 40], pa.int64()),
        "o_custkey": pa.array([1, 2, 1, 3], pa.int64()),
        "o_orderdate": pa.array([before, before, after, before]),
    }))
    _write(tmp, "lineitem", pa.table({
        "l_orderkey": pa.array([10, 10, 20, 30, 40], pa.int64()),
        "l_shipdate": pa.array([after, after, after, after, before]),
        "l_extendedprice": pa.array([100.0, 50.0, 10.0, 10.0, 10.0]),
        "l_discount": pa.array([0.05, 0.00, 0.0, 0.0, 0.0]),
    }))
    return tmp


def test_q3_inner_join_and_filters(ray_session, micro_dir):
    from engine.relational import q_q3_revenue_topk
    out = q_q3_revenue_topk(micro_dir)
    # only order 10 survives: 20 fails the segment, 30 the order date,
    # 40 has no post-cutoff lineitem
    assert out["o_orderkey"].tolist() == [10]
    # revenue = 10000c*95 + 5000c*100 exactly
    assert out["revenue_micro"].tolist() == [10000 * 95 + 5000 * 100]


def test_q3_broadcast_and_exchange_paths_agree(ray_session, micro_dir):
    """The dual-path custkey semi-join: broadcast probe and keyed
    exchange produce the identical top-k table (micro corpus + the
    sf0.001 testdata)."""
    import pandas as pd

    from engine.relational import q_q3_revenue_topk
    for d in (micro_dir, "/root/testdata/sf0.001"):
        a = q_q3_revenue_topk(d, method="broadcast")
        b = q_q3_revenue_topk(d, method="exchange")
        pd.testing.assert_frame_equal(a, b)


def test_q3_empty_result(ray_session, micro_dir):
    """No BUILDING customers at all: the semi-join empties the plan and
    the fold returns a typed empty frame."""
    from engine.relational import q_q3_revenue_topk
    _write(micro_dir, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": ["MACHINERY"] * 3,
    }))
    out = q_q3_revenue_topk(micro_dir)
    assert len(out) == 0
    assert sorted(out.columns) == ["o_orderkey", "odate_us", "revenue_micro"]


def test_transitions_block_random_vs_pandas():
    """Property: transitions_block == pandas lag/groupby on random event
    logs with tied timestamps.  Pure kernel — no Ray."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from engine.analytics import transitions_block

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def prop(data):
        n = data.draw(st.integers(min_value=0, max_value=50))
        uid = data.draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
        ts = data.draw(st.lists(st.integers(0, 30), min_size=n, max_size=n))
        et = data.draw(st.lists(st.sampled_from(["a", "b", "c"]),
                                min_size=n, max_size=n))
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")
                           if n else np.array([], dtype="datetime64[us]")),
            "event_type": pa.array(et, pa.string()),
        })
        got = transitions_block(t).to_pandas()
        got = {(r.from_type, r.to_type): r.n for r in got.itertuples()}
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        df["prev"] = df.groupby("user_id")["event_type"].shift()
        df = df.dropna(subset=["prev"])
        want = df.groupby(["prev", "event_type"]).size().to_dict()
        assert got == want

    prop()


def test_above_avg_block_ties_and_singletons():
    """Singleton customers (avg == own price) and exact-tie orders are
    excluded by the STRICT inequality; cross-multiplication stays exact
    at int64 scale."""
    from engine.analytics import above_avg_block
    t = pa.table({
        "key": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "o_orderkey": pa.array([10, 11, 12, 20, 30, 31], pa.int64()),
        # cust 1: avg 200 -> only 300 qualifies; cust 2: singleton (tie);
        # cust 3: equal pair (both tie)
        "price_cents": pa.array([100, 200, 300, 500, 7, 7], pa.int64()),
    })
    out = above_avg_block(t)
    assert out["o_orderkey"].to_pylist() == [12]


# ---------------------------------------------------------------------------
# Q18 / Q4 block kernels (unit level — the sf-corpus gate mirror covers the
# end-to-end plans; these isolate the per-partition group folds)
# ---------------------------------------------------------------------------

def test_q18_q4_micro_end_to_end(ray_session, tmp_path):
    """Micro corpus through the real exchange plans: inner-join drops,
    HAVING boundary (= threshold excluded), EXISTS dedup (two qualifying
    lineitems count the order once)."""
    import pandas as pd

    from engine.relational import (_Q4_LO, _Q18_MIN_QTY, q_q4_priority_counts,
                                   q_q18_big_orders)
    tmp = str(tmp_path)
    inside = _Q4_LO + np.timedelta64(5, "D")
    _write(tmp, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 20, 30], pa.int64()),
        "o_orderdate": pa.array([inside, inside, inside]),
        "o_totalprice": pa.array([1.0, 2.0, 3.0]),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW"],
    }))
    _write(tmp, "lineitem", pa.table({
        # order 1: total qty exactly at threshold (excluded) but TWO
        # qty>45 rows (counted once by EXISTS); order 2: passes HAVING
        # via six small rows, none qty>45; order 3: no lineitems at all
        "l_orderkey": pa.array([1, 1] + [2] * 6, pa.int64()),
        "l_quantity": pa.array([200.0, 50.0] + [44.0] * 6),
    }))
    big = q_q18_big_orders(tmp)
    assert list(big["o_orderkey"]) == [2]
    assert list(big["total_qty"]) == [264]
    prio = q_q4_priority_counts(tmp)
    assert prio.to_dict("records") == [
        {"o_orderpriority": "1-URGENT", "order_count": 1}]
    assert isinstance(prio, pd.DataFrame)


def test_tfidf_zero_df_term_contributes_nothing(ray_session, tmp_path):
    import engine.corpus as corpus
    tmp = str(tmp_path)
    _write(tmp, "documents", pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["dup dup merge", "merge", "plain words only"],
    }))
    out = corpus.q_tfidf_topk(tmp).to_pandas()
    # df: dup=1, merge=2, scan=0 -> idf 3e6, 1.5e6, skipped
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["score"]) == [2 * 3_000_000 + 1_500_000, 1_500_000]
    assert list(out["rank"]) == [1, 2]


def test_q18_having_block_random_vs_pandas():
    """Property: q18_having_block == pandas groupby HAVING on random
    tagged-union partitions.  Pure kernel — no Ray."""
    from hypothesis import given, settings, strategies as st

    from engine.relational import _Q18_MIN_QTY, q18_having_block

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def prop(data):
        okeys = data.draw(st.lists(st.integers(0, 9), max_size=6,
                                   unique=True))   # order rows, unique key
        nl = data.draw(st.integers(min_value=0, max_value=40))
        lkey = data.draw(st.lists(st.integers(0, 9), min_size=nl,
                                  max_size=nl))    # quantity partials
        lqty = data.draw(st.lists(
            st.integers(0, _Q18_MIN_QTY), min_size=nl, max_size=nl))
        rows = [(k, 100 + k, 1000 + k, 77 + k, 0) for k in okeys] + \
               [(k, None, None, q, 1) for k, q in zip(lkey, lqty)]
        t = pa.table({
            "key": pa.array([r[0] for r in rows], pa.int64()),
            "custkey": pa.array([r[1] for r in rows], pa.int64()),
            "odate_us": pa.array([r[2] for r in rows], pa.int64()),
            "aux": pa.array([r[3] for r in rows], pa.int64()),
            "side": pa.array([r[4] for r in rows], pa.int8()),
        })
        got = q18_having_block(t).to_pandas() \
            .sort_values("o_orderkey", ignore_index=True)
        want = []
        for k in sorted(okeys):
            qty = sum(q for kk, q in zip(lkey, lqty) if kk == k)
            if qty > _Q18_MIN_QTY:
                want.append((k, 100 + k, 1000 + k, 77 + k, qty))
        assert [tuple(r) for r in got.itertuples(index=False)] == want

    prop()


def test_q4_count_block_random_vs_pandas():
    """Property: q4_count_block == python semi-join + Counter on random
    partitions (duplicate probe keys across batches included)."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from engine.relational import q4_count_block

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def prop(data):
        okeys = data.draw(st.lists(st.integers(0, 9), max_size=6,
                                   unique=True))
        prios = data.draw(st.lists(st.sampled_from(["1-URGENT", "5-LOW"]),
                                   min_size=len(okeys),
                                   max_size=len(okeys)))
        hits = data.draw(st.lists(st.integers(0, 9), max_size=12))  # dupes ok
        rows = [(k, p, 0) for k, p in zip(okeys, prios)] + \
               [(k, None, 1) for k in hits]
        t = pa.table({
            "key": pa.array([r[0] for r in rows], pa.int64()),
            "prio": pa.array([r[1] for r in rows], pa.string()),
            "side": pa.array([r[2] for r in rows], pa.int8()),
        })
        got = q4_count_block(t).to_pandas()
        got = dict(zip(got["o_orderpriority"], got["order_count"]))
        want = dict(Counter(p for k, p in zip(okeys, prios) if k in set(hits)))
        assert got == want

    prop()


def test_bloom_no_false_negatives_property():
    """Every inserted key tests True regardless of collisions; random
    probe keys measure (and bound) the false-positive side."""
    from hypothesis import given, settings, strategies as st

    from engine.relational import _bloom_positions, bloom_fold, bloom_test

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def prop(data):
        keys = np.array(data.draw(st.lists(
            st.integers(-2**62, 2**62), max_size=200)), dtype=np.int64)
        h1, h2 = _bloom_positions(keys)
        bloom = bloom_fold([pa.table({"pos": pa.array(
            np.concatenate([h1, h2]))})]) if len(keys) else \
            bloom_fold([])
        if len(keys):
            assert bloom_test(bloom, keys).all()
        probes = np.array(data.draw(st.lists(
            st.integers(-2**62, 2**62), max_size=50)), dtype=np.int64)
        misses = probes[~np.isin(probes, keys)]
        if len(misses):
            # 200 keys x 2 bits in 2^26 slots: fp ~ (400/2^26)^2 — a hit
            # on a miss here would indicate broken hashing, not bad luck
            assert not bloom_test(bloom, misses).any()

    prop()


def test_q18_q4_random_tables_vs_duckdb(ray_session, tmp_path):
    """Fuzz the exchange plans against in-process DuckDB on random micro
    corpora: orders without lineitems, lineitems without orders, HAVING
    and date boundaries, duplicate qualifying rows."""
    import duckdb
    import pandas as pd

    from engine.relational import (_Q4_LO, _Q4_HI, q_q4_priority_counts,
                                   q_q18_big_orders)

    rng = np.random.default_rng(20260818)
    lo = _Q4_LO.astype("datetime64[us]").astype(np.int64)
    hi = _Q4_HI.astype("datetime64[us]").astype(np.int64)
    span = hi - lo
    for trial in range(6):
        d = tmp_path / f"t{trial}"
        d.mkdir()
        n_o = int(rng.integers(0, 30))
        n_l = int(rng.integers(0, 120))
        okeys = rng.choice(np.arange(1, 40), size=n_o, replace=False) \
            if n_o else np.array([], dtype=np.int64)
        odates = (lo + rng.integers(-span, 2 * span, size=n_o)) \
            .astype("datetime64[us]")
        pq.write_table(pa.table({
            "o_orderkey": pa.array(okeys.astype(np.int64)),
            "o_custkey": pa.array(rng.integers(1, 10, size=n_o)
                                  .astype(np.int64)),
            "o_orderdate": pa.array(odates),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1, 9999, size=n_o), 2)),
            "o_orderpriority": pa.array(
                rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"], size=n_o)),
        }), str(d / "orders.parquet"))
        pq.write_table(pa.table({
            "l_orderkey": pa.array(rng.integers(1, 45, size=n_l)
                                   .astype(np.int64)),
            "l_quantity": pa.array(rng.integers(1, 51, size=n_l)
                                   .astype(np.float64)),
        }), str(d / "lineitem.parquet"))
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{d}/{t}.parquet')")
        import __ray_entry__ as e
        for name, fn in (("q18_big_orders", q_q18_big_orders),
                         ("q4_priority_counts", q_q4_priority_counts)):
            got = fn(str(d))
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            want = con.sql(e.oracle_sql()[name]).df()
            got = got[sorted(got.columns)] \
                .sort_values(by=sorted(got.columns), ignore_index=True)
            want = want[sorted(want.columns)] \
                .sort_values(by=sorted(want.columns), ignore_index=True)
            for c in got.columns:
                if pd.api.types.is_integer_dtype(got[c]):
                    got[c] = got[c].astype("Int64")
                if pd.api.types.is_integer_dtype(want[c]):
                    want[c] = want[c].astype("Int64")
            pd.testing.assert_frame_equal(got, want, check_dtype=False), \
                (name, trial)


# ---------------------------------------------------------------------------
# Q14 promo share + nation revenue (star joins over part/supplier/nation)
# ---------------------------------------------------------------------------

@pytest.fixture()
def star_dir(tmp_path):
    tmp = str(tmp_path)
    _write(tmp, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_type": ["PROMO", "ECONOMY", "PROMO"],
    }))
    _write(tmp, "supplier", pa.table({
        "s_suppkey": pa.array([7, 8], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
    }))
    _write(tmp, "nation", pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": ["ALGERIA", "BRAZIL"],
    }))
    _write(tmp, "lineitem", pa.table({
        # partkey 9 has NO part row (inner-join drop); supp 9 likewise
        "l_partkey": pa.array([1, 2, 3, 9], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 9], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 25.0, 10.0]),
        "l_discount": pa.array([0.05, 0.00, 0.10, 0.0]),
    }))
    return tmp


def test_promo_revenue_paths_agree_and_exact(ray_session, star_dir):
    from engine.relational import q_promo_revenue
    b = q_promo_revenue(star_dir, method="broadcast").to_pandas()
    x = q_promo_revenue(star_dir, method="exchange").to_pandas()
    assert b.equals(x)
    promo = 10000 * 95 + 2500 * 90          # parts 1 and 3
    total = promo + 5000 * 100              # + part 2; partkey 9 dropped
    assert b["promo_rev_micro"].tolist() == [promo]
    assert b["total_rev_micro"].tolist() == [total]
    assert b["promo_permille"].tolist() == [(1000 * promo) // total]


def test_nation_revenue_inner_join_drop(ray_session, star_dir):
    from engine.relational import q_nation_revenue
    out = q_nation_revenue(star_dir).to_pandas()
    assert out["n_name"].tolist() == ["ALGERIA", "BRAZIL"]
    assert out["revenue_micro"].tolist() == [10000 * 95 + 5000 * 100,
                                             2500 * 90]
    assert out["n_items"].tolist() == [2, 1]


def test_fk_violations_planted_corruption(ray_session, tmp_path):
    """A corrupted copy of the fixtures (orphan lineitems + an orphan
    order) reports exactly the planted counts; the clean fixtures report
    zeros."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path / "corrupt"
    d.mkdir()
    for t in ("orders", "lineitem", "customer", "part", "supplier"):
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    li = pq.read_table(str(d / "lineitem.parquet"))
    # 3 orphan lineitems on a nonexistent order; valid part/supp keys
    extra = li.slice(0, 3).set_column(
        li.schema.get_field_index("l_orderkey"), "l_orderkey",
        pa.array([10**9, 10**9, 10**9 + 1], type=li["l_orderkey"].type))
    pq.write_table(pa.concat_tables([li, extra]),
                   str(d / "lineitem.parquet"))
    od = pq.read_table(str(d / "orders.parquet"))
    extra_o = od.slice(0, 1).set_column(
        od.schema.get_field_index("o_custkey"), "o_custkey",
        pa.array([10**9], type=od["o_custkey"].type))
    # the extra order keeps its (existing) orderkey: it must NOT create
    # dangling lineitems, only one dangling order->customer edge
    pq.write_table(pa.concat_tables([od, extra_o]),
                   str(d / "orders.parquet"))

    from engine.relational import q_fk_violations
    got = q_fk_violations(str(d)).to_pylist()[0]
    assert got == {"dangling_lineitem_order": 3,
                   "dangling_order_customer": 1,
                   "dangling_lineitem_part": 0,
                   "dangling_lineitem_supplier": 0}

    clean = q_fk_violations(src).to_pylist()[0]
    assert set(clean.values()) == {0}
