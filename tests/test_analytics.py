"""Edge cases for the windowed/order-statistics analytics operators.

The DuckDB gate mirror (tests/test_queries.py) covers value-exactness on
the fixture corpus; these tests pin the exchange edge cases it cannot
reach: partitions with an empty build side, a fully-matched anti-join,
and window math on a hand-checked micro corpus.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp, name, table):
    path = os.path.join(tmp, f"{name}.parquet")
    pq.write_table(table, path)
    return path


@pytest.fixture()
def micro_dir(tmp_path):
    tmp = str(tmp_path)
    _write(tmp, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_name": [f"c{i}" for i in range(1, 6)],
        "c_mktsegment": ["SEG"] * 5,
    }))
    return tmp


def test_anti_join_no_build_rows(ray_session, micro_dir):
    """No urgent orders anywhere: every probe partition sees an empty
    build side and must emit all its customers."""
    from engine.analytics import q_customers_without_urgent_order
    _write(micro_dir, "orders", pa.table({
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderpriority": ["3-MEDIUM"] * 3,
    }))
    out = q_customers_without_urgent_order(micro_dir).to_pandas()
    assert sorted(out["c_custkey"]) == [1, 2, 3, 4, 5]


def test_anti_join_fully_matched(ray_session, micro_dir):
    """Every customer has an urgent order: the anti-join is empty."""
    from engine.analytics import q_customers_without_urgent_order
    _write(micro_dir, "orders", pa.table({
        "o_custkey": pa.array([1, 2, 3, 4, 5, 1, 2], pa.int64()),
        "o_orderpriority": ["1-URGENT"] * 7,
    }))
    out = q_customers_without_urgent_order(micro_dir).to_pandas()
    assert len(out) == 0


def test_running_totals_micro(ray_session, tmp_path):
    """Hand-checked windows: two users, interleaved timestamps, a tie on
    ts broken by event_id, and the first-of-user gap pinned to 0."""
    from engine.analytics import q_events_running_totals
    tmp = str(tmp_path)
    base = np.datetime64("2026-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    _write(tmp, "events", pa.table({
        # user 7: events 3 (t=0), 1 (t=10), 2 (t=10)  -> tie on ts
        # user 9: event 4 (t=5)
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([7, 7, 7, 9], pa.int64()),
        "ts": pa.array([base + 10 * sec, base + 10 * sec, base, base + 5 * sec]),
        "value": pa.array([1.25, 2.0, 0.5, 4.0]),
    }))
    out = q_events_running_totals(tmp).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    assert out["seq"].tolist() == [2, 3, 1, 1]
    assert out["cum_value_milli"].tolist() == [1750, 3750, 500, 4000]
    assert out["gap_us"].tolist() == [10_000_000, 0, 0, 0]


def test_windows_block_random_vs_pandas():
    """Property: windows_block == pandas window functions (row_number,
    running sum, lag gap) on random corpora with duplicate users, tied
    timestamps, and negative values.  Pure-kernel test — no Ray."""
    from hypothesis import given, settings, strategies as st

    from engine.analytics import windows_block

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def prop(data):
        n = data.draw(st.integers(min_value=0, max_value=60))
        uid = data.draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
        ts_us = data.draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
        val = data.draw(st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=n, max_size=n))
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(np.array(ts_us, dtype="datetime64[us]")
                           if n else np.array([], dtype="datetime64[us]")),
            "value": pa.array(val, pa.float64()),
        })
        got = windows_block(t).to_pandas().sort_values(
            "event_id", ignore_index=True)
        df = t.to_pandas()
        df["milli"] = np.floor(df["value"].to_numpy() * 1000.0
                               + 0.5).astype(np.int64)
        df = df.sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", sort=False)
        df["seq"] = g.cumcount() + 1
        df["cum"] = g["milli"].cumsum()
        gap = g["ts"].diff()
        df["gap"] = (gap.dt.total_seconds() * 1e6).fillna(0).round()
        want = df.sort_values("event_id", ignore_index=True)
        assert got["seq"].tolist() == want["seq"].tolist()
        assert got["cum_value_milli"].tolist() == want["cum"].tolist()
        assert got["gap_us"].tolist() == [int(x) for x in want["gap"]]

    prop()


def test_quantiles_block_random_vs_sorted_rank():
    """Property: quantiles_block == the 1-indexed ceil(q*n) rank rule
    (quantile_disc) evaluated scalar-wise per group.  No Ray."""
    from hypothesis import given, settings, strategies as st

    from engine.analytics import quantiles_block

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def prop(data):
        n = data.draw(st.integers(min_value=0, max_value=80))
        et = data.draw(st.lists(st.sampled_from(["a", "b", "c"]),
                                min_size=n, max_size=n))
        val = data.draw(st.lists(
            st.floats(-10, 10, allow_nan=False, width=32),
            min_size=n, max_size=n))
        t = pa.table({"event_type": pa.array(et, pa.string()),
                      "value": pa.array(val, pa.float64())})
        got = quantiles_block(t).to_pandas().set_index("event_type")
        milli = np.floor(np.asarray(val) * 1000.0 + 0.5).astype(np.int64)
        for grp in sorted(set(et)):
            vs = np.sort(milli[np.asarray(et) == grp])
            m = len(vs)
            row = got.loc[grp]
            assert row["n"] == m
            assert row["min_milli"] == vs[0]
            assert row["max_milli"] == vs[-1]
            for q, col in [(.25, "p25_milli"), (.5, "p50_milli"),
                           (.75, "p75_milli")]:
                assert row[col] == vs[int(np.ceil(q * m)) - 1]

    prop()


def test_quantiles_match_duckdb_rank_rule(ray_session, tmp_path):
    """quantile_disc rank = element at 1-indexed ceil(q*n): even/odd group
    sizes pinned against the closed form."""
    from engine.analytics import q_value_quantiles_by_type
    tmp = str(tmp_path)
    _write(tmp, "events", pa.table({
        "event_type": ["a"] * 4 + ["b"] * 5,
        "value": pa.array([.04, .02, .03, .01, .5, .4, .3, .2, .1]),
    }))
    out = q_value_quantiles_by_type(tmp).set_index("event_type")
    # group a (n=4, sorted milli 10,20,30,40): p25=10, p50=20, p75=30
    assert out.loc["a", ["p25_milli", "p50_milli", "p75_milli"]].tolist() \
        == [10, 20, 30]
    # group b (n=5, sorted 100..500): p25=200, p50=300, p75=400
    assert out.loc["b", ["p25_milli", "p50_milli", "p75_milli"]].tolist() \
        == [200, 300, 400]


# ---------------------------------------------------------------------------
# watermark / allowed-lateness late data
# ---------------------------------------------------------------------------

def test_wm_scan_block_random_vs_scalar():
    """Property: wm_scan_block == a scalar running-max walk on random
    partitioned streams (including NO_WM carries and sentinel parts)."""
    from hypothesis import given, settings, strategies as st

    from engine.streaming import _NO_WM, _WM_LATENESS_US, wm_scan_block

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def prop(data):
        n = data.draw(st.integers(min_value=0, max_value=60))
        part = data.draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
        arr = data.draw(st.lists(st.integers(0, 10**12), min_size=n,
                                 max_size=n))
        tsu = data.draw(st.lists(st.integers(0, 10**12), min_size=n,
                                 max_size=n))
        carry_by_part = {p: data.draw(st.sampled_from(
            [_NO_WM, 0, 5 * 10**11, 10**12])) for p in set(part)}
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "part": pa.array(part, pa.int64()),
            "arrival_us": pa.array(arr, pa.int64()),
            "ts_us": pa.array(tsu, pa.int64()),
            "carry": pa.array([carry_by_part[p] for p in part], pa.int64()),
        })
        got = wm_scan_block(t).to_pandas().set_index("event_id")["late"]
        rows = sorted(zip(part, arr, range(n)))
        wm = dict(carry_by_part)
        for p, a, i in rows:
            prev = wm[p]
            want = int(prev != _NO_WM and tsu[i] < prev - _WM_LATENESS_US)
            assert int(got.loc[i]) == want, (p, a, i)
            wm[p] = max(prev, tsu[i])

    prop()


def test_late_data_watermark_micro_stream(ray_session, tmp_path):
    """Crafted stream: an event arriving after a much-later event is late
    only when the gap exceeds the allowed lateness; the first arrival
    never is."""
    import pyarrow.parquet as pq

    import engine.streaming as streaming
    L = streaming._WM_LATENESS_US
    J = streaming._WM_JITTER_US
    from engine.sketch import _md5_60
    # choose event times so that, AFTER the deterministic md5 jitter,
    # event B arrives first with a ts far ahead of A's (late) and C's
    # (inside lateness): solve for ts via the known jitter values
    jits = _md5_60(np.arange(100, dtype=np.int64)) % J
    # pick ids whose fixed md5 jitters force arrival order B < A, B < C:
    # jit_B + L + 1s < jit_A, jit_C  (B = watermark setter arrives first)
    id_b = int(np.argmin(jits))
    big = np.flatnonzero(jits > jits[id_b] + L + 2_000_000)
    assert len(big) >= 2, "fixed md5 draw lacks two large jitters"
    id_a, id_c = int(big[0]), int(big[1])
    base = 1_700_000_000_000_000
    ts_by_id = {id_b: base,                        # B: the watermark setter
                id_a: base - L - 1_000_000,        # A: late by 1s past L
                id_c: base - L + 1_000_000}        # C: within lateness
    ids = sorted(ts_by_id)
    ts = np.array([ts_by_id[i] for i in ids], dtype=np.int64)
    arr_chk = {i: ts_by_id[i] + int(jits[i]) for i in ids}
    assert arr_chk[id_b] < arr_chk[id_a] and arr_chk[id_b] < arr_chk[id_c]
    pq.write_table(pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
    }), str(tmp_path / "events.parquet"))
    out = streaming.q_late_data_watermark(str(tmp_path)) \
        .set_index("event_id")
    arr = out["arrival_us"]
    assert arr.loc[id_b] < arr.loc[id_a] and arr.loc[id_b] < arr.loc[id_c]
    assert out["late"].loc[id_b] == 0              # first arrival: no wm
    assert out["late"].loc[id_a] == 1              # past allowed lateness
    assert out["late"].loc[id_c] == 0              # inside allowed lateness


def test_cooccurrence_random_vs_duckdb(ray_session, tmp_path):
    """Random skewed corpus (single-type users -> no pairs, duplicate
    events of one type -> still one pair, users split across batches)
    diffed against the in-process DuckDB plan."""
    import duckdb
    from engine.analytics import (q_event_type_cooccurrence,
                                  SQL_EVENT_TYPE_COOCCURRENCE)
    rng = np.random.default_rng(7)
    n = 4000
    users = rng.integers(0, 120, n)
    types = np.array(["a", "b", "c", "d", "e", "f"])[
        rng.integers(0, 6, n)]
    # single-type users 200/201 and a duplicate-heavy user 202
    users = np.concatenate([users, [200] * 5, [201], [202] * 8])
    types = np.concatenate([types, ["a"] * 5, ["f"], ["b"] * 4 + ["c"] * 4])
    t = pa.table({
        "event_id": pa.array(np.arange(len(users)), pa.int64()),
        "ts": pa.array(
            pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(len(users)), unit="s")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(np.zeros(len(users))),
        "props": pa.array(["{}"] * len(users)),
    })
    _write(str(tmp_path), "events", t)
    out = q_event_type_cooccurrence(str(tmp_path))
    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute(SQL_EVENT_TYPE_COOCCURRENCE).df()
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)
    # user 200/201 contribute no pairs; 202 contributes exactly (b, c)
    assert int(out.loc[(out.type_a == "b") & (out.type_b == "c"),
                       "n_users"].iloc[0]) >= 1


def test_cooccurrence_no_pairs(ray_session, tmp_path):
    """Every user has exactly one type: the pair table is empty but
    schema-stable."""
    from engine.analytics import q_event_type_cooccurrence
    t = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * 3)),
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "a"], pa.string()),
        "value": pa.array([0.0, 0.0, 0.0]),
        "props": pa.array(["{}"] * 3),
    })
    _write(str(tmp_path), "events", t)
    out = q_event_type_cooccurrence(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["type_a", "type_b", "n_users"]


def test_containment_planted_quote(ray_session, tmp_path):
    """A 6-word doc quoted verbatim inside a 200-word doc must surface
    with containment 1000 even though their Jaccard is tiny — the case
    the size-banded Jaccard operator cannot reach by design."""
    import duckdb
    from engine.dedup import q_containment_pairs, SQL_CONTAINMENT_PAIRS
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(4000)]
    quote = "crimson owls deliver midnight letters swiftly"
    long_doc = " ".join(
        [vocab[i] for i in rng.integers(0, 4000, 100)]
        + quote.split()
        + [vocab[i] for i in rng.integers(0, 4000, 100)])
    docs = [quote, long_doc] + [
        " ".join(vocab[i] for i in rng.integers(0, 4000, 50))
        for _ in range(40)]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s0"] * len(docs)),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    })
    _write(str(tmp_path), "documents", t)
    out = q_containment_pairs(str(tmp_path)).to_pandas()
    row = out[(out.doc_a == 0) & (out.doc_b == 1)]
    assert len(row) == 1 and int(row.containment_milli.iloc[0]) == 1000
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(SQL_CONTAINMENT_PAIRS).df()
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)
