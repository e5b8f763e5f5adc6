"""Robust/behavioral statistics: property tests for the integer-exact
kernels plus adversarial end-to-end checks the fixture gate can't hit
(median ties straddling refinement buckets, empty funnel stages).

The DuckDB value-hash gate itself runs via tests/test_queries.py's
auto-parametrization (median_value_by_type, user_funnel, value_outliers,
doc_length_histogram are all in EXTRA_ORACLE_SQL).
"""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import robust

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# sigma_cutoffs: the integer cutoff pair must reproduce the quadratic
# predicate exactly for every integer value
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-10_000, max_value=10_000),
                min_size=2, max_size=40))
def test_sigma_cutoffs_match_quadratic(vals):
    n = len(vals)
    s1 = sum(vals)
    s2 = sum(v * v for v in vals)
    lo_max, hi_min = robust.sigma_cutoffs({"t": (n, s1, s2)})["t"]
    disc = 9 * (n * s2 - s1 * s1)
    for v in range(min(vals) - 3, max(vals) + 4):
        quad = (n * v - s1) ** 2 > disc
        cutoff = v <= lo_max or v >= hi_min
        assert quad == cutoff, (v, n, s1, s2, lo_max, hi_min)


# ---------------------------------------------------------------------------
# length_buckets: frexp exponent == floor(log2) == the printf('%b') oracle
# ---------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40),
                min_size=1, max_size=50))
def test_length_buckets_exact(ns):
    arr = np.array(ns, dtype=np.int64)
    got = robust.length_buckets(arr)
    want = [len(format(n, "b")) - 1 if n > 0 else 0 for n in ns]
    assert got.tolist() == want


# ---------------------------------------------------------------------------
# funnel kernels: partial + block over a hand-built log
# ---------------------------------------------------------------------------

def test_funnel_block_strictness():
    # user 1: full ordered funnel; user 2: click before view (stops at
    # stage 1); user 3: view only; user 4: view==click tie (strict <
    # fails); user 5: view+click ordered, purchase missing
    rows = [(1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "click", 5), (2, "view", 6), (2, "purchase", 7),
            (3, "view", 1),
            (4, "view", 8), (4, "click", 8),
            (5, "view", 2), (5, "click", 4)]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], type=pa.int64())})
    out = robust.funnel_block(robust.funnel_partial(t))
    assert out["n_view"][0].as_py() == 5
    assert out["n_view_click"][0].as_py() == 2    # users 1 and 5 only
    assert out["n_funnel"][0].as_py() == 1        # user 1 only


def test_funnel_partial_merges_across_batches():
    # the same user split across two batches: partial mins must fold to
    # the global min through the exchange block
    b1 = pa.table({"user_id": pa.array([9], type=pa.int64()),
                   "event_type": pa.array(["click"]),
                   "ts": pa.array([50], type=pa.int64())})
    b2 = pa.table({"user_id": pa.array([9, 9], type=pa.int64()),
                   "event_type": pa.array(["view", "purchase"]),
                   "ts": pa.array([40, 60], type=pa.int64())})
    merged = pa.concat_tables([robust.funnel_partial(b1),
                               robust.funnel_partial(b2)])
    out = robust.funnel_block(merged)
    assert out["n_funnel"][0].as_py() == 1        # 40 < 50 < 60


# ---------------------------------------------------------------------------
# median refinement: adversarial ties straddling the 32-cent buckets
# ---------------------------------------------------------------------------

def test_median_refinement_ties_and_parity(ray_session, tmp_path):
    """Values massed exactly on bucket boundaries (cents = k*32) with both
    even and odd group sizes; compare against numpy's exact median."""
    rng = np.random.default_rng(7)
    d = tmp_path / "ev"
    os.makedirs(d, exist_ok=True)
    types, vals = [], []
    for etype, n in (("a", 101), ("b", 100), ("c", 3)):
        # half on exact 32-cent boundaries, half arbitrary
        cents = np.concatenate([
            rng.integers(0, 40, n // 2) * 32,
            rng.integers(0, 1280, n - n // 2)])
        types += [etype] * n
        vals.append(cents)
    cents_all = np.concatenate(vals)
    t = pa.table({
        "event_id": pa.array(np.arange(len(types)), type=pa.int64()),
        "ts": pa.array(np.arange(len(types)), type=pa.timestamp("us")),
        "user_id": pa.array(np.zeros(len(types)), type=pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(cents_all / 100.0, type=pa.float64()),
        "props": pa.array([""] * len(types))})
    pq.write_table(t, str(d / "events.parquet"))
    out = robust.q_median_value_by_type(str(d)).to_pandas() \
        .set_index("event_type")
    for etype in ("a", "b", "c"):
        grp = np.sort(cents_all[np.array(types) == etype])
        n = len(grp)
        want = int(grp[(n - 1) // 2] + grp[n // 2])
        assert int(out.loc[etype, "med2_cents"]) == want, etype
        assert int(out.loc[etype, "n"]) == n


def test_median64_nested_refinement(ray_session):
    """Round-5 #5: the full-int64-domain radix ladder (MED_SHIFTS_64 =
    [42, 21, 0]) against a sorted-scan oracle — wide uniform values,
    power-of-two-aligned clusters (massed exactly on 2^42/2^21 bucket
    boundaries), negatives, and even/odd group parities — plus the
    documented driver-state bounds via the LAST_MEDIAN counters."""
    import ray

    from engine.robust import (LAST_MEDIAN, MED_SHIFTS_64,
                               exact_median_by_group)
    rng = np.random.default_rng(42)
    parts = {
        "wide_odd": rng.integers(-2**61, 2**61, 4001, dtype=np.int64),
        "wide_even": rng.integers(-2**61, 2**61, 4000, dtype=np.int64),
        # massed on the pass-1/pass-2 radix boundaries (ties straddle)
        "aligned": rng.integers(-500, 500, 3000).astype(np.int64) << 42,
        "mid": rng.integers(-500, 500, 2999).astype(np.int64) << 21,
        "tiny": np.array([-7, 3], dtype=np.int64),
    }
    keys = np.concatenate([[k] * len(v) for k, v in parts.items()])
    vals = np.concatenate(list(parts.values()))
    tbl = pa.table({"grp": pa.array(keys, type=pa.string()),
                    "v": pa.array(vals, type=pa.int64())})
    res = exact_median_by_group(
        lambda: ray.data.from_arrow(tbl).repartition(8), "grp",
        lambda t: t["v"].to_numpy(zero_copy_only=False),
        MED_SHIFTS_64).to_pandas().set_index("key")
    for k, v in parts.items():
        sv = np.sort(v)
        n = len(sv)
        assert int(res.loc[k, "n"]) == n, k
        assert int(res.loc[k, "med2"]) == int(sv[(n - 1) // 2]) \
            + int(sv[n // 2]), k
    # documented driver-state bounds: pass 1 <= groups x min(n, 2^22)
    # live buckets; later passes <= groups x 2 targets x 2^21 buckets
    assert LAST_MEDIAN["passes"] == 3
    g = len(parts)
    assert LAST_MEDIAN["fold_rows"][0] <= g * min(len(vals), 1 << 22)
    for r in LAST_MEDIAN["fold_rows"][1:]:
        assert r <= g * 2 * (1 << 21)


def test_value_outliers_bigint_fold(ray_session):
    """The sf0.001 corpus end-to-end: the outlier set must equal a direct
    numpy recomputation from the raw table (validating the two-pass
    broadcast-cutoff plan, not just the cutoff algebra)."""
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                      columns=["event_id", "event_type", "value"])
    cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    et = t["event_type"].to_numpy(zero_copy_only=False)
    ids = t["event_id"].to_numpy()
    want = set()
    for etype in np.unique(et):
        m = et == etype
        v = cents[m]
        n, s1, s2 = len(v), int(v.sum()), int((v * v).sum())
        disc = 9 * (n * s2 - s1 * s1)
        sel = (n * v.astype(object) - s1) ** 2 > disc
        want.update(ids[m][sel.astype(bool)].tolist())
    got = robust.q_value_outliers(SF_DIR).to_pandas()
    assert set(got["event_id"].tolist()) == want


# ---------------------------------------------------------------------------
# global ranking: ntile bucket-size exactness + tie handling across parts
# ---------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=200))
def test_ntile_exact_matches_sql_semantics(n):
    from engine.analytics import ntile_exact
    rn = np.arange(1, n + 1, dtype=np.int64)
    got = ntile_exact(rn, n, 4)
    q, r = divmod(n, 4)
    sizes = [q + 1] * r + [q] * (4 - r)
    want, b = [], 1
    for s in sizes:
        want += [b] * s
        b += 1
    assert got.tolist() == want[:n]


def test_rank_block_multiple_parts_one_block():
    from engine.analytics import rank_block
    # two range parts in one hash block, with a tie inside part 0
    t = pa.table({
        "user_id": pa.array([5, 3, 9, 1], type=pa.int64()),
        "spend_cents": pa.array([100, 100, 90, 10], type=pa.int64()),
        "part": pa.array([0, 0, 0, 7], type=pa.int64()),
        "rows_above": pa.array([0, 0, 0, 3], type=pa.int64()),
        "dist_above": pa.array([0, 0, 0, 2], type=pa.int64()),
        "n_total": pa.array([4, 4, 4, 4], type=pa.int64())})
    out = rank_block(t).to_pandas().sort_values("user_id",
                                                ignore_index=True)
    by_user = out.set_index("user_id")
    assert by_user.loc[3, "rn"] == 1 and by_user.loc[5, "rn"] == 2
    assert by_user.loc[3, "dr"] == 1 and by_user.loc[5, "dr"] == 1
    assert by_user.loc[9, "dr"] == 2
    assert by_user.loc[1, "rn"] == 4 and by_user.loc[1, "dr"] == 3


# ---------------------------------------------------------------------------
# cohort retention: kernel semantics + cross-batch duplicate survival
# ---------------------------------------------------------------------------

def test_retention_block_dedups_cross_batch_pairs():
    from engine.robust import retention_block
    # the same (user, week) pair arriving from two batches must count once
    t = pa.table({
        "key": pa.array([7, 7, 7, 8], type=pa.int64()),
        "week": pa.array([3, 3, 5, 4], type=pa.int64())})
    out = retention_block(t).to_pandas()
    rows = set(map(tuple, out.values.tolist()))
    assert rows == {(3, 3, 1), (3, 5, 1), (4, 4, 1)}


def test_retention_matches_oracle_sf0001(ray_session):
    import duckdb
    import pandas as pd

    from engine.robust import SQL_USER_RETENTION, q_user_retention
    got = q_user_retention(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    want = con.execute(SQL_USER_RETENTION).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_profile_cli(ray_session, capsys):
    """`engine.job profile` runs the robust + sketch family end-to-end
    and prints one JSON document."""
    import json

    from engine.job import main
    assert main(["profile", "--sf-dir", SF_DIR]) == 0
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {c["col_name"] for c in doc["columns"]} == {
        "event_id", "ts", "user_id", "event_type", "value", "props"}
    assert len(doc["median_by_type"]) == 5
    assert doc["n_outliers_3sigma"] >= 0


def test_percentile_cont_derived_matches_duckdb(ray_session):
    """lo + (hi-lo)*frac/10 recovered from the exact integer quadruple
    agrees with DuckDB's native percentile_cont(0.9) float aggregate."""
    import duckdb

    import pytest

    from engine.robust import q_percentile_cont_by_type

    sf = "/root/testdata/sf0.001"
    t = q_percentile_cont_by_type(sf)
    con = duckdb.connect()
    want = {r[0]: r[1] for r in con.sql(
        f"SELECT event_type, percentile_cont(0.9) WITHIN GROUP "
        f"(ORDER BY CAST(floor(value*100.0+0.5) AS BIGINT)) "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY 1").fetchall()}
    assert set(t["event_type"].to_pylist()) == set(want)
    for i in range(t.num_rows):
        et = t["event_type"][i].as_py()
        lo, hi = t["lo_cents"][i].as_py(), t["hi_cents"][i].as_py()
        frac = t["frac_num"][i].as_py()
        got = lo + (hi - lo) * frac / 10
        assert got == pytest.approx(want[et], rel=1e-12, abs=1e-9), et


def test_exact_ranks_random_rank_sets(ray_session):
    """The generalized rank engine (exact_ranks_by_group) with RANDOM
    rank sets per group — many simultaneous targets per pass, the case
    the median/p90 wrappers never exercise — against a sorted-scan
    oracle over the full-int64-domain ladder."""
    import ray

    from engine.robust import MED_SHIFTS_64, exact_ranks_by_group
    rng = np.random.default_rng(11)
    parts = {
        "u": rng.integers(-2**60, 2**60, 1500, dtype=np.int64),
        "dup": np.repeat(rng.integers(-9, 9, 40).astype(np.int64), 50),
        "one": np.array([123456789], dtype=np.int64),
    }
    keys = np.concatenate([[k] * len(v) for k, v in parts.items()])
    vals = np.concatenate(list(parts.values()))
    tbl = pa.table({"grp": pa.array(keys, type=pa.string()),
                    "v": pa.array(vals, type=pa.int64())})
    # deterministic pseudo-random rank set per group size (seeded by n)
    def ranks_fn(n):
        r = np.random.default_rng(n)
        return {int(x) for x in r.integers(0, n, 7)} | {0, n - 1}

    res = exact_ranks_by_group(
        lambda: ray.data.from_arrow(tbl).repartition(6), "grp",
        lambda t: t["v"].to_numpy(zero_copy_only=False),
        MED_SHIFTS_64, ranks_fn)
    for k, v in parts.items():
        sv = np.sort(v)
        n, picked = res[k]
        assert n == len(sv), k
        assert set(picked) == ranks_fn(n), k
        for rank, val in picked.items():
            assert val == int(sv[rank]), (k, rank)
