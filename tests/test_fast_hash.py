"""Property pins for the splitmix64 fast twins of the md5 gate maps
(r3 `weak` #3 / next-round #5).

md5 is DuckDB's only shared digest, so the fast variants can't be
SQL-gated where the HASH VALUES surface in the output (split buckets,
KMV draws, mixture draws) — these tests pin them instead: a scalar
splitmix64 reference, determinism, and the semantic contract each
operator promises.  decontaminate_fast IS gated (its verdict is
hash-agnostic) and additionally pinned here to equal the md5 anchor
exactly.
"""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _splitmix64_scalar(x: int) -> int:
    m = (1 << 64) - 1
    x &= m
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & m
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & m
    x ^= x >> 33
    return x


def test_hash_bucket_fast_matches_scalar_reference():
    from engine.corpus import hash_bucket_fast
    ids = np.array([0, 1, 7, 123456789, 2**62, -5], dtype=np.int64)
    got = hash_bucket_fast(ids, 100)
    want = [_splitmix64_scalar(int(np.uint64(i))) % 100 for i in ids]
    assert got.tolist() == want
    got13 = hash_bucket_fast(ids, 1000, shift=13)
    want13 = [(_splitmix64_scalar(int(np.uint64(i))) >> 13) % 1000
              for i in ids]
    assert got13.tolist() == want13


def test_corpus_split_fast_contract(ray_session):
    from engine.corpus import q_corpus_split_fast, q_corpus_split
    a = q_corpus_split_fast(SF_DIR).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    b = q_corpus_split_fast(SF_DIR).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)          # deterministic
    md5 = q_corpus_split(SF_DIR).to_pandas()
    assert sorted(a["doc_id"]) == sorted(md5["doc_id"])  # same universe
    assert a["bucket"].between(0, 99).all()
    frac = a["split"].value_counts(normalize=True)
    assert 0.70 <= frac["train"] <= 0.90         # 80% +- hash noise
    assert 0.04 <= frac.get("val", 0) <= 0.16
    assert 0.04 <= frac.get("test", 0) <= 0.16


def test_decontaminate_fast_equals_md5_anchor(ray_session):
    from engine.decontam import q_decontaminate, q_decontaminate_fast
    slow = q_decontaminate(SF_DIR).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    fast = q_decontaminate_fast(SF_DIR).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(slow, fast)


def test_kmv_distinct_fast_contract(ray_session):
    import pyarrow.parquet as pq
    from engine.sketch import q_kmv_distinct_fast, _KMV_K
    a = q_kmv_distinct_fast(SF_DIR).to_pandas()
    b = q_kmv_distinct_fast(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(a, b)          # deterministic
    true = len(set(pq.read_table(f"{SF_DIR}/events.parquet",
                                 columns=["user_id"])
                   ["user_id"].to_pylist()))
    est = int(a["est_distinct"].iloc[0])
    if int(a["k_used"].iloc[0]) < _KMV_K:
        assert est == true                       # sketch saw everything
    else:
        assert abs(est - true) / true < 0.25     # ~4 sigma at k=256


def test_source_mixture_sample_fast_contract(ray_session):
    from engine.decontam import (q_source_mixture_sample,
                                 q_source_mixture_sample_fast,
                                 _TARGET_PER_SOURCE, _RATE_BUCKETS)
    slow = q_source_mixture_sample(SF_DIR).to_pandas()
    fast = q_source_mixture_sample_fast(SF_DIR).to_pandas()
    fast2 = q_source_mixture_sample_fast(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        fast.sort_values("doc_id", ignore_index=True),
        fast2.sort_values("doc_id", ignore_index=True))
    # identical rate table (rates don't depend on the hash)
    r_slow = slow.groupby("source")["rate_milli"].first()
    r_fast = fast.groupby("source")["rate_milli"].first()
    pd.testing.assert_series_equal(r_slow, r_fast)
    # kept counts land near the target for downsampled sources (binomial
    # noise: n*p ~ 20, sigma ~ 4.4 -> 4 sigma window), exact for full-rate
    for src, grp in fast.groupby("source"):
        rate = grp["rate_milli"].iloc[0]
        kept = int(grp["kept"].sum())
        if rate >= _RATE_BUCKETS:
            assert kept == len(grp)
        else:
            assert abs(kept - len(grp) * rate / _RATE_BUCKETS) <= 18


def test_late_data_watermark_fast_matches_local_oracle(ray_session):
    """The splitmix64-jitter watermark scan equals a single-process numpy
    oracle replaying the identical jitter: same arrival derivation, same
    exclusive running-max watermark, same lateness verdicts."""
    import pyarrow.parquet as pq
    from engine.dedup import _mix64
    from engine.streaming import (q_late_data_watermark_fast,
                                  _WM_JITTER_US, _WM_LATENESS_US)
    got = q_late_data_watermark_fast(SF_DIR)
    got2 = q_late_data_watermark_fast(SF_DIR)
    pd.testing.assert_frame_equal(got, got2)     # deterministic

    t = pq.read_table(f"{SF_DIR}/events.parquet",
                      columns=["event_id", "ts"])
    eid = t["event_id"].to_numpy().astype(np.int64)
    tsu = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    jit = (_mix64(eid.view(np.uint64))
           % np.uint64(_WM_JITTER_US)).astype(np.int64)
    assert (jit >= 0).all() and (jit < _WM_JITTER_US).all()
    arr = tsu + jit
    order = np.lexsort((eid, arr))
    eid_o, tsu_o, arr_o = eid[order], tsu[order], arr[order]
    wm = np.empty(len(tsu_o), dtype=np.int64)
    wm[0] = np.iinfo(np.int64).min
    if len(tsu_o) > 1:
        np.maximum.accumulate(tsu_o[:-1], out=wm[1:])
    late = ((wm != np.iinfo(np.int64).min)
            & (tsu_o < wm - _WM_LATENESS_US)).astype(np.int64)
    want = pd.DataFrame({"event_id": eid_o, "arrival_us": arr_o,
                         "ts_us": tsu_o, "late": late}) \
        .sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["late"].sum() > 0                 # jitter actually reorders


def test_window_finalize_fast_consistent_with_scan(ray_session):
    """window_finalize_fast is exactly the per-hour-window aggregation of
    the late_data_watermark_fast scan output."""
    from engine.streaming import (q_late_data_watermark_fast,
                                  q_window_finalize_fast)
    scan = q_late_data_watermark_fast(SF_DIR)
    scan["window"] = scan["ts_us"] // 3_600_000_000
    want = scan.groupby("window").agg(
        n_on_time=("late", lambda s: int((1 - s).sum())),
        n_late=("late", "sum")).reset_index() \
        .astype({"window": "int64", "n_on_time": "int64", "n_late": "int64"})
    got = q_window_finalize_fast(SF_DIR)
    pd.testing.assert_frame_equal(got, want)
