"""Z-order layout: Morton-key exactness and the MEASURED pruning win of
the z-clustered parquet over a time-sorted layout."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import layout

SF_DIR = "/root/testdata/sf0.001"


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**16 - 1),
                          st.integers(0, 2**16 - 1)),
                min_size=1, max_size=50))
def test_morton_key_matches_scalar(pairs):
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    got = layout.morton_key(a, b)
    for i, (x, y) in enumerate(pairs):
        want = 0
        for k in range(16):
            want |= ((x >> k) & 1) << (2 * k + 1)
            want |= ((y >> k) & 1) << (2 * k)
        assert int(got[i]) == want


def test_zorder_pruning_beats_time_sorted(ray_session, tmp_path):
    """On a user x time rectangle, the z-clustered layout must touch a
    strictly smaller row-group fraction than the ts-sorted layout (which
    cannot prune on user_id at all)."""
    sf = "/root/testdata/sf0.1"   # 100k rows -> ~196 row groups: enough
    # statistics granularity for the rectangle to separate the layouts
    zpath = layout.zorder_layout_dir(sf, row_group_rows=512)
    t = pq.read_table(os.path.join(sf, "events.parquet"))
    ts = t["ts"].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    order = np.argsort(ts, kind="stable")
    tpath = str(tmp_path / "events_t.parquet")
    pq.write_table(t.take(pa.array(order)), tpath, row_group_size=512)

    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    u_lo, u_hi = int(np.quantile(uid, 0.4)), int(np.quantile(uid, 0.5))
    t_lo = int(np.quantile(ts, 0.4))
    t_hi = int(np.quantile(ts, 0.5))
    fz = layout.pruned_fraction(zpath, u_lo, u_hi, t_lo, t_hi)
    ft = layout.pruned_fraction(tpath, u_lo, u_hi, t_lo, t_hi)
    assert fz < ft, (fz, ft)
    assert fz <= 0.08, fz


def test_zorder_keys_gate_runs(ray_session):
    import duckdb
    import pandas as pd

    got = layout.q_zorder_keys(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    want = con.execute(layout._sql_zorder()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
