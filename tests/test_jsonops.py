"""JSON props projection: extraction semantics on adversarial strings
(the sf gate only sees uniform '{"k": N}') plus the oracle mirror on a
malformed-props corpus the driver fixtures cannot produce."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from engine import jsonops


def test_extract_k_semantics():
    got = jsonops.extract_k(pa.array(
        ['{"k": 69}', '{"k": -3}', '{"x": 1}', None, 'oops',
         '{"k": 007}', '{"a": 1, "k": 42}', '{"k":9}']))
    assert got.to_pylist() == [69, -3, None, None, None, 7, 42, 9]


def test_props_json_stats_malformed_corpus(ray_session, tmp_path):
    """Engine and RE2 oracle agree on a corpus with missing keys and
    malformed JSON — per-row degradation, not query abort."""
    d = str(tmp_path)
    t = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "ts": pa.array([0] * 6, type=pa.timestamp("us")),
        "user_id": pa.array([0] * 6, type=pa.int64()),
        "event_type": ["a", "a", "a", "b", "b", "c"],
        "value": pa.array([0.0] * 6),
        "props": ['{"k": 5}', 'garbage', '{"x": 1}',
                  '{"k": -7}', '{"k": 2}', None],
    })
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = jsonops.q_props_json_stats(d).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    want = con.execute(jsonops.SQL_PROPS_JSON_STATS).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
