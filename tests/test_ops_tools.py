"""Operational tools: sink compaction + dead-letter replay."""

import glob
import json
import os

import pyarrow.dataset as pads
import pytest

from engine.oracle import OracleDecoder


@pytest.fixture()
def job_dir(ray_session, sf_small, tmp_path):
    from engine.pipeline import run_job
    out = str(tmp_path / "job")
    run_job(f"{sf_small}/sequences", out, f"{sf_small}/source_meta.parquet",
            num_partitions=4)
    return out


def test_compact_sinks_preserves_rows(job_dir):
    from engine.pipeline import compact_sinks
    hot = os.path.join(job_dir, "msg_type=0x2001", "version=1")
    before_files = glob.glob(os.path.join(hot, "*.parquet"))
    before = pads.dataset(hot).to_table().sort_by("doc_id")
    assert len(before_files) > 2  # one per partition (4 partitions)
    res = compact_sinks(job_dir, max_files_per_sink=2)
    assert hot in res
    after_files = glob.glob(os.path.join(hot, "*.parquet"))
    assert len(after_files) == 1
    after = pads.dataset(hot).to_table().sort_by("doc_id")
    assert after.equals(before)  # byte-identical rows, incl. tokens


def test_replay_dead_letters_with_updated_catalog(job_dir, sf_small, tmp_path):
    """Catalog update adds the previously-unknown (0x2001, v99): replay
    recovers those rows into a proper sink; other dead letters remain."""
    from engine.pipeline import replay_dead_letters
    with open(os.path.join(job_dir, "sink_counts.json")) as f:
        before_counts = json.load(f)
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    o = OracleDecoder()
    v99 = sum(1 for toks in t["tokens"].to_pylist()
              if len(toks) >= 4 and toks[0] == 0x2001 and toks[1] == 99)
    assert v99 > 0

    md = {
        "logcode_id": "0x2001", "logcode_name": "Heartbeat",
        "version_offset": 0, "version_length": 32,
        "versions": {"99": {"table_name": "2-99", "fields": [
            {"name": "Status", "type_name": "Uint8", "offset_bytes": 0,
             "offset_bits": 0, "length_bits": 8, "count": None,
             "enum_mappings": None},
        ]}},
        "all_tables": {},
    }
    mdp = str(tmp_path / "patch_metadata.json")
    with open(mdp, "w") as f:
        json.dump(md, f)

    agg = replay_dead_letters(job_dir, metadata_path=mdp)

    sink = os.path.join(job_dir, "msg_type=0x2001", "version=99")
    recovered = pads.dataset(sink).to_table()
    assert recovered.num_rows == v99
    assert "Status" in recovered.column_names
    with open(os.path.join(job_dir, "sink_counts.json")) as f:
        after_counts = json.load(f)
    assert after_counts["dead_letter"] == before_counts["dead_letter"] - v99
    assert after_counts["0x2001"] == before_counts["0x2001"] + v99
    # aggregate now includes the recovered rows on top of the original OK ones
    got = sum(n for m, n in zip(agg["msg_type"].to_pylist(),
                                agg["n_rows"].to_pylist()) if m == 0x2001)
    assert got == before_counts["0x2001"] + v99
