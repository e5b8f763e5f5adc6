"""The prepare composites' semi-join regime (round-5 #1).

VERDICT r4's last hard ``NotImplementedError``: past ``ID_BROADCAST_MAX``
the prepare composites used to raise instead of switching to the
hash-partitioned semi-join proven in ``curate_to_parquet``.  These tests
pin the replacement:

* both composites produce BYTE-IDENTICAL sharded parquet through the
  broadcast and semi-join regimes (rows AND shard layout);
* lowering ``ID_BROADCAST_MAX`` below the fixture survivor count makes
  the auto-switch engage with ZERO driver-resident id bytes;
* the gated ``q_prepare_*`` queries return identical tables either way.
"""

import os

import pyarrow.dataset as pads
import pytest

SF_DIR = "/root/testdata/sf0.001"
DOCS = os.path.join(SF_DIR, "documents.parquet")


def _sharded_table(path):
    return pads.dataset(path, partitioning="hive").to_table() \
        .sort_by("doc_id")


def test_prepare_corpus_semijoin_equals_broadcast(ray_session, tmp_path,
                                                  monkeypatch):
    from engine import curate, prepare

    mb = prepare.prepare_to_parquet(DOCS, str(tmp_path / "b"),
                                    num_shards=4, method="broadcast")
    assert prepare.LAST_PREPARE["mode"] == "broadcast"
    assert prepare.LAST_PREPARE["driver_bytes"] == 8 * (
        mb["curated_docs"] + mb["contaminated_docs"])
    ms = prepare.prepare_to_parquet(DOCS, str(tmp_path / "s"),
                                    num_shards=4, method="semijoin")
    assert prepare.LAST_PREPARE["mode"] == "semijoin"
    assert prepare.LAST_PREPARE["driver_bytes"] == 0
    assert (mb["method"], ms["method"]) == ("broadcast", "semijoin")
    for k in ("input_docs", "curated_docs", "contaminated_docs",
              "train_prepared_docs"):
        assert mb[k] == ms[k], k
    assert mb["train_prepared_docs"] > 0
    tb = _sharded_table(str(tmp_path / "b"))
    ts = _sharded_table(str(tmp_path / "s")).select(tb.column_names)
    assert tb.equals(ts)            # identical rows AND shard layout

    # the auto-switch engages past the (monkeypatched) broadcast cap
    monkeypatch.setattr(curate, "ID_BROADCAST_MAX", 1)
    ma = prepare.prepare_to_parquet(DOCS, str(tmp_path / "a"),
                                    num_shards=4)
    assert ma["method"] == "semijoin"
    assert ma["train_prepared_docs"] == mb["train_prepared_docs"]
    assert _sharded_table(str(tmp_path / "a")).equals(tb)


def test_prepare_sequences_semijoin_equals_broadcast(ray_session, tmp_path,
                                                     monkeypatch, sf_small):
    from engine import curate, tokenops

    seq_dir = os.path.join(sf_small, "sequences")
    mb = tokenops.prepare_sequences_to_parquet(
        seq_dir, str(tmp_path / "b"), num_shards=4, method="broadcast")
    assert tokenops.LAST_PREPARE_SEQ["mode"] == "broadcast"
    assert tokenops.LAST_PREPARE_SEQ["driver_bytes"] == 16 * (
        mb["dedup_survivors"] + mb["contaminated"])
    ms = tokenops.prepare_sequences_to_parquet(
        seq_dir, str(tmp_path / "s"), num_shards=4, method="semijoin")
    assert tokenops.LAST_PREPARE_SEQ["mode"] == "semijoin"
    assert tokenops.LAST_PREPARE_SEQ["driver_bytes"] == 0
    for k in ("input_sequences", "dedup_survivors", "contaminated",
              "train_prepared_sequences"):
        assert mb[k] == ms[k], k
    assert mb["train_prepared_sequences"] > 0
    tb = _sharded_table(str(tmp_path / "b"))
    ts = _sharded_table(str(tmp_path / "s")).select(tb.column_names)
    assert tb.equals(ts)            # identical rows AND shard layout

    monkeypatch.setattr(curate, "ID_BROADCAST_MAX", 1)
    ma = tokenops.prepare_sequences_to_parquet(
        seq_dir, str(tmp_path / "a"), num_shards=4)
    assert ma["method"] == "semijoin"
    assert _sharded_table(str(tmp_path / "a")).equals(tb)


def test_prepare_queries_regime_identical(ray_session):
    """The gated composites answer identically through either regime —
    the value gate therefore covers the semi-join plan too."""
    from engine import prepare, tokenops

    b = prepare.q_prepare_corpus(SF_DIR, method="broadcast")
    s = prepare.q_prepare_corpus(SF_DIR, method="semijoin")
    assert b.equals(s) and b.num_rows > 0
    bs = tokenops.q_prepare_sequences(SF_DIR, method="broadcast")
    ss = tokenops.q_prepare_sequences(SF_DIR, method="semijoin")
    assert bs.equals(ss) and bs.num_rows > 0


def test_tokens_binary_pack_roundtrip():
    """The large_binary reinterpretation that rides tokens through the
    Acero joins is exact on ragged/empty/sliced inputs."""
    import numpy as np
    import pyarrow as pa

    from engine.tokenops import _pack_tokens_bin, _unpack_tokens_bin

    rng = np.random.default_rng(20260819)
    lists = [rng.integers(-2**31, 2**31 - 1, size=rng.integers(0, 40),
                          dtype=np.int32).tolist() for _ in range(300)]
    t = pa.table({"doc_id": [f"d{i}" for i in range(300)],
                  "tokens": pa.array(lists, type=pa.list_(pa.int32())),
                  "n_tok": pa.array([len(x) for x in lists], pa.int32())})
    for view in (t, t.slice(37, 111), t.slice(0, 0)):
        packed = _pack_tokens_bin(view)
        assert packed["tokens_bin"].type == pa.large_binary()
        back = _unpack_tokens_bin(packed)
        assert back.column_names == view.column_names
        assert back.equals(view.combine_chunks() if view.num_rows
                           else back)  # empty: schema-level check below
        assert back["tokens"].type == pa.list_(pa.int32())
        if view.num_rows:
            assert back["tokens"].to_pylist() == view["tokens"].to_pylist()


def test_seq_shard_fast_twin(ray_session, tmp_path, sf_small):
    """The C-level shard-hash twin (round-5 #3): same KEPT ROW SET as the
    md5 default (sharding only relocates rows), deterministic placement,
    all shards in range."""
    import numpy as np
    import pyarrow as pa

    from engine import tokenops

    ids = pa.array([f"doc{i}" for i in range(500)])
    s1 = tokenops._seq_shard(ids, 8, "fast")
    s2 = tokenops._seq_shard(ids, 8, "fast")
    assert np.array_equal(s1, s2)
    assert s1.min() >= 0 and s1.max() < 8 and len(np.unique(s1)) > 1

    seq_dir = os.path.join(sf_small, "sequences")
    mm = tokenops.prepare_sequences_to_parquet(
        seq_dir, str(tmp_path / "md5"), num_shards=4)
    mf = tokenops.prepare_sequences_to_parquet(
        seq_dir, str(tmp_path / "fast"), num_shards=4, shard_hash="fast")
    tm = _sharded_table(str(tmp_path / "md5")).drop_columns(["shard"])
    tf = _sharded_table(str(tmp_path / "fast")).drop_columns(["shard"]) \
        .select(tm.column_names)
    assert tm.equals(tf)            # same rows, placement may differ
    assert mm["train_prepared_sequences"] == mf["train_prepared_sequences"]


def test_scrub_empty_blocks_drops_zero_row_blocks(ray_session):
    """Regression for the Ray 2.49 sparse-side join hazard: a zero-row
    FIRST block swallows the join's schema broadcast, so partitions
    receiving no real row finalize as zero-column tables (ArrowInvalid).
    scrub_empty_blocks must drop zero-row blocks (alongside schema-less
    ones) and the scrubbed sparse-side join must be correct even when
    most partitions receive no real right-side rows."""
    import pyarrow as pa
    import ray

    from engine.pipeline import scrub_empty_blocks

    schema = pa.schema([("doc_id", pa.int64())])
    blocks = [schema.empty_table(),                     # empty FIRST
              pa.table({"doc_id": pa.array([2, 3], type=pa.int64())}),
              schema.empty_table(),
              pa.table({}),                             # schema-less
              pa.table({"doc_id": pa.array([5], type=pa.int64())})]
    sparse = ray.data.from_arrow_refs([ray.put(b) for b in blocks])
    clean = scrub_empty_blocks(sparse, schema)
    shapes = [(t.num_rows, t.num_columns)
              for t in (ray.get(r) for r in clean.to_arrow_refs())]
    assert all(r > 0 and c == 1 for r, c in shapes)     # empties gone
    assert sum(r for r, _ in shapes) == 3

    left = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(64)), type=pa.int64()),
        "x": pa.array(list(range(64)), type=pa.int64())})).repartition(8)
    j = left.join(clean, "left_semi", num_partitions=16, on=("doc_id",))
    assert sorted(r["doc_id"] for r in j.take_all()) == [2, 3, 5]

    # all-empty side degrades to a schema-carrying empty dataset
    allempty = scrub_empty_blocks(
        ray.data.from_arrow_refs([ray.put(schema.empty_table())]), schema)
    assert allempty.count() == 0
    assert allempty.schema().names == ["doc_id"]
