"""Skew handling: hot msg_type >=50% of rows (the north-rule fixture).

Routing is shuffle-free (each task writes its own per-sink files), so a hot
type cannot create a hot reducer; the aggregate paths handle hot keys via
per-batch combining (pre_aggregated) or key salting (aggregate_salted).
"""

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from engine.oracle import ERR_OK, OracleDecoder


def test_corpus_is_hot_skewed(sf_small):
    """The fixture corpus must exercise skew: one msg_type >= 50% of rows."""
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    o = OracleDecoder()
    counts = {}
    for toks in t["tokens"].to_pylist():
        p = o.parse_row(toks)
        if p["error_code"] == ERR_OK:
            counts[p["msg_type"]] = counts.get(p["msg_type"], 0) + 1
    hot = max(counts.values())
    assert hot / t.num_rows >= 0.5
    assert max(counts, key=counts.get) == 0x2001


def test_ngram_jaccard_gate_fixtures_never_cap(ray_session):
    """SQL_NGRAM_JACCARD hardcodes 'false AS capped' + a full pairwise
    join, while the engine's _BUCKET_CAP star fallback sets capped=true
    and drops qualifying non-anchor pairs.  Gate-scale equality therefore
    REQUIRES that no (source, lang, band) blocking group in the gate
    fixtures is ever capped — enforce it here so a future fixture change
    fails with a clear message, not a raw value-hash diff (advisor r3)."""
    from engine.dedup import q_ngram_jaccard_pairs
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        out = q_ngram_jaccard_pairs(sf)
        assert not any(out["capped"].to_pylist()), \
            (f"{sf}: a blocking group exceeded _BUCKET_CAP — the gated "
             "oracle (false AS capped, full pairwise) no longer matches "
             "the engine's star degrade; shrink the fixture group or "
             "raise _BUCKET_CAP")


def test_edit_distance_gate_fixtures_never_cap(ray_session):
    """SQL_EDIT_DISTANCE_PAIRS hardcodes 'false AS capped' + a full
    blocked join, while the engine truncates a (lang, bucket) group's
    candidates at _PAIR_CAP and flags the survivors.  Gate-scale equality
    therefore requires that no blocking group in the gate fixtures ever
    caps — enforce it here (same contract as the ngram-Jaccard test)."""
    from engine.editsim import q_edit_distance_pairs
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        out = q_edit_distance_pairs(sf)
        assert not out["capped"].any(), \
            (f"{sf}: a (lang, bucket) group exceeded _PAIR_CAP — the gated "
             "oracle no longer matches; shrink the group or raise the cap")


def test_routing_has_no_hot_task(ray_session, sf_small, tmp_path):
    """Shuffle-free fan-out: the hot sink's rows are spread across every
    batch's own output files — no single task owns the hot key."""
    import ray
    from engine import stages
    import pyarrow.parquet as pq
    ref = ray.put(pq.read_table(f"{sf_small}/source_meta.parquet"))
    out = str(tmp_path / "route")
    lin = stages.fused_stage(
        ray.data.read_parquet(f"{sf_small}/sequences"), out, "p0000", ref,
        batch_size=256)  # small batches so the tiny corpus yields many files
    tbl = pa.concat_tables(ray.get(lin.to_arrow_refs()))
    df = tbl.to_pandas()
    hot = df[df.sink == "0x2001"]
    # one output file per batch for the hot sink; max file share bounded by
    # batch size, not by key frequency
    assert hot["path"].nunique() >= 4
    per_file = hot.groupby("path")["rows"].sum()
    assert per_file.max() <= hot["rows"].sum() * 0.6


def test_salted_aggregate_on_extreme_skew(ray_session, tmp_path):
    """99%-single-key dataset: salted two-phase agg still exact."""
    import ray
    from engine import stages
    rng = np.random.default_rng(3)
    n = 20_000
    mt = np.where(rng.random(n) < 0.99, 0x2001, 0x3A11).astype(np.int32)
    ver = np.ones(n, dtype=np.int32)
    payload_words = 2
    toks = np.zeros((n, 4 + payload_words), dtype=np.int32)
    toks[:, 0] = mt
    toks[:, 1] = ver
    values = pa.array(toks.ravel(), type=pa.int32())
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * (4 + payload_words))
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)]),
        "tokens": pa.ListArray.from_arrays(offsets, values),
        "n_tok": pa.array(np.full(n, 4 + payload_words, dtype=np.int32)),
        "source": pa.array(["s0"] * n),
    })
    ds = ray.data.from_arrow(t)
    parsed = stages.parse_stage(ds)
    agg = stages.aggregate_salted(parsed, salt_buckets=16).to_pandas()
    got = {(r.source, r.msg_type): (int(r.n_rows), int(r.sum_n_tok))
           for r in agg.itertuples()}
    n_hot = int((mt == 0x2001).sum())
    assert got[("s0", 0x2001)] == (n_hot, n_hot * 6)
    assert got[("s0", 0x3A11)] == (n - n_hot, (n - n_hot) * 6)


def test_hash_exchange_lazy_survives_restore(ray_session):
    """collect=False returns a LAZY plan built under the hash-shuffle
    strategy; it must still execute after the global flag is restored
    (each Dataset deep-copies the DataContext at creation)."""
    import numpy as np
    import pyarrow as pa
    import ray
    from ray.data.context import ShuffleStrategy
    from engine.stages import hash_group_exchange

    t = pa.table({"k": np.arange(1000, dtype=np.int64) % 7,
                  "v": np.arange(1000, dtype=np.int64)})

    def per_part(b: pa.Table) -> pa.Table:
        ks = np.unique(b["k"].to_numpy())
        return pa.table({"k": pa.array(ks),
                         "n": pa.array(np.full(len(ks), b.num_rows))})

    ds = hash_group_exchange(lambda: ray.data.from_arrow(t), ["k"],
                             per_part, num_partitions=4, collect=False)
    ctx = ray.data.DataContext.get_current()
    assert ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE  # restored
    out = ds.to_pandas()                 # executes after the restore
    assert sorted(out["k"]) == list(range(7))


def test_hash_shuffle_partition_is_one_block(ray_session):
    """hash_group_exchange requires every (key) group to arrive WHOLE in
    one map_batches batch.  That holds because Ray 2.49's hash-shuffle
    aggregator finalizes each partition as a single block (splitting to
    target block size is an upstream TODO) and batch_size=None hands
    blocks through unsplit.  If a Ray upgrade starts splitting partition
    blocks, this canary fails loudly before any silent pair loss."""
    import numpy as np
    import pyarrow as pa
    import ray
    from engine.stages import hash_group_exchange

    n, nkeys = 50_000, 1_000
    t = pa.table({"k": (np.arange(n, dtype=np.int64) * 7919) % nkeys,
                  "v": np.arange(n, dtype=np.int64)})

    def audit(b: pa.Table) -> pa.Table:
        ks = np.unique(b["k"].to_numpy())
        return pa.table({"k": pa.array(ks),
                         "n_in_batch": pa.array(np.full(len(ks), 1,
                                                        dtype=np.int64))})

    out = hash_group_exchange(lambda: ray.data.from_arrow(t), ["k"],
                              audit, num_partitions=8)
    per_key = out.groupby("k")["n_in_batch"].sum()
    # every key seen in exactly ONE batch across the whole exchange
    assert (per_key == 1).all(), per_key[per_key > 1]
    assert len(per_key) == nkeys


def test_hash_exchange_empty_input(ray_session):
    """An empty upstream dataset must flow through the exchange and yield
    an empty result with the block fn's schema, not crash."""
    import numpy as np
    import pyarrow as pa
    import ray
    from engine.stages import hash_group_exchange

    t = pa.table({"k": pa.array([], type=pa.int64()),
                  "v": pa.array([], type=pa.int64())})
    schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        ks = np.unique(b["k"].to_numpy())
        return pa.table({"k": pa.array(ks),
                         "n": pa.array(np.full(len(ks), b.num_rows))})

    out = hash_group_exchange(lambda: ray.data.from_arrow(t), ["k"], f,
                              num_partitions=4)
    assert len(out) == 0


def test_skew_join_planted_hot_key(ray_session, tmp_path):
    """A key holding ~half the probe rows must be detected by the MG pass
    and joined map-side; output equals the native join bit-for-bit."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine import queries as q

    rng = np.random.default_rng(7)
    n_cold = 8000
    hot_key = 99_999
    lkey = np.concatenate([np.full(8000, hot_key, dtype=np.int64),
                           rng.integers(1, 2000, size=n_cold)])
    rng.shuffle(lkey)
    n = len(lkey)
    li = pa.table({
        "l_orderkey": pa.array(lkey),
        "l_extendedprice": pa.array(np.round(
            rng.uniform(1, 1000, size=n), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, size=n), 2)),
    })
    okeys = np.unique(np.concatenate([[hot_key],
                                      np.arange(1, 2000, dtype=np.int64)]))
    od = pa.table({
        "o_orderkey": pa.array(okeys),
        "o_orderpriority": pa.array(
            rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"], size=len(okeys))),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(od, str(tmp_path / "orders.parquet"))

    skew = q.q_order_revenue_skew_join(str(tmp_path))
    skew = skew.to_pandas() if hasattr(skew, "to_pandas") else skew
    assert q.LAST_SKEW_JOIN["hot_keys"] >= 1
    assert q.LAST_SKEW_JOIN["hot_rows"] == 8000   # the flood stayed map-side
    assert 0 <= q.LAST_SKEW_JOIN["cold_rows"] <= n_cold

    native = q.q_order_revenue_native_join(str(tmp_path))
    native = native.to_pandas() if hasattr(native, "to_pandas") else native

    def canon(df):
        return df.sort_values("o_orderpriority", ignore_index=True) \
            .astype({"revenue_cents": "int64", "n_items": "int64"})
    pd.testing.assert_frame_equal(canon(skew), canon(native))
