"""Token-sequence operators: hash-kernel pins, packing-kernel rebuild,
and planted-duplicate end-to-end (the gate mirror in test_queries.py
covers the DuckDB value-exactness of both queries)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

from engine.tokenops import (_BIN_TOKENS, _HP, _HSEED, pack_bins_block,
                             token_array_hash)


def _mix64_scalar(x: int) -> int:
    x &= (1 << 64) - 1
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & ((1 << 64) - 1)
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & ((1 << 64) - 1)
    return (x ^ (x >> 33)) & ((1 << 64) - 1)


def _hash_scalar(vals) -> int:
    """The sequential spec of token_array_hash: fold h <- h*P + mix(v)."""
    seed = int(_HSEED)
    h = 0
    for v in vals:
        h = (h * int(_HP) + _mix64_scalar((v & 0xFFFFFFFFFFFFFFFF)
                                          ^ seed)) & ((1 << 64) - 1)
    return _mix64_scalar(h ^ len(vals) ^ seed)


i32 = st.integers(-(2 ** 31), 2 ** 31 - 1)


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(st.lists(i32, max_size=12), min_size=1, max_size=8))
def test_token_hash_matches_scalar_fold(rows):
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    got = token_array_hash(arr)
    want = [_hash_scalar([v & 0xFFFFFFFFFFFFFFFF if v >= 0
                          else (v + (1 << 64)) & 0xFFFFFFFFFFFFFFFF
                          for v in np.array(r, dtype=np.int64)
                          .view(np.uint64).tolist()]) for r in rows]
    assert [int(g) for g in got] == want


def test_token_hash_position_and_length_sensitivity():
    def h(rows):
        return token_array_hash(pa.array(rows, type=pa.list_(pa.int32())))
    a, b = h([[1, 2], [2, 1]])
    assert a != b                         # permutation-distinct
    c, d = h([[5], [5, 0]])
    assert c != d                         # zero-pad-distinct
    e, f = h([[], [0]])
    assert e != f                         # empty vs single zero
    x, y = h([[7, 8, 9], [7, 8, 9]])
    assert x == y                         # deterministic


def test_pack_bins_block_matches_pandas_rebuild():
    rng = np.random.default_rng(7)
    n = 500
    t = pa.table({
        "doc_id": pa.array([f"doc-{i:09d}" for i in rng.permutation(n)]),
        "source": pa.array([f"src-{int(s)}" for s in rng.integers(0, 5, n)]),
        "n_tok": pa.array(rng.integers(0, 900, n).astype(np.int32)),
    })
    out = pack_bins_block(t).to_pandas()
    df = t.to_pandas().sort_values(["source", "doc_id"])
    prev = df.groupby("source")["n_tok"].cumsum() - df["n_tok"]
    df["bin"] = prev // _BIN_TOKENS
    df["bin_offset"] = prev % _BIN_TOKENS
    want = df[["doc_id", "source", "bin", "bin_offset"]] \
        .reset_index(drop=True)
    got = out.sort_values(["source", "doc_id"]).reset_index(drop=True)
    assert got.astype({"bin": int, "bin_offset": int}).equals(
        want.astype({"bin": int, "bin_offset": int}))
    # capacity invariant: offsets live inside the bin
    assert (out["bin_offset"] >= 0).all()
    assert (out["bin_offset"] < _BIN_TOKENS).all()


def test_sequence_dedup_collapses_planted_duplicate(ray_session):
    """The fixture corpus plants duplicate token arrays; dedup must
    collapse them (rows < corpus rows) and every survivor's copy count
    must sum back to the corpus size."""
    from engine.fixtures import ensure_fixtures
    import glob
    import pyarrow.parquet as pq

    from engine.tokenops import q_sequence_dedup
    fix = ensure_fixtures("sf0.001")
    total = sum(pq.read_metadata(f).num_rows
                for f in glob.glob(fix + "/sequences/*.parquet"))
    df = q_sequence_dedup("/root/testdata/sf0.001").to_pandas()
    assert len(df) < total
    assert df["n_copies"].sum() == total
    assert df["doc_id"].is_unique


def test_token_gram_hashes_match_scalar_fold():
    from engine.tokenops import _GOFF, _GP, _GRAM_N, token_gram_hashes
    rng = np.random.default_rng(3)
    rows = [rng.integers(-(2**31), 2**31, size=n).astype(np.int32).tolist()
            for n in [0, 5, 12, 13, 14, 20, 40]]
    got, gc = token_gram_hashes(pa.array(rows, type=pa.list_(pa.int32())))
    want = []
    for r in rows:
        for i in range(max(len(r) - _GRAM_N + 1, 0)):
            h = 0
            first = True
            for v in r[i:i + _GRAM_N]:
                vv = (v + (1 << 31)) & ((1 << 64) - 1)
                h = vv if first else (h * int(_GP) + vv) & ((1 << 64) - 1)
                first = False
            want.append(h)
    assert [int(x) for x in got] == want
    assert gc.tolist() == [max(len(r) - _GRAM_N + 1, 0) for r in rows]


def _bucket_of(doc_id: str) -> int:
    import hashlib
    return int.from_bytes(hashlib.md5(doc_id.encode()).digest()[:4],
                          "big") % 100


def test_sequence_decontaminate_detects_planted_overlap(ray_session,
                                                        tmp_path):
    """A train doc embedding a 13-token gram from a test doc must flag
    contaminated; a near-miss (12 shared tokens) must not.  The planted
    corpus also re-checks the DuckDB oracle with the path substituted."""
    import duckdb
    import pyarrow.parquet as pq

    from engine.corpus import _TRAIN_LT, _VAL_LT
    from engine.tokenops import (_GRAM_N, _sql_sequence_decontaminate,
                                 q_sequence_decontaminate)

    ids = [f"pl-{i:05d}" for i in range(400)]
    train = [d for d in ids if _bucket_of(d) < _TRAIN_LT]
    test = [d for d in ids if _bucket_of(d) >= _VAL_LT]
    assert len(train) >= 3 and len(test) >= 1
    rng = np.random.default_rng(11)
    gram = rng.integers(-(2**31), 2**31, size=_GRAM_N).astype(np.int32)

    rows = {}
    for d in ids:
        rows[d] = rng.integers(-(2**31), 2**31, size=16).astype(np.int32)
    # test doc carries the gram; one train doc embeds it mid-array,
    # another embeds only 12 of its 13 tokens
    rows[test[0]] = np.concatenate([rows[test[0]][:3], gram]).astype(np.int32)
    hot, near = train[0], train[1]
    rows[hot] = np.concatenate([rows[hot][:5], gram,
                                rows[hot][:2]]).astype(np.int32)
    rows[near] = np.concatenate([gram[:_GRAM_N - 1],
                                 rows[near][:6]]).astype(np.int32)
    t = pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.array([rows[d].tolist() for d in ids],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(rows[d]) for d in ids], type=pa.int32()),
        "source": pa.array(["src-0"] * len(ids)),
    })
    path = str(tmp_path / "seq.parquet")
    pq.write_table(t, path)

    df = q_sequence_decontaminate("unused", seq_path=path).to_pandas() \
        .set_index("doc_id")
    assert bool(df.loc[hot, "contaminated"])
    assert df.loc[hot, "n_hits"] == 1
    assert not bool(df.loc[near, "contaminated"])
    assert test[0] not in df.index          # eval side never in the output
    want = duckdb.sql(
        _sql_sequence_decontaminate(f"read_parquet('{path}')")).df()
    cols = sorted(want.columns)
    a = df.reset_index()[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype(object).equals(b.astype(object))


def test_prepare_sequences_composite_equals_stagewise(ray_session,
                                                      tmp_path):
    """prepare_sequences_to_parquet output ids == (train split) ∩
    (dedup survivors) − (contaminated), each recomputed from the gated
    single-op queries; manifest counts consistent; sharded layout."""
    import json
    import os

    import pyarrow.parquet as pq

    from engine.fixtures import ensure_fixtures
    from engine.tokenops import (prepare_sequences_to_parquet,
                                 q_sequence_decontaminate, q_sequence_dedup,
                                 _seq_split_bucket)
    from engine.corpus import _TRAIN_LT

    fix = ensure_fixtures("sf0.001")
    out = str(tmp_path / "prep_seq")
    man = prepare_sequences_to_parquet(os.path.join(fix, "sequences"), out,
                                       num_shards=4)
    got = set(pq.read_table(out, columns=["doc_id"])["doc_id"].to_pylist())

    sf = "/root/testdata/sf0.001"
    surv = set(q_sequence_dedup(sf).to_pandas()["doc_id"])
    dec = q_sequence_decontaminate(sf).to_pandas()
    cont = set(dec[dec["contaminated"]]["doc_id"])
    all_ids = pq.read_table(os.path.join(fix, "sequences"),
                            columns=["doc_id"])["doc_id"]
    b = _seq_split_bucket(all_ids.combine_chunks())
    train = {d for d, bb in zip(all_ids.to_pylist(), b) if bb < _TRAIN_LT}
    want = (train & surv) - cont
    assert got == want
    assert man["train_prepared_sequences"] == len(want)
    assert man["dedup_survivors"] == len(surv)
    with open(os.path.join(out, "_prepare_manifest.json")) as f:
        assert json.load(f) == man
    shards = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert shards and len(shards) <= 4
    import time
    t0 = time.time()
    assert prepare_sequences_to_parquet(os.path.join(fix, "sequences"),
                                        out, num_shards=4) == man
    assert time.time() - t0 < 2.0


def test_sequence_decontaminate_fast_detects_planted_overlap(ray_session,
                                                             tmp_path):
    """The md5-free split-bucket twin: same gram logic, C-level bucket.
    Detection pinned on a planted corpus whose hot/near/test roles are
    derived with the SAME fast bucket rule."""
    import pyarrow.parquet as pq

    from engine.corpus import _TRAIN_LT, _VAL_LT
    from engine.tokenops import (_GRAM_N, _seq_split_bucket_fast,
                                 q_sequence_decontaminate)

    ids = [f"pf-{i:05d}" for i in range(400)]
    b = _seq_split_bucket_fast(pa.array(ids))
    train = [d for d, bb in zip(ids, b) if bb < _TRAIN_LT]
    test = [d for d, bb in zip(ids, b) if bb >= _VAL_LT]
    assert len(train) >= 2 and len(test) >= 1
    rng = np.random.default_rng(13)
    gram = rng.integers(-(2**31), 2**31, size=_GRAM_N).astype(np.int32)
    rows = {d: rng.integers(-(2**31), 2**31, size=16).astype(np.int32)
            for d in ids}
    rows[test[0]] = np.concatenate([gram, rows[test[0]][:2]]) \
        .astype(np.int32)
    hot = train[0]
    rows[hot] = np.concatenate([rows[hot][:4], gram]).astype(np.int32)
    t = pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.array([rows[d].tolist() for d in ids],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(rows[d]) for d in ids], type=pa.int32()),
        "source": pa.array(["src-0"] * len(ids)),
    })
    path = str(tmp_path / "seqf.parquet")
    pq.write_table(t, path)
    df = q_sequence_decontaminate("unused", seq_path=path, bucket="fast") \
        .to_pandas().set_index("doc_id")
    assert bool(df.loc[hot, "contaminated"])
    assert test[0] not in df.index
    # fast and md5 buckets are DIFFERENT deterministic rules
    from engine.tokenops import _seq_split_bucket
    assert (_seq_split_bucket(pa.array(ids)) != b).any()
    assert (df.index == sorted(
        d for d, bb in zip(ids, b) if bb < _VAL_LT)).all()
