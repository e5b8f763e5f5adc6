"""Property test: the vectorized bipartite LSH bucket stage
(`decontam._xnear_block`) equals a per-bucket Python reference on random
partitions — including capped buckets, single-side buckets, duplicate
chashes and empty input.  Pure function, no Ray."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from engine.decontam import _XNEAR_TAU_MILLI, _xnear_block
from engine.dedup import _BUCKET_CAP, _N_PERM


def _mk_table(rows):
    n = len(rows)
    sig_bytes = b"".join(r["sig"].tobytes() for r in rows)
    sig = pa.Array.from_buffers(pa.binary(2 * _N_PERM), n,
                                [None, pa.py_buffer(sig_bytes)])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
        "band": pa.array([r["band"] for r in rows], type=pa.int32()),
        "key": pa.array([r["key"] for r in rows], type=pa.int64()),
        "chash": pa.array([r["chash"] for r in rows], type=pa.int64()),
        "incoming": pa.array([r["incoming"] for r in rows]),
        "sig": sig,
    })


def _reference(rows):
    """Per-bucket Python: incoming x (<=CAP min-id existing), signature
    agreement, exact by chash."""
    buckets = {}
    for r in rows:
        buckets.setdefault((r["band"], r["key"]), []).append(r)
    out = []
    for members in buckets.values():
        exist = sorted((m for m in members if not m["incoming"]),
                       key=lambda m: m["doc_id"])
        inc = [m for m in members if m["incoming"]]
        capped = len(exist) > _BUCKET_CAP
        kept = exist[:_BUCKET_CAP]
        for i in inc:
            for e in kept:
                agree = int((i["sig"] == e["sig"]).sum())
                jacc = int(np.rint(agree / _N_PERM * 1000))
                exact = i["chash"] == e["chash"]
                if jacc >= _XNEAR_TAU_MILLI or exact:
                    out.append((i["doc_id"], e["doc_id"],
                                1000 if exact else jacc, exact, capped))
    return sorted(out)


@st.composite
def _partition(draw):
    n_buckets = draw(st.integers(0, 5))
    rows = []
    next_id = 0
    for b in range(n_buckets):
        band = draw(st.integers(0, 2))
        key = draw(st.integers(-3, 3))
        # a few shared signature prototypes force near/exact matches
        protos = [np.full(_N_PERM, p, dtype=np.uint16) for p in (1, 2)]
        for _ in range(draw(st.integers(1, 6))):
            proto = draw(st.sampled_from([0, 1, 2]))
            if proto == 0:
                sig = np.asarray(draw(st.lists(
                    st.integers(0, 65535), min_size=_N_PERM,
                    max_size=_N_PERM)), dtype=np.uint16)
            else:
                sig = protos[proto - 1].copy()
                flips = draw(st.integers(0, 40))
                sig[:flips] += 7  # degrade agreement by `flips` components
            rows.append({
                "doc_id": next_id,
                "band": band, "key": key,
                "chash": draw(st.integers(0, 2)),
                "incoming": draw(st.booleans()),
                "sig": sig,
            })
            next_id += 1
    return rows


@settings(max_examples=120, deadline=None)
@given(_partition())
def test_xnear_block_equals_reference(rows):
    got = _xnear_block(_mk_table(rows))
    got_rows = sorted(zip(got["doc_id"].to_pylist(),
                          got["matched_id"].to_pylist(),
                          got["jaccard_milli"].to_pylist(),
                          got["exact"].to_pylist(),
                          got["capped"].to_pylist()))
    assert got_rows == _reference(rows)


def test_xnear_block_capped_bucket():
    """One bucket with > _BUCKET_CAP existing members: only the CAP
    min-id members are candidates and survivors carry capped=True."""
    sig = np.full(_N_PERM, 9, dtype=np.uint16)
    rows = [{"doc_id": i, "band": 0, "key": 0, "chash": 1,
             "incoming": False, "sig": sig}
            for i in range(_BUCKET_CAP + 10)]
    rows.append({"doc_id": 10_000, "band": 0, "key": 0, "chash": 1,
                 "incoming": True, "sig": sig})
    got = _xnear_block(_mk_table(rows)).to_pandas()
    assert len(got) == _BUCKET_CAP
    assert got["capped"].all() and got["exact"].all()
    assert got["matched_id"].max() == _BUCKET_CAP - 1  # min-id kept side
