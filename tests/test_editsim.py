"""Edit-distance near-dup: batched DP vs scalar reference, exactly-once
pair emission vs brute force, and capped-flag plumbing."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from engine.editsim import (LEN_WINDOW, MAX_DIST, PREFIX_CHARS,
                            batched_levenshtein, _pad_bytes)


def _lev_ref(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=80, deadline=None)
@given(data=st.data())
def test_batched_levenshtein_random_vs_scalar(data):
    n = data.draw(st.integers(min_value=1, max_value=12))
    pairs = [(data.draw(st.binary(min_size=0, max_size=20)),
              data.draw(st.binary(min_size=0, max_size=20)))
             for _ in range(n)]
    a = pa.array([p[0] for p in pairs], pa.binary())
    b = pa.array([p[1] for p in pairs], pa.binary())
    amat, alen = _pad_bytes(a)
    bmat, blen = _pad_bytes(b)
    got = batched_levenshtein(amat, alen, bmat, blen)
    want = [_lev_ref(x, y) for x, y in pairs]
    assert got.tolist() == want


def test_pad_bytes_sliced_array():
    """Offset-carrying (sliced) arrays read the right buffer window."""
    arr = pa.array([b"abc", b"", b"xyzw", b"q"], pa.binary()).slice(1, 3)
    mat, lens = _pad_bytes(arr)
    assert lens.tolist() == [0, 4, 1]
    assert bytes(mat[1, :4]) == b"xyzw"
    assert bytes(mat[2, :1]) == b"q"


def test_pairs_exactly_once_vs_brute_force(ray_session, tmp_path):
    """Random corpus: the banded exchange finds each qualifying pair
    exactly once, matching the quadratic reference on (blocking rule +
    prefix distance)."""
    from engine.editsim import q_edit_distance_pairs

    rng = np.random.default_rng(7)
    base = "the quick brown fox jumps over the lazy dog " * 3
    texts, langs = [], []
    for i in range(80):
        # mutate a shared template so near-dups exist at varied lengths
        k = rng.integers(0, 10)
        s = base[:40 + int(rng.integers(0, 12))]
        s = s[:k] + ("X" if rng.random() < 0.5 else "") + s[k:]
        texts.append(s)
        langs.append(["en", "de"][int(rng.integers(0, 2))])
    t = pa.table({"doc_id": pa.array(range(80), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(langs),
                  "source": pa.array(["s"] * 80),
                  "n_chars": pa.array([len(s) for s in texts], pa.int64())})
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))

    out = q_edit_distance_pairs(str(tmp_path))
    got = sorted(zip(out["doc_a"], out["doc_b"], out["lev32"]))

    want = []
    for i in range(80):
        for j in range(i + 1, 80):
            if langs[i] != langs[j]:
                continue
            if abs(len(texts[i]) - len(texts[j])) > LEN_WINDOW:
                continue
            d = _lev_ref(texts[i][:PREFIX_CHARS].encode(),
                         texts[j][:PREFIX_CHARS].encode())
            if d <= MAX_DIST:
                want.append((i, j, d))
    assert got == sorted(want)
    assert len(want) > 0          # the corpus actually exercised the path
    assert not out["capped"].any()
