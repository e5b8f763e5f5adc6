"""Edit-distance (Levenshtein) near-duplicate pairs over the documents
table — the character-level near-dup family, complementing the set-based
families in engine/dedup.py (MinHash/SimHash/n-gram Jaccard) and the
embedding family in engine/simsearch.py.

Contract (mirrored exactly by the DuckDB oracle): candidate pairs share
``lang`` and differ by at most ``LEN_WINDOW`` in ``n_chars``; the distance
is byte-level Levenshtein over the UTF-8 bytes of each document's first
``PREFIX_CHARS`` characters (DuckDB's ``levenshtein`` is byte-based —
verified: levenshtein('é','a') = 2 — and ``substr`` is character-based;
``pc.utf8_slice_codeunits`` matches ``substr`` exactly).  Pairs with
distance <= ``MAX_DIST`` are emitted as (doc_a < doc_b, lev32, capped).

Scale design — full texts never shuffle and no side is broadcast:

* Each doc emits TWO tiny rows (doc_id, n_chars, 32-char prefix) keyed by
  (lang, floor(n_chars/LEN_WINDOW) + {0,1}) — the overlapping-bucket
  banding of dedup.q_ngram_jaccard_pairs: a pair within LEN_WINDOW chars
  has floor-buckets differing by <= 1, so it co-occurs in at least one
  bucket, and emitting ONLY from bucket == max(floor_a, floor_b) yields
  each pair exactly once with no post-dedup exchange.
* One hash exchange on (lang, bucket) co-locates candidates; the
  partition kernel generates length-windowed pairs from ONE sort (no
  per-group Python) and runs a single batched DP over all pairs at once
  (two vector ops per DP cell, O(P) wide) — no per-pair Python.
* Groups are candidate-capped (``_PAIR_CAP`` per (lang, bucket),
  deterministic doc_id order) and capped pairs are flagged, never silent;
  the gate fixtures are asserted uncapped (tests/test_skew.py pattern).
  At 100 TB the blocking key should gain a content prefix (e.g. first
  8 bytes) — length-only blocking keeps boilerplate floods in one group.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine.io import read_parquet_clean

PREFIX_CHARS = 32
LEN_WINDOW = 8
MAX_DIST = 8
_PAIR_CAP = 20_000

_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                     ("lev32", pa.int64()), ("capped", pa.bool_())])


def batched_levenshtein(a_bytes: np.ndarray, a_len: np.ndarray,
                        b_bytes: np.ndarray, b_len: np.ndarray) -> np.ndarray:
    """Levenshtein distance for P byte-string pairs at once.

    ``a_bytes``/``b_bytes`` are (P, W) uint8 padded matrices, lengths in
    ``a_len``/``b_len``.  Classic DP, vectorized across the PAIR axis:
    the (i, j) loops run over the padded width (bounded by W^2 cells) but
    every cell update is one fused numpy expression over all P pairs."""
    p = len(a_len)
    if p == 0:
        return np.zeros(0, dtype=np.int64)
    wa = int(a_len.max())
    wb = int(b_len.max())
    ans = np.where(a_len == 0, b_len, 0).astype(np.int64)
    prev = np.broadcast_to(np.arange(wb + 1, dtype=np.int64),
                           (p, wb + 1)).copy()
    take0 = a_len == 0
    for i in range(1, wa + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = a_bytes[:, i - 1]
        for j in range(1, wb + 1):
            cost = (ai != b_bytes[:, j - 1]).astype(np.int64)
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1,
                                              cur[:, j - 1] + 1),
                                   prev[:, j - 1] + cost)
        done = a_len == i
        if done.any():
            ans[done] = cur[done, b_len[done]]
        prev = cur
    return np.where(take0, b_len.astype(np.int64), ans)


def _pad_bytes(prefixes: pa.ChunkedArray | pa.Array):
    """(P, W) uint8 padded matrix + lengths, straight off the Arrow binary
    array's offset/data buffers with one vectorized scatter — no
    per-string Python."""
    arr = prefixes.combine_chunks() if isinstance(
        prefixes, pa.ChunkedArray) else prefixes
    p = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset:arr.offset + p + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    w = int(lens.max()) if p else 0
    mat = np.zeros((p, w), dtype=np.uint8)
    row = np.repeat(np.arange(p, dtype=np.int64), lens)
    pos = np.arange(offs[0], offs[-1], dtype=np.int64)
    col = pos - np.repeat(offs[:-1], lens)
    mat[row, col] = data[pos]
    return mat, lens


def pairs_block(t: pa.Table) -> pa.Table:
    """Per-partition kernel: one sort by (lang, bucket, n_chars, doc_id),
    length-windowed candidate generation by sorted-neighbor offsets, the
    max-floor emit rule, a deterministic per-group candidate cap, then one
    batched DP over every surviving pair."""
    n = t.num_rows
    if n == 0:
        return _SCHEMA.empty_table()
    idx = pc.sort_indices(t, sort_keys=[("lang", "ascending"),
                                        ("bucket", "ascending"),
                                        ("n_chars", "ascending"),
                                        ("doc_id", "ascending")])
    t = t.take(idx)
    lang = t["lang"].to_numpy(zero_copy_only=False)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    nc = t["n_chars"].to_numpy(zero_copy_only=False)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    gid = np.cumsum(np.concatenate(
        [[True], (lang[1:] != lang[:-1]) | (bucket[1:] != bucket[:-1])])) - 1

    ia, ib = [], []
    d = 1
    while d < n:
        ok = (gid[d:] == gid[:-d]) & (nc[d:] - nc[:-d] <= LEN_WINDOW)
        hits = np.flatnonzero(ok)
        if len(hits) == 0:
            # any same-group in-window pair at offset d' > d contains the
            # same-group sub-pair (i, i+d) with a gap no larger (n_chars
            # sorted within group) — no hits here means none later either
            break
        ia.append(hits)
        ib.append(hits + d)
        d += 1
    if not ia:
        return _SCHEMA.empty_table()
    ia = np.concatenate(ia)
    ib = np.concatenate(ib)

    # emit exactly once: only from the pair's max floor-bucket
    fa = nc[ia] // LEN_WINDOW
    fb = nc[ib] // LEN_WINDOW
    emit = np.maximum(fa, fb) == bucket[ia]
    ia, ib = ia[emit], ib[emit]
    if len(ia) == 0:
        return _SCHEMA.empty_table()

    # orient (doc_a < doc_b), then a deterministic per-group candidate cap
    a_first = doc[ia] < doc[ib]
    pa_idx = np.where(a_first, ia, ib)
    pb_idx = np.where(a_first, ib, ia)
    g = gid[ia]
    order = np.lexsort((doc[pb_idx], doc[pa_idx], g))
    pa_idx, pb_idx, g = pa_idx[order], pb_idx[order], g[order]
    new_g = np.concatenate([[True], g[1:] != g[:-1]])
    starts = np.flatnonzero(new_g)
    rank = np.arange(len(g)) - starts[np.cumsum(new_g) - 1]
    group_capped = np.zeros(len(g), dtype=bool)
    over = rank >= _PAIR_CAP
    if over.any():
        capped_groups = np.unique(g[over])
        group_capped = np.isin(g, capped_groups)
        keep = ~over
        pa_idx, pb_idx = pa_idx[keep], pb_idx[keep]
        group_capped = group_capped[keep]

    amat, alen = _pad_bytes(t["prefix"])
    dist = batched_levenshtein(amat[pa_idx], alen[pa_idx],
                               amat[pb_idx], alen[pb_idx])
    keep = dist <= MAX_DIST
    return pa.table({"doc_a": pa.array(doc[pa_idx][keep]),
                     "doc_b": pa.array(doc[pb_idx][keep]),
                     "lev32": pa.array(dist[keep]),
                     "capped": pa.array(group_capped[keep])})


def q_edit_distance_pairs(sf_dir: str):
    """Levenshtein near-dup pairs: same-lang docs within LEN_WINDOW chars
    whose 32-char-prefix byte edit distance is <= MAX_DIST."""
    from engine.stages import hash_group_exchange

    path = os.path.join(sf_dir, "documents.parquet")
    nrows = pq.read_metadata(path).num_rows

    def emit(t: pa.Table) -> pa.Table:
        prefix = pc.cast(
            pc.utf8_slice_codeunits(t["text"], 0, PREFIX_CHARS),
            pa.binary())
        base = pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "lang": t["lang"],
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
            "prefix": prefix,
            "bucket": pc.cast(
                pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()),
                                   float(LEN_WINDOW))), pa.int64())})
        up = base.set_column(
            base.schema.get_field_index("bucket"), "bucket",
            pc.add(base["bucket"], 1))
        return pa.concat_tables([base, up])

    df = hash_group_exchange(
        lambda: read_parquet_clean(path, columns=[
            "doc_id", "text", "lang", "n_chars"])
        .map_batches(emit, batch_format="pyarrow"),
        ["lang", "bucket"], pairs_block, collect=True,
        rows_hint=2 * nrows)
    if df.empty:      # all partitions empty -> schema-less column-less frame
        return _SCHEMA.empty_table().to_pandas()
    return df.sort_values(["doc_a", "doc_b"], ignore_index=True).astype(
        {"doc_a": "int64", "doc_b": "int64", "lev32": "int64"})


SQL_EDIT_DISTANCE_PAIRS = """
SELECT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b,
       levenshtein(substr(a.text, 1, 32), substr(b.text, 1, 32))::BIGINT
           AS lev32,
       false AS capped
FROM documents a
JOIN documents b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 AND abs(a.n_chars - b.n_chars) <= 8
WHERE levenshtein(substr(a.text, 1, 32), substr(b.text, 1, 32)) <= 8
"""
