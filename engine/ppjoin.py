"""Exact all-pairs similarity join via prefix filtering (PPJoin-style).

The sixth near-dup family, and the only EXACT one with no blocking loss:
``q_ppjoin_pairs`` returns every unordered document pair whose distinct
word-set Jaccard is >= tau (0.5), guaranteed complete — unlike
MinHash/SimHash (probabilistic) and the size-banded Jaccard blocking
(capped groups).  The candidate bound comes from the prefix-filter
principle (Chaudhuri et al. ICDE'06; Xiao et al. WWW'08 "PPJoin"): order
every doc's tokens by ascending global document frequency; two sets with
Jaccard >= tau MUST share a token inside their (s - ceil(tau*s) + 1)
prefixes, so only prefix tokens are indexed and probed — and prefix
tokens are by construction the corpus's RAREST, so posting lists stay
short exactly where a naive token index explodes.

Plan — five bounded stages, text tokenized by the engine-wide RE2-exact
splitter (engine/text.py) and hashed, never shuffled raw:

1. map: per-batch distinct (token-hash, doc, set-size) rows
2. exchange keyed h: attach df (= posting length) to every row
3. exchange keyed doc: sort each doc's tokens by (df, h), keep the
   prefix; rows out = prefix tokens only (~(1 - tau) of the index)
4. exchange keyed h over prefixes: expand each posting into candidate
   pairs (vectorized segment k-choose-2), pre-filtered by the length
   condition tau * |larger| <= |smaller|
5. two verify exchanges keyed doc_a then doc_b: each pair row picks up
   the full sorted token-hash set of one side (sets re-derived by a
   pure map over documents — one extra tokenize instead of a
   materialized token index), then exact |intersection| via per-pair
   sorted intersect.  Duplicate candidates collapse in stage 5a (all
   (a, *) rows co-locate).

Scale notes (100 TB): stages 1-4 move (int64, int64, int64) rows —
distinct-token volume, then its prefix subset; stage 5 moves each doc's
hash set once per side (2x distinct-token volume).  Worst case remains
a token whose PREFIX posting floods (a corpus of near-identical tiny
docs): the segment expansion there is df^2 — the documented cap hook is
the same ``_BUCKET_CAP`` star fallback as engine/dedup.py, deliberately
NOT enabled by default because this operator's contract is exactness
(ADVICE r3: a silent cap breaks the value gate).

DuckDB-gated: the oracle is the O(n^2) token self-join — the engine must
reproduce it exactly, prefix filter and all.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TAU_MILLI = 500          # Jaccard threshold (milli)

_SET_T = pa.list_(pa.int64())
_UNION_SCHEMA = pa.schema([
    ("key", pa.int64()), ("other", pa.int64()), ("kind", pa.int8()),
    ("s", pa.int64()), ("set", _SET_T), ("capped", pa.int8())])
_PAIR_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()),
    ("jaccard_milli", pa.int64()), ("capped", pa.int8())])


def _docs(sf_dir: str):
    from engine.io import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])


def _doc_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows


def _distinct_tokens(t: pa.Table):
    """(doc ids repeated per distinct token, token hashes, per-doc
    distinct counts aligned to the batch) — lowercased, zero-length
    split artifacts dropped (the oracle's \\S+ has no empty matches)."""
    import pandas as pd

    from engine.text import _segment_sums, _split_tokens
    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(txt, ""))
    flat, offs = _split_tokens(low)
    # empty-text docs contribute one ''-token split artifact: drop it
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    wh = pd.util.hash_pandas_object(
        pd.Series(flat.to_pandas()), index=False).to_numpy() \
        .view(np.int64)[keep]
    counts = _segment_sums(keep.astype(np.int64), offs)
    ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
    doc = np.repeat(ids, counts)
    order = np.lexsort((wh, doc))
    d2, h2 = doc[order], wh[order]
    new = np.ones(len(d2), dtype=bool)
    if len(d2) > 1:
        new[1:] = (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])
    d2, h2 = d2[new], h2[new]
    du, dc = np.unique(d2, return_counts=True)
    return d2, h2, du, dc


def tok_rows_block(t: pa.Table) -> pa.Table:
    """Stage-1 map: distinct (h, doc, s) rows for one batch."""
    if t.num_rows == 0:
        return pa.schema([("h", pa.int64()), ("doc", pa.int64()),
                          ("s", pa.int64())]).empty_table()
    d2, h2, du, dc = _distinct_tokens(t)
    s = dc[np.searchsorted(du, d2)] if len(d2) else \
        np.zeros(0, dtype=np.int64)
    return pa.table({"h": pa.array(h2), "doc": pa.array(d2),
                     "s": pa.array(s.astype(np.int64))})


def df_fold_block(t: pa.Table) -> pa.Table:
    """Stage-2 kernel (keyed h): df = global posting length per token —
    rows are globally distinct (h, doc), so the group size IS df."""
    if t.num_rows == 0:
        return pa.schema([("h", pa.int64()), ("doc", pa.int64()),
                          ("s", pa.int64()),
                          ("df", pa.int64())]).empty_table()
    h = t["h"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    new = np.ones(len(hs), dtype=bool)
    if len(hs) > 1:
        new[1:] = hs[1:] != hs[:-1]
    gid = np.cumsum(new) - 1
    df = np.bincount(gid).astype(np.int64)[gid]
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    return pa.table({"h": t["h"], "doc": t["doc"], "s": t["s"],
                     "df": pa.array(df[inv])})


def _prefix_len(s: np.ndarray) -> np.ndarray:
    """s - ceil(tau*s) + 1 (probing prefix, safe for Jaccard >= tau)."""
    ceil_ts = -(-(TAU_MILLI * s) // 1000)
    return s - ceil_ts + 1


def prefix_fold_block(t: pa.Table) -> pa.Table:
    """Stage-3 kernel (keyed doc): order each doc's tokens rarest-first
    (df asc, h asc) and keep only its probing prefix."""
    if t.num_rows == 0:
        return pa.schema([("h", pa.int64()), ("doc", pa.int64()),
                          ("s", pa.int64())]).empty_table()
    doc = t["doc"].to_numpy(zero_copy_only=False)
    h = t["h"].to_numpy(zero_copy_only=False)
    s = t["s"].to_numpy(zero_copy_only=False)
    df = t["df"].to_numpy(zero_copy_only=False)
    order = np.lexsort((h, df, doc))
    doc, h, s = doc[order], h[order], s[order]
    new = np.ones(len(doc), dtype=bool)
    if len(doc) > 1:
        new[1:] = doc[1:] != doc[:-1]
    seg_start = np.flatnonzero(new)
    seg_id = np.cumsum(new) - 1
    rank = np.arange(len(doc), dtype=np.int64) - seg_start[seg_id]
    keep = rank < _prefix_len(s)
    return pa.table({"h": pa.array(h[keep]), "doc": pa.array(doc[keep]),
                     "s": pa.array(s[keep])})


def _dedup_pairs_keep_capped(a, b, cap):
    """Unique (a, b) pairs, OR-folding the capped flag of duplicates."""
    order = np.lexsort((-cap, b, a))
    a, b, cap = a[order], b[order], cap[order]
    new = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[new], b[new], cap[new]


def make_candidate_fold(max_posting_df: int = None):
    """Stage-4 kernel factory (keyed h over prefixes): expand each
    posting into ordered (a < b by doc id) candidate pairs, pre-filtered
    by the length condition tau * s_large <= 1000 * s_small; vectorized
    segment k-choose-2, per-partition dedup.

    ``max_posting_df`` is the OPT-IN flood bound (round-5 #2, the
    ``_BUCKET_CAP`` star fallback of engine/dedup.py): a prefix posting
    longer than the cap — the df² worst case of a boilerplate-flooded
    corpus of near-identical tiny docs — degrades from k·(k-1)/2 pairs
    to a (k-1)-pair STAR on its minimum doc id, and every pair it emits
    carries ``capped = 1`` all the way to the output so the degrade is
    LOUD.  Default ``None`` keeps the operator exact (the value-gate
    contract; ADVICE r3: a silent cap breaks the gate)."""

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _UNION_SCHEMA.empty_table()
        h = t["h"].to_numpy(zero_copy_only=False)
        doc = t["doc"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        h, doc, s = h[order], doc[order], s[order]
        new = np.ones(len(h), dtype=bool)
        if len(h) > 1:
            new[1:] = h[1:] != h[:-1]
        seg_start = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        local = np.arange(len(h), dtype=np.int64) - seg_start[seg_id]
        seg_len = np.diff(np.append(seg_start, len(h)))
        if max_posting_df is not None:
            flooded = (seg_len > max_posting_df)[seg_id]
            # flooded segments: keep only the star edges (min-doc, other)
            expand = np.where(flooded, np.minimum(local, 1), local)
            cap_row = flooded.astype(np.int8)
        else:
            expand = local
            cap_row = np.zeros(len(h), dtype=np.int8)
        b_idx = np.repeat(np.arange(len(h), dtype=np.int64), expand)
        csl = np.zeros(len(expand) + 1, dtype=np.int64)
        np.cumsum(expand, out=csl[1:])
        a_idx = (np.arange(csl[-1], dtype=np.int64)
                 - np.repeat(csl[:-1], expand)
                 + np.repeat(seg_start[seg_id], expand))
        if len(b_idx) == 0:
            return _UNION_SCHEMA.empty_table()
        a, b = doc[a_idx], doc[b_idx]          # a < b (doc-sorted segments)
        sa, sb = s[a_idx], s[b_idx]
        cap = cap_row[b_idx]
        small, large = np.minimum(sa, sb), np.maximum(sa, sb)
        keep = 1000 * small >= TAU_MILLI * large
        a, b, cap = a[keep], b[keep], cap[keep]
        a, b, cap = _dedup_pairs_keep_capped(a, b, cap)
        n = len(a)
        return pa.table({
            "key": pa.array(a), "other": pa.array(b),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "s": pa.array(np.zeros(n, dtype=np.int64)),
            "set": pa.array([None] * n, type=_SET_T),
            "capped": pa.array(cap)})

    return fold


#: the exact default (gate path)
candidate_fold_block = make_candidate_fold(None)


def set_rows_block(t: pa.Table) -> pa.Table:
    """Pure map: one (doc, sorted distinct token-hash list) row per doc
    — the verify payload, re-derived from text (no token-index
    materialization)."""
    if t.num_rows == 0:
        return _UNION_SCHEMA.empty_table()
    d2, h2, du, dc = _distinct_tokens(t)
    # h2 within a doc is ascending already (lexsorted by (doc, h))
    sets = np.split(h2, np.cumsum(dc))[:-1]
    return pa.table({
        "key": pa.array(du), "other": pa.array(np.zeros(len(du),
                                                        dtype=np.int64)),
        "kind": pa.array(np.ones(len(du), dtype=np.int8)),
        "s": pa.array(dc.astype(np.int64)),
        "set": pa.array([x for x in sets], type=_SET_T),
        "capped": pa.array(np.zeros(len(du), dtype=np.int8))})


def attach_a_fold_block(t: pa.Table) -> pa.Table:
    """Stage-5a kernel (keyed doc_a): global candidate dedup (all (a, *)
    rows co-locate) + attach side-a's set; re-key by doc_b."""
    if t.num_rows == 0:
        return _UNION_SCHEMA.empty_table()
    kind = t["kind"].to_numpy(zero_copy_only=False)
    sets = t.filter(pa.array(kind == 1))
    pairs = t.filter(pa.array(kind == 0))
    if pairs.num_rows == 0:
        return _UNION_SCHEMA.empty_table()
    pa_, pb_, pcap = _dedup_pairs_keep_capped(
        pairs["key"].to_numpy(zero_copy_only=False),
        pairs["other"].to_numpy(zero_copy_only=False),
        pairs["capped"].to_numpy(zero_copy_only=False))
    sd = sets["key"].to_numpy(zero_copy_only=False)
    so = np.argsort(sd)
    pos = np.searchsorted(sd[so], pa_)
    set_col = sets["set"].combine_chunks() \
        if isinstance(sets["set"], pa.ChunkedArray) else sets["set"]
    s_arr = sets["s"].to_numpy(zero_copy_only=False)
    take = pa.array(so[pos])
    return pa.table({
        "key": pa.array(pb_),                  # re-key by doc_b
        "other": pa.array(pa_),
        "kind": pa.array(np.zeros(len(pa_), dtype=np.int8)),
        "s": pa.array(s_arr[so[pos]].astype(np.int64)),
        "set": set_col.take(take),
        "capped": pa.array(pcap)})


def verify_fold_block(t: pa.Table) -> pa.Table:
    """Stage-5b kernel (keyed doc_b): attach side-b's set and score the
    exact Jaccard; emit only pairs at or above tau."""
    if t.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    kind = t["kind"].to_numpy(zero_copy_only=False)
    sets = t.filter(pa.array(kind == 1))
    pairs = t.filter(pa.array(kind == 0))
    if pairs.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    sd = sets["key"].to_numpy(zero_copy_only=False)
    so = np.argsort(sd)
    sset = sets["set"].combine_chunks() \
        if isinstance(sets["set"], pa.ChunkedArray) else sets["set"]
    sb_arr = sets["s"].to_numpy(zero_copy_only=False)
    b = pairs["key"].to_numpy(zero_copy_only=False)
    a = pairs["other"].to_numpy(zero_copy_only=False)
    sa = pairs["s"].to_numpy(zero_copy_only=False)
    cap = pairs["capped"].to_numpy(zero_copy_only=False)
    pset = pairs["set"].combine_chunks() \
        if isinstance(pairs["set"], pa.ChunkedArray) else pairs["set"]
    pos = so[np.searchsorted(sd[so], b)]
    # zero-copy list access: flat value buffers + offsets, sliced per pair
    # (the loop is per CANDIDATE — inherent to exact verification — but
    # each step is numpy over views, no per-row as_py materialization)
    pv = pset.values.to_numpy(zero_copy_only=False)
    po = pset.offsets.to_numpy(zero_copy_only=False)
    sv = sset.values.to_numpy(zero_copy_only=False)
    so_off = sset.offsets.to_numpy(zero_copy_only=False)
    out_a, out_b, out_j, out_c = [], [], [], []
    for i in range(len(b)):
        set_a = pv[po[i]:po[i + 1]]
        j = pos[i]
        set_b = sv[so_off[j]:so_off[j + 1]]
        inter = len(np.intersect1d(set_a, set_b, assume_unique=True))
        union = int(sa[i]) + int(sb_arr[j]) - inter
        if union > 0 and 1000 * inter >= TAU_MILLI * union:
            out_a.append(int(a[i]))
            out_b.append(int(b[i]))
            out_j.append(1000 * inter // union)
            out_c.append(int(cap[i]))
    return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                     "doc_b": pa.array(out_b, type=pa.int64()),
                     "jaccard_milli": pa.array(out_j, type=pa.int64()),
                     "capped": pa.array(out_c, type=pa.int8())})


def q_ppjoin_pairs(sf_dir: str, max_posting_df: int = None):
    """All document pairs with distinct-word-set Jaccard >= 0.5 — exact
    (prefix-filtered candidates, fully verified) when
    ``max_posting_df`` is None (the gated default, output columns
    ``doc_a, doc_b, jaccard_milli``).

    ``max_posting_df`` set is the OPT-IN bounded flood mode: prefix
    postings longer than the cap expand as (k-1)-pair stars instead of
    k·(k-1)/2 cliques, the output gains a ``capped`` bool column marking
    pairs discovered through a degraded posting, and ``capped.any()``
    means the pair set may be INCOMPLETE (every emitted pair is still
    exactly verified ≥ tau — only recall degrades, never precision)."""
    from engine.stages import hash_group_exchange

    nrows = _doc_rows(sf_dir)
    cand_fold = candidate_fold_block if max_posting_df is None \
        else make_candidate_fold(max_posting_df)

    def prefix_ds():
        return hash_group_exchange(
            _docs(sf_dir).map_batches(tok_rows_block,
                                      batch_format="pyarrow",
                                      batch_size=None),
            [["h"], ["doc"], ["h"]],
            [df_fold_block, prefix_fold_block, cand_fold],
            collect=False, rows_hint=nrows * 64)

    def sets_ds():
        return _docs(sf_dir).map_batches(set_rows_block,
                                         batch_format="pyarrow",
                                         batch_size=None)

    def stage_a():
        return hash_group_exchange(
            prefix_ds().union(sets_ds()), ["key"], attach_a_fold_block,
            collect=False, rows_hint=nrows * 2)

    out = hash_group_exchange(
        stage_a().union(sets_ds()), ["key"], verify_fold_block,
        collect=False, rows_hint=nrows * 2)
    if max_posting_df is None:
        # exact mode: capped is identically 0 — drop it (gate schema)
        return out.map_batches(
            lambda t: t.drop_columns(["capped"]), batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("capped"), "capped",
                               pc.cast(t["capped"], pa.bool_())),
        batch_format="pyarrow")


SQL_PPJOIN_PAIRS = rf"""
WITH tok AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(list_distinct(
             regexp_extract_all(lower(coalesce(text, '')), '\S+'))) AS w
  FROM documents
), sz AS (
  SELECT doc_id, count(*)::BIGINT AS s FROM tok GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ((1000 * i) // (sa.s + sb.s - i))::BIGINT AS jaccard_milli
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE 1000 * i >= {TAU_MILLI} * (sa.s + sb.s - i)
"""
