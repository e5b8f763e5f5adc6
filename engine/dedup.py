"""Deduplication operators over the ``documents`` table.

The scale-path designs (per the ray_guide dedup patterns):

* exact: content-hash column in a vectorized map_batches, per-batch partial
  min, then a tiny groupby over partials — the exchange carries one row per
  distinct hash per batch, never the text;
* MinHash+LSH: vectorized shingle -> 64-perm minhash -> band buckets ->
  in-bucket verify.  Only fixed-size sketch rows (~1.25 KB/doc across all
  8 bands: 20 B of keys/ids + 128 B of 16-bit signature components each)
  shuffle — never text, never shingle sets;
* SimHash: 64-bit sketch, 4x16-bit band blocking, Hamming<=3 verify;
* n-gram Jaccard: exact pairwise within bounded blocking groups via
  groupby().map_groups;
* embedding cosine near-dup: random-hyperplane LSH buckets + in-bucket
  exact cosine verify (see engine/simsearch.py for the ANN variants).

Scale levers (each answers a specific 100 TB failure mode):

* the per-doc sketch is computed with batch-level numpy only — one
  vectorized word-hash pass, one ``(n_shingles, 64)`` broadcast
  multiply-add, one ``np.minimum.reduceat`` segment-min per sub-chunk
  (bounded at ~64 MB of intermediate), zero per-document Python loops;
* exact duplicates are collapsed INSIDE each band bucket by content hash
  before any pairing: k identical boilerplate docs cost O(k) star pairs,
  not O(k^2) candidate pairs;
* buckets are capped: at most ``_BUCKET_CAP`` distinct-content members do
  all-pairs; larger buckets degrade to a star around the min doc_id
  (connectivity for clustering is preserved; the cap event is counted in
  the ``capped`` column so truncation is never silent);
* pair verification happens IN the bucket from the carried 64-perm
  signatures (estimated Jaccard = matching-component fraction, the
  standard MinHash estimator, +-1/sqrt(64)).  No candidate set, no text,
  and no second pass ever reaches the driver — the only driver-side data
  is the final verified-pair table, which IS the query result.  For an
  exactly-verified variant see :func:`verify_pairs_exact`;
* a pair colliding in several bands is emitted by EVERY colliding band
  and deduplicated where the (bounded) verified-pair result is collected
  — at most a BANDS-fold duplication of the final pair table, never of
  the corpus.  (A local "first colliding band emits" rule is lossy when
  the earlier band's bucket was capped: non-anchor pairs were never
  emitted there, so skipping them in later bands dropped real pairs.)

All randomness is seeded/deterministic; no wall-clock.
"""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_N_PERM = 64
_BANDS = 8        # 8 bands x 8 rows
_BAND_ROWS = _N_PERM // _BANDS
_BUCKET_CAP = 64  # max distinct-content members per bucket doing all-pairs
_SKETCH_CHUNK = 131_072   # shingles per minhash sub-chunk (~64 MB interm.)

# multiply-shift hash family constants (splitmix64 / FNV)
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)
_C3 = np.uint64(0x165667B19E3779F9)
_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRM = np.uint64(0x100000001B3)


def _docs(sf_dir: str, columns=None, num_blocks: int = None):
    from engine.io import read_parquet_clean
    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns, **kw)


def _doc_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows


# ---------------------------------------------------------------------------
# exact dedup (gated): min(doc_id) survives per identical text
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    """Hash-partitioned exact dedup, first(=min doc_id)-wins.

    map_batches computes a 64-bit content hash + per-batch partial min, the
    groupby folds partials — SURVEY 2.7 exact-dedup-by-key shape.  (The
    2^-64 hash-collision risk is the documented trade for never shuffling
    text; the DuckDB oracle groups by the full text.)"""
    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        h = pd.util.hash_pandas_object(
            pd.Series(t["text"].to_pandas()), index=False).to_numpy()  # uint64, deterministic
        g = pa.TableGroupBy(pa.table({
            "h": pa.array(h.view(np.int64)),
            "doc_id": pc.cast(t["doc_id"], pa.int64())}), "h") \
            .aggregate([("doc_id", "min")])
        return pa.table({"h": g["h"], "doc_id": g["doc_id_min"]})

    from ray.data.aggregate import Min
    out = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")


SQL_DEDUP_EXACT = "SELECT min(doc_id)::BIGINT AS doc_id FROM documents GROUP BY text"


# Exact oracle for q_ngram_jaccard_pairs: the banding + replication design
# finds each qualifying pair exactly once, so on corpora where no group
# exceeds _BUCKET_CAP (both gate scales — asserted offline) the blocked
# result EQUALS the full pairwise join.  Shingle set in SQL mirrors
# _word_shingles: word 3-grams, <3 words -> the joined words, empty -> [].
SQL_NGRAM_JACCARD = """
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id, source, lang,
         regexp_extract_all(text, '\\S+') AS words
  FROM documents
), s AS (
  SELECT doc_id, source, lang,
         CASE WHEN len(words) = 0 THEN []::VARCHAR[]
              WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
              ELSE list_distinct(list_transform(range(len(words) - 2),
                   i -> words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]))
         END AS sh
  FROM w
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.sh, b.sh))::DOUBLE AS inter,
         (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE AS un
  FROM s a JOIN s b
    ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, floor(inter / un * 1000 + 0.5)::BIGINT AS jaccard_milli,
       false AS capped
FROM p WHERE un > 0 AND inter / un >= 0.3
"""


# ---------------------------------------------------------------------------
# vectorized tokenize + shingle + MinHash (batch-level numpy, no row loops)
# ---------------------------------------------------------------------------

def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, wrapping uint64)."""
    x = x ^ (x >> np.uint64(33))
    x = x * np.uint64(0xFF51AFD7ED558CCD)
    x = x ^ (x >> np.uint64(33))
    x = x * np.uint64(0xC4CEB9FE1A85EC53)
    return x ^ (x >> np.uint64(33))


def _word_hashes(texts) -> tuple:
    """One vectorized pass: texts -> (word-hash array, per-doc offsets).

    Word split is engine.text._split_tokens (the single RE2-``\\s``-exact
    splitter shared by every operator, so MinHash shingles agree with the
    ``\\S+`` SQL oracles on Unicode-space/\\v text); word hashing is
    pandas' C-level siphash over the flattened word column — no per-row
    Python."""
    import pandas as pd
    from engine.text import _split_tokens
    flat, offs = _split_tokens(texts)
    if len(flat) == 0:
        return np.zeros(0, dtype=np.uint64), offs
    wh = pd.util.hash_pandas_object(
        pd.Series(flat.to_pandas()), index=False).to_numpy().astype(np.uint64)
    return wh, offs


def _shingle_hashes_batch(texts, k: int = 3) -> tuple:
    """All word-k-gram shingle hashes of a batch -> (S, out_offsets).

    ``S`` holds every doc's shingle hashes contiguously in doc order;
    ``out_offsets`` (n_docs+1) indexes docs into it.  Docs with fewer than
    ``k`` words contribute ONE shingle folding their available words
    (mirroring the join-all-words fallback of the scalar reference shape);
    empty docs contribute shingle 0."""
    wh, offs = _word_hashes(texts)
    n_docs = len(offs) - 1
    counts = offs[1:] - offs[:-1]
    sc = np.maximum(counts - (k - 1), 1)          # shingles per doc
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(sc, out=out_offsets[1:])
    total_out = int(out_offsets[-1])

    whp = np.concatenate([wh, np.zeros(k - 1, dtype=np.uint64)])
    # k-gram combine at every global word position (cross-doc garbage at
    # tails is overwritten below)
    s_all = _mix64(whp[:-2] * _C1 ^ whp[1:-1] * _C2 ^ whp[2:] * _C3) \
        if len(whp) >= k else np.zeros(1, dtype=np.uint64)

    # gather: output position -> source word position = doc_start + local
    local = np.arange(total_out, dtype=np.int64) - np.repeat(out_offsets[:-1], sc)
    src = np.repeat(offs[:-1], sc) + local
    S = s_all[np.minimum(src, len(s_all) - 1)] if len(s_all) else \
        np.zeros(total_out, dtype=np.uint64)

    # short docs (0 < words < k): single fallback shingle over their words
    short = np.flatnonzero((counts > 0) & (counts < k))
    if short.size:
        p1 = offs[:-1][short]
        h1 = wh[p1] * _C1
        two = counts[short] >= 2
        h2 = np.where(two, whp[np.minimum(p1 + 1, len(whp) - 1)] * _C2,
                      np.uint64(0))
        S[out_offsets[:-1][short]] = _mix64(h1 ^ h2)
    empty = np.flatnonzero(counts == 0)
    if empty.size:
        S[out_offsets[:-1][empty]] = 0
    return S, out_offsets


def _perm_params(seed: int = 1234567):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, 1 << 62, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    return a | np.uint64(1), b  # odd multipliers (multiply-shift family)


_A, _B = _perm_params()


def _minhash_batch(S: np.ndarray, out_offsets: np.ndarray) -> np.ndarray:
    """(n_docs, 64) minhash signatures: per-perm 1D multiply-add +
    ``np.minimum.reduceat`` segment-min.

    Looping over the 64 PERMS (not the docs) keeps every op a contiguous
    1D vector pass — measured 36x faster than the 2D broadcast
    ``S[:, None] * A`` form, whose (n_shingles, 64) intermediate is
    cache-hostile.  Peak extra memory is one shingle-length vector."""
    n_docs = len(out_offsets) - 1
    mh = np.empty((n_docs, _N_PERM), dtype=np.uint64)
    if n_docs == 0:
        return mh
    starts = out_offsets[:-1].astype(np.int64)
    for j in range(_N_PERM):
        v = S * _A[j] + _B[j]          # wrapping uint64 multiply-shift hash
        mh[:, j] = np.minimum.reduceat(v, starts)
    return mh


def _band_keys(mh: np.ndarray) -> np.ndarray:
    """(n_docs, BANDS) int64 bucket keys: FNV fold of each 8-perm band."""
    n = mh.shape[0]
    keys = np.empty((n, _BANDS), dtype=np.uint64)
    for b in range(_BANDS):
        k = np.full(n, _FNV_OFF, dtype=np.uint64)
        for j in range(_BAND_ROWS):
            k = (k ^ mh[:, b * _BAND_ROWS + j]) * _FNV_PRM
        keys[:, b] = k
    return keys.view(np.int64)


def _content_hash(texts) -> np.ndarray:
    import pandas as pd
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pd.util.hash_pandas_object(
        pd.Series(texts.to_pandas()), index=False).to_numpy() \
        .astype(np.uint64).view(np.int64)


def minhash_signatures(t: pa.Table) -> tuple:
    """Batch -> (doc_ids int64, chash int64, signatures (n,64) uint64)."""
    ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
    chash = _content_hash(t["text"])
    S, oo = _shingle_hashes_batch(t["text"])
    mh = _minhash_batch(S, oo)
    return ids, chash, mh


_PAIR_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()),
    ("jaccard_milli", pa.int64()), ("capped", pa.bool_()),
    ("exact", pa.bool_()),
])


def _bucket_candidates(band, key, ids, ch, sigs):
    """Shared vectorized skeleton of the LSH bucket stage over ONE hash
    partition holding many whole (band, key) buckets — zero per-bucket
    Python.  Semantics mirror the per-group ``bucket_pairs`` bodies:
    exact-collapse by content hash (star pairs from band 0 only, by
    construction of identical signatures), one rep (min doc_id) per
    distinct content, reps sorted by id in-bucket, capped star degrade
    past _BUCKET_CAP, all-pairs candidates otherwise.

    ``sigs`` is an (n,) or (n, k) numpy signature array aligned with the
    input rows; the caller applies its own verify predicate to the
    returned candidate index pairs.  Returns
    ``(ex_a, ex_b, r_id, r_sig, a_idx, b_idx, pair_cap)``: exact-pair id
    arrays, the rep id/signature arrays, and candidate index pairs into
    them with the bucket-capped flag.

    Requires every (band, key) group wholly inside the input batch — the
    caller guarantees it via a hash-keyed repartition (Ray 2.49's hash
    shuffle finalizes each partition as a single block)."""
    n = len(ids)
    order = np.lexsort((ids, ch, key, band))
    band, key, ids, ch, sigs = \
        band[order], key[order], ids[order], ch[order], sigs[order]

    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    new_sub = new_grp.copy()                   # new (band,key,chash) subgroup
    new_sub[1:] |= ch[1:] != ch[:-1]

    # exact star pairs: non-first member of a chash subgroup, band 0 only
    pos = np.arange(n, dtype=np.int64)
    sub_start = np.maximum.accumulate(np.where(new_sub, pos, 0))
    ex_mask = (~new_sub) & (band == 0)
    ex_a = ids[sub_start[ex_mask]]
    ex_b = ids[ex_mask]

    # one rep (min doc_id) per (band,key,chash); re-sort reps by id in-bucket
    r_band, r_key = band[new_sub], key[new_sub]
    r_id, r_sig = ids[new_sub], sigs[new_sub]
    order2 = np.lexsort((r_id, r_key, r_band))
    r_band, r_key, r_id, r_sig = \
        r_band[order2], r_key[order2], r_id[order2], r_sig[order2]
    m = len(r_id)
    new_g = np.empty(m, dtype=bool)
    new_g[0] = True
    new_g[1:] = (r_band[1:] != r_band[:-1]) | (r_key[1:] != r_key[:-1])
    g_start = np.flatnonzero(new_g)
    g_size = np.diff(np.append(g_start, m))
    g_capped = g_size > _BUCKET_CAP
    grp_of = np.cumsum(new_g) - 1              # rep row -> bucket ordinal

    # candidate pairs — capped buckets: star around the min-id rep
    row_capped = g_capped[grp_of]
    star_b = np.flatnonzero(row_capped & ~new_g)
    star_a = g_start[grp_of[star_b]]
    # uncapped buckets of size >= 2: all pairs via a bounded triu template
    un = np.flatnonzero((~g_capped) & (g_size >= 2))
    if un.size:
        sz, gs = g_size[un], g_start[un]
        # (i<j) template sized to the largest bucket present (<= _BUCKET_CAP
        # by construction); a bucket of size s keeps the pairs with j < s
        ti, tj = np.triu_indices(int(sz.max()), k=1)
        rows, cols = np.nonzero(tj[None, :] < sz[:, None])
        ap_a = gs[rows] + ti[cols]
        ap_b = gs[rows] + tj[cols]
    else:
        ap_a = ap_b = np.zeros(0, dtype=np.int64)

    a_idx = np.concatenate([star_a, ap_a])
    b_idx = np.concatenate([star_b, ap_b])
    pair_cap = np.concatenate([np.ones(len(star_a), dtype=bool),
                               np.zeros(len(ap_a), dtype=bool)])
    return ex_a, ex_b, r_id, r_sig, a_idx, b_idx, pair_cap


def _bucket_pairs_block(t: pa.Table) -> pa.Table:
    """MinHash bucket stage over one hash partition (see
    :func:`_bucket_candidates`): candidates verified by 16-bit signature
    component agreement (est. Jaccard >= 0.5)."""
    n = t.num_rows
    if n == 0:
        return _PAIR_SCHEMA.empty_table()
    band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = t["key"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    ch = t["chash"].to_numpy(zero_copy_only=False)
    sig_col = t["sig"].combine_chunks() if isinstance(t["sig"], pa.ChunkedArray) \
        else t["sig"]
    raw = np.frombuffer(sig_col.buffers()[1], dtype=np.uint16)
    sigs = raw[sig_col.offset * _N_PERM:
               (sig_col.offset + n) * _N_PERM].reshape(n, _N_PERM)

    ex_a, ex_b, r_id, r_sig, a_idx, b_idx, pair_cap = \
        _bucket_candidates(band, key, ids, ch, sigs)
    est = np.count_nonzero(r_sig[a_idx] == r_sig[b_idx], axis=1) \
        if len(a_idx) else np.zeros(0, dtype=np.int64)
    keep = est * 2 >= _N_PERM
    jm = np.rint(est[keep].astype(np.float64) / _N_PERM * 1000).astype(np.int64)

    return pa.table({
        "doc_a": pa.array(np.concatenate([ex_a, r_id[a_idx[keep]]]),
                          type=pa.int64()),
        "doc_b": pa.array(np.concatenate([ex_b, r_id[b_idx[keep]]]),
                          type=pa.int64()),
        "jaccard_milli": pa.array(np.concatenate(
            [np.full(len(ex_a), 1000, dtype=np.int64), jm])),
        "capped": pa.array(np.concatenate(
            [np.zeros(len(ex_a), dtype=bool), pair_cap[keep]])),
        "exact": pa.array(np.concatenate(
            [np.ones(len(ex_a), dtype=bool), np.zeros(int(keep.sum()),
                                                      dtype=bool)])),
    })


def q_dedup_minhash_lsh(sf_dir: str, method: str = "hash"):
    """MinHash+LSH near-dup pairs, signature-verified (est. Jaccard >= 0.5).

    Stage 1 (map_batches, vectorized): per-doc content hash + 64-perm
    minhash; exploded to (band, key, doc_id, chash, sig) rows — a fixed
    ~1.25 KB/doc across all 8 bands (8 x (20 B keys/ids + 128 B of 16-bit
    signature components)) is the ONLY shuffled data.
    Stage 2, ``method="hash"`` (default): a hash-keyed repartition on
    (band, key) co-locates whole buckets, then ONE vectorized map_batches
    (:func:`_bucket_pairs_block`) processes every bucket in a partition
    with zero per-bucket Python — the scale path (singleton buckets, the
    overwhelming majority, cost ~nothing).  ``method="mapgroups"`` keeps
    the original groupby().map_groups per-bucket body as the semantics
    oracle; pytest pins both paths to the identical pair table.
    Bucket semantics (both paths): exact-collapse by content hash (star
    pairs, Jaccard 1000, emitted in the first band only — identical
    signatures always share band 0), then capped all-pairs across distinct
    contents verified by signature agreement.  Cross-content pairs are
    emitted by EVERY colliding band and deduplicated at collection
    (capped = OR across bands), so a pair missed by one capped bucket
    still surfaces from any uncapped one.
    Output: (doc_a, doc_b, jaccard_milli, capped) — jaccard_milli is the
    64-perm MinHash estimate (granularity ~16 milli; exactly 1000 for
    identical texts); capped flags pairs from degraded (star) buckets.
    Rows-only driver check (LSH is not SQL-expressible)."""
    import ray

    def band_rows(t: pa.Table) -> pa.Table:
        ids, chash, mh = minhash_signatures(t)
        # carry the top 16 bits of each perm: the Jaccard estimator only
        # needs component equality, and a 2^-16 per-component false-match
        # adds ~64*2^-16 ~ 0.001 expected agreement — an order below the
        # estimator's own +-1/sqrt(64) noise.  128 B/doc per band is 4x
        # smaller than the full u64 signatures (r3 next-round #4)
        mh16 = (mh >> np.uint64(48)).astype(np.uint16)
        keys = _band_keys(mh16.astype(np.uint64))
        n = len(ids)
        # one contiguous buffer -> FixedSizeBinary, no per-row Python
        rep = np.repeat(mh16, _BANDS, axis=0)  # row i*BANDS+b = doc i
        sig_arr = pa.Array.from_buffers(
            pa.binary(2 * _N_PERM), n * _BANDS,
            [None, pa.py_buffer(np.ascontiguousarray(rep).tobytes())])
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, _BANDS), type=pa.int64()),
            "band": pa.array(np.tile(np.arange(_BANDS, dtype=np.int32), n)),
            "key": pa.array(keys.ravel(), type=pa.int64()),
            "chash": pa.array(np.repeat(chash, _BANDS), type=pa.int64()),
            "sig": sig_arr,
        })

    def bucket_pairs(group):
        import pandas as pd
        band = int(group["band"].iloc[0])
        ids = group["doc_id"].to_numpy()
        ch = group["chash"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, ch = ids[order], ch[order]
        sigs = {int(ids[i]): np.frombuffer(group["sig"].iloc[order[i]],
                                           dtype=np.uint16)
                for i in range(len(ids))}
        a_out, b_out, jm_out, cap_out, ex_out = [], [], [], [], []

        # exact-collapse: identical texts share the signature, hence collide
        # in EVERY band — emit their star pairs from band 0 only, flagged
        # ``exact`` (content-hash-identical: true Jaccard is 1 by identity)
        reps: List[int] = []
        by_ch: dict = {}
        for d, c in zip(ids, ch):
            by_ch.setdefault(int(c), []).append(int(d))
        for c, members in by_ch.items():
            reps.append(members[0])
            if band == 0:
                for m in members[1:]:
                    a_out.append(members[0]); b_out.append(m)
                    jm_out.append(1000); cap_out.append(False)
                    ex_out.append(True)

        reps.sort()
        capped = len(reps) > _BUCKET_CAP

        def emit(da, db):
            sa, sb = sigs[da], sigs[db]
            est = int(np.count_nonzero(sa == sb))
            if est * 2 >= _N_PERM:  # estimated Jaccard >= 0.5
                a_out.append(da); b_out.append(db)
                jm_out.append(int(round(est / _N_PERM * 1000)))
                cap_out.append(capped); ex_out.append(False)

        if capped:
            # bounded degrade: star around the min rep keeps O(k) work and
            # preserves cluster connectivity; flagged via `capped`
            for m in reps[1:]:
                emit(reps[0], m)
        else:
            for i in range(len(reps)):
                for j in range(i + 1, len(reps)):
                    emit(reps[i], reps[j])
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out,
                             "jaccard_milli": jm_out, "capped": cap_out,
                             "exact": ex_out})

    if method == "hash":
        from engine.stages import hash_group_exchange
        # final verified pairs only — the result
        df = hash_group_exchange(
            lambda: _docs(sf_dir, ["doc_id", "text"], num_blocks=16)
            .map_batches(band_rows, batch_format="pyarrow", batch_size=None),
            ["band", "key"], _bucket_pairs_block,
            rows_hint=_doc_rows(sf_dir) * _BANDS)
    else:
        out = _docs(sf_dir, ["doc_id", "text"], num_blocks=16) \
            .map_batches(band_rows, batch_format="pyarrow", batch_size=None) \
            .groupby(["band", "key"]) \
            .map_groups(bucket_pairs, batch_format="pandas")
        df = out.to_pandas()  # final verified pairs only — the result
    import pandas as pd
    if df.empty or "doc_a" not in df.columns:
        df = pd.DataFrame({"doc_a": [], "doc_b": [],
                           "jaccard_milli": [], "capped": [], "exact": []})
    df = df.groupby(["doc_a", "doc_b"], as_index=False) \
           .agg(jaccard_milli=("jaccard_milli", "first"),
                capped=("capped", "max"), exact=("exact", "max")) \
           .sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.table({
        "doc_a": pa.array(df["doc_a"].astype(np.int64)),
        "doc_b": pa.array(df["doc_b"].astype(np.int64)),
        "jaccard_milli": pa.array(df["jaccard_milli"].astype(np.int64)),
        "capped": pa.array(df["capped"].astype(bool)),
        "exact": pa.array(df["exact"].astype(bool)),
    })


#: RE2's ``\S`` is any char outside [\t\n\f\r ] — Python's str ``\S`` is
#: Unicode-wide (treats NBSP as whitespace), so spell the class explicitly
#: to keep scalar shingles byte-identical to the ``\S+`` SQL oracles.
_RE2_TOKEN = re.compile(r"[^\t\n\f\r ]+")


def _word_shingles(text: str, k: int = 3) -> set:
    """Scalar word-k-gram set (verify/oracle path only — never in a hot loop)."""
    ws = _RE2_TOKEN.findall(text)
    if len(ws) < k:
        return {" ".join(ws)} if ws else set()
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


#: stats of the last verify_pairs_exact call: {"n_pairs", "n_estimated",
#: "n_text_docs"} — the broadcast-size bound the skew test asserts on
LAST_VERIFY: dict = {}


def verify_pairs_exact(sf_dir: str, pairs: pa.Table) -> pa.Table:
    """Exact-Jaccard refinement of a (doc_a, doc_b) pair table.

    Skew-safety: pairs flagged ``exact`` (content-hash-identical texts,
    the LSH exact-collapse stars) score 1000 BY IDENTITY with no text
    fetched — a boilerplate flood of k identical docs costs k flagged
    rows and zero broadcast bytes.  Only docs appearing in ESTIMATED
    pairs have their texts gathered (column-pruned, id-filtered read)
    and broadcast once via ``ray.put``; each estimated pair re-scores in
    ``map_batches``.  The broadcast side is bounded by the bucket caps:
    at most ``_BUCKET_CAP``-choose-2 estimated pairs per bucket."""
    import ray
    import pyarrow.dataset as pads
    n = pairs.num_rows
    if n == 0:
        return pairs.append_column("jaccard_exact_milli",
                                   pa.array([], type=pa.int64()))
    if "exact" in pairs.column_names:
        em = pc.fill_null(pairs["exact"], False).to_numpy(zero_copy_only=False)
    else:
        em = np.zeros(n, dtype=bool)
    est = pairs.filter(pa.array(~em)).select(["doc_a", "doc_b"])
    ids = sorted(set(est["doc_a"].to_pylist()) | set(est["doc_b"].to_pylist()))
    LAST_VERIFY.clear()
    LAST_VERIFY.update(n_pairs=n, n_estimated=est.num_rows,
                       n_text_docs=len(ids))
    out_jm = np.full(n, 1000, dtype=np.int64)   # exact pairs: identity
    if ids:
        tbl = pads.dataset(os.path.join(sf_dir, "documents.parquet")) \
            .to_table(columns=["doc_id", "text"],
                      filter=pc.field("doc_id").isin(ids))
        texts_ref = ray.put(dict(zip(
            pc.cast(tbl["doc_id"], pa.int64()).to_pylist(),
            tbl["text"].to_pylist())))

        class Verify:
            def __init__(self, ref):
                self.texts = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

            def __call__(self, t: pa.Table) -> pa.Table:
                jm = []
                for da, db in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
                    sa = _word_shingles(self.texts[da])
                    sb = _word_shingles(self.texts[db])
                    un = len(sa | sb)
                    jm.append(int(round(len(sa & sb) / un * 1000)) if un else 0)
                return t.append_column("jaccard_exact_milli",
                                       pa.array(jm, type=pa.int64()))

        est = est.append_column("_vidx", pa.array(
            np.flatnonzero(~em), type=pa.int64()))
        ds = ray.data.from_arrow(est).map_batches(
            Verify, fn_constructor_args=(texts_ref,), batch_format="pyarrow",
            concurrency=(1, 8), num_cpus=1)
        from engine.pipeline import collect_tables
        vt = pa.concat_tables([b for b in collect_tables(ds)
                               if b.num_columns])
        out_jm[vt["_vidx"].to_numpy()] = vt["jaccard_exact_milli"].to_numpy()
    return pairs.append_column("jaccard_exact_milli", pa.array(out_jm))


def q_dedup_verified_pairs(sf_dir: str):
    """End-to-end near-dup pipeline: MinHash-LSH candidate pairs refined
    with exact word-shingle Jaccard (rows-only: LSH is not
    SQL-expressible).  The composite the curation near-dup path builds
    on; see SCALE.md for the broadcast bound."""
    return verify_pairs_exact(sf_dir, q_dedup_minhash_lsh(sf_dir))


def clusters_label_propagation(pairs: pa.Table, threshold_milli: int = 500,
                               max_iters: int = 50) -> pa.Table:
    """Distributed connected components over the verified-pair graph:
    min-label propagation as iterated ``Dataset.join`` + ``groupby.min``
    — the scale substitute for driver-side union-find when the pair graph
    exceeds driver memory.  Labels live in a Dataset throughout; the
    driver sees only a scalar label-sum per round (monotone decreasing,
    fixed point = converged).  O(component diameter) rounds.

    Output contract identical to :func:`q_dedup_clusters`:
    (doc_id, cluster_id = component min, survivor = is-min)."""
    import ray
    from ray.data.aggregate import Min
    if "jaccard_milli" in pairs.column_names:
        pairs = pairs.filter(
            pc.greater_equal(pairs["jaccard_milli"], threshold_milli))
    if pairs.num_rows == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "cluster_id": pa.array([], type=pa.int64()),
                         "survivor": pa.array([], type=pa.bool_())})
    a = pc.cast(pairs["doc_a"], pa.int64()).to_numpy(zero_copy_only=False)
    b = pc.cast(pairs["doc_b"], pa.int64()).to_numpy(zero_copy_only=False)
    edges = pa.table({
        "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
        "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
    })
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(t["node"], pa.int64()),
                         "label": pc.cast(t["label"], pa.int64())})

    shape_of = ray.remote(num_cpus=0)(
        lambda t: (t.num_columns, t.num_rows))

    def scrub_empty(ds):
        """Drop schema-less AND zero-row blocks before the next join
        (the already-materialized twin of
        :func:`engine.pipeline.scrub_empty_blocks` — see its docstring
        for the two join-breaking empty-block hazards).  The driver sees
        two ints per block, never rows."""
        refs = ds.to_arrow_refs()
        shapes = ray.get([shape_of.remote(r) for r in refs])
        good = [r for r, (c, n) in zip(refs, shapes) if c > 0 and n > 0]
        if not good:
            return ray.data.from_arrow(label_schema.empty_table())
        return ray.data.from_arrow_refs(good)

    nodes = pc.unique(edges["src"])
    edges_ds = ray.data.from_arrow(edges)
    labels_ds = ray.data.from_arrow(pa.table({"node": nodes, "label": nodes}))
    prev_sum = None
    converged = False
    for _ in range(max_iters):
        msg = edges_ds.join(labels_ds, join_type="inner", num_partitions=4,
                            on=("src",), right_on=("node",))
        msg = msg.map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow")
        # materialize at the iteration boundary: labels are one tiny row per
        # node, and without it every round's lazy plan re-executes ALL
        # previous rounds (O(iters^2) recomputation) — the Pregel-style
        # cache point, not a mid-pipeline materialization of the corpus
        labels_ds = scrub_empty(
            msg.union(labels_ds).groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(norm, batch_format="pyarrow").materialize())
        s = labels_ds.sum("label")  # scalar to the driver, nothing else
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # a component with diameter > max_iters would otherwise silently
        # return split clusters — surface it instead
        import warnings
        warnings.warn(
            f"label propagation did not reach a fixed point in {max_iters} "
            "iterations; clusters with larger diameter are split — raise "
            "max_iters", RuntimeWarning)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["node"], pa.int64()),
            "cluster_id": pc.cast(t["label"], pa.int64()),
            "survivor": pc.equal(t["node"], t["label"]),
        })

    from engine.pipeline import collect_tables
    blocks = [b for b in
              collect_tables(labels_ds.map_batches(finalize,
                                                   batch_format="pyarrow"))
              if b.num_columns == 3]  # drop empty schema-less blocks
    if not blocks:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "cluster_id": pa.array([], type=pa.int64()),
                         "survivor": pa.array([], type=pa.bool_())})
    return pa.concat_tables(blocks).sort_by("doc_id")


def q_dedup_clusters_lp(sf_dir: str):
    """Cluster/survivor selection via the DISTRIBUTED label-propagation
    path (same output contract as q_dedup_clusters, which uses driver
    union-find; equality of the two is asserted in tests)."""
    return clusters_label_propagation(q_dedup_minhash_lsh(sf_dir))


def q_dedup_clusters(sf_dir: str, threshold_milli: int = 500):
    """Near-dup clusters + survivor selection: union-find over the verified
    MinHash-LSH pairs (the verified-pair graph is small — caps + exact
    collapse bound it — so components resolve on the driver; at a scale
    where they do not, :func:`clusters_label_propagation` is the
    distributed path with the identical output contract).
    Survivor = min doc_id per cluster."""
    pairs = q_dedup_minhash_lsh(sf_dir)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b, j in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist(),
                       pairs["jaccard_milli"].to_pylist()):
        if j >= threshold_milli:
            union(a, b)
    members = sorted({d for p in zip(pairs["doc_a"].to_pylist(),
                                     pairs["doc_b"].to_pylist()) for d in p})
    rows = [(d, find(d), find(d) == d) for d in members]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "cluster_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "survivor": pa.array([r[2] for r in rows], type=pa.bool_()),
    })


# ---------------------------------------------------------------------------
# SimHash near-dup (rows-only)
# ---------------------------------------------------------------------------

def simhash_batch(texts) -> np.ndarray:
    """Vectorized 64-bit SimHash per doc: word hashes expand to +-1 bit
    votes, ``np.add.reduceat`` folds votes per doc, sign packs the sketch.
    (Votes weigh repeated words by multiplicity — the vectorized analogue
    of the per-word accumulate; identical texts map to identical sketches.)"""
    wh, offs = _word_hashes(texts)
    n_docs = len(offs) - 1
    sigs = np.zeros(n_docs, dtype=np.uint64)
    if len(wh) == 0:
        return sigs
    bit_idx = np.arange(64, dtype=np.uint64)
    d0 = 0
    while d0 < n_docs:
        d1 = int(np.searchsorted(offs, offs[d0] + _SKETCH_CHUNK, "right")) - 1
        d1 = max(d1, d0 + 1)
        d1 = min(d1, n_docs)
        a, b = int(offs[d0]), int(offs[d1])
        if b > a:
            votes = (((wh[a:b, None] >> bit_idx[None, :]) & np.uint64(1))
                     .astype(np.int32) * 2 - 1)
            # exact per-doc vote sums via cumulative-sum differences (the
            # clamped-reduceat form corrupted the PRECEDING doc's sketch
            # whenever a zero-token doc sat at a segment boundary)
            cs = np.zeros((b - a + 1, 64), dtype=np.int32)
            np.cumsum(votes, axis=0, out=cs[1:])
            e = (offs[d0:d1 + 1] - a).astype(np.int64)
            acc = cs[e[1:]] - cs[e[:-1]]
            bits = (acc > 0).astype(np.uint64)
            packed = np.zeros(d1 - d0, dtype=np.uint64)
            for j in range(64):
                packed |= bits[:, j] << np.uint64(j)
            sigs[d0:d1] = packed
        d0 = d1
    return sigs


#: byte-popcount lookup for vectorized Hamming distance on uint64 sketches
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

_SIMHASH_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()), ("capped", pa.bool_()),
])


def _simhash_pairs_block(t: pa.Table) -> pa.Table:
    """SimHash bucket stage over one hash partition (see
    :func:`_bucket_candidates`): candidates verified by Hamming<=3 on the
    full 64-bit sketch (byte-table popcount, no per-pair Python)."""
    n = t.num_rows
    if n == 0:
        return _SIMHASH_SCHEMA.empty_table()
    band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = t["key"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    ch = t["chash"].to_numpy(zero_copy_only=False)
    sigs = t["sig"].to_numpy(zero_copy_only=False).astype(np.int64) \
        .view(np.uint64)

    ex_a, ex_b, r_id, r_sig, a_idx, b_idx, pair_cap = \
        _bucket_candidates(band, key, ids, ch, sigs)
    if len(a_idx):
        x = (r_sig[a_idx] ^ r_sig[b_idx]).view(np.uint8).reshape(-1, 8)
        ham = _POP8[x].sum(axis=1)
        keep = ham <= 3
    else:
        keep = np.zeros(0, dtype=bool)
    return pa.table({
        "doc_a": pa.array(np.concatenate([ex_a, r_id[a_idx[keep]]]),
                          type=pa.int64()),
        "doc_b": pa.array(np.concatenate([ex_b, r_id[b_idx[keep]]]),
                          type=pa.int64()),
        "capped": pa.array(np.concatenate(
            [np.zeros(len(ex_a), dtype=bool), pair_cap[keep]])),
    })


def q_dedup_simhash(sf_dir: str, method: str = "hash"):
    """SimHash near-dup pairs: 4x16-bit band blocking then Hamming<=3
    verify — same bounded-bucket find->verify shape as MinHash-LSH
    (exact-collapse by content hash, capped all-pairs, every-band emit
    with dedup at collection; output carries the ``capped`` flag).
    ``method="hash"`` (default) runs the bucket stage as a hash-keyed
    exchange + one vectorized pass per partition
    (:func:`engine.stages.hash_group_exchange`); ``method="mapgroups"``
    keeps the per-group body as the semantics oracle (pytest pins both
    paths to the identical table)."""
    _ = np  # noqa

    def sketch(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        chash = _content_hash(t["text"])
        sigs = simhash_batch(t["text"])
        n = len(ids)
        bands = np.tile(np.arange(4, dtype=np.int32), n)
        keys = np.empty(n * 4, dtype=np.int64)
        for b in range(4):
            keys[b::4] = ((sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)) \
                .astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 4), type=pa.int64()),
            "band": pa.array(bands),
            "key": pa.array(keys, type=pa.int64()),
            "chash": pa.array(np.repeat(chash, 4), type=pa.int64()),
            "sig": pa.array(np.repeat(sigs.view(np.int64), 4), type=pa.int64()),
        })

    def bucket_pairs(group):
        import pandas as pd
        band = int(group["band"].iloc[0])
        ids = group["doc_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        ch = group["chash"].to_numpy()[order]
        sg = group["sig"].to_numpy()[order].astype(np.int64).view(np.uint64)
        a_out, b_out, cap_out = [], [], []

        by_ch: dict = {}
        sig_of: dict = {}
        for d, c, s in zip(ids, ch, sg):
            by_ch.setdefault(int(c), []).append(int(d))
            sig_of[int(d)] = np.uint64(s)
        reps = []
        for c, members in by_ch.items():
            reps.append(members[0])
            if band == 0:
                for m in members[1:]:
                    a_out.append(members[0]); b_out.append(m)
                    cap_out.append(False)
        reps.sort()
        capped = len(reps) > _BUCKET_CAP

        def emit(da, db):
            sa, sb = sig_of[da], sig_of[db]
            if bin(int(sa ^ sb)).count("1") <= 3:
                a_out.append(da); b_out.append(db)
                cap_out.append(capped)

        if capped:
            for m in reps[1:]:
                emit(reps[0], m)
        else:
            for i in range(len(reps)):
                for j in range(i + 1, len(reps)):
                    emit(reps[i], reps[j])
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out,
                             "capped": cap_out})

    if method == "hash":
        from engine.stages import hash_group_exchange
        df = hash_group_exchange(
            lambda: _docs(sf_dir, ["doc_id", "text"], num_blocks=16)
            .map_batches(sketch, batch_format="pyarrow", batch_size=None),
            ["band", "key"], _simhash_pairs_block,
            rows_hint=_doc_rows(sf_dir) * 4)
    else:
        out = _docs(sf_dir, ["doc_id", "text"], num_blocks=16) \
            .map_batches(sketch, batch_format="pyarrow", batch_size=None) \
            .groupby(["band", "key"]) \
            .map_groups(bucket_pairs, batch_format="pandas")
        df = out.to_pandas()
    if df.empty or "doc_a" not in df.columns:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "capped": pa.array([], type=pa.bool_())})
    df = df.groupby(["doc_a", "doc_b"], as_index=False) \
           .agg(capped=("capped", "max")) \
           .sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.table({"doc_a": pa.array(df["doc_a"].astype(np.int64)),
                     "doc_b": pa.array(df["doc_b"].astype(np.int64)),
                     "capped": pa.array(df["capped"].astype(bool))})


# ---------------------------------------------------------------------------
# exact n-gram Jaccard within bounded blocking groups (rows-only)
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact pairwise word-3-gram Jaccard >= 0.3 within (source, lang,
    length-band) blocking groups.

    The length band bounds group SIZE in the common case and is
    semantically safe: the band is computed from each doc's DISTINCT
    shingle-SET size (not word-position count — a repetitive doc has a
    large position count but a small set, and banding on positions could
    silently place a qualifying pair >2 bands apart).  Jaccard >= 0.3
    forces the set-size ratio <= 1/0.3 < 4, so floor-log2 bands of a
    qualifying pair differ by at most 2: each doc is replicated into its
    own band plus the two above, and a pair is scored only in the band of
    its larger member — any qualifying pair shares exactly one scoring
    band.  Degenerate floods are additionally capped at ``_BUCKET_CAP``
    members per group (star fallback, flagged via the ``capped`` column)
    so no group is ever O(n^2)-unbounded — the true at-scale path for
    this semantics is MinHash-LSH above, which approximates this query."""
    def explode(t: pa.Table) -> pa.Table:
        # distinct shingle-hash count per doc (vectorized segment-unique)
        S, oo = _shingle_hashes_batch(t["text"])
        counts = oo[1:] - oo[:-1]
        n = len(counts)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((S, doc_idx))
        s2, d2 = S[order], doc_idx[order]
        new = np.ones(len(s2), dtype=bool)
        if len(s2) > 1:
            new[1:] = (s2[1:] != s2[:-1]) | (d2[1:] != d2[:-1])
        distinct = np.bincount(d2[new], minlength=n).astype(np.int64)
        band = np.floor(np.log2(np.maximum(distinct, 1))).astype(np.int32)
        parts = []
        for d in range(3):
            parts.append(pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"], "lang": t["lang"], "text": t["text"],
                "own_band": pa.array(band, type=pa.int32()),
                "gband": pa.array(band + d, type=pa.int32()),
            }))
        return pa.concat_tables(parts)

    def pairs_of(group):
        import pandas as pd
        gband = int(group["gband"].iloc[0])
        rows = sorted(zip(group["doc_id"], group["text"], group["own_band"]))
        if len(rows) > _BUCKET_CAP:
            # bounded degrade (O(k)): exact-collapse identical texts first
            # (star per content group, Jaccard 1000 — k identical boilerplate
            # docs never cost k^2), then a star among distinct-content reps
            a, b, jm, cap = [], [], [], []
            by_text: dict = {}
            for d, txt, ob in rows:
                by_text.setdefault(txt, []).append((int(d), int(ob)))
            reps = []
            for txt, members in by_text.items():
                reps.append((members[0][0], txt, members[0][1]))
                for d, ob in members[1:]:
                    if ob == gband:  # identical texts: same band; emit once
                        a.append(members[0][0]); b.append(d); jm.append(1000)
                        cap.append(False)
            reps.sort()
            anchor = reps[0]
            sh0 = _word_shingles(anchor[1])
            for d, txt, ob in reps[1:]:
                if max(anchor[2], ob) != gband:
                    continue
                s = _word_shingles(txt)
                un = len(sh0 | s)
                jac = len(sh0 & s) / un if un else 0.0
                if jac >= 0.3:
                    a.append(anchor[0]); b.append(int(d))
                    jm.append(int(jac * 1000 + 0.5)); cap.append(True)
            return pd.DataFrame({"doc_a": a, "doc_b": b, "jaccard_milli": jm,
                                 "capped": cap})
        sh = [(_word_shingles(t), d, int(ob)) for d, t, ob in rows]
        a, b, jm, cap = [], [], [], []
        for i in range(len(sh)):
            for j in range(i + 1, len(sh)):
                if max(sh[i][2], sh[j][2]) != gband:
                    continue  # this pair is scored in its larger member's band
                un = len(sh[i][0] | sh[j][0])
                jac = len(sh[i][0] & sh[j][0]) / un if un else 0.0
                if jac >= 0.3:
                    a.append(sh[i][1]); b.append(sh[j][1])
                    jm.append(int(jac * 1000 + 0.5)); cap.append(False)
        return pd.DataFrame({"doc_a": a, "doc_b": b, "jaccard_milli": jm,
                             "capped": cap})

    out = _docs(sf_dir, ["doc_id", "source", "lang", "text"]) \
        .map_batches(explode, batch_format="pyarrow", batch_size=None) \
        .groupby(["source", "lang", "gband"]) \
        .map_groups(pairs_of, batch_format="pandas")
    df = out.to_pandas()
    if df.empty or "doc_a" not in df.columns:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard_milli": pa.array([], type=pa.int64()),
                         "capped": pa.array([], type=pa.bool_())})
    df = df.groupby(["doc_a", "doc_b"], as_index=False) \
           .agg(jaccard_milli=("jaccard_milli", "first"),
                capped=("capped", "max")) \
           .sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.table({"doc_a": pa.array(df["doc_a"].astype(np.int64)),
                     "doc_b": pa.array(df["doc_b"].astype(np.int64)),
                     "jaccard_milli": pa.array(df["jaccard_milli"].astype(np.int64)),
                     "capped": pa.array(df["capped"].astype(bool))})


def q_dedup_normalized(sf_dir: str):
    """Normalization-aware exact dedup: :func:`q_dedup_exact` keyed on the
    canonical form from :func:`engine.text.normalize_text` (ASCII
    casefold + whitespace collapse), so case/whitespace-only variants
    collapse to one survivor.  Same plan and bounds as the byte-exact
    variant — the normalization is a free rider inside the partial map;
    the 2^-64 hash-collision trade and min-id-wins rule are identical."""
    from engine.text import normalize_text

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        norm = normalize_text(t["text"])
        h = pd.util.hash_pandas_object(
            pd.Series(norm.to_pandas()), index=False).to_numpy()
        g = pa.TableGroupBy(pa.table({
            "h": pa.array(h.view(np.int64)),
            "doc_id": pc.cast(t["doc_id"], pa.int64())}), "h") \
            .aggregate([("doc_id", "min")])
        return pa.table({"h": g["h"], "doc_id": g["doc_id_min"]})

    from ray.data.aggregate import Min
    out = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.map_batches(lambda t: t.select(["doc_id"]),
                           batch_format="pyarrow")


SQL_DEDUP_NORMALIZED = r"""
SELECT min(doc_id)::BIGINT AS doc_id FROM documents
GROUP BY trim(regexp_replace(translate(coalesce(text, ''),
             'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
         '[\t\n\f\r ]+', ' ', 'g'), ' ')
"""


# ---------------------------------------------------------------------------
# shingle-containment pairs: inverted index with a document-frequency cap
# ---------------------------------------------------------------------------

_CONT_DF_CAP = 16    # shingles in more docs than this are stop-shingles
_CONT_MIN_MILLI = 500  # report pairs with containment >= 0.5


def q_containment_pairs(sf_dir: str):
    """Asymmetric near-CONTAINMENT pairs (Broder): for docs a < b, the
    fraction of the smaller doc's distinct word-3-gram shingles that the
    other doc also has — catches a short doc quoted whole inside a long
    one, which Jaccard misses (the union washes the overlap out) and
    size-banded blocking cannot reach (qualifying pairs may be ANY sizes
    apart).

    Plan — the classic inverted-index join with stop-shingle removal,
    exact BY DEFINITION over the rare-shingle sets: per-batch distinct
    (shingle, doc) partials; ONE exchange keyed on the shingle string
    co-locates each posting list, so the per-partition document frequency
    IS the global df; shingles with df > ``_CONT_DF_CAP`` are dropped as
    stop-shingles (the df cap is part of the operator's SEMANTICS —
    mirrored in the oracle — and is what bounds the pair expansion to
    df*(df-1)/2 <= CAP^2/2 rows per shingle at any corpus size); the
    surviving posting lists expand to (doc_a, doc_b, 1) pair partials and
    (doc, rare-count) size partials in one vectorized segment pass.  Only
    folded partials — candidate pairs that actually share a rare shingle,
    plus one size row per doc — reach the driver; shingle strings never
    leave the exchange."""
    import pandas as pd

    from engine.stages import hash_group_exchange
    from engine.text import _split_tokens

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(txt)
        counts = offs[1:] - offs[:-1]
        n = len(counts)
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        empty = pa.table({"g": pa.array([], type=pa.string()),
                          "doc_id": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        local = (np.arange(len(doc_idx), dtype=np.int64)
                 - np.repeat(offs[:-1], counts))
        # full 3-gram positions
        li = np.flatnonzero(local < counts[doc_idx] - 2)
        parts, docs_of = [], []
        if len(li):
            parts.append(pc.binary_join_element_wise(
                flat.take(pa.array(li)), flat.take(pa.array(li + 1)),
                flat.take(pa.array(li + 2)), " "))
            docs_of.append(doc_idx[li])
        # short docs (1..2 real words): one shingle joining all words;
        # the zero-length artifact token marks an EMPTY doc (no shingle,
        # same as the oracle's empty words list)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        short = np.flatnonzero(
            (counts >= 1) & (counts <= 2) & (wlen[offs[:-1]] > 0))
        if short.size:
            one = flat.take(pa.array(offs[:-1][short]))
            two_mask = counts[short] == 2
            joined = one
            if two_mask.any():
                nxt = flat.take(pa.array(
                    np.minimum(offs[:-1][short] + 1, len(flat) - 1)))
                joined = pc.if_else(pa.array(two_mask),
                                    pc.binary_join_element_wise(one, nxt, " "),
                                    one)
            parts.append(joined)
            docs_of.append(short)
        if not parts:
            return empty
        g_all = pa.concat_arrays([p.combine_chunks()
                                  if isinstance(p, pa.ChunkedArray) else p
                                  for p in parts])
        d_all = np.concatenate(docs_of)
        tb = pa.table({"g": g_all,
                       "doc_id": pa.array(dids[d_all], type=pa.int64())})
        gb = pa.TableGroupBy(tb, ["g", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"g": gb["g"], "doc_id": gb["doc_id"]})

    def fold_postings(t: pa.Table) -> pa.Table:
        # distinct again (same (g, doc) may arrive from several batches —
        # doc splitting never does this, but stay safe), then df filter
        gb = pa.TableGroupBy(t, ["g", "doc_id"]).aggregate([([], "count_all")])
        codes, _u = pd.factorize(gb["g"].to_pandas(), sort=False)
        d = gb["doc_id"].to_numpy(zero_copy_only=False)
        df_per = np.bincount(codes)
        keep = df_per[codes] <= _CONT_DF_CAP
        codes, d = codes[keep], d[keep]
        out_a, out_b, out_n = [], [], []
        # size partials: rare-shingle count per doc
        su, sc = np.unique(d, return_counts=True)
        out_a.append(su)
        out_b.append(np.full(len(su), -1, dtype=np.int64))
        out_n.append(sc.astype(np.int64))
        # pair partials: expand each surviving posting list
        if len(codes):
            order = np.lexsort((d, codes))
            c2, d2 = codes[order], d[order]
            new = np.ones(len(c2), dtype=bool)
            new[1:] = c2[1:] != c2[:-1]
            seg_start = np.flatnonzero(new)
            seg_id = np.cumsum(new) - 1
            local = np.arange(len(c2), dtype=np.int64) - seg_start[seg_id]
            b_idx = np.repeat(np.arange(len(c2), dtype=np.int64), local)
            csl = np.zeros(len(local) + 1, dtype=np.int64)
            np.cumsum(local, out=csl[1:])
            a_idx = (np.arange(csl[-1], dtype=np.int64)
                     - np.repeat(csl[:-1], local)
                     + np.repeat(seg_start[seg_id], local))
            if len(b_idx):
                pr = pd.DataFrame({"a": d2[a_idx], "b": d2[b_idx]})
                agg = pr.groupby(["a", "b"], as_index=False).size()
                out_a.append(agg["a"].to_numpy(dtype=np.int64))
                out_b.append(agg["b"].to_numpy(dtype=np.int64))
                out_n.append(agg["size"].to_numpy(dtype=np.int64))
        return pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                         "doc_b": pa.array(np.concatenate(out_b)),
                         "n": pa.array(np.concatenate(out_n))})

    import os as _os

    import pyarrow.parquet as _pq
    n_docs = _pq.read_metadata(
        _os.path.join(sf_dir, "documents.parquet")).num_rows
    df = hash_group_exchange(
        lambda: _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow"),
        ["g"], fold_postings, collect=True, rows_hint=max(1, n_docs) * 128)
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64()),
                      "inter": pa.array([], type=pa.int64()),
                      "containment_milli": pa.array([], type=pa.int64())})
    if df.empty or "doc_a" not in df.columns:
        return empty
    folded = df.groupby(["doc_a", "doc_b"], as_index=False)["n"].sum()
    sizes = folded[folded["doc_b"] == -1].set_index("doc_a")["n"]
    pairs = folded[folded["doc_b"] != -1]
    if pairs.empty:
        return empty
    inter = pairs["n"].to_numpy(dtype=np.float64)
    mn = np.minimum(sizes.reindex(pairs["doc_a"]).to_numpy(dtype=np.float64),
                    sizes.reindex(pairs["doc_b"]).to_numpy(dtype=np.float64))
    milli = np.floor(1000.0 * inter / mn + 0.5).astype(np.int64)
    keep = milli >= _CONT_MIN_MILLI
    out = pairs.loc[keep].assign(containment_milli=milli[keep]) \
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.table({
        "doc_a": pa.array(out["doc_a"].astype(np.int64)),
        "doc_b": pa.array(out["doc_b"].astype(np.int64)),
        "inter": pa.array(out["n"].astype(np.int64)),
        "containment_milli": pa.array(out["containment_milli"].astype(np.int64)),
    })


SQL_CONTAINMENT_PAIRS = f"""
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id,
         regexp_extract_all(text, '\\S+') AS words
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(words) = 0 THEN []::VARCHAR[]
              WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
              ELSE list_distinct(list_transform(range(len(words) - 2),
                   i -> words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]))
         END AS sh
  FROM w
), e AS (
  SELECT doc_id, unnest(sh) AS g FROM s
), r AS (
  SELECT doc_id, g FROM e
  QUALIFY count(*) OVER (PARTITION BY g) <= {_CONT_DF_CAP}
), sz AS (
  SELECT doc_id, count(*)::BIGINT AS n_rare FROM r GROUP BY 1
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
  FROM r a JOIN r b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       floor(1000.0 * inter
             / least(sa.n_rare, sb.n_rare) + 0.5)::BIGINT
           AS containment_milli
FROM p
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE floor(1000.0 * inter / least(sa.n_rare, sb.n_rare) + 0.5)
      >= {_CONT_MIN_MILLI}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# per-source duplication rate (gated)
# ---------------------------------------------------------------------------

def dup_rate_fold_block(t: pa.Table) -> pa.Table:
    """content-hash-partition kernel: the partition owns every row of
    its hashes, so the global canonical (min doc_id) is local; fold to
    per-source (n_docs, n_dup) partials."""
    if t.num_rows == 0:
        return pa.schema([("source", pa.string()),
                          ("n_docs", pa.int64()),
                          ("n_dup", pa.int64())]).empty_table()
    h = t["h"].to_numpy(zero_copy_only=False)
    did = t["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((did, h))
    hs, ds_ = h[order], did[order]
    new = np.ones(len(hs), dtype=bool)
    if len(hs) > 1:
        new[1:] = hs[1:] != hs[:-1]
    canon = ds_[np.flatnonzero(new)][np.cumsum(new) - 1]   # min id per hash
    is_dup = (ds_ != canon)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    g = pa.TableGroupBy(pa.table({
        "source": t["source"],
        "n_docs": pa.array(np.ones(len(h), dtype=np.int64)),
        "n_dup": pa.array(is_dup[inv].astype(np.int64))}), ["source"]) \
        .aggregate([("n_docs", "sum"), ("n_dup", "sum")])
    return pa.table({"source": g["source"],
                     "n_docs": pc.cast(g["n_docs_sum"], pa.int64()),
                     "n_dup": pc.cast(g["n_dup_sum"], pa.int64())})


def q_dup_rate_by_source(sf_dir: str):
    """Per-source EXACT duplication rate: the fraction of each source's
    docs whose text already exists under a smaller doc_id anywhere in
    the corpus — the first number a mixture designer asks for per
    acquisition channel.  Per-batch rows carry only (content-hash,
    doc_id, source); ONE hash-keyed exchange makes min-id canonical
    selection global; each partition folds to <= |sources| rows.  Same
    2^-64 collision trade as q_dedup_exact (text never shuffles); the
    oracle's md5 makes the same pairing on its side."""
    import pandas as pd

    from engine.stages import hash_group_exchange

    def partial(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(pc.fill_null(t["text"], "").to_pandas()),
            index=False).to_numpy().view(np.int64)
        return pa.table({"h": pa.array(h),
                         "doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "source": t["source"]})

    df = hash_group_exchange(
        lambda: _docs(sf_dir, ["doc_id", "source", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["h"], dup_rate_fold_block, rows_hint=_doc_rows(sf_dir))
    if df is None or df.empty or "source" not in df.columns:
        return pa.schema([("source", pa.string()),
                          ("n_docs", pa.int64()), ("n_dup", pa.int64()),
                          ("dup_milli", pa.int64())]).empty_table()
    agg = df.groupby("source", as_index=False).sum() \
        .sort_values("source", ignore_index=True)
    n = agg["n_docs"].astype(int).to_numpy()
    d = agg["n_dup"].astype(int).to_numpy()
    return pa.table({
        "source": pa.array(agg["source"], type=pa.string()),
        "n_docs": pa.array(n, type=pa.int64()),
        "n_dup": pa.array(d, type=pa.int64()),
        "dup_milli": pa.array(1000 * d // n, type=pa.int64())})


SQL_DUP_RATE_BY_SOURCE = """
WITH h AS (
  SELECT doc_id, source, coalesce(text, '') AS ct FROM documents
), c AS (
  SELECT ct, min(doc_id) AS canon FROM h GROUP BY 1
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN doc_id != canon THEN 1 ELSE 0 END)::BIGINT AS n_dup,
       ((1000 * sum(CASE WHEN doc_id != canon THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS dup_milli
FROM h JOIN c USING (ct)
GROUP BY source ORDER BY source
"""
