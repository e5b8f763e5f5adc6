"""Deduplication operators over the ``documents`` table.

The scale-path designs (per the ray_guide dedup patterns):

* exact: content-hash column in a vectorized map_batches, per-batch partial
  min, then a tiny groupby over partials — the exchange carries one row per
  distinct hash per batch, never the text;
* MinHash+LSH: shingle -> 64-perm minhash -> band buckets -> bucket groupby
  -> candidate pairs -> exact-Jaccard verify.  Only (band_key, doc_id) rows
  shuffle;
* SimHash: 64-bit sketch, 4x16-bit band blocking, Hamming<=3 verify;
* n-gram Jaccard: exact pairwise within small blocking groups via
  groupby().map_groups;
* embedding cosine near-dup: random-hyperplane LSH buckets + in-bucket
  exact cosine verify (see engine/simsearch.py for the ANN variants).

All randomness is seeded/deterministic; no wall-clock.
"""

from __future__ import annotations

import hashlib
import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 8  # 8 bands x 8 rows


def _docs(sf_dir: str, columns=None):
    import ray
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=columns)


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


# ---------------------------------------------------------------------------
# shingling + MinHash (shared helpers)
# ---------------------------------------------------------------------------

def _word_shingles(text: str, k: int = 3) -> set:
    ws = text.split()
    if len(ws) < k:
        return {" ".join(ws)} if ws else set()
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    sh = _word_shingles(text, k)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "little") for s in sh),
        dtype=np.uint64, count=len(sh))


def _perm_params(seed: int = 1234567):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


_A, _B = _perm_params()


def _minhash(h: np.ndarray) -> np.ndarray:
    """64 permutations of (a*h + b) mod 2^61-1, column-min.  O(shingles x 64)
    numpy ops per doc."""
    h = (h % np.uint64(_MERSENNE)).astype(np.uint64)
    # (n_shingles, 64) in python-int space to dodge uint64 overflow: use
    # object-free trick via np.uint64 modular mult on 128-bit through float is
    # unsafe -> do it in two 32-bit halves
    hi = (h >> np.uint64(32)).astype(np.uint64)
    lo = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    out = np.empty(_N_PERM, dtype=np.uint64)
    for j in range(_N_PERM):
        # (a*h) mod M with M = 2^61-1 using split multiply
        a = _A[j]
        prod_lo = (a * lo) % np.uint64(_MERSENNE)
        prod_hi = (a * hi) % np.uint64(_MERSENNE)
        # hi part shifted by 32: (prod_hi * 2^32) mod M
        shifted = (prod_hi << np.uint64(32)) % np.uint64(_MERSENNE)
        v = (prod_lo + shifted + _B[j]) % np.uint64(_MERSENNE)
        out[j] = v.min()
    return out


def q_dedup_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs, exact-Jaccard verified >= 0.5.

    Stage 1 (map_batches): per-doc shingle/minhash/band keys, exploded to
    (band, key, doc_id) rows — the only rows that shuffle.
    Stage 2 (groupby(band, key).map_groups): emit candidate pairs.
    Stage 3: dedup pairs + exact-Jaccard verify on the pair's shingle sets
    (broadcast of the doc texts for the candidate set, which is small).
    Rows-only driver check (LSH is not SQL-expressible)."""
    import ray

    def band_rows(t: pa.Table) -> pa.Table:
        docs, bands, keys = [], [], []
        for doc, text in zip(pc.cast(t["doc_id"], pa.int64()).to_pylist(),
                             t["text"].to_pylist()):
            mh = _minhash(_shingle_hashes(text))
            for bidx in range(_BANDS):
                seg = mh[bidx * 8:(bidx + 1) * 8]
                key = int.from_bytes(hashlib.blake2b(
                    seg.tobytes(), digest_size=8).digest(), "little")
                docs.append(doc)
                bands.append(bidx)
                keys.append(key - (1 << 63))
        return pa.table({"doc_id": pa.array(docs, type=pa.int64()),
                         "band": pa.array(bands, type=pa.int32()),
                         "key": pa.array(keys, type=pa.int64())})

    def pairs_of(group):
        import pandas as pd
        ids = sorted(group["doc_id"].tolist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i]); b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(band_rows, batch_format="pyarrow", batch_size=None) \
        .groupby(["band", "key"]).map_groups(pairs_of, batch_format="pandas")
    cand_df = cand.to_pandas()
    if cand_df.empty or "doc_a" not in cand_df.columns:
        cand_df = __import__("pandas").DataFrame({"doc_a": [], "doc_b": []})
    cand_df = cand_df.drop_duplicates(ignore_index=True)

    # verify: exact word-3-gram Jaccard on the candidate set.  Only the
    # CANDIDATE documents' texts reach the driver (filter pushed into the
    # read) — the corpus itself never does, so this stays O(candidates)
    # at 100 TB, not O(table).
    cand_ids = set(map(int, cand_df.get("doc_a", []))) | \
        set(map(int, cand_df.get("doc_b", [])))
    texts = {}
    if cand_ids:
        import pyarrow.dataset as pads
        import pyarrow.compute as _pc
        tbl = pads.dataset(os.path.join(sf_dir, "documents.parquet")) \
            .to_table(columns=["doc_id", "text"],
                      filter=_pc.field("doc_id").isin(sorted(cand_ids)))
        texts = dict(zip(pc.cast(tbl["doc_id"], pa.int64()).to_pylist(),
                         tbl["text"].to_pylist()))
    rows = []
    for da, db in zip(cand_df.get("doc_a", []), cand_df.get("doc_b", [])):
        sa, sb = _word_shingles(texts[da]), _word_shingles(texts[db])
        un = len(sa | sb)
        j = len(sa & sb) / un if un else 0.0
        if j >= 0.5:
            rows.append((int(da), int(db), int(round(j * 1000))))
    rows.sort()
    return pa.table({"doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
                     "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
                     "jaccard_milli": pa.array([r[2] for r in rows], type=pa.int64())})


def q_dedup_clusters(sf_dir: str, threshold_milli: int = 500):
    """Near-dup clusters + survivor selection: union-find over the verified
    MinHash-LSH pairs (the candidate graph is small after verification, so
    components resolve on the driver; at a scale where it is not, switch to
    the iterative min-label-propagation groupby the ray_guide describes —
    same output contract).  Survivor = min doc_id per cluster."""
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

def _simhash(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for w in set(text.split()):
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs: 4x16-bit band blocking then Hamming<=3 verify
    (a hash-blocked variant of the same find->verify shape as MinHash)."""
    def sketch(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_pylist()
        hs = [_simhash(s) for s in t["text"].to_pylist()]
        docs, bands, keys, sigs = [], [], [], []
        for d, h in zip(ids, hs):
            for b in range(4):
                docs.append(d); bands.append(b)
                keys.append((h >> (16 * b)) & 0xFFFF)
                sigs.append(h - (1 << 63))
        return pa.table({"doc_id": pa.array(docs, type=pa.int64()),
                         "band": pa.array(bands, type=pa.int32()),
                         "key": pa.array(keys, type=pa.int64()),
                         "sig": pa.array(sigs, type=pa.int64())})

    def pairs_of(group):
        import pandas as pd
        rows = sorted(zip(group["doc_id"], group["sig"]))
        a, b = [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = (rows[i][1] ^ rows[j][1]) & 0xFFFFFFFFFFFFFFFF
                if bin(d).count("1") <= 3:
                    a.append(rows[i][0]); b.append(rows[j][0])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    out = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(sketch, batch_format="pyarrow", batch_size=None) \
        .groupby(["band", "key"]).map_groups(pairs_of, batch_format="pandas")
    df = out.to_pandas()
    if df.empty or "doc_a" not in df.columns:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64())})
    df = df.drop_duplicates(ignore_index=True) \
           .sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.table({"doc_a": pa.array(df["doc_a"].astype(np.int64)),
                     "doc_b": pa.array(df["doc_b"].astype(np.int64))})


# ---------------------------------------------------------------------------
# exact n-gram Jaccard within blocking groups (rows-only)
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact pairwise word-3-gram Jaccard >= 0.3 within (source, lang)
    blocking groups — groupby().map_groups keeps the O(n^2) local."""
    def pairs_of(group):
        import pandas as pd
        rows = sorted(zip(group["doc_id"], group["text"]))
        sh = [(_word_shingles(t), d) for d, t in rows]
        a, b, jm = [], [], []
        for i in range(len(sh)):
            for j in range(i + 1, len(sh)):
                un = len(sh[i][0] | sh[j][0])
                jac = len(sh[i][0] & sh[j][0]) / un if un else 0.0
                if jac >= 0.3:
                    a.append(sh[i][1]); b.append(sh[j][1])
                    jm.append(int(round(jac * 1000)))
        return pd.DataFrame({"doc_a": a, "doc_b": b, "jaccard_milli": jm})

    out = _docs(sf_dir, ["doc_id", "source", "lang", "text"]) \
        .groupby(["source", "lang"]).map_groups(pairs_of, batch_format="pandas")
    df = out.to_pandas()
    if df.empty or "doc_a" not in df.columns:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard_milli": pa.array([], type=pa.int64())})
    df = df.sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.table({"doc_a": pa.array(df["doc_a"].astype(np.int64)),
                     "doc_b": pa.array(df["doc_b"].astype(np.int64)),
                     "jaccard_milli": pa.array(df["jaccard_milli"].astype(np.int64))})
