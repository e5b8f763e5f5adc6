"""Similarity search over the ``embeddings`` table (``list<float>`` column).

* brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read per worker), per-batch top-k, tiny
  driver merge — the exact-baseline.  Gated: DuckDB's
  ``list_cosine_similarity`` reproduces it;
* LSH-bucketed ANN (random hyperplanes): the scale path — probe only the
  query's bucket ring instead of every row;
* embedding cosine near-dup pairs: hyperplane blocking + exact verify.

All math in float64 so the DuckDB (double) oracle ranks identically.
"""

from __future__ import annotations

import os
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.dedup import _BUCKET_CAP

QUERY_IDS = [0, 1, 2]
TOP_K = 5


def _emb(sf_dir: str):
    from engine.io import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))


def _batch_mat(t: pa.Table) -> np.ndarray:
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if t.num_rows == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(t.num_rows, -1)


def _emb_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows


_EMPTY_TOPK = {"query_id": pa.int64(), "neighbor_id": pa.int64(),
               "rank": pa.int64()}
_EMPTY_ANN = {**_EMPTY_TOPK, "sim_micro": pa.int64()}


def _empty_table(spec: dict) -> pa.Table:
    return pa.table({k: pa.array([], type=v) for k, v in spec.items()})


def _query_matrix(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    mask = pc.is_in(t["vec_id"], value_set=pa.array(QUERY_IDS))
    qt = t.filter(mask).sort_by("vec_id")
    return _batch_mat(qt)


def q_simsearch_topk(sf_dir: str):
    """Brute-force cosine top-5 per query vector (exact ANN baseline).

    Per batch: one float64 matmul against the broadcast query matrix plus a
    partial top-k; the driver merges ~k rows per batch.  Ties break on
    neighbor_id so ranking is deterministic."""
    if _emb_rows(sf_dir) == 0:
        return _empty_table(_EMPTY_TOPK)
    import ray
    Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put(qn)

    def partial_topk(t: pa.Table) -> pa.Table:
        qn = ray.get(q_ref)
        M = _batch_mat(t)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        sims = (M / norms[:, None]) @ qn.T          # (n, n_query)
        ids = pc.cast(t["vec_id"], pa.int64()).to_numpy()
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(QUERY_IDS):
            s = sims[:, qi]
            keep = ids != qid
            idx = np.flatnonzero(keep)
            if idx.size == 0:
                continue
            # partial top-k with (sim desc, id asc) determinism
            order = np.lexsort((ids[idx], -s[idx]))[:TOP_K]
            sel = idx[order]
            out_q += [qid] * len(sel)
            out_n += ids[sel].tolist()
            out_s += s[sel].tolist()
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    parts = _emb(sf_dir).map_batches(partial_topk, batch_format="pyarrow",
                                     batch_size=None).to_pandas()
    rows = []
    for qid in QUERY_IDS:
        g = parts[parts.query_id == qid] \
            .sort_values(["sim", "neighbor_id"], ascending=[False, True]) \
            .head(TOP_K)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            rows.append((qid, int(r.neighbor_id), rank))
    return pa.table({"query_id": pa.array([r[0] for r in rows], type=pa.int64()),
                     "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
                     "rank": pa.array([r[2] for r in rows], type=pa.int64())})


SQL_SIMSEARCH_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN ({','.join(map(str, QUERY_IDS))})
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(e.embedding, q.qe) AS sim
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id,
       row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC)::BIGINT AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (rows-only): the 100 TB path
# ---------------------------------------------------------------------------

_N_PLANES = 8
_PROBE_RADIUS = 2


def _planes(dim: int, seed: int = 424242) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((_N_PLANES, dim))


def _probe_set(qcode: np.ndarray) -> set:
    """Multi-probe ring: the query's bucket plus every code within
    Hamming radius ``_PROBE_RADIUS``."""
    import itertools
    base = int((qcode << np.arange(_N_PLANES, dtype=np.uint32)).sum())
    probes = {base}
    for r in range(1, _PROBE_RADIUS + 1):
        for bits in itertools.combinations(range(_N_PLANES), r):
            m = 0
            for b in bits:
                m |= 1 << b
            probes.add(base ^ m)
    return probes


def ann_index_dir(sf_dir: str) -> str:
    """Build (once, cached by content fingerprint) the physically
    bucket-partitioned ANN layout: one pass over the embeddings computes
    each row's hyperplane sign code and writes Parquet partitioned by
    ``bucket=NNN`` — afterwards a query READS ONLY its probe ring's
    partitions (~14% of rows at 8 planes / radius 2) instead of scanning
    the table.  This is the 100 TB partition-key design: the bucket id IS
    the physical partition."""
    import hashlib
    import ray
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    tag = hashlib.blake2b(
        f"{emb_path}|{st.st_mtime_ns}|{st.st_size}|{_N_PLANES}".encode(),
        digest_size=8).hexdigest()
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    d = os.path.join(base, "graft_ann_index", tag)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    dim = _query_matrix(sf_dir).shape[1]
    P = _planes(dim)

    def add_bucket(t: pa.Table) -> pa.Table:
        M = _batch_mat(t)
        codes = ((M @ P.T) > 0).astype(np.uint32)
        code = (codes << np.arange(_N_PLANES, dtype=np.uint32)).sum(axis=1)
        return t.append_column("bucket", pa.array(code.astype(np.int64)))

    _emb(sf_dir).map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(d, partition_cols=["bucket"])
    with open(marker, "w") as f:
        f.write(tag)
    return d


#: scan accounting of the last q_simsearch_lsh call (per query):
#: {"rows_total": N, "per_query_rows": {qid: rows_read}}
LAST_SCAN: dict = {}


def q_simsearch_lsh(sf_dir: str):
    """Hyperplane-LSH ANN over the bucket-PARTITIONED index: each query
    reads only its probe-ring partitions (multi-probe radius
    ``_PROBE_RADIUS``) and exact-ranks inside the probed set.  On this
    synthetic UNclustered (uniform-random) embedding table, 8 planes at
    radius 2 read ~14% of rows for ~0.4 mean recall of the exact top-5 —
    real embedding corpora cluster, where the same setting does far
    better.  Scan fractions of the last call are recorded in
    ``LAST_SCAN`` (asserted <25% per query in the recall test)."""
    if _emb_rows(sf_dir) == 0:
        return _empty_table(_EMPTY_ANN)
    import glob as _glob
    import ray
    Q = _query_matrix(sf_dir)
    P = _planes(Q.shape[1])
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qcodes = ((Q @ P.T) > 0).astype(np.uint32)
    idx_dir = ann_index_dir(sf_dir)

    import pyarrow.parquet as pq
    rows_total = pq.read_metadata(os.path.join(sf_dir, "embeddings.parquet")).num_rows
    LAST_SCAN.clear()
    LAST_SCAN["rows_total"] = rows_total
    LAST_SCAN["per_query_rows"] = {}

    rows = []
    for qi, qid in enumerate(QUERY_IDS):
        files = []
        for b in sorted(_probe_set(qcodes[qi])):
            files += _glob.glob(os.path.join(idx_dir, f"bucket={b}", "*.parquet"))
        if not files:
            continue
        ds = ray.data.read_parquet(files, columns=["vec_id", "embedding"])

        def partial(t: pa.Table, _qi=qi, _qid=qid) -> pa.Table:
            M = _batch_mat(t)
            ids = pc.cast(t["vec_id"], pa.int64()).to_numpy()
            keep = ids != _qid
            if not keep.any():
                return pa.table({"neighbor_id": pa.array([], type=pa.int64()),
                                 "sim": pa.array([], type=pa.float64())})
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            s = (M / norms[:, None]) @ qn[_qi]
            hid = ids[keep]
            sk = s[keep]
            order = np.lexsort((hid, -sk))[:TOP_K]
            return pa.table({
                "neighbor_id": pa.array(hid[order], type=pa.int64()),
                "sim": pa.array(sk[order], type=pa.float64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
        LAST_SCAN["per_query_rows"][qid] = sum(
            pq.read_metadata(f).num_rows for f in files)
        g = parts.sort_values(["sim", "neighbor_id"],
                              ascending=[False, True]).head(TOP_K)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            rows.append((qid, int(r.neighbor_id), rank, int(round(r.sim * 1e6))))
    return pa.table({"query_id": pa.array([r[0] for r in rows], type=pa.int64()),
                     "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
                     "rank": pa.array([r[2] for r in rows], type=pa.int64()),
                     "sim_micro": pa.array([r[3] for r in rows], type=pa.int64())})


_EMBDUP_SCHEMA = pa.schema([
    ("vec_a", pa.int64()), ("vec_b", pa.int64()),
    ("cos_micro", pa.int64()), ("capped", pa.bool_()),
])


def _embdup_block(t: pa.Table) -> pa.Table:
    """Vectorized near-dup bucket stage over ONE hash partition holding
    many whole hyperplane buckets: exact-collapse identical embeddings
    (star around the min vec_id, cos exactly 1.0), capped star degrade
    past _BUCKET_CAP distinct embeddings, all-pairs otherwise; candidate
    scores are ONE rowwise-dot ``einsum`` over every pair in the
    partition (may differ from the per-bucket matmul path by the last
    micro — the same drift the result fold already tolerates between its
    own matvec/matmul paths)."""
    n = t.num_rows
    if n == 0:
        return _EMBDUP_SCHEMA.empty_table()
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    col = t["emb"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64) \
        .reshape(n, -1)
    _, eid = np.unique(V, axis=0, return_inverse=True)  # embedding class
    order = np.lexsort((ids, eid, bucket))
    bucket, eid, ids = bucket[order], eid[order], ids[order]

    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = bucket[1:] != bucket[:-1]
    new_sub = new_grp.copy()                 # new (bucket, embedding) class
    new_sub[1:] |= eid[1:] != eid[:-1]

    # exact star pairs: identical embeddings (cos exactly 1.0).  Each
    # vector lives in exactly ONE bucket, so every bucket emits its stars.
    pos = np.arange(n, dtype=np.int64)
    sub_start = np.maximum.accumulate(np.where(new_sub, pos, 0))
    ex_mask = ~new_sub
    ex_a, ex_b = ids[sub_start[ex_mask]], ids[ex_mask]

    # reps: min vec_id per (bucket, embedding) class, re-sorted by id
    r_bucket, r_id = bucket[new_sub], ids[new_sub]
    r_row = order[new_sub]                   # original row of each rep
    o2 = np.lexsort((r_id, r_bucket))
    r_bucket, r_id, r_row = r_bucket[o2], r_id[o2], r_row[o2]
    Vr = V[r_row]
    nr = np.linalg.norm(Vr, axis=1)
    nr[nr == 0] = 1.0
    Vrn = Vr / nr[:, None]
    m = len(r_id)
    new_g = np.empty(m, dtype=bool)
    new_g[0] = True
    new_g[1:] = r_bucket[1:] != r_bucket[:-1]
    g_start = np.flatnonzero(new_g)
    g_size = np.diff(np.append(g_start, m))
    g_capped = g_size > _BUCKET_CAP
    grp_of = np.cumsum(new_g) - 1
    row_capped = g_capped[grp_of]
    star_b = np.flatnonzero(row_capped & ~new_g)
    star_a = g_start[grp_of[star_b]]
    un = np.flatnonzero((~g_capped) & (g_size >= 2))
    if un.size:
        sz, gs = g_size[un], g_start[un]
        ti, tj = np.triu_indices(int(sz.max()), k=1)
        rows, cols = np.nonzero(tj[None, :] < sz[:, None])
        ap_a, ap_b = gs[rows] + ti[cols], gs[rows] + tj[cols]
    else:
        ap_a = ap_b = np.zeros(0, dtype=np.int64)
    a_idx = np.concatenate([star_a, ap_a])
    b_idx = np.concatenate([star_b, ap_b])
    pair_cap = np.concatenate([np.ones(len(star_a), dtype=bool),
                               np.zeros(len(ap_a), dtype=bool)])
    c = np.einsum("ij,ij->i", Vrn[a_idx], Vrn[b_idx]) if len(a_idx) \
        else np.zeros(0)
    keep = c >= 0.99
    return pa.table({
        "vec_a": pa.array(np.concatenate([ex_a, r_id[a_idx[keep]]]),
                          type=pa.int64()),
        "vec_b": pa.array(np.concatenate([ex_b, r_id[b_idx[keep]]]),
                          type=pa.int64()),
        "cos_micro": pa.array(np.concatenate(
            [np.full(len(ex_a), 1_000_000, dtype=np.int64),
             np.rint(c[keep] * 1e6).astype(np.int64)])),
        "capped": pa.array(np.concatenate(
            [np.zeros(len(ex_a), dtype=bool), pair_cap[keep]])),
    })


def q_embedding_near_dup(sf_dir: str, method: str = "hash"):
    """Embedding-cosine near-dup pairs (cosine >= 0.99): hyperplane-band
    blocking, exact verify inside buckets — the embedding analogue of
    MinHash-LSH, with the same bounded-bucket guarantees:

    * identical raw embeddings exact-collapse to a star around the min
      vec_id (cos exactly 1.0): k copies of one boilerplate vector cost
      O(k), never O(k^2);
    * at most ``_BUCKET_CAP`` distinct embeddings per bucket do all-pairs
      (vectorized, no per-pair Python); larger buckets degrade to a
      star around the min rep, flagged via the ``capped`` column.

    ``method="hash"`` (default): hash-keyed bucket exchange + one
    vectorized pass per partition (:func:`_embdup_block`);
    ``method="mapgroups"`` keeps the per-bucket body as the semantics
    oracle (pytest pins the pair SETS equal, scores within 1 micro)."""
    if _emb_rows(sf_dir) == 0:
        return pa.table({'vec_a': pa.array([], type=pa.int64()),
                         'vec_b': pa.array([], type=pa.int64()),
                         'cos_micro': pa.array([], type=pa.int64()),
                         'capped': pa.array([], type=pa.bool_())})
    import pandas as pd
    dim = _query_matrix(sf_dir).shape[1]
    P = _planes(dim, seed=777)

    def sketch(t: pa.Table) -> pa.Table:
        M = _batch_mat(t)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        Mn = M / norms[:, None]
        codes = ((Mn @ P.T) > 0).astype(np.uint32)
        code = (codes << np.arange(_N_PLANES, dtype=np.uint32)).sum(axis=1)
        return pa.table({"vec_id": pc.cast(t["vec_id"], pa.int64()),
                         "bucket": pa.array(code.astype(np.int64)),
                         "emb": t["embedding"]})

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in group["emb"].to_numpy()[order]])
        a, b, sim, cap = [], [], [], []

        # exact-collapse identical embeddings: star around the min vec_id
        # of each identical set (cos exactly 1.0)
        _, first, inv = np.unique(V, axis=0, return_index=True,
                                  return_inverse=True)
        if len(first) < len(ids):
            o2 = np.argsort(inv, kind="stable")
            bnd = np.flatnonzero(np.diff(inv[o2])) + 1
            for seg in np.split(o2, bnd):
                for m in seg[1:]:  # seg[0] = first occurrence = min vec_id
                    a.append(int(ids[seg[0]])); b.append(int(ids[m]))
                    sim.append(1_000_000); cap.append(False)

        reps = np.sort(first)          # id-ascending distinct-embedding reps
        rid = ids[reps]
        Vr = V[reps]
        nr = np.linalg.norm(Vr, axis=1)
        nr[nr == 0] = 1.0
        Vrn = Vr / nr[:, None]
        capped = len(reps) > _BUCKET_CAP
        if capped:
            # bounded degrade: one matvec against the min rep
            c = Vrn[1:] @ Vrn[0]
            for h in np.flatnonzero(c >= 0.99):
                a.append(int(rid[0])); b.append(int(rid[h + 1]))
                sim.append(int(round(c[h] * 1e6))); cap.append(True)
        elif len(reps) > 1:
            G = Vrn @ Vrn.T            # one small matmul, <= CAP x CAP
            iu, ju = np.triu_indices(len(reps), 1)
            for h in np.flatnonzero(G[iu, ju] >= 0.99):
                a.append(int(rid[iu[h]])); b.append(int(rid[ju[h]]))
                sim.append(int(round(G[iu[h], ju[h]] * 1e6))); cap.append(False)
        return pd.DataFrame({"vec_a": a, "vec_b": b, "cos_micro": sim,
                             "capped": cap})

    if method == "hash":
        from engine.stages import hash_group_exchange
        df = hash_group_exchange(
            lambda: _emb(sf_dir).map_batches(
                sketch, batch_format="pyarrow", batch_size=None),
            ["bucket"], _embdup_block, rows_hint=_emb_rows(sf_dir))
    else:
        out = _emb(sf_dir) \
            .map_batches(sketch, batch_format="pyarrow", batch_size=None) \
            .groupby("bucket").map_groups(pairs_of, batch_format="pandas")
        df = out.to_pandas()
    if df.empty or "vec_a" not in df.columns:
        return pa.table({"vec_a": pa.array([], type=pa.int64()),
                         "vec_b": pa.array([], type=pa.int64()),
                         "cos_micro": pa.array([], type=pa.int64()),
                         "capped": pa.array([], type=pa.bool_())})
    # max on both: a pair can surface from a capped star (matvec) and an
    # uncapped matmul bucket whose float sums differ in the last micro —
    # keep-first would make the row depend on block arrival order
    df = df.groupby(["vec_a", "vec_b"], as_index=False) \
           .agg(cos_micro=("cos_micro", "max"), capped=("capped", "max")) \
           .sort_values(["vec_a", "vec_b"], ignore_index=True)
    return pa.table({"vec_a": pa.array(df["vec_a"].astype(np.int64)),
                     "vec_b": pa.array(df["vec_b"].astype(np.int64)),
                     "cos_micro": pa.array(df["cos_micro"].astype(np.int64)),
                     "capped": pa.array(df["capped"].astype(bool))})


# ---------------------------------------------------------------------------
# IVF ANN (rows-only): the clustered-partition scale path
# ---------------------------------------------------------------------------

_IVF_CELLS = 16
_IVF_NPROBE = 4
_IVF_SAMPLE = 2048
_IVF_ITERS = 10


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic spherical k-means centroids trained on a bounded
    sample (driver-side numpy: the sample is ``_IVF_SAMPLE`` rows no
    matter the corpus size — at 100 TB the train set is still KBs)."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    batches = pf.iter_batches(batch_size=_IVF_SAMPLE)
    t = pa.Table.from_batches([next(batches)])
    M = _batch_mat(t)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    X = M / norms[:, None]
    rng = np.random.default_rng(20260817)
    C = X[rng.choice(len(X), size=min(_IVF_CELLS, len(X)), replace=False)]
    for _ in range(_IVF_ITERS):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / (np.linalg.norm(v) or 1.0)
    return C


def ivf_index_dir(sf_dir: str) -> str:
    """Cell-partitioned IVF layout: one pass assigns each row to its
    nearest centroid and writes Parquet partitioned by ``cell=N`` — a
    query probes only its top-``_IVF_NPROBE`` cells' partitions."""
    import hashlib
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    tag = hashlib.blake2b(
        f"ivf|{emb_path}|{st.st_mtime_ns}|{st.st_size}|{_IVF_CELLS}".encode(),
        digest_size=8).hexdigest()
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    d = os.path.join(base, "graft_ann_index", tag)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    C = _ivf_centroids(sf_dir)

    def add_cell(t: pa.Table) -> pa.Table:
        M = _batch_mat(t)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        cell = np.argmax((M / norms[:, None]) @ C.T, axis=1)
        return t.append_column("cell", pa.array(cell.astype(np.int64)))

    _emb(sf_dir).map_batches(add_cell, batch_format="pyarrow") \
        .write_parquet(d, partition_cols=["cell"])
    with open(marker, "w") as f:
        f.write(tag)
    return d


LAST_SCAN_IVF: dict = {}


def q_simsearch_ivf(sf_dir: str):
    """IVF ANN over the cell-partitioned index: rank centroids per query,
    read only the top-``_IVF_NPROBE`` cells' partitions, exact-rank the
    probed rows.  The clustered counterpart of the hyperplane-LSH path —
    on real (clustered) embedding corpora IVF is usually the better
    scale structure.  Scan accounting in ``LAST_SCAN_IVF``."""
    if _emb_rows(sf_dir) == 0:
        return _empty_table(_EMPTY_ANN)
    import glob as _glob
    import ray
    import pyarrow.parquet as pq
    Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    C = _ivf_centroids(sf_dir)
    idx_dir = ivf_index_dir(sf_dir)
    rows_total = pq.read_metadata(os.path.join(sf_dir, "embeddings.parquet")).num_rows
    LAST_SCAN_IVF.clear()
    LAST_SCAN_IVF["rows_total"] = rows_total
    LAST_SCAN_IVF["per_query_rows"] = {}

    rows = []
    for qi, qid in enumerate(QUERY_IDS):
        cells = np.argsort(-(qn[qi] @ C.T))[:_IVF_NPROBE]
        files = []
        for c in cells:
            files += _glob.glob(os.path.join(idx_dir, f"cell={c}", "*.parquet"))
        if not files:
            continue
        ds = ray.data.read_parquet(files, columns=["vec_id", "embedding"])

        def partial(t: pa.Table, _qi=qi, _qid=qid) -> pa.Table:
            M = _batch_mat(t)
            ids = pc.cast(t["vec_id"], pa.int64()).to_numpy()
            keep = ids != _qid
            if not keep.any():
                return pa.table({"neighbor_id": pa.array([], type=pa.int64()),
                                 "sim": pa.array([], type=pa.float64())})
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            s = (M / norms[:, None]) @ qn[_qi]
            hid, sk = ids[keep], s[keep]
            order = np.lexsort((hid, -sk))[:TOP_K]
            return pa.table({"neighbor_id": pa.array(hid[order], type=pa.int64()),
                             "sim": pa.array(sk[order], type=pa.float64())})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
        LAST_SCAN_IVF["per_query_rows"][qid] = sum(
            pq.read_metadata(f).num_rows for f in files)
        g = parts.sort_values(["sim", "neighbor_id"],
                              ascending=[False, True]).head(TOP_K)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            rows.append((qid, int(r.neighbor_id), rank, int(round(r.sim * 1e6))))
    return pa.table({"query_id": pa.array([r[0] for r in rows], type=pa.int64()),
                     "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
                     "rank": pa.array([r[2] for r in rows], type=pa.int64()),
                     "sim_micro": pa.array([r[3] for r in rows], type=pa.int64())})


# ---------------------------------------------------------------------------
# exact similar-pair mining (gated): the O(n^2) baseline of the blocked path
# ---------------------------------------------------------------------------

_SIM_PAIR_MIN = 0.4
_QUANT = 1_000_000.0


def q_embedding_similar_pairs_exact(sf_dir: str):
    """EXACT all-pairs cosine >= 0.4 over the embeddings — the brute-force
    baseline that the hyperplane-blocked ``q_embedding_near_dup`` and the
    ANN indexes approximate (same relationship as ``simsearch_topk`` to
    the LSH/IVF paths).  One quantized matrix broadcast via ``ray.put``,
    one integer matmul per batch against it; O(n * n/batch) — the
    exact-baseline regime, not the 100 TB path.  Pairs emit once
    (id_a < id_b).

    Gate-exactness: embeddings are quantized to micro-integers
    (``floor(x*1e6 + 0.5)``) so every SUM is integer-exact on both sides
    — float summation ORDER (numpy pairwise/SIMD vs DuckDB's loop) can
    flip a micro-rounding boundary otherwise.  The cosine then needs only
    scalar IEEE ops (int->double exact below 2^53, correctly-rounded
    sqrt/div/mul) written in the identical order in numpy and SQL."""
    if _emb_rows(sf_dir) == 0:
        return pa.table({'vec_a': pa.array([], type=pa.int64()),
                         'vec_b': pa.array([], type=pa.int64()),
                         'cos_micro': pa.array([], type=pa.int64())})
    import ray
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids_all = pc.cast(t["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
    Q = np.floor(_batch_mat(t) * _QUANT + 0.5).astype(np.int64)
    nq = (Q * Q).sum(axis=1)                      # integer-exact norms^2
    ref = ray.put((ids_all, Q, nq))

    class PairScan:
        def __init__(self, r):
            self.ids_all, self.Q, self.nq = \
                ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = pc.cast(b["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
            Qb = np.floor(_batch_mat(b) * _QUANT + 0.5).astype(np.int64)
            nqb = (Qb * Qb).sum(axis=1)
            D = Qb @ self.Q.T                     # integer-exact dot products
            # scalar IEEE ops in the SQL's exact order:
            # dot / sqrt(na) / sqrt(nb)
            C = D / np.sqrt(nqb.astype(np.float64))[:, None] \
                / np.sqrt(self.nq.astype(np.float64))[None, :]
            ii, jj = np.nonzero((C >= _SIM_PAIR_MIN)
                                & (ids[:, None] < self.ids_all[None, :]))
            return pa.table({
                "vec_a": pa.array(ids[ii], type=pa.int64()),
                "vec_b": pa.array(self.ids_all[jj], type=pa.int64()),
                "cos_micro": pa.array(
                    np.floor(C[ii, jj] * 1e6 + 0.5).astype(np.int64)),
            })

    out = _emb(sf_dir).map_batches(PairScan, fn_constructor_args=(ref,),
                                   batch_format="pyarrow", batch_size=None,
                                   concurrency=(1, 8), num_cpus=1)
    from engine.pipeline import collect_tables
    tabs = [b for b in collect_tables(out) if b.num_columns]
    res = pa.concat_tables(tabs) if tabs else pa.table(
        {"vec_a": pa.array([], type=pa.int64()),
         "vec_b": pa.array([], type=pa.int64()),
         "cos_micro": pa.array([], type=pa.int64())})
    return res.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


SQL_EMBEDDING_SIMILAR_PAIRS = f"""
WITH q AS (
  SELECT vec_id::BIGINT AS vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1000000 + 0.5)::BIGINT) AS qe
  FROM embeddings
), n AS (
  SELECT vec_id, qe,
         list_sum(list_transform(qe, x -> x * x))::BIGINT AS nq
  FROM q
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(range(len(a.qe)),
                  i -> a.qe[i+1] * b.qe[i+1]))::BIGINT AS dq,
         a.nq AS na, b.nq AS nb
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       floor(dq / sqrt(na) / sqrt(nb) * 1000000 + 0.5)::BIGINT AS cos_micro
FROM p
WHERE na > 0 AND nb > 0 AND dq / sqrt(na) / sqrt(nb) >= {_SIM_PAIR_MIN}
"""


# ---------------------------------------------------------------------------
# SemDeDup: k-means-cluster-scoped semantic dedup (rows-only)
# ---------------------------------------------------------------------------

_SEM_TAU_MICRO = 950_000   # cos >= 0.95 inside a cluster = semantic dup


def q_semantic_dedup(sf_dir: str) -> pa.Table:
    """SemDeDup (Abbas et al., 2023, arXiv:2303.09540): cluster the
    embeddings with k-means, then search for near-duplicates only WITHIN
    each cluster — the restriction that turns corpus-global O(n^2) cosine
    search into independent per-cluster work.  Centroids reuse the
    bounded-sample spherical k-means of the IVF index (driver cost
    independent of corpus size); assignment is a pure map over broadcast
    centroids; the per-cluster verify reuses the exact-collapse +
    ``_BUCKET_CAP`` star recipe so a degenerate cluster degrades to O(k)
    with ``capped=True`` instead of O(k^2).  Keep rule: the MINIMUM
    vec_id of each semantic-dup set survives (deterministic; the paper
    keeps low-centroid-similarity members — swap the order key to
    cos-to-centroid for that variant).  Output per vec: cluster, keep
    verdict, best cosine (micro, floored at 0) to any smaller-id cluster
    member, capped flag."""
    import ray
    import pandas as pd

    if _emb_rows(sf_dir) == 0:
        return pa.table({"vec_id": pa.array([], type=pa.int64()),
                         "cluster": pa.array([], type=pa.int64()),
                         "keep": pa.array([], type=pa.bool_()),
                         "best_sim_micro": pa.array([], type=pa.int64()),
                         "capped": pa.array([], type=pa.bool_())})
    c_ref = ray.put(_ivf_centroids(sf_dir))

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cluster": pa.array([], type=pa.int64()),
                             "emb": pa.array([], type=t.schema.field(
                                 "embedding").type)})
        M = _batch_mat(t)
        C = ray.get(c_ref)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        cl = np.argmax((M / norms[:, None]) @ C.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": pc.cast(t["vec_id"], pa.int64()),
                         "cluster": pa.array(cl),
                         "emb": t["embedding"]})

    def dedup_in(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in group["emb"].to_numpy()[order]])
        n = len(ids)
        best = np.zeros(n, dtype=np.int64)
        cap = np.zeros(n, dtype=bool)
        # exact-collapse: duplicates of an earlier (smaller-id) row are
        # dups at exactly cos 1.0 without touching the matmul
        _, first = np.unique(V, axis=0, return_index=True)
        is_rep = np.zeros(n, dtype=bool)
        is_rep[first] = True
        best[~is_rep] = 1_000_000
        reps = np.sort(first)
        Vr = V[reps]
        nr = np.linalg.norm(Vr, axis=1)
        nr[nr == 0] = 1.0
        Vrn = Vr / nr[:, None]
        if len(reps) > _BUCKET_CAP:
            # bounded degrade: compare every rep against the min-id rep only
            cm = np.round((Vrn[1:] @ Vrn[0]) * 1e6).astype(np.int64)
            best[reps[1:]] = np.maximum(best[reps[1:]], np.maximum(cm, 0))
            cap[:] = True
        elif len(reps) > 1:
            Gm = np.round((Vrn @ Vrn.T) * 1e6).astype(np.int64)
            for j in range(1, len(reps)):   # reps are id-ascending
                best[reps[j]] = max(best[reps[j]], int(Gm[j, :j].max()), 0)
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": np.full(n, int(group["cluster"].iloc[0]),
                               dtype=np.int64),
            "keep": best < _SEM_TAU_MICRO,
            "best_sim_micro": best,
            "capped": cap,
        })

    out = _emb(sf_dir).map_batches(assign, batch_format="pyarrow",
                                   batch_size=None) \
        .groupby("cluster").map_groups(dedup_in, batch_format="pandas")
    df = out.to_pandas()
    if df.empty or "vec_id" not in df.columns:
        return pa.table({"vec_id": pa.array([], type=pa.int64()),
                         "cluster": pa.array([], type=pa.int64()),
                         "keep": pa.array([], type=pa.bool_()),
                         "best_sim_micro": pa.array([], type=pa.int64()),
                         "capped": pa.array([], type=pa.bool_())})
    df = df.sort_values("vec_id", ignore_index=True)
    return pa.table({"vec_id": pa.array(df["vec_id"].astype(np.int64)),
                     "cluster": pa.array(df["cluster"].astype(np.int64)),
                     "keep": pa.array(df["keep"].astype(bool)),
                     "best_sim_micro": pa.array(
                         df["best_sim_micro"].astype(np.int64)),
                     "capped": pa.array(df["capped"].astype(bool))})


# ---------------------------------------------------------------------------
# k-NN self-join over the embeddings (gated)
# ---------------------------------------------------------------------------

_KNN_K = 3


def q_knn_join(sf_dir: str):
    """All-vectors k-NN join: every vector's top-``_KNN_K`` neighbors by
    cosine (the retrieval / embedding-clustering primitive behind
    SemDeDup cluster assignment and hard-negative mining), ranked
    (cosine DESC, neighbor_id ASC).

    Exact-baseline regime like ``q_embedding_similar_pairs_exact``: the
    quantized corpus matrix is broadcast ONCE via ``ray.put`` (id-sorted,
    so a stable argsort on the batch's score rows breaks ties by
    ascending neighbor id with no per-row Python), and each actor does
    one integer matmul per batch.  Gate-exactness: micro-quantized
    integer dot products + scalar IEEE cosine in the oracle's exact
    operation order, so the DESC sort sees bit-identical doubles on both
    sides.  Scale path: cluster-scope the join like ``q_semantic_dedup``
    (IVF cells), or LSH-probe like ``q_simsearch_lsh`` — this query is
    the exactness anchor those approximate."""
    empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                      "neighbor_id": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "cos_micro": pa.array([], type=pa.int64())})
    if _emb_rows(sf_dir) == 0:
        return empty
    import ray
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids_all = pc.cast(t["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
    Q = np.floor(_batch_mat(t) * _QUANT + 0.5).astype(np.int64)
    order = np.argsort(ids_all, kind="stable")   # id-ASC tie-break for free
    ids_all, Q = ids_all[order], Q[order]
    nq = (Q * Q).sum(axis=1)
    ref = ray.put((ids_all, Q, nq))

    class KnnScan:
        def __init__(self, r):
            self.ids_all, self.Q, self.nq = \
                ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = pc.cast(b["vec_id"], pa.int64()).to_numpy(
                zero_copy_only=False)
            Qb = np.floor(_batch_mat(b) * _QUANT + 0.5).astype(np.int64)
            nqb = (Qb * Qb).sum(axis=1)
            D = Qb @ self.Q.T
            C = D / np.sqrt(nqb.astype(np.float64))[:, None] \
                / np.sqrt(self.nq.astype(np.float64))[None, :]
            # exclude self and zero-norm neighbors from every row
            self_col = np.searchsorted(self.ids_all, ids)
            rows = np.arange(len(ids))
            hit = (self_col < len(self.ids_all)) \
                & (self.ids_all[np.minimum(self_col, len(self.ids_all) - 1)]
                   == ids)
            C[rows[hit], self_col[hit]] = -np.inf
            C[:, self.nq == 0] = -np.inf
            C[nqb == 0, :] = -np.inf            # zero-norm queries emit none
            k = min(_KNN_K, C.shape[1])
            nbr = np.argsort(-C, axis=1, kind="stable")[:, :k]
            cos = np.take_along_axis(C, nbr, axis=1)
            keep = np.isfinite(cos)
            ri = np.repeat(ids, k)[keep.ravel()]
            rk = np.tile(np.arange(1, k + 1, dtype=np.int64),
                         len(ids))[keep.ravel()]
            return pa.table({
                "vec_id": pa.array(ri, type=pa.int64()),
                "neighbor_id": pa.array(self.ids_all[nbr.ravel()[keep.ravel()]],
                                        type=pa.int64()),
                "rank": pa.array(rk),
                "cos_micro": pa.array(np.floor(
                    cos.ravel()[keep.ravel()] * 1e6 + 0.5).astype(np.int64)),
            })

    out = _emb(sf_dir).map_batches(KnnScan, fn_constructor_args=(ref,),
                                   batch_format="pyarrow", batch_size=None,
                                   concurrency=(1, 8), num_cpus=1)
    from engine.pipeline import collect_tables
    tabs = [b for b in collect_tables(out) if b.num_columns]
    res = pa.concat_tables(tabs) if tabs else empty
    return res.sort_by([("vec_id", "ascending"), ("rank", "ascending")])


SQL_KNN_JOIN = f"""
WITH q AS (
  SELECT vec_id::BIGINT AS vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1000000 + 0.5)::BIGINT) AS qe
  FROM embeddings
), n AS (
  SELECT vec_id, qe,
         list_sum(list_transform(qe, x -> x * x))::BIGINT AS nq
  FROM q
), p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_sum(list_transform(range(len(a.qe)),
                  i -> a.qe[i+1] * b.qe[i+1]))::BIGINT AS dq,
         a.nq AS na, b.nq AS nb
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
  WHERE a.nq > 0 AND b.nq > 0
)
SELECT vec_id, neighbor_id,
       row_number() OVER (PARTITION BY vec_id
                          ORDER BY dq / sqrt(na) / sqrt(nb) DESC,
                                   neighbor_id ASC)::BIGINT AS rank,
       floor(dq / sqrt(na) / sqrt(nb) * 1000000 + 0.5)::BIGINT AS cos_micro
FROM p
QUALIFY rank <= {_KNN_K}
"""


# ---------------------------------------------------------------------------
# IVF cell-scoped approximate k-NN self-join (rows-only): the 100 TB path
# that q_knn_join anchors
# ---------------------------------------------------------------------------

_KNNJ_NPROBE = 2


def q_knn_join_ivf(sf_dir: str):
    """Approximate k-NN self-join scoped to IVF cells: every vector is a
    MEMBER of its nearest-centroid cell and a QUERY in its top-
    ``_KNNJ_NPROBE`` cells; neighbors are ranked only against the probed
    cells' members.  Two bounded hash exchanges (one chained
    :func:`engine.stages.hash_group_exchange` plan) replace
    ``q_knn_join``'s O(n^2) broadcast matmul: (1) partition by cell and
    score whole cells per block (the IVF replication moves each vector
    ``_KNNJ_NPROBE``x), (2) partition by vec_id and fold <= nprobe*k
    candidate rows per vector into the final top-k with one vectorized
    pass — never one Python call per vector.  Scoring
    is the identical micro-quantized integer cosine as the exact join,
    so overlapping pairs carry bit-identical cos_micro — the recall
    pytest diffs the two directly (rows-only: candidate coverage depends
    on the trained cells, not SQL-expressible)."""
    empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                      "neighbor_id": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "cos_micro": pa.array([], type=pa.int64())})
    if _emb_rows(sf_dir) == 0:
        return empty
    C = _ivf_centroids(sf_dir)
    k = _KNN_K

    def route(t: pa.Table) -> pa.Table:
        M = _batch_mat(t)
        ids = pc.cast(t["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        sims = (M / norms[:, None]) @ C.T
        probes = np.argsort(-sims, axis=1, kind="stable")[:, :_KNNJ_NPROBE]
        home = probes[:, 0]                      # argmax == first probe
        n = len(ids)
        rep_ids = np.tile(ids, _KNNJ_NPROBE)
        rep_cell = probes.T.ravel()
        rep_member = rep_cell == np.tile(home, _KNNJ_NPROBE)
        rep_emb = pa.concat_arrays(
            [t["embedding"].combine_chunks()
             if isinstance(t["embedding"], pa.ChunkedArray)
             else t["embedding"]] * _KNNJ_NPROBE)
        return pa.table({
            "cell": pa.array(rep_cell.astype(np.int64)),
            "vec_id": pa.array(rep_ids),
            "member": pa.array(rep_member),
            "embedding": rep_emb,
        })

    def _one_cell(ids, Q, member):
        """Identical scoring body to the exact join's, scoped to one cell:
        dedupe member rows for the candidate side (id-sorted for the
        stable-argsort tie-break), quantized-integer cosine, top-kk."""
        mi = np.flatnonzero(member)
        mo = mi[np.argsort(ids[mi], kind="stable")]
        mid, Qm = ids[mo], Q[mo]
        nqm = (Qm * Qm).sum(axis=1)
        nq = (Q * Q).sum(axis=1)
        D = Q @ Qm.T
        S = D / np.sqrt(np.maximum(nq, 1).astype(np.float64))[:, None] \
            / np.sqrt(np.maximum(nqm, 1).astype(np.float64))[None, :]
        S[:, nqm == 0] = -np.inf
        S[nq == 0, :] = -np.inf
        S[ids[:, None] == mid[None, :]] = -np.inf      # self
        kk = min(k, S.shape[1])
        nbr = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        cos = np.take_along_axis(S, nbr, axis=1)
        keep = np.isfinite(cos).ravel()
        return (np.repeat(ids, kk)[keep], mid[nbr.ravel()[keep]],
                np.floor(cos.ravel()[keep] * 1e6 + 0.5).astype(np.int64))

    _CAND_SCHEMA = pa.schema([
        ("vec_id", pa.int64()), ("neighbor_id", pa.int64()),
        ("cos_micro", pa.int64())])

    def cells_block(t: pa.Table) -> pa.Table:
        """Score every whole cell in the partition: the Python loop runs
        once per CELL (bounded by the trained cell count, each a heavy
        matmul), never per vector."""
        if t.num_rows == 0:
            return _CAND_SCHEMA.empty_table()
        cell = t["cell"].to_numpy(zero_copy_only=False)
        ids = pc.cast(t["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
        member = t["member"].to_numpy(zero_copy_only=False)
        Q = np.floor(_batch_mat(t).astype(np.float64) * _QUANT + 0.5) \
            .astype(np.int64)
        order = np.argsort(cell, kind="stable")
        cs = cell[order]
        bounds = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1], True])
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            idx = order[s:e]
            outs.append(_one_cell(ids[idx], Q[idx], member[idx]))
        return pa.table({
            "vec_id": pa.array(np.concatenate([o[0] for o in outs])),
            "neighbor_id": pa.array(np.concatenate([o[1] for o in outs])),
            "cos_micro": pa.array(np.concatenate([o[2] for o in outs])),
        })

    def fold_topk_block(t: pa.Table) -> pa.Table:
        """Fold every vector's <= nprobe*k candidate rows in the partition
        at once: within a vec_id, sort by (cos desc, neighbor asc), drop
        duplicate (vec_id, neighbor) rows (same pair scored in two probed
        cells carries bit-identical cos_micro, so any survivor is THE
        value), keep the first k, rank by in-segment position — the
        vectorized twin of the old per-vector map_groups fold."""
        if t.num_rows == 0:
            return empty
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        nbr = t["neighbor_id"].to_numpy(zero_copy_only=False)
        cos = t["cos_micro"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nbr, -cos, vid))
        vid, nbr, cos = vid[order], nbr[order], cos[order]
        first = np.empty(len(vid), dtype=bool)
        first[0] = True
        first[1:] = (vid[1:] != vid[:-1]) | (nbr[1:] != nbr[:-1])
        vid, nbr, cos = vid[first], nbr[first], cos[first]
        n = len(vid)
        new_v = np.empty(n, dtype=bool)
        new_v[0] = True
        new_v[1:] = vid[1:] != vid[:-1]
        pos = np.arange(n, dtype=np.int64)
        seg_pos = pos - np.maximum.accumulate(np.where(new_v, pos, 0))
        keep = seg_pos < k
        return pa.table({
            "vec_id": pa.array(vid[keep]),
            "neighbor_id": pa.array(nbr[keep]),
            "rank": pa.array(seg_pos[keep] + 1),
            "cos_micro": pa.array(cos[keep]),
        })

    from engine.stages import hash_group_exchange
    cands = hash_group_exchange(
        lambda: _emb(sf_dir)
        .map_batches(route, batch_format="pyarrow", batch_size=None),
        [["cell"], ["vec_id"]], [cells_block, fold_topk_block],
        collect=False, rows_hint=_emb_rows(sf_dir) * _KNNJ_NPROBE)
    from engine.pipeline import collect_tables
    tabs = [b for b in collect_tables(cands) if b.num_columns]
    res = pa.concat_tables(
        [t.cast(empty.schema) for t in tabs]) if tabs else empty
    return res.sort_by([("vec_id", "ascending"), ("rank", "ascending")])


# ---------------------------------------------------------------------------
# PQ ANN (rows-only): the compressed-scan scale path (Jegou et al. 2011,
# "Product Quantization for Nearest Neighbor Search", IEEE TPAMI)
# ---------------------------------------------------------------------------

_PQ_M = 16          # subspaces; 4-bit codes pack ALL M into one uint64
_PQ_K = 16          # centroids per subspace
_PQ_SAMPLE = 2048   # codebook train sample (driver cost corpus-independent)
_PQ_ITERS = 10
_PQ_SHORTLIST = 10 * TOP_K   # ADC candidates re-ranked exactly

LAST_PQ: dict = {}


def _pq_codebooks(sf_dir: str) -> list:
    """Deterministic per-subspace k-means codebooks trained on a bounded
    sample of normalized vectors — like :func:`_ivf_centroids`, the train
    set is ``_PQ_SAMPLE`` rows no matter the corpus size."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    t = pa.Table.from_batches([next(pf.iter_batches(batch_size=_PQ_SAMPLE))])
    M = _batch_mat(t)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    X = M / norms[:, None]
    dim = X.shape[1]
    if dim % _PQ_M:
        raise ValueError(f"dim {dim} not divisible by _PQ_M={_PQ_M}")
    d_sub = dim // _PQ_M
    rng = np.random.default_rng(20260818)
    books = []
    for m in range(_PQ_M):
        Xm = X[:, m * d_sub:(m + 1) * d_sub]
        C = Xm[rng.choice(len(Xm), size=min(_PQ_K, len(Xm)), replace=False)]
        for _ in range(_PQ_ITERS):
            d2 = ((Xm[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(len(C)):
                mk = assign == c
                if mk.any():
                    C[c] = Xm[mk].mean(0)
        books.append(C)
    return books


def _pq_encode(X: np.ndarray, books: list) -> np.ndarray:
    """Vectorized encode: per-subspace L2 argmin, 4-bit codes packed into
    ONE uint64 per vector (8 B — a 32x cut vs the raw float64 row)."""
    n, dim = X.shape
    d_sub = dim // _PQ_M
    packed = np.zeros(n, dtype=np.uint64)
    for m, C in enumerate(books):
        Xm = X[:, m * d_sub:(m + 1) * d_sub]
        d2 = (Xm ** 2).sum(1)[:, None] - 2.0 * (Xm @ C.T) + (C ** 2).sum(1)[None, :]
        packed |= d2.argmin(1).astype(np.uint64) << np.uint64(4 * m)
    return packed


def pq_index_dir(sf_dir: str) -> str:
    """Compressed-code index: (vec_id, code uint64) parquet, built once per
    corpus fingerprint.  The ANN scan reads ONLY this table — 8 B/row —
    and raw embeddings are fetched just for the shortlist re-rank."""
    import hashlib
    import pyarrow.parquet as pq
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    tag = hashlib.blake2b(
        f"pq|{emb_path}|{st.st_mtime_ns}|{st.st_size}|{_PQ_M}|{_PQ_K}".encode(),
        digest_size=8).hexdigest()
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    d = os.path.join(base, "graft_ann_index", tag)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    import ray
    books_ref = ray.put(_pq_codebooks(sf_dir))

    def encode(t: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        M = _batch_mat(t)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        return pa.table({"vec_id": pc.cast(t["vec_id"], pa.int64()),
                         "code": pa.array(_pq_encode(M / norms[:, None],
                                                     books))})

    _emb(sf_dir).map_batches(encode, batch_format="pyarrow",
                             batch_size=None).write_parquet(d)
    with open(marker, "w") as f:
        f.write(tag)
    return d


def q_simsearch_pq(sf_dir: str):
    """PQ ANN: asymmetric-distance scan over the 8 B/row code index (one
    query LUT gather-sum per subspace, no per-row float math on raw
    vectors), ADC top-``_PQ_SHORTLIST`` shortlist, exact re-rank of the
    shortlist only.  Complements LSH (bucket-pruned) and IVF
    (cell-pruned): PQ compresses the SCAN itself, and at 100 TB composes
    with IVF (probe cells, then ADC-scan their codes).  Rows-only; recall
    + compression accounting pinned in tests (``LAST_PQ``)."""
    if _emb_rows(sf_dir) == 0:
        return _empty_table(_EMPTY_ANN)
    import ray
    import pyarrow.parquet as pq
    Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    books = _pq_codebooks(sf_dir)
    dim = qn.shape[1]
    d_sub = dim // _PQ_M
    idx_dir = pq_index_dir(sf_dir)
    # (n_query, M, K) inner-product lookup tables — the only query state
    luts = np.stack([
        np.stack([books[m] @ qn[qi, m * d_sub:(m + 1) * d_sub]
                  for m in range(_PQ_M)])
        for qi in range(len(QUERY_IDS))])
    luts_ref = ray.put(luts)

    def adc_scan(t: pa.Table) -> pa.Table:
        luts = ray.get(luts_ref)
        ids = pc.cast(t["vec_id"], pa.int64()).to_numpy()
        code = t["code"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sub = np.empty((len(ids), _PQ_M), dtype=np.int64)
        for m in range(_PQ_M):
            sub[:, m] = ((code >> np.uint64(4 * m)) & np.uint64(15)) \
                .astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(QUERY_IDS):
            score = np.zeros(len(ids))
            for m in range(_PQ_M):
                score += luts[qi, m][sub[:, m]]
            idx = np.flatnonzero(ids != qid)
            order = np.lexsort((ids[idx], -score[idx]))[:_PQ_SHORTLIST]
            sel = idx[order]
            out_q += [qid] * len(sel)
            out_n += ids[sel].tolist()
            out_s += score[sel].tolist()
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "adc": pa.array(out_s, type=pa.float64())})

    parts = ray.data.read_parquet(idx_dir) \
        .map_batches(adc_scan, batch_format="pyarrow", batch_size=None) \
        .to_pandas()
    LAST_PQ.clear()
    n_rows = _emb_rows(sf_dir)
    LAST_PQ["rows_total"] = n_rows
    LAST_PQ["index_bytes_per_row"] = 8
    LAST_PQ["raw_bytes_per_row"] = dim * 8
    short: dict = {}
    for qid in QUERY_IDS:
        g = parts[parts.query_id == qid] \
            .sort_values(["adc", "neighbor_id"], ascending=[False, True]) \
            .head(_PQ_SHORTLIST)
        short[qid] = g.neighbor_id.to_numpy().astype(np.int64)
    LAST_PQ["shortlist"] = {q: len(v) for q, v in short.items()}

    # exact re-rank: fetch raw embeddings for shortlist ids ONLY
    all_ids = np.unique(np.concatenate(list(short.values()))) \
        if short else np.array([], dtype=np.int64)
    ids_ref = ray.put(all_ids)

    def fetch(t: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        mask = pc.is_in(pc.cast(t["vec_id"], pa.int64()),
                        value_set=pa.array(want, type=pa.int64()))
        return t.filter(mask)

    from engine.pipeline import collect_tables
    ft = pa.concat_tables(
        [b for b in collect_tables(_emb(sf_dir).map_batches(
            fetch, batch_format="pyarrow", batch_size=None))
         if b.num_columns])
    fids = pc.cast(ft["vec_id"], pa.int64()).to_numpy()
    FM = _batch_mat(ft)
    fn = np.linalg.norm(FM, axis=1)
    fn[fn == 0] = 1.0
    FMn = FM / fn[:, None]
    pos = {int(v): i for i, v in enumerate(fids)}

    rows = []
    for qi, qid in enumerate(QUERY_IDS):
        cand = short.get(qid, np.array([], dtype=np.int64))
        if not len(cand):
            continue
        sel = np.array([pos[int(c)] for c in cand], dtype=np.int64)
        s = FMn[sel] @ qn[qi]
        order = np.lexsort((cand, -s))[:TOP_K]
        for rank, j in enumerate(order, start=1):
            rows.append((qid, int(cand[j]), rank, int(round(s[j] * 1e6))))
    return pa.table({"query_id": pa.array([r[0] for r in rows], type=pa.int64()),
                     "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
                     "rank": pa.array([r[2] for r in rows], type=pa.int64()),
                     "sim_micro": pa.array([r[3] for r in rows], type=pa.int64())})


# ---------------------------------------------------------------------------
# embedding analytics (gated): quantized norms + per-label centroid sums
# ---------------------------------------------------------------------------

def q_embedding_norms(sf_dir: str):
    """Per-vector squared L2 norm in micro-quantized integers (the
    module's gate convention: q = floor(x*1e6 + 0.5); sum of 64 q^2
    <= 6.4e13, comfortably int64).  Pure map, no shuffle — the health
    check run before any cosine stage (zero-norm vectors break cosine
    and must be flagged, not divided by)."""
    def fn(t: pa.Table) -> pa.Table:
        m = _batch_mat(t)
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "norm2_q": pa.array((q * q).sum(axis=1)),
            "is_zero": pa.array(((q != 0).sum(axis=1) == 0)
                                .astype(np.int64))})

    return _emb(sf_dir).map_batches(fn, batch_format="pyarrow",
                                    batch_size=None).sort("vec_id")


SQL_EMBEDDING_NORMS = """
SELECT vec_id::BIGINT AS vec_id,
       list_sum(list_transform(embedding,
           x -> floor(x::DOUBLE * 1000000 + 0.5)::BIGINT
                * floor(x::DOUBLE * 1000000 + 0.5)::BIGINT))::BIGINT
           AS norm2_q,
       (len(list_filter(embedding,
            x -> floor(x::DOUBLE * 1000000 + 0.5)::BIGINT <> 0)) = 0)
           ::BIGINT AS is_zero
FROM embeddings ORDER BY vec_id
"""


_EMB_DIM = 64


def q_label_centroids(sf_dir: str):
    """Per-label centroid SUMS over the micro-quantized embeddings —
    integer partials, so the gate checks exact values and the consumer
    divides sum_q/n_vecs at whatever precision it wants.  Each batch
    folds its rows into a |labels| x dim matrix (np.add.at — one pass,
    no Python per row), emits |labels| x dim partial rows, and the
    driver combiner-folds.  The k-means seeding of the IVF/SemDeDup
    stages is this exact computation iterated."""
    from engine.pipeline import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        m = _batch_mat(t)
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        lab = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        dim = q.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(ulab, dim)),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                    len(ulab))),
            "sum_q": pa.array(sums.reshape(-1)),
            "n_vecs": pa.array(np.repeat(cnt, dim))})

    tabs = [b for b in collect_tables(
        _emb(sf_dir).map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)) if b.num_columns]
    if not tabs:
        return pa.table({"label": pa.array([], type=pa.int64()),
                         "dim": pa.array([], type=pa.int64()),
                         "sum_q": pa.array([], type=pa.int64()),
                         "n_vecs": pa.array([], type=pa.int64())})
    t = pa.concat_tables(tabs)
    g = pa.TableGroupBy(t, ["label", "dim"]).aggregate(
        [("sum_q", "sum"), ("n_vecs", "sum")])
    out = pa.table({"label": g["label"], "dim": g["dim"],
                    "sum_q": g["sum_q_sum"], "n_vecs": g["n_vecs_sum"]})
    return out.sort_by([("label", "ascending"), ("dim", "ascending")])


SQL_LABEL_CENTROIDS = f"""
WITH d AS (
  SELECT label::BIGINT AS label,
         unnest(generate_series(1, {_EMB_DIM})) AS dpos, embedding
  FROM embeddings
)
SELECT label, (dpos - 1)::BIGINT AS dim,
       sum(floor(embedding[dpos]::DOUBLE * 1000000 + 0.5)::BIGINT)::BIGINT
           AS sum_q,
       count(*)::BIGINT AS n_vecs
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""
