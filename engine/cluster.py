"""Distributed k-means over the embeddings table — the clustering stage
that cluster-scoped curation pipelines (SemDeDup's per-cluster dedup,
cluster-balanced sampling, IVF index build) sit on top of.  Two
operators:

* ``kmeans_assign`` (DuckDB-gated): nearest-centroid assignment against
  FIXED seed centroids (the K lowest ``vec_id`` embeddings) in
  micro-quantized integer space — squared L2 distance over
  ``floor(x*1e6+0.5)`` components is a pure-integer expression both
  numpy and SQL reproduce bit-exactly (the ``embedding_similar_pairs``
  precedent, engine/simsearch.py).  Ties break to the lower cluster
  index on both sides.
* ``kmeans_train`` (rows-only; iterative — not SQL-expressible):
  full-batch Lloyd iterations where each pass streams the corpus once
  and every batch emits K tiny integer partials (count, component sums,
  inertia).  All arithmetic is int64 on quantized vectors, so the fold
  is ORDER-INDEPENDENT — the trained centroids are bit-identical under
  any block layout / concurrency, unlike float partial sums.  Centroid
  update is the rounded integer mean ``(2*s + c) // (2*c)`` (floor
  semantics shared by numpy and Python); empty clusters keep their
  previous centroid.

Scale shape: centroid seeding is a per-block partial-K-min combiner
(K rows cross per block); each Lloyd pass moves K*(dim+2) ints per
block to the driver and broadcasts K*dim ints back — driver state is
O(K*dim) regardless of corpus size, and the corpus itself never leaves
the object store.  Assignment is a pure map over broadcast centroids.

Reference scope note: the reference engine (src/parser.py) has no
clustering; this is part of the beyond-reference LLM-data family.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.simsearch import _batch_mat, _emb

_K = 8
_ITERS = 4
_QUANT = 1_000_000.0

#: driver-state introspection (the simsearch LAST_* precedent): filled by
#: q_kmeans_train so tests can assert the documented O(K x (dim+2)) driver
#: bound per pass — partial rows grow with BLOCK count only, never rows.
LAST_KMEANS: dict = {}


def _quant(M: np.ndarray) -> np.ndarray:
    return np.floor(M * _QUANT + 0.5).astype(np.int64)


def _seed_centroids(sf_dir: str, k: int = _K):
    """(ids, quantized centroid matrix) for the K globally-smallest
    vec_ids — a per-block partial-K-min combiner, never a full sort."""
    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return t.select(["vec_id", "embedding"]).take(take)

    from engine.pipeline import collect_tables
    parts = [p for p in collect_tables(
        _emb(sf_dir).map_batches(partial, batch_format="pyarrow"))
        if p.num_rows]
    if not parts:
        return (np.zeros(0, dtype=np.int64), np.zeros((0, 0), np.int64))
    allp = pa.concat_tables(parts)
    ids = pc.cast(allp["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
    take = np.argsort(ids, kind="stable")[:k]
    seed = allp.take(take)
    return (ids[take].copy(), _quant(_batch_mat(seed)))


class _Assign:
    """Broadcast-centroid integer nearest-centroid map (per-actor setup)."""

    def __init__(self, ref):
        import ray
        self.Cq = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.nc = (self.Cq * self.Cq).sum(axis=1)

    def _dists(self, t: pa.Table):
        ids = pc.cast(t["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
        if len(ids) == 0:   # _batch_mat yields (0, 0): guard the matmul
            return ids, np.zeros((0, len(self.Cq)), dtype=np.int64)
        Qb = _quant(_batch_mat(t))
        nb = (Qb * Qb).sum(axis=1)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2, all int64-exact
        D = nb[:, None] - 2 * (Qb @ self.Cq.T) + self.nc[None, :]
        return ids, D

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, D = self._dists(t)
        a = D.argmin(axis=1)  # first minimum -> lowest cluster index
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "cluster": pa.array(a.astype(np.int64)),
            "dist": pa.array(D[np.arange(len(ids)), a].astype(np.int64)),
        })


def q_kmeans_assign(sf_dir: str):
    """Gated: assignment to the K seed centroids (no iteration, so the
    oracle is one cross join + QUALIFY argmin)."""
    import ray
    _, Cq = _seed_centroids(sf_dir)
    ref = ray.put(Cq)
    return _emb(sf_dir).map_batches(
        _Assign, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=None, concurrency=(1, 8), num_cpus=1)


class _LloydPartial(_Assign):
    def __call__(self, t: pa.Table) -> pa.Table:
        ids, D = self._dists(t)
        if len(ids) == 0:
            return pa.table({"cluster": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64()),
                             "inertia": pa.array([], type=pa.int64()),
                             "ssum": pa.array([], type=pa.list_(pa.int64()))})
        Qb = _quant(_batch_mat(t))
        a = D.argmin(axis=1)
        k, dim = self.Cq.shape
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        inert = np.zeros(k, dtype=np.int64)
        np.add.at(inert, a, D[np.arange(len(ids)), a])
        ssum = np.zeros((k, dim), dtype=np.int64)
        np.add.at(ssum, a, Qb)
        return pa.table({
            "cluster": pa.array(np.arange(k, dtype=np.int64)),
            "cnt": pa.array(cnt),
            "inertia": pa.array(inert),
            "ssum": pa.array(list(ssum)),
        })


def lloyd_step(Cq: np.ndarray, cnt: np.ndarray, ssum: np.ndarray
               ) -> np.ndarray:
    """Rounded integer mean; empty clusters keep their centroid."""
    new = Cq.copy()
    nz = cnt > 0
    if nz.any():
        c = cnt[nz][:, None]
        new[nz] = (2 * ssum[nz] + c) // (2 * c)
    return new


def q_kmeans_train(sf_dir: str) -> pa.Table:
    """Rows-only: ``_ITERS`` Lloyd passes; returns the per-cluster
    summary (size, inertia, quantized centroid norm) of the LAST pass."""
    import ray
    from engine.pipeline import collect_tables
    _, Cq = _seed_centroids(sf_dir)
    # materialize once: the _ITERS passes stream object-store blocks
    # instead of re-reading parquet every pass (the classify.py
    # feature-table precedent; at 10^12 vectors the store spills)
    ds = _emb(sf_dir).materialize()
    n_blocks = ds.num_blocks()
    LAST_KMEANS.clear()
    LAST_KMEANS.update({"n_blocks": n_blocks, "passes": _ITERS,
                        "partial_rows": [],
                        "driver_elems": _K * (Cq.shape[1] + 2)})
    cnt = inert = None
    for _ in range(_ITERS):
        ref = ray.put(Cq)
        parts = [p for p in collect_tables(ds.map_batches(
            _LloydPartial, fn_constructor_args=(ref,),
            batch_format="pyarrow", batch_size=None,
            concurrency=(1, 8), num_cpus=1)) if p.num_rows]
        LAST_KMEANS["partial_rows"].append(
            sum(p.num_rows for p in parts))
        k, dim = Cq.shape
        cnt = np.zeros(k, dtype=np.int64)
        inert = np.zeros(k, dtype=np.int64)
        ssum = np.zeros((k, dim), dtype=np.int64)
        for p in parts:
            cl = p["cluster"].to_numpy(zero_copy_only=False)
            cnt[cl] += p["cnt"].to_numpy(zero_copy_only=False)
            inert[cl] += p["inertia"].to_numpy(zero_copy_only=False)
            flat = p["ssum"].combine_chunks().values.to_numpy(
                zero_copy_only=False).reshape(len(cl), dim)
            np.add.at(ssum, cl, flat)
        Cq = lloyd_step(Cq, cnt, ssum)
    cnorm = (Cq * Cq).sum(axis=1)
    return pa.table({
        "cluster": pa.array(np.arange(len(cnt), dtype=np.int64)),
        "size": pa.array(cnt),
        "inertia": pa.array(inert),
        "centroid_qnorm": pa.array(cnorm),
    })


_SAMPLE_N = 20


def q_cluster_sample(sf_dir: str):
    """Cluster-balanced sampling: the ``_SAMPLE_N`` most-central members
    of every cluster (dist ASC, vec_id ASC) under the seed-centroid
    assignment — the SemDeDup-style "balanced subset" selection that
    stops one dense region from dominating a curated mix.

    Scale shape: the same partial-top-K combiner as
    ``corpus.q_source_cap`` — each batch forwards at most N rows per
    cluster it saw, so the groupby exchange carries O(N x K x blocks)
    id-sized rows and the embeddings never leave the map stage."""
    import ray
    n = _SAMPLE_N
    _, Cq = _seed_centroids(sf_dir)
    ref = ray.put(Cq)

    class PartialTopN(_Assign):
        def __call__(self, t: pa.Table) -> pa.Table:
            ids, D = self._dists(t)
            a = D.argmin(axis=1)
            dist = D[np.arange(len(ids)), a]
            order = np.lexsort((ids, dist, a))
            a_s = a[order]
            starts = np.concatenate([[0], np.flatnonzero(
                np.diff(a_s)) + 1]) if len(a_s) else np.array([], np.int64)
            run_id = np.searchsorted(starts, np.arange(len(order)),
                                     side="right") - 1
            rank = np.arange(len(order)) - starts[run_id] \
                if len(order) else np.array([], np.int64)
            keep = order[rank < n]
            return pa.table({
                "cluster": pa.array(a[keep].astype(np.int64)),
                "vec_id": pa.array(ids[keep], type=pa.int64()),
                "dist": pa.array(dist[keep].astype(np.int64)),
            })

    def final_topn(t: pa.Table) -> pa.Table:
        dist = t["dist"].to_numpy(zero_copy_only=False)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dist))[:n]
        take = pa.array(order)
        return pa.table({
            "cluster": t["cluster"].take(take),
            "vec_id": t["vec_id"].take(take),
            "dist": t["dist"].take(take),
            "rank": pa.array(np.arange(len(order), dtype=np.int64)),
        })

    return _emb(sf_dir) \
        .map_batches(PartialTopN, fn_constructor_args=(ref,),
                     batch_format="pyarrow", batch_size=None,
                     concurrency=(1, 8), num_cpus=1) \
        .groupby("cluster").map_groups(final_topn, batch_format="pyarrow")


SQL_CLUSTER_SAMPLE = f"""
WITH q AS (
  SELECT vec_id::BIGINT AS vec_id,
         list_transform(embedding,
                        x -> floor(x::DOUBLE * 1000000 + 0.5)::BIGINT) AS qe
  FROM embeddings
), c AS (
  SELECT qe AS cq, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT
           AS cluster
  FROM q ORDER BY vec_id LIMIT {_K}
), d AS (
  SELECT q.vec_id, c.cluster,
         list_sum(list_transform(range(len(q.qe)),
           i -> (q.qe[i+1] - c.cq[i+1]) * (q.qe[i+1] - c.cq[i+1])))::BIGINT
           AS dist
  FROM q CROSS JOIN c
), assigned AS (
  SELECT vec_id, cluster, dist FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
)
SELECT cluster, vec_id, dist,
       (row_number() OVER (PARTITION BY cluster ORDER BY dist, vec_id)
          - 1)::BIGINT AS rank
FROM assigned
QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY dist, vec_id)
          <= {_SAMPLE_N}
"""


def kmeans_reference(M: np.ndarray, k: int = _K, iters: int = _ITERS):
    """Single-process reference with identical integer math (pytest pin).
    ``M`` rows must be ordered by vec_id."""
    Q = _quant(M)
    Cq = Q[:k].copy()
    cnt = inert = None
    for _ in range(iters):
        nc = (Cq * Cq).sum(axis=1)
        nb = (Q * Q).sum(axis=1)
        D = nb[:, None] - 2 * (Q @ Cq.T) + nc[None, :]
        a = D.argmin(axis=1)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        inert = np.zeros(k, dtype=np.int64)
        np.add.at(inert, a, D[np.arange(len(Q)), a])
        ssum = np.zeros_like(Cq)
        np.add.at(ssum, a, Q)
        Cq = lloyd_step(Cq, cnt, ssum)
    return Cq, cnt, inert


SQL_KMEANS_ASSIGN = f"""
WITH q AS (
  SELECT vec_id::BIGINT AS vec_id,
         list_transform(embedding,
                        x -> floor(x::DOUBLE * 1000000 + 0.5)::BIGINT) AS qe
  FROM embeddings
), c AS (
  SELECT qe AS cq, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT
           AS cluster
  FROM q ORDER BY vec_id LIMIT {_K}
), d AS (
  SELECT q.vec_id, c.cluster,
         list_sum(list_transform(range(len(q.qe)),
           i -> (q.qe[i+1] - c.cq[i+1]) * (q.qe[i+1] - c.cq[i+1])))::BIGINT
           AS dist
  FROM q CROSS JOIN c
)
SELECT vec_id, cluster, dist FROM d
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
"""
