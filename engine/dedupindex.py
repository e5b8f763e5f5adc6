"""Shared mutable dedup index as RAW Ray actors — the one operator shape
the Dataset API genuinely cannot express (the task brief's own example:
"drop to raw Ray tasks / actors only where the Dataset API can't,
e.g. a shared mutable index").

``ShardedDedupIndex`` is a fleet of ``_IndexShard`` actors, each owning
one hash range of a content-hash -> (min doc_id, count) map that
OUTLIVES any single Dataset execution: successive ingest jobs (think
daily crawl shards) query and update the SAME index — state a per-job
``groupby`` cannot carry.  Per batch the ingest stage folds to
per-distinct-content partials, partitions them by ``h % n_shards`` and
makes ONE RPC per shard per batch (int64 numpy triples, never text);
min/count folds are order-independent, so the survivor table is
deterministic under any block order, concurrency, or job interleaving.

``q_dedup_exact_indexed`` streams the corpus through a fresh index and
returns the identical survivor table as ``dedup.q_dedup_exact`` (same
DuckDB oracle) — a third physical plan for exact dedup alongside the
groupby exchange and the broadcast anti-join, for when dedup state must
persist ACROSS jobs.  The cross-job property is pytest-pinned by
ingesting two corpus halves in separate Dataset executions against one
index.

Scale: each shard holds ~(distinct contents / n_shards) 24-byte entries;
shard count scales with cluster memory and the per-batch RPC payload is
24 B per distinct content in the batch.  The per-shard fold is a Python
dict update over per-batch-distinct keys — RPC-bounded, and the dict is
the point: O(1) point lookups across jobs, which no immutable block
layout provides.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_N_SHARDS = 8


def _shard_cls():
    import ray

    @ray.remote(num_cpus=0.25)
    class _IndexShard:
        """One hash range of the index: h -> [min doc_id, count]."""

        def __init__(self):
            self.map = {}

        def offer(self, hs, mins, cnts) -> int:
            m = self.map
            for h, mn, c in zip(hs.tolist(), mins.tolist(), cnts.tolist()):
                e = m.get(h)
                if e is None:
                    m[h] = [mn, c]
                else:
                    if mn < e[0]:
                        e[0] = mn
                    e[1] += c
            return len(m)

        def dump(self):
            if not self.map:
                return pa.table({
                    "h": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_copies": pa.array([], type=pa.int64())})
            hs = np.fromiter(self.map.keys(), dtype=np.int64,
                             count=len(self.map))
            vals = np.array(list(self.map.values()), dtype=np.int64)
            return pa.table({"h": pa.array(hs),
                             "doc_id": pa.array(vals[:, 0]),
                             "n_copies": pa.array(vals[:, 1])})

    return _IndexShard


class ShardedDedupIndex:
    """Driver-side handle fleet; safe to pass into ``map_batches``
    callables (actor handles serialize)."""

    def __init__(self, n_shards: int = _N_SHARDS):
        cls = _shard_cls()
        self.n = n_shards
        self.shards = [cls.remote() for _ in range(n_shards)]

    def offer(self, h: np.ndarray, ids: np.ndarray):
        """Fold one batch's (content hash, doc id) rows into the index —
        ONE RPC per shard holding any of the batch's distinct hashes."""
        if h.dtype == np.uint64:   # reinterpret, don't overflow
            h = h.view(np.int64)
        uniq, inv = np.unique(h, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, ids)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        sh = (uniq % self.n + self.n) % self.n
        refs = []
        for s in range(self.n):
            m = sh == s
            if m.any():
                refs.append(self.shards[s].offer.remote(
                    uniq[m], mins[m], cnts[m]))
        import ray as _r
        _r.get(refs)  # backpressure: batch is folded before the task ends

    def dump(self) -> pa.Table:
        import ray
        tabs = ray.get([s.dump.remote() for s in self.shards])
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "n_copies": pa.array([], type=pa.int64())})
        return pa.concat_tables(tabs)

    def shutdown(self):
        import ray
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def content_hash_i64(texts) -> np.ndarray:
    """The q_dedup_exact content hash (same 2^-64 collision trade)."""
    import pandas as pd
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pd.util.hash_pandas_object(
        pd.Series(texts.to_pandas()), index=False).to_numpy() \
        .view(np.int64)


def ingest(ds, index: ShardedDedupIndex) -> int:
    """Stream one Dataset (doc_id, text) into the shared index; returns
    the row count ingested.  Each batch folds locally first, so the RPC
    volume is per-DISTINCT-content, and the returned stats stream keeps
    Dataset backpressure semantics."""
    shards = index.shards
    n = index.n

    def fold(t: pa.Table) -> pa.Table:
        import ray
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        h = content_hash_i64(t["text"])
        uniq, inv = np.unique(h, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, ids)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        shx = (uniq % n + n) % n
        refs = [shards[s].offer.remote(uniq[shx == s], mins[shx == s],
                                       cnts[shx == s])
                for s in range(n) if (shx == s).any()]
        ray.get(refs)
        return pa.table({"rows": pa.array([t.num_rows], type=pa.int64())})

    from engine.pipeline import collect_tables
    parts = [p for p in collect_tables(
        ds.map_batches(fold, batch_format="pyarrow", batch_size=None))
        if p.num_columns]
    return int(sum(p["rows"].to_numpy().sum() for p in parts))


def q_dedup_exact_indexed(sf_dir: str) -> pa.Table:
    """Gated (same oracle as ``dedup_exact``): exact dedup through the
    shared index — build, ingest the corpus, dump survivors."""
    from engine.io import read_parquet_clean
    idx = ShardedDedupIndex()
    try:
        ingest(read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"]), idx)
        out = idx.dump().select(["doc_id"])
    finally:
        idx.shutdown()
    return out.sort_by([("doc_id", "ascending")])
