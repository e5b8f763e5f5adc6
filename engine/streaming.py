"""Streaming-shaped stage with incremental state in raw Ray actors.

Ray Data has no event-time windows; SURVEY 2.9 maps the reference's (pure
batch) ordering concerns to `groupby().map_groups` (see
``queries.q_user_sessions``).  This module covers the remaining guide
pattern — "keep incremental state in an actor when the semantics need it:
one actor per key-hash bucket" — the ONE place the Dataset API genuinely
cannot express the computation (a shared mutable index), so raw
``@ray.remote`` actors are used per the escape-hatch rule.

Partitioning assumption (documented per instructions): state for key ``k``
lives on actor ``hash(k) % num_buckets``; every producer task routes its
per-batch partials to the owning actor, so updates for one key serialize
through one mailbox while distinct buckets proceed in parallel.  The
stream stays Ray Data end-to-end; only the state store is actor-resident,
queryable mid-stream (monitoring shape) and at end-of-stream.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


@ray.remote(num_cpus=0.25)
class WindowStateActor:
    """Per-bucket incremental tumbling-window store (shared mutable state).

    Updates are EXACTLY-ONCE under task retries: every ``add`` carries a
    deterministic batch id (content hash of the batch's raw rows — a
    retried map task reproduces the same batch, hence the same id) and
    already-applied ids are skipped.  The applied-id set is bounded by
    (batches x buckets) per run, a few bytes each."""

    def __init__(self):
        self.counts: Dict[Tuple[int, int], int] = {}
        self.value_milli: Dict[Tuple[int, int], int] = {}
        self.applied: set = set()

    def add(self, batch_id: bytes, keys, windows, counts, value_milli) -> int:
        if batch_id in self.applied:
            return 0  # retried delivery of an applied batch: no-op
        self.applied.add(batch_id)
        for k, w, c, v in zip(keys, windows, counts, value_milli):
            kk = (int(k), int(w))
            self.counts[kk] = self.counts.get(kk, 0) + int(c)
            self.value_milli[kk] = self.value_milli.get(kk, 0) + int(v)
        return len(keys)

    def snapshot(self):
        return {"counts": self.counts, "value_milli": self.value_milli,
                "n_applied": len(self.applied)}


def tumbling_window_counts(sf_dir: str, window_s: int = 3600,
                           num_buckets: int = 4) -> pa.Table:
    """Tumbling-window (user_id, window) counts + value sums over the
    events log, accumulated incrementally in bucketed state actors.

    The map task combines within the batch first (one actor message per
    (bucket) per batch, not per row) and confirms delivery before
    finishing, so task retries cannot drop updates mid-stream; each
    message carries a deterministic content-derived batch id, so a retry
    that re-sends an applied batch is a no-op (exactly-once apply)."""
    import hashlib
    actors = [WindowStateActor.remote() for _ in range(num_buckets)]

    def push(t: pa.Table) -> pa.Table:
        epoch_us = pc.cast(t["ts"], pa.int64()).to_numpy()
        win = epoch_us // (window_s * 1_000_000)
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy()
        vmilli = np.floor(t["value"].to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64)
        # deterministic batch id: hash of the rows' UNIQUE event_ids plus
        # the aggregated content — a retried task rebuilds the identical
        # batch, hence the same id, while two distinct batches that happen
        # to carry identical (user, window, value) content still differ
        # (event_id is unique in the source)
        eid = pc.cast(t["event_id"], pa.int64()).to_numpy()
        bid = hashlib.blake2b(
            eid.tobytes() + uid.tobytes() + win.tobytes() + vmilli.tobytes(),
            digest_size=16).digest()
        g = pa.TableGroupBy(pa.table({
            "user_id": pa.array(uid), "window": pa.array(win),
            "v": pa.array(vmilli)}), ["user_id", "window"]).aggregate(
            [("v", "sum"), ("v", "count")])
        ku = g["user_id"].to_numpy()
        kw = g["window"].to_numpy()
        kc = g["v_count"].to_numpy()
        kv = g["v_sum"].to_numpy()
        futs = []
        bucket = ku % num_buckets
        for b in np.unique(bucket):
            m = bucket == b
            futs.append(actors[int(b)].add.remote(
                bid, ku[m].tolist(), kw[m].tolist(), kc[m].tolist(), kv[m].tolist()))
        ray.get(futs)  # delivery confirmed before the task completes
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64())})

    import ray.data as rd
    from engine.io import read_parquet_clean
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "user_id", "ts", "value"])
    ds.map_batches(push, batch_format="pyarrow", batch_size=None).count()

    snaps = ray.get([a.snapshot.remote() for a in actors])
    rows: List[Tuple[int, int, int, int]] = []
    for s in snaps:
        for (k, w), c in s["counts"].items():
            rows.append((k, w, c, s["value_milli"][(k, w)]))
    rows.sort()
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "window": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_events": pa.array([r[2] for r in rows], type=pa.int64()),
        "sum_value_milli": pa.array([r[3] for r in rows], type=pa.int64()),
    })


SQL_TUMBLING_WINDOW = """
SELECT user_id::BIGINT AS user_id,
       (epoch_us(ts) // 3600000000)::BIGINT AS window,
       count(*)::BIGINT AS n_events,
       sum(CAST(floor(value*1000.0) AS BIGINT))::BIGINT AS sum_value_milli
FROM events GROUP BY 1, 2
"""
