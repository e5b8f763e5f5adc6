"""As-of (point-in-time) join over the events log — the classic
feature-attribution operator Ray Data has no primitive for.

Expressed Ray-Data-first per the custom-operator rule: a hash-keyed
exchange (:func:`engine.stages.hash_group_exchange`) co-locates each
user's events, then ONE vectorized pass per partition merges EVERY user
in the block — for each event, the user's most recent PRIOR ``purchase``
event (strictly earlier in ``(ts, event_id)`` order).  The block body is
one lexsort + one ``np.maximum.accumulate`` last-anchor-position
carry-forward (user boundaries reset naturally: a carried anchor from
another user fails the uid equality check): no per-row, per-user, or
per-group Python anywhere.

Partitioning assumption (documented per instructions): one partition =
many whole ``user_id`` groups, which must fit in a task.  At 100 TB that
holds for any human-scale key (years of events per user is MBs) with
enough partitions; a pathological machine key would be salted by time
range and the carry-forward seeded from the previous range's last
purchase — the same shape the sessionizer uses.  The only exchange is
the hash repartition on the join key.

Gated: DuckDB reproduces the semantics with a window
``max(CASE WHEN purchase) OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND
1 PRECEDING)``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ANCHOR = "purchase"
_NEG = np.iinfo(np.int64).min


def _load_sorted(t: pa.Table):
    """Decode an events batch and lexsort it by (user_id, ts, event_id).
    Within a user, ts is then ascending — so the most recent prior anchor
    is simply the LAST anchor at an earlier position of the same user."""
    ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    anchor = pc.equal(t["event_type"], _ANCHOR).to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    return ts[order], eid[order], uid[order], anchor[order]


def _asof_block(t: pa.Table) -> pa.Table:
    """Vectorized as-of merge over ONE partition holding many whole users."""
    if t.num_rows == 0:
        return pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("ts_us", pa.int64()), ("last_purchase_us", pa.int64()),
            ("gap_us", pa.int64())]).empty_table()
    ts, eid, uid, anchor = _load_sorted(t)
    n = len(ts)
    pos = np.arange(n, dtype=np.int64)
    last_anchor = np.maximum.accumulate(np.where(anchor, pos, -1))
    prior_pos = np.empty(n, dtype=np.int64)
    prior_pos[0] = -1
    prior_pos[1:] = last_anchor[:-1]
    safe = np.maximum(prior_pos, 0)
    have = (prior_pos >= 0) & (uid[safe] == uid)
    prior = np.where(have, ts[safe], _NEG)
    return pa.table({
        "event_id": pa.array(eid),
        "user_id": pa.array(uid),
        "ts_us": pa.array(ts),
        "last_purchase_us": pa.array(prior, mask=~have),
        "gap_us": pa.array(ts - prior, mask=~have),
    })


def q_events_asof_prior_purchase(sf_dir: str):
    from engine.io import read_parquet_clean
    from engine.stages import hash_group_exchange

    import pyarrow.parquet as pq
    # collect=False: keep the (nullable-int64) result a streaming Dataset —
    # a pandas hop would coerce the masked columns to float64
    return hash_group_exchange(
        lambda: read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"]),
        ["user_id"], _asof_block, collect=False,
        rows_hint=pq.read_metadata(
            os.path.join(sf_dir, "events.parquet")).num_rows)


SQL_EVENTS_ASOF = f"""
WITH o AS (
  SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
         epoch_us(ts)::BIGINT AS ts_us,
         max(CASE WHEN event_type = '{_ANCHOR}' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_purchase_us
  FROM events
)
SELECT event_id, user_id, ts_us, last_purchase_us::BIGINT AS last_purchase_us,
       (ts_us - last_purchase_us)::BIGINT AS gap_us
FROM o
"""


# ---------------------------------------------------------------------------
# range join: events within a trailing window of each anchor event
# ---------------------------------------------------------------------------

_WINDOW_US = 3_600_000_000  # 1 hour


def q_events_range_join_counts(sf_dir: str):
    """Range (interval) join, self-join form: for each ``purchase`` event,
    how many of the SAME user's events fell in the trailing hour
    ``[ts - 1h, ts)``.  Same exchange-and-vectorize shape as the as-of
    join: one hash partition holds many whole users; the block body maps
    every (user, ts) to one strictly-increasing composite key
    ``seg_id * stride + (ts - seg_base)`` so TWO global ``np.searchsorted``
    calls window-count every anchor of every user at once — O(n log n)
    per partition, not O(n^2) pairs and not one call per user."""
    from engine.io import read_parquet_clean
    from engine.stages import hash_group_exchange

    def range_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([
                ("event_id", pa.int64()), ("user_id", pa.int64()),
                ("ts_us", pa.int64()),
                ("n_prior_events_1h", pa.int64())]).empty_table()
        ts, eid, uid, anchor = _load_sorted(t)
        n = len(ts)
        new_u = np.empty(n, dtype=bool)
        new_u[0] = True
        new_u[1:] = uid[1:] != uid[:-1]
        seg_id = np.cumsum(new_u) - 1
        starts = np.flatnonzero(new_u)
        rel = ts - ts[starts[seg_id]]        # >= 0, ascending per user
        stride = int(rel.max()) + _WINDOW_US + 2
        if (seg_id[-1] + 1) * stride >= (1 << 62):  # composite would overflow
            raise OverflowError(
                "range-join composite key overflow: salt users by time "
                "range or raise num_partitions")
        g = seg_id * stride + rel            # strictly increasing per user,
        ai = np.flatnonzero(anchor)          # strictly segment-separated
        lo = np.searchsorted(g, g[ai] - _WINDOW_US, side="left")
        hi = np.searchsorted(g, g[ai], side="left")
        return pa.table({
            "event_id": pa.array(eid[ai]),
            "user_id": pa.array(uid[ai]),
            "ts_us": pa.array(ts[ai]),
            "n_prior_events_1h": pa.array((hi - lo).astype(np.int64)),
        })

    import pyarrow.parquet as pq
    return hash_group_exchange(
        lambda: read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"]),
        ["user_id"], range_block, collect=False,
        rows_hint=pq.read_metadata(
            os.path.join(sf_dir, "events.parquet")).num_rows)


SQL_EVENTS_RANGE_JOIN = f"""
SELECT a.event_id::BIGINT AS event_id, a.user_id::BIGINT AS user_id,
       epoch_us(a.ts)::BIGINT AS ts_us,
       (SELECT count(*) FROM events b
        WHERE b.user_id = a.user_id
          AND epoch_us(b.ts) >= epoch_us(a.ts) - {_WINDOW_US}
          AND epoch_us(b.ts) < epoch_us(a.ts))::BIGINT AS n_prior_events_1h
FROM events a
WHERE a.event_type = '{_ANCHOR}'
"""
