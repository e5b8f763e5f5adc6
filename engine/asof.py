"""As-of (point-in-time) join over the events log — the classic
feature-attribution operator Ray Data has no primitive for.

Expressed Ray-Data-first per the custom-operator rule: a composition of
``groupby(key).map_groups`` with a vectorized in-group merge — for each
event, the user's most recent PRIOR ``purchase`` event (strictly earlier
in ``(ts, event_id)`` order).  The in-group body is one lexsort + one
``np.maximum.accumulate`` carry-forward: no per-row Python, no
cross-group state.

Partitioning assumption (documented per instructions): one group = one
``user_id``'s events, which must fit in a task.  At 100 TB that holds for
any human-scale key (years of events per user is MBs); a pathological
machine key would be salted by time range and the carry-forward seeded
from the previous range's last purchase — the same shape the sessionizer
uses.  The only exchange is the groupby on the join key.

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


def q_events_asof_prior_purchase(sf_dir: str):
    from engine.io import read_parquet_clean

    def per_user(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        anchor = pc.equal(t["event_type"], _ANCHOR).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid, uid, anchor = ts[order], eid[order], uid[order], anchor[order]
        a_ts = np.where(anchor, ts, _NEG)
        prior = np.empty_like(a_ts)
        prior[0] = _NEG
        np.maximum.accumulate(a_ts[:-1], out=prior[1:])
        have = prior != _NEG
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts_us": pa.array(ts),
            "last_purchase_us": pa.array(prior, mask=~have),
            "gap_us": pa.array(ts - prior, mask=~have),
        })

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


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
    ``[ts - 1h, ts)``.  Same group-and-vectorize shape as the as-of join:
    after the per-user sort, the window count is two ``np.searchsorted``
    calls — O(n log n) per group, not O(n^2) pairs."""
    from engine.io import read_parquet_clean

    def per_user(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        anchor = pc.equal(t["event_type"], _ANCHOR).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid, uid, anchor = ts[order], eid[order], uid[order], anchor[order]
        ai = np.flatnonzero(anchor)
        lo = np.searchsorted(ts, ts[ai] - _WINDOW_US, side="left")
        hi = np.searchsorted(ts, ts[ai], side="left")
        return pa.table({
            "event_id": pa.array(eid[ai]),
            "user_id": pa.array(uid[ai]),
            "ts_us": pa.array(ts[ai]),
            "n_prior_events_1h": pa.array((hi - lo).astype(np.int64)),
        })

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


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
