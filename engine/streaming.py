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


# ---------------------------------------------------------------------------
# watermark / allowed-lateness late-data detection (gated)
# ---------------------------------------------------------------------------

_WM_JITTER_US = 2 * 3600 * 1_000_000     # arrival = ts + md5(event_id) % 2h
_WM_LATENESS_US = 30 * 60 * 1_000_000    # allowed lateness 30 min
_NO_WM = np.iinfo(np.int64).min          # "no watermark yet" sentinel


def wm_scan_block(t: pa.Table) -> pa.Table:
    """Per-partition kernel: whole arrival-range groups arrive co-located;
    sort by (part, arrival, event_id), seed each part run with its
    exclusive cross-partition carry (rides every row as ``carry``), and
    compute the running exclusive max event time — the WATERMARK — in one
    ``np.maximum.accumulate`` per run.  A row is late when its event time
    has fallen more than the allowed lateness behind the watermark."""
    empty = pa.schema([("event_id", pa.int64()), ("arrival_us", pa.int64()),
                       ("ts_us", pa.int64()), ("late", pa.int64())]) \
        .empty_table()
    n = t.num_rows
    if n == 0:
        return empty
    part = t["part"].to_numpy(zero_copy_only=False)
    arr = t["arrival_us"].to_numpy(zero_copy_only=False)
    tsu = t["ts_us"].to_numpy(zero_copy_only=False)
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    carry = t["carry"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, arr, part))
    part, arr, tsu, eid, carry = (part[order], arr[order], tsu[order],
                                  eid[order], carry[order])
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = part[1:] != part[:-1]
    starts = np.flatnonzero(new_g)
    bounds = np.append(starts, n)
    late = np.zeros(n, dtype=np.int64)
    for i in range(len(starts)):             # few, large arrival ranges
        s, e = bounds[i], bounds[i + 1]
        prev = np.empty(e - s, dtype=np.int64)
        prev[0] = carry[s]
        if e - s > 1:
            np.maximum.accumulate(tsu[s:e - 1], out=prev[1:])
            np.maximum(prev[1:], carry[s], out=prev[1:])
        has_wm = prev != _NO_WM
        late[s:e] = (has_wm &
                     (tsu[s:e] < prev - _WM_LATENESS_US)).astype(np.int64)
    return pa.table({"event_id": pa.array(eid),
                     "arrival_us": pa.array(arr),
                     "ts_us": pa.array(tsu),
                     "late": pa.array(late)})


def q_late_data_watermark(sf_dir: str):
    """Event-time watermark with allowed lateness over an out-of-order
    arrival stream — flag every event that arrives after the watermark
    (the running max event time seen so far) has passed it by more than
    ``_WM_LATENESS_US`` (such events would miss their finalized window).

    Arrival order is the event-id-keyed md5 jitter of the event time
    (deterministic on both sides of the gate; a real deployment reads an
    arrival-log column instead).  The computation is a GLOBAL ordered
    prefix scan, distributed as a range partition over arrival time:

    * partition id = (arrival - lo) // width is computable PER ROW from
      parquet-statistics bounds — no global pass, no sort;
    * pass 1 folds per-batch (partition, max event time) partials into
      the tiny per-partition exclusive prefix-max carry vector (the only
      driver state, one int64 per partition);
    * one keyed exchange co-locates each arrival range whole, and
      ``wm_scan_block`` finishes with one vectorized accumulate per
      range — event rows ride exactly one exchange, the same budget as
      a distributed sort, which a global order statistic inherently
      needs.

    At 10^12 rows the md5 jitter swaps for the splitmix64 fast twin —
    registered as ``late_data_watermark_fast`` / ``window_finalize_fast``
    (rows-only; tests/test_fast_hash.py pins it against a local numpy
    oracle over the same jitter); md5 stays the gate default because it
    is the digest the DuckDB oracle shares."""
    empty = pa.schema([("event_id", pa.int64()), ("arrival_us", pa.int64()),
                       ("ts_us", pa.int64()), ("late", pa.int64())]) \
        .empty_table()
    df = _watermark_exchange(sf_dir, wm_scan_block)
    if df is None or df.empty:
        return empty
    cols = ["event_id", "arrival_us", "ts_us", "late"]
    return df.sort_values("event_id", ignore_index=True) \
        .astype({c: "int64" for c in cols})[cols]


def _watermark_exchange(sf_dir: str, block_fn, jitter: str = "md5"):
    """Shared watermark plan: derive jittered arrivals + range partitions,
    fold the per-partition exclusive prefix-max carry vector, run ONE
    keyed exchange with ``block_fn`` (wm_scan_block for event-level
    output, wm_window_block for in-block window aggregation).  Returns
    the collected DataFrame, or None when the table is empty.

    ``jitter`` selects the arrival-delay digest: "md5" (per-row Python,
    the digest DuckDB shares, so the gate stays value-exact) or "fast"
    (vectorized splitmix64 — the at-scale twin per the
    fingerprint_rolling_fast precedent; a different, equally valid
    pseudo-random arrival order, so rows-only)."""
    import pyarrow.parquet as _pq

    from engine.pipeline import collect_tables
    from engine.sketch import _md5_60
    from engine.stages import hash_group_exchange

    path = os.path.join(sf_dir, "events.parquet")
    md = _pq.read_metadata(path)
    n_rows = md.num_rows
    lo_us = None
    hi_us = None
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema == "ts" and c.statistics is not None \
                    and c.statistics.has_min_max:
                mn = int(np.datetime64(c.statistics.min, "us").astype(np.int64))
                mx = int(np.datetime64(c.statistics.max, "us").astype(np.int64))
                lo_us = mn if lo_us is None else min(lo_us, mn)
                hi_us = mx if hi_us is None else max(hi_us, mx)
    if lo_us is None or n_rows == 0:
        return None
    hi_us += _WM_JITTER_US                  # arrival upper bound
    n_parts = max(8, n_rows // 500_000)
    width = max(1, (hi_us - lo_us + n_parts) // n_parts)

    from engine.io import read_parquet_clean

    if jitter == "fast":
        from engine.dedup import _mix64

        def _jit(eid: np.ndarray) -> np.ndarray:
            return (_mix64(eid.view(np.uint64))
                    % np.uint64(_WM_JITTER_US)).astype(np.int64)
    else:
        def _jit(eid: np.ndarray) -> np.ndarray:
            return _md5_60(eid) % _WM_JITTER_US

    def derive(t: pa.Table) -> pa.Table:
        eid = pc.cast(t["event_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        tsu = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        arr = tsu + _jit(eid)
        return pa.table({"event_id": pa.array(eid),
                         "ts_us": pa.array(tsu),
                         "arrival_us": pa.array(arr),
                         "part": pa.array((arr - lo_us) // width)})

    def max_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["part", "ts_us"]), ["part"]) \
            .aggregate([("ts_us", "max")])
        return pa.table({"part": g["part"],
                         "mx": pc.cast(g["ts_us_max"], pa.int64())})

    base = read_parquet_clean(path, columns=["event_id", "ts"]) \
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
    parts = [b for b in collect_tables(
        base.map_batches(max_partial, batch_format="pyarrow"))
        if b.num_columns]
    per_part = np.full(n_parts + 1, _NO_WM, dtype=np.int64)
    for b in parts:
        p = b["part"].to_numpy(zero_copy_only=False)
        m = b["mx"].to_numpy(zero_copy_only=False)
        np.maximum.at(per_part, p, m)
    # exclusive prefix max: carry[p] = max ts over all partitions < p
    carries = np.full(n_parts + 1, _NO_WM, dtype=np.int64)
    if n_parts:
        np.maximum.accumulate(per_part[:-1], out=carries[1:])

    import ray
    carries_ref = ray.put(carries)

    def attach_carry(t: pa.Table) -> pa.Table:
        p = t["part"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "carry", pa.array(ray.get(carries_ref)[p]))

    def stage():
        return read_parquet_clean(path, columns=["event_id", "ts"]) \
            .map_batches(derive, batch_format="pyarrow", batch_size=None) \
            .map_batches(attach_carry, batch_format="pyarrow")

    return hash_group_exchange(stage, ["part"], block_fn, collect=True,
                               rows_hint=n_rows)


SQL_LATE_DATA_WATERMARK = f"""
WITH a AS (
  SELECT event_id::BIGINT AS event_id,
         epoch_us(ts)::BIGINT AS ts_us,
         (epoch_us(ts)
          + ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT
            % {_WM_JITTER_US})::BIGINT AS arrival_us
  FROM events
), m AS (
  SELECT *, max(ts_us) OVER (ORDER BY arrival_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM a
)
SELECT event_id, arrival_us, ts_us,
       (CASE WHEN wm IS NOT NULL AND ts_us < wm - {_WM_LATENESS_US}
             THEN 1 ELSE 0 END)::BIGINT AS late
FROM m ORDER BY event_id
"""


def wm_window_block(t: pa.Table) -> pa.Table:
    """Prefix-scan + in-block window aggregate: same watermark walk as
    ``wm_scan_block`` but emitting per-(hour-window) on-time/late count
    partials — one tiny row per window per partition crosses back."""
    empty = pa.schema([("window", pa.int64()), ("n_on_time", pa.int64()),
                       ("n_late", pa.int64())]).empty_table()
    scanned = wm_scan_block(t)
    if scanned.num_rows == 0:
        return empty
    win = scanned["ts_us"].to_numpy(zero_copy_only=False) // 3_600_000_000
    late = scanned["late"].to_numpy(zero_copy_only=False)
    g = pa.TableGroupBy(pa.table({
        "window": pa.array(win),
        "n_late": pa.array(late),
        "n_on_time": pa.array(1 - late)}), ["window"]) \
        .aggregate([("n_on_time", "sum"), ("n_late", "sum")])
    return pa.table({"window": g["window"],
                     "n_on_time": pc.cast(g["n_on_time_sum"], pa.int64()),
                     "n_late": pc.cast(g["n_late_sum"], pa.int64())})


def q_window_finalize(sf_dir: str):
    """Allowed-lateness window emission: per tumbling hour window, how
    many events arrived on time (counted in the finalized window) vs
    late (would need a retraction / side output).  Same range-partitioned
    prefix-scan plan as :func:`q_late_data_watermark`, but the block
    kernel aggregates in place, so the exchange returns one row per
    (window, partition) instead of per event — at 10^12 rows the driver
    folds O(windows x partitions) int64 triples."""
    df = _watermark_exchange(sf_dir, wm_window_block)
    if df is None or df.empty:
        return pa.schema([("window", pa.int64()), ("n_on_time", pa.int64()),
                          ("n_late", pa.int64())]).empty_table().to_pandas()
    out = df.groupby("window", as_index=False)[["n_on_time", "n_late"]] \
        .sum().sort_values("window", ignore_index=True)
    return out.astype({"window": "int64", "n_on_time": "int64",
                       "n_late": "int64"})


SQL_WINDOW_FINALIZE = f"""
WITH a AS (
  SELECT event_id::BIGINT AS event_id,
         epoch_us(ts)::BIGINT AS ts_us,
         (epoch_us(ts)
          + ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT
            % {_WM_JITTER_US})::BIGINT AS arrival_us
  FROM events
), m AS (
  SELECT *, max(ts_us) OVER (ORDER BY arrival_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM a
), f AS (
  SELECT ts_us // 3600000000 AS win,
         (CASE WHEN wm IS NOT NULL AND ts_us < wm - {_WM_LATENESS_US}
               THEN 1 ELSE 0 END) AS late
  FROM m
)
SELECT win::BIGINT AS window,
       sum(1 - late)::BIGINT AS n_on_time,
       sum(late)::BIGINT AS n_late
FROM f GROUP BY 1 ORDER BY 1
"""


def q_late_data_watermark_fast(sf_dir: str):
    """Rows-only fast twin of :func:`q_late_data_watermark`: the per-row
    Python md5 arrival jitter swaps for one vectorized splitmix64 over the
    int64 event_id column — a different (equally valid) pseudo-random
    arrival order, so no SQL oracle; tests/test_fast_hash.py pins the
    result against a single-process numpy oracle that replays the same
    jitter, plus the determinism/range contracts."""
    empty = pa.schema([("event_id", pa.int64()), ("arrival_us", pa.int64()),
                       ("ts_us", pa.int64()), ("late", pa.int64())]) \
        .empty_table()
    df = _watermark_exchange(sf_dir, wm_scan_block, jitter="fast")
    if df is None or df.empty:
        return empty
    cols = ["event_id", "arrival_us", "ts_us", "late"]
    return df.sort_values("event_id", ignore_index=True) \
        .astype({c: "int64" for c in cols})[cols]


def q_window_finalize_fast(sf_dir: str):
    """Rows-only fast twin of :func:`q_window_finalize` (splitmix64
    arrival jitter; same plan, same driver-state bound)."""
    df = _watermark_exchange(sf_dir, wm_window_block, jitter="fast")
    if df is None or df.empty:
        return pa.schema([("window", pa.int64()), ("n_on_time", pa.int64()),
                          ("n_late", pa.int64())]).empty_table().to_pandas()
    out = df.groupby("window", as_index=False)[["n_on_time", "n_late"]] \
        .sum().sort_values("window", ignore_index=True)
    return out.astype({"window": "int64", "n_on_time": "int64",
                       "n_late": "int64"})


# ---------------------------------------------------------------------------
# streaming window dedup (gated)
# ---------------------------------------------------------------------------

def windedup_fold_block(t: pa.Table) -> pa.Table:
    """user-partition kernel: a partition owns every row of its users, so
    per-(user, type, window) distinctness there IS global; fold straight
    to per-type (raw, survivor) partials — <= |types| rows out."""
    if t.num_rows == 0:
        return pa.schema([("event_type", pa.string()),
                          ("n_events", pa.int64()),
                          ("n_survivors", pa.int64())]).empty_table()
    g = pa.TableGroupBy(t, ["user_id", "event_type", "window"]) \
        .aggregate([("n", "sum")])
    out = pa.TableGroupBy(
        pa.table({"event_type": g["event_type"],
                  "n": pc.cast(g["n_sum"], pa.int64())}),
        ["event_type"]).aggregate([("n", "sum"), ([], "count_all")])
    return pa.table({
        "event_type": out["event_type"],
        "n_events": pc.cast(out["n_sum"], pa.int64()),
        "n_survivors": pc.cast(out["count_all"], pa.int64())})


def q_window_dedup(sf_dir: str):
    """Streaming-shaped dedup: within each tumbling 1-hour window, repeat
    (user, event_type) occurrences collapse to one; report per type the
    raw count, the survivor count, and the drop rate — the
    at-most-once-per-window semantics of an idempotent event sink.

    Per-batch (user, type, window, count) partials shrink the stream
    before ONE user-keyed exchange; the fold emits <= |types| rows per
    partition, so dedup state never lives on the driver."""
    from engine.io import read_parquet_clean
    from engine.stages import hash_group_exchange

    def partial(t: pa.Table) -> pa.Table:
        win = pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000)
        g = pa.TableGroupBy(pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": t["event_type"],
            "window": pc.cast(win, pa.int64())}),
            ["user_id", "event_type", "window"]) \
            .aggregate([([], "count_all")])
        return pa.table({"user_id": g["user_id"],
                         "event_type": g["event_type"],
                         "window": g["window"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    import pyarrow.parquet as _pq
    nrows = _pq.read_metadata(
        os.path.join(sf_dir, "events.parquet")).num_rows
    df = hash_group_exchange(
        lambda: read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["user_id"], windedup_fold_block, rows_hint=nrows // 4)
    agg = df.groupby("event_type", as_index=False).sum() \
        .sort_values("event_type", ignore_index=True)
    n = agg["n_events"].astype(int)
    s = agg["n_survivors"].astype(int)
    return pa.table({
        "event_type": pa.array(agg["event_type"], type=pa.string()),
        "n_events": pa.array(n, type=pa.int64()),
        "n_survivors": pa.array(s, type=pa.int64()),
        "dropped_milli": pa.array(1000 * (n - s) // n, type=pa.int64())})


SQL_WINDOW_DEDUP = """
WITH w AS (
  SELECT user_id, event_type,
         (epoch_us(ts) // 3600000000)::BIGINT AS window, count(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       sum(n)::BIGINT AS n_events,
       count(*)::BIGINT AS n_survivors,
       ((1000 * (sum(n) - count(*))) // sum(n))::BIGINT AS dropped_milli
FROM w GROUP BY 1 ORDER BY 1
"""
