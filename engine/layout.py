"""Physical-layout tooling: Z-order (Morton) clustering keys.

At 100 TB the dominant read cost is row groups that parquet statistics
cannot prune.  A table sorted by one column prunes only on that column;
interleaving the bits of TWO query dimensions (user_id, event time)
gives a single sort key whose contiguous ranges are small rectangles in
both dimensions — the Delta/Iceberg ``ZORDER BY`` layout — so min/max
statistics prune on either predicate.  This module computes the key as
a pure vectorized map (the classic magic-number bit spread, no Python
per row) and the DuckDB oracle rebuilds it bit by bit, so the gate
checks every interleave exactly.  ``zorder_layout_dir`` materializes
the clustered parquet (sort by zkey, small row groups) and
``tests/test_layout.py`` MEASURES the pruning win against a time-sorted
layout rather than asserting it rhetorically.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.io import read_parquet_clean

_ZBITS = 16
_MINUTE_US = 60_000_000


def spread_bits16(x: np.ndarray) -> np.ndarray:
    """16-bit ints -> 32-bit with a zero between consecutive bits
    (Morton spread; exact for 0 <= x < 2^16)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def morton_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave a (odd bit positions) with b (even positions)."""
    return ((spread_bits16(a) << np.uint64(1)) | spread_bits16(b)) \
        .astype(np.int64)


def scale16(v: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Affine map of [lo, hi] onto [0, 2^16): full 16-bit resolution on
    any domain — a raw modulo would WRAP (a >45-day minute range or a
    sparse id space destroys locality; measured, which is why this is
    not ``v % 65536``)."""
    return (v - lo) * (1 << _ZBITS) // (hi - lo + 1)


def _events_bounds(sf_dir: str):
    """Exact (user_id, minute) bounds via one tiny partial fold (int
    parquet stats would also be exact; the fold keeps the contract
    independent of writer quirks)."""
    from engine.pipeline import collect_tables

    def mm(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        mi = ts // _MINUTE_US
        return pa.table({c: pa.array([v], type=pa.int64())
                         for c, v in (("ulo", uid.min()), ("uhi", uid.max()),
                                      ("mlo", mi.min()), ("mhi", mi.max()))})

    tabs = [b for b in collect_tables(
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts"])
        .map_batches(mm, batch_format="pyarrow", batch_size=None))
        if b.num_columns and b.num_rows]
    return (min(t["ulo"][0].as_py() for t in tabs),
            max(t["uhi"][0].as_py() for t in tabs),
            min(t["mlo"][0].as_py() for t in tabs),
            max(t["mhi"][0].as_py() for t in tabs))


def q_zorder_keys(sf_dir: str):
    """(event_id, zkey) for the events table: zkey interleaves user_id
    and the event minute, each affine-scaled onto 16 bits from its exact
    domain bounds.  Pure map after one tiny bounds fold; the clustering
    itself is ONE distributed sort by zkey (the same budget as any
    single-column cluster), after which parquet min/max stats prune on
    BOTH dimensions."""
    ulo, uhi, mlo, mhi = _events_bounds(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        minute = ts // _MINUTE_US
        z = morton_key(scale16(uid, ulo, uhi), scale16(minute, mlo, mhi))
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "zkey": pa.array(z)})

    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=["event_id", "user_id", "ts"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None) \
        .sort("event_id")


def _sql_zorder() -> str:
    # literal 32-term interleave: a-bit i -> position 2i+1, b-bit i -> 2i
    a_terms = " + ".join(
        f"(((a >> {i}) & 1) << {2 * i + 1})" for i in range(_ZBITS))
    b_terms = " + ".join(
        f"(((b >> {i}) & 1) << {2 * i})" for i in range(_ZBITS))
    return f"""
WITH bounds AS (
  SELECT min(user_id)::BIGINT AS ulo, max(user_id)::BIGINT AS uhi,
         min(epoch_us(ts) // {_MINUTE_US})::BIGINT AS mlo,
         max(epoch_us(ts) // {_MINUTE_US})::BIGINT AS mhi
  FROM events
), x AS (
  SELECT event_id::BIGINT AS event_id,
         ((user_id - ulo) * {1 << _ZBITS} // (uhi - ulo + 1))::BIGINT AS a,
         (((epoch_us(ts) // {_MINUTE_US}) - mlo) * {1 << _ZBITS}
          // (mhi - mlo + 1))::BIGINT AS b
  FROM events, bounds
)
SELECT event_id, ({a_terms} + {b_terms})::BIGINT AS zkey
FROM x ORDER BY event_id
"""


def zorder_layout_dir(sf_dir: str, row_group_rows: int = 512) -> str:
    """Materialize the z-clustered events parquet (sorted by zkey, small
    row groups so statistics are fine-grained) under /tmp; idempotent by
    source fingerprint.  The write is the one distributed sort this
    layout costs; reads afterwards prune row groups on user_id AND ts."""
    import hashlib

    import pyarrow.parquet as pq
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    tag = hashlib.blake2b(
        f"{src}|{st.st_mtime_ns}|{st.st_size}|{row_group_rows}".encode(),
        digest_size=8).hexdigest()
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    d = os.path.join(base, "graft_zorder", tag)
    out = os.path.join(d, "events_z.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(src)
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    mi = ts // _MINUTE_US
    z = morton_key(scale16(uid, int(uid.min()), int(uid.max())),
                   scale16(mi, int(mi.min()), int(mi.max())))
    order = np.argsort(z, kind="stable")
    pq.write_table(t.take(pa.array(order)), out,
                   row_group_size=row_group_rows)
    return out


def pruned_fraction(path: str, user_lo: int, user_hi: int,
                    ts_lo_us: int, ts_hi_us: int) -> float:
    """Fraction of row groups whose (user_id, ts) statistics overlap the
    query rectangle — what a stats-pruning reader must actually fetch."""
    import pyarrow.parquet as pq
    md = pq.read_metadata(path)
    names = {md.row_group(0).column(i).path_in_schema: i
             for i in range(md.row_group(0).num_columns)}
    hit = 0
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        su = rg.column(names["user_id"]).statistics
        stt = rg.column(names["ts"]).statistics
        u_ov = su.min <= user_hi and su.max >= user_lo
        t_lo = int(np.datetime64(stt.min, "us").astype(np.int64))
        t_hi = int(np.datetime64(stt.max, "us").astype(np.int64))
        t_ov = t_lo <= ts_hi_us and t_hi >= ts_lo_us
        hit += int(u_ov and t_ov)
    return hit / max(md.num_row_groups, 1)
