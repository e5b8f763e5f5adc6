"""Robust / behavioral statistics over the event log and corpus.

Four operator families a production training-data pipeline profiles its
inputs with, each expressed Ray-Data-first and integer-exact so the
driver's DuckDB value-hash gate is deterministic (the reference's
aggregate layer — src/parser.py summary counts — has no analogue; these
extend the engine's profiling family alongside engine/sketch.py):

* ``q_median_value_by_type`` — EXACT distributed median per group via
  two-pass histogram refinement.  Unlike ``q_value_quantiles_by_type``
  (which co-locates whole groups and therefore assumes one group fits a
  worker heap) this never ships a group anywhere: pass 1 folds coarse
  32-cent-bucket histograms (driver state = O(types x domain/32), data
  transfer = one small groupby), the driver locates the bucket holding
  each median rank, and pass 2 re-scans only rows inside those target
  buckets to count exact values (<= 32 distinct cents per type return).
  Hot groups cost nothing extra — the scan is embarrassingly parallel
  both passes.  For 64-bit value domains the same refinement nests:
  :func:`exact_median_by_group` takes an arbitrary radix ladder
  (``MED_SHIFTS_64 = [42, 21, 0]`` covers the full int64 range in three
  passes of <= 2^22 live buckets each), property-tested against a
  sorted-scan oracle; the rank arithmetic is unchanged.
* ``q_user_funnel`` — ordered-funnel conversion counts (first view <
  first click < first purchase per user): per-batch conditional-min
  partials collapse each batch to <= 3 rows per active user, ONE
  hash exchange co-locates users, and each partition returns a single
  3-int row of stage counts.  The driver folds O(partitions) rows.
* ``q_value_outliers`` — per-type 3-sigma outliers with NO float math
  anywhere: per-batch (n, sum, sum-of-squares) int64 partials fold on
  the driver in arbitrary-precision Python ints (immune to the int64
  overflow a 10^12-row sum-of-squares would hit), the sigma test
  ``|n*v - s1| > 3*sigma*n`` is rearranged to the integer comparison
  ``(n*v - s1)^2 > 9*(n*s2 - s1^2)`` and solved once per type for
  integer cutoffs via ``math.isqrt`` (exact: for integers, |d| > isqrt(D)
  <=> d^2 > D), so pass 2 is a stateless broadcast-cutoff filter map.
  The SQL oracle states the same quadratic over HUGEINTs — identical
  predicate, no division or sqrt on either side.
* ``q_doc_length_histogram`` — log2-bucketed corpus length profile per
  language.  Buckets come from ``np.frexp`` exponents (floor(log2(n))
  computed exactly — no libm log whose 1-ulp wobble could cross an
  integer at powers of two); the oracle mirrors it bit-exactly with
  ``length(printf('%b', n)) - 1``.

Scale notes: every pass here is a pure ``map_batches`` over a
column-pruned read plus at most one SMALL groupby of partial rows; no
operator materializes, sorts, or co-locates the raw table.  Driver state
is bounded by (types x buckets), never by rows.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.io import read_parquet_clean
from engine.pipeline import collect_tables


def _events(sf_dir: str, columns):
    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=columns)


def _cents(col) -> np.ndarray:
    v = col.to_numpy(zero_copy_only=False)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# exact distributed median: two-pass histogram refinement
# ---------------------------------------------------------------------------

_MED_SHIFT = 5          # pass-1 bucket = cents >> 5 (32-cent coarse bins)
MED_SHIFTS_64 = [42, 21, 0]   # full-int64-domain ladder (<= 2^22 live
#                               buckets per pass; 3 passes)


def _fold_partials(ds, keys: list) -> pa.Table | None:
    """Combiner fold (the :func:`engine.stages.pre_aggregated` pattern):
    collect per-batch partial tables and sum every non-key int column per
    key on the driver — O(keys x batches) driver input, and no Ray hash
    aggregate (whose empty-schema output partitions at tiny key counts
    spam schema-unify warnings).  At key cardinalities where the fold
    input outgrows the driver, swap for ``ds.groupby(keys).aggregate``
    over the identical partials schema."""
    tabs = [b for b in collect_tables(ds) if b.num_columns]
    if not tabs:
        return None
    t = pa.concat_tables(tabs)
    vals = [c for c in t.column_names if c not in keys]
    g = pa.TableGroupBy(t, keys).aggregate([(c, "sum") for c in vals])
    return pa.table({**{k: g[k] for k in keys},
                     **{c: g[f"{c}_sum"] for c in vals}})


# driver-state introspection (the simsearch LAST_* precedent): filled by
# exact_median_by_group on every call so tests can assert the documented
# O(groups x buckets) bounds instead of trusting the docstrings
LAST_MEDIAN: dict = {}


def exact_ranks_by_group(make_ds, key_col: str, val_fn, shifts,
                         ranks_fn) -> dict:
    """EXACT distributed per-group order statistics at arbitrary ranks by
    nested histogram refinement — the generalized core under
    :func:`exact_median_by_group` (median) and
    :func:`q_percentile_cont_by_type` (interpolated percentiles).
    ``ranks_fn(n) -> set[int]`` picks the 0-based ranks wanted per group
    given its row count; driver state and pass structure are unchanged
    from the median docstring (each extra rank adds at most one target
    bucket per pass).  Returns ``{key: (n, {rank: value})}``."""
    return _exact_ranks_impl(make_ds, key_col, val_fn, shifts, ranks_fn)


def exact_median_by_group(make_ds, key_col: str, val_fn, shifts):
    """EXACT distributed per-group median by nested histogram refinement
    — ``len(shifts)`` full scans, never co-locating a group.

    ``make_ds()`` yields the Dataset; ``val_fn(table) -> int64 ndarray``
    extracts the value column; ``shifts`` is a strictly decreasing radix
    ladder ending in 0 — ``[5, 0]`` is the two-pass cents plan (32-cent
    coarse bins), ``[42, 21, 0]`` covers the FULL int64 domain in three
    passes of <= 2^22 live buckets each (the "radix 2^21 x 3 passes"
    nesting).  Arithmetic shift floors, so bucket order is value order
    for negatives too.

    Pass 1 folds per-(group, v >> shifts[0]) counts; the driver finds the
    bucket holding each of the two median ranks.  Every later pass
    re-scans only rows inside the <= 2 target buckets per group and
    refines one more radix level; at shift 0 the bucket IS the value.
    Driver state per pass: pass 1 <= groups x min(n, domain >> shifts[0])
    bucket rows, pass k >= 2 <= groups x 2 x 2^(shifts[k-1] - shifts[k]).

    Returns (key, n, med2) — med2 = sum of the two middle order
    statistics, so even-count interpolation stays integer-exact."""
    res = _exact_ranks_impl(make_ds, key_col, val_fn, shifts,
                            lambda n: {(n - 1) // 2, n // 2})
    out_k = sorted(res)
    return pa.table({
        "key": pa.array(out_k, type=pa.string()),
        "n": pa.array([res[k][0] for k in out_k], type=pa.int64()),
        "med2": pa.array(
            [res[k][1][(res[k][0] - 1) // 2] + res[k][1][res[k][0] // 2]
             for k in out_k], type=pa.int64())})


def _exact_ranks_impl(make_ds, key_col: str, val_fn, shifts,
                      ranks_fn) -> dict:
    assert shifts and shifts[-1] == 0 and \
        all(a > b for a, b in zip(shifts, shifts[1:]))
    LAST_MEDIAN.clear()
    LAST_MEDIAN.update({"passes": len(shifts), "fold_rows": []})

    def p1(t: pa.Table) -> pa.Table:
        v = val_fn(t)
        g = pa.TableGroupBy(
            pa.table({"key": t[key_col], "bucket": pa.array(v >> shifts[0])}),
            ["key", "bucket"]).aggregate([([], "count_all")])
        return pa.table({"key": g["key"], "bucket": g["bucket"],
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    folded = _fold_partials(
        make_ds().map_batches(p1, batch_format="pyarrow", batch_size=None),
        ["key", "bucket"])
    if folded is None:
        return {}
    LAST_MEDIAN["fold_rows"].append(folded.num_rows)

    # state per key: total n, and per target rank its current bucket
    # (prefix at the last-resolved shift) + rank local to that bucket
    totals: dict = {}
    targets: dict = {}          # key -> {rank: (prefix, local_rank)}
    hist = folded.to_pandas() \
        .sort_values(["key", "bucket"], ignore_index=True)
    for key, gdf in hist.groupby("key", sort=True, dropna=False):
        cnt = gdf["cnt"].to_numpy()
        buckets = gdf["bucket"].to_numpy()
        cum = cnt.cumsum()
        n = int(cum[-1])
        totals[key] = n
        tgt = targets.setdefault(key, {})
        for rank in ranks_fn(n):
            assert 0 <= rank < n, (key, rank, n)
            i = int(np.searchsorted(cum, rank + 1))
            below = int(cum[i - 1]) if i else 0
            tgt[rank] = (int(buckets[i]), rank - below)

    for li in range(1, len(shifts)):
        prev_shift, s = shifts[li - 1], shifts[li]
        pref_sets = {k: {p for p, _ in tgt.values()}
                     for k, tgt in targets.items()}

        def pn(t: pa.Table, _ps=prev_shift, _s=s,
               _pref=pref_sets) -> pa.Table:
            v = val_fn(t)
            k = t[key_col].to_numpy(zero_copy_only=False)
            pb = v >> _ps
            mask = np.zeros(len(v), dtype=bool)
            for key, prefixes in _pref.items():
                mask |= (k == key) & np.isin(pb, list(prefixes))
            g = pa.TableGroupBy(
                pa.table({"key": pa.array(k[mask], type=pa.string()),
                          "pbkt": pa.array(pb[mask]),
                          "bucket": pa.array(v[mask] >> _s)}),
                ["key", "pbkt", "bucket"]).aggregate([([], "count_all")])
            return pa.table({"key": g["key"], "pbkt": g["pbkt"],
                             "bucket": g["bucket"],
                             "cnt": pc.cast(g["count_all"], pa.int64())})

        folded = _fold_partials(
            make_ds().map_batches(pn, batch_format="pyarrow",
                                  batch_size=None),
            ["key", "pbkt", "bucket"])
        LAST_MEDIAN["fold_rows"].append(folded.num_rows)
        fine = folded.to_pandas() \
            .sort_values(["key", "pbkt", "bucket"], ignore_index=True)
        by_kp = {kp: gdf for kp, gdf in fine.groupby(["key", "pbkt"],
                                                     sort=False)}
        for key, tgt in targets.items():
            for rank, (prefix, local) in tgt.items():
                gdf = by_kp[(key, prefix)]
                cum = gdf["cnt"].to_numpy().cumsum()
                i = int(np.searchsorted(cum, local + 1))
                below = int(cum[i - 1]) if i else 0
                tgt[rank] = (int(gdf["bucket"].to_numpy()[i]), local - below)

    return {key: (totals[key],
                  {rank: prefix
                   for rank, (prefix, _) in targets[key].items()})
            for key in targets}


def q_median_value_by_type(sf_dir: str):
    """Exact per-event-type median of ``value`` (as ``2*median`` in cents
    so even-count interpolation stays integer), via two scans and O(1)
    driver state per coarse bucket — see the module docstring.  The cents
    domain needs one refinement level (shifts [5, 0]); a 64-bit domain
    runs the same engine with shifts [42, 21, 0]
    (tests/test_robust.py pins that nesting against a sorted-scan
    oracle)."""
    res = exact_median_by_group(
        lambda: _events(sf_dir, ["event_type", "value"]),
        "event_type", lambda t: _cents(t["value"]), [_MED_SHIFT, 0])
    return pa.table({"event_type": res["key"], "n": res["n"],
                     "med2_cents": res["med2"]})


SQL_MEDIAN_VALUE_BY_TYPE = """
SELECT event_type, count(*)::BIGINT AS n,
       CAST(2 * median(CAST(floor(value*100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS med2_cents
FROM events GROUP BY event_type
"""


_P_NUM, _P_DEN = 9, 10        # percentile_cont(0.9) as the exact rational


def q_percentile_cont_by_type(sf_dir: str):
    """Exact INTERPOLATED p90 per event type — the percentile_cont shape,
    with no float on the gated path: the continuous percentile sits at
    fractional rank h = (n-1) * 9/10, i.e. between order statistics
    ``lo = floor(h)`` and ``hi = ceil(h)`` with weight ``frac_num/10``,
    so the query returns (n, lo_cents, hi_cents, frac_num) and the
    consumer forms ``lo + (hi-lo) * frac_num/10`` as an exact rational.
    Same nested-histogram engine as the median
    (:func:`exact_ranks_by_group`); the two target ranks add at most one
    extra live bucket per pass over the median's cost."""
    res = exact_ranks_by_group(
        lambda: _events(sf_dir, ["event_type", "value"]),
        "event_type", lambda t: _cents(t["value"]), [_MED_SHIFT, 0],
        lambda n: {((n - 1) * _P_NUM) // _P_DEN,
                   ((n - 1) * _P_NUM + _P_DEN - 1) // _P_DEN})
    keys = sorted(res)
    lo_r = {k: ((res[k][0] - 1) * _P_NUM) // _P_DEN for k in keys}
    hi_r = {k: ((res[k][0] - 1) * _P_NUM + _P_DEN - 1) // _P_DEN
            for k in keys}
    return pa.table({
        "event_type": pa.array(keys, type=pa.string()),
        "n": pa.array([res[k][0] for k in keys], type=pa.int64()),
        "lo_cents": pa.array([res[k][1][lo_r[k]] for k in keys],
                             type=pa.int64()),
        "hi_cents": pa.array([res[k][1][hi_r[k]] for k in keys],
                             type=pa.int64()),
        "frac_num": pa.array([((res[k][0] - 1) * _P_NUM) % _P_DEN
                              for k in keys], type=pa.int64())})


SQL_PERCENTILE_CONT_BY_TYPE = """
WITH c AS (
  SELECT event_type, CAST(floor(value*100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) - 1
             AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c)
SELECT event_type, max(n)::BIGINT AS n,
       max(CASE WHEN rk = ((n-1)*9)//10 THEN cents END)::BIGINT
           AS lo_cents,
       max(CASE WHEN rk = ((n-1)*9 + 9)//10 THEN cents END)::BIGINT
           AS hi_cents,
       max(((n-1)*9) % 10)::BIGINT AS frac_num
FROM r GROUP BY event_type
"""


_WIDE_OFF = 228_000_000_000_000_000   # centers the ~2^57.7 domain near 0


def q_median_wide_by_type(sf_dir: str):
    """Gated end-to-end exercise of the full-int64-domain radix ladder:
    exact per-type median of the SYNTHETIC wide value
    ``epoch_us(ts) * 128 + event_id % 128 - 2.28e17`` (spans ~±2^57,
    straddles zero, unique per row) via the three-pass MED_SHIFTS_64
    nesting.  ~2^16 live pass-1 buckets per type here; the oracle states
    the two middle order statistics with window functions, so both sides
    stay integer-exact — no float median crosses the gate."""

    def vfn(t: pa.Table) -> np.ndarray:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = pc.cast(t["event_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return ts * 128 + eid % 128 - _WIDE_OFF

    res = exact_median_by_group(
        lambda: _events(sf_dir, ["event_id", "event_type", "ts"]),
        "event_type", vfn, MED_SHIFTS_64)
    return pa.table({"event_type": res["key"], "n": res["n"],
                     "med2_wide": res["med2"]})


SQL_MEDIAN_WIDE_BY_TYPE = f"""
WITH v AS (
  SELECT event_type,
         epoch_us(ts) * 128 + event_id % 128 - {_WIDE_OFF} AS v
  FROM events
), r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v)
SELECT event_type, max(n)::BIGINT AS n,
       (sum(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END)
        + sum(CASE WHEN rn = n // 2 + 1 THEN v ELSE 0 END))::BIGINT
         AS med2_wide
FROM r GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# ordered-funnel conversion counts
# ---------------------------------------------------------------------------

FUNNEL = ("view", "click", "purchase")
_TS_MAX = np.iinfo(np.int64).max


def funnel_partial(t: pa.Table) -> pa.Table:
    """Per-batch conditional-min partial: <= len(FUNNEL) rows per user
    seen in the batch (user_id, stage, min ts).  Module-level for tests."""
    parts = []
    for idx, stage in enumerate(FUNNEL):
        sub = t.filter(pc.equal(t["event_type"], stage))
        if sub.num_rows == 0:
            continue
        g = pa.TableGroupBy(
            pa.table({"key": pc.cast(sub["user_id"], pa.int64()),
                      "ts_us": pc.cast(sub["ts"], pa.int64())}),
            ["key"]).aggregate([("ts_us", "min")])
        parts.append(pa.table({
            "key": g["key"],
            "stage": pa.array(np.full(g.num_rows, idx, dtype=np.int64)),
            "ts_us": pc.cast(g["ts_us_min"], pa.int64())}))
    if not parts:
        return pa.schema([("key", pa.int64()), ("stage", pa.int64()),
                          ("ts_us", pa.int64())]).empty_table()
    return pa.concat_tables(parts)


def funnel_block(t: pa.Table) -> pa.Table:
    """Per-partition kernel: fold (user, stage) mins, then count users
    passing each ordered stage — one 3-int row per partition."""
    if t.num_rows == 0:
        return pa.table({"n_view": pa.array([0], type=pa.int64()),
                         "n_view_click": pa.array([0], type=pa.int64()),
                         "n_funnel": pa.array([0], type=pa.int64())})
    key = t["key"].to_numpy(zero_copy_only=False)
    stage = t["stage"].to_numpy(zero_copy_only=False)
    ts = t["ts_us"].to_numpy(zero_copy_only=False)
    users, uinv = np.unique(key, return_inverse=True)
    mat = np.full((len(users), len(FUNNEL)), _TS_MAX, dtype=np.int64)
    np.minimum.at(mat, (uinv, stage), ts)
    n_view = int(np.count_nonzero(mat[:, 0] < _TS_MAX))
    # a missing stage holds the _TS_MAX sentinel: `tv < tc` must then be
    # FALSE (SQL's `tv < NULL` is NULL), so every comparison also requires
    # the later stage to be present — fixtures never exercise this (all
    # users hit all types); the strictness unit test does
    vc = (mat[:, 0] < mat[:, 1]) & (mat[:, 1] < _TS_MAX)
    full = vc & (mat[:, 1] < mat[:, 2]) & (mat[:, 2] < _TS_MAX)
    return pa.table({
        "n_view": pa.array([n_view], type=pa.int64()),
        "n_view_click": pa.array([int(np.count_nonzero(vc))],
                                 type=pa.int64()),
        "n_funnel": pa.array([int(np.count_nonzero(full))],
                             type=pa.int64())})


def q_user_funnel(sf_dir: str):
    """Conversion funnel over the event log (first 'view' before first
    'click' before first 'purchase', per user): conditional-min partials,
    one user-keyed exchange, scalar partials back — see module docstring."""
    import pyarrow.parquet as pq

    from engine.stages import hash_group_exchange

    nrows = pq.read_metadata(
        os.path.join(sf_dir, "events.parquet")).num_rows
    parts = hash_group_exchange(
        lambda: _events(sf_dir, ["user_id", "event_type", "ts"])
        .map_batches(funnel_partial, batch_format="pyarrow",
                     batch_size=None),
        ["key"], funnel_block, rows_hint=nrows)   # pandas, 1 row/partition
    return pa.table({
        c: pa.array([int(parts[c].sum()) if len(parts) else 0],
                    type=pa.int64())
        for c in ("n_view", "n_view_click", "n_funnel")})


SQL_USER_FUNNEL = """
WITH m AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view')     AS tv,
         min(ts) FILTER (WHERE event_type = 'click')    AS tc,
         min(ts) FILTER (WHERE event_type = 'purchase') AS tp
  FROM events GROUP BY user_id)
SELECT count(*) FILTER (WHERE tv IS NOT NULL)::BIGINT       AS n_view,
       count(*) FILTER (WHERE tv < tc)::BIGINT              AS n_view_click,
       count(*) FILTER (WHERE tv < tc AND tc < tp)::BIGINT  AS n_funnel
FROM m
"""


# ---------------------------------------------------------------------------
# integer-exact 3-sigma outliers per event type
# ---------------------------------------------------------------------------

def _moments_partial(t: pa.Table) -> pa.Table:
    cents = _cents(t["value"])
    g = pa.TableGroupBy(
        pa.table({"event_type": t["event_type"], "c": pa.array(cents),
                  "c2": pa.array(cents * cents)}),
        ["event_type"]).aggregate([([], "count_all"), ("c", "sum"),
                                   ("c2", "sum")])
    return pa.table({"event_type": g["event_type"],
                     "n": pc.cast(g["count_all"], pa.int64()),
                     "s1": pc.cast(g["c_sum"], pa.int64()),
                     "s2": pc.cast(g["c2_sum"], pa.int64())})


def sigma_cutoffs(moments: dict) -> dict:
    """{type: (n, s1, s2)} -> {type: (lo_max, hi_min)} such that cents is
    a 3-sigma outlier iff cents <= lo_max or cents >= hi_min.  Exact over
    Python bigints: |n*v - s1| > t where t = isqrt(9*(n*s2 - s1^2)) is,
    for integers, equivalent to (n*v - s1)^2 > 9*(n*s2 - s1^2).
    Module-level for the hypothesis property test."""
    cut = {}
    for etype, (n, s1, s2) in moments.items():
        disc = 9 * (n * s2 - s1 * s1)
        t = math.isqrt(disc) if disc > 0 else 0
        hi_min = (s1 + t) // n + 1          # smallest c with n*c - s1 > t
        lo_max = (s1 - t - 1) // n          # largest  c with s1 - n*c > t
        cut[etype] = (lo_max, hi_min)
    return cut


def q_value_outliers(sf_dir: str):
    """Events whose value deviates from their type's mean by more than 3
    standard deviations — two passes, zero float math (module docstring).
    The per-batch moment partials are int64-safe (262k-row batches x
    cents^2 < 2^62); the DRIVER fold runs in Python bigints so a
    10^12-row corpus cannot overflow the global sum of squares."""
    partials = _events(sf_dir, ["event_type", "value"]) \
        .map_batches(_moments_partial, batch_format="pyarrow",
                     batch_size=None)
    moments: dict = {}
    for b in collect_tables(partials):
        if not b.num_columns:
            continue
        for r in b.to_pylist():
            # int() lifts to bigint; partial sums merge exactly
            prev = moments.get(r["event_type"], (0, 0, 0))
            moments[r["event_type"]] = (prev[0] + int(r["n"]),
                                        prev[1] + int(r["s1"]),
                                        prev[2] + int(r["s2"]))
    cut = sigma_cutoffs(moments)

    def flag(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        et = t["event_type"].to_numpy(zero_copy_only=False)
        mask = np.zeros(len(cents), dtype=bool)
        for etype, (lo_max, hi_min) in cut.items():
            mask |= (et == etype) & ((cents <= lo_max) | (cents >= hi_min))
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64())
            .filter(pa.array(mask)),
            "event_type": pa.array(et[mask], type=pa.string()),
            "cents": pa.array(cents[mask])})

    return _events(sf_dir, ["event_id", "event_type", "value"]) \
        .map_batches(flag, batch_format="pyarrow").sort("event_id")


SQL_VALUE_OUTLIERS = """
WITH c AS (
  SELECT event_id::BIGINT AS event_id, event_type,
         CAST(floor(value*100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
m AS (
  SELECT event_type, count(*)::HUGEINT AS n, sum(cents::HUGEINT) AS s1,
         sum(cents::HUGEINT * cents::HUGEINT) AS s2
  FROM c GROUP BY event_type)
SELECT c.event_id, c.event_type, c.cents
FROM c JOIN m USING (event_type)
WHERE (m.n*c.cents - m.s1)*(m.n*c.cents - m.s1) > 9*(m.n*m.s2 - m.s1*m.s1)
"""


# ---------------------------------------------------------------------------
# log2-bucketed corpus length histogram
# ---------------------------------------------------------------------------

def length_buckets(n_chars: np.ndarray) -> np.ndarray:
    """floor(log2(n)) computed EXACTLY via frexp exponents (n = m * 2^e,
    0.5 <= m < 1  =>  floor(log2 n) = e - 1); n <= 0 maps to bucket 0,
    matching the oracle's length(printf('%b', n)) - 1 which renders 0 as
    the single digit '0'.  Module-level for tests."""
    _, e = np.frexp(n_chars.astype(np.float64))
    return np.where(n_chars <= 0, 0, e.astype(np.int64) - 1)


def q_doc_length_histogram(sf_dir: str):
    """Per-language log2 histogram of document lengths (count + total
    chars per bucket): one pure map of partials, one combiner fold."""

    def partial(t: pa.Table) -> pa.Table:
        n_chars = t["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pa.TableGroupBy(
            pa.table({"lang": t["lang"],
                      "bucket": pa.array(length_buckets(n_chars)),
                      "n_chars": pa.array(n_chars)}),
            ["lang", "bucket"]).aggregate([([], "count_all"),
                                           ("n_chars", "sum")])
        return pa.table({"lang": g["lang"], "bucket": g["bucket"],
                         "n_docs": pc.cast(g["count_all"], pa.int64()),
                         "sum_chars": pc.cast(g["n_chars_sum"], pa.int64())})

    folded = _fold_partials(
        read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["lang", "bucket"])
    if folded is None:
        return pa.table({"lang": pa.array([], type=pa.string()),
                         "bucket": pa.array([], type=pa.int64()),
                         "n_docs": pa.array([], type=pa.int64()),
                         "sum_chars": pa.array([], type=pa.int64())})
    return folded.sort_by([("lang", "ascending"), ("bucket", "ascending")])


SQL_DOC_LENGTH_HISTOGRAM = """
SELECT lang, (length(printf('%b', n_chars)) - 1)::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY lang, bucket
"""


# ---------------------------------------------------------------------------
# cohort retention matrix
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86_400 * 1_000_000


def retention_partial(t: pa.Table) -> pa.Table:
    """Per-batch distinct (user, week) pairs — the only rows that ride
    the user-keyed exchange."""
    ts = t["ts"].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    g = pa.TableGroupBy(pa.table({
        "key": pc.cast(t["user_id"], pa.int64()),
        "week": pa.array(ts // _WEEK_US)}), ["key", "week"]) \
        .aggregate([])
    return g


def retention_block(t: pa.Table) -> pa.Table:
    """Per-partition kernel: each user lands whole, so the per-user min
    week IS the global cohort; emit (cohort, active week, user count)
    partials — <= weeks^2 rows per partition."""
    if t.num_rows == 0:
        return pa.schema([("cohort_week", pa.int64()),
                          ("active_week", pa.int64()),
                          ("n_users", pa.int64())]).empty_table()
    key = t["key"].to_numpy(zero_copy_only=False)
    week = t["week"].to_numpy(zero_copy_only=False)
    order = np.lexsort((week, key))
    key, week = key[order], week[order]
    new_u = np.empty(len(key), dtype=bool)
    new_u[0] = True
    new_u[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new_u)
    grp = np.cumsum(new_u) - 1
    # drop duplicate (user, week) rows surviving across batches
    keep = np.empty(len(key), dtype=bool)
    keep[0] = True
    keep[1:] = new_u[1:] | (week[1:] != week[:-1])
    cohort = week[starts][grp]
    g = pa.TableGroupBy(pa.table({
        "cohort_week": pa.array(cohort[keep]),
        "active_week": pa.array(week[keep])}),
        ["cohort_week", "active_week"]).aggregate([([], "count_all")])
    return pa.table({"cohort_week": g["cohort_week"],
                     "active_week": g["active_week"],
                     "n_users": pc.cast(g["count_all"], pa.int64())})


def q_user_retention(sf_dir: str):
    """Weekly cohort retention: users grouped by their first-active week,
    counted in every week they return.  One user-keyed exchange of
    distinct (user, week) pairs (per-batch distinct partials bound the
    exchange), per-partition vectorized cohort fold, and <= weeks^2
    partial rows per partition back to the driver."""
    import pyarrow.parquet as pq

    from engine.stages import hash_group_exchange

    nrows = pq.read_metadata(
        os.path.join(sf_dir, "events.parquet")).num_rows
    df = hash_group_exchange(
        lambda: _events(sf_dir, ["user_id", "ts"])
        .map_batches(retention_partial, batch_format="pyarrow",
                     batch_size=None),
        ["key"], retention_block, rows_hint=max(1, nrows // 4))
    if df.empty:
        return pa.table({"cohort_week": pa.array([], type=pa.int64()),
                         "active_week": pa.array([], type=pa.int64()),
                         "n_users": pa.array([], type=pa.int64())})
    out = df.groupby(["cohort_week", "active_week"], as_index=False) \
        ["n_users"].sum() \
        .sort_values(["cohort_week", "active_week"], ignore_index=True)
    return pa.table({
        "cohort_week": pa.array(out["cohort_week"].astype(np.int64)),
        "active_week": pa.array(out["active_week"].astype(np.int64)),
        "n_users": pa.array(out["n_users"].astype(np.int64))})


SQL_USER_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
  FROM events),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
SELECT cohort_week, week AS active_week, count(*)::BIGINT AS n_users
FROM uw JOIN cohort USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_quartiles_cont_by_type(sf_dir: str):
    """All three interpolated quartiles (p25/p50/p75) per event type in
    ONE fused refinement — SQL's three percentile_cont calls cost three
    sorts; here the rank-set engine resolves all six bracketing ranks in
    the same two scans the median alone costs (each extra rank adds at
    most one live bucket per pass).  Integer-exact quadruples per
    quartile, weight denominator 4."""
    res = exact_ranks_by_group(
        lambda: _events(sf_dir, ["event_type", "value"]),
        "event_type", lambda t: _cents(t["value"]), [_MED_SHIFT, 0],
        lambda n: {r for k in (1, 2, 3)
                   for r in (((n - 1) * k) // 4,
                             ((n - 1) * k + 3) // 4)})
    keys = sorted(res)
    cols: dict = {"event_type": pa.array(keys, type=pa.string()),
                  "n": pa.array([res[k][0] for k in keys],
                                type=pa.int64())}
    for qi in (1, 2, 3):
        lo, hi, frac = [], [], []
        for k in keys:
            n, picked = res[k]
            lo.append(picked[((n - 1) * qi) // 4])
            hi.append(picked[((n - 1) * qi + 3) // 4])
            frac.append(((n - 1) * qi) % 4)
        cols[f"q{qi}_lo"] = pa.array(lo, type=pa.int64())
        cols[f"q{qi}_hi"] = pa.array(hi, type=pa.int64())
        cols[f"q{qi}_frac"] = pa.array(frac, type=pa.int64())
    return pa.table(cols)


SQL_QUARTILES_CONT_BY_TYPE = """
WITH c AS (
  SELECT event_type, CAST(floor(value*100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) - 1
             AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c)
SELECT event_type, max(n)::BIGINT AS n,
       max(CASE WHEN rk = ((n-1)*1)//4 THEN cents END)::BIGINT AS q1_lo,
       max(CASE WHEN rk = ((n-1)*1 + 3)//4 THEN cents END)::BIGINT
           AS q1_hi,
       max(((n-1)*1) % 4)::BIGINT AS q1_frac,
       max(CASE WHEN rk = ((n-1)*2)//4 THEN cents END)::BIGINT AS q2_lo,
       max(CASE WHEN rk = ((n-1)*2 + 3)//4 THEN cents END)::BIGINT
           AS q2_hi,
       max(((n-1)*2) % 4)::BIGINT AS q2_frac,
       max(CASE WHEN rk = ((n-1)*3)//4 THEN cents END)::BIGINT AS q3_lo,
       max(CASE WHEN rk = ((n-1)*3 + 3)//4 THEN cents END)::BIGINT
           AS q3_hi,
       max(((n-1)*3) % 4)::BIGINT AS q3_frac
FROM r GROUP BY event_type
"""
