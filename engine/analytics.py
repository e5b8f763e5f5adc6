"""Windowed / order-statistics analytics over the relational tables.

Four operator families the reference's aggregate layer (src/parser.py
summary counts; hex_decoder_module's per-packet stats) never needed but a
large-scale training-data pipeline does, each expressed Ray-Data-first:

* ``q_events_running_totals`` — per-key window functions (row_number,
  running sum, lag-gap) over the events log: ONE hash-keyed exchange
  co-locates each user's rows, then a single lexsort + cumsum pass per
  partition computes every user's windows at once (the
  ``groupby(user).map_groups`` form costs one Python call per user —
  see :func:`engine.stages.hash_group_exchange`).
* ``q_value_quantiles_by_type`` — EXACT per-group order statistics
  (min/max/quantile_disc) of an unbounded-domain double column.  The
  bounded-domain histogram trick (engine/sketch.py token_quantiles)
  does not apply to continuous values; instead whole groups are
  co-located by the exchange and one lexsort ranks every group in the
  partition.  Partitioning assumption: one GROUP's rows fit a worker
  heap — true for bounded group counts (event types); for hot groups at
  100 TB switch to the sketch module's mergeable quantile summaries.
* ``q_customers_without_urgent_order`` — distributed ANTI-join: both
  sides tagged and unioned, ONE exchange on the join key, per-partition
  vectorized ``np.isin`` mask.  No broadcast (the build side is
  unbounded at scale), no driver-side sets; the probe side's payload
  columns ride the same exchange.
* ``q_distinct_users_by_type`` — exact COUNT(DISTINCT) per group: a
  per-batch distinct-pair partial cuts the exchange to unique pairs per
  batch, the exchange co-locates by user_id (each user lands in exactly
  one partition, so per-partition dedup IS global dedup), and only
  O(types) partial rows per partition return to the driver.

All outputs are integer-exact (milli-units via ``floor(x*1000+0.5)``,
identical IEEE expression order in numpy and DuckDB) so the driver's
value-hash gate is deterministic.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine.io import read_parquet_clean


def _table(sf_dir: str, name: str):
    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"))


def _nrows(sf_dir: str, name: str) -> int:
    return pq.read_metadata(os.path.join(sf_dir, f"{name}.parquet")).num_rows


# ---------------------------------------------------------------------------
# window functions: row_number / running sum / lag gap per user
# ---------------------------------------------------------------------------

def windows_block(t: pa.Table) -> pa.Table:
    """Per-partition window kernel: one lexsort by (user, ts, event_id),
    then row_number / running sum / lag gap for every user in the block.
    Module-level so property tests can drive it directly."""
    n = t.num_rows
    if n == 0:
        return pa.schema([("event_id", pa.int64()),
                          ("user_id", pa.int64()),
                          ("seq", pa.int64()),
                          ("cum_value_milli", pa.int64()),
                          ("gap_us", pa.int64())]).empty_table()
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    v = t["value"].to_numpy(zero_copy_only=False)
    v_milli = np.floor(v * 1000.0 + 0.5).astype(np.int64)

    order = np.lexsort((eid, ts, uid))
    uid, eid, ts, v_milli = uid[order], eid[order], ts[order], v_milli[order]
    new_u = np.empty(n, dtype=bool)
    new_u[0] = True
    new_u[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(new_u)
    grp = np.cumsum(new_u) - 1

    seq = np.arange(n, dtype=np.int64) - starts[grp] + 1
    cum = np.cumsum(v_milli)
    base = (cum[starts] - v_milli[starts])[grp]
    gap = np.empty(n, dtype=np.int64)
    gap[0] = 0
    gap[1:] = ts[1:] - ts[:-1]
    gap[new_u] = 0
    return pa.table({"event_id": pa.array(eid),
                     "user_id": pa.array(uid),
                     "seq": pa.array(seq),
                     "cum_value_milli": pa.array(cum - base),
                     "gap_us": pa.array(gap)})


def q_events_running_totals(sf_dir: str):
    """row_number(), running SUM(value) and lag-gap per user ordered by
    (ts, event_id) — the standard windowed-analytics triple, one exchange
    plus one vectorized pass per partition (no per-user Python calls)."""
    from engine.stages import hash_group_exchange

    # O(n_events) output rows — stays a streaming Dataset
    return hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "value"]),
        ["user_id"], windows_block, collect=False,
        rows_hint=_nrows(sf_dir, "events"))


SQL_EVENTS_RUNNING_TOTALS = """
SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
       (row_number() OVER w)::BIGINT AS seq,
       (sum(CAST(floor(value*1000.0 + 0.5) AS BIGINT)) OVER w)::BIGINT
           AS cum_value_milli,
       coalesce(date_diff('microsecond', lag(ts) OVER w, ts), 0)::BIGINT
           AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# exact grouped order statistics (quantile_disc over a continuous column)
# ---------------------------------------------------------------------------

def quantiles_block(t: pa.Table) -> pa.Table:
    """Per-partition order-statistics kernel: one lexsort ranks every
    event_type group in the block; quantile_disc rank = element at
    1-indexed ceil(q*n).  Module-level for property tests."""
    n = t.num_rows
    if n == 0:
        return pa.schema([("event_type", pa.string()),
                          ("n", pa.int64()),
                          ("min_milli", pa.int64()),
                          ("max_milli", pa.int64()),
                          ("p25_milli", pa.int64()),
                          ("p50_milli", pa.int64()),
                          ("p75_milli", pa.int64())]).empty_table()
    et = t["event_type"].to_numpy(zero_copy_only=False)
    v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 1000.0
                 + 0.5).astype(np.int64)
    order = np.lexsort((v, et))
    et, v = et[order], v[order]
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = et[1:] != et[:-1]
    starts = np.flatnonzero(new_g)
    counts = np.diff(np.append(starts, n))

    def q_at(q: float) -> np.ndarray:
        # 0.25/0.5/0.75 are exact binary fractions -> ceil is exact
        return v[starts + np.ceil(q * counts).astype(np.int64) - 1]

    return pa.table({"event_type": pa.array(et[starts]),
                     "n": pa.array(counts),
                     "min_milli": pa.array(v[starts]),
                     "max_milli": pa.array(v[starts + counts - 1]),
                     "p25_milli": pa.array(q_at(0.25)),
                     "p50_milli": pa.array(q_at(0.50)),
                     "p75_milli": pa.array(q_at(0.75))})


def q_value_quantiles_by_type(sf_dir: str):
    """Exact per-event-type min/max/p25/p50/p75 of the continuous ``value``
    column (milli-units).  quantile_disc rank (both sides): the element at
    1-indexed position ceil(q*n) of the group's sorted values."""
    from engine.stages import hash_group_exchange

    return hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(
            ["event_type", "value"]),
        ["event_type"], quantiles_block, collect=True,
        rows_hint=_nrows(sf_dir, "events"))


SQL_VALUE_QUANTILES = """
WITH m AS (
  SELECT event_type, CAST(floor(value*1000.0 + 0.5) AS BIGINT) AS v
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n,
       min(v)::BIGINT AS min_milli, max(v)::BIGINT AS max_milli,
       quantile_disc(v, 0.25)::BIGINT AS p25_milli,
       quantile_disc(v, 0.50)::BIGINT AS p50_milli,
       quantile_disc(v, 0.75)::BIGINT AS p75_milli
FROM m GROUP BY 1
"""


# ---------------------------------------------------------------------------
# distributed anti-join (NOT EXISTS) without broadcast or driver sets
# ---------------------------------------------------------------------------

def q_customers_without_urgent_order(sf_dir: str):
    """Customers with no '1-URGENT' order: tag both sides, union, ONE
    hash exchange on the key, per-partition vectorized anti mask.  The
    build side is pre-deduplicated per batch (unique custkeys only) so the
    exchange carries at most one row per (batch, custkey)."""
    from engine.stages import hash_group_exchange

    def tag_cust(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": pc.cast(t["c_custkey"], pa.int64()),
            "c_name": t["c_name"],
            "c_mktsegment": t["c_mktsegment"],
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def tag_orders(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["o_orderpriority"], "1-URGENT")
        keys = pc.unique(pc.cast(t.filter(mask)["o_custkey"], pa.int64()))
        n = len(keys)
        return pa.table({
            "key": keys,
            "c_name": pa.nulls(n, pa.string()),
            "c_mktsegment": pa.nulls(n, pa.string()),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    def anti(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        probe = side == 0
        have = key[~probe]
        keep = probe & ~np.isin(key, have)
        kept = t.filter(pa.array(keep))
        return pa.table({"c_custkey": kept["key"],
                         "c_name": kept["c_name"],
                         "c_mktsegment": kept["c_mktsegment"]})

    def build():
        cust = _table(sf_dir, "customer").select_columns(
            ["c_custkey", "c_name", "c_mktsegment"]) \
            .map_batches(tag_cust, batch_format="pyarrow")
        orders = _table(sf_dir, "orders").select_columns(
            ["o_custkey", "o_orderpriority"]) \
            .map_batches(tag_orders, batch_format="pyarrow")
        return cust.union(orders)

    return hash_group_exchange(
        build, ["key"], anti, collect=False,
        rows_hint=_nrows(sf_dir, "customer") + _nrows(sf_dir, "orders"))


SQL_CUSTOMERS_WITHOUT_URGENT = """
SELECT c_custkey::BIGINT AS c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# exact COUNT(DISTINCT) per group via key-partitioned exchange
# ---------------------------------------------------------------------------

def q_distinct_users_by_type(sf_dir: str):
    """count(DISTINCT user_id) + count(*) per event_type, exactly: distinct
    (type, user, n) partials per batch, one exchange keyed on user_id
    (per-partition dedup IS global dedup), O(types) partial rows back."""
    from engine.stages import hash_group_exchange

    def pair_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["event_type", "user_id"]),
            ["event_type", "user_id"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "user_id": pc.cast(g["user_id"], pa.int64()),
                         "n": pc.cast(g["count_all"], pa.int64())})

    def fold_partition(t: pa.Table) -> pa.Table:
        # merge per-batch partials for the same pair, then reduce to one
        # partial row per event_type
        pairs = pa.TableGroupBy(t, ["event_type", "user_id"]) \
            .aggregate([("n", "sum")])
        g = pa.TableGroupBy(pairs, ["event_type"]) \
            .aggregate([([], "count_all"), ("n_sum", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "n_users": pc.cast(g["count_all"], pa.int64()),
                         "n_events": pc.cast(g["n_sum_sum"], pa.int64())})

    df = hash_group_exchange(
        lambda: _table(sf_dir, "events")
        .select_columns(["event_type", "user_id"])
        .map_batches(pair_partial, batch_format="pyarrow"),
        ["user_id"], fold_partition, collect=True,
        rows_hint=_nrows(sf_dir, "events"))
    out = df.groupby("event_type", as_index=False).sum()
    out["n_users"] = out["n_users"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out


SQL_DISTINCT_USERS_BY_TYPE = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# GROUPING SETS rollup in one pass (no shuffle)
# ---------------------------------------------------------------------------

def q_doc_rollup(sf_dir: str):
    """Counts + char sums for GROUPING SETS ((source,lang),(source),
    (lang),()) in ONE pass: per-batch partials at the FINEST level only
    (cardinality = sources x langs, tiny), driver derives every coarser
    level from the folded finest table.  '<all>' marks the rolled-up
    dimension (fixture columns are non-null)."""
    from engine.pipeline import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["source", "lang", "n_chars"]),
                            ["source", "lang"]) \
            .aggregate([([], "count_all"), ("n_chars", "sum")])
        return pa.table({"source": g["source"], "lang": g["lang"],
                         "n_docs": pc.cast(g["count_all"], pa.int64()),
                         "sum_chars": pc.cast(g["n_chars_sum"], pa.int64())})

    ds = _table(sf_dir, "documents") \
        .select_columns(["source", "lang", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    tabs = [b for b in collect_tables(ds) if b.num_columns]
    fine = pa.concat_tables(tabs).to_pandas() \
        .groupby(["source", "lang"], as_index=False).sum()

    import pandas as pd
    levels = [fine]
    for dims, fills in ((["source"], {"lang": "<all>"}),
                        (["lang"], {"source": "<all>"}),
                        ([], {"source": "<all>", "lang": "<all>"})):
        if dims:
            lv = fine.groupby(dims, as_index=False)[
                ["n_docs", "sum_chars"]].sum()
        else:
            lv = pd.DataFrame([fine[["n_docs", "sum_chars"]].sum()])
        for c, v in fills.items():
            lv[c] = v
        levels.append(lv[["source", "lang", "n_docs", "sum_chars"]])
    out = pd.concat(levels, ignore_index=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out


SQL_DOC_ROLLUP = """
SELECT coalesce(source, '<all>') AS source, coalesce(lang, '<all>') AS lang,
       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
"""


# ---------------------------------------------------------------------------
# top-k per group (QUALIFY row_number) via partial top-k partials
# ---------------------------------------------------------------------------

def _topk_per_group(prio: np.ndarray, cents: np.ndarray, key: np.ndarray,
                    k: int):
    """Vectorized per-group top-k by (cents DESC, key ASC): one lexsort,
    boundary masks, rank-within-group filter — no per-group Python."""
    order = np.lexsort((key, -cents, prio))
    p, c, kk = prio[order], cents[order], key[order]
    n = len(p)
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = p[1:] != p[:-1]
    starts = np.flatnonzero(new_g)
    grp = np.cumsum(new_g) - 1
    rank = np.arange(n, dtype=np.int64) - starts[grp] + 1
    keep = rank <= k
    return p[keep], c[keep], kk[keep], rank[keep]


def q_top3_orders_per_priority(sf_dir: str):
    """Top-3 orders per priority by (price DESC, orderkey ASC): per-batch
    partial top-3 per group (<= 3 x #priorities rows cross the fold per
    batch — the partial-top-K combiner shape of corpus.q_source_cap,
    generalized to value-ranked top-k), driver re-selects on the folded
    partials.  Prices compare as exact cents."""
    from engine.pipeline import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        prio = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        key = pc.cast(t["o_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        p, c, kk, _ = _topk_per_group(prio, cents, key, 3)
        return pa.table({"o_orderpriority": pa.array(p),
                         "price_cents": pa.array(c),
                         "o_orderkey": pa.array(kk)})

    ds = _table(sf_dir, "orders") \
        .select_columns(["o_orderpriority", "o_totalprice", "o_orderkey"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    tabs = [b for b in collect_tables(ds) if b.num_columns]
    t = pa.concat_tables(tabs)
    p, c, kk, rk = _topk_per_group(
        t["o_orderpriority"].to_numpy(zero_copy_only=False),
        t["price_cents"].to_numpy(zero_copy_only=False),
        t["o_orderkey"].to_numpy(zero_copy_only=False), 3)
    return pa.table({"o_orderpriority": pa.array(p),
                     "rk": pa.array(rk),
                     "o_orderkey": pa.array(kk),
                     "price_cents": pa.array(c)})


SQL_TOP3_ORDERS_PER_PRIORITY = """
SELECT o_orderpriority,
       (row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY price_cents DESC, o_orderkey))::BIGINT
           AS rk,
       o_orderkey::BIGINT AS o_orderkey, price_cents
FROM (SELECT o_orderpriority, o_orderkey,
             CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT) AS price_cents
      FROM orders)
QUALIFY rk <= 3
"""


# ---------------------------------------------------------------------------
# left-outer grouped count (customers with zero orders kept)
# ---------------------------------------------------------------------------

def q_orders_per_customer_left(sf_dir: str):
    """Order count + spend per customer INCLUDING zero-order customers:
    order-side per-batch partials (one row per (batch, custkey)), customer
    side tagged, one exchange on the key, per-partition segment sums.  The
    left-outer join never broadcasts and never ships order rows — only
    partials."""
    from engine.stages import hash_group_exchange

    def cust_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"key": pc.cast(t["c_custkey"], pa.int64()),
                         "n": pa.array(np.zeros(n, dtype=np.int64)),
                         "cents": pa.array(np.zeros(n, dtype=np.int64)),
                         "side": pa.array(np.zeros(n, dtype=np.int8))})

    def order_partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "key": pc.cast(t["o_custkey"], pa.int64()),
            "cents": pa.array(cents)}), ["key"]) \
            .aggregate([([], "count_all"), ("cents", "sum")])
        m = len(g)
        return pa.table({"key": g["key"],
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "cents": pc.cast(g["cents_sum"], pa.int64()),
                         "side": pa.array(np.ones(m, dtype=np.int8))})

    def fold(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, n, cents, side = key[order], n[order], cents[order], side[order]
        m = len(key)
        new_g = np.empty(m, dtype=bool)
        new_g[0] = True
        new_g[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new_g)
        # groups are non-empty and starts strictly increase -> reduceat safe
        n_sum = np.add.reduceat(n, starts)
        c_sum = np.add.reduceat(cents, starts)
        has_cust = np.add.reduceat((side == 0).astype(np.int64), starts) > 0
        return pa.table({"c_custkey": pa.array(key[starts][has_cust]),
                         "n_orders": pa.array(n_sum[has_cust]),
                         "spend_cents": pa.array(c_sum[has_cust])})

    def build():
        cust = _table(sf_dir, "customer").select_columns(["c_custkey"]) \
            .map_batches(cust_side, batch_format="pyarrow")
        orders = _table(sf_dir, "orders") \
            .select_columns(["o_custkey", "o_totalprice"]) \
            .map_batches(order_partial, batch_format="pyarrow",
                         batch_size=None)
        return cust.union(orders)

    # O(customers) output rows — stays a streaming Dataset
    return hash_group_exchange(
        build, ["key"], fold, collect=False,
        rows_hint=_nrows(sf_dir, "customer") + _nrows(sf_dir, "orders"))


SQL_ORDERS_PER_CUSTOMER_LEFT = """
SELECT c.c_custkey::BIGINT AS c_custkey,
       count(o.o_orderkey)::BIGINT AS n_orders,
       coalesce(sum(CAST(floor(o.o_totalprice*100.0 + 0.5) AS BIGINT)),
                0)::BIGINT AS spend_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# per-user event-type transition counts (Markov bigrams over the event log)
# ---------------------------------------------------------------------------

def transitions_block(t: pa.Table) -> pa.Table:
    """Per-partition transition kernel: lexsort by (user, ts, event_id),
    mask consecutive same-user rows, partial-count the (from,to) bigrams.
    Module-level for property tests."""
    n = t.num_rows
    empty = pa.schema([("from_type", pa.string()), ("to_type", pa.string()),
                       ("n", pa.int64())]).empty_table()
    if n < 2:
        return empty
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    et = t["event_type"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    uid, et = uid[order], et[order]
    same = uid[1:] == uid[:-1]
    if not same.any():
        return empty
    g = pa.TableGroupBy(pa.table({
        "from_type": pa.array(et[:-1][same]),
        "to_type": pa.array(et[1:][same])}), ["from_type", "to_type"]) \
        .aggregate([([], "count_all")])
    return pa.table({"from_type": g["from_type"], "to_type": g["to_type"],
                     "n": pc.cast(g["count_all"], pa.int64())})


def q_event_transitions(sf_dir: str):
    """Markov transition counts over the event log: how often each user's
    event of type A is immediately followed by type B (ordered by ts,
    event_id within the user).  One exchange on user_id co-locates each
    user's history whole; the per-partition kernel sorts once and
    partial-counts bigrams, so only O(types^2) rows per partition return
    to the driver."""
    from engine.stages import hash_group_exchange

    df = hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "event_type"]),
        ["user_id"], transitions_block, collect=True,
        rows_hint=_nrows(sf_dir, "events"))
    if df.empty:      # all partitions empty -> schema-less column-less frame
        return pa.schema([("from_type", pa.string()),
                          ("to_type", pa.string()),
                          ("n", pa.int64())]).empty_table().to_pandas()
    out = df.groupby(["from_type", "to_type"], as_index=False).sum()
    out["n"] = out["n"].astype("int64")
    return out


SQL_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev AS from_type, event_type AS to_type, count(*)::BIGINT AS n
FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# correlated-subquery decorrelation: orders above their customer's average
# ---------------------------------------------------------------------------

def above_avg_block(t: pa.Table) -> pa.Table:
    """Per-partition kernel: group sums/counts by custkey (reduceat over
    one sort), keep rows with cents * n_cust > sum_cents — the strict
    above-average test cross-multiplied so it is integer-exact (no
    division).  Module-level for property tests."""
    n = t.num_rows
    if n == 0:
        return pa.schema([("o_orderkey", pa.int64()),
                          ("o_custkey", pa.int64()),
                          ("price_cents", pa.int64())]).empty_table()
    key = t["key"].to_numpy(zero_copy_only=False)
    okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
    cents = t["price_cents"].to_numpy(zero_copy_only=False)
    order = np.argsort(key, kind="stable")
    key, okey, cents = key[order], okey[order], cents[order]
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new_g)
    grp = np.cumsum(new_g) - 1
    g_sum = np.add.reduceat(cents, starts)[grp]
    g_n = np.diff(np.append(starts, n))[grp]
    keep = cents * g_n > g_sum
    return pa.table({"o_orderkey": pa.array(okey[keep]),
                     "o_custkey": pa.array(key[keep]),
                     "price_cents": pa.array(cents[keep])})


def q_orders_above_customer_avg(sf_dir: str):
    """Orders strictly above their own customer's average order value —
    the classic correlated subquery, decorrelated into ONE hash exchange
    on the grouping key: each customer's orders co-locate, the partition
    kernel computes every customer's (sum, count) in one reduceat pass and
    filters by cross-multiplication (cents * n > sum), so the comparison
    is integer-exact with no float division on either side."""
    from engine.stages import hash_group_exchange

    def prep(t: pa.Table) -> pa.Table:
        cents = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({"key": pc.cast(t["o_custkey"], pa.int64()),
                         "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                         "price_cents": pa.array(cents)})

    # O(orders) output rows — stays a streaming Dataset
    return hash_group_exchange(
        lambda: _table(sf_dir, "orders").select_columns(
            ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow"),
        ["key"], above_avg_block, collect=False,
        rows_hint=_nrows(sf_dir, "orders"))


SQL_ORDERS_ABOVE_CUSTOMER_AVG = """
WITH c AS (
  SELECT o_orderkey::BIGINT AS o_orderkey, o_custkey::BIGINT AS o_custkey,
         CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT) AS price_cents,
         sum(CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT))
             OVER (PARTITION BY o_custkey) AS s,
         count(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders)
SELECT o_orderkey, o_custkey, price_cents
FROM c WHERE price_cents * n > s
"""


# ---------------------------------------------------------------------------
# GLOBAL ranking: row_number / dense_rank / ntile over per-user spend
# ---------------------------------------------------------------------------

_NTILE_K = 4


def ntile_exact(rn: np.ndarray, n: int, k: int = _NTILE_K) -> np.ndarray:
    """SQL ntile(): the first n%k buckets take ceil(n/k) rows, the rest
    floor(n/k) — NOT the uniform 1 + k*(rn-1)//n approximation, whose
    bucket sizes interleave differently.  rn is 1-indexed."""
    q, r = divmod(n, k)
    big = r * (q + 1)           # rows covered by the size-(q+1) buckets
    i = rn - 1
    return np.where(i < big, i // (q + 1) if q + 1 else 0,
                    r + (i - big) // max(q, 1)) + 1


def spend_fold_block(t: pa.Table) -> pa.Table:
    """Exchange-1 kernel: fold per-batch (user, cents) partials to one
    row per user (each user lands whole in exactly one partition)."""
    if t.num_rows == 0:
        return pa.schema([("user_id", pa.int64()),
                          ("spend_cents", pa.int64())]).empty_table()
    g = pa.TableGroupBy(t, ["user_id"]).aggregate([("cents", "sum")])
    return pa.table({"user_id": g["user_id"],
                     "spend_cents": pc.cast(g["cents_sum"], pa.int64())})


def rank_block(t: pa.Table) -> pa.Table:
    """Exchange-2 kernel: within one spend-range partition, order by
    (spend DESC, user_id ASC) and add the driver's carry offsets.  The
    range key is a FUNCTION of spend, so a tied spend value never
    straddles partitions and the dense counter is safely local."""
    if t.num_rows == 0:
        return pa.schema([("user_id", pa.int64()),
                          ("spend_cents", pa.int64()),
                          ("rn", pa.int64()),
                          ("dr", pa.int64()),
                          ("quartile", pa.int64())]).empty_table()
    n = t.num_rows
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    sp = t["spend_cents"].to_numpy(zero_copy_only=False)
    part = t["part"].to_numpy(zero_copy_only=False)
    ra = t["rows_above"].to_numpy(zero_copy_only=False)
    da = t["dist_above"].to_numpy(zero_copy_only=False)
    n_total = int(t["n_total"][0].as_py())
    # one hash partition may hold SEVERAL range keys — group by part,
    # then order each range by (spend DESC, user_id ASC)
    order = np.lexsort((uid, -sp, part))
    uid, sp, part = uid[order], sp[order], part[order]
    ra, da = ra[order], da[order]
    new_p = np.empty(n, dtype=bool)
    new_p[0] = True
    new_p[1:] = part[1:] != part[:-1]
    starts = np.flatnonzero(new_p)
    grp = np.cumsum(new_p) - 1
    pos = np.arange(n, dtype=np.int64) - starts[grp]   # 0-based in-part
    new_v = np.empty(n, dtype=bool)
    new_v[0] = True
    new_v[1:] = (sp[1:] != sp[:-1]) | new_p[1:]
    dcum = np.cumsum(new_v)
    rn = ra + pos + 1
    dr = da + dcum - (dcum[starts] - 1)[grp]
    return pa.table({"user_id": pa.array(uid),
                     "spend_cents": pa.array(sp),
                     "rn": pa.array(rn),
                     "dr": pa.array(dr),
                     "quartile": pa.array(ntile_exact(rn, n_total))})


def q_user_spend_ranks(sf_dir: str):
    """GLOBAL window functions — row_number, dense_rank and ntile(4)
    over every user's total spend — without a global sort of the user
    table through one reducer.  The watermark prefix-scan plan applied
    to ranking:

    * exchange 1 folds per-batch (user, cents) partials to one row per
      user (combiner: only distinct users per batch ride the exchange);
    * per-partition (min, max) spend partials give the driver the value
      range; partition id = (hi - spend) // width is then a pure
      function of the VALUE, so ties never straddle partitions and
      partition order IS descending rank order;
    * per-partition (rows, distinct) partials prefix-sum on the driver
      into carry vectors (rows_above / dist_above — one int per
      partition, the only driver state);
    * exchange 2 co-locates each spend range; ``rank_block`` lexsorts
      once per PARTITION and writes final ranks.

    Equal-width ranges skew under heavy value concentration; the
    documented swap is sampled quantile split points feeding the same
    carry arithmetic (partition id from searchsorted instead of a
    division) — kernels unchanged.  Ties order ntile/row_number by
    user_id, so every output column is deterministic and the DuckDB
    window oracle reproduces the table exactly."""
    import ray

    from engine.pipeline import collect_tables
    from engine.stages import hash_group_exchange

    def cents_partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                      "cents": pa.array(cents)}),
            ["user_id"]).aggregate([("cents", "sum")])
        return pa.table({"user_id": g["user_id"],
                         "cents": pc.cast(g["cents_sum"], pa.int64())})

    n_events = _nrows(sf_dir, "events")
    empty = pa.schema([("user_id", pa.int64()), ("spend_cents", pa.int64()),
                       ("rn", pa.int64()), ("dr", pa.int64()),
                       ("quartile", pa.int64())]).empty_table()
    if n_events == 0:
        return empty
    users = hash_group_exchange(
        lambda: _table(sf_dir, "events")
        .select_columns(["user_id", "value"])
        .map_batches(cents_partial, batch_format="pyarrow",
                     batch_size=None),
        ["user_id"], spend_fold_block, collect=False,
        rows_hint=n_events).materialize()
    n_users = users.count()                 # free on a materialized set

    def minmax(t: pa.Table) -> pa.Table:
        sp = t["spend_cents"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(sp.min())], type=pa.int64()),
                         "hi": pa.array([int(sp.max())], type=pa.int64())})

    mm = [b for b in collect_tables(
        users.map_batches(minmax, batch_format="pyarrow"))
        if b.num_columns and b.num_rows]
    if not mm:
        return empty
    lo = min(int(t["lo"][0].as_py()) for t in mm)
    hi = max(int(t["hi"][0].as_py()) for t in mm)
    n_parts = max(8, n_users // 500_000)    # ranked rows = users, not events
    width = max(1, (hi - lo + n_parts) // n_parts)

    def assign(t: pa.Table) -> pa.Table:
        sp = t["spend_cents"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((hi - sp) // width))

    assigned = users.map_batches(assign, batch_format="pyarrow",
                                 batch_size=None).materialize()

    # per-batch distinct counts could overcount a value split across
    # blocks of the same partition — fold distinct (part, sp) PAIRS, then
    # count rows/distincts per partition exactly:
    pair_parts = [b for b in collect_tables(
        assigned.map_batches(
            lambda t: pa.TableGroupBy(
                pa.table({"part": t["part"], "sp": t["spend_cents"]}),
                ["part", "sp"]).aggregate([([], "count_all")])
            .rename_columns(["part", "sp", "cnt"]),
            batch_format="pyarrow", batch_size=None)) if b.num_columns]
    pairs = pa.concat_tables(pair_parts)
    gp = pa.TableGroupBy(pairs, ["part", "sp"]).aggregate([("cnt", "sum")])
    gfin = pa.TableGroupBy(
        pa.table({"part": gp["part"],
                  "n": pc.cast(gp["cnt_sum"], pa.int64()),
                  "d": pa.array(np.ones(len(gp), dtype=np.int64))}),
        ["part"]).aggregate([("n", "sum"), ("d", "sum")])
    parts_idx = gfin["part"].to_numpy(zero_copy_only=False)
    n_arr = np.zeros(n_parts + 2, dtype=np.int64)
    d_arr = np.zeros(n_parts + 2, dtype=np.int64)
    n_arr[parts_idx] = pc.cast(gfin["n_sum"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    d_arr[parts_idx] = pc.cast(gfin["d_sum"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    rows_above = np.zeros_like(n_arr)
    dist_above = np.zeros_like(d_arr)
    np.cumsum(n_arr[:-1], out=rows_above[1:])
    np.cumsum(d_arr[:-1], out=dist_above[1:])
    n_total = int(n_arr.sum())
    ra_ref = ray.put(rows_above)
    da_ref = ray.put(dist_above)

    def attach(t: pa.Table) -> pa.Table:
        p = t["part"].to_numpy(zero_copy_only=False)
        m = len(p)
        return t.append_column(
            "rows_above", pa.array(ray.get(ra_ref)[p])) \
            .append_column("dist_above", pa.array(ray.get(da_ref)[p])) \
            .append_column("n_total",
                           pa.array(np.full(m, n_total, dtype=np.int64)))

    df = hash_group_exchange(
        lambda: assigned.map_batches(attach, batch_format="pyarrow",
                                     batch_size=None),
        ["part"], rank_block, rows_hint=max(1, n_users))
    cols = ["user_id", "spend_cents", "rn", "dr", "quartile"]
    return df.sort_values("user_id", ignore_index=True) \
        .astype({c: "int64" for c in cols})[cols]


SQL_USER_SPEND_RANKS = """
WITH s AS (
  SELECT user_id,
         sum(CAST(floor(value*100.0 + 0.5) AS BIGINT))::BIGINT
             AS spend_cents
  FROM events GROUP BY user_id)
SELECT user_id, spend_cents,
       row_number() OVER (ORDER BY spend_cents DESC, user_id)::BIGINT AS rn,
       dense_rank() OVER (ORDER BY spend_cents DESC)::BIGINT AS dr,
       ntile(4) OVER (ORDER BY spend_cents DESC, user_id)::BIGINT
           AS quartile
FROM s ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# market-basket co-occurrence: event-type pairs by shared users
# ---------------------------------------------------------------------------

def q_event_type_cooccurrence(sf_dir: str):
    """For every unordered event-type pair (a < b), how many users did
    BOTH — the market-basket / co-occurrence shape (type affinity,
    recommendation priors).

    Plan: per-batch distinct (user_id, event_type) partials shrink the
    stream to unique pairs per batch; ONE exchange keyed on user_id
    co-locates each user's type set (per-partition dedup IS global
    dedup); inside each partition a single lexsort + segment pass expands
    every user's k types into k(k-1)/2 ordered pairs VECTORIZED (no
    Python per user) and immediately folds them to (type_a, type_b,
    count) — so at most T^2 partial rows per partition reach the driver
    regardless of user count.  Exchange bytes: one (int64, small-string)
    row per distinct (user, type), nothing else moves."""
    from engine.stages import hash_group_exchange

    def pair_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["user_id", "event_type"]),
            ["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table({"user_id": pc.cast(g["user_id"], pa.int64()),
                         "event_type": g["event_type"]})

    def fold_partition(t: pa.Table) -> pa.Table:
        import pandas as pd
        # global distinct (user, type) for the users in this partition
        g = pa.TableGroupBy(t, ["user_id", "event_type"]) \
            .aggregate([([], "count_all")])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        codes, types = pd.factorize(g["event_type"].to_pandas(), sort=True)
        order = np.lexsort((codes, u))          # by user, then type asc
        u2, c2 = u[order], codes[order]
        # segment boundaries per user
        new = np.ones(len(u2), dtype=bool)
        if len(u2) > 1:
            new[1:] = u2[1:] != u2[:-1]
        seg_start = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        local = np.arange(len(u2), dtype=np.int64) - seg_start[seg_id]
        # row at local pos j is 'b' in j pairs; its partners are the j
        # rows before it in the same segment
        b_idx = np.repeat(np.arange(len(u2), dtype=np.int64), local)
        csl = np.zeros(len(local) + 1, dtype=np.int64)
        np.cumsum(local, out=csl[1:])
        a_idx = (np.arange(csl[-1], dtype=np.int64)
                 - np.repeat(csl[:-1], local)
                 + np.repeat(seg_start[seg_id], local))
        if len(b_idx) == 0:
            return pa.table({"type_a": pa.array([], type=pa.string()),
                             "type_b": pa.array([], type=pa.string()),
                             "n_users": pa.array([], type=pa.int64())})
        pairs = pa.table({
            "type_a": pa.array(types[c2[a_idx]], type=pa.string()),
            "type_b": pa.array(types[c2[b_idx]], type=pa.string()),
        })
        pg = pa.TableGroupBy(pairs, ["type_a", "type_b"]) \
            .aggregate([([], "count_all")])
        return pa.table({"type_a": pg["type_a"], "type_b": pg["type_b"],
                         "n_users": pc.cast(pg["count_all"], pa.int64())})

    df = hash_group_exchange(
        lambda: _table(sf_dir, "events")
        .select_columns(["user_id", "event_type"])
        .map_batches(pair_partial, batch_format="pyarrow"),
        ["user_id"], fold_partition, collect=True,
        rows_hint=_nrows(sf_dir, "events"))
    if df.empty or "type_a" not in df.columns:
        import pandas as pd
        return pd.DataFrame({"type_a": pd.Series(dtype="object"),
                             "type_b": pd.Series(dtype="object"),
                             "n_users": pd.Series(dtype="int64")})
    out = df.groupby(["type_a", "type_b"], as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["type_a", "type_b"], ignore_index=True)


SQL_EVENT_TYPE_COOCCURRENCE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*)::BIGINT AS n_users
FROM ut a JOIN ut b ON a.user_id = b.user_id
WHERE a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# grouped mode: most frequent value per group (gated)
# ---------------------------------------------------------------------------

def mode_fold_block(t: pa.Table) -> pa.Table:
    """user-partition kernel: fold (user, type, n) partials and keep each
    user's mode with the (count DESC, type ASC) tiebreak — one lexsort,
    no Python per group."""
    if t.num_rows == 0:
        return pa.schema([("user_id", pa.int64()),
                          ("top_type", pa.string()),
                          ("n_events", pa.int64())]).empty_table()
    import pandas as pd
    g = pa.TableGroupBy(t, ["user_id", "event_type"]) \
        .aggregate([("n", "sum")])
    u = g["user_id"].to_numpy(zero_copy_only=False)
    n = pc.cast(g["n_sum"], pa.int64()).to_numpy(zero_copy_only=False)
    codes, types = pd.factorize(g["event_type"].to_pandas(), sort=True)
    order = np.lexsort((codes, -n, u))       # per user: n desc, type asc
    first = np.ones(len(u), dtype=bool)
    us = u[order]
    if len(us) > 1:
        first[1:] = us[1:] != us[:-1]
    pick = order[first]
    return pa.table({
        "user_id": pa.array(u[pick]),
        "top_type": pa.array(types[codes[pick]], type=pa.string()),
        "n_events": pa.array(n[pick])})


def q_user_top_event(sf_dir: str):
    """Each user's MOST FREQUENT event type (grouped mode, tiebreak
    count DESC then type ASC).  Per-batch (user, type, count) partials
    shrink the stream before ONE user-keyed exchange; the fold picks the
    argmax inside each partition, so only one row per user reaches the
    driver."""
    from engine.stages import hash_group_exchange

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["user_id", "event_type"]),
                            ["user_id", "event_type"]) \
            .aggregate([([], "count_all")])
        return pa.table({"user_id": pc.cast(g["user_id"], pa.int64()),
                         "event_type": g["event_type"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    return hash_group_exchange(
        lambda: _table(sf_dir, "events")
        .select_columns(["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["user_id"], mode_fold_block, collect=False,
        rows_hint=_nrows(sf_dir, "events") // 8)


SQL_USER_TOP_EVENT = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id::BIGINT AS user_id, event_type AS top_type,
       n::BIGINT AS n_events
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# user growth curve (gated)
# ---------------------------------------------------------------------------

def growth_fold_block(t: pa.Table) -> pa.Table:
    """user-partition kernel: global first-seen day per user (partition
    owns the user), folded to per-day new-user counts."""
    if t.num_rows == 0:
        return pa.schema([("day", pa.int64()),
                          ("new_users", pa.int64())]).empty_table()
    g = pa.TableGroupBy(t.select(["user_id", "d"]), ["user_id"]) \
        .aggregate([("d", "min")])
    days, counts = np.unique(
        pc.cast(g["d_min"], pa.int64()).to_numpy(zero_copy_only=False),
        return_counts=True)
    return pa.table({"day": pa.array(days),
                     "new_users": pa.array(counts.astype(np.int64))})


def q_user_growth(sf_dir: str):
    """Adoption curve: users by FIRST-SEEN day plus the cumulative total
    — per-batch (user, min-day) partials, ONE user-keyed exchange, then
    a driver cumsum over <= |days| scalar rows (the only global-prefix
    term, and it is calendar-bounded, not data-bounded)."""
    from engine.stages import hash_group_exchange

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "d": pc.cast(pc.divide(pc.cast(t["ts"], pa.int64()),
                                   86_400_000_000), pa.int64())}),
            ["user_id"]).aggregate([("d", "min")])
        return pa.table({"user_id": g["user_id"], "d": g["d_min"]})

    df = hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["user_id"], growth_fold_block,
        rows_hint=_nrows(sf_dir, "events") // 8)
    agg = df.groupby("day", as_index=False).sum().sort_values(
        "day", ignore_index=True)
    nu = agg["new_users"].astype(int).to_numpy()
    return pa.table({
        "day": pa.array(agg["day"].astype(int), type=pa.int64()),
        "new_users": pa.array(nu, type=pa.int64()),
        "cum_users": pa.array(np.cumsum(nu), type=pa.int64())})


SQL_USER_GROWTH = """
WITH f AS (
  SELECT user_id, min(epoch_us(ts) // 86400000000) AS d
  FROM events GROUP BY 1
)
SELECT d::BIGINT AS day, count(*)::BIGINT AS new_users,
       sum(count(*)) OVER (ORDER BY d)::BIGINT AS cum_users
FROM f GROUP BY d ORDER BY d
"""


# ---------------------------------------------------------------------------
# event-type trigram journeys (gated)
# ---------------------------------------------------------------------------

def trigrams_block(t: pa.Table) -> pa.Table:
    """Per-partition trigram kernel: lexsort by (user, ts, event_id),
    mask windows of three consecutive SAME-user rows, partial-count the
    (e1, e2, e3) trigrams — <= |types|^3 rows out per partition."""
    n = t.num_rows
    empty = pa.schema([("e1", pa.string()), ("e2", pa.string()),
                       ("e3", pa.string()), ("n", pa.int64())]) \
        .empty_table()
    if n < 3:
        return empty
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    et = t["event_type"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    uid, et = uid[order], et[order]
    same3 = (uid[2:] == uid[:-2]) & (uid[1:-1] == uid[:-2])
    if not same3.any():
        return empty
    g = pa.TableGroupBy(pa.table({
        "e1": pa.array(et[:-2][same3]),
        "e2": pa.array(et[1:-1][same3]),
        "e3": pa.array(et[2:][same3])}), ["e1", "e2", "e3"]) \
        .aggregate([([], "count_all")])
    return pa.table({"e1": g["e1"], "e2": g["e2"], "e3": g["e3"],
                     "n": pc.cast(g["count_all"], pa.int64())})


def q_event_trigrams(sf_dir: str):
    """Third-order user-journey counts: (e1, e2, e3) frequencies over
    each user's ts-ordered event stream — the sequence-mining step past
    :func:`q_event_transitions`' bigrams.  Same plan: ONE user-keyed
    exchange co-locating whole histories, per-partition sort + shifted
    masks, <= |types|^3 partial rows back."""
    from engine.stages import hash_group_exchange

    df = hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "event_type"]),
        ["user_id"], trigrams_block, collect=True,
        rows_hint=_nrows(sf_dir, "events"))
    if df.empty or "e1" not in df.columns:
        return pa.schema([("e1", pa.string()), ("e2", pa.string()),
                          ("e3", pa.string()),
                          ("n", pa.int64())]).empty_table().to_pandas()
    out = df.groupby(["e1", "e2", "e3"], as_index=False).sum()
    out["n"] = out["n"].astype("int64")
    return out


SQL_EVENT_TRIGRAMS = """
WITH s AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, count(*)::BIGINT AS n
FROM s WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation (gated)
# ---------------------------------------------------------------------------

def rfm_fold_block(t: pa.Table) -> pa.Table:
    """custkey-partition kernel: fold per-batch (count, cents, max-date)
    partials to one row per customer."""
    if t.num_rows == 0:
        return pa.schema([("c", pa.int64()), ("f", pa.int64()),
                          ("mo", pa.int64()), ("r", pa.int64())]) \
            .empty_table()
    g = pa.TableGroupBy(t, ["c"]).aggregate(
        [("f", "sum"), ("mo", "sum"), ("r", "max")])
    return pa.table({"c": g["c"],
                     "f": pc.cast(g["f_sum"], pa.int64()),
                     "mo": pc.cast(g["mo_sum"], pa.int64()),
                     "r": pc.cast(g["r_max"], pa.int64())})


def _qdisc(sorted_vals: np.ndarray, q: float) -> int:
    """DuckDB quantile_disc convention: sorted[ceil(q*n) - 1]."""
    n = len(sorted_vals)
    return int(sorted_vals[max(0, int(np.ceil(q * n)) - 1)])


def q_customer_rfm(sf_dir: str):
    """RFM segmentation: per customer the Recency (latest order, epoch
    us), Frequency (orders) and Monetary (totalprice cents) metrics plus
    1-4 scores cut at the corpus quartiles (quantile_disc convention,
    score = 1 + #thresholds strictly below the metric — value-based, so
    ties get equal scores deterministically on both engines).

    One custkey-keyed exchange folds per-batch partials to one row per
    customer; the quartile thresholds are computed over the collected
    per-customer table — customer-dimension-sized by the same
    ``_BROADCAST_MAX`` contract as every customer-scale op here (past
    it, the swap is the two-pass bucket quantile of
    engine/robust.py)."""
    from engine.relational import _BROADCAST_MAX
    from engine.stages import hash_group_exchange

    assert _nrows(sf_dir, "customer") <= _BROADCAST_MAX, \
        "customer outgrew the driver-quartile regime: two-pass quantiles"

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "c": pc.cast(t["o_custkey"], pa.int64()),
            "f": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "mo": pa.array(cents),
            "r": pc.cast(t["o_orderdate"], pa.int64())}), ["c"]) \
            .aggregate([("f", "sum"), ("mo", "sum"), ("r", "max")])
        return pa.table({"c": g["c"],
                         "f": pc.cast(g["f_sum"], pa.int64()),
                         "mo": pc.cast(g["mo_sum"], pa.int64()),
                         "r": pc.cast(g["r_max"], pa.int64())})

    df = hash_group_exchange(
        lambda: _table(sf_dir, "orders")
        .select_columns(["o_custkey", "o_totalprice", "o_orderdate"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["c"], rfm_fold_block, rows_hint=_nrows(sf_dir, "orders") // 4)
    if df is None or df.empty or "c" not in df.columns:
        return pa.schema([
            ("c_custkey", pa.int64()), ("frequency", pa.int64()),
            ("monetary_cents", pa.int64()), ("recency_us", pa.int64()),
            ("f_score", pa.int64()), ("m_score", pa.int64()),
            ("r_score", pa.int64())]).empty_table()
    df = df.sort_values("c", ignore_index=True)
    f = df["f"].astype(int).to_numpy()
    mo = df["mo"].astype(int).to_numpy()
    r = df["r"].astype(int).to_numpy()

    def scores(v: np.ndarray) -> np.ndarray:
        sv = np.sort(v)
        t25, t50, t75 = (_qdisc(sv, .25), _qdisc(sv, .5), _qdisc(sv, .75))
        return (1 + (v > t25).astype(np.int64) + (v > t50) + (v > t75))

    return pa.table({
        "c_custkey": pa.array(df["c"].astype(int), type=pa.int64()),
        "frequency": pa.array(f), "monetary_cents": pa.array(mo),
        "recency_us": pa.array(r),
        "f_score": pa.array(scores(f)),
        "m_score": pa.array(scores(mo)),
        "r_score": pa.array(scores(r))})


SQL_CUSTOMER_RFM = """
WITH m AS (
  SELECT o_custkey AS c, count(*)::BIGINT AS f,
         sum(CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT))::BIGINT
           AS mo,
         max(epoch_us(o_orderdate))::BIGINT AS r
  FROM orders GROUP BY 1
), t AS (
  SELECT quantile_disc(f, 0.25) AS f25, quantile_disc(f, 0.5) AS f50,
         quantile_disc(f, 0.75) AS f75,
         quantile_disc(mo, 0.25) AS m25, quantile_disc(mo, 0.5) AS m50,
         quantile_disc(mo, 0.75) AS m75,
         quantile_disc(r, 0.25) AS r25, quantile_disc(r, 0.5) AS r50,
         quantile_disc(r, 0.75) AS r75
  FROM m
)
SELECT c AS c_custkey, f AS frequency, mo AS monetary_cents,
       r AS recency_us,
       (1 + (f > f25)::INT + (f > f50)::INT + (f > f75)::INT)::BIGINT
         AS f_score,
       (1 + (mo > m25)::INT + (mo > m50)::INT + (mo > m75)::INT)::BIGINT
         AS m_score,
       (1 + (r > r25)::INT + (r > r50)::INT + (r > r75)::INT)::BIGINT
         AS r_score
FROM m, t
"""


# ---------------------------------------------------------------------------
# per-user inactivity gaps (gated)
# ---------------------------------------------------------------------------

def idle_gap_fold_block(t: pa.Table) -> pa.Table:
    """user-partition kernel: sort each user's whole history once,
    difference consecutive timestamps, emit one (user, n_gaps, max_gap,
    sum_gap) row."""
    if t.num_rows == 0:
        return pa.schema([("user_id", pa.int64()),
                          ("n_gaps", pa.int64()),
                          ("max_gap_us", pa.int64()),
                          ("sum_gap_us", pa.int64())]).empty_table()
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    uid, ts = uid[order], ts[order]
    same = uid[1:] == uid[:-1]
    gaps = (ts[1:] - ts[:-1])[same]
    gu = uid[1:][same]
    users, first_all = np.unique(uid, return_index=True)
    if len(gaps):
        gus, inv = np.unique(gu, return_inverse=True)
        mx = np.zeros(len(gus), dtype=np.int64)
        np.maximum.at(mx, inv, gaps)
        sm = np.zeros(len(gus), dtype=np.int64)
        np.add.at(sm, inv, gaps)
        cnt = np.bincount(inv).astype(np.int64)
        pos = np.searchsorted(users, gus)
        n_gaps = np.zeros(len(users), dtype=np.int64)
        max_gap = np.zeros(len(users), dtype=np.int64)
        sum_gap = np.zeros(len(users), dtype=np.int64)
        n_gaps[pos], max_gap[pos], sum_gap[pos] = cnt, mx, sm
    else:
        n_gaps = max_gap = sum_gap = np.zeros(len(users), dtype=np.int64)
    return pa.table({"user_id": pa.array(users),
                     "n_gaps": pa.array(n_gaps),
                     "max_gap_us": pa.array(max_gap),
                     "sum_gap_us": pa.array(sum_gap)})


def q_user_idle_gaps(sf_dir: str):
    """Per-user inactivity profile: number of between-event gaps, the
    longest gap, the total idle time and the mean gap (integer us) —
    the churn-risk / engagement shape.  ONE user-keyed exchange
    co-locates each history; single-event users report zero gaps (the
    oracle's coalesce)."""
    from engine.stages import hash_group_exchange

    df = hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts"]),
        ["user_id"], idle_gap_fold_block,
        rows_hint=_nrows(sf_dir, "events"))
    if df is None or df.empty or "user_id" not in df.columns:
        return pa.schema([
            ("user_id", pa.int64()), ("n_gaps", pa.int64()),
            ("max_gap_us", pa.int64()), ("sum_gap_us", pa.int64()),
            ("mean_gap_us", pa.int64())]).empty_table()
    df = df.sort_values("user_id", ignore_index=True)
    n = df["n_gaps"].astype(int).to_numpy()
    s = df["sum_gap_us"].astype(int).to_numpy()
    mean = np.where(n > 0, s // np.maximum(n, 1), 0)
    return pa.table({
        "user_id": pa.array(df["user_id"].astype(int), type=pa.int64()),
        "n_gaps": pa.array(n, type=pa.int64()),
        "max_gap_us": pa.array(df["max_gap_us"].astype(int),
                               type=pa.int64()),
        "sum_gap_us": pa.array(s, type=pa.int64()),
        "mean_gap_us": pa.array(mean, type=pa.int64())})


SQL_USER_IDLE_GAPS = """
WITH s AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id::BIGINT AS user_id,
       count(gap)::BIGINT AS n_gaps,
       coalesce(max(gap), 0)::BIGINT AS max_gap_us,
       coalesce(sum(gap), 0)::BIGINT AS sum_gap_us,
       (CASE WHEN count(gap) > 0 THEN sum(gap) // count(gap)
             ELSE 0 END)::BIGINT AS mean_gap_us
FROM s GROUP BY 1
"""

def q_events_orders_full_outer(sf_dir: str):
    """FULL OUTER join of per-id event activity vs order activity —
    the one join type the registry didn't carry (inner/left/semi/anti/
    as-of/range live elsewhere).  Both sides pre-reduce to per-batch
    (id, count) partials, ride ONE id-keyed exchange, and the fold keeps
    EVERY id with zero-fill on whichever side is absent — no broadcast,
    no driver sets, output streams at |ids| rows."""
    from engine.stages import hash_group_exchange

    def event_side(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "key": pc.cast(t["user_id"], pa.int64())}), ["key"]) \
            .aggregate([([], "count_all")])
        m = len(g)
        return pa.table({"key": g["key"],
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "side": pa.array(np.zeros(m, dtype=np.int8))})

    def order_side(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "key": pc.cast(t["o_custkey"], pa.int64())}), ["key"]) \
            .aggregate([([], "count_all")])
        m = len(g)
        return pa.table({"key": g["key"],
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "side": pa.array(np.ones(m, dtype=np.int8))})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("id", pa.int64()),
                              ("n_events", pa.int64()),
                              ("n_orders", pa.int64())]).empty_table()
        key = t["key"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, n, side = key[order], n[order], side[order]
        m = len(key)
        new_g = np.empty(m, dtype=bool)
        new_g[0] = True
        new_g[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new_g)
        ev = np.add.reduceat(n * (side == 0), starts)
        od = np.add.reduceat(n * (side == 1), starts)
        return pa.table({"id": pa.array(key[starts]),
                         "n_events": pa.array(ev),
                         "n_orders": pa.array(od)})

    def build():
        ev = _table(sf_dir, "events").select_columns(["user_id"]) \
            .map_batches(event_side, batch_format="pyarrow",
                         batch_size=None)
        od = _table(sf_dir, "orders").select_columns(["o_custkey"]) \
            .map_batches(order_side, batch_format="pyarrow",
                         batch_size=None)
        return ev.union(od)

    return hash_group_exchange(
        build, ["key"], fold, collect=False,
        rows_hint=max(1, (_nrows(sf_dir, "events")
                          + _nrows(sf_dir, "orders")) // 8))


SQL_EVENTS_ORDERS_FULL_OUTER = """
WITH e AS (SELECT user_id::BIGINT AS id, count(*)::BIGINT AS n_events
           FROM events GROUP BY 1),
o AS (SELECT o_custkey::BIGINT AS id, count(*)::BIGINT AS n_orders
      FROM orders GROUP BY 1)
SELECT coalesce(e.id, o.id) AS id,
       coalesce(n_events, 0)::BIGINT AS n_events,
       coalesce(n_orders, 0)::BIGINT AS n_orders
FROM e FULL OUTER JOIN o ON e.id = o.id
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# ordered per-key string aggregation (the SQL string_agg / listagg shape)
# ---------------------------------------------------------------------------

_PATH_K = 8


def paths_block(t: pa.Table) -> pa.Table:
    """user-partition kernel for :func:`q_user_event_paths`: lexsort by
    (user, ts, event_id), keep each user's first ``_PATH_K`` events, and
    build the '>'-joined journey string with K rank-scatter passes — a
    vectorized elementwise-concat per rank instead of one Python join
    per group (the house rule; K bounds the pass count, not the data)."""
    n = t.num_rows
    empty = pa.schema([("user_id", pa.int64()), ("path", pa.string()),
                       ("n_path", pa.int64())]).empty_table()
    if n == 0:
        return empty
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    et = t["event_type"].to_numpy(zero_copy_only=False)  # object: str rows
    order = np.lexsort((eid, ts, uid))
    uid, et = uid[order], et[order]
    new = np.r_[True, uid[1:] != uid[:-1]]
    starts = np.flatnonzero(new)
    group_idx = np.cumsum(new) - 1
    rank = np.arange(n) - starts[group_idx]
    users = uid[starts]
    path = np.full(len(users), "", dtype=object)
    n_path = np.zeros(len(users), dtype=np.int64)
    for r in range(_PATH_K):
        sel = rank == r
        if not sel.any():
            break
        gi = group_idx[sel]
        path[gi] = path[gi] + (">" + et[sel]) if r else et[sel]
        n_path[gi] += 1
    return pa.table({"user_id": pa.array(users),
                     "path": pa.array(path, type=pa.string()),
                     "n_path": pa.array(n_path)})


def q_user_event_paths(sf_dir: str):
    """Per-user ordered event-type journey (first ``_PATH_K`` events as a
    '>'-joined string) — the string_agg/listagg shape the registry
    lacked.  ONE user-keyed exchange co-locates each history (whole-key
    co-location makes per-partition results globally correct, so the
    collected frame IS the answer — no driver fold)."""
    from engine.stages import hash_group_exchange

    df = hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "event_type"]),
        ["user_id"], paths_block, collect=True,
        rows_hint=_nrows(sf_dir, "events"))
    if df.empty or "path" not in df.columns:
        import pandas as pd
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "path": pd.Series([], dtype="object"),
                             "n_path": pd.Series([], dtype="int64")})
    df["user_id"] = df["user_id"].astype("int64")
    df["n_path"] = df["n_path"].astype("int64")
    return df.sort_values("user_id", ignore_index=True)


SQL_USER_EVENT_PATHS = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id::BIGINT AS user_id,
       string_agg(event_type, '>' ORDER BY rn) AS path,
       count(*)::BIGINT AS n_path
FROM r WHERE rn <= 8 GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# per-key first/last value by time (the arg_min/arg_max reduce shape)
# ---------------------------------------------------------------------------

def first_last_partial(t: pa.Table) -> pa.Table:
    """Per-batch argmin/argmax pre-shrink for :func:`q_user_first_last_event`:
    ONE lexsort per batch collapses every user to a single candidate row
    (first key, first type, last key, last type, count), so the exchange
    carries <= 1 row per user per batch instead of the raw log."""
    empty = pa.schema([("user_id", pa.int64()),
                       ("fts", pa.int64()), ("feid", pa.int64()),
                       ("f_et", pa.string()),
                       ("lts", pa.int64()), ("leid", pa.int64()),
                       ("l_et", pa.string()),
                       ("cnt", pa.int64())]).empty_table()
    n = t.num_rows
    if n == 0:
        return empty
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    et = t["event_type"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    uid, eid, ts, et = uid[order], eid[order], ts[order], et[order]
    new = np.r_[True, uid[1:] != uid[:-1]]
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:], n] - 1
    return pa.table({
        "user_id": pa.array(uid[starts]),
        "fts": pa.array(ts[starts]), "feid": pa.array(eid[starts]),
        "f_et": pa.array(et[starts], type=pa.string()),
        "lts": pa.array(ts[ends]), "leid": pa.array(eid[ends]),
        "l_et": pa.array(et[ends], type=pa.string()),
        "cnt": pa.array(np.diff(np.r_[starts, n]).astype(np.int64))})


def first_last_fold_block(t: pa.Table) -> pa.Table:
    """user-partition kernel: fold candidate rows — argmin over (fts,
    feid) picks the global first event, argmax over (lts, leid) the
    global last, counts sum.  Two lexsorts, no per-group Python."""
    empty = pa.schema([("user_id", pa.int64()),
                       ("first_event", pa.string()),
                       ("last_event", pa.string()),
                       ("n_events", pa.int64())]).empty_table()
    n = t.num_rows
    if n == 0:
        return empty
    uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
    fts = t["fts"].to_numpy(zero_copy_only=False)
    feid = t["feid"].to_numpy(zero_copy_only=False)
    f_et = t["f_et"].to_numpy(zero_copy_only=False)
    lts = t["lts"].to_numpy(zero_copy_only=False)
    leid = t["leid"].to_numpy(zero_copy_only=False)
    l_et = t["l_et"].to_numpy(zero_copy_only=False)
    cnt = t["cnt"].to_numpy(zero_copy_only=False)

    o1 = np.lexsort((feid, fts, uid))
    u1 = uid[o1]
    s1 = np.flatnonzero(np.r_[True, u1[1:] != u1[:-1]])
    users = u1[s1]
    first = f_et[o1][s1]
    n_events = np.add.reduceat(cnt[o1], s1).astype(np.int64)

    o2 = np.lexsort((leid, lts, uid))
    u2 = uid[o2]
    s2 = np.flatnonzero(np.r_[True, u2[1:] != u2[:-1]])
    ends = np.r_[s2[1:], n] - 1
    last = l_et[o2][ends]           # u2[s2] == users (same sorted order)
    return pa.table({
        "user_id": pa.array(users),
        "first_event": pa.array(first, type=pa.string()),
        "last_event": pa.array(last, type=pa.string()),
        "n_events": pa.array(n_events)})


def q_user_first_last_event(sf_dir: str):
    """Per-user first and last event type by (ts, event_id) plus total
    count — the arg_min/arg_max-by-ordering reduce: per-batch lexsort
    partials collapse each batch to <= 1 candidate row per user, ONE
    user-keyed exchange co-locates candidates, and the partition fold
    re-runs the same argmin/argmax over candidates (associative, so
    batch-level pre-shrink is exact)."""
    from engine.stages import hash_group_exchange

    df = hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "event_type"])
        .map_batches(first_last_partial, batch_format="pyarrow",
                     batch_size=None),
        ["user_id"], first_last_fold_block, collect=True,
        rows_hint=max(1, _nrows(sf_dir, "events") // 8))
    if df.empty or "first_event" not in df.columns:
        import pandas as pd
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "first_event": pd.Series([], dtype="object"),
            "last_event": pd.Series([], dtype="object"),
            "n_events": pd.Series([], dtype="int64")})
    for c in ("user_id", "n_events"):
        df[c] = df[c].astype("int64")
    return df.sort_values("user_id", ignore_index=True)


SQL_USER_FIRST_LAST_EVENT = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT user_id::BIGINT AS user_id,
       max(CASE WHEN rn = 1 THEN event_type END) AS first_event,
       max(CASE WHEN rn = n THEN event_type END) AS last_event,
       max(n)::BIGINT AS n_events
FROM r GROUP BY user_id
"""
