"""Multi-table join plans over the relational tables (TPC-H shapes).

The reference's join layer is metadata-sized (enrich maps, revision
lookups — see engine/stages.py, engine/revisions.py); this module adds the
fact-to-fact shapes a warehouse-scale pipeline needs, built on the same
``hash_group_exchange`` primitive so NO side is ever broadcast and no
driver-side sets exist:

* ``q_q3_revenue_topk`` — the TPC-H Q3 plan (segment-filtered customers
  ⋈ date-filtered orders ⋈ shipdate-filtered lineitem revenue, top-10 by
  revenue).  The custkey semi-join is DUAL-PATH, auto-selected by the
  customer table's row count (the curate.py ``ID_BROADCAST_MAX``
  recipe): dimension-sized customer tables broadcast the filtered key
  set once (``ray.put`` + per-actor fetch + vectorized ``pc.is_in``
  probe — no exchange at all), unbounded ones take a tagged-union hash
  exchange on custkey carrying only (key, orderkey, orderdate).  The
  orderkey stage is always an exchange: it joins the qualified orders
  to PER-BATCH revenue partials of the filtered lineitems (one row per
  (batch, orderkey) — lineitem rows themselves never shuffle), folds
  revenue per order, and emits only each partition's top-10, so the
  driver sees <= 10 x partitions candidate rows.

All money math is integer: cents = floor(price*100 + 0.5) as int64,
revenue_micro = cents * (100 - discount_pct) — identical expressions on
the DuckDB side, so the value-hash gate is deterministic.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine.io import read_parquet_clean

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = np.datetime64("1998-06-01T00:00:00", "us")
_CUTOFF_US = int(Q3_CUTOFF.astype(np.int64))


def _table(sf_dir: str, name: str):
    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"))


def _nrows(sf_dir: str, name: str) -> int:
    return pq.read_metadata(os.path.join(sf_dir, f"{name}.parquet")).num_rows


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    return np.floor(col.to_numpy(zero_copy_only=False) * 100.0
                    + 0.5).astype(np.int64)


def semi_block(t: pa.Table) -> pa.Table:
    """Exchange-1 kernel: keep order rows whose custkey appears on the
    customer side (vectorized np.isin per partition)."""
    if t.num_rows == 0:
        return pa.schema([("key", pa.int64()), ("odate_us", pa.int64()),
                          ("rev_micro", pa.int64()),
                          ("side", pa.int8())]).empty_table()
    key = t["key"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    cust = key[side == 0]
    keep = (side == 1) & np.isin(key, cust)
    kept = t.filter(pa.array(keep))
    n = kept.num_rows
    return pa.table({"key": kept["okey"],
                     "odate_us": kept["odate_us"],
                     "rev_micro": pa.array(np.zeros(n, dtype=np.int64)),
                     "side": pa.array(np.zeros(n, dtype=np.int8))})


def fold_topk_block(t: pa.Table) -> pa.Table:
    """Exchange-2 kernel: per-order revenue fold (reduceat over one sort)
    joined to the qualified-order rows, then the partition's local top-10
    by (revenue DESC, orderkey ASC)."""
    empty = pa.schema([("o_orderkey", pa.int64()), ("odate_us", pa.int64()),
                       ("revenue_micro", pa.int64())]).empty_table()
    n = t.num_rows
    if n == 0:
        return empty
    key = t["key"].to_numpy(zero_copy_only=False)
    odate = t["odate_us"].to_numpy(zero_copy_only=False)
    rev = t["rev_micro"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    order = np.lexsort((side, key))          # per key: order row first
    key, odate, rev, side = key[order], odate[order], rev[order], side[order]
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new_g)
    has_order = side[starts] == 0            # an order row sorts first
    has_rev = (np.add.reduceat((side == 1).astype(np.int64), starts)
               > 0)
    g_rev = np.add.reduceat(rev, starts)
    keep = has_order & has_rev               # inner-join semantics
    if not keep.any():
        return empty
    okey, od, rv = key[starts][keep], odate[starts][keep], g_rev[keep]
    top = np.lexsort((okey, -rv))[:10]
    return pa.table({"o_orderkey": pa.array(okey[top]),
                     "odate_us": pa.array(od[top]),
                     "revenue_micro": pa.array(rv[top])})


# customer/orders tables up to this many rows run the exchange-free plan
# (filtered key sets broadcast via ray.put, revenue folded from partials);
# beyond it the keyed exchanges take over — same dual-path contract as
# curate.curate_to_parquet's ID_BROADCAST_MAX
_BROADCAST_MAX = 5_000_000

# runtime bloom pushdown for the exchange plan: 2^26 bits (8 MiB packed),
# two splitmix64-derived probes per key.  Driver-RESIDENT memory is the
# fixed bitmap (vs the unbounded key set the broadcast plan holds), while
# false positives only let useless rows ride the exchange — the semi-join
# re-verifies exactly, so correctness never depends on the filter
_BLOOM_BITS = 1 << 26


def _bloom_positions(keys: np.ndarray):
    """Two bit positions per int64 key (independent slices of one
    splitmix64 mix)."""
    h = np.ascontiguousarray(keys).astype(np.uint64)
    from engine.dedup import _mix64
    h = _mix64(h)
    mask = np.uint64(_BLOOM_BITS - 1)
    return ((h & mask).astype(np.int64),
            ((h >> np.uint64(26)) & mask).astype(np.int64))


def bloom_fold(pos_tables) -> np.ndarray:
    """OR per-batch set-bit positions into one packed uint64 bitmap."""
    bloom = np.zeros(_BLOOM_BITS >> 6, dtype=np.uint64)
    for t in pos_tables:
        pos = t["pos"].to_numpy(zero_copy_only=False)
        np.bitwise_or.at(bloom, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))
    return bloom


def bloom_test(bloom: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Membership mask; guaranteed True for every inserted key."""
    h1, h2 = _bloom_positions(keys)
    one = np.uint64(1)
    b1 = (bloom[h1 >> 6] >> (h1 & 63).astype(np.uint64)) & one
    b2 = (bloom[h2 >> 6] >> (h2 & 63).astype(np.uint64)) & one
    return (b1 & b2).astype(bool)


def q_q3_revenue_topk(sf_dir: str, method: str = "auto"):
    """TPC-H Q3 shape: top-10 orders by shipped revenue among BUILDING-
    segment customers' pre-cutoff orders.  Dual physical plan:

    * ``broadcast`` (both customer AND orders parquet row counts <=
      ``_BROADCAST_MAX``): the filtered custkey set broadcasts once; the
      qualified (orderkey, orderdate) rows — bounded by the same gate —
      collect once and their key set broadcasts to the lineitem pass,
      which emits one revenue partial per (batch, qualified order); the
      driver folds partials with one reduceat.  No shuffle anywhere.
    * ``exchange`` (either side unbounded): the tagged-union custkey
      exchange semi-join, then the orderkey exchange folding per-batch
      lineitem revenue partials with a per-partition top-10 — fully
      scalable, nothing driver-resident beyond 10 x partitions candidate
      rows plus the fixed 8 MiB runtime bloom of filtered custkeys that
      prefilters order rows BEFORE they shuffle (at TPC-H selectivity
      ~4/5 of order rows never ride the exchange; the semi-join
      re-verifies exactly, so bloom false positives cost bandwidth, never
      correctness).

    ``auto`` picks by parquet metadata row counts.  Both plans are
    pinned equal in tests/test_relational.py."""
    import ray

    from engine.pipeline import collect_tables
    from engine.stages import hash_group_exchange

    if method == "auto":
        small = max(_nrows(sf_dir, "customer"),
                    _nrows(sf_dir, "orders")) <= _BROADCAST_MAX
        method = "broadcast" if small else "exchange"

    def cust_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.filter(pc.equal(t["c_mktsegment"],
                                         Q3_SEGMENT))["c_custkey"],
                       pa.int64())
        n = len(keys)
        return pa.table({"key": keys,
                         "okey": pa.nulls(n, pa.int64()),
                         "odate_us": pa.nulls(n, pa.int64()),
                         "side": pa.array(np.zeros(n, dtype=np.int8))})

    def order_side(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        kept = t.filter(pa.array(od < _CUTOFF_US))
        od = od[od < _CUTOFF_US]
        n = kept.num_rows
        return pa.table({"key": pc.cast(kept["o_custkey"], pa.int64()),
                         "okey": pc.cast(kept["o_orderkey"], pa.int64()),
                         "odate_us": pa.array(od),
                         "side": pa.array(np.ones(n, dtype=np.int8))})

    def line_partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        kept = t.filter(pa.array(sd > _CUTOFF_US))
        cents = _cents(kept["l_extendedprice"])
        pct = 100 - np.floor(
            kept["l_discount"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5).astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "key": pc.cast(kept["l_orderkey"], pa.int64()),
            "rev": pa.array(cents * pct)}), ["key"]) \
            .aggregate([("rev", "sum")])
        m = len(g)
        return pa.table({"key": g["key"],
                         "odate_us": pa.nulls(m, pa.int64()),
                         "rev_micro": pc.cast(g["rev_sum"], pa.int64()),
                         "side": pa.array(np.ones(m, dtype=np.int8))})

    _empty = pa.schema([("o_orderkey", pa.int64()),
                        ("odate_us", pa.int64()),
                        ("revenue_micro", pa.int64())])

    if method == "broadcast":
        def cust_keys(t: pa.Table) -> pa.Table:
            return pa.table({"key": pc.cast(
                t.filter(pc.equal(t["c_mktsegment"],
                                  Q3_SEGMENT))["c_custkey"], pa.int64())})

        keys_ds = _table(sf_dir, "customer") \
            .select_columns(["c_custkey", "c_mktsegment"]) \
            .map_batches(cust_keys, batch_format="pyarrow")
        tabs = [t for t in collect_tables(keys_ds) if t.num_columns]
        keys = (pc.unique(pa.concat_tables(tabs)["key"].combine_chunks())
                if tabs else pa.array([], pa.int64()))
        keys_ref = ray.put(keys)

        def probe_orders(t: pa.Table) -> pa.Table:
            kept = order_side(t)     # date filter + (key=custkey, okey, ...)
            mask = pc.is_in(kept["key"],
                            value_set=ray.get(keys_ref))  # local plasma hit
            kept = kept.filter(mask)
            return pa.table({"okey": kept["okey"],
                             "odate_us": kept["odate_us"]})

        q_tabs = [t for t in collect_tables(
            _table(sf_dir, "orders")
            .select_columns(["o_custkey", "o_orderkey", "o_orderdate"])
            .map_batches(probe_orders, batch_format="pyarrow"))
            if t.num_columns]
        qt = pa.concat_tables(q_tabs) if q_tabs else None
        if qt is None or qt.num_rows == 0:
            return _empty.empty_table().to_pandas()
        okey = qt["okey"].to_numpy(zero_copy_only=False)
        odate = qt["odate_us"].to_numpy(zero_copy_only=False)
        order = np.argsort(okey)
        okey, odate = okey[order], odate[order]
        okey_ref = ray.put(pa.array(okey, pa.int64()))

        def line_probe_partial(t: pa.Table) -> pa.Table:
            sd = t["l_shipdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            kept = t.filter(pa.array(sd > _CUTOFF_US))
            kept = kept.filter(pc.is_in(
                pc.cast(kept["l_orderkey"], pa.int64()),
                value_set=ray.get(okey_ref)))
            cents = _cents(kept["l_extendedprice"])
            pct = 100 - np.floor(
                kept["l_discount"].to_numpy(zero_copy_only=False) * 100.0
                + 0.5).astype(np.int64)
            g = pa.TableGroupBy(pa.table({
                "key": pc.cast(kept["l_orderkey"], pa.int64()),
                "rev": pa.array(cents * pct)}), ["key"]) \
                .aggregate([("rev", "sum")])
            return pa.table({"key": g["key"],
                             "rev": pc.cast(g["rev_sum"], pa.int64())})

        p_tabs = [t for t in collect_tables(
            _table(sf_dir, "lineitem").select_columns(
                ["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
            .map_batches(line_probe_partial, batch_format="pyarrow",
                         batch_size=None)) if t.num_columns]
        pt = pa.concat_tables(p_tabs) if p_tabs else None
        if pt is None or pt.num_rows == 0:
            return _empty.empty_table().to_pandas()
        k = pt["key"].to_numpy(zero_copy_only=False)
        r = pt["rev"].to_numpy(zero_copy_only=False)
        o2 = np.argsort(k, kind="stable")
        k, r = k[o2], r[o2]
        new_g = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new_g)
        gk = k[starts]
        gr = np.add.reduceat(r, starts)
        top = np.lexsort((gk, -gr))[:10]
        gk, gr = gk[top], gr[top]
        gdate = odate[np.searchsorted(okey, gk)]
        import pandas as pd
        return pd.DataFrame({"o_orderkey": gk.astype("int64"),
                             "odate_us": gdate.astype("int64"),
                             "revenue_micro": gr.astype("int64")}) \
            .sort_values(["revenue_micro", "o_orderkey"],
                         ascending=[False, True], ignore_index=True)

    # exchange plan, with runtime bloom pushdown: one extra linear pass
    # over the (already-scanned) customer columns folds the filtered
    # custkeys into a fixed 8 MiB bitmap, and order rows that cannot match
    # are dropped BEFORE the custkey exchange — at TPC-H selectivity ~4/5
    # of order rows never shuffle.  No false negatives (bloom_test is
    # guaranteed True for inserted keys); false positives just ride the
    # exchange and die in semi_block's exact np.isin
    def cust_keys_pos(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.filter(pc.equal(t["c_mktsegment"],
                                         Q3_SEGMENT))["c_custkey"],
                       pa.int64()).to_numpy(zero_copy_only=False)
        h1, h2 = _bloom_positions(keys)
        return pa.table({"pos": pa.array(
            np.unique(np.concatenate([h1, h2])))})

    pos_tabs = [t for t in collect_tables(
        _table(sf_dir, "customer")
        .select_columns(["c_custkey", "c_mktsegment"])
        .map_batches(cust_keys_pos, batch_format="pyarrow"))
        if t.num_columns]
    bloom_ref = ray.put(bloom_fold(pos_tabs))

    def order_side_bloom(t: pa.Table) -> pa.Table:
        kept = order_side(t)
        mask = bloom_test(ray.get(bloom_ref),
                          kept["key"].to_numpy(zero_copy_only=False))
        return kept.filter(pa.array(mask))

    def stage1_bloom():
        cust = _table(sf_dir, "customer") \
            .select_columns(["c_custkey", "c_mktsegment"]) \
            .map_batches(cust_side, batch_format="pyarrow")
        orders = _table(sf_dir, "orders") \
            .select_columns(["o_custkey", "o_orderkey", "o_orderdate"]) \
            .map_batches(order_side_bloom, batch_format="pyarrow")
        return cust.union(orders)

    qualified = hash_group_exchange(
        stage1_bloom, ["key"], semi_block, collect=False,
        rows_hint=_nrows(sf_dir, "customer") + _nrows(sf_dir, "orders"))

    def stage2():
        lines = _table(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]) \
            .map_batches(line_partial, batch_format="pyarrow",
                         batch_size=None)
        return qualified.union(lines)

    df = hash_group_exchange(
        stage2, ["key"], fold_topk_block, collect=True,
        rows_hint=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"))
    if df.empty:      # all partitions empty -> schema-less column-less frame
        return _empty.empty_table().to_pandas()
    df = df.sort_values(["revenue_micro", "o_orderkey"],
                        ascending=[False, True], ignore_index=True).head(10)
    return df.astype({"o_orderkey": "int64", "odate_us": "int64",
                      "revenue_micro": "int64"})


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (grouped HAVING -> join back)
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 250


def q18_having_block(t: pa.Table) -> pa.Table:
    empty = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("odate_us", pa.int64()), ("price_cents", pa.int64()),
        ("total_qty", pa.int64())]).empty_table()
    n = t.num_rows
    if n == 0:
        return empty
    key = t["key"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    aux = t["aux"].to_numpy(zero_copy_only=False)
    order = np.lexsort((side, key))          # order row leads its group
    key, side, aux = key[order], side[order], aux[order]
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new_g)
    qty = np.add.reduceat(np.where(side == 1, aux, 0), starts)
    keep = (side[starts] == 0) & (qty > _Q18_MIN_QTY)
    if not keep.any():
        return empty
    lead = starts[keep]                      # the order rows
    ck = t["custkey"].to_numpy(zero_copy_only=False)[order][lead]
    od = t["odate_us"].to_numpy(zero_copy_only=False)[order][lead]
    return pa.table({"o_orderkey": pa.array(key[lead]),
                     "o_custkey": pa.array(ck.astype(np.int64)),
                     "odate_us": pa.array(od.astype(np.int64)),
                     "price_cents": pa.array(aux[lead]),
                     "total_qty": pa.array(qty[keep])})


def q_q18_big_orders(sf_dir: str):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``_Q18_MIN_QTY``, with the order's custkey / date / price attached.

    ONE orderkey hash exchange, nothing broadcast: lineitem rows reduce
    to per-(batch, orderkey) quantity partials before the exchange (the
    rows themselves never shuffle), order rows ride the same tagged
    union, and each partition folds its whole key groups in one
    lexsort + reduceat pass, emitting only the orders past the HAVING
    gate — the driver sees just the qualifying rows, which the HAVING
    threshold bounds by construction.  Quantities are integral in the
    corpus; both sides sum exact int64 units so the value-hash gate is
    deterministic."""
    from engine.stages import hash_group_exchange

    def order_side(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        n = t.num_rows
        return pa.table({"key": pc.cast(t["o_orderkey"], pa.int64()),
                         "custkey": pc.cast(t["o_custkey"], pa.int64()),
                         "odate_us": pa.array(od),
                         "aux": _cents(t["o_totalprice"]),
                         "side": pa.array(np.zeros(n, dtype=np.int8))})

    def line_partial(t: pa.Table) -> pa.Table:
        qty = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)
                       + 0.5).astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "key": pc.cast(t["l_orderkey"], pa.int64()),
            "qty": pa.array(qty)}), ["key"]).aggregate([("qty", "sum")])
        m = len(g)
        return pa.table({"key": g["key"],
                         "custkey": pa.nulls(m, pa.int64()),
                         "odate_us": pa.nulls(m, pa.int64()),
                         "aux": pc.cast(g["qty_sum"], pa.int64()),
                         "side": pa.array(np.ones(m, dtype=np.int8))})

    def stage():
        orders = _table(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]) \
            .map_batches(order_side, batch_format="pyarrow")
        lines = _table(sf_dir, "lineitem") \
            .select_columns(["l_orderkey", "l_quantity"]) \
            .map_batches(line_partial, batch_format="pyarrow",
                         batch_size=None)
        return orders.union(lines)

    df = hash_group_exchange(
        stage, ["key"], q18_having_block, collect=True,
        rows_hint=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"))
    cols = ["o_orderkey", "o_custkey", "odate_us", "price_cents",
            "total_qty"]
    if df.empty:
        return pa.schema([(c, pa.int64()) for c in cols]).empty_table() \
            .to_pandas()
    return df.sort_values("o_orderkey", ignore_index=True) \
        .astype({c: "int64" for c in cols})[cols]


SQL_Q18_BIG_ORDERS = f"""
WITH q AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::BIGINT AS total_qty
  FROM lineitem GROUP BY 1 HAVING total_qty > {_Q18_MIN_QTY})
SELECT o.o_orderkey::BIGINT AS o_orderkey,
       o.o_custkey::BIGINT AS o_custkey,
       epoch_us(o.o_orderdate)::BIGINT AS odate_us,
       CAST(floor(o.o_totalprice*100.0 + 0.5) AS BIGINT) AS price_cents,
       q.total_qty
FROM orders o JOIN q ON q.l_orderkey = o.o_orderkey
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join -> priority counts
# ---------------------------------------------------------------------------

_Q4_LO = np.datetime64("1996-01-01T00:00:00", "us")
_Q4_HI = np.datetime64("1996-07-01T00:00:00", "us")
_Q4_MIN_QTY = 45.0


def q4_count_block(t: pa.Table) -> pa.Table:
    empty = pa.schema([("o_orderpriority", pa.string()),
                       ("order_count", pa.int64())]).empty_table()
    if t.num_rows == 0:
        return empty
    key = t["key"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    hits = key[side == 1]
    orders = t.filter(pa.array(side == 0))
    if orders.num_rows == 0 or len(hits) == 0:
        return empty
    ok = np.isin(orders["key"].to_numpy(zero_copy_only=False), hits)
    kept = orders.filter(pa.array(ok))
    if kept.num_rows == 0:
        return empty
    g = pa.TableGroupBy(pa.table({"prio": kept["prio"]}), ["prio"]) \
        .aggregate([([], "count_all")])
    return pa.table({"o_orderpriority": g["prio"],
                     "order_count": pc.cast(g["count_all"], pa.int64())})


def q_q4_priority_counts(sf_dir: str):
    """TPC-H Q4 shape: count orders per priority in a half-year window
    where EXISTS a lineitem with quantity > 45.

    ONE orderkey hash exchange: the lineitem side collapses to per-batch
    DISTINCT qualifying orderkeys before the exchange (dedup partials —
    raw matches never shuffle), the date-filtered order rows carry only
    (key, priority), and each partition semi-joins its whole key groups
    in one isin pass, emitting (priority, count) partials — at most 5
    rows per partition cross to the driver fold."""
    from engine.stages import hash_group_exchange

    lo = int(_Q4_LO.astype(np.int64))
    hi = int(_Q4_HI.astype(np.int64))

    def order_side(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        kept = t.filter(pa.array((od >= lo) & (od < hi)))
        n = kept.num_rows
        return pa.table({"key": pc.cast(kept["o_orderkey"], pa.int64()),
                         "prio": kept["o_orderpriority"],
                         "side": pa.array(np.zeros(n, dtype=np.int8))})

    def line_distinct(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keys = pc.cast(t["l_orderkey"], pa.int64()) \
            .filter(pa.array(qty > _Q4_MIN_QTY))
        u = pc.unique(keys)
        n = len(u)
        return pa.table({"key": u,
                         "prio": pa.nulls(n, pa.string()),
                         "side": pa.array(np.ones(n, dtype=np.int8))})

    def stage():
        orders = _table(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
            .map_batches(order_side, batch_format="pyarrow")
        lines = _table(sf_dir, "lineitem") \
            .select_columns(["l_orderkey", "l_quantity"]) \
            .map_batches(line_distinct, batch_format="pyarrow",
                         batch_size=None)
        return orders.union(lines)

    df = hash_group_exchange(
        stage, ["key"], q4_count_block, collect=True,
        rows_hint=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"))
    if df.empty:
        return pa.schema([("o_orderpriority", pa.string()),
                          ("order_count", pa.int64())]).empty_table() \
            .to_pandas()
    out = df.groupby("o_orderpriority", as_index=False, dropna=False) \
        ["order_count"].sum() \
        .sort_values("o_orderpriority", ignore_index=True)
    out["order_count"] = out["order_count"].astype("int64")
    return out


SQL_Q4_PRIORITY_COUNTS = """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY 1 ORDER BY 1
"""


SQL_Q3_REVENUE_TOPK = """
WITH rev AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)))
             ::BIGINT AS revenue_micro
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY 1)
SELECT o.o_orderkey::BIGINT AS o_orderkey,
       epoch_us(o.o_orderdate)::BIGINT AS odate_us, r.revenue_micro
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
                AND c.c_mktsegment = 'BUILDING'
JOIN rev r ON r.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-06-01'
ORDER BY r.revenue_micro DESC, o.o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share (lineitem ⋈ part on partkey)
# ---------------------------------------------------------------------------

PROMO_TYPE = "PROMO"


def _line_rev_micro(t: pa.Table) -> np.ndarray:
    cents = _cents(t["l_extendedprice"])
    pct = 100 - np.floor(t["l_discount"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
    return cents * pct


def promo_fold_block(t: pa.Table) -> pa.Table:
    """Exchange kernel: within one partkey-partition, tag each per-batch
    revenue partial with its part's promo flag (part row sorts first per
    key) and return ONE (promo_rev, total_rev) row.  Inner-join
    semantics: partials whose key has no part row are dropped."""
    empty = pa.table({"promo_rev_micro": pa.array([0], type=pa.int64()),
                      "total_rev_micro": pa.array([0], type=pa.int64())})
    n = t.num_rows
    if n == 0:
        return empty
    key = t["key"].to_numpy(zero_copy_only=False)
    rev = t["rev_micro"].to_numpy(zero_copy_only=False)
    promo = t["promo"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    order = np.lexsort((side, key))           # per key: part row first
    key, rev, promo, side = key[order], rev[order], promo[order], side[order]
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = key[1:] != key[:-1]
    grp = np.cumsum(new_g) - 1
    starts = np.flatnonzero(new_g)
    has_part = side[starts] == 0
    g_promo = promo[starts]                   # valid where has_part
    keep = (side == 1) & has_part[grp]
    total = int(rev[keep].sum())
    prm = int(rev[keep & (g_promo[grp] == 1)].sum())
    return pa.table({"promo_rev_micro": pa.array([prm], type=pa.int64()),
                     "total_rev_micro": pa.array([total], type=pa.int64())})


def q_promo_revenue(sf_dir: str, method: str = "auto"):
    """TPC-H Q14 shape: the PROMO-type share of shipped revenue,
    integer-exact (micros; share as permille by integer division).

    Dual physical plan, auto-selected by the part table's parquet row
    count (the Q3/curate ``_BROADCAST_MAX`` contract):

    * ``broadcast`` — the (sorted partkey, promo flag) arrays ship once
      via ``ray.put``; each lineitem batch probes by ``searchsorted`` and
      emits ONE (promo, total) partial row.  No shuffle at all.
    * ``exchange`` — at warehouse scale part is a fact table (SF x 200k
      rows), so the join is a tagged-union hash exchange on partkey
      carrying per-BATCH revenue partials (one row per distinct partkey
      per batch — lineitem rows never shuffle) against (partkey, flag)
      part rows; each partition folds to one scalar row.

    Driver fold is over scalar partials in Python bigints (the int64
    bound inside a partition — ~500k partials x <=2.6e12 each — is
    asserted by construction at gate scale; the documented swap is a
    micro->centi rescale, not a plan change)."""
    import ray

    from engine.pipeline import collect_tables
    from engine.stages import hash_group_exchange

    if method == "auto":
        method = ("broadcast"
                  if _nrows(sf_dir, "part") <= _BROADCAST_MAX
                  else "exchange")

    def line_partial_rows(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "key": pc.cast(t["l_partkey"], pa.int64()),
            "rev": pa.array(_line_rev_micro(t))}), ["key"]) \
            .aggregate([("rev", "sum")])
        m = len(g)
        return pa.table({"key": g["key"],
                         "rev_micro": pc.cast(g["rev_sum"], pa.int64()),
                         "promo": pa.array(np.zeros(m, dtype=np.int8)),
                         "side": pa.array(np.ones(m, dtype=np.int8))})

    li_cols = ["l_partkey", "l_extendedprice", "l_discount"]

    if method == "broadcast":
        from engine.io import read_parquet_clean as _rpc
        part = pa.concat_tables(
            [x.select(["p_partkey", "p_type"]) for x in collect_tables(
                _rpc(os.path.join(sf_dir, "part.parquet"),
                     columns=["p_partkey", "p_type"])) if x.num_columns])
        pk = pc.cast(part["p_partkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        flag = pc.equal(part["p_type"], PROMO_TYPE) \
            .to_numpy(zero_copy_only=False)
        order = np.argsort(pk)
        pk_ref = ray.put(pk[order])
        flag_ref = ray.put(flag[order])

        def partial(t: pa.Table) -> pa.Table:
            pk_s, fl_s = ray.get(pk_ref), ray.get(flag_ref)
            key = pc.cast(t["l_partkey"], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            pos = np.searchsorted(pk_s, key)
            pos_c = np.minimum(pos, len(pk_s) - 1)
            hit = pk_s[pos_c] == key          # inner-join semantics
            rev = _line_rev_micro(t)[hit]
            prm = fl_s[pos_c[hit]]
            return pa.table({
                "promo_rev_micro": pa.array([int(rev[prm].sum())],
                                            type=pa.int64()),
                "total_rev_micro": pa.array([int(rev.sum())],
                                            type=pa.int64())})

        parts = [x for x in collect_tables(
            _table(sf_dir, "lineitem").select_columns(li_cols)
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None)) if x.num_columns]
        df = pa.concat_tables(parts).to_pandas() if parts else None
    else:
        def part_side(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "key": pc.cast(t["p_partkey"], pa.int64()),
                "rev_micro": pa.array(np.zeros(n, dtype=np.int64)),
                "promo": pc.cast(pc.equal(t["p_type"], PROMO_TYPE),
                                 pa.int8()),
                "side": pa.array(np.zeros(n, dtype=np.int8))})

        def union_ds():
            import ray.data
            part = _table(sf_dir, "part") \
                .select_columns(["p_partkey", "p_type"]) \
                .map_batches(part_side, batch_format="pyarrow")
            li = _table(sf_dir, "lineitem").select_columns(li_cols) \
                .map_batches(line_partial_rows, batch_format="pyarrow",
                             batch_size=None)
            return part.union(li)

        df = hash_group_exchange(
            union_ds, ["key"], promo_fold_block,
            rows_hint=_nrows(sf_dir, "part")
            + max(1, _nrows(sf_dir, "lineitem") // 64))

    if df is None or df.empty:
        prm = total = 0
    else:  # Python-int fold: immune to int64 overflow across partials
        prm = sum(int(v) for v in df["promo_rev_micro"])
        total = sum(int(v) for v in df["total_rev_micro"])
    permille = (1000 * prm) // total if total else 0
    return pa.table({
        "promo_rev_micro": pa.array([prm], type=pa.int64()),
        "total_rev_micro": pa.array([total], type=pa.int64()),
        "promo_permille": pa.array([permille], type=pa.int64())})


SQL_PROMO_REVENUE = f"""
WITH r AS (
  SELECT CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)) AS rev,
         (p_type = '{PROMO_TYPE}') AS is_promo
  FROM lineitem JOIN part ON p_partkey = l_partkey)
SELECT coalesce(sum(rev) FILTER (WHERE is_promo), 0)::BIGINT
           AS promo_rev_micro,
       coalesce(sum(rev), 0)::BIGINT AS total_rev_micro,
       CASE WHEN coalesce(sum(rev), 0) = 0 THEN 0
            ELSE (1000 * coalesce(sum(rev) FILTER (WHERE is_promo), 0))
                 // sum(rev) END::BIGINT AS promo_permille
FROM r
"""


# ---------------------------------------------------------------------------
# Q5 shape: revenue by supplier nation (lineitem ⋈ supplier ⋈ nation)
# ---------------------------------------------------------------------------

def q_nation_revenue(sf_dir: str):
    """Shipped revenue per SUPPLIER nation: the two dimension maps
    (suppkey -> nationkey -> name) fold into ONE sorted probe array that
    broadcasts once; each lineitem batch emits <= |nations| partial rows
    and the driver folds in Python bigints.  supplier is dimension-sized
    here (``_BROADCAST_MAX`` asserted); past that bound the swap is
    :func:`q_promo_revenue`'s tagged-union exchange with nationkey riding
    the part side — same kernel, different flag column."""
    import ray

    from engine.pipeline import collect_tables

    assert _nrows(sf_dir, "supplier") <= _BROADCAST_MAX, \
        "supplier outgrew the broadcast regime: use the exchange plan"
    from engine.io import read_parquet_clean as _rpc
    supp = pa.concat_tables(
        [x.select(["s_suppkey", "s_nationkey"]) for x in collect_tables(
            _rpc(os.path.join(sf_dir, "supplier.parquet"),
                 columns=["s_suppkey", "s_nationkey"])) if x.num_columns])
    nat = pa.concat_tables(
        [x.select(["n_nationkey", "n_name"]) for x in collect_tables(
            _rpc(os.path.join(sf_dir, "nation.parquet"),
                 columns=["n_nationkey", "n_name"])) if x.num_columns])
    sk = pc.cast(supp["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    snk = pc.cast(supp["s_nationkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    order = np.argsort(sk)
    sk_ref = ray.put(sk[order])
    snk_ref = ray.put(snk[order])

    def partial(t: pa.Table) -> pa.Table:
        sk_s, snk_s = ray.get(sk_ref), ray.get(snk_ref)
        key = pc.cast(t["l_suppkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk_s, key)
        pos_c = np.minimum(pos, len(sk_s) - 1)
        hit = sk_s[pos_c] == key              # inner-join semantics
        nkey = snk_s[pos_c[hit]]
        rev = _line_rev_micro(t)[hit]
        g = pa.TableGroupBy(pa.table({
            "nkey": pa.array(nkey), "rev": pa.array(rev)}), ["nkey"]) \
            .aggregate([([], "count_all"), ("rev", "sum")])
        return pa.table({"nkey": g["nkey"],
                         "rev": pc.cast(g["rev_sum"], pa.int64()),
                         "n": pc.cast(g["count_all"], pa.int64())})

    parts = [x for x in collect_tables(
        _table(sf_dir, "lineitem").select_columns(
            ["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=None)) if x.num_columns]
    name_of = dict(zip(
        pc.cast(nat["n_nationkey"], pa.int64()).to_pylist(),
        nat["n_name"].to_pylist()))
    acc: dict = {}
    for t in parts:
        for r in t.to_pylist():               # <= |nations| rows per batch
            prev = acc.get(r["nkey"], (0, 0))
            acc[r["nkey"]] = (prev[0] + int(r["rev"]), prev[1] + int(r["n"]))
    rows = sorted((name_of[k], v[0], v[1]) for k, v in acc.items())
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], type=pa.string()),
        "revenue_micro": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_items": pa.array([r[2] for r in rows], type=pa.int64())})


SQL_NATION_REVENUE = """
SELECT n_name,
       sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)))
           ::BIGINT AS revenue_micro,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q5: local-supplier volume (customer nation == supplier nation)
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
_Q5_LO_US = int(np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64))
_Q5_HI_US = int(np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64))


def _dim_probe(sf_dir: str, table: str, key_col: str, val_col: str):
    """Driver-side (sorted key array, aligned value array) of a dimension
    table — the broadcast probe shape every dim join here uses."""
    from engine.pipeline import collect_tables
    tab = pa.concat_tables(
        [x.select([key_col, val_col]) for x in collect_tables(
            read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"),
                               columns=[key_col, val_col]))
         if x.num_columns])
    k = pc.cast(tab[key_col], pa.int64()).to_numpy(zero_copy_only=False)
    v = pc.cast(tab[val_col], pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(k)
    return k[order], v[order]


_Q5_SCHEMA = pa.schema([("key", pa.int64()), ("nat", pa.int64()),
                        ("rev_micro", pa.int64()), ("side", pa.int8())])


def q5_fold_block(t: pa.Table) -> pa.Table:
    """Orderkey-partition kernel: equate the order row's CUSTOMER nation
    with each revenue partial's SUPPLIER nation, then fold the survivors
    to <= |nations| (nkey, revenue) rows for this partition."""
    empty = pa.schema([("nkey", pa.int64()),
                       ("revenue_micro", pa.int64())]).empty_table()
    n = t.num_rows
    if n == 0:
        return empty
    key = t["key"].to_numpy(zero_copy_only=False)
    nat = t["nat"].to_numpy(zero_copy_only=False)
    rev = t["rev_micro"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    order = np.lexsort((side, key))           # order row sorts first per key
    key, nat, rev, side = key[order], nat[order], rev[order], side[order]
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new_g)
    grp = np.cumsum(new_g) - 1
    has_order = side[starts] == 0             # qualified-order row present
    c_nat = nat[starts]                       # its customer nation (if any)
    keep = has_order[grp] & (side == 1) & (nat == c_nat[grp])
    if not keep.any():
        return empty
    uniq, inv = np.unique(nat[keep], return_inverse=True)
    sums = np.bincount(inv, weights=rev[keep].astype(np.float64))
    # exactness: bincount sums in float64; per-partition partials stay
    # well under 2^53 (each <= 2.6e12 x partition rows at gate scale) —
    # re-sum in int64 to assert, not trust
    isums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(isums, inv, rev[keep])
    assert (isums == sums.astype(np.int64)).all()
    return pa.table({"nkey": pa.array(uniq),
                     "revenue_micro": pa.array(isums)})


def q_q5_local_volume(sf_dir: str):
    """TPC-H Q5: 1996 revenue by nation for lineitems whose CUSTOMER and
    SUPPLIER sit in the same ``Q5_REGION`` nation.

    Plan: region ⋈ nation folds driver-side (tiny); customer→nationkey
    and supplier→nationkey broadcast once (asserted dimension-sized —
    past ``_BROADCAST_MAX`` each probe becomes one more tagged union
    riding the SAME orderkey exchange, the Q3 recipe, no plan rewrite).
    The fact-fact orders ⋈ lineitem join is ONE orderkey-keyed exchange:
    orders emit (okey, c_nat) only for in-window orders with in-region
    customers; lineitems emit per-(okey, s_nat) per-BATCH revenue
    partials only for in-region suppliers (lineitem rows never shuffle);
    :func:`q5_fold_block` equates the two nations inside each partition
    and returns <= |nations| rows, so the driver folds scalars."""
    import ray

    from engine.pipeline import collect_tables
    from engine.stages import hash_group_exchange

    assert _nrows(sf_dir, "customer") <= _BROADCAST_MAX \
        and _nrows(sf_dir, "supplier") <= _BROADCAST_MAX, \
        "dim table outgrew the broadcast regime: ride the okey exchange"

    nat = pa.concat_tables(
        [x for x in collect_tables(_table(sf_dir, "nation"))
         if x.num_columns])
    reg = pa.concat_tables(
        [x for x in collect_tables(_table(sf_dir, "region"))
         if x.num_columns])
    rkey = pc.cast(reg.filter(pc.equal(reg["r_name"], Q5_REGION))
                   ["r_regionkey"], pa.int64()).to_pylist()
    in_region = pc.is_in(pc.cast(nat["n_regionkey"], pa.int64()),
                         value_set=pa.array(rkey, type=pa.int64()))
    region_nk = np.sort(pc.cast(nat.filter(in_region)["n_nationkey"],
                                pa.int64()).to_numpy(zero_copy_only=False))
    name_of = dict(zip(pc.cast(nat["n_nationkey"], pa.int64()).to_pylist(),
                       nat["n_name"].to_pylist()))

    ck, cn = _dim_probe(sf_dir, "customer", "c_custkey", "c_nationkey")
    sk, sn = _dim_probe(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    ck_ref, cn_ref = ray.put(ck), ray.put(cn)
    sk_ref, sn_ref = ray.put(sk), ray.put(sn)
    rnk_ref = ray.put(region_nk)

    def order_side(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = (od >= _Q5_LO_US) & (od < _Q5_HI_US)
        if not m.any():
            return _Q5_SCHEMA.empty_table()
        ckey = pc.cast(t["o_custkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[m]
        okey = pc.cast(t["o_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[m]
        ck_s, cn_s = ray.get(ck_ref), ray.get(cn_ref)
        rnk = ray.get(rnk_ref)
        pos = np.minimum(np.searchsorted(ck_s, ckey), len(ck_s) - 1)
        hit = ck_s[pos] == ckey               # inner-join semantics
        cnat = np.where(hit, cn_s[pos], -1)
        keep = hit & np.isin(cnat, rnk)
        k = int(keep.sum())
        return pa.table({"key": pa.array(okey[keep]),
                         "nat": pa.array(cnat[keep]),
                         "rev_micro": pa.array(np.zeros(k, dtype=np.int64)),
                         "side": pa.array(np.zeros(k, dtype=np.int8))})

    def line_side(t: pa.Table) -> pa.Table:
        skey = pc.cast(t["l_suppkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        okey = pc.cast(t["l_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sk_s, sn_s = ray.get(sk_ref), ray.get(sn_ref)
        rnk = ray.get(rnk_ref)
        pos = np.minimum(np.searchsorted(sk_s, skey), len(sk_s) - 1)
        hit = sk_s[pos] == skey
        snat = np.where(hit, sn_s[pos], -1)
        keep = hit & np.isin(snat, rnk)
        if not keep.any():
            return _Q5_SCHEMA.empty_table()
        g = pa.TableGroupBy(pa.table({
            "key": pa.array(okey[keep]), "nat": pa.array(snat[keep]),
            "rev": pa.array(_line_rev_micro(t)[keep])}), ["key", "nat"]) \
            .aggregate([("rev", "sum")])
        m = len(g)
        return pa.table({"key": g["key"], "nat": g["nat"],
                         "rev_micro": pc.cast(g["rev_sum"], pa.int64()),
                         "side": pa.array(np.ones(m, dtype=np.int8))})

    def union_ds():
        orders = _table(sf_dir, "orders") \
            .select_columns(["o_orderkey", "o_custkey", "o_orderdate"]) \
            .map_batches(order_side, batch_format="pyarrow",
                         batch_size=None)
        li = _table(sf_dir, "lineitem") \
            .select_columns(["l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount"]) \
            .map_batches(line_side, batch_format="pyarrow",
                         batch_size=None)
        return orders.union(li)

    df = hash_group_exchange(
        union_ds, ["key"], q5_fold_block,
        rows_hint=_nrows(sf_dir, "orders") // 4
        + max(1, _nrows(sf_dir, "lineitem") // 16))
    acc: dict = {}
    if df is not None and not df.empty:
        for nk, rv in zip(df["nkey"], df["revenue_micro"]):
            acc[int(nk)] = acc.get(int(nk), 0) + int(rv)
    rows = sorted(((name_of[k], v) for k, v in acc.items()),
                  key=lambda r: (-r[1], r[0]))
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], type=pa.string()),
        "revenue_micro": pa.array([r[1] for r in rows], type=pa.int64())})


SQL_Q5_LOCAL_VOLUME = f"""
SELECT n_name,
       sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)))
           ::BIGINT AS revenue_micro
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey AND c_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_micro DESC, n_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q10: returned-item revenue, top-20 customers
# ---------------------------------------------------------------------------

_Q10_LO_US = int(np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64))
_Q10_HI_US = int(np.datetime64("1996-07-01T00:00:00", "us").astype(np.int64))
_Q10_K = 20

_Q10_SCHEMA = pa.schema([("key", pa.int64()), ("cust", pa.int64()),
                         ("rev_micro", pa.int64()), ("side", pa.int8())])


def q10_okey_fold_block(t: pa.Table) -> pa.Table:
    """orderkey-partition kernel: attach each qualified order's custkey
    to its returned-revenue partials; emit (cust, rev) partials."""
    empty = pa.schema([("cust", pa.int64()),
                       ("rev_micro", pa.int64())]).empty_table()
    n = t.num_rows
    if n == 0:
        return empty
    key = t["key"].to_numpy(zero_copy_only=False)
    cust = t["cust"].to_numpy(zero_copy_only=False)
    rev = t["rev_micro"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    order = np.lexsort((side, key))
    key, cust, rev, side = key[order], cust[order], rev[order], side[order]
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new_g)
    grp = np.cumsum(new_g) - 1
    has_order = side[starts] == 0
    g_cust = cust[starts]
    keep = has_order[grp] & (side == 1)
    if not keep.any():
        return empty
    uniq, inv = np.unique(g_cust[grp[keep]], return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, rev[keep])
    return pa.table({"cust": pa.array(uniq), "rev_micro": pa.array(sums)})


def q10_cust_fold_block(t: pa.Table) -> pa.Table:
    """custkey-partition kernel: fold revenue per customer, keep the
    partition's local top-20 by (revenue DESC, custkey ASC)."""
    empty = pa.schema([("cust", pa.int64()),
                       ("rev_micro", pa.int64())]).empty_table()
    if t.num_rows == 0:
        return empty
    cust = t["cust"].to_numpy(zero_copy_only=False)
    rev = t["rev_micro"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(cust, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, rev)
    top = np.lexsort((uniq, -sums))[:_Q10_K]
    return pa.table({"cust": pa.array(uniq[top]),
                     "rev_micro": pa.array(sums[top])})


def q_q10_returned_topk(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by revenue of RETURNED items
    ('R') on orders placed in 1996-H1, with the customer name joined in.

    Two chained exchanges: orderkey (attach custkey to per-(batch,
    orderkey) returned-revenue partials — lineitem rows never shuffle)
    then custkey (global per-customer fold + per-partition partial
    top-20, so the driver sees <= 20 x partitions rows).  The name
    lookup reads the customer table pruned to the 20 winners."""
    from engine.pipeline import collect_tables
    from engine.stages import hash_group_exchange

    def order_side(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = (od >= _Q10_LO_US) & (od < _Q10_HI_US)
        if not m.any():
            return _Q10_SCHEMA.empty_table()
        okey = pc.cast(t["o_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[m]
        cust = pc.cast(t["o_custkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[m]
        k = len(okey)
        return pa.table({"key": pa.array(okey), "cust": pa.array(cust),
                         "rev_micro": pa.array(np.zeros(k, dtype=np.int64)),
                         "side": pa.array(np.zeros(k, dtype=np.int8))})

    def line_side(t: pa.Table) -> pa.Table:
        ret = pc.equal(t["l_returnflag"], "R").to_numpy(
            zero_copy_only=False)
        if not ret.any():
            return _Q10_SCHEMA.empty_table()
        okey = pc.cast(t["l_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[ret]
        g = pa.TableGroupBy(pa.table({
            "key": pa.array(okey),
            "rev": pa.array(_line_rev_micro(t)[ret])}), ["key"]) \
            .aggregate([("rev", "sum")])
        m = len(g)
        return pa.table({"key": g["key"],
                         "cust": pa.array(np.zeros(m, dtype=np.int64)),
                         "rev_micro": pc.cast(g["rev_sum"], pa.int64()),
                         "side": pa.array(np.ones(m, dtype=np.int8))})

    def union_ds():
        orders = _table(sf_dir, "orders") \
            .select_columns(["o_orderkey", "o_custkey", "o_orderdate"]) \
            .map_batches(order_side, batch_format="pyarrow",
                         batch_size=None)
        li = _table(sf_dir, "lineitem") \
            .select_columns(["l_orderkey", "l_returnflag",
                             "l_extendedprice", "l_discount"]) \
            .map_batches(line_side, batch_format="pyarrow",
                         batch_size=None)
        return orders.union(li)

    df = hash_group_exchange(
        union_ds, [["key"], ["cust"]],
        [q10_okey_fold_block, q10_cust_fold_block],
        rows_hint=_nrows(sf_dir, "orders") // 2)
    if df is None or df.empty:
        return pa.table({"c_custkey": pa.array([], type=pa.int64()),
                         "c_name": pa.array([], type=pa.string()),
                         "revenue_micro": pa.array([], type=pa.int64())})
    agg = df.groupby("cust", as_index=False).sum()
    agg = agg.sort_values(["rev_micro", "cust"],
                          ascending=[False, True]).head(_Q10_K)
    winners = agg["cust"].astype(int).tolist()
    cust = pa.concat_tables(
        [x.select(["c_custkey", "c_name"]) for x in collect_tables(
            read_parquet_clean(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_name"]))
         if x.num_columns])
    ck = pc.cast(cust["c_custkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    names = cust["c_name"].to_pylist()
    name_of = {int(k): n for k, n in zip(ck, names)}
    return pa.table({
        "c_custkey": pa.array(winners, type=pa.int64()),
        "c_name": pa.array([name_of[w] for w in winners],
                           type=pa.string()),
        "revenue_micro": pa.array(agg["rev_micro"].astype(int),
                                  type=pa.int64())})


SQL_Q10_RETURNED_TOPK = """
SELECT c_custkey::BIGINT AS c_custkey, c_name,
       sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)))
           ::BIGINT AS revenue_micro
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1, 2
ORDER BY revenue_micro DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# referential-integrity audit (gated)
# ---------------------------------------------------------------------------

def dangling_fold_block(t: pa.Table) -> pa.Table:
    """FK-partition kernel: a key group with fact partials but NO
    dimension row is dangling; emit ONE row per partition with the
    dangling fact-row count."""
    if t.num_rows == 0:
        return pa.schema([("n_dangling", pa.int64())]).empty_table()
    key = t["key"].to_numpy(zero_copy_only=False)
    cnt = t["cnt"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    order = np.lexsort((side, key))
    key, cnt, side = key[order], cnt[order], side[order]
    new_g = np.empty(len(key), dtype=bool)
    new_g[0] = True
    new_g[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new_g)
    grp = np.cumsum(new_g) - 1
    has_dim = side[starts] == 0
    n = int(cnt[(~has_dim[grp]) & (side == 1)].sum())
    return pa.table({"n_dangling": pa.array([n], type=pa.int64())})


def _dangling_count(sf_dir: str, fact: str, fact_key: str,
                    dim: str, dim_key: str) -> int:
    """Distributed NOT-EXISTS count: per-batch (key, count) fact partials
    union per-batch-distinct dimension keys through one FK-keyed
    exchange — neither side broadcasts, fact rows never shuffle."""
    from engine.stages import hash_group_exchange

    def fact_side(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "key": pc.cast(t[fact_key], pa.int64())}), ["key"]) \
            .aggregate([([], "count_all")])
        m = len(g)
        return pa.table({"key": g["key"],
                         "cnt": pc.cast(g["count_all"], pa.int64()),
                         "side": pa.array(np.ones(m, dtype=np.int8))})

    def dim_side(t: pa.Table) -> pa.Table:
        keys = np.unique(pc.cast(t[dim_key], pa.int64())
                         .to_numpy(zero_copy_only=False))
        m = len(keys)
        return pa.table({"key": pa.array(keys),
                         "cnt": pa.array(np.zeros(m, dtype=np.int64)),
                         "side": pa.array(np.zeros(m, dtype=np.int8))})

    def union_ds():
        f = _table(sf_dir, fact).select_columns([fact_key]) \
            .map_batches(fact_side, batch_format="pyarrow",
                         batch_size=None)
        d = _table(sf_dir, dim).select_columns([dim_key]) \
            .map_batches(dim_side, batch_format="pyarrow",
                         batch_size=None)
        return f.union(d)

    df = hash_group_exchange(union_ds, ["key"], dangling_fold_block,
                             rows_hint=_nrows(sf_dir, dim))
    return int(df["n_dangling"].sum()) \
        if df is not None and not df.empty else 0


def q_fk_violations(sf_dir: str):
    """Referential-integrity audit over the star schema: fact rows whose
    FK has no dimension row, for the four load-bearing joins.  Each
    check is one FK-keyed exchange (no broadcast, no driver key sets);
    a healthy corpus reports zeros — the planted-corruption pytest
    proves the counts fire."""
    return pa.table({
        "dangling_lineitem_order": pa.array(
            [_dangling_count(sf_dir, "lineitem", "l_orderkey",
                             "orders", "o_orderkey")], type=pa.int64()),
        "dangling_order_customer": pa.array(
            [_dangling_count(sf_dir, "orders", "o_custkey",
                             "customer", "c_custkey")], type=pa.int64()),
        "dangling_lineitem_part": pa.array(
            [_dangling_count(sf_dir, "lineitem", "l_partkey",
                             "part", "p_partkey")], type=pa.int64()),
        "dangling_lineitem_supplier": pa.array(
            [_dangling_count(sf_dir, "lineitem", "l_suppkey",
                             "supplier", "s_suppkey")], type=pa.int64())})


SQL_FK_VIOLATIONS = """
SELECT
  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT
    AS dangling_lineitem_order,
  (SELECT count(*) FROM orders o WHERE NOT EXISTS
     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT
    AS dangling_order_customer,
  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
     (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))::BIGINT
    AS dangling_lineitem_part,
  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
     (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))::BIGINT
    AS dangling_lineitem_supplier
"""


# ---------------------------------------------------------------------------
# TPC-H Q6: forecasting revenue change (pure filter-sum)
# ---------------------------------------------------------------------------

def q_q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6: revenue delta from dropping small discounts — lineitems
    shipped in 1996 with discount 5-7 % and quantity < 24; revenue =
    cents * discount_pct summed.  A pure filter-sum: one column-pruned
    scan, one scalar partial per batch, zero shuffle."""
    from engine.pipeline import collect_tables

    lo = int(np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64))
    hi = int(np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        sd = pc.cast(t["l_shipdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        disc = np.floor(t["l_discount"].to_numpy(zero_copy_only=False)
                        * 100.0 + 0.5).astype(np.int64)
        m = (sd >= lo) & (sd < hi) & (qty < 24) & (disc >= 5) & (disc <= 7)
        rev = int((_cents(t["l_extendedprice"])[m] * disc[m]).sum())
        return pa.table({"rev": pa.array([rev], type=pa.int64()),
                         "n": pa.array([int(m.sum())], type=pa.int64())})

    tabs = [x for x in collect_tables(
        _table(sf_dir, "lineitem").select_columns(
            ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None))
        if x.num_columns]
    rev = sum(int(v) for t in tabs for v in t["rev"].to_pylist())
    n = sum(int(v) for t in tabs for v in t["n"].to_pylist())
    return pa.table({"revenue_micro": pa.array([rev], type=pa.int64()),
                     "n_items": pa.array([n], type=pa.int64())})


SQL_Q6_FORECAST_REVENUE = """
SELECT coalesce(sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)
           * CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)), 0)::BIGINT
         AS revenue_micro,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity < 24
  AND CAST(floor(l_discount*100.0 + 0.5) AS BIGINT) BETWEEN 5 AND 7
"""


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue (correlated per-part average)
# ---------------------------------------------------------------------------

def q17_fold_block(t: pa.Table) -> pa.Table:
    """partkey-partition kernel: fold each part's (sum qty, count), then
    keep rows with 5 * qty * cnt < sum_qty (the integer-exact
    qty < 0.2 * avg test) and emit one (revenue, n) partial."""
    if t.num_rows == 0:
        return pa.schema([("rev", pa.int64()),
                          ("n", pa.int64())]).empty_table()
    key = t["key"].to_numpy(zero_copy_only=False)
    qty = t["qty"].to_numpy(zero_copy_only=False)
    price = t["price"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(key, return_inverse=True)
    sq = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sq, inv, qty)
    cnt = np.bincount(inv).astype(np.int64)
    keep = 5 * qty * cnt[inv] < sq[inv]
    return pa.table({
        "rev": pa.array([int(price[keep].sum())], type=pa.int64()),
        "n": pa.array([int(keep.sum())], type=pa.int64())})


def q_q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue of lineitems whose quantity is below
    20 % of their part's corpus-wide average.  The correlated average
    forces the (qty, price) row pairs through ONE partkey-keyed exchange
    (16 B/row — the one Q-shape here where fact rows must shuffle, and
    the oracle of why: the filter depends on the part's GLOBAL mean);
    each partition folds to a single scalar partial.  The quantity test
    is integer cross-multiplied (5 * qty * cnt < sum_qty), so no
    division crosses an engine boundary."""
    from engine.stages import hash_group_exchange

    def rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["l_partkey"], pa.int64()),
            "qty": pa.array(t["l_quantity"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "price": pa.array(_cents(t["l_extendedprice"]))})

    df = hash_group_exchange(
        lambda: _table(sf_dir, "lineitem").select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(rows, batch_format="pyarrow", batch_size=None),
        ["key"], q17_fold_block, rows_hint=_nrows(sf_dir, "lineitem"))
    rev = int(df["rev"].sum()) if df is not None and not df.empty else 0
    n = int(df["n"].sum()) if df is not None and not df.empty else 0
    return pa.table({
        "small_qty_rev_cents": pa.array([rev], type=pa.int64()),
        "n_items": pa.array([n], type=pa.int64())})


SQL_Q17_SMALL_QTY_REVENUE = """
WITH a AS (
  SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sq,
         count(*) AS cnt
  FROM lineitem GROUP BY 1
)
SELECT coalesce(sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)),
                0)::BIGINT AS small_qty_rev_cents,
       count(*)::BIGINT AS n_items
FROM lineitem JOIN a USING (l_partkey)
WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sq
"""
