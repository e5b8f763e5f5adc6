"""Driver-gated queries: Ray Data implementations + equivalent DuckDB SQL.

Every entry here appears in ``__ray_entry__.queries()`` with a matching
``oracle_sql()`` string; the driver runs both at sf=0.01 and compares
row-count + schema + order-insensitive value-hash.  Conventions that make
the comparison deterministic:

* integer outputs everywhere (monetary/real values are converted to
  integer cents/milli-units with ``floor(x*K + 0.5)`` / ``floor(x*K)`` —
  identical double math in numpy and DuckDB — never rounded float sums);
* all integer columns cast to int64, strings stay utf8, booleans bool;
* telemetry queries read the committed deterministic fixture corpus
  (``fixtures/sf0.01``), which the SQL references by absolute path;
* relational/text/embedding queries read the driver's testdata tables
  (pre-registered DuckDB views of the same parquet files).

The SQL for the telemetry decode queries re-derives the reference bit
arithmetic (LE byte windows, shift, mask — utils/byte_ops.py:31-66) from
`tokens` int32 words, including the record-count clamp
``min(logical, fits)`` of metadata_payload_parser.py:231-236.
"""

from __future__ import annotations

import os
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine import fixtures, stages
from engine.catalog import compile_catalog
from engine.kernels import BatchView, Decoder
from engine.oracle import ERR_OK

FIX01 = "/root/repo/fixtures/sf0.01"
SEQ_SQL = f"read_parquet('{FIX01}/sequences/*.parquet')"
META_SQL = f"read_parquet('{FIX01}/source_meta.parquet')"


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def _seq_ds(sf_dir: str):
    import ray
    fix = fixtures.ensure_fixtures(fixtures.sf_of(sf_dir))
    return ray.data.read_parquet(os.path.join(fix, "sequences"))


def _table(sf_dir: str, name: str):
    from engine.io import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"))


def _to_i64(t: pa.Table) -> pa.Table:
    """Cast every integer column to int64 for dtype-stable comparisons."""
    cols = {}
    for name, col in zip(t.column_names, t.columns):
        if pa.types.is_integer(col.type) and not pa.types.is_uint64(col.type):
            cols[name] = pc.cast(col, pa.int64())
        else:
            cols[name] = col
    return pa.table(cols)


def _finalize(ds):
    return ds.map_batches(_to_i64, batch_format="pyarrow")


# --- SQL rendering helpers (payload byte b lives in tokens[5 + b//4]) ------

def _sql_byte(i: str) -> str:
    return f"((tokens[5 + ({i})//4]::BIGINT >> (8*(({i})%4))) & 255)"


def _sql_uint(off, nbytes: int) -> str:
    terms = [f"{_sql_byte(f'({off})+{k}')}*{256 ** k}" for k in range(nbytes)]
    return "(" + " + ".join(terms) + ")"


def _sql_field(off: int, nbytes: int, signed: bool = False) -> str:
    u = _sql_uint(str(off), nbytes)
    if signed:
        n = nbytes * 8
        u = f"(CASE WHEN {u} >= {1 << (n - 1)} THEN {u} - {1 << n} ELSE {u} END)"
    return f"(CASE WHEN (n_tok-4)*4 >= {off + nbytes} THEN {u} END)"


def _sql_error_case(version_fallback: bool = False) -> str:
    compiled = compile_catalog()
    types = sorted({mt for mt, _ in compiled})
    pairs = {}
    for mt, v in compiled:
        pairs.setdefault(mt, []).append(v)
    pair_sql = " OR ".join(
        f"(tokens[1]={mt} AND tokens[2] IN ({','.join(map(str, sorted(vs)))}))"
        for mt, vs in sorted(pairs.items()))
    if version_fallback:
        # reference version_resolver.py:46-50: any known logcode decodes
        # (unknown version -> first table), so error 3 cannot occur
        return (f"CASE WHEN n_tok < 4 THEN 1 "
                f"WHEN tokens[1] NOT IN ({','.join(map(str, types))}) THEN 2 "
                f"ELSE 0 END")
    return (f"CASE WHEN n_tok < 4 THEN 1 "
            f"WHEN tokens[1] NOT IN ({','.join(map(str, types))}) THEN 2 "
            f"WHEN NOT ({pair_sql}) THEN 3 ELSE 0 END")


def _sql_layout_version() -> str:
    """Fallback-resolved decode table: the raw version when the (logcode,
    version) pair is known, else the logcode's first version."""
    compiled = compile_catalog()
    pairs, first = {}, {}
    for mt, v in compiled:
        pairs.setdefault(mt, []).append(v)
        first.setdefault(mt, v)
    pair_sql = " OR ".join(
        f"(tokens[1]={mt} AND tokens[2] IN ({','.join(map(str, sorted(vs)))}))"
        for mt, vs in sorted(pairs.items()))
    firsts = " ".join(f"WHEN {mt} THEN {v}" for mt, v in sorted(first.items()))
    # unknown LOGCODE rows keep the raw version (no fallback applies; they
    # stay error 2), matching Decoder.classify's layout_version
    return (f"(CASE WHEN ({pair_sql}) THEN tokens[2]::BIGINT "
            f"ELSE (CASE tokens[1] {firsts} ELSE tokens[2] END)::BIGINT END)")


# ---------------------------------------------------------------------------
# telemetry queries (fixture corpus)
# ---------------------------------------------------------------------------

def q_parse_header(sf_dir: str):
    ds = stages.parse_stage(_seq_ds(sf_dir))
    ds = ds.map_batches(
        lambda t: _to_i64(t.select(["doc_id", "msg_type", "version", "seq",
                                    "ts", "error_code", "n_tok", "source"])),
        batch_format="pyarrow")
    return ds


SQL_PARSE_HEADER = f"""
SELECT doc_id,
  CASE WHEN n_tok>=4 THEN tokens[1]::BIGINT END AS msg_type,
  CASE WHEN n_tok>=4 THEN tokens[2]::BIGINT END AS version,
  CASE WHEN n_tok>=4 THEN tokens[3]::BIGINT END AS seq,
  CASE WHEN n_tok>=4 THEN tokens[4]::BIGINT END AS ts,
  ({_sql_error_case()})::BIGINT AS error_code,
  n_tok::BIGINT AS n_tok, source
FROM {SEQ_SQL}
"""


def q_parse_header_fallback(sf_dir: str):
    """Strict-vs-fallback pair, fallback side: unknown versions of known
    logcodes classify OK and resolve to the logcode's first table
    (reference version_resolver.py:46-50); ``layout_version`` records the
    table the row decodes under, ``version`` stays raw."""
    def parse_fb(t: pa.Table) -> pa.Table:
        return stages.parse_batch(t, version_fallback=True)

    ds = _seq_ds(sf_dir).map_batches(parse_fb, batch_format="pyarrow")
    return ds.map_batches(
        lambda t: _to_i64(t.select(["doc_id", "msg_type", "version",
                                    "layout_version", "error_code"])),
        batch_format="pyarrow")


SQL_PARSE_HEADER_FALLBACK = f"""
SELECT doc_id,
  CASE WHEN n_tok>=4 THEN tokens[1]::BIGINT END AS msg_type,
  CASE WHEN n_tok>=4 THEN tokens[2]::BIGINT END AS version,
  CASE WHEN n_tok>=4 THEN {_sql_layout_version()} END AS layout_version,
  ({_sql_error_case(version_fallback=True)})::BIGINT AS error_code
FROM {SEQ_SQL}
"""


def q_dead_letter_stats(sf_dir: str):
    ds = stages.parse_stage(_seq_ds(sf_dir))
    ds = ds.map_batches(lambda t: t.filter(pc.not_equal(t["error_code"], 0)),
                        batch_format="pyarrow")
    from ray.data.aggregate import Count
    out = ds.groupby("error_code").aggregate(Count(alias_name="n_rows"))
    return _finalize(out)


SQL_DEAD_LETTER = f"""
SELECT error_code, count(*)::BIGINT AS n_rows FROM (
  SELECT ({_sql_error_case()})::BIGINT AS error_code FROM {SEQ_SQL}
) WHERE error_code <> 0 GROUP BY error_code
"""


def q_route_counts(sf_dir: str):
    ds = stages.ok_only(stages.parse_stage(_seq_ds(sf_dir)))
    from ray.data.aggregate import Count
    agg = ds.groupby("msg_type").aggregate(Count(alias_name="n_rows"))
    df = agg.to_pandas()  # tiny result
    df["sink"] = df["msg_type"].map(lambda m: f"0x{m:04X}")
    df["n_rows"] = df["n_rows"].astype("int64")
    return df[["sink", "n_rows"]]


SQL_ROUTE_COUNTS = f"""
SELECT printf('0x%04X', tokens[1]) AS sink, count(*)::BIGINT AS n_rows
FROM {SEQ_SQL} WHERE ({_sql_error_case()}) = 0 GROUP BY 1
"""


def q_agg_source_msgtype(sf_dir: str):
    """The north-star A6 aggregate, native groupby path."""
    return _finalize(stages.aggregate_stage(stages.parse_stage(_seq_ds(sf_dir))))


SQL_AGG = f"""
SELECT source, tokens[1]::BIGINT AS msg_type, count(*)::BIGINT AS n_rows,
       sum(n_tok)::BIGINT AS sum_n_tok
FROM {SEQ_SQL} WHERE ({_sql_error_case()}) = 0 GROUP BY 1, 2
"""


def q_agg_enriched_site(sf_dir: str):
    import ray
    fix = fixtures.ensure_fixtures(fixtures.sf_of(sf_dir))
    meta_ref = ray.put(pq.read_table(os.path.join(fix, "source_meta.parquet")))
    ds = stages.enrich_stage(stages.ok_only(stages.parse_stage(_seq_ds(sf_dir))), meta_ref)
    from ray.data.aggregate import Count, Sum
    out = ds.groupby("site").aggregate(Count(alias_name="n_rows"),
                                       Sum("n_tok", alias_name="sum_n_tok"))
    return _finalize(out)


SQL_AGG_SITE = f"""
SELECT m.site AS site, count(*)::BIGINT AS n_rows, sum(s.n_tok)::BIGINT AS sum_n_tok
FROM {SEQ_SQL} s JOIN {META_SQL} m USING (source)
WHERE ({_sql_error_case()}) = 0 GROUP BY 1
"""


def q_enrich_rows(sf_dir: str):
    import ray
    fix = fixtures.ensure_fixtures(fixtures.sf_of(sf_dir))
    meta_ref = ray.put(pq.read_table(os.path.join(fix, "source_meta.parquet")))
    ds = stages.enrich_stage(stages.ok_only(stages.parse_stage(_seq_ds(sf_dir))), meta_ref)
    return ds.map_batches(
        lambda t: _to_i64(t.select(["doc_id", "source", "site", "hw_rev", "priority"])),
        batch_format="pyarrow")


SQL_ENRICH = f"""
SELECT doc_id, source, m.site, m.hw_rev, m.priority::BIGINT AS priority
FROM {SEQ_SQL} s JOIN {META_SQL} m USING (source)
WHERE ({_sql_error_case()}) = 0
"""


def _decode_query(mt: int, ver: int, spec):
    """Build a filter+decode query.  ``spec``: list of (out_name, builder)
    where builder(cols, env) -> pa.Array."""
    def run(sf_dir: str):
        dec = Decoder()
        layout = dec.compiled[(mt, ver)]

        def fn(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            view = BatchView(t["tokens"])
            cls = dec.classify(view)
            rows = np.flatnonzero((cls["error_code"] == ERR_OK)
                                  & (cls["msg_type"] == mt) & (cls["version"] == ver))
            out_cols = {"doc_id": t["doc_id"].take(pa.array(rows))}
            if rows.size:
                cols = dec.decode_group(view, rows, layout)
            else:
                cols = {}
            for out_name, builder in spec:
                out_cols[out_name] = builder(cols, rows)
            return _to_i64(pa.table(out_cols))

        return _seq_ds(sf_dir).map_batches(fn, batch_format="pyarrow")
    return run


def _col(name, patype=None):
    def b(cols, rows):
        if not rows.size:
            return pa.array([], type=patype or pa.int64())
        arr = cols[name]
        return pc.cast(arr, patype) if patype else arr
    return b


q_decode_heartbeat_v1 = _decode_query(0x2001, 1, [
    ("status", _col("Status")), ("uptime", _col("Uptime")),
    ("temp", _col("Temp")), ("load_pct", _col("Load Pct")),
])

SQL_DECODE_HEARTBEAT = f"""
SELECT doc_id, {_sql_field(0, 1)} AS status, {_sql_field(1, 4)} AS uptime,
       {_sql_field(5, 2, signed=True)} AS temp, {_sql_field(7, 1)} AS load_pct
FROM {SEQ_SQL} WHERE n_tok>=4 AND tokens[1]=8193 AND tokens[2]=1
"""

def q_decode_heartbeat_fallback(sf_dir: str):
    """Heartbeat rows decoded UNDER FALLBACK with the v1 layout: raw v1
    rows plus every unknown-version row (e.g. the corpus's v99 stratum),
    which the strict path dead-letters — the other half of the
    strict-vs-fallback gated pair (decode_heartbeat_v1 is strict)."""
    dec = Decoder(version_fallback=True)
    layout = dec.compiled[(0x2001, 1)]

    def fn(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        view = BatchView(t["tokens"])
        cls = dec.classify(view)
        rows = np.flatnonzero((cls["error_code"] == ERR_OK)
                              & (cls["msg_type"] == 0x2001)
                              & (cls["layout_version"] == 1))
        out_cols = {"doc_id": t["doc_id"].take(pa.array(rows)),
                    "version": pa.array(cls["version"][rows], type=pa.int64())}
        cols = dec.decode_group(view, rows, layout) if rows.size else {}
        for out_name, name in (("status", "Status"), ("uptime", "Uptime"),
                               ("temp", "Temp"), ("load_pct", "Load Pct")):
            out_cols[out_name] = cols[name] if rows.size else \
                pa.array([], type=pa.int64())
        return _to_i64(pa.table(out_cols))

    return _seq_ds(sf_dir).map_batches(fn, batch_format="pyarrow")


SQL_DECODE_HEARTBEAT_FALLBACK = f"""
SELECT doc_id, tokens[2]::BIGINT AS version,
       {_sql_field(0, 1)} AS status, {_sql_field(1, 4)} AS uptime,
       {_sql_field(5, 2, signed=True)} AS temp, {_sql_field(7, 1)} AS load_pct
FROM {SEQ_SQL} WHERE n_tok>=4 AND tokens[1]=8193 AND tokens[2]<>2
"""


q_decode_thermal = _decode_query(0x3A11, 1, [
    ("temp0", _col("Temp0")), ("temp1", _col("Temp1")),
    ("temp2", _col("Temp2")), ("temp3", _col("Temp3")),
    ("fan", _col("Fan")), ("throttle", _col("Throttle")),
    ("throttle_str", _col("Throttle (Decoded)", pa.string())),
])

_THROTTLE_RAW = _sql_uint("6", 1)
SQL_DECODE_THERMAL = f"""
SELECT doc_id,
  {_sql_field(0, 1, signed=True)} AS temp0, {_sql_field(1, 1, signed=True)} AS temp1,
  {_sql_field(2, 1, signed=True)} AS temp2, {_sql_field(3, 1, signed=True)} AS temp3,
  {_sql_field(4, 2)} AS fan, {_sql_field(6, 1)} AS throttle,
  CASE WHEN (n_tok-4)*4 >= 7 THEN
    CASE {_THROTTLE_RAW} WHEN 0 THEN 'NONE' WHEN 1 THEN 'LIGHT' WHEN 2 THEN 'HEAVY'
         WHEN 7 THEN 'EMERGENCY'
         ELSE 'UNKNOWN(' || {_THROTTLE_RAW}::VARCHAR || ')' END
  END AS throttle_str
FROM {SEQ_SQL} WHERE n_tok>=4 AND tokens[1]=14865 AND tokens[2]=1
"""


def _string_col(name):
    def b(cols, rows):
        if not rows.size:
            return pa.array([], type=pa.string())
        return cols[name]
    return b


q_decode_device_info = _decode_query(0x7F01, 1, [
    ("sensor_name", _string_col("Sensor Name")),
    ("reading", _col("Reading")), ("scale", _col("Scale")),
])


def _sql_cstring(off: int, nbytes: int) -> str:
    """Rebuild a fixed-window NUL-terminated ASCII string from payload
    bytes: stop at the first NUL or the payload end (the reference's
    decode_string clamp, utils/type_converters.py:126-135)."""
    expr = "''"
    for k in reversed(range(nbytes)):
        b = (f"(CASE WHEN (n_tok-4)*4 > ({off}+{k}) "
             f"THEN {_sql_byte(f'({off})+{k}')} ELSE 0 END)")
        expr = f"(CASE WHEN {b} = 0 THEN '' ELSE chr(({b})::INT) || {expr} END)"
    return expr


SQL_DECODE_DEVICE_INFO = f"""
SELECT doc_id, {_sql_cstring(0, 12)} AS sensor_name,
  {_sql_field(12, 2, signed=True)} AS reading, {_sql_field(14, 1)} AS scale
FROM {SEQ_SQL} WHERE n_tok>=4 AND tokens[1]=32513 AND tokens[2]=1
"""


def _bool_col(name):
    def b(cols, rows):
        if not rows.size:
            return pa.array([], type=pa.bool_())
        return cols[name]
    return b


q_decode_rf_bits = _decode_query(0x3A10, 1, [
    ("wideband_flag", _bool_col("Wideband Flag")),
    ("antenna_mask", _col("Antenna Mask")),
    ("pci", _col("PCI")), ("counter", _col("Counter")), ("frac", _col("Frac")),
])

SQL_DECODE_RF = f"""
SELECT doc_id,
  CASE WHEN (n_tok-4)*4 >= 17 THEN (({_sql_byte('16')} >> 3) & 1) = 1 END AS wideband_flag,
  CASE WHEN (n_tok-4)*4 >= 17 THEN ({_sql_byte('16')} >> 4) & 15 END AS antenna_mask,
  {_sql_field(17, 2)} AS pci, {_sql_field(19, 4)} AS counter,
  CASE WHEN (n_tok-4)*4 >= 36 THEN ({_sql_uint('32', 4)} >> 5) & {(1 << 27) - 1} END AS frac
FROM {SEQ_SQL} WHERE n_tok>=4 AND tokens[1]=14864 AND tokens[2]=1
"""


def q_decode_b888_records(sf_dir: str):
    """Dynamic-count record explode: child table keyed (doc_id, record_idx)
    — SURVEY M15/M16 with the min(logical, fits) clamp, as a flat Ray result
    the DuckDB oracle reproduces with generate_series + bit arithmetic."""
    dec = Decoder()
    layout = dec.compiled[(0xB888, 1)]

    def fn(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        view = BatchView(t["tokens"])
        cls = dec.classify(view)
        rows = np.flatnonzero((cls["error_code"] == ERR_OK)
                              & (cls["msg_type"] == 0xB888) & (cls["version"] == 1))
        if not rows.size:
            return pa.table({"doc_id": pa.array([], type=pa.string()),
                             "record_idx": pa.array([], type=pa.int64()),
                             "crc_pass": pa.array([], type=pa.int64()),
                             "crc_fail": pa.array([], type=pa.int64()),
                             "harq": pa.array([], type=pa.int64()),
                             "tb_size": pa.array([], type=pa.int64())})
        cols = dec.decode_group(view, rows, layout)
        recs = cols["Records"]
        offs = recs.offsets.to_numpy()
        counts = np.diff(offs)
        doc = t["doc_id"].take(pa.array(rows)).to_numpy(zero_copy_only=False)
        flat_doc = np.repeat(doc, counts)
        ridx = np.arange(len(recs.values), dtype=np.int64) - np.repeat(offs[:-1], counts)
        st = recs.values
        return _to_i64(pa.table({
            "doc_id": pa.array(flat_doc, type=pa.string()),
            "record_idx": pa.array(ridx),
            "crc_pass": st.field("Num CRC Pass TB"),
            "crc_fail": st.field("Num CRC Fail TB"),
            "harq": st.field("HARQ Failure"),
            "tb_size": st.field("TB Size"),
        }))

    return _seq_ds(sf_dir).map_batches(fn, batch_format="pyarrow")


_B = "17 + 14*record_idx"
SQL_B888_RECORDS = f"""
WITH seq AS (
  SELECT doc_id, tokens, n_tok FROM {SEQ_SQL}
  WHERE n_tok>=4 AND tokens[1]=47240 AND tokens[2]=1
), c AS (
  SELECT doc_id, tokens, n_tok,
         LEAST({_sql_uint('16', 1)}, GREATEST((n_tok-4)*4 - 17, 0)//14) AS cnt
  FROM seq WHERE (n_tok-4)*4 >= 17
), r AS (
  SELECT doc_id, tokens, unnest(range(cnt)) AS record_idx FROM c
)
SELECT doc_id, record_idx::BIGINT AS record_idx,
  {_sql_uint(f'({_B})+0', 2)}::BIGINT AS crc_pass,
  {_sql_uint(f'({_B})+2', 2)}::BIGINT AS crc_fail,
  {_sql_uint(f'({_B})+4', 2)}::BIGINT AS harq,
  {_sql_uint(f'({_B})+10', 4)}::BIGINT AS tb_size
FROM r
"""


# ---------------------------------------------------------------------------
# relational queries (driver testdata tables)
# ---------------------------------------------------------------------------

def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with integer-cent determinism.

    Combiner pattern (SURVEY 2.5): per-batch partials inside map_batches, so
    the exchange moves one row per (flag, status) per batch — at 100 TB the
    shuffle input is KBs, not the table."""
    ds = _table(sf_dir, "lineitem")

    def partial(t: pa.Table) -> pa.Table:
        qty = pc.cast(t["l_quantity"], pa.int64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64())
        g = pa.TableGroupBy(pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "qty": qty, "cents": cents}), ["l_returnflag", "l_linestatus"]) \
            .aggregate([("qty", "sum"), ("cents", "sum"), ("qty", "count")])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "l_linestatus": g["l_linestatus"],
                         "sum_qty": g["qty_sum"], "sum_price_cents": g["cents_sum"],
                         "n_rows": pc.cast(g["qty_count"], pa.int64())})

    from ray.data.aggregate import Sum
    out = ds.map_batches(partial, batch_format="pyarrow", batch_size=131072) \
            .groupby(["l_returnflag", "l_linestatus"]) \
            .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                       Sum("sum_price_cents", alias_name="sum_price_cents"),
                       Sum("n_rows", alias_name="n_rows"))
    return _finalize(out)


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus, sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT))::BIGINT AS sum_price_cents,
       count(*)::BIGINT AS n_rows
FROM lineitem GROUP BY 1, 2
"""


def q_top10_orders(sf_dir: str):
    ds = _table(sf_dir, "orders")
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)

    def fin(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64())
        return pa.table({"o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                         "total_cents": cents})
    return out.map_batches(fin, batch_format="pyarrow")


SQL_TOP10_ORDERS = """
SELECT o_orderkey::BIGINT AS o_orderkey,
       CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT) AS total_cents
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_customers_per_region(sf_dir: str):
    """Broadcast join: tiny nation+region dims resolved driver-side, joined
    inside map_batches (SURVEY J-pattern: broadcast small side, no shuffle)."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nmap = {nk: rmap[rk] for nk, rk in zip(nation["n_nationkey"].to_pylist(),
                                           nation["n_regionkey"].to_pylist())}
    ds = _table(sf_dir, "customer")

    def add_region(t: pa.Table) -> pa.Table:
        import pandas as pd
        reg = pd.Series(t["c_nationkey"].to_pandas()).map(nmap)
        return pa.table({"region_name": pa.array(reg, type=pa.string())})

    from ray.data.aggregate import Count
    out = ds.map_batches(add_region, batch_format="pyarrow") \
            .groupby("region_name").aggregate(Count(alias_name="n_cust"))
    return _finalize(out)


SQL_CUSTOMERS_PER_REGION = """
SELECT r.r_name AS region_name, count(*)::BIGINT AS n_cust
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY 1
"""


def q_events_by_type_hour(sf_dir: str):
    ds = _table(sf_dir, "events")

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "event_type": t["event_type"],
            "hour": pc.cast(pc.hour(t["ts"]), pa.int64()),
            "value_milli": pc.cast(pc.floor(pc.multiply(t["value"], 1000.0)), pa.int64()),
        }), ["event_type", "hour"]).aggregate([("value_milli", "sum"),
                                               ("value_milli", "count")])
        return pa.table({"event_type": g["event_type"], "hour": g["hour"],
                         "n_events": pc.cast(g["value_milli_count"], pa.int64()),
                         "sum_value_milli": g["value_milli_sum"]})

    from ray.data.aggregate import Sum
    out = ds.map_batches(partial, batch_format="pyarrow", batch_size=131072) \
            .groupby(["event_type", "hour"]) \
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_value_milli", alias_name="sum_value_milli"))
    return _finalize(out)


SQL_EVENTS_BY_TYPE_HOUR = """
SELECT event_type, date_part('hour', ts)::BIGINT AS hour,
       count(*)::BIGINT AS n_events,
       sum(CAST(floor(value*1000.0) AS BIGINT))::BIGINT AS sum_value_milli
FROM events GROUP BY 1, 2
"""


def _rev_cents(t: pa.Table) -> pa.Table:
    rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
    cents = pc.cast(pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)), pa.int64())
    return pa.table({"key": pc.cast(t["l_orderkey"], pa.int64()),
                     "revenue_cents": cents})


def q_order_revenue_native_join(sf_dir: str):
    """Both-sides-large join, native path: ``Dataset.join`` (hash-partitioned
    on the key), then combiner aggregate by order priority."""
    li = _table(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(_rev_cents, batch_format="pyarrow")
    od = _table(sf_dir, "orders").select_columns(["o_orderkey", "o_orderpriority"])
    joined = li.join(od, join_type="inner", num_partitions=8,
                     on=("key",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["o_orderpriority", "revenue_cents"]),
                            "o_orderpriority").aggregate(
            [("revenue_cents", "sum"), ("revenue_cents", "count")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "revenue_cents": g["revenue_cents_sum"],
                         "n_items": pc.cast(g["revenue_cents_count"], pa.int64())})

    from ray.data.aggregate import Sum
    out = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                   Sum("n_items", alias_name="n_items"))
    return _finalize(out)


def q_order_revenue_bucketed_join(sf_dir: str, buckets: int = 8):
    """Both-sides-large join, explicit portable pattern (ray_guide): add
    ``bucket = key % B`` to both sides, union with a side tag, group by
    bucket and hash-join each bucket locally in ``map_groups``.

    Partitioning assumption: co-location by ``key % B``; B=8 here.  A hot
    key would be salted into sub-buckets on the probe side (the fact side
    streams; only the build side must fit a bucket in memory)."""
    import pandas as pd

    def li_prep(t: pa.Table) -> pa.Table:
        r = _rev_cents(t)
        return pa.table({"bucket": pc.cast(pc.bit_wise_and(r["key"], buckets - 1), pa.int32()),
                         "key": r["key"], "side": pa.array(np.zeros(len(r), dtype=np.int8)),
                         "revenue_cents": r["revenue_cents"],
                         "priority": pa.nulls(len(r), pa.string())})

    def od_prep(t: pa.Table) -> pa.Table:
        key = pc.cast(t["o_orderkey"], pa.int64())
        n = t.num_rows
        return pa.table({"bucket": pc.cast(pc.bit_wise_and(key, buckets - 1), pa.int32()),
                         "key": key, "side": pa.array(np.ones(n, dtype=np.int8)),
                         "revenue_cents": pa.nulls(n, pa.int64()),
                         "priority": t["o_orderpriority"]})

    li = _table(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow")
    od = _table(sf_dir, "orders") \
        .select_columns(["o_orderkey", "o_orderpriority"]) \
        .map_batches(od_prep, batch_format="pyarrow")

    def join_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        build = g[g["side"] == 1][["key", "priority"]]
        probe = g[g["side"] == 0][["key", "revenue_cents"]]
        m = probe.merge(build, on="key", how="inner")
        # the unioned nullable int64 column arrives as pandas float64 —
        # restore exact int64 before summing
        m["revenue_cents"] = m["revenue_cents"].astype("int64")
        out = m.groupby("priority", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_items=("revenue_cents", "count"))
        out["n_items"] = out["n_items"].astype("int64")
        return out.rename(columns={"priority": "o_orderpriority"})

    from ray.data.aggregate import Sum
    out = li.union(od).groupby("bucket").map_groups(join_bucket, batch_format="pandas") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                   Sum("n_items", alias_name="n_items"))
    return _finalize(out)


#: observability for the skew tests: how the last skew join split the work
LAST_SKEW_JOIN = {"hot_keys": 0, "hot_rows": 0, "cold_rows": 0}


def q_order_revenue_skew_join(sf_dir: str):
    """Both-sides-large join, SKEW-AWARE path: identical output to
    ``q_order_revenue_native_join`` (same SQL oracle), but hot join keys
    never enter the exchange.

    1. A Misra-Gries pass over the probe side's key column (one <= 64-row
       summary per batch — ``sketch.mg_compress`` reuse) nominates hot
       keys: folded estimate above ``max(1024, rows // 1024)``.  MG's
       undercount bound means a truly dominant key cannot hide; a false
       nomination merely moves a small key to the (exact) map-side path.
    2. The build side's rows for hot keys — one row per key, orders keys
       are unique — broadcast once; hot probe rows join MAP-SIDE via one
       searchsorted per batch and collapse to per-batch (priority, sum,
       count) partials.  The hot key's row flood never crosses the wire.
    3. Cold rows take the ordinary hash-partitioned ``Dataset.join``.

    On uniform corpora the hot set is empty and the plan degenerates to
    the native join (gate fixtures take that path); the planted-hot-key
    equality + observability test lives in tests/test_skew.py."""
    import ray

    from engine.pipeline import collect_tables
    from engine.sketch import mg_compress

    li_cols = ["l_orderkey", "l_extendedprice", "l_discount"]

    def mg_partial(t: pa.Table) -> pa.Table:
        keys = pc.cast(t["l_orderkey"], pa.int64())
        vc = pc.value_counts(keys)
        k = vc.field("values").to_numpy(zero_copy_only=False)
        c = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        k, c = mg_compress(k, c, 64)
        return pa.table({"key": pa.array(k), "cnt": pa.array(c)})

    parts = [b for b in collect_tables(
        _table(sf_dir, "lineitem").select_columns(["l_orderkey"])
        .map_batches(mg_partial, batch_format="pyarrow", batch_size=None))
        if b.num_columns]
    total = pq.read_metadata(
        os.path.join(sf_dir, "lineitem.parquet")).num_rows
    if parts:
        folded = pa.concat_tables(parts)
        g = pa.TableGroupBy(folded.select(["key", "cnt"]), ["key"]) \
            .aggregate([("cnt", "sum")])
        thresh = max(1024, total // 1024)
        hot = g.filter(pc.greater_equal(g["cnt_sum"], pa.scalar(thresh)))
        hot_keys = np.sort(hot["key"].to_numpy(zero_copy_only=False))
    else:
        hot_keys = np.zeros(0, dtype=np.int64)
    LAST_SKEW_JOIN["hot_keys"] = int(len(hot_keys))

    from ray.data.aggregate import Sum

    if len(hot_keys) == 0:
        LAST_SKEW_JOIN["hot_rows"] = 0
        LAST_SKEW_JOIN["cold_rows"] = -1      # not tracked on this path
        return q_order_revenue_native_join(sf_dir)

    hot_set = pa.array(hot_keys, pa.int64())

    # build side for hot keys: one row per key (orders keys are unique)
    def od_hot(t: pa.Table) -> pa.Table:
        keys = pc.cast(t["o_orderkey"], pa.int64())
        kept = t.filter(pc.is_in(keys, value_set=hot_set))
        return pa.table({"key": pc.cast(kept["o_orderkey"], pa.int64()),
                         "priority": kept["o_orderpriority"]})

    bt = [b for b in collect_tables(
        _table(sf_dir, "orders")
        .select_columns(["o_orderkey", "o_orderpriority"])
        .map_batches(od_hot, batch_format="pyarrow")) if b.num_columns]
    build = pa.concat_tables(bt) if bt else \
        pa.table({"key": pa.array([], pa.int64()),
                  "priority": pa.array([], pa.string())})
    bk = build["key"].to_numpy(zero_copy_only=False)
    order = np.argsort(bk)
    bk = bk[order]
    bprio = build["priority"].to_numpy(zero_copy_only=False)[order]
    build_ref = ray.put((bk, bprio))

    def li_hot_partial(t: pa.Table) -> pa.Table:
        r = _rev_cents(t)
        m = pc.is_in(r["key"], value_set=hot_set)
        kept = r.filter(m)
        n = kept.num_rows
        if n == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "revenue_cents": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64()),
                             "hot_rows": pa.array([], pa.int64())})
        keys, prio_k = ray.get(build_ref)
        kk = kept["key"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, kk)
        ok = (idx < len(keys))
        idx = np.minimum(idx, max(len(keys) - 1, 0))
        ok &= (keys[idx] == kk) if len(keys) else False
        kept = kept.filter(pa.array(ok))          # inner-join semantics
        if kept.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "revenue_cents": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64()),
                             "hot_rows": pa.array([], pa.int64())})
        prio = prio_k[idx[ok]]
        g = pa.TableGroupBy(pa.table({
            "o_orderpriority": pa.array(prio),
            "revenue_cents": kept["revenue_cents"]}), ["o_orderpriority"]) \
            .aggregate([("revenue_cents", "sum"),
                        ("revenue_cents", "count")])
        m_ = len(g)
        hr = np.zeros(m_, dtype=np.int64)
        hr[0] = kept.num_rows
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "revenue_cents": pc.cast(g["revenue_cents_sum"],
                                                  pa.int64()),
                         "n_items": pc.cast(g["revenue_cents_count"],
                                            pa.int64()),
                         "hot_rows": pa.array(hr)})

    ht = [b for b in collect_tables(
        _table(sf_dir, "lineitem").select_columns(li_cols)
        .map_batches(li_hot_partial, batch_format="pyarrow",
                     batch_size=None)) if b.num_columns]
    hot_tab = pa.concat_tables(ht) if ht else None
    LAST_SKEW_JOIN["hot_rows"] = \
        int(pc.sum(hot_tab["hot_rows"]).as_py() or 0) if hot_tab is not None \
        and hot_tab.num_rows else 0

    # cold tail: the ordinary hash-partitioned native join
    def li_cold(t: pa.Table) -> pa.Table:
        r = _rev_cents(t)
        return r.filter(pc.invert(pc.is_in(r["key"], value_set=hot_set)))

    def od_cold(t: pa.Table) -> pa.Table:
        keys = pc.cast(t["o_orderkey"], pa.int64())
        return t.filter(pc.invert(pc.is_in(keys, value_set=hot_set)))

    li = _table(sf_dir, "lineitem").select_columns(li_cols) \
        .map_batches(li_cold, batch_format="pyarrow")
    od = _table(sf_dir, "orders") \
        .select_columns(["o_orderkey", "o_orderpriority"]) \
        .map_batches(od_cold, batch_format="pyarrow")
    joined = li.join(od, join_type="inner", num_partitions=8,
                     on=("key",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["o_orderpriority", "revenue_cents"]),
                            "o_orderpriority").aggregate(
            [("revenue_cents", "sum"), ("revenue_cents", "count")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "revenue_cents": g["revenue_cents_sum"],
                         "n_items": pc.cast(g["revenue_cents_count"],
                                            pa.int64())})

    cold = [b for b in collect_tables(
        joined.map_batches(partial, batch_format="pyarrow"))
        if b.num_columns]
    LAST_SKEW_JOIN["cold_rows"] = int(sum(
        pc.sum(b["n_items"]).as_py() or 0 for b in cold))
    tabs = cold + ([hot_tab.select(
        ["o_orderpriority", "revenue_cents", "n_items"])]
        if hot_tab is not None and hot_tab.num_rows else [])
    if not tabs:
        return pa.table({"o_orderpriority": pa.array([], pa.string()),
                         "revenue_cents": pa.array([], pa.int64()),
                         "n_items": pa.array([], pa.int64())})
    allp = pa.concat_tables(tabs)
    g = pa.TableGroupBy(allp, ["o_orderpriority"]).aggregate(
        [("revenue_cents", "sum"), ("n_items", "sum")])
    out = pa.table({"o_orderpriority": g["o_orderpriority"],
                    "revenue_cents": pc.cast(g["revenue_cents_sum"],
                                             pa.int64()),
                    "n_items": pc.cast(g["n_items_sum"], pa.int64())})
    idx = pc.sort_indices(out, sort_keys=[("o_orderpriority", "ascending")])
    return out.take(idx)


SQL_ORDER_REVENUE = """
SELECT o.o_orderpriority AS o_orderpriority,
       sum(CAST(floor(l.l_extendedprice*(1.0 - l.l_discount)*100.0 + 0.5) AS BIGINT))::BIGINT AS revenue_cents,
       count(*)::BIGINT AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


def q_user_sessions(sf_dir: str):
    """Session windowing over the events log (SURVEY 2.9 streaming-shape):
    partition by user, sort by ts within the user, break sessions on
    >30-minute gaps; the SQL oracle is the standard lag()-gap formulation.

    Scale shape: a hash-keyed exchange co-locates each user's events, then
    ONE vectorized pass per partition (lexsort + boundary masks +
    ``np.add.reduceat``) sessionizes every user in the block — the
    ``groupby(user).map_groups(per_user)`` form costs one Python call per
    USER, ruinous at real user cardinalities.  Only within-user order
    matters, and it is established inside the partition."""
    import ray
    from engine.stages import hash_group_exchange

    def sessionize(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.schema([("user_id", pa.int64()),
                              ("n_sessions", pa.int64()),
                              ("n_events", pa.int64())]).empty_table()
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)   # datetime64
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_u = np.empty(n, dtype=bool)
        new_u[0] = True
        new_u[1:] = uid[1:] != uid[:-1]
        brk = new_u.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > np.timedelta64(30, "m")
        starts = np.flatnonzero(new_u)
        return pa.table({
            "user_id": pa.array(uid[starts], type=pa.int64()),
            "n_sessions": pa.array(
                np.add.reduceat(brk.astype(np.int64), starts)),
            "n_events": pa.array(np.diff(np.append(starts, n))),
        })

    _ = ray  # noqa: F841
    n_events = pq.read_metadata(
        os.path.join(sf_dir, "events.parquet")).num_rows
    # collect=False: one row per user is still O(users) — stays a Dataset
    return hash_group_exchange(
        lambda: _table(sf_dir, "events").select_columns(["user_id", "ts"]),
        ["user_id"], sessionize, collect=False, rows_hint=n_events)


SQL_USER_SESSIONS = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
)
SELECT user_id::BIGINT AS user_id, sum(brk)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events
FROM d GROUP BY 1
"""


def q_distinct_source_lang(sf_dir: str):
    ds = _table(sf_dir, "documents").select_columns(["source", "lang"])
    from ray.data.aggregate import Count
    out = ds.groupby(["source", "lang"]).aggregate(Count(alias_name="_n"))
    return out.map_batches(lambda t: t.select(["source", "lang"]),
                           batch_format="pyarrow")


SQL_DISTINCT_SOURCE_LANG = "SELECT DISTINCT source, lang FROM documents"


SQL_REVISION_LOGCODE_JOIN = f"""
SELECT r.revision, r.date, r.logcode, r.status,
       l.logcode_name, l.n_versions::BIGINT AS n_versions
FROM read_parquet('{FIX01}/revisions.parquet') r
JOIN read_parquet('{FIX01}/logcodes.parquet') l USING (logcode)
"""

SQL_AGG_ROWS_BY_REVISION = f"""
SELECT r.revision, r.status, count(*)::BIGINT AS n_rows,
       sum(s.n_tok)::BIGINT AS sum_n_tok
FROM {SEQ_SQL} s
JOIN read_parquet('{FIX01}/revisions.parquet') r
  ON printf('0x%04X', s.tokens[1]) = r.logcode
WHERE ({_sql_error_case()}) = 0
GROUP BY 1, 2
"""

from engine import streaming as _streaming  # noqa: E402  (after helpers)
from engine.revisions import (  # noqa: E402
    q_agg_rows_by_revision, q_revision_logcode_join,
)

QUERIES = {
    "parse_header": q_parse_header,
    "parse_header_fallback": q_parse_header_fallback,
    "dead_letter_stats": q_dead_letter_stats,
    "route_counts": q_route_counts,
    "agg_source_msgtype": q_agg_source_msgtype,
    "agg_enriched_site": q_agg_enriched_site,
    "enrich_rows": q_enrich_rows,
    "decode_heartbeat_v1": q_decode_heartbeat_v1,
    "decode_heartbeat_fallback": q_decode_heartbeat_fallback,
    "decode_thermal": q_decode_thermal,
    "decode_rf_bits": q_decode_rf_bits,
    "decode_b888_records": q_decode_b888_records,
    "decode_device_info": q_decode_device_info,
    "lineitem_agg": q_lineitem_agg,
    "top10_orders": q_top10_orders,
    "customers_per_region": q_customers_per_region,
    "events_by_type_hour": q_events_by_type_hour,
    "user_sessions": q_user_sessions,
    "tumbling_window_actors": _streaming.tumbling_window_counts,
    "order_revenue_native_join": q_order_revenue_native_join,
    "order_revenue_bucketed_join": q_order_revenue_bucketed_join,
    "order_revenue_skew_join": q_order_revenue_skew_join,
    "distinct_source_lang": q_distinct_source_lang,
    "revision_logcode_join": q_revision_logcode_join,
    "agg_rows_by_revision": q_agg_rows_by_revision,
}

ORACLE_SQL = {
    "parse_header": SQL_PARSE_HEADER,
    "parse_header_fallback": SQL_PARSE_HEADER_FALLBACK,
    "dead_letter_stats": SQL_DEAD_LETTER,
    "route_counts": SQL_ROUTE_COUNTS,
    "agg_source_msgtype": SQL_AGG,
    "agg_enriched_site": SQL_AGG_SITE,
    "enrich_rows": SQL_ENRICH,
    "decode_heartbeat_v1": SQL_DECODE_HEARTBEAT,
    "decode_heartbeat_fallback": SQL_DECODE_HEARTBEAT_FALLBACK,
    "decode_thermal": SQL_DECODE_THERMAL,
    "decode_rf_bits": SQL_DECODE_RF,
    "decode_b888_records": SQL_B888_RECORDS,
    "decode_device_info": SQL_DECODE_DEVICE_INFO,
    "lineitem_agg": SQL_LINEITEM_AGG,
    "top10_orders": SQL_TOP10_ORDERS,
    "customers_per_region": SQL_CUSTOMERS_PER_REGION,
    "events_by_type_hour": SQL_EVENTS_BY_TYPE_HOUR,
    "user_sessions": SQL_USER_SESSIONS,
    "tumbling_window_actors": _streaming.SQL_TUMBLING_WINDOW,
    "order_revenue_native_join": SQL_ORDER_REVENUE,
    "order_revenue_bucketed_join": SQL_ORDER_REVENUE,
    "order_revenue_skew_join": SQL_ORDER_REVENUE,
    "distinct_source_lang": SQL_DISTINCT_SOURCE_LANG,
    "revision_logcode_join": SQL_REVISION_LOGCODE_JOIN,
    "agg_rows_by_revision": SQL_AGG_ROWS_BY_REVISION,
}
