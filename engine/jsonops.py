"""Data-plane JSON field projection over the events ``props`` column.

The reference projects decoded records into nested JSON on the OUTPUT
side (src/json_exporter.py — engine/export.py here); this module adds the
INPUT direction a log pipeline needs: extracting typed fields from a JSON
string column at scan time.  Ray-Data-first shape: one column-pruned
read, one vectorized ``map_batches`` pass, a tiny combiner fold — the
props strings never ride an exchange and never reach the driver.

Extraction is RE2 (``pc.extract_regex``) rather than a JSON parser, for
two reasons that hold at 100 TB:

* it is the only fully-vectorized path in this Arrow build (a JSON
  parser means a Python loop per row), and
* it degrades per-ROW: a malformed document yields a NULL field, while
  DuckDB's ``json_extract`` aborts the whole query on the first bad
  byte.  The oracle therefore mirrors the ENGINE's semantics with
  ``regexp_extract`` + ``TRY_CAST`` — byte-identical by construction,
  and an honest statement of what the operator does: single-level
  numeric field projection.  (Nested/quoted JSON needs a real parser;
  that variant would be an actor-pool stage, not a kernel swap.)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.io import read_parquet_clean
from engine.pipeline import collect_tables

#: RE2 on both sides: a top-level integer field ``"k": <int>``
_K_PATTERN = r'"k":\s*(?P<k>-?\d+)'


def extract_k(props) -> pa.Array:
    """props strings -> int64 ``k`` values (NULL where absent/malformed).
    Module-level for tests."""
    if isinstance(props, pa.ChunkedArray):
        props = props.combine_chunks()
    hit = pc.extract_regex(pc.fill_null(props, ""), pattern=_K_PATTERN)
    k = pc.struct_field(hit, "k")
    # non-matches are struct-level nulls; the child holds "" — mask first
    return pc.cast(pc.if_else(pc.is_valid(hit), k, None), pa.int64())


def q_props_json_stats(sf_dir: str):
    """Per event_type stats of the JSON ``props.k`` field: row count,
    extracted count, sum and max.  Pure map of <=|types| partial rows per
    batch; driver folds sums and maxes per type (O(types x batches),
    native-groupby swap as in :func:`engine.stages.pre_aggregated`)."""

    def partial(t: pa.Table) -> pa.Table:
        k = extract_k(t["props"])
        g = pa.TableGroupBy(
            pa.table({"event_type": t["event_type"], "k": k}),
            ["event_type"]).aggregate(
                [([], "count_all"), ("k", "count"), ("k", "sum"),
                 ("k", "max")])
        return pa.table({
            "event_type": g["event_type"],
            "n": pc.cast(g["count_all"], pa.int64()),
            "n_k": pc.cast(g["k_count"], pa.int64()),
            "sum_k": pc.cast(pc.fill_null(g["k_sum"], 0), pa.int64()),
            "max_k": pc.cast(g["k_max"], pa.int64())})

    parts = [b for b in collect_tables(
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None))
        if b.num_columns]
    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64()),
                      "n_k": pa.array([], type=pa.int64()),
                      "sum_k": pa.array([], type=pa.int64()),
                      "max_k": pa.array([], type=pa.int64())})
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    g = pa.TableGroupBy(t, ["event_type"]).aggregate(
        [("n", "sum"), ("n_k", "sum"), ("sum_k", "sum"), ("max_k", "max")])
    out = pa.table({"event_type": g["event_type"],
                    "n": g["n_sum"], "n_k": g["n_k_sum"],
                    "sum_k": g["sum_k_sum"],
                    "max_k": g["max_k_max"]})
    return out.sort_by([("event_type", "ascending")])


SQL_PROPS_JSON_STATS = r"""
WITH e AS (
  SELECT event_type,
         TRY_CAST(nullif(regexp_extract(props, '"k":\s*(-?\d+)', 1), '')
                  AS BIGINT) AS k
  FROM events)
SELECT event_type, count(*)::BIGINT AS n, count(k)::BIGINT AS n_k,
       coalesce(sum(k), 0)::BIGINT AS sum_k, max(k)::BIGINT AS max_k
FROM e GROUP BY event_type ORDER BY event_type
"""
