"""Sketch and corpus-profiling operators: KMV distinct-count sketch,
histogram-exact token-length quantiles, stratified deterministic sampling.

All three are DuckDB-gated — the sketches are built on md5 (the digest the
oracle shares) and integer arithmetic, so even the *approximate* KMV
estimate is bit-reproducible in SQL.  Shapes:

* ``q_kmv_distinct`` — per-batch partial k-minimum-values; the driver
  merges <= k hashes per block (a few KB total at any scale).  No shuffle.
* ``q_token_quantiles`` — per-batch (lang, n_tokens) histogram partials,
  one small-key groupby fold, quantiles read off the cumulative histogram.
  The classic distributed-quantile trick: token counts are bounded, so the
  histogram stays tiny while the doc table never sorts.
* ``q_stratified_sample`` — per-batch per-stratum top-k by md5 order; the
  driver folds k x strata x blocks rows.  No shuffle, deterministic under
  any block order, and stable under corpus growth (a doc's hash rank only
  improves when docs are removed).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.io import read_parquet_clean
from engine.pipeline import collect_tables


def _md5_60(vals) -> np.ndarray:
    """First 60 md5 bits of str(v) as positive int64 — matches the oracle's
    ('0x' || substr(md5(v::VARCHAR), 1, 15))::BIGINT.

    Inputs must be non-null: str(None) would hash to md5('None') while the
    oracle's md5(NULL) is NULL — fail loudly instead (advisor r3)."""
    assert not any(v is None for v in vals), \
        "_md5_60: null ids diverge from the SQL oracle (md5(NULL) IS NULL)"
    return np.array([int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                     for v in vals], dtype=np.int64)


# ---------------------------------------------------------------------------
# KMV distinct-count sketch (gated)
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_SPACE = 1 << 60   # hash space size for the 60-bit md5 prefix


def q_kmv_distinct(sf_dir: str):
    """Approximate distinct ``user_id`` count over events via the
    k-minimum-values sketch: keep the k smallest distinct 60-bit md5
    hashes; estimate = (k-1) * space / kth_smallest.  Each batch emits its
    own k-min set (one row per hash, <= k rows); the driver merge is exact
    because the global k smallest distinct hashes are a subset of the
    union of per-block k-min sets.  Deterministic, so the SQL oracle
    reproduces the ESTIMATE itself, not just the exact count."""
    def partial(t: pa.Table) -> pa.Table:
        u = np.unique(pc.cast(t["user_id"], pa.int64())
                      .to_numpy(zero_copy_only=False))
        hv = np.unique(_md5_60(u))
        return pa.table({"h": pa.array(hv[:_KMV_K])})

    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    tabs = [b for b in collect_tables(ds) if b.num_columns]
    merged = np.unique(np.concatenate(
        [t["h"].to_numpy(zero_copy_only=False) for t in tabs])) \
        if tabs else np.zeros(0, dtype=np.int64)
    kmin = merged[:_KMV_K]
    n_kmin = len(kmin)
    if n_kmin < _KMV_K:
        est = n_kmin                      # saw every distinct hash
        kth = int(kmin[-1]) if n_kmin else 0
    else:
        kth = int(kmin[-1])
        est = (_KMV_K - 1) * _KMV_SPACE // kth   # exact integer, oracle-safe
    return pa.table({
        "k_used": pa.array([n_kmin], type=pa.int64()),
        "kth_hash": pa.array([kth], type=pa.int64()),
        "est_distinct": pa.array([est], type=pa.int64()),
    })


_KMV_SPACE_FAST = 1 << 63   # splitmix64 top bit dropped -> positive int64


def q_kmv_distinct_fast(sf_dir: str):
    """Rows-only fast twin of :func:`q_kmv_distinct`: one vectorized
    splitmix64 over the int64 user_id column replaces the per-row Python
    md5.  A different hash is a different (equally valid) KMV draw, so
    the ESTIMATE differs within the k=256 error envelope and there is no
    SQL oracle; tests/test_fast_hash.py pins determinism and the
    relative-error bound against the exact distinct count instead."""
    from engine.dedup import _mix64

    def partial(t: pa.Table) -> pa.Table:
        u = np.unique(pc.cast(t["user_id"], pa.int64())
                      .to_numpy(zero_copy_only=False))
        hv = np.unique((_mix64(u.view(np.uint64))
                        >> np.uint64(1)).view(np.int64))
        return pa.table({"h": pa.array(hv[:_KMV_K])})

    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    tabs = [b for b in collect_tables(ds) if b.num_columns]
    merged = np.unique(np.concatenate(
        [t["h"].to_numpy(zero_copy_only=False) for t in tabs])) \
        if tabs else np.zeros(0, dtype=np.int64)
    kmin = merged[:_KMV_K]
    n_kmin = len(kmin)
    if n_kmin < _KMV_K:
        est = n_kmin
        kth = int(kmin[-1]) if n_kmin else 0
    else:
        kth = int(kmin[-1])
        est = (_KMV_K - 1) * _KMV_SPACE_FAST // kth
    return pa.table({
        "k_used": pa.array([n_kmin], type=pa.int64()),
        "kth_hash": pa.array([kth], type=pa.int64()),
        "est_distinct": pa.array([est], type=pa.int64()),
    })


SQL_KMV_DISTINCT = f"""
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM events
), k AS (
  SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}
), s AS (
  SELECT count(*)::BIGINT AS k_used, coalesce(max(hv), 0)::BIGINT AS kth FROM k
)
SELECT k_used, kth AS kth_hash,
       CASE WHEN k_used < {_KMV_K} THEN k_used
            ELSE (({_KMV_K - 1}::HUGEINT * {_KMV_SPACE}::HUGEINT)
                  // kth::HUGEINT)::BIGINT
       END::BIGINT AS est_distinct
FROM s
"""


# ---------------------------------------------------------------------------
# histogram-exact token-length quantiles per language (gated)
# ---------------------------------------------------------------------------

_QUANTS = ((50, "p50"), (90, "p90"), (99, "p99"))


def q_token_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of per-doc whitespace-token counts, per language,
    without sorting the documents: per-batch (lang, n_tokens) histogram
    partials fold through one small groupby; the driver reads quantiles
    off the cumulative histogram.  Rank definition (both sides): the
    value at 1-indexed position ceil(q*n/100) of the sorted counts."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        nt = pc.count_substring_regex(pc.fill_null(txt, ""), r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "lang": t["lang"], "nt": pa.array(nt)}), ["lang", "nt"]) \
            .aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "nt": g["nt"],
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    folded = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                                columns=["lang", "text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby(["lang", "nt"]).aggregate(Sum("cnt", alias_name="cnt"))
    tabs = [b for b in collect_tables(folded) if b.num_columns]
    if not tabs:
        return pa.table({"lang": pa.array([], type=pa.string()),
                         "n_docs": pa.array([], type=pa.int64()),
                         **{nm: pa.array([], type=pa.int64())
                            for _, nm in _QUANTS}})
    df = pa.concat_tables(tabs).to_pandas() \
        .sort_values(["lang", "nt"], ignore_index=True)
    rows = []
    # dropna=False: pandas' default silently drops a NULL-lang group while
    # the oracle's GROUP BY lang keeps it (advisor r3) — fixtures are
    # non-null today, but a nullable lang must not flip the gate silently
    for lang, gdf in df.groupby("lang", sort=True, dropna=False):
        nt = gdf["nt"].to_numpy()
        cum = gdf["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        out = {"lang": lang, "n_docs": n}
        for q, nm in _QUANTS:
            rank = max(1, (q * n + 99) // 100)    # ceil(q*n/100), 1-indexed
            out[nm] = int(nt[np.searchsorted(cum, rank)])
        rows.append(out)
    out = pd.DataFrame(rows)
    return pa.table({
        "lang": pa.array(out["lang"], type=pa.string()),
        "n_docs": pa.array(out["n_docs"].astype(np.int64)),
        **{nm: pa.array(out[nm].astype(np.int64)) for _, nm in _QUANTS},
    })


SQL_TOKEN_QUANTILES = r"""
WITH n AS (
  SELECT lang,
         len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS nt
  FROM documents
), r AS (
  SELECT lang, nt,
         row_number() OVER (PARTITION BY lang ORDER BY nt) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM n
)
SELECT lang, max(n)::BIGINT AS n_docs,
       max(CASE WHEN rn = greatest(1, (50 * n + 99) // 100) THEN nt END)::BIGINT AS p50,
       max(CASE WHEN rn = greatest(1, (90 * n + 99) // 100) THEN nt END)::BIGINT AS p90,
       max(CASE WHEN rn = greatest(1, (99 * n + 99) // 100) THEN nt END)::BIGINT AS p99
FROM r GROUP BY lang
"""


# ---------------------------------------------------------------------------
# stratified deterministic sampling (gated)
# ---------------------------------------------------------------------------

_SAMPLE_K = 20


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language sample: the k docs with the smallest
    md5(doc_id) hashes in each language — a reproducible eval/holdout draw
    that is stable under re-partitioning and (unlike random_shuffle) needs
    no shuffle: each batch keeps its own per-lang top-k, the driver folds
    k x langs x blocks candidate rows."""
    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        hv = _md5_60(ids)
        df = pd.DataFrame({"doc_id": ids, "lang": t["lang"].to_pylist(),
                           "hv": hv})
        df = df.sort_values(["lang", "hv", "doc_id"]) \
            .groupby("lang", sort=False).head(_SAMPLE_K)
        return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy()),
                         "lang": pa.array(df["lang"], type=pa.string()),
                         "hv": pa.array(df["hv"].to_numpy())})

    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "lang"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    tabs = [b for b in collect_tables(ds) if b.num_columns]
    if not tabs:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "lang": pa.array([], type=pa.string()),
                         "hv": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    df = pa.concat_tables(tabs).to_pandas() \
        .sort_values(["lang", "hv", "doc_id"], ignore_index=True)
    df["rank"] = df.groupby("lang").cumcount() + 1
    df = df[df["rank"] <= _SAMPLE_K]
    return pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy()),
        "lang": pa.array(df["lang"], type=pa.string()),
        "hv": pa.array(df["hv"].to_numpy()),
        "rank": pa.array(df["rank"].to_numpy().astype(np.int64)),
    })


SQL_STRATIFIED_SAMPLE = f"""
WITH h AS (
  SELECT doc_id::BIGINT AS doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM documents
)
SELECT doc_id, lang, hv,
       row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)::BIGINT
         AS rank
FROM h
QUALIFY rank <= {_SAMPLE_K}
"""
