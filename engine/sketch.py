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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters with exact verify (gated)
# ---------------------------------------------------------------------------

_MG_K = 512           # summary capacity per batch; MUST exceed _HH_DENOM
_HH_DENOM = 200       # heavy hitter = word with count >= total_words // 200
# the candidate prune only has teeth when slack n/(k+1) < threshold n/denom,
# i.e. k+1 > denom; it also bounds |candidates| <= 1/(1/denom - 1/(k+1))
assert _MG_K + 1 > _HH_DENOM


def mg_compress(words: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction: keep at most ``k`` entries, decrementing
    every count by the (k+1)-th largest so the survivors' counts are
    UNDER-estimates with per-summary error <= n_batch/(k+1).  Vectorized:
    one argsort, no per-item loop."""
    if len(words) <= k:
        return words, counts
    order = np.argsort(-counts, kind="stable")
    dec = counts[order[k]]                    # the (k+1)-th largest count
    keep = order[:k]
    kept_c = counts[keep] - dec
    m = kept_c > 0
    return words[keep][m], kept_c[m]


def q_heavy_hitters(sf_dir: str):
    """EXACT corpus heavy hitters (words with count >= total//_HH_DENOM)
    in two linear passes with Misra-Gries-bounded state.

    Pass 1: each batch computes exact in-batch word counts, compresses
    them to a <= ``_MG_K``-entry Misra-Gries summary (undercount <=
    n_batch/(k+1)) and emits it with the batch's token total — at most
    k+1 tiny rows per batch cross to the driver regardless of vocabulary
    size.  The driver folds summaries by word; MG's merge guarantee
    (total undercount <= total_words/(k+1)) means every TRUE heavy
    hitter survives the fold with
    folded_count >= true_count - total/(k+1), so the candidate filter
    ``folded + total//(k+1) >= threshold`` can never drop one (no false
    negatives; proven adversarially in tests).  Pass 2 broadcasts the
    <= k-word candidate list and counts ONLY those words exactly,
    discarding MG's false positives — the output is therefore exact and
    deterministic, equal to DuckDB's plain GROUP BY/HAVING at any block
    partitioning.  At 10^12 tokens the exchange volume is k rows per
    batch (pass 1) and |candidates| rows per batch (pass 2); the full
    (word, count) table never materializes anywhere."""
    from engine.text import _segment_sums, _split_tokens

    def summary(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, _ = _split_tokens(pc.utf8_lower(txt))
        # drop the zero-length artifact token empty docs produce
        flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
        n_b = len(flat)
        if n_b == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "n_tok": pa.array([], pa.int64())})
        vc = pc.value_counts(flat)
        words = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        words, counts = mg_compress(words, counts, _MG_K)
        # the batch token total rides a dedicated zero-length-word marker
        # row (impossible as a real token — artifacts were filtered above),
        # so it survives even when equal-count batches compress to nothing
        m = len(words) + 1
        n_col = np.zeros(m, dtype=np.int64)
        n_col[0] = n_b
        return pa.table({
            "word": pa.array([""] + list(words), pa.string()),
            "cnt": pa.array(np.concatenate([[0], counts]).astype(np.int64)),
            "n_tok": pa.array(n_col)})

    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["text"]) \
        .map_batches(summary, batch_format="pyarrow", batch_size=None)
    tabs = [b for b in collect_tables(ds) if b.num_columns]
    empty = pa.table({"word": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if not tabs:
        return empty
    folded = pa.concat_tables(tabs)
    total = int(pc.sum(folded["n_tok"]).as_py() or 0)
    if total == 0:
        return empty
    g = pa.TableGroupBy(folded.select(["word", "cnt"]), ["word"]) \
        .aggregate([("cnt", "sum")])
    thresh = total // _HH_DENOM
    slack = total // (_MG_K + 1)
    if thresh > slack:
        cand = g.filter(pc.greater_equal(pc.add(g["cnt_sum"], slack),
                                         pa.scalar(thresh)))
        cand_words = pc.unique(cand["word"].combine_chunks())
        if len(cand_words) == 0:
            return empty
    else:
        # degenerate sub-denominator corpus (thresh rounds to <= slack):
        # the no-false-negative guarantee needs thresh > slack, so verify
        # every word exactly — only reachable when total < ~_HH_DENOM**2 /
        # (_MG_K + 1 - _HH_DENOM) tokens, i.e. never at scale
        cand_words = None

    import ray
    cand_ref = ray.put(cand_words)

    def exact_counts(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, _ = _split_tokens(pc.utf8_lower(txt))
        flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
        cset = ray.get(cand_ref)
        hits = flat if cset is None else \
            pc.drop_null(flat.filter(pc.is_in(flat, value_set=cset)))
        if len(hits) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(hits)
        return pa.table({"word": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    ds2 = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                             columns=["text"]) \
        .map_batches(exact_counts, batch_format="pyarrow", batch_size=None)
    tabs2 = [b for b in collect_tables(ds2) if b.num_columns]
    if not tabs2:
        return empty
    g2 = pa.TableGroupBy(pa.concat_tables(tabs2), ["word"]) \
        .aggregate([("cnt", "sum")])
    out = g2.filter(pc.greater_equal(g2["cnt_sum"], pa.scalar(thresh)))
    order = pc.sort_indices(out, sort_keys=[("word", "ascending")])
    out = out.take(order)
    return pa.table({"word": out["word"],
                     "cnt": pc.cast(out["cnt_sum"], pa.int64())})


SQL_HEAVY_HITTERS = rf"""
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+'))
    AS word
  FROM documents
), n AS (SELECT count(*)::BIGINT AS n FROM w)
SELECT word, count(*)::BIGINT AS cnt
FROM w GROUP BY 1
HAVING count(*) >= (SELECT n FROM n) // {_HH_DENOM}
ORDER BY word
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (gated — the estimate itself)
# ---------------------------------------------------------------------------

_HLL_M = 256          # 2^8 buckets: top 8 bits of the 60-bit md5 prefix
_HLL_REM_BITS = 52    # remaining bits scanned for the leading 1
#: alpha_256 = 0.7213 / (1 + 1.079/256), floored to parts-per-million —
#: a shared CONSTANT on both sides, so the fixed-point estimate is exact
_HLL_ALPHA_PPM = 718_272


def hll_rho(rem: np.ndarray) -> np.ndarray:
    """Position of the first 1-bit in the 52-bit remainder (1-indexed
    from the top): rho = 53 - bit_length(rem); rem == 0 -> 53.
    bit_length via frexp exponents — exact for n < 2^53 (the robust.py
    log2-bucket trick).  Module-level for tests."""
    _, e = np.frexp(rem.astype(np.float64))
    return (_HLL_REM_BITS + 1) - e.astype(np.int64)


def q_hll_distinct(sf_dir: str):
    """Approximate distinct ``user_id`` count via HyperLogLog
    (Flajolet et al. 2007), the register-fixed complement of the KMV
    sketch above: per-batch partials are <= 256 (bucket, max rho) rows,
    the driver fold is a 256-cell max — state is CONSTANT in corpus size
    where KMV's merge is k rows per block.

    Everything is integer, so the SQL oracle reproduces the ESTIMATE:
    the harmonic mean's 2^-Mj terms are scaled by 2^64 (sum fits HUGEINT:
    <= 256 * 2^64 < 2^73), alpha is the shared ppm constant, and the
    division is integer floor on both sides.  The raw estimator is
    reported without the small-range linear-counting correction (that
    needs ln(); consumers holding n_buckets_zero can apply it) — raw,
    but identical on both sides, which is what the gate checks."""
    def partial(t: pa.Table) -> pa.Table:
        u = np.unique(pc.cast(t["user_id"], pa.int64())
                      .to_numpy(zero_copy_only=False))
        hv = _md5_60(u)
        bucket = hv >> _HLL_REM_BITS
        rho = hll_rho(hv & ((1 << _HLL_REM_BITS) - 1))
        regs = np.zeros(_HLL_M, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table({"bucket": pa.array(nz),
                         "rho": pa.array(regs[nz])})

    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    regs = np.zeros(_HLL_M, dtype=np.int64)
    for t in collect_tables(ds):
        if not t.num_columns:
            continue
        np.maximum.at(regs, t["bucket"].to_numpy(zero_copy_only=False),
                      t["rho"].to_numpy(zero_copy_only=False))
    used = int(np.count_nonzero(regs))
    # Python bigints: S = sum over all m buckets of 2^(64 - Mj), Mj=0 empty
    s = sum(1 << (64 - int(r)) for r in regs)
    est = (_HLL_ALPHA_PPM * _HLL_M * _HLL_M * (1 << 64)) \
        // (s * 1_000_000)
    return pa.table({
        "n_buckets_used": pa.array([used], type=pa.int64()),
        "n_buckets_zero": pa.array([_HLL_M - used], type=pa.int64()),
        "est_raw": pa.array([est], type=pa.int64())})


SQL_HLL_DISTINCT = f"""
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
         AS hv
  FROM events
), b AS (
  SELECT hv >> {_HLL_REM_BITS} AS bucket,
         CASE WHEN (hv & ((1::BIGINT << {_HLL_REM_BITS}) - 1)) = 0
              THEN {_HLL_REM_BITS + 1}
              ELSE {_HLL_REM_BITS + 1} - length(printf('%b',
                   hv & ((1::BIGINT << {_HLL_REM_BITS}) - 1)))
         END AS rho
  FROM h
), m AS (
  SELECT bucket, max(rho) AS mj FROM b GROUP BY bucket
), s AS (
  SELECT count(*)::BIGINT AS used,
         coalesce(sum(1::HUGEINT << (64 - mj)), 0::HUGEINT) AS s_present
  FROM m
)
SELECT used AS n_buckets_used,
       ({_HLL_M} - used)::BIGINT AS n_buckets_zero,
       (({_HLL_ALPHA_PPM}::HUGEINT * {_HLL_M} * {_HLL_M}
         * (1::HUGEINT << 64))
        // ((s_present + ({_HLL_M} - used)::HUGEINT * (1::HUGEINT << 64))
            * 1000000))::BIGINT AS est_raw
FROM s
"""


# ---------------------------------------------------------------------------
# mergeable quantile summary (rows-only; the hot-group swap promised by
# analytics.q_value_quantiles_by_type's partitioning assumption)
# ---------------------------------------------------------------------------

_QSK_S = 512       # per-(batch, group) summary size; rank error <= N/S + B


def quantile_summary(vals: np.ndarray, s: int = _QSK_S):
    """Sorted values -> (points, weights): every ceil(n/s)-th order
    statistic carrying the count it represents.  Merging summaries by
    weighted rank has additive rank error <= sum(ceil(n_i/s))/1, i.e.
    N/s + #batches — independent of skew and of value distribution.
    Module-level for the property test."""
    n = len(vals)
    if n == 0:
        return vals, np.zeros(0, dtype=np.int64)
    step = -(-n // s)
    idx = np.arange(step - 1, n, step)
    if idx[-1] != n - 1:
        idx = np.append(idx, n - 1)
    w = np.diff(np.concatenate(([0], idx + 1)))
    return vals[idx], w.astype(np.int64)


def q_value_quantiles_sketch(sf_dir: str, quants=(50, 90, 99)):
    """Approximate per-event-type quantiles of ``value`` via mergeable
    per-batch summaries — the scale path when a single GROUP outgrows a
    worker heap and `analytics.q_value_quantiles_by_type`'s co-locate-
    the-group plan stops holding.  Each batch ships <= S points per type
    (bounded regardless of group size); the driver merge is a weighted
    sorted fold.  Rows-only: the estimate is deterministic but
    approximate (rank error <= N/S + #batches, pinned in pytest against
    the exact quantiles)."""
    from engine.pipeline import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        order = np.lexsort((cents, et))
        et, cents = et[order], cents[order]
        new_g = np.empty(len(et), dtype=bool)
        if len(et):
            new_g[0] = True
            new_g[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(new_g)
        out_t, out_v, out_w = [], [], []
        for i, s0 in enumerate(starts):
            s1 = starts[i + 1] if i + 1 < len(starts) else len(et)
            pts, w = quantile_summary(cents[s0:s1])
            out_t += [et[s0]] * len(pts)
            out_v.append(pts)
            out_w.append(w)
        if not out_t:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "v": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        return pa.table({
            "event_type": pa.array(out_t, type=pa.string()),
            "v": pa.array(np.concatenate(out_v)),
            "w": pa.array(np.concatenate(out_w))})

    tabs = [b for b in collect_tables(
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None))
        if b.num_columns]
    cols = {f"p{q}_cents": [] for q in quants}
    out_types, out_n = [], []
    if tabs:
        t = pa.concat_tables(tabs)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        for etype in np.unique(et):
            m = et == etype
            order = np.argsort(v[m], kind="stable")
            vv, ww = v[m][order], w[m][order]
            cum = np.cumsum(ww)
            n = int(cum[-1])
            out_types.append(str(etype))
            out_n.append(n)
            for q in quants:
                rank = max(1, (q * n + 99) // 100)   # ceil, 1-indexed
                cols[f"p{q}_cents"].append(
                    int(vv[np.searchsorted(cum, rank)]))
    return pa.table({
        "event_type": pa.array(out_types, type=pa.string()),
        "n": pa.array(out_n, type=pa.int64()),
        **{k: pa.array(vals, type=pa.int64()) for k, vals in cols.items()}})


# ---------------------------------------------------------------------------
# whole-table column profile (gated): null counts + HLL distinct per column
# ---------------------------------------------------------------------------
# Per-column canonical string reprs shared with the SQL oracle (floats
# go through cents, timestamps through epoch_us — never locale/format-
# dependent rendering):
_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value",
                 "props")


def _canon_strings(t: pa.Table, col: str):
    """Column -> (canonical string numpy array of NON-NULL values,
    null count).  Matches the oracle expressions in SQL_TABLE_PROFILE."""
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    nulls = int(pc.sum(pc.is_null(c)).as_py() or 0)
    c = c.drop_null()
    if pa.types.is_timestamp(c.type):
        v = c.to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        out = v.astype("U")
    elif pa.types.is_floating(c.type):
        v = np.floor(c.to_numpy(zero_copy_only=False) * 100.0
                     + 0.5).astype(np.int64)
        out = v.astype("U")
    elif pa.types.is_integer(c.type):
        out = c.to_numpy(zero_copy_only=False).astype(np.int64).astype("U")
    else:
        out = np.asarray(c.to_pylist(), dtype=object)
    return out, nulls


def q_table_profile(sf_dir: str):
    """Deequ-style column profile of the events table: row count, null
    count, and the HLL-256 distinct estimate per column — one pass, all
    partials fixed-size (256 registers + 2 counters per column per
    batch), the estimate itself SQL-reproducible like
    :func:`q_hll_distinct`.  The per-DISTINCT md5 is the gate digest;
    the splitmix64 fast twin applies as everywhere (md5 cost is per
    distinct value per batch, not per row)."""
    from engine.pipeline import collect_tables

    ncols = len(_PROFILE_COLS)

    def partial(t: pa.Table) -> pa.Table:
        rows_out = {"col_idx": [], "bucket": [], "rho": [],
                    "n_rows": [], "n_null": []}
        for i, col in enumerate(_PROFILE_COLS):
            vals, nulls = _canon_strings(t, col)
            u = np.unique(vals)
            hv = np.array([int(hashlib.md5(str(s).encode()).hexdigest()[:15],
                               16) for s in u], dtype=np.int64) \
                if len(u) else np.zeros(0, dtype=np.int64)
            regs = np.zeros(_HLL_M, dtype=np.int64)
            if len(hv):
                np.maximum.at(regs, hv >> _HLL_REM_BITS,
                              hll_rho(hv & ((1 << _HLL_REM_BITS) - 1)))
            nz = np.flatnonzero(regs)
            rows_out["col_idx"] += [i] * (len(nz) + 1)
            rows_out["bucket"] += [-1] + nz.tolist()
            rows_out["rho"] += [0] + regs[nz].tolist()
            rows_out["n_rows"] += [t.num_rows] + [0] * len(nz)
            rows_out["n_null"] += [nulls] + [0] * len(nz)
        return pa.table({k: pa.array(v, type=pa.int64())
                         for k, v in rows_out.items()})

    tabs = [b for b in collect_tables(
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=list(_PROFILE_COLS))
        .map_batches(partial, batch_format="pyarrow", batch_size=None))
        if b.num_columns]
    regs = np.zeros((ncols, _HLL_M), dtype=np.int64)
    n_rows = np.zeros(ncols, dtype=np.int64)
    n_null = np.zeros(ncols, dtype=np.int64)
    for t in tabs:
        ci = t["col_idx"].to_numpy(zero_copy_only=False)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        rh = t["rho"].to_numpy(zero_copy_only=False)
        m = bk >= 0
        np.maximum.at(regs, (ci[m], bk[m]), rh[m])
        np.add.at(n_rows, ci[~m], t["n_rows"].to_numpy()[~m])
        np.add.at(n_null, ci[~m], t["n_null"].to_numpy()[~m])
    ests, used_out = [], []
    for i in range(ncols):
        used = int(np.count_nonzero(regs[i]))
        s = sum(1 << (64 - int(r)) for r in regs[i])
        ests.append((_HLL_ALPHA_PPM * _HLL_M * _HLL_M * (1 << 64))
                    // (s * 1_000_000))
        used_out.append(used)
    return pa.table({
        "col_name": pa.array(list(_PROFILE_COLS), type=pa.string()),
        "n_rows": pa.array(n_rows),
        "n_null": pa.array(n_null),
        "n_buckets_used": pa.array(used_out, type=pa.int64()),
        "est_distinct": pa.array(ests, type=pa.int64())})


def _sql_profile_col(col: str, expr: str) -> str:
    return f"""
SELECT '{col}' AS col_name, count(*)::BIGINT AS n_rows,
       count(*) FILTER (WHERE {col} IS NULL)::BIGINT AS n_null,
       coalesce(h.used, 0) AS n_buckets_used, h.est AS est_raw
FROM events,
 (WITH hv AS (
    SELECT DISTINCT ('0x' || substr(md5({expr}), 1, 15))::BIGINT AS v
    FROM events WHERE {col} IS NOT NULL
  ), b AS (
    SELECT v >> {_HLL_REM_BITS} AS bucket,
           CASE WHEN (v & ((1::BIGINT << {_HLL_REM_BITS}) - 1)) = 0
                THEN {_HLL_REM_BITS + 1}
                ELSE {_HLL_REM_BITS + 1} - length(printf('%b',
                     v & ((1::BIGINT << {_HLL_REM_BITS}) - 1)))
           END AS rho
    FROM hv
  ), m AS (SELECT bucket, max(rho) AS mj FROM b GROUP BY bucket)
  SELECT count(*)::BIGINT AS used,
         (({_HLL_ALPHA_PPM}::HUGEINT * {_HLL_M} * {_HLL_M}
           * (1::HUGEINT << 64))
          // ((coalesce(sum(1::HUGEINT << (64 - mj)), 0::HUGEINT)
               + ({_HLL_M} - count(*))::HUGEINT * (1::HUGEINT << 64))
              * 1000000))::BIGINT AS est
  FROM m) AS h
GROUP BY h.used, h.est
"""


def _sql_table_profile() -> str:
    exprs = {
        "event_id": "event_id::VARCHAR",
        "ts": "epoch_us(ts)::VARCHAR",
        "user_id": "user_id::VARCHAR",
        "event_type": "event_type",
        "value": "CAST(floor(value*100.0 + 0.5) AS BIGINT)::VARCHAR",
        "props": "props",
    }
    parts = [_sql_profile_col(c, exprs[c]) for c in _PROFILE_COLS]
    return ("SELECT col_name, n_rows, n_null, n_buckets_used,"
            " est_raw AS est_distinct FROM ("
            + " UNION ALL ".join(f"({p})" for p in parts)
            + ") ORDER BY col_name")
