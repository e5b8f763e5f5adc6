"""Corpus-preparation operators a training-data pipeline runs after
curation: deterministic train/val/test split, sequence packing, document-
frequency vocabulary, hopping-window aggregates.  All single-pass
``map_batches`` + (at most) one small-key groupby, and all DuckDB-gated
(md5 is the shared digest; everything else is integer-exact).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.io import read_parquet_clean


def _docs(sf_dir: str, columns=None):
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns)


# ---------------------------------------------------------------------------
# deterministic train/val/test split (gated)
# ---------------------------------------------------------------------------

_SPLIT_BUCKETS = 100
_TRAIN_LT, _VAL_LT = 80, 90   # 80/10/10


def q_corpus_split(sf_dir: str):
    """Hash-based train/val/test assignment: bucket = first 32 md5 bits of
    the doc id string, mod 100 — stable under corpus growth (a doc's split
    never changes when other docs are added), reproducible anywhere md5
    exists, and shuffle-free (pure map)."""
    def fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_pylist()
        b = np.array([int.from_bytes(
            hashlib.md5(str(d).encode()).digest()[:4], "big") % _SPLIT_BUCKETS
            for d in ids], dtype=np.int64)
        split = np.where(b < _TRAIN_LT, "train",
                         np.where(b < _VAL_LT, "val", "test"))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "bucket": pa.array(b),
            "split": pa.array(split.astype(object), type=pa.string()),
        })
    return _docs(sf_dir, ["doc_id"]).map_batches(fn, batch_format="pyarrow")


SQL_CORPUS_SPLIT = f"""
WITH b AS (
  SELECT doc_id::BIGINT AS doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
           % {_SPLIT_BUCKETS} AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {_TRAIN_LT} THEN 'train'
            WHEN bucket < {_VAL_LT} THEN 'val' ELSE 'test' END AS split
FROM b
"""


def hash_bucket_fast(ids: np.ndarray, buckets: int, shift: int = 0) -> np.ndarray:
    """splitmix64 of the int64 id -> bucket in [0, buckets): the at-scale
    twin of the per-row-Python md5 gate bucket (md5 is DuckDB's only
    shared digest, so the fast bucket has no SQL oracle — rows-only +
    property-pinned, the fingerprint_rolling_fast precedent).  ``shift``
    selects an independent bit window (the md5 paths' digest[:4] vs
    digest[4:8] precedent)."""
    from engine.dedup import _mix64
    h = _mix64(np.ascontiguousarray(ids, dtype=np.int64).view(np.uint64))
    if shift:
        h = h >> np.uint64(shift)
    return (h % np.uint64(buckets)).astype(np.int64)


def q_corpus_split_fast(sf_dir: str):
    """Rows-only fast twin of :func:`q_corpus_split`: one vectorized
    splitmix64 over the int64 doc_id column replaces the per-row Python
    md5 — same stability contract (a doc's split never changes as other
    docs arrive), different (equally valid) pseudo-random assignment.
    tests/test_fast_hash.py pins a scalar reference and the split-contract
    properties."""
    def fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        b = hash_bucket_fast(ids, _SPLIT_BUCKETS)
        split = np.where(b < _TRAIN_LT, "train",
                         np.where(b < _VAL_LT, "val", "test"))
        return pa.table({
            "doc_id": pa.array(ids),
            "bucket": pa.array(b),
            "split": pa.array(split.astype(object), type=pa.string()),
        })
    return _docs(sf_dir, ["doc_id"]).map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sequence packing (gated)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048


def q_pack_sequences(sf_dir: str):
    """Offset-based sequence packing: within each language (the
    partitioning key — reuse of the corpus's natural key), docs in doc_id
    order are laid head-to-tail and cut into ``_PACK_BUDGET``-token packs:
    ``pack_id = tokens_before // budget``.  One groupby(lang) +
    vectorized cumsum per group; deterministic, so a resumed run
    reproduces identical pack assignments.  (Offset packing — the
    streaming-friendly packing used when docs may span pack boundaries;
    greedy first-fit is deliberately NOT used: it is order-fragile and
    not oracle-checkable.)"""
    def per_lang(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ntok = pc.count_substring_regex(
            pc.fill_null(txt, ""), r"\S+").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, ntok = ids[order], ntok[order]
        before = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(ntok[:-1], out=before[1:])
        lang = t["lang"].to_pylist()[0] if t.num_rows else ""
        return pa.table({
            "doc_id": pa.array(ids),
            "lang": pa.array([lang] * len(ids), type=pa.string()),
            "n_tokens": pa.array(ntok),
            "pack_id": pa.array(before // _PACK_BUDGET),
            "pack_offset": pa.array(before % _PACK_BUDGET),
        })

    return _docs(sf_dir, ["doc_id", "lang", "text"]) \
        .groupby("lang").map_groups(per_lang, batch_format="pyarrow")


SQL_PACK_SEQUENCES = rf"""
WITH n AS (
  SELECT doc_id::BIGINT AS doc_id, lang,
         len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM n
)
SELECT doc_id, lang, n_tokens,
       (before // {_PACK_BUDGET})::BIGINT AS pack_id,
       (before % {_PACK_BUDGET})::BIGINT AS pack_offset
FROM c
"""


# ---------------------------------------------------------------------------
# document-frequency top terms per language (gated)
# ---------------------------------------------------------------------------

_TOP_TERMS = 5


def q_top_terms_by_lang(sf_dir: str):
    """Per-language top-5 words by DOCUMENT frequency (the vocabulary/
    stopword-mining shape).  Combiner-first: each batch emits one row per
    distinct (lang, word) with its batch document count (vectorized
    segment-unique over the flat token stream — no Python over words),
    the groupby folds partials, and only the tiny (lang, word, df) table
    reaches the driver for the top-k."""
    from engine.text import _split_tokens

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        counts = offs[1:] - offs[:-1]
        n = len(counts)
        if len(flat) == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        # distinct (doc, word): sort words within each doc, keep firsts
        import pandas as pd
        codes, uniq = pd.factorize(flat.to_pandas(), sort=False)
        order = np.lexsort((codes, doc_idx))
        c2, d2 = codes[order], doc_idx[order]
        new = np.ones(len(c2), dtype=bool)
        if len(c2) > 1:
            new[1:] = (c2[1:] != c2[:-1]) | (d2[1:] != d2[:-1])
        dw_code, dw_doc = c2[new], d2[new]
        # empty-string token (whitespace-only doc artifact) never counts
        wlen = np.array([len(w) for w in uniq], dtype=np.int64)
        keep = wlen[dw_code] > 0
        dw_code, dw_doc = dw_code[keep], dw_doc[keep]
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        g = pa.TableGroupBy(pa.table({
            "lang": pa.array(langs[dw_doc], type=pa.string()),
            "word": pa.array(uniq[dw_code], type=pa.string()),
        }), ["lang", "word"]).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "word": g["word"],
                         "df": pc.cast(g["count_all"], pa.int64())})

    import ray
    from ray.data.aggregate import Sum
    folded = _docs(sf_dir, ["lang", "text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby(["lang", "word"]).aggregate(Sum("df", alias_name="df"))
    from engine.pipeline import collect_tables
    tabs = [b for b in collect_tables(folded) if b.num_columns]
    if not tabs:   # empty corpus: no (lang, word) rows at all
        return pa.table({"lang": pa.array([], type=pa.string()),
                         "word": pa.array([], type=pa.string()),
                         "df": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    df = pa.concat_tables(tabs).to_pandas()
    df = df.sort_values(["lang", "df", "word"],
                        ascending=[True, False, True], ignore_index=True)
    df["rank"] = df.groupby("lang").cumcount() + 1
    df = df[df["rank"] <= _TOP_TERMS]
    return pa.table({
        "lang": pa.array(df["lang"], type=pa.string()),
        "word": pa.array(df["word"], type=pa.string()),
        "df": pa.array(df["df"].astype(np.int64)),
        "rank": pa.array(df["rank"].astype(np.int64)),
    })


SQL_TOP_TERMS = rf"""
WITH dw AS (
  SELECT DISTINCT doc_id, lang,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS word
  FROM documents
), c AS (
  SELECT lang, word, count(*)::BIGINT AS df FROM dw GROUP BY 1, 2
)
SELECT lang, word, df,
       row_number() OVER (PARTITION BY lang
                          ORDER BY df DESC, word ASC)::BIGINT AS rank
FROM c
QUALIFY rank <= {_TOP_TERMS}
"""


# ---------------------------------------------------------------------------
# hopping-window aggregate over events (gated)
# ---------------------------------------------------------------------------

_HOP_US = 1_800_000_000          # 30 min hop
_WIN_HOPS = 2                    # 1 h window = 2 hops


def q_events_hopping_window(sf_dir: str):
    """Hopping (sliding) window counts: 1-hour windows every 30 minutes —
    each event lands in exactly ``_WIN_HOPS`` windows.  The replication
    happens inside ``map_batches`` (np.repeat, no flat_map row path),
    partials combine per batch, and only (window, partial) rows shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        vmilli = np.floor(t["value"].to_numpy(zero_copy_only=False)
                          * 1000.0).astype(np.int64)
        k = ts // _HOP_US
        wins = np.concatenate([k - d for d in range(_WIN_HOPS)])
        vals = np.tile(vmilli, _WIN_HOPS)
        g = pa.TableGroupBy(pa.table({
            "window_idx": pa.array(wins), "v": pa.array(vals)}),
            "window_idx").aggregate([("v", "sum"), ("v", "count")])
        return pa.table({"window_idx": g["window_idx"],
                         "sum_value_milli": g["v_sum"],
                         "n_events": pc.cast(g["v_count"], pa.int64())})

    import ray
    from ray.data.aggregate import Sum
    out = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                             columns=["ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("window_idx") \
        .aggregate(Sum("sum_value_milli", alias_name="sum_value_milli"),
                   Sum("n_events", alias_name="n_events"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start_us": pc.multiply(
                pc.cast(t["window_idx"], pa.int64()), _HOP_US),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value_milli": pc.cast(t["sum_value_milli"], pa.int64()),
        })
    return out.map_batches(fin, batch_format="pyarrow")


SQL_EVENTS_HOPPING = f"""
WITH r AS (
  SELECT unnest([epoch_us(ts) // {_HOP_US},
                 epoch_us(ts) // {_HOP_US} - 1]) AS window_idx,
         CAST(floor(value * 1000.0) AS BIGINT) AS vmilli
  FROM events
)
SELECT (window_idx * {_HOP_US})::BIGINT AS window_start_us,
       count(*)::BIGINT AS n_events,
       sum(vmilli)::BIGINT AS sum_value_milli
FROM r GROUP BY window_idx
"""


# ---------------------------------------------------------------------------
# deterministic global shuffle -> training shards (gated)
# ---------------------------------------------------------------------------

_N_SHARDS = 16
_SHUFFLE_SEED = "s42"


def q_shuffle_shards(sf_dir: str):
    """Deterministic global training shuffle: every doc gets a 60-bit md5
    order key from ``seed:doc_id``; ``shard = okey % N`` spreads the corpus
    uniformly, and ``pos`` is the doc's rank inside its shard (okey order,
    doc_id tiebreak).  Re-running with the same seed reproduces the exact
    shard layout anywhere md5 exists — the property a resumable 100 TB
    shuffle needs.  Scale shape: the keying is a pure map, the only
    all-to-all moves 16 bytes/row ((doc_id, okey) hash-partitioned on
    shard), and the in-shard rank is one argsort per group — no global
    sort and no text movement.  Epoch reshuffles = change the seed."""
    def keyed(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_pylist()
        ok = np.array([int(hashlib.md5(
            f"{_SHUFFLE_SEED}:{d}".encode()).hexdigest()[:15], 16)
            for d in ids], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "shard": pa.array(ok % _N_SHARDS),
            "okey": pa.array(ok),
        })

    def rank(t: pa.Table) -> pa.Table:
        ok = t["okey"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ok))
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64)
        return t.append_column("pos", pa.array(pos))

    return _docs(sf_dir, ["doc_id"]) \
        .map_batches(keyed, batch_format="pyarrow") \
        .groupby("shard").map_groups(rank, batch_format="pyarrow")


SQL_SHUFFLE_SHARDS = f"""
WITH k AS (
  SELECT doc_id::BIGINT AS doc_id,
         ('0x' || substr(md5('{_SHUFFLE_SEED}:' || doc_id::VARCHAR),
                         1, 15))::BIGINT AS okey
  FROM documents
)
SELECT doc_id, (okey % {_N_SHARDS})::BIGINT AS shard, okey,
       (row_number() OVER (PARTITION BY okey % {_N_SHARDS}
                           ORDER BY okey, doc_id) - 1)::BIGINT AS pos
FROM k
"""


# ---------------------------------------------------------------------------
# per-source document cap (gated)
# ---------------------------------------------------------------------------

_SOURCE_CAP = 15


def q_source_cap(sf_dir: str):
    """Per-source document cap: keep the ``_SOURCE_CAP`` longest docs of
    every source (the Common-Crawl-style per-domain cap that stops one
    crawler-friendly site from dominating a training mix), ranked by
    (n_chars DESC, doc_id ASC).

    Scale shape: top-K per key distributes as a partial top-K combiner —
    each batch emits at most K rows per source it saw, so the groupby
    exchange carries O(K x sources x blocks) id-sized rows, never the
    corpus; the text column never moves at all.  The final per-source
    rank is one argsort over <= K x blocks rows per group.
    """
    k = _SOURCE_CAP

    def partial_topk(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        nch = pc.cast(t["n_chars"], pa.int64()).to_numpy()
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy()
        _, codes = np.unique(src, return_inverse=True)
        order = np.lexsort((ids, -nch, codes))
        c_sorted = codes[order]
        # rank within each source run: position minus run start
        starts = np.concatenate([[0], np.flatnonzero(
            np.diff(c_sorted)) + 1])
        run_id = np.searchsorted(starts, np.arange(len(order)),
                                 side="right") - 1
        rank = np.arange(len(order)) - starts[run_id]
        keep = order[rank < k]
        return pa.table({
            "source": pa.array(src[keep]),
            "doc_id": pa.array(ids[keep]),
            "n_chars": pa.array(nch[keep]),
        })

    def final_topk(t: pa.Table) -> pa.Table:
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nch))[:k]
        return pa.table({
            "source": t["source"].take(pa.array(order)),
            "doc_id": t["doc_id"].take(pa.array(order)),
            "n_chars": t["n_chars"].take(pa.array(order)),
            "rank": pa.array(np.arange(len(order), dtype=np.int64)),
        })

    return _docs(sf_dir, ["doc_id", "source", "n_chars"]) \
        .map_batches(partial_topk, batch_format="pyarrow") \
        .groupby("source").map_groups(final_topk, batch_format="pyarrow")


SQL_SOURCE_CAP = f"""
SELECT source, doc_id, n_chars, (rn - 1)::BIGINT AS rank FROM (
  SELECT source, doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn <= {_SOURCE_CAP}
"""


# ---------------------------------------------------------------------------
# conjunctive keyword search (gated)
# ---------------------------------------------------------------------------

_SEARCH_TERMS = ("dup", "vector", "merge")
_SEARCH_K = 20


def q_keyword_search(sf_dir: str):
    """Conjunctive keyword search: docs containing ALL ``_SEARCH_TERMS``
    (lowercased token equality), ranked by total term frequency
    (tf DESC, doc_id ASC), top ``_SEARCH_K`` — the grep/retrieval
    primitive over a corpus.

    Pure scan, no index: one Arrow split + one ``pc.equal`` per term +
    segment sums; matching docs pass through the same partial-top-K
    combiner as ``q_source_cap``, so each batch forwards at most K
    id-sized rows and the text never leaves the map stage.  Scale path:
    for repeated queries build the bucket-partitioned inverted index
    once (the ``q_simsearch_lsh`` layout pattern) and scan only the
    rarest term's postings."""
    from engine.text import _split_tokens, _segment_sums
    k = _SEARCH_K
    terms = _SEARCH_TERMS

    def scan(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        tf = np.zeros(t.num_rows, dtype=np.int64)
        nterms = np.zeros(t.num_rows, dtype=np.int64)
        for term in terms:
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            per = _segment_sums(hit.astype(np.int64), offs)
            tf += per
            nterms += per > 0
        m = nterms == len(terms)
        ids, tf = ids[m], tf[m]
        order = np.lexsort((ids, -tf))[:k]      # partial top-K per batch
        return pa.table({"doc_id": pa.array(ids[order]),
                         "tf_total": pa.array(tf[order])})

    cand = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(scan, batch_format="pyarrow", batch_size=None)
    from engine.pipeline import collect_tables
    tabs = [b for b in collect_tables(cand) if b.num_columns]
    if not tabs:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "tf_total": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    ct = pa.concat_tables(tabs)
    ids = ct["doc_id"].to_numpy(zero_copy_only=False)
    tf = ct["tf_total"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -tf))[:k]
    return pa.table({
        "doc_id": pa.array(ids[order]),
        "tf_total": pa.array(tf[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


_TERMS_SQL = ", ".join(f"'{t}'" for t in _SEARCH_TERMS)

SQL_KEYWORD_SEARCH = rf"""
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS word
  FROM documents
), tf AS (
  SELECT doc_id,
         sum(CASE WHEN word IN ({_TERMS_SQL}) THEN 1 ELSE 0 END)::BIGINT
           AS tf_total,
         count(DISTINCT CASE WHEN word IN ({_TERMS_SQL}) THEN word END)
           AS nterms
  FROM w GROUP BY doc_id
)
SELECT doc_id, tf_total,
       row_number() OVER (ORDER BY tf_total DESC, doc_id ASC)::BIGINT AS rank
FROM tf WHERE nterms = {len(_SEARCH_TERMS)}
QUALIFY rank <= {_SEARCH_K}
"""


# ---------------------------------------------------------------------------
# TF-IDF ranked retrieval (gated)
# ---------------------------------------------------------------------------

_TFIDF_TERMS = ("dup", "merge", "scan")
_TFIDF_K = 20
_TFIDF_SCALE = 1_000_000


def q_tfidf_topk(sf_dir: str):
    """Disjunctive TF-IDF retrieval: top ``_TFIDF_K`` docs by
    ``sum_t tf(t, doc) * idf(t)`` over ``_TFIDF_TERMS``, where
    ``idf(t) = (N * 1e6) // df(t)`` in exact integer arithmetic (no
    float log — the value-hash gate stays deterministic; the idf
    ORDERING matches log-idf since x -> N//x is monotone).

    Two linear passes, no shuffle: pass 1 folds per-batch document-
    frequency partials (one row per term per batch) into the tiny global
    df vector; pass 2 re-scans with the idf weights inlined, scores each
    doc vectorized (one ``pc.equal`` + segment-sum per term) and forwards
    only a per-batch top-K, so the driver folds <= K x blocks id-sized
    rows.  At repeated-query scale, build the inverted index once (the
    ``q_simsearch_lsh`` partitioned layout) and score postings instead.
    """
    import pyarrow.parquet as _pq

    from engine.pipeline import collect_tables
    from engine.text import _segment_sums, _split_tokens
    terms = _TFIDF_TERMS
    k = _TFIDF_K

    def df_partial(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        dfs = np.empty(len(terms), dtype=np.int64)
        for i, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            dfs[i] = int((_segment_sums(hit.astype(np.int64), offs) > 0)
                         .sum())
        return pa.table({"term_idx": pa.array(np.arange(len(terms),
                                                        dtype=np.int64)),
                         "df": pa.array(dfs)})

    parts = [b for b in collect_tables(
        _docs(sf_dir, ["text"]).map_batches(
            df_partial, batch_format="pyarrow", batch_size=None))
        if b.num_columns]
    df_vec = np.zeros(len(terms), dtype=np.int64)
    for b in parts:
        df_vec[b["term_idx"].to_numpy(zero_copy_only=False)] += \
            b["df"].to_numpy(zero_copy_only=False)
    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    idf = np.where(df_vec > 0,
                   (n_docs * _TFIDF_SCALE) // np.maximum(df_vec, 1),
                   0).astype(np.int64)

    def score_topk(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        score = np.zeros(t.num_rows, dtype=np.int64)
        for i, term in enumerate(terms):
            if idf[i] == 0:
                continue
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            score += _segment_sums(hit.astype(np.int64), offs) * idf[i]
        m = score > 0
        ids, sc = ids[m], score[m]
        order = np.lexsort((ids, -sc))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "score": pa.array(sc[order])})

    tabs = [b for b in collect_tables(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            score_topk, batch_format="pyarrow", batch_size=None))
        if b.num_columns]
    if not tabs:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    ct = pa.concat_tables(tabs)
    ids = ct["doc_id"].to_numpy(zero_copy_only=False)
    sc = ct["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table({
        "doc_id": pa.array(ids[order]),
        "score": pa.array(sc[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


_TFIDF_TERMS_SQL = ", ".join(f"'{t}'" for t in _TFIDF_TERMS)

SQL_TFIDF_TOPK = rf"""
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS word
  FROM documents
), d AS (
  SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM w
  WHERE word IN ({_TFIDF_TERMS_SQL}) GROUP BY 1
), n AS (SELECT count(*)::BIGINT AS n FROM documents),
idf AS (SELECT word, (n.n * {_TFIDF_SCALE}) // d.df AS idf FROM d, n),
tf AS (
  SELECT doc_id, word, count(*)::BIGINT AS tf FROM w
  WHERE word IN ({_TFIDF_TERMS_SQL}) GROUP BY 1, 2
), s AS (
  SELECT tf.doc_id, sum(tf.tf * idf.idf)::BIGINT AS score
  FROM tf JOIN idf USING (word) GROUP BY 1
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank
FROM s
QUALIFY rank <= {_TFIDF_K}
"""


# ---------------------------------------------------------------------------
# bucket-partitioned inverted index + indexed keyword search (gated)
# ---------------------------------------------------------------------------

_IDX_BUCKETS = 64

#: scan accounting of the last q_keyword_search_indexed call
LAST_KEYWORD_SCAN: dict = {}


def _word_bucket(words) -> np.ndarray:
    """Deterministic bucket per word: pandas' C-level string hash (the
    same primitive the minhash path trusts cross-process) mod the
    partition count."""
    import pandas as pd
    h = pd.util.hash_pandas_object(pd.Series(list(words)), index=False) \
        .to_numpy()
    return (h % np.uint64(_IDX_BUCKETS)).astype(np.int64)


def inverted_index_dir(sf_dir: str) -> str:
    """Build (once, cached by content fingerprint) the physically
    bucket-partitioned inverted index over the documents table: one
    tokenize pass emits (word, doc_id, tf) postings per distinct
    (doc, word) and writes Parquet partitioned by ``bucket=hash(word) %
    64`` — afterwards a term query reads ONLY its bucket
    directories (~terms/buckets of the index) instead of re-scanning the
    corpus text.  The word string itself rides the posting, so bucket
    hashing is pure partition pruning and exactness never depends on it
    (the ANN layout recipe of ``simsearch.ann_index_dir``)."""
    import hashlib

    from engine.text import _split_tokens
    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    tag = hashlib.blake2b(
        f"{doc_path}|{st.st_mtime_ns}|{st.st_size}|{_IDX_BUCKETS}".encode(),
        digest_size=8).hexdigest()
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    d = os.path.join(base, "graft_inv_index", tag)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d

    def postings(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        per_tok_doc = np.repeat(np.arange(t.num_rows), np.diff(offs))
        keep = pc.greater(pc.binary_length(flat), 0) \
            .to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(pa.table({
            "word": flat.filter(pa.array(keep)),
            "doc_id": pa.array(ids[per_tok_doc[keep]])}),
            ["word", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({
            "word": g["word"], "doc_id": g["doc_id"],
            "tf": pc.cast(g["count_all"], pa.int64()),
            "bucket": pa.array(_word_bucket(
                g["word"].to_numpy(zero_copy_only=False)))})

    _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(postings, batch_format="pyarrow", batch_size=None) \
        .write_parquet(d, partition_cols=["bucket"])
    _write_doclen_sidecar(sf_dir, d)
    with open(marker, "w") as f:
        f.write(tag)
    return d


def _write_doclen_sidecar(sf_dir: str, idx_dir: str) -> str:
    """(doc_id, dl) table alongside the inverted index — the document-
    length statistics BM25 needs (8+8 B per doc; partitioned parquet so
    a candidate-filtered pass streams it).  Idempotent per index build."""
    from engine.text import _split_tokens
    out = os.path.join(idx_dir, "doclen")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out

    def doclen(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(txt)
        counts = offs[1:] - offs[:-1]
        flat_len = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        art = np.zeros(len(counts), dtype=np.int64)
        one = counts == 1
        if one.any():
            art[one] = flat_len[offs[:-1][one]] == 0
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "dl": pa.array(counts - art)})

    _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(doclen, batch_format="pyarrow", batch_size=None) \
        .write_parquet(out)
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok")
    return out


def q_keyword_search_indexed(sf_dir: str):
    """Conjunctive keyword search over the PARTITIONED inverted index —
    identical contract (and SQL oracle) to :func:`q_keyword_search`, but
    the query touches only the search terms' bucket partitions (<= 3 of
    64 directories; row fraction follows the corpus word distribution —
    ~17% on the tiny-vocabulary fixtures, ~terms/buckets on a realistic
    Zipf vocabulary; scan accounting in ``LAST_KEYWORD_SCAN``, asserted
    in tests).  The corpus text is never read at query time; at 10^12 rows
    the per-bucket postings lists would themselves be Datasets and the
    conjunction a keyed join over the rarest term's postings — here they
    are driver-side numpy folds, documented as such."""
    import glob as _glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    k = _SEARCH_K
    terms = _SEARCH_TERMS
    idx = inverted_index_dir(sf_dir)
    term_buckets = sorted(set(_word_bucket(terms).tolist()))
    files = []
    for b in term_buckets:
        files += _glob.glob(os.path.join(idx, f"bucket={b}", "*.parquet"))
    total = sum(
        pq.read_metadata(f).num_rows
        for f in _glob.glob(os.path.join(idx, "bucket=*", "*.parquet")))
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "tf_total": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64())})
    LAST_KEYWORD_SCAN.clear()
    LAST_KEYWORD_SCAN["rows_total"] = total
    if not files:
        LAST_KEYWORD_SCAN["rows_read"] = 0
        return empty
    t = pads.dataset(files).to_table(columns=["word", "doc_id", "tf"])
    LAST_KEYWORD_SCAN["rows_read"] = t.num_rows
    t = t.filter(pc.is_in(t["word"], value_set=pa.array(list(terms))))
    if t.num_rows == 0:
        return empty
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    tf = t["tf"].to_numpy(zero_copy_only=False)
    uid, inv = np.unique(ids, return_inverse=True)
    nterms = np.zeros(len(uid), dtype=np.int64)
    np.add.at(nterms, inv, 1)                 # postings are distinct per word
    tft = np.zeros(len(uid), dtype=np.int64)
    np.add.at(tft, inv, tf)
    m = nterms == len(terms)
    uid, tft = uid[m], tft[m]
    order = np.lexsort((uid, -tft))[:k]
    return pa.table({
        "doc_id": pa.array(uid[order]),
        "tf_total": pa.array(tft[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


def q_tfidf_topk_indexed(sf_dir: str):
    """TF-IDF retrieval over the partitioned inverted index — identical
    contract (and SQL oracle) to :func:`q_tfidf_topk`, zero corpus-text
    reads at query time: document frequencies fall out of the postings
    themselves (they are distinct per (word, doc)), and the score fold
    touches only the terms' bucket partitions."""
    import glob as _glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pqt

    terms = _TFIDF_TERMS
    k = _TFIDF_K
    idx = inverted_index_dir(sf_dir)
    files = []
    for b in sorted(set(_word_bucket(terms).tolist())):
        files += _glob.glob(os.path.join(idx, f"bucket={b}", "*.parquet"))
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64())})
    if not files:
        return empty
    t = pads.dataset(files).to_table(columns=["word", "doc_id", "tf"])
    t = t.filter(pc.is_in(t["word"], value_set=pa.array(list(terms))))
    if t.num_rows == 0:
        return empty
    n_docs = _pqt.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    words = t["word"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    tf = t["tf"].to_numpy(zero_copy_only=False)
    idf_by_term = {}
    for term in terms:
        df = int((words == term).sum())     # postings are distinct per doc
        idf_by_term[term] = (n_docs * _TFIDF_SCALE) // df if df else 0
    idf_row = np.array([idf_by_term[w] for w in words], dtype=np.int64)
    uid, inv = np.unique(ids, return_inverse=True)
    score = np.zeros(len(uid), dtype=np.int64)
    np.add.at(score, inv, tf * idf_row)
    m = score > 0
    uid, score = uid[m], score[m]
    order = np.lexsort((uid, -score))[:k]
    return pa.table({
        "doc_id": pa.array(uid[order]),
        "score": pa.array(score[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


def q_bm25_topk_indexed(sf_dir: str):
    """BM25 over the partitioned inverted index — identical contract (and
    SQL oracle) to :func:`q_bm25_topk` with zero corpus-TEXT reads at
    query time: tf and df fall out of the terms' bucket postings, and the
    doc-length statistics come from the index's ``doclen`` sidecar
    ((doc_id, dl), built with the index).  SUMDL folds from per-batch
    sidecar partials; candidate (tf0, tf1) vectors broadcast once via
    ``ray.put`` and every sidecar batch scores its candidate hits
    vectorized, forwarding only a per-batch top-K (each doc has exactly
    one sidecar row, so per-batch tops fold exactly).  Candidate vectors
    are driver-resident numpy — bounded by the query terms' df, the same
    documented bound as the other indexed folds here."""
    import glob as _glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pqt

    import ray
    from engine.pipeline import collect_tables

    terms = _BM25_TERMS
    k = _BM25_K
    idx = inverted_index_dir(sf_dir)
    doclen_dir = _write_doclen_sidecar(sf_dir, idx)  # idempotent (old caches)
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64())})
    files = []
    for b in sorted(set(_word_bucket(terms).tolist())):
        files += _glob.glob(os.path.join(idx, f"bucket={b}", "*.parquet"))
    if not files:
        return empty
    t = pads.dataset(files).to_table(columns=["word", "doc_id", "tf"])
    t = t.filter(pc.is_in(t["word"], value_set=pa.array(list(terms))))
    if t.num_rows == 0:
        return empty
    n_docs = _pqt.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    words = t["word"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    tf = t["tf"].to_numpy(zero_copy_only=False)
    cand = np.unique(ids)
    tf_mat = np.zeros((len(terms), len(cand)), dtype=np.int64)
    idf = np.zeros(len(terms), dtype=np.int64)
    for i, term in enumerate(terms):
        m = words == term
        df = int(m.sum())                   # postings are distinct per doc
        idf[i] = (n_docs * _TFIDF_SCALE) // df if df else 0
        tf_mat[i, np.searchsorted(cand, ids[m])] = tf[m]

    dlen = read_parquet_clean(doclen_dir, columns=["doc_id", "dl"])

    def sumdl_partial(b: pa.Table) -> pa.Table:
        return pa.table({"s": pa.array(
            [int(b["dl"].to_numpy(zero_copy_only=False).sum())],
            type=pa.int64())})

    sumdl = sum(int(b["s"][0].as_py()) for b in collect_tables(
        dlen.map_batches(sumdl_partial, batch_format="pyarrow"))
        if b.num_columns and b.num_rows)
    if sumdl == 0:
        return empty
    cand_ref = ray.put(cand)
    tf_ref = ray.put(tf_mat)

    def score_block(b: pa.Table) -> pa.Table:
        cnd, tfm = ray.get(cand_ref), ray.get(tf_ref)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        dl = b["dl"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cnd, did)
        pos_c = np.minimum(pos, len(cnd) - 1)
        hit = cnd[pos_c] == did
        did, dl, pos_h = did[hit], dl[hit], pos_c[hit]
        score = np.zeros(len(did), dtype=np.int64)
        for i in range(len(terms)):
            if idf[i] == 0:
                continue
            score += bm25_scores(tfm[i, pos_h], dl, int(idf[i]),
                                 n_docs, sumdl)
        m = score > 0
        did, score = did[m], score[m]
        order = np.lexsort((did, -score))[:k]
        return pa.table({"doc_id": pa.array(did[order]),
                         "score": pa.array(score[order])})

    tabs = [b for b in collect_tables(
        dlen.map_batches(score_block, batch_format="pyarrow",
                         batch_size=None)) if b.num_columns]
    if not tabs:
        return empty
    ct = pa.concat_tables(tabs)
    out_ids = ct["doc_id"].to_numpy(zero_copy_only=False)
    sc = ct["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((out_ids, -sc))[:k]
    return pa.table({
        "doc_id": pa.array(out_ids[order]),
        "score": pa.array(sc[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# fixed-size token chunking with stride (gated)
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 16
_CHUNK_STRIDE = 8


def chunk_ranges(counts: np.ndarray, size: int, stride: int):
    """Per-doc token counts -> (doc index, chunk id, start, length) arrays
    for every stride window (starts 0, stride, 2*stride, ... < count;
    zero-token docs emit nothing).  Pure offset arithmetic — no Python
    per doc.  Module-level for the hypothesis property test."""
    k = np.where(counts > 0, (counts + stride - 1) // stride, 0)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), k)
    kcum = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(k, out=kcum[1:])
    chunk_id = np.arange(int(k.sum()), dtype=np.int64) - kcum[doc_idx]
    start = chunk_id * stride
    length = np.minimum(start + size, counts[doc_idx]) - start
    return doc_idx, chunk_id, start, length


def q_chunk_documents(sf_dir: str):
    """Sliding-window training chunks: each document's whitespace tokens
    re-joined into windows of ``_CHUNK_TOKENS`` tokens every
    ``_CHUNK_STRIDE`` (the HF ``return_overflowing_tokens`` shape; the
    final window of a doc runs short rather than re-reading backwards).

    Pure per-batch map — chunking is embarrassingly parallel, nothing
    shuffles and nothing reaches the driver; output rows ~ 2x input
    tokens with this overlap, which is the operator's cost everywhere,
    not a plan artifact.  The window text is rebuilt from one ragged
    ``take`` + Arrow list re-offset + ``binary_join`` (the
    dup_span_removal rebuild recipe) so the kernel is loop-free."""
    from engine.text import _split_tokens

    def chunk(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(txt)
        counts = offs[1:] - offs[:-1]
        # whitespace-only/empty docs produce ONE zero-length artifact
        # token; treat them as zero-token (the '\S+' oracle sees [])
        flat_len = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        artifact = np.zeros(len(counts), dtype=np.int64)
        one_tok = counts == 1
        if one_tok.any():
            artifact[one_tok] = flat_len[offs[:-1][one_tok]] == 0
        counts = counts - artifact
        doc_idx, chunk_id, start, length = chunk_ranges(
            counts, _CHUNK_TOKENS, _CHUNK_STRIDE)
        tot = int(length.sum())
        lcum = np.zeros(len(length) + 1, dtype=np.int64)
        np.cumsum(length, out=lcum[1:])
        take = (np.arange(tot, dtype=np.int64)
                - np.repeat(lcum[:-1], length)
                + np.repeat(offs[:-1][doc_idx] + start, length))
        toks = flat.take(pa.array(take))
        chunks = pa.ListArray.from_arrays(pa.array(lcum, type=pa.int32()
                                                   if tot < 2**31
                                                   else pa.int64()), toks)
        text_out = pc.binary_join(chunks, " ")
        ids = pc.cast(t["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[doc_idx]),
            "chunk_id": pa.array(chunk_id),
            "n_tokens": pa.array(length),
            "chunk_text": text_out})

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(chunk, batch_format="pyarrow", batch_size=None) \
        .sort(["doc_id", "chunk_id"])


SQL_CHUNK_DOCUMENTS = rf"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
  FROM documents
), c AS (
  SELECT doc_id, w,
         unnest(generate_series(0, len(w) - 1, {_CHUNK_STRIDE})) AS start0
  FROM tok WHERE len(w) > 0
)
SELECT doc_id, (start0 // {_CHUNK_STRIDE})::BIGINT AS chunk_id,
       (least(start0 + {_CHUNK_TOKENS}, len(w)) - start0)::BIGINT
           AS n_tokens,
       array_to_string(list_slice(w, start0 + 1,
                                  least(start0 + {_CHUNK_TOKENS}, len(w))),
                       ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# BM25 retrieval with an integer-exact saturation term (gated)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("dup", "merge")
_BM25_K = 10
# k1 = 6/5, b = 3/4 folded into one integer fraction (x10 both sides):
#   tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl*N/SUMDL)
#   = 22*tf*SUMDL / (10*tf*SUMDL + 3*SUMDL + 9*dl*N)
# The per-term saturation is kept in MILLI resolution (x1000) before the
# idf multiply, so every intermediate is a plain integer and the DuckDB
# oracle states the identical nested floor divisions — the gate checks
# the SCORE itself, not a float approximation of it.
_BM25_SAT_SCALE = 22_000


def bm25_scores(tf: np.ndarray, dl: np.ndarray, idf: int, n_docs: int,
                sumdl: int) -> np.ndarray:
    """Per-doc integer BM25 term score: idf * milli-saturation.
    int64-safe while 22000 * max_tf * SUMDL < 2^63 (~2 x 10^14 corpus
    tokens at tf<=20); past that, rescale SUMDL/dl to kilo-tokens on
    BOTH sides — the fraction is scale-invariant up to the floor.
    Module-level for tests."""
    num = _BM25_SAT_SCALE * tf * sumdl
    den = 10 * tf * sumdl + 3 * sumdl + 9 * dl * n_docs
    sat = np.where(tf > 0, num // np.maximum(den, 1), 0)
    return idf * sat


def q_bm25_topk(sf_dir: str):
    """Disjunctive BM25 (Robertson-Sparck Jones) top-``_BM25_K`` over
    ``_BM25_TERMS`` — the doc-length-normalized upgrade of
    :func:`q_tfidf_topk`, same two linear passes and no shuffle:

    * pass 1 folds per-batch (df per term, token count) partials into
      the global df vector and SUMDL (driver state: |terms| + 1 ints);
    * pass 2 re-scans, scores each doc vectorized (one ``pc.equal`` +
      segment-sum per term, then :func:`bm25_scores`), and forwards only
      a per-batch top-K — the driver folds <= K x blocks id rows.

    idf is the repo's integer idf ((N * 1e6) // df — monotone with
    log-idf); the length saturation is exact integer arithmetic per the
    module constant's derivation.  The indexed swap is the same
    ``inverted_index_dir`` recipe as ``tfidf_topk_indexed`` (postings
    carry tf and dl)."""
    import pyarrow.parquet as _pq

    from engine.pipeline import collect_tables
    from engine.text import _segment_sums, _split_tokens
    terms = _BM25_TERMS
    k = _BM25_K

    def stats_partial(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        counts = offs[1:] - offs[:-1]
        flat_len = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        # whitespace-only docs: one zero-length artifact token
        art = np.zeros(len(counts), dtype=np.int64)
        one = counts == 1
        if one.any():
            art[one] = flat_len[offs[:-1][one]] == 0
        dl_sum = int((counts - art).sum())
        dfs = np.empty(len(terms), dtype=np.int64)
        for i, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            dfs[i] = int((_segment_sums(hit.astype(np.int64), offs) > 0)
                         .sum())
        return pa.table({
            "term_idx": pa.array(np.arange(len(terms), dtype=np.int64)),
            "df": pa.array(dfs),
            "dl_sum": pa.array(np.full(len(terms), dl_sum,
                                       dtype=np.int64))})

    parts = [b for b in collect_tables(
        _docs(sf_dir, ["text"]).map_batches(
            stats_partial, batch_format="pyarrow", batch_size=None))
        if b.num_columns]
    df_vec = np.zeros(len(terms), dtype=np.int64)
    sumdl = 0
    for b in parts:
        ti = b["term_idx"].to_numpy(zero_copy_only=False)
        df_vec[ti] += b["df"].to_numpy(zero_copy_only=False)
        sumdl += int(b["dl_sum"][0].as_py())
    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    idf = np.where(df_vec > 0,
                   (n_docs * _TFIDF_SCALE) // np.maximum(df_vec, 1),
                   0).astype(np.int64)

    def score_topk(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        counts = offs[1:] - offs[:-1]
        flat_len = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        art = np.zeros(len(counts), dtype=np.int64)
        one = counts == 1
        if one.any():
            art[one] = flat_len[offs[:-1][one]] == 0
        dl = counts - art
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        score = np.zeros(t.num_rows, dtype=np.int64)
        for i, term in enumerate(terms):
            if idf[i] == 0 or sumdl == 0:
                continue
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = _segment_sums(hit.astype(np.int64), offs)
            score += bm25_scores(tf, dl, int(idf[i]), n_docs, sumdl)
        m = score > 0
        ids, sc = ids[m], score[m]
        order = np.lexsort((ids, -sc))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "score": pa.array(sc[order])})

    tabs = [b for b in collect_tables(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            score_topk, batch_format="pyarrow", batch_size=None))
        if b.num_columns]
    if not tabs:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    ct = pa.concat_tables(tabs)
    ids = ct["doc_id"].to_numpy(zero_copy_only=False)
    sc = ct["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table({
        "doc_id": pa.array(ids[order]),
        "score": pa.array(sc[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


_BM25_T0, _BM25_T1 = _BM25_TERMS

SQL_BM25_TOPK = rf"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\S+') AS w
  FROM documents
), tf AS (
  SELECT doc_id, len(w)::HUGEINT AS dl,
         len(list_filter(w, x -> x = '{_BM25_T0}'))::HUGEINT AS tf0,
         len(list_filter(w, x -> x = '{_BM25_T1}'))::HUGEINT AS tf1
  FROM tok
), stats AS (
  SELECT count(*)::HUGEINT AS n, sum(dl) AS sumdl,
         count(*) FILTER (WHERE tf0 > 0)::HUGEINT AS df0,
         count(*) FILTER (WHERE tf1 > 0)::HUGEINT AS df1
  FROM tf
), scored AS (
  SELECT doc_id,
    (CASE WHEN tf0 > 0 AND df0 > 0 THEN
       ((n * {_TFIDF_SCALE}) // df0)
       * (({_BM25_SAT_SCALE} * tf0 * sumdl)
          // (10*tf0*sumdl + 3*sumdl + 9*dl*n)) ELSE 0 END
     + CASE WHEN tf1 > 0 AND df1 > 0 THEN
       ((n * {_TFIDF_SCALE}) // df1)
       * (({_BM25_SAT_SCALE} * tf1 * sumdl)
          // (10*tf1*sumdl + 3*sumdl + 9*dl*n)) ELSE 0 END)::BIGINT
       AS score
  FROM tf, stats
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {_BM25_K}
"""


# ---------------------------------------------------------------------------
# per-source vocabulary stats (gated)
# ---------------------------------------------------------------------------

def vocab_fold_block(t: pa.Table) -> pa.Table:
    """token-hash-partition kernel: global distinct (source, token) for
    the hashes this partition owns, folded straight to per-source
    (n_tokens, n_distinct) partials; total-token rows (kind=1) pass
    through pre-summed."""
    if t.num_rows == 0:
        return pa.schema([("source", pa.string()),
                          ("n_tokens", pa.int64()),
                          ("n_distinct", pa.int64())]).empty_table()
    kind = t["kind"].to_numpy(zero_copy_only=False)
    tot = t.filter(pa.array(kind == 1))
    dis = t.filter(pa.array(kind == 0))
    parts = []
    if tot.num_rows:
        g = pa.TableGroupBy(tot.select(["source", "n"]), ["source"]) \
            .aggregate([("n", "sum")])
        parts.append(pa.table({
            "source": g["source"],
            "n_tokens": pc.cast(g["n_sum"], pa.int64()),
            "n_distinct": pa.array(np.zeros(len(g), dtype=np.int64))}))
    if dis.num_rows:
        g = pa.TableGroupBy(dis.select(["source", "h"]), ["source", "h"]) \
            .aggregate([([], "count_all")])
        g2 = pa.TableGroupBy(g.select(["source"]), ["source"]) \
            .aggregate([([], "count_all")])
        parts.append(pa.table({
            "source": g2["source"],
            "n_tokens": pa.array(np.zeros(len(g2), dtype=np.int64)),
            "n_distinct": pc.cast(g2["count_all"], pa.int64())}))
    return pa.concat_tables(parts) if parts else pa.schema(
        [("source", pa.string()), ("n_tokens", pa.int64()),
         ("n_distinct", pa.int64())]).empty_table()


def q_vocab_stats(sf_dir: str):
    """Per-source vocabulary profile: total tokens, distinct tokens, and
    the type-token ratio (milli) — the Heaps-law / corpus-health numbers
    a mixture designer reads before weighting sources.

    One pass: each batch emits per-batch-distinct (token-hash, source)
    rows plus one total-count row per source; ONE hash-keyed exchange
    makes per-partition distinctness global (a partition owns every row
    of its hashes), and each partition folds to <= |sources| rows.  The
    token-hash is the oracle-shared 60-bit md5 prefix, hashed once per
    DISTINCT token per batch (the digest both engines count, so a
    collision merges the same pair on both sides)."""
    import hashlib as _hl

    from engine.stages import hash_group_exchange
    from engine.text import _split_tokens

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(pc.fill_null(txt, "")))
        counts = offs[1:] - offs[:-1]
        src = t["source"].to_numpy(zero_copy_only=False)
        empty = pa.schema([("h", pa.int64()), ("source", pa.string()),
                           ("n", pa.int64()),
                           ("kind", pa.int8())]).empty_table()
        if len(flat) == 0:
            return empty
        keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        codes, uniq = pd.factorize(flat.to_pandas(), sort=False)
        tok_src = np.repeat(src, counts)
        codes, tok_src = codes[keep], tok_src[keep]
        if len(codes) == 0:
            return empty
        # totals per source
        su, sc = np.unique(tok_src, return_counts=True)
        # distinct (source, token-code) in this batch
        scode, sinv = np.unique(tok_src, return_inverse=True)
        pair = np.unique(np.stack([sinv, codes.astype(np.int64)]), axis=1)
        hv = _md5_60_str(uniq)            # one md5 per distinct token
        out_h = hv[pair[1]]
        out_src = scode[pair[0]]
        return pa.table({
            "h": pa.array(np.concatenate(
                [out_h, -np.arange(1, len(su) + 1, dtype=np.int64)])),
            "source": pa.array(np.concatenate([out_src, su]),
                               type=pa.string()),
            "n": pa.array(np.concatenate(
                [np.zeros(pair.shape[1], dtype=np.int64), sc])),
            "kind": pa.array(np.concatenate(
                [np.zeros(pair.shape[1], dtype=np.int8),
                 np.ones(len(su), dtype=np.int8)]))})

    df = hash_group_exchange(
        lambda: _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["h"], vocab_fold_block,
        rows_hint=__import__("pyarrow.parquet", fromlist=["x"])
        .read_metadata(os.path.join(sf_dir, "documents.parquet"))
        .num_rows * 64)
    if df is None or df.empty or "source" not in df.columns:
        return pa.schema([("source", pa.string()),
                          ("n_tokens", pa.int64()),
                          ("n_distinct", pa.int64()),
                          ("ttr_milli", pa.int64())]).empty_table()
    agg = df.groupby("source", as_index=False).sum() \
        .sort_values("source", ignore_index=True)
    nt = agg["n_tokens"].astype(int)
    nd = agg["n_distinct"].astype(int)
    return pa.table({
        "source": pa.array(agg["source"], type=pa.string()),
        "n_tokens": pa.array(nt, type=pa.int64()),
        "n_distinct": pa.array(nd, type=pa.int64()),
        "ttr_milli": pa.array(1000 * nd // nt, type=pa.int64())})


def _md5_60_str(vals) -> np.ndarray:
    """60-bit md5 prefix of each STRING (not str(v) of arbitrary values
    — tokens are already text), matching
    ('0x' || substr(md5(w), 1, 15))::BIGINT."""
    import hashlib as _hl
    return np.array([int(_hl.md5(str(w).encode("utf-8")).hexdigest()[:15],
                         16) for w in vals], dtype=np.int64) \
        if len(vals) else np.zeros(0, dtype=np.int64)


SQL_VOCAB_STATS = r"""
WITH tk AS (
  SELECT source,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS w
  FROM documents
), d AS (
  SELECT source, count(*) AS n_tokens,
         count(DISTINCT ('0x' || substr(md5(w), 1, 15))::BIGINT)
           AS n_distinct
  FROM tk GROUP BY 1
)
SELECT source, n_tokens::BIGINT AS n_tokens,
       n_distinct::BIGINT AS n_distinct,
       ((1000 * n_distinct) // n_tokens)::BIGINT AS ttr_milli
FROM d ORDER BY source
"""


# ---------------------------------------------------------------------------
# pairwise source vocabulary overlap (gated)
# ---------------------------------------------------------------------------

def source_overlap_fold_block(t: pa.Table) -> pa.Table:
    """token-hash-partition kernel: for every hash this partition owns,
    expand its source set into ordered source pairs (vectorized segment
    k-choose-2) and fold to (source_a, source_b, inter) partials, plus
    per-source distinct-count partials (source_b = '') — |sources|² is
    tiny, the hash never leaves the partition."""
    empty = pa.schema([("source_a", pa.string()),
                       ("source_b", pa.string()),
                       ("n", pa.int64())]).empty_table()
    if t.num_rows == 0:
        return empty
    import pandas as pd
    g = pa.TableGroupBy(t.select(["h", "source"]), ["h", "source"]) \
        .aggregate([([], "count_all")])       # global distinct (h, source)
    h = g["h"].to_numpy(zero_copy_only=False)
    codes, srcs = pd.factorize(g["source"].to_pandas(), sort=True)
    order = np.lexsort((codes, h))
    h2, c2 = h[order], codes[order]
    new = np.ones(len(h2), dtype=bool)
    if len(h2) > 1:
        new[1:] = h2[1:] != h2[:-1]
    seg_start = np.flatnonzero(new)
    seg_id = np.cumsum(new) - 1
    local = np.arange(len(h2), dtype=np.int64) - seg_start[seg_id]
    b_idx = np.repeat(np.arange(len(h2), dtype=np.int64), local)
    csl = np.zeros(len(local) + 1, dtype=np.int64)
    np.cumsum(local, out=csl[1:])
    a_idx = (np.arange(csl[-1], dtype=np.int64)
             - np.repeat(csl[:-1], local)
             + np.repeat(seg_start[seg_id], local))
    parts = []
    if len(b_idx):
        pg = pa.TableGroupBy(pa.table({
            "source_a": pa.array(srcs[c2[a_idx]], type=pa.string()),
            "source_b": pa.array(srcs[c2[b_idx]], type=pa.string())}),
            ["source_a", "source_b"]).aggregate([([], "count_all")])
        parts.append(pa.table({
            "source_a": pg["source_a"], "source_b": pg["source_b"],
            "n": pc.cast(pg["count_all"], pa.int64())}))
    su, sc = np.unique(c2, return_counts=True)
    parts.append(pa.table({
        "source_a": pa.array(srcs[su], type=pa.string()),
        "source_b": pa.array([""] * len(su), type=pa.string()),
        "n": pa.array(sc.astype(np.int64))}))
    return pa.concat_tables(parts)


def q_source_overlap(sf_dir: str):
    """Vocabulary Jaccard between every source pair — which sources say
    the same things (mixture redundancy, dedup priority across
    acquisition channels).  Reuses the vocab exchange: distinct
    (token-hash, source) rows keyed by hash; each partition expands its
    hashes' source sets into pair partials and per-source vocabulary
    sizes, so the driver folds |sources|² scalars.  Pairs with an empty
    intersection are absent (the oracle's inner join)."""
    import pyarrow.parquet as _pq

    from engine.stages import hash_group_exchange
    from engine.text import _split_tokens

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(pc.fill_null(txt, "")))
        counts = offs[1:] - offs[:-1]
        src = t["source"].to_numpy(zero_copy_only=False)
        empty = pa.schema([("h", pa.int64()),
                           ("source", pa.string())]).empty_table()
        if len(flat) == 0:
            return empty
        keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        codes, uniq = pd.factorize(flat.to_pandas(), sort=False)
        tok_src = np.repeat(src, counts)
        codes, tok_src = codes[keep], tok_src[keep]
        if len(codes) == 0:
            return empty
        scode, sinv = np.unique(tok_src, return_inverse=True)
        pair = np.unique(np.stack([sinv, codes.astype(np.int64)]), axis=1)
        hv = _md5_60_str(uniq)
        return pa.table({"h": pa.array(hv[pair[1]]),
                         "source": pa.array(scode[pair[0]],
                                            type=pa.string())})

    nrows = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    df = hash_group_exchange(
        lambda: _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["h"], source_overlap_fold_block, rows_hint=nrows * 64)
    empty = pa.schema([("source_a", pa.string()),
                       ("source_b", pa.string()),
                       ("inter", pa.int64()),
                       ("jaccard_milli", pa.int64())]).empty_table()
    if df is None or df.empty or "source_a" not in df.columns:
        return empty
    agg = df.groupby(["source_a", "source_b"], as_index=False).sum()
    sizes = dict(zip(agg[agg.source_b == ""]["source_a"],
                     agg[agg.source_b == ""]["n"].astype(int)))
    pairs = agg[agg.source_b != ""].sort_values(
        ["source_a", "source_b"], ignore_index=True)
    if pairs.empty:
        return empty
    inter = pairs["n"].astype(int).to_numpy()
    va = pairs["source_a"].map(sizes).to_numpy()
    vb = pairs["source_b"].map(sizes).to_numpy()
    union = va + vb - inter
    return pa.table({
        "source_a": pa.array(pairs["source_a"], type=pa.string()),
        "source_b": pa.array(pairs["source_b"], type=pa.string()),
        "inter": pa.array(inter, type=pa.int64()),
        "jaccard_milli": pa.array(1000 * inter // union, type=pa.int64())})


SQL_SOURCE_OVERLAP = r"""
WITH tk AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
  FROM (SELECT source,
               unnest(regexp_extract_all(lower(coalesce(text, '')),
                                         '\S+')) AS w
        FROM documents)
), v AS (
  SELECT source, count(*) AS nv FROM tk GROUP BY 1
), i AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*)::BIGINT AS inter
  FROM tk a JOIN tk b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, inter,
       ((1000 * inter) // (va.nv + vb.nv - inter))::BIGINT
         AS jaccard_milli
FROM i
JOIN v va ON va.source = source_a
JOIN v vb ON vb.source = source_b
"""


# ---------------------------------------------------------------------------
# per-source unigram entropy (rows-only: log is not value-hash-safe)
# ---------------------------------------------------------------------------

def entropy_fold_block(t: pa.Table) -> pa.Table:
    """token-hash-partition kernel: global per-(source, token) counts for
    the hashes this partition owns, folded to the per-source partials of
    the exact entropy decomposition H = log N - (sum n*log n) / N."""
    if t.num_rows == 0:
        return pa.schema([("source", pa.string()),
                          ("n", pa.int64()),
                          ("nlogn", pa.float64())]).empty_table()
    g = pa.TableGroupBy(t.select(["h", "source", "n"]), ["h", "source"]) \
        .aggregate([("n", "sum")])
    n = pc.cast(g["n_sum"], pa.int64()).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    out = pa.TableGroupBy(pa.table({
        "source": g["source"],
        "n": pc.cast(g["n_sum"], pa.int64()),
        "nlogn": pa.array(n * np.log(n))}), ["source"]) \
        .aggregate([("n", "sum"), ("nlogn", "sum")])
    return pa.table({"source": out["source"],
                     "n": pc.cast(out["n_sum"], pa.int64()),
                     "nlogn": out["nlogn_sum"]})


def q_token_entropy(sf_dir: str):
    """Per-source unigram (token) Shannon entropy in nats, plus the
    perplexity — how diverse each source's word distribution is (a
    templated/boilerplate source scores low; the mixture designer's
    diversity signal next to q_vocab_stats' type-token ratio).

    Exactly decomposable: H = log N - (sum over tokens of n log n) / N,
    so each token's contribution is computed where its GLOBAL count
    lives (one token-hash exchange, partition owns the hash) and the
    driver folds |sources| (N, sum n log n) scalar pairs.  Rows-only
    (log is not value-hash-safe across engines); pinned against a
    single-process numpy computation in tests."""
    import pyarrow.parquet as _pq

    from engine.stages import hash_group_exchange
    from engine.text import _split_tokens

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(pc.fill_null(txt, "")))
        counts = offs[1:] - offs[:-1]
        src = t["source"].to_numpy(zero_copy_only=False)
        empty = pa.schema([("h", pa.int64()), ("source", pa.string()),
                           ("n", pa.int64())]).empty_table()
        if len(flat) == 0:
            return empty
        keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        codes, uniq = pd.factorize(flat.to_pandas(), sort=False)
        tok_src = np.repeat(src, counts)
        codes, tok_src = codes[keep], tok_src[keep]
        if len(codes) == 0:
            return empty
        scode, sinv = np.unique(tok_src, return_inverse=True)
        key = sinv * len(uniq) + codes
        ku, kc = np.unique(key, return_counts=True)
        hv = _md5_60_str(uniq)
        return pa.table({
            "h": pa.array(hv[ku % len(uniq)]),
            "source": pa.array(scode[ku // len(uniq)], type=pa.string()),
            "n": pa.array(kc.astype(np.int64))})

    nrows = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    df = hash_group_exchange(
        lambda: _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["h"], entropy_fold_block, rows_hint=nrows * 64)
    if df is None or df.empty or "source" not in df.columns:
        return pa.schema([("source", pa.string()),
                          ("n_tokens", pa.int64()),
                          ("entropy_nats", pa.float64()),
                          ("perplexity", pa.float64())]).empty_table()
    agg = df.groupby("source", as_index=False).sum() \
        .sort_values("source", ignore_index=True)
    n = agg["n"].astype(float).to_numpy()
    ent = np.log(n) - agg["nlogn"].to_numpy() / n
    ent = np.round(ent, 9)
    return pa.table({
        "source": pa.array(agg["source"], type=pa.string()),
        "n_tokens": pa.array(agg["n"].astype(int), type=pa.int64()),
        "entropy_nats": pa.array(ent, type=pa.float64()),
        "perplexity": pa.array(np.round(np.exp(ent), 6),
                               type=pa.float64())})
