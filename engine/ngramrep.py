"""Gopher n-gram repetition signals (Rae et al. 2021, arXiv:2112.11446,
table A1) — the word-n-gram half of the repetition-removal family that
``filters.q_repetition_filter`` (duplicate lines / top word) started:

* ``top2_milli`` / ``top3_milli`` — fraction of token characters inside
  occurrences of the single most character-covering 2-gram / 3-gram
  (count x gram-chars, overlapping occurrences all counted, spaces
  excluded), in exact integer millis.
* ``dup5_milli`` — fraction of token characters COVERED by any 5-gram
  that occurs at least twice in the document (overlap-unioned coverage,
  the same diff-array trick as ``filters._covered_from_starts``).

Pure map over the documents table — zero shuffle at any corpus size; the
per-batch kernel is one factorize + O(n-1) integer re-encodes + lexsorts
over the flat token stream, no Python over rows/tokens.  Gate-exact by
construction: every output is an integer ``//`` ratio and the SQL builds
the identical n-gram multiset (newline-joined tokens cannot collide —
tokens are ``\\S+`` so they never contain ``chr(10)``).

Reference scope note: the reference engine (src/parser.py) has no
corpus-quality operators; this module is part of the beyond-reference
LLM-data family the build brief asks for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.text import _split_tokens, _segment_sums

# Gopher table A1 thresholds (fractions -> millis): top-2-gram 0.20,
# top-3-gram 0.18, duplicated-5-gram 0.15.
_TOP2_MILLI_MAX = 200
_TOP3_MILLI_MAX = 180
_DUP5_MILLI_MAX = 150


def _ngram_group_keys(codes: np.ndarray, doc: np.ndarray, n: int):
    """(token codes, token doc ids) -> (start positions, gram codes) for
    all length-``n`` word grams that do not cross a document boundary.

    Gram identity is built by iterative pair re-encoding (``np.unique``
    on ``prev_code * alphabet + next_token``), so the packed key never
    exceeds ``len(codes)**2`` regardless of ``n`` — no ``V**n`` overflow.
    """
    m = len(codes)
    if m < n:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    g = codes.astype(np.int64)
    alpha = np.int64(m + 1)
    for k in range(1, n):
        key = g[: m - k] * alpha + codes[k:]
        _, g = np.unique(key, return_inverse=True)
        g = g.astype(np.int64)
    starts = np.arange(m - n + 1, dtype=np.int64)
    valid = doc[: m - n + 1] == doc[n - 1:]
    return starts[valid], g[valid]


def gopher_ngram_batch(t: pa.Table) -> pa.Table:
    """Per-batch kernel (module-level for test reuse and cloudpickle-by-
    reference shipping)."""
    ndocs = t.num_rows
    flat, offs = _split_tokens(pc.utf8_lower(
        t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
        else t["text"]))
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_all = np.repeat(np.arange(ndocs, dtype=np.int64),
                        offs[1:] - offs[:-1])
    keep = lens > 0  # the [''] artifact token of an empty doc
    codes_all, _ = pd.factorize(flat.to_pandas(), sort=False)
    codes = codes_all[keep].astype(np.int64)
    doc = doc_all[keep]
    tlen = lens[keep]
    m = len(codes)

    n_words = np.bincount(doc, minlength=ndocs).astype(np.int64)
    tot_chars = np.zeros(ndocs, dtype=np.int64)
    np.add.at(tot_chars, doc, tlen)
    # prefix char sums for O(1) gram-chars: gchars(j, n) = cum[j+n]-cum[j]
    cum = np.concatenate(([0], np.cumsum(tlen)))

    def top_best(n: int) -> np.ndarray:
        starts, grams = _ngram_group_keys(codes, doc, n)
        best = np.zeros(ndocs, dtype=np.int64)
        if len(starts) == 0:
            return best
        key = doc[starts] * np.int64(m + 1) + grams
        uniq, first, counts = np.unique(key, return_index=True,
                                        return_counts=True)
        s0 = starts[first]
        gchars = cum[s0 + n] - cum[s0]
        np.maximum.at(best, doc[s0], counts * gchars)
        return best

    best2 = top_best(2)
    best3 = top_best(3)

    # duplicated-5-gram coverage (overlap-unioned, per doc)
    starts5, grams5 = _ngram_group_keys(codes, doc, 5)
    cov_chars = np.zeros(ndocs, dtype=np.int64)
    if len(starts5):
        key5 = doc[starts5] * np.int64(m + 1) + grams5
        order = np.argsort(key5, kind="stable")
        ks = key5[order]
        gfirst = np.ones(len(ks), dtype=bool)
        gfirst[1:] = ks[1:] != ks[:-1]
        gidx = np.cumsum(gfirst) - 1
        gsize = np.bincount(gidx)
        dup_starts = starts5[order[gsize[gidx] >= 2]]
        if len(dup_starts):
            diff = np.zeros(m + 5, dtype=np.int64)
            np.add.at(diff, dup_starts, 1)
            np.add.at(diff, dup_starts + 5, -1)
            covered = np.cumsum(diff[:m]) > 0
            np.add.at(cov_chars, doc[covered], tlen[covered])

    div = np.maximum(tot_chars, 1)
    top2 = np.where(tot_chars > 0, best2 * 1000 // div, 0)
    top3 = np.where(tot_chars > 0, best3 * 1000 // div, 0)
    dup5 = np.where(tot_chars > 0, cov_chars * 1000 // div, 0)
    return pa.table({
        "doc_id": pc.cast(t["doc_id"], pa.int64()),
        "n_words": pa.array(n_words),
        "tot_chars": pa.array(tot_chars),
        "top2_milli": pa.array(top2),
        "top3_milli": pa.array(top3),
        "dup5_milli": pa.array(dup5),
        "flagged": pa.array((top2 > _TOP2_MILLI_MAX)
                            | (top3 > _TOP3_MILLI_MAX)
                            | (dup5 > _DUP5_MILLI_MAX)),
    })


def q_gopher_ngram_repetition(sf_dir: str):
    import os
    import ray
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    return ds.map_batches(gopher_ngram_batch, batch_format="pyarrow",
                          batch_size=None)


SQL_GOPHER_NGRAM_REPETITION = rf"""
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '\S+') AS ts
  FROM documents
), tot AS (
  SELECT doc_id, len(ts)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(ts, t -> length(t))), 0)::BIGINT
           AS tot_chars
  FROM toks
), pos AS (
  SELECT doc_id, ts, unnest(range(1, len(ts) + 1))::BIGINT AS i FROM toks
), t2 AS (
  SELECT doc_id, max(c * gchars)::BIGINT AS best FROM (
    SELECT doc_id, gram, count(*)::BIGINT AS c,
           any_value(gchars)::BIGINT AS gchars
    FROM (
      SELECT doc_id, ts[i] || chr(10) || ts[i+1] AS gram,
             (length(ts[i]) + length(ts[i+1]))::BIGINT AS gchars
      FROM pos WHERE i + 1 <= len(ts))
    GROUP BY 1, 2)
  GROUP BY 1
), t3 AS (
  SELECT doc_id, max(c * gchars)::BIGINT AS best FROM (
    SELECT doc_id, gram, count(*)::BIGINT AS c,
           any_value(gchars)::BIGINT AS gchars
    FROM (
      SELECT doc_id,
             ts[i] || chr(10) || ts[i+1] || chr(10) || ts[i+2] AS gram,
             (length(ts[i]) + length(ts[i+1]) + length(ts[i+2]))::BIGINT
               AS gchars
      FROM pos WHERE i + 2 <= len(ts))
    GROUP BY 1, 2)
  GROUP BY 1
), g5 AS (
  SELECT doc_id, i,
         ts[i] || chr(10) || ts[i+1] || chr(10) || ts[i+2] || chr(10)
           || ts[i+3] || chr(10) || ts[i+4] AS gram
  FROM pos WHERE i + 4 <= len(ts)
), g5d AS (
  SELECT doc_id, gram FROM g5 GROUP BY 1, 2 HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT g5.doc_id, unnest(range(g5.i, g5.i + 5))::BIGINT AS p
    FROM g5 JOIN g5d USING (doc_id, gram))
), covc AS (
  SELECT cov.doc_id, sum(length(toks.ts[cov.p]))::BIGINT AS cov_chars
  FROM cov JOIN toks USING (doc_id)
  GROUP BY 1
)
SELECT t.doc_id, t.n_words, t.tot_chars,
  (CASE WHEN t.tot_chars = 0 THEN 0
        ELSE coalesce(t2.best, 0) * 1000 // t.tot_chars END)::BIGINT
    AS top2_milli,
  (CASE WHEN t.tot_chars = 0 THEN 0
        ELSE coalesce(t3.best, 0) * 1000 // t.tot_chars END)::BIGINT
    AS top3_milli,
  (CASE WHEN t.tot_chars = 0 THEN 0
        ELSE coalesce(cc.cov_chars, 0) * 1000 // t.tot_chars END)::BIGINT
    AS dup5_milli,
  ((CASE WHEN t.tot_chars = 0 THEN 0
         ELSE coalesce(t2.best, 0) * 1000 // t.tot_chars END)
     > {_TOP2_MILLI_MAX}
   OR (CASE WHEN t.tot_chars = 0 THEN 0
            ELSE coalesce(t3.best, 0) * 1000 // t.tot_chars END)
     > {_TOP3_MILLI_MAX}
   OR (CASE WHEN t.tot_chars = 0 THEN 0
            ELSE coalesce(cc.cov_chars, 0) * 1000 // t.tot_chars END)
     > {_DUP5_MILLI_MAX}) AS flagged
FROM tot t
LEFT JOIN t2 USING (doc_id)
LEFT JOIN t3 USING (doc_id)
LEFT JOIN covc cc USING (doc_id)
"""
