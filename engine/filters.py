"""Content-filtering operators a training-data pipeline runs before
training: Gopher-style repetition metrics, corpus-wide line-level dedup
(CCNet shape), PII/URL redaction, and corpus-frequency commonness scoring.

All DuckDB-gated (md5 is the shared digest, RE2 the shared regex engine,
everything else integer-exact).  Reference parity: the reference engine has
no corpus-filtering stage — these extend it with the LLM-data operators the
task brief lists as first-class; the *shapes* reuse this repo's proven
patterns (combiner-first partial aggregates, broadcast small sides,
segment-sum token kernels from engine/text.py).

Scale notes (100 TB):
* ``q_repetition_filter`` is a pure map — no shuffle at any scale.
* ``q_line_dedup`` shuffles one row per DISTINCT (batch, line-hash) — the
  combiner-first shape; the broadcast "common lines" side is only the
  lines that repeat corpus-wide (boilerplate is heavy-tailed: small).
  If it ever isn't, switch to the semi-join path like engine/curate.py.
* ``q_pii_redact`` is a pure map (RE2 passes + one md5/row for the gate
  fingerprint; drop the fingerprint column in production for zero
  per-row Python).
* ``q_unigram_commonness`` does ONE word-count shuffle (partials first)
  capped to a ``_VOCAB_K`` broadcast vocabulary — the same two-pass
  build-small-then-broadcast shape as engine/revisions.py.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.io import read_parquet_clean
from engine.text import _split_tokens, _segment_sums

_TRIM_CHARS = " \t\r"  # explicit char set: DuckDB trim(s, chars) parity


def _docs(sf_dir: str, columns=None):
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns)


def _split_lines(texts):
    """texts -> (flat trimmed line array, per-doc offsets).  Nulls are empty
    docs; lines are '\\n'-separated, trimmed with an explicit char set so
    the DuckDB oracle (trim(line, ' \\t\\r')) matches byte-for-byte."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    w = pc.split_pattern(pc.fill_null(texts, ""), pattern="\n")
    if isinstance(w, pa.ChunkedArray):
        w = w.combine_chunks()
    flat = pc.utf8_trim(w.values, characters=_TRIM_CHARS)
    return flat, w.offsets.to_numpy().astype(np.int64)


# ---------------------------------------------------------------------------
# Gopher-style repetition metrics (gated)
# ---------------------------------------------------------------------------

_DUP_LINE_MILLI_MAX = 300   # >30% duplicate lines -> flagged
_TOP_WORD_MILLI_MAX = 200   # top word >20% of tokens -> flagged


def q_repetition_filter(sf_dir: str):
    """Per-document repetition metrics (the Gopher repetition-removal
    family): duplicate-line fraction and most-frequent-word fraction, both
    as exact integer millis, plus the pass/flag verdict.  Pure map — the
    per-doc distinct/max counts are computed from ONE factorize + ONE
    lexsort over the batch's flat line/token streams (no Python over rows).
    """
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # --- lines ---------------------------------------------------------
        lines, loffs = _split_lines(t["text"])
        nonempty = pc.greater(pc.utf8_length(lines), 0).to_numpy(
            zero_copy_only=False)
        n_lines = _segment_sums(nonempty.astype(np.int64), loffs)
        codes, _ = pd.factorize(lines.to_pandas(), sort=False)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), loffs[1:] - loffs[:-1])
        m = nonempty
        c2, d2 = codes[m], doc_idx[m]
        order = np.lexsort((c2, d2))
        c2, d2 = c2[order], d2[order]
        first = np.ones(len(c2), dtype=bool)
        if len(c2) > 1:
            first[1:] = (c2[1:] != c2[:-1]) | (d2[1:] != d2[:-1])
        n_distinct = np.zeros(n, dtype=np.int64)
        np.add.at(n_distinct, d2[first], 1)
        n_dup = n_lines - n_distinct
        dup_milli = np.where(n_lines > 0, n_dup * 1000 // np.maximum(n_lines, 1), 0)
        # --- words ---------------------------------------------------------
        flat, woffs = _split_tokens(pc.utf8_lower(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]))
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        wcodes, _ = pd.factorize(flat.to_pandas(), sort=False)
        wdoc = np.repeat(np.arange(n, dtype=np.int64), woffs[1:] - woffs[:-1])
        wm = wlen > 0  # utf8_split_whitespace('') -> [''] artifact token
        n_words = _segment_sums(wm.astype(np.int64), woffs)
        wc, wd = wcodes[wm], wdoc[wm]
        worder = np.lexsort((wc, wd))
        wc, wd = wc[worder], wd[worder]
        wfirst = np.ones(len(wc), dtype=bool)
        if len(wc) > 1:
            wfirst[1:] = (wc[1:] != wc[:-1]) | (wd[1:] != wd[:-1])
        # run lengths of each (doc, word) group, then per-doc max run
        starts = np.flatnonzero(wfirst)
        run_len = np.diff(np.append(starts, len(wc)))
        top_word = np.zeros(n, dtype=np.int64)
        if len(starts):
            np.maximum.at(top_word, wd[starts], run_len)
        top_milli = np.where(n_words > 0,
                             top_word * 1000 // np.maximum(n_words, 1), 0)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_lines": pa.array(n_lines),
            "n_dup_lines": pa.array(n_dup),
            "dup_line_milli": pa.array(dup_milli),
            "n_words": pa.array(n_words),
            "top_word_milli": pa.array(top_milli),
            "flagged": pa.array((dup_milli > _DUP_LINE_MILLI_MAX)
                                | (top_milli > _TOP_WORD_MILLI_MAX)),
        })
    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None)


SQL_REPETITION_FILTER = rf"""
WITH l AS (
  SELECT doc_id::BIGINT AS doc_id,
         trim(unnest(string_split(coalesce(text, ''), chr(10))),
              ' ' || chr(9) || chr(13)) AS line
  FROM documents
), lc AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
         count(DISTINCT line)::BIGINT AS n_distinct
  FROM l WHERE line <> '' GROUP BY 1
), w AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS word
  FROM documents
), wc AS (
  SELECT doc_id, word, count(*)::BIGINT AS c FROM w GROUP BY 1, 2
), wt AS (
  SELECT doc_id, sum(c)::BIGINT AS n_words, max(c)::BIGINT AS top_c
  FROM wc GROUP BY 1
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(lc.n_lines, 0)::BIGINT AS n_lines,
       (coalesce(lc.n_lines, 0) - coalesce(lc.n_distinct, 0))::BIGINT
         AS n_dup_lines,
       CASE WHEN coalesce(lc.n_lines, 0) = 0 THEN 0
            ELSE (lc.n_lines - lc.n_distinct) * 1000 // lc.n_lines
       END::BIGINT AS dup_line_milli,
       coalesce(wt.n_words, 0)::BIGINT AS n_words,
       CASE WHEN coalesce(wt.n_words, 0) = 0 THEN 0
            ELSE wt.top_c * 1000 // wt.n_words END::BIGINT AS top_word_milli,
       (CASE WHEN coalesce(lc.n_lines, 0) = 0 THEN 0
             ELSE (lc.n_lines - lc.n_distinct) * 1000 // lc.n_lines END
          > {_DUP_LINE_MILLI_MAX}
        OR CASE WHEN coalesce(wt.n_words, 0) = 0 THEN 0
                ELSE wt.top_c * 1000 // wt.n_words END
          > {_TOP_WORD_MILLI_MAX}) AS flagged
FROM documents d
LEFT JOIN lc ON lc.doc_id = d.doc_id::BIGINT
LEFT JOIN wt ON wt.doc_id = d.doc_id::BIGINT
"""


# ---------------------------------------------------------------------------
# corpus-wide line-level dedup (CCNet shape; gated)
# ---------------------------------------------------------------------------

_LINE_DUP_K = 2  # a line occurring >= K times corpus-wide is boilerplate


def _line_hashes_i64(flat: pa.StringArray) -> np.ndarray:
    """md5-derived 60-bit line hashes (the only digest shared with the
    oracle); hashed once per DISTINCT line in the batch, not per line."""
    codes, uniq = pd.factorize(flat.to_pandas(), sort=False)
    hv = np.array([int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
                   for s in uniq], dtype=np.int64)
    return hv[codes] if len(codes) else np.zeros(0, dtype=np.int64)


def q_line_dedup(sf_dir: str):
    """Corpus-level line dedup accounting (the CCNet stage that strips
    boilerplate lines shared across pages): for every doc, how many of its
    nonempty lines occur >= ``_LINE_DUP_K`` times in the whole corpus, and
    the kept fraction after removing them.

    Two passes: (1) combiner-first line-hash counting — each batch emits
    one row per distinct line hash, a single small-key groupby folds them,
    and only hashes with count >= K (the boilerplate set, heavy-tail
    small) reach the driver; (2) a broadcast ``np.isin`` per batch.  The
    doc side never shuffles."""
    import ray
    from ray.data.aggregate import Sum
    from engine.pipeline import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _split_lines(t["text"])
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        hv = _line_hashes_i64(flat)[keep]
        if not len(hv):
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(hv, return_counts=True)
        return pa.table({"h": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    folded = _docs(sf_dir, ["text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("h").aggregate(Sum("cnt", alias_name="cnt"))
    tabs = [b for b in collect_tables(folded) if b.num_columns]
    if tabs:
        ct = pa.concat_tables(tabs)
        cnt = ct["cnt"].to_numpy(zero_copy_only=False)
        common = np.sort(ct["h"].to_numpy(zero_copy_only=False)[cnt >= _LINE_DUP_K])
    else:
        common = np.zeros(0, dtype=np.int64)
    common_ref = ray.put(common)

    def mark(t: pa.Table) -> pa.Table:
        boiler = ray.get(common_ref)
        flat, offs = _split_lines(t["text"])
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        hv = _line_hashes_i64(flat)
        n_lines = _segment_sums(keep.astype(np.int64), offs)
        is_common = np.isin(hv, boiler) & keep
        n_common = _segment_sums(is_common.astype(np.int64), offs)
        m = n_lines > 0
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        nl, nc = n_lines[m], n_common[m]
        return pa.table({
            "doc_id": pa.array(ids[m]),
            "n_lines": pa.array(nl),
            "n_common": pa.array(nc),
            "kept_milli": pa.array((nl - nc) * 1000 // nl),
        })
    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(mark, batch_format="pyarrow", batch_size=None)


SQL_LINE_DEDUP = f"""
WITH l AS (
  SELECT doc_id::BIGINT AS doc_id,
         trim(unnest(string_split(coalesce(text, ''), chr(10))),
              ' ' || chr(9) || chr(13)) AS line
  FROM documents
), ln AS (
  SELECT doc_id, ('0x' || substr(md5(line), 1, 15))::BIGINT AS h
  FROM l WHERE line <> ''
), g AS (
  SELECT h, count(*) AS cnt FROM ln GROUP BY 1
)
SELECT ln.doc_id,
       count(*)::BIGINT AS n_lines,
       sum(CASE WHEN g.cnt >= {_LINE_DUP_K} THEN 1 ELSE 0 END)::BIGINT
         AS n_common,
       ((count(*) - sum(CASE WHEN g.cnt >= {_LINE_DUP_K} THEN 1 ELSE 0 END))
         * 1000 // count(*))::BIGINT AS kept_milli
FROM ln JOIN g USING (h)
GROUP BY ln.doc_id
"""


# ---------------------------------------------------------------------------
# PII / URL redaction (gated)
# ---------------------------------------------------------------------------

# RE2-safe patterns, identical in Arrow and DuckDB.  Replacement order
# matters (a URL may contain digits/@): URL -> EMAIL -> digit runs.
_URL_RE = r"https?://[^\s]+"
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
_NUM_RE = r"[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+"   # 7+ digit runs


def q_pii_redact(sf_dir: str):
    """Sequential RE2 redaction of URLs, emails and long digit runs
    (phone/SSN-shaped), with per-stage match counts and an md5 fingerprint
    of the redacted text so the gate verifies the REPLACEMENT bytes, not
    just the counts.  Null text propagates as null everywhere (md5(NULL)
    is NULL in the oracle too).  Pure map; the md5 column is gate
    instrumentation — production redaction is the three RE2 passes only."""
    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n_urls = pc.count_substring_regex(txt, _URL_RE)
        s1 = pc.replace_substring_regex(txt, _URL_RE, "<URL>")
        n_emails = pc.count_substring_regex(s1, _EMAIL_RE)
        s2 = pc.replace_substring_regex(s1, _EMAIL_RE, "<EMAIL>")
        n_nums = pc.count_substring_regex(s2, _NUM_RE)
        s3 = pc.replace_substring_regex(s2, _NUM_RE, "<NUM>")
        fp = [None if s is None else hashlib.md5(s.encode("utf-8")).hexdigest()
              for s in s3.to_pylist()]
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_urls": pc.cast(n_urls, pa.int64()),
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_digit_runs": pc.cast(n_nums, pa.int64()),
            "n_chars_redacted": pc.cast(pc.utf8_length(s3), pa.int64()),
            "redacted_fp": pa.array(fp, type=pa.string()),
        })
    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None)


SQL_PII_REDACT = rf"""
WITH s0 AS (SELECT doc_id::BIGINT AS doc_id, text FROM documents),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_URL_RE}'))::BIGINT AS n_urls,
         regexp_replace(text, '{_URL_RE}', '<URL>', 'g') AS t FROM s0
), s2 AS (
  SELECT doc_id, n_urls,
         len(regexp_extract_all(t, '{_EMAIL_RE}'))::BIGINT AS n_emails,
         regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t FROM s1
), s3 AS (
  SELECT doc_id, n_urls, n_emails,
         len(regexp_extract_all(t, '{_NUM_RE}'))::BIGINT AS n_digit_runs,
         regexp_replace(t, '{_NUM_RE}', '<NUM>', 'g') AS t FROM s2
)
SELECT doc_id, n_urls, n_emails, n_digit_runs,
       length(t)::BIGINT AS n_chars_redacted,
       md5(t) AS redacted_fp
FROM s3
"""


# ---------------------------------------------------------------------------
# corpus-frequency commonness score (gated)
# ---------------------------------------------------------------------------

_VOCAB_K = 65536   # broadcast vocabulary cap (count desc, word asc)


def q_unigram_commonness(sf_dir: str):
    """Unigram corpus-frequency score (the integer-exact stand-in for LM
    log-prob quality filtering): pass 1 builds the corpus word-frequency
    vocabulary (combiner-first partials -> one word-key groupby -> a
    deterministic top-``_VOCAB_K`` cut), pass 2 broadcasts it and scores
    each doc as (sum of its tokens' corpus counts; OOV counts 0) * 1000 //
    n_tokens.  Rare-word-heavy (low-score) docs are the removal candidates.
    """
    import ray
    from ray.data.aggregate import Sum
    from engine.pipeline import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _split_tokens(pc.utf8_lower(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]))
        codes, uniq = pd.factorize(flat.to_pandas(), sort=False)
        if not len(uniq):
            return pa.table({"word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        wlen = np.array([len(w) for w in uniq], dtype=np.int64)
        keep = wlen > 0
        return pa.table({"word": pa.array(uniq[keep], type=pa.string()),
                         "cnt": pa.array(counts[keep])})

    folded = _docs(sf_dir, ["text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
    tabs = [b for b in collect_tables(folded) if b.num_columns]
    if tabs:
        vt = pa.concat_tables(tabs).to_pandas()
        vt = vt.sort_values(["cnt", "word"], ascending=[False, True],
                            ignore_index=True).head(_VOCAB_K)
        vocab_words = pd.Index(vt["word"])
        vocab_counts = vt["cnt"].to_numpy().astype(np.int64)
    else:
        vocab_words, vocab_counts = pd.Index([]), np.zeros(0, dtype=np.int64)
    vocab_ref = ray.put((vocab_words, vocab_counts))

    def score(t: pa.Table) -> pa.Table:
        words, counts = ray.get(vocab_ref)
        flat, offs = _split_tokens(pc.utf8_lower(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]))
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        idx = words.get_indexer(flat.to_pandas()) if len(words) else \
            np.full(len(flat), -1, dtype=np.int64)
        looked_up = counts[np.maximum(idx, 0)] if len(counts) else \
            np.zeros(len(idx), dtype=np.int64)
        tok_cnt = np.where((idx >= 0) & (wlen > 0), looked_up, 0)
        sums = _segment_sums(tok_cnt.astype(np.int64), offs)
        n_tok = _segment_sums((wlen > 0).astype(np.int64), offs)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        m = n_tok > 0
        return pa.table({
            "doc_id": pa.array(ids[m]),
            "n_tokens": pa.array(n_tok[m]),
            "common_sum": pa.array(sums[m]),
            "commonness_milli": pa.array(sums[m] * 1000 // n_tok[m]),
        })
    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(score, batch_format="pyarrow", batch_size=None)


# Gopher table A1 format thresholds (Rae et al. 2021): >90% bullet
# lines, >30% ellipsis lines, mean word length outside [3, 10] chars,
# <80% alphabetic words, symbol-to-word ratio > 0.1.
_BULLET_MILLI_MAX = 900
_ELLIPSIS_MILLI_MAX = 300
_MWL_CENTI_MIN, _MWL_CENTI_MAX = 300, 1000
_ALPHA_MILLI_MIN = 800
_SYMBOL_MILLI_MAX = 100


def q_gopher_format_filter(sf_dir: str):
    """The FORMAT half of Gopher's quality rules (the repetition half is
    ``q_repetition_filter`` + ``ngramrep``): per doc the bullet-line and
    ellipsis-line fractions, mean word length (integer centi-chars),
    alphabetic-word fraction, '#'/'...'-symbol-per-word rate — all exact
    integer ratios — and the combined drop verdict.

    Pure map, zero shuffle; every predicate is an RE2 the SQL oracle
    shares verbatim (Arrow and DuckDB both use RE2).  Fixture texts have
    no bullets/ellipses, so a planted pytest exercises those paths (the
    ``dup5`` precedent)."""
    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks() \
            if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        lines, loffs = _split_lines(txt)
        nonempty = pc.greater(pc.utf8_length(lines), 0).to_numpy(
            zero_copy_only=False)
        bullet = pc.match_substring_regex(lines, r"^[-*•]").to_numpy(
            zero_copy_only=False) & nonempty
        ellip = pc.match_substring_regex(
            lines, r"(\.\.\.|…)$").to_numpy(zero_copy_only=False) \
            & nonempty
        n_lines = _segment_sums(nonempty.astype(np.int64), loffs)
        n_bullet = _segment_sums(bullet.astype(np.int64), loffs)
        n_ellip = _segment_sums(ellip.astype(np.int64), loffs)

        flat, woffs = _split_tokens(txt)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False) & (wlen > 0)
        n_words = _segment_sums((wlen > 0).astype(np.int64), woffs)
        n_alpha = _segment_sums(alpha.astype(np.int64), woffs)
        tot_chars = _segment_sums(np.where(wlen > 0, wlen, 0)
                                  .astype(np.int64), woffs)
        filled = pc.fill_null(txt, "")
        n_hash = pc.count_substring(filled, "#").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_dots = pc.count_substring(filled, "...").to_numpy(
            zero_copy_only=False).astype(np.int64)

        dl = np.maximum(n_lines, 1)
        dw = np.maximum(n_words, 1)
        bullet_milli = np.where(n_lines > 0, n_bullet * 1000 // dl, 0)
        ellipsis_milli = np.where(n_lines > 0, n_ellip * 1000 // dl, 0)
        mwl_centi = np.where(n_words > 0, tot_chars * 100 // dw, 0)
        alpha_milli = np.where(n_words > 0, n_alpha * 1000 // dw, 0)
        symbol_milli = np.where(n_words > 0,
                                (n_hash + n_dots) * 1000 // dw, 0)
        flagged = (bullet_milli > _BULLET_MILLI_MAX) \
            | (ellipsis_milli > _ELLIPSIS_MILLI_MAX) \
            | ((n_words > 0) & ((mwl_centi < _MWL_CENTI_MIN)
                                | (mwl_centi > _MWL_CENTI_MAX))) \
            | ((n_words > 0) & (alpha_milli < _ALPHA_MILLI_MIN)) \
            | (symbol_milli > _SYMBOL_MILLI_MAX)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_lines": pa.array(n_lines),
            "bullet_milli": pa.array(bullet_milli),
            "ellipsis_milli": pa.array(ellipsis_milli),
            "mwl_centi": pa.array(mwl_centi),
            "alpha_milli": pa.array(alpha_milli),
            "symbol_milli": pa.array(symbol_milli),
            "flagged": pa.array(flagged),
        })

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None)


SQL_GOPHER_FORMAT_FILTER = rf"""
WITH l AS (
  SELECT doc_id::BIGINT AS doc_id,
         trim(unnest(string_split(coalesce(text, ''), chr(10))),
              ' ' || chr(9) || chr(13)) AS line
  FROM documents
), lc AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
         count(*) FILTER (WHERE regexp_matches(line, '^[-*' || chr(8226)
           || ']'))::BIGINT AS n_bullet,
         count(*) FILTER (WHERE regexp_matches(line, '(\.\.\.|' ||
           chr(8230) || ')$'))::BIGINT AS n_ellip
  FROM l WHERE line <> '' GROUP BY 1
), w AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS word
  FROM documents
), wc AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
         count(*) FILTER (WHERE regexp_matches(word, '[A-Za-z]'))::BIGINT
           AS n_alpha,
         sum(length(word))::BIGINT AS tot_chars
  FROM w GROUP BY 1
), sym AS (
  SELECT doc_id::BIGINT AS doc_id,
         (length(coalesce(text, ''))
          - length(replace(coalesce(text, ''), '#', '')))::BIGINT AS n_hash,
         ((length(coalesce(text, ''))
           - length(replace(coalesce(text, ''), '...', ''))) // 3)::BIGINT
           AS n_dots
  FROM documents
), m AS (
  SELECT d.doc_id::BIGINT AS doc_id,
         coalesce(lc.n_lines, 0) AS n_lines,
         CASE WHEN coalesce(lc.n_lines, 0) = 0 THEN 0
              ELSE lc.n_bullet * 1000 // lc.n_lines END AS bullet_milli,
         CASE WHEN coalesce(lc.n_lines, 0) = 0 THEN 0
              ELSE lc.n_ellip * 1000 // lc.n_lines END AS ellipsis_milli,
         CASE WHEN coalesce(wc.n_words, 0) = 0 THEN 0
              ELSE wc.tot_chars * 100 // wc.n_words END AS mwl_centi,
         CASE WHEN coalesce(wc.n_words, 0) = 0 THEN 0
              ELSE wc.n_alpha * 1000 // wc.n_words END AS alpha_milli,
         CASE WHEN coalesce(wc.n_words, 0) = 0 THEN 0
              ELSE (sym.n_hash + sym.n_dots) * 1000 // wc.n_words
         END AS symbol_milli,
         coalesce(wc.n_words, 0) AS n_words
  FROM documents d
  LEFT JOIN lc ON lc.doc_id = d.doc_id::BIGINT
  LEFT JOIN wc ON wc.doc_id = d.doc_id::BIGINT
  LEFT JOIN sym ON sym.doc_id = d.doc_id::BIGINT
)
SELECT doc_id, n_lines::BIGINT AS n_lines,
       bullet_milli::BIGINT AS bullet_milli,
       ellipsis_milli::BIGINT AS ellipsis_milli,
       mwl_centi::BIGINT AS mwl_centi,
       alpha_milli::BIGINT AS alpha_milli,
       symbol_milli::BIGINT AS symbol_milli,
       (bullet_milli > {_BULLET_MILLI_MAX}
        OR ellipsis_milli > {_ELLIPSIS_MILLI_MAX}
        OR (n_words > 0 AND (mwl_centi < {_MWL_CENTI_MIN}
                             OR mwl_centi > {_MWL_CENTI_MAX}))
        OR (n_words > 0 AND alpha_milli < {_ALPHA_MILLI_MIN})
        OR symbol_milli > {_SYMBOL_MILLI_MAX}) AS flagged
FROM m
"""


_BLOCKLIST = ("slow", "dup", "spam")  # stand-in for the real ~400-phrase list


def q_blocklist_filter(sf_dir: str):
    """C4-style banned-word filter (Raffel et al. 2020, JMLR 21(140):
    any page containing a blocklisted word was removed): per doc the
    count of blocklisted tokens (lowercased ``\\S+`` equality against
    ``_BLOCKLIST``), the integer milli rate, and the drop verdict.

    Pure map over a broadcast-constant word set — zero shuffle at any
    corpus size; one ``pc.is_in`` over the flat token stream + segment
    sums per batch.  Multi-word blocklist PHRASES are handled by
    :func:`q_blocklist_phrases` below (same pure-map shape over the
    n-gram group keys of ``engine/ngramrep.py``).  The fixture list
    deliberately hits fixture vocabulary ('slow', 'dup') so the flag
    path is exercised by the gate itself."""
    bl = pa.array(sorted(_BLOCKLIST), type=pa.string())

    def fn(t: pa.Table) -> pa.Table:
        flat, offs = _split_tokens(pc.utf8_lower(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]))
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        hit = pc.is_in(flat, value_set=bl).to_numpy(zero_copy_only=False)
        n_tok = _segment_sums((wlen > 0).astype(np.int64), offs)
        n_blocked = _segment_sums((hit & (wlen > 0)).astype(np.int64), offs)
        milli = np.where(n_tok > 0,
                         n_blocked * 1000 // np.maximum(n_tok, 1), 0)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pa.array(n_tok),
            "n_blocked": pa.array(n_blocked),
            "blocked_milli": pa.array(milli),
            "flagged": pa.array(n_blocked > 0),
        })

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None)


_BLOCK_PHRASES = ("big order", "slow key", "no such phrase")


def q_blocklist_phrases(sf_dir: str):
    """Multi-word blocklist matching — the phrase half of the C4 list
    (most real blocklist entries are phrases).  Counts OCCURRENCES of
    each 2-word phrase (overlapping allowed, tokens are lowercased
    ``\\S+`` runs, one joining space) per doc via the n-gram machinery
    of ``engine/ngramrep.py``: same pure-map/zero-shuffle shape as the
    single-word filter, the phrase set broadcast in the closure.

    Implementation note: instead of re-hashing phrases into the
    batch-local code space, the batch's 2-gram strings are rebuilt only
    for the ≤ len(phrases) distinct 2-gram codes that might match —
    candidate codes are found by matching each phrase's two words
    against the batch vocabulary, so per batch the string work is
    O(|phrases|), not O(tokens)."""
    from engine.ngramrep import _ngram_group_keys

    phrases = sorted(_BLOCK_PHRASES)

    def fn(t: pa.Table) -> pa.Table:
        ndocs = t.num_rows
        flat, offs = _split_tokens(pc.utf8_lower(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]))
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        doc_all = np.repeat(np.arange(ndocs, dtype=np.int64),
                            offs[1:] - offs[:-1])
        keep = lens > 0
        toks = flat.filter(pa.array(keep))
        codes, uniq = pd.factorize(toks.to_pandas(), sort=False)
        codes = codes.astype(np.int64)
        doc = doc_all[keep]
        n_tok = np.bincount(doc, minlength=ndocs).astype(np.int64)
        n_hits = np.zeros(ndocs, dtype=np.int64)
        if len(codes) >= 2 and len(uniq):
            starts, grams = _ngram_group_keys(codes, doc, 2)
            if len(starts):
                # phrase -> (code_a, code_b) via the batch vocabulary
                vocab = pd.Index(uniq)
                want = np.zeros(len(starts), dtype=bool)
                a_codes = codes[starts]
                b_codes = codes[starts + 1]
                for ph in phrases:
                    w = ph.split(" ")
                    if len(w) != 2:
                        continue
                    ia, ib = vocab.get_indexer(w)
                    if ia >= 0 and ib >= 0:
                        want |= (a_codes == ia) & (b_codes == ib)
                np.add.at(n_hits, doc[starts[want]], 1)
        milli = np.where(n_tok > 0, n_hits * 1000 // np.maximum(n_tok, 1), 0)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pa.array(n_tok),
            "n_phrase_hits": pa.array(n_hits),
            "phrase_milli": pa.array(milli),
            "flagged": pa.array(n_hits > 0),
        })

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None)


_PH_SQL_LIST = ", ".join(f"'{p}'" for p in sorted(_BLOCK_PHRASES))

SQL_BLOCKLIST_PHRASES = rf"""
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '\S+') AS ts
  FROM documents
), g AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS gram
  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1))::BIGINT AS i
        FROM toks)
  WHERE i + 1 <= len(ts)
), h AS (
  SELECT doc_id, count(*)::BIGINT AS n_phrase_hits
  FROM g WHERE gram IN ({_PH_SQL_LIST}) GROUP BY 1
), n AS (
  SELECT doc_id, len(ts)::BIGINT AS n_tokens FROM toks
)
SELECT n.doc_id, n.n_tokens,
       coalesce(h.n_phrase_hits, 0)::BIGINT AS n_phrase_hits,
       (CASE WHEN n.n_tokens = 0 THEN 0
             ELSE coalesce(h.n_phrase_hits, 0) * 1000 // n.n_tokens
        END)::BIGINT AS phrase_milli,
       (coalesce(h.n_phrase_hits, 0) > 0) AS flagged
FROM n LEFT JOIN h USING (doc_id)
"""


_BL_SQL_LIST = ", ".join(f"'{w}'" for w in sorted(_BLOCKLIST))

SQL_BLOCKLIST_FILTER = rf"""
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS tok
  FROM documents
), a AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         count(*) FILTER (WHERE tok IN ({_BL_SQL_LIST}))::BIGINT
           AS n_blocked
  FROM w GROUP BY 1
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(a.n_blocked, 0)::BIGINT AS n_blocked,
       (CASE WHEN coalesce(a.n_tokens, 0) = 0 THEN 0
             ELSE a.n_blocked * 1000 // a.n_tokens END)::BIGINT
         AS blocked_milli,
       (coalesce(a.n_blocked, 0) > 0) AS flagged
FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id::BIGINT
"""


SQL_UNIGRAM_COMMONNESS = rf"""
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS word
  FROM documents
), c AS (
  SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY 1
), v AS (
  SELECT word, cnt FROM c ORDER BY cnt DESC, word ASC LIMIT {_VOCAB_K}
)
SELECT w.doc_id,
       count(*)::BIGINT AS n_tokens,
       sum(coalesce(v.cnt, 0))::BIGINT AS common_sum,
       (sum(coalesce(v.cnt, 0)) * 1000 // count(*))::BIGINT
         AS commonness_milli
FROM w LEFT JOIN v USING (word)
GROUP BY w.doc_id
"""


# ---------------------------------------------------------------------------
# corpus-wide duplicated n-gram detection (exact substring-level dedup,
# the word-n-gram variant of Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better") — gated
# ---------------------------------------------------------------------------

_NGRAM_N = 5          # word n-gram width
_DUP_NGRAM_MILLI = 200  # >20% duplicated positions -> flagged

# Two independent positional-multiplier streams -> a 128-bit n-gram key.
# The distinct-(n-gram, doc) exchange carries (h1, h2, nd) = 24 B/row
# instead of the n-gram STRING (~50-100 B/row), and the duplicated set is
# integer rows the driver can hold sorted — or, past _DUP_BROADCAST_MAX,
# never sees at all (hash-partitioned semi-join).  The streams differ in
# every multiplier, so a key collision needs two independent 64-bit
# collisions (~2^-128 per pair); the string-keyed DuckDB oracle
# (SQL_DUP_NGRAM / SQL_DUP_SPAN_REMOVAL) stays the anchor that gates the
# hash path value-exact.
_NG_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                  0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63], dtype=np.uint64)
_NG_B = np.array([0xD6E8FEB86659FD93, 0xA0761D6478BD642F, 0xE7037ED1A0B428DB,
                  0x8EBC6AF09C88C6E3, 0x589965CC75374CC3], dtype=np.uint64)
_DUP_BROADCAST_MAX = 5_000_000   # duplicated n-grams; beyond -> semi-join


def _join_partitions(sf_dir: str) -> int:
    """Partition count for the semijoin-regime native joins, sized by DATA
    (the hash_group_exchange lesson: aggregator actors are the fixed cost
    and scale with partition count, so small corpora must not pay for
    partitions they can't fill).  The joined side is the distinct
    (doc, n-gram) table — roughly docs x tokens-per-doc rows — targeted
    at ~500k rows/partition via a ~128-token/doc estimate, clamped to
    [16, 4096]."""
    import os as _os

    import pyarrow.parquet as _pq
    n_docs = _pq.read_metadata(
        _os.path.join(sf_dir, "documents.parquet")).num_rows
    return int(min(4096, max(16, (n_docs * 128) // 500_000)))

#: observability for the flood tests: how the last dup-ngram query moved
#: the duplicated set ("broadcast" = one sorted packed array via ray.put,
#: driver_bytes counts it; "semijoin" = zero driver-resident dup bytes)
LAST_DUP_SET: dict = {}


def _ngram_hash_positions(texts):
    """texts -> (h1, h2 per valid n-gram start position (uint64 bit-viewed
    as int64 for Arrow/Ray friendliness), doc index per position, doc-local
    start position, per-doc position counts).

    No n-gram strings are ever materialized: per-word siphash
    (engine.dedup._word_hashes — RE2-'\\S+'-exact split) combined with two
    positional-multiplier streams and a splitmix64 finalizer.  An offset
    mask stops n-grams crossing doc boundaries."""
    from engine.dedup import _word_hashes, _mix64
    wh, offs = _word_hashes(texts)
    counts = offs[1:] - offs[:-1]
    n_docs = len(counts)
    total = len(wh)
    n_pos_doc = np.maximum(counts - _NGRAM_N + 1, 0)
    if total < _NGRAM_N:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, n_pos_doc
    m = total - _NGRAM_N + 1
    h1 = np.zeros(m, dtype=np.uint64)
    h2 = np.zeros(m, dtype=np.uint64)
    for k in range(_NGRAM_N):
        seg = wh[k:k + m]
        h1 += seg * _NG_A[k]
        h2 += seg * _NG_B[k]
    h1, h2 = _mix64(h1), _mix64(h2)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)[:m]
    pos_in_doc = np.arange(m, dtype=np.int64) - offs[doc_idx]
    valid = pos_in_doc < n_pos_doc[doc_idx]
    return (h1[valid].view(np.int64), h2[valid].view(np.int64),
            doc_idx[valid], pos_in_doc[valid], n_pos_doc)


def _pair_pack(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(h1, h2) int64 arrays -> one structured array sortable/comparable as
    a 128-bit key (np.isin / np.unique / np.sort operate on it directly)."""
    x = np.empty(len(h1), dtype=[("a", "<i8"), ("b", "<i8")])
    x["a"], x["b"] = h1, h2
    return x


def _distinct_doc_ngrams(t: pa.Table):
    """batch -> per DISTINCT (doc, n-gram): (h1, h2, local doc index,
    position count), plus the per-doc n-gram position totals."""
    h1, h2, doc_idx, _, n_pos_doc = _ngram_hash_positions(t["text"])
    if len(h1) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, n_pos_doc
    order = np.lexsort((h2, h1, doc_idx))
    a, b, d = h1[order], h2[order], doc_idx[order]
    new = np.ones(len(a), dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (d[1:] != d[:-1])
    starts = np.flatnonzero(new)
    npos = np.diff(np.append(starts, len(a))).astype(np.int64)
    return a[starts], b[starts], d[starts], npos, n_pos_doc


def _dup_partial(t: pa.Table) -> pa.Table:
    """Per-batch combiner for the duplicated-set build: one
    (h1, h2, nd) row per distinct (n-gram, doc) group collapsed to
    per-batch distinct-doc counts — whole docs sit in one batch, so the
    global groupby Sum is the exact corpus-wide distinct-doc count."""
    a, b, d, _, _ = _distinct_doc_ngrams(t)
    if len(a) == 0:
        return pa.table({"h1": pa.array([], type=pa.int64()),
                         "h2": pa.array([], type=pa.int64()),
                         "nd": pa.array([], type=pa.int64())})
    # rows are sorted by (doc, h1, h2); re-group by (h1, h2) for counts
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    new = np.ones(len(a), dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    nd = np.diff(np.append(starts, len(a))).astype(np.int64)
    return pa.table({"h1": pa.array(a[starts]), "h2": pa.array(b[starts]),
                     "nd": pa.array(nd)})


def _dup_ngram_set(sf_dir: str):
    """-> (materialized Dataset of duplicated (h1, h2) keys — n-grams seen
    in >= 2 distinct docs — and its row count).  The exchange is ONE
    integer-keyed groupby over per-batch partials; the driver sees only
    the count (block metadata)."""
    from ray.data.aggregate import Sum

    def keep_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["nd"], 2)).select(["h1", "h2"])

    folded = _docs(sf_dir, ["text"]) \
        .map_batches(_dup_partial, batch_format="pyarrow", batch_size=None) \
        .groupby(["h1", "h2"]).aggregate(Sum("nd", alias_name="nd")) \
        .map_batches(keep_dups, batch_format="pyarrow")
    mat = folded.materialize()
    return mat, mat.count()


def _dup_broadcast_ref(mat):
    """Collect the duplicated (h1, h2) keys and ``ray.put`` ONE sorted
    packed array -> (object ref, driver-resident bytes)."""
    import ray
    from engine.pipeline import collect_tables
    tabs = [b for b in collect_tables(mat) if b.num_columns]
    if tabs:
        ct = pa.concat_tables(tabs)
        packed = _pair_pack(ct["h1"].to_numpy(zero_copy_only=False),
                            ct["h2"].to_numpy(zero_copy_only=False))
        packed.sort()
    else:
        packed = _pair_pack(np.zeros(0, np.int64), np.zeros(0, np.int64))
    return ray.put(packed), packed.nbytes


def _stats_table(ids, n_pos_doc, n_dup_pos, n_dup_ng) -> pa.Table:
    """Shared finalizer of both dup-ngram-stats paths: keep docs with at
    least one n-gram position, derive dup_milli + flagged."""
    m = n_pos_doc > 0
    np_, dp, dn = n_pos_doc[m], n_dup_pos[m], n_dup_ng[m]
    dup_milli = dp * 1000 // np_
    return pa.table({
        "doc_id": pa.array(ids[m]),
        "n_ngrams": pa.array(np_),
        "n_dup_pos": pa.array(dp),
        "n_dup_ngrams": pa.array(dn),
        "dup_milli": pa.array(dup_milli),
        "flagged": pa.array(dup_milli >= _DUP_NGRAM_MILLI),
    })


def q_dup_ngram_stats(sf_dir: str, method: str = "auto"):
    """Corpus-wide duplicated word-``_NGRAM_N``-gram accounting: for every
    doc with at least one n-gram, how many of its n-gram positions (and
    how many of its distinct n-grams) also occur in >= 2 distinct docs,
    plus a flag when the duplicated fraction exceeds
    ``_DUP_NGRAM_MILLI``/1000.

    Two passes: (1) combiner-first duplicated-set build — per-batch
    DISTINCT (n-gram, doc) partials keyed by a 128-bit n-gram HASH
    (24 B/row, no strings cross the exchange) fold through ONE integer
    groupby; (2a) ``method="broadcast"`` (the <= ``_DUP_BROADCAST_MAX``
    regime): the dup keys are collected ONCE into a sorted packed array,
    ``ray.put`` once, membership per batch is a vectorized 128-bit
    ``np.isin``; (2b) ``method="semijoin"`` (the unbounded regime —
    boilerplate-heavy corpora): the dup keys NEVER reach the driver; the
    per-doc distinct-n-gram rows inner-join the dup set on (h1, h2)
    (hash-partitioned), fold per doc, and left-join back to per-doc
    totals.  ``method="auto"`` picks by measured dup-set size.  The
    string-keyed DuckDB oracle (SQL_DUP_NGRAM) anchors both paths."""
    import ray

    mat, n_dup = _dup_ngram_set(sf_dir)
    if method == "auto":
        method = "broadcast" if n_dup <= _DUP_BROADCAST_MAX else "semijoin"
    LAST_DUP_SET.clear()
    LAST_DUP_SET.update(mode=method, n_dup=int(n_dup), driver_bytes=0)
    if method == "semijoin":
        return _dup_ngram_stats_semijoin(sf_dir, mat)
    dup_ref, nbytes = _dup_broadcast_ref(mat)
    LAST_DUP_SET["driver_bytes"] = int(nbytes)

    def mark(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        h1, h2, doc_idx, _, n_pos_doc = _ngram_hash_positions(t["text"])
        n_docs = len(n_pos_doc)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        if len(h1):
            is_dup = np.isin(_pair_pack(h1, h2), dup)
            n_dup_pos = np.bincount(doc_idx, weights=is_dup,
                                    minlength=n_docs).astype(np.int64)
            # distinct duplicated n-grams per doc
            order = np.lexsort((h2, h1, doc_idx))
            a, b, d = h1[order], h2[order], doc_idx[order]
            new = np.ones(len(a), dtype=bool)
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (d[1:] != d[:-1])
            nd_mask = new & is_dup[order]
            n_dup_ng = np.bincount(d[nd_mask], minlength=n_docs) \
                .astype(np.int64)
        else:
            n_dup_pos = np.zeros(n_docs, dtype=np.int64)
            n_dup_ng = np.zeros(n_docs, dtype=np.int64)
        return _stats_table(ids, n_pos_doc, n_dup_pos, n_dup_ng)

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(mark, batch_format="pyarrow", batch_size=None)


def q_dup_ngram_stats_semijoin(sf_dir: str):
    """``q_dup_ngram_stats`` forced onto the semi-join path (the unbounded
    dup-set regime) — registered gated so the driver verifies the at-scale
    path against the same string-keyed oracle."""
    return q_dup_ngram_stats(sf_dir, method="semijoin")


def _dup_ngram_stats_semijoin(sf_dir: str, dup_ds):
    """Semi-join marking: distinct (doc, n-gram) rows inner-join the dup
    keys on (h1, h2), fold per doc, left-join back to per-doc totals.
    No dup key or doc row ever reaches the driver."""
    from ray.data.aggregate import Count, Sum
    from engine.pipeline import scrub_empty_blocks

    def doc_side(t: pa.Table) -> pa.Table:
        a, b, d, npos, _ = _distinct_doc_ngrams(t)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[d] if len(a) else
                               np.zeros(0, dtype=np.int64)),
            "h1": pa.array(a), "h2": pa.array(b),
            "npos": pa.array(npos)})

    def totals(t: pa.Table) -> pa.Table:
        _, _, _, _, n_pos_doc = _ngram_hash_positions(t["text"])
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        m = n_pos_doc > 0
        return pa.table({"doc_id": pa.array(ids[m]),
                         "n_ngrams": pa.array(n_pos_doc[m])})

    dup_clean = scrub_empty_blocks(
        dup_ds, pa.schema([("h1", pa.int64()), ("h2", pa.int64())]))
    side = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(doc_side, batch_format="pyarrow", batch_size=None)
    nparts = _join_partitions(sf_dir)
    hits = side.join(dup_clean, join_type="inner",
                     num_partitions=nparts, on=("h1", "h2"))
    agg = hits.groupby("doc_id").aggregate(
        Sum("npos", alias_name="n_dup_pos"),
        Count("npos", alias_name="n_dup_ngrams"))
    agg_clean = scrub_empty_blocks(
        agg, pa.schema([("doc_id", pa.int64()), ("n_dup_pos", pa.int64()),
                        ("n_dup_ngrams", pa.int64())]))
    tot = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(totals, batch_format="pyarrow", batch_size=None)
    out = tot.join(agg_clean, join_type="left_outer",
                   num_partitions=nparts, on=("doc_id",))

    def finalize(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        np_ = pc.cast(t["n_ngrams"], pa.int64()).to_numpy(zero_copy_only=False)
        dp = pc.fill_null(pc.cast(t["n_dup_pos"], pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        dn = pc.fill_null(pc.cast(t["n_dup_ngrams"], pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        return _stats_table(ids, np_, dp, dn)

    return out.map_batches(finalize, batch_format="pyarrow")


SQL_DUP_NGRAM = rf"""
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id,
         regexp_extract_all(coalesce(text, ''), '\S+') AS ws
  FROM documents
), g AS (
  SELECT doc_id, array_to_string(ws[i.i:i.i+{_NGRAM_N - 1}], ' ') AS ng
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - {_NGRAM_N} + 2)) AS i)
       AS i(i)
  WHERE len(ws) >= {_NGRAM_N}
), s AS (
  SELECT ng, count(DISTINCT doc_id) AS nd FROM g GROUP BY ng
)
SELECT g.doc_id,
       count(*)::BIGINT AS n_ngrams,
       sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_pos,
       count(DISTINCT CASE WHEN s.nd >= 2 THEN g.ng END)::BIGINT
         AS n_dup_ngrams,
       (sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) * 1000
         // count(*))::BIGINT AS dup_milli,
       ((sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) * 1000 // count(*))
         >= {_DUP_NGRAM_MILLI}) AS flagged
FROM g JOIN s USING (ng)
GROUP BY g.doc_id
"""


def _covered_from_starts(total: int, s: np.ndarray) -> np.ndarray:
    """Duplicated-span starts (global token positions) -> per-token covered
    mask: +1 at each start, -1 ``_NGRAM_N`` past it, prefix-sum > 0.
    Valid positions never cross a doc boundary, so spans cannot bleed
    between docs."""
    width = total + _NGRAM_N
    diff = np.bincount(s, minlength=width).astype(np.int64) \
        - np.bincount(s + _NGRAM_N, minlength=width)
    return np.cumsum(diff)[:total] > 0


def _rebuild_kept(ids, flat, offs, covered) -> pa.Table:
    """Shared rewrite tail of both span-removal paths: drop covered
    tokens, rebuild kept text zero-copy with one Arrow list re-offset +
    ``binary_join``.  Docs with no tokens emit no row (oracle parity:
    '\\S+' finds none in an empty/whitespace-only doc — the split's ['']
    artifact token is masked by length)."""
    n_docs = len(offs) - 1
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    kept = ~covered & nonempty
    n_tokens = _segment_sums(nonempty.astype(np.int64), offs)
    n_kept = _segment_sums(kept.astype(np.int64), offs)
    kept_flat = flat.filter(pa.array(kept))
    new_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_kept, out=new_offs[1:])
    lst = pa.ListArray.from_arrays(
        pa.array(new_offs, type=pa.int32()), kept_flat)
    kept_text = pc.binary_join(lst, " ")
    m2 = n_tokens > 0
    return pa.table({
        "doc_id": pa.array(ids[m2]),
        "n_tokens": pa.array(n_tokens[m2]),
        "n_kept": pa.array(n_kept[m2]),
        "kept_milli": pa.array(n_kept[m2] * 1000 // n_tokens[m2]),
        "kept_text": kept_text.filter(pa.array(m2)),
    })


def q_dup_span_removal(sf_dir: str, method: str = "auto"):
    """The REMOVAL half of exact substring dedup (Lee et al. 2022): drop
    every token covered by any corpus-duplicated ``_NGRAM_N``-gram and
    emit the rewritten document (kept tokens joined by a single space —
    whitespace-normalized on both sides of the gate).

    Same dual-path shape as ``q_dup_ngram_stats``: the duplicated set is
    built hash-keyed (one integer groupby, 24 B/row); ``broadcast`` marks
    per batch with a 128-bit ``np.isin``; ``semijoin`` (unbounded dup
    sets) joins per-position rows to the dup keys, folds each doc's
    duplicated-span starts into a list, joins them back to the docs by
    doc_id, and rewrites — the driver never holds a dup key.  Coverage
    is a vectorized difference array; the kept text is rebuilt zero-copy
    (one Arrow list re-offset + ``binary_join``)."""
    import ray

    mat, n_dup = _dup_ngram_set(sf_dir)
    if method == "auto":
        method = "broadcast" if n_dup <= _DUP_BROADCAST_MAX else "semijoin"
    LAST_DUP_SET.clear()
    LAST_DUP_SET.update(mode=method, n_dup=int(n_dup), driver_bytes=0)
    if method == "semijoin":
        return _dup_span_removal_semijoin(sf_dir, mat)
    dup_ref, nbytes = _dup_broadcast_ref(mat)
    LAST_DUP_SET["driver_bytes"] = int(nbytes)

    def rewrite(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        flat, offs = _split_tokens(t["text"])
        total = len(flat)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        covered = np.zeros(total, dtype=bool)
        if total >= _NGRAM_N:
            h1, h2, doc_idx, pos, _ = _ngram_hash_positions(t["text"])
            if len(h1):
                is_dup = np.isin(_pair_pack(h1, h2), dup)
                s = (offs[doc_idx] + pos)[is_dup]
                covered = _covered_from_starts(total, s)
        return _rebuild_kept(ids, flat, offs, covered)

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(rewrite, batch_format="pyarrow", batch_size=None)


def q_dup_span_removal_semijoin(sf_dir: str):
    """``q_dup_span_removal`` forced onto the semi-join path — registered
    gated so the driver verifies the at-scale path against the same
    string-keyed oracle."""
    return q_dup_span_removal(sf_dir, method="semijoin")


def _dup_span_removal_semijoin(sf_dir: str, dup_ds):
    """Semi-join rewrite: (doc_id, start, h1, h2) rows for every valid
    n-gram position inner-join the dup keys, duplicated starts fold to a
    sorted per-doc blob via a hash-keyed exchange + one vectorized pass
    per partition (a per-doc map_groups would cost one Python call per
    flagged doc), and a left join hands each doc its spans for the
    vectorized rewrite."""
    from engine.pipeline import scrub_empty_blocks

    def pos_rows(t: pa.Table) -> pa.Table:
        h1, h2, doc_idx, pos, _ = _ngram_hash_positions(t["text"])
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[doc_idx] if len(h1) else
                               np.zeros(0, dtype=np.int64)),
            "start": pa.array(pos),
            "h1": pa.array(h1), "h2": pa.array(h2)})

    def fold_spans_block(t: pa.Table) -> pa.Table:
        # Acero hash joins reject list<> payload columns — carry the sorted
        # span starts as ONE little-endian int64 blob per doc instead.
        # Vectorized over every doc in the hash partition: one lexsort,
        # then the per-doc blobs are built zero-copy as a BinaryArray whose
        # value buffer IS the sorted starts array and whose offsets are the
        # doc boundaries x8 — no per-doc Python
        if t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("starts_bin", pa.binary())]).empty_table()
        did = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        st = t["start"].to_numpy(zero_copy_only=False)
        order = np.lexsort((st, did))
        did, st = did[order], st[order]
        n = len(did)
        new_d = np.empty(n, dtype=bool)
        new_d[0] = True
        new_d[1:] = did[1:] != did[:-1]
        starts_idx = np.flatnonzero(new_d)
        offsets = np.append(starts_idx, n).astype(np.int32) * 8
        blob = np.ascontiguousarray(st.astype("<i8"))
        bins = pa.Array.from_buffers(
            pa.binary(), len(starts_idx),
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(blob.tobytes())])
        return pa.table({"doc_id": pa.array(did[starts_idx]),
                         "starts_bin": bins})

    dup_clean = scrub_empty_blocks(
        dup_ds, pa.schema([("h1", pa.int64()), ("h2", pa.int64())]))
    pos = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(pos_rows, batch_format="pyarrow", batch_size=None)
    nparts = _join_partitions(sf_dir)
    hits = pos.join(dup_clean, join_type="inner",
                    num_partitions=nparts, on=("h1", "h2")) \
        .select_columns(["doc_id", "start"])
    from engine.stages import hash_group_exchange
    spans = hash_group_exchange(hits, ["doc_id"], fold_spans_block,
                                collect=False)
    spans_clean = scrub_empty_blocks(
        spans, pa.schema([("doc_id", pa.int64()),
                          ("starts_bin", pa.binary())]))
    out = _docs(sf_dir, ["doc_id", "text"]) \
        .join(spans_clean, join_type="left_outer",
              num_partitions=nparts, on=("doc_id",))

    def rewrite(t: pa.Table) -> pa.Table:
        flat, offs = _split_tokens(t["text"])
        total = len(flat)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        covered = np.zeros(total, dtype=bool)
        vals, lens = _decode_span_bins(t["starts_bin"])
        if total and len(vals):
            row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            covered = _covered_from_starts(total, vals + offs[row_idx])
        return _rebuild_kept(ids, flat, offs, covered)

    return out.map_batches(rewrite, batch_format="pyarrow", batch_size=None)


def _decode_span_bins(col):
    """binary column of little-endian int64 span starts -> (flat starts,
    per-row start counts).  Vectorized: one offsets read + one contiguous
    reinterpret of the values buffer — no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, b"")
    n = len(col)
    raw_off = np.frombuffer(col.buffers()[1], dtype=np.int32)
    off = raw_off[col.offset: col.offset + n + 1].astype(np.int64)
    lens = (off[1:] - off[:-1]) // 8
    if off[-1] == off[0]:
        return np.zeros(0, dtype=np.int64), lens
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    vals = np.frombuffer(data[off[0]:off[-1]].tobytes(), dtype="<i8")
    return vals, lens


SQL_DUP_SPAN_REMOVAL = rf"""
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id,
         regexp_extract_all(coalesce(text, ''), '\S+') AS ws
  FROM documents
), g AS (
  SELECT doc_id, i.i AS i,
         array_to_string(ws[i.i:i.i+{_NGRAM_N - 1}], ' ') AS ng
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - {_NGRAM_N} + 2)) AS i)
       AS i(i)
  WHERE len(ws) >= {_NGRAM_N}
), s AS (
  SELECT ng, count(DISTINCT doc_id) AS nd FROM g GROUP BY ng
), cov AS (
  SELECT DISTINCT g.doc_id AS doc_id,
         unnest(range(g.i, g.i + {_NGRAM_N})) AS j
  FROM g JOIN s USING (ng) WHERE s.nd >= 2
), tok AS (
  SELECT w.doc_id AS doc_id, j.j AS j, ws[j.j] AS token
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) AS j(j)
)
SELECT tok.doc_id AS doc_id,
       count(*)::BIGINT AS n_tokens,
       count(*) FILTER (WHERE cov.j IS NULL)::BIGINT AS n_kept,
       (count(*) FILTER (WHERE cov.j IS NULL) * 1000
         // count(*))::BIGINT AS kept_milli,
       coalesce(string_agg(token, ' ' ORDER BY tok.j)
                FILTER (WHERE cov.j IS NULL), '') AS kept_text
FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.j = cov.j
GROUP BY tok.doc_id
"""
