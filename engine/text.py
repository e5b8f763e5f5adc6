"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline stages: token counting, quality scoring,
language ID, document fingerprinting.  All are single-pass ``map_batches``
(no shuffle); regex work uses RE2 via ``pyarrow.compute`` so the DuckDB
oracle (also RE2) matches exactly.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _docs(sf_dir: str, columns=None):
    from engine.io import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns)


# ---------------------------------------------------------------------------
# token / character statistics (gated)
# ---------------------------------------------------------------------------

def q_text_stats(sf_dir: str):
    """Whitespace token count + digit/punct/character counts, vectorized."""
    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_words": pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64()),
            "n_digits": pc.cast(pc.count_substring_regex(txt, r"[0-9]"), pa.int64()),
            "n_punct": pc.cast(pc.count_substring_regex(txt, r"[.,!?;:]"), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_TEXT_STATS = r"""
SELECT doc_id::BIGINT AS doc_id,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
       len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits,
       len(regexp_extract_all(text, '[.,!?;:]'))::BIGINT AS n_punct,
       length(text)::BIGINT AS n_chars
FROM documents
"""


# BPE-ish pre-tokenization (GPT-2-style word/number/punct split, minus the
# lookbehinds RE2 lacks): alpha runs, digit runs, non-space symbol runs.
# Identical RE2 semantics in Arrow and DuckDB, so the count is gate-exact.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def q_token_counts(sf_dir: str):
    """Token counting two ways (training-data budget accounting):
    whitespace tokens and BPE-ish pre-tokens (alpha/digit/symbol runs),
    plus the alpha/digit split — one vectorized RE2 pass per column."""
    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_ws_tokens": pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64()),
            "n_bpe_tokens": pc.cast(pc.count_substring_regex(txt, _BPE_RE), pa.int64()),
            "n_alpha_tokens": pc.cast(pc.count_substring_regex(txt, r"[A-Za-z]+"), pa.int64()),
            "n_digit_tokens": pc.cast(pc.count_substring_regex(txt, r"[0-9]+"), pa.int64()),
        })
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_TOKEN_COUNTS = rf"""
SELECT doc_id::BIGINT AS doc_id,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE}'))::BIGINT AS n_bpe_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS n_alpha_tokens,
       len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_digit_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# document fingerprint (gated: md5; rolling-hash variant below is rows-only)
# ---------------------------------------------------------------------------

def q_doc_fingerprint(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        fps = [None if s is None else hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t["text"].to_pylist()]  # null text -> null (md5(NULL))
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fp": pa.array(fps, type=pa.string())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_DOC_FINGERPRINT = "SELECT doc_id::BIGINT AS doc_id, md5(text) AS fp FROM documents"


_ROLL_B = 1000003
_ROLL_SEED = 2166136261  # FNV-32 offset
_ROLL_MOD = 1 << 32


def _roll_fp_scalar(s: str) -> int:
    """Reference fold (oracle-shaped, per-row): kept as the spec the
    vectorized kernel is property-tested against."""
    h = _ROLL_SEED
    for w in re.findall(r"[^\t\n\f\r ]+", s):  # RE2 '\S+' class, exactly
        wh = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:8], 16)
        h = (h * _ROLL_B + wh) % _ROLL_MOD
    return h


_MASK32 = np.uint64(0xFFFFFFFF)


def _pow_tables(base: int, n: int) -> tuple:
    """(base^j, base^-j) mod 2^32 for j in [0, n] — one uint64 cumprod
    each: products mod 2^64 project exactly onto mod 2^32."""
    inv = pow(base, -1, _ROLL_MOD)
    pw = np.empty(n + 1, dtype=np.uint64)
    piw = np.empty(n + 1, dtype=np.uint64)
    pw[0] = piw[0] = 1
    if n:
        np.cumprod(np.full(n, base, dtype=np.uint64), out=pw[1:])
        np.cumprod(np.full(n, inv, dtype=np.uint64), out=piw[1:])
    return pw, piw


def _fold_word_hashes(wh: np.ndarray, flat, offs: np.ndarray) -> np.ndarray:
    """Per-doc fold ``h <- h*B + wh mod 2^32`` via its closed form
    ``h = seed*B^n + B^(n-1) * sum_i wh_i * B^(-i)`` — B is odd, hence
    invertible mod 2^32, so the sequential fold becomes one vectorized
    multiply + segment sum.  Whitespace-only docs (whose Arrow split
    yields one zero-length token where Python ``str.split()`` yields
    none) fold to the bare seed."""
    counts = (offs[1:] - offs[:-1]).astype(np.int64)
    n_docs = len(counts)
    h = np.full(n_docs, _ROLL_SEED, dtype=np.uint64)
    if len(wh) == 0:
        return h
    maxn = int(counts.max())
    bpow, bipow = _pow_tables(_ROLL_B, maxn)
    local = np.arange(len(wh), dtype=np.int64) - np.repeat(offs[:-1], counts)
    c = wh * bipow[local]                 # mod 2^64; projects to mod 2^32
    cs = np.zeros(len(c) + 1, dtype=np.uint64)
    np.cumsum(c, out=cs[1:])              # wraps mod 2^64; diffs stay exact
    S = (cs[offs[1:]] - cs[offs[:-1]]) & _MASK32
    nz = counts > 0
    hn = np.uint64(_ROLL_SEED) * bpow[counts[nz]]
    h[nz] = (hn + bpow[counts[nz] - 1] * S[nz]) & _MASK32
    wlen0 = pc.utf8_length(flat).to_numpy(zero_copy_only=False) == 0
    if wlen0.any():
        empty_doc = np.zeros(n_docs, dtype=bool)
        empty_doc[nz] = wlen0[offs[:-1][nz]]
        h[empty_doc] = _ROLL_SEED
    return h


def rolling_fp_batch(texts) -> np.ndarray:
    """Vectorized rolling fingerprint (value-identical to
    :func:`_roll_fp_scalar`, hence still DuckDB-gated).

    md5 (the only digest DuckDB shares) is computed once per DISTINCT
    word via pandas factorize — Zipfian text makes the vocabulary orders
    smaller than the word stream; the fold is the closed form of
    :func:`_fold_word_hashes`."""
    import pandas as pd
    flat, offs = _split_tokens(texts)
    if len(flat) == 0:
        return np.full(len(offs) - 1, _ROLL_SEED, dtype=np.uint64)
    codes, uniques = pd.factorize(flat.to_pandas(), sort=False)
    uh = np.empty(len(uniques), dtype=np.uint64)
    for i, w in enumerate(uniques):
        uh[i] = int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:4], "big")
    return _fold_word_hashes(uh[codes], flat, offs)


def _word_poly_hashes(flat) -> np.ndarray:
    """Byte-polynomial word hash ``sum_j byte_j * B^j mod 2^32`` for every
    word at once: zero-copy over the flat words' UTF-8 buffer with the
    same invertible-multiplier closed form, one level down.  No digest at
    all — the 100% C-speed scale path (still DuckDB-expressible: reversed
    Horner over ``hex(encode(w))`` bytes)."""
    n = len(flat)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    bo = np.frombuffer(flat.buffers()[1], dtype=off_dtype)[
        flat.offset:flat.offset + n + 1].astype(np.int64)
    raw = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    wl = bo[1:] - bo[:-1]
    starts = bo[:-1]
    L = int(wl.max())
    if L <= 64:
        # Horner over byte positions: L passes across the word array
        # (measured 3x the byte-stream closed form for natural word
        # lengths — no cumprod tables, no uint64 byte copy)
        P = np.uint64(_ROLL_B)
        h = np.zeros(n, dtype=np.uint64)
        for p in range(L - 1, -1, -1):
            m = wl > p
            h[m] = h[m] * P + raw[starts[m] + p]
        return h & _MASK32
    # degenerate very-long tokens: closed form over the byte stream so the
    # pass count stays O(1) regardless of token length
    data = raw[bo[0]:bo[-1]].astype(np.uint64)
    bo = bo - bo[0]
    total = len(data)
    pw, piw = _pow_tables(_ROLL_B, total)
    c = data * pw[:total]                 # byte_g * B^g, mod 2^64
    cs = np.zeros(total + 1, dtype=np.uint64)
    np.cumsum(c, out=cs[1:])
    S = (cs[bo[1:]] - cs[bo[:-1]]) & _MASK32
    return (piw[bo[:-1]] * S) & _MASK32


def q_fingerprint_rolling(sf_dir: str):
    """Order-sensitive polynomial rolling fingerprint over words
    (Rabin-Karp fold, 32-bit): ``h = (h*B + md5_32(word)) mod 2^32`` —
    the shard key a dedup pipeline ranges on.  Word hashes are the first
    32 bits of md5 so the DuckDB oracle (md5 + list_reduce fold) computes
    the identical value; see :func:`rolling_fp_batch` for the vectorized
    closed-form kernel."""
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fingerprint": pa.array(
                             rolling_fp_batch(t["text"]).astype(np.int64))})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_FINGERPRINT_ROLLING = rf"""
SELECT doc_id::BIGINT AS doc_id,
  list_reduce(
    list_prepend({_ROLL_SEED}::BIGINT,
      list_transform(regexp_extract_all(coalesce(text, ''), '\S+'),
                     w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)),
    (h, wh) -> (h * {_ROLL_B} + wh) % {_ROLL_MOD})::BIGINT AS fingerprint
FROM documents
"""


def q_fingerprint_rolling_fast(sf_dir: str):
    """Digest-free rolling fingerprint — the scale variant of
    :func:`q_fingerprint_rolling`: the word hash is a byte-polynomial
    (``sum_j byte_j * B^j mod 2^32``) computed zero-copy over the flat
    UTF-8 buffer, so the whole operator is vectorized C with no per-word
    digest calls.  Gated: DuckDB recomputes the byte polynomial as a
    reversed Horner fold over ``hex(encode(w))``."""
    def fn(t: pa.Table) -> pa.Table:
        flat, offs = _split_tokens(t["text"])
        h = _fold_word_hashes(_word_poly_hashes(flat), flat, offs)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fingerprint": pa.array(h.astype(np.int64))})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_FINGERPRINT_ROLLING_FAST = rf"""
SELECT doc_id::BIGINT AS doc_id,
  list_reduce(
    list_prepend({_ROLL_SEED}::BIGINT,
      list_transform(regexp_extract_all(coalesce(text, ''), '\S+'),
        w -> list_reduce(
               list_prepend(0::BIGINT,
                 list_reverse(list_transform(range(octet_length(encode(w))),
                   j -> ('0x' || substr(hex(encode(w)), 2*j+1, 2))::BIGINT))),
               (a, b) -> (a * {_ROLL_B} + b) % {_ROLL_MOD}))),
    (h, wh) -> (h * {_ROLL_B} + wh) % {_ROLL_MOD})::BIGINT AS fingerprint
FROM documents
"""


# ---------------------------------------------------------------------------
# language ID (rows-only: model-style scoring, not SQL-expressible)
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    # deterministic tiny stopword profiles (n-gram heuristic stand-in)
    "en": {"the", "and", "of", "a", "to", "in", "is"},
    "es": {"el", "la", "de", "y", "que", "en", "un"},
    "fr": {"le", "la", "de", "et", "que", "en", "un"},
    "de": {"der", "die", "und", "das", "ist", "ein", "zu"},
    "zh": {"de", "shi", "le", "bu", "wo", "you"},
}


# RE2's ``\s`` is exactly [\t\n\f\r ] — NOT \v (0x0B) and NOT Unicode
# spaces (NBSP, EM SPACE, U+2028...).  Every DuckDB oracle in this repo
# tokenizes with ``\S+``, so the engine split must use the SAME class:
# Arrow's utf8_split_whitespace (Unicode) split NBSP-joined words that the
# oracle keeps as one token.  ascii_split_whitespace matches RE2 everywhere
# except \v (ascii-isspace but not RE2-\s); batches containing \v take the
# RE2 split_pattern_regex path (exact by construction, ~4x slower — rare).
_RE2_WS = "[\t\n\f\r ]"


def _split_tokens(texts):
    """texts -> (flat token array, per-doc offsets), splitting on exactly
    the RE2 ``\\s`` class so token streams match the ``\\S+`` oracles
    byte-for-byte (including NBSP/EM-space/U+2028 kept inside tokens and
    \\v kept inside tokens).

    Nulls are treated as empty documents (filled to '' before the split) so
    zero-token segments are representable anywhere in the batch.  An empty
    or whitespace-only doc yields ONE zero-length artifact token (callers
    mask ``len == 0``), same contract as before."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if pc.any(pc.match_substring(texts, "\x0b")).as_py():
        # exact RE2 path: trim with the RE2 class, then split on runs of it
        t = pc.replace_substring_regex(texts, f"^{_RE2_WS}+|{_RE2_WS}+$", "")
        w = pc.split_pattern_regex(t, pattern=f"{_RE2_WS}+")
    else:
        w = pc.ascii_split_whitespace(pc.ascii_trim_whitespace(texts))
    if isinstance(w, pa.ChunkedArray):
        w = w.combine_chunks()
    return w.values, w.offsets.to_numpy().astype(np.int64)


def _segment_sums(values: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-doc sums of a flat per-token array (empty docs -> 0).

    Exact cumulative-sum differences — NOT ``np.add.reduceat`` with clamped
    starts, which silently truncates the PRECEDING doc's last token whenever
    a zero-token doc sits at a segment boundary (a null/empty text next to a
    valid one corrupted the neighbour's stats)."""
    v = values.astype(np.int64) if values.dtype == bool else values
    cs = np.zeros(len(v) + 1, dtype=v.dtype)
    np.cumsum(v, out=cs[1:])
    return cs[offs[1:]] - cs[offs[:-1]]


class LangId:
    """Actor-pool language-ID stage: profiles compiled once per actor
    (__init__), scored per batch — the ST4 actor shape.

    Scoring is token-membership: a language's score is how many of its
    profile words appear as whitespace tokens of the lowercased text
    (distinct profile words, not occurrence counts); ties break to the
    alphabetically first language; score 0 -> 'unknown'.  Fully
    vectorized: one Arrow split + one equality scan per profile word."""

    def __init__(self):
        self.langs = sorted(_LANG_PROFILES)
        self.profiles = {k: sorted(_LANG_PROFILES[k]) for k in self.langs}

    def __call__(self, t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) \
            else t["text"]
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        n = len(offs) - 1
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            for w in self.profiles[lang]:
                hits = pc.equal(flat, w).to_numpy(zero_copy_only=False)
                scores[:, li] += _segment_sums(hits, offs) > 0
        best = np.argmax(scores, axis=1)      # first max = alphabetical tie-break
        preds = np.array(self.langs, dtype=object)[best]
        preds[scores.max(axis=1) == 0] = "unknown"
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "pred_lang": pa.array(preds, type=pa.string())})


def q_lang_id(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)


def _sql_lang_id() -> str:
    langs = sorted(_LANG_PROFILES)
    score_exprs = []
    for lang in langs:
        terms = " + ".join(
            f"list_contains(words, '{w}')::INT" for w in sorted(_LANG_PROFILES[lang]))
        score_exprs.append(f"({terms}) AS s_{lang}")
    g = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN s_{lang} = {g} THEN '{lang}'" for lang in langs)
    return rf"""
WITH w AS (
  SELECT doc_id::BIGINT AS doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '\S+') AS words
  FROM documents
), s AS (
  SELECT doc_id, {", ".join(score_exprs)} FROM w
)
SELECT doc_id, CASE WHEN {g} = 0 THEN 'unknown' {case} END AS pred_lang
FROM s
"""


SQL_LANG_ID = _sql_lang_id()


# ---------------------------------------------------------------------------
# quality scoring (rows-only: composite float heuristic)
# ---------------------------------------------------------------------------

_STOPWORDS = frozenset("the and of a to in is for on it as at by be this".split())


def quality_batch(t: pa.Table) -> pa.Table:
    """Per-doc quality metrics for one batch — the reusable body of
    :func:`q_quality_score` (also composed into the curation pipeline).
    Fully vectorized (Arrow split + is_in + segment sums) with integer
    micro/milli outputs so the DuckDB oracle value-hashes exactly
    (identical IEEE expression order on both sides)."""
    stop_arr = pa.array(sorted(_STOPWORDS), type=pa.string())
    txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) \
        else t["text"]
    txt = pc.fill_null(txt, "")
    n_words = pc.count_substring_regex(txt, r"\S+").to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_punct = pc.count_substring_regex(txt, r"[.,!?;:]").to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
    flat, offs = _split_tokens(txt)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    stop_hits = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
    sum_wlen = _segment_sums(wlen, offs).astype(np.float64)
    n_stop = _segment_sums(stop_hits, offs).astype(np.float64)

    denom = np.maximum(n_words, 1).astype(np.float64)
    stop_ratio = n_stop / denom
    mean_wlen = np.where(n_words > 0, sum_wlen / denom, 0.0)
    punct = n_punct / np.maximum(n_chars, 1).astype(np.float64)
    score = (np.clip(n_words / 50.0, 0, 1) * 0.4
             + np.clip(stop_ratio * 3, 0, 1) * 0.3
             + np.clip(1 - punct * 10, 0, 1) * 0.3)
    return pa.table({
        "doc_id": pc.cast(t["doc_id"], pa.int64()),
        "n_words": pa.array(n_words),
        "stop_ratio_micro": pa.array(
            np.floor(stop_ratio * 1e6 + 0.5).astype(np.int64)),
        "mean_wlen_micro": pa.array(
            np.floor(mean_wlen * 1e6 + 0.5).astype(np.int64)),
        "quality_milli": pa.array(
            np.floor(score * 1000 + 0.5).astype(np.int64)),
    })


def q_quality_score(sf_dir: str):
    """Length / punctuation / stopword-ratio quality heuristic (gated);
    see :func:`quality_batch` for the kernel."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow")


_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS))

SQL_QUALITY_SCORE = rf"""
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
), b AS (
  SELECT doc_id::BIGINT AS doc_id,
    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
    len(list_filter(regexp_extract_all(text, '\S+'),
                    w -> w IN ({_STOP_SQL})))::DOUBLE AS n_stop,
    coalesce(list_sum(list_transform(regexp_extract_all(text, '\S+'),
                                     w -> length(w))), 0)::DOUBLE AS sum_wlen,
    len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE AS n_punct,
    length(text)::BIGINT AS n_chars
  FROM d
)
SELECT doc_id, n_words,
  floor(n_stop / greatest(n_words, 1) * 1000000 + 0.5)::BIGINT AS stop_ratio_micro,
  floor((CASE WHEN n_words > 0 THEN sum_wlen / greatest(n_words, 1) ELSE 0 END)
        * 1000000 + 0.5)::BIGINT AS mean_wlen_micro,
  floor((least(greatest(n_words / 50.0, 0), 1) * 0.4
         + least(greatest(n_stop / greatest(n_words, 1) * 3, 0), 1) * 0.3
         + least(greatest(1 - n_punct / greatest(n_chars, 1) * 10, 0), 1) * 0.3)
        * 1000 + 0.5)::BIGINT AS quality_milli
FROM b
"""


# ---------------------------------------------------------------------------
# canonical text normalization (gated): ASCII casefold + whitespace collapse
# ---------------------------------------------------------------------------
# Scope is chosen for CROSS-IMPLEMENTATION byte-exactness, measured, not
# assumed: full Unicode lower() diverges between this Arrow (utf8proc) and
# DuckDB on 7/27571 BMP+SMP codepoints (newer case mappings, e.g. Vithkuqi),
# and NFC diverges on ~1/3000 random combining-mark sequences (canonical
# reordering) — and pyarrow 16.1's utf8_normalize returns NFD regardless of
# the form argument, so NFC normalization here would be a per-row Python
# fallback anyway.  ASCII casefold (translate on 26 chars) and the RE2
# whitespace class are identical everywhere, so the gate holds on ANY
# input, not just ASCII fixtures.

_WS_RUN = "[\t\n\f\r ]+"


def normalize_text(txt) -> pa.Array:
    """ASCII-lowercase, collapse RE2-whitespace runs to one space, trim.
    Nulls normalize to ''.  Module-level for tests."""
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    x = pc.ascii_lower(pc.fill_null(txt, ""))
    x = pc.replace_substring_regex(x, _WS_RUN, " ")
    return pc.utf8_trim(x, " ")


def q_text_normalize(sf_dir: str):
    """Canonical-form text column: one pure vectorized map (no shuffle,
    no driver bytes), emitting the normalized text plus a changed flag —
    the preprocessing front of the exact-dedup family (normalized
    collisions catch case/whitespace near-dups that byte-exact dedup
    misses)."""
    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        norm = normalize_text(txt)
        changed = pc.cast(pc.not_equal(norm, pc.fill_null(txt, "")),
                          pa.int64())
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "norm_text": norm, "changed": changed})

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None) \
        .sort("doc_id")


SQL_TEXT_NORMALIZE = r"""
SELECT doc_id,
       trim(regexp_replace(translate(coalesce(text, ''),
                'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
            '[\t\n\f\r ]+', ' ', 'g'), ' ') AS norm_text,
       (trim(regexp_replace(translate(coalesce(text, ''),
                'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
            '[\t\n\f\r ]+', ' ', 'g'), ' ') <> coalesce(text, ''))::BIGINT
           AS changed
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bigram-familiarity LM score (count-based KenLM-filter analog, gated)
# ---------------------------------------------------------------------------

def q_bigram_familiarity(sf_dir: str):
    """Per-document language-model familiarity score: the sum, over every
    bigram INSTANCE in the doc, of that bigram's corpus-wide count — the
    integer-exact analog of KenLM-perplexity quality filtering (frequent
    word transitions score high, gibberish scores low), usable as a
    curation signal without any float log-prob.

    Plan (two chained hash exchanges, nothing driver-resident but the
    per-doc output): per-batch partials emit one (bigram, doc_id, k) row
    per DISTINCT bigram per doc (batches hold whole docs, so k is final);
    exchange 1 keys on the bigram string — co-location makes the
    per-partition count the GLOBAL corpus count c, and each doc row
    immediately folds to a (doc_id, sum k*c) partial, so bigram strings
    never leave the exchange; exchange 2 keys on doc_id and sums the
    partials.  Docs with < 2 tokens re-enter with score 0 from a
    doc_id-column-only read.  At 100 TB the bigram-string key can swap to
    a 128-bit hash (collision-checked) — documented, not needed for the
    gate."""
    import pandas as pd

    from engine.stages import hash_group_exchange

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(pc.utf8_lower(txt))
        counts = offs[1:] - offs[:-1]
        n = len(counts)
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        empty = pa.table({"bigram": pa.array([], type=pa.string()),
                          "doc_id": pa.array([], type=pa.int64()),
                          "k": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        local = (np.arange(len(doc_idx), dtype=np.int64)
                 - np.repeat(offs[:-1], counts))
        # a token is a bigram LEFT iff it has a successor in the same doc;
        # the zero-length artifact token of empty docs is always a sole
        # token (count == 1) so it can never qualify
        li = np.flatnonzero(local < counts[doc_idx] - 1)
        if len(li) == 0:
            return empty
        big = pc.binary_join_element_wise(
            flat.take(pa.array(li)), flat.take(pa.array(li + 1)), " ")
        g = pa.TableGroupBy(pa.table({
            "bigram": big,
            "doc_id": pa.array(dids[doc_idx[li]], type=pa.int64()),
        }), ["bigram", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"bigram": g["bigram"], "doc_id": g["doc_id"],
                         "k": pc.cast(g["count_all"], pa.int64())})

    def fold_bigram(t: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(t["bigram"].to_pandas(), sort=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        c = np.bincount(codes, weights=k, minlength=len(uniq))
        contrib = k * c[codes].astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "doc_id": t["doc_id"],
            "part": pa.array(contrib, type=pa.int64()),
        }), ["doc_id"]).aggregate([("part", "sum")])
        return pa.table({"doc_id": g["doc_id"],
                         "part": pc.cast(g["part_sum"], pa.int64())})

    def fold_doc(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["doc_id"]).aggregate([("part", "sum")])
        return pa.table({"doc_id": pc.cast(g["doc_id"], pa.int64()),
                         "familiarity": pc.cast(g["part_sum"], pa.int64())})

    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(path).num_rows
    df = hash_group_exchange(
        lambda: _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow"),
        [["bigram"], ["doc_id"]], [fold_bigram, fold_doc],
        collect=True, rows_hint=max(1, n_docs) * 64)
    all_ids = pq.read_table(path, columns=["doc_id"])["doc_id"] \
        .to_numpy(zero_copy_only=False)
    out = pd.DataFrame({"doc_id": np.sort(all_ids)})
    if df.empty or "doc_id" not in df.columns:
        out["familiarity"] = np.int64(0)
        return out
    out = out.merge(df, on="doc_id", how="left")
    out["familiarity"] = out["familiarity"].fillna(0).astype("int64")
    return out


SQL_BIGRAM_FAMILIARITY = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\S+') AS t
  FROM documents
), bg AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
  FROM toks, UNNEST(range(1, len(t))) AS r(i)
), c AS (
  SELECT bigram, count(*)::BIGINT AS c FROM bg GROUP BY 1
), s AS (
  SELECT bg.doc_id, sum(c.c)::BIGINT AS familiarity
  FROM bg JOIN c USING (bigram) GROUP BY 1
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(s.familiarity, 0)::BIGINT AS familiarity
FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS scheme)
# ---------------------------------------------------------------------------

_WIN_K = 3   # word k-gram length
_WIN_W = 4   # winnowing window (consecutive k-grams)


def q_winnowing_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting scheme): over each doc's
    word-``k``-gram rolling hashes, every window of ``w`` consecutive
    hashes contributes its MINIMUM (rightmost position on ties), and the
    selected (position, hash) pairs — deduplicated — are the doc's
    fingerprints.  Unlike the single whole-doc rolling fingerprint
    (:func:`q_fingerprint_rolling`) these are LOCAL: any shared substring
    of length >= w+k-1 words guarantees a shared fingerprint, so they
    feed plagiarism / overlap detection directly.

    Docs with fewer than ``k`` words emit nothing; docs with 1..w-1
    k-grams emit the min over all of them (one short window at s=0), the
    standard every-doc-fingerprinted extension.

    Plan: PURE MAP — a doc's windows never cross rows, so there is no
    exchange at all; the sliding min/rightmost-argmin is w-1 vectorized
    numpy passes per batch (w is a small constant), and md5 (the
    gate-shared word hash) is computed once per DISTINCT word via
    factorize.  At 100 TB this is embarrassingly parallel; output is
    ~(n_words/w') fingerprint rows per doc (the 2/(w+1) expected density
    of winnowing), each 24 B."""
    import pandas as pd

    B = np.uint64(_ROLL_B)
    MAXU = np.uint64(0xFFFFFFFFFFFFFFFF)

    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = _split_tokens(txt)
        dids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "pos": pa.array([], type=pa.int64()),
                          "fp": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        # the whitespace-only artifact token (one zero-length word where
        # the oracle's \S+ extract yields none) => the doc has no words
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        nwords = counts.copy()
        ws_only = (counts == 1) & (wlen[offs[:-1]] == 0)
        nwords[ws_only] = 0
        nk = np.maximum(nwords - (_WIN_K - 1), 0)   # k-grams per doc
        if int(nk.sum()) == 0:
            return empty
        # word hashes: md5-32 once per DISTINCT word
        codes, uniques = pd.factorize(flat.to_pandas(), sort=False)
        uh = np.empty(len(uniques), dtype=np.uint64)
        for i, w in enumerate(uniques):
            uh[i] = int.from_bytes(
                hashlib.md5(w.encode("utf-8")).digest()[:4], "big")
        wh = uh[codes]
        # k-gram rolling hashes, contiguous per doc in one global array
        doc_of_w = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        local_w = (np.arange(len(wh), dtype=np.int64)
                   - np.repeat(offs[:-1], counts))
        gi = np.flatnonzero(local_w < nk[doc_of_w])   # k-gram start words
        kh = wh[gi]
        for j in range(1, _WIN_K):
            kh = ((kh * B) & _MASK32) + wh[gi + j]
            kh &= _MASK32
        kdoc = doc_of_w[gi]
        klocal = local_w[gi]
        nk_rep = nk[kdoc]
        # sliding min over w consecutive k-grams + rightmost argmin:
        # pad with MAX so out-of-doc shifts never win
        khp = np.concatenate([kh, np.full(_WIN_W - 1, MAXU, dtype=np.uint64)])
        idx = np.arange(len(kh), dtype=np.int64)
        m = kh.copy()
        for j in range(1, _WIN_W):
            valid = klocal + j < nk_rep
            m = np.minimum(m, np.where(valid, khp[idx + j], MAXU))
        sel_j = np.zeros(len(kh), dtype=np.int64)
        for j in range(1, _WIN_W):                    # ascending => max j wins
            valid = klocal + j < nk_rep
            hit = valid & (khp[idx + j] == m)
            sel_j[hit] = j
        starts = (klocal <= nk_rep - _WIN_W) | ((klocal == 0)
                                                & (nk_rep < _WIN_W))
        si = np.flatnonzero(starts)
        out_doc = kdoc[si]
        out_pos = klocal[si] + sel_j[si]
        out_fp = m[si].astype(np.int64)
        # distinct (doc, pos): adjacent windows usually re-select the same
        # fingerprint — that's the winnowing density guarantee
        key = out_doc * np.int64(1) << np.int64(32) | out_pos  # docs/batch < 2^31
        _, first = np.unique(key, return_index=True)
        return pa.table({"doc_id": pa.array(dids[out_doc[first]]),
                         "pos": pa.array(out_pos[first]),
                         "fp": pa.array(out_fp[first])})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


SQL_WINNOWING_FINGERPRINTS = rf"""
WITH wh AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(coalesce(text, ''), '\S+'),
                        w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hs,
         len(regexp_extract_all(coalesce(text, ''), '\S+')) AS n
  FROM documents
), kg AS (
  SELECT doc_id, i AS pos,
         ((hs[i + 1] * {_ROLL_B} + hs[i + 2]) % {_ROLL_MOD} * {_ROLL_B}
          + hs[i + 3]) % {_ROLL_MOD} AS kh
  FROM wh, UNNEST(range(n - {_WIN_K - 1})) AS r(i)
  WHERE n >= {_WIN_K}
), wins AS (
  SELECT k1.doc_id, k1.pos AS s, min(k2.kh) AS m, count(*) AS cnt
  FROM kg k1
  JOIN kg k2 ON k2.doc_id = k1.doc_id
            AND k2.pos BETWEEN k1.pos AND k1.pos + {_WIN_W - 1}
  GROUP BY k1.doc_id, k1.pos
  HAVING count(*) = {_WIN_W} OR k1.pos = 0
), sel AS (
  SELECT w.doc_id, max(k.pos) AS pos, w.m AS fp
  FROM wins w
  JOIN kg k ON k.doc_id = w.doc_id
           AND k.pos BETWEEN w.s AND w.s + {_WIN_W - 1} AND k.kh = w.m
  GROUP BY w.doc_id, w.s, w.m
)
SELECT DISTINCT doc_id::BIGINT AS doc_id, pos::BIGINT AS pos, fp::BIGINT AS fp
FROM sel
"""
