"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline stages: token counting, quality scoring,
language ID, document fingerprinting.  All are single-pass ``map_batches``
(no shuffle); regex work uses RE2 via ``pyarrow.compute`` so the DuckDB
oracle (also RE2) matches exactly.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _docs(sf_dir: str, columns=None):
    import ray
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
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
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t["text"].to_pylist()]
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fp": pa.array(fps, type=pa.string())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_DOC_FINGERPRINT = "SELECT doc_id::BIGINT AS doc_id, md5(text) AS fp FROM documents"


_ROLL_B = 1000003
_ROLL_SEED = 2166136261  # FNV-32 offset
_ROLL_MOD = 1 << 32


def q_fingerprint_rolling(sf_dir: str):
    """Order-sensitive polynomial rolling fingerprint over words
    (Rabin-Karp fold, 32-bit): ``h = (h*B + md5_32(word)) mod 2^32`` —
    the shard key a dedup pipeline ranges on.  Word hashes are the first
    32 bits of md5 so the DuckDB oracle (md5 + list_reduce fold) computes
    the identical value."""
    def fn(t: pa.Table) -> pa.Table:
        fps = []
        for s in t["text"].to_pylist():
            h = _ROLL_SEED
            for w in s.split():
                wh = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:8], 16)
                h = (h * _ROLL_B + wh) % _ROLL_MOD
            fps.append(h)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fingerprint": pa.array(fps, type=pa.int64())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_FINGERPRINT_ROLLING = rf"""
SELECT doc_id::BIGINT AS doc_id,
  list_reduce(
    list_prepend({_ROLL_SEED}::BIGINT,
      list_transform(regexp_extract_all(text, '\S+'),
                     w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)),
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


def _split_tokens(texts):
    """texts -> (flat token array, per-doc offsets) via Arrow split.

    Nulls are treated as empty documents (filled to '' before the split) so
    zero-token segments are representable anywhere in the batch."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    w = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
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
         regexp_extract_all(lower(text), '\S+') AS words
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
WITH b AS (
  SELECT doc_id::BIGINT AS doc_id,
    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
    len(list_filter(regexp_extract_all(text, '\S+'),
                    w -> w IN ({_STOP_SQL})))::DOUBLE AS n_stop,
    coalesce(list_sum(list_transform(regexp_extract_all(text, '\S+'),
                                     w -> length(w))), 0)::DOUBLE AS sum_wlen,
    len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE AS n_punct,
    length(text)::BIGINT AS n_chars
  FROM documents
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
