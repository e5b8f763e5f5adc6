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


def q_fingerprint_rolling(sf_dir: str):
    """Polynomial rolling hash (Rabin-Karp style) over words — the
    reference-free fingerprint a dedup pipeline shards on.  Rows-only check
    (not expressible in ANSI SQL)."""
    B = np.uint64(1000003)

    def fn(t: pa.Table) -> pa.Table:
        fps = []
        for s in t["text"].to_pylist():
            h = np.uint64(1469598103934665603)
            for w in s.split():
                wh = np.uint64(int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"))
                h = (h * B + wh) & np.uint64(0xFFFFFFFFFFFFFFFF)
            fps.append(int(h.view(np.int64)))
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fingerprint": pa.array(fps, type=pa.int64())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


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


class LangId:
    """Actor-pool language-ID stage: profiles compiled once per actor
    (__init__), scored per batch — the ST4 actor shape."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd
        preds = []
        for s in t["text"].to_pylist():
            words = set(s.lower().split())
            scores = {lang: len(words & prof) for lang, prof in self.profiles.items()}
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best if scores[best] > 0 else "unknown")
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "pred_lang": pa.array(preds, type=pa.string())})


def q_lang_id(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)


# ---------------------------------------------------------------------------
# quality scoring (rows-only: composite float heuristic)
# ---------------------------------------------------------------------------

_STOPWORDS = frozenset("the and of a to in is for on it as at by be this".split())


def q_quality_score(sf_dir: str):
    """Length / punctuation / stopword-ratio quality heuristic."""
    def fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        txt = pd.Series(t["text"].to_pandas())
        words = txt.str.split()
        n_words = words.str.len().fillna(0).astype(np.int64)
        stop_ratio = words.map(
            lambda ws: sum(w in _STOPWORDS for w in ws) / max(1, len(ws)))
        mean_wlen = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        n_chars = txt.str.len().astype(np.int64)
        punct = txt.str.count(r"[.,!?;:]") / n_chars.clip(lower=1)
        score = (np.clip(n_words / 50.0, 0, 1) * 0.4
                 + np.clip(stop_ratio * 3, 0, 1) * 0.3
                 + np.clip(1 - punct * 10, 0, 1) * 0.3)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_words": pa.array(n_words.to_numpy()),
            "stop_ratio": pa.array(np.round(stop_ratio.to_numpy(dtype=np.float64), 6)),
            "mean_word_len": pa.array(np.round(mean_wlen.to_numpy(dtype=np.float64), 6)),
            "quality_score": pa.array(np.round(score.to_numpy(dtype=np.float64), 6)),
        })
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
