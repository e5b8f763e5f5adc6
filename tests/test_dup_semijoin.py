"""Substring-level dedup at the boilerplate-flood regime (round-4 #1).

Proves the two claims VERDICT r3 asked for:
* the duplicated-n-gram set is hash-keyed (24 B/row exchange) and, past
  ``_DUP_BROADCAST_MAX``, moves by hash-partitioned semi-join with ZERO
  driver-resident dup bytes — on a flooded corpus both paths produce
  byte-identical output and the auto-switch engages;
* the span-removal rewrite survives adversarial overlap structure
  (nested/adjacent/full-doc duplicated spans, multi-byte whitespace)
  against a scalar rebuild (hypothesis).
"""

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from engine import filters

_RE2_TOKEN = re.compile(r"[^\t\n\f\r ]+")
_N = filters._NGRAM_N


@pytest.fixture(scope="module")
def flood_corpus(tmp_path_factory):
    """400 docs sharing a 60-token boilerplate block (so the duplicated
    set is large relative to a tiny broadcast budget) + unique tails."""
    d = tmp_path_factory.mktemp("flood_sf")
    rng = np.random.default_rng(20260818)
    words = [f"w{i}" for i in range(50)]
    boiler = " ".join(words[i % 50] for i in range(60))
    rows = []
    for i in range(400):
        tail = " ".join(rng.choice(words, size=10))
        rows.append({"doc_id": i, "text": f"{boiler} uniq{i} {tail}",
                     "lang": "en", "source": f"src{i % 3}",
                     "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def _sorted_df(res) -> pd.DataFrame:
    return res.to_pandas().sort_values("doc_id", ignore_index=True)


def test_flood_semijoin_equals_broadcast_stats(ray_session, flood_corpus):
    b = _sorted_df(filters.q_dup_ngram_stats(flood_corpus, method="broadcast"))
    assert filters.LAST_DUP_SET["mode"] == "broadcast"
    bc_bytes = filters.LAST_DUP_SET["driver_bytes"]
    assert bc_bytes == 16 * filters.LAST_DUP_SET["n_dup"]
    s = _sorted_df(filters.q_dup_ngram_stats(flood_corpus, method="semijoin"))
    assert filters.LAST_DUP_SET["mode"] == "semijoin"
    assert filters.LAST_DUP_SET["driver_bytes"] == 0
    pd.testing.assert_frame_equal(b, s[b.columns])
    # the flood actually flagged docs (the test corpus is adversarial)
    assert b["flagged"].any()


def test_flood_semijoin_equals_broadcast_spans(ray_session, flood_corpus):
    b = _sorted_df(filters.q_dup_span_removal(flood_corpus,
                                              method="broadcast"))
    s = _sorted_df(filters.q_dup_span_removal(flood_corpus,
                                              method="semijoin"))
    assert filters.LAST_DUP_SET["driver_bytes"] == 0
    pd.testing.assert_frame_equal(b, s[b.columns])
    # boilerplate spans were actually removed
    assert (b["n_kept"] < b["n_tokens"]).any()


def test_auto_switch_engages_past_threshold(ray_session, flood_corpus,
                                            monkeypatch):
    monkeypatch.setattr(filters, "_DUP_BROADCAST_MAX", 10)
    _ = _sorted_df(filters.q_dup_ngram_stats(flood_corpus, method="auto"))
    assert filters.LAST_DUP_SET["mode"] == "semijoin"
    assert filters.LAST_DUP_SET["n_dup"] > 10
    assert filters.LAST_DUP_SET["driver_bytes"] == 0
    monkeypatch.setattr(filters, "_DUP_BROADCAST_MAX", 5_000_000)
    _ = _sorted_df(filters.q_dup_ngram_stats(flood_corpus, method="auto"))
    assert filters.LAST_DUP_SET["mode"] == "broadcast"


# ---------------------------------------------------------------------------
# adversarial span-removal property test (no Ray: exercises the kernels the
# broadcast path composes — dup-set build, 128-bit membership, the +-1
# coverage difference array, and the Arrow list re-offset rebuild)
# ---------------------------------------------------------------------------

def _scalar_span_removal(texts):
    """Per-doc scalar rebuild: string n-grams, set membership, nested
    Python loops — the obviously-correct spec."""
    toks = [_RE2_TOKEN.findall(t or "") for t in texts]
    from collections import defaultdict
    ngdocs = defaultdict(set)
    for i, ws in enumerate(toks):
        for j in range(max(len(ws) - _N + 1, 0)):
            ngdocs[" ".join(ws[j:j + _N])].add(i)
    dup = {g for g, ds in ngdocs.items() if len(ds) >= 2}
    out = []
    for i, ws in enumerate(toks):
        cov = [False] * len(ws)
        for j in range(max(len(ws) - _N + 1, 0)):
            if " ".join(ws[j:j + _N]) in dup:
                for k in range(j, j + _N):
                    cov[k] = True
        kept = [w for w, c in zip(ws, cov) if not c]
        if ws:
            out.append((i, len(ws), len(kept), " ".join(kept)))
    return out


def _engine_span_removal(texts):
    """The broadcast path's kernels composed in-process (whole corpus is
    one batch, so the per-batch distinct-doc counts ARE the corpus
    counts)."""
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    part = filters._dup_partial(t)
    nd = part["nd"].to_numpy(zero_copy_only=False)
    keep = nd >= 2
    dup = filters._pair_pack(
        part["h1"].to_numpy(zero_copy_only=False)[keep],
        part["h2"].to_numpy(zero_copy_only=False)[keep])
    dup.sort()
    from engine.text import _split_tokens
    flat, offs = _split_tokens(t["text"])
    total = len(flat)
    covered = np.zeros(total, dtype=bool)
    h1, h2, doc_idx, pos, _ = filters._ngram_hash_positions(t["text"])
    if len(h1):
        is_dup = np.isin(filters._pair_pack(h1, h2), dup)
        covered = filters._covered_from_starts(
            total, (offs[doc_idx] + pos)[is_dup])
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    res = filters._rebuild_kept(ids, flat, offs, covered)
    return list(zip(res["doc_id"].to_pylist(), res["n_tokens"].to_pylist(),
                    res["n_kept"].to_pylist(), res["kept_text"].to_pylist()))


# small alphabet so duplicated 5-grams arise; separators span the RE2 \s
# class; NBSP appears INSIDE a token (it is NOT whitespace to RE2)
_WORDS = ["aa", "bb", "cc", "dd", "nb sp"]
_SEPS = [" ", "\t", "\n", "  ", "\f", "\r", " \t"]


@st.composite
def _doc(draw):
    n = draw(st.integers(min_value=0, max_value=14))
    ws = [draw(st.sampled_from(_WORDS)) for _ in range(n)]
    seps = [draw(st.sampled_from(_SEPS)) for _ in range(max(n - 1, 0))]
    parts = []
    for i, w in enumerate(ws):
        parts.append(w)
        if i < len(seps):
            parts.append(seps[i])
    lead = draw(st.sampled_from(["", " ", "\t "]))
    trail = draw(st.sampled_from(["", " ", "\n"]))
    return lead + "".join(parts) + trail


@settings(max_examples=120, deadline=None)
@given(st.lists(_doc(), min_size=2, max_size=7))
def test_span_removal_matches_scalar_rebuild(texts):
    assert _engine_span_removal(texts) == _scalar_span_removal(texts)


def test_span_removal_adversarial_shapes():
    """Nested / adjacent / full-doc duplicated spans, exactly-N docs."""
    w = "a b c d e f g h i j"              # 10 tokens
    cases = [
        [w, w],                             # full-doc duplicate
        [w, w, "z y x w v"],                # full dup + unique 5-token doc
        ["a b c d e", "a b c d e"],         # exactly N tokens, all covered
        [w + " " + w, w],                   # overlapping repeats of the dup
        ["p q r s t a b c d e", "a b c d e u v w x y"],  # adjacent spans
        ["a b c d e f", "b c d e f g"],     # staggered/nested coverage
    ]
    for texts in cases:
        assert _engine_span_removal(texts) == _scalar_span_removal(texts), \
            texts
