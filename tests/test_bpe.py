"""BPE trainer/tokenizer pinned to a from-scratch reference implementation.

The reference re-counts every pair from scratch each round (no incremental
updates, no index) — the slowest, most obviously-correct formulation — and
the engine's incremental trainer must reproduce it merge-for-merge.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from engine import bpe

SF_DIR = "/root/testdata/sf0.001"


def _ref_train(word_counts: dict, n_merges: int):
    """Brute-force Sennrich BPE: full pair re-count per round, ties break
    on the lexicographically smallest (left, right)."""
    seqs = {w: list(w) + [bpe._EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, seq in seqs.items():
            f = word_counts[w]
            for p in zip(seq, seq[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append((best[0], best[1], counts[best]))
        a, b = best
        for w, seq in seqs.items():
            new, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seqs[w] = new
    return merges, seqs


def test_trainer_matches_bruteforce_reference():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "low-key": 1}
    want, _ = _ref_train(wc, 25)
    words = sorted(wc)
    got = bpe.train_merges(words, [wc[w] for w in words], 25)
    assert got == want
    # the classic first merges on this corpus: 'es' then 'est' dominate
    assert got[0][:2] == ("e", "s") and got[0][2] == 9
    assert got[1][:2] == ("es", "t") and got[1][2] == 9


def test_trainer_overlapping_pairs_left_to_right():
    """'aaaa' with pair (a,a): left-to-right gives (aa)(aa), and the pair
    count weights occurrences, not positions, exactly as the reference."""
    wc = {"aaaa": 3, "aa": 1}
    want, _ = _ref_train(wc, 5)
    got = bpe.train_merges(sorted(wc), [wc[w] for w in sorted(wc)], 5)
    assert got == want


def test_apply_merges_replays_training(ray_session):
    """For every trained word, replaying the merge table reproduces the
    trainer's final symbol sequence, and concatenating the tokens
    recovers word + </w>."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges, seqs = _ref_train(wc, 12)
    for w in wc:
        toks = bpe.apply_merges(w, merges)
        assert toks == seqs[w], w
        assert "".join(toks) == w + bpe._EOW
    # unseen word still tokenizes losslessly
    toks = bpe.apply_merges("lowest", merges)
    assert "".join(toks) == "lowest" + bpe._EOW


def test_bpe_queries_on_corpus(ray_session):
    """End-to-end over sf0.001: the distributed word fold + trainer equals
    the reference run on a driver-computed word count, and the tokenize
    pass is consistent (bounded by word/char counts, deterministic)."""
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    wc = {}
    for txt in src["text"].to_pylist():
        for w in (txt or "").lower().split():
            wc[w] = wc.get(w, 0) + 1
    want, seqs = _ref_train(wc, bpe._N_MERGES)

    got = bpe.q_bpe_merges(SF_DIR)
    rows = list(zip(got["left"].to_pylist(), got["right"].to_pylist(),
                    got["pair_count"].to_pylist()))
    assert rows == want
    assert got["rank"].to_pylist() == list(range(len(want)))

    tok = bpe.q_bpe_tokenize(SF_DIR).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert len(tok) == src.num_rows
    # reference token counts per doc
    merges = [(a, b, c) for a, b, c in want]
    for _, r in tok.head(25).iterrows():
        txt = src["text"][src["doc_id"].to_pylist().index(r["doc_id"])].as_py()
        words = (txt or "").lower().split()
        assert r["n_words"] == len(words)
        assert r["n_bpe_tokens"] == sum(
            len(bpe.apply_merges(w, merges)) for w in words)
    # merging never inflates: tokens <= chars+1 per word, >= words
    assert (tok["n_bpe_tokens"] >= tok["n_words"]).all()


def test_bpe_empty_and_null_corpus(ray_session, tmp_path):
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    d = tmp_path / "empty"
    d.mkdir()
    pq.write_table(src.slice(0, 0), str(d / "documents.parquet"))
    assert bpe.q_bpe_merges(str(d)).num_rows == 0
    assert bpe.q_bpe_tokenize(str(d)).count() == 0

    row = src.slice(0, 1).to_pydict()
    row["text"] = [None]
    d2 = tmp_path / "nulls"
    d2.mkdir()
    pq.write_table(pa.table(row, schema=src.schema),
                   str(d2 / "documents.parquet"))
    assert bpe.q_bpe_merges(str(d2)).num_rows == 0
    t = bpe.q_bpe_tokenize(str(d2)).to_pandas()
    assert len(t) == 1 and t["n_bpe_tokens"][0] == 0


# ---------------------------------------------------------------------------
# property: incremental trainer == brute-force reference on random dicts
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_ALPHA = "abcz"   # tiny alphabet forces heavy pair collisions and reuse


@settings(max_examples=60, deadline=None)
@given(words=st.lists(
    st.text(alphabet=_ALPHA, min_size=1, max_size=7),
    min_size=1, max_size=12, unique=True),
    counts=st.lists(st.integers(1, 9), min_size=12, max_size=12),
    k=st.integers(1, 30))
def test_trainer_property_matches_reference(words, counts, k):
    """The incremental-update trainer must equal the full-re-count
    reference for every random word dict, merge count, and tie pattern
    (repetitive words like 'aaaa' exercise overlap + stale-index paths)."""
    wc = {w: c for w, c in zip(words, counts)}
    want, _ = _ref_train(wc, k)
    ws = sorted(wc)
    got = bpe.train_merges(ws, [wc[w] for w in ws], k)
    assert got == want
