"""Distributed BPE tokenizer training and application.

``q_bpe_merges`` learns the top-``_N_MERGES`` byte-pair-encoding merges
over the documents corpus; ``q_bpe_tokenize`` applies the learned merge
table to every document and reports its BPE token count.  Both are
rows-only driver entries (an iterative trainer is not SQL-expressible);
tests/test_bpe.py pins them to a from-scratch re-counting reference
implementation, exactly.

Reference parity: the reference engine has no tokenizer stage — this
extends it with the tokenizer-training step of an LLM data pipeline,
per the task brief's first-class training-data operators.

Scale shape (100 TB):
* Phase 1 (the only all-to-all) folds the corpus to a WORD-FREQUENCY
  table: per-batch factorize+bincount partials -> one ``groupby(word)``
  sum.  Its size is the distinct vocabulary — bounded by language, not
  corpus size (Heaps' law; tens of millions of rows at web scale) — the
  same reduction SentencePiece/HF tokenizers perform before training.
* Phase 2 (the trainer) runs on that vocabulary-bounded dict on the
  driver with incremental pair-count updates: each round re-counts only
  the words containing the merged pair.  Work is independent of corpus
  row count.
* Application is a pure map: the merge list is broadcast once via
  ``ray.put``; each batch tokenizes its DISTINCT words only (Zipf
  amortization) and scatters counts back through the factorize codes.

Determinism: ties in pair counts break lexicographically on (left,
right), so the merge table is reproducible anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.io import read_parquet_clean
from engine.text import _split_tokens

_N_MERGES = 40
_EOW = "</w>"          # Sennrich end-of-word marker


def _docs(sf_dir: str, columns=None):
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns)


def corpus_word_counts(sf_dir: str):
    """Distributed word-frequency fold: lowercased ``\\S+`` tokens ->
    (word, cnt) via combiner-first partials and one small groupby."""
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
        keep = np.array([len(w) > 0 for w in uniq])
        return pa.table({"word": pa.array(uniq[keep], type=pa.string()),
                         "cnt": pa.array(counts[keep])})

    folded = _docs(sf_dir, ["text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
    tabs = [b for b in collect_tables(folded) if b.num_columns]
    if not tabs:
        return [], np.zeros(0, dtype=np.int64)
    vt = pa.concat_tables(tabs)
    words = vt["word"].to_pylist()
    cnts = vt["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(np.array(words, dtype=object), kind="stable")
    return [words[i] for i in order], cnts[order]


def train_merges(words, counts, n_merges: int = _N_MERGES):
    """Learn up to ``n_merges`` BPE merges from a (word, count) dict.

    Classic Sennrich trainer with the ``</w>`` marker and incremental
    updates: a ``pair -> {word idx}`` index restricts each round's
    re-count to the words actually containing the chosen pair.  Returns
    ``[(left, right, pair_count)]`` in merge order.
    """
    seqs = [list(w) + [_EOW] for w in words]
    freqs = [int(c) for c in counts]

    pair_counts: dict = {}
    pair_words: dict = {}
    for wi, (seq, f) in enumerate(zip(seqs, freqs)):
        for p in zip(seq, seq[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)

    merges = []
    for _ in range(n_merges):
        best, best_cnt = None, 0
        for p, c in pair_counts.items():
            if c > best_cnt or (c == best_cnt and best is not None
                                and p < best):
                best, best_cnt = p, c
        if best is None or best_cnt <= 0:
            break
        merges.append((best[0], best[1], best_cnt))
        a, b = best
        merged = a + b
        for wi in sorted(pair_words.get(best, ())):
            seq, f = seqs[wi], freqs[wi]
            for p in zip(seq, seq[1:]):     # retract the old contributions
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
            new = []
            i = 0
            while i < len(seq):             # left-to-right occurrence merge
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seqs[wi] = new
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
        pair_words.pop(best, None)
    return merges


def apply_merges(word: str, merges) -> list:
    """Tokenize one word by replaying the learned merges in rank order —
    by construction identical to the trainer's final symbol sequence for
    every in-vocabulary word."""
    seq = list(word) + [_EOW]
    for a, b, _ in merges:
        if len(seq) < 2:
            break
        merged, new, i = a + b, [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(seq[i])
                i += 1
        seq = new
    return seq


def q_bpe_merges(sf_dir: str) -> pa.Table:
    """The learned merge table: (rank, left, right, pair_count)."""
    words, counts = corpus_word_counts(sf_dir)
    merges = train_merges(words, counts, _N_MERGES)
    return pa.table({
        "rank": pa.array(range(len(merges)), type=pa.int64()),
        "left": pa.array([m[0] for m in merges], type=pa.string()),
        "right": pa.array([m[1] for m in merges], type=pa.string()),
        "pair_count": pa.array([m[2] for m in merges], type=pa.int64()),
    })


def q_bpe_tokenize(sf_dir: str):
    """Apply the corpus-trained merges to every document: per doc, the
    whitespace word count and the BPE token count after merging.  Merge
    list is broadcast once; each batch tokenizes only its distinct words
    and scatters lengths back through factorize codes."""
    import ray

    words, counts = corpus_word_counts(sf_dir)
    merges_ref = ray.put(train_merges(words, counts, _N_MERGES))

    def fn(t: pa.Table) -> pa.Table:
        merges = ray.get(merges_ref)
        flat, offs = _split_tokens(pc.utf8_lower(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]))
        codes, uniq = pd.factorize(flat.to_pandas(), sort=False)
        tok_len = np.array([len(apply_merges(w, merges)) if w else 0
                            for w in uniq], dtype=np.int64)
        per_word = tok_len[codes] if len(codes) else np.zeros(0, np.int64)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        cs = np.concatenate([[0], np.cumsum(per_word)])
        bpe = cs[offs[1:]] - cs[offs[:-1]]
        csw = np.concatenate([[0], np.cumsum((wlen > 0).astype(np.int64))])
        nw = csw[offs[1:]] - csw[offs[:-1]]
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_words": pa.array(nw),
            "n_bpe_tokens": pa.array(bpe),
        })

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None)
