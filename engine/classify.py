"""Model-based quality/language filtering: a logistic-regression
classifier TRAINED DISTRIBUTED over the corpus (the CCNet / GPT-3
"fastText quality classifier" stage), then applied as a scoring map.

Training is full-batch gradient descent where each iteration is ONE
streaming pass: every batch emits a (dim+1)-float partial (block key +
X^T (p - y) sums) and the driver folds the tiny partials and updates
the weight vector — the only data that ever reaches the driver is one
~40-byte row per block per iteration.  Scale shape: features are
extracted ONCE into a thin materialized table (3 ints + id + label per
doc) so the 40 GD passes stream the ~40 B/doc feature table, not the
text; at 10^12 docs that table is object-store-resident and the driver
still sees only per-block partials.  Determinism: partials are folded
in sorted block-key order (min doc_id), so the same corpus + layout
reproduces bit-identical weights run-to-run; vs the single-matrix numpy
reference the chunked float fold differs only in summation order
(~1e-8 relative over 40 iterations — the pytest bound is rtol 1e-5).

Rows-only query (iterative float training is not SQL-expressible); the
pytest pins the distributed trainer against a single-process numpy
reference on the same features (tests/test_extras.py).

Reference parity note: the reference engine (src/parser.py) has no
model-based filtering; this extends it per the task brief's
training-data-pipeline operator list.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.io import read_parquet_clean
from engine.text import _split_tokens, _segment_sums

_LR = 2.0
_ITERS = 40


def _docs(sf_dir: str, columns=None):
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns)


_TOP_WORD_LABEL_MILLI = 150  # label: Gopher top-word rule fires


def _feature_batch(t: pa.Table) -> pa.Table:
    """Vectorized per-doc features and distillation label.

    Features (integer milli/centi-rates so the thin table is exact):
    token count, distinct-token ratio, mean word length.  Label: the
    Gopher most-frequent-word rule (top-word fraction >
    ``_TOP_WORD_LABEL_MILLI``/1000) — the classifier distills the
    labeling heuristic into a linear model from CORRELATED features
    (the rule's own top-word fraction is deliberately excluded)."""
    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    flat, offs = _split_tokens(pc.utf8_lower(txt))
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    nonempty = wlen > 0
    n_tok = _segment_sums(nonempty.astype(np.int64), offs)
    chars = _segment_sums(wlen, offs)
    n = t.num_rows
    # distinct tokens + top-word run per doc: one factorize + lexsort
    codes, _ = pd.factorize(flat.to_pandas(), sort=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), offs[1:] - offs[:-1])
    c2, d2 = codes[nonempty], doc_idx[nonempty]
    order = np.lexsort((c2, d2))
    c2, d2 = c2[order], d2[order]
    first = np.ones(len(c2), dtype=bool)
    if len(c2) > 1:
        first[1:] = (c2[1:] != c2[:-1]) | (d2[1:] != d2[:-1])
    n_distinct = np.zeros(n, dtype=np.int64)
    np.add.at(n_distinct, d2[first], 1)
    starts = np.flatnonzero(first)
    run_len = np.diff(np.append(starts, len(c2)))
    top_word = np.zeros(n, dtype=np.int64)
    if len(starts):
        np.maximum.at(top_word, d2[starts], run_len)
    nz = np.maximum(n_tok, 1)
    return pa.table({
        "doc_id": pc.cast(t["doc_id"], pa.int64()),
        "f_ntok": pa.array(n_tok),
        "f_distinct_milli": pa.array(n_distinct * 1000 // nz),
        "f_wlen_centi": pa.array(chars * 100 // nz),
        "label": pa.array(
            ((top_word * 1000 // nz) > _TOP_WORD_LABEL_MILLI)
            .astype(np.int64)),
    })


_FEATS = ["f_ntok", "f_distinct_milli", "f_wlen_centi"]
_FEAT_SCALE = np.array([100.0, 1000.0, 100.0])


def _xy(t: pa.Table):
    X = np.column_stack(
        [np.ones(t.num_rows)]
        + [t[c].to_numpy(zero_copy_only=False).astype(np.float64) / s
           for c, s in zip(_FEATS, _FEAT_SCALE)])
    y = t["label"].to_numpy(zero_copy_only=False).astype(np.float64)
    return X, y


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def train_reference(feats: pa.Table,
                    iters: int = _ITERS, lr: float = _LR) -> np.ndarray:
    """Single-process reference trainer (the pytest oracle): identical
    math to the distributed loop on one in-memory matrix."""
    X, y = _xy(feats)
    w = np.zeros(X.shape[1])
    n = max(len(y), 1)
    for _ in range(iters):
        g = X.T @ (_sigmoid(X @ w) - y)
        w = w - lr * g / n
    return w


def q_train_quality_classifier(sf_dir: str):
    """Distributed logistic-regression training + scoring (rows-only).

    Returns the per-doc scored table (doc_id, label, score_micro, pred)
    plus the learned weights replicated onto each row's `w_json` —
    callers slice row 0 for the model, the table for the filter
    decisions."""
    import json

    import ray

    from engine.pipeline import collect_tables

    feats = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(_feature_batch, batch_format="pyarrow",
                     batch_size=None) \
        .materialize()                      # thin 48 B/doc table, cached
    n_total = feats.count()
    dim = 1 + len(_FEATS)
    w = np.zeros(dim)
    if n_total == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "label": pa.array([], type=pa.int64()),
                         "score_micro": pa.array([], type=pa.int64()),
                         "pred": pa.array([], type=pa.int64()),
                         "w_json": pa.array([], type=pa.string())})

    for _ in range(_ITERS):
        w_ref = ray.put(w)

        def grad_partial(t: pa.Table, _w=w_ref) -> pa.Table:
            wv = ray.get(_w) if isinstance(_w, ray.ObjectRef) else _w
            X, y = _xy(t)
            g = X.T @ (_sigmoid(X @ wv) - y)
            key = int(pc.min(t["doc_id"]).as_py()) if t.num_rows else -1
            return pa.table({"key": pa.array([key], type=pa.int64()),
                             **{f"g{i}": pa.array([g[i]])
                                for i in range(len(g))}})

        parts = [b for b in collect_tables(
            feats.map_batches(grad_partial, batch_format="pyarrow",
                              batch_size=None)) if b.num_rows]
        df = pa.concat_tables(parts).to_pandas().sort_values("key")
        g = df[[f"g{i}" for i in range(dim)]].to_numpy().sum(axis=0)
        w = w - _LR * g / n_total

    w_json = json.dumps([float(x) for x in w])
    w_ref = ray.put(w)

    def score(t: pa.Table, _w=w_ref) -> pa.Table:
        wv = ray.get(_w) if isinstance(_w, ray.ObjectRef) else _w
        X, y = _xy(t)
        p = _sigmoid(X @ wv)
        return pa.table({
            "doc_id": t["doc_id"],
            "label": t["label"],
            "score_micro": pa.array(
                np.floor(p * 1e6 + 0.5).astype(np.int64)),
            "pred": pa.array((p >= 0.5).astype(np.int64)),
            "w_json": pa.array([w_json] * t.num_rows, type=pa.string()),
        })

    return feats.map_batches(score, batch_format="pyarrow",
                             batch_size=None)
