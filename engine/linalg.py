"""Distributed linear algebra over the embedding column.

The reference has no vector math at all (its payloads are scalar fields
decoded per packet — hex_decoder_module/decoder.py); this module adds the
embedding-matrix operations a training-data pipeline runs before
clustering / ANN / dedup, built exactness-first:

* ``q_embedding_gram`` — the Gram matrix X^T X over integer-QUANTIZED
  embeddings (micros: q = floor(v * 2^20 + 0.5), the repo's
  integer-exactness anchor recipe), computed as per-BLOCK int64 matmul
  partials split into hi/lo 32-bit halves so the distributed fold can
  never overflow, then ONE (i, j)-keyed hash exchange.  Rows crossing
  the exchange: 2080 per block — the embedding payload itself never
  shuffles.  DuckDB-gated value-exact (the oracle is the same quantize +
  multiply in SQL).
* ``q_random_projection`` — Johnson-Lindenstrauss sign-matrix projection
  (Achlioptas 2003, database-friendly variant): the 64 x K ±1 matrix
  derives from md5(i_k) so BOTH engines rebuild it bit-identically;
  the projection is then integer matmul on the same quantized micros —
  gate-exact, and a pure map (no shuffle, matrix rides the task
  closure at ~1 KB).
* ``q_pca_project`` — distributed PCA: ONE pass of per-block
  (count, sum-vector, Gram) integer partials (the gram machinery
  above), a driver-side 64 x 64 eigendecomposition (cost independent of
  corpus size), deterministic sign fixing, then a broadcast-project
  map.  Not SQL-expressible (eigenvectors); pinned against a
  single-process numpy PCA in tests instead.

Scale notes: every stage's exchange rows are O(d^2 x blocks) with d=64
— independent of row count; the driver holds O(d^2) scalars.  At 100 TB
the only growing term is the per-block partial stream, which the hash
exchange folds without materializing.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_QS = 1 << 20          # quantization scale (micros, binary)
_DIM = 64              # embedding width of the fixture corpus
_RP_K = 16             # random-projection output dims

#: driver-state introspection (the simsearch LAST_* precedent): every
#: model/fold below records how many partial rows it ingested and the
#: driver-resident element count, so tests can assert the documented
#: O(d^2) / O(labels) bounds instead of trusting the docstrings.
LAST_LINALG: dict = {}


def _emb_ds(sf_dir: str):
    from engine.io import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])


def _emb_nrows(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows


def _mat64(t: pa.Table) -> np.ndarray:
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(t.num_rows, -1)


def _quant(mat: np.ndarray) -> np.ndarray:
    """floor(v * 2^20 + 0.5) — round-half-up micros, the exact expression
    the SQL oracles repeat (float32 -> float64 widening is lossless, so
    both engines see identical doubles)."""
    return np.floor(mat * float(_QS) + 0.5).astype(np.int64)


_GRAM_IU = np.triu_indices(_DIM)


def gram_partial_block(t: pa.Table) -> pa.Table:
    """Per-block Gram partial: int64 matmul of the quantized block
    (|q| <= 2^20 so a 2^21-row block stays under 2^63), upper triangle
    split into hi/lo halves for the overflow-free distributed fold."""
    if t.num_rows == 0:
        return pa.schema([("i", pa.int64()), ("j", pa.int64()),
                          ("hi", pa.int64()), ("lo", pa.int64())]) \
            .empty_table()
    q = _quant(_mat64(t))
    g = (q.T @ q)[_GRAM_IU]
    return pa.table({
        "i": pa.array(_GRAM_IU[0].astype(np.int64)),
        "j": pa.array(_GRAM_IU[1].astype(np.int64)),
        "hi": pa.array(g >> 32),                       # arithmetic shift
        "lo": pa.array(g & np.int64(0xFFFFFFFF))})     # in [0, 2^32)


def gram_fold_block(t: pa.Table) -> pa.Table:
    """(i, j)-partition kernel: sum the hi/lo halves per cell.  lo sums
    stay < 2^32 x blocks and hi sums < 2^20 x blocks — int64 is safe to
    ~2^31 blocks (a 32-EB corpus at 16 MB blocks)."""
    if t.num_rows == 0:
        return pa.schema([("i", pa.int64()), ("j", pa.int64()),
                          ("hi", pa.int64()), ("lo", pa.int64())]) \
            .empty_table()
    i = t["i"].to_numpy(zero_copy_only=False)
    j = t["j"].to_numpy(zero_copy_only=False)
    hi = t["hi"].to_numpy(zero_copy_only=False)
    lo = t["lo"].to_numpy(zero_copy_only=False)
    cell = i * _DIM + j
    order = np.argsort(cell, kind="stable")
    cell, hi, lo = cell[order], hi[order], lo[order]
    new_g = np.empty(len(cell), dtype=bool)
    new_g[0] = True
    new_g[1:] = cell[1:] != cell[:-1]
    starts = np.flatnonzero(new_g)
    return pa.table({
        "i": pa.array(cell[starts] // _DIM),
        "j": pa.array(cell[starts] % _DIM),
        "hi": pa.array(np.add.reduceat(hi, starts)),
        "lo": pa.array(np.add.reduceat(lo, starts))})


def q_embedding_gram(sf_dir: str):
    """Upper-triangle Gram matrix of the quantized embedding corpus:
    (i, j, gram) with gram = sum over rows of q_i * q_j, value-exact.

    Each (i, j) cell arrives at the driver as ONE (hi, lo) pair per
    partition; the recombination hi * 2^32 + lo runs in Python bigints,
    so no intermediate ever overflows regardless of corpus size (the
    FINAL value must fit int64 — asserted, and true until ~2^11 times
    the gate corpus; past that the caller rescales _QS)."""
    from engine.stages import hash_group_exchange

    ds = _emb_ds(sf_dir).map_batches(
        gram_partial_block, batch_format="pyarrow", batch_size=None)
    df = hash_group_exchange(ds, ["i", "j"], gram_fold_block,
                             rows_hint=len(_GRAM_IU[0]) * 8)
    acc: dict = {}
    for i, j, hi, lo in zip(df["i"], df["j"], df["hi"], df["lo"]):
        k = (int(i), int(j))
        prev = acc.get(k, (0, 0))
        acc[k] = (prev[0] + int(hi), prev[1] + int(lo))
    keys = sorted(acc)
    LAST_LINALG["gram"] = {"fold_rows": len(df), "driver_cells": len(acc)}
    grams = [acc[k][0] * (1 << 32) + acc[k][1] for k in keys]
    assert all(-(1 << 63) <= g < (1 << 63) for g in grams), \
        "gram outgrew int64: rescale _QS"
    return pa.table({
        "i": pa.array([k[0] for k in keys], type=pa.int64()),
        "j": pa.array([k[1] for k in keys], type=pa.int64()),
        "gram": pa.array(grams, type=pa.int64())})


SQL_EMBEDDING_GRAM = f"""
WITH gi AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), q AS (
  SELECT gi.vec_id, gi.i,
         CAST(floor(e.embedding[gi.i] * {float(_QS)} + 0.5) AS BIGINT) AS qi
  FROM gi JOIN embeddings e USING (vec_id)
)
SELECT (a.i - 1)::BIGINT AS i, (b.i - 1)::BIGINT AS j,
       sum(a.qi * b.qi)::BIGINT AS gram
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign projection (gate-exact)
# ---------------------------------------------------------------------------

def _sign_matrix(d: int = _DIM, k: int = _RP_K) -> np.ndarray:
    """The ±1 projection matrix, derived per cell from md5("i_k") — the
    one digest DuckDB shares, so the oracle rebuilds it exactly."""
    s = np.empty((d, k), dtype=np.int64)
    for i in range(d):
        for kk in range(k):
            h = int(hashlib.md5(f"{i}_{kk}".encode()).hexdigest()[:8], 16)
            s[i, kk] = 1 if h % 2 == 0 else -1
    return s


def q_random_projection(sf_dir: str):
    """JL sign-matrix projection of every embedding to {_RP_K} integer
    coordinates: proj[v, k] = sum_i q_i * s[i, k] on the quantized
    micros.  A pure map — the 64 x 16 matrix rides the task closure;
    output is long-form (vec_id, k, proj) so downstream groupbys can
    treat coordinates uniformly."""
    s = _sign_matrix()

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("vec_id", pa.int64()), ("k", pa.int64()),
                              ("proj", pa.int64())]).empty_table()
        q = _quant(_mat64(t))
        p = q @ s                              # |q| <= 2^20 * 64 per cell
        n, k = p.shape
        vid = pc.cast(t["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, k)),
            "k": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
            "proj": pa.array(p.reshape(-1))})

    return _emb_ds(sf_dir).map_batches(project, batch_format="pyarrow",
                                       batch_size=None)


SQL_RANDOM_PROJECTION = f"""
WITH gi AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), q AS (
  SELECT gi.vec_id, gi.i,
         CAST(floor(e.embedding[gi.i] * {float(_QS)} + 0.5) AS BIGINT) AS qi
  FROM gi JOIN embeddings e USING (vec_id)
), s AS (
  SELECT ii.i, kk.k,
         CASE WHEN ('0x' || substr(md5((ii.i - 1)::VARCHAR || '_'
                                        || kk.k::VARCHAR), 1, 8))::BIGINT
                   % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM (SELECT DISTINCT i FROM gi) ii
  CROSS JOIN (SELECT unnest(generate_series(0, {_RP_K - 1})) AS k) kk
)
SELECT q.vec_id::BIGINT AS vec_id, s.k::BIGINT AS k,
       sum(q.qi * s.sgn)::BIGINT AS proj
FROM q JOIN s USING (i)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# distributed PCA (rows-only: eigenvectors are not SQL)
# ---------------------------------------------------------------------------

_PCA_K = 8


def pca_moment_block(t: pa.Table) -> pa.Table:
    """One row per block: count, per-dim quantized sums, and the hi/lo
    Gram halves — everything the covariance needs, in one pass."""
    if t.num_rows == 0:
        return pa.schema([("n", pa.int64()),
                          ("s", pa.list_(pa.int64())),
                          ("hi", pa.list_(pa.int64())),
                          ("lo", pa.list_(pa.int64()))]).empty_table()
    q = _quant(_mat64(t))
    g = (q.T @ q)[_GRAM_IU]
    return pa.table({
        "n": pa.array([t.num_rows], type=pa.int64()),
        "s": pa.array([q.sum(axis=0)]),
        "hi": pa.array([g >> 32]),
        "lo": pa.array([g & np.int64(0xFFFFFFFF)])})


def _pca_model(sf_dir: str, k: int = _PCA_K):
    """(mean vector, d x k component matrix) from the distributed moment
    partials.  The driver fold is O(d^2) Python bigints per BLOCK row;
    at block counts where that matters the swap is q_embedding_gram's
    (i, j) exchange — same partials, keyed fold."""
    from engine.pipeline import collect_tables
    tabs = [b for b in collect_tables(
        _emb_ds(sf_dir).map_batches(pca_moment_block,
                                    batch_format="pyarrow",
                                    batch_size=None)) if b.num_columns]
    n_total = 0
    s_tot = [0] * _DIM
    g_tot = [0] * len(_GRAM_IU[0])
    for t in tabs:
        for r in range(t.num_rows):
            n_total += int(t["n"][r].as_py())
            for d, v in enumerate(t["s"][r].as_py()):
                s_tot[d] += int(v)
            hi, lo = t["hi"][r].as_py(), t["lo"][r].as_py()
            for c in range(len(g_tot)):
                g_tot[c] += int(hi[c]) * (1 << 32) + int(lo[c])
    LAST_LINALG["pca"] = {
        "partial_rows": sum(t.num_rows for t in tabs),
        "driver_elems": 1 + _DIM + len(g_tot)}
    assert n_total > 1, "PCA needs >= 2 rows"
    g = np.zeros((_DIM, _DIM), dtype=np.float64)
    g[_GRAM_IU] = np.array(g_tot, dtype=np.float64)
    g = g + np.triu(g, 1).T                    # mirror the upper triangle
    s = np.array(s_tot, dtype=np.float64)
    cov = (g - np.outer(s, s) / n_total) / (n_total - 1) / (_QS * _QS)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comp = v[:, order]                         # d x k, eigenvalue desc
    # deterministic sign: the largest-|.| component of each vector > 0
    amax = np.abs(comp).argmax(axis=0)
    flip = comp[amax, np.arange(comp.shape[1])] < 0
    comp[:, flip] *= -1.0
    mean = s / n_total / _QS
    return mean, comp, w[order]


def q_pca_project(sf_dir: str, k: int = _PCA_K):
    """Project every embedding onto the corpus's top-{_PCA_K} principal
    components (centered).  Coordinates are rounded to 9 decimals so the
    output is stable across block orders (the model itself is exact —
    integer moments — and the projection is one broadcast map)."""
    import ray
    mean, comp, _ = _pca_model(sf_dir, k)
    model_ref = ray.put((mean, comp))

    def project(t: pa.Table) -> pa.Table:
        cols = {"vec_id": pa.array([], type=pa.int64())}
        for c in range(k):
            cols[f"pc{c}"] = pa.array([], type=pa.float64())
        if t.num_rows == 0:
            return pa.table(cols)
        mu, w = ray.get(model_ref)
        coords = np.round((_mat64(t) - mu) @ w, 9)
        out = {"vec_id": pc.cast(t["vec_id"], pa.int64())}
        for c in range(k):
            out[f"pc{c}"] = pa.array(coords[:, c])
        return pa.table(out)

    return _emb_ds(sf_dir).map_batches(project, batch_format="pyarrow",
                                       batch_size=None)


# ---------------------------------------------------------------------------
# closed-form ridge regression (rows-only: matrix solve is not SQL)
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1.0


def ridge_moment_block(t: pa.Table) -> pa.Table:
    """One row per block: the normal-equation partials — count, X sums,
    X^T X (hi/lo), X^T y and y sums — everything the closed-form solve
    needs, one pass, int64-exact on quantized micros."""
    schema = pa.schema([("n", pa.int64()),
                        ("s", pa.list_(pa.int64())),
                        ("hi", pa.list_(pa.int64())),
                        ("lo", pa.list_(pa.int64())),
                        ("xy", pa.list_(pa.int64())),
                        ("ysum", pa.int64())])
    if t.num_rows == 0:
        return schema.empty_table()
    q = _quant(_mat64(t))
    y = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
    g = (q.T @ q)[_GRAM_IU]
    xy = q.T @ y                             # |q| <= 2^20, |y| small
    return pa.table({
        "n": pa.array([t.num_rows], type=pa.int64()),
        "s": pa.array([q.sum(axis=0)]),
        "hi": pa.array([g >> 32]),
        "lo": pa.array([g & np.int64(0xFFFFFFFF)]),
        "xy": pa.array([xy]),
        "ysum": pa.array([int(y.sum())], type=pa.int64())})


def _ridge_model(sf_dir: str, lam: float = _RIDGE_LAMBDA):
    """(intercept, weight vector) solving (X_c^T X_c + lam I) w = X_c^T
    y_c on CENTERED data — the distributed normal equations: the only
    corpus-size term is one moment row per block."""
    from engine.io import read_parquet_clean
    from engine.pipeline import collect_tables
    ds = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding", "label"])
    tabs = [b for b in collect_tables(
        ds.map_batches(ridge_moment_block, batch_format="pyarrow",
                       batch_size=None)) if b.num_columns]
    n = 0
    s = [0] * _DIM
    g = [0] * len(_GRAM_IU[0])
    xy = [0] * _DIM
    ysum = 0
    for t in tabs:
        for r in range(t.num_rows):
            n += int(t["n"][r].as_py())
            ysum += int(t["ysum"][r].as_py())
            for d, v in enumerate(t["s"][r].as_py()):
                s[d] += int(v)
            for d, v in enumerate(t["xy"][r].as_py()):
                xy[d] += int(v)
            hi, lo = t["hi"][r].as_py(), t["lo"][r].as_py()
            for c in range(len(g)):
                g[c] += int(hi[c]) * (1 << 32) + int(lo[c])
    LAST_LINALG["ridge"] = {
        "partial_rows": sum(t.num_rows for t in tabs),
        "driver_elems": 2 + 2 * _DIM + len(g)}
    assert n > 0, "ridge needs rows"
    G = np.zeros((_DIM, _DIM), dtype=np.float64)
    G[_GRAM_IU] = np.array(g, dtype=np.float64)
    G = G + np.triu(G, 1).T
    sv = np.array(s, dtype=np.float64)
    xyv = np.array(xy, dtype=np.float64)
    # center both sides (all on the quantized scale, then dequantize)
    Gc = (G - np.outer(sv, sv) / n) / (_QS * _QS)
    xyc = (xyv - sv * (ysum / n)) / _QS
    w = np.linalg.solve(Gc + lam * np.eye(_DIM), xyc)
    mean_x = sv / n / _QS
    intercept = ysum / n - float(mean_x @ w)
    return intercept, w


def q_ridge_probe(sf_dir: str):
    """Closed-form ridge 'linear probe' of the label column from the
    embeddings (the standard representation-quality diagnostic).  One
    distributed moment pass -> driver-side 64x64 solve -> broadcast
    scoring map; outputs per-vector prediction (6 decimals) plus the
    residual."""
    import ray
    intercept, w = _ridge_model(sf_dir)
    model_ref = ray.put((intercept, w))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("vec_id", pa.int64()),
                              ("pred", pa.float64()),
                              ("resid", pa.float64())]).empty_table()
        b, wv = ray.get(model_ref)
        pred = np.round(_mat64(t) @ wv + b, 6)
        y = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"vec_id": pc.cast(t["vec_id"], pa.int64()),
                         "pred": pa.array(pred),
                         "resid": pa.array(np.round(y - pred, 6))})

    from engine.io import read_parquet_clean
    return read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"]) \
        .map_batches(score, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# label-centroid cosine matrix (gated)
# ---------------------------------------------------------------------------

def centroid_sum_block(t: pa.Table) -> pa.Table:
    """Per-block partial: one row per label with its quantized SUM vector
    and count (cosine is scale-invariant, so sums stand in for means and
    everything stays integer)."""
    if t.num_rows == 0:
        return pa.schema([("label", pa.int64()),
                          ("s", pa.list_(pa.int64())),
                          ("n", pa.int64())]).empty_table()
    q = _quant(_mat64(t))
    lab = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(lab, return_inverse=True)
    sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
    np.add.at(sums, inv, q)
    return pa.table({
        "label": pa.array(uniq),
        "s": pa.array([row for row in sums]),
        "n": pa.array(np.bincount(inv).astype(np.int64))})


def q_label_centroid_cosine(sf_dir: str):
    """Pairwise cosine between label CENTROIDS of the embedding corpus,
    reported as the integer signed squared cosine in micro units
    (sign(dot) * 10^6 * dot^2 // (|a|^2 |b|^2)) so the value gates
    exactly — no square roots cross an engine boundary.  One pure-map
    partial pass (one row per label per block); the driver folds
    |labels| sum vectors in Python bigints and emits |labels|^2/2
    rows."""
    from engine.io import read_parquet_clean
    from engine.pipeline import collect_tables

    ds = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["embedding", "label"])
    tabs = [b for b in collect_tables(
        ds.map_batches(centroid_sum_block, batch_format="pyarrow",
                       batch_size=None)) if b.num_columns]
    acc: dict = {}
    cnt: dict = {}
    for t in tabs:
        for r in range(t.num_rows):
            lab = int(t["label"][r].as_py())
            vec = [int(v) for v in t["s"][r].as_py()]
            if lab in acc:
                acc[lab] = [a + b for a, b in zip(acc[lab], vec)]
                cnt[lab] += int(t["n"][r].as_py())
            else:
                acc[lab] = vec
                cnt[lab] = int(t["n"][r].as_py())
    labels = sorted(acc)
    LAST_LINALG["centroid"] = {
        "partial_rows": sum(t.num_rows for t in tabs),
        "driver_vectors": len(acc)}
    la, lb, cos2, nn = [], [], [], []
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            dot = sum(x * y for x, y in zip(acc[a], acc[b]))
            na = sum(x * x for x in acc[a])
            nb = sum(x * x for x in acc[b])
            sign = 1 if dot >= 0 else -1
            # parens matter: sign * floor(positive), NOT floor(signed)
            val = sign * ((1_000_000 * dot * dot) // (na * nb)) \
                if na and nb else 0
            la.append(a)
            lb.append(b)
            cos2.append(int(val))
    return pa.table({
        "label_a": pa.array(la, type=pa.int64()),
        "label_b": pa.array(lb, type=pa.int64()),
        "cos2_signed_micro": pa.array(cos2, type=pa.int64())})


SQL_LABEL_CENTROID_COSINE = f"""
WITH gi AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), q AS (
  SELECT e.label::BIGINT AS label, gi.i,
         CAST(floor(e.embedding[gi.i] * {float(_QS)} + 0.5) AS BIGINT)
           AS qi
  FROM gi JOIN embeddings e USING (vec_id)
), s AS (
  SELECT label, i, sum(qi)::BIGINT AS sv FROM q GROUP BY 1, 2
), d AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(a.sv::HUGEINT * b.sv::HUGEINT) AS dot
  FROM s a JOIN s b ON a.i = b.i AND a.label < b.label
  GROUP BY 1, 2
), n AS (
  SELECT label, sum(sv::HUGEINT * sv::HUGEINT) AS nn FROM s GROUP BY 1
)
SELECT label_a, label_b,
       (CASE WHEN dot >= 0 THEN 1 ELSE -1 END
        * ((1000000 * dot * dot) // (na.nn * nb.nn)))::BIGINT
         AS cos2_signed_micro
FROM d
JOIN n na ON na.label = label_a
JOIN n nb ON nb.label = label_b
"""
