"""Distributed linear algebra: gram/projection exactness and PCA pinning."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _full_matrix(sf_dir=SF_DIR) -> np.ndarray:
    t = pq.read_table(sf_dir + "/embeddings.parquet")
    return t["embedding"].combine_chunks().values \
        .to_numpy(zero_copy_only=False).astype(np.float64) \
        .reshape(t.num_rows, -1)


def test_gram_matches_numpy(ray_session):
    """The distributed hi/lo fold reproduces the single-process int64
    Gram bit for bit (independent of the DuckDB gate)."""
    from engine.linalg import _GRAM_IU, _quant, q_embedding_gram
    got = q_embedding_gram(SF_DIR).to_pandas().sort_values(
        ["i", "j"], ignore_index=True)
    q = _quant(_full_matrix())
    want = (q.T @ q)[_GRAM_IU]
    assert (got["gram"].to_numpy() == want).all()
    assert (got["i"].to_numpy() == _GRAM_IU[0]).all()


def test_hi_lo_split_roundtrips_negatives():
    """hi * 2^32 + lo == g for negative int64 values too (arithmetic
    shift + unsigned low half)."""
    g = np.array([-1, -(1 << 52), (1 << 52) - 7, 0, -12345], dtype=np.int64)
    hi, lo = g >> 32, g & np.int64(0xFFFFFFFF)
    back = [int(h) * (1 << 32) + int(x) for h, x in zip(hi, lo)]
    assert back == g.tolist()


def test_random_projection_matches_numpy(ray_session):
    from engine.linalg import (_RP_K, _quant, _sign_matrix,
                               q_random_projection)
    got = q_random_projection(SF_DIR).to_pandas() \
        .sort_values(["vec_id", "k"], ignore_index=True)
    q = _quant(_full_matrix())
    want = q @ _sign_matrix()
    assert (got["proj"].to_numpy().reshape(-1, _RP_K) == want).all()
    # the sign matrix is deterministic across rebuilds
    assert (_sign_matrix() == _sign_matrix()).all()


def test_pca_matches_single_process(ray_session):
    """Distributed moment partials -> identical model and coordinates as
    a single-process numpy PCA over the same quantized matrix."""
    from engine.linalg import _PCA_K, _QS, _pca_model, _quant, q_pca_project
    m = _full_matrix()
    q = _quant(m).astype(np.float64) / _QS
    cov_ref = np.cov(q, rowvar=False)
    mean_ref = q.mean(axis=0)
    w_ref, v_ref = np.linalg.eigh(cov_ref)
    order = np.argsort(w_ref)[::-1][:_PCA_K]
    comp_ref = v_ref[:, order]
    amax = np.abs(comp_ref).argmax(axis=0)
    flip = comp_ref[amax, np.arange(_PCA_K)] < 0
    comp_ref[:, flip] *= -1.0

    mean, comp, eig = _pca_model(SF_DIR)
    assert np.allclose(mean, mean_ref, atol=1e-12)
    assert np.allclose(comp, comp_ref, atol=1e-9)
    assert (np.diff(eig) <= 1e-12).all()      # eigenvalue-descending

    got = q_pca_project(SF_DIR).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    coords = got[[f"pc{c}" for c in range(_PCA_K)]].to_numpy()
    want = np.round((m - mean_ref) @ comp_ref, 9)
    assert np.allclose(coords, want, atol=1e-8)


def test_pca_recovers_planted_subspace(ray_session, tmp_path):
    """Vectors lying in a 2-D subspace (+ tiny noise): the top-2 PCs
    carry ~all variance and the remaining coordinates are ~0."""
    rng = np.random.RandomState(7)
    basis = np.linalg.qr(rng.randn(64, 2))[0]           # orthonormal 64x2
    coords = rng.randn(300, 2) * np.array([5.0, 2.0])
    x = coords @ basis.T + rng.randn(300, 64) * 1e-4
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array([r.astype(np.float32) for r in x],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(300, dtype=np.int32)),
    }), str(d / "embeddings.parquet"))

    from engine.linalg import _pca_model, q_pca_project
    _, _, eig = _pca_model(str(d))
    assert eig[0] > eig[1] > 1.0 and eig[2] < 1e-4      # 2 live directions
    t = q_pca_project(str(d)).to_pandas()
    tail = t[[f"pc{c}" for c in range(2, 8)]].to_numpy()
    lead = t[["pc0", "pc1"]].to_numpy()
    assert np.abs(tail).max() < 0.05
    assert np.var(lead[:, 0]) > np.var(lead[:, 1]) > 1.0


def test_ridge_probe_matches_single_process(ray_session):
    """Distributed normal-equation partials reproduce the single-process
    numpy ridge solve; predictions match and residuals are consistent."""
    import pyarrow.parquet as pq2

    from engine.linalg import _QS, _RIDGE_LAMBDA, _quant, _ridge_model, \
        q_ridge_probe
    m = _full_matrix()
    t = pq2.read_table(SF_DIR + "/embeddings.parquet", columns=["label"])
    y = t["label"].to_numpy(zero_copy_only=False).astype(np.float64)
    q = _quant(m).astype(np.float64) / _QS
    xc = q - q.mean(axis=0)
    yc = y - y.mean()
    w_ref = np.linalg.solve(xc.T @ xc + _RIDGE_LAMBDA * np.eye(64),
                            xc.T @ yc)
    b_ref = y.mean() - float(q.mean(axis=0) @ w_ref)

    b, w = _ridge_model(SF_DIR)
    assert np.allclose(w, w_ref, atol=1e-9)
    assert abs(b - b_ref) < 1e-9

    got = q_ridge_probe(SF_DIR).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    pred_ref = np.round(m @ w_ref + b_ref, 6)
    assert np.allclose(got["pred"].to_numpy(), pred_ref, atol=1e-5)
    # probe actually explains something: residual var < label var
    assert got["resid"].var() < y.var()


def test_driver_state_bounds_flooded_corpus(ray_session, tmp_path):
    """Round-5 #6: the LAST_LINALG / LAST_KMEANS counters prove the
    docstrings' driver-state claims on a 40x-flooded corpus — partial
    rows scale with BLOCK count only, driver elements with d^2 / K only,
    never with row count."""
    import ray

    rng = np.random.RandomState(3)
    n = 20_000                                  # 40x the fixture corpus
    x = rng.randn(n, 64).astype(np.float32)
    d = tmp_path / "flood"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 5).astype(np.int32)),
    }), str(d / "embeddings.parquet"))

    from engine import cluster, linalg
    cells = 64 * 65 // 2

    linalg.q_embedding_gram(str(d))
    g = linalg.LAST_LINALG["gram"]
    assert g["driver_cells"] == cells            # exactly d(d+1)/2
    assert g["fold_rows"] <= 4 * cells           # one row/cell/partition

    linalg._pca_model(str(d))
    p = linalg.LAST_LINALG["pca"]
    assert p["driver_elems"] == 1 + 64 + cells
    assert p["partial_rows"] <= 64               # one row per BLOCK

    linalg._ridge_model(str(d))
    r = linalg.LAST_LINALG["ridge"]
    assert r["driver_elems"] == 2 + 2 * 64 + cells
    assert r["partial_rows"] <= 64

    linalg.q_label_centroid_cosine(str(d))
    c = linalg.LAST_LINALG["centroid"]
    assert c["driver_vectors"] == 5              # |labels|, not rows
    assert c["partial_rows"] <= 5 * 64           # labels x blocks

    cluster.q_kmeans_train(str(d))
    km = cluster.LAST_KMEANS
    assert km["driver_elems"] == cluster._K * (64 + 2)
    assert len(km["partial_rows"]) == cluster._ITERS
    for rows in km["partial_rows"]:
        assert rows <= cluster._K * km["n_blocks"]
