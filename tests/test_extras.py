"""Training-data operators: rows-only queries run + semantic spot checks."""

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _tbl(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if hasattr(res, "to_arrow_refs"):  # ray Dataset
        import pandas as pd
        return pa.Table.from_pandas(res.to_pandas())
    return pa.Table.from_pandas(res)


def test_rows_only_queries_run(ray_session):
    from engine.extras import ROWS_ONLY_QUERIES
    for name, fn in ROWS_ONLY_QUERIES.items():
        t = _tbl(fn(SF_DIR))
        assert t.num_rows >= 0, name
        assert t.num_columns >= 1, name


def test_minhash_hash_exchange_equals_mapgroups(ray_session, tmp_path):
    """The vectorized hash-exchange bucket stage must emit the identical
    pair table as the per-group map_groups oracle — including on a corpus
    with a capped (>_BUCKET_CAP distinct near-dup contents) bucket."""
    import pyarrow.parquet as pq
    from engine.dedup import q_dedup_minhash_lsh, _BUCKET_CAP
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base = src.slice(0, 1).to_pydict()
    words = base["text"][0].split()
    rows = {c: [] for c in base}
    for i in range(_BUCKET_CAP + 20):     # distinct near-dup contents
        for c in base:
            rows[c].append(base[c][0])
        rows["doc_id"][-1] = 7_000_000 + i
        rows["text"][-1] = " ".join(words + [f"tail{i}"])
    aug = pa.concat_tables([src, pa.table(rows, schema=src.schema)])
    d = tmp_path / "paths"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    a = q_dedup_minhash_lsh(str(d), method="hash").to_pandas()
    b = q_dedup_minhash_lsh(str(d), method="mapgroups").to_pandas()
    assert a.equals(b)
    assert a["capped"].any()              # the flood really exercised the cap
    from engine.dedup import q_dedup_simhash
    sa = q_dedup_simhash(str(d), method="hash").to_pandas()
    sb = q_dedup_simhash(str(d), method="mapgroups").to_pandas()
    assert sa.equals(sb)


def test_minhash_finds_exact_duplicates(ray_session, tmp_path):
    """A doc duplicated verbatim must surface as a jaccard=1000 pair."""
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    dup = src.slice(0, 1).to_pydict()
    dup["doc_id"] = [999999]
    import pyarrow as pa
    aug = pa.concat_tables([src, pa.table(dup, schema=src.schema)])
    d = tmp_path / "aug"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_dedup_minhash_lsh
    t = q_dedup_minhash_lsh(str(d))
    pairs = set(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist(),
                    t["jaccard_milli"].to_pylist()))
    orig = src["doc_id"][0].as_py()
    assert (orig, 999999, 1000) in pairs


def test_simhash_flags_identical_docs(ray_session, tmp_path):
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    dup = src.slice(3, 1).to_pydict()
    dup["doc_id"] = [888888]
    aug = pa.concat_tables([src, pa.table(dup, schema=src.schema)])
    d = tmp_path / "aug2"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_dedup_simhash
    t = q_dedup_simhash(str(d))
    pairs = set(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
    orig = src["doc_id"][3].as_py()
    assert (orig, 888888) in pairs


def test_lsh_ann_recall_vs_bruteforce(ray_session):
    """LSH ANN over the bucket-PARTITIONED index: decent multi-probe
    recall while each query physically reads <25% of the table's rows
    (the partition-key design, measured from the probed files)."""
    from engine import simsearch
    from engine.simsearch import q_simsearch_lsh, q_simsearch_topk
    exact = _tbl(q_simsearch_topk(SF_DIR))
    approx = q_simsearch_lsh(SF_DIR)
    ex = {}
    for q, n in zip(exact["query_id"].to_pylist(), exact["neighbor_id"].to_pylist()):
        ex.setdefault(q, set()).add(n)
    ap = {}
    for q, n in zip(approx["query_id"].to_pylist(), approx["neighbor_id"].to_pylist()):
        ap.setdefault(q, set()).add(n)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert np.mean(recalls) >= 0.3, recalls  # radius-2 multi-probe; uniform-random vectors
    # the scale claim: each query touched only its probe-ring partitions
    scan = simsearch.LAST_SCAN
    assert scan["rows_total"] > 0 and scan["per_query_rows"]
    for qid, rows_read in scan["per_query_rows"].items():
        frac = rows_read / scan["rows_total"]
        assert frac < 0.25, (qid, frac)


def test_multimodal_decode_plumbing(ray_session):
    from engine.multimodal import q_multimodal_decode, RealImageDecoder
    t = _tbl(q_multimodal_decode(SF_DIR))
    assert t.num_rows == 500
    assert all(t["decode_ok"].to_pylist())
    w = t["width"].to_pylist()
    assert all(16 <= x < 80 for x in w)
    # the 8 histogram bins partition the body bytes exactly
    rows = t.to_pylist()
    for r in rows[:50]:
        assert sum(r[f"h{b}"] for b in range(8)) == \
            r["width"] * r["height"] * r["channels"]
    with pytest.raises(NotImplementedError):
        RealImageDecoder()


def test_lang_id_and_quality_deterministic(ray_session):
    from engine.text import q_lang_id, q_quality_score
    a = _tbl(q_lang_id(SF_DIR)).sort_by("doc_id")
    b = _tbl(q_lang_id(SF_DIR)).sort_by("doc_id")
    assert a.equals(b)
    qs = _tbl(q_quality_score(SF_DIR))
    scores = qs["quality_milli"].to_pylist()
    assert all(0 <= s <= 1000 for s in scores)


def test_dedup_clusters_transitive(ray_session, tmp_path):
    """A~B and B~C verbatim dup chain collapses to one cluster with the
    min doc_id as survivor."""
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base = src.slice(0, 1).to_pydict()
    chain = []
    for new_id in (777001, 777002):
        d = dict(base)
        d["doc_id"] = [new_id]
        chain.append(pa.table(d, schema=src.schema))
    aug = pa.concat_tables([src] + chain)
    d = tmp_path / "augc"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_dedup_clusters
    t = q_dedup_clusters(str(d))
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    orig = src["doc_id"][0].as_py()
    assert rows[orig]["survivor"] is True
    assert rows[777001]["cluster_id"] == rows[orig]["cluster_id"]
    assert rows[777002]["cluster_id"] == rows[orig]["cluster_id"]
    assert rows[777001]["survivor"] is False


def test_minhash_hot_bucket_bounded(ray_session, tmp_path):
    """10k identical docs (one hot LSH bucket) must finish in bounded time
    with O(k) star pairs, not O(k^2) all-pairs — the exact-collapse +
    bucket-cap scale guarantee."""
    import time
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    boiler = src.slice(0, 1).to_pydict()
    k = 10_000
    flood = {c: boiler[c] * k for c in boiler}
    flood["doc_id"] = list(range(5_000_000, 5_000_000 + k))
    aug = pa.concat_tables([src, pa.table(flood, schema=src.schema)])
    d = tmp_path / "hot"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_dedup_minhash_lsh
    t0 = time.monotonic()
    t = q_dedup_minhash_lsh(str(d))
    wall = time.monotonic() - t0
    orig = src["doc_id"][0].as_py()
    # star: every flood doc pairs with the group's min id (the original)
    flood_pairs = [(a, b) for a, b in zip(t["doc_a"].to_pylist(),
                                          t["doc_b"].to_pylist())
                   if b >= 5_000_000 or a >= 5_000_000]
    assert len(flood_pairs) == k  # k star edges (orig + k dups), not ~k^2/2
    assert all(a == orig for a, _ in flood_pairs)
    jm = dict(zip(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()),
                  t["jaccard_milli"].to_pylist()))
    assert jm[(orig, 5_000_000)] == 1000
    assert wall < 120, f"hot bucket took {wall:.1f}s"


def test_minhash_finds_planted_near_duplicate(ray_session, tmp_path):
    """A doc sharing most of its words with an original (true Jaccard ~0.8)
    must surface via the signature estimate."""
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    row = src.slice(0, 1).to_pydict()
    words = row["text"][0].split()
    assert len(words) >= 20
    near = dict(row)
    near["doc_id"] = [444444]
    near["text"] = [" ".join(words[:-2] + ["zzz", "qqq"])]  # perturb the tail
    aug = pa.concat_tables([src, pa.table(near, schema=src.schema)])
    d = tmp_path / "near"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_dedup_minhash_lsh, _word_shingles
    sa = _word_shingles(row["text"][0])
    sb = _word_shingles(near["text"][0])
    true_j = len(sa & sb) / len(sa | sb)
    assert true_j >= 0.6  # the plant really is a near dup
    t = q_dedup_minhash_lsh(str(d))
    pairs = {(a, b): j for a, b, j in zip(
        t["doc_a"].to_pylist(), t["doc_b"].to_pylist(),
        t["jaccard_milli"].to_pylist())}
    orig = src["doc_id"][0].as_py()
    assert (orig, 444444) in pairs
    assert abs(pairs[(orig, 444444)] / 1000 - true_j) < 0.25  # 64-perm noise


def test_verify_pairs_exact_refines(ray_session, tmp_path):
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    dup = src.slice(0, 1).to_pydict()
    dup["doc_id"] = [999999]
    aug = pa.concat_tables([src, pa.table(dup, schema=src.schema)])
    d = tmp_path / "vx"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_dedup_minhash_lsh, verify_pairs_exact
    pairs = q_dedup_minhash_lsh(str(d))
    refined = verify_pairs_exact(str(d), pairs)
    ex = dict(zip(zip(refined["doc_a"].to_pylist(), refined["doc_b"].to_pylist()),
                  refined["jaccard_exact_milli"].to_pylist()))
    orig = src["doc_id"][0].as_py()
    assert ex[(orig, 999999)] == 1000


def test_ngram_jaccard_skewed_group_bounded(ray_session, tmp_path):
    """One dominant (source, lang) group (2k same-length docs) must stay
    bounded via length-banding + the bucket cap (star fallback), and still
    find a planted near-identical pair."""
    import time
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base = src.slice(0, 1).to_pydict()
    words = base["text"][0].split()
    k = 2000
    flood = {c: base[c] * k for c in base}
    flood["doc_id"] = list(range(6_000_000, 6_000_000 + k))
    # same source/lang/length but mostly-distinct content
    flood["text"] = [" ".join(f"w{i}x{j}" for j in range(len(words)))
                     for i in range(k)]
    flood["text"][1] = flood["text"][0]  # one planted identical pair
    aug = pa.concat_tables([src, pa.table(flood, schema=src.schema)])
    d = tmp_path / "skewg"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_ngram_jaccard_pairs
    t0 = time.monotonic()
    t = q_ngram_jaccard_pairs(str(d))
    wall = time.monotonic() - t0
    pairs = set(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
    assert (6_000_000, 6_000_001) in pairs
    assert wall < 120, f"skewed group took {wall:.1f}s"


def test_window_state_actor_idempotent(ray_session):
    """A retried map task re-sends its partials with the same batch id:
    the state actor must apply exactly once (VERDICT at-least-once fix)."""
    import ray
    from engine.streaming import WindowStateActor
    a = WindowStateActor.remote()
    n1 = ray.get(a.add.remote(b"batch1", [1, 2], [0, 0], [3, 4], [10, 20]))
    n2 = ray.get(a.add.remote(b"batch1", [1, 2], [0, 0], [3, 4], [10, 20]))
    n3 = ray.get(a.add.remote(b"batch2", [1], [0], [1], [5]))
    s = ray.get(a.snapshot.remote())
    assert (n1, n2, n3) == (2, 0, 1)
    assert s["counts"][(1, 0)] == 3 + 1
    assert s["value_milli"][(1, 0)] == 10 + 5
    assert s["value_milli"][(2, 0)] == 20
    assert s["n_applied"] == 2


def test_ivf_ann_recall_and_scan(ray_session):
    """IVF ANN (cell-partitioned index, nprobe=4 of 16): useful recall of
    the exact top-5 while physically reading a bounded fraction of rows."""
    from engine import simsearch
    from engine.simsearch import q_simsearch_ivf, q_simsearch_topk
    exact = _tbl(q_simsearch_topk(SF_DIR))
    approx = q_simsearch_ivf(SF_DIR)
    ex, ap = {}, {}
    for q, n in zip(exact["query_id"].to_pylist(), exact["neighbor_id"].to_pylist()):
        ex.setdefault(q, set()).add(n)
    for q, n in zip(approx["query_id"].to_pylist(), approx["neighbor_id"].to_pylist()):
        ap.setdefault(q, set()).add(n)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert np.mean(recalls) >= 0.3, recalls
    scan = simsearch.LAST_SCAN_IVF
    for qid, rows_read in scan["per_query_rows"].items():
        assert rows_read / scan["rows_total"] < 0.6, (qid, rows_read)


def test_embedding_near_dup_paths_agree(ray_session, tmp_path):
    """The vectorized hash-exchange bucket stage finds the identical pair
    SET as the per-bucket map_groups oracle; scores may differ by the
    last micro (rowwise einsum vs per-bucket BLAS matmul — the same
    drift the result fold already tolerates between matvec/matmul)."""
    import pyarrow.parquet as pq
    from engine.simsearch import q_embedding_near_dup
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    rows = {c: [] for c in src.column_names}
    for i in range(40):                     # plant a clique of near-dups
        base = src.slice(i % 5, 1).to_pydict()
        v = np.asarray(base["embedding"][0], dtype=np.float64)
        for c in src.column_names:
            rows[c].append(base[c][0])
        rows["vec_id"][-1] = 9_000_000 + i
        rows["embedding"][-1] = (v * (1 + i * 1e-5)).astype(
            np.float32).tolist()
    aug = pa.concat_tables([src, pa.table(rows, schema=src.schema)])
    d = tmp_path / "embpaths"
    d.mkdir()
    pq.write_table(aug, str(d / "embeddings.parquet"))
    a = q_embedding_near_dup(str(d), method="hash").to_pandas()
    b = q_embedding_near_dup(str(d), method="mapgroups").to_pandas()
    assert len(a) == len(b) > 0
    ka = list(zip(a["vec_a"], a["vec_b"], a["capped"]))
    kb = list(zip(b["vec_a"], b["vec_b"], b["capped"]))
    assert ka == kb                        # identical pair set + flags
    assert (a["cos_micro"] - b["cos_micro"]).abs().max() <= 1


def test_embedding_near_dup_planted_pair(ray_session, tmp_path):
    """Two nearly-identical embedding vectors (cosine > 0.99) must surface
    as a near-dup pair through the hyperplane blocking + exact verify."""
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    base = src.slice(7, 1).to_pydict()
    v = np.asarray(base["embedding"][0], dtype=np.float64)
    near = dict(base)
    near["vec_id"] = [7_000_000]
    near["embedding"] = [(v * 1.0001 + 1e-5).astype(np.float32).tolist()]
    aug = pa.concat_tables([src, pa.table(near, schema=src.schema)])
    d = tmp_path / "embnear"
    d.mkdir()
    pq.write_table(aug, str(d / "embeddings.parquet"))
    from engine.simsearch import q_embedding_near_dup
    t = q_embedding_near_dup(str(d))
    pairs = {(a, b): c for a, b, c in zip(
        t["vec_a"].to_pylist(), t["vec_b"].to_pylist(),
        t["cos_micro"].to_pylist())}
    orig = src["vec_id"][7].as_py()
    assert (orig, 7_000_000) in pairs
    assert pairs[(orig, 7_000_000)] >= 990_000


def test_label_propagation_equals_union_find(ray_session, tmp_path):
    """The distributed min-label-propagation clustering must produce the
    identical (doc_id, cluster_id, survivor) table as driver union-find,
    including a planted transitive chain."""
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base = src.slice(0, 1).to_pydict()
    chain = []
    for new_id in (771001, 771002, 771003):
        d = dict(base)
        d["doc_id"] = [new_id]
        chain.append(pa.table(d, schema=src.schema))
    aug = pa.concat_tables([src] + chain)
    d = tmp_path / "lp"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_dedup_clusters, q_dedup_clusters_lp
    uf = q_dedup_clusters(str(d))
    lp = q_dedup_clusters_lp(str(d))
    assert uf.sort_by("doc_id").equals(lp.sort_by("doc_id"))
    rows = {r["doc_id"]: r for r in lp.to_pylist()}
    orig = src["doc_id"][0].as_py()
    assert rows[771003]["cluster_id"] == rows[orig]["cluster_id"]


def test_curate_corpus_composition(ray_session, tmp_path):
    """The composite curation pipeline equals the explicit composition of
    its parts (quality filter ∩ lang filter, then exact-dedup min), and
    the CLI writes the hash-sharded curated parquet + stats."""
    from engine.curate import q_curate_corpus, QUALITY_MIN_MILLI
    from engine.text import q_lang_id, q_quality_score
    from engine.dedup import q_dedup_exact
    curated = set(_tbl(q_curate_corpus(SF_DIR))["doc_id"].to_pylist())
    q = _tbl(q_quality_score(SF_DIR))
    lang = _tbl(q_lang_id(SF_DIR))
    good_q = {d for d, m in zip(q["doc_id"].to_pylist(),
                                q["quality_milli"].to_pylist())
              if m >= QUALITY_MIN_MILLI}
    good_l = {d for d, p in zip(lang["doc_id"].to_pylist(),
                                lang["pred_lang"].to_pylist())
              if p != "unknown"}
    passing = good_q & good_l
    assert curated <= passing           # every curated doc passed filters
    assert 0 < len(curated) <= len(passing)
    # survivors of exact dedup restricted to passing docs
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    by_text = {}
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        if d in passing:
            by_text.setdefault(txt, []).append(d)
    want = {min(v) for v in by_text.values()}
    assert curated == want

    # CLI end-to-end
    import glob as _glob
    import json as _json
    import subprocess, sys
    out = str(tmp_path / "curated")
    from engine.job import main
    assert main(["curate", "--docs", f"{SF_DIR}/documents.parquet",
                 "--out", out]) == 0
    import pyarrow.dataset as pads
    written = pads.dataset(out, partitioning="hive").to_table()
    assert set(pads.dataset(out, partitioning="hive")
               .to_table(columns=["doc_id"])["doc_id"].to_pylist()) == curated
    stats = _json.load(open(f"{out}/_curation_stats.json"))
    assert stats["curated_docs"] == len(curated)
    assert stats["input_docs"] == 500


def test_curate_neardup_matches_set_reference(ray_session):
    """The scale-safe q_curate_corpus_neardup (curated ids stay a Dataset;
    losers broadcast + vectorized is_in subtract) equals the driver-side
    set-subtraction reference it replaced (r3 `weak` #2)."""
    from engine.curate import q_curate_corpus, q_curate_corpus_neardup
    from engine.dedup import q_dedup_clusters
    got = q_curate_corpus_neardup(SF_DIR).to_pandas()["doc_id"].tolist()
    curated = set(_tbl(q_curate_corpus(SF_DIR))["doc_id"].to_pylist())
    clusters = q_dedup_clusters(SF_DIR)
    losers = {d for d, s in zip(clusters["doc_id"].to_pylist(),
                                clusters["survivor"].to_pylist()) if not s}
    assert got == sorted(curated - losers)
    assert got == sorted(set(got))      # unique + ascending (deterministic)


def test_curate_to_parquet_semijoin_equals_broadcast(ray_session, tmp_path,
                                                     monkeypatch):
    """curate_to_parquet's semi-join regime end-to-end: identical sharded
    output vs broadcast on the same corpus, and the ID_BROADCAST_MAX
    auto-switch engages when the threshold is crossed (r3 next-round #6)."""
    import pyarrow.dataset as pads
    from engine import curate
    docs = f"{SF_DIR}/documents.parquet"
    sb = curate.curate_to_parquet(docs, str(tmp_path / "b"),
                                  method="broadcast")
    ss = curate.curate_to_parquet(docs, str(tmp_path / "s"),
                                  method="semijoin")
    assert sb["curated_docs"] == ss["curated_docs"] > 0
    assert (sb["method"], ss["method"]) == ("broadcast", "semijoin")
    tb = pads.dataset(str(tmp_path / "b"), partitioning="hive") \
        .to_table().sort_by("doc_id")
    ts = pads.dataset(str(tmp_path / "s"), partitioning="hive") \
        .to_table().sort_by("doc_id").select(tb.column_names)
    assert tb.equals(ts)                # identical rows AND shard layout
    monkeypatch.setattr(curate, "ID_BROADCAST_MAX", 1)
    sa = curate.curate_to_parquet(docs, str(tmp_path / "a"))
    assert sa["method"] == "semijoin"
    assert sa["curated_docs"] == sb["curated_docs"]


def test_multimodal_resize_and_frames_plumbing(ray_session):
    """Resize halves dims with a valid re-emitted container; frame
    sampling keeps every 4th frame — both gate-checked vs the md5 header
    derivation, here spot-checked against the decoded originals."""
    from engine.multimodal import (
        FakeImageDecoder, q_multimodal_frames, q_multimodal_resize,
        attach_binary_column)
    orig = _tbl(q_multimodal_resize(SF_DIR))
    dec = _tbl(attach_binary_column(SF_DIR).map_batches(
        FakeImageDecoder, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1))
    dims = {d: (w, h, c) for d, w, h, c in zip(
        dec["doc_id"].to_pylist(), dec["width"].to_pylist(),
        dec["height"].to_pylist(), dec["channels"].to_pylist())}
    for r in orig.slice(0, 50).to_pylist():
        w, h, c = dims[r["doc_id"]]
        assert r["width"] == (w + 1) // 2 and r["height"] == (h + 1) // 2
        assert r["n_bytes"] == 9 + r["width"] * r["height"] * c
    fr = _tbl(q_multimodal_frames(SF_DIR))
    for r in fr.slice(0, 50).to_pylist():
        w, h, c = dims[r["doc_id"]]
        assert r["n_frames"] == h
        assert r["n_sampled"] == (h + 3) // 4
        assert r["sampled_bytes"] == r["n_sampled"] * w * c


def test_operators_handle_empty_corpus(ray_session, tmp_path):
    """Every text/dedup/curation operator returns a clean 0-row result on
    an empty documents table (offset/reduceat/groupby edge cases)."""
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ev = pq.read_table(f"{SF_DIR}/events.parquet")
    d = tmp_path / "empty"
    d.mkdir()
    pq.write_table(src.slice(0, 0), str(d / "documents.parquet"))
    pq.write_table(emb.slice(0, 0), str(d / "embeddings.parquet"))
    pq.write_table(ev.slice(0, 0), str(d / "events.parquet"))
    from engine import asof, classify, corpus, curate, decontam, dedup, \
        filters, simsearch, sketch, text
    for fn in (dedup.q_dedup_exact, dedup.q_dedup_minhash_lsh,
               dedup.q_dedup_simhash, dedup.q_ngram_jaccard_pairs,
               dedup.q_dedup_clusters, dedup.q_dedup_clusters_lp,
               dedup.q_dedup_verified_pairs,
               text.q_text_stats, text.q_quality_score, text.q_lang_id,
               text.q_fingerprint_rolling, text.q_fingerprint_rolling_fast,
               curate.q_curate_corpus,
               corpus.q_corpus_split, corpus.q_pack_sequences,
               corpus.q_top_terms_by_lang, corpus.q_events_hopping_window,
               corpus.q_shuffle_shards, corpus.q_source_cap,
               corpus.q_keyword_search,
               asof.q_events_asof_prior_purchase,
               asof.q_events_range_join_counts,
               simsearch.q_simsearch_topk, simsearch.q_simsearch_lsh,
               simsearch.q_simsearch_ivf, simsearch.q_embedding_near_dup,
               simsearch.q_embedding_similar_pairs_exact,
               simsearch.q_semantic_dedup, simsearch.q_knn_join,
               simsearch.q_knn_join_ivf,
               filters.q_repetition_filter, filters.q_line_dedup,
               filters.q_dup_ngram_stats, filters.q_dup_span_removal,
               filters.q_pii_redact, filters.q_unigram_commonness,
               sketch.q_token_quantiles, sketch.q_stratified_sample,
               decontam.q_decontaminate, decontam.q_source_mixture_sample,
               decontam.q_cross_corpus_dedup,
               classify.q_train_quality_classifier):
        res = fn(str(d))
        n = res.num_rows if isinstance(res, pa.Table) else res.count()
        assert n == 0, fn


def test_segment_sums_null_neighbor_exact():
    """ADVICE r2 (high): a zero-token doc at a segment boundary must not
    truncate the PRECEDING doc's stats (clamped-reduceat bug)."""
    from engine.text import quality_batch
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["one two three", None])})
    out = quality_batch(t)
    # mean word length of the valid doc: (3+3+5)/3 = 3.666667
    assert out["mean_wlen_micro"].to_pylist() == [3666667, 0]
    # and independent of its neighbours
    alone = quality_batch(t.slice(0, 1))
    assert out["quality_milli"][0].as_py() == alone["quality_milli"][0].as_py()


def test_simhash_sketch_unaffected_by_empty_neighbor():
    """Same clamped-reduceat pattern in the SimHash vote fold."""
    from engine.dedup import simhash_batch
    alone = simhash_batch(pa.array(["hello world foo"]))
    packed = simhash_batch(pa.array(["hello world foo", None, "x y z"]))
    tail = simhash_batch(pa.array(["x y z"]))
    assert packed[0] == alone[0]
    assert packed[2] == tail[0]


def test_ngram_banding_repetitive_doc(ray_session, tmp_path):
    """ADVICE r2 (medium): banding must use distinct shingle-SET size —
    a repetitive doc (many word positions, tiny shingle set) must still
    pair with a short doc at J>=0.3."""
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base = src.slice(0, 1).to_pydict()
    rep = {c: base[c] * 2 for c in base}
    rep["doc_id"] = [7_000_000, 7_000_001]
    # A: "a b c" x50 -> 148 position shingles but only 3 DISTINCT;
    # B: "a b c" -> 1 shingle; exact set Jaccard = 1/3 >= 0.3
    rep["text"] = [" ".join(["a", "b", "c"] * 50), "a b c"]
    aug = pa.concat_tables([src, pa.table(rep, schema=src.schema)])
    d = tmp_path / "repet"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    from engine.dedup import q_ngram_jaccard_pairs
    t = q_ngram_jaccard_pairs(str(d))
    pairs = {(a, b): j for a, b, j in zip(
        t["doc_a"].to_pylist(), t["doc_b"].to_pylist(),
        t["jaccard_milli"].to_pylist())}
    assert pairs.get((7_000_000, 7_000_001)) == 333


def test_pair_tables_carry_capped_column(ray_session):
    """The degrade flag promised by the docstrings must reach the caller."""
    from engine.dedup import (q_dedup_minhash_lsh, q_dedup_simhash,
                              q_ngram_jaccard_pairs)
    for fn in (q_dedup_minhash_lsh, q_dedup_simhash, q_ngram_jaccard_pairs):
        t = fn(SF_DIR)
        assert "capped" in t.column_names, fn


def test_label_propagation_warns_on_nonconvergence(ray_session):
    """ADVICE r2 (low): iteration exhaustion must not silently return
    split clusters."""
    import warnings
    from engine.dedup import clusters_label_propagation
    chain = pa.table({
        "doc_a": pa.array(list(range(1, 8)), pa.int64()),
        "doc_b": pa.array(list(range(2, 9)), pa.int64()),
        "jaccard_milli": pa.array([1000] * 7, pa.int64())})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        clusters_label_propagation(chain, max_iters=2)
    assert any("fixed point" in str(x.message) for x in w)
    # and with enough rounds it converges silently to one cluster
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t = clusters_label_propagation(chain, max_iters=20)
    assert not any("fixed point" in str(x.message) for x in w)
    assert set(t["cluster_id"].to_pylist()) == {1}


def test_window_batch_id_distinguishes_identical_content(ray_session, tmp_path):
    """ADVICE r2 (low): two DISTINCT batches with identical (user, window,
    value) content must both be applied — the batch id includes the unique
    event_ids, not just the aggregated content."""
    import pyarrow.parquet as pq
    from engine.streaming import tumbling_window_counts
    d = tmp_path / "twodup"
    (d / "events.parquet").mkdir(parents=True)
    row = {"ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
           "user_id": pa.array([42], pa.int64()),
           "event_type": pa.array(["click"]),
           "value": pa.array([1.5], pa.float64()),
           "props": pa.array(["{}"])}
    # same content, distinct event ids, one file each -> separate blocks
    for i, eid in enumerate((101, 202)):
        pq.write_table(pa.table({"event_id": pa.array([eid], pa.int64()), **row}),
                       str(d / "events.parquet" / f"part-{i}.parquet"))
    t = tumbling_window_counts(str(d))
    assert t["n_events"].to_pylist() == [2]
    assert t["sum_value_milli"].to_pylist() == [3000]


def test_embedding_near_dup_hot_bucket_bounded(ray_session, tmp_path):
    """10k identical embeddings (one hot hyperplane bucket) must finish in
    bounded time with O(k) star pairs — the exact-collapse + bucket-cap
    guarantee, mirroring the MinHash hot-bucket test."""
    import time
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    base = src.slice(7, 1).to_pydict()
    k = 10_000
    flood = {c: base[c] * k for c in base}
    flood["vec_id"] = list(range(8_000_000, 8_000_000 + k))
    aug = pa.concat_tables([src, pa.table(flood, schema=src.schema)])
    d = tmp_path / "embhot"
    d.mkdir()
    pq.write_table(aug, str(d / "embeddings.parquet"))
    from engine.simsearch import q_embedding_near_dup
    t0 = time.monotonic()
    t = q_embedding_near_dup(str(d))
    wall = time.monotonic() - t0
    orig = src["vec_id"][7].as_py()
    flood_pairs = [(a, b) for a, b in zip(t["vec_a"].to_pylist(),
                                          t["vec_b"].to_pylist())
                   if a >= 8_000_000 or b >= 8_000_000]
    # star: every flood copy pairs with the identical-set min (the original)
    assert len(flood_pairs) == k
    assert all(a == orig for a, _ in flood_pairs)
    cm = dict(zip(zip(t["vec_a"].to_pylist(), t["vec_b"].to_pylist()),
                  t["cos_micro"].to_pylist()))
    assert cm[(orig, 8_000_000)] == 1_000_000
    assert wall < 120, f"hot bucket took {wall:.1f}s"


def test_curate_semijoin_matches_broadcast(ray_session, tmp_path):
    """The distributed semi-join path must produce exactly the rows and
    shard assignment of the broadcast pc.is_in path (VERDICT r2 #3)."""
    import pyarrow.dataset as pads
    from engine.curate import curate_to_parquet
    outs = {}
    for m in ("broadcast", "semijoin"):
        out = str(tmp_path / m)
        stats = curate_to_parquet(f"{SF_DIR}/documents.parquet", out, method=m)
        assert stats["method"] == m
        t = pads.dataset(out, partitioning="hive").to_table()
        cols = sorted(t.column_names)
        outs[m] = t.select(cols).sort_by("doc_id")
    assert outs["broadcast"].num_rows > 0
    assert outs["broadcast"].equals(outs["semijoin"])


def test_rolling_fingerprint_kernels_match_scalar():
    """Both vectorized fingerprint kernels must equal the per-row spec on
    edge cases (nulls, whitespace-only, unicode, degenerate long tokens)."""
    from engine.text import (_fold_word_hashes, _roll_fp_scalar,
                             _split_tokens, _word_poly_hashes,
                             rolling_fp_batch)
    cases = ["hello world hello", "", "   ", None, "único wörd ünïcode",
             "x" * 300, ("w " * 200).strip(), "a\tb\nc", "1 2 3 . , !"]
    got_md5 = rolling_fp_batch(pa.array(cases))
    assert got_md5.tolist() == [_roll_fp_scalar(s or "") for s in cases]

    def scalar_fast(s):
        h = 2166136261
        for w in s.split():
            wh = 0
            for j, byt in enumerate(w.encode("utf-8")):
                wh = (wh + byt * pow(1000003, j, 1 << 32)) % (1 << 32)
            h = (h * 1000003 + wh) % (1 << 32)
        return h
    flat, offs = _split_tokens(pa.array(cases))
    got_fast = _fold_word_hashes(_word_poly_hashes(flat), flat, offs)
    assert got_fast.tolist() == [scalar_fast(s or "") for s in cases]


def test_verify_pairs_exact_boilerplate_skew(ray_session, tmp_path):
    """VERDICT r2 #7: exact verification after LSH on a boilerplate-heavy
    corpus — 3k identical LARGE docs (text side ~6 MB, beyond one object
    store block) must verify via the `exact` flag with NO text broadcast
    for the flood; only estimated pairs' texts ship."""
    import time
    import pyarrow.parquet as pq
    from engine import dedup
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base = src.slice(0, 1).to_pydict()
    k = 3000
    big_text = " ".join(f"clause{i} term{i}" for i in range(200))  # ~2.7 KB
    flood = {c: base[c] * k for c in base}
    flood["doc_id"] = list(range(9_000_000, 9_000_000 + k))
    flood["text"] = [big_text] * k
    # one planted non-identical near-dup of the boilerplate
    near = dict(base)
    near["doc_id"] = [9_500_000]
    near["text"] = [big_text + " amended clause zzz"]
    aug = pa.concat_tables([src, pa.table(flood, schema=src.schema),
                            pa.table(near, schema=src.schema)])
    d = tmp_path / "boiler"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))

    t0 = time.monotonic()
    out = dedup.q_dedup_verified_pairs(str(d))
    wall = time.monotonic() - t0
    ex = {(a, b): j for a, b, j in zip(out["doc_a"].to_pylist(),
                                       out["doc_b"].to_pylist(),
                                       out["jaccard_exact_milli"].to_pylist())}
    # flood stars: exact 1000 by identity
    assert ex[(9_000_000, 9_000_001)] == 1000
    # planted near-dup re-scored from text with high exact Jaccard
    near_scores = [j for (a, b), j in ex.items() if b == 9_500_000 or a == 9_500_000]
    assert near_scores and max(near_scores) >= 900
    # the broadcast side excluded the flood: only estimated pairs' docs ship
    lv = dedup.LAST_VERIFY
    assert lv["n_pairs"] >= k
    assert lv["n_text_docs"] <= 2 * lv["n_estimated"]
    assert lv["n_text_docs"] < 100, lv
    assert wall < 120, f"boilerplate skew took {wall:.1f}s"


def test_gated_doc_queries_with_null_text_row(ray_session, tmp_path):
    """A null text row must gate identically (engine fills nulls; every
    affected oracle coalesces) — code-review finding: the oracles were
    silently diverging on nulls."""
    import duckdb
    import pyarrow.parquet as pq
    from engine import extras
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    row = src.slice(0, 1).to_pydict()
    row["doc_id"] = [42_000_000]
    row["text"] = [None]
    aug = pa.concat_tables([src, pa.table(row, schema=src.schema)])
    d = tmp_path / "nulls"
    d.mkdir()
    pq.write_table(aug, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{d}/documents.parquet')")

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), ignore_index=True)

    for name in ("quality_score", "lang_id", "fingerprint_rolling",
                 "fingerprint_rolling_fast", "pack_sequences",
                 "top_terms_by_lang", "doc_fingerprint_md5",
                 "curate_corpus", "text_stats", "token_counts",
                 "corpus_split"):
        res = extras.EXTRA_QUERIES[name](str(d))
        got = canon(res.to_pandas() if hasattr(res, "to_pandas") else res)
        want = canon(con.sql(extras.EXTRA_ORACLE_SQL[name]).df())
        assert len(got) == len(want), name
        assert got.reset_index(drop=True).astype(object).equals(
            want.reset_index(drop=True).astype(object)), name


def test_shuffle_shards_semantics(ray_session, tmp_path):
    """Deterministic shuffle: same seed => identical layout; pos is a
    0..k-1 permutation inside each shard; adding docs never moves an
    existing doc to a different shard or changes its order key."""
    import pyarrow.parquet as pq
    from engine import corpus

    t1 = corpus.q_shuffle_shards(SF_DIR).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    t2 = corpus.q_shuffle_shards(SF_DIR).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert t1.equals(t2)
    assert set(t1["shard"].unique()) <= set(range(corpus._N_SHARDS))
    # near-uniform spread: no shard holds more than 3x its fair share
    assert t1["shard"].value_counts().max() <= 3 * len(t1) / corpus._N_SHARDS
    for _, g in t1.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
        # pos order == okey order within the shard
        assert g.sort_values("pos")["okey"].is_monotonic_increasing

    # growth stability: append new docs, old docs keep (shard, okey)
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    extra = src.slice(0, 3).to_pydict()
    extra["doc_id"] = [90_000_001, 90_000_002, 90_000_003]
    d = tmp_path / "grown"
    d.mkdir()
    pq.write_table(pa.concat_tables(
        [src, pa.table(extra, schema=src.schema)]),
        str(d / "documents.parquet"))
    t3 = corpus.q_shuffle_shards(str(d)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    old = t3[t3["doc_id"] < 90_000_000].reset_index(drop=True)
    assert old[["doc_id", "shard", "okey"]].equals(
        t1[["doc_id", "shard", "okey"]])


def test_semantic_dedup_planted_duplicates(ray_session, tmp_path):
    """SemDeDup: an exact copy and a tiny perturbation of an existing
    embedding both land in the original's k-means cluster and are
    dropped; the min-id original survives; disjoint vectors all keep."""
    import pyarrow.parquet as pq
    from engine.simsearch import q_semantic_dedup, _SEM_TAU_MICRO
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    base = src.slice(0, 1).to_pydict()
    exact = dict(base)
    exact["vec_id"] = [7_000_001]
    near = dict(base)
    near["vec_id"] = [7_000_002]
    v = list(base["embedding"][0])
    v[0] += 1e-3 * (abs(v[0]) + 1.0)  # cos(orig, near) ~ 0.9999
    near["embedding"] = [v]
    aug = pa.concat_tables([src,
                            pa.table(exact, schema=src.schema),
                            pa.table(near, schema=src.schema)])
    d = tmp_path / "sem"
    d.mkdir()
    pq.write_table(aug, str(d / "embeddings.parquet"))

    t = q_semantic_dedup(str(d))
    assert t.num_rows == aug.num_rows
    rows = {r["vec_id"]: r for r in t.to_pylist()}
    orig = src["vec_id"][0].as_py()
    assert rows[orig]["keep"] is True
    assert rows[7_000_001]["keep"] is False
    assert rows[7_000_001]["best_sim_micro"] == 1_000_000
    assert rows[7_000_002]["keep"] is False
    assert rows[7_000_002]["best_sim_micro"] >= _SEM_TAU_MICRO
    assert rows[7_000_002]["cluster"] == rows[orig]["cluster"]
    # uniform-random vectors are nowhere near tau: everything else kept
    dropped = [v for v, r in rows.items() if not r["keep"]]
    assert sorted(dropped) == [7_000_001, 7_000_002]
    # determinism
    t2 = q_semantic_dedup(str(d))
    assert t.equals(t2)


def test_semantic_dedup_hot_cluster_bounded(ray_session, tmp_path):
    """5k identical embeddings (one degenerate cluster) finish in bounded
    time via exact-collapse + the capped star — never a 5k x 5k matmul."""
    import time
    import pyarrow.parquet as pq
    from engine.simsearch import q_semantic_dedup
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    row = src.slice(0, 1).to_pydict()
    k = 5_000
    flood = {c: row[c] * k for c in row}
    flood["vec_id"] = list(range(6_000_000, 6_000_000 + k))
    aug = pa.concat_tables([src, pa.table(flood, schema=src.schema)])
    d = tmp_path / "hotsem"
    d.mkdir()
    pq.write_table(aug, str(d / "embeddings.parquet"))
    t0 = time.monotonic()
    t = q_semantic_dedup(str(d))
    wall = time.monotonic() - t0
    rows = {r["vec_id"]: r for r in t.to_pylist()}
    orig = src["vec_id"][0].as_py()
    assert rows[orig]["keep"] is True
    flood_keep = [v for v in flood["vec_id"] if rows[v]["keep"]]
    assert flood_keep == []          # every clone dropped
    assert wall < 90, f"hot cluster took {wall:.1f}s"


def test_source_cap_semantics_and_oracle(ray_session, tmp_path):
    """Per-source cap keeps exactly the K longest docs per source with
    (n_chars DESC, doc_id ASC) ranking, surviving a skewed source that
    spans many blocks; result is value-exact vs the DuckDB oracle."""
    import duckdb
    import pyarrow.parquet as pq
    from engine import corpus

    k = corpus._SOURCE_CAP
    n = 400  # one dominant source, two small ones
    rows = {
        "doc_id": list(range(n)),
        "text": ["x" for _ in range(n)],
        "lang": ["en"] * n,
        "source": ["big"] * (n - 10) + ["s1"] * 6 + ["s2"] * 4,
        # ties on n_chars force the doc_id ASC tiebreak
        "n_chars": [(i % 7) * 100 for i in range(n)],
    }
    d = tmp_path / "cap"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    t = corpus.q_source_cap(str(d)).to_pandas()
    per = t.groupby("source").size()
    assert per["big"] == k and per["s1"] == 6 and per["s2"] == 4
    for _, g in t.groupby("source"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(len(g)))
        key = list(zip(-g["n_chars"], g["doc_id"]))
        assert key == sorted(key)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{d}/documents.parquet')")
    want = con.sql(corpus.SQL_SOURCE_CAP).df()
    got = t[sorted(t.columns)].sort_values(sorted(t.columns),
                                           ignore_index=True)
    want = want[sorted(want.columns)].sort_values(sorted(want.columns),
                                                  ignore_index=True)
    assert got.astype(object).equals(want.astype(object))


def test_knn_join_planted_geometry_and_oracle(ray_session, tmp_path):
    """Hand-built geometry: v2 is v1's nearest neighbor and vice versa;
    the orthogonal vector ranks last; a zero vector emits no row and
    never appears as a neighbor; result gates value-exact vs DuckDB."""
    import duckdb
    import pyarrow.parquet as pq
    from engine.simsearch import q_knn_join, SQL_KNN_JOIN
    vecs = {
        1: [1.0, 0.0, 0.0, 0.0],
        2: [0.9, 0.1, 0.0, 0.0],       # closest to 1
        3: [0.0, 1.0, 0.0, 0.0],       # orthogonal-ish to 1
        4: [0.5, 0.5, 0.0, 0.0],
        5: [0.0, 0.0, 0.0, 0.0],       # zero norm: excluded both ways
    }
    d = tmp_path / "knn"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(list(vecs), type=pa.int64()),
        "embedding": pa.array([np.asarray(v, dtype=np.float32)
                               for v in vecs.values()],
                              type=pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))
    t = q_knn_join(str(d))
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    first = df[df["rank"] == 1].set_index("vec_id")["neighbor_id"]
    assert first[1] == 2 and first[2] == 1
    assert 5 not in df["vec_id"].values
    assert 5 not in df["neighbor_id"].values
    # every non-zero vector got exactly 3 ranked neighbors (4 vecs - self)
    assert df.groupby("vec_id").size().eq(3).all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * "
                f"FROM read_parquet('{d}/embeddings.parquet')")
    want = con.sql(SQL_KNN_JOIN).df()
    got = df[sorted(df.columns)].sort_values(sorted(df.columns),
                                             ignore_index=True)
    want = want[sorted(want.columns)].sort_values(sorted(want.columns),
                                                  ignore_index=True)
    assert got.astype(object).equals(want.astype(object))


def test_keyword_search_conjunction_and_ranking(ray_session, tmp_path):
    """Only docs containing ALL terms match; ranking is (tf DESC, doc_id
    ASC); case-insensitive; gates value-exact vs DuckDB."""
    import duckdb
    import pyarrow.parquet as pq
    from engine import corpus
    texts = [
        "dup vector merge dup dup",            # tf=5, all terms
        "DUP Vector MERGE",                    # tf=3, case-folded
        "dup vector only two terms here",      # missing 'merge'
        "vector merge vector merge",           # missing 'dup'
        "dup vector merge",                    # tf=3, ties with doc 2
    ]
    d = tmp_path / "search"
    d.mkdir()
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n + 1), type=pa.int64()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "text": pa.array(texts),
    }), str(d / "documents.parquet"))
    t = corpus.q_keyword_search(str(d))
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    assert list(df["doc_id"]) == [1, 2, 5]
    assert list(df["tf_total"]) == [5, 3, 3]
    assert list(df["rank"]) == [1, 2, 3]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{d}/documents.parquet')")
    want = con.sql(corpus.SQL_KEYWORD_SEARCH).df()
    assert df.astype(object).equals(want[df.columns].astype(object))


def test_distributed_classifier_matches_reference_and_learns(ray_session,
                                                             tmp_path):
    """The distributed GD trainer reproduces the single-process numpy
    reference (rtol 1e-5 — chunked float fold order is the only
    difference) and actually LEARNS: on a separable planted corpus
    (repetitive spam vs diverse prose) it classifies every doc."""
    import json
    import pyarrow.parquet as pq
    from engine import classify

    spam = " ".join(["spam"] * 30)
    diverse = " ".join(f"w{i}" for i in range(30))
    texts = [spam if i % 2 == 0 else f"{diverse} d{i}" for i in range(40)]
    d = tmp_path / "clf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), type=pa.int64()),
        "text": pa.array(texts),
    }), str(d / "documents.parquet"))

    res = classify.q_train_quality_classifier(str(d))
    df = res.to_pandas() if hasattr(res, "to_pandas") else res.to_pandas()
    assert len(df) == 40
    w = np.array(json.loads(df["w_json"].iloc[0]))
    wref = classify.train_reference(
        classify._feature_batch(pq.read_table(str(d / "documents.parquet"))))
    assert np.allclose(w, wref, rtol=1e-5, atol=1e-9)
    # planted corpus is linearly separable on the distinct-ratio feature
    assert (df["pred"] == df["label"]).all()
    assert df["label"].sum() == 20


def test_knn_join_ivf_recall_on_clustered_corpus(ray_session, tmp_path):
    """On a corpus of 4 tight clusters the IVF-scoped self-join recovers
    the exact join's neighbor SETS (within-cluster neighbors share the
    query's home cell), with bit-identical cos_micro on shared pairs;
    on the uniform sf corpus it still emits well-formed ranked rows."""
    import pyarrow.parquet as pq
    from engine.simsearch import q_knn_join, q_knn_join_ivf, _KNN_K

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, ids = [], []
    for ci, c in enumerate(centers):
        for j in range(12):
            v = c + 0.01 * rng.normal(size=16)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            ids.append(ci * 100 + j)
    d = tmp_path / "ivfknn"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))

    exact = q_knn_join(str(d))
    exact = (exact.to_pandas() if hasattr(exact, "to_pandas")
             else exact.to_pandas())
    approx = q_knn_join_ivf(str(d))
    approx = (approx.to_pandas() if hasattr(approx, "to_pandas")
              else approx.to_pandas())
    ex = exact.groupby("vec_id")["neighbor_id"].apply(set)
    ap = approx.groupby("vec_id")["neighbor_id"].apply(set)
    hits = sum(len(ex[v] & ap.get(v, set())) for v in ex.index)
    recall = hits / (len(ex) * _KNN_K)
    # deterministic seed => stable 0.861 measured: 16 centroids split the
    # 4 true clusters and nprobe=2 misses some splits — the honest ANN
    # trade-off the exact join anchors
    assert recall >= 0.75, recall
    # shared pairs carry bit-identical quantized cosines
    m = exact.merge(approx, on=["vec_id", "neighbor_id"],
                    suffixes=("_e", "_a"))
    assert (m["cos_micro_e"] == m["cos_micro_a"]).all()

    # uniform corpus: well-formed output, every rank list is 1..m<=K
    t = q_knn_join_ivf(SF_DIR)
    df = t.to_pandas() if hasattr(t, "to_pandas") else t.to_pandas()
    assert set(df.columns) == {"vec_id", "neighbor_id", "rank", "cos_micro"}
    for _, g in df.groupby("vec_id"):
        assert list(g.sort_values("rank")["rank"]) == \
            list(range(1, len(g) + 1))
        assert len(g) <= _KNN_K


def test_pq_ann_recall_and_compression(ray_session):
    """PQ ANN (16x4-bit codes packed in one uint64, ADC shortlist + exact
    re-rank): high recall of the exact top-5 while the scan table is 8
    bytes/row (64x smaller than the raw float64 rows); re-rank fetches
    only shortlist ids.  Measured recall on the uniform-random fixture
    embeddings: 15/15 at both sf0.001 and sf0.01."""
    from engine import simsearch
    from engine.simsearch import q_simsearch_pq, q_simsearch_topk
    exact = _tbl(q_simsearch_topk(SF_DIR))
    approx = q_simsearch_pq(SF_DIR)
    ex, ap = {}, {}
    for q, n in zip(exact["query_id"].to_pylist(), exact["neighbor_id"].to_pylist()):
        ex.setdefault(q, set()).add(n)
    for q, n in zip(approx["query_id"].to_pylist(), approx["neighbor_id"].to_pylist()):
        ap.setdefault(q, set()).add(n)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert np.mean(recalls) >= 0.8, recalls
    acc = simsearch.LAST_PQ
    assert acc["index_bytes_per_row"] * 8 <= acc["raw_bytes_per_row"]
    for qid, n_short in acc["shortlist"].items():
        assert n_short <= simsearch._PQ_SHORTLIST
    # deterministic: second run returns the identical table
    again = q_simsearch_pq(SF_DIR)
    assert approx.equals(again)


def _gng_oracle(parquet_path: str):
    import duckdb
    from engine import ngramrep
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{parquet_path}')")
    return con.execute(ngramrep.SQL_GOPHER_NGRAM_REPETITION).df() \
        .sort_values("doc_id").reset_index(drop=True)


def _write_docs(tmp_path, name, docs):
    import pyarrow.parquet as pq
    d = tmp_path / name
    d.mkdir()
    p = d / "documents.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s"] * len(docs)),
        "n_chars": pa.array([len(t) for t in docs], type=pa.int64()),
    }), str(p))
    return d, p


def test_gopher_ngram_repetition_planted_coverage(ray_session, tmp_path):
    """The duplicated-5-gram coverage path is NEVER exercised by the
    fixture corpus (31-word vocab, no repeated 5-grams) — plant
    overlapping / adjacent / degenerate repeats and gate value-exact
    against the in-process DuckDB oracle."""
    from engine import ngramrep

    docs = [
        # "a b c d e" occurs 3x (adjacent + after a gap)
        "a b c d e a b c d e x a b c d e",
        # degenerate run: every 5-gram is "t t t t t" (nested overlap)
        "t t t t t t q r s u v w",
        # multi-char words, one exact repeat
        "alpha beta gamma delta eps zz alpha beta gamma delta eps",
        # no repeated 5-gram at all
        "one two three four five six seven eight nine ten",
        "",
        "  \t ",
        # NBSP (U+00A0) is NOT RE2 whitespace: "p\xa0q" is ONE
        # token on both sides; the repeated 5-gram covers all
        "p\xa0q r s t u p\xa0q r s t u",
    ]
    d, p = _write_docs(tmp_path, "gng", docs)
    res = _tbl(ngramrep.q_gopher_ngram_repetition(str(d))).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ora = _gng_oracle(str(p))
    assert (res["dup5_milli"] > 0).sum() == 4
    # run covers tokens 0..5 = 6 of the 12 single-char tokens
    assert res.loc[1, "dup5_milli"] == 500
    assert res.loc[3, "dup5_milli"] == 0
    assert (res.loc[4:5, ["n_words", "tot_chars", "top2_milli",
                          "top3_milli", "dup5_milli"]] == 0).all().all()
    # NBSP doc: 10 tokens ("p\xa0q" stays whole), dup 5-gram at starts
    # 0 and 5 -> fully covered
    assert res.loc[6, "n_words"] == 10 and res.loc[6, "dup5_milli"] == 1000
    for c in res.columns:
        assert list(res[c]) == list(ora[c]), c


def test_gopher_ngram_repetition_random_matches_duckdb(ray_session,
                                                       tmp_path):
    """Random small-vocab corpora (dense n-gram collisions) gate
    value-exact vs DuckDB across doc lengths 0..30."""
    from engine import ngramrep

    rng = np.random.default_rng(42)
    vocab = np.array(["a", "bb", "ccc", "dd", "e"])
    docs = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
            for _ in range(80)]
    # NBSP and \x0b (vertical tab) are NOT RE2 whitespace: both stay
    # inside tokens on both engines (\x0b also flips _split_tokens onto
    # its exact-RE2 slow path); planted repeats exercise dup5 with them
    docs += ["a\xa0b c\x0bd e a bb a\xa0b c\x0bd e a bb",
             "c\x0bd c\x0bd c\x0bd a\xa0b e dd " * 2]
    d, p = _write_docs(tmp_path, "gngrand", docs)
    res = _tbl(ngramrep.q_gopher_ngram_repetition(str(d))).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ora = _gng_oracle(str(p))
    assert (res["dup5_milli"] > 0).any()
    for c in res.columns:
        assert list(res[c]) == list(ora[c]), c


def test_kmeans_train_matches_reference_any_layout(ray_session, tmp_path):
    """Distributed integer Lloyd == the single-process reference on the
    fixture embeddings, AND is invariant to row order + file sharding
    (the order-independence claim of integer partial sums)."""
    import pyarrow.parquet as pq
    from engine import cluster

    tr = _tbl(cluster.q_kmeans_train(SF_DIR)).to_pandas() \
        .sort_values("cluster").reset_index(drop=True)
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet").sort_by("vec_id")
    Cq, cnt, inert = cluster.kmeans_reference(cluster._batch_mat(src))
    assert list(tr["size"]) == list(cnt)
    assert list(tr["inertia"]) == list(inert)
    assert list(tr["centroid_qnorm"]) == list((Cq * Cq).sum(axis=1))
    assert int(tr["size"].sum()) == src.num_rows

    # shuffled rows, 3 shard files -> bit-identical result
    d = tmp_path / "km"
    (d / "embeddings.parquet").mkdir(parents=True)
    rng = np.random.default_rng(3)
    perm = rng.permutation(src.num_rows)
    shuf = src.take(perm)
    for i, part in enumerate(np.array_split(np.arange(src.num_rows), 3)):
        pq.write_table(shuf.take(part),
                       str(d / "embeddings.parquet" / f"p{i}.parquet"))
    tr2 = _tbl(cluster.q_kmeans_train(str(d))).to_pandas() \
        .sort_values("cluster").reset_index(drop=True)
    assert tr.equals(tr2)


def test_cross_corpus_neardup_planted(ray_session, tmp_path):
    """Incoming (val/test-split) docs that are exact or near copies of a
    train-split doc are flagged with the right match id and estimate;
    unrelated incoming docs are absent; exact hits of the gated exact
    cross-corpus dedup are a subset of the near-dup exact hits."""
    import hashlib
    import pyarrow.parquet as pq
    from engine import decontam
    from engine.corpus import _SPLIT_BUCKETS, _TRAIN_LT

    def bucket(i):
        return int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[:4], "big") % _SPLIT_BUCKETS

    train_ids = [i for i in range(1000) if bucket(i) < _TRAIN_LT][:5]
    inc_ids = [i for i in range(1000) if bucket(i) >= _TRAIN_LT][:4]
    base = " ".join(f"w{k}" for k in range(40))
    near = " ".join(("CHANGED" if k == 7 else f"w{k}") for k in range(40))
    texts = {train_ids[0]: base}
    for t in train_ids[1:]:
        texts[t] = " ".join(f"u{t}x{k}" for k in range(30))
    texts[inc_ids[0]] = base
    texts[inc_ids[1]] = near
    texts[inc_ids[2]] = " ".join(f"z{k}" for k in range(30))
    texts[inc_ids[3]] = " ".join(f"y{k}" for k in range(30))
    ids = sorted(texts)
    d = tmp_path / "xnd"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array([texts[i] for i in ids]),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["s"] * len(ids)),
        "n_chars": pa.array([len(texts[i]) for i in ids], type=pa.int64()),
    }), str(d / "documents.parquet"))

    r = decontam.q_cross_corpus_neardup(str(d)).to_pandas() \
        .set_index("doc_id")
    assert set(r.index) == {inc_ids[0], inc_ids[1]}
    assert r.loc[inc_ids[0], "exact"] \
        and r.loc[inc_ids[0], "jaccard_milli"] == 1000 \
        and r.loc[inc_ids[0], "matched_id"] == train_ids[0]
    assert not r.loc[inc_ids[1], "exact"] \
        and 500 <= r.loc[inc_ids[1], "jaccard_milli"] < 1000 \
        and r.loc[inc_ids[1], "matched_id"] == train_ids[0]

    # fixture corpus: exact-dedup dups ⊆ near-dup exact hits
    ex = decontam.q_cross_corpus_dedup(SF_DIR).to_pandas()
    nr = decontam.q_cross_corpus_neardup(SF_DIR)
    near_exact = set(np.array(nr["doc_id"])[np.array(nr["exact"])])
    assert set(ex[ex.is_dup].doc_id) <= near_exact


def test_lloyd_step_and_ngram_keys_edges():
    """Pure-numpy edges: empty clusters keep their centroid; the rounded
    integer mean matches round-half-up for positive and floor semantics
    for negative sums; n-gram keys never cross doc boundaries and are
    position-packed without overflow."""
    from engine.cluster import lloyd_step
    from engine.ngramrep import _ngram_group_keys

    Cq = np.array([[10, -10], [5, 5], [7, 7]], dtype=np.int64)
    cnt = np.array([2, 0, 3], dtype=np.int64)
    ssum = np.array([[5, -5], [0, 0], [10, -10]], dtype=np.int64)
    out = lloyd_step(Cq, cnt, ssum)
    # 5/2 -> 3 (round half up), -5/2 -> -2 ((2*-5+2)//4 = -2)
    assert out[0].tolist() == [3, -2]
    assert out[1].tolist() == [5, 5]          # empty keeps centroid
    # 10/3 -> (20+3)//6 = 3, -10/3 -> (-20+3)//6 = -3
    assert out[2].tolist() == [3, -3]

    codes = np.array([0, 1, 0, 1, 0, 1], dtype=np.int64)
    doc = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    starts, grams = _ngram_group_keys(codes, doc, 2)
    # valid starts: 0,1 (doc 0) and 3,4 (doc 1); gram "0 1" == gram "0 1"
    assert starts.tolist() == [0, 1, 3, 4]
    assert grams[0] == grams[3] and grams[1] == grams[2]
    s5, _ = _ngram_group_keys(codes, doc, 5)
    assert s5.tolist() == []                  # no 5-gram fits either doc
    s0, g0 = _ngram_group_keys(np.array([], dtype=np.int64),
                               np.array([], dtype=np.int64), 3)
    assert len(s0) == 0 and len(g0) == 0


def test_sharded_dedup_index_cross_job_state(ray_session):
    """The raw-actor index carries dedup state ACROSS Dataset executions
    (the shared-mutable-index shape no per-job groupby provides): two
    corpus halves ingested as separate jobs produce the same survivor
    table as one-shot ingestion AND as the groupby physical plan."""
    import ray
    from engine import dedup, dedupindex

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"])
    half_a = ds.filter(lambda r: r["doc_id"] % 2 == 0)
    half_b = ds.filter(lambda r: r["doc_id"] % 2 == 1)

    idx = dedupindex.ShardedDedupIndex(4)
    try:
        n_a = dedupindex.ingest(half_a, idx)
        n_b = dedupindex.ingest(half_b, idx)   # second JOB, same index
        dump = idx.dump()
    finally:
        idx.shutdown()
    assert n_a + n_b == 500
    assert int(pa.compute.sum(dump["n_copies"]).as_py()) == 500

    two_job = sorted(dump["doc_id"].to_pylist())
    ref = sorted(dedup.q_dedup_exact(SF_DIR).to_pandas()["doc_id"])
    assert two_job == ref


def test_blocklist_phrases_random_matches_duckdb(ray_session, tmp_path):
    """Random small-vocab corpora (phrase hits, overlaps, phrase words
    present but not adjacent) gate value-exact vs DuckDB."""
    import duckdb
    from engine import filters

    rng = np.random.default_rng(11)
    vocab = np.array(["big", "order", "slow", "key", "x"])
    docs = [" ".join(rng.choice(vocab, size=rng.integers(0, 25)))
            for _ in range(60)] + ["", "big", "big order big order big"]
    d, p = _write_docs(tmp_path, "blp", docs)
    res = _tbl(filters.q_blocklist_phrases(str(d))).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{p}')")
    ora = con.execute(filters.SQL_BLOCKLIST_PHRASES).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert res["n_phrase_hits"].sum() > 0
    # overlapping occurrences: "big order big order big" has 2 hits
    assert res.iloc[-1]["n_phrase_hits"] == 2
    for c in res.columns:
        assert list(res[c]) == list(ora[c]), c


def test_gopher_format_filter_planted(ray_session, tmp_path):
    """Bullet/ellipsis/symbol/alpha/mean-word-length paths are fixture-dead
    (fixture docs are single-line alphabetic words) — plant each and gate
    value-exact vs DuckDB."""
    import duckdb
    from engine import filters

    docs = [
        "- one\n- two\n- three",                  # 100% bullet lines
        "wait...\nmore…\nplain line",        # 2/3 ellipsis lines
        "# # # tag ## x",                          # symbol-heavy
        "12 34 56 78 99",                          # zero alphabetic words
        "a b c d",                                 # mean word length 1.0
        "supercalifragilisticexpialidocious " * 3, # mwl > 10
        "normal words in a fine document here ok", # clean
        "",
    ]
    d, p = _write_docs(tmp_path, "gff", docs)
    res = _tbl(filters.q_gopher_format_filter(str(d))).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    ora = con.execute(filters.SQL_GOPHER_FORMAT_FILTER).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in res.columns:
        assert list(res[c]) == list(ora[c]), c
    assert res.loc[0, "bullet_milli"] == 1000 and res.loc[0, "flagged"]
    assert res.loc[1, "ellipsis_milli"] == 666 and res.loc[1, "flagged"]
    assert res.loc[2, "flagged"] and res.loc[2, "symbol_milli"] > 100
    assert res.loc[3, "alpha_milli"] == 0 and res.loc[3, "flagged"]
    assert res.loc[4, "mwl_centi"] == 100 and res.loc[4, "flagged"]
    assert res.loc[5, "mwl_centi"] > 1000 and res.loc[5, "flagged"]
    assert not res.loc[6, "flagged"]
    assert not res.loc[7, "flagged"]


def test_winnowing_planted_edges(ray_session, tmp_path):
    """Winnowing edge cases: the shared-substring guarantee (any run of
    >= w+k-1 common words shares a fingerprint), short docs (0/1/2 words
    and 1..w-1 k-grams -> one global-min fingerprint), whitespace-only
    docs, and the scalar spec cross-check."""
    import hashlib

    import pyarrow.parquet as pq

    from engine.text import _ROLL_B, _ROLL_MOD, _WIN_K, _WIN_W

    common = "alpha beta gamma delta epsilon zeta"      # 6 words >= w+k-1
    docs = [
        (0, "intro words here " + common + " tail one"),
        (1, common + " completely different ending text"),
        (2, ""),                    # empty
        (3, "   \t  "),             # whitespace-only
        (4, "solo"),                # < k words
        (5, "two words"),           # < k words
        (6, "a b c"),               # exactly one k-gram
        (7, "a b c d e"),           # 3 k-grams < w -> one short window
    ]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([s for _, s in docs]),
                  "source": pa.array(["t"] * len(docs)),
                  "lang": pa.array(["en"] * len(docs))})
    d = tmp_path / "win"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    from engine.text import q_winnowing_fingerprints
    got = q_winnowing_fingerprints(str(d)).to_pandas()

    # scalar spec: per doc, k-gram hashes + window min / rightmost tie
    def spec(s):
        import re
        ws = re.findall(r"[^\t\n\f\r ]+", s)
        wh = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) for w in ws]
        kh = [(((wh[i] * _ROLL_B + wh[i + 1]) % _ROLL_MOD) * _ROLL_B
               + wh[i + 2]) % _ROLL_MOD for i in range(len(wh) - _WIN_K + 1)]
        out = set()
        nk = len(kh)
        if nk == 0:
            return out
        starts = range(nk - _WIN_W + 1) if nk >= _WIN_W else [0]
        for s0 in starts:
            win = kh[s0:s0 + _WIN_W]
            m = min(win)
            pos = s0 + max(j for j, v in enumerate(win) if v == m)
            out.add((pos, m))
        return out

    for did, s in docs:
        mine = {(int(r.pos), int(r.fp))
                for r in got[got.doc_id == did].itertuples()}
        assert mine == spec(s), f"doc {did}"
    # shared-substring guarantee: docs 0 and 1 share >= 1 fingerprint VALUE
    f0 = set(got[got.doc_id == 0].fp)
    f1 = set(got[got.doc_id == 1].fp)
    assert f0 & f1
    # density sanity: selected positions per doc <= #k-grams
    assert not got.duplicated(["doc_id", "pos"]).any()
