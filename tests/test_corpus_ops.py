"""Corpus-preparation kernels: chunking-with-stride offset arithmetic
pinned against a scalar rebuild (the gate only sees fixed-shape docs).
"""


def test_chunk_ranges_matches_scalar():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from engine.corpus import chunk_ranges

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=60), min_size=1,
                    max_size=20),
           st.integers(min_value=1, max_value=12),
           st.integers(min_value=1, max_value=12))
    def check(counts, size, stride):
        arr = np.array(counts, dtype=np.int64)
        di, ci, st_, ln = chunk_ranges(arr, size, stride)
        want = []
        for d, n in enumerate(counts):
            j = 0
            while j * stride < n:
                s = j * stride
                want.append((d, j, s, min(s + size, n) - s))
                j += 1
        assert list(zip(di.tolist(), ci.tolist(), st_.tolist(),
                        ln.tolist())) == want

    check()


def test_dedup_normalized_collapses_variants(ray_session, tmp_path):
    """Case/whitespace-only variants collapse to the min-id survivor;
    genuinely different docs survive."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.dedup import q_dedup_normalized
    docs = ["Hello  World", "hello world", "\thello   WORLD \n",
            "other doc", "hello worlds"]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s"] * len(docs)),
        "n_chars": pa.array([len(d) for d in docs], type=pa.int64())})
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = q_dedup_normalized(d).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 3, 4]


def test_bm25_length_normalization_and_saturation():
    """Longer docs score lower at equal tf; tf gains saturate (the k1
    ceiling): doubling tf less than doubles the score."""
    import numpy as np

    from engine.corpus import bm25_scores
    idf, n, sumdl = 1_000_000, 1000, 30_000
    tf = np.array([2, 2, 4], dtype=np.int64)
    dl = np.array([20, 80, 20], dtype=np.int64)
    s = bm25_scores(tf, dl, idf, n, sumdl)
    assert s[1] < s[0]                       # same tf, longer doc
    assert s[0] < s[2] < 2 * s[0]            # saturation
    assert bm25_scores(np.array([0]), np.array([10]), idf, n, sumdl)[0] == 0


def test_prepare_composite_equals_stagewise(ray_session, tmp_path):
    """prepare_to_parquet output ids == (train split) ∩ (curated) \\
    (contaminated), each recomputed independently from the gated
    single-op queries; manifest counts consistent."""
    import json
    import os

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray
    from engine.corpus import q_corpus_split
    from engine.curate import q_curate_corpus
    from engine.decontam import q_decontaminate
    from engine.prepare import prepare_to_parquet

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "prep")
    man = prepare_to_parquet(os.path.join(sf, "documents.parquet"), out,
                             num_shards=4)
    got_ids = set(pq.read_table(
        out, columns=["doc_id"])["doc_id"].to_pylist())

    split = q_corpus_split(sf).to_pandas()
    train = set(split[split["split"] == "train"]["doc_id"])
    curated = set(q_curate_corpus(sf).to_pandas()["doc_id"])
    dec = q_decontaminate(sf).to_pandas()
    cont = set(dec[dec["contaminated"]]["doc_id"])
    want = (train & curated) - cont
    assert got_ids == want
    assert man["train_prepared_docs"] == len(want)
    assert man["curated_docs"] == len(curated)
    with open(os.path.join(out, "_prepare_manifest.json")) as f:
        assert json.load(f) == man
    # resumable layout: one directory per shard
    shards = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert shards and len(shards) <= 4
    # idempotent re-run: manifest presence certifies completeness,
    # identical manifest returned with zero recompute (sub-second)
    import time
    t0 = time.time()
    assert prepare_to_parquet(os.path.join(sf, "documents.parquet"), out,
                              num_shards=4) == man
    assert time.time() - t0 < 2.0
