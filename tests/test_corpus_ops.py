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
