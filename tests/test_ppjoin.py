"""Prefix-filter similarity join: planted exactness + brute-force parity."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, name="ppj"):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    ids = list(range(1, len(texts) + 1))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "lang": pa.array(["en"] * len(ids), type=pa.string()),
        "source": pa.array(["web"] * len(ids), type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
    }), str(d / "documents.parquet"))
    return str(d)


def _brute_pairs(texts, tau_milli):
    sets = [set(t.lower().split()) for t in texts]
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if 1000 * inter >= tau_milli * union:
                out[(i + 1, j + 1)] = 1000 * inter // union
    return out


def test_ppjoin_planted_pairs(ray_session, tmp_path):
    """Known Jaccards: identical (1000), 3-of-4 overlap (600), disjoint
    (absent), empty docs (absent), case-insensitive match."""
    texts = [
        "alpha beta gamma delta",        # 1
        "alpha beta gamma delta",        # 2: J(1,2)=1000
        "alpha beta gamma epsilon",      # 3: J(1,3)=3/5 -> 600
        "zeta eta theta iota",           # 4: disjoint
        "",                              # 5: empty, never paired
        "ALPHA BETA GAMMA DELTA",        # 6: == 1 after lower()
    ]
    sf = _write_docs(tmp_path, texts)
    from engine.ppjoin import TAU_MILLI, q_ppjoin_pairs
    got = q_ppjoin_pairs(sf).to_pandas()
    pairs = {(int(r.doc_a), int(r.doc_b)): int(r.jaccard_milli)
             for r in got.itertuples()}
    assert pairs == _brute_pairs(texts, TAU_MILLI)
    assert pairs[(1, 2)] == 1000 and pairs[(1, 6)] == 1000
    assert pairs[(1, 3)] == 600
    assert not any(5 in p or 4 in p for p in pairs)


def test_ppjoin_matches_bruteforce_random(ray_session, tmp_path):
    """Random small-vocab corpus (dense overlaps): the prefix filter must
    lose NOTHING vs the O(n^2) reference — completeness is the
    operator's whole contract."""
    rng = np.random.RandomState(11)
    vocab = [f"w{k}" for k in range(12)]
    texts = [" ".join(rng.choice(vocab,
                                 size=rng.randint(1, 9), replace=True))
             for _ in range(60)]
    sf = _write_docs(tmp_path, texts, "rnd")
    from engine.ppjoin import TAU_MILLI, q_ppjoin_pairs
    got = q_ppjoin_pairs(sf).to_pandas()
    pairs = {(int(r.doc_a), int(r.doc_b)): int(r.jaccard_milli)
             for r in got.itertuples()}
    assert pairs == _brute_pairs(texts, TAU_MILLI)


def test_candidate_fold_cap_bounds_expansion():
    """Unit: a flooded posting (k members) expands to k-1 star pairs
    under the cap instead of k·(k-1)/2, small postings stay exact, and
    capped flags mark exactly the flooded segment's pairs."""
    from engine.ppjoin import make_candidate_fold

    k_flood, k_small = 64, 4
    t = pa.table({
        "h": pa.array([1] * k_flood + [2] * k_small, type=pa.int64()),
        "doc": pa.array(list(range(100, 100 + k_flood))
                        + list(range(500, 500 + k_small)),
                        type=pa.int64()),
        "s": pa.array([10] * (k_flood + k_small), type=pa.int64()),
    })
    exact = make_candidate_fold(None)(t)
    assert exact.num_rows == k_flood * (k_flood - 1) // 2 \
        + k_small * (k_small - 1) // 2
    assert not pc.any(pc.cast(exact["capped"], pa.bool_())).as_py()

    capped = make_candidate_fold(8)(t)
    assert capped.num_rows == (k_flood - 1) + k_small * (k_small - 1) // 2
    cdf = capped.to_pandas()
    flood = cdf[cdf.capped == 1]
    assert len(flood) == k_flood - 1          # the star, all flagged
    assert (flood.key == 100).all()           # centered on the min doc
    assert (cdf[cdf.capped == 0].key >= 500).all()   # small seg exact


def test_ppjoin_flood_capped_mode(ray_session, tmp_path):
    """End-to-end flood (near-identical tiny docs — the df² worst case):
    exact mode still matches brute force; the opt-in bounded mode emits
    a SUBSET with every pair exactly scored and capped.any() loud."""
    rng = np.random.RandomState(7)
    base = "alpha beta gamma delta epsilon"
    texts = [f"{base} fill{rng.randint(3)}" for _ in range(120)]
    sf = _write_docs(tmp_path, texts, "flood")
    from engine.ppjoin import TAU_MILLI, q_ppjoin_pairs
    want = _brute_pairs(texts, TAU_MILLI)

    exact = q_ppjoin_pairs(sf).to_pandas()
    assert "capped" not in exact.columns      # gate schema untouched
    got = {(int(r.doc_a), int(r.doc_b)): int(r.jaccard_milli)
           for r in exact.itertuples()}
    assert got == want

    bounded = q_ppjoin_pairs(sf, max_posting_df=8).to_pandas()
    assert bounded["capped"].dtype == bool and bounded["capped"].any()
    bgot = {(int(r.doc_a), int(r.doc_b)): int(r.jaccard_milli)
            for r in bounded.itertuples()}
    assert set(bgot) <= set(want)             # recall-only degrade
    assert all(want[p] == j for p, j in bgot.items())  # precision exact
    assert len(bgot) < len(want)              # the cap actually engaged


def test_prefix_len_bound():
    """p >= 1 for every s >= 1 and p == s for tau-impossible tiny sets."""
    from engine.ppjoin import _prefix_len
    s = np.arange(1, 50, dtype=np.int64)
    p = _prefix_len(s)
    assert (p >= 1).all() and (p <= s).all()
    assert p[0] == 1                       # s=1: ceil(.5)=1 -> p=1


def test_cli_simjoin_pca_leakage(ray_session, tmp_path, capsys):
    """The three round-4-closer CLI subcommands run end-to-end and print
    one JSON document each."""
    import json

    from engine.job import main
    out = tmp_path / "pairs"
    assert main(["simjoin", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", str(out)]) == 0
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["pairs"] > 0
    import pyarrow.dataset as pds
    assert pds.dataset(str(out)).count_rows() == doc["pairs"]

    out2 = tmp_path / "pca"
    assert main(["pca", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", str(out2)]) == 0
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["rows"] == 500

    rep = tmp_path / "leak.parquet"
    assert main(["leakage", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", str(rep)]) == 0
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["eval_docs"] > 0 and doc["docs_with_leaks"] >= 0
    t = pq.read_table(str(rep))
    assert t.num_rows == doc["eval_docs"]
