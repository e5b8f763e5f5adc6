"""Crafted-content tests for engine/filters.py and engine/sketch.py.

The sf corpora are single-line word-soup, so the driver's DuckDB gate never
exercises multi-line boilerplate, PII patterns, or dominant-word repetition.
These tests plant exactly those shapes and (a) assert hand-computed results,
(b) re-run the DuckDB oracle on the crafted corpus so the gate SQL is proven
equivalent on the interesting paths too.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts, langs=None):
    d = tmp_path / "crafted"
    d.mkdir(exist_ok=True)
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n + 1), type=pa.int64()),
        "lang": pa.array(langs or ["en"] * n, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
    }), str(d / "documents.parquet"))
    return str(d)


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def _assert_matches_oracle(sf_dir, name):
    import duckdb
    from engine import extras
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    res = extras.EXTRA_QUERIES[name](sf_dir)
    got = _canon(res.to_pandas() if hasattr(res, "to_pandas") else res)
    want = _canon(con.sql(extras.EXTRA_ORACLE_SQL[name]).df())
    assert len(got) == len(want), name
    if len(want) == 0:
        return  # both empty: Ray's to_pandas drops columns on empty datasets
    assert got.reset_index(drop=True).astype(object).equals(
        want.reset_index(drop=True).astype(object)), name


def test_repetition_filter_flags_duplicate_lines(ray_session, tmp_path):
    """4 lines, 2 identical -> 25% dup (not flagged); 3-of-4 dup -> 50%+
    flagged; dominant word >20% -> flagged."""
    sf = _write_docs(tmp_path, [
        # 4 lines, 1 dup; 20 words so the dup'd words stay at 10% < 20%
        "a b c d e\nf g h i j\na b c d e\nk l m n o",
        "same line\nsame line\nsame line\nother one",          # 4 lines, 2 dup
        "spam spam spam spam other words here now",            # top word 50%
        "one two three four five six seven eight",             # clean
    ])
    from engine.filters import q_repetition_filter
    t = q_repetition_filter(sf).to_pandas().set_index("doc_id")
    assert t.loc[1, "n_lines"] == 4 and t.loc[1, "n_dup_lines"] == 1
    assert t.loc[1, "dup_line_milli"] == 250 and not t.loc[1, "flagged"]
    assert t.loc[2, "n_dup_lines"] == 2 and t.loc[2, "dup_line_milli"] == 500
    assert t.loc[2, "flagged"]
    assert t.loc[3, "top_word_milli"] == 500 and t.loc[3, "flagged"]
    assert not t.loc[4, "flagged"]
    _assert_matches_oracle(sf, "repetition_filter")


def test_line_dedup_strips_corpus_boilerplate(ray_session, tmp_path):
    """A footer line shared by two docs is boilerplate (corpus count>=2);
    unique lines are kept.  Trimming must unify ' footer ' and 'footer'."""
    sf = _write_docs(tmp_path, [
        "unique alpha\ncopyright footer",
        "unique beta\n  copyright footer  \nunique gamma",
        "all unique here",
    ])
    from engine.filters import q_line_dedup
    t = q_line_dedup(sf).to_pandas().set_index("doc_id")
    assert t.loc[1, "n_lines"] == 2 and t.loc[1, "n_common"] == 1
    assert t.loc[1, "kept_milli"] == 500
    assert t.loc[2, "n_lines"] == 3 and t.loc[2, "n_common"] == 1
    assert t.loc[2, "kept_milli"] == 666
    assert t.loc[3, "n_common"] == 0 and t.loc[3, "kept_milli"] == 1000
    _assert_matches_oracle(sf, "line_dedup")


def test_pii_redact_replacement_bytes(ray_session, tmp_path):
    """Counts AND the exact redacted bytes (via md5 fingerprint)."""
    sf = _write_docs(tmp_path, [
        "visit https://ex.com/a?id=12345678 or mail bob@ex.org now",
        "call 5551234567 or 555 then 9876543210123",
        "clean text with no pii at all",
        None,
    ])
    from engine.filters import q_pii_redact
    t = q_pii_redact(sf).to_pandas().set_index("doc_id")
    assert (t.loc[1, "n_urls"], t.loc[1, "n_emails"], t.loc[1, "n_digit_runs"]) \
        == (1, 1, 0)  # digits were inside the URL, already redacted
    want1 = "visit <URL> or mail <EMAIL> now"
    assert t.loc[1, "redacted_fp"] == hashlib.md5(want1.encode()).hexdigest()
    assert t.loc[1, "n_chars_redacted"] == len(want1)
    assert t.loc[2, "n_digit_runs"] == 2  # 10-digit and 13-digit runs
    want2 = "call <NUM> or 555 then <NUM>"
    assert t.loc[2, "redacted_fp"] == hashlib.md5(want2.encode()).hexdigest()
    assert t.loc[3, "n_urls"] == 0 and t.loc[3, "n_emails"] == 0
    assert t.loc[4].isna().all()  # null text propagates
    _assert_matches_oracle(sf, "pii_redact")


def test_unigram_commonness_ranks_rare_docs_low(ray_session, tmp_path):
    """Docs made of corpus-common words outscore docs of hapaxes."""
    common = "the quick fox " * 10          # 'the/quick/fox' x10 each
    sf = _write_docs(tmp_path, [
        common.strip(),
        "the quick fox jumps",               # 3 common + 1 rare-ish
        "zxqv wbnm plkj trew",               # all hapaxes
    ])
    from engine.filters import q_unigram_commonness
    t = q_unigram_commonness(sf).to_pandas().set_index("doc_id")
    # corpus counts: the=11, quick=11, fox=11, jumps=1, hapaxes=1
    assert t.loc[1, "commonness_milli"] == 11_000
    assert t.loc[2, "common_sum"] == 34 and t.loc[2, "n_tokens"] == 4
    assert t.loc[2, "commonness_milli"] == 34 * 1000 // 4
    assert t.loc[3, "commonness_milli"] == 1000  # each word count 1
    assert t.loc[1, "commonness_milli"] > t.loc[3, "commonness_milli"]
    _assert_matches_oracle(sf, "unigram_commonness")


def test_kmv_estimate_accuracy(ray_session):
    """KMV on sf0.001 events: estimate within 20% of the true distinct
    count (k=256 -> ~6% expected relative error)."""
    from engine.sketch import q_kmv_distinct
    t = q_kmv_distinct(SF_DIR)
    est = t["est_distinct"][0].as_py()
    true = len(np.unique(
        pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
        ["user_id"].to_numpy(zero_copy_only=False)))
    assert abs(est - true) <= max(2, true * 0.20), (est, true)


def test_kmv_block_merge_equals_single_pass(ray_session, tmp_path):
    """The merged per-block k-min sets must reproduce the single-process
    sketch exactly (the subset-merge argument), including with dup users
    split across row groups."""
    from engine.sketch import q_kmv_distinct, _md5_60, _KMV_K
    rng = np.random.default_rng(7)
    users = rng.integers(0, 5000, size=20000)
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(pa.table({"user_id": pa.array(users, type=pa.int64())}),
                   str(d / "events.parquet"), row_group_size=1000)
    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "lang": pa.array([], type=pa.string()),
        "text": pa.array([], type=pa.string())}),
        str(d / "documents.parquet"))
    t = q_kmv_distinct(str(d))
    hv = np.sort(np.unique(_md5_60(np.unique(users))))[:_KMV_K]
    want_kth = int(hv[-1])
    want_est = (_KMV_K - 1) * (1 << 60) // want_kth
    assert t["kth_hash"][0].as_py() == want_kth
    assert t["est_distinct"][0].as_py() == want_est


def test_token_quantiles_match_numpy(ray_session):
    """Histogram-fold quantiles == sort-based quantiles per language."""
    from engine.sketch import q_token_quantiles
    t = q_token_quantiles(SF_DIR).to_pandas().set_index("lang")
    src = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["lang", "text"]).to_pandas()
    src["nt"] = src["text"].fillna("").str.split().str.len()
    for lang, g in src.groupby("lang"):
        nt = np.sort(g["nt"].to_numpy())
        n = len(nt)
        for q, nm in ((50, "p50"), (90, "p90"), (99, "p99")):
            rank = max(1, -(-q * n // 100))  # ceil, 1-indexed
            assert t.loc[lang, nm] == nt[rank - 1], (lang, nm)
        assert t.loc[lang, "n_docs"] == n


def test_stratified_sample_deterministic_and_capped(ray_session):
    from engine.sketch import q_stratified_sample, _SAMPLE_K
    t1 = q_stratified_sample(SF_DIR).to_pandas()
    t2 = q_stratified_sample(SF_DIR).to_pandas()
    assert t1.equals(t2)
    per = t1.groupby("lang")["rank"].agg(["count", "max", "min"])
    assert (per["count"] <= _SAMPLE_K).all()
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()  # ranks are 1..count, no gaps
    # hash-order means the sample is stable under doc removal: dropping a
    # non-sampled doc cannot change the selected set
    ids = set(t1["doc_id"])
    src = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    assert ids <= set(src["doc_id"].to_pylist())


def _test_split_id(start=1):
    """Find a doc_id whose md5 bucket lands in the test split."""
    from engine.decontam import _split_bucket, _VAL_LT
    import itertools
    for i in itertools.count(start):
        if _split_bucket([i])[0] >= _VAL_LT:
            return i


def _train_split_id(start=1):
    from engine.decontam import _split_bucket, _TRAIN_LT
    import itertools
    for i in itertools.count(start):
        if _split_bucket([i])[0] < _TRAIN_LT:
            return i


def test_decontaminate_planted_overlap(ray_session, tmp_path):
    """A train doc sharing an 8-gram with a test-split doc is flagged;
    a clean train doc is not.  Mirrored against DuckDB."""
    test_id = _test_split_id()
    dirty_id = _train_split_id()
    clean_id = _train_split_id(dirty_id + 1)
    secret = "zero one two three four five six seven"  # exactly 8 words
    d = tmp_path / "crafted"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([test_id, dirty_id, clean_id], type=pa.int64()),
        "lang": pa.array(["en"] * 3, type=pa.string()),
        "source": pa.array(["s"] * 3, type=pa.string()),
        "text": pa.array([
            f"held out eval doc says {secret} indeed",
            f"training doc leaked {secret} into the corpus",
            "completely unrelated training text with many different words "
            "that never overlap the held out set at all",
        ], type=pa.string()),
    }), str(d / "documents.parquet"))
    from engine.decontam import q_decontaminate
    t = q_decontaminate(str(d)).to_pandas().set_index("doc_id")
    assert test_id not in t.index          # test split is not re-emitted
    assert bool(t.loc[dirty_id, "contaminated"])
    assert t.loc[dirty_id, "n_hits"] >= 1
    assert not bool(t.loc[clean_id, "contaminated"])
    assert t.loc[clean_id, "n_hits"] == 0
    _assert_matches_oracle(str(d), "decontaminate")


def test_decontaminate_short_docs_have_no_ngrams(ray_session, tmp_path):
    """Docs under 8 words produce zero 8-grams and cannot be flagged."""
    dirty_id = _train_split_id()
    d = tmp_path / "short"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([dirty_id], type=pa.int64()),
        "lang": pa.array(["en"], type=pa.string()),
        "source": pa.array(["s"], type=pa.string()),
        "text": pa.array(["only seven words live in this doc"],
                         type=pa.string()),
    }), str(d / "documents.parquet"))
    from engine.decontam import q_decontaminate
    t = q_decontaminate(str(d)).to_pandas()
    assert t["n_ngrams"].tolist() == [0]
    assert not t["contaminated"].any()
    _assert_matches_oracle(str(d), "decontaminate")


def test_source_mixture_downsamples_big_sources(ray_session, tmp_path):
    """Source with 50 docs gets rate 400; source with 10 docs keeps all.
    Keep decisions are per-doc deterministic and oracle-mirrored."""
    n_a, n_b = 50, 10
    d = tmp_path / "mix"
    d.mkdir(exist_ok=True)
    ids = list(range(1, n_a + n_b + 1))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "lang": pa.array(["en"] * len(ids), type=pa.string()),
        "source": pa.array(["big"] * n_a + ["small"] * n_b,
                           type=pa.string()),
        "text": pa.array(["x"] * len(ids), type=pa.string()),
    }), str(d / "documents.parquet"))
    from engine.decontam import q_source_mixture_sample
    t = q_source_mixture_sample(str(d)).to_pandas()
    assert set(t[t.source == "big"]["rate_milli"]) == {400}
    assert set(t[t.source == "small"]["rate_milli"]) == {1000}
    assert t[t.source == "small"]["kept"].all()
    kept_big = t[t.source == "big"]["kept"].sum()
    assert 0 < kept_big < n_a  # thresholding actually splits the source
    t2 = q_source_mixture_sample(str(d)).to_pandas()
    assert t.sort_values("doc_id", ignore_index=True).equals(
        t2.sort_values("doc_id", ignore_index=True))
    _assert_matches_oracle(str(d), "source_mixture_sample")


# ---------------------------------------------------------------------------
# property: random structured corpora vs the DuckDB oracles
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_WORDS = ["alpha", "beta", "gamma", "the", "of", "spam", "x1",
          "café", "bob@ex.org", "https://ex.com/p?q=12345678",
          "5551234567", "<tag>", "a"]
_SEPS = [" ", "  ", "\t", " \r"]


@st.composite
def _doc(draw):
    if draw(st.integers(0, 12)) == 0:
        return None
    n_lines = draw(st.integers(0, 5))
    lines = []
    for _ in range(n_lines):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=0,
                              max_size=10))
        sep = draw(st.sampled_from(_SEPS))
        pad = draw(st.sampled_from(["", " ", "\t"]))
        lines.append(pad + sep.join(words) + pad)
    return "\n".join(lines)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_doc(), min_size=1, max_size=12),
       dup=st.booleans())
def test_filter_oracles_on_random_corpora(ray_session, tmp_path_factory,
                                          texts, dup):
    """Engine == DuckDB on randomly structured corpora: ragged lines,
    tabs/CRs, empty lines, nulls, PII-shaped tokens, duplicated docs."""
    if dup:  # force corpus-wide line collisions + split-crossing dups
        texts = texts + texts[:2]
    d = tmp_path_factory.mktemp("prop")
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n + 1), type=pa.int64()),
        "lang": pa.array(["en", "fr"] * (n // 2 + 1))[:n],
        "source": pa.array(["s0", "s1"] * (n // 2 + 1))[:n],
        "text": pa.array(texts, type=pa.string()),
    }), str(d / "documents.parquet"))
    for name in ("repetition_filter", "line_dedup", "pii_redact",
                 "dup_ngram_stats", "dup_span_removal",
                 "unigram_commonness", "decontaminate", "cross_corpus_dedup",
                 "corpus_split", "pack_sequences", "top_terms_by_lang",
                 "shuffle_shards", "keyword_search", "vocab_stats",
                 "source_overlap", "contamination_report", "corpus_diff",
                 "ppjoin_pairs"):
        _assert_matches_oracle(str(d), name)


def test_dup_ngram_stats_plants_and_gates(ray_session, tmp_path):
    """A 5-gram shared verbatim by two docs is counted at every position
    in both; a unique doc reports zero; a doc shorter than N emits no
    row; the whole table gates value-exact vs DuckDB."""
    sf = _write_docs(tmp_path, [
        "the quick brown fox jumps over the lazy dog today",   # shares 5-gram
        "intro words the quick brown fox jumps and more text", # with doc 1
        "completely unique words nothing shared anywhere here ok",
        "too short",                                           # < N words: no row
    ])
    from engine.filters import q_dup_ngram_stats, _NGRAM_N
    t = q_dup_ngram_stats(sf).to_pandas().set_index("doc_id")
    assert 4 not in t.index           # 2 words < N
    assert t.loc[3, "n_dup_pos"] == 0 and not t.loc[3, "flagged"]
    # doc1: 10 words -> 6 positions; 'the quick brown fox jumps' and
    # 'quick brown fox jumps over'? only the first 5-gram is shared
    assert t.loc[1, "n_ngrams"] == 10 - _NGRAM_N + 1
    assert t.loc[1, "n_dup_pos"] == 1 and t.loc[1, "n_dup_ngrams"] == 1
    assert t.loc[2, "n_dup_pos"] == 1
    _assert_matches_oracle(sf, "dup_ngram_stats")


def test_dup_ngram_repeated_within_one_doc_not_duplicated(ray_session,
                                                          tmp_path):
    """An n-gram repeated many times inside ONE doc is not corpus-
    duplicated (distinct-doc count is 1) — the distinct-(ngram, doc)
    combiner must not double-count within a document."""
    sf = _write_docs(tmp_path, [
        "spam ham eggs toast jam spam ham eggs toast jam",  # self-repeat only
        "other words entirely distinct from that one yes",
    ])
    from engine.filters import q_dup_ngram_stats
    t = q_dup_ngram_stats(sf).to_pandas().set_index("doc_id")
    assert t.loc[1, "n_dup_pos"] == 0 and t.loc[1, "n_dup_ngrams"] == 0
    _assert_matches_oracle(sf, "dup_ngram_stats")


def test_dup_span_removal_rewrites_shared_spans(ray_session, tmp_path):
    """Tokens covered by a corpus-duplicated 5-gram are removed from BOTH
    docs; untouched docs round-trip whitespace-normalized; sub-N docs
    keep everything; the rewrite gates value-exact (incl. kept_text)."""
    sf = _write_docs(tmp_path, [
        "aa bb cc dd ee keep1 keep2",     # shares 'aa bb cc dd ee'
        "pre1 aa bb cc dd ee post1",      # with doc 1
        "totally  separate\twords here now",  # ws-normalized round-trip
        "tiny doc",
    ])
    from engine.filters import q_dup_span_removal
    t = q_dup_span_removal(sf).to_pandas().set_index("doc_id")
    assert t.loc[1, "kept_text"] == "keep1 keep2"
    assert t.loc[2, "kept_text"] == "pre1 post1"
    assert t.loc[1, "n_kept"] == 2 and t.loc[2, "n_kept"] == 2
    assert t.loc[3, "kept_text"] == "totally separate words here now"
    assert t.loc[4, "kept_text"] == "tiny doc"
    assert t.loc[4, "kept_milli"] == 1000
    _assert_matches_oracle(sf, "dup_span_removal")


def test_dup_span_removal_overlapping_spans_union(ray_session, tmp_path):
    """Overlapping duplicated n-grams remove the UNION of their covered
    tokens (prefix-sum coverage), not double-count or truncate."""
    sf = _write_docs(tmp_path, [
        "a b c d e f g h tailone",   # 'a..e' and 'd..h'? only runs both
        "a b c d e f g h tailtwo",   # docs share tokens 1..8 entirely
    ])
    from engine.filters import q_dup_span_removal
    t = q_dup_span_removal(sf).to_pandas().set_index("doc_id")
    # every 5-gram within 'a..h' is shared, so tokens 1..8 are covered
    assert t.loc[1, "kept_text"] == "tailone"
    assert t.loc[2, "kept_text"] == "tailtwo"
    _assert_matches_oracle(sf, "dup_span_removal")


def test_cross_corpus_dedup_planted_duplicates(ray_session, tmp_path):
    """An incoming (val/test-split) doc whose text byte-equals an
    already-ingested (train-split) doc is flagged with the exact match
    count; novel incoming docs are not; gates value-exact vs DuckDB."""
    import duckdb
    from engine import decontam
    from engine.decontam import _split_bucket, _TRAIN_LT

    train_ids, incoming_ids = [], []
    i = 0
    while len(train_ids) < 3 or len(incoming_ids) < 3:
        b = int(_split_bucket([i])[0])
        if b < _TRAIN_LT and len(train_ids) < 3:
            train_ids.append(i)
        elif b >= _TRAIN_LT and len(incoming_ids) < 3:
            incoming_ids.append(i)
        i += 1
    shared = "this exact page was already ingested last crawl"
    rows = (
        [(train_ids[0], shared), (train_ids[1], shared),
         (train_ids[2], "some other existing document")]
        + [(incoming_ids[0], shared),              # dup of 2 train docs
           (incoming_ids[1], "a genuinely new document"),
           (incoming_ids[2], "some other existing document")])  # dup of 1
    d = tmp_path / "cross"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "text": pa.array([r[1] for r in rows]),
    }), str(d / "documents.parquet"))
    t = decontam.q_cross_corpus_dedup(str(d))
    df = (t.to_pandas() if hasattr(t, "to_pandas") else t.to_pandas()) \
        .set_index("doc_id")
    assert len(df) == 3                      # only incoming docs emit rows
    assert df.loc[incoming_ids[0], "n_existing_matches"] == 2
    assert bool(df.loc[incoming_ids[0], "is_dup"])
    assert df.loc[incoming_ids[1], "n_existing_matches"] == 0
    assert not bool(df.loc[incoming_ids[1], "is_dup"])
    assert df.loc[incoming_ids[2], "n_existing_matches"] == 1
    _assert_matches_oracle(str(d), "cross_corpus_dedup")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def test_mg_compress_bound_property():
    """MG reduction invariants on random count vectors: <= k survivors,
    every survivor undercounts by <= n/(k+1), and any word with true
    count > n/(k+1) survives."""
    from hypothesis import given, settings, strategies as st

    from engine.sketch import mg_compress

    @settings(max_examples=100, deadline=None)
    @given(data=st.data())
    def prop(data):
        m = data.draw(st.integers(min_value=0, max_value=80))
        counts = np.array(
            data.draw(st.lists(st.integers(1, 500), min_size=m, max_size=m)),
            dtype=np.int64)
        k = data.draw(st.integers(min_value=1, max_value=20))
        words = np.array([f"w{i}" for i in range(m)], dtype=object)
        kept_w, kept_c = mg_compress(words, counts, k)
        n = int(counts.sum())
        assert len(kept_w) <= k
        true = dict(zip(words, counts))
        for w, c in zip(kept_w, kept_c):
            assert 0 < c <= true[w]
            assert true[w] - c <= n // (k + 1)
        kept = set(kept_w)
        for w, c in true.items():
            if c > n // (k + 1):
                assert w in kept

    prop()


def test_heavy_hitters_compression_path_exact(ray_session, tmp_path,
                                              monkeypatch):
    """End-to-end with the summary ACTUALLY compressing (vocab >> k) and
    the candidate prune active (thresh > slack): output equals the exact
    GROUP BY/HAVING on a skewed synthetic corpus."""
    from collections import Counter

    import engine.sketch as sketch

    monkeypatch.setattr(sketch, "_MG_K", 16)
    monkeypatch.setattr(sketch, "_HH_DENOM", 4)
    rng = np.random.default_rng(20260818)
    # two genuinely heavy words + a 300-word tail
    stream = (["hot"] * 2000 + ["warm"] * 900 +
              [f"tail{i}" for i in rng.integers(0, 300, size=1100)])
    rng.shuffle(stream)
    docs = [" ".join(stream[i:i + 40]) for i in range(0, len(stream), 40)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    }), str(tmp_path / "documents.parquet"))
    out = sketch.q_heavy_hitters(str(tmp_path)).to_pandas()
    c = Counter(stream)
    thresh = len(stream) // 4
    want = sorted((w, n) for w, n in c.items() if n >= thresh)
    assert list(map(tuple, out[["word", "cnt"]].itertuples(index=False))) \
        == want
    assert want and want[0][0] == "hot"      # the planted hitter is found


def test_heavy_hitters_degenerate_tiny_corpus(ray_session, tmp_path):
    """total < _HH_DENOM makes thresh 0 <= slack: the exact fallback
    counts every word, matching HAVING count >= 0 (all vocab)."""
    import engine.sketch as sketch
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b a", ""]),
    }), str(tmp_path / "documents.parquet"))
    out = sketch.q_heavy_hitters(str(tmp_path)).to_pandas()
    assert list(map(tuple, out[["word", "cnt"]].itertuples(index=False))) \
        == [("a", 2), ("b", 1)]


def test_keyword_search_indexed_matches_scan_and_prunes(ray_session):
    """The partitioned inverted index returns the identical top-k table
    as the full-text scan while reading only the terms' bucket
    partitions."""
    import engine.corpus as corpus
    sf = "/root/testdata/sf0.001"
    a = corpus.q_keyword_search(sf).to_pandas()
    b = corpus.q_keyword_search_indexed(sf).to_pandas()
    assert a.equals(b)
    scan = corpus.LAST_KEYWORD_SCAN
    assert 0 < scan["rows_read"] < scan["rows_total"] * 0.35
    # second call hits the cached index (same _SUCCESS marker)
    d1 = corpus.inverted_index_dir(sf)
    d2 = corpus.inverted_index_dir(sf)
    assert d1 == d2


# ---------------------------------------------------------------------------
# HyperLogLog: rho exactness, merge = single-pass, accuracy in range
# ---------------------------------------------------------------------------

def test_hll_rho_matches_bit_length():
    import numpy as np

    from engine.sketch import _HLL_REM_BITS, hll_rho
    vals = np.array([0, 1, 2, 3, (1 << 52) - 1, 1 << 51, 12345, 2**40],
                    dtype=np.int64)
    got = hll_rho(vals)
    want = [(_HLL_REM_BITS + 1) - int(v).bit_length() if v else
            _HLL_REM_BITS + 1 for v in vals]
    assert got.tolist() == want


def test_hll_estimate_within_error_envelope(ray_session, tmp_path):
    """At n >> m the raw HLL estimate must land within ~3 sigma
    (3 * 1.04/sqrt(256) ~ 20%) of the true distinct count, and the
    batched fold must equal a single-pass computation."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.sketch import q_hll_distinct
    n = 20_000
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 10**12, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(np.zeros(n, dtype=np.int64), type=pa.timestamp("us")),
        "user_id": pa.array(ids, type=pa.int64()),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n)})
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = q_hll_distinct(d).to_pandas()
    exact = len(np.unique(ids))
    est = int(out["est_raw"].iloc[0])
    assert abs(est - exact) / exact < 0.20, (est, exact)


# ---------------------------------------------------------------------------
# mergeable quantile summary: rank-error bound, exact when n <= S
# ---------------------------------------------------------------------------

def test_quantile_summary_rank_error_bound():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from engine.sketch import quantile_summary

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(min_value=-1000, max_value=1000),
                    min_size=1, max_size=4000),
           st.integers(min_value=4, max_value=64))
    def check(vals, s):
        arr = np.sort(np.array(vals, dtype=np.int64))
        pts, w = quantile_summary(arr, s)
        assert int(w.sum()) == len(arr)
        assert pts[-1] == arr[-1]
        # each point's weighted rank lies inside its value's rank run
        # (exact: cum == idx+1 of a sampled order statistic), and a
        # quantile query off the summary errs by < step ranks
        step = -(-len(arr) // s)
        cum = np.cumsum(w)
        for p, c in zip(pts.tolist(), cum.tolist()):
            assert np.searchsorted(arr, p, side="left") < c \
                <= np.searchsorted(arr, p, side="right")
        n = len(arr)
        for rank in {1, n // 2 + 1, n}:
            est = pts[np.searchsorted(cum, rank)]
            lo = int(np.searchsorted(arr, est, side="left")) + 1
            hi = int(np.searchsorted(arr, est, side="right"))
            assert lo - step <= rank <= hi + step
    check()


def test_value_quantiles_sketch_vs_exact(ray_session):
    """sf0.001 end-to-end: estimated quantile ranks land within
    N/S + #batches of the exact target rank, per type."""
    import numpy as np
    import pyarrow.parquet as pq

    from engine.sketch import _QSK_S, q_value_quantiles_sketch
    sf = "/root/testdata/sf0.001"
    got = q_value_quantiles_sketch(sf).to_pandas().set_index("event_type")
    t = pq.read_table(sf + "/events.parquet",
                      columns=["event_type", "value"])
    cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    et = t["event_type"].to_numpy(zero_copy_only=False)
    for etype in np.unique(et):
        grp = np.sort(cents[et == etype])
        n = len(grp)
        assert int(got.loc[etype, "n"]) == n
        budget = n // _QSK_S + 8 + 1          # N/S + batches margin
        for q in (50, 90, 99):
            est = int(got.loc[etype, f"p{q}_cents"])
            rank = max(1, (q * n + 99) // 100)
            lo = int(np.searchsorted(grp, est, side="left")) + 1
            hi = int(np.searchsorted(grp, est, side="right"))
            assert lo - budget <= rank <= hi + budget, (etype, q)


def test_corpus_diff_planted_overlapping_classes(ray_session, tmp_path):
    """Planted snapshot diff covering every class INCLUDING the overlaps:
    id 49 is edited (49%7==0) AND re-ingested (49%11==5); id 16 is removed
    (16%13==3) AND re-ingested (16%11==5).  The re-ingested copy always
    carries the ORIGINAL text under id+1e9."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "diffcorpus"
    d.mkdir()
    ids = [1, 3, 5, 7, 16, 49]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "lang": pa.array(["en"] * len(ids), type=pa.string()),
        "source": pa.array(["web"] * len(ids), type=pa.string()),
        "text": pa.array([f"doc {i} body" for i in ids], type=pa.string()),
    }), str(d / "documents.parquet"))

    from engine.decontam import _DIFF_ADD_OFFSET, q_corpus_diff
    t = q_corpus_diff(str(d))
    got = dict(zip(t["doc_id"].astype(int), t["status"]))
    assert got == {
        3: "removed",                               # 3 % 13 == 3
        7: "changed",                               # edited only
        5 + _DIFF_ADD_OFFSET: "added",              # re-ingest only
        16: "removed",                              # removed AND re-ingested
        16 + _DIFF_ADD_OFFSET: "added",
        49: "changed",                              # edited AND re-ingested
        49 + _DIFF_ADD_OFFSET: "added",
    }                                               # id 1: unchanged, absent
    _assert_matches_oracle(str(d), "corpus_diff")


def test_token_entropy_matches_single_process(ray_session):
    """Distributed entropy decomposition == single-process numpy over the
    same token stream (per source), and a uniform-vs-skewed planted
    ordering sanity check."""
    import collections

    import pyarrow.parquet as pq2

    from engine.corpus import q_token_entropy
    got = q_token_entropy(SF_DIR)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got) \
        .set_index("source")
    t = pq2.read_table(SF_DIR + "/documents.parquet",
                       columns=["source", "text"])
    acc = collections.defaultdict(collections.Counter)
    for s, x in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        acc[s].update((x or "").lower().split())
    for s, ctr in acc.items():
        n = sum(ctr.values())
        p = np.array(list(ctr.values()), dtype=np.float64) / n
        h_ref = float(-(p * np.log(p)).sum())
        assert abs(got.loc[s, "entropy_nats"] - h_ref) < 1e-7, s
        assert int(got.loc[s, "n_tokens"]) == n
        assert abs(got.loc[s, "perplexity"] - np.exp(h_ref)) < 1e-4


def test_token_entropy_orders_skew(ray_session, tmp_path):
    """A one-word source scores H=0; a uniform 8-word source scores
    log 8."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    d = tmp_path / "ent"
    d.mkdir()
    texts = ["spam spam spam spam spam spam spam spam",
             "a b c d e f g h"]
    pq2.write_table(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "lang": pa.array(["en", "en"], type=pa.string()),
        "source": pa.array(["boiler", "diverse"], type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
    }), str(d / "documents.parquet"))
    from engine.corpus import q_token_entropy
    got = q_token_entropy(str(d))
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got) \
        .set_index("source")
    assert got.loc["boiler", "entropy_nats"] == 0.0
    assert abs(got.loc["diverse", "entropy_nats"] - np.log(8)) < 1e-9
