"""RE2-whitespace exactness (round-4 advisor fix).

Every DuckDB oracle in the repo tokenizes with RE2 ``\\S+``, whose
whitespace class is exactly ``[\\t\\n\\f\\r ]`` — NOT \\v (0x0B) and NOT
Unicode spaces (NBSP, EM SPACE, U+2028).  The engine's splitter
(engine.text._split_tokens, shared by every text operator) must agree
byte-for-byte, or gated queries silently break on real web text.  The
previous ``utf8_split_whitespace`` treated NBSP as a separator; these
tests pin the fixed behavior with a corpus that actually contains the
divergent characters.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod
from engine.text import _split_tokens

NASTY = [
    "plain ascii words here",
    "nbsp joined stays one token",
    "em space and linesep inside tokens",
    "vtab\x0bjoined stays one token too",
    "  leading and trailing  ",
    "\t\n\f\r mixed\tws\nhere\f now",
    "",
    "   ",
    "\x0b",
    " ",
    None,
    "tab\tmix and\x0bboth kinds of nonspace",
]


def test_split_tokens_matches_re2_oracle():
    con = duckdb.connect()
    flat, offs = _split_tokens(pa.array(NASTY, pa.string()))
    toks = flat.to_pylist()
    for i, s in enumerate(NASTY):
        got = [t for t in toks[offs[i]:offs[i + 1]] if len(t) > 0]
        want = con.execute(
            "SELECT regexp_extract_all(coalesce(?, ''), '\\S+')",
            [s]).fetchone()[0]
        assert got == want, f"text={s!r}: engine={got} oracle={want}"


def test_split_tokens_vtab_path_equals_ascii_path_on_ascii():
    # the \v-probe fallback must not change results for text without \v:
    # force both paths on the same ascii batch by appending a \v row
    base = ["a b  c", " x\ty ", "", "  ", "one"]
    f1, o1 = _split_tokens(pa.array(base, pa.string()))
    f2, o2 = _split_tokens(pa.array(base + ["q\x0br"], pa.string()))
    assert f1.to_pylist() == f2.to_pylist()[:len(f1)]
    assert list(o1) == list(o2[:len(o1)])


# ---------------------------------------------------------------------------
# full gated queries over a corpus containing the divergent characters
# ---------------------------------------------------------------------------

# doc-only gated queries exercised end-to-end on the unicode corpus
UNICODE_GATED = [
    "text_stats", "token_counts", "quality_score", "fingerprint_rolling",
    "fingerprint_rolling_fast", "doc_fingerprint_md5", "lang_id",
    "dedup_exact", "top_terms_by_lang", "repetition_filter",
    "unigram_commonness", "line_dedup", "pii_redact", "dup_ngram_stats",
    "dup_span_removal", "dup_ngram_stats_semijoin",
    "dup_span_removal_semijoin", "ngram_jaccard_pairs", "decontaminate",
    "corpus_split", "pack_sequences", "bigram_familiarity",
]


@pytest.fixture(scope="module")
def unicode_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("unicode_sf")
    base = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    base = base.slice(0, 60)
    nasty_rows = []
    # a duplicated 5-gram whose middle word is NBSP-joined, planted in two
    # docs (dup-ngram + jaccard paths), plus \v / EM-space / edge docs
    shared = "alpha beta gamma delta epsilon zeta common run here"
    for j, txt in enumerate([
        shared + " tail one extra words for doc",
        shared + " tail two other words in doc",
        "vtab\x0bword stays one token in this document body",
        "em space and linesep tokens flow through the engine",
        "  leading pad\ttabbed words\nnewlined words trailing  ",
        " ",
        "",
        "short one",
    ] + NASTY[:6]):
        nasty_rows.append({
            "doc_id": 100000 + j, "text": txt,
            "lang": ["en", "es"][j % 2], "source": f"src{j % 3}",
            "n_chars": len(txt) if txt is not None else 0,
        })
    extra = pa.Table.from_pylist(nasty_rows, schema=base.schema)
    pq.write_table(pa.concat_tables([base, extra]),
                   os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    return str(d), con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", UNICODE_GATED)
def test_gated_query_on_unicode_corpus(ray_session, unicode_corpus, name):
    sf_dir, con = unicode_corpus
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    res = q(sf_dir)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    got = _canon(got)
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    if len(got):
        eq = got.reset_index(drop=True).equals(want.reset_index(drop=True))
        if not eq:
            merged = got.compare(want, result_names=("ray", "duckdb"))
            raise AssertionError(f"{name}: value mismatch\n{merged.head(20)}")


def test_normalize_text_adversarial(ray_session, tmp_path):
    """Engine normalization == oracle on NBSP / vertical-tab / mixed-case
    / null / leading-trailing-run documents (the classes where Unicode
    kernels silently diverge — this op is byte-exact by construction)."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.text import SQL_TEXT_NORMALIZE, q_text_normalize
    docs = ["  Hello\t\tWORLD \n", "a b", "x\x0by", None, "",
            "MiXeD  CaSe", "\r\r lead trail \f\f", "Ꟙß İ"]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s"] * len(docs)),
        "n_chars": pa.array([len(d or "") for d in docs], type=pa.int64())})
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    got = q_text_normalize(d).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = con.execute(SQL_TEXT_NORMALIZE).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # NBSP is NOT whitespace here (RE2 class), vertical tab either
    by_id = got.set_index("doc_id")["norm_text"]
    assert by_id[1] == "a b"
    assert by_id[2] == "x\x0by"
    assert by_id[0] == "hello world"
    assert by_id[7] == "Ꟙß İ"   # non-ASCII untouched on both sides
