"""Property-based tests (hypothesis): vectorized kernels vs scalar oracle
over adversarial (offset, length, payload) grids, plus edge-case batches."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from engine.kernels import BatchView, Decoder, gather_bits
from engine.oracle import OracleDecoder, extract_bits


def _mk_batch(rows):
    lens = np.array([len(r) for r in rows], dtype=np.int32)
    offsets = np.zeros(len(rows) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    values = (np.concatenate([np.asarray(r, dtype=np.int32) for r in rows])
              if offsets[-1] else np.array([], dtype=np.int32))
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(values, type=pa.int32()))


@settings(max_examples=200, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=64),
    off=st.integers(min_value=0, max_value=520),
    ln=st.integers(min_value=1, max_value=64),
)
def test_gather_bits_equals_reference_extract(payload, off, ln):
    """gather_bits == metadata_payload_parser._extract_bits semantics for
    every in-bounds (offset, length), including word-straddling windows."""
    pad_to_words = payload + bytes((-len(payload)) % 4)
    toks = [0, 0, 0, 0] + list(np.frombuffer(pad_to_words, dtype=np.int32))
    view = BatchView(_mk_batch([toks]))
    got = gather_bits(view.pad, view.payload_start.copy(), off, ln)
    want = extract_bits(pad_to_words, off, ln)
    end_byte = (off + ln + 7) // 8
    if end_byte <= len(pad_to_words):
        assert int(got[0]) == want


@settings(max_examples=50, deadline=None)
@given(data=st.data())
def test_random_rows_decode_like_oracle(data):
    """Random token rows (valid header, arbitrary payload) decode identically
    in the vectorized and scalar paths — including truncated payloads."""
    dec = Decoder()
    o = OracleDecoder()
    keys = sorted(dec.compiled)
    mt, ver = data.draw(st.sampled_from(keys))
    n_words = data.draw(st.integers(min_value=0, max_value=40))
    payload = data.draw(st.lists(
        st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1),
        min_size=n_words, max_size=n_words))
    toks = [mt, ver, 0, 0] + payload
    ref = o.decode_row(toks)
    view = BatchView(_mk_batch([toks]))
    cols = dec.decode_group(view, np.array([0]), dec.compiled[(mt, ver)])
    def eq(a, b):
        if a is None or b is None:
            return a is None and b is None
        if isinstance(a, float) and isinstance(b, float) and np.isnan(a) and np.isnan(b):
            return True
        return a == b

    for k, v in ref["fields"].items():
        got = cols[k].to_pylist()[0]
        assert eq(got, v), (hex(mt), ver, k, got, v)
    for rname, rrows in ref["records"].items():
        got_list = cols[rname].to_pylist()[0]
        assert len(got_list) == len(rrows)
        for got_r, want_r in zip(got_list, rrows):
            assert set(got_r) == set(want_r)
            for k in got_r:
                assert eq(got_r[k], want_r[k]), (hex(mt), ver, rname, k)


def test_empty_and_all_dead_letter_batches():
    dec = Decoder()
    # empty batch
    view = BatchView(_mk_batch([]))
    cls = dec.classify(view)
    assert len(cls["error_code"]) == 0
    # all rows dead letters (short header / unknown type)
    rows = [[], [1], [0xDEAD, 1, 2, 3, 4]]
    view = BatchView(_mk_batch(rows))
    cls = dec.classify(view)
    assert (cls["error_code"] != 0).all()
    assert list(cls["error_code"]) == [1, 1, 2]


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_string_field_straddling_payload_end(data):
    """M12 String kernel vs oracle over (content, exact payload end)
    grids: the 12-byte window cut mid multi-byte utf-8 character at the
    clamp point, NULs inside the window, invalid bytes (hex fallback),
    and every truncation of the payload including 0 (VERDICT r2 #10)."""
    dec = Decoder()
    o = OracleDecoder()
    name = data.draw(st.one_of(
        # multi-byte utf-8 content: 2-, 3- and 4-byte sequences
        st.text(alphabet="A zé√ÿ\U0001d11e中",
                max_size=8).map(lambda s: s.encode("utf-8")),
        st.binary(max_size=14),           # arbitrary (often invalid) bytes
    ))[:12]
    body = name + bytes(12 - len(name)) + (1234).to_bytes(2, "little") + b"\x07"
    body += bytes((-len(body)) % 4)
    toks = [0x7F01, 1, 0, 0] + list(np.frombuffer(body, dtype=np.int32))
    exact = data.draw(st.integers(min_value=0, max_value=len(body)))

    ref = o.decode_row(toks, payload_nbytes=exact)
    view = BatchView(_mk_batch([toks]), exact_nbytes=np.array([exact]))
    cols = dec.decode_group(view, np.array([0]), dec.compiled[(0x7F01, 1)])
    for k, v in ref["fields"].items():
        got = cols[k].to_pylist()[0]
        assert got == v or (got is None and v is None), \
            (k, got, v, exact, name)


# word alphabet engineered for shingle/bucket collisions: few distinct
# words, plus a Unicode NBSP-bearing token (RE2-\S+ vs Unicode-\s trap)
_DEDUP_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "x1",
                "nb sp", "z"]


def _dedup_corpus(data) -> list:
    """Random doc list with planted exact dups, near-dups, empty and
    short (<3 words) docs — the shapes that stress exact-collapse, cap
    and short-doc fallback in both bucket-stage implementations."""
    docs = []
    n_base = data.draw(st.integers(min_value=1, max_value=6))
    next_id = 0
    for _ in range(n_base):
        words = data.draw(st.lists(st.sampled_from(_DEDUP_WORDS),
                                   min_size=0, max_size=12))
        text = " ".join(words)
        docs.append((next_id, text)); next_id += 1
        for _ in range(data.draw(st.integers(min_value=0, max_value=3))):
            kind = data.draw(st.sampled_from(["exact", "near"]))
            if kind == "exact":
                docs.append((next_id, text))
            else:
                docs.append((next_id, text + " " + data.draw(
                    st.sampled_from(_DEDUP_WORDS))))
            next_id += 1
    return docs


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_bucket_exchange_paths_equal_random(ray_session, tmp_path_factory,
                                            data):
    """MinHash-LSH and SimHash: the vectorized hash-exchange bucket stage
    must emit the IDENTICAL pair table as the per-group map_groups oracle
    on random corpora with exact dups, near-dups, empty and short docs
    (the class of boundary bug this guards: the round-4 triu-template
    slice that silently dropped in-bucket pairs)."""
    import pyarrow.parquet as pq
    from engine.dedup import q_dedup_minhash_lsh, q_dedup_simhash

    docs = _dedup_corpus(data)
    d = tmp_path_factory.mktemp("bexp")
    t = pa.table({
        "doc_id": pa.array([i for i, _ in docs], type=pa.int64()),
        "text": pa.array([s for _, s in docs]),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["web"] * len(docs)),
        "n_chars": pa.array([len(s) for _, s in docs], type=pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    a = q_dedup_minhash_lsh(str(d), method="hash").to_pandas()
    b = q_dedup_minhash_lsh(str(d), method="mapgroups").to_pandas()
    assert a.equals(b), (a, b)
    sa = q_dedup_simhash(str(d), method="hash").to_pandas()
    sb = q_dedup_simhash(str(d), method="mapgroups").to_pandas()
    assert sa.equals(sb), (sa, sb)
