"""Raw hex-text ingestion parity + JSON export parity tests."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from engine import sources
from engine.oracle import OracleDecoder

REF_HEX = "/root/reference/hex_decoder_module/sample_input.hex"
REF_HEX2 = "/root/reference/hex_decoder_module/test_0x1c07.hex"


def test_parse_reference_golden_hex_files():
    """The reference's own golden inputs parse: header fields per
    decoder/header_decoder.py:13-19, version word per icd_query.py:114-115."""
    # version = full u32 LE at payload offset 0 (cf. metadata_0xB888.json
    # version keys like '65537' = 0x00010001)
    for path, want_logcode, want_version in [
            (REF_HEX, 0xB823, 0x00030002), (REF_HEX2, 0x1C07, 0x00020001)]:
        if not os.path.exists(path):
            pytest.skip("reference goldens unavailable")
        with open(path) as f:
            blocks = sources.split_packets(f.read())
        assert len(blocks) == 1
        p = sources.parse_hex_packet(blocks[0])
        assert p["error"] in (sources.INGEST_OK, sources.INGEST_LENGTH_MISMATCH)
        toks = sources.packet_to_tokens(p["header"], p["payload"])
        assert toks[0] == want_logcode
        assert toks[1] == want_version


def test_hex_roundtrip_fixture_rows(sf_small):
    """render -> parse round trip preserves token arrays exactly."""
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    checked = 0
    for toks in t["tokens"].to_pylist()[:200]:
        if len(toks) < 4:
            continue
        text = sources.render_hex_packet(toks)
        p = sources.parse_hex_packet(text)
        assert p["error"] == sources.INGEST_OK
        back = sources.packet_to_tokens(p["header"], p["payload"])
        assert back == toks
        checked += 1
    assert checked > 150


def test_read_hex_packets_dataset(ray_session, sf_small, tmp_path):
    """Multi-packet hex file -> sequences-shaped Dataset, incl. malformed."""
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    rows = [tk for tk in t["tokens"].to_pylist()[:20] if len(tk) >= 4][:10]
    content = "\n".join(sources.render_hex_packet(tk) for tk in rows)
    content += "\nLength: 7\nHeader: ZZ\nPayload:\n00\n"  # malformed block
    f = tmp_path / "packets.hex"
    f.write_text(content)
    ds = sources.read_hex_packets(str(f))
    out = ds.to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(out) == 11
    ok = out[out.ingest_error == sources.INGEST_OK]
    assert len(ok) == 10
    got = {list(r) and tuple(r) for r in ok["tokens"].map(list)}
    assert got == {tuple(r) for r in rows}
    assert (out[out.ingest_error != 0]["n_tok"] == 0).all()


def test_json_export_matches_oracle(ray_session, sf_small, tmp_path):
    """Nested JSON view (metadata_payload_parser.py:127-140 shape) agrees
    with the oracle's flattened '(Record i)' view field-for-field."""
    import ray
    from engine.export import json_stage, write_pretty, append_jsonl
    ds = ray.data.read_parquet(f"{sf_small}/sequences").limit(300)
    out = json_stage(ds).to_pandas()
    o = OracleDecoder()
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    toks_by_doc = dict(zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()))
    checked = 0
    for doc, js in zip(out["doc_id"], out["json"]):
        ref = o.decode_row(toks_by_doc[doc])
        if ref["error_code"] != 0:
            assert js is None
            continue
        doc_json = json.loads(js)
        assert doc_json["logcode_id"] == f"0x{ref['msg_type']:04X}"
        assert doc_json["version"]["value"] == ref["version"]
        for k, v in ref["flat"].items():
            if " (Decoded)" in k:
                base = k.replace(" (Decoded)", "")  # incl. "X (Decoded) (Record i)"
                assert doc_json["fields"][base]["decoded"] == v, (doc, k)
            else:
                got = doc_json["fields"][k]["raw"]
                assert got == v or (got is None and v is None), (doc, k, got, v)
        checked += 1
    assert checked > 200
    # file-writer parity helpers
    d = json.loads(out["json"].dropna().iloc[0])
    write_pretty(d, str(tmp_path / "one.json"))
    append_jsonl(d, str(tmp_path / "all.jsonl"))
    assert json.load(open(tmp_path / "one.json")) == d


def test_salted_aggregate_equals_plain(ray_session, sf_small):
    import ray
    from engine import stages
    parsed = stages.parse_stage(ray.data.read_parquet(f"{sf_small}/sequences"))
    a = stages.aggregate_salted(parsed, salt_buckets=8).to_pandas()
    o = OracleDecoder()
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    want = o.aggregate(t.to_pylist())
    got = {(r.source, r.msg_type): (int(r.n_rows), int(r.sum_n_tok))
           for r in a.itertuples()}
    assert got == want


def test_hex_exact_payload_length_semantics(ray_session, tmp_path):
    """Non-word-aligned hex payload: the token row is zero-padded to a word
    boundary, but validity/fits must use the TRUE byte length (reference
    metadata_payload_parser available_bytes).  Regression: a trailing field
    inside the pad decoded as 0 instead of null, and the record clamp
    admitted one extra record."""
    from engine.pipeline import run_hex_job
    md = {
        "logcode_id": "0x7A7A", "logcode_name": "PadTest",
        "version_offset": 0, "version_length": 32,
        "versions": {"1": {"table_name": "9-0", "fields": [
            {"name": "A", "type_name": "Uint8", "offset_bytes": 0,
             "offset_bits": 0, "length_bits": 8, "count": None,
             "enum_mappings": None},
            {"name": "Tail", "type_name": "Uint16", "offset_bytes": 4,
             "offset_bits": 0, "length_bits": 16, "count": None,
             "enum_mappings": None},
            {"name": "Recs", "type_name": "Table 9-1", "offset_bytes": 1,
             "offset_bits": 0, "length_bits": 0, "count": 3,
             "enum_mappings": None},
        ]}},
        "all_tables": {"9-1": {"fields": [
            {"name": "V", "type_name": "Uint16", "offset_bytes": 0,
             "offset_bits": 0, "length_bits": 16, "count": None,
             "enum_mappings": None},
        ]}},
    }
    mdp = str(tmp_path / "pad_metadata.json")
    with open(mdp, "w") as f:
        json.dump(md, f)
    # payload = 4-byte version word + 5 body bytes (NOT word-aligned):
    # Tail needs body bytes [4:6] -> only byte 4 exists -> null;
    # Recs (2-byte records from offset 1): fits = (5-1)//2 = 2, not
    # (8-1)//2 = 3 under the padded length
    hexfile = tmp_path / "pad.hex"
    hexfile.write_text(
        "Length: 21\n"
        "Header: 15 00 7A 7A 01 00 00 00 02 00 00 00\n"
        "Payload:\n01 00 00 00 AA BB CC DD EE\n")

    # ingestion carries the exact body length
    ds = sources.read_hex_packets([str(hexfile)])
    row = ds.take_all()[0]
    assert row["payload_nbytes"] == 5
    assert row["n_tok"] == 6  # 4 header tokens + 2 padded words

    out = str(tmp_path / "padjob")
    run_hex_job([str(hexfile)], mdp, out)
    sink = pads.dataset(glob.glob(f"{out}/msg_type=0x7A7A/version=1/*.parquet"))
    r = sink.to_table().to_pylist()[0]
    assert r["A"] == 0xAA
    assert r["Tail"] is None
    assert len(r["Recs"]) == 2
    assert [x["V"] for x in r["Recs"]] == [0xCCBB, 0xEEDD]

    # scalar oracle agrees field-for-field under the same exact length
    from engine.ref_metadata import load_metadata_json, payload_hex_to_row
    o = OracleDecoder(load_metadata_json(mdp))
    toks, nb = payload_hex_to_row(hexfile.read_text(), 0x7A7A)
    assert nb == 5
    res = o.decode_row(toks, payload_nbytes=nb)
    assert res["fields"]["A"] == 0xAA and res["fields"]["Tail"] is None
    assert len(res["records"]["Recs"]) == 2
    assert [x["V"] for x in res["records"]["Recs"]] == [0xCCBB, 0xEEDD]


def test_version_fallback_mode_hex_path(ray_session, tmp_path):
    """Strict vs fallback (reference version_resolver.py:46-50): an unknown
    version of a known logcode dead-letters under the strict metadata-path
    semantics but decodes with the logcode's FIRST table under fallback,
    keeping the raw version value in the envelope."""
    from engine.pipeline import run_hex_job
    md = {
        "logcode_id": "0x9999", "logcode_name": "FbTest",
        "version_offset": 0, "version_length": 32,
        "versions": {
            "1": {"table_name": "t1", "fields": [
                {"name": "Status", "type_name": "Uint8", "offset_bytes": 0,
                 "offset_bits": 0, "length_bits": 8, "count": None,
                 "enum_mappings": None}]},
            "2": {"table_name": "t2", "fields": [
                {"name": "Other", "type_name": "Uint16", "offset_bytes": 0,
                 "offset_bits": 0, "length_bits": 16, "count": None,
                 "enum_mappings": None}]},
        },
        "all_tables": {},
    }
    mdp = str(tmp_path / "fb_metadata.json")
    with open(mdp, "w") as f:
        json.dump(md, f)
    # version word 7 (unknown); one payload word 0x000000AA
    hexfile = tmp_path / "fb.hex"
    hexfile.write_text(
        "Length: 20\n"
        "Header: 14 00 99 99 01 00 00 00 02 00 00 00\n"
        "Payload:\n07 00 00 00 AA 00 00 00\n")

    strict_out = str(tmp_path / "strict")
    run_hex_job([str(hexfile)], mdp, strict_out)
    with open(os.path.join(strict_out, "sink_counts.json")) as f:
        assert json.load(f) == {"dead_letter": 1}

    fb_out = str(tmp_path / "fb")
    run_hex_job([str(hexfile)], mdp, fb_out, version_fallback=True)
    with open(os.path.join(fb_out, "sink_counts.json")) as f:
        assert json.load(f) == {"0x9999": 1}
    files = glob.glob(f"{fb_out}/msg_type=0x9999/version=1/*.parquet")
    assert len(files) == 1
    row = pads.dataset(files[0]).to_table().to_pylist()[0]
    assert row["Status"] == 0xAA      # decoded with the FIRST table (t1)
    assert row["version"] == 7        # raw version preserved


def test_decode_cli_one_shot_json(ray_session, tmp_path, capsys):
    """Entry-point-A parity (hex_decoder_module/cli.py): one hex packet ->
    reference-shaped pretty JSON with decode metadata; many packets ->
    JSONL; undecodable packets -> error records."""
    from engine.fixtures import ensure_fixtures
    from engine.job import main
    fix = ensure_fixtures("sf0.001")
    t = pads.dataset(f"{fix}/sequences").to_table()
    toks = next(tk for tk in t["tokens"].to_pylist()
                if len(tk) >= 4 and tk[0] == 0x3A11 and tk[1] == 1)
    one = tmp_path / "one.hex"
    one.write_text(sources.render_hex_packet(toks))
    outp = tmp_path / "one.json"
    assert main(["decode", "--input", str(one), "--out", str(outp)]) == 0
    capsys.readouterr()
    doc = json.loads(outp.read_text())
    assert doc["logcode_id"] == "0x3A11"
    o = OracleDecoder()
    ref = o.decode_row(toks)
    for k, v in ref["fields"].items():
        if k.endswith("(Decoded)"):
            assert doc["fields"][k[:-len(" (Decoded)")]]["decoded"] == v
        else:
            assert doc["fields"][k]["raw"] == v, k
    assert doc["metadata"]["fields_parsed"] == len(
        [k for k in doc["fields"]])
    assert "decode_time_ms" in doc["metadata"]

    # multi-packet + one malformed -> JSONL with an error record
    toks2 = next(tk for tk in t["tokens"].to_pylist()
                 if len(tk) >= 4 and tk[0] == 0x2001 and tk[1] == 1)
    many = tmp_path / "many.hex"
    many.write_text(sources.render_hex_packet(toks)
                    + "\n" + sources.render_hex_packet(toks2)
                    + "\nLength: 5\nHeader: ZZ\nPayload:\n00\n")
    outl = tmp_path / "many.jsonl"
    assert main(["decode", "--input", str(many), "--out", str(outl)]) == 0
    capsys.readouterr()
    lines = [json.loads(x) for x in outl.read_text().strip().splitlines()]
    assert len(lines) == 3
    assert {d.get("logcode_id") for d in lines if "logcode_id" in d} == \
        {"0x3A11", "0x2001"}
    assert any("error" in d for d in lines)


def test_jsonl_corpus_round_trip(ray_session, tmp_path):
    """documents.parquet -> JSONL shards -> parquet dir: gated queries
    produce identical tables on the round-tripped corpus (embedded
    newlines/tabs in text survive the interchange)."""
    from engine.io import export_jsonl_corpus, import_jsonl_corpus
    from engine import extras

    sf = "/root/testdata/sf0.001"
    jl = tmp_path / "jl"
    back = tmp_path / "back"
    back.mkdir()
    export_jsonl_corpus(sf, str(jl))
    assert list(jl.glob("*.json")), "no JSONL shards written"
    import_jsonl_corpus(str(jl), str(back))

    for name in ("text_stats", "corpus_split", "line_dedup"):
        a = extras.EXTRA_QUERIES[name](sf)
        b = extras.EXTRA_QUERIES[name](str(back))
        da = (a.to_pandas() if hasattr(a, "to_pandas") else a)
        db = (b.to_pandas() if hasattr(b, "to_pandas") else b)
        da = da[sorted(da.columns)].sort_values(
            list(sorted(da.columns)), ignore_index=True)
        db = db[sorted(db.columns)].sort_values(
            list(sorted(db.columns)), ignore_index=True)
        assert da.astype(object).equals(db.astype(object)), name


def test_corpus_cli_round_trip(ray_session, tmp_path):
    """`engine.job corpus export-jsonl` then `import-jsonl` reproduce the
    documents table exactly (the CLI surface over engine.io)."""
    import duckdb
    from engine.job import main

    jl = tmp_path / "jl"
    back = tmp_path / "back"
    back.mkdir()
    assert main(["corpus", "export-jsonl", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", str(jl)]) == 0
    assert main(["corpus", "import-jsonl", "--src", str(jl),
                 "--out", str(back)]) == 0
    n, lo, hi = duckdb.sql(
        f"select count(*), min(doc_id), max(doc_id) "
        f"from '{back}/documents.parquet/*.parquet'").fetchall()[0]
    assert (n, lo, hi) == (500, 0, 499)
