"""Direct parity with the reference's OWN golden input/output pairs.

The reference repo checks in (metadata JSON, payload hex, parsed JSON)
triples produced by its production Step-2 parser
(``metadata_payload_parser.py``).  These tests load the actual
``metadata_0xB888.json`` through :mod:`engine.ref_metadata` and decode the
actual ``payload_b888_input.hex`` with BOTH the scalar oracle and the
vectorized kernels, asserting every field of the reference's golden
outputs matches exactly — raw values, converted values, enum decodes,
record expansion and naming.
"""

import json
import os
import re

import numpy as np
import pyarrow as pa
import pytest

from engine.kernels import BatchView, Decoder
from engine.oracle import OracleDecoder
from engine.ref_metadata import load_metadata_json, payload_hex_to_tokens

R = "/root/reference"
GOLDENS = [
    "parsed_with_corrected_metadata.json",
    "parsed_payload_corrected.json",
    "parsed_simple_output.json",
    "output.json",
    "test_output.json",
]

needs_ref = pytest.mark.skipif(
    not os.path.exists(f"{R}/metadata_0xB888.json"),
    reason="reference goldens unavailable")


def _tokens():
    with open(f"{R}/payload_b888_input.hex") as f:
        return payload_hex_to_tokens(f.read(), 0xB888)


def _check_fields(flat: dict, golden_fields: dict):
    """Every golden field must match; enum 'decoded' compared when the
    golden has it (the golden omits UNKNOWN decodes, we always emit)."""
    mismatches = []
    for name, want in golden_fields.items():
        got_raw = flat.get(name, "<missing>")
        if got_raw != want.get("raw"):
            mismatches.append((name, "raw", got_raw, want.get("raw")))
        if "decoded" in want:
            # record fields carry their enum decode as "X (Decoded) (Record i)"
            rec_key = re.sub(r" \(Record (\d+)\)$", r" (Decoded) (Record \1)", name)
            got_dec = flat.get(f"{name} (Decoded)", flat.get(rec_key))
            if got_dec != want["decoded"]:
                mismatches.append((name, "decoded", got_dec, want["decoded"]))
    assert not mismatches, mismatches[:6]


@needs_ref
@pytest.mark.parametrize("golden", GOLDENS)
def test_oracle_reproduces_reference_goldens(golden):
    compiled = load_metadata_json(f"{R}/metadata_0xB888.json")
    o = OracleDecoder(compiled)
    toks = _tokens()
    res = o.decode_row(toks)
    assert res["error_code"] == 0
    g = json.load(open(f"{R}/{golden}"))
    assert res["version"] == g["version"]["value"]
    layout = compiled[(0xB888, res["version"])]
    assert layout.table_name == g["version"]["table"]
    _check_fields(res["flat"], g["fields"])
    assert len(g["fields"]) == g["metadata"]["fields_parsed"]


@needs_ref
def test_vectorized_kernels_reproduce_reference_goldens():
    compiled = load_metadata_json(f"{R}/metadata_0xB888.json")
    dec = Decoder(compiled)
    toks = _tokens()
    lens = np.array([len(toks)], dtype=np.int32)
    offsets = pa.array(np.array([0, len(toks)], dtype=np.int32))
    tokens = pa.ListArray.from_arrays(
        offsets, pa.array(np.asarray(toks, dtype=np.int32), type=pa.int32()))
    view = BatchView(tokens)
    cls = dec.classify(view)
    assert cls["error_code"][0] == 0
    ver = int(cls["version"][0])
    cols = dec.decode_group(view, np.array([0]), compiled[(0xB888, ver)])
    # flatten like the oracle's reference-style view
    flat = {}
    for k, arr in cols.items():
        v = arr.to_pylist()[0]
        if isinstance(v, list):
            for i, rrow in enumerate(v):
                for fk, fv in rrow.items():
                    flat[f"{fk} (Record {i})"] = fv
        else:
            flat[k] = v
    g = json.load(open(f"{R}/parsed_with_corrected_metadata.json"))
    _check_fields(flat, g["fields"])


@needs_ref
def test_multi_logcode_metadata_loads():
    compiled = load_metadata_json(f"{R}/test_metadata_multi.json")
    types = {mt for mt, _ in compiled}
    assert len(types) >= 2


@needs_ref
def test_hex_job_end_to_end_with_reference_inputs(ray_session, tmp_path):
    """The reference's OWN hex file + OWN metadata JSON through the full Ray
    pipeline: routed sink parquet carries the golden's decoded values."""
    import glob
    import pyarrow.dataset as pads
    from engine.pipeline import run_hex_job
    out = str(tmp_path / "hexjob")
    agg = run_hex_job([f"{R}/payload_b888_input.hex"],
                      f"{R}/metadata_0xB888.json", out)
    g = json.load(open(f"{R}/parsed_with_corrected_metadata.json"))
    ver = g["version"]["value"]
    files = glob.glob(f"{out}/msg_type=0xB888/version={ver}/*.parquet")
    assert len(files) == 1
    row = pads.dataset(files[0]).to_table().to_pylist()[0]
    # spot-check scalar fields + record expansion against the golden
    for name in ("Num Records", "Num Total Slots", "Num CA", "Cumulative Bitmask"):
        assert row[name] == g["fields"][name]["raw"], name
    recs = row["Records"]
    n_rec = len({k for k in g["fields"] if "(Record" in k and k.endswith("(Record 0)")})
    assert len(recs) == len({int(m.group(1)) for m in
                             (re.search(r"\(Record (\d+)\)$", k) for k in g["fields"])
                             if m})
    for i, rec in enumerate(recs):
        for fk, fv in rec.items():
            gk = f"{fk} (Record {i})"
            if fk.endswith(" (Decoded)"):
                continue
            if gk in g["fields"]:
                assert fv == g["fields"][gk]["raw"], gk
    # aggregate counts one OK row
    assert agg.num_rows == 1 and agg["n_rows"][0].as_py() == 1


def test_metadata_generation_round_trip():
    """generate_metadata_json (metadata_generator.py:59-162 format) ->
    load_metadata_json reproduces compile_catalog exactly (except
    has_bler: the reference metadata path has no post-processor)."""
    from dataclasses import replace
    from engine.catalog import compile_catalog
    from engine.ref_metadata import generate_metadata_json, load_metadata_json

    want = compile_catalog()
    got = load_metadata_json(generate_metadata_json())
    assert set(got) == set(want)
    for key in want:
        w = replace(want[key], has_bler=False)
        g = got[key]
        assert g.scalars == w.scalars, key
        assert g.records == w.records, key
        assert g.count_source == w.count_source, key
        assert (g.msg_type, g.version, g.table_name) == \
            (w.msg_type, w.version, w.table_name), key


def test_metadata_generation_single_logcode_shape():
    """Single-logcode form carries every key the reference emits."""
    from engine.ref_metadata import generate_metadata_json
    doc = generate_metadata_json(0xB888)
    assert doc["logcode_id"] == "0xB888"
    for k in ("logcode_name", "section", "description", "version_offset",
              "version_length", "version_map", "available_versions",
              "versions", "all_tables"):
        assert k in doc, k
    v1 = doc["versions"]["1"]
    assert set(v1) == {"version_value", "table_name", "direct_dependencies",
                       "fields", "total_fields"}
    assert v1["direct_dependencies"] == ["10-2"]
    at = doc["all_tables"]["10-2"]
    assert set(at) == {"fields", "field_count", "dependencies"}


def test_generated_metadata_decodes_like_builtin(ray_session, tmp_path):
    """run-hex with GENERATED metadata decodes a rendered fixture packet
    identically to the built-in catalog decode (full loop: catalog ->
    metadata JSON -> load -> vectorized decode)."""
    import glob
    import json as _json
    import pyarrow.dataset as pads
    from engine.fixtures import ensure_fixtures
    from engine.pipeline import run_hex_job
    from engine import sources
    fix = ensure_fixtures("sf0.001")
    t = pads.dataset(f"{fix}/sequences").to_table()
    o = OracleDecoder()
    toks = next(tk for tk in t["tokens"].to_pylist()
                if len(tk) >= 4 and tk[0] == 0xB888 and tk[1] == 1)
    hexfile = tmp_path / "pkt.hex"
    hexfile.write_text(sources.render_hex_packet(toks))
    from engine.ref_metadata import generate_metadata_json
    mdp = tmp_path / "gen_metadata.json"
    mdp.write_text(_json.dumps(generate_metadata_json(0xB888)))
    out = str(tmp_path / "genjob")
    run_hex_job([str(hexfile)], str(mdp), out)
    files = glob.glob(f"{out}/msg_type=0xB888/version=1/*.parquet")
    assert len(files) == 1
    row = pads.dataset(files[0]).to_table().to_pylist()[0]
    ref = o.decode_row(toks)
    for k, v in ref["fields"].items():
        if k.endswith("(Decoded)") or k in ("BLER", "Residual BLER"):
            continue  # BLER post-processing is CLI-path-only (documented)
        assert row[k] == v or (row[k] is None and v is None), k
