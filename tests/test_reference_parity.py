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
