"""Load REFERENCE-format metadata JSON into compiled decode layouts.

A user of the reference carries per-logcode metadata JSON files compiled
from the ICD PDF (Step 1 of its production flow,
``hex_decoder_module/metadata_cli.py``; format per
``export/metadata_generator.py:59-162``, instance ``metadata_0xB888.json``).
This module loads those files directly into this engine's
``CompiledLayout`` form, so both the scalar oracle and the vectorized Ray
kernels decode against the user's OWN metadata — verified bit-exact
against the reference's own checked-in golden outputs
(``tests/test_reference_parity.py``: 33/33 fields of
``parsed_with_corrected_metadata.json`` et al. from
``metadata_0xB888.json`` + ``payload_b888_input.hex``).

Semantics mapped (metadata_payload_parser.py):
* version word at ``(version_offset, version_length)`` — in the token
  domain the version word is header token [1] and the payload excludes it,
  so metadata field offsets (which are relative to after-version,
  ``:88``) carry over unchanged;
* repeating structures: Table-typed field WITH a count (``:96-99``);
  Table-typed without count decodes as a plain uint fallback
  (``decoder/field_decoder.py:95-103``);
* valid-field filter + record size from valid fields (``:186-211``);
* fixed vs dynamic counts with the Num CA/Num Records/bitmask priority
  (``:241-287``);
* enum_mappings are str-keyed ints (``:305-308``).
"""

from __future__ import annotations

import json
import re
from typing import Dict, Tuple

from engine.catalog import CompiledLayout, RecordSpec, ScalarSpec

_TABLE_RE = re.compile(r"Table\s+(\d+-\d+)", re.IGNORECASE)


def _enum_of(field: dict):
    em = field.get("enum_mappings")
    if not em:
        return None
    return {int(k): v for k, v in em.items()}


def _scalar(field: dict, extra_off_bits: int = 0) -> ScalarSpec:
    return ScalarSpec(
        name=field["name"], type_name=field["type_name"],
        abs_off_bits=field["offset_bytes"] * 8 + field["offset_bits"] + extra_off_bits,
        length_bits=field["length_bits"], enum=_enum_of(field))


def _valid_fields(fields: list) -> list:
    valid, max_off = [], 0
    for f in fields:
        off = f["offset_bytes"] * 8 + f["offset_bits"]
        nm = f["name"].lower()
        if off == 0 and max_off > 0:
            continue
        if "dummy" in nm or "padding" in nm:
            continue
        valid.append(f)
        max_off = max(max_off, off)
    return valid


def load_metadata_json(path_or_dict, msg_type: int | None = None
                       ) -> Dict[Tuple[int, int], CompiledLayout]:
    """Compile one reference metadata JSON (single- or multi-logcode)."""
    md = path_or_dict
    if not isinstance(md, dict):
        with open(path_or_dict) as f:
            md = json.load(f)
    out: Dict[Tuple[int, int], CompiledLayout] = {}
    entries = (md["logcodes"].items() if "logcodes" in md
               else [(md["logcode_id"], md)])
    for lc_id, lc in entries:
        mt = int(lc_id, 16) if isinstance(lc_id, str) else int(lc_id)
        if msg_type is not None and mt != msg_type:
            continue
        assert lc.get("version_offset", 0) == 0 and lc.get("version_length", 32) == 32, \
            "token-domain mapping assumes the standard 32-bit version word at offset 0"
        for vstr, vm in lc["versions"].items():
            ver = int(vstr)
            scalars, records = [], []
            for field in vm["fields"]:
                tm = _TABLE_RE.search(field.get("type_name", ""))
                if tm and field.get("count"):
                    ref = lc.get("all_tables", {}).get(tm.group(1))
                    if not ref or not ref.get("fields"):
                        continue
                    valid = _valid_fields(ref["fields"])
                    if not valid:
                        continue
                    size_bits = max(f["offset_bytes"] * 8 + f["offset_bits"]
                                    + f["length_bits"] for f in valid)
                    records.append(RecordSpec(
                        name=field["name"], table_name=tm.group(1),
                        base_offset_bytes=field["offset_bytes"],
                        count=field["count"],
                        record_size_bytes=(size_bits + 7) // 8,
                        fields=[_scalar(f) for f in valid]))
                else:
                    scalars.append(_scalar(field))
            names = {s.name for s in scalars}
            csrc = next((c for c in ("Num CA", "Num Records", "Cumulative Bitmask")
                         if c in names), None)
            out[(mt, ver)] = CompiledLayout(
                msg_type=mt, msg_name=lc.get("logcode_name", f"0x{mt:04X}"),
                version=ver, table_name=vm.get("table_name", ""),
                scalars=scalars, records=records, count_source=csrc,
                has_bler=False)  # post-processing is cli-path only; the
                                 # metadata production path has none
    return out


def generate_metadata_json(msg_type: int | None = None, cat=None) -> dict:
    """Emit a REFERENCE-format metadata document from the catalog — the
    inverse of :func:`load_metadata_json`, matching
    ``export/metadata_generator.py:59-162`` field-for-field (single
    logcode when ``msg_type`` is given, else the multi-logcode
    ``{"logcodes": {...}}`` form of ``metadata_cli.py`` multi mode).

    Round-trip contract (tested): ``load_metadata_json(
    generate_metadata_json())`` reproduces ``compile_catalog()`` exactly,
    except ``has_bler`` — the reference's metadata production path has no
    post-processor, so BLER derivation is CLI-path-only there too."""
    from engine.catalog import build_catalog, version_sort_key
    cat = cat or build_catalog()

    def field_dict(f) -> dict:
        d = {"name": f.name, "type_name": f.type_name,
             "offset_bytes": f.offset_bytes, "offset_bits": f.offset_bits,
             "length_bits": f.length_bits, "description": f.description}
        if f.count is not None:
            d["count"] = f.count
        if f.enum:
            d["enum_mappings"] = {str(k): v for k, v in f.enum.items()}
        return d

    def deps_of(fields) -> list:
        return [f.type_name[len("Table "):] for f in fields
                if f.type_name.startswith("Table ")]

    def one(mt, lc) -> dict:
        versions = {}
        for ver, tname in lc.version_map.items():
            fields = lc.tables[tname]
            versions[str(ver)] = {
                "version_value": ver, "table_name": tname,
                "direct_dependencies": deps_of(fields),
                "fields": [field_dict(f) for f in fields],
                "total_fields": len(fields),
            }
        all_tables = {
            tname: {"fields": [field_dict(f) for f in fields],
                    "field_count": len(fields),
                    "dependencies": deps_of(fields)}
            for tname, fields in lc.tables.items()
        }
        return {
            "logcode_id": f"0x{mt:04X}", "logcode_name": lc.name,
            "section": "", "description": "",
            "version_offset": 0, "version_length": 32,
            "version_map": {str(v): t for v, t in lc.version_map.items()},
            "available_versions": sorted((str(v) for v in lc.version_map),
                                         key=version_sort_key),
            "versions": versions, "all_tables": all_tables,
        }

    if msg_type is not None:
        return one(msg_type, cat[msg_type])
    return {"logcodes": {f"0x{mt:04X}": one(mt, lc)
                         for mt, lc in sorted(cat.items())}}


def payload_hex_to_row(payload_hex: str, msg_type: int) -> Tuple[list, int]:
    """Payload-only hex (reference Step-2 input) -> ``(token row, true body
    byte length)``: version word becomes header token [1], remaining bytes
    become payload words (zero-padded to a word boundary in the token
    domain).  The second element is ``len(payload) - 4`` EXACTLY — feed it
    to ``BatchView(exact_nbytes=...)`` / a ``payload_nbytes`` column so
    validity and record-fit clamps match the reference's available_bytes
    check on non-word-aligned payloads."""
    import numpy as np
    m = re.search(r"Payload:\s*([0-9A-Fa-f\s\n]+?)(?:\n\n|\Z)", payload_hex,
                  re.IGNORECASE | re.DOTALL)
    if m:  # full Length/Header/Payload file: extract the payload section,
        # exactly parse_payload_from_file.py:17-41
        payload_hex = m.group(1)
    b = bytes.fromhex(re.sub(r"\s+", "", payload_hex))
    version = int.from_bytes(b[0:4], "little") if len(b) >= 4 else 0
    body = b[4:]
    nbytes = len(body)
    body += bytes((-len(body)) % 4)
    words = np.frombuffer(body, dtype="<i4")

    def as_i32(v):
        return v - (1 << 32) if v >= (1 << 31) else v
    toks = [as_i32(msg_type), as_i32(version), 0, 0] + [int(w) for w in words]
    return toks, nbytes


def payload_hex_to_tokens(payload_hex: str, msg_type: int) -> list:
    """Token row only — see :func:`payload_hex_to_row` for the exact-length
    variant used by the decode path."""
    return payload_hex_to_row(payload_hex, msg_type)[0]
