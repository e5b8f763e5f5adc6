"""Single-process reference-semantics oracle (pytest ground truth).

Implements the reference's production decode path scalar-by-scalar, exactly:

* bit extraction: little-endian byte-window shift+mask
  (``metadata_payload_parser.py:318-352``; ``utils/byte_ops.py:31-66``);
* field-beyond-payload -> field is null, parsing continues
  (``metadata_payload_parser.py:344-346`` raising, caught at ``:118-124``);
* signed ints: two's complement at field bit width
  (``metadata_payload_parser.py:362-368``; ``utils/type_converters.py:88-111``);
* floats: raw-bit reinterpret, IEEE-754 LE (``metadata_payload_parser.py:370-383``);
* enums: friendly string, ``UNKNOWN(<v>)`` default (``utils/type_converters.py:81-85``);
* repeating records: record size from valid fields, logical count from the
  fixed ``count`` or the Num CA -> Num Records -> popcount(Cumulative
  Bitmask) -> 1 priority, clamped to ``min(logical, fits_in_payload)``
  (``metadata_payload_parser.py:206-254``; ``decoder/payload_decoder.py:162-241``);
* flattened record naming ``"<field> (Record <i>)"``
  (``decoder/payload_decoder.py:201``);
* BLER/Residual-BLER derived fields for msg_type 0xB888, global and
  per-record (``decoder/field_post_processor.py:41-148``); percentages are
  rounded half-even to 2 decimals on the ``x*100`` basis (numpy-compatible
  restatement of the reference's ``round(pct, 2)``) with friendly strings
  ``f"{pct:.2f}%"``;
* version resolution is strict like the metadata path: unknown version is an
  error (``metadata_payload_parser.py:80-85``), not the first-table fallback
  of ``decoder/version_resolver.py:46-50`` (documented divergence: we follow
  the production Step-2 path).

Error taxonomy (columns, not exceptions — cf. models/errors.py:6-75):
OK=0, TOO_SHORT_HEADER=1 (n_tok < 4, ``PayloadTooShortError``),
UNKNOWN_MSG_TYPE=2 (``LogcodeNotFoundError``), UNKNOWN_VERSION=3
(``VersionNotFoundError``).
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from engine.catalog import (
    CompiledLayout, HEADER_TOKENS, RecordSpec, ScalarSpec, compile_catalog,
)

ERR_OK = 0
ERR_TOO_SHORT_HEADER = 1
ERR_UNKNOWN_MSG_TYPE = 2
ERR_UNKNOWN_VERSION = 3

ERROR_NAMES = {
    ERR_OK: "OK",
    ERR_TOO_SHORT_HEADER: "TOO_SHORT_HEADER",
    ERR_UNKNOWN_MSG_TYPE: "UNKNOWN_MSG_TYPE",
    ERR_UNKNOWN_VERSION: "UNKNOWN_VERSION",
}


def round2(x: float) -> float:
    """Round-half-even to 2 decimals on the x*100 basis (np.round-compatible)."""
    return float(np.round(x, 2))


def extract_bits(payload: bytes, offset_bits: int, length_bits: int) -> Optional[int]:
    """LE window shift+mask per metadata_payload_parser.py:318-352.

    Returns None when the field extends beyond the payload (the reference
    raises and the caller records an error entry and continues).
    """
    start_byte = offset_bits // 8
    end_byte = (offset_bits + length_bits + 7) // 8
    if end_byte > len(payload):
        return None
    value = int.from_bytes(payload[start_byte:end_byte], byteorder="little")
    value >>= offset_bits % 8
    value &= (1 << length_bits) - 1
    return value


def convert_value(raw: int, type_name: str, length_bits: int) -> Any:
    """Type conversion per metadata_payload_parser.py:354-385."""
    if type_name.startswith("Int"):
        if raw & (1 << (length_bits - 1)):
            return raw - (1 << length_bits)
        return raw
    if type_name == "Float32" and length_bits == 32:
        return struct.unpack("<f", struct.pack("<I", raw))[0]
    if type_name == "Float64" and length_bits == 64:
        return struct.unpack("<d", struct.pack("<Q", raw))[0]
    if type_name == "Bool":
        return bool(raw)
    return raw


class OracleDecoder:
    """Decode one row at a time with reference semantics."""

    def __init__(self, compiled: Optional[Dict[Tuple[int, int], CompiledLayout]] = None):
        self.compiled = compiled or compile_catalog()
        self.known_types = {mt for (mt, _v) in self.compiled}

    # -- parse (header) -----------------------------------------------------
    def parse_row(self, tokens: List[int]) -> Dict[str, Any]:
        if len(tokens) < HEADER_TOKENS:
            return {"msg_type": None, "version": None, "seq": None, "ts": None,
                    "error_code": ERR_TOO_SHORT_HEADER}
        mt, ver, seq, ts = tokens[0], tokens[1], tokens[2], tokens[3]
        if mt not in self.known_types:
            err = ERR_UNKNOWN_MSG_TYPE
        elif (mt, ver) not in self.compiled:
            err = ERR_UNKNOWN_VERSION
        else:
            err = ERR_OK
        return {"msg_type": mt, "version": ver, "seq": seq, "ts": ts, "error_code": err}

    # -- decode -------------------------------------------------------------
    def _decode_scalar(self, payload: bytes, s: ScalarSpec, extra_off_bits: int = 0):
        if s.type_name == "String":
            # exact decode_string semantics (utils/type_converters.py:114-141)
            off = (s.abs_off_bits + extra_off_bits) // 8
            length = s.length_bits // 8
            if off + length > len(payload):
                length = len(payload) - off
            rb = payload[off:off + length] if length > 0 else b""
            nul = rb.find(b"\x00")
            if nul != -1:
                rb = rb[:nul]
            try:
                return rb.decode("utf-8"), None
            except UnicodeDecodeError:
                return rb.hex(), None
        raw = extract_bits(payload, s.abs_off_bits + extra_off_bits, s.length_bits)
        if raw is None:
            return None, None
        val = convert_value(raw, s.type_name, s.length_bits)
        friendly = None
        if s.enum is not None:
            friendly = s.enum.get(raw, f"UNKNOWN({raw})")
        return val, friendly

    def _logical_count(self, rec: RecordSpec, layout: CompiledLayout,
                       scalar_vals: Dict[str, Any]) -> int:
        if rec.count != -1:
            return rec.count
        # priority per payload_decoder.py:211-241
        if "Num CA" in scalar_vals:
            v = scalar_vals["Num CA"]
            return int(v) if v is not None else 0
        if "Num Records" in scalar_vals:
            v = scalar_vals["Num Records"]
            return int(v) if v is not None else 0
        if "Cumulative Bitmask" in scalar_vals:
            v = scalar_vals["Cumulative Bitmask"]
            return bin(int(v)).count("1") if v is not None else 0
        return 1

    def decode_row(self, tokens: List[int],
                   payload_nbytes: Optional[int] = None) -> Dict[str, Any]:
        """Full decode of one OK row; returns fields, records, and the
        flattened reference-style view.

        ``payload_nbytes``: true body byte length for non-word-aligned
        sources (hex ingest pads tokens to a word boundary); the reference
        checks field end_byte against ``len(payload)`` exactly."""
        parsed = self.parse_row(tokens)
        out: Dict[str, Any] = dict(parsed)
        if parsed["error_code"] != ERR_OK:
            out.update({"fields": {}, "records": {}, "flat": {}})
            return out

        layout = self.compiled[(parsed["msg_type"], parsed["version"])]
        payload = np.asarray(tokens[HEADER_TOKENS:], dtype=np.int32).tobytes()
        if payload_nbytes is not None and 0 <= payload_nbytes <= len(payload):
            payload = payload[:payload_nbytes]

        fields: Dict[str, Any] = {}
        for s in layout.scalars:
            val, friendly = self._decode_scalar(payload, s)
            fields[s.name] = val
            if s.enum is not None:
                fields[f"{s.name} (Decoded)"] = friendly

        records: Dict[str, List[Dict[str, Any]]] = {}
        for rec in layout.records:
            logical = self._logical_count(rec, layout, fields)
            available = len(payload) - rec.base_offset_bytes
            fits = available // rec.record_size_bytes
            actual = min(int(logical), fits)
            rows = []
            for r in range(max(0, actual)):
                rec_off_bits = (rec.base_offset_bytes + r * rec.record_size_bytes) * 8
                rrow: Dict[str, Any] = {}
                for f in rec.fields:
                    val, friendly = self._decode_scalar(payload, f, extra_off_bits=rec_off_bits)
                    rrow[f.name] = val
                    if f.enum is not None:
                        rrow[f"{f.name} (Decoded)"] = friendly
                rows.append(rrow)
            records[rec.name] = rows

        if layout.has_bler:
            self._apply_bler(fields)
            for rows in records.values():
                for rrow in rows:
                    self._apply_bler(rrow)

        flat = dict(fields)
        for rows in records.values():
            for i, rrow in enumerate(rows):
                for k, v in rrow.items():
                    flat[f"{k} (Record {i})"] = v

        out.update({"fields": fields, "records": records, "flat": flat})
        return out

    @staticmethod
    def _apply_bler(fmap: Dict[str, Any]) -> None:
        """BLER / Residual BLER per field_post_processor.py:41-148."""
        need = ("BLER", "Num CRC Pass TB", "Num CRC Fail TB")
        if "BLER" in fmap and any(fmap.get(k) is None for k in need):
            fmap["BLER"] = None  # derived inputs missing -> null, engine-wide
        elif all(k in fmap for k in need):
            p, f = fmap["Num CRC Pass TB"], fmap["Num CRC Fail TB"]
            total = p + f
            if total > 0:
                pct = (f / total) * 100
                fmap["BLER"] = round2(pct)
                fmap["BLER (Decoded)"] = f"{pct:.2f}%"
            else:
                fmap["BLER"] = 0.0
                fmap["BLER (Decoded)"] = "0.00%"
        need_r = ("Residual BLER", "HARQ Failure", "Num CRC Pass TB", "Num CRC Fail TB")
        if "Residual BLER" in fmap and any(fmap.get(k) is None for k in need_r):
            fmap["Residual BLER"] = None
        elif all(k in fmap for k in need_r):
            h = fmap["HARQ Failure"]
            p, f = fmap["Num CRC Pass TB"], fmap["Num CRC Fail TB"]
            total = p + f
            if total > 0:
                pct = (h / total) * 100
                fmap["Residual BLER"] = round2(pct)
                fmap["Residual BLER (Decoded)"] = f"{pct:.2f}%"
            else:
                fmap["Residual BLER"] = 0.0
                fmap["Residual BLER (Decoded)"] = "0.00%"

    # -- route + aggregate (set semantics; SURVEY 2.5 A6 / 2.9) -------------
    def route_key(self, tokens: List[int]) -> str:
        p = self.parse_row(tokens)
        if p["error_code"] != ERR_OK:
            return "dead_letter"
        return f"0x{p['msg_type']:04X}"

    def aggregate(self, rows) -> Dict[Tuple[str, int], Tuple[int, int]]:
        """groupby(source, msg_type) -> (count, sum_n_tok) over OK rows."""
        agg: Dict[Tuple[str, int], List[int]] = {}
        for row in rows:
            p = self.parse_row(list(row["tokens"]))
            if p["error_code"] != ERR_OK:
                continue
            key = (row["source"], p["msg_type"])
            a = agg.setdefault(key, [0, 0])
            a[0] += 1
            a[1] += int(row["n_tok"])
        return {k: (v[0], v[1]) for k, v in agg.items()}
