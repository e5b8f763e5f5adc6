"""Sources: raw hex-text ingestion parity + renderers.

The production input is the pre-tokenized Parquet corpus
(BASELINE.json:input_hint); this module provides parity with the
reference's raw-text ingestion path so a user of the reference could feed
the same ``Length:/Header:/Payload:`` files to this engine:

* format (``hex_decoder_module/ingest/hex_parser.py:20-27``)::

      Length: 61
      Header: 3D 00 23 B8 CD 0F 67 95 F5 A6 06 01
      Payload:
      02 00 03 00 ...

* header layout (``decoder/header_decoder.py:13-19``): u16 length,
  **u16 logcode id at bytes [2:4]**, u32 timestamp, u32 sequence, all LE;
* version word: u32 LE at payload offset 0
  (``icd_parser/icd_query.py:114-115``);
* validation (``ingest/validators.py:9-65``): malformed input and
  declared-vs-actual length mismatch become error columns, not exceptions.

Token-domain mapping (FIXTURES.md section 1): a parsed packet becomes one
sequences row ``tokens = [msg_type, version, seq, ts] + payload_words``
where ``payload_words`` are the LE int32 words of the payload AFTER the
4-byte version word (the version-offset fold of
``decoder/payload_decoder.py:78-95``), zero-padded to a word boundary.

Text parsing is per-packet Python: ingestion of text logs is a
compatibility path, not the 10^12-row hot path (which is Parquet).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

INGEST_OK = 0
INGEST_MALFORMED = 1          # MalformedHexError, models/errors.py:6-17
INGEST_LENGTH_MISMATCH = 2    # LengthMismatchError, models/errors.py:19-24
INGEST_SHORT_HEADER = 3       # PayloadTooShortError (header), errors.py:43-52

_LEN_RE = re.compile(r"Length:\s*(\d+)", re.IGNORECASE)
_HDR_RE = re.compile(r"Header:\s*([0-9A-Fa-f\s]+?)(?=Payload:|\Z)",
                     re.IGNORECASE | re.DOTALL)
_PAY_RE = re.compile(r"Payload:\s*([0-9A-Fa-f\s]*?)(?=Length:|\Z)",
                     re.IGNORECASE | re.DOTALL)


def _hex_to_bytes(s: str) -> Optional[bytes]:
    s = re.sub(r"\s+", "", s)
    if not s or len(s) % 2:
        return None
    try:
        return bytes.fromhex(s)
    except ValueError:
        return None


def parse_hex_packet(block: str) -> Dict:
    """Parse one Length/Header/Payload block (hex_parser.py:16-63 semantics)."""
    m_len = _LEN_RE.search(block)
    m_hdr = _HDR_RE.search(block)
    m_pay = _PAY_RE.search(block)
    if not (m_len and m_hdr and m_pay):
        return {"error": INGEST_MALFORMED}
    header = _hex_to_bytes(m_hdr.group(1))
    payload = _hex_to_bytes(m_pay.group(1))
    if header is None or payload is None:
        return {"error": INGEST_MALFORMED}
    declared = int(m_len.group(1))
    if len(header) < 12:
        return {"error": INGEST_SHORT_HEADER}
    if declared != len(header) + len(payload) and declared != len(payload):
        # the reference checks header+payload (validators.py:40-53); some of
        # its own sample files count payload only — accept either, flag none
        return {"error": INGEST_LENGTH_MISMATCH, "declared": declared,
                "header": header, "payload": payload}
    return {"error": INGEST_OK, "declared": declared,
            "header": header, "payload": payload}


def packet_to_tokens(header: bytes, payload: bytes) -> List[int]:
    """Hex packet -> token row per the FIXTURES.md mapping."""
    msg_type = int.from_bytes(header[2:4], "little")
    ts = int.from_bytes(header[4:8], "little")
    seq = int.from_bytes(header[8:12], "little")
    version = int.from_bytes(payload[0:4], "little") if len(payload) >= 4 else 0
    body = payload[4:]
    pad = (-len(body)) % 4
    words = np.frombuffer(body + b"\x00" * pad, dtype="<i4")

    def as_i32(v: int) -> int:
        return v - (1 << 32) if v >= (1 << 31) else v

    return [as_i32(msg_type), as_i32(version), as_i32(seq), as_i32(ts)] + \
        [int(w) for w in words]


def split_packets(content: str) -> List[str]:
    """A file may hold many packets; each starts at a ``Length:`` line."""
    starts = [m.start() for m in re.finditer(r"Length:", content)]
    if not starts:
        return []
    starts.append(len(content))
    return [content[a:b] for a, b in zip(starts[:-1], starts[1:])]


def read_hex_packets(paths):
    """Ray Data source: hex text files -> sequences-shaped Dataset.

    Columns: doc_id (``<file>#<i>``), tokens, n_tok, source (file stem),
    declared_len, ingest_error.  Error rows keep empty tokens and a nonzero
    ``ingest_error`` (dead-letter style, SURVEY 1.4)."""
    import ray

    if isinstance(paths, str):
        paths = [paths]
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        doc_ids, toks, n_toks, sources, decls, errs, nbytes = \
            [], [], [], [], [], [], []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            stem = os.path.splitext(os.path.basename(path))[0]
            content = data.decode("utf-8", errors="replace")
            for i, block in enumerate(split_packets(content)):
                p = parse_hex_packet(block)
                doc_ids.append(f"{stem}#{i}")
                sources.append(stem)
                errs.append(p["error"])
                decls.append(p.get("declared"))
                if p["error"] in (INGEST_OK, INGEST_LENGTH_MISMATCH):
                    row = packet_to_tokens(p["header"], p["payload"])
                    # TRUE body byte length (after the 4-byte version word):
                    # the token row zero-pads to a word boundary, so the
                    # decoder must clamp validity/fits on this, not n_tok
                    nb = max(len(p["payload"]) - 4, 0)
                else:
                    row, nb = [], 0
                toks.append(row)
                n_toks.append(len(row))
                nbytes.append(nb)
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": pa.array(toks, type=pa.list_(pa.int32())),
            "n_tok": pa.array(n_toks, type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
            "declared_len": pa.array(decls, type=pa.int64()),
            "payload_nbytes": pa.array(nbytes, type=pa.int32()),
            "ingest_error": pa.array(errs, type=pa.int8()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def render_hex_packet(tokens: List[int]) -> str:
    """Inverse of :func:`packet_to_tokens` (round-trip fixture renderer)."""
    mt, ver, seq, ts = (int(t) & 0xFFFFFFFF for t in tokens[:4])
    payload = int(ver).to_bytes(4, "little") + \
        np.asarray(tokens[4:], dtype="<i4").tobytes()
    length = 12 + len(payload)
    header = (length & 0xFFFF).to_bytes(2, "little") + \
        (mt & 0xFFFF).to_bytes(2, "little") + \
        ts.to_bytes(4, "little") + seq.to_bytes(4, "little")

    def hx(bs: bytes, per_line: int = 12) -> str:
        pairs = [f"{b:02X}" for b in bs]
        return "\n".join(" ".join(pairs[i:i + per_line])
                         for i in range(0, len(pairs), per_line))

    return (f"Length: {length}\nHeader: {hx(header, 12)}\n"
            f"Payload:\n{hx(payload)}\n")
