"""Export: reference-shaped nested JSON output for decoded packets.

Re-creates the reference's export surface on top of the columnar sinks:

* nested result dict per packet — logcode id/name, resolved version,
  per-field ``{raw/value/decoded}`` entries, ``metadata`` with
  ``payload_size_bytes``/``fields_parsed`` — mirroring
  ``metadata_payload_parser.py:127-140`` and ``export/json_builder.py:12-89``;
* flattened ``"<field> (Record i)"`` naming for record arrays
  (``decoder/payload_decoder.py:201``);
* pretty / compact / JSONL writers (``export/file_writer.py:14-76``) — the
  distributed form is ``Dataset.write_json`` over a ``json`` string column;
  the single-file helpers exist for CLI parity.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import pyarrow as pa



class JsonBuilder:
    """Decode + assemble the reference-shaped nested dict per row.

    ``metadata_path`` decodes against a REFERENCE-format metadata JSON;
    ``version_fallback`` enables the CLI-path first-table resolution;
    ``include_timing`` adds the reference's ``decode_time_ms`` metadata
    (off by default so distributed JSON output stays deterministic)."""

    def __init__(self, metadata_path: Optional[str] = None,
                 version_fallback: bool = False,
                 include_timing: bool = False):
        from engine.stages import shared_decoder
        self.decoder = shared_decoder(metadata_path, version_fallback)
        self.compiled = self.decoder.compiled
        self.include_timing = include_timing

    def build_rows(self, t: pa.Table) -> List[Optional[Dict[str, Any]]]:
        import time as _time
        t0 = _time.monotonic()
        t = t.combine_chunks()
        from engine.stages import batch_view
        view = batch_view(t)
        cls = self.decoder.classify(view)
        out: List[Optional[Dict[str, Any]]] = [None] * t.num_rows
        from engine.kernels import group_rows_by_layout
        for mt, ver, rows in group_rows_by_layout(self.decoder, cls):
            layout = self.compiled[(mt, ver)]
            cols = self.decoder.decode_group(view, rows, layout)
            colpy = {k: v.to_pylist() for k, v in cols.items()}
            for j, ri in enumerate(rows):
                fields: Dict[str, Any] = {}
                for s in layout.scalars:
                    entry = {"raw": colpy[s.name][j], "type": s.type_name,
                             "value": colpy[s.name][j]}
                    if s.enum is not None:
                        entry["decoded"] = colpy[f"{s.name} (Decoded)"][j]
                    fields[s.name] = entry
                for rec in layout.records:
                    for i, rrow in enumerate(colpy[rec.name][j] or []):
                        for k, v in rrow.items():
                            if k.endswith(" (Decoded)"):
                                base = k[:-len(" (Decoded)")]
                                fields.setdefault(
                                    f"{base} (Record {i})", {})["decoded"] = v
                            else:
                                fields[f"{k} (Record {i})"] = {
                                    "raw": v, "value": v}
                # derived overwrite naming parity: BLER raw/value carry the
                # computed float; decoded carries the percent string
                for dname in ("BLER", "Residual BLER"):
                    if dname in fields and f"{dname} (Decoded)" in colpy:
                        fields[dname]["decoded"] = colpy[f"{dname} (Decoded)"][j]
                ri = int(ri)
                meta = {
                    # true byte length when the source carries it (hex
                    # ingest payload_nbytes); token-derived otherwise
                    "payload_size_bytes": int(view.payload_nbytes[ri]),
                    "fields_parsed": len(fields),
                }
                out[ri] = {
                    "logcode_id": f"0x{mt:04X}",
                    "logcode_name": layout.msg_name,
                    "version": {
                        "value": ver,
                        "value_hex": f"0x{ver:08X}",
                        "table": layout.table_name,
                    },
                    "fields": fields,
                    "metadata": meta,
                }
        if self.include_timing:
            ms = round((_time.monotonic() - t0) * 1e3, 2)
            for r in out:
                if r is not None:
                    r["metadata"]["decode_time_ms"] = ms
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = self.build_rows(t)
        return pa.table({
            "doc_id": t["doc_id"],
            "json": pa.array([None if r is None else json.dumps(r, sort_keys=True)
                              for r in rows], type=pa.string()),
        })


def json_stage(ds, batch_size: Optional[int] = None,
               metadata_path: Optional[str] = None,
               version_fallback: bool = False):
    """Dataset of decoded-packet JSON strings (feed to ``ds.write_json``)."""
    return ds.map_batches(JsonBuilder, batch_format="pyarrow",
                          fn_constructor_kwargs={
                              "metadata_path": metadata_path,
                              "version_fallback": version_fallback},
                          batch_size=batch_size, concurrency=(1, 8), num_cpus=1)


# --- single-file helpers (CLI parity with export/file_writer.py:14-76) ----

def write_pretty(doc: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=2, ensure_ascii=False)


def write_compact(doc: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False)


def append_jsonl(doc: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a", encoding="utf-8") as f:
        f.write(json.dumps(doc, ensure_ascii=False) + "\n")
