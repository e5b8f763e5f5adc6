"""Catalog query engine: the reference's query/list/search/versions CLI
surface (``src/query_engine.py:11-283``; CLI ``src/app.py:282-381``) over
the compiled in-memory catalog.

All of this is driver-side over the tiny catalog (the reference's SQLite
queries become dict walks), exposed both as functions and via
``python -m engine.job catalog ...``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from engine.catalog import LogcodeDef, build_catalog, compile_catalog


def list_logcodes(cat: Optional[Dict[int, LogcodeDef]] = None) -> List[Dict]:
    """All logcodes ordered by id (query_engine.py:217-226 analogue)."""
    cat = cat or build_catalog()
    return [{"logcode": f"0x{mt:04X}", "name": lc.name,
             "versions": len(lc.version_map), "tables": len(lc.tables)}
            for mt, lc in sorted(cat.items())]


def search_logcodes(term: str, cat: Optional[Dict[int, LogcodeDef]] = None) -> List[Dict]:
    """Case-insensitive name/id substring search (app.py search command)."""
    cat = cat or build_catalog()
    term = term.lower()
    return [e for e in list_logcodes(cat)
            if term in e["name"].lower() or term in e["logcode"].lower()]


def versions_of(logcode: str, cat: Optional[Dict[int, LogcodeDef]] = None) -> List[Dict]:
    """version -> table mapping for one logcode (app.py versions command)."""
    cat = cat or build_catalog()
    mt = int(logcode, 16)
    lc = cat[mt]
    from engine.catalog import version_sort_key
    return [{"version": v, "table": lc.version_map[v]}
            for v in sorted(lc.version_map, key=version_sort_key)]


def table_layout(logcode: str, version: int,
                 truncate_desc: int = 50) -> List[Dict]:
    """Field grid for one (logcode, version): the TableDisplay analogue
    (query_engine.py:11-20; description truncation per :156-166)."""
    compiled = compile_catalog()
    layout = compiled[(int(logcode, 16), version)]
    rows = []
    for i, s in enumerate(layout.scalars):
        rows.append({"idx": i, "name": s.name, "type": s.type_name,
                     "offset_bits": s.abs_off_bits, "length_bits": s.length_bits,
                     "enum": (str(s.enum)[:truncate_desc] if s.enum else "")})
    for rec in layout.records:
        rows.append({"idx": len(rows), "name": rec.name,
                     "type": f"Table {rec.table_name}",
                     "offset_bits": rec.base_offset_bytes * 8,
                     "length_bits": rec.record_size_bytes * 8,
                     "enum": f"count={rec.count} x {len(rec.fields)} fields"})
    return rows


def dependency_closure(logcode: str,
                       cat: Optional[Dict[int, LogcodeDef]] = None) -> List[str]:
    """BFS transitive closure of referenced tables with visited-set dedup
    (query_engine.py:84-102; dependency_resolver.py:16-42)."""
    import re
    cat = cat or build_catalog()
    lc = cat[int(logcode, 16)]
    ref_re = re.compile(r"Table\s+(\d+-\d+)", re.IGNORECASE)
    seen: List[str] = []
    frontier = list(lc.version_map.values())
    visited = set()
    while frontier:
        t = frontier.pop(0)
        if t in visited:
            continue
        visited.add(t)
        seen.append(t)
        for f in lc.tables.get(t, []):
            m = ref_re.search(f.type_name)
            if m and m.group(1) not in visited:
                frontier.append(m.group(1))
    return seen
