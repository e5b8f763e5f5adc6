"""Catalog query-engine parity (src/query_engine.py surface)."""

from engine import catalog_query as cq


def test_list_and_search():
    rows = cq.list_logcodes()
    assert {r["logcode"] for r in rows} >= {"0x2001", "0xB888", "0x1C07"}
    assert [r["logcode"] for r in rows] == sorted(r["logcode"] for r in rows)
    hits = cq.search_logcodes("pdsch")
    assert len(hits) == 1 and hits[0]["logcode"] == "0xB888"
    assert cq.search_logcodes("0x5c") and not cq.search_logcodes("nope-xyz")


def test_versions_and_layout():
    vs = cq.versions_of("0xB888")
    assert vs == [{"version": 1, "table": "10-1"}, {"version": 2, "table": "10-3"}]
    grid = cq.table_layout("0xB888", 1)
    names = [r["name"] for r in grid]
    assert names[0] == "Num Layers" and "Records" in names
    rec = [r for r in grid if r["name"] == "Records"][0]
    assert rec["type"] == "Table 10-2"
    assert rec["length_bits"] == 14 * 8  # record size from valid fields only


def test_dependency_closure_bfs_dedup():
    """Visited-set dedup over the table-reference graph
    (query_engine.py:84-102)."""
    assert cq.dependency_closure("0xB888") == ["10-1", "10-3", "10-2"]
    assert cq.dependency_closure("0x2001") == ["2-1", "2-2"]
