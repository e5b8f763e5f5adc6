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


def test_revision_surface():
    """J6/X3: revision history synthesis + the three reference query
    shapes (src/query_revisions.py:1-114, src/datastore.py:296-406)."""
    from engine import revisions as rev
    t = rev.build_revisions()
    assert set(t.column_names) == {"revision", "date", "logcode", "status"}
    assert set(t["status"].to_pylist()) == {"new", "updated"}
    # every catalog logcode enters exactly once as 'new'
    from engine.catalog import build_catalog
    news = [r["logcode"] for r in t.to_pylist() if r["status"] == "new"]
    assert sorted(news) == sorted(f"0x{mt:04X}" for mt in build_catalog())

    # history of one logcode: chronological, starts with 'new'
    hist = rev.revision_history("0xB888")
    assert hist and hist[0]["status"] == "new"
    assert all(h["revision"] in rev.REV_CODES for h in hist)
    assert rev.revision_history("0xb888") == hist  # case-insensitive

    # by revision code: disjoint new/updated sets, date attached
    fl = rev.revision_by_code("FL")
    assert fl is not None and fl["date"] == rev.REV_DATES["FL"]
    assert not (set(fl["new_logcodes"]) & set(fl["updated_logcodes"]))
    assert rev.revision_by_code("zz") is None

    # by date: the month/year resolves to the same revision's sets
    by_date = rev.revisions_by_date("February", "2025")
    assert len(by_date) == 1 and by_date[0]["revision"] == "FL"
    assert by_date[0]["new_logcodes"] == fl["new_logcodes"]


def test_revision_cli(capsys):
    import json as _json
    from engine.job import main
    assert main(["revision", "code", "FL"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["revision"] == "FL" and out["new_logcodes"]
    assert main(["revision", "logcode", "0xB888"]) == 0
    lines = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["status"] == "new"
    assert main(["revision", "date", "February", "2025"]) == 0
    assert capsys.readouterr().out.strip()
    assert main(["revision", "code", "ZZ"]) == 1


def test_mixed_class_version_sort():
    """O1 (src/parser.py:400-415): decimal < hex < string, numeric within
    class."""
    from engine.catalog import version_sort_key
    vs = ["0xA", "10", "Unknown Version", "2", "0x3", "1", "Beta"]
    assert sorted(vs, key=version_sort_key) == \
        ["1", "2", "10", "0x3", "0xA", "Beta", "Unknown Version"]
