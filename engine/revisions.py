"""ICD revision history: synthesis, snapshot tables, queries (J6/X3).

The reference extracts a revision-history table from the ICD PDF and
stores it in SQLite as ``revisions(revision, date)`` +
``revision_logcodes(revision, logcode, status in {new, updated})``
(``src/datastore.py:296-313``), then answers three query shapes
(``src/query_revisions.py:1-114``, CLI ``src/app.py:170-260``):

* history of one logcode across revisions (revision, date, status);
* all revisions in a "Month Year" date;
* the logcode sets of one revision code.

Here the revision table is synthesized deterministically from the
catalog (the same obviate-the-PDF mapping as the catalog itself), stored
as Parquet snapshots next to the fixtures (``revisions.parquet``,
``logcodes.parquet``), and queried both catalog-side (dict results for
the CLI) and data-plane (Ray joins gated against DuckDB).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import pyarrow as pa

from engine.catalog import LogcodeDef, build_catalog

REV_CODES = ["FJ", "FK", "FL", "FM", "FN", "FO"]
REV_DATES = {
    "FJ": "October 2024", "FK": "December 2024", "FL": "February 2025",
    "FM": "April 2025", "FN": "June 2025", "FO": "August 2025",
}


def build_revisions(cat: Optional[Dict[int, LogcodeDef]] = None) -> pa.Table:
    """Deterministic revision_logcodes table: every logcode enters as
    'new' in one revision and gets 0-2 'updated' entries in later ones
    (assignment is a pure function of the msg_type)."""
    cat = cat or build_catalog()
    revs, dates, lcs, stats = [], [], [], []
    for mt in sorted(cat):
        first = mt % len(REV_CODES)
        entries = [(first, "new")]
        for j in range(1 + mt % 3 - 1):          # 0..2 updates
            nxt = first + 1 + j
            if nxt < len(REV_CODES):
                entries.append((nxt, "updated"))
        for idx, status in entries:
            code = REV_CODES[idx]
            revs.append(code)
            dates.append(REV_DATES[code])
            lcs.append(f"0x{mt:04X}")
            stats.append(status)
    return pa.table({
        "revision": pa.array(revs, type=pa.string()),
        "date": pa.array(dates, type=pa.string()),
        "logcode": pa.array(lcs, type=pa.string()),
        "status": pa.array(stats, type=pa.string()),
    })


def build_logcodes(cat: Optional[Dict[int, LogcodeDef]] = None) -> pa.Table:
    """Snapshot of the catalog's logcode index (name + version count) —
    the join side of the revision ⋈ logcode queries."""
    cat = cat or build_catalog()
    mts = sorted(cat)
    return pa.table({
        "logcode": pa.array([f"0x{mt:04X}" for mt in mts], type=pa.string()),
        "msg_type": pa.array(mts, type=pa.int64()),
        "logcode_name": pa.array([cat[mt].name for mt in mts], type=pa.string()),
        "n_versions": pa.array([len(cat[mt].version_map) for mt in mts],
                               type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# catalog-side queries (CLI dict results, src/query_revisions.py parity)
# ---------------------------------------------------------------------------

def _rows() -> List[dict]:
    return build_revisions().to_pylist()


def revision_history(logcode: str) -> List[dict]:
    """search_revisions_by_logcode (src/datastore.py:389-406)."""
    return [{"revision": r["revision"], "date": r["date"], "status": r["status"]}
            for r in _rows() if r["logcode"].upper() == logcode.upper()]


def revisions_by_date(month: str, year: str) -> List[dict]:
    """get_revisions_by_date (src/datastore.py:296-340)."""
    pattern = f"{month} {year}"
    by_rev: Dict[str, dict] = {}
    for r in _rows():
        if r["date"] != pattern:
            continue
        d = by_rev.setdefault(r["revision"], {
            "revision": r["revision"], "date": r["date"],
            "updated_logcodes": [], "new_logcodes": []})
        key = "new_logcodes" if r["status"] == "new" else "updated_logcodes"
        d[key].append(r["logcode"])
    out = []
    for code in sorted(by_rev):
        d = by_rev[code]
        d["updated_logcodes"].sort()
        d["new_logcodes"].sort()
        out.append(d)
    return out


def revision_by_code(code: str) -> Optional[dict]:
    """get_revisions_by_code (src/datastore.py:360-387)."""
    code = code.upper()
    updated, new, date = [], [], None
    for r in _rows():
        if r["revision"] != code:
            continue
        date = r["date"]
        (new if r["status"] == "new" else updated).append(r["logcode"])
    if date is None:
        return None
    return {"revision": code, "date": date,
            "updated_logcodes": sorted(updated), "new_logcodes": sorted(new)}


# ---------------------------------------------------------------------------
# data-plane gated queries (Ray vs DuckDB over the parquet snapshots)
# ---------------------------------------------------------------------------

def q_revision_logcode_join(sf_dir: str):
    """J6: revision ⋈ logcode — the full history joined to the catalog
    index (name, version count), one row per (logcode, revision) entry."""
    import ray
    from engine import fixtures
    fix = fixtures.ensure_fixtures(fixtures.sf_of(sf_dir))
    rev = ray.data.read_parquet(os.path.join(fix, "revisions.parquet"))
    lc_tbl = build_logcodes()
    name_of = dict(zip(lc_tbl["logcode"].to_pylist(),
                       lc_tbl["logcode_name"].to_pylist()))
    nver_of = dict(zip(lc_tbl["logcode"].to_pylist(),
                       [int(x) for x in lc_tbl["n_versions"].to_pylist()]))

    def join(t: pa.Table) -> pa.Table:
        lcs = t["logcode"].to_pylist()
        return t.append_column(
            "logcode_name", pa.array([name_of[x] for x in lcs], type=pa.string())
        ).append_column(
            "n_versions", pa.array([nver_of[x] for x in lcs], type=pa.int64()))

    return rev.map_batches(join, batch_format="pyarrow")


def q_agg_rows_by_revision(sf_dir: str):
    """Data-plane revision join: corpus row/token totals per revision —
    which ICD revision's logcodes carry the traffic.  The revision map is
    broadcast (tiny) and folded into the per-batch combiner; only
    per-(revision, status) partials shuffle."""
    import ray
    import pyarrow.compute as pc
    from engine import fixtures, stages
    from engine.queries import _seq_ds

    rev = build_revisions()
    # msg_type -> list of (revision, status): one corpus row counts once
    # per revision entry of its logcode (the join semantics of the SQL)
    key_of: Dict[int, List[tuple]] = {}
    for r in rev.to_pylist():
        key_of.setdefault(int(r["logcode"], 16), []).append(
            (r["revision"], r["status"]))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["error_code"], 0))
        g = pa.TableGroupBy(t.select(["msg_type", "n_tok"]), "msg_type") \
            .aggregate([("n_tok", "count"), ("n_tok", "sum")])
        revs, stats, nr, nt = [], [], [], []
        for mt, cnt, s in zip(g["msg_type"].to_pylist(),
                              g["n_tok_count"].to_pylist(),
                              g["n_tok_sum"].to_pylist()):
            for code, status in key_of.get(int(mt), []):
                revs.append(code)
                stats.append(status)
                nr.append(int(cnt))
                nt.append(int(s))
        return pa.table({
            "revision": pa.array(revs, type=pa.string()),
            "status": pa.array(stats, type=pa.string()),
            "n_rows": pa.array(nr, type=pa.int64()),
            "sum_n_tok": pa.array(nt, type=pa.int64()),
        })

    parsed = stages.parse_stage(_seq_ds(sf_dir))
    partials = parsed.map_batches(partial, batch_format="pyarrow")
    from engine.pipeline import collect_tables
    folded = pa.concat_tables([t for t in collect_tables(partials)
                               if t.num_columns])
    g = pa.TableGroupBy(folded, ["revision", "status"]).aggregate(
        [("n_rows", "sum"), ("sum_n_tok", "sum")])
    return pa.table({
        "revision": g["revision"], "status": g["status"],
        "n_rows": pc.cast(g["n_rows_sum"], pa.int64()),
        "sum_n_tok": pc.cast(g["sum_n_tok_sum"], pa.int64()),
    }).sort_by([("revision", "ascending"), ("status", "ascending")])
