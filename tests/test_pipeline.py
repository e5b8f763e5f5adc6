"""End-to-end conformance: Ray pipeline output vs the scalar oracle.

Asserts the BASELINE.json correctness contract: per-sink counts, routed-row
SET equality per sink, per-row token-array equality (Arrow-level), and the
grouped aggregate — all against the single-process oracle.
"""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.dataset as pads
import pytest

from engine.oracle import ERR_OK, OracleDecoder


@pytest.fixture(scope="module")
def job_out(ray_session, sf_small, tmp_path_factory):
    from engine.pipeline import run_job
    out = str(tmp_path_factory.mktemp("job_out"))
    agg = run_job(f"{sf_small}/sequences", out, f"{sf_small}/source_meta.parquet",
                  num_partitions=2)
    return out, agg


@pytest.fixture(scope="module")
def oracle_truth(sf_small):
    t = pads.dataset(f"{sf_small}/sequences").to_table().combine_chunks()
    o = OracleDecoder()
    rows = t.to_pylist()
    by_sink = {}
    for r in rows:
        sink = o.route_key(r["tokens"])
        by_sink.setdefault(sink, {})[r["doc_id"]] = r["tokens"]
    agg = o.aggregate(rows)
    return rows, by_sink, agg


def _read_sink(out, sink):
    if sink == "dead_letter":
        pat = os.path.join(out, "dead_letter", "*.parquet")
    else:
        pat = os.path.join(out, f"msg_type={sink}", "version=*", "*.parquet")
    files = glob.glob(pat)
    assert files, f"no files for sink {sink}"
    tables = [pads.dataset(f).to_table() for f in files]
    return tables


def test_sink_counts_match_oracle(job_out, oracle_truth):
    out, _ = job_out
    _, by_sink, _ = oracle_truth
    with open(os.path.join(out, "sink_counts.json")) as f:
        counts = json.load(f)
    want = {sink: len(docs) for sink, docs in by_sink.items()}
    assert counts == want


def test_routed_row_set_and_token_equality(job_out, oracle_truth):
    """Set equality of routed rows per sink + exact token-array equality
    (the per-row invariant of BASELINE.json:input_hint)."""
    out, _ = job_out
    _, by_sink, _ = oracle_truth
    for sink, want_docs in by_sink.items():
        got = {}
        for tbl in _read_sink(out, sink):
            for doc, toks in zip(tbl["doc_id"].to_pylist(), tbl["tokens"].to_pylist()):
                assert doc not in got, f"duplicate routed row {doc} in {sink}"
                got[doc] = toks
        assert set(got) == set(want_docs), sink
        for doc, toks in want_docs.items():
            assert got[doc] == toks, (sink, doc)


def test_aggregate_matches_oracle(job_out, oracle_truth):
    _, agg = job_out
    _, _, want = oracle_truth
    got = {(s, m): (n, tk) for s, m, n, tk in zip(
        agg["source"].to_pylist(), agg["msg_type"].to_pylist(),
        agg["n_rows"].to_pylist(), agg["sum_n_tok"].to_pylist())}
    assert got == want


def test_native_aggregate_stage(ray_session, sf_small):
    """ds.groupby(source, msg_type).aggregate(Count, Sum) == combiner fold
    == oracle (SURVEY A6, both physical plans)."""
    import ray
    from engine import stages
    ds = ray.data.read_parquet(f"{sf_small}/sequences")
    parsed = stages.parse_stage(ds)
    native = stages.aggregate_stage(parsed).to_pandas()
    pre = stages.pre_aggregated(stages.parse_stage(
        ray.data.read_parquet(f"{sf_small}/sequences"))).to_pandas()
    o = OracleDecoder()
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    want = o.aggregate(t.to_pylist())
    for df in (native, pre):
        got = {(r.source, r.msg_type): (int(r.n_rows), int(r.sum_n_tok))
               for r in df.itertuples()}
        assert got == want


def test_enrichment_columns(job_out, sf_small):
    out, _ = job_out
    meta = pads.dataset(f"{sf_small}/source_meta.parquet").to_table().to_pylist()
    lookup = {m["source"]: m for m in meta}
    tbl = _read_sink(out, "0x2001")[0]
    for r in tbl.slice(0, 50).to_pylist():
        m = lookup[r["source"]]
        assert r["site"] == m["site"]
        assert r["hw_rev"] == m["hw_rev"]
        assert r["priority"] == m["priority"]


def test_decoded_columns_in_sink(job_out, oracle_truth):
    """Spot-check decoded values inside routed parquet vs oracle decode."""
    out, _ = job_out
    rows, _, _ = oracle_truth
    by_doc = {r["doc_id"]: r for r in rows}
    o = OracleDecoder()
    for f in glob.glob(os.path.join(out, "msg_type=0xB888", "version=*", "*.parquet"))[:3]:
        tbl = pads.dataset(f).to_table()
        for r in tbl.slice(0, 20).to_pylist():
            ref = o.decode_row(by_doc[r["doc_id"]]["tokens"])
            for k, v in ref["fields"].items():
                got = r[k]
                assert (got == v) or (got is None and v is None), (r["doc_id"], k, got, v)
            recs = r["Records"]
            assert len(recs) == len(ref["records"]["Records"])


def test_resume_skips_completed_partitions(ray_session, sf_small, tmp_path):
    """Kill mid-job; restart must not reprocess completed partitions
    (north_rule resumability; reference analogue parallel_pdf_parser.py:170-182)."""
    from engine.pipeline import run_job
    out = str(tmp_path / "resume_out")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_job(f"{sf_small}/sequences", out, f"{sf_small}/source_meta.parquet",
                num_partitions=4, fail_after_partitions=2)
    import hashlib

    def digest(p):
        with open(p, "rb") as f:
            return hashlib.md5(f.read()).hexdigest()

    manifests = sorted(glob.glob(os.path.join(out, "_manifest", "*.json")))
    assert len(manifests) == 2
    mtimes = {m: os.path.getmtime(m) for m in manifests}
    done_files = {p: digest(p) for p in
                  glob.glob(os.path.join(out, "**", "p000[01]-*.parquet"), recursive=True)}
    assert done_files

    agg = run_job(f"{sf_small}/sequences", out, f"{sf_small}/source_meta.parquet",
                  num_partitions=4)
    # completed partitions skipped: manifests untouched, outputs byte-stable
    # (a straggling idempotent rewrite with identical bytes is permitted —
    # that is exactly the deterministic-naming guarantee)
    for m, ts in mtimes.items():
        assert os.path.getmtime(m) == ts
    for p, h in done_files.items():
        assert digest(p) == h, f"{p} changed content on resume"
    # and the final result is still exactly right
    o = OracleDecoder()
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    want = o.aggregate(t.to_pylist())
    got = {(s, m): (n, tk) for s, m, n, tk in zip(
        agg["source"].to_pylist(), agg["msg_type"].to_pylist(),
        agg["n_rows"].to_pylist(), agg["sum_n_tok"].to_pylist())}
    assert got == want


def test_task_retry_idempotent_sink_writes(ray_session, sf_small, tmp_path):
    """A task that fails AFTER writing its sink files and is retried by Ray
    must converge to the exact same outputs with no duplicate rows — the
    deterministic content-derived file-naming guarantee behind the
    checkpoint design (writes are idempotent, so at-least-once task
    execution is safe)."""
    import pyarrow.parquet as pq
    import ray
    from engine import stages

    out = str(tmp_path / "retry_out")
    marker_dir = tmp_path / "failed_once"
    marker_dir.mkdir()
    meta_ref = ray.put(pq.read_table(f"{sf_small}/source_meta.parquet"))

    def flaky(t):
        import os as _os
        st = stages._FusedState.get(out, "p0000", meta_ref)
        lin = st.router(st.enricher(stages.parse_batch(t)))
        # fail AFTER the sink writes, once per unique batch content
        key = str(abs(hash(tuple(t["doc_id"].to_pylist()[:3]))) % 10**9)
        m = marker_dir / key
        if not m.exists():
            m.touch()
            raise RuntimeError("transient failure after writing sinks")
        return lin

    ds = ray.data.read_parquet(f"{sf_small}/sequences", override_num_blocks=4)
    lin = ds.map_batches(flaky, batch_format="pyarrow", batch_size=65536,
                         max_retries=4, retry_exceptions=[RuntimeError])
    tables = [x for x in ray.get(lin.to_arrow_refs()) if x.num_columns]
    assert tables  # the job completed despite every task failing once
    assert list(marker_dir.iterdir())  # the injected failures really fired

    # routed rows: exact set + token equality vs the oracle, NO duplicates
    o = OracleDecoder()
    t = pads.dataset(f"{sf_small}/sequences").to_table()
    want_by_sink = {}
    for r in t.to_pylist():
        sink = o.route_key(r["tokens"])
        want_by_sink.setdefault(sink, {})[r["doc_id"]] = r["tokens"]
    for sink, want in want_by_sink.items():
        got = {}
        for tbl in _read_sink(out, sink):
            for doc, toks in zip(tbl["doc_id"].to_pylist(),
                                 tbl["tokens"].to_pylist()):
                assert doc not in got, f"duplicate {doc} in {sink} after retry"
                got[doc] = toks
        assert got == want, sink


def test_actor_stage_pipeline_matches_fused(ray_session, sf_small, tmp_path):
    """The 3-stage actor-pool pipeline (API-parity path) produces the same
    aggregate as the fused stage, including under version fallback."""
    from engine.pipeline import run_job
    outs = {}
    for name, kw in (("fused", {}), ("actor", {"use_actor_stages": True}),
                     ("actor_fb", {"use_actor_stages": True,
                                   "version_fallback": True})):
        out = str(tmp_path / name)
        agg = run_job(f"{sf_small}/sequences", out,
                      f"{sf_small}/source_meta.parquet", **kw)
        outs[name] = {(s, m): (n, tk) for s, m, n, tk in zip(
            agg["source"].to_pylist(), agg["msg_type"].to_pylist(),
            agg["n_rows"].to_pylist(), agg["sum_n_tok"].to_pylist())}
    assert outs["fused"] == outs["actor"]
    # fallback recovers the unknown-version 0x2001 stratum
    extra = sum(n for (s, m), (n, _) in outs["actor_fb"].items() if m == 0x2001) \
        - sum(n for (s, m), (n, _) in outs["actor"].items() if m == 0x2001)
    assert extra > 0


def test_collect_tables_executes_pipeline_exactly_once(ray_session, tmp_path):
    """Regression for the replay flake: Dataset.to_arrow_refs()'s schema
    fetch could re-execute a side-effecting pipeline with limit(1),
    writing a truncated batch's sink file under a new name (duplicate
    rows).  collect_tables must run the plan exactly once — one UDF call
    per block, all rows returned."""
    import uuid
    import ray
    from engine.pipeline import collect_tables
    marker = tmp_path / "calls"
    marker.mkdir()

    def fn(t):
        (marker / uuid.uuid4().hex).write_text(str(t.num_rows))
        return t

    ds = ray.data.range(1000, override_num_blocks=4) \
        .map_batches(fn, batch_size=None, batch_format="pyarrow")
    tabs = collect_tables(ds)
    assert sum(t.num_rows for t in tabs) == 1000
    assert len(list(marker.iterdir())) == 4  # one call per block, one run


def test_fallback_deadletter_resume_composite_sf01(ray_session, tmp_path):
    """Round-5 #7: the flagship's three edge paths TOGETHER at bench
    scale (sf0.1, 200k rows) — version_fallback decoding the unknown-
    version stratum, dead-lettering of the truly-malformed rows, and a
    mid-job kill + resume — must converge to exactly the output of an
    uninterrupted fallback run."""
    import hashlib

    import pyarrow.dataset as pads

    from engine.fixtures import ensure_fixtures
    from engine.pipeline import run_job

    root = ensure_fixtures("sf0.1")
    seqs, meta = f"{root}/sequences", f"{root}/source_meta.parquet"

    out = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_job(seqs, out, meta, num_partitions=8,
                fail_after_partitions=3, version_fallback=True)

    def digest(p):
        with open(p, "rb") as f:
            return hashlib.md5(f.read()).hexdigest()

    manifests = sorted(glob.glob(os.path.join(out, "_manifest", "*.json")))
    assert len(manifests) == 3
    mtimes = {m: os.path.getmtime(m) for m in manifests}
    done = {p: digest(p) for p in glob.glob(
        os.path.join(out, "**", "p000[012]-*.parquet"), recursive=True)}
    assert done

    agg_res = run_job(seqs, out, meta, num_partitions=8,
                      version_fallback=True)
    for m, ts in mtimes.items():              # completed partitions skipped
        assert os.path.getmtime(m) == ts
    for p, h in done.items():
        assert digest(p) == h, f"{p} changed content on resume"

    ref = str(tmp_path / "fresh")
    agg_ref = run_job(seqs, ref, meta, num_partitions=8,
                      version_fallback=True)

    def agg_map(agg):
        return {(s, m): (n, tk) for s, m, n, tk in zip(
            agg["source"].to_pylist(), agg["msg_type"].to_pylist(),
            agg["n_rows"].to_pylist(), agg["sum_n_tok"].to_pylist())}

    assert agg_map(agg_res) == agg_map(agg_ref)

    def sink_rows(base, sink):
        pat = os.path.join(base, "dead_letter", "*.parquet") \
            if sink == "dead_letter" else \
            os.path.join(base, f"msg_type={sink}", "version=*", "*.parquet")
        files = glob.glob(pat)
        if not files:
            return set()
        t = pads.dataset(files).to_table()
        return set(t["doc_id"].to_pylist())

    # resumed == fresh on every sink's row SET (incl. dead_letter)
    dl_res, dl_ref = sink_rows(out, "dead_letter"), sink_rows(ref, "dead_letter")
    assert dl_res == dl_ref and dl_res
    assert sink_rows(out, "0x2001") == sink_rows(ref, "0x2001")

    # fallback really recovered the unknown-version stratum: a fresh
    # NON-fallback run dead-letters strictly more rows, and the extras
    # all route to 0x2001
    nofb = str(tmp_path / "nofb")
    run_job(seqs, nofb, meta, num_partitions=8)
    dl_nofb = sink_rows(nofb, "dead_letter")
    extras = dl_nofb - dl_res
    assert extras and dl_res < dl_nofb
    assert extras <= sink_rows(out, "0x2001")


def test_driver_entry_contract(ray_session):
    """__ray_entry__.entry() — the driver's smoke surface: runs the
    flagship job on the sf0.001 fixtures inside an ALREADY-initialized
    Ray session (entry must not init/shutdown) and returns a non-empty
    result with the stable aggregate schema."""
    import __ray_entry__ as e
    res = e.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    for col in ("source", "msg_type", "n_rows", "sum_n_tok"):
        assert col in df.columns, col
