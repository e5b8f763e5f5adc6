"""CLI entry point: ``python -m engine.job`` (the ``ray job submit`` target).

Subcommands (replacing the reference's CLI surface, ``src/app.py:282-381``
and ``hex_decoder_module/cli.py:56-178``, with one job entry per SURVEY X3):

  run        full parse -> enrich -> decode -> route -> aggregate job
  gen        generate a seeded sequences corpus + source_meta
  agg        re-fold the aggregate from an existing output's lineage
  show       quick query over job output (per-sink counts, agg table)

On a real cluster this module is the payload of
``ray job submit -- python -m engine.job run ...``; in the sandbox it
initialises a local session (guarded — the driver calls entry() with Ray
already up, and never imports this module).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


#: True only when THIS process's CLI call ray.init'ed — in-process callers
#: (tests, embedding apps) keep their session across main() invocations
_OWNS_RAY = False


def _ensure_ray(num_cpus: int | None):
    global _OWNS_RAY
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
        _OWNS_RAY = True
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def _release_ray(ray) -> None:
    """Shut down Ray only if this CLI started it: ``main()`` invoked
    in-process (the test suite's session fixture owns Ray) must not kill
    the caller's session."""
    global _OWNS_RAY
    if _OWNS_RAY:
        ray.shutdown()
        _OWNS_RAY = False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="engine.job")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a seeded corpus")
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--seed", type=int, default=20260817)
    g.add_argument("--out", required=True)
    g.add_argument("--files", type=int, default=32)

    r = sub.add_parser("run", help="run the full pipeline job")
    r.add_argument("--input", required=True, help="sequences parquet dir")
    r.add_argument("--out", required=True)
    r.add_argument("--source-meta", required=True)
    r.add_argument("--partitions", type=int, default=1)
    r.add_argument("--batch-size", type=int, default=65536)
    r.add_argument("--target-num-blocks", type=int, default=None)
    r.add_argument("--actor-stages", action="store_true",
                   help="use the 3-stage actor-pool pipeline instead of the fused stage")
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--version-fallback", action="store_true",
                   help="decode unknown versions of known logcodes with the "
                        "logcode's first table (reference CLI-path semantics, "
                        "version_resolver.py:46-50) instead of dead-lettering")

    dc = sub.add_parser("decode", help="one-shot hex decode -> reference-"
                        "shaped JSON (hex_decoder_module/cli.py parity: "
                        "pretty file for one packet, JSONL for many)")
    dc.add_argument("--input", required=True, nargs="+", help="hex text file(s)")
    dc.add_argument("--metadata", default=None, help="reference metadata JSON "
                    "(omit to decode against the built-in catalog)")
    dc.add_argument("--out", required=True)
    dc.add_argument("--compact", action="store_true")
    dc.add_argument("--version-fallback", action="store_true")

    h = sub.add_parser("run-hex", help="decode reference hex files with a "
                       "reference metadata JSON (migration path)")
    h.add_argument("--input", required=True, nargs="+", help="hex text file(s)")
    h.add_argument("--metadata", required=True, help="reference metadata JSON")
    h.add_argument("--out", required=True)
    h.add_argument("--version-fallback", action="store_true")

    cp = sub.add_parser("compact", help="compact small per-sink files")
    cp.add_argument("--out", required=True)
    cp.add_argument("--max-files", type=int, default=4)

    rp = sub.add_parser("replay", help="re-drive dead letters after a catalog update")
    rp.add_argument("--out", required=True)
    rp.add_argument("--metadata", default=None, help="reference metadata JSON")
    rp.add_argument("--version-fallback", action="store_true")

    a = sub.add_parser("agg", help="re-fold aggregate from lineage")
    a.add_argument("--out", required=True)

    s = sub.add_parser("show", help="summarize a job output dir")
    s.add_argument("--out", required=True)

    c = sub.add_parser("catalog", help="query the schema catalog "
                       "(reference src/app.py query/list/search/versions parity)")
    c.add_argument("action", choices=["list", "search", "versions", "table", "deps"])
    c.add_argument("arg", nargs="?", help="search term / logcode (0xNNNN)")
    c.add_argument("--version", type=int, default=None)

    cu = sub.add_parser("curate", help="curate a documents corpus: quality + "
                        "language filter + exact dedup -> hash-sharded parquet")
    cu.add_argument("--docs", required=True,
                    help="path to a documents.parquet (schema: doc_id, text, ...)")
    cu.add_argument("--out", required=True)
    cu.add_argument("--quality-min", type=int, default=600,
                    help="minimum quality_milli (default 600)")
    cu.add_argument("--shards", type=int, default=16)
    cu.add_argument("--method", choices=["broadcast", "semijoin"], default=None,
                    help="curated-id filter regime (default: auto by id-set "
                    "size — broadcast pc.is_in below ~5M ids, distributed "
                    "semi-join beyond)")

    pr = sub.add_parser("prepare", help="full pretraining prep: split + "
                        "curate + decontaminate -> hash-sharded train "
                        "parquet with a manifest")
    pr.add_argument("--docs", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--quality-min", type=int, default=None)
    pr.add_argument("--shards", type=int, default=16)

    ps = sub.add_parser("prepare-seq", help="token-corpus prep: dedup by "
                        "token-array equality + 13-gram decontamination + "
                        "train split -> hash-sharded parquet with a manifest")
    ps.add_argument("--seq", required=True, help="sequences parquet dir")
    ps.add_argument("--out", required=True)
    ps.add_argument("--shards", type=int, default=16)

    sj = sub.add_parser("simjoin", help="EXACT all-pairs Jaccard >= 0.5 "
                        "over documents (PPJoin prefix filter) -> parquet")
    sj.add_argument("--sf-dir", required=True)
    sj.add_argument("--out", required=True)
    sj.add_argument("--num-cpus", type=int, default=None)

    pca = sub.add_parser("pca", help="PCA-project the embedding table "
                         "(top-8 components) -> parquet")
    pca.add_argument("--sf-dir", required=True)
    pca.add_argument("--out", required=True)
    pca.add_argument("--num-cpus", type=int, default=None)

    lk = sub.add_parser("leakage", help="eval-side contamination report: "
                        "per test doc, 8-gram overlap with train/val")
    lk.add_argument("--sf-dir", required=True)
    lk.add_argument("--out", default=None, help="optional parquet out")
    lk.add_argument("--num-cpus", type=int, default=None)

    pf = sub.add_parser("profile", help="profile a testdata dir: per-column "
                        "nulls + HLL distinct over events, plus robust "
                        "per-type stats (median / 3-sigma outlier count)")
    pf.add_argument("--sf-dir", required=True)

    cj = sub.add_parser("corpus", help="corpus interchange: streaming "
                        "JSONL export / import of a parquet table")
    cj_sub = cj.add_subparsers(dest="corpus_cmd", required=True)
    ce = cj_sub.add_parser("export-jsonl", help="parquet table -> JSONL shards")
    ce.add_argument("--sf-dir", required=True,
                    help="directory holding {table}.parquet")
    ce.add_argument("--out", required=True, help="JSONL shard directory")
    ce.add_argument("--table", default="documents")
    ci = cj_sub.add_parser("import-jsonl", help="JSONL shards -> parquet table")
    ci.add_argument("--src", required=True, help="JSONL shard directory")
    ci.add_argument("--out", required=True,
                    help="destination dir; writes {table}.parquet under it")
    ci.add_argument("--table", default="documents")

    md = sub.add_parser("metadata", help="emit REFERENCE-format metadata JSON "
                        "from the catalog (metadata_cli.py single/multi parity)")
    md.add_argument("--logcode", default=None, help="0xNNNN for single-logcode "
                    "form; omit for the multi-logcode document")
    md.add_argument("--out", required=True)

    rv = sub.add_parser("revision", help="revision-history queries "
                        "(reference src/app.py:170-260 / query_revisions.py)")
    rv_sub = rv.add_subparsers(dest="rev_cmd", required=True)
    r1 = rv_sub.add_parser("code", help="logcode sets of one revision (e.g. FL)")
    r1.add_argument("code")
    r2 = rv_sub.add_parser("date", help="revisions in a month/year")
    r2.add_argument("month")
    r2.add_argument("year")
    r3 = rv_sub.add_parser("logcode", help="revision history of one logcode")
    r3.add_argument("logcode")

    args = p.parse_args(argv)

    if args.cmd == "gen":
        from engine import datagen
        datagen.generate_sequences(args.rows, args.seed,
                                   os.path.join(args.out, "sequences"), args.files)
        datagen.generate_source_meta(os.path.join(args.out, "source_meta.parquet"))
        print(json.dumps({"out": args.out, "rows": args.rows}))
        return 0

    if args.cmd == "run":
        ray = _ensure_ray(args.num_cpus)
        from engine.pipeline import run_job
        import time
        t0 = time.monotonic()
        agg = run_job(args.input, args.out, args.source_meta,
                      num_partitions=args.partitions, batch_size=args.batch_size,
                      resume=not args.no_resume,
                      use_actor_stages=args.actor_stages,
                      target_num_blocks=args.target_num_blocks,
                      version_fallback=args.version_fallback)
        print(json.dumps({"out": args.out, "agg_rows": agg.num_rows,
                          "wall_s": round(time.monotonic() - t0, 3)}))
        _release_ray(ray)
        return 0

    if args.cmd == "decode":
        ray = _ensure_ray(args.num_cpus)
        import json as _json
        from engine import sources
        from engine.export import JsonBuilder, append_jsonl, write_compact, write_pretty
        ds = sources.read_hex_packets(args.input)
        builder = JsonBuilder(metadata_path=args.metadata,
                              version_fallback=args.version_fallback,
                              include_timing=True)
        rows = []
        for t in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            docs = builder.build_rows(t)
            errs = t["ingest_error"].to_pylist()
            for doc_id, d, ie in zip(t["doc_id"].to_pylist(), docs, errs):
                if d is None:
                    d = {"doc_id": doc_id, "error": "undecodable",
                         "ingest_error": int(ie)}
                rows.append(d)
        if len(rows) == 1:
            (write_compact if args.compact else write_pretty)(rows[0], args.out)
        else:
            if os.path.exists(args.out):
                os.remove(args.out)
            for d in rows:
                append_jsonl(d, args.out)
        print(_json.dumps({"out": args.out, "packets": len(rows)}))
        _release_ray(ray)
        return 0

    if args.cmd == "run-hex":
        ray = _ensure_ray(args.num_cpus)
        from engine.pipeline import run_hex_job
        agg = run_hex_job(args.input, args.metadata, args.out,
                          version_fallback=args.version_fallback)
        print(json.dumps({"out": args.out, "agg_rows": agg.num_rows}))
        _release_ray(ray)
        return 0

    if args.cmd == "compact":
        ray = _ensure_ray(args.num_cpus)
        from engine.pipeline import compact_sinks
        print(json.dumps(compact_sinks(args.out, args.max_files)))
        _release_ray(ray)
        return 0

    if args.cmd == "replay":
        ray = _ensure_ray(args.num_cpus)
        from engine.pipeline import replay_dead_letters
        agg = replay_dead_letters(args.out, metadata_path=args.metadata,
                                  version_fallback=args.version_fallback)
        print(json.dumps({"out": args.out, "agg_rows": agg.num_rows}))
        _release_ray(ray)
        return 0

    if args.cmd == "agg":
        from engine.pipeline import fold_aggregate
        agg = fold_aggregate(args.out)
        print(agg.to_pandas().to_string(index=False))
        return 0

    if args.cmd == "show":
        with open(os.path.join(args.out, "sink_counts.json")) as f:
            print(json.dumps(json.load(f), indent=1))
        import pyarrow.parquet as pq
        agg = pq.read_table(os.path.join(args.out, "agg.parquet"))
        print(agg.to_pandas().head(20).to_string(index=False))
        return 0

    if args.cmd == "catalog":
        from engine import catalog_query as cq
        if args.action == "list":
            rows = cq.list_logcodes()
        elif args.action == "search":
            rows = cq.search_logcodes(args.arg or "")
        elif args.action == "versions":
            rows = cq.versions_of(args.arg)
        elif args.action == "table":
            rows = cq.table_layout(args.arg, args.version or 1)
        else:
            rows = [{"table": t} for t in cq.dependency_closure(args.arg)]
        for r in rows:
            print(json.dumps(r))
        return 0

    if args.cmd == "curate":
        ray = _ensure_ray(args.num_cpus)
        from engine.curate import curate_to_parquet
        stats = curate_to_parquet(args.docs, args.out,
                                  quality_min=args.quality_min,
                                  num_shards=args.shards, method=args.method)
        print(json.dumps(stats))
        _release_ray(ray)
        return 0

    if args.cmd == "prepare":
        ray = _ensure_ray(args.num_cpus)
        from engine.prepare import prepare_to_parquet
        stats = prepare_to_parquet(args.docs, args.out,
                                   quality_min=args.quality_min,
                                   num_shards=args.shards)
        print(json.dumps(stats))
        _release_ray(ray)
        return 0

    if args.cmd == "prepare-seq":
        ray = _ensure_ray(args.num_cpus)
        from engine.tokenops import prepare_sequences_to_parquet
        stats = prepare_sequences_to_parquet(args.seq, args.out,
                                             num_shards=args.shards)
        print(json.dumps(stats))
        _release_ray(ray)
        return 0

    if args.cmd == "simjoin":
        ray = _ensure_ray(args.num_cpus)
        from engine.ppjoin import _PAIR_SCHEMA, q_ppjoin_pairs
        ds = q_ppjoin_pairs(args.sf_dir)
        from engine.pipeline import scrub_empty_blocks
        os.makedirs(args.out, exist_ok=True)
        scrub_empty_blocks(ds, _PAIR_SCHEMA).write_parquet(args.out)
        import pyarrow.dataset as pds
        n = pds.dataset(args.out).count_rows()
        print(json.dumps({"out": args.out, "pairs": int(n)}))
        _release_ray(ray)
        return 0

    if args.cmd == "pca":
        ray = _ensure_ray(args.num_cpus)
        from engine.linalg import q_pca_project
        os.makedirs(args.out, exist_ok=True)
        q_pca_project(args.sf_dir).write_parquet(args.out)
        import pyarrow.dataset as pds
        n = pds.dataset(args.out).count_rows()
        print(json.dumps({"out": args.out, "rows": int(n)}))
        _release_ray(ray)
        return 0

    if args.cmd == "leakage":
        ray = _ensure_ray(args.num_cpus)
        import pyarrow.compute as pc
        from engine.decontam import q_contamination_report
        t = q_contamination_report(args.sf_dir)
        leaked = t.filter(pc.greater(t["n_leaked"], 0)).num_rows \
            if t.num_rows else 0
        if args.out:
            import pyarrow.parquet as _pq
            _pq.write_table(t, args.out)
        print(json.dumps({"eval_docs": t.num_rows,
                          "docs_with_leaks": int(leaked),
                          "out": args.out}))
        _release_ray(ray)
        return 0

    if args.cmd == "profile":
        ray = _ensure_ray(args.num_cpus)
        from engine.robust import q_median_value_by_type, q_value_outliers
        from engine.sketch import q_table_profile
        prof = q_table_profile(args.sf_dir).to_pylist()
        med = q_median_value_by_type(args.sf_dir).to_pylist()
        out = q_value_outliers(args.sf_dir)
        out = out.count() if hasattr(out, "count") else len(out)
        print(json.dumps({"columns": prof, "median_by_type": med,
                          "n_outliers_3sigma": int(out)}))
        _release_ray(ray)
        return 0

    if args.cmd == "corpus":
        ray = _ensure_ray(args.num_cpus)
        from engine.io import export_jsonl_corpus, import_jsonl_corpus
        if args.corpus_cmd == "export-jsonl":
            out = export_jsonl_corpus(args.sf_dir, args.out, table=args.table)
        else:
            out = import_jsonl_corpus(args.src, args.out, table=args.table)
        print(json.dumps({"out": out, "table": args.table}))
        _release_ray(ray)
        return 0

    if args.cmd == "metadata":
        from engine.ref_metadata import generate_metadata_json
        mt = int(args.logcode, 16) if args.logcode else None
        doc = generate_metadata_json(mt)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=2)
        n = 1 if mt is not None else len(doc["logcodes"])
        print(json.dumps({"out": args.out, "logcodes": n}))
        return 0

    if args.cmd == "revision":
        from engine import revisions as rev
        if args.rev_cmd == "code":
            res = rev.revision_by_code(args.code)
            if res is None:
                print(json.dumps({"error": f"revision {args.code.upper()} not found"}))
                return 1
            print(json.dumps(res))
        elif args.rev_cmd == "date":
            for r in rev.revisions_by_date(args.month, args.year):
                print(json.dumps(r))
        else:
            for r in rev.revision_history(args.logcode):
                print(json.dumps(r))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
