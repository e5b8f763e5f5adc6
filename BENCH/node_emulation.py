#!/usr/bin/env python
"""N-vs-4N NODE emulation on one box: separate Ray instances as "nodes".

The north rule's scaling criterion compares cluster sizes N and 4N
*nodes*.  A single-session 8-vs-32-CPU comparison is NOT that experiment:
it scales workers inside one scheduler AND one shared memory subsystem.
This script emulates node count directly — a "node" is an isolated Ray
instance (own raylet, own object store, own driver) pinned to 8 CPUs and
processing its own quarter of the corpus, exactly how a real cluster
partitions a 100 TB job:

* phase A: 1 node  x 8 CPUs over one quarter        -> throughput T1
* phase B: 4 nodes x 8 CPUs, CONCURRENTLY, one quarter each
           -> aggregate throughput T4 = total rows / max(node wall)

node-scaling efficiency = T4 / (4 * T1).

What this isolates: with separate schedulers/object stores, any
efficiency loss that remains is the one resource this box cannot
replicate per node — the shared memory bus — while a loss that
DISAPPEARS versus the single-session 8->32 number would have been Ray
scheduling overhead.  Each node process warms its worker pool untimed
first (cold start is a per-node constant, not a scaling property).

Usage:  python BENCH/node_emulation.py            # orchestrator
        python BENCH/node_emulation.py --node ... # child (internal)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_BASE = "/dev/shm/graft_node_emulation"
NODE_CPUS = int(os.environ.get("NODE_CPUS", "8"))
NUM_NODES = 4


LSH_BASE = "/dev/shm/graft_node_lsh"
LSH_SRC = os.environ.get("LSH_DOCS_SF", "/root/testdata/sf0.1")


def _quarters():
    sys.path.insert(0, REPO)
    from engine import fixtures
    root = fixtures.ensure_fixtures("bench")
    files = sorted(glob.glob(os.path.join(root, "sequences", "*.parquet")))
    q = len(files) // NUM_NODES
    return root, [files[i * q:(i + 1) * q] for i in range(NUM_NODES)]


LSH_REPL = int(os.environ.get("LSH_REPL", "16"))


def _lsh_quarters():
    """Split the documents corpus into NUM_NODES row-range quarters, each
    written as its own sf-dir (idempotent) — how a real cluster would
    shard a 100 TB dedup job across nodes.

    The sf0.1 documents table is only 5k rows (a ~1.7 s per-node job —
    pure fixed overhead), so each quarter gets LSH_REPL copy-major
    replicas with re-numbered ids and two per-copy salt tokens appended:
    within a copy the near-dup structure is the original corpus's; across
    copies docs are deliberate near-dups (realistic boilerplate), spread
    evenly so every quarter carries identical workload."""
    sys.path.insert(0, REPO)
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    marker = os.path.join(LSH_BASE, "_ready.json")
    dirs = [os.path.join(LSH_BASE, f"q{i}") for i in range(NUM_NODES)]
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("repl") == LSH_REPL:
                return dirs
    t = pq.read_table(os.path.join(LSH_SRC, "documents.parquet"))
    n = t.num_rows
    copies = []
    for c in range(LSH_REPL):
        ids = pc.add(pc.cast(t["doc_id"], pa.int64()), 1_000_000 * c)
        salt = pa.array([f" q{c} z{c}x{j % 97}" for j in range(n)])
        txt = pc.binary_join_element_wise(
            pc.fill_null(t["text"], ""), salt, "")
        copies.append(pa.table({
            "doc_id": ids, "text": txt,
            "lang": t["lang"], "source": t["source"],
            "n_chars": t["n_chars"]}))
    big = pa.concat_tables(copies)
    q = big.num_rows // NUM_NODES
    for i, d in enumerate(dirs):
        os.makedirs(d, exist_ok=True)
        m = q if i < NUM_NODES - 1 else big.num_rows - q * (NUM_NODES - 1)
        pq.write_table(big.slice(i * q, m),
                       os.path.join(d, "documents.parquet"))
    with open(marker, "w") as f:
        json.dump({"src": LSH_SRC, "rows": big.num_rows,
                   "repl": LSH_REPL}, f)
    return dirs


def run_node_lsh(qdir: str, tag: str) -> dict:
    """One node's MinHash-LSH near-dup pass over its corpus quarter —
    the one pipeline with a real all-to-all (the band groupby)."""
    import ray
    ray.init(address="local", num_cpus=NODE_CPUS, include_dashboard=False,
             logging_level="ERROR", object_store_memory=4 * 1024**3)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import pyarrow.parquet as pq
    from engine.dedup import q_dedup_minhash_lsh
    rows = pq.read_metadata(os.path.join(qdir, "documents.parquet")).num_rows
    q_dedup_minhash_lsh(qdir)        # untimed warmup (worker pool spin-up)
    t0 = time.monotonic()
    out = q_dedup_minhash_lsh(qdir)
    wall = time.monotonic() - t0
    ray.shutdown()
    return {"wall": round(wall, 3), "rows": rows, "pairs": out.num_rows,
            "tag": tag}


def run_node_seqdedup(files, tag: str) -> dict:
    """One node's token-array-equality dedup over its quarter of the
    bench sequences corpus — the heaviest bench pipeline, whose exchange
    moves EVERY row (~32 B/row partials): round-5 #4, pinning whether
    its single-session 8->32 = 0.62 is host contention like the others
    or an all-to-all penalty of its own."""
    import ray
    ray.init(address="local", num_cpus=NODE_CPUS, include_dashboard=False,
             logging_level="ERROR", object_store_memory=4 * 1024**3)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import pyarrow.parquet as pq

    from engine.tokenops import _sequence_dedup_ds
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    # untimed warmup (worker pool spin-up) on a slice
    _sequence_dedup_ds(ray.data.read_parquet(files).limit(100_000),
                       rows_hint=100_000).count()
    t0 = time.monotonic()
    n = _sequence_dedup_ds(ray.data.read_parquet(files),
                           rows_hint=rows).count()
    wall = time.monotonic() - t0
    ray.shutdown()
    return {"wall": round(wall, 3), "rows": rows, "survivors": n,
            "tag": tag}


def run_node(files, meta_path: str, out_dir: str, tag: str) -> dict:
    import ray
    # cap the per-node object store: 4 concurrent instances must not each
    # claim the default ~30% of system memory
    ray.init(address="local", num_cpus=NODE_CPUS, include_dashboard=False,
             logging_level="ERROR", object_store_memory=4 * 1024**3)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import pyarrow.parquet as pq
    from engine.pipeline import run_partition, fold_aggregate
    import ray as _ray

    meta_ref = _ray.put(pq.read_table(meta_path))
    # untimed warmup: spawn the worker pool on a slice
    warm = os.path.join(out_dir, "_warm")
    os.makedirs(warm, exist_ok=True)
    run_partition(files[:2], warm, "w0", meta_ref, target_num_blocks=16)
    shutil.rmtree(warm, ignore_errors=True)

    rows = sum(pq.read_metadata(f).num_rows for f in files)
    t0 = time.monotonic()
    run_partition(files, out_dir, tag, meta_ref,
                  target_num_blocks=max(16, rows // 250_000))
    wall = time.monotonic() - t0
    ray.shutdown()
    return {"wall": round(wall, 3), "rows": rows, "tag": tag}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--node", type=int, default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--job", choices=("flagship", "lsh", "seqdedup"),
                   default="flagship")
    args = p.parse_args()

    if args.node is not None:  # child
        if args.job == "lsh":
            res = run_node_lsh(_lsh_quarters()[args.node], f"n{args.node}")
        elif args.job == "seqdedup":
            _, quarters = _quarters()
            res = run_node_seqdedup(quarters[args.node], f"n{args.node}")
        else:
            root, quarters = _quarters()
            res = run_node(quarters[args.node],
                           os.path.join(root, "source_meta.parquet"),
                           args.out, f"n{args.node}")
        print(json.dumps(res))
        return 0

    # orchestrator
    if args.job == "lsh":
        _lsh_quarters()
    else:
        _quarters()
    shutil.rmtree(OUT_BASE, ignore_errors=True)

    def spawn(node: int) -> subprocess.Popen:
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--node", str(node),
             "--out", os.path.join(OUT_BASE, f"node{node}"),
             "--job", args.job],
            stdout=subprocess.PIPE, text=True, cwd=REPO)

    def result(proc: subprocess.Popen) -> dict:
        out, _ = proc.communicate()
        return json.loads(out.strip().splitlines()[-1])

    # phase A: one node, best-of-2
    a_runs = []
    for _ in range(2):
        a_runs.append(result(spawn(0)))
        time.sleep(5)
    a = min(a_runs, key=lambda r: r["wall"])
    t1 = a["rows"] / a["wall"]

    # phase B: 4 nodes concurrently, best-of-2
    b_runs = []
    for _ in range(2):
        procs = [spawn(i) for i in range(NUM_NODES)]
        results = [result(pr) for pr in procs]
        total_rows = sum(r["rows"] for r in results)
        wall = max(r["wall"] for r in results)
        b_runs.append({"agg_rows_per_sec": total_rows / wall,
                       "walls": [r["wall"] for r in results]})
        time.sleep(5)
    b = max(b_runs, key=lambda r: r["agg_rows_per_sec"])

    eff = b["agg_rows_per_sec"] / (NUM_NODES * t1)
    res = {
        "metric": f"node_scaling_efficiency_1_to_4_{args.job}",
        "value": round(eff, 3),
        "unit": "ratio",
        "job": args.job,
        "node_cpus": NODE_CPUS,
        "one_node_rows_per_sec": round(t1),
        "four_node_agg_rows_per_sec": round(b["agg_rows_per_sec"]),
        "one_node_wall": a["wall"],
        "four_node_walls": b["walls"],
        "note": "separate Ray instances (own raylet/object store/driver) "
                "on disjoint corpus quarters; residual loss is the shared "
                "memory bus, the one per-node resource a single box cannot "
                "replicate",
    }
    out_name = {"flagship": "node_emulation.json",
                "lsh": "node_emulation_lsh.json",
                "seqdedup": "node_emulation_seqdedup.json"}[args.job]
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(res, f, indent=1)
    with open(os.path.join(REPO, "BENCH", "scaling_history.jsonl"), "a") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
