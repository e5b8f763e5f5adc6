#!/usr/bin/env python
"""Single-box concurrency probe (no Ray): run the identical decode+write
workload in K parallel OS processes and measure per-process wall time.

This isolates the hardware from the framework: if per-process time
inflates as K grows, the box's shared memory subsystem — not Ray — is the
scaling ceiling at high K, which is the evidence behind BASELINE.md's
explanation of the 8->32 efficiency number (a real 4N-node cluster adds
memory bandwidth with every node; one box does not).

Usage: python BENCH/contention_probe.py   (from the repo root)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCH_ROWS = 140_000
REPEATS = 3


def _build_batch():
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    from engine.stages import Enricher, parse_batch
    t = pads.dataset("fixtures/sf0.01/sequences").to_table().combine_chunks()
    big = pa.concat_tables([t] * 7).combine_chunks()
    big = parse_batch(big)
    return Enricher(pq.read_table("fixtures/sf0.01/source_meta.parquet"))(big)


def _worker(out_root: str, idx: int, q) -> None:
    import pyarrow as pa  # noqa: F401  (per-process imports = real worker shape)
    from engine.stages import DecodeRouter
    batch = _build_batch()
    router = DecodeRouter(os.path.join(out_root, f"w{idx}"))
    t0 = time.monotonic()
    for _ in range(REPEATS):
        router(batch)
    q.put(time.monotonic() - t0)


def run_level(k: int) -> float:
    out_root = f"/dev/shm/contention_probe_{k}"
    shutil.rmtree(out_root, ignore_errors=True)
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(out_root, i, q)) for i in range(k)]
    for p in procs:
        p.start()
    walls = [q.get() for _ in procs]
    for p in procs:
        p.join()
    shutil.rmtree(out_root, ignore_errors=True)
    return sum(walls) / len(walls) / REPEATS  # mean per-batch seconds


if __name__ == "__main__":
    mp.set_start_method("spawn")
    results = {}
    for k in (1, 2, 8, 16, 32):
        per_batch = run_level(k)
        results[str(k)] = round(per_batch, 4)
        print(f"K={k:2d} parallel procs: {per_batch*1000:7.1f} ms per "
              f"{N_BATCH_ROWS}-row batch per process", flush=True)
    base = results["1"]
    results["inflation_32_vs_1"] = round(results["32"] / base, 2)
    results["inflation_8_vs_1"] = round(results["8"] / base, 2)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "contention.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
