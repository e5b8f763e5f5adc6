"""Two-parallelism scaling datum for the shared-mutable-index dedup plan
(engine/dedupindex.py) — the raw-actor RPC pattern, measured rather than
argued: ingest a slice of the 32M-row bench sequence corpus (token-array
hashes) through the sharded index at num_cpus=8 and num_cpus=32 in fresh
Ray sessions, report wall, rows/s and the efficiency ratio.

    python BENCH/index_dedup.py          # 8 files (~4.1M rows)
    INDEX_FILES=16 python BENCH/index_dedup.py
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import glob, json, logging, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
ray.init(address="local", num_cpus=%(cpus)d, include_dashboard=False,
         log_to_driver=False)
logging.getLogger("ray.data").setLevel(logging.ERROR)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from engine.dedupindex import ShardedDedupIndex
from engine.tokenops import token_array_hash

files = sorted(glob.glob(
    "/dev/shm/graft_fixtures/bench/sequences/*.parquet"))[:%(files)d]
# the stateful fleet scales WITH the cluster (a larger cluster hosts more
# shards) — the map-task count alone cannot add index throughput
idx = ShardedDedupIndex(%(cpus)d)
shards, n = idx.shards, idx.n

def fold(t):
    import pandas as pd
    h = np.asarray(token_array_hash(t["tokens"]))
    if h.dtype == np.uint64:
        h = h.view(np.int64)
    ids = pd.util.hash_pandas_object(
        pd.Series(t["doc_id"].to_pandas()), index=False).to_numpy() \
        .view(np.int64)
    uniq, inv = np.unique(h, return_inverse=True)
    mins = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(mins, inv, ids)
    cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    shx = (uniq %% n + n) %% n
    ray.get([shards[s].offer.remote(uniq[shx == s], mins[shx == s],
                                    cnts[shx == s])
             for s in range(n) if (shx == s).any()])
    return pa.table({"rows": pa.array([t.num_rows], type=pa.int64())})

t0 = time.time()
ds = ray.data.read_parquet(files, columns=["doc_id", "tokens"])
from engine.pipeline import collect_tables
parts = [p for p in collect_tables(ds.map_batches(
    fold, batch_format="pyarrow", batch_size=None)) if p.num_columns]
rows = int(sum(p["rows"].to_numpy().sum() for p in parts))
survivors = idx.dump().num_rows
wall = time.time() - t0
idx.shutdown()
ray.shutdown()
print(json.dumps({"cpus": %(cpus)d, "rows": rows, "sec": round(wall, 3),
                  "rows_per_sec": int(rows / wall),
                  "survivors": survivors}))
"""


def run(cpus: int, files: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO, "cpus": cpus,
                                         "files": files}],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    files = int(os.environ.get("INDEX_FILES", "8"))
    r8 = run(8, files)
    r32 = run(32, files)
    eff = (r32["rows_per_sec"] / r8["rows_per_sec"]) / 4.0
    res = {"metric": "index_dedup_scaling_efficiency_8_to_32",
           "value": round(eff, 3), "unit": "ratio",
           "job": f"sharded-index exact dedup ({r8['rows']} rows, "
                  f"shards = cluster CPUs)",
           "sec_8": r8["sec"], "sec_32": r32["sec"],
           "rows_per_sec_8": r8["rows_per_sec"],
           "rows_per_sec_32": r32["rows_per_sec"],
           "survivors": r32["survivors"]}
    print(json.dumps(res))
    with open(os.path.join(REPO, "BENCH", "index_dedup.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
