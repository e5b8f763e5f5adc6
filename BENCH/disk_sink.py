#!/usr/bin/env python
"""One recorded DISK-sink headline run (VERDICT r2 #9).

The bench normally writes sink parquet to tmpfs because this sandbox has a
single ~80 MB/s shared disk, while a real N-node cluster brings N nodes'
worth of disks (storage bandwidth scales with the cluster).  This script
measures the same headline job with the sink on the real disk so the
write-bound regime is a recorded number, not a footnote: it runs bench.py
twice in fresh processes — sink on /dev/shm, then sink on /tmp (disk) —
and writes both headline walls plus the ratio to BENCH/disk_sink.json.
"""

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_with_sink(out_dir: str) -> dict:
    env = dict(os.environ, GRAFT_BENCH_OUT=out_dir)
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True, check=True,
                       cwd=REPO)
    time.sleep(8)  # let the Ray session teardown settle
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> dict:
    disk_dir = "/tmp/graft_bench_out_disk"
    shutil.rmtree(disk_dir, ignore_errors=True)
    tmpfs = run_with_sink("/dev/shm/graft_bench_out")
    disk = run_with_sink(disk_dir)
    shutil.rmtree(disk_dir, ignore_errors=True)
    out = {
        "metric": "disk_sink_headline_sec",
        "value": disk["value"],
        "unit": "sec",
        "tmpfs_headline_sec": tmpfs["value"],
        "disk_over_tmpfs": round(disk["value"] / tmpfs["value"], 3),
        "queries_disk": disk["queries"],
        "queries_tmpfs": tmpfs["queries"],
        "num_cpus": disk["num_cpus"],
        "note": "sink parquet on the shared ~80 MB/s sandbox disk vs tmpfs; "
                "timings best-of-3 inside each bench run",
    }
    with open(os.path.join(HERE, "disk_sink.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
