"""Deterministic fixture management for the sequences corpus.

Small scales (sf0.001, sf0.01) live under the repo at ``fixtures/<sf>/`` so
the driver's DuckDB oracle SQL can reference them by absolute path
(``read_parquet('/root/repo/fixtures/sf0.01/sequences/*.parquet')``); larger
scales are generated on demand under ``/tmp``.  Same (sf, SEED) always
yields identical content (seeded numpy; no wall-clock — cf. the reference's
checkpointed deterministic reruns, src/parallel_pdf_parser.py:145-157).
"""

from __future__ import annotations

import json
import os

from engine import datagen
from engine.catalog import catalog_to_json

SEED = 20260817
REPO_FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
TMP_FIXDIR = "/dev/shm/graft_fixtures"

ROWS = {
    "sf0.001": 2_000,
    "sf0.01": 20_000,
    "sf0.1": 200_000,
    "bench": 32_000_000,
}

NUM_FILES = {"sf0.001": 8, "sf0.01": 8, "sf0.1": 16, "bench": 64}


def sf_of(sf_dir: str) -> str:
    """Map a driver sf_dir like /root/testdata/sf0.01 to a fixture scale."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        if sf_dir.rstrip("/").endswith(sf):
            return sf
    return "sf0.01"


def fixture_root(sf: str) -> str:
    return os.path.join(REPO_FIXDIR if sf in ("sf0.001", "sf0.01") else TMP_FIXDIR, sf)


def ensure_fixtures(sf: str = "sf0.01", num_files: int = 0) -> str:
    """Idempotently generate the corpus for a scale; returns its directory."""
    num_files = num_files or NUM_FILES.get(sf, 8)
    root = fixture_root(sf)
    marker = os.path.join(root, "_SUCCESS.json")
    # v3: catalog gained 0x7F01 DeviceInfo (String field, M12) + its stratum
    # v4: revision-history snapshots (revisions.parquet, logcodes.parquet)
    want = {"sf": sf, "rows": ROWS[sf], "seed": SEED, "num_files": num_files, "v": 4}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == want:
                    return root
        except Exception:
            pass
    datagen.generate_sequences(ROWS[sf], SEED, os.path.join(root, "sequences"), num_files)
    datagen.generate_source_meta(os.path.join(root, "source_meta.parquet"))
    with open(os.path.join(root, "catalog.json"), "w") as f:
        f.write(catalog_to_json())
    import pyarrow.parquet as _pq
    from engine import revisions as _rev
    _pq.write_table(_rev.build_revisions(), os.path.join(root, "revisions.parquet"))
    _pq.write_table(_rev.build_logcodes(), os.path.join(root, "logcodes.parquet"))
    with open(marker, "w") as f:
        json.dump(want, f)
    return root


def sequences_dir(sf: str = "sf0.01") -> str:
    return os.path.join(ensure_fixtures(sf), "sequences")


def source_meta_path(sf: str = "sf0.01") -> str:
    return os.path.join(ensure_fixtures(sf), "source_meta.parquet")
