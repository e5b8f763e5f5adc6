"""Shared Parquet reading helper.

``read_parquet_clean`` strips file-level schema metadata (e.g. the
``pandas`` blob written by pandas-backed producers) by passing an explicit
metadata-free ``schema=`` to ``ray.data.read_parquet``.  This pyarrow
build cannot hash a schema that carries metadata (``hash(Schema)`` tries
to hash the metadata dict and raises), which silently disables Ray Data's
block-schema deduplication and floods every worker's log with
``Failed to hash the schemas (for deduplication)`` warnings on each block
merge.  Stripping at the read restores schema dedup for the whole
downstream plan.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence, Union

# Eagerly finish the fsspec import chain at module-import time: Ray Data's
# write path lazy-imports fsspec from several IO threads at once inside a
# fresh worker, and the concurrent partial import intermittently raises
# "partially initialized module 'fsspec' has no attribute 'utils'"
# (observed once in a fused ReadArrowJSON->Write task).  Workers import
# this module single-threaded while deserializing the UDF, which closes
# the race window for every downstream stage in the same process.
try:  # pragma: no cover - import-order workaround
    import fsspec.utils  # noqa: F401
except Exception:  # fsspec genuinely absent: Ray's local-path IO still works
    pass


def _first_file(path: Union[str, Sequence[str]]) -> Optional[str]:
    if isinstance(path, (list, tuple)):
        return path[0] if path else None
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        return files[0] if files else None
    return path


def read_parquet_clean(path, columns=None, **kw):
    import pyarrow.parquet as pq
    import ray

    if "schema" not in kw:
        try:
            f = _first_file(path)
            if f:
                s = pq.read_schema(f)
                if s.metadata:
                    s = s.remove_metadata()
                    if columns:
                        # an explicit schema overrides the column projection
                        # in this Ray version: subset it ourselves
                        import pyarrow as pa
                        s = pa.schema([s.field(c) for c in columns])
                    kw["schema"] = s
        except Exception:
            pass  # fall back to Ray's own schema inference
    return ray.data.read_parquet(path, columns=columns, **kw)


def export_jsonl_corpus(sf_dir: str, dst_dir: str,
                        table: str = "documents") -> str:
    """Streaming Parquet -> JSONL export of a corpus table: one pass of
    ``Dataset.write_json`` (one shard file per block, no driver
    materialization).  The interchange format of web-scale corpora
    (Common Crawl / Dolma dumps ship as JSONL)."""
    ds = read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"))
    ds.write_json(dst_dir)
    return dst_dir


def import_jsonl_corpus(src_dir: str, dst_dir: str,
                        table: str = "documents") -> str:
    """Streaming JSONL -> Parquet ingestion: the shard list fans out as a
    Dataset of paths and each task parses its shard with
    ``pyarrow.json.read_json`` (the C++ reader) inside ``map_batches``,
    then ``write_parquet``.  Scale shape: reader parallelism = shard
    count, no shuffle, no materialization; the result directory is
    readable by every ``queries()`` operator as its ``{table}.parquet``.
    JSONL escapes embedded newlines/tabs, so text columns round-trip
    exactly; int64 ids survive because Arrow's JSON reader infers int64
    (never float) for integral columns.

    Deliberately NOT ``ray.data.read_json``: Ray's ArrowJSONDatasource
    path lazy-imports fsspec inside worker task threads, which
    intermittently dies with "partially initialized module 'fsspec'"
    (a concurrent-import race observed twice in full-suite runs); the
    direct pyarrow reader has no fsspec surface at all."""
    import pyarrow as pa
    import pyarrow.json as pj
    import ray

    files = sorted(
        f for f in glob.glob(os.path.join(src_dir, "*"))
        if f.endswith((".json", ".jsonl")))
    if not files:
        raise FileNotFoundError(f"no JSONL shards under {src_dir}")
    names = pj.read_json(files[0]).schema.names  # canonical column order
    if table == "documents":
        pref = [c for c in ("doc_id", "text", "lang", "source", "n_chars")
                if c in names]
        order = pref + [c for c in names if c not in pref]
    else:
        order = list(names)

    def read_shard(t: pa.Table) -> pa.Table:
        tabs = [pj.read_json(p) for p in t["path"].to_pylist()]
        merged = pa.concat_tables(tabs, promote_options="default")
        return merged.select(order)

    ds = ray.data.from_arrow(pa.table({"path": pa.array(files)})) \
        .repartition(len(files)) \
        .map_batches(read_shard, batch_format="pyarrow", batch_size=None)
    out = os.path.join(dst_dir, f"{table}.parquet")
    ds.write_parquet(out)
    return dst_dir
