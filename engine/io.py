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
