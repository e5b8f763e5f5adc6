"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse -> enrich -> route -> aggregate job on
the sf0.001 fixture corpus; ``queries()``/``oracle_sql()`` expose every
implemented operator with a DuckDB-checkable equivalent (see
engine/queries.py for the determinism conventions).  Ray is initialised by
the driver before import — nothing here calls ray.init()/shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    import os
    import shutil

    import ray

    from engine.fixtures import ensure_fixtures
    from engine.pipeline import run_job

    root = ensure_fixtures("sf0.001")
    out = "/tmp/graft_entry_out"
    shutil.rmtree(out, ignore_errors=True)
    agg = run_job(os.path.join(root, "sequences"), out,
                  os.path.join(root, "source_meta.parquet"), num_partitions=1)
    return ray.data.from_arrow(agg)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md section 2
    plus the training-data operators (dedup / similarity / text analysis /
    multimodal)."""
    from engine.queries import QUERIES
    q = dict(QUERIES)
    try:
        from engine.extras import EXTRA_QUERIES
        q.update(EXTRA_QUERIES)
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (telemetry queries reference the
    committed deterministic fixture corpus by absolute path; relational
    queries use the pre-registered testdata views).  Queries without an
    entry here are non-SQL-expressible (stateful/model/iterative) and get
    the driver's rows-only check."""
    from engine.queries import ORACLE_SQL
    s = dict(ORACLE_SQL)
    try:
        from engine.extras import EXTRA_ORACLE_SQL
        s.update(EXTRA_ORACLE_SQL)
    except ImportError:
        pass
    return s
