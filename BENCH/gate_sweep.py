"""Full local mirror of the driver's correctness gate at any scale.

Runs EVERY ``__ray_entry__.queries()`` entry against the given testdata
dir and compares the DuckDB ``oracle_sql()`` result (row count, column
set, order-insensitive values).  The telemetry oracles reference the
committed sf0.01 fixture corpus by absolute path; at other scales the
path is substituted with that scale's regenerated fixture root
(``engine.fixtures.ensure_fixtures``), exactly as tests/test_queries.py
does at sf0.001.

    python BENCH/gate_sweep.py /root/testdata/sf0.01
    python BENCH/gate_sweep.py /root/testdata/sf0.1   # 10x driver scale
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e
    from engine import fixtures
    from engine.queries import FIX01

    fix_root = fixtures.ensure_fixtures(fixtures.sf_of(sf))
    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    fails = []
    for name in sorted(qs):
        t0 = time.time()
        try:
            res = qs[name](sf)
            got = res.to_pandas() if hasattr(res, "to_pandas") else res
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
            if name not in sqls:
                print(f"{name:36s} rows-only  {len(got):>8} rows  "
                      f"{time.time() - t0:5.1f}s")
                continue
            want = con.sql(sqls[name].replace(FIX01, fix_root)).df()
            ok_rows = len(got) == len(want)
            ok_schema = sorted(got.columns) == sorted(want.columns)
            ok_vals = ok_rows and ok_schema
            if ok_vals and len(want):
                cols = sorted(got.columns)
                g = got[cols].sort_values(cols, ignore_index=True).astype(object)
                w = want[cols].sort_values(cols, ignore_index=True).astype(object)
                ok_vals = g.equals(w)
            status = "OK " if (ok_rows and ok_schema and ok_vals) else "FAIL"
            if status == "FAIL":
                fails.append(name)
            print(f"{name:36s} {status} rows={len(got)}/{len(want)} "
                  f"schema={ok_schema} vals={ok_vals}  {time.time() - t0:5.1f}s")
        except Exception as ex:
            fails.append(name)
            print(f"{name:36s} ERROR {type(ex).__name__}: {ex}")
    gated = len([n for n in qs if n in sqls])
    print(f"\n{len(qs)} queries, {gated} gated, FAILURES: {fails or 'none'}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
