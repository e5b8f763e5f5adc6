"""The full pretraining-data preparation composite.

``prepare_to_parquet`` chains the gated single-op stages into the
pipeline a pretraining-data team actually ships:

  1. split        — md5 doc-id train/val/test (corpus.q_corpus_split rule)
  2. curate       — quality + language filter + exact dedup
                    (curate.q_curate_corpus, one profile pass)
  3. decontaminate— drop TRAIN docs sharing any word-8-gram with the
                    held-out test split (decontam.q_decontaminate)
  4. shard + write— train-split survivors as hash-sharded parquet
                    (shard = doc_id % N, resumable per shard) plus a
                    ``_prepare_manifest.json`` of per-stage counts

Every stage is the SAME kernel its gated query runs — this module adds
composition and bookkeeping only, so the correctness of each step is
already driver-checked.  Scale posture: the curated-id and
contaminated-id sets ride a broadcast/semijoin dual path on the
``curate.ID_BROADCAST_MAX`` contract — at or below the cap the sorted
int64 arrays broadcast once via ``ray.put`` and filter with one
vectorized ``pc.is_in`` per batch; past it the id sets never leave the
cluster: they stay materialized id-only Datasets (8 B/row, object
store) and membership becomes Ray's hash-partitioned ``left_semi`` /
``left_anti`` joins, so a corpus-sized survivor set ships each id to
exactly one partition with ZERO driver-resident bytes.  Both regimes
are value-identical (tests/test_prepare_semijoin.py pins byte-equal
sharded output); everything else is pure maps.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: introspection for the scale tests (filters.LAST_DUP_SET precedent):
#: mode, id-set sizes, and how many id BYTES the driver held.
LAST_PREPARE = {"mode": None, "n_curated": 0, "n_contaminated": 0,
                "driver_bytes": 0}


def _existing_manifest(out_dir: str, want_params: dict):
    """Job-level resume: the manifest is written LAST (after every shard
    directory), so its presence certifies a complete run.  Returns the
    manifest when it exists with matching parameters (idempotent re-run
    skips all work — the flagship pipeline's pre-execution-skip
    contract, pipeline.py); parameter drift falls through to a fresh
    run so stale output is never silently reused."""
    path = os.path.join(out_dir, "_prepare_manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        man = json.load(f)
    if all(man.get(k) == v for k, v in want_params.items()):
        return man
    return None


def _stage_id_datasets(sf_dir: str, quality_min: int):
    """Run the curate + decontaminate stages once, keeping their id sets
    as MATERIALIZED id-only Datasets (int64 ``doc_id``, 8 B/row in the
    object store, nothing driver-resident).  Returns
    ``(cur_ds, con_ds, n_curated, n_contaminated)`` — ``materialize``
    here is the id-set snapshot both regimes then consume without
    re-running the curate/decontam pipelines."""
    from engine.curate import q_curate_corpus
    from engine.decontam import q_decontaminate

    cur_ds = q_curate_corpus(sf_dir, quality_min).map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow").materialize()
    con_ds = q_decontaminate(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": pc.cast(
            t.filter(pc.equal(t["contaminated"], True))["doc_id"],
            pa.int64())}),
        batch_format="pyarrow").materialize()
    return cur_ds, con_ds, int(cur_ds.count()), int(con_ds.count())


def _collect_sorted_ids(ds) -> np.ndarray:
    from engine.pipeline import collect_tables
    tbl = pa.concat_tables([t for t in collect_tables(ds)
                            if t.num_columns])
    if tbl.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    return np.sort(pc.cast(tbl["doc_id"], pa.int64())
                   .to_numpy(zero_copy_only=False))


def _stage_id_refs(sf_dir: str, quality_min: int, datasets=None):
    """Broadcast-regime form: collect the stage id sets to sorted int64
    arrays and ``ray.put`` them once.  Returns
    ``(cur_ref, con_ref, n_curated, n_contaminated)``.  Only legal at or
    below ``curate.ID_BROADCAST_MAX`` — callers auto-route to the
    semi-join regime past it (see :func:`_prepared_train_ds`)."""
    import ray

    cur_ds, con_ds, n_cur, n_con = datasets or _stage_id_datasets(
        sf_dir, quality_min)
    curated = _collect_sorted_ids(cur_ds)
    contaminated = _collect_sorted_ids(con_ds)
    return (ray.put(pa.array(curated, type=pa.int64())),
            ray.put(pa.array(contaminated, type=pa.int64())),
            n_cur, n_con)


class KeepPrepared:
    """Once-per-actor broadcast fetch; per batch: train split AND
    curated AND not contaminated, then the shard column (when sharding)."""

    def __init__(self, cur, con, num_shards=None):
        import ray
        self.cur = ray.get(cur)
        self.con = ray.get(con)
        self.num_shards = num_shards

    def __call__(self, t: pa.Table) -> pa.Table:
        from engine.decontam import _split_bucket, _TRAIN_LT
        ids64 = pc.cast(t["doc_id"], pa.int64())
        ids = ids64.to_numpy(zero_copy_only=False)
        m = _split_bucket(ids) < _TRAIN_LT
        m &= pc.is_in(ids64, value_set=self.cur) \
            .to_numpy(zero_copy_only=False)
        m &= ~pc.is_in(ids64, value_set=self.con) \
            .to_numpy(zero_copy_only=False)
        kept = t.filter(pa.array(m))
        if self.num_shards is None:
            return kept
        shard = (pc.cast(kept["doc_id"], pa.int64())
                 .to_numpy(zero_copy_only=False)
                 % self.num_shards).astype(np.int32)
        return kept.append_column("shard", pa.array(shard))


def _train_split_only(t: pa.Table) -> pa.Table:
    """The train-split predicate of ``KeepPrepared`` as a standalone map
    (the semi-join regime applies the membership tests as joins)."""
    from engine.decontam import _split_bucket, _TRAIN_LT
    ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
    return t.filter(pa.array(_split_bucket(ids) < _TRAIN_LT))


def _add_mod_shard(t: pa.Table, num_shards: int) -> pa.Table:
    shard = (pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
             % num_shards).astype(np.int32)
    return t.append_column("shard", pa.array(shard))


def _prepared_train_ds(docs_ds, sf_dir: str, quality_min: int,
                       num_shards: int = None, method: str = None):
    """Regime-dual construction of the prepared-train Dataset over an
    arbitrary documents Dataset: train split ∩ curated − contaminated
    (+ the ``shard`` column when ``num_shards``).  Returns
    ``(kept_ds, n_curated, n_contaminated, method)``.

    * ``broadcast`` (both id sets ≤ ``curate.ID_BROADCAST_MAX``): the
      existing ``KeepPrepared`` vectorized ``pc.is_in`` path;
    * ``semijoin`` (default past the cap): the id sets stay Datasets —
      train-filter map → hash-partitioned ``left_semi`` join against the
      curated ids → ``left_anti`` join against the contaminated ids
      (curate_to_parquet:176-204 recipe; each id ships to exactly one
      partition, driver holds nothing)."""
    import ray

    from engine.curate import ID_BROADCAST_MAX

    cur_ds, con_ds, n_cur, n_con = _stage_id_datasets(sf_dir, quality_min)
    if method is None:
        method = "broadcast" if max(n_cur, n_con) <= ID_BROADCAST_MAX \
            else "semijoin"
    LAST_PREPARE.update(mode=method, n_curated=n_cur, n_contaminated=n_con)

    if method == "broadcast":
        cur_ref, con_ref, _, _ = _stage_id_refs(
            sf_dir, quality_min, datasets=(cur_ds, con_ds, n_cur, n_con))
        LAST_PREPARE["driver_bytes"] = 8 * (n_cur + n_con)
        args = (cur_ref, con_ref) if num_shards is None else \
            (cur_ref, con_ref, num_shards)
        kept = docs_ds.map_batches(
            KeepPrepared, fn_constructor_args=args,
            batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)
    elif method == "semijoin":
        from engine.pipeline import scrub_empty_blocks
        LAST_PREPARE["driver_bytes"] = 0
        nparts = max(int(num_shards or 0), 8)
        id_schema = pa.schema([("doc_id", pa.int64())])
        kept = docs_ds.map_batches(_train_split_only,
                                   batch_format="pyarrow")
        # the joins degenerate on an empty right side anyway (semi ∩ ∅ =
        # ∅, anti − ∅ = identity), and the id Datasets must be scrubbed
        # of zero-row blocks — a sparse side whose first shuffled block
        # is empty loses the schema broadcast (scrub_empty_blocks doc)
        kept = kept.limit(0) if n_cur == 0 else kept.join(
            scrub_empty_blocks(cur_ds, id_schema), "left_semi",
            num_partitions=nparts, on=("doc_id",))
        if n_con > 0:
            kept = kept.join(scrub_empty_blocks(con_ds, id_schema),
                             "left_anti", num_partitions=nparts,
                             on=("doc_id",))
        if num_shards is not None:
            kept = kept.map_batches(
                lambda t: _add_mod_shard(t, num_shards),
                batch_format="pyarrow")
    else:
        raise ValueError(f"unknown method {method!r}")
    return kept, n_cur, n_con, method


def prepare_to_parquet(docs_path: str, out_dir: str,
                       quality_min: int = None,
                       num_shards: int = 16,
                       method: str = None) -> dict:
    import ray

    from engine.curate import QUALITY_MIN_MILLI

    if os.path.basename(docs_path) != "documents.parquet":
        raise ValueError("prepare expects <dir>/documents.parquet")
    sf_dir = os.path.dirname(os.path.abspath(docs_path)) or "."
    if quality_min is None:
        quality_min = QUALITY_MIN_MILLI

    done = _existing_manifest(out_dir, {"quality_min_milli": int(quality_min),
                                        "num_shards": int(num_shards)})
    if done is not None:
        return done

    total = ray.data.read_parquet(docs_path).count()
    kept_ds, n_cur, n_con, method = _prepared_train_ds(
        ray.data.read_parquet(docs_path), sf_dir, quality_min,
        num_shards=num_shards, method=method)
    kept_ds.write_parquet(out_dir, partition_cols=["shard"])
    kept = int(ray.data.read_parquet(out_dir).count())
    manifest = {
        "input_docs": int(total),
        "curated_docs": int(n_cur),
        "contaminated_docs": int(n_con),
        "train_prepared_docs": kept,
        "quality_min_milli": int(quality_min),
        "num_shards": int(num_shards),
        "method": method,
    }
    with open(os.path.join(out_dir, "_prepare_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def q_prepare_corpus(sf_dir: str, method: str = None):
    """Gated composite: the id set ``prepare_to_parquet`` ships — train
    split ∩ curated − contaminated — as one sorted ``doc_id`` column.
    Same regime-dual plan as the parquet writer, minus the shard
    column, so the driver's DuckDB gate covers the whole composite (and
    the semi-join regime is pinned value-identical in
    tests/test_prepare_semijoin.py)."""
    import ray

    from engine.curate import QUALITY_MIN_MILLI

    ds, _, _, _ = _prepared_train_ds(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]),
        sf_dir, QUALITY_MIN_MILLI, method=method)
    out = _collect_sorted_ids(ds)
    return pa.table({"doc_id": pa.array(out, type=pa.int64())})


def _sql_prepare_corpus() -> str:
    """Compose the three stage oracles (each is a self-contained WITH
    query, legal as a DuckDB derived table) into the prepare gate."""
    from engine.corpus import SQL_CORPUS_SPLIT
    from engine.curate import SQL_CURATE_CORPUS
    from engine.decontam import SQL_DECONTAMINATE
    return f"""
SELECT s.doc_id::BIGINT AS doc_id
FROM ({SQL_CORPUS_SPLIT}) s
JOIN ({SQL_CURATE_CORPUS}) c USING (doc_id)
JOIN ({SQL_DECONTAMINATE}) d USING (doc_id)
WHERE s.split = 'train' AND NOT d.contaminated
ORDER BY doc_id
"""
