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
contaminated-id sets ride the curate module's broadcast/semijoin dual
path (``ID_BROADCAST_MAX`` contract); everything else is pure maps.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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


def _stage_id_refs(sf_dir: str, quality_min: int):
    """Run the curate + decontaminate stages once and broadcast their id
    sets: returns ``(cur_ref, con_ref, n_curated, n_contaminated)``."""
    import ray

    from engine.curate import ID_BROADCAST_MAX, q_curate_corpus
    from engine.decontam import q_decontaminate
    from engine.pipeline import collect_tables

    # curated survivor ids (quality + lang + exact dedup)
    curated_tbl = pa.concat_tables(
        [t for t in collect_tables(q_curate_corpus(sf_dir, quality_min))
         if t.num_columns])
    curated = np.sort(pc.cast(curated_tbl["doc_id"], pa.int64())
                      .to_numpy(zero_copy_only=False))

    # contaminated ids among train/val docs
    cont_tbl = pa.concat_tables(
        [t for t in collect_tables(
            q_decontaminate(sf_dir)
            .map_batches(lambda t: t.filter(
                pc.equal(t["contaminated"], True)).select(["doc_id"]),
                batch_format="pyarrow")) if t.num_columns])
    contaminated = np.sort(pc.cast(cont_tbl["doc_id"], pa.int64())
                           .to_numpy(zero_copy_only=False))
    if len(curated) > ID_BROADCAST_MAX:
        raise NotImplementedError(
            "id set beyond the broadcast regime: route through "
            "curate_to_parquet's semijoin path (same recipe, two joins)")
    return (ray.put(pa.array(curated, type=pa.int64())),
            ray.put(pa.array(contaminated, type=pa.int64())),
            len(curated), len(contaminated))


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


def prepare_to_parquet(docs_path: str, out_dir: str,
                       quality_min: int = None,
                       num_shards: int = 16) -> dict:
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
    cur_ref, con_ref, n_cur, n_con = _stage_id_refs(sf_dir, quality_min)

    ray.data.read_parquet(docs_path) \
        .map_batches(KeepPrepared,
                     fn_constructor_args=(cur_ref, con_ref, num_shards),
                     batch_format="pyarrow", concurrency=(1, 8),
                     num_cpus=1) \
        .write_parquet(out_dir, partition_cols=["shard"])
    kept = int(ray.data.read_parquet(out_dir).count())
    manifest = {
        "input_docs": int(total),
        "curated_docs": int(n_cur),
        "contaminated_docs": int(n_con),
        "train_prepared_docs": kept,
        "quality_min_milli": int(quality_min),
        "num_shards": int(num_shards),
    }
    with open(os.path.join(out_dir, "_prepare_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def q_prepare_corpus(sf_dir: str):
    """Gated composite: the id set ``prepare_to_parquet`` ships — train
    split ∩ curated − contaminated — as one sorted ``doc_id`` column.
    Same ``KeepPrepared`` kernel as the parquet writer, minus the shard
    column, so the driver's DuckDB gate covers the whole composite."""
    import ray

    from engine.curate import QUALITY_MIN_MILLI

    from engine.pipeline import collect_tables

    cur_ref, con_ref, _, _ = _stage_id_refs(sf_dir, QUALITY_MIN_MILLI)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]) \
        .map_batches(KeepPrepared, fn_constructor_args=(cur_ref, con_ref),
                     batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)
    tbl = pa.concat_tables([t for t in collect_tables(ds) if t.num_columns])
    out = np.sort(pc.cast(tbl["doc_id"], pa.int64())
                  .to_numpy(zero_copy_only=False))
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
