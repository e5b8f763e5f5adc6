"""End-to-end corpus curation: the composite training-data pipeline.

A user of this engine curates a pretraining corpus as ONE streaming
pass + one tiny exchange:

    documents
      → profile   (quality metrics + language ID + content hash,
                   one fused map_batches — each doc is read once)
      → filter    (quality_milli >= threshold AND pred_lang != unknown)
      → exact-dedup (per-batch partial min per content hash, then a
                   groupby over partials — only (hash, min-id) shuffles)
      → curated id set / curated parquet + stats

Everything is deterministic, so the whole composite is DuckDB-gated
(``curate_corpus``).  The near-dup-aware variant subtracts MinHash-LSH
non-survivors on top (rows-only: LSH is not SQL-expressible).

CLI: ``python -m engine.job curate --docs documents.parquet --out DIR``
writes the curated documents parquet (partitioned by the hash of the
surviving doc id for resumable downstream sharding) plus a stats JSON.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.dedup import _content_hash, _docs
from engine.text import LangId, quality_batch, _STOPWORDS

QUALITY_MIN_MILLI = 600


def profile_batch(t: pa.Table) -> pa.Table:
    """One pass per batch: (doc_id, chash, quality_milli, pred_lang)."""
    q = quality_batch(t)
    lang = LangId()(t)
    return pa.table({
        "doc_id": q["doc_id"],
        "chash": pa.array(_content_hash(t["text"]), type=pa.int64()),
        "quality_milli": q["quality_milli"],
        "pred_lang": lang["pred_lang"],
    })


def q_curate_corpus(sf_dir: str, quality_min: int = QUALITY_MIN_MILLI):
    """Curated doc ids: quality- and language-filtered, exact-dedup
    first(=min doc_id)-wins.  Gated: the DuckDB oracle recomputes the
    identical filters and groups by the full text (the 2^-64
    hash-collision trade is the same as ``dedup_exact``)."""
    import ray
    from ray.data.aggregate import Min

    def partial(t: pa.Table) -> pa.Table:
        p = profile_batch(t)
        keep = pc.and_(pc.greater_equal(p["quality_milli"], quality_min),
                       pc.not_equal(p["pred_lang"], "unknown"))
        p = p.filter(keep)
        g = pa.TableGroupBy(p.select(["chash", "doc_id"]), "chash") \
            .aggregate([("doc_id", "min")])
        return pa.table({"chash": g["chash"], "doc_id": g["doc_id_min"]})

    out = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("chash").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")


def _sql_lang_pred_expr() -> str:
    """The pred_lang CASE over a ``words`` column (mirrors engine.text SQL)."""
    from engine.text import _LANG_PROFILES
    langs = sorted(_LANG_PROFILES)
    scores = {lang: "(" + " + ".join(
        f"list_contains(words, '{w}')::INT" for w in sorted(_LANG_PROFILES[lang]))
        + ")" for lang in langs}
    g = "greatest(" + ", ".join(scores[lang] for lang in langs) + ")"
    case = " ".join(f"WHEN {scores[lang]} = {g} THEN '{lang}'" for lang in langs)
    return f"CASE WHEN {g} = 0 THEN 'unknown' {case} END"


def _sql_quality_milli_expr() -> str:
    stop_sql = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS))
    return rf"""floor((least(greatest(len(regexp_extract_all(coalesce(text, ''), '\S+')) / 50.0, 0), 1) * 0.4
    + least(greatest(len(list_filter(regexp_extract_all(coalesce(text, ''), '\S+'),
                                     w -> w IN ({stop_sql})))::DOUBLE
                     / greatest(len(regexp_extract_all(coalesce(text, ''), '\S+')), 1) * 3, 0), 1) * 0.3
    + least(greatest(1 - len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE
                     / greatest(length(coalesce(text, '')), 1) * 10, 0), 1) * 0.3)
    * 1000 + 0.5)::BIGINT"""


SQL_CURATE_CORPUS = rf"""
WITH m AS (
  SELECT doc_id::BIGINT AS doc_id, text,
         {_sql_quality_milli_expr()} AS quality_milli,
         regexp_extract_all(lower(coalesce(text, '')), '\S+') AS words
  FROM documents
), p AS (
  SELECT doc_id, text FROM m
  WHERE quality_milli >= {QUALITY_MIN_MILLI}
    AND ({_sql_lang_pred_expr()}) <> 'unknown'
)
SELECT min(doc_id)::BIGINT AS doc_id FROM p GROUP BY text
"""


def q_curate_corpus_neardup(sf_dir: str, quality_min: int = QUALITY_MIN_MILLI):
    """Near-dup-aware curation (rows-only): the gated curated set minus
    MinHash-LSH cluster non-survivors.

    Scale-safe (the r3 `weak` fix): the curated ids stay a DATASET end to
    end — the driver never holds them.  Only the LOSER id set is
    driver-resident, and it is bounded by construction: it comes from the
    verified-pair graph, whose size the LSH bucket caps bound (it is the
    near-dup RESULT, never the corpus).  Losers broadcast once via
    ``ray.put`` and subtract with one vectorized ``pc.is_in`` per batch
    (same recipe as :func:`curate_to_parquet`'s broadcast regime); the
    final sort orders ids only (8 B/row), keeping the rows-only output
    deterministic."""
    import ray
    from engine.dedup import q_dedup_clusters
    clusters = q_dedup_clusters(sf_dir)
    surv = clusters["survivor"].to_numpy(zero_copy_only=False)
    losers = np.sort(pc.cast(clusters["doc_id"], pa.int64())
                     .to_numpy(zero_copy_only=False)[~surv])
    losers_ref = ray.put(pa.array(losers, type=pa.int64()))

    def drop_losers(t: pa.Table) -> pa.Table:
        value_set = ray.get(losers_ref)   # local plasma hit after first read
        m = pc.is_in(pc.cast(t["doc_id"], pa.int64()), value_set=value_set)
        return t.filter(pc.invert(m))

    return q_curate_corpus(sf_dir, quality_min) \
        .map_batches(drop_losers, batch_format="pyarrow") \
        .sort("doc_id")


#: above this many curated ids the broadcast filter switches to the
#: distributed semi-join (a billion-id set would be GBs on the driver and
#: in every map task's heap; the join ships each id to one partition only)
ID_BROADCAST_MAX = 5_000_000


def curate_to_parquet(docs_path: str, out_dir: str,
                      quality_min: int = QUALITY_MIN_MILLI,
                      num_shards: int = 16,
                      method: str = None) -> dict:
    """CLI body: write the curated documents as hash-sharded parquet
    (``shard=NN`` partitions — deterministic, so downstream consumers can
    resume per shard) plus a stats JSON.

    Two scale regimes, auto-selected by curated-set size (``method``
    overrides: 'broadcast' | 'semijoin'):

    * broadcast (id set <= ``ID_BROADCAST_MAX``): the sorted int64 id
      array is put in the object store once and each batch filters with a
      vectorized ``pc.is_in`` — no per-row Python, no shuffle;
    * semijoin (beyond that): hash-partitioned inner ``Dataset.join`` of
      the documents against the unique curated ids — each side's rows ship
      to one partition only, nothing driver-resident."""
    import json
    import ray
    if os.path.basename(docs_path) != "documents.parquet":
        raise ValueError(
            "curate expects the documents table at <dir>/documents.parquet "
            f"(got {docs_path!r}) — the queries()/oracle contract is keyed "
            "on that name")
    sf_dir = os.path.dirname(os.path.abspath(docs_path)) or "."
    from engine.pipeline import collect_tables
    ids_tbl = pa.concat_tables(
        [t for t in collect_tables(q_curate_corpus(sf_dir, quality_min))
         if t.num_columns])
    total = ray.data.read_parquet(docs_path).count()
    if method is None:
        method = "broadcast" if ids_tbl.num_rows <= ID_BROADCAST_MAX \
            else "semijoin"

    def add_shard(t: pa.Table) -> pa.Table:
        shard = (pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
                 % num_shards).astype(np.int32)
        return t.append_column("shard", pa.array(shard))

    docs = ray.data.read_parquet(docs_path)
    if method == "broadcast":
        keep = np.sort(pc.cast(ids_tbl["doc_id"], pa.int64())
                       .to_numpy(zero_copy_only=False))
        ids_ref = ray.put(keep)

        class KeepCurated:
            def __init__(self, ref):
                arr = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
                self.value_set = pa.array(arr, type=pa.int64())

            def __call__(self, t: pa.Table) -> pa.Table:
                mask = pc.is_in(pc.cast(t["doc_id"], pa.int64()),
                                value_set=self.value_set)
                return add_shard(t.filter(mask))

        out_ds = docs.map_batches(KeepCurated, fn_constructor_args=(ids_ref,),
                                  batch_format="pyarrow", concurrency=(1, 8),
                                  num_cpus=1)
    elif method == "semijoin":
        if ids_tbl.num_rows == 0:
            # inner ∩ ∅ = ∅, and a zero-row join side would lose the
            # schema broadcast (engine.pipeline.scrub_empty_blocks doc)
            out_ds = docs.limit(0).map_batches(add_shard,
                                               batch_format="pyarrow")
        else:
            ids_ds = ray.data.from_arrow(
                pa.table({"doc_id": pc.cast(ids_tbl["doc_id"], pa.int64())}))
            out_ds = docs.join(ids_ds, join_type="inner", on=("doc_id",),
                               num_partitions=max(num_shards, 8)) \
                .map_batches(add_shard, batch_format="pyarrow")
    else:
        raise ValueError(f"unknown method {method!r}")
    out_ds.write_parquet(out_dir, partition_cols=["shard"])
    stats = {"input_docs": int(total), "curated_docs": ids_tbl.num_rows,
             "quality_min_milli": quality_min, "num_shards": num_shards,
             "method": method}
    with open(os.path.join(out_dir, "_curation_stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    return stats
