"""Token-level operators over the pre-tokenized sequences corpus.

The north-star input is a Parquet table of pre-tokenized training
sequences ``(doc_id:string, tokens:list<int32>, n_tok:int32,
source:string)`` and its per-row invariant is token-array equality —
these operators make that invariant a first-class data-plane citizen:

* ``q_sequence_dedup`` — exact dedup by TOKEN-ARRAY equality (the
  sequence-corpus twin of ``dedup.q_dedup_exact``): min(doc_id) survives
  per identical token array, with the copy count.  The exchange carries
  one 64-bit content hash + partial (min id, count) per distinct array
  per batch — token arrays themselves never shuffle (same documented
  2^-64 collision trade as ``q_dedup_exact``; the DuckDB oracle groups
  by the full ``tokens`` list).
* ``q_token_pack_bins`` — assign each sequence to a fixed-capacity
  training bin (``_BIN_TOKENS`` tokens) by running token count per
  source in doc_id order: the deterministic fixed-rate packing used to
  turn a tokenized corpus into constant-size training rows.  One
  hash-keyed exchange on ``source`` co-locates each source's sequences,
  then a single vectorized pass (Arrow sort + segmented cumsum) bins
  every source in the partition — the prefix-scan shape of
  ``analytics.q_events_running_totals``.

Scale posture: dedup ships ~24 B per distinct array per batch into one
hash aggregate; packing ships (doc_id, source, n_tok) rows (~30 B/row)
through one exchange keyed the same way every other per-source stage is
keyed.  Neither reads ``tokens`` payloads beyond the hashing map.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine import fixtures
from engine.dedup import _mix64

FIX01 = "/root/repo/fixtures/sf0.01"
SEQ_SQL = f"read_parquet('{FIX01}/sequences/*.parquet')"

_BIN_TOKENS = 2048           # training-bin capacity (tokens)
_HSEED = np.uint64(0xA24BAED4963EE407)  # domain-separates from text hashes
_HP = np.uint64(0x9E3779B97F4A7C15)     # odd multiplier for the position fold


def _seq_ds(sf_dir: str, columns=None):
    import ray
    fix = fixtures.ensure_fixtures(fixtures.sf_of(sf_dir))
    return ray.data.read_parquet(os.path.join(fix, "sequences"),
                                 columns=columns)


def token_array_hash(tokens) -> np.ndarray:
    """64-bit content hash per token ARRAY, fully vectorized.

    Positional polynomial fold ``H = mix64(len ^ seed ^ sum_j
    mix64(v_j ^ seed) * P^(L-1-j) mod 2^64)`` — P odd makes positions
    distinguishable (no permutation collisions), the value pre-mix kills
    affine structure in raw token ids, and uint64 wraparound keeps the
    cumsum-difference segment sum exact.  Module-level so property tests
    can pin it against a scalar fold."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    counts = pc.list_value_length(tokens).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
    v = flat.astype(np.int64).view(np.uint64)
    n = len(counts)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    m = _mix64(v ^ _HSEED)
    if len(v):
        maxn = int(counts.max())
        powp = np.empty(maxn + 1, dtype=np.uint64)
        powp[0] = 1
        np.cumprod(np.full(maxn, _HP, dtype=np.uint64), out=powp[1:])
        local = np.arange(len(v), dtype=np.int64) - np.repeat(offs[:-1],
                                                              counts)
        pos_from_end = np.repeat(counts, counts) - 1 - local
        terms = m * powp[pos_from_end]
        cs = np.zeros(len(terms) + 1, dtype=np.uint64)
        np.cumsum(terms, out=cs[1:])
        seg = cs[offs[1:]] - cs[offs[:-1]]
    else:
        seg = np.zeros(n, dtype=np.uint64)
    return _mix64(seg ^ counts.view(np.uint64) ^ _HSEED)


def _dedup_partial(t: pa.Table) -> pa.Table:
    """Per-batch (h, min doc_id, count) partials: the tokens payload is
    pruned before anything shuffles (~32 B/distinct-array/batch)."""
    h = token_array_hash(t["tokens"])
    g = pa.TableGroupBy(pa.table({
        "h": pa.array(h.view(np.int64)),
        "doc_id": t["doc_id"],
    }), "h").aggregate([("doc_id", "min"), ("h", "count")])
    return pa.table({"h": g["h"], "doc_id": g["doc_id_min"],
                     "cnt": pc.cast(g["h_count"], pa.int64())})


def _dedup_fold_block(t: pa.Table) -> pa.Table:
    """Per-partition fold: equal h are co-located, one Arrow groupby
    finishes every group in the block."""
    if t.num_rows == 0:
        return pa.schema([("doc_id", pa.string()),
                          ("n_copies", pa.int64())]).empty_table()
    g = pa.TableGroupBy(t, "h").aggregate([("doc_id", "min"),
                                           ("cnt", "sum")])
    return pa.table({"doc_id": g["doc_id_min"],
                     "n_copies": pc.cast(g["cnt_sum"], pa.int64())})


def _sequence_dedup_plan(ds, rows_hint: int = None):
    """partials → ONE hash-keyed exchange on h → per-partition fold.

    Ray's native ``groupby().aggregate()`` SORTS the exchange — measured
    257 s at 32 M (nearly all-distinct) keys on this box; the hash
    exchange + vectorized block fold is the repo's standard swap and
    runs the same job in a few seconds."""
    from engine.stages import hash_group_exchange
    return hash_group_exchange(
        lambda: ds.map_batches(_dedup_partial, batch_format="pyarrow",
                               batch_size=None),
        ["h"], _dedup_fold_block, collect=False, rows_hint=rows_hint)


def q_sequence_dedup(sf_dir: str):
    """Exact sequence dedup: min(doc_id) + copy count per distinct token
    array.  doc_ids are fixed-width, so lexicographic min == numeric min
    on both engines."""
    import pyarrow.parquet as pq
    fix = fixtures.ensure_fixtures(fixtures.sf_of(sf_dir))
    sdir = os.path.join(fix, "sequences")
    hint = sum(pq.read_metadata(os.path.join(sdir, f)).num_rows
               for f in os.listdir(sdir) if f.endswith(".parquet"))
    return _sequence_dedup_plan(_seq_ds(sf_dir, ["doc_id", "tokens"]),
                                rows_hint=hint)


SQL_SEQUENCE_DEDUP = f"""
SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
FROM {SEQ_SQL} GROUP BY tokens
"""


def pack_bins_block(t: pa.Table) -> pa.Table:
    """Per-partition packing kernel: Arrow sort by (source, doc_id), then
    one segmented running token count bins every source in the block.
    Module-level for property tests."""
    if t.num_rows == 0:
        return pa.schema([("doc_id", pa.string()), ("source", pa.string()),
                          ("bin", pa.int64()),
                          ("bin_offset", pa.int64())]).empty_table()
    idx = pc.sort_indices(t, sort_keys=[("source", "ascending"),
                                        ("doc_id", "ascending")])
    t = t.take(idx)
    src = t["source"].to_numpy(zero_copy_only=False)
    ntok = pc.cast(t["n_tok"], pa.int64()).to_numpy(zero_copy_only=False)
    cum = np.cumsum(ntok)
    prev = cum - ntok                       # tokens before this row
    starts = np.zeros(len(src), dtype=bool)
    starts[0] = True
    starts[1:] = src[1:] != src[:-1]
    base = np.repeat(prev[starts], np.diff(
        np.append(np.flatnonzero(starts), len(src))))
    rel = prev - base                       # running count within source
    return pa.table({
        "doc_id": t["doc_id"], "source": t["source"],
        "bin": pa.array(rel // _BIN_TOKENS, type=pa.int64()),
        "bin_offset": pa.array(rel % _BIN_TOKENS, type=pa.int64()),
    })


def q_token_pack_bins(sf_dir: str):
    """Fixed-rate sequence→training-bin assignment, per source in doc_id
    order (bin capacity ``_BIN_TOKENS`` tokens)."""
    from engine.stages import hash_group_exchange

    import pyarrow.parquet as pq
    fix = fixtures.ensure_fixtures(fixtures.sf_of(sf_dir))
    hint = sum(pq.read_metadata(os.path.join(fix, "sequences", f)).num_rows
               for f in os.listdir(os.path.join(fix, "sequences"))
               if f.endswith(".parquet"))
    return hash_group_exchange(
        lambda: _seq_ds(sf_dir, ["doc_id", "source", "n_tok"]),
        ["source"], pack_bins_block, collect=False, rows_hint=hint)


SQL_TOKEN_PACK_BINS = f"""
SELECT doc_id, source,
       ((sum(n_tok::BIGINT) OVER w - n_tok) // {_BIN_TOKENS})::BIGINT AS bin,
       ((sum(n_tok::BIGINT) OVER w - n_tok) % {_BIN_TOKENS})::BIGINT
           AS bin_offset
FROM {SEQ_SQL}
WINDOW w AS (PARTITION BY source ORDER BY doc_id)
"""

# ---------------------------------------------------------------------------
# token-level decontamination (13-token-gram overlap with the test split)
# ---------------------------------------------------------------------------

_GRAM_N = 13                      # GPT-4/PaLM-style token n-gram width
_GP = np.uint64(1000003)          # odd -> invertible mod 2^64
_GOFF = np.uint64(1 << 31)        # int32 -> non-negative value


def token_gram_hashes(tokens):
    """All ``_GRAM_N``-token gram hashes per row, vectorized.

    Gram hash = left fold ``h <- h*P + (v + 2^31)`` over the window,
    seeded with the first value — EXACTLY DuckDB's
    ``list_reduce(list_transform(slice, v -> v::HUGEINT + 2^31),
    (a,b) -> (a*P + b) % 2^64)``, so the gate is integer-exact with no
    digest in the hot loop (the md5-free twin the text-side decontam
    only has as its ``_fast`` variant).  Closed form over the flattened
    corpus: ``H_i = P^(g_i + N - 1) * sum_k v'_k P^(-k)`` telescopes to
    the window fold for any global start ``g_i``; windows never cross
    row boundaries (start mask).  Returns ``(hashes, counts)`` with
    ``counts[r]`` grams for row r (``max(len_r - N + 1, 0)``)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    counts = pc.list_value_length(tokens).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
    v = flat.astype(np.int64).view(np.uint64) + _GOFF
    g_counts = np.maximum(counts - _GRAM_N + 1, 0)
    total = len(v)
    if total == 0 or g_counts.sum() == 0:
        return np.empty(0, dtype=np.uint64), g_counts
    offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    pinv = np.uint64(pow(int(_GP), -1, 1 << 64))
    powp = np.empty(total + _GRAM_N, dtype=np.uint64)
    powinv = np.empty(total + 1, dtype=np.uint64)
    powp[0] = powinv[0] = 1
    np.cumprod(np.full(total + _GRAM_N - 1, _GP, dtype=np.uint64),
               out=powp[1:])
    np.cumprod(np.full(total, pinv, dtype=np.uint64), out=powinv[1:])
    c = v * powinv[:total]
    cs = np.zeros(total + 1, dtype=np.uint64)
    np.cumsum(c, out=cs[1:])
    starts = np.repeat(offs[:-1], g_counts) + _seg_local(g_counts)
    return (powp[starts + _GRAM_N - 1] *
            (cs[starts + _GRAM_N] - cs[starts])), g_counts


def _seg_local(counts: np.ndarray) -> np.ndarray:
    """0..counts[r]-1 within each segment, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


def _seq_split_bucket(doc_ids) -> np.ndarray:
    """md5(doc_id) % 100 — the sequence-corpus twin of the documents
    split (gate-compat digest: md5 is the one hash DuckDB shares, so the
    gated queries pay a per-row Python md5 over short id strings)."""
    import hashlib
    return np.array([int.from_bytes(hashlib.md5(s.encode()).digest()[:4],
                                    "big") % 100
                     for s in doc_ids.to_pylist()], dtype=np.int64)


def _seq_split_bucket_fast(doc_ids) -> np.ndarray:
    """The at-scale twin: C-level string hashing (pandas/xxhash family)
    instead of per-row Python md5 — the ``corpus.hash_bucket_fast``
    precedent for string ids.  Different (still deterministic) split
    assignment ⇒ no SQL oracle; rows-only + property-pinned."""
    import pandas as pd
    h = pd.util.hash_pandas_object(doc_ids.to_pandas(),
                                   index=False).to_numpy()
    return (h % np.uint64(100)).astype(np.int64)


def q_sequence_decontaminate(sf_dir: str, seq_path: str = None,
                             bucket: str = "md5"):
    """Token-level decontamination: flag train/val sequences sharing any
    ``_GRAM_N``-token gram with the held-out test split (the token-space
    analogue of ``decontam.q_decontaminate``'s word 8-grams).

    Eval side reduces to DISTINCT gram hashes (test split is a bounded
    fraction of the corpus) and broadcasts once via ``ray.put``; the
    train/val side is a pure map — sorted-array ``searchsorted``
    membership + one segment sum per batch.  No shuffle anywhere.
    ``seq_path`` overrides the fixture corpus (planted-overlap tests);
    ``bucket="fast"`` swaps the md5 split bucket for the C-level hash
    twin (rows-only — the split rule itself changes)."""
    import ray

    from engine.corpus import _TRAIN_LT, _VAL_LT
    from engine.pipeline import collect_tables

    bucket_fn = _seq_split_bucket if bucket == "md5" else \
        _seq_split_bucket_fast

    def _ds():
        if seq_path is not None:
            return ray.data.read_parquet(seq_path,
                                         columns=["doc_id", "tokens"])
        return _seq_ds(sf_dir, ["doc_id", "tokens"])

    def eval_grams(t: pa.Table) -> pa.Table:
        b = bucket_fn(t["doc_id"])
        sub = t.filter(pa.array(b >= _VAL_LT))
        h, _ = token_gram_hashes(sub["tokens"])
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    parts = [t for t in collect_tables(
        _ds().map_batches(eval_grams, batch_format="pyarrow"))
        if t.num_columns]
    ev = np.unique(pa.concat_tables(parts)["h"].to_numpy(
        zero_copy_only=False).view(np.uint64)) if parts else \
        np.empty(0, dtype=np.uint64)
    ev_ref = ray.put(ev)

    class Check:
        def __init__(self, ref):
            self.ev = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            b = bucket_fn(t["doc_id"])
            sub = t.filter(pa.array(b < _VAL_LT))
            h, gc = token_gram_hashes(sub["tokens"])
            idx = np.searchsorted(self.ev, h)
            idx[idx == len(self.ev)] = 0
            hit = (self.ev[idx] == h) if len(self.ev) else \
                np.zeros(len(h), dtype=bool)
            ends = np.cumsum(gc)
            cs = np.zeros(len(h) + 1, dtype=np.int64)
            np.cumsum(hit.astype(np.int64), out=cs[1:])
            n_hits = cs[ends] - cs[ends - gc]
            split = np.where(b[b < _VAL_LT] < _TRAIN_LT, "train", "val")
            return pa.table({
                "doc_id": sub["doc_id"],
                "split": pa.array(split.astype(object), type=pa.string()),
                "n_grams": pa.array(gc, type=pa.int64()),
                "n_hits": pa.array(n_hits, type=pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            })

    return _ds().map_batches(Check, fn_constructor_args=(ev_ref,),
                             batch_format="pyarrow", concurrency=(1, 8),
                             num_cpus=1)


def q_sequence_decontaminate_fast(sf_dir: str):
    """``q_sequence_decontaminate`` on the C-level split bucket — the
    md5-free at-scale twin (rows-only; detection pinned by pytest on a
    planted corpus)."""
    return q_sequence_decontaminate(sf_dir, bucket="fast")


def _sql_sequence_decontaminate(seq_sql: str = SEQ_SQL) -> str:
    from engine.corpus import _TRAIN_LT, _VAL_LT
    return f"""
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id), 1, 8))::BIGINT % 100 AS bucket
  FROM {seq_sql}
), gi AS (
  SELECT doc_id, tokens,
         unnest(generate_series(1, len(tokens) - {_GRAM_N - 1})) AS i
  FROM {seq_sql}
), g AS (
  SELECT doc_id,
         list_reduce(list_transform(tokens[i:i+{_GRAM_N - 1}],
                                    v -> v::HUGEINT + 2147483648),
                     (a, v) -> (a * {int(_GP)} + v)
                       % 18446744073709551616::HUGEINT) AS h
  FROM gi
), ev AS (
  SELECT DISTINCT h FROM g JOIN b USING (doc_id)
  WHERE b.bucket >= {_VAL_LT}
), chk AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_grams,
         sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
  FROM g LEFT JOIN ev USING (h)
  GROUP BY 1
)
SELECT b.doc_id,
       CASE WHEN b.bucket < {_TRAIN_LT} THEN 'train' ELSE 'val' END AS split,
       coalesce(chk.n_grams, 0)::BIGINT AS n_grams,
       coalesce(chk.n_hits, 0)::BIGINT AS n_hits,
       coalesce(chk.n_hits, 0) > 0 AS contaminated
FROM b LEFT JOIN chk USING (doc_id)
WHERE b.bucket < {_VAL_LT}
"""

# ---------------------------------------------------------------------------
# the token-corpus preparation composite (dedup + decontaminate + split)
# ---------------------------------------------------------------------------

#: introspection for the scale tests (prepare.LAST_PREPARE twin)
LAST_PREPARE_SEQ = {"mode": None, "n_keep": 0, "n_cont": 0,
                    "driver_bytes": 0}


def _prepare_seq_id_datasets(sf_dir: str, seq_path: str = None):
    """Run the dedup + decontaminate stages once, keeping the id sets as
    MATERIALIZED id-only Datasets (string ``doc_id``, object store,
    nothing driver-resident).  Returns
    ``(keep_ds, cont_ds, n_keep, n_cont)``."""
    import ray

    seq = _seq_ds(sf_dir, ["doc_id", "tokens"]) if seq_path is None else \
        ray.data.read_parquet(seq_path, columns=["doc_id", "tokens"])
    keep_ds = _sequence_dedup_ds(seq).map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.string())}),
        batch_format="pyarrow").materialize()
    cont_ds = q_sequence_decontaminate(sf_dir, seq_path=seq_path) \
        .map_batches(lambda t: pa.table({"doc_id": pc.cast(
            t.filter(pc.equal(t["contaminated"], True))["doc_id"],
            pa.string())}), batch_format="pyarrow").materialize()
    return keep_ds, cont_ds, int(keep_ds.count()), int(cont_ds.count())


def _collect_str_ids(ds) -> pa.Array:
    from engine.pipeline import collect_tables
    tbl = pa.concat_tables([t for t in collect_tables(ds)
                            if t.num_columns])
    if tbl.num_rows == 0:
        return pa.array([], type=pa.string())
    return pc.cast(tbl["doc_id"], pa.string()).combine_chunks()


def _prepare_seq_id_refs(sf_dir: str, seq_path: str = None, datasets=None):
    """Broadcast-regime form: collect the stage id sets and ``ray.put``
    them once — ``(keep_ref, cont_ref, n_keep, n_cont)``.  Ids ride the
    ``curate.ID_BROADCAST_MAX`` contract (strings here, ~16 B each);
    beyond it callers auto-route to the hash-partitioned semi-join
    (:func:`_prepared_seq_train_ds`)."""
    import ray

    keep_ds, cont_ds, n_keep, n_cont = datasets or \
        _prepare_seq_id_datasets(sf_dir, seq_path=seq_path)
    keep = _collect_str_ids(keep_ds)
    cont = _collect_str_ids(cont_ds)
    return (ray.put(keep), ray.put(cont), n_keep, n_cont)


def _sequence_dedup_ds(ds, rows_hint: int = None):
    """The q_sequence_dedup plan over an arbitrary sequences Dataset
    (survivor doc_ids only)."""
    return _sequence_dedup_plan(ds, rows_hint=rows_hint) \
        .map_batches(lambda t: t.select(["doc_id"]),
                     batch_format="pyarrow")


def _seq_shard(doc_ids, num_shards: int, shard_hash: str = "md5") \
        -> np.ndarray:
    """Shard assignment for prepared sequences.  ``md5`` (gate-compat
    default: bytes [4:8] of md5(doc_id), append-stable, DuckDB-mirrorable)
    pays one Python hash per KEPT row; ``fast`` is the C-level
    pandas-hash twin (``_seq_split_bucket_fast`` precedent — different
    deterministic placement, rows-only)."""
    if shard_hash == "fast":
        import pandas as pd
        h = pd.util.hash_pandas_object(doc_ids.to_pandas(),
                                       index=False).to_numpy()
        return (h % np.uint64(num_shards)).astype(np.int32)
    import hashlib
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[4:8], "big")
         % num_shards for s in doc_ids.to_pylist()], dtype=np.int32)


class KeepPreparedSeq:
    """Per batch: train split AND dedup survivor AND not contaminated
    (+ the shard column when sharding)."""

    def __init__(self, keep, cont, num_shards=None, shard_hash="md5"):
        import ray
        self.keep = ray.get(keep)
        self.cont = ray.get(cont)
        self.num_shards = num_shards
        self.shard_hash = shard_hash

    def __call__(self, t: pa.Table) -> pa.Table:
        b = _seq_split_bucket(t["doc_id"])
        from engine.corpus import _TRAIN_LT
        m = b < _TRAIN_LT
        m &= pc.is_in(t["doc_id"], value_set=self.keep) \
            .to_numpy(zero_copy_only=False)
        m &= ~pc.is_in(t["doc_id"], value_set=self.cont) \
            .to_numpy(zero_copy_only=False)
        kept = t.filter(pa.array(m))
        if self.num_shards is None:
            return kept
        shard = _seq_shard(kept["doc_id"], self.num_shards,
                           self.shard_hash)
        return kept.append_column("shard", pa.array(shard))


def _seq_train_split_only(t: pa.Table) -> pa.Table:
    """KeepPreparedSeq's train-split predicate as a standalone map (the
    semi-join regime applies the membership tests as joins)."""
    from engine.corpus import _TRAIN_LT
    return t.filter(pa.array(_seq_split_bucket(t["doc_id"]) < _TRAIN_LT))


def _pack_tokens_bin(t: pa.Table) -> pa.Table:
    """``tokens: list<int32>`` → ``tokens_bin: large_binary`` by buffer
    reinterpretation (offsets ×4 over the same values bytes — one memcpy
    per batch, no per-row work).  Acero's hash join rejects list-typed
    payload columns but carries binary fine; the semi-join regime packs
    before its joins and unpacks after, and the round-trip is pinned
    exact in tests/test_prepare_semijoin.py."""
    col = t["tokens"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("tokens column must be non-null to pack")
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.int32, copy=False)
    rel = (off - off[0]) * 4
    binarr = pa.Array.from_buffers(
        pa.large_binary(), len(col),
        [None, pa.py_buffer(rel.tobytes()), pa.py_buffer(flat.tobytes())])
    idx = t.column_names.index("tokens")
    return t.remove_column(idx).add_column(idx, "tokens_bin", binarr)


def _unpack_tokens_bin(t: pa.Table) -> pa.Table:
    """Inverse of :func:`_pack_tokens_bin` (bytes → ``list<int32>``)."""
    col = t["tokens_bin"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    boffs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset: col.offset + len(col) + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    flat = data[boffs[0]: boffs[-1]].view(np.int32) if len(col) \
        else np.empty(0, dtype=np.int32)
    rel = ((boffs - boffs[0]) // 4).astype(np.int32)
    lst = pa.ListArray.from_arrays(pa.array(rel, type=pa.int32()),
                                   pa.array(flat, type=pa.int32()))
    idx = t.column_names.index("tokens_bin")
    return t.remove_column(idx).add_column(idx, "tokens", lst)


def _prepared_seq_train_ds(seq_ds, sf_dir: str, seq_path: str = None,
                           num_shards: int = None, method: str = None,
                           shard_hash: str = "md5",
                           carry_tokens: bool = False):
    """Regime-dual prepared-train sequences Dataset: train split ∩ dedup
    survivors − contaminated (+ ``shard`` when ``num_shards``).  Returns
    ``(kept_ds, n_keep, n_cont, method)``.  Broadcast ≤
    ``curate.ID_BROADCAST_MAX`` ids (vectorized ``pc.is_in``); past it
    the id sets stay Datasets and membership is Ray's hash-partitioned
    ``left_semi`` / ``left_anti`` joins — zero driver-resident id bytes
    (prepare._prepared_train_ds twin; value-identical output pinned in
    tests/test_prepare_semijoin.py)."""
    from engine.curate import ID_BROADCAST_MAX

    keep_ds, cont_ds, n_keep, n_cont = _prepare_seq_id_datasets(
        sf_dir, seq_path=seq_path)
    if method is None:
        method = "broadcast" if max(n_keep, n_cont) <= ID_BROADCAST_MAX \
            else "semijoin"
    LAST_PREPARE_SEQ.update(mode=method, n_keep=n_keep, n_cont=n_cont)

    if method == "broadcast":
        keep_ref, cont_ref, _, _ = _prepare_seq_id_refs(
            sf_dir, seq_path=seq_path,
            datasets=(keep_ds, cont_ds, n_keep, n_cont))
        LAST_PREPARE_SEQ["driver_bytes"] = 16 * (n_keep + n_cont)
        args = (keep_ref, cont_ref) if num_shards is None else \
            (keep_ref, cont_ref, num_shards, shard_hash)
        kept = seq_ds.map_batches(
            KeepPreparedSeq, fn_constructor_args=args,
            batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)
    elif method == "semijoin":
        LAST_PREPARE_SEQ["driver_bytes"] = 0
        nparts = max(int(num_shards or 0), 8)
        kept = seq_ds.map_batches(_seq_train_split_only,
                                  batch_format="pyarrow")
        if carry_tokens:
            # Acero rejects list-typed join payloads: ride the tokens
            # through as large_binary (zero-copy reinterpretation)
            kept = kept.map_batches(_pack_tokens_bin,
                                    batch_format="pyarrow")
        # the joins degenerate on an empty right side anyway (semi ∩ ∅ =
        # ∅, anti − ∅ = identity), and the id Datasets must be scrubbed
        # of zero-row blocks — a sparse side whose first shuffled block
        # is empty loses the schema broadcast (scrub_empty_blocks doc)
        from engine.pipeline import scrub_empty_blocks
        id_schema = pa.schema([("doc_id", pa.string())])
        kept = kept.limit(0) if n_keep == 0 else kept.join(
            scrub_empty_blocks(keep_ds, id_schema), "left_semi",
            num_partitions=nparts, on=("doc_id",))
        if n_cont > 0:
            kept = kept.join(scrub_empty_blocks(cont_ds, id_schema),
                             "left_anti", num_partitions=nparts,
                             on=("doc_id",))
        if carry_tokens:
            kept = kept.map_batches(_unpack_tokens_bin,
                                    batch_format="pyarrow")
        if num_shards is not None:
            kept = kept.map_batches(
                lambda t: t.append_column("shard", pa.array(
                    _seq_shard(t["doc_id"], num_shards, shard_hash))),
                batch_format="pyarrow")
    else:
        raise ValueError(f"unknown method {method!r}")
    return kept, n_keep, n_cont, method


def q_prepare_sequences(sf_dir: str, method: str = None):
    """Gated composite over the token corpus: train split ∩ token-array-
    dedup survivors − token-13-gram-contaminated, one sorted doc_id
    column (the id set ``prepare_sequences_to_parquet`` ships)."""
    ds, _, _, _ = _prepared_seq_train_ds(_seq_ds(sf_dir, ["doc_id"]),
                                         sf_dir, method=method)
    ids = np.sort(_collect_str_ids(ds).to_numpy(zero_copy_only=False))
    return pa.table({"doc_id": pa.array(ids, type=pa.string())})


def _sql_prepare_sequences() -> str:
    from engine.corpus import _TRAIN_LT
    return f"""
SELECT b.doc_id
FROM (SELECT doc_id,
             ('0x' || substr(md5(doc_id), 1, 8))::BIGINT % 100 AS bucket
      FROM {SEQ_SQL}) b
JOIN (SELECT min(doc_id) AS doc_id FROM {SEQ_SQL} GROUP BY tokens) k
  USING (doc_id)
JOIN ({_sql_sequence_decontaminate()}) d USING (doc_id)
WHERE b.bucket < {_TRAIN_LT} AND NOT d.contaminated
ORDER BY doc_id
"""


def prepare_sequences_to_parquet(seq_dir: str, out_dir: str,
                                 num_shards: int = 16,
                                 method: str = None,
                                 shard_hash: str = "md5") -> dict:
    """The shipped form: prepared train sequences as hash-sharded parquet
    (md5-byte shard for append-stable placement, one directory per shard
    for per-shard resume) + a ``_prepare_manifest.json`` of stage
    counts.  ``seq_dir`` holds the sequences parquet file(s).  A re-run
    against a completed ``out_dir`` (manifest present, same shard count)
    returns the manifest without touching the corpus — the manifest is
    written last, so its presence certifies completeness."""
    import json

    import ray

    from engine.prepare import _existing_manifest
    done = _existing_manifest(out_dir, {"num_shards": int(num_shards)})
    if done is not None:
        return done

    total = ray.data.read_parquet(seq_dir).count()
    kept_ds, n_keep, n_cont, method = _prepared_seq_train_ds(
        ray.data.read_parquet(seq_dir), None, seq_path=seq_dir,
        num_shards=num_shards, method=method, shard_hash=shard_hash,
        carry_tokens=True)
    kept_ds.write_parquet(out_dir, partition_cols=["shard"])
    kept = int(ray.data.read_parquet(out_dir).count())
    manifest = {
        "input_sequences": int(total),
        "dedup_survivors": int(n_keep),
        "contaminated": int(n_cont),
        "train_prepared_sequences": kept,
        "num_shards": int(num_shards),
        "method": method,
    }
    with open(os.path.join(out_dir, "_prepare_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest

# ---------------------------------------------------------------------------
# token-value histogram (vocabulary distribution QA)
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 1024         # fixed-width buckets over the int32 domain


def q_token_histogram(sf_dir: str):
    """Token-value distribution: count + min/max token per fixed-width
    bucket of the int32 domain (``(v + 2^31) >> 22`` → 1024 buckets).

    Pure combiner shape: each batch folds its flattened token stream to
    ≤1024 partial rows (np.bincount + segment min/max via sorting the
    bucket ids), one tiny Arrow groupby finishes on the driver — the
    token-stream volume never crosses the exchange."""
    from engine.pipeline import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        tok = t["tokens"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        v = pc.list_flatten(tok).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(v) == 0:
            return pa.schema([("bucket", pa.int64()), ("n", pa.int64()),
                              ("min_tok", pa.int64()),
                              ("max_tok", pa.int64())]).empty_table()
        b = (v + (1 << 31)) >> 22
        order = np.argsort(b, kind="stable")
        bs, vs = b[order], v[order]
        starts = np.ones(len(bs), dtype=bool)
        starts[1:] = bs[1:] != bs[:-1]
        idx = np.flatnonzero(starts)
        ends = np.append(idx[1:], len(bs))
        return pa.table({
            "bucket": pa.array(bs[idx], type=pa.int64()),
            "n": pa.array(ends - idx, type=pa.int64()),
            "min_tok": pa.array(np.minimum.reduceat(vs, idx),
                                type=pa.int64()),
            "max_tok": pa.array(np.maximum.reduceat(vs, idx),
                                type=pa.int64()),
        })

    parts = [t for t in collect_tables(
        _seq_ds(sf_dir, ["tokens"]).map_batches(
            partial, batch_format="pyarrow", batch_size=None))
        if t.num_columns]
    tbl = pa.concat_tables(parts)
    g = pa.TableGroupBy(tbl, "bucket").aggregate(
        [("n", "sum"), ("min_tok", "min"), ("max_tok", "max")])
    out = pa.table({"bucket": g["bucket"], "n": g["n_sum"],
                    "min_tok": g["min_tok_min"],
                    "max_tok": g["max_tok_max"]})
    return out.take(pc.sort_indices(out["bucket"]))


SQL_TOKEN_HISTOGRAM = f"""
SELECT ((tok::BIGINT + 2147483648) >> 22)::BIGINT AS bucket,
       count(*)::BIGINT AS n,
       min(tok)::BIGINT AS min_tok, max(tok)::BIGINT AS max_tok
FROM (SELECT unnest(tokens) AS tok FROM {SEQ_SQL})
GROUP BY 1 ORDER BY 1
"""
