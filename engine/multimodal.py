"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as Arrow ``binary`` columns with
typed metadata columns alongside.  The decode/feature-extract kernels that
would need PIL/ffmpeg are STUBBED (those libraries are not in this
container — ``RealImageDecoder`` raises ``NotImplementedError``), but the
Ray-side plumbing is real and tested: schema, actor-pool stage shape
(decoder "model" loaded once per actor in ``__init__``), small batch sizes
for large binary rows, deterministic fake extraction, and output layout.

The fake payloads are synthesized deterministically from the documents
table (text bytes + a seeded header), so the stage is testable end-to-end.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# a tiny deterministic "container format": magic, width, height, channels
_MAGIC = b"FKIM"


def make_binary_payload(doc_id: int, text: str) -> bytes:
    """Deterministic fake image container derived from a document.

    Header dims derive from md5(doc_id) digest bytes so the DuckDB
    oracle for the downstream stats aggregate can recompute them
    (md5 is the one digest both sides share)."""
    h = hashlib.md5(f"{doc_id}".encode()).digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    ch = 1 + h[2] % 3
    body = (text.encode("utf-8") * 4)[: w * ht * ch]
    body += bytes(max(0, w * ht * ch - len(body)))
    return _MAGIC + struct.pack("<HHB", w, ht, ch) + body


def attach_binary_column(sf_dir: str):
    """documents -> (doc_id, payload binary, n_bytes) dataset."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_pylist()
        payloads = [make_binary_payload(d, s)
                    for d, s in zip(ids, t["text"].to_pylist())]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        })

    from engine.io import read_parquet_clean
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=1024)


class RealImageDecoder:
    """The real decode path — STUB.  PIL/opencv are not available in this
    container; on a real deployment, replace :class:`FakeImageDecoder` with
    this class in :func:`q_multimodal_decode` (same signature)."""

    def __init__(self):
        raise NotImplementedError(
            "image decode libraries are not available in this environment; "
            "use FakeImageDecoder for the plumbing path")


class FakeImageDecoder:
    """Actor-pool decode stage: parses the fake container header, computes a
    deterministic 8-bin byte histogram "feature" per payload.  ``__init__``
    is the once-per-actor model-load site (ST4 shape); batches are kept
    small because binary rows are large."""

    def __init__(self):
        self.magic = _MAGIC  # stands in for model/codec initialization

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, chans, feats, ok = [], [], [], [], []
        for buf in t["payload"].to_pylist():
            if buf[:4] != self.magic or len(buf) < 9:
                widths.append(None); heights.append(None); chans.append(None)
                feats.append(None); ok.append(False)
                continue
            w, h, c = struct.unpack("<HHB", buf[4:9])
            body = np.frombuffer(buf, dtype=np.uint8, offset=9)
            hist = np.bincount(body >> 5, minlength=8).astype(np.int64)
            widths.append(w); heights.append(h); chans.append(c)
            feats.append(hist.tolist()); ok.append(True)
        return pa.table({
            "doc_id": t["doc_id"],
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "channels": pa.array(chans, type=pa.int32()),
            "byte_hist": pa.array(feats, type=pa.list_(pa.int64())),
            "decode_ok": pa.array(ok, type=pa.bool_()),
        })


def q_multimodal_decode(sf_dir: str):
    """Binary-column decode/feature stage, gated: actor pool, small
    batches (large rows), typed metadata out.  The 8-bin byte histogram is
    flattened to ``h0..h7`` int64 columns so the driver can value-hash it;
    the DuckDB oracle recomputes dims from the md5 header derivation AND
    the histogram from the repeated-truncated-padded text bytes — proving
    the binary decode read exactly the advertised container body."""
    ds = attach_binary_column(sf_dir)
    out = ds.map_batches(FakeImageDecoder, batch_format="pyarrow",
                         batch_size=256, concurrency=(1, 4), num_cpus=1)

    def flatten(t: pa.Table) -> pa.Table:
        assert pc.all(t["decode_ok"]).as_py()  # fake containers always parse
        hist = t["byte_hist"]
        if isinstance(hist, pa.ChunkedArray):
            hist = hist.combine_chunks()
        H = hist.values.to_numpy(zero_copy_only=False).reshape(t.num_rows, 8)
        cols = {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "width": pc.cast(t["width"], pa.int64()),
            "height": pc.cast(t["height"], pa.int64()),
            "channels": pc.cast(t["channels"], pa.int64()),
            "decode_ok": t["decode_ok"],
        }
        for b in range(8):
            cols[f"h{b}"] = pa.array(H[:, b].astype(np.int64))
        return pa.table(cols)

    return out.map_batches(flatten, batch_format="pyarrow")


def q_multimodal_stats(sf_dir: str):
    """Aggregate over decoded metadata: count + sum bytes per channel count."""
    ds = q_multimodal_decode(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"channels": t["channels"],
                       "px": pc.multiply(pc.cast(t["width"], pa.int64()),
                                         pc.cast(t["height"], pa.int64()))})
        g = pa.TableGroupBy(t2, "channels").aggregate([("px", "sum"), ("px", "count")])
        return pa.table({"channels": pc.cast(g["channels"], pa.int64()),
                         "sum_px": g["px_sum"],
                         "n_docs": pc.cast(g["px_count"], pa.int64())})

    from ray.data.aggregate import Sum
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("channels").aggregate(Sum("sum_px", alias_name="sum_px"),
                                       Sum("n_docs", alias_name="n_docs"))


class FakeImageResizer:
    """Actor-pool resize stage (the image-transform plumbing shape): parses
    the container, stride-2 downsamples the (h, w, ch) body, re-emits a
    valid container + new dims.  ``__init__`` is the once-per-actor codec
    site; a real deployment swaps in a PIL/opencv body with the same
    signature."""

    def __init__(self):
        self.magic = _MAGIC

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, payloads, ws, hs, chs, nbytes = [], [], [], [], [], []
        for doc, buf in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            w, h, c = struct.unpack("<HHB", buf[4:9])
            body = np.frombuffer(buf, dtype=np.uint8, offset=9).reshape(h, w, c)
            small = body[::2, ::2, :]
            h2, w2 = small.shape[0], small.shape[1]
            out = self.magic + struct.pack("<HHB", w2, h2, c) + small.tobytes()
            ids.append(doc); payloads.append(out)
            ws.append(w2); hs.append(h2); chs.append(c); nbytes.append(len(out))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "channels": pa.array(chs, type=pa.int64()),
            "n_bytes": pa.array(nbytes, type=pa.int64()),
        })


def q_multimodal_resize(sf_dir: str):
    """Resize stage output metadata, gated: the oracle re-derives the
    downsampled dims + byte size from the md5 header derivation, so the
    gate proves the binary transform produced exactly the advertised
    container."""
    ds = attach_binary_column(sf_dir)
    out = ds.map_batches(FakeImageResizer, batch_format="pyarrow",
                         batch_size=256, concurrency=(1, 4), num_cpus=1)
    return out.map_batches(
        lambda t: t.select(["doc_id", "width", "height", "channels", "n_bytes"]),
        batch_format="pyarrow")


# ceil(x/2) of the original md5-derived dims; out bytes = 9 + w2*h2*ch
SQL_MULTIMODAL_RESIZE = """
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id, md5(doc_id::VARCHAR) AS hx FROM documents
), m AS (
  SELECT doc_id,
         ((16 + ('0x' || substr(hx, 1, 2))::INT % 64) + 1) // 2 AS w2,
         ((16 + ('0x' || substr(hx, 3, 2))::INT % 64) + 1) // 2 AS h2,
         (1 + ('0x' || substr(hx, 5, 2))::INT % 3) AS ch
  FROM d
)
SELECT doc_id, w2::BIGINT AS width, h2::BIGINT AS height, ch::BIGINT AS channels,
       (9 + w2 * h2 * ch)::BIGINT AS n_bytes
FROM m
"""


class FakeFrameSampler:
    """Actor-pool frame-sampling stage (the video plumbing shape): treats
    the container body as ``height`` frames of ``width*channels`` bytes
    and keeps every ``stride``-th frame."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, nf, ns, sb = [], [], [], []
        for doc, buf in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            w, h, c = struct.unpack("<HHB", buf[4:9])
            frames = np.frombuffer(buf, dtype=np.uint8, offset=9).reshape(h, w * c)
            kept = frames[::self.stride]
            ids.append(doc); nf.append(h)
            ns.append(kept.shape[0]); sb.append(int(kept.size))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_frames": pa.array(nf, type=pa.int64()),
            "n_sampled": pa.array(ns, type=pa.int64()),
            "sampled_bytes": pa.array(sb, type=pa.int64()),
        })


def q_multimodal_frames(sf_dir: str):
    """Frame-sampling stage metadata, gated against the md5 header
    derivation (frames = height, every 4th kept)."""
    ds = attach_binary_column(sf_dir)
    return ds.map_batches(FakeFrameSampler, batch_format="pyarrow",
                          batch_size=256, concurrency=(1, 4), num_cpus=1)


SQL_MULTIMODAL_FRAMES = """
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id, md5(doc_id::VARCHAR) AS hx FROM documents
), m AS (
  SELECT doc_id,
         (16 + ('0x' || substr(hx, 1, 2))::INT % 64) AS w,
         (16 + ('0x' || substr(hx, 3, 2))::INT % 64) AS h,
         (1 + ('0x' || substr(hx, 5, 2))::INT % 3) AS ch
  FROM d
)
SELECT doc_id, h::BIGINT AS n_frames, ((h + 3) // 4)::BIGINT AS n_sampled,
       (((h + 3) // 4) * w * ch)::BIGINT AS sampled_bytes
FROM m
"""


# DuckDB mirror of the full decode stage: header dims from md5 digest
# bytes, and the 8-bin byte histogram recomputed from the body definition
# (utf-8 text repeated 4x, truncated to w*h*ch, zero-padded) — bin of a
# byte is its high 3 bits = first hex digit // 2 over hex(encode(text)).
_H_TERMS = "\n".join(
    (f"  (len(list_filter(binlist, b -> b = 0)) * fullrep\n"
     f"   + len(list_filter(binlist[1:rem], b -> b = 0)) + (nb - L))::BIGINT AS h0,")
    if b == 0 else
    (f"  (len(list_filter(binlist, b -> b = {b})) * fullrep\n"
     f"   + len(list_filter(binlist[1:rem], b -> b = {b})))::BIGINT AS h{b},")
    for b in range(8)).rstrip(",")

SQL_MULTIMODAL_DECODE = f"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id, md5(doc_id::VARCHAR) AS hx,
         hex(encode(text)) AS hxt, octet_length(encode(text)) AS tl
  FROM documents
), m AS (
  SELECT doc_id, hxt, tl,
         (16 + ('0x' || substr(hx, 1, 2))::INT % 64) AS w,
         (16 + ('0x' || substr(hx, 3, 2))::INT % 64) AS h,
         (1 + ('0x' || substr(hx, 5, 2))::INT % 3) AS ch
  FROM d
), n AS (
  SELECT doc_id, w, h, ch, tl, hxt, w * h * ch AS nb,
         least(w * h * ch, 4 * tl) AS L
  FROM m
), c AS (
  SELECT doc_id, w, h, ch, nb, L,
         CASE WHEN tl = 0 THEN 0 ELSE L // tl END AS fullrep,
         CASE WHEN tl = 0 THEN 0 ELSE L % tl END AS rem,
         list_transform(range(tl),
                        j -> ('0x' || substr(hxt, 2*j + 1, 1))::INT // 2) AS binlist
  FROM n
)
SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height, ch::BIGINT AS channels,
       TRUE AS decode_ok,
{_H_TERMS}
FROM c
"""


# DuckDB mirror of the fake-container header derivation (md5 digest bytes
# 0/1/2 -> width/height/channels), then the same per-channel aggregate the
# Ray stage computes from the DECODED payloads — gating that the binary
# plumbing round-trips the typed metadata exactly.
SQL_MULTIMODAL_STATS = """
WITH d AS (
  SELECT md5(doc_id::VARCHAR) AS hx FROM documents
), m AS (
  SELECT (1 + ('0x' || substr(hx, 5, 2))::INT % 3)::BIGINT AS channels,
         (16 + ('0x' || substr(hx, 1, 2))::INT % 64)::BIGINT
         * (16 + ('0x' || substr(hx, 3, 2))::INT % 64)::BIGINT AS px
  FROM d
)
SELECT channels, sum(px)::BIGINT AS sum_px, count(*)::BIGINT AS n_docs
FROM m GROUP BY channels
"""
