"""Seeded, fully vectorized synthesis of the sequences corpus + side tables.

Generates the pipeline input per BASELINE.json:input_hint / FIXTURES.md:
``sequences(doc_id: string, tokens: list<int32>, n_tok: int32, source:
string)`` where ``tokens[0..3] = [msg_type, version, seq, ts]`` and
``tokens[4:]`` is the payload (LE int32 words) consistent with the catalog
layouts, plus the small ``source_meta`` enrich table (FIXTURES.md section 3).

Deliberate properties (FIXTURES.md section 1 generation rules):
* one hot msg_type (0x2001) holding >=50% of rows — the skew fixture;
* dynamic-count layouts carry a valid ``Num Records``/``Num CA``/bitmask
  prefix (reference count semantics, decoder/payload_decoder.py:211-241);
* ~1% malformed rows: truncated header (-> TOO_SHORT_HEADER), unknown
  msg_type 0xDEAD (-> UNKNOWN_MSG_TYPE, models/errors.py:26-30), unknown
  version (-> UNKNOWN_VERSION) for the dead-letter sink;
* some rows truncated mid-records so the ``min(logical, fits)`` clamp
  (metadata_payload_parser.py:231-236) is exercised;
* enum fields occasionally carry out-of-map values (-> ``UNKNOWN(v)``).

Everything is numpy-vectorized; generation of millions of rows takes
seconds, and identical (n_rows, seed) always yields identical content.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = [f"src-{i:02d}" for i in range(16)]
_SOURCE_W = np.array([8, 7, 7, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6], dtype=np.float64)
SOURCE_WEIGHTS = _SOURCE_W / _SOURCE_W.sum()


def _rand_words(rng: np.random.Generator, n: int, w: int) -> np.ndarray:
    return rng.integers(-(2 ** 31), 2 ** 31, size=(n, w), dtype=np.int64).astype(np.int32)


def _u8(words: np.ndarray) -> np.ndarray:
    """Byte view of an (n, w) int32 matrix as (n, w*4) LE bytes."""
    return words.view(np.uint8).reshape(words.shape[0], words.shape[1] * 4)


def _set_uint(u8: np.ndarray, off: int, nbytes: int, values: np.ndarray) -> None:
    v = values.astype(np.uint64)
    for b in range(nbytes):
        u8[:, off + b] = ((v >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8)


def _enum_values(rng: np.random.Generator, n: int, valid: List[int]) -> np.ndarray:
    """Mostly-valid enum bytes with ~10% out-of-map values."""
    pool = np.array(valid + [max(valid) + 17], dtype=np.int64)
    w = np.array([9.0] * len(valid) + [1.0])
    return rng.choice(pool, size=n, p=w / w.sum())


def _stratum(rng, n: int, msg_type: int, version: int, payload_words: int,
             setter=None) -> pa.Table:
    """Build one (msg_type, version, payload_width) stratum as an Arrow table."""
    words = _rand_words(rng, n, payload_words)
    if setter is not None and n > 0:
        setter(_u8(words), rng, n)
    hdr = np.empty((n, 4), dtype=np.int32)
    hdr[:, 0] = msg_type
    hdr[:, 1] = version
    hdr[:, 2] = rng.integers(0, 2 ** 31, size=n, dtype=np.int64).astype(np.int32)
    hdr[:, 3] = rng.integers(0, 2 ** 31, size=n, dtype=np.int64).astype(np.int32)
    full = np.concatenate([hdr, words], axis=1) if payload_words else hdr
    w = full.shape[1]
    values = pa.array(full.ravel(), type=pa.int32())
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * w)
    tokens = pa.ListArray.from_arrays(offsets, values)
    return pa.table({
        "tokens": tokens,
        "n_tok": pa.array(np.full(n, w, dtype=np.int32)),
    })


def _truncated_header(rng, n: int) -> pa.Table:
    """Rows with n_tok < 4 -> TOO_SHORT_HEADER dead letters."""
    lens = rng.integers(0, 4, size=n)
    values = rng.integers(-(2 ** 31), 2 ** 31, size=int(lens.sum()), dtype=np.int64).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values, type=pa.int32()))
    return pa.table({"tokens": tokens, "n_tok": pa.array(lens.astype(np.int32))})


def generate_sequences(n_rows: int, seed: int, out_dir: str, num_files: int = 8) -> str:
    """Generate the sequences corpus into ``out_dir`` (num_files parquet files)."""
    rng = np.random.default_rng(seed)
    parts: List[pa.Table] = []

    def frac(p: float) -> int:
        return max(1, int(round(n_rows * p)))

    # ---- hot type 0x2001 Heartbeat (~55%) ---------------------------------
    def hb2_setter(u8, rng, n):
        _set_uint(u8, 10, 1, _enum_values(rng, n, [0, 1, 2]))
    parts.append(_stratum(rng, frac(0.30), 0x2001, 1, 2))
    parts.append(_stratum(rng, frac(0.15), 0x2001, 1, 3))          # slack word
    parts.append(_stratum(rng, frac(0.103), 0x2001, 2, 3, hb2_setter))

    # ---- 0xB888 PdschStats: dynamic records via "Num Records" -------------
    def b888_setter(base: int, count: int, zero_total_frac: float = 0.05):
        def setter(u8, rng, n):
            _set_uint(u8, base - 1, 1, np.full(n, count, dtype=np.int64))  # Num Records
            pass_tb = rng.integers(0, 1000, size=n)
            fail_tb = rng.integers(0, 200, size=n)
            zero = rng.random(n) < zero_total_frac
            pass_tb[zero] = 0
            fail_tb[zero] = 0
            _set_uint(u8, 2, 4, pass_tb)    # Num CRC Pass TB
            _set_uint(u8, 6, 4, fail_tb)    # Num CRC Fail TB
            _set_uint(u8, 10, 2, rng.integers(0, 50, size=n))  # HARQ Failure
        return setter

    for ver, base in ((1, 17), (2, 21)):
        share = 0.06 if ver == 1 else 0.04
        for c in range(0, 7):
            nbytes = base + c * 14
            wds = (nbytes + 3) // 4
            parts.append(_stratum(rng, frac(share / 8), 0xB888, ver, wds, b888_setter(base, c)))
        # truncated mid-records: logical count 5 but payload fits only ~2
        nbytes = base + 2 * 14 + 1
        parts.append(_stratum(rng, frac(share / 8), 0xB888, ver,
                              (nbytes + 3) // 4, b888_setter(base, 5)))

    # ---- 0x1C07 CarrierConfig ---------------------------------------------
    def c07v1_setter(count: int):
        def setter(u8, rng, n):
            _set_uint(u8, 0, 1, np.full(n, count, dtype=np.int64))  # Num CA
            for r in range(count):  # enum Bandwidth byte per record
                _set_uint(u8, 3 + r * 7 + 4, 1, _enum_values(rng, n, [0, 1, 2, 3, 4]))
        return setter

    for c in range(0, 6):
        nbytes = 3 + c * 7
        parts.append(_stratum(rng, frac(0.05 / 6), 0x1C07, 1, (nbytes + 3) // 4, c07v1_setter(c)))

    def c07v2_setter(nbits: int):
        def setter(u8, rng, n):
            # bitmask with exactly nbits set, varying positions
            masks = np.zeros(n, dtype=np.int64)
            for _ in range(nbits):
                masks |= np.int64(1) << rng.integers(0, 24, size=n).astype(np.int64)
            # popcount may be < nbits on collisions; payload is sized for
            # nbits so min(logical, fits) = popcount <= nbits still decodes
            _set_uint(u8, 0, 4, masks)
            for r in range(nbits):
                _set_uint(u8, 4 + r * 7 + 4, 1, _enum_values(rng, n, [0, 1, 2, 3, 4]))
        return setter

    for c in range(0, 6):
        nbytes = 4 + c * 7
        parts.append(_stratum(rng, frac(0.03 / 6), 0x1C07, 2, (nbytes + 3) // 4, c07v2_setter(c)))

    # ---- fixed-width scalar types -----------------------------------------
    def thermal_setter(u8, rng, n):
        _set_uint(u8, 6, 1, _enum_values(rng, n, [0, 1, 2, 7]))
    parts.append(_stratum(rng, frac(0.04), 0x3A10, 1, 10))
    parts.append(_stratum(rng, frac(0.04), 0x3A11, 1, 2, thermal_setter))

    # ---- 0x4B20 MsgTrace: fixed count 4, plus clamp-truncated variant -----
    parts.append(_stratum(rng, frac(0.04), 0x4B20, 1, 5))
    parts.append(_stratum(rng, frac(0.01), 0x4B20, 1, 3))  # fits only 2 of 4

    # ---- GenericEvent family ----------------------------------------------
    def ge4_setter(u8, rng, n):
        _set_uint(u8, 0, 1, _enum_values(rng, n, [0, 1, 2]))
    parts.append(_stratum(rng, frac(0.015), 0x5C01, 1, 3))
    parts.append(_stratum(rng, frac(0.015), 0x5C02, 1, 3))
    parts.append(_stratum(rng, frac(0.015), 0x5C03, 1, 2))
    parts.append(_stratum(rng, frac(0.015), 0x5C04, 1, 3, ge4_setter))

    # ---- 0x6000..0x601F GenericStat family (32 seeded layouts, ~6%) -------
    from engine.catalog import compile_catalog
    compiled = compile_catalog()
    for k in range(32):
        mt = 0x6000 + k
        layout = compiled[(mt, 1)]
        size_bits = max(s.abs_off_bits + s.length_bits for s in layout.scalars)
        wds = ((size_bits + 7) // 8 + 3) // 4
        enum_offs = [s.abs_off_bits // 8 for s in layout.scalars if s.enum]

        def gs_setter(u8, rng, n, offs=tuple(enum_offs)):
            for o in offs:
                _set_uint(u8, o, 1, _enum_values(rng, n, [0, 1, 2]))
        parts.append(_stratum(rng, frac(0.064 / 32), mt, 1, max(1, wds),
                              gs_setter if enum_offs else None))

    # ---- 0x7F01 DeviceInfo: String-typed field (M12) ----------------------
    # names are NUL-padded into the fixed 12-byte window; one pool entry is
    # exactly 12 bytes (no terminator -> full-window cut)
    _NAMES = ["TEMP_CORE", "FAN_MAIN", "VOLT_RAIL3", "AMBIENT", "GPU_DIE",
              "PSU", "NVME_CTRL", "BATTERY_PACK"]
    _NAME_M = np.zeros((len(_NAMES), 12), dtype=np.uint8)
    for _i, _nm in enumerate(_NAMES):
        _NAME_M[_i, :len(_nm)] = np.frombuffer(_nm.encode(), dtype=np.uint8)

    def devinfo_setter(u8, rng, n):
        idx = rng.integers(0, len(_NAMES), size=n)
        u8[:, 0:12] = _NAME_M[idx]
    parts.append(_stratum(rng, frac(0.02), 0x7F01, 1, 4, devinfo_setter))

    # ---- dead-letter strata -----------------------------------------------
    parts.append(_stratum(rng, frac(0.008), 0xDEAD, 1, 3))          # unknown type
    parts.append(_stratum(rng, frac(0.005), 0x2001, 99, 2))         # unknown version
    parts.append(_truncated_header(rng, frac(0.004)))

    table = pa.concat_tables(parts)
    n = table.num_rows
    perm = rng.permutation(n)
    table = table.take(pa.array(perm))

    ids = np.char.add("doc-", np.char.zfill(np.arange(n).astype(str), 9))
    doc_id = pa.array(ids, type=pa.string())
    src_idx = rng.choice(len(SOURCES), size=n, p=SOURCE_WEIGHTS)
    source = pa.array(SOURCES, type=pa.string()).take(pa.array(src_idx))
    table = pa.table({
        "doc_id": doc_id,
        "tokens": table["tokens"],
        "n_tok": table["n_tok"],
        "source": source,
    })

    os.makedirs(out_dir, exist_ok=True)
    rows_per_file = (n + num_files - 1) // num_files
    for i in range(num_files):
        lo = i * rows_per_file
        hi = min(n, lo + rows_per_file)
        if lo >= hi:
            break
        pq.write_table(table.slice(lo, hi - lo),
                       os.path.join(out_dir, f"sequences-{i:04d}.parquet"))
    return out_dir


def generate_source_meta(out_path: str) -> str:
    """The small per-source enrich table (FIXTURES.md section 3; north-star J8)."""
    sites = ["site-A", "site-B", "site-C", "site-D"]
    t = pa.table({
        "source": pa.array(SOURCES),
        "site": pa.array([sites[i % 4] for i in range(len(SOURCES))]),
        "hw_rev": pa.array([f"rev{1 + (i % 3)}" for i in range(len(SOURCES))]),
        "priority": pa.array([(i * 7) % 5 for i in range(len(SOURCES))], type=pa.int32()),
    })
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(t, out_path)
    return out_path
