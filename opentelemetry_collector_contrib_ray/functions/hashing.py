"""Deterministic hashing kernels.

The reference exposes hash OTTL funcs (SHA*/MD5/FNV/Murmur/XXH,
pkg/ottl/ottlfuncs) and uses seeded FNV for probabilistic sampling
(processor/probabilisticsamplerprocessor/logsprocessor.go:122-168) and
xxhash attr-set identity (pkg/pdatautil/hash.go:98-140). We standardize
on MD5-derived 64-bit keys because they are reproducible in DuckDB
(``md5_number_lower(s)`` == little-endian int of digest bytes [8:16]),
which lets the correctness oracle express sampling/salting in SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def md5_number_lower_np(strings: np.ndarray | list[str]) -> np.ndarray:
    """uint64 per string == DuckDB ``md5_number_lower``.

    DuckDB's value is the little-endian integer of MD5 digest bytes
    8..16. Row-at-a-time hashlib, but only used on small/sampled data
    or at generation time; hot paths hash with numpy (see fnv1a64_np).
    """
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        d = hashlib.md5(s.encode() if isinstance(s, str) else s).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out


def md5_number_lower_arrow(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = md5_number_lower_np(arr.to_pylist())
    return pa.array(vals, type=pa.uint64())


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64_bytes(data: bytes, seed: int | None = None) -> int:
    """Scalar FNV-1a 64 (reference sampler uses seeded FNV,
    probabilisticsamplerprocessor/config.go:34-76)."""
    h = int(_FNV_OFFSET) if seed is None else seed
    for b in data:
        h = ((h ^ b) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_columns_u64(tbl: pa.Table, cols: list[str], seed: int = 0) -> np.ndarray:
    """Vectorized order-sensitive 64-bit hash of several columns.

    Used for dedup keys and salted shuffles. Mirrors the role of the
    reference's canonical attr-set hash (pkg/pdatautil/hash.go:98-140)
    — identity of a tuple of values — but implemented with pandas
    ``util.hash_pandas_object``-free stable mixing so it is
    deterministic across processes.
    """
    acc = np.full(tbl.num_rows, np.uint64(seed) ^ _FNV_OFFSET, dtype=np.uint64)
    for c in cols:
        col = tbl[c].combine_chunks() if isinstance(tbl[c], pa.ChunkedArray) else tbl[c]
        s = pd.Series(col.to_pandas())
        codes = pd.util.hash_array(s.to_numpy()).astype(np.uint64)
        acc = (acc ^ codes) * _FNV_PRIME
    return acc


def simhash64_from_token_hashes(token_hashes: list[np.ndarray]) -> np.ndarray:
    """SimHash: per document, sign-sum the bits of its token hashes.

    ``token_hashes[i]`` = uint64 hashes of document i's tokens.
    Returns a uint64 fingerprint per document.
    """
    out = np.empty(len(token_hashes), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, th in enumerate(token_hashes):
        if len(th) == 0:
            out[i] = 0
            continue
        # (n_tokens, 64) bit matrix -> column sums vs n/2
        m = ((th[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int32)
        votes = m.sum(axis=0) * 2 - len(th)
        fp = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(b)
        out[i] = fp
    return out
