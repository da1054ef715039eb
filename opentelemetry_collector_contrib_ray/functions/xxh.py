"""XXH3-64 / XXH3-128 (seed 0, default secret) for the OTTL ``XXH3``
and ``XXH128`` converters (pkg/ottl/ottlfuncs/func_xxh3.go,
func_xxh128.go: hex of the big-endian digest).

Pure-Python implementation of the PUBLIC xxHash specification (BSD
licensed; the canonical reference header ships vendored inside pyarrow
at include/arrow/vendored/xxhash/xxhash.h — constants and branch
structure follow that spec, not the graft reference, which only calls
an external library). When the system ``libxxhash.so`` is loadable the
per-row calls go through ctypes instead (~10x faster); tests fuzz the
pure path against the C library across every length branch
(0 / 1-3 / 4-8 / 9-16 / 17-128 / 129-240 / >240 and multi-block
>1 KiB) so both paths are pinned to the same digests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF

P32_1, P32_2, P32_3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D
P64_1, P64_2 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F
P64_3, P64_4, P64_5 = 0x165667B19E3779F9, 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
MX1, MX2 = 0x165667919E3779F9, 0x9FB21C651E98DF25

# default 192-byte secret from the public spec
KSECRET = bytes([
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c, 0xf7, 0x21, 0xad, 0x1c,
    0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb, 0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f,
    0xcb, 0x79, 0xe6, 0x4e, 0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6, 0x81, 0x3a, 0x26, 0x4c,
    0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb, 0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3,
    0x71, 0x64, 0x48, 0x97, 0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7, 0xc7, 0x0b, 0x4f, 0x1d,
    0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31, 0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64,
    0xea, 0xc5, 0xac, 0x83, 0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26, 0x29, 0xd4, 0x68, 0x9e,
    0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc, 0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce,
    0x45, 0xcb, 0x3a, 0x8f, 0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e,
])


def _r32(b: bytes, o: int) -> int:
    return int.from_bytes(b[o:o + 4], "little")


def _r64(b: bytes, o: int) -> int:
    return int.from_bytes(b[o:o + 8], "little")


def _swap32(x: int) -> int:
    return int.from_bytes((x & M32).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & M64).to_bytes(8, "little"), "big")


def _rotl32(x: int, s: int) -> int:
    x &= M32
    return ((x << s) | (x >> (32 - s))) & M32


def _rotl64(x: int, s: int) -> int:
    x &= M64
    return ((x << s) | (x >> (64 - s))) & M64


def _mult64to128(a: int, b: int) -> tuple[int, int]:
    full = (a & M64) * (b & M64)
    return full & M64, (full >> 64) & M64


def _fold64(a: int, b: int) -> int:
    lo, hi = _mult64to128(a, b)
    return lo ^ hi


def _avalanche64(h: int) -> int:  # XXH64_avalanche
    h &= M64
    h ^= h >> 33
    h = (h * P64_2) & M64
    h ^= h >> 29
    h = (h * P64_3) & M64
    h ^= h >> 32
    return h


def _avalanche3(h: int) -> int:  # XXH3_avalanche
    h &= M64
    h ^= h >> 37
    h = (h * MX1) & M64
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h &= M64
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * MX2) & M64
    h ^= (h >> 35) + length
    h &= M64
    h = (h * MX2) & M64
    return h ^ (h >> 28)


def _mix16(b: bytes, i: int, s_off: int) -> int:
    return _fold64(_r64(b, i) ^ _r64(KSECRET, s_off),
                   _r64(b, i + 8) ^ _r64(KSECRET, s_off + 8))


# ------------------------------------------------------ long-path core

def _accumulate_512(acc: list[int], b: bytes, in_off: int, sec: bytes,
                    s_off: int) -> None:
    for lane in range(8):
        dv = _r64(b, in_off + lane * 8)
        dk = dv ^ _r64(sec, s_off + lane * 8)
        acc[lane ^ 1] = (acc[lane ^ 1] + dv) & M64
        acc[lane] = (acc[lane] + (dk & M32) * (dk >> 32)) & M64


def _hash_long_accs(b: bytes) -> list[int]:
    n = len(b)
    acc = [P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1]
    stripes_per_block = (len(KSECRET) - 64) // 8  # 16
    block_len = 64 * stripes_per_block
    nb_blocks = (n - 1) // block_len
    for blk in range(nb_blocks):
        base = blk * block_len
        for st in range(stripes_per_block):
            _accumulate_512(acc, b, base + st * 64, KSECRET, st * 8)
        # scramble
        for lane in range(8):
            a = acc[lane]
            a ^= a >> 47
            a ^= _r64(KSECRET, len(KSECRET) - 64 + lane * 8)
            acc[lane] = (a * P32_1) & M64
    # last partial block
    base = nb_blocks * block_len
    nb_stripes = ((n - 1) - base) // 64
    for st in range(nb_stripes):
        _accumulate_512(acc, b, base + st * 64, KSECRET, st * 8)
    _accumulate_512(acc, b, n - 64, KSECRET, len(KSECRET) - 64 - 7)
    return acc


def _merge_accs(acc: list[int], s_off: int, start: int) -> int:
    r = start & M64
    for i in range(4):
        r = (r + _fold64(acc[2 * i] ^ _r64(KSECRET, s_off + 16 * i),
                         acc[2 * i + 1] ^ _r64(KSECRET, s_off + 16 * i + 8))) & M64
    return _avalanche3(r)


# ------------------------------------------------------------- XXH3-64

def xxh3_64(b: bytes) -> int:
    n = len(b)
    if n == 0:
        return _avalanche64(_r64(KSECRET, 56) ^ _r64(KSECRET, 64))
    if n <= 3:
        c1, c2, c3 = b[0], b[n >> 1], b[n - 1]
        combined = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
        return _avalanche64(combined ^ (_r32(KSECRET, 0) ^ _r32(KSECRET, 4)))
    if n <= 8:
        in64 = _r32(b, n - 4) + (_r32(b, 0) << 32)
        return _rrmxmx(in64 ^ (_r64(KSECRET, 8) ^ _r64(KSECRET, 16)), n)
    if n <= 16:
        lo = _r64(b, 0) ^ ((_r64(KSECRET, 24) ^ _r64(KSECRET, 32)) & M64)
        hi = _r64(b, n - 8) ^ ((_r64(KSECRET, 40) ^ _r64(KSECRET, 48)) & M64)
        acc = (n + _swap64(lo) + hi + _fold64(lo, hi)) & M64
        return _avalanche3(acc)
    if n <= 128:
        acc = (n * P64_1) & M64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc = (acc + _mix16(b, 48, 96) + _mix16(b, n - 64, 112)) & M64
                acc = (acc + _mix16(b, 32, 64) + _mix16(b, n - 48, 80)) & M64
            acc = (acc + _mix16(b, 16, 32) + _mix16(b, n - 32, 48)) & M64
        acc = (acc + _mix16(b, 0, 0) + _mix16(b, n - 16, 16)) & M64
        return _avalanche3(acc)
    if n <= 240:
        acc = (n * P64_1) & M64
        for i in range(8):
            acc = (acc + _mix16(b, 16 * i, 16 * i)) & M64
        acc_end = _mix16(b, n - 16, 136 - 17)
        acc = _avalanche3(acc)
        for i in range(8, n // 16):
            acc_end = (acc_end + _mix16(b, 16 * i, 16 * (i - 8) + 3)) & M64
        return _avalanche3((acc + acc_end) & M64)
    acc = _hash_long_accs(b)
    return _merge_accs(acc, 11, (n * P64_1) & M64)


# ------------------------------------------------------------ XXH3-128

def xxh3_128(b: bytes) -> tuple[int, int]:
    """Returns (low64, high64)."""
    n = len(b)
    if n == 0:
        return (_avalanche64(_r64(KSECRET, 64) ^ _r64(KSECRET, 72)),
                _avalanche64(_r64(KSECRET, 80) ^ _r64(KSECRET, 88)))
    if n <= 3:
        c1, c2, c3 = b[0], b[n >> 1], b[n - 1]
        comb_l = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
        comb_h = _rotl32(_swap32(comb_l), 13)
        lo = comb_l ^ (_r32(KSECRET, 0) ^ _r32(KSECRET, 4))
        hi = comb_h ^ (_r32(KSECRET, 8) ^ _r32(KSECRET, 12))
        return _avalanche64(lo), _avalanche64(hi)
    if n <= 8:
        in64 = _r32(b, 0) + (_r32(b, n - 4) << 32)
        keyed = in64 ^ (_r64(KSECRET, 16) ^ _r64(KSECRET, 24))
        lo, hi = _mult64to128(keyed, (P64_1 + (n << 2)) & M64)
        hi = (hi + (lo << 1)) & M64
        lo ^= hi >> 3
        lo ^= lo >> 35
        lo = (lo * MX2) & M64
        lo ^= lo >> 28
        return lo, _avalanche3(hi)
    if n <= 16:
        in_lo = _r64(b, 0)
        in_hi = _r64(b, n - 8)
        lo, hi = _mult64to128(in_lo ^ in_hi ^ (_r64(KSECRET, 32) ^ _r64(KSECRET, 40)),
                              P64_1)
        lo = (lo + ((n - 1) << 54)) & M64
        in_hi ^= (_r64(KSECRET, 48) ^ _r64(KSECRET, 56)) & M64
        hi = (hi + in_hi + (in_hi & M32) * (P32_2 - 1)) & M64
        lo ^= _swap64(hi)
        rl, rh = _mult64to128(lo, P64_2)
        rh = (rh + hi * P64_2) & M64
        return _avalanche3(rl), _avalanche3(rh)

    def mix32(acc_lo: int, acc_hi: int, i1: int, i2: int, s: int,
              seed: int = 0) -> tuple[int, int]:
        acc_lo = (acc_lo + _mix16(b, i1, s)) & M64
        acc_lo ^= (_r64(b, i2) + _r64(b, i2 + 8)) & M64
        acc_hi = (acc_hi + _mix16(b, i2, s + 16)) & M64
        acc_hi ^= (_r64(b, i1) + _r64(b, i1 + 8)) & M64
        return acc_lo, acc_hi

    if n <= 128:
        lo, hi = (n * P64_1) & M64, 0
        if n > 32:
            if n > 64:
                if n > 96:
                    lo, hi = mix32(lo, hi, 48, n - 64, 96)
                lo, hi = mix32(lo, hi, 32, n - 48, 64)
            lo, hi = mix32(lo, hi, 16, n - 32, 32)
        lo, hi = mix32(lo, hi, 0, n - 16, 0)
        h_lo = (lo + hi) & M64
        h_hi = (lo * P64_1 + hi * P64_4 + n * P64_2) & M64
        return _avalanche3(h_lo), (-_avalanche3(h_hi)) & M64
    if n <= 240:
        lo, hi = (n * P64_1) & M64, 0
        for i in range(32, 160, 32):
            lo, hi = mix32(lo, hi, i - 32, i - 16, i - 32)
        lo, hi = _avalanche3(lo), _avalanche3(hi)
        i = 160
        while i <= n:
            lo, hi = mix32(lo, hi, i - 32, i - 16, 3 + i - 160)
            i += 32
        # last bytes (seed 0 => "0 - seed" is still 0)
        lo, hi = mix32(lo, hi, n - 16, n - 32, 136 - 17 - 16)
        h_lo = (lo + hi) & M64
        h_hi = (lo * P64_1 + hi * P64_4 + n * P64_2) & M64
        return _avalanche3(h_lo), (-_avalanche3(h_hi)) & M64
    acc = _hash_long_accs(b)
    h_lo = _merge_accs(acc, 11, (n * P64_1) & M64)
    h_hi = _merge_accs(acc, len(KSECRET) - 64 - 11, (~(n * P64_2)) & M64)
    return h_lo, h_hi


# --------------------------------------------------- ctypes fast path

def _load_libxxhash():
    try:
        import ctypes

        lib = ctypes.CDLL("libxxhash.so.0")

        class _XXH128(ctypes.Structure):
            _fields_ = [("low64", ctypes.c_uint64), ("high64", ctypes.c_uint64)]

        lib.XXH3_64bits.restype = ctypes.c_uint64
        lib.XXH3_64bits.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.XXH3_128bits.restype = _XXH128
        lib.XXH3_128bits.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        # sanity: pin to the spec before trusting it
        if lib.XXH3_64bits(b"", 0) != 0x2D06800538D394C2:
            return None
        return lib
    except OSError:
        return None


_LIB = _load_libxxhash()


def _utf8_rows(arr) -> list[bytes | None]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return [None if v is None else str(v).encode("utf-8")
            for v in arr.to_pylist()]


def xxh3_64_hex(arr) -> pa.Array:
    """func_xxh3.go: hex of the big-endian XXH3-64 digest."""
    rows = _utf8_rows(arr)
    if _LIB is not None:
        out = [None if r is None else f"{_LIB.XXH3_64bits(r, len(r)):016x}"
               for r in rows]
    else:
        out = [None if r is None else f"{xxh3_64(r):016x}" for r in rows]
    return pa.array(out, pa.string())


def xxh128_hex(arr) -> pa.Array:
    """func_xxh128.go: hex of the big-endian 128-bit digest
    (high64 then low64)."""
    rows = _utf8_rows(arr)
    out = []
    for r in rows:
        if r is None:
            out.append(None)
            continue
        if _LIB is not None:
            v = _LIB.XXH3_128bits(r, len(r))
            lo, hi = v.low64, v.high64
        else:
            lo, hi = xxh3_128(r)
        out.append(f"{hi:016x}{lo:016x}")
    return pa.array(out, pa.string())
