"""Hash-kernel pinning: the vectorized MurmurHash3 x64-128 against a
scalar reference implementation across every tail-length branch, and
the pure-python XXH3 against the system libxxhash when present
(functions/xxh.py loads it for the fast path)."""

import random

import pyarrow as pa

from opentelemetry_collector_contrib_ray.functions.encode import murmur3_128_hex
from opentelemetry_collector_contrib_ray.functions.xxh import (
    _LIB,
    xxh3_64,
    xxh3_128,
)

M64 = 0xFFFFFFFFFFFFFFFF


def _mm3_128_scalar(data: bytes) -> str:
    """Straight transcription of the public MurmurHash3 x64-128
    algorithm (Appleby, public domain), seed 0."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = 0

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M64

    nblocks = len(data) // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16:i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8:i * 16 + 16], "little")
        k1 = (k1 * c1) & M64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & M64
        h1 = (h1 * 5 + 0x52DCE729) & M64
        k2 = (k2 * c2) & M64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & M64
        h2 = (h2 * 5 + 0x38495AB5) & M64
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):
        k2 |= tail[i] << (8 * (i - 8))
    for i in range(min(len(tail), 8) - 1, -1, -1):
        k1 |= tail[i] << (8 * i)
    if len(tail) > 8:
        k2 = (k2 * c2) & M64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * c1) & M64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & M64
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & M64
        k ^= k >> 33
        return k

    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    return h1.to_bytes(8, "little").hex() + h2.to_bytes(8, "little").hex()


def test_murmur3_128_reference_vector():
    # func_murmur3_hash128_test.go: "Hello World"
    got = murmur3_128_hex(pa.array(["Hello World", ""]))
    assert got[0].as_py() == "dbc2a0c1ab26631a27b4c09fcf1fe683"
    assert got[1].as_py() == "0" * 32


def test_murmur3_128_fuzz_vs_scalar():
    rng = random.Random(7)
    # every tail length 0..15, block counts 0..3, plus long strings —
    # ASCII-only so utf-8 length == byte length stays controlled
    samples = []
    for blocks in range(4):
        for tail in range(16):
            n = blocks * 16 + tail
            samples.append("".join(chr(rng.randrange(32, 127))
                                   for _ in range(n)))
    samples.append("x" * 1000)
    got = murmur3_128_hex(pa.array(samples)).to_pylist()
    for s, g in zip(samples, got):
        assert g == _mm3_128_scalar(s.encode()), (len(s), s[:20])


def test_murmur3_128_multibyte_utf8():
    # non-ASCII: hashing runs over the utf-8 BYTES
    s = "héllo wörld 🌍"
    got = murmur3_128_hex(pa.array([s]))[0].as_py()
    assert got == _mm3_128_scalar(s.encode("utf-8"))


def test_xxh3_spec_vectors_and_lib_fuzz():
    assert xxh3_64(b"") == 0x2D06800538D394C2  # public spec vector
    if _LIB is None:
        return  # spec vector above still pins the empty case
    rng = random.Random(3)
    for n in [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 64, 96, 128, 129,
              160, 200, 240, 241, 500, 1024, 4096]:
        b = bytes(rng.randrange(256) for _ in range(n))
        assert xxh3_64(b) == _LIB.XXH3_64bits(b, n), n
        v = _LIB.XXH3_128bits(b, n)
        assert xxh3_128(b) == (v.low64, v.high64), n
