"""Hash/encode kernels — the OTTL converter bucket
(pkg/ottl/ottlfuncs: func_sha1/sha256/sha512/md5, func_base64encode/
decode, func_hex, func_uuid) vectorized for Arrow string columns.

All hashes run the compression function as numpy integer ops over the
whole batch at once (rows grouped by padded block count), same scheme
as the MD5 kernel in functions/hashing.py. Outputs are lowercase hex
strings, matching the reference's ``hex.EncodeToString`` results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_B64 = np.frombuffer(b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
                     dtype=np.uint8)


def _flat_utf8(arr: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data, starts, lens) zero-copy from an Arrow string/binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        pass
    else:
        arr = pc.cast(arr, pa.string())
    if arr.null_count:
        arr = pc.fill_null(arr, "" if pa.types.is_string(arr.type) else b"")
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], "<i4", count=len(arr) + 1, offset=arr.offset * 4).astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offs[:-1], np.diff(offs)


def _pad_blocks(data, starts, lens, block: int, len_bytes: int, big_endian_len: bool):
    """Scatter rows into a rectangular padded buffer (0x80 + zeros +
    bit length). Returns dict: blocks -> (row_indices, buf)."""
    out = {}
    nb = (lens + len_bytes) // block + 1
    for blocks in np.unique(nb):
        idx = np.nonzero(nb == blocks)[0]
        s, ln = starts[idx], lens[idx]
        n = len(idx)
        width = int(blocks) * block
        buf = np.zeros((n, width), dtype=np.uint8)
        total = int(ln.sum())
        if total:
            rows = np.repeat(np.arange(n), ln)
            head = np.cumsum(ln) - ln
            within = np.arange(total) - np.repeat(head, ln)
            buf[rows, within] = data[np.repeat(s, ln) + within]
        buf[np.arange(n), ln] = 0x80
        bitlen = ln.astype(np.uint64) * 8
        if big_endian_len:
            buf[:, width - 8:] = bitlen.astype(">u8").view(np.uint8).reshape(n, 8)
        else:
            buf[:, width - 8:] = bitlen.astype("<u8").view(np.uint8).reshape(n, 8)
        out[int(blocks)] = (idx, buf)
    return out


def _rotl32(x, s):
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def _rotr32(x, s):
    return (x >> np.uint32(s)) | (x << np.uint32(32 - s))


def _rotr64(x, s):
    return (x >> np.uint64(s)) | (x << np.uint64(64 - s))


_SHA256_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2], dtype=np.uint32)

_SHA512_K = np.array([int(k) for k in """
4794697086780616226 8158064640168781261 13096744586834688815 16840607885511220156
4131703408338449720 6480981068601479193 10538285296894168987 12329834152419229976
15566598209576043074 1334009975649890238 2608012711638119052 6128411473006802146
8268148722764581231 9286055187155687089 11230858885718282805 13951009754708518548
16472876342353939154 17275323862435702243 1135362057144423861 2597628984639134821
3308224258029322869 5365058923640841347 6679025012923562964 8573033837759648693
10970295158949994411 12119686244451234320 12683024718118986047 13788192230050041572
14330467153632333762 15395433587784984357 489312712824947311 1452737877330783856
2861767655752347644 3322285676063803686 5560940570517711597 5996557281743188959
7280758554555802590 8532644243296465576 9350256976987008742 10552545826968843579
11727347734174303076 12113106623233404929 14000437183269869457 14369950271660146224
15101387698204529176 15463397548674623760 17586052441742319658 1182934255886127544
1847814050463011016 2177327727835720531 2830643537854262169 3796741975233480872
4115178125766777443 5681478168544905931 6601373596472566643 7507060721942968483
8399075790359081724 8693463985226723168 9568029438360202098 10144078919501101548
10430055236837252648 11840083180663258601 13761210420658862357 14299343276471374635
14566680578165727644 15097957966210449927 16922976911328602910 17689382322260857208
500013540394364858 748580250866718886 1242879168328830382 1977374033974150939
2944078676154940804 3659926193048069267 4368137639120453308 4836135668995329356
5532061633213252278 6448918945643986474 6902733635092675308 7801388544844847127
""".split()], dtype=np.uint64)


def sha256_hex(arr) -> pa.Array:
    data, starts, lens = _flat_utf8(arr)
    out = np.empty((len(lens), 32), dtype=np.uint8)
    for blocks, (idx, buf) in _pad_blocks(data, starts, lens, 64, 8, True).items():
        n = len(idx)
        H = [np.full(n, h, np.uint32) for h in
             (0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
              0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)]
        M = buf.view(">u4").reshape(n, blocks, 16).astype(np.uint32)
        for blk in range(blocks):
            W = [np.ascontiguousarray(M[:, blk, t]) for t in range(16)]
            for t in range(16, 64):
                s0 = _rotr32(W[t - 15], 7) ^ _rotr32(W[t - 15], 18) ^ (W[t - 15] >> np.uint32(3))
                s1 = _rotr32(W[t - 2], 17) ^ _rotr32(W[t - 2], 19) ^ (W[t - 2] >> np.uint32(10))
                W.append(W[t - 16] + s0 + W[t - 7] + s1)
            a, b, c, d, e, f, g, h = (x.copy() for x in H)
            for t in range(64):
                S1 = _rotr32(e, 6) ^ _rotr32(e, 11) ^ _rotr32(e, 25)
                ch = (e & f) ^ (~e & g)
                t1 = h + S1 + ch + _SHA256_K[t] + W[t]
                S0 = _rotr32(a, 2) ^ _rotr32(a, 13) ^ _rotr32(a, 22)
                maj = (a & b) ^ (a & c) ^ (b & c)
                t2 = S0 + maj
                h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
            for i, v in enumerate((a, b, c, d, e, f, g, h)):
                H[i] = H[i] + v
        digest = np.stack(H, axis=1).astype(">u4").view(np.uint8).reshape(n, 32)
        out[idx] = digest
    return _hex_of(out)


def sha1_digest_rows(arr) -> np.ndarray:
    """Raw per-row SHA-1 digests as a (n, 20) uint8 matrix (string or
    binary input) — community_id needs raw digests, not hex."""
    data, starts, lens = _flat_utf8(arr)
    out = np.empty((len(lens), 20), dtype=np.uint8)
    for blocks, (idx, buf) in _pad_blocks(data, starts, lens, 64, 8, True).items():
        n = len(idx)
        H = [np.full(n, h, np.uint32) for h in
             (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0)]
        M = buf.view(">u4").reshape(n, blocks, 16).astype(np.uint32)
        for blk in range(blocks):
            W = [np.ascontiguousarray(M[:, blk, t]) for t in range(16)]
            for t in range(16, 80):
                W.append(_rotl32(W[t - 3] ^ W[t - 8] ^ W[t - 14] ^ W[t - 16], 1))
            a, b, c, d, e = (x.copy() for x in H)
            for t in range(80):
                if t < 20:
                    f = (b & c) | (~b & d)
                    k = np.uint32(0x5A827999)
                elif t < 40:
                    f = b ^ c ^ d
                    k = np.uint32(0x6ED9EBA1)
                elif t < 60:
                    f = (b & c) | (b & d) | (c & d)
                    k = np.uint32(0x8F1BBCDC)
                else:
                    f = b ^ c ^ d
                    k = np.uint32(0xCA62C1D6)
                tmp = _rotl32(a, 5) + f + e + k + W[t]
                e, d, c, b, a = d, c, _rotl32(b, 30), a, tmp
            for i, v in enumerate((a, b, c, d, e)):
                H[i] = H[i] + v
        digest = np.stack(H, axis=1).astype(">u4").view(np.uint8).reshape(n, 20)
        out[idx] = digest
    return out


def sha1_hex(arr) -> pa.Array:
    return _hex_of(sha1_digest_rows(arr))


def sha512_hex(arr) -> pa.Array:
    data, starts, lens = _flat_utf8(arr)
    out = np.empty((len(lens), 64), dtype=np.uint8)
    for blocks, (idx, buf) in _pad_blocks(data, starts, lens, 128, 16, True).items():
        n = len(idx)
        H = [np.full(n, h, np.uint64) for h in
             (0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
              0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
              0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179)]
        M = buf.view(">u8").reshape(n, blocks, 16).astype(np.uint64)
        for blk in range(blocks):
            W = [np.ascontiguousarray(M[:, blk, t]) for t in range(16)]
            for t in range(16, 80):
                s0 = _rotr64(W[t - 15], 1) ^ _rotr64(W[t - 15], 8) ^ (W[t - 15] >> np.uint64(7))
                s1 = _rotr64(W[t - 2], 19) ^ _rotr64(W[t - 2], 61) ^ (W[t - 2] >> np.uint64(6))
                W.append(W[t - 16] + s0 + W[t - 7] + s1)
            a, b, c, d, e, f, g, h = (x.copy() for x in H)
            for t in range(80):
                S1 = _rotr64(e, 14) ^ _rotr64(e, 18) ^ _rotr64(e, 41)
                ch = (e & f) ^ (~e & g)
                t1 = h + S1 + ch + _SHA512_K[t] + W[t]
                S0 = _rotr64(a, 28) ^ _rotr64(a, 34) ^ _rotr64(a, 39)
                maj = (a & b) ^ (a & c) ^ (b & c)
                t2 = S0 + maj
                h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
            for i, v in enumerate((a, b, c, d, e, f, g, h)):
                H[i] = H[i] + v
        digest = np.stack(H, axis=1).astype(">u8").view(np.uint8).reshape(n, 64)
        out[idx] = digest
    return _hex_of(out)


def md5_hex(arr) -> pa.Array:
    """Full 16-byte MD5 as lowercase hex (func_md5.go). Reuses the
    vectorized compression from functions/hashing by recomputing the
    full state (A..D)."""
    from .hashing import _md5_u64_group

    data, starts, lens = _flat_utf8(arr)
    # _md5_u64_group returns only C|D<<32; for the full digest rerun
    # with a tweaked variant here (A,B also needed)
    out = np.empty((len(lens), 16), dtype=np.uint8)
    for blocks, (idx, buf) in _pad_blocks(data, starts, lens, 64, 8, False).items():
        n = len(idx)
        from .hashing import _MD5_K, _MD5_S

        A0 = np.full(n, 0x67452301, np.uint32)
        B0 = np.full(n, 0xEFCDAB89, np.uint32)
        C0 = np.full(n, 0x98BADCFE, np.uint32)
        D0 = np.full(n, 0x10325476, np.uint32)
        M = buf.view("<u4").reshape(n, blocks, 16)
        one32 = np.uint32(32)
        for blk in range(blocks):
            A, B, C, D = A0.copy(), B0.copy(), C0.copy(), D0.copy()
            X = np.ascontiguousarray(M[:, blk, :])
            for i in range(64):
                if i < 16:
                    F = (B & C) | (~B & D)
                    g = i
                elif i < 32:
                    F = (D & B) | (~D & C)
                    g = (5 * i + 1) & 15
                elif i < 48:
                    F = B ^ C ^ D
                    g = (3 * i + 5) & 15
                else:
                    F = C ^ (B | ~D)
                    g = (7 * i) & 15
                T = F + A + _MD5_K[i] + X[:, g]
                A, D, C = D, C, B
                s = _MD5_S[i]
                B = B + ((T << s) | (T >> (one32 - s)))
            A0 += A
            B0 += B
            C0 += C
            D0 += D
        digest = np.stack([A0, B0, C0, D0], axis=1).astype("<u4").view(np.uint8).reshape(n, 16)
        out[idx] = digest
    return _hex_of(out)


def _hex_of(digests: np.ndarray) -> pa.Array:
    """(n, w) byte matrix -> lowercase-hex Arrow string array."""
    n, w = digests.shape
    hexed = np.empty((n, w * 2), dtype=np.uint8)
    hexed[:, 0::2] = _HEX[digests >> 4]
    hexed[:, 1::2] = _HEX[digests & 0x0F]
    fsb = pa.Array.from_buffers(pa.binary(w * 2), n, [None, pa.py_buffer(hexed.tobytes())])
    return fsb.cast(pa.string())


def hex_encode(arr) -> pa.Array:
    """func_hex.go for strings: lowercase hex of the utf8 bytes —
    variable width, built from flat buffers."""
    data, starts, lens = _flat_utf8(arr)
    n = len(lens)
    total = int(lens.sum())
    rows = np.repeat(np.arange(n), lens)
    head = np.cumsum(lens) - lens
    within = np.arange(total) - np.repeat(head, lens)
    src = data[np.repeat(starts, lens) + within]
    flat = np.empty(total * 2, dtype=np.uint8)
    flat[0::2] = _HEX[src >> 4]
    flat[1::2] = _HEX[src & 0x0F]
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens * 2, out=offs[1:].view(np.int32)[:])
    return pa.Array.from_buffers(
        pa.string(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())])


_UNHEX = np.full(256, 255, dtype=np.uint8)
for i, ch in enumerate(b"0123456789abcdef"):
    _UNHEX[ch] = i
for i, ch in enumerate(b"0123456789ABCDEF"):
    _UNHEX[ch] = i


def hex_decode(arr) -> pa.Array:
    """Variable-width hex string -> utf8 string (the Decode(...,
    "hex") path); rows with odd length or non-hex characters -> null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    orig_valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    data, starts, lens = _flat_utf8(arr)
    n = len(lens)
    out_lens = lens // 2
    total_out = int(out_lens.sum())
    rows_valid = (lens % 2 == 0) & orig_valid
    head = np.cumsum(out_lens) - out_lens
    within = np.arange(total_out) - np.repeat(head, out_lens)
    base = np.repeat(starts, out_lens) + 2 * within
    hi = _UNHEX[data[base]] if total_out else np.empty(0, np.uint8)
    lo = _UNHEX[data[base + 1]] if total_out else np.empty(0, np.uint8)
    bad_pair = (hi == 255) | (lo == 255)
    if bad_pair.any():
        bad_rows = np.unique(np.repeat(np.arange(n), out_lens)[bad_pair])
        rows_valid = rows_valid.copy()
        rows_valid[bad_rows] = False
    flat = (hi.astype(np.uint8) << 4) | (lo & 0x0F)
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(out_lens, out=offs[1:].view(np.int32)[:])
    raw = pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs.tobytes()),
                         pa.py_buffer(flat.tobytes())])
    try:
        out = raw.cast(pa.string())
    except pa.ArrowInvalid:
        # rare salvage: some decoded payload is not valid utf8 — keep
        # the decodable rows, null the rest (Arrow strings must be
        # utf8; Go strings don't care, documented divergence)
        vals = []
        for v in raw.to_pylist():
            try:
                vals.append(v.decode("utf-8") if v is not None else None)
            except UnicodeDecodeError:
                vals.append(None)
        out = pa.array(vals, pa.string())
    return pc.if_else(pa.array(rows_valid), out, pa.nulls(n, pa.string()))


def base64_encode(arr) -> pa.Array:
    """func_base64encode.go — standard alphabet with '=' padding,
    vectorized 3->4 expansion over the flat byte buffer."""
    data, starts, lens = _flat_utf8(arr)
    n = len(lens)
    groups = (lens + 2) // 3  # 3-byte groups per row (last may be short)
    out_lens = groups * 4
    total_groups = int(groups.sum())
    # gather each group's 3 bytes (0-padded past the row end)
    grp_row = np.repeat(np.arange(n), groups)
    ghead = np.cumsum(groups) - groups
    gidx = np.arange(total_groups) - np.repeat(ghead, groups)  # group # within row
    gstart = np.repeat(starts, groups) + gidx * 3
    rem = np.repeat(starts + lens, groups) - gstart  # bytes available (>=1)
    b0 = data[gstart]
    b1 = np.where(rem > 1, data[np.minimum(gstart + 1, len(data) - 1)], 0).astype(np.uint8)
    b2 = np.where(rem > 2, data[np.minimum(gstart + 2, len(data) - 1)], 0).astype(np.uint8)
    q = np.empty((total_groups, 4), dtype=np.uint8)
    q[:, 0] = _B64[b0 >> 2]
    q[:, 1] = _B64[((b0 & 0x03) << 4) | (b1 >> 4)]
    q[:, 2] = np.where(rem > 1, _B64[((b1 & 0x0F) << 2) | (b2 >> 6)], ord("="))
    q[:, 3] = np.where(rem > 2, _B64[b2 & 0x3F], ord("="))
    flat = q.reshape(-1)
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(out_lens, out=offs[1:].view(np.int32)[:])
    return pa.Array.from_buffers(
        pa.string(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())])


_B64_INV = np.full(256, 255, dtype=np.uint8)
for _i, _c in enumerate(_B64):
    _B64_INV[_c] = _i


def base64_decode(arr) -> pa.Array:
    """func_base64decode.go — inverse of base64_encode; assumes valid
    padded base64 (invalid chars decode as 0)."""
    data, starts, lens = _flat_utf8(arr)
    n = len(lens)
    groups = lens // 4
    pad = np.zeros(n, dtype=np.int64)
    # count trailing '=' per row
    last = starts + lens
    pad += np.where((lens >= 1) & (data[np.maximum(last - 1, 0)] == ord("=")), 1, 0)
    pad += np.where((lens >= 2) & (data[np.maximum(last - 2, 0)] == ord("=")), 1, 0)
    out_lens = groups * 3 - pad
    total_groups = int(groups.sum())
    grp_row = np.repeat(np.arange(n), groups)
    ghead = np.cumsum(groups) - groups
    gidx = np.arange(total_groups) - np.repeat(ghead, groups)
    gstart = np.repeat(starts, groups) + gidx * 4
    s = _B64_INV[data[gstart[:, None] + np.arange(4)]].astype(np.uint32)
    s[s == 255] = 0
    tri = np.empty((total_groups, 3), dtype=np.uint8)
    tri[:, 0] = (s[:, 0] << 2) | (s[:, 1] >> 4)
    tri[:, 1] = ((s[:, 1] & 0x0F) << 4) | (s[:, 2] >> 2)
    tri[:, 2] = ((s[:, 2] & 0x03) << 6) | s[:, 3]
    flat_full = tri.reshape(-1)
    # drop the padding bytes at each row's end
    keep = np.ones(total_groups * 3, dtype=bool)
    row_end = (np.cumsum(groups) * 3) - 1
    keep[row_end[pad >= 1]] = False
    keep[(row_end - 1)[pad >= 2]] = False
    flat = flat_full[keep]
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(out_lens, out=offs[1:].view(np.int32)[:])
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())])


def murmur3_32_hex(arr) -> pa.Array:
    """func_murmur3_hash.go: murmur3 Sum32 (seed 0) as the hex of its
    LITTLE-ENDIAN bytes ("Hello World" -> "ce837619", "" ->
    "00000000"). Vectorized: 4-byte blocks iterate to the batch max
    with an active-row mask; tail + fmix are pure array ops."""
    data, starts, lens = _flat_utf8(arr)
    n = len(lens)
    if n == 0:
        return pa.array([], pa.string())
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    nblocks = (lens // 4).astype(np.int64)
    maxb = int(nblocks.max())
    width = maxb * 4 + 4  # room so tail reads stay in-bounds (zero pad)
    buf = np.zeros((n, width), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        rows = np.repeat(np.arange(n), lens)
        head = np.cumsum(lens) - lens
        within = np.arange(total) - np.repeat(head, lens)
        buf[rows, within] = data[np.repeat(starts, lens) + within]
    blocks = buf[:, : maxb * 4].reshape(n, maxb, 4).view("<u4").reshape(n, maxb) \
        if maxb else np.zeros((n, 0), np.uint32)

    def rotl(x, s):
        return (x << np.uint32(s)) | (x >> np.uint32(32 - s))

    h = np.zeros(n, np.uint32)
    for j in range(maxb):
        k = blocks[:, j].copy()
        k *= c1
        k = rotl(k, 15)
        k *= c2
        hx = h ^ k
        hx = rotl(hx, 13)
        hx = hx * np.uint32(5) + np.uint32(0xE6546B64)
        h = np.where(nblocks > j, hx, h)
    tail_start = nblocks * 4
    t = (buf[np.arange(n), tail_start].astype(np.uint32)
         | (buf[np.arange(n), tail_start + 1].astype(np.uint32) << np.uint32(8))
         | (buf[np.arange(n), tail_start + 2].astype(np.uint32) << np.uint32(16)))
    t *= c1
    t = rotl(t, 15)
    t *= c2
    h = np.where(lens % 4 > 0, h ^ t, h)
    h ^= lens.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return _hex_of(h.astype("<u4").view(np.uint8).reshape(n, 4))


def murmur3_128_hex(arr) -> pa.Array:
    """func_murmur3_hash128.go: MurmurHash3 x64 128-bit (seed 0), hex
    of the digest bytes (h1 then h2, little-endian — "Hello World" ->
    "dbc2a0c1ab26631a27b4c09fcf1fe683", "" -> 32 zeros). Vectorized:
    16-byte blocks iterate to the batch max under an active-row mask;
    the zero-padded row buffer makes the tail switch a plain 8-byte
    little-endian read."""
    data, starts, lens = _flat_utf8(arr)
    n = len(lens)
    if n == 0:
        return pa.array([], pa.string())
    c1 = np.uint64(0x87C37B91114253D5)
    c2 = np.uint64(0x4CF5AD432745937F)
    nblocks = (lens // 16).astype(np.int64)
    maxb = int(nblocks.max())
    width = maxb * 16 + 16  # zero pad so tail reads stay in-bounds
    buf = np.zeros((n, width), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        rows = np.repeat(np.arange(n), lens)
        head = np.cumsum(lens) - lens
        within = np.arange(total) - np.repeat(head, lens)
        buf[rows, within] = data[np.repeat(starts, lens) + within]
    words = buf[:, : (maxb + 1) * 16].reshape(n, (maxb + 1) * 2, 8) \
        .view("<u8").reshape(n, (maxb + 1) * 2)

    def rotl(x, s):
        return (x << np.uint64(s)) | (x >> np.uint64(64 - s))

    h1 = np.zeros(n, np.uint64)
    h2 = np.zeros(n, np.uint64)
    for j in range(maxb):
        m = nblocks > j
        k1 = words[:, 2 * j].copy()
        k2 = words[:, 2 * j + 1].copy()
        k1 *= c1
        k1 = rotl(k1, 31)
        k1 *= c2
        n1 = h1 ^ k1
        n1 = rotl(n1, 27)
        n1 += h2
        n1 = n1 * np.uint64(5) + np.uint64(0x52DCE729)
        k2 *= c2
        k2 = rotl(k2, 33)
        k2 *= c1
        n2 = h2 ^ k2
        n2 = rotl(n2, 31)
        n2 += n1
        n2 = n2 * np.uint64(5) + np.uint64(0x38495AB5)
        h1 = np.where(m, n1, h1)
        h2 = np.where(m, n2, h2)
    rem = (lens % 16).astype(np.int64)
    t1 = words[np.arange(n), 2 * nblocks].copy()
    t2 = words[np.arange(n), 2 * nblocks + 1].copy()
    k2 = t2 * c2
    k2 = rotl(k2, 33)
    k2 *= c1
    h2 = np.where(rem > 8, h2 ^ k2, h2)
    k1 = t1 * c1
    k1 = rotl(k1, 31)
    k1 *= c2
    h1 = np.where(rem > 0, h1 ^ k1, h1)
    ul = lens.astype(np.uint64)
    h1 ^= ul
    h2 ^= ul
    h1 += h2
    h2 += h1

    def fmix(x):
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
        return x

    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 += h2
    h2 += h1
    dig = np.concatenate([h1.astype("<u8").view(np.uint8).reshape(n, 8),
                          h2.astype("<u8").view(np.uint8).reshape(n, 8)], axis=1)
    return _hex_of(dig)


def uuid4_strings(n: int, rng: np.random.Generator | None = None) -> pa.Array:
    """func_uuid.go: one random RFC-4122 v4 UUID string per row."""
    rng = rng or np.random.default_rng()
    raw = rng.integers(0, 256, size=(n, 16), dtype=np.uint8) if n else np.empty((0, 16), np.uint8)
    if n:
        raw[:, 6] = (raw[:, 6] & 0x0F) | 0x40  # version 4
        raw[:, 8] = (raw[:, 8] & 0x3F) | 0x80  # variant 10xx
    hexed = np.empty((n, 32), dtype=np.uint8)
    hexed[:, 0::2] = _HEX[raw >> 4]
    hexed[:, 1::2] = _HEX[raw & 0x0F]
    dash = ord("-")
    out = np.empty((n, 36), dtype=np.uint8)
    out[:, 0:8] = hexed[:, 0:8]
    out[:, 8] = dash
    out[:, 9:13] = hexed[:, 8:12]
    out[:, 13] = dash
    out[:, 14:18] = hexed[:, 12:16]
    out[:, 18] = dash
    out[:, 19:23] = hexed[:, 16:20]
    out[:, 23] = dash
    out[:, 24:36] = hexed[:, 20:32]
    fsb = pa.Array.from_buffers(pa.binary(36), n, [None, pa.py_buffer(out.tobytes())])
    return fsb.cast(pa.string())
