"""Multimodal column stages — opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns alongside (mime, width/height/duration). Decode and
feature-extract are actor-pool map_batches stages: the Ray-side
plumbing (schema, batch sizing for large payloads, actor signature,
output layout) is real and tested; the codec itself is STUBBED —
this container has no image/audio libraries, so ``decoder="real"``
raises ``NotImplementedError`` at the exact call site a production
build would wire PIL/ffmpeg into, and ``decoder="fake"`` is a
deterministic stand-in (bytes -> seeded pixel tensor) used by tests.

Large-payload sizing: binary rows are orders of magnitude wider than
text, so these stages default to small ``batch_size`` and rely on
Arrow binary columns end-to-end (never pandas object dtype —
ray_guide 'nested/binary columns' pitfall).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

FAKE_DECODE_SHAPE = (8, 8, 3)  # deterministic fake "image"


def fake_decode(data: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: seed pixels from a content hash."""
    seed = int.from_bytes(hashlib.md5(data).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=FAKE_DECODE_SHAPE, dtype=np.uint8)


class ImageDecode:
    """Actor stage: binary column -> fixed-shape uint8 tensor column +
    integer feature columns (mean intensity, byte size)."""

    def __init__(self, data_col: str = "data", decoder: str = "fake"):
        self.data_col = data_col
        if decoder == "real":
            raise NotImplementedError(
                "real image decode requires PIL/turbojpeg — not available in "
                "this container; wire the library here and delete this raise"
            )
        self.decoder = fake_decode

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b[self.data_col].to_pylist()
        n = len(payloads)
        h, w, c = FAKE_DECODE_SHAPE
        pixels = np.empty((n, h * w * c), dtype=np.uint8)
        sizes = np.empty(n, dtype=np.int64)
        for i, p in enumerate(payloads):
            data = p or b""
            pixels[i] = self.decoder(data).reshape(-1)
            sizes[i] = len(data)
        mean_intensity = pixels.mean(axis=1)
        tensor = pa.FixedSizeListArray.from_arrays(pa.array(pixels.reshape(-1), pa.uint8()), h * w * c)
        out = b.append_column("pixels", tensor)
        out = out.append_column("byte_size", pa.array(sizes, pa.int64()))
        out = out.append_column("mean_intensity", pa.array(mean_intensity, pa.float64()))
        return out


def decode_images(
    ds: ray.data.Dataset,
    data_col: str = "data",
    decoder: str = "fake",
    batch_size: int = 256,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Decode stage wiring: small batches (binary rows are wide),
    actor pool (decoder/codec init once per actor)."""
    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"data_col": data_col, "decoder": decoder},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResize:
    """Actor stage: fixed-shape pixel tensor -> (out_h, out_w) tensor
    via nearest-neighbor sampling. Real: the sampling IS the resize
    algorithm (vectorized gather over the whole batch); only the
    upstream codec is faked. Demonstrates the tensor-in/tensor-out
    stage shape for preprocessing pipelines."""

    def __init__(self, out_h: int = 4, out_w: int = 4,
                 in_shape: tuple[int, int, int] = FAKE_DECODE_SHAPE,
                 pixels_col: str = "pixels"):
        self.out_h, self.out_w = out_h, out_w
        self.in_shape = in_shape
        self.pixels_col = pixels_col
        h, w, _ = in_shape
        # nearest-neighbor index grid built once per actor
        ys = (np.arange(out_h) * h // out_h)
        xs = (np.arange(out_w) * w // out_w)
        self.gather = (ys[:, None] * w + xs[None, :]).reshape(-1)

    def __call__(self, b: pa.Table) -> pa.Table:
        h, w, c = self.in_shape
        col = b[self.pixels_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        px = flat.reshape(n, h * w, c)
        small = px[:, self.gather, :]  # (n, out_h*out_w, c) one gather
        out_flat = small.reshape(n, -1)
        tensor = pa.FixedSizeListArray.from_arrays(
            pa.array(out_flat.reshape(-1), pa.uint8()), self.out_h * self.out_w * c)
        return b.append_column("pixels_small", tensor)


class FrameSample:
    """Actor stage: video-like binary column -> every k-th frame's
    bytes as a list<binary> column. The frame SPLIT (fixed frame_bytes
    stride) and sampling are real vectorized slicing; only a real
    container demuxer is faked by the fixed stride."""

    def __init__(self, data_col: str = "data", frame_bytes: int = 64, every_k: int = 4):
        self.data_col = data_col
        self.frame_bytes = frame_bytes
        self.every_k = every_k

    def __call__(self, b: pa.Table) -> pa.Table:
        col = b[self.data_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        frames_out = []
        n_frames = np.empty(len(col), dtype=np.int64)
        for i, v in enumerate(col.to_pylist()):
            data = v or b""
            total = len(data) // self.frame_bytes
            picks = range(0, total, self.every_k)
            frames_out.append([data[j * self.frame_bytes:(j + 1) * self.frame_bytes]
                               for j in picks])
            n_frames[i] = len(frames_out[-1])
        out = b.append_column("frames", pa.array(frames_out, pa.list_(pa.binary())))
        return out.append_column("n_sampled_frames", pa.array(n_frames, pa.int64()))


def resize_images(ds: ray.data.Dataset, out_h: int = 4, out_w: int = 4,
                  batch_size: int = 256,
                  concurrency: int | tuple[int, int] = (1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResize, fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


def sample_frames(ds: ray.data.Dataset, frame_bytes: int = 64, every_k: int = 4,
                  batch_size: int = 128,
                  concurrency: int | tuple[int, int] = (1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "every_k": every_k},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


def synth_binary_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake multimodal table for tests: (item_id, mime,
    data:binary) — stands in for an image shard."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(64, 512, size=n)
    data = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n), pa.int64()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
            "data": pa.array(data, pa.binary()),
        }
    )


# ---------------------------------------------------------------------
# Real PNG codec (stdlib zlib) — the bytes->tensor decode path
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_encode(arr: np.ndarray) -> bytes:
    """Minimal PNG writer (8-bit grey/RGB/RGBA, filter 0) — the
    deterministic fixture generator for the decode path."""
    import struct
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + typ + payload +
                struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def png_decode(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """Real PNG decode with the stdlib only: chunk walk, zlib
    inflate, scanline unfilter (all five filter types per the PNG
    spec). 8-bit depth, no interlace. Returns (pixels[h,w,c], h, w,
    c); malformed input raises ValueError."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(data):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        typ = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", payload)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or interlace:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    c = _PNG_CHANNELS.get(ctype)
    if c is None:
        raise ValueError(f"unsupported color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline data")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), np.uint16)
    for y in range(h):
        f = filters[y]
        line = rows[y, 1:].astype(np.uint16)
        prev = out[y - 1] if y else np.zeros(stride, np.uint16)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            cols = line.reshape(w, c)
            out[y] = (np.cumsum(cols, axis=0, dtype=np.uint64) % 256) \
                .reshape(-1)
        elif f == 2:  # Up
            out[y] = (line + prev) % 256
        elif f == 3:  # Average (sequential in x)
            rec = out[y]
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) % 256
        elif f == 4:  # Paeth (sequential in x)
            rec = out[y]
            for x in range(stride):
                a = int(rec[x - c]) if x >= c else 0
                b_ = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b_ - cc
                pa_, pb, pcc = abs(p - a), abs(p - b_), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pcc) else \
                    (b_ if pb <= pcc else cc)
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad filter {f}")
    return out.astype(np.uint8).reshape(h, w, c), h, w, c


class PngDecode:
    """Actor stage: PNG binary column -> variable-size pixel tensors
    (list<uint8>) + width/height/channels + features. The REAL codec
    path (stages/multimodal.py round-3 stub closed): zlib inflate +
    scanline unfilter per image, batched per actor."""

    def __init__(self, data_col: str = "data", on_error: str = "null"):
        self.data_col = data_col
        self.on_error = on_error

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b[self.data_col].to_pylist()
        flats, lens, hs, ws, cs, means = [], [], [], [], [], []
        for p in payloads:
            try:
                px, h, w, c = png_decode(p or b"")
            except ValueError:
                if self.on_error == "raise":
                    raise
                flats.append(np.empty(0, np.uint8))
                lens.append(0)
                hs.append(None)
                ws.append(None)
                cs.append(None)
                means.append(None)
                continue
            flat = px.reshape(-1)
            flats.append(flat)
            lens.append(len(flat))
            hs.append(h)
            ws.append(w)
            cs.append(c)
            means.append(float(flat.mean()) if len(flat) else None)
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        values = np.concatenate(flats) if flats else np.empty(0, np.uint8)
        pixels = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(values, pa.uint8()))
        out = b.append_column("pixels", pixels)
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("channels", pa.array(cs, pa.int64()))
        out = out.append_column("mean_intensity", pa.array(means, pa.float64()))
        return out


def decode_png_images(
    ds: ray.data.Dataset,
    data_col: str = "data",
    batch_size: int = 256,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Real-codec decode stage: actor pool, small batches (binary
    rows are wide), Arrow binary in / Arrow list tensors out."""
    return ds.map_batches(
        PngDecode,
        fn_constructor_kwargs={"data_col": data_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
