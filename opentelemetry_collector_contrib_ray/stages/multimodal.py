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
