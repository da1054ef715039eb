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
