"""Remote tap processor — pass-through with a rate-limited side tap.

Reference semantics (processor/remotetapprocessor): the processor
forwards its input unchanged and serves a RATE-LIMITED copy of
passing items (default 1 msg/sec) to attached observers over a
WebSocket (README "Config"; the limiter drops, never blocks, so the
tap can never backpressure the pipeline).

Ray mapping: a live socket has no place in a batch engine; the tap's
job — "let an operator peek at a bounded sample of what's flowing
without perturbing the stream" — maps to a map_batches pass-through
that writes at most ``limit_per_block`` head rows of each block to a
side Parquet directory (one file per block, atomic tmp+rename, so a
retried task overwrites its own tap file idempotently and the sample
stays deterministic). The batch itself is returned untouched
(zero-copy), so the main stream sees no change and no extra
materialization; total tap volume is bounded by
``limit_per_block × #blocks`` regardless of data size.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def remote_tap(
    ds: ray.data.Dataset,
    tap_dir: str,
    *,
    limit_per_block: int = 10,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Tap up to ``limit_per_block`` head rows of every block into
    ``tap_dir`` and pass the stream through unchanged."""
    os.makedirs(tap_dir, exist_ok=True)

    def f(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            sample = batch.slice(0, limit_per_block)
            if columns is not None:
                sample = sample.select(columns)
            # content-derived name: retries of the same block rewrite
            # the same file; distinct blocks cannot collide. Hash the
            # sample's actual IPC bytes — a repr-based hash elides the
            # middle of long arrays and can collide on samples sharing
            # head/tail rows. combine_chunks first so chunk layout
            # (which IPC encodes) can't split identical content.
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sample.schema) as w:
                w.write_table(sample.combine_chunks())
            h = hashlib.md5(sink.getvalue())
            h.update(str(batch.num_rows).encode())
            tid = h.hexdigest()[:16]
            tmp = os.path.join(tap_dir, f".{tid}.tmp")
            pq.write_table(sample, tmp, compression="zstd")
            os.replace(tmp, os.path.join(tap_dir, f"tap-{tid}.parquet"))
        return batch

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
