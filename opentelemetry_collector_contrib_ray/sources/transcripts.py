"""Deterministic synthetic transcript table (FIXTURES.md F1/F1a).

This is the engine's primary input per BASELINE.json ``input_hint`` —
a Parquet table ``(conv_id, turn_idx, role, text, tool, ts)`` of
multi-turn conversation transcripts, where ``text`` is a rendered
log line the regex/severity/time parse stages work on (mirrors the
reference regex benchmark line,
pkg/stanza/operator/parser/regex/benchmark_test.go:22-36).

Fully reproducible from (SEED, n_rows):
  * conv_id popularity is Zipf(1.2) over 1000 ids — a few ids are hot
    (skew-handling fixture);
  * turn_idx contiguous per conv; ts = BASE + conv_offset + 7s*turn_idx
    (whole seconds so the embedded time string round-trips exactly);
  * ~3% of rows get deliberately malformed text (truncation or
    bracket corruption) to exercise on_error send/drop masks
    (reference: pkg/stanza/operator/helper/transformer.go:214-224);
  * dur values are multiples of 0.25 so float sums are exact in any
    summation order (keeps Ray vs DuckDB aggregate hashes identical);
  * status spans 2xx/3xx/4xx/5xx so severity range mapping
    (helper/severity_builder.go:199-206) is exercised.

Tables are cached under /tmp/graft_transcripts/<sf>/ and generated
with numpy + pandas only (no Ray) so both the Ray queries and the
DuckDB oracle SQL can read the same files.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import ROLES, TOOLS, TRANSCRIPT_SCHEMA

SEED = 42
N_CONVS = 1000
ZIPF_A = 1.2
BASE_EPOCH_S = 1_767_225_600  # 2026-01-01T00:00:00Z
SPAN_S = 72 * 3600  # conv start offsets span 72h -> hour bucketing non-trivial
MALFORMED_FRAC = 0.03

# rows per scale factor (FIXTURES.md F1: smoke/correctness/bench)
SF_ROWS = {"0.001": 1_000, "0.01": 50_000, "0.1": 5_000_000}

CACHE_ROOT = "/tmp/graft_transcripts"

_VOCAB = (
    "the build failure summarize retry tool call output plan search query result "
    "file patch diff test pass fail error warn stack trace commit branch merge "
    "deploy config flag batch stream shuffle block actor task node cluster memory "
    "spill object store parquet arrow schema column row group filter join sort "
    "agent user turn context token prompt answer reason step check verify run "
    "index cache scale"
).split()
assert len(_VOCAB) == 64

_STATUSES = np.array([200, 201, 204, 301, 302, 400, 403, 404, 418, 429, 500, 502, 503])
_STATUS_W = np.array([0.38, 0.10, 0.08, 0.05, 0.04, 0.08, 0.05, 0.07, 0.02, 0.03, 0.045, 0.03, 0.025])
_STATUS_W = _STATUS_W / _STATUS_W.sum()

_ROLE_P = [0.40, 0.40, 0.05, 0.15]
_DUR_FRAC = np.array([".0", ".25", ".5", ".75"])


def sf_name(sf_dir_or_sf: str | float) -> str:
    """'/root/testdata/sf0.01' -> '0.01'; 0.01 -> '0.01'."""
    if isinstance(sf_dir_or_sf, (int, float)):
        return format(float(sf_dir_or_sf), "g")
    m = re.search(r"sf([0-9.]+)/?$", str(sf_dir_or_sf))
    if m:
        return m.group(1)
    return str(sf_dir_or_sf)


def rows_for_sf(sf: str) -> int:
    if sf in SF_ROWS:
        return SF_ROWS[sf]
    return max(1_000, int(float(sf) * 50_000_000))


def generate_transcripts(n_rows: int, seed: int = SEED) -> pa.Table:
    """Build the transcript table fully vectorized; deterministic."""
    rng = np.random.default_rng(seed)

    # 1. conversation sizes: multinomial over Zipf(1.2) popularity
    k = np.arange(1, N_CONVS + 1, dtype=np.float64)
    w = k ** (-ZIPF_A)
    w /= w.sum()
    counts = rng.multinomial(n_rows, w)
    conv_index = np.repeat(np.arange(N_CONVS), counts)  # sorted by conv
    turn_idx = np.concatenate([np.arange(c, dtype=np.int64) for c in counts if c > 0]) \
        if n_rows else np.empty(0, dtype=np.int64)

    conv_offset = rng.integers(0, SPAN_S, size=N_CONVS)

    # 2. per-row categoricals
    role_idx = rng.choice(len(ROLES), size=n_rows, p=_ROLE_P)
    roles = np.array(ROLES)[role_idx]
    tool_draw = rng.integers(0, len(TOOLS), size=n_rows)
    has_tool = (roles == "tool") | (rng.random(n_rows) < 0.10)
    tools = np.where(has_tool, np.array(TOOLS)[tool_draw], "")

    status = rng.choice(_STATUSES, size=n_rows, p=_STATUS_W)
    dur_q = rng.integers(1, 2001, size=n_rows)  # dur = q * 0.25 ms, exact float
    base_level = rng.choice(np.array(["TRACE", "DEBUG", "INFO"]), size=n_rows, p=[0.10, 0.25, 0.65])
    level = np.where(status >= 500, "ERROR", np.where(status >= 400, "WARN", base_level))

    # 3. timestamps (whole seconds -> exact text round-trip). The
    # per-turn offset wraps at the 72h window so event-time hour
    # cardinality stays bounded at any scale (a Zipf-hot conv would
    # otherwise stretch the hour key space linearly with its length);
    # convs shorter than 37k turns (all of sf<=0.01) never wrap.
    ts_s = BASE_EPOCH_S + conv_offset[conv_index] + (7 * turn_idx) % SPAN_S
    ts64 = ts_s.astype("datetime64[s]")

    # 4. payload: 3..10 words from the 64-word vocab — built as an
    # Arrow list array + binary_join (no per-row Python)
    n_words = rng.integers(3, 11, size=n_rows)
    total_words = int(n_words.sum())
    word_idx_flat = rng.integers(0, len(_VOCAB), size=total_words)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_words, out=offsets[1:])
    vocab_arr = pa.array(_VOCAB, pa.string())
    words_flat = pc.take(vocab_arr, pa.array(word_idx_flat, pa.int64()))
    word_lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), words_flat)
    payload = pc.binary_join(word_lists, " ")

    # 5. render text — all Arrow kernels (C, no Python string churn)
    ts_arrow = pa.array(ts64.astype("datetime64[us]"), pa.timestamp("us"))
    # Arrow %S prints fractional digits for sub-second units; format
    # from second precision so the layout round-trips with strptime
    time_str = pc.strftime(pc.cast(ts_arrow, pa.timestamp("s")), format="%Y-%m-%d %H:%M:%S")
    dur_str = pc.binary_join_element_wise(
        pc.cast(pa.array(dur_q // 4), pa.string()),
        pc.take(pa.array(_DUR_FRAC, pa.string()), pa.array(dur_q % 4, pa.int64())),
        "",
    )
    roles_arr = pa.array(roles, pa.string())
    tools_arr = pa.array(tools, pa.string())
    tool_tag = pc.if_else(pc.equal(tools_arr, ""), pa.scalar("-", pa.string()), tools_arr)
    text = pc.binary_join_element_wise(
        pa.array(level, pa.string()), " [", time_str, "] ",
        roles_arr, "@", tool_tag,
        " status=", pc.cast(pa.array(status), pa.string()),
        " dur=", dur_str, "ms :: ", payload,
        "",
    )

    # 6. malformed rows: truncate or corrupt the opening bracket
    bad = rng.random(n_rows) < MALFORMED_FRAC
    style = rng.integers(0, 2, size=n_rows)
    trunc = pa.array(bad & (style == 0))
    brak = pa.array(bad & (style == 1))
    text = pc.if_else(trunc, pc.utf8_slice_codeunits(text, start=0, stop=12), text)
    text = pc.if_else(
        brak,
        pc.replace_substring(text, pattern="[", replacement="(", max_replacements=1),
        text,
    )

    # conv-%08d ids without per-row format(): 8-digit zero pad via slice
    pad = pc.utf8_slice_codeunits(
        pc.cast(pa.array(conv_index + 100_000_000), pa.string()), start=1, stop=9
    )
    conv_id = pc.binary_join_element_wise(pa.scalar("conv-"), pad, "")

    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": roles_arr,
            "text": text,
            "tool": tools_arr,
            "ts": ts_arrow,
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def transcripts_dir(sf: str) -> str:
    return os.path.join(CACHE_ROOT, f"sf{sf}")


def ensure_transcripts(sf_dir_or_sf: str | float) -> str:
    """Generate (once) and return the cached transcript parquet dir.

    Atomic: writes to a temp dir then renames, so concurrent callers
    and the DuckDB oracle always see complete files. Files are split
    ~500k rows each so Ray's read parallelizes at bench scale.
    """
    # a pre-built transcript directory (part-*.parquet files) passes
    # through untouched — lets pipelines run on externally supplied
    # transcript shards, not only the cached synthetic sfs
    s = str(sf_dir_or_sf)
    if os.path.isdir(s) and _glob.glob(os.path.join(s, "part-*.parquet")):
        return s
    sf = sf_name(sf_dir_or_sf)
    out = transcripts_dir(sf)
    if os.path.isdir(out) and os.listdir(out):
        return out
    n_rows = rows_for_sf(sf)
    tbl = generate_transcripts(n_rows)
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT)
    try:
        # ~125k rows per file: one fused read->parse->route->write task
        # per file stays ~200 MB heap, and the decode parallelizes wide
        n_files = max(1, n_rows // 125_000)
        per = (tbl.num_rows + n_files - 1) // n_files
        for i in range(n_files):
            chunk = tbl.slice(i * per, per)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(tmp, f"part-{i:05d}.parquet"),
                               row_group_size=125_000)
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not (os.path.isdir(out) and os.listdir(out)):
            raise
    return out


def transcripts_glob(sf_dir_or_sf: str | float) -> str:
    """Path glob usable in DuckDB ``read_parquet('...')`` oracle SQL."""
    return os.path.join(ensure_transcripts(sf_dir_or_sf), "*.parquet")
