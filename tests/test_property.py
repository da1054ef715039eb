"""Property tests (hypothesis) over the pure vectorized kernels —
the hashing/pair-explosion/jaccard cores the distributed stages rest
on. Kernel-level (no Ray session per example) so hypothesis can
explore hundreds of cases cheaply."""

import base64
import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.lists(st.text(max_size=80), min_size=0, max_size=30)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_md5_u64_matches_hashlib(vals):
    from opentelemetry_collector_contrib_ray.functions.hashing import md5_number_lower_np

    got = md5_number_lower_np(vals)
    want = np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little") for s in vals],
        dtype=np.uint64,
    )
    assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(texts)
def test_sha256_and_base64_match_stdlib(vals):
    from opentelemetry_collector_contrib_ray.functions.encode import (
        base64_encode,
        sha256_hex,
    )

    arr = pa.array(vals, pa.string())
    assert sha256_hex(arr).to_pylist() == [hashlib.sha256(s.encode()).hexdigest() for s in vals]
    assert base64_encode(arr).to_pylist() == [base64.b64encode(s.encode()).decode() for s in vals]


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(0, 12), min_size=0, max_size=200))
def test_explode_runs_matches_bruteforce(keys):
    from opentelemetry_collector_contrib_ray.stages.dedup import (
        _explode_runs_vectorized,
        _seg_starts_np,
    )

    keys = np.sort(np.array(keys, dtype=np.int64))
    ia, ib = _explode_runs_vectorized(_seg_starts_np(keys), len(keys))
    got = set(zip(ia.tolist(), ib.tolist()))
    want = {
        (i, j)
        for i in range(len(keys))
        for j in range(i + 1, len(keys))
        if keys[i] == keys[j]
    }
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=30), min_size=1, max_size=10),
       st.lists(st.text(alphabet="ab ", max_size=30), min_size=1, max_size=10))
def test_jaccard_batch_matches_scalar(a_texts, b_texts):
    from opentelemetry_collector_contrib_ray.stages.dedup import _jaccard_batch, jaccard

    n = min(len(a_texts), len(b_texts))
    a_texts, b_texts = a_texts[:n], b_texts[:n]
    got = _jaccard_batch(a_texts, b_texts, ngram=2)
    want = np.array([jaccard(a, b, 2) for a, b in zip(a_texts, b_texts)])
    assert np.allclose(got, want)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=100),
       st.lists(st.integers(0, 20), min_size=1, max_size=10))
def test_simhash_segments_matches_per_doc(hashes, lens):
    from opentelemetry_collector_contrib_ray.functions.hashing import (
        simhash64_from_token_hashes,
        simhash64_segments,
    )

    flat = np.array(hashes, dtype=np.uint64)
    lens = np.array(lens, dtype=np.int64)
    # clip lens to cover exactly len(flat)
    total = int(flat.size)
    lens = np.minimum(lens, total)
    acc, out_lens = 0, []
    for l in lens:
        take = min(l, total - acc)
        out_lens.append(take)
        acc += take
        if acc >= total:
            break
    out_lens = np.array(out_lens or [0], dtype=np.int64)
    offsets = np.zeros(len(out_lens) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offsets[1:])
    flat = flat[: offsets[-1]]
    seg = simhash64_segments(flat, offsets)
    per_doc = simhash64_from_token_hashes(
        [flat[offsets[i]:offsets[i + 1]] for i in range(len(out_lens))])
    assert np.array_equal(seg, per_doc)
