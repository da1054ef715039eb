"""Deduplication family — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

The reference's only dedup is logdedupprocessor (near-exact key-hash
dedup within an interval, processor/logdedupprocessor/processor.go:
242-295: key = hash(body+attrs), emit one representative + count).
``exact_dedup`` generalizes that to a finite table; the rest are the
training-data near-dup operators a 100 TB corpus pipeline needs
(SURVEY.md §2.5 inventory note; MinHash/LSH per Broder '97, SimHash
per Charikar '02).

Scale shapes:
  * exact: per-batch partial (distinct keys per batch collapse before
    the shuffle) -> groupby(key) merge. The shuffle moves at most one
    row per distinct key per block.
  * minhash-lsh: signatures per batch (stateless vectorized) ->
    explode to (band, band_hash, doc_id) rows -> groupby bands ->
    candidate pairs -> signature-similarity filter -> connected
    components by iterative min-label propagation (bounded rounds).
  * embedding near-dup: random-hyperplane bucket key -> groupby
    bucket -> within-bucket pairwise cosine (brute-force variant for
    the oracle at small scale).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min, Sum

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """uint64 hashes of word n-gram shingles (stable across processes)."""
    words = re.findall(r"\w+", (text or "").lower())
    if len(words) < n:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.array(shingles, dtype=object)).astype(np.uint64))


class MinHasher:
    """Vectorized k-perm MinHash over a batch of documents.

    Universal hashing (a*x + b) mod p with p = 2^61-1; shingle hashes
    are reduced to 31 bits and a < 2^31 so a*x + b < 2^63 never
    overflows uint64 — the whole signature matrix is pure numpy.
    """

    def __init__(self, k: int = 64, ngram: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 31, size=k, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=k, dtype=np.uint64)
        self.k = k
        self.ngram = ngram

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, k) uint64 signature matrix."""
        out = np.full((len(texts), self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        for i, t in enumerate(texts):
            th = _shingle_hashes(t, self.ngram)
            if len(th) == 0:
                continue
            xs = (th >> np.uint64(33)).astype(np.uint64)  # 31-bit shingle keys
            prod = (self.a[:, None] * xs[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
            out[i] = prod.min(axis=1)
        return out


def exact_dedup(ds: ray.data.Dataset, key_col: str, id_col: str) -> ray.data.Dataset:
    """Keep the first (min id) row per exact key; emit
    (key, surviving id, dup_count). logdedup generalized: one
    representative + count per key (processor.go:242-295)."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.select([key_col, id_col]).group_by([key_col]).aggregate([(id_col, "min"), (id_col, "count")])
        return g.rename_columns([key_col, "keep_id", "dup_count"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return partials.groupby(key_col).aggregate(
        Min("keep_id", alias_name="keep_id"), Sum("dup_count", alias_name="dup_count")
    )


def _band_rows(ids: np.ndarray, sigs: np.ndarray, bands: int) -> pa.Table:
    """Explode signatures to (band, band_hash, id) rows for the LSH
    groupby. band_hash folds the band's rows with FNV-style mixing."""
    n, k = sigs.shape
    rows_per_band = k // bands
    band_ids = []
    band_hashes = []
    doc_ids = []
    for b in range(bands):
        chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
        h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        for j in range(rows_per_band):
            h = (h ^ chunk[:, j]) * np.uint64(0x100000001B3)
        band_ids.append(np.full(n, b, dtype=np.int32))
        band_hashes.append(h)
        doc_ids.append(ids)
    return pa.table(
        {
            "band": pa.array(np.concatenate(band_ids), pa.int32()),
            "band_hash": pa.array(np.concatenate(band_hashes), pa.uint64()),
            "doc_id": pa.array(np.concatenate(doc_ids)),
        }
    )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 42,
) -> ray.data.Dataset:
    """Candidate near-dup pairs (id_a < id_b) from banded MinHash."""
    hasher = MinHasher(k=k, ngram=ngram, seed=seed)

    def to_bands(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        sigs = hasher.signatures(texts)
        return _band_rows(ids, sigs, bands)

    band_rows = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    cand = band_rows.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # dedupe pairs found in multiple bands
    return cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_bands"))


def jaccard(text_a: str, text_b: str, ngram: int = 3) -> float:
    """Exact word-shingle Jaccard — the verify step after LSH."""
    sa, sb = set(_shingle_hashes(text_a, ngram)), set(_shingle_hashes(text_b, ngram))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(
    cand: ray.data.Dataset, docs_by_id: dict, threshold: float, ngram: int = 3
) -> ray.data.Dataset:
    """Exact-Jaccard verification of LSH candidates. ``docs_by_id`` is
    a broadcast dict of ONLY candidate documents (small by
    construction); shipped via ray.put once, read per actor."""
    import ray

    ref = ray.put(docs_by_id)

    class Verify:
        def __init__(self):
            self.docs = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            d = self.docs
            js = [jaccard(d.get(x), d.get(y), ngram) for x, y in zip(b["id_a"], b["id_b"])]
            b = b.assign(jaccard=js)
            return b[b["jaccard"] >= threshold]

    return cand.map_batches(Verify, batch_format="pandas", batch_size=None, concurrency=(1, 4))


def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over the (small, verified) pair set -> id -> min-id
    cluster representative. Driver-side only because LSH+verify has
    already shrunk the edge set; for planet-scale edge sets iterate
    min-label propagation with groupby instead."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def simhash_dedup(ds: ray.data.Dataset, text_col: str, id_col: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup: 64-bit fingerprints per batch, candidates =
    identical 16-bit quarter-bands (Charikar-style block keys),
    verified by full Hamming distance."""
    from ..functions.hashing import simhash64_from_token_hashes

    def fp(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        th = [_shingle_hashes(t, 1) for t in texts]
        fps = simhash64_from_token_hashes(th)
        return pa.table({id_col: b[id_col], "simhash": pa.array(fps, pa.uint64())})

    fps = ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        h = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        outs = []
        for q in range(4):
            block = (h >> np.uint64(16 * q)) & np.uint64(0xFFFF)
            outs.append(
                pa.table(
                    {
                        "block_idx": pa.array(np.full(len(ids), q, np.int8)),
                        "block": pa.array(block, pa.uint64()),
                        id_col: b[id_col],
                        "simhash": b["simhash"],
                    }
                )
            )
        return pa.concat_tables(outs)

    blocks = fps.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        a, b = np.triu_indices(len(ids), k=1)
        ham = np.array([bin(int(hs[x]) ^ int(hs[y])).count("1") for x, y in zip(a, b)])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[a][keep], "id_b": ids[b][keep], "hamming": ham[keep]})

    cand = blocks.groupby(["block_idx", "block"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))
