"""Run the dedup family end-to-end over a documents table.

Usage: python examples/dedup_documents.py [sf_dir]
       (default /root/testdata/sf0.01)

Prints, for the same corpus: exact-dup groups, MinHash-LSH near-dup
pairs (jaccard-verified), exact char-3-gram Jaccard pairs, SimHash
pairs, and the resulting near-dup cluster count.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from opentelemetry_collector_contrib_ray.functions.hashing import (
        md5_number_lower_arrow,
    )
    from opentelemetry_collector_contrib_ray.stages.dedup import (
        char_ngram_jaccard_pairs,
        exact_dedup,
        minhash_lsh_candidates,
        simhash_dedup,
        verify_pairs_jaccard_distributed,
    )
    from opentelemetry_collector_contrib_ray.stages.graph import (
        label_propagation_components,
    )

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])

    import pyarrow as pa

    def key(b: pa.Table) -> pa.Table:
        return pa.table({"key": md5_number_lower_arrow(b["text"]).cast(pa.string()),
                         "doc_id": b["doc_id"]})

    keyed = docs.map_batches(key, batch_format="pyarrow", batch_size=None)
    exact = exact_dedup(keyed, "key", "doc_id")
    print("exact-dup groups (dup_count > 1):",
          exact.filter(lambda r: r["dup_count"] > 1).count())

    cand = minhash_lsh_candidates(docs, "text", "doc_id")
    verified = verify_pairs_jaccard_distributed(
        cand, docs, "doc_id", "text", threshold=0.5).materialize()
    print("MinHash-LSH near-dup pairs (jaccard >= 0.5):", verified.count())

    ng = char_ngram_jaccard_pairs(docs, "text", "doc_id",
                                  prefix_len=8, threshold=0.8)
    print("exact char-3-gram Jaccard pairs (>= 0.8):", ng.count())

    sh = simhash_dedup(docs, "text", "doc_id", max_hamming=3, n_blocks=6)
    print("SimHash pairs (hamming <= 3):", sh.count())

    if verified.count():
        comp = label_propagation_components(verified, src="id_a", dst="id_b")
        n_clusters = comp.groupby("component").count().count()
        print("near-dup clusters:", n_clusters)
    ray.shutdown()


if __name__ == "__main__":
    main()
