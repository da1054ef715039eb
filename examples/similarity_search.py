"""Similarity search over an embedding table.

Usage: python examples/similarity_search.py [sf_dir]
       (default /root/testdata/sf0.01)

Runs, on the same corpus: exact brute-force cosine top-k for a few
query vectors, IVF top-k at partial probe (the scale path) with its
recall vs brute force, and LSH-bucketed embedding near-dup pairs.
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

    from opentelemetry_collector_contrib_ray.stages.similarity import (
        embedding_near_dup,
        ivf_search,
        ivf_train,
        knn_brute_force,
    )

    vecs = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                 columns=["vec_id", "embedding"])
    query_ids = [0, 1, 2, 3, 4]
    k = 5

    exact = knn_brute_force(vecs, query_ids, k).to_pandas()
    print(f"brute-force cosine top-{k} for {len(query_ids)} queries: "
          f"{len(exact)} result rows")

    cents = ivf_train(vecs, n_centroids=8, iters=5)
    approx = ivf_search(vecs, query_ids, k, cents, nprobe=4).to_pandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    print(f"IVF nprobe=4/8 recall vs brute force: {len(e & a) / len(e):.2f} "
          "(random gaussian vectors have no cluster structure — real "
          "embeddings fare far better at partial probe)")

    pairs = embedding_near_dup(vecs, threshold=0.9)
    print("embedding near-dup pairs (cosine >= 0.9):", pairs.count(),
          "(this synthetic corpus has none — max off-diagonal cosine "
          "~0.51; tests/test_dedup_similarity.py plants real pairs)")
    ray.shutdown()


if __name__ == "__main__":
    main()
