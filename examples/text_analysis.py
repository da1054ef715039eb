"""Text-analysis pipeline over a documents table.

Usage: python examples/text_analysis.py [sf_dir]
       (default /root/testdata/sf0.01)

One fused pass computing language-ID, quality scores, token counts and
rolling-hash fingerprints, then a per-language quality summary.
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

    from opentelemetry_collector_contrib_ray.stages.textstats import (
        Fingerprint,
        LangId,
        TextQuality,
        TokenCount,
    )

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])
    ds = docs
    for stage in (LangId(), TextQuality(), TokenCount(), Fingerprint()):
        ds = stage.apply(ds)

    summary = ds.groupby("pred_lang") \
        .mean(["n_bpe_tokens", "n_stopwords", "lang_confidence"]).to_pandas()
    print(summary.sort_values("pred_lang").to_string(index=False))

    sample = ds.limit(3).to_pandas()
    cols = ["doc_id", "pred_lang", "n_words", "n_bpe_tokens", "content_hash"]
    print(sample[cols].to_string(index=False))
    ray.shutdown()


if __name__ == "__main__":
    main()
