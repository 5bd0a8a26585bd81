"""Capture .explain("formatted") for every headline bench query into
plans/r16/<name>_<tag>.txt (tag = before/after). Planning only — no jobs.

Usage: python tools/capture_plans_r16.py <tag> [sf_dir] [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from southpaw_spark import suite
from southpaw_spark.session import get_spark

NAMES = [
    "q13_denormalized_order", "q14_doc_projection", "q15_shared_entity_tree",
    "q04_nested_children", "q05_three_level_tree", "q01_latest_by_key",
    "q12_composite_pk", "q16_filter_unchanged_skip",
    "d01_dedup_exact", "d02_ngram_jaccard", "d03_minhash_lsh", "d04_simhash",
    "s01_cosine_topk", "s02_ivf_topk", "t02_quality_score",
    "t05_bpe_token_count", "e01_windowed_agg", "e02_sessionize",
    "e04_asof_join", "m01_image_metadata_decode",
    "d15_duplicate_spans", "s08_ivf_quantized_topk", "e12_ohlc",
    "t19_line_clean", "d18_semantic_dedup", "t22_model_quality_score",
    "d20_embedding_contamination", "a11_cohort_retention", "e13_funnel",
    "e14_rolling_active_users", "d22_line_dedup", "t23_perplexity_buckets",
    "t24_blocklist_hits", "t25_pack_sequences", "t26_epoch_repeat",
    "t27_reference_perplexity", "t28_language_id", "t29_corpus_profile",
    "t30_gopher_quality", "t31_gopher_repetition", "t32_chunk_documents",
    "s11_centroid_outliers",
]


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or NAMES
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans-r16")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = suite.QUERIES.get(name) or suite.EXTRA_QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not in registry", flush=True)
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
