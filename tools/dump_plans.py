"""Generate PLANS.md: physical-plan evidence for the key queries —
join strategies, exchange counts, pushdown, and the properties the test
suite pins. Run: python tools/dump_plans.py [sf_dir]"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark import suite
from southpaw_spark.plans import (
    join_strategies,
    num_exchanges,
    pushed_filters,
    scan_columns,
)
from southpaw_spark.session import get_spark

SHOWCASE = [
    ("q13_denormalized_order", "flagship nested-doc assembly"),
    ("q14_doc_projection", "2-level doc build + projections"),
    ("q01_latest_by_key", "CDC latest-by-key window"),
    ("q05_three_level_tree", "4-way join chain"),
    ("d02_ngram_jaccard", "shingle self-join near-dup"),
    ("d03_minhash_lsh", "minhash + banding"),
    ("s01_cosine_topk", "brute-force cosine top-k"),
    ("e01_windowed_agg", "tumbling window aggregation"),
    ("e04_asof_join", "as-of join via union-and-window"),
    ("e05_range_join", "bucketed interval join"),
    ("q17_dynamic_schema_docs", "dynamic per-record schema docs (VARIANT)"),
    ("d10_containment_pairs", "one-sided prefix-filter containment (EXTRA)"),
    ("d14_edit_distance_pairs", "PassJoin edit-distance pairs (EXTRA)"),
    ("s06_quantized_topk", "int8-quantized cosine top-k (EXTRA)"),
    ("t14_redact_pii", "regex PII scrub — pure projection (EXTRA)"),
    ("e10_asof_auto", "total as-of join, both arms (EXTRA)"),
    ("d15_duplicate_spans", "span-level exact dedup, interval merge (EXTRA)"),
    ("t15_token_budget_sample", "token-budget mix, no global sort (EXTRA)"),
    ("d17_span_contamination", "span decontamination, broadcast bench (EXTRA)"),
    ("d18_semantic_dedup", "SemDeDup within-cell pair scan (EXTRA)"),
    ("a09_global_rank", "exact global rank, no global sort (EXTRA)"),
    ("t16_shuffled_shards", "epoch-shuffle shard layout (EXTRA)"),
    ("s07_mmr_topk", "MMR diversified top-k, Arrow greedy (EXTRA)"),
    ("s08_ivf_quantized_topk", "IVF cells × int8 codes × exact rescore (EXTRA)"),
    ("e11_gapfill", "time-series gapfill, locf + interpolate (EXTRA)"),
    ("d19_bloom_decontamination", "bloom-bitmap prefilter + exact confirm (EXTRA)"),
    ("t17_temperature_mix", "temperature-mix budgets + t15 greedy (EXTRA)"),
    ("t18_url_dedup", "URL canonicalize + dedup — codegen groupBy (EXTRA)"),
    ("e12_ohlc", "OHLC bars — single combiner-friendly shuffle (EXTRA)"),
    ("t19_line_clean", "C4 line cleaning — zero-shuffle codegen (EXTRA)"),
    ("m05_audio_fingerprint", "audio energy-delta fingerprint (EXTRA)"),
    ("m06_image_ahash", "engine-checked real PNG aHash (EXTRA)"),
    ("a10_period_over_period", "hourly deltas via LAG — 1 shuffle + window (EXTRA)"),
    ("t20_hash_split", "train/val/test split — zero-shuffle codegen (EXTRA)"),
    ("t21_bpe_encode", "vocab-driven BPE encode — Arrow projection, 0 shuffles (EXTRA)"),
    ("t22_model_quality_score", "hashed-BoW linear model — codegen explode + partial agg (EXTRA)"),
    ("d20_embedding_contamination", "embedding decontamination — gemm mapInPandas, 0 shuffles (EXTRA)"),
    ("a11_cohort_retention", "cohort retention — 2 combiner shuffles, tiny window (EXTRA)"),
    ("m07_video_frame_hashes", "video frame aHash — Arrow projection, 0 shuffles (EXTRA)"),
    ("e13_funnel", "strict-order funnel — 1 per-user shuffle + global agg (EXTRA)"),
    ("e14_rolling_active_users", "rolling active users — bounded fan-out, no range join (EXTRA)"),
    ("s09_pq_topk", "product-quantization ANN — ADC scan + exact rescore (EXTRA)"),
    ("d21_jaccard_contamination", "fuzzy decontamination — PPJoin prefix + intersect verify (EXTRA)"),
    ("a12_exact_quantiles", "exact quantiles — range buckets, no global sort (EXTRA)"),
    ("d22_line_dedup", "corpus-global repeated-line removal — 1 combiner groupBy + rewrite (EXTRA)"),
    ("t23_perplexity_buckets", "CCNet perplexity strata — t13 LM + per-domain window (EXTRA)"),
    ("t24_blocklist_hits", "URL blocklist gate — suffix-chain explode + broadcast join (EXTRA)"),
    ("t25_pack_sequences", "materialized training packs — 1 exchange, group-by reuses window partitioning (EXTRA)"),
    ("t26_epoch_repeat", "multi-epoch upsampling — zero-shuffle codegen explode (EXTRA)"),
    ("t27_reference_perplexity", "CCNet reference-trained LM — left-join add-one floor (EXTRA)"),
    ("s10_ann_recall", "ANN recall@k vs exact — benchmark-sized semi-join (EXTRA)"),
    ("t28_language_id", "trained language ID — labels_only: 1 combiner groupBy IS the query, no join-back"),
    ("t29_corpus_profile", "corpus stats report — combiner aggs + one stratum window (EXTRA)"),
    ("t30_gopher_quality", "Gopher rule gate — pure codegen projection, 0 shuffles"),
    ("t31_gopher_repetition", "Gopher repetition — per-doc HOF scans, 0 shuffles beyond the local input-widening guard"),
    ("t32_chunk_documents", "context-window chunking — codegen transform + posexplode, 0 shuffles (EXTRA)"),
    ("s11_centroid_outliers", "embedding outlier scores — dims groupBy → broadcast centroid → zip_with cosine + per-label rank; hot_group_rows range-bucket escape"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan evidence (auto-generated by tools/dump_plans.py)",
        "",
        f"Scale factor dir: `{sf_dir}`. Broadcast exchanges are the cheap",
        "kind (small sides); `Exchange` counts are hash-partition shuffles.",
        "At cluster scale Catalyst swaps broadcast→SMJ per its statistics —",
        "the plans below are what AQE chose at this data size.",
        "",
        "| query | purpose | shuffles | joins | notes |",
        "|---|---|---|---|---|",
    ]
    details = []
    for name, purpose in SHOWCASE:
        df = {**suite.QUERIES, **suite.EXTRA_QUERIES}[name](spark, sf_dir)
        ex = num_exchanges(df)
        js = join_strategies(df)
        js_str = ", ".join(f"{k}×{v}" for k, v in js.items()) or "none"
        pf = [p for p in pushed_filters(df) if p]
        note = []
        if pf:
            note.append(f"{len(pf)} pushed-filter scans")
        cols = scan_columns(df)
        if cols:
            note.append(f"{len(cols)} pruned scans")
        out.append(
            f"| {name} | {purpose} | {ex} | {js_str} | {'; '.join(note)} |"
        )
        if name == "q13_denormalized_order":
            details.append(
                "\n## q13 flagship plan properties\n\n"
                f"- shuffle exchanges: {ex} (one hash partition per tree level: "
                "lineitem grouping, plus partial/final aggregate pairs)\n"
                f"- join strategies: {js_str} — every dimension broadcast at "
                "this size; the orders↔grouped-lineitem join would become "
                "sort-merge on a cluster once the grouped side exceeds the "
                "threshold, with no code change\n"
                "- child-array structs carry no duplicated key fields "
                "(PK-prefix sort optimization in operators/denormalize.py)\n"
            )
    out.extend(details)
    out.append(
        "\n## Enforced by tests (tests/test_plans_functions.py)\n\n"
        "- parquet predicate pushdown reaches the scan (`PushedFilters`)\n"
        "- column pruning: scans read only referenced columns (`ReadSchema`)\n"
        "- flagship joins broadcast at test scale; no SortMergeJoin\n"
        "- latest-by-key dedup is exactly one hash-partition exchange\n"
    )
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
