"""Corpus-build pipeline wiring: each operator is oracle-checked on its
own; these tests pin the composition invariants — stage monotonicity,
dedup completeness of the OUTPUT, decontamination, determinism."""

from pyspark.sql import functions as F

from southpaw_spark.pipelines import build_corpus


def test_build_corpus_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # benchmark containing one real corpus document => it must be dropped
    leaked = docs.orderBy("doc_id").limit(1)
    leaked_id = leaked.collect()[0]["doc_id"]
    benchmark = leaked.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )

    kept, report = build_corpus(
        docs,
        min_tokens=3,
        benchmark=benchmark,
        max_contamination_rate=0.5,
        exact_dedup=True,
        fuzzy_threshold=0.8,
        pack_token_budget=512,
    )
    kept = kept.cache()
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

    # stage counts shrink monotonically in pipeline order
    order = [
        "input", "min_tokens", "decontaminated", "exact_dedup",
        "fuzzy_dedup", "packed",
    ]
    assert list(report) == order
    counts = [report[s] for s in order]
    assert all(a >= b for a, b in zip(counts, counts[1:])), report
    assert report["packed"] == len(ids) > 0

    # the leaked benchmark doc is gone
    assert leaked_id not in ids

    # no two kept docs share content (exact-dedup completeness)
    n_hash = (
        kept.select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
        .count()
    )
    assert n_hash == len(ids)

    # no kept pair is still a near-dup at the fuzzy threshold: CC keeps
    # one doc per cluster, and cross-cluster pairs cannot exist
    from southpaw_spark.operators.dedup import ngram_jaccard_pairs

    assert (
        ngram_jaccard_pairs(kept, "text", "doc_id", n=3, threshold=0.8).count()
        == 0
    )

    # every kept row carries annotations + a pack assignment
    assert {"n_tokens", "quality_score", "lang_guess", "pack_id"} <= set(
        kept.columns
    )

    # determinism: an identical second run keeps the identical set
    kept2, _ = build_corpus(
        docs,
        min_tokens=3,
        benchmark=benchmark,
        max_contamination_rate=0.5,
        exact_dedup=True,
        fuzzy_threshold=0.8,
        pack_token_budget=512,
        collect_report=False,
    )
    assert {r["doc_id"] for r in kept2.select("doc_id").collect()} == ids
    kept.unpersist()


def test_build_corpus_sampling_and_lang_filter(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    kept, report = build_corpus(
        docs,
        langs=["en", "other"],
        sample_rates={"en": 0.5, "other": 0.1},
    )
    langs = {r["lang_guess"] for r in kept.select("lang_guess").collect()}
    assert langs <= {"en", "other"}
    assert 0 < report["sampled"] < report["langs"]
    # hash-threshold sampling: a different salt draws a different sample
    kept_b, _ = build_corpus(
        docs,
        langs=["en", "other"],
        sample_rates={"en": 0.5, "other": 0.1},
        sample_salt="B",
        collect_report=False,
    )
    a = {r["doc_id"] for r in kept.select("doc_id").collect()}
    b = {r["doc_id"] for r in kept_b.select("doc_id").collect()}
    assert a != b
