from pyspark.sql import functions as F

from southpaw_spark.operators.dedup import (
    embedding_near_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from southpaw_spark.operators.similarity import cosine_topk, ivf_topk


def test_ivf_multiprobe_recall_floor(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, "embedding", "vec_id", k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, "embedding", "vec_id", k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random embeddings are LSH's worst case; multi-probe must still beat
    # the ~31% random-scan floor
    assert recall >= 0.3, f"recall {recall}"


def test_lsh_candidates_subset_property(spark, sf_dir):
    """Every pair LSH surfaces must share at least one identical band —
    cross-check a sample against recomputed jaccard (sanity, not oracle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = minhash_lsh_candidates(docs, "text", "doc_id").limit(5).collect()
    if not cands:
        return
    jacc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.0
        ).collect()
    }
    for r in cands:
        assert (r["id_a"], r["id_b"]) in jacc


def test_simhash_near_duplicates_close(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy cat today"),
            (3, "completely different words appear in this sentence here"),
        ],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[3])


def test_embedding_near_duplicates_finds_planted_pair(spark):
    import random

    random.seed(7)
    base = [random.random() for _ in range(16)]
    near = [x + 0.001 for x in base]
    far = [random.random() * -1 for _ in range(16)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, v array<double>"
    )
    pairs = embedding_near_duplicates(df, "v", "id", threshold=0.99, n_planes=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
