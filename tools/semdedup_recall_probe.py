"""d18 SemDeDup recall probe (BASELINE.md §17): measure the k-means
production path's DOC-LEVEL recall against the exact all-pairs answer,
at the suggest_n_cells(N) sizing and at 1 vs 2 probes.

Corpus: the synthetic embeddings tables have no natural near-dups at
0.95 (max pairwise cosine ≈ 0.51), so the probe PLANTS them — a seeded
numpy RNG clones 20% of the vectors with small additive noise, giving
a known duplicate structure whose exact answer is recomputed by brute
force (not assumed).

Exact reference: a doc is a duplicate iff ANY smaller id has cosine >=
threshold with it (the d05/d18 decision rule with no cell confinement).
Recall = |flagged ∩ exact_flagged| / |exact_flagged|. Cell confinement
can only MISS pairs, never invent them, so precision is 1.0 by
construction (asserted).

Usage: python tools/semdedup_recall_probe.py [threshold]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark.operators.dedup import (
    semantic_duplicates,
    suggest_n_cells,
)
from southpaw_spark.operators.similarity import _dot, _norm
from southpaw_spark.session import get_spark


def exact_flagged(emb, threshold):
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("__v").alias("__va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("__v").alias("__vb"))
    cos = _dot(F.col("__va"), F.col("__vb")) / (
        _norm(F.col("__va")) * _norm(F.col("__vb"))
    )
    return {
        r["id_b"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .where(cos >= threshold)
        .select("id_b")
        .distinct()
        .collect()
    }


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.95
    spark = get_spark("semdedup-recall")
    spark.sparkContext.setLogLevel("ERROR")
    import numpy as np

    for sf in ("0.01", "0.1"):
        base = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in spark.read.parquet(
                f"/root/testdata/sf{sf}/embeddings.parquet"
            )
            .select("vec_id", F.col("embedding").cast("array<double>"))
            .collect()
        ]
        rng = np.random.default_rng(90918)
        max_id = max(i for i, _ in base)
        clones = []
        for i, v in base[: len(base) // 5]:
            noised = np.asarray(v) + rng.normal(0, 0.02, len(v))
            clones.append((max_id + 1 + i, [float(x) for x in noised]))
        emb = spark.createDataFrame(
            base + clones, "vec_id long, __v array<double>"
        ).persist()
        n = emb.count()
        cells = suggest_n_cells(n)
        exact = exact_flagged(emb, threshold)
        corpus = emb.select("vec_id", F.col("__v").alias("embedding"))
        for probes in (1, 2):
            t0 = time.time()
            got = {
                r["vec_id"]
                for r in semantic_duplicates(
                    corpus, "embedding", "vec_id",
                    threshold=threshold, n_cells=cells,
                    use_kmeans=True, n_probes=probes,
                ).collect()
            }
            wall = time.time() - t0
            assert got <= exact, sorted(got - exact)[:5]  # precision 1.0
            recall = len(got) / len(exact) if exact else 1.0
            print(
                f"sf={sf} n={n} n_cells={cells} threshold={threshold} "
                f"n_probes={probes} exact_dups={len(exact)} "
                f"found={len(got)} recall={recall:.4f} wall={wall:.2f}s"
            )
        emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
