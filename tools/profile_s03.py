"""Where does s03_ivf_kmeans' wall go? Times the corpus count, the
KMeans fit (with per-iteration breakdown via maxIter sweeps), and the
assign+probe+rescore query, at the bench SF.

Usage: python tools/profile_s03.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from southpaw_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import math

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from southpaw_spark.operators.similarity import ivf_kmeans_topk

    spark = get_spark("profile-s03")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: full operator once at small SF
    emb_w = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q_w = emb_w.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ivf_kmeans_topk(emb_w, q_w, "embedding", "vec_id", k=5).write.format(
        "noop"
    ).mode("overwrite").save()

    for rep in range(reps):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        t0 = time.monotonic()
        n = emb.count()
        t1 = time.monotonic()
        n_cells = max(2, min(4096, int(math.sqrt(n))))
        feats = array_to_vector(
            F.col("embedding").cast("array<double>")
        ).alias("features")
        train = emb.select(feats)
        model = KMeans(k=n_cells, seed=42, featuresCol="features").fit(train)
        t2 = time.monotonic()
        queries = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        ivf_kmeans_topk(
            emb, queries, "embedding", "vec_id", k=5
        ).write.format("noop").mode("overwrite").save()
        t3 = time.monotonic()
        print(
            f"rep {rep}: n={n} n_cells={n_cells} count={t1-t0:.3f}s "
            f"fit={t2-t1:.3f}s full_op={t3-t2:.3f}s "
            f"(iters={model.summary.numIter}) total≈{t3-t0:.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
