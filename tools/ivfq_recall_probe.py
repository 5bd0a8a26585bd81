"""s08 ivf_quantized_topk recall probe (BASELINE.md §19): the k-means
production path's recall@k vs the exact brute-force top-k (s01), on the
embeddings tables, at sqrt(N) cells and 1/2/4 probes.

Usage: python tools/ivfq_recall_probe.py [k]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark.operators.similarity import (
    cosine_topk,
    ivf_quantized_topk,
)
from southpaw_spark.session import get_spark


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("ivfq-recall")
    spark.sparkContext.setLogLevel("ERROR")
    import numpy as np

    for sf, plant in (("0.01", False), ("0.1", False), ("0.01", True), ("0.1", True)):
        base_rows = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in spark.read.parquet(
                f"/root/testdata/sf{sf}/embeddings.parquet"
            )
            .select("vec_id", F.col("embedding").cast("array<double>"))
            .collect()
        ]
        if plant:
            # planted neighborhoods: each query vector gets 10 seeded
            # noised clones — the realistic retrieval shape (a query's
            # true neighbors ARE nearby), vs the raw table's uniform
            # noise where "nearest" is arbitrary and hostile to ANY
            # cell-confined index
            rng = np.random.default_rng(90919)
            max_id = max(i for i, _ in base_rows)
            clones = []
            for qid, v in base_rows[:50]:
                for j in range(10):
                    noised = np.asarray(v) + rng.normal(0, 0.05, len(v))
                    clones.append(
                        (max_id + 1 + qid * 10 + j, [float(x) for x in noised])
                    )
            base_rows = base_rows + clones
        emb = spark.createDataFrame(
            base_rows, "vec_id long, embedding array<double>"
        ).persist()
        n = emb.count()
        queries = emb.where(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        exact = {}
        for r in cosine_topk(emb, queries, "embedding", "vec_id", k=k).collect():
            exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        for probes in (1, 2, 4):
            t0 = time.time()
            got = {}
            rows = ivf_quantized_topk(
                emb, queries, "embedding", "vec_id",
                k=k, n_probe=probes,
            ).collect()
            wall = time.time() - t0
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            recalls = [
                len(got.get(q, set()) & hits) / len(hits)
                for q, hits in exact.items()
            ]
            recall = sum(recalls) / len(recalls)
            print(
                f"sf={sf} planted={plant} n={n} k={k} n_probe={probes} "
                f"recall@{k}={recall:.4f} wall={wall:.2f}s"
            )
        emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
