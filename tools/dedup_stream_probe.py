"""Incremental-dedup scale probe (BASELINE.md §9): feed the sf0.1
documents corpus to IncrementalDeduper as micro-batches and print
per-batch wall vs accumulated state size. The claim under test: per-batch
latency tracks the batch + its bucket collisions, never the corpus.

Usage: python tools/dedup_stream_probe.py [batch_size] [n_docs] [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark.session import get_spark
from southpaw_spark.streaming import ParquetStateStore
from southpaw_spark.streaming.dedup_stream import IncrementalDeduper


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < n_docs)
        .cache()
    )
    docs.count()
    with tempfile.TemporaryDirectory() as root:
        d = IncrementalDeduper(
            spark, ParquetStateStore(spark, root, n_buckets=16)
        )
        state = 0
        walls = []
        for lo in range(0, n_docs, batch_size):
            batch = docs.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + batch_size)
            )
            t0 = time.time()
            d.process_batch(batch)
            w = time.time() - t0
            walls.append(w)
            print(
                f"batch [{lo},{lo + batch_size}) state={state} "
                f"wall={w:.1f}s", flush=True,
            )
            state += batch_size
        d.close()
        print(
            f"mean per-batch wall: {sum(walls) / len(walls):.1f}s "
            f"(min {min(walls):.1f} / max {max(walls):.1f}); "
            f"metrics: {d.metrics}"
        )


if __name__ == "__main__":
    main()
