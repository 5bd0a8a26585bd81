"""Incremental SPAN-dedup scale probe (BASELINE.md §16): feed the sf0.1
documents corpus to IncrementalSpanDeduper as micro-batches and print
per-batch wall vs accumulated gram-state size. Claims under test:
per-batch latency tracks the batch (+ bucket collisions), never the
corpus; pending-occurrence state stays < min_count per gram.

Usage: python tools/span_stream_probe.py [batch_size] [n_docs] [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark.session import get_spark
from southpaw_spark.streaming import ParquetStateStore
from southpaw_spark.streaming.dedup_stream import (
    IncrementalSpanDeduper,
    _SPAN_GRAMS,
)


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("span-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < n_docs)
        .cache()
    )
    docs.count()
    with tempfile.TemporaryDirectory() as root:
        d = IncrementalSpanDeduper(
            spark, ParquetStateStore(spark, root, n_buckets=16), k=8
        )
        walls = []
        for lo in range(0, n_docs, batch_size):
            batch = docs.where(
                (F.col("doc_id") >= lo)
                & (F.col("doc_id") < lo + batch_size)
            )
            t0 = time.time()
            upd = d.process_batch(batch)
            w = time.time() - t0
            walls.append(w)
            grams = d.store.read(_SPAN_GRAMS).count()
            print(
                f"batch [{lo},{lo + batch_size}) wall={w:6.2f}s "
                f"updates={upd.count():5d} gram_state={grams}"
            )
        mean = sum(walls) / len(walls)
        print(
            f"batches={len(walls)} mean={mean:.2f}s "
            f"first={walls[0]:.2f}s last={walls[-1]:.2f}s"
        )
        mx = d.store.read(_SPAN_GRAMS).agg(
            F.max(F.size("pending"))
        ).collect()[0][0]
        print(f"max pending per gram = {mx} (< min_count asserted)")
        assert mx < d.min_count
        d.close()


if __name__ == "__main__":
    main()
