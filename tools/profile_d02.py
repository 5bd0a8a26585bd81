"""Where does d02_ngram_jaccard's wall go? Times the corpus count, the
per-doc facts cache build (doc agg), and the candidate+verify tail, at
the bench SF — plus a whole-query wall for reference.

Usage: python tools/profile_d02.py [sf_dir] [reps]
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

    from southpaw_spark.operators.dedup import ngram_jaccard_pairs, release

    spark = get_spark("profile-d02")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up at small SF
    docs_w = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ngram_jaccard_pairs(docs_w, "text", "doc_id", threshold=0.8).write.format(
        "noop"
    ).mode("overwrite").save()

    for rep in range(reps):
        spark.catalog.clearCache()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.monotonic()
        out = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.8)
        t1 = time.monotonic()  # includes the n_docs count job
        doc_cached = out._southpaw_cached[0]
        doc_cached.write.format("noop").mode("overwrite").save()
        t2 = time.monotonic()  # doc facts cache materialized
        out.write.format("noop").mode("overwrite").save()
        t3 = time.monotonic()  # candidate join + verify tail
        release(out)
        print(
            f"rep {rep}: plan+count={t1-t0:.3f}s doc_cache={t2-t1:.3f}s "
            f"cand+verify={t3-t2:.3f}s total={t3-t0:.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
