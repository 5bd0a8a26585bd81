"""Same-JVM ABAB for d02's doc-frequency attach join: Catalyst's choice
(broadcast of the post-aggregate dfreq relation at local sizes) vs a
hinted variant. Monkeypatches nothing — builds both plans directly from
ngram_jaccard_pairs with a toggled module flag.

Usage: python tools/ab_d02_dfreq.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from southpaw_spark.session import get_spark


def run_once(spark, sf_dir, label):
    from southpaw_spark.operators.dedup import ngram_jaccard_pairs, release

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark.sparkContext.setJobDescription(f"d02 {label}")
    t0 = time.monotonic()
    out = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.8)
    out.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    release(out)
    spark.sparkContext.setJobDescription(None)
    return round(wall, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import southpaw_spark.operators.dedup as dd

    spark = get_spark("ab-d02-dfreq")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up both arms at small SF
    for flag in (False, True):
        dd._DFREQ_HINT = flag
        run_once(spark, "/root/testdata/sf0.001", f"warm hint={flag}")
    walls = {False: [], True: []}
    order = []
    for i in range(reps):
        order += [False, True] if i % 2 == 0 else [True, False]
    for flag in order:
        dd._DFREQ_HINT = flag
        walls[flag].append(run_once(spark, sf_dir, f"hint={flag}"))
        print(f"hint={flag}: {walls[flag][-1]}s", flush=True)
    import statistics

    for flag in (False, True):
        print(
            f"hint={flag}: median={statistics.median(walls[flag])} "
            f"walls={sorted(walls[flag])}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
