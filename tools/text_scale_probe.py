"""10× scale probe for the per-document text rows (t28/t31 fusion
tracking, SCALE.md round-12/13): times the named EXTRA_QUERIES rows at
sf0.1 and at a 10× key-shifted/word-rotated documents corpus (the
make_sf1 replication, documents table only — these rows read nothing
else) and prints wall ratios.

Usage: python tools/text_scale_probe.py [query ...]
(defaults: t31_gopher_repetition t28_language_id)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from southpaw_spark import suite
from southpaw_spark.session import get_spark
from tools.make_sf1 import SRC, scale_table

REPS = int(os.environ.get("PROBE_REPS", "3"))


def _bench(spark, name, sf_dir):
    samples = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        ({**suite.QUERIES, **suite.EXTRA_QUERIES})[name](
            spark, sf_dir
        ).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(time.monotonic() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def main() -> None:
    names = sys.argv[1:] or ["t31_gopher_repetition", "t28_language_id"]
    spark = get_spark("text-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    big = os.path.join(tempfile.gettempdir(), "southpaw_probe_docs10x")
    if not os.path.isdir(os.path.join(big, "documents.parquet")):
        docs = spark.read.parquet(f"{SRC}/documents.parquet")
        scale_table(docs, "documents", 10).write.mode("overwrite").parquet(
            f"{big}/documents.parquet"
        )
    for name in names:
        _bench(spark, name, SRC)  # warm the plan/codegen once
        base = _bench(spark, name, SRC)
        scaled = _bench(spark, name, big)
        print(
            f"{name}: sf0.1 {base:.2f}s -> 10x {scaled:.2f}s "
            f"(ratio {scaled / base:.2f}x, median of {REPS})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
