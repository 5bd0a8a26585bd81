"""Measure the d19 claim: bloom-prefilter decontamination vs the exact
broadcast path — wall time AND broadcast payload size (distinct gram
strings vs bloom bitmap bytes) at two scale factors, with identical
output row counts as the correctness check.
Run: python tools/bloom_probe.py [sf_dir ...]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark.operators.dedup import span_contamination
from southpaw_spark.session import get_spark


def probe(spark, sf_dir: str) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    k = 8
    bw = F.split(F.col("text"), " ")
    grams = (
        bench.where(F.size(bw) >= k)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(bw) - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(bw, i, k)),
                )
            ).alias("g")
        )
        .distinct()
    )
    stats = grams.agg(
        F.count("*").alias("n"), F.sum(F.length("g")).alias("bytes")
    ).first()
    import math

    m_bits = int(math.ceil(-stats["n"] * math.log(0.01) / math.log(2) ** 2))
    print(
        f"{sf_dir}: |grams|={stats['n']:,} exact-broadcast≈"
        f"{stats['bytes'] / 1e6:.1f} MB  bloom-bitmap="
        f"{m_bits / 8 / 1e6:.2f} MB  ({stats['bytes'] * 8 / m_bits:.0f}x)"
    )
    for mode, kw in (
        ("exact", {}),
        ("bloom", {"prefilter": "bloom"}),
    ):
        best = None
        for _ in range(3):
            t0 = time.time()
            n = span_contamination(
                corpus, bench, "text", "doc_id", k=k, **kw
            ).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"  {mode:5s}: {best:6.2f} s  rows={n:,}")


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        probe(spark, sf_dir)


if __name__ == "__main__":
    main()
