"""Skewed-domain probe for t23 `perplexity_buckets` (SCALE.md): a
corpus that is 90% ONE domain serializes the window path's rank on a
single task; the round-12 `hot_domain_rows` escape routes hot domains
through the a09/a12 range-bucket rank. The probe builds such a corpus
synthetically, runs BOTH paths, checks bit-identical output, and
prints walls — the number that matters is the split path staying flat
as the hot domain grows while the window path's straggler grows with
it.

Usage: python tools/ppl_skew_probe.py [n_docs] [hot_frac]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark.operators.text import perplexity_buckets
from southpaw_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark("ppl-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    hot_mod = int(1 / (1 - hot_frac))
    words = [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa",
    ]
    warr = F.array(*[F.lit(w) for w in words])
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        warr,
                        (
                            (
                                F.xxhash64(F.col("id") * 17 + j)
                                % len(words) + len(words)
                            ) % len(words) + 1
                        ).cast("int"),
                    )
                    for j in range(12)
                ],
            ).alias("text"),
            F.when(
                F.col("id") % hot_mod != 0, F.lit("hot.example")
            ).otherwise(
                F.concat(F.lit("cold"), (F.col("id") % 512).cast("string"))
            ).alias("dom"),
        )
        .cache()
    )
    docs.count()
    for label, thr in (("window", None), ("range-bucket", 50_000)):
        t0 = time.time()
        out = perplexity_buckets(
            docs, "text", "doc_id", "dom", hot_domain_rows=thr
        )
        cnt = out.groupBy("ppl_bucket").count().collect()
        wall = time.time() - t0
        print(
            f"{label:>13}: wall={wall:.1f}s "
            f"buckets={sorted((r[0], r[1]) for r in cnt)}",
            flush=True,
        )
    # bit-identity on the full assignment
    a = perplexity_buckets(docs, "text", "doc_id", "dom",
                           hot_domain_rows=None)
    b = perplexity_buckets(docs, "text", "doc_id", "dom",
                           hot_domain_rows=50_000)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"exceptAll diff rows: {diff} (must be 0)")


if __name__ == "__main__":
    main()
