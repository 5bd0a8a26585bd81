"""Synthesize a ~sf1 corpus (10x sf0.1) by key-shifted replication —
the scale-up harness behind BASELINE.md's 10x experiments.

Deterministic, pure-Spark, FK-consistent:

* fact/dim keys shift by ``copy * STRIDE`` so every copy is a disjoint,
  join-consistent universe (orders still find their customers/lineitems);
* ``region``/``nation`` stay singletons (their keys are bounded
  reference data, and every copy's ``c_nationkey``/``s_nationkey``
  remains valid against them);
* document text is word-ROTATED per copy. NOTE: a circular shift
  preserves the contiguous-n-gram shingle multiset (only the wrap-point
  shingles change), so rotated copies ARE mutual near-duplicates — the
  corpus is deliberately a fuzzy-dedup STRESS shape: every original
  doc becomes a 10-member near-dup family, and candidate work for the
  Jaccard/MinHash family grows with family-size², not corpus size
  (measured in BASELINE.md §7; ``max_doc_freq`` is the structural
  bound). The exact-dedup and text-metric families see a clean 10x.
* embeddings are circular-shifted per copy — cosine IS
  position-sensitive, so shifted vectors decorrelate and the ANN
  corpus is a clean 10x.

Usage: python tools/make_sf1.py [out_dir] [n_copies]
(defaults: .scale/sf1 under the repo root, 10 copies)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000

#: table → columns shifted by copy*STRIDE (PKs and the FKs that point at
#: replicated tables; nation/region FKs intentionally NOT shifted)
SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLETONS = ["region", "nation"]


def scale_table(df, table: str, n_copies: int):
    copies = F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1))).alias("__c")
    out = df.select("*", copies)
    for col in SHIFTS.get(table, ()):  # FK-consistent key shift
        out = out.withColumn(
            col, F.col(col) + F.col("__c").cast("long") * F.lit(STRIDE)
        )
    if table == "documents":
        # rotate words so copies are not near-dups of each other
        w = F.split(F.col("text"), " ")
        r = (F.col("__c") * 7 + 1) % F.greatest(F.size(w), F.lit(1))
        rotated = F.concat(
            F.slice(w, r + 1, F.size(w)), F.slice(w, 1, r)
        )
        out = out.withColumn(
            "text",
            F.when(F.col("__c") == 0, F.col("text")).otherwise(
                F.array_join(rotated, " ")
            ),
        )
    if table == "embeddings":
        e = F.col("embedding")
        r2 = F.col("__c") % F.greatest(F.size(e), F.lit(1))
        out = out.withColumn(
            "embedding", F.concat(F.slice(e, r2 + 1, F.size(e)), F.slice(e, 1, r2))
        )
    return out.drop("__c")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    for table in list(SHIFTS) + SINGLETONS:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        scaled = df if table in SINGLETONS else scale_table(df, table, n_copies)
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: {spark.read.parquet(f'{out_dir}/{table}.parquet').count()}")
    spark.stop()


if __name__ == "__main__":
    main()
