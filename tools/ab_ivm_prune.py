"""Interleaved A/B of the IVM targeted-rebuild pruning strategies in ONE
JVM: A = legacy scope-chaining (force _prune_states_for_tree -> None),
B = pre-pruned cached states. ABAB ordering cancels box drift.

Usage: python tools/ab_ivm_prune.py [sf_dir] [pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from southpaw_spark.relations import load_relations
from southpaw_spark.session import get_spark
from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore
from southpaw_spark.suite import ORDER_TREE_JSON, ORDER_TREE_KEYS


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import shutil
    import tempfile

    spark = get_spark("ab-ivm-prune")
    spark.sparkContext.setLogLevel("ERROR")

    state_dir = tempfile.mkdtemp(prefix="ab_ivm_state_")
    shutil.rmtree(state_dir, ignore_errors=True)
    store = ParquetStateStore(spark, state_dir, n_buckets=16)
    ivm = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations(ORDER_TREE_JSON),
        keys=ORDER_TREE_KEYS,
        store=store,
    )
    snaps = {
        e: spark.read.parquet(f"{sf_dir}/{e}.parquet") for e in ORDER_TREE_KEYS
    }
    ivm.bootstrap(snaps)
    delta = (
        snaps["customer"]
        .where(F.col("c_custkey") % 10 == 0)
        .withColumn("c_name", F.concat(F.col("c_name"), F.lit("-v2")))
        .withColumn("seq", F.lit(1).cast("long"))
        .withColumn("is_tombstone", F.lit(False))
    )

    real_prune = IncrementalDenormalizer._prune_states_for_tree

    def batch() -> float:
        t0 = time.monotonic()
        outs = ivm.process_batch({"customer": delta})
        for df in outs.values():
            df.write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    batch()  # warm-up (B path)
    walls = {"A_scope_chain": [], "B_pre_pruned": []}
    for _ in range(pairs):
        IncrementalDenormalizer._prune_states_for_tree = (
            lambda self, *a, **kw: None
        )
        walls["A_scope_chain"].append(batch())
        IncrementalDenormalizer._prune_states_for_tree = real_prune
        walls["B_pre_pruned"].append(batch())
    for k, v in walls.items():
        v = sorted(v)
        print(f"{k}: min={v[0]} med={v[len(v)//2]} walls={v}", flush=True)
    shutil.rmtree(state_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
