"""Interleaved same-JVM A/B: q14 unpruned (r14 shape) vs pruned states.

Usage: python tools/q14_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark import suite
from southpaw_spark.operators.denormalize import denormalize
from southpaw_spark.relations import load_relations
from southpaw_spark.session import get_spark


def q14_old(spark, sf_dir):
    rel = load_relations(suite.ORDER_TREE_2LEVEL_JSON)[0]
    states = {
        e: suite._read(spark, sf_dir, e)
        for e in ("orders", "customer", "lineitem")
    }
    docs = denormalize(states, rel, suite.ORDER_TREE_KEYS)
    li = F.col("doc.Children.lineitem")
    return docs.select(
        "o_orderkey",
        F.size(li).cast("long").alias("n_lineitems"),
        F.element_at(F.col("doc.Children.customer"), 1)["Record"][
            "c_name"
        ].alias("customer_name"),
        F.aggregate(
            li, F.lit(0.0), lambda acc, x: acc + x["Record"]["l_quantity"]
        ).alias("total_qty"),
        F.array_join(
            F.sort_array(
                F.transform(li, lambda x: x["Record"]["l_linenumber"])
            ).cast("array<string>"),
            ",",
        ).alias("line_pks"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("q14-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    walls = {"old": [], "new": []}
    arms = {"old": q14_old, "new": suite.q14_doc_projection}
    # warm both once
    for name, fn in arms.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    order = ["old", "new", "new", "old"] * ((reps + 1) // 2)
    for name in order[: reps * 2]:
        spark.sparkContext.setJobDescription(f"q14-ab {name}")
        t0 = time.time()
        arms[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        walls[name].append(round(time.time() - t0, 3))
    for name, w in walls.items():
        w2 = sorted(w)
        print(
            f"{name}: min={w2[0]} median={w2[len(w2) // 2]} walls={w}"
        )


if __name__ == "__main__":
    main()
