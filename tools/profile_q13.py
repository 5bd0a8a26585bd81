"""Stage breakdown of the flagship q13 (and q14): where do its seconds
go — scan+joins, doc assembly, or JSON serialization?

Usage:  python tools/profile_q13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from southpaw_spark.session import get_spark
from southpaw_spark.suite import build_order_docs, q13_denormalized_order, q14_doc_projection


def timed(label, df, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    walls.sort()
    print(f"{label}: median={walls[len(walls)//2]:.3f}s  walls={[round(w,3) for w in walls]}", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-q13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # warm-up
    q13_denormalized_order(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    docs = build_order_docs(spark, sf_dir)
    timed("q13 full (docs + to_json)", q13_denormalized_order(spark, sf_dir))
    timed("q13 docs only (no to_json)", docs)
    timed("q13 root pk only", docs.select("o_orderkey"))
    # raw scans for the floor
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    timed("lineitem scan", li)
    timed(
        "lineitem groupBy collect_list",
        li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_list(F.struct("*"))).alias("a")
        ),
    )
    timed("q14 full", q14_doc_projection(spark, sf_dir))
    spark.stop()


if __name__ == "__main__":
    main()
