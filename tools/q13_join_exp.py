"""q13 join-strategy experiment: the grouped-children broadcasts are the
suspect (BroadcastExchange of 150k nested docs is driver-side and
single-threaded).  Try autoBroadcastJoinThreshold ladders; report
min-of-N walls (min is the robust statistic under bursty neighbors).

Usage: python tools/q13_join_exp.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from southpaw_spark.session import get_spark
from southpaw_spark.suite import q13_denormalized_order


def run(spark, sf_dir, reps):
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        q13_denormalized_order(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        walls.append(round(time.monotonic() - t0, 3))
    return sorted(walls)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("q13-join-exp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    q13_denormalized_order(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    ladders = [
        ("64m (current)", {"spark.sql.autoBroadcastJoinThreshold": "64m"}),
        ("10m", {"spark.sql.autoBroadcastJoinThreshold": "10m"}),
        ("4m", {"spark.sql.autoBroadcastJoinThreshold": "4m"}),
        ("-1 (all SMJ)", {"spark.sql.autoBroadcastJoinThreshold": "-1"}),
        (
            "4m + SHJ pref",
            {
                "spark.sql.autoBroadcastJoinThreshold": "4m",
                "spark.sql.join.preferSortMergeJoin": "false",
            },
        ),
    ]
    for label, conf in ladders:
        for k, v in conf.items():
            spark.conf.set(k, v)
        walls = run(spark, sf_dir, reps)
        print(f"{label}: min={walls[0]} walls={walls}", flush=True)
        # reset
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    spark.stop()


if __name__ == "__main__":
    main()
