"""Min-of-N timing for a list of registry queries (robust under bursty
neighbors).  Usage: python tools/family_timing.py reps name [name ...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from southpaw_spark import suite
from southpaw_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("family-timing")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for name in names:
        fn = suite.QUERIES.get(name) or suite.EXTRA_QUERIES[name]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()  # warm-up
        walls = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        walls.sort()
        print(f"{name}: min={walls[0]} med={walls[len(walls)//2]} walls={walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
