"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Every query is fully materialized through the noop sink (format="noop")
so serialization and all shuffles execute; nothing collects to the
driver.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from southpaw_spark import suite
from southpaw_spark.session import get_spark

HEADLINE = [
    "q13_denormalized_order",  # flagship: full nested-doc assembly + JSON
    "q14_doc_projection",      # doc build + projections
    "q04_nested_children",     # 1:N nest
    "q05_three_level_tree",    # 4-way join
    "q01_latest_by_key",       # CDC upsert window
    "q12_composite_pk",        # composite-key upsert at lineitem scale
    "d01_dedup_exact",
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "s01_cosine_topk",
    "t02_quality_score",
    "e01_windowed_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("southpaw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = suite.QUERIES[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "southpaw_spark headline suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
