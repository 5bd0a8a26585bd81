"""Print every Spark job (id + description) submitted by one
IncrementalDeduper batch — the instrument behind the 52-vs-53 job-count
question. Usage: python tools/dbg_dedup_jobs.py [sf_dir] [mode]"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from southpaw_spark.session import get_spark
from southpaw_spark.streaming import ParquetStateStore
from southpaw_spark.streaming.dedup_stream import IncrementalDeduper


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mode = sys.argv[2] if len(sys.argv) > 2 else "min_id"
    spark = get_spark("dbg-dedup-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    if mode == "best_quality":
        from southpaw_spark.operators.text import with_quality_score

        docs = with_quality_score(docs, "text").select(
            "doc_id", "text", "quality_score"
        )
    seed = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)

    state_dir = tempfile.mkdtemp(prefix="dbg_dedup_")
    shutil.rmtree(state_dir, ignore_errors=True)
    store = ParquetStateStore(spark, state_dir, n_buckets=16)
    dd = IncrementalDeduper(spark, store, fuzzy_keep=mode)
    dd.process_batch(seed)  # seed state (not counted)

    group = f"dbg_{time.monotonic_ns()}"
    sc.setJobGroup(group, "measured batch")
    t0 = time.monotonic()
    dd.process_batch(batch).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    jids = sorted(sc.statusTracker().getJobIdsForGroup(group))
    print(f"jobs={len(jids)} wall={wall:.2f}")
    tracker = sc.statusTracker()
    jst = sc._jsc.sc().statusTracker()
    for j in jids:
        info = jst.getJobInfo(j)
        desc = ""
        if info.nonEmpty():
            sids = list(info.get().stageIds())
            if sids:
                si = jst.getStageInfo(max(sids))
                if si.nonEmpty():
                    desc = si.get().name()
        print(f"  job {j}: {desc[:110]}")
    dd.close()
    shutil.rmtree(state_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
