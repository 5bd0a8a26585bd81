"""Controlled A/B for the dedup_stream_batch bench row (BASELINE §29
protocol): run ONE tree's `bench.dedup_stream_batch` in this process —
warm-up at sf0.001, seed once at the target SF, then N measured reps on
hardlink-copied seeded state — and print per-rep wall AND Spark job
count (the job count is the variable fixed-cost creep hides in: each
rep runs the identical data, so extra jobs = extra orchestration).

Usage: python tools/dedup_stream_ab.py TREE [reps] [sf_dir] [mode]
Run it alternately against two trees (same box, fresh JVM each) and
compare the medians; job counts localize WHERE a regression lives.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    mode = sys.argv[4] if len(sys.argv) > 4 else "min_id"
    os.chdir(tree)
    sys.path.insert(0, tree)
    import bench  # noqa: E402  (the tree under test)
    from southpaw_spark.session import get_spark  # noqa: E402

    spark = get_spark("dedup-ab")
    spark.sparkContext.setLogLevel("ERROR")
    kw = {} if mode == "min_id" else {"fuzzy_keep": mode}
    sig = bench.dedup_stream_batch.__code__.co_varnames
    if "fuzzy_keep" not in sig:
        kw = {}
    # warm-up (JIT + codegen) then one discarded seeding call at sf
    bench.dedup_stream_batch(spark, "/root/testdata/sf0.001", **kw)
    bench.dedup_stream_batch(spark, sf_dir, **kw)
    sc = spark.sparkContext
    rows = []
    for i in range(reps):
        group = f"ab_rep_{i}_{time.monotonic_ns()}"
        sc.setJobGroup(group, "dedup_stream_batch rep")
        wall = bench.dedup_stream_batch(spark, sf_dir, **kw)
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup("idle", "")
        rows.append({"wall": wall, "jobs": jobs})
        print(f"rep {i}: wall={wall:.3f}s jobs={jobs}", flush=True)
    walls = sorted(r["wall"] for r in rows)
    print(json.dumps({
        "tree": tree, "mode": mode, "sf_dir": sf_dir,
        "median_wall": statistics.median(walls),
        "min_wall": walls[0], "max_wall": walls[-1],
        "jobs": [r["jobs"] for r in rows],
    }))


if __name__ == "__main__":
    main()
