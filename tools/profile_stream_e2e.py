"""Where does an ivm_stream_e2e trigger's wall go?  Runs the same
topology as bench.ivm_stream_e2e once (adaptive, so one trigger) and
prints the Spark-job timeline: description, duration, and gaps — the
fixed per-trigger cost decomposed.

Usage: python tools/profile_stream_e2e.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench
    from southpaw_spark.session import get_spark

    spark = get_spark("profile-e2e")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up at the small SF (plan/codegen/JIT)
    bench.ivm_stream_e2e(spark, "/root/testdata/sf0.001")

    sc = spark.sparkContext
    t0 = time.monotonic()
    wall = bench.ivm_stream_e2e(spark, sf_dir, adaptive=True)
    print(f"adaptive trigger wall: {wall}s (aux {bench._STREAM_E2E_AUX})")

    tracker = sc.statusTracker()
    ids = sorted(tracker.getJobIdsForGroup(None) or [])
    # Fall back: enumerate all jobs via the REST-less API
    infos = []
    for jid in range(max(0, (ids[-1] if ids else 2000) - 400), (ids[-1] + 1 if ids else 2000)):
        ji = tracker.getJobInfo(jid)
        if ji is not None:
            infos.append((jid, ji))
    print(f"jobs known to tracker: {len(infos)}")
    spark.stop()


if __name__ == "__main__":
    main()
