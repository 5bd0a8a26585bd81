"""Phase-level profile of one IncrementalDeduper batch (the fixed cost
behind the dedup_stream_batch / dedup_stream_bq_batch bench rows).

Monkeypatches timers around the store/operator seams the cascade calls,
then runs bench.dedup_stream_batch's exact protocol (seed once, measure
on hardlink-copied state) and prints a per-phase breakdown plus the
Spark job count per batch.

Usage: python tools/profile_dedup_stream.py [sf_dir] [mode] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def timed(obj, name, label=None):
    orig = getattr(obj, name)
    key = label or name

    def wrap(*a, **kw):
        t0 = time.monotonic()
        try:
            return orig(*a, **kw)
        finally:
            PHASES[key] = PHASES.get(key, 0.0) + (time.monotonic() - t0)
            COUNTS[key] = COUNTS.get(key, 0) + 1

    setattr(obj, name, wrap)
    return orig


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mode = sys.argv[2] if len(sys.argv) > 2 else "min_id"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import importlib

    import bench
    from southpaw_spark.session import get_spark
    from southpaw_spark.streaming.state import ParquetStateStore as PSS

    ds = importlib.import_module("southpaw_spark.streaming.dedup_stream")

    timed(PSS, "merge")
    timed(PSS, "commit")
    timed(PSS, "vacuum")
    timed(PSS, "read")
    timed(ds.IncrementalDeduper, "_bucket_ids")
    timed(ds.IncrementalDeduper, "_bump_from")
    # operator seams the cascade plans through (plan-construction time)
    for fn_name in ("minhash_signatures", "band_buckets",
                    "connected_components"):
        orig = getattr(ds, fn_name)

        def mk(orig=orig, fn_name=fn_name):
            def wrap(*a, **kw):
                t0 = time.monotonic()
                try:
                    return orig(*a, **kw)
                finally:
                    PHASES[fn_name] = PHASES.get(fn_name, 0.0) + (
                        time.monotonic() - t0
                    )
                    COUNTS[fn_name] = COUNTS.get(fn_name, 0) + 1
            return wrap

        setattr(ds, fn_name, mk())

    spark = get_spark("profile-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    kw = {} if mode == "min_id" else {"fuzzy_keep": mode}
    # warm-up (JIT + codegen) then seed at the target SF (discarded rep)
    bench.dedup_stream_batch(spark, "/root/testdata/sf0.001", **kw)
    bench.dedup_stream_batch(spark, sf_dir, **kw)

    for rep in range(reps):
        PHASES.clear()
        COUNTS.clear()
        t0 = time.monotonic()
        wall = bench.dedup_stream_batch(spark, sf_dir, **kw)
        t1 = time.monotonic()
        jobs = bench._DEDUP_JOBS
        print(
            f"rep {rep}: wall={wall}s (incl. setup {t1 - t0:.3f}s) "
            f"jobs={jobs}",
            flush=True,
        )
        print(
            "  phases: "
            + " ".join(
                f"{k}={v:.3f}({COUNTS.get(k, 0)}x)"
                for k, v in sorted(PHASES.items(), key=lambda kv: -kv[1])
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
