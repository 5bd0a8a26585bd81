"""Phase-level profile of one IVM delta batch (the fixed cost that
dominates ivm_delta_batch / ivm_stream_e2e triggers).

Monkeypatches timers around the store/merge/denormalize seams so each
batch prints a phase breakdown plus the Spark job count.

Usage:  python tools/profile_ivm.py [sf_dir]
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
from southpaw_spark.streaming.state import ParquetStateStore as PSS
from southpaw_spark.suite import ORDER_TREE_JSON, ORDER_TREE_KEYS

PHASES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def timed(cls, name):
    orig = getattr(cls, name)

    def wrap(*a, **kw):
        t0 = time.monotonic()
        try:
            return orig(*a, **kw)
        finally:
            PHASES[name] = PHASES.get(name, 0.0) + (time.monotonic() - t0)
            COUNTS[name] = COUNTS.get(name, 0) + 1

    setattr(cls, name, wrap)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import shutil
    import tempfile

    import importlib

    dn = importlib.import_module("southpaw_spark.operators.denormalize")
    ivm_mod = importlib.import_module("southpaw_spark.streaming.ivm")

    timed(PSS, "merge")
    timed(PSS, "commit")
    timed(PSS, "vacuum")
    timed(PSS, "read_bucketed")
    timed(PSS, "read")
    timed(PSS, "exists")

    orig_dn = dn.denormalize

    def dn_wrap(*a, **kw):
        t0 = time.monotonic()
        try:
            return orig_dn(*a, **kw)
        finally:
            PHASES["denormalize_plan"] = PHASES.get("denormalize_plan", 0.0) + (
                time.monotonic() - t0
            )

    dn.denormalize = dn_wrap
    ivm_mod.denormalize = dn_wrap

    orig_ark = dn.affected_root_keys

    def ark_wrap(*a, **kw):
        t0 = time.monotonic()
        try:
            return orig_ark(*a, **kw)
        finally:
            PHASES["affected_root_keys_plan"] = PHASES.get(
                "affected_root_keys_plan", 0.0
            ) + (time.monotonic() - t0)

    dn.affected_root_keys = ark_wrap
    ivm_mod.affected_root_keys = ark_wrap

    spark = get_spark("profile-ivm")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    state_dir = tempfile.mkdtemp(prefix="profile_ivm_state_")
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

    n_reps = int(os.environ.get("PROFILE_REPS", "4"))
    for rep in range(n_reps):
        PHASES.clear()
        COUNTS.clear()
        group = f"profile_{rep}"
        sc.setJobGroup(group, f"ivm batch rep {rep}")
        t0 = time.monotonic()
        outs = ivm.process_batch({"customer": delta})
        t_mid = time.monotonic()
        for df in outs.values():
            df.write.format("noop").mode("overwrite").save()
        t1 = time.monotonic()
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        print(
            f"rep {rep}: total={t1 - t0:.3f}s process_batch={t_mid - t0:.3f}s "
            f"materialize={t1 - t_mid:.3f}s jobs={n_jobs}",
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
    shutil.rmtree(state_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
