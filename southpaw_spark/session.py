"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the same settings are what we would
ship on a real cluster: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), reasonable shuffle partitioning, and Arrow enabled
for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "southpaw-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]`` (32 in the test harness).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Some testdata generations carry events.ts as TIMESTAMP(NANOS);
        # surface those as longs. Native timestamp[us] files are unaffected
        # (suite._events_ts_us adapts to whichever dtype appears).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin UTC so epoch arithmetic matches the DuckDB oracles exactly.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Nested-doc assembly benefits from compact shuffle records.
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        # keep stdout machine-parseable (bench.py emits one JSON line)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
