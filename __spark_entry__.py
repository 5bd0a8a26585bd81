"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``southpaw_spark/`` (suite.py is the registry);
this file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from southpaw_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full nested DenormalizedOrder documents (orders ⟕
    customer, orders ⟕ lineitem ⟕ {part, supplier}) at sf0.001 — the
    reference engine's entire query shape as one declarative plan."""
    # events.parquet uses TIMESTAMP(NANOS); harmless here but keeps any
    # session able to read every table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return suite.q13_denormalized_order(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7.5
    beyond-reference operators)."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in suite.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — every registry row
    has one. The flagship q13 is hash-checked too: its oracle
    reassembles the identical nested JSON bottom-up (struct_pack + LIST
    ORDER BY + to_json). The LSH rows (d05, s02) pin their seeded
    hyperplanes and embed them as SQL literals so DuckDB reproduces the
    bucketing bit-for-bit; the sketch row (e03) hashes exact counts
    plus an estimate-within-3×rsd invariant boolean the oracle pins to
    TRUE."""
    return dict(suite.ORACLES)
