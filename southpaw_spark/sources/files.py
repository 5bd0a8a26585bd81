"""File-based changelog/snapshot sources (parquet / JSON-lines).

FIXTURES.md §1.1 changelog encoding: ``(seq, *key, *payload,
is_tombstone)``; a snapshot table is a changelog of one INSERT per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """Read a snapshot table (parquet dir/file)."""
    return spark.read.parquet(path)


def read_changelog_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    key_cols: list[str] = (),
    seq_col: str = "seq",
    tombstone_col: str = "is_tombstone",
) -> DataFrame:
    """Read a JSON-lines changelog with an explicit schema. Rows where
    every payload column (non-key, non-seq) is null are normalized to
    tombstones if the file carries no explicit tombstone column
    (FIXTURES.md: all payload columns NULL ⇔ tombstone)."""
    df = spark.read.schema(schema).json(path)
    if tombstone_col not in df.columns:
        payload = [c for c in df.columns if c != seq_col and c not in key_cols]
        all_null = None
        for c in payload:
            cond = F.col(c).isNull()
            all_null = cond if all_null is None else (all_null & cond)
        df = df.withColumn(tombstone_col, F.coalesce(all_null, F.lit(False)))
    return df
