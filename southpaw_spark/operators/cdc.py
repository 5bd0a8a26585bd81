"""CDC changelog operators: upsert-by-PK semantics and the filter surface.

The reference materializes Kafka compaction semantics in RocksDB — latest
record per key wins, null value deletes (reference
``topic/KafkaTopic.java:193-205``, SURVEY §2 O6). In Spark the same
semantics are a window dedup over a changelog DataFrame:

    row_number() OVER (PARTITION BY pk ORDER BY seq DESC) == 1

which Catalyst executes as a single hash-partitioned shuffle on the key —
the scalable equivalent of point upserts. At 100 TB the changelog is
key-partitioned on write, so the window runs without a second shuffle.

The filter surface (reference ``filter/BaseFilter.java:88-160``, SURVEY §2
O5) classifies each incoming record UPDATE / SKIP / DELETE:

* UPDATE — keep the record (default);
* SKIP   — the record never touches state (drop it *before* dedup, so an
  older record remains current);
* DELETE — treat the record as a tombstone for its key.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class FilterMode(str, Enum):
    UPDATE = "update"
    SKIP = "skip"
    DELETE = "delete"


@dataclass
class FilterRule:
    """Declarative per-entity filter: rows matching ``predicate`` are
    classified ``mode``. Predicates are Column expressions so they run
    JVM-side inside codegen — no Python in the hot path."""

    predicate: Column
    mode: FilterMode


def apply_filter_rules(
    changelog: DataFrame,
    rules: Sequence[FilterRule],
    tombstone_col: str = "is_tombstone",
) -> DataFrame:
    """Apply SKIP/DELETE rules to a changelog before state maintenance.

    SKIP rows are removed entirely (they must not overwrite prior state);
    DELETE rows are rewritten into tombstones (payload irrelevant, the
    ``tombstone_col`` flag is forced true). Null-value events are always
    tombstones regardless of rules (reference BaseFilter: null/empty value
    is always DELETE).
    """
    out = changelog
    delete_pred: Column | None = None
    for rule in rules:
        if rule.mode is FilterMode.SKIP:
            out = out.where(~F.coalesce(rule.predicate, F.lit(False)))
        elif rule.mode is FilterMode.DELETE:
            p = F.coalesce(rule.predicate, F.lit(False))
            delete_pred = p if delete_pred is None else (delete_pred | p)
        else:  # UPDATE is the default classification; nothing to do
            continue
    if delete_pred is not None:
        out = out.withColumn(
            tombstone_col, F.col(tombstone_col) | delete_pred
        )
    return out


def latest_by_key(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
) -> DataFrame:
    """Latest event per key (Kafka-compaction semantics). Keeps
    tombstones — callers decide whether to drop them (``current_state``)
    or inspect them (root-tombstone emission)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def current_state(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    tombstone_col: str = "is_tombstone",
    rules: Sequence[FilterRule] = (),
) -> DataFrame:
    """Materialize the current-row table for an entity changelog:
    filter rules → latest-by-key → drop tombstones → drop bookkeeping
    columns. This is the Spark equivalent of the reference's per-entity
    RocksDB ``<entity>-data`` keyspace (SURVEY §1.1)."""
    df = apply_filter_rules(changelog, rules, tombstone_col)
    df = latest_by_key(df, key_cols, seq_col)
    df = df.where(~F.coalesce(F.col(tombstone_col), F.lit(False)))
    return df.drop(seq_col, tombstone_col)


def tombstoned_keys(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    tombstone_col: str = "is_tombstone",
    rules: Sequence[FilterRule] = (),
) -> DataFrame:
    """Keys whose *latest* event is a tombstone — these must emit null
    documents downstream (reference ``Southpaw.java:335,379-380``)."""
    df = apply_filter_rules(changelog, rules, tombstone_col)
    df = latest_by_key(df, key_cols, seq_col)
    return df.where(F.coalesce(F.col(tombstone_col), F.lit(False))).select(
        *key_cols
    )


def as_changelog(
    snapshot: DataFrame, seq: int = 0, tombstone_col: str = "is_tombstone"
) -> DataFrame:
    """Lift a static snapshot table into changelog shape (one INSERT per
    row) so batch tables and CDC streams share one code path."""
    return snapshot.withColumn("seq", F.lit(seq).cast("long")).withColumn(
        tombstone_col, F.lit(False)
    )
