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


#: struct column exposing the previous state row to old-aware predicates
OLD_FIELD = "old"


@dataclass
class OldAwareFilterRule:
    """Filter rule whose predicate may reference the *previous* state row
    — the reference's ``customFilter(entity, rec, oldRec)`` surface
    (``filter/BaseFilter.java:106-160``). The old row is exposed as a
    struct column ``old`` (``F.col("old.some_field")``), null when the
    key has no prior state. Applied after intra-batch dedup, against the
    pre-batch committed state."""

    predicate: Column
    mode: FilterMode


def is_unchanged(
    payload_cols: Sequence[str],
    ignored_fields: Sequence[str] = (),
    old_col: str = OLD_FIELD,
) -> Column:
    """True when the incoming record equals its previous state row on
    every payload column not listed in ``ignored_fields`` — the
    reference's ``BaseFilter.isEqual(rec, oldRec, ignoredFields)``
    helper (``filter/BaseFilter.java:118-139``, behavior pinned by
    ``filter/TestFilter.java:36-55``), the canonical skip-no-op-updates
    CDC optimization. Null-safe per field; false when there is no old
    row (a brand-new key is always a change)."""
    cond: Column = F.col(old_col).isNotNull()
    for c in payload_cols:
        if c in ignored_fields:
            continue
        cond = cond & F.col(c).eqNullSafe(F.col(old_col)[c])
    return cond


def unchanged_skip_rule(
    payload_cols: Sequence[str],
    ignored_fields: Sequence[str] = (),
    tombstone_col: str = "is_tombstone",
) -> OldAwareFilterRule:
    """SKIP records that would not change state: non-tombstone events
    whose payload equals the current state row. Tombstones always pass
    (deleting an existing row is a change)."""
    return OldAwareFilterRule(
        predicate=(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
            & is_unchanged(payload_cols, ignored_fields)
        ),
        mode=FilterMode.SKIP,
    )


def apply_old_aware_rules(
    delta: DataFrame,
    old_rows: DataFrame | None,
    rules: Sequence[OldAwareFilterRule],
    key_cols: Sequence[str],
    tombstone_col: str = "is_tombstone",
) -> DataFrame:
    """Join the (deduped) delta against its pre-batch state rows and
    apply old-aware SKIP/DELETE rules.

    ``old_rows``: the current state rows for the delta's keys (any
    superset is fine — the join prunes), or None when the entity has no
    state yet (every ``old`` is null). One broadcast-friendly equi-join
    on the PK; predicates stay JVM-side Column expressions."""
    if not rules:
        return delta
    if OLD_FIELD in delta.columns:
        # a payload column literally named like OLD_FIELD would collide
        # with the pre-image struct (duplicate/overwritten column);
        # fail loudly rather than silently corrupting the entity
        raise ValueError(
            f"entity payload column {OLD_FIELD!r} collides with the "
            "old-row struct used by old-aware rules; rename the column"
        )
    if old_rows is None:
        # no prior state: a typed null struct (shaped like the delta) so
        # ``old.field`` references still resolve
        from pyspark.sql import types as T

        shape = T.StructType([f for f in delta.schema.fields])
        joined = delta.withColumn(OLD_FIELD, F.lit(None).cast(shape))
    else:
        payload = [c for c in old_rows.columns]
        old_struct = old_rows.select(
            *key_cols,
            F.struct(*[F.col(c) for c in payload]).alias(OLD_FIELD),
        )
        joined = delta.join(F.broadcast(old_struct), on=list(key_cols), how="left")
    out = joined
    delete_pred: Column | None = None
    for rule in rules:
        if rule.mode is FilterMode.SKIP:
            out = out.where(~F.coalesce(rule.predicate, F.lit(False)))
        elif rule.mode is FilterMode.DELETE:
            p = F.coalesce(rule.predicate, F.lit(False))
            delete_pred = p if delete_pred is None else (delete_pred | p)
    if delete_pred is not None:
        out = out.withColumn(tombstone_col, F.col(tombstone_col) | delete_pred)
    return out.drop(OLD_FIELD)


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
