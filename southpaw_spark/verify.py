"""State verification job — the Spark analog of the reference's
``--verify-state`` entry point (``Southpaw.java:525-533``,
``index/Index.java:366-414``).

The reference full-scans forward/reverse index keyspaces asserting
symmetry. Here there are no materialized indexes to check (they are
derived per batch), so the meaningful invariant is: **every entity state
table equals the current state recomputed from its changelog** — a
symmetric anti-join in both directions, distributed, no driver loops.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from southpaw_spark.operators.cdc import FilterRule, current_state
from southpaw_spark.streaming.state import ParquetStateStore


def verify_entity_state(
    state_rows: DataFrame,
    changelog: DataFrame,
    key_cols: Sequence[str],
    rules: Sequence[FilterRule] = (),
) -> DataFrame:
    """Discrepancies between a maintained state table and the state
    recomputed from the full changelog. Returns a DataFrame of rows
    tagged ``only_in`` ∈ {'state', 'recomputed'}; empty ⇔ consistent."""
    expected = current_state(changelog, key_cols, rules=rules)
    cols = expected.columns
    state_rows = state_rows.select(*cols)
    missing = expected.exceptAll(state_rows).withColumn(
        "only_in", F.lit("recomputed")
    )
    extra = state_rows.exceptAll(expected).withColumn("only_in", F.lit("state"))
    return missing.unionByName(extra)


def verify_store(
    store: ParquetStateStore,
    changelogs: Mapping[str, DataFrame],
    keys: Mapping[str, Sequence[str]],
    filter_rules: Mapping[str, Sequence[FilterRule]] | None = None,
) -> dict[str, DataFrame]:
    """Run verify_entity_state for every entity; {entity: discrepancies}."""
    filter_rules = filter_rules or {}
    return {
        entity: verify_entity_state(
            store.read(entity),
            changelog,
            keys[entity],
            filter_rules.get(entity, ()),
        )
        for entity, changelog in changelogs.items()
    }
