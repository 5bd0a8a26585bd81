"""Operator library: CDC state maintenance, nested denormalization, and
beyond-reference data-pipeline operators (dedup, similarity, text)."""

from southpaw_spark.operators.cdc import (
    FilterMode,
    FilterRule,
    apply_filter_rules,
    current_state,
    latest_by_key,
)
from southpaw_spark.operators.denormalize import (
    affected_root_keys,
    denormalize,
    denormalize_to_json,
)

__all__ = [
    "FilterMode",
    "FilterRule",
    "affected_root_keys",
    "apply_filter_rules",
    "current_state",
    "denormalize",
    "denormalize_to_json",
    "latest_by_key",
]
