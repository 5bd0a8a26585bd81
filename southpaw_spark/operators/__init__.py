"""Operator library: CDC state maintenance, nested denormalization, and
beyond-reference data-pipeline operators (dedup, similarity, text)."""

from southpaw_spark.operators.cdc import (
    FilterMode,
    FilterRule,
    OldAwareFilterRule,
    apply_filter_rules,
    apply_old_aware_rules,
    current_state,
    is_unchanged,
    latest_by_key,
    unchanged_skip_rule,
)
from southpaw_spark.operators.denormalize import (
    affected_root_keys,
    denormalize,
    denormalize_to_json,
)
from southpaw_spark.operators.ann_index import (
    attach_index_stream,
    build_ann_index,
    query_ann_index,
    remove_from_index,
    vacuum_ann_index,
    vacuum_pq_index,
)
from southpaw_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    with_bpe_token_count,
)
from southpaw_spark.operators.temporal import (
    asof_join,
    gapfill,
    ohlc,
    range_join,
)

__all__ = [
    "FilterMode",
    "FilterRule",
    "OldAwareFilterRule",
    "affected_root_keys",
    "apply_filter_rules",
    "apply_old_aware_rules",
    "asof_join",
    "bpe_encode",
    "bpe_train",
    "attach_index_stream",
    "build_ann_index",
    "current_state",
    "denormalize",
    "denormalize_to_json",
    "gapfill",
    "is_unchanged",
    "latest_by_key",
    "ohlc",
    "query_ann_index",
    "range_join",
    "remove_from_index",
    "unchanged_skip_rule",
    "vacuum_ann_index",
    "vacuum_pq_index",
    "with_bpe_token_count",
]
