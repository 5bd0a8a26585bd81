"""Physical-plan introspection utilities.

The engine's performance contract is enforced by looking at what
Catalyst actually produced: exchange counts, join strategies, parquet
pushdown. Tests use these helpers to pin the plans we want (SURVEY §4's
"let Catalyst optimize" stance needs evidence, not hope).
"""

from southpaw_spark.plans.introspect import (
    explain_str,
    join_strategies,
    num_exchanges,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "explain_str",
    "join_strategies",
    "num_exchanges",
    "pushed_filters",
    "scan_columns",
]
