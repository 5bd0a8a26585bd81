"""Inspect the optimized physical plan of a DataFrame."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def num_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (BroadcastExchange excluded — those
    are the cheap kind we *want* for small sides)."""
    plan = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def join_strategies(df: DataFrame) -> dict[str, int]:
    plan = explain_str(df)
    return {
        kind: len(re.findall(rf"\b{kind}\b", plan))
        for kind in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        )
        if re.search(rf"\b{kind}\b", plan)
    }


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan — evidence
    that predicates reached the reader."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_columns(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — evidence of column pruning."""
    plan = explain_str(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
