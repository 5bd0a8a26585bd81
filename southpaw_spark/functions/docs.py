"""Accessors over assembled denormalized documents (the ``doc`` struct
column produced by ``operators.denormalize``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from southpaw_spark.operators.denormalize import CHILDREN_FIELD, RECORD_FIELD


def record_field(doc: Column, field: str) -> Column:
    """``doc.Record.<field>`` (reference O15 key extraction)."""
    return doc[RECORD_FIELD][field]


def child_docs(doc: Column, entity: str) -> Column:
    """``doc.Children.<entity>`` — the ordered child-document array
    (null when the parent key was null = entity key absent)."""
    return doc[CHILDREN_FIELD][entity]
