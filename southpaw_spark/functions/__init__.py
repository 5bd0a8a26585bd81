"""Column-function library: reference-compatible key encoding and
document accessors."""

from southpaw_spark.functions.keys import composite_key, key_bytes
from southpaw_spark.functions.docs import child_docs, record_field

__all__ = ["child_docs", "composite_key", "key_bytes", "record_field"]
