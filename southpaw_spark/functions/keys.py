"""Primary-key encoding functions.

Spark joins on typed columns directly, so the engine never needs byte
keys for correctness. These helpers exist for two edges the reference's
encoding created (SURVEY §1.3/§1.4):

* ``key_bytes`` replicates the reference's ByteArray encoding — ints
  big-endian with leading zero bytes stripped (``util/ByteArray.java:65-75``)
  so that 1 (int) and 1L (long) encode identically, strings UTF-8,
  booleans one byte. Only needed if byte-level parity with reference
  output keys is ever required (kept "in a drawer", SURVEY §7.4).
* ``composite_key`` replicates composite-PK encoding: fields sorted by
  name, each component length-prefixed (``record/BaseRecord.java:59-75``,
  ``util/ByteArray.java:215-229``, component ≤ 255 bytes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _strip_leading_zeros(b: Column) -> Column:
    # unhexed big-endian long with leading 00 bytes removed; value 0
    # encodes as a single 00 byte
    hexed = F.lpad(F.hex(b.cast("long")), 16, "0")
    stripped = F.regexp_replace(hexed, "^(00)+", "")
    return F.unhex(F.when(F.length(stripped) == 0, F.lit("00")).otherwise(stripped))


def key_bytes(col: Column, data_type: str) -> Column:
    """Encode one key component as the reference's ByteArray bytes.
    Supported: string, int/long (shared encoding by design), boolean,
    binary. Float/double keys are rejected — same as the reference
    (``util/ByteArray.java:190-208``)."""
    dt = data_type.lower()
    if dt in ("string",):
        return F.encode(col, "UTF-8")
    if dt in ("int", "integer", "long", "bigint", "smallint", "tinyint"):
        return _strip_leading_zeros(col)
    if dt in ("boolean",):
        return F.unhex(F.when(col, F.lit("01")).otherwise(F.lit("00")))
    if dt in ("binary",):
        return col
    raise TypeError(
        f"type {data_type!r} cannot be a key (reference ByteArray.java:190-208)"
    )


def composite_key(df_or_cols, fields: dict[str, str]) -> Column:
    """Composite-PK bytes: components sorted by field name, each
    length-prefixed with one byte. Components over 255 bytes raise at
    runtime (the reference's ByteArray errors likewise — a silently
    truncated length prefix would encode a wrong key)."""
    parts = []
    for name in sorted(fields):
        b = key_bytes(F.col(name), fields[name])
        checked_len = F.when(
            F.length(b) > 255,
            F.raise_error(
                F.concat(
                    F.lit(f"composite_key component {name!r} exceeds 255 bytes: "),
                    F.length(b).cast("string"),
                )
            ).cast("int"),
        ).otherwise(F.length(b))
        prefix = F.unhex(F.lpad(F.hex(checked_len), 2, "0"))
        parts.append(F.concat(prefix, b))
    return F.concat(*parts) if len(parts) > 1 else parts[0]
