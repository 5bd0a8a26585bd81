"""Declared correctness queries (SURVEY §2.4) + beyond-reference operators.

Each query exists twice: a Spark implementation (built on the package's
operators) and an ANSI-SQL oracle DuckDB runs over the same parquet
tables. The driver hash-compares the two at sf0.01 — column names and
types are aligned on both sides (BIGINT counts, DOUBLE ratios, string
dates) so value hashes can match.

Cross-engine determinism rules used throughout:
* only deterministic, engine-agnostic functions (md5, split-on-space,
  integer/double arithmetic, row_number with full ORDER BY tie-breaks);
* float aggregation only where the values are exactly representable
  (TPC-H quantities are whole numbers) or explicitly rounded;
* timestamps are formatted to strings before output.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from southpaw_spark.operators.cdc import (
    FilterMode,
    FilterRule,
    as_changelog,
    current_state,
    latest_by_key,
    tombstoned_keys,
)
from southpaw_spark.operators.denormalize import denormalize
from southpaw_spark.relations import load_relations

# ---------------------------------------------------------------------------
# helpers


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _events_ts_us(df: DataFrame, col: str = "ts"):
    """Epoch-microseconds expression for ``events.ts``, adaptive to the
    physical parquet type of the testdata generation in use.

    The driver testdata has carried ``ts`` as parquet TIMESTAMP(NANOS)
    (surfaced as a nanos-since-epoch BIGINT via
    ``spark.sql.legacy.parquet.nanosAsLong``) in some generations and as
    plain ``timestamp[us]`` (read as TIMESTAMP / TIMESTAMP_NTZ) in
    others. Branching on the observed dtype keeps the whole events query
    family runnable on both. The DuckDB oracles use ``epoch_us(ts)``,
    which treats the naive value as-is — the session timezone is pinned
    to UTC (``session.py``) so both sides agree.
    """
    dt = dict(df.dtypes).get(col, "")
    if dt == "bigint":  # legacy nanos-as-long
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def _events_ts(df: DataFrame, col: str = "ts"):
    """``events.ts`` as a true TIMESTAMP column (UTC), dtype-adaptive."""
    return F.timestamp_micros(_events_ts_us(df, col))


def _events_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a CDC changelog from the events table: key=user_id,
    seq=event_id, tombstone ⇔ event_type='error'. Purely deterministic so
    the DuckDB oracle can re-derive it."""
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("seq"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        (F.col("event_type") == "error").alias("is_tombstone"),
    )


_EVENTS_CHANGELOG_SQL = """
    SELECT event_id AS seq, user_id, event_type, value,
           (event_type = 'error') AS is_tombstone
    FROM events
"""

# The canonical TPC-H denormalization tree (FIXTURES.md §2).
ORDER_TREE_JSON = """[{
  "DenormalizedName": "DenormalizedOrder", "Entity": "orders",
  "Children": [
    {"Entity": "customer", "JoinKey": "c_custkey", "ParentKey": "o_custkey"},
    {"Entity": "lineitem", "JoinKey": "l_orderkey", "ParentKey": "o_orderkey",
     "Children": [
       {"Entity": "part", "JoinKey": "p_partkey", "ParentKey": "l_partkey"},
       {"Entity": "supplier", "JoinKey": "s_suppkey", "ParentKey": "l_suppkey"}
     ]}
  ]}]"""

# NOTE: the synthetic lineitem table has duplicate (l_orderkey,
# l_linenumber) pairs (~20% of keys at sf0.01) though full rows are
# distinct. Joins keep duplicates (SURVEY §2.2), so lineitem's identity
# for doc assembly is the full row — making child ordering a total,
# deterministic order and current_state a no-op dedup.
LINEITEM_ALL = [
    "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]

ORDER_TREE_KEYS = {
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "lineitem": LINEITEM_ALL,
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}


def build_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested DenormalizedOrder documents over the TPC-H tables.

    Snapshot tables ARE their own current state (one INSERT per row,
    FIXTURES.md §2) — running the latest-by-key window would add a full
    shuffle per entity for nothing, so the states feed straight into the
    denormalizer. The CDC path (changelog → current_state) is exercised
    by q01/q02/q06-q08/q11/q12."""
    rel = load_relations(ORDER_TREE_JSON)[0]
    states = {e: _read(spark, sf_dir, e) for e in ORDER_TREE_KEYS}
    return denormalize(states, rel, ORDER_TREE_KEYS)


# join key per entity in the order tree (root PK; child join keys)
ORDER_TREE_BUCKET_KEYS = {
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}


def build_order_docs_bucketed(
    spark: SparkSession, sf_dir: str, n_buckets: int = 16
) -> DataFrame:
    """Opt-in co-located variant of :func:`build_order_docs`: entity
    states are first materialized as bucketed tables on their join keys
    (``bucketize_states``), so the lineitem groupBy and the
    orders⋈children joins read pre-partitioned buckets instead of
    exchanging. Byte-identical output to the plain build; the write is
    paid once per state version (BASELINE.md §11 records the
    measured trade)."""
    from southpaw_spark.operators.denormalize import bucketize_states

    rel = load_relations(ORDER_TREE_JSON)[0]
    states = {e: _read(spark, sf_dir, e) for e in ORDER_TREE_KEYS}
    states = bucketize_states(states, ORDER_TREE_BUCKET_KEYS, n_buckets)
    return denormalize(states, rel, ORDER_TREE_KEYS)


# ---------------------------------------------------------------------------
# Q01–Q12: reference-semantics queries (SURVEY §2.4)


def q01_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 upsert: current state of the events changelog."""
    log = _events_changelog(spark, sf_dir)
    return current_state(log, ["user_id"]).select(
        "user_id", "event_type", "value"
    )


Q01_SQL = f"""
    WITH log AS ({_EVENTS_CHANGELOG_SQL}),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
      FROM log)
    SELECT user_id, event_type, value FROM latest
    WHERE rn = 1 AND NOT is_tombstone
"""


def q02_tombstoned_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: keys whose latest event is a tombstone."""
    log = _events_changelog(spark, sf_dir)
    return tombstoned_keys(log, ["user_id"])


Q02_SQL = f"""
    WITH log AS ({_EVENTS_CHANGELOG_SQL}),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
      FROM log)
    SELECT user_id FROM latest WHERE rn = 1 AND is_tombstone
"""


def q03_left_join_n1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 N:1 left join; missing parent keeps the row."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            "c_name",
            "c_mktsegment",
        )
    )


Q03_SQL = """
    SELECT o.o_orderkey, o.o_totalprice,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
           c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


def q04_nested_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 1:N join nested as an ordered array (§1.6 child ordering)."""
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            # Arrays are serialized to a sorted comma-joined string so the
            # driver's canonicalizer (pandas hash) can handle the column.
            F.array_join(
                F.sort_array(F.collect_list("l_linenumber")).cast("array<string>"),
                ",",
            ).alias("item_pks"),
        )
    )


Q04_SQL = """
    SELECT o.o_orderkey,
           COUNT(l.l_orderkey) AS n_items,
           COALESCE(array_to_string(LIST(l.l_linenumber ORDER BY l.l_linenumber)
                    FILTER (WHERE l.l_linenumber IS NOT NULL), ','), '') AS item_pks
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
"""


def q05_three_level_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 root→link→leaf chain (M:N via link entity)."""
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    supplier = _read(spark, sf_dir, "supplier")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")
        .join(part, part.p_partkey == lineitem.l_partkey, "left")
        .join(supplier, supplier.s_suppkey == lineitem.l_suppkey, "left")
        .select("o_orderkey", "l_linenumber", "p_name", "s_name")
    )


Q05_SQL = """
    SELECT o.o_orderkey, l.l_linenumber, p.p_name, s.s_name
    FROM orders o
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    LEFT JOIN part p ON p.p_partkey = l.l_partkey
    LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
"""


def q06_fk_repointing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8/O11 FK repointing: a child's FK moves; recompute-from-latest
    shows the child only under the new parent. Changelog synthesized
    deterministically from lineitem (linenumber=1 rows; orders divisible
    by 3 get a second event repointing l_partkey).

    lineitem carries ~20% duplicate (l_orderkey, l_linenumber) pairs, so
    the linenumber=1 slice MUST be reduced deterministically
    (min l_partkey per order) — duplicate rows would share seq and make
    latest-by-key a coin flip (first diverges at sf0.1)."""
    li = (
        _read(spark, sf_dir, "lineitem")
        .where(F.col("l_linenumber") == 1)
        .groupBy("l_orderkey")
        .agg(F.min("l_partkey").alias("l_partkey"))
    )
    part = _read(spark, sf_dir, "part")
    ev1 = li.select(
        F.lit(1).cast("long").alias("seq"),
        "l_orderkey",
        F.col("l_partkey").alias("partkey"),
        F.lit(False).alias("is_tombstone"),
    )
    ev2 = li.where(F.col("l_orderkey") % 3 == 0).select(
        F.lit(2).cast("long").alias("seq"),
        "l_orderkey",
        ((F.col("l_partkey") % 200) + 1).alias("partkey"),
        F.lit(False).alias("is_tombstone"),
    )
    state = current_state(ev1.unionByName(ev2), ["l_orderkey"])
    return state.join(part, state.partkey == part.p_partkey, "left").select(
        "l_orderkey", "p_partkey", "p_name"
    )


Q06_SQL = """
    WITH li AS (
      SELECT l_orderkey, MIN(l_partkey) AS l_partkey
      FROM lineitem WHERE l_linenumber = 1 GROUP BY l_orderkey),
    log AS (
      SELECT 1::BIGINT AS seq, l_orderkey, l_partkey AS partkey
      FROM li
      UNION ALL
      SELECT 2::BIGINT AS seq, l_orderkey, (l_partkey % 200) + 1 AS partkey
      FROM li WHERE l_orderkey % 3 = 0),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY seq DESC) rn
      FROM log)
    SELECT s.l_orderkey, p.p_partkey, p.p_name
    FROM latest s LEFT JOIN part p ON s.partkey = p.p_partkey
    WHERE s.rn = 1
"""


def q07_filter_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 filter DELETE: rows matching a predicate become tombstones
    (rule: o_orderstatus = 'F')."""
    log = as_changelog(_read(spark, sf_dir, "orders"))
    rules = [FilterRule(F.expr("o_orderstatus = 'F'"), FilterMode.DELETE)]
    return current_state(log, ["o_orderkey"], rules=rules).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


Q07_SQL = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE NOT (o_orderstatus = 'F')
"""


def q08_filter_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 filter SKIP: skipped events never touch state — an older event
    stays current (rule: event_type = 'click')."""
    log = _events_changelog(spark, sf_dir)
    rules = [FilterRule(F.expr("event_type = 'click'"), FilterMode.SKIP)]
    return current_state(log, ["user_id"], rules=rules).select(
        "user_id", "event_type", "value"
    )


Q08_SQL = f"""
    WITH log AS ({_EVENTS_CHANGELOG_SQL}),
    kept AS (SELECT * FROM log WHERE NOT (event_type = 'click')),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) rn
      FROM kept)
    SELECT user_id, event_type, value FROM latest
    WHERE rn = 1 AND NOT is_tombstone
"""


def q09_absent_vs_empty_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.6 absent-vs-empty: NULL parent key → child entity key absent;
    key present with zero matches → empty. NULL FKs synthesized
    (orderkeys divisible by 10 get NULL custkey)."""
    orders = _read(spark, sf_dir, "orders").withColumn(
        "custkey_n",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None)).otherwise(
            F.col("o_custkey")
        ),
    )
    customer = _read(spark, sf_dir, "customer")
    joined = orders.join(
        customer, orders.custkey_n == customer.c_custkey, "left"
    )
    return joined.groupBy("o_orderkey").agg(
        F.max(F.col("custkey_n").isNotNull()).alias("children_key_present"),
        F.count("c_custkey").alias("n_customer_children"),
    )


Q09_SQL = """
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_custkey END AS custkey_n
      FROM orders)
    SELECT o.o_orderkey,
           MAX(o.custkey_n IS NOT NULL) AS children_key_present,
           COUNT(c.c_custkey) AS n_customer_children
    FROM o LEFT JOIN customer c ON o.custkey_n = c.c_custkey
    GROUP BY o.o_orderkey
"""


def q10_empty_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.6: parents with zero matching children (→ empty array docs)."""
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n"))
        .where(F.col("n") == 0)
        .select("o_orderkey")
    )


Q10_SQL = """
    SELECT o.o_orderkey
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey HAVING COUNT(l.l_orderkey) = 0
"""


def q11_root_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16/§1.6: root PKs whose latest event is a tombstone emit null
    documents. Changelog synthesized from orders (orderkeys divisible by
    97 get a tombstone event)."""
    orders = _read(spark, sf_dir, "orders")
    ev1 = orders.select(
        F.lit(1).cast("long").alias("seq"),
        "o_orderkey",
        "o_totalprice",
        F.lit(False).alias("is_tombstone"),
    )
    ev2 = orders.where(F.col("o_orderkey") % 97 == 0).select(
        F.lit(2).cast("long").alias("seq"),
        "o_orderkey",
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(True).alias("is_tombstone"),
    )
    return tombstoned_keys(ev1.unionByName(ev2), ["o_orderkey"])


Q11_SQL = """
    SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0
"""


def q12_composite_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.4 composite-PK upsert: two events per (l_orderkey, l_linenumber)
    for orderkeys divisible by 7; the update (quantity + 100) wins.

    The raw table has duplicate composite keys, so the changelog base is
    deduped first with a fully-deterministic tie-break."""
    li = _read(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.col("l_quantity").desc(),
        F.col("l_extendedprice").desc(),
        F.col("l_partkey").desc(),
        F.col("l_suppkey").desc(),
        F.col("l_discount").desc(),
        F.col("l_tax").desc(),
    )
    li = li.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    ev1 = li.select(
        F.lit(1).cast("long").alias("seq"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lit(False).alias("is_tombstone"),
    )
    ev2 = li.where(F.col("l_orderkey") % 7 == 0).select(
        F.lit(2).cast("long").alias("seq"),
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") + 100).alias("l_quantity"),
        F.lit(False).alias("is_tombstone"),
    )
    return current_state(
        ev1.unionByName(ev2), ["l_orderkey", "l_linenumber"]
    ).select("l_orderkey", "l_linenumber", "l_quantity")


Q12_SQL = """
    WITH base AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
        ORDER BY l_quantity DESC, l_extendedprice DESC, l_partkey DESC,
                 l_suppkey DESC, l_discount DESC, l_tax DESC) AS rn
      FROM lineitem),
    dedup AS (SELECT * FROM base WHERE rn = 1),
    log AS (
      SELECT 1::BIGINT seq, l_orderkey, l_linenumber, l_quantity FROM dedup
      UNION ALL
      SELECT 2::BIGINT, l_orderkey, l_linenumber, l_quantity + 100
      FROM dedup WHERE l_orderkey % 7 = 0),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                                   ORDER BY seq DESC) rn FROM log)
    SELECT l_orderkey, l_linenumber, l_quantity FROM latest WHERE rn = 1
"""


def q13_denormalized_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13+O14 flagship: full nested DenormalizedOrder documents,
    hash-checked against a DuckDB oracle that reassembles the identical
    JSON bottom-up with struct_pack + LIST(ORDER BY child PK) + to_json
    (SURVEY §2.4 Q13's prescribed oracle). Cross-engine JSON agreement
    holds because the corpus has no null fields (ignoreNullFields is then
    a no-op), both engines serialize compact JSON with insertion-ordered
    keys, and timestamps are rendered to the same ISO-millis string
    (Spark natively; DuckDB via strftime)."""
    docs = build_order_docs(spark, sf_dir)
    return docs.select(
        "o_orderkey",
        F.to_json(F.col("doc"), {"ignoreNullFields": "true"}).alias("value"),
    )


# The oracle mirrors denormalize()'s bottom-up assembly: leaf docs, then
# lineitem docs with part/supplier child arrays, then the order doc. The
# LIST(... ORDER BY ...) clauses replicate the engine's child ordering:
# full-row order for lineitem (LINEITEM_ALL — duplicate composite PKs make
# the full row the identity) and PK order for the unique-PK entities.
Q13_SQL = """
WITH part_docs AS (
  SELECT p_partkey, struct_pack(
    Record := struct_pack(
      p_partkey := p_partkey, p_name := p_name, p_brand := p_brand,
      p_type := p_type, p_size := p_size, p_retailprice := p_retailprice)
  ) AS pdoc FROM part),
supp_docs AS (
  SELECT s_suppkey, struct_pack(
    Record := struct_pack(
      s_suppkey := s_suppkey, s_name := s_name, s_nationkey := s_nationkey,
      s_acctbal := s_acctbal)
  ) AS sdoc FROM supplier),
cust_docs AS (
  SELECT c_custkey, struct_pack(
    Record := struct_pack(
      c_custkey := c_custkey, c_name := c_name, c_nationkey := c_nationkey,
      c_acctbal := c_acctbal, c_mktsegment := c_mktsegment)
  ) AS cdoc FROM customer),
li_docs AS (
  SELECT l.*, struct_pack(
    Record := struct_pack(
      l_orderkey := l.l_orderkey, l_partkey := l.l_partkey,
      l_suppkey := l.l_suppkey, l_linenumber := l.l_linenumber,
      l_quantity := l.l_quantity, l_extendedprice := l.l_extendedprice,
      l_discount := l.l_discount, l_tax := l.l_tax,
      l_returnflag := l.l_returnflag, l_linestatus := l.l_linestatus,
      l_shipdate := strftime(l.l_shipdate, '%Y-%m-%dT%H:%M:%S.%g')),
    Children := struct_pack(
      part := CASE WHEN l.l_partkey IS NULL THEN NULL
                   WHEN p.pdoc IS NULL THEN [] ELSE [p.pdoc] END,
      supplier := CASE WHEN l.l_suppkey IS NULL THEN NULL
                       WHEN s.sdoc IS NULL THEN [] ELSE [s.sdoc] END)
  ) AS ldoc
  FROM lineitem l
  LEFT JOIN part_docs p ON p.p_partkey = l.l_partkey
  LEFT JOIN supp_docs s ON s.s_suppkey = l.l_suppkey),
li_agg AS (
  SELECT l_orderkey, LIST(ldoc ORDER BY
    l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
    l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    l_shipdate) AS lst
  FROM li_docs GROUP BY l_orderkey)
SELECT o.o_orderkey, to_json(struct_pack(
  Record := struct_pack(
    o_orderkey := o.o_orderkey, o_custkey := o.o_custkey,
    o_orderstatus := o.o_orderstatus, o_totalprice := o.o_totalprice,
    o_orderdate := strftime(o.o_orderdate, '%Y-%m-%dT%H:%M:%S.%g'),
    o_orderpriority := o.o_orderpriority),
  Children := struct_pack(
    customer := CASE WHEN o.o_custkey IS NULL THEN NULL
                     WHEN c.cdoc IS NULL THEN [] ELSE [c.cdoc] END,
    lineitem := CASE WHEN o.o_orderkey IS NULL THEN NULL
                     ELSE COALESCE(la.lst, []) END)
))::VARCHAR AS value
FROM orders o
LEFT JOIN cust_docs c ON c.c_custkey = o.o_custkey
LEFT JOIN li_agg la ON la.l_orderkey = o.o_orderkey
"""


ORDER_TREE_2LEVEL_JSON = """[{
  "DenormalizedName": "DenormalizedOrder2", "Entity": "orders",
  "Children": [
    {"Entity": "customer", "JoinKey": "c_custkey", "ParentKey": "o_custkey"},
    {"Entity": "lineitem", "JoinKey": "l_orderkey", "ParentKey": "o_orderkey"}
  ]}]"""


def q14_doc_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-checks nested-document assembly through SQL-expressible
    projections: counts, membership and an exact-arithmetic sum read out
    of the assembled doc (quantities are whole numbers → exact doubles).
    Uses the 2-level tree — the oracle can only see customer/lineitem
    projections, so building the part/supplier subtrees would add
    unchecked work (q13's full tree is value-checked against the
    pure-Python oracle in tests/)."""
    rel = load_relations(ORDER_TREE_2LEVEL_JSON)[0]
    # Project before the build (guide §2.3): the output reads only
    # c_name, l_quantity and l_linenumber out of the docs, but Catalyst
    # cannot prune Record fields through collect_list aggregates, so an
    # unpruned build would shuffle every column of all three tables.
    # Selecting just keys + read fields up front pushes the pruning into
    # the parquet scans (ReadSchema shrinks to 2+2+3 columns) and
    # shrinks both groupBy exchanges to the bytes the query needs.
    # Output-identical: the child order key is exactly the pruned doc's
    # fields, so any sort tie is between bit-identical structs, and
    # every projection the query emits is order-insensitive anyway
    # (count, membership, whole-number sum, sorted line numbers).
    states = {
        "orders": _read(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        ),
        "customer": _read(spark, sf_dir, "customer").select(
            "c_custkey", "c_name"
        ),
        "lineitem": _read(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity"
        ),
    }
    pruned_keys = {
        "orders": ["o_orderkey"],
        "customer": ["c_custkey"],
        "lineitem": ["l_orderkey", "l_linenumber", "l_quantity"],
    }
    docs = denormalize(states, rel, pruned_keys)
    li = F.col("doc.Children.lineitem")
    return docs.select(
        "o_orderkey",
        F.size(li).cast("long").alias("n_lineitems"),
        F.element_at(F.col("doc.Children.customer"), 1)["Record"]["c_name"].alias(
            "customer_name"
        ),
        F.aggregate(
            li, F.lit(0.0), lambda acc, x: acc + x["Record"]["l_quantity"]
        ).alias("total_qty"),
        # Sorted + comma-joined: array columns break the driver's pandas
        # canonicalizer, so serialize deterministically on both sides.
        F.array_join(
            F.sort_array(
                F.transform(li, lambda x: x["Record"]["l_linenumber"])
            ).cast("array<string>"),
            ",",
        ).alias("line_pks"),
    )


Q14_SQL = """
    SELECT o.o_orderkey,
           COUNT(l.l_orderkey) AS n_lineitems,
           MAX(c.c_name) AS customer_name,
           COALESCE(SUM(l.l_quantity), 0.0) AS total_qty,
           COALESCE(array_to_string(LIST(l.l_linenumber ORDER BY l.l_linenumber)
                    FILTER (WHERE l.l_linenumber IS NOT NULL), ','), '') AS line_pks
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
"""


# ---------------------------------------------------------------------------
# Beyond-reference: dedup / similarity / text (SURVEY §7.5)


def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: duplicate groups with canonical keeper.
    The corpus has no exact duplicates, so a deterministic copy of every
    50th document is unioned in to exercise the operator."""
    from southpaw_spark.operators.dedup import exact_duplicates

    docs = _read(spark, sf_dir, "documents")
    copies = docs.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    groups = exact_duplicates(docs.unionByName(copies), "text", "doc_id")
    # doc_ids is kept array-typed in the operator (d06 explodes it); the
    # registry projection serializes it for the driver's canonicalizer.
    return groups.withColumn(
        "doc_ids", F.array_join(F.col("doc_ids").cast("array<string>"), ",")
    )


D01_SQL = """
    WITH corpus AS (
      SELECT * FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 50 = 0)
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies,
           array_to_string(LIST(doc_id ORDER BY doc_id), ',') AS doc_ids
    FROM corpus
    GROUP BY md5(text) HAVING COUNT(*) > 1
"""


def d07_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup GROUPS: connected components over the
    3-gram-Jaccard pair graph (min-label propagation; the per-component
    minimum doc_id is the cluster id / canonical keeper). This is the
    step a real pipeline needs between pairwise similarity and actually
    dropping rows."""
    from southpaw_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = _read(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2)
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


def t08_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling for a training-data mix:
    hash-threshold (md5) keep decision — reproducible across engines and
    runs, no shuffle, composable with scan pushdown."""
    from southpaw_spark.operators.text import stratified_sample

    docs = _read(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        "lang",
        "doc_id",
        rates={"en": 0.5, "de": 0.25, "fr": 0.25},
        default_rate=0.1,
    ).select("doc_id", "lang")


T08_SQL = """
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          / 4294967295.0
          < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                      WHEN 'fr' THEN 0.25 ELSE 0.1 END
"""


def t09_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget sequence packing, sharded by language (the
    window partitions by shard — no global sort bottleneck)."""
    from southpaw_spark.operators.text import sequence_packing

    docs = _read(spark, sf_dir, "documents")
    return sequence_packing(docs, "text", "doc_id", "lang", token_budget=512)


T09_SQL = """
    SELECT doc_id, lang,
           len(string_split(text, ' '))::BIGINT AS n_tokens,
           FLOOR(COALESCE(SUM(len(string_split(text, ' ')))
                   OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) / 512)::BIGINT AS pack_id
    FROM documents
"""


def t10_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: distinct word-5-gram collisions between
    each corpus document (sources src2+) and the held-out benchmark set
    (src0/src1). Benchmark n-gram hashes broadcast; the probe is a
    map-side join over the corpus shingle stream."""
    from southpaw_spark.operators.text import ngram_contamination

    docs = _read(spark, sf_dir, "documents")
    bench = docs.where(F.col("source").isin("src0", "src1"))
    corpus = docs.where(~F.col("source").isin("src0", "src1"))
    return ngram_contamination(corpus, bench, "text", "doc_id", n=5)


T10_SQL = """
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(generate_series(1, len(w) - 4),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))) AS shingles
      FROM toks WHERE len(w) >= 5),
    bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh
      WHERE source IN ('src0', 'src1')),
    corpus AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
      WHERE source NOT IN ('src0', 'src1')),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_ngrams FROM corpus GROUP BY doc_id),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_hits
      FROM corpus c JOIN bench b ON c.s = b.s GROUP BY c.doc_id)
    SELECT p.doc_id, p.n_ngrams,
           COALESCE(h.n_hits, 0) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0)::DOUBLE / p.n_ngrams, 6)
             AS contamination_rate
    FROM per_doc p LEFT JOIN hits h ON h.doc_id = p.doc_id
"""


def t11_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-word fraction
    (pure codegen) and top-bigram fraction (explode + two groupBys —
    linear in corpus tokens)."""
    from southpaw_spark.operators.text import repetition_signals

    return repetition_signals(
        _read(spark, sf_dir, "documents"), "text", "doc_id"
    )


T11_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    base AS (
      SELECT doc_id, len(w) AS n_words,
             ROUND(1.0 - len(list_distinct(w))::DOUBLE / len(w), 6)
               AS dup_word_frac
      FROM toks WHERE len(w) >= 2),
    bg AS (
      SELECT doc_id, concat_ws(' ', w[i], w[i+1]) AS b
      FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2),
    cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
    top AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS n_bg
            FROM cnt GROUP BY doc_id)
    SELECT base.doc_id, base.n_words, base.dup_word_frac,
           ROUND(top.mx::DOUBLE / top.n_bg, 6) AS top_bigram_frac
    FROM base JOIN top ON top.doc_id = base.doc_id
"""


def e06_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing moving average over an hourly time series per event type
    (7-hour ROWS frame) — the window-frame aggregate family."""
    ev = _read(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("ts", _events_ts(ev))
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-6, Window.currentRow)
    )
    return hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.round(F.avg("n_events").over(w), 6).alias("ma7"),
    )


E06_SQL = """
    WITH hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2)
    SELECT event_type, hour, n_events,
           ROUND(AVG(n_events) OVER (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
    FROM hourly
"""


def a01_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup: subtotal grid over (status, priority) with the grand
    total — Spark `ROLLUP` grouping sets, one shuffle with partial
    aggregation for every grouping level."""
    orders = _read(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


A01_SQL = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def a02_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    `percentile` ≡ DuckDB `quantile_cont`, both type-7) — the exact
    baseline next to the sketch path (e03's HLL / approx_percentile)."""
    orders = _read(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
    )


A02_SQL = """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
    FROM orders GROUP BY o_orderstatus
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def a03_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts spread into one column per event type
    (fixed IN-list, so the plan is a single hash aggregate with
    conditional counters — no second pass to discover labels)."""
    ev = _read(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
            for t in _EVENT_TYPES
        ],
    )


def a04_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip (merges round-2's a03 + a04 rows): the
    a03 wide pivot melted back to long form. Value-checks BOTH operators
    — every user × type cell of the pivot appears in the long output, and
    zero-count combinations survive as explicit rows (the property a
    plain groupBy of the raw events would lose)."""
    wide = a03_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["user_id"],
        values=_EVENT_TYPES,
        variableColumnName="event_type",
        valueColumnName="n_events",
    )


A04_SQL = """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    types AS (SELECT unnest(['click','error','purchase','signup','view'])
              AS event_type),
    counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type)
    SELECT u.user_id, t.event_type,
           COALESCE(c.n, 0) AS n_events
    FROM users u CROSS JOIN types t
    LEFT JOIN counts c
      ON c.user_id = u.user_id AND c.event_type = t.event_type
"""


def d02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard similarity (shingle join —
    shuffle-native, no cross product)."""
    from southpaw_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.2
    )


D02_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(w) - 2),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
      FROM toks WHERE len(w) >= 3),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    sized AS (SELECT doc_id, len(shingles) AS n_sh FROM sh)
    SELECT i.id_a, i.id_b,
           ROUND(i.n_inter::DOUBLE / (sa.n_sh + sb.n_sh - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sized sa ON sa.doc_id = i.id_a
    JOIN sized sb ON sb.doc_id = i.id_b
    WHERE i.n_inter::DOUBLE / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.2
"""


# (defined after D02_SQL, which it embeds as the edge set)
D07_SQL = f"""
    WITH RECURSIVE pairs AS ({D02_SQL}),
    sym AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM pairs),
    verts AS (SELECT DISTINCT a AS id FROM sym),
    reach AS (
      SELECT id, id AS label FROM verts
      UNION
      SELECT s.a AS id, r.label FROM sym s JOIN reach r ON r.id = s.b)
    SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id
"""


def d03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding candidate pairs (md5-based hashes so the
    oracle reproduces them bit-for-bit)."""
    from southpaw_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(
        _read(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        n=3,
        num_hashes=8,
        bands=4,
    )


def _d03_sql() -> str:
    # one minhash per (perm i): min over shingles of md5(i || '|' || shingle)
    minhash_cols = ",\n           ".join(
        f"MIN(md5('{i}|' || s)) AS h{i}" for i in range(8)
    )
    band_rows = len(range(8)) // 4  # 2 hashes per band
    bands = []
    for b in range(4):
        cols = " || '|' || ".join(f"h{b * band_rows + j}" for j in range(band_rows))
        bands.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sigs")
    bands_sql = "\n      UNION ALL\n      ".join(bands)
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(w) - 2),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS s
      FROM toks WHERE len(w) >= 3),
    sigs AS (
      SELECT doc_id, {minhash_cols}
      FROM sh GROUP BY doc_id),
    bands AS (
      {bands_sql})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


D03_SQL = _d03_sql()


def d05_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH buckets
    — as an oracle-CHECKED row: the hyperplanes are a deterministic
    function of (seed, n_planes, n_tables, dim), so the oracle SQL
    embeds the very same plane values as literals and DuckDB reproduces
    the bucketing + exact-cosine rescore bit-for-bit (D05_SQL below).
    The registry pins n_planes=4 for that reason (the library default
    auto-scales planes to the corpus via auto_n_planes — recall gates
    for that path live in tests/test_similarity_dedup.py)."""
    from southpaw_spark.operators.dedup import embedding_near_duplicates

    emb = _read(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        emb, "embedding", "vec_id", threshold=0.2, n_planes=4, n_tables=2
    )


def _hyperplanes(n_planes: int, n_tables: int, dim: int = 64, seed: int = 42):
    """The exact plane draw embedding_near_duplicates / ivf_topk make:
    one seeded generator, one (n_planes, dim) block per table, in table
    order. Testdata embeddings are dim=64 at every SF (TESTDATA.md)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n_planes, dim)).tolist() for _ in range(n_tables)]


def _sql_dot(vec_expr: str, plane: list) -> str:
    # repr() emits shortest-roundtrip doubles; DuckDB parses them to the
    # identical float64 Spark's F.lit carries, and the left-to-right
    # "+" chain matches F.aggregate's sequential fold.
    return " + ".join(
        f"({vec_expr}[{i + 1}] * ({x!r}))" for i, x in enumerate(plane)
    )


def _sql_bucket(vec_expr: str, planes: list) -> str:
    """'0'/'1' sign-bit string — the SQL twin of the operators'
    concat_ws of (dot > 0) casts."""
    return " || ".join(
        f"CASE WHEN {_sql_dot(vec_expr, p)} > 0 THEN '1' ELSE '0' END"
        for p in planes
    )


def _d05_sql() -> str:
    t0, t1 = _hyperplanes(n_planes=4, n_tables=2)
    cos = (
        "list_sum(list_transform(range(1, 65), i -> a.ev[i] * b.ev[i]))"
        " / (sqrt(list_sum(list_transform(range(1, 65), i -> a.ev[i] * a.ev[i])))"
        " * sqrt(list_sum(list_transform(range(1, 65), i -> b.ev[i] * b.ev[i]))))"
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    bkt AS (SELECT vec_id, {_sql_bucket("ev", t0)} AS b0,
                   {_sql_bucket("ev", t1)} AS b1 FROM v),
    cand AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM bkt x JOIN bkt y ON x.b0 = y.b0 AND x.vec_id < y.vec_id
      UNION
      SELECT x.vec_id, y.vec_id
      FROM bkt x JOIN bkt y ON x.b1 = y.b1 AND x.vec_id < y.vec_id),
    scored AS (
      SELECT c.id_a, c.id_b, ROUND({cos}, 6) AS cosine
      FROM cand c JOIN v a ON a.vec_id = c.id_a
                  JOIN v b ON b.vec_id = c.id_b)
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.2
"""


D05_SQL = _d05_sql()


def d08_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the KEPT corpus — the step a training pipeline
    actually ships: exact-duplicate losers drop first (keeper = min
    doc_id per content hash), then any survivor appearing as the larger
    side of a near-dup pair (3-gram Jaccard ≥ 0.8) drops. One-pass
    greedy drop of id_b per pair — deterministic and SQL-expressible;
    transitive cluster resolution is d07's job. Runs the full
    exact→fuzzy cascade internally, so this row also covers round-2's
    separate d06 cascade entry (merged round 3 to fit the driver's
    50-row check budget)."""
    from southpaw_spark.operators.dedup import (
        exact_duplicates,
        ngram_jaccard_pairs,
    )

    docs = _read(spark, sf_dir, "documents")
    copies = docs.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    corpus = docs.unionByName(copies)
    dup_groups = exact_duplicates(corpus, "text", "doc_id")
    losers = (
        dup_groups.select(F.explode("doc_ids").alias("doc_id"), "keep_id")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    survivors = corpus.join(losers, "doc_id", "left_anti")
    fuzzy_losers = (
        ngram_jaccard_pairs(survivors, "text", "doc_id", n=3, threshold=0.8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        survivors.join(fuzzy_losers, "doc_id", "left_anti")
        .select("doc_id", "source", "n_chars")
    )


D08_SQL = """
    WITH corpus AS (
      SELECT * FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 50 = 0),
    groups AS (
      SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM corpus
      GROUP BY md5(text)),
    survivors AS (
      SELECT c.* FROM corpus c JOIN groups g
        ON md5(c.text) = g.h AND c.doc_id = g.keep_id),
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM survivors),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(w) - 2),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
      FROM toks WHERE len(w) >= 3),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    sized AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    fuzzy_losers AS (
      SELECT DISTINCT i.id_b AS doc_id
      FROM inter i
      JOIN sized sa ON sa.doc_id = i.id_a
      JOIN sized sb ON sb.doc_id = i.id_b
      WHERE i.n_inter::DOUBLE / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.8)
    SELECT s.doc_id, s.source, s.n_chars
    FROM survivors s LEFT JOIN fuzzy_losers f ON f.doc_id = s.doc_id
    WHERE f.doc_id IS NULL
"""


def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embedding column (query set =
    vec_id < 10). Baseline for ANN variants."""
    from southpaw_spark.operators.similarity import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk(emb, queries, "embedding", "vec_id", k=5)


S01_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
    sims AS (
      SELECT q.query_id, c.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> q.qv[i] * c.cv[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))
                * sqrt(list_sum(list_transform(range(1, 65), i -> c.cv[i] * c.cv[i]))))
             AS cosine
      FROM q CROSS JOIN c WHERE q.query_id <> c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ROUND(cosine, 8) DESC, vec_id) AS rk
      FROM sims)
    SELECT query_id, vec_id AS neighbor_id, rk AS rank,
           ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rk <= 5
"""


def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from southpaw_spark.operators.text import with_quality_score

    docs = _read(spark, sf_dir, "documents")
    return with_quality_score(docs, "text").select(
        "doc_id", "n_tokens", "mean_token_len", "stopword_ratio", "quality_score"
    )


T02_SQL = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    m AS (
      SELECT doc_id,
             len(w)::BIGINT AS n_tokens,
             ROUND(list_sum(list_transform(w, x -> len(x)))::DOUBLE / len(w), 6)
               AS mean_token_len,
             ROUND(len(list_filter(w, x ->
               x IN ('the','a','of','and','to','in','is','it')))::DOUBLE / len(w), 6)
               AS stopword_ratio
      FROM t)
    SELECT doc_id, n_tokens, mean_token_len, stopword_ratio,
           ROUND(LEAST(1.0, n_tokens / 100.0) * (0.5 + 0.5 * stopword_ratio), 6)
             AS quality_score
    FROM m
"""


def t03_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    from southpaw_spark.operators.text import with_lang_guess

    docs = _read(spark, sf_dir, "documents")
    return with_lang_guess(docs, "text").select("doc_id", "lang", "lang_guess")


T03_SQL = """
    SELECT doc_id, lang,
           CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 'en'
                WHEN len(string_split(text, ' ')) < 5 THEN 'short'
                ELSE 'other' END AS lang_guess
    FROM documents
"""


def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from southpaw_spark.operators.text import with_fingerprint

    docs = _read(spark, sf_dir, "documents")
    return with_fingerprint(docs, "text").select("doc_id", "fingerprint")


T04_SQL = """
    SELECT doc_id, md5(lower(substr(text, 1, 64)) || '|' || len(text)) AS fingerprint
    FROM documents
"""


def t05_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (BPE-ish pre-tokenizer) token counting alongside the
    whitespace count and char count (subsumes round-2's t01, which
    checked the same ``with_token_count`` operator)."""
    from southpaw_spark.operators.text import with_regex_token_count, with_token_count

    docs = _read(spark, sf_dir, "documents")
    return with_regex_token_count(with_token_count(docs, "text"), "text").select(
        "doc_id", "n_tokens", "n_bpe_tokens", "n_chars"
    )


T05_SQL = """
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))::BIGINT
             AS n_bpe_tokens,
           n_chars
    FROM documents
"""


def t06_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (lowercase/strip-punct/collapse-ws) + hash of
    the canonical form — the first stage of a normalization-aware dedup."""
    from southpaw_spark.operators.text import with_normalized_text

    docs = _read(spark, sf_dir, "documents")
    return with_normalized_text(docs, "text").select(
        "doc_id",
        F.length("norm_text").cast("long").alias("n_norm_chars"),
        F.md5(F.col("norm_text").cast("binary")).alias("norm_hash"),
    )


T06_SQL = """
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                  ' +', ' ', 'g')) AS norm_text
      FROM documents)
    SELECT doc_id, len(norm_text)::BIGINT AS n_norm_chars,
           md5(norm_text) AS norm_hash
    FROM n
"""


def t07_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (corpus statistics shape)."""
    from southpaw_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(_read(spark, sf_dir, "documents"), "text", "doc_id", k=3)


T07_SQL = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6)
               AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term) AS rank
      FROM scored)
    SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
"""


def e03_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting (HLL++) per event_type — the
    approximate-aggregation family, as an oracle-CHECKED row. Engine
    sketches differ bit-wise, so the hashed output carries the exact
    distinct count (a real data check DuckDB recomputes) plus the
    INVARIANT that Spark's HLL++ estimate lands within 3×rsd of exact
    (rsd=0.05 → ±15%); the oracle pins that assertion to TRUE, so a
    sketch drifting out of bound flips the boolean and fails the
    driver's hash compare instead of hiding behind a rows-only check."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.05).alias("__approx"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "n_events",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= F.lit(0.15) * F.col("exact_users")
            ).alias("hll_within_3rsd"),
        )
    )


E03_SQL = """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_within_3rsd
    FROM events GROUP BY event_type
"""


def e01_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the events stream table (the batch
    shape of the Structured Streaming windowed agg)."""
    ev = _read(spark, sf_dir, "events")
    # dtype-adaptive: nanos-long or native timestamp testdata both work.
    ev = ev.withColumn("ts", _events_ts(ev))
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


E01_SQL = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


def a05_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention grid: users grouped by first-activity week
    (cohort), counted distinct per weekly offset — two hash aggregations
    and one join, all keyed on user_id/cohort."""
    raw = _read(spark, sf_dir, "events")
    ev = raw.select(
        "user_id",
        F.date_trunc("week", _events_ts(raw)).cast("date").alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = ev.distinct()
    return (
        activity.join(first, "user_id")
        .groupBy(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


A05_SQL = """
    WITH ev AS (
      SELECT user_id, date_trunc('week', ts)::DATE AS week FROM events),
    first AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, week FROM ev)
    SELECT f.cohort_week::VARCHAR AS cohort_week,
           ((a.week - f.cohort_week) / 7)::BIGINT AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN first f ON f.user_id = a.user_id
    GROUP BY 1, 2
"""


def a06_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation on the hard signal: the two-phase
    salted collect_list (hot keys spread over 16 salts, partials
    flattened and sorted) must be result-identical to the plain
    aggregation — the oracle is the UNSALTED SQL, so equality proves
    salting is a pure plan transformation."""
    from southpaw_spark.operators.skew import salted_collect_list

    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    agg = salted_collect_list(
        li, ["l_orderkey"], F.col("l_linenumber"), n_salts=16
    )
    return agg.select(
        "l_orderkey",
        F.size("arr").cast("long").alias("n_items"),
        F.array_join(F.col("arr").cast("array<string>"), ",").alias("items"),
    )


A06_SQL = """
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           array_to_string(LIST(l_linenumber ORDER BY l_linenumber), ',')
             AS items
    FROM lineitem GROUP BY l_orderkey
"""


def e08_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user: first view, first click
    strictly after it, first purchase strictly after that. Three staged
    min-aggregations joined on user — each stage is one hash shuffle on
    user_id; no window over the full event log, no self-join explosion."""
    raw = _read(spark, sf_dir, "events")
    ev = raw.select(
        "user_id", "event_type", _events_ts_us(raw).alias("ts_us")
    )
    v = (
        ev.where("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("view_ts"))
    )
    c = (
        ev.where("event_type = 'click'")
        .join(v, "user_id")
        .where(F.col("ts_us") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("click_ts"))
    )
    p = (
        ev.where("event_type = 'purchase'")
        .join(c, "user_id")
        .where(F.col("ts_us") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            (F.col("click_ts").isNotNull()).alias("reached_click"),
            (F.col("purchase_ts").isNotNull()).alias("reached_purchase"),
        )
    )


E08_SQL = """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    v AS (
      SELECT user_id, MIN(ts_us) AS view_ts
      FROM ev WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts_us) AS click_ts
      FROM ev e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts_us > v.view_ts
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts_us) AS purchase_ts
      FROM ev e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts_us > c.click_ts
      GROUP BY e.user_id)
    SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           c.click_ts IS NOT NULL AS reached_click,
           p.purchase_ts IS NOT NULL AS reached_purchase
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
"""


def m01_image_metadata_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline (merges round-2's m01 passthrough + m02
    decode): opaque binary column → Arrow-batched metadata extraction
    (n_bytes, content digest, content kept in-band) chained straight into
    the deterministic fake image decode — one scan, two mapInPandas
    stages, zero joins. The oracle reproduces both the digest metadata
    and the digest-derived fake dimensions."""
    from southpaw_spark.operators.multimodal import (
        binary_metadata,
        decode_image_stub,
    )

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    meta = binary_metadata(docs, "content", id_col="doc_id", keep_content=True)
    return decode_image_stub(
        meta, "content", id_col="doc_id", carry_cols=("n_bytes", "content_md5")
    )


M01_SQL = """
    SELECT doc_id, octet_length(text::BLOB)::BIGINT AS n_bytes,
           md5(text) AS content_md5,
           (16 + ('0x' || substr(md5(text), 1, 2))::INT % 240) AS width,
           (16 + ('0x' || substr(md5(text), 3, 2))::INT % 240) AS height,
           'RGB' AS mode
    FROM documents
"""


def q15_shared_entity_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.5/Q14 reference semantics: the same entities (orders, lineitem)
    feed a second tree rooted at customer — shared children across
    multiple simultaneously-maintained trees."""
    tree = """[{
      "DenormalizedName": "DenormalizedCustomer", "Entity": "customer",
      "Children": [
        {"Entity": "orders", "JoinKey": "o_custkey", "ParentKey": "c_custkey"}
      ]}]"""
    rel = load_relations(tree)[0]
    states = {e: _read(spark, sf_dir, e) for e in ("customer", "orders")}
    docs = denormalize(
        states, rel, {"customer": ["c_custkey"], "orders": ["o_orderkey"]}
    )
    orders = F.col("doc.Children.orders")
    return docs.select(
        "c_custkey",
        F.size(orders).cast("long").alias("n_orders"),
        # Sorted + comma-joined for the driver's pandas canonicalizer.
        F.array_join(
            F.sort_array(
                F.transform(orders, lambda o: o["Record"]["o_orderkey"])
            ).cast("array<string>"),
            ",",
        ).alias("order_keys"),
    )


Q15_SQL = """
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE(array_to_string(LIST(o.o_orderkey ORDER BY o.o_orderkey)
                    FILTER (WHERE o.o_orderkey IS NOT NULL), ','), '') AS order_keys
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
"""


def q16_filter_unchanged_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 second half — old-row-aware filtering (reference
    ``customFilter(entity, rec, oldRec)`` + ``isEqual``,
    ``filter/BaseFilter.java:106-160``): a second wave of events re-emits
    the current payload for even user_ids (no-op updates), a changed
    payload for odd user_ids, and brand-new keys. The unchanged-skip rule
    must drop exactly the no-op re-emissions — survivors are the changed
    rows plus every new key."""
    from southpaw_spark.operators.cdc import (
        apply_old_aware_rules,
        unchanged_skip_rule,
    )

    log = _events_changelog(spark, sf_dir)
    state = current_state(log, ["user_id"]).select(
        "user_id", "event_type", "value"
    )
    same = state.where(F.col("user_id") % 2 == 0)
    changed = state.where(F.col("user_id") % 2 == 1).withColumn(
        "value", F.col("value") + 1
    )
    new = state.select(
        (F.col("user_id") + 1000000).alias("user_id"),
        F.lit("new").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    delta = (
        same.unionByName(changed)
        .unionByName(new)
        .withColumn("seq", F.lit(1).cast("long"))
        .withColumn("is_tombstone", F.lit(False))
    )
    out = apply_old_aware_rules(
        delta,
        state,
        [unchanged_skip_rule(["event_type", "value"])],
        ["user_id"],
    )
    return out.select("user_id", "event_type", "value")


Q16_SQL = f"""
    WITH log AS ({_EVENTS_CHANGELOG_SQL}),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
      FROM log),
    state AS (
      SELECT user_id, event_type, value FROM latest
      WHERE rn = 1 AND NOT is_tombstone),
    delta AS (
      SELECT user_id, event_type, value FROM state WHERE user_id % 2 = 0
      UNION ALL
      SELECT user_id, event_type, value + 1 FROM state WHERE user_id % 2 = 1
      UNION ALL
      SELECT user_id + 1000000, 'new', 0.0 FROM state)
    SELECT d.user_id, d.event_type, d.value
    FROM delta d LEFT JOIN state s ON s.user_id = d.user_id
    WHERE NOT (s.user_id IS NOT NULL
               AND s.event_type IS NOT DISTINCT FROM d.event_type
               AND s.value IS NOT DISTINCT FROM d.value)
"""


def d04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures (md5-bit variant so the oracle can
    reproduce them; the production path in operators.dedup.simhash uses
    xxhash64 for JVM speed — same algorithm, different hash family)."""
    docs = _read(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    tok = docs.select("doc_id", F.explode(w).alias("tok"))
    # 32-bit token hash from the md5 hex prefix (8 hex chars)
    th = tok.withColumn(
        "th", F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10).cast("long")
    )
    votes = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(32)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(32):
        sig = sig + F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select("doc_id", sig.alias("simhash"))


def _d04_sql() -> str:
    bit_exprs = []
    for i in range(32):
        bit_exprs.append(
            f"CASE WHEN SUM(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
            f"THEN {1 << i}::BIGINT ELSE 0 END"
        )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS th FROM tok)
    SELECT doc_id, ({' + '.join(bit_exprs)}) AS simhash
    FROM hashed GROUP BY doc_id
"""


D04_SQL = _d04_sql()


def d09_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (≤ 3 differing bits of the 32-bit md5
    signature) via banded Hamming blocking — the production operator
    (`operators.dedup.hamming_near_pairs`) over the d04 signature
    frame, so the oracle reproduces the signatures bit-for-bit and the
    banding/verification logic under test is the real code path."""
    from southpaw_spark.operators.dedup import hamming_near_pairs

    return hamming_near_pairs(
        d04_simhash(spark, sf_dir), "doc_id", "simhash",
        bits=32, max_hamming=3,
    )


D09_SQL = f"""
    WITH s AS ({D04_SQL}),
    bands(band) AS (VALUES (0), (1), (2), (3)),
    banded AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS bv
      FROM s, bands),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, bit_count(xor(sa, sb))::INTEGER AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""


def t12_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the word distribution (bits) +
    size facts — the information-density quality signal a filtering
    pipeline pairs with t02's surface heuristics (low-entropy docs are
    boilerplate/templates even when long). One explode + two combiner-
    friendly groupBys; H = log2(n) − Σc·ln(c)/(n·ln 2) keeps the
    aggregation a plain SUM (no per-row division before the combine)."""
    import math

    docs = _read(spark, sf_dir, "documents")
    cnt = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
    )
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.sum(F.col("c") * F.log("c")).alias("_sclc"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            F.round(
                F.log2("n_words")
                - F.col("_sclc") / (F.col("n_words") * F.lit(math.log(2.0))),
                6,
            ).alias("entropy_bits"),
        )
    )


T12_SQL = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    cnt AS (
      SELECT doc_id, t, count(*)::DOUBLE AS c FROM tok GROUP BY doc_id, t),
    agg AS (
      SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd, SUM(c * ln(c)) AS sclc
      FROM cnt GROUP BY doc_id)
    SELECT doc_id, n::BIGINT AS n_words, nd::BIGINT AS n_distinct,
           ROUND(log2(n) - sclc / (n * ln(2)), 6) AS entropy_bits
    FROM agg
"""


def d10_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs (doc a ⊆-nearly doc b) — the
    asymmetric quote/subset relation Jaccard structurally misses
    (`operators.dedup.containment_pairs`). Directional output."""
    from southpaw_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _read(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, threshold=0.8,
    )


D10_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(w) - 2),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
      FROM toks WHERE len(w) >= 3),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id != b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    sized AS (SELECT doc_id, len(shingles) AS n_sh FROM sh)
    SELECT i.id_a, i.id_b,
           ROUND(i.n_inter::DOUBLE / sa.n_sh, 6) AS containment
    FROM inter i
    JOIN sized sa ON sa.doc_id = i.id_a
    WHERE i.n_inter::DOUBLE / sa.n_sh >= 0.8
"""


def s04_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered exact top-k ("filtered vector search"): each
    query ranks only same-``label`` corpus vectors
    (`operators.similarity.cosine_topk_filtered`) — the
    tenant/language/label-scoped ANN every production vector store
    exposes; the filter lives in the join predicate so candidates are
    the filter partition, never the corpus."""
    from southpaw_spark.operators.similarity import cosine_topk_filtered

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        "label",
    )
    return cosine_topk_filtered(
        emb, queries, "embedding", "vec_id", k=5, filter_cols=("label",)
    )


S04_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label
      FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv, label FROM embeddings),
    sims AS (
      SELECT q.query_id, c.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> q.qv[i] * c.cv[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))
                * sqrt(list_sum(list_transform(range(1, 65), i -> c.cv[i] * c.cv[i]))))
             AS cosine
      FROM q JOIN c ON q.label = c.label AND q.query_id <> c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ROUND(cosine, 8) DESC, vec_id) AS rk
      FROM sims)
    SELECT query_id, vec_id AS neighbor_id, rk AS rank,
           ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rk <= 5
"""


def e07_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inactivity gaps over one hour: consecutive-event deltas
    via a lag window — the outage/churn-signal dual of e02's
    sessionization (e02 counts sessions; this names the exact gaps)."""
    ev = _read(spark, sf_dir, "events")
    sec = (_events_ts_us(ev) / F.lit(1_000_000)).cast("long")
    w = Window.partitionBy("user_id").orderBy(sec, "event_id")
    gap = (sec - F.lag(sec).over(w)).alias("gap_s")
    prev_id = F.lag("event_id").over(w)
    return (
        ev.select(
            "user_id",
            prev_id.alias("prev_event_id"),
            "event_id",
            gap,
        )
        .where(F.col("gap_s") > 3600)
    )


E07_SQL = """
    WITH e AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS sec FROM events),
    lagged AS (
      SELECT user_id,
             LAG(event_id) OVER (PARTITION BY user_id ORDER BY sec, event_id)
               AS prev_event_id,
             event_id,
             sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
               AS gap_s
      FROM e)
    SELECT user_id, prev_event_id, event_id, gap_s
    FROM lagged WHERE gap_s > 3600
"""


def d12_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup: case/punctuation variants that
    byte-exact d01 misses collapse after t06's canonicalization. The
    corpus is augmented with UPPERCASED copies (doc_id + 200000, the
    d08 self-test pattern) so the semantic difference from d01 is
    exercised, not asserted: every original∪copy family groups here
    and would NOT group raw."""
    from southpaw_spark.operators.dedup import exact_duplicates
    from southpaw_spark.operators.text import with_normalized_text

    docs = _read(spark, sf_dir, "documents")
    copies = docs.where(F.col("doc_id") % 100 == 0).withColumn(
        "doc_id", F.col("doc_id") + 200000
    ).withColumn("text", F.upper(F.col("text")))
    corpus = with_normalized_text(docs.unionByName(copies), "text")
    return exact_duplicates(corpus, "norm_text", "doc_id")


D12_SQL = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000, upper(text) FROM documents WHERE doc_id % 100 = 0),
    n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                  ' +', ' ', 'g')) AS norm_text
      FROM corpus)
    SELECT md5(norm_text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies,
           list_sort(list(doc_id)) AS doc_ids
    FROM n GROUP BY norm_text HAVING COUNT(*) > 1
"""


def d13_bag_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive exact dedup (`operators.dedup.bag_duplicates`):
    same word MULTISET ⇒ same group. The corpus is augmented with
    word-ROTATED copies (doc_id + 300000) — invisible to byte-exact
    d01, quadratic-candidate work for d02, one combiner groupBy here."""
    from southpaw_spark.operators.dedup import bag_duplicates

    docs = _read(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    rotated = docs.where(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.array_join(
            F.concat(F.slice(w, 2, F.size(w) - 1), F.slice(w, 1, 1)), " "
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(rotated)
    return bag_duplicates(corpus, "text", "doc_id")


D13_SQL = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 300000,
             concat_ws(' ',
               array_to_string(string_split(text, ' ')[2:], ' '),
               string_split(text, ' ')[1])
      FROM documents WHERE doc_id % 100 = 0),
    canon AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
               AS content_hash
      FROM corpus)
    SELECT content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
           list_sort(list(doc_id)) AS doc_ids
    FROM canon GROUP BY content_hash HAVING COUNT(*) > 1
"""


def s05_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) vector search: every neighbor with cosine ≥ 0.25
    (`operators.similarity.cosine_radius`) — the recall-complete dual
    of top-k that near-dup audits want."""
    from southpaw_spark.operators.similarity import cosine_radius

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_radius(emb, queries, "embedding", "vec_id", radius=0.25)


S05_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
    sims AS (
      SELECT q.query_id, c.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> q.qv[i] * c.cv[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))
                * sqrt(list_sum(list_transform(range(1, 65), i -> c.cv[i] * c.cv[i]))))
             AS cosine
      FROM q CROSS JOIN c WHERE q.query_id <> c.vec_id)
    SELECT query_id, vec_id AS neighbor_id, ROUND(cosine, 6) AS cosine
    FROM sims WHERE cosine >= 0.25
"""


def t14_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit (`operators.text.redact_pii`): every doc gets
    one deterministic synthetic PII item appended (rotating by doc_id %
    4: email / IPv4 / phone / 8-digit id — the corpus itself is
    synthetic prose with no real PII, so the fixture provides the
    signal), then the chained regexp scrub runs and the oracle
    replicates pattern-for-pattern in DuckDB's RE2 — which is exactly
    the portability contract PII_PATTERNS declares."""
    from southpaw_spark.operators.text import redact_pii

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    pii = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(" contact user"), did, F.lit("@example.com now")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."), (F.col("doc_id") % 200).cast("string"),
                F.lit(" logged"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit(" call +1 (555) 010-"),
                (1000 + F.col("doc_id") % 9000).cast("string"),
                F.lit(" today"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(" ref "),
                (F.lit(90000000) + F.col("doc_id")).cast("string"),
                F.lit(" end"),
            )
        )
    )
    staged = docs.select("doc_id", F.concat("text", pii).alias("text"))
    return redact_pii(staged, "text").select(
        "doc_id",
        F.col("text_redacted").alias("redacted"),
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ip").cast("long").alias("n_ip"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_idnum").cast("long").alias("n_idnum"),
    )


T14_SQL = r"""
    WITH staged AS (
      SELECT doc_id,
             text || CASE
               WHEN doc_id % 4 = 0 THEN
                 ' contact user' || doc_id::VARCHAR || '@example.com now'
               WHEN doc_id % 4 = 1 THEN
                 ' from 10.' || (doc_id % 256)::VARCHAR || '.0.'
                 || (doc_id % 200)::VARCHAR || ' logged'
               WHEN doc_id % 4 = 2 THEN
                 ' call +1 (555) 010-' || (1000 + doc_id % 9000)::VARCHAR
                 || ' today'
               ELSE ' ref ' || (90000000 + doc_id)::VARCHAR || ' end'
             END AS s
      FROM documents),
    r1 AS (SELECT doc_id,
             len(regexp_extract_all(s,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
               AS n_email,
             regexp_replace(s,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS s
           FROM staged),
    r2 AS (SELECT doc_id, n_email,
             len(regexp_extract_all(s,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
             regexp_replace(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
               '<IP>', 'g') AS s
           FROM r1),
    r3 AS (SELECT doc_id, n_email, n_ip,
             len(regexp_extract_all(s, '\+\d[\d() -]{7,}\d'))::BIGINT
               AS n_phone,
             regexp_replace(s, '\+\d[\d() -]{7,}\d', '<PHONE>', 'g') AS s
           FROM r2),
    r4 AS (SELECT doc_id, n_email, n_ip, n_phone,
             len(regexp_extract_all(s, '\b\d{8,}\b'))::BIGINT AS n_idnum,
             regexp_replace(s, '\b\d{8,}\b', '<IDNUM>', 'g') AS s
           FROM r3)
    SELECT doc_id, s AS redacted, n_email, n_ip, n_phone, n_idnum FROM r4
"""


def d14_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup pairs by EXACT Levenshtein distance ≤ 2
    (`operators.dedup.edit_distance_pairs`, PassJoin-style segment
    pigeonhole — the modality word-shingle dedup can't see). Input: the
    20-char document prefixes plus a deterministic typo'd copy of every
    third doc (first char → 'x', id + 1,000,000) so true pairs exist at
    every SF; the DuckDB oracle brute-forces levenshtein over the same
    augmented corpus."""
    from southpaw_spark.operators.dedup import edit_distance_pairs

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr("substring(text, 1, 20)").alias("s")
    )
    mutated = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("x"), F.expr("substring(s, 2)")).alias("s"),
    )
    corpus = docs.unionByName(mutated)
    return edit_distance_pairs(corpus, "s", "doc_id", max_dist=2)


D14_SQL = """
    WITH base AS (
      SELECT doc_id, substr(text, 1, 20) AS s FROM documents),
    mutated AS (
      SELECT doc_id + 1000000 AS doc_id, 'x' || substr(s, 2) AS s
      FROM base WHERE doc_id % 3 = 0),
    corpus AS (
      SELECT * FROM base UNION ALL SELECT * FROM mutated)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.s, b.s)::BIGINT AS distance
    FROM corpus a JOIN corpus b ON a.doc_id < b.doc_id
    WHERE length(a.s) >= 3 AND length(b.s) >= 3
      AND abs(length(a.s) - length(b.s)) <= 2
      AND levenshtein(a.s, b.s) <= 2
"""


def s06_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized vector search (round 8,
    `operators.similarity.cosine_topk_quantized`): per-vector symmetric
    scalar quantization — the 100 TB bandwidth lever (int8 codes move
    4× fewer bytes than float32 through every shuffle/broadcast).
    Cosine over symmetric codes is SCALE-FREE (both scales cancel), so
    the score is integer-dot / (√int·√int) — exactly reproducible in
    DuckDB, which is what this row's hash gate proves. The exact-rescore
    two-stage variant is recall-gated in tests (1.0 vs s01 at sf0.01)."""
    from southpaw_spark.operators.similarity import cosine_topk_quantized

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk_quantized(emb, queries, "embedding", "vec_id", k=5)


S06_SQL = """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scaled AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
      FROM base),
    codes AS (
      SELECT vec_id,
             CASE WHEN s = 0 THEN list_transform(v, x -> 0.0)
                  ELSE list_transform(v, x -> round(x / s, 0)) END AS c
      FROM scaled),
    q AS (SELECT vec_id AS query_id, c AS qc FROM codes WHERE vec_id < 10),
    cc AS (SELECT vec_id, c AS nc FROM codes),
    sims AS (
      SELECT q.query_id, cc.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> q.qc[i] * cc.nc[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> q.qc[i] * q.qc[i])))
                * sqrt(list_sum(list_transform(range(1, 65), i -> cc.nc[i] * cc.nc[i]))))
             AS cosine
      FROM q CROSS JOIN cc WHERE q.query_id <> cc.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ROUND(cosine, 8) DESC, vec_id) AS rk
      FROM sims)
    SELECT query_id, vec_id AS neighbor_id, rk AS rank,
           ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rk <= 5
"""


def e09_trending_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per hourly window by volume — the trending/
    leaderboard shape: windowed count then per-window rank, no global
    sort."""
    ev = _read(spark, sf_dir, "events")
    ev = ev.withColumn("ts", _events_ts(ev))
    counts = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("window_start", "event_type", "n_events", "rnk")
    )


E09_SQL = """
    WITH counts AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                 ORDER BY n_events DESC, event_type) AS rnk
      FROM counts)
    SELECT window_start, event_type, n_events, rnk::INTEGER AS rnk
    FROM ranked WHERE rnk <= 3
"""


def a08_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, user cohort): all four grouping levels in
    one pass — the OLAP companion to a01's hierarchical ROLLUP."""
    ev = _read(spark, sf_dir, "events").withColumn(
        "cohort", (F.col("user_id") % 5).cast("long")
    )
    return ev.cube("event_type", "cohort").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


A08_SQL = """
    WITH e AS (SELECT event_type, user_id % 5 AS cohort, value FROM events)
    SELECT event_type, cohort, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM e GROUP BY CUBE (event_type, cohort)
"""


def d11_quality_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper selection over the d07 dup clusters
    (`operators.dedup.cluster_keepers`): each near-dup family keeps its
    highest-quality_score member (ties → min doc_id) — the decision a
    production dedup ships instead of keep-the-smallest-id. Min-struct
    groupBy + join back; no window sort."""
    from southpaw_spark.operators.dedup import cluster_keepers
    from southpaw_spark.operators.text import with_quality_score

    clusters = d07_dup_clusters(spark, sf_dir).select(
        F.col("doc_id").alias("id"), "cluster_id"
    )
    scored = with_quality_score(
        _read(spark, sf_dir, "documents"), "text"
    ).select("doc_id", "quality_score")
    return cluster_keepers(clusters, scored, "doc_id", "quality_score").select(
        F.col("id").alias("doc_id"), "cluster_id", "keep_id", "is_keeper"
    )


D11_SQL = f"""
    WITH clusters AS ({D07_SQL}),
    q AS ({T02_SQL}),
    j AS (
      SELECT c.doc_id, c.cluster_id, q.quality_score
      FROM clusters c JOIN q USING (doc_id)),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
               ORDER BY quality_score DESC, doc_id) AS rn
      FROM j),
    w AS (SELECT cluster_id, doc_id AS keep_id FROM r WHERE rn = 1)
    SELECT j.doc_id, j.cluster_id, w.keep_id,
           (j.doc_id = w.keep_id) AS is_keeper
    FROM j JOIN w USING (cluster_id)
"""


def t13_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under a corpus-trained
    add-one-smoothed bigram LM (`operators.text.bigram_lm_scores`) —
    the in-domain fluency signal quality pipelines use where a real LM
    is unavailable: low scores flag shuffled/garbled text that surface
    stats like t02/t12 miss, because the model punishes improbable
    word TRANSITIONS, not word choice."""
    from southpaw_spark.operators.text import bigram_lm_scores

    return bigram_lm_scores(_read(spark, sf_dir, "documents"), "text", "doc_id")


T13_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(ws))) AS r(i)
      WHERE len(ws) >= 2),
    cnt2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
    cnt1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents))
    SELECT big.doc_id, count(*) AS n_bigrams,
           ROUND(AVG(ln((c2 + 1.0) / (c1 + v))), 6) AS avg_logprob
    FROM big
    JOIN cnt2 USING (w1, w2)
    JOIN cnt1 USING (w1), vocab
    GROUP BY big.doc_id
"""


def a07_top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 events per event_type by value (deterministic tiebreak on
    event_id) — the classic per-group top-N: one window over the group
    key, no global sort, no collect."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), "event_id"
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("event_type", "event_id", "user_id", "value", "rnk")
    )


A07_SQL = """
    WITH ranked AS (
      SELECT event_type, event_id, user_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rnk
      FROM events)
    SELECT event_type, event_id, user_id, value, rnk::INTEGER AS rnk
    FROM ranked WHERE rnk <= 5
"""


def a10_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period change — the dashboard staple (hourly sum per
    event_type, delta and %-change vs the previous hour via LAG). Sums
    are EXACT integer cents (the e11 ``exact_decimals`` discipline), so
    delta is integer arithmetic and pct_change is one IEEE division of
    exact integers — bit-reproducible across partitionings and engines.
    One combiner-friendly shuffle + one per-key window; the window
    partitions on event_type, so no global sort at any scale."""
    raw = _read(spark, sf_dir, "events")
    ev = raw.select(
        "event_type",
        F.floor(_events_ts_us(raw) / F.lit(3_600_000_000))
        .cast("long")
        .alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = ev.groupBy("event_type", "hour").agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    prev = F.lag("sum_cents").over(w)
    return agg.select(
        "event_type",
        "hour",
        "n_events",
        "sum_cents",
        (F.col("sum_cents") - prev).alias("delta_cents"),
        F.when(
            prev.isNotNull() & (prev != 0),
            F.round(
                (F.col("sum_cents") - prev) / prev.cast("double"), 6
            ),
        ).alias("pct_change"),
    )


A10_SQL = """
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    a AS (
      SELECT event_type, hour, count(*) AS n_events,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM b GROUP BY 1, 2),
    l AS (
      SELECT *, lag(sum_cents) OVER (PARTITION BY event_type
                                     ORDER BY hour) AS prev
      FROM a)
    SELECT event_type, hour, n_events, sum_cents,
           sum_cents - prev AS delta_cents,
           CASE WHEN prev IS NOT NULL AND prev <> 0
                THEN round((sum_cents - prev) / CAST(prev AS DOUBLE), 6)
           END AS pct_change
    FROM l
"""


def e02_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream (30-minute
    inactivity closes a session) — the batch shape of
    applyInPandasWithState session windows."""
    ev = _read(spark, sf_dir, "events")
    # epoch seconds, dtype-adaptive (truncation = floor for positive epochs)
    sec = (_events_ts_us(ev) / F.lit(1_000_000)).cast("long")
    w = Window.partitionBy("user_id").orderBy(sec, "event_id")
    gap = sec - F.lag(sec).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


E02_SQL = """
    WITH e AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS sec FROM events),
    flagged AS (
      SELECT user_id,
             CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id) IS NULL
                  OR sec - LAG(sec) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM e)
    SELECT user_id, SUM(new_sess)::BIGINT AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
"""


def e04_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (DuckDB ``ASOF JOIN``, pandas ``merge_asof``):
    every click event picks up the most recent prior view by the same
    user. Spark-side: union-and-window — ONE shuffle on user_id, no
    inequality join (``operators/temporal.py``)."""
    from southpaw_spark.operators.temporal import asof_join

    raw = _read(spark, sf_dir, "events")
    ev = raw.withColumn("ts_us", _events_ts_us(raw))
    clicks = ev.where("event_type = 'click'").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.where("event_type = 'view'").select(
        F.col("user_id"),
        F.col("ts_us").alias("view_ts_us"),
        F.col("event_id").alias("view_event_id"),
    )
    return asof_join(
        clicks, views, on=["user_id"], left_ts="ts_us", right_ts="view_ts_us"
    )


E04_SQL = """
    WITH clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'),
    views AS (
      SELECT event_id AS view_event_id, user_id, epoch_us(ts) AS view_ts_us
      FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, c.ts_us, v.view_ts_us, v.view_event_id
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts_us >= v.view_ts_us
"""


def e10_asof_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both physical arms of the total as-of join
    (`streaming.temporal.asof_join_auto`, round 8) checked against ONE
    oracle: `max_broadcast_rows=None` forces the broadcast grouped-state
    probe, `=1` forces the past-cap fallback (batch left → the
    union-and-window plan). Each arm's rows are tagged and unioned, so
    the hash gate proves the strategy switch is row-invisible."""
    from southpaw_spark.streaming.temporal import asof_join_auto

    raw = _read(spark, sf_dir, "events")
    ev = raw.withColumn("ts_us", _events_ts_us(raw))
    clicks = ev.where("event_type = 'click'").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.where("event_type = 'view'").select(
        F.col("user_id"),
        F.col("ts_us").alias("view_ts_us"),
        F.col("event_id").alias("view_event_id"),
    )
    arms = []
    for arm, cap in (("probe", None), ("fallback", 1)):
        arms.append(
            asof_join_auto(
                clicks, views, on=["user_id"], left_ts="ts_us",
                right_ts="view_ts_us", max_broadcast_rows=cap,
            ).withColumn("arm", F.lit(arm))
        )
    return arms[0].unionByName(arms[1])


E10_SQL = """
    WITH clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'),
    views AS (
      SELECT event_id AS view_event_id, user_id, epoch_us(ts) AS view_ts_us
      FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, c.ts_us, v.view_ts_us, v.view_event_id,
           arms.arm
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts_us >= v.view_ts_us
    CROSS JOIN (VALUES ('probe'), ('fallback')) arms(arm)
"""


def e11_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (`operators.temporal.gapfill`): hourly
    per-user grid over each user's observed span, holes filled by locf
    AND linear interpolation — the TimescaleDB
    ``time_bucket_gapfill``/``interpolate`` operator family, expressed
    as two key-partitioned shuffles + one per-key window (grid
    generation is a distributed ``sequence``+``explode``, never a
    driver loop)."""
    from southpaw_spark.operators.temporal import gapfill

    raw = _read(spark, sf_dir, "events")
    ev = raw.where(F.col("user_id") < 30).select(
        "user_id",
        (_events_ts_us(raw) / F.lit(1_000_000)).alias("sec"),
        "value",
    )
    return gapfill(
        ev, "sec", ["user_id"], "value", stride=3600, exact_decimals=2,
        round_to=None,
    )


E11_SQL = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) / 1000000 AS sec, value
      FROM events WHERE user_id < 30),
    b AS (
      SELECT user_id, (CAST(floor(sec / 3600) AS BIGINT)) * 3600 AS bucket,
             sum(c) / (count(c) * 100.0) AS v
      FROM (SELECT user_id, sec,
                   CAST(round(value * 100.0) AS BIGINT) AS c FROM e)
      GROUP BY 1, 2),
    r AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
          FROM b GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(range(mn, mx + 3600, 3600)) AS bucket FROM r),
    g AS (
      SELECT grid.user_id, grid.bucket, b.v
      FROM grid LEFT JOIN b
        ON grid.user_id = b.user_id AND grid.bucket = b.bucket),
    w AS (
      SELECT user_id, bucket, v,
             last_value(CASE WHEN v IS NOT NULL
                             THEN struct_pack(b := bucket, v := v) END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev,
             first_value(CASE WHEN v IS NOT NULL
                              THEN struct_pack(b := bucket, v := v) END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nxt
      FROM g)
    SELECT user_id, bucket,
           v AS v_obs,
           prev.v AS v_locf,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev IS NOT NULL AND nxt IS NOT NULL
                THEN prev.v + (nxt.v - prev.v)
                     * (bucket - prev.b) / (nxt.b - prev.b)
                ELSE coalesce(prev.v, nxt.v) END AS v_interp
    FROM w
"""


def e12_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed OHLC bars (`operators.temporal.ohlc`): per
    (event_type, hour) the first/max/min/last value plus count — the
    TimescaleDB ``candlestick_agg`` / InfluxDB FIRST-LAST downsampling
    family. Every aggregate (min_by/max_by/min/max/count) is mergeable,
    so the whole operator is ONE combiner-friendly shuffle — no window,
    no sort. Values pass through untouched (comparison only), so the
    doubles hash-match the oracle bit-for-bit. events.ts is globally
    unique in the testdata, making open/close deterministic."""
    from southpaw_spark.operators.temporal import ohlc

    raw = _read(spark, sf_dir, "events")
    ev = raw.select(
        "event_type",
        (_events_ts_us(raw) / F.lit(1_000_000)).alias("sec"),
        "value",
    )
    return ohlc(ev, "sec", ["event_type"], "value", stride=3600)


E12_SQL = """
    WITH e AS (
      SELECT event_type, epoch_us(ts) / 1000000 AS sec, value
      FROM events)
    SELECT event_type,
           (CAST(floor(sec / 3600) AS BIGINT)) * 3600 AS bucket,
           arg_min(value, sec) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, sec) AS close,
           count(*) AS n_events
    FROM e GROUP BY 1, 2
"""


def e05_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: (click, view) pairs where the same user's view fell
    within the hour before the click. Spark-side: time-bucketed equi-join
    (explode right into 2 candidate buckets, hash-join on (user, bucket),
    exact predicate after) — never a BroadcastNestedLoopJoin
    (``operators/temporal.py``)."""
    from southpaw_spark.operators.temporal import range_join

    raw = _read(spark, sf_dir, "events")
    ev = raw.withColumn("ts_us", _events_ts_us(raw))
    clicks = ev.where("event_type = 'click'").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.where("event_type = 'view'").select(
        F.col("user_id"),
        F.col("ts_us").alias("view_ts_us"),
        F.col("event_id").alias("view_event_id"),
    )
    pairs = range_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="view_ts_us",
        lower=-3_600_000_000,
        upper=0,
    )
    return pairs.select(
        "event_id",
        "user_id",
        "view_event_id",
        (F.col("ts_us") - F.col("view_ts_us")).alias("gap_us"),
    )


E05_SQL = """
    WITH clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'),
    views AS (
      SELECT event_id AS view_event_id, user_id, epoch_us(ts) AS view_ts_us
      FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, v.view_event_id,
           c.ts_us - v.view_ts_us AS gap_us
    FROM clicks c JOIN views v
      ON c.user_id = v.user_id
     AND v.view_ts_us >= c.ts_us - 3600000000
     AND v.view_ts_us <  c.ts_us
"""


def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal fan-out plumbing: each binary 'video' yields N frame
    rows from one input row inside mapInPandas (deterministic fake
    decode; digest-derived frame count/digests let the oracle reproduce
    the arithmetic exactly)."""
    from southpaw_spark.operators.multimodal import frame_sample_stub

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    return frame_sample_stub(docs, "content", id_col="doc_id")


M03_SQL = """
    WITH base AS (
      SELECT doc_id, text,
             1 + ('0x' || substr(md5(text), 5, 2))::INT % 4 AS n_frames
      FROM documents),
    expanded AS (
      SELECT doc_id, text, n_frames,
             unnest(generate_series(0, n_frames - 1)) AS i
      FROM base)
    SELECT doc_id, i::INT AS frame_idx, n_frames,
           md5(text || '#' || i) AS frame_md5
    FROM expanded
"""


def s02_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH bucket pruning + 1-bit
    multiprobe + exact rescoring (IVF-style) — as an oracle-CHECKED
    row: with n_planes pinned the plane draw is deterministic, so the
    oracle SQL embeds the same planes as literals and reproduces
    bucketing, probing and the top-k window bit-for-bit (S02_SQL).
    Recall-vs-s01 gates for the auto-scaled plane path live in tests."""
    from southpaw_spark.operators.similarity import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk(emb, queries, "embedding", "vec_id", k=5, n_planes=4)


def _s02_sql() -> str:
    (planes,) = _hyperplanes(n_planes=4, n_tables=1)
    n = len(planes)
    bit_cases = ", ".join(
        f"CASE WHEN {_sql_dot('qv', p)} > 0 THEN 1 ELSE 0 END AS bit{i}"
        for i, p in enumerate(planes)
    )
    plain = " || ".join(f"CAST(bit{i} AS VARCHAR)" for i in range(n))
    probes = [plain]
    for flip in range(n):
        probes.append(
            " || ".join(
                f"CAST({'1 - ' if i == flip else ''}bit{i} AS VARCHAR)"
                for i in range(n)
            )
        )
    probe_list = ",\n        ".join(probes)
    cos = (
        "list_sum(list_transform(range(1, 65), i -> qp.qv[i] * c.cv[i]))"
        " / (sqrt(list_sum(list_transform(range(1, 65), i -> qp.qv[i] * qp.qv[i])))"
        " * sqrt(list_sum(list_transform(range(1, 65), i -> c.cv[i] * c.cv[i]))))"
    )
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS cv,
                      {_sql_bucket("(embedding::DOUBLE[])", planes)} AS bucket
               FROM embeddings),
    q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
    qb AS (SELECT query_id, qv, {bit_cases} FROM q0),
    qp AS (SELECT query_id, qv, unnest([
        {probe_list}]) AS bucket FROM qb),
    sims AS (
      SELECT qp.query_id, c.vec_id, {cos} AS cosine
      FROM c JOIN qp ON c.bucket = qp.bucket
      WHERE qp.query_id <> c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ROUND(cosine, 8) DESC, vec_id) AS rk
      FROM sims)
    SELECT query_id, vec_id AS neighbor_id, rk AS rank,
           ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rk <= 5
"""


S02_SQL = _s02_sql()


def q17_dynamic_schema_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic per-record schema denormalization (reference
    ``record/MapRecord.java:41-50``, ``record/BaseRecord.java:37-41`` —
    SURVEY §1.2's "dynamic, per-record" schema system): a heterogeneous
    changelog derived deterministically from events — profile rows take
    one of two shapes by event_type, hit rows one of two shapes by
    event_id parity — upserted by user and assembled into nested docs.
    Spark-first: rows are VARIANT (``parse_dynamic``); typed keys are
    extracted for the upsert window / child join / child ordering;
    ``to_json`` re-emits exactly each record's own fields (sorted keys).
    Subsumes the retired e07_json_extract surface: the changelog
    derivation itself is JSON field extraction over ``props``."""
    from southpaw_spark.operators.cdc import current_state
    from southpaw_spark.operators.denormalize import (
        denormalize_to_json,
        parse_dynamic,
    )

    ev = _read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long").cast("string")
    uid = F.col("user_id").cast("string")
    eid = F.col("event_id").cast("string")
    profile_val = F.when(
        F.col("event_type").isin("click", "view"),
        F.concat(
            F.lit('{"last_type":"'), F.col("event_type"),
            F.lit('","user_id":'), uid, F.lit("}"),
        ),
    ).otherwise(
        F.concat(F.lit('{"k":'), k, F.lit(',"user_id":'), uid, F.lit("}"))
    )
    profiles = ev.select(
        F.col("event_id").alias("seq"),
        profile_val.alias("value"),
        F.lit(False).alias("is_tombstone"),
    )
    hit_val = F.when(
        F.col("event_id") % 2 == 1,
        F.concat(
            F.lit('{"eid":'), eid, F.lit(',"k":'), k,
            F.lit(',"uid":'), uid, F.lit("}"),
        ),
    ).otherwise(
        F.concat(F.lit('{"eid":'), eid, F.lit(',"uid":'), uid, F.lit("}"))
    )
    hits = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("seq"),
        hit_val.alias("value"),
        F.lit(False).alias("is_tombstone"),
    )
    states = {
        "profile": current_state(
            parse_dynamic(profiles, {"user_id": "bigint"}), ["user_id"]
        ),
        "hit": current_state(
            parse_dynamic(hits, {"eid": "bigint", "uid": "bigint"}), ["eid"]
        ),
    }
    rel = load_relations([{
        "DenormalizedName": "DynProfile", "Entity": "profile",
        "Children": [
            {"Entity": "hit", "JoinKey": "uid", "ParentKey": "user_id"}
        ],
    }])[0]
    out = denormalize_to_json(
        states, rel, {"profile": ["user_id"], "hit": ["eid"]},
        record_cols={"profile": "__v", "hit": "__v"},
    )
    return out.select("user_id", F.col("value").alias("doc"))


Q17_SQL = """
    WITH k AS (
      SELECT event_id, user_id, event_type,
             json_extract(props, '$.k')::BIGINT AS k
      FROM events),
    prof AS (
      SELECT user_id,
        CASE WHEN event_type IN ('click', 'view')
          THEN '{"last_type":"' || event_type || '","user_id":'
               || user_id::VARCHAR || '}'
          ELSE '{"k":' || k::VARCHAR || ',"user_id":'
               || user_id::VARCHAR || '}' END AS rec
      FROM k
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY event_id DESC) = 1),
    hits AS (
      SELECT user_id, event_id,
        CASE WHEN event_id % 2 = 1
          THEN '{"eid":' || event_id::VARCHAR || ',"k":' || k::VARCHAR
               || ',"uid":' || user_id::VARCHAR || '}'
          ELSE '{"eid":' || event_id::VARCHAR || ',"uid":'
               || user_id::VARCHAR || '}' END AS rec
      FROM k WHERE event_type = 'click'),
    agg AS (
      SELECT user_id,
             string_agg('{"Record":' || rec || '}', ',' ORDER BY event_id)
               AS kids
      FROM hits GROUP BY user_id)
    SELECT p.user_id,
      '{"Record":' || p.rec || ',"Children":{"hit":['
        || COALESCE(a.kids, '') || ']}}' AS doc
    FROM prof p LEFT JOIN agg a USING (user_id)
"""


# ---------------------------------------------------------------------------
# registry


# Exactly 50 entries — the driver checks at most 50 rows per round
# (CORRECTNESS_r02 stopped at 50 of 54), so round 3 merged four
# genuinely-duplicative rows (t01→t05, a03+a04→a04_pivot_unpivot,
# d06→d08, m01+m02→m01_image_metadata_decode) with zero operator-
# coverage loss, and ordered the never-yet-checked entries (e08,
# m01, m03) plus the freshly-fixed e07 right after the core q-family
# so a shorter driver run still reaches them.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_latest_by_key": q01_latest_by_key,
    "q02_tombstoned_keys": q02_tombstoned_keys,
    "q03_left_join_n1": q03_left_join_n1,
    "q04_nested_children": q04_nested_children,
    "q05_three_level_tree": q05_three_level_tree,
    "q06_fk_repointing": q06_fk_repointing,
    "q07_filter_delete": q07_filter_delete,
    "q08_filter_skip": q08_filter_skip,
    "q09_absent_vs_empty_children": q09_absent_vs_empty_children,
    "q10_empty_children": q10_empty_children,
    "q11_root_tombstones": q11_root_tombstones,
    "q12_composite_pk": q12_composite_pk,
    "q13_denormalized_order": q13_denormalized_order,
    "q14_doc_projection": q14_doc_projection,
    "q15_shared_entity_tree": q15_shared_entity_tree,
    "q16_filter_unchanged_skip": q16_filter_unchanged_skip,
    # round-5 headline (dynamic per-record schema; subsumes e07's
    # json-extract surface — its derivation IS json extraction) — early
    # so a short driver run reaches it
    "q17_dynamic_schema_docs": q17_dynamic_schema_docs,
    "e08_funnel": e08_funnel,
    "m01_image_metadata_decode": m01_image_metadata_decode,
    "m03_frame_sample": m03_frame_sample,
    "d01_dedup_exact": d01_dedup_exact,
    "d02_ngram_jaccard": d02_ngram_jaccard,
    "d03_minhash_lsh": d03_minhash_lsh,
    "d04_simhash": d04_simhash,
    "d05_embedding_near_dup": d05_embedding_near_dup,
    "d07_dup_clusters": d07_dup_clusters,
    "d08_dedup_apply": d08_dedup_apply,
    "s01_cosine_topk": s01_cosine_topk,
    "s02_ivf_topk": s02_ivf_topk,
    "t02_quality_score": t02_quality_score,
    "t03_lang_guess": t03_lang_guess,
    "t04_fingerprint": t04_fingerprint,
    "t05_bpe_token_count": t05_bpe_token_count,
    "t06_normalize": t06_normalize,
    "t07_tfidf_top_terms": t07_tfidf_top_terms,
    "t08_stratified_sample": t08_stratified_sample,
    "t09_sequence_packing": t09_sequence_packing,
    "t10_contamination": t10_contamination,
    "t11_repetition": t11_repetition,
    "a01_rollup": a01_rollup,
    "a02_percentiles": a02_percentiles,
    "a04_pivot_unpivot": a04_pivot_unpivot,
    "a05_cohort_retention": a05_cohort_retention,
    "a06_salted_agg": a06_salted_agg,
    "e01_windowed_agg": e01_windowed_agg,
    "e02_sessionize": e02_sessionize,
    "e03_approx_distinct": e03_approx_distinct,
    "e04_asof_join": e04_asof_join,
    "e05_range_join": e05_range_join,
    "e06_moving_avg": e06_moving_avg,
}

ORACLES: dict[str, str] = {
    "q01_latest_by_key": Q01_SQL,
    "q02_tombstoned_keys": Q02_SQL,
    "q03_left_join_n1": Q03_SQL,
    "q04_nested_children": Q04_SQL,
    "q05_three_level_tree": Q05_SQL,
    "q06_fk_repointing": Q06_SQL,
    "q07_filter_delete": Q07_SQL,
    "q08_filter_skip": Q08_SQL,
    "q09_absent_vs_empty_children": Q09_SQL,
    "q10_empty_children": Q10_SQL,
    "q11_root_tombstones": Q11_SQL,
    "q12_composite_pk": Q12_SQL,
    "q13_denormalized_order": Q13_SQL,
    "q14_doc_projection": Q14_SQL,
    "q15_shared_entity_tree": Q15_SQL,
    "q16_filter_unchanged_skip": Q16_SQL,
    "e08_funnel": E08_SQL,
    "m01_image_metadata_decode": M01_SQL,
    "m03_frame_sample": M03_SQL,
    "q17_dynamic_schema_docs": Q17_SQL,
    "d01_dedup_exact": D01_SQL,
    "d02_ngram_jaccard": D02_SQL,
    "d03_minhash_lsh": D03_SQL,
    "d04_simhash": D04_SQL,
    # d05/s02: planes pinned + embedded as SQL literals -> fully checked
    "d05_embedding_near_dup": D05_SQL,
    "d07_dup_clusters": D07_SQL,
    "d08_dedup_apply": D08_SQL,
    "s02_ivf_topk": S02_SQL,
    "s01_cosine_topk": S01_SQL,
    "t02_quality_score": T02_SQL,
    "t03_lang_guess": T03_SQL,
    "t04_fingerprint": T04_SQL,
    "t05_bpe_token_count": T05_SQL,
    "t06_normalize": T06_SQL,
    "t07_tfidf_top_terms": T07_SQL,
    "t08_stratified_sample": T08_SQL,
    "t09_sequence_packing": T09_SQL,
    "t10_contamination": T10_SQL,
    "t11_repetition": T11_SQL,
    "a01_rollup": A01_SQL,
    "a02_percentiles": A02_SQL,
    "a04_pivot_unpivot": A04_SQL,
    "a05_cohort_retention": A05_SQL,
    "a06_salted_agg": A06_SQL,
    # e03: exact counts hashed + sketch-invariant boolean (see e03 docstring)
    "e03_approx_distinct": E03_SQL,
    "e01_windowed_agg": E01_SQL,
    "e02_sessionize": E02_SQL,
    "e04_asof_join": E04_SQL,
    "e05_range_join": E05_SQL,
    "e06_moving_avg": E06_SQL,
}

def t15_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget domain mixing (round 8,
    `operators.text.token_budget_sample`): deterministic greedy
    hash-priority sampling until each language hits its token budget
    (crossing doc included) — the "N tokens of web, M of code" mix
    step. The bucketed no-global-sort plan must equal the oracle's
    single ORDER BY exactly."""
    from southpaw_spark.operators.text import token_budget_sample

    docs = _read(spark, sf_dir, "documents")
    return token_budget_sample(
        docs, "text", "doc_id", "lang",
        budgets={"en": 3000, "de": 1200, "fr": 700},
    ).select("doc_id", "lang", "n_tokens")


def t18_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup (`operators.text.canonical_url` /
    `url_duplicates`): scheme/host lowercasing, www. + default-port
    stripping, fragment/trailing-slash removal, tracking-param
    (utm_*/fbclid/gclid/ref) drop and query-param SORT — then exact
    groups over the canonical form. Four synthesized per-doc URL
    variants (case/port/params/fragment noise) that must collapse to
    two canonical groups per doc pair."""
    from southpaw_spark.operators.text import url_duplicates

    docs = _read(spark, sf_dir, "documents")
    blk = F.floor(F.col("doc_id") / 4).cast("long")
    base = F.concat(
        F.lit("site"), (blk % 50).cast("string"), F.lit(".example.com")
    )
    stem = blk.cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("HTTP://WWW."), F.upper(base),
                     F.lit(":80/Docs/"), stem,
                     F.lit("/?utm_source=x&fbclid&b=2&a=1#frag")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("http://"), base, F.lit("/Docs/"), stem,
                     F.lit("?a=1&b=2")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://"), base, F.lit("/Docs/"), stem,
                     F.lit("/")),
        )
        .otherwise(
            F.concat(F.lit("https://"), base, F.lit(":443/Docs/"), stem,
                     F.lit("?gclid=z&utm_medium")),
        )
    )
    urls = docs.select("doc_id", url.alias("url"))
    return url_duplicates(urls, "url", "doc_id")


T18_SQL = """
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'HTTP://WWW.' || upper(base) || ':80/Docs/'
                    || stem || '/?utm_source=x&fbclid&b=2&a=1#frag'
               WHEN 1 THEN 'http://' || base || '/Docs/'
                    || stem || '?a=1&b=2'
               WHEN 2 THEN 'https://' || base || '/Docs/'
                    || stem || '/'
               ELSE 'https://' || base || ':443/Docs/'
                    || stem || '?gclid=z&utm_medium'
             END AS url
      FROM (
        SELECT doc_id,
               'site' || CAST((doc_id // 4) % 50 AS VARCHAR)
               || '.example.com' AS base,
               CAST(doc_id // 4 AS VARCHAR) AS stem
        FROM documents)),
    parsed AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '')
               AS after
      FROM u),
    hp AS (
      SELECT *,
             lower(regexp_extract(after, '^([^/?#]*)', 1)) AS hostport
      FROM parsed),
    np AS (
      SELECT *,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                            '^www\\.', '') AS host,
             regexp_replace(substr(after, len(hostport) + 1), '#.*$', '')
               AS pathq
      FROM hp),
    c AS (
      SELECT doc_id,
             scheme || '://'
             || CASE WHEN port = ''
                       OR (scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443')
                     THEN host ELSE host || ':' || port END
             || regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
                               '/+$', '')
             || CASE WHEN q = '' THEN '' ELSE '?' || q END
               AS canonical_url
      FROM (
        SELECT *,
               COALESCE(array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(pathq, '\\?(.*)$', 1), '&'),
                 p -> p <> '' AND NOT regexp_matches(
                   p, '^(utm_[^=&]*|fbclid|gclid|ref)(=|$)'))), '&'), '')
                 AS q
        FROM np))
    SELECT canonical_url,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies,
           list_sort(list(doc_id)) AS doc_ids
    FROM c GROUP BY canonical_url HAVING COUNT(*) > 1
"""


def t17_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened domain mixing
    (`operators.text.temperature_mix`): per-source token budgets
    derived from the corpus itself (w_i = sqrt(n_i) renormalized —
    alpha=0.5 as INTEGER sqrt + floor division, so the budget
    derivation is bit-reproducible in any engine), then t15's
    no-global-sort hash-priority greedy against those budgets."""
    from southpaw_spark.operators.text import temperature_mix

    docs = _read(spark, sf_dir, "documents")
    return temperature_mix(
        docs, "text", "doc_id", "source", total_tokens=12000
    ).select("doc_id", "source", "n_tokens")


T17_SQL = """
    WITH tok AS (
      SELECT doc_id, source,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             ('0x' || substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 8)
             )::BIGINT AS pri
      FROM documents),
    tc AS (SELECT source, SUM(n_tokens) AS nt FROM tok GROUP BY 1),
    w AS (SELECT source, CAST(floor(sqrt(nt)) AS BIGINT) AS w FROM tc),
    bud AS (
      SELECT source, (12000 * w) // (SELECT SUM(w) FROM w) AS budget
      FROM w),
    c AS (
      SELECT tok.*, bud.budget,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY tok.source ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum
      FROM tok JOIN bud ON tok.source = bud.source)
    SELECT doc_id, source, n_tokens FROM c WHERE cum < budget
"""


T15_SQL = """
    WITH d AS (
      SELECT doc_id, lang,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             ('0x' || substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 8)
             )::BIGINT AS pri,
             CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 1200
                       WHEN 'fr' THEN 700 END AS budget
      FROM documents),
    c AS (
      SELECT *,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum
      FROM d WHERE budget IS NOT NULL)
    SELECT doc_id, lang, n_tokens FROM c WHERE cum < budget
"""


def d15_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup (round 8,
    `operators.dedup.duplicate_spans`): every merged token interval
    covered by an 8-token gram occurring ≥2 times corpus-wide — the
    Lee et al. (ACL 2022) span-dedup modality document-level dedup
    can't express. Exact (gram strings, not hashes), so the DuckDB
    oracle reproduces the spans bit-for-bit via the same fixed-length
    gaps-and-islands merge."""
    from southpaw_spark.operators.dedup import duplicate_spans

    docs = _read(spark, sf_dir, "documents")
    out = duplicate_spans(docs, "text", "doc_id", k=8)
    spans_repr = F.concat_ws(
        ";",
        F.transform(
            "spans",
            lambda s: F.concat(
                s["start"].cast("string"),
                F.lit("-"),
                s["end"].cast("string"),
            ),
        ),
    )
    return out.select(
        "doc_id", "n_spans", "dup_tokens", "n_tokens",
        spans_repr.alias("spans_repr"),
    )


D15_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(w[i:i+7], ' ') AS gram
      FROM toks,
           unnest(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)),
    dup AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    occ AS (
      SELECT doc_id, pos FROM grams JOIN dup USING (gram)),
    pts AS (
      SELECT doc_id, pos,
             CASE WHEN pos <= COALESCE(
                    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                    -1000000) + 8
                  THEN 0 ELSE 1 END AS brk
      FROM occ),
    isl AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
      FROM pts),
    spans AS (
      SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 8 AS e
      FROM isl GROUP BY doc_id, island)
    SELECT a.doc_id,
           a.n_spans::BIGINT AS n_spans,
           a.dup_tokens::BIGINT AS dup_tokens,
           len(t.w)::BIGINT AS n_tokens,
           a.spans_repr
    FROM (
      SELECT doc_id,
             COUNT(*) AS n_spans,
             SUM(e - s) AS dup_tokens,
             string_agg(s || '-' || e, ';' ORDER BY s) AS spans_repr
      FROM spans GROUP BY doc_id) a
    JOIN toks t USING (doc_id)
"""


def d16_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply d15's spans (`operators.dedup.remove_duplicate_spans`):
    the corpus with every duplicated 8-gram span cut out, hashed so
    the full cleaned text is value-checked without shipping it."""
    from southpaw_spark.operators.dedup import remove_duplicate_spans

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_duplicate_spans(docs, "text", "doc_id", k=8)
    return out.select(
        "doc_id", "n_tokens_before", "n_tokens_after",
        F.md5(F.col("text_clean").cast("binary")).alias("clean_md5"),
    )


D16_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(w[i:i+7], ' ') AS gram
      FROM toks,
           unnest(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)),
    dup AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    occ AS (
      SELECT doc_id, pos FROM grams JOIN dup USING (gram)),
    pts AS (
      SELECT doc_id, pos,
             CASE WHEN pos <= COALESCE(
                    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                    -1000000) + 8
                  THEN 0 ELSE 1 END AS brk
      FROM occ),
    isl AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
      FROM pts),
    spans AS (
      SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 8 AS e
      FROM isl GROUP BY doc_id, island),
    toksi AS (
      SELECT doc_id, i - 1 AS ti, w[i] AS tok
      FROM toks, unnest(generate_series(1, len(w))) AS t(i)),
    kept AS (
      SELECT ti.doc_id, ti.ti, ti.tok
      FROM toksi ti
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = ti.doc_id AND ti.ti >= s.s AND ti.ti < s.e)),
    clean AS (
      SELECT doc_id,
             string_agg(tok, ' ' ORDER BY ti) AS clean_text,
             COUNT(*) AS n_after
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           len(t.w)::BIGINT AS n_tokens_before,
           COALESCE(c.n_after, 0)::BIGINT AS n_tokens_after,
           md5(COALESCE(c.clean_text, '')) AS clean_md5
    FROM toks t LEFT JOIN clean c USING (doc_id)
"""


def m04_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup plumbing (round 8,
    `operators.multimodal.image_near_duplicates`): aHash fingerprints
    through the Arrow mapInPandas decode seam + the d09 banded-Hamming
    equi-join. In this PIL-less sandbox the deterministic fake hash
    runs (first 8 md5 bytes as int64 — avalanche, so the planted
    byte-identical copies pair at hamming 0 and the oracle brute-forces
    bit_count(xor) over the same hashes); with PIL installed the real
    8×8 mean-hash decoder takes the same seam."""
    from southpaw_spark.operators.multimodal import image_near_duplicates

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    copies = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "content"
    )
    corpus = docs.unionByName(copies)
    return image_near_duplicates(corpus, "content", "doc_id", max_hamming=3)


M04_SQL = """
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 16))::UBIGINT AS ah
      FROM base)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.ah, b.ah))::INT AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ah, b.ah)) <= 3
"""


def m05_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit audio energy-delta fingerprint
    (`operators.multimodal.audio_fingerprint`): REAL WAV bytes are
    synthesized per doc from a pure id formula (`synth_wav`), decoded
    through stdlib ``wave``, windowed into 65 exact integer energies,
    and packed into a signed int64 of energy-delta bits. The oracle
    recomputes the fingerprint from the SAME sample formula entirely
    in SQL — no RIFF parsing — so the whole
    encode→decode→window→pack path is engine-checked bit-for-bit
    (all-integer arithmetic; unlike m04 the REAL perceptual path is
    what's oracle-checked, not the byte-identity fake)."""
    from southpaw_spark.operators.multimodal import (
        audio_fingerprint,
        synth_wav,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return audio_fingerprint(synth_wav(docs, "doc_id"), "content", "doc_id")


def _m05_sql() -> str:
    bits = [
        f"CASE WHEN en[{j + 2}] > en[{j + 1}] THEN {1 << j}::BIGINT "
        "ELSE 0 END"
        for j in range(63)
    ]
    bits.append(
        "CASE WHEN en[65] > en[64] THEN -9223372036854775808 ELSE 0 END"
    )
    return f"""
    WITH s AS (
      SELECT doc_id, list_transform(range(0, 1040),
               k -> ((doc_id * 31 + k * 7) % 211) - 105) AS smp
      FROM documents),
    e AS (
      SELECT doc_id, list_transform(range(0, 65),
               w -> list_sum(list_transform(range(0, 16),
                      i -> smp[w * 16 + i + 1] * smp[w * 16 + i + 1])))
               AS en
      FROM s)
    SELECT doc_id, ({' + '.join(bits)}) AS afp FROM e
"""


M05_SQL = _m05_sql()


def m06_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image perceptual hash, engine-checked
    (`operators.multimodal.image_ahash(decoder="stdlib")`): per doc a
    REAL 16×16 grayscale PNG is synthesized from a pure pixel formula
    (`synth_png` — zlib deflate, CRC'd chunks), decoded by the
    pure-stdlib PNG decoder, and aHash'd via exact 2×2 box means.
    The threshold `cell_mean ≥ global_mean` is the integer comparison
    `64·cell_sum ≥ total`, so the oracle recomputes the hash from the
    pixel formula entirely in SQL — no PNG parsing — engine-checking
    the encode→inflate→unfilter→box-mean→pack path bit-for-bit
    (m04's oracle can only reach the byte-identity fake; this row
    covers the real rung)."""
    from southpaw_spark.operators.multimodal import image_ahash, synth_png

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return image_ahash(
        synth_png(docs, "doc_id"), "content", "doc_id", decoder="stdlib"
    )


def _m06_sql() -> str:
    bits = [
        "CASE WHEN 64 * s[1] >= tot THEN -9223372036854775808 ELSE 0 END"
    ]
    bits += [
        f"CASE WHEN 64 * s[{c + 1}] >= tot THEN {1 << (63 - c)}::BIGINT "
        "ELSE 0 END"
        for c in range(1, 64)
    ]
    return f"""
    WITH px AS (
      SELECT doc_id, list_transform(range(0, 256),
               i -> (doc_id * 7 + (i // 16) * 31 + (i % 16) * 13) % 256)
               AS p
      FROM documents),
    cells AS (
      SELECT doc_id, list_sum(p) AS tot,
             list_transform(range(0, 64), k ->
                 p[((k // 8) * 2) * 16 + (k % 8) * 2 + 1]
               + p[((k // 8) * 2) * 16 + (k % 8) * 2 + 2]
               + p[((k // 8) * 2 + 1) * 16 + (k % 8) * 2 + 1]
               + p[((k // 8) * 2 + 1) * 16 + (k % 8) * 2 + 2]) AS s
      FROM px)
    SELECT doc_id, ({' + '.join(bits)}) AS ahash FROM cells
"""


M06_SQL = _m06_sql()


def t20_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (`operators.text.hash_split`):
    every doc gets a split label by thresholding the md5 hash priority
    against exact-integer cumulative-fraction boundaries
    (`floor(cum·2³²)`). Stable under retries/re-partitioning/rebuilds
    (a doc never migrates from test into train), disjoint + exhaustive
    by construction, and engine-exact — the oracle applies the same
    integer thresholds to the same md5 value. Pure codegen projection:
    zero shuffles."""
    from southpaw_spark.operators.text import hash_split

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
        salt="s1",
    )


# Boundaries come from the SAME exact-rational accumulation the
# operator uses (hash_split_bounds) — float-accumulated cum can floor
# one off and silently migrate a hash value across splits.
from southpaw_spark.operators.text import hash_split_bounds as _hsb

_T20_BOUNDS = dict(_hsb({"train": 0.9, "val": 0.05, "test": 0.05}))

T20_SQL = f"""
    SELECT doc_id,
           CASE WHEN pri < {_T20_BOUNDS["train"]} THEN 'train'
                WHEN pri < {_T20_BOUNDS["val"]} THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             ('0x' || substr(md5('s1|' || CAST(doc_id AS VARCHAR)), 1, 8)
             )::BIGINT AS pri
      FROM documents)
"""


def s07_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k via Maximal Marginal Relevance (round 8,
    `operators.similarity.mmr_topk`, Carbonell & Goldstein SIGIR 1998):
    greedy λ·rel − (1−λ)·maxsim over an exact top-10 candidate pool,
    k=3, λ=0.5. All similarities are computed JVM-side and rounded
    before the greedy compares them, so the DuckDB oracle (the greedy
    unrolled as three argmax layers) reproduces every pick."""
    from southpaw_spark.operators.similarity import mmr_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return mmr_topk(emb, q, "embedding", "vec_id", k=3, pool=10)


S07_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
    sims AS (
      SELECT q.query_id, c.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> q.qv[i] * c.cv[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> q.qv[i] * q.qv[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> c.cv[i] * c.cv[i])))) AS cosine
      FROM q CROSS JOIN c WHERE q.query_id <> c.vec_id),
    pool AS (
      SELECT query_id, vec_id AS cid, ROUND(cosine, 6) AS rel
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ROUND(cosine, 8) DESC, vec_id) AS rk FROM sims)
      WHERE rk <= 10),
    pv AS (
      SELECT p.query_id, p.cid, c.cv
      FROM pool p JOIN c ON c.vec_id = p.cid),
    ps AS (
      SELECT x.query_id, x.cid AS id_a, y.cid AS id_b,
             ROUND(
               list_sum(list_transform(range(1, 65),
                 i -> x.cv[i] * y.cv[i]))
               / (sqrt(list_sum(list_transform(range(1, 65),
                    i -> x.cv[i] * x.cv[i])))
                  * sqrt(list_sum(list_transform(range(1, 65),
                      i -> y.cv[i] * y.cv[i])))), 6) AS s
      FROM pv x JOIN pv y
        ON x.query_id = y.query_id AND x.cid <> y.cid),
    s1 AS (
      SELECT query_id, cid, rel, 0.5 * rel AS score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY 0.5 * rel DESC, cid) AS rn FROM pool)
      WHERE rn = 1),
    sc2 AS (
      SELECT p.query_id, p.cid, p.rel,
             0.5 * p.rel - 0.5 * ps.s AS score
      FROM pool p
      JOIN s1 ON s1.query_id = p.query_id AND p.cid <> s1.cid
      JOIN ps ON ps.query_id = p.query_id
             AND ps.id_a = p.cid AND ps.id_b = s1.cid),
    s2 AS (
      SELECT query_id, cid, rel, score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, cid) AS rn FROM sc2)
      WHERE rn = 1),
    sel12 AS (
      SELECT query_id, cid FROM s1
      UNION ALL SELECT query_id, cid FROM s2),
    sc3 AS (
      SELECT p.query_id, p.cid, p.rel,
             0.5 * p.rel - 0.5 * MAX(ps.s) AS score
      FROM pool p
      JOIN sel12 sl ON sl.query_id = p.query_id
      JOIN ps ON ps.query_id = p.query_id
             AND ps.id_a = p.cid AND ps.id_b = sl.cid
      LEFT JOIN sel12 x ON x.query_id = p.query_id AND x.cid = p.cid
      WHERE x.cid IS NULL
      GROUP BY p.query_id, p.cid, p.rel),
    s3 AS (
      SELECT query_id, cid, rel, score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, cid) AS rn FROM sc3)
      WHERE rn = 1)
    SELECT query_id, cid AS neighbor_id, 1::BIGINT AS mmr_rank,
           rel AS cosine, ROUND(score, 7) AS mmr_score FROM s1
    UNION ALL
    SELECT query_id, cid, 2::BIGINT, rel, ROUND(score, 7) FROM s2
    UNION ALL
    SELECT query_id, cid, 3::BIGINT, rel, ROUND(score, 7) FROM s3
"""


def t16_shuffled_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-shuffle shard layout (round 8,
    `operators.text.shuffled_shards`): md5-priority global permutation
    split into 8 shards with dense within-shard positions — the
    reproducible pseudo-random export order SGD training reads.
    n_shards parallel window sorts, never one global ORDER BY."""
    from southpaw_spark.operators.text import shuffled_shards

    docs = _read(spark, sf_dir, "documents")
    return shuffled_shards(docs, "doc_id", 8).select(
        "doc_id", "shard", "pos"
    )


T16_SQL = """
    WITH pri AS (
      SELECT doc_id,
             ('0x' || substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 8)
             )::BIGINT AS p
      FROM documents)
    SELECT doc_id,
           (p % 8)::INT AS shard,
           (ROW_NUMBER() OVER (
              PARTITION BY p % 8 ORDER BY p, doc_id) - 1)::BIGINT AS pos
    FROM pri
"""


def d19_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d17's span decontamination through the Bloom-prefilter path
    (`operators.dedup.bloom_prefilter`): instead of broadcasting the
    full benchmark gram set (tens of bytes per gram), broadcast a
    ~10-bits-per-gram bitmap, probe it with JVM xxhash64 positions +
    one vectorized Arrow batch check, and exact-confirm only the
    surviving ~1% of corpus grams with a (now tiny-left-side) shuffle
    semi-join. The oracle is d17's — the bloom can only ADD candidates
    and the confirm join removes them, so the answer is identical."""
    from southpaw_spark.operators.dedup import span_contamination

    docs = _read(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    out = span_contamination(
        corpus, bench, "text", "doc_id", k=8, prefilter="bloom"
    )
    spans_repr = F.concat_ws(
        ";",
        F.transform(
            "spans",
            lambda s: F.concat(
                s["start"].cast("string"),
                F.lit("-"),
                s["end"].cast("string"),
            ),
        ),
    )
    return out.select(
        "doc_id", "n_spans", "contaminated_tokens", "n_tokens",
        "contamination_frac", spans_repr.alias("spans_repr"),
    )


def d18_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic embedding dedup (round 8,
    `operators.dedup.semantic_duplicates`, the SemDeDup recipe):
    deterministic 16-cell coarse quantizer (vectors of the 16 smallest
    ids), within-cell pairs with cosine ≥ 0.99 → drop the larger id.
    Input: embeddings + a perturbed copy of every 10th vector
    (+0.001/coordinate, id + 1,000,000) so true semantic dups exist at
    every SF; the expected ~2% cluster-boundary miss is part of the
    semantics and the oracle reproduces it bit-for-bit."""
    from southpaw_spark.operators.dedup import semantic_duplicates

    emb = _read(spark, sf_dir, "embeddings")
    copies = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x + F.lit(0.001),
        ).alias("embedding"),
        "label",
    )
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    ).unionByName(copies)
    return semantic_duplicates(
        base, "embedding", "vec_id", threshold=0.99, n_cells=16
    )


D18_SQL = """
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding::DOUBLE[], x -> x + 0.001)
      FROM embeddings WHERE vec_id % 10 = 0),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT * FROM base ORDER BY vec_id LIMIT 16)),
    asg AS (
      SELECT b.vec_id, b.v, c.cell,
             row_number() OVER (
               PARTITION BY b.vec_id
               ORDER BY round(
                 list_sum(list_transform(range(1, 65),
                   i -> b.v[i] * c.v[i]))
                 / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> b.v[i] * b.v[i])))
                    * sqrt(list_sum(list_transform(range(1, 65),
                        i -> c.v[i] * c.v[i])))), 8) DESC,
               c.cell) AS pr
      FROM base b CROSS JOIN cent c),
    a1 AS (SELECT vec_id, v, cell FROM asg WHERE pr = 1),
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.cell,
             list_sum(list_transform(range(1, 65),
               i -> x.v[i] * y.v[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> x.v[i] * x.v[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> y.v[i] * y.v[i])))) AS cosine
      FROM a1 x JOIN a1 y
        ON x.cell = y.cell AND x.vec_id < y.vec_id)
    SELECT id_b AS vec_id, any_value(cell) AS cell,
           MIN(id_a) AS dup_of,
           round(arg_min(cosine, id_a), 6) AS cosine
    FROM pairs WHERE cosine >= 0.99
    GROUP BY id_b
"""


def a09_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide row numbers + percent rank with NO global
    sort (round 8, `operators.skew.global_rank`): TeraSort-style
    sampled range buckets, per-bucket counts prefix-summed on a
    driver-sized frame, window sort only within buckets — output
    pinned identical to the oracle's single ROW_NUMBER() OVER
    (ORDER BY price, key)."""
    from southpaw_spark.operators.skew import global_rank

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    return global_rank(orders, "o_totalprice", "o_orderkey")


A09_SQL = """
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS global_row,
           round((ROW_NUMBER() OVER w - 1)
                 / (COUNT(*) OVER () - 1), 6) AS pct_rank
    FROM orders
    WHERE o_totalprice IS NOT NULL
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
"""


def d17_span_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination (round 8,
    `operators.dedup.span_contamination`): the merged token intervals
    of each corpus doc covered by an 8-gram occurring anywhere in the
    benchmark set (docs with doc_id % 50 == 0 play the benchmark; the
    rest are the corpus) — locating the leak so `cut_spans` can remove
    the passage instead of dropping the doc. Benchmark gram set
    broadcasts; the corpus side never shuffles before the per-doc
    groupBy."""
    from southpaw_spark.operators.dedup import span_contamination

    docs = _read(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    out = span_contamination(corpus, bench, "text", "doc_id", k=8)
    spans_repr = F.concat_ws(
        ";",
        F.transform(
            "spans",
            lambda s: F.concat(
                s["start"].cast("string"),
                F.lit("-"),
                s["end"].cast("string"),
            ),
        ),
    )
    return out.select(
        "doc_id", "n_spans", "contaminated_tokens", "n_tokens",
        "contamination_frac", spans_repr.alias("spans_repr"),
    )


D17_SQL = """
    WITH bench AS (
      SELECT text FROM documents WHERE doc_id % 5 = 0),
    bgrams AS (
      SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS gram
      FROM (SELECT string_split(text, ' ') AS w FROM bench),
           unnest(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE doc_id % 5 <> 0),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(w[i:i+7], ' ') AS gram
      FROM toks,
           unnest(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)),
    occ AS (
      SELECT doc_id, pos FROM grams
      WHERE gram IN (SELECT gram FROM bgrams)),
    pts AS (
      SELECT doc_id, pos,
             CASE WHEN pos <= COALESCE(
                    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                    -1000000) + 8
                  THEN 0 ELSE 1 END AS brk
      FROM occ),
    isl AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
      FROM pts),
    spans AS (
      SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 8 AS e
      FROM isl GROUP BY doc_id, island)
    SELECT a.doc_id,
           a.n_spans::BIGINT AS n_spans,
           a.contaminated_tokens::BIGINT AS contaminated_tokens,
           len(t.w)::BIGINT AS n_tokens,
           round(a.contaminated_tokens / len(t.w), 6)
             AS contamination_frac,
           a.spans_repr
    FROM (
      SELECT doc_id,
             COUNT(*) AS n_spans,
             SUM(e - s) AS contaminated_tokens,
             string_agg(s || '-' || e, ';' ORDER BY s) AS spans_repr
      FROM spans GROUP BY doc_id) a
    JOIN toks t USING (doc_id)
"""


def s08_ivf_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB retrieval shape (round 9,
    `operators.similarity.ivf_quantized_topk`): IVF cells over int8
    codes with exact rescore — s03's coarse cells confine each query to
    n_probe=2 inverted lists, the candidate scan runs over s06's
    scale-free quantized codes (¼ bandwidth, exact integer arithmetic),
    and the final ranking is an exact float rescore of the k·4
    shortlist. Centroids pinned to the 8 smallest vec_ids (the d18
    deterministic-quantizer discipline) so DuckDB reproduces
    assignment, probing, quantization, the coarse shortlist, and the
    rescore bit-for-bit; the k-means production path is recall-gated in
    tests and BASELINE §19."""
    from southpaw_spark.operators.similarity import ivf_quantized_topk

    emb = _read(spark, sf_dir, "embeddings")
    cents = (
        emb.orderBy("vec_id").limit(8)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cell"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    return ivf_quantized_topk(
        emb, queries, "embedding", "vec_id",
        k=3, n_probe=2, centroids=cents, oversample=4,
    )


S08_SQL = """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
      FROM (SELECT * FROM base ORDER BY vec_id LIMIT 8)),
    asg AS (
      SELECT b.vec_id, c.cell,
             row_number() OVER (
               PARTITION BY b.vec_id
               ORDER BY round(
                 list_sum(list_transform(range(1, 65), i -> b.v[i] * c.cv[i]))
                 / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> b.v[i] * b.v[i])))
                    * sqrt(list_sum(list_transform(range(1, 65),
                        i -> c.cv[i] * c.cv[i])))), 8) DESC,
               c.cell) AS pr
      FROM base b CROSS JOIN cent c),
    a1 AS (SELECT vec_id, cell FROM asg WHERE pr = 1),
    scaled AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
      FROM base),
    codes AS (
      SELECT vec_id,
             CASE WHEN s = 0 THEN list_transform(v, x -> 0.0)
                  ELSE list_transform(v, x -> round(x / s, 0)) END AS c
      FROM scaled),
    q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, c.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(
                   list_sum(list_transform(range(1, 65),
                     i -> q.qv[i] * c.cv[i]))
                   / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> q.qv[i] * q.qv[i])))
                      * sqrt(list_sum(list_transform(range(1, 65),
                          i -> c.cv[i] * c.cv[i])))), 8) DESC,
                 c.cell) AS pr
        FROM q CROSS JOIN cent c) WHERE pr <= 2),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65), i -> qc.c[i] * nc.c[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> qc.c[i] * qc.c[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> nc.c[i] * nc.c[i])))) AS qcos
      FROM probes p
      JOIN a1 a ON a.cell = p.cell
      JOIN codes nc ON nc.vec_id = a.vec_id
      JOIN codes qc ON qc.vec_id = p.query_id
      WHERE p.query_id <> a.vec_id),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY round(qcos, 8) DESC, neighbor_id) AS rk
        FROM cand) WHERE rk <= 12),
    rescored AS (
      SELECT s.query_id, s.neighbor_id,
             list_sum(list_transform(range(1, 65), i -> q.qv[i] * b.v[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> q.qv[i] * q.qv[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> b.v[i] * b.v[i])))) AS cosine
      FROM short s JOIN q USING (query_id)
      JOIN base b ON b.vec_id = s.neighbor_id)
    SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY round(cosine, 8) DESC, neighbor_id) AS rank
      FROM rescored) WHERE rank <= 3
"""


def t19_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (`operators.text.clean_lines`):
    drop lines without terminal punctuation, with fewer than 3 words,
    containing curly braces, or matching the boilerplate blacklist
    (javascript / cookie policy / …), then rejoin survivors and drop
    docs left empty. Multi-line docs are synthesized deterministically
    from the single-line testdata text (two prose lines that must
    survive + four boilerplate lines that must not), the same
    synthesize-then-operate pattern as t18's URLs. Pure per-row
    codegen (split → filter → array_join): zero shuffles at any
    scale."""
    from southpaw_spark.operators.text import clean_lines

    docs = _read(spark, sf_dir, "documents")
    nl = F.lit("\n")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 80), F.lit("."), nl,
            F.lit("Enable javascript to view this page."), nl,
            F.substring("text", 81, 60), nl,
            F.lit("We use a cookie policy here."), nl,
            F.lit("ok."), nl,
            F.substring("text", 141, 80), F.lit(" end of section!"),
        ).alias("text"),
    )
    out = clean_lines(synth, "text", min_words=3, min_lines_kept=1)
    return out.select(
        "doc_id",
        "text",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
    )


T19_SQL = """
    WITH synth AS (
      SELECT doc_id,
             substr(text, 1, 80) || '.' || chr(10)
             || 'Enable javascript to view this page.' || chr(10)
             || substr(text, 81, 60) || chr(10)
             || 'We use a cookie policy here.' || chr(10)
             || 'ok.' || chr(10)
             || substr(text, 141, 80) || ' end of section!' AS text
      FROM documents),
    split_lines AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM synth),
    k AS (
      SELECT doc_id, len(ls) AS n_lines,
             list_filter(ls, l ->
               regexp_matches(trim(l), '[.!?"]$')
               AND len(list_filter(string_split(trim(l), ' '),
                                   w -> w <> '')) >= 3
               AND NOT contains(trim(l), '{')
               AND NOT contains(trim(l), '}')
               AND NOT regexp_matches(lower(trim(l)),
                 'lorem ipsum|javascript|cookie policy|privacy policy|terms of use')
             ) AS kept
      FROM split_lines)
    SELECT doc_id,
           array_to_string(kept, chr(10)) AS text,
           n_lines,
           len(kept) AS n_lines_kept
    FROM k WHERE len(kept) >= 1
"""


#: Pinned mini-vocab for t21: 16 merges trained ONCE with
#: ``operators.bpe.bpe_train(documents @ sf0.01, n_merges=16)`` and
#: frozen as a literal, so the Spark encoder and the DuckDB replay
#: share one vocabulary at every SF. Well-formed by construction
#: (every merge's constituent tokens predate it in rank order), which
#: is exactly what makes sequential rank-order replay equal to the
#: encoder's lowest-rank-pair loop (operators/bpe.py module doc).
T21_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"),
)


def t21_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real vocab-driven BPE tokenization (`operators.bpe.bpe_encode`,
    Sennrich 2016): encode every document against the pinned 16-merge
    mini-vocab and count REAL tokens — the production replacement for
    the regex token-count approximation (t05) that drives packing/
    budgets/mixing. The oracle replays the merge sequence from first
    principles in SQL: word → space-joined chars → each merge in rank
    order as left-to-right non-overlapping string replacement (applied
    to fixpoint), then split back to tokens — engine-exact, so the
    Pandas-UDF encode loop is value-checked, not just plumbed. Spark
    plan: one Arrow-batched projection, zero shuffles.

    The token sequence is declared as its space-join (``bpe_text``):
    no BPE token can contain a space (the pre-tokenizer's classes are
    ``[a-zA-Z]+``/``[0-9]+``/single non-alnum-non-space chars and
    merges only concatenate), so the join is injective and checks
    exactly the same computation — while staying canonicalizable by
    the driver gate's pandas ``sort_values`` pass, which cannot hash
    an ``array<string>`` cell (round-15 verdict item 1)."""
    from southpaw_spark.operators.bpe import bpe_encode

    docs = _read(spark, sf_dir, "documents")
    return bpe_encode(docs, "text", T21_MERGES).select(
        "doc_id",
        F.array_join("bpe_tokens", " ").alias("bpe_text"),
        "n_tokens_bpe",
    )


def _t21_sql() -> str:
    """Generate the DuckDB merge replay: 4 replace passes per merge in
    rank order (4 ≥ ceil(log2(k+1)) for any shared-delimiter match
    chain k a ≤16-char word can hold, so each merge reaches its
    fixpoint — pass 1 can miss adjacent matches that share a space
    delimiter; see operators/bpe.py)."""
    expr = "' ' || array_to_string(string_split(w, ''), ' ') || ' '"
    for a, b in T21_MERGES:
        for _ in range(4):
            expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    return f"""
    WITH words AS (
      SELECT doc_id,
             regexp_extract_all(
               text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]') AS ws
      FROM documents),
    enc AS (
      SELECT doc_id,
             flatten(list_transform(ws,
               w -> string_split(trim({expr}), ' '))) AS bpe_tokens
      FROM words)
    SELECT doc_id,
           array_to_string(bpe_tokens, ' ') AS bpe_text,
           len(bpe_tokens)::BIGINT AS n_tokens_bpe
    FROM enc
"""


T21_SQL = _t21_sql()


#: Pinned t22 model: 64 hashed features, weights from a fixed formula
#: (deterministic — the oracle inlines the same micro-unit integers),
#: the fastText-style linear quality gate of
#: `operators.text.score_with_linear_model`.
T22_WEIGHTS = [((i * 37) % 201 - 100) / 100.0 for i in range(64)]
T22_BIAS = 0.05


def t22_model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-classifier quality scoring
    (`operators.text.score_with_linear_model`, Joulin et al. 2016
    fastText family): hashed bag-of-words (md5-bucketed ``[a-z0-9]+``
    runs of lower(text), 64 features) × a pinned weight vector; the
    score is the mean token weight + bias. Exact integer micro-unit
    accounting makes the sum associative, so the DuckDB oracle
    reproduces every double bit-for-bit with no rounding. Spark plan:
    codegen explode → map-side partial sum (one row/doc before the
    exchange) → join back."""
    from southpaw_spark.operators.text import score_with_linear_model

    docs = _read(spark, sf_dir, "documents")
    return score_with_linear_model(
        docs, "text", "doc_id", T22_WEIGHTS, T22_BIAS
    ).select("doc_id", "model_score")


def _t22_sql() -> str:
    wm = [int(round(w * 1_000_000)) for w in T22_WEIGHTS]
    bias_micro = int(round(T22_BIAS * 1_000_000))
    arr = "[" + ", ".join(str(x) for x in wm) + "]"
    return f"""
    WITH toks AS (
      SELECT doc_id, u.t
      FROM documents,
           UNNEST(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> x <> '')) AS u(t)),
    s AS (
      SELECT doc_id,
             SUM({arr}[
               (('0x' || substr(md5(t), 1, 8))::BIGINT % 64) + 1
             ]) AS num,
             COUNT(*) AS n
      FROM toks GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN s.n IS NULL
                THEN {bias_micro}::DOUBLE / 1000000::DOUBLE
                ELSE (s.num + {bias_micro} * s.n)::DOUBLE
                     / (s.n * 1000000)::DOUBLE
           END AS model_score
    FROM documents d LEFT JOIN s USING (doc_id)
    """


T22_SQL = _t22_sql()


def d20_embedding_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-space decontamination
    (`operators.dedup.embedding_contamination`): flag corpus vectors
    whose max cosine against ANY benchmark vector ≥ 0.99 — the
    semantic sibling of d17/d19 (paraphrased eval leaks survive n-gram
    checks but not embedding cosine). Benchmark: every 10th vector,
    perturbed +0.001/coordinate, id + 1,000,000 — so every 10th corpus
    row is a planted leak. One Arrow mapInPandas pass (gemm shortlist,
    bit-exact cumsum rescore ≡ the SQL fold), zero shuffles; the
    oracle recomputes the full N×B argmax cross join."""
    from southpaw_spark.operators.dedup import embedding_contamination

    emb = _read(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bench = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x + F.lit(0.001),
        ).alias("embedding"),
    )
    return embedding_contamination(
        corpus, bench, "embedding", "vec_id", threshold=0.99
    )


D20_SQL = """
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bench AS (
      SELECT vec_id + 1000000 AS bench_id,
             list_transform(embedding::DOUBLE[], x -> x + 0.001) AS bv
      FROM embeddings WHERE vec_id % 10 = 0),
    pairs AS (
      SELECT c.vec_id, b.bench_id,
             list_sum(list_transform(range(1, 65),
               i -> c.v[i] * b.bv[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> c.v[i] * c.v[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> b.bv[i] * b.bv[i])))) AS cosine
      FROM corpus c CROSS JOIN bench b),
    ranked AS (
      SELECT vec_id, bench_id, cosine,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY cosine DESC, bench_id) AS pr
      FROM pairs)
    SELECT vec_id, bench_id, round(cosine, 6) AS cosine
    FROM ranked WHERE pr = 1 AND cosine >= 0.99
"""


def a11_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (`operators.skew.cohort_retention`):
    users cohorted by first active DAY, cells = distinct active users
    at each day offset, with retention rate vs cohort size. One
    groupBy(user) pass (min day + collect_set of active days — bounded
    by the calendar), explode, one combiner groupBy((cohort, offset));
    cohort size spread by a window over the tiny aggregate. The rate
    is one IEEE division of exact integers, rounded 6 — engine-exact."""
    from southpaw_spark.operators.skew import cohort_retention

    raw = _read(spark, sf_dir, "events")
    ev = raw.select(
        "user_id",
        F.floor(_events_ts_us(raw) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day"),
    )
    return cohort_retention(ev, "user_id", "day")


A11_SQL = """
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
      FROM events),
    firsts AS (
      SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id),
    cells AS (
      SELECT f.cohort, u.day - f.cohort AS "offset",
             COUNT(*) AS n_active
      FROM ud u JOIN firsts f USING (user_id)
      GROUP BY f.cohort, u.day - f.cohort),
    sized AS (
      SELECT cohort,
             MAX(CASE WHEN "offset" = 0 THEN n_active END) AS cohort_size
      FROM cells GROUP BY cohort)
    SELECT c.cohort, c."offset", c.n_active, s.cohort_size,
           round(c.n_active / CAST(s.cohort_size AS DOUBLE), 6)
             AS retention_rate
    FROM cells c JOIN sized s USING (cohort)
"""


def m07_video_frame_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampled perceptual hashes, engine-checked
    (`operators.multimodal.video_frame_hashes` over `synth_video`):
    per doc a REAL container of 8 PNG frames (SVID length-prefixed
    layout, frames from the (id, frame) pixel formula), every 2nd
    frame sampled, stdlib-decoded, and aHash'd via exact 2x2 box
    means. The oracle recomputes each sampled frame's hash from the
    pixel formula entirely in SQL (the m05/m06 discipline) — the
    container parse -> frame sample -> PNG decode -> box-mean -> pack
    path is engine-checked bit-for-bit. Completes the modality quartet
    (image m04/m06, audio m05, video m07)."""
    from southpaw_spark.operators.multimodal import (
        synth_video,
        video_frame_hashes,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return video_frame_hashes(
        synth_video(docs, "doc_id", n_frames=8), "content", "doc_id",
        frame_stride=2,
    )


def _m07_sql() -> str:
    bits = [
        "CASE WHEN 64 * s[1] >= tot THEN -9223372036854775808 ELSE 0 END"
    ]
    bits += [
        f"CASE WHEN 64 * s[{c + 1}] >= tot THEN {1 << (63 - c)}::BIGINT "
        "ELSE 0 END"
        for c in range(1, 64)
    ]
    return f"""
    WITH frames AS (
      SELECT doc_id, f.f AS frame_idx
      FROM documents, (SELECT unnest([0, 2, 4, 6]) AS f) f),
    px AS (
      SELECT doc_id, frame_idx, list_transform(range(0, 256),
               i -> (doc_id * 7 + frame_idx * 101
                     + (i // 16) * 31 + (i % 16) * 13) % 256) AS p
      FROM frames),
    cells AS (
      SELECT doc_id, frame_idx, list_sum(p) AS tot,
             list_transform(range(0, 64), k ->
                 p[((k // 8) * 2) * 16 + (k % 8) * 2 + 1]
               + p[((k // 8) * 2) * 16 + (k % 8) * 2 + 2]
               + p[((k // 8) * 2 + 1) * 16 + (k % 8) * 2 + 1]
               + p[((k // 8) * 2 + 1) * 16 + (k % 8) * 2 + 2]) AS s
      FROM px)
    SELECT doc_id, frame_idx, ({' + '.join(bits)}) AS ahash FROM cells
"""


M07_SQL = _m07_sql()


def e13_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel (`operators.temporal.funnel`): users who
    viewed, then clicked strictly after their first view, then
    purchased after that click — the product-analytics staple. One
    per-user shuffle (first step-1 time + sorted per-step timestamp
    arrays), per-user array search for the later steps, one global
    count exploded into the 3 step rows; rates are one IEEE division
    of exact counts, rounded 6."""
    from southpaw_spark.operators.temporal import funnel

    raw = _read(spark, sf_dir, "events")
    ev = raw.select(
        "user_id", "event_type", _events_ts_us(raw).alias("ts_us")
    )
    return funnel(
        ev, "user_id", "event_type", "ts_us",
        ["view", "click", "purchase"],
    )


E13_SQL = """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    u1 AS (
      SELECT user_id, MIN(ts_us) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id),
    u2 AS (
      SELECT e.user_id, MIN(e.ts_us) AS t2
      FROM e JOIN u1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts_us > u1.t1
      GROUP BY e.user_id),
    u3 AS (
      SELECT e.user_id, MIN(e.ts_us) AS t3
      FROM e JOIN u2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts_us > u2.t2
      GROUP BY e.user_id),
    c AS (
      SELECT (SELECT count(*) FROM u1) AS n1,
             (SELECT count(*) FROM u2) AS n2,
             (SELECT count(*) FROM u3) AS n3)
    SELECT 1 AS step, 'view' AS step_name, n1 AS n_users,
           round(n1 / CAST(n1 AS DOUBLE), 6) AS conversion_rate FROM c
    UNION ALL
    SELECT 2, 'click', n2, round(n2 / CAST(n1 AS DOUBLE), 6) FROM c
    UNION ALL
    SELECT 3, 'purchase', n3, round(n3 / CAST(n1 AS DOUBLE), 6) FROM c
"""


def e14_rolling_active_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per observed day
    (`operators.skew.rolling_active_users`): distinct (user, day) →
    bounded ×7 fan-out via sequence+explode → distinct → combiner
    counts; observed-day semi-join keeps the calendar honest. Exact —
    no approximate sketches — and linear with a ×window fan-out where
    the naive day×activity range join is quadratic in the calendar."""
    from southpaw_spark.operators.skew import rolling_active_users

    raw = _read(spark, sf_dir, "events")
    ev = raw.select(
        "user_id",
        F.floor(_events_ts_us(raw) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day"),
    )
    return rolling_active_users(ev, "user_id", "day", window=7)


E14_SQL = """
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
      FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    wau AS (
      SELECT d.day AS period, count(DISTINCT u.user_id) AS rolling_active
      FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day),
    dau AS (SELECT day AS period, count(*) AS dau FROM ud GROUP BY day)
    SELECT dau.period, dau.dau, wau.rolling_active,
           round(dau.dau / CAST(wau.rolling_active AS DOUBLE), 6)
             AS stickiness
    FROM dau JOIN wau USING (period)
"""


def s09_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (`operators.similarity.pq_topk`, Jégou
    2011): 4 subspaces × 16 codewords (the subvectors of the 16
    smallest vec_ids — the deterministic-quantizer discipline), ADC
    candidate scan, exact-cosine rescore of the k·4 shortlist. The
    oracle reproduces codebook derivation, per-subspace encoding
    (round-8 argmin, ties → smallest code), the ascending-m ADC sum,
    the shortlist, and the rescore bit-for-bit."""
    from southpaw_spark.operators.similarity import pq_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    return pq_topk(
        emb, queries, "embedding", "vec_id",
        k=3, m_subspaces=4, n_codes=16, oversample=4,
    )


S09_SQL = """
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
      FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 16)),
    ms AS (SELECT unnest([0, 1, 2, 3]) AS m),
    enc AS (
      SELECT c.vec_id, ms.m, cb.code,
             row_number() OVER (
               PARTITION BY c.vec_id, ms.m
               ORDER BY round(list_sum(list_transform(range(1, 17),
                 i -> (c.v[ms.m * 16 + i] - cb.v[ms.m * 16 + i])
                    * (c.v[ms.m * 16 + i] - cb.v[ms.m * 16 + i]))), 8),
                 cb.code) AS pr
      FROM corpus c CROSS JOIN ms CROSS JOIN cb),
    codes AS (SELECT vec_id, m, code FROM enc WHERE pr = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM corpus
          WHERE vec_id < 5),
    qtable AS (
      SELECT q.query_id, ms.m, cb.code,
             list_sum(list_transform(range(1, 17),
               i -> (q.qv[ms.m * 16 + i] - cb.v[ms.m * 16 + i])
                  * (q.qv[ms.m * 16 + i] - cb.v[ms.m * 16 + i]))) AS qd
      FROM q CROSS JOIN ms CROSS JOIN cb),
    adc AS (
      SELECT t.query_id, c.vec_id AS neighbor_id,
             list_sum(list(t.qd ORDER BY t.m)) AS adc
      FROM codes c JOIN qtable t USING (m, code)
      WHERE t.query_id <> c.vec_id
      GROUP BY t.query_id, c.vec_id),
    short AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(adc, 8), neighbor_id) AS r
      FROM adc),
    resc AS (
      SELECT s.query_id, s.neighbor_id,
             list_sum(list_transform(range(1, 65),
               i -> q.qv[i] * c.v[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> q.qv[i] * q.qv[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> c.v[i] * c.v[i])))) AS cosine
      FROM short s
      JOIN q USING (query_id)
      JOIN corpus c ON c.vec_id = s.neighbor_id
      WHERE s.r <= 12),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(cosine, 8) DESC, neighbor_id) AS rank
      FROM resc)
    SELECT query_id, neighbor_id, rank,
           round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 3
"""


def d21_jaccard_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fuzzy decontamination
    (`operators.dedup.jaccard_contamination`): corpus docs whose
    3-gram-set Jaccard against SOME benchmark item ≥ 0.5 — EDITED
    copies of eval items that break exact n-gram containment (d17) but
    keep most shingles. Benchmark: every 20th doc's text with its
    first two words dropped (a light edit), id + 1,000,000 — planted
    fuzzy leaks at every SF. Benchmark shingles broadcast; one hash
    join; Jaccard = one division of exact integers (best match by
    round-8 Jaccard, ties → smallest bench id)."""
    from southpaw_spark.operators.dedup import jaccard_contamination

    docs = _read(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(
                F.split(F.col("text"), " "),
                3,
                F.greatest(F.size(F.split(F.col("text"), " ")) - 2,
                           F.lit(0)),
            ),
            " ",
        ).alias("text"),
    )
    return jaccard_contamination(
        docs, bench, "text", "doc_id", n=3, threshold=0.5
    )


D21_SQL = """
    WITH ctoks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    csh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(w) - 2),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
      FROM ctoks WHERE len(w) >= 3),
    btoks AS (
      SELECT doc_id + 1000000 AS bench_id,
             w[3:len(w)] AS w
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE doc_id % 20 = 0)),
    bsh AS (
      SELECT bench_id,
             list_distinct(list_transform(generate_series(1, len(w) - 2),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
      FROM btoks WHERE len(w) >= 3),
    cex AS (SELECT doc_id, unnest(shingles) AS s FROM csh),
    bex AS (SELECT bench_id, unnest(shingles) AS s FROM bsh),
    inter AS (
      SELECT c.doc_id, b.bench_id, COUNT(*) AS shared
      FROM cex c JOIN bex b ON c.s = b.s
      GROUP BY c.doc_id, b.bench_id),
    scored AS (
      SELECT i.doc_id, i.bench_id,
             i.shared::DOUBLE
               / (len(ca.shingles) + len(bb.shingles) - i.shared) AS j
      FROM inter i
      JOIN csh ca ON ca.doc_id = i.doc_id
      JOIN bsh bb ON bb.bench_id = i.bench_id
      WHERE i.shared::DOUBLE
              / (len(ca.shingles) + len(bb.shingles) - i.shared) >= 0.5),
    ranked AS (
      SELECT doc_id, bench_id, round(j, 8) AS j8,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(j, 8) DESC, bench_id) AS pr
      FROM scored)
    SELECT doc_id, bench_id, round(j8, 6) AS jaccard
    FROM ranked WHERE pr = 1
"""


def a12_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-price quantiles WITHOUT a global sort
    (`operators.skew.exact_quantiles`): the value at rank
    max(1, ceil(q·N)) via the a09 range-bucket machinery — exact where
    `approx_percentile` has error bounds, no single-task sort where
    the naive percentile does. The oracle recomputes ranks with one
    ROW_NUMBER and the identical ceil-rank rule."""
    from southpaw_spark.operators.skew import exact_quantiles

    orders = _read(spark, sf_dir, "orders")
    return exact_quantiles(
        orders, "o_totalprice", [0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    )


A12_SQL = """
    WITH ranked AS (
      SELECT o_totalprice AS v,
             row_number() OVER (ORDER BY o_totalprice) AS rn,
             count(*) OVER () AS n
      FROM orders WHERE o_totalprice IS NOT NULL),
    qs AS (
      SELECT unnest([0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]) AS q)
    SELECT CAST(qs.q AS DOUBLE) AS q, r.v AS value
    FROM qs JOIN ranked r
      ON r.rn = greatest(1, CAST(ceil(qs.q * r.n) AS BIGINT))
"""


def d22_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global repeated-LINE removal (d22,
    `operators.dedup.remove_duplicate_lines` — RefinedWeb's
    boilerplate-line stage, Penedo et al. 2023): every line occurring
    ≥ 2 times corpus-wide is cut from EVERY document that carries it.
    The testdata corpus is single-line, so the row first reflows each
    doc into 8-token lines (deterministic chunking, expressed
    identically in both engines) — at sf0.01 that yields 153
    duplicated lines touching 93 of 500 docs. Output carries the full
    rewritten text so the hash pins the rewrite, not just the
    counts."""
    from southpaw_spark.operators.dedup import remove_duplicate_lines

    docs = _read(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    nc = F.ceil(F.size(w) / F.lit(8.0)).cast("int")
    reflow = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(0), nc - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(w, i * F.lit(8) + 1, 8)
                ),
            ),
        ).alias("text"),
    )
    return remove_duplicate_lines(reflow, "text", "doc_id").select(
        "doc_id", "n_lines_before", "n_lines_after", "n_tokens_after",
        "text_clean",
    )


D22_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ref AS (
      SELECT doc_id,
             list_transform(
               range((len(w) + 7) // 8),
               i -> array_to_string(w[(i*8+1):(i*8+8)], ' ')) AS ls
      FROM toks),
    occ AS (
      SELECT doc_id, i AS pos, ls[i + 1] AS line
      FROM ref, UNNEST(range(len(ls))) AS r(i)),
    dup AS (
      SELECT line FROM occ WHERE line <> ''
      GROUP BY line HAVING count(*) >= 2),
    clean AS (
      SELECT doc_id,
             string_agg(line, chr(10) ORDER BY pos) AS text_clean,
             count(*) AS n_after
      FROM occ WHERE line NOT IN (SELECT line FROM dup)
      GROUP BY doc_id)
    SELECT r.doc_id,
           len(r.ls) AS n_lines_before,
           COALESCE(c.n_after, 0) AS n_lines_after,
           CASE WHEN COALESCE(c.text_clean, '') = '' THEN 0
                ELSE len(string_split(c.text_clean, ' ')) END
             AS n_tokens_after,
           COALESCE(c.text_clean, '') AS text_clean
    FROM ref r LEFT JOIN clean c USING (doc_id)
"""


def t24_blocklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain blocklist gate (t24,
    `operators.text.blocklist_hits` — the C4 / RefinedWeb bad-domain
    filter; Penedo et al. 2023 run the public UT1 blacklist): each doc
    gets a synthesized URL in one of three host shapes (exact host,
    cdn. subdomain with a port, WWW.-cased .net host) and is matched
    against a two-domain blocklist through the dot-suffix chain — so
    the row exercises exact-host hits, subdomain hits, port stripping
    and case folding in one hash."""
    from southpaw_spark.operators.text import blocklist_hits

    docs = _read(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 10).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://site"), k, F.lit(".example.com/p")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("http://cdn.site"), k, F.lit(".example.com:8080/a")
            ),
        )
        .otherwise(
            F.concat(F.lit("https://WWW.site"), k, F.lit(".Example.net/x"))
        )
    )
    urls = docs.select("doc_id", url.alias("url"))
    return blocklist_hits(
        urls, "url", "doc_id", ["site3.example.com", "example.net"]
    )


T24_SQL = """
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN 'https://site' || k || '.example.com/p'
               WHEN 1 THEN 'http://cdn.site' || k
                    || '.example.com:8080/a'
               ELSE 'https://WWW.site' || k || '.Example.net/x'
             END AS url
      FROM (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS k
            FROM documents)),
    h AS (
      SELECT doc_id,
             regexp_replace(
               lower(regexp_extract(
                 regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                 '^([^/?#]*)', 1)),
               ':[0-9]+$', '') AS host
      FROM u),
    s AS (
      SELECT doc_id, host,
             UNNEST(list_transform(
               range(len(parts)),
               i -> array_to_string(parts[(i+1):len(parts)], '.'))) AS sfx
      FROM (SELECT doc_id, host, string_split(host, '.') AS parts
            FROM h)),
    b AS (SELECT UNNEST(['site3.example.com', 'example.net'])
            AS matched_domain)
    SELECT DISTINCT doc_id, host, matched_domain
    FROM s JOIN b ON s.sfx = b.matched_domain
"""


def t23_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-domain perplexity stratification (t23,
    `operators.text.perplexity_buckets` — Wenzek et al. 2020): the
    corpus-trained bigram-LM score (t13) ranked WITHIN each source
    domain, split head/middle/tail at the 1/3 and 2/3 ceil-ranks.
    The oracle replays the t13 LM from first principles, then the
    identical rank/ceil bucketing in SQL — so the hash pins both the
    scores and every bucket edge."""
    from southpaw_spark.operators.text import perplexity_buckets

    docs = _read(spark, sf_dir, "documents")
    return perplexity_buckets(docs, "text", "doc_id", "source")


T23_SQL = f"""
    WITH sc AS ({T13_SQL}),
    dj AS (
      SELECT d.doc_id, d.source, sc.n_bigrams, sc.avg_logprob
      FROM documents d JOIN sc ON d.doc_id = sc.doc_id),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY avg_logprob DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM dj)
    SELECT doc_id, source, n_bigrams, avg_logprob,
           CASE WHEN rn <= CEIL({1 / 3!r} * n) THEN 'head'
                WHEN rn <= CEIL({2 / 3!r} * n) THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM r
"""


def t25_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized training sequences (t25,
    `operators.text.pack_sequences`): the t09 pack assignments turned
    into the literal examples a training loader streams — per
    (lang, pack_id), member docs concatenated in id order with an
    ``<eos>`` sentinel (Raffel et al. 2020 §2.2 packing). The hash
    pins the full concatenated text of every pack, so member order,
    boundaries and separators are all checked. One shuffle total: the
    (shard, pack_id) group-by reuses the window's shard
    partitioning."""
    from southpaw_spark.operators.text import pack_sequences

    docs = _read(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "text", "doc_id", "lang", token_budget=512,
    )


T25_SQL = """
    WITH p AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             FLOOR(COALESCE(SUM(len(string_split(text, ' ')))
                     OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING),
                   0) / 512)::BIGINT AS pack_id
      FROM documents)
    SELECT lang, pack_id,
           COUNT(*) AS n_docs,
           SUM(n_tokens)::BIGINT AS n_tokens,
           string_agg(text, '<eos>' ORDER BY doc_id) AS text
    FROM p GROUP BY lang, pack_id
"""


def t26_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch upsampling (t26,
    `operators.text.epoch_repeat` — GPT-3 / Gopher per-source epoch
    weighting): en ×2.5, fr ×0.5, everything else ×1 — exercising
    guaranteed copies, the fractional extra-copy hash threshold, AND
    sub-1 downsampling in one hash. The oracle replays the md5
    priority and the exact integer thresholds (epoch_repeat_plan is
    shared, so operator and oracle cannot drift)."""
    from southpaw_spark.operators.text import epoch_repeat

    docs = _read(spark, sf_dir, "documents")
    return epoch_repeat(
        docs, "doc_id", "lang", {"en": 2.5, "fr": 0.5}, salt="er"
    ).select("doc_id", "lang", "copy_idx")


def _t26_sql() -> str:
    from southpaw_spark.operators.text import epoch_repeat_plan

    plan = epoch_repeat_plan({"en": 2.5, "fr": 0.5}, 1.0)
    arms = " ".join(
        f"WHEN lang = '{name}' THEN {base} + "
        f"(CASE WHEN pri < {thr} THEN 1 ELSE 0 END)"
        for name, (base, thr) in plan.items() if name is not None
    )
    dbase, dthr = plan[None]
    return f"""
    WITH h AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('er|' || CAST(doc_id AS VARCHAR)), 1, 8)
             )::BIGINT AS pri
      FROM documents),
    n AS (
      SELECT doc_id, lang,
             CASE {arms}
                  ELSE {dbase} + (CASE WHEN pri < {dthr} THEN 1 ELSE 0 END)
             END AS n_copies
      FROM h)
    SELECT doc_id, lang, CAST(i AS INTEGER) AS copy_idx
    FROM n, UNNEST(range(n_copies)) AS r(i)
    """


T26_SQL = _t26_sql()


def t27_reference_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-trained LM scoring (t27,
    `operators.text.bigram_lm_scores(reference=...)`) — the full CCNet
    recipe (Wenzek et al. 2020): the bigram LM trains on a CLEAN
    reference corpus (here the en subset) and scores EVERY document;
    bigrams/contexts unseen in the reference take the add-one floor,
    so out-of-domain text scores low instead of erroring. The oracle
    replays the reference counts and the left-join floor in SQL."""
    from southpaw_spark.operators.text import bigram_lm_scores

    docs = _read(spark, sf_dir, "documents")
    return bigram_lm_scores(
        docs, "text", "doc_id", reference=docs.where(F.col("lang") == "en")
    )


#: t28 pinned per-language models (the t22 pinning discipline: formula
#: weights, engine-exact integer accounting — the synthetic corpus has
#: no real language signal, so the row demonstrates the INFERENCE
#: machinery; the trainer is pytest-covered on a separable corpus)
T28_MODELS = {
    lang: [(((i * s) % 211) - 105) / 100.0 for i in range(64)]
    for lang, s in (("de", 29), ("en", 37), ("fr", 41))
}
T28_BIASES = {"de": 0.01, "en": 0.05, "fr": 0.02}


def t28_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained language ID (t28,
    `operators.text.classify_language`) — CCNet stage 1 (Wenzek et al.
    2020): per-language hashed-BoW linear models (t22's machinery, one
    weight vector per language), label = argmax of the per-language
    score. The argmax compares int64 micro-unit numerators (shared
    positive denominator), so the oracle replays every comparison
    exactly: per-language SUMs + a GREATEST CASE chain whose tie
    semantics (lexicographically smallest language) mirror the Spark
    fold."""
    from southpaw_spark.operators.text import classify_language

    docs = _read(spark, sf_dir, "documents")
    return classify_language(
        docs, "text", "doc_id", T28_MODELS, T28_BIASES,
        out_col="lang_pred", labels_only=True,
    )


def _t28_sql() -> str:
    micro = 1_000_000
    langs = sorted(T28_MODELS)
    wm = {
        l: [int(round(w * micro)) for w in T28_MODELS[l]] for l in langs
    }
    bm = {l: int(round(T28_BIASES.get(l, 0.0) * micro)) for l in langs}
    empty_winner = min(langs, key=lambda l: (-bm[l], l))
    arrs = {
        l: "[" + ", ".join(str(x) for x in wm[l]) + "]" for l in langs
    }
    sums = ",\n             ".join(
        f"SUM({arrs[l]}[(('0x' || substr(md5(t), 1, 8))::BIGINT % 64) + 1])"
        f" AS num_{l}"
        for l in langs
    )
    tots = ",\n             ".join(
        f"s.num_{l} + {bm[l]} * s.n AS tot_{l}" for l in langs
    )
    # strict-> chain in sorted order ≡ "lang i wins iff its total
    # strictly beats the greatest of all earlier langs", evaluated
    # from the last language down
    branches = []
    for i in range(len(langs) - 1, 0, -1):
        earlier = ", ".join(f"tot_{l}" for l in langs[:i])
        ge = earlier if i == 1 else f"GREATEST({earlier})"
        branches.append(f"WHEN tot_{langs[i]} > {ge} THEN '{langs[i]}'")
    chain = "\n                ".join(branches)
    return f"""
    WITH toks AS (
      SELECT doc_id, u.t
      FROM documents,
           UNNEST(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> x <> '')) AS u(t)),
    s AS (
      SELECT doc_id,
             {sums},
             COUNT(*) AS n
      FROM toks GROUP BY doc_id),
    t AS (
      SELECT d.doc_id, s.n,
             {tots}
      FROM documents d LEFT JOIN s USING (doc_id))
    SELECT doc_id,
           CASE WHEN n IS NULL THEN '{empty_winner}'
                {chain}
                ELSE '{langs[0]}' END AS lang_pred
    FROM t
    """


T28_SQL = _t28_sql()


def t29_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics report (t29,
    `operators.text.corpus_profile`) — the dataset-card stats stage
    (doc/token/char counts, exact md5 duplication rate, exact
    ceil-rank length percentiles) per `lang` stratum. Every number is
    either an integer aggregate or a round(·, 6) of an exact ratio,
    and the percentiles are discrete ceil-rank picks ordered by
    (n_tokens, doc_id) — the oracle replays all of it."""
    from southpaw_spark.operators.text import corpus_profile

    docs = _read(spark, sf_dir, "documents")
    return corpus_profile(docs, "text", "doc_id", "lang")


T29_SQL = """
    WITH base AS (
      SELECT lang AS stratum, doc_id AS id,
             len(string_split(text, ' '))::BIGINT AS tok,
             length(text)::BIGINT AS chr, md5(text) AS h
      FROM documents),
    aggs AS (
      SELECT stratum, count(*) AS n_docs, SUM(tok) AS n_tokens,
             SUM(chr) AS n_chars, COUNT(DISTINCT h) AS n_distinct,
             MAX(tok) AS max_tokens
      FROM base GROUP BY stratum),
    ranked AS (
      SELECT stratum, tok,
             row_number() OVER (
               PARTITION BY stratum ORDER BY tok, id) AS rn,
             count(*) OVER (PARTITION BY stratum) AS n
      FROM base),
    p50 AS (SELECT stratum, tok AS p50_tokens FROM ranked
            WHERE rn = GREATEST(1, CEIL(0.5 * n))),
    p90 AS (SELECT stratum, tok AS p90_tokens FROM ranked
            WHERE rn = GREATEST(1, CEIL(0.9 * n)))
    SELECT stratum, n_docs, n_tokens, n_chars, n_distinct,
           ROUND(1.0 - n_distinct / n_docs, 6) AS dup_rate,
           ROUND(n_tokens / n_docs, 6) AS avg_tokens,
           max_tokens, p50_tokens, p90_tokens
    FROM aggs JOIN p50 USING (stratum) JOIN p90 USING (stratum)
    """


T27_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(ws))) AS r(i)
      WHERE len(ws) >= 2),
    rtoks AS (
      SELECT string_split(text, ' ') AS ws FROM documents
      WHERE lang = 'en'),
    rbig AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM rtoks, UNNEST(range(1, len(ws))) AS r(i)
      WHERE len(ws) >= 2),
    cnt2 AS (SELECT w1, w2, count(*) AS c2 FROM rbig GROUP BY w1, w2),
    cnt1 AS (SELECT w1, count(*) AS c1 FROM rbig GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(ws) AS t FROM rtoks))
    SELECT big.doc_id, count(*) AS n_bigrams,
           ROUND(AVG(ln((COALESCE(c2, 0) + 1.0)
                        / (COALESCE(c1, 0) + v))), 6) AS avg_logprob
    FROM big
    LEFT JOIN cnt2 USING (w1, w2)
    LEFT JOIN cnt1 USING (w1), vocab
    GROUP BY big.doc_id
"""


def s10_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k evaluation (s10, `operators.similarity.ann_recall`) —
    the acceptance metric every ANN rollout runs: per-query
    |approx ∩ exact| / k with the s02 LSH arm as approx and the s01
    exact scan as truth. Both inputs are deterministic registry rows,
    so the recall values themselves are engine-checkable."""
    from southpaw_spark.operators.similarity import ann_recall

    return ann_recall(
        s02_ivf_topk(spark, sf_dir), s01_cosine_topk(spark, sf_dir), k=5
    )


S10_SQL = f"""
    WITH ex AS ({S01_SQL}),
    ap AS ({S02_SQL}),
    hits AS (
      SELECT ex.query_id, count(*) AS c
      FROM ex JOIN ap
        ON ex.query_id = ap.query_id
       AND ex.neighbor_id = ap.neighbor_id
      WHERE ex.rank <= 5 AND ap.rank <= 5
      GROUP BY ex.query_id)
    SELECT q.query_id,
           COALESCE(c, 0)::BIGINT AS n_hits,
           ROUND(COALESCE(c, 0) / 5.0, 6) AS recall
    FROM (SELECT DISTINCT query_id FROM ex) q
    LEFT JOIN hits USING (query_id)
"""


def t30_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (t30, `operators.text.gopher_quality`) —
    the seven public MassiveText document filters (word count, mean
    word length, symbol ratio, bullet/ellipsis line fractions,
    alpha-word fraction, stopword hits) as one codegen projection;
    the oracle replays every rule including the whitespace-regex
    tokenization and NULL-ratio zero-word contract."""
    from southpaw_spark.operators.text import gopher_quality

    docs = _read(spark, sf_dir, "documents")
    return gopher_quality(docs, "text", "doc_id")


T30_SQL = r"""
    WITH base AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\s+'),
                         w -> w <> '') AS ws,
             list_filter(string_split(text, chr(10)),
                         l -> trim(l) <> '') AS ls
      FROM documents),
    m AS (
      SELECT doc_id,
             len(ws)::BIGINT AS n_words,
             len(ls) AS n_lines,
             list_sum(list_transform(ws, w -> length(w))) AS sum_wl,
             len(list_filter(ws,
                 w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3.0
               AS n_ell,
             len(list_filter(ls, l ->
                 starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')
                 OR starts_with(ltrim(l), '•'))) AS n_bul,
             len(list_filter(ls, l ->
                 ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
               AS n_ell_l,
             len(list_filter(
                 ['the','be','to','of','and','that','have','with'],
                 s -> list_contains(list_transform(ws, w -> lower(w)), s)
             ))::INT AS n_stop
      FROM base),
    r AS (
      SELECT doc_id, n_words,
             ROUND(sum_wl / NULLIF(n_words, 0)::DOUBLE, 6)
               AS mean_word_len,
             ROUND((n_hash + n_ell) / NULLIF(n_words, 0)::DOUBLE, 6)
               AS symbol_word_ratio,
             ROUND(n_bul / NULLIF(n_lines, 0)::DOUBLE, 6)
               AS bullet_line_frac,
             ROUND(n_ell_l / NULLIF(n_lines, 0)::DOUBLE, 6)
               AS ellipsis_line_frac,
             ROUND(n_alpha / NULLIF(n_words, 0)::DOUBLE, 6)
               AS alpha_word_frac,
             n_stop AS n_stopword_hits
      FROM m)
    SELECT *,
           COALESCE(
             n_words BETWEEN 50 AND 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND symbol_word_ratio <= 0.1
             AND bullet_line_frac <= 0.9
             AND ellipsis_line_frac <= 0.3
             AND alpha_word_frac >= 0.8
             AND n_stopword_hits >= 2, FALSE) AS gopher_pass
    FROM r
"""


def t31_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (t31,
    `operators.text.gopher_repetition`) — Table A2 of the public
    Gopher recipe: duplicate-line fraction + char fraction, top
    {2,3,4}-gram char coverage (ties to the smallest gram), duplicate
    {5..10}-gram char coverage, all clamped at 1.0 and round(·, 6);
    the oracle replays the gram generation, tie-break, clamps and the
    NULL/zero-coverage contract exactly."""
    from southpaw_spark.operators.text import gopher_repetition

    docs = _read(spark, sf_dir, "documents")
    return gopher_repetition(docs, "text", "doc_id")


T31_SQL = r"""
    WITH b2 AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
                         w -> w <> '') AS ws,
             list_filter(string_split(text, chr(10)),
                         l -> trim(l) <> '') AS ls
      FROM documents),
    b3 AS (
      SELECT doc_id, ws, ls, len(ws)::BIGINT AS nw,
             COALESCE(list_sum(list_transform(ws, w -> length(w))), 0)
               + GREATEST(len(ws) - 1, 0) AS char_base
      FROM b2),
    lrow AS (SELECT doc_id, unnest(ls) AS line FROM b3),
    lcnt AS (SELECT doc_id, line, count(*) AS cnt
             FROM lrow GROUP BY doc_id, line),
    lstat AS (
      SELECT doc_id,
             ROUND((SUM(cnt) - COUNT(*)) / SUM(cnt)::DOUBLE, 6)
               AS dup_line_frac,
             ROUND(SUM((cnt - 1) * length(line))
                   / SUM(cnt * length(line))::DOUBLE, 6)
               AS dup_line_char_frac
      FROM lcnt GROUP BY doc_id),
    grow AS (
      SELECT doc_id, char_base, n,
             array_to_string(list_slice(ws, i, i + n - 1), ' ') AS gram
      FROM b3,
           UNNEST(range(2, 11)) AS rn(n),
           UNNEST(range(1, len(ws) - n + 2)) AS ri(i)
      WHERE len(ws) >= n),
    gcnt AS (
      SELECT doc_id, char_base, n, gram, count(*) AS cnt
      FROM grow GROUP BY doc_id, char_base, n, gram),
    tops AS (
      SELECT doc_id, char_base, n, cnt, gram
      FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id, n ORDER BY cnt DESC, gram) AS rn
            FROM gcnt)
      WHERE rn = 1),
    dups AS (
      SELECT doc_id, char_base, n,
             SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram)
                      ELSE 0 END) AS dupch
      FROM gcnt GROUP BY doc_id, char_base, n),
    gstat AS (
      SELECT t.doc_id,
        MAX(CASE WHEN t.n = 2 THEN ROUND(LEAST(1.0,
          t.cnt * length(t.gram) / t.char_base::DOUBLE), 6) END) AS tg2,
        MAX(CASE WHEN t.n = 3 THEN ROUND(LEAST(1.0,
          t.cnt * length(t.gram) / t.char_base::DOUBLE), 6) END) AS tg3,
        MAX(CASE WHEN t.n = 4 THEN ROUND(LEAST(1.0,
          t.cnt * length(t.gram) / t.char_base::DOUBLE), 6) END) AS tg4,
        MAX(CASE WHEN d.n = 5 THEN ROUND(LEAST(1.0,
          d.dupch / d.char_base::DOUBLE), 6) END) AS dg5,
        MAX(CASE WHEN d.n = 6 THEN ROUND(LEAST(1.0,
          d.dupch / d.char_base::DOUBLE), 6) END) AS dg6,
        MAX(CASE WHEN d.n = 7 THEN ROUND(LEAST(1.0,
          d.dupch / d.char_base::DOUBLE), 6) END) AS dg7,
        MAX(CASE WHEN d.n = 8 THEN ROUND(LEAST(1.0,
          d.dupch / d.char_base::DOUBLE), 6) END) AS dg8,
        MAX(CASE WHEN d.n = 9 THEN ROUND(LEAST(1.0,
          d.dupch / d.char_base::DOUBLE), 6) END) AS dg9,
        MAX(CASE WHEN d.n = 10 THEN ROUND(LEAST(1.0,
          d.dupch / d.char_base::DOUBLE), 6) END) AS dg10
      FROM tops t JOIN dups d USING (doc_id, char_base, n)
      GROUP BY t.doc_id),
    fin AS (
      SELECT b3.doc_id, b3.nw,
             l.dup_line_frac, l.dup_line_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(tg2, 0.0) END
               AS top_2gram_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(tg3, 0.0) END
               AS top_3gram_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(tg4, 0.0) END
               AS top_4gram_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(dg5, 0.0) END
               AS dup_5gram_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(dg6, 0.0) END
               AS dup_6gram_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(dg7, 0.0) END
               AS dup_7gram_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(dg8, 0.0) END
               AS dup_8gram_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(dg9, 0.0) END
               AS dup_9gram_char_frac,
             CASE WHEN nw > 0 THEN COALESCE(dg10, 0.0) END
               AS dup_10gram_char_frac
      FROM b3
      LEFT JOIN lstat l USING (doc_id)
      LEFT JOIN gstat USING (doc_id))
    SELECT doc_id, dup_line_frac, dup_line_char_frac,
           top_2gram_char_frac, top_3gram_char_frac, top_4gram_char_frac,
           dup_5gram_char_frac, dup_6gram_char_frac, dup_7gram_char_frac,
           dup_8gram_char_frac, dup_9gram_char_frac, dup_10gram_char_frac,
           COALESCE(
             COALESCE(dup_line_frac <= 0.30, TRUE)
             AND COALESCE(dup_line_char_frac <= 0.20, TRUE)
             AND COALESCE(top_2gram_char_frac <= 0.20, TRUE)
             AND COALESCE(top_3gram_char_frac <= 0.18, TRUE)
             AND COALESCE(top_4gram_char_frac <= 0.16, TRUE)
             AND COALESCE(dup_5gram_char_frac <= 0.15, TRUE)
             AND COALESCE(dup_6gram_char_frac <= 0.14, TRUE)
             AND COALESCE(dup_7gram_char_frac <= 0.13, TRUE)
             AND COALESCE(dup_8gram_char_frac <= 0.12, TRUE)
             AND COALESCE(dup_9gram_char_frac <= 0.11, TRUE)
             AND COALESCE(dup_10gram_char_frac <= 0.10, TRUE)
             AND nw > 0, FALSE) AS repetition_pass
    FROM fin
"""


def t32_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (t32,
    `operators.text.chunk_documents`) — the packing complement: docs
    split into 40-token windows every 32 tokens (overlapping), the
    standard pretraining/embedding chunk shape. The oracle replays the
    stride arithmetic, slicing and rejoin exactly."""
    from southpaw_spark.operators.text import chunk_documents

    docs = _read(spark, sf_dir, "documents")
    return chunk_documents(docs, "text", "doc_id", max_tokens=40, stride=32)


T32_SQL = r"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS n
      FROM documents),
    nch AS (
      SELECT doc_id, ws,
             GREATEST(CEIL((n - 40) / 32.0)::INT + 1, 1) AS n_chunks
      FROM base),
    rows_ AS (
      SELECT doc_id,
             i::INT AS chunk_id,
             list_slice(ws, i * 32 + 1, i * 32 + 40) AS w
      FROM nch, UNNEST(range(0, n_chunks)) AS r(i))
    SELECT doc_id, chunk_id,
           array_to_string(w, ' ') AS chunk,
           len(w)::INT AS chunk_tokens
    FROM rows_
"""


def s11_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier scores (s11,
    `operators.similarity.centroid_outlier_scores`) — cosine to the
    per-label mean vector + ascending outlier rank; the oracle replays
    the centroid average, the double-cast dot/norms, the round(·, 8)
    rank ordering and the round(·, 6) score exactly."""
    from southpaw_spark.operators.similarity import centroid_outlier_scores

    emb = _read(spark, sf_dir, "embeddings")
    return centroid_outlier_scores(emb, "embedding", "vec_id", "label")


S11_SQL = """
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (
      SELECT label, i, AVG(v[i]) AS c
      FROM e, UNNEST(range(1, 65)) AS r(i)
      GROUP BY label, i),
    cent AS (
      SELECT label, list(c ORDER BY i) AS cv FROM dims GROUP BY label),
    sims AS (
      SELECT e.vec_id, e.label,
             list_sum(list_transform(range(1, 65), i -> v[i] * cv[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                                             i -> v[i] * v[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                                               i -> cv[i] * cv[i]))))
               AS cos
      FROM e JOIN cent USING (label))
    SELECT vec_id, label,
           ROUND(cos, 6) AS centroid_cosine,
           ROW_NUMBER() OVER (
             PARTITION BY label ORDER BY ROUND(cos, 8) ASC, vec_id
           )::INT AS outlier_rank
    FROM sims
"""


# The driver's correctness gate checks AT MOST 50 rows per round
# (CORRECTNESS_r02 stopped at 50 of 54), so QUERIES stays pinned at
# exactly 50: pushing new entries into it would silently uncheck tail
# queries. Operators added past the budget live here instead — same
# (query, DuckDB-oracle) contract, enforced by the local gate
# (tools/check_oracles.py runs BOTH registries at all three SFs) and
# by the registry pytest guards, just not by the driver's 50-row pass.
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "d09_simhash_near_pairs": d09_simhash_near_pairs,
    "d10_containment_pairs": d10_containment_pairs,
    "d11_quality_keepers": d11_quality_keepers,
    "d12_normalized_dedup": d12_normalized_dedup,
    "d13_bag_dedup": d13_bag_dedup,
    "s05_radius_search": s05_radius_search,
    "e09_trending_windows": e09_trending_windows,
    "a08_cube": a08_cube,
    "s04_filtered_topk": s04_filtered_topk,
    "e07_event_gaps": e07_event_gaps,
    "t12_word_entropy": t12_word_entropy,
    "t13_bigram_lm_score": t13_bigram_lm_score,
    "a07_top_n_per_group": a07_top_n_per_group,
    "e10_asof_auto": e10_asof_auto,
    "s06_quantized_topk": s06_quantized_topk,
    "d14_edit_distance_pairs": d14_edit_distance_pairs,
    "t14_redact_pii": t14_redact_pii,
    "d15_duplicate_spans": d15_duplicate_spans,
    "d16_span_removal": d16_span_removal,
    "t15_token_budget_sample": t15_token_budget_sample,
    "d17_span_contamination": d17_span_contamination,
    "a09_global_rank": a09_global_rank,
    "d18_semantic_dedup": d18_semantic_dedup,
    "t16_shuffled_shards": t16_shuffled_shards,
    "s07_mmr_topk": s07_mmr_topk,
    "s08_ivf_quantized_topk": s08_ivf_quantized_topk,
    "m04_image_near_dup": m04_image_near_dup,
    "e11_gapfill": e11_gapfill,
    "d19_bloom_decontamination": d19_bloom_decontamination,
    "t17_temperature_mix": t17_temperature_mix,
    "t18_url_dedup": t18_url_dedup,
    "e12_ohlc": e12_ohlc,
    "t19_line_clean": t19_line_clean,
    "m05_audio_fingerprint": m05_audio_fingerprint,
    "m06_image_ahash": m06_image_ahash,
    "a10_period_over_period": a10_period_over_period,
    "t20_hash_split": t20_hash_split,
    "t21_bpe_encode": t21_bpe_encode,
    "t22_model_quality_score": t22_model_quality_score,
    "d20_embedding_contamination": d20_embedding_contamination,
    "a11_cohort_retention": a11_cohort_retention,
    "m07_video_frame_hashes": m07_video_frame_hashes,
    "e13_funnel": e13_funnel,
    "e14_rolling_active_users": e14_rolling_active_users,
    "s09_pq_topk": s09_pq_topk,
    "d21_jaccard_contamination": d21_jaccard_contamination,
    "a12_exact_quantiles": a12_exact_quantiles,
    "d22_line_dedup": d22_line_dedup,
    "t24_blocklist_hits": t24_blocklist_hits,
    "t23_perplexity_buckets": t23_perplexity_buckets,
    "t25_pack_sequences": t25_pack_sequences,
    "t26_epoch_repeat": t26_epoch_repeat,
    "t27_reference_perplexity": t27_reference_perplexity,
    "s10_ann_recall": s10_ann_recall,
    "t28_language_id": t28_language_id,
    "t29_corpus_profile": t29_corpus_profile,
    "t30_gopher_quality": t30_gopher_quality,
    "t31_gopher_repetition": t31_gopher_repetition,
    "t32_chunk_documents": t32_chunk_documents,
    "s11_centroid_outliers": s11_centroid_outliers,
}

EXTRA_ORACLES: dict[str, str] = {
    "d09_simhash_near_pairs": D09_SQL,
    "d10_containment_pairs": D10_SQL,
    "d11_quality_keepers": D11_SQL,
    "d12_normalized_dedup": D12_SQL,
    "d13_bag_dedup": D13_SQL,
    "s05_radius_search": S05_SQL,
    "e09_trending_windows": E09_SQL,
    "a08_cube": A08_SQL,
    "s04_filtered_topk": S04_SQL,
    "e07_event_gaps": E07_SQL,
    "t12_word_entropy": T12_SQL,
    "t13_bigram_lm_score": T13_SQL,
    "a07_top_n_per_group": A07_SQL,
    "e10_asof_auto": E10_SQL,
    "s06_quantized_topk": S06_SQL,
    "d14_edit_distance_pairs": D14_SQL,
    "t14_redact_pii": T14_SQL,
    "d15_duplicate_spans": D15_SQL,
    "d16_span_removal": D16_SQL,
    "t15_token_budget_sample": T15_SQL,
    "d17_span_contamination": D17_SQL,
    "a09_global_rank": A09_SQL,
    "d18_semantic_dedup": D18_SQL,
    "t16_shuffled_shards": T16_SQL,
    "s07_mmr_topk": S07_SQL,
    "s08_ivf_quantized_topk": S08_SQL,
    "m04_image_near_dup": M04_SQL,
    "e11_gapfill": E11_SQL,
    # d19 is d17 through the Bloom-prefilter execution path — the spec
    # (and thus the oracle) is identical by construction.
    "d19_bloom_decontamination": D17_SQL,
    "t17_temperature_mix": T17_SQL,
    "t18_url_dedup": T18_SQL,
    "e12_ohlc": E12_SQL,
    "t19_line_clean": T19_SQL,
    "m05_audio_fingerprint": M05_SQL,
    "m06_image_ahash": M06_SQL,
    "a10_period_over_period": A10_SQL,
    "t20_hash_split": T20_SQL,
    "t21_bpe_encode": T21_SQL,
    "t22_model_quality_score": T22_SQL,
    "d20_embedding_contamination": D20_SQL,
    "a11_cohort_retention": A11_SQL,
    "m07_video_frame_hashes": M07_SQL,
    "e13_funnel": E13_SQL,
    "e14_rolling_active_users": E14_SQL,
    "s09_pq_topk": S09_SQL,
    "d21_jaccard_contamination": D21_SQL,
    "a12_exact_quantiles": A12_SQL,
    "d22_line_dedup": D22_SQL,
    "t24_blocklist_hits": T24_SQL,
    "t23_perplexity_buckets": T23_SQL,
    "t25_pack_sequences": T25_SQL,
    "t26_epoch_repeat": T26_SQL,
    "t27_reference_perplexity": T27_SQL,
    "s10_ann_recall": S10_SQL,
    "t28_language_id": T28_SQL,
    "t29_corpus_profile": T29_SQL,
    "t30_gopher_quality": T30_SQL,
    "t31_gopher_repetition": T31_SQL,
    "t32_chunk_documents": T32_SQL,
    "s11_centroid_outliers": S11_SQL,
}

# ---------------------------------------------------------------------------
# Round-13 driver-gate rotation (VERDICT r12 item 6): the driver's
# independent CORRECTNESS gate caps at 50 rows, so the newest operator
# surface (trained lang-ID, the Gopher pair, the s11 skew escape)
# rotates IN and four rows whose semantics are subsumed by richer EXTRA
# rows rotate OUT (t04 fingerprint ⊂ d15/d16 span machinery; t06
# normalize ⊂ d12 normalization-aware dedup; t11 repetition ⊂ t31's
# Gopher repetition table; a05 cohort ⊂ a11's richer cohort retention).
# Rotated-out rows keep full local verification via tools/check_oracles
# (which runs QUERIES ∪ EXTRA_QUERIES).

for _name in (
    "t28_language_id",
    "t30_gopher_quality",
    "t31_gopher_repetition",
    "s11_centroid_outliers",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "t04_fingerprint",
    "t06_normalize",
    "t11_repetition",
    "a05_cohort_retention",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name

# ---------------------------------------------------------------------------
# Round-14 driver-gate rotation (VERDICT r13 item 3): 56 of the 60
# EXTRA rows had only local oracle validation, so the most load-bearing
# unchecked rows rotate IN for driver-grade hash checks — d15 span
# dedup, d18 SemDeDup, d21 fuzzy-Jaccard decontamination, s08 the
# quantized-IVF retrieval path, t22 the trained quality model, e11
# gap-fill. Six near-redundant driver rows rotate OUT: q08 SKIP-mode ⊂
# q16's old-row-aware SKIP; q10 empty-children ⊂ q09's absent-vs-empty
# distinction; s02 IVF ⊂ s08 (same cells + int8 quantization); t03
# marker lang-guess superseded by t28's trained lang-ID; a02 approx
# percentiles ⊂ a12 exact quantiles; e06 moving-avg is e01's windowed
# sibling. Rotated-out rows keep full local verification via
# tools/check_oracles (which runs QUERIES ∪ EXTRA_QUERIES).

for _name in (
    "d15_duplicate_spans",
    "d18_semantic_dedup",
    "d21_jaccard_contamination",
    "s08_ivf_quantized_topk",
    "t22_model_quality_score",
    "e11_gapfill",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "q08_filter_skip",
    "q10_empty_children",
    "s02_ivf_topk",
    "t03_lang_guess",
    "a02_percentiles",
    "e06_moving_avg",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name

# ---------------------------------------------------------------------------
# Round-15 driver-gate rotation (VERDICT r14 item 3): six more
# never-driver-checked EXTRA rows rotate IN for driver-grade hash
# checks — s09 the PQ/ADC retrieval path, d20 embedding-space
# decontamination, t15 token-budget sampling, e13 the richer funnel,
# t21 BPE encoding, m06 the image average-hash family. Six driver rows
# whose machinery a stronger driver sibling covers rotate OUT:
# q03 N:1 left join and q04 nested children are interior pieces of
# q13's full denormalized tree (q09/q15 keep the edge semantics
# pinned); t07 tf-idf ⊂ t02/t22's scoring family over the same
# tokenizer; e08's funnel ⊂ e13's richer funnel; d01 exact-dedup md5 ⊂
# d08 which applies the same kept-corpus rule end-to-end; s01
# brute-force cosine ⊂ s08/s09 whose final rescore is the identical
# exact-cosine machinery. Rotated-out rows keep full local
# verification via tools/check_oracles (QUERIES ∪ EXTRA_QUERIES).

for _name in (
    "s09_pq_topk",
    "d20_embedding_contamination",
    "t15_token_budget_sample",
    "e13_funnel",
    "t21_bpe_encode",
    "m06_image_ahash",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "q03_left_join_n1",
    "q04_nested_children",
    "t07_tfidf_top_terms",
    "e08_funnel",
    "d01_dedup_exact",
    "s01_cosine_topk",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name
