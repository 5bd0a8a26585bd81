"""N-ary hierarchical left-outer equi-join with nested-document assembly.

This is the reference engine's entire query shape (SURVEY §0, §2 O13):
for each root row, emit one nested document

    {"Record": {<all fields>},
     "Children": {"<child entity>": [<child docs, ordered by child PK>]}}

with the exact semantics of reference ``Southpaw.java:326-358``:

* parent-key value NULL  → the child entity key is *absent* from Children;
* parent-key present, zero matches → *empty array*;
* child docs ordered by child PK ascending (we declare numeric/lexicographic
  PK order; the reference orders by stripped-big-endian byte encoding,
  which coincides for same-byte-length keys — divergence documented in
  SURVEY §1.6);
* a missing/empty root row → the document is null (output tombstone).

Spark-first design — instead of the reference's per-key index-nested-loop
point lookups, the whole tree is one declarative DataFrame plan built
bottom-up: each child level is

    child.groupBy(join_key).agg(sort_array(collect_list(struct(pk, doc))))
    parent.join(grouped, parent[parent_key] == grouped[join_key], "left")

Catalyst then picks broadcast vs sort-merge per level and AQE splits skewed
join keys at runtime. At scale the only mandatory shuffles are one
hash-partition per tree level on the join key — the aggregation and the
subsequent join share that partitioning, so Catalyst reuses the exchange.
Small dimension entities are broadcast automatically (autoBroadcastJoinThreshold).
"""

from __future__ import annotations

import logging
from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from southpaw_spark.relations import Relation

_LOG = logging.getLogger(__name__)

#: name of the struct field carrying the row fields (reference output schema
#: ``schema/denormalized_record.json:13-40``)
RECORD_FIELD = "Record"
CHILDREN_FIELD = "Children"
_DOC = "__doc"


def bucketize_states(
    states: Mapping[str, DataFrame],
    bucket_keys: Mapping[str, Sequence[str]],
    n_buckets: int = 16,
    prefix: str = "southpaw_bucketed_",
) -> dict[str, DataFrame]:
    """Opt-in co-located state layout: materialize each entity state as
    a Spark bucketed table (``bucketBy`` + in-bucket ``sortBy``) on its
    JOIN key, and return reads of those tables.

    Feeding the result into :func:`denormalize` lets the child
    ``groupBy(join_key)`` and the parent⋈children joins consume the
    scan's bucketing directly — zero exchanges on the fact-fact path
    (BASELINE.md §6 measured 0.68 → 0.32 s for orders⋈lineitem at
    sf0.1 with broadcast disabled; §11 records the full-flagship
    numbers). The write-side shuffle is paid ONCE per state version;
    every later rebuild/query over the same keys skips its read-side
    exchange — the persistent-bucketing trade every warehouse makes
    for repeatedly-joined fact tables. At 100 TB, size ``n_buckets``
    so a bucket fits an executor (table_bytes / n_buckets), matching
    the parquet state store's hash-bucket sizing rule (SCALE.md).

    Tables land in the session warehouse as ``{prefix}{entity}``
    (overwritten if present). Bucket keys are the JOIN keys, which may
    be a strict subset of the entity's PK columns."""
    out: dict[str, DataFrame] = {}
    for entity, df in states.items():
        spark = df.sparkSession
        keys = list(bucket_keys[entity])
        table = f"{prefix}{entity}"
        # EXTERNAL table at an explicit LOCATION: the path is ours by
        # construction (the ``prefix`` namespaces it under the
        # warehouse dir), independent of the session's current
        # database — so the orphan scrub below deletes exactly the
        # files this function wrote in a previous session whose
        # metastore is gone (saveAsTable refuses to adopt an existing
        # location), never a same-named managed table's data in some
        # other database.
        loc = _table_location(spark, table)
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        _scrub_location(spark, loc)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", loc)
            .bucketBy(n_buckets, keys[0], *keys[1:])
            .sortBy(keys[0], *keys[1:])
            .saveAsTable(table)
        )
        out[entity] = spark.table(table)
    return out


def _table_location(spark, table: str) -> str:
    base = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    return f"{base}/{table.lower()}"


def _scrub_location(spark, loc: str) -> None:
    """Delete a table location left behind by a dead session. Local
    ``file:`` locations (every test/dev setup) use a pure-Python
    removal — no ``spark._jvm``, so the path is Spark-Connect-safe.
    Remote locations (object stores) go through the Hadoop FS API
    where the classic JVM gateway exists, else fail with a clear
    instruction instead of a cryptic saveAsTable LOCATION error."""
    import shutil
    from urllib.parse import unquote, urlparse

    u = urlparse(loc)
    if u.scheme in ("", "file"):
        shutil.rmtree(unquote(u.path) if u.scheme else loc, ignore_errors=True)
        return
    jvm = getattr(spark, "_jvm", None)
    if jvm is not None:
        path = jvm.org.apache.hadoop.fs.Path(loc)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
        return
    raise RuntimeError(
        f"cannot scrub orphan table location {loc!r} from a Spark "
        "Connect session — delete it with your object-store tooling "
        "or run bucketize_states once from a classic session"
    )


def _byte_order_key(df: DataFrame, pk_cols: Sequence[str]):
    """Binary child-sort key replicating the reference's TreeMap ordering
    over stripped-big-endian ByteArray keys (``util/ByteArray.java:37,
    65-75,86-89``; composite keys ``215-229``): each PK component encoded
    to reference bytes, length-prefixed when composite. Spark compares
    BinaryType unsigned-lexicographically — the same order as the
    reference's byte compare."""
    from southpaw_spark.functions.keys import composite_key, key_bytes

    types = dict(df.dtypes)
    if len(pk_cols) == 1:
        # single-field PK: raw ByteArray bytes, no length prefix
        # (prefixing is the *composite* encoding, BaseRecord.java:59-75)
        c = pk_cols[0]
        return key_bytes(F.col(c), types[c])
    return composite_key(df, {c: types[c] for c in pk_cols})


def parse_dynamic(
    df: DataFrame,
    keys: Mapping[str, str],
    value_col: str = "value",
    record_col: str = "__v",
    key_col: str | None = None,
) -> DataFrame:
    """Dynamic per-record schema ingestion (reference
    ``record/MapRecord.java:41-50``, ``record/BaseRecord.java:37-41``):
    each row's schema is whatever fields that row actually carries —
    heterogeneous rows of one entity coexist in one changelog.

    Spark-first: the row body becomes a VARIANT (``parse_json``) — the
    exact Spark-4 analog of the reference's per-record ``Map<String,?>``
    — while the PK/FK fields named in ``keys`` (column → Spark type) are
    extracted to typed top-level columns via ``try_variant_get`` so
    upserts, joins and child ordering stay JVM-typed and shuffle-keyed.
    ``to_json`` later re-emits each record's own fields verbatim
    (absent stays absent, explicit null stays null) with
    deterministically sorted keys.

    ``key_col``: a separate JSON key column to extract the PK fields
    from — REQUIRED for Kafka-shaped changelogs where a tombstone is a
    NULL value with the PK only in the key frame (reference
    ``README.md:13``); without it a null-value row would yield null
    keys and the delete would miss its target.
    """
    out = df.withColumn(record_col, F.parse_json(F.col(value_col)))
    if key_col is not None:
        out = out.withColumn("__kv", F.parse_json(F.col(key_col)))
        key_src = F.col("__kv")
    else:
        key_src = F.col(record_col)
    for col, typ in keys.items():
        out = out.withColumn(
            col, F.try_variant_get(key_src, f"$.{col}", typ)
        )
    return out.drop("__kv") if key_col is not None else out


def _pk_comparator(n_keys: int):
    """``array_sort`` comparator ordering child docs by their extracted
    PK columns ``__k0 … __k{n-1}`` — used instead of ``sort_array`` when
    the doc struct contains a VARIANT (variants are not orderable)."""

    def cmp(a, b):
        expr = F.lit(0)
        for i in reversed(range(n_keys)):
            ka, kb = a[f"__k{i}"], b[f"__k{i}"]
            expr = F.when(ka < kb, F.lit(-1)).when(ka > kb, F.lit(1)).otherwise(expr)
        return expr

    return cmp


def _subtree_dynamic(node: Relation, record_cols: Mapping[str, str]) -> bool:
    return node.entity in record_cols or any(
        _subtree_dynamic(c, record_cols) for c in node.children
    )


#: In-memory bytes of a built grouped-children hash relation per byte of
#: Catalyst's *scan* estimate for the underlying child states. The scan
#: estimate is compressed-parquet bytes; the broadcast relation holds the
#: same rows as JVM object arrays of nested doc structs — measured ~15 s
#: / hundreds of MB for a 10.8 MB lineitem scan at sf0.1 (the q13
#: broadcast incident this guards against), i.e. a 20-30× expansion.
#: Used to compare a child subtree's scan estimate against
#: ``autoBroadcastJoinThreshold`` on the scale Catalyst's threshold
#: actually protects (the built relation), not on compressed file bytes.
_BROADCAST_DOC_EXPANSION = 20

#: Absolute ceiling on the *scaled* grouped-children estimate that may
#: broadcast, independent of the session threshold. The expansion
#: factor above is a measured constant, not a law: a child whose docs
#: expand far beyond 20× over scan bytes (wide text payloads) could
#: otherwise slip a multi-GB relation under a generously raised
#: ``autoBroadcastJoinThreshold`` (Spark hard-fails broadcasts at 8 GB
#: / 512M rows — that must stay unreachable even when the constant is
#: off by an order of magnitude).
_BROADCAST_DOC_CEILING = 256 << 20


def _auto_broadcast_bytes(spark) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (0 = disabled)."""
    v = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower().rstrip("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if v.endswith(suffix):
            v, mult = v[: -1], m
            break
    try:
        n = int(v) * mult
    except ValueError:
        return 0
    return max(0, n)


def _subtree_scan_bytes(
    node: Relation, states: Mapping[str, DataFrame]
) -> int:
    """Catalyst's own size estimate (optimized-plan stats) summed over
    the child subtree's state tables — the pre-aggregate number the
    planner would use for these scans, before the collect_list
    aggregate destroys it. Returns a huge sentinel when stats are
    unavailable (e.g. Spark Connect), so the caller falls back to the
    scale-safe sort-merge choice."""
    total = 0
    for e in set(_subtree_entities(node)):
        try:
            total += int(
                states[e]._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes()
            )
        except Exception:
            return 1 << 60
    return total


def _subtree_entities(node: Relation) -> list[str]:
    out = [node.entity]
    for c in node.children:
        out.extend(_subtree_entities(c))
    return out


def _hinted(
    grouped: DataFrame,
    child_join: str,
    child_node: Relation | None = None,
    states: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Join-strategy control for the parent ⟕ grouped-children join.

    ``merge`` (default for full builds): force sort-merge for
    FACT-SIZED children, let genuinely small dimensions broadcast. The
    grouped side carries each key's entire child-subtree payload as one
    array — its true size is Θ(child table), but Catalyst's
    post-aggregate estimate is tiny, so under broadcast thresholds it
    BROADCASTS a relation that measured ~15 s at sf0.1 (driver-side
    collect + single-threaded HashedRelation build of 150k nested
    lineitem docs) and would OOM the driver at scale. The decision
    therefore uses the number Catalyst is blind to: the child subtree's
    *pre-aggregate* scan estimate (file-size based, reliable), scaled
    by the measured in-memory doc expansion
    (``_BROADCAST_DOC_EXPANSION``) and compared against the session's
    own ``autoBroadcastJoinThreshold``. A bounded dimension (nation,
    region, supplier) stays a broadcast at ANY corpus scale — its scan
    estimate never grows past the threshold — while a fact-like child
    (lineitem) crosses it and gets sort-merge, which reuses the
    groupBy's hash partitioning (no second exchange on the grouped
    side), keeps bucketed/store-native joins zero-exchange co-located,
    and spills gracefully. Measured q13 sf0.1: 15.2 → 5.3 s with the
    blanket merge hint (min-of-3, same box); the size gate keeps that
    win and returns the dimension broadcasts the blanket hint lost.

    ``auto`` (targeted incremental rebuilds): let Catalyst decide. The
    orchestrator has already pruned every state to the K dirty roots'
    rows, so the grouped side genuinely IS broadcast-sized in the
    common case and per-level broadcasts beat the merge sort+exchange
    chain (measured: 17 vs 19 jobs per delta batch)."""
    if child_join == "merge":
        if child_node is not None and states is not None:
            threshold = _auto_broadcast_bytes(grouped.sparkSession)
            scaled = (
                _subtree_scan_bytes(child_node, states)
                * _BROADCAST_DOC_EXPANSION
            )
            if threshold > 0 and scaled <= min(
                threshold, _BROADCAST_DOC_CEILING
            ):
                return grouped  # bounded dimension: Catalyst broadcasts
            _LOG.debug(
                "denormalize: forcing sort-merge for grouped children of "
                "%s (scaled estimate %d B > min(threshold %d B, ceiling "
                "%d B)) — overriding Catalyst's post-aggregate size guess",
                child_node.entity if child_node is not None else "?",
                scaled if child_node is not None else -1,
                threshold if child_node is not None else -1,
                _BROADCAST_DOC_CEILING,
            )
        return grouped.hint("merge")
    if child_join == "auto":
        return grouped
    raise ValueError(f"unknown child_join {child_join!r}")


def _build_node(
    node: Relation,
    states: Mapping[str, DataFrame],
    keys: Mapping[str, Sequence[str]],
    scope: DataFrame | None = None,
    child_order: str = "numeric",
    record_cols: Mapping[str, str] | None = None,
    child_join: str = "merge",
) -> DataFrame:
    """Post-order build: returns the node's state table with one extra
    struct column ``__doc`` holding the fully-nested document.

    ``scope`` (targeted incremental rebuild): for the root a DataFrame of
    root PK values, for a child a single-column DataFrame of needed
    join-key values. Each level is pruned with a broadcast semi-join
    before building, so rebuilding K dirty roots scans K-proportional
    data instead of the world — the Spark analog of the reference's
    per-PK point rebuilds (``Southpaw.java:368-396``)."""
    if node.entity not in states:
        raise KeyError(f"no state DataFrame supplied for entity {node.entity!r}")
    record_cols = record_cols or {}
    df = states[node.entity]
    if scope is not None:
        on = list(scope.columns)
        orig_cols = list(df.columns)
        # a list-ON join moves the join columns first; re-project to the
        # state's own order so Record field order (and therefore doc
        # bytes) is identical between targeted-incremental and full
        # builds — scope pruning must never change the output
        df = df.join(
            F.broadcast(scope.distinct()), on=on, how="left_semi"
        ).select(*orig_cols)
    base_cols = list(df.columns)
    if node.entity in record_cols:
        # dynamic per-record schema: Record IS the row's variant — each
        # row keeps exactly its own fields (reference MapRecord.toMap).
        record = F.col(record_cols[node.entity]).alias(RECORD_FIELD)
    else:
        # Record = all fields of the row, verbatim (reference Southpaw.java:418-426).
        record = F.struct(*[F.col(c) for c in base_cols]).alias(RECORD_FIELD)

    if not node.children:
        return df.withColumn(_DOC, F.struct(record))

    child_fields = []
    for child in node.children:
        child_scope = None
        if scope is not None:
            child_scope = df.where(F.col(child.parent_key).isNotNull()).select(
                F.col(child.parent_key).alias(child.join_key)
            )
        child_df = _build_node(
            child, states, keys, scope=child_scope, child_order=child_order,
            record_cols=record_cols, child_join=child_join,
        )
        child_pks = list(keys[child.entity])
        child_cols = states[child.entity].columns
        if _subtree_dynamic(child, record_cols):
            # VARIANT docs are not orderable by sort_array; collect then
            # array_sort with a comparator over the extracted typed PKs.
            jk_alias = f"__jk__{child.entity}"
            order_struct = F.struct(
                *[F.col(k).alias(f"__k{i}") for i, k in enumerate(child_pks)],
                F.col(_DOC).alias("__d"),
            )
            grouped = (
                child_df.where(F.col(child.join_key).isNotNull())
                .groupBy(F.col(child.join_key).alias(jk_alias))
                .agg(
                    F.array_sort(
                        F.collect_list(order_struct),
                        _pk_comparator(len(child_pks)),
                    ).alias(f"__arr__{child.entity}")
                )
            )
            df = df.join(
                _hinted(grouped, child_join, child, states),
                on=F.col(child.parent_key) == F.col(jk_alias),
                how="left",
            ).drop(jk_alias)
            arr = F.col(f"__arr__{child.entity}")
            docs = F.transform(arr, lambda x: x["__d"])
            child_fields.append(
                F.when(F.col(child.parent_key).isNull(), F.lit(None))
                .otherwise(F.coalesce(docs, F.array()))
                .alias(child.entity)
            )
            continue
        if child_order == "bytes":
            # strict reference byte order (e.g. 256=0x0100 sorts before
            # 2=0x02); opt-in — the default numeric order matches for
            # same-byte-length keys (SURVEY §1.6 declared divergence)
            bk = _byte_order_key(states[child.entity], child_pks)
            order_struct = F.struct(
                bk.alias("__bk"), F.col(_DOC).alias("__d")
            )
            jk_alias = f"__jk__{child.entity}"
            grouped = (
                child_df.where(F.col(child.join_key).isNotNull())
                .groupBy(F.col(child.join_key).alias(jk_alias))
                .agg(
                    F.sort_array(F.collect_list(order_struct)).alias(
                        f"__arr__{child.entity}"
                    )
                )
            )
            df = df.join(
                _hinted(grouped, child_join, child, states),
                on=F.col(child.parent_key) == F.col(jk_alias),
                how="left",
            ).drop(jk_alias)
            arr = F.col(f"__arr__{child.entity}")
            docs = F.transform(arr, lambda x: x["__d"])
            child_fields.append(
                F.when(F.col(child.parent_key).isNull(), F.lit(None))
                .otherwise(F.coalesce(docs, F.array()))
                .alias(child.entity)
            )
            continue
        # sort_array on structs compares fields in order. When the PK
        # columns are a prefix of the row columns (the overwhelmingly
        # common layout) the doc struct itself — whose first field is
        # Record with fields in row order — sorts identically to an
        # explicit (pk…, doc) struct, because a unique PK prefix decides
        # every comparison. Shuffling just the doc halves the aggregate
        # payload for wide entities versus duplicating the keys.
        keys_are_prefix = child_cols[: len(child_pks)] == child_pks
        if keys_are_prefix:
            order_struct = F.col(_DOC)
        else:
            order_struct = F.struct(
                *[F.col(k).alias(f"__k{i}") for i, k in enumerate(child_pks)],
                F.col(_DOC).alias("__d"),
            )
        jk_alias = f"__jk__{child.entity}"
        grouped = (
            child_df.where(F.col(child.join_key).isNotNull())
            .groupBy(F.col(child.join_key).alias(jk_alias))
            .agg(F.sort_array(F.collect_list(order_struct)).alias(f"__arr__{child.entity}"))
        )
        # Join strategy (guide §3.1): the grouped side carries each key's
        # ENTIRE child-subtree payload as one array — its true size is
        # Θ(child table), but Catalyst's post-aggregate estimate is tiny,
        # so under the default thresholds it BROADCASTS a relation that
        # measured ~15 s at sf0.1 (driver-side collect + single-threaded
        # HashedRelation build of 150k nested docs) and would OOM the
        # driver outright at scale. Force sort-merge: the groupBy's hash
        # partitioning is reused (the grouped side needs no second
        # exchange), bucketed/store-native state joins stay zero-exchange
        # co-located, and sorts spill gracefully. Measured q13 sf0.1:
        # 15.2 s → 5.3 s (min-of-3, same box window).
        df = df.join(
            _hinted(grouped, child_join, child, states),
            on=F.col(child.parent_key) == F.col(jk_alias),
            how="left",
        ).drop(jk_alias)
        # NULL parent key → field absent (null, dropped by to_json with
        # ignoreNullFields); present key with no match → empty array.
        arr = F.col(f"__arr__{child.entity}")
        docs = arr if keys_are_prefix else F.transform(arr, lambda x: x["__d"])
        child_fields.append(
            F.when(F.col(child.parent_key).isNull(), F.lit(None))
            .otherwise(F.coalesce(docs, F.array()))
            .alias(child.entity)
        )

    children = F.struct(*child_fields).alias(CHILDREN_FIELD)
    out = df.withColumn(_DOC, F.struct(record, children))
    return out.drop(*[c for c in out.columns if c.startswith("__arr__")])


def denormalize(
    states: Mapping[str, DataFrame],
    relation: Relation,
    keys: Mapping[str, Sequence[str]],
    doc_col: str = "doc",
    root_keys: DataFrame | None = None,
    child_order: str = "numeric",
    record_cols: Mapping[str, str] | None = None,
    child_join: str = "merge",
) -> DataFrame:
    """Build the nested-document table for one relation tree.

    Parameters
    ----------
    states: entity name → current-state DataFrame (post ``current_state``).
    relation: validated relation tree (root).
    keys: entity name → primary-key column list (used for child ordering
        and the output key).
    child_order: ``"numeric"`` (default — natural typed order) or
        ``"bytes"`` — exact reference parity: children ordered by the
        stripped-big-endian ByteArray encoding of their PK
        (``Southpaw.java:343-352`` TreeMap over ``util/ByteArray.java``
        keys). The two coincide except for numeric keys of differing
        byte length (SURVEY §1.6).
    record_cols: entities in *dynamic per-record schema* mode — entity
        name → name of a VARIANT column (see ``parse_dynamic``) holding
        the row body. Those entities' ``Record`` is the variant itself
        (reference ``record/MapRecord.java:41-50``: schema is whatever
        each row carries), so heterogeneous rows of one entity in one
        changelog build correct docs. Static and dynamic entities mix
        freely in one tree.

    Returns a DataFrame with the root's PK columns plus ``doc_col`` — one
    row per live root. Root tombstones are the caller's concern
    (``denormalize_to_json`` unions them in). ``root_keys`` restricts the
    build to those roots (targeted incremental rebuild).
    """
    if child_order not in ("numeric", "bytes"):
        raise ValueError(f"unknown child_order {child_order!r}")
    root_pks = list(keys[relation.entity])
    scope = root_keys.select(*root_pks) if root_keys is not None else None
    built = _build_node(
        relation, states, keys, scope=scope, child_order=child_order,
        record_cols=record_cols, child_join=child_join,
    )
    return built.select(*root_pks, F.col(_DOC).alias(doc_col))


def denormalize_to_json(
    states: Mapping[str, DataFrame],
    relation: Relation,
    keys: Mapping[str, Sequence[str]],
    tombstoned_roots: DataFrame | None = None,
    record_cols: Mapping[str, str] | None = None,
) -> DataFrame:
    """Nested docs serialized to canonical JSON strings, with null values
    for tombstoned roots (reference output-topic contract, SURVEY §1.6).

    ``ignoreNullFields`` drops null Children entries, producing the
    reference's absent-key semantics in the serialized form.
    """
    docs = denormalize(states, relation, keys, record_cols=record_cols)
    root_pks = list(keys[relation.entity])
    out = docs.select(
        *root_pks,
        F.to_json(F.col("doc"), {"ignoreNullFields": "true"}).alias("value"),
    )
    if tombstoned_roots is not None:
        nulls = tombstoned_roots.select(
            *root_pks, F.lit(None).cast("string").alias("value")
        )
        out = out.unionByName(nulls)
    return out


def affected_root_keys(
    states: Mapping[str, DataFrame],
    relation: Relation,
    entity: str,
    changed_keys: DataFrame,
    keys: Mapping[str, Sequence[str]],
) -> DataFrame:
    """Dirty-root propagation (reference ``Southpaw.java:563-594``, O11).

    Given the set of changed join-key values for ``entity`` (the union of
    old and new FK values of every delta row — FK repointing means the old
    parent's document must also rebuild, reference ``index/Index.java:105-114``),
    walk the relation tree upward and return the distinct root PKs whose
    documents must be rebuilt.

    ``changed_keys``: for the root entity, a DataFrame of root PK columns;
    for a child entity, a single-column DataFrame named after the child's
    ``join_key`` holding changed FK values.

    Spark-first: the reverse indexes the reference maintains in RocksDB are
    *derived* here by joining the delta up the tree per micro-batch —
    each hop is one equi-join that Catalyst broadcasts when the delta is
    small (the common case).
    """
    root_pks = list(keys[relation.entity])
    if entity == relation.entity:
        return changed_keys.select(*root_pks).distinct()

    # Locate path root → … → entity.
    def find_path(node: Relation, path: list[Relation]) -> list[Relation] | None:
        path = path + [node]
        if node.entity == entity:
            return path
        for child in node.children:
            found = find_path(child, path)
            if found:
                return found
        return None

    path = find_path(relation, [])
    if not path:
        raise KeyError(f"entity {entity!r} not in tree {relation.denormalized_name!r}")

    # Fold upward: child join-key values → parent rows → parent's own
    # linkage value (its join_key if it is itself a child, else root PKs).
    current = changed_keys
    for i in range(len(path) - 1, 0, -1):
        child, parent = path[i], path[i - 1]
        jk_col = child.join_key
        parent_df = states[parent.entity]
        matched = parent_df.join(
            F.broadcast(current.select(F.col(jk_col).alias("__dirty")).distinct()),
            on=F.col(child.parent_key) == F.col("__dirty"),
            how="inner",
        )
        if parent is relation:  # reached the root
            return matched.select(*root_pks).distinct()
        current = matched.select(F.col(parent.join_key).alias(parent.join_key))
    raise AssertionError("unreachable")
