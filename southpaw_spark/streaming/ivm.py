"""Incremental view maintenance: the foreachBatch orchestrator.

This is the one genuinely custom component the reference engine amounts
to (SURVEY §4.2): per micro-batch of CDC deltas,

1. intra-batch dedup (latest event per key within the batch);
2. capture FK **pre-images** — the state rows being replaced — *before*
   merging, because a child whose FK moved must dirty its *old* parent
   too (reference reverse join index, ``index/Index.java:105-114``);
3. merge the delta into the entity state table (upsert + tombstone
   delete);
4. propagate dirty keys up each relation tree (old ∪ new FK values →
   ``affected_root_keys``), union with root-entity deltas;
5. rebuild only the dirty roots' documents (scope-pruned denormalize)
   and emit ``(root_pk, json)`` upserts plus ``(root_pk, null)``
   tombstones for dirty roots that no longer exist.

Every step is a DataFrame plan — deltas are typically small, so the
dirty-key joins broadcast; the rebuild scans K-proportional data via
semi-join pruning.

Commit ordering (reference ``Southpaw.java:297-315`` — output topics are
flushed *before* state): the state merge is staged (files written, the
``_CURRENT`` pointer NOT flipped), outputs are computed from the staged
version and pushed to the sink, and only then are the pointers flipped.
A crash anywhere before the flip replays the batch against the
*pre-merge* state, so FK pre-images (old parents of repointed children)
are recomputed identically — at-least-once to the sink with no
permanently-stale documents. A crash between the flip and the streaming
checkpoint advance replays with post-merge state: outputs are re-emitted
(possibly as no-op upserts), the same at-least-once window the reference
has between topic flush and offset commit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from southpaw_spark.operators.cdc import (
    FilterRule,
    OldAwareFilterRule,
    apply_filter_rules,
    apply_old_aware_rules,
    latest_by_key,
)
from southpaw_spark.operators.denormalize import (
    affected_root_keys,
    denormalize,
)
from southpaw_spark.relations import Relation
from southpaw_spark.streaming.state import ParquetStateStore


@dataclass
class IncrementalDenormalizer:
    spark: SparkSession
    relations: Sequence[Relation]
    keys: Mapping[str, Sequence[str]]
    store: ParquetStateStore
    filter_rules: Mapping[str, Sequence[FilterRule]] = field(default_factory=dict)
    #: O5 second half — rules whose predicates see the previous state row
    #: as ``old.*`` (reference ``customFilter(entity, rec, oldRec)``);
    #: see ``cdc.unchanged_skip_rule`` for the canonical no-op-update skip.
    old_filter_rules: Mapping[str, Sequence[OldAwareFilterRule]] = field(
        default_factory=dict
    )
    seq_col: str = "seq"
    tombstone_col: str = "is_tombstone"
    #: additive state-schema evolution (a changelog gains a field — the
    #: reference's schema-fluid MapRecord case): opt-in; see
    #: ``ParquetStateStore.merge(allow_schema_evolution=...)``.
    allow_schema_evolution: bool = False
    #: dynamic per-record schema entities (entity → VARIANT column, see
    #: ``operators.denormalize.parse_dynamic``): their ``Record`` is the
    #: row's own variant in every incremental rebuild, so MapRecord-style
    #: heterogeneous entities ride the streaming loop end-to-end.
    record_cols: Mapping[str, str] = field(default_factory=dict)
    #: when true, per-batch counters are recorded in ``metrics`` using the
    #: reference's metric names (``metric/Metrics.java``): records
    #: consumed per entity, denormalized records created/tombstoned per
    #: tree. Costs extra count() jobs — off by default.
    collect_metrics: bool = False
    metrics: dict = field(default_factory=dict)  # a streaming.Metrics works too
    #: O12 queueing-strategy surface (reference
    #: ``strategy/QueueingStrategy.java:12-32``): callable
    #: ``(denormalized_name, entity) -> 'high'|'medium'|'low'|'none'``.
    #: ``none`` drops that entity's dirty contributions for that tree
    #: (reference: records routed to the NONE queue are discarded).
    queueing_strategy: object = None
    #: O12 drain ordering + O21 time-boxed rebuild batching: when set,
    #: at most this many dirty roots are rebuilt per batch, selected in
    #: priority order (high < medium < low, then root PK); the remainder
    #: is persisted as a carry-over queue in the state store and drained
    #: in subsequent batches — the Spark analog of the reference's
    #: priority queues + createTimeout loop (``Southpaw.java:255-285``).
    #: Deferred roots rebuild from *later* state, which matches the
    #: reference (documents reflect state at rebuild time).
    max_roots_per_batch: int | None = None
    #: reference auto-backup (``backup.time.s``, ``Southpaw.java:138``,
    #: ``commit()`` → ``state.backup()``) — batch-count-based here so
    #: behavior is deterministic under test: after every N committed
    #: batches, snapshot the store into ``backup_dir``.
    backup_dir: str | None = None
    backup_every_n_batches: int = 0
    backup_retention: int | None = None
    #: native co-located rebuilds (BASELINE.md §11, now default): state
    #: is bucketed by each entity's TREE JOIN KEY at bootstrap (when
    #: that key is a subset of the entity PK — the correctness bound for
    #: merge pruning) and rebuild reads go through
    #: ``ParquetStateStore.read_bucketed``, so the per-level
    #: ``groupBy(join_key)`` + parent⋈children joins run with zero
    #: exchanges. Rows are byte-identical to plain reads; legacy state
    #: dirs without the ``_BUCKETCOLS`` sidecar fall back silently.
    bucketed_reads: bool = True
    _batches_since_backup: int = field(default=0, init=False, repr=False)

    def _bump(self, name: str, n: int) -> None:
        self.metrics[name] = self.metrics.get(name, 0) + n

    def _tree_bucket_cols(self, entity: str) -> list[str]:
        """The bucket layout for an entity: its join key where it is a
        child (first relation wins), its PK where it is only a root —
        restricted to join keys that are PK subsets, because merge
        pruning locates OLD rows by delta-key hash: a non-key bucket
        column (an FK that can repoint) would strand the old row in an
        unscanned bucket."""
        key_cols = list(self.keys[entity])
        for rel in self.relations:
            node = rel.find_entity(entity)
            if node is None or entity == rel.entity:
                continue
            jk = getattr(node, "join_key", None)
            if jk is not None and set([jk]) <= set(key_cols):
                return [jk]
        return key_cols

    def _needs_pre_image(self, entity: str, key_cols: Sequence[str]) -> bool:
        """Whether a delta batch for ``entity`` must read the previous
        state rows (the pre-image). Two consumers exist: old-aware
        filter rules (checked by the caller), and FK-repointing
        detection — the old row's join-key value can differ from the
        delta row's only when some tree node joins this entity on a
        column OUTSIDE its primary key. When every node's join key is a
        PK subset, the old row for a delta key carries the *same* join
        key value by definition, so the delta's own keys (upserts and
        tombstones alike) already name every foreign-key value the
        rebuild must chase — the per-batch pre-image scan is pure
        waste (guide §1.2: don't compute things you throw away)."""
        kset = set(key_cols)
        for rel in self.relations:
            for node in rel.walk():
                if node.entity != entity or node is rel:
                    continue
                jk = getattr(node, "join_key", None)
                if jk is None or jk not in kset:
                    return True
        return False

    def _state_read(self, entity: str, version: int | None = None) -> DataFrame:
        if self.bucketed_reads:
            try:
                return self.store.read_bucketed(entity, version)
            except (ValueError, AttributeError):
                pass  # legacy layout / store without bucketed reads
        if version is not None:
            return self.store.read_version(entity, version)
        return self.store.read(entity)

    def _entities(self) -> list[str]:
        seen: list[str] = []
        for rel in self.relations:
            for e in rel.entities():
                if e not in seen:
                    seen.append(e)
        return seen

    def bootstrap(
        self,
        snapshots: Mapping[str, DataFrame],
        schemas: Mapping[str, object] | None = None,
    ) -> None:
        """Initialize state tables from full snapshots. Tree entities
        absent from ``snapshots`` are initialized *empty* from
        ``schemas[entity]`` (a StructType) when given — without it, a
        tree entity that never receives a delta would fail state reads
        mid-stream with FileNotFoundError."""
        for entity in self._entities():
            bcols = (
                self._tree_bucket_cols(entity) if self.bucketed_reads else None
            )
            if entity in snapshots:
                self.store.init(
                    entity, snapshots[entity], self.keys[entity],
                    bucket_cols=bcols,
                )
            elif schemas and entity in schemas:
                empty = self.spark.createDataFrame([], schemas[entity])
                self.store.init(
                    entity, empty, self.keys[entity], bucket_cols=bcols
                )

    def _prune_states_for_tree(
        self,
        states: Mapping[str, DataFrame],
        rel: Relation,
        dirty: DataFrame,
        cached: list,
    ) -> dict[str, DataFrame] | None:
        """Linear targeted-rebuild pruning: walk the tree top-down and
        semi-join each entity's state once against the key values its
        (already pruned, cached) parent actually carries — the same key
        sets denormalize's per-level scopes compute, but each prune is
        evaluated exactly once instead of once per descendant subtree.

        Returns entity → pruned DataFrame (entities outside the tree
        pass through untouched), or ``None`` when an entity appears at
        more than one node of the tree — per-node key sets then differ
        and the caller falls back to scope chaining, which prunes per
        node by construction."""
        # duplicate-entity trees keep the (correct) scope-chaining path
        nodes: list[Relation] = []

        def walk(n: Relation) -> None:
            nodes.append(n)
            for c in n.children:
                walk(c)

        walk(rel)
        entities = [n.entity for n in nodes]
        if len(entities) != len(set(entities)):
            return None

        pruned = dict(states)
        base = states[rel.entity]
        root_pks = list(self.keys[rel.entity])
        root_pruned = base.join(
            F.broadcast(dirty.select(*root_pks).distinct()),
            on=root_pks,
            how="left_semi",
        ).select(*base.columns)
        if rel.children:
            root_pruned = root_pruned.cache()
            cached.append(root_pruned)
        pruned[rel.entity] = root_pruned
        level = [rel]
        while level:
            nxt: list[Relation] = []
            for node in level:
                parent_df = pruned[node.entity]
                for child in node.children:
                    keys_df = (
                        parent_df.where(F.col(child.parent_key).isNotNull())
                        .select(F.col(child.parent_key).alias(child.join_key))
                        .distinct()
                    )
                    cbase = states[child.entity]
                    cp = cbase.join(
                        F.broadcast(keys_df),
                        on=[child.join_key],
                        how="left_semi",
                    ).select(*cbase.columns)
                    if child.children:
                        cp = cp.cache()
                        cached.append(cp)
                    pruned[child.entity] = cp
                    nxt.append(child)
            level = nxt
        return pruned

    # -- the per-batch step -------------------------------------------

    def process_batch(
        self, deltas: Mapping[str, DataFrame], sink=None
    ) -> dict[str, DataFrame]:
        """Apply one micro-batch of per-entity changelog deltas; returns
        {denormalized_name: DataFrame[root pks…, value]} with JSON doc
        upserts and null-value tombstones for every dirty root.

        With ``sink(name, df)`` supplied (the streaming path), outputs
        are pushed to the sink *before* the staged state versions are
        committed — the reference's output-before-flush ordering. Without
        a sink (batch mode) the merge commits before returning; the
        returned lazy DataFrames pin concrete version directories, which
        the default vacuum retention (2 versions) keeps alive through the
        following batch.
        """
        cached: list[DataFrame] = []
        staged: dict[str, int] = {}
        drop_after_commit: list[str] = []
        try:
            # 1+2+3: per entity — dedup, pre-image, STAGED merge (files
            # written, pointer not yet flipped).
            new_fk_values: dict[str, DataFrame] = {}
            old_rows: dict[str, DataFrame] = {}
            batch_keys: dict[str, DataFrame] = {}
            merge_jobs: list = []
            for entity, delta in deltas.items():
                key_cols = list(self.keys[entity])
                rules = self.filter_rules.get(entity, ())
                if self.collect_metrics:
                    self._bump(f"records.consumed.{entity}", delta.count())
                delta = apply_filter_rules(delta, rules, self.tombstone_col)
                delta = latest_by_key(delta, key_cols, self.seq_col)
                delta = delta.cache()
                cached.append(delta)
                old_all: DataFrame | None = None
                touched_ids: list | None = None
                o_rules = self.old_filter_rules.get(entity, ())
                need_old = bool(o_rules) or self._needs_pre_image(
                    entity, key_cols
                )
                if self.store.exists(entity):
                    # One bounded (≤ n_buckets) collect per entity: the
                    # delta keys' state-bucket ids. Shared by the pruned
                    # pre-image read below AND the merge's touched set —
                    # merge skips its own touched-bucket collect job, and
                    # the pre-image lookup scans only the bucket
                    # partitions that can hold a delta key instead of the
                    # whole state table (the dedup-stream _pruned_read
                    # trick, guide §6 pushdown). Capability-gated: only
                    # stores with physical __bucket partitioning expose
                    # _resolve_bucket_cols/_bucket_col (ParquetStateStore);
                    # DeltaStateStore and other drop-ins fall back to the
                    # plain key semi-join over the full state read (their
                    # own format's data skipping takes over).
                    pre_image = self.store.read(entity)
                    if hasattr(self.store, "_resolve_bucket_cols") and hasattr(
                        self.store, "_bucket_col"
                    ):
                        bcols = self.store._resolve_bucket_cols(
                            entity, key_cols, None
                        )
                        touched_ids = [
                            r["__b"]
                            for r in delta.select(
                                self.store._bucket_col(bcols).alias("__b")
                            )
                            .distinct()
                            .collect()
                        ]
                        pre_image = pre_image.where(
                            F.col("__bucket").isin(touched_ids)
                        )
                    # the pre-image semi-join + cache runs only for
                    # entities that actually consume it (old-aware
                    # rules, or a tree join key outside the PK — see
                    # _needs_pre_image); the bucket-id collect above
                    # still feeds the merge's touched set either way
                    if need_old:
                        old_all = (
                            pre_image
                            .join(
                                F.broadcast(
                                    delta.select(*key_cols).distinct()
                                ),
                                on=key_cols,
                                how="left_semi",
                            )
                            .cache()
                        )
                        cached.append(old_all)
                if o_rules:
                    delta = apply_old_aware_rules(
                        delta, old_all, o_rules, key_cols, self.tombstone_col
                    ).cache()
                    cached.append(delta)
                dk = delta.select(*key_cols)
                batch_keys[entity] = dk
                if old_all is not None:
                    if o_rules:
                        # pre-images of rows actually being replaced
                        # (old-aware rules may have dropped delta rows)
                        old_rows[entity] = old_all.join(
                            F.broadcast(dk.distinct()),
                            on=key_cols,
                            how="left_semi",
                        )
                    else:
                        # without old-aware rules the delta's key set is
                        # unchanged, so old_all already IS the pre-image
                        # set — the second semi-join would be a no-op
                        old_rows[entity] = old_all
                upserts = delta.where(
                    ~F.coalesce(F.col(self.tombstone_col), F.lit(False))
                ).drop(self.seq_col, self.tombstone_col)
                dels = delta.where(
                    F.coalesce(F.col(self.tombstone_col), F.lit(False))
                ).select(*key_cols)
                new_fk_values[entity] = upserts
                merge_jobs.append(
                    (entity, upserts, dels, key_cols, touched_ids)
                )

            # Per-entity merges are independent (separate state dirs and
            # version pointers; each reads its own PRE-merge state for
            # the anti-join, captured above) — stage them concurrently
            # to overlap their small-job latency on multi-entity
            # batches. All stages complete before any rebuild reads or
            # pointer flips.
            if merge_jobs:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(4, len(merge_jobs))
                ) as pool:
                    futures = [
                        (
                            e,
                            pool.submit(
                                self.store.merge, e, ups, dl, kc,
                                commit=False,
                                allow_schema_evolution=(
                                    self.allow_schema_evolution
                                ),
                                touched_ids=tids,
                            ),
                        )
                        for e, ups, dl, kc, tids in merge_jobs
                    ]
                    for e, fut in futures:
                        staged[e] = fut.result()

            # 4+5: per tree — dirty roots, targeted rebuild, tombstones —
            # all against the staged (post-merge, uncommitted) state.
            states: dict[str, DataFrame] = {}
            for e in self._entities():
                if e in staged:
                    states[e] = self._state_read(e, staged[e])
                elif self.store.exists(e):
                    states[e] = self._state_read(e)
                else:
                    raise FileNotFoundError(
                        f"no state for entity {e!r}: bootstrap() every tree "
                        "entity first (pass schemas= for entities without "
                        "snapshots)"
                    )
            prio_rank = {"high": 0, "medium": 1, "low": 2}
            outputs: dict[str, DataFrame] = {}
            for rel in self.relations:
                root_pks = list(self.keys[rel.entity])
                pending_entity = f"__pending__{rel.denormalized_name}"
                dirty: DataFrame | None = None
                # carry-over queue from earlier capped batches drains first
                if self.store.exists(pending_entity):
                    pend = self.store.read(pending_entity)
                    if "__prio" not in pend.columns:  # defensive
                        pend = pend.withColumn("__prio", F.lit(0))
                    dirty = pend.select(*root_pks, "__prio")
                for entity, delta_keys in batch_keys.items():
                    node = rel.find_entity(entity)
                    if node is None:
                        continue
                    priority = "high"
                    if self.queueing_strategy is not None:
                        priority = self.queueing_strategy(
                            rel.denormalized_name, entity
                        )
                        if priority == "none":
                            continue
                    if entity == rel.entity:
                        contrib = delta_keys.select(*root_pks)
                    else:
                        jk = node.join_key
                        if (
                            entity in old_rows
                            or jk not in batch_keys[entity].columns
                        ):
                            fks = new_fk_values[entity].select(
                                F.col(jk).alias(jk)
                            )
                            if entity in old_rows:
                                fks = fks.unionByName(
                                    old_rows[entity].select(
                                        F.col(jk).alias(jk)
                                    )
                                )
                        else:
                            # join key ⊆ PK and no pre-image was read
                            # (_needs_pre_image): the delta keys carry
                            # every old AND new join-key value —
                            # upserts and tombstones alike — directly
                            fks = batch_keys[entity].select(
                                F.col(jk).alias(jk)
                            )
                        fks = fks.where(F.col(jk).isNotNull()).distinct()
                        contrib = affected_root_keys(
                            states, rel, entity, fks, self.keys
                        )
                    contrib = contrib.withColumn(
                        "__prio", F.lit(prio_rank.get(priority, 0))
                    )
                    dirty = (
                        contrib if dirty is None else dirty.unionByName(contrib)
                    )
                if dirty is None:
                    continue
                # a root dirtied via several entities takes its highest
                # (numerically lowest) priority
                dirty = dirty.groupBy(*root_pks).agg(
                    F.min("__prio").alias("__prio")
                )
                if self.max_roots_per_batch is not None:
                    # TakeOrdered top-K (per-partition top-K + driver
                    # merge — no full sort shuffle): highest priority
                    # first, PK as the deterministic tie-break
                    selected = dirty.orderBy("__prio", *root_pks).limit(
                        self.max_roots_per_batch
                    )
                    deferred = dirty.join(
                        selected.select(*root_pks), on=root_pks, how="left_anti"
                    ).cache()
                    cached.append(deferred)
                    if deferred.limit(1).count() > 0:
                        staged[pending_entity] = self.store.init(
                            pending_entity, deferred, root_pks, commit=False
                        )
                    elif self.store.exists(pending_entity):
                        if sink is not None:
                            # streaming: fully drained → drop the queue
                            # entity after the commit (absence doubles as
                            # the cheap emptiness test; re-staging an
                            # empty queue every batch would be a write
                            # job + version churn per tree per batch)
                            drop_after_commit.append(pending_entity)
                        else:
                            # batch mode returns LAZY outputs that may
                            # still reference the queue files — clear
                            # instead of dropping
                            staged[pending_entity] = self.store.init(
                                pending_entity,
                                dirty.where(F.lit(False)),
                                root_pks,
                                commit=False,
                            )
                    dirty = selected
                elif self.store.exists(pending_entity):
                    # uncapped batch drains the whole queue
                    if sink is not None:
                        drop_after_commit.append(pending_entity)
                    else:
                        staged[pending_entity] = self.store.init(
                            pending_entity,
                            dirty.where(F.lit(False)),
                            root_pks,
                            commit=False,
                        )
                dirty = dirty.select(*root_pks).distinct().cache()
                cached.append(dirty)

                # Targeted rebuild over PRE-PRUNED per-node states
                # instead of denormalize's scope chaining. Scope
                # chaining embeds the parent's pruned subplan inside
                # every child's semi-join broadcast, so the root prune
                # re-evaluates once per DESCENDANT (exponential in tree
                # depth: orders⋉dirty ran ~5× per batch) and the driver
                # builds a plan tree that grows the same way (~1 s of
                # pure plan construction per batch measured at sf0.1).
                # Pruning top-down with each pruned parent CACHED keeps
                # the work linear: every entity's prune evaluates once,
                # children semi-join against the cached parent's keys.
                # Same rows by construction (each node's key set is
                # identical to what its scope would have computed).
                pruned = self._prune_states_for_tree(
                    states, rel, dirty, cached
                )
                if pruned is None:  # duplicate-entity tree: scope chain
                    # child_join="auto" here too: the size hint gate
                    # measures the FULL child states (scope pruning is
                    # invisible in the states mapping), so the default
                    # 'merge' would force fact-sized children of a
                    # K-dirty targeted rebuild to sort-merge where
                    # Catalyst correctly broadcasts the tiny scoped
                    # grouped side (ADVICE r15).
                    docs = denormalize(
                        states, rel, self.keys, root_keys=dirty,
                        record_cols=self.record_cols or None,
                        child_join="auto",
                    )
                else:
                    # child_join="auto": the pruned states are
                    # K-proportional, so per-level broadcasts of the
                    # grouped children beat forced sort-merge here
                    # (17 vs 19 jobs per delta batch measured)
                    docs = denormalize(
                        pruned, rel, self.keys,
                        record_cols=self.record_cols or None,
                        child_join="auto",
                    )
                live = docs.select(
                    *root_pks,
                    F.to_json(
                        F.col("doc"), {"ignoreNullFields": "true"}
                    ).alias("value"),
                )
                # dirty roots with no surviving state row → tombstone output
                gone = dirty.join(
                    states[rel.entity].select(*root_pks),
                    on=root_pks,
                    how="left_anti",
                ).select(*root_pks, F.lit(None).cast("string").alias("value"))
                outputs[rel.denormalized_name] = live.unionByName(gone)
                if self.collect_metrics:
                    name = rel.denormalized_name
                    self._bump(
                        f"denormalized.records.created.{name}", live.count()
                    )
                    self._bump(
                        f"denormalized.records.tombstoned.{name}", gone.count()
                    )

            # outputs BEFORE commit (crash ⇒ replay against pre-merge state)
            if sink is not None:
                for name, out in outputs.items():
                    sink(name, out)
            import time as _time

            t0 = _time.monotonic()
            for entity, version in staged.items():
                self.store.commit(entity, version)
            if hasattr(self.metrics, "timer"):  # streaming.Metrics registry
                self.metrics.timer(
                    "states.committed", _time.monotonic() - t0
                )
            # drained queues drop only after the commit: a crash before
            # this point replays the batch with the old queue intact
            # (at-least-once re-emission, never loss)
            for name in drop_after_commit:
                self.store.drop_entity(name)
            self.store.vacuum(keep=2)
            if self.backup_dir and self.backup_every_n_batches:
                self._batches_since_backup += 1
                if self._batches_since_backup >= self.backup_every_n_batches:
                    self.store.backup(
                        self.backup_dir, retention=self.backup_retention
                    )
                    self._batches_since_backup = 0
            return outputs
        finally:
            for df in cached:
                df.unpersist()

    # -- structured-streaming wiring ----------------------------------

    def attach_stream(
        self,
        source: DataFrame,
        entity_col: str,
        checkpoint_dir: str,
        sink,
        trigger: dict | None = None,
        entity_columns: Mapping[str, Sequence[str]] | None = None,
    ):
        """Wire a unified CDC stream (one DataFrame carrying an entity
        discriminator column, e.g. parsed from Kafka topic names) into
        the orchestrator via foreachBatch.

        A multi-entity stream carries the union of all entity columns
        (absent fields null); pass ``entity_columns`` (entity → its
        changelog columns incl. seq/is_tombstone) so each slice is
        projected back to its own schema before state maintenance —
        otherwise foreign null columns would be mistaken for payload.

        ``sink(denorm_name, df)`` receives each tree's output batch —
        e.g. a Kafka writer mapping (key=pk bytes, value=json|null).
        """

        def _process(batch_df: DataFrame, batch_id: int) -> None:
            batch_df = batch_df.cache()
            try:
                # one probe job for the whole batch (not one isEmpty()
                # per entity): which entities are present?
                present = {
                    r[0]
                    for r in batch_df.select(entity_col).distinct().collect()
                }
                deltas = {}
                for entity in self._entities():
                    if entity not in present:
                        continue
                    d = batch_df.where(F.col(entity_col) == entity).drop(
                        entity_col
                    )
                    if entity_columns and entity in entity_columns:
                        d = d.select(*entity_columns[entity])
                    deltas[entity] = d
                if not deltas and not any(
                    self.store.exists(f"__pending__{r.denormalized_name}")
                    for r in self.relations
                ):
                    return
                # A delta-less batch still runs when a carry-over queue is
                # outstanding, so deferred roots drain on ANY trigger —
                # not only ones carrying tree-entity data. (If the source
                # goes fully silent no micro-batch fires at all; a
                # periodic process_batch({}) covers hard drain deadlines.)
                # sink inside process_batch: outputs flush before the
                # state-version commit (crash-consistent ordering)
                self.process_batch(deltas, sink=sink)
            finally:
                batch_df.unpersist()

        writer = (
            source.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()
