"""Incremental corpus deduplication: the streaming/IVM counterpart of
the batch dedup cascade (d01/d03/d08).

A training-data pipeline doesn't dedup a frozen corpus once — documents
arrive continuously, and each new batch must be checked against
everything already *kept*, without ever re-comparing the whole corpus.
This module runs the exact→fuzzy cascade per micro-batch against a
persistent LSH state riding the same :class:`ParquetStateStore` the
denormalizer uses (versioned, crash-consistent, backup-able):

* ``dedup_exact``   — content_hash → keeper id (exact-dup pointer table)
* ``dedup_buckets`` — (band, bucket) → kept-doc id array (inverted LSH index)
* ``dedup_sigs``    — kept doc id → MinHash signature

Per batch, work is proportional to the BATCH (plus its bucket
collisions in state), never the corpus, at both the compute AND the I/O
layer: every state lookup first computes the hash-bucket ids its keys
can live in and reads ONLY those partitions (the same pruning
``ParquetStateStore.merge`` uses — a bounded ≤ ``n_buckets`` collect,
then a partition ``isin`` filter). The inverted index is keyed by
(band, bucket) with the member ids as an array, so both its lookup and
its read-modify-write upsert prune on ``hash(band, bucket)``. Fuzzy
comparison is signature agreement — no text re-fetch; state stays
O(num_hashes) per kept doc. Size ``n_buckets`` to the corpus (state
partitions should fit an executor), exactly as for entity state.

Semantics (documented, pinned by tests):

* a new doc is dropped iff it exact-matches a kept doc, or its
  signature agreement with some bucket-colliding KEPT doc ≥
  ``sim_threshold``, or it falls in a within-batch near-dup cluster and
  is not the cluster's min id;
* keepers are always kept docs (pointers resolve transitively within
  the batch before anything is recorded);
* incremental greediness: matching is against *kept* docs only — a doc
  similar only to a previously-dropped doc is kept. Chunking can
  therefore change which member of a similarity chain survives (A~B,
  B~C, A≁C: one batch keeps {A}; chunked arrival keeps {A, C}), but
  the kept set is always pairwise-dissimilar and every dropped doc
  points at a kept similar doc — the invariants that matter
  downstream. Whole corpus in one call ≡ the batch cascade
  (parity test).

Similarity is the MinHash agreement fraction — an unbiased estimator
of Jaccard with variance J(1-J)/num_hashes; raise ``num_hashes`` for a
tighter estimate (state and bucket work scale linearly with it).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from southpaw_spark.operators.dedup import (
    band_buckets,
    connected_components,
    minhash_signatures,
)

_EXACT = "dedup_exact"
_SIGS = "dedup_sigs"
_BUCKETS = "dedup_buckets"
#: best_quality mode only: cluster REPRESENTATIVE (the first-kept member,
#: whose signatures stay in the index forever) → current quality keeper.
#: Reps are stable so the pointer/index tables never need rewriting when
#: a later, better duplicate takes over the keeper role.
_REPS = "dedup_reps"
_VREPS = "vdedup_reps"
_REPS_SCHEMA = "rep_id long, keeper_id long, keeper_score double"


def _quality_swap_join(
    dd,
    rep_hits,
    scores,
    reps_entity,
    extra_rep_targets=None,
    driver_cap: int = 100_000,
):
    """Shared best-quality keeper-swap machinery (text + vector
    dedupers): given this batch's joiner→rep hits and the batch's
    quality scores, read the touched reps' current keepers (pruned),
    pick each rep's new keeper as the lexicographic min of
    (−score nulls-last, id) over {current keeper} ∪ joiners — the SAME
    key ``cluster_keepers`` uses, so by induction the streaming keeper
    equals the batch argmax over all members seen — and emit the
    decision frames. Returns ``(near_state, swaps_in, retro, winners,
    reps_read)``.

    **Bounded driver fast path (default).** The swap inputs are
    BATCH-bounded, not corpus-bounded — one joiner row per near-dup in
    this batch, one reps row per touched rep — and the distributed
    formulation spends its wall on per-job driver overhead, not work:
    its ~6 tiny-frame joins + 2 groupBys spawn dozens of AQE stage
    jobs at a few hundred ms each (measured: the best_quality batch
    ran 121 jobs totalling 14 s of executor time under 39 s of wall).
    When the joiner count ≤ ``driver_cap``, the decision runs in plain
    Python over two bounded collects and the decision frames are
    LITERAL local relations — zero exchanges, zero AQE stages —
    exactly the `operators/dedup.py` union-find fast-path pattern
    (bounded collect + distributed fallback, equality pinned by the
    chunking-parity tests, which run both arms). Beyond the cap the
    original distributed plan runs unchanged."""
    ic = dd.id_col
    rep_targets = rep_hits.select(F.col("__rep").alias("rep_id"))
    if extra_rep_targets is not None:
        rep_targets = rep_targets.unionByName(extra_rep_targets)
    reps_read = dd._pruned_read(
        reps_entity, _REPS_SCHEMA, rep_targets.distinct(), ["rep_id"]
    ).select(
        "rep_id",
        F.col("keeper_id").alias("__cur_keeper"),
        F.col("keeper_score").alias("__cur_score"),
    )
    joiners = rep_hits.join(scores, ic).select(
        F.col("__rep").alias("rep_id"),
        F.col(ic).alias("__cand"),
        F.col("__sc"),
    )
    # ONE bounded action probes the driver fast-path AND fetches both
    # of its inputs: the joiner rows (limit cap+1 — the cap check runs
    # on the collected length, so the semantics of the old count()
    # gate are unchanged) tagged and unioned with the touched reps'
    # current keepers. The previous count() + collect() + collect()
    # trio of jobs folds into a single collect (guide §5: the
    # per-batch fixed cost here is job count, not data — every input
    # is batch-bounded). Beyond the cap the distributed arm runs
    # unchanged on the uncollected frames.
    probe = (
        joiners.limit(driver_cap + 1)
        .withColumn("__src", F.lit("j"))
        .unionByName(
            reps_read.select(
                "rep_id",
                F.col("__cur_keeper").alias("__cand"),
                F.col("__cur_score").alias("__sc"),
            ).withColumn("__src", F.lit("r"))
        )
        .collect()
    )
    jrows = [r for r in probe if r["__src"] == "j"]
    if len(jrows) <= driver_cap:
        rrows = [r for r in probe if r["__src"] == "r"]
        return _quality_swap_driver(dd, rep_hits, jrows, rrows)
    # persisted: consumed by the swap decision AND the caller's
    # exact-pointer resolution — without the persist each consumer
    # re-scans the pruned reps partitions
    reps_read = reps_read.persist()
    # current keeper per touched rep; a rep with no reps-table row
    # (state built in min_id mode) is its own keeper, score null
    # (ranked last — same rule as cluster_keepers)
    cur = (
        joiners.select("rep_id").distinct()
        .join(reps_read, "rep_id", "left")
        .select(
            "rep_id",
            F.coalesce("__cur_keeper", "rep_id").alias("__cand"),
            F.col("__cur_score").alias("__sc"),
        )
    )
    qkey = F.struct(
        F.when(F.col("__sc").isNotNull(), -F.col("__sc"))
        .otherwise(F.lit(float("inf"))).alias("k1"),
        F.col("__cand").alias("k2"),
        F.col("__sc").alias("k3"),
    )
    winners = (
        joiners.unionByName(cur)
        .groupBy("rep_id")
        .agg(F.min(qkey).alias("__w"))
        .select(
            "rep_id",
            F.col("__w.k2").alias("__new_keeper"),
            F.col("__w.k3").alias("__new_score"),
        )
        .join(
            cur.select("rep_id", F.col("__cand").alias("__old_keeper")),
            "rep_id",
        )
        .persist()
    )
    jw = joiners.join(winners, "rep_id")
    near_state = jw.where(
        F.col("__cand") != F.col("__new_keeper")
    ).select(
        F.col("__cand").alias(ic),
        F.lit("near_dup").alias("status"),
        F.col("__new_keeper").alias("keeper_id"),
    )
    # the incoming doc that dethrones the stored keeper
    swaps_in = jw.where(
        F.col("__cand") == F.col("__new_keeper")
    ).select(
        F.col("__cand").alias(ic),
        F.lit("kept").alias("status"),
        F.col("__cand").alias("keeper_id"),
    )
    # retroactive re-emission for the dethroned keeper: latest decision
    # wins downstream, so this row UNKEEPS it
    retro = winners.where(
        F.col("__old_keeper") != F.col("__new_keeper")
    ).select(
        F.col("__old_keeper").alias(ic),
        F.lit("near_dup").alias("status"),
        F.col("__new_keeper").alias("keeper_id"),
    )
    return near_state, swaps_in, retro, winners, reps_read


def _quality_swap_driver(dd, rep_hits, jrows, rrows):
    """Driver arm of :func:`_quality_swap_join`: pre-collected bounded
    row lists (one folded job in the caller), the same (−score
    nulls-last, id) min per rep in plain Python, and literal decision
    frames. ``-0.0`` vs ``0.0`` ties fall through to the id key in
    both engines (they compare equal); a NaN score ranks last, like
    null (quality scores are finite by construction —
    `with_quality_score` emits rounded ratios)."""
    import math

    ic = dd.id_col
    cur_of = {
        r["rep_id"]: (r["__cand"], r["__sc"]) for r in rrows
    }

    def k1(sc):
        return (
            -sc
            if sc is not None and not math.isnan(sc)
            else math.inf
        )

    groups: dict = {}
    for r in jrows:
        groups.setdefault(r["rep_id"], []).append((r["__cand"], r["__sc"]))
    winners_rows, near_rows, swap_rows, retro_rows = [], [], [], []
    for rep, cands in groups.items():
        ck, cs = cur_of.get(rep, (rep, None))
        w_cand, w_sc = min(
            cands + [(ck, cs)], key=lambda t: (k1(t[1]), t[0])
        )
        winners_rows.append((rep, w_cand, w_sc, ck))
        for cand, _sc in cands:
            if cand == w_cand:
                swap_rows.append((cand, "kept", cand))
            else:
                near_rows.append((cand, "near_dup", w_cand))
        if ck != w_cand:
            retro_rows.append((ck, "near_dup", w_cand))

    spark = dd.spark
    id_t = rep_hits.schema[ic].dataType
    dec_schema = T.StructType(
        [
            T.StructField(ic, id_t),
            T.StructField("status", T.StringType()),
            T.StructField("keeper_id", id_t),
        ]
    )
    near_state = spark.createDataFrame(near_rows, dec_schema)
    swaps_in = spark.createDataFrame(swap_rows, dec_schema)
    retro = spark.createDataFrame(retro_rows, dec_schema)
    winners = spark.createDataFrame(
        winners_rows,
        T.StructType(
            [
                T.StructField("rep_id", id_t),
                T.StructField("__new_keeper", id_t),
                T.StructField("__new_score", T.DoubleType()),
                T.StructField("__old_keeper", id_t),
            ]
        ),
    )
    reps_lit = spark.createDataFrame(
        [
            (r["rep_id"], r["__cand"], r["__sc"])
            for r in rrows
        ],
        T.StructType(
            [
                T.StructField("rep_id", id_t),
                T.StructField("__cur_keeper", id_t),
                T.StructField("__cur_score", T.DoubleType()),
            ]
        ),
    )
    # the retro count is known on the driver here — carry it so the
    # caller's metrics skip the retro.count() Spark job (guide §5)
    retro._southpaw_nrows = len(retro_rows)  # type: ignore[attr-defined]
    return near_state, swaps_in, retro, winners, reps_lit


# shared sidecar convention — one implementation for the whole repo
from southpaw_spark.streaming.fsio import (  # noqa: E402
    read_json_or_none as _read_json_sidecar,
    write_json_atomic as _write_json_atomic,
)


class IncrementalDeduper:
    """Stateful exact→fuzzy deduper over a document stream.

    ``store`` is a :class:`ParquetStateStore` (or compatible backend
    exposing ``exists/read/merge`` plus the ``_bucket_col`` keyed-hash
    used for pruned lookups). One deduper instance per corpus;
    reopening a new instance on the same store directory resumes from
    the committed state (restart test).

    Signature geometry (``n``, ``num_hashes``, ``bands``) is persisted
    to a sidecar in the store root on the first batch and validated on
    reopen: state built with different geometry computes band buckets
    that never match the persisted inverted index, so cross-batch
    lookups would silently miss and duplicates leak into the kept set.
    ``sim_threshold`` is NOT pinned — it only scores candidates, so it
    may be tuned between runs without invalidating state.

    **Batch sizing (measured, BASELINE.md §9):** each batch carries a
    ~14 s FIXED orchestration cost on local[32] (three pruned state
    lookups with bounded collects, connected-components rounds, three
    store merges — dozens of small Spark jobs), while the variable
    cost scales with batch size: 5× the docs measured ≈ 1.2× the
    wall. Size triggers so batches hold THOUSANDS of documents, not
    hundreds — e.g. file sources: ``maxFilesPerTrigger`` ≥ several
    thousand docs' worth; Kafka: ``maxOffsetsPerTrigger`` ≥ 5_000;
    or a processing-time trigger long enough to accumulate that much.
    A 500-doc trigger spends ~95% of its wall on the fixed cost.
    """

    _META = "_DEDUP_META.json"

    def __init__(
        self,
        spark: SparkSession,
        store,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 3,
        num_hashes: int = 8,
        bands: int = 4,
        sim_threshold: float = 0.7,
        auto_vacuum: bool = True,
        fuzzy_keep: str = "min_id",
        score_col: str = "quality_score",
        swap_driver_cap: int = 100_000,
    ) -> None:
        if fuzzy_keep not in ("min_id", "best_quality"):
            raise ValueError(
                "fuzzy_keep must be 'min_id' or 'best_quality', got "
                f"{fuzzy_keep!r}"
            )
        self.spark = spark
        self.store = store
        #: joiner-count bound for the keeper-swap driver fast path
        #: (0 forces the distributed arm; the parity test runs both)
        self.swap_driver_cap = swap_driver_cap
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.sim_threshold = sim_threshold
        #: near-dup keeper policy, mirroring
        #: ``pipelines.build_corpus(fuzzy_keep=...)``: ``best_quality``
        #: keeps each family's highest-``score_col`` member (ties → min
        #: id) instead of the min id — CONVERGENTLY across batches. The
        #: quality argmax is monotone under new evidence, so when a
        #: later batch brings a higher-quality member into an existing
        #: cluster the deduper RE-EMITS the swap (the span-deduper
        #: retroactive trick): the incoming doc gets a ``kept`` row and
        #: the dethroned keeper gets a fresh ``near_dup`` row pointing
        #: at it. Consumers therefore apply LATEST-decision-wins per
        #: doc (a doc is kept iff its latest row has ``keeper_id ==
        #: doc_id``); the per-cluster keeper then equals the batch
        #: ``cluster_keepers`` argmax for every chunking (fuzz-pinned),
        #: clustering itself staying greedy as documented. State adds a
        #: ``dedup_reps`` table (stable representative → current
        #: keeper) so pointer/index rows never need rewriting on a
        #: swap. ``sim_threshold``-style tunable: not part of the
        #: persisted geometry.
        self.fuzzy_keep = fuzzy_keep
        self.score_col = score_col
        #: vacuum old state versions (keep=2) after each batch's commits
        #: — without it a long stream grows one version dir per entity
        #: per batch (the same hygiene the IVM loop applies)
        self.auto_vacuum = auto_vacuum
        #: cumulative counters (docs/kept/exact_dups/near_dups), the
        #: same plain surface the IVM loop exposes for its listeners
        self.metrics: dict = {}
        self._prev_decisions: DataFrame | None = None
        self._check_meta()

    # -- geometry persistence ----------------------------------------------

    def _meta_file(self) -> str:
        import os

        return os.path.join(self.store.root, self._META)

    def _check_meta(self) -> None:
        meta = _read_json_sidecar(self.store._fs, self._meta_file())
        if meta is None:
            return
        for k in ("n", "num_hashes", "bands"):
            if meta[k] != getattr(self, k):
                raise ValueError(
                    f"dedup state at {self.store.root!r} was built with "
                    f"{k}={meta[k]}, got {getattr(self, k)} — band buckets "
                    "would never match the persisted index and duplicates "
                    "would silently leak; open with the persisted geometry "
                    "or use a fresh store"
                )

    def _ensure_meta(self) -> None:
        if self.store._fs.exists(self._meta_file()):
            return
        _write_json_atomic(
            self.store._fs,
            self._meta_file(),
            {"n": self.n, "num_hashes": self.num_hashes, "bands": self.bands},
        )

    # -- state accessors ---------------------------------------------------

    def _bucket_ids(self, keys: DataFrame, key_cols: Sequence[str]) -> list:
        """Distinct state-bucket ids the given keys can live in — one
        bounded (≤ n_buckets) collect. Exposed separately so callers can
        reuse the list across a lookup AND the later merge (saving the
        merge's own touched-bucket collect)."""
        return [
            r["__b"]
            for r in keys.select(self.store._bucket_col(key_cols).alias("__b"))
            .distinct()
            .collect()
        ]

    def _pruned_read(
        self,
        entity: str,
        schema: str,
        keys: DataFrame | None = None,
        key_cols: Sequence[str] | None = None,
        ids: Sequence[int] | None = None,
    ) -> DataFrame:
        """State read restricted to the hash buckets that can contain
        ``keys`` — the lookup-side mirror of ``merge()``'s touched-bucket
        pruning. Pass ``ids`` when the bucket ids were already collected
        (no extra job); else they are derived from ``keys``/``key_cols``
        (one bounded ≤ n_buckets collect)."""
        if not self.store.exists(entity):
            return self.spark.createDataFrame([], schema)
        if ids is None:
            ids = self._bucket_ids(keys, key_cols)
        return (
            self.store.read(entity)
            .where(F.col("__bucket").isin(list(ids)))
            .drop("__bucket")
        )

    def _sig_schema(self) -> str:
        hs = ", ".join(f"h{i} string" for i in range(self.num_hashes))
        return f"{self.id_col} long, {hs}"

    def _agree_frac(self, left_prefix: str, right_prefix: str):
        terms = [
            F.when(
                F.col(f"{left_prefix}h{i}") == F.col(f"{right_prefix}h{i}"), 1.0
            ).otherwise(0.0)
            for i in range(self.num_hashes)
        ]
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return total / F.lit(float(self.num_hashes))

    # -- the per-batch cascade --------------------------------------------

    def process_batch(self, docs: DataFrame) -> DataFrame:
        """Run one batch through the cascade; update state; return the
        decision log: (doc_id, status ∈ kept|exact_dup|near_dup,
        keeper_id). Decisions are materialized (persist()+count(),
        released by the next process_batch or close()) before state
        merges commit, so the returned frame is stable however late the
        caller consumes it."""
        ic, tc = self.id_col, self.text_col
        self._release_prev()
        # Batch-scoped persist set: each frame below feeds several
        # actions (pruned-lookup collects, the decision count, three
        # merges) — without the caches every action re-runs the whole
        # cascade from the source. Released after the commits.
        scoped: list[DataFrame] = []
        hashed = docs.select(
            F.col(ic), F.col(tc),
            F.md5(F.col(tc).cast("binary")).alias("content_hash"),
        ).persist()
        scoped.append(hashed)
        # One job: the exact-pointer bucket ids double as the empty-batch
        # check (empty ids ⟺ empty batch), and are reused verbatim as
        # the exact merge's touched set.
        exact_ids = self._bucket_ids(
            hashed.select("content_hash"), ["content_hash"]
        )
        if not exact_ids:
            # nothing to do — and don't create empty state entities
            hashed.unpersist()
            return self.spark.createDataFrame(
                [], f"{ic} long, status string, keeper_id long"
            )
        self._ensure_meta()  # pin n/num_hashes/bands before any state write

        # ---- exact stage: pruned pointer lookup, then within-batch group
        prior_exact = self._pruned_read(
            _EXACT, "content_hash string, keep_id long", ids=exact_ids
        )
        with_prior = hashed.join(prior_exact, "content_hash", "left")
        exact_state_dups = with_prior.where(F.col("keep_id").isNotNull()).select(
            F.col(ic), F.lit("exact_dup").alias("status"),
            F.col("keep_id").alias("keeper_id"),
        )
        # within-batch keeper per distinct new content: min(id) over a
        # hash-partitioned window — ONE exchange, where the previous
        # groupBy + join-back re-shuffled `fresh` twice (guide §2.4:
        # two operations keyed the same way share one exchange). The
        # window key is a content hash, so partitions are collision-
        # free (no skewed key is possible) and the rewrite is
        # scale-safe; rows and downstream semantics are identical.
        fresh = with_prior.where(F.col("keep_id").isNull()).drop("keep_id")
        fresh = fresh.withColumn(
            "__bk",
            F.min(ic).over(Window.partitionBy("content_hash")),
        )
        exact_batch_dups = fresh.where(F.col(ic) != F.col("__bk")).select(
            F.col(ic), F.lit("exact_dup").alias("status"),
            F.col("__bk").alias("keeper_id"),
        )
        # one survivor per distinct new content. Persisted: survivors
        # feed the signature build, the still_in anti-join AND the
        # pointer-table merge — uncached, each consumer re-runs the
        # exact stage's join+groupBy as several AQE jobs (the §9 fixed
        # cost is mostly JOB COUNT, not data).
        survivors = fresh.where(F.col(ic) == F.col("__bk")).select(
            ic, tc, "content_hash"
        ).persist()
        scoped.append(survivors)

        # ---- fuzzy stage: signatures + band buckets for survivors.
        # Docs too short for a single shingle carry no fuzzy evidence —
        # they bypass this stage (kept unless exact dups), same as the
        # batch operators.
        sigs_new = minhash_signatures(
            survivors, tc, ic, self.n, self.num_hashes
        ).persist()
        buckets_new = band_buckets(
            sigs_new, ic, self.num_hashes, self.bands
        ).persist()
        scoped += [sigs_new, buckets_new]
        # One job materializes signatures + band buckets AND yields the
        # band-bucket ids — reused for the index lookup here and as the
        # index merge's touched set below.
        band_ids = self._bucket_ids(
            buckets_new.select("band", "bucket"), ["band", "bucket"]
        )

        # (a) vs kept state: pruned inverted-index equi-join, then
        # signature agreement. Work ∝ batch buckets × their collisions.
        idx_schema = "band int, bucket string, ids array<long>"
        prior_idx = self._pruned_read(_BUCKETS, idx_schema, ids=band_ids).persist()
        scoped.append(prior_idx)
        cand_old = (
            buckets_new.join(prior_idx, ["band", "bucket"])
            .select(F.col(ic), F.explode("ids").alias("__old_id"))
            .distinct()
            .persist()
        )
        scoped.append(cand_old)
        old_sigs = self._pruned_read(
            _SIGS, self._sig_schema(),
            cand_old.select(F.col("__old_id").alias(ic)), [ic],
        ).select(
            F.col(ic).alias("__old_id"),
            *[F.col(f"h{i}").alias(f"__oh{i}") for i in range(self.num_hashes)],
        )
        sig_l = sigs_new.select(
            F.col(ic),
            *[F.col(f"h{i}").alias(f"__nh{i}") for i in range(self.num_hashes)],
        )
        scored_old = (
            cand_old.join(sig_l, ic).join(old_sigs, "__old_id")
            .withColumn("__sim", self._agree_frac("__n", "__o"))
            .where(F.col("__sim") >= self.sim_threshold)
        )
        # rep_hits feeds several independent subtrees (near/swap
        # decisions, still_in's anti-join, and — in best_quality mode —
        # the pointer-table rep_of inside the merge threads). Persist
        # it ONLY in best_quality mode, where _quality_swap_join's
        # count() + merge threads genuinely re-derive the fuzzy lookup
        # (measured r10). In min_id mode the consumers' recomputation
        # is covered by shuffle reuse (same map outputs), and the
        # cache materialization costs a whole extra job chain per
        # batch — the r9→r11 dedup_stream_batch creep (8.7→10.9 s in
        # driver records) bisected to exactly this persist (§30 A/B:
        # identical 55-job count, ~2 s/batch, reverts with the cache).
        rep_hits = scored_old.groupBy(ic).agg(
            F.min("__old_id").alias("__rep")
        )
        if self.fuzzy_keep == "best_quality":
            rep_hits = rep_hits.persist()
            scoped.append(rep_hits)

        if self.fuzzy_keep == "best_quality":
            if self.score_col not in docs.columns:
                raise ValueError(
                    f"fuzzy_keep='best_quality' needs a {self.score_col!r}"
                    " column on the batch frame (set score_col= to the "
                    "column that carries document quality)"
                )
            scores = docs.select(
                F.col(ic), F.col(self.score_col).cast("double").alias("__sc")
            )
            # one pruned read of the rep→keeper table covering BOTH the
            # fuzzy joiners' reps and the exact pointers' reps (pointers
            # store the stable rep in this mode; resolution to the live
            # keeper happens here, at decision time)
            near_state, swaps_in, retro, winners, reps_read = (
                _quality_swap_join(
                    self, rep_hits, scores, _REPS,
                    extra_rep_targets=exact_state_dups.select(
                        F.col("keeper_id").alias("rep_id")
                    ),
                    driver_cap=self.swap_driver_cap,
                )
            )
            scoped.append(winners)
            scoped.append(reps_read)
            # exact pointers carry reps in this mode — resolve to the
            # live keeper (this batch's swap first, then stored, then
            # the rep itself)
            exact_state_dups = (
                exact_state_dups.join(
                    winners.select(
                        F.col("rep_id").alias("__r"),
                        F.col("__new_keeper").alias("__wk"),
                    ),
                    exact_state_dups["keeper_id"] == F.col("__r"),
                    "left",
                )
                .drop("__r")
                .join(
                    reps_read.select(
                        F.col("rep_id").alias("__r2"),
                        F.col("__cur_keeper").alias("__ck"),
                    ),
                    F.col("keeper_id") == F.col("__r2"),
                    "left",
                )
                .select(
                    F.col(ic), F.col("status"),
                    F.coalesce("__wk", "__ck", "keeper_id").alias("keeper_id"),
                )
            )
        else:
            near_state = rep_hits.select(
                F.col(ic), F.lit("near_dup").alias("status"),
                F.col("__rep").alias("keeper_id"),
            )
            swaps_in = retro = winners = None

        still_in = survivors.join(rep_hits.select(ic), ic, "left_anti")

        # (b) within-batch: bucket self-join among remaining survivors,
        # agreement-verified edges, connected components, min-id keeps.
        rb = buckets_new.join(still_in.select(ic), ic)
        a = rb.select(F.col(ic).alias("id_a"), "band", "bucket")
        b = rb.select(F.col(ic).alias("id_b"), "band", "bucket")
        pairs = (
            a.join(b, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        sa = sigs_new.select(
            F.col(ic).alias("id_a"),
            *[F.col(f"h{i}").alias(f"__nh{i}") for i in range(self.num_hashes)],
        )
        sb = sigs_new.select(
            F.col(ic).alias("id_b"),
            *[F.col(f"h{i}").alias(f"__oh{i}") for i in range(self.num_hashes)],
        )
        edges = (
            pairs.join(sa, "id_a").join(sb, "id_b")
            .withColumn("__sim", self._agree_frac("__n", "__o"))
            .where(F.col("__sim") >= self.sim_threshold)
            .select("id_a", "id_b")
        )
        # no pre-gate emptiness job: connected_components' bounded
        # fast path materializes the edge plan exactly once and returns
        # an empty label frame for an empty graph — the old
        # edges.limit(1).count() gate ran the candidate subplan one
        # extra time per batch for nothing
        comps = connected_components(edges)
        if self.fuzzy_keep == "best_quality":
            from southpaw_spark.operators.dedup import cluster_keepers

            kp = cluster_keepers(
                comps,
                docs.select(ic, self.score_col),
                ic,
                score_col=self.score_col,
            )
            near_batch = kp.where(~F.col("is_keeper")).select(
                F.col("id").alias(ic),
                F.lit("near_dup").alias("status"),
                F.col("keep_id").alias("keeper_id"),
            )
        else:
            near_batch = comps.where(
                F.col("id") != F.col("cluster_id")
            ).select(
                F.col("id").alias(ic),
                F.lit("near_dup").alias("status"),
                F.col("cluster_id").alias("keeper_id"),
            )
        # dropped_fuzzy feeds the decision log, the exact-pointer
        # resolution AND (via kept) every state merge; kept feeds the
        # sig/index/pointer merges — persist both so the merges replay
        # cached rows instead of the fuzzy cascade (same job-count
        # rationale as survivors above)
        dropped_fuzzy = near_state.unionByName(near_batch).persist()
        scoped.append(dropped_fuzzy)
        kept = still_in.join(
            dropped_fuzzy.select(ic), ic, "left_anti"
        ).persist()
        scoped.append(kept)
        kept_dec = kept.select(
            F.col(ic), F.lit("kept").alias("status"),
            F.col(ic).alias("keeper_id"),
        )

        # resolve batch-exact-dup pointers whose keeper was itself
        # dropped in the fuzzy stage (keepers must always be kept docs)
        resolve = dropped_fuzzy.select(
            F.col(ic).alias("__via"), F.col("keeper_id").alias("__final")
        )
        exact_batch_dups = exact_batch_dups.join(
            resolve, exact_batch_dups["keeper_id"] == resolve["__via"], "left"
        ).select(
            F.col(ic), F.col("status"),
            F.coalesce("__final", "keeper_id").alias("keeper_id"),
        )
        # persist (not localCheckpoint — those blocks can never be
        # freed programmatically); _bump_from's collect materializes it,
        # and the NEXT process_batch / close() releases it
        decisions = (
            kept_dec.unionByName(exact_state_dups)
            .unionByName(exact_batch_dups)
            .unionByName(dropped_fuzzy)
        )
        if swaps_in is not None:
            decisions = decisions.unionByName(swaps_in).unionByName(retro)
        decisions = decisions.persist()
        # ONE action both materializes the persisted decision log (the
        # stability contract: state merges below must not be able to
        # change what the caller reads) AND yields the per-status
        # metric counts — the old separate count() + _bump_from
        # groupBy ran the same cached scan twice (§30: fixed cost is
        # job count). Deliberately NOT folded further: an r16
        # experiment unioned the _SIGS/_REPS merges' touched-bucket
        # collects into this action, but that moved work that the
        # merge THREADS run overlapped onto this serial foreground
        # job (jobs/batch 52→53, wall +1.2 s at sf0.1) — the merges'
        # own collects are off the critical path, this collect is on
        # it.
        status_counts = {
            r["status"]: r["n"]
            for r in decisions.groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # retro rows reference OLD docs, not batch docs — count them
        # (cheap: winners is persisted) so the metrics stay per-doc
        n_retro = (
            0 if retro is None
            # driver fast-path carries the count — no Spark job
            else getattr(retro, "_southpaw_nrows", None)
        )
        if n_retro is None:
            n_retro = retro.count()
        self._prev_decisions = decisions

        # ---- state updates (reps only; in min_id mode the pointer
        # table records the RESOLVED keeper so future exact copies
        # point at a kept doc — in best_quality mode it records the
        # STABLE rep, resolved to the live keeper at decision time, so
        # keeper swaps never rewrite pointers)
        if self.fuzzy_keep == "best_quality":
            rep_of = (
                rep_hits.select(F.col(ic), F.col("__rep").alias("__kid"))
                .unionByName(
                    near_batch.select(
                        F.col(ic), F.col("keeper_id").alias("__kid")
                    )
                )
                .unionByName(
                    kept.select(F.col(ic), F.col(ic).alias("__kid"))
                )
            )
            final_ptr = survivors.join(rep_of, ic).select(
                "content_hash", F.col("__kid").alias("keep_id")
            )
        else:
            final_ptr = survivors.join(
                decisions.select(ic, F.col("keeper_id").alias("__kid")), ic
            ).select("content_hash", F.col("__kid").alias("keep_id"))
        kept_sigs = sigs_new.join(kept.select(ic), ic)

        # inverted-index read-modify-write: union new kept ids into the
        # touched (band, bucket) rows — prior_idx is already the pruned
        # superset of every row this batch can touch
        new_members = (
            buckets_new.join(kept.select(ic), ic)
            .groupBy("band", "bucket")
            .agg(F.collect_list(ic).alias("__new_ids"))
        )
        combined = (
            new_members.join(prior_idx, ["band", "bucket"], "left")
            .select(
                "band", "bucket",
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("ids"), F.array().cast("array<long>")),
                        F.col("__new_ids"),
                    )
                ).alias("ids"),
            )
        )
        # The three entity merges are INDEPENDENT (separate state dirs,
        # separate versions) and each spends most of its wall in small
        # Spark jobs over already-persisted inputs — staging them
        # concurrently overlaps that job latency (measured: 7.4 s
        # sequential → ~3 s; every input frame is persisted+counted
        # above, so the threads trigger no shared recomputation).
        # Commit ordering is unchanged: ALL stages complete before any
        # pointer flips below.
        from concurrent.futures import ThreadPoolExecutor

        merge_jobs = [
            (_EXACT, lambda: self.store.merge(
                _EXACT, final_ptr, None, ["content_hash"], commit=False,
                touched_ids=exact_ids,  # final_ptr hashes ⊆ batch hashes
            )),
            (_SIGS, lambda: self.store.merge(
                _SIGS, kept_sigs, None, [ic], commit=False,
            )),
            (_BUCKETS, lambda: self.store.merge(
                _BUCKETS, combined, None, ["band", "bucket"], commit=False,
                # combined keys ⊆ buckets_new keys ∪ prior_idx keys, and
                # prior_idx was read from exactly these partitions
                touched_ids=band_ids,
            )),
        ]
        if self.fuzzy_keep == "best_quality":
            # rep→keeper upserts: new reps keep themselves; touched
            # existing reps take this batch's argmax
            reps_rows = (
                kept.join(scores, ic)
                .select(
                    F.col(ic).alias("rep_id"),
                    F.col(ic).alias("keeper_id"),
                    F.col("__sc").alias("keeper_score"),
                )
                .unionByName(
                    winners.select(
                        "rep_id",
                        F.col("__new_keeper").alias("keeper_id"),
                        F.col("__new_score").alias("keeper_score"),
                    )
                )
            )
            merge_jobs.append(
                (_REPS, lambda: self.store.merge(
                    _REPS, reps_rows, None, ["rep_id"], commit=False,
                ))
            )
        with ThreadPoolExecutor(max_workers=len(merge_jobs)) as pool:
            futures = [(e, pool.submit(fn)) for e, fn in merge_jobs]
            staged = [(e, f.result()) for e, f in futures]
        # All three entities stage first, then the pointers flip
        # back-to-back: a crash before this loop replays against the
        # prior versions of ALL state (clean re-derivation); the window
        # where the pointer table leads the LSH index is the pointer
        # flips themselves, not the data writes. Replay with a committed
        # pointer re-reports that doc as exact_dup with keeper == its own
        # id — which is why the kept-set contract is "keeper_id ==
        # doc_id", stable under at-least-once replay.
        for entity, version in staged:
            self.store.commit(entity, version)
        self._vacuum()
        self._bump_counts(status_counts, n_retro)
        for frame in scoped:  # decisions stays cached until next batch
            frame.unpersist()
        return decisions

    def _vacuum(self) -> None:
        if not getattr(self, "auto_vacuum", True):
            return
        vacuum = getattr(self.store, "vacuum", None)
        if not callable(vacuum):
            return
        # Dispatch on the declared signature, not by catching TypeError —
        # a genuine TypeError raised INSIDE a store's vacuum must
        # propagate, not be silently retried with defaults.
        import inspect

        try:
            params = inspect.signature(vacuum).parameters
        except (TypeError, ValueError):  # builtins without signatures
            params = {}
        if "keep" in params:
            vacuum(keep=2)  # parquet/orc store: version-count retention
        else:
            vacuum()  # Delta backend: hours-based retention signature

    def _release_prev(self) -> None:
        if self._prev_decisions is not None:
            self._prev_decisions.unpersist()
            self._prev_decisions = None

    def close(self) -> None:
        """Release the last batch's cached decision log."""
        self._release_prev()

    def _bump_from(self, decisions: DataFrame, n_retro: int = 0) -> None:
        # decisions is persist()ed and counted — this groupBy is a small
        # job over cached rows, not a recompute of the cascade
        counts = {
            r["status"]: r["n"]
            for r in decisions.groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        self._bump_counts(counts, n_retro)

    def _bump_counts(self, counts: dict, n_retro: int = 0) -> None:
        # retroactive swap rows re-decide PRIOR docs: exclude them from
        # the per-doc counters, surface them as their own counter
        total = sum(counts.values()) - n_retro
        rows = [
            ("dedup.docs", total),
            ("dedup.kept", counts.get("kept", 0)),
            ("dedup.exact_dups", counts.get("exact_dup", 0)),
            ("dedup.near_dups", counts.get("near_dup", 0) - n_retro),
        ]
        if self.fuzzy_keep == "best_quality":
            rows.append(("dedup.keeper_swaps", n_retro))
        for key, n in rows:
            self.metrics[key] = self.metrics.get(key, 0) + n

    def kept_ids(self) -> DataFrame:
        """All fuzzy-eligible kept doc ids. In ``min_id`` mode these are
        the signature-table keys; in ``best_quality`` mode the signature
        table holds stable REPRESENTATIVES (possibly dethroned by a
        swap), so the live keepers come from the rep→keeper table.
        Shingle-less kept docs appear only in the decision logs."""
        if self.fuzzy_keep == "best_quality" and self.store.exists(_REPS):
            return self.store.read(_REPS).select(
                F.col("keeper_id").alias(self.id_col)
            )
        if not self.store.exists(_SIGS):
            return self.spark.createDataFrame([], f"{self.id_col} long")
        return self.store.read(_SIGS).select(self.id_col)

    def current_keepers(self) -> DataFrame:
        """best_quality mode: the live (rep_id, keeper_id, keeper_score)
        mapping — the streaming analogue of the batch
        ``cluster_keepers`` output, read straight from state."""
        if not self.store.exists(_REPS):
            return self.spark.createDataFrame([], _REPS_SCHEMA)
        return self.store.read(_REPS)


def attach_dedup_stream(
    deduper,
    source: DataFrame,
    checkpoint_dir: str,
    sink=None,
    trigger: dict | None = None,
):
    """Wire a document stream into a deduper via foreachBatch.

    ``deduper`` is any of the incremental dedupers — the protocol is
    just ``process_batch(batch_df) -> DataFrame``: the doc-level
    :class:`IncrementalDeduper` (decision log), the span-level
    :class:`IncrementalSpanDeduper` (span updates), or the vector
    :class:`IncrementalVectorDeduper`.

    ``source`` is any streaming DataFrame carrying the deduper's
    (id_col, text_col) — a Kafka topic of documents, a file stream of
    landed batches. Each micro-batch runs the exact→fuzzy cascade
    against the persistent state; ``sink(decisions_df, batch_id)``
    (optional) receives the materialized decision log — e.g. a writer
    appending to a decisions table the downstream corpus build filters
    on. Replay contract (at-least-once, same as the IVM loop):
    ``process_batch`` commits all three state entities BEFORE the sink
    sees the decisions, so a crash between the state commit and the
    sink's output replays the batch against already-updated state —
    previously-kept docs are then re-reported as ``exact_dup`` with
    ``keeper_id`` equal to their own id, and ``deduper.metrics`` counts
    the batch twice. Only the kept-set contract is replay-stable, and
    it is LATEST-decision-wins: a doc is kept iff its most recent
    decision row has ``keeper_id == doc_id`` (under
    ``fuzzy_keep='best_quality'`` a later batch can retroactively
    re-emit a ``near_dup`` row for an earlier keeper when a
    higher-quality member takes over its cluster). Downstream
    consumers must fold by latest row per doc, not filter on
    ``status`` or on "any row".
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            if batch_df.limit(1).count() == 0:
                return
            decisions = deduper.process_batch(batch_df)
            if sink is not None:
                sink(decisions, batch_id)
        finally:
            batch_df.unpersist()

    writer = (
        source.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


class IncrementalVectorDeduper:
    """Embedding-cosine near-dup dedup over a vector stream — the
    vector-modality sibling of :class:`IncrementalDeduper` (text) and the
    streaming counterpart of ``dedup.embedding_near_duplicates``.

    State (same ParquetStateStore, same pruned-lookup discipline):

    * ``vdedup_index`` — (table, bucket) → kept-vector id array: the
      multi-table random-hyperplane inverted index
    * ``vdedup_vecs``  — kept id → vector (needed for exact cosine
      verification of bucket collisions)

    The hyperplanes are drawn once from ``seed`` and PERSISTED to a
    sidecar in the store root — a restarted deduper must bucket new
    vectors against the same planes the index was built with, or every
    lookup silently misses. Reopening with conflicting geometry params
    fails loudly.

    A new vector is dropped iff some bucket-colliding KEPT vector has
    exact cosine ≥ ``threshold`` (min old id wins), or it lands in a
    within-batch near-dup cluster and is not the cluster min. Same
    greedy incremental semantics and invariants as the text deduper.
    """

    _META = "_VDEDUP_META.json"

    def __init__(
        self,
        spark: SparkSession,
        store,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        threshold: float = 0.95,
        n_planes: int = 8,
        n_tables: int = 2,
        seed: int = 42,
        auto_vacuum: bool = True,
        fuzzy_keep: str = "min_id",
        score_col: str = "quality_score",
        swap_driver_cap: int = 100_000,
    ) -> None:
        if fuzzy_keep not in ("min_id", "best_quality"):
            raise ValueError(
                "fuzzy_keep must be 'min_id' or 'best_quality', got "
                f"{fuzzy_keep!r}"
            )
        self.spark = spark
        self.store = store
        self.swap_driver_cap = swap_driver_cap  # see IncrementalDeduper
        self.vec_col = vec_col
        self.id_col = id_col
        self.threshold = threshold
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.seed = seed
        self.auto_vacuum = auto_vacuum
        #: same keeper policy AND cross-batch convergence as
        #: IncrementalDeduper.fuzzy_keep: best_quality retroactively
        #: swaps keepers when a later batch brings a better member into
        #: an existing cluster (rep→keeper rows in ``vdedup_reps``;
        #: latest-decision-wins decision log)
        self.fuzzy_keep = fuzzy_keep
        self.score_col = score_col
        self.metrics: dict = {}
        self._prev_decisions: DataFrame | None = None
        self._planes: list | None = None  # resolved on first batch / reopen
        self._load_meta()

    # -- plane persistence -------------------------------------------------

    def _meta_file(self) -> str:
        import os

        return os.path.join(self.store.root, self._META)

    def _load_meta(self) -> None:
        meta = _read_json_sidecar(self.store._fs, self._meta_file())
        if meta is None:
            return
        for k in ("n_planes", "n_tables", "seed"):
            if meta[k] != getattr(self, k):
                raise ValueError(
                    f"vector-dedup state at {self.store.root!r} was built "
                    f"with {k}={meta[k]}, got {getattr(self, k)} — lookups "
                    "would miss; open with the persisted geometry or use a "
                    "fresh store"
                )
        self._planes = meta["planes"]

    def _ensure_planes(self, batch: DataFrame) -> None:
        if self._planes is not None:
            return
        import numpy as np

        dim = batch.select(F.size(self.vec_col).alias("d")).first()["d"]
        rng = np.random.default_rng(self.seed)
        self._planes = [
            rng.standard_normal((self.n_planes, dim)).tolist()
            for _ in range(self.n_tables)
        ]
        _write_json_atomic(
            self.store._fs,
            self._meta_file(),
            {
                "n_planes": self.n_planes,
                "n_tables": self.n_tables,
                "seed": self.seed,
                "dim": int(dim),
                "planes": self._planes,
            },
        )

    # -- vector math (JVM-side) -------------------------------------------

    @staticmethod
    def _cos(a, b):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

        def norm(c):
            return F.sqrt(
                F.aggregate(
                    F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )

        # try_divide: a zero-norm (garbage) embedding matches nothing
        # (NULL cosine fails every threshold) instead of killing the
        # micro-batch under ANSI division-by-zero — same posture as the
        # batch d05 operator
        return F.try_divide(dot, norm(a) * norm(b))

    def _bucketed(self, df: DataFrame) -> DataFrame:
        """(id, table, bucket) — every table's bucket in one scan."""
        v = F.col(self.vec_col)
        table_buckets = []
        for planes in self._planes:
            bits = [
                (
                    F.aggregate(
                        F.zip_with(
                            v,
                            F.array(*[F.lit(float(x)) for x in p]),
                            lambda a, b: a.cast("double") * b,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    > 0
                ).cast("int")
                for p in planes
            ]
            table_buckets.append(
                F.concat_ws("", *[b.cast("string") for b in bits])
            )
        return df.select(
            F.col(self.id_col),
            F.posexplode(F.array(*table_buckets)).alias("table", "bucket"),
        )

    # -- the per-batch cascade --------------------------------------------

    def process_batch(self, vectors: DataFrame) -> DataFrame:
        """(id, vec) batch → decision log (id, status ∈ kept|near_dup,
        keeper_id); state updated. Same contract as the text deduper."""
        ic, vc = self.id_col, self.vec_col
        self._release_prev()
        if vectors.limit(1).count() == 0:
            # an empty FIRST batch must not pin geometry off a missing dim
            return self.spark.createDataFrame(
                [], f"{ic} long, status string, keeper_id long"
            )
        self._ensure_planes(vectors)
        batch = vectors.select(ic, vc)
        buckets_new = self._bucketed(batch)

        idx_schema = "table int, bucket string, ids array<long>"
        prior_idx = self._pruned_read(
            "vdedup_index", idx_schema,
            buckets_new.select("table", "bucket"), ["table", "bucket"],
        )
        cand_old = (
            buckets_new.join(prior_idx, ["table", "bucket"])
            .select(F.col(ic), F.explode("ids").alias("__old_id"))
            .distinct()
        )
        old_vecs = self._pruned_read(
            "vdedup_vecs", f"{ic} long, {vc} array<float>",
            cand_old.select(F.col("__old_id").alias(ic)), [ic],
        ).select(F.col(ic).alias("__old_id"), F.col(vc).alias("__ov"))
        scored = (
            cand_old.join(batch, ic).join(old_vecs, "__old_id")
            .withColumn("__cos", self._cos(F.col(vc), F.col("__ov")))
            .where(F.col("__cos") >= self.threshold)
        )
        # persisted ONLY in best_quality mode, same policy as the text
        # deduper's rep_hits: the swap join's count() + merge threads
        # re-derive the lookup there, while in min_id mode the two
        # consumers are covered by shuffle reuse and the cache
        # materialization is pure fixed cost (§30 A/B)
        rep_hits = scored.groupBy(ic).agg(
            F.min("__old_id").alias("__rep")
        )
        if self.fuzzy_keep == "best_quality":
            rep_hits = rep_hits.persist()
        if self.fuzzy_keep == "best_quality":
            if self.score_col not in vectors.columns:
                raise ValueError(
                    f"fuzzy_keep='best_quality' needs a {self.score_col!r}"
                    " column on the batch frame (set score_col=)"
                )
            vscores = vectors.select(
                F.col(ic), F.col(self.score_col).cast("double").alias("__sc")
            )
            near_state, swaps_in, retro, winners, reps_read = (
                _quality_swap_join(
                    self, rep_hits, vscores, _VREPS,
                    driver_cap=self.swap_driver_cap,
                )
            )
        else:
            near_state = rep_hits.select(
                F.col(ic), F.lit("near_dup").alias("status"),
                F.col("__rep").alias("keeper_id"),
            )
            swaps_in = retro = winners = None

        still_in = batch.join(rep_hits.select(ic), ic, "left_anti")
        rb = buckets_new.join(still_in.select(ic), ic)
        pairs = (
            rb.select(F.col(ic).alias("id_a"), "table", "bucket")
            .join(
                rb.select(F.col(ic).alias("id_b"), "table", "bucket"),
                ["table", "bucket"],
            )
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        va = batch.select(F.col(ic).alias("id_a"), F.col(vc).alias("__va"))
        vb = batch.select(F.col(ic).alias("id_b"), F.col(vc).alias("__vb"))
        edges = (
            pairs.join(va, "id_a").join(vb, "id_b")
            .withColumn("__cos", self._cos(F.col("__va"), F.col("__vb")))
            .where(F.col("__cos") >= self.threshold)
            .select("id_a", "id_b")
        )
        # no pre-gate emptiness job: connected_components' bounded
        # fast path materializes the edge plan exactly once and returns
        # an empty label frame for an empty graph — the old
        # edges.limit(1).count() gate ran the candidate subplan one
        # extra time per batch for nothing
        comps = connected_components(edges)
        if self.fuzzy_keep == "best_quality":
            from southpaw_spark.operators.dedup import cluster_keepers

            if self.score_col not in vectors.columns:
                raise ValueError(
                    f"fuzzy_keep='best_quality' needs a {self.score_col!r}"
                    " column on the batch frame (set score_col=)"
                )
            kp = cluster_keepers(
                comps,
                vectors.select(ic, self.score_col),
                ic,
                score_col=self.score_col,
            )
            near_batch = kp.where(~F.col("is_keeper")).select(
                F.col("id").alias(ic),
                F.lit("near_dup").alias("status"),
                F.col("keep_id").alias("keeper_id"),
            )
        else:
            near_batch = comps.where(
                F.col("id") != F.col("cluster_id")
            ).select(
                F.col("id").alias(ic),
                F.lit("near_dup").alias("status"),
                F.col("cluster_id").alias("keeper_id"),
            )
        dropped = near_state.unionByName(near_batch)
        kept = still_in.join(dropped.select(ic), ic, "left_anti")
        decisions = (
            kept.select(
                F.col(ic), F.lit("kept").alias("status"),
                F.col(ic).alias("keeper_id"),
            )
            .unionByName(dropped)
        )
        if swaps_in is not None:
            decisions = decisions.unionByName(swaps_in).unionByName(retro)
        decisions = decisions.persist()
        # one action: materialize the log AND read the metric counts
        # (same fold as the text deduper — fixed cost is job count)
        status_counts = {
            r["status"]: r["n"]
            for r in decisions.groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n_retro = (
            0 if retro is None
            # driver fast-path carries the count — no Spark job
            else getattr(retro, "_southpaw_nrows", None)
        )
        if n_retro is None:
            n_retro = retro.count()
        self._prev_decisions = decisions

        new_members = (
            buckets_new.join(kept.select(ic), ic)
            .groupBy("table", "bucket")
            .agg(F.collect_list(ic).alias("__new_ids"))
        )
        combined = new_members.join(prior_idx, ["table", "bucket"], "left").select(
            "table", "bucket",
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("ids"), F.array().cast("array<long>")),
                    F.col("__new_ids"),
                )
            ).alias("ids"),
        )
        # independent entity merges stage concurrently (see the text
        # deduper); both complete before any pointer flips
        from concurrent.futures import ThreadPoolExecutor

        merge_jobs = [
            ("vdedup_vecs", lambda: self.store.merge(
                "vdedup_vecs", kept, None, [ic], commit=False
            )),
            ("vdedup_index", lambda: self.store.merge(
                "vdedup_index", combined, None, ["table", "bucket"],
                commit=False,
            )),
        ]
        if self.fuzzy_keep == "best_quality":
            # rep→keeper upserts (same contract as the text deduper's
            # dedup_reps): new reps keep themselves; touched reps take
            # this batch's argmax
            reps_rows = (
                kept.join(vscores, ic)
                .select(
                    F.col(ic).alias("rep_id"),
                    F.col(ic).alias("keeper_id"),
                    F.col("__sc").alias("keeper_score"),
                )
                .unionByName(
                    winners.select(
                        "rep_id",
                        F.col("__new_keeper").alias("keeper_id"),
                        F.col("__new_score").alias("keeper_score"),
                    )
                )
            )
            merge_jobs.append(
                (_VREPS, lambda: self.store.merge(
                    _VREPS, reps_rows, None, ["rep_id"], commit=False,
                ))
            )
        with ThreadPoolExecutor(max_workers=len(merge_jobs)) as pool:
            futures = [(e, pool.submit(fn)) for e, fn in merge_jobs]
            staged = [(e, f.result()) for e, f in futures]
        for entity, version in staged:  # stage all, then flip pointers
            self.store.commit(entity, version)
        self._vacuum()
        self._bump_counts(status_counts, n_retro)
        if self.fuzzy_keep == "best_quality":
            rep_hits.unpersist()
        if winners is not None:
            winners.unpersist()
            reps_read.unpersist()
        return decisions

    # reuse the text deduper's pruned-lookup + metrics + cache helpers
    _bucket_ids = IncrementalDeduper._bucket_ids
    _pruned_read = IncrementalDeduper._pruned_read
    _vacuum = IncrementalDeduper._vacuum
    _bump_from = IncrementalDeduper._bump_from
    _bump_counts = IncrementalDeduper._bump_counts
    _release_prev = IncrementalDeduper._release_prev
    close = IncrementalDeduper.close


_SPAN_GRAMS = "span_grams"
_SPAN_HITS = "span_hits"


class IncrementalSpanDeduper:
    """Streaming counterpart of the batch span dedup (d15,
    :func:`southpaw_spark.operators.dedup.duplicate_spans`): documents
    arrive in batches, and every k-token gram that reaches
    ``min_count`` occurrences CORPUS-CUMULATIVELY marks its spans —
    including, retroactively, the occurrences that arrived in EARLIER
    batches (a passage is not boilerplate until its second copy shows
    up; when that copy arrives, the first doc's span must surface too).

    State (same :class:`ParquetStateStore` protocol as the other
    dedupers — versioned, crash-consistent, bucket-pruned):

    * ``span_grams`` — gram_hash → (count, pending occurrences). The
      pending list holds an occurrence ONLY while its gram's count is
      below ``min_count`` (needed for the retroactive flag when the
      threshold crosses) and is cleared at the crossing — so state per
      gram is ≤ ``min_count − 1`` stored occurrences FOREVER, however
      hot the gram gets. A 1M-copy boilerplate gram is one counter row.
    * ``span_hits`` — doc_id → sorted flagged start positions (the
      cumulative evidence; re-merged to spans on each update).

    Per batch, work ∝ batch grams + their state collisions: both
    lookups prune to the hash buckets the batch's keys map to, and
    merges touch only those buckets. Grams are keyed by ``xxhash64``
    (the d15 ``hash_grams=True`` scale path — 8-byte keys; a 2⁻⁶⁴
    collision can only ADD a span, never miss one).

    CONVERGENCE (pinned by the chunking fuzz test): unlike document-
    level incremental dedup — where chunking changes which family
    member survives — span evidence is MONOTONE (counts only grow), so
    the cumulative per-doc spans after any batch partitioning of a
    corpus equal the batch operator's output on the whole corpus
    exactly. ``process_batch`` returns the docs whose span set changed
    (new docs with spans + retroactively dirtied old docs) with their
    FULL updated spans; :meth:`current_spans` reads the same from
    state. Document ids must be unique across the stream (a re-sent id
    double-counts its own grams — same contract as the other
    dedupers). Reference scope: SURVEY §7.5 streaming dedup surface.
    """

    _META = "_SPAN_DEDUP_META.json"

    def __init__(
        self,
        spark: SparkSession,
        store,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 8,
        min_count: int = 2,
        auto_vacuum: bool = True,
    ) -> None:
        if k < 1:
            raise ValueError(f"k must be >= 1; got {k}")
        if min_count < 2:
            raise ValueError(
                f"min_count must be >= 2; got {min_count}"
            )
        self.spark = spark
        self.store = store
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.min_count = min_count
        self.auto_vacuum = auto_vacuum
        self.metrics: dict = {}
        self._prev_updates: DataFrame | None = None
        self._check_meta()

    # -- geometry persistence (k defines gram identity; min_count the
    # -- threshold semantics — both baked into persisted counts) ------

    def _meta_file(self) -> str:
        import os

        return os.path.join(self.store.root, self._META)

    def _check_meta(self) -> None:
        meta = _read_json_sidecar(self.store._fs, self._meta_file())
        if meta is None:
            return
        for key in ("k", "min_count"):
            if meta[key] != getattr(self, key):
                raise ValueError(
                    f"span-dedup state at {self.store.root!r} was built "
                    f"with {key}={meta[key]}, got {getattr(self, key)} — "
                    "persisted gram counts would be meaningless under "
                    "the new geometry; open with the persisted values "
                    "or use a fresh store"
                )

    def _ensure_meta(self) -> None:
        if self.store._fs.exists(self._meta_file()):
            return
        _write_json_atomic(
            self.store._fs,
            self._meta_file(),
            {"k": self.k, "min_count": self.min_count},
        )

    # -- pruned state access (same shape as IncrementalDeduper) -------

    def _bucket_ids(self, keys: DataFrame, key_cols) -> list:
        return [
            r["__b"]
            for r in keys.select(
                self.store._bucket_col(key_cols).alias("__b")
            )
            .distinct()
            .collect()
        ]

    def _pruned_read(
        self, entity: str, schema: str, ids,
    ) -> DataFrame:
        if not self.store.exists(entity):
            return self.spark.createDataFrame([], schema)
        return (
            self.store.read(entity)
            .where(F.col("__bucket").isin(list(ids)))
            .drop("__bucket")
        )

    _PENDING_T = "array<struct<doc_id:bigint,pos:int>>"
    _SPANS_T = "array<struct<start:int,`end`:int>>"

    def _updates_schema(self) -> str:
        return (
            f"{self.id_col} long, spans {self._SPANS_T}, "
            "n_spans long, dup_tokens long"
        )

    # -- the per-batch pass -------------------------------------------

    def _batch_guard_file(self) -> str:
        import os

        return os.path.join(self.store.root, "_SPAN_LAST_BATCH")

    def _last_batch_id(self) -> int | None:
        # through the store's FS seam, not raw open(): the guard must
        # work on the same scheme:// roots (s3a://, file://) the store
        # itself supports via fsio
        try:
            return int(self.store._fs.read_text(self._batch_guard_file()).strip())
        except (OSError, ValueError):
            return None

    def _record_batch_id(self, batch_id: int) -> None:
        self.store._fs.write_text_atomic(self._batch_guard_file(), str(batch_id))

    def process_batch(
        self, docs: DataFrame, batch_id: int | None = None
    ) -> DataFrame:
        """Ingest one batch; update state; return the span updates:
        ``(id_col, spans, n_spans, dup_tokens)`` — one row per document
        whose duplicated-span set changed, carrying the full updated
        spans (empty result when no gram crossed the threshold).

        ``batch_id`` (foreachBatch's stable per-checkpoint id) arms the
        REPLAY GUARD: gram counts are not naturally idempotent (a
        re-sent doc double-counts its own grams), so a batch whose id
        was already recorded is skipped instead of re-ingested — the
        at-least-once replay after a crash between sink success and
        checkpoint commit no longer inflates counts. The guard records
        AFTER the state commit (recording first could skip a batch
        whose state never landed — silent evidence loss, strictly
        worse); the residual double-count window is a crash INSIDE the
        commit-then-record sequence, the same milliseconds-class window
        the two entity pointer flips already have. Without ``batch_id``
        the historical contract stands: ids must be unique across the
        stream."""
        from southpaw_spark.operators.dedup import merged_spans

        ic, k, mc = self.id_col, self.k, self.min_count
        if batch_id is not None:
            last = self._last_batch_id()
            if last is not None and batch_id <= last:
                return self.spark.createDataFrame(
                    [], self._updates_schema()
                )
        self._release_prev()
        scoped: list[DataFrame] = []
        w = F.split(F.col(self.text_col), " ")
        toks = docs.select(
            F.col(ic), w.alias("__w"), F.size(w).alias("__n")
        ).where(F.col("__n") >= k)
        gram_txt = F.concat_ws(
            " ", F.slice(F.col("__w"), F.col("__g") + 1, k)
        )
        occ = (
            toks.select(
                F.col(ic), F.col("__w"),
                F.explode(
                    F.sequence(F.lit(0), F.col("__n") - k)
                ).alias("__g"),
            )
            .select(
                F.xxhash64(gram_txt).alias("gram_hash"),
                F.col(ic).alias("__doc"),
                F.col("__g").alias("__pos"),
            )
            .persist()
        )
        scoped.append(occ)
        # One job: bucket ids double as the empty-batch gate and the
        # span_grams merge's touched set.
        gram_ids = self._bucket_ids(
            occ.select("gram_hash"), ["gram_hash"]
        )
        if not gram_ids:
            occ.unpersist()
            return self.spark.createDataFrame(
                [], self._updates_schema()
            )
        self._ensure_meta()

        prior = self._pruned_read(
            _SPAN_GRAMS,
            f"gram_hash long, count long, pending {self._PENDING_T}",
            gram_ids,
        )
        empty_pending = F.expr(f"CAST(array() AS {self._PENDING_T})")
        joined = (
            occ.groupBy("gram_hash")
            .agg(F.count("*").alias("__bc"))
            .join(prior, "gram_hash", "left")
            .select(
                "gram_hash",
                (F.coalesce(F.col("count"), F.lit(0))).alias("__pc"),
                F.coalesce(F.col("pending"), empty_pending)
                .alias("__pending"),
                F.col("__bc"),
            )
            .withColumn("__total", F.col("__pc") + F.col("__bc"))
            .persist()
        )
        scoped.append(joined)

        dup_now = joined.where(F.col("__total") >= mc)
        crossing = dup_now.where(F.col("__pc") < mc)
        # batch occurrences of every currently-dup gram + the pending
        # (earlier-batch) occurrences of grams crossing RIGHT NOW
        batch_hits = occ.join(
            dup_now.select("gram_hash"), "gram_hash", "left_semi"
        ).select("__doc", "__pos")
        retro_hits = crossing.select(
            F.explode("__pending").alias("__p")
        ).select(
            F.col("__p.doc_id").alias("__doc"),
            F.col("__p.pos").alias("__pos"),
        )
        new_starts = (
            batch_hits.unionByName(retro_hits)
            .groupBy("__doc")
            .agg(F.collect_set("__pos").alias("__new"))
            .persist()
        )
        scoped.append(new_starts)

        doc_ids = self._bucket_ids(
            new_starts.select(F.col("__doc").alias(ic)), [ic]
        )
        prior_hits = self._pruned_read(
            _SPAN_HITS, f"{ic} long, starts array<int>", doc_ids
        ).select(F.col(ic).alias("__doc"), F.col("starts"))
        starts_upd = (
            new_starts.join(prior_hits, "__doc", "left")
            .select(
                F.col("__doc").alias(ic),
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.coalesce(
                                F.col("starts"),
                                F.expr("CAST(array() AS array<int>)"),
                            ),
                            F.col("__new"),
                        )
                    )
                ).alias("starts"),
            )
            .persist()
        )
        scoped.append(starts_upd)

        updates = (
            starts_upd.select(
                F.col(ic),
                merged_spans(F.col("starts"), k).alias("spans"),
            )
            .select(
                F.col(ic),
                "spans",
                F.size("spans").cast("long").alias("n_spans"),
                F.aggregate(
                    "spans",
                    F.lit(0),
                    lambda acc, s: acc + s["end"] - s["start"],
                ).cast("long").alias("dup_tokens"),
            )
            .persist()
        )
        n_updates = updates.count()
        self._prev_updates = updates

        # state upserts: counts always advance; pending holds ONLY
        # below-threshold occurrences (cleared at the crossing)
        below = joined.where(F.col("__total") < mc)
        batch_pending = (
            occ.join(below.select("gram_hash"), "gram_hash", "left_semi")
            .groupBy("gram_hash")
            .agg(
                F.collect_list(
                    F.struct(
                        F.col("__doc").alias("doc_id"),
                        F.col("__pos").alias("pos"),
                    )
                ).alias("__badd")  # < min_count elements by definition
            )
        )
        gram_upserts = (
            joined.join(batch_pending, "gram_hash", "left")
            .select(
                "gram_hash",
                F.col("__total").alias("count"),
                F.when(
                    F.col("__total") >= mc, empty_pending
                ).otherwise(
                    F.concat(
                        F.col("__pending"),
                        F.coalesce(F.col("__badd"), empty_pending),
                    )
                ).alias("pending"),
            )
        )
        from concurrent.futures import ThreadPoolExecutor

        merge_jobs = [
            (_SPAN_GRAMS, lambda: self.store.merge(
                _SPAN_GRAMS, gram_upserts, None, ["gram_hash"],
                commit=False, touched_ids=gram_ids,
            )),
            (_SPAN_HITS, lambda: self.store.merge(
                _SPAN_HITS, starts_upd, None, [ic],
                commit=False, touched_ids=doc_ids,
            )),
        ]
        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = [(e, pool.submit(fn)) for e, fn in merge_jobs]
            staged = [(e, f.result()) for e, f in futures]
        for entity, version in staged:  # stage both, then flip
            self.store.commit(entity, version)
        if batch_id is not None:
            self._record_batch_id(batch_id)
        self._vacuum()

        m = self.metrics
        m["batches"] = m.get("batches", 0) + 1
        m["docs_updated"] = m.get("docs_updated", 0) + n_updates
        for frame in scoped:  # updates stays cached until next batch
            frame.unpersist()
        return updates

    def current_spans(self) -> DataFrame:
        """The cumulative per-doc spans from committed state — equals
        the batch d15 output (spans/n_spans/dup_tokens columns) on the
        union of everything ingested, whatever the chunking."""
        from southpaw_spark.operators.dedup import merged_spans

        ic = self.id_col
        if not self.store.exists(_SPAN_HITS):
            return self.spark.createDataFrame([], self._updates_schema())
        return (
            self.store.read(_SPAN_HITS)
            .select(
                F.col(ic),
                merged_spans(F.col("starts"), self.k).alias("spans"),
            )
            .select(
                F.col(ic),
                "spans",
                F.size("spans").cast("long").alias("n_spans"),
                F.aggregate(
                    "spans",
                    F.lit(0),
                    lambda acc, s: acc + s["end"] - s["start"],
                ).cast("long").alias("dup_tokens"),
            )
        )

    _vacuum = IncrementalDeduper._vacuum

    def _release_prev(self) -> None:
        if self._prev_updates is not None:
            self._prev_updates.unpersist()
            self._prev_updates = None

    def close(self) -> None:
        """Release the last batch's cached update log."""
        self._release_prev()


class IncrementalLineDeduper:
    """Streaming counterpart of the batch line dedup (d22,
    :func:`southpaw_spark.operators.dedup.remove_duplicate_lines` —
    RefinedWeb's repeated-line removal): a line reaching ``min_count``
    occurrences CORPUS-CUMULATIVELY flags every doc carrying it,
    retroactively including earlier batches (a line is not boilerplate
    until its second copy arrives; when it does, the first doc's line
    must surface too).

    Implementation: line dedup IS span dedup with the LINE as the
    token — each document is re-tokenized so every line becomes ONE
    token (its md5; empty lines get a per-occurrence unique sentinel
    so they can never reach ``min_count`` — the d22 rule that
    paragraph breaks are never boilerplate), and an internal
    :class:`IncrementalSpanDeduper` with ``k=1`` supplies the whole
    machinery: monotone counts, ≤ ``min_count−1`` stored occurrences
    per line forever, bucket-pruned state, retroactive re-emission,
    crash-consistent commits. Every scale property and the chunking-
    invariance argument carry over verbatim — span evidence is
    monotone, so cumulative per-doc flags equal the batch operator on
    the union, whatever the batching.

    ``process_batch`` returns ``(id_col, spans, n_spans, dup_lines)``
    — LINE-position spans (apply with
    :func:`operators.dedup.cut_lines`); :meth:`current_spans` reads
    the cumulative same from state."""

    def __init__(
        self,
        spark: SparkSession,
        store,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_count: int = 2,
        auto_vacuum: bool = True,
    ) -> None:
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self.min_count = min_count
        self._span = IncrementalSpanDeduper(
            spark, store, text_col="__ltoks", id_col=id_col,
            k=1, min_count=min_count, auto_vacuum=auto_vacuum,
        )

    @property
    def metrics(self) -> dict:
        return self._span.metrics

    def _tokenize(self, docs: DataFrame) -> DataFrame:
        lines = F.split(F.col(self.text_col), "\n")
        tok = F.transform(
            lines,
            lambda line, i: F.when(
                line == "",
                F.md5(
                    F.concat(
                        F.col(self.id_col).cast("string"),
                        F.lit("#"), i.cast("string"),
                    ).cast("binary")
                ),
            ).otherwise(F.md5(line.cast("binary"))),
        )
        return docs.select(
            F.col(self.id_col), F.concat_ws(" ", tok).alias("__ltoks")
        )

    def _rename(self, upd: DataFrame) -> DataFrame:
        return upd.withColumnRenamed("dup_tokens", "dup_lines")

    def process_batch(
        self, docs: DataFrame, batch_id: int | None = None
    ) -> DataFrame:
        """Ingest one batch; return the line-span updates — one row per
        document whose duplicated-line set changed, with its FULL
        updated line-position spans. ``batch_id`` arms the replay guard
        (see :meth:`IncrementalSpanDeduper.process_batch`)."""
        return self._rename(self._span.process_batch(
            self._tokenize(docs), batch_id=batch_id
        ))

    def current_spans(self) -> DataFrame:
        """Cumulative per-doc duplicated-LINE spans from committed
        state — equals the batch d22 flag set on everything ingested,
        whatever the chunking."""
        return self._rename(self._span.current_spans())

    def close(self) -> None:
        self._span.close()


class IncrementalKeyDeduper:
    """First-seen-wins incremental dedup on a DETERMINISTIC key column
    — the streaming twin of ``build_corpus``'s url_dedup stage (t18:
    pass ``key_expr=canonical_url``) or any "same key ⇒ same logical
    record" identity. The t18 reference parity point is the reference's
    PK-upsert discipline applied to a derived identity key (ref
    ``topic/KafkaTopic.java:193-205`` keeps latest-per-PK; a corpus
    keeps FIRST-per-key because the first copy crawled is the keeper).

    State: ONE (key, keep_id) pointer entity, hash-bucketed like every
    other dedup entity — per batch the lookup reads only the buckets
    the batch's keys can live in and the merge rewrites only those
    buckets, so per-batch cost tracks the batch, never the corpus.

    Contract (same shape as :class:`IncrementalDeduper`): decisions
    ``(id, status ∈ kept|key_dup, keeper_id)``; a doc is kept iff
    ``keeper_id == id``. Rows whose key is NULL carry no identity
    evidence and are ALWAYS kept (never stored) — the blocklist/url
    NULL discipline. Replays are idempotent: a stored keeper re-reports
    ``kept`` with ``keeper_id`` = its own id. Feeding docs in ascending
    id order makes first-seen ≡ build_corpus's min-id keeper (the same
    convention the content deduper's convergence contract uses)."""

    _ENTITY = "keydedup_keys"

    def __init__(
        self,
        spark: SparkSession,
        store,
        key_expr,
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.store = store
        self.key_expr = key_expr  # callable: df -> Column, or col name
        self.id_col = id_col
        self.metrics: dict = {}
        self._prev_decisions: DataFrame | None = None

    _bucket_ids = IncrementalDeduper._bucket_ids
    _pruned_read = IncrementalDeduper._pruned_read
    _release_prev = IncrementalDeduper._release_prev
    close = IncrementalDeduper.close

    def _key(self, docs: DataFrame):
        if callable(self.key_expr):
            return self.key_expr(docs)
        return F.col(self.key_expr)

    def process_batch(self, docs: DataFrame) -> DataFrame:
        """Ingest one batch → decision log; state updated."""
        ic = self.id_col
        self._release_prev()
        keyed = docs.select(
            F.col(ic), self._key(docs).alias("__key")
        ).persist()
        null_kept = keyed.where(F.col("__key").isNull()).select(
            F.col(ic), F.lit("kept").alias("status"),
            F.col(ic).alias("keeper_id"),
        )
        with_key = keyed.where(F.col("__key").isNotNull())
        ids = self._bucket_ids(with_key.select("__key"), ["__key"])
        if not ids:
            decisions = null_kept.persist()
            decisions.count()
            keyed.unpersist()
            self._prev_decisions = decisions
            return decisions
        prior = self._pruned_read(
            self._ENTITY, "__key string, keep_id long", ids=ids
        )
        j = with_key.join(prior, "__key", "left").persist()
        seen = j.where(F.col("keep_id").isNotNull()).select(
            F.col(ic),
            F.when(F.col("keep_id") == F.col(ic), F.lit("kept"))
            .otherwise(F.lit("key_dup")).alias("status"),
            F.col("keep_id").alias("keeper_id"),
        )
        fresh = j.where(F.col("keep_id").isNull()).drop("keep_id")
        batch_keeper = fresh.groupBy("__key").agg(
            F.min(ic).alias("__bk")
        )
        fresh = fresh.join(batch_keeper, "__key")
        batch_dups = fresh.where(F.col(ic) != F.col("__bk")).select(
            F.col(ic), F.lit("key_dup").alias("status"),
            F.col("__bk").alias("keeper_id"),
        )
        new_keepers = fresh.where(F.col(ic) == F.col("__bk"))
        kept = new_keepers.select(
            F.col(ic), F.lit("kept").alias("status"),
            F.col(ic).alias("keeper_id"),
        )
        decisions = (
            null_kept.unionByName(seen)
            .unionByName(batch_dups)
            .unionByName(kept)
            .persist()
        )
        # one action both materializes the log BEFORE the state merge
        # and reads the metric counts (job-count fold, §30)
        status_rows = decisions.groupBy("status").count().collect()
        self.store.merge(
            self._ENTITY,
            new_keepers.select("__key", F.col(ic).alias("keep_id")),
            None, ["__key"], touched_ids=ids,
        )
        j.unpersist()
        keyed.unpersist()
        for r in status_rows:
            k = f"key_dedup_{r['status']}"
            self.metrics[k] = self.metrics.get(k, 0) + r["count"]
        self._prev_decisions = decisions
        return decisions
