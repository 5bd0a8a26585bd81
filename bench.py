"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: median_sec, ...}, "spread": {name: [min, max]},
   "reps": N, "sf": ...}

Every query is fully materialized through the noop sink (format="noop")
so serialization and all shuffles execute; nothing collects to the
driver.

Methodology (BASELINE.md §10): each query runs SPARK_GRAFT_BENCH_REPS
times (default 3) with the cache cleared between reps; the recorded
number is the per-query MEDIAN and "spread" records [min, max]. The
shared-box noise floor (±50% observed on single runs) exceeds most real
plan deltas, so single-run numbers routinely masquerade as regressions.
A wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default 900) guards
the total: once the timed phase exceeds it, remaining queries run once
and are listed in "reps_truncated".
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from southpaw_spark import suite
from southpaw_spark.session import get_spark

HEADLINE = [
    "q13_denormalized_order",  # flagship: full nested-doc assembly + JSON
    "q14_doc_projection",      # doc build + projections
    "q15_shared_entity_tree",  # second tree over shared entities
    "q04_nested_children",     # 1:N nest
    "q05_three_level_tree",    # 4-way join
    "q01_latest_by_key",       # CDC upsert window
    "q12_composite_pk",        # composite-key upsert at lineitem scale
    "q16_filter_unchanged_skip",  # old-row-aware no-op-update skip
    "d01_dedup_exact",
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "d04_simhash",
    "s01_cosine_topk",
    "s02_ivf_topk",
    "t02_quality_score",
    "t05_bpe_token_count",
    "e01_windowed_agg",
    "e02_sessionize",
    "e04_asof_join",
    "m01_image_metadata_decode",  # Arrow mapInPandas path (chained stages)
]


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def ivm_delta_batch(spark, sf_dir: str, state_dir: str) -> float:
    """Streaming catch-up proxy: bootstrap entity state from snapshots,
    then apply one delta micro-batch updating 10% of customers and
    rebuild the affected DenormalizedOrder docs. Returns seconds for the
    delta batch only (bootstrap excluded)."""
    import shutil

    from pyspark.sql import functions as F

    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore
    from southpaw_spark.suite import ORDER_TREE_JSON, ORDER_TREE_KEYS

    shutil.rmtree(state_dir, ignore_errors=True)
    store = ParquetStateStore(
        spark, state_dir, n_buckets=_bench_buckets(_sf_of(sf_dir))
    )
    ivm = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations(ORDER_TREE_JSON),
        keys=ORDER_TREE_KEYS,
        store=store,
    )
    snaps = {
        e: spark.read.parquet(f"{sf_dir}/{e}.parquet") for e in ORDER_TREE_KEYS
    }
    ivm.bootstrap(snaps)
    delta = (
        snaps["customer"]
        .where(F.col("c_custkey") % 10 == 0)
        .withColumn("c_name", F.concat(F.col("c_name"), F.lit("-v2")))
        .withColumn("seq", F.lit(1).cast("long"))
        .withColumn("is_tombstone", F.lit(False))
    )
    t0 = time.monotonic()
    outs = ivm.process_batch({"customer": delta})
    for df in outs.values():
        df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def s03_ivf_kmeans(spark, sf_dir: str) -> float:
    """Trained-quantizer ANN headline (ivf_kmeans_topk): k-means coarse
    cells + 2-probe exact rescore over the embeddings table, same 10
    queries as s01/s02. Lives here rather than in the 50-row driver
    registry; the recall-vs-exact gate is in tests."""
    from pyspark.sql import functions as F

    from southpaw_spark.operators.similarity import ivf_kmeans_topk

    t0 = time.monotonic()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ivf_kmeans_topk(emb, queries, "embedding", "vec_id", k=5).write.format(
        "noop"
    ).mode("overwrite").save()
    return round(time.monotonic() - t0, 3)



def _bench_buckets(sf: float) -> int:
    """Bucket count for the bucketed-layout rows: a bucketed scan's
    parallelism IS its bucket count (a bucket cannot be split for the
    co-located join), so at 10x data 16 buckets would cap the rebuild
    at 16 tasks on 32 cores. Scale with the SF the way a deployment
    sizes buckets to executors (SCALE.md): 16 up to ~sf0.2, 64 beyond."""
    return 16 if sf <= 0.2 else 64


_BUCKETED_STATES: dict = {}


def q13_bucketed(spark, sf_dir: str) -> float:
    """Flagship over the opt-in bucketed state layout (BASELINE.md §11):
    entity states pre-bucketed on their join keys, so the lineitem
    groupBy and the parent⋈children joins read co-located buckets.
    Conversion (bucketize_states) is EXCLUDED from the timed section —
    it is paid once per state version and amortizes across rebuilds
    (measured sf1: 45 s conversion, then 50 s → 4.1 s per build)."""
    from pyspark.sql import functions as F

    from southpaw_spark.operators.denormalize import (
        bucketize_states,
        denormalize,
    )
    from southpaw_spark.relations import load_relations
    from southpaw_spark.suite import (
        ORDER_TREE_BUCKET_KEYS,
        ORDER_TREE_JSON,
        ORDER_TREE_KEYS,
    )

    if sf_dir not in _BUCKETED_STATES:
        states = {
            e: spark.read.parquet(f"{sf_dir}/{e}.parquet")
            for e in ORDER_TREE_KEYS
        }
        _BUCKETED_STATES[sf_dir] = bucketize_states(
            states, ORDER_TREE_BUCKET_KEYS,
            n_buckets=_bench_buckets(_sf_of(sf_dir)),
        )
    rel = load_relations(ORDER_TREE_JSON)[0]
    t0 = time.monotonic()
    docs = denormalize(_BUCKETED_STATES[sf_dir], rel, ORDER_TREE_KEYS)
    docs.select(
        "o_orderkey",
        F.to_json(F.col("doc"), {"ignoreNullFields": "true"}).alias("value"),
    ).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


_NATIVE_STORES: dict = {}


def q13_store_native(spark, sf_dir: str) -> float:
    """Flagship rebuild straight from the state store's NATIVE bucketed
    layout (round 8): the IVM bootstrap buckets each entity by its tree
    join key, and read_bucketed() exposes the layout as zero-exchange
    bucketed scans — no conversion pass at all (q13_bucketed's
    bucketize_states step is what this retires). Bootstrap is excluded
    from the timed section (paid once per state lifetime; every rebuild
    and delta batch after it reads co-located)."""
    from pyspark.sql import functions as F

    from southpaw_spark.operators.denormalize import denormalize
    from southpaw_spark.relations import load_relations
    from southpaw_spark.streaming import (
        IncrementalDenormalizer,
        ParquetStateStore,
    )
    from southpaw_spark.suite import ORDER_TREE_JSON, ORDER_TREE_KEYS

    if sf_dir not in _NATIVE_STORES:
        import tempfile

        sd = tempfile.mkdtemp(prefix="southpaw_bench_native_state_")
        store = ParquetStateStore(
            spark, sd, n_buckets=_bench_buckets(_sf_of(sf_dir))
        )
        ivm = IncrementalDenormalizer(
            spark=spark,
            relations=load_relations(ORDER_TREE_JSON),
            keys=ORDER_TREE_KEYS,
            store=store,
        )
        ivm.bootstrap(
            {
                e: spark.read.parquet(f"{sf_dir}/{e}.parquet")
                for e in ORDER_TREE_KEYS
            }
        )
        _NATIVE_STORES[sf_dir] = store
    store = _NATIVE_STORES[sf_dir]
    rel = load_relations(ORDER_TREE_JSON)[0]
    states = {e: store.read_bucketed(e) for e in ORDER_TREE_KEYS}
    t0 = time.monotonic()
    docs = denormalize(states, rel, ORDER_TREE_KEYS)
    docs.select(
        "o_orderkey",
        F.to_json(F.col("doc"), {"ignoreNullFields": "true"}).alias("value"),
    ).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


_DEDUP_SEED: dict = {}
#: job count of the LAST dedup_stream_batch call per row name (§30
#: bench hygiene — emitted as "aux" in the output record)
_DEDUP_JOBS: dict = {}


def dedup_stream_batch(
    spark, sf_dir: str, fuzzy_keep: str = "min_id"
) -> float:
    """Streaming-dedup headline (the flagship beyond-reference
    component): one fixed batch — 2,500 docs at sf0.1, half the corpus
    at smaller SFs — processed against PRE-SEEDED state holding the
    rest of the corpus. Seeding runs once per (sf_dir, mode)
    (excluded); each rep hardlink-copies the seeded state dir so every
    measurement sees identical initial state (re-feeding the same
    batch into grown state would measure the all-duplicates path
    instead). ``fuzzy_keep="best_quality"`` benches the keeper-swap
    machinery (VERDICT r9 item 9): the retroactive rep→keeper state
    adds a pruned reps read + one groupBy per batch, and this row
    keeps that cost continuously measured."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    if fuzzy_keep == "best_quality":
        from southpaw_spark.operators.text import with_quality_score

        docs = with_quality_score(docs, "text").select(
            "doc_id", "text", "quality_score"
        )
    if (sf_dir, fuzzy_keep) not in _DEDUP_SEED:
        n_docs = docs.count()
        batch_n = min(2500, n_docs // 2)
        seed_dir = tempfile.mkdtemp(prefix="southpaw_bench_dedup_seed_")
        d = IncrementalDeduper(
            spark, ParquetStateStore(spark, seed_dir, n_buckets=16),
            fuzzy_keep=fuzzy_keep,
        )
        d.process_batch(docs.where(F.col("doc_id") >= batch_n))
        d.close()
        _DEDUP_SEED[(sf_dir, fuzzy_keep)] = (seed_dir, batch_n)
    seed_dir, batch_n = _DEDUP_SEED[(sf_dir, fuzzy_keep)]
    work = tempfile.mkdtemp(prefix="southpaw_bench_dedup_work_")
    shutil.rmtree(work)
    shutil.copytree(seed_dir, work, copy_function=os.link)
    # fresh store incarnation for the copy (unique catalog table names)
    try:
        os.remove(os.path.join(work, "_STORE_ID"))
    except OSError:
        pass
    d = IncrementalDeduper(
        spark, ParquetStateStore(spark, work, n_buckets=16),
        fuzzy_keep=fuzzy_keep,
    )
    batch = docs.where(F.col("doc_id") < batch_n)
    # count the Spark jobs this batch submits (the variable fixed-cost
    # creep hides in — §30): identical data per rep, so job count is
    # the per-rep orchestration signature
    sc = spark.sparkContext
    group = f"dedup_bench_{time.monotonic_ns()}"
    sc.setJobGroup(group, "dedup_stream_batch")
    t0 = time.monotonic()
    d.process_batch(batch)
    wall = round(time.monotonic() - t0, 3)
    sc.setJobGroup("southpaw-bench", "")
    _DEDUP_JOBS[f"dedup_stream{'_bq' if fuzzy_keep == 'best_quality' else ''}_batch_jobs"] = len(
        sc.statusTracker().getJobIdsForGroup(group)
    )
    d.close()
    shutil.rmtree(work, ignore_errors=True)
    return wall


_STREAM_E2E_SEED: dict = {}
#: per-run trigger stats for the streaming-topology row (emitted in "aux")
_STREAM_E2E_AUX: dict = {}


def ivm_stream_e2e(spark, sf_dir: str, adaptive: bool = False) -> float:
    """The engine's OPERATING MODE as a tracked number (VERDICT r12 #1):
    continuous Kafka-in → IVM → Kafka-out (ref ``Southpaw.java:253-284``)
    — a 10%-of-customers CDC backlog produced to a real socket broker,
    consumed by ``kafka_py`` in maxOffsetsPerTrigger-capped micro-batches
    (plannerStateDir primes the cap across the restart), driven through
    ``IncrementalDenormalizer.attach_stream`` and published back to a
    docs topic by ``kafka_doc_sink``. Timed section = query start →
    every affected DenormalizedOrder doc observed on the output topic
    (the catch-up drain). Bootstrap, Kafka produce, and state copies are
    setup, excluded — they are paid once per deployment, not per batch.
    Records docs/s + trigger stats in the bench "aux" block.

    ``adaptive=True`` turns on the lag-proportional catch-up cap
    (``maxOffsetsPerTriggerCeiling`` = 4× the steady-state cap): the
    same backlog drains in fewer, bigger batches — the per-trigger
    fixed cost (BASELINE §35) is paid once instead of per cap-sized
    bite. Reported as the separate ``ivm_stream_e2e_adaptive`` row."""
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from southpaw_spark.relations import load_relations
    from southpaw_spark.sources.kafka import (
        kafka_cdc_stream,
        kafka_doc_sink,
        parse_cdc_json,
    )
    from southpaw_spark.sources.kafka_broker import EmbeddedKafkaBroker
    from southpaw_spark.streaming import (
        IncrementalDenormalizer,
        ParquetStateStore,
    )
    from southpaw_spark.suite import ORDER_TREE_JSON, ORDER_TREE_KEYS

    sf = _sf_of(sf_dir)
    cap = 50 if sf <= 0.01 else 500
    if sf_dir not in _STREAM_E2E_SEED:
        seed_dir = tempfile.mkdtemp(prefix="southpaw_bench_e2e_state_")
        store = ParquetStateStore(spark, seed_dir, n_buckets=_bench_buckets(sf))
        ivm = IncrementalDenormalizer(
            spark=spark,
            relations=load_relations(ORDER_TREE_JSON),
            keys=ORDER_TREE_KEYS,
            store=store,
        )
        snaps = {
            e: spark.read.parquet(f"{sf_dir}/{e}.parquet")
            for e in ORDER_TREE_KEYS
        }
        ivm.bootstrap(snaps)
        delta_rows = (
            snaps["customer"]
            .where(F.col("c_custkey") % 10 == 0)
            .withColumn("c_name", F.concat(F.col("c_name"), F.lit("-v2")))
            .collect()
        )
        events = [
            (
                int(r["c_custkey"]) % 4,
                _json.dumps({"c_custkey": int(r["c_custkey"])}).encode(),
                _json.dumps(
                    {
                        "c_name": r["c_name"],
                        "c_nationkey": r["c_nationkey"],
                        "c_acctbal": r["c_acctbal"],
                        "c_mktsegment": r["c_mktsegment"],
                    }
                ).encode(),
            )
            for r in delta_rows
        ]
        expected_docs = (
            snaps["orders"].where(F.col("o_custkey") % 10 == 0).count()
        )
        _STREAM_E2E_SEED[sf_dir] = (seed_dir, events, expected_docs)
    seed_dir, events, expected_docs = _STREAM_E2E_SEED[sf_dir]

    work = tempfile.mkdtemp(prefix="southpaw_bench_e2e_work_")
    shutil.rmtree(work)
    shutil.copytree(seed_dir, work, copy_function=os.link)
    try:
        os.remove(os.path.join(work, "_STORE_ID"))
    except OSError:
        pass
    tmp = tempfile.mkdtemp(prefix="southpaw_bench_e2e_run_")
    ckpt, planner = f"{tmp}/ckpt", f"{tmp}/planner"
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc.customer", partitions=4)
        broker.create_topic("docs.orders", partitions=4)
        ivm = IncrementalDenormalizer(
            spark=spark,
            relations=load_relations(ORDER_TREE_JSON),
            keys=ORDER_TREE_KEYS,
            store=ParquetStateStore(spark, work, n_buckets=_bench_buckets(sf)),
        )
        raw = kafka_cdc_stream(
            spark,
            broker.bootstrap,
            ["cdc.customer"],
            python_source=True,
            max_offsets_per_trigger=cap,
            planner_state_dir=planner,
            max_offsets_ceiling=(4 * cap) if adaptive else None,
        )
        parsed = parse_cdc_json(
            raw,
            key_schema=T.StructType(
                [T.StructField("c_custkey", T.LongType())]
            ),
            value_schema=T.StructType(
                [
                    T.StructField("c_name", T.StringType()),
                    T.StructField("c_nationkey", T.IntegerType()),
                    T.StructField("c_acctbal", T.DoubleType()),
                    T.StructField("c_mktsegment", T.StringType()),
                ]
            ),
            topic_to_entity={"cdc.customer": "customer"},
        )
        sink = kafka_doc_sink(
            spark,
            broker.bootstrap,
            topic_for="docs.orders",
            key_cols_for={"DenormalizedOrder": ["o_orderkey"]},
        )
        cols = {
            "customer": [
                "c_custkey", "c_name", "c_nationkey", "c_acctbal",
                "c_mktsegment", "seq", "is_tombstone",
            ]
        }

        def attach(trigger):
            return ivm.attach_stream(
                parsed,
                entity_col="entity",
                checkpoint_dir=ckpt,
                sink=sink,
                entity_columns=cols,
                trigger=trigger,
            )

        # prime the checkpoint + planner state on the EMPTY topic so the
        # timed restart caps EVERY micro-batch (the Python DS API leaves
        # a fresh query's first batch uncapped; kafka_pyds.py)
        q = attach({"availableNow": True})
        q.awaitTermination(300)
        for p, k, v in events:
            broker.append("cdc.customer", p, k, v)

        def published() -> int:
            return sum(
                broker.end_offset("docs.orders", p) for p in range(4)
            )

        t0 = time.monotonic()
        q = attach({"processingTime": "200 milliseconds"})
        # bounded: a stuck drain records ~900 s and lets the bench's
        # own budget truncation take over instead of spinning 3 reps
        deadline = t0 + 900
        while published() < expected_docs and time.monotonic() < deadline:
            time.sleep(0.1)
        wall = round(time.monotonic() - t0, 3)
        drained = published()
        # wall is recorded; let the in-flight batch COMPLETE before
        # stopping (stop() would abort it and it would never land in
        # recentProgress — docs appear on the topic mid-batch)
        try:
            q.processAllAvailable()
        except Exception:
            pass
        q.stop()
        q.awaitTermination(60)
        prog = [
            int(p.durationMs.get("triggerExecution", 0))
            for p in q.recentProgress
            if p.numInputRows > 0 and p.durationMs
        ]
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    prog.sort()
    # a deadline-hit drain must not masquerade as a completed one:
    # rate the docs actually published and flag the truncation
    k = "ivm_stream_e2e_adaptive" if adaptive else "ivm_stream_e2e"
    _STREAM_E2E_AUX.update(
        {
            f"{k}_docs_per_s": round(drained / wall, 1),
            f"{k}_docs": expected_docs,
            **(
                {f"{k}_truncated": True,
                 f"{k}_docs_published": drained}
                if drained < expected_docs else {}
            ),
            f"{k}_events": len(events),
            f"{k}_triggers": len(prog),
            f"{k}_trigger_ms_p50": (
                prog[len(prog) // 2] if prog else None
            ),
        }
    )
    return wall


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("southpaw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up pass at the smallest scale factor: drives every headline
    # plan shape through analysis + whole-stage codegen + JIT once, so
    # the timed loop below measures steady-state per-query wall — the
    # quantity that matters on a long-lived cluster. (Without this the
    # first timed query, q13, absorbs ~12 s of one-time JVM warm-up
    # that has nothing to do with its plan.) Disable with
    # SPARK_GRAFT_NO_WARMUP=1 to reproduce cold-start numbers.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

    def resolve(name: str):
        # rows rotate between the 50-row driver gate (QUERIES) and the
        # local-only EXTRA registry across rounds — resolve either way
        return suite.QUERIES.get(name) or suite.EXTRA_QUERIES[name]

    if not os.environ.get("SPARK_GRAFT_NO_WARMUP") and os.path.isdir(warm_dir):
        for name in HEADLINE:
            resolve(name)(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        ivm_delta_batch(spark, warm_dir, "/tmp/southpaw_bench_warm_state")
        ivm_stream_e2e(spark, warm_dir)
        s03_ivf_kmeans(spark, warm_dir)
        q13_bucketed(spark, warm_dir)
        q13_store_native(spark, warm_dir)
        dedup_stream_batch(spark, warm_dir)
        dedup_stream_batch(spark, warm_dir, "best_quality")
        for nm in (
            "d15_duplicate_spans", "s08_ivf_quantized_topk",
            "e12_ohlc", "t19_line_clean",
            "d18_semantic_dedup", "t22_model_quality_score",
            "d20_embedding_contamination", "a11_cohort_retention",
            "e13_funnel", "e14_rolling_active_users",
        ):
            fn = suite.EXTRA_QUERIES.get(nm) or suite.QUERIES[nm]
            fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "900"))

    def run_query(name: str) -> float:
        t0 = time.monotonic()
        resolve(name)(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.monotonic() - t0, 3)

    runners = [(n, lambda n=n: run_query(n)) for n in HEADLINE]
    runners.append(
        (
            "ivm_delta_batch",
            lambda: ivm_delta_batch(spark, sf_dir, "/tmp/southpaw_bench_state"),
        )
    )
    runners.append(
        ("ivm_stream_e2e", lambda: ivm_stream_e2e(spark, sf_dir))
    )
    runners.append(
        ("ivm_stream_e2e_adaptive",
         lambda: ivm_stream_e2e(spark, sf_dir, adaptive=True))
    )
    runners.append(("s03_ivf_kmeans", lambda: s03_ivf_kmeans(spark, sf_dir)))
    runners.append(("q13_bucketed", lambda: q13_bucketed(spark, sf_dir)))
    runners.append(
        ("q13_store_native", lambda: q13_store_native(spark, sf_dir))
    )
    runners.append(
        ("dedup_stream_batch", lambda: dedup_stream_batch(spark, sf_dir))
    )
    runners.append(
        (
            "dedup_stream_bq_batch",
            lambda: dedup_stream_batch(spark, sf_dir, "best_quality"),
        )
    )

    def run_extra(name: str) -> float:
        # rows rotate between the 50-row driver gate (QUERIES) and the
        # local-only EXTRA registry across rounds — resolve either way
        fn = suite.EXTRA_QUERIES.get(name) or suite.QUERIES[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    runners.append(
        ("d15_duplicate_spans", lambda: run_extra("d15_duplicate_spans"))
    )
    runners.append(
        ("s08_ivf_quantized", lambda: run_extra("s08_ivf_quantized_topk"))
    )
    runners.append(("e12_ohlc", lambda: run_extra("e12_ohlc")))
    runners.append(("t19_line_clean", lambda: run_extra("t19_line_clean")))
    runners.append(
        ("d18_semantic_dedup", lambda: run_extra("d18_semantic_dedup"))
    )
    runners.append(
        ("t22_model_quality", lambda: run_extra("t22_model_quality_score"))
    )
    runners.append(
        ("d20_embedding_contamination",
         lambda: run_extra("d20_embedding_contamination"))
    )
    runners.append(
        ("a11_cohort_retention", lambda: run_extra("a11_cohort_retention"))
    )
    runners.append(("e13_funnel", lambda: run_extra("e13_funnel")))
    runners.append(
        ("e14_rolling_active", lambda: run_extra("e14_rolling_active_users"))
    )
    runners.append(("d22_line_dedup", lambda: run_extra("d22_line_dedup")))
    runners.append(
        ("t23_ppl_buckets", lambda: run_extra("t23_perplexity_buckets"))
    )
    runners.append(
        ("t24_blocklist", lambda: run_extra("t24_blocklist_hits"))
    )
    runners.append(
        ("t25_pack_sequences", lambda: run_extra("t25_pack_sequences"))
    )
    runners.append(
        ("t26_epoch_repeat", lambda: run_extra("t26_epoch_repeat"))
    )
    runners.append(
        ("t27_ref_perplexity",
         lambda: run_extra("t27_reference_perplexity"))
    )
    runners.append(
        ("t28_language_id", lambda: run_extra("t28_language_id"))
    )
    runners.append(
        ("t29_corpus_profile", lambda: run_extra("t29_corpus_profile"))
    )
    runners.append(
        ("t30_gopher_quality", lambda: run_extra("t30_gopher_quality"))
    )
    runners.append(
        ("t31_gopher_repetition",
         lambda: run_extra("t31_gopher_repetition"))
    )
    runners.append(
        ("t32_chunk_documents", lambda: run_extra("t32_chunk_documents"))
    )
    runners.append(
        ("s11_centroid_outliers",
         lambda: run_extra("s11_centroid_outliers"))
    )

    # Box-speed control (VERDICT r14 item 4): cross-round driver
    # comparisons keep tripping on machine drift, so every bench record
    # carries its own normalizer — a PINNED pure-codegen query defined
    # RIGHT HERE (never in suite.py, so suite edits can't touch it):
    # one lineitem scan + one hash aggregate, whole-stage codegen end
    # to end. Median of 3, measured before the budgeted loop. Compare
    # BENCH_rN rows as (row / control_wall) ratios across rounds.
    def _control_once() -> float:
        from pyspark.sql import functions as F

        t0 = time.monotonic()
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count("*").alias("n"),
        ).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    _control_once()  # its own warm-up (plan + codegen)
    control_samples = sorted(_control_once() for _ in range(3))
    control_wall = round(control_samples[1], 3)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    truncated: list[str] = []
    bench_t0 = time.monotonic()
    for name, runner in runners:
        n_reps = reps
        if time.monotonic() - bench_t0 > budget:
            n_reps = 1
            truncated.append(name)
        samples = []
        for _ in range(n_reps):
            # clear caches so every rep pays identical (cache-population)
            # cost — reps measure run-to-run machine noise, not a
            # first-rep-cold / later-reps-cached mixture
            spark.catalog.clearCache()
            samples.append(runner())
        samples.sort()
        timings[name] = samples[len(samples) // 2]
        spread[name] = [samples[0], samples[-1]]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "southpaw_spark headline suite wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "reps": reps,
        "sf": sf,
    }
    aux = {
        **_DEDUP_JOBS,
        **_STREAM_E2E_AUX,
        "control_wall": control_wall,
        "control_spread": [
            round(control_samples[0], 3), round(control_samples[-1], 3),
        ],
    }
    out["aux"] = dict(sorted(aux.items()))
    if truncated:
        out["reps_truncated"] = truncated
    # Full record (incl. per-query [min,max] spreads) goes to a file —
    # the driver's stdout capture keeps only the last 2000 chars, which
    # truncated BENCH_r10's single long line. Stdout gets a compact
    # line (no spread) that stays under the capture window.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"), "w"
    ) as fh:
        json.dump(out, fh)
        fh.write("\n")
    compact = {k: v for k, v in out.items() if k != "spread"}
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # last resort: drop per-query detail, never cut
        compact["queries_in"] = "BENCH_LOCAL.json"
        compact["queries"] = {}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
