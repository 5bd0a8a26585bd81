"""Command-line entry points — the analog of the reference's
``Southpaw.main`` (``Southpaw.java:490-553``): ``--build``,
``--verify-state``, ``--backup``, ``--restore``, ``--restore-latest``,
``--delete-state``, ``--delete-backups``.

Config is YAML (same spirit as the reference's snakeyaml config):

    state.dir: /path/to/state
    relations: /path/to/relations.json      # reference JSON format
    entities:
      orders:
        keys: [o_orderkey]
        snapshot: /root/testdata/sf0.001/orders.parquet
        # or: changelog: /path/changelog.parquet  (seq,*key,*payload,is_tombstone)
        filters:
          - {predicate: "o_orderstatus = 'X'", mode: delete}
    output.dir: /path/out                    # one parquet dir per tree

Usage: python -m southpaw_spark.cli --config cfg.yaml --build
"""

from __future__ import annotations

import argparse
import json
import sys

import yaml
from pyspark.sql import functions as F

from southpaw_spark.operators.cdc import FilterMode, FilterRule
from southpaw_spark.relations import load_relations
from southpaw_spark.session import get_spark
from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore
from southpaw_spark.verify import verify_store


def _load(spark, cfg, entity):
    ecfg = cfg["entities"][entity]
    if "snapshot" in ecfg:
        df = spark.read.parquet(ecfg["snapshot"])
        return df, True
    df = spark.read.parquet(ecfg["changelog"])
    return df, False


def _rules(cfg):
    out = {}
    for entity, ecfg in cfg.get("entities", {}).items():
        rules = [
            FilterRule(F.expr(r["predicate"]), FilterMode(r["mode"]))
            for r in ecfg.get("filters", [])
        ]
        if rules:
            out[entity] = rules
    return out


def build(spark, cfg) -> None:
    relations = load_relations(cfg["relations"])
    keys = {e: ecfg["keys"] for e, ecfg in cfg["entities"].items()}
    store = ParquetStateStore(
        spark,
        cfg["state.dir"],
        # unset → inherit the persisted layout (or 16 for a fresh store);
        # an explicit conflicting value fails loudly in the store
        n_buckets=int(cfg["state.buckets"]) if "state.buckets" in cfg else None,
    )
    ivm = IncrementalDenormalizer(
        spark=spark,
        relations=relations,
        keys=keys,
        store=store,
        filter_rules=_rules(cfg),
    )
    snapshots, changelogs = {}, {}
    for entity in cfg["entities"]:
        df, is_snapshot = _load(spark, cfg, entity)
        if is_snapshot:
            snapshots[entity] = df
        else:
            changelogs[entity] = df
    ivm.bootstrap(
        {
            e: (
                snapshots[e]
                if e in snapshots
                # entities arriving only as changelogs bootstrap empty
                else changelogs[e].where("1=0").drop("seq", "is_tombstone")
            )
            for e in keys
        }
    )
    if changelogs:
        # merge changelog deltas into state (outputs discarded: a build
        # is a FULL build — emitting only changelog-dirtied roots would
        # drop every snapshot-bootstrapped root untouched by a delta)
        ivm.process_batch(changelogs)
    # full build over the final merged state: every live root gets a
    # document; roots tombstoned by a changelog get a null-value row
    from southpaw_spark.operators.cdc import (
        apply_filter_rules,
        latest_by_key,
    )
    from southpaw_spark.operators.denormalize import denormalize_to_json

    states = {e: store.read(e) for e in keys}
    rules = _rules(cfg)
    outputs = {}
    for rel in relations:
        tomb = None
        if rel.entity in changelogs:
            log = apply_filter_rules(
                changelogs[rel.entity], rules.get(rel.entity, ())
            )
            latest = latest_by_key(log, keys[rel.entity])
            tomb = latest.where(
                F.coalesce(F.col("is_tombstone"), F.lit(False))
            ).select(*keys[rel.entity])
        outputs[rel.denormalized_name] = denormalize_to_json(
            states, rel, keys, tombstoned_roots=tomb
        )
    out_dir = cfg["output.dir"]
    for name, df in outputs.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}")
        print(f"built {name} -> {out_dir}/{name}")


def stream(spark, cfg, run_time_s: float | None = None) -> None:
    """Run the engine as a continuous consume loop — the analog of the
    reference's ``run(runTimeMS)`` entry (``Southpaw.java:253-284,
    679-681``): attach the configured CDC stream to the IVM orchestrator
    and emit doc upserts/tombstones per micro-batch until stopped (or
    for ``run_time_s`` seconds, the reference's time-boxed run).

    Config block::

        stream:
          source.dir: /path/frames     # file replay of the CDC frame
          format: json                 # json | parquet
          schema: "seq long, id long, ..., entity string"
          entity.col: entity
          checkpoint.dir: /path/ckpt
          output.dir: /path/stream_out # parquet append per tree
          max.files.per.trigger: 1     # optional
          metrics.port: 9108           # optional: Prometheus /metrics

    A real Kafka deployment swaps ``source.dir`` for
    ``sources.kafka.kafka_cdc_stream`` + ``parse_cdc_json`` /
    ``attach_avro_cdc_multi_stream`` (README: O1 recipe); state,
    checkpoint, and sink wiring are identical. On restart, entities
    with existing state resume from it (bootstrap is first-run-only);
    the checkpoint brings the source offsets.

    ``metrics.port`` serves the reference-named metric registry
    (records consumed, batch duration, topic lag, backup age) at
    ``GET /metrics`` in Prometheus exposition format for the run's
    lifetime — the deployable analog of the reference's JmxReporter
    (``metric/Metrics.java:50,137``).
    """
    scfg = cfg["stream"]
    relations = load_relations(cfg["relations"])
    keys = {e: ecfg["keys"] for e, ecfg in cfg["entities"].items()}
    store = ParquetStateStore(
        spark,
        cfg["state.dir"],
        n_buckets=int(cfg["state.buckets"]) if "state.buckets" in cfg else None,
    )
    ivm = IncrementalDenormalizer(
        spark=spark, relations=relations, keys=keys, store=store,
        filter_rules=_rules(cfg),
    )
    missing = [e for e in keys if not store.exists(e)]
    if missing:
        snapshots = {}
        for entity in missing:
            ecfg = cfg["entities"][entity]
            if "snapshot" in ecfg:
                snapshots[entity] = spark.read.parquet(ecfg["snapshot"])
            elif "changelog" in ecfg:
                snapshots[entity] = (
                    spark.read.parquet(ecfg["changelog"])
                    .where("1=0").drop("seq", "is_tombstone")
                )
            else:
                raise ValueError(
                    f"entity {entity!r} has no state and no snapshot/"
                    "changelog to bootstrap its schema from"
                )
        ivm.bootstrap(snapshots)

    out_dir = scfg["output.dir"]

    def sink(name: str, df) -> None:
        df.write.mode("append").parquet(f"{out_dir}/{name}")

    reader = spark.readStream.schema(scfg["schema"])
    if "max.files.per.trigger" in scfg:
        reader = reader.option(
            "maxFilesPerTrigger", str(scfg["max.files.per.trigger"])
        )
    fmt = scfg.get("format", "json")
    source = getattr(reader, fmt)(scfg["source.dir"])
    entity_columns = {
        e: ecfg["columns"]
        for e, ecfg in cfg["entities"].items()
        if "columns" in ecfg
    }
    exporter = None
    listener = None
    if "metrics.port" in scfg:
        from southpaw_spark.streaming.metrics import (
            Metrics,
            MetricsHttpExporter,
            SouthpawStreamingListener,
        )

        ivm.collect_metrics = True
        ivm.metrics = Metrics()
        listener = SouthpawStreamingListener(ivm.metrics)
        spark.streams.addListener(listener)
        exporter = MetricsHttpExporter(
            ivm.metrics, port=int(scfg["metrics.port"])
        )
        print(f"metrics -> http://{exporter.host}:{exporter.port}/metrics")
    query = ivm.attach_stream(
        source,
        entity_col=scfg.get("entity.col", "entity"),
        checkpoint_dir=scfg["checkpoint.dir"],
        sink=sink,
        entity_columns=entity_columns or None,
    )
    try:
        if run_time_s:
            import time as _time

            deadline = _time.monotonic() + run_time_s
            while _time.monotonic() < deadline:
                query.processAllAvailable()
                _time.sleep(min(1.0, max(0.0, deadline - _time.monotonic())))
        else:
            query.awaitTermination()
    finally:
        query.stop()
        if exporter is not None:
            exporter.close()
        if listener is not None:
            spark.streams.removeListener(listener)


def verify(spark, cfg) -> int:
    keys = {e: ecfg["keys"] for e, ecfg in cfg["entities"].items()}
    store = ParquetStateStore(spark, cfg["state.dir"])
    changelogs = {}
    for entity, ecfg in cfg["entities"].items():
        if "changelog" in ecfg:
            changelogs[entity] = spark.read.parquet(ecfg["changelog"])
    bad = 0
    for entity, report in verify_store(
        store, changelogs, keys, _rules(cfg)
    ).items():
        n = report.count()
        print(f"verify {entity}: {'OK' if n == 0 else f'{n} DISCREPANCIES'}")
        bad += n
    return 1 if bad else 0


#: build_corpus kwargs settable straight from the ``corpus:`` config
#: block (YAML scalars/maps pass through; ``benchmark`` is handled
#: separately because it is a dataset path, not a scalar)
_CORPUS_KEYS = (
    "min_quality", "min_tokens", "model_weights", "model_bias",
    "min_model_score", "bpe_merges", "langs", "lang_model", "lang_biases",
    "gopher", "gopher_thresholds", "gopher_rep", "gopher_rep_thresholds",
    "line_clean", "url_col", "blocklist",
    "max_contamination_rate", "contamination_n", "decontaminate_mode",
    "exact_dedup", "fuzzy_threshold", "fuzzy_n", "fuzzy_keep",
    "span_dedup_k", "span_min_count", "line_dedup_min_count",
    "ppl_domain_col", "ppl_cuts", "ppl_labels", "ppl_keep", "min_logprob",
    "sample_rates", "sample_default_rate", "sample_salt",
    "token_budgets", "mix_total_tokens", "mix_alpha",
    "pack_token_budget", "split_fractions",
)


def corpus_stream_cmd(spark, cfg) -> None:
    """``corpus.stream: true``: run the STREAMING corpus build
    (`pipelines.corpus_stream`) — stateless annotate/gate/split stages
    in the streaming plan, content dedup against the persistent
    incremental-dedup state at ``corpus.state_dir``, kept docs appended
    to ``corpus.output``. The availableNow trigger drains everything
    currently in ``corpus.input`` and stops — the cron-shaped
    incremental corpus build: each invocation processes the newly
    landed files against the same state and checkpoint."""
    from southpaw_spark.pipelines import corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    c = cfg["corpus"]
    input_format = c.get("input_format", "parquet")
    if input_format not in ("parquet", "json", "kafka"):
        raise ValueError(
            "streaming corpus input_format must be parquet|json|kafka "
            f"(crawl archives land as files first); got {input_format!r}"
        )
    if input_format == "kafka":
        # documents arrive as JSON values on a topic; consumed via the
        # jar-free kafka_py source (sources/kafka_pyds.py). Config:
        #   corpus.kafka: {bootstrap, topic, value_schema (DDL),
        #                  [starting_offsets], [max_offsets_per_trigger]}
        from pyspark.sql import functions as F

        from southpaw_spark.sources.kafka import kafka_cdc_stream

        k = c["kafka"]
        raw = kafka_cdc_stream(
            spark,
            k["bootstrap"],
            [k["topic"]],
            starting_offsets=k.get("starting_offsets", "earliest"),
            max_offsets_per_trigger=int(
                k.get("max_offsets_per_trigger", 250_000)
            ),
            python_source=True,
            # adaptive catch-up (optional): deep backlogs drain in
            # lag-proportional batches bounded by the ceiling
            max_offsets_ceiling=(
                int(k["max_offsets_ceiling"])
                if "max_offsets_ceiling" in k else None
            ),
            adaptive_drain_triggers=int(
                k.get("adaptive_drain_triggers", 1)
            ),
            # e.g. the kafka.security.protocol / kafka.sasl.* /
            # kafka.ssl.* auth surface (tests/test_kafka_security.py)
            options=k.get("options"),
        )
        stream = raw.select(
            F.from_json(
                F.col("value").cast("string"), k["value_schema"]
            ).alias("d")
        ).select("d.*")
    else:
        # streaming file sources need an explicit schema: probe the
        # static files
        schema = getattr(spark.read, input_format)(c["input"]).schema
        reader = spark.readStream.schema(schema)
        if "max_files_per_trigger" in c:
            reader = reader.option(
                "maxFilesPerTrigger", str(int(c["max_files_per_trigger"]))
            )
        stream = getattr(reader, input_format)(c["input"])
    deduper = IncrementalDeduper(
        spark,
        ParquetStateStore(
            spark, c["state_dir"],
            n_buckets=int(c.get("state_buckets", 16)),
        ),
        # a config shared between batch and stream builds carries the
        # batch `fuzzy_threshold`/`fuzzy_n`; honor both as defaults so
        # the two builds agree unless `stream_sim_threshold` overrides
        sim_threshold=float(
            c.get("stream_sim_threshold", c.get("fuzzy_threshold", 0.7))
        ),
        n=int(c.get("fuzzy_n", 3)),
        fuzzy_keep=c.get("fuzzy_keep", "min_id"),
    )
    if not c.get("exact_dedup", True):
        # the streaming deduper ALWAYS exact-dedups (its fuzzy pass is
        # built on the exact state); a shared config that disables the
        # batch exact stage would silently produce a different corpus
        # here — fail loudly like every other unsupported stream key
        raise ValueError(
            "corpus.stream: true cannot honor exact_dedup: false — the "
            "incremental deduper always exact-dedups; drop the key or "
            "run --build-corpus without stream: true"
        )
    span_deduper = line_deduper = None
    if "span_dedup_k" in c or "line_dedup_min_count" in c:
        from southpaw_spark.streaming.dedup_stream import (
            IncrementalLineDeduper,
            IncrementalSpanDeduper,
        )

        buckets = int(c.get("state_buckets", 16))
        if "span_dedup_k" in c:
            span_deduper = IncrementalSpanDeduper(
                spark,
                ParquetStateStore(
                    spark, c["state_dir"] + "/span", n_buckets=buckets
                ),
                text_col=c.get("text_col", "text"),
                id_col=c.get("id_col", "doc_id"),
                k=int(c["span_dedup_k"]),
                min_count=int(c.get("span_min_count", 2)),
            )
        if "line_dedup_min_count" in c:
            line_deduper = IncrementalLineDeduper(
                spark,
                ParquetStateStore(
                    spark, c["state_dir"] + "/line", n_buckets=buckets
                ),
                text_col=c.get("text_col", "text"),
                id_col=c.get("id_col", "doc_id"),
                min_count=int(c["line_dedup_min_count"]),
            )
    out = c["output"]

    def sink(kept, batch_id):
        # EXACTLY-ONCE output under the at-least-once replay contract:
        # batch ids are stable per checkpoint, so writing each batch to
        # its own partition dir with overwrite makes a replayed batch
        # rewrite the same files instead of appending duplicates
        # (replay re-reports prior keepers with keeper_id == their own
        # id, so the replayed kept set equals the original and the
        # overwrite is idempotent)
        kept.write.mode("overwrite").parquet(
            f"{out}/batch_id={batch_id}"
        )

    # forward the SAME _CORPUS_KEYS surface the batch path advertises
    # (regression guard: a hand-maintained kwargs list silently dropped
    # gopher_rep). Keys corpus_stream's signature doesn't have are
    # batch-only stages — rejected LOUDLY instead of silently skipped.
    from inspect import signature

    stream_params = set(signature(corpus_stream).parameters)
    # consumed/superseded by the streaming deduper itself, not
    # corpus_stream: fuzzy_threshold → sim_threshold and fuzzy_n → n
    # are wired into IncrementalDeduper above, and exact_dedup: false
    # is rejected loudly above (the stream always exact-dedups) — a
    # config shared between batch and stream builds is either honored
    # or fails startup, never silently diverges. Span/line dedup keys are
    # NOT exempt: those stages genuinely don't run streaming
    # (deliberate — silently skipping them would change the corpus);
    # the break is called out in MIGRATION.md. Span/line dedup keys are
    # wired HERE (incremental dedupers built above, cut applied at the
    # post-drain compaction) rather than forwarded as kwargs.
    dedup_keys = {
        "fuzzy_keep", "fuzzy_threshold", "fuzzy_n", "exact_dedup",
        "span_dedup_k", "span_min_count", "line_dedup_min_count",
    }
    kwargs = {}
    batch_only = []
    for key in _CORPUS_KEYS:
        if key not in c or key in dedup_keys:
            continue
        if key in stream_params:
            kwargs[key] = c[key]
        else:
            batch_only.append(key)
    if batch_only:
        raise ValueError(
            f"corpus.stream: true cannot honor {sorted(batch_only)} — "
            "these stages exist only in the batch build; drop them or "
            "run --build-corpus without stream: true"
        )
    q = corpus_stream(
        deduper, stream, c["checkpoint_dir"],
        text_col=c.get("text_col", "text"),
        id_col=c.get("id_col", "doc_id"),
        url_dedup=bool(c.get("url_dedup", False)),
        benchmark=(
            spark.read.parquet(c["benchmark"])
            if "benchmark" in c else None
        ),
        ppl_reference=(
            spark.read.parquet(c["ppl_reference"])
            if "ppl_reference" in c else None
        ),
        span_deduper=span_deduper,
        line_deduper=line_deduper,
        sink=sink,
        trigger={"availableNow": True},
        **kwargs,
    )
    try:
        q.awaitTermination()
    finally:
        deduper.close()
        for d in (span_deduper, line_deduper):
            if d is not None:
                d.close()
    for k, v in sorted(deduper.metrics.items()):
        print(f"{k}: {v}")
    if span_deduper is not None or line_deduper is not None:
        # deferred span/line cut: boilerplate evidence is retroactive,
        # so the rewrite is only correct at fold time — compact the
        # batch-dir tree into `<output>_compacted` with the cumulative
        # spans applied (each cron invocation refreshes it; the batch
        # dirs under `output` stay the append-only ledger)
        from southpaw_spark.pipelines import compact_corpus_stream_output

        compact_corpus_stream_output(
            spark, out, out + "_compacted",
            id_col=c.get("id_col", "doc_id"),
            text_col=c.get("text_col", "text"),
            span_deduper=span_deduper,
            line_deduper=line_deduper,
            bpe_merges=c.get("bpe_merges"),
        )
        print(f"corpus (stream, span/line-cut) -> {out}_compacted")
    print(f"corpus (stream) -> {out}")


def build_corpus_cmd(spark, cfg) -> None:
    """``--build-corpus``: run the training-corpus pipeline declared in
    the config's ``corpus:`` block (the §7.5 beyond-reference surface
    as an operational entry point) and ship the result — either
    hive-partitioned via ``write_corpus`` or as a deterministic
    epoch-shuffle via ``write_shuffled_corpus`` when
    ``shuffle_shards`` is set. Prints the per-stage survivor report."""
    from southpaw_spark.pipelines import (
        build_corpus,
        write_corpus,
        write_shuffled_corpus,
    )

    c = cfg["corpus"]
    if c.get("stream"):
        corpus_stream_cmd(spark, cfg)
        return
    input_format = c.get("input_format", "parquet")
    if input_format in ("wet", "warc"):
        # crawl-archive front door (sources/warc.py): WET conversion
        # records land directly on the documents schema; raw WARC
        # response records go through HTTP split + HTML text extraction
        from southpaw_spark.sources.warc import read_warc_html, read_wet

        reader = read_wet if input_format == "wet" else read_warc_html
        docs = reader(
            spark, c["input"],
            strict=bool(c.get("warc_strict", True)),
            max_payload_bytes=c.get("max_payload_bytes"),
        )
    elif input_format == "parquet":
        docs = spark.read.parquet(c["input"])
    else:
        raise ValueError(
            f"corpus.input_format must be parquet|wet|warc; "
            f"got {input_format!r}"
        )
    text_col = c.get("text_col", "text")
    id_col = c.get("id_col", "doc_id")
    kwargs = {k: c[k] for k in _CORPUS_KEYS if k in c}
    if "benchmark" in c:
        kwargs["benchmark"] = spark.read.parquet(c["benchmark"])
    if "ppl_reference" in c:
        # clean reference corpus for the t23 bucket LM / t27 gate —
        # a dataset path, like benchmark
        kwargs["ppl_reference"] = spark.read.parquet(c["ppl_reference"])
    kept, report = build_corpus(
        docs, text_col=text_col, id_col=id_col, **kwargs
    )
    for stage, n in report.items():
        print(f"{stage}: {n}")
    out = c["output"]
    if c.get("shuffle_shards"):
        write_shuffled_corpus(
            kept, out, id_col,
            n_shards=int(c["shuffle_shards"]),
            salt=str(c.get("shuffle_salt", "")),
        )
    else:
        write_corpus(
            kept, out,
            partition_by=c.get("partition_by"),
            max_records_per_file=c.get("max_records_per_file", 100_000),
        )
    kept.unpersist()
    print(f"corpus -> {out}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="southpaw_spark")
    p.add_argument("--config", required=True)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--build", action="store_true")
    g.add_argument("--stream", action="store_true",
                   help="run the continuous consume loop (reference "
                        "run(); config block 'stream:')")
    g.add_argument("--verify-state", action="store_true")
    g.add_argument("--backup", metavar="BACKUP_DIR")
    g.add_argument("--restore", metavar="BACKUP_PATH")
    g.add_argument("--restore-latest", metavar="BACKUP_DIR")
    g.add_argument("--delete-state", action="store_true")
    g.add_argument("--delete-backups", metavar="BACKUP_DIR")
    g.add_argument("--build-corpus", action="store_true",
                   help="run the training-corpus pipeline (config "
                        "block 'corpus:') and write the shipped "
                        "dataset")
    g.add_argument("--vacuum", action="store_true",
                   help="drop state versions older than the newest "
                        "--keep-versions committed versions per entity")
    g.add_argument("--rebucket", type=int, metavar="N",
                   help="migrate the state store to N hash buckets "
                        "(full rewrite + atomic swap; run quiesced). "
                        "Size N to the data: a bucketed scan's "
                        "parallelism is its bucket count")
    g.add_argument("--vacuum-index", metavar="INDEX_DIR",
                   help="fold _deleted/ tombstones into a persisted ANN "
                        "index (LSH, PQ, or IVF layout auto-detected) and drop "
                        "them — run after corpus dedup deletions")
    g.add_argument("--retrain-index", metavar="INDEX_DIR",
                   help="act on a drifted index's guard: re-train the "
                        "quantizer on current survivors and swap (layout "
                        "auto-detected: IVF retrains centroids, LSH "
                        "re-buckets with auto-sized planes; PQ needs "
                        "--retrain-corpus for the full-precision vectors)")
    p.add_argument("--retrain-corpus", metavar="PARQUET", default=None,
                   help="with --retrain-index on a PQ layout: parquet "
                        "with the full-precision vectors")
    p.add_argument("--vec-col", default="embedding",
                   help="vector column for --retrain-corpus "
                        "(default: embedding)")
    p.add_argument("--id-col", default="vec_id",
                   help="id column for --retrain-corpus "
                        "(default: vec_id)")
    p.add_argument("--relations", metavar="PATH", default=None,
                   help="override the config's relations JSON path "
                        "(reference --relations flag)")
    p.add_argument("--restore-mode", default="always",
                   choices=["always", "when_needed", "never"])
    p.add_argument("--backup-retention", type=int, default=None,
                   metavar="N", help="keep only the newest N backups")
    p.add_argument("--keep-versions", type=int, default=2, metavar="N",
                   help="state versions to keep per entity with --vacuum "
                        "(default 2; >=2 keeps in-flight readers alive)")
    p.add_argument("--run-time-s", type=float, default=None, metavar="SEC",
                   help="with --stream: stop after SEC seconds (the "
                        "reference's time-boxed run(runTimeMS)); default "
                        "runs until terminated")
    args = p.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    if args.relations:
        cfg["relations"] = args.relations
    spark = get_spark("southpaw-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.vacuum_index:
        import os as _os

        from southpaw_spark.operators.ann_index import (
            _index_fs,
            vacuum_ann_index,
            vacuum_ivf_index,
            vacuum_pq_index,
        )

        # layout detection through the FS seam so a scheme:// index
        # root (s3a://, file://) routes to the right vacuum too
        _fs = _index_fs(args.vacuum_index, spark)
        if _fs.isdir(_os.path.join(args.vacuum_index, "codes")):
            fn = vacuum_pq_index
        elif _fs.isdir(_os.path.join(args.vacuum_index, "cells")):
            fn = vacuum_ivf_index
        else:
            fn = vacuum_ann_index
        n = fn(spark, args.vacuum_index)
        print(f"index vacuum: {n} tombstones folded")
        return 0
    if args.retrain_index:
        import os as _os

        from southpaw_spark.operators.ann_index import (
            _index_fs,
            rebuild_ann_index,
            retrain_ivf_index,
            retrain_pq_index,
        )

        root = args.retrain_index
        _fs = _index_fs(root, spark)
        if _fs.isdir(_os.path.join(root, "codes")):
            if not args.retrain_corpus:
                raise ValueError(
                    "--retrain-index on a PQ layout needs "
                    "--retrain-corpus (PQ codes are lossy; retraining "
                    "needs the full-precision vectors)"
                )
            meta = retrain_pq_index(
                spark, root, spark.read.parquet(args.retrain_corpus),
                args.vec_col, args.id_col,
            )
        elif _fs.isdir(_os.path.join(root, "cells")):
            meta = retrain_ivf_index(spark, root)
        else:
            meta = rebuild_ann_index(spark, root)
        printable = {k: v for k, v in meta.items() if k != "planes"}
        print(f"index retrained: {printable}")
        return 0
    if args.build:
        build(spark, cfg)
        return 0
    if args.build_corpus:
        build_corpus_cmd(spark, cfg)
        return 0
    if args.stream:
        stream(spark, cfg, run_time_s=args.run_time_s)
        return 0
    if args.verify_state:
        return verify(spark, cfg)
    store = ParquetStateStore(spark, cfg["state.dir"])
    if args.backup:
        dest = store.backup(args.backup, retention=args.backup_retention)
        print(f"backup -> {dest}")
        return 0
    if args.restore:
        restored = store.restore(args.restore, args.restore_mode)
        print(f"restore: {'done' if restored else 'skipped'}")
        return 0
    if args.restore_latest:
        path = store.restore_latest(args.restore_latest, args.restore_mode)
        print(f"restore: {path if path else 'skipped'}")
        return 0
    if args.delete_state:
        store.delete_state()
        print("state deleted")
        return 0
    if args.delete_backups:
        n = ParquetStateStore.delete_backups(args.delete_backups)
        print(f"deleted {n} backups")
        return 0
    if args.vacuum:
        store.vacuum(keep=max(1, args.keep_versions))
        print(f"vacuumed (kept {max(1, args.keep_versions)} versions)")
        return 0
    if args.rebucket is not None:
        # `is not None`, not truthiness: --rebucket 0 must reach
        # store.rebucket's loud "n_buckets must be >= 1" instead of
        # falling through to a silent exit 2.
        store.rebucket(args.rebucket)
        print(f"rebucketed -> {args.rebucket} buckets")
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
