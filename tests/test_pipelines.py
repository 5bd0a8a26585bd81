"""Corpus-build pipeline wiring: each operator is oracle-checked on its
own; these tests pin the composition invariants — stage monotonicity,
dedup completeness of the OUTPUT, decontamination, determinism."""

from pyspark.sql import functions as F

from southpaw_spark.pipelines import build_corpus


def test_build_corpus_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # benchmark containing one real corpus document => it must be dropped
    leaked = docs.orderBy("doc_id").limit(1)
    leaked_id = leaked.collect()[0]["doc_id"]
    benchmark = leaked.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )

    kept, report = build_corpus(
        docs,
        min_tokens=3,
        benchmark=benchmark,
        max_contamination_rate=0.5,
        exact_dedup=True,
        fuzzy_threshold=0.8,
        pack_token_budget=512,
    )
    kept = kept.cache()
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

    # stage counts shrink monotonically in pipeline order
    order = [
        "input", "min_tokens", "decontaminated", "exact_dedup",
        "fuzzy_dedup", "packed",
    ]
    assert list(report) == order
    counts = [report[s] for s in order]
    assert all(a >= b for a, b in zip(counts, counts[1:])), report
    assert report["packed"] == len(ids) > 0

    # the leaked benchmark doc is gone
    assert leaked_id not in ids

    # no two kept docs share content (exact-dedup completeness)
    n_hash = (
        kept.select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
        .count()
    )
    assert n_hash == len(ids)

    # no kept pair is still a near-dup at the fuzzy threshold: CC keeps
    # one doc per cluster, and cross-cluster pairs cannot exist
    from southpaw_spark.operators.dedup import ngram_jaccard_pairs

    assert (
        ngram_jaccard_pairs(kept, "text", "doc_id", n=3, threshold=0.8).count()
        == 0
    )

    # every kept row carries annotations + a pack assignment
    assert {"n_tokens", "quality_score", "lang_guess", "pack_id"} <= set(
        kept.columns
    )

    # determinism: an identical second run keeps the identical set
    kept2, _ = build_corpus(
        docs,
        min_tokens=3,
        benchmark=benchmark,
        max_contamination_rate=0.5,
        exact_dedup=True,
        fuzzy_threshold=0.8,
        pack_token_budget=512,
        collect_report=False,
    )
    assert {r["doc_id"] for r in kept2.select("doc_id").collect()} == ids
    kept.unpersist()


def test_build_corpus_sampling_and_lang_filter(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    kept, report = build_corpus(
        docs,
        langs=["en", "other"],
        sample_rates={"en": 0.5, "other": 0.1},
    )
    langs = {r["lang_guess"] for r in kept.select("lang_guess").collect()}
    assert langs <= {"en", "other"}
    assert 0 < report["sampled"] < report["langs"]
    # hash-threshold sampling: a different salt draws a different sample
    kept_b, _ = build_corpus(
        docs,
        langs=["en", "other"],
        sample_rates={"en": 0.5, "other": 0.1},
        sample_salt="B",
        collect_report=False,
    )
    a = {r["doc_id"] for r in kept.select("doc_id").collect()}
    b = {r["doc_id"] for r in kept_b.select("doc_id").collect()}
    assert a != b


def test_build_corpus_stage_composition_fuzz(spark):
    """Property fuzz over randomized stage combinations at sf0.01: for
    any enabled-stage subset, (1) the report walks a subsequence of the
    canonical stage order with monotonically nonincreasing counts
    ending at the kept count, (2) kept ids ⊆ input ids, and (3) the
    report machinery itself is inert — collect_report=False yields the
    identical kept set (persist/count bookkeeping must never change
    results)."""
    import random

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "text")
    input_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    canonical = [
        "input", "min_tokens", "min_quality", "langs", "decontaminated",
        "exact_dedup", "fuzzy_dedup", "sampled", "packed",
    ]
    rng = random.Random(20260814)
    for trial in range(4):
        kw = dict(
            min_tokens=rng.choice([None, 3, 10]),
            min_quality=rng.choice([None, 0.1]),
            langs=rng.choice([None, ["en"], ["en", "de"]]),
            exact_dedup=rng.choice([True, False]),
            fuzzy_threshold=rng.choice([None, 0.8]),
            sample_rates=rng.choice([None, {"en": 0.5}]),
            sample_default_rate=1.0,
            pack_token_budget=rng.choice([None, 512]),
        )
        kept, report = build_corpus(docs, **kw, collect_report=True)
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        kept.unpersist()
        assert ids <= input_ids
        stages = list(report)
        assert stages == [s for s in canonical if s in report], (kw, stages)
        counts = [report[s] for s in stages]
        assert all(a >= b for a, b in zip(counts, counts[1:])), (kw, report)
        assert counts[-1] == len(ids), (kw, report)
        kept2, report2 = build_corpus(docs, **kw, collect_report=False)
        assert report2 == {}
        ids2 = {r["doc_id"] for r in kept2.select("doc_id").collect()}
        assert ids2 == ids, f"report bookkeeping changed results: {kw}"


def test_build_corpus_fuzzy_keep_best_quality(spark):
    """fuzzy_keep='best_quality' must keep each near-dup family's
    highest-quality member while min_id keeps the smallest id — same
    survivor COUNT, different (and better) survivors."""
    import pytest

    # two near-dup families with deliberately asymmetric quality: the
    # higher doc_id carries the longer (higher-quality) text
    fam = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, fam),
        (2, fam + " with extra descriptive context making this copy longer and richer"),
        (10, "completely different content about spark shuffles and partitions here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept_min, _ = build_corpus(
        docs, fuzzy_threshold=0.5, collect_report=False
    )
    kept_best, _ = build_corpus(
        docs, fuzzy_threshold=0.5, fuzzy_keep="best_quality",
        collect_report=False,
    )
    ids_min = {r["doc_id"] for r in kept_min.select("doc_id").collect()}
    ids_best = {r["doc_id"] for r in kept_best.select("doc_id").collect()}
    assert ids_min == {1, 10}
    assert 10 in ids_best and len(ids_best) == 2
    assert ids_best != ids_min  # the quality keeper differs from min-id

    with pytest.raises(ValueError, match="fuzzy_keep"):
        build_corpus(docs, fuzzy_threshold=0.5, fuzzy_keep="bestest")


def test_write_corpus_partitioned_and_shard_bounded(spark, tmp_path):
    """The shipped dataset round-trips exactly, lands in hive partition
    dirs, and no shard exceeds maxRecordsPerFile."""
    import glob

    import pyarrow.parquet as pq

    from southpaw_spark.pipelines import write_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept, _ = build_corpus(docs, collect_report=False)
    out = str(tmp_path / "corpus")
    write_corpus(
        kept, out, partition_by=["lang_guess"], max_records_per_file=100
    )
    back = spark.read.parquet(out)
    assert back.count() == kept.count()
    a = {r["doc_id"] for r in kept.select("doc_id").collect()}
    b = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert a == b
    part_dirs = glob.glob(f"{out}/lang_guess=*")
    assert len(part_dirs) >= 2, part_dirs
    for f in glob.glob(f"{out}/lang_guess=*/*.parquet"):
        assert pq.ParquetFile(f).metadata.num_rows <= 100, f


def test_build_corpus_span_dedup_and_token_budget_stages(spark):
    """The span_dedup stage rewrites text with duplicated spans cut
    (matching remove_duplicate_spans run standalone at the same point),
    drops docs left empty, and keeps n_tokens consistent; the
    token_budgets stage then bounds each lang's token total."""
    from pyspark.sql import functions as F

    from southpaw_spark.operators.dedup import remove_duplicate_spans

    boiler = " ".join(f"b{i}" for i in range(8))
    rows = []
    for i in range(30):
        body = " ".join(f"w{i}_{j}" for j in range(12))
        rows.append((i, f"{boiler} {body}"))        # shared 8-gram prefix
    rows.append((100, boiler))                       # becomes empty
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    kept, report = build_corpus(
        docs, exact_dedup=False, span_dedup_k=8, collect_report=True,
    )
    got = {r["doc_id"]: r for r in kept.collect()}
    kept.unpersist()
    assert 100 not in got  # all-boilerplate doc dropped
    # every surviving doc lost exactly the 8-token boilerplate prefix
    for i in range(30):
        assert not got[i]["text"].startswith("b0 "), got[i]["text"]
        assert got[i]["n_tokens"] == 12
        assert got[i]["n_tokens"] == len(got[i]["text"].split())
    assert report["span_dedup"] == 30
    # parity with the standalone operator applied to the same input
    standalone = {
        r["doc_id"]: r["text_clean"]
        for r in remove_duplicate_spans(
            docs, "text", "doc_id", k=8
        ).collect()
    }
    for i in range(30):
        assert got[i]["text"] == standalone[i]

    # token_budgets stage on top: lang_guess is derived, so budget the
    # observed stratum and check the greedy bound
    stratum = kept.groupBy("lang_guess").count().collect()[0]["lang_guess"]
    kept2, report2 = build_corpus(
        docs, exact_dedup=False, span_dedup_k=8,
        token_budgets={stratum: 50}, collect_report=True,
    )
    toks = [
        r["n_tokens"] for r in kept2.where(
            F.col("lang_guess") == stratum
        ).collect()
    ]
    kept2.unpersist()
    assert sum(toks) >= 50 and sum(toks) - max(toks) < 50
    assert report2["token_budgeted"] <= report2["span_dedup"]


def test_shuffled_shards_and_writer_parity(spark, tmp_path):
    """t16: shard sizes are hash-balanced, positions dense, the
    permutation is salt-redrawable; write_shuffled_corpus lands
    n_shards files whose concatenated row order equals the
    shuffled_shards (shard, pos) order exactly (re-write with the same
    salt is byte-order-identical)."""
    import glob

    import pyarrow.parquet as pq

    from southpaw_spark.operators.text import shuffled_shards
    from southpaw_spark.pipelines import write_shuffled_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ranks = shuffled_shards(docs, "doc_id", 4)
    rows = ranks.select("doc_id", "shard", "pos").collect()
    order = {
        r["doc_id"]: (r["shard"], r["pos"]) for r in rows
    }
    assert len(order) == docs.count()
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in per_shard.items():
        assert sorted(ps) == list(range(len(ps)))  # dense
    sizes = [len(v) for v in per_shard.values()]
    assert len(sizes) == 4 and max(sizes) - min(sizes) < docs.count()
    redrawn = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffled_shards(docs, "doc_id", 4, salt="e2")
        .select("doc_id", "shard", "pos").collect()
    }
    assert redrawn != order  # new epoch, new permutation

    out = str(tmp_path / "shuf")
    write_shuffled_corpus(docs, out, "doc_id", n_shards=4)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert 1 < len(files) <= 4
    # concatenating files in part order reproduces the exact global
    # epoch permutation: (shard asc, pos asc)
    concat = []
    for f in files:
        concat += pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
    want = [
        d for d, _ in sorted(order.items(), key=lambda kv: kv[1])
    ]
    assert concat == want
    # idempotent re-write: identical order
    write_shuffled_corpus(docs, out, "doc_id", n_shards=4)
    again = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        again += pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
    assert again == concat


def test_build_corpus_decontaminate_cut_mode(spark):
    """decontaminate_mode='cut' (round-9): the leaked passage is
    surgically removed (d17 span_contamination + cut_spans) instead of
    dropping the doc; docs scrubbed to nothing are dropped; n_tokens is
    refreshed so later stages see post-cut lengths; the report carries
    tokens-cut / docs-emptied counts; and the benchmark gram set stays
    a broadcast in the plan."""
    leak = " ".join(f"L{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, "a0 a1 a2 a3 " + leak + " z0 z1 z2 z3"),
            (2, leak),  # fully leaked -> scrubbed empty -> dropped
            (3, "c0 c1 c2 c3 c4 c5 c6 c7"),  # clean
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "pre " + leak + " post")], "doc_id long, text string"
    )

    kept, report = build_corpus(
        docs,
        benchmark=benchmark,
        contamination_n=8,
        decontaminate_mode="cut",
        exact_dedup=True,
        pack_token_budget=64,
    )
    rows = {r["doc_id"]: r for r in kept.collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["text"] == "a0 a1 a2 a3 z0 z1 z2 z3"
    assert rows[1]["n_tokens"] == 8  # refreshed post-cut
    assert rows[3]["text"] == "c0 c1 c2 c3 c4 c5 c6 c7"
    assert report["decontaminated"] == 2
    assert report["decontaminated_tokens_cut"] == 16  # 8 from each of 1,2
    assert report["decontaminated_docs_emptied"] == 1
    assert report["packed"] == 2
    kept.unpersist()

    # same corpus under 'drop': the partially-leaked doc dies whole
    kept_drop, _ = build_corpus(
        docs,
        benchmark=benchmark,
        contamination_n=8,
        max_contamination_rate=0.0,
        decontaminate_mode="drop",
        exact_dedup=True,
    )
    assert {r["doc_id"] for r in kept_drop.collect()} == {3}
    kept_drop.unpersist()

    # plan shape: the benchmark gram probe is a broadcast, no cartesian
    cut_only, _ = build_corpus(
        docs,
        benchmark=benchmark,
        contamination_n=8,
        decontaminate_mode="cut",
        exact_dedup=False,
        collect_report=False,
    )
    plan = cut_only._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="decontaminate_mode"):
        build_corpus(docs, benchmark=benchmark, decontaminate_mode="bogus")


def test_write_corpus_order_by_global_file_order(spark, tmp_path):
    """write_corpus(order_by=...): part files concatenated in filename
    order ARE the global ORDER BY — the sort-free export path
    (repartitionByRange + sortWithinPartitions, the a09/t15 skeleton).
    Also: order_by + partition_by refuses loudly."""
    import glob

    import pyarrow.parquet as pq

    from southpaw_spark.pipelines import write_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ordered")
    write_corpus(
        docs, out, order_by=["lang", "doc_id"], n_output_partitions=4,
        max_records_per_file=200,
    )
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 1
    concat = []
    for f in files:
        t = pq.read_table(f, columns=["lang", "doc_id"])
        concat += list(zip(t["lang"].to_pylist(), t["doc_id"].to_pylist()))
    assert concat == sorted(concat)
    assert len(concat) == docs.count()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        write_corpus(
            docs, str(tmp_path / "x"),
            order_by=["doc_id"], partition_by=["lang"],
        )


def test_build_corpus_url_dedup_and_temperature_mix_stages(spark, sf_dir):
    from southpaw_spark.operators.text import temperature_budgets, tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    # two surface URLs per logical page (block of 2 doc_ids): the
    # url_dedup stage must halve the corpus before any content stage
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP://WWW.ex.com:80/p/"))
        .otherwise(F.lit("http://ex.com/p/")),
        F.floor(F.col("doc_id") / 2).cast("long").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/?utm_source=a")).otherwise(
            F.lit("")
        ),
    )
    wurl = docs.withColumn("url", url)

    kept, report = build_corpus(
        wurl, url_col="url", exact_dedup=False, mix_total_tokens=4000
    )
    assert report["url_dedup"] == n_docs // 2 + n_docs % 2
    # keeper is the min id of each pair => all even doc_ids
    assert kept.where(F.col("doc_id") % 2 == 1).count() == 0

    # NULL urls carry no URL identity: every null-url doc must survive
    # url_dedup (a plain groupBy would collapse them into one keeper)
    # and url_duplicates must never report a NULL-canonical group
    from southpaw_spark.operators.text import url_duplicates

    nurl = docs.withColumn(
        "url",
        F.when(F.col("doc_id") % 3 == 0, url).otherwise(
            F.lit(None).cast("string")
        ),
    )
    n_null = nurl.where(F.col("url").isNull()).count()
    kept_n, report_n = build_corpus(nurl, url_col="url", exact_dedup=False)
    assert kept_n.where(F.col("url").isNull()).count() == n_null
    assert (
        url_duplicates(nurl, "url", "doc_id")
        .where(F.col("canonical_url").isNull()).count() == 0
    )
    kept_n.unpersist()

    # the mixed sample hits the budgets temperature_budgets derives
    # from the POST-url-dedup corpus
    survivors = wurl.where(F.col("doc_id") % 2 == 0)
    counts = {
        r["lang_guess"]: r["nt"]
        for r in __import__(
            "southpaw_spark.operators.text", fromlist=["text"]
        ).with_lang_guess(survivors, "text")
        .groupBy("lang_guess")
        .agg(F.sum(F.size(tokens(F.col("text")))).alias("nt"))
        .collect()
    }
    budgets = temperature_budgets(counts, 4000)
    got = {
        r["lang_guess"]: (r["nt"], r["mx"])
        for r in kept.groupBy("lang_guess")
        .agg(F.sum("n_tokens").alias("nt"), F.max("n_tokens").alias("mx"))
        .collect()
    }
    assert set(got) == set(budgets)
    for dom, (nt, mx) in got.items():
        # greedy reaches the budget (or exhausts the domain) and
        # overshoots by at most the crossing doc
        lo = min(budgets[dom], counts[dom])
        assert lo <= nt <= min(budgets[dom] + mx, counts[dom]), (
            dom, nt, budgets[dom],
        )
    assert report["temperature_mixed"] == kept.count()
    kept.unpersist()

    # token_budgets and mix_total_tokens are mutually exclusive
    import pytest as _pytest

    with _pytest.raises(ValueError, match="one, not both"):
        build_corpus(
            wurl, token_budgets={"en": 10}, mix_total_tokens=100,
            collect_report=False,
        )


def test_build_corpus_line_clean_stage(spark):
    docs = spark.createDataFrame(
        [
            (1, "Real prose line number one.\nEnable javascript now.\n"
                "Another good prose line survives here today!"),
            (2, "no punct boilerplate only"),
        ],
        "doc_id long, text string",
    )
    kept, report = build_corpus(docs, line_clean=True, exact_dedup=False)
    rows = kept.collect()
    kept.unpersist()
    # doc 2 has zero surviving lines => dropped before signals;
    # doc 1 keeps only the two prose lines
    assert report["input"] == 1
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["text"].count("\n") == 1
    assert "javascript" not in rows[0]["text"]


def test_build_corpus_split_fractions_stage(spark):
    docs = spark.createDataFrame(
        [(i, f"some real text number {i} here.") for i in range(200)],
        "doc_id long, text string",
    )
    kept, _ = build_corpus(
        docs, exact_dedup=False,
        split_fractions={"train": 0.8, "val": 0.2},
        sample_salt="z",
    )
    rows = {r["doc_id"]: r["split"] for r in kept.collect()}
    kept.unpersist()
    assert set(rows.values()) <= {"train", "val"}
    assert len(rows) == 200
    # stable: a rebuilt corpus assigns identically
    kept2, _ = build_corpus(
        docs, exact_dedup=False,
        split_fractions={"train": 0.8, "val": 0.2},
        sample_salt="z", collect_report=False,
    )
    assert {r["doc_id"]: r["split"] for r in kept2.collect()} == rows


def test_build_corpus_validates_before_any_job(spark):
    """Invalid configurations must fail at call time, BEFORE any stage
    triggers a Spark job (round-10 ADVICE fix): the poison frame raises
    on any execution, so reaching the assert proves no job ran."""
    import pytest as _pytest

    from southpaw_spark.pipelines import build_corpus

    poison = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.assert_true(F.lit(False)).isNull(), F.lit("t")
        ).alias("text"),
    )
    with _pytest.raises(ValueError, match="one, not both"):
        build_corpus(
            poison, token_budgets={"en": 10}, mix_total_tokens=100,
        )
    # mode/keeper strings are validated even when their stage is not
    # enabled this run (benchmark=None / fuzzy_threshold=None) — a typo
    # must not ride along silently
    with _pytest.raises(ValueError, match="decontaminate_mode"):
        build_corpus(poison, decontaminate_mode="scrub")
    with _pytest.raises(ValueError, match="fuzzy_keep"):
        build_corpus(poison, fuzzy_keep="best")


def test_build_corpus_model_quality_gate(spark, sf_dir):
    """model_weights annotates every surviving doc with model_score and
    min_model_score gates on the margin; the threshold without weights
    fails fast, before any stage runs."""
    import pytest as _pytest

    from southpaw_spark.operators.text import score_with_linear_model
    from southpaw_spark.pipelines import build_corpus

    W = [((i * 37) % 201 - 100) / 100.0 for i in range(64)]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = score_with_linear_model(docs, "text", "doc_id", W, 0.05)
    med = sorted(
        r["model_score"] for r in scored.select("model_score").collect()
    )
    thresh = med[len(med) // 2]
    kept, report = build_corpus(
        docs,
        model_weights=W,
        model_bias=0.05,
        min_model_score=thresh,
        exact_dedup=False,
    )
    assert "model_quality" in report
    assert 0 < report["model_quality"] < report["input"]
    assert all(
        r["model_score"] >= thresh
        for r in kept.select("model_score").collect()
    )
    kept.unpersist()
    with _pytest.raises(ValueError, match="min_model_score"):
        build_corpus(docs, min_model_score=0.5)


def test_corpus_stream_converges_to_batch_build(spark, tmp_path):
    """corpus_stream ≡ build_corpus on the shared stage subset: a
    two-file document stream (ids ascending) through annotate + gates
    (min_tokens, trained-model threshold) + split labeling + exact
    dedup against persistent state keeps EXACTLY the batch pipeline's
    rows — including a cross-batch exact duplicate whose keeper lives
    in batch 1 — with identical annotation and split columns."""
    import json as _json

    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    W = [((i * 37) % 201 - 100) / 100.0 for i in range(64)]
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "eta theta iota kappa lamda mu"),
        (3, "tiny"),                                   # min_tokens gate
        (4, "nu xi omicron pi rho sigma tau"),
        (5, "alpha beta gamma delta epsilon zeta"),    # exact dup of 1
        (6, "upsilon phi chi psi omega aleph bet"),
    ]
    a, b = docs[:3], docs[3:]
    src = tmp_path / "in"
    src.mkdir()
    for name, chunk in (("a.json", a), ("b.json", b)):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t}) for i, t in chunk
            )
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduper = IncrementalDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4),
        sim_threshold=1.01,  # exact-only: no agreement can reach it
    )
    got: dict = {}

    def sink(kept, _bid):
        for r in kept.collect():
            got[r["doc_id"]] = (
                r["text"], r["n_tokens"], r["quality_score"],
                r["model_score"], r["split"],
            )

    q = corpus_stream(
        deduper, stream, str(tmp_path / "ckpt"),
        min_tokens=5, model_weights=W, model_bias=0.05,
        min_model_score=-1.0,
        split_fractions={"train": 0.8, "test": 0.2}, sample_salt="cs",
        sink=sink,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    deduper.close()

    batch = spark.createDataFrame(docs, "doc_id long, text string")
    kept, _ = build_corpus(
        batch,
        min_tokens=5, model_weights=W, model_bias=0.05,
        min_model_score=-1.0, exact_dedup=True,
        split_fractions={"train": 0.8, "test": 0.2}, sample_salt="cs",
    )
    want = {
        r["doc_id"]: (
            r["text"], r["n_tokens"], r["quality_score"],
            r["model_score"], r["split"],
        )
        for r in kept.collect()
    }
    kept.unpersist()
    assert got == want
    assert 5 not in got and 3 not in got  # dup + short doc dropped
    assert 1 in got                       # the cross-batch keeper


def test_build_corpus_fuzzy_decontamination(spark):
    """decontaminate_mode='fuzzy' drops EDITED benchmark copies (high
    shingle Jaccard, zero exact containment requirement) and keeps
    clean docs; the n-gram 'drop' mode on the same corpus misses the
    edited copy — the reason the fuzzy mode exists."""
    from southpaw_spark.pipelines import build_corpus

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, "totally different content with many other words here now"),
        ],
        "doc_id long, text string",
    )
    # benchmark = doc 1 with two words dropped AND one replaced: no
    # 5-gram of the benchmark appears verbatim near the edit points,
    # but the shingle sets overlap heavily
    words = base.split()
    edited = " ".join(words[2:10] + ["CHANGED"] + words[11:])
    bench = spark.createDataFrame(
        [(100, edited)], "doc_id long, text string"
    )
    kept_fuzzy, rep = build_corpus(
        docs, benchmark=bench, decontaminate_mode="fuzzy",
        max_contamination_rate=0.5, contamination_n=3,
        exact_dedup=False,
    )
    ids = {r["doc_id"] for r in kept_fuzzy.select("doc_id").collect()}
    kept_fuzzy.unpersist()
    assert ids == {2}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="decontaminate_mode"):
        build_corpus(docs, decontaminate_mode="nope")


def test_build_corpus_line_dedup_stage(spark):
    """The line_dedup stage (d22, RefinedWeb repeated-line removal)
    cuts every corpus-duplicated line, matches the standalone operator
    applied at the same point, drops docs emptied, and refreshes
    n_tokens to the post-cut count."""
    from southpaw_spark.operators.dedup import remove_duplicate_lines

    rows = []
    for i in range(20):
        rows.append(
            (i, f"unique opener {i} words\ncookie banner line\n"
                f"body text number {i}")
        )
    rows.append((100, "cookie banner line"))  # becomes empty -> dropped
    rows.append((200, "totally unique document"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    kept, report = build_corpus(
        docs, exact_dedup=False, line_dedup_min_count=2,
        collect_report=True,
    )
    got = {r["doc_id"]: r for r in kept.collect()}
    kept.unpersist()
    assert 100 not in got                       # emptied doc dropped
    assert got[200]["text"] == "totally unique document"
    for i in range(20):
        assert "cookie banner line" not in got[i]["text"]
        assert got[i]["text"] == (
            f"unique opener {i} words\nbody text number {i}"
        )
        # n_tokens refreshed = split-on-space count of the clean text
        assert got[i]["n_tokens"] == len(got[i]["text"].split(" "))
    assert report["line_dedup"] == 21
    # parity with the standalone operator applied to the same input
    standalone = {
        r["doc_id"]: r["text_clean"]
        for r in remove_duplicate_lines(docs, "text", "doc_id").collect()
    }
    for i in range(20):
        assert got[i]["text"] == standalone[i]


def test_build_corpus_blocklist_stage(spark):
    """The blocklist stage (t24) drops docs on or under blocked
    domains before URL dedup, with identical results for the list
    (codegen) and DataFrame (broadcast anti-join) blocklist forms;
    blocklist without url_col fails up front."""
    import pytest

    rows = [
        (1, "w1 " * 5, "https://good.example.com/a"),
        (2, "w2 " * 5, "https://spam.bad.net/b"),
        (3, "w3 " * 5, "http://sub.spam.bad.net:8080/c"),
        (4, "w4 " * 5, "https://fine.org/d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    kept, report = build_corpus(
        docs, url_col="url", blocklist=["spam.bad.net"],
        exact_dedup=False, collect_report=True,
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    kept.unpersist()
    assert ids == [1, 4]
    assert report["blocklist"] == 2

    bdf = spark.createDataFrame([("spam.bad.net",)], "host string")
    kept2, _ = build_corpus(
        docs, url_col="url", blocklist=bdf,
        exact_dedup=False, collect_report=True,
    )
    ids2 = sorted(r["doc_id"] for r in kept2.collect())
    kept2.unpersist()
    assert ids2 == ids

    with pytest.raises(ValueError, match="url_col"):
        build_corpus(docs, blocklist=["spam.bad.net"])


def test_corpus_stream_decontaminate_and_blocklist_converge(spark, tmp_path):
    """Round-11 extension of the stream ≡ batch contract: the
    decontamination stage (both stateless modes — n-gram 'drop' and
    shingle-Jaccard 'fuzzy') and the URL blocklist gate now run in
    corpus_stream, and the kept set matches build_corpus row-for-row
    with the same benchmark/blocklist — including a contaminated doc
    arriving in the SECOND batch (batching independence)."""
    import json as _json

    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    bench_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    )
    w = bench_text.split()
    edited = " ".join(w[:4] + ["CHANGED"] + w[5:])  # fuzzy-only leak
    docs = [
        (1, bench_text + " trailing words here",
         "https://ok.example.com/a"),                  # verbatim leak
        (2, "clean document with its own words one two three",
         "https://ok.example.com/b"),
        (3, "another clean page of fresh prose four five six",
         "https://spam.bad.net/x"),                    # blocked domain
        (4, edited, "https://ok.example.com/c"),       # edited leak (b2)
        (5, "final clean text seven eight nine ten eleven twelve",
         "https://ok.example.com/d"),
    ]
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )

    for mode in ("drop", "fuzzy"):
        src = tmp_path / f"in_{mode}"
        src.mkdir()
        for name, chunk in (("a.json", docs[:3]), ("b.json", docs[3:])):
            (src / name).write_text(
                "\n".join(
                    _json.dumps({"doc_id": i, "text": t, "url": u})
                    for i, t, u in chunk
                )
            )
        stream = (
            spark.readStream.schema("doc_id long, text string, url string")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        deduper = IncrementalDeduper(
            spark,
            ParquetStateStore(
                spark, str(tmp_path / f"state_{mode}"), n_buckets=4
            ),
            sim_threshold=1.01,
        )
        got: dict = {}

        def sink(kept, _bid):
            for r in kept.collect():
                got[r["doc_id"]] = (r["text"], r["n_tokens"])

        q = corpus_stream(
            deduper, stream, str(tmp_path / f"ckpt_{mode}"),
            url_col="url", blocklist=["spam.bad.net"],
            benchmark=bench, decontaminate_mode=mode,
            max_contamination_rate=0.3, contamination_n=3,
            sink=sink,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        deduper.close()

        batch = spark.createDataFrame(
            docs, "doc_id long, text string, url string"
        )
        kept, _ = build_corpus(
            batch, url_col="url", blocklist=["spam.bad.net"],
            benchmark=bench, decontaminate_mode=mode,
            max_contamination_rate=0.3, contamination_n=3,
            exact_dedup=True,
        )
        want = {
            r["doc_id"]: (r["text"], r["n_tokens"])
            for r in kept.collect()
        }
        kept.unpersist()
        assert got == want, (mode, sorted(got), sorted(want))
        # invariants in BOTH modes: verbatim leak (1) and blocked
        # domain (3) gone, clean docs (2, 5) kept; the edited copy (4)
        # must be caught by fuzzy (its raison d'etre)
        assert {2, 5} <= set(got) and not {1, 3} & set(got), mode
        if mode == "fuzzy":
            assert 4 not in got


def test_corpus_stream_perplexity_gate_converges(spark, tmp_path):
    """Round-12: the absolute fluency gate (min_logprob against a
    reference-trained bigram LM) runs in corpus_stream — the model is
    trained ONCE at wiring time, so the per-batch decision is
    batching-independent. A garbled doc arriving in the SECOND batch is
    dropped; fluent docs and a no-evidence one-word doc pass; the kept
    set matches build_corpus row-for-row; min_logprob without
    ppl_reference fails up front in both."""
    import json as _json

    import pytest

    from southpaw_spark.operators.text import (
        bigram_reference_model,
        score_with_bigram_reference,
    )
    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    ref = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "the lazy dog sleeps while the quick fox runs"),
            (102, "a quick fox and a lazy dog play in the field"),
        ],
        "doc_id long, text string",
    )
    docs = [
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "a lazy dog sleeps in the field"),
        (3, "zqx wvu ponm lkj hgf dcba trs"),   # garbled (batch 2)
        (4, "hello"),                             # < 2 words: no evidence
    ]
    # pick the threshold BETWEEN the fluent scores and the garbled one
    # from the actual model — robust to smoothing constants
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    model = bigram_reference_model(ref, "text")
    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in score_with_bigram_reference(
            sdf, "text", "doc_id", model
        ).collect()
    }
    assert 4 not in scores  # one word -> no transition evidence
    assert max(scores[3], -1e9) < min(scores[1], scores[2])
    thr = (scores[3] + min(scores[1], scores[2])) / 2

    src = tmp_path / "in"
    src.mkdir()
    for name, chunk in (("a.json", docs[:2]), ("b.json", docs[2:])):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t}) for i, t in chunk
            )
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduper = IncrementalDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4),
        sim_threshold=1.01,
    )
    got: set = set()

    def sink(kept, _bid):
        got.update(r["doc_id"] for r in kept.collect())

    q = corpus_stream(
        deduper, stream, str(tmp_path / "ckpt"),
        ppl_reference=ref, min_logprob=thr, sink=sink,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    deduper.close()

    kept, report = build_corpus(
        spark.createDataFrame(docs, "doc_id long, text string"),
        ppl_reference=ref, min_logprob=thr, exact_dedup=True,
        collect_report=True,
    )
    want = {r["doc_id"] for r in kept.select("doc_id").collect()}
    kept.unpersist()
    assert got == want == {1, 2, 4}  # garbled dropped, no-evidence kept
    assert report["ppl_gate"] == 3

    with pytest.raises(ValueError, match="ppl_reference"):
        build_corpus(sdf, min_logprob=-5.0)
    with pytest.raises(ValueError, match="ppl_reference"):
        corpus_stream(deduper, stream, str(tmp_path / "c2"),
                      min_logprob=-5.0)


def test_build_corpus_perplexity_stratification_stage(spark, sf_dir):
    """t23 composition: the ppl stage annotates every surviving doc
    with its per-domain CCNet bucket (matching the standalone operator
    run at the same pipeline point), ppl_keep gates to the named
    buckets, and bad configs fail before any job."""
    import pytest

    from southpaw_spark.operators.text import perplexity_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept, report = build_corpus(
        docs, min_tokens=2, exact_dedup=True,
        ppl_domain_col="source", collect_report=True,
    )
    got = {
        r["doc_id"]: (r["ppl_bucket"], r["avg_logprob"])
        for r in kept.collect()
    }
    kept.unpersist()
    assert report["ppl_bucketed"] == report["exact_dedup"]
    assert set(b for b, _ in got.values()) == {"head", "middle", "tail"}

    # parity: standalone operator applied to the same survivor set
    kept2, _ = build_corpus(
        docs, min_tokens=2, exact_dedup=True, collect_report=True,
    )
    want = {
        r["doc_id"]: (r["ppl_bucket"], r["avg_logprob"])
        for r in perplexity_buckets(
            kept2, "text", "doc_id", "source"
        ).collect()
    }
    kept2.unpersist()
    assert got == want

    # keep only the best third per domain
    kept3, report3 = build_corpus(
        docs, min_tokens=2, exact_dedup=True,
        ppl_domain_col="source", ppl_keep=["head"], collect_report=True,
    )
    buckets3 = {r["ppl_bucket"] for r in kept3.collect()}
    kept3.unpersist()
    assert buckets3 == {"head"}
    assert report3["ppl_filtered"] == sum(
        1 for b, _ in want.items() if want[b][0] == "head"
    )

    with pytest.raises(ValueError, match="ppl_domain_col"):
        build_corpus(docs, ppl_keep=["head"])
    with pytest.raises(ValueError, match="ppl_labels"):
        build_corpus(
            docs, ppl_domain_col="source", ppl_labels=("a", "b"),
        )
    with pytest.raises(ValueError, match="cuts"):
        perplexity_buckets(
            docs, "text", "doc_id", "source", cuts=(0.5, 0.2),
        )


def test_build_corpus_shared_shingle_inventory(spark, monkeypatch):
    """When fuzzy decontamination AND fuzzy dedup run at the same n,
    build_corpus shingles the corpus ONCE (counted by instrumenting
    shingles(): 2 calls = corpus + benchmark side vs 3 unshared) and
    the kept set is bit-identical to the unshared path (different n
    values, where sharing is illegal)."""
    from southpaw_spark.operators import dedup as dedup_mod
    from southpaw_spark.pipelines import build_corpus

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    w = base.split()
    docs_rows = [
        (1, base),
        (2, " ".join(w[:10] + ["X"] + w[10:])),   # near-dup of 1
        (3, "totally different content with many other words here now"),
        (4, "yet another unrelated page of fresh and clean prose"),
    ]
    bench = spark.createDataFrame(
        [(100, " ".join(w[2:12] + ["CHANGED"] + w[13:]))],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")

    calls = []
    real = dedup_mod.shingles

    def counting(*a, **k):
        calls.append(a[1] if len(a) > 1 else k.get("text_col"))
        return real(*a, **k)

    monkeypatch.setattr(dedup_mod, "shingles", counting)

    kept, _ = build_corpus(
        docs, benchmark=bench, decontaminate_mode="fuzzy",
        max_contamination_rate=0.5, contamination_n=3,
        fuzzy_threshold=0.7, fuzzy_n=3, exact_dedup=False,
    )
    shared_ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    kept.unpersist()
    assert len(calls) == 2, calls  # corpus once + benchmark once

    # control: different n -> no sharing, three shingle builds,
    # and (with n=3 both stages in the control too) identical output
    calls.clear()
    monkeypatch.setattr(dedup_mod, "shingles", real)
    # the unshared ground truth: the same config run stage-by-stage
    # through the standalone operators
    from southpaw_spark.operators.dedup import (
        connected_components,
        jaccard_contamination,
        ngram_jaccard_pairs,
    )

    flagged = jaccard_contamination(
        docs, bench, "text", "doc_id", n=3, threshold=0.5
    ).select("doc_id")
    survivors = docs.join(flagged, "doc_id", "left_anti")
    pairs = ngram_jaccard_pairs(
        survivors, "text", "doc_id", n=3, threshold=0.7
    )
    clusters = connected_components(pairs)
    losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    want_ids = sorted(
        r["doc_id"]
        for r in survivors.join(losers, "doc_id", "left_anti")
        .select("doc_id").collect()
    )
    assert shared_ids == want_ids
    assert 1 not in shared_ids  # decontaminated (edited benchmark copy)


def test_fuzzy_decontaminate_truncates_shared_inventory_lineage(spark):
    """r11-ADVICE regression: with a shared corpus_shingles inventory,
    decontaminate_docs eagerly localCheckpoints its flagged-id set, so
    the survivors' plan no longer references the cached inventory (no
    InMemoryRelation) and stays correct — and cheap — after the caller
    unpersists it. Before the fix, build_corpus(collect_report=False)
    evicted the cache while the anti-join was still lazy and the
    shared-shingle optimization silently degraded to two shinglings."""
    from southpaw_spark.operators.dedup import shingles
    from southpaw_spark.pipelines import build_corpus, decontaminate_docs

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    w = base.split()
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, "totally different content with many other words here"),
            (3, "yet another unrelated page of fresh and clean prose"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(w[2:12] + ["CHANGED"] + w[13:]))],
        "doc_id long, text string",
    )
    inv = shingles(docs, "text", "doc_id", 3).persist()
    cleaned, _ = decontaminate_docs(
        docs, bench, mode="fuzzy", max_contamination_rate=0.5, n=3,
        text_col="text", id_col="doc_id", corpus_shingles=inv,
    )
    plan = cleaned._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan, plan  # lineage truncated
    inv.unpersist()  # cache gone BEFORE the survivors materialize
    assert sorted(
        r["doc_id"] for r in cleaned.select("doc_id").collect()
    ) == [2, 3]

    # end-to-end: the shared path with collect_report=False (zero
    # intermediate materialization inside build_corpus) returns the
    # same survivors as the reporting path
    kw = dict(
        benchmark=bench, decontaminate_mode="fuzzy",
        max_contamination_rate=0.5, contamination_n=3,
        fuzzy_threshold=0.7, fuzzy_n=3, exact_dedup=False,
    )
    lazy, rep = build_corpus(docs, collect_report=False, **kw)
    eager, _ = build_corpus(docs, collect_report=True, **kw)
    assert rep == {}
    assert sorted(r["doc_id"] for r in lazy.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in eager.select("doc_id").collect())
    eager.unpersist()


def test_build_corpus_cmd_round11_keys(spark, tmp_path):
    """The CLI config surface carries the round-11 stages: blocklist,
    line_dedup_min_count, and ppl_domain_col/ppl_keep all reach
    build_corpus from the corpus: block."""
    from southpaw_spark.cli import build_corpus_cmd

    rows = []
    for i in range(12):
        rows.append((
            i,
            f"unique opener {i} has words\ncookie banner line\n"
            f"body text number {i} with several more words",
            f"https://site{i % 3}.example.com/p",
            "srcA" if i % 2 == 0 else "srcB",
        ))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, url string, source string"
    )
    src = tmp_path / "in_parquet"
    docs.write.parquet(str(src))
    out = tmp_path / "out_corpus"
    cfg = {
        "corpus": {
            "input": str(src),
            "output": str(out),
            "url_col": "url",
            "blocklist": ["site2.example.com"],
            "line_dedup_min_count": 2,
            "ppl_domain_col": "source",
            "ppl_keep": ["head", "middle"],
            "exact_dedup": False,
        }
    }
    build_corpus_cmd(spark, cfg)
    got = spark.read.parquet(str(out))
    rows_out = got.collect()
    assert all(r["doc_id"] % 3 != 2 for r in rows_out)      # blocklist
    assert all("cookie banner" not in r["text"] for r in rows_out)
    assert {r["ppl_bucket"] for r in rows_out} <= {"head", "middle"}
    assert len(rows_out) > 0


def test_build_corpus_ppl_reference_arm(spark, sf_dir):
    """ppl_reference trains the bucket LM on a clean reference corpus
    (the full CCNet recipe) — stage output matches the standalone
    operator with the same reference on the same survivor set, and
    differs from the self-trained arm."""
    from southpaw_spark.operators.text import perplexity_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("lang") == "en")
    kept, _ = build_corpus(
        docs, min_tokens=2, exact_dedup=True,
        ppl_domain_col="source", ppl_reference=ref,
        collect_report=True,
    )
    got = {
        r["doc_id"]: (r["ppl_bucket"], r["avg_logprob"])
        for r in kept.collect()
    }
    kept.unpersist()
    kept2, _ = build_corpus(
        docs, min_tokens=2, exact_dedup=True, collect_report=True,
    )
    want = {
        r["doc_id"]: (r["ppl_bucket"], r["avg_logprob"])
        for r in perplexity_buckets(
            kept2, "text", "doc_id", "source", reference=ref
        ).collect()
    }
    self_trained = {
        r["doc_id"]: r["avg_logprob"]
        for r in perplexity_buckets(
            kept2, "text", "doc_id", "source"
        ).collect()
    }
    kept2.unpersist()
    assert got == want
    assert any(
        got[i][1] != self_trained[i] for i in got
    )  # the reference arm is a different model


def test_build_corpus_shared_reference_lm_gate_plus_buckets(spark):
    """min_logprob and ppl_domain_col together train the reference LM
    ONCE (shared BigramReferenceModel) and produce the same survivors +
    buckets as running the stages against the raw reference frame."""
    from southpaw_spark.operators import text as text_mod
    from southpaw_spark.pipelines import build_corpus

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "the lazy dog sleeps while the quick fox runs")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps high", "a"),
         (2, "zqx wvu ponm lkj hgf", "a"),
         (3, "a lazy dog sleeps here", "b")],
        "doc_id long, text string, dom string",
    )
    import unittest.mock as mock

    # threshold strictly between the garbled doc's score and the
    # fluent docs' — derived from the model itself (tiny vocab makes
    # the add-one floor shallow, so no constant is safe)
    model = text_mod.bigram_reference_model(ref, "text")
    s = {
        r["doc_id"]: r["avg_logprob"]
        for r in text_mod.score_with_bigram_reference(
            docs, "text", "doc_id", model
        ).collect()
    }
    thr = (s[2] + min(s[1], s[3])) / 2
    assert s[2] < thr < min(s[1], s[3])

    real = text_mod.bigram_reference_model
    with mock.patch.object(
        text_mod, "bigram_reference_model", side_effect=real
    ) as spy:
        kept, report = build_corpus(
            docs, ppl_reference=ref, min_logprob=thr,
            ppl_domain_col="dom", exact_dedup=False,
            collect_report=True,
        )
        rows = {
            r["doc_id"]: r["ppl_bucket"] for r in kept.collect()
        }
        kept.unpersist()
    assert spy.call_count == 1  # trained once, shared by both stages
    assert 2 not in rows  # garbled doc gated out
    assert set(rows) == {1, 3} and all(v is not None for v in rows.values())
    assert report["ppl_gate"] == 2


def test_corpus_stream_url_dedup_converges(spark, tmp_path):
    """t18 streaming twin (round-12): url_dedup in corpus_stream drops
    later copies of an already-seen canonical URL — INCLUDING a copy
    arriving in a later batch under a different surface form — keeps
    NULL-url docs, and the kept set matches build_corpus(url_col=...)
    row-for-row on the ascending-id feed. url_dedup without url_col
    fails up front."""
    import json as _json

    import pytest

    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    docs = [
        (1, "first page of words one", "https://EX.com:443/p/1?utm_source=x"),
        (2, "second page of words two", "https://ex.com/p/2"),
        (3, "third page of words three", None),          # no URL identity
        # batch 2: doc 4 is doc 1's URL under another surface form
        (4, "fourth page of words four", "https://www.ex.com/p/1/"),
        (5, "fifth page of words five", "https://ex.com/p/5"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    for name, chunk in (("a.json", docs[:3]), ("b.json", docs[3:])):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t, "url": u})
                for i, t, u in chunk
            )
        )
    stream = (
        spark.readStream.schema("doc_id long, text string, url string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduper = IncrementalDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4),
        sim_threshold=1.01,
    )
    got: set = set()

    def sink(kept, _bid):
        got.update(r["doc_id"] for r in kept.collect())

    q = corpus_stream(
        deduper, stream, str(tmp_path / "ckpt"),
        url_col="url", url_dedup=True, sink=sink,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    deduper.close()

    batch = spark.createDataFrame(docs, "doc_id long, text string, url string")
    kept, report = build_corpus(
        batch, url_col="url", exact_dedup=True, collect_report=True,
    )
    want = {r["doc_id"] for r in kept.select("doc_id").collect()}
    kept.unpersist()
    assert got == want == {1, 2, 3, 5}  # 4 is 1's canonical twin; 3 kept
    assert report["url_dedup"] == 4

    with pytest.raises(ValueError, match="url_col"):
        corpus_stream(deduper, stream, str(tmp_path / "c2"), url_dedup=True)


def test_build_corpus_gopher_stage(spark):
    """The Gopher rule gate (t30) drops rule-breaking docs; thresholds
    are validated up front; unknown keys fail before any job."""
    import pytest as _pytest

    from southpaw_spark.pipelines import build_corpus

    good = ("the quick brown fox jumps to the lair of dogs " * 6).strip()
    docs = spark.createDataFrame(
        [(1, good), (2, "too short"), (3, "no stopwords here " * 20)],
        "doc_id long, text string",
    )
    kept, report = build_corpus(docs, gopher=True, exact_dedup=False)
    assert sorted(r.doc_id for r in kept.collect()) == [1]
    assert report["gopher"] == 1
    kept.unpersist()

    kept2, report2 = build_corpus(
        docs,
        gopher=True,
        gopher_thresholds={"min_words": 2, "min_stopword_hits": 0},
        exact_dedup=False,
    )
    assert report2["gopher"] == 3
    kept2.unpersist()

    with _pytest.raises(ValueError, match="requires gopher=True"):
        build_corpus(docs, gopher_thresholds={"min_words": 2})
    with _pytest.raises(ValueError, match="unknown gopher_thresholds"):
        build_corpus(docs, gopher=True, gopher_thresholds={"min_wordz": 2})


def test_corpus_stream_gopher_gate_converges(spark, tmp_path):
    """The t30 Gopher gate runs inside the streaming plan (one codegen
    predicate, stateless) and keeps exactly build_corpus's gopher-kept
    rows across two micro-batches."""
    import json as _json

    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    good = ("the quick brown fox jumps to the lair of dogs " * 6).strip()
    good2 = ("all of the wise owls fly back to that old barn " * 6).strip()
    docs = [
        (1, good),
        (2, "too short"),                      # word-count rule
        (3, "no stopwords lurk here " * 15),   # stopword rule
        (4, good2),
        (5, "# " * 80 + "the end of that"),    # symbol rule
    ]
    a, b = docs[:3], docs[3:]
    src = tmp_path / "in"
    src.mkdir()
    for name, chunk in (("a.json", a), ("b.json", b)):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t}) for i, t in chunk
            )
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduper = IncrementalDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4),
        sim_threshold=1.01,
    )
    got: set = set()

    def sink(kept, _bid):
        got.update(r["doc_id"] for r in kept.collect())

    q = corpus_stream(
        deduper, stream, str(tmp_path / "ckpt"),
        gopher=True, gopher_rep=True,
        gopher_rep_thresholds={
            k: 1.0
            for k in (
                "top_2gram_char_frac", "top_3gram_char_frac",
                "top_4gram_char_frac", "dup_5gram_char_frac",
                "dup_6gram_char_frac", "dup_7gram_char_frac",
                "dup_8gram_char_frac", "dup_9gram_char_frac",
                "dup_10gram_char_frac",
            )
        },
        sink=sink,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    deduper.close()

    batch = spark.createDataFrame(docs, "doc_id long, text string")
    kept, report = build_corpus(
        batch, gopher=True, gopher_rep=True,
        gopher_rep_thresholds={
            k: 1.0
            for k in (
                "top_2gram_char_frac", "top_3gram_char_frac",
                "top_4gram_char_frac", "dup_5gram_char_frac",
                "dup_6gram_char_frac", "dup_7gram_char_frac",
                "dup_8gram_char_frac", "dup_9gram_char_frac",
                "dup_10gram_char_frac",
            )
        },
        exact_dedup=True,
    )
    want = {r["doc_id"] for r in kept.collect()}
    kept.unpersist()
    assert got == want == {1, 4}


def test_build_corpus_gopher_repetition_stage(spark):
    """The t31 repetition gate drops gram/line-repetitive docs; unknown
    threshold keys fail up front."""
    import pytest as _pytest

    from southpaw_spark.pipelines import build_corpus

    # long non-repetitive doc: the Table A2 thresholds presume docs
    # already past the 50-word quality gate (short docs trip the
    # top-n-gram fraction trivially)
    clean = " ".join(f"word{i:03d}" for i in range(60))
    spammy = "buy now " * 30
    docs = spark.createDataFrame(
        [(1, clean), (2, spammy)], "doc_id long, text string"
    )
    kept, report = build_corpus(docs, gopher_rep=True, exact_dedup=False)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert report["gopher_rep"] == 1
    kept.unpersist()
    with _pytest.raises(ValueError, match="requires gopher_rep=True"):
        build_corpus(docs, gopher_rep_thresholds={"dup_line_frac": 1.0})
    with _pytest.raises(ValueError, match="unknown gopher_rep"):
        build_corpus(
            docs, gopher_rep=True, gopher_rep_thresholds={"zzz": 1.0}
        )


def test_parquet_corpus_sink_exactly_once(spark, tmp_path):
    """The streaming corpus writer: batch dirs are hive-readable with a
    batch_id column, a replayed batch overwrites (never appends), a
    checkpoint restart adds only new batches, and compaction folds
    latest-batch-wins into a clean corpus."""
    import json as _json

    from southpaw_spark.pipelines import (
        build_corpus,
        compact_corpus_stream_output,
        corpus_stream,
        parquet_corpus_sink,
    )
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "eta theta iota kappa lamda mu"),
        (3, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (4, "nu xi omicron pi rho sigma tau"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(_json.dumps({"doc_id": i, "text": t}) for i, t in docs[:3])
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduper = IncrementalDeduper(
        spark,
        ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4),
        sim_threshold=1.01,
    )
    out_dir = str(tmp_path / "out")
    sink = parquet_corpus_sink(out_dir)
    q = corpus_stream(deduper, stream, str(tmp_path / "ckpt"), sink=sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out_dir)
    assert "batch_id" in got.columns
    assert sorted(r.doc_id for r in got.collect()) == [1, 2]  # dup 3 dropped

    # idempotent replay: re-running a batch id replaces, never appends
    # (localCheckpoint: a real replay recomputes from the SOURCE, not
    # from the output files this test would otherwise lazily re-read)
    batch0 = got.where("batch_id = 0").drop("batch_id").localCheckpoint()
    sink(batch0, 0)
    sink(batch0, 0)
    again = spark.read.parquet(out_dir)
    assert sorted(r.doc_id for r in again.collect()) == [1, 2]

    # restart from the checkpoint: only the NEW file lands, in new dirs
    (src / "b.json").write_text(_json.dumps({"doc_id": 4, "text": docs[3][1]}))
    q2 = corpus_stream(deduper, stream, str(tmp_path / "ckpt"), sink=sink)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    deduper.close()
    final = spark.read.parquet(out_dir)
    assert sorted(r.doc_id for r in final.collect()) == [1, 2, 4]

    # compaction: latest-batch-wins fold, matches the batch pipeline
    compact_corpus_stream_output(spark, out_dir, str(tmp_path / "compact"))
    compacted = spark.read.parquet(str(tmp_path / "compact"))
    batch = spark.createDataFrame(docs, "doc_id long, text string")
    kept, _ = build_corpus(batch, exact_dedup=True)
    want = sorted(r.doc_id for r in kept.collect())
    kept.unpersist()
    assert sorted(r.doc_id for r in compacted.collect()) == want == [1, 2, 4]
    assert "batch_id" not in compacted.columns


def test_corpus_stream_span_and_line_dedup_converge_at_compaction(
    spark, tmp_path
):
    """Round-14 streaming d15/d22: corpus_stream accumulates span/line
    boilerplate EVIDENCE per batch (retroactive — a passage's second
    copy flags the first doc too), and compact_corpus_stream_output
    applies the cumulative cut: the compacted corpus equals
    build_corpus's span- (resp. line-) rewritten output exactly, even
    when the duplicate pair STRADDLES the batch boundary."""
    import json as _json

    from southpaw_spark.pipelines import (
        build_corpus,
        compact_corpus_stream_output,
        corpus_stream,
        parquet_corpus_sink,
    )
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import (
        IncrementalDeduper,
        IncrementalLineDeduper,
        IncrementalSpanDeduper,
    )

    # the boilerplate passage (8 tokens) appears in docs 1 and 4 —
    # doc 1 lands in batch 1, doc 4 in batch 2 (the retroactive case);
    # doc 2 repeats a LINE that doc 5 (batch 2) also carries
    passage = "one two three four five six seven eight"
    docs = [
        (1, f"alpha beta {passage} gamma delta"),
        (2, "unique opening line\nshared boilerplate line here\nmore"),
        (3, "plain words nine ten eleven twelve thirteen fourteen"),
        (4, f"omega psi {passage} chi phi"),
        (5, "another doc\nshared boilerplate line here\ntail words"),
    ]
    a, b = docs[:3], docs[3:]
    src = tmp_path / "in"
    src.mkdir()
    for name, chunk in (("a.json", a), ("b.json", b)):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t}) for i, t in chunk
            )
        )

    def run_stream(mode):
        work = tmp_path / mode
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        deduper = IncrementalDeduper(
            spark,
            ParquetStateStore(spark, str(work / "state"), n_buckets=4),
            sim_threshold=1.01,
        )
        span = line = None
        if mode == "span":
            span = IncrementalSpanDeduper(
                spark,
                ParquetStateStore(spark, str(work / "span"), n_buckets=4),
                k=8, min_count=2,
            )
        else:
            line = IncrementalLineDeduper(
                spark,
                ParquetStateStore(spark, str(work / "line"), n_buckets=4),
                min_count=2,
            )
        q = corpus_stream(
            deduper, stream, str(work / "ckpt"),
            span_deduper=span, line_deduper=line,
            sink=parquet_corpus_sink(str(work / "out")),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        deduper.close()
        compact_corpus_stream_output(
            spark, str(work / "out"), str(work / "compacted"),
            span_deduper=span, line_deduper=line,
        )
        for d in (span, line):
            if d is not None:
                d.close()
        return {
            r["doc_id"]: (r["text"], r["n_tokens"])
            for r in spark.read.parquet(str(work / "compacted")).collect()
        }

    batch = spark.createDataFrame(docs, "doc_id long, text string")

    # span arm: cumulative cut ≡ build_corpus(span_dedup_k=8)
    got_span = run_stream("span")
    kept, _ = build_corpus(batch, exact_dedup=True, span_dedup_k=8)
    want_span = {
        r["doc_id"]: (r["text"], r["n_tokens"]) for r in kept.collect()
    }
    kept.unpersist()
    assert got_span == want_span
    # the straddling passage really was cut from BOTH docs
    assert passage not in got_span[1][0] and passage not in got_span[4][0]

    # line arm: cumulative cut ≡ build_corpus(line_dedup_min_count=2)
    got_line = run_stream("line")
    kept, _ = build_corpus(batch, exact_dedup=True, line_dedup_min_count=2)
    want_line = {
        r["doc_id"]: (r["text"], r["n_tokens"]) for r in kept.collect()
    }
    kept.unpersist()
    assert got_line == want_line
    assert "shared boilerplate line here" not in got_line[2][0]
    assert "shared boilerplate line here" not in got_line[5][0]
