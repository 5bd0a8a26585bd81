"""Plan-introspection assertions (the performance contract) and the
column-function library."""

from pyspark.sql import functions as F

from southpaw_spark.functions import child_docs, composite_key, key_bytes, record_field
from southpaw_spark.plans import (
    join_strategies,
    num_exchanges,
    pushed_filters,
    scan_columns,
)
from southpaw_spark import suite


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q = orders.where(F.col("o_orderkey") == 7).select("o_orderkey", "o_totalprice")
    pushed = pushed_filters(q)
    assert any("o_orderkey" in p for p in pushed), pushed
    # column pruning: the scan must not read all 6 columns
    schemas = scan_columns(q)
    assert all("o_orderpriority" not in s for s in schemas), schemas


def test_small_dims_broadcast_in_flagship(spark, sf_dir):
    """r15 size-aware join contract (denormalize._hinted): a child
    whose subtree scan estimate × in-memory doc expansion fits the
    broadcast threshold broadcasts (at test scale that is EVERY child);
    one whose estimate crosses it is FORCED to sort-merge — Catalyst's
    post-collect_list estimate would otherwise broadcast a Θ(child)
    nested-doc relation (measured ~15 s driver-side build for lineitem
    at sf0.1, an OOM at scale). The second regime is pinned by shrinking
    the threshold so the same tree flips to sort-merge."""
    docs = suite.q13_denormalized_order(spark, sf_dir)
    strategies = join_strategies(docs)
    # at test scale every join should be broadcast — no sort-merge
    assert strategies.get("BroadcastHashJoin", 0) >= 4, strategies
    assert "SortMergeJoin" not in strategies, strategies

    # fact-sized regime: with a tiny threshold the grouped-children
    # joins must all be sort-merge — no Θ(child) broadcast anywhere
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        docs_big = suite.q13_denormalized_order(spark, sf_dir)
        strat_big = join_strategies(docs_big)
        assert strat_big.get("BroadcastHashJoin", 0) == 0, strat_big
        assert strat_big.get("SortMergeJoin", 0) >= 4, strat_big
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_latest_by_key_single_shuffle(spark, sf_dir):
    from southpaw_spark.operators.cdc import current_state
    from southpaw_spark.suite import _events_changelog

    state = current_state(_events_changelog(spark, sf_dir), ["user_id"])
    # one hash-partition exchange for the window — no more
    assert num_exchanges(state) == 1


def test_key_bytes_int_long_equivalence(spark):
    df = spark.createDataFrame([(1, 1), (255, 255), (256, 256), (0, 0)], "i int, l long")
    out = df.select(
        F.hex(key_bytes(F.col("i"), "int")).alias("hi"),
        F.hex(key_bytes(F.col("l"), "long")).alias("hl"),
    ).collect()
    for r in out:
        # int and long encodings coincide (reference ByteArray semantics)
        assert r["hi"] == r["hl"]
    vals = {r["hi"] for r in out}
    assert vals == {"01", "FF", "0100", "00"}


def test_composite_key_sorted_fields(spark):
    df = spark.createDataFrame([(4235, 7234)], "playlist_id int, user_tag_id int")
    k = df.select(
        F.hex(
            composite_key(df, {"user_tag_id": "int", "playlist_id": "int"})
        ).alias("k")
    ).collect()[0]["k"]
    # fields sorted by name: playlist_id (0x108B, len 2) then user_tag_id
    # (0x1C42, len 2) — each length-prefixed
    assert k == "02108B021C42"


def test_doc_accessors(spark, sf_dir):
    docs = suite.build_order_docs(spark, sf_dir).limit(50)
    out = docs.select(
        record_field(F.col("doc"), "o_orderkey").alias("k"),
        F.size(child_docs(F.col("doc"), "lineitem")).alias("n"),
    )
    rows = out.collect()
    assert all(r["k"] is not None and r["n"] >= 0 for r in rows)


def test_round2_queries_plan_contracts(spark, sf_dir):
    """Scale contracts for the round-2 query families: no nested-loop /
    cartesian joins anywhere, single-shuffle as-of, broadcast probe in
    decontamination."""
    no_nlj = [
        suite.e04_asof_join,
        suite.e05_range_join,
        suite.e08_funnel,
        suite.t10_contamination,
        suite.a01_rollup,
        suite.a03_pivot,
        suite.a05_cohort_retention,
    ]
    for fn in no_nlj:
        df = fn(spark, sf_dir)
        strategies = join_strategies(df)
        assert "BroadcastNestedLoopJoin" not in strategies, fn.__name__
        assert "CartesianProduct" not in strategies, fn.__name__

    # as-of: exactly one exchange feeds the window (plus AQE reads)
    asof = suite.e04_asof_join(spark, sf_dir)
    assert num_exchanges(asof) <= 2, num_exchanges(asof)

    # decontamination: the benchmark set must be the broadcast side
    cont = suite.t10_contamination(spark, sf_dir)
    assert join_strategies(cont).get("BroadcastHashJoin", 0) >= 1


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Co-located bucketed tables join with ZERO exchanges — the
    bucketing answer to fact-fact joins at scale (BASELINE.md)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS t_b_orders")
    spark.sql("DROP TABLE IF EXISTS t_b_lineitem")
    try:
        orders.write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable(
            "t_b_orders"
        )
        li.write.mode("overwrite").bucketBy(4, "l_orderkey").saveAsTable(
            "t_b_lineitem"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("t_b_orders")
            .join(
                spark.table("t_b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .count()
        )
        assert num_exchanges(j) == 0, j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_b_orders")
        spark.sql("DROP TABLE IF EXISTS t_b_lineitem")


def test_events_ts_helper_adapts_to_both_generations(spark, tmp_path):
    """The driver has shipped events.ts both as TIMESTAMP(NANOS)
    (surfaced as bigint via nanosAsLong) and as timestamp[us]; the
    adaptive helper must produce identical epoch-us on both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from southpaw_spark.suite import _events_ts, _events_ts_us

    base_us = 1_700_000_000_000_000
    rows_us = [base_us, base_us + 1_500_000]
    nanos = pa.table(
        {"ts": pa.array([u * 1000 for u in rows_us], pa.timestamp("ns"))}
    )
    micros = pa.table(
        {"ts": pa.array(rows_us, pa.timestamp("us"))}
    )
    pq.write_table(nanos, str(tmp_path / "nanos.parquet"),
                   store_schema=False)
    pq.write_table(micros, str(tmp_path / "micros.parquet"))

    dfn = spark.read.parquet(str(tmp_path / "nanos.parquet"))
    dfm = spark.read.parquet(str(tmp_path / "micros.parquet"))
    assert dict(dfn.dtypes)["ts"] == "bigint"      # nanosAsLong branch
    assert dict(dfm.dtypes)["ts"].startswith("timestamp")

    for df in (dfn, dfm):
        got = [r["us"] for r in
               df.select(_events_ts_us(df).alias("us")).orderBy("us").collect()]
        assert got == rows_us, dict(df.dtypes)
        ts = [r["t"] for r in
              df.select(_events_ts(df).alias("t")).orderBy("t").collect()]
        assert [int(t.timestamp() * 1_000_000) for t in ts] == rows_us


def test_bucketed_flagship_parity_and_fewer_exchanges(spark, sf_dir):
    """build_order_docs_bucketed (opt-in bucketize_states layout) must
    be byte-identical to the plain build AND carry strictly fewer
    exchanges in its physical plan — the measured 8→4 exchange drop
    that makes the sf1 flagship 12× faster once conversion is amortized
    (BASELINE.md §11)."""
    plain = suite.build_order_docs(spark, sf_dir)
    bucketed = suite.build_order_docs_bucketed(spark, sf_dir, n_buckets=4)

    def as_json(docs):
        return docs.select(
            "o_orderkey",
            F.to_json(F.col("doc"), {"ignoreNullFields": "true"}).alias("v"),
        )

    a, b = as_json(plain), as_json(bucketed)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert num_exchanges(b) < num_exchanges(a), (
        f"bucketed {num_exchanges(b)} vs plain {num_exchanges(a)}"
    )


def test_new_round7_ops_plan_shapes(spark, sf_dir):
    """Round-7 operators stay shuffle-native: filtered ANN joins on the
    filter column with the query side broadcast (never a cartesian over
    the corpus); containment and Hamming candidates are equi-joins; no
    per-row Python anywhere."""
    from southpaw_spark.operators.dedup import (
        containment_pairs,
        simhash_near_pairs,
    )
    from southpaw_spark.operators.similarity import cosine_topk_filtered

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        "label",
    )
    filtered = cosine_topk_filtered(
        emb, q, "embedding", "vec_id", k=5, filter_cols=("label",)
    )
    fplan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in fplan
    assert "BroadcastNestedLoopJoin" not in fplan
    assert join_strategies(filtered).get("BroadcastHashJoin", 0) >= 1, fplan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for frame in (
        containment_pairs(docs, "text", "doc_id", threshold=0.8),
        simhash_near_pairs(docs, "text", "doc_id", max_hamming=3),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_redact_pii_categories_and_no_shuffle(spark):
    """t14: each PII category redacts to its typed token, counts are
    non-overlapping (an email's digits never double-count as an id
    number), clean text passes through untouched — and the plan is a
    pure projection: NO exchange at all."""
    from pyspark.sql import functions as F

    from southpaw_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org for details"),
            (2, "server at 192.168.001.5 rebooted"),
            (3, "call +44 20 7946 0958 now"),
            (4, "case 123456789 closed"),
            (5, "nothing sensitive here at all"),
            (6, "two mails a@b.io and c@d.io plus 10.0.0.1"),
        ],
        "id long, text string",
    )
    out = redact_pii(df, "text")
    rows = {r["id"]: r for r in out.collect()}
    assert "<EMAIL>" in rows[1]["text_redacted"] and rows[1]["n_email"] == 1
    assert "@" not in rows[1]["text_redacted"]
    assert rows[2]["text_redacted"] == "server at <IP> rebooted"
    assert rows[3]["text_redacted"] == "call <PHONE> now"
    assert rows[4]["text_redacted"] == "case <IDNUM> closed"
    assert rows[4]["n_idnum"] == 1 and rows[4]["n_phone"] == 0
    assert rows[5]["text_redacted"] == rows[5]["text"]
    assert sum(rows[5][c] for c in ("n_email", "n_ip", "n_phone", "n_idnum")) == 0
    assert rows[6]["n_email"] == 2 and rows[6]["n_ip"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_new_extra_operator_plan_shapes(spark, sf_dir):
    """Round-8 operators: d14's candidate generation must be an
    equi-join (no CartesianProduct / no BroadcastNestedLoopJoin — the
    PassJoin segment join is hash-partitionable); t14 must plan with
    zero exchanges (projection); e10's union of both as-of arms must
    not multiply shuffles (≤ 2: one per union-window arm level)."""
    from southpaw_spark import suite

    d14 = suite.EXTRA_QUERIES["d14_edit_distance_pairs"](spark, sf_dir)
    p = d14._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

    t14 = suite.EXTRA_QUERIES["t14_redact_pii"](spark, sf_dir)
    p2 = t14._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p2

    e10 = suite.EXTRA_QUERIES["e10_asof_auto"](spark, sf_dir)
    p3 = e10._jdf.queryExecution().executedPlan().toString()
    assert p3.count("Exchange hashpartitioning") <= 2


def test_ivf_index_query_is_partition_pruned(spark, tmp_path):
    """Round-14 plan evidence: query_ivf_index's cells/ scan carries a
    PartitionFilters entry on the probed cell ids — query I/O is the
    probed directories, never the corpus (the 100 TB property the
    persistent index exists for). Same check for the LSH index's
    bprefix prune."""
    from southpaw_spark.operators.ann_index import (
        build_ann_index,
        build_ivf_index,
        query_ann_index,
        query_ivf_index,
    )
    from southpaw_spark.plans.introspect import explain_str

    def vec(i, dim=6):
        return [((i * 31 + j * 17) % 97 - 48) / 48.0 for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    ivf = str(tmp_path / "ivf")
    build_ivf_index(corpus, ivf, "embedding", "vec_id", n_cells=6, seed=3)
    plan = explain_str(query_ivf_index(spark, ivf, queries, k=3, n_probe=2))
    import re

    pf = [
        m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "cell" in m and "IN" in m.upper()
    ]
    assert pf, plan[:2000]  # the probed-cells filter reached the scan

    lsh = str(tmp_path / "lsh")
    build_ann_index(corpus, lsh, "embedding", "vec_id", n_planes=5, seed=3)
    plan2 = explain_str(query_ann_index(spark, lsh, queries, k=3))
    pf2 = [
        m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan2)
        if "bprefix" in m
    ]
    assert pf2, plan2[:2000]
