from pyspark.sql import functions as F

from southpaw_spark.operators.dedup import (
    embedding_near_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from southpaw_spark.operators.similarity import cosine_topk, ivf_topk


def test_ivf_multiprobe_recall_floor(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, "embedding", "vec_id", k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, "embedding", "vec_id", k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random embeddings are LSH's worst case; multi-probe must still beat
    # the ~31% random-scan floor
    assert recall >= 0.3, f"recall {recall}"


def test_lsh_candidates_subset_property(spark, sf_dir):
    """Every pair LSH surfaces must share at least one identical band —
    cross-check a sample against recomputed jaccard (sanity, not oracle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = minhash_lsh_candidates(docs, "text", "doc_id").limit(5).collect()
    if not cands:
        return
    jacc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.0
        ).collect()
    }
    for r in cands:
        assert (r["id_a"], r["id_b"]) in jacc


def test_simhash_near_duplicates_close(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy cat today"),
            (3, "completely different words appear in this sentence here"),
        ],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[3])


def test_hamming_near_pairs_max_hamming_zero(spark):
    """r11-ADVICE sibling: hamming_near_pairs at max_hamming=0 puts the
    FULL 64-bit signature in one band — the band value must be the raw
    column, not a (1<<64)-1 mask literal (long overflow). Exact-equal
    signatures pair; 1-bit-distant ones don't."""
    from southpaw_spark.operators.dedup import hamming_near_pairs

    sigs = spark.createDataFrame(
        [(1, -42), (2, -42), (3, -41), (4, 7)],
        "id long, simhash long",
    )
    got = hamming_near_pairs(sigs, "id", max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 0)]


def test_embedding_near_duplicates_finds_planted_pair(spark):
    import random

    random.seed(7)
    base = [random.random() for _ in range(16)]
    near = [x + 0.001 for x in base]
    far = [random.random() * -1 for _ in range(16)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, v array<double>"
    )
    pairs = embedding_near_duplicates(df, "v", "id", threshold=0.99, n_planes=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got


def test_auto_n_planes_scales_with_corpus():
    from southpaw_spark.operators.dedup import auto_n_planes

    # buckets must GROW with the corpus so per-bucket pairing stays bounded
    assert auto_n_planes(500) < auto_n_planes(20_000) < auto_n_planes(2_000_000)
    # expected bucket population ~ target: N / 2^planes <= 2*target
    for n in (1_000, 100_000, 10_000_000):
        planes = auto_n_planes(n, target_bucket=200)
        assert n / (2 ** planes) <= 2 * 200


def test_ivf_recall_survives_corpus_scaled_planes_at_10x(spark, sf_dir):
    """The d05/s02 scale property: a 10x corpus gets more planes
    (auto_n_planes) and recall must hold — a fixed plane count would
    instead go quadratic within buckets."""
    from southpaw_spark.operators.dedup import auto_n_planes

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base_n = emb.count()
    copies = [emb]
    for i in range(1, 10):
        copies.append(
            emb.select(
                (F.col("vec_id") + 100000 * i).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.lit(0.01 * i)
                ).alias("embedding"),
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.cache()
    assert auto_n_planes(big.count()) > auto_n_planes(base_n)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(big, queries, "embedding", "vec_id", k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(big, queries, "embedding", "vec_id", k=5).collect()
    }
    big.unpersist()
    recall = len(exact & approx) / max(1, len(exact))
    assert recall >= 0.3, f"recall {recall}"


def test_near_dup_multi_table_finds_planted_pair_with_auto_planes(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = emb.where(F.col("vec_id") == 1).select(
        F.lit(999999).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(1e-4)).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    pairs = embedding_near_duplicates(
        corpus, "embedding", "vec_id", threshold=0.999, n_tables=2
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 999999) in got


def test_connected_components_chain_and_islands(spark):
    from southpaw_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3: needs >1 propagation round), pair 10-11,
    # and 20-21 ∪ 21-22 as a triangle-ish merge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_stratified_sample_deterministic_and_rate_bounded(spark, sf_dir):
    from southpaw_spark.operators.text import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = stratified_sample(docs, "lang", "doc_id", {"en": 0.5}, 0.1)
    b = stratified_sample(docs, "lang", "doc_id", {"en": 0.5}, 0.1)
    ra = sorted(r["doc_id"] for r in a.collect())
    assert ra == sorted(r["doc_id"] for r in b.collect())  # reproducible
    # a different salt draws a different (but again stable) sample
    c = stratified_sample(docs, "lang", "doc_id", {"en": 0.5}, 0.1, salt="s2")
    assert sorted(r["doc_id"] for r in c.collect()) != ra
    # en keep-rate lands near 0.5 (hash-uniformity, loose bound)
    n_en = docs.where("lang = 'en'").count()
    k_en = a.where("lang = 'en'").count()
    assert 0.3 <= k_en / n_en <= 0.7


def test_sequence_packing_budget_property(spark, sf_dir):
    from southpaw_spark.operators.text import sequence_packing

    packed = sequence_packing(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        "text", "doc_id", "lang", token_budget=512,
    )
    stats = packed.groupBy("lang", "pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx")
    )
    # every pack holds <= budget + one overflowing doc (greedy boundary)
    bad = stats.where(F.col("tot") - F.col("mx") >= 512).count()
    assert bad == 0
    # pack ids are dense from 0 within each shard
    for r in packed.groupBy("lang").agg(
        F.countDistinct("pack_id").alias("n"), F.max("pack_id").alias("mx")
    ).collect():
        assert r["n"] == r["mx"] + 1


def test_skew_bounded_jaccard_is_exact(spark):
    """The default skew-bounded (prefix-filter + rare/hot split) plan
    must emit EXACTLY the single-phase result — including pairs whose
    only shared evidence is hot boilerplate (the rescue path): those
    have true Jaccard ≥ threshold and an exact algorithm must keep
    them. max_doc_freq is a pure performance knob, never a semantic
    filter."""
    boiler = "all rights reserved contact us for more information today"
    rows = [(i, f"unique words number {i} alpha beta {boiler}") for i in range(50)]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog " + boiler),
        (101, "the quick brown fox jumps over the lazy cat " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def rowset(pairs):
        return {
            (r["id_a"], r["id_b"], r["jaccard"]) for r in pairs.collect()
        }

    exact = rowset(
        ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.3,
                            max_doc_freq=None)
    )
    for cap in (10, 128, "auto"):
        got = rowset(
            ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.3,
                                max_doc_freq=cap)
        )
        assert got == exact, f"cap={cap} diverges from single-phase"
    # the corpus exercises both paths: a rare-evidence pair and
    # boilerplate-only pairs (all 50 share 10/13 shingles → J≈0.625)
    assert any(p[:2] == (100, 101) for p in exact)
    assert any(a < 50 and b < 50 for a, b, _ in exact)


def test_ngram_contamination_semantics(spark):
    from southpaw_spark.operators.text import ngram_contamination

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # shares 5-grams with benchmark doc 10
            (2, "z y x w v u t"),     # disjoint: zero hits
            (3, "too short"),         # < 5 words: excluded entirely
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(10, "a b c d e"), (11, "q r s t u")], "doc_id int, text string"
    )
    rows = {
        r.doc_id: (r.n_ngrams, r.n_hits, r.contamination_rate)
        for r in ngram_contamination(
            corpus, bench, "text", "doc_id", n=5
        ).collect()
    }
    # doc 1 has 5-grams {a b c d e, b c d e f}; only the first is in bench
    assert rows[1] == (2, 1, 0.5)
    assert rows[2] == (3, 0, 0.0)
    assert 3 not in rows


def test_repetition_signals_survive_short_docs(spark):
    from southpaw_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a a b")], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in repetition_signals(df, "text", "doc_id").collect()}
    # <2-word docs are excluded, not a crash
    assert set(rows) == {3}
    assert rows[3].top_bigram_frac == 0.5  # "a a" once, "a b" once -> 1/2


def test_connected_components_raises_on_non_convergence(spark):
    from southpaw_spark.operators.dedup import connected_components
    import pytest as _pytest

    # star contraction needs a few rounds even on a 12-vertex chain;
    # max_iter=1 must fail LOUDLY rather than return split components
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1, driver_max_edges=None)
    # and with the default budget the same chain is ONE cluster
    out = connected_components(edges, driver_max_edges=None)
    assert {r.cluster_id for r in out.collect()} == {0}


def test_ngram_jaccard_matches_python_oracle_fuzz(spark):
    """Randomized exactness: the default skew-bounded plan must emit
    exactly the pairs a brute-force pure-Python Jaccard finds — across
    corpora with heavy shared vocabulary (stop-shingle pressure),
    near-dup families, and varied thresholds."""
    import random

    rng = random.Random(60)
    common = [f"w{i}" for i in range(12)]
    rare = [f"r{i}" for i in range(400)]

    def make_doc():
        n_words = rng.randrange(3, 24)
        return " ".join(
            rng.choice(common if rng.random() < 0.55 else rare)
            for _ in range(n_words)
        )

    for trial, threshold in [(0, 0.15), (1, 0.4), (2, 0.8)]:
        docs = []
        for i in range(70):
            if docs and rng.random() < 0.3:
                # near-dup: mutate one word of an earlier doc
                base = docs[rng.randrange(len(docs))][1].split()
                base[rng.randrange(len(base))] = rng.choice(rare)
                docs.append((100 * trial + i, " ".join(base)))
            else:
                docs.append((100 * trial + i, make_doc()))

        def sh_set(text, n=3):
            w = text.split()
            return {
                " ".join(w[i:i + n]) for i in range(len(w) - n + 1)
            } if len(w) >= n else set()

        expected = set()
        sets = {i: sh_set(t) for i, t in docs}
        for a in sets:
            for b in sets:
                if a < b and sets[a] and sets[b]:
                    inter = len(sets[a] & sets[b])
                    union = len(sets[a] | sets[b])
                    jac = inter / union
                    # the operator thresholds on the UNROUNDED score
                    if jac >= threshold:
                        expected.add((a, b, round(jac, 6)))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                df, "text", "doc_id", n=3, threshold=threshold
            ).collect()
        }
        assert got == expected, (trial, threshold)


def test_ngram_jaccard_plan_shape(spark, sf_dir):
    """The skew-bounded Jaccard plan must stay shuffle-native: every
    join an equi-join (candidate generation on the shingle hash,
    verification on ids) — never a cross product — and no per-row
    Python in the plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    # the two verification joins re-attach the corpus-sized shingle-set
    # payload; Catalyst's post-collect_list size estimate would broadcast
    # it (executor OOM at scale) — the shuffle_hash hints must hold
    assert plan.count("ShuffledHashJoin") >= 2


def test_connected_components_matches_union_find_fuzz(spark):
    """Randomized parity vs a driver-side union-find oracle, plus a
    200-vertex chain — the diameter shape the old label-propagation
    design needed 200 rounds for; star contraction stays in its
    default round budget."""
    import random

    from southpaw_spark.operators.dedup import connected_components

    def union_find_labels(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    rng = random.Random(6)
    cases = [
        [(i, i + 1) for i in range(199)],  # long chain
        [(rng.randrange(60), rng.randrange(60)) for _ in range(80)],
        [(rng.randrange(1000), rng.randrange(1000)) for _ in range(300)],
    ]
    for pairs in cases:
        pairs = [(a, b) for a, b in pairs if a != b]
        expected = union_find_labels(pairs)
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(
                spark.createDataFrame(pairs, "id_a long, id_b long")
            ).collect()
        }
        assert got == expected


def test_ivf_kmeans_recall_and_plan(spark, sf_dir):
    """Trained-quantizer IVF: recall above the probe fraction's random
    floor, candidates from an equi-join (never a cross product), and
    cell assignment covering the whole corpus."""
    from southpaw_spark.operators.similarity import ivf_kmeans_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, "embedding", "vec_id", k=5).collect()
    }
    out = ivf_kmeans_topk(
        emb, queries, "embedding", "vec_id", k=5, n_cells=16, n_probe=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only non-equi join allowed is the tiny broadcast centroid
    # ranking (n_cells rows); the corpus-side candidate join must be a
    # hash equi-join on cell, never an unbroadcast cross product
    assert "CartesianProduct" not in plan
    approx = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    recall = len(exact & approx) / len(exact)
    # 4/16 cells probed ⇒ random-scan floor ≈ 25%; the learned cells
    # must do better even on near-random vectors
    assert recall >= 0.3, f"recall {recall}"
    # every query produced k candidates (cells are non-degenerate)
    per_q = {}
    for q, _ in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(v == 5 for v in per_q.values()), per_q


def test_ivf_kmeans_cached_input_matches_uncached(spark, sf_dir):
    """The r16 shared-scan cache inside ivf_kmeans_topk (corpus.cache()
    feeding count, quantizer train and cell assignment) must be
    output-invisible: caching preserves partition count and row order,
    so the k-means|| init sampling — and therefore every centroid,
    cell assignment and emitted neighbor — is identical to the
    uncached plan."""
    from pyspark.sql import DataFrame

    from southpaw_spark.operators.similarity import ivf_kmeans_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cached = sorted(
        map(tuple, ivf_kmeans_topk(
            emb, queries, "embedding", "vec_id", k=5
        ).collect())
    )
    spark.catalog.clearCache()
    orig_cache = DataFrame.cache
    DataFrame.cache = lambda self: self  # the pre-r16 (uncached) plan
    try:
        plain = sorted(
            map(tuple, ivf_kmeans_topk(
                emb, queries, "embedding", "vec_id", k=5
            ).collect())
        )
    finally:
        DataFrame.cache = orig_cache
    assert cached == plain


def test_ann_index_build_query_parity(spark, sf_dir, tmp_path):
    """A persisted index answers identically to the in-memory ivf_topk
    when built with the same planes (same seed/n_planes/dim ⇒ identical
    RNG draw) — the build/query split changes the I/O shape, never the
    result."""
    from southpaw_spark.operators.ann_index import (
        build_ann_index,
        query_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = str(tmp_path / "ann_idx")
    meta = build_ann_index(
        emb, idx, "embedding", "vec_id", n_planes=6, seed=42
    )
    assert meta["n_planes"] == 6 and len(meta["planes"]) == 6
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in query_ann_index(spark, idx, queries, k=5).collect()
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in ivf_topk(
            emb, queries, "embedding", "vec_id", k=5, n_planes=6, seed=42
        ).collect()
    )
    assert got == want and got


def test_ann_index_partition_pruned_read(spark, sf_dir, tmp_path):
    """The query-side scan must carry a partition filter on the bucket
    prefix — query I/O proportional to probed buckets, not the corpus."""
    from southpaw_spark.operators.ann_index import (
        build_ann_index,
        query_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = str(tmp_path / "ann_idx_p")
    build_ann_index(
        emb, idx, "embedding", "vec_id", n_planes=6, prefix_bits=3, seed=7
    )
    out = query_ann_index(spark, idx, queries, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # identify the index scan by its partition column (the tmp path in
    # Location gets truncated by toString, so don't match on it)
    idx_scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "bprefix" in ln
    ]
    assert idx_scans, plan
    assert all(
        "PartitionFilters: []" not in ln and "bprefix" in ln
        for ln in idx_scans
    ), "\n".join(idx_scans)
    assert out.count() > 0


def test_ann_index_incremental_add_parity(spark, sf_dir, tmp_path):
    """build(A) + add(B) answers queries identically to build(A ∪ B):
    pinned planes assign appended vectors to the same buckets a full
    rebuild would."""
    from southpaw_spark.operators.ann_index import (
        add_to_ann_index,
        build_ann_index,
        query_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    part_a = emb.where(F.col("vec_id") % 2 == 0)
    part_b = emb.where(F.col("vec_id") % 2 == 1)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    full = str(tmp_path / "full")
    build_ann_index(emb, full, "embedding", "vec_id", n_planes=6, seed=42)
    inc = str(tmp_path / "inc")
    build_ann_index(part_a, inc, "embedding", "vec_id", n_planes=6, seed=42)
    add_to_ann_index(part_b, inc, "embedding", "vec_id")

    def rows(d):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in query_ann_index(spark, d, queries, k=5).collect()
        )

    assert rows(inc) == rows(full) and rows(full)


def test_ngram_jaccard_rejects_bad_max_doc_freq(spark):
    """A typo'd max_doc_freq must fail eagerly with a clear ValueError,
    not fall through to an opaque Spark analysis error comparing a
    string to the numeric doc-frequency column."""
    import pytest

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    for bad in ("Auto", "none", 1.5):
        with pytest.raises(ValueError, match="max_doc_freq"):
            ngram_jaccard_pairs(
                df, "text", "doc_id", n=3, threshold=0.5, max_doc_freq=bad
            )


def test_ngram_jaccard_release_unpersists(spark):
    """The operator caches one internal frame (per-doc facts); release()
    must unpersist it so repeated calls in one session don't accumulate
    executor storage."""
    from southpaw_spark.operators.dedup import release

    df = spark.createDataFrame(
        [(i, f"w{i} x y z common tail words here") for i in range(20)],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.2)
    out.count()  # materialize → populates the internal cache
    cached = out._southpaw_cached
    assert cached and any(f.storageLevel.useMemory for f in cached)
    release(out)
    assert all(not f.storageLevel.useMemory for f in cached)


def test_connected_components_self_loop_singleton(spark):
    """A vertex whose only edges are self-loops is its own singleton
    cluster — parity with the label-propagation semantics the star
    contraction replaced (it must not silently vanish from the
    output)."""
    from southpaw_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(7, 7), (2, 3)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {7: 7, 2: 2, 3: 2}


def test_simhash_near_pairs_exact_vs_bruteforce(spark, sf_dir):
    """Banded Hamming blocking must be EXACT: identical pair set to a
    brute-force all-pairs bit_count over the same 64-bit signatures
    (pigeonhole guarantees no pair at distance ≤ max_hamming escapes
    every band)."""
    from southpaw_spark.operators.dedup import simhash, simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(
            docs, "text", "doc_id", max_hamming=3
        ).collect()
    }
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, "text", "doc_id").collect()
    }
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            # mask to 64 bits: signatures are signed 64-bit, and bin()
            # of a negative XOR is sign-magnitude, not two's-complement
            h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    assert want, "corpus has no near pairs — test exercises nothing"


def test_bigram_lm_scores_flag_shuffled_text(spark):
    """The corpus-trained bigram LM must score a word-scrambled doc
    BELOW its naturally-ordered siblings (same vocabulary, broken
    transitions) — the signal surface stats cannot produce."""
    from southpaw_spark.operators.text import bigram_lm_scores

    natural = "the quick brown fox jumps over the lazy dog"
    rows = [(i, natural) for i in range(8)]
    rows.append((100, "dog the over quick lazy jumps fox brown the"))
    rows.append((101, "hi"))  # single word: no transition evidence
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in bigram_lm_scores(df, "text", "doc_id").collect()
    }
    assert 101 not in got
    assert all(got[i]["n_bigrams"] == 8 for i in range(8))
    assert got[100]["avg_logprob"] < got[0]["avg_logprob"]


def test_containment_pairs_asymmetric_and_exact(spark):
    """Planted quote-in-page: the small doc is ≥0.9-contained in the
    big page (detected a→b) while the reverse direction and the
    Jaccard score stay low — plus a randomized brute-force exactness
    sweep over a shared-vocabulary corpus."""
    import random

    from southpaw_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
        release,
    )

    quote = "the quick brown fox jumps over the lazy dog again today"
    page = (
        "intro words before the quoted passage begins now "
        + quote
        + " trailing commentary words continue for quite a while after the quote ends"
    )
    df = spark.createDataFrame(
        [(1, quote), (2, page), (3, "completely unrelated words everywhere")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, "text", "doc_id", threshold=0.9).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.9
    assert (2, 1) not in got  # asymmetry: the page is not inside the quote
    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.9
        ).collect()
    }
    assert (1, 2) not in jac  # Jaccard misses the quote relation

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(50):
        n_words = rng.randrange(3, 18)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n_words))))
        if rng.random() < 0.3:  # plant a substring-quote of an earlier doc
            base = docs[rng.randrange(len(docs))][1].split()
            lo = rng.randrange(max(1, len(base) - 3))
            docs.append((1000 + i, " ".join(base[lo: lo + rng.randrange(3, 9)])))
    fdf = spark.createDataFrame(docs, "doc_id long, text string")
    t = 0.7
    out = containment_pairs(fdf, "text", "doc_id", threshold=t)
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in out.collect()}
    release(out)

    def sh_set(text, n=3):
        w = text.split()
        return {" ".join(w[i: i + n]) for i in range(len(w) - n + 1)}

    sets = {i: sh_set(tx) for i, tx in docs if len(tx.split()) >= 3}
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b:
                c = len(sa & sb) / len(sa)
                if c >= t:
                    want[(a, b)] = round(c, 6)
    assert got == want


def test_containment_matches_python_oracle_fuzz(spark):
    """Randomized exactness for d10, mirroring the d02 fuzz: across
    corpora with heavy shared vocabulary (stop-shingle pressure),
    planted quotes, and varied thresholds, the default plan AND an
    adversarially tiny cap must both emit exactly the directional
    pairs a brute-force pure-Python containment finds."""
    import random

    from southpaw_spark.operators.dedup import containment_pairs, release

    rng = random.Random(61)
    common = [f"w{i}" for i in range(10)]
    rare = [f"r{i}" for i in range(300)]

    def make_doc():
        n_words = rng.randrange(3, 22)
        return " ".join(
            rng.choice(common if rng.random() < 0.6 else rare)
            for _ in range(n_words)
        )

    for trial, threshold in [(0, 0.3), (1, 0.6), (2, 0.9)]:
        docs = []
        for i in range(60):
            docs.append((100 * trial + i, make_doc()))
            if rng.random() < 0.35:  # plant a quote of an earlier doc
                base = docs[rng.randrange(len(docs))][1].split()
                lo = rng.randrange(max(1, len(base) - 3))
                docs.append((
                    10_000 + 100 * trial + i,
                    " ".join(base[lo: lo + rng.randrange(3, 10)]),
                ))

        def sh_set(text, n=3):
            w = text.split()
            return {
                " ".join(w[i:i + n]) for i in range(len(w) - n + 1)
            } if len(w) >= n else set()

        sets = {i: s for i, t in docs if (s := sh_set(t))}
        expected = {}
        for a, sa in sets.items():
            for b, sb in sets.items():
                if a != b:
                    c = len(sa & sb) / len(sa)
                    if c >= threshold:
                        expected[(a, b)] = round(c, 6)

        df = spark.createDataFrame(docs, "doc_id long, text string")
        for cap in ("auto", 3):  # auto disables at this size; 3 forces
            out = containment_pairs(  # the rare/hot split + rescue
                df, "text", "doc_id", n=3,
                threshold=threshold, max_doc_freq=cap,
            )
            got = {
                (r["id_a"], r["id_b"]): r["containment"]
                for r in out.collect()
            }
            release(out)
            assert got == expected, (trial, threshold, cap)


def test_filtered_topk_respects_filter_and_matches_bruteforce(spark, sf_dir):
    """Every filtered neighbor shares the query's label, and the result
    equals brute-force cosine over the label-restricted corpus."""
    from southpaw_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_filtered,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        "label",
    )
    got = cosine_topk_filtered(
        emb, q, "embedding", "vec_id", k=5, filter_cols=("label",)
    ).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in got:
        assert labels[r["neighbor_id"]] == labels[r["query_id"]]
    # parity: per query, filtering the corpus first gives identical rows
    for qid in range(2):
        lbl = labels[qid]
        sub = cosine_topk(
            emb.where(F.col("label") == lbl),
            q.where(F.col("query_id") == qid).drop("label"),
            "embedding", "vec_id", k=5,
        ).collect()
        mine = [r for r in got if r["query_id"] == qid]
        assert sorted((r["neighbor_id"], r["rank"]) for r in mine) == sorted(
            (r["neighbor_id"], r["rank"]) for r in sub
        )


def test_ngram_jaccard_integer_threshold_boundary(spark):
    """Double-rounding regression (ADVICE r7): when t·n is exactly an
    integer but the binary product rounds up (0.54·50 →
    27.000000000000004), a raw float length filter rejects the valid
    partner size and a ceil-based prefix slice drops the boundary
    token — silently missing a pair with Jaccard EXACTLY equal to the
    threshold. The floor-relaxed bounds must find it.

    Construction (n=1 shingles = distinct words): A = 27 words, all
    shared; B = those 27 plus 23 unique → J = 27/50 = 0.54 at
    t = 0.54, with the smallest shared token ranked 24th in B (its 23
    unique words are globally rarer), exactly the position a one-short
    prefix loses."""
    from southpaw_spark.operators.dedup import ngram_jaccard_pairs, release

    shared = [f"s{i:02d}" for i in range(27)]
    uniq = [f"u{i:02d}" for i in range(23)]
    df = spark.createDataFrame(
        [(1, " ".join(shared)), (2, " ".join(shared + uniq))],
        "doc_id long, text string",
    )
    for cap in ("auto", None, 1):
        out = ngram_jaccard_pairs(
            df, "text", "doc_id", n=1, threshold=0.54, max_doc_freq=cap
        )
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
        release(out)
        assert got == {(1, 2): 0.54}, f"missed boundary pair at cap={cap!r}"


def test_containment_integer_threshold_boundary(spark):
    """Same double-rounding boundary for containment: A = 50 words
    (23 unique + 27 shared), B = the 27 shared words only. Containment
    A→B = 27/50 = 0.54 exactly at t = 0.54: the buggy bounds reject it
    twice (|B| ≥ t·|A| fails as 27 ≥ 27.000000000000004, and A's
    ceil-shortened prefix stops one token before its smallest shared
    word at rank 24). B→A is full containment (1.0) and must appear in
    the same output."""
    from southpaw_spark.operators.dedup import containment_pairs, release

    shared = [f"s{i:02d}" for i in range(27)]
    uniq = [f"u{i:02d}" for i in range(23)]
    df = spark.createDataFrame(
        [(1, " ".join(uniq + shared)), (2, " ".join(shared))],
        "doc_id long, text string",
    )
    for cap in ("auto", None, 1):
        out = containment_pairs(
            df, "text", "doc_id", n=1, threshold=0.54, max_doc_freq=cap
        )
        got = {(r["id_a"], r["id_b"]): r["containment"] for r in out.collect()}
        release(out)
        assert got == {(1, 2): 0.54, (2, 1): 1.0}, (
            f"boundary miss at cap={cap!r}: {got}"
        )


def test_containment_pairs_skew_split_parity(spark):
    """The default rare/hot split (and an adversarial tiny cap) must
    emit EXACTLY the single-phase (cap=None) pair set — including on a
    boilerplate corpus where every doc shares one hot shingle, the
    shape whose doc-freq² join key the split exists to bound."""
    import random

    from southpaw_spark.operators.dedup import containment_pairs, release

    rng = random.Random(88)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(80):
        words = ["common boiler plate"]  # shared 3-gram in EVERY doc
        words += [rng.choice(vocab) for _ in range(rng.randrange(2, 14))]
        rng.shuffle(words)
        docs.append((i, " ".join(" ".join(w.split()) for w in words)))
        if rng.random() < 0.25:  # plant a contained quote
            base = docs[rng.randrange(len(docs))][1].split()
            lo = rng.randrange(max(1, len(base) - 4))
            docs.append(
                (1000 + i, " ".join(base[lo: lo + rng.randrange(4, 10)]))
            )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    outs = {}
    for cap in (None, 2, 8):
        out = containment_pairs(
            df, "text", "doc_id", threshold=0.6, max_doc_freq=cap
        )
        outs[cap] = {
            (r["id_a"], r["id_b"]): r["containment"] for r in out.collect()
        }
        release(out)
    assert outs[None], "corpus produced no containment pairs"
    assert outs[2] == outs[None]
    assert outs[8] == outs[None]


def test_containment_min_len_floors_a_side_only(spark):
    """min_len drops SHORT docs from the A (contained) side only: big
    docs must still find their containers, and the default min_len=1
    must change nothing."""
    from southpaw_spark.operators.dedup import containment_pairs, release

    quote = "alpha beta gamma delta epsilon zeta"
    page = "prefix words here " + quote + " suffix words trail after"
    df = spark.createDataFrame(
        [(1, quote), (2, page)], "doc_id long, text string"
    )
    base = containment_pairs(df, "text", "doc_id", threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in base.collect()}
    release(base)
    assert (1, 2) in got
    # quote has 4 3-gram shingles; floor at 5 removes it as an A doc
    floored = containment_pairs(
        df, "text", "doc_id", threshold=0.9, min_len=5
    )
    got_f = {(r["id_a"], r["id_b"]) for r in floored.collect()}
    release(floored)
    assert (1, 2) not in got_f


def test_quantized_topk_recall_and_rescore(spark, sf_dir):
    """s06: int8-quantized top-k must track the exact ranking closely
    (coarse recall ≥ 0.9 on the random corpus) and the two-stage
    exact-rescore variant must reproduce the exact top-k verbatim. The
    quantized score must be scale-free: scaling every vector by a
    constant changes nothing."""
    from southpaw_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_quantized,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, "embedding", "vec_id", k=5).collect()
    }
    coarse = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_quantized(
            emb, q, "embedding", "vec_id", k=5
        ).collect()
    }
    assert len(exact & coarse) / len(exact) >= 0.9
    rescored = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_quantized(
            emb, q, "embedding", "vec_id", k=5, rescore=emb
        ).collect()
    }
    exact_ranked = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk(emb, q, "embedding", "vec_id", k=5).collect()
    }
    assert rescored == exact_ranked
    # scale invariance of the quantized score
    scaled = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(7.5)).alias("embedding"),
    )
    qs = scaled.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    coarse_scaled = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in cosine_topk_quantized(
            scaled, qs, "embedding", "vec_id", k=5
        ).collect()
    }
    coarse_full = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in cosine_topk_quantized(
            emb, q, "embedding", "vec_id", k=5
        ).collect()
    }
    assert coarse_scaled == coarse_full


def test_quantize_embeddings_codes_bounded_and_zero_safe(spark):
    from southpaw_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "id long, v array<double>",
    )
    rows = {r["id"]: r for r in quantize_embeddings(df, "v", "id").collect()}
    assert all(abs(c) <= 127 for c in rows[1]["code"])
    assert rows[1]["code"][1] == -127.0  # the max-|x| component
    assert rows[2]["code"] == [0.0, 0.0, 0.0, 0.0] and rows[2]["scale"] == 0.0


def test_edit_distance_pairs_matches_python_oracle_fuzz(spark):
    """d14 exactness: the PassJoin segment plan must emit exactly the
    pairs a brute-force Levenshtein sweep finds, across thresholds 0-3
    on a corpus seeded with random substitutions/inserts/deletes."""
    import random

    from southpaw_spark.operators.dedup import edit_distance_pairs

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
                prev, dp[j] = dp[j], cur
        return dp[n]

    rng = random.Random(42)
    alph = "abcdef"
    words = []
    for i in range(120):
        base = "".join(rng.choice(alph) for _ in range(rng.randrange(4, 16)))
        words.append((i, base))
        if rng.random() < 0.6:
            s = list(base)
            for _ in range(rng.randrange(1, 4)):
                op = rng.randrange(3)
                if op == 0 and s:
                    s[rng.randrange(len(s))] = rng.choice(alph)
                elif op == 1:
                    s.insert(rng.randrange(len(s) + 1), rng.choice(alph))
                elif op == 2 and len(s) > 1:
                    del s[rng.randrange(len(s))]
            words.append((1000 + i, "".join(s)))
    df = spark.createDataFrame(words, "id long, s string")
    for d in (0, 1, 2, 3):
        got = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in edit_distance_pairs(df, "s", "id", max_dist=d).collect()
        }
        strs = {i: t for i, t in words if len(t) >= d + 1}
        ids = sorted(strs)
        want = {}
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                dd = lev(strs[ids[x]], strs[ids[y]])
                if dd <= d:
                    want[(ids[x], ids[y])] = dd
        assert got == want, f"mismatch at d={d}"


def test_edit_distance_pairs_degenerate_inputs(spark):
    import pytest as _pytest

    from southpaw_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab"), (4, "ab"), (5, "abc")],
        "id long, s string",
    )
    # max_dist=2: strings shorter than 3 chars are dropped (documented)
    got = {
        (r["id_a"], r["id_b"]) for r in
        edit_distance_pairs(df, "s", "id", max_dist=2).collect()
    }
    assert got == set()  # only "abc" survives the length floor
    # max_dist=1: "ab" pair is in scope
    got1 = {
        (r["id_a"], r["id_b"]): r["distance"] for r in
        edit_distance_pairs(df, "s", "id", max_dist=1).collect()
    }
    assert got1 == {(3, 4): 0, (3, 5): 1, (4, 5): 1}
    with _pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(df, "s", "id", max_dist=-1)


def test_connected_components_fast_path_parity(spark):
    """The driver union-find fast path must emit exactly the
    distributed star-contraction labels — random graphs with chains,
    self-loops, islands, and multi-merges; plus the cap boundary
    (driver_max_edges below the edge count forces the distributed
    path)."""
    import random

    from southpaw_spark.operators.dedup import connected_components

    rng = random.Random(99)
    for trial in range(4):
        n = rng.randrange(10, 60)
        edges = [(i, i) for i in rng.sample(range(n), k=min(5, n))]
        for _ in range(rng.randrange(5, 40)):
            edges.append((rng.randrange(n), rng.randrange(n)))
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        fast = {
            (r["id"], r["cluster_id"])
            for r in connected_components(df).collect()
        }
        dist = {
            (r["id"], r["cluster_id"])
            for r in connected_components(df, driver_max_edges=None).collect()
        }
        assert fast == dist, f"trial {trial}"
        # cap below the edge count -> distributed path, same answer
        capped = {
            (r["id"], r["cluster_id"])
            for r in connected_components(df, driver_max_edges=1).collect()
        }
        assert capped == dist


def _py_dup_spans(docs, k=8, min_count=2):
    """Brute-force oracle for duplicate_spans: global gram counts →
    per-doc merged intervals."""
    from collections import Counter

    toks = {i: t.split(" ") for i, t in docs}
    counts = Counter()
    for w in toks.values():
        for p in range(len(w) - k + 1):
            counts[" ".join(w[p:p + k])] += 1
    spans = {}
    for i, w in toks.items():
        starts = [
            p for p in range(len(w) - k + 1)
            if counts[" ".join(w[p:p + k])] >= min_count
        ]
        merged = []
        for p in starts:
            if merged and p <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], p + k))
            else:
                merged.append((p, p + k))
        if merged:
            spans[i] = merged
    return spans


def test_duplicate_spans_matches_python_oracle_fuzz(spark):
    """d15: randomized exactness vs a brute-force Python oracle —
    planted shared passages, self-repetition, and boilerplate
    prefixes — for both the exact gram-string path and the
    hash-grams scale path (identical on a collision-free corpus)."""
    import random

    from southpaw_spark.operators.dedup import duplicate_spans, release

    rng = random.Random(62)
    vocab = [f"v{i}" for i in range(200)]
    boiler = " ".join(f"b{i}" for i in range(9))  # 9-token boilerplate
    docs = []
    for i in range(50):
        words = [rng.choice(vocab) for _ in range(rng.randrange(4, 30))]
        if rng.random() < 0.3:  # boilerplate prefix in ~1/3 of docs
            words = boiler.split() + words
        if docs and rng.random() < 0.3:  # copy a passage from earlier
            src = docs[rng.randrange(len(docs))][1].split()
            lo = rng.randrange(max(1, len(src) - 8))
            words += src[lo: lo + rng.randrange(8, 14)]
        if rng.random() < 0.1:  # self-repetition
            words += words[: rng.randrange(8, min(14, len(words) + 1))]
        docs.append((i, " ".join(words)))

    k = 8
    expected = _py_dup_spans(docs, k=k)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for hg in (False, True):
        out = duplicate_spans(df, "text", "doc_id", k=k, hash_grams=hg)
        got = {
            r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]]
            for r in out.collect()
        }
        release(out)
        assert got == expected, f"hash_grams={hg}"
        # derived scalars agree with the spans
        for r in duplicate_spans(
            df, "text", "doc_id", k=k, hash_grams=hg
        ).collect():
            assert r["n_spans"] == len(expected[r["doc_id"]])
            assert r["dup_tokens"] == sum(
                e - s for s, e in expected[r["doc_id"]]
            )


def test_remove_duplicate_spans_cuts_exactly_the_spans(spark):
    """d16: the cleaned text is exactly the tokens outside the merged
    spans; docs without spans pass through verbatim; a fully-duplicated
    doc becomes the empty string; non-text columns survive."""
    from southpaw_spark.operators.dedup import remove_duplicate_spans

    docs = [
        (1, "a b c d e f g h i j", "en"),
        (2, "x a b c d e f g h y z", "en"),
        (3, "p q r s t u v w", "de"),
        (4, "m m m m m m m m m m m m", "fr"),
        (5, "short doc", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rows = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, "text", "doc_id", k=8).collect()
    }
    assert rows[1]["text_clean"] == "i j"
    assert rows[2]["text_clean"] == "x y z"
    assert rows[3]["text_clean"] == "p q r s t u v w"  # untouched
    assert rows[4]["text_clean"] == ""  # fully duplicated
    assert rows[5]["text_clean"] == "short doc"  # < k tokens: no grams
    assert rows[4]["n_tokens_before"] == 12 and rows[4]["n_tokens_after"] == 0
    assert all(r["lang"] for r in rows.values())  # other columns kept
    assert len(rows) == len(docs)  # one output row per input row


def test_duplicate_spans_adjacent_intervals_merge(spark):
    """Two duplicated grams whose intervals touch end-to-start must
    merge into one span (the contiguous duplicated region), and k<1
    must raise."""
    import pytest as _pytest

    from southpaw_spark.operators.dedup import duplicate_spans

    # grams 'a1..a3' (pos 0) and 'c1..c3' (pos 3) both duplicated;
    # intervals [0,3) and [3,6) touch -> one [0,6) span
    d1 = "a1 a2 a3 c1 c2 c3"
    df = spark.createDataFrame(
        [(1, d1 + " tail1 one"), (2, d1 + " tail2 two"),
         (3, "a1 a2 a3 q r s"), (4, "z y c1 c2 c3 w")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]]
        for r in duplicate_spans(df, "text", "doc_id", k=3).collect()
    }
    assert rows[1] == [(0, 6)] and rows[2] == [(0, 6)]
    assert rows[3] == [(0, 3)] and rows[4] == [(2, 5)]
    with _pytest.raises(ValueError, match="k must be"):
        duplicate_spans(df, "text", "doc_id", k=0)


def test_token_budget_sample_semantics_and_bucket_parity(spark, sf_dir):
    """t15: per-domain token totals land in [budget, budget + max doc)
    when the domain has enough tokens; the bucketed no-global-sort plan
    equals the n_buckets=1 (pure window) answer exactly; re-running is
    deterministic and salt redraws; unbudgeted domains are dropped."""
    from southpaw_spark.operators.text import token_budget_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budgets = {"en": 2000, "de": 800}
    ids = {}
    for nb in (1, 8, 1024):
        out = token_budget_sample(
            docs, "text", "doc_id", "lang", budgets, n_buckets=nb
        )
        rows = out.collect()
        ids[nb] = sorted(r["doc_id"] for r in rows)
        per_dom = {}
        for r in rows:
            assert r["lang"] in budgets  # unbudgeted langs dropped
            per_dom.setdefault(r["lang"], []).append(r["n_tokens"])
        for dom, toks in per_dom.items():
            total = sum(toks)
            assert total >= budgets[dom]  # crossing doc included
            assert total - max(toks) < budgets[dom]  # minus it: under
    assert ids[1] == ids[8] == ids[1024]
    again = token_budget_sample(
        docs, "text", "doc_id", "lang", budgets
    )
    assert sorted(r["doc_id"] for r in again.collect()) == ids[1024]
    redrawn = token_budget_sample(
        docs, "text", "doc_id", "lang", budgets, salt="s2"
    )
    assert sorted(r["doc_id"] for r in redrawn.collect()) != ids[1024]


def test_token_budget_sample_undersized_domain_keeps_everything(spark):
    """A domain whose whole corpus is under budget is kept verbatim,
    and n_buckets<1 raises."""
    import pytest as _pytest

    from southpaw_spark.operators.text import token_budget_sample

    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e", "en"), (3, "x y z w", "de")],
        "doc_id long, text string, lang string",
    )
    out = token_budget_sample(
        df, "text", "doc_id", "lang", {"en": 1_000_000}
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]
    with _pytest.raises(ValueError, match="n_buckets"):
        token_budget_sample(df, "text", "doc_id", "lang", {"en": 5},
                            n_buckets=0)


def test_span_contamination_matches_python_oracle_and_cut(spark):
    """d17: spans equal a brute-force Python oracle (corpus grams ∩
    benchmark gram set, merged); cut_spans removes exactly those
    tokens; clean docs pass through; the benchmark gram side is
    broadcast (no shuffle on the corpus scan before the per-doc
    groupBy)."""
    import random

    from southpaw_spark.operators.dedup import (
        cut_spans,
        release,
        span_contamination,
    )

    rng = random.Random(64)
    vocab = [f"v{i}" for i in range(120)]
    bench_docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(8, 20)))
        for _ in range(6)
    ]
    corpus = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randrange(4, 20))]
        if rng.random() < 0.4:  # leak a benchmark passage
            src = bench_docs[rng.randrange(len(bench_docs))].split()
            lo = rng.randrange(max(1, len(src) - 8))
            words[rng.randrange(len(words) + 1):0] = (
                src[lo: lo + rng.randrange(8, 12)]
            )
        corpus.append((i, " ".join(words)))

    k = 8
    bset = set()
    for t in bench_docs:
        w = t.split()
        for p in range(len(w) - k + 1):
            bset.add(" ".join(w[p:p + k]))
    expected = {}
    for i, t in corpus:
        w = t.split()
        starts = [
            p for p in range(len(w) - k + 1)
            if " ".join(w[p:p + k]) in bset
        ]
        merged = []
        for p in starts:
            if merged and p <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], p + k))
            else:
                merged.append((p, p + k))
        if merged:
            expected[i] = merged

    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(j, t) for j, t in enumerate(bench_docs)],
        "bid long, text string",
    )
    out = span_contamination(cdf, bdf, "text", "doc_id", k=k)
    got = {
        r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]]
        for r in out.collect()
    }
    assert got == expected
    for r in out.collect():
        toks = sum(e - s for s, e in expected[r["doc_id"]])
        assert r["contaminated_tokens"] == toks
        assert r["contamination_frac"] == round(
            toks / r["n_tokens"], 6
        )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan

    clean = {
        r["doc_id"]: r
        for r in cut_spans(
            cdf, out.select("doc_id", "spans"), "text", "doc_id"
        ).collect()
    }
    release(out)
    for i, t in corpus:
        w = t.split()
        spans = expected.get(i, [])
        want = " ".join(
            tok for j, tok in enumerate(w)
            if not any(s <= j < e for s, e in spans)
        )
        assert clean[i]["text_clean"] == want, i
        assert clean[i]["n_tokens_after"] == len(want.split()) if want else True


def test_semantic_duplicates_planted_and_kmeans_path(spark, sf_dir):
    """d18: planted perturbed copies are caught within their cells
    (cluster-boundary misses allowed, ≥ 80% recall), the decision rule
    is drop-the-larger-id with dup_of = smallest similar id, the
    centroid frame broadcasts, and the MLlib k-means quantizer path
    (production, non-oracle) reaches at least the deterministic
    quantizer's recall."""
    from southpaw_spark.operators.dedup import semantic_duplicates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
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
    n_planted = copies.count()

    out = semantic_duplicates(
        base, "embedding", "vec_id", threshold=0.99, n_cells=16
    )
    rows = out.collect()
    planted = [r for r in rows if r["vec_id"] >= 1_000_000]
    recall = len(planted) / n_planted
    assert recall >= 0.8, f"recall {recall}"
    for r in planted:
        assert r["dup_of"] == r["vec_id"] - 1_000_000
        assert r["cosine"] >= 0.99
    # every dropped id is strictly larger than its keeper
    assert all(r["dup_of"] < r["vec_id"] for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # centroids broadcast

    km = semantic_duplicates(
        base, "embedding", "vec_id", threshold=0.99, n_cells=16,
        use_kmeans=True,
    ).collect()
    km_planted = [r for r in km if r["vec_id"] >= 1_000_000]
    assert len(km_planted) >= len(planted)  # adaptive cells >= fixed

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_cells"):
        semantic_duplicates(base, "embedding", "vec_id", n_cells=0)


def test_mmr_topk_matches_python_greedy_and_diversifies(spark, sf_dir):
    """s07: the distributed MMR equals a pure-Python greedy over the
    same rounded similarity inputs; λ=1 degenerates to plain top-k
    order; the picked set is more diverse than plain top-k (lower mean
    pairwise cosine) on a corpus with a planted near-dup cluster."""
    import math

    from southpaw_spark.operators.similarity import cosine_topk, mmr_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # plant a tight near-dup cluster around vector 0 so plain top-k
    # fills with copies and MMR must skip them
    clones = emb.where(F.col("vec_id") == 0).select(
        F.explode(F.array(*[F.lit(i) for i in (9001, 9002, 9003)]))
        .alias("vec_id"),
        F.col("embedding"),
        F.col("label"),
    ).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x + F.lit(0.0001),
        ).alias("embedding"),
        "label",
    )
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    ).unionByName(clones)
    q = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = mmr_topk(corpus, q, "embedding", "vec_id", k=4, pool=12)
    rows = sorted(
        (r["query_id"], r["mmr_rank"], r["neighbor_id"], r["mmr_score"])
        for r in got.collect()
    )

    # python reference over the same rounded inputs
    pool_rows = cosine_topk(
        corpus, q, "embedding", "vec_id", k=12
    ).collect()
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in corpus.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d / (math.sqrt(sum(x * x for x in a))
                 * math.sqrt(sum(y * y for y in b))), 6,
        )

    want = []
    for qid in (0, 1, 2):
        rels = {
            r["neighbor_id"]: r["cosine"]
            for r in pool_rows if r["query_id"] == qid
        }
        selected, remaining = [], dict(rels)
        for step in range(1, 5):
            best, best_score = None, None
            for c in sorted(remaining):
                ms = max(
                    (cos(vecs[c], vecs[s]) for s in selected), default=0.0
                )
                score = 0.5 * remaining[c] - 0.5 * ms
                if best is None or score > best_score:
                    best, best_score = c, score
            want.append((qid, step, best, round(best_score, 7)))
            selected.append(best)
            del remaining[best]
    assert rows == sorted(want)

    # diversity property: for query 0 the clones (cosine ~1 with each
    # other) must not all appear, while plain top-k picks all of them
    plain0 = {
        r["neighbor_id"]
        for r in pool_rows
        if r["query_id"] == 0 and r["rank"] <= 4
    }
    mmr0 = {n for qid, _, n, _ in want if qid == 0}
    clones_set = {9001, 9002, 9003}
    assert len(plain0 & clones_set) == 3  # top-k drowns in copies
    assert len(mmr0 & clones_set) < 3  # MMR skips near-copies

    # λ=1 degenerates to relevance order
    lam1 = mmr_topk(corpus, q, "embedding", "vec_id", k=4, pool=12,
                    lam=1.0)
    for r in lam1.collect():
        pool_rank = [
            p["neighbor_id"] for p in pool_rows
            if p["query_id"] == r["query_id"]
        ]
        assert pool_rank[r["mmr_rank"] - 1] == r["neighbor_id"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lam"):
        mmr_topk(corpus, q, "embedding", "vec_id", lam=1.5)
    with _pytest.raises(ValueError, match="pool"):
        mmr_topk(corpus, q, "embedding", "vec_id", k=20, pool=10)


def test_merged_spans_property_random(spark):
    """merged_spans invariants over 300 random start sets in ONE job:
    equals a Python reference merge, spans are disjoint, ordered,
    non-touching, cover exactly the flagged positions, and every span
    has length >= k."""
    import random

    from southpaw_spark.operators.dedup import merged_spans

    rng = random.Random(65)
    k = 5
    cases = []
    for i in range(300):
        n = rng.randrange(0, 30)
        starts = sorted(rng.sample(range(0, 60), n)) if n else []
        cases.append((i, starts))

    def ref(starts):
        out = []
        for p in starts:
            if out and p <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], p + k))
            else:
                out.append((p, p + k))
        return out

    df = spark.createDataFrame(cases, "case long, starts array<int>")
    got = {
        r["case"]: [(s["start"], s["end"]) for s in r["m"]]
        for r in df.select(
            "case", merged_spans(F.col("starts"), k).alias("m")
        ).collect()
    }
    for i, starts in cases:
        want = ref(starts)
        assert got[i] == want, (i, starts)
        # disjoint, strictly separated, k-minimum, exact coverage
        for (s1, e1), (s2, e2) in zip(want, want[1:]):
            assert e1 < s2
        assert all(e - s >= k for s, e in want)
        covered = {
            t for s, e in want for t in range(s, e)
        }
        flagged = {t for p in starts for t in range(p, p + k)}
        assert covered == flagged


def test_mmr_topk_string_ids(spark):
    """s07 with STRING doc/query ids: the applyInPandas output schema
    derives id types from the inputs (ADVICE r8 — a fixed 'long' DDL
    broke non-long ids at runtime)."""
    from southpaw_spark.operators.similarity import mmr_topk

    corpus = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),
            ("b", [0.99, 0.14]),  # near-copy of a
            ("c", [0.0, 1.0]),
            ("d", [0.6, 0.8]),
        ],
        "doc string, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "query_id string, query_vec array<double>"
    )
    got = mmr_topk(corpus, q, "embedding", "doc", k=3, pool=4, lam=0.3)
    rows = sorted(
        (r["query_id"], r["mmr_rank"], r["neighbor_id"]) for r in got.collect()
    )
    assert [r[0] for r in rows] == ["q1"] * 3
    picked = [n for _, _, n in sorted(rows, key=lambda r: r[1])]
    # hand-computed greedy at λ=0.3: a (rel argmax), then c (orthogonal
    # beats the near-copy b), then d
    assert picked == ["a", "c", "d"]


def test_suggest_n_cells_sizing_rule():
    """suggest_n_cells: sqrt(N) while cells stay under target, then the
    N/target cap takes over; monotone non-decreasing; floor 1."""
    from southpaw_spark.operators.dedup import suggest_n_cells

    assert suggest_n_cells(0) == 1
    assert suggest_n_cells(1) == 1
    assert suggest_n_cells(100) == 10
    assert suggest_n_cells(10_000) == 100
    # past target_cell**2 the memory cap dominates: cells <= target rows
    n = 10_000_000
    c = suggest_n_cells(n, target_cell=1024)
    assert c == max(3163, 9766) == 9766
    assert n / c <= 1024
    prev = 0
    for k in (1, 10, 1000, 10**5, 10**7, 10**9):
        cur = suggest_n_cells(k)
        assert cur >= prev
        prev = cur


def test_semantic_duplicates_multi_probe_recovers_boundary_pairs(spark):
    """d18 n_probes: with pinned centroids, a near-dup pair whose two
    members land in DIFFERENT nearest cells is invisible to
    single-probe but caught at n_probes=2; multi-probe output is a
    superset of single-probe; n_probes=1 output is bit-identical to
    the original plan (same rows)."""
    import pytest as _pytest

    from southpaw_spark.operators.dedup import semantic_duplicates

    # two centroids along axes 0 and 1; the planted pair sits near the
    # bisector, one member barely on each side (cosine ~0.9997)
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cell int, centroid array<double>",
    )
    rows = [
        (1, [1.0, 0.02, 0.0]),     # cell 0
        (2, [0.02, 1.0, 0.0]),     # cell 1
        (10, [1.0, 0.98, 0.0]),    # bisector, barely cell 0
        (11, [0.98, 1.0, 0.0]),    # bisector, barely cell 1 — dup of 10
        (20, [0.0, 0.0, 1.0]),     # far from both, unique
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = semantic_duplicates(
        corpus, "embedding", "vec_id", threshold=0.99,
        n_cells=2, centroids=centroids,
    ).collect()
    assert [r["vec_id"] for r in one] == []  # straddles the boundary
    two = semantic_duplicates(
        corpus, "embedding", "vec_id", threshold=0.99,
        n_cells=2, centroids=centroids, n_probes=2,
    ).collect()
    got = {(r["vec_id"], r["dup_of"]) for r in two}
    assert got == {(11, 10)}
    # superset property on the kmeans path too (monotone in n_probes)
    km1 = {
        r["vec_id"]
        for r in semantic_duplicates(
            corpus, "embedding", "vec_id", threshold=0.99,
            n_cells=2, use_kmeans=True,
        ).collect()
    }
    km2 = {
        r["vec_id"]
        for r in semantic_duplicates(
            corpus, "embedding", "vec_id", threshold=0.99,
            n_cells=2, use_kmeans=True, n_probes=2,
        ).collect()
    }
    assert km1 <= km2
    with _pytest.raises(ValueError, match="n_probes"):
        semantic_duplicates(
            corpus, "embedding", "vec_id", n_cells=2, n_probes=3
        )
    with _pytest.raises(ValueError, match="n_probes"):
        semantic_duplicates(
            corpus, "embedding", "vec_id", n_cells=2, n_probes=0
        )


def test_ivf_quantized_topk_recall_and_plan(spark, sf_dir):
    """s08: the composed IVF+int8+rescore path on a planted-neighborhood
    corpus (each query's true top-k are its seeded noised clones)
    reaches recall >= 0.95 vs exact brute force with the k-means
    production quantizer; the plan broadcasts the probe side and never
    cross-products; the pinned-centroid registry path agrees with the
    production path's output SHAPE."""
    import numpy as np

    from southpaw_spark.operators.similarity import (
        cosine_topk,
        ivf_quantized_topk,
    )

    base = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    ]
    rng = np.random.default_rng(90920)
    max_id = max(i for i, _ in base)
    clones = [
        (max_id + 1 + qid * 10 + j, [float(x) for x in np.asarray(v) + rng.normal(0, 0.05, len(v))])
        for qid, v in base[:10]
        for j in range(8)
    ]
    emb = spark.createDataFrame(
        base + clones, "vec_id long, embedding array<double>"
    )
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {}
    for r in cosine_topk(emb, queries, "embedding", "vec_id", k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    out = ivf_quantized_topk(
        emb, queries, "embedding", "vec_id", k=5, n_probe=2
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(got.get(q, set()) & hits) / len(hits) for q, hits in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.95, recalls
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    # ranks are 1..k per query, exact-rescore cosines are rounded 6
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 6)) for v in by_q.values())


def test_bloom_prefilter_no_false_negatives(spark):
    """Every true member survives the bloom (no false negatives —
    the property the exact-confirm join relies on), and the false
    positive rate is in the ballpark of the requested fpp."""
    import random as _r
    import string as _s

    from southpaw_spark.operators.dedup import bloom_prefilter

    _r.seed(3)
    vals = [
        "".join(_r.choices(_s.ascii_lowercase, k=12)) for _ in range(4000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    ref = spark.createDataFrame([(v,) for v in vals[:800]], "y string")
    kept = {r["x"] for r in bloom_prefilter(df, "x", ref, "y", 0.01).collect()}
    assert set(vals[:800]) - kept == set()
    fp = len(kept - set(vals[:800]))
    assert fp / 3200 < 0.05  # ~1% expected; generous bound


def test_span_contamination_bloom_path_identical(spark, sf_dir):
    """prefilter='bloom' is an execution-path change only: the bitmap
    admits extra candidates, the confirm join removes them, and the
    output matches the exact broadcast path row-for-row."""
    from southpaw_spark.operators.dedup import span_contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)

    def rows(**kw):
        return sorted(
            (r["doc_id"], str(r["spans"]), r["contaminated_tokens"])
            for r in span_contamination(
                corpus, bench, "text", "doc_id", k=8, **kw
            ).collect()
        )

    exact = rows()
    assert exact  # non-vacuous: the corpus IS contaminated
    assert rows(prefilter="bloom") == exact
    # a sloppy bitmap (fpp 50%) still confirms to the exact answer
    assert rows(prefilter="bloom", bloom_fpp=0.5) == exact


def test_temperature_budgets_math():
    from southpaw_spark.operators.text import temperature_budgets

    # alpha=0.5 integer path: w = isqrt(counts) = (10, 20, 40)
    b = temperature_budgets({"a": 100, "b": 400, "c": 1600}, 7000, 0.5)
    assert b == {"a": 1000, "b": 2000, "c": 4000}
    # alpha=1 keeps natural proportions
    b1 = temperature_budgets({"a": 100, "b": 300}, 4000, 1.0)
    assert b1 == {"a": 1000, "b": 3000}
    # alpha=0 is uniform
    b0 = temperature_budgets({"a": 100, "b": 900}, 1000, 0.0)
    assert b0 == {"a": 500, "b": 500}
    assert temperature_budgets({}, 1000) == {}
    assert temperature_budgets({"a": 0}, 1000, 0.5) == {"a": 0}


def test_temperature_mix_budget_adherence(spark, sf_dir):
    """Each domain's sampled token total reaches its derived budget and
    overshoots by at most one document (t15's greedy crossing rule);
    rare domains are upweighted relative to natural proportions."""
    from southpaw_spark.operators.text import (
        temperature_budgets, temperature_mix, tokens,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {
        r["source"]: r["nt"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(tokens(F.col("text")))).alias("nt"))
        .collect()
    }
    budgets = temperature_budgets(counts, 10000)
    got = (
        temperature_mix(docs, "text", "doc_id", "source", 10000)
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("nt"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert {r["source"] for r in got} == set(budgets)
    for r in got:
        b = budgets[r["source"]]
        cap = min(b + r["mx"], counts[r["source"]])
        assert min(b, counts[r["source"]]) <= r["nt"] <= cap, (
            r["source"], r["nt"], b,
        )


def test_canonical_url_rules(spark):
    from southpaw_spark.operators.text import canonical_url

    cases = [
        # scheme+host lowercased, www./default port/fragment/tracking
        # params dropped, params sorted, trailing slash stripped
        ("HTTP://WWW.Ex.COM:80/A/B/?utm_source=x&b=2&a=1#f",
         "http://ex.com/A/B?a=1&b=2"),
        ("https://ex.com:443/p", "https://ex.com/p"),
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),  # kept
        ("http://ex.com", "http://ex.com"),
        ("http://ex.com/?gclid=1&fbclid=2&ref=3", "http://ex.com"),
        ("http://ex.com/Path/", "http://ex.com/Path"),  # path case kept
        ("http://ex.com/p?z=1&a=2&utm_campaign=c",
         "http://ex.com/p?a=2&z=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_clean_lines_c4_rules(spark):
    from southpaw_spark.operators.text import clean_lines

    doc1 = "\n".join([
        "This line is real prose.",          # kept
        "Enable JavaScript to continue.",    # blacklist (case-insensitive)
        "short.",                            # < 3 words
        "no terminal punctuation here",      # bad ending
        '{"k": 1}',                          # curly braces
        "  Trimmed line also survives!  ",   # kept (trim before checks)
        "Please read our Privacy Policy.",   # blacklist
        'He said "stop".',                   # kept (ends with .)
    ])
    df = spark.createDataFrame(
        [(1, doc1), (2, "nothing survives here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in clean_lines(df, "text").collect()}
    assert set(rows) == {1}  # doc 2 dropped (0 lines kept)
    r = rows[1]
    assert r["n_lines"] == 8 and r["n_lines_kept"] == 3
    assert r["text"].split("\n") == [
        "This line is real prose.",
        "  Trimmed line also survives!  ",
        'He said "stop".',
    ]


def test_clean_lines_no_shuffle_plan(spark):
    """Line cleaning must stay per-row codegen — zero exchanges — so it
    rides the scan partitioning at any corpus size."""
    from southpaw_spark.operators.text import clean_lines

    df = spark.createDataFrame([(1, "a.\nb.")], "doc_id long, text string")
    plan = (
        clean_lines(df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_hash_split_deterministic_disjoint_exhaustive(spark):
    from southpaw_spark.operators.text import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(df, "doc_id", fr, salt="e")
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 2000  # exhaustive, one label per row
    counts = {}
    for s in rows.values():
        counts[s] = counts.get(s, 0) + 1
    # hash-uniform: within loose tolerance of the fractions
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.04
    # stability: same assignment under repartitioning and on a subset
    sub = hash_split(
        df.where(F.col("doc_id") < 500).repartition(7),
        "doc_id", fr, salt="e",
    )
    assert all(
        rows[r["doc_id"]] == r["split"] for r in sub.collect()
    )
    # salt redraws the split
    redrawn = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", fr, salt="f").collect()
    }
    assert redrawn != rows

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", {"a": 0.5})


def test_canonical_url_valueless_tracking_params(spark):
    """Valueless tracking params ('?fbclid', '&utm_source') must be
    stripped too (round-10 ADVICE fix: '=' is optional in the tracking
    match), while non-tracking params that merely share a prefix
    ('refresh=1', 'reference=x') survive."""
    from southpaw_spark.operators.text import canonical_url

    cases = [
        ("http://ex.com/p?fbclid", "http://ex.com/p"),
        ("http://ex.com/p?utm_source&b=1", "http://ex.com/p?b=1"),
        ("http://ex.com/p?a=1&gclid", "http://ex.com/p?a=1"),
        ("http://ex.com/p?refresh=1", "http://ex.com/p?refresh=1"),
        ("http://ex.com/p?reference=x", "http://ex.com/p?reference=x"),
        ("http://ex.com/p?ref", "http://ex.com/p"),
        ("http://ex.com/p?utm_", "http://ex.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_hash_split_bounds_exact_accumulation():
    """Boundaries must come from EXACT rational accumulation, not float
    sums (round-10 ADVICE fix): 0.9 + 0.05 float-accumulates to
    0.9500000000000001, whose int(cum·2³²) can drift one off an
    independent engine's literal cumulative fraction."""
    from fractions import Fraction

    from southpaw_spark.operators.text import hash_split_bounds

    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    bounds = dict(hash_split_bounds(fr))
    assert bounds["train"] == int(Fraction(0.9) * (1 << 32))
    assert bounds["val"] == int(
        (Fraction(0.9) + Fraction(0.05)) * (1 << 32)
    )
    assert bounds["test"] == 1 << 32  # pinned: max hash covered

    # associativity: a permutation with the same cumulative PREFIX sums
    # yields identical boundaries for the shared prefixes — float
    # accumulation order can never shift a boundary
    many = {f"s{i}": 0.1 for i in range(10)}
    b = [v for _, v in hash_split_bounds(many)]
    assert b == [
        int(Fraction(0.1) * k * (1 << 32)) for k in range(1, 10)
    ] + [1 << 32]

    # the registry oracle derives its literals from the same helper
    from southpaw_spark import suite

    assert str(bounds["train"]) in suite.T20_SQL
    assert str(bounds["val"]) in suite.T20_SQL


def test_temperature_mix_domain_guard(spark):
    """The per-domain budget collect is bounded metadata only for
    curated domains; past max_domains the operator must fail loudly
    (round-10 task: the asof_state-style guard)."""
    import pytest as _pytest

    from southpaw_spark.operators.text import temperature_mix

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("w w w").alias("text"),
        F.col("id").cast("string").alias("host"),  # 50 distinct keys
    )
    with _pytest.raises(ValueError, match="max_domains"):
        temperature_mix(
            df, "text", "doc_id", "host", 100, max_domains=10
        )
    # under the cap (and with the guard disabled) it runs
    out = temperature_mix(
        df, "text", "doc_id", "host", 100, max_domains=50
    )
    assert out.count() > 0
    out2 = temperature_mix(
        df, "text", "doc_id", "host", 100, max_domains=None
    )
    assert out2.count() == out.count()


def test_semantic_duplicates_gemm_kernel_equals_join_kernel(spark):
    """d18 pair_scan: the Arrow/BLAS gemm kernel (shortlist at
    threshold−1e-9, bit-exact cumsum rescore) emits EXACTLY the
    codegen self-join's rows — ids, cells, dup_of, and float-for-float
    cosines — on a random corpus with planted near-dups, string ids,
    and a block size small enough to force the blocked gemm path;
    multi-probe too; bad pair_scan raises. (Zero-norm vectors fail at
    CELL ASSIGNMENT under ANSI mode in both kernels alike — upstream
    of the pair scan — so they aren't a kernel-divergence surface.)"""
    import numpy as np
    import pytest as _pytest

    from southpaw_spark.operators.dedup import semantic_duplicates

    rng = np.random.default_rng(77)
    rows = []
    for i in range(120):
        v = rng.standard_normal(16)
        rows.append((f"doc{i:04d}", [float(x) for x in v]))
        if i % 7 == 0:  # planted near-dup (larger id → dropped)
            noised = v + rng.normal(0, 0.005, 16)
            rows.append((f"doc{i:04d}x", [float(x) for x in noised]))
    corpus = spark.createDataFrame(
        rows, "doc_id string, embedding array<double>"
    )

    def canon(res):
        return sorted(
            (r["doc_id"], r["cell"], r["dup_of"], r["cosine"])
            for r in res.collect()
        )

    for probes in (1, 2):
        join_out = canon(
            semantic_duplicates(
                corpus, "embedding", "doc_id", threshold=0.98,
                n_cells=6, n_probes=probes, pair_scan="join",
            )
        )
        gemm_out = canon(
            semantic_duplicates(
                corpus, "embedding", "doc_id", threshold=0.98,
                n_cells=6, n_probes=probes, pair_scan="gemm",
                gemm_block_rows=8,  # force many blocks per cell
            )
        )
        assert join_out == gemm_out  # bit-identical, incl. cosines
        assert len(gemm_out) >= 15  # the planted dups were found
    with _pytest.raises(ValueError, match="pair_scan"):
        semantic_duplicates(
            corpus, "embedding", "doc_id", pair_scan="fast"
        )


def test_score_with_linear_model_exact_and_impl_parity(spark, sf_dir):
    """t22: the hashed-BoW linear margin matches an independent Python
    replay float-for-float (exact integer micro-unit accounting), the
    explode and HOF physical paths agree bit-for-bit, empty docs score
    exactly the bias, and bad args raise."""
    import hashlib
    import re

    import pytest as _pytest

    from southpaw_spark.operators.text import score_with_linear_model

    W = [((i * 37) % 201 - 100) / 100.0 for i in range(64)]
    BIAS = 0.05
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = {
        r["doc_id"]: r["model_score"]
        for r in score_with_linear_model(
            docs, "text", "doc_id", W, BIAS, impl="explode"
        ).select("doc_id", "model_score").collect()
    }
    hf = {
        r["doc_id"]: r["model_score"]
        for r in score_with_linear_model(
            docs, "text", "doc_id", W, BIAS, impl="hof"
        ).select("doc_id", "model_score").collect()
    }
    assert ex == hf  # bit-identical across physical paths

    wm = [int(round(w * 1e6)) for w in W]
    bm = int(round(BIAS * 1e6))

    def replay(text):
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        if not toks:
            return bm / 1e6
        num = sum(
            wm[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64]
            for t in toks
        )
        return (num + bm * len(toks)) / (len(toks) * 1e6)

    for r in docs.limit(25).collect():
        assert ex[r["doc_id"]] == replay(r["text"])

    empty = spark.createDataFrame(
        [(1, ""), (2, "...!!!")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["model_score"]
        for r in score_with_linear_model(
            empty, "text", "doc_id", W, BIAS
        ).collect()
    }
    assert got == {1: bm / 1e6, 2: bm / 1e6}  # no tokens -> bias
    with _pytest.raises(ValueError, match="impl"):
        score_with_linear_model(empty, "text", "doc_id", W, impl="x")
    with _pytest.raises(ValueError, match="non-empty"):
        score_with_linear_model(empty, "text", "doc_id", [])
    with _pytest.raises(ValueError, match="too large"):
        score_with_linear_model(empty, "text", "doc_id", [1e6])


def test_embedding_contamination_planted_leaks(spark):
    """d20: planted near-copies of benchmark vectors are flagged with
    the right bench_id and cosine ≥ threshold; clean vectors pass;
    ties break to the smallest bench id; an empty benchmark yields an
    empty frame with the right schema."""
    import numpy as np

    from southpaw_spark.operators.dedup import embedding_contamination

    rng = np.random.default_rng(55)
    base = rng.standard_normal((40, 16))
    corpus_rows = [
        (i, [float(x) for x in base[i]]) for i in range(40)
    ]
    # benchmark: vectors 0..9 perturbed (ids 100..109); corpus rows
    # 0..9 are thus leaks, 10..39 clean
    bench_rows = [
        (100 + i, [float(x) for x in base[i] + rng.normal(0, 1e-4, 16)])
        for i in range(10)
    ]
    # duplicate benchmark entry for vector 0 with a LARGER id: the tie
    # (same cosine would need identical vectors — use an exact copy)
    bench_rows.append((500, [float(x) for x in bench_rows[0][1]]))
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    bench = spark.createDataFrame(
        bench_rows, "vec_id long, embedding array<double>"
    )
    out = embedding_contamination(
        corpus, bench, "embedding", "vec_id", threshold=0.999
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == set(range(10))  # exactly the planted leaks
    for i in range(10):
        assert rows[i]["cosine"] >= 0.999
    # vector 0's best match is duplicated under ids 100 and 500 with
    # identical cosine — the smaller bench id wins
    assert rows[0]["bench_id"] == 100

    empty = embedding_contamination(
        corpus, bench.where("vec_id < 0"), "embedding", "vec_id"
    )
    assert empty.columns == ["vec_id", "bench_id", "cosine"]
    assert empty.count() == 0


def test_pq_topk_recall_and_exactness(spark):
    """s09: on a corpus with planted near-neighbors the PQ/ADC
    shortlist + exact rescore recovers the true top-1 for every query
    (the planted neighbor is ADC-close by construction); reported
    cosines are the EXACT values (match cosine_topk's for the same
    pairs); indivisible dims raise."""
    import numpy as np
    import pytest as _pytest

    from southpaw_spark.operators.similarity import cosine_topk, pq_topk

    rng = np.random.default_rng(42)
    rows = []
    for i in range(60):
        v = rng.standard_normal(32)
        rows.append((i, [float(x) for x in v]))
        if i < 5:  # planted: id 100+i is a near-copy of query i
            rows.append(
                (100 + i, [float(x) for x in v + rng.normal(0, 0.01, 32)])
            )
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = pq_topk(
        corpus, queries, "embedding", "vec_id",
        k=3, m_subspaces=4, n_codes=16, oversample=4,
    )
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in got.collect() if r["rank"] == 1
    }
    assert top1 == {i: 100 + i for i in range(5)}
    # exact-rescore contract: every reported cosine equals the exact
    # cosine_topk value for that (query, neighbor) pair
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk(
            corpus, queries, "embedding", "vec_id", k=30
        ).collect()
    }
    for r in got.collect():
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]
    with _pytest.raises(ValueError, match="divisible"):
        pq_topk(corpus, queries, "embedding", "vec_id", m_subspaces=5)


def test_jaccard_contamination_edited_copies(spark):
    """d21: an edited copy of a benchmark item (words dropped/replaced
    — zero exact containment windows of the full doc needed) is
    flagged with the right bench id; unrelated docs pass; an exact
    duplicate benchmark entry ties to the smaller bench id; sub-n-word
    docs carry no evidence and are never flagged."""
    from southpaw_spark.operators.dedup import jaccard_contamination

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame(
        [
            (1, base),                                   # edited bench copy
            (2, "completely different words about other topics entirely here"),
            (3, "hi"),                                   # < n words
        ],
        "doc_id long, text string",
    )
    edited = " ".join(base.split()[2:])  # benchmark = doc 1 minus 2 words
    bench = spark.createDataFrame(
        [(100, edited), (200, edited), (300, "unrelated benchmark item text")],
        "bench_id long, bench_text string",
    )
    out = {
        r["doc_id"]: (r["bench_id"], r["jaccard"])
        for r in jaccard_contamination(
            corpus, bench, "text", "doc_id",
            n=3, threshold=0.5,
            bench_text_col="bench_text", bench_id_col="bench_id",
        ).collect()
    }
    assert set(out) == {1}
    bid, j = out[1]
    assert bid == 100          # tie between 100 and 200 -> smaller id
    assert 0.5 <= j < 1.0      # high overlap, not identical


def test_pq_topk_empty_or_null_corpus_raises_clearly(spark):
    """r10-ADVICE regression: the dimension probe must fail with a
    descriptive ValueError on an empty corpus or a NULL first vector,
    not an opaque TypeError."""
    import pytest

    from southpaw_spark.operators.similarity import pq_topk

    queries = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty|NULL"):
        pq_topk(empty, queries, "embedding", "vec_id")
    nullv = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty|NULL"):
        pq_topk(nullv, queries, "embedding", "vec_id")


def test_duplicate_lines_inventory_and_removal(spark):
    """d22 (RefinedWeb repeated-line removal): corpus-global line
    counts — self-repeats count, empty lines never do — and the
    rewrite drops EVERY occurrence of a duplicated line while clean
    docs pass through untouched."""
    import pytest

    from southpaw_spark.operators.dedup import (
        duplicate_lines,
        remove_duplicate_lines,
    )

    docs = spark.createDataFrame(
        [
            (1, "keep me\ncookie banner\nunique line one"),
            (2, "cookie banner\n\nunique line two"),
            (3, "cookie banner\ncookie banner\nself repeat page"),
            (4, "totally clean doc"),
            (5, "cookie banner"),
        ],
        "doc_id long, text string",
    )
    inv = {
        r["line"]: r["n_occurrences"]
        for r in duplicate_lines(docs, "text", "doc_id").collect()
    }
    assert inv == {"cookie banner": 5}
    out = {
        r["doc_id"]: (
            r["text_clean"], r["n_lines_before"], r["n_lines_after"],
            r["n_tokens_after"],
        )
        for r in remove_duplicate_lines(docs, "text", "doc_id").collect()
    }
    # n_tokens_after is the module's split-on-single-space count of the
    # CLEAN text ("me\nunique" is one unit — the t02/t05 contract)
    assert out[1] == ("keep me\nunique line one", 3, 2, 4)
    assert out[2] == ("\nunique line two", 3, 2, 3)  # empty line survives
    assert out[3] == ("self repeat page", 3, 1, 3)   # self-repeat removed
    assert out[4] == ("totally clean doc", 1, 1, 3)  # untouched
    assert out[5] == ("", 1, 0, 0)                   # fully boilerplate
    # higher threshold: nothing reaches min_count=6 -> all pass through
    untouched = remove_duplicate_lines(
        docs, "text", "doc_id", min_count=6
    )
    assert untouched.where(
        F.col("text_clean") != F.col("text")
    ).count() == 0
    with pytest.raises(ValueError, match="min_count"):
        duplicate_lines(docs, "text", "doc_id", min_count=1)


def test_blocklist_hits_and_filter(spark):
    """t24: suffix-chain domain matching — exact host, subdomain,
    case/port/www noise — identical between the list (codegen) and
    DataFrame (broadcast join) forms; include_subdomains=False matches
    exact hosts only; empty blocklists and unparseable hosts behave."""
    import pytest

    from southpaw_spark.operators.text import (
        blocklist_filter,
        blocklist_hits,
        host_suffixes,
        url_host,
    )

    docs = spark.createDataFrame(
        [
            (1, "https://WWW.Site3.Example.com:443/page?x=1"),
            (2, "http://cdn.site3.example.com/asset.js"),
            (3, "https://site4.example.com/ok"),
            (4, "https://ads.example.net/track"),
            (5, "not a url"),
            (6, "https://example.net"),
            (7, None),  # r11-ADVICE: NULL url must pass through BOTH arms
        ],
        "doc_id long, url string",
    )
    blocked = ["Site3.example.com ", "example.net"]
    hits = sorted(
        tuple(r)
        for r in blocklist_hits(docs, "url", "doc_id", blocked).collect()
    )
    assert hits == [
        (1, "www.site3.example.com", "site3.example.com"),
        (2, "cdn.site3.example.com", "site3.example.com"),
        (4, "ads.example.net", "example.net"),
        (6, "example.net", "example.net"),
    ]
    kept = sorted(
        r["doc_id"]
        for r in blocklist_filter(docs, "url", "doc_id", blocked).collect()
    )
    # unparseable host (5) AND NULL url (7) pass through — the list
    # arm's arrays_overlap is NULL on a NULL host and must not let
    # where() drop the row (r11-ADVICE regression)
    assert kept == [3, 5, 7]
    bdf = spark.createDataFrame([(d,) for d in blocked], "host string")
    assert hits == sorted(
        tuple(r)
        for r in blocklist_hits(docs, "url", "doc_id", bdf).collect()
    )
    assert kept == sorted(
        r["doc_id"]
        for r in blocklist_filter(docs, "url", "doc_id", bdf).collect()
    )
    exact_only = sorted(
        r["doc_id"]
        for r in blocklist_filter(
            docs, "url", "doc_id", blocked, include_subdomains=False
        ).collect()
    )
    assert exact_only == [1, 2, 3, 4, 5, 7]  # only the bare example.net hit
    with pytest.raises(ValueError, match="empty"):
        blocklist_filter(docs, "url", "doc_id", [])
    # helper sanity: suffix chain is most-specific-first and complete
    row = docs.select(
        host_suffixes(url_host(F.col("url"))).alias("s")
    ).where(F.col("doc_id") == 2).collect()[0]["s"]
    assert row == [
        "cdn.site3.example.com", "site3.example.com", "example.com", "com"
    ]


def test_pack_sequences_materializes_training_examples(spark):
    """t25: packs concatenate member docs in id order with the
    separator, boundaries follow sequence_packing exactly, n_tokens
    excludes separators, and the plan pays ONE exchange (the group-by
    reuses the window's shard partitioning)."""
    from southpaw_spark.operators.text import (
        pack_sequences,
        sequence_packing,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en"), (2, "d e", "en"), (3, "f g h i", "en"),
            (4, "x y z w v", "fr"), (5, "q", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        (r["lang"], r["pack_id"]): (r["n_docs"], r["n_tokens"], r["text"])
        for r in pack_sequences(
            docs, "text", "doc_id", "lang", token_budget=5, separator="|"
        ).collect()
    }
    assert out == {
        ("en", 0): (2, 5, "a b c|d e"),
        ("en", 1): (1, 4, "f g h i"),
        ("fr", 0): (1, 5, "x y z w v"),
        ("fr", 1): (1, 1, "q"),
    }
    # assignment parity with sequence_packing
    assign = {
        r["doc_id"]: r["pack_id"]
        for r in sequence_packing(
            docs, "text", "doc_id", "lang", token_budget=5
        ).collect()
    }
    assert assign == {1: 0, 2: 0, 3: 1, 4: 0, 5: 1}
    plan = (
        pack_sequences(docs, "text", "doc_id", "lang", token_budget=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1


def test_epoch_repeat_deterministic_upsampling(spark):
    """t26: floor(f) guaranteed copies + exact-threshold fractional
    extra; f<1 downsamples; f=0 drops; default stratum x1; identical
    output across reruns; negative factors rejected."""
    import pytest

    from pyspark.sql import functions as F

    from southpaw_spark.operators.text import epoch_repeat

    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("zz"), F.lit("xx")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )
    out = epoch_repeat(
        docs, "doc_id", "lang", {"en": 2.5, "fr": 0.5, "zz": 0.0},
        salt="s",
    )
    per = {
        (r["lang"]): (r["mn"], r["mx"], r["total"])
        for r in out.groupBy("doc_id", "lang").count()
        .groupBy("lang")
        .agg(F.min("count").alias("mn"), F.max("count").alias("mx"),
             F.sum("count").alias("total"))
        .collect()
    }
    assert per["en"][0] == 2 and per["en"][1] == 3   # 2 or 3 copies
    assert per["fr"][0] == 1 and per["fr"][1] == 1   # survivors get 1
    assert "zz" not in per                           # f=0 drops all
    assert per["xx"] == (1, 1, 100)                  # default x1
    assert 200 < per["en"][2] < 300                  # ~2.5 * 100
    assert 20 < per["fr"][2] < 80                    # ~0.5 * 100
    # copy_idx is dense 0..n-1 per doc
    bad = out.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_idx")).alias("c"),
        F.count("*").alias("n"),
    ).where(
        F.col("c") != F.transform(
            F.sequence(F.lit(0), F.col("n").cast("int") - 1),
            lambda i: i.cast("int"),
        )
    ).count()
    assert bad == 0
    rerun = epoch_repeat(
        docs, "doc_id", "lang", {"en": 2.5, "fr": 0.5, "zz": 0.0},
        salt="s",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, rerun.collect())
    )
    with pytest.raises(ValueError, match="repeat factor"):
        epoch_repeat(docs, "doc_id", "lang", {"en": -1.0})


def test_pq_index_build_query_parity(spark, tmp_path):
    """Persisted PQ index == one-shot pq_topk with the same geometry
    (build-once/query-many, FAISS IndexPQ shape): identical rows for
    the same corpus/queries; geometry errors surface at build."""
    import pytest

    from southpaw_spark.operators.ann_index import (
        build_pq_index,
        query_pq_index,
    )
    from southpaw_spark.operators.similarity import pq_topk

    def vec(i, dim=8):
        return [((i * 31 + j * 17) % 97 - 48) / 48.0 for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100 + i, vec(i * 7 + 3)) for i in range(4)],
        "query_id long, query_vec array<double>",
    )
    meta = build_pq_index(
        corpus, str(tmp_path / "pq"), "embedding", "vec_id",
        m_subspaces=4, n_codes=8,
    )
    assert {k: meta[k] for k in ("dim", "m_subspaces", "n_codes")} == {
        "dim": 8, "m_subspaces": 4, "n_codes": 8,
    }
    # round 14: the build also records the drift guard's baseline
    assert meta["baseline_residual"] >= 0.0
    got = sorted(tuple(r) for r in query_pq_index(
        spark, str(tmp_path / "pq"), corpus, queries,
        "embedding", "vec_id", k=3,
    ).collect())
    want = sorted(tuple(r) for r in pq_topk(
        corpus, queries, "embedding", "vec_id", k=3,
        m_subspaces=4, n_codes=8,
    ).collect())
    assert got == want and len(got) == 12
    with pytest.raises(ValueError, match="divisible"):
        build_pq_index(
            corpus, str(tmp_path / "pq2"), "embedding", "vec_id",
            m_subspaces=3,
        )
    with pytest.raises(ValueError, match="codebooks"):
        pq_topk(
            corpus, queries, "embedding", "vec_id",
            codes=spark.createDataFrame(
                [], "neighbor_id long, m int, code int"
            ),
        )


def test_pq_index_incremental_add_parity(spark, tmp_path):
    """build(A) + add(B) answers queries identically to build(A∪B)
    with the same (stored) codebooks — the continuous-ingest contract,
    symmetric with the LSH index's add_to_ann_index."""
    from southpaw_spark.operators.ann_index import (
        add_to_pq_index,
        build_pq_index,
        query_pq_index,
    )

    def vec(i, dim=8):
        return [((i * 29 + j * 13) % 89 - 44) / 44.0 for j in range(dim)]

    a = spark.createDataFrame(
        [(i, vec(i)) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(i, vec(i)) for i in range(50, 80)],
        "vec_id long, embedding array<double>",
    )
    both = a.unionByName(b)
    queries = spark.createDataFrame(
        [(200 + i, vec(i * 11 + 5)) for i in range(3)],
        "query_id long, query_vec array<double>",
    )
    build_pq_index(a, str(tmp_path / "inc"), "embedding", "vec_id",
                   m_subspaces=4, n_codes=8)
    add_to_pq_index(b, str(tmp_path / "inc"), "embedding", "vec_id")
    got = sorted(tuple(r) for r in query_pq_index(
        spark, str(tmp_path / "inc"), both, queries,
        "embedding", "vec_id", k=4,
    ).collect())
    # full rebuild with the SAME codebooks (the stored ones come from
    # A's smallest ids; A ∪ B has the same smallest ids, so the default
    # rule regenerates them identically here)
    build_pq_index(both, str(tmp_path / "full"), "embedding", "vec_id",
                   m_subspaces=4, n_codes=8)
    want = sorted(tuple(r) for r in query_pq_index(
        spark, str(tmp_path / "full"), both, queries,
        "embedding", "vec_id", k=4,
    ).collect())
    assert got == want and len(got) == 12


def test_round11_operators_empty_input_behavior(spark):
    """Every round-11 operator degrades to an empty (not erroring)
    result on empty input, and the LM-based ops return empty when no
    doc carries bigram evidence."""
    from southpaw_spark.operators.dedup import (
        duplicate_lines,
        remove_duplicate_lines,
    )
    from southpaw_spark.operators.text import (
        blocklist_filter,
        epoch_repeat,
        pack_sequences,
        perplexity_buckets,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert duplicate_lines(empty, "text", "doc_id").count() == 0
    assert remove_duplicate_lines(empty, "text", "doc_id").count() == 0
    e2 = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert pack_sequences(e2, "text", "doc_id", "lang").count() == 0
    assert epoch_repeat(e2, "doc_id", "lang", {"en": 2.0}).count() == 0
    assert perplexity_buckets(e2, "text", "doc_id", "lang").count() == 0
    e3 = spark.createDataFrame([], "doc_id long, url string")
    assert blocklist_filter(e3, "url", "doc_id", ["x.com"]).count() == 0
    one = spark.createDataFrame(
        [(1, "solo")], "doc_id long, text string"
    ).withColumn("lang", F.lit("en"))
    # a 1-word doc has no transition evidence -> excluded, empty result
    assert perplexity_buckets(one, "text", "doc_id", "lang").count() == 0


def test_ann_recall_semantics(spark):
    """s10: recall@k counts the approx∩exact overlap per query, missing
    queries score 0, ranks beyond k are ignored, k<1 rejected."""
    import pytest

    from southpaw_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3),
         (1, 99, 4)],  # rank 4 ignored at k=3
        "query_id long, neighbor_id long, rank long",
    )
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 2), (1, 77, 3),
         (1, 11, 4)],  # 11 found only at rank 4 -> not in top-3
        "query_id long, neighbor_id long, rank long",
    )
    out = {
        r["query_id"]: (r["n_hits"], r["recall"])
        for r in ann_recall(approx, exact, k=3).collect()
    }
    assert out == {1: (2, 0.666667), 2: (0, 0.0)}
    with pytest.raises(ValueError, match="k"):
        ann_recall(approx, exact, k=0)


def test_classify_language_trained_and_impl_parity(spark):
    """t28 (round-12): train_language_id recovers a fully separable
    labeled corpus exactly; classify_language's explode and hof twins
    agree doc-for-doc; empty docs take the constant bias argmax; ties
    break to the lexicographically smallest language; bad configs fail
    up front."""
    import pytest

    from southpaw_spark.operators.text import (
        classify_language,
        train_language_id,
    )

    vocab = {
        "en": ["the", "and", "of", "house", "river"],
        "fr": ["le", "la", "et", "maison", "fleuve"],
        "de": ["der", "und", "das", "haus", "fluss"],
    }
    import random

    rng = random.Random(7)
    rows = []
    i = 0
    for lang, words in vocab.items():
        for _ in range(30):
            rows.append(
                (i, " ".join(rng.choice(words) for _ in range(12)), lang)
            )
            i += 1
    labeled = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    models, biases = train_language_id(labeled, "text", "lang")
    assert sorted(models) == ["de", "en", "fr"]
    assert all(len(w) == 64 for w in models.values())

    got = {
        r["doc_id"]: r["lang_pred"]
        for r in classify_language(
            labeled, "text", "doc_id", models, biases,
            out_col="lang_pred",
        ).collect()
    }
    assert got == {i: lang for i, _, lang in rows}  # exact recovery

    # impl parity on a frame with an empty doc and a tie doc
    probe = spark.createDataFrame(
        [(100, "the house and river"), (101, ""), (102, "zzz qqq")],
        "doc_id long, text string",
    )
    ex = {
        r["doc_id"]: r["lang_pred"]
        for r in classify_language(
            probe, "text", "doc_id", models, biases, out_col="lang_pred"
        ).collect()
    }
    hf = {
        r["doc_id"]: r["lang_pred"]
        for r in classify_language(
            probe, "text", "doc_id", models, biases,
            out_col="lang_pred", impl="hof",
        ).collect()
    }
    assert ex == hf
    assert ex[100] == "en"
    # empty doc: constant argmax over biases alone (equal doc counts ->
    # equal biases -> smallest language name)
    assert ex[101] == min(biases, key=lambda l: (-biases[l], l))

    # labels_only (the one-exchange round-13 plan): same labels for
    # every doc INCLUDING the zero-token one (explode_outer path),
    # exactly two output columns, both impls
    for impl in ("explode", "hof"):
        lo = classify_language(
            probe, "text", "doc_id", models, biases,
            out_col="lang_pred", impl=impl, labels_only=True,
        )
        assert lo.columns == ["doc_id", "lang_pred"]
        assert {r["doc_id"]: r["lang_pred"] for r in lo.collect()} == ex

    # exact tie -> lexicographically smallest language
    tie = {
        r["doc_id"]: r["p"]
        for r in classify_language(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            "text", "doc_id",
            {"bb": [1.0], "aa": [1.0]}, None, out_col="p",
        ).collect()
    }
    assert tie[1] == "aa"

    with pytest.raises(ValueError, match="same non-zero"):
        classify_language(
            probe, "text", "doc_id", {"en": [1.0], "fr": [1.0, 2.0]}
        )
    with pytest.raises(ValueError, match=">= 1 language"):
        classify_language(probe, "text", "doc_id", {})
    with pytest.raises(ValueError, match="impl"):
        classify_language(
            probe, "text", "doc_id", {"en": [1.0]}, impl="pandas"
        )


def test_build_corpus_lang_model_replaces_heuristic(spark):
    """build_corpus(lang_model=...) routes every lang-keyed stage
    through the trained classifier: lang_guess carries the trained
    labels and the langs gate filters on them."""
    from southpaw_spark.operators.text import train_language_id
    from southpaw_spark.pipelines import build_corpus

    rows = [
        (1, "the house and the river of the house", "en"),
        (2, "le fleuve et la maison et le fleuve", "fr"),
        (3, "der fluss und das haus und der fluss", "de"),
        (4, "la maison et le fleuve et la maison", "fr"),
    ]
    labeled = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    models, biases = train_language_id(labeled, "text", "lang")
    kept, _ = build_corpus(
        labeled.drop("lang"), lang_model=models, lang_biases=biases,
        langs=["fr"], exact_dedup=False, collect_report=False,
    )
    got = {(r["doc_id"], r["lang_guess"]) for r in kept.collect()}
    assert got == {(2, "fr"), (4, "fr")}


def test_index_delete_and_vacuum_parity(spark, sf_dir, tmp_path):
    """Round-12 (VERDICT r11 item 7): build → remove → query answers
    EXACTLY like a rebuild on the survivors, for BOTH index stores —
    first through the tombstone anti-join, then again after vacuum has
    folded the tombstones into the data files (and dropped them).
    Removing a never-indexed id is a no-op."""
    from southpaw_spark.operators.ann_index import (
        build_ann_index,
        build_pq_index,
        query_ann_index,
        query_pq_index,
        remove_from_index,
        vacuum_ann_index,
        vacuum_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dead_ids = emb.where(F.col("vec_id") % 5 == 0).select("vec_id")
    survivors = emb.where(F.col("vec_id") % 5 != 0)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    # --- LSH store
    live = str(tmp_path / "lsh_live")
    build_ann_index(emb, live, "embedding", "vec_id", n_planes=6, seed=42)
    remove_from_index(dead_ids, live, "vec_id")
    remove_from_index(  # never-indexed ids: no-op
        spark.createDataFrame([(10**9,)], "vec_id long"), live, "vec_id"
    )
    want_dir = str(tmp_path / "lsh_want")
    build_ann_index(
        survivors, want_dir, "embedding", "vec_id", n_planes=6, seed=42
    )

    def lsh_rows(d):
        return sorted(
            tuple(r) for r in query_ann_index(spark, d, queries, k=5)
            .collect()
        )

    want = lsh_rows(want_dir)
    assert lsh_rows(live) == want and want
    n = vacuum_ann_index(spark, live)
    assert n == dead_ids.count() + 1
    assert lsh_rows(live) == want
    # tombstones folded: no _deleted dir, and no dead id in the data
    import os as _os

    assert not _os.path.isdir(_os.path.join(live, "_deleted"))
    left = spark.read.parquet(live).select("neighbor_id").distinct()
    assert left.join(dead_ids, left["neighbor_id"] == dead_ids["vec_id"]
                     ).count() == 0
    assert vacuum_ann_index(spark, live) == 0  # idempotent no-op

    # --- PQ store (same tombstone layout)
    def vec(i, dim=8):
        return [((i * 29 + j * 13) % 89 - 44) / 44.0 for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    pq_dead = corpus.where(F.col("vec_id") % 4 == 0).select("vec_id")
    pq_surv = corpus.where(F.col("vec_id") % 4 != 0)
    pq_q = spark.createDataFrame(
        [(200 + i, vec(i * 11 + 5)) for i in range(3)],
        "query_id long, query_vec array<double>",
    )
    pq_live = str(tmp_path / "pq_live")
    build_pq_index(corpus, pq_live, "embedding", "vec_id",
                   m_subspaces=4, n_codes=8)
    remove_from_index(pq_dead, pq_live, "vec_id")
    # rebuild on survivors with the SAME stored codebooks: pass them in
    cb = spark.read.parquet(f"{pq_live}/codebooks")
    pq_want = str(tmp_path / "pq_want")
    build_pq_index(pq_surv, pq_want, "embedding", "vec_id",
                   m_subspaces=4, n_codes=8, codebooks=cb)

    def pq_rows(d, c):
        return sorted(
            tuple(r) for r in query_pq_index(
                spark, d, c, pq_q, "embedding", "vec_id", k=4
            ).collect()
        )

    pqw = pq_rows(pq_want, pq_surv)
    assert pq_rows(pq_live, pq_surv) == pqw and pqw
    assert vacuum_pq_index(spark, pq_live) == pq_dead.count()
    assert pq_rows(pq_live, pq_surv) == pqw
    assert not _os.path.isdir(_os.path.join(pq_live, "_deleted"))
    assert vacuum_pq_index(spark, pq_live) == 0


def test_round12_operators_empty_input_behavior(spark):
    """Round-12 surface degrades cleanly on empty input: the classifier
    returns an empty frame (both impls), the trainer refuses a corpus
    with no tokens, and an all-empty-text frame classifies every row to
    the constant bias argmax."""
    import pytest

    from southpaw_spark.operators.text import (
        classify_language,
        train_language_id,
    )

    models = {"en": [0.5] * 8, "fr": [0.25] * 8}
    empty = spark.createDataFrame([], "doc_id long, text string")
    for impl in ("explode", "hof"):
        assert classify_language(
            empty, "text", "doc_id", models, impl=impl
        ).count() == 0
    blank = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["lang_guess"]
        for r in classify_language(blank, "text", "doc_id", models).collect()
    }
    assert out == {1: "en", 2: "en"}  # zero biases -> smallest name
    with pytest.raises(ValueError, match="no tokens"):
        train_language_id(
            spark.createDataFrame([(1, "", "en")],
                                  "doc_id long, text string, lang string"),
            "text", "lang",
        )


def test_corpus_profile_hand_computed(spark):
    """t29: stats report against hand-computed values — duplication
    rate, exact ceil-rank p50/p90 (ties ordered by (tokens, id)),
    global __all__ stratum when no stratum column, empty corpus →
    empty report."""
    from southpaw_spark.operators.text import corpus_profile

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en"),        # 3 tokens
            (2, "a b c", "en"),        # exact dup of 1
            (3, "d e", "en"),          # 2 tokens
            (4, "f g h i j", "en"),    # 5 tokens
            (5, "solo", "de"),         # 1 token
        ],
        "doc_id long, text string, lang string",
    )
    rows = {
        r["stratum"]: r.asDict()
        for r in corpus_profile(docs, "text", "doc_id", "lang").collect()
    }
    en = rows["en"]
    assert (en["n_docs"], en["n_tokens"], en["n_distinct"]) == (4, 13, 3)
    assert en["dup_rate"] == 0.25
    assert en["avg_tokens"] == 3.25
    assert en["max_tokens"] == 5
    # sorted tokens: [2, 3, 3, 5]; ceil(.5*4)=2 -> 3; ceil(.9*4)=4 -> 5
    assert (en["p50_tokens"], en["p90_tokens"]) == (3, 5)
    de = rows["de"]
    assert (de["n_docs"], de["p50_tokens"], de["p90_tokens"]) == (1, 1, 1)

    g = corpus_profile(docs, "text", "doc_id").collect()
    assert len(g) == 1 and g[0]["stratum"] == "__all__"
    assert g[0]["n_docs"] == 5 and g[0]["n_distinct"] == 4

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert corpus_profile(empty, "text", "doc_id").count() == 0


# ---------------------------------------------------------------------------
# t30: Gopher quality rules
# ---------------------------------------------------------------------------

def _gopher_frame(spark):
    good = ("the quick brown fox jumps to the lair of dogs " * 6).strip()
    bullets = "\n".join(f"- item{i} thing here" for i in range(20))
    ellipses = "\n".join(
        f"some sentence number {i} trails off..." for i in range(15)
    )
    hashes = "the " + "#tag " * 60 + "of and that"
    nostop = "zebra quagga okapi gnu " * 15
    return spark.createDataFrame(
        [
            (1, good),
            (2, "too short"),
            (3, bullets),
            (4, ellipses),
            (5, hashes),
            (6, nostop.strip()),
            (7, ""),
            (8, "   \n   "),
        ],
        "doc_id long, text string",
    )


def test_gopher_quality_rules(spark):
    from southpaw_spark.operators.text import gopher_quality

    out = {
        r.doc_id: r
        for r in gopher_quality(
            _gopher_frame(spark), "text", "doc_id"
        ).collect()
    }
    assert out[1].gopher_pass  # 60 words, 3 stopword kinds, clean
    assert out[1].n_words == 60
    assert out[1].n_stopword_hits == 3  # the, to, of
    assert out[1].alpha_word_frac == 1.0

    assert not out[2].gopher_pass  # word count < 50
    assert out[2].n_words == 2

    assert not out[3].gopher_pass
    assert out[3].bullet_line_frac == 1.0  # every line bulleted

    assert not out[4].gopher_pass
    assert out[4].ellipsis_line_frac == 1.0  # every line trails off

    assert not out[5].gopher_pass
    assert out[5].symbol_word_ratio > 0.1  # '#' per word over budget

    assert not out[6].gopher_pass
    assert out[6].n_stopword_hits == 0

    # zero-word docs: NULL ratios, explicit fail (not NULL pass)
    for did in (7, 8):
        assert out[did].n_words == 0
        assert out[did].mean_word_len is None
        assert out[did].gopher_pass is False


def test_gopher_quality_line_and_whitespace_tokenization(spark):
    """Words split on ANY whitespace run (newlines must not glue
    words), lines on newline with blank lines ignored."""
    from southpaw_spark.operators.text import gopher_quality

    df = spark.createDataFrame(
        [(1, "alpha\nbeta  gamma\n\n  \ndelta\teps")],
        "doc_id long, text string",
    )
    r = gopher_quality(df, "text", "doc_id").collect()[0]
    assert r.n_words == 5
    # 3 non-empty lines, none bulleted
    assert r.bullet_line_frac == 0.0


def test_gopher_filter_keeps_all_columns(spark):
    from southpaw_spark.operators.text import gopher_filter

    df = _gopher_frame(spark).withColumn("extra", F.lit("x"))
    kept = gopher_filter(df, "text", "doc_id")
    assert kept.columns == df.columns
    assert [r.doc_id for r in kept.collect()] == [1]
    # relaxed thresholds let the short doc through
    relaxed = gopher_filter(
        df, "text", "doc_id", min_words=2, min_stopword_hits=0,
        min_alpha_frac=0.0,
    )
    assert {r.doc_id for r in relaxed.collect()} >= {1, 2}


def test_gopher_repetition_metrics(spark):
    from southpaw_spark.operators.text import gopher_repetition

    df = spark.createDataFrame(
        [
            # "the cat sat on the mat" twice + glue: heavy 5-gram dups
            (1, "the cat sat on the mat and the dog ran to "
                "the cat sat on the mat"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "dup line\nunique a\ndup line\nunique b"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_repetition(df, "text", "doc_id").collect()}

    # doc 2: all 10 words unique; char_base = 39 + 9 = 48; every gram
    # unique so top-2gram = smallest gram "eight nine" (10 chars)
    assert out[2].top_2gram_char_frac == round(10 / 48, 6)
    assert out[2].dup_5gram_char_frac == 0.0
    assert out[2].repetition_pass is False  # 10/48 > 0.20? no — check
    # 10/48 = 0.208333 > 0.20 threshold → fails top_2gram

    # doc 1: repeated 6-word span → clamped dup fractions
    assert out[1].dup_5gram_char_frac == 1.0
    assert out[1].repetition_pass is False

    # doc 3: "dup line" appears twice in 4 lines
    assert out[3].dup_line_frac == 0.25
    assert out[3].dup_line_char_frac == 0.25

    # empty doc: NULL metrics, explicit fail
    assert out[4].dup_line_frac is None
    assert out[4].top_2gram_char_frac is None
    assert out[4].repetition_pass is False


def test_gopher_repetition_tie_break_and_thresholds(spark):
    from southpaw_spark.operators.text import gopher_repetition

    # two 2-grams tie at count 2: "b b" and "a a"? construct:
    # words: a a b b a a b b → 2-grams: (a a)x2? sequence: a a, a b,
    # b b, b a, a a, a b, b b → "a a":2, "a b":2, "b b":2, "b a":1 →
    # tie at 2 → smallest gram "a a" (len 3)
    df = spark.createDataFrame(
        [(1, "a a b b a a b b")], "doc_id long, text string"
    )
    r = gopher_repetition(df, "text", "doc_id").collect()[0]
    # char_base = 8 + 7 = 15; top = 2 * len("a a") = 6 → 0.4
    assert r.top_2gram_char_frac == 0.4
    # relaxed thresholds flip the verdict
    relaxed = gopher_repetition(
        df, "text", "doc_id",
        thresholds={k: 1.0 for k in (
            "top_2gram_char_frac", "top_3gram_char_frac",
            "top_4gram_char_frac", "dup_5gram_char_frac",
            "dup_6gram_char_frac", "dup_7gram_char_frac",
            "dup_8gram_char_frac", "dup_9gram_char_frac",
            "dup_10gram_char_frac")},
    ).collect()[0]
    assert relaxed.repetition_pass is True
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown repetition"):
        gopher_repetition(df, "text", "doc_id", thresholds={"nope": 1.0})


def test_chunk_documents_windows(spark):
    from southpaw_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    rows = (
        chunk_documents(df, "text", "doc_id", max_tokens=4, stride=3)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    got = [(r.doc_id, r.chunk_id, r.chunk, r.chunk_tokens) for r in rows]
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),  # stride 3 < max 4 → 1-word overlap
        (1, 2, "g h i j", 4),
        (2, 0, "x y", 2),      # short doc: one short window
        (3, 0, "", 1),         # '' is one empty token (module convention)
    ]
    # disjoint default stride
    disjoint = chunk_documents(df, "text", "doc_id", max_tokens=4).where(
        "doc_id = 1"
    )
    assert [r.chunk for r in disjoint.orderBy("chunk_id").collect()] == [
        "a b c d", "e f g h", "i j",
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, "text", "doc_id", max_tokens=4, stride=5)
    with _pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, "text", "doc_id", max_tokens=0)


def test_centroid_outlier_scores(spark):
    from southpaw_spark.operators.similarity import centroid_outlier_scores

    # cluster around +e0 with one planted opposite-direction outlier
    rows = [(i, [1.0, 0.1 * (i % 3), 0.0], "a") for i in range(5)]
    rows.append((99, [-1.0, 0.0, 0.0], "a"))
    rows.append((7, [0.0, 1.0, 0.0], "b"))  # singleton group
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {
        r.vec_id: r
        for r in centroid_outlier_scores(
            df, "embedding", "vec_id", "label"
        ).collect()
    }
    assert out[99].outlier_rank == 1  # the planted outlier ranks first
    assert out[99].centroid_cosine < 0
    assert all(out[i].centroid_cosine > 0.8 for i in range(5))
    # a singleton group's vector IS its centroid: cosine 1, rank 1
    assert out[7].centroid_cosine == 1.0 and out[7].outlier_rank == 1
    # ranks are a permutation of 1..n within each group
    assert sorted(
        r.outlier_rank for r in out.values() if r.label == "a"
    ) == [1, 2, 3, 4, 5, 6]

    # global mode (no group): same machinery, one centroid
    g = centroid_outlier_scores(df, "embedding", "vec_id")
    assert g.count() == 7
    assert sorted(r.outlier_rank for r in g.collect()) == list(range(1, 8))


def test_ann_index_streaming_ingest_parity(spark, sf_dir, tmp_path):
    """Round-13 streaming-ingest arm: build(A) + attach_index_stream(B
    over several micro-batches, one delete carried as a tombstone row)
    answers queries identically to build on the surviving A∪B; a fresh
    checkpoint replaying the same source overwrites the same batch
    dirs (exactly-once adds, no duplicate candidates); vacuum folds the
    staging batches + tombstones into the main layout and answers stay
    identical."""
    import os

    from southpaw_spark.operators.ann_index import (
        attach_index_stream,
        build_ann_index,
        query_ann_index,
        vacuum_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    part_a = emb.where(F.col("vec_id") % 2 == 0)
    part_b = emb.where(F.col("vec_id") % 2 == 1)
    dead_id = part_a.select(F.max("vec_id")).first()[0]  # delete via stream
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    truth = str(tmp_path / "truth")
    build_ann_index(
        emb.where(F.col("vec_id") != dead_id), truth,
        "embedding", "vec_id", n_planes=6, seed=42,
    )

    live = str(tmp_path / "live")
    build_ann_index(part_a, live, "embedding", "vec_id", n_planes=6, seed=42)
    # file-replayed stream: B as adds + the tombstone row for dead_id
    src = str(tmp_path / "src")
    part_b.withColumn("is_tombstone", F.lit(False)).unionByName(
        emb.where(F.col("vec_id") == dead_id).withColumn(
            "is_tombstone", F.lit(True)
        )
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")  # several micro-batches
            .parquet(src)
        )
        q = attach_index_stream(
            stream, live, "embedding", "vec_id",
            checkpoint_dir=str(tmp_path / ckpt),
            tombstone_col="is_tombstone",
            trigger={"availableNow": True},
        )
        q.awaitTermination(180)

    drain("ckpt1")

    def rows(d):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in query_ann_index(spark, d, queries, k=5).collect()
        )

    want = rows(truth)
    assert rows(live) == want and want
    # the deleted id never answers, and streamed ids DO answer
    assert all(n != dead_id for _, n, _, _ in rows(live))
    assert any(n % 2 == 1 for _, n, _, _ in rows(live))

    # replay: a FRESH checkpoint re-delivers every batch with the same
    # ids — the overwrite layout absorbs it with zero duplicates
    drain("ckpt2")
    assert rows(live) == want

    # fold staging + tombstones into the main layout; answers unchanged
    removed = vacuum_ann_index(spark, live)
    assert removed == 1
    assert not os.path.isdir(os.path.join(live, "_stream"))
    assert not os.path.isdir(os.path.join(live, "_deleted"))
    assert rows(live) == want

    # stream-only staging (no tombstones): vacuum still folds it (the
    # old swap would have DROPPED un-compacted staging rows) and
    # reports 0 removed
    live2 = str(tmp_path / "live2")
    build_ann_index(
        part_a, live2, "embedding", "vec_id", n_planes=6, seed=42
    )
    src2 = str(tmp_path / "src2")
    part_b.write.parquet(src2)
    s2 = spark.readStream.schema(spark.read.parquet(src2).schema).parquet(src2)
    q2 = attach_index_stream(
        s2, live2, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt3"),
        trigger={"availableNow": True},
    )
    q2.awaitTermination(180)
    assert vacuum_ann_index(spark, live2) == 0
    assert not os.path.isdir(os.path.join(live2, "_stream"))
    full = str(tmp_path / "full2")
    build_ann_index(emb, full, "embedding", "vec_id", n_planes=6, seed=42)
    assert rows(live2) == rows(full)


def test_zero_vectors_never_crash_retrieval(spark, tmp_path):
    """Round-13 ANSI hardening: a zero-norm (garbage) embedding in a
    100 TB corpus must not kill the job under ANSI division-by-zero.
    try_divide gives it a NULL cosine: it never enters a top-k (NULLs
    sort last descending), a zero QUERY returns no neighbors instead of
    crashing, and the near-dup pair op skips it (NULL >= threshold is
    not true)."""
    from southpaw_spark.operators.ann_index import (
        build_ann_index,
        query_ann_index,
    )
    from southpaw_spark.operators.dedup import embedding_near_duplicates
    from southpaw_spark.operators.similarity import cosine_topk, ivf_topk

    def vec(i, dim=6):
        return [((i * 31 + j * 17) % 97 - 48) / 48.0 for j in range(dim)]

    rows = [(i, vec(i)) for i in range(30)] + [(99, [0.0] * 6)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(0, vec(0)), (98, [0.0] * 6)],
        "query_id long, query_vec array<double>",
    )

    for out in (
        cosine_topk(corpus, queries, "embedding", "vec_id", k=5),
        ivf_topk(corpus, queries, "embedding", "vec_id", k=5,
                 n_planes=4, seed=42),
    ):
        got = out.collect()
        assert got  # query 0 answers
        assert all(r["neighbor_id"] != 99 for r in got)  # garbage excluded
        assert all(r["query_id"] != 98 for r in got)  # zero query: empty

    idx = str(tmp_path / "idx")
    build_ann_index(corpus, idx, "embedding", "vec_id", n_planes=4, seed=42)
    got = query_ann_index(spark, idx, queries, k=5).collect()
    assert got and all(r["neighbor_id"] != 99 for r in got)

    pairs = embedding_near_duplicates(
        corpus, "embedding", "vec_id", threshold=0.95, n_planes=4, seed=42
    ).collect()
    assert all(99 not in (r[0], r[1]) for r in pairs)


def test_index_stream_tombstone_only_batch_keeps_queries_alive(
    spark, tmp_path
):
    """ADVICE r13 (low): a tombstone-only micro-batch used to leave an
    empty _stream/batch=<id>/ dir (just _SUCCESS); a staging area made
    only of such dirs crashed every query/vacuum with 'Unable to infer
    schema' until real adds landed. The empty staging write is now
    skipped (replay-safe), so delete-only traffic leaves the index
    queryable and vacuumable."""
    import os

    from southpaw_spark.operators.ann_index import (
        attach_index_stream,
        build_ann_index,
        query_ann_index,
        vacuum_ann_index,
    )

    def vec(i, dim=6):
        return [((i * 31 + j * 17) % 97 - 48) / 48.0 for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    live = str(tmp_path / "live")
    build_ann_index(corpus, live, "embedding", "vec_id", n_planes=5, seed=7)

    # stream carries ONLY tombstones (ids 38, 39) — zero adds
    src = str(tmp_path / "src")
    corpus.where(F.col("vec_id") >= 38).withColumn(
        "is_tombstone", F.lit(True)
    ).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = attach_index_stream(
        stream, live, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        tombstone_col="is_tombstone",
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)

    # no empty batch dirs were staged
    staging = os.path.join(live, "_stream")
    if os.path.isdir(staging):
        assert not [d for d in os.listdir(staging) if d.startswith("batch=")]

    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = query_ann_index(spark, live, queries, k=5).collect()
    assert got  # queries answer instead of crashing on schema inference
    assert all(r["neighbor_id"] not in (38, 39) for r in got)
    assert vacuum_ann_index(spark, live) == 2  # folds the 2 tombstones
    assert sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in query_ann_index(spark, live, queries, k=5).collect()
    ) == sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in got)


def test_pq_index_streaming_ingest_parity_and_drift(spark, tmp_path):
    """Round-14 PQ streaming arm: build(A) + attach_pq_index_stream(B
    over several micro-batches, one delete as a tombstone row) answers
    queries identically to build on the survivors WITH A's stored
    codebooks (frozen-codebook invariant); a fresh checkpoint replays
    with zero duplicates; vacuum folds staging + tombstones and answers
    stay identical; and the drift guard flags a distribution shift
    (residual >> build baseline) as retrain_recommended without
    blocking ingest."""
    import os

    from southpaw_spark.operators.ann_index import (
        attach_pq_index_stream,
        build_pq_index,
        pq_index_drift,
        query_pq_index,
        vacuum_pq_index,
    )

    def vec(i, dim=8):
        return [((i * 37 + j * 11) % 101 - 50) / 50.0 for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    part_a = corpus.where(F.col("vec_id") % 2 == 0)
    part_b = corpus.where(F.col("vec_id") % 2 == 1)
    dead_id = 58  # even → lives in A, deleted via the stream
    queries = corpus.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    live = str(tmp_path / "live")
    meta = build_pq_index(part_a, live, "embedding", "vec_id",
                          m_subspaces=4, n_codes=8)
    assert meta["baseline_residual"] >= 0.0
    # truth: survivors encoded with A's STORED codebooks (the frozen-
    # codebook contract — a truth built on its own codebooks would
    # legitimately differ)
    truth = str(tmp_path / "truth")
    build_pq_index(
        corpus.where(F.col("vec_id") != dead_id), truth,
        "embedding", "vec_id", m_subspaces=4, n_codes=8,
        codebooks=spark.read.parquet(os.path.join(live, "codebooks")),
    )

    src = str(tmp_path / "src")
    part_b.withColumn("is_tombstone", F.lit(False)).unionByName(
        corpus.where(F.col("vec_id") == dead_id).withColumn(
            "is_tombstone", F.lit(True)
        )
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(ckpt):
        q = attach_pq_index_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src),
            live, "embedding", "vec_id",
            checkpoint_dir=str(tmp_path / ckpt),
            tombstone_col="is_tombstone",
            trigger={"availableNow": True},
        )
        q.awaitTermination(180)

    drain("ckpt1")

    def rows(d):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in query_pq_index(
                spark, d, corpus, queries, "embedding", "vec_id", k=5
            ).collect()
        )

    want = rows(truth)
    assert rows(live) == want and want
    assert all(n != dead_id for _, n, _, _ in rows(live))
    assert any(n % 2 == 1 for _, n, _, _ in rows(live))  # streamed ids answer
    # in-distribution stream: no retrain flag
    drift = pq_index_drift(live)
    assert drift["batches"] and drift["retrain_recommended"] is False

    # replay on a fresh checkpoint: overwrite staging absorbs it
    drain("ckpt2")
    assert rows(live) == want

    # vacuum folds staging + tombstone; answers unchanged
    assert vacuum_pq_index(spark, live) == 1
    assert not os.path.isdir(os.path.join(live, "_stream"))
    assert not os.path.isdir(os.path.join(live, "_deleted"))
    assert rows(live) == want

    # drift guard: a shifted distribution (×100 magnitudes) trips the
    # retrain flag; ingest still lands (codes stay queryable)
    shifted = corpus.where(F.col("vec_id") >= 55).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 100.0).alias("embedding"),
    )
    src2 = str(tmp_path / "src2")
    shifted.write.parquet(src2)
    q = attach_pq_index_stream(
        spark.readStream.schema(shifted.schema).parquet(src2),
        live, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt3"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    drift = pq_index_drift(live)
    assert drift["retrain_recommended"] is True
    assert rows(live)  # still answers


def test_ivf_index_build_query_stream_parity_and_drift(spark, tmp_path):
    """Round-14 persistent IVF index (completing the LSH/PQ/IVF family
    symmetry): build-once answers match the one-shot ivf_kmeans_topk
    with the same quantizer; build(A) + attach_ivf_index_stream(B, one
    tombstone) ≡ build on survivors with A's STORED centroids
    (frozen-quantizer invariant); fresh-checkpoint replay absorbs with
    zero duplicates; vacuum folds staging + tombstones with answers
    unchanged; the drift guard flags a distribution shift."""
    import os

    from southpaw_spark.operators.ann_index import (
        attach_ivf_index_stream,
        build_ivf_index,
        ivf_index_drift,
        query_ivf_index,
        vacuum_ivf_index,
    )
    from southpaw_spark.operators.similarity import ivf_kmeans_topk

    def vec(i, dim=6):
        return [((i * 41 + j * 13) % 103 - 51) / 51.0 for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    # one-shot parity: same n_cells/seed → same trained quantizer →
    # identical answers (the build-once/query-many contract)
    full = str(tmp_path / "full")
    meta = build_ivf_index(
        corpus, full, "embedding", "vec_id", n_cells=6, seed=7
    )
    assert meta["n_cells"] == 6 and meta["baseline_residual"] >= 0.0

    def rows(d, k=5, n_probe=2):
        return sorted(
            tuple(r)
            for r in query_ivf_index(
                spark, d, queries, k=k, n_probe=n_probe
            ).collect()
        )

    oneshot = sorted(
        tuple(r)
        for r in ivf_kmeans_topk(
            corpus, queries, "embedding", "vec_id",
            k=5, n_cells=6, n_probe=2, seed=7,
        ).collect()
    )
    assert rows(full) == oneshot and oneshot

    # streaming arm: A built, B streamed (+ tombstone), vs survivors
    # rebuilt with A's stored centroids
    part_a = corpus.where(F.col("vec_id") % 2 == 0)
    part_b = corpus.where(F.col("vec_id") % 2 == 1)
    dead_id = 78
    live = str(tmp_path / "live")
    build_ivf_index(part_a, live, "embedding", "vec_id", n_cells=6, seed=7)
    truth = str(tmp_path / "truth")
    build_ivf_index(
        corpus.where(F.col("vec_id") != dead_id), truth,
        "embedding", "vec_id",
        centroids=spark.read.parquet(os.path.join(live, "centroids")),
    )
    src = str(tmp_path / "src")
    part_b.withColumn("is_tombstone", F.lit(False)).unionByName(
        corpus.where(F.col("vec_id") == dead_id).withColumn(
            "is_tombstone", F.lit(True)
        )
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(ckpt):
        q = attach_ivf_index_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src),
            live, "embedding", "vec_id",
            checkpoint_dir=str(tmp_path / ckpt),
            tombstone_col="is_tombstone",
            trigger={"availableNow": True},
        )
        q.awaitTermination(180)

    drain("ckpt1")
    want = rows(truth)
    assert rows(live) == want and want
    assert all(n != dead_id for _, n, _, _ in rows(live))
    assert any(n % 2 == 1 for _, n, _, _ in rows(live))
    drift = ivf_index_drift(live)
    assert drift["batches"] and drift["retrain_recommended"] is False

    drain("ckpt2")  # fresh-checkpoint replay: overwrite staging absorbs
    assert rows(live) == want

    assert vacuum_ivf_index(spark, live) == 1
    assert not os.path.isdir(os.path.join(live, "_stream"))
    assert not os.path.isdir(os.path.join(live, "_deleted"))
    assert rows(live) == want

    # drift guard trips on a shifted distribution; ingest still lands
    shifted = corpus.where(F.col("vec_id") >= 75).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 100.0 + 50.0).alias(
            "embedding"
        ),
    )
    src2 = str(tmp_path / "src2")
    shifted.write.parquet(src2)
    q = attach_ivf_index_stream(
        spark.readStream.schema(shifted.schema).parquet(src2),
        live, "embedding", "vec_id",
        checkpoint_dir=str(tmp_path / "ckpt3"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    assert ivf_index_drift(live)["retrain_recommended"] is True
    assert rows(live)
