"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast join of the
query set against the corpus with JVM-side vector math (zip_with +
aggregate — no Python in the hot path), then a per-query top-k window.
At 100 TB the corpus side stays partitioned and is scanned once per
query batch; the query side is broadcast (query sets are small by
construction). The scale path is LSH bucketing (ivf_topk /
dedup.embedding_near_duplicates) which prunes the candidate set before
the same exact scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` must have columns (query_id, query_vec). Ties are broken
    deterministically by (rounded cosine desc, neighbor id asc) so
    results are engine-reproducible.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    joined = c.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
    cos = F.try_divide(
        _dot(F.col("query_vec"), F.col("cv")),
        _norm(F.col("query_vec")) * _norm(F.col("cv")),
    )
    scored = joined.select(
        "query_id", "neighbor_id", cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_planes: int | None = None,
    multiprobe: int = 1,
    target_bucket: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets prune the corpus,
    then exact cosine over the candidate set (IVF-style). Multi-probe:
    each query also probes every bucket within Hamming distance
    ``multiprobe`` of its own — recall rises steeply for a linear
    increase in candidates. The candidate join stays an equi-join on
    bucket, so the cross product never materializes and the corpus side
    scales out by bucket partitioning.

    ``n_planes=None`` (default) scales the plane count to the corpus
    (``dedup.auto_n_planes``): expected bucket ≈ ``target_bucket``
    vectors, so per-query candidate work stays bounded as the corpus
    grows instead of a fixed 2^planes bucket count going quadratic."""
    import numpy as np

    from southpaw_spark.operators.dedup import auto_n_planes

    if n_planes is None:
        n_planes = auto_n_planes(corpus.count(), target_bucket)
    rng = np.random.default_rng(seed)
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    planes = rng.standard_normal((n_planes, dim)).tolist()

    def bucket_bits(col):
        return [
            (
                F.aggregate(
                    F.zip_with(
                        col,
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

    def bucket_of(col):
        return F.concat_ws("", *[b.cast("string") for b in bucket_bits(col)])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        bucket_of(F.col(vec_col)).alias("bucket"),
    )
    if multiprobe not in (0, 1):
        raise ValueError("multiprobe supports 0 or 1 bit flips")
    bits = bucket_bits(F.col("query_vec"))
    probes = [F.concat_ws("", *[b.cast("string") for b in bits])]
    if multiprobe >= 1:
        for flip in range(n_planes):
            flipped = [
                (1 - b if i == flip else b) for i, b in enumerate(bits)
            ]
            probes.append(
                F.concat_ws("", *[b.cast("string") for b in flipped])
            )
    q = queries.select(
        "query_id",
        "query_vec",
        F.explode(F.array(*probes)).alias("bucket"),
    )
    joined = c.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.try_divide(
        _dot(F.col("query_vec"), F.col("cv")),
        _norm(F.col("query_vec")) * _norm(F.col("cv")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 2,
    train_cap: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer (k-means cells), the
    inverted-file counterpart of the hyperplane-LSH ``ivf_topk``:
    learned cells adapt to the data distribution, so clustered corpora
    get balanced cells where fixed random hyperplanes would overload a
    few buckets.

    Scale shape: the quantizer trains on a bounded sample
    (``train_cap`` rows — centroid quality needs a sample, not the
    corpus); cell assignment is ONE ``model.transform`` map-side pass,
    cacheable across query batches; the (small) centroid table is
    broadcast for the per-query probe ranking; candidates come from an
    equi-join on cell id, so the corpus×query cross product never
    materializes and candidate work per query ≈ ``n_probe × N /
    n_cells``. ``n_cells=None`` → ``≈√N`` (cells and cell size both
    ≈ √N, the classical IVF balance).
    """
    import math

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # One shared scan for the three corpus passes (count, quantizer
    # train input, cell assignment) instead of three parquet reads —
    # guide §5 caching: reused AND cheaper than recompute; a per-run
    # intermediate attached as ``_southpaw_cached`` (release() after
    # materializing). Caching preserves partition count and row order,
    # so the k-means|| sampling — and therefore every centroid — is
    # bit-identical to the uncached plan (pinned in tests). The fit's
    # per-iteration input is Spark ML's own internally persisted
    # instances RDD either way; this cache only feeds its first pass.
    corpus = corpus.cache()
    n = corpus.count()
    if n_cells is None:
        n_cells = max(2, min(4096, int(math.sqrt(n))))
    feats = array_to_vector(F.col(vec_col).cast("array<double>")).alias(
        "features"
    )
    train = corpus.select(feats)
    if n > train_cap:
        train = train.sample(fraction=min(1.0, train_cap / n), seed=seed)
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)

    assigned = model.transform(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            feats,
        )
    ).select("neighbor_id", "cv", F.col("prediction").alias("cell"))

    spark = corpus.sparkSession
    centers = spark.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "cell int, centroid array<double>",
    )
    qcos = F.try_divide(
        _dot(F.col("query_vec"), F.col("centroid")),
        _norm(F.col("query_vec")) * _norm(F.col("centroid")),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round(qcos, 8).desc(), F.col("cell")
    )
    probes = (
        queries.join(F.broadcast(centers))
        .withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= n_probe)
        .select("query_id", "query_vec", "cell")
    )
    joined = assigned.join(F.broadcast(probes), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.try_divide(
        _dot(F.col("query_vec"), F.col("cv")),
        _norm(F.col("query_vec")) * _norm(F.col("cv")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    out = (
        joined.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )
    out._southpaw_cached = [corpus]  # type: ignore[attr-defined]
    return out


def cosine_topk_filtered(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    filter_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Metadata-FILTERED exact top-k by cosine — "filtered vector
    search", the production ANN feature: each query ranks only corpus
    rows agreeing with it on every ``filter_cols`` column (tenant,
    language, label, …). ``queries`` carries (query_id, query_vec) plus
    the filter columns under their corpus names.

    Pre-filtering happens IN the join predicate, so Catalyst plans an
    equi-join on the filter columns (hash-partitioned by filter value,
    never query×corpus) with the small query side broadcast — at scale
    the candidate set per query is its filter partition, not the
    corpus. Ties break deterministically like :func:`cosine_topk`.
    The IVF composition (filter within probed cells) follows by
    passing a pre-filtered corpus to :func:`ivf_topk` when the filter
    is query-independent."""
    qren = queries.select(
        "query_id", "query_vec",
        *[F.col(c).alias(f"__f_{c}") for c in filter_cols],
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        *[F.col(col) for col in filter_cols],
    )
    cond = F.col("query_id") != F.col("neighbor_id")
    for col in filter_cols:
        cond = cond & (F.col(f"__f_{col}") == F.col(col))
    joined = c.join(F.broadcast(qren), cond)
    cos = F.try_divide(
        _dot(F.col("query_vec"), F.col("cv")),
        _norm(F.col("query_vec")) * _norm(F.col("cv")),
    )
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def cosine_radius(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    radius: float,
) -> DataFrame:
    """Radius (range) search: EVERY corpus vector with cosine ≥
    ``radius`` per query — the recall-complete dual of top-k (near-dup
    audits and contamination sweeps want "everything this close", not
    a fixed k). Same broadcast-query scan shape as :func:`cosine_topk`;
    no window, so the plan is one scan + filter."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    joined = c.join(
        F.broadcast(queries), F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.try_divide(
        _dot(F.col("query_vec"), F.col("cv")),
        _norm(F.col("query_vec")) * _norm(F.col("cv")),
    )
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cosine"))
        .where(F.col("cosine") >= radius)
        .select(
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine")
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric scalar quantization: each embedding becomes
    an integer code array (``|code| ≤ 2^(bits-1)−1``) plus one ``scale``
    double (``x ≈ code·scale``). At 100 TB this is the bandwidth lever
    for vector search: int8 codes move 4× fewer bytes than float32 (8×
    vs the parquet doubles) through every shuffle/broadcast, and the
    codes stay fully JVM-side (`transform`/`aggregate` codegen — no
    Python). Codes are carried as integral DOUBLES so downstream
    dot products are EXACT (sums of |code|²·dim ≪ 2⁵³) and therefore
    bit-reproducible across engines — the property the s06 DuckDB
    oracle pins. An all-zero vector quantizes to all-zero codes with
    scale 0 (guarded, no division by zero)."""
    qmax = float((1 << (bits - 1)) - 1)
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(qmax)
    code = F.when(
        F.col("__scale") == 0.0,
        F.transform(v, lambda x: F.lit(0.0)),
    ).otherwise(F.transform(v, lambda x: F.round(x / F.col("__scale"), 0)))
    return (
        df.withColumn("__scale", scale)
        .select(
            F.col(id_col),
            code.alias("code"),
            F.col("__scale").alias("scale"),
        )
    )


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    bits: int = 8,
    rescore: DataFrame | None = None,
    oversample: int = 4,
) -> DataFrame:
    """Top-k by cosine over QUANTIZED codes (:func:`quantize_embeddings`).
    Key property: cosine of symmetrically-quantized vectors is
    SCALE-FREE — dot(a,b)·s_a·s_b / (|a|s_a·|b|s_b) cancels both
    scales — so the score is integer-dot / (√int·√int): deterministic,
    engine-reproducible, and computed over ¼ the bytes. Same output
    shape and tie-break as :func:`cosine_topk`.

    ``rescore``: pass the ORIGINAL full-precision corpus frame to
    re-rank each query's quantized top-``k·oversample`` with exact
    float cosine (two-stage retrieval: cheap coarse scan → tiny exact
    rescore — the standard production shape). Without it, scores are
    the pure quantized approximation (what the s06 oracle checks)."""
    cq = quantize_embeddings(corpus, vec_col, id_col, bits).select(
        F.col(id_col).alias("neighbor_id"), F.col("code").alias("ncode")
    )
    qq = quantize_embeddings(
        queries.select(
            F.col("query_id").alias(id_col), F.col("query_vec").alias(vec_col)
        ),
        vec_col,
        id_col,
        bits,
    ).select(F.col(id_col).alias("query_id"), F.col("code").alias("qcode"))
    joined = cq.join(
        F.broadcast(qq), F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.try_divide(
        _dot(F.col("qcode"), F.col("ncode")),
        _norm(F.col("qcode")) * _norm(F.col("ncode")),
    )
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    coarse_k = k * oversample if rescore is not None else k
    coarse = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= coarse_k)
    )
    if rescore is None:
        return coarse.select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    # exact rescore of the shortlist: candidates × queries only — work
    # ∝ queries·k·oversample, independent of corpus size
    cand = coarse.select("query_id", "neighbor_id")
    cv = rescore.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    exact = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
    )
    ecos = F.try_divide(
        _dot(F.col("query_vec"), F.col("cv")),
        _norm(F.col("query_vec")) * _norm(F.col("cv")),
    )
    rescored = exact.select("query_id", "neighbor_id", ecos.alias("cosine"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def ivf_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
    bits: int = 8,
    oversample: int = 4,
    train_cap: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """The composed 100 TB retrieval shape — IVF cells over int8 codes
    with exact rescore — uniting three operators this module already
    ships separately: a coarse quantizer confines each query to
    ``n_probe`` inverted lists (s03's trained cells), the candidate
    scan runs over scale-free int8 codes (s06's ¼-bandwidth scoring),
    and the final ranking is an exact float rescore of the
    ``k·oversample`` shortlist (work ∝ queries·k·oversample,
    independent of corpus size).

    Coarse quantizer: ``centroids`` (``(cell int, centroid
    array<double>)``) if given — deterministic and oracle-reproducible,
    the registry path — else MLlib k-means trained on a bounded sample
    (production). Cell assignment is argmax cosine rounded to 8, ties →
    smallest cell (the d18/s03 discipline); query probes rank cells the
    same way.

    Scale: centroids and the (queries × probes × codes) frames
    broadcast; the corpus-side work is one assignment pass + an
    equi-join on ``cell`` (never a cross product); per-query candidate
    work ≈ ``n_probe · N / n_cells``; the only full-precision vectors
    that move are the shortlist's. Output shape and tie-breaks match
    :func:`cosine_topk`."""
    import math

    spark = corpus.sparkSession
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        n = corpus.count()
        if n_cells is None:
            n_cells = max(2, min(4096, int(math.sqrt(n))))
        feats = array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        )
        train = corpus.select(feats)
        if n > train_cap:
            train = train.sample(fraction=min(1.0, train_cap / n), seed=seed)
        model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
        centroids = spark.createDataFrame(
            [
                (i, [float(x) for x in c])
                for i, c in enumerate(model.clusterCenters())
            ],
            "cell int, centroid array<double>",
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    csim = F.try_divide(
        _dot(F.col("__v"), F.col("centroid")),
        _norm(F.col("__v")) * _norm(F.col("centroid")),
    )
    assigned = (
        c.join(F.broadcast(centroids))
        .groupBy("neighbor_id")
        .agg(
            F.max_by(
                "cell",
                F.struct(
                    F.round(csim, 8).alias("s"), (-F.col("cell")).alias("c")
                ),
            ).alias("cell"),
        )
    )
    # inverted lists carry int8 codes (scale-free cosine — both scales
    # cancel, so the coarse score is exact integer arithmetic)
    inv = assigned.join(
        quantize_embeddings(
            corpus.select(id_col, vec_col), vec_col, id_col, bits
        ).select(F.col(id_col).alias("neighbor_id"), F.col("code").alias("nc")),
        "neighbor_id",
    )

    qsim = F.try_divide(
        _dot(F.col("query_vec"), F.col("centroid")),
        _norm(F.col("query_vec")) * _norm(F.col("centroid")),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round(qsim, 8).desc(), F.col("cell")
    )
    probes = (
        queries.join(F.broadcast(centroids))
        .withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= n_probe)
        .select("query_id", "cell")
    )
    qcodes = quantize_embeddings(
        queries.select(
            F.col("query_id").alias(id_col), F.col("query_vec").alias(vec_col)
        ),
        vec_col,
        id_col,
        bits,
    ).select(F.col(id_col).alias("query_id"), F.col("code").alias("qc"))
    probe_q = probes.join(qcodes, "query_id")

    qcos = F.try_divide(
        _dot(F.col("qc"), F.col("nc")),
        _norm(F.col("qc")) * _norm(F.col("nc")),
    )
    cand = (
        inv.join(F.broadcast(probe_q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", qcos.alias("__qcos"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.round(F.col("__qcos"), 8).desc(), F.col("neighbor_id")
    )
    shortlist = cand.withColumn("__r", F.row_number().over(w1)).where(
        F.col("__r") <= k * oversample
    ).select("query_id", "neighbor_id")
    # exact rescore: only the SHORTLIST's full-precision vectors move —
    # the candidate scan above touched nothing but int8 codes
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    ecos = F.try_divide(
        _dot(F.col("query_vec"), F.col("__cv")),
        _norm(F.col("query_vec")) * _norm(F.col("__cv")),
    )
    rescored = (
        shortlist.join(cv, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "neighbor_id", ecos.alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 3,
    pool: int = 10,
    lam: float = 0.5,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998 —
    public): diversified top-k. Greedy: pick the candidate maximizing
    ``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`` (first pick: the
    plain relevance argmax, since the selected set is empty and maxsim
    is defined 0). Plain top-k returns k near-copies of the best hit;
    MMR returns k hits that COVER the neighborhood — what RAG context
    assembly and training-data diversity sampling actually want.

    Plan: exact top-``pool`` per query (:func:`cosine_topk`) bounds the
    candidate set; candidate↔candidate cosines within each pool are
    computed JVM-side (same expression discipline as s01, rounded 6);
    the greedy itself runs per query group in ONE Arrow
    ``applyInPandas`` pass that only compares those precomputed
    numbers — no float arithmetic beyond ``λ·rel − (1−λ)·maxsim`` on
    already-rounded inputs, so a SQL engine reproduces every pick
    bit-for-bit (ties → smaller id, the s01 discipline). Per-query
    work is O(pool²·k) on ≤ pool² rows — embarrassingly parallel
    across queries, no driver loop, no collect."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1]; got {lam}")
    if k > pool:
        raise ValueError(f"k ({k}) must be <= pool ({pool})")
    pool_df = cosine_topk(corpus, queries, vec_col, id_col, k=pool)
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    )
    cands = pool_df.join(cv, "neighbor_id")
    a = cands.select(
        "query_id",
        F.col("neighbor_id").alias("__ca"),
        F.col("__v").alias("__va"),
    )
    b = cands.select(
        "query_id",
        F.col("neighbor_id").alias("__cb"),
        F.col("__v").alias("__vb"),
    )
    pcos = F.try_divide(
        _dot(F.col("__va"), F.col("__vb")),
        _norm(F.col("__va")) * _norm(F.col("__vb")),
    )
    psim = (
        a.join(b, "query_id")
        .where(F.col("__ca") != F.col("__cb"))
        .select(
            "query_id",
            F.col("__ca").alias("id_a"),
            F.col("__cb").alias("id_b"),
            F.round(pcos, 6).alias("s"),
        )
    )
    id_type = corpus.schema[id_col].dataType
    rel = cands.select(
        "query_id",
        F.col("neighbor_id").alias("id_a"),
        F.lit(None).cast(id_type).alias("id_b"),
        F.col("cosine").alias("s"),
    )
    lam_f = float(lam)

    def greedy(pdf):
        import pandas as pd

        qid = pdf["query_id"].iloc[0]
        rels = {
            r.id_a: float(r.s)
            for r in pdf[pdf["id_b"].isna()].itertuples()
        }
        sims = {
            (r.id_a, r.id_b): float(r.s)
            for r in pdf[pdf["id_b"].notna()].itertuples()
        }
        selected: list[int] = []
        remaining = dict(rels)
        rows = []
        for step in range(1, k + 1):
            if not remaining:
                break
            best, best_score = None, None
            for c in sorted(remaining):  # ascending ids: strict > keeps
                maxsim = max(  # the smaller id on score ties
                    (sims.get((c, s), 0.0) for s in selected),
                    default=0.0,
                )
                score = lam_f * remaining[c] - (1.0 - lam_f) * maxsim
                if best is None or score > best_score:
                    best, best_score = c, score
            # round to 7, not 6: scores are 0.5·(6-decimal) − 0.5·
            # (6-decimal) = EXACT 7-decimal values, so rounding to 6
            # hits decimal halves where Python (half-even) and SQL
            # engines (half-away) disagree; 7 is the identity on them
            rows.append(
                (qid, best, step, rels[best], round(best_score, 7))
            )
            selected.append(best)
            del remaining[best]
        return pd.DataFrame(
            rows,
            columns=[
                "query_id", "neighbor_id", "mmr_rank", "cosine",
                "mmr_score",
            ],
        )

    # output schema derives id types from the INPUT frames (not a fixed
    # long DDL) so string / composite-typed doc ids work end to end
    out_schema = T.StructType(
        [
            T.StructField("query_id", pool_df.schema["query_id"].dataType),
            T.StructField("neighbor_id", id_type),
            T.StructField("mmr_rank", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )
    return (
        rel.unionByName(psim)
        .groupBy("query_id")
        .applyInPandas(greedy, out_schema)
    )


def _l2sq(a, b):
    """Squared L2 between two arrays as the same left-to-right
    ``aggregate`` fold as :func:`_dot` — bit-reproducible across
    engines (the oracle replays it with ``list_sum``)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_subvecs(df: DataFrame, idc: str, vc: str, ms: DataFrame, sub: int):
    """Per-(row, subspace) subvector slices — the shared projection
    behind PQ encode, query tables, and default codebooks."""
    return df.crossJoin(F.broadcast(ms)).select(
        F.col(idc), "m",
        F.slice(
            F.col(vc).cast("array<double>"), F.col("m") * sub + 1, sub
        ).alias("__sv"),
    )


def _pq_default_codebooks(
    corpus: DataFrame, vec_col: str, id_col: str,
    n_codes: int, ms: DataFrame, sub: int,
) -> DataFrame:
    """The DETERMINISTIC codebook rule shared by :func:`pq_topk` and
    :func:`operators.ann_index.build_pq_index`: subvectors of the
    ``n_codes`` smallest-id corpus vectors (oracle-reproducible; train
    per-subspace k-means and pass codebooks in for production)."""
    base = (
        corpus.orderBy(id_col).limit(n_codes)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1)
            .cast("int").alias("code"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    )
    return base.crossJoin(F.broadcast(ms)).select(
        "m", "code",
        F.slice(F.col("__v"), F.col("m") * sub + 1, sub).alias(
            "centroid"
        ),
    )


def _pq_encode(
    corpus: DataFrame, vec_col: str, id_col: str,
    codebooks: DataFrame, ms: DataFrame, sub: int,
) -> DataFrame:
    """PQ-encode the corpus: ``(neighbor_id, m, code)`` — nearest
    codebook entry per subspace, the engine-exact min-struct argmin
    (``(round(dist², 8), code)``). Shared by :func:`pq_topk` and the
    persisted index build so the two can never drift."""
    dist = _l2sq(F.col("__sv"), F.col("centroid"))
    return (
        _pq_subvecs(corpus, id_col, vec_col, ms, sub)
        .join(F.broadcast(codebooks), "m")
        .groupBy(F.col(id_col).alias("neighbor_id"), "m")
        .agg(
            F.min_by(
                "code", F.struct(F.round(dist, 8).alias("d"), F.col("code"))
            ).alias("code")
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    m_subspaces: int = 4,
    n_codes: int = 16,
    codebooks: DataFrame | None = None,
    oversample: int = 4,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN (s09, Jégou et al. 2011 "Product
    Quantization for Nearest Neighbor Search", public paper) — the
    codebook-compression arm completing the module's quantization
    family: s06 compresses each coordinate (scalar int8), s08 composes
    coarse cells with int8 codes, PQ compresses each SUBSPACE to one
    codebook index — ``m_subspaces`` bytes per vector at
    ``n_codes ≤ 256``, the memory shape billion-vector indexes use.

    Recipe: split dims into ``m_subspaces`` contiguous subspaces;
    encode every corpus vector as its nearest codebook entry per
    subspace (squared-L2, the PQ standard); score query↔doc by ADC
    (asymmetric distance computation — Σ over subspaces of the
    query-to-codeword distance, read from a per-query table of
    ``m_subspaces · n_codes`` precomputed entries); exact-cosine
    rescore of the ``k·oversample`` ADC shortlist (the s08 discipline:
    approximate scan, exact ranking; output shape and tie-breaks match
    :func:`cosine_topk`).

    ``codebooks`` (``(m int, code int, centroid array<double>)``,
    centroid length = dim/m) if given; else the DETERMINISTIC rule —
    subvectors of the ``n_codes`` smallest-id corpus vectors — the
    oracle-reproducible registry path (train per-subspace k-means and
    pass it in for production, exactly like d18/s08's quantizers).

    Engine-exact discipline: code assignment = min over
    ``(round(dist², 8), code)`` via order-independent ``min_by``; the
    ADC sum folds subspaces in ascending-``m`` order from a sorted
    struct array (never a float ``SUM`` whose partial-aggregation
    order could wiggle an ulp); shortlist ranks on
    ``(round(adc, 8) asc, neighbor_id)``.

    Scale: codebooks and query tables broadcast (``Q·m·n_codes``
    rows); the ADC scan is the deliberate full-scan arm — O(N·m) joins
    against broadcast tables, no full-precision vectors moving —
    compose with IVF cells (s08's confinement) when N·Q is the
    bottleneck; only the shortlist's float vectors are ever read.

    ``codes`` (``(neighbor_id, m, code)``, from :func:`_pq_encode` /
    a persisted index): skip the encode pass and score against the
    stored codes — the build-once/query-many seam
    (:func:`operators.ann_index.build_pq_index`); requires
    ``codebooks``."""
    if codes is not None and codebooks is None:
        raise ValueError(
            "codes without codebooks — stored codes are meaningless "
            "without the codebooks that produced them"
        )
    spark = corpus.sparkSession
    probe = corpus.select(F.col(vec_col)).first()
    if probe is None or probe[0] is None:
        raise ValueError(
            f"pq_topk: corpus is empty or first {vec_col!r} is NULL — "
            "cannot infer the vector dimension; filter NULL vectors "
            "out (or pass a non-empty corpus) before calling"
        )
    dim = len(probe[0])
    if dim % m_subspaces:
        raise ValueError(
            f"dim {dim} not divisible by m_subspaces {m_subspaces}"
        )
    sub = dim // m_subspaces
    ms = spark.range(m_subspaces).select(F.col("id").cast("int").alias("m"))
    if codebooks is None:
        codebooks = _pq_default_codebooks(
            corpus, vec_col, id_col, n_codes, ms, sub
        )
    if codes is None:
        codes = _pq_encode(corpus, vec_col, id_col, codebooks, ms, sub)
    dist = _l2sq(F.col("__sv"), F.col("centroid"))
    qtable = (
        _pq_subvecs(
            queries.select(
                F.col("query_id"), F.col("query_vec")
            ),
            "query_id", "query_vec", ms, sub,
        )
        .join(F.broadcast(codebooks), "m")
        .select("query_id", "m", "code", dist.alias("__qd"))
    )
    # ADC: every (query, doc) pair meets in exactly m_subspaces rows;
    # the per-pair sum folds ascending m from a sorted struct array so
    # the double is identical for any partitioning/engine
    paired = codes.join(F.broadcast(qtable), ["m", "code"]).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    adc = (
        paired.groupBy("query_id", "neighbor_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("m"), F.col("__qd")))
            ).alias("__terms")
        )
        .select(
            "query_id", "neighbor_id",
            F.aggregate(
                F.transform(F.col("__terms"), lambda s: s["__qd"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__adc"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.round(F.col("__adc"), 8).asc(), F.col("neighbor_id")
    )
    shortlist = adc.withColumn("__r", F.row_number().over(w1)).where(
        F.col("__r") <= k * oversample
    ).select("query_id", "neighbor_id")
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    ecos = F.try_divide(
        _dot(F.col("query_vec"), F.col("__cv")),
        _norm(F.col("query_vec")) * _norm(F.col("__cv")),
    )
    rescored = (
        shortlist.join(cv, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "neighbor_id", ecos.alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 8).desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def ann_recall(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """recall@k per query (s10) — the acceptance metric every ANN
    rollout runs before trading exactness for speed (Jégou et al. 2011
    report recall@R for PQ; FAISS benchmarks likewise): given an
    approximate and an exact result frame, both carrying
    ``(query_id, neighbor_id, rank)``, recall@k is
    ``|approx top-k ∩ exact top-k| / k``. Queries present in ``exact``
    but missing from ``approx`` (e.g. an empty probe set) score 0.
    Output ``(query_id, n_hits, recall)``, recall rounded 6.

    Plan: one semi-join on (query, neighbor) + one combiner groupBy —
    both frames are top-k lists (Q·k rows), so this is benchmark-sized
    work regardless of corpus size, and AQE broadcasts the smaller
    side."""
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    a = approx.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    hits = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    qs = e.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 6
        ).alias("recall"),
    )


def centroid_outlier_scores(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    group_col: str | None = None,
    hot_group_rows: int | None = 1_000_000,
) -> DataFrame:
    """Embedding-space outlier scoring (s11): cosine of every vector to
    its group's MEAN vector (the whole corpus when ``group_col`` is
    None), plus ``outlier_rank`` — ascending cosine within the group,
    ties by id — so "prune the k most out-of-distribution docs per
    stratum" is one WHERE. The semantic data-quality signal SemDeDup-
    style pipelines use to drop mislabeled/garbage embeddings before
    dedup (public recipe; complements d18, which removes near-DUPLICATE
    points — this removes ISOLATED ones).

    Plan: one posexplode + two combiner groupBys build the (groups ×
    dims) centroid table — tiny, broadcast back — then the cosine is a
    zip_with/aggregate projection and the rank one window bounded by
    the largest group UP TO ``hot_group_rows``: any group beyond that
    threshold (including the single implicit group when ``group_col``
    is None — otherwise a corpus-wide GLOBAL sort) ranks through the
    a09/t23 range-bucket escape instead — sampled quantile buckets of
    the rounded cosine → tiny per-(group, bucket) prefix sums →
    within-bucket sorts. The bucket is a deterministic function of the
    ORDER VALUE (``round(cos, 8)``), so ties stay in one bucket and
    ``outlier_rank`` is BIT-IDENTICAL to the window path (parity is
    test-pinned, t23's tie-crossing pattern included).
    ``hot_group_rows=None`` disables the split (pure window path); the
    default engages only beyond 1M-row groups, costing one trivial
    count aggregate per call. Float discipline: vectors cast to
    double, final cosine round(·, 6), rank ordered by round(·, 8) so
    summation dust cannot flip an order (the s01 convention)."""
    v = F.col(vec_col).cast("array<double>")
    gcols = [group_col] if group_col else []
    dims = df.select(
        *gcols, F.posexplode(v).alias("__pos", "__val")
    )
    cent_rows = dims.groupBy(*gcols, "__pos").agg(
        F.avg("__val").alias("__c")
    )
    cent = cent_rows.groupBy(*gcols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__c"))),
            lambda x: x["__c"],
        ).alias("__cv")
    )
    joined = (
        df.select(*gcols, F.col(id_col), v.alias("__v"))
        .join(F.broadcast(cent), gcols)
        if group_col
        else df.select(F.col(id_col), v.alias("__v")).crossJoin(
            F.broadcast(cent)
        )
    )
    dot = F.aggregate(
        F.zip_with("__v", "__cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # try_divide: a zero-norm (garbage) embedding scores NULL instead
    # of killing the job under ANSI division-by-zero — and NULLs sort
    # FIRST ascending, so garbage vectors surface as the top outliers,
    # exactly what this pruning signal is for
    cos = F.try_divide(dot, norm(F.col("__v")) * norm(F.col("__cv")))
    scored = joined.select(
        F.col(id_col), *gcols, cos.alias("__cos")
    )

    def window_rank(part: DataFrame) -> DataFrame:
        w = Window.partitionBy(*gcols).orderBy(
            F.round(F.col("__cos"), 8).asc(), F.col(id_col)
        )
        return part.select(
            id_col,
            *gcols,
            F.round("__cos", 6).alias("centroid_cosine"),
            F.row_number().over(w).alias("outlier_rank"),
        )

    hot_groups: list = []
    all_hot = False
    if hot_group_rows is not None:
        # detection on the RAW frame: a trivial count aggregate with no
        # centroid math in its lineage, so the common no-hot case pays
        # one cheap job and keeps the pure window plan. Bounded
        # collect: ≤ total_rows / hot_group_rows group names.
        if group_col:
            hot_groups = [
                r[0]
                for r in df.groupBy(group_col)
                .agg(F.count("*").alias("__raw_n"))
                .where(F.col("__raw_n") > int(hot_group_rows))
                .select(group_col).collect()
            ]
        else:
            all_hot = df.count() > int(hot_group_rows)
    if not hot_groups and not all_hot:
        return window_rank(scored)

    # Skew escape (the a09/t23 range-bucket machinery): a group beyond
    # hot_group_rows — or the WHOLE corpus when group_col is None —
    # would serialize one window task. Bucket by sampled quantiles of
    # the rounded cosine, prefix-sum the tiny per-(group, bucket)
    # counts, and pay only within-bucket sorts. The bucket is a
    # deterministic function of the rounded value, so ties stay in one
    # bucket and outlier_rank is bit-identical to the window path.
    from southpaw_spark.operators.skew import bucket_prefix_join

    scored = scored.persist()  # quantile sample + cold + hot branches
    hot = (
        scored if all_hot
        else scored.where(F.col(group_col).isin(hot_groups))
    )
    hotm = hot.withColumn("__ord", F.round(F.col("__cos"), 8))
    n_buckets = 256
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        b
        for b in set(
            hotm.where(~F.isnan("__ord")).approxQuantile(
                "__ord", probs, 0.01
            )
        )
        if b == b  # drop a NaN boundary (all-NaN group)
    )
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bkt = F.size(F.filter(barr, lambda b: b <= F.col("__ord")))
    else:
        bkt = F.lit(0)
    # NaN cosines (zero-norm vectors) sort AFTER every double in
    # Spark's ordering, but every `bound <= NaN` comparison is false —
    # bucket 0 — which would rank them FIRST. Pin them to a dedicated
    # final bucket so bucket order extends the window order exactly.
    # (NULLs need no pin: null comparisons bucket to 0 and nulls-first
    # ascending IS the window path's placement.)
    bkt = F.when(F.isnan("__ord"), F.lit(len(bounds) + 1)).otherwise(bkt)
    marked = hotm.withColumn("__bk", bkt)
    pref = bucket_prefix_join(marked, "__bk", partition_cols=tuple(gcols))
    ww = Window.partitionBy(*gcols, "__bk").orderBy("__ord", id_col)
    ranked_hot = pref.select(
        id_col,
        *gcols,
        F.round("__cos", 6).alias("centroid_cosine"),
        (F.col("__prefix") + F.row_number().over(ww))
        .cast("int").alias("outlier_rank"),
    )
    if all_hot:
        out = ranked_hot
    else:
        cold = scored.where(~F.col(group_col).isin(hot_groups))
        out = window_rank(cold).unionByName(ranked_hot)
    out._southpaw_cached = [scored]  # type: ignore[attr-defined]
    return out
