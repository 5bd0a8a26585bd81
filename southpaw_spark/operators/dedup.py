"""Deduplication operators for large-scale training-data pipelines.

All variants are shuffle-native (shingle-join / hash-groupBy — never a
cross product, never a driver-side loop), so they scale to 100 TB: the
work is proportional to Σ|shingles| and to the candidate-pair count, and
every stage is an equi-join/groupBy Catalyst can hash-partition.

Hash choice: md5 — deterministic, engine-agnostic (DuckDB oracles
reproduce signatures bit-for-bit), and uniformly distributed so min-hash
statistics hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T
from pyspark.sql import functions as F


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document → (id, shingle) rows.
    Documents shorter than n words are dropped (no shingle evidence).

    Construction is ``arrays_zip`` of ``n`` offset slices + one cheap
    ``concat_ws`` per position — n array slices per DOC, not a
    slice+array_join allocation per POSITION (higher-order functions
    run interpreted, so per-element work is the constant that matters:
    the old per-position form measured 12.7 s vs 3.5 s for this one on
    the sf1 corpus, identical output — BASELINE §18)."""
    w = F.split(F.col(text_col), " ")
    width = F.size(w) - (n - 1)
    offs = [F.slice(w, i + 1, width) for i in range(n)]
    sh = F.array_distinct(
        F.transform(
            F.arrays_zip(*offs),
            lambda x: F.concat_ws(" ", *[x[str(i)] for i in range(n)]),
        )
    )
    return (
        df.where(F.size(w) >= n)
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
    )


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per duplicate group
    with the canonical keeper (min id) and the full member list."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def auto_max_doc_freq(n_docs: int) -> int:
    """Corpus-scaled stop-shingle cap: hot enough to bound the worst
    self-join key (a shingle in D docs contributes D² join rows, so the
    worst key costs ≤ cap²), low enough that the self-join's total
    Σ D² stays near the Σ n_inter lower bound of the true output —
    measured on the sf1 rotation-stress corpus, cap 500 leaves enough
    moderately-hot phrases to triple the wall vs cap ~128. Grows mildly
    with the corpus (0.2%) so common phrases stay usable as candidate
    evidence on small corpora; hard-clamped at 4096 (worst key ≤ 16.8M
    rows — one AQE skew-split away from healthy) regardless of size."""
    import math

    return min(4096, max(128, math.ceil(0.002 * n_docs)))


#: Tolerance for float-boundary candidate bounds (d02/d10): larger than
#: any double rounding error of t·n for realistic sizes (≤ ~1e-10 at a
#: million shingles), smaller than the 1e-6 grid spacing of products of
#: ≤6-decimal thresholds with integer sizes — so ε-relaxed bounds are
#: EXACT at every representable boundary and only ever widen (never
#: narrow) in the unrepresentable corner cases. See the plen comment in
#: ngram_jaccard_pairs.
_EPS = 1e-7

#: experiment toggle (tools/ab_d02_dfreq.py): force the doc-frequency
#: attach join in ngram_jaccard_pairs to shuffled-hash instead of
#: letting Catalyst pick. Measured FLAT same-JVM ABAB at sf0.1 (r16:
#: quiet walls 3.0/3.3 s hinted vs 3.2/3.2 s Catalyst), and unlike the
#: post-collect_list estimates, the post-groupBy dfreq estimate grows
#: with input size, so Catalyst's broadcast flips to a partitioned
#: join on its own at scale — left False (Catalyst decides).
_DFREQ_HINT = False


def release(df: DataFrame) -> None:
    """Unpersist any intermediate frames an operator cached while
    building ``df`` (attached as ``df._southpaw_cached``). Call after
    the result has been materialized (written / collected); repeated
    calls in one session without release accumulate executor storage
    until LRU eviction. No-op for frames with nothing attached."""
    for frame in getattr(df, "_southpaw_cached", []):
        frame.unpersist()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | str | None = "auto",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by **exact** n-gram Jaccard similarity —
    prefix-filtered candidate generation + array-intersect verification.

    The naive shingle self-join + per-pair count goes quadratic two
    ways at scale: a boilerplate shingle shared by D docs is a D²-row
    join key (witness: the reference's 1,000+ fan-out production note,
    southpaw CHANGELOG.md §0.6.0), and at permissive thresholds the
    pair-count groupBy shuffles one row per (pair, shared shingle) —
    tens of millions of singleton pairs that the final filter throws
    away (measured: 78M candidate pairs → 250k survivors on the sf1
    rotation-stress corpus, BASELINE.md §7).

    This implementation is the relational form of the prefix-filter /
    verification design from the set-similarity-join literature (Xiao
    et al., "Efficient Similarity Joins for Near Duplicate Detection",
    WWW 2008 — public), adapted to a rare/hot shingle split:

    1. Shingles are ranked per document by global rarity (doc-freq asc,
       hash tiebreak) and split at a doc-frequency cap (``max_doc_freq``;
       ``"auto"`` = :func:`auto_max_doc_freq`). Hot shingles — the
       frequency head — rank after every rare shingle by construction.
    2. CANDIDATES: rare postings self-join on the shingle hash, keeping
       a row only when the shingle sits inside BOTH docs' α-prefixes
       (position ≤ size − α + 1, α = t/(1+t)·(n_a+n_b) the minimum
       overlap a ≥ t pair needs) and the sizes pass the length filter
       (t·n_a ≤ n_b ≤ n_a/t). The prefix-filter theorem: any pair with
       overlap ≥ α shares its smallest common token inside both
       prefixes — so taking DISTINCT surviving pairs loses nothing.
       The worst join key is capped at cap² rows, and the positional
       predicate kills the singleton-pair flood before the shuffle.
    3. RESCUE (exactness for the boilerplate corner): a pair whose
       smallest shared prefix token is HOT implies α ≤ hot-count on
       both sides, i.e. hot ≥ t·size. Only such hot-heavy docs can
       form pairs invisible to step 2; their hot postings self-join
       (tiny for natural corpora — it is the all-boilerplate corpus
       where the true output itself is quadratic) adds those pairs.
    4. VERIFY: candidates join each side's full shingle-set array once;
       the exact intersection is ``size(array_intersect(a, b))`` —
       JVM-side per-row set math, no per-(pair, shingle) shuffle at
       all. Exact Jaccard over FULL sets, then the threshold.

    Every emitted score is exact and no qualifying pair can be missed —
    verified hash-identical to the single-phase DuckDB oracle at
    sf0.001/0.01/0.1 and on the sf1 stress corpus.
    ``max_doc_freq=None`` disables the rare/hot split (pure prefix
    filter, no skew bound on the worst key).

    At 100 TB: postings, prefixes and doc arrays all come from ONE
    groupBy-by-doc over the doc-freq-tagged postings (per-doc rarity
    order via ``sort_array`` on (df, hash) structs — array math inside
    codegen, no window function, no second sort shuffle); the candidate
    join's input holds ONLY prefix tokens (≤ (1−t)·n+1 per doc), and
    nothing collects to the driver. One intermediate frame (the per-doc
    facts) is cached because four plan branches read it; it is attached
    to the result as ``_southpaw_cached`` — call :func:`release` after
    materializing if you invoke this repeatedly in one session.

    ``shingles_df``: a precomputed ``(id, shingle)`` frame from
    :func:`shingles` with the SAME ``n`` over exactly the rows of
    ``df`` — the shared-inventory seam: a pipeline that already
    shingled the corpus for another stage (d21 fuzzy decontamination)
    hands the cached frame in instead of paying the text scan +
    explode again. Output is identical by construction (the per-doc
    shingle sets are the same rows).
    """
    if not (
        max_doc_freq is None
        or max_doc_freq == "auto"
        or isinstance(max_doc_freq, int)
    ):
        raise ValueError(
            "max_doc_freq must be None, an int, or exactly 'auto'; got "
            f"{max_doc_freq!r}"
        )
    # Join on a 64-bit hash of the shingle instead of the string: the
    # shuffle carries 8-byte keys instead of ~n·word-length strings.
    # Collision risk is ~|shingles|²/2⁶⁵ — immaterial here.
    sh_src = (
        shingles_df if shingles_df is not None
        else shingles(df, text_col, id_col, n)
    )
    sh = sh_src.select(
        F.col(id_col), F.xxhash64("shingle").alias("sh")
    )
    cap: int | None
    if max_doc_freq == "auto":
        n_docs = df.count()
        # Small-corpus fast path: below ~10k docs the worst possible
        # join key (a shingle in EVERY doc) is ≤ 1e8 candidate rows —
        # one AQE skew-split from healthy — so the split machinery's
        # extra stages (rescue self-join + union-distinct + array
        # filters) cost more than the skew bound saves. Output is
        # identical either way (both plans are exact); this is a pure
        # plan choice, like an optimizer's size-based join selection.
        cap = None if n_docs <= 10_000 else auto_max_doc_freq(n_docs)
    else:
        cap = max_doc_freq
    t = float(threshold)
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df_"))
    if _DFREQ_HINT:
        dfreq = dfreq.hint("shuffle_hash")
    tagged = sh.join(dfreq, "sh")
    # ONE per-doc aggregation carries everything downstream: the
    # rarity-sorted (df, hash) struct array yields the full shingle
    # set (verification), the rare/hot split (array filter — hot sort
    # after every rare because df > cap), the prefix (array slice: the
    # largest useful rank is n − ⌈t·n⌉ + 1, from α ≥ t·n for any
    # length-feasible partner), and the hot evidence for the rescue.
    # Cached: the prefix explode, the rescue, and both verify sides
    # read it; everything before this agg runs exactly once.
    rare = (
        F.col("srt") if cap is None
        else F.filter("srt", lambda x: x["df_"] <= F.lit(cap))
    )
    # Safe prefix length: the exact bound is n − ⌈t·n⌉ + 1, but ceil on
    # a binary double can round UP past an exact integer product (e.g.
    # t=0.54, n=50: 0.54·50 → 27.000000000000004 → ceil 28), silently
    # shortening the prefix by one and MISSING a qualifying pair.
    # ceil(t·n − ε) with ε=1e-7 is the exact ⌈t·n⌉ whenever the true
    # product is ≥ ε away from an integer (always, for thresholds with
    # ≤6 decimal digits and ≤1e6 shingles — double rounding error is
    # ≤ ~1e-10 there) and one LOWER when the product sits within ε of
    # an integer — which only lengthens the prefix, never shortens it.
    # A floor-based bound would be safe too but costs a full extra
    # prefix token on EVERY doc — measured 1.8× d02 wall on the sf1
    # family-stress corpus.
    plen = (
        F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh") - _EPS) + 1
    ).cast("int")
    doc = (
        tagged.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("df_", "sh"))).alias("srt")
        )
        .withColumn("n_sh", F.size("srt"))
        .withColumn("sh_set", F.transform("srt", lambda x: x["sh"]))
        .withColumn(
            "prefix",
            F.transform(F.slice(rare, F.lit(1), plen), lambda x: x["sh"]),
        )
        .withColumn("n_hot", F.col("n_sh") - F.size(rare))
        .drop("srt")
        .cache()
    )
    rare_pos = doc.select(
        F.col(id_col), "n_sh",
        F.posexplode("prefix").alias("pos0", "sh"),
    ).select(id_col, "sh", (F.col("pos0") + 1).alias("pos"), "n_sh")
    pa = rare_pos.select(
        F.col(id_col).alias("id_a"), "sh",
        F.col("pos").alias("pos_a"), F.col("n_sh").alias("n_a"),
    )
    pb = rare_pos.select(
        F.col(id_col).alias("id_b"), "sh",
        F.col("pos").alias("pos_b"), F.col("n_sh").alias("n_b"),
    )
    # All candidate-side bounds are ε-relaxed (ε=1e-7, same argument
    # as plen): subtracting ε admits at most the true boundary integer
    # when the double product rounds across it — a raw float
    # comparison can EXCLUDE a qualifying pair (n_a ≥ t·n_b fails for
    # n_a=27, t=0.54, n_b=50: the product is 27.000000000000004) —
    # while staying tight everywhere else (a floor() relaxation
    # measured 1.8× d02 wall at sf1).
    alpha = F.lit(t / (1.0 + t)) * (F.col("n_a") + F.col("n_b"))
    cand = (
        pa.join(pb, "sh")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: |B| ∈ [t·|A|, |A|/t] is necessary for J ≥ t
            & (F.col("n_b") >= F.lit(t) * F.col("n_a") - _EPS)
            & (F.col("n_a") >= F.lit(t) * F.col("n_b") - _EPS)
            # pair-exact prefix filter on both sides (tighter than the
            # worst-case slice that built the prefix arrays)
            & (F.col("pos_a") <= F.col("n_a") - alpha + 1 + _EPS)
            & (F.col("pos_b") <= F.col("n_b") - alpha + 1 + _EPS)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    if cap is not None:
        # hot-heavy rescue: only docs with n_hot ≥ t·n_sh can pair on
        # hot evidence alone (see step 3 above). Hot shingles are the
        # sorted array's tail — everything past the rare prefix count.
        hh = (
            doc.where(F.col("n_hot") >= F.lit(t) * F.col("n_sh") - _EPS)
            .select(
                F.col(id_col),
                F.explode(
                    F.slice(
                        "sh_set",
                        F.col("n_sh") - F.col("n_hot") + 1,
                        F.col("n_hot"),
                    )
                ).alias("sh"),
            )
        )
        rescue = (
            hh.select(F.col(id_col).alias("id_a"), "sh")
            .join(hh.select(F.col(id_col).alias("id_b"), "sh"), "sh")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        cand = cand.unionByName(rescue).distinct()
    da = doc.select(
        F.col(id_col).alias("id_a"),
        F.col("n_sh").alias("n_a"), F.col("sh_set").alias("set_a"),
    )
    db = doc.select(
        F.col(id_col).alias("id_b"),
        F.col("n_sh").alias("n_b"), F.col("sh_set").alias("set_b"),
    )
    n_inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = n_inter.cast("double") / (F.col("n_a") + F.col("n_b") - n_inter)
    # Catalyst's post-collect_list estimate of `doc` is tiny, so left
    # alone it BROADCASTS the corpus-sized shingle-set relation to
    # every executor — twice — the same blind spot as the q13
    # grouped-children incident (a driver/executor OOM at scale;
    # locally a 2×full-payload ship). Forcing shuffled-hash with the
    # candidate PAIRS as build side replaces both broadcasts with
    # partitioned hash joins whose build side is the id-only pair set:
    # memory per task is O(pairs/partitions), never O(corpus). The doc
    # payload now moves through hash exchanges (its cached plan sits
    # under AdaptiveSparkPlan, so its groupBy partitioning is opaque to
    # the planner and cannot be reused), which an executor fleet
    # absorbs; a corpus broadcast cannot be absorbed at any fleet
    # size. Inner equi-joins, predicates unchanged → identical rows;
    # plan pinned in tests, oracle-verified; same-JVM ABAB at sf0.1
    # measured 3.5 vs 3.6 s (hinted slightly faster locally).
    out = (
        da.join(cand.hint("shuffle_hash"), "id_a")
        .hint("shuffle_hash")
        .join(db, "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )
    out._southpaw_cached = [doc]  # type: ignore[attr-defined]
    return out


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_doc_freq: int | str | None = "auto",
    min_len: int = 1,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: (id_a, id_b, containment) where
    containment = |shingles(a) ∩ shingles(b)| / |shingles(a)| ≥ t —
    i.e. document a is (nearly) a subset of document b. The asymmetric
    relation Jaccard structurally misses: a quoted article inside a
    10× larger page has tiny Jaccard but containment ≈ 1. Output is
    directional (both (a,b) and (b,a) appear when containment is
    mutual).

    Same prefix-filter skeleton as :func:`ngram_jaccard_pairs` but
    one-sided: overlap ≥ t·|A| needs a shared token ranked ≤
    |A| − t·|A| + 1 in A AND ≤ |B| − t·|A| + 1 in B (global rarity
    order); the pair-specific positional predicate applies at join
    time and ``array_intersect`` verification makes every emitted
    score exact.

    SKEW BOUND (default on, exactness-preserving): the naive form
    joins A-prefixes against ALL of B's postings, so one corpus-wide
    boilerplate shingle makes a doc-freq² join key. The rare/hot
    split restores the d02 bound without losing a pair:

    * RARE path: postings with doc-freq ≤ ``max_doc_freq`` on BOTH
      sides — worst join key ≤ cap². Rarity order puts every rare
      token before every hot one, so if ANY shared token is rare,
      the globally smallest shared token is rare and (by the prefix
      theorem) lands inside both positional windows → caught here.
    * HOT rescue: a pair invisible to the rare path shares ONLY hot
      tokens, so |A∩B| ≤ n_hot(A) and containment ≥ t forces
      n_hot(A) ≥ t·n_sh(A) — A is hot-heavy (for containment that
      means small or boilerplate docs; the ``min_len`` floor bounds
      them further). Only such A docs post hot tokens against B hot
      postings; the residual key is |hot-heavy A| × doc-freq, with
      AQE skew-join absorbing what remains. Measured on a synthetic
      every-doc-shares-one-shingle corpus in BASELINE.md §13.

    ``max_doc_freq=None`` disables the split (pure one-sided prefix
    filter); ``"auto"`` picks :func:`auto_max_doc_freq`, with the
    same ≤10k-doc single-phase fast path as d02. ``min_len`` drops
    A-side docs with fewer than ``min_len`` shingles (B side is
    unaffected, so larger docs still find their containers); the
    default 1 changes nothing. All float bounds are floor-relaxed —
    see the d02 comment on double rounding."""
    if not (
        max_doc_freq is None
        or max_doc_freq == "auto"
        or isinstance(max_doc_freq, int)
    ):
        raise ValueError(
            "max_doc_freq must be None, an int, or exactly 'auto'; got "
            f"{max_doc_freq!r}"
        )
    sh = shingles(df, text_col, id_col, n).select(
        F.col(id_col), F.xxhash64("shingle").alias("sh")
    )
    t = float(threshold)
    cap: int | None
    if max_doc_freq == "auto":
        n_docs = df.count()
        cap = None if n_docs <= 10_000 else auto_max_doc_freq(n_docs)
    else:
        cap = max_doc_freq
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df_"))
    rare = (
        F.col("srt") if cap is None
        else F.filter("srt", lambda x: x["df_"] <= F.lit(cap))
    )
    plen = (
        F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh") - _EPS) + 1
    ).cast("int")
    doc = (
        sh.join(dfreq, "sh")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df_", "sh"))).alias("srt"))
        .withColumn("n_sh", F.size("srt"))
        .withColumn("sh_set", F.transform("srt", lambda x: x["sh"]))
        .withColumn(
            "prefix",
            F.transform(F.slice(rare, F.lit(1), plen), lambda x: x["sh"]),
        )
        .withColumn("rare_set", F.transform(rare, lambda x: x["sh"]))
        .withColumn("n_hot", F.col("n_sh") - F.size(rare))
        .drop("srt")
        .cache()
    )
    # rare positions are ranks in the FULL rarity order (rare tokens
    # all precede hot ones, so rare-array index == global rank)
    pa = doc.where(F.col("n_sh") >= F.lit(int(min_len))).select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"),
        F.posexplode("prefix").alias("pos0", "sh"),
    ).select("id_a", "n_a", (F.col("pos0") + 1).alias("pos_a"), "sh")
    pb = doc.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"),
        F.posexplode("rare_set").alias("pos0", "sh"),
    ).select("id_b", "n_b", (F.col("pos0") + 1).alias("pos_b"), "sh")
    alpha = F.lit(t) * F.col("n_a")
    pair_pred = (
        (F.col("id_a") != F.col("id_b"))
        # overlap ≥ t·n_a needs |B| ≥ t·n_a (ε-relaxed — see d02)
        & (F.col("n_b") >= alpha - _EPS)
        & (F.col("pos_a") <= F.col("n_a") - alpha + 1 + _EPS)
        & (F.col("pos_b") <= F.col("n_b") - alpha + 1 + _EPS)
    )
    cand = (
        pa.join(pb, "sh")
        .where(pair_pred)
        .select("id_a", "id_b")
        .distinct()
    )
    if cap is not None:
        # hot postings with positions: hot tokens are the rarity
        # order's tail, global rank = n_rare + index-in-tail
        hot = doc.select(
            F.col(id_col), "n_sh", "n_hot",
            F.posexplode(
                F.slice(
                    "sh_set",
                    F.col("n_sh") - F.col("n_hot") + 1,
                    F.col("n_hot"),
                )
            ).alias("pos0", "sh"),
            (F.col("n_sh") - F.col("n_hot")).alias("n_rare_"),
        ).select(
            id_col, "n_sh",
            (F.col("n_rare_") + F.col("pos0") + 1).alias("pos"), "sh",
        )
        ha = (
            doc.where(
                (F.col("n_hot") >= F.lit(t) * F.col("n_sh") - _EPS)
                & (F.col("n_sh") >= F.lit(int(min_len)))
            )
            .select(F.col(id_col).alias("__a_id"))
            .join(hot.withColumnRenamed(id_col, "__a_id"), "__a_id")
            .select(
                F.col("__a_id").alias("id_a"),
                F.col("n_sh").alias("n_a"),
                F.col("pos").alias("pos_a"), "sh",
            )
        )
        hb = hot.select(
            F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"),
            F.col("pos").alias("pos_b"), "sh",
        )
        rescue = (
            ha.join(hb, "sh")
            .where(pair_pred)
            .select("id_a", "id_b")
            .distinct()
        )
        cand = cand.unionByName(rescue).distinct()
    da = doc.select(
        F.col(id_col).alias("id_a"),
        F.col("n_sh").alias("n_a"), F.col("sh_set").alias("set_a"),
    )
    db = doc.select(
        F.col(id_col).alias("id_b"), F.col("sh_set").alias("set_b")
    )
    cont = (
        F.size(F.array_intersect("set_a", "set_b")).cast("double")
        / F.col("n_a")
    )
    out = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .where(cont >= threshold)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )
    out._southpaw_cached = [doc]  # type: ignore[attr-defined]
    return out


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, num_hashes: int = 8
) -> DataFrame:
    """MinHash signatures: h_i(doc) = min over shingles of md5(i|shingle).
    Lexicographic min over uniformly-distributed hex digests is a valid
    min-hash family; md5 keeps it reproducible in any engine.

    Plan note (measured, BASELINE §18): explode→groupBy looks like a
    corpus-sized shuffle but is NOT — the hash aggregate's map-side
    partial min reduces each mapper's output to one row per doc before
    the exchange, and the 8 md5s run in whole-stage codegen. An
    ``array_min``-inside-the-array alternative (zero exchanges)
    measured 2.4× SLOWER end-to-end because higher-order functions
    evaluate interpreted. The stage's real cost was shingle
    CONSTRUCTION — fixed in :func:`shingles`."""
    sh = shingles(df, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")).cast("binary"))).alias(
            f"h{i}"
        )
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_buckets(
    sigs: DataFrame, id_col: str, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """LSH band buckets from a signature table → (id, band, bucket).

    All band buckets in ONE pass over the signatures: posexplode an
    array of per-band bucket hashes instead of unioning ``bands`` scans
    of the aggregate (which would recompute the signature groupBy per
    band — ``bands``× the shuffle volume for identical output)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    buckets = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + j}") for j in range(rows)]
        parts = [cols[0]]
        for c in cols[1:]:
            parts.extend([F.lit("|"), c])
        buckets.append(F.md5(F.concat(*parts).cast("binary")))
    return sigs.select(
        F.col(id_col),
        F.posexplode(F.array(*buckets)).alias("band", "bucket"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """MinHash + LSH banding: docs agreeing on all hashes of any band are
    candidate pairs. The band-bucket equi-join replaces the O(N²) compare;
    at 100 TB each band shuffles on (band, bucket) and only true bucket
    collisions are materialized."""
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    all_bands = band_buckets(sigs, id_col, num_hashes, bands)
    a = all_bands.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b_ = all_bands.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b_, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash over word tokens: sign-sum of per-token hash bits.
    Computed JVM-side with bit arithmetic on xxhash64 — no Python UDF."""
    w = F.split(F.col(text_col), " ")
    tok = df.select(F.col(id_col), F.explode(w).alias("tok"))
    th = tok.withColumn("th", F.xxhash64("tok"))
    # For each bit position, +1 if set else -1; majority vote per doc.
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    votes = th.groupBy(id_col).agg(*bit_cols)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return votes.select(F.col(id_col), sig.alias("simhash"))


def hamming_near_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str = "simhash",
    bits: int = 64,
    max_hamming: int = 3,
) -> DataFrame:
    """EXACT pairs of rows whose ``sig_col`` bit-signatures differ in at
    most ``max_hamming`` bits → (id_a, id_b, hamming).

    Banded Hamming blocking: the signature splits into
    ``max_hamming + 1`` bit-bands; by pigeonhole, any pair at distance
    ≤ max_hamming has ZERO differing bits in at least one band, so the
    band-value equi-join surfaces every qualifying pair — never a
    cross product. Verification is one JVM ``bit_count(a XOR b)`` per
    candidate. At 100 TB each band shuffles on (band, value) and only
    true band collisions materialize — the Hamming analog of d03's
    MinHash banding; a band whose value is shared by D rows costs D²
    join rows, bounded in practice by the signature entropy (near-dup
    corpora cluster; wholly-degenerate corpora have quadratic TRUE
    output)."""
    nb = max_hamming + 1
    width = bits // nb
    band_vals = []
    for j in range(nb):
        start = j * width
        w = bits - start if j == nb - 1 else width
        if w >= 64:  # nb == 1 over 64-bit sigs: (1<<64)-1 overflows a
            band_vals.append(F.col(sig_col))  # long; band = signature
            continue
        mask = (1 << w) - 1
        band_vals.append(
            F.shiftright(F.col(sig_col), start).bitwiseAND(F.lit(mask))
        )
    banded = sigs.select(
        F.col(id_col),
        F.col(sig_col),
        F.posexplode(F.array(*band_vals)).alias("band", "bv"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a"),
        "band", "bv",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b"),
        "band", "bv",
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()  # a close pair may collide in several bands
        .where(ham <= max_hamming)
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 64,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs: :func:`simhash` signatures →
    :func:`hamming_near_pairs` banded blocking. Completes the d04
    surface (signatures alone don't dedup anything) with the standard
    Charikar-2002 usage: ≤ ``max_hamming`` differing bits ⇒ near-dup."""
    return hamming_near_pairs(
        simhash(df, text_col, id_col, bits), id_col, "simhash",
        bits, max_hamming,
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node points its LARGER neighbors at the
    minimum of its closed neighborhood. Preserves connectivity."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node repoints its SMALLER-or-equal
    neighborhood (itself included) at that set's minimum. Output edges
    are canonically (node > root)-oriented and duplicate-free."""
    o = (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = o.groupBy("u").agg(F.min("v").alias("mn"))  # mn < u always
    repointed = (
        o.join(mins, "u")
        .where(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    self_edges = mins.select("u", F.col("mn").alias("v"))
    return repointed.unionByName(self_edges).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    driver_max_edges: int | None = 200_000,
) -> DataFrame:
    """Connected components over a (near-)duplicate pair graph → one
    ``cluster_id`` (the component's minimum vertex id) per vertex. This
    turns pairwise dedup output into the *dedup groups* a training
    pipeline actually keeps/drops.

    Spark-first: alternating large-star / small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014 — public) — each round is two join+groupBy shuffles, and
    the edge set converges to a star forest (every node → its
    component's min id) in O(log²) rounds REGARDLESS of component
    diameter. The previous min-label-propagation design needed
    O(diameter) rounds, which a long near-dup chain (doc A≈B≈C≈…)
    turns into thousands of shuffles at corpus scale; star contraction
    collapses such chains exponentially. ``localCheckpoint`` truncates
    lineage per round so plans stay flat; the driver loop carries only
    a changed-row existence check, never data. Convergence is verified
    (both-direction anti-join empty) and non-convergence fails loudly —
    a silently split component would let downstream keep/drop logic
    keep real duplicates.

    Every vertex that appears in ``edges`` gets a row — including a
    vertex whose only edges are self-loops (it is its own singleton
    cluster), matching the label-propagation semantics this replaced.

    SMALL-GRAPH FAST PATH: when the edge count is ≤
    ``driver_max_edges`` (default 200k — a few MB collected), the
    components are computed by driver-side union-find instead of the
    distributed contraction loop. The contraction loop costs ~10 small
    Spark jobs (two localCheckpoints + two convergence anti-join
    counts per round) — pure fixed overhead for the micro-batch-sized
    graphs the streaming dedupers produce every trigger (measured:
    3.7 s → ~0.3 s per batch). The collect is explicitly BOUNDED by
    the cap, outputs are identical (property-pinned), and larger
    graphs fall back to the O(log²)-round distributed plan untouched.
    ``driver_max_edges=None`` forces the distributed path.
    """
    # Checkpoint the RAW edge frame once: both `cur` (the contraction
    # loop) and `verts` (the final label union) derive from it, and
    # `verts` is read by every downstream materialization of the
    # labels — without this, unpersisting the caller's upstream plan
    # (e.g. pipelines.release(pairs)) would re-execute the entire
    # edge-producing job on every later read of the labels.
    raw = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint()
    # One BOUNDED probe job replaces the former count() + collect()
    # pair (guide §5: the per-batch fixed cost of the streaming callers
    # is job count): limit(cap+1) can collect at most cap+1 edge rows
    # off the checkpointed blocks, the cap check runs on the collected
    # length, and the distributed fallback below never touches `rows` —
    # identical gate semantics, one job instead of two.
    rows = (
        raw.limit(driver_max_edges + 1).collect()
        if driver_max_edges is not None
        else None
    )
    if rows is not None and len(rows) <= driver_max_edges:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in rows:
            u, v = row[0], row[1]
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp_min: dict = {}
        for x in parent:
            r = find(x)
            m = comp_min.get(r)
            if m is None or x < m:
                comp_min[r] = x
        id_type = raw.schema["u"].dataType
        out_schema = T.StructType(
            [
                T.StructField("id", id_type),
                T.StructField("cluster_id", id_type),
            ]
        )
        return raw.sparkSession.createDataFrame(
            [(x, comp_min[find(x)]) for x in parent], out_schema
        )
    verts = (
        raw.select("u").unionByName(raw.select(F.col("v").alias("u"))).distinct()
    )
    cur = (
        raw
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    converged = cur.limit(1).count() == 0  # no edges → nothing to do
    for _ in range(max_iter):
        if converged:
            break
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        # set equality of canonically-oriented edge frames
        converged = (
            nxt.join(cur, ["u", "v"], "left_anti").limit(1).count() == 0
            and cur.join(nxt, ["u", "v"], "left_anti").limit(1).count() == 0
        )
        cur = nxt
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating rounds — pathological input (the algorithm is "
            "O(log²) rounds in component size); raise max_iter"
        )
    # fixpoint is a star forest: (leaf → root) edges; roots label
    # themselves, and isolated vertices (self-loop-only input) label
    # themselves via the vertex union
    labels = cur.select(
        F.col("u").alias("id"), F.col("v").alias("cluster_id")
    ).unionByName(
        cur.select(F.col("v").alias("id"), F.col("v").alias("cluster_id"))
    ).unionByName(
        verts.select(F.col("u").alias("id"), F.col("u").alias("cluster_id"))
    )
    return labels.groupBy("id").agg(F.min("cluster_id").alias("cluster_id"))


def cluster_keepers(
    clusters: DataFrame,
    scored: DataFrame,
    id_col: str,
    score_col: str | None = None,
) -> DataFrame:
    """Pick ONE keeper per duplicate cluster → (id, cluster_id, keep_id,
    is_keeper). With ``score_col`` the keeper is the cluster's
    highest-scoring member (ties → min id); without it, the min id —
    what a production dedup actually wants: keep the BEST copy of each
    near-dup family (longest / highest-quality / canonical source),
    not whichever happened to carry the smallest id.

    ``clusters`` is :func:`connected_components` output (id,
    cluster_id); ``scored`` carries ``id_col`` (+ ``score_col``). Plan:
    one combiner-friendly min-struct groupBy on cluster_id plus the
    join back — map-side partial aggregation, no window sort, nothing
    quadratic. Vertices absent from ``scored`` rank last (score null)."""
    joined = clusters.join(
        scored.select(
            F.col(id_col).alias("id"),
            *([F.col(score_col).alias("__score")] if score_col else []),
        ),
        "id",
        "left",
    )
    if score_col:
        # lexicographic min over (-score, id): highest score wins, ties
        # (and null scores, ranked last via +inf) break to the min id
        k1 = F.when(
            F.col("__score").isNotNull(), -F.col("__score").cast("double")
        ).otherwise(F.lit(float("inf")))
    else:
        k1 = F.lit(0.0)
    key = F.struct(k1.alias("k1"), F.col("id").alias("k2"))
    winners = joined.groupBy("cluster_id").agg(
        F.min(key).alias("__w")
    ).select("cluster_id", F.col("__w.k2").alias("keep_id"))
    return joined.join(winners, "cluster_id").select(
        "id", "cluster_id", "keep_id",
        (F.col("id") == F.col("keep_id")).alias("is_keeper"),
    )


def auto_n_planes(n_rows: int, target_bucket: int = 200) -> int:
    """Corpus-scaled hyperplane count: enough planes that the *expected*
    bucket holds ~``target_bucket`` vectors, so within-bucket pairing
    stays ~N·target_bucket instead of going quadratic. At 100 TB a fixed
    plane count would be the scale bug: 2^planes buckets must grow with
    the corpus."""
    import math

    return max(1, math.ceil(math.log2(max(2.0, n_rows / target_bucket))))


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 2,
    target_bucket: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed by random-hyperplane
    signs so only same-bucket pairs are compared (scale path; brute force
    lives in operators.similarity).

    ``n_planes=None`` (default) scales the plane count to the corpus via
    :func:`auto_n_planes` (one count() job). ``n_tables`` independent
    hash tables are OR-ed (banded multi-table LSH): a pair is a candidate
    if it collides in ANY table, so recall survives the plane increase —
    P(candidate) = 1-(1-p^b)^T for per-plane agreement p. Each table is
    an equi-join on (table, bucket); duplicates across tables dedup on
    the pair id after exact scoring."""
    import numpy as np

    if n_planes is None:
        n_planes = auto_n_planes(df.count(), target_bucket)
    rng = np.random.default_rng(seed)
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first["d"]
    v = F.col(vec_col)

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    table_buckets = []
    for t in range(n_tables):
        planes = rng.standard_normal((n_planes, dim)).tolist()
        sign_bits = [
            (
                F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(x)) for x in planes[p]]),
                        lambda a, b: a.cast("double") * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0
            ).cast("int")
            for p in range(n_planes)
        ]
        table_buckets.append(
            F.concat_ws("", *[sb.cast("string") for sb in sign_bits])
        )
    # One scan computes every table's bucket; posexplode replaces an
    # n_tables-way union of full-corpus scans.
    bucketed = df.select(
        F.col(id_col),
        v.alias("v"),
        F.posexplode(F.array(*table_buckets)).alias("table", "bucket"),
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), "table", "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "table", "bucket"
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # try_divide: a zero-norm (garbage) embedding pairs with nothing
    # (NULL cosine fails the threshold) instead of killing the job
    # under ANSI division-by-zero
    cos = F.try_divide(dot, norm(F.col("va")) * norm(F.col("vb")))
    return (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .distinct()  # same pair may collide in several tables
    )


def bag_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Order-insensitive exact dedup: documents with the same word
    MULTISET group together (hash of the sorted token list). Catches
    rotations / shuffles / reorderings that byte-exact dedup misses and
    the Jaccard join finds only at quadratic candidate cost — e.g. the
    sf1 rotation-stress families (circular shifts preserve the bag) all
    collapse here in ONE combiner-friendly groupBy. Same output
    contract as :func:`exact_duplicates`."""
    canon = F.md5(
        F.concat_ws(
            " ", F.sort_array(F.split(F.col(text_col), " "))
        ).cast("binary")
    )
    return (
        df.groupBy(canon.alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """EXACT edit-distance (Levenshtein) near-dup pairs: (id_a, id_b,
    distance ≤ ``max_dist``) — the character-level dedup modality the
    shingle family can't express (a one-char typo in every word defeats
    word n-grams but is ``max_dist`` edits away). Reference scope: the
    training-pipeline dedup surface of SURVEY §7.5.

    Spark-first PassJoin-style plan (Li/Deng/Feng, "PassJoin: A
    Partition-based Method for Similarity Joins", PVLDB 2012 — public
    paper, no code): partition every string into ``max_dist+1``
    contiguous segments; by pigeonhole, ed(a, b) ≤ d forces at least
    one segment of b to appear VERBATIM in a, shifted by at most d.

    * INDEX: each string emits its d+1 (segment, index, length,
      position) rows.
    * PROBE: each string emits, for every partner length within ±d and
      every segment index, the substrings inside the ±d position
      window (≤ (2d+1)²·(d+1) short rows per string — bounded, and all
      ``Column.substr`` codegen).
    * Join on (segment text, segment index, partner length) — an
      equi-join Catalyst hash-partitions; the position window is
      pair-exact (a superset of PassJoin's multi-match window, so no
      candidate is lost). ``F.levenshtein`` verifies exactly.

    Strings shorter than ``max_dist + 1`` characters cannot be
    partitioned into d+1 non-empty segments and are dropped (their
    pairs are degenerate — almost any short string is within d edits);
    nulls/empties likewise. At 100 TB the worst join key is a segment
    shared corpus-wide (boilerplate prefixes) — same rare/hot shape as
    d02; bound upstream or let AQE skew-split absorb it (segments are
    length-L/(d+1) strings, far more selective than word shingles)."""
    d = int(max_dist)
    if d < 0:
        raise ValueError("max_dist must be >= 0")
    k = d + 1
    s = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__s"))
        .where(F.col("__s").isNotNull())
        .withColumn("__L", F.length("__s"))
        .where(F.col("__L") >= F.lit(k))
    )
    # segment geometry for a string of length L (1-based): k segments,
    # first k-rem of length base = L // k, the last L % k one longer
    seg_i = F.explode(F.sequence(F.lit(1), F.lit(k))).alias("__i")
    with_i = s.select("__id", "__s", "__L", seg_i)
    b = (F.col("__L") / k).cast("int")
    rem = F.col("__L") % k
    seg_len = b + F.when(F.col("__i") > k - rem, 1).otherwise(0)
    # start = 1 + (i-1)*base + max(0, i-1-(k-rem))  [longer segs at tail]
    seg_pos = (
        F.lit(1)
        + (F.col("__i") - 1) * b
        + F.greatest(F.lit(0), F.col("__i") - 1 - (k - rem))
    )
    index_side = with_i.select(
        F.col("__id").alias("id_b"),
        F.col("__L").alias("len_b"),
        F.col("__i"),
        F.col("__s").substr(seg_pos, seg_len).alias("__seg"),
        seg_pos.alias("__p"),
    )
    # probe: for each partner length within ±d, same geometry formulas
    probe_lens = F.explode(
        F.sequence(F.col("__L") - d, F.col("__L") + d)
    ).alias("__pl")
    pr = s.select("__id", "__s", "__L", probe_lens).where(
        F.col("__pl") >= F.lit(k)
    )
    pr = pr.select("__id", "__s", "__L", "__pl", seg_i)
    pb = (F.col("__pl") / k).cast("int")
    prem = F.col("__pl") % k
    plen_seg = pb + F.when(F.col("__i") > k - prem, 1).otherwise(0)
    ppos = (
        F.lit(1)
        + (F.col("__i") - 1) * pb
        + F.greatest(F.lit(0), F.col("__i") - 1 - (k - prem))
    )
    start_lo = F.greatest(F.lit(1), ppos - d)
    start_hi = F.least(F.col("__L") - plen_seg + 1, ppos + d)
    # Spark's sequence(start, stop) steps -1 when start > stop, so an
    # EMPTY probe window would otherwise emit a descending run of
    # spurious starts (harmless — the levenshtein verify kills them —
    # but wasted candidates). NULL array → explode emits nothing.
    starts = F.explode(
        F.when(start_lo <= start_hi, F.sequence(start_lo, start_hi))
    ).alias("__q")
    probe_side = (
        pr.select("__id", "__s", "__L", "__pl", "__i", plen_seg.alias("__sl"),
                  ppos.alias("__pp"), starts)
        .where(F.col("__q") >= 1)
        .select(
            F.col("__id").alias("id_a"),
            F.col("__L").alias("len_a"),
            F.col("__pl").alias("len_b"),
            F.col("__i"),
            F.col("__s").substr(F.col("__q"), F.col("__sl")).alias("__seg"),
        )
    )
    cand = (
        probe_side.join(index_side, ["__seg", "__i", "len_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    txt = s.select(F.col("__id"), F.col("__s"))
    out = (
        cand.join(txt.select(F.col("__id").alias("id_a"),
                             F.col("__s").alias("__sa")), "id_a")
        .join(txt.select(F.col("__id").alias("id_b"),
                         F.col("__s").alias("__sb")), "id_b")
        .withColumn("distance", F.levenshtein("__sa", "__sb"))
        .where(F.col("distance") <= d)
        .select("id_a", "id_b", F.col("distance").cast("long").alias("distance"))
    )
    return out


def merged_spans(sorted_starts, k: int):
    """Column expression: fold a SORTED array of k-token span start
    positions into the minimal disjoint ``array<struct<start,end>>``
    cover (end exclusive; overlapping and touching intervals merge).
    Fixed-length intervals sorted by start have monotone ends, so the
    last-element merge IS the full gaps-and-islands. Shared by the
    batch operator (:func:`duplicate_spans`) and the incremental
    streaming deduper, which re-merges a doc's cumulative start set as
    new duplicate evidence arrives."""
    empty_spans = F.expr(
        "CAST(array() AS array<struct<start:int,`end`:int>>)"
    )
    return F.aggregate(
        sorted_starts,
        empty_spans,
        lambda acc, p: F.when(
            (F.size(acc) > 0)
            & (p <= F.element_at(acc, -1)["end"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["start"].alias("start"),
                        F.greatest(
                            F.element_at(acc, -1)["end"], p + k
                        ).alias("end"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        p.alias("start"), (p + k).alias("end")
                    )
                ),
            )
        ),
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """EXACT duplicate-SPAN detection: for every document, the merged
    token intervals covered by some k-token gram that occurs ≥
    ``min_count`` times across the whole corpus (occurrences inside
    the same document count — self-repetition is duplication too).
    This is the substring-level dedup modality of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" (ACL
    2022 — public paper): document-level dedup (d01/d02/d03) keeps a
    page that merely *contains* a widely-copied passage; span-level
    dedup cuts the passage itself. Reference scope: SURVEY §7.5
    training-pipeline dedup surface.

    Returns one row per document that contains at least one duplicated
    span: ``(id_col, spans array<struct<start,end>>, n_spans,
    dup_tokens, n_tokens)`` — ``start`` inclusive / ``end`` exclusive,
    0-based TOKEN positions (split-on-single-space, the module
    determinism contract). Overlapping and touching intervals are
    merged, so ``spans`` is the minimal disjoint cover.

    Spark-first plan (the paper's suffix array is a single-machine
    structure; the relational equivalent is three shuffles, all
    combiner-friendly):

    1. gram inventory: per doc, ``transform(sequence(...))`` emits the
       (position, k-gram) list — pure codegen, no UDF.
    2. ``groupBy(gram).count()`` — map-side partial aggregation absorbs
       hot boilerplate grams (a gram repeated 1M× combines locally).
    3. left-semi join occurrences against the duplicated-gram set —
       each occurrence matches AT MOST ONE dup row, so a hot gram
       cannot blow the join up (unlike pair-join dedup); AQE broadcasts
       the dup side when it is small (boilerplate usually is).
    4. per-doc interval merge: ``sort_array(collect_list(pos))`` (list
       bounded by the doc's own length) + an ``F.aggregate`` fold —
       fixed-length intervals sorted by start have monotone ends, so
       the last-element merge is the full gaps-and-islands.

    ``hash_grams=True`` groups on ``xxhash64(gram)`` instead of the
    gram string — the 100 TB shuffle shape (8 bytes/gram vs ~k words);
    a 2⁻⁶⁴ hash collision could mark an extra span as duplicated
    (never miss one). The default keeps byte-exactness so DuckDB
    oracles match bit-for-bit."""
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    w = F.split(F.col(text_col), " ")
    toks = (
        df.select(
            F.col(id_col), w.alias("__w"), F.size(w).alias("__n")
        )
        .where(F.col("__n") >= k)
    )
    gram_txt = F.concat_ws(" ", F.slice(F.col("__w"), F.col("__g") + 1, k))
    gram = F.xxhash64(gram_txt) if hash_grams else gram_txt
    occ = toks.select(
        F.col(id_col),
        F.col("__w"),
        F.col("__n"),
        F.explode(
            F.sequence(F.lit(0), F.col("__n") - k)
        ).alias("__g"),
    ).select(F.col(id_col), F.col("__n"), F.col("__g"), gram.alias("__gram"))
    dup = (
        occ.groupBy("__gram")
        .agg(F.count("*").alias("__cnt"))
        .where(F.col("__cnt") >= min_count)
        .select("__gram")
    )
    hits = occ.join(dup, "__gram", "left_semi")
    merged = merged_spans(F.sort_array(F.collect_list("__g")), k)
    return (
        hits.groupBy(F.col(id_col), F.col("__n"))
        .agg(merged.alias("spans"))
        .select(
            F.col(id_col),
            F.col("spans"),
            F.size("spans").cast("long").alias("n_spans"),
            F.aggregate(
                "spans",
                F.lit(0),
                lambda acc, s: acc + s["end"] - s["start"],
            ).cast("long").alias("dup_tokens"),
            F.col("__n").cast("long").alias("n_tokens"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Apply :func:`duplicate_spans`: rebuild every document's text
    with the duplicated-span tokens cut out (Lee et al.'s corpus
    transformation). Returns the input rows with ``{text_col}_clean``
    (tokens outside every span, single-space-joined — empty string if
    the whole doc was duplicated), ``n_tokens_before`` and
    ``n_tokens_after``. Documents with no duplicated span pass through
    unchanged. The coverage test is an ``F.exists`` over the doc's own
    (merged, disjoint) span list — O(n_tokens · n_spans) per doc, no
    shuffle beyond the :func:`duplicate_spans` build."""
    spans = duplicate_spans(
        df, text_col, id_col, k=k, min_count=min_count,
        hash_grams=hash_grams,
    ).select(F.col(id_col), "spans")
    return cut_spans(df, spans, text_col, id_col)


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Apply ANY spans frame ``(id_col, spans array<struct<start,end>>)``
    to a corpus: rebuild each document's text with the covered tokens
    cut out. Returns the input rows plus ``{text_col}_clean`` (empty
    string if the whole doc was covered), ``n_tokens_before`` and
    ``n_tokens_after``; docs absent from ``spans`` pass through
    unchanged. Shared by :func:`remove_duplicate_spans` (corpus
    self-dedup) and :func:`span_contamination` (benchmark scrub). The
    coverage test is an ``F.exists`` over the doc's own merged span
    list — O(n_tokens · n_spans) per doc, one left join."""
    w = F.split(F.col(text_col), " ")
    sp = F.coalesce(
        F.col("spans"),
        F.expr("CAST(array() AS array<struct<start:int,`end`:int>>)"),
    )
    kept = F.filter(
        w,
        lambda x, i: ~F.exists(
            sp, lambda s: (i >= s["start"]) & (i < s["end"])
        ),
    )
    return (
        df.join(spans.select(F.col(id_col), "spans"), id_col, "left")
        .select(
            *[F.col(c) for c in df.columns],
            F.concat_ws(" ", kept).alias(f"{text_col}_clean"),
            F.size(w).cast("long").alias("n_tokens_before"),
            F.size(kept).cast("long").alias("n_tokens_after"),
        )
    )


def bloom_prefilter(
    df: DataFrame,
    col: str,
    ref: DataFrame,
    ref_col: str,
    fpp: float = 0.01,
) -> DataFrame:
    """Keep the rows of ``df`` whose ``col`` MIGHT appear in
    ``ref[ref_col]``, tested against a Bloom filter built from the
    reference side — no false negatives, ~``fpp`` false positives, so
    a downstream exact join sees only the surviving sliver.

    The point at 100 TB: a broadcast membership set costs tens of bytes
    per distinct value; the Bloom bitmap costs ``-ln(fpp)/ln(2)^2``
    BITS per value (~9.6 at 1%), a 20-50x broadcast-memory cut. Hashing
    stays JVM-side (``xxhash64(col, seed_i)`` per hash function, whole-
    stage codegen); Python only does the vectorized numpy bit probe
    over Arrow batches. The bitmap is built DISTRIBUTED: positions fold
    into 64-bit words via a combiner-friendly ``groupBy(word) bit_or``,
    so the one driver collect is bounded by the bitmap size itself
    (8 bytes x occupied words), never by |ref| or |ref| x num_hashes.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1); got {fpp}")
    n = max(
        1,
        ref.select(F.approx_count_distinct(ref_col).alias("n")).first()["n"],
    )
    m = int(math.ceil(-n * math.log(fpp) / math.log(2) ** 2))
    m = max(64, m)
    kh = max(1, round(m / n * math.log(2)))

    def positions(c):
        return [
            F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m)) for i in range(kh)
        ]

    words = (
        ref.select(
            F.explode(F.array(*positions(F.col(ref_col)))).alias("p")
        )
        .groupBy((F.col("p") / 64).cast("long").alias("w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
            ).alias("bits")
        )
        .collect()
    )
    n_words = (m >> 6) + 1
    bitmap64 = np.zeros(n_words, dtype=np.int64)
    for r in words:
        bitmap64[r["w"]] = r["bits"]
    bitmap = bitmap64.astype("<i8").view(np.uint8)  # little-endian bytes
    bc = df.sparkSession.sparkContext.broadcast(bitmap.tobytes())

    def might_contain(hs):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        hv = hs.to_numpy(dtype=np.int64)  # (batch, kh), no object lists
        bit = (bm[hv >> 3] >> (hv & 7).astype(np.uint8)) & 1
        return pd.Series(bit.all(axis=1))

    # struct input -> typed pandas DataFrame: the positions cross Arrow
    # as kh flat int64 columns, never per-row Python lists. Real
    # annotation objects: the module's future-annotations mode would
    # stringify inline hints, and pandas is only imported locally.
    might_contain.__annotations__ = {"hs": pd.DataFrame, "return": pd.Series}
    mc = pandas_udf(might_contain, "boolean")
    pos_struct = F.struct(
        *[p.alias(f"h{i}") for i, p in enumerate(positions(F.col(col)))]
    )
    return df.where(mc(pos_struct))


def span_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bench_text_col: str | None = None,
    hash_grams: bool = False,
    prefilter: str = "exact",
    bloom_fpp: float = 0.01,
) -> DataFrame:
    """Span-level benchmark DECONTAMINATION: for every corpus doc, the
    merged token intervals covered by a k-gram occurring ANYWHERE in
    the benchmark set — the span analogue of :func:`ngram_contamination`
    (which only scores; this locates, so :func:`cut_spans` can surgically
    remove the leaked passage instead of dropping the whole doc — the
    scrub modern eval-hygiene pipelines apply).

    Returns one row per contaminated doc: ``(id_col, spans, n_spans,
    contaminated_tokens, n_tokens, contamination_frac)`` (frac rounded
    to 6 decimals). Same tokenization and interval-merge contract as
    :func:`duplicate_spans`.

    Scale: benchmark sets are MBs against corpus TBs — the distinct
    benchmark gram set broadcasts, so the corpus side never shuffles
    (one scan + map-side semi-join + the per-doc groupBy). Same
    ``hash_grams`` tradeoff as d15.

    ``prefilter="bloom"`` replaces the full-gram-set broadcast with a
    :func:`bloom_prefilter` bitmap (~10 bits/gram at 1% fpp vs tens of
    bytes per gram string — a 20-50x broadcast cut when the benchmark
    side grows to GBs) followed by an exact-confirm semi-join on only
    the surviving ~fpp fraction of corpus grams (a shuffle join whose
    left side is now tiny). Output is IDENTICAL to the exact path —
    the bloom can only admit extra candidates and the confirm join
    removes them."""
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    if prefilter not in ("exact", "bloom"):
        raise ValueError(
            f"prefilter must be 'exact' or 'bloom'; got {prefilter!r}"
        )
    btc = bench_text_col or text_col
    bw = F.split(F.col(btc), " ")
    bgram_txt = F.transform(
        F.sequence(F.lit(1), F.size(bw) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(bw, i, k)),
    )
    bgrams = (
        benchmark.where(F.size(bw) >= k)
        .select(F.explode(bgram_txt).alias("__gt"))
        .select(
            (F.xxhash64("__gt") if hash_grams else F.col("__gt"))
            .alias("__gram")
        )
        .distinct()
    )
    w = F.split(F.col(text_col), " ")
    toks = df.select(
        F.col(id_col), w.alias("__w"), F.size(w).alias("__n")
    ).where(F.col("__n") >= k)
    gram_txt = F.concat_ws(
        " ", F.slice(F.col("__w"), F.col("__g") + 1, k)
    )
    gram = F.xxhash64(gram_txt) if hash_grams else gram_txt
    occ = toks.select(
        F.col(id_col),
        F.col("__w"),
        F.col("__n"),
        F.explode(F.sequence(F.lit(0), F.col("__n") - k)).alias("__g"),
    ).select(
        F.col(id_col), F.col("__n"), F.col("__g"), gram.alias("__gram")
    )
    if prefilter == "bloom":
        # materialize the gram set once — both the bitmap build and the
        # confirm join read it, and recomputing means re-tokenizing the
        # whole benchmark side (same eager-localCheckpoint seam as the
        # cluster-contraction edge frames)
        bgrams = bgrams.localCheckpoint()
        cand = bloom_prefilter(occ, "__gram", bgrams, "__gram", bloom_fpp)
        hits = cand.join(bgrams, "__gram", "left_semi")
    else:
        hits = occ.join(F.broadcast(bgrams), "__gram", "left_semi")
    merged = merged_spans(F.sort_array(F.collect_list("__g")), k)
    return (
        hits.groupBy(F.col(id_col), F.col("__n"))
        .agg(merged.alias("spans"))
        .select(
            F.col(id_col),
            F.col("spans"),
            F.size("spans").cast("long").alias("n_spans"),
            F.aggregate(
                "spans",
                F.lit(0),
                lambda acc, s: acc + s["end"] - s["start"],
            ).cast("long").alias("contaminated_tokens"),
            F.col("__n").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "contamination_frac",
            F.round(
                F.col("contaminated_tokens")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        )
    )


def embedding_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    bench_vec_col: str | None = None,
    bench_id_col: str | None = None,
    margin: float = 1e-9,
) -> DataFrame:
    """Embedding-space decontamination (d20): flag corpus documents
    whose embedding is near-identical to ANY benchmark/eval-set
    embedding — the semantic sibling of the n-gram decontamination
    family (d17/d19 catch verbatim leaks; paraphrased leaks survive
    n-gram checks but not embedding cosine — the SemDeDup observation
    applied cross-set).

    Decision rule (exact, engine-reproducible): a corpus row is
    contaminated iff max cosine over all benchmark vectors ≥
    ``threshold``; ``bench_id`` is the best match (max cosine, ties →
    smallest benchmark id) and ``cosine`` its similarity, rounded 6
    JVM-side. Zero-norm vectors are never flagged (NaN cosine).

    Execution (the d18 gemm-kernel pattern): the benchmark is
    COLLECTED and closed over — benchmarks are MBs against corpus TBs,
    the same boundedness argument as d17's broadcast gram set — and
    one Arrow ``mapInPandas`` pass computes each corpus vector's
    benchmark cosines by float64 gemm, shortlists entries within
    ``margin`` of the row max, and rescores them with the bit-exact
    left-to-right ``cumsum`` fold (≡ the SQL ``aggregate`` fold of
    :func:`similarity._dot`, see :func:`_gemm_cell_pairs`), so the
    reported cosine is EXACTLY what a codegen cross-join would emit —
    at N·B gemm speed, zero shuffles, no N×B row explosion."""
    import numpy as np
    import pandas as pd

    bvc = bench_vec_col or vec_col
    bic = bench_id_col or id_col
    bench_rows = benchmark.select(
        F.col(bic).alias("__bid"),
        F.col(bvc).cast("array<double>").alias("__bv"),
    ).collect()
    if not bench_rows:
        empty_schema = T.StructType(
            [
                corpus.schema[id_col],
                T.StructField("bench_id", benchmark.schema[bic].dataType),
                T.StructField("cosine", T.DoubleType()),
            ]
        )
        return corpus.sparkSession.createDataFrame([], empty_schema)
    bids = [r["__bid"] for r in bench_rows]
    bmat = np.array(
        [np.asarray(r["__bv"], dtype=np.float64) for r in bench_rows]
    )
    # bit-exact sequential benchmark norms (== _norm's fold)
    bnorm = np.sqrt(np.cumsum(bmat * bmat, axis=1)[:, -1])

    c = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    out_schema = T.StructType(
        [
            T.StructField("__id", c.schema["__id"].dataType),
            T.StructField("bench_id", benchmark.schema[bic].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf["__v"]]
            )
            vnorm = np.sqrt(np.cumsum(v * v, axis=1)[:, -1])
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (v @ bmat.T) / np.outer(vnorm, bnorm)
            sims = np.where(np.isfinite(sims), sims, -np.inf)
            best_g = sims.max(axis=1)
            ids = pdf["__id"].to_numpy()
            out = []
            for i in range(len(pdf)):
                if best_g[i] < threshold - margin:
                    continue
                best_cos, best_bid = None, None
                for j in np.nonzero(sims[i] >= best_g[i] - margin)[0]:
                    dot = np.cumsum(v[i] * bmat[j])[-1]
                    cos = dot / (vnorm[i] * bnorm[j])
                    if (
                        best_cos is None
                        or cos > best_cos
                        or (cos == best_cos and bids[j] < best_bid)
                    ):
                        best_cos, best_bid = cos, bids[j]
                if best_cos is not None and best_cos >= threshold:
                    out.append((ids[i], best_bid, best_cos))
            yield pd.DataFrame(
                out, columns=["__id", "bench_id", "cosine"]
            )

    return c.mapInPandas(scan, out_schema).select(
        F.col("__id").alias(id_col),
        "bench_id",
        F.round("cosine", 6).alias("cosine"),
    )


def suggest_n_cells(n_rows: int, target_cell: int = 1024) -> int:
    """Corpus-scaled SemDeDup cell count (the sizing rule the d18
    docstring used to leave to the caller — now encoded, like
    :func:`auto_n_planes` / ``state.suggest_n_buckets``). Two forces:
    the per-cell pair scan is (N/C)² per cell — C ≈ √N keeps total
    pair work ≈ N^1.5 — and a cell must FIT an executor's working set,
    so the expected cell is also capped at ``target_cell`` rows once
    √N would exceed it. C = max(⌈√N⌉, ⌈N/target_cell⌉)."""
    import math

    n = max(1, int(n_rows))
    return max(1, math.ceil(math.sqrt(n)), math.ceil(n / max(1, target_cell)))


def _gemm_assignment_candidates(
    c: DataFrame,
    centroids: DataFrame,
    n_probes: int,
    eps: float = 5e-8,
) -> DataFrame:
    """Cell-assignment shortlist for SemDeDup — kills the OTHER
    interpreted hot loop in d18: the naive assignment explodes N×C
    (vector, centroid) rows and evaluates one higher-order-function
    cosine per row (2.8M interpreted folds at N=20k, C=142 — measured
    to dominate the whole operator, not the pair scan).

    One ``mapInPandas`` pass computes the full N×C cosine matrix by
    float64 gemm and keeps, per vector, every cell whose gemm sim ≥
    (p-th largest gemm sim) − eps. This candidate set PROVABLY
    contains the true top-``n_probes`` cells under the exact rule
    ``(round(sim, 8) desc, cell asc)``: with gemm-vs-sequential-fold
    error e ≈ d·ulp ≈ 1e-13, a cell outside the shortlist is at least
    eps − 2e > 4.9e-8 > 1e-8 below p other cells' true sims, so after
    round-to-8 (which moves a value ≤ 0.5e-8) it ranks strictly below
    all p — it cannot be a winner or even a rounded tie. The caller
    then recomputes sim on ONLY the shortlist rows with the same SQL
    expression as before, so winners (and the emitted frame) are
    bit-identical to the full N×C plan.

    Non-finite gemm sims (zero-norm vector or centroid) are promoted
    to +inf so those (row, cell) pairs stay in the shortlist and the
    SQL recomputation preserves the engine's native behavior (ANSI
    division error / non-ANSI NULL) instead of silently dropping rows.

    Centroids are collected to the driver — bounded by the SemDeDup
    contract (C ≈ √N, broadcast-sized by design). No shuffle: the
    pass is a projection, the rejoin a broadcast."""
    import numpy as np
    import pandas as pd

    cent_rows = centroids.select("cell", "centroid").collect()
    cell_ids = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    mat = np.array(
        [np.asarray(r["centroid"], dtype=np.float64) for r in cent_rows]
    )
    cnorm = np.sqrt((mat * mat).sum(axis=1))
    p = min(int(n_probes), len(cent_rows))

    id_field = c.schema["__id"]
    out_schema = T.StructType(
        [
            T.StructField("__id", id_field.dataType),
            T.StructField("__v", T.ArrayType(T.DoubleType())),
            T.StructField("__cells", T.ArrayType(T.IntegerType())),
        ]
    )

    def shortlist(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf["__v"]]
            )
            vnorm = np.sqrt((v * v).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (v @ mat.T) / np.outer(vnorm, cnorm)
            sims = np.where(np.isfinite(sims), sims, np.inf)
            kth = np.partition(sims, len(cent_rows) - p, axis=1)[
                :, len(cent_rows) - p
            ]
            keep = sims >= (kth - eps)[:, None]
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "__v": pdf["__v"],
                    "__cells": [
                        cell_ids[m].tolist() for m in keep
                    ],
                }
            )

    return (
        c.mapInPandas(shortlist, out_schema)
        .select("__id", "__v", F.explode("__cells").alias("cell"))
        .join(F.broadcast(centroids), "cell")
    )


def _gemm_cell_pairs(
    assigned: DataFrame,
    threshold: float,
    block_rows: int = 4096,
    margin: float = 1e-9,
) -> DataFrame:
    """Within-cell near-dup pair scan as a per-cell BLAS kernel —
    the d18 prefilter composition (round-9 verdict task: the (N/C)²
    pair scan was the suite's worst-scaling row under the interpreted
    higher-order-function join).

    One ``applyInPandas`` group per cell: a float64 gemm computes the
    full within-cell cosine matrix (blocked at ``block_rows`` rows so
    memory is block×m, never m×m for fat cells), shortlists entries at
    ``threshold − margin``, then rescores each candidate with the
    bit-exact sequential fold (elementwise float64 product →
    ``np.cumsum`` — the same left-to-right IEEE accumulation the SQL
    ``aggregate`` lambda of :func:`similarity._dot` performs), so the
    emitted ``(id_a, id_b, cell, cosine)`` rows are EXACTLY what the
    codegen self-join emits. margin=1e-9 ≫ the ~d·ulp gemm-vs-
    sequential divergence, so the shortlist is a provable superset:
    lossless, not approximately-recalled.

    Input: ``(__id, cell, __v array<double>)``. Zero-norm vectors
    error at cell ASSIGNMENT under ANSI mode before either kernel
    runs; should one reach this kernel (non-ANSI sessions), its NaN
    cosine never passes the threshold, matching the join kernel's
    non-ANSI NULL-comparison semantics."""
    import numpy as np
    import pandas as pd

    id_field = assigned.schema["__id"]
    cell_field = assigned.schema["cell"]
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_field.dataType),
            T.StructField("id_b", id_field.dataType),
            T.StructField("cell", cell_field.dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=pdf["__id"].dtype),
                "id_b": pd.Series([], dtype=pdf["__id"].dtype),
                "cell": pd.Series([], dtype=pdf["cell"].dtype),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        ids = pdf["__id"].to_numpy()
        v = np.array(
            [np.asarray(x, dtype=np.float64) for x in pdf["__v"]]
        )
        # bit-exact sequential norms (== _norm's left-to-right fold)
        norms = np.sqrt(np.cumsum(v * v, axis=1)[:, -1])
        cell = pdf["cell"].iloc[0]
        out_a: list = []
        out_b: list = []
        out_cos: list = []
        lo = threshold - margin
        with np.errstate(divide="ignore", invalid="ignore"):
            for i0 in range(0, m, block_rows):
                i1 = min(i0 + block_rows, m)
                sim = (v[i0:i1] @ v.T) / np.outer(norms[i0:i1], norms)
                for bi, j in zip(*np.nonzero(sim >= lo)):
                    i = i0 + bi
                    ia, ib = ids[i], ids[j]
                    if not ia < ib:
                        continue
                    dot = np.cumsum(v[i] * v[j])[-1]
                    cos = dot / (norms[i] * norms[j])
                    if cos >= threshold:
                        out_a.append(ia)
                        out_b.append(ib)
                        out_cos.append(cos)
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype=pdf["__id"].dtype),
                "id_b": pd.Series(out_b, dtype=pdf["__id"].dtype),
                "cell": pd.Series(
                    [cell] * len(out_a), dtype=pdf["cell"].dtype
                ),
                "cosine": pd.Series(out_cos, dtype="float64"),
            }
        )

    return assigned.groupBy("cell").applyInPandas(scan, out_schema)


def semantic_duplicates(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_cells: int = 16,
    centroids: DataFrame | None = None,
    use_kmeans: bool = False,
    train_cap: int = 100_000,
    seed: int = 42,
    n_probes: int = 1,
    pair_scan: str = "gemm",
    gemm_block_rows: int = 4096,
) -> DataFrame:
    """Semantic (embedding-cluster) dedup — the SemDeDup recipe (Abbas
    et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", public paper): cluster the
    embedding space with a coarse quantizer, then search for
    near-duplicate pairs ONLY within each cluster — the quadratic pair
    scan shrinks from N² to Σ cell² ≈ N²/C, the trade that makes
    embedding dedup feasible at corpus scale. Complements d05
    (hyperplane LSH): cells adapt to the data's density instead of
    random cuts.

    Decision rule (exact, engine-reproducible): within a cell, a doc
    is a ``sem_dup`` iff some SMALLER id in the same cell has cosine ≥
    ``threshold`` with it; ``dup_of`` is the smallest such id and
    ``cosine`` the similarity to that doc (rounded 6). Returns only
    the dropped rows: ``(id_col, cell, dup_of, cosine)`` — everything
    else is kept.

    Quantizer: ``centroids`` (``(cell int, centroid array<double>)``)
    if given; else ``use_kmeans=True`` trains MLlib k-means on a
    bounded sample (the production path — data-adaptive but not
    oracle-reproducible); else the vectors of the ``n_cells`` smallest
    ids (deterministic, DuckDB-reproducible — the registry path).
    Assignment is argmax cosine, ties → smallest cell (rounded to 8
    before comparing, same tie discipline as the IVF probes).

    Scale: centroids broadcast (C ≈ √N rows); assignment is one
    map-side pass; the only shuffle is the per-cell self-join, whose
    worst key is the largest cell (``suggest_n_cells(N)`` encodes the
    sizing rule; AQE skew-split absorbs residual imbalance).

    ``n_probes > 1`` assigns each vector to its top-``n_probes`` cells
    (multi-probe): a pair is scanned iff the two share ANY probed cell,
    recovering near-dups that straddle a cell boundary — the measured
    recall fix when single-probe falls short (BASELINE §17). Work
    scales ~``n_probes``²·N²/C; results are a superset of single-probe
    (monotone in ``n_probes``) and remain engine-reproducible.

    ``pair_scan`` picks the within-cell kernel, LOSSLESSLY:

    - ``"gemm"`` (default) — each cell flows through an Arrow-batched
      ``applyInPandas``: a float64 BLAS gemm shortlists pairs at
      ``threshold − 1e-9``, then every candidate is RESCORED with a
      left-to-right ``cumsum`` fold that is bit-identical to the SQL
      ``aggregate`` fold of :func:`_dot`/:func:`_norm` — so the output
      (ids, cells, cosines) is exactly the join path's, at matrix-
      multiply speed instead of one interpreted higher-order-function
      evaluation per pair. The 1e-9 margin dwarfs the worst-case gemm
      vs sequential-sum divergence (~d·ulp ≈ 1e-14 at d=64), so no
      true pair can be shortlisted away. Blocked at
      ``gemm_block_rows`` rows per gemm so a fat cell never
      materializes an m×m similarity matrix.
    - ``"join"`` — the pure-codegen within-cell self-join; keeps the
      whole plan JVM-side (no Python workers) for plan-parity demos
      and Arrow-less environments.

    Both kernels implement the same decision rule; the choice is a
    physical-plan knob, not a semantics knob (pinned by an equality
    test over random cells)."""
    from southpaw_spark.operators.similarity import _dot, _norm

    if n_cells < 1:
        raise ValueError(f"n_cells must be >= 1; got {n_cells}")
    if not 1 <= n_probes <= n_cells:
        raise ValueError(
            f"n_probes must be in [1, n_cells={n_cells}]; got {n_probes}"
        )
    if pair_scan not in ("gemm", "join"):
        raise ValueError(
            f"pair_scan must be 'gemm' or 'join'; got {pair_scan!r}"
        )
    c = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    if centroids is None:
        if use_kmeans:
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector

            train = c.select(array_to_vector("__v").alias("features"))
            n = c.count()
            if n > train_cap:
                train = train.sample(
                    fraction=min(1.0, train_cap / n), seed=seed
                )
            model = KMeans(
                k=n_cells, seed=seed, featuresCol="features"
            ).fit(train)
            centroids = corpus.sparkSession.createDataFrame(
                [
                    (i, [float(x) for x in ctr])
                    for i, ctr in enumerate(model.clusterCenters())
                ],
                "cell int, centroid array<double>",
            )
        else:
            from pyspark.sql import Window

            head = c.orderBy("__id").limit(n_cells)
            centroids = head.select(
                (
                    F.row_number().over(Window.orderBy("__id")) - 1
                ).alias("cell"),
                F.col("__v").alias("centroid"),
            )
    sim = F.try_divide(
        _dot(F.col("__v"), F.col("centroid")),
        _norm(F.col("__v")) * _norm(F.col("centroid")),
    )
    if pair_scan == "gemm":
        # gemm shortlist: same (vector, centroid) pairs the winners
        # come from, ~C/n_probes fewer interpreted sim evaluations
        expanded = _gemm_assignment_candidates(c, centroids, n_probes)
    else:
        expanded = c.join(F.broadcast(centroids))
    if n_probes == 1:
        # single-probe keeps the shuffle-light max_by plan (and the
        # registry oracle's exact output) untouched
        assigned = (
            expanded
            .groupBy("__id")
            .agg(
                F.max_by(
                    "cell",
                    F.struct(
                        F.round(sim, 8).alias("s"),
                        (-F.col("cell")).alias("c"),
                    ),
                ).alias("cell"),
                F.first("__v").alias("__v"),
            )
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("__id").orderBy(
            F.col("__s").desc(), F.col("cell").asc()
        )
        assigned = (
            expanded
            .select("__id", "__v", "cell", F.round(sim, 8).alias("__s"))
            .withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= n_probes)
            .select("__id", "cell", "__v")
        )
    if pair_scan == "gemm":
        pairs = _gemm_cell_pairs(
            assigned, threshold, block_rows=gemm_block_rows
        )
    else:
        a = assigned.select(
            F.col("__id").alias("id_a"), "cell", F.col("__v").alias("__va")
        )
        b = assigned.select(
            F.col("__id").alias("id_b"), "cell", F.col("__v").alias("__vb")
        )
        cos = F.try_divide(
            _dot(F.col("__va"), F.col("__vb")),
            _norm(F.col("__va")) * _norm(F.col("__vb")),
        )
        pairs = (
            a.join(b, "cell")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .where(F.col("cosine") >= threshold)
        )
    # multi-probe can surface the same pair through several shared
    # cells: report the cell deterministically from the smallest
    # (dup_of, cell) witness — identical to first() when n_probes=1
    # (every row of a group then carries id_b's single cell)
    return (
        pairs.groupBy(F.col("id_b").alias(id_col))
        .agg(
            F.min_by(
                "cell", F.struct(F.col("id_a"), F.col("cell"))
            ).alias("cell"),
            F.min("id_a").alias("dup_of"),
            F.round(F.min_by("cosine", "id_a"), 6).alias("cosine"),
        )
    )


def jaccard_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    corpus_shingles: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy (near-duplicate) decontamination — completes the
    decontamination triple: d17/d19 catch VERBATIM n-gram leaks, d20
    catches SEMANTIC (embedding) leaks, this catches EDITED copies of
    benchmark items — light paraphrases/reorderings that break exact
    n-gram containment but keep most shingles. A corpus doc is flagged
    iff its exact n-gram-set Jaccard against SOME benchmark doc ≥
    ``threshold``; reported with the best match (max Jaccard rounded
    8, ties → smallest bench id) and the similarity rounded 6.

    Plan (cross-set, exact — no LSH recall risk): shingle both sides
    with the §18 codegen constructor; benchmarks are MBs against
    corpus TBs (the d17 boundedness argument), so every benchmark-side
    frame BROADCASTS. A naive shared-shingle join is unbounded in HOT
    shingles (a boilerplate 3-gram in D corpus docs × B bench docs is
    D·B join rows — measured 12.9× wall at 10× data on the rotation
    corpus), so candidates come from the LOSSLESS PPJoin prefix filter
    (Xiao et al. PVLDB'08, the d02 machinery cross-set): under a
    global rarity order (corpus doc-freq asc, shingle asc), two sets
    with Jaccard ≥ t must share an element inside each other's first
    ``len − ceil(t·len) + 1`` shingles — so only RARE-shingle
    collisions generate candidates, and each candidate pair is
    verified by one codegen ``array_intersect`` against the broadcast
    benchmark arrays (no per-(pair, shingle) shuffle; the ε-relaxed
    ceil only ever WIDENS a prefix, the d02 float-boundary
    discipline). Jaccard is one division of exact integers — the
    filter changes the plan, never the output. Docs shorter than ``n``
    words carry no shingle evidence and are never flagged (the d17
    no-evidence rule).

    ``corpus_shingles``: a precomputed ``(id, shingle)`` frame from
    :func:`shingles` with the SAME ``n`` over exactly the rows of
    ``corpus`` — the shared-inventory seam (see
    :func:`ngram_jaccard_pairs`); identical output, one corpus
    shingling saved."""
    from pyspark.sql import Window

    btc = bench_text_col or text_col
    bic = bench_id_col or id_col
    cs = (
        corpus_shingles if corpus_shingles is not None
        else shingles(corpus, text_col, id_col, n)
    )
    bs = shingles(
        benchmark.select(
            F.col(bic).alias("bench_id"), F.col(btc).alias("__bt")
        ),
        "__bt",
        "bench_id",
        n,
    )
    dfreq = cs.groupBy("shingle").agg(F.count("*").alias("__df"))

    def prefix(frame, key):
        # dfreq is corpus-sized: the join hashes on shingle and AQE
        # broadcasts whichever side is small (the bench frame is)
        joined = frame.join(dfreq, "shingle", "left")
        w = Window.partitionBy(key).orderBy(
            F.coalesce(F.col("__df"), F.lit(0)), F.col("shingle")
        )
        return (
            joined.withColumn(
                "__n", F.count("*").over(Window.partitionBy(key))
            )
            .withColumn("__r", F.row_number().over(w))
            .where(
                F.col("__r")
                <= F.col("__n")
                - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(_EPS))
                + 1
            )
            .select(key, "shingle")
        )

    cpref = prefix(cs, id_col)
    bpref = prefix(bs, "bench_id")
    cands = (
        cpref.join(F.broadcast(bpref), "shingle")
        .select(id_col, "bench_id")
        .distinct()
    )
    carr = cs.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle")).alias("__ca")
    )
    barr = bs.groupBy("bench_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("__ba")
    )
    verified = (
        cands.join(carr, id_col)
        .join(F.broadcast(barr), "bench_id")
        .select(
            id_col,
            "bench_id",
            F.size(F.array_intersect("__ca", "__ba")).alias("__shared"),
            F.size("__ca").alias("__na"),
            F.size("__ba").alias("__nb"),
        )
    )
    jac = F.col("__shared") / (
        F.col("__na") + F.col("__nb") - F.col("__shared")
    ).cast("double")
    scored = verified.withColumn("__j", jac).where(
        F.col("__j") >= threshold
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min_by(
                "bench_id",
                F.struct(
                    (-F.round(F.col("__j"), 8)).alias("nj"),
                    F.col("bench_id"),
                ),
            ).alias("bench_id"),
            F.round(
                F.max(F.round(F.col("__j"), 8)), 6
            ).alias("jaccard"),
        )
    )


def duplicate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-global duplicated-LINE inventory (d22) — the
    repeated-line removal stage of RefinedWeb / MassiveText (Penedo et
    al. 2023; Rae et al. 2021 — public papers): boilerplate lines
    (navigation bars, cookie banners, license footers) repeat VERBATIM
    across pages, and removing every occurrence corpus-wide is the
    classic web-corpus cleanup that per-document filters (t19's C4
    line rules) cannot see — t19 judges each line in isolation, this
    judges a line by its corpus-wide frequency. Distinct from d15's
    k-gram spans: the unit is the LINE (split on ``\\n``), so
    paragraph structure decides granularity, not a token window.

    Returns ``(line, n_occurrences)`` for every non-empty line whose
    exact text occurs ≥ ``min_count`` times corpus-wide (occurrences
    inside one document count — self-repeated boilerplate is
    boilerplate; the d15 discipline). Empty lines are never counted:
    they are paragraph breaks, not content.

    Plan: one ``split``+``explode`` projection, ONE combiner-friendly
    ``groupBy(line)`` — a line repeated 1M× partial-aggregates
    map-side, so hot boilerplate costs one row per task, not per
    occurrence. Nothing else shuffles."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2; got {min_count}")
    return (
        df.select(
            F.explode(F.split(F.col(text_col), "\n")).alias("line")
        )
        .where(F.col("line") != "")
        .groupBy("line")
        .agg(F.count("*").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )


def remove_duplicate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Apply :func:`duplicate_lines`: rewrite every document with ALL
    occurrences of corpus-duplicated lines removed (RefinedWeb drops
    every copy — a boilerplate line is noise wherever it appears).
    Returns the input rows plus ``{text_col}_clean`` (surviving lines
    re-joined with ``\\n`` — empty string if every line was
    boilerplate), ``n_lines_before``/``n_lines_after`` and
    ``n_tokens_after`` (whitespace tokens of the clean text, for the
    pipeline's drop-empty + budget refresh). Documents with no
    duplicated line pass through unchanged. Empty lines always
    survive (never counted as duplicates).

    Plan (the d16 shape): the duplicated-position set is derived only
    for AFFECTED docs — occurrences semi-join the duplicate inventory
    (each occurrence matches ≤ 1 inventory row, so a hot line cannot
    blow the join up; AQE broadcasts the inventory when small, the
    usual case — boilerplate vocabularies are tiny), one
    ``groupBy(id)`` collects the doc's own duplicated positions
    (bounded by doc length), and the rewrite is a per-row ``F.filter``
    over the line array — no reassembly shuffle for clean docs."""
    lines = F.split(F.col(text_col), "\n")
    occ = df.select(
        F.col(id_col),
        F.posexplode(lines).alias("__pos", "line"),
    ).where(F.col("line") != "")
    dup = duplicate_lines(df, text_col, id_col, min_count=min_count)
    hit_pos = (
        occ.join(dup.select("line"), "line", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("__pos").alias("__dup_pos"))
    )
    kept = F.filter(
        lines,
        lambda x, i: ~F.array_contains(
            F.coalesce(F.col("__dup_pos"), F.array().cast("array<int>")), i
        ),
    )
    clean = F.concat_ws("\n", kept)
    return (
        df.join(hit_pos, id_col, "left")
        .select(
            *[F.col(c) for c in df.columns],
            clean.alias(f"{text_col}_clean"),
            F.size(lines).cast("long").alias("n_lines_before"),
            F.size(kept).cast("long").alias("n_lines_after"),
            F.when(clean == "", F.lit(0))
            .otherwise(F.size(F.split(clean, " ")))
            .cast("long")
            .alias("n_tokens_after"),
        )
    )


def cut_lines(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Apply a LINE-position spans frame ``(id_col,
    spans array<struct<start,end>>)`` to a corpus: rebuild each
    document with the covered LINES removed — :func:`cut_spans`'s
    sibling with ``\\n`` as the unit (consumed by the streaming d22,
    :class:`streaming.dedup_stream.IncrementalLineDeduper`, whose
    updates carry line positions). Returns the input rows plus
    ``{text_col}_clean``, ``n_lines_before``/``n_lines_after`` and
    ``n_tokens_after`` — the exact :func:`remove_duplicate_lines`
    output contract; docs absent from ``spans`` pass through
    unchanged."""
    lines = F.split(F.col(text_col), "\n")
    sp = F.coalesce(
        F.col("spans"),
        F.expr("CAST(array() AS array<struct<start:int,`end`:int>>)"),
    )
    kept = F.filter(
        lines,
        lambda x, i: ~F.exists(
            sp, lambda s: (i >= s["start"]) & (i < s["end"])
        ),
    )
    clean = F.concat_ws("\n", kept)
    return (
        df.join(spans.select(F.col(id_col), "spans"), id_col, "left")
        .select(
            *[F.col(c) for c in df.columns],
            clean.alias(f"{text_col}_clean"),
            F.size(lines).cast("long").alias("n_lines_before"),
            F.size(kept).cast("long").alias("n_lines_after"),
            F.when(clean == "", F.lit(0))
            .otherwise(F.size(F.split(clean, " ")))
            .cast("long")
            .alias("n_tokens_after"),
        )
    )
