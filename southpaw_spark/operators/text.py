"""Text-analysis operators: token counting, quality scoring, language
heuristics, fingerprinting. All pure Column expressions (JVM-side,
whole-stage codegen) — no UDFs — so they run at scan speed on 100 TB.

Determinism contract: tokenization is split-on-single-space and every
ratio is rounded to 6 decimals, so DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def hash_priority(id_col: str, salt: str = "") -> Column:
    """Deterministic 32-bit hash priority from a row id:
    ``conv(substr(md5(salt|id), 1, 8), 16, 10)`` as a long in
    [0, 2³²). The ONE ordering primitive behind every sampling/shuffle
    operator here (t08 stratified sampling, t15 token budgets, t16
    epoch shuffle, the corpus writers): unlike ``rand()`` it is stable
    under retries, re-partitioning, and across engines (DuckDB
    reproduces it literally), and ``salt`` redraws independently."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + "|"), F.col(id_col).cast("string")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def with_token_count(df: DataFrame, text_col: str) -> DataFrame:
    w = tokens(F.col(text_col))
    return df.withColumn("n_tokens", F.size(w).cast("long"))


def with_quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic document quality: length saturation × stopword evidence.
    Mirrors the usual web-corpus filters (length, mean token length,
    stopword ratio) with an explicit, reproducible formula."""
    w = tokens(F.col(text_col))
    n = F.size(w).cast("long")
    total_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    mean_len = F.round(total_len.cast("double") / n, 6)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = F.round(n_stop.cast("double") / n, 6)
    quality = F.round(
        F.least(F.lit(1.0), n / F.lit(100.0)) * (F.lit(0.5) + F.lit(0.5) * stop_ratio),
        6,
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn("mean_token_len", mean_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", quality)
    )


def with_lang_guess(df: DataFrame, text_col: str) -> DataFrame:
    """Marker-based language heuristic (the synthetic corpus carries no
    real language signal; the operator demonstrates the classification
    shape with an engine-reproducible rule)."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    guess = (
        F.when(padded.like("% the %"), F.lit("en"))
        .when(F.size(tokens(F.col(text_col))) < 5, F.lit("short"))
        .otherwise(F.lit("other"))
    )
    return df.withColumn("lang_guess", guess)


#: BPE-ish pre-tokenization split: letter runs, digit runs, single
#: punctuation — the usual first pass before byte-pair merging. ASCII
#: classes only, so Java regex (Spark) and RE2 (DuckDB) agree.
BPE_TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def with_regex_token_count(df: DataFrame, text_col: str) -> DataFrame:
    """Token count under a BPE-ish regex tokenizer (vs the whitespace
    tokenizer of with_token_count)."""
    return df.withColumn(
        "n_bpe_tokens",
        F.expr(
            f"size(regexp_extract_all({text_col}, '{BPE_TOKEN_PATTERN}', 0))"
        ).cast("long"),
    )


def with_normalized_text(df: DataFrame, text_col: str) -> DataFrame:
    """Canonical text normalization for dedup cascades: lowercase,
    punctuation stripped, whitespace collapsed and trimmed. ASCII regex
    classes keep Java regex (Spark) and RE2 (DuckDB) in agreement."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.withColumn("norm_text", norm)


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Per-document top-k TF-IDF terms — classic corpus statistics as a
    pure shuffle plan: term frequencies per doc, document frequencies per
    term (one groupBy each), smoothed idf = ln((N+1)/(df+1)) + 1, then a
    per-doc top-k window. Deterministic (ties broken by term) so a SQL
    oracle reproduces it exactly."""
    from pyspark.sql import Window

    n_docs = df.count()
    tok = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        F.round(F.col("tf") * idf, 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select(id_col, "term", "tfidf", F.col("rk").alias("rank"))
    )


def with_fingerprint(df: DataFrame, text_col: str) -> DataFrame:
    """Content fingerprint: hash of normalized prefix + exact length —
    a cheap first-pass identity for dedup cascades."""
    fp = F.md5(
        F.concat(
            F.lower(F.substring(F.col(text_col), 1, 64)),
            F.lit("|"),
            F.length(F.col(text_col)).cast("string"),
        ).cast("binary")
    )
    return df.withColumn("fingerprint", fp)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling for training-data mixes: keep a
    row iff md5(salt|id) maps below the stratum's rate. Hash-threshold
    sampling (not rand()) so the sample is reproducible across runs AND
    engines, stable under re-partitioning, and needs no shuffle — it is
    a pure filter that runs at scan speed and composes with pushdown.
    Changing ``salt`` draws an independent sample."""
    u = hash_priority(id_col, salt) / F.lit(
        float(0xFFFFFFFF)
    )  # uniform [0,1) from the hash prefix
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.where(u < rate)


def sequence_packing(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shard_col: str,
    token_budget: int = 2048,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Sequence packing for training: within each shard, documents (in
    deterministic ``id_col`` order) are assigned pack index =
    floor(preceding cumulative tokens / budget) — fixed token-offset
    boundaries, the shuffle-free streaming approximation of greedy
    packing. Precisely: a document spanning a boundary belongs to the
    EARLIER pack, so a pack may exceed the budget by up to one document's
    tokens (bound doc length upstream, or truncate the spanning tail at
    materialization). True greedy never-overflow packing is inherently
    sequential per shard — it would be an applyInPandas over the shard,
    not a window.

    Scale: the window partitions by ``shard_col`` — never a global
    ORDER BY (which would serialize onto one partition). Training
    pipelines shard packing anyway (per language/source), so the shard
    key is part of the operator contract, not a compromise.

    ``n_tokens_col``: use a precomputed per-doc token count (e.g. the
    REAL BPE count from :func:`operators.bpe.with_bpe_token_count`)
    instead of the whitespace split — budgets at production are
    measured against the actual tokenizer."""
    return _pack_assignments(
        df, text_col, id_col, shard_col, token_budget, n_tokens_col, []
    )


def _pack_assignments(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shard_col: str,
    token_budget: int,
    n_tokens_col: str | None,
    extra_cols: list[str],
) -> DataFrame:
    """The packing math shared by :func:`sequence_packing` (assignments
    only) and :func:`pack_sequences` (which threads ``text_col``
    through as an ``extra_col`` so materialization never pays a second
    full-corpus join)."""
    n_tok = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else F.size(tokens(F.col(text_col))).cast("long")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    preceding = F.coalesce(F.sum(n_tok).over(w), F.lit(0).cast("long"))
    return df.select(
        F.col(id_col),
        F.col(shard_col),
        n_tok.alias("n_tokens"),
        F.floor(preceding / token_budget).cast("long").alias("pack_id"),
        *[F.col(c) for c in extra_cols],
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shard_col: str,
    token_budget: int = 2048,
    n_tokens_col: str | None = None,
    separator: str = "<eos>",
) -> DataFrame:
    """MATERIALIZE the training sequences :func:`sequence_packing`
    assigns (t25) — the last step of a corpus build: one row per
    ``(shard, pack_id)`` with the pack's documents concatenated in
    ``id_col`` order, ``separator``-joined, the literal examples a
    training loader streams (GPT-style document packing; Raffel et al.
    2020 §2.2 pack with EOS sentinels exactly like this). Output:
    ``(shard, pack_id, n_docs, n_tokens, text)`` — ``n_tokens`` is the
    sum of member documents' counts (the separator is tokenizer-
    specific and NOT counted; budget accounting matches
    :func:`sequence_packing`).

    Scale: the pack assignment window (one shuffle on ``shard_col``)
    feeds the group-by directly — ``(shard, pack_id)`` grouping is
    satisfied by the shard partitioning, so Catalyst adds NO second
    exchange, and the text never pays a join back. Per-pack state is
    the pack's own documents (bounded by ``token_budget`` plus one
    spanning doc), sorted in-memory via ``array_sort`` on (id, text)
    structs — never a window re-sort."""
    tagged = _pack_assignments(
        df, text_col, id_col, shard_col, token_budget, n_tokens_col,
        [text_col],
    )
    members = F.array_sort(
        F.collect_list(F.struct(F.col(id_col), F.col(text_col)))
    )
    return (
        tagged.groupBy(shard_col, "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.array_join(
                F.transform(members, lambda x: x[text_col]),
                separator,
            ).alias("text"),
        )
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, how many
    of its distinct word n-grams appear anywhere in the benchmark set —
    the standard train/eval decontamination pass (long-n-gram collision)
    run before training-data release.

    Scale shape: the benchmark side reduces to a DISTINCT set of 8-byte
    n-gram hashes, which is tiny relative to any corpus (eval sets are
    MBs against TBs) — so it broadcasts and the probe is a map-side
    hash-join over the corpus shingle stream; no shuffle of corpus
    n-grams at all. Corpus docs shorter than ``n`` words carry no n-gram
    evidence and are excluded (documented; both engines agree).
    """
    from southpaw_spark.operators.dedup import shingles

    sh_c = shingles(corpus, text_col, id_col, n).select(
        F.col(id_col), F.xxhash64("shingle").alias("sh")
    )
    sh_b = (
        shingles(benchmark, text_col, id_col, n)
        .select(F.xxhash64("shingle").alias("sh"))
        .distinct()
    )
    per_doc = sh_c.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    hits = (
        sh_c.join(F.broadcast(sh_b), "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return per_doc.join(hits, id_col, "left").select(
        F.col(id_col),
        F.col("n_ngrams"),
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_ngrams"), 6
        ).alias("contamination_rate"),
    )


def repetition_signals(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-style repetition
    filters): duplicate-word fraction and top-bigram fraction per
    document. High values flag boilerplate/spam for training-data
    filtering.

    dup_word_frac is a pure codegen expression. top_bigram_frac counts
    ALL bigram occurrences (not distinct), so it explodes + groupBys —
    two shuffles keyed by (doc, bigram-hash), which scales linearly with
    corpus token count (the same shape as t07's TF-IDF); a per-doc
    in-array O(L²) rewrite would not survive long documents.
    """
    w = F.split(F.col(text_col), " ")
    dup_word_frac = F.round(
        1.0 - F.size(F.array_distinct(w)) / F.size(w), 6
    )
    base = df.select(
        F.col(id_col),
        F.size(w).alias("n_words"),
        dup_word_frac.alias("dup_word_frac"),
    ).where(F.size(w) >= 2)

    # same ≥2-word guard as `base`; bigrams via arrays_zip of offset
    # slices (codegen) rather than transform(sequence, element_at...),
    # which runs interpreted per position — the same 5× constant fixed
    # in bigram_lm_scores this round (round-11; d03 anti-lesson)
    width = F.size(w) - 1
    pairs = F.arrays_zip(F.slice(w, 1, width), F.slice(w, 2, width))
    bigrams = (
        df.where(F.size(w) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("b"))
        .select(
            F.col(id_col),
            F.concat_ws(" ", F.col("b.0"), F.col("b.1")).alias("bg"),
        )
    )
    per_bg = bigrams.groupBy(id_col, "bg").agg(F.count("*").alias("c"))
    top = per_bg.groupBy(id_col).agg(
        F.max("c").alias("mx"), F.sum("c").alias("n_bg")
    )
    return base.join(top, id_col).select(
        F.col(id_col),
        "n_words",
        "dup_word_frac",
        F.round(F.col("mx") / F.col("n_bg"), 6).alias("top_bigram_frac"),
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str, id_col: str,
    reference: "DataFrame | BigramReferenceModel | None" = None,
) -> DataFrame:
    """Per-document mean log-probability under an add-one-smoothed
    bigram LM → (id, n_bigrams, avg_logprob).

    The fluency signal a quality pipeline uses where a real LM is
    unavailable: shuffled/garbled text scores LOW because the model
    punishes improbable word TRANSITIONS, which surface stats
    (length/punctuation/entropy) cannot see. Docs under two words are
    dropped (no transition evidence).

    ``reference``: train the counts on a CLEAN reference corpus (same
    ``text_col``) instead of ``df`` itself — the actual CCNet recipe
    (Wenzek et al. 2020 score Common Crawl with a Wikipedia-trained
    LM); bigrams/contexts unseen in the reference get the add-one
    floor (``c2=0``/``c1=0`` via left joins), so out-of-domain text
    scores low instead of erroring. Default (None) keeps the
    self-trained in-domain signal (t13's registry semantics).

    Plan: one bigram explode, two combiner-friendly count groupBys
    (bigram, context), ONE equi-join back (self-trained; the context
    counts pre-join the bigram counts at bigram-TYPE level — a
    types×contexts join, tiny next to occurrences — measured 47.6 s →
    29.2 s on the 50k-doc sf1 corpus before the zip-slice fix) or two
    LEFT joins (reference arm — unseen bigrams can't live in a type
    table), one per-doc avg; the vocabulary size is the single bounded
    scalar collected to the driver. At 100 TB the count tables shuffle
    on their keys and AQE picks SMJ — nothing is corpus × corpus."""
    w = F.split(F.col(text_col), " ")
    # bigram construction = arrays_zip of two offset slices (the §18
    # shingles() form), NOT transform(sequence, element_at...): the
    # HOF+element_at pair runs interpreted per position and measured
    # 29.2 s vs 5.5 s for this form on the 50k-doc sf1 corpus —
    # identical output (the d03 anti-lesson, round-11)
    width = F.size(w) - 1
    pairs = F.arrays_zip(F.slice(w, 1, width), F.slice(w, 2, width))
    big = (
        df.where(F.size(w) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("b"))
        .select(
            id_col,
            F.col("b.0").alias("w1"),
            F.col("b.1").alias("w2"),
        )
    )
    if reference is not None:
        # a pre-trained BigramReferenceModel passes straight through —
        # callers scoring several frames against one clean corpus train
        # once (build_corpus shares the gate + bucket stages this way)
        model = (
            reference
            if isinstance(reference, BigramReferenceModel)
            else bigram_reference_model(reference, text_col)
        )
        return _score_bigram_occurrences(big, id_col, model)
    train = big
    vocab_src = df.select(F.explode(w).alias("t"))
    cnt2 = train.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    cnt1 = train.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        vocab_src.agg(F.countDistinct("t").alias("v")).collect()[0]["v"]
    )
    logp = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.lit(float(vocab))))
    # pre-join the counts at bigram-TYPE level (types ≪ occurrences),
    # so the occurrence stream pays ONE join, not two
    types = cnt2.join(cnt1, "w1").select("w1", "w2", logp.alias("__lp"))
    scored = big.join(types, ["w1", "w2"]).select(id_col, "__lp")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("__lp"), 6).alias("avg_logprob"),
        )
    )


class BigramReferenceModel:
    """A trained t27 reference LM, factored for train-once/score-many:
    the (w1, w2) and context count frames plus the collected vocabulary
    scalar. The counts are plain DataFrames — persist() them (and the
    streaming wiring does) when many batches will score against the
    same model; the model itself is static, so any scoring composition
    is batching-independent (the property that makes the streaming
    perplexity gate legal)."""

    __slots__ = ("cnt2", "cnt1", "vocab")

    def __init__(self, cnt2: DataFrame, cnt1: DataFrame, vocab: int):
        self.cnt2 = cnt2
        self.cnt1 = cnt1
        self.vocab = int(vocab)

    def persist(self) -> "BigramReferenceModel":
        self.cnt2 = self.cnt2.persist()
        self.cnt1 = self.cnt1.persist()
        return self

    def unpersist(self) -> None:
        self.cnt2.unpersist()
        self.cnt1.unpersist()


def bigram_reference_model(
    reference: DataFrame, text_col: str
) -> BigramReferenceModel:
    """Train :func:`bigram_lm_scores`'s reference arm ONCE: bigram and
    context counts over the clean reference corpus + the vocabulary
    size (the single bounded scalar collected to the driver). Two
    combiner-friendly count shuffles + one countDistinct — the same
    work the reference arm paid inline; factoring it out lets
    streaming score MANY batches against one trained model."""
    rw = F.split(F.col(text_col), " ")
    rwidth = F.size(rw) - 1
    rpairs = F.arrays_zip(F.slice(rw, 1, rwidth), F.slice(rw, 2, rwidth))
    train = (
        reference.where(F.size(rw) >= 2)
        .select(F.explode(rpairs).alias("b"))
        .select(F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))
    )
    cnt2 = train.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    cnt1 = train.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        reference.select(F.explode(rw).alias("t"))
        .agg(F.countDistinct("t").alias("v")).collect()[0]["v"]
    )
    return BigramReferenceModel(cnt2, cnt1, vocab)


def _score_bigram_occurrences(
    big: DataFrame, id_col: str, model: BigramReferenceModel
) -> DataFrame:
    """Score a (id, w1, w2) occurrence stream against a trained
    reference model → (id, n_bigrams, avg_logprob). Unseen (w1, w2) /
    unseen w1 take the add-one floor, so the occurrence stream
    LEFT-joins both count tables (unseen bigrams can't live in a type
    table)."""
    scored = (
        big.join(model.cnt2, ["w1", "w2"], "left")
        .join(model.cnt1, "w1", "left")
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                / (
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(float(model.vocab))
                )
            ).alias("__lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("__lp"), 6).alias("avg_logprob"),
        )
    )


def score_with_bigram_reference(
    df: DataFrame, text_col: str, id_col: str,
    model: BigramReferenceModel,
) -> DataFrame:
    """Attach the t27 reference-LM fluency score to every doc of
    ``df`` that carries transition evidence: (id, n_bigrams,
    avg_logprob) — :func:`bigram_lm_scores`'s reference arm against a
    PRE-TRAINED model. Docs under two words are absent from the output
    (no evidence), exactly like bigram_lm_scores."""
    w = F.split(F.col(text_col), " ")
    width = F.size(w) - 1
    pairs = F.arrays_zip(F.slice(w, 1, width), F.slice(w, 2, width))
    big = (
        df.where(F.size(w) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("b"))
        .select(
            id_col, F.col("b.0").alias("w1"), F.col("b.1").alias("w2")
        )
    )
    return _score_bigram_occurrences(big, id_col, model)


#: Redaction patterns: deliberately restricted to the regex subset with
#: IDENTICAL semantics in Java (Spark) and RE2 (DuckDB/Go tooling) — no
#: lookaround, no backreferences, no alternation whose leftmost-first vs
#: leftmost-longest resolution could diverge. Order matters: emails
#: before phones (a phone pattern would eat the digits of an address),
#: IPs before generic digit runs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d() -]{7,}\d", "<PHONE>"),
    ("idnum", r"\b\d{8,}\b", "<IDNUM>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """PII scrubbing for training corpora: replace emails / IPv4s /
    international phone numbers / long id-number runs with typed
    placeholder tokens, and count what was removed per category
    (``n_<name>`` columns — the redaction audit a data pipeline logs).

    Pure chained ``regexp_replace``/``regexp_count`` — whole-stage
    codegen, zero Python, embarrassingly parallel (no shuffle at all:
    the plan is a projection). Patterns are applied in declared order
    on the progressively-redacted text, so counts are
    non-overlapping (an email's digits are never double-counted as an
    id number). Engine-portable regex subset only — see
    :data:`PII_PATTERNS`."""
    out = df
    cur = F.col(text_col)
    for name, pat, rep in patterns:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, rep)
    return out.withColumn(f"{text_col}_redacted", cur)


def token_budget_sample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    domain_col: str,
    budgets: dict[str, int],
    salt: str = "",
    n_buckets: int = 1024,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Token-budget DOMAIN MIXING: draw a deterministic sample whose
    per-domain token totals hit the given budgets — the "sample 30B
    web tokens, 5B code tokens" step every training-data mix performs.
    Rows are ranked by an engine-portable hash priority (md5(salt|id),
    as :func:`stratified_sample`) and taken greedily in that order
    until the domain's running token total reaches its budget; the
    crossing document is INCLUDED (budget + one overflowing doc, the
    same greedy boundary as :func:`sequence_packing`). Domains absent
    from ``budgets`` are dropped. Changing ``salt`` redraws.

    Scale design — the naive form is one window sort per domain, i.e.
    a single task sorting billions of rows at 100 TB. This plan never
    globally sorts: the hash priority is range-bucketed
    (``n_buckets`` monotone slices of hash space), a tiny per-(domain,
    bucket) token-sum aggregate (combiner-friendly) is prefix-summed
    on the driver-sized frame, whole buckets below the budget line are
    taken with a broadcast join (pure filter, no sort), and only THE
    one crossing bucket per domain (expected corpus/n_buckets rows)
    pays a window sort. Output = exactly the global-sort answer,
    because bucket id is a prefix of the priority order.

    ``n_tokens_col``: use a precomputed per-doc token count (e.g. the
    REAL BPE count, :func:`operators.bpe.with_bpe_token_count`)
    instead of the whitespace split.

    Returns the kept input rows plus ``n_tokens``."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1; got {n_buckets}")
    from pyspark.sql import Window

    from southpaw_spark.operators.skew import bucket_prefix_join

    nt = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else F.size(tokens(F.col(text_col))).cast("long")
    )
    bcol = F.lit(None).cast("long")
    for dom, b in sorted(budgets.items()):
        bcol = F.when(
            F.col(domain_col) == dom, F.lit(int(b))
        ).otherwise(bcol)
    width = (0xFFFFFFFF // n_buckets) + 1
    base = (
        df.withColumn("__nt", nt)
        .withColumn("__pri", hash_priority(id_col, salt))
        .withColumn(
            "__bk", F.floor(F.col("__pri") / F.lit(width)).cast("int")
        )
        .withColumn("__budget", bcol)
        .where(F.col("__budget").isNotNull())
    )
    joined = bucket_prefix_join(
        base, "__bk", weight_col="__nt", partition_cols=(domain_col,)
    )
    full = joined.where(
        F.col("__prefix") + F.col("__bt") <= F.col("__budget")
    )
    crossing = joined.where(
        (F.col("__prefix") < F.col("__budget"))
        & (F.col("__prefix") + F.col("__bt") > F.col("__budget"))
    )
    doc_w = (
        Window.partitionBy(domain_col)
        .orderBy("__pri", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    part = crossing.withColumn(
        "__cum",
        F.col("__prefix")
        + F.coalesce(F.sum("__nt").over(doc_w), F.lit(0)),
    ).where(F.col("__cum") < F.col("__budget"))
    keep = [
        *[c for c in df.columns if c != "n_tokens"],
        F.col("__nt").alias("n_tokens"),  # replaces a stale n_tokens
    ]
    return full.select(*keep).unionByName(part.select(*keep))


# '=' optional (trailing `(=|$)`): valueless tracking params
# ('?fbclid', '&utm_source') must not survive canonicalization and
# split dedup groups; plain names that merely share a prefix
# ('refresh=1') still pass because neither '=' nor end-of-param
# follows the alternation match.
_TRACKING_PARAM_RE = r"^(utm_[^=&]*|fbclid|gclid|ref)(=|$)"


def canonical_url(url) -> Column:
    """Canonicalize a URL for dedup — the normalization every web-crawl
    pipeline applies before URL-level dedup (CCNet/RefinedWeb style):

    - scheme and host lowercased (path stays case-sensitive);
    - leading ``www.`` and default ports (http:80 / https:443) dropped,
      non-default ports kept;
    - fragment dropped, trailing slashes stripped;
    - tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``)
      removed — with or without a value (``?fbclid`` counts) — and
      the remaining query params SORTED, so param order never splits
      a dedup group.

    Pure built-ins (regexp + array ops, whole-stage codegen) with
    deliberately engine-portable regexes — the DuckDB oracle applies
    the same rules verbatim."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":[0-9]+$", ""), r"^www\.", ""
    )
    default_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    netloc = F.when(default_port, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    pathq = F.regexp_replace(
        F.substring(after, F.length(hostport) + 1, 1 << 30), r"#.*$", ""
    )
    path = F.regexp_replace(
        F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    parts = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    canon_q = F.array_join(F.array_sort(parts), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), canon_q)
        ),
    )


def url_duplicates(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """URL-level dedup groups after :func:`canonical_url` normalization:
    one row per canonical URL with >1 member — ``(canonical_url,
    keep_id, n_copies, doc_ids)``, the same group shape as exact
    content dedup (d01). One combiner-friendly groupBy; the
    normalization itself is stateless codegen."""
    c = canonical_url(F.col(url_col))
    return (
        df.select(c.alias("canonical_url"), F.col(id_col))
        # NULL url ⇒ NULL canonical form; groupBy would lump every such
        # doc into ONE dedup group — no evidence is not a match, so
        # null-canonical rows never report as duplicates
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def temperature_budgets(
    token_counts: dict[str, int],
    total_tokens: int,
    alpha: float = 0.5,
) -> dict[str, int]:
    """Per-domain token budgets from temperature-flattened sampling
    weights: ``w_i = n_i^alpha`` renormalized over the observed domains
    (the exponential-smoothing mix of the multilingual-pretraining
    literature — alpha<1 upweights rare domains, alpha=1 is natural
    proportions, alpha=0 uniform).

    ``alpha=0.5`` (the default) uses INTEGER square roots and floor
    division, so the budgets are exactly reproducible in any engine —
    no libm ``pow`` in the contract (pow is not correctly rounded and
    differs across implementations; sqrt is exact). Other alphas go
    through float pow and are documented as engine-local."""
    import math

    if not token_counts:
        return {}
    if alpha == 0.5:
        w = {d: math.isqrt(int(c)) for d, c in token_counts.items()}
        s = sum(w[d] for d in sorted(w))
        if s == 0:
            return {d: 0 for d in w}
        return {d: int(total_tokens) * w[d] // s for d in w}
    w = {d: float(c) ** alpha for d, c in token_counts.items()}
    s = sum(w[d] for d in sorted(w))
    return {d: int(total_tokens * w[d] / s) for d in w}


def temperature_mix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    domain_col: str,
    total_tokens: int,
    alpha: float = 0.5,
    salt: str = "",
    n_buckets: int = 1024,
    max_domains: int | None = 100_000,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Temperature-based DOMAIN MIXING: derive each domain's token
    budget from the corpus itself (:func:`temperature_budgets` over
    per-domain token counts, ``w_i = n_i^alpha``), then draw the
    deterministic hash-priority sample with
    :func:`token_budget_sample` — "flatten the web/code/wiki mix to
    temperature alpha and take N tokens total" as one call.

    Scale: the per-domain count aggregate is combiner-friendly and its
    result is bounded by DOMAIN CARDINALITY (the one driver collect —
    bounded metadata, not data); the sample itself inherits t15's
    no-global-sort bucketed-prefix plan.

    ``max_domains`` guards that collect: it is bounded metadata ONLY
    for curated domain labels (source/language/register) — a
    URL-host-derived "domain" column can run to millions of keys and
    the collect becomes a driver-OOM footgun. One countDistinct job
    (combiner-friendly, a scalar back) fails loudly past the
    threshold, naming the fix (bucket/coarsen the domain column, or
    compute budgets offline and call :func:`token_budget_sample`).
    Pass ``None`` to disable (cardinality known-bounded upstream) —
    the same guard discipline as ``streaming.temporal.asof_state``'s
    broadcast-size check."""
    if max_domains is not None:
        n_dom = df.agg(
            F.countDistinct(F.col(domain_col)).alias("n")
        ).collect()[0]["n"]
        if n_dom > max_domains:
            raise ValueError(
                f"temperature_mix: {domain_col!r} has {n_dom} distinct "
                f"values (> max_domains={max_domains}); the per-domain "
                "budget collect is only safe for bounded curated "
                "domains. Coarsen the domain column (e.g. registrable "
                "domain / source label), or compute budgets offline "
                "and call token_budget_sample directly; pass "
                "max_domains=None only if the cardinality is "
                "known-bounded."
            )
    per_doc = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else F.size(tokens(F.col(text_col))).cast("long")
    )
    counts = {
        r["d"]: r["nt"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(per_doc).alias("nt"))
        .collect()
    }
    budgets = temperature_budgets(counts, total_tokens, alpha)
    return token_budget_sample(
        df, text_col, id_col, domain_col, budgets,
        salt=salt, n_buckets=n_buckets, n_tokens_col=n_tokens_col,
    )


def shuffled_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE into training shards: every row
    gets a ``shard`` (0..n_shards−1) and a ``pos`` (0-based rank
    within its shard), such that reading shard 0 in pos order, then
    shard 1, … yields a reproducible pseudo-random permutation of the
    corpus — the epoch-shuffle layout SGD training exports need.
    ``rand()`` cannot do this: it changes under retries/re-partitioning
    and across engines; the md5 hash priority (same construction as
    :func:`stratified_sample` / :func:`token_budget_sample`) is stable
    under all three, and ``salt`` selects a fresh permutation per
    epoch.

    Scale: shard = hash-priority mod n_shards (balanced by hash
    uniformity), position = a window per shard — n_shards parallel
    sorts of N/n_shards rows each, never one global sort. Writers that
    only need file ORDER (not the pos column) should use
    :func:`southpaw_spark.pipelines.write_shuffled_corpus`, which
    skips the rank column entirely via sortWithinPartitions."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1; got {n_shards}")
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("__pri", id_col)
    return (
        df.withColumn("__pri", hash_priority(id_col, salt))
        .withColumn(
            "shard", (F.col("__pri") % n_shards).cast("int")
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__pri")
    )


#: Boilerplate markers (lowercased substring match) that disqualify a
#: line — the C4 blacklist core, kept engine-portable (plain regex
#: alternation, no lookarounds).
_LINE_BLACKLIST_RE = (
    "lorem ipsum|javascript|cookie policy|privacy policy|terms of use"
)


def clean_lines(
    df: DataFrame,
    text_col: str,
    min_words: int = 3,
    min_lines_kept: int = 1,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep
    only lines that look like real prose, rejoin the survivors, and
    drop documents left with fewer than ``min_lines_kept`` lines. A
    line survives iff (after trimming) it

    - ends in terminal punctuation (``.``, ``!``, ``?`` or a closing
      double quote),
    - has at least ``min_words`` whitespace-separated words,
    - contains no curly brace (code/markup leakage), and
    - matches none of the lowercased boilerplate markers
      (``lorem ipsum``, ``javascript``, ``cookie policy``,
      ``privacy policy``, ``terms of use``).

    Appends ``n_lines`` / ``n_lines_kept`` and REPLACES ``text_col``
    with the cleaned text. Everything is per-row whole-stage-codegen
    array ops (``split`` → ``filter`` → ``array_join``) — no shuffle,
    no UDF, no explode — so the operator is a free rider on whatever
    scan partitioning the corpus already has, at any scale. The same
    predicates are expressed verbatim in the DuckDB oracle
    (``list_filter``), keeping the row engine-checkable.
    """
    lines = F.split(F.col(text_col), "\n")

    def keep(line):
        t = F.trim(line)
        words = F.size(F.filter(F.split(t, " "), lambda w: w != ""))
        return (
            t.rlike('[.!?"]$')
            & (words >= min_words)
            & ~t.contains("{")
            & ~t.contains("}")
            & ~F.lower(t).rlike(_LINE_BLACKLIST_RE)
        )

    kept = F.filter(lines, keep)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn(text_col, F.array_join(kept, "\n"))
        .where(F.col("n_lines_kept") >= min_lines_kept)
    )


def hash_split_bounds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """Exact-integer split boundaries for :func:`hash_split`:
    ``floor(cum_fraction · 2³²)`` per split, with the cumulative
    fraction accumulated as an EXACT rational (``fractions.Fraction``
    over the float inputs) — float accumulation (0.9 + 0.05 =
    0.9500000000000001) can land ``int(cum · 2³²)`` one off from an
    independent engine's literal cumulative sum, silently migrating a
    hash value across splits. Exact accumulation is associative, so
    the boundaries are independent of accumulation order and any
    engine that floors the same rational reproduces them bit-for-bit.
    The last boundary is pinned to 2³² (sum == 1) so the max hash is
    covered. Shared by the operator and the registry oracle, so the
    two can never drift."""
    from fractions import Fraction

    names = list(fractions)
    bounds: list[tuple[str, int]] = []
    cum = Fraction(0)
    for name in names:
        cum += Fraction(fractions[name])
        bounds.append((name, int(cum * (1 << 32))))
    bounds[-1] = (names[-1], 1 << 32)
    return bounds


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment — table stakes for any
    training corpus: every row gets a ``split`` label by thresholding
    the :func:`hash_priority` value against cumulative-fraction
    boundaries. Properties the ``rand()`` version lacks:

    - STABLE: the same (id, salt) lands in the same split under
      retries, re-partitioning, incremental re-runs, and across
      engines — a doc never migrates from test into train when the
      corpus is rebuilt;
    - DISJOINT + EXHAUSTIVE by construction (half-open threshold
      intervals over [0, 2³²));
    - exact-integer boundaries (``floor(cum_fraction · 2³²)`` with the
      cumulative fraction accumulated EXACTLY — see
      :func:`hash_split_bounds`), so an independent engine reproduces
      the assignment bit-for-bit regardless of accumulation order;
    - ``salt`` redraws the whole split independently.

    ``fractions`` maps split name → fraction; must sum to 1 (±1e-9).
    Pure codegen projection — zero shuffles; feed ``split`` to
    ``write_corpus(partition_by=["split"])`` for a partitioned export.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1; got {total}")
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-empty and non-negative")
    pri = hash_priority(id_col, salt)
    # last boundary is exactly 2^32 (sum==1), covering the max hash;
    # first-match-wins so zero-fraction splits (tied thresholds) get
    # no rows
    bounds = hash_split_bounds(fractions)
    names = list(fractions)
    expr = None
    for name, b in bounds:
        cond = pri < F.lit(b)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise(F.lit(names[-1])))


def score_with_linear_model(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: list[float],
    bias: float = 0.0,
    out_col: str = "model_score",
    micro: int = 1_000_000,
    impl: str = "explode",
) -> DataFrame:
    """Trained-classifier quality scoring (round-9 verdict task 4) —
    the fastText-style linear gate every production corpus runs
    (Joulin et al. 2016, "Bag of Tricks for Efficient Text
    Classification", public paper): hashed bag-of-words features ×
    a broadcast weight vector, entirely JVM-side.

    Model: tokens are the non-empty ``[a-z0-9]+`` runs of
    ``lower(text)`` (ASCII class, so Java regex and RE2 agree);
    feature id = ``('0x' || substr(md5(token),1,8)) % n_features``
    (the t04 sampling-hash construction); the score is the mean token
    weight plus bias — ``w·x̄ + b``, the fastText linear margin.

    Engine-exact by integer accounting: weights quantize once to
    ``micro``-units (``round(w*1e6)``), the per-doc numerator
    ``Σ w_micro[bucket(t)] + bias_micro·n`` is an int64 sum —
    associative, so ANY summation order (explode partial-agg, HOF
    fold, DuckDB) produces the same integer — and the single float op
    is the final division by ``n·micro``. Empty-token docs score
    exactly ``bias_micro/micro``. Overflow headroom: |w|≤1e3 →
    numerator ≤ 1e9·n, safe to n ~ 1e9 tokens/doc.

    ``impl="explode"`` (default): explode tokens → md5/bucket/
    element_at in WHOLE-STAGE CODEGEN → map-side partial sum collapses
    to one row per doc BEFORE the exchange → join scores back on
    ``id_col``. Two exchanges of N rows, zero interpreted work — the
    d03 anti-lesson applied (don't trade codegen explode+partial-agg
    for an interpreted HOF). ``impl="hof"``: zero-shuffle projection
    via an interpreted ``aggregate`` fold — identical output, for
    plans where an exchange is costlier than the interpreted pass
    (tiny docs, already-exchanging pipelines). Both paths constant-
    fold the weight array into the plan (broadcast-by-literal; for
    vocab-scale models pass a weights TABLE and join — this operator
    targets the hashed-feature gate where n_features ≤ ~1e5)."""
    n_features = len(weights)
    if n_features < 1:
        raise ValueError("weights must be non-empty")
    if impl not in ("explode", "hof"):
        raise ValueError(f"impl must be 'explode' or 'hof'; got {impl!r}")
    w_micro = [int(round(w * micro)) for w in weights]
    if max(abs(w) for w in w_micro) > 10**9:
        raise ValueError("weights too large for exact int64 accounting")
    bias_micro = int(round(bias * micro))
    w_arr = F.array(*[F.lit(x).cast("long") for x in w_micro])
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )

    def bucket(tok):
        return (
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
            % n_features
        )

    if impl == "hof":
        contrib = F.transform(
            toks,
            lambda t: F.element_at(w_arr, (bucket(t) + 1).cast("int")),
        )
        num = F.aggregate(
            contrib, F.lit(0).cast("long"), lambda a, x: a + x
        )
        n = F.size(toks).cast("long")
        score = F.when(
            n > 0,
            (num + F.lit(bias_micro) * n).cast("double")
            / (n * F.lit(micro)).cast("double"),
        ).otherwise(F.lit(bias_micro).cast("double") / F.lit(micro))
        return df.withColumn(out_col, score)

    tok_rows = df.select(
        F.col(id_col).alias("__sid"), F.explode(toks).alias("__t")
    )
    sums = tok_rows.select(
        "__sid",
        F.element_at(w_arr, (bucket(F.col("__t")) + 1).cast("int")).alias(
            "__w"
        ),
    ).groupBy("__sid").agg(
        F.sum("__w").alias("__num"), F.count("*").alias("__n")
    )
    scored = df.join(
        sums, F.col(id_col) == F.col("__sid"), "left"
    ).withColumn(
        out_col,
        F.when(
            F.col("__n").isNotNull(),
            (F.col("__num") + F.lit(bias_micro) * F.col("__n")).cast(
                "double"
            )
            / (F.col("__n") * F.lit(micro)).cast("double"),
        ).otherwise(F.lit(bias_micro).cast("double") / F.lit(micro)),
    )
    return scored.drop("__sid", "__num", "__n")


def classify_language(
    df: DataFrame,
    text_col: str,
    id_col: str,
    models: dict[str, list[float]],
    biases: dict[str, float] | None = None,
    out_col: str = "lang_guess",
    micro: int = 1_000_000,
    impl: str = "explode",
    labels_only: bool = False,
) -> DataFrame:
    """Trained language ID (t28) — CCNet's first stage is a fastText
    language classifier (Joulin et al. 2016; Wenzek et al. 2020,
    public papers); this is that inference on
    :func:`score_with_linear_model`'s hashed-BoW machinery: one weight
    vector PER LANGUAGE over the same md5-bucketed ``[a-z0-9]+``
    features, label = argmax of the per-language mean-weight score.

    Engine-exact argmax: all languages share the positive denominator
    ``n·micro``, so comparing scores ≡ comparing the int64 numerators
    ``Σ w_micro_l[bucket(t)] + bias_micro_l·n`` — associative integer
    sums, no float comparison anywhere. Ties break to the
    lexicographically SMALLEST language; docs with zero tokens get the
    constant argmax over the biases alone (computed in Python — it is
    data-independent).

    Plan (``impl="explode"``): tokenize + bucket ONCE in codegen, one
    combiner groupBy carrying L numerator sums (one row per doc before
    the exchange), join back, argmax as a chained CASE — two
    exchanges of N rows total regardless of L. ``impl="hof"``: the
    zero-shuffle interpreted fold twin (streaming projections), output
    bit-identical. At 100 TB both scale like t22: nothing joins the
    corpus to anything but its own per-doc aggregate.

    ``labels_only=True`` returns just ``(id_col, out_col)`` — one row
    per distinct id — and lets the explode plan drop the join-back
    entirely: ``explode_outer`` keeps zero-token docs in the token
    frame, so the single combiner groupBy IS the whole query (ONE
    exchange; round-13 fusion). Use it when downstream only needs the
    label (classification reports, per-language counts); keep the
    default when the gate must filter full document rows."""
    if not models:
        raise ValueError("models must map >= 1 language to weights")
    langs = sorted(models)
    n_features = len(models[langs[0]])
    if n_features < 1 or any(len(models[l]) != n_features for l in langs):
        raise ValueError(
            "every language needs the same non-zero weight length; got "
            f"{ {l: len(models[l]) for l in langs} }"
        )
    if impl not in ("explode", "hof"):
        raise ValueError(f"impl must be 'explode' or 'hof'; got {impl!r}")
    biases = biases or {}
    w_micro = {
        l: [int(round(w * micro)) for w in models[l]] for l in langs
    }
    b_micro = {l: int(round(biases.get(l, 0.0) * micro)) for l in langs}
    if max(
        abs(w) for l in langs for w in w_micro[l]
    ) > 10**9:
        raise ValueError("weights too large for exact int64 accounting")
    # zero-token docs score bias_l for every l: the winner is constant
    empty_winner = min(langs, key=lambda l: (-b_micro[l], l))
    w_arrs = {
        l: F.array(*[F.lit(x).cast("long") for x in w_micro[l]])
        for l in langs
    }
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )

    def bucket(tok):
        return (
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
            % n_features
        )

    def argmax(totals: dict) -> Column:
        # sorted order + strict > keeps the lexicographically smallest
        # language on ties
        win_lab, win_tot = F.lit(langs[0]), totals[langs[0]]
        for l in langs[1:]:
            gt = totals[l] > win_tot
            win_lab = F.when(gt, F.lit(l)).otherwise(win_lab)
            win_tot = F.when(gt, totals[l]).otherwise(win_tot)
        return win_lab

    if impl == "hof":
        n = F.size(toks).cast("long")
        totals = {}
        def contrib_fn(arr):
            # single-param lambda: F.transform treats a 2-param lambda
            # as (element, index) and would clobber a bound default
            return lambda t: F.element_at(arr, (bucket(t) + 1).cast("int"))

        for l in langs:
            contrib = F.transform(toks, contrib_fn(w_arrs[l]))
            totals[l] = F.aggregate(
                contrib, F.lit(0).cast("long"), lambda a, x: a + x
            ) + F.lit(b_micro[l]) * n
        lab = F.when(n > 0, argmax(totals)).otherwise(
            F.lit(empty_winner)
        )
        out = df.withColumn(out_col, lab)
        return out.select(id_col, out_col) if labels_only else out

    if labels_only:
        # one-exchange plan: explode_outer keeps zero-token docs (one
        # null-token row whose weight contribution coalesces to 0 and
        # whose count(__t) is 0), so the combiner groupBy is the whole
        # query — no join back to the document frame
        tok_rows = df.select(
            F.col(id_col).alias("__sid"),
            F.explode_outer(toks).alias("__t"),
        ).withColumn("__b", (bucket(F.col("__t")) + 1).cast("int"))
        sums = tok_rows.select(
            "__sid",
            "__t",
            *[
                F.coalesce(
                    F.element_at(w_arrs[l], F.col("__b")),
                    F.lit(0).cast("long"),
                ).alias(f"__w_{i}")
                for i, l in enumerate(langs)
            ],
        ).groupBy("__sid").agg(
            *[
                F.sum(f"__w_{i}").alias(f"__num_{i}")
                for i in range(len(langs))
            ],
            F.count("__t").alias("__n"),
        )
        totals = {
            l: F.col(f"__num_{i}") + F.lit(b_micro[l]) * F.col("__n")
            for i, l in enumerate(langs)
        }
        return sums.select(
            F.col("__sid").alias(id_col),
            F.when(F.col("__n") > 0, argmax(totals))
            .otherwise(F.lit(empty_winner))
            .alias(out_col),
        )

    tok_rows = df.select(
        F.col(id_col).alias("__sid"), F.explode(toks).alias("__t")
    ).withColumn("__b", (bucket(F.col("__t")) + 1).cast("int"))
    sums = tok_rows.select(
        "__sid",
        *[
            F.element_at(w_arrs[l], F.col("__b")).alias(f"__w_{i}")
            for i, l in enumerate(langs)
        ],
    ).groupBy("__sid").agg(
        *[
            F.sum(f"__w_{i}").alias(f"__num_{i}")
            for i in range(len(langs))
        ],
        F.count("*").alias("__n"),
    )
    totals = {
        l: F.col(f"__num_{i}") + F.lit(b_micro[l]) * F.col("__n")
        for i, l in enumerate(langs)
    }
    scored = df.join(
        sums, F.col(id_col) == F.col("__sid"), "left"
    ).withColumn(
        out_col,
        F.when(F.col("__n").isNotNull(), argmax(totals)).otherwise(
            F.lit(empty_winner)
        ),
    )
    return scored.drop(
        "__sid", "__n", *[f"__num_{i}" for i in range(len(langs))]
    )


def train_language_id(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    n_features: int = 64,
) -> tuple[dict[str, list[float]], dict[str, float]]:
    """Train :func:`classify_language`'s per-language weight vectors
    from a LABELED corpus — multinomial naive Bayes over the hashed
    BoW, expressed as linear weights: ``w_l[b] = log P(b | l) −
    log P(b)`` (add-one smoothed) and ``bias_l = log P(l)``, each
    rounded to the 1e-6 micro grid so the trained model quantizes
    identically in any engine. One codegen tokenize/bucket pass + one
    (label, bucket) count groupBy; the collected model is
    ``n_features × L`` floats — driver-bounded by construction.

    Returns ``(models, biases)`` ready to pass to
    :func:`classify_language` / ``build_corpus(lang_model=…)``."""
    import math

    if n_features < 1:
        raise ValueError(f"n_features must be >= 1; got {n_features}")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )
    b = (
        F.conv(F.substring(F.md5(F.col("__t")), 1, 8), 16, 10)
        .cast("long") % n_features
    )
    rows = (
        labeled.select(
            F.col(label_col).alias("__lab"), F.explode(toks).alias("__t")
        )
        .select("__lab", b.alias("__b"))
        .groupBy("__lab", "__b")
        .agg(F.count("*").alias("__c"))
        .collect()
    )
    doc_counts = {
        r["__lab"]: r["__d"]
        for r in labeled.groupBy(F.col(label_col).alias("__lab"))
        .agg(F.count("*").alias("__d")).collect()
    }
    if not rows:
        raise ValueError("labeled corpus has no tokens to train on")
    per: dict[str, dict[int, int]] = {}
    for r in rows:
        per.setdefault(r["__lab"], {})[int(r["__b"])] = int(r["__c"])
    glob = [0] * n_features
    for cnts in per.values():
        for bk, c in cnts.items():
            glob[bk] += c
    total = sum(glob)
    n_docs = sum(doc_counts.values())
    models: dict[str, list[float]] = {}
    biases: dict[str, float] = {}
    for lab in sorted(per):
        n_l = sum(per[lab].values())
        w = []
        for bk in range(n_features):
            p_bl = (per[lab].get(bk, 0) + 1) / (n_l + n_features)
            p_b = (glob[bk] + 1) / (total + n_features)
            w.append(round(math.log(p_bl / p_b), 6))
        models[lab] = w
        biases[lab] = round(
            math.log(doc_counts.get(lab, 1) / n_docs), 6
        )
    return models, biases


def corpus_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    stratum_col: str | None = None,
) -> DataFrame:
    """Corpus statistics report (t29) — the stats stage every
    production corpus build ships with its dataset card (doc/token
    counts, duplication rate, length distribution; cf. the dataset
    documentation practice of Gebru et al. 2021 "Datasheets for
    Datasets" and the per-source tables in the Pile/RefinedWeb papers,
    public): ONE row per stratum (``stratum_col``; the whole corpus as
    stratum ``__all__`` when None) with

    ``(stratum, n_docs, n_tokens, n_chars, n_distinct, dup_rate,
    avg_tokens, max_tokens, p50_tokens, p90_tokens)``

    — whitespace token counts (the t01 tokenizer), exact content
    duplication via md5 count-distinct, and EXACT ceil-rank discrete
    percentiles (the a12 rule: the value at rank ``max(1,
    ceil(q·n))`` ordered by ``(n_tokens, id)`` — an actual data value,
    bit-reproducible in any engine; doubles are ``round(·, 6)``).

    Plan: one combiner-friendly groupBy for the aggregates and ONE
    shuffle on the stratum for the percentile rank window (sort
    bounded by the largest stratum — strata are coarse by
    construction; a single-stratum corpus at 100 TB should profile
    per-source and roll up). No collects, no cross joins."""
    from pyspark.sql import Window

    stratum = (
        F.col(stratum_col) if stratum_col is not None
        else F.lit("__all__")
    )
    base = df.select(
        stratum.alias("stratum"),
        F.col(id_col).alias("__id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("__tok"),
        F.length(text_col).cast("long").alias("__chr"),
        F.md5(F.col(text_col).cast("binary")).alias("__h"),
    )
    aggs = base.groupBy("stratum").agg(
        F.count("*").alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.sum("__chr").alias("n_chars"),
        F.countDistinct("__h").alias("n_distinct"),
        F.max("__tok").alias("max_tokens"),
    )
    w = Window.partitionBy("stratum").orderBy("__tok", "__id")
    cnt = Window.partitionBy("stratum")
    ranked = base.select(
        "stratum", "__tok",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(cnt).alias("__n"),
    )

    def pick(q: float, name: str) -> DataFrame:
        target = F.greatest(
            F.lit(1), F.ceil(F.lit(q) * F.col("__n"))
        )
        return ranked.where(F.col("__rn") == target).select(
            "stratum", F.col("__tok").alias(name)
        )

    return (
        aggs.join(pick(0.5, "p50_tokens"), "stratum")
        .join(pick(0.9, "p90_tokens"), "stratum")
        .select(
            "stratum", "n_docs", "n_tokens", "n_chars", "n_distinct",
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_docs"), 6
            ).alias("dup_rate"),
            F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias(
                "avg_tokens"
            ),
            "max_tokens", "p50_tokens", "p90_tokens",
        )
    )


def url_host(url) -> Column:
    """The lowercased host of a URL, port stripped — the
    :func:`canonical_url` host rules factored out for blocklist
    matching (t24). Unlike canonicalization this KEEPS a leading
    ``www.``: blocklist matching walks the full dot-suffix chain, so
    ``www.example.com`` matches a blocked ``example.com`` through the
    chain, and stripping would only lose information. Pure codegen."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    return F.regexp_replace(hostport, r":[0-9]+$", "")


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, most-specific first —
    ``cdn.a.example.com`` → ``[cdn.a.example.com, a.example.com,
    example.com, com]``. The equi-joinable form of "is this host a
    subdomain of a blocked domain": a suffix chain is bounded by the
    label count (~5), so exploding it is a constant fan-out, never a
    LIKE scan. Pure codegen."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n), "."),
    )


def blocklist_hits(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocked,
    include_subdomains: bool = True,
) -> DataFrame:
    """Which documents a URL/domain blocklist flags (t24) — the audit
    frame behind :func:`blocklist_filter`: one row per distinct
    ``(id, host, matched_domain)``. The C4 / RefinedWeb adult-and-spam
    domain gate (Raffel et al. 2020; Penedo et al. 2023 run the UT1
    blacklist): a doc is flagged when its URL's host equals a blocked
    domain or (``include_subdomains``) sits below one.

    ``blocked``: a single-column DataFrame of domains (the scale path —
    real blocklists run to millions of rows; the match is an exploded
    suffix-chain equi-join against the BROADCAST list, ≤ label-count
    fan-out per doc, no LIKE scan) or a Python list (small lists —
    compiled to a codegen ``array_contains`` filter, zero joins, also
    the streaming-safe form). Entries are lowercased/trimmed;
    subdomain semantics come from the suffix chain, so entries are
    plain registrable domains (``example.com``), never patterns."""
    host = url_host(F.col(url_col))
    keys = (
        host_suffixes(host) if include_subdomains else F.array(host)
    )
    if isinstance(blocked, DataFrame):
        bcol = blocked.columns[0]
        b = blocked.select(
            F.lower(F.trim(F.col(bcol))).alias("matched_domain")
        ).distinct()
        return (
            df.select(
                F.col(id_col), host.alias("host"),
                F.explode(keys).alias("__sfx"),
            )
            .join(F.broadcast(b), F.col("__sfx") == F.col("matched_domain"))
            .select(id_col, "host", "matched_domain")
            .distinct()
        )
    blk = sorted({d.strip().lower() for d in blocked})
    if not blk:
        raise ValueError("blocked list is empty — pass >= 1 domain")
    lit_arr = F.array(*[F.lit(d) for d in blk])
    matches = F.filter(keys, lambda s: F.array_contains(lit_arr, s))
    return (
        df.select(
            F.col(id_col), host.alias("host"),
            F.explode(matches).alias("matched_domain"),
        )
        .distinct()
    )


def blocklist_filter(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocked,
    include_subdomains: bool = True,
) -> DataFrame:
    """Drop every document whose URL host is on (or under) a blocked
    domain — the gate form of :func:`blocklist_hits`. With a Python
    list the gate is ONE codegen ``arrays_overlap`` predicate (no
    join, no shuffle — and therefore legal inside a streaming plan);
    with a DataFrame blocklist it is a broadcast anti-join on the
    exploded suffix chain. Rows with unparseable/empty hosts pass
    through (no evidence is not a match — the decontamination
    discipline)."""
    host = url_host(F.col(url_col))
    keys = (
        host_suffixes(host) if include_subdomains else F.array(host)
    )
    if isinstance(blocked, DataFrame):
        hit_ids = blocklist_hits(
            df, url_col, id_col, blocked,
            include_subdomains=include_subdomains,
        ).select(id_col)
        return df.join(hit_ids, id_col, "left_anti")
    blk = sorted({d.strip().lower() for d in blocked})
    if not blk:
        raise ValueError("blocked list is empty — pass >= 1 domain")
    lit_arr = F.array(*[F.lit(d) for d in blk])
    # NULL url ⇒ NULL host ⇒ NULL arrays_overlap, and where() drops
    # NULL predicates — coalesce to False so no-evidence rows pass
    # through, matching the DataFrame-arm left_anti semantics.
    return df.where(
        ~F.coalesce(F.arrays_overlap(keys, lit_arr), F.lit(False))
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    domain_col: str,
    cuts: tuple = (1 / 3, 2 / 3),
    labels: tuple = ("head", "middle", "tail"),
    reference: "DataFrame | BigramReferenceModel | None" = None,
    hot_domain_rows: int | None = 1_000_000,
) -> DataFrame:
    """CCNet-style per-domain perplexity stratification (t23 — Wenzek
    et al. 2020 "CCNet: Extracting High Quality Monolingual Datasets
    from Web Crawl Data", public paper): score every document with the
    corpus-trained bigram LM (:func:`bigram_lm_scores` — t13's fluency
    signal; ``avg_logprob`` is a monotone inverse of perplexity, so no
    float ``exp`` ever runs) and split each ``domain_col`` stratum into
    head / middle / tail by per-domain score rank — CCNet buckets per
    language; the same machinery strata on any grouping column.

    Bucketing rule (discrete, engine-exact): rank docs within a domain
    by ``(avg_logprob DESC, id ASC)`` — best fluency first — and
    assign the first label ``k`` with ``rank ≤ ceil(cuts[k] · n)``,
    else the last label. Both engines evaluate the identical IEEE-754
    ``ceil(cut · n)``, and ties rank on the ROUNDED score + id, so the
    assignment is bit-deterministic. Docs under two words carry no
    transition evidence and are EXCLUDED (t13's rule) — gate short
    docs with ``min_tokens`` upstream. ``reference`` trains the LM on
    a clean reference corpus instead of ``df`` (the full CCNet recipe
    — see :func:`bigram_lm_scores`).

    Output: ``(id, domain, n_bigrams, avg_logprob, ppl_bucket)``.

    Scale: t13's two combiner-friendly count shuffles, one equi-join
    to attach the domain, then ONE shuffle on ``domain_col`` for the
    in-partition rank window — no global sort. The window sort is
    bounded by the hottest domain UP TO ``hot_domain_rows``: any
    domain larger than that threshold is ranked through the a09/a12
    range-bucket machinery instead (sampled quantile buckets of the
    order value → tiny per-(domain, bucket) prefix sums →
    within-bucket sorts), so a corpus that is 90% one domain never
    serializes one window task — (__rn, __n) are bit-identical to the
    window path (the bucket is a deterministic function of the value;
    parity is test-pinned). ``hot_domain_rows=None`` disables the
    split (pure window path, zero extra jobs); the default engages
    only beyond 1M-row domains, costing one tiny domain-count
    aggregate per call."""
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(labels) == len(cuts) + 1; got {len(labels)} labels "
            f"for {len(cuts)} cuts"
        )
    fcuts = [float(c) for c in cuts]
    if sorted(set(fcuts)) != fcuts or not all(0.0 < c < 1.0 for c in fcuts):
        raise ValueError(
            f"cuts must be strictly increasing within (0, 1); got {cuts!r}"
        )
    from pyspark.sql import Window

    scores = bigram_lm_scores(df, text_col, id_col, reference=reference)
    joined = df.select(F.col(id_col), F.col(domain_col)).join(
        scores, id_col
    )

    def window_rank(part: DataFrame) -> DataFrame:
        w = Window.partitionBy(domain_col).orderBy(
            F.col("avg_logprob").desc(), F.col(id_col)
        )
        return part.select(
            "*",
            F.row_number().over(w).alias("__rn"),
            F.count("*").over(Window.partitionBy(domain_col)).alias("__n"),
        )

    hot_domains: list = []
    if hot_domain_rows is not None:
        # hot-domain DETECTION runs on the RAW frame (2-column codegen
        # count agg — no LM in the lineage, so the common no-hot case
        # pays one trivial job and keeps the pure window plan). Raw
        # counts upper-bound the ranked counts (short docs drop out of
        # ranking), so this can only over-trigger, never miss.
        # Bounded collect: ≤ total_rows / hot_domain_rows names.
        hot_domains = [
            r[0]
            for r in df.groupBy(domain_col)
            .agg(F.count("*").alias("__raw_n"))
            .where(F.col("__raw_n") > int(hot_domain_rows))
            .select(domain_col).collect()
        ]
    if hot_domains:
        # the split consumes the scored frame several times (ranked
        # counts, quantile sample, cold + hot branches) — persist it so
        # the LM's count shuffles run ONCE; the caller releases it via
        # the _southpaw_cached convention (or LRU eviction)
        joined = joined.persist()
        counts = joined.groupBy(domain_col).agg(
            F.count("*").alias("__n")
        )
    if hot_domains:
        # Skew escape (the a09/a12 range-bucket machinery): a domain
        # bigger than hot_domain_rows would serialize one window task
        # on its whole stratum. Rank those domains range-bucketed
        # instead — bucket by sampled quantiles of the ORDER VALUE
        # (-avg_logprob, so ascending bucket = descending fluency),
        # prefix-sum the tiny per-(domain, bucket) counts, and pay only
        # within-bucket sorts. The bucket is a deterministic function
        # of the value, so ties stay in one bucket and (__rn, __n) are
        # BIT-IDENTICAL to the window path — parity is test-pinned.
        from southpaw_spark.operators.skew import bucket_prefix_join

        cold = joined.where(~F.col(domain_col).isin(hot_domains))
        hot = joined.where(F.col(domain_col).isin(hot_domains))
        hotm = hot.withColumn("__ord", -F.col("avg_logprob"))
        n_buckets = 256
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = sorted(set(
            hotm.approxQuantile("__ord", probs, 0.01)
        ))
        if bounds:
            barr = F.array(*[F.lit(float(b)) for b in bounds])
            bkt = F.size(F.filter(barr, lambda b: b <= F.col("__ord")))
        else:
            bkt = F.lit(0)
        marked = hotm.withColumn("__bk", bkt)
        pref = bucket_prefix_join(
            marked, "__bk", partition_cols=(domain_col,)
        )
        ww = Window.partitionBy(domain_col, "__bk").orderBy(
            "__ord", id_col
        )
        ranked_hot = (
            pref.withColumn(
                "__rn", F.col("__prefix") + F.row_number().over(ww)
            )
            # per-domain total rides in from the (tiny) counts
            # aggregate — ≤ one row per hot domain, broadcast
            .join(
                F.broadcast(
                    counts.where(F.col(domain_col).isin(hot_domains))
                ),
                domain_col,
            )
            .select(
                id_col, domain_col, "n_bigrams", "avg_logprob",
                "__rn", "__n",
            )
        )
        ranked = window_rank(cold).select(
            id_col, domain_col, "n_bigrams", "avg_logprob", "__rn", "__n"
        ).unionByName(ranked_hot)
    else:
        ranked = window_rank(joined)
    expr = None
    for cut, lab in zip(fcuts, labels):
        cond = F.col("__rn") <= F.ceil(F.lit(cut) * F.col("__n"))
        expr = (
            F.when(cond, F.lit(lab)) if expr is None
            else expr.when(cond, F.lit(lab))
        )
    expr = expr.otherwise(F.lit(labels[-1]))
    out = ranked.select(
        id_col, domain_col, "n_bigrams", "avg_logprob",
        expr.alias("ppl_bucket"),
    )
    if hot_domains:
        out._southpaw_cached = [joined]  # type: ignore[attr-defined]
    return out


def epoch_repeat_plan(
    repeats: dict[str, float], default_repeat: float = 1.0
) -> dict[str | None, tuple[int, int]]:
    """Per-stratum ``(full_copies, extra_threshold)`` for
    :func:`epoch_repeat` — the t20 exact-boundary discipline: a repeat
    factor ``f`` becomes ``floor(f)`` guaranteed copies plus one more
    iff ``hash_priority < floor(frac(f) · 2³²)``, with the fractional
    part taken as an EXACT rational so any engine flooring the same
    rational reproduces the threshold bit-for-bit. ``None`` keys the
    default stratum. Shared by the operator and the registry oracle,
    so the two can never drift."""
    from fractions import Fraction

    out: dict[str | None, tuple[int, int]] = {}
    items = list(repeats.items()) + [(None, default_repeat)]
    for name, f in items:
        if f < 0:
            raise ValueError(f"repeat factor must be >= 0; got {name}: {f}")
        r = Fraction(f)
        base = int(r)  # floor for non-negative
        thr = int((r - base) * (1 << 32))
        out[name] = (base, thr)
    return out


def epoch_repeat(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    repeats: dict[str, float],
    default_repeat: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic multi-epoch upsampling (t26) — the data-mixing
    step that repeats high-value strata across training epochs
    (Wikipedia/books multi-epoch weighting in GPT-3, Brown et al.
    2020; Gopher's per-source epoch counts, Rae et al. 2021 — public
    papers): each document is emitted ``floor(f)`` times plus one more
    iff its :func:`hash_priority` falls under the exact fractional
    threshold, so a stratum with ``f = 2.5`` averages 2.5 copies with
    a per-doc decision that is STABLE across rebuilds, retries and
    partitionings (never ``rand()``). ``f < 1`` doubles as
    downsampling (0 or 1 copies); ``f = 0`` drops the stratum.

    Returns the input rows with ``copy_idx`` (0-based) — one output
    row per emitted copy, so downstream shuffling/sharding (t16)
    treats copies as independent examples; for
    :func:`pipelines.write_shuffled_corpus` derive a copy-unique key
    first (``concat(id, '#', copy_idx)``) so copies of one doc scatter
    across the epoch permutation instead of landing adjacent. Pure
    codegen: a when-chain over the bounded stratum map + one
    ``explode(sequence)`` whose fan-out is the repeat factor — no
    shuffle, no join, no state."""
    plan = epoch_repeat_plan(repeats, default_repeat)
    pri = hash_priority(id_col, salt)

    def n_copies_for(base: int, thr: int):
        n = F.lit(base) + (pri < F.lit(thr)).cast("int")
        return n

    expr = None
    for name, (base, thr) in plan.items():
        if name is None:
            continue
        cond = F.col(stratum_col) == F.lit(name)
        expr = (
            F.when(cond, n_copies_for(base, thr)) if expr is None
            else expr.when(cond, n_copies_for(base, thr))
        )
    dbase, dthr = plan[None]
    n = (
        n_copies_for(dbase, dthr) if expr is None
        else expr.otherwise(n_copies_for(dbase, dthr))
    )
    copies = F.when(
        n > 0, F.sequence(F.lit(0), n - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.select("*", F.explode(copies).alias("copy_idx"))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher repetition-free quality rules (t30): the seven document
    filters of Rae et al. 2021 (Gopher, Appendix A — public recipe,
    also MassiveText/RefinedWeb's first gate), computed as pure Column
    expressions so the whole gate runs in whole-stage codegen:

    1. word count in [min_words, max_words];
    2. mean word length in [min_mean_word_len, max_mean_word_len];
    3. symbol-to-word ratio (``#`` and ``...`` occurrences / words)
       ≤ max_symbol_ratio;
    4. fraction of non-empty lines starting with a bullet
       (``-``/``*``/``•``) ≤ max_bullet_frac;
    5. fraction of non-empty lines ending with an ellipsis
       (``...``/``…``) ≤ max_ellipsis_frac;
    6. fraction of words containing an alphabetic char ≥ min_alpha_frac;
    7. at least min_stopword_hits of the 8 Gopher stopwords present.

    Unlike the module's split-on-single-space convention, words here
    split on runs of ANY whitespace (the rules mix word and line
    structure, so ``\\n`` must not glue words together); the DuckDB
    oracle replays the same regexp split. Ratios are round(·, 6);
    zero-word docs carry NULL ratios and fail the gate. Output:
    id, the seven metric columns, ``gopher_pass``.

    Complements (does not replace) the repo's other gates: t02 length/
    punct heuristics, t11 repetition (Gopher's OTHER table), t19 C4
    line rules, t22/t27 model scores.
    """
    m = _gopher_metrics(text_col)
    out = df.select(
        F.col(id_col),
        *[m[c].alias(c) for c in _GOPHER_METRIC_COLS],
    )
    passes = _gopher_rules(
        {c: F.col(c) for c in _GOPHER_METRIC_COLS},
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_ratio, max_bullet_frac, max_ellipsis_frac,
        min_alpha_frac, min_stopword_hits,
    )
    return out.withColumn("gopher_pass", passes)


_GOPHER_METRIC_COLS = (
    "n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
    "ellipsis_line_frac", "alpha_word_frac", "n_stopword_hits",
)


def _gopher_metrics(text_col: str) -> dict[str, Column]:
    """The seven metric expressions of :func:`gopher_quality`, shared
    with the predicate form so filter and report are bit-identical."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda l: F.trim(l) != F.lit(""),
    )
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_word_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_hash = F.length(text_col) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit(""))
    )
    n_ellipsis = (
        F.length(text_col)
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).startswith("-")
            | F.ltrim(l).startswith("*")
            | F.ltrim(l).startswith("•"),
        )
    )
    n_ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
        )
    )
    lower_words = F.transform(words, F.lower)
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    nz = F.when(n_words > 0, n_words.cast("double"))  # NULL when empty
    nlz = F.when(n_lines > 0, n_lines.cast("double"))
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(sum_word_len / nz, 6),
        "symbol_word_ratio": F.round((n_hash + n_ellipsis) / nz, 6),
        "bullet_line_frac": F.round(n_bullet_lines / nlz, 6),
        "ellipsis_line_frac": F.round(n_ellipsis_lines / nlz, 6),
        "alpha_word_frac": F.round(n_alpha / nz, 6),
        "n_stopword_hits": n_stop.cast("int"),
    }


def _gopher_rules(
    m: dict[str, Column],
    min_words, max_words, min_mean_word_len, max_mean_word_len,
    max_symbol_ratio, max_bullet_frac, max_ellipsis_frac,
    min_alpha_frac, min_stopword_hits,
) -> Column:
    passes = (
        (m["n_words"] >= F.lit(int(min_words)))
        & (m["n_words"] <= F.lit(int(max_words)))
        & (m["mean_word_len"] >= F.lit(float(min_mean_word_len)))
        & (m["mean_word_len"] <= F.lit(float(max_mean_word_len)))
        & (m["symbol_word_ratio"] <= F.lit(float(max_symbol_ratio)))
        & (m["bullet_line_frac"] <= F.lit(float(max_bullet_frac)))
        & (m["ellipsis_line_frac"] <= F.lit(float(max_ellipsis_frac)))
        & (m["alpha_word_frac"] >= F.lit(float(min_alpha_frac)))
        & (m["n_stopword_hits"] >= F.lit(int(min_stopword_hits)))
    )
    return F.coalesce(passes, F.lit(False))


def gopher_predicate(
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """:func:`gopher_quality`'s pass rule as ONE boolean Column — a pure
    per-row predicate (no join, no shuffle), legal inside a streaming
    plan and the cheapest batch form. Built on the same rounded metric
    expressions, so ``where(gopher_predicate(...))`` keeps exactly the
    rows ``gopher_quality(...).where("gopher_pass")`` reports."""
    return _gopher_rules(
        _gopher_metrics(text_col),
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_ratio, max_bullet_frac, max_ellipsis_frac,
        min_alpha_frac, min_stopword_hits,
    )


def gopher_filter(
    df: DataFrame, text_col: str, id_col: str, **thresholds
) -> DataFrame:
    """Keep only documents passing the Gopher rules — a pure filter
    (codegen predicate, zero shuffle); every original column survives.
    ``id_col`` is unused but kept for gate-signature symmetry."""
    return df.where(gopher_predicate(text_col, **thresholds))


#: Gopher Table A2 thresholds (Rae et al. 2021 — public recipe):
#: metric → max allowed fraction.
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def gopher_repetition(
    df: DataFrame,
    text_col: str,
    id_col: str,
    thresholds: dict[str, float] | None = None,
    line_delim: str = "\n",
) -> DataFrame:
    """Gopher repetition filters (t31): the OTHER public Gopher table
    (Rae et al. 2021 Table A2, the within-document repetition signals
    MassiveText/RefinedWeb filter on), complementing the
    :func:`gopher_quality` rule gate:

    * ``dup_line_frac`` — repeated occurrences of an exact line /
      total non-empty lines (``1 − distinct/total``);
    * ``dup_line_char_frac`` — characters inside those repeated
      occurrences / total line characters;
    * ``top_{2,3,4}gram_char_frac`` — characters covered by the single
      most frequent word n-gram (count × gram length over the
      space-joined word stream; ties break to the lexicographically
      smallest gram, so the value is deterministic);
    * ``dup_{5..10}gram_char_frac`` — characters covered by ALL word
      n-grams occurring more than once (count × length summed;
      overlapping occurrences each count, the standard public-impl
      convention, so the ratio is clamped at 1.0).

    Character base for the gram fractions is the space-joined word
    stream (``sum(len(word)) + n_words − 1``); fractions are
    ``round(·, 6)``; docs with no words carry NULL gram metrics, docs
    with no lines NULL line metrics, and ``repetition_pass`` treats
    NULL metrics as failing only when the doc is genuinely empty
    (zero words ⇒ fail; a one-line doc trivially passes line rules).

    Plan shape (SCALE.md): ZERO shuffles — every metric is a
    within-document statistic, so each n's grams are built, sorted and
    run-length-scanned per row with array HOFs (``array_sort`` + an
    ``aggregate`` carrying (prev, run, dup_chars, best) state); nothing
    ever crosses a row boundary. An input-split guard widens
    under-partitioned local scans (one small parquet file = one task);
    at real scale file splits provide the parallelism and the guard is
    a no-op, so no shuffle is ever added.
    """
    thr = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(thr)
        if unknown:
            raise ValueError(
                f"unknown repetition thresholds {sorted(unknown)}; "
                f"legal: {sorted(thr)}"
            )
        thr.update(thresholds)

    # local-bench artifact guard: a single sub-128MB parquet file scans
    # as ONE task, serializing the per-doc gram work; widening a tiny
    # input is one cheap round-robin exchange of the RAW docs. Never
    # triggers on real multi-split inputs.
    try:
        spark = df.sparkSession
        want = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, want // 2):
            df = df.repartition(want)
    except Exception:
        pass  # planning-only contexts (e.g. streaming) skip the guard

    out = _with_repetition_metrics(df, text_col, thr, line_delim)
    metric_cols = list(GOPHER_REPETITION_THRESHOLDS)
    return out.select(
        id_col,
        *[F.col(f"__grep_{c}").alias(c) for c in metric_cols],
        F.col("__grep_pass").alias("repetition_pass"),
    )


def _with_repetition_metrics(
    df: DataFrame,
    text_col: str,
    thr: dict[str, float],
    line_delim: str = "\n",
) -> DataFrame:
    """Append ``__grep_<metric>`` columns + ``__grep_pass`` to ``df``
    keeping every original column — pure projections end to end (the
    scans are per-row array HOFs), so this composes into BATCH and
    STREAMING plans alike. Callers rename/drop the prefixed columns."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    lines = F.filter(
        F.split(F.col(text_col), line_delim),
        lambda l: F.trim(l) != F.lit(""),
    )
    base = df.select(
        "*",
        words.alias("__grep_ws"),
        lines.alias("__grep_ls"),
    ).select(
        "*",
        F.size("__grep_ws").alias("__grep_nw"),
        F.size("__grep_ls").alias("__grep_nl"),
        (
            F.aggregate(
                "__grep_ws", F.lit(0).cast("long"),
                lambda acc, w: acc + F.length(w),
            )
            + F.greatest(F.size("__grep_ws") - 1, F.lit(0))
        ).alias("__grep_char_base"),
        F.aggregate(
            "__grep_ls", F.lit(0).cast("long"),
            lambda acc, l: acc + F.length(l),
        ).alias("__grep_line_chars"),
    )

    def _scan(sorted_arr):
        """Run-length scan over a SORTED string array: returns
        struct(n_runs, dupch, dupx, top_cnt, top_gram) — distinct
        count; chars covered by runs of length ≥ 2 counting ALL
        occurrences (count × len — the gram convention) and counting
        only repeats BEYOND the first ((count − 1) × len — the line
        convention); and the longest run (first in ascending order on
        ties, i.e. the lexicographically smallest — the deterministic
        tie-break the oracle replays)."""
        init = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).cast("long").alias("dupch"),
            F.lit(0).cast("long").alias("dupx"),
            F.lit(0).alias("bc"),
            F.lit("").alias("bg"),
            F.lit(0).cast("long").alias("runs"),
        )

        def step(s, g):
            same = g == s["prev"]
            end_dup = (~same) & (s["run"] >= 2)
            fin_dup = s["dupch"] + F.when(
                end_dup, s["run"].cast("long") * F.length(s["prev"])
            ).otherwise(F.lit(0).cast("long"))
            fin_dupx = s["dupx"] + F.when(
                end_dup, (s["run"] - 1).cast("long") * F.length(s["prev"])
            ).otherwise(F.lit(0).cast("long"))
            better = (~same) & (s["run"] > s["bc"])
            return F.struct(
                g.alias("prev"),
                F.when(same, s["run"] + 1).otherwise(F.lit(1)).alias("run"),
                fin_dup.alias("dupch"),
                fin_dupx.alias("dupx"),
                F.when(better, s["run"]).otherwise(s["bc"]).alias("bc"),
                F.when(better, s["prev"]).otherwise(s["bg"]).alias("bg"),
                (s["runs"] + F.when(same, 0).otherwise(1)).alias("runs"),
            )

        def finish(s):
            end_dup = s["run"] >= 2
            fin_dup = s["dupch"] + F.when(
                end_dup, s["run"].cast("long") * F.length(s["prev"])
            ).otherwise(F.lit(0).cast("long"))
            fin_dupx = s["dupx"] + F.when(
                end_dup, (s["run"] - 1).cast("long") * F.length(s["prev"])
            ).otherwise(F.lit(0).cast("long"))
            better = s["run"] > s["bc"]
            return F.struct(
                s["runs"].alias("n_runs"),
                fin_dup.alias("dupch"),
                fin_dupx.alias("dupx"),
                F.when(better, s["run"]).otherwise(s["bc"]).alias("top_cnt"),
                F.when(better, s["prev"]).otherwise(s["bg"]).alias("top_gram"),
            )

        return F.aggregate(sorted_arr, init, step, finish)

    def _grams_sorted(n: int):
        # NB: single-parameter lambda — pyspark passes (element, index)
        # to two-parameter lambdas
        return F.array_sort(
            F.when(
                F.col("__grep_nw") >= n,
                F.transform(
                    F.sequence(
                        F.lit(1), F.col("__grep_nw") - F.lit(n - 1)
                    ),
                    lambda i: F.array_join(
                        F.slice("__grep_ws", i, F.lit(n)), " "
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )

    scanned = base.select(
        "*",
        _scan(F.array_sort("__grep_ls")).alias("__grep_L"),
        *[_scan(_grams_sorted(n)).alias(f"__grep_g{n}") for n in range(2, 11)],
    ).drop("__grep_ws", "__grep_ls")

    nlz = F.when(F.col("__grep_nl") > 0, F.col("__grep_nl").cast("double"))
    wz = F.col("__grep_nw") > 0
    cb = F.col("__grep_char_base").cast("double")

    def _top_frac(n: int):
        g = F.col(f"__grep_g{n}")
        return F.when(
            wz,
            F.round(
                F.least(
                    F.lit(1.0),
                    g["top_cnt"] * F.length(g["top_gram"]) / cb,
                ),
                6,
            ),
        )

    def _dup_frac(n: int):
        g = F.col(f"__grep_g{n}")
        return F.when(wz, F.round(F.least(F.lit(1.0), g["dupch"] / cb), 6))

    out = scanned.select(
        "*",
        F.round(
            (F.col("__grep_nl") - F.col("__grep_L.n_runs")) / nlz, 6
        ).alias("__grep_dup_line_frac"),
        F.round(
            F.col("__grep_L.dupx")
            / F.when(
                F.col("__grep_line_chars") > 0, F.col("__grep_line_chars")
            ).cast("double"),
            6,
        ).alias("__grep_dup_line_char_frac"),
        *[
            _top_frac(n).alias(f"__grep_top_{n}gram_char_frac")
            for n in (2, 3, 4)
        ],
        *[
            _dup_frac(n).alias(f"__grep_dup_{n}gram_char_frac")
            for n in range(5, 11)
        ],
    ).drop(
        "__grep_L", *[f"__grep_g{n}" for n in range(2, 11)],
        "__grep_char_base", "__grep_line_chars", "__grep_nl",
    )
    passes = None
    for c in GOPHER_REPETITION_THRESHOLDS:
        cond = F.coalesce(
            F.col(f"__grep_{c}") <= F.lit(float(thr[c])), F.lit(True)
        )  # NULL metric (no lines / empty) doesn't fail by itself
        passes = cond if passes is None else (passes & cond)
    passes = passes & (F.col("__grep_nw") > 0)  # genuinely empty docs fail
    return out.select(
        "*", F.coalesce(passes, F.lit(False)).alias("__grep_pass")
    ).drop("__grep_nw")


def gopher_repetition_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    thresholds: dict[str, float] | None = None,
    line_delim: str = "\n",
) -> DataFrame:
    """Keep documents passing the Gopher repetition rules — JOIN-FREE:
    the per-doc metrics are appended as projections, filtered on, and
    dropped, so every original column survives and the whole gate is
    pure projections + one filter (streaming-legal; ``id_col`` kept for
    gate-signature symmetry). Thresholds validate like
    :func:`gopher_repetition`."""
    thr = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(thr)
        if unknown:
            raise ValueError(
                f"unknown repetition thresholds {sorted(unknown)}; "
                f"legal: {sorted(thr)}"
            )
        thr.update(thresholds)
    out = _with_repetition_metrics(df, text_col, thr, line_delim)
    drop = ["__grep_pass"] + [
        f"__grep_{c}" for c in GOPHER_REPETITION_THRESHOLDS
    ]
    return out.where(F.col("__grep_pass")).drop(*drop)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """Split documents into fixed-window chunks (t32) — the complement
    of t25's sequence PACKING: long documents become ``max_tokens``-word
    windows starting every ``stride`` words (``stride < max_tokens`` ⇒
    overlapping context windows, the standard pretraining/embedding
    chunking; default ``stride = max_tokens`` ⇒ disjoint). Tokens are
    the module's split-on-single-space convention, so chunk token
    counts agree with ``with_token_count``.

    Output: one row per chunk — id, ``chunk_id`` (0-based), ``chunk``
    (space-rejoined text), ``chunk_tokens``. Every word lands in ≥ 1
    chunk and a final short window is kept. Per the module convention
    (and its DuckDB oracles) ``split('', ' ')`` is one empty token, so
    an empty text yields exactly one empty chunk — token accounting
    stays consistent with ``with_token_count``.

    Plan: pure codegen — split once, ``transform`` over the start
    sequence builds the windows, one ``posexplode``; no shuffle, no UDF.
    At 100 TB the output is ≤ ⌈n/stride⌉ rows per doc, written straight
    to the corpus sink."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be ≥ 1, got {max_tokens}")
    s = max_tokens if stride is None else int(stride)
    if not 1 <= s <= max_tokens:
        raise ValueError(
            f"stride must be in [1, max_tokens]; got {s} vs {max_tokens}"
        )
    words = tokens(F.col(text_col))
    n = F.size(words)
    n_chunks = F.when(
        n > 0, F.ceil((n - F.lit(max_tokens)) / F.lit(s)).cast("int") + 1
    ).otherwise(F.lit(0))
    # ceil((n - max)/s) + 1 == number of stride starts covering all n
    # words (1 chunk when n ≤ max); clamp at ≥ 1 for 0 < n < max_tokens
    n_chunks = F.greatest(n_chunks, F.when(n > 0, F.lit(1)).otherwise(F.lit(0)))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(words, i * F.lit(s) + 1, F.lit(max_tokens)),
    )
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_w")
    )
    return out.select(
        id_col,
        "chunk_id",
        F.array_join("_w", " ").alias("chunk"),
        F.size("_w").alias("chunk_tokens"),
    )
