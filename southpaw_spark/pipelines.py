"""End-to-end training-corpus build: the composition a pipeline user
actually ships, wiring the individually-tested operators into one
declarative pass — annotate → filter → decontaminate → exact dedup →
fuzzy dedup → sample → pack.

Every stage is the already-oracle-checked operator (text.*, dedup.*);
this module adds only the glue: stage ordering, survivor threading, and
a per-stage count report. The whole pipeline stays one lazy DataFrame
program per stage boundary — nothing collects to the driver except the
bounded report counts (one count job per enabled stage, skippable with
``collect_report=False``).

Stage order rationale (the standard corpus-build order):
quality/language/contamination filters run FIRST (cheap, map-side or
broadcast-probe — shrink the corpus before anything that shuffles),
exact dedup before fuzzy (content-hash groupBy is near-free and removes
the easy mass), sampling after dedup (sampling first would let a kept
duplicate re-enter), packing last (it assigns output shards to the
final survivor set).

At 100 TB: filters are scan-speed predicates; decontamination is a
broadcast probe (benchmark sets are MBs); exact dedup a combiner
groupBy; fuzzy dedup the skew-bounded exact Jaccard join + star
contraction clustering; sampling a hash-threshold filter (no shuffle);
packing a per-shard window. No stage introduces a driver loop or an
unbounded collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from southpaw_spark.operators.dedup import (
    cluster_keepers,
    connected_components,
    exact_duplicates,
    ngram_jaccard_pairs,
    release,
)
from southpaw_spark.operators.text import (
    ngram_contamination,
    sequence_packing,
    stratified_sample,
    with_lang_guess,
    with_quality_score,
)


def annotate_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    line_clean: bool = False,
    bpe_merges: list[tuple[str, str]] | None = None,
    model_weights: list[float] | None = None,
    model_bias: float = 0.0,
    lang_model: dict[str, list[float]] | None = None,
    lang_biases: dict[str, float] | None = None,
) -> DataFrame:
    """The STATELESS per-doc stage prefix of :func:`build_corpus` —
    optional C4 line cleaning, quality score, language guess, token
    counts (whitespace, plus real BPE counts when ``bpe_merges`` is
    given), and the trained linear-model score — as pure projections,
    so the SAME code annotates batch frames and STREAMING frames (the
    :func:`corpus_stream` front half). ``lang_model`` (t28; per-lang
    weight vectors, e.g. from :func:`train_language_id`) REPLACES the
    marker heuristic: ``lang_guess`` becomes the trained classifier's
    argmax, so every downstream lang-keyed stage (gates, strata,
    budgets, mixes) runs on the trained labels with no other change.
    On a streaming input the model score and the language classifier
    automatically take their zero-shuffle ``impl="hof"`` twins
    (bit-identical output; streaming projections can't host the
    explode+groupBy+join plan)."""
    cur = docs
    if line_clean:
        from southpaw_spark.operators.text import clean_lines

        cur = clean_lines(cur, text_col)
    cur = with_quality_score(cur, text_col)
    if lang_model is not None:
        from southpaw_spark.operators.text import classify_language

        cur = classify_language(
            cur, text_col, id_col, lang_model, lang_biases,
            out_col="lang_guess",
            impl="hof" if cur.isStreaming else "explode",
        )
    else:
        cur = with_lang_guess(cur, text_col)
    if bpe_merges is not None:
        from southpaw_spark.operators.bpe import with_bpe_token_count

        cur = with_bpe_token_count(cur, text_col, bpe_merges)
    if model_weights is not None:
        from southpaw_spark.operators.text import score_with_linear_model

        cur = score_with_linear_model(
            cur, text_col, id_col, model_weights, model_bias,
            impl="hof" if cur.isStreaming else "explode",
        )
    return cur


def decontaminate_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    mode: str = "drop",
    max_contamination_rate: float = 0.0,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    recount=None,
    collect_stats: bool = False,
    corpus_shingles: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """The decontamination stage, factored so :func:`build_corpus` and
    :func:`corpus_stream` run the IDENTICAL code: all three modes are
    stateless per-doc decisions against a fixed benchmark (broadcast
    probes — d17's n-gram rate for ``"drop"``, d21's shingle Jaccard
    for ``"fuzzy"``, d17's span scrub for ``"cut"``), so the kept set
    is independent of batching and the stream ≡ batch contract extends
    to it for free. Returns ``(survivors, stats)``; ``stats`` carries
    the cut-mode report fields when ``collect_stats`` (one bounded agg
    collect — batch callers only). ``recount`` (cut mode) refreshes a
    BPE token column after the rewrite. Docs too short to carry an
    n-gram are KEPT — no evidence is not contamination."""
    if mode not in ("drop", "cut", "fuzzy"):
        raise ValueError(
            f"decontaminate_mode must be 'drop', 'cut' or 'fuzzy'; got "
            f"{mode!r}"
        )
    stats: dict = {}
    if mode == "drop":
        contam = ngram_contamination(
            docs, benchmark, text_col, id_col, n=n
        )
        dirty = contam.where(
            F.col("contamination_rate") > max_contamination_rate
        ).select(id_col)
        return docs.join(dirty, id_col, "left_anti"), stats
    if mode == "fuzzy":
        # d21: drop docs that are EDITED copies of benchmark items
        # (shingle-set Jaccard ≥ threshold — here the knob is a
        # similarity threshold, not a rate; verbatim leaks are a
        # special case with Jaccard ≈ 1)
        from southpaw_spark.operators.dedup import jaccard_contamination

        thr = (
            max_contamination_rate if max_contamination_rate > 0 else 0.5
        )
        flagged = jaccard_contamination(
            docs, benchmark, text_col, id_col, n=n, threshold=thr,
            corpus_shingles=corpus_shingles,
        ).select(id_col)
        if corpus_shingles is not None:
            # Consume the caller's shared shingle cache NOW and truncate
            # the lineage to the (small) flagged-id set: the caller
            # unpersists the inventory after its own consumers run, and
            # the survivors' anti-join must not lazily re-derive the
            # shingles on the final action (it would silently degrade
            # the shared-inventory optimization to two shinglings when
            # no intermediate count materializes this branch).
            flagged = flagged.localCheckpoint(eager=True)
        return docs.join(flagged, id_col, "left_anti"), stats
    # "cut": surgical scrub — locate the leaked passages (d17) and cut
    # them out, keeping the rest of the doc; docs scrubbed to nothing
    # are dropped. n_tokens is refreshed so later token-denominated
    # stages see the post-cut lengths.
    from southpaw_spark.operators.dedup import cut_spans, span_contamination

    spans = span_contamination(
        docs, benchmark, text_col, id_col, k=n
    ).select(F.col(id_col), "spans")
    cleaned = cut_spans(docs, spans, text_col, id_col)
    if collect_stats:
        # one small agg over the (persisted-next) lineage: how many
        # tokens the scrub removed, corpus-wide
        cut_row = cleaned.agg(
            F.sum(
                F.col("n_tokens_before") - F.col("n_tokens_after")
            ).alias("cut"),
            F.count_if(F.col("n_tokens_after") == 0).alias("emptied"),
        ).collect()[0]
        stats["decontaminated_tokens_cut"] = int(cut_row["cut"] or 0)
        stats["decontaminated_docs_emptied"] = int(cut_row["emptied"] or 0)
    rewritten = (
        cleaned.where(F.col("n_tokens_after") > 0)
        .withColumn(text_col, F.col(f"{text_col}_clean"))
        .withColumn("n_tokens", F.col("n_tokens_after"))
        .drop(f"{text_col}_clean", "n_tokens_before", "n_tokens_after")
    )
    if recount is not None:
        rewritten = recount(rewritten)
    return rewritten, stats


def build_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_quality: float | None = None,
    min_tokens: int | None = None,
    gopher: bool = False,
    gopher_thresholds: dict | None = None,
    gopher_rep: bool = False,
    gopher_rep_thresholds: dict | None = None,
    model_weights: list[float] | None = None,
    model_bias: float = 0.0,
    min_model_score: float | None = None,
    bpe_merges: list[tuple[str, str]] | None = None,
    langs: list[str] | None = None,
    lang_model: dict[str, list[float]] | None = None,
    lang_biases: dict[str, float] | None = None,
    line_clean: bool = False,
    url_col: str | None = None,
    blocklist=None,
    benchmark: DataFrame | None = None,
    max_contamination_rate: float = 0.0,
    contamination_n: int = 5,
    decontaminate_mode: str = "drop",
    exact_dedup: bool = True,
    fuzzy_threshold: float | None = None,
    fuzzy_n: int = 3,
    fuzzy_keep: str = "min_id",
    span_dedup_k: int | None = None,
    span_min_count: int = 2,
    line_dedup_min_count: int | None = None,
    ppl_domain_col: str | None = None,
    ppl_cuts: tuple = (1 / 3, 2 / 3),
    ppl_labels: tuple = ("head", "middle", "tail"),
    ppl_keep: list[str] | None = None,
    ppl_reference: DataFrame | None = None,
    min_logprob: float | None = None,
    sample_rates: dict[str, float] | None = None,
    sample_default_rate: float = 0.0,
    sample_salt: str = "",
    token_budgets: dict[str, int] | None = None,
    mix_total_tokens: int | None = None,
    mix_alpha: float = 0.5,
    pack_token_budget: int | None = None,
    split_fractions: dict[str, float] | None = None,
    collect_report: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the corpus build; return ``(kept_docs, report)``.

    ``kept_docs`` carries the input columns plus the annotation columns
    (n_tokens / quality_score / lang_guess, and pack_id/n_tokens when
    packing is enabled). ``report`` maps stage name → surviving doc
    count after that stage (empty dict when ``collect_report=False``).
    With ``collect_report=True`` the returned ``kept_docs`` is already
    persisted and counted (the last stage boundary) — ``.unpersist()``
    it when done; intermediate stage caches are dropped as each
    successor materializes.

    ``bpe_merges`` (a trained merge table from
    :func:`operators.bpe.bpe_train`) switches ALL token accounting —
    the ``min_tokens`` gate, ``token_budgets``/``mix_total_tokens``
    sampling, and ``pack_token_budget`` packing — from the whitespace
    approximation to real vocab-driven BPE counts (``n_tokens_bpe``
    column, recomputed after every text-rewriting stage).

    Stages are enabled by their arguments: ``line_clean`` applies
    C4-style line-level cleaning (:func:`clean_lines`) BEFORE any
    signal is computed, so quality/token stats see only surviving
    prose; ``min_quality``/``min_tokens``
    gate on :func:`with_quality_score`; ``model_weights`` scores every
    doc with the trained fastText-style linear classifier
    (:func:`score_with_linear_model`, hashed bag-of-words × broadcast
    weights, ``model_bias``) as ``model_score``, and
    ``min_model_score`` gates on that margin; ``langs`` keeps only those
    :func:`with_lang_guess` labels; ``blocklist`` (a domain list or a
    single-column DataFrame; requires ``url_col``) drops docs whose URL
    host is on or under a blocked domain (:func:`blocklist_filter`,
    the C4/RefinedWeb domain gate) FIRST among the URL stages — a
    broadcast/codegen filter is cheaper than anything content-based;
    ``url_col`` dedups by
    :func:`canonical_url` BEFORE any content-based stage (cheapest
    identity first — min id per canonical URL); ``benchmark`` decontaminates
    against an eval set — ``decontaminate_mode="drop"`` (default)
    drops docs whose n-gram ``contamination_rate`` exceeds
    ``max_contamination_rate``, while ``"cut"`` surgically removes the
    leaked k-gram spans (:func:`span_contamination` + ``cut_spans``,
    ``k=contamination_n``) keeping the rest of the doc, dropping only
    docs scrubbed to nothing, and ``"fuzzy"`` drops EDITED benchmark
    copies by shingle-set Jaccard (:func:`jaccard_contamination`,
    threshold = ``max_contamination_rate`` when > 0 else 0.5 —
    paraphrases that carry no verbatim n-gram evidence), reporting
    ``decontaminated_tokens_cut`` / ``decontaminated_docs_emptied``
    (docs too short to carry an n-gram are KEPT — no evidence is not
    contamination); ``exact_dedup`` keeps the min-id copy per content
    hash; ``fuzzy_threshold`` drops all but one member of each near-dup
    cluster (exact Jaccard pairs → connected components — transitive,
    unlike the greedy pairwise drop in the d08 registry row), the
    keeper chosen by ``fuzzy_keep``: ``"min_id"`` (default,
    deterministic canonical id) or ``"best_quality"`` (each family's
    highest ``quality_score`` member, ties → min id — keep the BEST
    copy, not the earliest); ``span_dedup_k`` rewrites every doc with
    its duplicated ``k``-gram spans cut out
    (:func:`remove_duplicate_spans`, Lee et al.-style substring dedup —
    runs AFTER doc-level dedup so only cross-doc boilerplate is cut,
    and docs left empty are dropped); ``line_dedup_min_count`` cuts
    every LINE occurring at least that many times corpus-wide
    (:func:`remove_duplicate_lines`, RefinedWeb's repeated-line
    removal — the line-granular sibling of span dedup, likewise after
    doc-level dedup, docs emptied are dropped); ``ppl_domain_col``
    annotates every surviving doc with a CCNet perplexity bucket
    (:func:`perplexity_buckets` — the corpus-trained bigram LM ranked
    per domain, ``ppl_cuts``/``ppl_labels``; ``ppl_reference`` trains
    the LM on a clean reference corpus instead — the full CCNet
    recipe; runs AFTER dedup so a self-trained LM sees the
    deduplicated corpus, CCNet's order) as
    ``ppl_bucket`` + ``avg_logprob``, and ``ppl_keep`` optionally
    gates to the named buckets (docs under two words have no LM
    evidence, bucket NULL, and a ``ppl_keep`` gate drops them — gate
    short docs with ``min_tokens`` upstream); ``min_logprob``
    (requires ``ppl_reference``) is the ABSOLUTE fluency gate — drop
    docs scoring under the threshold against the reference-trained
    bigram LM (:func:`score_with_bigram_reference`; stateless per-doc,
    so :func:`corpus_stream` runs the identical gate per micro-batch;
    docs under two words pass — no transition evidence);
    ``sample_rates``
    stratifies on
    ``lang_guess``; ``token_budgets`` greedily samples each
    ``lang_guess`` stratum to a token budget
    (:func:`token_budget_sample`); ``mix_total_tokens`` instead DERIVES
    the per-``lang_guess`` budgets from the surviving corpus via
    temperature-flattened weights (:func:`temperature_mix`,
    ``mix_alpha``; mutually exclusive with ``token_budgets``);
    ``pack_token_budget`` appends shard-local pack assignments
    (sharded by ``lang_guess``); ``split_fractions`` appends a
    deterministic train/val/test ``split`` label (:func:`hash_split`,
    salted by ``sample_salt`` — stable across rebuilds, so no doc
    ever migrates between splits).
    """
    # validate the whole configuration BEFORE any stage runs — a bad
    # combination must fail immediately, not after earlier stages have
    # already triggered real Spark jobs (collect_report counts)
    if token_budgets is not None and mix_total_tokens is not None:
        raise ValueError(
            "token_budgets and mix_total_tokens are two ways to set "
            "the same budgets — pass one, not both"
        )
    if decontaminate_mode not in ("drop", "cut", "fuzzy"):
        raise ValueError(
            "decontaminate_mode must be 'drop', 'cut' or 'fuzzy'; got "
            f"{decontaminate_mode!r}"
        )
    if fuzzy_keep not in ("min_id", "best_quality"):
        raise ValueError(
            "fuzzy_keep must be 'min_id' or 'best_quality'; got "
            f"{fuzzy_keep!r}"
        )
    if min_model_score is not None and model_weights is None:
        raise ValueError(
            "min_model_score requires model_weights (the trained "
            "linear-classifier gate scores before it thresholds)"
        )
    if blocklist is not None and url_col is None:
        raise ValueError(
            "blocklist requires url_col (the gate matches URL hosts)"
        )
    if ppl_keep is not None and ppl_domain_col is None:
        raise ValueError(
            "ppl_keep requires ppl_domain_col (buckets are per-domain)"
        )
    if ppl_domain_col is not None and len(ppl_labels) != len(ppl_cuts) + 1:
        raise ValueError(
            f"need len(ppl_labels) == len(ppl_cuts) + 1; got "
            f"{len(ppl_labels)} labels for {len(ppl_cuts)} cuts"
        )
    if min_logprob is not None and ppl_reference is None:
        raise ValueError(
            "min_logprob requires ppl_reference: the absolute fluency "
            "gate scores against a FIXED reference-trained LM (a "
            "self-trained LM would move with the corpus — and with "
            "every batch in the streaming twin)"
        )
    if gopher_thresholds is not None:
        if not gopher:
            raise ValueError("gopher_thresholds requires gopher=True")
        import inspect

        from southpaw_spark.operators.text import gopher_quality

        legal = set(inspect.signature(gopher_quality).parameters) - {
            "df", "text_col", "id_col"
        }
        bad = set(gopher_thresholds) - legal
        if bad:
            raise ValueError(
                f"unknown gopher_thresholds keys {sorted(bad)}; "
                f"legal: {sorted(legal)}"
            )
    if gopher_rep_thresholds is not None:
        if not gopher_rep:
            raise ValueError(
                "gopher_rep_thresholds requires gopher_rep=True"
            )
        from southpaw_spark.operators.text import (
            GOPHER_REPETITION_THRESHOLDS,
        )

        bad = set(gopher_rep_thresholds) - set(GOPHER_REPETITION_THRESHOLDS)
        if bad:
            raise ValueError(
                f"unknown gopher_rep_thresholds keys {sorted(bad)}; "
                f"legal: {sorted(GOPHER_REPETITION_THRESHOLDS)}"
            )

    report: dict[str, int] = {}
    persisted: list[DataFrame] = []

    def note(stage: str, df: DataFrame) -> DataFrame:
        if collect_report:
            # Persist each stage boundary before counting: the count job
            # materializes the stage once, and every later stage (and its
            # count) reads the persisted frame instead of re-executing the
            # whole upstream lineage — without this the report multiplies
            # pipeline cost by the number of enabled stages at scale. The
            # previous boundary is unpersisted only after its successor is
            # materialized, so nothing recomputes.
            df = df.persist()
            report[stage] = df.count()
            while persisted:
                persisted.pop().unpersist()
            persisted.append(df)
        return df

    # the stateless annotation prefix is SHARED with corpus_stream
    # (annotate_docs): line cleaning first (t19; quality/token signals
    # must see surviving prose), then quality/lang/token columns. With
    # ``bpe_merges`` every token-denominated stage (min_tokens gate,
    # t15 budgets, t17 mix, t09 packing) runs on the REAL vocab-driven
    # BPE count — production budgets are measured against the actual
    # tokenizer, and regex/whitespace counts can diverge 2×+ on
    # code/non-English text. The count column is recomputed after
    # every text-rewriting stage (decontaminate-cut, span dedup) so
    # budgets see post-cut lengths. (The model score is NOT annotated
    # here: build_corpus scores only min_tokens/min_quality survivors,
    # at its own stage below.)
    cur = annotate_docs(
        docs, text_col, id_col,
        line_clean=line_clean, bpe_merges=bpe_merges,
        lang_model=lang_model, lang_biases=lang_biases,
    )
    if bpe_merges is not None:
        from southpaw_spark.operators.bpe import with_bpe_token_count

        tok_col = "n_tokens_bpe"

        def _recount(df: DataFrame) -> DataFrame:
            return with_bpe_token_count(
                df.drop(tok_col), text_col, bpe_merges
            )

    else:
        tok_col = "n_tokens"
        _recount = None
    note("input", cur)

    if min_tokens is not None:
        cur = note("min_tokens", cur.where(F.col(tok_col) >= min_tokens))
    if min_quality is not None:
        cur = note(
            "min_quality", cur.where(F.col("quality_score") >= min_quality)
        )
    if gopher:
        # Gopher/MassiveText rule gate (t30) — rule-based sibling of the
        # t22 trained gate; a pure codegen predicate
        from southpaw_spark.operators.text import gopher_filter

        cur = note(
            "gopher",
            gopher_filter(
                cur, text_col, id_col, **(gopher_thresholds or {})
            ),
        )
    if gopher_rep:
        # Gopher repetition gate (t31, Table A2) — per-doc gram scans,
        # id-keyed semi-join against the passing set
        from southpaw_spark.operators.text import gopher_repetition_filter

        cur = note(
            "gopher_rep",
            gopher_repetition_filter(
                cur, text_col, id_col, gopher_rep_thresholds
            ),
        )
    if model_weights is not None:
        # trained-classifier gate (t22): fastText-style hashed-BoW
        # linear margin — the production-quality filter heuristic
        # rules approximate; annotation always, threshold optional
        from southpaw_spark.operators.text import score_with_linear_model

        cur = score_with_linear_model(
            cur, text_col, id_col, model_weights, model_bias
        )
        if min_model_score is not None:
            cur = note(
                "model_quality",
                cur.where(F.col("model_score") >= min_model_score),
            )
    if langs is not None:
        cur = note("langs", cur.where(F.col("lang_guess").isin(list(langs))))

    if blocklist is not None:
        # domain blocklist gate (t24) — the cheapest drop of all (a
        # broadcast suffix-chain probe / codegen predicate), so it runs
        # before even URL dedup: a blocked page never costs a shingle
        from southpaw_spark.operators.text import blocklist_filter

        cur = note(
            "blocklist",
            blocklist_filter(cur, url_col, id_col, blocklist),
        )

    if url_col is not None:
        # URL-level dedup FIRST — it is the cheapest identity (pure
        # codegen canonicalization + one groupBy, no text shingling)
        # and web corpora routinely carry the same page under several
        # surface URLs; keeper = min id per canonical form (t18)
        from southpaw_spark.operators.text import canonical_url

        keyed = cur.select(
            F.col(id_col), canonical_url(F.col(url_col)).alias("__cu")
        )
        # NULL url ⇒ NULL canonical form: those docs carry no URL
        # identity evidence and must ALL survive this stage — a plain
        # groupBy would collapse them into one keeper (the blocklist
        # NULL bug's sibling)
        keep_ids = (
            keyed.where(F.col("__cu").isNotNull())
            .groupBy("__cu")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
            .unionByName(
                keyed.where(F.col("__cu").isNull()).select(id_col)
            )
        )
        cur = note("url_dedup", cur.join(keep_ids, id_col, "left_semi"))

    # t27 reference LM: trained ONCE when any stage needs it — the
    # min_logprob gate here and/or the ppl bucket stage below (the
    # counts are corpus-independent, so sharing is exact)
    ppl_model = None
    if ppl_reference is not None and (
        min_logprob is not None or ppl_domain_col is not None
    ):
        from southpaw_spark.operators.text import bigram_reference_model

        ppl_model = bigram_reference_model(ppl_reference, text_col)
        if min_logprob is not None and ppl_domain_col is not None:
            ppl_model.persist()  # two consumer stages

    if min_logprob is not None:
        # t27 absolute fluency gate (the CCNet LM filter as a hard
        # threshold): score every doc against the FIXED
        # reference-trained bigram LM and keep avg_logprob >=
        # min_logprob. Stateless per-doc once the counts exist, so the
        # streaming twin runs the IDENTICAL helper per micro-batch.
        # Docs under two words carry no transition evidence and PASS
        # (gate short docs with min_tokens); runs after the cheap
        # URL-keyed gates — the LM score pays two count joins.
        from southpaw_spark.operators.text import (
            score_with_bigram_reference,
        )

        gate_scores = score_with_bigram_reference(
            cur, text_col, id_col, ppl_model
        ).select(F.col(id_col), F.col("avg_logprob").alias("__alp"))
        cur = note(
            "ppl_gate",
            cur.join(gate_scores, id_col, "left")
            .where(
                F.col("__alp").isNull()
                | (F.col("__alp") >= float(min_logprob))
            )
            .drop("__alp"),
        )

    # Shared shingle inventory: when BOTH fuzzy decontamination and
    # fuzzy dedup are enabled at the same n, the corpus is shingled
    # ONCE here and the cached (id, shingle) frame threads through
    # both stages (the dedup stage semi-joins it down to its survivor
    # set — per-doc shingles are unaffected by dropping other docs, so
    # outputs are bit-identical to stage-local shingling). Legal only
    # while the text is unchanged: "cut" rewrites text, so it never
    # shares.
    shared_shingles = None
    if (
        benchmark is not None
        and decontaminate_mode == "fuzzy"
        and fuzzy_threshold is not None
        and contamination_n == fuzzy_n
    ):
        from southpaw_spark.operators.dedup import shingles

        shared_shingles = shingles(
            cur, text_col, id_col, contamination_n
        ).persist()

    if benchmark is not None:
        cleaned, stats = decontaminate_docs(
            cur, benchmark,
            mode=decontaminate_mode,
            max_contamination_rate=max_contamination_rate,
            n=contamination_n, text_col=text_col, id_col=id_col,
            recount=_recount, collect_stats=collect_report,
            corpus_shingles=shared_shingles,
        )
        report.update(stats)
        cur = note("decontaminated", cleaned)

    if exact_dedup:
        losers = exact_duplicates(cur, text_col, id_col).select(
            F.explode("doc_ids").alias(id_col), F.col("keep_id")
        ).where(F.col(id_col) != F.col("keep_id")).select(id_col)
        cur = note("exact_dedup", cur.join(losers, id_col, "left_anti"))

    if fuzzy_threshold is not None:
        surviving_shingles = None
        if shared_shingles is not None:
            # the cached inventory filtered to the current survivor set
            # — one semi-join instead of re-scanning + re-exploding the
            # whole corpus text
            surviving_shingles = shared_shingles.join(
                cur.select(id_col), id_col, "left_semi"
            )
        pairs = ngram_jaccard_pairs(
            cur, text_col, id_col, n=fuzzy_n, threshold=fuzzy_threshold,
            shingles_df=surviving_shingles,
        )
        clusters = connected_components(pairs)
        # connected_components consumed pairs eagerly (it localCheckpoints
        # the raw edge frame up front, so both the contraction loop AND
        # the vertex union for the labels are lineage-truncated) — the
        # Jaccard join's internal cache is no longer referenced by
        # anything downstream
        release(pairs)
        if shared_shingles is not None:
            # both consumers have executed by now — decontaminate_docs
            # eagerly localCheckpoints its flagged-id set (so the
            # anti-join lineage no longer references the inventory,
            # regardless of collect_report), and connected_components
            # consumed the pairs build — the shared inventory is done
            shared_shingles.unpersist()
        if fuzzy_keep == "best_quality":
            # keep each near-dup family's HIGHEST-QUALITY member (ties →
            # min id) instead of the min id — the keeper a production
            # corpus build actually wants
            keepers = cluster_keepers(
                clusters, cur, id_col, score_col="quality_score"
            )
            fuzzy_losers = keepers.where(~F.col("is_keeper")).select(
                F.col("id").alias(id_col)
            )
        else:  # "min_id" — validated up front
            fuzzy_losers = clusters.where(
                F.col("id") != F.col("cluster_id")
            ).select(F.col("id").alias(id_col))
        cur = note("fuzzy_dedup", cur.join(fuzzy_losers, id_col, "left_anti"))

    if span_dedup_k is not None:
        from southpaw_spark.operators.dedup import remove_duplicate_spans

        cleaned = remove_duplicate_spans(
            cur, text_col, id_col, k=span_dedup_k,
            min_count=span_min_count,
        )
        rewritten = (
            cleaned.where(F.col("n_tokens_after") > 0)
            .withColumn(text_col, F.col(f"{text_col}_clean"))
            .withColumn("n_tokens", F.col("n_tokens_after"))
            .drop(f"{text_col}_clean", "n_tokens_before", "n_tokens_after")
        )
        if _recount is not None:
            rewritten = _recount(rewritten)
        cur = note("span_dedup", rewritten)

    if line_dedup_min_count is not None:
        # d22: corpus-global repeated-line removal (RefinedWeb) — the
        # line-granular sibling of span dedup; n_tokens is refreshed so
        # later token-budget/packing stages see post-cut lengths
        from southpaw_spark.operators.dedup import remove_duplicate_lines

        cleaned = remove_duplicate_lines(
            cur, text_col, id_col, min_count=line_dedup_min_count
        )
        rewritten = (
            cleaned.where(F.col("n_tokens_after") > 0)
            .withColumn(text_col, F.col(f"{text_col}_clean"))
            .withColumn("n_tokens", F.col("n_tokens_after"))
            .drop(
                f"{text_col}_clean", "n_lines_before", "n_lines_after",
                "n_tokens_after",
            )
        )
        if _recount is not None:
            rewritten = _recount(rewritten)
        cur = note("line_dedup", rewritten)

    if ppl_domain_col is not None:
        # t23: CCNet per-domain perplexity stratification — train the
        # bigram LM on the SURVIVING corpus (post-dedup, CCNet's
        # order), rank within each domain, annotate head/middle/tail
        from southpaw_spark.operators.text import perplexity_buckets

        bkt_full = perplexity_buckets(
            cur, text_col, id_col, ppl_domain_col,
            cuts=ppl_cuts, labels=ppl_labels,
            reference=ppl_model if ppl_model is not None else ppl_reference,
        )
        buckets = bkt_full.select(
            F.col(id_col), "avg_logprob", "ppl_bucket"
        )
        cur = cur.join(buckets, id_col, "left")
        if ppl_keep is not None:
            cur = note(
                "ppl_filtered",
                cur.where(F.col("ppl_bucket").isin(list(ppl_keep))),
            )
        else:
            cur = note("ppl_bucketed", cur)
        # the skew-split path persists its scored frame (the
        # _southpaw_cached convention) — hand it to the stage-boundary
        # cleanup list so the NEXT note() materialization releases it
        persisted.extend(getattr(bkt_full, "_southpaw_cached", []))
        if ppl_model is not None and min_logprob is not None:
            # the shared reference counts were persisted for two
            # stages; this was the second
            persisted.extend([ppl_model.cnt2, ppl_model.cnt1])

    if sample_rates is not None:
        cur = note(
            "sampled",
            stratified_sample(
                cur, "lang_guess", id_col, sample_rates,
                default_rate=sample_default_rate, salt=sample_salt,
            ),
        )

    if token_budgets is not None:
        from southpaw_spark.operators.text import token_budget_sample

        keep_ids = token_budget_sample(
            cur, text_col, id_col, "lang_guess", token_budgets,
            salt=sample_salt,
            n_tokens_col=tok_col if bpe_merges is not None else None,
        ).select(id_col)
        cur = note(
            "token_budgeted", cur.join(keep_ids, id_col, "left_semi")
        )

    if mix_total_tokens is not None:
        # temperature-flattened mix (t17): budgets derived from the
        # surviving corpus itself, then the same no-global-sort greedy
        # (mutual exclusivity with token_budgets validated up front)
        from southpaw_spark.operators.text import temperature_mix

        keep_ids = temperature_mix(
            cur, text_col, id_col, "lang_guess", mix_total_tokens,
            alpha=mix_alpha, salt=sample_salt,
            n_tokens_col=tok_col if bpe_merges is not None else None,
        ).select(id_col)
        cur = note(
            "temperature_mixed", cur.join(keep_ids, id_col, "left_semi")
        )

    if pack_token_budget is not None:
        packs = sequence_packing(
            cur, text_col, id_col, "lang_guess",
            token_budget=pack_token_budget,
            n_tokens_col=tok_col if bpe_merges is not None else None,
        ).select(id_col, "pack_id")
        cur = note("packed", cur.join(packs, id_col))

    if split_fractions is not None:
        # final labeling stage — a deterministic split column, zero
        # cost (pure projection); write_corpus(partition_by=["split"])
        # then ships train/val/test as hive partitions (t20)
        from southpaw_spark.operators.text import hash_split

        cur = hash_split(cur, id_col, split_fractions, salt=sample_salt)

    return cur, report


def write_corpus(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    n_output_partitions: int | None = None,
    max_records_per_file: int | None = 100_000,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Ship the kept corpus as a sharded dataset a training loader can
    stream: hive-partitioned directories (``partition_by``, e.g.
    ``["lang_guess"]`` — downstream readers get partition pruning for
    free) with ``maxRecordsPerFile`` bounding every shard (loaders want
    ~uniform shards; one giant file serializes a 1000-worker read).

    ``order_by``: a SORT-FREE global ORDER BY for the export — the
    part files, concatenated in part-number order, read back in
    ``order_by`` order. The same skeleton as a09/t15 (range-bucket →
    within-bucket sort, never one global sort): ``repartitionByRange``
    samples boundaries in one bounded pass and
    ``sortWithinPartitions`` pays ``n_output_partitions`` parallel
    sorts. Mutually exclusive with ``partition_by`` (hive dirs split
    the file sequence, so "global file order" stops being
    well-defined).

    At 100 TB this is one distributed write — without ``order_by`` no
    repartition is forced: shard count follows the upstream
    partitioning, and callers needing fewer/larger files should
    coalesce explicitly with that trade in view."""
    if order_by:
        if partition_by:
            raise ValueError(
                "order_by and partition_by are mutually exclusive: hive "
                "partition dirs split the file sequence, so a global "
                "file order cannot be promised"
            )
        cols = [F.col(c) for c in order_by]
        if n_output_partitions is not None:
            df = df.repartitionByRange(n_output_partitions, *cols)
        else:
            df = df.repartitionByRange(*cols)
        df = df.sortWithinPartitions(*cols)
    w = df.write.mode(mode).format(fmt)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_shuffled_corpus(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    salt: str = "",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write the corpus as ≤ ``n_shards`` files whose concatenation in
    part-number order IS the deterministic epoch permutation — the
    shuffle export a training loader streams
    (:func:`southpaw_spark.operators.text.shuffled_shards` documents
    the (shard, pos) contract; this writer materializes that exact
    global order as contiguous file chunks). The scale shape:
    ``repartitionByRange`` on (shard, priority) — one shuffle whose
    range boundaries come from a bounded sample — then
    ``sortWithinPartitions``: n_shards parallel in-partition sorts,
    no rank column, no single-task global sort. Re-running with the
    same ``salt`` reproduces the same row order."""
    from southpaw_spark.operators.text import hash_priority

    out = (
        df.withColumn("__pri", hash_priority(id_col, salt))
        .withColumn("__shard", (F.col("__pri") % n_shards).cast("int"))
        .repartitionByRange(n_shards, "__shard", "__pri", id_col)
        .sortWithinPartitions("__shard", "__pri", id_col)
        .drop("__pri", "__shard")
    )
    out.write.mode(mode).format(fmt).save(path)


def parquet_corpus_sink(path: str, fmt: str = "parquet"):
    """Exactly-once streaming corpus writer — the production ``sink``
    for :func:`corpus_stream`: each micro-batch's kept docs land in
    ``<path>/batch_id=<N>/`` (a hive partition dir, so
    ``spark.read.parquet(path)`` sees everything with a ``batch_id``
    column for free).

    Exactly-once from at-least-once: foreachBatch may REPLAY a batch
    after a crash between sink success and checkpoint commit, but
    always with the SAME batch_id over the same source slice (offsets
    live in the checkpoint). Keying the write on batch_id with
    ``mode("overwrite")`` makes the replay idempotent — the second
    write replaces the first, never appends. Readers get per-directory
    atomicity from the ``_SUCCESS`` marker (a crash mid-overwrite
    leaves no marker and the replay rewrites the dir).

    Retroactive dedup decisions (fuzzy ``best_quality`` keeper swaps)
    surface at the DECISION level, not in kept batches — sinks needing
    them subscribe via ``attach_dedup_stream``; batch-level outputs are
    folded by :func:`compact_corpus_stream_output`."""

    def sink(kept: DataFrame, batch_id: int) -> None:
        kept.write.mode("overwrite").format(fmt).save(
            f"{path}/batch_id={batch_id}"
        )

    return sink


def compact_corpus_stream_output(
    spark,
    stream_path: str,
    out_path: str,
    id_col: str = "doc_id",
    fmt: str = "parquet",
    text_col: str = "text",
    span_deduper=None,
    line_deduper=None,
    bpe_merges: list[tuple[str, str]] | None = None,
    **write_kwargs,
) -> None:
    """Fold a :func:`parquet_corpus_sink` output tree into one clean
    corpus: latest batch wins per id (a doc re-emitted by a later batch
    — e.g. after an upstream replay fed overlapping files — keeps only
    its newest row), then ships via :func:`write_corpus`. One id-keyed
    shuffle; the per-id group is the handful of batches that emitted
    the doc, never corpus-wide.

    Pass the stream's ``span_deduper`` / ``line_deduper`` to apply
    their CUMULATIVE boilerplate spans here — the deferred-cut half of
    the streaming d15/d22 contract (evidence accumulates per batch in
    :func:`corpus_stream`; the retroactive flags make the cut correct
    only at fold time). The rewrite replicates ``build_corpus``'s
    span/line stages exactly: covered tokens/lines cut, emptied docs
    dropped, ``n_tokens`` refreshed (BPE recount when ``bpe_merges``
    is the build's merge list)."""
    from pyspark.sql.window import Window

    df = spark.read.format(fmt).load(stream_path)
    w = Window.partitionBy(id_col).orderBy(F.col("batch_id").desc())
    latest = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "batch_id")
    )

    def _recount(frame: DataFrame) -> DataFrame:
        if bpe_merges is None:
            return frame
        from southpaw_spark.operators.bpe import with_bpe_token_count

        return with_bpe_token_count(
            frame.drop("n_tokens_bpe"), text_col, bpe_merges
        )

    if span_deduper is not None:
        from southpaw_spark.operators.dedup import cut_spans

        spans = span_deduper.current_spans().select(F.col(id_col), "spans")
        cleaned = cut_spans(latest, spans, text_col, id_col)
        latest = _recount(
            cleaned.where(F.col("n_tokens_after") > 0)
            .withColumn(text_col, F.col(f"{text_col}_clean"))
            .withColumn("n_tokens", F.col("n_tokens_after"))
            .drop(
                f"{text_col}_clean", "n_tokens_before", "n_tokens_after"
            )
        )
    if line_deduper is not None:
        from southpaw_spark.operators.dedup import cut_lines

        spans = line_deduper.current_spans().select(F.col(id_col), "spans")
        cleaned = cut_lines(latest, spans, text_col, id_col)
        latest = _recount(
            cleaned.where(F.col("n_tokens_after") > 0)
            .withColumn(text_col, F.col(f"{text_col}_clean"))
            .withColumn("n_tokens", F.col("n_tokens_after"))
            .drop(
                f"{text_col}_clean", "n_lines_before", "n_lines_after",
                "n_tokens_after",
            )
        )
    write_corpus(latest, out_path, fmt=fmt, **write_kwargs)


def corpus_stream(
    deduper,
    docs_stream: DataFrame,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_clean: bool = False,
    bpe_merges: list[tuple[str, str]] | None = None,
    min_tokens: int | None = None,
    min_quality: float | None = None,
    gopher: bool = False,
    gopher_thresholds: dict | None = None,
    gopher_rep: bool = False,
    gopher_rep_thresholds: dict | None = None,
    model_weights: list[float] | None = None,
    model_bias: float = 0.0,
    min_model_score: float | None = None,
    langs: list[str] | None = None,
    lang_model: dict[str, list[float]] | None = None,
    lang_biases: dict[str, float] | None = None,
    url_col: str | None = None,
    url_dedup: bool = False,
    blocklist: list[str] | None = None,
    benchmark: DataFrame | None = None,
    max_contamination_rate: float = 0.0,
    contamination_n: int = 5,
    decontaminate_mode: str = "drop",
    ppl_reference: DataFrame | None = None,
    min_logprob: float | None = None,
    split_fractions: dict[str, float] | None = None,
    sample_salt: str = "",
    span_deduper=None,
    line_deduper=None,
    sink=None,
    decisions_sink=None,
    trigger: dict | None = None,
):
    """STREAMING corpus build — :func:`build_corpus`'s per-doc subset
    as a continuous pipeline: the stateless stages
    (:func:`annotate_docs` + the min_tokens / min_quality / model /
    lang / ``blocklist`` gates + the deterministic ``split`` label)
    run INSIDE the streaming plan as pure projections and filters;
    ``benchmark`` decontamination (all three ``decontaminate_mode``
    arms — stateless broadcast probes against the fixed benchmark,
    shared with build_corpus via :func:`decontaminate_docs`), the
    ``min_logprob`` fluency gate (requires ``ppl_reference``; the t27
    reference LM is trained ONCE at wiring time and persisted — a
    static model makes the per-batch score batching-independent),
    ``url_dedup`` (t18's streaming twin: first-seen-wins on the
    canonical URL against a persistent
    :class:`streaming.dedup_stream.IncrementalKeyDeduper` pointer
    entity in the content deduper's store — ascending-id feeds make it
    ≡ build_corpus's min-id keeper), and
    content dedup run in foreachBatch, the dedup against the
    :class:`streaming.dedup_stream.IncrementalDeduper`'s
    persistent state. ``sink(kept_df, batch_id)``
    receives each micro-batch's KEPT documents with all annotation
    columns — the rows a corpus writer appends.

    ``span_deduper`` / ``line_deduper``
    (:class:`streaming.dedup_stream.IncrementalSpanDeduper` /
    ``IncrementalLineDeduper``) accumulate the d15/d22 boilerplate
    EVIDENCE over each batch's kept docs — evidence is monotone and
    retroactive (a passage's second copy flags the first doc's span
    too), so the TEXT CUT is deferred to the fold:
    :func:`compact_corpus_stream_output` applies the cumulative
    ``current_spans()`` there, yielding exactly ``build_corpus``'s
    span/line-rewritten corpus (parity-pinned). Caveats, stated
    honestly: under ``fuzzy_keep='best_quality'`` a retroactively
    UNKEPT doc's grams stay in the evidence (conservative — may only
    cut more); with BOTH span and line dedup enabled, streaming line
    evidence sees pre-span-cut text where the batch build sees cut
    text, so enable one for exact combined parity.

    Stream ≡ batch: for the shared stage subset, feeding the same docs
    (ids ascending, so the deduper's first-seen exact keeper equals the
    batch min-id keeper) yields exactly ``build_corpus``'s kept set —
    pinned by the convergence test. The kept-set contract is the
    deduper's LATEST-decision-wins: with ``fuzzy_keep='best_quality'``
    a later batch may retroactively unkeep an earlier doc; sinks must
    fold by latest decision (see ``attach_dedup_stream``).

    Scale: the stateless half is scan-speed projection work with zero
    shuffles (the model score runs its ``hof`` twin); state costs are
    the deduper's (bucket-pruned lookups, batch-proportional)."""
    from southpaw_spark.operators.text import hash_split

    if min_model_score is not None and model_weights is None:
        raise ValueError(
            "min_model_score requires model_weights (the trained "
            "linear-classifier gate scores before it thresholds)"
        )
    if blocklist is not None:
        if url_col is None:
            raise ValueError(
                "blocklist requires url_col (the gate matches URL hosts)"
            )
        if isinstance(blocklist, DataFrame):
            raise ValueError(
                "corpus_stream takes blocklist as a Python list — the "
                "codegen predicate form runs inside the streaming plan "
                "(a DataFrame blocklist needs the batch anti-join; use "
                "build_corpus, or collect the bounded list yourself)"
            )
    if decontaminate_mode not in ("drop", "cut", "fuzzy"):
        raise ValueError(
            "decontaminate_mode must be 'drop', 'cut' or 'fuzzy'; got "
            f"{decontaminate_mode!r}"
        )
    if min_logprob is not None and ppl_reference is None:
        raise ValueError(
            "min_logprob requires ppl_reference: only a FIXED "
            "reference-trained LM is batching-independent — a "
            "self-trained LM would move with every micro-batch"
        )
    ppl_model = None
    if min_logprob is not None:
        # t27 streaming fluency gate: train the reference LM ONCE at
        # wiring time and persist the count frames — the model is
        # static, so the per-batch score is a stateless per-doc
        # decision (streaming-legal exactly like the t24 blocklist)
        # and the stream ≡ batch contract extends to it for free
        from southpaw_spark.operators.text import bigram_reference_model

        ppl_model = bigram_reference_model(ppl_reference, text_col)
        ppl_model.persist()
    url_deduper = None
    if url_dedup:
        # t18 streaming twin: first-seen-wins on the canonical URL
        # against a persistent (key, keeper) pointer entity sharing the
        # content deduper's state store — build_corpus's url_dedup
        # stage with the same ascending-id ≡ min-id keeper convention
        if url_col is None:
            raise ValueError(
                "url_dedup requires url_col (the identity is the "
                "canonical URL)"
            )
        from southpaw_spark.operators.text import canonical_url
        from southpaw_spark.streaming.dedup_stream import (
            IncrementalKeyDeduper,
        )

        url_deduper = IncrementalKeyDeduper(
            deduper.spark, deduper.store,
            key_expr=lambda df: canonical_url(F.col(url_col)),
            id_col=id_col,
        )
    cur = annotate_docs(
        docs_stream, text_col, id_col,
        line_clean=line_clean, bpe_merges=bpe_merges,
        model_weights=model_weights, model_bias=model_bias,
        lang_model=lang_model, lang_biases=lang_biases,
    )
    tok_col = "n_tokens_bpe" if bpe_merges is not None else "n_tokens"
    if min_tokens is not None:
        cur = cur.where(F.col(tok_col) >= min_tokens)
    if min_quality is not None:
        cur = cur.where(F.col("quality_score") >= min_quality)
    if gopher:
        # t30 streaming twin: the rules are one stateless codegen
        # predicate over the row's own text — streaming-legal like the
        # t24 list blocklist, and bit-identical to build_corpus's gate
        # (same rounded metric expressions)
        from southpaw_spark.operators.text import gopher_predicate

        cur = cur.where(
            gopher_predicate(text_col, **(gopher_thresholds or {}))
        )
    if gopher_rep:
        # t31 streaming twin: per-doc metrics are pure projections
        # (array HOF scans), so the whole gate composes into the
        # streaming plan — no join, no state
        from southpaw_spark.operators.text import gopher_repetition_filter

        cur = gopher_repetition_filter(
            cur, text_col, id_col, gopher_rep_thresholds
        )
    if min_model_score is not None:
        cur = cur.where(F.col("model_score") >= min_model_score)
    if langs is not None:
        cur = cur.where(F.col("lang_guess").isin(list(langs)))
    if blocklist is not None:
        # t24 gate — with a list blocklist this compiles to one codegen
        # arrays_overlap predicate, legal inside the streaming plan
        from southpaw_spark.operators.text import blocklist_filter

        cur = blocklist_filter(cur, url_col, id_col, list(blocklist))
    if split_fractions is not None:
        cur = hash_split(cur, id_col, split_fractions, salt=sample_salt)

    if bpe_merges is not None:
        from southpaw_spark.operators.bpe import with_bpe_token_count

        def _recount(df: DataFrame) -> DataFrame:
            return with_bpe_token_count(
                df.drop("n_tokens_bpe"), text_col, bpe_merges
            )

    else:
        _recount = None

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            if batch_df.limit(1).count() == 0:
                return
            work = batch_df
            if url_deduper is not None:
                # URL identity first — the cheapest drop (one pointer
                # lookup), exactly build_corpus's stage order
                url_dec = url_deduper.process_batch(work)
                url_keep = url_dec.where(
                    F.col("keeper_id") == F.col(id_col)
                ).select(id_col)
                work = work.join(url_keep, id_col, "left_semi")
            if ppl_model is not None:
                # the EXACT build_corpus ppl_gate stage code: left-join
                # the reference-LM score, keep >= threshold, pass docs
                # without transition evidence (< 2 words)
                from southpaw_spark.operators.text import (
                    score_with_bigram_reference,
                )

                gs = score_with_bigram_reference(
                    work, text_col, id_col, ppl_model
                ).select(F.col(id_col), F.col("avg_logprob").alias("__alp"))
                work = (
                    work.join(gs, id_col, "left")
                    .where(
                        F.col("__alp").isNull()
                        | (F.col("__alp") >= float(min_logprob))
                    )
                    .drop("__alp")
                )
            if benchmark is not None:
                # decontamination (d17/d21 modes) runs INSIDE
                # foreachBatch — batch context, so the EXACT
                # build_corpus stage code applies; all three modes are
                # stateless per-doc decisions against the fixed
                # benchmark, so the kept set is batching-independent
                # and the stream ≡ batch contract extends to them
                work, _ = decontaminate_docs(
                    work, benchmark,
                    mode=decontaminate_mode,
                    max_contamination_rate=max_contamination_rate,
                    n=contamination_n, text_col=text_col, id_col=id_col,
                    recount=_recount, collect_stats=False,
                )
            decisions = deduper.process_batch(work)
            if decisions_sink is not None:
                # the dedup DECISIONS (doc_id, keeper_id), including
                # retroactive keeper swaps under fuzzy_keep=
                # 'best_quality' — the hook downstream index
                # maintenance needs: a doc unkept here must stop
                # answering (e.g. remove_from_index; see the
                # corpus→IVF-index integration test)
                decisions_sink(decisions, batch_id)
            kept_ids = decisions.where(
                F.col("keeper_id") == F.col(id_col)
            ).select(id_col)
            kept = work.join(kept_ids, id_col, "left_semi")
            if span_deduper is not None or line_deduper is not None:
                kept = kept.cache()  # evidence pass + sink share it
            try:
                # d15/d22 evidence accumulation on the KEPT docs (the
                # batch build's span-stage input under min_id keeps);
                # the returned per-batch updates are discarded — the
                # cut applies cumulatively at compaction
                if span_deduper is not None:
                    span_deduper.process_batch(kept, batch_id=batch_id)
                if line_deduper is not None:
                    line_deduper.process_batch(kept, batch_id=batch_id)
                if sink is not None:
                    sink(kept, batch_id)
            finally:
                if span_deduper is not None or line_deduper is not None:
                    kept.unpersist()
        finally:
            batch_df.unpersist()

    writer = (
        cur.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_process)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
