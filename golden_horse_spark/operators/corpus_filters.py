"""Gopher-style repetition filters for training-corpus curation.

Implements the repetition-removal signals from the Gopher data pipeline
(Rae et al. 2021, "Scaling Language Models: Methods, Analysis & Insights
from Training Gopher", Table A1 — a public recipe, also reproduced in
C4/RefinedWeb/Dolma curation stacks):

* duplicate-line / duplicate-paragraph fraction (count- and
  character-weighted),
* fraction of characters in the most frequent word {2,3,4}-gram,
* fraction of characters in duplicated word {5..10}-grams.

Everything is DataFrame-native — explode → map-side-combined groupBy →
join-back — with zero Python UDFs, so the whole computation stays in
whole-stage codegen and scales with ordinary hash shuffles:

* ALL requested n-gram sizes ride ONE exploded union and ONE
  ``groupBy(doc_id, n, gram)`` shuffle (tagging each gram with its size
  costs nothing; a per-n pass would shuffle the corpus ~9×);
* line and paragraph stats share the same shape (explode → two-level
  agg), one shuffle each;
* the per-doc aggregate tables that come back from the shuffles are one
  row per (doc, family) — joining them back to ``documents`` is a
  co-keyed join on ``doc_id`` that AQE turns into a broadcast when the
  doc count is small.

Character-coverage convention (documented because Gopher's appendix
leaves overlap handling unspecified and public reproductions differ):
coverage of a gram g with per-doc count c is ``c * length(g)`` including
the intra-gram single spaces, divided by ``length(text)``. Duplicated
n-gram coverage sums that over grams with c > 1 WITHOUT overlap
correction (the NeMo-Curator / DataTrove convention); fractions can
therefore exceed 1.0 on degenerate repetitive text — callers compare
against thresholds, where that is harmless. The pytest reference
implementation (tests/test_corpus_filters.py) pins this convention
exactly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher Table A1 thresholds: doc is dropped when the signal EXCEEDS the
# threshold.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
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

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def _word_ngrams(toks: Column, n: int) -> Column:
    """All word n-grams of ``toks`` joined by single spaces; empty array
    when the doc has fewer than n tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _unit_stats(
    docs: DataFrame, unit: Column, doc_id: str, prefix: str
) -> DataFrame:
    """Duplicate-unit stats for one segmentation (lines or paragraphs):
    explode → per-(doc, unit) counts → per-doc roll-up. Blank units are
    dropped (split() on consecutive separators yields empties)."""
    # blank = whitespace-only; NB F.trim strips only ' ', so a unit like
    # "  \n " needs the regex check to count as blank (mirrors .strip())
    exploded = docs.select(
        F.col(doc_id), F.explode(unit).alias("u")
    ).where(F.length(F.regexp_replace(F.col("u"), r"\s", "")) > 0)
    per_unit = exploded.groupBy(doc_id, "u").agg(
        F.count("*").alias("c"), F.first(F.length("u")).alias("len")
    )
    dup = F.when(F.col("c") > 1, 1).otherwise(0)
    return per_unit.groupBy(doc_id).agg(
        F.sum("c").alias(f"_{prefix}_n"),
        F.sum(dup * F.col("c")).alias(f"_{prefix}_ndup"),
        F.sum(F.col("c") * F.col("len")).alias(f"_{prefix}_chars"),
        F.sum(dup * F.col("c") * F.col("len")).alias(f"_{prefix}_dupchars"),
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    doc_id: str = "doc_id",
    top_ns: tuple = TOP_NS,
    dup_ns: tuple = DUP_NS,
) -> DataFrame:
    """Per-document repetition signals (see module docstring).

    Output: one row per input doc with ``n_lines, n_paras`` and the
    fraction columns named as in ``GOPHER_THRESHOLDS``. Docs with no
    content (no non-blank lines / fewer tokens than n) get 0.0 for the
    affected fractions, never NULL, so filters compose without
    null-handling at every call site.
    """
    t = F.col(text_col)
    base = docs.select(doc_id, text_col).withColumn("_len", F.length(t))

    lines = _unit_stats(base, F.split(t, r"\n"), doc_id, "line")
    paras = _unit_stats(base, F.split(t, r"\n{2,}"), doc_id, "para")

    # one exploded union carries every n-gram size: rows (doc_id, n, gram).
    # NB the size tag must come from a closure FACTORY — `lambda g, n=n`
    # would have arity 2 and PySpark would bind the array INDEX to n.
    def _tagger(n: int):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    # regex-trim, not F.trim: trim() strips only ' ', and split keeps
    # trailing empties, so an all-whitespace doc would yield phantom ""
    # tokens (and "" 2-grams) without this. The split MUST be bound as a
    # real column before entering the transform lambdas: Catalyst does
    # no CSE inside/across lambdas, so referencing the split expression
    # there re-tokenizes the doc once per array index (measured 7×
    # slower at sf0.1).
    toks = F.col("_toks")
    sizes = sorted(set(top_ns) | set(dup_ns))
    gram_rows = base.withColumn(
        "_toks", F.split(F.regexp_replace(t, r"^\s+|\s+$", ""), r"\s+")
    ).select(
        F.col(doc_id),
        F.explode(
            F.flatten(
                F.array(
                    *[
                        F.transform(_word_ngrams(toks, n), _tagger(n))
                        for n in sizes
                    ]
                )
            )
        ).alias("ng"),
    ).select(doc_id, F.col("ng.n").alias("n"), F.col("ng.gram").alias("gram"))

    per_gram = gram_rows.groupBy(doc_id, "n", "gram").agg(
        F.count("*").alias("c"), F.first(F.length("gram")).alias("len")
    )
    per_doc_n = per_gram.groupBy(doc_id, "n").agg(
        F.max(F.col("c") * F.col("len")).alias("top_cover"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.col("len")).otherwise(0)
        ).alias("dup_cover"),
    )
    # pivot the tiny per-(doc, n) table into per-doc columns — n is a
    # closed enum, so this is a fixed-width conditional agg, one shuffle
    grams = per_doc_n.groupBy(doc_id).agg(
        *[
            F.sum(F.when(F.col("n") == n, F.col("top_cover")).otherwise(0)).alias(
                f"_top{n}"
            )
            for n in top_ns
        ],
        *[
            F.sum(F.when(F.col("n") == n, F.col("dup_cover")).otherwise(0)).alias(
                f"_dup{n}"
            )
            for n in dup_ns
        ],
    )

    out = (
        base.join(lines, doc_id, "left")
        .join(paras, doc_id, "left")
        .join(grams, doc_id, "left")
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(
                den.isNull() | (den == 0) | num.isNull(), 0.0
            ).otherwise(num.cast("double") / den),
            6,
        )

    sel = [
        F.col(doc_id),
        F.coalesce(F.col("_line_n"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("_para_n"), F.lit(0)).alias("n_paras"),
        frac(F.col("_line_ndup"), F.col("_line_n")).alias("dup_line_frac"),
        frac(F.col("_line_dupchars"), F.col("_line_chars")).alias(
            "dup_line_char_frac"
        ),
        frac(F.col("_para_ndup"), F.col("_para_n")).alias("dup_para_frac"),
        frac(F.col("_para_dupchars"), F.col("_para_chars")).alias(
            "dup_para_char_frac"
        ),
    ]
    sel += [
        frac(F.col(f"_top{n}"), F.col("_len")).alias(f"top_{n}gram_char_frac")
        for n in top_ns
    ]
    sel += [
        frac(F.col(f"_dup{n}"), F.col("_len")).alias(f"dup_{n}gram_char_frac")
        for n in dup_ns
    ]
    return out.select(*sel)


def _tokens(text_col: Column) -> Column:
    """Whitespace tokens of regex-trimmed text — the shared tokenization
    convention of every operator in this module (F.trim strips only
    ' ', hence the regex trim; an empty/whitespace-only doc yields the
    single token ``""``, mirrored by the DuckDB oracles)."""
    return F.split(F.regexp_replace(text_col, r"^\s+|\s+$", ""), r"\s+")


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    doc_id: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination signals (the GPT-3 Appendix-C /
    Dolma / FineWeb convention, all public): a document n-gram is
    *contaminated* when it also occurs in any evaluation-benchmark
    text; the per-document signal is the fraction of the doc's DISTINCT
    word n-grams that are contaminated.

    Output: one row per input doc —
    ``(doc_id, n_grams, n_contam, contam_frac)`` with ``n_grams`` =
    distinct n-gram count (0 for docs shorter than n tokens, whose
    ``contam_frac`` is 0.0 — nothing to match ⇒ conservatively clean).

    Spark shape, sized for a 100 TB corpus vs a benchmark of at most
    ~millions of grams: per-doc dedup happens INSIDE the array
    (``array_distinct`` before explode — no (doc, gram) distinct
    shuffle); the benchmark gram set is globally distinct and
    **broadcast**, so the corpus side never shuffles for the join; the
    only corpus shuffle is the final map-side-combinable
    ``groupBy(doc_id)``. If the benchmark ever outgrows broadcast
    range, drop the ``F.broadcast`` hint and the same plan degrades to
    a sort-merge join — the semantics don't change.
    """
    bench_grams = (
        benchmark.select(
            F.explode(
                F.array_distinct(_word_ngrams(_tokens(F.col(bench_text_col)), n))
            ).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = docs.select(
        F.col(doc_id),
        F.explode(
            F.array_distinct(_word_ngrams(_tokens(F.col(text_col)), n))
        ).alias("gram"),
    )
    per_doc = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(doc_id)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contam"),
        )
    )
    return docs.select(doc_id).join(per_doc, doc_id, "left").select(
        F.col(doc_id),
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        F.coalesce(F.col("n_contam"), F.lit(0)).alias("n_contam"),
        F.round(
            F.when(F.coalesce(F.col("n_grams"), F.lit(0)) == 0, 0.0).otherwise(
                F.col("n_contam").cast("double") / F.col("n_grams")
            ),
            6,
        ).alias("contam_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_contam_frac: float = 0.0,
    text_col: str = "text",
    doc_id: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """``docs`` + contamination signals + a ``clean`` flag (True iff
    ``contam_frac <= max_contam_frac``; the default 0.0 is GPT-3's
    remove-any-overlap rule, FineWeb-style tolerances pass e.g. 0.1)."""
    stats = contamination_stats(
        docs, benchmark, n, text_col, doc_id, bench_text_col
    )
    return docs.join(stats, doc_id, "left").withColumn(
        "clean", F.col("contam_frac") <= F.lit(float(max_contam_frac))
    )


def bigram_lm_scores(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    alpha: float = 0.5,
    text_col: str = "text",
    doc_id: str = "doc_id",
    lm_text_col: str | None = None,
) -> DataFrame:
    """CCNet-style LM fluency scoring (Wenzek et al. 2020 score with a
    KenLM model; here the n-gram LM is order-2 and trained in-engine,
    so the whole thing stays DataFrame-native): per-document mean
    bigram log-probability under an add-α-smoothed bigram model fit on
    ``lm_docs`` (default: ``docs`` itself — in-corpus "typicality",
    the same signal CCNet buckets into head/middle/tail).

    P(w2|w1) = (c(w1 w2) + α) / (c(w1·) + α·V), V = |train vocab|;
    an unseen context scores ln(1/V). ``alpha`` defaults to 0.5 — an
    exactly binary-representable constant, so the DuckDB oracle
    reproduces the arithmetic bit-for-bit before rounding.

    Output: ``(doc_id, n_bigrams, avg_logprob, ppl)``; docs with fewer
    than 2 tokens get ``n_bigrams = 0, avg_logprob = 0.0, ppl = 1.0``
    (sentinel, never NULL).

    Spark shape: the two count tables are plain map-side-combined
    aggregations of the training corpus; scoring joins doc bigrams to
    them on the bigram/context string keys — co-partitioned equi-joins
    that AQE turns into broadcasts when the vocabulary is small. The
    scalar V is the only driver-side action. No Python UDFs anywhere.
    """
    lm_docs = docs if lm_docs is None else lm_docs
    lm_text = text_col if lm_text_col is None else lm_text_col

    def bigram_rows(df: DataFrame, tcol: str, keep_id: bool):
        toks = _tokens(F.col(tcol))
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.struct(
                    F.element_at(toks, i + 1).alias("w1"),
                    F.concat_ws(
                        " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                    ).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,b:string>>"))
        cols = [F.col(doc_id)] if keep_id else []
        return df.select(*cols, F.explode(pairs).alias("p")).select(
            *([doc_id] if keep_id else []),
            F.col("p.w1").alias("w1"),
            F.col("p.b").alias("b"),
        )

    train = bigram_rows(lm_docs, lm_text, keep_id=False)
    c12 = train.groupBy("b").agg(F.count("*").alias("c12"))
    c1 = train.groupBy("w1").agg(F.count("*").alias("c1"))
    v = (
        lm_docs.select(F.explode(_tokens(F.col(lm_text))).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )

    a = float(alpha)
    scored = (
        bigram_rows(docs, text_col, keep_id=True)
        .join(c12, "b", "left")
        .join(c1, "w1", "left")
        .select(
            F.col(doc_id),
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(a))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(a * v))
            ).alias("lp"),
        )
        .groupBy(doc_id)
        .agg(F.count("*").alias("n_bigrams"), F.avg("lp").alias("_avg"))
    )
    return docs.select(doc_id).join(scored, doc_id, "left").select(
        F.col(doc_id),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.round(F.coalesce(F.col("_avg"), F.lit(0.0)), 6).alias("avg_logprob"),
        F.round(F.exp(-F.coalesce(F.col("_avg"), F.lit(0.0))), 6).alias("ppl"),
    )


def repetition_filter(
    docs: DataFrame,
    text_col: str = "text",
    doc_id: str = "doc_id",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """``docs`` + repetition signals + a ``keep`` flag: True iff every
    signal is at or below its Gopher Table-A1 threshold. Pass a custom
    ``thresholds`` dict (subset of GOPHER_THRESHOLDS keys) to tighten or
    drop individual rules."""
    th = dict(GOPHER_THRESHOLDS if thresholds is None else thresholds)
    stats = repetition_stats(docs, text_col, doc_id)
    keep = F.lit(True)
    for name, lim in th.items():
        keep = keep & (F.col(name) <= F.lit(float(lim)))
    return docs.join(stats, doc_id, "left").withColumn("keep", keep)


C4_POLICY_PHRASES = ("lorem ipsum", "{")


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    doc_id: str = "doc_id",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    line_blocklist: tuple = ("javascript",),
    page_blocklist: tuple = C4_POLICY_PHRASES,
) -> DataFrame:
    """C4's line-level cleaning pass (Raffel et al. JMLR 2020 §2.2 —
    the public recipe behind the C4 corpus, reproduced by RefinedWeb /
    Dolma / FineWeb): keep only lines that end in a terminal
    punctuation mark, have at least ``min_words_per_line`` words, and
    do not contain a line-blocklist token (C4 uses "javascript");
    then drop whole pages with fewer than ``min_sentences`` sentences
    after cleaning or containing a page-blocklist phrase (C4: "lorem
    ipsum", "{"). C4's fourth rule — 3-sentence-span dedup across the
    corpus — is the cross-doc job :func:`~golden_horse_spark.operators.
    dedup.duplicated_span_stats` already covers; this operator is the
    per-page half.

    Pure JVM expression tree (split → higher-order ``filter`` →
    ``array_join``): zero shuffles, zero Python — the whole pass
    pipelines inside whole-stage codegen over the documents scan, so
    at 100 TB it is I/O-bound map work.

    Output: input columns + ``clean_text`` (kept lines re-joined with
    newlines), ``n_lines`` / ``n_lines_kept``, ``n_sentences``
    (terminal-punctuation segments with ≥1 word character, the C4
    sentence proxy), and ``keep`` (the page-level verdict).

    Determinism contract: every rule is a regex/length predicate on
    the line itself — no RNG, no ordering dependence — so the result
    is a pure function of the text and the oracle twin replays it
    with the same list-lambda predicates.
    """
    lines = F.split(F.col(text_col), "\n")

    def _line_ok(x):
        t = F.trim(x)
        ok = t.rlike('[.!?"]$') & (
            F.size(F.split(t, r"\s+")) >= F.lit(min_words_per_line)
        )
        for tok in line_blocklist:
            # C4 §2.2 removes lines containing the WORD (not substring)
            # "javascript" — word-boundary match, so "javascripted"
            # survives the line rule (page-level phrase rules below
            # stay substring, as in the paper). Round-5 review fix,
            # twice over: (a) a boundary is anchored only on sides of
            # the token that START/END with a word character — an
            # unconditional \b around a token like "{" REQUIRES an
            # adjacent word char and silently matches nothing; (b) \b
            # itself is ENGINE-DEPENDENT (Java's is Unicode-aware, so
            # 中文javascript代码 was NOT word-bounded on the Spark side,
            # while DuckDB's RE2 \b is ASCII and matched — a latent
            # oracle divergence), so the boundary is spelled as an
            # explicit ASCII class `(^|[^0-9A-Za-z_])…([^0-9A-Za-z_]|$)`
            # that means the same thing in Java, RE2, and python
            # (re.ASCII \b) — CJK-adjacent occurrences ARE bounded.
            t = tok.lower()
            wcls = "0-9A-Za-z_"
            wset = "0123456789abcdefghijklmnopqrstuvwxyz_"
            pat = (
                (f"(^|[^{wcls}])" if t[:1] in set(wset) else "")
                + re.escape(t)
                + (f"([^{wcls}]|$)" if t[-1:] in set(wset) else "")
            )
            ok = ok & ~F.lower(x).rlike(pat)
        return ok

    kept = F.filter(lines, _line_ok)
    clean = F.array_join(kept, "\n")
    n_sent = F.size(
        F.filter(
            F.split(clean, r"[.!?]"),
            lambda s: F.trim(s).rlike(r"\w"),
        )
    )
    page_ok = n_sent >= F.lit(min_sentences)
    for ph in page_blocklist:
        page_ok = page_ok & ~F.lower(F.col(text_col)).contains(ph.lower())
    return (
        docs.withColumn("clean_text", clean)
        .withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn("n_sentences", n_sent)
        .withColumn("keep", page_ok)
    )


def ccnet_buckets(
    scores: DataFrame,
    score_col: str = "avg_logprob",
    group_cols=(),
    id_col: str = "doc_id",
    edges=(1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al.
    LREC 2020 §4.3): per group (typically language), rank documents by
    LM fluency — higher ``score_col`` (avg log-prob) = lower
    perplexity = more Wikipedia-like — and cut the ranking at
    ``edges`` into ``head``/``middle``/``tail``. CCNet keeps head+
    middle for most languages; the bucket is a ranking SIGNAL, not a
    hard filter, which is why this returns a column instead of
    dropping rows.

    Deterministic total order (score DESC, id ASC) so the
    ``percent_rank`` cut replays exactly cross-engine; one window =
    one exchange + per-group sort, the same class as
    ``quantile_keep``'s exact path (use that module's
    ``quantile_thresholds`` broadcast-cutoff form at 100 TB)."""
    from pyspark.sql import Window

    e1, e2 = float(edges[0]), float(edges[1])
    if not (0 < e1 < e2 < 1):
        raise ValueError("ccnet_buckets: need 0 < edges[0] < edges[1] < 1")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    pr = F.percent_rank().over(w)
    return scores.withColumn(
        "lm_bucket",
        F.when(pr < e1, F.lit("head"))
        .when(pr < e2, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
