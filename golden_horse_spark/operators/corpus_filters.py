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
