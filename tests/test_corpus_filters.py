"""Gopher repetition filters: Spark column pipeline vs an exact Python
reference implementing the documented character-coverage convention."""

import re
from collections import Counter

import pytest

from golden_horse_spark.operators.corpus_filters import (
    DUP_NS,
    GOPHER_THRESHOLDS,
    TOP_NS,
    repetition_filter,
    repetition_stats,
)

DOCS = [
    ("d_empty", ""),
    ("d_blank", "   \n  \n\n "),
    ("d_one", "a single line of perfectly ordinary text"),
    ("d_dupline", "alpha beta\ngamma delta\nalpha beta\nepsilon"),
    ("d_duppara", "para one here\n\npara two there\n\npara one here"),
    ("d_toptwo", "spam ham spam ham spam ham spam ham spam ham"),
    (
        "d_dupfive",
        "the quick brown fox jumps over the lazy dog and then "
        "the quick brown fox jumps over the fence",
    ),
    ("d_short", "just four little tokens"),
    (
        # long enough that no single unique n-gram covers >16% of the
        # chars — the Gopher top-n-gram rules implicitly assume docs of
        # some length (short docs trip them trivially)
        "d_clean",
        "First line of prose with varied words and several clauses.\n"
        "Second line continues rather differently and adds detail.\n\n"
        "A new paragraph closes this document with fresh content, "
        "mentioning rivers, lanterns, and a quiet evening market.\n"
        "Another sentence follows to extend the body further still.",
    ),
    ("d_allrep", "same line\nsame line\nsame line\nsame line"),
]


def _ref_stats(text):
    out = {}

    def unit_stats(units, prefix):
        units = [u for u in units if u.strip()]
        c = Counter(units)
        n = len(units)
        ndup = sum(v for v in c.values() if v > 1)
        chars = sum(len(u) for u in units)
        dupchars = sum(len(u) * v for u, v in c.items() if v > 1)
        out[f"n_{prefix}s"] = n
        out[f"dup_{prefix}_frac"] = round(ndup / n, 6) if n else 0.0
        out[f"dup_{prefix}_char_frac"] = (
            round(dupchars / chars, 6) if chars else 0.0
        )

    unit_stats(text.split("\n"), "line")
    unit_stats(re.split(r"\n{2,}", text), "para")

    toks = re.split(r"\s+", text.strip()) if text.strip() else [""]
    tlen = len(text)
    for n in sorted(set(TOP_NS) | set(DUP_NS)):
        grams = (
            [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if len(toks) >= n
            else []
        )
        c = Counter(grams)
        top = max((v * len(g) for g, v in c.items()), default=0)
        dup = sum(v * len(g) for g, v in c.items() if v > 1)
        if n in TOP_NS:
            out[f"top_{n}gram_char_frac"] = round(top / tlen, 6) if tlen else 0.0
        if n in DUP_NS:
            out[f"dup_{n}gram_char_frac"] = round(dup / tlen, 6) if tlen else 0.0
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_repetition_stats_match_reference(spark, docs_df):
    rows = {r["doc_id"]: r.asDict() for r in repetition_stats(docs_df).collect()}
    assert set(rows) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        ref = _ref_stats(text)
        got = rows[doc_id]
        for k, v in ref.items():
            assert got[k] == pytest.approx(v, abs=2e-6), (doc_id, k, got[k], v)


def test_repetition_filter_flags(spark, docs_df):
    rows = {r["doc_id"]: r["keep"] for r in repetition_filter(docs_df).collect()}
    for doc_id, text in DOCS:
        ref = _ref_stats(text)
        expect = all(
            ref[k] <= lim for k, lim in GOPHER_THRESHOLDS.items()
        )
        assert rows[doc_id] == expect, (doc_id, ref)
    # sanity: both outcomes are actually exercised
    assert rows["d_clean"]
    assert not rows["d_allrep"] and not rows["d_toptwo"]


def test_repetition_filter_custom_thresholds(spark, docs_df):
    # only the duplicate-line rule, loosened: d_dupline (2/4 lines dup)
    # flips from drop to keep at 0.6
    rows = {
        r["doc_id"]: r["keep"]
        for r in repetition_filter(
            docs_df, thresholds={"dup_line_frac": 0.6}
        ).collect()
    }
    assert rows["d_dupline"] and not rows["d_allrep"]
