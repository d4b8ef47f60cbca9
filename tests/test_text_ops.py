"""TF-IDF operator semantics (operators/text_analysis.py)."""

import math

from golden_horse_spark.operators.text_analysis import tfidf_top_terms


def test_tfidf_values_and_df_caps(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "apple cherry"),
            (2, "banana cherry cherry unique"),
            (3, "noise"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, top_k=2, min_df=2, max_df_frac=0.6)
    rows = {(r["doc_id"], r["term"]): (r["tfidf"], r["rank"]) for r in out.collect()}
    # 'unique' and 'noise' are hapaxes (df<2) — excluded everywhere;
    # apple/banana/cherry each have df=2 of N=4 docs -> idf = ln(2)
    idf = math.log(4 / 2)
    assert rows[(0, "apple")] == (round(2 * idf, 4), 1)
    assert rows[(0, "banana")] == (round(1 * idf, 4), 2)
    assert rows[(1, "apple")][1] == 1 and rows[(1, "cherry")][1] == 2
    assert (2, "unique") not in rows and (3, "noise") not in rows
    # doc 2: cherry tf=2 ranks above banana tf=1
    assert rows[(2, "cherry")][1] == 1 and rows[(2, "banana")][1] == 2


def test_tfidf_tie_break_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "zz aa"), (1, "zz aa"), (2, "other words")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, top_k=1, min_df=2, max_df_frac=1.0)
    # aa and zz tie on tfidf in docs 0/1 -> term order breaks the tie
    got = {r["doc_id"]: r["term"] for r in out.collect()}
    assert got[0] == "aa" and got[1] == "aa"


def test_rolling_fingerprint_vs_python_reference(spark):
    from golden_horse_spark.operators.text_analysis import (
        rolling_min_fingerprint,
    )

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "短文 with 中文 characters mixed in — §±© and more padding"),
        (2, "exactly sixteen!!"),    # one window + 1
        (3, "short"),                # excluded (< 16 chars)
        (4, "a" * 16),               # constant text, one distinct hash
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r["rfp"] for r in rolling_min_fingerprint(docs).collect()}

    def ref(t, k=16, base=257, mod=2_147_483_647):
        hs = []
        for i in range(len(t) - k + 1):
            h = 0
            for c in t[i : i + k]:
                h = (h * base + ord(c)) % mod
            hs.append(h)
        return min(hs)

    assert 3 not in got
    for did, t in texts:
        if len(t) >= 16:
            assert got[did] == ref(t), (did, got[did], ref(t))
