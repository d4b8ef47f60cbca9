"""Gopher repetition filters: Spark column pipeline vs an exact Python
reference implementing the documented character-coverage convention."""

import re
from collections import Counter

import pytest

from golden_horse_spark.operators.corpus_filters import (
    DUP_NS,
    GOPHER_THRESHOLDS,
    TOP_NS,
    bigram_lm_scores,
    contamination_stats,
    decontaminate,
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


def _toks(text):
    return re.split(r"\s+", text.strip()) if text.strip() else [""]


def _grams(text, n):
    toks = _toks(text)
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


BENCH = [
    ("b1", "the quick brown fox jumps over the lazy dog"),
    ("b2", "completely unrelated benchmark sentence about metallurgy"),
]
CONTAM_DOCS = [
    # verbatim benchmark copy → fully contaminated at n=4
    ("c_copy", "the quick brown fox jumps over the lazy dog"),
    # shares a 4-gram window with b1 mid-sentence
    ("c_part", "yesterday the quick brown fox jumps over a wall somewhere"),
    ("c_clean", "entirely fresh prose with no overlap in any window here"),
    ("c_short", "too few"),
    ("c_empty", ""),
]


def test_contamination_stats_match_reference(spark):
    docs = spark.createDataFrame(CONTAM_DOCS, "doc_id string, text string")
    bench = spark.createDataFrame(BENCH, "doc_id string, text string")
    n = 4
    bench_set = set().union(*(_grams(t, n) for _, t in BENCH))
    rows = {
        r["doc_id"]: r.asDict()
        for r in contamination_stats(docs, bench, n=n).collect()
    }
    assert set(rows) == {d for d, _ in CONTAM_DOCS}
    for doc_id, text in CONTAM_DOCS:
        g = _grams(text, n)
        hit = len(g & bench_set)
        got = rows[doc_id]
        assert got["n_grams"] == len(g), doc_id
        assert got["n_contam"] == hit, doc_id
        expect = round(hit / len(g), 6) if g else 0.0
        assert got["contam_frac"] == pytest.approx(expect, abs=2e-6), doc_id
    assert rows["c_copy"]["contam_frac"] == 1.0
    assert 0 < rows["c_part"]["contam_frac"] < 1
    assert rows["c_clean"]["n_contam"] == 0
    # shorter than n ⇒ zero grams, conservatively clean
    assert rows["c_short"]["n_grams"] == 0
    assert rows["c_empty"]["contam_frac"] == 0.0


def test_decontaminate_flags(spark):
    docs = spark.createDataFrame(CONTAM_DOCS, "doc_id string, text string")
    bench = spark.createDataFrame(BENCH, "doc_id string, text string")
    strict = {
        r["doc_id"]: r["clean"] for r in decontaminate(docs, bench, n=4).collect()
    }
    assert not strict["c_copy"] and not strict["c_part"]
    assert strict["c_clean"] and strict["c_short"] and strict["c_empty"]
    loose = {
        r["doc_id"]: r["clean"]
        for r in decontaminate(docs, bench, n=4, max_contam_frac=0.5).collect()
    }
    assert not loose["c_copy"] and loose["c_part"]


LM_DOCS = [
    ("l1", "a b a b a c"),
    ("l2", "a b c d"),
    ("l3", "d d d"),
    ("l_one", "solo"),
    ("l_empty", "  "),
]


def test_bigram_lm_scores_match_reference(spark):
    docs = spark.createDataFrame(LM_DOCS, "doc_id string, text string")
    alpha = 0.5
    c12, c1 = Counter(), Counter()
    vocab = set()
    for _, t in LM_DOCS:
        toks = _toks(t)
        vocab.update(toks)
        for w1, w2 in zip(toks, toks[1:]):
            c12[f"{w1} {w2}"] += 1
            c1[w1] += 1
    v = len(vocab)
    import math

    rows = {
        r["doc_id"]: r.asDict() for r in bigram_lm_scores(docs, alpha=alpha).collect()
    }
    for doc_id, t in LM_DOCS:
        toks = _toks(t)
        lps = [
            math.log(
                (c12[f"{w1} {w2}"] + alpha) / (c1[w1] + alpha * v)
            )
            for w1, w2 in zip(toks, toks[1:])
        ]
        got = rows[doc_id]
        assert got["n_bigrams"] == len(lps), doc_id
        if lps:
            avg = sum(lps) / len(lps)
            assert got["avg_logprob"] == pytest.approx(round(avg, 6), abs=2e-6)
            assert got["ppl"] == pytest.approx(round(math.exp(-avg), 6), abs=2e-6)
        else:
            assert got["avg_logprob"] == 0.0 and got["ppl"] == 1.0
    # repetitive high-probability doc scores higher than the novel one
    assert rows["l1"]["avg_logprob"] > rows["l2"]["avg_logprob"]


def test_bigram_lm_separate_train_corpus(spark):
    docs = spark.createDataFrame(
        [("q", "a b c")], "doc_id string, text string"
    )
    lm = spark.createDataFrame(
        [("t1", "a b a b"), ("t2", "c a b")], "doc_id string, text string"
    )
    import math

    # train stats: c12: {a b:3, b a:1, c a:1}; c1: {a:3, b:1, c:1}; V=3
    out = bigram_lm_scores(docs, lm_docs=lm, alpha=0.5).collect()[0]
    exp = (
        math.log((3 + 0.5) / (3 + 1.5)) + math.log((0 + 0.5) / (1 + 1.5))
    ) / 2
    assert out["avg_logprob"] == pytest.approx(round(exp, 6), abs=2e-6)


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


# ---------- C4 line-level cleaning ----------


def _c4_py(text, min_words=3, min_sent=5):
    import re

    kept = []
    for ln in text.split("\n"):
        t = ln.strip()
        if not re.search(r'[.!?"]$', t):
            continue
        if len(re.split(r"\s+", t)) < min_words:
            continue
        # re.ASCII: Java rlike and DuckDB RE2 word boundaries are
        # ASCII-\w-based; python's default \b is Unicode-aware and
        # would diverge on CJK-adjacent occurrences
        if re.search(r"\bjavascript\b", ln.lower(), re.ASCII):
            continue
        kept.append(ln)
    clean = "\n".join(kept)
    sents = [s for s in re.split(r"[.!?]", clean) if re.search(r"\w", s)]
    keep = (
        len(sents) >= min_sent
        and "lorem ipsum" not in text.lower()
        and "{" not in text
    )
    return clean, len(text.split("\n")), len(kept), len(sents), keep


def test_c4_clean_matches_reference(spark):
    from golden_horse_spark.operators.corpus_filters import c4_clean

    fixtures = [
        "Good solid first sentence here.\nok.\nno punct line\n"
        "Line two is fine too!\nWhy not a question line?\n"
        "javascript should vanish here.\nFourth proper sentence now.\n"
        "Fifth and final sentence done.",
        "Lorem Ipsum dolor sit amet consectetur.\nMore text follows here.",
        "Code page with brace {\nA perfectly fine sentence though.",
        "One good sentence only here.",
        'Quoted line ends properly."\nSecond quoted thought lands well.\n'
        "Third idea arrives intact.\nFourth notion completes nicely.\n"
        "Fifth statement wraps it up.",
        "",
    ]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(fixtures)],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (
            r["clean_text"], r["n_lines"], r["n_lines_kept"],
            r["n_sentences"], r["keep"],
        )
        for r in c4_clean(docs).collect()
    }
    for i, t in enumerate(fixtures):
        assert got[str(i)] == _c4_py(t), (i, got[str(i)], _c4_py(t))
    # the fixture set exercises both verdicts
    assert {v[4] for v in got.values()} == {True, False}


def test_c4_clean_thresholds(spark):
    from golden_horse_spark.operators.corpus_filters import c4_clean

    text = "Alpha beta gamma done.\nDelta epsilon zeta good."
    docs = spark.createDataFrame([("x", text)], "doc_id string, text string")
    strict = c4_clean(docs, min_sentences=3).collect()[0]
    loose = c4_clean(docs, min_sentences=2).collect()[0]
    assert not strict["keep"] and loose["keep"]
    few = c4_clean(docs, min_words_per_line=5).collect()[0]
    assert few["n_lines_kept"] == 0


def test_c4_clean_word_boundary_blocklist(spark):
    # C4's line rule removes lines containing the WORD "javascript";
    # "javascripted"/"nojavascript" must survive (ADVICE r4 fix)
    from golden_horse_spark.operators.corpus_filters import c4_clean

    text = (
        "This page uses javascript everywhere sadly.\n"
        "A javascripted page survives the word rule fine.\n"
        "Enable JavaScript to continue reading now.\n"
        "The nojavascript fallback also survives correctly here."
    )
    docs = spark.createDataFrame([("x", text)], "doc_id string, text string")
    row = c4_clean(docs).collect()[0]
    kept = row["clean_text"].split("\n")
    assert row["n_lines_kept"] == 2
    assert any("javascripted" in ln for ln in kept)
    assert any("nojavascript" in ln for ln in kept)
    assert not any(
        "uses javascript" in ln or "Enable JavaScript" in ln for ln in kept
    )


def test_ccnet_buckets(spark):
    import pytest as _pt

    from golden_horse_spark.operators.corpus_filters import ccnet_buckets

    rows = [
        ("en", i, -1.0 * i) for i in range(9)  # doc 0 most fluent
    ] + [("de", 100 + i, -2.0 * i) for i in range(3)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, avg_logprob double")
    got = {
        r["doc_id"]: r["lm_bucket"]
        for r in ccnet_buckets(df, group_cols=["lang"]).collect()
    }
    # en: 9 docs, pr = i/8 -> head i in {0,1,2} (pr<1/3), middle {3,4,5}, tail {6,7,8}
    for i in range(9):
        pr = i / 8
        want = "head" if pr < 1 / 3 else ("middle" if pr < 2 / 3 else "tail")
        assert got[i] == want, (i, got[i], want)
    # de: 3 docs, pr = 0, .5, 1
    assert got[100] == "head" and got[101] == "middle" and got[102] == "tail"
    with _pt.raises(ValueError, match="edges"):
        ccnet_buckets(df, edges=(0.5, 0.4))


def test_c4_blocklist_boundary_edge_tokens(spark):
    """Round-5 review fix: word-boundary anchors are applied only on the
    sides of a blocklist token that start/end with an ASCII word
    character — a token like ``{`` has no word edge, so it matches as a
    substring (the previous unconditional ``\\b{\\b`` matched NOTHING
    and silently kept the line); and boundary semantics are ASCII on
    every engine (Java rlike == DuckDB RE2 == the ``re.ASCII`` python
    reference), so a CJK-adjacent occurrence like ``中文javascript代码``
    IS word-bounded (CJK chars are non-word in ASCII semantics)."""
    from golden_horse_spark.operators.corpus_filters import c4_clean

    txt = (
        "A line with code token { here fine.\n"
        "A perfectly clean line stays here.\n"
    )
    df = spark.createDataFrame([("d", txt)], "doc_id string, text string")
    out = c4_clean(df, line_blocklist=("{",)).collect()[0]
    kept = out["clean_text"].split("\n")
    assert not any("{" in ln for ln in kept)
    assert any("perfectly clean" in ln for ln in kept)

    txt2 = (
        "中文javascript代码 removal happens correctly here.\n"
        "Clean sentence number two stays.\n"
    )
    out2 = c4_clean(
        spark.createDataFrame([("d", txt2)], "doc_id string, text string")
    ).collect()[0]
    kept2 = out2["clean_text"].split("\n")
    assert not any("javascript" in ln for ln in kept2)
    assert any("number two" in ln for ln in kept2)
