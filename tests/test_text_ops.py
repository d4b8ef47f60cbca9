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


def test_pii_counts_and_redaction(spark):
    from golden_horse_spark.operators.text_analysis import pii_stats

    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@sub.example.co.uk and alice@ex.org now"),
            (1, "call +86 10-6428-8888 or +1 650 555 0100 today"),
            (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
            (3, "mixed joe@a.io from 8.8.8.8 dial +442071234567 ok"),
            (4, "no pii here at all, just words and 42 numbers"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_ipv4"]) == (2, 0, 0)
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (0, 2, 0)
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 0, 2)
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (1, 1, 1)
    assert out[4]["n_pii"] == 0 and out[5]["n_pii"] == 0


def test_pii_redaction_idempotent_and_clean(spark):
    """redact(redact(x)) == redact(x), and redacted text carries no
    residual matches — the curation-pipeline shipping check."""
    from pyspark.sql import functions as F

    from golden_horse_spark.operators.text_analysis import (
        pii_counts,
        redact_pii,
    )

    docs = spark.createDataFrame(
        [
            (0, "joe@a.io from 8.8.8.8 dial +442071234567 ok"),
            (1, "edge a@b.cd 1.2.3.4 +12 34-56 78"),
            (2, "email-in-url http://x.y/a@b.ce?q=1 ip 255.255.255.255"),
        ],
        "doc_id long, text string",
    )
    once = docs.select("doc_id", redact_pii(F.col("text")).alias("r1"))
    twice = once.withColumn("r2", redact_pii(F.col("r1")))
    residual = {
        k: F.sum(c).alias(k)
        for k, c in pii_counts(F.col("r1")).items()
    }
    agg = twice.agg(
        F.sum((F.col("r1") != F.col("r2")).cast("int")).alias("changed"),
        *residual.values(),
    ).collect()[0]
    assert agg["changed"] == 0
    assert agg["email"] == 0 and agg["phone"] == 0 and agg["ipv4"] == 0
    r1 = {r["doc_id"]: r["r1"] for r in once.collect()}
    assert r1[0] == "<EMAIL> from <IP> dial <PHONE> ok"
