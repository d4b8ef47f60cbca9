"""TF-IDF operator semantics (operators/text_analysis.py)."""

import math

import pytest
from pyspark.sql import functions as F

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


def test_bm25_vs_python_reference(spark):
    """bm25_topk == a literal python Okapi BM25 (Lucene idf), incl. the
    df caps, length normalization, and rounded-score/term tiebreak."""
    from collections import Counter

    from golden_horse_spark.operators.text_analysis import bm25_topk

    texts = {
        0: "apple banana apple apple banana cherry",
        1: "apple cherry",
        2: "banana cherry cherry unique words here too",
        3: "noise",
        4: "apple apple banana words",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    out = bm25_topk(docs, top_k=2, k1=1.2, b=0.75, min_df=2, max_df_frac=0.8)
    got = {
        (r["doc_id"], r["term"]): (r["score"], r["rank"]) for r in out.collect()
    }

    # python reference
    tf = {d: Counter(t.split()) for d, t in texts.items()}
    n = len(texts)
    df = Counter(term for c in tf.values() for term in c)
    keep = {t for t, v in df.items() if 2 <= v <= int(n * 0.8)}
    dls = {d: sum(c.values()) for d, c in tf.items()}
    tot, n_d = sum(dls.values()), len(dls)
    want = {}
    for d, c in tf.items():
        scored = []
        for term in c:
            if term not in keep:
                continue
            idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            norm = 0.25 + 0.75 * dls[d] * n_d / tot
            s = round(idf * (c[term] * 2.2) / (c[term] + 1.2 * norm), 4)
            scored.append((-s, term))
        for rank, (neg_s, term) in enumerate(sorted(scored)[:2], start=1):
            want[(d, term)] = (-neg_s, rank)
    assert got == want
    # length normalization: equal tf in a shorter doc scores higher
    docs2 = spark.createDataFrame(
        [(0, "apple apple pad"), (1, "apple apple pad pad pad pad pad")],
        "doc_id long, text string",
    )
    out2 = bm25_topk(docs2, top_k=2, min_df=2, max_df_frac=1.0)
    s2 = {
        r["doc_id"]: r["score"] for r in out2.collect() if r["term"] == "apple"
    }
    assert s2[0] > s2[1]


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


# ------------------------------------- mixture sampling + sequence packing


def test_mixture_keep_deterministic_and_rate(spark):
    from golden_horse_spark.operators.text_analysis import (
        hash_split,
        mixture_keep,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"document body number {i} with several words", f"src{i % 3}")
         for i in range(3000)],
        "doc_id long, text string, source string",
    )
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    keep = mixture_keep(F.col("text"), F.col("source"), rates)
    got = docs.groupBy("source").agg(
        F.avg(keep.cast("double")).alias("frac")
    ).collect()
    for r in got:
        # md5 bytes are uniform; 1000 draws per source -> ±5% absolute
        assert abs(r["frac"] - rates[r["source"]]) < 0.05, r
    # deterministic: two evaluations agree row-for-row
    a = docs.select("doc_id", keep.alias("k")).collect()
    b = docs.select("doc_id", keep.alias("k")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # independent salts: keep is not a function of the split label
    both = docs.select(
        hash_split(F.col("text")).alias("split"), keep.alias("k")
    ).groupBy("split").agg(F.avg(F.col("k").cast("double")).alias("f")).collect()
    fr = {r["split"]: r["f"] for r in both}
    assert max(fr.values()) - min(fr.values()) < 0.15


def test_pack_chunks_invariants_and_hand_case(spark):
    from golden_horse_spark.operators.text_analysis import pack_chunks
    from pyspark.sql import functions as F

    # hand case: single shard, known token counts 3,4,5,2 and budget 4.
    # concat stream offsets: [0,3) [3,7) [7,12) [12,14)
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f g"), (2, "h i j k l"), (3, "m n")],
        "doc_id long, text string",
    )
    out = pack_chunks(docs, budget=4, n_shards=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    expect = {0: (0, 0, False), 1: (0, 1, True), 2: (1, 2, True), 3: (3, 3, False)}
    for i, (cf, cl, cb) in expect.items():
        r = rows[i]
        assert (r["chunk_first"], r["chunk_last"], r["crosses_boundary"]) == (
            cf, cl, cb), i

    # invariants at scale: every kept token lands in exactly one chunk,
    # chunk ids are contiguous per (split, shard), and dropped docs get
    # NULL bounds but stay in the output
    docs2 = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(1 + i % 37)),
          i % 4 == 0)  # 25% dropped
         for i in range(500)],
        "doc_id long, text string, dropped boolean",
    ).withColumn("keep", ~F.col("dropped"))
    p = pack_chunks(docs2, budget=64, n_shards=4, keep_col="keep").collect()
    assert len(p) == 500
    by_shard = {}
    for r in p:
        if r["dropped"]:
            assert r["tok"] == 0 and r["chunk_first"] is None
            continue
        assert r["chunk_first"] is not None
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        total = sum(r["tok"] for r in rs)
        # reconstruct the concat stream: doc i occupies [cum-tok, cum)
        cum = 0
        for r in rs:
            start, end = cum, cum + r["tok"]
            assert r["chunk_first"] == start // 64
            assert r["chunk_last"] == (end - 1) // 64
            assert r["crosses_boundary"] == (r["chunk_last"] > r["chunk_first"])
            cum = end
        n_chunks = (total - 1) // 64 + 1
        assert max(r["chunk_last"] for r in rs) == n_chunks - 1


def test_quantile_keep_exact_and_threshold_path(spark):
    from golden_horse_spark.operators.text_analysis import (
        quantile_keep,
        quantile_thresholds,
    )
    from pyspark.sql import functions as F

    # two langs with known score ladders: en scores 0..99, zh 0..49
    rows = [(i, "en", float(i)) for i in range(100)]
    rows += [(1000 + i, "zh", float(i)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, score double")

    kept = (
        docs.withColumn("_k", quantile_keep(F.col("score"), 0.25))
        .where("_k").collect()
    )
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["score"])
    # percent_rank < 0.25 over DESC order keeps the strict top quarter
    assert by_lang["en"] == {float(s) for s in range(76, 100)} | {75.0}
    assert by_lang["zh"] == {float(s) for s in range(38, 50)} | {37.0}

    # scale path: approx threshold + broadcast join keeps a similar set
    thr = quantile_thresholds(docs, F.col("score"), 0.25)
    kept2 = (
        docs.join(F.broadcast(thr), "lang")
        .where(F.col("score") >= F.col("thr"))
        .groupBy("lang").count().collect()
    )
    counts = {r["lang"]: r["count"] for r in kept2}
    assert abs(counts["en"] - 25) <= 2 and abs(counts["zh"] - 13) <= 2

    # deterministic tie handling: constant scores fall back to doc_id
    ties = spark.createDataFrame(
        [(i, "en", 1.0) for i in range(8)], "doc_id long, lang string, score double"
    )
    k1 = sorted(r["doc_id"] for r in ties.withColumn(
        "_k", quantile_keep(F.col("score"), 0.5)).where("_k").collect())
    assert k1 == [0, 1, 2, 3]  # doc_id tiebreak -> lowest ids survive


def test_pmi_pairs_vs_python(spark):
    import math
    import random
    from collections import Counter

    from golden_horse_spark.operators.text_analysis import pmi_pairs

    rng = random.Random(91)
    events = [
        (f"w{rng.randint(0, 9)}", f"c{rng.randint(0, 6)}")
        for _ in range(400)
    ]
    df = spark.createDataFrame(events, "x string, y string")
    got = {
        (r["x"], r["y"]): (r["n_xy"], r["n_x"], r["n_y"], r["pmi"])
        for r in pmi_pairs(df, min_count=2).collect()
    }
    nxy = Counter(events)
    nx = Counter(e[0] for e in events)
    ny = Counter(e[1] for e in events)
    n = len(events)
    want = {
        k: (
            c,
            nx[k[0]],
            ny[k[1]],
            math.log(c * n / (nx[k[0]] * ny[k[1]])),
        )
        for k, c in nxy.items()
        if c >= 2
    }
    assert set(got) == set(want)
    for k, (c, a, b, p) in want.items():
        gc_, ga, gb, gp = got[k]
        assert (gc_, ga, gb) == (c, a, b), k
        assert abs(gp - p) < 1e-12, k
    # PPMI clamps negatives to zero and changes nothing else
    gpp = {
        (r["x"], r["y"]): r["pmi"]
        for r in pmi_pairs(df, min_count=2, positive=True).collect()
    }
    for k, (_, _, _, p) in want.items():
        assert abs(gpp[k] - max(0.0, p)) < 1e-12


def test_pmi_pairs_hand_case(spark):
    import math

    from golden_horse_spark.operators.text_analysis import pmi_pairs

    # "strong" always co-occurs with "tea" (but tea appears 3×):
    # pmi = ln(2·6/(2·3)) = ln 2
    events = [
        ("strong", "tea"),
        ("strong", "tea"),
        ("weak", "tea"),
        ("weak", "coffee"),
        ("hot", "coffee"),
        ("hot", "soup"),
    ]
    df = spark.createDataFrame(events, "x string, y string")
    got = {
        (r["x"], r["y"]): r["pmi"] for r in pmi_pairs(df).collect()
    }
    assert abs(got[("strong", "tea")] - math.log(2.0)) < 1e-12
    assert abs(got[("hot", "soup")] - math.log(3.0)) < 1e-12
    assert abs(got[("weak", "tea")] - math.log(1.0)) < 1e-12


def test_pmi_pairs_empty_input(spark):
    from golden_horse_spark.operators.text_analysis import pmi_pairs

    ev = spark.createDataFrame([], "x string, y string")
    out = pmi_pairs(ev)
    assert out.count() == 0
    assert out.columns == ["x", "y", "n_xy", "n_x", "n_y", "pmi"]


def test_dsir_weights_vs_python_reference(spark):
    """dsir_weights == a literal python DSIR (hashed unigram+bigram
    buckets via the md5 draw, add-α log-ratio), and docs that look like
    the target outrank docs that don't."""
    import hashlib
    from collections import Counter

    from golden_horse_spark.operators.text_analysis import dsir_weights

    raw = {
        0: "the cat sat on the mat",
        1: "stock market prices fell sharply today",
        2: "the dog sat on the rug",
        3: "",
        4: "quantum flux capacitor array",
    }
    tgt = {
        10: "the cat sat quietly",
        11: "a dog sat on the mat",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in raw.items()], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(i, t) for i, t in tgt.items()], "doc_id long, text string"
    )
    B, a = 64, 0.5
    out = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(docs, target, n_buckets=B, alpha=a).collect()
    }

    def buckets(text):
        w = [t for t in text.lower().strip().split() if t]
        grams = w + [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
            for g in grams
        ]

    c_r = Counter(b for t in raw.values() for b in buckets(t))
    c_t = Counter(b for t in tgt.values() for b in buckets(t))
    t_r, t_t = sum(c_r.values()), sum(c_t.values())
    lam = {
        b: math.log((c_t[b] + a) / (t_t + a * B))
        - math.log((c_r[b] + a) / (t_r + a * B))
        for b in set(c_r) | set(c_t)
    }
    want = {
        d: sum(lam[b] for b in buckets(t)) for d, t in raw.items()
    }
    assert set(out) == set(want)
    for d in want:
        assert abs(out[d] - want[d]) < 1e-9, d
    # the empty doc is neutral; target-like docs beat off-domain docs
    assert out[3] == 0.0
    assert out[0] > out[1] and out[2] > out[4]

    import pytest

    with pytest.raises(ValueError):
        dsir_weights(docs, target, n_buckets=0)


def test_temperature_rates(spark):
    import pytest as _pt
    from pyspark.sql import functions as F

    from golden_horse_spark.operators.text_analysis import (
        mixture_keep,
        temperature_rates,
    )

    rows = (
        [(f"big doc {i}", "big") for i in range(800)]
        + [(f"mid doc {i}", "mid") for i in range(160)]
        + [(f"small doc {i}", "small") for i in range(40)]
    )
    docs = spark.createDataFrame(rows, "text string, source string")
    # T=1: proportional sampling is a no-op — every domain keeps all
    r1 = temperature_rates(docs, temperature=1.0)
    assert r1 == {"big": 1.0, "mid": 1.0, "small": 1.0}
    # T>1: smallest domain keeps everything, larger keep less,
    # monotone in size; exact closed form n^(1/T-1)/min_n^(1/T-1)
    t = 2.0
    rt = temperature_rates(docs, temperature=t)
    assert rt["small"] == 1.0
    assert rt["small"] > rt["mid"] > rt["big"] > 0
    for d, n in (("big", 800), ("mid", 160), ("small", 40)):
        assert abs(rt[d] - (n ** -0.5) / (40 ** -0.5)) < 1e-12
    # surviving corpus distributes as q ∝ n^(1/T) (exact expectation)
    exp_kept = {d: n * rt[d] for d, n in (("big", 800), ("mid", 160), ("small", 40))}
    qs = {d: n ** (1 / t) for d, n in (("big", 800), ("mid", 160), ("small", 40))}
    for d in qs:
        assert abs(
            exp_kept[d] / sum(exp_kept.values()) - qs[d] / sum(qs.values())
        ) < 1e-12
    # composes with mixture_keep (256-bucket quantization tolerance)
    kept = (
        docs.where(mixture_keep(F.col("text"), F.col("source"), rt))
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r["source"]: r["count"] for r in kept}
    assert got["small"] == 40
    assert abs(got["big"] - 800 * rt["big"]) < 800 * 0.1
    with _pt.raises(ValueError, match="temperature"):
        temperature_rates(docs, temperature=0)


def test_stratified_sample_exact_and_deterministic(spark):
    import hashlib

    import pytest as _pt

    from golden_horse_spark.operators.text_analysis import stratified_sample

    rows = (
        [(i, "a") for i in range(50)]
        + [(100 + i, "b") for i in range(7)]
        + [(200 + i, "c") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = stratified_sample(df, "source", 5, salt="s1").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # exactly min(n, |stratum|) per stratum
    assert {k: len(v) for k, v in by_src.items()} == {"a": 5, "b": 5, "c": 3}
    # python replay of the md5 ranking
    def pick(ids, n, salt):
        ranked = sorted(
            ids,
            key=lambda i: (
                hashlib.md5(f"{salt}|{i}".encode()).hexdigest(), i
            ),
        )
        return set(ranked[:n])

    assert by_src["a"] == pick(range(50), 5, "s1")
    assert by_src["b"] == pick(range(100, 107), 5, "s1")
    # deterministic across invocations; different salt ⇒ different draw
    again = {
        (r["doc_id"], r["source"])
        for r in stratified_sample(df, "source", 5, salt="s1").collect()
    }
    assert again == {(r["doc_id"], r["source"]) for r in got}
    other = {
        r["doc_id"]
        for r in stratified_sample(df, "source", 5, salt="s2").collect()
        if r["source"] == "a"
    }
    assert other != by_src["a"]
    with _pt.raises(ValueError, match="n must"):
        stratified_sample(df, "source", 0)


def test_flesch_reading_ease_formula(spark):
    import re

    from pyspark.sql import functions as F

    from golden_horse_spark.operators.text_analysis import (
        flesch_reading_ease,
    )

    texts = [
        (0, "The cat sat. The cat ran away quickly!"),
        (1, ""),
        (2, "word word word"),  # no terminal punct -> 1 sentence
        (3, "Incomprehensibility notwithstanding, quantification persists."),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fre"]
        for r in docs.select(
            "doc_id", flesch_reading_ease(F.col("text")).alias("fre")
        ).collect()
    }

    def ref(t):
        words = [w for w in t.split() if w]
        if not words:
            return 0.0
        sents = [
            s for s in re.split(r"[.!?]", t) if re.search(r"\w", s)
        ] or [t]
        syl = len(re.findall(r"[aeiouy]+", t.lower()))
        return round(
            206.835
            - 1.015 * (len(words) / len(sents))
            - 84.6 * (syl / len(words)),
            4,
        )

    for i, t in texts:
        assert abs(got[i] - ref(t)) < 1e-9, (i, got[i], ref(t))
    # complex words score lower than simple ones
    assert got[3] < got[0]


def test_lexical_stats(spark):
    from golden_horse_spark.operators.text_analysis import lexical_stats

    docs = spark.createDataFrame(
        [
            (0, "a b a c b a"),   # 6 tokens, 3 types, 1 hapax (c)
            (1, ""),
            (2, "x y z"),         # all hapax
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_types"], r["n_hapax"], r["ttr"]
        )
        for r in lexical_stats(docs).collect()
    }
    assert got[0] == (6, 3, 1, 0.5)
    assert got[1] == (0, 0, 0, 0.0)
    assert got[2] == (3, 3, 3, 1.0)


def test_mixture_keep_null_domain_rate(spark):
    """temperature_rates emits a None key for NULL source rows — the
    two functions are documented to compose, so mixture_keep must
    accept it (round-5 review fix: sorted() raised TypeError on mixed
    None/str keys)."""
    from golden_horse_spark.operators.text_analysis import mixture_keep

    docs = spark.createDataFrame(
        [("a", "text one here", "web"), ("b", "text two here", None)],
        "doc_id string, text string, source string",
    )
    out = docs.withColumn(
        "keep",
        mixture_keep(F.col("text"), F.col("source"),
                     {None: 1.0, "web": 1.0}, default_rate=0.0),
    )
    assert all(r["keep"] for r in out.collect())


def test_quantile_keep_frac_one_keeps_everything(spark):
    """frac=1.0 disables curation — percent_rank's last row is exactly
    1.0 and the strict < dropped one doc per key (round-5 review
    fix)."""
    from golden_horse_spark.operators.text_analysis import quantile_keep

    docs = spark.createDataFrame(
        [(f"d{i}", "en", float(i)) for i in range(10)],
        "doc_id string, lang string, score double",
    )
    kept = docs.withColumn(
        "keep", quantile_keep(F.col("score"), 1.0)
    ).where("keep")
    assert kept.count() == 10


def test_pack_chunks_wide_shard_space(spark):
    """Shard draws are 16-bit (round-5 review fix: the single md5 byte
    silently capped useful shards at 256 and biased any non-divisor)."""
    from golden_horse_spark.operators.text_analysis import pack_chunks

    docs = spark.createDataFrame(
        [(i, f"unique document text number {i}") for i in range(4000)],
        "doc_id long, text string",
    )
    out = pack_chunks(docs, budget=64, n_shards=500)
    n_shards_seen = out.select("shard").distinct().count()
    assert n_shards_seen > 300
    with pytest.raises(ValueError, match="n_shards"):
        pack_chunks(docs, n_shards=100000)


def test_bm25_empty_corpus_returns_empty(spark):
    """A token-free corpus crashed on int(None) of the empty dl sum
    (round-5 review fix)."""
    from golden_horse_spark.operators.text_analysis import bm25_topk

    docs = spark.createDataFrame(
        [("d1", "   "), ("d2", "")], "doc_id string, text string"
    )
    assert bm25_topk(docs).count() == 0


def test_pii_counts_sequential_no_double_count(spark):
    """A phone number embedded in an email address is consumed by the
    email mask — n_phone must not double-count it, and n_pii must equal
    the number of masks in the redacted text (round-5 review fix)."""
    from golden_horse_spark.operators.text_analysis import pii_stats

    docs = spark.createDataFrame(
        [("d1", "reach me at +4915112345678@example.com today")],
        "doc_id string, text string",
    )
    row = pii_stats(docs).collect()[0]
    assert row["n_email"] == 1
    assert row["n_phone"] == 0
    assert row["n_pii"] == 1
