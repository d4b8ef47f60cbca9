"""Sentence segmentation (T1): local semantics + the Spark stage,
including the span-sequence order invariant."""

import pytest

from golden_horse_spark.operators.sentence_seg import (
    documents_to_sentences,
    segment_sentences,
)


def test_basic_split_and_ender_absorb():
    text = "你好。今天天气不错，我们走吧！"
    sents = segment_sentences(text)
    assert [s for s, _ in sents] == ["你好。", "今天天气不错，", "我们走吧！"]
    assert [o for _, o in sents] == [0, 3, 10]


def test_multi_ender_run_absorbed():
    sents = segment_sentences("真的吗？！太好了。。。")
    assert [s for s, _ in sents] == ["真的吗？！", "太好了。。。"]


def test_wrapper_reattached():
    # a piece that strips to a single closing quote is glued to the
    # previous sentence (icwb.py:111-114)
    sents = segment_sentences("他说：“走吧。”")
    assert [s for s, _ in sents] == ["他说：", "“走吧。”"]


def test_offsets_index_into_content():
    text = "雯子小菇凉！苦逼青年，杨素晗。"
    for s, o in segment_sentences(text):
        assert text[o : o + len(s)] == s


def test_roundtrip_concat_covers_all_non_dropped_chars():
    text = "今天天气真好。明天呢？不知道！"
    sents = segment_sentences(text)
    assert "".join(s for s, _ in sents) == text


@pytest.mark.spark
def test_sql_segmenter_matches_python_fuzz(spark):
    """The JVM-side aggregate fold must agree with segment_sentences on
    adversarial inputs: random mixes of enders, wrappers, whitespace, and
    text, plus the whole weiboNER dev corpus."""
    import random

    from golden_horse_spark.operators.sentence_seg import segment_sentences_col
    from golden_horse_spark.sources.conll import read_conll, sanitize_for_arrow

    rng = random.Random(13)
    alphabet = list("。？！，：；”』\" abc中文x，。")
    cases = ["", "。", " ", "。 。", "a。”a b。", "他说：“走吧。”",
             "。abc", "abc。。。", "”", "  。", "x，，y"]
    for _ in range(600):
        n = rng.randint(1, 14)
        cases.append("".join(rng.choice(alphabet) for _ in range(n)))
    corpus = read_conll("/root/reference/data/weiboNER.conll.dev")
    cases += [sanitize_for_arrow("".join(c)) for c, _ in corpus[:270]]

    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = df.select("t", segment_sentences_col("t").alias("s")).collect()
    import re as _re

    def segment_fixed_cursor(content):
        """The python port with ONE fix: the cursor advances past wrapper
        pieces. The reference leaves it stale (icwb.py:111-114), so a
        later piece whose first char repeats earlier gets a wrong offset
        and a wrong ender-absorb position — a reference bug. The JVM
        implementation (exact string tiling) equals THIS variant
        everywhere, and equals the uncorrected port wherever the bug
        doesn't fire."""
        enders = set("。？！，：；")
        wrappers = {'"', "”", "』"}
        out, cursor = [], 0
        for piece in _re.split("[。？！，：；]+", content):
            if not piece:
                continue
            stripped = piece.strip()
            if len(stripped) == 1 and stripped in wrappers:
                start = content.index(piece[0], cursor)
                cursor = start + len(piece)  # the fix
                if out:
                    out[-1] = (out[-1][0] + piece.rstrip(), out[-1][1])
                else:
                    out.append((piece.rstrip(), start))
                continue
            start = content.index(piece[0], cursor)
            end = start + len(piece)
            while end < len(content) and content[end] in enders:
                piece += content[end]
                end += 1
            cursor = end
            if piece.strip() in enders:
                if out:
                    out[-1] = (out[-1][0] + piece, out[-1][1])
                    continue
            out.append((piece, start))
        return out

    n_buggy = 0
    for r in got:
        content = r["t"]
        want = segment_sentences(content)
        fixed = segment_fixed_cursor(content)
        have = [(x["text"], x["start"]) for x in r["s"]]
        assert have == fixed, (repr(content), have, fixed)
        if want != fixed:
            n_buggy += 1
    # the stale-cursor corner must stay an adversarial-fuzz rarity and
    # never fire on the real corpus (the last 270 cases)
    assert n_buggy < len(cases) * 0.2
    for content in cases[-270:]:
        assert segment_sentences(content) == segment_fixed_cursor(content)


@pytest.mark.spark
def test_documents_to_sentences_order_invariant(spark):
    from golden_horse_spark.sources.documents import synthesize_documents

    docs = synthesize_documents(spark, 40, seed=7, partitions=4)
    sents = documents_to_sentences(docs)
    rows = sents.collect()
    assert len(rows) > 40
    # reassembly: per (doc_id, span_idx) sentences sorted by sent_idx must
    # re-concatenate to the original span text
    docs_local = {r["doc_id"]: r["spans"] for r in docs.collect()}
    from collections import defaultdict

    by_span = defaultdict(list)
    for r in rows:
        by_span[(r["doc_id"], r["span_idx"])].append(r)
    for (doc_id, span_idx), items in by_span.items():
        items.sort(key=lambda r: r["sent_idx"])
        original = docs_local[doc_id][span_idx]["text"]
        assert "".join(i["text"] for i in items) == original
        for i in items:
            base = docs_local[doc_id][span_idx]["offset"]
            rel = i["offset"] - base
            assert original[rel : rel + len(i["text"])] == i["text"]


@pytest.mark.spark
def test_media_spans_excluded_but_preserved(spark):
    from pyspark.sql import functions as F

    from golden_horse_spark.sources.documents import synthesize_documents

    docs = synthesize_documents(spark, 60, seed=7, media_fraction=0.5)
    sents = documents_to_sentences(docs)
    assert sents.where(F.col("text") == "").count() == 0
    # media spans still present on the documents side (span-sequence equality)
    n_media = docs.select(F.explode("spans").alias("s")).where(
        F.col("s.kind") != "text"
    ).count()
    assert n_media > 0
