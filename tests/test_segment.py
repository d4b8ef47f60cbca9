"""Dictionary-DAG segmenter (model/segment.py) vs the golden jieba-0.37
charpos dumps, and the charpos/word representation modes it unlocks."""

from pathlib import Path

import pytest

from golden_horse_spark.model.features import representations
from golden_horse_spark.model.segment import (
    DagSegmenter,
    build_lexicon,
    default_segmenter,
    words_from_charpos,
)
from golden_horse_spark.sources.conll import read_charpos_golden

GOLDEN_DEV = Path("/root/reference/data/crfsuite.weiboNER.charpos.conll.dev")
GOLDEN_TEST = Path("/root/reference/data/crfsuite.weiboNER.charpos.conll.test")


def test_words_from_charpos_roundtrip():
    assert words_from_charpos(["中0", "国1", "人0", "说0", "好0"]) == [
        "中国", "人", "说", "好",
    ]
    # multi-digit positions (words of length > 10)
    toks = [c + str(i) for i, c in enumerate("abcdefghijkl")]
    assert words_from_charpos(toks) == ["abcdefghijkl"]


def test_dag_segmenter_prefers_dictionary_words():
    seg = DagSegmenter({"中国": 100, "中": 5, "国": 5, "人": 5, "中国人": 40})
    assert seg.cut("中国人") == ["中国人"]
    assert seg.cut("中国") == ["中国"]
    assert seg.cut("x中国y") == ["x", "中国", "y"]  # OOV chars fall out singly
    assert seg.cut("") == []


@pytest.mark.skipif(not GOLDEN_DEV.exists(), reason="reference not mounted")
@pytest.mark.parametrize("split", ["dev", "test"])
def test_charpos_agreement_with_golden_jieba(split):
    """Token-level charpos agreement ≥ 0.998 vs the reference's actual
    jieba-0.37 output (the calibrated two-stage DAG+HMM segmenter; the
    dumps ship the charpos column; the companion conll split supplies
    the raw chars — needed because charpos tokens of digit characters
    are ambiguous to re-parse)."""
    from golden_horse_spark.sources.conll import read_conll

    dump = Path(f"/root/reference/data/crfsuite.weiboNER.charpos.conll.{split}")
    conll = read_conll(Path(f"/root/reference/data/weiboNER.conll.{split}"))
    seg = default_segmenter()
    agree = total = 0
    for (chars, _labels), sent in zip(conll, read_charpos_golden(dump)):
        gold = [t for t, _lb, _fs in sent]
        assert len(gold) == len(chars)
        ours = representations(chars, "charpos", segmenter=seg)
        total += len(gold)
        agree += sum(a == b for a, b in zip(gold, ours))
    assert agree / total >= 0.998


@pytest.mark.skipif(not GOLDEN_DEV.exists(), reason="reference not mounted")
def test_sentence_exact_match_rate():
    """Whole-sentence segmentation equality vs the golden jieba dumps
    must stay ≥ 0.95 (the round-1 single-stage DAG managed 0.80; the
    calibrated two-stage DAG+HMM reaches 0.96 — its HMM stage resolves
    context-dependent single-char runs a unigram dict cannot)."""
    from golden_horse_spark.model.segment import words_from_charpos
    from golden_horse_spark.sources.conll import read_conll

    seg = default_segmenter()
    exact = total = 0
    for split in ("dev", "test"):
        dump = Path(f"/root/reference/data/crfsuite.weiboNER.charpos.conll.{split}")
        conll = read_conll(Path(f"/root/reference/data/weiboNER.conll.{split}"))
        for (chars, _labels), sent in zip(conll, read_charpos_golden(dump)):
            gold = words_from_charpos([t for t, _lb, _fs in sent], chars)
            total += 1
            exact += seg.cut("".join(chars)) == gold
    assert exact / total >= 0.95, exact / total


def test_word_mode_representation():
    seg = DagSegmenter({"北京": 10, "大学": 10})
    assert representations(list("北京大学"), "word", segmenter=seg) == [
        "北京", "北京", "大学", "大学",
    ]
    assert representations(list("北京大学"), "charpos", segmenter=seg) == [
        "北0", "京1", "大0", "学1",
    ]


def test_charpos_mode_end_to_end_trainable():
    """A charpos-mode model trains and classifies through the standard
    path (encode_sentence picks up the fallback segmenter)."""
    from golden_horse_spark.model.train import train_ner

    toy = [
        (list("张三在北京"), ["B-PER.NAM", "I-PER.NAM", "O", "B-LOC.NAM", "I-LOC.NAM"]),
        (list("李四来上海了"), ["B-PER.NAM", "I-PER.NAM", "O", "B-LOC.NAM", "I-LOC.NAM", "O"]),
        (list("上海很大"), ["B-LOC.NAM", "I-LOC.NAM", "O", "O"]),
    ] * 4
    model = train_ner(toy, epochs=3, mode="charpos", use_emb=True,
                      emb_dim=8, verbose=False)
    assert model.mode == "charpos"
    out = model.classify(list("张三在北京"))
    assert len(out) == 5
