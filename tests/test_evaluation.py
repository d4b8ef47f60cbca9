"""Span scorer (E2 port) quirk tests + BIO chunker tests."""

from golden_horse_spark.model.evaluation import bio_spans, span_eval


def test_perfect_match():
    gold = [["B-PER.NAM", "I-PER.NAM", "O", "B-LOC.NAM"]]
    res = span_eval(gold, gold)
    assert res["p"] == 1.0 and res["r"] == 1.0 and res["f1"] == 1.0


def test_counts_pred_and_gold_chunks():
    pred = [["B-PER.NAM", "O", "B-LOC.NAM", "I-LOC.NAM"]]
    gold = [["B-PER.NAM", "O", "O", "B-LOC.NAM"]]
    res = span_eval(pred, gold)
    c = res["counts"]
    assert c["PER.NAM"] == [1, 1, 1]
    assert c["LOC.NAM"] == [0, 1, 1]


def test_partial_span_not_credited():
    # pred covers only part of the gold chunk -> no match
    pred = [["B-PER.NAM", "O", "O"]]
    gold = [["B-PER.NAM", "I-PER.NAM", "O"]]
    res = span_eval(pred, gold)
    assert res["counts"]["PER.NAM"] == [0, 1, 1]


def test_overlong_pred_spoils_match():
    # pred extends past the gold chunk with I- -> chunk spoiled
    pred = [["B-PER.NAM", "I-PER.NAM", "I-PER.NAM", "O"]]
    gold = [["B-PER.NAM", "I-PER.NAM", "O", "O"]]
    res = span_eval(pred, gold)
    assert res["counts"]["PER.NAM"][0] == 0


def test_back_to_back_chunks_both_credited():
    seq = [["B-PER.NAM", "B-PER.NAM", "O"]]
    res = span_eval(seq, seq)
    assert res["counts"]["PER.NAM"] == [2, 2, 2]


def test_chunk_at_sentence_end_credited():
    seq = [["O", "B-LOC.NOM", "I-LOC.NOM"]]
    res = span_eval(seq, seq)
    assert res["counts"]["LOC.NOM"] == [1, 1, 1]


def test_s_tag_single_token_chunk():
    seq = [["S-GPE.NAM", "O"]]
    res = span_eval(seq, seq)
    assert res["counts"]["GPE.NAM"] == [1, 1, 1]


def test_micro_aggregation():
    pred = [["B-PER.NAM", "O"], ["B-LOC.NAM", "O"]]
    gold = [["B-PER.NAM", "O"], ["O", "B-LOC.NAM"]]
    res = span_eval(pred, gold)
    # 1 match of 2 predicted, 2 gold
    assert res["p"] == 0.5 and res["r"] == 0.5


def test_bio_spans_basic():
    labels = ["B-PER.NAM", "I-PER.NAM", "O", "B-LOC.NOM", "B-GPE.NAM"]
    assert bio_spans(labels) == [
        (0, 2, "PER", "NAM"),
        (3, 4, "LOC", "NOM"),
        (4, 5, "GPE", "NAM"),
    ]


def test_bio_spans_s_and_e_tags():
    labels = ["S-PER.NAM", "B-LOC.NAM", "E-LOC.NAM", "O"]
    assert bio_spans(labels) == [(0, 1, "PER", "NAM"), (1, 3, "LOC", "NAM")]


def test_bio_spans_type_change_breaks_chunk():
    labels = ["B-PER.NAM", "I-LOC.NAM"]
    assert bio_spans(labels) == [(0, 1, "PER", "NAM"), (1, 2, "LOC", "NAM")]


def test_error_analysis_rows():
    """E4 port: token-level rows, full dump by default (the reference's
    mismatch filter is commented out), filter exposed as a flag."""
    from golden_horse_spark.model.evaluation import error_analysis

    words = [["张", "三"], ["好"]]
    preds = [["B-PER.NAM", "O"], ["O"]]
    golds = [["B-PER.NAM", "I-PER.NAM"], ["O"]]
    rows = error_analysis(words, preds, golds)
    assert rows == [
        (0, 0, "张", "B-PER.NAM", "B-PER.NAM"),
        (0, 1, "三", "O", "I-PER.NAM"),
        (1, 0, "好", "O", "O"),
    ]
    only = error_analysis(words, preds, golds, mismatches_only=True)
    assert only == [(0, 1, "三", "O", "I-PER.NAM")]


def test_order_zero_decode_equals_zero_transition_chain():
    """M6: order-zero decode == order-1 hybrid decode with zero
    transitions (zero A factorizes the chain), and the NLL matches an
    independent softmax cross-entropy."""
    import numpy as np

    from golden_horse_spark.model.crf import (
        decode,
        decode_order_zero,
        order_zero_nll,
    )

    rng = np.random.RandomState(0)
    for _ in range(20):
        em = rng.randn(rng.randint(2, 9), 5).astype(np.float32)
        a = np.zeros((5, 5), dtype=np.float32)
        np.testing.assert_array_equal(
            decode_order_zero(em), decode(em, a, viterbi=True)
        )
        y = rng.randint(0, 5, size=len(em))
        p = np.exp(em.astype(np.float64))
        p /= p.sum(axis=1, keepdims=True)
        want = -np.log(p[np.arange(len(y)), y]).sum()
        assert abs(order_zero_nll(em, y) - want) < 1e-9
