"""Joint CWS+NER training (R7): numerical gradcheck of both modules'
per-sentence losses through the shared embedding + LSTM, and a tiny
overfit run proving the joint trainer learns both tasks."""

import numpy as np
import pytest

from golden_horse_spark.model.joint_train import (
    bies_labels,
    cws_sentence_grads,
    ner_sentence_grads,
    train_joint,
)


def _tiny_params(rng, vocab=9, e=4, hid=5, k1=4, k2=3, nf=7):
    return {
        "w_emb": rng.randn(vocab, e) * 0.3,
        "lw": rng.randn(e, 4 * hid) * 0.3,
        "lu": rng.randn(hid, 4 * hid) * 0.3,
        "lb": rng.randn(4 * hid) * 0.1,
        "lp": rng.randn(3 * hid) * 0.1,
        "m1_n": rng.randn(hid, k1) * 0.3,
        "m1_b": rng.randn(k1) * 0.1,
        "m1_a": rng.randn(k1, k1) * 0.2,
        "m2_n": rng.randn(e + hid, k2) * 0.3,
        "m2_b": rng.randn(k2) * 0.1,
        "m2_a": rng.randn(k2, k2) * 0.2,
        "w_feat": np.vstack([rng.randn(nf, k2) * 0.2, np.zeros((1, k2))]),
    }


def _numgrad(loss_fn, P, key, eps=1e-6):
    num = np.zeros_like(P[key])
    it = np.nditer(P[key], flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        old = P[key][idx]
        P[key][idx] = old + eps
        up = loss_fn()
        P[key][idx] = old - eps
        dn = loss_fn()
        P[key][idx] = old
        num[idx] = (up - dn) / (2 * eps)
    return num


@pytest.mark.parametrize("module", ["ner", "cws"])
def test_joint_module_gradcheck(module):
    rng = np.random.RandomState(4)
    P = _tiny_params(rng)
    T = 6
    word_ids = rng.randint(0, 9, size=T).astype(np.int32)
    if module == "ner":
        feat_ids = [list(rng.randint(0, 7, size=rng.randint(1, 4))) for _ in range(T)]
        y = rng.randint(0, 3, size=T).astype(np.int32)

        def loss_fn():
            return ner_sentence_grads(P, feat_ids, word_ids, y)[0]

        _, g = ner_sentence_grads(P, feat_ids, word_ids, y)
        dense = ["m2_n", "m2_b", "m2_a", "lw", "lu", "lb", "lp"]
    else:
        y = rng.randint(0, 4, size=T).astype(np.int32)

        def loss_fn():
            return cws_sentence_grads(P, word_ids, y)[0]

        _, g = cws_sentence_grads(P, word_ids, y)
        dense = ["m1_n", "m1_b", "m1_a", "lw", "lu", "lb", "lp"]

    for key in dense:
        num = _numgrad(loss_fn, P, key)
        np.testing.assert_allclose(g[key], num, atol=5e-8,
                                   err_msg=f"{module}:{key}")
    # sparse embedding grad: densify and compare
    ids, rows = g["w_emb_rows"]
    dense_emb = np.zeros_like(P["w_emb"])
    np.add.at(dense_emb, ids, rows)
    num = _numgrad(loss_fn, P, "w_emb")
    np.testing.assert_allclose(dense_emb, num, atol=5e-8,
                               err_msg=f"{module}:w_emb")
    if module == "ner":
        fp, d_em = g["w_feat_rows"]
        dense_wf = np.zeros_like(P["w_feat"])
        np.add.at(dense_wf, fp.ravel(), np.repeat(d_em, fp.shape[1], axis=0))
        dense_wf[-1] = 0.0
        num = _numgrad(loss_fn, P, "w_feat")
        num[-1] = 0.0  # pad row is excluded from parameters
        np.testing.assert_allclose(dense_wf, num, atol=5e-8,
                                   err_msg="ner:w_feat")


def test_bies_labels():
    assert bies_labels(["中国", "人", "北京市"]) == [
        "B-word", "E-word", "S-word", "B-word", "I-word", "E-word",
    ]


def test_joint_overfit_tiny():
    """The joint trainer fits both tasks on a toy corpus: dev-F1 on the
    training sentences reaches 1.0 and CWS boundaries are recovered."""
    ner = [
        (list("张三在北京"), ["B-PER.NAM", "I-PER.NAM", "O", "B-GPE.NAM", "I-GPE.NAM"]),
        (list("李四去上海"), ["B-PER.NAM", "I-PER.NAM", "O", "B-GPE.NAM", "I-GPE.NAM"]),
        (list("他住在东京"), ["O", "O", "O", "B-GPE.NAM", "I-GPE.NAM"]),
    ]
    cws = [
        (list("张三在北京"), ["B-word", "E-word", "S-word", "B-word", "E-word"]),
        (list("李四去上海"), ["B-word", "E-word", "S-word", "B-word", "E-word"]),
        (list("他住在东京"), ["S-word", "S-word", "S-word", "B-word", "E-word"]),
    ]
    # no dev set → the FINAL weights come back (the best-on-dev snapshot
    # would freeze at the first NER-perfect epoch, before CWS converges)
    model = train_joint(
        ner, cws, ner_dev=None, emb_dim=16, hidden=12, epochs=200,
        dropout=0.0, cws_weight=1.0, decay_epochs=1000, verbose=False,
        seed=1,
    )
    from golden_horse_spark.model.evaluation import span_eval

    pred = [model.classify_ner(chars) for chars, _ in ner]
    res = span_eval(pred, [list(l) for _, l in ner])
    assert res["f1"] == 1.0, res
    cws_pred = model.classify_cws(list("张三在北京"))
    assert cws_pred == ["B-word", "E-word", "S-word", "B-word", "E-word"]


def test_alternative_and_single_modes():
    """R7 mode dispatch: 'alternative' trains each task's full corpus per
    epoch with unweighted updates; 'single' is NER-only (empty CWS corpus
    allowed). Both must learn the toy NER task; all three modes must
    produce distinct parameter trajectories."""
    ner = [
        (list("张三在北京"), ["B-PER.NAM", "I-PER.NAM", "O", "B-GPE.NAM", "I-GPE.NAM"]),
        (list("李四去上海"), ["B-PER.NAM", "I-PER.NAM", "O", "B-GPE.NAM", "I-GPE.NAM"]),
    ]
    cws = [
        (list("张三在北京"), ["B-word", "E-word", "S-word", "B-word", "E-word"]),
    ]
    from golden_horse_spark.model.evaluation import span_eval

    kw = dict(emb_dim=16, hidden=12, epochs=120, dropout=0.0,
              decay_epochs=1000, verbose=False, seed=1)
    alt = train_joint(ner, cws, train_mode="alternative", **kw)
    single = train_joint(ner, [], train_mode="single", **kw)
    joint = train_joint(ner, cws, train_mode="joint", **kw)
    gold = [list(l) for _, l in ner]
    for m in (alt, single, joint):
        pred = [m.classify_ner(chars) for chars, _ in ner]
        assert span_eval(pred, gold)["f1"] == 1.0
    # alternative also learns CWS (full-corpus pass per epoch)
    assert alt.classify_cws(list("张三在北京")) == [
        "B-word", "E-word", "S-word", "B-word", "E-word"]
    import numpy as np
    assert not np.allclose(alt.w_emb, joint.w_emb)
    assert not np.allclose(single.w_emb, joint.w_emb)


@pytest.mark.spark
def test_spark_ner_stage_accepts_joint_weights(spark, tmp_path_factory):
    """The Spark NER stage auto-detects a joint npz (lstm_w key) and its
    mentions equal the driver-side per-sentence classify_ner output."""
    from golden_horse_spark.model.evaluation import bio_spans
    from golden_horse_spark.operators.ner import extract_mentions

    ner = [
        (list("张三在北京"), ["B-PER.NAM", "I-PER.NAM", "O", "B-GPE.NAM", "I-GPE.NAM"]),
        (list("李四去上海"), ["B-PER.NAM", "I-PER.NAM", "O", "B-GPE.NAM", "I-GPE.NAM"]),
    ]
    cws = [
        (list("张三在北京"), ["B-word", "E-word", "S-word", "B-word", "E-word"]),
        (list("李四去上海"), ["B-word", "E-word", "S-word", "B-word", "E-word"]),
    ]
    model = train_joint(ner, cws, ner_dev=None, emb_dim=8, hidden=6,
                        epochs=60, dropout=0.0, decay_epochs=1000,
                        verbose=False, seed=1)
    path = str(tmp_path_factory.mktemp("jw") / "joint.npz")
    model.save(path)

    texts = ["张三在北京", "李四去上海", "张三在北京"]
    sents = spark.createDataFrame(
        [(f"d{i}", 0, 0, t) for i, t in enumerate(texts)],
        "doc_id string, span_idx int, sent_idx int, text string",
    )
    got = {
        (r["doc_id"], r["start"], r["end"], r["surface"], r["etype"], r["ntype"])
        for r in extract_mentions(sents, path).collect()
    }
    want = set()
    for i, t in enumerate(texts):
        for s, e, etype, ntype in bio_spans(model.classify_ner(list(t))):
            want.add((f"d{i}", s, e, t[s:e], etype, ntype))
    assert got == want and len(got) > 0
