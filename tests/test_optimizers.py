"""Update-rule equality tests for the exact AdaDelta/RMSProp ports
(reference theano_src/train_util.py:289-352, 356-424): the optimizer
classes must match an independent step-by-step transcription of the
reference's Theano update equations at t = 1..5, and the Spark batch-GD
trainer wired to them must match a driver-side full-batch loop."""

import numpy as np
import pytest


def _rand_params(rng, shapes):
    return [rng.randn(*s) for s in shapes]


SHAPES = [(7, 3), (3, 3), (5,)]


def _reference_adadelta_steps(params, grads_seq):
    """Literal transcription of train_util.py adadelta: f_cost stores
    zg=g and rg2; f_update applies ud from ru2/rg2/zg, then updates ru2
    and p."""
    p = [x.copy() for x in params]
    zg = [np.zeros_like(x) for x in p]
    rg2 = [np.zeros_like(x) for x in p]
    ru2 = [np.zeros_like(x) for x in p]
    out = []
    for grads in grads_seq:
        for i, g in enumerate(grads):  # f_cost updates
            zg[i] = g.copy()
            rg2[i] = 0.95 * rg2[i] + 0.05 * g**2
        for i in range(len(p)):  # f_update updates
            ud = -np.sqrt(ru2[i] + 1e-6) / np.sqrt(rg2[i] + 1e-6) * zg[i]
            ru2[i] = 0.95 * ru2[i] + 0.05 * ud**2
            p[i] = p[i] + ud
        out.append([x.copy() for x in p])
    return out


def _reference_rmsprop_steps(params, grads_seq):
    """Literal transcription of train_util.py rmsprop: f_cost stores
    zg/rg/rg2; f_update computes updir_new (momentum 0.9, fixed 1e-4
    step) and applies it."""
    p = [x.copy() for x in params]
    zg = [np.zeros_like(x) for x in p]
    rg = [np.zeros_like(x) for x in p]
    rg2 = [np.zeros_like(x) for x in p]
    ud = [np.zeros_like(x) for x in p]
    out = []
    for grads in grads_seq:
        for i, g in enumerate(grads):
            zg[i] = g.copy()
            rg[i] = 0.95 * rg[i] + 0.05 * g
            rg2[i] = 0.95 * rg2[i] + 0.05 * g**2
        for i in range(len(p)):
            ud[i] = 0.9 * ud[i] - 1e-4 * zg[i] / np.sqrt(
                rg2[i] - rg[i] ** 2 + 1e-4
            )
            p[i] = p[i] + ud[i]
        out.append([x.copy() for x in p])
    return out


@pytest.mark.parametrize("name,ref_fn", [
    ("adadelta", _reference_adadelta_steps),
    ("rmsprop", _reference_rmsprop_steps),
])
def test_step_for_step_equality_t1_to_t5(name, ref_fn):
    from golden_horse_spark.model.optimizers import make_optimizer

    rng = np.random.RandomState(3)
    params = _rand_params(rng, SHAPES)
    grads_seq = [_rand_params(rng, SHAPES) for _ in range(5)]
    expect = ref_fn(params, grads_seq)

    opt = make_optimizer(name, lr=0.123)  # lr must be ignored, as in ref
    p = [x.copy() for x in params]
    for t, grads in enumerate(grads_seq):
        opt.step(p, [g.copy() for g in grads])
        for got, want in zip(p, expect[t]):
            # atol floor: in-place `p += ud` vs `p = p + ud` differ by
            # ~1 ulp; the rules themselves are identical
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-12,
                                       err_msg=f"{name} t={t + 1}")


def test_adagrad_matches_manual_accumulator():
    from golden_horse_spark.model.optimizers import AdaGrad

    rng = np.random.RandomState(5)
    params = _rand_params(rng, SHAPES)
    grads_seq = [_rand_params(rng, SHAPES) for _ in range(4)]
    p = [x.copy() for x in params]
    opt = AdaGrad(lr=0.5)
    for grads in grads_seq:
        opt.step(p, grads)
    q = [x.copy() for x in params]
    acc = [np.zeros_like(x) for x in q]
    for grads in grads_seq:
        for i, g in enumerate(grads):
            acc[i] += g * g
            q[i] -= 0.5 * g / np.sqrt(acc[i] + 1e-8)
    for got, want in zip(p, q):
        np.testing.assert_allclose(got, want)


@pytest.mark.spark
@pytest.mark.parametrize("name", ["adadelta", "rmsprop"])
def test_spark_batch_gd_matches_sequential_fullbatch(spark, name):
    """train_ner_spark(strategy=batch_gd, optimizer=<ref port>) on 3
    sentences must track a sequential driver-side full-batch loop using
    the same sentence_grad + optimizer — update-for-update (epochs 1..3,
    float64 exact up to summation order; partials reduce in pid order)."""
    from golden_horse_spark.model.dicts import build_dicts
    from golden_horse_spark.model.optimizers import make_optimizer
    from golden_horse_spark.model.spark_train import train_ner_spark
    from golden_horse_spark.model.train import sentence_grad
    from golden_horse_spark.model.features import encode_sentence

    sents = [
        (list("张三在北京"), ["B-PER.NAM", "I-PER.NAM", "O", "B-GPE.NAM", "I-GPE.NAM"]),
        (list("李四住上海"), ["B-PER.NAM", "I-PER.NAM", "O", "B-GPE.NAM", "I-GPE.NAM"]),
        (list("他去了东京"), ["O", "O", "O", "B-GPE.NAM", "I-GPE.NAM"]),
    ]
    got = train_ner_spark(
        spark, sents, dev=None, strategy="batch_gd", parts=2, mode="char",
        use_emb=False, epochs=3, seed=1, optimizer=name, verbose=False,
    )

    # sequential twin
    f2i, w2i, l2i = build_dicts(sents, 0, "char")
    rng = np.random.RandomState(1)
    w_feat = np.zeros((len(f2i) + 1, len(l2i)))
    a = (rng.rand(len(l2i), len(l2i)) - 0.5) / len(l2i)
    opt = make_optimizer(name, 0.05)
    for _ in range(3):
        g_feat = np.zeros_like(w_feat)
        g_a = np.zeros_like(a)
        for chars, labels in sents:
            feat_ids, word_ids = encode_sentence(chars, f2i, w2i, "char")
            y = np.asarray([l2i[lb] for lb in labels], dtype=np.int32)
            _, fp, d_em, d_a = sentence_grad(
                feat_ids, np.asarray(word_ids, dtype=np.int32), y,
                w_feat, a, None, None, None, False,
            )
            np.add.at(g_feat, fp.ravel(), np.repeat(d_em, fp.shape[1], axis=0))
            g_a += d_a
        g_feat[-1] = 0.0
        opt.step([w_feat, a], [g_feat, g_a])
        w_feat[-1] = 0.0
    np.testing.assert_allclose(got.w_feat, w_feat.astype(np.float32), atol=1e-6)
    np.testing.assert_allclose(got.a, a.astype(np.float32), atol=1e-6)
