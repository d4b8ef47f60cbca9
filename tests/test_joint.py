"""ACL'16 joint CWS+NER inference circuit (model/joint.py)."""

import numpy as np

from golden_horse_spark.model.crf import decode, pad_features
from golden_horse_spark.model.dicts import build_dicts
from golden_horse_spark.model.features import encode_sentence
from golden_horse_spark.model.joint import JointWeights, init_joint
from golden_horse_spark.model.lstm import lstm_forward

TOY = [
    (list("张三在北京"), ["B-PER.NAM", "I-PER.NAM", "O", "B-LOC.NAM", "I-LOC.NAM"]),
    (list("上海很大"), ["B-LOC.NAM", "I-LOC.NAM", "O", "O"]),
]


def _joint():
    f2i, w2i, _l2i = build_dicts(TOY, 0, "char")
    return init_joint(
        w2i, f2i,
        ner_labels=["O", "B-PER.NAM", "I-PER.NAM", "B-LOC.NAM", "I-LOC.NAM"],
        emb_dim=16, hidden=8, mode="char",
    )


def test_shapes_and_label_spaces():
    jw = _joint()
    chars = list("张三在北京")
    cws, ner = jw.classify(chars)
    assert len(cws) == len(ner) == len(chars)
    assert set(cws) <= set(jw.cws_labels)
    assert set(ner) <= set(jw.ner_labels)


def test_ner_emission_is_concat_transform_plus_feature_sums():
    """module2 emission must equal the hand-computed
    concat(emb, lstm_h) @ N + b + Σ feature rows — the chip wiring at
    neural_architectures.py:133-141 re-expressed."""
    jw = _joint()
    rng = np.random.RandomState(7)
    jw.w_feat = rng.randn(*jw.w_feat.shape).astype(np.float32)
    jw.w_feat[-1] = 0.0
    chars = list("张三在北京")
    feat_ids, word_ids = encode_sentence(
        chars, jw.features2idx, jw.words2idx, jw.mode
    )
    emb = jw.w_emb[np.asarray(word_ids)]
    h = lstm_forward(emb, jw.lstm["w"], jw.lstm["u"], jw.lstm["b"], jw.lstm["p"])
    em = np.concatenate([emb, h], axis=1) @ jw.m2_n + jw.m2_b
    em = em + jw.w_feat[pad_features(feat_ids, jw.pad_id)].sum(axis=1)
    want = [jw.ner_labels[int(i)] for i in decode(em.astype(np.float32), jw.m2_a)]
    assert jw.classify_ner(chars) == want


def test_cws_module_is_lstm_linear_crf():
    jw = _joint()
    chars = list("上海很大")
    _fi, word_ids = encode_sentence(chars, jw.features2idx, jw.words2idx, jw.mode)
    emb = jw.w_emb[np.asarray(word_ids)]
    h = lstm_forward(emb, jw.lstm["w"], jw.lstm["u"], jw.lstm["b"], jw.lstm["p"])
    em = (h @ jw.m1_n + jw.m1_b).astype(np.float32)
    want = [jw.cws_labels[int(i)] for i in decode(em, jw.m1_a)]
    assert jw.classify_cws(chars) == want


def test_short_sentence_quirk_applies_to_joint_ner():
    jw = _joint()
    assert jw.classify_ner(["张"]) == [jw.ner_labels[0]]


def test_zero_features_reduce_to_pure_neural_emission():
    """With w_feat all zeros (fresh init), the feature term is a no-op —
    the pad row invariant (neural_lib.py:352-353) holds by construction."""
    jw = _joint()
    chars = list("张三在北京")
    feat_ids, word_ids = encode_sentence(
        chars, jw.features2idx, jw.words2idx, jw.mode
    )
    emb = jw.w_emb[np.asarray(word_ids)]
    h = lstm_forward(emb, jw.lstm["w"], jw.lstm["u"], jw.lstm["b"], jw.lstm["p"])
    em = (np.concatenate([emb, h], axis=1) @ jw.m2_n + jw.m2_b).astype(np.float32)
    want = [jw.ner_labels[int(i)] for i in decode(em, jw.m2_a)]
    assert jw.classify_ner(chars) == want
