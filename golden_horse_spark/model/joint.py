"""ACL'16 joint CWS+NER inference circuit (SURVEY.md §2.7 M13,
``jointSegmentationNER``).

Wiring re-derived from the reference assembly
(neural_architectures.py:214-229 chip lists; SegNERStackMaker
neural_architectures.py:86-166):

* module 1 (CWS):  Embedding → LSTM → BiasedLinear → OrderOneCrf over
  BIES word-boundary labels;
* module 2 (NER):  the SAME embedding chip and the SAME (CWS-trained)
  LSTM run over the NER sentence; per-token input is
  ``concat(emb, lstm_h)`` (neural_architectures.py:133-135) →
  BiasedLinear → ComputeFeature (adds the n-gram feature-weight sums,
  the log-bilinear emission) → OrderOneCrf over NER labels;
* joint training cost is ``Λ·cws_score + ner_score``
  (jointSegmentationNER Λ=0.1 default) — TRAINING is implemented in
  ``joint_train.py`` (R7: gradchecked LSTM BPTT + CRF marginals,
  paired-sentence SGD); ``fixtures/joint_weights.npz`` is the trained
  artifact (revised-test overall F1 0.5723, above EMNLP'15's published
  0.5605; the reference ships no joint pretrained weights).

Both decoders are the shared hybrid CRF (crf.py): logsumexp-forward +
argmax-backtrace, viterbi flag default False.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .crf import decode, pad_features
from .features import encode_sentence
from .lstm import init_lstm_params, lstm_forward


@dataclass
class JointWeights:
    """Shared embedding + CWS module + NER module parameters."""

    words2idx: Dict[str, int]
    features2idx: Dict[str, int]          # NER n-gram feature dict
    cws_labels: List[str]                 # e.g. B/I/E/S-word (+N)
    ner_labels: List[str]
    w_emb: np.ndarray                     # (vocab, emb_dim) shared
    lstm: dict                            # CWS-trained LSTM params
    m1_n: np.ndarray                      # (hidden, |cws|) BiasedLinear
    m1_b: np.ndarray
    m1_a: np.ndarray                      # (|cws|, |cws|) transitions
    m2_n: np.ndarray                      # (emb_dim+hidden, |ner|)
    m2_b: np.ndarray
    m2_a: np.ndarray
    w_feat: np.ndarray                    # (|feat|+1, |ner|), pad row zero
    mode: str = "charpos"
    viterbi: bool = False

    @property
    def pad_id(self) -> int:
        return self.w_feat.shape[0] - 1

    def _shared_forward(self, word_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        emb = self.w_emb[word_ids]
        h = lstm_forward(
            emb, self.lstm["w"], self.lstm["u"], self.lstm["b"], self.lstm["p"]
        )
        return emb, h

    def classify_cws(self, chars: Sequence[str]) -> List[str]:
        """module 1: word-boundary labels for one sentence."""
        _feat, word_ids = encode_sentence(
            chars, self.features2idx, self.words2idx, self.mode
        )
        _emb, h = self._shared_forward(np.asarray(word_ids, dtype=np.int32))
        em = h @ self.m1_n + self.m1_b
        path = decode(em.astype(np.float32), self.m1_a, self.viterbi)
        return [self.cws_labels[int(i)] for i in path]

    def classify_ner(self, chars: Sequence[str]) -> List[str]:
        """module 2: NER labels; emission = concat(emb, lstm_h) transform
        + n-gram feature sums (the ACL16 emission)."""
        if len(chars) < 2:  # same short-sentence quirk as EMNLP15
            return [self.ner_labels[0]] * len(chars)
        feat_ids, word_ids = encode_sentence(
            chars, self.features2idx, self.words2idx, self.mode
        )
        emb, h = self._shared_forward(np.asarray(word_ids, dtype=np.int32))
        x = np.concatenate([emb, h], axis=1)
        em = x @ self.m2_n + self.m2_b
        em = em + self.w_feat[pad_features(feat_ids, self.pad_id)].sum(axis=1)
        path = decode(em.astype(np.float32), self.m2_a, self.viterbi)
        return [self.ner_labels[int(i)] for i in path]

    def classify(self, chars: Sequence[str]) -> Tuple[List[str], List[str]]:
        return self.classify_cws(chars), self.classify_ner(chars)

    def save(self, path) -> None:
        """npz-native artifact (same one-buffer-read rationale as
        NerWeights; the ``lstm_w`` key marks the file as joint)."""
        np.savez_compressed(
            path,
            words=np.array(list(self.words2idx.keys()), dtype=np.str_),
            word_ids=np.array(list(self.words2idx.values()), dtype=np.int64),
            feats=np.array(list(self.features2idx.keys()), dtype=np.str_),
            feat_ids=np.array(list(self.features2idx.values()), dtype=np.int64),
            cws_labels=np.array(self.cws_labels, dtype=np.str_),
            ner_labels=np.array(self.ner_labels, dtype=np.str_),
            w_emb=self.w_emb,
            lstm_w=self.lstm["w"], lstm_u=self.lstm["u"],
            lstm_b=self.lstm["b"], lstm_p=self.lstm["p"],
            m1_n=self.m1_n, m1_b=self.m1_b, m1_a=self.m1_a,
            m2_n=self.m2_n, m2_b=self.m2_b, m2_a=self.m2_a,
            w_feat=self.w_feat, mode=np.array(self.mode),
        )

    @classmethod
    def load(cls, path) -> "JointWeights":
        z = np.load(path, allow_pickle=False)
        return cls(
            words2idx=dict(zip(z["words"].tolist(),
                               (int(i) for i in z["word_ids"]))),
            features2idx=dict(zip(z["feats"].tolist(),
                                  (int(i) for i in z["feat_ids"]))),
            cws_labels=z["cws_labels"].tolist(),
            ner_labels=z["ner_labels"].tolist(),
            w_emb=z["w_emb"],
            lstm={"w": z["lstm_w"], "u": z["lstm_u"], "b": z["lstm_b"],
                  "p": z["lstm_p"]},
            m1_n=z["m1_n"], m1_b=z["m1_b"], m1_a=z["m1_a"],
            m2_n=z["m2_n"], m2_b=z["m2_b"], m2_a=z["m2_a"],
            w_feat=z["w_feat"], mode=str(z["mode"]),
        )


def init_joint(
    words2idx: Dict[str, int],
    features2idx: Dict[str, int],
    cws_labels: Sequence[str] = ("B-word", "I-word", "E-word", "S-word"),
    ner_labels: Optional[Sequence[str]] = None,
    emb_dim: int = 50,
    hidden: int = 64,
    seed: int = 1,
    mode: str = "charpos",
) -> JointWeights:
    """Random-init joint circuit with the reference's shape contract
    (StackConfig-style seeded init; training is out of scope — load
    trained matrices into JointWeights for parity work)."""
    rng = np.random.RandomState(seed)
    ner_labels = list(ner_labels or ["O", "B-PER.NAM", "I-PER.NAM"])
    k1, k2 = len(cws_labels), len(ner_labels)
    return JointWeights(
        words2idx=words2idx,
        features2idx=features2idx,
        cws_labels=list(cws_labels),
        ner_labels=ner_labels,
        w_emb=((rng.rand(len(words2idx), emb_dim) - 0.5) / emb_dim).astype(np.float32),
        lstm=init_lstm_params(emb_dim, hidden, seed=seed),
        m1_n=((rng.rand(hidden, k1) - 0.5) / np.sqrt(hidden)).astype(np.float32),
        m1_b=np.zeros(k1, dtype=np.float32),
        m1_a=((rng.rand(k1, k1) - 0.5) / k1).astype(np.float32),
        m2_n=((rng.rand(emb_dim + hidden, k2) - 0.5) / np.sqrt(emb_dim + hidden)).astype(np.float32),
        m2_b=np.zeros(k2, dtype=np.float32),
        m2_a=((rng.rand(k2, k2) - 0.5) / k2).astype(np.float32),
        w_feat=np.zeros((len(features2idx) + 1, k2), dtype=np.float32),
        mode=mode,
    )
