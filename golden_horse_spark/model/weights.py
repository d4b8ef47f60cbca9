"""Frozen NER model artifact: dictionaries + weight matrices.

Shape contract (FIXTURES.md §5): words2idx / features2idx / labels2idx in
first-seen order (sighan_ner.py:78-105); W_feat ((featsize+1) × K) with the
LAST row zeros (the pad row, neural_lib.py:352-353); A (K × K) chain
potentials; optional embedding path W_emb (vocab × dim), N (dim × K), b (K).
Stored as a single .npz (dicts as JSON) and shipped to executors via
``spark-submit --py-files`` + an ``SparkContext.broadcast`` of the loaded
dict (SURVEY.md §1.1).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from .crf import decode, emission_scores, pad_features
from .features import encode_sentence


@dataclass
class NerWeights:
    features2idx: Dict[str, int]
    words2idx: Dict[str, int]
    labels2idx: Dict[str, int]
    w_feat: np.ndarray  # (featsize+1, K) float32, last row zeros
    a: np.ndarray  # (K, K) float32
    w_emb: Optional[np.ndarray] = None  # (vocab, dim) float32
    lin_n: Optional[np.ndarray] = None  # (dim, K)
    lin_b: Optional[np.ndarray] = None  # (K,)
    use_emb: bool = False
    viterbi: bool = False
    mode: str = "char"
    idx2label: List[str] = field(default_factory=list)

    def __post_init__(self):
        if not self.idx2label:
            inv = {v: k for k, v in self.labels2idx.items()}
            self.idx2label = [inv[i] for i in range(len(inv))]

    @property
    def pad_id(self) -> int:
        return self.w_feat.shape[0] - 1

    @property
    def n_labels(self) -> int:
        return self.a.shape[0]

    # -- single-sentence classify: the local oracle the Spark stage must match
    def classify(self, chars: Sequence[str]) -> List[str]:
        """chars → label strings. Length-1 sentences predict label id 0
        without scoring (crf_ner.py:28 quirk)."""
        if len(chars) < 2:
            return [self.idx2label[0]] * len(chars)
        feat_ids, word_ids = encode_sentence(
            chars, self.features2idx, self.words2idx, self.mode
        )
        em = emission_scores(
            pad_features(feat_ids, self.pad_id),
            self.w_feat,
            np.asarray(word_ids, dtype=np.int32) if self.use_emb else None,
            self.w_emb if self.use_emb else None,
            self.lin_n if self.use_emb else None,
            self.lin_b if self.use_emb else None,
        )
        path = decode(em, self.a, self.viterbi)
        return [self.idx2label[int(i)] for i in path]

    # ------------------------------------------------------------- storage
    #
    # Dictionaries are stored as numpy unicode arrays in ID ORDER (ids are
    # dense 0..n-1 by construction — first-seen order, sighan_ner.py:78-105;
    # features2idx additionally has _OOV_=0 first). Loading is then one
    # contiguous buffer read + a zip — ~10x cheaper in time and allocation
    # churn than parsing a 240k-entry JSON dict, which matters because
    # every Spark python worker loads this file (32 concurrent loaders
    # contended badly on allocation before this format).

    @staticmethod
    def _dict_to_arr(d: Dict[str, int]) -> np.ndarray:
        keys = [None] * len(d)
        for k, v in d.items():
            keys[v] = k
        return np.array(keys, dtype=np.str_)

    def save(self, path: str | Path) -> None:
        arrays = {
            "w_feat": self.w_feat,
            "a": self.a,
            "feat_keys": self._dict_to_arr(self.features2idx),
            "word_keys": self._dict_to_arr(self.words2idx),
            "label_keys": self._dict_to_arr(self.labels2idx),
        }
        if self.use_emb:
            arrays.update(w_emb=self.w_emb, lin_n=self.lin_n, lin_b=self.lin_b)
        meta = {"use_emb": self.use_emb, "viterbi": self.viterbi, "mode": self.mode}
        np.savez_compressed(
            path, meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8), **arrays
        )

    @classmethod
    def load(cls, path: str | Path) -> "NerWeights":
        z = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(z["meta"]).decode())
        if "feat_keys" in z:
            f2i = {k: i for i, k in enumerate(z["feat_keys"].tolist())}
            w2i = {k: i for i, k in enumerate(z["word_keys"].tolist())}
            l2i = {k: i for i, k in enumerate(z["label_keys"].tolist())}
        else:  # legacy JSON format
            f2i = meta["features2idx"]
            w2i = meta["words2idx"]
            l2i = meta["labels2idx"]
        return cls(
            features2idx=f2i,
            words2idx=w2i,
            labels2idx=l2i,
            w_feat=z["w_feat"].astype(np.float32),
            a=z["a"].astype(np.float32),
            w_emb=z["w_emb"].astype(np.float32) if "w_emb" in z else None,
            lin_n=z["lin_n"].astype(np.float32) if "lin_n" in z else None,
            lin_b=z["lin_b"].astype(np.float32) if "lin_b" in z else None,
            use_emb=meta["use_emb"],
            viterbi=meta["viterbi"],
            mode=meta.get("mode", "char"),
        )
