"""Dictionary construction (feature / word / label → id).

Semantics from create_dicts (sighan_ner.py:36-106):
* built over train + valid + test (closed vocabulary over eval splits);
* feature dict: count ESCAPED feature frequency over the whole corpus,
  keep features with freq > feature_thresh (default 0), assign ids in
  first-seen order starting at 1, with ``_OOV_`` = 0;
* word dict: first-seen order over the representation column, ids from 0;
* label dict: first-seen order over labels, ids from 0.

First-seen order matters only if reference-trained weight matrices are
loaded (row order = id order); our own training fixture preserves it too
so the id scheme is uniform. A distributed (Spark) variant for web-scale
vocabularies lives in operators/dict_build.py.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

from .features import OOV, escaped_token_features, representations

Sentence = Tuple[Sequence[str], Sequence[str]]  # (chars, labels)


def build_dicts(
    sentences: List[Sentence],
    feature_thresh: int = 0,
    mode: str = "char",
) -> Tuple[Dict[str, int], Dict[str, int], Dict[str, int]]:
    all_feats: List[List[List[str]]] = []
    words2idx: Dict[str, int] = {}
    labels2idx: Dict[str, int] = {}
    freq: Dict[str, int] = defaultdict(int)

    for chars, labels in sentences:
        feats = escaped_token_features(chars)
        all_feats.append(feats)
        for fs in feats:
            for f in fs:
                freq[f] += 1
        for r in representations(chars, mode):
            if r not in words2idx:
                words2idx[r] = len(words2idx)
        for lb in labels:
            if lb not in labels2idx:
                labels2idx[lb] = len(labels2idx)

    features2idx: Dict[str, int] = {OOV: 0}
    for feats in all_feats:
        for fs in feats:
            for f in fs:
                if f not in features2idx and freq[f] > feature_thresh:
                    features2idx[f] = len(features2idx)
    return features2idx, words2idx, labels2idx
