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


# ---------------------------------------------------------------------------
# Dictionary union / remap (A4 — jointSegNER.py:244-275): used when two
# tasks (CWS + NER) share one embedding vocabulary.
# ---------------------------------------------------------------------------


def combine_word_dicts(dict1: Dict[str, int], dict2: Dict[str, int]) -> Dict[str, int]:
    """Union keeping dict1's ids, appending dict2-only words in dict2
    iteration order (jointSegNER.py:244-251)."""
    combined = dict(dict1)
    for k in dict2:
        if k not in combined:
            combined[k] = len(combined)
    return combined


def get_index_map(dict1: Dict[str, int], dict2: Dict[str, int]) -> List[int]:
    """old-id → new-id vector for re-encoding, with the BOS/EOS specials
    mapped to the LAST two slots of dict1 (jointSegNER.py:254-268):
    idx_map[-1] = |dict1|-1, idx_map[-2] = |dict1|-2; unknown keys → 0."""
    assert len(dict1) >= len(dict2)
    idx_map = [0] * (len(dict2) + 2)
    for k, v in dict2.items():
        idx_map[v] = dict1.get(k, 0)
    idx_map[-1] = len(dict1) - 1
    idx_map[-2] = len(dict1) - 2
    return idx_map


def convert_word_idx(
    corpus_word: List[List[int]],
    idx2word_old: Dict[int, str],
    word2idx_new: Dict[str, int],
) -> List[List[int]]:
    """Re-encode a corpus from old ids to new ids (jointSegNER.py:271-275)."""
    return [[word2idx_new[idx2word_old[i]] for i in line] for line in corpus_word]
