"""Chinese word segmentation (ACL'16 path) corpus operators — semantics
re-derived from icwb.py (SURVEY.md §2.1 S3, §2.3 T4-T6, §2.2 P6-P8,
§2.4 F4, §2.10 E5-E6).

These are the pure functions; the Spark form wraps ``cws_tokenize_line``
in a pandas UDF exactly like the NER featurizer (not duplicated here —
the CWS *training* path is out of MVP scope per SURVEY.md §2.11, but the
corpus/feature semantics are first-class and tested).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Set, Tuple

from .normalize import URL_PATTERN, char_class, q2b
from .sentence_seg import segment_sentences

_URL_RE = re.compile(URL_PATTERN)


def cws_tokenize_line(
    line: str,
    labeled: bool = True,
    charpos: Optional[List[str]] = None,
) -> List[Tuple[List[str], List[str]]]:
    """One space-segmented corpus line → [(x, y)] per sentence.

    Reference: icwb.py:133-199 ``read_file``:
    * sentence-segment, Q2B-normalize, whitespace-split into words;
    * a word that collapses to 'URL' is a single token labeled S-word;
    * per char: non-hanzi chars are REPLACED by their class symbol
      (P/N/D/E/S); hanzi keep the char (or the charpos repr if given);
    * BIES word-boundary labels: single-char word S-word, first B-word,
      last E-word, else I-word; unlabeled corpora get 'N';
    * sentences shorter than 2 tokens dropped.
    """
    out: List[Tuple[List[str], List[str]]] = []
    pointer = 0
    for sent, _off in segment_sentences(line.strip()):
        sent = q2b(sent)
        words = sent.strip().split()
        if not words:
            continue
        x: List[str] = []
        y: List[str] = []
        for wd in words:
            wd2 = _URL_RE.sub("URL", wd)
            if wd2 == "URL":
                x.append("URL")
                y.append("S-word")
                continue
            for i, ch in enumerate(wd2):
                rep = char_class(ch)
                if rep != "O":
                    x.append(rep)
                elif charpos is not None:
                    x.append(charpos[pointer])
                else:
                    x.append(ch)
                pointer += 1
                if not labeled:
                    y.append("N")
                elif len(wd2) == 1:
                    y.append("S-word")
                elif i == 0:
                    y.append("B-word")
                elif i == len(wd2) - 1:
                    y.append("E-word")
                else:
                    y.append("I-word")
        if len(x) < 2:  # icwb.py:191-192
            continue
        out.append((x, y))
    return out


def gazetteer_features(
    corpus_x: List[Sequence[str]],
    name_set: Set[str],
    max_name_size: int,
    name_len_thresh: int = 5,
    strip_pos: bool = True,
) -> List[List[Dict[str, int]]]:
    """InName features (icwb.py:208-236): at each position try substring
    lengths 1..max, BREAK on the first (shortest) match; matched span
    positions get ``_InName_`` and ``_InName_<pnt>`` (pnt < thresh).
    ``strip_pos`` drops the trailing charpos digit (icwb.py:214)."""
    features: List[List[Dict[str, int]]] = []
    for x in corpus_x:
        chars = [e[:-1] for e in x] if strip_pos else list(x)
        ftv: List[Dict[str, int]] = [dict() for _ in chars]
        n = len(chars)
        for i in range(n):
            for j in range(1, max_name_size + 1):
                if i + j > n:
                    break
                word = "".join(chars[i : i + j])
                if word in name_set:
                    for pnt in range(j):
                        if pnt < name_len_thresh:
                            ftv[i + pnt][f"_InName_{pnt}"] = 1
                        ftv[i + pnt]["_InName_"] = 1
                    break
        features.append(ftv)
    return features


def filter_maxlen(corpus, maxlen: Optional[int]):
    """Drop sentences with len(x) >= maxlen (icwb.py:296-308)."""
    if not maxlen:
        return list(corpus)
    return [(x, y) for x, y in corpus if len(x) < maxlen]


def remove_unk(id_corpus: List[List[int]], n_words: int) -> List[List[int]]:
    """Word ids >= n_words → 1 (icwb.py:330-331)."""
    return [[1 if w >= n_words else w for w in sent] for sent in id_corpus]


def tail_valid_split(corpus: list, valid_portion: float) -> Tuple[list, list]:
    """Deterministic tail split (icwb.py:310-328 — NOT random: the
    permutation is commented out in the reference)."""
    n = len(corpus)
    n_train = int(round(n * (1.0 - valid_portion)))
    return corpus[:n_train], corpus[n_train:]


def reconstruct_segmentation(chars: Sequence[str], labels: Sequence[str]) -> str:
    """Re-insert word boundaries from B-/S- labels (icwb.py:395-404
    ``append_line``): a boundary ('  ') precedes every B-/S- token."""
    parts: List[str] = []
    for ch, lb in zip(chars, labels):
        if lb.startswith("B-") or lb.startswith("S-"):
            parts.append("  ")
        parts.append(ch)
    return "".join(parts)


def conll_reduplication_flags(tokens: List[str]) -> List[Tuple[str, str, str, str]]:
    """E6 ``quick_convert`` (icwb.py:427-449): per token emit (char,
    class, AABB flag, ABAB flag) where AABB = same char as previous,
    ABAB = same char as two back."""
    out = []
    for i, tok in enumerate(tokens):
        aabb = "Y" if i > 0 and tok[0] == tokens[i - 1][0] else "N"
        abab = "Y" if i > 1 and tok[0] == tokens[i - 2][0] else "N"
        out.append((tok[0], char_class(tok[0]), aabb, abab))
    return out
