"""CRFsuite-style n-gram window featurizer.

Semantics derived from the reference featurizer
(/root/reference/theano_src/weiboNER_features.py:15-34,84-109,146-153 and
sighan_ner.py:23-34,140-168,311-322):

* 10 templates over the raw-character field ``w``: unigrams at offsets
  -2..2 and bigrams (-2,-1) (-1,0) (0,1) (1,2) (-1,1).
* A template whose window falls off either sentence edge emits NOTHING
  (truncate, not pad) — weiboNER_features.py:103-106.
* Feature string format: ``"w[-2]|w[-1]=v1|v2"``.
* ``__BOS__`` appended to token 0, ``__EOS__`` to the last token, AFTER
  template application — weiboNER_features.py:150-152.
* Colons escaped as ``__COLON__`` before any dict interaction —
  weiboNER_features.py:111-120, sighan_ner.py:68.
* Token representations (sighan_ner.py:140-168): ``char`` → the char
  itself; ``charpos`` → char + str(index-in-jieba-word); ``word`` → the
  enclosing jieba word. jieba is optional in this container, so charpos
  and word are gated behind an import-try.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

OOV = "_OOV_"
BOS_FEAT = "__BOS__"
EOS_FEAT = "__EOS__"

# (name, tuple-of-offsets) — unigram and bigram windows over the char field.
# Names precomputed so the hot loop does no string formatting for the name.
_TEMPLATE_OFFSETS: Tuple[Tuple[int, ...], ...] = (
    (-2,),
    (-1,),
    (0,),
    (1,),
    (2,),
    (-2, -1),
    (-1, 0),
    (0, 1),
    (1, 2),
    (-1, 1),
)
TEMPLATES: Tuple[Tuple[str, Tuple[int, ...]], ...] = tuple(
    ("|".join("w[%d]" % o for o in offs), offs) for offs in _TEMPLATE_OFFSETS
)


def escape_feature(feature: str) -> str:
    """':' → '__COLON__' (weiboNER_features.py:111-120)."""
    return feature.replace(":", "__COLON__")


_FALLBACK_SEG = None


def _fallback_segmenter():
    """Resolve the no-argument segmenter ONCE per process (round 6): the
    per-call ``import jieba`` attempt re-scanned sys.path on every
    sentence when jieba is absent (a failed import is not negatively
    cached) — ~6% of the whole NER kernel in profile. Same preference
    order as before: jieba when importable, else the calibrated
    reference-asset segmenter."""
    global _FALLBACK_SEG
    if _FALLBACK_SEG is None:
        try:
            import jieba  # type: ignore  # pragma: no cover

            _FALLBACK_SEG = jieba  # pragma: no cover
        except ImportError:
            from .segment import default_segmenter

            _FALLBACK_SEG = default_segmenter()
    return _FALLBACK_SEG


def token_features(chars: Sequence[str]) -> List[List[str]]:
    """Per-token UNESCAPED feature strings for one sentence.

    Mirrors apply_templates + BOS/EOS append
    (weiboNER_features.py:84-109,146-153).
    """
    n = len(chars)
    feats: List[List[str]] = [[] for _ in range(n)]
    for name, offs in TEMPLATES:
        lo = -min(offs)  # first t where all offsets are in range
        hi = n - max(offs)  # one past last valid t
        prefix = name + "="
        if len(offs) == 1:
            o0 = offs[0]
            for t in range(max(lo, 0), min(hi, n)):
                feats[t].append(prefix + chars[t + o0])
        else:  # every multi-offset template is a bigram — direct concat
            # instead of a generator+join (round-6 kernel shave)
            o0, o1 = offs
            for t in range(max(lo, 0), min(hi, n)):
                feats[t].append(prefix + chars[t + o0] + "|" + chars[t + o1])
    if n:
        feats[0].append(BOS_FEAT)
        feats[-1].append(EOS_FEAT)
    return feats


def escaped_token_features(chars: Sequence[str]) -> List[List[str]]:
    """Escaped per-token features (what dict building/lookup sees)."""
    return [[escape_feature(f) for f in fs] for fs in token_features(chars)]


def representations(
    chars: Sequence[str], mode: str = "char", segmenter=None
) -> List[str]:
    """Token representation column (sighan_ner.py:140-168).

    ``char``: identity. ``charpos``/``word`` need a word segmenter: an
    explicit ``segmenter`` (any object with ``cut(str) -> List[str]``),
    else jieba when importable (the reference pins 0.37, README.md:90),
    else the dictionary-DAG segmenter built from the reference's own
    assets (model/segment.py; 0.99 charpos agreement with the golden
    jieba-0.37 dumps — documented deviation).
    """
    if mode == "char":
        return list(chars)
    if segmenter is None:
        segmenter = _fallback_segmenter()
    sent = "".join(chars)
    out: List[str] = []
    for word in segmenter.cut(sent):
        for i, _ch in enumerate(word):
            out.append(word if mode == "word" else _ch + str(i))
    if len(out) != len(chars):  # pragma: no cover
        raise ValueError("segmentation changed character count")
    return out


def encode_sentence(
    chars: Sequence[str],
    features2idx: dict,
    words2idx: dict,
    mode: str = "char",
    reprs: Optional[Sequence[str]] = None,
) -> Tuple[List[List[int]], List[int]]:
    """chars → (per-token feature-id lists, word ids).

    Reference: conll_feature_extract (sighan_ner.py:324-364).
    * unknown feature → dropped; token left with zero features → [_OOV_]=0
      (sighan_ner.py:346-350)
    * OOV word → reference draws random.randint(0, |V|-1) with a module-
      level seed (sighan_ner.py:21,333); we deterministically map to 0
      (documented deviation, SURVEY.md §7.0.3 — never triggered on the
      closed-vocab eval splits because dicts include test).
    """
    if reprs is None:
        reprs = representations(chars, mode)
    word_ids = [words2idx.get(r, 0) for r in reprs]
    feat_ids: List[List[int]] = []
    oov_id = features2idx.get(OOV, 0)
    get_id = features2idx.get
    for fs in token_features(chars):
        # one dict probe per feature instead of membership + index
        # (round-6 kernel shave; None sentinel is safe — ids are ints)
        ids = [
            i
            for i in (get_id(f.replace(":", "__COLON__")) for f in fs)
            if i is not None
        ]
        if not ids:
            ids = [oov_id]
        feat_ids.append(ids)
    return feat_ids, word_ids
