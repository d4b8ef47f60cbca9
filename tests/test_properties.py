"""Property-based tests (hypothesis) for pure-python kernels whose
invariants must hold on arbitrary input, not just fixtures."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from golden_horse_spark.model.crf import decode
from golden_horse_spark.model.features import representations, token_features
from golden_horse_spark.model.segment import DagSegmenter

CHARS = st.text(
    alphabet=st.sampled_from("张三李四北京上海的了一是在" + string.ascii_letters + "01 ，。"),
    min_size=0,
    max_size=40,
)

LEX = {"北京": 50, "上海": 40, "张三": 10, "李四": 10, "北京上海": 5}
SEG = DagSegmenter(LEX)


@given(CHARS)
@settings(max_examples=200, deadline=None)
def test_segmenter_partitions_input(s):
    """cut() must partition the input exactly: concatenation round-trips
    and every piece is non-empty."""
    words = SEG.cut(s)
    assert "".join(words) == s
    assert all(words)


@given(CHARS)
@settings(max_examples=200, deadline=None)
def test_charpos_representation_is_length_preserving(s):
    chars = list(s)
    reprs = representations(chars, "charpos", segmenter=SEG)
    assert len(reprs) == len(chars)
    # every repr = original char + decimal position
    for c, r in zip(chars, reprs):
        assert r.startswith(c)
        assert r[len(c):].isdigit()


@given(CHARS)
@settings(max_examples=100, deadline=None)
def test_featurizer_shape_and_edges(s):
    chars = list(s)
    feats = token_features(chars)
    assert len(feats) == len(chars)
    if chars:
        assert "__BOS__" in feats[0]
        assert "__EOS__" in feats[-1]
        # unigram w[0] always present (never truncated)
        assert all(any(f.startswith("w[0]=") for f in fs) for fs in feats)


@given(
    st.integers(min_value=1, max_value=6),   # sentence length
    st.integers(min_value=2, max_value=4),   # label count
    st.randoms(use_true_random=False),
)
@settings(max_examples=100, deadline=None)
def test_decode_beats_or_equals_random_paths_under_viterbi(t_len, k, rnd):
    """With viterbi=True the decoded path's score must be >= the score of
    any random path (it is the argmax by construction)."""
    import numpy as np

    rng = np.random.RandomState(rnd.randint(0, 2**31 - 1))
    em = rng.randn(t_len, k).astype(np.float32)
    a = rng.randn(k, k).astype(np.float32)

    def score(path):
        s = sum(em[i, p] for i, p in enumerate(path))
        s += sum(a[path[i], path[i + 1]] for i in range(len(path) - 1))
        return s

    best = decode(em, a, viterbi=True)
    best_score = score(best)
    for _ in range(25):
        rand_path = [rng.randint(k) for _ in range(t_len)]
        assert best_score >= score(rand_path) - 1e-4


def _two_stage():
    from golden_horse_spark.model.segment import default_segmenter

    return default_segmenter()


@given(CHARS)
@settings(max_examples=200, deadline=None)
def test_two_stage_segmenter_partitions_input(s):
    """The calibrated DAG+HMM segmenter must also partition exactly —
    including the HMM fan-out path over single-char runs and the
    han/non-han block splitting inside it."""
    words = _two_stage().cut(s)
    assert "".join(words) == s
    assert all(words)


@given(st.text(min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_two_stage_segmenter_arbitrary_unicode(s):
    """No crash and exact coverage on ARBITRARY unicode (emoji,
    surrogates-adjacent, control chars — web text is hostile)."""
    words = _two_stage().cut(s)
    assert "".join(words) == s


@given(CHARS)
@settings(max_examples=100, deadline=None)
def test_two_stage_charpos_length_preserving(s):
    chars = list(s)
    reprs = representations(chars, "charpos", segmenter=_two_stage())
    assert len(reprs) == len(chars)


# ---------------------------------------------- round-4 pure kernels

GIF_SYMS = st.lists(st.integers(min_value=0, max_value=15), min_size=1,
                    max_size=600)


@given(GIF_SYMS)
@settings(max_examples=150, deadline=None)
def test_gif_lzw_roundtrip_arbitrary_sequences(seq):
    """encode→decode is the identity for any symbol stream (including
    degenerate runs that force KwKwK codes and width bumps)."""
    import numpy as np

    from golden_horse_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    data = _gif_lzw_encode(np.asarray(seq, dtype=np.int64), 4)
    assert _gif_lzw_decode(data, 4) == seq


WORDS = st.lists(
    st.text(alphabet=st.sampled_from("abcd"), min_size=1, max_size=6),
    min_size=1,
    max_size=25,
)


@given(WORDS, st.integers(min_value=0, max_value=12))
@settings(max_examples=150, deadline=None)
def test_bpe_encode_is_lossless_for_any_merge_table(words, n_ranks):
    """The greedy encoder never loses or reorders characters, whatever
    the (possibly nonsensical) merge table says."""
    from golden_horse_spark.operators.tokenize import EOW, _encode_word

    # synthesize a merge table from adjacent fragments of the words
    ranks = {}
    for w in words:
        for i in range(len(w) - 1):
            if len(ranks) >= n_ranks:
                break
            ranks.setdefault((w[i], w[i + 1]), len(ranks))
    for w in words:
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + EOW
        assert all(toks)
