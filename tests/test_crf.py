"""CRF decode vs brute-force enumeration, batch-vs-single equivalence,
forward-backward gradient checks."""

import itertools

import numpy as np
import pytest

from golden_horse_spark.model.crf import (
    decode,
    decode_batch,
    emission_scores,
    forward_backward,
    gold_path_score,
    pad_features,
)


def _brute_force_viterbi(em, a):
    t, k = em.shape
    best, best_path = -np.inf, None
    for path in itertools.product(range(k), repeat=t):
        s = em[np.arange(t), path].sum() + a[path[:-1], path[1:]].sum()
        if s > best:
            best, best_path = s, path
    return list(best_path)


def _hybrid_reference(em, a, viterbi):
    """Independent straightforward implementation of the reference
    recursion (float64) for cross-checking the float32 production code."""
    t, k = em.shape
    alpha = em[0].astype(float)
    bps = []
    for i in range(1, t):
        f = alpha[:, None] + a + em[i][None, :]
        bps.append(f.argmax(axis=0))
        if viterbi:
            alpha = f.max(axis=0)
        else:
            m = f.max(axis=0)
            alpha = m + np.log(np.exp(f - m).sum(axis=0))
    path = [int(alpha.argmax())]
    for bp in reversed(bps):
        path.append(int(bp[path[-1]]))
    return path[::-1]


@pytest.mark.parametrize("viterbi", [True, False])
def test_decode_matches_independent_impl(viterbi):
    rng = np.random.RandomState(7)
    for _ in range(25):
        t = rng.randint(2, 7)
        k = rng.randint(2, 5)
        em = rng.randn(t, k).astype(np.float32)
        a = rng.randn(k, k).astype(np.float32)
        assert decode(em, a, viterbi).tolist() == _hybrid_reference(em, a, viterbi)


def test_viterbi_decode_matches_brute_force():
    rng = np.random.RandomState(3)
    for _ in range(10):
        t = rng.randint(2, 6)
        k = rng.randint(2, 4)
        em = rng.randn(t, k).astype(np.float32)
        a = rng.randn(k, k).astype(np.float32)
        assert decode(em, a, viterbi=True).tolist() == _brute_force_viterbi(em, a)


@pytest.mark.parametrize("viterbi", [True, False])
def test_decode_batch_matches_single(viterbi):
    rng = np.random.RandomState(11)
    k = 5
    lengths = np.array([1, 2, 5, 9, 4])
    tmax = lengths.max()
    a = rng.randn(k, k).astype(np.float32)
    em = rng.randn(len(lengths), tmax, k).astype(np.float32)
    paths = decode_batch(em, lengths, a, viterbi)
    for i, t in enumerate(lengths):
        if t == 1:
            assert paths[i].tolist() == [int(em[i, 0].argmax())]
        else:
            assert paths[i].tolist() == decode(em[i, :t], a, viterbi).tolist()


def test_emission_pad_row_is_noop():
    fw = np.vstack([np.ones((3, 2)), np.zeros((1, 2))]).astype(np.float32)
    fp = pad_features([[0, 1], [2]], pad_id=3)
    em = emission_scores(fp, fw)
    np.testing.assert_allclose(em, [[2, 2], [1, 1]])


def test_forward_backward_gradcheck():
    rng = np.random.RandomState(5)
    t, k = 4, 3
    em = rng.randn(t, k)
    a = rng.randn(k, k)
    y = rng.randint(0, k, size=t)

    def loss(em_, a_):
        log_z, _, _ = forward_backward(em_, a_)
        return log_z - gold_path_score(em_, a_, y)

    log_z, unary, pair = forward_backward(em, a)
    gold_un = np.zeros((t, k))
    gold_un[np.arange(t), y] = 1
    d_em = unary - gold_un
    d_a = pair.sum(axis=0)
    np.subtract.at(d_a, (y[:-1], y[1:]), 1)
    eps = 1e-6
    for i in range(t):
        for j in range(k):
            em2 = em.copy()
            em2[i, j] += eps
            num = (loss(em2, a) - loss(em, a)) / eps
            assert abs(num - d_em[i, j]) < 1e-4
    for i in range(k):
        for j in range(k):
            a2 = a.copy()
            a2[i, j] += eps
            num = (loss(em, a2) - loss(em, a)) / eps
            assert abs(num - d_a[i, j]) < 1e-4


def test_unary_marginals_sum_to_one():
    rng = np.random.RandomState(9)
    em = rng.randn(6, 4)
    a = rng.randn(4, 4)
    _, unary, pair = forward_backward(em, a)
    np.testing.assert_allclose(unary.sum(axis=1), 1.0, atol=1e-10)
    np.testing.assert_allclose(pair.sum(axis=(1, 2)), 1.0, atol=1e-10)
