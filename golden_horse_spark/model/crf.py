"""Order-1 linear-chain CRF: emission assembly, decoding, training.

Semantics re-derived from the reference model chips (no code copied):

* Emission (neural_lib.py:348-380 ``ComputeFeature``): stack a zero pad row
  under the feature-weight matrix so padded feature ids are no-ops; the
  per-token emission is the sum of its feature rows; when ``use_emb`` the
  window-embedding linear transform output is added
  (neural_lib.py:311-345,394-449; win=1 default, crf_ner.py:278).
* Decode (neural_lib.py:592-695 ``OrderOneCrf``): recursion
  ``f_[j,k] = prev[j] + obs[k] + A[j,k]``; the forward score is
  ``max_j f_`` when the viterbi flag is set, else ``logsumexp_j f_`` —
  and the DEFAULT flag is False (StackConfig '_viterbi'→False,
  neural_lib.py:189), while backpointers are ``argmax_j f_`` regardless.
  Init ``alpha_0 = emission[0]``; terminal state ``argmax(alpha_T)``;
  reverse backtrace. We replicate the hybrid exactly (float32, like
  theano config.floatX) for output parity.
* Training loss (neural_lib.py:696-725): ``-(gold_path_score - logZ)``;
  optimized here with exact forward-backward gradients + SGD
  (train_util.py:267-286), which is mathematically identical to the
  reference's autodiff of the same objective.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

F32 = np.float32


# ---------------------------------------------------------------- emission


def pad_features(feat_ids: Sequence[Sequence[int]], pad_id: int) -> np.ndarray:
    """Ragged per-token feature-id lists → (T, Fmax) int32, padded with
    ``pad_id`` (= featsize, the zero row; train_util.py:193-206)."""
    t = len(feat_ids)
    fmax = max((len(f) for f in feat_ids), default=1) or 1
    out = np.full((t, fmax), pad_id, dtype=np.int32)
    for i, f in enumerate(feat_ids):
        out[i, : len(f)] = f
    return out


def emission_scores(
    feat_pad: np.ndarray,
    fw: np.ndarray,
    word_ids: np.ndarray | None = None,
    w_emb: np.ndarray | None = None,
    lin_n: np.ndarray | None = None,
    lin_b: np.ndarray | None = None,
) -> np.ndarray:
    """(T, Fmax) padded ids → (T, K) emission potentials.

    ``fw`` is (featsize+1, K) with the LAST row zeros (the pad row).
    Embedding term: ``W_emb[word_ids] @ N + b`` (win=1)."""
    em = fw[feat_pad].sum(axis=1)
    if w_emb is not None and word_ids is not None:
        em = em + w_emb[word_ids] @ lin_n + lin_b
    return em.astype(F32, copy=False)


# ----------------------------------------------------------------- decode


def decode(emission: np.ndarray, a: np.ndarray, viterbi: bool = False) -> np.ndarray:
    """Reference-faithful hybrid decode → (T,) int32 label ids.

    With viterbi=False (the shipped default) alpha uses logsumexp while
    backpointers stay argmax — see module docstring.
    """
    em = emission.astype(F32, copy=False)
    a = a.astype(F32, copy=False)
    t_len, k = em.shape
    if t_len == 1:
        return np.array([int(em[0].argmax())], dtype=np.int32)
    alpha = em[0]
    bps = np.empty((t_len - 1, k), dtype=np.int32)
    for t in range(1, t_len):
        f = alpha[:, None] + a + em[t][None, :]  # (j, k)
        bps[t - 1] = f.argmax(axis=0)
        if viterbi:
            alpha = f.max(axis=0)
        else:
            m = f.max(axis=0)
            alpha = m + np.log(np.exp(f - m[None, :]).sum(axis=0), dtype=F32)
    path = np.empty(t_len, dtype=np.int32)
    path[-1] = int(alpha.argmax())
    for t in range(t_len - 2, -1, -1):
        path[t] = bps[t, path[t + 1]]
    return path


def decode_order_zero(emission: np.ndarray) -> np.ndarray:
    """Order-zero CRF decode: per-token softmax argmax (no transitions).

    The reference ships an ``OrderZeroCrf`` chip (neural_lib.py:562-590)
    whose compute is vestigial — its output is ``T.zeros_like`` and its
    score reads one softmax entry — i.e. the class is a stub the paper's
    configs never select. This implements the order-zero semantics the
    name denotes: independent per-token classification. Equivalent to
    ``decode(em, a=0)`` since zero transitions factorize the chain
    (tested)."""
    return emission.argmax(axis=1).astype(np.int32)


def order_zero_nll(emission: np.ndarray, y: np.ndarray) -> float:
    """Per-token softmax cross-entropy — the order-zero training loss
    counterpart of ``forward_backward``'s -(gold − logZ)."""
    em = emission.astype(np.float64)
    m = em.max(axis=1, keepdims=True)
    logz = m[:, 0] + np.log(np.exp(em - m).sum(axis=1))
    return float((logz - em[np.arange(len(y)), y]).sum())


def decode_batch(
    emissions: np.ndarray, lengths: np.ndarray, a: np.ndarray, viterbi: bool = False
) -> List[np.ndarray]:
    """Vectorized across a batch of same-padded sentences.

    ``emissions``: (B, Tmax, K) float32, ``lengths``: (B,). Mirrors the
    reference's batched recursion (neural_lib.py:637-646) but masks by
    length: a finished sentence's alpha is frozen.
    Returns list of per-sentence paths (trimmed to true length).
    """
    em = emissions.astype(F32, copy=False)
    a = a.astype(F32, copy=False)
    b, tmax, k = em.shape
    alpha = em[:, 0, :].copy()
    bps = np.zeros((b, max(tmax - 1, 0), k), dtype=np.int32)
    for t in range(1, tmax):
        f = alpha[:, :, None] + a[None, :, :] + em[:, t, None, :]
        bp = f.argmax(axis=1)
        m = f.max(axis=1)
        if viterbi:
            new_alpha = m
        else:
            new_alpha = m + np.log(
                np.exp(f - m[:, None, :]).sum(axis=1), dtype=F32
            )
        active = (lengths > t)[:, None]
        alpha = np.where(active, new_alpha, alpha)
        bps[:, t - 1, :] = bp
    paths: List[np.ndarray] = []
    for i in range(b):
        t_len = int(lengths[i])
        if t_len == 1:
            paths.append(np.array([int(em[i, 0].argmax())], dtype=np.int32))
            continue
        path = np.empty(t_len, dtype=np.int32)
        path[-1] = int(alpha[i].argmax())
        for t in range(t_len - 2, -1, -1):
            path[t] = bps[i, t, path[t + 1]]
        paths.append(path)
    return paths


# --------------------------------------------------------------- training


def _logsumexp(x: np.ndarray, axis: int) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))).squeeze(axis)


def forward_backward(
    emission: np.ndarray, a: np.ndarray
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Exact CRF inference for training.

    Returns (logZ, unary marginals (T,K), pairwise marginals (T-1,K,K)).
    """
    t_len, k = emission.shape
    log_alpha = np.empty((t_len, k))
    log_beta = np.empty((t_len, k))
    log_alpha[0] = emission[0]
    for t in range(1, t_len):
        log_alpha[t] = emission[t] + _logsumexp(
            log_alpha[t - 1][:, None] + a, axis=0
        )
    log_beta[-1] = 0.0
    for t in range(t_len - 2, -1, -1):
        log_beta[t] = _logsumexp(
            a + (emission[t + 1] + log_beta[t + 1])[None, :], axis=1
        )
    log_z = float(_logsumexp(log_alpha[-1], axis=0))
    unary = np.exp(log_alpha + log_beta - log_z)
    pair = np.empty((t_len - 1, k, k))
    for t in range(t_len - 1):
        s = (
            log_alpha[t][:, None]
            + a
            + (emission[t + 1] + log_beta[t + 1])[None, :]
            - log_z
        )
        pair[t] = np.exp(s)
    return log_z, unary, pair


def gold_path_score(emission: np.ndarray, a: np.ndarray, y: np.ndarray) -> float:
    s = float(emission[np.arange(len(y)), y].sum())
    if len(y) > 1:
        s += float(a[y[:-1], y[1:]].sum())
    return s
