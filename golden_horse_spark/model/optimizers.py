"""Stateful NumPy optimizers for the distributed trainer — exact ports
of the reference's update rules (reference theano_src/train_util.py:
adadelta 289-352, rmsprop 356-424), plus the AdaGrad fallback.

The reference splits each optimizer into f_cost (stores the gradient and
updates running-average state) and f_update (applies the step). Both are
always called once per update there, so each ``step()`` here performs
the f_cost state update followed by the f_update parameter update —
the composed rule is identical sequence-for-sequence:

AdaDelta (Zeiler 2012, the reference's constants):
    rg2 ← 0.95·rg2 + 0.05·g²                      (f_cost)
    ud  = −√(ru2 + 1e−6)/√(rg2 + 1e−6) · g        (f_update)
    ru2 ← 0.95·ru2 + 0.05·ud²
    p   ← p + ud
    (the lr argument is ignored, as in the reference)

RMSProp (Hinton lecture 6a, the reference's constants):
    rg  ← 0.95·rg  + 0.05·g                        (f_cost)
    rg2 ← 0.95·rg2 + 0.05·g²
    ud  ← 0.9·ud − 1e−4·g/√(rg2 − rg² + 1e−4)      (f_update)
    p   ← p + ud
    (fixed 1e−4 step embedded in the rule, as in the reference)
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class AdaGrad:
    """Per-parameter adaptive step: p ← p − lr·g/√(Σg² + 1e−8).

    Not a reference optimizer — kept as the batch-GD default because its
    single knob (lr) is the easiest to reason about for full-batch
    gradients; see spark_train.train_ner_spark."""

    def __init__(self, lr: float = 0.5):
        self.lr = lr
        self.acc: List[np.ndarray] | None = None

    def step(self, params: Sequence[np.ndarray], grads: Sequence[np.ndarray]):
        if self.acc is None:
            self.acc = [np.zeros_like(g) for g in grads]
        for p, g, ac in zip(params, grads, self.acc):
            ac += g * g
            p -= self.lr * g / np.sqrt(ac + 1e-8)


class AdaDelta:
    """Exact port of the reference adadelta (train_util.py:289-352)."""

    def __init__(self, lr: float = 0.05):
        self.lr = lr  # ignored, mirroring the reference's unused lr input
        self.rg2: List[np.ndarray] | None = None
        self.ru2: List[np.ndarray] | None = None

    def step(self, params: Sequence[np.ndarray], grads: Sequence[np.ndarray]):
        if self.rg2 is None:
            self.rg2 = [np.zeros_like(g) for g in grads]
            self.ru2 = [np.zeros_like(g) for g in grads]
        for i, (p, g) in enumerate(zip(params, grads)):
            self.rg2[i] = 0.95 * self.rg2[i] + 0.05 * g * g
            ud = -np.sqrt(self.ru2[i] + 1e-6) / np.sqrt(self.rg2[i] + 1e-6) * g
            self.ru2[i] = 0.95 * self.ru2[i] + 0.05 * ud * ud
            p += ud


class RMSProp:
    """Exact port of the reference rmsprop (train_util.py:356-424)."""

    def __init__(self, lr: float = 0.05):
        self.lr = lr  # ignored, mirroring the reference's unused lr input
        self.rg: List[np.ndarray] | None = None
        self.rg2: List[np.ndarray] | None = None
        self.ud: List[np.ndarray] | None = None

    def step(self, params: Sequence[np.ndarray], grads: Sequence[np.ndarray]):
        if self.rg is None:
            self.rg = [np.zeros_like(g) for g in grads]
            self.rg2 = [np.zeros_like(g) for g in grads]
            self.ud = [np.zeros_like(g) for g in grads]
        for i, (p, g) in enumerate(zip(params, grads)):
            self.rg[i] = 0.95 * self.rg[i] + 0.05 * g
            self.rg2[i] = 0.95 * self.rg2[i] + 0.05 * g * g
            self.ud[i] = 0.9 * self.ud[i] - 1e-4 * g / np.sqrt(
                self.rg2[i] - self.rg[i] ** 2 + 1e-4
            )
            p += self.ud[i]


OPTIMIZERS = {"adagrad": AdaGrad, "adadelta": AdaDelta, "rmsprop": RMSProp}


def make_optimizer(name: str, lr: float):
    try:
        return OPTIMIZERS[name](lr)
    except KeyError:
        raise ValueError(
            f"unknown optimizer {name!r}; one of {sorted(OPTIMIZERS)}"
        ) from None
