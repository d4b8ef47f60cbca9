"""Embedding matrix I/O and context windows (SURVEY.md §2.1 S5/S8,
§2.6 B1).

Semantics re-derived from the reference loaders (train_util.py:90-113,
155-168, 208-262):

* text format: header ``rows dim``, then ``word v1..vd`` per line;
* matrix initialized one-sided-uniform × (1/dim) for ALL of |dic|+2 rows
  (the +2 tail rows are the BOS/EOS specials that the context window's
  -2/-1 pad ids address from the end);
* each in-vocabulary file row is L2-normalized then scaled by sqrt(1/3);
* out-of-file vocabulary words keep their random init (fine-tuned later);
* context window: pad ids -2 (left) and -1 (right) index those tail rows.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence, Tuple

import numpy as np


def read_embeddings(
    path: str | Path, dic: Dict[str, int], seed: int = 1
) -> Tuple[np.ndarray, Dict[int, int]]:
    """(matrix (|dic|+2, dim) float32, {dict_idx: file_line}) — reference
    ``read_matrix_from_file`` semantics with a seeded init (the reference
    seeds numpy globally, neural_lib.py:13)."""
    rng = np.random.RandomState(seed)
    with open(path, encoding="utf-8", errors="ignore") as f:
        header = f.readline().rstrip().split()
        dim = int(header[1])
        multiplier = np.sqrt(1.0 / 3)
        m = (rng.rand(len(dic) + 2, dim) * (1.0 / dim)).astype(np.float32)
        idx_map: Dict[int, int] = {}
        for line_no, line in enumerate(f):
            elems = line.rstrip().split(" ")
            if elems[0] in dic:
                idx = dic[elems[0]]
                r = np.array([float(e) for e in elems[1:]], dtype=np.float32)
                m[idx] = (r / np.linalg.norm(r)) * multiplier
                idx_map[idx] = line_no
    return m, idx_map


def write_embeddings(
    path: str | Path, matrix: np.ndarray, idx2word: Dict[int, str]
) -> None:
    """S8 ``write_matrix_to_file`` (train_util.py:155-168)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"{len(idx2word)} {matrix.shape[1]}\n")
        for idx in sorted(idx2word):
            vec = " ".join(repr(float(v)) for v in matrix[idx])
            f.write(f"{idx2word[idx]} {vec}\n")


def context_window(ids: Sequence[int], win_l: int, win_r: int) -> np.ndarray:
    """B1 ``_contextwin``/``conv_x`` (train_util.py:208-262): pad left
    with -2, right with -1, slide a (win_r-win_l+1) window → (len, win)
    int32. Negative pad ids address the two tail rows of the embedding
    matrix."""
    assert win_l <= 0 <= win_r
    win = win_r - win_l + 1
    padded = [-2] * (-win_l) + list(ids) + [-1] * win_r
    return np.array(
        [padded[i : i + win] for i in range(len(ids))], dtype=np.int32
    )


def windowed_embeddings(
    ids: Sequence[int], m: np.ndarray, win_l: int, win_r: int
) -> np.ndarray:
    """Embedding lookup over context windows → (len, win·dim) float32
    (the Embedding chip's reshape, neural_lib.py:311-345)."""
    w = context_window(ids, win_l, win_r)
    return m[w].reshape(len(w), -1).astype(np.float32)
