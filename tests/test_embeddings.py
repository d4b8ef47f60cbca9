"""Embedding I/O (S5/S8) and context windows (B1)."""

import numpy as np

from golden_horse_spark.model.embeddings import (
    context_window,
    read_embeddings,
    windowed_embeddings,
    write_embeddings,
)


def test_read_embeddings_normalizes_and_inits(tmp_path):
    f = tmp_path / "emb.txt"
    f.write_text("2 3\n你 3.0 0.0 4.0\n好 1.0 1.0 1.0\n", encoding="utf-8")
    dic = {"你": 0, "好": 1, "咱": 2}
    m, idx_map = read_embeddings(f, dic)
    assert m.shape == (5, 3)  # |dic| + 2 specials
    np.testing.assert_allclose(
        m[0], np.array([0.6, 0.0, 0.8]) * np.sqrt(1 / 3), rtol=1e-6
    )
    assert idx_map == {0: 0, 1: 1}
    # absent word keeps one-sided-uniform init in [0, 1/dim)
    assert (m[2] >= 0).all() and (m[2] < 1 / 3 + 1e-6).all()


def test_roundtrip_write_read(tmp_path):
    dic = {"a": 0, "b": 1}
    m0 = np.array([[1.0, 0.0], [0.0, 2.0], [0.1, 0.1], [0.2, 0.2]], dtype=np.float32)
    write_embeddings(tmp_path / "w.txt", m0, {0: "a", 1: "b"})
    m, idx_map = read_embeddings(tmp_path / "w.txt", dic)
    # rows come back L2-normalized * sqrt(1/3)
    np.testing.assert_allclose(m[0], [np.sqrt(1 / 3), 0.0], rtol=1e-6)
    assert set(idx_map) == {0, 1}


def test_context_window_padding():
    w = context_window([10, 11, 12], -1, 1)
    assert w.tolist() == [[-2, 10, 11], [10, 11, 12], [11, 12, -1]]
    # win=1 degenerates to the identity column
    assert context_window([5, 6], 0, 0).tolist() == [[5], [6]]


def test_windowed_embeddings_uses_tail_specials():
    m = np.arange(10, dtype=np.float32).reshape(5, 2)  # rows 3,4 = specials
    out = windowed_embeddings([0], m, -1, 1)
    # window [-2, 0, -1] -> rows 3, 0, 4 flattened
    np.testing.assert_allclose(out[0], [6, 7, 0, 1, 8, 9])
