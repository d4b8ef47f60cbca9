"""Dictionary building (A1-A3) and union/remap (A4)."""

from golden_horse_spark.model.dicts import (
    build_dicts,
    combine_word_dicts,
    convert_word_idx,
    get_index_map,
)
from golden_horse_spark.model.features import OOV


def test_build_dicts_first_seen_order():
    sents = [
        (list("ab"), ["O", "B-PER.NAM"]),
        (list("ba"), ["O", "O"]),
    ]
    f2i, w2i, l2i = build_dicts(sents, feature_thresh=0)
    assert f2i[OOV] == 0
    assert w2i == {"a": 0, "b": 1}
    assert l2i == {"O": 0, "B-PER.NAM": 1}
    # ids dense and first-seen ordered
    assert sorted(f2i.values()) == list(range(len(f2i)))


def test_feature_threshold_prunes():
    sents = [(list("abc"), ["O"] * 3), (list("abd"), ["O"] * 3)]
    f2i_all, _, _ = build_dicts(sents, feature_thresh=0)
    f2i_pruned, _, _ = build_dicts(sents, feature_thresh=1)
    assert len(f2i_pruned) < len(f2i_all)
    assert OOV in f2i_pruned


def test_combine_word_dicts_keeps_dict1_ids():
    d1 = {"a": 0, "b": 1}
    d2 = {"b": 0, "c": 1}
    c = combine_word_dicts(d1, d2)
    assert c["a"] == 0 and c["b"] == 1 and c["c"] == 2


def test_get_index_map_with_specials():
    d1 = {"a": 0, "b": 1, "c": 2, "<B>": 3, "<E>": 4}
    d2 = {"c": 0, "a": 1}
    m = get_index_map(d1, d2)
    assert m[0] == 2 and m[1] == 0
    assert m[-1] == 4 and m[-2] == 3  # BOS/EOS specials at tail


def test_convert_word_idx_roundtrip():
    old = {"x": 0, "y": 1}
    new = {"y": 0, "x": 1, "z": 2}
    idx2old = {v: k for k, v in old.items()}
    assert convert_word_idx([[0, 1, 1]], idx2old, new) == [[1, 0, 0]]
