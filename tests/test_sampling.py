"""Port-parity tests for the feature-sampling policies
(/root/reference/src/index/sampling_method.c)."""

import numpy as np

from destor_ray.functions import sampling as sp


def test_feature_num_rounding_rule():
    # sampling_method.c:14-23: n/ratio with +1 when remainder*2 > ratio
    assert sp._feature_num(100, 32) == 3
    assert sp._feature_num(110, 32) == 3   # remainder 14, 28 <= 32
    assert sp._feature_num(117, 32) == 4   # remainder 21, 42 > 32
    assert sp._feature_num(10, 32) == 1
    assert sp._feature_num(64, 0) == 1


def test_min_sampling_is_bottom_k():
    fps = np.array([50, 10, 40, 30, 20, 10], dtype=np.uint64)
    # n=6, ratio=2 → k=3 → candidates [10,10,20] (duplicates kept, as in the
    # C GSequence) → feature set {10, 20}
    out = sp.sample_min(fps, 2)
    assert list(out) == [10, 20]


def test_min_sampling_empty_guard():
    out = sp.sample_min(np.empty(0, dtype=np.uint64), 4)
    assert list(out) == [sp.EMPTY_MIN]


def test_optimized_min_uses_offset_candidate():
    # anchors = smallest fps; emitted = fp 8 positions earlier (or fps[0])
    fps = np.arange(100, 0, -1, dtype=np.uint64)  # descending: smallest at end
    out = sp.sample_optimized_min(fps, 50)  # k=2 → anchors at idx 98,99 (values 2,1)
    assert list(out) == [9, 10]  # fps[90]=10, fps[91]=9


def test_optimized_min_early_anchor_falls_back_to_first():
    fps = np.array([7, 3, 9], dtype=np.uint64)  # anchor 3 at idx 1 < off → cand = fps[0]
    out = sp.sample_optimized_min(fps, 0)
    assert list(out) == [7]


def test_random_sampling_modulo():
    fps = np.arange(0, 1000, dtype=np.uint64)
    out = sp.sample_random(fps, 10)
    assert all(int(v) % 10 == 0 for v in out)
    assert len(out) == 100


def test_uniform_sampling_stride():
    fps = np.arange(100, dtype=np.uint64)
    out = sp.sample_uniform(fps, 10)
    assert list(out) == list(range(0, 100, 10))
    # ratio=1 == DDFS all-fingerprints (index.c:103-109)
    assert len(sp.sample_uniform(fps, 1)) == 100


def test_select_champions_greedy_trim():
    # port of top_segment_select (similarity_detection.c:49-126)
    cands = {
        1: {"a", "b", "c"},
        2: {"a", "b"},
        3: {"d", "e"},
    }
    # pick 1 (3 shared); trim a,b,c → 2:{}, 3:{d,e}; pick 3
    assert sp.select_champions(cands, 2) == [1, 3]


def test_select_champions_tie_larger_id_first():
    cands = {1: {"a"}, 2: {"b"}}
    assert sp.select_champions(cands, 1) == [2]
