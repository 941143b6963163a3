import numpy as np

from destor_ray.functions import bloom, segmenting


def test_segment_fixed():
    fps = np.arange(10, dtype=np.uint64)
    assert list(segmenting.segment_fixed(fps, 4)) == [4, 8, 10]


def test_segment_file_defined():
    assert list(segmenting.segment_file_defined([3, 2, 5])) == [3, 5, 10]


def test_segment_content_defined_landmarks():
    # fingerprints whose low int32 ≡ 0 mod 4 are landmarks
    fps = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], dtype=np.uint64)
    cuts = segmenting.segment_content_defined(fps, divisor=4, min_chunks=2,
                                              max_chunks=100)
    # landmark at value 4 (idx 3) closes [0,3); landmark at 8 (idx 7)
    # closes [3,7); rest [7,10)
    assert list(cuts) == [3, 7, 10]


def test_segment_content_defined_min_max():
    fps = np.zeros(10, dtype=np.uint64)  # everything is a landmark
    cuts = segmenting.segment_content_defined(fps, divisor=1, min_chunks=3,
                                              max_chunks=100)
    # min_chunks forces >= 3 chunks per segment (the stream tail may be
    # shorter, as in the C end-of-stream flush)
    sizes = np.diff(np.concatenate([[0], cuts]))
    assert all(sizes[:-1] >= 3)


def test_bloom_no_false_negatives():
    bf = bloom.BloomFilter(num_bits=1 << 16)
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, 500).astype(np.uint64)
    bf.add(keys)
    assert bf.contains(keys).all()


def test_bloom_mostly_true_negatives():
    bf = bloom.BloomFilter(num_bits=1 << 20)
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2**63, 1000).astype(np.uint64)
    bf.add(keys)
    other = rng.integers(0, 2**63, 10000).astype(np.uint64)
    fp_rate = bf.contains(other).mean()
    assert fp_rate < 0.01


def test_bloom_merge_roundtrip():
    a = bloom.BloomFilter(num_bits=1 << 16)
    b = bloom.BloomFilter(num_bits=1 << 16)
    k1 = np.array([1, 2, 3], dtype=np.uint64)
    k2 = np.array([4, 5, 6], dtype=np.uint64)
    a.add(k1)
    b.add(k2)
    a.merge(b)
    assert a.contains(np.concatenate([k1, k2])).all()
    c = bloom.BloomFilter.from_bytes(a.to_bytes())
    assert c.contains(k1).all()
