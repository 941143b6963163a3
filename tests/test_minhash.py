import numpy as np

from destor_ray.functions import hashing, minhash


def _set(seed, n):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, n).astype(np.uint64)


def test_minhash_flat_matches_single():
    sets = [_set(i, 50 + i) for i in range(4)] + [np.empty(0, dtype=np.uint64)]
    offs = np.zeros(len(sets) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=offs[1:])
    flat = np.concatenate(sets)
    batch = minhash.minhash_signatures_flat(flat, offs, 32)
    for i, s in enumerate(sets):
        single = minhash.minhash_signature(s, 32)
        assert np.array_equal(batch[i], single)


def test_minhash_estimates_jaccard():
    a = _set(1, 500)
    b = np.concatenate([a[:250], _set(2, 250)])  # true J ≈ 250/750
    sa = minhash.minhash_signature(a, 256)
    sb = minhash.minhash_signature(b, 256)
    est = minhash.minhash_jaccard_est(sa, sb)
    true = minhash.jaccard(a, b)
    assert abs(est - true) < 0.1


def test_simhash_flat_matches_single():
    sets = [_set(i + 10, 30) for i in range(3)]
    offs = np.zeros(len(sets) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=offs[1:])
    batch = minhash.simhash64_flat(np.concatenate(sets), offs)
    for i, s in enumerate(sets):
        assert batch[i] == minhash.simhash64(s)


def test_band_keys_identical_sets_collide():
    a = _set(3, 100)
    sig = minhash.minhash_signature(a, 64).reshape(1, -1)
    k1 = minhash.band_keys(sig, 16, 4)
    k2 = minhash.band_keys(sig.copy(), 16, 4)
    assert np.array_equal(k1, k2)


def test_band_keys_disjoint_sets_rarely_collide():
    k1 = minhash.band_keys(minhash.minhash_signature(_set(4, 100), 64).reshape(1, -1), 16, 4)
    k2 = minhash.band_keys(minhash.minhash_signature(_set(5, 100), 64).reshape(1, -1), 16, 4)
    assert not np.intersect1d(k1, k2).size


def test_hamming_band_pigeonhole():
    """codes within hamming distance < num_bands share >= 1 band."""
    rng = np.random.default_rng(6)
    base = np.int64(rng.integers(0, 2**62))
    flipped = np.int64(int(base) ^ sum(1 << int(b) for b in rng.choice(64, 5, replace=False)))
    k = minhash.hamming_band_keys(np.array([base, flipped]), 8)
    assert len(np.intersect1d(k[0], k[1])) >= 1


def test_bottomk():
    a = np.array([5, 3, 9, 1], dtype=np.uint64)
    out = minhash.bottomk_signature(a, 2, seed=0)
    mixed = np.sort(hashing.mix_u64(a, 0))
    assert np.array_equal(out, mixed[:2])


def test_char_shingles():
    s = hashing.char_shingles_u64("hello world", 5)
    assert len(s) == len("hello world") - 4
    # shared substring ⇒ shared shingles
    s2 = hashing.char_shingles_u64("xxhello world", 5)
    assert len(np.intersect1d(s, s2)) >= len(s) - 2
