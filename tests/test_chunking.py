"""Conformance: vectorized kernels == pure ports of the reference C
predicates (cites in destor_ray/functions/chunking.py)."""

import numpy as np
import pytest

from destor_ray.functions import chunking as ch

ALGOS = ["fixed", "rabin", "normalized_rabin", "tttd", "ae", "fastcdc"]


def _data(seed, n, low_entropy=False):
    rng = np.random.default_rng(seed)
    if low_entropy:
        return bytes(np.repeat(rng.integers(0, 4, n // 5 + 1, dtype=np.uint8), 5)[:n])
    return bytes(rng.integers(0, 256, n, dtype=np.uint8))


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("seed,n,low", [(1, 3000, False), (2, 40001, False),
                                        (3, 513, False), (4, 20000, True),
                                        (5, 100, False)])
def test_vectorized_matches_reference_port(algo, seed, n, low):
    params = ch.ChunkParams(64, 256, 1024)
    data = _data(seed, n, low)
    ref = ch.chunk_offsets_ref(data, algo, params)
    vec = ch.chunk_offsets(data, algo, params)
    assert np.array_equal(ref, vec)
    # invariants: strictly increasing, ends at len(data)
    assert vec[-1] == n
    assert np.all(np.diff(vec) > 0)


@pytest.mark.parametrize("algo", ["fastcdc", "rabin"])
def test_default_params(algo):
    params = ch.ChunkParams()
    data = _data(11, 200_000)
    ref = ch.chunk_offsets_ref(data, algo, params)
    vec = ch.chunk_offsets(data, algo, params)
    assert np.array_equal(ref, vec)
    sizes = np.diff(np.concatenate([[0], vec]))
    assert sizes.min() >= 1
    assert sizes.max() <= params.max_size


def test_min_size_respected():
    params = ch.ChunkParams(64, 256, 1024)
    data = _data(6, 5000)
    for algo in ["fastcdc", "rabin", "normalized_rabin", "tttd"]:
        cuts = ch.chunk_offsets(data, algo, params)
        sizes = np.diff(np.concatenate([[0], cuts]))
        # all chunks except possibly the last are >= min
        assert np.all(sizes[:-1] >= params.min_size)


def test_fixed_and_file_level():
    data = bytes(range(256)) * 10
    cuts = ch.chunk_offsets(data, "fixed", ch.ChunkParams(avg_size=1000))
    assert list(cuts) == [1000, 2000, 2560]
    f = ch.file_level_cuts(data)
    assert list(f) == [2560]


def test_chunk_hashes_deterministic():
    data = _data(7, 10000)
    h1 = ch.chunk_hashes(data, "fastcdc", ch.ChunkParams(64, 256, 1024))
    h2 = ch.chunk_hashes(data, "fastcdc", ch.ChunkParams(64, 256, 1024))
    assert np.array_equal(h1, h2)
    # shared prefix ⇒ shared chunk fingerprints (the dedup property)
    data2 = data[:5000] + _data(8, 5000)
    h3 = ch.chunk_hashes(data2, "fastcdc", ch.ChunkParams(64, 256, 1024))
    assert len(set(h1.tolist()) & set(h3.tolist())) > 0
