"""Property-based conformance (hypothesis): the vectorized chunker
kernels equal the C-port on arbitrary byte strings, and signature
invariants hold for arbitrary hash sets."""

import numpy as np
from hypothesis import given, settings, strategies as st

from destor_ray.functions import chunking as ch
from destor_ray.functions import minhash, sampling

PARAMS = ch.ChunkParams(64, 256, 1024)
ALGOS = ["fixed", "rabin", "normalized_rabin", "tttd", "ae", "fastcdc"]


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=8000),
       algo=st.sampled_from(ALGOS))
def test_chunker_vec_equals_port(data, algo):
    ref = ch.chunk_offsets_ref(data, algo, PARAMS)
    vec = ch.chunk_offsets(data, algo, PARAMS)
    assert np.array_equal(ref, vec)


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=1, max_size=8000))
def test_cuts_partition_the_buffer(data):
    cuts = ch.chunk_offsets(data, "fastcdc", PARAMS)
    assert cuts[-1] == len(data)
    assert np.all(np.diff(cuts) > 0)
    sizes = np.diff(np.concatenate([[0], cuts]))
    assert sizes.max() <= PARAMS.max_size


@settings(max_examples=25, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                     min_size=0, max_size=200))
def test_minhash_permutation_invariant(vals):
    a = np.array(vals, dtype=np.uint64)
    rng = np.random.default_rng(0)
    b = a.copy()
    rng.shuffle(b)
    assert np.array_equal(minhash.minhash_signature(a, 16),
                          minhash.minhash_signature(b, 16))


@settings(max_examples=25, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                     min_size=1, max_size=200),
       ratio=st.integers(min_value=1, max_value=64))
def test_sampling_subset_property(vals, ratio):
    fps = np.array(vals, dtype=np.uint64)
    for method in ["min", "random", "uniform"]:
        out = sampling.sample_features(fps, method, ratio)
        # every feature is either from the input or the empty-guard sentinel
        sset = set(fps.tolist())
        for f in out.tolist():
            assert f in sset or f in (0, 0xFFFFFFFFFFFFFFFF)
