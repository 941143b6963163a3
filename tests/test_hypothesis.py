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


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(st.lists(st.text(alphabet="abcz", min_size=1,
                                      max_size=4), min_size=0, max_size=30),
                     min_size=0, max_size=12),
       k=st.integers(min_value=1, max_value=9))
def test_token_window_segments_matches_python(docs, k):
    import pyarrow as pa
    from destor_ray.pipelines.curation import token_window_segments
    texts = [" ".join(d) for d in docs]
    seg, doc_rep, seg_idx = token_window_segments(
        pa.array(texts, pa.string()), k)
    got = list(zip(doc_rep.tolist(), seg_idx.tolist(), seg.to_pylist()))
    want = []
    for i, t in enumerate(texts):
        toks = t.split(" ")  # NB: "" splits to [""], matching Arrow/SQL
        for j in range(-(-len(toks) // k)):
            want.append((i, j, " ".join(toks[j * k:(j + 1) * k])))
    assert got == want


@settings(max_examples=25, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                               st.integers(min_value=-1000, max_value=1000)),
                     min_size=0, max_size=60),
       w=st.integers(min_value=1, max_value=7))
def test_segmented_rolling_sum_matches_pandas(rows, w):
    import pandas as pd
    from destor_ray.pipelines.streaming import segmented_rolling_sum
    rows = sorted(rows)  # sort by key (frame order = input order per key)
    keys = np.array([r[0] for r in rows], dtype=np.int64)
    vals = np.array([r[1] for r in rows], dtype=np.int64)
    roll_sum, roll_n = segmented_rolling_sum(keys, vals, w)
    if len(rows):
        s = pd.Series(vals)
        g = s.groupby(keys)
        want_sum = g.rolling(w, min_periods=1).sum().reset_index(drop=True)
        want_n = g.rolling(w, min_periods=1).count().reset_index(drop=True)
        assert roll_sum.tolist() == want_sum.astype(int).tolist()
        assert roll_n.tolist() == want_n.astype(int).tolist()
    else:
        assert len(roll_sum) == 0 and len(roll_n) == 0


# ---- round-3 codec property round trips (any shape, any content) ----

_img = st.integers(min_value=1, max_value=40)


@settings(max_examples=15, deadline=None)
@given(h=_img, w=_img, seed=st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    import numpy as np
    from destor_ray import bmp
    px = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)
    for topdown in (False, True):
        assert np.array_equal(bmp.decode(bmp.encode(px, topdown)), px)


@settings(max_examples=15, deadline=None)
@given(h=_img, w=_img, seed=st.integers(0, 2**31 - 1))
def test_netpbm_roundtrip_property(h, w, seed):
    import numpy as np
    from destor_ray import netpbm
    px = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(netpbm.decode(netpbm.encode(px)), px)


@settings(max_examples=12, deadline=None)
@given(h=_img, w=_img, seed=st.integers(0, 2**31 - 1),
       comp=st.sampled_from(["none", "packbits", "lzw", "deflate"]),
       rps=st.sampled_from([0, 3, 7]))
def test_tiff_roundtrip_property(h, w, seed, comp, rps):
    import numpy as np
    from destor_ray import tiff
    px = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)
    d = tiff.encode(px, compression=comp, rows_per_strip=rps)
    assert np.array_equal(tiff.decode(d), px)


@settings(max_examples=12, deadline=None)
@given(h=_img, w=_img, seed=st.integers(0, 2**31 - 1),
       sg=st.booleans(), runs=st.booleans(),
       flatness=st.integers(1, 8))
def test_webp_roundtrip_property(h, w, seed, sg, runs, flatness):
    """VP8L round trip over content from noise to heavy runs (the
    flatness divisor quantizes pixels so LZ77 runs actually fire)."""
    import numpy as np
    from destor_ray import webp
    px = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)
    px = (px // flatness) * flatness
    d = webp.encode(px, subtract_green=sg, use_runs=runs)
    assert np.array_equal(webp.decode(d), px)
