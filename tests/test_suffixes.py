"""Suffix-array / winnowing kernels (functions/suffixes.py) and the
substring-fingerprint pipelines (pipelines/substring.py).

Kernels are checked against naive references (sorted-suffix order,
pairwise LCP, O(n·m) DP longest common substring); the winnowing
guarantee (shared substring >= gram+window-1 ⇒ shared fingerprint) is
property-tested with planted substrings; lcs_pairs is verified against
the brute-force DP over ALL document pairs of a small corpus."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from destor_ray.functions import suffixes

SF = "/root/testdata/sf0.001"


def _naive_sa(s: np.ndarray) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:].tobytes())


def _lcs_dp(a: bytes, b: bytes) -> int:
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=64),
       st.integers(min_value=1, max_value=4))
def test_suffix_array_matches_naive(data, alpha):
    s = (np.frombuffer(data, dtype=np.uint8) % alpha).astype(np.uint8)
    sa = suffixes.suffix_array(s)
    assert list(sa) == _naive_sa(s)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=48),
       st.integers(min_value=1, max_value=3))
def test_lcp_kasai_matches_pairwise(data, alpha):
    s = (np.frombuffer(data, dtype=np.uint8) % alpha).astype(np.uint8)
    sa = suffixes.suffix_array(s)
    lcp = suffixes.lcp_kasai(s, sa)
    for i in range(1, len(s)):
        a = s[sa[i - 1]:].tobytes()
        b = s[sa[i]:].tobytes()
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        assert lcp[i] == k
    if len(s):
        assert lcp[0] == 0


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=40), st.binary(min_size=0, max_size=40),
       st.integers(min_value=1, max_value=3))
def test_lcs_matches_dp(a, b, alpha):
    av = bytes((np.frombuffer(a, dtype=np.uint8) % alpha).astype(np.uint8))
    bv = bytes((np.frombuffer(b, dtype=np.uint8) % alpha).astype(np.uint8))
    assert suffixes.longest_common_substring_len(av, bv) == _lcs_dp(av, bv)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=24, max_size=24), st.binary(min_size=0, max_size=60),
       st.binary(min_size=0, max_size=60), st.binary(min_size=0, max_size=60),
       st.binary(min_size=0, max_size=60))
def test_winnow_guarantee(shared, p1, p2, p3, p4):
    # any two streams sharing a 24-byte substring (gram 16 + window 9 - 1)
    # must share >= 1 winnowing fingerprint
    a = p1 + shared + p2
    b = p3 + shared + p4
    fa = suffixes.winnow_fingerprints(a, 16, 9)
    fb = suffixes.winnow_fingerprints(b, 16, 9)
    assert len(np.intersect1d(fa, fb)) >= 1


def test_winnow_short_and_empty():
    assert len(suffixes.winnow_fingerprints(b"", 16, 9)) == 0
    assert len(suffixes.winnow_fingerprints(b"short", 16, 9)) == 0
    one = suffixes.winnow_fingerprints(b"x" * 16, 16, 9)
    assert len(one) == 1


def test_lcs_pairs_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from destor_ray.pipelines.substring import lcs_pairs
    out = lcs_pairs(SF, min_len=24).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    texts = {d["doc_id"]: d["text"].encode() for d in docs}
    # exact membership predicate, independently of the pipeline:
    # LCS(a,b) >= 24  ⟺  a and b share a 24-gram (all pairs, set-based)
    grams = {did: {t[i:i + 24] for i in range(len(t) - 23)}
             for did, t in texts.items()}
    ids = sorted(texts)
    member = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if grams[ids[i]] & grams[ids[j]]:
                member.add((ids[i], ids[j]))
    got = {(int(r.left_id), int(r.right_id)): int(r.lcs_len)
           for r in out.itertuples()}
    assert set(got) == member
    assert len(member) > 0  # the corpus must actually exercise the path
    # exact DP length check on every reported pair
    for (l, r), n in got.items():
        assert n == _lcs_dp(texts[l], texts[r])


def test_common_substring_pairs_nonempty(ray_session):
    from destor_ray.pipelines.substring import common_substring_pairs
    out = common_substring_pairs(SF, min_len=24).to_pandas()
    assert len(out) > 0
    assert (out["n_shared"] >= 1).all()
    assert (out["left_id"] < out["right_id"]).all()


def test_levenshtein_rowdp_matches_bruteforce():
    import random

    from destor_ray.functions.suffixes import levenshtein_rowdp

    def ref(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1,
                              m[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return m[len(a)][len(b)]

    rng = random.Random(11)
    for _ in range(200):
        a = bytes(rng.choices(b"abcd ", k=rng.randint(0, 16)))
        b = bytes(rng.choices(b"abcd ", k=rng.randint(0, 16)))
        assert levenshtein_rowdp(a, b) == ref(a, b), (a, b)
    assert levenshtein_rowdp(b"", b"xyz") == 3
    assert levenshtein_rowdp(b"kitten", b"sitting") == 3
