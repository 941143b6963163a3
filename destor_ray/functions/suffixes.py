"""Suffix-array substring fingerprints.

The north-star signature inventory lists three channels: MinHash,
SimHash, and suffix-array substring fingerprints. This module supplies
the third: exact substring machinery (suffix array + LCP) for verify
steps, and winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
— the MOSS scheme) for the scalable candidate channel.

All kernels are numpy-vectorized except Kasai's LCP walk, which is
O(n) sequential by construction and only runs on per-pair verify
inputs (two documents), never on the corpus hot path.

Winnowing guarantee (the property the candidate channel relies on):
with gram width L and window w, any two byte streams sharing a common
substring of length >= L + w - 1 select at least one identical
fingerprint VALUE — the shared substring contains a full window of
identical gram hashes, whose minimum is selected in both. Hash
collisions can only ADD spurious shared fingerprints (pruned by the
exact verify), never remove the guaranteed one.
"""

from __future__ import annotations

import numpy as np

from .hashing import _MASK64, _POLY_BASE, splitmix64


def suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (Manber–Myers) with numpy lexsort:
    O(n log^2 n), fully vectorized. `seq` is any integer array (uint8
    bytes or a widened alphabet with separator sentinels). Returns
    int64[n] of suffix start positions in lexicographic suffix order."""
    n = len(seq)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(seq, dtype=np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all ranks distinct → done
            return order.astype(np.int64)
        k *= 2


def lcp_kasai(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai's LCP array: lcp[i] = length of the longest common prefix of
    suffixes sa[i-1] and sa[i] (lcp[0] = 0). O(n) total; the inner while
    advances a global cursor at most 2n times."""
    n = len(seq)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = int(sa[r - 1])
            while i + h < n and j + h < n and seq[i + h] == seq[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: bytes | np.ndarray, b: bytes | np.ndarray) -> int:
    """Exact longest-common-substring length between two byte strings via
    a generalized suffix array: concatenate with a separator outside the
    byte alphabet (value 256, so the array is widened to int64), build
    SA + LCP, and take the max LCP between lexicographically-adjacent
    suffixes that start on opposite sides of the separator."""
    av = np.frombuffer(a, dtype=np.uint8) if isinstance(a, (bytes, bytearray)) else np.asarray(a, dtype=np.uint8)
    bv = np.frombuffer(b, dtype=np.uint8) if isinstance(b, (bytes, bytearray)) else np.asarray(b, dtype=np.uint8)
    la = len(av)
    if la == 0 or len(bv) == 0:
        return 0
    seq = np.concatenate([av.astype(np.int64), np.array([256], dtype=np.int64),
                          bv.astype(np.int64)])
    sa = suffix_array(seq)
    lcp = lcp_kasai(seq, sa)
    side = sa < la  # suffixes starting in `a` (the separator suffix never
    # contributes: its first byte 256 exceeds the alphabet so any LCP
    # through it is 0 anyway, and LCPs are capped by the separator)
    sep_side = sa == la
    cross = (side[1:] != side[:-1]) & ~sep_side[1:] & ~sep_side[:-1]
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


def gram_hashes_u64(b: np.ndarray, L: int) -> np.ndarray:
    """Rolling polynomial hashes of ALL L-byte grams of `b` (uint8 array):
    uint64[n-L+1]; strictly empty when n < L (no padding — winnowing
    semantics require real grams only)."""
    n = len(b)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    acc = np.zeros(n - L + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(L):
            acc = (acc * _POLY_BASE + b[j: n - L + 1 + j].astype(np.uint64)) & _MASK64
    return splitmix64(acc)


def winnow_fingerprints(data: bytes | str | np.ndarray, gram: int = 16,
                        window: int = 9) -> np.ndarray:
    """Winnowing substring fingerprints: the unique window-minimum gram
    hashes (sorted uint64). Guarantee: two inputs sharing a common
    substring of length >= gram + window - 1 share >= 1 fingerprint.
    Density ~ 2/(window+1) of all grams, so the candidate channel ships
    O(n/w) keys per document instead of O(n)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    if isinstance(data, (bytes, bytearray)):
        data = np.frombuffer(data, dtype=np.uint8)
    hs = gram_hashes_u64(data, gram)
    m = len(hs)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    if m <= window:
        return np.unique(hs.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
    return np.unique(mins)


def levenshtein_rowdp(a: bytes, b: bytes) -> int:
    """Exact Levenshtein distance via the vectorized two-row DP.

    The inner row update has a sequential left-neighbor (deletion)
    dependency; it is removed with the classic scan identity
        d[j] = j_cost + min_{k<=j} (m[k] - k_cost)
    (m = row after substitution/insertion only), so each of the
    len(a) iterations is pure numpy over len(b) cells — no Python
    inner loop. O(len(a)·len(b)) work, O(len(b)) memory."""
    import numpy as np

    if a == b:
        return 0
    bv = np.frombuffer(b, dtype=np.uint8).astype(np.int32)
    n = len(bv)
    prev = np.arange(n + 1, dtype=np.int32)
    idx = np.arange(1, n + 1, dtype=np.int32)
    cur = np.empty(n + 1, dtype=np.int32)
    for i, ca in enumerate(a, start=1):
        cost = (bv != ca).astype(np.int32)
        # substitution / insertion candidates
        m = np.minimum(prev[:-1] + cost, prev[1:] + 1)
        # deletion (left) dependency folded in via a prefix-min scan:
        # cur[j] = min(m[j], min_{k<j}(cur[k] + (j-k)))
        #        = j + min over prefix of (candidate - position)
        head = np.concatenate(([np.int32(i)], m - idx))
        cur[:] = np.minimum.accumulate(head) + np.arange(n + 1,
                                                         dtype=np.int32)
        cur[0] = i
        prev, cur = cur, prev
    return int(prev[-1])
