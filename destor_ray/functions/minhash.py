"""MinHash / SimHash signatures and LSH banding.

The reference's feature-sampling + feature-kv-store similarity lookup
(/root/reference/src/index/similarity_detection.c,
 src/index/sampling_method.c:12-75 min-sampling ≙ bottom-k MinHash) is
re-expressed as signature columns + a salted band-hash groupby shuffle
(SURVEY.md §2.5 D3/D4).
"""

from __future__ import annotations

import numpy as np

from .hashing import mix_u64, splitmix64

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def minhash_signature(hashes: np.ndarray, num_perms: int = 64, seed: int = 0x5EED) -> np.ndarray:
    """k-perm MinHash of a uint64 hash set (one permutation per slot via
    salted splitmix64 rehash). Empty input → all EMPTY_SENTINEL."""
    sig = np.full(num_perms, EMPTY_SENTINEL, dtype=np.uint64)
    if len(hashes) == 0:
        return sig
    h = np.asarray(hashes, dtype=np.uint64)
    for i in range(num_perms):
        sig[i] = mix_u64(h, seed + i).min()
    return sig


def minhash_signatures_flat(hashes: np.ndarray, offsets: np.ndarray,
                            num_perms: int = 64, seed: int = 0x5EED) -> np.ndarray:
    """Batched MinHash: `hashes` is the concatenation of per-row hash sets,
    `offsets` (len n+1) delimits rows. Returns (n, num_perms) uint64.

    Vectorized with np.minimum.reduceat per permutation — no per-row
    Python loop over the batch.
    """
    n = len(offsets) - 1
    out = np.full((n, num_perms), EMPTY_SENTINEL, dtype=np.uint64)
    if len(hashes) == 0:
        return out
    h = np.asarray(hashes, dtype=np.uint64)
    starts = np.asarray(offsets[:-1])
    nonempty = np.asarray(offsets[1:]) > starts
    red_idx = starts[nonempty]  # strictly increasing; empty sets excluded so
    # consecutive nonempty starts delimit exactly one set each
    for i in range(num_perms):
        mixed = mix_u64(h, seed + i)
        mins = np.minimum.reduceat(mixed, red_idx)
        out[nonempty, i] = mins
    return out


def bottomk_signature(hashes: np.ndarray, k: int = 64, seed: int = 0x5EED) -> np.ndarray:
    """Bottom-k MinHash — the direct analog of the reference's min
    sampling (sampling_method.c:12-75: keep the k minimal fingerprints).
    Returns sorted uint64[<=k] of distinct mixed hashes."""
    if len(hashes) == 0:
        return np.empty(0, dtype=np.uint64)
    mixed = np.unique(mix_u64(np.asarray(hashes, dtype=np.uint64), seed))
    return mixed[:k]


def simhash64(hashes: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash of a uint64 hash multiset."""
    if len(hashes) == 0:
        return np.uint64(0)
    h = np.asarray(hashes, dtype=np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    w = np.ones(len(h), dtype=np.int64) if weights is None else np.asarray(weights, dtype=np.int64)
    score = (w[:, None] * (2 * bits - 1)).sum(axis=0)
    val = np.uint64(0)
    for b in range(64):
        if score[b] > 0:
            val |= np.uint64(1) << np.uint64(b)
    return val


def simhash64_flat(hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Batched SimHash over flattened per-row hash sets → uint64[n]."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(hashes) == 0:
        return out
    h = np.asarray(hashes, dtype=np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    pm = 2 * bits - 1  # (m, 64) in {-1, +1}
    csum = np.zeros((len(h) + 1, 64), dtype=np.int64)
    np.cumsum(pm, axis=0, out=csum[1:])
    seg = csum[offsets[1:]] - csum[offsets[:-1]]  # (n, 64) bit scores
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return ((seg > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


def band_keys(sig: np.ndarray, num_bands: int, rows_per_band: int,
              seed: int = 0xBA2D) -> np.ndarray:
    """LSH band hashes of (n, num_perms) MinHash signatures →
    (n, num_bands) uint64. Each band hashes `rows_per_band` signature
    slots together; two rows collide on a band iff those slots all match."""
    n, p = sig.shape
    assert num_bands * rows_per_band <= p
    out = np.empty((n, num_bands), dtype=np.uint64)
    for b in range(num_bands):
        acc = np.full(n, splitmix64(np.uint64(seed + b)), dtype=np.uint64)
        for r in range(rows_per_band):
            acc = mix_u64(acc ^ sig[:, b * rows_per_band + r], seed * 31 + b * rows_per_band + r)
        out[:, b] = acc
    return out


def hamming_band_keys(codes: np.ndarray, num_bands: int = 8, seed: int = 0x51A4) -> np.ndarray:
    """Band keys for 64-bit Hamming codes (phash / SimHash): split into
    `num_bands` contiguous bit-fields; by pigeonhole, two codes within
    Hamming distance < num_bands share at least one band. Band value is
    mixed with the band index so different bands never collide."""
    c = np.asarray(codes).astype(np.int64).view(np.uint64)
    n = len(c)
    bits = 64 // num_bands
    mask = (np.uint64(1) << np.uint64(bits)) - np.uint64(1)
    out = np.empty((n, num_bands), dtype=np.uint64)
    for b in range(num_bands):
        field = (c >> np.uint64(b * bits)) & mask
        out[:, b] = mix_u64(field, seed + b)
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two uint64 hash sets."""
    sa, sb = set(np.asarray(a, dtype=np.uint64).tolist()), set(np.asarray(b, dtype=np.uint64).tolist())
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 1.0


def minhash_jaccard_est(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Jaccard estimate from equal-length MinHash signatures."""
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))
