"""Feature-sampling methods — faithful ports of the reference's four
policies (/root/reference/src/index/sampling_method.c, SURVEY.md §2.4).

A "fingerprint" here is a uint64 (first 8 bytes, big-endian, of the
chunk SHA-1) — comparison order matches the reference's memcmp over the
20-byte fingerprint prefix. Features are returned as sorted uint64
arrays (the reference returns an unordered GHashTable set; sorted makes
results deterministic for tests).
"""

from __future__ import annotations

import numpy as np

# empty-segment guard sentinels (sampling_method.c:67-73,198-205,230-237)
EMPTY_MIN = np.uint64(0xFFFFFFFFFFFFFFFF)   # memset 0xff
EMPTY_RANDOM = np.uint64(0)                 # memset 0x00
EMPTY_UNIFORM = np.uint64(0)


def _feature_num(chunk_num: int, ratio: int) -> int:
    """sampling_method.c:14-23: ceil-with-half-rounding of n/ratio."""
    if ratio == 0 or chunk_num <= ratio:
        return 1
    remain = chunk_num % ratio
    feature_num = chunk_num // ratio
    if remain * 2 > ratio:
        feature_num += 1
    return feature_num


def sample_min(fps: np.ndarray, ratio: int) -> np.ndarray:
    """Min sampling (sampling_method.c:12-75): the feature_num smallest
    fingerprints, as a set."""
    fps = np.asarray(fps, dtype=np.uint64)
    if len(fps) == 0:
        return np.asarray([EMPTY_MIN], dtype=np.uint64)
    k = _feature_num(len(fps), ratio)
    return np.unique(np.sort(fps)[:k])


def sample_optimized_min(fps: np.ndarray, ratio: int, off: int = 8) -> np.ndarray:
    """Optimized-min sampling (sampling_method.c:80-169): anchors are the
    feature_num smallest fps; the emitted feature for an anchor at stream
    index j is the fingerprint `off` positions earlier (the first
    fingerprint when j < off)."""
    fps = np.asarray(fps, dtype=np.uint64)
    n = len(fps)
    if n == 0:
        return np.asarray([EMPTY_MIN], dtype=np.uint64)
    k = _feature_num(n, ratio)
    # anchor selection keeps the k smallest by insertion; ties broken by
    # arrival order — replicate via stable argsort
    order = np.argsort(fps, kind="stable")[:k]
    cand_idx = np.where(order >= off, order - off, 0)
    return np.unique(fps[cand_idx])


def sample_random(fps: np.ndarray, ratio: int) -> np.ndarray:
    """Random (modulo) sampling (sampling_method.c:174-207): feature iff
    int32 at fingerprint bytes [16:20] ≡ 0 (mod ratio). Our uint64
    fingerprints don't carry bytes 16-20 of the SHA-1; the engine applies
    the predicate to the low 32 bits (same distributional semantics,
    deterministic)."""
    fps = np.asarray(fps, dtype=np.uint64)
    low32 = (fps & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    sel = fps[(low32 % np.uint32(ratio)) == 0]
    if len(sel) == 0:
        return np.asarray([EMPTY_RANDOM], dtype=np.uint64)
    return np.unique(sel)


def sample_uniform(fps: np.ndarray, ratio: int) -> np.ndarray:
    """Uniform sampling (sampling_method.c:209-239): every ratio-th chunk.
    ratio=1 keeps every fingerprint — the DDFS exact-index configuration
    (index.c:103-109)."""
    fps = np.asarray(fps, dtype=np.uint64)
    if len(fps) == 0:
        return np.asarray([EMPTY_UNIFORM], dtype=np.uint64)
    return np.unique(fps[::ratio])


SAMPLERS = {
    "min": sample_min,
    "optimized_min": sample_optimized_min,
    "random": sample_random,
    "uniform": sample_uniform,
}


def sample_features(fps: np.ndarray, method: str = "min", ratio: int = 32) -> np.ndarray:
    return SAMPLERS[method](fps, ratio)


def select_champions(candidates: dict[int, set], k: int) -> list[int]:
    """Greedy top-k champion selection with feature-trim between picks —
    port of top_segment_select (similarity_detection.c:49-126).

    `candidates` maps segment id → set of shared features. Order: most
    shared features first, ties broken by *larger* id first
    (g_segment_cmp_feature_num, similarity_detection.c:22-30). After each
    pick, the champion's features are removed from the remaining
    candidates and the ranking re-evaluated.
    """
    live = {sid: set(feats) for sid, feats in candidates.items()}
    chosen: list[int] = []
    while live and len(chosen) < k:
        best = max(live.items(), key=lambda kv: (len(kv[1]), kv[0]))
        sid, feats = best
        chosen.append(sid)
        del live[sid]
        for other in live.values():
            other -= feats
    return chosen
