"""Hash kernels used across the engine.

All hashing is deterministic and seed-derived — never RNG at run time —
so task retries reproduce identical results (SURVEY.md §7.4.6; mirrors
the reference's hash-derived sampling, e.g.
/root/reference/src/index/sampling_method.c:188-189).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants — public-domain PRNG finalizer (Steele et al.)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 -> well-mixed uint64."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64)
        z = (z + _SM_GAMMA) & _MASK64
        z = ((z ^ (z >> np.uint64(30))) * _SM_M1) & _MASK64
        z = ((z ^ (z >> np.uint64(27))) * _SM_M2) & _MASK64
        return z ^ (z >> np.uint64(31))


def mix_u64(x, salt: int = 0) -> np.ndarray:
    """Salted 64-bit mix; used to derive independent hash families."""
    return splitmix64(np.asarray(x, dtype=np.uint64) ^ splitmix64(np.uint64(salt & 0xFFFFFFFFFFFFFFFF)))


def sha1_hex(data: bytes) -> str:
    return hashlib.sha1(data).hexdigest()


def sha1_hex_batch(payloads) -> list[str]:
    """SHA-1 per element of a binary column (hashlib releases the GIL for
    large buffers; per-batch loop is the hot path, batches run in parallel
    tasks)."""
    return [hashlib.sha1(p).hexdigest() for p in payloads]


def sha1_u64_batch(payloads) -> np.ndarray:
    """First 8 bytes of SHA-1 as uint64 (big-endian, like memcmp order on
    the reference's 20-byte fingerprints, /root/reference/src/destor.h:285)."""
    out = np.empty(len(payloads), dtype=np.uint64)
    for i, p in enumerate(payloads):
        out[i] = int.from_bytes(hashlib.sha1(p).digest()[:8], "big")
    return out


# ---------------------------------------------------------------------------
# Vectorized polynomial rolling hash over byte arrays (for shingles)
# ---------------------------------------------------------------------------

_POLY_BASE = np.uint64(1099511628211)  # FNV prime; good 64-bit mixing base


def char_shingles_u64(text: str, k: int = 5) -> np.ndarray:
    """All k-char shingle hashes of a string as uint64[n-k+1] (empty → []).

    Polynomial rolling hash over UTF-8 bytes with a final splitmix64 mix.
    Fully vectorized: k shifted multiply-adds over the byte array.
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return byte_shingles_u64(b, k)


def byte_shingles_u64(b: np.ndarray, k: int) -> np.ndarray:
    n = len(b)
    if n < k:
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        b = np.pad(b, (0, k - n))
        n = k
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = (acc * _POLY_BASE + b[j:n - k + 1 + j].astype(np.uint64)) & _MASK64
    return splitmix64(acc)


def word_tokens(text: str) -> list[str]:
    return text.split()


def word_shingles_u64(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    hs = np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
         for t in toks],
        dtype=np.uint64,
    )
    n = len(hs)
    if n < k:
        k = n
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = (acc * _POLY_BASE + hs[j:n - k + 1 + j]) & _MASK64
    return splitmix64(acc)
