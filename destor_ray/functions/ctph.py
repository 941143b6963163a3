"""Context-triggered piecewise hashing (CTPH) — an ssdeep/spamsum-style
fuzzy file fingerprint.

Public algorithm lineage: Tridgell's spamsum; Kornblum 2006,
"Identifying almost identical files using context triggered piecewise
hashing" (DFRWS). A file is cut into pieces wherever a 7-byte rolling
hash hits `blocksize`-conditioned trigger points, each piece folds to 6
bits via FNV, and the ≤64-char base64 digest is comparable across
files: small insertions/edits shift content but the rolling-hash
triggers RESYNCHRONIZE, so most piece hashes survive — the property
that makes a compact per-file signature usable for byte-level near-dup
detection where a fixed-offset hash dies. destor kinship: the same
content-defined-boundary idea as its CDC chunkers
(/root/reference/src/chunking/ fastcdc_chunking.c etc.), compressed to
a signature instead of a chunk list — ~100 B/file crosses the wire
versus one fingerprint per chunk.

The rolling hash here is spamsum's three-part sum:
  h1 = sum of the last 7 bytes
  h2 = weighted sum Σ (k+1)·c[i-7+1+k]   (newest byte weight 7)
  h3 = XOR_{k=0..6} (c[i-k] << 5k)  mod 2^32
(h3 is formally the recurrence h3 = (h3<<5) ^ c truncated to 32 bits;
bytes ≥7 positions back have shifted past bit 31, so the closed form
over the last 7 bytes is exact — which is what makes it vectorizable.)
A position triggers when (h1 + h2 + h3) % blocksize == blocksize - 1.

`digest()` is the vectorized numpy path; `digest_ref()` is the
straightforward scalar loop kept as the parity reference (property
test: identical output on arbitrary bytes).
"""

from __future__ import annotations

import numpy as np

SPAMSUM_LENGTH = 64          # max chars in the primary digest
MIN_BLOCKSIZE = 3
_B64 = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "abcdefghijklmnopqrstuvwxyz0123456789+/")
_WINDOW = 7
_FNV_INIT = np.uint32(0x28021967)   # spamsum's HASH_INIT
_FNV_PRIME = np.uint32(0x01000193)


def _trigger_positions(buf: np.ndarray, blocksize: int) -> np.ndarray:
    """Vectorized spamsum rolling hash → sorted trigger indices i
    (piece boundary AFTER byte i)."""
    n = len(buf)
    if n < _WINDOW:
        return np.empty(0, np.int64)
    c = buf.astype(np.uint64)
    # stacked lagged views: lag k contributes c[i-k]
    h1 = np.zeros(n, np.uint64)
    h2 = np.zeros(n, np.uint64)
    h3 = np.zeros(n, np.uint64)
    for k in range(_WINDOW):
        lagged = np.empty(n, np.uint64)
        if k:
            lagged[:k] = 0
            lagged[k:] = c[:n - k]
        else:
            lagged = c
        h1 += lagged
        h2 += np.uint64(_WINDOW - k) * lagged
        h3 ^= (lagged << np.uint64(5 * k)) & np.uint64(0xFFFFFFFF)
    total = h1 + h2 + h3
    # positions before a full window never trigger in spamsum (the
    # window must be warm); mask them out
    ok = (total % np.uint64(blocksize)) == np.uint64(blocksize - 1)
    ok[:_WINDOW - 1] = False
    return np.flatnonzero(ok).astype(np.int64)


def _piece_chars(buf: np.ndarray, cuts: np.ndarray, cap: int) -> str:
    """FNV-fold each piece [prev+1, cut] (plus the tail) to one base64
    char; at most `cap` chars — the final char covers the whole tail,
    per spamsum (the last piece absorbs everything after the cap)."""
    n = len(buf)
    bounds = [-1]
    for p in cuts:
        if len(bounds) >= cap:            # last slot: rest of file
            break
        bounds.append(int(p))
    out = []
    for bi in range(1, len(bounds)):
        seg = buf[bounds[bi - 1] + 1:bounds[bi] + 1]
        out.append(_B64[int(_fnv(seg)) & 63])
    tail = buf[bounds[-1] + 1:n]
    if len(tail) or not out:
        out.append(_B64[int(_fnv(tail)) & 63])
    return "".join(out)


def _fnv(seg: np.ndarray) -> np.uint32:
    h = _FNV_INIT
    # vectorized FNV is inherently sequential; pieces are short
    # (~blocksize bytes) and ≤64 per file, so the python loop is
    # bounded — the hot loop is _trigger_positions, which is numpy
    for b in seg.tolist():
        h = np.uint32((int(h) * int(_FNV_PRIME)) & 0xFFFFFFFF)
        h = np.uint32(int(h) ^ int(b))
    return h


def choose_blocksize(n: int) -> int:
    """Smallest 3·2^k with bs·SPAMSUM_LENGTH ≥ n (spamsum's start)."""
    bs = MIN_BLOCKSIZE
    while bs * SPAMSUM_LENGTH < n:
        bs *= 2
    return bs


def digest(data: bytes | np.ndarray) -> tuple[int, str, str]:
    """(blocksize, d1, d2): d1 = ≤64-char digest at blocksize, d2 =
    ≤32-char digest at 2·blocksize (the coarser signature ssdeep keeps
    for cross-blocksize comparison). Like spamsum, halves the
    blocksize and retries while the primary digest is shorter than
    SPAMSUM_LENGTH/2 and bs > MIN_BLOCKSIZE."""
    buf = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) \
        else data
    bs = choose_blocksize(len(buf))
    while True:
        cuts1 = _trigger_positions(buf, bs)
        d1 = _piece_chars(buf, cuts1, SPAMSUM_LENGTH)
        if len(d1) >= SPAMSUM_LENGTH // 2 or bs == MIN_BLOCKSIZE:
            break
        bs //= 2
    cuts2 = _trigger_positions(buf, 2 * bs)
    d2 = _piece_chars(buf, cuts2, SPAMSUM_LENGTH // 2)
    return bs, d1, d2


def digest_ref(data: bytes) -> tuple[int, str, str]:
    """Scalar reference implementation (parity target for digest())."""
    buf = list(data)
    n = len(buf)

    def rollrun(blocksize):
        window = [0] * _WINDOW
        h1 = h2 = h3 = 0
        cuts = []
        for i, ch in enumerate(buf):
            h2 -= h1
            h2 += _WINDOW * ch
            h1 += ch
            h1 -= window[i % _WINDOW]
            window[i % _WINDOW] = ch
            h3 = ((h3 << 5) ^ ch) & 0xFFFFFFFF
            if i >= _WINDOW - 1 and \
                    (h1 + h2 + h3) % blocksize == blocksize - 1:
                cuts.append(i)
        return cuts

    def chars(cuts, cap):
        bounds = [-1]
        for p in cuts:
            if len(bounds) >= cap:
                break
            bounds.append(p)
        out = []
        for bi in range(1, len(bounds)):
            seg = buf[bounds[bi - 1] + 1:bounds[bi] + 1]
            h = 0x28021967
            for b in seg:
                h = ((h * 0x01000193) & 0xFFFFFFFF) ^ b
            out.append(_B64[h & 63])
        tail = buf[bounds[-1] + 1:n]
        if tail or not out:
            h = 0x28021967
            for b in tail:
                h = ((h * 0x01000193) & 0xFFFFFFFF) ^ b
            out.append(_B64[h & 63])
        return "".join(out)

    bs = choose_blocksize(n)
    while True:
        d1 = chars(rollrun(bs), SPAMSUM_LENGTH)
        if len(d1) >= SPAMSUM_LENGTH // 2 or bs == MIN_BLOCKSIZE:
            break
        bs //= 2
    d2 = chars(rollrun(2 * bs), SPAMSUM_LENGTH // 2)
    return bs, d1, d2


def similarity(d1: str, d2: str) -> int:
    """0..100 digest similarity: 100·(1 − lev/(l1+l2)) — a monotone
    variant of ssdeep's scaled edit distance (ssdeep additionally
    weights substitutions 2×; the thresholding behavior is the same).
    Callers must only compare digests computed at the SAME effective
    blocksize, like ssdeep."""
    from .suffixes import levenshtein_rowdp

    if not d1 or not d2:
        return 0
    lev = int(levenshtein_rowdp(d1.encode(), d2.encode()))
    return max(0, round(100 * (1 - lev / (len(d1) + len(d2)))))
