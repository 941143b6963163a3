"""HyperLogLog cardinality sketch — the shuffle-free distinct counter a
100 TB pipeline needs where destor keeps an exact in-memory fingerprint
index (/root/reference/src/index/index.c — exact lookup is the point
there; HERE the question "how many distinct fingerprints / tokens does
this corpus hold" must be answerable WITHOUT materializing the key set
or an all-to-all groupby).

Flajolet et al. 2007 (public paper). Mergeable by register-wise max, so
per-batch partials tree-reduce exactly like the Bloom filter's OR:
each map task sketches its blocks locally and only 2^p bytes per task
ever move. Standard bias handling: linear counting in the small range,
no large-range correction needed with 64-bit hashes.

Vectorized end-to-end: the register index is the top p hash bits, the
rank is computed with an exact 6-pass binary bit-length (no float
log2 — float rounding near powers of two would flip ranks and make the
sketch input-order-stable but platform-fragile), and register updates
use np.maximum.at.
"""

from __future__ import annotations

import numpy as np


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized int.bit_length for uint64 (0 -> 0)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    r = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        r[big] += s
        x[big] >>= np.uint64(s)
    return r + (x > 0)


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, keys: np.ndarray) -> None:
        """keys: uint64 hash values (already well-mixed)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if not len(keys):
            return
        idx = (keys >> np.uint64(64 - self.p)).astype(np.intp)
        w = keys & np.uint64((1 << (64 - self.p)) - 1)
        rank = ((64 - self.p) - bit_length_u64(w) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        if self.m >= 128:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        else:
            alpha = {16: 0.673, 32: 0.697, 64: 0.709}[self.m]
        e = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting (small range)
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        reg = np.frombuffer(data, dtype=np.uint8)
        p = int(len(reg)).bit_length() - 1
        h = cls(p=p)
        h.registers = reg.copy()
        return h
