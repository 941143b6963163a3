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


class QuantileSketch:
    """Mergeable quantile sketch (deterministic MRL/KLL-style compactor
    ladder, Manku-Rajagopalan-Lindsay 1998 / Karnin-Lang-Liberty 2016,
    public papers) — the streaming answer to "what is the p99 of this
    column" at 100 TB, where an exact quantile needs a full sort (an
    all-to-all shuffle of every row) or a value-count groupby that only
    works for low-cardinality columns.

    Level i holds a sorted buffer whose items each represent 2^i input
    rows. When a level overflows `k` items it compacts: keep every other
    element, alternating the start offset deterministically per level
    (no RNG — results are reproducible across runs; the alternation
    keeps the one-sided compaction bias from accumulating). Merging
    concatenates per level and re-compacts, so per-batch partials
    tree-reduce exactly like the HLL registers: only O(k·log(n/k))
    float64s per task ever move.

    Worst-case rank error is O(log²(n/k)/k) — for k=256 and n up to
    10^12 that is well under 1% of rank; the pytest bound asserts 2%
    against exact np.quantile ranks.
    """

    def __init__(self, k: int = 256):
        assert k >= 8 and k % 2 == 0
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._offset: list[bool] = [False]

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact_from(0)

    def _compact_from(self, i: int) -> None:
        while i < len(self.levels) and len(self.levels[i]) > self.k:
            buf = np.sort(self.levels[i], kind="stable")
            off = int(self._offset[i])
            self._offset[i] = not self._offset[i]
            if len(buf) % 2:
                # odd length: retain one end item at this level (weight
                # preserved: 1·2^i + (n-1)/2·2^(i+1) = n·2^i), alternating
                # ends so no systematic min/max bias accumulates
                keep, buf = (buf[:1], buf[1:]) if off else (buf[-1:], buf[:-1])
            else:
                keep = buf[:0]
            promoted = buf[off::2]  # every other survivor, weight doubled
            self.levels[i] = keep
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self._offset.append(False)
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        assert self.k == other.k
        for i, buf in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self._offset.append(False)
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self._compact_from(0)
        return self

    def n_items(self) -> int:
        return int(sum(len(b) << i for i, b in enumerate(self.levels)))

    def quantiles(self, qs) -> np.ndarray:
        """Weighted lower quantiles: smallest item whose cumulative
        weight reaches ceil(q * total_weight)."""
        vals = np.concatenate(self.levels) if any(len(b) for b in self.levels) \
            else np.empty(0, dtype=np.float64)
        if not len(vals):
            return np.full(len(list(qs)), np.nan)
        wts = np.concatenate([np.full(len(b), 1 << i, dtype=np.int64)
                              for i, b in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        vals, cum = vals[order], np.cumsum(wts[order])
        total = cum[-1]
        out = np.empty(len(list(qs)), dtype=np.float64)
        for j, q in enumerate(qs):
            target = max(1, int(np.ceil(q * total)))
            out[j] = vals[np.searchsorted(cum, target, side="left")]
        return out

    def to_bytes(self) -> bytes:
        import struct
        head = struct.pack("<HH", self.k, len(self.levels))
        lens = struct.pack(f"<{len(self.levels)}I",
                           *[len(b) for b in self.levels])
        offs = bytes(int(o) for o in self._offset)
        return head + lens + offs + b"".join(
            np.ascontiguousarray(b).tobytes() for b in self.levels)

    @classmethod
    def from_bytes(cls, data: bytes) -> "QuantileSketch":
        import struct
        k, nlev = struct.unpack_from("<HH", data, 0)
        lens = struct.unpack_from(f"<{nlev}I", data, 4)
        pos = 4 + 4 * nlev
        offs = data[pos:pos + nlev]
        pos += nlev
        s = cls(k=k)
        s.levels, s._offset = [], []
        for i in range(nlev):
            nb = lens[i] * 8
            s.levels.append(np.frombuffer(data, dtype=np.float64,
                                          count=lens[i], offset=pos).copy())
            s._offset.append(bool(offs[i]))
            pos += nb
        return s


def mg_compress(tokens: np.ndarray, counts: np.ndarray, capacity: int
                ) -> tuple[np.ndarray, np.ndarray, int]:
    """Misra-Gries / Space-Saving compression of an exact (token, count)
    table down to <= `capacity` counters: subtract the (capacity+1)-th
    largest count from every counter and drop the non-positive ones.

    Returns (tokens, counts, delta). The subtracted `delta` is the
    per-compression error mass: after merging any number of compressed
    partials by summing counts per token, every estimate satisfies
        true_count - sum(deltas) <= est <= true_count,
    the standard MG merge bound (Agarwal et al., "Mergeable
    Summaries", PODS'12). delta == 0 (exact) whenever the input had
    <= capacity distinct tokens."""
    if len(tokens) <= capacity:
        return tokens, counts, 0
    # (capacity+1)-th largest count via partition (O(n))
    kth = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1]
    keep = counts > kth
    return tokens[keep], counts[keep] - kth, int(kth)


class CountMinSketch:
    """Mergeable Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05):
    d independent hash rows × w counters; add folds token counts in
    vectorized (np.add.at per row), estimate = min over rows. Merging
    is elementwise + (counters are linear), which is what lets partials
    ride an ordinary Sum-style tree reduce. Guarantees: est >= true
    always (one-sided error); est <= true + eps·N w.p. 1-delta at
    w = ceil(e/eps), d = ceil(ln(1/delta)).

    Hashing: blake2b(token, digest_size=4·depth), 4 bytes per row — a
    deterministic, process-stable digest wide enough for every row to
    get independent bits (md5's 16 bytes silently cap out at depth 4;
    blake2b supports up to depth 16, enforced in __init__)."""

    def __init__(self, width: int = 2048, depth: int = 4):
        if not 1 <= int(depth) <= 16:
            raise ValueError("depth must be 1..16 (4 digest bytes/row)")
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((depth, width), np.int64)

    def _cols(self, tokens) -> np.ndarray:
        import hashlib
        out = np.empty((self.depth, len(tokens)), np.int64)
        for j, t in enumerate(tokens):
            h = hashlib.blake2b(t.encode("utf-8"),
                                digest_size=4 * self.depth).digest()
            for i in range(self.depth):
                out[i, j] = int.from_bytes(h[i * 4:i * 4 + 4], "big") \
                    % self.width
        return out

    def add(self, tokens, counts) -> None:
        cols = self._cols(tokens)
        c = np.asarray(counts, np.int64)
        for i in range(self.depth):
            np.add.at(self.table[i], cols[i], c)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        return self

    def estimate(self, tokens) -> np.ndarray:
        cols = self._cols(tokens)
        ests = np.stack([self.table[i][cols[i]]
                         for i in range(self.depth)])
        return ests.min(axis=0)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, width: int = 2048,
                   depth: int = 4) -> "CountMinSketch":
        s = cls(width, depth)
        s.table = np.frombuffer(data, np.int64).reshape(depth, width).copy()
        return s
