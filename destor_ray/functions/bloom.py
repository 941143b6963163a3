"""Bloom filter — analog of the reference's 7-hash filter
(/root/reference/src/utils/bloom_filter.c:98-127; compiled but unused in
the snapshot — SURVEY.md §2.5 B1). Here it earns its keep as the cheap
negative pre-filter before the LSH shuffle: a partition can test
"definitely never seen" signatures without any exchange (the classic
DDFS use).

Vectorized: k derived hash positions per key via salted splitmix64, bit
array as numpy uint8. Mergeable by OR — filters built per partition
union on the driver or in a tree."""

from __future__ import annotations

import numpy as np

from .hashing import mix_u64


class BloomFilter:
    @staticmethod
    def bits_for(n_keys: int, bits_per_key: int = 10,
                 min_bits: int = 1 << 20, max_bits: int = 1 << 30) -> int:
        """Power-of-two bit count sized to the expected key volume.

        ~10 bits/key with k=7 gives ~0.9% FPR; the power-of-two round-up
        only lowers that. Clamped: the floor keeps tiny builds cheap to
        hash, the ceiling (128 MB of bits) bounds what ships to every
        prober — past ~10^8 keys the FPR degrades gracefully and false
        positives only cost verify work, never wrong output."""
        want = max(int(n_keys) * bits_per_key, min_bits)
        return min(1 << (want - 1).bit_length(), max_bits)

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 7,
                 seed: int = 0xB100):
        assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.seed = seed
        self.bits = np.zeros(num_bits // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        pos = np.empty((self.num_hashes, len(keys)), dtype=np.uint64)
        for i in range(self.num_hashes):
            pos[i] = mix_u64(keys, self.seed + i) & np.uint64(self.num_bits - 1)
        return pos

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).reshape(-1)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.intp),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = possibly present, False = definitely
        absent."""
        pos = self._positions(keys)
        out = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.num_hashes):
            byte = self.bits[(pos[i] >> np.uint64(3)).astype(np.intp)]
            bit = (byte >> (pos[i] & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            out &= bit.astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.num_bits == other.num_bits and self.num_hashes == other.num_hashes
        self.bits |= other.bits
        return self

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, num_hashes: int = 7, seed: int = 0xB100) -> "BloomFilter":
        bits = np.frombuffer(data, dtype=np.uint8).copy()
        bf = cls(num_bits=len(bits) * 8, num_hashes=num_hashes, seed=seed)
        bf.bits = bits
        return bf
