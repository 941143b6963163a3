"""Content-defined chunking kernels.

Bit-faithful re-implementations of the reference's seven chunkers
(SURVEY.md §2.2), each with
  * a pure-Python "ref" port of the C cut predicate — the conformance
    oracle (cites: /root/reference/src/chunking/*.c,
    /root/reference/src/chunk_phase.c), and
  * a vectorized numpy kernel used in the engine hot path. The rolling
    hashes are (GF(2)- or 2^64-)linear, so the windowed fingerprint at
    every byte offset is computed with a fixed number of shifted
    adds/xors over the whole buffer; cut candidates are then sparse and
    the min/avg/max state machine walks candidates, not bytes.

Both paths are tested equal on random data (tests/test_chunking.py).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

_M64 = 0xFFFFFFFFFFFFFFFF
U64 = np.uint64


@dataclass(frozen=True)
class ChunkParams:
    """min/avg/max chunk sizes; defaults follow the reference's shipped
    config (destor.config:33-35 — FastCDC avg 4 KB, min 512, max 64 KB)."""
    min_size: int = 512
    avg_size: int = 4096
    max_size: int = 65536


# ---------------------------------------------------------------------------
# FastCDC  (/root/reference/src/chunking/fascdc_chunking.c)
# ---------------------------------------------------------------------------

# g_condition_mask, fascdc_chunking.c:42-63 (indices 0..17; 0-5 are the
# unused "1B-32B" aliases).
_FASTCDC_COND = [
    0x00001803110, 0x00001803110, 0x00001803110, 0x00001803110,
    0x00001803110, 0x00001803110,
    0x00001803110,        # 64B
    0x000018035100,       # 128B
    0x00001800035300,     # 256B
    0x000019000353000,    # 512B
    0x0000590003530000,   # 1KB
    0x0000d90003530000,   # 2KB
    0x0000d90103530000,   # 4KB
    0x0000d90303530000,   # 8KB
    0x0000d90313530000,   # 16KB
    0x0000d90f03530000,   # 32KB
    0x0000d90303537000,   # 64KB
    0x0000d90703537000,   # 128KB
]


@lru_cache(maxsize=1)
def _gear_table() -> np.ndarray:
    """gear[i] = first 8 bytes (LE) of MD5(64 × byte i)
    (fascdc_chunking.c:65-95, memcpy of md5_result into uint64)."""
    t = np.empty(256, dtype=np.uint64)
    for i in range(256):
        t[i] = int.from_bytes(hashlib.md5(bytes([i]) * 64).digest()[:8], "little")
    return t


def _fastcdc_masks(avg_size: int) -> tuple[int, int]:
    index = int(math.log2(avg_size))
    assert 6 < index < 17, "avg size must be in (64B, 128KB)"
    return _FASTCDC_COND[index + 1], _FASTCDC_COND[index - 1]  # MaskS, MaskL


def fastcdc_ref(p: bytes, n: int, params: ChunkParams) -> int:
    """Pure port of fastcdc_chunk_data (fascdc_chunking.c:98-131)."""
    gear = _gear_table()
    mask_s, mask_l = _fastcdc_masks(params.avg_size)
    mid = params.avg_size
    if n <= params.min_size:
        return n
    if n > params.max_size:
        n = params.max_size
    elif n < mid:
        mid = n
    fp = 0
    i = params.min_size
    while i < mid:
        fp = ((fp << 1) + int(gear[p[i]])) & _M64
        if not (fp & mask_s):
            return i
        i += 1
    while i < n:
        fp = ((fp << 1) + int(gear[p[i]])) & _M64
        if not (fp & mask_l):
            return i
        i += 1
    return i


def _gear_windowed(data: np.ndarray) -> np.ndarray:
    """w[t] = sum_{k=0..47} gear[data[t-k]] << k  (mod 2^64).

    Because fp = (fp<<1) + gear[b], byte contributions older than 64
    positions shift out entirely — the fingerprint IS this windowed sum
    once >=64 bytes accumulated. Only bits <= 47 of fp are tested (every
    g_condition_mask value has its top set bit at 47), and addition
    carries propagate upward only, so contributions shifted >= 48 can
    never change the mask test — 48 shifted adds suffice.
    """
    # doubling scan: after processing shift 2^m the window covers 2^(m+1)
    # lags; 6 passes reach 64. Lags 48..63 add only to bits >= 48, which
    # the mask test never reads. Processed in L2-sized slabs (the scan is
    # memory-bandwidth-bound when run over a whole batch: 6 passes × 8 B
    # per payload byte of DRAM traffic otherwise); slabs overlap by 63
    # bytes so windows never cross a slab seam.
    gear = _gear_table()
    n = len(data)
    out = np.empty(n, dtype=np.uint64)
    SLAB = 64 * 1024  # 512 KiB of uint64 working set — fits L2
    with np.errstate(over="ignore"):
        start = 0
        while start < n:
            end = min(start + SLAB, n)
            lo = max(0, start - 63)
            w = gear[data[lo:end]]
            for shift in (1, 2, 4, 8, 16, 32):
                w[shift:] += w[:-shift] << np.uint64(shift)
            out[start:end] = w[start - lo:]
            start = end
    return out


def _fastcdc_scan(d: np.ndarray, base: int, n: int, cand_s: np.ndarray,
                  cand_l: np.ndarray, params: ChunkParams,
                  mask_s_i: int, mask_l_i: int, gear: np.ndarray) -> np.ndarray:
    """Cut end-offsets (relative to `base`) for d[base:base+n], given
    globally precomputed windowed-mask candidate positions."""
    cuts: list[int] = []
    s = 0  # chunk start relative to base
    while s < n:
        rem = n - s
        if rem <= params.min_size:
            cuts.append(n)
            break
        mid = params.avg_size
        nn = rem
        if rem > params.max_size:
            nn = params.max_size
        elif rem < mid:
            mid = rem
        cut = -1
        # exact scan of the first 63 accumulation steps (fp not yet windowed)
        fp = 0
        i = params.min_size
        early_end = min(params.min_size + 63, nn)
        while i < early_end:
            fp = ((fp << 1) + int(gear[d[base + s + i]])) & _M64
            m = mask_s_i if i < mid else mask_l_i
            if not (fp & m):
                cut = i
                break
            i += 1
        if cut < 0:
            abs_s = base + s
            lo = abs_s + max(params.min_size + 63, params.min_size)
            if mid > params.min_size + 63:
                j = np.searchsorted(cand_s, lo)
                if j < len(cand_s) and cand_s[j] < abs_s + mid:
                    cut = int(cand_s[j]) - abs_s
            if cut < 0:
                lo2 = abs_s + max(mid, params.min_size + 63)
                j = np.searchsorted(cand_l, lo2)
                if j < len(cand_l) and cand_l[j] < abs_s + nn:
                    cut = int(cand_l[j]) - abs_s
            if cut < 0:
                cut = nn
        cuts.append(s + cut)
        s += cut
    return np.asarray(cuts, dtype=np.int64)


def _as_u8(data) -> np.ndarray:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(data, dtype=np.uint8)
    return np.asarray(data, dtype=np.uint8)


def fastcdc_cuts_multi(buffers, params: ChunkParams = ChunkParams()) -> list[np.ndarray]:
    """FastCDC cut offsets for MANY buffers in one pass: the gear-window
    fingerprint is computed over the concatenation (48 shifted adds over
    the whole batch instead of per row — the hot-path batching).

    Cross-buffer contamination is impossible: candidates are consulted
    only at positions i >= chunk_start + min_size + 63 (earlier steps are
    recomputed exactly), and the 48-byte window at such i reaches back at
    most to chunk_start + min_size + 16 — never across a buffer boundary.
    """
    arrs = [_as_u8(b) for b in buffers]
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    if len(arrs) == 0:
        return []
    d = np.concatenate(arrs) if len(arrs) > 1 else arrs[0]
    gear = _gear_table()
    mask_s_i, mask_l_i = _fastcdc_masks(params.avg_size)
    w = _gear_windowed(d)
    cand_s = np.flatnonzero((w & np.uint64(mask_s_i)) == 0)
    cand_l = np.flatnonzero((w & np.uint64(mask_l_i)) == 0)
    out = []
    base = 0
    for ln in lens:
        ln = int(ln)
        if ln == 0:
            out.append(np.empty(0, dtype=np.int64))
        else:
            out.append(_fastcdc_scan(d, base, ln, cand_s, cand_l, params,
                                     mask_s_i, mask_l_i, gear))
        base += ln
    return out


def fastcdc_cuts(data, params: ChunkParams = ChunkParams()) -> np.ndarray:
    """All chunk end-offsets of a buffer (vectorized FastCDC).

    Matches the reference driver loop (chunk_phase.c:20-112 repeatedly
    invoking fascdc_chunking.c:98-131 on the remainder).
    """
    d = _as_u8(data)
    n = len(d)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    gear = _gear_table()
    mask_s_i, mask_l_i = _fastcdc_masks(params.avg_size)
    w = _gear_windowed(d)
    cand_s = np.flatnonzero((w & np.uint64(mask_s_i)) == 0)
    cand_l = np.flatnonzero((w & np.uint64(mask_l_i)) == 0)
    return _fastcdc_scan(d, 0, n, cand_s, cand_l, params, mask_s_i, mask_l_i, gear)


# ---------------------------------------------------------------------------
# Rabin family  (/root/reference/src/chunking/rabin_chunking.c)
# ---------------------------------------------------------------------------

_FINGERPRINT_PT = 0xBFE6B8A5BF378D83
_BREAKMARK = 0x78
_WINSIZE = 48


def _fls64(v: int) -> int:
    return v.bit_length()


def _polymod(nh: int, nl: int, d: int) -> int:
    k = _fls64(d) - 1
    d = (d << (63 - k)) & _M64
    if nh:
        if nh & (1 << 63):
            nh ^= d
        for i in range(62, -1, -1):
            if nh & (1 << i):
                nh ^= d >> (63 - i)
                nl ^= (d << (i + 1)) & _M64
    for i in range(63, k - 1, -1):
        if nl & (1 << i):
            nl ^= d >> (63 - i)
    return nl


def _polymult(x: int, y: int) -> tuple[int, int]:
    ph = pl = 0
    if x & 1:
        pl = y
    for i in range(1, 64):
        if x & (1 << i):
            ph ^= y >> (64 - i)
            pl ^= (y << i) & _M64
    return ph, pl


def _polymmult(x: int, y: int, d: int) -> int:
    h, l = _polymult(x, y)
    return _polymod(h, l, d)


@lru_cache(maxsize=1)
def _rabin_tables() -> tuple[np.ndarray, np.ndarray, int]:
    """(T, U, shift) per rabinpoly_init/window_init
    (rabin_chunking.c:186-232)."""
    poly = _FINGERPRINT_PT
    xshift = _fls64(poly) - 1
    shift = xshift - 8
    t1 = _polymod(0, 1 << xshift, poly)
    T = np.empty(256, dtype=np.uint64)
    for j in range(256):
        T[j] = _polymmult(j, t1, poly) | ((j << xshift) & _M64)
    # sizeshift = append8 applied (size-1) times to 1
    sizeshift = 1
    for _ in range(1, _WINSIZE):
        sizeshift = (((sizeshift << 8) & _M64) ^ int(T[sizeshift >> shift]))
    U = np.empty(256, dtype=np.uint64)
    for i in range(256):
        U[i] = _polymmult(i, sizeshift, poly)
    return T, U, shift


class _RabinWindow:
    """Faithful SLIDE state (rabin_chunking.c:9-21): 48-byte circular
    buffer, fp = append8(fp ^ U[outgoing], incoming)."""

    def __init__(self) -> None:
        self.T, self.U, self.shift = _rabin_tables()
        self.fp = 0
        self.bufpos = -1
        self.buf = bytearray(_WINSIZE)

    def slide(self, m: int) -> int:
        m = int(m)
        self.bufpos += 1
        if self.bufpos >= _WINSIZE:
            self.bufpos = 0
        om = self.buf[self.bufpos]
        self.buf[self.bufpos] = m
        fp = self.fp ^ int(self.U[om])
        x = fp >> self.shift
        self.fp = (((fp << 8) & _M64) | m) ^ int(self.T[x])
        return self.fp


def rabin_ref(p: bytes, n: int, params: ChunkParams) -> int:
    """Port of rabin_chunk_data (rabin_chunking.c:249-276)."""
    if n <= params.min_size:
        return n
    win = _RabinWindow()
    mask = params.avg_size - 1
    i = params.min_size
    end = min(n, params.max_size)
    while i < end:
        fp = win.slide(p[i - 1])
        if (fp & mask) == _BREAKMARK:
            break
        i += 1
    return i


def normalized_rabin_ref(p: bytes, n: int, params: ChunkParams) -> int:
    """Port of normalized_rabin_chunk_data (rabin_chunking.c:283-320)."""
    if n <= params.min_size:
        return n
    win = _RabinWindow()
    small_mask = params.avg_size * 2 - 1
    large_mask = params.avg_size // 2 - 1
    i = params.min_size
    end = min(n, params.max_size)
    while i < end:
        fp = win.slide(p[i - 1])
        if i < params.avg_size:
            if (fp & small_mask) == _BREAKMARK:
                break
        else:
            if (fp & large_mask) == _BREAKMARK:
                break
        i += 1
    return i


def tttd_ref(p: bytes, n: int, params: ChunkParams) -> int:
    """Port of tttd_chunk_data (rabin_chunking.c:327-362)."""
    if n <= params.min_size:
        return n
    win = _RabinWindow()
    rabin_mask = params.avg_size - 1
    back_mask = params.avg_size // 2 - 1
    i = params.min_size
    m = 0
    end = min(n, params.max_size)
    while i < end:
        fp = win.slide(p[i - 1])
        if (fp & back_mask) == _BREAKMARK:
            if (fp & rabin_mask) == _BREAKMARK:
                return i
            m = i
        i += 1
    return m if m != 0 else i


@lru_cache(maxsize=1)
def _rabin_lag_tables() -> np.ndarray:
    """C[k][v] = windowed-fp contribution of byte v at lag k (k=0 newest).

    The rabin fp is GF(2)-linear in per-(byte,lag) contributions and byte
    0 contributes 0, so w[t] = XOR_k C[k][d[t-k]] reproduces the SLIDE
    fingerprint for fully-populated windows.
    """
    T, _, shift = _rabin_tables()
    C = np.empty((_WINSIZE, 256), dtype=np.uint64)
    C[0] = [(v ^ int(T[0])) & _M64 for v in range(256)]  # append8(0, v); T[0]==0
    for k in range(1, _WINSIZE):
        prev = C[k - 1]
        # append8(prev, 0) = (prev << 8) ^ T[prev >> shift]
        C[k] = ((prev << np.uint64(8)) ^ T[(prev >> np.uint64(shift)).astype(np.intp)])
    return C


def _rabin_windowed(d: np.ndarray) -> np.ndarray:
    """w[t] = SLIDE fingerprint when the newest fed byte is d[t] and the
    window is fully populated (>=48 bytes of history)."""
    C = _rabin_lag_tables()
    n = len(d)
    idx = d.astype(np.intp)
    w = C[0][idx].copy()
    for k in range(1, min(_WINSIZE, n)):  # lags beyond the buffer are empty
        w[k:] ^= C[k][idx[: n - k]]
    return w


def _rabin_family_cuts(data, params: ChunkParams, variant: str) -> np.ndarray:
    """Vectorized driver loop for rabin / normalized_rabin / tttd.

    The fed-byte at test position i is p[i-1] (rabin_chunking.c:262), so
    in absolute coordinates the fingerprint tested at position s+i is
    w[s+i-1]; windows are chunk-local (buffer reset per call).
    """
    d = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    n = len(d)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    w = _rabin_windowed(d)
    avg = params.avg_size
    if variant == "rabin":
        masks = [(np.uint64(avg - 1), avg - 1)]
    elif variant == "normalized_rabin":
        masks = [(np.uint64(2 * avg - 1), 2 * avg - 1), (np.uint64(avg // 2 - 1), avg // 2 - 1)]
    elif variant == "tttd":
        masks = [(np.uint64(avg // 2 - 1), avg // 2 - 1), (np.uint64(avg - 1), avg - 1)]
    else:
        raise ValueError(variant)
    cand = {mi: np.flatnonzero((w & mv) == np.uint64(_BREAKMARK)) for mv, mi in masks}
    bm = _BREAKMARK
    cuts: list[int] = []
    s = 0
    while s < n:
        rem = n - s
        if rem <= params.min_size:
            cuts.append(n)
            break
        end = min(rem, params.max_size)
        cut = -1
        # exact scan while window not fully populated: fed bytes p[min-1..i-1];
        # window full once i-min+1 >= 48  → i >= min+47
        win = _RabinWindow()
        i = params.min_size
        early_end = min(params.min_size + _WINSIZE - 1, end)
        m_back = 0
        while i < early_end:
            fp = win.slide(d[s + i - 1])
            if variant == "rabin":
                if (fp & (avg - 1)) == bm:
                    cut = i
                    break
            elif variant == "normalized_rabin":
                mk = (2 * avg - 1) if i < avg else (avg // 2 - 1)
                if (fp & mk) == bm:
                    cut = i
                    break
            else:  # tttd
                if (fp & (avg // 2 - 1)) == bm:
                    if (fp & (avg - 1)) == bm:
                        cut = i
                        break
                    m_back = i
            i += 1
        if cut < 0:
            lo = s + max(params.min_size + _WINSIZE - 1, params.min_size) - 1  # w index of fed byte
            hi = s + end - 1  # exclusive upper w index + 1 handled below
            if variant == "rabin":
                c = cand[avg - 1]
                j = np.searchsorted(c, lo)
                if j < len(c) and c[j] < hi:
                    cut = int(c[j]) - s + 1
            elif variant == "normalized_rabin":
                c_small, c_large = cand[2 * avg - 1], cand[avg // 2 - 1]
                # region 1: i in [.., avg)  → w index < s+avg-1
                j = np.searchsorted(c_small, lo)
                if j < len(c_small) and c_small[j] < min(hi, s + avg - 1):
                    cut = int(c_small[j]) - s + 1
                if cut < 0:
                    lo2 = max(lo, s + avg - 1)
                    j = np.searchsorted(c_large, lo2)
                    if j < len(c_large) and c_large[j] < hi:
                        cut = int(c_large[j]) - s + 1
            else:  # tttd
                c_back = cand[avg // 2 - 1]
                j = np.searchsorted(c_back, lo)
                while j < len(c_back) and c_back[j] < hi:
                    t = int(c_back[j])
                    if (int(w[t]) & (avg - 1)) == bm:
                        cut = t - s + 1
                        break
                    m_back = t - s + 1
                    j += 1
                if cut < 0 and m_back != 0:
                    cut = m_back
        if cut < 0:
            cut = end
        cuts.append(s + cut)
        s += cut
    return np.asarray(cuts, dtype=np.int64)


def rabin_cuts(data, params: ChunkParams = ChunkParams()) -> np.ndarray:
    return _rabin_family_cuts(data, params, "rabin")


def normalized_rabin_cuts(data, params: ChunkParams = ChunkParams()) -> np.ndarray:
    return _rabin_family_cuts(data, params, "normalized_rabin")


def tttd_cuts(data, params: ChunkParams = ChunkParams()) -> np.ndarray:
    return _rabin_family_cuts(data, params, "tttd")


# ---------------------------------------------------------------------------
# AE  (/root/reference/src/chunking/ae_chunking.c)
# ---------------------------------------------------------------------------

def _ae_window(avg_size: int) -> int:
    return int(avg_size / (math.e - 1))  # ae_chunking.c:25-28 (C int trunc)


def ae_ref(p: bytes, n: int, params: ChunkParams) -> int:
    """Port of ae_chunk_data (ae_chunking.c:33-54). Note my_memcmp never
    returns 0 and 'max' actually tracks the big-endian *minimum*."""
    w = _ae_window(params.avg_size)
    if n <= w + 8:
        return n

    def val(i: int) -> int:
        return int.from_bytes(p[i:i + 8], "big")

    max_i = 0
    curr = 1
    end = n - 8
    while curr <= end:
        if val(curr) < val(max_i):
            max_i = curr
            curr += 1
            continue
        if curr == max_i + w or curr == params.max_size:
            return curr
        curr += 1
    return n


def _be64_at(d: np.ndarray) -> np.ndarray:
    """v[i] = big-endian uint64 of d[i:i+8], for i in [0, n-8]."""
    n = len(d)
    m = n - 7
    v = np.zeros(m, dtype=np.uint64)
    for j in range(8):
        v = (v << np.uint64(8)) | d[j:m + j].astype(np.uint64)
    return v


def ae_cuts(data, params: ChunkParams = ChunkParams()) -> np.ndarray:
    """Vectorized AE: per chunk, find strict running-min positions with
    minimum.accumulate, then the first survivor gap >= window."""
    d = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    n = len(d)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    w = _ae_window(params.avg_size)
    if n < 8:
        return np.asarray([n], dtype=np.int64)
    v = _be64_at(d)
    cuts: list[int] = []
    s = 0
    while s < n:
        rem = n - s
        if rem <= w + 8:
            cuts.append(n)
            break
        seg = v[s: n - 7]  # values at positions s .. n-8
        runmin = np.minimum.accumulate(seg)
        isnew = np.empty(len(seg), dtype=bool)
        isnew[0] = True
        isnew[1:] = seg[1:] < runmin[:-1]
        newpos = np.flatnonzero(isnew)  # chunk-relative minima positions
        end_rel = len(seg) - 1  # last valid curr (== n-8 absolute)
        cut = -1
        for idx in range(len(newpos)):
            m = int(newpos[idx])
            nxt = int(newpos[idx + 1]) if idx + 1 < len(newpos) else end_rel + 1
            # candidates strictly between m and nxt where a check fires
            c1 = m + w
            c2 = params.max_size  # curr == p + max_size, chunk-relative
            cand = [c for c in (c1, c2) if m < c < nxt and c <= end_rel and c >= 1]
            if cand:
                cut = min(cand)
                break
        if cut < 0:
            cut = rem
        cuts.append(s + cut)
        s += cut
    return np.asarray(cuts, dtype=np.int64)


# ---------------------------------------------------------------------------
# Fixed-size and file-level  (/root/reference/src/chunk_phase.c:12-14,163-173)
# ---------------------------------------------------------------------------

def fixed_ref(p: bytes, n: int, params: ChunkParams) -> int:
    return min(n, params.avg_size)


def fixed_cuts(data, params: ChunkParams = ChunkParams()) -> np.ndarray:
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    return np.append(np.arange(params.avg_size, n, params.avg_size, dtype=np.int64), n)


CONTAINER_PAYLOAD = (4 << 20) - (32 << 10)  # containerstore.h:13-14


def file_level_cuts(data, params: ChunkParams = ChunkParams()) -> np.ndarray:
    """Whole payload as one chunk, capped at the container payload size
    (chunk_phase.c:163-173)."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    cuts = np.arange(CONTAINER_PAYLOAD, n, CONTAINER_PAYLOAD, dtype=np.int64)
    return np.append(cuts, n)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

_REF_FNS = {
    "fixed": fixed_ref,
    "rabin": rabin_ref,
    "normalized_rabin": normalized_rabin_ref,
    "tttd": tttd_ref,
    "ae": ae_ref,
    "fastcdc": fastcdc_ref,
}

_VEC_FNS = {
    "fixed": fixed_cuts,
    "rabin": rabin_cuts,
    "normalized_rabin": normalized_rabin_cuts,
    "tttd": tttd_cuts,
    "ae": ae_cuts,
    "fastcdc": fastcdc_cuts,
    "file": file_level_cuts,
}

ALGORITHMS = tuple(_VEC_FNS)


def chunk_offsets_ref(data: bytes, algo: str, params: ChunkParams) -> np.ndarray:
    """Reference driver loop (chunk_phase.c:20-112): call the per-chunk
    predicate on the remainder until exhausted. Conformance oracle."""
    fn = _REF_FNS[algo]
    cuts = []
    pos = 0
    n = len(data)
    while pos < n:
        ln = fn(data[pos:], n - pos, params)
        pos += ln
        cuts.append(pos)
    return np.asarray(cuts, dtype=np.int64)


def chunk_offsets(data, algo: str = "fastcdc", params: ChunkParams = ChunkParams()) -> np.ndarray:
    """Engine path: vectorized cut offsets (end offsets, last == len)."""
    return _VEC_FNS[algo](data, params)


def _hash_chunks(data, cuts: np.ndarray) -> np.ndarray:
    out = np.empty(len(cuts), dtype=np.uint64)
    start = 0
    view = memoryview(data) if isinstance(data, (bytes, bytearray)) else data
    for i, end in enumerate(cuts):
        out[i] = int.from_bytes(hashlib.sha1(view[start:end]).digest()[:8], "big")
        start = int(end)
    return out


def chunk_hashes(data: bytes, algo: str = "fastcdc", params: ChunkParams = ChunkParams()) -> np.ndarray:
    """uint64 fingerprint per chunk (first 8 bytes of SHA-1, big-endian) —
    the per-row substring-fingerprint set (SURVEY.md §1.2)."""
    return _hash_chunks(data, chunk_offsets(data, algo, params))


def chunk_hashes_multi(buffers, algo: str = "fastcdc",
                       params: ChunkParams = ChunkParams()) -> list[np.ndarray]:
    """Batched chunk fingerprints — one gear-window pass for the whole
    batch when algo is fastcdc (the engine hot path)."""
    if algo == "fastcdc":
        cuts_list = fastcdc_cuts_multi(buffers, params)
    else:
        cuts_list = [chunk_offsets(b, algo, params) for b in buffers]
    return [_hash_chunks(b, c) for b, c in zip(buffers, cuts_list)]
