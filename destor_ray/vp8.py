"""Pure-numpy VP8 key-frame (lossy WebP still) codec — RFC 6386.

Round-3 VERDICT item #4: lossy VP8 was the engine's single biggest
real-corpus coverage gap (webp.py quarantined every `VP8 ` chunk).
This module implements the key-frame bitstream from the public spec
(RFC 6386, "VP8 Data Format and Decoding Guide"): boolean arithmetic
coder, tree-coded macroblock modes, tokenized DCT coefficients with
band/context-conditioned probabilities, the integer 4x4 DCT/WHT pair,
and full intra reconstruction (16x16 DC/V/H/TM, chroma 8x8, and the
ten 4x4 B_PRED submodes) at 4:2:0 subsampling.

Like every codec here (see jpeg.py), both an encoder and a decoder are
implemented so the dedup fixtures can synthesize real lossy payloads;
the encoder emits the simplest legal stream (one token partition, no
segmentation, loop filter level 0, 16x16-only prediction) while the
decoder accepts the general key-frame syntax.

Deliberate scope bounds (documented seams, mirroring the reference's
container read path being unconditional while its chunking/dedup core
is the actual subject — /root/reference/src/storage/containerstore.c):
  * inter frames raise NotImplementedError (video P-frames are the
    same seam as H.264 in stages/multimodal.py);
  * the in-loop deblocking filter (normal + simple, RFC 6386
    section 15) is applied to the display output when the header
    signals a level — our encoder defaults to level 0 so fixture
    bytes stay stable; mode/ref lf_delta adjustments (an inter-frame
    concern) are parsed but not applied;
  * probability TABLES transcribed from memory — see vp8_tables.py's
    provenance note; the bitstream structure itself is spec-exact and
    round-trip verified (tests/test_vp8.py).

Scale shape: decode is per-payload work inside actor-pool map_batches
stages (stages/multimodal.py) — payload bytes never shuffle; the
arithmetic coder is inherently serial per stream, so parallelism comes
from Ray actors across rows, exactly like jpeg.py.
"""

from __future__ import annotations

import numpy as np

from . import vp8_tables as T

# ----------------------------------------------------------------------
# boolean arithmetic coder (RFC 6386 section 7)
# ----------------------------------------------------------------------


class BoolDecoder:
    """RFC 6386 section 7.2 reference decoder; zero-feeds past EOF."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def bit(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.bit(128) else v


class BoolEncoder:
    """Arithmetic encoder matching BoolDecoder bit-for-bit.

    The active interval's low endpoint is kept in a register whose
    BOTTOM 8 bits align with `range` (splits add at the bottom, the
    scale grows by left-shifting on renormalization — the RFC 6386
    section 7.3 construction). When the register reaches 40 bits its
    top byte is settled modulo carry and emitted; carries from later
    adds propagate into emitted bytes via the classic 0xFF-run
    increment. finish() flushes the register, selecting the interval's
    low endpoint zero-extended as the codeword (the decoder zero-feeds
    past EOF). Fuzz-verified against BoolDecoder over random
    (bit, prob) sequences in tests/test_vp8.py."""

    __slots__ = ("low", "range", "width", "out")

    def __init__(self):
        self.low = 0
        self.range = 255
        self.width = 8  # current register bit-width (scale of `low`)
        self.out = bytearray()

    def bit(self, b: int, prob: int = 128) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if b:
            self.low += split
            self.range -= split
            if self.low >> self.width:  # carry into emitted bytes
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                # i < 0 impossible: low + range <= 2^scale invariant
                self.out[i] += 1
                self.low &= (1 << self.width) - 1
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.width += 1
            if self.width == 40:
                self.out.append((self.low >> 32) & 0xFF)
                self.low &= (1 << 32) - 1
                self.width = 32
    def literal(self, v: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.bit((v >> i) & 1, 128)

    def signed_literal(self, v: int, nbits: int) -> None:
        self.literal(abs(v), nbits)
        self.bit(1 if v < 0 else 0, 128)

    def finish(self) -> bytes:
        pad = (8 - self.width % 8) % 8
        v = self.low << pad
        for shift in range((self.width + pad) - 8, -1, -8):
            self.out.append((v >> shift) & 0xFF)
        return bytes(self.out)


# ----------------------------------------------------------------------
# token trees (RFC 6386 section 8)
# ----------------------------------------------------------------------


def tree_read(bd: BoolDecoder, tree: np.ndarray, probs, start: int = 0) -> int:
    i = start
    while True:
        i = int(tree[i + bd.bit(int(probs[i >> 1]))])
        if i <= 0:
            return -i


def tree_paths(tree: np.ndarray) -> dict[int, list[tuple[int, int]]]:
    """token -> [(prob_index, bit), ...] encoding paths."""
    paths: dict[int, list[tuple[int, int]]] = {}

    def walk(i: int, path: list[tuple[int, int]]):
        for b in (0, 1):
            nxt = int(tree[i + b])
            p = path + [(i >> 1, b)]
            if nxt <= 0:
                paths[-nxt] = p
            else:
                walk(nxt, p)

    walk(0, [])
    return paths


_COEF_PATHS = tree_paths(T.COEF_TREE)
_KF_YMODE_PATHS = tree_paths(T.KF_YMODE_TREE)
_UV_MODE_PATHS = tree_paths(T.UV_MODE_TREE)


def tree_write(be: BoolEncoder, paths, probs, token: int,
               skip_first: bool = False) -> None:
    path = paths[token]
    if skip_first:
        path = path[1:]
    for pidx, b in path:
        be.bit(b, int(probs[pidx]))


# ----------------------------------------------------------------------
# transforms (RFC 6386 section 14.3; forward pair from the public
# libvpx reference encoder — encoder choice, not bitstream-normative)
# ----------------------------------------------------------------------

_C1 = 20091  # cospi8sqrt2 - 1, Q16
_C2 = 35468  # sinpi8sqrt2, Q16


def idct4x4(blocks: np.ndarray) -> np.ndarray:
    """(N, 4, 4) int64 dequantized coefficients -> (N, 4, 4) residual."""
    b = blocks.astype(np.int64)
    # pass 1: columns
    i0, i1, i2, i3 = b[:, 0, :], b[:, 1, :], b[:, 2, :], b[:, 3, :]
    a1 = i0 + i2
    b1 = i0 - i2
    c1 = ((i1 * _C2) >> 16) - (i3 + ((i3 * _C1) >> 16))
    d1 = (i1 + ((i1 * _C1) >> 16)) + ((i3 * _C2) >> 16)
    t = np.stack([a1 + d1, b1 + c1, b1 - c1, a1 - d1], axis=1)
    # pass 2: rows
    i0, i1, i2, i3 = t[:, :, 0], t[:, :, 1], t[:, :, 2], t[:, :, 3]
    a1 = i0 + i2
    b1 = i0 - i2
    c1 = ((i1 * _C2) >> 16) - (i3 + ((i3 * _C1) >> 16))
    d1 = (i1 + ((i1 * _C1) >> 16)) + ((i3 * _C2) >> 16)
    out = np.stack([a1 + d1, b1 + c1, b1 - c1, a1 - d1], axis=2)
    return (out + 4) >> 3


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """(4, 4) int64 dequantized Y2 -> 16 luma DC values (raster)."""
    b = block.astype(np.int64)
    i0, i1, i2, i3 = b[0], b[1], b[2], b[3]
    a1 = i0 + i3
    b1 = i1 + i2
    c1 = i1 - i2
    d1 = i0 - i3
    t = np.stack([a1 + b1, c1 + d1, a1 - b1, d1 - c1])
    i0, i1, i2, i3 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    a1 = i0 + i3
    b1 = i1 + i2
    c1 = i1 - i2
    d1 = i0 - i3
    out = np.stack([a1 + b1 + 3, c1 + d1 + 3, a1 - b1 + 3, d1 - c1 + 3],
                   axis=1) >> 3
    return out.reshape(-1)


def fdct4x4(blocks: np.ndarray) -> np.ndarray:
    """(N, 4, 4) int residual -> (N, 4, 4) coefficients (libvpx fdct)."""
    b = blocks.astype(np.int64)
    i0, i1, i2, i3 = b[:, :, 0], b[:, :, 1], b[:, :, 2], b[:, :, 3]
    a1 = (i0 + i3) * 8
    b1 = (i1 + i2) * 8
    c1 = (i1 - i2) * 8
    d1 = (i0 - i3) * 8
    t = np.stack([a1 + b1,
                  (c1 * 2217 + d1 * 5352 + 14500) >> 12,
                  a1 - b1,
                  (d1 * 2217 - c1 * 5352 + 7500) >> 12], axis=2)
    i0, i1, i2, i3 = t[:, 0, :], t[:, 1, :], t[:, 2, :], t[:, 3, :]
    a1 = i0 + i3
    b1 = i1 + i2
    c1 = i1 - i2
    d1 = i0 - i3
    out = np.stack([(a1 + b1 + 7) >> 4,
                    ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (d1 != 0),
                    (a1 - b1 + 7) >> 4,
                    (d1 * 2217 - c1 * 5352 + 51000) >> 16], axis=1)
    return out


def fwht4x4(block: np.ndarray) -> np.ndarray:
    """(4, 4) int luma-DC values -> (4, 4) Y2 coefficients."""
    b = block.astype(np.int64)
    i0, i1, i2, i3 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    a1 = (i0 + i2) * 4
    d1 = (i1 + i3) * 4
    c1 = (i1 - i3) * 4
    b1 = (i0 - i2) * 4
    t = np.stack([a1 + d1 + (a1 != 0), b1 + c1, b1 - c1, a1 - d1], axis=1)
    i0, i1, i2, i3 = t[0], t[1], t[2], t[3]
    a1 = i0 + i2
    d1 = i1 + i3
    c1 = i1 - i3
    b1 = i0 - i2
    a2 = a1 + d1
    b2 = b1 + c1
    c2 = b1 - c1
    d2 = a1 - d1
    out = np.stack([a2 + (a2 < 0), b2 + (b2 < 0), c2 + (c2 < 0),
                    d2 + (d2 < 0)])
    return (out + 3) >> 3


# ----------------------------------------------------------------------
# quantizers (RFC 6386 section 14.1)
# ----------------------------------------------------------------------


def quant_factors(qindex: int) -> dict[str, tuple[int, int]]:
    qi = int(np.clip(qindex, 0, 127))
    dc = int(T.DC_QLOOKUP[qi])
    ac = int(T.AC_QLOOKUP[qi])
    return {
        "y": (dc, ac),
        "y2": (dc * 2, max(8, ac * 155 // 100)),
        "uv": (min(dc, 132), ac),
    }


# ----------------------------------------------------------------------
# coefficient tokens (RFC 6386 section 13)
# ----------------------------------------------------------------------


def decode_coeffs(bd: BoolDecoder, probs, first: int, ctx: int,
                  dq_dc: int, dq_ac: int) -> tuple[np.ndarray, int]:
    """One 4x4 block's tokens -> ((4,4) dequantized coeffs, nz flag).
    `probs` is the [band][ctx][11] table for the block type."""
    out = np.zeros(16, np.int64)
    i = first
    nz = 0
    after_zero = False
    while i < 16:
        p = probs[T.COEF_BANDS[i]][ctx]
        tok = tree_read(bd, T.COEF_TREE, p, start=2 if after_zero else 0)
        if tok == T.TOK_EOB:
            break
        if tok == T.TOK_ZERO:
            ctx = 0
            after_zero = True
            i += 1
            continue
        after_zero = False
        if tok <= T.TOK_FOUR:
            val = tok  # TOK_ONE..TOK_FOUR carry their magnitude
            ctx = 1 if val == 1 else 2
        else:
            extra = 0
            for pb in T.CAT_PROBS[tok]:
                extra = (extra << 1) | bd.bit(pb)
            val = T.CAT_BASE[tok] + extra
            ctx = 2
        if bd.bit(128):
            val = -val
        out[T.ZIGZAG[i]] = val * (dq_dc if i == 0 else dq_ac)
        nz = 1
        i += 1
    return out.reshape(4, 4), nz


def encode_coeffs(be: BoolEncoder, probs, first: int, ctx: int,
                  qcoefs: np.ndarray) -> int:
    """Token-encode one block's QUANTIZED coefficients (raster (4,4));
    mirror of decode_coeffs. Returns the nz flag."""
    scan = qcoefs.reshape(-1)[T.ZIGZAG]
    # last nonzero position in scan order
    nzpos = np.flatnonzero(scan[first:]) + first
    end = int(nzpos[-1]) + 1 if len(nzpos) else first
    i = first
    nz = 0
    after_zero = False
    while i < 16:
        p = probs[T.COEF_BANDS[i]][ctx]
        if i >= end:
            tree_write(be, _COEF_PATHS, p, T.TOK_EOB,
                       skip_first=after_zero)
            break
        v = int(scan[i])
        a = abs(v)
        if a == 0:
            tree_write(be, _COEF_PATHS, p, T.TOK_ZERO,
                       skip_first=after_zero)
            ctx = 0
            after_zero = True
            i += 1
            continue
        if a <= 4:
            tok = a
        elif a <= 6:
            tok = T.TOK_CAT1
        elif a <= 10:
            tok = T.TOK_CAT2
        elif a <= 18:
            tok = T.TOK_CAT3
        elif a <= 34:
            tok = T.TOK_CAT4
        elif a <= 66:
            tok = T.TOK_CAT5
        else:
            tok = T.TOK_CAT6
        tree_write(be, _COEF_PATHS, p, tok, skip_first=after_zero)
        after_zero = False
        if tok >= T.TOK_CAT1:
            extra = a - T.CAT_BASE[tok]
            cps = T.CAT_PROBS[tok]
            for j, pb in enumerate(cps):
                be.bit((extra >> (len(cps) - 1 - j)) & 1, pb)
        be.bit(1 if v < 0 else 0, 128)
        ctx = 1 if a == 1 else 2
        nz = 1
        i += 1
    return nz


# ----------------------------------------------------------------------
# intra prediction (RFC 6386 section 12)
# ----------------------------------------------------------------------


def _clip8(x: np.ndarray) -> np.ndarray:
    return np.clip(x, 0, 255)


def predict_block(mode: int, above: np.ndarray, left: np.ndarray,
                  corner: int, size: int, have_a: bool,
                  have_l: bool) -> np.ndarray:
    """16x16 / 8x8 whole-block intra prediction (int32 output)."""
    if mode == T.DC_PRED:
        if have_a and have_l:
            dc = (int(above.sum()) + int(left.sum()) + size) >> \
                (1 + int(np.log2(size)))
        elif have_a:
            dc = (int(above.sum()) + size // 2) >> int(np.log2(size))
        elif have_l:
            dc = (int(left.sum()) + size // 2) >> int(np.log2(size))
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == T.V_PRED:
        return np.tile(above.astype(np.int32), (size, 1))
    if mode == T.H_PRED:
        return np.tile(left.astype(np.int32)[:, None], (1, size))
    if mode == T.TM_PRED:
        return _clip8(left.astype(np.int32)[:, None]
                      + above.astype(np.int32)[None, :] - int(corner))
    raise ValueError(f"bad 16x16/8x8 mode {mode}")


def predict_b4(mode: int, a: np.ndarray, l: np.ndarray, p: int,
               ar: np.ndarray) -> np.ndarray:
    """4x4 B_PRED submode prediction (RFC 6386 section 12.3). `a`:
    above[4], `ar`: above-right[4], `l`: left[4], `p`: above-left
    corner. Only decoded streams exercise these — our encoder emits
    16x16 modes — but all ten modes are implemented so real key
    frames reconstruct."""
    a = a.astype(np.int64)
    l = l.astype(np.int64)
    ar = ar.astype(np.int64)
    p = int(p)
    b = np.zeros(16, np.int64)

    def f3(e, i):
        return (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2

    def f2(e, i):
        return (e[i] + e[i + 1] + 1) >> 1

    if mode == T.B_DC_PRED:
        b[:] = (a.sum() + l.sum() + 4) >> 3
    elif mode == T.B_TM_PRED:
        return _clip8(l[:, None] + a[None, :] - p).astype(np.int32)
    elif mode == T.B_VE_PRED:
        e = np.concatenate(([p], a, ar[:1]))
        b = np.tile((e[:-2] + 2 * e[1:-1] + e[2:] + 2) >> 2, 4)
    elif mode == T.B_HE_PRED:
        e = np.concatenate(([p], l, l[-1:]))
        b = np.repeat((e[:-2] + 2 * e[1:-1] + e[2:] + 2) >> 2, 4)
    elif mode == T.B_LD_PRED:
        e = np.concatenate((a, ar))
        f = np.empty(7, np.int64)
        for i in range(6):
            f[i] = f3(e, i)
        f[6] = (e[6] + 3 * e[7] + 2) >> 2
        for r in range(4):
            b[r * 4:r * 4 + 4] = f[r:r + 4]
    elif mode == T.B_RD_PRED:
        e = np.concatenate((l[::-1], [p], a))  # L3 L2 L1 L0 P A0..A3
        f = np.array([f3(e, i) for i in range(7)], np.int64)
        for r in range(4):
            b[r * 4:r * 4 + 4] = f[3 - r:7 - r]
    elif mode == T.B_VR_PRED:
        e = np.concatenate((l[::-1], [p], a))
        b[12] = f3(e, 1)
        b[8] = f3(e, 2)
        b[13] = b[4] = f3(e, 3)
        b[9] = b[0] = f2(e, 4)
        b[14] = b[5] = f3(e, 4)
        b[10] = b[1] = f2(e, 5)
        b[15] = b[6] = f3(e, 5)
        b[11] = b[2] = f2(e, 6)
        b[7] = f3(e, 6)
        b[3] = f2(e, 7)
    elif mode == T.B_VL_PRED:
        e = np.concatenate((a, ar))
        b[0] = f2(e, 0)
        b[4] = f3(e, 0)
        b[8] = b[1] = f2(e, 1)
        b[12] = b[5] = f3(e, 1)
        b[9] = b[2] = f2(e, 2)
        b[13] = b[6] = f3(e, 2)
        b[10] = b[3] = f2(e, 3)
        b[14] = b[7] = f3(e, 3)
        b[11] = f3(e, 4)
        b[15] = f3(e, 5)
    elif mode == T.B_HD_PRED:
        e = np.concatenate((l[::-1], [p], a))
        b[12] = f2(e, 0)
        b[13] = f3(e, 0)
        b[8] = b[14] = f2(e, 1)
        b[9] = b[15] = f3(e, 1)
        b[4] = b[10] = f2(e, 2)
        b[5] = b[11] = f3(e, 2)
        b[0] = b[6] = f2(e, 3)
        b[1] = b[7] = f3(e, 3)
        b[2] = f3(e, 4)
        b[3] = f3(e, 5)
    elif mode == T.B_HU_PRED:
        e = l
        b[0] = f2(e, 0)
        b[1] = f3(e, 0)
        b[2] = b[4] = f2(e, 1)
        b[3] = b[5] = f3(e, 1)
        b[6] = b[8] = f2(e, 2)
        b[7] = b[9] = (e[2] + 3 * e[3] + 2) >> 2
        b[10] = b[11] = b[12] = b[13] = b[14] = b[15] = e[3]
    else:
        raise ValueError(f"bad b mode {mode}")
    return b.reshape(4, 4).astype(np.int32)


# ----------------------------------------------------------------------
# in-loop deblocking filter (RFC 6386 section 15) — applied to the
# DISPLAY output after full reconstruction; VP8 intra prediction uses
# the unfiltered pixels, so encoding is unaffected (round 4: closes the
# round-3 "loop filter not applied" seam for real streams)
# ----------------------------------------------------------------------


def _lf_params(level: int, sharpness: int) -> tuple[int, int, int, int]:
    interior = level
    if sharpness:
        interior >>= 1 if sharpness <= 4 else 2
        interior = min(interior, 9 - sharpness)
    interior = max(interior, 1)
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
    mb_edge = (level + 2) * 2 + interior
    sub_edge = level * 2 + interior
    return interior, hev_t, mb_edge, sub_edge


def _c128(x: np.ndarray) -> np.ndarray:
    return np.clip(x, -128, 127)


def _lf_edge(plane: np.ndarray, pos: int, lanes: slice, horizontal: bool,
             interior: int, edge_limit: int, hev_t: int,
             mode: str) -> None:
    """Filter ONE edge in `plane` (padded uint8 array): pixels p3..p0
    sit before `pos`, q0..q3 from `pos`, along axis 0 if `horizontal`
    else axis 1. Vectorized across the edge's lanes. `mode`: "mb" =
    the 27/18/9 macroblock filter, "sub" = the subblock filter,
    "simple" = the simple-filter common adjust (luma only, outer taps
    always, p0/q0 only, edge-limit mask only)."""
    def col(off):
        if horizontal:
            return plane[pos + off, lanes].astype(np.int64)
        return plane[lanes, pos + off].astype(np.int64)

    def setcol(off, v):
        v8 = np.clip(v, -128, 127) + 128
        if horizontal:
            plane[pos + off, lanes] = v8.astype(np.uint8)
        else:
            plane[lanes, pos + off] = v8.astype(np.uint8)

    p3, p2, p1, p0 = col(-4), col(-3), col(-2), col(-1)
    q0, q1, q2, q3 = col(0), col(1), col(2), col(3)
    edge_ok = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= edge_limit
    if mode == "simple":
        fmask = edge_ok
    else:
        fmask = (edge_ok
                 & (np.abs(p3 - p2) <= interior)
                 & (np.abs(p2 - p1) <= interior)
                 & (np.abs(p1 - p0) <= interior)
                 & (np.abs(q1 - q0) <= interior)
                 & (np.abs(q2 - q1) <= interior)
                 & (np.abs(q3 - q2) <= interior))
    if not fmask.any():
        return
    # signed domain
    sp1, sp0 = p1 - 128, p0 - 128
    sq0, sq1 = q0 - 128, q1 - 128
    if mode == "simple":
        a = _c128(_c128(sp1 - sq1) + 3 * (sq0 - sp0))
        F = _c128(a + 4) >> 3
        E = _c128(a + 3) >> 3
        setcol(0, np.where(fmask, sq0 - F, sq0))
        setcol(-1, np.where(fmask, sp0 + E, sp0))
        return
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    if mode == "mb":
        w = _c128(_c128(sp1 - sq1) + 3 * (sq0 - sp0))
        # hev branch: common adjust with outer taps (p0/q0 only)
        F = _c128(w + 4) >> 3
        E = _c128(w + 3) >> 3
        m_h = fmask & hev
        nq0 = np.where(m_h, sq0 - F, sq0)
        np0 = np.where(m_h, sp0 + E, sp0)
        # !hev branch: 27/18/9 cascade across three pixel pairs
        m = fmask & ~hev
        a0 = _c128((27 * w + 63) >> 7)
        a1 = _c128((18 * w + 63) >> 7)
        a2 = _c128((9 * w + 63) >> 7)
        nq0 = np.where(m, sq0 - a0, nq0)
        np0 = np.where(m, sp0 + a0, np0)
        nq1 = np.where(m, sq1 - a1, sq1)
        np1 = np.where(m, sp1 + a1, sp1)
        sp2, sq2 = p2 - 128, q2 - 128
        nq2 = np.where(m, sq2 - a2, sq2)
        np2 = np.where(m, sp2 + a2, sp2)
        setcol(-3, np2)
        setcol(2, nq2)
        setcol(-2, np1)
        setcol(1, nq1)
        setcol(-1, np0)
        setcol(0, nq0)
        return
    # subblock filter
    a = _c128(np.where(hev, _c128(sp1 - sq1), 0) + 3 * (sq0 - sp0))
    F = _c128(a + 4) >> 3
    E = _c128(a + 3) >> 3
    nq0 = np.where(fmask, sq0 - F, sq0)
    np0 = np.where(fmask, sp0 + E, sp0)
    a2 = (F + 1) >> 1
    m = fmask & ~hev
    nq1 = np.where(m, sq1 - a2, sq1)
    np1 = np.where(m, sp1 + a2, sp1)
    setcol(-2, np1)
    setcol(1, nq1)
    setcol(-1, np0)
    setcol(0, nq0)


def _loop_filter(Y: np.ndarray, U: np.ndarray, V: np.ndarray,
                 mb_rows: int, mb_cols: int, filter_type: int,
                 levels, sharpness: int,
                 inner: np.ndarray) -> None:
    """RFC 6386 section 15 deblocking over the padded planes (data
    starts at index 1). Per-MB raster order, each MB: left MB edge,
    internal vertical edges, top MB edge, internal horizontal edges
    (internal edges only when `inner[r, c]` — the MB has coefficients
    or is B_PRED). filter_type 1 = simple filter (luma only).
    `levels` is an (mb_rows, mb_cols) per-MB level array (per-segment
    loop-filter features) or a scalar; a level-0 MB is unfiltered."""
    levels = np.broadcast_to(np.asarray(levels, np.int64),
                             (mb_rows, mb_cols))
    param_cache: dict[int, tuple[int, int, int, int]] = {}
    for r in range(mb_rows):
        for c in range(mb_cols):
            level = int(levels[r, c])
            if level == 0:
                continue
            params = param_cache.get(level)
            if params is None:
                params = param_cache[level] = _lf_params(level, sharpness)
            interior, hev_t, mb_lim, sub_lim = params
            y0, x0 = r * 16 + 1, c * 16 + 1
            rows = slice(y0, y0 + 16)
            cols = slice(x0, x0 + 16)
            if filter_type == 1:  # simple: luma block edges only
                if c > 0:
                    _lf_edge(Y, x0, rows, False, 0, mb_lim, 0, "simple")
                if inner[r, c]:
                    for k in (4, 8, 12):
                        _lf_edge(Y, x0 + k, rows, False, 0, sub_lim,
                                 0, "simple")
                if r > 0:
                    _lf_edge(Y, y0, cols, True, 0, mb_lim, 0, "simple")
                if inner[r, c]:
                    for k in (4, 8, 12):
                        _lf_edge(Y, y0 + k, cols, True, 0, sub_lim,
                                 0, "simple")
                continue
            uv0, ux0 = r * 8 + 1, c * 8 + 1
            urows = slice(uv0, uv0 + 8)
            ucols = slice(ux0, ux0 + 8)
            if c > 0:
                _lf_edge(Y, x0, rows, False, interior, mb_lim, hev_t, "mb")
                for P in (U, V):
                    _lf_edge(P, ux0, urows, False, interior, mb_lim,
                             hev_t, "mb")
            if inner[r, c]:
                for k in (4, 8, 12):
                    _lf_edge(Y, x0 + k, rows, False, interior, sub_lim,
                             hev_t, "sub")
                for P in (U, V):
                    _lf_edge(P, ux0 + 4, urows, False, interior, sub_lim,
                             hev_t, "sub")
            if r > 0:
                _lf_edge(Y, y0, cols, True, interior, mb_lim, hev_t, "mb")
                for P in (U, V):
                    _lf_edge(P, uv0, ucols, True, interior, mb_lim,
                             hev_t, "mb")
            if inner[r, c]:
                for k in (4, 8, 12):
                    _lf_edge(Y, y0 + k, cols, True, interior, sub_lim,
                             hev_t, "sub")
                for P in (U, V):
                    _lf_edge(P, uv0 + 4, ucols, True, interior, sub_lim,
                             hev_t, "sub")


# ----------------------------------------------------------------------
# frame decode
# ----------------------------------------------------------------------


def _parse_frame_header(data: bytes):
    if len(data) < 10:
        raise ValueError("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    frame_type = tag & 1
    part1_size = tag >> 5
    if frame_type != 0:
        raise NotImplementedError(
            "VP8 inter frame: only key frames (stills) are supported — "
            "the same declared seam as H.264 video")
    if bytes(data[3:6]) != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 key-frame start code")
    wtag = data[6] | (data[7] << 8)
    htag = data[8] | (data[9] << 8)
    w, h = wtag & 0x3FFF, htag & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("zero VP8 dimensions")
    if 10 + part1_size > len(data):
        raise ValueError("truncated VP8 first partition")
    return w, h, data[10:10 + part1_size], data[10 + part1_size:]


def meta(data: bytes) -> tuple[int, int]:
    w, h, _, _ = _parse_frame_header(data)
    return w, h


_SEG_TREE = np.array([2, 4, 0, -1, -2, -3], dtype=np.int64)


class Vp8ForeignStreamError(ValueError):
    """Raised for VP8 streams that do not match this module's own
    encoder shape (round 5, ADVICE r4 HIGH): the entropy tables in
    vp8_tables.py are transcribed from memory, so a stream produced by
    a real encoder (libvpx) whose priors differ does not raise — the
    bool decoder silently desynchronizes and returns plausible-but-
    garbage pixels, which would feed WRONG perceptual signatures into
    dedup. Until the tables are conformance-verified (the skip-if-
    absent libvpx test in tests/test_optional_deps.py), any stream
    showing non-internal header features — coef-prob updates, loop-
    filter adjustments, quantizer deltas, foreign segmentation shape —
    is REJECTED here so the ingest path quarantines it with attribution
    instead of mis-decoding. Internal-encoder round trips are
    unaffected."""


def _read_header_flags(d1: BoolDecoder, marks: list | None = None):
    """First-partition header after the uncompressed chunk; returns
    (coef_probs, num_parts, per_segment_qindex_factors, skip_prob or
    None, (filter_type, filter_level, sharpness), seg) where seg is
    the parsed segmentation state (round 4 — closes the
    segmentation NotImplementedError seam: segment map + per-segment
    quantizer/filter features per RFC 6386 sections 9.3/10).

    `marks` (round 5) collects provenance marks: header features our
    own encoder never writes, i.e. evidence the stream came from a
    foreign encoder whose entropy priors we cannot yet trust."""
    if marks is None:
        marks = []
    if d1.literal(1):  # color space
        marks.append("color-space")
    if d1.literal(1):  # clamping type
        marks.append("clamping")
    seg = {"enabled": False, "update_map": False, "abs_mode": False,
           "q": [0, 0, 0, 0], "lf": [0, 0, 0, 0],
           "tree_probs": [255, 255, 255]}
    if d1.bit():  # segmentation_enabled
        seg["enabled"] = True
        seg["update_map"] = bool(d1.bit())
        update_data = d1.bit()
        if update_data:
            seg["abs_mode"] = bool(d1.bit())
            for i in range(4):
                if d1.bit():
                    seg["q"][i] = d1.signed_literal(7)
            for i in range(4):
                if d1.bit():
                    seg["lf"][i] = d1.signed_literal(6)
        if seg["update_map"]:
            for i in range(3):
                if d1.bit():
                    seg["tree_probs"][i] = d1.literal(8)
        if (not seg["update_map"] or not update_data
                or not seg["abs_mode"]
                or seg["tree_probs"] != [255, 255, 255]):
            marks.append("segmentation-shape")
    filter_type = d1.literal(1)
    if filter_type:
        marks.append("simple-filter")
    filter_level = d1.literal(6)
    sharpness = d1.literal(3)
    if d1.bit():  # loop_filter_adj_enabled
        marks.append("lf-adjustments")
        if d1.bit():  # mode_ref_lf_delta_update
            for _ in range(8):
                if d1.bit():
                    d1.signed_literal(6)
    num_parts = 1 << d1.literal(2)
    y_ac_qi = d1.literal(7)
    deltas = []
    for _ in range(5):  # y_dc, y2_dc, y2_ac, uv_dc, uv_ac
        deltas.append(d1.signed_literal(4) if d1.bit() else 0)
    if any(deltas):
        marks.append("quant-deltas")
    if not d1.bit():  # refresh entropy probs (key frame; we write 1)
        marks.append("no-entropy-refresh")
    probs = T.DEFAULT_COEF_PROBS.copy()
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for n in range(11):
                    if d1.bit(int(T.COEF_UPDATE_PROBS[t, b, c, n])):
                        probs[t, b, c, n] = d1.literal(8)
                        marks.append("coef-prob-update")
    skip_prob = d1.literal(8) if d1.bit() else None  # mb_no_coeff_skip
    if skip_prob is None:
        marks.append("no-skip-prob")

    def q_for(base_qi: int) -> dict:
        return {
            "y": (int(T.DC_QLOOKUP[np.clip(base_qi + deltas[0], 0, 127)]),
                  int(T.AC_QLOOKUP[np.clip(base_qi, 0, 127)])),
            "y2": (int(T.DC_QLOOKUP[np.clip(base_qi + deltas[1], 0,
                                            127)]) * 2,
                   max(8, int(T.AC_QLOOKUP[np.clip(base_qi + deltas[2], 0,
                                                   127)]) * 155 // 100)),
            "uv": (min(132, int(T.DC_QLOOKUP[np.clip(base_qi + deltas[3],
                                                     0, 127)])),
                   int(T.AC_QLOOKUP[np.clip(base_qi + deltas[4], 0,
                                            127)])),
        }

    if seg["enabled"]:
        qs = [q_for(sq if seg["abs_mode"] else y_ac_qi + sq)
              for sq in seg["q"]]
    else:
        qs = [q_for(y_ac_qi)]
    return probs, num_parts, qs, skip_prob, \
        (filter_type, filter_level, sharpness), seg


def decode_frame(data: bytes, allow_foreign: bool = False,
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """VP8 key-frame payload -> (Y, U, V) uint8 planes (cropped).

    Streams showing header features our own encoder never emits are
    rejected with Vp8ForeignStreamError unless `allow_foreign=True`
    (the conformance-test escape hatch) — see that class's docstring
    for why mis-decoding is silent and must be gated up front."""
    w, h, part1, rest = _parse_frame_header(data)
    d1 = BoolDecoder(part1)
    marks: list = []
    probs, num_parts, qs, skip_prob, (ftype, flevel, fsharp), seg = \
        _read_header_flags(d1, marks)
    if marks and not allow_foreign:
        raise Vp8ForeignStreamError(
            "non-internal VP8 header features "
            f"{sorted(set(marks))}: entropy tables are unverified "
            "against real encoders — stream quarantined rather than "
            "risk a silent bool-decoder desync (pass "
            "allow_foreign=True only for conformance testing)")

    # token partition table
    if num_parts > 1:
        sizes = []
        p = 0
        for _ in range(num_parts - 1):
            sizes.append(rest[p] | (rest[p + 1] << 8) | (rest[p + 2] << 16))
            p += 3
        chunks = []
        base = p
        for s in sizes:
            chunks.append(rest[base:base + s])
            base += s
        chunks.append(rest[base:])
        d2s = [BoolDecoder(c) for c in chunks]
    else:
        d2s = [BoolDecoder(rest)]

    mb_cols = (w + 15) // 16
    mb_rows = (h + 15) // 16

    # --- pass 1: per-MB mode records from partition 1 -----------------
    ymodes = np.empty((mb_rows, mb_cols), np.int64)
    uvmodes = np.empty((mb_rows, mb_cols), np.int64)
    skips = np.zeros((mb_rows, mb_cols), np.int64)
    seg_ids = np.zeros((mb_rows, mb_cols), np.int64)
    bmodes: dict[tuple[int, int], np.ndarray] = {}
    # above/left submode context rows (B_DC when out of frame)
    above_sub = np.full((mb_cols, 4), T.B_DC_PRED, np.int64)
    for r in range(mb_rows):
        left_sub = np.full(4, T.B_DC_PRED, np.int64)
        for c in range(mb_cols):
            if seg["update_map"]:  # segment id precedes the skip flag
                seg_ids[r, c] = tree_read(d1, _SEG_TREE,
                                          seg["tree_probs"])
            if skip_prob is not None:
                skips[r, c] = d1.bit(skip_prob)
            ym = tree_read(d1, T.KF_YMODE_TREE, T.KF_YMODE_PROB)
            ymodes[r, c] = ym
            if ym == T.B_PRED:
                sub = np.empty((4, 4), np.int64)
                for br in range(4):
                    for bc in range(4):
                        # context = (above, left) submodes; the real
                        # kf table is context-indexed — fallback table
                        # documented in vp8_tables
                        sub[br, bc] = tree_read(d1, T.BMODE_TREE,
                                                T.B_MODE_PROB_FALLBACK)
                bmodes[(r, c)] = sub
                above_sub[c] = sub[3]
                left_sub = sub[:, 3]
            else:
                bsub = T.MODE_TO_BMODE[ym]
                above_sub[c] = bsub
                left_sub[:] = bsub
            uvmodes[r, c] = tree_read(d1, T.UV_MODE_TREE, T.KF_UV_MODE_PROB)

    # --- pass 2: tokens + reconstruction ------------------------------
    yw, xw = mb_rows * 16, mb_cols * 16
    Y = np.empty((yw + 1, xw + 1 + 4), np.uint8)
    Y[0, :] = 127
    Y[:, 0] = 129
    Y[0, 0] = 127
    U = np.empty((yw // 2 + 1, xw // 2 + 1), np.uint8)
    V = np.empty_like(U)
    for P in (U, V):
        P[0, :] = 127
        P[:, 0] = 129
        P[0, 0] = 127

    # nonzero contexts: per plane, per 4x4 column/row
    above_nz = np.zeros((mb_cols, 9), np.int64)  # 4Y 2U 2V 1Y2
    # loop-filter inner-edge eligibility: MB has coefficients or B_PRED
    inner = np.zeros((mb_rows, mb_cols), bool)
    for r in range(mb_rows):
        left_nz = np.zeros(9, np.int64)
        d2 = d2s[r % num_parts]
        for c in range(mb_cols):
            ym = int(ymodes[r, c])
            has_y2 = ym != T.B_PRED
            q = qs[int(seg_ids[r, c])] if seg["enabled"] else qs[0]
            if skips[r, c]:
                coefs_y = np.zeros((16, 4, 4), np.int64)
                coefs_u = np.zeros((4, 4, 4), np.int64)
                coefs_v = np.zeros((4, 4, 4), np.int64)
                y2_dcs = np.zeros(16, np.int64)
                if has_y2:
                    above_nz[c, :] = 0
                    left_nz[:] = 0
                else:
                    above_nz[c, :8] = 0
                    left_nz[:8] = 0
            else:
                y2_dcs = np.zeros(16, np.int64)
                if has_y2:
                    ctx = int(above_nz[c, 8] + left_nz[8])
                    blk, nz = decode_coeffs(d2, probs[1], 0, ctx,
                                            q["y2"][0], q["y2"][1])
                    above_nz[c, 8] = left_nz[8] = nz
                    y2_dcs = iwht4x4(blk)
                btype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                coefs_y = np.empty((16, 4, 4), np.int64)
                for b in range(16):
                    br, bc = b // 4, b % 4
                    ctx = int(above_nz[c, bc] + left_nz[br])
                    blk, nz = decode_coeffs(d2, probs[btype], first, ctx,
                                            q["y"][0], q["y"][1])
                    if has_y2:
                        blk[0, 0] = y2_dcs[b]
                    coefs_y[b] = blk
                    above_nz[c, bc] = left_nz[br] = nz
                coefs_u = np.empty((4, 4, 4), np.int64)
                coefs_v = np.empty((4, 4, 4), np.int64)
                for pi, (cf, off) in enumerate(((coefs_u, 4),
                                                (coefs_v, 6))):
                    for b in range(4):
                        br, bc = b // 2, b % 2
                        ctx = int(above_nz[c, off + bc]
                                  + left_nz[off + br])
                        blk, nz = decode_coeffs(d2, probs[2], 0, ctx,
                                                q["uv"][0], q["uv"][1])
                        cf[b] = blk
                        above_nz[c, off + bc] = left_nz[off + br] = nz
            if not skips[r, c]:
                inner[r, c] = bool(coefs_y.any() or coefs_u.any()
                                   or coefs_v.any() or y2_dcs.any())
            if ym == T.B_PRED:
                inner[r, c] = True
            # ---- reconstruct luma ----
            y0, x0 = r * 16 + 1, c * 16 + 1
            res = idct4x4(coefs_y)
            if ym != T.B_PRED:
                above = Y[y0 - 1, x0:x0 + 16].astype(np.int32)
                left = Y[y0:y0 + 16, x0 - 1].astype(np.int32)
                corner = int(Y[y0 - 1, x0 - 1])
                pred = predict_block(ym, above, left, corner, 16,
                                     r > 0, c > 0)
                mbout = np.empty((16, 16), np.int32)
                for b in range(16):
                    br, bc = b // 4, b % 4
                    mbout[br * 4:br * 4 + 4, bc * 4:bc * 4 + 4] = \
                        pred[br * 4:br * 4 + 4, bc * 4:bc * 4 + 4] + res[b]
                Y[y0:y0 + 16, x0:x0 + 16] = _clip8(mbout).astype(np.uint8)
            else:
                sub = bmodes[(r, c)]
                for b in range(16):
                    br, bc = b // 4, b % 4
                    by, bx = y0 + br * 4, x0 + bc * 4
                    a = Y[by - 1, bx:bx + 4].astype(np.int64)
                    # above-right: for the MB's right-column subblocks
                    # the spatial neighbors aren't decoded yet — the
                    # above MB row's pixels are used instead (libvpx
                    # convention); the +4 frame pad is kept replicated
                    ar_row = y0 - 1 if bc == 3 else by - 1
                    ar = Y[ar_row, bx + 4:bx + 8].astype(np.int64)
                    l = Y[by:by + 4, bx - 1].astype(np.int64)
                    p = int(Y[by - 1, bx - 1])
                    pred = predict_b4(int(sub[br, bc]), a, l, p, ar)
                    Y[by:by + 4, bx:bx + 4] = _clip8(
                        pred + res[b]).astype(np.uint8)

            # ---- reconstruct chroma ----
            uv0, ux0 = r * 8 + 1, c * 8 + 1
            for P, cf in ((U, coefs_u), (V, coefs_v)):
                above = P[uv0 - 1, ux0:ux0 + 8].astype(np.int32)
                left = P[uv0:uv0 + 8, ux0 - 1].astype(np.int32)
                corner = int(P[uv0 - 1, ux0 - 1])
                pred = predict_block(int(uvmodes[r, c]), above, left,
                                     corner, 8, r > 0, c > 0)
                resuv = idct4x4(cf)
                out = np.empty((8, 8), np.int32)
                for b in range(4):
                    br, bc = b // 2, b % 2
                    out[br * 4:br * 4 + 4, bc * 4:bc * 4 + 4] = \
                        pred[br * 4:br * 4 + 4, bc * 4:bc * 4 + 4] + resuv[b]
                P[uv0:uv0 + 8, ux0:ux0 + 8] = _clip8(out).astype(np.uint8)

        # keep the +4 right pad replicated so the next MB row's
        # above-right reads are defined at the frame edge
        Y[r * 16 + 1:r * 16 + 17, xw + 1:] = \
            Y[r * 16 + 1:r * 16 + 17, xw][:, None]

    # desync tripwire (round 5, ADVICE r4): a wrong entropy prior makes
    # a bool decoder read past its partition end (zero-feed) without
    # ever raising — reject the decode instead of returning plausible-
    # but-garbage pixels. Correct streams stop within the 2-byte
    # preload + one lookahead byte of their data.
    for bd in [d1] + d2s:
        if bd.pos > len(bd.data) + 4:
            raise Vp8ForeignStreamError(
                f"bool decoder overran its partition by "
                f"{bd.pos - len(bd.data)} bytes — desynchronized "
                "stream (foreign entropy priors?); quarantined")

    if seg["enabled"]:
        base = np.array(seg["lf"], np.int64)
        if not seg["abs_mode"]:
            base = flevel + base
        levels = np.clip(base, 0, 63)[seg_ids]
    else:
        levels = np.full((mb_rows, mb_cols), flevel, np.int64)
    if levels.any():
        _loop_filter(Y, U, V, mb_rows, mb_cols, ftype, levels, fsharp,
                     inner)

    return (Y[1:h + 1, 1:w + 1].copy(),
            U[1:(h + 1) // 2 + 1, 1:(w + 1) // 2 + 1].copy(),
            V[1:(h + 1) // 2 + 1, 1:(w + 1) // 2 + 1].copy())


def decode(data: bytes, allow_foreign: bool = False) -> np.ndarray:
    """VP8 key-frame payload -> (h, w, 3) uint8 RGB. Foreign-shape
    streams raise Vp8ForeignStreamError unless allow_foreign (see
    decode_frame)."""
    from .jpeg import _ycbcr_to_rgb
    y, u, v = decode_frame(data, allow_foreign=allow_foreign)
    h, w = y.shape
    ub = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w]
    vb = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w]
    ycc = np.stack([y.astype(np.float64), ub.astype(np.float64),
                    vb.astype(np.float64)], axis=-1)
    return _ycbcr_to_rgb(ycc)


# ----------------------------------------------------------------------
# frame encode
# ----------------------------------------------------------------------


def _quantize(coefs: np.ndarray, dq_dc: int, dq_ac: int,
              first: int = 0) -> np.ndarray:
    """Nearest-multiple quantization of raster (.., 4, 4) coefficients
    (encoder choice; decoder only sees the quotients)."""
    q = np.empty_like(coefs)
    flat = coefs.reshape(coefs.shape[0], 16) if coefs.ndim == 3 else \
        coefs.reshape(1, 16)
    dq = np.full(16, dq_ac, np.int64)
    dq[0] = dq_dc
    qf = np.rint(flat / dq).astype(np.int64)
    qf = np.clip(qf, -2047, 2047)
    if first == 1:
        qf[:, 0] = 0
    return qf.reshape(coefs.shape)


def _mb_plane_pad(plane: np.ndarray, mbs: int) -> np.ndarray:
    """Edge-pad a plane to a multiple of `mbs`."""
    h, w = plane.shape
    H = -(-h // mbs) * mbs
    W = -(-w // mbs) * mbs
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def encode(rgb: np.ndarray, qindex: int = 6, filter_level: int = 0,
           sharpness: int = 0, segments: list | None = None,
           token_partitions: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB -> VP8 key-frame payload (one token
    partition, no segmentation, 16x16 intra only, best-of-DC/V/H/TM
    per macroblock). `filter_level` > 0 signals the normal in-loop
    deblocking filter to the decoder (display-side only — VP8 intra
    prediction uses unfiltered pixels, so the encode loop is
    unchanged); the default 0 keeps fixture bytes stable.
    `segments` (up to 4 ABSOLUTE qindex values) enables segmentation:
    MB (r, c) is assigned segment (r + c) % len(segments) and coded in
    the segment map, each segment quantized at its own qindex — the
    adaptive-quantization shape real encoders emit."""
    from .jpeg import _rgb_to_ycbcr
    rgb = np.ascontiguousarray(rgb)
    h, w = rgb.shape[:2]
    if h == 0 or w == 0 or h > 0x3FFF or w > 0x3FFF:
        raise ValueError("bad VP8 dimensions")
    ycc = _rgb_to_ycbcr(rgb)
    ysrc = np.clip(np.rint(ycc[..., 0]), 0, 255).astype(np.int32)
    # 4:2:0: 2x2 box average (pad odd dims first)
    cb = np.pad(ycc[..., 1], ((0, h % 2), (0, w % 2)), mode="edge")
    cr = np.pad(ycc[..., 2], ((0, h % 2), (0, w % 2)), mode="edge")
    usrc = np.clip(np.rint(
        (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2]
         + cb[1::2, 1::2]) / 4), 0, 255).astype(np.int32)
    vsrc = np.clip(np.rint(
        (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2]
         + cr[1::2, 1::2]) / 4), 0, 255).astype(np.int32)

    mb_cols = (w + 15) // 16
    mb_rows = (h + 15) // 16
    ysrc = _mb_plane_pad(ysrc, 16)[:mb_rows * 16, :mb_cols * 16]
    usrc = _mb_plane_pad(usrc, 8)[:mb_rows * 8, :mb_cols * 8]
    vsrc = _mb_plane_pad(vsrc, 8)[:mb_rows * 8, :mb_cols * 8]

    if segments:
        if not 1 <= len(segments) <= 4:
            raise ValueError("1..4 segments")
        q_list = [quant_factors(si) for si in segments]
    else:
        q_list = [quant_factors(qindex)]
    nseg = len(q_list)

    # reconstruction buffers (the encoder must predict from what the
    # decoder will reconstruct, not from the source)
    Y = np.empty((mb_rows * 16 + 1, mb_cols * 16 + 1 + 4), np.uint8)
    Y[0, :] = 127
    Y[:, 0] = 129
    Y[0, 0] = 127
    U = np.empty((mb_rows * 8 + 1, mb_cols * 8 + 1), np.uint8)
    Vp = np.empty_like(U)
    for P in (U, Vp):
        P[0, :] = 127
        P[:, 0] = 129
        P[0, 0] = 127

    be_hdr = BoolEncoder()  # partition 1: header + modes
    if token_partitions not in (1, 2, 4, 8):
        raise ValueError("token_partitions must be 1, 2, 4 or 8")
    be_toks = [BoolEncoder() for _ in range(token_partitions)]

    # header flags (see _read_header_flags for the field walk)
    be_hdr.literal(0, 1)  # color space
    be_hdr.literal(0, 1)  # clamping
    if segments:
        be_hdr.bit(1)   # segmentation enabled
        be_hdr.bit(1)   # update map
        be_hdr.bit(1)   # update feature data
        be_hdr.bit(1)   # absolute mode
        for i in range(4):
            if i < nseg:
                be_hdr.bit(1)
                be_hdr.signed_literal(int(np.clip(segments[i], 0, 127)),
                                      7)
            else:
                be_hdr.bit(0)
        # abs-mode feature data replaces (not offsets) the frame-level
        # values, so each active segment must carry the loop-filter
        # level explicitly — all-zero features would silently resolve
        # every segment's filter level to 0 and kill `filter_level`
        lf_abs = int(np.clip(filter_level, 0, 63))
        for i in range(4):
            if i < nseg:
                be_hdr.bit(1)
                be_hdr.signed_literal(lf_abs, 6)
            else:
                be_hdr.bit(0)
        for _ in range(3):
            be_hdr.bit(0)  # tree probs stay at the 255 defaults
    else:
        be_hdr.bit(0)  # segmentation
    be_hdr.literal(0, 1)  # filter type (normal)
    be_hdr.literal(int(np.clip(filter_level, 0, 63)), 6)
    be_hdr.literal(int(np.clip(sharpness, 0, 7)), 3)
    be_hdr.bit(0)  # lf adjustments
    be_hdr.literal({1: 0, 2: 1, 4: 2, 8: 3}[token_partitions], 2)
    be_hdr.literal(int(np.clip(qindex, 0, 127)), 7)
    for _ in range(5):
        be_hdr.bit(0)  # no quant deltas
    be_hdr.bit(1)  # refresh entropy probs
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for n in range(11):
                    be_hdr.bit(0, int(T.COEF_UPDATE_PROBS[t, b, c, n]))
    skip_prob = 128
    be_hdr.bit(1)  # mb_no_coeff_skip on
    be_hdr.literal(skip_prob, 8)

    probs = T.DEFAULT_COEF_PROBS

    # two queues: mode records must be interleaved per MB in raster
    # order in partition 1; with all decisions made inline we can emit
    # directly in one pass
    above_nz = np.zeros((mb_cols, 9), np.int64)
    mode_records = []  # (skip, ymode, uvmode) per MB, raster
    token_bits = []  # deferred per-MB token closures
    for r in range(mb_rows):
        left_nz = np.zeros(9, np.int64)
        be_tok = be_toks[r % token_partitions]
        for c in range(mb_cols):
            seg_id = (r + c) % nseg if segments else 0
            q = q_list[seg_id]
            y0, x0 = r * 16 + 1, c * 16 + 1
            src = ysrc[r * 16:r * 16 + 16, c * 16:c * 16 + 16]
            above = Y[y0 - 1, x0:x0 + 16].astype(np.int32)
            left = Y[y0:y0 + 16, x0 - 1].astype(np.int32)
            corner = int(Y[y0 - 1, x0 - 1])
            # pick the 16x16 mode by SAD over candidate predictions
            best, best_sad, best_pred = None, None, None
            for m in (T.DC_PRED, T.V_PRED, T.H_PRED, T.TM_PRED):
                pr = predict_block(m, above, left, corner, 16,
                                   r > 0, c > 0)
                sad = int(np.abs(src - pr).sum())
                if best_sad is None or sad < best_sad:
                    best, best_sad, best_pred = m, sad, pr
            ym, pred = best, best_pred
            resid = src - pred
            blocks = resid.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
                .reshape(16, 4, 4)
            coefs = fdct4x4(blocks)
            y2_in = coefs[:, 0, 0].reshape(4, 4)
            y2 = fwht4x4(y2_in)
            qy2 = _quantize(y2[None], q["y2"][0], q["y2"][1])[0]
            qy = _quantize(coefs, q["y"][0], q["y"][1], first=1)

            # chroma
            uv0, ux0 = r * 8 + 1, c * 8 + 1
            usb = usrc[r * 8:r * 8 + 8, c * 8:c * 8 + 8]
            vsb = vsrc[r * 8:r * 8 + 8, c * 8:c * 8 + 8]
            ua = U[uv0 - 1, ux0:ux0 + 8].astype(np.int32)
            ul = U[uv0:uv0 + 8, ux0 - 1].astype(np.int32)
            uc = int(U[uv0 - 1, ux0 - 1])
            va = Vp[uv0 - 1, ux0:ux0 + 8].astype(np.int32)
            vl = Vp[uv0:uv0 + 8, ux0 - 1].astype(np.int32)
            vc = int(Vp[uv0 - 1, ux0 - 1])
            bestu, bsad = None, None
            for m in (T.DC_PRED, T.V_PRED, T.H_PRED, T.TM_PRED):
                pu = predict_block(m, ua, ul, uc, 8, r > 0, c > 0)
                pv = predict_block(m, va, vl, vc, 8, r > 0, c > 0)
                sad = int(np.abs(usb - pu).sum()) + \
                    int(np.abs(vsb - pv).sum())
                if bsad is None or sad < bsad:
                    bestu, bsad = m, sad
            uvm = bestu
            pu = predict_block(uvm, ua, ul, uc, 8, r > 0, c > 0)
            pv = predict_block(uvm, va, vl, vc, 8, r > 0, c > 0)
            ublocks = (usb - pu).reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                .reshape(4, 4, 4)
            vblocks = (vsb - pv).reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                .reshape(4, 4, 4)
            qu = _quantize(fdct4x4(ublocks), q["uv"][0], q["uv"][1])
            qv = _quantize(fdct4x4(vblocks), q["uv"][0], q["uv"][1])

            skip = (not qy2.any() and not qy.any() and not qu.any()
                    and not qv.any())
            mode_records.append((seg_id, int(skip), ym, uvm))

            # ---- emit tokens + update nz contexts ----
            if skip:
                above_nz[c, :] = 0
                left_nz[:] = 0
            else:
                ctx = int(above_nz[c, 8] + left_nz[8])
                nz = encode_coeffs(be_tok, probs[1], 0, ctx, qy2)
                above_nz[c, 8] = left_nz[8] = nz
                for b in range(16):
                    br, bc = b // 4, b % 4
                    ctx = int(above_nz[c, bc] + left_nz[br])
                    nz = encode_coeffs(be_tok, probs[0], 1, ctx, qy[b])
                    above_nz[c, bc] = left_nz[br] = nz
                for off, qc in ((4, qu), (6, qv)):
                    for b in range(4):
                        br, bc = b // 2, b % 2
                        ctx = int(above_nz[c, off + bc]
                                  + left_nz[off + br])
                        nz = encode_coeffs(be_tok, probs[2], 0, ctx,
                                           qc[b])
                        above_nz[c, off + bc] = left_nz[off + br] = nz

            # ---- reconstruct exactly as the decoder will ----
            dqy = qy.reshape(16, 16) * np.where(
                np.arange(16) == 0, q["y"][0], q["y"][1])
            y2_deq = qy2 * np.array(
                [[q["y2"][0]] + [q["y2"][1]] * 3] + [[q["y2"][1]] * 4] * 3,
                np.int64)
            dcs = iwht4x4(y2_deq)
            dqy = dqy.reshape(16, 4, 4)
            dqy[:, 0, 0] = dcs
            res = idct4x4(dqy)
            mbout = np.empty((16, 16), np.int32)
            for b in range(16):
                br, bc = b // 4, b % 4
                mbout[br * 4:br * 4 + 4, bc * 4:bc * 4 + 4] = \
                    pred[br * 4:br * 4 + 4, bc * 4:bc * 4 + 4] + res[b]
            Y[y0:y0 + 16, x0:x0 + 16] = _clip8(mbout).astype(np.uint8)
            for P, qc, pr in ((U, qu, pu), (Vp, qv, pv)):
                dq = qc.reshape(4, 16) * np.where(
                    np.arange(16) == 0, q["uv"][0], q["uv"][1])
                ruv = idct4x4(dq.reshape(4, 4, 4))
                out = np.empty((8, 8), np.int32)
                for b in range(4):
                    br, bc = b // 2, b % 2
                    out[br * 4:br * 4 + 4, bc * 4:bc * 4 + 4] = \
                        pr[br * 4:br * 4 + 4, bc * 4:bc * 4 + 4] + ruv[b]
                P[uv0:uv0 + 8, ux0:ux0 + 8] = _clip8(out).astype(np.uint8)

    # mode records into partition 1 (after header flags); segment
    # id precedes the skip flag when the map is coded
    seg_paths = tree_paths(_SEG_TREE) if segments else None
    for seg_id, skip, ym, uvm in mode_records:
        if segments:
            tree_write(be_hdr, seg_paths, (255, 255, 255), seg_id)
        be_hdr.bit(skip, skip_prob)
        tree_write(be_hdr, _KF_YMODE_PATHS, T.KF_YMODE_PROB, ym)
        tree_write(be_hdr, _UV_MODE_PATHS, T.KF_UV_MODE_PROB, uvm)

    part1 = be_hdr.finish()
    parts = [e.finish() for e in be_toks]
    table = b"".join(
        len(pt).to_bytes(3, "little") for pt in parts[:-1])
    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                  0x9D, 0x01, 0x2A,
                  w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
    return head + part1 + table + b"".join(parts)
