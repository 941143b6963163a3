"""WebP container + lossless (VP8L) codec — pure numpy/Python.

Decoder: the full VP8L still-image bitstream per RFC 9649 (WebP) —
RIFF/WEBP chunk walk (VP8X containers dispatch to their VP8L chunk),
LSB-first bit reading, all four transforms (predictor with its 14
modes and block-level mode subimage, cross-color, subtract-green,
color-indexing incl. sub-byte pixel bundling), meta-Huffman code
groups, canonical DEFLATE-style prefix codes (simple and
code-length-coded forms, 16/17/18 repeats), LZ77 backward references
with the 120-entry 2D distance neighborhood, and the hash-keyed color
cache. LOSSY `VP8 ` chunks dispatch to the RFC 6386 key-frame codec
in vp8.py (round 4 — closing round 3's declared seam), so decode()
handles both WebP flavors through one call.

Encoder: a valid VP8L writer — optional subtract-green transform,
canonical Huffman codes per channel (length-limited), optional
previous-pixel LZ77 runs, single-symbol simple codes for the unused
alpha/distance alphabets — enough that the decoder's literal, copy,
transform and code-building paths are exercised by our own round
trips. No attempt at libwebp-level ratios.

Public spec: RFC 9649 (WebP Image Format), sections 3 (RIFF
container) and 5 (VP8L bitstream). Reference parity note: the destor
reference treats payloads as opaque chunk streams; image-format
awareness is this repo's multimodal extension (SURVEY §6), not a
port.
"""

from __future__ import annotations

import struct

import numpy as np


def is_webp(data) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WEBP"


# The RFC 9649 distance-code neighborhood: codes 1..120 map to the
# (dx, dy) offsets below (dist = dy * width + dx, clamped to >= 1);
# codes > 120 mean dist = code - 120.
_DIST_OFFSETS = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (8, 0), (6, 5),
    (-6, 5), (8, 1), (8, 2), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 3),
    (6, 6), (-6, 6), (8, 4), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 5),
    (7, 6), (-7, 6), (8, 6), (7, 7), (-7, 7), (8, 7),
]

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15]


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.data) * 8:
            # fabricating zero bits would decode garbage pixels from a
            # truncated shard instead of routing it to quarantine
            raise ValueError("truncated VP8L stream")
        byte0 = self.pos >> 3
        window = int.from_bytes(
            self.data[byte0:byte0 + (((self.pos & 7) + n + 7) >> 3)],
            "little")
        val = (window >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos += n
        return val


class _Huffman:
    """Canonical prefix code (DEFLATE numbering): decode reads the
    code MSB-first, one bit at a time, off the LSB-first stream."""

    __slots__ = ("single", "counts", "firsts", "offsets", "symbols",
                 "max_len")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 0:
            raise ValueError("empty Huffman code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        self.single = None
        nz.sort()
        self.max_len = nz[-1][0]
        counts = [0] * (self.max_len + 1)
        for ln, _ in nz:
            counts[ln] += 1
        firsts = [0] * (self.max_len + 1)
        offsets = [0] * (self.max_len + 1)
        code = 0
        idx = 0
        for ln in range(1, self.max_len + 1):
            code <<= 1
            firsts[ln] = code
            offsets[ln] = idx
            code += counts[ln]
            idx += counts[ln]
        if code != (1 << self.max_len):
            raise ValueError("over/under-subscribed Huffman code")
        self.counts = counts
        self.firsts = firsts
        self.offsets = offsets
        self.symbols = [sym for _, sym in nz]

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            d = code - self.firsts[ln]
            if 0 <= d < self.counts[ln]:
                return self.symbols[self.offsets[ln] + d]
        raise ValueError("corrupt Huffman stream")


def _read_code_lengths(br: _BitReader, alphabet: int) -> _Huffman:
    """One prefix code: simple (1-2 symbols) or code-length-coded."""
    if br.read(1):  # simple
        n_sym = br.read(1) + 1
        first_8 = br.read(1)
        s0 = br.read(8 if first_8 else 1)
        lengths = [0] * alphabet
        lengths[s0] = 1  # single-symbol codes read 0 bits in _Huffman
        if n_sym == 2:
            lengths[br.read(8)] = 1
        return _Huffman(lengths)
    n_clc = 4 + br.read(4)
    clc_len = [0] * 19
    for i in range(n_clc):
        clc_len[_CLC_ORDER[i]] = br.read(3)
    clc = _Huffman(clc_len)
    if br.read(1):  # bounded symbol count
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = clc.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _Huffman(lengths)


def _prefix_value(br: _BitReader, prefix: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §5.2.3)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _div_ceil(a: int, b: int) -> int:
    return -(-a // b)


def _decode_image_stream(br: _BitReader, w: int, h: int,
                         level0: bool):
    """Returns (argb uint32 array (h, w), final_width) — final_width
    differs from w when a color-indexing transform bundles pixels."""
    transforms = []
    xsize = w
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                tw, th = _div_ceil(xsize, 1 << bits), _div_ceil(h, 1 << bits)
                timg, _ = _decode_image_stream(br, tw, th, False)
                transforms.append(("pred", bits, timg))
            elif ttype == 1:  # cross-color
                bits = br.read(3) + 2
                tw, th = _div_ceil(xsize, 1 << bits), _div_ceil(h, 1 << bits)
                timg, _ = _decode_image_stream(br, tw, th, False)
                transforms.append(("color", bits, timg))
            elif ttype == 2:  # subtract green
                transforms.append(("subg",))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal, _ = _decode_image_stream(br, n_colors, 1, False)
                pal = np.cumsum(pal.astype(np.uint32).view(np.uint8)
                                .reshape(-1, 4), axis=0,
                                dtype=np.uint8).reshape(-1, 4) \
                    .copy().view(np.uint32).reshape(-1)
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append(("index", wbits, pal, xsize))
                xsize = _div_ceil(xsize, 1 << wbits)

    cache_bits = br.read(4) if br.read(1) else 0
    cache_size = (1 << cache_bits) if cache_bits else 0

    himg = None
    hbits = 0
    hw = 0
    n_groups = 1
    if level0 and br.read(1):
        hbits = br.read(3) + 2
        hw, hh = _div_ceil(xsize, 1 << hbits), _div_ceil(h, 1 << hbits)
        hi, _ = _decode_image_stream(br, hw, hh, False)
        himg = (((hi >> np.uint32(8)) & np.uint32(0xFFFF))
                .astype(np.int64)).reshape(-1)
        n_groups = int(himg.max()) + 1

    groups = []
    for _ in range(n_groups):
        green = _read_code_lengths(br, 256 + 24 + cache_size)
        red = _read_code_lengths(br, 256)
        blue = _read_code_lengths(br, 256)
        alpha = _read_code_lengths(br, 256)
        dist = _read_code_lengths(br, 40)
        groups.append((green, red, blue, alpha, dist))

    n_px = xsize * h
    out = np.zeros(n_px, np.uint32)
    cache = np.zeros(cache_size, np.uint32) if cache_size else None
    pos = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    use_meta = himg is not None
    while pos < n_px:
        if use_meta:
            x, y = pos % xsize, pos // xsize
            gi = int(himg[(y >> hbits) * hw + (x >> hbits)])
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
        S = g_green.read(br)
        if S < 256:
            r = g_red.read(br)
            b = g_blue.read(br)
            a = g_alpha.read(br)
            px = np.uint32((a << 24) | (r << 16) | (S << 8) | b)
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(int(px) * 0x1E35A7BD & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = px
        elif S < 280:
            length = _prefix_value(br, S - 256)
            dcode = _prefix_value(br, g_dist.read(br))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_OFFSETS[dcode - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n_px:
                raise ValueError("corrupt VP8L backward reference")
            for i in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[(int(px) * 0x1E35A7BD & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
        else:
            out[pos] = cache[S - 280]
            pos += 1

    img = out.reshape(h, xsize)
    # inverse transforms, reverse order of reading
    for t in reversed(transforms):
        if t[0] == "subg":
            ch = img.view(np.uint8).reshape(h, -1, 4)
            g = ch[:, :, 1]
            ch[:, :, 2] += g  # red (little-endian BGRA byte order)
            ch[:, :, 0] += g  # blue
        elif t[0] == "index":
            _, wbits, pal, orig_w = t
            if wbits:
                per = 1 << wbits
                ibits = 8 >> wbits
                gch = ((img >> np.uint32(8)) & np.uint32(0xFF)) \
                    .astype(np.uint8)
                idx = np.zeros((h, img.shape[1] * per), np.uint8)
                for k in range(per):
                    idx[:, k::per] = (gch >> (ibits * k)) \
                        & ((1 << ibits) - 1)
                idx = idx[:, :orig_w]
            else:
                idx = ((img >> np.uint32(8)) & np.uint32(0xFF)) \
                    .astype(np.uint8)
            safe = np.where(idx < len(pal), idx, 0)
            mapped = pal[safe]
            mapped[idx >= len(pal)] = 0
            img = mapped.astype(np.uint32)
        elif t[0] == "pred":
            img = _inverse_predictor(img, t[1], t[2])
        else:  # cross-color
            img = _inverse_color(img, t[1], t[2])
    return img, img.shape[1]


def _avg2(a, b):
    return ((a.astype(np.uint16) + b) >> 1).astype(np.uint8)


def _inverse_predictor(img: np.ndarray, bits: int,
                       modes: np.ndarray) -> np.ndarray:
    h, w = img.shape
    tw = _div_ceil(w, 1 << bits)
    mode_row = ((modes.reshape(-1) >> np.uint32(8)) & np.uint32(0xFF)) \
        .astype(np.int64)
    flat = img.reshape(-1).view(np.uint8).reshape(-1, 4).copy()

    def px(i):
        return flat[i].astype(np.int64)

    n = h * w
    for pos in range(n):
        y, x = divmod(pos, w)
        if pos == 0:
            pred = np.array([0, 0, 0, 255], np.int64)  # BGRA
        elif y == 0:
            pred = px(pos - 1)
        elif x == 0:
            pred = px(pos - w)
        else:
            mode = int(mode_row[(y >> bits) * tw + (x >> bits)])
            L = px(pos - 1)
            T = px(pos - w)
            TL = px(pos - w - 1)
            TR = px(pos - w + 1)  # x == w-1 wraps to row start: OK
            if mode == 0:
                pred = np.array([0, 0, 0, 255], np.int64)
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = (((L + TR) >> 1) + T) >> 1
            elif mode == 6:
                pred = (L + TL) >> 1
            elif mode == 7:
                pred = (L + T) >> 1
            elif mode == 8:
                pred = (TL + T) >> 1
            elif mode == 9:
                pred = (T + TR) >> 1
            elif mode == 10:
                pred = (((L + TL) >> 1) + ((T + TR) >> 1)) >> 1
            elif mode == 11:
                pL = np.abs(T - TL).sum()
                pT = np.abs(L - TL).sum()
                pred = L if pL < pT else T
            elif mode == 12:
                pred = np.clip(L + T - TL, 0, 255)
            else:  # 13
                a = (L + T) >> 1
                d = a - TL
                half = np.where(d >= 0, d >> 1, -((-d) >> 1))
                pred = np.clip(a + half, 0, 255)
        flat[pos] = (px(pos) + pred) & 0xFF
    return flat.reshape(-1).view(np.uint32).reshape(h, w)


def _inverse_color(img: np.ndarray, bits: int,
                   cte: np.ndarray) -> np.ndarray:
    h, w = img.shape
    tw = _div_ceil(w, 1 << bits)
    ch = img.view(np.uint8).reshape(h, w, 4)  # B G R A little-endian
    cte_flat = cte.reshape(-1)
    g2r = (cte_flat & np.uint32(0xFF)).astype(np.int8)
    g2b = ((cte_flat >> np.uint32(8)) & np.uint32(0xFF)).astype(np.int8)
    r2b = ((cte_flat >> np.uint32(16)) & np.uint32(0xFF)).astype(np.int8)
    bx = np.arange(w) >> bits
    out = ch.copy()
    for y in range(h):
        row_idx = (y >> bits) * tw
        tg2r = g2r[row_idx + bx].astype(np.int64)
        tg2b = g2b[row_idx + bx].astype(np.int64)
        tr2b = r2b[row_idx + bx].astype(np.int64)
        g_s = ch[y, :, 1].astype(np.int8).astype(np.int64)
        red = (ch[y, :, 2].astype(np.int64)
               + ((tg2r * g_s) >> 5)) & 0xFF
        red_s = red.astype(np.uint8).view(np.int8).astype(np.int64)
        blue = (ch[y, :, 0].astype(np.int64)
                + ((tg2b * g_s) >> 5) + ((tr2b * red_s) >> 5)) & 0xFF
        out[y, :, 2] = red.astype(np.uint8)
        out[y, :, 0] = blue.astype(np.uint8)
    return out.reshape(h, -1).view(np.uint32).reshape(h, w)


def _find_payload(data: bytes) -> tuple[str, bytes]:
    """Walk the RIFF chunks to the still-image payload: ("vp8l", b)
    for lossless, ("vp8", b) for lossy key frames (decoded by the
    pure-numpy RFC 6386 codec in vp8.py — round-4 closure of the
    round-3 'declared seam')."""
    if not is_webp(data):
        raise ValueError("not a WebP stream")
    pos = 12
    while pos + 8 <= len(data):
        tag = bytes(data[pos:pos + 4])
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if tag in (b"VP8L", b"VP8 "):
            if pos + 8 + size > len(data):
                # the RIFF header declares more payload than remains;
                # raise instead of letting the arithmetic decoder
                # zero-feed a silently-wrong image (same hardening as
                # the truncated-VP8L bit reader)
                raise ValueError("truncated WebP chunk")
            return ("vp8l" if tag == b"VP8L" else "vp8",
                    bytes(data[pos + 8:pos + 8 + size]))
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L/VP8 chunk found")


def _find_vp8l(data: bytes) -> bytes:
    kind, payload = _find_payload(data)
    if kind != "vp8l":
        raise ValueError("not a lossless WebP")
    return payload


def meta(data: bytes) -> tuple[int, int]:
    """(w, h) from the VP8L/VP8 header (or the VP8X canvas for
    animated/extended files) without decoding."""
    if is_webp(data) and bytes(data[12:16]) == b"VP8X":
        # the VP8X body is 10 bytes (flags + 24-bit w-1/h-1); validate
        # both the declared chunk size and the actual bytes so a
        # truncated file raises instead of yielding garbage dimensions
        declared = struct.unpack_from("<I", data, 16)[0]
        if declared < 10 or len(data) < 30:
            raise ValueError("truncated VP8X chunk")
        body = data[20:30]
        return (int.from_bytes(body[4:7], "little") + 1,
                int.from_bytes(body[7:10], "little") + 1)
    kind, payload = _find_payload(data)
    if kind == "vp8":
        from . import vp8 as _vp8
        return _vp8.meta(payload)
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    return w, h


def decode(data: bytes) -> np.ndarray:
    """Decode a WebP still (lossless VP8L or lossy VP8 key frame)
    into an (h, w, 3) uint8 RGB array (alpha dropped)."""
    kind, payload = _find_payload(data)
    if kind == "vp8":
        from . import vp8 as _vp8
        return _vp8.decode(payload)
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    img, _ = _decode_image_stream(br, w, h, True)
    ch = img.view(np.uint8).reshape(h, w, 4)  # B G R A
    return ch[:, :, 2::-1].copy()


# ----------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _huff_lengths(hist: np.ndarray, max_len: int) -> np.ndarray:
    """Canonical code lengths from a histogram, depth-limited by
    count-halving (valid, near-optimal)."""
    import heapq
    hist = hist.astype(np.int64).copy()
    nz = np.flatnonzero(hist)
    lengths = np.zeros(len(hist), np.int64)
    if len(nz) == 0:
        return lengths
    if len(nz) == 1:
        lengths[nz[0]] = 1
        return lengths
    while True:
        heap = [(int(hist[s]), int(s), (int(s),)) for s in nz]
        heapq.heapify(heap)
        depth = np.zeros(len(hist), np.int64)
        while len(heap) > 1:
            c1, _, s1 = heapq.heappop(heap)
            c2, t, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depth[s] += 1
            heapq.heappush(heap, (c1 + c2, t, s1 + s2))
        if depth.max() <= max_len:
            lengths[nz] = depth[nz]
            return lengths
        hist[nz] = (hist[nz] + 1) >> 1


def _write_code(bw: _BitWriter, lengths: np.ndarray):
    """Emit one prefix code (simple for <=2 symbols, else
    code-length-coded with a full 19-entry CLC table), and return the
    canonical (code, len) table for emitting symbols."""
    nz = np.flatnonzero(lengths)
    if len(nz) <= 2 and (len(nz) == 0 or
                         (lengths[nz].max() == 1 and nz.max() <= 255)):
        bw.write(1, 1)  # simple
        if len(nz) <= 1:
            s0 = int(nz[0]) if len(nz) else 0
            bw.write(0, 1)  # one symbol
            if s0 < 2:
                bw.write(0, 1)
                bw.write(s0, 1)
            else:
                bw.write(1, 1)
                bw.write(s0, 8)
            return {s0: (0, 0)}
        bw.write(1, 1)  # two symbols
        s0, s1 = int(nz[0]), int(nz[1])
        bw.write(1, 1)
        bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    bw.write(0, 1)  # normal code
    seq = lengths.astype(np.int64)
    clc_hist = np.bincount(seq, minlength=19)
    clc_len = _huff_lengths(clc_hist, 7)
    bw.write(15, 4)  # 4 + 15 = all 19 CLC entries
    for s in _CLC_ORDER:
        bw.write(int(clc_len[s]), 3)
    clc_codes = _canonical(clc_len)
    bw.write(0, 1)  # no bounded-symbol-count shortcut
    for ln in seq:
        code, n = clc_codes[int(ln)]
        _write_msb(bw, code, n)
    return _canonical(lengths)


def _canonical(lengths) -> dict:
    nz = sorted((int(ln), int(s)) for s, ln in enumerate(lengths)
                if ln > 0)
    table = {}
    code = 0
    prev_len = 0
    for ln, sym in nz:
        code <<= (ln - prev_len)
        table[sym] = (code, ln)
        code += 1
        prev_len = ln
    if len(nz) == 1:
        table[nz[0][1]] = (0, 0)  # single-symbol: decoder reads 0 bits
    return table


def _write_msb(bw: _BitWriter, code: int, n: int) -> None:
    for i in range(n - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value >= 1 → (prefix_symbol, extra_bits_value, n_extra)."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    extra = u.bit_length() - 2
    return 2 * extra + (u >> extra), u & ((1 << extra) - 1), extra


def encode(pixels: np.ndarray, subtract_green: bool = True,
           use_runs: bool = True) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a lossless WebP."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {pixels.shape}")
    h, w = pixels.shape[:2]
    if w > 16384 or h > 16384:
        raise ValueError(f"VP8L dimensions cap at 16384, got {w}x{h}")
    r = pixels[:, :, 0].astype(np.int64).reshape(-1)
    g = pixels[:, :, 1].astype(np.int64).reshape(-1)
    b = pixels[:, :, 2].astype(np.int64).reshape(-1)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF

    # previous-pixel run detection (distance code 2 = offset (1,0))
    n = h * w
    tokens = []  # ("lit", i) or ("run", length)
    if use_runs and n > 1:
        same = np.flatnonzero((r[1:] == r[:-1]) & (g[1:] == g[:-1])
                              & (b[1:] == b[:-1]))
        i = 0
        run_starts = set()
        # greedy: collapse maximal runs of >= 4 identical pixels
        j = 0
        while j < len(same):
            k = j
            while k + 1 < len(same) and same[k + 1] == same[k] + 1:
                k += 1
            ln = k - j + 1
            if ln >= 4:
                run_starts.add((int(same[j]) + 1, ln))
            j = k + 1
        runs = sorted(run_starts)
        ri = 0
        while i < n:
            if ri < len(runs) and runs[ri][0] == i:
                ln = min(runs[ri][1], 4096)
                tokens.append(("run", ln))
                i += ln
                ri += 1
            else:
                if ri < len(runs) and runs[ri][0] < i:
                    ri += 1
                    continue
                tokens.append(("lit", i))
                i += 1
    else:
        tokens = [("lit", i) for i in range(n)]

    green_hist = np.zeros(256 + 24, np.int64)
    red_hist = np.zeros(256, np.int64)
    blue_hist = np.zeros(256, np.int64)
    dist_hist = np.zeros(40, np.int64)
    for kind, v in tokens:
        if kind == "lit":
            green_hist[g[v]] += 1
            red_hist[r[v]] += 1
            blue_hist[b[v]] += 1
        else:
            p, _, _ = _prefix_encode(v)
            green_hist[256 + p] += 1
            dist_hist[1] += 1  # distance code 2 → prefix symbol 1
    alpha_hist = np.zeros(256, np.int64)
    alpha_hist[255] = 1

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform: subtract green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-Huffman
    gc = _write_code(bw, _huff_lengths(green_hist, 15))
    rc = _write_code(bw, _huff_lengths(red_hist, 15))
    bc = _write_code(bw, _huff_lengths(blue_hist, 15))
    ac = _write_code(bw, _huff_lengths(alpha_hist, 15))
    dc = _write_code(bw, _huff_lengths(dist_hist, 15))

    for kind, v in tokens:
        if kind == "lit":
            code, ln = gc[int(g[v])]
            _write_msb(bw, code, ln)
            code, ln = rc[int(r[v])]
            _write_msb(bw, code, ln)
            code, ln = bc[int(b[v])]
            _write_msb(bw, code, ln)
            code, ln = ac[255]
            _write_msb(bw, code, ln)
        else:
            p, extra, n_extra = _prefix_encode(v)
            code, ln = gc[256 + p]
            _write_msb(bw, code, ln)
            bw.write(extra, n_extra)
            code, ln = dc[1]
            _write_msb(bw, code, ln)
            # distance code 2, prefix 1: no extra bits

    payload = b"\x2f" + bw.finish()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\0"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_lossy(pixels: np.ndarray, qindex: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → LOSSY WebP (RIFF-wrapped VP8 key frame,
    vp8.py encoder). The lossy twin of encode(); decode() dispatches
    on the chunk tag so both round-trip through the same call."""
    from . import vp8 as _vp8
    payload = _vp8.encode(pixels, qindex=qindex)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\0"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# --------------------------------------------------- animation (VP8X)

def _u24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def encode_animation(frames: list[np.ndarray],
                     duration_ms: int = 100) -> bytes:
    """List of (h, w, 3) uint8 frames → animated WebP (VP8X + ANIM +
    one full-canvas lossless ANMF frame each, no-blend/keep
    disposal)."""
    h, w = frames[0].shape[:2]
    chunks = bytearray()
    chunks += b"VP8X" + struct.pack("<I", 10)
    chunks += bytes([0x02]) + b"\0\0\0" + _u24(w - 1) + _u24(h - 1)
    chunks += b"ANIM" + struct.pack("<I", 6) + struct.pack("<IH", 0, 0)
    for fr in frames:
        sub = encode(fr)
        # reuse the VP8L chunk from the single-image container
        vp8l = sub[12:]
        anmf = (_u24(0) + _u24(0) + _u24(w - 1) + _u24(h - 1)
                + _u24(duration_ms) + bytes([0x02]) + vp8l)
        chunks += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            chunks += b"\0"
    riff = b"WEBP" + bytes(chunks)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_frames(data: bytes) -> list[np.ndarray]:
    """All frames of a (possibly animated) lossless WebP as (h, w, 3)
    arrays, composited onto the canvas like a viewer (keep-disposal;
    alpha blending out of scope — this repo's codec contract is
    opaque RGB)."""
    if not is_webp(data):
        raise ValueError("not a WebP stream")
    pos = 12
    canvas = None
    frames = []
    while pos + 8 <= len(data):
        tag = bytes(data[pos:pos + 4])
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if tag == b"VP8X":
            cw = int.from_bytes(body[4:7], "little") + 1
            ch = int.from_bytes(body[7:10], "little") + 1
            canvas = np.zeros((ch, cw, 3), np.uint8)
        elif tag == b"ANMF":
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            sub = body[16:]
            # frame payload: nested VP8L chunk
            stag = bytes(sub[0:4])
            ssize = struct.unpack_from("<I", sub, 4)[0]
            payload = sub[8:8 + ssize]
            if stag == b"VP8 ":
                from . import vp8 as _vp8
                rgb = _vp8.decode(payload)
                fh, fw = rgb.shape[:2]
            elif stag == b"VP8L":
                if payload[0] != 0x2F:
                    raise ValueError("bad VP8L signature in ANMF")
                br = _BitReader(payload[1:])
                fw = br.read(14) + 1
                fh = br.read(14) + 1
                br.read(1)
                if br.read(3) != 0:
                    raise ValueError("unsupported VP8L version")
                img, _ = _decode_image_stream(br, fw, fh, True)
                rgb = img.view(np.uint8).reshape(fh, fw, 4)[:, :, 2::-1]
            else:
                raise NotImplementedError(
                    f"animated frame payload {stag!r}")
            if canvas is None:
                canvas = np.zeros((fh + fy, fw + fx, 3), np.uint8)
            canvas[fy:fy + fh, fx:fx + fw] = rgb
            frames.append(canvas.copy())
        elif tag in (b"VP8L", b"VP8 "):
            return [decode(data)]
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("no frames found")
    return frames
