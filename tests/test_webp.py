"""WebP lossless / VP8L codec (destor_ray.webp) — encoder round
trips plus handcrafted bitstreams for the decode-only machinery
(predictor / cross-color / color-indexing transforms, color cache,
meta-Huffman groups), and codec dispatch."""

import numpy as np

from destor_ray import codec, webp
from destor_ray.webp import _BitWriter

RNG = np.random.default_rng(23)


def test_roundtrip_noise_runs_flat_gradient():
    for shape in [(1, 1), (7, 13), (37, 53)]:
        px = RNG.integers(0, 256, shape + (3,), dtype=np.uint8)
        for sg in (False, True):
            for runs in (False, True):
                d = webp.encode(px, subtract_green=sg, use_runs=runs)
                assert np.array_equal(webp.decode(d), px), \
                    (shape, sg, runs)
    blocky = np.repeat(np.repeat(
        RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8), 16, 0), 16, 1)
    d = webp.encode(blocky)
    assert len(d) < blocky.nbytes // 8  # runs + huffman actually bite
    assert np.array_equal(webp.decode(d), blocky)
    flat = np.full((100, 100, 3), 77, np.uint8)
    assert np.array_equal(webp.decode(webp.encode(flat)), flat)
    assert webp.meta(webp.encode(flat)) == (100, 100)


def _container(payload_bits: _BitWriter) -> bytes:
    import struct
    payload = b"\x2f" + payload_bits.finish()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\0"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple1(bw: _BitWriter, sym: int) -> None:
    """Single-symbol simple code (decoder consumes 0 bits/read)."""
    bw.write(1, 1)
    bw.write(0, 1)  # one symbol
    if sym < 2:
        bw.write(0, 1)
        bw.write(sym, 1)
    else:
        bw.write(1, 1)
        bw.write(sym, 8)


def _simple2(bw: _BitWriter, s0: int, s1: int) -> None:
    """Two-symbol simple code; canonical: lower symbol = bit 0."""
    bw.write(1, 1)
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)
    bw.write(s0, 8)
    bw.write(s1, 8)


def test_color_indexing_with_bundling():
    """2-color palette on an 8x2 image: indices pack 8-per-byte
    (low bits = leftmost pixel); palette entries are stored as
    component-wise deltas."""
    bw = _BitWriter()
    _header(bw, 8, 2)
    bw.write(1, 1)
    bw.write(3, 2)
    bw.write(1, 8)
    bw.write(0, 1)
    _simple2(bw, 10, 190)
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple2(bw, 0, 255)
    _simple1(bw, 0)
    bw.write(0, 1)          # pal px1: green 10
    bw.write(1, 1)          # pal px1: alpha 255
    bw.write(1, 1)          # pal px2: green 190
    bw.write(0, 1)          # pal px2: alpha 0
    bw.write(0, 1)          # no more transforms
    # main (packed) image: 1x2, green bytes hold 8 1-bit indices
    row0 = [1, 0, 1, 1, 0, 0, 1, 0]
    row1 = [1] * 8
    g0 = sum(bit << k for k, bit in enumerate(row0))
    g1 = sum(bit << k for k, bit in enumerate(row1))
    bw.write(0, 1)          # no color cache
    bw.write(0, 1)          # no meta-huffman
    _simple2(bw, min(g0, g1), max(g0, g1))
    _simple1(bw, 0)         # red
    _simple1(bw, 0)         # blue
    _simple1(bw, 255)       # alpha
    _simple1(bw, 0)         # distance
    bw.write(0 if g0 <= g1 else 1, 1)   # packed px row0
    bw.write(1 if g0 <= g1 else 0, 1)   # packed px row1
    out = webp.decode(_container(bw))
    pal = np.array([[0, 10, 0], [0, 200, 0]], np.uint8)
    exp = np.stack([pal[row0], pal[row1]])
    assert np.array_equal(out, exp)


def test_predictor_transform_modes():
    """4x4 image, predictor block = 4 so one mode block (mode 7 =
    average of L and T), residuals all (1,2,3); expected computed by
    an independent scalar reference."""
    bw = _BitWriter()
    _header(bw, 4, 4)
    bw.write(1, 1)
    bw.write(0, 2)          # predictor transform
    bw.write(2, 3)          # size_bits = 4 -> 1x1 mode image
    bw.write(0, 1)          # mode image: no cache
    _simple1(bw, 7)         # green = mode 7
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 255)
    _simple1(bw, 0)
    # (single-symbol codes: the one mode pixel costs 0 bits)
    bw.write(0, 1)          # no more transforms
    bw.write(0, 1)          # no cache
    bw.write(0, 1)          # no meta
    _simple1(bw, 2)         # green residual
    _simple1(bw, 1)         # red residual
    _simple1(bw, 3)         # blue residual
    _simple1(bw, 0)         # alpha residual
    _simple1(bw, 0)
    out = webp.decode(_container(bw))

    # independent reference
    exp = np.zeros((4, 4, 4), np.int64)  # r g b a
    res = (1, 2, 3, 0)
    for y in range(4):
        for x in range(4):
            if x == 0 and y == 0:
                pred = (0, 0, 0, 255)
            elif y == 0:
                pred = tuple(exp[y, x - 1])
            elif x == 0:
                pred = tuple(exp[y - 1, x])
            else:
                L, T = exp[y, x - 1], exp[y - 1, x]
                pred = tuple((int(L[c]) + int(T[c])) >> 1
                             for c in range(4))
            exp[y, x] = [(pred[c] + res[c]) & 0xFF for c in range(4)]
    assert np.array_equal(out, exp[:, :, :3].astype(np.uint8))


def test_cross_color_transform():
    """4x4, one cross-color block with green_to_red = 32 (delta =
    (32 * g) >> 5 = g): literal (r',g,b') decodes to r = r' + g."""
    bw = _BitWriter()
    _header(bw, 4, 4)
    bw.write(1, 1)
    bw.write(1, 2)          # cross-color
    bw.write(2, 3)          # size_bits 4 -> one cte
    bw.write(0, 1)
    _simple1(bw, 0)         # cte green byte = green_to_blue = 0
    _simple1(bw, 0)         # cte red byte = red_to_blue = 0
    _simple1(bw, 32)        # cte blue byte = green_to_red = 32
    _simple1(bw, 255)
    _simple1(bw, 0)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _simple1(bw, 50)        # green
    _simple1(bw, 7)         # stored red r'
    _simple1(bw, 20)        # blue
    _simple1(bw, 255)
    _simple1(bw, 0)
    out = webp.decode(_container(bw))
    # g=50 (int8 50), delta = (32*50)>>5 = 50 -> r = 7+50 = 57
    exp = np.full((4, 4, 3), 0, np.uint8)
    exp[:, :, 0] = 57
    exp[:, :, 1] = 50
    exp[:, :, 2] = 20
    assert np.array_equal(out, exp)


def test_color_cache_and_backward_ref():
    """1x4 stream: literal, cache hit, then a distance-1 copy of
    length 2 via the 2D neighborhood code (1,0)."""
    argb = (255 << 24) | (30 << 16) | (40 << 8) | 50
    cache_bits = 4
    key = ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)          # no transforms
    bw.write(1, 1)          # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)          # no meta
    # green alphabet = 256+24+16; symbols: 40 (lit), 280+key (cache),
    # 256+1 (length prefix 1 -> length 2)
    syms = sorted([40, 280 + key, 257])
    # canonical 3-symbol code: lengths (1,2,2)
    lengths = {syms[0]: 1, syms[1]: 2, syms[2]: 2}
    codes = {syms[0]: (0, 1), syms[1]: (2, 2), syms[2]: (3, 2)}
    # emit via the normal (code-length-coded) form
    bw.write(0, 1)          # not simple
    bw.write(15, 4)         # all 19 CLC slots
    clc = {0: 1, 1: 2, 2: 2}  # lengths of code-length symbols
    from destor_ray.webp import _CLC_ORDER
    for s in _CLC_ORDER:
        bw.write(clc.get(s, 0), 3)
    # canonical: 0 -> "0"; 1 -> "10"; 2 -> "11"
    clc_codes = {0: (0, 1), 1: (0b10, 2), 2: (0b11, 2)}
    bw.write(0, 1)          # no max-symbol shortcut
    alphabet = 256 + 24 + (1 << cache_bits)
    for sym in range(alphabet):
        ln = lengths.get(sym, 0)
        code, n = clc_codes[ln] if ln else clc_codes[0]
        for i in range(n - 1, -1, -1):
            bw.write((code >> i) & 1, 1)
    _simple1(bw, 30)        # red
    _simple1(bw, 50)        # blue
    _simple1(bw, 255)       # alpha
    _simple1(bw, 1)         # distance: always plane code 2 = (1,0)
    def put(sym):
        code, n = codes[sym]
        for i in range(n - 1, -1, -1):
            bw.write((code >> i) & 1, 1)
    put(40)                 # literal pixel
    put(280 + key)          # cache hit -> same pixel
    put(257)                # length prefix 1 -> length 2, no extra
    # distance symbol: single-symbol code, 0 bits
    out = webp.decode(_container(bw))
    exp = np.tile(np.array([30, 40, 50], np.uint8), (1, 4, 1))
    assert np.array_equal(out, exp)


def test_meta_huffman_groups():
    """16x1 image, huffman_bits=3: two groups of all-single-symbol
    codes — left 8 pixels green 5, right 8 pixels green 9, zero data
    bits per pixel."""
    bw = _BitWriter()
    _header(bw, 16, 1)
    bw.write(0, 1)          # no transforms
    bw.write(0, 1)          # no cache
    bw.write(1, 1)          # meta-huffman present
    bw.write(1, 3)          # huffman_bits = 3 -> 2x1 meta image
    # meta image (2x1): pixel = (r<<8)|g = group index 0 then 1
    bw.write(0, 1)          # meta stream: no cache
    _simple2(bw, 0, 1)      # green: 0 and 1
    _simple1(bw, 0)         # red
    _simple1(bw, 0)         # blue
    _simple1(bw, 255)       # alpha
    _simple1(bw, 0)
    bw.write(0, 1)          # meta px0: green 0
    bw.write(1, 1)          # meta px1: green 1
    # two groups
    for gval in (5, 9):
        _simple1(bw, gval)
        _simple1(bw, 1)
        _simple1(bw, 2)
        _simple1(bw, 255)
        _simple1(bw, 0)
    out = webp.decode(_container(bw))
    assert out.shape == (1, 16, 3)
    assert (out[0, :8, 1] == 5).all() and (out[0, 8:, 1] == 9).all()
    assert (out[0, :, 0] == 1).all() and (out[0, :, 2] == 2).all()


def test_codec_dispatch_webp():
    px = RNG.integers(0, 256, (19, 29, 3), dtype=np.uint8)
    d = webp.encode(px)
    assert np.array_equal(codec.decode(d), px)
    assert codec.decode_meta(d) == ("webp", 100, 29, 19)


def test_lossy_vp8_decodes():
    """Round 3's declared VP8 seam is closed: a lossy WebP (RIFF VP8
    key frame from vp8.py) decodes through the same webp.decode()
    dispatch at PSNR >= 40, and a truncated VP8 chunk still raises
    cleanly (quarantine contract)."""
    import pytest

    from destor_ray import codec as codec_mod

    h, w = 41, 57
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), np.uint8)
    for c in range(3):
        img[..., c] = np.clip(
            127 + 60 * np.sin(xx / 13 + c) + 50 * np.cos(yy / 9 - c),
            0, 255)
    d = webp.encode_lossy(img, qindex=4)
    assert codec_mod.sniff_format(d) == "webp"
    assert webp.meta(d) == (w, h)
    out = webp.decode(d)
    assert out.shape == img.shape
    assert codec_mod.psnr(out, img) >= 40
    # truncated payload raises (never fabricates pixels)
    import struct
    fake = (b"RIFF" + struct.pack("<I", 20) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 4) + b"\0\0\0\0")
    with pytest.raises(ValueError):
        webp.decode(fake)


def test_animation_roundtrip_and_meta():
    frames = [RNG.integers(0, 256, (24, 32, 3), dtype=np.uint8)
              for _ in range(5)]
    d = webp.encode_animation(frames)
    out = webp.decode_frames(d)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    assert webp.meta(d) == (32, 24)
    # still image through the frame API
    px = RNG.integers(0, 256, (10, 11, 3), dtype=np.uint8)
    assert np.array_equal(webp.decode_frames(webp.encode(px))[0], px)


def test_crossformat_animation_dedup_per_class_full_recall(ray_session):
    """The same animation re-hosted as lossless animated WebP,
    MJPEG-AVI (the GIF-to-video platform transcode), half-rate
    animated WebP, WebM with VP8 key frames (round 5 — the EBML walk
    + RFC 6386 decode in the same dispatch), or reduced to its still
    poster frame detects with per-class recall 1.0 and zero false
    merges through ONE container-agnostic decode_frames signature
    stage."""
    import __ray_entry__ as em

    out = em.queries()["crossformat_animation_dedup"](
        "/root/testdata/sf0.001")
    df = out.set_index("kind")
    assert int(df.loc["_total", "n_planted"]) == 12
    for kind in ("webp", "avi", "webpdrop", "poster", "webm",
                 "_total"):
        assert int(df.loc[kind, "recall_ppm"]) == 1_000_000, kind
        assert int(df.loc[kind, "n_false"]) == 0, kind
