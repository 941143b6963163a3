import numpy as np
import pytest

from destor_ray import codec


def _img(seed=0, h=64, w=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_lossless_roundtrip():
    img = _img(1)
    data = codec.encode(img, "png")
    out = codec.decode(data)
    assert np.array_equal(img, out)
    assert codec.psnr(img, out) == float("inf")


@pytest.mark.parametrize("q", [70, 85, 92, 95])
def test_lossy_psnr_at_least_40(q):
    img = _img(2)
    out = codec.decode(codec.encode(img, "jpeg", q))
    assert codec.psnr(img, out) >= 40.0


def test_decode_meta():
    img = _img(3, 32, 32)
    data = codec.encode(img, "jpeg", 85)
    fmt, q, w, h = codec.decode_meta(data)
    assert (fmt, q, w, h) == ("jpeg", 85, 32, 32)


def test_reencode_changes_bytes_not_pixels_much():
    img = _img(4)
    a = codec.encode(img, "jpeg", 85)
    b = codec.encode(img, "jpeg", 95)
    assert a != b
    assert codec.psnr(codec.decode(a), codec.decode(b)) >= 35.0


def test_phash_batch_matches_single():
    imgs = [_img(i, 64, 64) for i in range(5)]
    singles = [codec.phash64(im) for im in imgs]
    grays = np.stack([codec.to_gray(codec.resize_nn(im, 32, 32)) for im in imgs])
    batch = codec.phash64_batch(grays)
    assert list(batch) == [int(s) for s in singles]


def test_phash_robust_to_reencode_sensitive_to_content():
    img = _img(5)
    re_enc = codec.decode(codec.encode(img, "jpeg", 80))
    d_same = int(codec.hamming64(np.int64(codec.phash64(img)), np.int64(codec.phash64(re_enc))))
    other = _img(6)
    d_diff = int(codec.hamming64(np.int64(codec.phash64(img)), np.int64(codec.phash64(other))))
    assert d_same <= 8
    assert d_diff > 12


def test_hamming64_vectorized():
    a = np.array([0, -1, 5], dtype=np.int64)
    b = np.array([0, 0, 4], dtype=np.int64)
    assert list(codec.hamming64(a, b)) == [0, 64, 1]


def test_thumbnail_and_thumb_psnr():
    img = _img(7)
    t = codec.thumbnail(img)
    assert len(t) == 256
    assert codec.thumb_psnr(t, t) == float("inf")


# ---------------------------------------------------------------------------
# Real PNG codec
# ---------------------------------------------------------------------------

def test_png_is_real_png():
    img = _img(8)
    data = codec.encode(img, "png")
    assert data[:8] == codec.PNG_SIG
    assert b"IHDR" in data[:33] and data.endswith(
        b"IEND" + data[-4:])  # IEND tag then CRC
    assert codec.png_meta(data) == (img.shape[1], img.shape[0])
    fmt, q, w, h = codec.decode_meta(data)
    assert (fmt, w, h) == ("png", img.shape[1], img.shape[0])


def test_png_roundtrip():
    img = _img(9, 33, 17)  # odd sizes
    assert np.array_equal(codec.png_decode(codec.png_encode(img)), img)


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Reference PNG scanline filter (RFC 2083 §6) to exercise the
    decoder's unfilter paths our encoder never emits."""
    h, w, ch = img.shape
    px = img.astype(np.int32)
    out = bytearray()
    for y in range(h):
        out.append(ftype)
        for x in range(w):
            for c in range(ch):
                raw = px[y, x, c]
                a = px[y, x - 1, c] if x > 0 else 0          # left
                b = px[y - 1, x, c] if y > 0 else 0          # up
                cc = px[y - 1, x - 1, c] if (x > 0 and y > 0) else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    p = a + b - cc
                    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                out.append((raw - pred) % 256)
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_unfilter_all_types(ftype):
    import struct
    import zlib
    img = _img(10 + ftype, 9, 7)
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = _forward_filter(img, ftype)
    data = (codec.PNG_SIG
            + codec._png_chunk(b"IHDR", ihdr)
            + codec._png_chunk(b"IDAT", zlib.compress(raw))
            + codec._png_chunk(b"IEND", b""))
    assert np.array_equal(codec.png_decode(data), img)


def test_png_gray_and_rgba():
    import struct
    import zlib
    rng = np.random.default_rng(3)
    # gray (color type 0) → replicated to RGB
    g = rng.integers(0, 256, (5, 6, 1), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0)
    raw = np.concatenate([np.zeros((5, 1), np.uint8), g.reshape(5, 6)], axis=1)
    data = (codec.PNG_SIG + codec._png_chunk(b"IHDR", ihdr)
            + codec._png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + codec._png_chunk(b"IEND", b""))
    out = codec.png_decode(data)
    assert np.array_equal(out, np.repeat(g, 3, axis=2))
    # RGBA (color type 6) → alpha dropped
    rgba = rng.integers(0, 256, (4, 3, 4), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 4, 8, 6, 0, 0, 0)
    raw = np.concatenate([np.zeros((4, 1), np.uint8), rgba.reshape(4, 12)], axis=1)
    data = (codec.PNG_SIG + codec._png_chunk(b"IHDR", ihdr)
            + codec._png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + codec._png_chunk(b"IEND", b""))
    assert np.array_equal(codec.png_decode(data), rgba[:, :, :3])


def test_png_crc_and_multi_idat():
    import struct
    import zlib
    img = _img(20, 8, 8)
    data = codec.png_encode(img)
    # split the IDAT into two chunks; decoder must concatenate
    sig, rest = data[:8], data[8:]
    (l1,) = struct.unpack_from(">I", rest, 0)
    ihdr_chunk = rest[: 12 + l1]
    (l2,) = struct.unpack_from(">I", rest, 12 + l1)
    idat_payload = rest[12 + l1 + 8: 12 + l1 + 8 + l2]
    half = len(idat_payload) // 2
    rebuilt = (sig + ihdr_chunk
               + codec._png_chunk(b"IDAT", idat_payload[:half])
               + codec._png_chunk(b"IDAT", idat_payload[half:])
               + codec._png_chunk(b"IEND", b""))
    assert np.array_equal(codec.png_decode(rebuilt), img)


def test_trim_uniform_border_exact_and_noop():
    """exact bar recovery on clean pads (all 3 styles), no-op on
    borderless content, max_frac cap on flat input."""
    import numpy as np

    from destor_ray import codec

    content = (np.indices((24, 40)).sum(0) * 11 % 251).astype(np.uint8)
    # letterbox / pillarbox / frame with arbitrary bar widths
    for pad, expect in (
            (((9, 9), (0, 0)), (24, 40)),
            (((0, 0), (6, 6)), (24, 40)),
            (((5, 5), (13, 13)), (24, 40))):
        g = np.pad(content, pad, constant_values=128)
        assert codec.trim_uniform_border(g).shape == expect
    # borderless: untouched
    assert codec.trim_uniform_border(content).shape == (24, 40)
    # flat image: the max_frac/min-size guards keep >= 55% per axis
    flat = np.full((32, 32), 77, np.uint8)
    assert codec.trim_uniform_border(flat).shape == (32, 32)


def test_trim_uniform_border_jpeg_noise():
    """bars survive a q70 re-encode: trim recovers the content box to
    within a 4-line ringing shoulder per side (the inset-sweep verify
    absorbs this residual), including bars straddling JPEG blocks."""
    import numpy as np

    from destor_ray import codec, jpeg

    content = (np.indices((40, 40)).sum(0) * 7 % 256).astype(np.uint8)
    px = np.repeat(content[:, :, None], 3, axis=2)
    padded = np.full((40 + 2 * 11, 40 + 2 * 11, 3), 128, np.uint8)
    padded[11:51, 11:51] = px
    gray = codec.to_gray(jpeg.decode(jpeg.encode(padded, 70)))
    t = codec.trim_uniform_border(gray)
    assert 40 <= t.shape[0] <= 48 and 40 <= t.shape[1] <= 48, t.shape


def test_png_full_type_matrix():
    """Round-3 PNG subset widening: palette (PLTE, depth 4/8), 16-bit
    gray/RGB (high-byte reduction), gray+alpha, RGBA, sub-byte gray
    (rescaled), each in BOTH non-interlaced and Adam7-interlaced
    layouts — decoded exactly from handcrafted spec-conformant files
    (filter 0 rows; filters 1-4 are covered by the encoder
    round-trip tests)."""
    import struct
    import zlib

    import numpy as np

    from destor_ray import codec

    def chunk(tag, payload):
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", zlib.crc32(tag + payload)
                               & 0xFFFFFFFF)

    ADAM7 = [(0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
             (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2)]

    def rows(arr_full, depth):
        def fn(pw, ph, x0, dx, y0, dy):
            sub = arr_full[y0::dy, x0::dx]
            out = b""
            for y in range(ph):
                rv = sub[y].reshape(-1)
                if depth == 8:
                    rb = rv.astype(np.uint8).tobytes()
                elif depth == 16:
                    rb = np.stack([rv, np.zeros_like(rv)], -1) \
                        .astype(np.uint8).tobytes()
                else:
                    bits = np.unpackbits(
                        rv.astype(np.uint8)[:, None], axis=1)[:, 8 - depth:]
                    flat = bits.reshape(-1)
                    flat = np.concatenate(
                        [flat, np.zeros((-len(flat)) % 8, np.uint8)])
                    rb = np.packbits(flat).tobytes()
                out += b"\x00" + rb
            return out
        return fn

    def build(w, h, depth, ctype, interlace, fn, palette=None):
        out = b"\x89PNG\r\n\x1a\n"
        out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                          ctype, 0, 0, interlace))
        if palette is not None:
            out += chunk(b"PLTE", palette.tobytes())
        if interlace == 0:
            raw = fn(w, h, 0, 1, 0, 1)
        else:
            raw = b""
            for x0, dx, y0, dy in ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw > 0 and ph > 0:
                    raw += fn(pw, ph, x0, dx, y0, dy)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    rng = np.random.default_rng(0)
    for (w, h) in [(13, 9), (16, 16), (1, 1)]:
        idx = rng.integers(0, 16, (h, w)).astype(np.uint8)
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        gray = rng.integers(0, 256, (h, w)).astype(np.uint8)
        ga = rng.integers(0, 256, (h, w, 2)).astype(np.uint8)
        rgba = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        for il in (0, 1):
            assert np.array_equal(codec.png_decode(
                build(w, h, 4, 3, il, rows(idx[..., None], 4), pal)),
                pal[idx])
            assert np.array_equal(codec.png_decode(
                build(w, h, 8, 3, il, rows(idx[..., None], 8), pal)),
                pal[idx])
            assert np.array_equal(codec.png_decode(
                build(w, h, 16, 0, il, rows(gray[..., None], 16))),
                np.repeat(gray[..., None], 3, -1))
            assert np.array_equal(codec.png_decode(
                build(w, h, 8, 4, il, rows(ga, 8))),
                np.repeat(ga[..., 0:1], 3, -1))
            assert np.array_equal(codec.png_decode(
                build(w, h, 16, 2, il, rows(rgb, 16))), rgb)
            assert np.array_equal(codec.png_decode(
                build(w, h, 8, 6, il, rows(rgba, 8))), rgba[..., :3])
            g2 = (gray >> 6).astype(np.uint8)
            assert np.array_equal(codec.png_decode(
                build(w, h, 2, 0, il, rows(g2[..., None], 2))),
                np.repeat(((g2.astype(np.uint16) * 255) // 3)
                          .astype(np.uint8)[..., None], 3, -1))
