"""BMP / Netpbm / TIFF codecs (destor_ray.bmp / netpbm / tiff) —
round trips, handcrafted decode-only conformance paths, codec
dispatch."""

import struct

import numpy as np

from destor_ray import bmp, codec, netpbm, tiff

RNG = np.random.default_rng(17)
PX = RNG.integers(0, 256, (37, 53, 3), dtype=np.uint8)
GRAY = RNG.integers(0, 256, (37, 53), dtype=np.uint8)


# ---------------------------------------------------------------- BMP

def test_bmp_24bit_roundtrip_both_row_orders():
    for topdown in (False, True):
        data = bmp.encode(PX, topdown=topdown)
        assert np.array_equal(bmp.decode(data), PX), topdown
        assert bmp.meta(data) == (53, 37)


def test_bmp_palette_and_rle8():
    idx = RNG.integers(0, 256, (23, 41), dtype=np.uint8)
    pal = RNG.integers(0, 256, (256, 3), dtype=np.uint8)
    for rle in (False, True):
        out = bmp.decode(bmp.encode_palette(idx, pal, rle=rle))
        assert np.array_equal(out, pal[idx]), rle
    # RLE8 with long runs (the encoded-run path, not just literals)
    runs = np.repeat(np.arange(16, dtype=np.uint8), 64).reshape(4, 256)
    out = bmp.decode(bmp.encode_palette(runs, pal, rle=True))
    assert np.array_equal(out, pal[runs])


def _raw_bmp(w, h, bpp, comp, pal_rgbx, body, masks=b""):
    n = len(pal_rgbx) // 4
    pix_off = 14 + 40 + len(masks) + len(pal_rgbx)
    hdr = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0,
                      pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                       len(body), 0, 0, n, 0)
    return hdr + info + masks + pal_rgbx + body


def test_bmp_1_and_4_bit_handcrafted():
    # 1-bit: 10x2, palette black/white, rows bottom-up, 4-byte stride
    pal = bytes([0, 0, 0, 0]) + bytes([255, 255, 255, 0])
    row0 = bytes([0b10110000, 0b10000000]) + b"\0\0"  # displayed row 1
    row1 = bytes([0b01001111, 0b01000000]) + b"\0\0"  # displayed row 0
    out = bmp.decode(_raw_bmp(10, 2, 1, 0, pal, row1 + row0))
    bits_top = np.array([1, 0, 1, 1, 0, 0, 0, 0, 1, 0])
    bits_bot = np.array([0, 1, 0, 0, 1, 1, 1, 1, 0, 1])
    exp = np.stack([bits_top, bits_bot]) * 255
    assert np.array_equal(out, np.repeat(exp[:, :, None], 3, 2))

    # 4-bit: 3x1, indices 2, 10, 5
    pal4 = b"".join(bytes([i, 2 * i, 3 * i, 0]) for i in range(16))
    body = bytes([0x2A, 0x50]) + b"\0\0"
    out = bmp.decode(_raw_bmp(3, 1, 4, 0, pal4, body))
    # palette entries are stored BGRX → RGB = (3i, 2i, i)
    exp = np.array([[[6, 4, 2], [30, 20, 10], [15, 10, 5]]], np.uint8)
    assert np.array_equal(out, exp)


def test_bmp_16bit_565_bitfields_and_32bit():
    # one pixel, RGB565 via BI_BITFIELDS: pure red / green / blue
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    vals = [0xF800, 0x07E0, 0x001F]
    body = b"".join(struct.pack("<H", v) for v in vals) + b"\0\0"
    out = bmp.decode(_raw_bmp(3, 1, 16, 3, b"", body, masks))
    exp = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], np.uint8)
    assert np.array_equal(out, exp)

    # 32-bit XRGB (no compression): BGRX byte order
    body = bytes([10, 20, 30, 0, 40, 50, 60, 0])
    out = bmp.decode(_raw_bmp(2, 1, 32, 0, b"", body))
    exp = np.array([[[30, 20, 10], [60, 50, 40]]], np.uint8)
    assert np.array_equal(out, exp)


def test_bmp_rle4_handcrafted():
    pal4 = b"".join(bytes([17 * i, 17 * i, 17 * i, 0]) for i in range(16))
    # encoded run: 5 pixels alternating 3,4 then EOL, then EOB
    body = bytes([5, 0x34, 0, 0, 0, 1])
    out = bmp.decode(_raw_bmp(5, 1, 4, 2, pal4, body))
    exp_idx = np.array([[3, 4, 3, 4, 3]])
    assert np.array_equal(out[:, :, 0], (exp_idx * 17).astype(np.uint8))


# ------------------------------------------------------------- Netpbm

def test_netpbm_p6_p5_roundtrip_and_dispatch():
    d6 = netpbm.encode(PX)
    assert np.array_equal(netpbm.decode(d6), PX)
    assert netpbm.meta(d6) == (53, 37)
    assert np.array_equal(codec.decode(d6), PX)
    assert codec.decode_meta(d6) == ("pnm", 100, 53, 37)
    d5 = netpbm.encode_gray(GRAY)
    assert np.array_equal(netpbm.decode(d5),
                          np.repeat(GRAY[:, :, None], 3, 2))


def test_netpbm_ascii_variants_with_comments():
    h, w = PX.shape[:2]
    p3 = (b"P3\n# a comment\n%d # inline\n%d\n255\n" % (w, h)
          + b" ".join(str(v).encode() for v in PX.reshape(-1)))
    assert np.array_equal(netpbm.decode(p3), PX)
    v = RNG.integers(0, 1001, (9, 11))
    p2 = (b"P2\n11 9\n1000\n"
          + b" ".join(str(x).encode() for x in v.reshape(-1)))
    assert np.array_equal(netpbm.decode(p2)[:, :, 0],
                          ((v * 255) // 1000).astype(np.uint8))


def test_netpbm_bitmaps_and_16bit():
    bits = RNG.integers(0, 2, (16, 23), dtype=np.uint8)
    p1 = (b"P1\n23 16\n"
          + b"\n".join(b" ".join(str(v).encode() for v in row)
                       for row in bits))
    stride = (23 + 7) // 8
    packed = np.packbits(
        np.pad(bits, ((0, 0), (0, stride * 8 - 23))), axis=1)
    p4 = b"P4\n23 16\n" + packed.tobytes()
    exp = np.repeat(((1 - bits.astype(np.int64)) * 255)
                    .astype(np.uint8)[:, :, None], 3, 2)
    assert np.array_equal(netpbm.decode(p1), exp)
    assert np.array_equal(netpbm.decode(p4), exp)
    # P1 digits need NO separators per pbm(5) — packed rows decode too
    p1_packed = (b"P1\n23 16\n"
                 + b"\n".join(b"".join(str(v).encode() for v in row)
                              for row in bits))
    assert np.array_equal(netpbm.decode(p1_packed), exp)
    v = RNG.integers(0, 65536, (9, 11))
    p5 = b"P5\n11 9\n65535\n" + v.astype(">u2").tobytes()
    assert np.array_equal(netpbm.decode(p5)[:, :, 0],
                          ((v * 255) // 65535).astype(np.uint8))


# --------------------------------------------------------------- TIFF

def test_tiff_rgb_roundtrip_compressions_and_strips():
    for comp in ("none", "packbits", "lzw", "deflate"):
        for rps in (0, 5):
            d = tiff.encode(PX, compression=comp, rows_per_strip=rps)
            assert np.array_equal(tiff.decode(d), PX), (comp, rps)
    assert tiff.meta(tiff.encode(PX)) == (53, 37)


def test_tiff_predictor_and_byte_order():
    sm = np.repeat(np.repeat(
        RNG.integers(0, 256, (10, 14, 3), dtype=np.uint8), 4, 0),
        4, 1)[:37, :53]
    for comp in ("lzw", "deflate"):
        d = tiff.encode(sm, compression=comp, predictor=True,
                        rows_per_strip=7)
        assert np.array_equal(tiff.decode(d), sm), comp
    d = tiff.encode(PX, compression="packbits", byte_order=">")
    assert np.array_equal(tiff.decode(d), PX)


def test_tiff_lzw_width_boundaries_and_clear():
    """A 200x300 noisy image drives the LZW table through the
    511/1022/2046 early-change bumps and past the 4093-entry CLEAR."""
    big = RNG.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    assert np.array_equal(tiff.decode(tiff.encode(big, compression="lzw")),
                          big)


def test_tiff_gray_roundtrip():
    d = tiff.encode(GRAY, compression="lzw")
    assert np.array_equal(tiff.decode(d),
                          np.repeat(GRAY[:, :, None], 3, 2))


def _raw_tiff(tags, body, bo="<"):
    """Minimal single-strip little-endian TIFF with literal tags;
    `tags` = [(tag, type, [vals])], strip data appended after IFD."""
    entries = b""
    extra = b""
    n = len(tags)
    ifd_off = 8
    data_start = ifd_off + 2 + 12 * n + 4
    # compute where strip body goes: after extra arrays
    sizes = {3: 2, 4: 4}
    ex_len = 0
    for _t, ty, vals in tags:
        tot = sizes[ty] * len(vals)
        if tot > 4:
            ex_len += tot + (tot & 1)
    strip_off = data_start + ex_len
    out_tags = []
    for t, ty, vals in tags:
        if t == 273:
            vals = [strip_off]
        out_tags.append((t, ty, vals))
    pos = data_start
    for t, ty, vals in sorted(out_tags):
        fmt = {3: "H", 4: "I"}[ty]
        packed = struct.pack(bo + fmt * len(vals), *vals)
        if len(packed) <= 4:
            entries += struct.pack(bo + "HHI", t, ty, len(vals)) \
                + packed.ljust(4, b"\0")
        else:
            entries += struct.pack(bo + "HHII", t, ty, len(vals), pos)
            extra += packed
            if len(packed) & 1:
                extra += b"\0"
            pos += len(packed) + (len(packed) & 1)
    head = struct.pack(bo + "2sHI",
                       b"II" if bo == "<" else b"MM", 42, 8)
    ifd = struct.pack(bo + "H", n) + entries + struct.pack(bo + "I", 0)
    return head + ifd + extra + body


def test_tiff_palette_decode():
    idx = np.array([[0, 1, 2, 3]], np.uint8)
    # ColorMap: 16-bit, all reds then greens then blues
    reds = [0, 65535, 0, 30000] + [0] * 252
    greens = [0, 0, 65535, 20000] + [0] * 252
    blues = [65535, 0, 0, 10000] + [0] * 252
    d = _raw_tiff([
        (256, 4, [4]), (257, 4, [1]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, [0]), (277, 3, [1]), (278, 4, [1]),
        (279, 4, [4]), (320, 3, reds + greens + blues),
    ], idx.tobytes())
    out = tiff.decode(d)
    exp = np.array([[[0, 0, 255], [255, 0, 0], [0, 255, 0],
                     [30000 >> 8, 20000 >> 8, 10000 >> 8]]], np.uint8)
    assert np.array_equal(out, exp)


def test_tiff_bilevel_and_4bit_gray_and_inverted():
    # 1-bit WhiteIsZero (photometric 0): bit 1 -> black
    bits = bytes([0b10100000])
    d = _raw_tiff([
        (256, 4, [3]), (257, 4, [1]), (258, 3, [1]), (259, 3, [1]),
        (262, 3, [0]), (273, 4, [0]), (277, 3, [1]), (278, 4, [1]),
        (279, 4, [1]),
    ], bits)
    out = tiff.decode(d)
    assert out[0, :, 0].tolist() == [0, 255, 0]
    # 4-bit BlackIsZero gray: values 0..15 scale to 0..255
    d = _raw_tiff([
        (256, 4, [4]), (257, 4, [1]), (258, 3, [4]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [1]),
        (279, 4, [2]),
    ], bytes([0x0F, 0x8C]))
    out = tiff.decode(d)
    exp = [(0 * 255) // 15, (15 * 255) // 15, (8 * 255) // 15,
           (12 * 255) // 15]
    assert out[0, :, 0].tolist() == exp


def test_tiff_16bit_rgb_decode():
    s16 = RNG.integers(0, 65536, (2, 3, 3)).astype("<u2")
    d = _raw_tiff([
        (256, 4, [3]), (257, 4, [2]), (258, 3, [16, 16, 16]),
        (259, 3, [1]), (262, 3, [2]), (273, 4, [0]), (277, 3, [3]),
        (278, 4, [2]), (279, 4, [s16.nbytes]),
    ], s16.tobytes())
    assert np.array_equal(tiff.decode(d),
                          (s16.astype(np.uint32) >> 8).astype(np.uint8))


def test_codec_dispatch_bmp_tiff():
    for d, fmt in [(bmp.encode(PX), "bmp"),
                   (tiff.encode(PX, compression="lzw"), "tiff")]:
        assert np.array_equal(codec.decode(d), PX), fmt
        assert codec.decode_meta(d) == (fmt, 100, 53, 37)


# ------------------------------------------- channel + stats queries

def test_format_convert_dedup_per_class_full_recall(ray_session):
    """All nine container-conversion classes — pixel-lossless BMP /
    PPM / TIFF-LZW / lossless-WebP / ICO / TGA re-hosts (invisible to
    byte-hash dedup) and lossy JPEG-q90 / GIF-quantize / VP8-WebP
    re-encodes — detect with per-class recall 1.0 and zero false
    merges; measured gate margins (jfif >= 48.6 dB, gifq >= 28.0 vs
    distinct <= 21.0, gate 24) hold."""
    import __ray_entry__ as em

    out = em.queries()["format_convert_dedup"]("/root/testdata/sf0.001")
    df = out.set_index("kind")
    assert int(df.loc["_total", "n_planted"]) == 30
    for kind in ("bmp", "pnm", "tifflzw", "webp", "ico", "tga",
                 "jfif", "gifq", "webpv8", "_total"):
        assert int(df.loc[kind, "recall_ppm"]) == 1_000_000, kind
        assert int(df.loc[kind, "n_false"]) == 0, kind


def test_image_format_stats_counts(ray_session):
    """The mixed-container fixture ingests through the one decode
    dispatch: exact per-container counts + 90 PNGs."""
    import __ray_entry__ as em

    out = em.queries()["image_format_stats"]("/root/testdata/sf0.001")
    df = out.to_pandas().set_index("fmt")["n"]
    assert int(df["png"]) == 90
    # 30 dup slots cycle the 9 kinds deterministically: the first
    # three kinds land 4 each, the remaining six 3 each; the webpv8
    # (lossy VP8) rows sniff as fmt "webp", so that fmt counts both
    # WebP flavors
    exp = {"bmp": 4, "pnm": 4, "tiff": 4, "webp": 3 + 3, "ico": 3,
           "tga": 3, "jpeg": 3, "gif": 3}
    for fmt, n in exp.items():
        assert int(df[fmt]) == n, fmt
    assert int(df.drop("png").sum()) == 30


def test_webdataset_roundtrip_exact(ray_session):
    """Tar-shard export → read-back is exact: total samples and byte
    sums match the parquet source; shards are content-hash named and
    each holds <= samples_per_shard samples."""
    import pyarrow.parquet as pq

    import __ray_entry__ as em
    from destor_ray import corpus

    out = em.queries()["webdataset_roundtrip_stats"](
        "/root/testdata/sf0.001")
    tot = out[out["shard"] == "_total"].iloc[0]
    src = pq.read_table(corpus.ensure_corpus_parquet(512, seed=42),
                        columns=["bytes", "caption"])
    assert int(tot["n_samples"]) == 512
    assert int(tot["img_bytes"]) == sum(
        len(b) for b in src["bytes"].to_pylist())
    assert int(tot["txt_bytes"]) == sum(
        len(c.encode()) for c in src["caption"].to_pylist())
    per = out[out["shard"] != "_total"]
    assert (per["n_samples"] <= 128).all()
    assert per["shard"].str.startswith("shard-").all()


def test_webdataset_sample_grouping_kernel():
    """iter_tar_samples groups members by basename before the FIRST
    dot (the webdataset convention) and preserves member bytes."""
    import io
    import tarfile

    from destor_ray.sources.webdataset import iter_tar_samples

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:") as tf:
        for name, blob in [("a.img", b"AA"), ("a.seg.png", b"S"),
                           ("a.txt", b"cap"), ("b.img", b"BB")]:
            info = tarfile.TarInfo(name=name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    got = dict(iter_tar_samples(buf.getvalue()))
    assert got == {"a": {"img": b"AA", "seg.png": b"S", "txt": b"cap"},
                   "b": {"img": b"BB"}}
    # directory-aware keys: same basename in different dirs stays
    # two samples (the real-shard layout)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:") as tf:
        for name, blob in [("00/0001.img", b"A"), ("00/0001.txt", b"x"),
                           ("01/0001.img", b"B"), ("01/0001.txt", b"y")]:
            info = tarfile.TarInfo(name=name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    got = dict(iter_tar_samples(buf.getvalue()))
    assert got == {"00/0001": {"img": b"A", "txt": b"x"},
                   "01/0001": {"img": b"B", "txt": b"y"}}


def test_flagship_from_webdataset_identical_partition(ray_session):
    """The flagship near-dup pipeline over webdataset tar shards
    produces the identical cluster partition as over the parquet
    original — input-format independence, certified member-set by
    member-set."""
    import __ray_entry__ as em

    out = em.queries()["corpus_dedup_from_wds"]("/root/testdata/sf0.001")
    row = out.iloc[0]
    assert int(row["partitions_equal"]) == 1
    assert int(row["n_clusters_wds"]) == int(row["n_clusters_pq"])
    assert int(row["n_shards"]) >= 4


def test_decode_quarantine_mixed_exact_split(ray_session):
    """Corruption planted in every one of the seven codecs routes to
    quarantine per-row with the container still attributed; good rows
    decode. The truncated-VP8L case is the regression this pinned:
    the bit reader now raises instead of fabricating zero bits."""
    import __ray_entry__ as em

    out = em.queries()["decode_quarantine_mixed"](
        "/root/testdata/sf0.001")
    df = out.to_pandas().set_index(["fmt", "status"])["n"]
    for fmt in ("png", "jpeg", "gif", "bmp", "pnm", "tiff", "ico"):
        assert int(df[(fmt, "corrupt")]) == 8, fmt
        assert int(df[(fmt, "ok")]) == 24, fmt
    # both WebP flavors (VP8L chunk-wreck + lossy-VP8 truncation)
    # sniff as "webp" and fold into one row pair
    assert int(df[("webp", "corrupt")]) == 16
    assert int(df[("webp", "ok")]) == 48


def test_truncated_vp8l_raises():
    from destor_ray import webp

    px = RNG.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    d = webp.encode(px)
    import pytest
    with pytest.raises(ValueError):
        webp.decode(d[:len(d) // 2])


def _raw_tiff_multi(pages, bo="<"):
    """Minimal multi-page TIFF: each page an (h, w, 3) uint8 array,
    uncompressed single strip; IFDs chained via next-IFD offsets."""
    head = struct.pack(bo + "2sH", b"II" if bo == "<" else b"MM", 42)
    blobs = []
    # layout: header(8) | for each page: [IFD][strip]
    n_tags = 9
    ifd_size = 2 + 12 * n_tags + 4
    pos = 8
    metas = []
    for px in pages:
        h, w = px.shape[:2]
        strip_off = pos + ifd_size
        strip_len = h * w * 3
        metas.append((pos, strip_off, strip_len, w, h))
        pos = strip_off + strip_len + (strip_len & 1)
    out = bytearray(head + struct.pack(bo + "I", 8))
    for i, (px, (ifd_off, strip_off, strip_len, w, h)) in enumerate(
            zip(pages, metas)):
        nxt = metas[i + 1][0] if i + 1 < len(pages) else 0
        tags = [(256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]),
                (259, 3, [1]), (262, 3, [2]), (273, 4, [strip_off]),
                (277, 3, [3]), (278, 4, [h]), (279, 4, [strip_len])]
        entries = b""
        extra_pos = None
        for t, ty, vals in sorted(tags):
            fmt = {3: "H", 4: "I"}[ty]
            packed = struct.pack(bo + fmt * len(vals), *vals)
            if len(packed) <= 4:
                entries += struct.pack(bo + "HHI", t, ty, len(vals)) \
                    + packed.ljust(4, b"\0")
            else:
                # only 258 ([8,8,8], 6 bytes) goes out of line: stash
                # it in the 2 spare bytes? no — inline SHORT[3] needs
                # 6 bytes; point it at a constant we append after the
                # strip of the LAST page
                entries += struct.pack(bo + "HHII", t, ty, len(vals),
                                       extra_pos or 0)
        ifd = struct.pack(bo + "H", len(tags)) + entries \
            + struct.pack(bo + "I", nxt)
        assert len(ifd) == 2 + 12 * len(tags) + 4
        out += ifd + px.tobytes()
        if (h * w * 3) & 1:
            out += b"\0"
    # patch every 258 entry to point at a shared [8,8,8] at the end
    bps_off = len(out)
    out += struct.pack(bo + "HHH", 8, 8, 8)
    blob = bytes(out)
    patched = bytearray(blob)
    pos = 8
    for ifd_off, *_ in metas:
        n = struct.unpack_from(bo + "H", blob, ifd_off)[0]
        for k in range(n):
            base = ifd_off + 2 + 12 * k
            tag = struct.unpack_from(bo + "H", blob, base)[0]
            if tag == 258:
                struct.pack_into(bo + "I", patched, base + 8, bps_off)
    return bytes(patched)


def test_tiff_multipage_chain():
    pages = [RNG.integers(0, 256, (9, 7, 3), dtype=np.uint8),
             RNG.integers(0, 256, (5, 11, 3), dtype=np.uint8),
             RNG.integers(0, 256, (6, 6, 3), dtype=np.uint8)]
    d = _raw_tiff_multi(pages)
    out = tiff.decode_pages(d)
    assert len(out) == 3
    for a, b in zip(pages, out):
        assert np.array_equal(a, b)
    # decode() returns the first page only
    assert np.array_equal(tiff.decode(d), pages[0])


def test_tiff_tiled_decode():
    """12x10 RGB image in 8x8 tiles (2x2 grid, right/bottom padding),
    PackBits-compressed tiles."""
    from destor_ray.tiff import _packbits_encode

    px = RNG.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    th, tw = 8, 8
    tiles = []
    for ty in range(2):
        for tx in range(2):
            tile = np.zeros((th, tw, 3), np.uint8)
            seg = px[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            tile[:seg.shape[0], :seg.shape[1]] = seg
            raw = tile.tobytes()
            comp = b"".join(_packbits_encode(raw[r:r + tw * 3])
                            for r in range(0, len(raw), tw * 3))
            tiles.append(comp)
    # assemble: header + IFD + tile data
    bo = "<"
    n_tags = 10
    ifd_size = 2 + 12 * n_tags + 4
    data_start = 8 + ifd_size
    # out-of-line arrays: bps[3] (6B), offsets[4] (16B), counts[4] (16B)
    bps_off = data_start
    offs_off = bps_off + 6
    cnts_off = offs_off + 16
    tile0 = cnts_off + 16
    offsets, pos = [], tile0
    for t in tiles:
        offsets.append(pos)
        pos += len(t) + (len(t) & 1)
    tags = [(256, 4, [12]), (257, 4, [10]), (258, 3, None),
            (259, 3, [32773]), (262, 3, [2]), (277, 3, [3]),
            (322, 4, [8]), (323, 4, [8]), (324, 4, None),
            (325, 4, None)]
    entries = b""
    for t, ty_, vals in sorted(tags):
        if t == 258:
            entries += struct.pack(bo + "HHII", t, ty_, 3, bps_off)
        elif t == 324:
            entries += struct.pack(bo + "HHII", t, ty_, 4, offs_off)
        elif t == 325:
            entries += struct.pack(bo + "HHII", t, ty_, 4, cnts_off)
        else:
            packed = struct.pack(bo + {3: "H", 4: "I"}[ty_] * len(vals),
                                 *vals)
            entries += struct.pack(bo + "HHI", t, ty_, len(vals)) \
                + packed.ljust(4, b"\0")
    out = bytearray(struct.pack(bo + "2sHI", b"II", 42, 8))
    out += struct.pack(bo + "H", n_tags) + entries \
        + struct.pack(bo + "I", 0)
    out += struct.pack(bo + "HHH", 8, 8, 8)
    out += struct.pack(bo + "IIII", *offsets)
    out += struct.pack(bo + "IIII", *[len(t) for t in tiles])
    for t in tiles:
        out += t
        if len(t) & 1:
            out += b"\0"
    got = tiff.decode(bytes(out))
    assert np.array_equal(got, px)


def test_codec_decode_frames_multipage_tiff():
    from destor_ray import codec as codec_mod

    pages = [RNG.integers(0, 256, (6, 8, 3), dtype=np.uint8)
             for _ in range(2)]
    frames = codec_mod.decode_frames(_raw_tiff_multi(pages))
    assert len(frames) == 2
    assert np.array_equal(frames[1], pages[1])


def test_sniff_format_canonical_labels():
    """One magic-number table: decode, decode_meta and the quarantine
    attribution all agree on the canonical container labels."""
    from destor_ray import codec as codec_mod
    from destor_ray import gif, jpeg, webp

    px = RNG.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    idx = (px[:, :, 0] >> 4).astype(np.uint8)
    pal = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
    cases = {
        "png": codec_mod.png_encode(px),
        "jpeg": jpeg.encode(px, 90),
        "gif": gif.encode(idx, pal),
        "bmp": bmp.encode(px),
        "pnm": netpbm.encode(px),
        "tiff": tiff.encode(px),
        "webp": webp.encode(px),
    }
    for want, blob in cases.items():
        assert codec_mod.sniff_format(blob) == want, want
        # truncation keeps the attribution (the quarantine use case)
        assert codec_mod.sniff_format(blob[:16]) == want, want
    assert codec_mod.sniff_format(b"\x00\x01garbage") == "unknown"


def test_dedup_export_wds_composition(ray_session):
    """dedup → keep-best → tar-shard export → read-back: rep ids and
    cluster count survive the whole composition intact."""
    import __ray_entry__ as em

    out = em.queries()["corpus_dedup_export_wds"](
        "/root/testdata/sf0.001")
    row = out.iloc[0]
    assert int(row["readback_equal"]) == 1
    assert int(row["n_reps_exported"]) == int(row["n_clusters"])
    assert int(row["n_shards"]) >= 4


# ----------------------------------------------------------------- ICO

def test_ico_roundtrip_bmp_and_png_entries():
    from destor_ray import codec as codec_mod
    from destor_ray import ico

    imgs = [RNG.integers(0, 256, (s, s, 3), dtype=np.uint8)
            for s in (16, 32, 48)]
    for png in (False, True):
        d = ico.encode(imgs, png=png)
        out = ico.decode_frames(d)
        assert len(out) == 3
        for a, b in zip(imgs, out):
            assert np.array_equal(a, b), png
        # decode() = largest entry; dispatch + sniff agree
        assert np.array_equal(codec_mod.decode(d), imgs[2])
        assert codec_mod.decode_meta(d) == ("ico", 100, 48, 48)
        assert codec_mod.sniff_format(d) == "ico"
        assert len(codec_mod.decode_frames(d)) == 3
    # the 256-px entry stores 0 in the 1-byte directory dims
    big = [RNG.integers(0, 256, (256, 256, 3), dtype=np.uint8)]
    assert ico.meta(ico.encode(big)) == (256, 256)
    assert np.array_equal(ico.decode(ico.encode(big)), big[0])


def test_ico_bitfields_entry_and_error_types():
    """A 32bpp BI_BITFIELDS ICO entry decodes with the masks at their
    true offsets (regression: the rebuilt header once dropped the 12
    mask bytes and read pixels 12 bytes early); malformed directories
    raise ValueError like every other codec."""
    import pytest

    from destor_ray import ico

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    bgrx = np.zeros((4, 4, 4), np.uint8)
    bgrx[:, :, 0] = px[:, :, 2]
    bgrx[:, :, 1] = px[:, :, 1]
    bgrx[:, :, 2] = px[:, :, 0]
    xor = bgrx[::-1].tobytes()
    masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    info = struct.pack("<IiiHHIIiiII", 40, 4, 8, 1, 32, 3,
                       len(xor) + 8, 0, 0, 0, 0)
    blob = info + masks + xor + b"\0" * 16  # AND mask
    d = (struct.pack("<HHH", 0, 1, 1)
         + struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 32, len(blob), 22)
         + blob)
    assert np.array_equal(ico.decode(d), px)

    for bad in (b"\x00\x00\x01\x00\x01",
                b"\x00\x00\x01\x00" + b"\x00" * 20,
                b"\x00\x00\x01\x00\x00\x00"):
        with pytest.raises(ValueError):
            ico.decode(bad)


# ----------------------------------------------------------------- TGA

def test_tga_roundtrip_and_handcrafted():
    from destor_ray import codec as codec_mod
    from destor_ray import tga

    px = RNG.integers(0, 256, (23, 41, 3), dtype=np.uint8)
    for rle in (False, True):
        d = tga.encode(px, rle=rle)
        assert np.array_equal(tga.decode(d), px), rle
        assert np.array_equal(codec_mod.decode(d), px)
        assert codec_mod.decode_meta(d) == ("tga", 100, 41, 23)
        assert codec_mod.sniff_format(d) == "tga"
    sm = np.repeat(np.repeat(
        RNG.integers(0, 256, (5, 7, 3), dtype=np.uint8), 5, 0), 5, 1)
    d = tga.encode(sm, rle=True)
    assert len(d) < sm.nbytes  # RLE bites
    assert np.array_equal(tga.decode(d), sm)
    # 8-bit grayscale, top-down
    g = RNG.integers(0, 256, (4, 6), dtype=np.uint8)
    foot = struct.pack("<II", 0, 0) + b"TRUEVISION-XFILE.\x00"
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, 6, 4,
                      8, 0x20)
    assert np.array_equal(tga.decode(hdr + g.tobytes() + foot),
                          np.repeat(g[:, :, None], 3, 2))
    # color-mapped with nonzero first-entry index
    pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = RNG.integers(2, 6, (3, 5), dtype=np.uint8)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 2, 4, 24, 0, 0, 5, 3,
                      8, 0x20)
    d = hdr + pal[:, ::-1].tobytes() + idx.tobytes() + foot
    assert np.array_equal(tga.decode(d), pal[idx - 2])
    # 16-bit A1R5G5B5 truecolor
    vals = np.array([[0x7C00, 0x03E0, 0x001F]], np.uint16)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 3, 1,
                      16, 0x20)
    out = tga.decode(hdr + vals.astype("<u2").tobytes() + foot)
    exp = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], np.uint8)
    assert np.array_equal(out, exp)


def test_decode_dispatch_matches_sniff_on_footer_collision():
    """A payload with a valid LEADING magic plus a coincidental trailing
    TGA footer must dispatch to the leading-magic decoder in decode()/
    decode_meta() exactly as sniff_format() attributes it (ADVICE r3:
    the TGA footer check used to run before the TIFF/Netpbm magics)."""
    import numpy as np

    from destor_ray import codec as codec_mod
    from destor_ray import netpbm, tiff

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    for blob, want in [(tiff.encode(px), "tiff"),
                       (netpbm.encode(px), "pnm")]:
        evil = blob + b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
        assert codec_mod.sniff_format(evil) == want
        assert np.array_equal(codec_mod.decode(evil), px)
        assert codec_mod.decode_meta(evil)[0] == want


def test_webp_truncated_vp8x_raises():
    """A VP8X header chunk whose declared size or actual bytes are short
    must raise cleanly instead of parsing garbage dimensions."""
    import struct

    import pytest

    from destor_ray import webp as webp_mod

    # minimal RIFF/WEBP/VP8X wrapper truncated after 6 VP8X body bytes
    body = bytes(6)
    riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
            + b"VP8X" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="truncated VP8X"):
        webp_mod.meta(riff)


def test_footerless_tga_sniffs_and_decodes():
    """Pre-2.0 TGAs (no TRUEVISION-XFILE footer) sniff as 'tga' via
    the conservative header-plausibility test and decode through the
    one dispatch; random bytes and truncated files stay unknown."""
    import struct

    from destor_ray import codec as codec_mod
    from destor_ray import tga

    px = RNG.integers(0, 256, (23, 41, 3), dtype=np.uint8)
    full = tga.encode(px)
    footerless = full[:-26]  # strip 8-byte footer prefix + signature
    assert codec_mod.sniff_format(footerless) == "tga"
    assert np.array_equal(codec_mod.decode(footerless), px)
    assert codec_mod.decode_meta(footerless) == ("tga", 100, 41, 23)
    # RLE variant, footerless
    rle = tga.encode(px, rle=True)[:-26]
    assert codec_mod.sniff_format(rle) == "tga"
    assert np.array_equal(codec_mod.decode(rle), px)
    # negatives: truncated raw body (size bound fails), zero dims
    assert codec_mod.sniff_format(footerless[:200]) == "unknown"
    zd = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 0, 5,
                     24, 0) + b"\0" * 64
    assert codec_mod.sniff_format(zd) == "unknown"


def test_audio_format_convert_dedup_full_recall(ray_session):
    """All three lossless audio container-conversion classes — FLAC
    (default + 512 blocksize) and IEEE-float WAV re-hosts of the same
    recording — detect with per-class recall 1.0 and zero false merges
    through the canonical-PCM SHA band family."""
    import __ray_entry__ as em

    out = em.queries()["audio_format_convert_dedup"](
        "/root/testdata/sf0.001")
    df = out.set_index("kind")
    assert int(df.loc["_total", "n_planted"]) == 20
    for kind in ("flac", "flacbs", "wavf32", "_total"):
        assert int(df.loc[kind, "recall_ppm"]) == 1_000_000, kind
        assert int(df.loc[kind, "n_false"]) == 0, kind


def test_audio_container_stats_counts(ray_session):
    """The mixed wav+flac fixture decodes through the one
    AudioFeatures dispatch: exact per-container counts and identical
    per-clip sample totals (1 s at 8 kHz each)."""
    import __ray_entry__ as em

    df = em.queries()["audio_container_stats"]("/root/testdata/sf0.001") \
        .to_pandas().set_index("container")
    # 60 base wav clips + 20 planted conversions: flac+flacbs (14) are
    # FLAC containers, wavf32 (6) sniffs as wav
    assert int(df.loc["flac", "n_clips"]) == 14
    assert int(df.loc["wav", "n_clips"]) == 66
    assert int(df.loc["flac", "total_samples"]) == 14 * 8000
    assert int(df.loc["wav", "total_samples"]) == 66 * 8000


def test_audio_quarantine_stats_split(ray_session):
    """Poison audio rows route to the quarantine slice with exact
    error attribution: CRC-flipped + truncated FLAC raise ValueError
    (the CRC contract — corruption is DETECTED, never mis-decoded),
    garbage/unknown containers hit the seam's NotImplementedError,
    and every healthy wav/flac row decodes ok."""
    import __ray_entry__ as em

    df = em.queries()["audio_quarantine_stats"]("/root/testdata/sf0.001") \
        .to_pandas()
    by = {(r.status, r.err): int(r.n) for r in df.itertuples()}
    assert by[("ok", "")] == 48
    assert by[("corrupt", "ValueError")] == 6
    assert by[("corrupt", "NotImplementedError")] == 6
    assert sum(v for (s, _), v in by.items() if s == "corrupt") == 12
