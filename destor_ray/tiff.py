"""Baseline TIFF 6.0 codec — pure numpy/Python, no external library.

Decoder: both byte orders (II/MM), first-IFD walk with out-of-line
value arrays, stripped images (any RowsPerStrip), compressions 1
(none), 5 (TIFF LZW with the spec's early-change code-width bump),
8/32946 (zlib Deflate) and 32773 (PackBits), horizontal-differencing
predictor 2, photometric interpretations 0/1 (gray, either polarity,
1/4/8/16 bits), 2 (RGB, 8 or 16 bits/sample, chunky planar config)
and 3 (palette via the 16-bit ColorMap tag), plus the TILED layout
(TileWidth/TileLength/TileOffsets, padded edge tiles) and MULTI-PAGE
IFD chains (decode_pages — scanner/fax outputs; codec.decode_frames
dispatches them as frames). TIFF is the archival / scanner format of
a crawl's document slice.

Encoder: 8-bit RGB and grayscale writers with compression
none/PackBits/LZW (+ optional predictor 2) and configurable
RowsPerStrip — every decoder path above is exercised by our own
round trips plus a handcrafted conformance matrix in tests.

Public spec: TIFF 6.0 specification (Adobe, 1992); LZW early-change
behavior per the spec's LZW section and the libtiff compatibility
note. Reference parity note: the destor reference treats payloads as
opaque chunk streams; image-format awareness is this repo's
multimodal extension (SURVEY §6), not a port.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def is_tiff(data) -> bool:
    head = bytes(data[:4])
    return head in (b"II*\x00", b"MM\x00*")


def _read_ifd(data: bytes, off: int | None = None):
    """Parse one IFD into {tag: numpy value array}; returns
    (byte_order, tags, next_ifd_offset) — 0 next-offset ends the
    multi-page chain."""
    if not is_tiff(data):
        raise ValueError("not a TIFF stream")
    bo = "<" if data[:2] == b"II" else ">"
    if off is None:
        off = struct.unpack_from(bo + "I", data, 4)[0]
    n = struct.unpack_from(bo + "H", data, off)[0]
    tags = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        voff = base + 8 if total <= 4 else \
            struct.unpack_from(bo + "I", data, base + 8)[0]
        if typ in (3, 8):
            vals = np.frombuffer(data, bo + "u2", cnt, voff).astype(np.int64)
        elif typ in (4, 9, 11):
            vals = np.frombuffer(data, bo + "u4", cnt, voff).astype(np.int64)
        elif typ in (1, 2, 6, 7):
            vals = np.frombuffer(data, np.uint8, cnt, voff).astype(np.int64)
        elif typ == 5:
            pairs = np.frombuffer(data, bo + "u4", cnt * 2, voff)
            vals = pairs.astype(np.int64)
        else:
            continue
        tags[tag] = vals
    nxt = struct.unpack_from(bo + "I", data, off + 2 + 12 * n)[0]
    return bo, tags, nxt


def meta(data: bytes) -> tuple[int, int]:
    """(w, h) from the first IFD without decoding strips."""
    _, tags, _ = _read_ifd(data)
    return int(tags[256][0]), int(tags[257][0])


def _lzw_decode(buf: bytes) -> bytes:
    """TIFF LZW: MSB-first bit packing, 9-bit initial codes,
    Clear=256 / EOI=257, table growth with the early-change bump
    (width increments when the NEXT code would not fit — one entry
    earlier than GIF's convention)."""
    out = bytearray()
    nbits_total = len(buf) * 8
    pos = 0
    width = 9

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits_total:
            return 257  # treat truncation as EOI
        byte0 = pos >> 3
        shift = 24 - (pos & 7) - width
        # 3-byte window always covers (pos & 7) + width <= 19 bits
        chunk = buf[byte0:byte0 + 3].ljust(3, b"\0")
        val = (chunk[0] << 16 | chunk[1] << 8 | chunk[2]) >> shift
        pos += width
        return val & ((1 << width) - 1)

    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == 256:
            reset()
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early change: bump ONE entry before the table fills the
        # current width (GIF bumps at len == 2^width; TIFF's spec
        # bug bumps at 511/1022/2046)
        if len(table) + 1 == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF LZW compressor (early-change width bump, Clear at 4094)."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258

    table, nxt = fresh()
    put(256)
    cur = b""
    for b in raw:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        put(table[cur])
        table[cand] = nxt
        nxt += 1
        # early change: one entry before the GIF convention's
        # 2^width + 1 (mirrors the decoder's 511/1022/2046 bumps)
        if nxt == (1 << width) and width < 12:
            width += 1
        elif nxt == 4093:
            put(256)
            table, nxt = fresh()
            width = 9
        cur = bytes([b])
    if cur:
        put(table[cur])
    put(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(buf: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(buf) and len(out) < expect:
        n = buf[i]
        i += 1
        if n < 128:
            out += buf[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([buf[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes((257 - run, row[i]))
            i += run
            continue
        j = i + 1
        while j < n and j - i < 128 and not (
                j + 1 < n and row[j] == row[j + 1]):
            j += 1
        out += bytes((j - i - 1,)) + row[i:j]
        i = j
    return bytes(out)


def decode(data: bytes) -> np.ndarray:
    """Decode a baseline TIFF (first page) into an (h, w, 3) uint8
    RGB array."""
    bo, tags, _ = _read_ifd(data)
    return _decode_ifd(data, bo, tags)


def decode_pages(data: bytes) -> list[np.ndarray]:
    """All pages of a multi-page TIFF (the IFD chain — scanner and
    fax outputs), each an (h, w, 3) array."""
    bo, tags, nxt = _read_ifd(data)
    pages = [_decode_ifd(data, bo, tags)]
    seen = set()
    while nxt and nxt not in seen and len(pages) < 4096:
        seen.add(nxt)
        bo, tags, nxt = _read_ifd(data, nxt)
        pages.append(_decode_ifd(data, bo, tags))
    return pages


def _decompress(buf: bytes, comp: int, expect: int) -> bytes:
    if comp == 1:
        raw = buf[:expect]
    elif comp == 5:
        raw = _lzw_decode(buf)[:expect]
    elif comp in (8, 32946):
        raw = zlib.decompress(buf)[:expect]
    elif comp == 32773:
        raw = _packbits_decode(buf, expect)
    else:
        raise ValueError(f"unsupported TIFF compression {comp}")
    if len(raw) < expect:
        raise ValueError("truncated strip/tile data")
    return raw


def _decode_ifd(data: bytes, bo: str, tags: dict) -> np.ndarray:
    w = int(tags[256][0])
    h = int(tags[257][0])
    comp = int(tags.get(259, [1])[0])
    photo = int(tags.get(262, [1])[0])
    spp = int(tags.get(277, [1])[0])
    bits = tags.get(258, np.array([1]))
    rps = int(tags.get(278, [h])[0]) or h
    pred = int(tags.get(317, [1])[0])
    planar = int(tags.get(284, [1])[0])
    if planar != 1:
        raise ValueError("planar config 2 (separate planes) unsupported")
    if int(tags.get(266, [1])[0]) != 1:
        raise ValueError("FillOrder 2 unsupported")
    bps = int(bits[0])
    if np.any(bits != bps):
        raise ValueError(f"mixed BitsPerSample {bits}")
    row_bytes = (w * spp * bps + 7) // 8
    if 322 in tags:  # tiled layout (TileWidth/TileLength/TileOffsets)
        if bps != 8:
            raise ValueError("tiled TIFF supported at 8 bits/sample")
        tw_t = int(tags[322][0])
        th_t = int(tags[323][0])
        offs = tags[324]
        cnts = tags[325]
        n_across = -(-w // tw_t)
        n_down = -(-h // th_t)
        canvas = np.zeros((n_down * th_t, n_across * tw_t, spp),
                          np.uint8)
        trow = tw_t * spp
        for ti in range(len(offs)):
            raw = _decompress(data[int(offs[ti]):int(offs[ti])
                                   + int(cnts[ti])], comp, trow * th_t)
            tile = np.frombuffer(raw, np.uint8).reshape(th_t, tw_t, spp)
            ty, tx = divmod(ti, n_across)
            canvas[ty * th_t:(ty + 1) * th_t,
                   tx * tw_t:(tx + 1) * tw_t] = tile
        samp = canvas[:h, :w].astype(np.uint8)
        if pred == 2:
            raise ValueError("predictor on tiled TIFF unsupported")
        flat = None
    else:
        offs = tags[273]
        cnts = tags.get(279)
        if cnts is None:
            if len(offs) != 1:
                raise ValueError("missing StripByteCounts")
            cnts = np.array([len(data) - int(offs[0])])
        chunks = []
        for si in range(len(offs)):
            nrows = min(rps, h - si * rps)
            chunks.append(_decompress(
                data[int(offs[si]):int(offs[si]) + int(cnts[si])],
                comp, row_bytes * nrows))
        flat = np.frombuffer(b"".join(chunks), np.uint8)

    if flat is None:
        pass  # tiled path already produced `samp`
    elif bps == 8:
        samp = flat.reshape(h, w, spp).astype(np.uint8).copy()
        if pred == 2:
            np.cumsum(samp, axis=1, dtype=np.uint8, out=samp)
    elif bps == 16:
        s16 = np.frombuffer(flat.tobytes(), np.dtype(bo + "u2")) \
            .reshape(h, w, spp).astype(np.uint16)
        if pred == 2:
            s16 = np.cumsum(s16, axis=1, dtype=np.uint16)
        samp = (s16 >> 8).astype(np.uint8)
    elif bps in (1, 2, 4):
        if spp != 1:
            raise ValueError(f"bps={bps} with spp={spp}")
        rows = flat.reshape(h, row_bytes)
        bits_arr = np.unpackbits(rows, axis=1)
        per = 8 // bps
        grp = bits_arr[:, :w * bps].reshape(h, w, bps)
        weights = (1 << np.arange(bps - 1, -1, -1)).astype(np.uint8)
        samp = (grp * weights).sum(axis=2).astype(np.uint8)[..., None]
    else:
        raise ValueError(f"unsupported BitsPerSample {bps}")

    maxv = (1 << bps) - 1 if bps < 8 else 255
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB with <3 samples")
        return np.ascontiguousarray(samp[:, :, :3])
    if photo == 3:
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("palette TIFF missing ColorMap")
        n = 1 << bps
        pal = (cmap.reshape(3, n).T >> 8).astype(np.uint8)
        return pal[samp[:, :, 0]]
    if photo in (0, 1):
        g = samp[:, :, 0]
        if maxv != 255:
            g = ((g.astype(np.int64) * 255) // maxv).astype(np.uint8)
        if photo == 0:
            g = (255 - g.astype(np.int64)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    raise ValueError(f"unsupported photometric {photo}")


def _entry(bo: str, tag: int, typ: int, vals, extra: bytearray,
           data_start: int) -> bytes:
    """One 12-byte IFD entry; long values appended to `extra`."""
    vals = list(vals)
    size = _TYPE_SIZE[typ] * len(vals)
    fmt = {3: "H", 4: "I"}[typ]
    packed = struct.pack(bo + fmt * len(vals), *vals)
    if size <= 4:
        return struct.pack(bo + "HHI", tag, typ, len(vals)) + \
            packed.ljust(4, b"\0")
    off = data_start + len(extra)
    extra.extend(packed)
    if len(extra) & 1:
        extra.append(0)
    return struct.pack(bo + "HHII", tag, typ, len(vals), off)


def encode(pixels: np.ndarray, compression: str = "none",
           predictor: bool = False, rows_per_strip: int = 0,
           byte_order: str = "<") -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) gray uint8 array as a
    baseline TIFF. compression: "none" | "packbits" | "lzw" |
    "deflate"; predictor applies horizontal differencing (LZW/deflate
    only); rows_per_strip=0 means one strip."""
    gray = pixels.ndim == 2
    if pixels.dtype != np.uint8 or (not gray and (
            pixels.ndim != 3 or pixels.shape[2] != 3)):
        raise ValueError(f"expected (h,w,3) or (h,w) uint8, got {pixels.shape}")
    h, w = pixels.shape[:2]
    spp = 1 if gray else 3
    rps = rows_per_strip or h
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5, "deflate": 8}[
        compression]
    if predictor and compression in ("none", "packbits"):
        raise ValueError("predictor 2 needs lzw/deflate")

    body = pixels.reshape(h, w * spp)
    if predictor:
        d = body.astype(np.int16).reshape(h, w, spp)
        d[:, 1:] -= d[:, :-1].copy()
        body = (d & 0xFF).astype(np.uint8).reshape(h, w * spp)

    strips = []
    for y0 in range(0, h, rps):
        raw = body[y0:y0 + rps].tobytes()
        if compression == "none":
            strips.append(raw)
        elif compression == "packbits":
            seg = bytearray()
            rb = w * spp
            for r in range(0, len(raw), rb):
                seg += _packbits_encode(raw[r:r + rb])
            strips.append(bytes(seg))
        elif compression == "lzw":
            strips.append(_lzw_encode(raw))
        else:
            strips.append(zlib.compress(raw, 6))

    bo = byte_order
    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM",
                         42, 8)
    n_strips = len(strips)
    tag_list = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * spp),
        (259, 3, [comp_id]), (262, 3, [1 if gray else 2]),
        (273, 4, [0] * n_strips),  # patched below
        (277, 3, [spp]), (278, 4, [rps]),
        (279, 4, [len(s) for s in strips]),
    ]
    if predictor:
        tag_list.append((317, 3, [2]))
    tag_list.sort()
    ifd_off = 8
    ifd_size = 2 + 12 * len(tag_list) + 4
    data_start = ifd_off + ifd_size
    extra = bytearray()

    # first pass to size `extra`, second pass with real strip offsets
    for _tag, typ, vals in tag_list:
        _entry(bo, _tag, typ, vals, extra, data_start)
    strip0 = data_start + len(extra)
    offsets = []
    pos = strip0
    for s in strips:
        offsets.append(pos)
        pos += len(s) + (len(s) & 1)
    tag_list = [(273, 4, offsets) if t[0] == 273 else t for t in tag_list]

    extra = bytearray()
    entries = b"".join(_entry(bo, t, ty, v, extra, data_start)
                       for t, ty, v in tag_list)
    ifd = struct.pack(bo + "H", len(tag_list)) + entries + \
        struct.pack(bo + "I", 0)
    out = bytearray(header + ifd + extra)
    for s in strips:
        out += s
        if len(s) & 1:
            out.append(0)
    return bytes(out)
