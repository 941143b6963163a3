"""Windows BMP (DIB) codec — pure numpy/Python, no external library.

Decoder: BITMAPFILEHEADER + CORE/INFO/V4/V5 DIB headers, bottom-up and
top-down rows, bit depths 1/4/8 (palette), 16 (555 default or
BI_BITFIELDS masks), 24 (BGR) and 32 (BGRX / BI_BITFIELDS), plus the
two RLE modes (BI_RLE8 / BI_RLE4 with end-of-line, end-of-bitmap and
delta escapes). BMP is the uncompressed interchange format Windows
tooling emits and a steady minority of crawl payloads; decoding it is
pure layout work, so everything except the RLE escape walk is
vectorized numpy.

Encoder: 24-bit uncompressed, 8-bit palette (optionally RLE8
compressed) — enough that the decoder's palette, padding, top-down and
RLE paths are all exercised by our own round trips.

Public spec: Windows GDI BITMAPINFOHEADER documentation (MSDN) /
Windows Metafile Format specification. Reference parity note: the
destor reference treats payloads as opaque chunk streams
(destor/src/jcr.c); image-format awareness is this repo's multimodal
extension (SURVEY §6), not a port.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data) -> bool:
    return bytes(data[:2]) == b"BM"


def _mask_shift(mask: int) -> tuple[int, int]:
    """(shift, width) of a contiguous channel bit mask; (0, 0) if empty."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    return shift, width


def _parse_headers(data: bytes):
    if not is_bmp(data):
        raise ValueError("not a BMP stream")
    if len(data) < 18:
        raise ValueError("truncated BMP header")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size == 12:  # BITMAPCOREHEADER
        w, h, planes, bpp = struct.unpack_from("<HHHH", data, 18)
        comp, n_colors = 0, 0
        topdown = False
        pal_off = 14 + 12
        pal_entry = 3
    elif hdr_size in (40, 52, 56, 64, 108, 124):
        w, h, planes, bpp, comp = struct.unpack_from("<iiHHI", data, 18)
        n_colors = struct.unpack_from("<I", data, 46)[0]
        topdown = h < 0
        h = abs(h)
        pal_off = 14 + hdr_size
        pal_entry = 4
    else:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise ValueError(f"BMP planes={planes}")
    masks = None
    if comp == 3:  # BI_BITFIELDS: masks precede the palette (v2/v3)
        if hdr_size == 40:
            masks = struct.unpack_from("<III", data, 54)
            pal_off += 12
        else:  # V4/V5 embed RGBA masks in the header at offset 54
            masks = struct.unpack_from("<III", data, 54)
    return dict(pix_off=pix_off, w=w, h=h, bpp=bpp, comp=comp,
                n_colors=n_colors, topdown=topdown, pal_off=pal_off,
                pal_entry=pal_entry, masks=masks)


def meta(data: bytes) -> tuple[int, int]:
    """(w, h) without decoding pixel data."""
    hd = _parse_headers(data)
    return hd["w"], hd["h"]


def _palette(data: bytes, hd) -> np.ndarray:
    n = hd["n_colors"] or (1 << hd["bpp"])
    ent = hd["pal_entry"]
    raw = np.frombuffer(data, np.uint8,
                        count=n * ent, offset=hd["pal_off"])
    raw = raw.reshape(n, ent)
    return raw[:, 2::-1].copy()  # BGR(A) -> RGB


def _decode_rle(data: bytes, hd) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 → (h, w) palette-index array (top-down)."""
    w, h = hd["w"], hd["h"]
    out = np.zeros((h, w), np.uint8)
    buf = data[hd["pix_off"]:]
    x = y = i = 0
    rle4 = hd["comp"] == 2
    while i + 1 < len(buf):
        cnt, val = buf[i], buf[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if rle4:
                pair = np.array([val >> 4, val & 0xF], np.uint8)
                run = np.tile(pair, (cnt + 1) // 2)[:cnt]
            else:
                run = np.full(cnt, val, np.uint8)
            n = min(cnt, w - x)
            if n > 0 and y < h:
                out[y, x:x + n] = run[:n]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            x += buf[i]
            y += buf[i + 1]
            i += 2
        else:  # absolute mode: val literal pixels, word-aligned
            if rle4:
                nbytes = (val + 1) // 2
                lit = np.frombuffer(buf, np.uint8, nbytes, i)
                px = np.empty(nbytes * 2, np.uint8)
                px[0::2] = lit >> 4
                px[1::2] = lit & 0xF
                px = px[:val]
            else:
                nbytes = val
                px = np.frombuffer(buf, np.uint8, nbytes, i)
            i += nbytes + (nbytes & 1)
            n = min(val, w - x)
            if n > 0 and y < h:
                out[y, x:x + n] = px[:n]
            x += val
    if not hd["topdown"]:  # RLE bitmaps are stored bottom-up
        out = out[::-1]
    return out


def decode(data: bytes) -> np.ndarray:
    """Decode a BMP file into an (h, w, 3) uint8 RGB array."""
    hd = _parse_headers(data)
    w, h, bpp, comp = hd["w"], hd["h"], hd["bpp"], hd["comp"]
    if comp in (1, 2):
        if (comp == 1 and bpp != 8) or (comp == 2 and bpp != 4):
            raise ValueError(f"RLE comp={comp} with bpp={bpp}")
        idx = _decode_rle(data, hd)
        return _palette(data, hd)[idx]
    if comp not in (0, 3):
        raise ValueError(f"unsupported BMP compression {comp}")
    stride = ((w * bpp + 31) // 32) * 4
    raw = np.frombuffer(data, np.uint8, count=stride * h,
                        offset=hd["pix_off"]).reshape(h, stride)
    if not hd["topdown"]:
        raw = raw[::-1]
    if bpp == 24:
        px = raw[:, :w * 3].reshape(h, w, 3)
        return px[:, :, ::-1].copy()
    if bpp == 32:
        px = raw[:, :w * 4].reshape(h, w, 4)
        if comp == 3 and hd["masks"] is not None:
            vals = px.view(np.uint8).astype(np.uint32)
            word = (vals[:, :, 0] | vals[:, :, 1] << 8
                    | vals[:, :, 2] << 16 | vals[:, :, 3] << 24)
            return _apply_masks(word, hd["masks"])
        return px[:, :, 2::-1].copy()
    if bpp == 16:
        word = raw[:, :w * 2].reshape(h, w, 2).astype(np.uint32)
        word = word[:, :, 0] | word[:, :, 1] << 8
        masks = hd["masks"] if comp == 3 and hd["masks"] else \
            (0x7C00, 0x03E0, 0x001F)
        return _apply_masks(word, masks)
    if bpp == 8:
        idx = raw[:, :w]
        return _palette(data, hd)[idx]
    if bpp == 4:
        nib = np.empty((h, stride * 2), np.uint8)
        nib[:, 0::2] = raw >> 4
        nib[:, 1::2] = raw & 0xF
        return _palette(data, hd)[nib[:, :w]]
    if bpp == 1:
        bits = np.unpackbits(raw, axis=1)
        return _palette(data, hd)[bits[:, :w]]
    raise ValueError(f"unsupported BMP bpp {bpp}")


def _apply_masks(word: np.ndarray, masks) -> np.ndarray:
    out = np.empty(word.shape + (3,), np.uint8)
    for c, mask in enumerate(masks):
        shift, width = _mask_shift(int(mask))
        if width == 0:
            out[:, :, c] = 0
            continue
        v = (word >> shift) & ((1 << width) - 1)
        # scale to 8 bits by bit replication
        if width >= 8:
            out[:, :, c] = (v >> (width - 8)).astype(np.uint8)
        else:
            out[:, :, c] = ((v * 255) // ((1 << width) - 1)).astype(np.uint8)
    return out


def _file_header(pix_off: int, img_size: int) -> bytes:
    return struct.pack("<2sIHHI", b"BM", pix_off + img_size, 0, 0, pix_off)


def _info_header(w: int, h: int, bpp: int, comp: int, img_size: int,
                 n_colors: int, topdown: bool = False) -> bytes:
    return struct.pack("<IiiHHIIiiII", 40, w, -h if topdown else h, 1,
                       bpp, comp, img_size, 2835, 2835, n_colors, 0)


def encode(pixels: np.ndarray, topdown: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BMP."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {pixels.shape}")
    h, w = pixels.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = pixels[:, :, ::-1].reshape(h, w * 3)
    if not topdown:
        rows = rows[::-1]
    body = rows.tobytes()
    return (_file_header(14 + 40, len(body))
            + _info_header(w, h, 24, 0, len(body), 0, topdown) + body)


def _rle8_compress(idx: np.ndarray) -> bytes:
    """BI_RLE8 encode of an (h, w) index array (encoded runs +
    end-of-line / end-of-bitmap escapes; rows bottom-up)."""
    out = bytearray()
    for row in idx[::-1]:
        n = len(row)
        i = 0
        while i < n:
            run = 1
            while (i + run < n and run < 255
                   and row[i + run] == row[i]):
                run += 1
            out += bytes((run, int(row[i])))
            i += run
        out += b"\x00\x00"  # end of line
    out[-2:] = b"\x00\x01"  # last EOL becomes end of bitmap
    return bytes(out)


def encode_palette(idx: np.ndarray, palette: np.ndarray,
                   rle: bool = False) -> bytes:
    """Encode an (h, w) uint8 index array + (n<=256, 3) RGB palette as
    an 8-bit BMP, optionally RLE8-compressed."""
    if idx.dtype != np.uint8 or idx.ndim != 2:
        raise ValueError(f"expected (h,w) uint8 indices, got {idx.shape}")
    h, w = idx.shape
    n = len(palette)
    pal = np.zeros((n, 4), np.uint8)
    pal[:, 2::-1] = palette[:, :3]
    if rle:
        body = _rle8_compress(idx)
        comp = 1
    else:
        stride = ((w + 3) // 4) * 4
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = idx
        body = rows[::-1].tobytes()
        comp = 0
    pix_off = 14 + 40 + 4 * n
    return (_file_header(pix_off, len(body))
            + _info_header(w, h, 8, comp, len(body), n)
            + pal.tobytes() + body)
