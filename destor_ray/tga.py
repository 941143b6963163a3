"""TGA (Truevision Targa) codec — pure numpy/Python.

Decoder: color-mapped / truecolor / grayscale image types (1/2/3)
and their RLE variants (9/10/11), 8/15/16/24/32 bits per pixel,
color maps at 15/16/24/32 bits per entry with a nonzero first-entry
index, both row origins (descriptor bit 5), image-ID skip. TGA is
the legacy raster format of game assets and scanline tooling.

Encoder: 24-bit truecolor, raw or RLE, always with the TGA 2.0
footer ("TRUEVISION-XFILE.") — the format has NO leading magic, so
the footer is the only reliable container signature and `is_tga` /
codec dispatch key on it (pre-2.0 footerless files must be routed
explicitly, a documented limitation every sniffer shares).

Public spec: Truevision TGA File Format Specification v2.0 (1991).
Reference parity note: the destor reference treats payloads as
opaque chunk streams; image-format awareness is this repo's
multimodal extension (SURVEY §6), not a port.
"""

from __future__ import annotations

import struct

import numpy as np

_FOOTER_SIG = b"TRUEVISION-XFILE.\x00"


def is_tga(data) -> bool:
    return len(data) >= 44 and bytes(data[-18:]) == _FOOTER_SIG


def sniff_headerless(data) -> bool:
    """Conservative header-plausibility test for FOOTERLESS (pre-2.0)
    TGA files — round 4, closing the round-3 'footerless TGA sniffs
    as unknown' gap. TGA has no leading magic, so this cross-checks
    every constrained header field plus an exact payload-size bound
    for raw images; it runs LAST in codec.sniff_format, after every
    leading-magic format has failed to claim the payload, so a false
    positive requires random bytes to satisfy ~8 simultaneous
    constraints."""
    if len(data) < 19:
        return False
    id_len, cmap_type, img_type = data[0], data[1], data[2]
    if cmap_type not in (0, 1):
        return False
    base = img_type & 0x7
    if base not in (1, 2, 3) or (img_type & ~0xF):
        return False
    if (img_type & 0x8) and img_type not in (9, 10, 11):
        return False
    cmap_first, cmap_len, cmap_bits = struct.unpack_from("<HHB", data, 3)
    w, h = struct.unpack_from("<HH", data, 12)
    bpp, desc = data[16], data[17]
    if not (0 < w <= 16384 and 0 < h <= 16384):
        return False
    if desc & 0xC0:  # interleave flags always 0 in real files
        return False
    if cmap_type == 0:
        if cmap_len or cmap_bits or cmap_first:
            return False
    else:
        if cmap_bits not in (15, 16, 24, 32) or cmap_len == 0:
            return False
    if base == 1 and (cmap_type != 1 or bpp not in (8, 16)):
        return False
    if base == 2 and bpp not in (15, 16, 24, 32):
        return False
    if base == 3 and bpp != 8:
        return False
    body = 18 + id_len + (cmap_len * ((cmap_bits + 7) // 8)
                          if cmap_type else 0)
    need = w * h * ((bpp + 7) // 8)
    if img_type & 0x8:  # RLE: at least one packet, at most raw size
        return body < len(data) <= body + need + (need // 128) + 64
    # raw: exact payload, allowing a trailing extension area
    return body + need <= len(data) <= body + need + 1024


def meta(data: bytes) -> tuple[int, int]:
    """(w, h) from the 18-byte header."""
    if not (is_tga(data) or sniff_headerless(data)):
        raise ValueError("not a TGA stream (no v2.0 footer)")
    w, h = struct.unpack_from("<HH", data, 12)
    return w, h


def _expand_entries(raw: np.ndarray, bpp: int, n: int) -> np.ndarray:
    """(n, bytes_per) uint8 → (n, 3) RGB for 15/16/24/32-bit pixels
    or palette entries (TGA stores BGR(A); 15/16-bit is A1R5G5B5)."""
    if bpp in (15, 16):
        word = raw[:, 0].astype(np.uint16) | (
            raw[:, 1].astype(np.uint16) << 8)
        out = np.empty((n, 3), np.uint8)
        for c, shift in ((0, 10), (1, 5), (2, 0)):
            v = (word >> shift) & 0x1F
            out[:, c] = ((v.astype(np.uint32) * 255) // 31).astype(np.uint8)
        return out
    return raw[:, 2::-1].copy()  # BGR(A) -> RGB


def _decode_rle(buf: bytes, n_px: int, bytes_per: int) -> np.ndarray:
    out = np.empty((n_px, bytes_per), np.uint8)
    i = pos = 0
    while pos < n_px:
        if i >= len(buf):
            raise ValueError("truncated TGA RLE data")
        hdr = buf[i]
        i += 1
        cnt = (hdr & 0x7F) + 1
        cnt = min(cnt, n_px - pos)
        if hdr & 0x80:  # run packet: one pixel repeated
            px = np.frombuffer(buf, np.uint8, bytes_per, i)
            out[pos:pos + cnt] = px
            i += bytes_per
        else:  # raw packet
            px = np.frombuffer(buf, np.uint8, cnt * bytes_per, i) \
                .reshape(cnt, bytes_per)
            out[pos:pos + cnt] = px
            i += cnt * bytes_per
        pos += cnt
    return out


def decode(data: bytes) -> np.ndarray:
    """Decode a TGA file into an (h, w, 3) uint8 RGB array (v2.0
    footer or a headerless pre-2.0 file passing sniff_headerless)."""
    if not (is_tga(data) or sniff_headerless(data)):
        raise ValueError("not a TGA stream (no v2.0 footer)")
    (id_len, cmap_type, img_type) = data[0], data[1], data[2]
    cmap_first, cmap_len, cmap_bits = struct.unpack_from("<HHB", data, 3)
    w, h = struct.unpack_from("<HH", data, 12)
    bpp, desc = data[16], data[17]
    topdown = bool(desc & 0x20)
    pos = 18 + id_len
    palette = None
    if cmap_type == 1:
        ebytes = (cmap_bits + 7) // 8
        raw = np.frombuffer(data, np.uint8, cmap_len * ebytes, pos) \
            .reshape(cmap_len, ebytes)
        pal = _expand_entries(raw, cmap_bits, cmap_len)
        palette = np.zeros((cmap_first + cmap_len, 3), np.uint8)
        palette[cmap_first:] = pal
        pos += cmap_len * ebytes
    n_px = w * h
    bytes_per = (bpp + 7) // 8
    base_type = img_type & 0x7
    if base_type not in (1, 2, 3):
        raise ValueError(f"unsupported TGA image type {img_type}")
    if img_type & 0x8:  # RLE
        px = _decode_rle(data[pos:], n_px, bytes_per)
    else:
        px = np.frombuffer(data, np.uint8, n_px * bytes_per, pos) \
            .reshape(n_px, bytes_per)
    if base_type == 1:  # color-mapped
        if palette is None:
            raise ValueError("color-mapped TGA without a color map")
        rgb = palette[px[:, 0]]
    elif base_type == 3:  # grayscale
        rgb = np.repeat(px[:, :1], 3, axis=1)
    else:  # truecolor
        rgb = _expand_entries(px, bpp, n_px)
    img = rgb.reshape(h, w, 3)
    return img if topdown else img[::-1].copy()


def _rle_compress(rows: np.ndarray) -> bytes:
    """Per-row RLE (runs never cross scanlines, per spec guidance)."""
    out = bytearray()
    for row in rows:
        n = len(row)
        i = 0
        while i < n:
            run = 1
            while (i + run < n and run < 128
                   and (row[i + run] == row[i]).all()):
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += row[i].tobytes()
                i += run
                continue
            j = i + 1
            while (j < n and j - i < 128
                   and not (j + 1 < n and (row[j] == row[j + 1]).all())):
                j += 1
            out.append(j - i - 1)
            out += row[i:j].tobytes()
            i = j
    return bytes(out)


def encode(pixels: np.ndarray, rle: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as 24-bit TGA (type 2, or
    type 10 with rle=True), bottom-up, with the v2.0 footer."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {pixels.shape}")
    h, w = pixels.shape[:2]
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, 10 if rle else 2,
                         0, 0, 0, 0, 0, w, h, 24, 0)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    if rle:
        body = _rle_compress(bgr.reshape(h, w, 3))
    else:
        body = bgr.tobytes()
    footer = struct.pack("<II", 0, 0) + _FOOTER_SIG
    return header + body + footer
