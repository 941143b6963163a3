"""ICO (Windows icon / favicon) codec — pure numpy/Python.

Decoder: ICONDIR + ICONDIRENTRY walk; each entry is either a PNG
blob (Vista+ icons) or a headerless BMP (BITMAPINFOHEADER with
DOUBLED height covering the XOR color plane + the 1-bit AND
transparency mask; the mask is dropped — this repo's codec contract
is opaque RGB). `decode` returns the largest entry; `decode_frames`
exposes every size (favicons ship 16/32/48 px variants of the same
artwork — the multi-resolution analog of a multi-page TIFF). ICO is
the favicon format every crawl's HTML slice references.

Encoder: a valid writer embedding 24-bit BMP entries (or PNG when
asked), so the directory walk, doubled-height BMP path and PNG path
all round-trip.

Public spec: the ICO/CUR file format as documented in the Windows
GDI references (ICONDIR/ICONDIRENTRY/BITMAPINFOHEADER). Reference
parity note: the destor reference treats payloads as opaque chunk
streams; image-format awareness is this repo's multimodal extension
(SURVEY §6), not a port.
"""

from __future__ import annotations

import struct

import numpy as np

from . import bmp as _bmp
from .codec import is_png, png_decode, png_encode


def is_ico(data) -> bool:
    return len(data) >= 6 and bytes(data[:4]) == b"\x00\x00\x01\x00"


def _entries(data: bytes):
    n = struct.unpack_from("<H", data, 4)[0]
    if len(data) < 6 + 16 * n:
        raise ValueError("truncated ICO directory")
    out = []
    for i in range(6, 6 + 16 * n, 16):
        w, h = data[i], data[i + 1]
        size, off = struct.unpack_from("<II", data, i + 8)
        blob = data[off:off + size]
        if len(blob) < size or size < 16:
            raise ValueError("truncated ICO entry")
        out.append((w or 256, h or 256, blob))
    if not out:
        raise ValueError("empty ICO directory")
    return out


def _decode_entry(blob: bytes) -> np.ndarray:
    if is_png(blob):
        return png_decode(blob)
    # headerless BMP: BITMAPINFOHEADER with height = 2*h (XOR + AND)
    if len(blob) < 40:
        raise ValueError("truncated ICO BMP entry")
    hdr_size = struct.unpack_from("<I", blob, 0)[0]
    if hdr_size < 40 or hdr_size > len(blob):
        raise ValueError(f"bad ICO BMP header size {hdr_size}")
    w, h2, planes, bpp, comp = struct.unpack_from("<iiHHI", blob, 4)
    h = h2 // 2
    n_colors = struct.unpack_from("<I", blob, 32)[0]
    if bpp <= 8 and n_colors == 0:
        n_colors = 1 << bpp
    # rebuild a standalone BMP: keep the ORIGINAL header bytes (so
    # BI_BITFIELDS masks and the palette stay at their true offsets)
    # and only patch the doubled height; the AND-mask bytes trailing
    # the XOR plane are simply never read
    hdr = bytearray(blob[:hdr_size])
    struct.pack_into("<i", hdr, 8, h)
    masks_len = 12 if comp == 3 and hdr_size == 40 else 0
    pal_len = 4 * (n_colors if bpp <= 8 else 0)
    pix_off = 14 + hdr_size + masks_len + pal_len
    file_hdr = struct.pack("<2sIHHI", b"BM",
                           14 + len(blob), 0, 0, pix_off)
    return _bmp.decode(file_hdr + bytes(hdr) + blob[hdr_size:])


def decode(data: bytes) -> np.ndarray:
    """Largest entry of the icon as an (h, w, 3) uint8 RGB array."""
    if not is_ico(data):
        raise ValueError("not an ICO stream")
    ents = _entries(data)
    if not ents:
        raise ValueError("empty ICO directory")
    w, h, blob = max(ents, key=lambda e: e[0] * e[1])
    return _decode_entry(blob)


def decode_frames(data: bytes) -> list[np.ndarray]:
    """Every size variant in directory order (16/32/48... px)."""
    if not is_ico(data):
        raise ValueError("not an ICO stream")
    return [_decode_entry(blob) for _w, _h, blob in _entries(data)]


def meta(data: bytes) -> tuple[int, int]:
    """(w, h) of the largest entry, from the directory alone."""
    if not is_ico(data):
        raise ValueError("not an ICO stream")
    ents = _entries(data)
    w, h, _ = max(ents, key=lambda e: e[0] * e[1])
    return w, h


def encode(images: list[np.ndarray], png: bool = False) -> bytes:
    """(h, w, 3) uint8 arrays (each dim <= 256) → ICO bytes; entries
    are 24-bit BMPs with an all-opaque AND mask, or PNGs."""
    n = len(images)
    header = struct.pack("<HHH", 0, 1, n)
    dir_entries = bytearray()
    blobs = []
    off = 6 + 16 * n
    for px in images:
        h, w = px.shape[:2]
        if w > 256 or h > 256:
            raise ValueError(f"ICO entries cap at 256, got {w}x{h}")
        if png:
            blob = png_encode(px)
        else:
            stride = ((w * 3 + 3) // 4) * 4
            rows = np.zeros((h, stride), np.uint8)
            rows[:, :w * 3] = px[:, :, ::-1].reshape(h, w * 3)
            xor = rows[::-1].tobytes()
            mask_stride = ((w + 31) // 32) * 4
            mask = b"\x00" * (mask_stride * h)  # all opaque
            info = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 24,
                               0, len(xor) + len(mask), 0, 0, 0, 0)
            blob = info + xor + mask
        dir_entries += struct.pack("<BBBBHHII", w % 256, h % 256, 0,
                                   0, 1, 24, len(blob), off)
        blobs.append(blob)
        off += len(blob)
    return bytes(header) + bytes(dir_entries) + b"".join(blobs)
