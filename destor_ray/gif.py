"""GIF87a/GIF89a codec — pure numpy/Python, no external image library.

Decoder: full variable-width LZW (CLEAR/EOI handling, table growth to
12 bits), global and local color tables, row interlacing, extension
blocks skipped, multiple image frames (first frame returned through
the (h, w, 3) codec contract; `decode_frames` exposes all of them with
the frame-disposal composition a GIF viewer applies). GIF is the
third ubiquitous web still/animated format next to JPEG and PNG, and
its payloads dominate the "reaction image" slice of a crawl.

Encoder: a valid GIF89a writer — indexed pixels + palette in,
standard variable-width LZW compression (table growth to 12 bits,
CLEAR + reset at 4096 entries), optional interlacing — so the
decoder's dictionary-growth, width-change and KwKwK paths are all
exercised by our own round trips.

Public spec: GIF89a specification (CompuServe, 1990; W3C mirror).
Reference parity note: the destor reference treats payloads as opaque
chunk streams; image-format awareness is this repo's multimodal
extension (SURVEY §6), not a port.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")


def is_gif(data) -> bool:
    return bytes(data[:6]) in GIF_SIGS


def _lzw_compress(indices: np.ndarray, min_code: int) -> bytes:
    """Standard GIF LZW compression with variable code width (grows
    when the table reaches 2^width, capped at 12 bits, CLEAR + reset
    at 4096 entries) and LSB-first bit packing — byte-for-byte what
    every GIF writer emits, so the decoder's dictionary-growth and
    width-change paths are exercised by our own round trips."""
    clear = 1 << min_code
    eoi = clear + 1
    acc = 0
    nbits = 0
    out = bytearray()
    width = min_code + 1

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return ({bytes([i]): i for i in range(clear)}, clear + 2,
                min_code + 1)

    table, n_codes, width = fresh()
    put(clear)
    seq = b""
    for x in indices:
        nxt = seq + bytes([int(x)])
        if nxt in table:
            seq = nxt
            continue
        put(table[seq])
        table[nxt] = n_codes
        n_codes += 1
        # mirror the decoder: width grows AFTER the table reaches
        # 2^width; at 4096 emit CLEAR and restart
        if n_codes - 1 == (1 << width) and width < 12:
            width += 1
        elif n_codes > 4095:
            put(clear)
            table, n_codes, width = fresh()
        seq = bytes([int(x)])
    if seq:
        put(table[seq])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode(indices: np.ndarray, palette: np.ndarray,
           interlace: bool = False) -> bytes:
    """(h, w) uint8 palette indices + (n≤256, 3) uint8 palette →
    single-frame GIF89a bytes."""
    h, w = indices.shape
    n = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(n, 2)))))
    gct = np.zeros((1 << bits, 3), np.uint8)
    gct[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    rows = indices
    if interlace:
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = indices[order]
    min_code = max(2, bits)
    out += bytes([min_code])
    data = _lzw_compress(rows.reshape(-1), min_code)
    for i in range(0, len(data), 255):
        sub = data[i:i + 255]
        out += bytes([len(sub)]) + sub
    out += b"\x00"          # block terminator
    out += b"\x3b"          # trailer
    return bytes(out)


def encode_animation(frames: list[np.ndarray], palette: np.ndarray,
                     delay_cs: int = 10) -> bytes:
    """List of (h, w) uint8 index frames + shared palette → animated
    GIF89a (full-frame replace per frame, graphic-control delay,
    NETSCAPE loop extension)."""
    h, w = frames[0].shape
    n = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(n, 2)))))
    gct = np.zeros((1 << bits, 3), np.uint8)
    gct[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += gct.tobytes()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    for fr in frames:
        out += b"\x21\xf9" + bytes([4, 0x00]) \
            + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        data = _lzw_compress(fr.reshape(-1), min_code)
        for i in range(0, len(data), 255):
            sub = data[i:i + 255]
            out += bytes([len(sub)]) + sub
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """Full variable-width GIF LZW decode → uint8 index array."""
    clear = 1 << min_code
    eoi = clear + 1
    bits = np.unpackbits(np.frombuffer(data, np.uint8),
                         bitorder="little")
    pos = 0
    width = min_code + 1
    # table: list of byte strings
    base = [bytes([i]) for i in range(clear)]
    table = base + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    nbits = len(bits)
    weights = 1 << np.arange(12)
    while pos + width <= nbits and len(out) < n_pixels:
        code = int(bits[pos:pos + width] @ weights[:width])
        pos += width
        if code == clear:
            table = base + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]       # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _deinterlace(rows: np.ndarray, h: int) -> np.ndarray:
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_frames(data) -> list[np.ndarray]:
    """GIF bytes → list of composited (h, w, 3) uint8 RGB frames.
    Composition follows the viewer model: each frame draws into the
    logical screen at its descriptor offset; disposal method 2
    restores the frame's region to the background color afterwards
    (method 3 'restore previous' is treated as 2 — archival viewers
    do the same)."""
    buf = bytes(data)
    if not is_gif(buf):
        raise ValueError("not a GIF (missing signature)")
    w, h = struct.unpack_from("<HH", buf, 6)
    flags = buf[10]
    bg_idx = buf[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    screen = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        screen[:] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while pos < len(buf):
        b = buf[pos]
        if b == 0x3B:                       # trailer
            break
        if b == 0x21:                       # extension
            label = buf[pos + 1]
            pos += 2
            if label == 0xF9 and buf[pos] >= 4:   # graphic control
                gflags = buf[pos + 1]
                disposal = (gflags >> 2) & 0x7
                transparent = buf[pos + 4] if gflags & 1 else -1
            while buf[pos]:                 # skip sub-blocks
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", buf, pos + 1)
        iflags = buf[pos + 9]
        pos += 10
        ct = gct
        if iflags & 0x80:                   # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image without a color table")
        min_code = buf[pos]
        pos += 1
        chunks = []
        while buf[pos]:
            ln = buf[pos]
            chunks.append(buf[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code, fw * fh) \
            .reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx, fh)
        region = screen[fy:fy + fh, fx:fx + fw]
        px = ct[np.minimum(idx, len(ct) - 1)]
        if transparent >= 0:
            m = idx != transparent
            region[m] = px[m]
        else:
            region[:] = px
        frames.append(screen.copy())
        if disposal == 2 or disposal == 3:
            bg = ct[bg_idx] if bg_idx < len(ct) else 0
            screen[fy:fy + fh, fx:fx + fw] = bg
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF with no image frames")
    return frames


def decode(data) -> np.ndarray:
    """GIF bytes → first frame as (h, w, 3) uint8 RGB (the codec
    contract; decode_frames exposes the full animation)."""
    return decode_frames(data)[0]


def meta(data) -> tuple[int, int]:
    """(w, h) of the logical screen, header-only."""
    if not is_gif(data):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", bytes(data[6:10]), 0)
    return w, h
