"""Netpbm codec (PBM/PGM/PPM, P1–P6) — pure numpy/Python.

Decoder: all six magic numbers — ASCII (P1 bitmap, P2 graymap, P3
pixmap) and raw binary (P4 packed bitmap, P5 graymap, P6 pixmap) —
with `#` comments anywhere in the header, arbitrary token whitespace,
and 1- or 2-byte (big-endian, maxval > 255) raw samples rescaled to
8 bits. Netpbm is the classic uncompressed interchange family that
scientific tooling and converters emit.

Encoder: P6 (RGB) and P5 (gray) raw writers — the formats' entire
binary surface, so decode paths are exercised by our own round trips.

Public spec: netpbm format manual pages (pbm(5), pgm(5), ppm(5)).
Reference parity note: the destor reference treats payloads as opaque
chunk streams; image-format awareness is this repo's multimodal
extension (SURVEY §6), not a port.
"""

from __future__ import annotations

import re

import numpy as np

_MAGICS = {b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"}
_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*([^\s#]+)")


def is_netpbm(data) -> bool:
    return bytes(data[:2]) in _MAGICS


def _tokens(data: bytes, n: int, pos: int) -> tuple[list[bytes], int]:
    """Read n whitespace/comment-delimited header tokens from pos."""
    out = []
    for _ in range(n):
        m = _TOKEN.match(data, pos)
        if not m:
            raise ValueError("truncated netpbm header")
        out.append(m.group(1))
        pos = m.end()
    return out, pos


def meta(data: bytes) -> tuple[int, int]:
    """(w, h) without decoding samples."""
    (w, h), _ = _dims(data)
    return w, h


def _dims(data: bytes):
    magic = bytes(data[:2])
    if magic not in _MAGICS:
        raise ValueError("not a netpbm stream")
    toks, pos = _tokens(data, 2, 2)
    return (int(toks[0]), int(toks[1])), (magic, pos)


def decode(data: bytes) -> np.ndarray:
    """Decode any P1–P6 stream into an (h, w, 3) uint8 RGB array
    (gray and bitmap variants replicated across channels; PBM's
    1 = black convention mapped to 0 intensity)."""
    (w, h), (magic, pos) = _dims(data)
    kind = magic[1:2]
    if kind in b"14":  # bitmap: no maxval token
        maxval = 1
    else:
        toks, pos = _tokens(data, 1, pos)
        maxval = int(toks[0])
        if not 0 < maxval < 65536:
            raise ValueError(f"bad maxval {maxval}")
    n_samp = w * h * (3 if kind in b"36" else 1)

    if kind == b"1":  # ASCII bitmap: digits need NO separators (pbm(5))
        text = re.sub(rb"#[^\n]*", b"", data[pos:])
        arr = np.frombuffer(text, np.uint8)
        vals = (arr[(arr == 0x30) | (arr == 0x31)] - 0x30) \
            .astype(np.int64)[:n_samp]
        if len(vals) < n_samp:
            raise ValueError("truncated netpbm samples")
    elif kind in b"23":  # ASCII sample text
        text = data[pos:]
        vals = np.array(text.split()[:n_samp], dtype=np.int64)
        if len(vals) < n_samp:
            raise ValueError("truncated netpbm samples")
    elif kind == b"4":  # packed bits, rows byte-aligned
        pos += 1  # single whitespace after header
        stride = (w + 7) // 8
        raw = np.frombuffer(data, np.uint8, stride * h, pos)
        vals = np.unpackbits(raw.reshape(h, stride),
                             axis=1)[:, :w].reshape(-1).astype(np.int64)
    else:  # P5 / P6 raw
        pos += 1
        if maxval > 255:
            raw = np.frombuffer(data, ">u2", n_samp, pos)
        else:
            raw = np.frombuffer(data, np.uint8, n_samp, pos)
        vals = raw.astype(np.int64)

    if kind in b"14":  # 1 = black
        px8 = ((1 - vals) * 255).astype(np.uint8)
    elif maxval == 255:
        px8 = vals.astype(np.uint8)
    else:
        px8 = ((vals * 255) // maxval).astype(np.uint8)

    if kind in b"36":
        return px8.reshape(h, w, 3)
    return np.repeat(px8.reshape(h, w, 1), 3, axis=2)


def encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a raw P6 PPM."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {pixels.shape}")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def encode_gray(gray: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 gray array as a raw P5 PGM."""
    if gray.dtype != np.uint8 or gray.ndim != 2:
        raise ValueError(f"expected (h,w) uint8, got {gray.shape}")
    h, w = gray.shape
    return b"P5\n%d %d\n255\n" % (w, h) + gray.tobytes()
