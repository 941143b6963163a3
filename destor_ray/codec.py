"""Deterministic pure-numpy image codec.

This sandbox has no PIL/libjpeg, so the corpus carries images in a
deterministic container format ("DRI1") with two codecs:

  * fmt="png"  — lossless: zlib over raw RGB bytes.
  * fmt="jpeg" — lossy: uniform per-pixel quantization with step
    ``max(1, (100 - quality) // 4)`` then zlib. Decoding reconstructs the
    quantization-bin midpoint, so PSNR vs the source is deterministic:
    >= 40 dB is guaranteed for quality >= 68 (step <= 8 → ~40.9 dB);
    quality 64-67 gives step 9 → ~39.8 dB, just under the bar. The corpus
    generator only emits quality >= 80 (step <= 5 → ~45 dB).

The *semantics* mirror what a real image pipeline needs: a lossy
re-encode produces different bytes but near-identical pixels (a planted
near-duplicate), a lossless encode round-trips exactly. Swapping in a
real JPEG codec later only changes this module.

Header layout (little-endian):
  magic  4s  b"DRI1"
  codec  u8  0=lossless 1=lossy
  qual   u8  quality (100 for lossless)
  w      u16
  h      u16
  chans  u8  always 3
  payload    zlib-compressed uint8 C-order array bytes
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"DRI1"
_HDR = struct.Struct("<4sBBHHB")

LOSSLESS_FMTS = {"png"}
LOSSY_FMTS = {"jpeg"}


def _lossy_step(quality: int) -> int:
    return max(1, (100 - int(quality)) // 4)


def encode(pixels: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 array into the deterministic container."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    if fmt in LOSSLESS_FMTS:
        codec, qual, payload = 0, 100, pixels
    elif fmt in LOSSY_FMTS:
        step = _lossy_step(quality)
        codec, qual = 1, int(quality)
        payload = (pixels // step).astype(np.uint8)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    hdr = _HDR.pack(MAGIC, codec, qual, w, h, 3)
    return hdr + zlib.compress(payload.tobytes(), 6)


def decode(data: bytes) -> np.ndarray:
    """Decode container bytes back into an (h, w, 3) uint8 array."""
    magic, codec, qual, w, h, chans = _HDR.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError("bad magic; not a DRI1 payload")
    raw = np.frombuffer(zlib.decompress(data[_HDR.size:]), dtype=np.uint8)
    arr = raw.reshape(h, w, chans)
    if codec == 1:
        step = _lossy_step(qual)
        arr = np.minimum(arr.astype(np.int32) * step + step // 2, 255).astype(np.uint8)
    return arr


def decode_meta(data: bytes) -> tuple[str, int, int, int]:
    """(fmt, quality, w, h) from the header without decompressing."""
    magic, codec, qual, w, h, _ = _HDR.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError("bad magic; not a DRI1 payload")
    return ("png" if codec == 0 else "jpeg", qual, w, h)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two uint8 arrays of identical shape; inf if equal."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def resize_nn(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize of an (h, w, ...) array."""
    h, w = pixels.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return pixels[ri][:, ci]


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, uint8."""
    p = pixels.astype(np.float32)
    g = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    return g.astype(np.uint8)


def thumbnail(pixels: np.ndarray, size: int = 16) -> bytes:
    """size×size gray thumbnail bytes — the compact verify signature.

    Carried as a binary column so the verify stage never ships full
    payloads across the shuffle (SURVEY.md §7.4 "wide rows").
    """
    return to_gray(resize_nn(pixels, size, size)).tobytes()


def thumb_psnr(t1: bytes, t2: bytes, size: int = 16) -> float:
    a = np.frombuffer(t1, dtype=np.uint8).reshape(size, size)
    b = np.frombuffer(t2, dtype=np.uint8).reshape(size, size)
    return psnr(a, b)


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(pixels: np.ndarray) -> np.int64:
    """64-bit perceptual hash: 32×32 gray → 2D DCT-II → top-left 8×8
    (minus DC) thresholded at its median. Returns int64 (bit 63 in sign)."""
    g = to_gray(resize_nn(pixels, 32, 32))
    return phash64_batch(g[None, :, :])[0]


def phash64_batch(grays32: np.ndarray) -> np.ndarray:
    """Vectorized phash over a (n, 32, 32) float/uint8 gray stack → int64[n]."""
    m = _dct_matrix(32)
    d = np.einsum("ij,njk,lk->nil", m, grays32.astype(np.float64), m)
    block = d[:, :8, :8].reshape(len(grays32), 64)
    med = np.median(block[:, 1:], axis=1, keepdims=True)
    bits = (block > med).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
    return (bits * weights).sum(axis=1, dtype=np.uint64).view(np.int64)


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a, b) -> np.ndarray:
    """Vectorized popcount of XOR over int64/uint64 arrays."""
    av = np.asarray(a).astype(np.int64).view(np.uint64)
    bv = np.asarray(b).astype(np.int64).view(np.uint64)
    x = np.bitwise_xor(av, bv)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        cnt += _POPCOUNT8[np.bitwise_and(x, np.uint64(0xFF)).astype(np.intp)]
        x = np.right_shift(x, np.uint64(8))
    return cnt
