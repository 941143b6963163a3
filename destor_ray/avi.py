"""Minimal MJPEG-in-AVI container codec — pure Python/struct, no
external deps. This makes the VIDEO multimodal path REAL for one
industry container family (Motion-JPEG AVI is what cheap cameras,
capture cards and OpenCV's `MJPG` fourcc emit): each frame is an
interchange-format baseline JFIF JPEG (destor_ray.jpeg — any player
opens the file), wrapped in the RIFF/AVI chunk grammar with a standard
`idx1` index so seeking works in real tools.

The ffmpeg seam in stages/multimodal.py remains the declared stub for
entropy-coded video codecs (H.264 etc.); MJPEG needs no inter-frame
state, which is exactly why it is implementable — and losslessly
frame-addressable — here.

Format (all little-endian u32 sizes, chunks padded to even length):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader   (56 B: us/frame, counts, dims)
        LIST 'strl'
          'strh' 'vids'/'MJPG' (56 B: scale/rate = fps, length)
          'strf' BITMAPINFOHEADER (40 B: dims, 24bpp, 'MJPG')
        [LIST 'strl'                              — optional audio
          'strh' 'auds' (scale=1, rate=samples/s, sample size 2)
          'strf' PCMWAVEFORMAT (16 B: tag 1, mono, 16-bit)]
      LIST 'movi'
        '00dc' <jpeg bytes> ['01wb' <pcm frame-slice>] ...
      'idx1' (16 B/chunk: fourcc, KEYFRAME flag, offset, size)

The optional stream-1 audio track is uncompressed 16-bit mono PCM
interleaved per video frame (the standard muxer layout: each '00dc'
is followed by the '01wb' slice covering that frame's period), which
is what any AVI demuxer expects. `audio=None` emits a byte-identical
single-stream file to the original writer.

Reference: the Microsoft RIFF/AVI 1.0 spec (public; also OpenJDK's and
OpenCV's MJPEG writers follow this exact minimal layout).
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_mjpeg(frames: list[bytes], w: int, h: int,
                 fps: int = 10, audio: "np.ndarray | None" = None,
                 audio_rate: int = 8000) -> bytes:
    """JFIF frame blobs → one MJPEG AVI file (bytes). Every frame is a
    keyframe (MJPEG has no inter-frame prediction). `audio` (optional)
    is a mono int16 PCM array written as an interleaved second stream
    ('01wb' slice after each '00dc', per-frame period); audio=None
    emits a byte-identical single-stream file."""
    if not frames:
        raise ValueError("no frames")
    n = len(frames)
    max_sz = max(len(f) for f in frames)
    has_audio = audio is not None
    if has_audio:
        audio = np.ascontiguousarray(np.asarray(audio, dtype="<i2"))
        # per-frame sample slice boundaries (remainder spread evenly)
        cuts = (np.arange(n + 1) * len(audio)) // n

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,        # dwMicroSecPerFrame
        max_sz * fps,            # dwMaxBytesPerSec (advisory)
        0,                       # dwPaddingGranularity
        0x10,                    # AVIF_HASINDEX
        n, 0, 2 if has_audio else 1, max_sz,
        w, h, 0, 0, 0, 0)        # width, height, reserved[4]
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, max_sz,
                          0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24,
                       int.from_bytes(b"MJPG", "little"),
                       w * h * 3, 0, 0, 0, 0)
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    if has_audio:
        strh_a = (b"auds" + b"\x00" * 4
                  + struct.pack("<10I", 0, 0, 0, 1, audio_rate, 0,
                                len(audio), audio_rate * 2,
                                0xFFFFFFFF, 2)
                  + struct.pack("<4H", 0, 0, 0, 0))
        # PCMWAVEFORMAT: tag 1 (PCM), mono, 16-bit
        strf_a = struct.pack("<2H2I2H", 1, 1, audio_rate,
                             audio_rate * 2, 2, 16)
        strl += _list(b"strl", _chunk(b"strh", strh_a)
                      + _chunk(b"strf", strf_a))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_payload = b"movi"
    idx = b""
    for fi, f in enumerate(frames):
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += (b"00dc" + struct.pack("<3I", 0x10,
                                      len(movi_payload), len(f)))
        movi_payload += _chunk(b"00dc", f)
        if has_audio:
            sl = audio[cuts[fi]:cuts[fi + 1]].tobytes()
            idx += (b"01wb" + struct.pack("<3I", 0x10,
                                          len(movi_payload), len(sl)))
            movi_payload += _chunk(b"01wb", sl)
    movi = _chunk(b"LIST", movi_payload)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a chunk run."""
    i = start
    while i + 8 <= end:
        fourcc = buf[i:i + 4]
        (ln,) = struct.unpack_from("<I", buf, i + 4)
        yield fourcc, i + 8, ln
        i += 8 + ln + (ln & 1)


def decode_frames(data: bytes) -> list[bytes]:
    """AVI bytes → list of per-frame JPEG blobs (00dc/00db chunks of
    the first movi LIST). Walks the chunk grammar — does not trust
    idx1 — so files from other writers parse too."""
    if not is_avi(data):
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    for fourcc, p, ln in _walk_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[p:p + 4] == b"movi":
            return [data[fp:fp + fln]
                    for fcc, fp, fln in _walk_chunks(data, p + 4, p + ln)
                    if fcc in (b"00dc", b"00db")]
    raise ValueError("no movi LIST")


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → (mono int16 PCM array, sample_rate) from the
    interleaved '01wb' stream-1 chunks. Walks the chunk grammar (does
    not trust idx1); the rate comes from the 'auds' strl's
    PCMWAVEFORMAT. Raises ValueError when the file has no audio
    stream."""
    if not is_avi(data):
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    rate = 0
    pieces: list[bytes] = []
    for fourcc, p, ln in _walk_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[p:p + 4] == b"hdrl":
            for fcc, lp, lln in _walk_chunks(data, p + 4, p + ln):
                if fcc != b"LIST" or data[lp:lp + 4] != b"strl":
                    continue
                is_auds = False
                for sc, sp, sln in _walk_chunks(data, lp + 4, lp + lln):
                    if sc == b"strh":
                        is_auds = data[sp:sp + 4] == b"auds"
                    elif sc == b"strf" and is_auds and sln >= 8:
                        (rate,) = struct.unpack_from("<I", data, sp + 4)
        elif fourcc == b"LIST" and data[p:p + 4] == b"movi":
            pieces = [data[fp:fp + fln]
                      for fcc, fp, fln in _walk_chunks(data, p + 4,
                                                       p + ln)
                      if fcc == b"01wb"]
    if not rate or not pieces:
        raise ValueError("no audio stream")
    pcm = np.frombuffer(b"".join(pieces), dtype="<i2")
    return pcm, rate


def meta(data: bytes) -> tuple[int, int, int, int]:
    """(n_frames, w, h, fps) from the avih header — no frame parsing."""
    if not is_avi(data):
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    for fourcc, p, ln in _walk_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[p:p + 4] == b"hdrl":
            for fcc, hp, hln in _walk_chunks(data, p + 4, p + ln):
                if fcc == b"avih":
                    v = struct.unpack_from("<14I", data, hp)
                    us_pf, n, w, h = v[0], v[4], v[8], v[9]
                    return n, w, h, (1_000_000 // us_pf if us_pf else 0)
    raise ValueError("no avih header")
