"""Soft-import shims for OPTIONAL system media codecs.

This sandbox ships no libsndfile / ffmpeg / libjpeg bindings, so the
engine's own pure-numpy codecs (WAV PCM, baseline JFIF incl. 4:2:0,
PNG, MJPEG-AVI) are the default — and stay the default even when
system libs exist, because the test suite pins their bit-exact
behavior. The soft imports below are used only where the pure paths
CANNOT go:

  * compressed audio (mp3/flac/ogg)  → soundfile (libsndfile)
  * inter-frame video (H.264 etc.)   → av (PyAV/ffmpeg)

Each probe runs once per process and caches the module (or None).
When the lib is absent the calling seam raises the same
NotImplementedError it always did — the declared-seam contract from
SURVEY §7.5 is unchanged; when present, decoder="real" handles the
formats the seam used to reject.
"""

from __future__ import annotations

import io

import numpy as np

_cache: dict = {}


def _probe(name: str):
    if name not in _cache:
        try:
            _cache[name] = __import__(name)
        except ImportError:
            _cache[name] = None
    return _cache[name]


def soundfile():
    """libsndfile binding (or None)."""
    return _probe("soundfile")


def pyav():
    """PyAV ffmpeg binding (or None)."""
    return _probe("av")


def decode_audio(data: bytes) -> np.ndarray | None:
    """Compressed-audio bytes → float32 mono PCM via libsndfile, or
    None when the binding is absent (caller raises its seam error)."""
    sf = soundfile()
    if sf is None:
        return None
    pcm, _sr = sf.read(io.BytesIO(data), dtype="float32", always_2d=True)
    return pcm.mean(axis=1).astype(np.float32)


def decode_video_frames(data: bytes) -> list | None:
    """Container bytes → list of (h, w, 3) uint8 RGB frames via PyAV,
    or None when the binding is absent (caller raises its seam
    error). Decodes ALL frames — callers that slot-sample should seek
    instead when they adopt this path for long videos."""
    av = pyav()
    if av is None:
        return None
    frames = []
    with av.open(io.BytesIO(data)) as container:
        for frame in container.decode(video=0):
            frames.append(frame.to_ndarray(format="rgb24"))
    return frames
