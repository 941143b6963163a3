"""Segmenting methods — ports of the reference's three stream→segment
policies (/root/reference/src/index/segmenting_method.c, SURVEY.md
§2.3). A segment is the unit of similarity lookup / index batching.

Our streams have no in-band signal chunks; a "stream" is a uint64
fingerprint array and segments are returned as end-offset arrays (like
the chunkers). File-defined segmenting maps to per-row grouping and is
the natural unit in the image engine (one row = one file); these
kernels exist for config parity and for byte-stream workloads.
"""

from __future__ import annotations

import numpy as np


def segment_fixed(fps: np.ndarray, segment_size: int) -> np.ndarray:
    """SiLo/BLC fixed segmenting (segmenting_method.c:12-39): boundary
    every `segment_size` chunks."""
    n = len(fps)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    return np.append(np.arange(segment_size, n, segment_size, dtype=np.int64), n)


def segment_content_defined(fps: np.ndarray, divisor: int,
                            min_chunks: int = 128,
                            max_chunks: int = 10240) -> np.ndarray:
    """Sparse-Index content-defined segmenting
    (segmenting_method.c:73-114): a chunk whose fingerprint low-int32 ≡ 0
    (mod divisor) is a *landmark* that CLOSES the current segment and
    OPENS a new one containing itself; segments respect min/max chunk
    counts. Returns end offsets."""
    n = len(fps)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    low32 = (np.asarray(fps, dtype=np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.int64)
    is_landmark = (low32 % divisor) == 0
    cuts = []
    count = 0  # chunks in current segment
    for i in range(n):
        if count < min_chunks:
            count += 1
            continue
        if is_landmark[i]:
            cuts.append(i)      # segment ends BEFORE the landmark
            count = 1           # landmark starts the new segment
            continue
        count += 1
        if count >= max_chunks:
            cuts.append(i + 1)  # segment ends AFTER this chunk
            count = 0
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return np.asarray(cuts, dtype=np.int64)


def segment_file_defined(row_lengths: np.ndarray) -> np.ndarray:
    """Extreme-Binning file-defined segmenting (segmenting_method.c:44-68):
    segment = one file; given per-row chunk counts, returns end offsets
    into the concatenated chunk stream."""
    return np.cumsum(np.asarray(row_lengths, dtype=np.int64))


SEGMENTERS = {
    "fixed": segment_fixed,
    "content_defined": segment_content_defined,
    "file_defined": segment_file_defined,
}
