"""Signature stage: per-row derived features, computed in one
`map_batches(batch_format="pyarrow")` pass over the corpus.

Emits (per row):
  sha1        str     exact-dup key over the encoded payload (H1 analog,
                      /root/reference/src/hash_phase.c:8-38)
  thumb       binary  16×16 gray thumbnail — the compact verify signature;
                      full payloads never enter a shuffle (SURVEY.md §7.4.4)
  cap_sig     list<u64 as int64>  MinHash signature of caption char-shingles
              (the caption itself is dropped — only signatures flow on)
  cdc_feats   list<u64 as int64>  sampled FastCDC chunk fingerprints of the
                      encoded bytes (F1 min-sampling semantics,
                      sampling_method.c:12-75) — the destor-parity channel
  phash       passthrough input column

This is a stateless task stage: pure numpy/pyarrow kernels, no actor
state needed (tables are precomputed module-level constants).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codec
from ..config import EngineConfig
from ..functions import chunking, hashing, minhash, sampling, suffixes


def _caption_shingle_flat(captions: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated char-shingle hashes + offsets for a caption column."""
    parts = [hashing.char_shingles_u64(c or "", k) for c in captions]
    offsets = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in parts], out=offsets[1:])
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    return flat, offsets


def binary_column_views(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy access to a (Large)Binary column: (data, offsets) numpy
    views over the Arrow buffers. Row i's payload is
    data[offsets[i]:offsets[i+1]] — a view, never a Python bytes copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[col.offset: col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data, offsets.astype(np.int64)


def compute_signatures(batch: pa.Table, cfg: EngineConfig | None = None) -> pa.Table:
    cfg = cfg or EngineConfig()
    data, offs = binary_column_views(batch["bytes"])
    n = batch.num_rows
    payloads = [data[offs[i]:offs[i + 1]] for i in range(n)]  # numpy views
    captions = batch["caption"].to_pylist()

    sha1 = hashing.sha1_hex_batch(payloads)

    if cfg.simulation:
        # simulation mode: no decode — the "thumb" is the 8-byte phash so
        # the verify stage can fall back to Hamming distance
        ph = np.asarray(batch["phash"].to_numpy(zero_copy_only=False), dtype=np.int64)
        thumbs = [int(v).to_bytes(8, "big", signed=True) for v in ph]
    else:
        thumbs = []
        for p in payloads:
            thumbs.append(codec.thumbnail(codec.decode(p), cfg.verify.thumb_size))

    flat, offsets = _caption_shingle_flat(captions, cfg.lsh.shingle_k)
    cap_sig = minhash.minhash_signatures_flat(flat, offsets, cfg.lsh.num_perms, cfg.seed)

    cdc_feats: list[np.ndarray] = []
    if cfg.use_byte_cdc_channel and not cfg.simulation:
        params = chunking.ChunkParams(cfg.chunking.min_size, cfg.chunking.avg_size,
                                      cfg.chunking.max_size)
        fps_list = chunking.chunk_hashes_multi(payloads, cfg.chunking.algorithm, params)
        for fps in fps_list:
            cdc_feats.append(sampling.sample_features(
                fps, cfg.sampling.method, cfg.sampling.ratio).view(np.int64))
    else:
        cdc_feats = [np.empty(0, dtype=np.int64)] * n

    # suffix-array substring channel: caption winnowing fingerprints
    # (functions/suffixes.py) — shared >= gram+window-1 char substrings
    # guarantee a shared fingerprint value
    if cfg.use_substring_channel:
        sub_fps = [suffixes.winnow_fingerprints(
            c or "", cfg.lsh.substring_gram, cfg.lsh.substring_window).view(np.int64)
            for c in captions]
    else:
        sub_fps = [np.empty(0, dtype=np.int64)] * n

    out = pa.table({
        "image_id": batch["image_id"],
        "phash": batch["phash"],
        "nbytes": pa.array(np.diff(offs), pa.int64()),
        "sha1": pa.array(sha1, pa.string()),
        "thumb": pa.array(thumbs, pa.binary()),
        "cap_sig": pa.array([s.view(np.int64) for s in cap_sig], pa.list_(pa.int64())),
        "cdc_feats": pa.array(list(cdc_feats), pa.list_(pa.int64())),
        "sub_fps": pa.array(list(sub_fps), pa.list_(pa.int64())),
    })
    return out


class SignatureStage:
    """Callable-class wrapper so the stage can run as an actor pool when
    configured (state: the config; tables are module-level caches)."""

    def __init__(self, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig()
        # warm the per-process kernel tables once (actor __init__, not per batch)
        chunking._gear_table()
        chunking._rabin_lag_tables()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return compute_signatures(batch, self.cfg)
