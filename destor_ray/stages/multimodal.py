"""Multimodal column stages: image / audio / video payloads as opaque
binary columns with typed metadata, processed by actor-pool map_batches
stages.

The image path is REAL (PNG via codec.png_decode, lossy via the
deterministic DRI1 codec). The audio path is REAL for RIFF/WAVE PCM
payloads (codec.wav_decode — pure numpy, no libsndfile) and for FLAC
(destor_ray.flac — round-5 pure-numpy decoder, CRC-verified);
remaining compressed audio (mp3/ogg) and all video stay STUBS with a
clearly-marked seam:
`decoder="fake"` produces deterministic synthetic samples/frames
(hash-seeded) so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is exercised end-to-end; the real-decoder
path raises NotImplementedError where libsndfile/ffmpeg would be
called.

All stages are callable classes (actor pools): heavy setup belongs in
__init__, per-batch work in __call__, small batch_size because rows
carry payloads (SURVEY.md §7.4.4 wide rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codec
from ..functions.hashing import mix_u64


def _payload_seed(data: bytes, salt: int = 0) -> int:
    import hashlib
    h = hashlib.blake2b(data, digest_size=8).digest()
    return int(mix_u64(np.uint64(int.from_bytes(h, "big")), salt))


class ImageDecodeResize:
    """Decode DRI1 payloads and emit fixed-size gray thumbnails +
    dimensions. Real implementation (no stub)."""

    def __init__(self, out_size: int = 32):
        self.out_size = out_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs, ws, hs = [], [], []
        for data in batch["bytes"].to_pylist():
            px = codec.decode(data)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            thumbs.append(codec.to_gray(
                codec.resize_nn(px, self.out_size, self.out_size)).tobytes())
        return pa.table({
            "image_id": batch["image_id"],
            "thumb": pa.array(thumbs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
        })


class AudioFeatures:
    """Audio decode + frame-level feature extraction.

    Schema in:  (clip_id: string, bytes: binary, sample_rate: int32)
    Schema out: (clip_id, n_samples: int64, rms: float64,
                 mfcc_like: list<float> fixed 13)

    decoder="real": REAL RIFF/WAVE PCM parsing (codec.wav_decode — pure
    numpy, 8/16/32-bit + float, multi-channel downmix; no libsndfile
    needed); non-WAV payloads (mp3/flac/ogg) still raise at the
    libsndfile seam. decoder="fake": deterministic synthetic PCM derived
    from the payload hash — exercises batching/actor plumbing without
    any payload format assumption.
    """

    def __init__(self, decoder: str = "real", frame: int = 1024):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.frame = frame

    def _decode(self, data: bytes, sr: int) -> np.ndarray:
        if self.decoder == "real":
            if len(data) >= 12 and bytes(data[:4]) == b"RIFF":
                pcm, _ = codec.wav_decode(data)
                return pcm
            if len(data) >= 4 and bytes(data[:4]) == b"fLaC":
                from .. import flac  # pure-numpy decoder (round 5)
                pcm, _ = flac.decode_float_mono(bytes(data))
                return pcm
            from .. import softcodecs
            pcm = softcodecs.decode_audio(bytes(data))
            if pcm is not None:          # libsndfile present: mp3/ogg
                return pcm
            raise NotImplementedError(
                "non-WAV/FLAC audio payload and no libsndfile binding "
                "(pip install soundfile to enable)")
        # deterministic fake: 1 second of hash-seeded samples
        rng = np.random.Generator(np.random.Philox(key=_payload_seed(data)))
        return rng.standard_normal(sr).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_samples, rms, feats = [], [], []
        srs = batch["sample_rate"].to_pylist() if "sample_rate" in batch.column_names \
            else [16000] * batch.num_rows
        for data, sr in zip(batch["bytes"].to_pylist(), srs):
            pcm = self._decode(data, int(sr))
            n_samples.append(len(pcm))
            rms.append(float(np.sqrt(np.mean(pcm * pcm))))
            # 13 band-energy features over a naive filterbank (stand-in for
            # MFCC; deterministic, vectorized)
            spec = np.abs(np.fft.rfft(pcm[: self.frame]))
            bands = np.array_split(spec, 13)
            feats.append([float(np.log1p(b.mean())) for b in bands])
        return pa.table({
            "clip_id": batch["clip_id"],
            "n_samples": pa.array(n_samples, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
            "mfcc_like": pa.array(feats, pa.list_(pa.float64())),
        })


class VideoFrameSample:
    """Frame sampling for video payloads.

    Schema in:  (video_id: string, bytes: binary[, n_frames: int32])
    Schema out: (video_id, frame_idx: int32, frame_thumb: binary)
    Emits `samples_per_video` rows per input row (a flat_map-shaped
    map_batches).

    decoder="mjpeg-avi": REAL — the payload is a Motion-JPEG AVI
    (destor_ray.avi container walk + per-frame DC-luma JPEG decode:
    the scale_denom=8 thumbnail trick, no IDCT, so sampling k frames
    of an N-frame video never entropy-decodes the other N−k);
    decoder="fake": frames are deterministic hash-seeded images
    (plumbing tests at any scale without payloads);
    decoder="real" raises at the ffmpeg seam (H.264 etc. — MJPEG has
    no inter-frame state, which is why it is implementable here).
    """

    def __init__(self, decoder: str = "fake", samples_per_video: int = 3,
                 thumb: int = 16):
        self.decoder = decoder
        self.k = samples_per_video
        self.thumb = thumb

    def _frame(self, data: bytes, idx: int) -> np.ndarray:
        if self.decoder == "real":
            from .. import softcodecs
            frames = softcodecs.decode_video_frames(bytes(data))
            if frames is not None:       # PyAV present: H.264 etc.
                return frames[min(idx, len(frames) - 1)]
            raise NotImplementedError(
                "inter-frame video needs an ffmpeg binding "
                "(pip install av to enable); MJPEG-AVI payloads decode "
                "natively via decoder='mjpeg-avi'")
        rng = np.random.Generator(np.random.Philox(key=_payload_seed(data, idx)))
        return rng.integers(0, 256, (self.thumb, self.thumb, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import avi, jpeg

        vids, idxs, thumbs = [], [], []
        if "n_frames" in batch.column_names:
            nframes = batch["n_frames"].to_pylist()
        else:
            nframes = [0] * batch.num_rows
        for vid, data, nf in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist(), nframes):
            if self.decoder == "mjpeg-avi":
                frames = avi.decode_frames(data)
                nf = len(frames)
                k = min(self.k, nf)
                for j in range(k):
                    fi = (j * nf) // k
                    dc = jpeg.decode_dc_luma(frames[fi])
                    vids.append(vid)
                    idxs.append(fi)
                    thumbs.append(codec.resize_nn(
                        dc, self.thumb, self.thumb).tobytes())
                continue
            nf = max(1, int(nf))
            for j in range(min(self.k, nf)):
                fi = (j * nf) // min(self.k, nf)
                vids.append(vid)
                idxs.append(fi)
                thumbs.append(codec.to_gray(self._frame(data, fi)).tobytes())
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_thumb": pa.array(thumbs, pa.binary()),
        })


def audio_features(ds, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def video_frame_samples(ds, concurrency: int = 2, batch_size: int = 32):
    return ds.map_batches(VideoFrameSample, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


class ImageDecodeQuarantine:
    """Decode with per-row error quarantine (the dead-letter-queue
    discipline): corrupt payloads NEVER fail the job — each row decodes
    under a per-row guard and emits either its features (status='ok')
    or a quarantine row carrying the error class (status='corrupt'),
    so a 10^12-row ingest survives the real corpus's inevitable
    truncated/garbage files and the quarantine slice is queryable
    afterwards. Schema out: (image_id, status, err, w, h)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, status, err, ws, hs = [], [], [], [], []
        for img_id, data in zip(batch["image_id"].to_pylist(),
                                batch["bytes"].to_pylist()):
            ids.append(img_id)
            try:
                px = codec.decode(data)
                status.append("ok")
                err.append("")
                hs.append(px.shape[0])
                ws.append(px.shape[1])
            except Exception as e:  # noqa: BLE001 — the quarantine seam
                status.append("corrupt")
                err.append(type(e).__name__)
                hs.append(0)
                ws.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "status": pa.array(status, pa.string()),
            "err": pa.array(err, pa.string()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
        })


class AudioDecodeQuarantine:
    """The audio twin of ImageDecodeQuarantine (round 5): each clip
    decodes under a per-row guard through the same dispatch the
    feature stage uses (RIFF -> numpy WAV parser, fLaC -> the
    CRC-verified pure-numpy FLAC decoder, else the libsndfile seam)
    and emits (clip_id, status, err, n_samples) — truncated FLAC
    (CRC-16 mismatch), garbage bytes, and seam-stubbed containers all
    become queryable quarantine rows, never job failures."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import codec as _codec
        from .. import flac as _flac
        ids, status, err, ns = [], [], [], []
        for cid, data in zip(batch["clip_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            ids.append(cid)
            try:
                if len(data) >= 4 and bytes(data[:4]) == b"fLaC":
                    pcm, _sr = _flac.decode_float_mono(bytes(data))
                elif len(data) >= 12 and bytes(data[:4]) == b"RIFF":
                    pcm, _sr = _codec.wav_decode(data)
                else:
                    from .. import softcodecs
                    pcm = softcodecs.decode_audio(bytes(data))
                    if pcm is None:
                        raise NotImplementedError(
                            "unsupported audio container (seam)")
                status.append("ok")
                err.append("")
                ns.append(len(pcm))
            except Exception as e:  # noqa: BLE001 — the quarantine seam
                status.append("corrupt")
                err.append(type(e).__name__)
                ns.append(0)
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "status": pa.array(status, pa.string()),
            "err": pa.array(err, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
        })


class ImagePixelStats:
    """Decode → per-image pixel-quality features: luma mean/std,
    256-bin histogram entropy (bits), and Laplacian variance (the
    classic blur/flatness detector — variance of the 4-neighbour
    Laplacian response; low values flag blurry or near-constant
    frames). The curation signals an image-corpus quality filter
    ranks on before training (reference's fidelity concern T5,
    decode_thread.c, recast as quality scoring instead of verify).

    Actor-pool stage: nothing heavy to set up here, but kept as a
    callable class for uniformity with the other decode stages (a real
    libjpeg/PIL build would hold codec handles in __init__). Per-image
    kernels are whole-array numpy (histogram via bincount, Laplacian
    via shifted-slice adds — no Python per-pixel work)."""

    def __init__(self, min_side: int = 3):
        self.min_side = min_side

    @staticmethod
    def _features(gray: np.ndarray) -> tuple[float, float, float, float]:
        g = gray.astype(np.float64)
        mean = float(g.mean())
        std = float(g.std())
        hist = np.bincount(gray.reshape(-1), minlength=256)
        p = hist[hist > 0] / gray.size
        entropy = float(-(p * np.log2(p)).sum())
        if gray.shape[0] >= 3 and gray.shape[1] >= 3:
            lap = (g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2]
                   + g[1:-1, 2:] - 4.0 * g[1:-1, 1:-1])
            lap_var = float(lap.var())
        else:
            lap_var = 0.0
        return mean, std, entropy, lap_var

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds, ents, laps = [], [], [], []
        for data in batch["bytes"].to_pylist():
            gray = codec.to_gray(codec.decode(data))
            m, s, e, lv = self._features(gray)
            means.append(m)
            stds.append(s)
            ents.append(e)
            laps.append(lv)
        return pa.table({
            "image_id": batch["image_id"],
            "luma_mean": pa.array(means, pa.float64()),
            "luma_std": pa.array(stds, pa.float64()),
            "entropy_bits": pa.array(ents, pa.float64()),
            "laplacian_var": pa.array(laps, pa.float64()),
        })


_AUG_KINDS = ("flip_h", "flip_v", "rot90")


def _apply_aug(px: np.ndarray, kind: str) -> np.ndarray:
    if kind == "flip_h":
        return px[:, ::-1]
    if kind == "flip_v":
        return px[::-1, :]
    if kind == "rot90":
        return np.rot90(px)
    raise ValueError(kind)


class ImageAugment:
    """Deterministic per-epoch image augmentation: each image gets ONE
    transform chosen by hash(image_id, epoch) — the standard seeded
    augmentation policy a training job applies on the fly (flip /
    rotate here; the color-jitter family would slot in the same seam).
    Determinism matters for the engine contract: a retried task must
    produce the identical augmented batch (the same no-RNG rule the
    fault-injection test pins for signatures).

    Emits the augmented image's phash + the Hamming distance to the
    source phash rather than re-encoded payloads — the stat that tells
    a dedup pipeline how robust its perceptual channel is to the
    augmentations its own training stack applies (flips/rotations
    permute the DCT basis, so phash distance is LARGE: augmented
    copies will NOT collide in phash bands — measured, not assumed)."""

    def __init__(self, epoch: int = 0):
        self.epoch = epoch

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import codec
        kinds, hams = [], []
        for iid, data in zip(batch["image_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            k = _AUG_KINDS[_payload_seed(
                f"{iid}|{self.epoch}".encode(), 0xA9) % len(_AUG_KINDS)]
            px = codec.decode(data)
            aug = _apply_aug(px, k)
            p0 = codec.phash64(px)
            p1 = codec.phash64(np.ascontiguousarray(aug))
            kinds.append(k)
            hams.append(int(codec.hamming64(
                np.array([p0], np.int64), np.array([p1], np.int64))[0]))
        return pa.table({
            "image_id": batch["image_id"],
            "aug": pa.array(kinds, pa.string()),
            "phash_hamming": pa.array(hams, pa.int64()),
        })


class ImageTileForensics:
    """Per-image COPY-MOVE detection: hash every 8×8 gray tile (exact
    bytes) and count tiles that repeat WITHIN the image — the simplest
    member of the copy-move forgery/synthetic-content screen family
    (repeated regions flag cloned patches, tiled upscales, and
    procedural fills). Per-image work is one reshape + one np.unique
    over tile rows — no Python per-pixel loops. Flat images trivially
    repeat; the companion column n_distinct_tiles disambiguates
    (forged: high distinct AND high repeats; flat: low distinct)."""

    def __init__(self, tile: int = 8):
        self.tile = tile

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import codec
        t = self.tile
        n_tiles, n_dist, n_rep = [], [], []
        for data in batch["bytes"].to_pylist():
            g = codec.to_gray(codec.decode(data))
            th, tw = g.shape[0] // t, g.shape[1] // t
            if th == 0 or tw == 0:
                n_tiles.append(0)
                n_dist.append(0)
                n_rep.append(0)
                continue
            tiles = g[:th * t, :tw * t].reshape(th, t, tw, t) \
                .transpose(0, 2, 1, 3).reshape(th * tw, t * t)
            # exact-byte tile identity via a void view (one row = one key)
            keys = np.ascontiguousarray(tiles).view(
                np.dtype((np.void, t * t))).ravel()
            _, counts = np.unique(keys, return_counts=True)
            n_tiles.append(th * tw)
            n_dist.append(len(counts))
            n_rep.append(int(counts[counts > 1].sum()))
        return pa.table({
            "image_id": batch["image_id"],
            "n_tiles": pa.array(n_tiles, pa.int64()),
            "n_distinct_tiles": pa.array(n_dist, pa.int64()),
            "n_repeated_tiles": pa.array(n_rep, pa.int64()),
        })


class JpegTranscoder:
    """Decode → re-encode as REAL baseline JFIF JPEG → decode → PSNR
    vs the source pixels: the storage-transcode advisor stage (would
    converting this corpus to JPEG at quality q save bytes, and at
    what fidelity cost?). Composes the production codec seams
    end-to-end: codec.decode dispatches DRI1 / PNG / JFIF payloads,
    destor_ray.jpeg provides the T.81 encoder+decoder.

    Actor-pool stage: the Annex K quantization/Huffman tables and the
    zigzag/DCT constants live in module state loaded once per actor
    (__init__ warms them by a 16×16 round trip, which also pays
    numpy's first-call uint64 fault cost); __call__ is per-batch.
    The entropy-coding inner loop is the pure-Python price of a real
    bitstream — a production deploy swaps libjpeg-turbo behind the
    same seam (NOTES.md), which is why callers hash-SAMPLE the corpus
    (1/mod rows) rather than transcoding every row locally."""

    def __init__(self, quality: int = 85):
        from .. import jpeg
        self.jpeg = jpeg
        self.quality = quality
        probe = np.full((16, 16, 3), 128, np.uint8)
        jpeg.decode(jpeg.encode(probe, quality=quality))

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["bytes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fmts, n_in, n_out, psnr_c = [], [], [], []
        for i in range(len(col)):
            data = col[i].as_py()
            src = codec.decode(data)
            enc = self.jpeg.encode(src, quality=self.quality)
            rec = self.jpeg.decode(enc)
            p = codec.psnr(src, rec)
            fmts.append(batch["fmt"][i].as_py())
            n_in.append(len(data))
            n_out.append(len(enc))
            psnr_c.append(int(round(min(p, 99.99) * 100)))
        return pa.table({
            "fmt": pa.array(fmts, pa.string()),
            "bytes_in": pa.array(n_in, pa.int64()),
            "bytes_out": pa.array(n_out, pa.int64()),
            "psnr_centi": pa.array(psnr_c, pa.int64()),
        })
