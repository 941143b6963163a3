"""Deterministic synthetic image+caption corpus with a planted dup plan.

Schema per BASELINE.json.input_hint:
  (image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
   caption: string, phash: int64)

Every row is a pure function of (seed, row_index) — generated via a
counter-based Philox stream — so partitions regenerate identically under
Ray task retries (SURVEY.md §7.4.6) and any scale can be produced
without materializing the whole corpus anywhere.

Dup plan (FIXTURES.md F2): rows are laid out in blocks of 20. Slot 0 of
each block is an original; designated slots derive from a source row:

  slot  3 → distractor_near_miss (heavy noise — must NOT cluster)
  slot  5 → resize (2× box-downscaled re-upload, re-encoded — the most
            common web near-dup: same picture, smaller file)
  slot  7 → exact duplicate (byte-identical image, same caption)
  slot 11 → re-encode (same pixels, different lossy quality → new bytes)
  slot 15 → crop (≤2% border crop, re-encoded)
  slot 19 → caption paraphrase (same image, token-swapped caption)

Every HOT_EVERY-th block sources from row 0 instead of its own slot 0,
creating a hot cluster that stresses LSH band skew handling.

Ground-truth cluster id = source row index for dup slots, own index
otherwise.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from . import codec

BLOCK = 20
DUP_SLOTS = {3: "distractor_near_miss", 5: "resize", 7: "exact",
             11: "reencode", 15: "crop", 19: "caption_para"}
HOT_EVERY = 100  # every 100th block sources from row 0 (hot cluster)

_SIZES = (32, 64, 128)
_FMTS = ("png", "jpeg")

_VOCAB = (
    "sunset harbor mountain forest river bridge market temple garden tower "
    "street beach cliff desert meadow valley lake island castle lighthouse "
    "red golden misty quiet ancient busy serene rugged narrow wide frozen "
    "colorful crowded empty peaceful stormy autumn winter summer spring "
    "morning evening night afternoon dawn dusk fog rain snow wind light "
    "boat train bicycle horse bird dog cat crowd festival parade fisherman "
    "farmer artist child traveler vendor musician dancer painter sailor "
    "overlooking beside beneath beyond across within near along around "
    "photo view scene landscape panorama closeup portrait snapshot study"
).split()

_SYNONYM = {w: _VOCAB[(i + 7) % len(_VOCAB)] for i, w in enumerate(_VOCAB)}


def _downscale2x(pixels: np.ndarray) -> np.ndarray:
    """Exact-integer 2×2 box-mean downscale (round-half-up) — the
    deterministic resize a re-uploading site applies; odd tail
    rows/cols are dropped."""
    p = pixels[: pixels.shape[0] // 2 * 2, : pixels.shape[1] // 2 * 2]
    s = (p[0::2, 0::2].astype(np.uint16) + p[0::2, 1::2]
         + p[1::2, 0::2] + p[1::2, 1::2])
    return ((s + 2) // 4).astype(np.uint8)


def _rng(seed: int, row: int, stream: int = 0) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=(seed << 16) ^ stream, counter=row))


def _base_pixels(seed: int, row: int) -> tuple[np.ndarray, int, int, str, int]:
    """Procedural pixels for an original row: smooth gradient + low-freq
    blobs (smooth content keeps thumbnails stable under crop/re-encode)."""
    rng = _rng(seed, row, stream=1)
    w = int(_SIZES[rng.integers(len(_SIZES))])
    h = int(_SIZES[rng.integers(len(_SIZES))])
    fmt = _FMTS[int(rng.integers(len(_FMTS)))]
    quality = int(rng.integers(80, 98))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), dtype=np.float32)
    for c in range(3):
        a, b, cphase = rng.uniform(0, 2 * np.pi, 3)
        fx, fy = rng.uniform(0.5, 2.5, 2)
        img[..., c] = (
            127 + 60 * np.sin(2 * np.pi * fx * xx / w + a)
            + 50 * np.cos(2 * np.pi * fy * yy / h + b)
            + 15 * np.sin(2 * np.pi * (xx + yy) / (w + h) + cphase)
        )
    # a few soft blobs
    for _ in range(int(rng.integers(2, 6))):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        r = rng.uniform(4, max(5, w // 4))
        amp = rng.uniform(-60, 60, 3).astype(np.float32)
        mask = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r))).astype(np.float32)
        img += mask[..., None] * amp[None, None, :]
    return np.clip(img, 0, 255).astype(np.uint8), w, h, fmt, quality


def _base_caption(seed: int, row: int) -> str:
    rng = _rng(seed, row, stream=2)
    n = int(rng.integers(6, 24))
    return " ".join(_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n))


def _paraphrase(caption: str, seed: int, row: int) -> str:
    rng = _rng(seed, row, stream=3)
    toks = caption.split()
    n_swap = max(1, len(toks) // 8)
    for idx in rng.choice(len(toks), size=min(n_swap, len(toks)), replace=False):
        toks[idx] = _SYNONYM.get(toks[idx], toks[idx])
    return " ".join(toks)


def plan_for_row(i: int) -> tuple[str, int]:
    """(kind, source_row) — kind 'original' means no source."""
    slot = i % BLOCK
    kind = DUP_SLOTS.get(slot)
    if kind is None:
        return "original", i
    block = i // BLOCK
    src = 0 if (block % HOT_EVERY == HOT_EVERY - 1 and block > 0) else block * BLOCK
    return kind, src


def truth_cluster(i: int) -> int:
    """Ground-truth cluster id (distractors are singletons)."""
    kind, src = plan_for_row(i)
    if kind in ("original", "distractor_near_miss"):
        return i
    return src


def source_pixels(seed: int, i: int) -> tuple[np.ndarray, str, str]:
    """Row i's PRE-ENCODE pixels, fmt and caption — the fidelity oracle
    (restore-as-oracle, SURVEY.md §5.1.4). Replays the pixel branch of
    generate_row without encoding, so a decode-verify stage can check the
    decoded payload against the true source (PSNR >= 40 for lossy)."""
    kind, src = plan_for_row(i)
    if kind == "original":
        pixels, w, h, fmt, _ = _base_pixels(seed, i)
        caption = _base_caption(seed, i)
    else:
        pixels, w, h, fmt, _ = _base_pixels(seed, src)
        caption = _base_caption(seed, src)
        if kind == "reencode":
            fmt = "jpeg"
        elif kind == "resize":
            pixels = _downscale2x(pixels)
            fmt = "jpeg"
        elif kind == "crop":
            cw = max(1, w // 64)
            chh = max(1, h // 64)
            pixels = pixels[chh:h - chh, cw:w - cw]
            fmt = "jpeg"
        elif kind == "caption_para":
            caption = _paraphrase(caption, seed, i)
        elif kind == "distractor_near_miss":
            rng = _rng(seed, i, stream=4)
            noise = rng.normal(0, 40, pixels.shape)
            pixels = np.clip(pixels.astype(np.float32) + noise, 0, 255).astype(np.uint8)
            caption = _base_caption(seed, i)
    return pixels, fmt, caption


def generate_row(seed: int, i: int) -> dict:
    """Materialize row i: returns dict with the corpus schema fields."""
    kind, src = plan_for_row(i)
    if kind == "original":
        pixels, w, h, fmt, quality = _base_pixels(seed, i)
        caption = _base_caption(seed, i)
    else:
        pixels, w, h, fmt, quality = _base_pixels(seed, src)
        caption = _base_caption(seed, src)
        if kind == "exact":
            pass
        elif kind == "reencode":
            fmt, quality = "jpeg", 92 if quality < 90 else 84
        elif kind == "resize":
            pixels = _downscale2x(pixels)
            h, w = pixels.shape[:2]
            fmt, quality = "jpeg", 90
        elif kind == "crop":
            cw = max(1, w // 64)
            chh = max(1, h // 64)
            pixels = pixels[chh:h - chh, cw:w - cw]
            h, w = pixels.shape[:2]
            fmt, quality = "jpeg", 90
        elif kind == "caption_para":
            caption = _paraphrase(caption, seed, i)
        elif kind == "distractor_near_miss":
            rng = _rng(seed, i, stream=4)
            noise = rng.normal(0, 40, pixels.shape)
            pixels = np.clip(pixels.astype(np.float32) + noise, 0, 255).astype(np.uint8)
            caption = _base_caption(seed, i)
    data = codec.encode(pixels, fmt, quality)
    decoded = codec.decode(data)  # phash over *decoded* pixels (post-lossy)
    return {
        "image_id": f"img{i:010d}",
        "bytes": data,
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": caption,
        "phash": np.int64(codec.phash64(decoded)),
    }


CORPUS_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])


def generate_batch(seed: int, rows: np.ndarray) -> pa.Table:
    recs = [generate_row(seed, int(i)) for i in rows]
    return pa.Table.from_pylist(recs, schema=CORPUS_SCHEMA)


def dup_plan_table(n_rows: int) -> pa.Table:
    """Planted ground truth (FIXTURES.md F2) for rows [0, n_rows)."""
    lefts, rights, kinds, clusters = [], [], [], []
    for i in range(n_rows):
        kind, src = plan_for_row(i)
        if kind != "original" and src < n_rows:
            lefts.append(f"img{src:010d}")
            rights.append(f"img{i:010d}")
            kinds.append(kind)
            clusters.append(truth_cluster(i))
    return pa.table({
        "left_id": pa.array(lefts, pa.string()),
        "right_id": pa.array(rights, pa.string()),
        "kind": pa.array(kinds, pa.string()),
        "cluster_id": pa.array(clusters, pa.int64()),
    })


def row_index_of(image_id: str) -> int:
    return int(image_id[3:])


# ---------------------------------------------------------------------------
# Materialization (Ray Data when available, local pyarrow for tiny corpora)
# ---------------------------------------------------------------------------

CORPUS_VERSION = 5  # bump when codec/generator bytes or layout change (busts /tmp cache)
# v4: fmt="png" rows are REAL PNG files (codec.png_encode)


def corpus_dir(n_rows: int, seed: int = 42, root: str = "/tmp/destor_ray_corpus") -> str:
    return os.path.join(root, f"v{CORPUS_VERSION}_n{n_rows}_seed{seed}")


def ensure_corpus_parquet(n_rows: int, seed: int = 42,
                          root: str = "/tmp/destor_ray_corpus",
                          rows_per_file: int = 1000) -> str:
    # rows_per_file sets read parallelism: Ray fuses read_parquet with the
    # downstream map_batches, so file count must comfortably exceed the
    # worker count (SURVEY.md §4.1 partition-count guidance)
    """Generate (once) the corpus as partitioned parquet; returns the dir.

    Uses Ray Data when a session is live so generation parallelizes and
    streams; falls back to a local loop for tiny corpora. Each file is a
    contiguous row range → resumable, deterministic layout.
    """
    out = corpus_dir(n_rows, seed, root)
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    import pyarrow.parquet as pq

    import ray

    def write_shard(start: int) -> str:
        stop = min(start + rows_per_file, n_rows)
        path = os.path.join(out, f"part-{start:012d}.parquet")
        if not os.path.exists(path):
            tbl = generate_batch(seed, np.arange(start, stop))
            tmp = path + ".tmp"
            pq.write_table(tbl, tmp)
            os.rename(tmp, path)
        return path

    starts = list(range(0, n_rows, rows_per_file))
    if ray.is_initialized() and len(starts) > 1:
        fn = ray.remote(write_shard)
        ray.get([fn.remote(s) for s in starts])
    else:
        for s in starts:
            write_shard(s)
    with open(done, "w") as f:
        f.write(f"{n_rows}\n")
    return out
