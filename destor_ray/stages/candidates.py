"""Candidate generation + verification — the LSH shuffle at the heart of
the engine (SURVEY.md §2.5 D3/D4: the feature kv-store probe becomes a
`groupby(band_key)` exchange; verification replaces "prefetch & probe").

Flow:
  signatures ──flat_map──► (band_key, nid, thumb) band rows
             ──bucketed groupby(band_key)──► verified edges
                (left_id, right_id, psnr)   [int64 node ids]

Node ids are int64 row indices (parsed once from image_id) — band rows
and everything downstream (edges, connected components) shuffle compact
ints, never strings or payloads.

Within a band group of size g:
  * g <= full_pair_cap: all g(g-1)/2 pairs are verified (small groups are
    the common case; exhaustive keeps recall high),
  * else: star-to-min + adjacent chain (2(g-1) pairs) — hot/degenerate
    bands stay linear, never quadratic (explicit skew handling per
    BASELINE.json.north_rule). Nothing is dropped; connectivity is
    preserved through edge redundancy across bands/channels.

Verification = thumbnail PSNR >= cfg.verify.psnr_threshold, vectorized
over the bucket's full pair list. Thumbnails (8×8 gray, 64 B) ride in
the band rows so no second join is needed and full payloads never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig
from ..functions import minhash
from ..functions.hashing import mix_u64

CH_CAPTION = 1
CH_PHASH = 2
CH_CDC = 3
CH_SHA1 = 4
CH_SUB = 5   # caption winnowing substring fingerprints (suffixes.py)

_EMPTY64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def parse_nid(image_ids) -> np.ndarray:
    """image_id 'img%010d' → int64 row index, vectorized."""
    return pd.Series(image_ids, dtype="object").str[3:].astype(np.int64).to_numpy()


def format_nid(nids: np.ndarray) -> pa.Array:
    return pa.array([f"img{int(i):010d}" for i in nids], pa.string())


def _empty_bands() -> pa.Table:
    return pa.table({"band_key": pa.array([], pa.int64()),
                     "nid": pa.array([], pa.int64()),
                     "phash": pa.array([], pa.int64()),
                     "thumb": pa.array([], pa.binary())})


def explode_bands(batch: pa.Table, cfg: EngineConfig | None = None) -> pa.Table:
    """Signature rows → band rows. Band keys are salted per channel so
    channels never collide in the shuffle."""
    cfg = cfg or EngineConfig()
    n = batch.num_rows
    if n == 0:
        return _empty_bands()
    nids = parse_nid(batch["image_id"].to_pylist())
    thumbs = batch["thumb"].to_pylist()

    out_key: list[np.ndarray] = []
    out_idx: list[np.ndarray] = []

    # caption MinHash bands (skip empty-caption sentinel signatures)
    sig = np.asarray(
        [np.asarray(s, dtype=np.int64) for s in batch["cap_sig"].to_pylist()],
        dtype=np.int64,
    ).view(np.uint64)
    if sig.size:
        keys = minhash.band_keys(sig, cfg.lsh.num_bands, cfg.lsh.rows_per_band, cfg.seed)
        nonempty = sig[:, 0] != _EMPTY64
        for b in range(cfg.lsh.num_bands):
            out_key.append(mix_u64(keys[nonempty, b], CH_CAPTION))
            out_idx.append(np.flatnonzero(nonempty))

    # phash Hamming bands
    phash = np.asarray(batch["phash"].to_numpy(zero_copy_only=False), dtype=np.int64)
    pkeys = minhash.hamming_band_keys(phash, cfg.lsh.phash_bands, cfg.seed)
    all_idx = np.arange(n)
    for b in range(cfg.lsh.phash_bands):
        out_key.append(mix_u64(pkeys[:, b], CH_PHASH))
        out_idx.append(all_idx)

    # CDC feature channel: each sampled chunk fingerprint is a key
    # (destor's feature→unit kv-store, kvstore_htable.c:158-207)
    if cfg.use_byte_cdc_channel:
        feats = batch["cdc_feats"].to_pylist()
        flat = []
        fidx = []
        for i, f in enumerate(feats):
            if f:
                flat.append(np.asarray(f, dtype=np.int64).view(np.uint64))
                fidx.append(np.full(len(f), i, dtype=np.int64))
        if flat:
            out_key.append(mix_u64(np.concatenate(flat), CH_CDC))
            out_idx.append(np.concatenate(fidx))

    # substring channel: each caption winnow fingerprint is a key —
    # catches long verbatim caption overlap that shingle-Jaccard bands
    # under-weight (same posting topology as the CDC channel)
    if cfg.use_substring_channel and "sub_fps" in batch.column_names:
        sfps = batch["sub_fps"].to_pylist()
        sflat, sidx = [], []
        for i, f in enumerate(sfps):
            if f:
                sflat.append(np.asarray(f, dtype=np.int64).view(np.uint64))
                sidx.append(np.full(len(f), i, dtype=np.int64))
        if sflat:
            out_key.append(mix_u64(np.concatenate(sflat), CH_SUB))
            out_idx.append(np.concatenate(sidx))

    # exact channel: byte-identical payloads share a sha1 band (folds the
    # D2 exact-dedup shuffle into this one; such pairs verify trivially —
    # identical thumbs → PSNR inf)
    sha_u64 = np.array([int(s[:16], 16) for s in batch["sha1"].to_pylist()],
                       dtype=np.uint64)
    out_key.append(mix_u64(sha_u64, CH_SHA1))
    out_idx.append(all_idx)

    key = np.concatenate(out_key).view(np.int64)
    idx = np.concatenate(out_idx)
    return pa.table({
        "band_key": pa.array(key, pa.int64()),
        "nid": pa.array(nids[idx], pa.int64()),
        "phash": pa.array(phash[idx], pa.int64()),
        "thumb": pa.array([thumbs[i] for i in idx], pa.binary()),
    })


from functools import lru_cache


@lru_cache(maxsize=256)
def _triu_cached(g: int) -> tuple[np.ndarray, np.ndarray]:
    iu = np.triu_indices(g, k=1)
    return iu[0].astype(np.int64), iu[1].astype(np.int64)


def _pair_indices(g: int, full_pair_cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Pair index arrays for a group of size g (members sorted)."""
    if g <= full_pair_cap:
        iu = np.triu_indices(g, k=1)
        return iu[0], iu[1]
    # star to member 0 + adjacent chain — linear in g
    star_l = np.zeros(g - 1, dtype=np.int64)
    star_r = np.arange(1, g, dtype=np.int64)
    chain_l = np.arange(1, g - 1, dtype=np.int64)
    chain_r = np.arange(2, g, dtype=np.int64)
    return np.concatenate([star_l, chain_l]), np.concatenate([star_r, chain_r])


def empty_edges_table() -> pa.Table:
    return pa.table({
        "left_id": pa.array([], pa.int64()),
        "right_id": pa.array([], pa.int64()),
        "psnr": pa.array([], pa.float64()),
    })


def verify_pair_arrays(lth: np.ndarray, rth: np.ndarray,
                       lph, rph,
                       cfg: EngineConfig) -> tuple[np.ndarray, np.ndarray]:
    """The one verification kernel: pre-gathered pair thumb matrices
    (n_pairs × thumb_bytes) → (accept mask, psnr). Simulation mode reads
    the thumbs as big-endian phashes (SignatureStage stores the 8-byte
    phash in the thumb slot there); otherwise thumbnail PSNR with the
    phash-Hamming<=5 second opinion when phashes are supplied (a crop
    can shift the 8x8 thumb grid below the PSNR threshold while the
    perceptual hash stays near-identical)."""
    from .. import codec as _codec
    if cfg.simulation:
        a = lth.copy().view(">i8").ravel()
        b = rth.copy().view(">i8").ravel()
        ham = _codec.hamming64(a, b)
        ok = ham <= cfg.verify.sim_hamming_max
        psnr = np.where(ok, 100.0 - ham, 0.0).astype(np.float64)
        return ok, psnr
    diff = lth.astype(np.float32) - rth.astype(np.float32)
    mse = np.mean(diff * diff, axis=1)
    with np.errstate(divide="ignore"):
        psnr = np.where(mse > 0, 10.0 * np.log10(
            255.0 * 255.0 / np.maximum(mse, 1e-12)), np.inf)
    ok = psnr >= cfg.verify.psnr_threshold
    if lph is not None:
        ok = ok | (_codec.hamming64(
            np.asarray(lph, np.int64), np.asarray(rph, np.int64)) <= 5)
    return ok, psnr


def verify_bucket(df: pd.DataFrame, cfg: EngineConfig | None = None) -> pa.Table:
    """Vectorized multi-group verify: one hash-bucket of band rows → all
    verified edges of every band group inside it. Pair-index generation
    loops only over *collided* groups (building index arrays); the PSNR
    probe runs once over every pair in the bucket.

    Replaces destor's champion-prefetch-and-probe
    (similarity_detection.c:136-217) — the "prefetch" is the thumb column
    already in the group and the "probe" is a vectorized PSNR."""
    cfg = cfg or EngineConfig()
    df = df.drop_duplicates(["band_key", "nid"])
    df = df.sort_values(["band_key", "nid"], kind="stable")
    keys = df["band_key"].to_numpy()
    n = len(df)
    if n < 2:
        return empty_edges_table()
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    coll = counts >= 2
    if not coll.any():
        return empty_edges_table()
    starts_c = starts[coll]
    counts_c = counts[coll]
    cap = cfg.lsh.full_pair_cap
    li_parts, ri_parts = [], []
    # all-pairs groups, vectorized per DISTINCT size (<= cap sizes total):
    # tile the cached triu index template across every group of that size
    small = counts_c <= cap
    for c in np.unique(counts_c[small]):
        gl, gr = _triu_cached(int(c))
        st = starts_c[small][counts_c[small] == c]
        li_parts.append((st[:, None] + gl[None, :]).ravel())
        ri_parts.append((st[:, None] + gr[None, :]).ravel())
    # big groups (hot bands): star+chain, rare — loop is fine
    for s, c in zip(starts_c[~small], counts_c[~small]):
        gl, gr = _pair_indices(int(c), cap)
        li_parts.append(gl + s)
        ri_parts.append(gr + s)
    li = np.concatenate(li_parts)
    ri = np.concatenate(ri_parts)
    if "is_base" in df.columns:
        # incremental mode: base-base pairs are already known from the
        # base job — only pairs touching >= 1 arriving (delta) row verify
        isb = df["is_base"].to_numpy(np.int8).astype(bool)
        m = ~(isb[li] & isb[ri])
        li, ri = li[m], ri[m]
        if len(li) == 0:
            return empty_edges_table()
    ids = df["nid"].to_numpy()
    thumbs = np.frombuffer(b"".join(df["thumb"]), dtype=np.uint8).reshape(n, -1)
    ph = (df["phash"].to_numpy().astype(np.int64)
          if "phash" in df.columns and not cfg.simulation else None)
    ok, psnr = verify_pair_arrays(
        thumbs[li], thumbs[ri],
        ph[li] if ph is not None else None,
        ph[ri] if ph is not None else None, cfg)
    out = pd.DataFrame({
        "left_id": ids[li[ok]],
        "right_id": ids[ri[ok]],
        "psnr": np.minimum(psnr[ok], 1e9).astype(np.float64),
    }).drop_duplicates(["left_id", "right_id"])  # same pair via several bands
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


def binary_matrix(col) -> np.ndarray:
    """(n, w) uint8 view of an equal-width Arrow binary column built
    from the array's offset/data buffers — no per-row Python bytes
    objects (the cost the pandas conversion pays). Falls back to a
    join-copy for ragged widths (never the case for thumb columns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), np.uint8)
    off_dt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], off_dt)[col.offset:col.offset + n + 1]         .astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8)
    w = int(offs[1] - offs[0])
    if w <= 0 or not (np.diff(offs) == w).all():
        return np.frombuffer(b"".join(col.to_pylist()), np.uint8)             .reshape(n, -1)
    return data[offs[0]:offs[0] + n * w].reshape(n, w)


def verify_bucket_arrow(batch: pa.Table,
                        cfg: EngineConfig | None = None) -> pa.Table:
    """Arrow-native verify_bucket (round 3, VERDICT r2 #7): identical
    semantics to verify_bucket above, but the bucket arrives as a
    pyarrow Table and the thumb column is gathered as one (n, w) uint8
    view of the Arrow data buffer — the pandas hop that object-boxed
    every thumb into a Python bytes is gone. Used by the flagship
    inline path; the pandas twin stays for the champion/salted/
    rendezvous callers."""
    cfg = cfg or EngineConfig()
    n0 = batch.num_rows
    if n0 < 2:
        return empty_edges_table()
    bk0 = batch["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
    nid0 = batch["nid"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((nid0, bk0))
    bk = bk0[order]
    nid = nid0[order]
    keep = np.ones(n0, bool)
    keep[1:] = (bk[1:] != bk[:-1]) | (nid[1:] != nid[:-1])
    idx = order[keep]          # original positions, (band_key, nid)-sorted
    bk = bk[keep]
    nid = nid[keep]
    n = len(idx)
    if n < 2:
        return empty_edges_table()
    brk = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
    counts = np.diff(np.r_[brk, n])
    coll = counts >= 2
    if not coll.any():
        return empty_edges_table()
    starts_c = brk[coll]
    counts_c = counts[coll]
    cap = cfg.lsh.full_pair_cap
    li_parts, ri_parts = [], []
    small = counts_c <= cap
    for c in np.unique(counts_c[small]):
        gl, gr = _triu_cached(int(c))
        st = starts_c[small][counts_c[small] == c]
        li_parts.append((st[:, None] + gl[None, :]).ravel())
        ri_parts.append((st[:, None] + gr[None, :]).ravel())
    for s, c in zip(starts_c[~small], counts_c[~small]):
        gl, gr = _pair_indices(int(c), cap)
        li_parts.append(gl + s)
        ri_parts.append(gr + s)
    li = np.concatenate(li_parts)
    ri = np.concatenate(ri_parts)
    names = batch.column_names
    if "is_base" in names:
        isb = batch["is_base"].to_numpy(zero_copy_only=False)             .astype(bool)[idx]
        m = ~(isb[li] & isb[ri])
        li, ri = li[m], ri[m]
        if len(li) == 0:
            return empty_edges_table()
    thumbs = binary_matrix(batch["thumb"])[idx]
    ph = (batch["phash"].to_numpy(zero_copy_only=False)
          .astype(np.int64)[idx]
          if "phash" in names and not cfg.simulation else None)
    ok, psnr = verify_pair_arrays(
        thumbs[li], thumbs[ri],
        ph[li] if ph is not None else None,
        ph[ri] if ph is not None else None, cfg)
    l_ = nid[li[ok]]
    r_ = nid[ri[ok]]
    ps = np.minimum(psnr[ok], 1e9).astype(np.float64)
    # same pair via several bands: keep first in (l, r) order
    o = np.lexsort((r_, l_))
    l_, r_, ps = l_[o], r_[o], ps[o]
    kp = np.ones(len(l_), bool)
    kp[1:] = (l_[1:] != l_[:-1]) | (r_[1:] != r_[:-1])
    return pa.table({
        "left_id": pa.array(l_[kp], pa.int64()),
        "right_id": pa.array(r_[kp], pa.int64()),
        "psnr": pa.array(ps[kp], pa.float64()),
    })


def verify_bucket_champions(df: pd.DataFrame, cfg: EngineConfig | None = None) -> pa.Table:
    """Champion-mode verify (destor parity preset, cfg.lsh.champion_top_k
    > 0): instead of exhaustively verifying every in-group pair, each row
    scores its band-collision partners by SHARED band-key count (the
    "#shared features" score of top_segment_select,
    /root/reference/src/index/similarity_detection.c:85-123), greedily
    selects the top-k champions with feature trim between picks
    (functions/sampling.select_champions — the ported kernel), and only
    (row, champion) pairs are PSNR/phash verified. Bounds verification
    work to k pairs per row — the reference's candidate-count behavior —
    at a measured recall delta vs the exhaustive path (tests)."""
    from ..functions.sampling import select_champions
    cfg = cfg or EngineConfig()
    df = df.drop_duplicates(["band_key", "nid"])
    df = df.sort_values(["band_key", "nid"], kind="stable")
    keys = df["band_key"].to_numpy()
    n = len(df)
    if n < 2:
        return empty_edges_table()
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    coll = counts >= 2
    if not coll.any():
        return empty_edges_table()
    starts_c = starts[coll]
    counts_c = counts[coll]
    cap = cfg.lsh.full_pair_cap
    li_parts, ri_parts = [], []
    small = counts_c <= cap
    for c in np.unique(counts_c[small]):
        gl, gr = _triu_cached(int(c))
        st = starts_c[small][counts_c[small] == c]
        li_parts.append((st[:, None] + gl[None, :]).ravel())
        ri_parts.append((st[:, None] + gr[None, :]).ravel())
    for s, c in zip(starts_c[~small], counts_c[~small]):
        gl, gr = _pair_indices(int(c), cap)
        li_parts.append(gl + s)
        ri_parts.append(gr + s)
    li = np.concatenate(li_parts)
    ri = np.concatenate(ri_parts)
    ids = df["nid"].to_numpy()
    # candidate scoring: one row per (pair, shared band key) BEFORE any
    # dedup — multiplicity IS the shared-feature count
    cand = pd.DataFrame({"q": ids[li], "c": ids[ri], "k": keys[li]})
    both = pd.concat([cand, cand.rename(columns={"q": "c", "c": "q"})])
    chosen: set[tuple[int, int]] = set()
    for q, g in both.groupby("q", sort=False):
        feats: dict[int, set] = {}
        for c_, k_ in zip(g["c"], g["k"]):
            feats.setdefault(int(c_), set()).add(int(k_))
        for ch in select_champions(feats, cfg.lsh.champion_top_k):
            chosen.add((min(int(q), ch), max(int(q), ch)))
    if not chosen:
        return empty_edges_table()
    # verify the chosen pairs (thumb PSNR + phash second opinion), using
    # each nid's first occurrence in the bucket for its signature columns
    first = df.drop_duplicates("nid")
    nid_arr = first["nid"].to_numpy()
    order = np.argsort(nid_arr)
    nid_sorted = nid_arr[order]
    thumbs = np.frombuffer(b"".join(first["thumb"]), dtype=np.uint8) \
        .reshape(len(first), -1)[order]
    ph = first["phash"].to_numpy().astype(np.int64)[order] \
        if "phash" in first.columns else None
    pl = np.fromiter((p[0] for p in chosen), dtype=np.int64, count=len(chosen))
    pr = np.fromiter((p[1] for p in chosen), dtype=np.int64, count=len(chosen))
    il = np.searchsorted(nid_sorted, pl)
    ir = np.searchsorted(nid_sorted, pr)
    diff = thumbs[il].astype(np.float32) - thumbs[ir].astype(np.float32)
    mse = np.mean(diff * diff, axis=1)
    with np.errstate(divide="ignore"):
        psnr = np.where(mse > 0, 10.0 * np.log10(255.0 * 255.0 / np.maximum(mse, 1e-12)), np.inf)
    ok = psnr >= cfg.verify.psnr_threshold
    if ph is not None:
        from .. import codec as _codec
        ok = ok | (_codec.hamming64(ph[il], ph[ir]) <= 5)
    return pa.table({
        "left_id": pa.array(pl[ok], pa.int64()),
        "right_id": pa.array(pr[ok], pa.int64()),
        "psnr": pa.array(np.minimum(psnr[ok], 1e9).astype(np.float64), pa.float64()),
    })


def pair_gen_bucket(df: pd.DataFrame, cfg: EngineConfig | None = None) -> pa.Table:
    """Candidate PAIR generation without verification (thumbless band
    rows): same grouping/cap logic as verify_bucket, emits
    (left_id, right_id) for downstream join-verify."""
    cfg = cfg or EngineConfig()
    df = df.drop_duplicates(["band_key", "nid"])
    df = df.sort_values(["band_key", "nid"], kind="stable")
    keys = df["band_key"].to_numpy()
    n = len(df)
    empty = pa.table({"left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64())})
    if n < 2:
        return empty
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    coll = counts >= 2
    if not coll.any():
        return empty
    starts_c = starts[coll]
    counts_c = counts[coll]
    cap = cfg.lsh.full_pair_cap
    li_parts, ri_parts = [], []
    small = counts_c <= cap
    for c in np.unique(counts_c[small]):
        gl, gr = _triu_cached(int(c))
        st = starts_c[small][counts_c[small] == c]
        li_parts.append((st[:, None] + gl[None, :]).ravel())
        ri_parts.append((st[:, None] + gr[None, :]).ravel())
    for s, c in zip(starts_c[~small], counts_c[~small]):
        gl, gr = _pair_indices(int(c), cap)
        li_parts.append(gl + s)
        ri_parts.append(gr + s)
    li = np.concatenate(li_parts)
    ri = np.concatenate(ri_parts)
    ids = df["nid"].to_numpy()
    out = pd.DataFrame({"left_id": ids[li], "right_id": ids[ri]}) \
        .drop_duplicates(["left_id", "right_id"])
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


def candidate_edges_joinverify(signatures_ds, cfg: EngineConfig | None = None,
                               num_buckets: int = 64, join_partitions: int = 32):
    """Low-volume variant of candidate_edges: the big band shuffle moves
    only (band_key, nid) — 16 B/row instead of ~90 — and thumbnails are
    attached to the (much smaller) candidate-pair table by two
    hash-partitioned joins against the per-row thumb table, then verified
    in a vectorized map. Same verified-edge semantics as the thumb-
    carrying path (tested equal). Measured on this Ray build the two
    joins cost MORE than the saved shuffle volume (47 s vs 12.5 s at
    400k rows / 1.76M pairs) — kept as the demonstration of the
    partitioned-hash-join verify topology; revisit when Dataset.join's
    aggregator constant drops."""
    from .grouped import bucketed_group_map
    cfg = cfg or EngineConfig()

    def explode_nothumb(batch: pa.Table) -> pa.Table:
        t = explode_bands(batch, cfg)
        return t.select(["band_key", "nid"])  # NB: loses the phash second
        # opinion of verify_bucket — joinverify recall can trail slightly

    bands = signatures_ds.map_batches(explode_nothumb, batch_format="pyarrow")
    pairs = bucketed_group_map(bands, "band_key",
                               lambda df: pair_gen_bucket(df, cfg),
                               num_buckets=num_buckets)

    def thumbs_tbl(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tnid": pa.array(parse_nid(batch["image_id"].to_pylist()), pa.int64()),
            "thumb": batch["thumb"],
        })

    thumbs = signatures_ds.map_batches(thumbs_tbl, batch_format="pyarrow")
    j1 = pairs.join(thumbs, "inner", join_partitions,
                    on=("left_id",), right_on=("tnid",))
    j1 = j1.map_batches(lambda b: pa.table({
        "left_id": b["left_id"], "right_id": b["right_id"],
        "lthumb": b["thumb"]}), batch_format="pyarrow")
    j2 = j1.join(thumbs, "inner", join_partitions,
                 on=("right_id",), right_on=("tnid",))

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return empty_edges_table()
        lt = np.frombuffer(b"".join(batch["lthumb"].to_pylist()), dtype=np.uint8).reshape(n, -1)
        rt = np.frombuffer(b"".join(batch["thumb"].to_pylist()), dtype=np.uint8).reshape(n, -1)
        diff = lt.astype(np.float32) - rt.astype(np.float32)
        mse = np.mean(diff * diff, axis=1)
        with np.errstate(divide="ignore"):
            psnr = np.where(mse > 0, 10.0 * np.log10(255.0 * 255.0 / np.maximum(mse, 1e-12)), np.inf)
        ok = psnr >= cfg.verify.psnr_threshold
        return pa.table({
            "left_id": batch["left_id"].filter(pa.array(ok)),
            "right_id": batch["right_id"].filter(pa.array(ok)),
            "psnr": pa.array(np.minimum(psnr[ok], 1e9).astype(np.float64), pa.float64()),
        })

    return j2.map_batches(verify, batch_format="pyarrow")


def _rdv_sig_rows(batch: pa.Table) -> pa.Table:
    """Signature rows → rendezvous endpoint rows (one per corpus row):
    the thumb/phash ship ONCE per exchange, not once per band row."""
    n = batch.num_rows
    return pa.table({
        "key": pa.array(parse_nid(batch["image_id"].to_pylist()), pa.int64()),
        "other": pa.array(np.full(n, -1, np.int64), pa.int64()),
        "ph": batch["phash"].cast(pa.int64()),
        "th": batch["thumb"].cast(pa.binary()),
        "lph": pa.array(np.zeros(n, np.int64), pa.int64()),
        "lth": pa.array([b""] * n, pa.binary()),
        "is_sig": pa.array(np.ones(n, np.int8), pa.int8()),
    })


def candidate_edges_rendezvous(signatures_ds, cfg: EngineConfig | None = None,
                               num_buckets: int = 64,
                               endpoint_buckets: int | None = None):
    """Pair-rendezvous verify — the low-shuffle-volume flagship variant
    (NOTES.md perf-lever #1): the big band exchange ships only
    (band_key, nid) — 16 B/row instead of ~90 — and emits UNVERIFIED
    candidate pairs; thumbnails + phashes then meet each pair through
    two endpoint-keyed tag-and-union exchanges (the same rendezvous
    topology as text.ngram_jaccard_pairs, which this Ray build executes
    far cheaper than Dataset.join — see candidate_edges_joinverify's
    measured 47 s for the join route). Unlike joinverify this path
    keeps the phash second opinion, so verified edges match the inline
    path exactly (tested: identical cluster assignment).

    Shuffle volume: 16 B × bands + 2 × (88 B × n_rows) + ~200 B ×
    n_pairs, vs ~90 B × bands inline — a ~2.5× cut at the default 8-byte
    thumb and growing linearly with thumb size (the knob that buys
    verification fidelity at scale).

    `signatures_ds` is consumed THREE times (bands + both endpoint
    sides) — pass a materialized or parquet-backed signature table
    (dedup_pipeline and the checkpointed job do)."""
    from .grouped import bucketed_group_map
    cfg = cfg or EngineConfig()
    eb = endpoint_buckets or max(16, num_buckets // 4)

    def explode_nothumb(batch: pa.Table) -> pa.Table:
        return explode_bands(batch, cfg).select(["band_key", "nid"])

    bands = signatures_ds.map_batches(explode_nothumb,
                                      batch_format="pyarrow")
    pairs = bucketed_group_map(bands, "band_key",
                               lambda df: pair_gen_bucket(df, cfg),
                               num_buckets=num_buckets)

    def pair_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["left_id"].cast(pa.int64()),
            "other": batch["right_id"].cast(pa.int64()),
            "ph": pa.array(np.zeros(n, np.int64), pa.int64()),
            "th": pa.array([b""] * n, pa.binary()),
            "lph": pa.array(np.zeros(n, np.int64), pa.int64()),
            "lth": pa.array([b""] * n, pa.binary()),
            "is_sig": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    half_in = signatures_ds.map_batches(_rdv_sig_rows,
                                        batch_format="pyarrow") \
        .union(pairs.map_batches(pair_rows, batch_format="pyarrow"))

    def attach_left(df: pd.DataFrame) -> pa.Table:
        iss = df["is_sig"].to_numpy(np.int8) == 1
        sig = df.loc[iss, ["key", "ph", "th"]].drop_duplicates("key")
        pr = df.loc[~iss, ["key", "other"]]
        j = pr.merge(sig, on="key", how="inner")
        n = len(j)
        # re-key by the RIGHT endpoint; left attrs ride in lph/lth
        return pa.table({
            "key": pa.array(j["other"].to_numpy(np.int64), pa.int64()),
            "other": pa.array(j["key"].to_numpy(np.int64), pa.int64()),
            "ph": pa.array(np.zeros(n, np.int64), pa.int64()),
            "th": pa.array([b""] * n, pa.binary()),
            "lph": pa.array(j["ph"].to_numpy(np.int64), pa.int64()),
            "lth": pa.array(list(j["th"]), pa.binary()),
            "is_sig": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    half = bucketed_group_map(half_in, "key", attach_left,
                              num_buckets=eb)
    full_in = signatures_ds.map_batches(_rdv_sig_rows,
                                        batch_format="pyarrow").union(half)

    def attach_right_verify(df: pd.DataFrame) -> pa.Table:
        iss = df["is_sig"].to_numpy(np.int8) == 1
        sig = df.loc[iss, ["key", "ph", "th"]].drop_duplicates("key")
        # the same pair can arrive via several band buckets — this is
        # the global dedup point (a pair's right endpoint fixes its
        # bucket, so all copies land here)
        pr = df.loc[~iss, ["key", "other", "lph", "lth"]] \
            .drop_duplicates(["key", "other"])
        j = pr.merge(sig, on="key", how="inner")
        n = len(j)
        if n == 0:
            return empty_edges_table()
        lth = np.frombuffer(b"".join(j["lth"]), dtype=np.uint8) \
            .reshape(n, -1)
        rth = np.frombuffer(b"".join(j["th"]), dtype=np.uint8) \
            .reshape(n, -1)
        lph = None if cfg.simulation else j["lph"].to_numpy(np.int64)
        rph = None if cfg.simulation else j["ph"].to_numpy(np.int64)
        ok, psnr = verify_pair_arrays(lth, rth, lph, rph, cfg)
        return pa.table({
            "left_id": pa.array(j["other"].to_numpy(np.int64)[ok],
                                pa.int64()),
            "right_id": pa.array(j["key"].to_numpy(np.int64)[ok],
                                 pa.int64()),
            "psnr": pa.array(np.minimum(psnr[ok], 1e9)
                             .astype(np.float64), pa.float64()),
        })

    return bucketed_group_map(full_in, "key", attach_right_verify,
                              num_buckets=eb)


def delta_band_bloom(delta_sigs_ds, cfg: EngineConfig,
                     num_bits: int = 1 << 22):
    """Mergeable Bloom filter over the DELTA shard's band keys: per-batch
    partial filters OR-reduce on the driver (filter bytes are tiny and
    fixed-size; the delta table streams). The classic DDFS negative
    pre-filter (functions/bloom.py, B1) applied to incremental ingest."""
    from ..functions.bloom import BloomFilter

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits=num_bits)
        t = explode_bands(batch, cfg)
        bf.add(t["band_key"].to_numpy(zero_copy_only=False)
               .view(np.uint64))
        return pa.table({"bits": pa.array([bf.to_bytes()], pa.binary())})

    out = BloomFilter(num_bits=num_bits)
    for b in delta_sigs_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for blob in b["bits"].to_pylist():
            out.merge(BloomFilter.from_bytes(blob))
    return out


def candidate_edges_incremental(base_sigs_ds, delta_sigs_ds,
                                cfg: EngineConfig | None = None,
                                num_buckets: int = 64,
                                bloom_prefilter: bool = False):
    """Incremental-ingest candidate generation (destor's second-backup
    topology: arriving chunks probe the fingerprint index persisted by
    prior jobs, /root/reference/src/index/index.c D8 'index update' at
    corpus scale): band rows from the PERSISTED base signature table and
    the arriving delta shard meet in the same band exchange, but
    base-base pairs are masked inside verify_bucket — the base corpus
    is never re-deduped, only probed. Emitted edges all touch >= 1
    delta row.

    bloom_prefilter=True is the base >> delta configuration (a 10^12-row
    index probed by a 10^6-row shard): a Bloom filter over the DELTA's
    band keys broadcasts once (fixed small bytes) and base band rows
    that can't collide with any delta key — almost all of them — are
    dropped BEFORE the exchange, the standard Bloom semi-join reduction
    (and destor's DDFS in-memory filter probe, B1). No false negatives,
    so the edge set is IDENTICAL to the unfiltered path (tested); false
    positives only ship harmless extra base rows."""
    import ray as _ray

    from .grouped import bucketed_group_map
    cfg = cfg or EngineConfig()

    def tag(flag: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = explode_bands(batch, cfg)
            return t.append_column(
                "is_base", pa.array(np.full(t.num_rows, flag, np.int8),
                                    pa.int8()))
        return fn

    base_tag = tag(1)
    if bloom_prefilter:
        bf_ref = _ray.put(delta_band_bloom(delta_sigs_ds, cfg).to_bytes())

        def base_fn(batch: pa.Table) -> pa.Table:
            from ..functions.bloom import BloomFilter
            bf = BloomFilter.from_bytes(_ray.get(bf_ref))
            t = base_tag(batch)
            hit = bf.contains(t["band_key"].to_numpy(zero_copy_only=False)
                              .view(np.uint64))
            return t.filter(pa.array(hit))
    else:
        base_fn = base_tag

    bands = base_sigs_ds.map_batches(base_fn, batch_format="pyarrow") \
        .union(delta_sigs_ds.map_batches(tag(0), batch_format="pyarrow"))
    # arrow-native verify (is_base mask handled inside) — same bucket
    # kernel as the flagship inline path
    return bucketed_group_map(bands, "band_key",
                              lambda t: verify_bucket_arrow(t, cfg),
                              num_buckets=num_buckets,
                              batch_format="pyarrow")


def candidate_edges(signatures_ds, cfg: EngineConfig | None = None,
                    num_buckets: int = 64, salt_hot_bands: bool = False):
    """signatures Dataset → verified edge Dataset
    (left_id:int64, right_id:int64, psnr).

    One shuffle: band rows bucketed by hash(band_key) →
    vectorized per-bucket verification (see grouped.py).

    salt_hot_bands=True adds the explicit two-pass hot-band salting
    demanded at 10^12-row scale (BASELINE.json north_rule): a vectorized
    count pass finds band keys whose group exceeds cfg.lsh.max_band_group;
    their rows are split into sub-keys (band_key, hash(nid) % S) so no
    single reducer ever receives a degenerate band whole. Connectivity
    across sub-groups is restored by a second tiny shuffle of per-sub-
    group minima ("linker" rows, S per hot key). Off by default at test
    scale — the in-bucket star+chain cap already keeps work linear."""
    from .grouped import bucketed_group_map
    cfg = cfg or EngineConfig()
    bands = signatures_ds.map_batches(
        lambda b: explode_bands(b, cfg), batch_format="pyarrow")
    if not salt_hot_bands:
        if cfg.lsh.champion_top_k > 0:
            return bucketed_group_map(bands, "band_key",
                                      lambda df: verify_bucket_champions(df, cfg),
                                      num_buckets=num_buckets)
        # arrow-native bucket: zero-copy thumb gather (VERDICT r2 #7)
        return bucketed_group_map(bands, "band_key",
                                  lambda t: verify_bucket_arrow(t, cfg),
                                  num_buckets=num_buckets,
                                  batch_format="pyarrow")
    return _salted_candidate_edges(bands, cfg, num_buckets)


def _salted_candidate_edges(bands, cfg: EngineConfig, num_buckets: int):
    import ray
    from ray.data.aggregate import Count
    from .grouped import bucketed_group_map

    bands = bands.materialize()  # consumed by count pass + salted pass
    counts = bands.groupby("band_key").aggregate(Count(alias_name="n"))
    hot = counts.filter(lambda r: r["n"] > cfg.lsh.max_band_group) \
        .select_columns(["band_key"]).to_pandas()
    if "band_key" in hot.columns and len(hot):
        hot_keys = np.asarray(np.sort(hot.band_key.to_numpy()), dtype=np.int64)
    else:
        hot_keys = np.empty(0, dtype=np.int64)
    hot_ref = ray.put(hot_keys)
    S = max(2, cfg.lsh.max_band_group // cfg.lsh.full_pair_cap)

    def salt(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        key = batch["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        nid = batch["nid"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot = np.isin(key, hk)
        sub = np.where(
            is_hot,
            mix_u64(nid.view(np.uint64), 0x5A17).view(np.int64) % S + 1,
            np.int64(0))
        salted = np.where(is_hot,
                          mix_u64(key.view(np.uint64) ^ np.uint64(sub).astype(np.uint64),
                                  0xC0FE).view(np.int64),
                          key)
        t = pa.table({
            "band_key": pa.array(salted, pa.int64()),
            "nid": batch["nid"],
            "phash": batch["phash"],
            "thumb": batch["thumb"],
            "orig_key": pa.array(np.where(is_hot, key, np.int64(0)), pa.int64()),
            "is_hot": pa.array(is_hot, pa.bool_()),
        })
        return t

    salted = bands.map_batches(salt, batch_format="pyarrow")

    def verify_and_link(df: pd.DataFrame) -> pa.Table:
        # phash rides along so the Hamming<=5 second-opinion channel of
        # verify_bucket is identical between the salted and default paths
        edges = verify_bucket(df[["band_key", "nid", "phash", "thumb"]], cfg)
        # linker rows: min nid of each hot sub-group (with its thumb +
        # phash), re-keyed by the ORIGINAL band key for the second-level
        # shuffle — they get PSNR-verified against the other sub-minima
        hotdf = df[df["is_hot"]]
        e = pa.table({
            "key": pa.array(np.zeros(edges.num_rows, np.int64), pa.int64()),
            "left_id": edges["left_id"],
            "right_id": edges["right_id"],
            "psnr": edges["psnr"],
            "phash": pa.array(np.zeros(edges.num_rows, np.int64), pa.int64()),
            "thumb": pa.array([None] * edges.num_rows, pa.binary()),
            "is_link": pa.array([False] * edges.num_rows, pa.bool_()),
        })
        if not len(hotdf):
            return e
        g = hotdf.sort_values(["band_key", "nid"], kind="stable") \
            .groupby("band_key", sort=False).first().reset_index()
        l = pa.table({
            "key": pa.array(g["orig_key"].to_numpy().astype(np.int64), pa.int64()),
            "left_id": pa.array(g["nid"].to_numpy().astype(np.int64), pa.int64()),
            "right_id": pa.array(np.zeros(len(g), np.int64), pa.int64()),
            "psnr": pa.array(np.zeros(len(g)), pa.float64()),
            "phash": pa.array(g["phash"].to_numpy().astype(np.int64), pa.int64()),
            "thumb": pa.array(list(g["thumb"]), pa.binary()),
            "is_link": pa.array([True] * len(g), pa.bool_()),
        })
        return pa.concat_tables([e, l])

    mixed = bucketed_group_map(salted, "band_key",
                               verify_and_link, num_buckets=num_buckets)
    mixed = mixed.materialize()
    edges = mixed.filter(lambda r: not r["is_link"]).select_columns(
        ["left_id", "right_id", "psnr"])

    def link_pairs(df: pd.DataFrame) -> pa.Table:
        # df rows: key = orig hot band key, left_id = sub-group min nid,
        # thumb = its verify signature → PSNR-verify min-to-min pairs
        sub = pd.DataFrame({"band_key": df["key"], "nid": df["left_id"],
                            "phash": df["phash"], "thumb": df["thumb"]})
        return verify_bucket(sub, cfg)

    links = mixed.filter(lambda r: bool(r["is_link"]))
    link_edges = bucketed_group_map(links, "key", link_pairs,
                                    num_buckets=max(8, num_buckets // 8))
    return edges.union(link_edges)


def empty_matches_table() -> pa.Table:
    return pa.table({"query_id": pa.array([], pa.int64()),
                     "match_id": pa.array([], pa.int64()),
                     "psnr": pa.array([], pa.float64())})


def probe_index(signatures_ds, query_sigs: pa.Table,
                cfg: EngineConfig | None = None):
    """ONLINE index lookup — destor's per-chunk probe hierarchy
    (index_lookup_base, /root/reference/src/index/index.c:140-217, and
    the similarity champion probe, similarity_detection.c:136-217)
    recast as the SERVING shape: given a handful of query rows, find
    every corpus row that shares an LSH band with a query AND passes
    the same verify kernel the batch pipeline uses.

    Scale shape: MAP-ONLY. The query side is exploded to band rows on
    the driver (tiny — ~18 rows per query) and broadcast once as a
    sorted-key micro-index (`ray.put`); every corpus batch explodes its
    own bands, semi-joins them against the broadcast keys with one
    searchsorted (the DDFS Bloom "have I seen this?" test, B1), and
    verifies surviving (corpus, query) pairs in place. No shuffle
    touches the corpus — the only exchange is the tiny match-dedup
    groupby at the end (band-duplicated hits fold via max-psnr)."""
    import ray as _ray
    from ray.data.aggregate import Max

    cfg = cfg or EngineConfig()
    qb = explode_bands(query_sigs, cfg).to_pandas() \
        .drop_duplicates(["band_key", "nid"]).sort_values("band_key",
                                                          kind="stable")
    qkeys = qb["band_key"].to_numpy(np.int64)
    uk, start = np.unique(qkeys, return_index=True)
    offs = np.append(start, len(qkeys))
    qn = qb["nid"].to_numpy(np.int64)
    qth = (np.frombuffer(b"".join(qb["thumb"]), np.uint8)
           .reshape(len(qb), -1) if len(qb) else np.zeros((0, 1), np.uint8))
    qph = qb["phash"].to_numpy(np.int64)
    ref = _ray.put((uk, offs, qn, qth, qph))

    def probe(batch: pa.Table) -> pa.Table:
        bands = explode_bands(batch, cfg)
        if bands.num_rows == 0:
            return empty_matches_table()
        uk_, offs_, qn_, qth_, qph_ = _ray.get(ref)
        bk = bands["band_key"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(uk_, bk)
        posc = np.clip(pos, 0, max(0, len(uk_) - 1))
        hit = (uk_[posc] == bk) if len(uk_) else np.zeros(len(bk), bool)
        if not hit.any():
            return empty_matches_table()
        rows = np.flatnonzero(hit)
        p = posc[rows]
        counts = offs_[p + 1] - offs_[p]
        li = np.repeat(rows, counts)                       # corpus side
        tot = int(counts.sum())
        ri = (np.repeat(offs_[p], counts)
              + np.arange(tot) - np.repeat(
                  np.concatenate(([0], counts.cumsum()[:-1])), counts))
        cn = bands["nid"].to_numpy(zero_copy_only=False)
        cth = np.frombuffer(b"".join(bands["thumb"].to_pylist()),
                            np.uint8).reshape(bands.num_rows, -1)
        cph = bands["phash"].to_numpy(zero_copy_only=False)
        ok, psnr = verify_pair_arrays(cth[li], qth_[ri], cph[li],
                                      qph_[ri], cfg)
        keep = ok & (cn[li] != qn_[ri])                    # drop self-hits
        out = pd.DataFrame({
            "query_id": qn_[ri[keep]],
            "match_id": cn[li[keep]],
            "psnr": np.minimum(psnr[keep], 1e9).astype(np.float64),
        }).drop_duplicates(["query_id", "match_id"])
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    hits = signatures_ds.map_batches(probe, batch_format="pyarrow")
    return hits.groupby(["query_id", "match_id"]) \
        .aggregate(Max("psnr", alias_name="psnr"))


def hardneg_bucket(df: pd.DataFrame, cfg: EngineConfig | None = None) -> pa.Table:
    """verify_bucket's REJECT stream: candidate pairs that collided in
    an LSH band but FAILED thumbnail/phash verification. These are the
    hard negatives a contrastive/metric-learning pipeline mines —
    near-collisions that look alike to the cheap signature but are not
    duplicates (the planted distractor_near_miss rows are exactly this
    class). Same pair generation + the shared verify kernel as
    verify_bucket (:201 above); only the mask flips, so the union of
    this stream and the verified edges is the full candidate set."""
    cfg = cfg or EngineConfig()
    df = df.drop_duplicates(["band_key", "nid"])
    df = df.sort_values(["band_key", "nid"], kind="stable")
    keys = df["band_key"].to_numpy()
    n = len(df)
    empty = pa.table({"anchor": pa.array([], pa.int64()),
                      "negative": pa.array([], pa.int64()),
                      "psnr_centi": pa.array([], pa.int64()),
                      "phash_hamming": pa.array([], pa.int64())})
    if n < 2:
        return empty
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    coll = counts >= 2
    if not coll.any():
        return empty
    starts_c, counts_c = starts[coll], counts[coll]
    cap = cfg.lsh.full_pair_cap
    li_parts, ri_parts = [], []
    small = counts_c <= cap
    for c in np.unique(counts_c[small]):
        gl, gr = _triu_cached(int(c))
        st = starts_c[small][counts_c[small] == c]
        li_parts.append((st[:, None] + gl[None, :]).ravel())
        ri_parts.append((st[:, None] + gr[None, :]).ravel())
    for s, c in zip(starts_c[~small], counts_c[~small]):
        gl, gr = _pair_indices(int(c), cap)
        li_parts.append(gl + s)
        ri_parts.append(gr + s)
    li = np.concatenate(li_parts)
    ri = np.concatenate(ri_parts)
    ids = df["nid"].to_numpy()
    thumbs = np.frombuffer(b"".join(df["thumb"]), dtype=np.uint8).reshape(n, -1)
    ph = (df["phash"].to_numpy().astype(np.int64)
          if "phash" in df.columns and not cfg.simulation else None)
    ok, psnr = verify_pair_arrays(
        thumbs[li], thumbs[ri],
        ph[li] if ph is not None else None,
        ph[ri] if ph is not None else None, cfg)
    rej = ~ok
    if not rej.any():
        return empty
    from .. import codec as _codec
    ham = (_codec.hamming64(ph[li[rej]], ph[ri[rej]]).astype(np.int64)
           if ph is not None else np.full(int(rej.sum()), -1, np.int64))
    out = pd.DataFrame({
        "anchor": ids[li[rej]],
        "negative": ids[ri[rej]],
        "psnr_centi": np.round(np.minimum(psnr[rej], 1e6) * 100)
        .astype(np.int64),
        "phash_hamming": ham,
    }).drop_duplicates(["anchor", "negative"])
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def hard_negative_pairs(signatures_ds, cfg: EngineConfig | None = None,
                        num_buckets: int = 64):
    """signatures → (anchor, negative, psnr_centi, phash_hamming):
    the hard-negative mining stage (one band exchange, the exact
    counterpart of candidate_edges with the verify mask flipped)."""
    from .grouped import bucketed_group_map
    cfg = cfg or EngineConfig()
    bands = signatures_ds.map_batches(
        lambda b: explode_bands(b, cfg), batch_format="pyarrow")
    return bucketed_group_map(bands, "band_key",
                              lambda df: hardneg_bucket(df, cfg),
                              num_buckets=num_buckets)
