"""Multi-format ingest surface (SURVEY.md §2.1 S1 — destor reads its
corpus from trace files and raw directories; a Ray-native engine must
ingest whatever serialization the corpus arrives in and converge on the
same Dataset downstream).

`docs_jsonl_stats` proves the JSONL path end-to-end: the documents
table is exported to line-delimited JSON (a deterministic, cached
export — the fixture stands in for a crawler's native output), read
back through sources.read_table's format dispatch, and aggregated.
The DuckDB oracle runs over the ORIGINAL parquet, so a hash match
certifies the export→read_json→Dataset round trip loses nothing.

Scale shape: the export is a streaming map_batches → write_json (one
shard per input block, resumable layout); the stats pass is the same
map-side-combined groupby as docs_stats_by_lang. JSON reads are
CPU-heavier than parquet and have no column pushdown — the read
immediately select_columns()s down, and the docstring is the warning.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources import read_table


def _per_class_report(got: set, truth_by_kind: dict, kinds):
    """The shared per-class channel scorecard: one row per planted
    transform kind + a _total row — (kind, n_planted, n_found,
    n_false, recall_ppm), counts int64. False pairs attribute to the
    planted class of the ids involved (_false_by_kind); the
    unattributed residue appears only in _total."""
    import pandas as pd
    all_truth = set().union(*truth_by_kind.values())
    fbk = _false_by_kind(got - all_truth, truth_by_kind)
    rows = []
    for kind in kinds:
        t = truth_by_kind[kind]
        found = len(got & t)
        rows.append({"kind": kind, "n_planted": len(t),
                     "n_found": found, "n_false": fbk[kind],
                     "recall_ppm": found * 1_000_000 // max(1, len(t))})
    n_planted = len(all_truth)
    rows.append({"kind": "_total", "n_planted": n_planted,
                 "n_found": len(got & all_truth),
                 "n_false": len(got - all_truth),
                 "recall_ppm": len(got & all_truth) * 1_000_000
                 // max(1, n_planted)})
    out = pd.DataFrame(rows)
    for c in ("n_planted", "n_found", "n_false", "recall_ppm"):
        out[c] = out[c].astype("int64")
    return out


def _pair_report(first_col: str, n_units: int, n_planted: int,
                 n_cand: int, got: set, truth: set):
    """The shared one-row channel scorecard: (n_<units>, n_planted,
    n_candidate_pairs, n_verified_pairs, n_true, n_false, recall_ppm),
    all int64 (round-3 channel-harness extraction — ~20 copies)."""
    import pandas as pd
    n_true = len(got & truth)
    return pd.DataFrame({
        first_col: [n_units], "n_planted": [n_planted],
        "n_candidate_pairs": [n_cand],
        "n_verified_pairs": [len(got)],
        "n_true": [n_true], "n_false": [len(got - truth)],
        "recall_ppm": [n_true * 1_000_000 // n_planted],
    }).astype("int64")


def _hash_band_rows(batch: pa.Table, id_col: str, fams, payloads,
                    n_bands: int = 8, bits: int = 8) -> pa.Table:
    """Shared LSH band fan-out (round-3 channel-harness extraction —
    this exact kernel appeared per-channel ~10 times): each 64-bit
    hash-family column splits into n_bands bit-slices; row i of family
    fi, band b emits band key (slot << bits) | slice with slot =
    fi*n_bands + b, slot-major row order (bit-identical to the
    per-channel originals). Payload columns ride every band row —
    numeric via np.tile, string/binary via list replication."""
    n = batch.num_rows
    reps = len(fams) * n_bands
    keys = np.empty(reps * n, np.int64)
    mask = np.uint64((1 << bits) - 1)
    for fi, col in enumerate(fams):
        h = batch[col].to_numpy(zero_copy_only=False).view(np.uint64)
        for band in range(n_bands):
            sl = (h >> np.uint64(bits * band)) & mask
            slot = fi * n_bands + band
            keys[slot * n:(slot + 1) * n] = \
                (np.int64(slot) << np.int64(bits)) | sl.astype(np.int64)
    cols = {"bkey": pa.array(keys, pa.int64()),
            id_col: pa.array(batch[id_col].to_pylist() * reps,
                             pa.string())}
    for c in payloads:
        t = batch[c].type
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            cols[c] = pa.array(
                np.tile(batch[c].to_numpy(zero_copy_only=False), reps), t)
        else:
            cols[c] = pa.array(batch[c].to_pylist() * reps, t)
    return pa.table(cols)


def _group_pairs(bk: np.ndarray, codes: np.ndarray):
    """Vectorized within-group (i<j) pair generation over one verify
    bucket (round-4 channel-harness extraction, VERDICT r3 #6): one
    lexsort by (band key, id code) replaces the per-group pandas
    groupby + nested Python pair loop that appeared ~30 times; rows
    duplicated on (key, id) collapse (the loops' ids[i]==ids[j] skip),
    group runs come from one diff, and the (i<j) index templates are
    np.triu batches by group size — the flagship verify topology
    (stages/candidates.py verify_bucket_arrow:299-330) generalized to
    the string-id channels. Returns (li, ri) row indices into the
    ORIGINAL frame, one entry per in-group candidate pair."""
    n = len(bk)
    empty = np.array([], np.int64)
    if n < 2:
        return empty, empty
    order = np.lexsort((codes, bk))
    bs, cs = bk[order], codes[order]
    keep = np.ones(n, bool)
    keep[1:] = (bs[1:] != bs[:-1]) | (cs[1:] != cs[:-1])
    idx = order[keep]
    bs = bs[keep]
    m = len(idx)
    if m < 2:
        return empty, empty
    brk = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
    counts = np.diff(np.r_[brk, m])
    coll = counts >= 2
    if not coll.any():
        return empty, empty
    starts_c, counts_c = brk[coll], counts[coll]
    li_p, ri_p = [], []
    for c in np.unique(counts_c):
        gl, gr = np.triu_indices(int(c), k=1)
        st = starts_c[counts_c == c]
        li_p.append((st[:, None] + gl[None, :]).ravel())
        ri_p.append((st[:, None] + gr[None, :]).ravel())
    li = np.concatenate(li_p)
    ri = np.concatenate(ri_p)
    return idx[li], idx[ri]


def _bucket_pairs(df, id_col: str, dedupe: bool = False):
    """(ids_obj_array, li, ri) for one verify-bucket DataFrame: id
    strings factorized to codes, pairs from _group_pairs. With
    `dedupe`, each unordered id pair survives once (the cross-group
    `seen` sets of the original loops — outcome-identical because
    every channel gate depends only on row payloads, which are
    constant per id)."""
    import pandas as pd
    ids = df[id_col].to_numpy()
    codes = pd.factorize(ids)[0].astype(np.int64)
    bk = df["bkey"].to_numpy(np.int64)
    li, ri = _group_pairs(bk, codes)
    if dedupe and len(li):
        a = np.minimum(codes[li], codes[ri])
        b = np.maximum(codes[li], codes[ri])
        _, first = np.unique((a << np.int64(32)) | b, return_index=True)
        first.sort()
        li, ri = li[first], ri[first]
    return ids, li, ri


def _psnr_centi_pairs(ta: np.ndarray, tb: np.ndarray) -> np.ndarray:
    """Vectorized per-pair centi-dB PSNR over (n_pairs, w) uint8 thumb
    matrices — identical rounding to the loops' min(psnr, 99.99)*100
    (codec.psnr returns inf on equality; 9999 here)."""
    d = ta.astype(np.float64) - tb.astype(np.float64)
    mse = (d * d).mean(axis=1)
    p = np.where(mse == 0.0, 99.99,
                 10.0 * np.log10(255.0 * 255.0 / np.maximum(mse, 1e-300)))
    return np.round(np.minimum(p, 99.99) * 100).astype(np.int64)


def _thumb_matrix(df, col: str = "thumb") -> np.ndarray:
    """(n, w) uint8 matrix from a bytes column (equal widths)."""
    n = len(df)
    if n == 0:
        return np.empty((0, 0), np.uint8)
    return np.frombuffer(b"".join(df[col]), np.uint8).reshape(n, -1)


def _emit_pairs(ids, li, ri, ok, score=None, score_col: str = "p") -> pa.Table:
    """Canonicalized (l < r, string order) pair table, the shape every
    channel's bucketed_group_map reducer returns; optional int64 score
    column (constant per pair across bands, so cross-band keep-first
    dedup downstream is order-independent)."""
    la, ra = ids[li[ok]], ids[ri[ok]]
    sw = la > ra
    l = np.where(sw, ra, la)
    r = np.where(sw, la, ra)
    cols = {"l": pa.array(l.astype(object), pa.string()),
            "r": pa.array(r.astype(object), pa.string())}
    if score is not None:
        cols[score_col] = pa.array(score[ok], pa.int64())
    return pa.table(cols)


def _zncc_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized _zncc over (n_pairs, w) float stacks — identical
    zero-norm edge semantics (both flat -> 1.0, one flat -> 0.0)."""
    za = a - a.mean(axis=1, keepdims=True)
    zb = b - b.mean(axis=1, keepdims=True)
    na = np.sqrt((za * za).sum(axis=1))
    nb = np.sqrt((zb * zb).sum(axis=1))
    num = (za * zb).sum(axis=1)
    return np.where((na == 0) | (nb == 0),
                    np.where(na == nb, 1.0, 0.0),
                    num / np.maximum(na * nb, 1e-300))


def _psnr_db_pairs(a: np.ndarray, b: np.ndarray,
                   equal_db: float = 99.0) -> np.ndarray:
    """Vectorized plain PSNR (dB, float) over (n_pairs, w) stacks —
    the `99.0 if mse == 0` convention of the inline channel gates."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean(axis=1)
    return np.where(mse == 0.0, equal_db,
                    10.0 * np.log10(255.0 * 255.0
                                    / np.maximum(mse, 1e-300)))


def _psnr_verify_bucket(id_col: str, psnr_min_centi: int,
                        with_score: bool = True,
                        ham_pregates: tuple = ()):
    """Factory for the STANDARD channel verify bucket (the dominant
    shape of the ~30 originals): optional any-of hamming pre-gates
    ((col, max_dist), ...) then the vectorized thumb-PSNR gate.
    Per-pair semantics identical to the replaced loops; Python cost is
    O(size-classes), not O(sum g^2) interpreter iterations."""

    def verify_bucket(df) -> pa.Table:
        ids, li, ri = _bucket_pairs(df, id_col)
        if not len(li):
            t = {"l": pa.array([], pa.string()),
                 "r": pa.array([], pa.string())}
            if with_score:
                t["p"] = pa.array([], pa.int64())
            return pa.table(t)
        if ham_pregates:
            from .. import codec as codec_mod
            pre = np.zeros(len(li), bool)
            for col, hmax in ham_pregates:
                hv = df[col].to_numpy(np.int64)
                pre |= codec_mod.hamming64(hv[li], hv[ri]) <= hmax
            li, ri = li[pre], ri[pre]
        thumbs = _thumb_matrix(df)
        pc_ = _psnr_centi_pairs(thumbs[li], thumbs[ri])
        ok = pc_ >= psnr_min_centi
        return _emit_pairs(ids, li, ri, ok,
                           pc_ if with_score else None)

    return verify_bucket


def _corr_verify_bucket(id_col: str, corr_min_milli: int,
                        prof_col: str = "prof",
                        dtype=np.int32):
    """Factory for the correlation-gate channels (audio/video profile
    signatures): vectorized normalized dot product over all in-group
    pairs at once."""

    def verify_bucket(df) -> pa.Table:
        ids, li, ri = _bucket_pairs(df, id_col)
        if not len(li):
            return pa.table({"l": pa.array([], pa.string()),
                             "r": pa.array([], pa.string())})
        n = len(df)
        profs = np.frombuffer(b"".join(df[prof_col]), dtype) \
            .reshape(n, -1).astype(np.float64)
        a, b = profs[li], profs[ri]
        denom = np.sqrt((a * a).sum(axis=1) * (b * b).sum(axis=1))
        corr = np.where(denom > 0, (a * b).sum(axis=1)
                        / np.maximum(denom, 1e-300), 0.0)
        ok = corr * 1000 >= corr_min_milli
        return _emit_pairs(ids, li, ri, ok)

    return verify_bucket


def _commit_fixture(out: str, tables: dict) -> str:
    """Atomically publish a deterministic fixture dir (the shared
    scaffold of every planted-dup channel corpus): write the tables
    into a pid-suffixed tmp dir, rename into place. A lost rename race
    is benign — the winner published the identical deterministic
    fixture."""
    import pyarrow.parquet as pq_
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for name, t in tables.items():
        pq_.write_table(t, f"{tmp}/{name}.parquet")
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _jsonl_export_dir(sf_dir: str) -> str:
    """Deterministic cached JSONL export of the documents table."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/destor_ray_jsonl/{tag}"
    if os.path.isdir(out):
        return out
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    # one shard per block (partitioned, resumable layout), staged in a
    # private dir and atomically renamed so a concurrent exporter can
    # never double the shards
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    ds.write_json(tmp)
    try:
        os.rename(tmp, out)
    except OSError:  # lost the race; the winner's export is identical
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def docs_jsonl_stats(sf_dir: str):
    """(lang, n_docs, sum_chars) aggregated from the JSONL round trip."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(_jsonl_export_dir(sf_dir),
                    columns=["doc_id", "lang", "text"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch["lang"],
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        })

    agg = ds.map_batches(narrow, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"))
    return agg.map_batches(
        lambda b: pa.table({
            "lang": b["lang"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "sum_chars": pc.cast(b["sum_chars"], pa.int64()),
        }), batch_format="pyarrow")


def _wav_corpus_dir(n_clips: int = 512, sr: int = 8000) -> str:
    """Deterministic cached synthetic WAV corpus (real RIFF/WAVE PCM
    payloads — the audio analog of corpus.ensure_corpus_parquet)."""
    import numpy as np

    out = f"/tmp/destor_ray_wav/n{n_clips}_sr{sr}"
    if os.path.isdir(out):
        return out
    from .. import codec
    rows, ids = [], []
    t = np.arange(sr, dtype=np.float32) / sr
    for i in range(n_clips):
        pcm = (0.5 * np.sin(2 * np.pi * (110 + 13 * i) * t)) \
            .astype(np.float32)
        rows.append(codec.wav_encode(pcm, sr))
        ids.append(f"clip{i:05d}")
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(rows, pa.binary()),
        "sample_rate": pa.array([sr] * n_clips, pa.int32()),
    })})


def _wav_dup_corpus_dir(n_base: int = 36, dup_every: int = 3,
                        sr: int = 8000) -> str:
    """WAV near-dup plan: amplitude-modulated three-tone clips (Philox
    per-clip frequencies/AM walk + low dither — non-stationary, so
    spectral profiles discriminate), plus for every dup_every-th base a
    planted near-duplicate `<id>_g`: the SAME signal at 0.6× gain with
    fresh dither — the volume-normalized re-upload an audio dedup
    pipeline must catch."""
    import numpy as np

    from .. import codec

    out = f"/tmp/destor_ray_wav_dup/v2_n{n_base}_d{dup_every}_sr{sr}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    t = np.arange(2 * sr, dtype=np.float64) / sr
    for i in range(n_base):
        rng = np.random.Generator(np.random.Philox(key=1000 + i))
        sig = np.zeros_like(t)
        for _ in range(3):
            f = rng.uniform(80, 1800)
            a = rng.uniform(0.2, 0.5)
            sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
        # clip-keyed BROADBAND component, part of the signal (the dup
        # scales it with the gain): real energy in every band, so the
        # delta-sign fingerprint is decided by signal, not dither
        sig += 0.1 * rng.normal(0, 1, len(t))
        # piecewise AM envelope: 16 random levels, linearly bridged
        lv = rng.uniform(0.2, 1.0, 17)
        env = np.interp(np.linspace(0, 16, len(t)), np.arange(17), lv)
        base = (sig * env / 3.0).astype(np.float32)
        ids.append(f"wav{i:05d}")
        blobs.append(codec.wav_encode(
            base + rng.normal(0, 1e-4, len(t)).astype(np.float32), sr))
        if i % dup_every == 0:
            rng2 = np.random.Generator(np.random.Philox(key=5000 + i))
            dup = (0.6 * base
                   + rng2.normal(0, 1e-4, len(t)).astype(np.float32)) \
                .astype(np.float32)
            ids.append(f"wav{i:05d}_g")
            blobs.append(codec.wav_encode(dup, sr))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def wav_audio_dedup(sf_dir: str, n_base: int = 36, dup_every: int = 3,
                    n_bands: int = 16, k_slots: int = 4,
                    corr_min_milli: int = 990):
    """(n_clips, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — GAIN-INVARIANT audio near-dup
    detection over real RIFF/WAVE PCM: the third modality of the dedup
    family (image flagship, video avi_video_dedup, now audio). The
    signature is the Haitsma–Kalker / Philips robust hash: per frame,
    bit(b) = sign of the time-delta of the band-energy difference
    E[t+1,b]−E[t,b]−(E[t+1,b+1]−E[t,b+1]) — scaling PCM by g scales
    every E by g², so ALL bits are mathematically invariant under pure
    gain (only dither near zero-deltas can flip); k sampled frames'
    bit-words pack into one int64 for the 8×8-bit LSH band exchange.
    Verify is the mean-centered log-band spectral profile (gain shifts
    log-energies by a constant, centering removes it): Pearson corr ≥
    corr_min_milli/1000 over the 16-band profiles that ride the band
    rows — 64 B per row, PCM never crosses the shuffle.

    Same topology as the image/video paths: one band-keyed exchange +
    one tiny pair groupby; planted 0.6×-gain copies must all verify
    and no distinct clips may merge (pinned by test).

    Measured caveat the fixture encodes: on a PURELY TONAL corpus
    (first fixture draft) ~30% of fingerprint bits flipped between a
    clip and its gain copy — most of the 16 bands carry ~zero signal
    energy for a 3-tone clip, so their delta-signs were decided by the
    independent dither, not the signal. Real audio is broadband; the
    fixture's clip-keyed broadband component restores that property
    (and is scaled by the gain like any real re-encode), after which
    per-slot flips drop to ~0 and banding recovers 12/12. The general
    lesson (sparse-spectrum inputs break delta-sign fingerprints)
    belongs to the operator, hence documented here."""
    import numpy as np

    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _wav_dup_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")
    n_planted = -(-n_base // dup_every)
    n_clips = n_base + n_planted

    FRAME, HOP = 1024, 512

    def _bands_energy(pcm: np.ndarray) -> np.ndarray:
        nf = 1 + (len(pcm) - FRAME) // HOP
        idx = (np.arange(FRAME)[None, :]
               + HOP * np.arange(nf)[:, None])
        w = np.hanning(FRAME)
        spec = np.abs(np.fft.rfft(pcm[idx] * w, axis=1)) ** 2
        # log-spaced band edges over [32 Hz, Nyquist)
        edges = np.unique(np.geomspace(
            4, spec.shape[1] - 1, n_bands + 1).astype(int))
        e = np.add.reduceat(spec, edges[:-1], axis=1)
        return e[:, :n_bands]

    class AudioFingerprint:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids_, words, profs = [], [], []
            for cid, data in zip(batch["clip_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                pcm, _sr = codec.audio_decode(data)
                e = _bands_energy(pcm.astype(np.float64))
                d_t = np.diff(e, axis=0)              # E[t+1]-E[t]
                bits = (d_t[:, :-1] - d_t[:, 1:]) > 0  # (T-1, bands-1)
                slots = [(j * (len(bits) - 1)) // max(1, k_slots - 1)
                         for j in range(k_slots)]
                word = 0
                nb = bits.shape[1]
                for j, s in enumerate(slots):
                    w_ = int(np.packbits(
                        bits[s], bitorder="big")[:2].view(">u2")[0] >> 1)
                    word |= (w_ & ((1 << nb) - 1)) << (j * nb)
                prof = np.log(e.mean(axis=0) + 1e-12)
                prof = prof - prof.mean()
                profs.append(np.round(prof * 1000).astype(np.int32)
                             .tobytes())
                words.append(word)
                ids_.append(cid)
            return pa.table({
                "clip_id": pa.array(ids_, pa.string()),
                "word": pa.array(words, pa.int64()),
                "prof": pa.array(profs, pa.binary()),
            })

    sigs = ds.map_batches(AudioFingerprint, batch_size=32, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS_LSH, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        h = batch["word"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = batch.num_rows
        keys = np.empty(N_BANDS_LSH * n, np.int64)
        mask = np.uint64((1 << BITS) - 1)
        for band in range(N_BANDS_LSH):
            bits = (h >> np.uint64(BITS * band)) & mask
            keys[band * n:(band + 1) * n] = \
                (np.int64(band) << np.int64(BITS)) | bits.astype(np.int64)
        return pa.table({
            "bkey": pa.array(keys, pa.int64()),
            "clip_id": pa.array(batch["clip_id"].to_pylist()
                                * N_BANDS_LSH, pa.string()),
            "prof": pa.array(batch["prof"].to_pylist() * N_BANDS_LSH,
                             pa.binary()),
        })

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    verify_bucket = _corr_verify_bucket("clip_id", corr_min_milli)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"wav{i:05d}", f"wav{i:05d}_g")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_clips", n_clips, n_planted, n_cand, got, truth)


def audio_wav_stats(sf_dir: str, n_clips: int = 512):
    """(sample_rate, n_clips, total_samples, rms_micro_mean) — the
    AUDIO multimodal path as a driver-visible query: genuine RIFF/WAVE
    PCM payloads decoded by the actor-pool AudioFeatures stage
    (decoder="real", stateless numpy WAV parser — the libsndfile seam
    stays for compressed formats), features aggregated per sample
    rate. `sf_dir` is unused (the corpus is the cached deterministic
    WAV set — 0.5-amplitude sines, so per-clip RMS ≈ 0.5/√2); it keeps
    the standard queries() signature."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    from ..stages.multimodal import audio_features

    ds = ray.data.read_parquet(_wav_corpus_dir(n_clips))
    feats = audio_features(ds, concurrency=2, batch_size=64)

    def narrow(batch: pa.Table) -> pa.Table:
        rms_micro = np.round(batch["rms"].to_numpy(zero_copy_only=False)
                             * 1_000_000).astype(np.int64)
        return pa.table({
            "sample_rate": pa.array(np.full(batch.num_rows, 8000, np.int64),
                                    pa.int64()),
            "n_samples": batch["n_samples"],
            "rms_micro": pa.array(rms_micro, pa.int64()),
        })

    agg = feats.map_batches(narrow, batch_format="pyarrow") \
        .groupby("sample_rate").aggregate(
            Count(alias_name="n_clips"),
            Sum("n_samples", alias_name="total_samples"),
            Sum("rms_micro", alias_name="rms_micro_sum"))
    return agg.map_batches(
        lambda b: pa.table({
            "sample_rate": b["sample_rate"],
            "n_clips": pc.cast(b["n_clips"], pa.int64()),
            "total_samples": pc.cast(b["total_samples"], pa.int64()),
            "rms_micro_mean": pa.array(
                pc.cast(b["rms_micro_sum"], pa.int64()).to_numpy(
                    zero_copy_only=False)
                // pc.cast(b["n_clips"], pa.int64()).to_numpy(
                    zero_copy_only=False), pa.int64()),
        }), batch_format="pyarrow")


def _csv_export_dir(sf_dir: str) -> str:
    """Deterministic cached CSV export of the documents table (the
    JSONL fixture's CSV sibling; same staged-rename discipline)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/destor_ray_csv/{tag}"
    if os.path.isdir(out):
        return out
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    ds.write_csv(tmp)
    try:
        os.rename(tmp, out)
    except OSError:  # lost the race; the winner's export is identical
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def docs_csv_stats(sf_dir: str):
    """(source, n_docs, sum_chars) aggregated from the CSV round trip —
    proves the CSV leg of sources.read_table's format dispatch the same
    way docs_jsonl_stats proves JSONL: the oracle runs over the
    ORIGINAL parquet, so a hash match certifies export → read_csv →
    Dataset loses nothing (quoting included — document text contains
    the delimiter-adjacent space but Arrow CSV quotes on write)."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(_csv_export_dir(sf_dir),
                    columns=["doc_id", "source", "text"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "source": batch["source"],
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        })

    agg = ds.map_batches(narrow, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"))
    return agg.map_batches(
        lambda b: pa.table({
            "source": b["source"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "sum_chars": pc.cast(b["sum_chars"], pa.int64()),
        }), batch_format="pyarrow")


def _video_corpus_dir(n_videos: int = 256) -> str:
    """Deterministic cached synthetic video corpus: opaque binary
    payloads (the engine treats video as bytes + typed metadata; real
    containers would come from a crawler) with varying frame counts."""
    import hashlib

    out = f"/tmp/destor_ray_video/n{n_videos}"
    if os.path.isdir(out):
        return out
    ids, blobs, nframes = [], [], []
    for i in range(n_videos):
        ids.append(f"vid{i:05d}")
        # payload bytes are an md5 chain — opaque, deterministic, and
        # distinct per video (the fake decoder keys frames off them)
        seed = hashlib.md5(f"video:{i}".encode()).digest()
        blobs.append(seed * (8 + i % 17))
        nframes.append(24 * (1 + i % 10))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "n_frames": pa.array(nframes, pa.int32()),
    })})


def _avi_corpus_dir(n_videos: int = 48, frames_per_video: int = 8) -> str:
    """Deterministic cached corpus of REAL Motion-JPEG AVI files: each
    video's frames are the procedural corpus image rolled horizontally
    with a per-frame brightness ramp (same dims within a video, as a
    camera emits), JFIF-encoded at q85 and wrapped in the RIFF/AVI
    grammar by destor_ray.avi — any standard player opens these."""
    from .. import corpus as corpus_mod
    from .. import avi as avi_mod
    from ..jpeg import encode as jfif_encode

    out = f"/tmp/destor_ray_avi/n{n_videos}_f{frames_per_video}"
    if os.path.isdir(out):
        return out
    import numpy as np
    ids, blobs, nframes, ws, hs = [], [], [], [], []
    for i in range(n_videos):
        px, w, h, _, _ = corpus_mod._base_pixels(seed=13, row=i)
        frames = []
        for j in range(frames_per_video):
            fr = np.roll(px, shift=3 * j, axis=1).astype(np.int16)
            fr = np.clip(fr + 4 * j, 0, 255).astype(np.uint8)
            frames.append(jfif_encode(fr, quality=85))
        ids.append(f"avi{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(frames, w=w, h=h, fps=10))
        nframes.append(frames_per_video)
        ws.append(w)
        hs.append(h)
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "n_frames": pa.array(nframes, pa.int32()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
    })})


def avi_frame_stats(sf_dir: str, n_videos: int = 48):
    """(n_videos, n_frames_total, n_sampled, mean_lum_micro,
    mean_video_bytes) — REAL video ingestion end-to-end: a corpus of
    Motion-JPEG AVI files (RIFF container, per-frame baseline JFIF —
    the format cheap cameras and OpenCV's MJPG writer emit) is frame-
    sampled by the SAME VideoFrameSample actor pool the fake-decoder
    path uses, with decoder="mjpeg-avi": the container walk is
    destor_ray.avi (chunk grammar, not idx1-trusting) and each sampled
    frame is decoded DC-ONLY (jpeg.decode_dc_luma — sampling k of N
    frames never entropy-decodes the other N−k, and never runs an
    IDCT at all). n_frames_total comes from the avih header alone
    (container metadata read, no frame parsing) and the sampled thumbs
    aggregate to a luma mean. Replaces the ffmpeg stub for the one
    codec family implementable without inter-frame state; H.264 etc.
    remain the declared seam. `sf_dir` unused (cached deterministic
    fixture), standard queries() signature."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    from .. import avi as avi_mod
    from ..stages.multimodal import VideoFrameSample

    d = _avi_corpus_dir(n_videos)
    vids = ray.data.read_parquet(f"{d}/videos.parquet",
                                 columns=["video_id", "bytes"])

    def meta_partial(batch: pa.Table) -> pa.Table:
        nf = 0
        tot = 0
        for data in batch["bytes"].to_pylist():
            nf += avi_mod.meta(data)[0]
            tot += len(data)
        return pa.table({
            "n_videos": pa.array([batch.num_rows], pa.int64()),
            "n_frames_total": pa.array([nf], pa.int64()),
            "bytes_total": pa.array([tot], pa.int64()),
        })

    m = vids.map_batches(meta_partial, batch_format="pyarrow") \
        .aggregate(Sum("n_videos", alias_name="nv"),
                   Sum("n_frames_total", alias_name="nf"),
                   Sum("bytes_total", alias_name="bt"))

    frames = vids.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"decoder": "mjpeg-avi"},
        batch_format="pyarrow", batch_size=16, concurrency=2)

    def lum(batch: pa.Table) -> pa.Table:
        raw = np.frombuffer(b"".join(batch["frame_thumb"].to_pylist()),
                            np.uint8)
        px = raw.reshape(batch.num_rows, -1)
        return pa.table({"lum_micro": pa.array(
            px.sum(axis=1, dtype=np.int64) * 1_000_000 // px.shape[1],
            pa.int64())})

    a = frames.map_batches(lum, batch_format="pyarrow") \
        .aggregate(Count(alias_name="n_sampled"),
                   Sum("lum_micro", alias_name="lum_sum"))
    import pandas as pd
    nv, nf, bt = int(m["nv"]), int(m["nf"]), int(m["bt"])
    ns = int(a["n_sampled"])
    return pd.DataFrame({
        "n_videos": [nv], "n_frames_total": [nf], "n_sampled": [ns],
        "mean_lum_micro": [int(a["lum_sum"]) // ns],
        "mean_video_bytes": [bt // nv],
    }).astype("int64")


def _avi_dup_corpus_dir(n_base: int = 36, dup_every: int = 3,
                        frames_per_video: int = 8) -> str:
    """AVI near-dup plan: base MJPEG videos (as _avi_corpus_dir, seed
    17) plus, for every dup_every-th base, a planted near-duplicate
    `<id>_re`: every frame full-decoded and re-encoded at q70 — the
    transcode-copy case a video dedup pipeline must catch."""
    from .. import corpus as corpus_mod
    from .. import avi as avi_mod
    from .. import jpeg as jpeg_mod

    out = f"/tmp/destor_ray_avi_dup/n{n_base}_d{dup_every}_f{frames_per_video}"
    if os.path.isdir(out):
        return out
    import numpy as np
    ids, blobs, nframes = [], [], []
    for i in range(n_base):
        px, w, h, _, _ = corpus_mod._base_pixels(seed=17, row=i)
        frames = []
        for j in range(frames_per_video):
            fr = np.roll(px, shift=3 * j, axis=1).astype(np.int16)
            fr = np.clip(fr + 4 * j, 0, 255).astype(np.uint8)
            frames.append(jpeg_mod.encode(fr, quality=85))
        ids.append(f"avi{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(frames, w=w, h=h, fps=10))
        nframes.append(frames_per_video)
        if i % dup_every == 0:
            re = [jpeg_mod.encode(jpeg_mod.decode(f), quality=70)
                  for f in frames]
            ids.append(f"avi{i:05d}_re")
            blobs.append(avi_mod.encode_mjpeg(re, w=w, h=h, fps=10))
            nframes.append(frames_per_video)
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "n_frames": pa.array(nframes, pa.int32()),
    })})


def _slot_video_pairs(ds, k_frames: int = 4,
                      psnr_min_centi: int = 2800, min_slots: int = 3,
                      num_buckets: int = 8, decode: str = "dc"):
    """The k-slot DC-thumb video dedup core shared by avi_video_dedup,
    framerate_video_dedup and resolution_video_dedup: container walk +
    decode of k frames sampled at RELATIVE positions (j·nf)//k,
    per-frame dual phash+aHash 8×8-bit bands, slot-majority thumb-PSNR
    verify (≥ min_slots of k slots clear the gate). Returns the
    deduped pandas pair frame plus the pre-dedup candidate count.

    Sampling by relative position makes the signature FRAME-RATE
    INVARIANT by construction: for two encodings of the same content
    at the same wall duration T, slot j lands at time (j·⌊T·fps⌋//k)
    / fps ≈ j·T/k on both sides regardless of fps — certified by
    framerate_video_dedup.

    decode="dc" (default) never entropy-decodes past the DC
    coefficients — the cheap path, but its 32×32 gray is an NN resample
    of the (h/8, w/8) DC grid, whose box-mean BLOCK SCALE tracks the
    encoded resolution: MEASURED (resolution_video_dedup ladder), a
    half-res re-render drops slot thumb PSNR to 18.1 dB min / 0 slots
    past the 28 gate and a quarter-res one loses even banding (0 band
    collisions vs the distinct background's max 3) — the DC path is
    resolution-BLIND. decode="full-box" fully decodes the k slot
    frames only (bounded full decodes, the letterbox channel's cost
    class) and takes _box_thumb32 area averages over the full-res
    luma, which are resolution-invariant by construction: true-pair
    slot PSNR ≥ 26.3 dB across half/quarter/2×-up/NN-2/3 re-renders
    vs distinct ≤ 18.2 (band collisions ≥ 20/64 vs ≤ 3)."""
    from .. import avi as avi_mod
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    full_box = decode == "full-box"

    class VideoDCSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids, phs, ahs, thumbs = [], [], [], []
            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = avi_mod.decode_frames(data)
                nf = len(frames)
                k = min(k_frames, nf)
                grays = []
                tb = b""
                for j in range(k):
                    if full_box:
                        g = codec.to_gray(
                            jpeg.decode(frames[(j * nf) // k]))
                        t32, t16 = _box_thumbs(g, (32, 16))
                        grays.append(t32)
                        tb += t16.tobytes()
                        continue
                    dc = jpeg.decode_dc_luma(frames[(j * nf) // k])
                    grays.append(codec.resize_nn(dc, 32, 32))
                    tb += codec.resize_nn(dc, 16, 16).tobytes()
                stack = np.stack(grays)
                vids.append(vid)
                phs.append(codec.phash64_batch(stack))
                ahs.append(codec.ahash64_batch(stack))
                thumbs.append(tb)
            n = len(vids)
            ph = np.stack(phs) if n else np.empty((0, k_frames), np.int64)
            ah = np.stack(ahs) if n else np.empty((0, k_frames), np.int64)
            return pa.table({
                "video_id": pa.array(vids, pa.string()),
                "phash": pa.array(list(ph), pa.list_(pa.int64())),
                "ahash": pa.array(list(ah), pa.list_(pa.int64())),
                "thumbs": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(VideoDCSignature, batch_size=16, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        keys, vids, thumbs = [], [], []
        mask = np.uint64((1 << BITS) - 1)
        tcol = batch["thumbs"].to_pylist()
        idcol = batch["video_id"].to_pylist()
        for ch, col in enumerate(("phash", "ahash")):
            hl = batch[col].to_pylist()
            for row, hs in enumerate(hl):
                hv = np.array(hs, np.int64).view(np.uint64)
                for fi, h in enumerate(hv):
                    for band in range(N_BANDS):
                        bits = int((h >> np.uint64(BITS * band)) & mask)
                        slot = (ch * k_frames + fi) * N_BANDS + band
                        keys.append((slot << BITS) | bits)
                        vids.append(idcol[row])
                        thumbs.append(tcol[row])
        return pa.table({
            "bkey": pa.array(keys, pa.int64()),
            "video_id": pa.array(vids, pa.string()),
            "thumbs": pa.array(thumbs, pa.binary()),
        })

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        return _slot_verify_bucket(df, psnr_min_centi, min_slots)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=num_buckets).to_pandas()
    n_cand = len(pairs)
    return pairs.drop_duplicates(["l", "r"]), n_cand


def avi_video_dedup(sf_dir: str, n_base: int = 36, dup_every: int = 3,
                    k_frames: int = 4, psnr_min_centi: int = 2800,
                    min_slots: int = 3):
    """(n_videos, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — NEAR-DUP VIDEO detection over real
    MJPEG AVI files: the flagship image-dedup machinery lifted one
    level (a video is a sampled SET of frames; a transcode copy shares
    near-identical frames at every sampled slot). The signature stage
    is container walk + DC-ONLY decode of k sampled frames per video
    (no IDCT, no full decode, the other N−k frames never entropy-
    decoded), per-frame dual phash+aHash 8×8-bit LSH bands (the
    independent-flip union jfif_dc_dedup measured), and verify runs
    slot-aligned thumb PSNR over the k DC thumbs that ride the band
    rows — a pair is a duplicate when ≥ min_slots of k slots clear the
    PSNR gate, so a single coincidentally-similar frame cannot merge
    two distinct videos. One band-keyed exchange + one tiny pair
    groupby; payloads never shuffle.

    At corpus scale the k-thumb band payload (k·256 B) is the
    volume term — the pair-rendezvous variant (candidates only in the
    band exchange, thumbs attached by two endpoint-keyed joins)
    applies unchanged when the network is the binding resource
    (NOTES.md lever #1)."""
    d = _avi_dup_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet",
                               columns=["video_id", "bytes"])
    n_planted = -(-n_base // dup_every)
    n_videos = n_base + n_planted

    pairs, n_cand = _slot_video_pairs(
        ds, k_frames=k_frames, psnr_min_centi=psnr_min_centi,
        min_slots=min_slots)
    truth = {(f"avi{i:05d}", f"avi{i:05d}_re")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_videos", n_videos, n_planted, n_cand, got, truth)


_FPS_KINDS = ("fps5", "fps12", "fps15", "fps25")
_FPS_NF = {"fps5": 4, "fps12": 10, "fps15": 12, "fps25": 20}


def _framerate_frame(px: np.ndarray, t: float) -> np.ndarray:
    """Frame of the continuous motion model at wall time t seconds:
    horizontal pan at 30 px/s + brightness ramp at 40 levels/s —
    the TIME-parameterized version of _avi_dup_corpus_dir's per-frame
    model, so any frame rate samples the same underlying content."""
    fr = np.roll(px, shift=int(round(30.0 * t)), axis=1).astype(np.int16)
    return np.clip(fr + int(round(40.0 * t)), 0, 255).astype(np.uint8)


def _framerate_corpus_dir(n_base: int = 32, dup_every: int = 2,
                          base_nf: int = 8) -> str:
    """AVI fixture WITH PLANTED FRAME-RATE-RESAMPLED near-dups: base
    videos at 10 fps (8 frames, T=0.8 s), and every dup_every-th base
    re-rendered from the SAME continuous motion model at a different
    frame rate cycling 5 / 12.5 / 15 / 25 fps (4 / 10 / 12 / 20
    frames over the same wall duration), re-encoded q70. Truth rides
    the naming: "fr<i>_<kind>" duplicates "fr<i>"."""
    from .. import avi as avi_mod
    from .. import corpus as corpus_mod
    from .. import jpeg as jpeg_mod

    out = f"/tmp/destor_ray_fpsdup/v1_n{n_base}_d{dup_every}_f{base_nf}"
    if os.path.isdir(out):
        return out
    T = base_nf / 10.0
    ids, blobs = [], []
    for i in range(n_base):
        px, w, h, _, _ = corpus_mod._base_pixels(seed=19, row=i)
        frames = [jpeg_mod.encode(_framerate_frame(px, j / 10.0), 85)
                  for j in range(base_nf)]
        ids.append(f"fr{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(frames, w=w, h=h, fps=10))
        if i % dup_every == 0:
            k = i // dup_every
            kind = _FPS_KINDS[k % len(_FPS_KINDS)]
            nf = _FPS_NF[kind]
            dupf = [jpeg_mod.encode(_framerate_frame(px, j * T / nf), 70)
                    for j in range(nf)]
            ids.append(f"fr{i:05d}_{kind}")
            blobs.append(avi_mod.encode_mjpeg(
                dupf, w=w, h=h, fps=max(1, nf * 10 // base_nf)))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def framerate_video_dedup(sf_dir: str, n_base: int = 32,
                          dup_every: int = 2, k_frames: int = 4,
                          psnr_min_centi: int = 2800,
                          min_slots: int = 3):
    """(kind, n_planted, n_found, n_false, recall_ppm) per frame-rate
    class + "_total" — CERTIFIES that the k-slot DC-thumb video
    channel is FRAME-RATE INVARIANT BY CONSTRUCTION: slots sample at
    RELATIVE positions (j·nf)//k, so two renderings of the same
    content at the same wall duration land their slots at (nearly)
    the same times regardless of fps — no normalization stage needed,
    unlike the audio sample-rate class (samplerate_audio_dedup, where
    Haitsma-Kalker words moved 30/60 bits until a canonical-rate
    resample was inserted). The 12.5 fps class is the adversarial
    one: ⌊j·10/4⌋ slots land up to 0.04 s off the base's slot times,
    i.e. the verify must absorb one motion step (≈1 px pan + 2
    brightness levels at this model) — which the 28 dB slot-PSNR gate
    does with margin; 5/15/25 fps divide evenly and reduce to pure
    re-encode at the slot times. A frame-rate change that ALSO
    changes wall duration is a speed change — that is
    timescale_video_dedup's class, not this one (documented
    boundary).

    Scale shape: identical to avi_video_dedup (shared
    _slot_video_pairs core) — one DC-only decode pass, one band
    exchange, one pair groupby; full frames never shuffle."""
    d = _framerate_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")
    pairs, _ = _slot_video_pairs(
        ds, k_frames=k_frames, psnr_min_centi=psnr_min_centi,
        min_slots=min_slots)
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _FPS_KINDS}
    for i in range(0, n_base, dup_every):
        k = i // dup_every
        kind = _FPS_KINDS[k % len(_FPS_KINDS)]
        truth_by_kind[kind].add((f"fr{i:05d}", f"fr{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _FPS_KINDS)


_RES_KINDS = ("half", "quarter", "up2", "nn23")


def _res_transform(px: np.ndarray, kind: str) -> np.ndarray:
    """Spatial re-render of a frame: box-mean half/quarter res (the
    player/proxy downscale), 2× pixel replication (the naive
    upscaled re-upload), NN point-sample to 2/3 (the cheap aliasing
    resize low-end encoders apply)."""
    from .. import codec
    if kind == "half":
        return _downscale_box2(px)
    if kind == "quarter":
        return _downscale_box2(_downscale_box2(px))
    if kind == "up2":
        return np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
    if kind == "nn23":
        h, w = px.shape[:2]
        return codec.resize_nn(px, (2 * h) // 3, (2 * w) // 3)
    raise ValueError(kind)


def _resolution_corpus_dir(n_base: int = 32, dup_every: int = 2,
                           base_nf: int = 8) -> str:
    """AVI fixture WITH PLANTED RESOLUTION-RE-RENDERED near-dups:
    base videos at 10 fps / native ≥64 px resolution (sub-64 bases
    are 2× replicated up so a quarter-res dup keeps a non-degenerate
    frame), and every dup_every-th base re-rendered frame-by-frame at
    a different spatial resolution cycling half / quarter / 2×-up /
    NN-2/3, re-encoded q70. Truth rides the naming: "rs<i>_<kind>"
    duplicates "rs<i>"."""
    from .. import avi as avi_mod
    from .. import corpus as corpus_mod
    from .. import jpeg as jpeg_mod

    out = f"/tmp/destor_ray_resdup/v1_n{n_base}_d{dup_every}_f{base_nf}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _, _, _, _ = corpus_mod._base_pixels(seed=23, row=i)
        while min(px.shape[:2]) < 64:
            px = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
        h, w = px.shape[:2]
        frames = [jpeg_mod.encode(_framerate_frame(px, j / 10.0), 85)
                  for j in range(base_nf)]
        ids.append(f"rs{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(frames, w=w, h=h, fps=10))
        if i % dup_every == 0:
            kind = _RES_KINDS[(i // dup_every) % len(_RES_KINDS)]
            dpx = [_res_transform(_framerate_frame(px, j / 10.0), kind)
                   for j in range(base_nf)]
            dh, dw = dpx[0].shape[:2]
            dupf = [jpeg_mod.encode(f, 70) for f in dpx]
            ids.append(f"rs{i:05d}_{kind}")
            blobs.append(avi_mod.encode_mjpeg(dupf, w=dw, h=dh, fps=10))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def resolution_video_dedup(sf_dir: str, n_base: int = 32,
                           dup_every: int = 2, k_frames: int = 4,
                           psnr_min_centi: int = 2500,
                           min_slots: int = 3):
    """(kind, n_planted, n_found, n_false, recall_ppm) per resolution
    class + "_total" — SPATIAL-RESOLUTION-invariant video near-dup
    detection (the 1080p→720p re-upload, THE most common real video
    re-encode class). The DC-only slot channel is MEASURED BLIND
    here: its 32×32 gray NN-resamples the (h/8, w/8) DC grid, whose
    box-mean block scale tracks the encoded resolution, so a half-res
    re-render keeps only 18.1 dB min slot PSNR / 0 of 4 slots past
    the 28 gate and quarter-res loses banding outright (0 collisions
    vs the distinct background's max 3). The fix is the image resize
    channel's recipe lifted per-slot: decode="full-box" fully decodes
    ONLY the k sampled frames (bounded full decodes — the letterbox
    channel's cost class; the other N−k frames still never
    entropy-decode) and hashes/verifies _box_thumb32 AREA AVERAGES of
    the full-res luma, which are scale-invariant by construction.
    MEASURED at this fixture: true-pair slot PSNR ≥ 26.3 dB across
    half / quarter / 2×-up / NN-2/3 (the NN-2/3 class aliases — point
    sampling drops rows — and sets the floor; box-mean classes sit
    ≥ 39.4) vs distinct ≤ 18.2, hence the 25 dB slot gate (8 dB
    clearance); band collisions ≥ 20/64 vs distinct ≤ 3/64.

    Scale shape: identical to avi_video_dedup — one decode pass, one
    band exchange, one pair groupby; full frames never shuffle. In
    the omni composition this channel's bands would ride the same
    unified exchange under their own channel id; a router can skip it
    when both headers agree on (w, h) AND the DC channel already
    matched, but cross-resolution recall REQUIRES it."""
    d = _resolution_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")
    pairs, _ = _slot_video_pairs(
        ds, k_frames=k_frames, psnr_min_centi=psnr_min_centi,
        min_slots=min_slots, decode="full-box")
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _RES_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _RES_KINDS[(i // dup_every) % len(_RES_KINDS)]
        truth_by_kind[kind].add((f"rs{i:05d}", f"rs{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _RES_KINDS)


def video_frame_stats(sf_dir: str, n_videos: int = 256):
    """(n_frames, n_videos, n_sampled, mean_lum_micro) — the VIDEO
    multimodal path as a driver-visible query: binary payloads fan out
    through the VideoFrameSample actor pool (decoder="fake" — the
    ffmpeg seam is the declared stub; everything Ray-side is real:
    flat-map expansion, actor-pool batching, grayscale thumb layout)
    and the sampled frames aggregate per source frame count.
    Deterministic end-to-end (Philox frames keyed on payload hash), so
    the exact pytest pins every column; `sf_dir` is unused but keeps
    the standard queries() signature."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    from ..stages.multimodal import video_frame_samples

    vids = ray.data.read_parquet(_video_corpus_dir(n_videos))
    nf_by_vid = ray.data.read_parquet(
        _video_corpus_dir(n_videos), columns=["video_id", "n_frames"])
    frames = video_frame_samples(vids, concurrency=2, batch_size=32)

    def narrow(batch: pa.Table) -> pa.Table:
        # fixed-size thumbs: one frombuffer over the concatenated
        # binary column, row means vectorized
        raw = np.frombuffer(b"".join(batch["frame_thumb"].to_pylist()),
                            np.uint8)
        px = raw.reshape(batch.num_rows, -1)
        lum = (px.sum(axis=1, dtype=np.int64) * 1_000_000
               // px.shape[1])
        return pa.table({
            "video_id": batch["video_id"],
            "lum_micro": pa.array(lum, pa.int64()),
        })

    # frames carry no n_frames column — join it back via a broadcast of
    # the (tiny) id→n_frames map; at scale this map is one int per
    # video, ~16 B/row, broadcastable far past the payload scale
    import ray as _ray
    m = nf_by_vid.to_pandas()
    nf_ref = _ray.put(dict(zip(m["video_id"], m["n_frames"].astype(int))))

    def tag(batch: pa.Table) -> pa.Table:
        d = _ray.get(nf_ref)
        nf = np.array([d[v] for v in batch["video_id"].to_pylist()],
                      np.int64)
        return batch.append_column("n_frames", pa.array(nf, pa.int64()))

    agg = frames.map_batches(narrow, batch_format="pyarrow") \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("n_frames").aggregate(
            Count(alias_name="n_sampled"),
            Sum("lum_micro", alias_name="lum_sum"))

    def final(b: pa.Table) -> pa.Table:
        ns = pc.cast(b["n_sampled"], pa.int64()).to_numpy(
            zero_copy_only=False)
        ls = pc.cast(b["lum_sum"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "n_frames": pc.cast(b["n_frames"], pa.int64()),
            "n_videos": pa.array(ns // 3, pa.int64()),  # 3 samples/video
            "n_sampled": pa.array(ns, pa.int64()),
            "mean_lum_micro": pa.array(ls // ns, pa.int64()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def _jfif_corpus_dir(n_images: int = 256, quality: int = 85) -> str:
    """Deterministic cached corpus of REAL baseline JFIF JPEGs
    (destor_ray.jpeg encoder over the procedural corpus pixels) — the
    fixture that proves the engine ingests interchange-format JPEG, not
    just its own containers. Round 3: the fixture mixes chroma
    subsampling AND scan modes the way a real crawl does — i%4==1 →
    4:2:0 (the near-universal camera/web mode), i%4==3 → 4:2:2, else
    4:4:4; every 5th image is PROGRESSIVE (SOF2, ~real-web share) — so
    every JFIF-consuming query exercises the subsampled and
    progressive decode paths."""
    from .. import corpus as corpus_mod

    out = f"/tmp/destor_ray_jfif/n{n_images}_q{quality}_mix420p"
    if os.path.isdir(out):
        return out
    from ..jpeg import encode as jfif_encode
    from ..jpeg import encode_progressive as jfif_encode_prog
    ids, blobs, ws, hs, subs = [], [], [], [], []
    for i in range(n_images):
        px, w, h, _, _ = corpus_mod._base_pixels(seed=7, row=i)
        sub = {1: "420", 3: "422"}.get(i % 4, "444")
        enc = jfif_encode_prog if i % 5 == 0 else jfif_encode
        ids.append(f"jf{i:05d}")
        blobs.append(enc(px, quality, subsampling=sub))
        ws.append(w)
        hs.append(h)
        subs.append(sub + ("p" if i % 5 == 0 else ""))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "subsampling": pa.array(subs, pa.string()),
    })})


def jfif_decode_stats(sf_dir: str, n_images: int = 256):
    """(w, h, n_images, mean_lum_micro) — REAL JPEG ingestion: a corpus
    of interchange-format baseline JFIF files (SOI/DQT/SOF0/DHT/SOS,
    Annex K tables — any standard viewer opens them) decoded by the
    SAME ImageDecodeResize actor pool the flagship uses (codec.decode
    dispatches on the 0xFFD8 signature), aggregated per source
    dimension. Closes the round-1 "a real corpus would not decode"
    gap end-to-end in Ray; per-image PSNR vs the generator pixels is
    pinned by tests/test_jpeg.py. `sf_dir` unused (cached deterministic
    fixture), standard queries() signature."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    from ..stages.multimodal import ImageDecodeResize

    ds = ray.data.read_parquet(f"{_jfif_corpus_dir(n_images)}/images.parquet")
    thumbs = ds.map_batches(ImageDecodeResize, batch_format="pyarrow",
                            batch_size=64, concurrency=2,
                            fn_constructor_kwargs={"out_size": 16})

    def narrow(batch: pa.Table) -> pa.Table:
        raw = np.frombuffer(b"".join(batch["thumb"].to_pylist()), np.uint8)
        px = raw.reshape(batch.num_rows, -1)
        lum = (px.sum(axis=1, dtype=np.int64) * 1_000_000
               // px.shape[1])
        return pa.table({
            "w": pc.cast(batch["w"], pa.int64()),
            "h": pc.cast(batch["h"], pa.int64()),
            "lum_micro": pa.array(lum, pa.int64()),
        })

    agg = thumbs.map_batches(narrow, batch_format="pyarrow") \
        .groupby(["w", "h"]).aggregate(
            Count(alias_name="n_images"),
            Sum("lum_micro", alias_name="lum_sum"))
    return agg.map_batches(
        lambda b: pa.table({
            "w": b["w"], "h": b["h"],
            "n_images": pc.cast(b["n_images"], pa.int64()),
            "mean_lum_micro": pa.array(
                pc.cast(b["lum_sum"], pa.int64()).to_numpy(
                    zero_copy_only=False)
                // pc.cast(b["n_images"], pa.int64()).to_numpy(
                    zero_copy_only=False), pa.int64()),
        }), batch_format="pyarrow")


def _corrupt_jfif_corpus_dir(n_images: int = 256, n_corrupt: int = 32) -> str:
    """The JFIF fixture with deterministically planted corruption:
    every 8th payload is truncated / bit-flipped / replaced with
    garbage — the poison-row fixture for the quarantine path."""
    import hashlib

    src = _jfif_corpus_dir(n_images)
    # cache key carries the SOURCE fixture tag so a source-mix change
    # (e.g. the round-3 420/progressive mix) busts this cache too
    out = (f"/tmp/destor_ray_jfif_bad/"
           f"{os.path.basename(src)}_c{n_corrupt}")
    if os.path.isdir(out):
        return out
    import pyarrow.parquet as pq_
    t = pq_.read_table(f"{src}/images.parquet")
    blobs = t["bytes"].to_pylist()
    for j in range(n_corrupt):
        i = j * (n_images // n_corrupt)
        mode = j % 3
        if mode == 0:
            blobs[i] = blobs[i][:len(blobs[i]) // 2]      # truncated
        elif mode == 1:
            blobs[i] = hashlib.md5(str(i).encode()).digest() * 4  # garbage
        else:
            b = bytearray(blobs[i])
            b[0] = 0x00                                    # broken SOI
            blobs[i] = bytes(b)
    return _commit_fixture(out, {"images": pa.table({
        "image_id": t["image_id"],
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _gif_corpus_dir(n_images: int = 192) -> str:
    """Deterministic cached corpus of REAL GIF89a files: the procedural
    corpus pixels quantized to the 3-3-2 RGB cube (the classic web-GIF
    palette), every 3rd file interlaced — the fixture that proves the
    engine ingests the third ubiquitous web image format."""
    from .. import corpus as corpus_mod
    from .. import gif as gif_mod

    out = f"/tmp/destor_ray_gif/n{n_images}_v1"
    if os.path.isdir(out):
        return out
    # 3-3-2 palette: index = r3 g3 b2 bit-packed
    rr = (np.arange(256) >> 5) & 7
    gg = (np.arange(256) >> 2) & 7
    bb = np.arange(256) & 3
    palette = np.stack([rr * 36, gg * 36, bb * 85], axis=1) \
        .astype(np.uint8)
    ids, blobs, ws, hs, ils = [], [], [], [], []
    for i in range(n_images):
        px, w, h, _, _ = corpus_mod._base_pixels(seed=11, row=i)
        idx = ((px[:, :, 0] >> 5).astype(np.uint8) << 5
               | (px[:, :, 1] >> 5) << 2 | (px[:, :, 2] >> 6))
        il = i % 3 == 0
        ids.append(f"gf{i:05d}")
        blobs.append(gif_mod.encode(idx, palette, interlace=il))
        ws.append(w)
        hs.append(h)
        ils.append(il)
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "interlaced": pa.array(ils, pa.bool_()),
    })})


def gif_decode_stats(sf_dir: str, n_images: int = 192):
    """(w, h, n_images, mean_lum_micro) — REAL GIF ingestion: a corpus
    of interchange-format GIF89a files (variable-width LZW, 3-3-2
    palette, a third of them Adam-style row-interlaced) decoded by the
    SAME ImageDecodeResize actor pool the flagship uses (codec.decode
    dispatches on the GIF signature), aggregated per source dimension
    — the GIF twin of jfif_decode_stats. `sf_dir` unused (cached
    deterministic fixture), standard queries() signature."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    from ..stages.multimodal import ImageDecodeResize

    ds = ray.data.read_parquet(f"{_gif_corpus_dir(n_images)}/images.parquet")
    thumbs = ds.map_batches(ImageDecodeResize, batch_format="pyarrow",
                            batch_size=64, concurrency=2,
                            fn_constructor_kwargs={"out_size": 16})

    def narrow(batch: pa.Table) -> pa.Table:
        raw = np.frombuffer(b"".join(batch["thumb"].to_pylist()), np.uint8)
        px = raw.reshape(batch.num_rows, -1)
        lum = (px.sum(axis=1, dtype=np.int64) * 1_000_000
               // px.shape[1])
        return pa.table({
            "w": pc.cast(batch["w"], pa.int64()),
            "h": pc.cast(batch["h"], pa.int64()),
            "lum_micro": pa.array(lum, pa.int64()),
        })

    agg = thumbs.map_batches(narrow, batch_format="pyarrow") \
        .groupby(["w", "h"]).aggregate(
            Count(alias_name="n_images"),
            Sum("lum_micro", alias_name="lum_sum"))
    return agg.map_batches(
        lambda b: pa.table({
            "w": b["w"], "h": b["h"],
            "n_images": pc.cast(b["n_images"], pa.int64()),
            "mean_lum_micro": pa.array(
                pc.cast(b["lum_sum"], pa.int64()).to_numpy(
                    zero_copy_only=False)
                // pc.cast(b["n_images"], pa.int64()).to_numpy(
                    zero_copy_only=False), pa.int64()),
        }), batch_format="pyarrow")


_GIFD_KINDS = ("perm", "depth", "inter")
_PAL332 = np.stack([((np.arange(256) >> 5) & 7) * 36,
                    ((np.arange(256) >> 2) & 7) * 36,
                    (np.arange(256) & 3) * 85], 1).astype(np.uint8)
_PAL222 = np.stack([((np.arange(64) >> 4) & 3) * 85,
                    ((np.arange(64) >> 2) & 3) * 85,
                    (np.arange(64) & 3) * 85], 1).astype(np.uint8)


def _gifdup_corpus_dir(n_base: int = 96, dup_every: int = 3) -> str:
    """GIF fixture WITH PLANTED RE-SAVE near-dups, one class per slot
    (cycling): `perm` — palette randomly PERMUTED and indices remapped
    (pixel-identical bytes-different re-save, what every optimizer
    emits); `depth` — re-quantized to the 64-color 2-2-2 cube (the
    'reduce colors' re-save, lossy); `inter` — re-encoded interlaced
    (pixel-identical, different scanline layout). Truth rides the
    naming: gd<NNNNN>_<kind> duplicates gd<NNNNN>."""
    from .. import corpus as corpus_mod
    from .. import gif as gif_mod

    out = f"/tmp/destor_ray_gifdup/v1_n{n_base}_e{dup_every}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=11, row=i)
        idx = ((px[:, :, 0] >> 5).astype(np.uint8) << 5
               | (px[:, :, 1] >> 5) << 2 | (px[:, :, 2] >> 6))
        ids.append(f"gd{i:05d}")
        blobs.append(gif_mod.encode(idx, _PAL332))
        if i % dup_every:
            continue
        kind = _GIFD_KINDS[(i // dup_every) % len(_GIFD_KINDS)]
        if kind == "perm":
            rng = np.random.default_rng(1000 + i)
            perm = rng.permutation(256).astype(np.uint8)
            inv = np.empty(256, np.uint8)
            inv[perm] = np.arange(256, dtype=np.uint8)
            blob = gif_mod.encode(inv[idx], _PAL332[perm])
        elif kind == "depth":
            rgb = _PAL332[idx]
            idx2 = ((rgb[:, :, 0] >> 6).astype(np.uint8) << 4
                    | (rgb[:, :, 1] >> 6) << 2 | (rgb[:, :, 2] >> 6))
            blob = gif_mod.encode(idx2, _PAL222)
        else:
            blob = gif_mod.encode(idx, _PAL332, interlace=True)
        ids.append(f"gd{i:05d}_{kind}")
        blobs.append(blob)
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def gif_palette_dedup(sf_dir: str, n_base: int = 96, dup_every: int = 3,
                      psnr_min_centi: int = 2100):
    """(kind, n_planted, n_found, n_false, recall_ppm) — GIF RE-SAVE
    near-dup detection: the three re-save classes a GIF corpus
    actually accumulates (palette permutation, color-depth reduction,
    interlace re-layout) detected by the flagship topology over
    DECODED pixels — decoding maps palette indices back to RGB, so
    palette-space differences vanish by construction and only the
    depth class is lossy. Dual phash+aHash 8×8-bit bands over the
    32×32 gray; 16×16 thumbs ride the band rows; PSNR gate at 21 dB —
    MEASURED: depth-reduced true pairs hold ≥ 23.6 dB vs distinct
    ≤ 19.2 (2.1 / 2.4 dB clearance; perm and inter re-saves are
    pixel-identical, PSNR ∞). One decode pass, one band exchange, one
    pair groupby — payloads never shuffle; per-class recall 1.0, zero
    false merges (pytest-pinned)."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _gifdup_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")

    class GifSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            grays, thumbs = [], []
            for data in batch["bytes"].to_pylist():
                g = codec.to_gray(codec.decode(data))
                grays.append(codec.resize_nn(g, 32, 32))
                thumbs.append(codec.resize_nn(g, 16, 16).tobytes())
            stack = np.stack(grays) if ids else \
                np.empty((0, 32, 32), np.uint8)
            ph = codec.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(GifSignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("thumb",), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    verify_bucket = _psnr_verify_bucket("image_id", psnr_min_centi)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    pairs = pairs.drop_duplicates(["l", "r"])
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _GIFD_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _GIFD_KINDS[(i // dup_every) % len(_GIFD_KINDS)]
        truth_by_kind[kind].add((f"gd{i:05d}", f"gd{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _GIFD_KINDS)


_GIFA_KINDS = ("depth", "drop", "perm")


def _gifanim_corpus_dir(n_base: int = 36, dup_every: int = 3,
                        n_frames: int = 8) -> str:
    """Animated-GIF fixture WITH PLANTED RE-UPLOAD near-dups, one class
    per slot (cycling): `depth` — every frame re-quantized to the
    2-2-2 cube; `drop` — every 2nd frame dropped (the frame-rate
    halving re-encode); `perm` — palette permuted, indices remapped
    (pixel-identical). Base animation i: the seed-11 procedural image
    translated 5 px/frame (pure content motion, deterministic)."""
    from .. import corpus as corpus_mod
    from .. import gif as gif_mod

    out = (f"/tmp/destor_ray_gifanim/"
           f"v1_n{n_base}_e{dup_every}_f{n_frames}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=11, row=i)
        idx0 = ((px[:, :, 0] >> 5).astype(np.uint8) << 5
                | (px[:, :, 1] >> 5) << 2 | (px[:, :, 2] >> 6))
        frames = [np.roll(idx0, 5 * t, axis=1) for t in range(n_frames)]
        ids.append(f"ga{i:05d}")
        blobs.append(gif_mod.encode_animation(frames, _PAL332))
        if i % dup_every:
            continue
        kind = _GIFA_KINDS[(i // dup_every) % len(_GIFA_KINDS)]
        if kind == "depth":
            dframes = []
            for fr in frames:
                rgb = _PAL332[fr]
                dframes.append(
                    ((rgb[:, :, 0] >> 6).astype(np.uint8) << 4
                     | (rgb[:, :, 1] >> 6) << 2 | (rgb[:, :, 2] >> 6)))
            blob = gif_mod.encode_animation(dframes, _PAL222)
        elif kind == "drop":
            blob = gif_mod.encode_animation(frames[::2], _PAL332)
        else:
            rng = np.random.default_rng(2000 + i)
            perm = rng.permutation(256).astype(np.uint8)
            inv = np.empty(256, np.uint8)
            inv[perm] = np.arange(256, dtype=np.uint8)
            blob = gif_mod.encode_animation([inv[fr] for fr in frames],
                                            _PAL332[perm])
        ids.append(f"ga{i:05d}_{kind}")
        blobs.append(blob)
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def gif_animation_dedup(sf_dir: str, n_base: int = 36,
                        dup_every: int = 3, k_frames: int = 4,
                        psnr_min_centi: int = 2100,
                        min_slots: int = 3):
    """(kind, n_planted, n_found, n_false, recall_ppm) — ANIMATED-GIF
    near-dup detection: the k-slot relative-position sampling of the
    video channels (avi_video_dedup's topology) applied to GIF
    animations. Slot j samples frame (j·nf)//k, so the `drop`
    (frame-rate halving) class aligns by construction — the dropped
    copy's slots land on the SAME content frames; `perm` decodes to
    identical pixels; `depth` is the lossy class and sets the gate
    (the static channel's measured 23.6-vs-19.2 dB ladder applies
    per slot; 21 dB gate, ≥ 3/4 slot majority so no single similar
    frame merges two animations). One decode pass, one slot-tagged
    band exchange, one pair groupby; frames never shuffle — slot
    thumbs (k×256 B) ride the band rows."""
    from .. import codec
    from .. import gif as gif_mod
    from ..stages.grouped import bucketed_group_map

    d = _gifanim_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")

    class GifAnimSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids, phs, ahs, thumbs = [], [], [], []
            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = gif_mod.decode_frames(data)
                nf = len(frames)
                k = min(k_frames, nf)
                grays, tb = [], b""
                for j in range(k):
                    g = codec.to_gray(frames[(j * nf) // k])
                    grays.append(codec.resize_nn(g, 32, 32))
                    tb += codec.resize_nn(g, 16, 16).tobytes()
                stack = np.stack(grays)
                vids.append(vid)
                phs.append(codec.phash64_batch(stack))
                ahs.append(codec.ahash64_batch(stack))
                thumbs.append(tb)
            n = len(vids)
            ph = np.stack(phs) if n else np.empty((0, k_frames), np.int64)
            ah = np.stack(ahs) if n else np.empty((0, k_frames), np.int64)
            return pa.table({
                "video_id": pa.array(vids, pa.string()),
                "phash": pa.array(list(ph), pa.list_(pa.int64())),
                "ahash": pa.array(list(ah), pa.list_(pa.int64())),
                "thumbs": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(GifAnimSignature, batch_size=32,
                          concurrency=2, batch_format="pyarrow")

    bands = sigs.map_batches(_slot_band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        return _slot_verify_bucket(df, psnr_min_centi, min_slots)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    pairs = pairs.drop_duplicates(["l", "r"])
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _GIFA_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _GIFA_KINDS[(i // dup_every) % len(_GIFA_KINDS)]
        truth_by_kind[kind].add((f"ga{i:05d}", f"ga{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _GIFA_KINDS)



def _slot_band_rows(batch: pa.Table, n_bands: int = 8,
                    bits: int = 8) -> pa.Table:
    """Shared k-slot LSH band fan-out for animation/video channels
    (round-3 harness extraction — gif_animation_dedup and
    crossformat_animation_dedup carried identical copies): per row,
    per hash family (phash/ahash list columns, ragged lengths OK),
    per slot, per band — band key (slotkey << bits) | slice with
    slotkey = (slot*2 + family)*n_bands + band; the packed slot-thumb
    payload rides every band row."""
    keys, vids, thumbs = [], [], []
    mask = np.uint64((1 << bits) - 1)
    tcol = batch["thumbs"].to_pylist()
    idcol = batch["video_id"].to_pylist()
    for ch, col in enumerate(("phash", "ahash")):
        hl = batch[col].to_pylist()
        for r, hv in enumerate(hl):
            hv = np.asarray(hv, np.int64).view(np.uint64)
            for slot in range(len(hv)):
                for band in range(n_bands):
                    bslice = (hv[slot] >> np.uint64(bits * band)) & mask
                    slotkey = ((slot * 2 + ch) * n_bands + band)
                    keys.append((slotkey << bits) | int(bslice))
                    vids.append(idcol[r])
                    thumbs.append(tcol[r])
    return pa.table({
        "bkey": pa.array(keys, pa.int64()),
        "video_id": pa.array(vids, pa.string()),
        "thumbs": pa.array(thumbs, pa.binary()),
    })


def _slot_verify_bucket(df, psnr_min_centi: int, min_slots: int,
                        id_col: str = "video_id",
                        thumbs_col: str = "thumbs"):
    """Shared slot-majority verify for animation/video channels: a
    pair merges when >= min(min_slots, k) of the k aligned slot
    thumbs clear the PSNR gate (k = the shorter reel — a still
    poster frame degrades to the single-slot gate). Vectorized
    (round 4, VERDICT r3 #6): pairs from _group_pairs, ragged slot
    reels padded into one (n, smax, 256) stack, and the per-slot PSNR
    gate runs over ALL pairs at once per slot — Python cost is
    O(rows + slots), not O(sum g^2)."""
    ids, li, ri = _bucket_pairs(df, id_col)
    if not len(li):
        return pa.table({"l": pa.array([], pa.string()),
                         "r": pa.array([], pa.string())})
    raw = [np.frombuffer(t, np.uint8) for t in df[thumbs_col]]
    lens = np.array([len(x) // 256 for x in raw], np.int64)
    smax = int(lens.max())
    mat = np.zeros((len(df), smax, 256), np.uint8)
    for i, x in enumerate(raw):
        mat[i, :lens[i]] = x.reshape(-1, 256)
    k = np.minimum(lens[li], lens[ri])
    good = np.zeros(len(li), np.int64)
    for s in range(smax):
        valid = k > s
        if not valid.any():
            continue
        pc_ = _psnr_centi_pairs(mat[li[valid], s], mat[ri[valid], s])
        good[valid] += pc_ >= psnr_min_centi
    ok = good >= np.minimum(min_slots, k)
    return _emit_pairs(ids, li, ri, ok)


_XANIM_KINDS = ("webp", "avi", "webpdrop", "poster", "webm")


def _xanim_corpus_dir(n_base: int = 36, dup_every: int = 3,
                      n_frames: int = 8) -> str:
    """Cross-CONTAINER animation fixture WITH PLANTED RE-HOST dups,
    one class per slot (cycling): the same animation (procedural
    content translated 5 px/frame, 3-3-2 quantized) published as an
    animated GIF and re-hosted as `webp` (lossless animated WebP —
    pixel-identical frames, what sticker pipelines emit), `avi`
    (MJPEG q85 video — the GIF-to-video transcode every large
    platform applies) or `webpdrop` (animated WebP at half the frame
    count — transcode + frame-rate halving) or reduced to `poster`
    (a still PNG of frame 0 — the preview image platforms generate
    for every animation; k=1 slot aligns with the animation's slot 0
    by construction and verify degrades to the single-slot gate).
    Truth rides the naming: xa<NNNNN>_<kind> duplicates
    xa<NNNNN>."""
    from .. import avi as avi_mod
    from .. import codec as codec_mod
    from .. import corpus as corpus_mod
    from .. import gif as gif_mod
    from .. import jpeg as jpeg_mod
    from .. import webp as webp_mod

    out = (f"/tmp/destor_ray_xanim/"
           f"v3_n{n_base}_e{dup_every}_f{n_frames}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=11, row=i)
        h, w = px.shape[:2]
        idx_frames = []
        for f in range(n_frames):
            sh = np.roll(px, 5 * f, axis=1)
            idx_frames.append(
                (sh[:, :, 0] >> 5).astype(np.uint8) << 5
                | (sh[:, :, 1] >> 5) << 2 | (sh[:, :, 2] >> 6))
        ids.append(f"xa{i:05d}")
        blobs.append(gif_mod.encode_animation(idx_frames, _PAL332))
        if i % dup_every:
            continue
        kind = _XANIM_KINDS[(i // dup_every) % len(_XANIM_KINDS)]
        rgb_frames = [_PAL332[fidx] for fidx in idx_frames]
        if kind == "webp":
            blob = webp_mod.encode_animation(rgb_frames)
        elif kind == "avi":
            blob = avi_mod.encode_mjpeg(
                [jpeg_mod.encode(fr, 85) for fr in rgb_frames], w, h)
        elif kind == "webpdrop":
            blob = webp_mod.encode_animation(rgb_frames[::2])
        elif kind == "webm":
            # the WebM/VP8 re-host (round 5): every frame a VP8 key
            # frame at qindex 8 — the EBML walk + RFC 6386 decode path
            from .. import mkv as mkv_mod
            from .. import vp8 as vp8_mod
            blob = mkv_mod.encode_webm(
                [vp8_mod.encode(fr, qindex=8) for fr in rgb_frames],
                w, h)
        else:  # poster: the platform-generated still preview (frame 0)
            blob = codec_mod.png_encode(rgb_frames[0])
        ids.append(f"xa{i:05d}_{kind}")
        blobs.append(blob)
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def crossformat_animation_dedup(sf_dir: str, n_base: int = 36,
                                dup_every: int = 3, k_frames: int = 4,
                                psnr_min_centi: int = 2100,
                                min_slots: int = 3):
    """(kind, n_planted, n_found, n_false, recall_ppm) — CROSS-
    CONTAINER animation dedup: the same animation re-hosted as
    animated GIF, lossless animated WebP, MJPEG-AVI video (the
    GIF-to-video transcode platforms apply on upload), WebM with VP8
    key frames (round 5 — rides the EBML walk + RFC 6386 decode), or
    reduced to a still poster frame (the generated preview). ONE
    signature stage
    rides codec.decode_frames — the container-agnostic frame
    dispatch — so the channel is gif_animation_dedup's k-slot
    relative-position topology verbatim: slot j samples frame
    (j·nf)//k (frame-count halving aligns by construction), dual
    phash+aHash 8×8-bit bands per slot, k×256 B slot thumbs ride,
    ≥3/4 slot majority at the 21 dB gate (webp re-hosts are
    pixel-identical, PSNR ∞; MJPEG q85 sits far above the gate —
    same ladder as the gif depth class). Per-class recall 1.0, zero
    false merges (pytest-pinned). 100 TB shape: identical to
    avi_video_dedup — one decode pass, one band exchange, payloads
    never shuffle."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _xanim_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")

    class XAnimSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids, phs, ahs, thumbs = [], [], [], []
            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = codec.decode_frames(data)
                nf = len(frames)
                k = min(k_frames, nf)
                grays, tb = [], b""
                for j in range(k):
                    g = codec.to_gray(frames[(j * nf) // k])
                    grays.append(codec.resize_nn(g, 32, 32))
                    tb += codec.resize_nn(g, 16, 16).tobytes()
                stack = np.stack(grays)
                vids.append(vid)
                phs.append([int(v) for v in codec.phash64_batch(stack)])
                ahs.append([int(v) for v in codec.ahash64_batch(stack)])
                thumbs.append(tb)
            # ragged lists: a still poster frame contributes k=1
            # slot hashes next to the animations' k=4
            return pa.table({
                "video_id": pa.array(vids, pa.string()),
                "phash": pa.array(phs, pa.list_(pa.int64())),
                "ahash": pa.array(ahs, pa.list_(pa.int64())),
                "thumbs": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(XAnimSignature, batch_size=32,
                          concurrency=2, batch_format="pyarrow")

    bands = sigs.map_batches(_slot_band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        return _slot_verify_bucket(df, psnr_min_centi, min_slots)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    pairs = pairs.drop_duplicates(["l", "r"])
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _XANIM_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _XANIM_KINDS[(i // dup_every) % len(_XANIM_KINDS)]
        truth_by_kind[kind].add((f"xa{i:05d}", f"xa{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _XANIM_KINDS)


_FMTC_KINDS = ("bmp", "pnm", "tifflzw", "webp", "ico", "tga",
               "jfif", "gifq", "webpv8")


def _fmtconv_corpus_dir(n_base: int = 90, dup_every: int = 3) -> str:
    """Mixed-container fixture WITH PLANTED FORMAT-CONVERSION dups,
    one class per slot (cycling): the SAME picture re-hosted in a
    different container — `bmp` (24-bit BMP), `pnm` (raw P6 PPM),
    `tifflzw` (TIFF, LZW + predictor 2), `webp` (lossless VP8L,
    subtract-green + runs), `ico` (single-entry icon, BMP plane),
    `tga` (RLE Targa): all pixel-lossless, the class a byte-hash
    dedup misses entirely; `jfif` (JPEG q90 re-save), `gifq` (GIF
    after 3-3-2 palette quantization) and `webpv8` (LOSSY WebP — the
    RFC 6386 VP8 key-frame codec, round 4): the lossy conversions.
    Base rows are PNGs. Truth rides the naming:
    fc<NNNNN>_<kind> duplicates fc<NNNNN>."""
    from .. import bmp as bmp_mod
    from .. import codec as codec_mod
    from .. import corpus as corpus_mod
    from .. import gif as gif_mod
    from .. import jpeg as jpeg_mod
    from .. import netpbm as netpbm_mod
    from .. import tiff as tiff_mod
    from .. import webp as webp_mod

    out = f"/tmp/destor_ray_fmtconv/v5_n{n_base}_e{dup_every}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=11, row=i)
        ids.append(f"fc{i:05d}")
        blobs.append(codec_mod.png_encode(px))
        if i % dup_every:
            continue
        kind = _FMTC_KINDS[(i // dup_every) % len(_FMTC_KINDS)]
        if kind == "bmp":
            blob = bmp_mod.encode(px)
        elif kind == "pnm":
            blob = netpbm_mod.encode(px)
        elif kind == "tifflzw":
            blob = tiff_mod.encode(px, compression="lzw",
                                   predictor=True, rows_per_strip=16)
        elif kind == "webp":
            blob = webp_mod.encode(px)
        elif kind == "ico":
            from .. import ico as ico_mod
            blob = ico_mod.encode([px])
        elif kind == "tga":
            from .. import tga as tga_mod
            blob = tga_mod.encode(px, rle=True)
        elif kind == "jfif":
            blob = jpeg_mod.encode(px, 90)
        elif kind == "webpv8":
            blob = webp_mod.encode_lossy(px, qindex=4)
        else:  # gifq
            idx = ((px[:, :, 0] >> 5).astype(np.uint8) << 5
                   | (px[:, :, 1] >> 5) << 2 | (px[:, :, 2] >> 6))
            blob = gif_mod.encode(idx, _PAL332)
        ids.append(f"fc{i:05d}_{kind}")
        blobs.append(blob)
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def format_convert_dedup(sf_dir: str, n_base: int = 90,
                         dup_every: int = 3,
                         psnr_min_centi: int = 2400):
    """(kind, n_planted, n_found, n_false, recall_ppm) — CONTAINER-
    FORMAT-CONVERSION dedup: the same picture re-hosted as BMP / PPM /
    TIFF-LZW (pixel-lossless — invisible to byte-hash dedup, pixel-
    identical after decode) or re-encoded as JPEG q90 / palette-
    quantized GIF / lossy VP8 WebP (lossy). One decode pass through
    the signature actor pool (codec.decode dispatches every
    container incl. the RFC 6386 VP8 path), THREE
    8×8-bit band families — phash, aHash, and the leading 64 bits of
    the decoded-pixel SHA-1 (the exact tier: identical pixels collide
    on every slice; MEASURED: the lossy classes share ≥6 of the 16
    perceptual band slots) — one band exchange, PSNR gate 24 dB
    (MEASURED: true jfif ≥48.6, true gifq ≥28.0 vs distinct ≤21.0 —
    3.0/3.0 dB clearance; lossless classes are PSNR ∞ by
    construction). Per-class recall 1.0, zero false merges
    (pytest-pinned). 100 TB shape: identical to the flagship — narrow
    signature rows, payloads only on band rows, bucketed verify."""
    import hashlib

    from .. import codec as codec_mod
    from ..stages.grouped import bucketed_group_map

    d = _fmtconv_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")

    class ConvSignature:
        def __init__(self):
            codec_mod._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            grays, thumbs, shas = [], [], []
            for data in batch["bytes"].to_pylist():
                px = codec_mod.decode(data)
                shas.append(np.frombuffer(
                    hashlib.sha1(px.tobytes()).digest()[:8],
                    "<i8")[0])
                g = codec_mod.to_gray(px)
                grays.append(codec_mod.resize_nn(g, 32, 32))
                thumbs.append(codec_mod.resize_nn(g, 16, 16).tobytes())
            stack = np.stack(grays) if ids else \
                np.empty((0, 32, 32), np.uint8)
            ph = codec_mod.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec_mod.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "pixsha": pa.array(np.asarray(shas, np.int64),
                                   pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(ConvSignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id",
                               ("phash", "ahash", "pixsha"),
                               ("thumb",), 8, 8)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    verify_bucket = _psnr_verify_bucket("image_id", psnr_min_centi,
                                        with_score=False)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _FMTC_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _FMTC_KINDS[(i // dup_every) % len(_FMTC_KINDS)]
        truth_by_kind[kind].add((f"fc{i:05d}", f"fc{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _FMTC_KINDS)


def image_format_stats(sf_dir: str, n_base: int = 90):
    """(fmt, n, mean_w, mean_h, mean_lum_micro) — uniform ingestion
    across ALL NINE still containers (PNG, JPEG, GIF, BMP, PPM,
    TIFF, lossless WebP, ICO, TGA) through the one codec.decode dispatch: the
    mixed-format fixture
    decoded by an actor pool, per-format counts and integer mean
    luminance. The read-side proof that a crawl's container mix needs
    no per-format pipelines. Rows-only driver check; exact pytest
    pins the per-format counts."""
    from ray.data.aggregate import Count, Sum

    from .. import codec as codec_mod

    d = _fmtconv_corpus_dir(n_base=n_base)
    ds = ray.data.read_parquet(f"{d}/images.parquet")

    class DecodeStats:
        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts, ws, hs, lums = [], [], [], []
            for data in batch["bytes"].to_pylist():
                fmt, _q, w, h = codec_mod.decode_meta(data)
                px = codec_mod.decode(data)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                lums.append(int(px.sum(dtype=np.int64))
                            * 1_000_000 // px.size)
            return pa.table({
                "fmt": pa.array(fmts, pa.string()),
                "w": pa.array(ws, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "lum_micro": pa.array(lums, pa.int64()),
            })

    stats = ds.map_batches(DecodeStats, batch_size=64, concurrency=2,
                           batch_format="pyarrow")
    agg = stats.groupby("fmt").aggregate(
        Count(alias_name="n"), Sum("w", alias_name="w_sum"),
        Sum("h", alias_name="h_sum"),
        Sum("lum_micro", alias_name="lum_sum"))

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b["n"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "fmt": b["fmt"],
            "n": pa.array(n, pa.int64()),
            "mean_w": pa.array(
                pc.cast(b["w_sum"], pa.int64())
                .to_numpy(zero_copy_only=False) // n, pa.int64()),
            "mean_h": pa.array(
                pc.cast(b["h_sum"], pa.int64())
                .to_numpy(zero_copy_only=False) // n, pa.int64()),
            "mean_lum_micro": pa.array(
                pc.cast(b["lum_sum"], pa.int64())
                .to_numpy(zero_copy_only=False) // n, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def decode_quarantine_stats(sf_dir: str, n_images: int = 256,
                            n_corrupt: int = 32):
    """(status, err, n) — the POISON-ROW path: a corpus with planted
    corrupt payloads (truncated JPEG, garbage bytes, broken SOI) flows
    through the ImageDecodeQuarantine actor pool; bad rows route to a
    queryable quarantine slice instead of failing the job (the
    dead-letter discipline a 10^12-row ingest cannot run without).
    Deterministic fixture → exact pytest pins the split; rows-only
    driver check."""
    from ray.data.aggregate import Count

    from ..stages.multimodal import ImageDecodeQuarantine

    d = _corrupt_jfif_corpus_dir(n_images, n_corrupt)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    out = ds.map_batches(ImageDecodeQuarantine, batch_format="pyarrow",
                         batch_size=64, concurrency=2)
    agg = out.groupby(["status", "err"]).aggregate(Count(alias_name="n"))
    return agg.map_batches(
        lambda b: pa.table({
            "status": b["status"], "err": b["err"],
            "n": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow")


def partitioned_write_readback(sf_dir: str, keep_type: str = "purchase"):
    """(event_type, n, sum_value_micro) — the PARTITIONED-WRITE leg of
    the storage contract: events are written once as hive-partitioned
    parquet keyed by event_type (the resumable-output layout every
    stage of the checkpointed job uses), then ONE partition directory
    is read back via partition pruning and aggregated. The oracle runs
    a WHERE over the original table, so a hash match certifies
    write(partition_cols) → prune → read loses nothing — the
    engine's sink counterpart to the read-layer pushdown query."""
    from ray.data.aggregate import Count, Sum
    from ray.data.datasource.partitioning import PathPartitionFilter

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/destor_ray_evpart/{tag}"
    if not os.path.isdir(out):
        ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_type", "value"])

        def narrow(batch: pa.Table) -> pa.Table:
            import numpy as np
            vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                            * 1_000_000).astype("int64")
            return pa.table({"event_type": batch["event_type"],
                             "vmic": pa.array(vmic, pa.int64())})

        tmp = f"{out}.tmp.{os.getpid()}"
        ds.map_batches(narrow, batch_format="pyarrow") \
            .write_parquet(tmp, partition_cols=["event_type"])
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(out):  # not a lost race: surface it
                raise

    pruned = ray.data.read_parquet(
        out,
        partition_filter=PathPartitionFilter.of(
            lambda kv: kv["event_type"] == keep_type, style="hive"))
    agg = pruned.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("vmic", alias_name="sum_value_micro"))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": pc.cast(b["n"], pa.int64()),
            "sum_value_micro": pc.cast(b["sum_value_micro"], pa.int64())}),
        batch_format="pyarrow")


def schema_evolution_backfill(sf_dir: str):
    """(lang, n_docs, sum_chars) — SCHEMA-EVOLUTION ingest: the corpus
    arrives as two parquet generations with DIFFERENT schemas (v1
    shards predate the `lang` column; v2 shards carry it — the drift
    every long-lived crawl/ingest pipeline accumulates), and the reader
    must unify them: v1 rows are backfilled with the declared default
    'und' at read time, then both generations stream through one
    per-lang aggregate. Generation membership is the deterministic rule
    doc_id % 3 == 0 → v1, so the oracle can mirror the backfill as a
    CASE over the original table without seeing the staged files —
    a hash match certifies split → write(v1-schema)/write(v2-schema) →
    unified read loses nothing.

    Scale shape: the two generations are two read_parquet streams
    (schema unification is a map-side add_column on v1 — no shuffle);
    union is a metadata concat; ONE lang-domain aggregate exchange."""
    from ray.data.aggregate import Count, Sum

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = f"/tmp/destor_ray_schema_evo/{tag}"
    v1_dir, v2_dir = f"{base}/v1", f"{base}/v2"
    if not (os.path.isdir(v1_dir) and os.path.isdir(v2_dir)):
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "lang", "n_chars"])

        def v1_rows(batch: pa.Table) -> pa.Table:
            import numpy as np
            keep = batch["doc_id"].to_numpy(zero_copy_only=False) % 3 == 0
            t = batch.filter(pa.array(keep))
            return t.select(["doc_id", "n_chars"])  # lang doesn't exist yet

        def v2_rows(batch: pa.Table) -> pa.Table:
            import numpy as np
            keep = batch["doc_id"].to_numpy(zero_copy_only=False) % 3 != 0
            return batch.filter(pa.array(keep))

        tmp = f"{base}.tmp.{os.getpid()}"
        ds.map_batches(v1_rows, batch_format="pyarrow") \
            .write_parquet(f"{tmp}/v1")
        ds.map_batches(v2_rows, batch_format="pyarrow") \
            .write_parquet(f"{tmp}/v2")
        try:
            os.rename(tmp, base)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    v1 = ray.data.read_parquet(v1_dir)

    def backfill(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "lang", pa.array(["und"] * batch.num_rows, pa.string()))

    v1 = v1.map_batches(backfill, batch_format="pyarrow") \
        .select_columns(["doc_id", "lang", "n_chars"])
    v2 = ray.data.read_parquet(v2_dir) \
        .select_columns(["doc_id", "lang", "n_chars"])

    agg = v1.union(v2).groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
    return agg.map_batches(
        lambda b: pa.table({
            "lang": b["lang"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "sum_chars": pc.cast(b["sum_chars"], pa.int64())}),
        batch_format="pyarrow")


def _docs_digest(ds) -> tuple[int, int]:
    """Whole-table order-insensitive digest of (doc_id, lang, text)
    rows: (Σ md5_60bit(row) mod 2^63, n_rows). Same hi/lo split-int64
    trick as stats.table_digest, collapsed to one scalar aggregate —
    certifies a rewrite without sorting or co-locating anything."""
    import hashlib

    import numpy as np
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        tot = 0
        for i, lg, tx in zip(batch["doc_id"].to_numpy(zero_copy_only=False),
                             batch["lang"].to_pylist(),
                             batch["text"].to_pylist()):
            tot += int(hashlib.md5(f"{i}|{lg}|{tx}".encode())
                       .hexdigest()[:15], 16)
        return pa.table({"hi": pa.array([tot >> 32], pa.int64()),
                         "lo": pa.array([tot & 0xFFFFFFFF], pa.int64()),
                         "n": pa.array([batch.num_rows], pa.int64())})

    g = ds.map_batches(partials, batch_format="pyarrow") \
        .aggregate(Sum("hi", alias_name="hi"), Sum("lo", alias_name="lo"),
                   Sum("n", alias_name="n"))
    return int(((int(g["hi"]) << 32) + int(g["lo"])) % (1 << 63)), int(g["n"])


def compact_small_files(sf_dir: str, rows_per_small_file: int = 16,
                        target_rows: int = 2048):
    """(n_files_before, n_files_after, n_rows, digest_match) — the
    SMALL-FILE COMPACTION maintenance pass every long-running ingest
    needs (thousands of tiny commit files → storage-efficient blocks):
    the documents table is staged as many tiny parquet files (the
    degenerate layout micro-batched ingest produces), then compacted by
    a split/coalesce repartition (NO all-to-all — blocks are merged,
    rows never rekeyed) into ~target_rows blocks, and the rewrite is
    CERTIFIED by the order-insensitive table digest (Σ md5_60bit(row)):
    digest_match=1 ⟺ no row lost, duplicated or altered, the same
    certification a 100 TB compaction job must emit before swapping
    manifests.

    Resumable layout: staged + compacted dirs are content-addressed by
    sf tag under /tmp; a rerun reuses them (idempotent)."""
    import math

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = f"/tmp/destor_ray_compact/{tag}"
    small_dir, comp_dir = f"{base}/small", f"{base}/compacted"

    if not os.path.isdir(small_dir):
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "lang", "text"])
        n = ds.count()
        tmp = f"{base}.stage.{os.getpid()}"
        ds.repartition(max(1, math.ceil(n / rows_per_small_file))) \
            .write_parquet(f"{tmp}/small")
        import shutil
        try:
            os.makedirs(base, exist_ok=True)
            os.rename(f"{tmp}/small", small_dir)
        except OSError:
            pass  # lost the race; the winner's staging is identical
        shutil.rmtree(tmp, ignore_errors=True)

    small = ray.data.read_parquet(small_dir)
    d_before, n_rows = _docs_digest(small)

    if not os.path.isdir(comp_dir):
        tmp = f"{base}.comp.{os.getpid()}"
        small.repartition(max(1, math.ceil(n_rows / target_rows))) \
            .write_parquet(f"{tmp}/compacted")
        import shutil
        try:
            os.rename(f"{tmp}/compacted", comp_dir)
        except OSError:
            pass
        shutil.rmtree(tmp, ignore_errors=True)

    d_after, n_after = _docs_digest(ray.data.read_parquet(comp_dir))

    nf = len([f for f in os.listdir(small_dir) if f.endswith(".parquet")])
    nc = len([f for f in os.listdir(comp_dir) if f.endswith(".parquet")])
    import numpy as np
    import pandas as pd
    return pd.DataFrame({
        "n_files_before": np.array([nf], np.int64),
        "n_files_after": np.array([nc], np.int64),
        "n_rows": np.array([n_rows], np.int64),
        "digest_match": np.array(
            [1 if (d_before == d_after and n_rows == n_after) else 0],
            np.int64),
    })


def transactional_commit_readback(sf_dir: str):
    """(event_type, n, sum_value_micro) — the ATOMIC-COMMIT sink
    protocol a 100 TB job needs so a crashed writer can never corrupt
    readers: data files land first, then a MANIFEST naming exactly the
    committed files is published; readers list the manifest, never the
    directory. The staging step deliberately PLANTS an orphan parquet
    file (a simulated failed second attempt, duplicating real rows) in
    the same directory but NOT in the manifest — the oracle aggregates
    the original table, so a hash match proves the manifest-gated read
    excluded the orphan (a directory listing would double-count and
    mismatch).

    Scale shape: write is the normal partition-parallel parquet sink +
    one tiny manifest object; read opens only manifest paths (file
    pruning at the listing layer) into one event_type-domain
    aggregate."""
    import json

    import numpy as np
    from ray.data.aggregate import Count, Sum

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = f"/tmp/destor_ray_txn/{tag}"
    manifest_path = f"{base}/MANIFEST.json"

    if not os.path.isfile(manifest_path):
        def narrow(batch: pa.Table) -> pa.Table:
            vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                            * 1_000_000).astype("int64")
            return pa.table({"event_type": batch["event_type"],
                             "vmic": pa.array(vmic, pa.int64())})

        tmp = f"{base}.tmp.{os.getpid()}"
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["event_type", "value"]) \
            .map_batches(narrow, batch_format="pyarrow") \
            .write_parquet(tmp)
        committed = sorted(f for f in os.listdir(tmp)
                           if f.endswith(".parquet"))
        # plant the orphan: a failed writer's leftover, duplicating the
        # first committed shard under a name NOT in the manifest
        import shutil
        shutil.copyfile(f"{tmp}/{committed[0]}",
                        f"{tmp}/orphan-attempt2.parquet")
        with open(f"{tmp}/MANIFEST.json", "w") as f:
            json.dump({"files": committed}, f)
        try:
            os.rename(tmp, base)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)

    with open(manifest_path) as f:
        files = json.load(f)["files"]
    ds = ray.data.read_parquet([f"{base}/{name}" for name in files])
    agg = ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("vmic", alias_name="sum_value_micro"))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": pc.cast(b["n"], pa.int64()),
            "sum_value_micro": pc.cast(b["sum_value_micro"], pa.int64())}),
        batch_format="pyarrow")


def jfif_dc_thumbnail_stats(sf_dir: str, n_images: int = 256):
    """(n_images, mean_psnr_centi, min_psnr_centi, dc_ms_mean,
    full_ms_mean) — the DCT-DOMAIN DOWNSCALE lever measured end-to-end:
    per JFIF image, the 1/8-scale luma thumbnail decoded from DC
    coefficients alone (jpeg.decode_dc_luma — no IDCT, no chroma, no
    color convert; libjpeg's scale_denom=8) against the reference path
    (full decode → BT.601 luma → 8×8 box mean). PSNR between the two
    is near-lossless by construction (AC basis functions integrate to
    zero over a block), certifying that a signature/dedup channel can
    run on DC thumbs and skip ~all of the pixel pipeline — the decode
    cost term in the 100 TB throughput budget.

    Actor-pool stage; per-image timings are host-noisy (documented),
    the PSNR columns are the contract."""
    import time

    import numpy as np
    from ray.data.aggregate import Count, Max, Min, Sum

    from .. import jpeg

    ds = ray.data.read_parquet(f"{_jfif_corpus_dir(n_images)}/images.parquet",
                               columns=["image_id", "bytes"])

    class DCVsFull:
        def __call__(self, batch: pa.Table) -> pa.Table:
            psnr_c, dc_us, full_us = [], [], []
            for data in batch["bytes"].to_pylist():
                t0 = time.perf_counter()
                dc = jpeg.decode_dc_luma(data)
                t1 = time.perf_counter()
                full = jpeg.decode(data).astype(np.float64)
                t2 = time.perf_counter()  # full_us = decode only; the
                # reference thumb math below is excluded so the column
                # understates (never inflates) the DC path's advantage
                y = (0.299 * full[..., 0] + 0.587 * full[..., 1]
                     + 0.114 * full[..., 2])
                bh, bw = dc.shape
                pad_h, pad_w = bh * 8 - y.shape[0], bw * 8 - y.shape[1]
                if pad_h or pad_w:
                    y = np.pad(y, ((0, pad_h), (0, pad_w)), mode="edge")
                box = np.clip(np.round(
                    y.reshape(bh, 8, bw, 8).mean(axis=(1, 3))),
                    0, 255).astype(np.uint8)
                mse = float(((dc.astype(np.float64) - box) ** 2).mean())
                p = 99.0 if mse == 0 else min(
                    99.0, 10.0 * np.log10(255.0 ** 2 / mse))
                psnr_c.append(int(round(p * 100)))
                dc_us.append(int((t1 - t0) * 1e6))
                full_us.append(int((t2 - t1) * 1e6))
            return pa.table({
                "psnr_centi": pa.array(psnr_c, pa.int64()),
                "dc_us": pa.array(dc_us, pa.int64()),
                "full_us": pa.array(full_us, pa.int64()),
            })

    agg = ds.map_batches(DCVsFull, batch_size=64, concurrency=2,
                         batch_format="pyarrow") \
        .aggregate(Count(alias_name="n_images"),
                   Sum("psnr_centi", alias_name="psnr_sum"),
                   Min("psnr_centi", alias_name="min_psnr_centi"),
                   Sum("dc_us", alias_name="dc_us_sum"),
                   Sum("full_us", alias_name="full_us_sum"))
    import pandas as pd
    n = int(agg["n_images"])
    return pd.DataFrame({
        "n_images": np.array([n], np.int64),
        "mean_psnr_centi": np.array([agg["psnr_sum"] // n], np.int64),
        "min_psnr_centi": np.array([agg["min_psnr_centi"]], np.int64),
        "dc_ms_mean": np.array([agg["dc_us_sum"] // n // 1000], np.int64),
        "full_ms_mean": np.array([agg["full_us_sum"] // n // 1000],
                                 np.int64),
    })


def jfif_scan_mode_stats(sf_dir: str, n_images: int = 256):
    """(mode, n, total_entropy_bytes, dc_walked_bytes, dc_walk_ppm) —
    the scan-mode READ-ECONOMICS table over the mixed JFIF fixture:
    per encoding mode (444/420/422, progressive rows suffixed 'p'),
    how many entropy bytes the DC-thumbnail dedup path must
    Huffman-walk vs the stream total. Sequential streams walk 100%
    (AC run lengths decide block boundaries); progressive streams
    walk ONLY the leading DC scans — measured ~25-30% here — which at
    object-storage scale turns the thumbnail signature pass into
    ranged GETs of file heads. Deterministic fixture → pytest pins
    progressive < sequential; rows-only driver check."""
    from ray.data.aggregate import Count, Sum

    from .. import jpeg

    ds = ray.data.read_parquet(f"{_jfif_corpus_dir(n_images)}/images.parquet",
                               columns=["bytes", "subsampling"])

    def cost(batch: pa.Table) -> pa.Table:
        walked, total = [], []
        for data in batch["bytes"].to_pylist():
            wk, tt = jpeg.dc_decode_cost(data)
            walked.append(wk)
            total.append(tt)
        return pa.table({
            "mode": batch["subsampling"],
            "walked": pa.array(walked, pa.int64()),
            "total": pa.array(total, pa.int64()),
        })

    agg = ds.map_batches(cost, batch_format="pyarrow") \
        .groupby("mode").aggregate(
            Count(alias_name="n"),
            Sum("total", alias_name="total_entropy_bytes"),
            Sum("walked", alias_name="dc_walked_bytes"))

    def finish(b: pa.Table) -> pa.Table:
        tot = pc.cast(b["total_entropy_bytes"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        wk = pc.cast(b["dc_walked_bytes"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "mode": b["mode"],
            "n": pc.cast(b["n"], pa.int64()),
            "total_entropy_bytes": pa.array(tot, pa.int64()),
            "dc_walked_bytes": pa.array(wk, pa.int64()),
            "dc_walk_ppm": pa.array(wk * 1_000_000 // np.maximum(tot, 1),
                                    pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def resilient_read_stats(sf_dir: str):
    """(status, n_files, n_rows) — CORRUPT-FILE-tolerant reads: a
    staged copy of the documents table gets one file truncated
    mid-footer and one replaced with garbage (the real corpus's
    inevitable bad objects); `ray.data.read_parquet` on the directory
    fails the WHOLE job on the first bad footer (tested), so the
    resilient path lists the files into a Dataset of paths and each
    map task opens its file under a per-file guard — good files stream
    their rows on, bad files become quarantine rows carrying the error
    class (the read-layer twin of ImageDecodeQuarantine's per-row
    discipline). At 100 TB this is how an ingest survives a bad
    object without rerunning the other 10^6 files.

    The file->rows expansion happens INSIDE map_batches (batch of
    paths in, batch of rows out), so Ray's streaming executor still
    pipelines and spills normally; paths-per-task = 1 keeps failure
    domains minimal."""
    import pyarrow.parquet as pq_
    from ray.data.aggregate import Sum

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = f"/tmp/destor_ray_resilient/{tag}"
    if not os.path.isdir(base):
        import shutil
        tmp = f"{base}.tmp.{os.getpid()}"
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "lang"]) \
            .repartition(8).write_parquet(tmp)
        files = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        # corrupt file 0: truncate the footer; file 1: garbage bytes
        p0 = os.path.join(tmp, files[0])
        data = open(p0, "rb").read()
        open(p0, "wb").write(data[:max(8, len(data) // 2)])
        open(os.path.join(tmp, files[1]), "wb").write(b"not a parquet file")
        try:
            os.rename(tmp, base)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)

    paths = sorted(f"{base}/{f}" for f in os.listdir(base)
                   if f.endswith(".parquet"))
    pds = ray.data.from_items([{"path": p} for p in paths]) \
        .repartition(len(paths))

    def read_guarded(batch: pa.Table) -> pa.Table:
        status, nf, nr = [], [], []
        for p in batch["path"].to_pylist():
            try:
                t = pq_.read_table(p, columns=["doc_id"])
                status.append("ok")
                nr.append(t.num_rows)
            except Exception as e:  # noqa: BLE001 — quarantine, not crash
                status.append(f"quarantined:{type(e).__name__}")
                nr.append(0)
            nf.append(1)
        return pa.table({"status": pa.array(status, pa.string()),
                         "nf": pa.array(nf, pa.int64()),
                         "nr": pa.array(nr, pa.int64())})

    agg = pds.map_batches(read_guarded, batch_format="pyarrow") \
        .groupby("status").aggregate(Sum("nf", alias_name="n_files"),
                                     Sum("nr", alias_name="n_rows"))
    return agg.map_batches(
        lambda b: pa.table({
            "status": b["status"],
            "n_files": b["n_files"].cast(pa.int64()),
            "n_rows": b["n_rows"].cast(pa.int64())}),
        batch_format="pyarrow")


def storage_orphan_gc(sf_dir: str):
    """(status, n_files, total_bytes) — the filesystem-level GC SWEEP
    that pairs with the manifest commit protocol: diff the directory
    listing against the union of published manifests; files in no
    manifest are orphans from failed writer attempts and their bytes
    are reclaimable (destor's container reclamation, X3, one level up
    the stack — here it's whole objects instead of chunk refs). Uses
    the transactional_commit_readback staging dir, which plants
    exactly one orphan; the sweep REPORTS, it does not delete — a
    separate destructive pass would act on this table after a grace
    period.

    Scale shape: the listing is metadata-only (no file is opened); at
    10^6 objects the listing itself shards by prefix — here one driver
    listdir stands in, with the diff done as set membership against
    the broadcast manifest set (manifests are tiny by contract)."""
    import json

    import numpy as np
    import pandas as pd

    # ensure the staged dir (and its planted orphan) exists
    transactional_commit_readback(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = f"/tmp/destor_ray_txn/{tag}"
    with open(f"{base}/MANIFEST.json") as f:
        committed = set(json.load(f)["files"])
    rows = []
    for name in sorted(os.listdir(base)):
        if not name.endswith(".parquet"):
            continue
        sz = os.path.getsize(os.path.join(base, name))
        rows.append(("committed" if name in committed else "orphan", sz))
    df = pd.DataFrame(rows, columns=["status", "bytes"])
    g = df.groupby("status", as_index=False).agg(
        n_files=("bytes", "size"), total_bytes=("bytes", "sum"))
    g["n_files"] = g["n_files"].astype(np.int64)
    g["total_bytes"] = g["total_bytes"].astype(np.int64)
    return g


def user_erasure_certified(sf_dir: str, erase_user: int = 7):
    """(event_type, n, sum_value_micro) over the events table AFTER
    erasing one user's rows — the right-to-be-forgotten pass: filter
    map-side, REWRITE the store (erasure must be physical, not a view),
    read the rewritten store back and aggregate. The oracle runs
    WHERE user_id <> erase_user over the ORIGINAL table, so a hash
    match certifies the rewrite erased exactly that user's rows and
    nothing else — the deletion counterpart of the compaction digest.

    Scale shape: one streaming filtered write (partition-parallel),
    one aggregate over the rewritten store."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/destor_ray_erasure/{tag}_u{erase_user}"
    if not os.path.isdir(out_dir):
        ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["user_id", "event_type",
                                            "value"])

        def scrub(batch: pa.Table) -> pa.Table:
            keep = batch["user_id"].to_numpy(zero_copy_only=False) \
                != erase_user
            t = batch.filter(pa.array(keep))
            vmic = np.round(t["value"].to_numpy(zero_copy_only=False)
                            * 1_000_000).astype(np.int64)
            return pa.table({"event_type": t["event_type"],
                             "vmic": pa.array(vmic, pa.int64())})

        tmp = f"{out_dir}.tmp.{os.getpid()}"
        ds.map_batches(scrub, batch_format="pyarrow").write_parquet(tmp)
        import shutil
        try:
            os.rename(tmp, out_dir)
        except OSError:
            pass
        shutil.rmtree(tmp, ignore_errors=True)

    agg = ray.data.read_parquet(out_dir).groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("vmic", alias_name="sum_value_micro"))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": pc.cast(b["n"], pa.int64()),
            "sum_value_micro": pc.cast(b["sum_value_micro"], pa.int64())}),
        batch_format="pyarrow")


def zonemap_prune_stats(sf_dir: str, n_shards: int = 16):
    """(n_shards, n_shards_scanned, n_rows, sum_value_micro) — the
    ZONEMAP (min/max pruning index) leg of the storage contract: the
    events table is written once as n_shards event_id-range shards,
    a zonemap is built from the parquet FOOTER statistics alone (no
    data pages read — the same per-file min/max every lakehouse
    format publishes), and a mid-range predicate
    event_id ∈ [lo + 3/8·span, lo + 5/8·span] is answered by scanning
    ONLY the shards whose zone overlaps the interval. The oracle
    recomputes the shard assignment, the per-shard min/max, the
    overlap count, and the filtered aggregate in SQL — a hash match
    certifies both the pruning decision (no shard that held a match
    was skipped) and the pruned read's result.

    Scale shape: the shard write is the engine's standard resumable
    layout; the zonemap is O(files) rows built from footers (at 100 TB
    this is the manifest a planner consults instead of listing data);
    the pruned read touches ~2/8 of the store for a 1/4-span query."""
    import numpy as np
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Max, Min, Sum
    from ray.data.datasource.partitioning import PathPartitionFilter

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])
    g = ds.aggregate(Min("event_id", alias_name="lo"),
                     Max("event_id", alias_name="hi"))
    lo, hi = int(g["lo"]), int(g["hi"])
    span = hi - lo + 1
    a = lo + (hi - lo) * 3 // 8
    b = lo + (hi - lo) * 5 // 8

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/destor_ray_zonemap/{tag}_{n_shards}"
    if not os.path.isdir(out):
        def narrow(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy(zero_copy_only=False) \
                .astype("int64")
            vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                            * 1_000_000).astype("int64")
            return pa.table({
                "event_id": pa.array(eid, pa.int64()),
                "vmic": pa.array(vmic, pa.int64()),
                "bkt": pa.array((eid - lo) * n_shards // span, pa.int64()),
            })

        tmp = f"{out}.tmp.{os.getpid()}"
        ds.map_batches(narrow, batch_format="pyarrow") \
            .write_parquet(tmp, partition_cols=["bkt"])
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(out):  # not a lost race: surface it
                raise

    # zonemap from footer statistics only — a Dataset over the file
    # listing; each task opens one footer (never a data page)
    files = []
    for root, _dirs, names in os.walk(out):
        files += [os.path.join(root, n) for n in names
                  if n.endswith(".parquet")]
    flist = ray.data.from_items([{"path": p} for p in sorted(files)])

    def footer_zone(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        shards, mns, mxs = [], [], []
        for p in paths:
            md = pq.ParquetFile(p).metadata
            ci = md.schema.to_arrow_schema().names.index("event_id")
            mn = min(md.row_group(i).column(ci).statistics.min
                     for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(ci).statistics.max
                     for i in range(md.num_row_groups))
            # hive dir name carries the shard id
            shard = int(os.path.basename(os.path.dirname(p)).split("=")[1])
            shards.append(shard)
            mns.append(int(mn))
            mxs.append(int(mx))
        return pa.table({"shard": pa.array(shards, pa.int64()),
                         "mn": pa.array(mns, pa.int64()),
                         "mx": pa.array(mxs, pa.int64())})

    zm = flist.map_batches(footer_zone, batch_format="pyarrow") \
        .groupby("shard").aggregate(Min("mn", alias_name="mn"),
                                    Max("mx", alias_name="mx")) \
        .to_pandas()
    keep = set(zm.loc[(zm["mn"] <= b) & (zm["mx"] >= a), "shard"]
               .astype(int).tolist())

    pruned = ray.data.read_parquet(
        out,
        partition_filter=PathPartitionFilter.of(
            lambda kv: int(kv["bkt"]) in keep, style="hive"))
    agg = pruned.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t["event_id"], a),
                                   pc.less_equal(t["event_id"], b))),
        batch_format="pyarrow") \
        .aggregate(Count(alias_name="n_rows"),
                   Sum("vmic", alias_name="sum_value_micro"))

    import pandas as pd
    return pd.DataFrame({
        "n_shards": [int(len(zm))],
        "n_shards_scanned": [int(len(keep))],
        "n_rows": [int(agg["n_rows"])],
        "sum_value_micro": [int(agg["sum_value_micro"])],
    }).astype("int64")


def _jfif_dup_corpus_dir(n_base: int = 192, quality: int = 85,
                         dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED NEAR-DUPLICATES: every
    dup_every-th base image also appears re-encoded at a different
    quality (same source pixels, different bitstream — the classic
    re-encode near-dup class). Ground truth is carried in the id
    naming: "jfNNNNN_re" duplicates "jfNNNNN"."""
    from .. import corpus as corpus_mod
    from ..jpeg import encode as jfif_encode

    out = (f"/tmp/destor_ray_jfifdup/"
           f"n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=7, row=i)
        ids.append(f"jf{i:05d}")
        blobs.append(jfif_encode(px, quality))
        if i % dup_every == 0:
            ids.append(f"jf{i:05d}_re")
            blobs.append(jfif_encode(px, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def jfif_quality_estimate(sf_dir: str, n_images: int = 96,
                          qualities: tuple = (70, 85, 92)):
    """(true_q, n, n_error, n_exact, n_zero_dist, min_est_q, max_est_q)
    — DQT-based encoder-quality estimation over a mixed-quality
    real-JFIF corpus (rows whose headers fail to parse — 16-bit DQT,
    truncation — are counted in n_error, never killing the job): the provenance/curation read a web-scale image pipeline
    runs before transcode planning (corpus_transcode_stats tells you
    what re-encoding SAVES; this tells you what quality the source was
    encoded at, i.e. whether re-encoding LOSES — transcoding a q70
    source to q85 wastes bytes and fidelity). jpeg.estimate_quality
    inverts libjpeg's jpeg_quality_scaling by exact candidate scan over
    the parsed DQT; n_zero_dist counts files whose tables are
    bit-exactly standard IJG tables (nonzero ⇒ custom/optimized
    encoder — a provenance signal).

    Scale shape: header-only parse per row (no entropy decode, no
    pixels — manifest-scan cost), map-side per-quality partials, one
    quality-domain exchange. sf_dir unused (cached deterministic
    fixture), standard queries() signature."""
    import numpy as np
    from ray.data.aggregate import Max, Min, Sum

    from .. import jpeg

    dss = []
    for q in qualities:
        d = ray.data.read_parquet(
            f"{_jfif_corpus_dir(n_images, q)}/images.parquet",
            columns=["bytes"])
        dss.append(d.map_batches(
            lambda b, q=q: b.append_column(
                "true_q", pa.array(np.full(len(b), q, np.int64))),
            batch_format="pyarrow"))
    ds = dss[0].union(*dss[1:])

    HI, LO = 1 << 62, -(1 << 62)    # min/max sentinels for failed rows

    def estimate(batch: pa.Table) -> pa.Table:
        tq = batch["true_q"].to_numpy(zero_copy_only=False)
        est = np.empty(len(batch), np.int64)
        dist = np.empty(len(batch), np.int64)
        ok = np.ones(len(batch), bool)
        for i, data in enumerate(batch["bytes"].to_pylist()):
            try:    # quarantine, don't kill the job: a 16-bit-DQT or
                # truncated file is a row-level fact at corpus scale
                est[i], dist[i] = jpeg.estimate_quality(data)
            except (ValueError, NotImplementedError, IndexError):
                ok[i] = False
        return pa.table({
            "true_q": pa.array(tq, pa.int64()),
            "n": pa.array(np.ones(len(batch), np.int64)),
            "n_error": pa.array((~ok).astype(np.int64)),
            "n_exact": pa.array((ok & (est == tq)).astype(np.int64)),
            "n_zero_dist": pa.array((ok & (dist == 0)).astype(np.int64)),
            "est_min": pa.array(np.where(ok, est, HI), pa.int64()),
            "est_max": pa.array(np.where(ok, est, LO), pa.int64()),
        })

    agg = ds.map_batches(estimate, batch_format="pyarrow",
                         batch_size=64) \
        .groupby("true_q").aggregate(
            Sum("n", alias_name="n"),
            Sum("n_error", alias_name="n_error"),
            Sum("n_exact", alias_name="n_exact"),
            Sum("n_zero_dist", alias_name="n_zero_dist"),
            Min("est_min", alias_name="min_est_q"),
            Max("est_max", alias_name="max_est_q"))
    return agg.to_pandas().astype("int64").sort_values("true_q") \
        .reset_index(drop=True)


def jfif_dc_dedup(sf_dir: str, n_base: int = 192, dup_every: int = 3,
                  psnr_min_centi: int = 2800):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — REAL-JPEG near-dup detection whose
    signature channel never runs a full decode: per image the luma
    thumb comes from DC coefficients alone (jpeg.decode_dc_luma — the
    scale_denom=8 lever jfif_dc_thumbnail_stats measures at ~60 dB vs
    the full-decode reference), TWO 64-bit hashes over the DC thumb
    (phash64 + an 8×8 block-mean aHash — measured: a q85↔q70
    re-encode flips up to 20 phash bits, so a single 4×16 banding
    misses 19% of planted pairs; 8×8-bit bands over BOTH hashes
    recover 64/64 because the two hash families flip independently)
    feed the LSH exchange, and in-bucket verify runs on 16×16 DC
    thumbs that RIDE the band rows (the flagship's
    thumbs-on-band-rows pattern — full payloads never cross the
    shuffle, full decode is never paid at all). Planted truth: every
    dup_every-th base image re-encoded at a lower quality; recall_ppm
    is verified-planted / planted.

    8-bit bands are the fixture-scale setting (256 values/band draws
    ~7% of distinct pairs into verify on this corpus — all rejected by
    the PSNR gate); at corpus scale band width grows with log(n) and
    the hot-band salting machinery of stages/candidates.py applies
    unchanged.

    The 100 TB story this query pins: on a real-JPEG corpus the
    signature stage cost drops to header walk + Huffman DC scan per
    image, and dedup quality is unchanged for re-encode duplicates
    (test asserts recall == 1.0 with zero false merges)."""
    import numpy as np

    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _jfif_dup_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_images = n_base + -(-n_base // dup_every)
    n_planted = -(-n_base // dup_every)

    class DCSignature:
        """DC-luma thumb + phash per image — no IDCT, no full decode."""

        def __init__(self):
            codec._dct_matrix(32)  # warm the phash DCT table

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            grays, thumbs = [], []
            for data in batch["bytes"].to_pylist():
                dc = jpeg.decode_dc_luma(data)
                grays.append(codec.resize_nn(dc, 32, 32))
                thumbs.append(codec.resize_nn(dc, 16, 16).tobytes())
            stack = np.stack(grays) if ids else \
                np.empty((0, 32, 32), np.uint8)
            ph = codec.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(DCSignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("thumb",), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    verify_bucket = _psnr_verify_bucket("image_id", psnr_min_centi)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"jf{i:05d}", f"jf{i:05d}_re")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Dihedral-invariant near-dup detection (flipped / rotated re-uploads)
# ---------------------------------------------------------------------------

def _dihedral_dup_corpus_dir(n_base: int = 144, quality: int = 85,
                             dup_every: int = 3,
                             dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED DIHEDRAL NEAR-DUPS:
    every dup_every-th base image also appears GEOMETRICALLY
    TRANSFORMED (cycling all 7 non-identity D4 orientations — mirror,
    rot90/180/270, transpose, anti-transpose) AND re-encoded at a lower
    quality — the composite "mirrored re-upload" class that defeats
    plain phash banding (corpus_augment_stats measured a flip moves
    phash ~31 bits, i.e. past every band). Truth rides the id naming:
    "dhNNNNN_tK" duplicates "dhNNNNN"."""
    from .. import codec
    from .. import corpus as corpus_mod
    from ..jpeg import encode as jfif_encode

    out = (f"/tmp/destor_ray_dihdup/"
           f"v2_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=7, row=i)
        ids.append(f"dh{i:05d}")
        blobs.append(jfif_encode(px, quality))
        if i % dup_every == 0:
            k = 1 + (i // dup_every) % 7
            ids.append(f"dh{i:05d}_t{k}")
            blobs.append(jfif_encode(
                np.ascontiguousarray(codec.dihedral_apply(px, k)),
                dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _dihedral_aligned_psnr(ta: np.ndarray, tb: np.ndarray,
                           psnr_fn) -> float:
    """Orientation- and shift-tolerant thumb PSNR: best over the 8 D4
    orientations of tb AND ±1-pixel shifts of the central 14×14 window
    (nearest-neighbour resize grids of an image and its rotated copy
    differ by up to one sample cell — without the shift sweep a TRUE
    pair bottoms out at 20.6 dB, inside the distinct-pair range;
    with it true ≥ 25.6 dB vs distinct ≤ 25.1 dB, measured)."""
    from .. import codec
    best = -1.0
    ca = ta[1:15, 1:15].astype(np.float64)
    for k in range(8):
        tbo = codec.dihedral_apply(tb, k)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cb = tbo[1 + dy:15 + dy, 1 + dx:15 + dx] \
                    .astype(np.float64)
                mse = ((ca - cb) ** 2).mean()
                p = 99.99 if mse == 0 else \
                    min(10 * np.log10(255.0 ** 2 / mse), 99.99)
                if p > best:
                    best = p
    return best


def dihedral_image_dedup(sf_dir: str, n_base: int = 144,
                         dup_every: int = 3,
                         psnr_min_centi: int = 3500,
                         ham_max: int = 18, ah_max: int = 6):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — near-dup detection that survives
    MIRRORED/ROTATED re-uploads, the geometric-transform class every
    other image channel in this engine is blind to (a flip moves phash
    ~31 of 64 bits — corpus_augment_stats' measurement — so re-encode
    banding never fires). Orientation invariance comes from ORBIT
    EXPANSION, not a canonical hash: each image emits band rows for
    all 8 D4 orientations of its 32×32 DC-luma gray (phash + aHash per
    orientation, 8×8-bit bands over both — the dual-family union
    jfif_dc_dedup measured), so a transformed copy collides with its
    source at the corresponding orientation with plain re-encode-level
    bit noise (measured: true pairs ≤ 14 phash bits at the aligned
    orientation vs ≥ 16 for distinct images). A canonicalizing
    orbit-MIN hash was evaluated and rejected: argmin over 8 noisy
    hash values is unstable under re-encode perturbation (different
    orbit elements win on the two sides → 64-bit mismatch), while
    expansion only relies on elementwise orbit proximity.

    Gate design is MEASURED on the DC-luma path, where the margins are
    the reverse of the full-decode intuition: hash distances barely
    separate (distinct-image best-orientation phash distance bottoms
    out at 2 bits and aHash at 0 — smooth DC thumbs collide — while
    true pairs reach dph 16 / dah 2), but orientation+shift-aligned
    16×16 DC-thumb PSNR separates by ~25 dB (true ≥ 51.2 vs distinct
    ≤ 26.4 across all 534 hash-risky distinct pairs at n=144). So the
    dual Hamming test (dph ≤ ham_max OR dah ≤ ah_max) is a cheap COST
    prefilter sized to lose no true pair, and the PSNR ≥ 35 dB arm is
    the correctness gate with ≥ 8 dB margin on both sides. Signature
    decode is jpeg.decode_dc_luma (header walk + Huffman DC scan — no
    IDCT, no full decode anywhere).

    Scale shape: orbit expansion is an 8× band-row multiplier (rows
    stay 16 B + thumb); at corpus scale the pair-rendezvous verify
    (stages/candidates.candidate_edges_rendezvous topology) drops the
    thumb off the band rows exactly as for the re-encode channel, and
    a SERVING index stores one orientation while probes expand 8 —
    the multiplier then rides the small side only."""
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _dihedral_dup_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class OrbitSignature:
        """8 orientations × (phash, aHash) per image, DC-luma only."""

        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, orients, phs, ahs, thumbs = [], [], [], [], []
            for iid, data in zip(batch["image_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                dc = jpeg.decode_dc_luma(data)
                orbit = codec.dihedral_stack8(
                    codec.resize_nn(dc, 32, 32))
                ph = codec.phash64_batch(orbit)
                ah = codec.ahash64_batch(orbit)
                th = codec.resize_nn(dc, 16, 16).tobytes()
                for k in range(8):
                    ids.append(iid)
                    orients.append(k)
                    phs.append(int(ph[k]))
                    ahs.append(int(ah[k]))
                    thumbs.append(th)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "orient": pa.array(orients, pa.int8()),
                "phash": pa.array(phs, pa.int64()),
                "ahash": pa.array(ahs, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(OrbitSignature, batch_size=32, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("phash", "ahash", "thumb"), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        # vectorized pair generation + hamming pre-gate (round 4,
        # VERDICT r3 #6); the dihedral-aligned PSNR loops only over
        # pre-gate survivors
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        if not len(li):
            return pa.table({"l": pa.array([], pa.string()),
                             "r": pa.array([], pa.string()),
                             "p": pa.array([], pa.int64())})
        phv = df["phash"].to_numpy(np.int64)
        ahv = df["ahash"].to_numpy(np.int64)
        pre = (codec.hamming64(phv[li], phv[ri]) <= ham_max) \
            | (codec.hamming64(ahv[li], ahv[ri]) <= ah_max)
        li, ri = li[pre], ri[pre]
        thumbs = _thumb_matrix(df)
        pc_ = np.empty(len(li), np.int64)
        for k in range(len(li)):
            p = _dihedral_aligned_psnr(thumbs[li[k]].reshape(16, 16),
                                       thumbs[ri[k]].reshape(16, 16),
                                       codec.psnr)
            pc_[k] = int(round(min(p, 99.99) * 100))
        return _emit_pairs(ids_a, li, ri, pc_ >= psnr_min_centi, pc_)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"dh{i:05d}", f"dh{i:05d}_t{1 + (i // dup_every) % 7}")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# EXIF provenance extraction + metadata-guided orientation dedup
# ---------------------------------------------------------------------------

_EXIF_CAMERAS = (("ACME", "Shot-100"), ("ACME", "Shot-200"),
                 ("Borealis", "BX9"), ("Cetus", "Field Mk II"))


def _exif_corpus_dir(n_base: int = 144, quality: int = 85,
                     dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH EXIF PROVENANCE and planted
    CAMERA-ROTATED re-uploads: base rows carry an APP1 Exif segment
    (make/model cycling over 4 cameras, orientation 1, deterministic
    DateTime) except every 7th row which has none (the bare-web-upload
    case); every dup_every-th base image also appears STORED ROTATED
    the way a camera writes it — pixels transformed by
    jpeg.EXIF_ORIENT_STORE[o] for o cycling 2..8, orientation tag o in
    the EXIF, re-encoded at a lower quality. Truth rides the naming:
    "exNNNNN_oO" duplicates "exNNNNN"."""
    from .. import codec
    from .. import corpus as corpus_mod
    from .. import jpeg

    out = (f"/tmp/destor_ray_exif/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=7, row=i)
        make, model = _EXIF_CAMERAS[i % len(_EXIF_CAMERAS)]
        meta = None if i % 7 == 6 else {
            "make": make, "model": model, "orientation": 1,
            "datetime": f"2026:01:{1 + i % 28:02d} "
                        f"{i % 24:02d}:{(3 * i) % 60:02d}:00"}
        ids.append(f"ex{i:05d}")
        blobs.append(jpeg.encode(px, quality, exif=meta))
        if i % dup_every == 0:
            o = 2 + (i // dup_every) % 7           # orientations 2..8
            stored = np.ascontiguousarray(
                codec.dihedral_apply(px, jpeg.EXIF_ORIENT_STORE[o]))
            ids.append(f"ex{i:05d}_o{o}")
            blobs.append(jpeg.encode(stored, dup_quality, exif={
                "make": make, "model": model, "orientation": o,
                "datetime": f"2026:02:{1 + i % 28:02d} 12:00:00"}))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def jfif_exif_stats(sf_dir: str, n_base: int = 144,
                    dup_every: int = 3):
    """(make, model, n, n_no_exif, n_oriented, dt_min_key, dt_max_key)
    — EXIF provenance extraction over a real-JFIF corpus: the
    camera/timestamp read a web-scale curation pipeline runs for
    source attribution, burst grouping and orientation-aware
    preprocessing. jpeg.parse_exif walks APP1 markers only (stops at
    SOS — header bytes, never entropy data), so at 100 TB this is a
    manifest-scan cost like jfif_quality_estimate. Rows without EXIF
    aggregate under "(none)"; DateTime folds as an int64 yyyymmddhhmmss
    key through Min/Max so the exchange is make/model-domain sized.

    destor note: the reference treats payloads as opaque chunk streams
    (src/destor.c job loop); metadata extraction is this repo's
    multimodal-ingest extension, not a port."""
    from ray.data.aggregate import Max, Min, Sum

    from .. import jpeg

    d = _exif_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")

    HI, LO = 1 << 62, 0

    def extract(batch: pa.Table) -> pa.Table:
        makes, models, orient, dtk = [], [], [], []
        for data in batch["bytes"].to_pylist():
            m = jpeg.parse_exif(data)
            if m is None:
                makes.append("(none)")
                models.append("(none)")
                orient.append(0)
                dtk.append(-1)
            else:
                makes.append(m.get("make", "(none)"))
                models.append(m.get("model", "(none)"))
                orient.append(int(m.get("orientation", 1)))
                ds_ = m.get("datetime", "")
                digits = "".join(c for c in ds_ if c.isdigit())
                dtk.append(int(digits) if digits else -1)
        n = len(makes)
        dtv = np.asarray(dtk, np.int64)
        has_dt = dtv >= 0
        return pa.table({
            "make": pa.array(makes, pa.string()),
            "model": pa.array(models, pa.string()),
            "n": pa.array(np.ones(n, np.int64)),
            "n_no_exif": pa.array(
                (np.asarray(orient, np.int64) == 0).astype(np.int64)),
            "n_oriented": pa.array(
                (np.asarray(orient, np.int64) > 1).astype(np.int64)),
            "dt_min": pa.array(np.where(has_dt, dtv, HI), pa.int64()),
            "dt_max": pa.array(np.where(has_dt, dtv, LO), pa.int64()),
        })

    agg = ds.map_batches(extract, batch_format="pyarrow",
                         batch_size=64) \
        .groupby(["make", "model"]).aggregate(
            Sum("n", alias_name="n"),
            Sum("n_no_exif", alias_name="n_no_exif"),
            Sum("n_oriented", alias_name="n_oriented"),
            Min("dt_min", alias_name="dt_min_key"),
            Max("dt_max", alias_name="dt_max_key"))
    out = agg.to_pandas().sort_values(["make", "model"]) \
        .reset_index(drop=True)
    for c in out.columns[2:]:
        out[c] = out[c].astype("int64")
    # groups with zero datetimes carry only sentinels — report -1
    no_dt = out["dt_min_key"] == HI
    out.loc[no_dt, ["dt_min_key", "dt_max_key"]] = -1
    return out


def exif_orientation_dedup(sf_dir: str, n_base: int = 144,
                           dup_every: int = 3,
                           psnr_min_centi: int = 2800):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — METADATA-GUIDED orientation-robust
    near-dup detection: camera-rotated re-uploads (pixels stored
    rotated/mirrored, EXIF Orientation tag set — how every phone
    camera writes portrait shots) defeat plain phash banding exactly
    like dihedral_image_dedup's class, but when the tag is PRESENT the
    8× orbit expansion is unnecessary: parse_exif reads the tag from
    the header, dihedral_apply(EXIF_ORIENT_FIX[o]) restores the
    upright DC-luma, and the signature proceeds at 1× cost — 16 band
    rows/image instead of 128, an 8× shuffle-volume saving over the
    blind path (dihedral_image_dedup remains the fallback when EXIF is
    absent or stripped). DC grids commute with D4 on 8-multiple
    dimensions, so fixed thumbs align exactly and the plain full-thumb
    PSNR gate of jfif_dc_dedup applies unchanged.

    Scale shape: header-only EXIF parse + DC-only decode per row, dual
    phash+aHash 8×8-bit bands, 16×16 fixed thumbs ride the band rows,
    one band exchange + one pair dedup — the flagship topology."""
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _exif_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class FixedSignature:
        """EXIF-orientation-normalized DC-luma signature, 1× per image."""

        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            grays, thumbs = [], []
            for data in batch["bytes"].to_pylist():
                m = jpeg.parse_exif(data)
                o = int(m.get("orientation", 1)) if m else 1
                dc = jpeg.decode_dc_luma(data)
                fixed = np.ascontiguousarray(codec.dihedral_apply(
                    dc, jpeg.EXIF_ORIENT_FIX.get(o, 0)))
                grays.append(codec.resize_nn(fixed, 32, 32))
                thumbs.append(codec.resize_nn(fixed, 16, 16).tobytes())
            stack = np.stack(grays) if ids else \
                np.empty((0, 32, 32), np.uint8)
            ph = codec.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(FixedSignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("thumb",), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    verify_bucket = _psnr_verify_bucket("image_id", psnr_min_centi)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"ex{i:05d}", f"ex{i:05d}_o{2 + (i // dup_every) % 7}")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Letterbox/pillarbox-invariant near-dup detection (padded re-uploads)
# ---------------------------------------------------------------------------

def _letterbox(px: np.ndarray, style: int, bar: int,
               color: int) -> np.ndarray:
    """Pad with uniform bars: 0 = top+bottom (letterbox), 1 =
    left+right (pillarbox), 2 = full frame."""
    h, w = px.shape[:2]
    if style == 0:
        out = np.full((h + 2 * bar, w, 3), color, np.uint8)
        out[bar:bar + h] = px
    elif style == 1:
        out = np.full((h, w + 2 * bar, 3), color, np.uint8)
        out[:, bar:bar + w] = px
    else:
        out = np.full((h + 2 * bar, w + 2 * bar, 3), color, np.uint8)
        out[bar:bar + h, bar:bar + w] = px
    return out


def _letterbox_corpus_dir(n_base: int = 144, quality: int = 85,
                          dup_every: int = 3,
                          dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED LETTERBOXED re-uploads:
    every dup_every-th base image also appears padded with uniform
    bars (style cycling letterbox/pillarbox/frame, bar width 5..17 px
    — deliberately NOT 8-multiples so bars straddle JPEG blocks, bar
    color cycling black/white/mid-gray) and re-encoded at a lower
    quality — the aspect-ratio-normalizing pad every video thumbnail
    and social-media re-upload applies. Truth rides the naming:
    "lbNNNNN_pS" duplicates "lbNNNNN"."""
    from .. import corpus as corpus_mod
    from .. import jpeg

    out = (f"/tmp/destor_ray_lbdup/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=7, row=i)
        ids.append(f"lb{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            style = (i // dup_every) % 3
            bar = 5 + i % 13
            color = (0, 255, 128)[(i // dup_every) % 3]
            ids.append(f"lb{i:05d}_p{style}")
            blobs.append(jpeg.encode(_letterbox(px, style, bar, color),
                                     dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _inset_shift_psnr(ta: np.ndarray, tb: np.ndarray) -> float:
    """Scale- and shift-tolerant PSNR over 32×32 trimmed grays: max
    over uniform-inset pairs 0..3 per side (the residual <=2-line
    ringing shoulder trim_uniform_border leaves maps to ~1 inset unit
    at 32-px scale) × ±1-px shifts of the central 14×14 window."""
    from .. import codec
    best = -1.0
    for a in range(4):
        ca = codec.resize_nn(
            np.ascontiguousarray(ta[a:32 - a, a:32 - a]), 16, 16)
        cca = ca[1:15, 1:15].astype(np.float64)
        for b in range(4):
            cb16 = codec.resize_nn(
                np.ascontiguousarray(tb[b:32 - b, b:32 - b]), 16, 16)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    cb = cb16[1 + dy:15 + dy, 1 + dx:15 + dx] \
                        .astype(np.float64)
                    mse = ((cca - cb) ** 2).mean()
                    p = 99.99 if mse == 0 else \
                        min(10 * np.log10(255.0 ** 2 / mse), 99.99)
                    if p > best:
                        best = p
    return best


def letterbox_image_dedup(sf_dir: str, n_base: int = 144,
                          dup_every: int = 3,
                          psnr_min_centi: int = 3200):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — near-dup detection that survives
    LETTERBOX/PILLARBOX padding, the aspect-normalizing transform
    every video thumbnailer and social re-upload applies (uniform bars
    shift AND rescale the content, so plain phash banding goes blind
    the same way it does for crops): the signature stage decodes,
    trims uniform bars off the full-res luma with
    codec.trim_uniform_border (a DC-grid-only variant was measured
    first and REJECTED — on 32-px images the DC grid is 4×4, far too
    coarse to resolve 5–17-px bars; full decode is the same cost class
    as the flagship's thumb stage, which decodes every payload
    anyway), then bands the trimmed 32×32 gray through the dual
    phash+aHash 8×8-bit exchange; verify = inset-sweep PSNR on 32×32
    trimmed thumbs riding the band rows (residual ringing shoulders
    map to fractional-pixel scale error — the sweep is the bounded
    alignment search, same pattern as the dihedral channel's
    orientation/shift sweep).

    MEASURED on the planted fixture (arbitrary non-8-multiple bars,
    black/white/gray, q85→q70): every true pair collides in ≥1 of 16
    bands, true-pair inset-PSNR ≥ 37.2 dB vs distinct-pair max 27.4 dB
    — the 32 dB gate sits ~5 dB from both. The gray-bar case is the
    hard one: bars adjacent to near-bar-gray gradient content defeat
    any per-line color heuristic, which is why the trim is
    strict-uniform-only and the slack lives in the verify.

    Scale shape: one decode+trim pass (actor pool), one band exchange
    (16 rows × ~1 KB thumb per image — production would move the thumb
    to a pair-rendezvous exchange like the flagship's preset), one
    pair-dedup groupby."""
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _letterbox_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class TrimSignature:
        """decode → uniform-border trim → 32×32 gray signature."""

        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            grays = []
            for data in batch["bytes"].to_pylist():
                gray = codec.to_gray(codec.decode(data))
                t = codec.trim_uniform_border(gray)
                grays.append(codec.resize_nn(
                    np.ascontiguousarray(t), 32, 32))
            stack = np.stack(grays) if ids else \
                np.empty((0, 32, 32), np.uint8)
            ph = codec.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "thumb": pa.array([g.tobytes() for g in grays],
                                  pa.binary()),
            })

    sigs = ds.map_batches(TrimSignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("thumb",), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        thumbs = _thumb_matrix(df)
        pc_ = np.empty(len(li), np.int64)
        for k in range(len(li)):
            p = _inset_shift_psnr(thumbs[li[k]].reshape(32, 32),
                                  thumbs[ri[k]].reshape(32, 32))
            pc_[k] = int(round(min(p, 99.99) * 100))
        return _emit_pairs(ids_a, li, ri, pc_ >= psnr_min_centi, pc_)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"lb{i:05d}", f"lb{i:05d}_p{(i // dup_every) % 3}")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# CTPH (ssdeep-style) fuzzy-hash byte-stream dedup
# ---------------------------------------------------------------------------

def _ctph_corpus_dir(n_base: int = 96) -> str:
    """Deterministic byte-blob fixture for CTPH: base files of 8–32 KB
    pseudo-random bytes; every 3rd also appears EDITED (4-byte insert
    at 25%, 16-byte overwrite at 50%, 8-byte delete at 75% — the
    offset-shifting edit class that kills fixed-offset hashing and is
    exactly what CTPH resynchronizes through); every 6th also appears
    as a DISTRACTOR sharing only the first 1/8 of its bytes (must NOT
    pair). Truth rides the naming: "ctNNNNN_e" duplicates "ctNNNNN";
    "_x" rows are distractors."""
    out = f"/tmp/destor_ray_ctph/v1_n{n_base}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        rng = np.random.default_rng(1000 + i)
        n = 8000 + (i * 997) % 24000
        base = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        ids.append(f"ct{i:05d}")
        blobs.append(base)
        if i % 3 == 0:
            erng = np.random.default_rng(5000 + i)
            b = bytearray(base)
            p1, p2, p3 = n // 4, n // 2, 3 * n // 4
            b[p1:p1] = bytes(erng.integers(0, 256, 4, dtype=np.uint8))
            b[p2:p2 + 16] = bytes(
                erng.integers(0, 256, 16, dtype=np.uint8))
            del b[p3:p3 + 8]
            ids.append(f"ct{i:05d}_e")
            blobs.append(bytes(b))
        if i % 6 == 0:
            xrng = np.random.default_rng(9000 + i)
            keep = n // 8
            ids.append(f"ct{i:05d}_x")
            blobs.append(base[:keep] + xrng.integers(
                0, 256, n - keep, dtype=np.uint8).tobytes())
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"files": pa.table({
        "file_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


_CTPH_CHARIDX = {c: k for k, c in enumerate(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/")}


def _ctph_gram_keys(dig: str, scale: int) -> np.ndarray:
    """Unique int64 band keys for the 7-grams of a digest at a given
    blocksize scale: each base64 char is exactly 6 bits, so a 7-gram
    packs LOSSLESSLY into 42 bits; the scale exponent (blocksize =
    3·2^k ⇒ k = bit_length−2) rides the high bits. ssdeep's matching
    precondition — a common 7-gram at a common blocksize — becomes a
    plain hash-key equality, i.e. one LSH exchange."""
    if len(dig) < 7:
        return np.empty(0, np.int64)
    idx = np.array([_CTPH_CHARIDX[c] for c in dig], np.int64)
    g = np.zeros(len(idx) - 6, np.int64)
    for k in range(7):
        g |= idx[k:len(idx) - 6 + k] << (6 * k)
    k_scale = scale.bit_length() - 2
    return np.unique(g | (np.int64(k_scale) << np.int64(42)))


def ctph_fuzzy_dedup(sf_dir: str, n_base: int = 96,
                     score_min: int = 75):
    """(n_files, n_planted, n_distractors, n_candidate_pairs,
    n_verified_pairs, n_true, n_false, recall_ppm) — byte-stream
    near-dup detection via CTPH fuzzy hashing (spamsum/ssdeep,
    Kornblum 2006): each file folds to a ~100 B signature whose pieces
    are cut at content-defined trigger points, so insert/delete edits
    shift offsets but the digest survives — the compact-signature
    complement to the CDC chunk-overlap channel (destor's byte-level
    machinery: same boundaries idea, a signature instead of a chunk
    list crossing the wire). Candidates = ssdeep's own precondition (a
    shared 7-gram at a common blocksize scale, one packed-key LSH
    exchange: d1 grams at bs, d2 grams at 2·bs, so files one scale
    apart rendezvous through d2); verify = scaled edit-distance
    similarity of the digests AT THE MEETING SCALE, riding the band
    rows (≤64 chars — raw bytes never shuffle).

    MEASURED on the planted fixture: true-pair score ≥ 95, the
    1/8-shared-prefix distractors reach ≤ 57, and fully-distinct files
    share ZERO 7-grams (42-bit gram space) — the 75 gate has ~20-point
    margins both ways.

    Scale shape: one vectorized-rolling-hash signature pass (the
    trigger scan is pure numpy over lagged views), one band exchange
    whose volume is ~115 gram rows × ~80 B per file independent of
    file size, one pair-dedup groupby."""
    from ..functions import ctph
    from ..stages.grouped import bucketed_group_map

    d = _ctph_corpus_dir(n_base=n_base)
    ds = ray.data.read_parquet(f"{d}/files.parquet")
    n_planted = -(-n_base // 3)
    n_distract = -(-n_base // 6)
    n_files = n_base + n_planted + n_distract

    def signature(batch: pa.Table) -> pa.Table:
        fids, keys, digs = [], [], []
        for fid, data in zip(batch["file_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            bs, d1, d2 = ctph.digest(data)
            for dig, scale in ((d1, bs), (d2, 2 * bs)):
                for k in _ctph_gram_keys(dig, scale):
                    fids.append(fid)
                    keys.append(int(k))
                    digs.append(dig)
        return pa.table({
            "bkey": pa.array(keys, pa.int64()),
            "file_id": pa.array(fids, pa.string()),
            "dig": pa.array(digs, pa.string()),
        })

    bands = ds.map_batches(signature, batch_size=32, concurrency=2,
                           batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "file_id", dedupe=True)
        digs = df["dig"].to_numpy()
        sc = np.empty(len(li), np.int64)
        for k in range(len(li)):
            sc[k] = ctph.similarity(digs[li[k]], digs[ri[k]])
        return _emit_pairs(ids_a, li, ri, sc >= score_min, sc,
                           score_col="score")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"ct{i:05d}", f"ct{i:05d}_e")
             for i in range(0, n_base, 3)}
    got = set(zip(pairs["l"], pairs["r"]))
    n_true = len(got & truth)
    n_false = len(got - truth)

    import pandas as pd
    return pd.DataFrame({
        "n_files": [n_files], "n_planted": [n_planted],
        "n_distractors": [n_distract],
        "n_candidate_pairs": [n_cand],
        "n_verified_pairs": [len(got)],
        "n_true": [n_true], "n_false": [n_false],
        "recall_ppm": [n_true * 1_000_000 // n_planted],
    }).astype("int64")


# ---------------------------------------------------------------------------
# Photometric-invariant near-dup detection (brightness/contrast edits)
# ---------------------------------------------------------------------------

def _tint_corpus_dir(n_base: int = 144, quality: int = 85,
                     dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED PHOTOMETRIC near-dups:
    every dup_every-th base image also appears brightness/contrast
    adjusted (y' = clip(a·y + b), a cycling 0.7..1.3, b cycling
    −30..30 — the auto-enhance every re-upload app applies) and
    re-encoded at a lower quality. Truth rides the naming:
    "phNNNNN_t" duplicates "phNNNNN"."""
    from .. import corpus as corpus_mod
    from .. import jpeg

    out = (f"/tmp/destor_ray_tintdup/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=7, row=i)
        ids.append(f"ph{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            a = 0.7 + 0.05 * ((i // dup_every) % 13)
            b = -30 + 6 * ((i // dup_every) % 11)
            tinted = np.clip(px.astype(np.float64) * a + b,
                             0, 255).astype(np.uint8)
            ids.append(f"ph{i:05d}_t")
            blobs.append(jpeg.encode(tinted, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _zncc(ta: np.ndarray, tb: np.ndarray) -> float:
    """Zero-normalized cross-correlation of two gray thumbs — exactly
    invariant under y' = a·y + b with a > 0 (mean-centering kills b,
    norm division kills a); the verify arm PSNR cannot provide here
    (measured: true tint pairs bottom at 11 dB thumb PSNR)."""
    a = ta.astype(np.float64).ravel()
    b = tb.astype(np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    na = np.sqrt((a * a).sum())
    nb = np.sqrt((b * b).sum())
    if na == 0 or nb == 0:
        return 1.0 if na == nb else 0.0
    return float((a * b).sum() / (na * nb))


def photometric_image_dedup(sf_dir: str, n_base: int = 144,
                            dup_every: int = 3, ah_max: int = 6,
                            zncc_min_ppm: int = 940_000):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — near-dup detection that survives
    BRIGHTNESS/CONTRAST edits (y' = clip(a·y+b): auto-enhance, fade
    filters, exposure fixes — the photometric transform class, as
    common on re-uploads as the geometric classes the dihedral /
    letterbox / resize channels cover). The candidate side is nearly
    free: aHash thresholds each pixel against the thumb MEAN, which is
    equivariant under affine luma, so the hash is almost exactly
    invariant (MEASURED: planted tint pairs move ≤ 2 aHash bits;
    phash, whose low-freq DCT signs also survive a>0 scaling up to
    clipping, moves ≤ 20 — both banded, the union collides every
    pair). The verify arm is the novel piece: thumb PSNR FAILS under
    tint (true pairs bottom at 11 dB — a correct PSNR gate would
    reject every planted pair), so verification is zero-normalized
    cross-correlation, mathematically invariant to the transform —
    the image twin of the audio channel's mean-centered
    spectral-profile correlation.

    MEASURED margins (this synthetic corpus is the ADVERSARIAL case —
    smooth gradients correlate strongly across distinct images): true
    ZNCC ≥ 0.9705 vs distinct max 0.9075 at both 16² and 32² thumbs;
    the 0.94 gate has ~0.03 on each side. On natural photos
    distinct-pair ZNCC runs far lower; the aHash ≤ 6 prefilter
    (true ≤ 2) additionally bounds verify cost.

    Scale shape: one decode pass, dual-hash band exchange with 16×16
    thumbs riding, one pair-dedup groupby — the flagship topology."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _tint_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class GraySignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            grays, thumbs = [], []
            for data in batch["bytes"].to_pylist():
                g = codec.to_gray(codec.decode(data))
                grays.append(codec.resize_nn(g, 32, 32))
                thumbs.append(codec.resize_nn(g, 16, 16).tobytes())
            stack = np.stack(grays) if ids else \
                np.empty((0, 32, 32), np.uint8)
            ph = codec.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(GraySignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("ahash", "thumb"), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        from .. import codec as codec_mod
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        empty = pa.table({"l": pa.array([], pa.string()),
                          "r": pa.array([], pa.string()),
                          "zncc_ppm": pa.array([], pa.int64())})
        if not len(li):
            return empty
        ahv = df["ahash"].to_numpy(np.int64)
        pre = codec_mod.hamming64(ahv[li], ahv[ri]) <= ah_max
        li, ri = li[pre], ri[pre]
        if not len(li):
            return empty
        thumbs = _thumb_matrix(df).astype(np.float64)
        z_ppm = np.round(
            _zncc_pairs(thumbs[li], thumbs[ri]) * 1_000_000) \
            .astype(np.int64)
        return _emit_pairs(ids_a, li, ri, z_ppm >= zncc_min_ppm,
                           z_ppm, score_col="zncc_ppm")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"ph{i:05d}", f"ph{i:05d}_t")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Video shot-boundary detection / keyframe selection (MJPEG AVI)
# ---------------------------------------------------------------------------

def _avi_shot_corpus_dir(n_videos: int = 24,
                         frames_per_video: int = 24) -> str:
    """Deterministic MJPEG-AVI fixture WITH PLANTED SHOT CUTS: video i
    contains 1 + i % 4 shots; each shot's frames share one source
    image under gentle intra-shot motion (1-px roll + small brightness
    ramp per frame, the same motion model as the dedup fixture), and
    shots switch to a DIFFERENT source image at deterministic cut
    frames (evenly spaced; shot sources are spaced 4 corpus rows apart
    so adjacent shots are genuinely distinct content). Truth = the cut
    positions."""
    from .. import avi as avi_mod
    from .. import corpus as corpus_mod
    from .. import jpeg as jpeg_mod

    out = f"/tmp/destor_ray_avi_shots/v2_n{n_videos}_f{frames_per_video}"
    if os.path.isdir(out):
        return out
    ids, blobs, cuts_col = [], [], []
    for i in range(n_videos):
        n_shots = 1 + i % 4
        cuts = [(s * frames_per_video) // n_shots
                for s in range(1, n_shots)]
        bounds = [0] + cuts + [frames_per_video]
        frames = []
        w = h = None
        for s in range(n_shots):
            px, w0, h0, _, _ = corpus_mod._base_pixels(
                seed=17, row=100 + i * 16 + s * 4)
            if w is None:
                w, h = w0, h0
            else:
                px = px[:h, :w]          # all shots on the video's canvas
                if px.shape[:2] != (h, w):
                    px = np.pad(px, ((0, h - px.shape[0]),
                                     (0, w - px.shape[1]), (0, 0)),
                                mode="edge")
            for j in range(bounds[s], bounds[s + 1]):
                fr = np.roll(px, shift=(j - bounds[s]), axis=1) \
                    .astype(np.int16)
                fr = np.clip(fr + 2 * (j - bounds[s]), 0, 255) \
                    .astype(np.uint8)
                frames.append(jpeg_mod.encode(fr, quality=85))
        ids.append(f"sv{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(frames, w=w, h=h, fps=10))
        cuts_col.append(",".join(map(str, cuts)))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "true_cuts": pa.array(cuts_col, pa.string()),
    })})


def avi_shot_stats(sf_dir: str, n_videos: int = 24,
                   diff_min_centi: int = 1200,
                   ratio_centi: int = 300):
    """(video_id, n_frames, n_shots, cuts, keyframes,
    max_intra_diff_centi, min_cut_diff_centi) — SHOT-BOUNDARY
    detection + keyframe selection over real MJPEG AVI: the video
    curation primitive behind scene-level sampling (training pipelines
    sample k frames PER SHOT, not per video — a 2-shot video sampled
    uniformly can miss a whole scene). A cut is a spike in the
    frame-to-frame mean absolute difference of 16×16 DC-luma thumbs —
    every frame is decoded DC-ONLY (header walk + Huffman DC scan, no
    IDCT; at 100 TB shot detection stays a metadata-plus-DC-scan read,
    the property the whole video path is built on). The keyframe per
    shot is its middle frame. map-only per video (shot structure is
    video-local), no shuffle; the result table is video-domain-sized.

    The detection gate is HYBRID — a transition is a cut iff its diff
    clears BOTH an absolute floor (mean |Δ| ≥ 12 gray levels; guards
    near-static videos whose median diff ~0 would make any twitch a
    relative spike) AND a per-video relative gate (≥ 3× the video's
    median frame diff; guards high-motion videos whose pans push
    absolute diffs up — an absolute-only gate was MEASURED failing on
    a 3-px/frame-pan variant of this fixture, intra 25.9 vs cut 28.9).
    Fixture margins: absolute intra-max 9.0 vs cut-min 19.2; relative
    intra-max 1.88× vs cut-min 5.23×. The test pins exact cut recovery
    and reports the measured margin columns."""
    from .. import avi as avi_mod
    from .. import codec, jpeg

    d = _avi_shot_corpus_dir(n_videos=n_videos)
    ds = ray.data.read_parquet(f"{d}/videos.parquet",
                               columns=["video_id", "bytes"])

    class ShotDetect:
        def __call__(self, batch: pa.Table) -> pa.Table:
            vids, nfs, nsh, cuts_s, keys_s, mi, mc = \
                [], [], [], [], [], [], []
            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = avi_mod.decode_frames(data)
                thumbs = np.stack([
                    codec.resize_nn(jpeg.decode_dc_luma(f), 16, 16)
                    .astype(np.int16) for f in frames])
                diffs = np.abs(np.diff(thumbs, axis=0)) \
                    .mean(axis=(1, 2))           # (n_frames-1,)
                dc = np.round(diffs * 100).astype(np.int64)
                med = max(float(np.median(dc)), 1.0)
                cut_mask = (dc >= diff_min_centi) & \
                    (dc * 100 >= ratio_centi * med)
                cuts = (np.flatnonzero(cut_mask) + 1).tolist()
                bounds = [0] + cuts + [len(frames)]
                keyframes = [(bounds[s] + bounds[s + 1] - 1) // 2
                             for s in range(len(bounds) - 1)]
                vids.append(vid)
                nfs.append(len(frames))
                nsh.append(len(cuts) + 1)
                cuts_s.append(",".join(map(str, cuts)))
                keys_s.append(",".join(map(str, keyframes)))
                intra = dc[~cut_mask]
                mi.append(int(intra.max()) if len(intra) else 0)
                mc.append(int(dc[cut_mask].min()) if cuts else -1)
            return pa.table({
                "video_id": pa.array(vids, pa.string()),
                "n_frames": pa.array(nfs, pa.int64()),
                "n_shots": pa.array(nsh, pa.int64()),
                "cuts": pa.array(cuts_s, pa.string()),
                "keyframes": pa.array(keys_s, pa.string()),
                "max_intra_diff_centi": pa.array(mi, pa.int64()),
                "min_cut_diff_centi": pa.array(mc, pa.int64()),
            })

    out = ds.map_batches(ShotDetect, batch_size=8, concurrency=2,
                         batch_format="pyarrow").to_pandas()
    return out.sort_values("video_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Tone-curve-invariant image dedup (gamma / S-curve / histogram stretch)
# ---------------------------------------------------------------------------

def _tone_corpus_dir(n_base: int = 144, quality: int = 85,
                     dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED TONE-CURVE near-dups:
    every dup_every-th base image also appears under a NONLINEAR
    monotone tone map (cycling gamma 0.45/0.6/1.6/2.2, smoothstep and
    cosine S-curves, and a clipping histogram stretch — the
    curves/levels edit every photo app ships) and re-encoded at a
    lower quality. Truth rides the naming: "tcNNNNN_t" duplicates
    "tcNNNNN"."""
    from .. import corpus as corpus_mod
    from .. import jpeg

    out = (f"/tmp/destor_ray_tonedup/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=11, row=i)
        ids.append(f"tc{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            t = px.astype(np.float64) / 255.0
            k = (i // dup_every) % 7
            if k == 0:
                y = t ** 0.45
            elif k == 1:
                y = t ** 0.6
            elif k == 2:
                y = t ** 1.6
            elif k == 3:
                y = t ** 2.2
            elif k == 4:
                y = 3 * t * t - 2 * t * t * t          # smoothstep
            elif k == 5:
                y = np.clip((t - 0.1) / 0.75, 0, 1)    # clipping stretch
            else:
                y = 0.5 - 0.5 * np.cos(np.pi * t)      # cosine S-curve
            toned = np.clip(np.round(y * 255), 0, 255).astype(np.uint8)
            ids.append(f"tc{i:05d}_t")
            blobs.append(jpeg.encode(toned, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _rank_image(g32: np.ndarray) -> np.ndarray:
    """Average-tie rank transform of a gray thumb, rescaled to 0..255
    float. Any STRICTLY MONOTONE tone map leaves the rank image exactly
    unchanged (order is preserved; only uint8 quantization ties and
    re-encode noise perturb it) — hashing the rank image instead of the
    pixels is what makes the band signatures tone-invariant."""
    v = g32.astype(np.float64).ravel()
    order = np.argsort(v, kind="stable")
    r = np.empty(len(v))
    sv = v[order]
    i = 0
    while i < len(v):
        j = i
        while j + 1 < len(v) and sv[j + 1] == sv[i]:
            j += 1
        r[order[i:j + 1]] = 0.5 * (i + j)
        i = j + 1
    return (r * (255.0 / (len(v) - 1))).reshape(g32.shape)


def _histmatch_zncc(ta: np.ndarray, tb: np.ndarray) -> float:
    """Histogram-match a onto b (monotone transport: a's sorted values
    replaced by b's sorted values — the exact inverse of WHATEVER
    monotone tone map separates them), then ZNCC. If b = T(a) for
    monotone T, matching recovers T and the score approaches 1 for any
    curve shape, including clipping stretches where plain ZNCC and
    Spearman both fail (measured on this corpus: plain-ZNCC true min
    0.925 but Spearman true 0.863 < distinct max 0.868 — overlapped;
    hist-match true min 0.9436 vs distinct max 0.8684)."""
    av = ta.astype(np.float64).ravel()
    bv = tb.astype(np.float64).ravel()
    order = np.argsort(av, kind="stable")
    am = np.empty_like(av)
    am[order] = np.sort(bv)
    x = am - am.mean()
    y = bv - bv.mean()
    nx = np.sqrt((x * x).sum())
    ny = np.sqrt((y * y).sum())
    if nx == 0 or ny == 0:
        return 1.0 if nx == ny else 0.0
    return float((x * y).sum() / (nx * ny))


def tonecurve_image_dedup(sf_dir: str, n_base: int = 144,
                          dup_every: int = 3, ah_max: int = 28,
                          hz_min_ppm: int = 900_000):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — near-dup detection that survives
    NONLINEAR monotone tone edits (gamma correction, S-curve contrast,
    histogram stretch — the curves/levels class; the photometric
    channel's affine y'=a·y+b machinery fails here because neither
    aHash's mean threshold nor ZNCC is invariant under a nonlinear
    map). Both arms are built on ORDER statistics, which any monotone
    map preserves:

    * candidates — hash the RANK IMAGE (average-tie rank transform of
      the 32×32 gray thumb) instead of the pixels: under monotone T the
      per-channel rank image is exactly unchanged (gray is only
      approximately so — luma is a MIX of per-channel maps), and dual
      phash+aHash over it move only re-encode noise (MEASURED:
      rank-aHash mean 2.0 bits vs 20 for plain aHash on the planted
      pairs; 48/48 pairs collide in the 8×8-bit dual band union);
    * verify — PER-CHANNEL HISTOGRAM-MATCHED ZNCC riding the band
      rows, gated on the MIN over R/G/B: per channel, a's sorted thumb
      values are replaced by b's (monotone transport = the exact
      inverse of whatever curve separates them), then ZNCC. Plain ZNCC
      fails (nonlinear), Spearman fails on clipping stretches AND
      overlaps the adversarial smooth-gradient distinct pairs
      (MEASURED on gray: Spearman true 0.863 < distinct 0.868;
      gray hist-match true 0.9436 vs distinct 0.9241 — two base
      gradients genuinely coincide in luma rank structure). The
      per-channel min settles it because apps curve each channel
      monotonically while the fixture's channel structures are
      independent: MEASURED true ≥ 0.9967 vs distinct ≤ 0.6576 —
      the 0.90 gate has ~0.10 / ~0.24 on the two sides.

    Scale shape: the flagship topology — one decode pass, dual-hash
    band exchange with 3×16×16 box-mean channel thumbs riding, one
    pair-dedup groupby; payloads never shuffle."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _tone_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class RankSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            ranks, thumbs = [], []
            for data in batch["bytes"].to_pylist():
                px = codec.decode(data)
                g32 = codec.resize_nn(codec.to_gray(px), 32, 32)
                ranks.append(_rank_image(g32))
                chans = []
                for c in range(3):
                    c32 = codec.resize_nn(px[:, :, c], 32, 32) \
                        .astype(np.float64)
                    t16 = c32.reshape(16, 2, 16, 2).mean(axis=(1, 3))
                    chans.append(np.round(t16).astype(np.uint8))
                thumbs.append(np.stack(chans).tobytes())
            stack = np.stack(ranks) if ids else \
                np.empty((0, 32, 32), np.float64)
            ph = codec.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(RankSignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("ahash", "thumb"), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        from .. import codec as codec_mod
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        empty = pa.table({"l": pa.array([], pa.string()),
                          "r": pa.array([], pa.string()),
                          "hz_ppm": pa.array([], pa.int64())})
        if not len(li):
            return empty
        ahv = df["ahash"].to_numpy(np.int64)
        pre = codec_mod.hamming64(ahv[li], ahv[ri]) <= ah_max
        li, ri = li[pre], ri[pre]
        if not len(li):
            return empty
        thumbs = _thumb_matrix(df).reshape(len(df), 3, 16, 16)
        z_ppm = np.empty(len(li), np.int64)
        for k in range(len(li)):
            a3, b3 = thumbs[li[k]], thumbs[ri[k]]
            z = min(max(_histmatch_zncc(a3[c], b3[c]),
                        _histmatch_zncc(b3[c], a3[c]))
                    for c in range(3))
            z_ppm[k] = int(round(z * 1_000_000))
        return _emit_pairs(ids_a, li, ri, z_ppm >= hz_min_ppm,
                           z_ppm, score_col="hz_ppm")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"tc{i:05d}", f"tc{i:05d}_t")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Overlay/occlusion-robust image dedup (logo / timestamp / watermark box)
# ---------------------------------------------------------------------------

def _overlay_corpus_dir(n_base: int = 144, quality: int = 85,
                        dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED OVERLAY near-dups: every
    dup_every-th base image also appears with an opaque rectangular
    overlay (solid box + contrasting border — the logo / timestamp /
    watermark-bar class, 4–11% of area at a deterministic position)
    and re-encoded at a lower quality. Truth rides the naming:
    "ovNNNNN_t" duplicates "ovNNNNN"."""
    from .. import corpus as corpus_mod
    from .. import jpeg

    out = (f"/tmp/destor_ray_overlaydup/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=19, row=i)
        ids.append(f"ov{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            k = i // dup_every
            h, w = px.shape[:2]
            rng = np.random.default_rng(1000 + k)
            fh = rng.uniform(0.18, 0.33)
            fw = rng.uniform(0.18, 0.38)
            oh, ow = max(4, int(h * fh)), max(4, int(w * fw))
            y0 = int(rng.uniform(0, h - oh))
            x0 = int(rng.uniform(0, w - ow))
            ov = px.copy()
            color = np.array([255, 255, 255]) if k % 2 \
                else np.array([10, 10, 10])
            ov[y0:y0 + oh, x0:x0 + ow] = color
            ov[y0:y0 + 2, x0:x0 + ow] = 255 - color
            ids.append(f"ov{i:05d}_t")
            blobs.append(jpeg.encode(ov, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _trimmed_tile_psnr(ta: np.ndarray, tb: np.ndarray,
                       drop: int = 6) -> float:
    """PSNR over a 16×16 thumb pair EXCLUDING the `drop` worst 4×4
    tiles by MSE — the occlusion-robust verify: a localized overlay
    concentrates all error into the few tiles it covers (drop them and
    the rest must agree), while structurally different images disagree
    EVERYWHERE so trimming cannot rescue them (measured: true ≥ 41.5 dB
    vs distinct ≤ 24.7 dB with drop=4; plain PSNR on the same true
    pairs bottoms at 13.6 dB — a global gate rejects every one).
    drop=6 default: a 0.33h×0.38w overlay box can SPAN up to 3×3 tile
    rows/cols once NN-resize smears its edges — one omni fixture draw
    measured 25.1 dB at drop=4 (miss) vs 45.9 at drop=6, while the
    distinct background only rises 22.1 → 22.8 dB (the 32 dB gate
    keeps a 23 dB margin; trimming cannot rescue structurally
    different thumbs because they disagree in EVERY tile)."""
    a = ta.astype(np.float64)
    b = tb.astype(np.float64)
    tiles_a = a.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
    tiles_b = b.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
    mse = ((tiles_a - tiles_b) ** 2).mean(axis=1)
    m = np.sort(mse)[:16 - drop].mean()
    return 99.0 if m == 0 else float(10 * np.log10(255 * 255 / m))


def overlay_image_dedup(sf_dir: str, n_base: int = 144,
                        dup_every: int = 3, psnr_min_centi: int = 3200):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — near-dup detection that survives a
    LOCALIZED OPAQUE EDIT (station logo, timestamp bar, watermark box,
    sticker — re-uploads routinely stamp 3–11% of the frame; a LOCAL
    transform class, orthogonal to the global classes the photometric /
    tone-curve / letterbox channels cover). The candidate side needs no
    new machinery: an overlay touches few 8×8 aHash blocks so most
    aHash bits are clean (MEASURED: 6.6 bits mean; phash's global DCT
    takes 25.5 — the dual union still collides 48/48), banding
    survives as-is. The verify arm is the new piece: global thumb PSNR
    FAILS (true pairs bottom at 13.6 dB — the overlay dominates the
    MSE), so verification is TRIMMED-TILE PSNR — per-4×4-tile MSE with
    the worst 4 of 16 tiles dropped, i.e. "the best 75% of the image
    must agree": true ≥ 41.5 dB vs distinct ≤ 24.7 dB (distinct images
    disagree everywhere; trimming cannot rescue them). The 32 dB gate
    has ~9 dB on each side. The duplicate class is explicitly "same
    image outside ≤4 thumb tiles (≤25% of area)".

    Scale shape: the flagship topology — one decode pass, dual-hash
    band exchange with 16×16 thumbs riding, one pair-dedup groupby;
    payloads never shuffle."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _overlay_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class GraySignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            grays, thumbs = [], []
            for data in batch["bytes"].to_pylist():
                g = codec.to_gray(codec.decode(data))
                grays.append(codec.resize_nn(g, 32, 32))
                thumbs.append(codec.resize_nn(g, 16, 16).tobytes())
            stack = np.stack(grays) if ids else \
                np.empty((0, 32, 32), np.uint8)
            ph = codec.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(GraySignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("thumb",), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        thumbs = _thumb_matrix(df)
        pc_ = np.empty(len(li), np.int64)
        for k in range(len(li)):
            p = _trimmed_tile_psnr(thumbs[li[k]].reshape(16, 16),
                                   thumbs[ri[k]].reshape(16, 16))
            pc_[k] = int(round(p * 100))
        return _emit_pairs(ids_a, li, ri, pc_ >= psnr_min_centi, pc_,
                           score_col="tpsnr_centi")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"ov{i:05d}", f"ov{i:05d}_t")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Aggressive-crop-invariant dedup: content-defined 2D anchors
# (the CDC boundary idea — destor's chunking insight, ref
# src/chunking.c rabin/gear trigger scan — lifted to two dimensions:
# positions chosen by CONTENT, not by grid, so the same scene picks
# the same anchors on both sides of an arbitrary-offset crop).


def _box_smooth3(g: np.ndarray) -> np.ndarray:
    """3×3 clamped box mean of a (h, w) gray image, float32 — the JPEG
    noise suppressor under the anchor detector and patch hash."""
    f = g.astype(np.float32)
    c = np.cumsum(np.cumsum(np.pad(f, ((1, 0), (1, 0))), 0), 1)
    h, w = g.shape
    y0 = np.clip(np.arange(h) - 1, 0, h)
    y1 = np.clip(np.arange(h) + 2, 0, h)
    x0 = np.clip(np.arange(w) - 1, 0, w)
    x1 = np.clip(np.arange(w) + 2, 0, w)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = c[y1][:, x1] - c[y0][:, x1] - c[y1][:, x0] + c[y0][:, x0]
    return (s / area).astype(np.float32)


def _anchor_points(sm: np.ndarray, r: int = 3, margin: int = 8,
                   cap: int = 48) -> np.ndarray:
    """(k, 2) int anchor positions: strict local maxima of the smoothed
    luma in a (2r+1)² window, refined to the window CENTROID (measured:
    raw argmax on near-flat peaks shifts several px under q70 re-encode
    noise; the luma-weighted centroid is translation-covariant and
    noise-stable to ±2 px), margin-clamped so the 16×16 patch fits.
    Deterministically capped at `cap` by peak prominence (center minus
    window mean) so megapixel inputs emit bounded band rows."""
    from numpy.lib.stride_tricks import sliding_window_view

    h, w = sm.shape
    k = 2 * r + 1
    if h < max(k, 2 * margin + 1) or w < max(k, 2 * margin + 1):
        return np.empty((0, 2), np.int64)
    win = sliding_window_view(sm, (k, k))
    mx = win.max(axis=(2, 3))
    centers = sm[r:h - r, r:w - r]
    cnt = (win == mx[..., None, None]).sum(axis=(2, 3))
    ys, xs = np.nonzero((centers >= mx) & (cnt == 1))
    ys += r
    xs += r
    if not len(ys):
        return np.empty((0, 2), np.int64)
    off = np.arange(-r, r + 1, dtype=np.float32)
    out_y = np.empty(len(ys), np.int64)
    out_x = np.empty(len(ys), np.int64)
    prom = np.empty(len(ys), np.float32)
    for i, (y, x) in enumerate(zip(ys, xs)):
        wv = sm[y - r:y + r + 1, x - r:x + r + 1]
        wgt = wv - wv.min()
        tot = wgt.sum()
        if tot > 0:
            out_y[i] = y + int(round(float(wgt.sum(1) @ off) / tot))
            out_x[i] = x + int(round(float(wgt.sum(0) @ off) / tot))
        else:
            out_y[i], out_x[i] = y, x
        prom[i] = wv[r, r] - wv.mean()
    keep = ((out_y >= margin) & (out_y < h - margin)
            & (out_x >= margin) & (out_x < w - margin))
    out_y, out_x, prom = out_y[keep], out_x[keep], prom[keep]
    if len(out_y) > cap:
        top = np.argsort(-prom, kind="stable")[:cap]
        out_y, out_x = out_y[top], out_x[top]
    return np.stack([out_y, out_x], axis=1)


def _patch_hash16(sm: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """64-bit aHash per anchor over the 16×16 smoothed patch around it
    (8×8 grid of 2×2 means thresholded at the patch mean) — uint64[k].
    Translation-EXACT: no global resample touches the patch, so the
    same content hashes identically at any crop offset."""
    if not len(pts):
        return np.empty(0, np.uint64)
    dy = np.arange(-8, 8)
    patches = sm[(pts[:, 0][:, None, None] + dy[None, :, None]),
                 (pts[:, 1][:, None, None] + dy[None, None, :])]
    g = patches.reshape(-1, 8, 2, 8, 2).mean(axis=(2, 4)).reshape(-1, 64)
    bits = (g > g.mean(axis=1, keepdims=True)).astype(np.uint64)
    wts = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
    return (bits * wts).sum(axis=1, dtype=np.uint64)


def _patch16_bytes(sm: np.ndarray, y: int, x: int) -> bytes:
    return (np.clip(sm[y - 8:y + 8, x - 8:x + 8], 0, 255)
            .astype(np.uint8).tobytes())


def _false_by_kind(false_pairs, truth_by_kind):
    """Attribute each FALSE pair to the planted class of a member id
    that appears in the planted-truth plan (ADVICE r2: per-class
    n_false was hardcoded 0, so only the _total row could reveal a
    false merge). Pairs touching no planted id are left unattributed —
    they still count in the _total row, so per-class n_false sums to
    _total n_false minus the unattributed residue."""
    id_kind: dict = {}
    for kind, pairs in truth_by_kind.items():
        for l, r in pairs:
            id_kind.setdefault(r, kind)   # dup ids are class-specific
            id_kind.setdefault(l, kind)
    out = {k: 0 for k in truth_by_kind}
    for l, r in false_pairs:
        k = id_kind.get(r, id_kind.get(l))
        if k is not None:
            out[k] += 1
    return out


def _box_thumb32(g: np.ndarray, n: int = 32) -> np.ndarray:
    """n×n box-mean thumb of an arbitrary (h, w) gray — uint8. Unlike
    resize_nn this AVERAGES each cell, so overlap-window sampling at
    fractional rects stays faithful. Inputs SMALLER than n×n (e.g. a
    quarter-res re-upload of a 32 px base) are NN-replicated up first
    — without this, zero-height cells divide by zero and pour NaNs
    into the uint8 thumb."""
    h, w = g.shape
    if h < n:
        g = np.repeat(g, -(-n // h), axis=0)
        h = g.shape[0]
    if w < n:
        g = np.repeat(g, -(-n // w), axis=1)
        w = g.shape[1]
    c = np.cumsum(np.cumsum(
        np.pad(g.astype(np.float64), ((1, 0), (1, 0))), 0), 1)
    return _box_sample(c, h, w, n)


def _box_sample(c: np.ndarray, h: int, w: int, n: int) -> np.ndarray:
    """Sample an n×n box-mean grid from a (h+1, w+1) integral image."""
    ys = (np.arange(n + 1) * h) // n
    xs = (np.arange(n + 1) * w) // n
    s = (c[ys[1:]][:, xs[1:]] - c[ys[:-1]][:, xs[1:]]
         - c[ys[1:]][:, xs[:-1]] + c[ys[:-1]][:, xs[:-1]])
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return np.clip(s / area, 0, 255).astype(np.uint8)


def _box_thumbs(g: np.ndarray, sizes=(32, 16)) -> list:
    """Several box-mean thumbs of one gray plane sharing ONE O(h·w)
    integral image (ADVICE r2: the full-box video path built the
    dominant-cost integral twice per slot frame). Exact-identical to
    calling _box_thumb32 per size; inputs smaller than the largest
    size take the (cheap) per-size fallback so the replication guard
    semantics stay bit-equal."""
    h, w = g.shape
    if h < max(sizes) or w < max(sizes):
        return [_box_thumb32(g, n) for n in sizes]
    c = np.cumsum(np.cumsum(
        np.pad(g.astype(np.float64), ((1, 0), (1, 0))), 0), 1)
    return [_box_sample(c, h, w, n) for n in sizes]


def _overlap_psnr_sweep(ta: np.ndarray, ha: int, wa: int, tb: np.ndarray,
                        hb: int, wb: int, dy: int, dx: int,
                        sweep: int = 2, min_frac: float = 0.25) -> float:
    """Best PSNR of the 16×16-sampled OVERLAP windows of two global
    thumbs over a ±sweep displacement neighborhood (the anchor centroid
    is stable to ±2 px; measured: an exact displacement scores ≥30.7 dB
    on true pairs but a ±2 error alone drops it to ~24 dB — the sweep
    is the bounded alignment search, the letterbox channel's pattern).
    Overlaps below min_frac of the smaller image are rejected — tiny
    corner overlaps are too easy to match by chance. Vectorized: all
    (2·sweep+1)² offsets sample both thumbs in ONE fancy-indexed
    gather each."""
    k = 16
    na, nb_ = ta.shape[0], tb.shape[0]
    offs = np.arange(-sweep, sweep + 1)
    dyy = dy + np.repeat(offs, len(offs))
    dxx = dx + np.tile(offs, len(offs))
    y0a = np.maximum(0, dyy)
    y1a = np.minimum(ha, dyy + hb)
    x0a = np.maximum(0, dxx)
    x1a = np.minimum(wa, dxx + wb)
    ok = ((y1a - y0a >= 8) & (x1a - x0a >= 8)
          & ((y1a - y0a) * (x1a - x0a)
             >= min_frac * min(ha * wa, hb * wb)))
    if not ok.any():
        return -1.0
    dyy, dxx = dyy[ok], dxx[ok]
    y0a, y1a, x0a, x1a = y0a[ok], y1a[ok], x0a[ok], x1a[ok]
    cents = (np.arange(k) + 0.5) / k
    yca = y0a[:, None] + cents[None, :] * (y1a - y0a)[:, None]
    xca = x0a[:, None] + cents[None, :] * (x1a - x0a)[:, None]
    yia = np.clip((yca * na / ha).astype(int), 0, na - 1)
    xia = np.clip((xca * na / wa).astype(int), 0, na - 1)
    yib = np.clip(((yca - dyy[:, None]) * nb_ / hb).astype(int),
                  0, nb_ - 1)
    xib = np.clip(((xca - dxx[:, None]) * nb_ / wb).astype(int),
                  0, nb_ - 1)
    a = ta[yia[:, :, None], xia[:, None, :]]
    b = tb[yib[:, :, None], xib[:, None, :]]
    mse = ((a - b) ** 2).mean(axis=(1, 2))
    return float(10.0 * np.log10(255.0 ** 2 / max(mse.min(), 1e-9)))


def _crop_base_pixels(i: int) -> np.ndarray:
    """Textured base for the crop fixture: smooth carrier + dense GRAY
    mid-frequency bumps (radius 1.8–4.5 px — what survives q70 JPEG;
    per-pixel noise would not). Anchor-based crop matching NEEDS local
    structure — the smooth flagship corpus has ~0 stable local maxima
    (measured: 2/14 anchor recall), exactly as SIFT-style matching
    fails on featureless photos; the applicability condition is
    documented on crop_image_dedup."""
    rng = np.random.default_rng(777 + i)
    sizes = (96, 128, 160)
    h = int(sizes[rng.integers(3)])
    w = int(sizes[rng.integers(3)])
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        a, b, cp = rng.uniform(0, 2 * np.pi, 3)
        fx, fy = rng.uniform(0.5, 2.5, 2)
        img[..., c] = (127 + 45 * np.sin(2 * np.pi * fx * xx / w + a)
                       + 35 * np.cos(2 * np.pi * fy * yy / h + b))
    nb = max(30, (h * w) // 200)
    cxs = rng.uniform(0, w, nb)
    cys = rng.uniform(0, h, nb)
    rs = rng.uniform(1.8, 4.5, nb)
    amps = rng.uniform(25, 55, nb) * rng.choice([-1, 1], nb)
    for k in range(nb):
        m = np.exp(-(((xx - cxs[k]) ** 2 + (yy - cys[k]) ** 2)
                     / (2 * rs[k] ** 2))).astype(np.float32)
        img += (m * amps[k])[..., None]
    return np.clip(img, 0, 255).astype(np.uint8)


def _crop_corpus_dir(n_base: int = 144, quality: int = 85,
                     dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED AGGRESSIVE-CROP
    near-dups: every dup_every-th base also appears as a 55–80 %-per-
    dimension crop window at a random offset, re-encoded at lower
    quality (the social-media / thumbnail crop class — pure window,
    no rescale). Truth rides the naming: "crNNNNN_t" dups "crNNNNN"."""
    from .. import jpeg

    out = (f"/tmp/destor_ray_cropdup/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    rng = np.random.default_rng(55)
    ids, blobs = [], []
    for i in range(n_base):
        px = _crop_base_pixels(i)
        h, w = px.shape[:2]
        ids.append(f"cr{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            fh, fw = rng.uniform(0.55, 0.8, 2)
            ch, cw = int(h * fh), int(w * fw)
            y0 = int(rng.uniform(0, h - ch))
            x0 = int(rng.uniform(0, w - cw))
            ids.append(f"cr{i:05d}_t")
            blobs.append(jpeg.encode(px[y0:y0 + ch, x0:x0 + cw],
                                     dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def crop_image_dedup(sf_dir: str, n_base: int = 144, dup_every: int = 3,
                     patch_gate_centi: int = 2700,
                     psnr_min_centi: int = 2700):
    """(n_images, n_planted, n_proposals, n_verified_pairs, n_true,
    n_false, recall_ppm) — near-dup detection that survives an
    AGGRESSIVE CROP (a 55–80 %-per-dimension window at arbitrary
    offset + re-encode: the social-media crop / thumbnail class; the
    flagship's global phash+aHash survive only ~2 % border trims —
    a content shift moves ≥20 bits and every band goes blind, and the
    letterbox channel's border trim finds no uniform border to cut).

    Candidates are CONTENT-DEFINED 2D ANCHORS — destor's CDC insight
    (ref src/chunking.c: boundaries chosen by content resynchronize
    across inserts) lifted to 2D: anchors = centroid-refined strict
    local maxima of the 3×3-smoothed luma, so the same scene picks the
    same anchor pixels on both sides of ANY crop offset; each anchor
    contributes a translation-exact 64-bit patch aHash through the
    standard 8×8-bit LSH band exchange with its 16×16 patch riding.
    In-bucket, colliding anchor pairs with patch PSNR ≥ 27 dB PROPOSE
    a displacement (anchor_a − anchor_b = the candidate crop offset).
    Patch votes alone CANNOT decide (measured: distinct smooth patches
    reach 40.8 dB and rack up to 4 consistent-displacement votes while
    true pairs can have a single matching anchor), so the verify arm
    is GLOBAL: a pair-keyed rendezvous attaches each side's 32×32
    box-mean thumb + dims once per pair, and the OVERLAP WINDOWS the
    proposed displacement implies are sampled to 16×16 and PSNR-gated
    at 27 dB with a ±2 displacement sweep (anchor centroids are stable
    to ±2 px; without the sweep a ±2 error drops true pairs to ~24 dB,
    inside the false range). MEASURED end-to-end on the 48-pair plan:
    every true pair proposes, true overlap PSNR ≥ 30.7 dB vs false
    ≤ 23.6 dB — ~3.5 dB margin each side of the 27 dB gate. Overlaps
    under 25 % of the smaller image are rejected (corner overlaps
    match by chance).

    APPLICABILITY: anchors need local structure. On featureless /
    pure-gradient images the detector finds no stable maxima (measured
    2/14 anchor recall on the smooth flagship corpus) — the same
    condition under which SIFT-style matching fails; such images fall
    back to the flagship's whole-image channels.

    Scale shape: one decode pass materializes a NARROW signature table
    (~1.4 KB/image: anchors + patch hashes + one thumb — the payload
    column never crosses a shuffle, and materializing the small table
    instead of re-decoding is the flagship's dedup.py pattern); band
    rows carry only the 16×16 patch (256 B), the 1 KB thumb ships once
    per PAIR SIDE via the tag-and-union rendezvous (the
    candidate_edges_rendezvous lever), and anchors are prominence-
    capped at 48/image so megapixel inputs emit bounded band rows."""
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _crop_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class CropSignature:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            rows = {"image_id": [], "h": [], "w": [], "thumb": [],
                    "ys": [], "xs": [], "hashes": [], "patches": []}
            for iid, data in zip(ids, batch["bytes"].to_pylist()):
                g = codec.to_gray(codec.decode(data))
                sm = _box_smooth3(g)
                pts = _anchor_points(sm)
                rows["image_id"].append(iid)
                rows["h"].append(g.shape[0])
                rows["w"].append(g.shape[1])
                rows["thumb"].append(_box_thumb32(g).tobytes())
                rows["ys"].append(pts[:, 0].astype(np.int32).tobytes())
                rows["xs"].append(pts[:, 1].astype(np.int32).tobytes())
                rows["hashes"].append(
                    _patch_hash16(sm, pts).tobytes())
                rows["patches"].append(b"".join(
                    _patch16_bytes(sm, y, x) for y, x in pts))
            return pa.table({
                "image_id": pa.array(rows["image_id"], pa.string()),
                "h": pa.array(rows["h"], pa.int32()),
                "w": pa.array(rows["w"], pa.int32()),
                "thumb": pa.array(rows["thumb"], pa.binary()),
                "ys": pa.array(rows["ys"], pa.binary()),
                "xs": pa.array(rows["xs"], pa.binary()),
                "hashes": pa.array(rows["hashes"], pa.binary()),
                "patches": pa.array(rows["patches"], pa.binary()),
            })

    sig = ds.map_batches(CropSignature, batch_size=64, concurrency=2,
                         batch_format="pyarrow").materialize()

    N_BANDS, BAND_BITS = 4, 16  # measured: 4×16 keeps 48/48 true-pair
    # proposal recall (each true pair has several matched anchors; one
    # clean band on one anchor suffices) at half the band-row volume
    # of 8×8-bit bands.

    def band_rows(batch: pa.Table) -> pa.Table:
        # fully vectorized (round 3): flatten the per-image anchor
        # arrays, compute all band keys in one broadcast shift, and
        # fan out x N_BANDS via np.repeat + Arrow take — no per-anchor
        # Python (this was the one channel whose band construction
        # looped; see omni_image_dedup for the shared idiom)
        ids = batch["image_id"]
        ys_l = [np.frombuffer(b, np.int32) for b in batch["ys"].to_pylist()]
        xs_l = [np.frombuffer(b, np.int32) for b in batch["xs"].to_pylist()]
        hs_l = [np.frombuffer(b, np.uint64)
                for b in batch["hashes"].to_pylist()]
        counts = np.array([len(y) for y in ys_l], np.int64)
        n = int(counts.sum())
        if n == 0:
            return pa.table({"bkey": pa.array([], pa.int64()),
                             "image_id": pa.array([], pa.string()),
                             "ay": pa.array([], pa.int32()),
                             "ax": pa.array([], pa.int32()),
                             "patch": pa.array([], pa.binary())})
        ys = np.concatenate(ys_l)
        xs = np.concatenate(xs_l)
        hs = np.concatenate(hs_l)
        patches = pa.array(
            [pb[a * 256:(a + 1) * 256]
             for pb, k in zip(batch["patches"].to_pylist(), counts)
             for a in range(k)], pa.binary())
        row_idx = np.repeat(np.arange(len(counts)), counts)
        shifts = np.arange(N_BANDS, dtype=np.uint64) * np.uint64(BAND_BITS)
        mask = np.uint64((1 << BAND_BITS) - 1)
        bits = ((hs[:, None] >> shifts[None, :]) & mask).astype(np.int64)
        bkey = (bits + (np.arange(N_BANDS, dtype=np.int64)
                        << BAND_BITS)[None, :]).reshape(-1)
        rep = np.repeat(np.arange(n), N_BANDS)
        return pa.table({
            "bkey": pa.array(bkey, pa.int64()),
            "image_id": ids.take(pa.array(row_idx[rep])),
            "ay": pa.array(ys[rep], pa.int32()),
            "ax": pa.array(xs[rep], pa.int32()),
            "patch": patches.take(pa.array(rep)),
        })

    bands = sig.drop_columns(["thumb", "h", "w"]) \
        .map_batches(band_rows, batch_format="pyarrow")

    # patch-MSE gate as a plain threshold: PSNR >= gate  <=>  MSE <=
    # 255² / 10^(gate/10)
    mse_max = 255.0 ** 2 / (10.0 ** (patch_gate_centi / 1000.0))

    def propose_bucket(df) -> pa.Table:
        import pandas as _pd
        parts = []
        for _, g in df.groupby("bkey", sort=False):
            n = len(g)
            if n < 2:
                continue
            ids = g["image_id"].to_numpy()
            ays = g["ay"].to_numpy().astype(np.int64)
            axs = g["ax"].to_numpy().astype(np.int64)
            pats = np.stack([np.frombuffer(p, np.uint8)
                             for p in g["patch"]]).astype(np.float32)
            # pairwise MSE via the gram trick, one matmul per bucket key
            sq = (pats * pats).sum(axis=1)
            mse = (sq[:, None] + sq[None, :]
                   - 2.0 * (pats @ pats.T)) / pats.shape[1]
            ii, jj = np.nonzero(np.triu(mse <= mse_max, k=1)
                                & (ids[:, None] != ids[None, :]))
            if not len(ii):
                continue
            # canonical orientation + displacement, vectorized (object-
            # dtype string compares are elementwise in numpy)
            swap = ids[ii] > ids[jj]
            l_ = np.where(swap, jj, ii)
            r_ = np.where(swap, ii, jj)
            parts.append(_pd.DataFrame({
                "pair": ids[l_].astype(object) + "|" + ids[r_].astype(object),
                "dy": (ays[l_] - ays[r_]).astype(np.int32),
                "dx": (axs[l_] - axs[r_]).astype(np.int32)}))
        if not parts:
            return pa.table({"pair": pa.array([], pa.string()),
                             "dy": pa.array([], pa.int32()),
                             "dx": pa.array([], pa.int32())})
        out = _pd.concat(parts).drop_duplicates(["pair", "dy", "dx"])
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    raw_props = bucketed_group_map(bands, "bkey", propose_bucket,
                                   num_buckets=8)

    # displacement-vote selection: one pair-keyed exchange collapses
    # the per-band proposal stream to <= max_disp well-separated
    # candidate displacements per pair, vote-ranked (the true offset
    # accumulates many anchor votes — median 8 on the planted plan —
    # while chance patch collisions scatter; a ±2-L∞ neighbor of a
    # chosen candidate is covered by the verify sweep and dropped).
    # Without this the verify stage would sweep EVERY band-collision
    # proposal (measured: 261k proposals for 192 images).
    MAX_DISP = 6

    def select_disps(df) -> pa.Table:
        pairs, dys, dxs = [], [], []
        for pair, g in df.groupby("pair", sort=False):
            cand = sorted(set(zip(g["dy"].tolist(), g["dx"].tolist())))
            if not cand:
                continue
            arr = np.array(cand, np.int64)
            # votes: deduped proposals within L-inf <= 2
            d = np.maximum(np.abs(arr[:, 0][:, None] - arr[:, 0][None, :]),
                           np.abs(arr[:, 1][:, None] - arr[:, 1][None, :]))
            votes = (d <= 2).sum(axis=1)
            order = np.lexsort((arr[:, 1], arr[:, 0], -votes))
            chosen = []
            for k in order:
                if any(max(abs(arr[k, 0] - arr[c, 0]),
                           abs(arr[k, 1] - arr[c, 1])) <= 2
                       for c in chosen):
                    continue
                chosen.append(k)
                if len(chosen) >= MAX_DISP:
                    break
            for k in chosen:
                pairs.append(pair)
                dys.append(int(arr[k, 0]))
                dxs.append(int(arr[k, 1]))
        ls = [p.split("|", 1)[0] for p in pairs]
        rs = [p.split("|", 1)[1] for p in pairs]
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "dy": pa.array(dys, pa.int32()),
                         "dx": pa.array(dxs, pa.int32())})

    props = bucketed_group_map(raw_props, "pair", select_disps,
                               num_buckets=8).materialize()

    # pair-keyed rendezvous: ship each side's (thumb, h, w) ONCE per
    # proposal side, never per band row (candidate_edges_rendezvous
    # topology).
    def rider_rows(batch: pa.Table) -> pa.Table:
        ls = batch["l"].to_pylist()
        rs = batch["r"].to_pylist()
        dys = batch["dy"].to_pylist()
        dxs = batch["dx"].to_pylist()
        pkeys = [f"{l}|{r}|{dy}|{dx}"
                 for l, r, dy, dx in zip(ls, rs, dys, dxs)]
        return pa.table({
            "image_id": pa.array(ls + rs, pa.string()),
            "pkey": pa.array(pkeys * 2, pa.string()),
            "side": pa.array([0] * len(ls) + [1] * len(rs), pa.int32()),
            "thumb": pa.array([b""] * (2 * len(ls)), pa.binary()),
            "h": pa.array([0] * (2 * len(ls)), pa.int32()),
            "w": pa.array([0] * (2 * len(ls)), pa.int32()),
        })

    def sig_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "image_id": batch["image_id"],
            "pkey": pa.array([""] * n, pa.string()),
            "side": pa.array([-1] * n, pa.int32()),
            "thumb": batch["thumb"],
            "h": batch["h"],
            "w": batch["w"],
        })

    riders = props.map_batches(rider_rows, batch_format="pyarrow")
    anchors_sig = sig.drop_columns(["ys", "xs", "hashes", "patches"]) \
        .map_batches(sig_rows, batch_format="pyarrow")

    def attach(df) -> pa.Table:
        out = {"pkey": [], "side": [], "thumb": [], "h": [], "w": []}
        for _, g in df.groupby("image_id", sort=False):
            base = g[g["side"] == -1]
            if not len(base):
                continue
            thumb = base["thumb"].iloc[0]
            hh = int(base["h"].iloc[0])
            ww = int(base["w"].iloc[0])
            for _, row in g[g["side"] >= 0].iterrows():
                out["pkey"].append(row["pkey"])
                out["side"].append(int(row["side"]))
                out["thumb"].append(thumb)
                out["h"].append(hh)
                out["w"].append(ww)
        return pa.table({
            "pkey": pa.array(out["pkey"], pa.string()),
            "side": pa.array(out["side"], pa.int32()),
            "thumb": pa.array(out["thumb"], pa.binary()),
            "h": pa.array(out["h"], pa.int32()),
            "w": pa.array(out["w"], pa.int32()),
        })

    attached = bucketed_group_map(riders.union(anchors_sig),
                                  "image_id", attach, num_buckets=8)

    def verify_pairs(df) -> pa.Table:
        ls, rs, ps = [], [], []
        for pkey, g in df.groupby("pkey", sort=False):
            a = g[g["side"] == 0]
            b = g[g["side"] == 1]
            if not len(a) or not len(b):
                continue
            l, r, dy, dx = pkey.rsplit("|", 3)
            ta = np.frombuffer(a["thumb"].iloc[0], np.uint8) \
                .reshape(32, 32).astype(np.float32)
            tb = np.frombuffer(b["thumb"].iloc[0], np.uint8) \
                .reshape(32, 32).astype(np.float32)
            p = _overlap_psnr_sweep(
                ta, int(a["h"].iloc[0]), int(a["w"].iloc[0]),
                tb, int(b["h"].iloc[0]), int(b["w"].iloc[0]),
                int(dy), int(dx))
            pc_ = int(round(p * 100))
            if pc_ >= psnr_min_centi:
                ls.append(l)
                rs.append(r)
                ps.append(pc_)
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "opsnr_centi": pa.array(ps, pa.int64())})

    verified = bucketed_group_map(attached, "pkey", verify_pairs,
                                  num_buckets=8).to_pandas()
    n_props = props.count()
    pairs = verified.drop_duplicates(["l", "r"])
    truth = {(f"cr{i:05d}", f"cr{i:05d}_t")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    n_true = len(got & truth)
    n_false = len(got - truth)

    import pandas as pd
    return pd.DataFrame({
        "n_images": [n_images], "n_planted": [n_planted],
        "n_proposals": [n_props],
        "n_verified_pairs": [len(got)],
        "n_true": [n_true], "n_false": [n_false],
        "recall_ppm": [n_true * 1_000_000 // n_planted],
    }).astype("int64")


# ---------------------------------------------------------------------------
# Time-shift / trim-invariant audio dedup (Shazam-style offset voting,
# Wang 2003: content-defined anchor times + per-anchor spectral words;
# matching words PROPOSE a time offset and an offset-aligned global
# verify decides — the audio twin of crop_image_dedup's 2D anchors).

_AOF_FRAME, _AOF_HOP, _AOF_NB = 1024, 128, 16


def _audio_band_log(pcm: np.ndarray) -> np.ndarray:
    """(n_frames, 16) log band energies, FRAME=1024 HOP=128 (the fine
    hop keeps anchor-time quantization ≤ 16 ms so a sample-level trim
    misaligns frame grids by under half a hop)."""
    nf = 1 + (len(pcm) - _AOF_FRAME) // _AOF_HOP
    idx = (np.arange(_AOF_FRAME)[None, :]
           + _AOF_HOP * np.arange(nf)[:, None])
    w = np.hanning(_AOF_FRAME)
    spec = np.abs(np.fft.rfft(pcm[idx] * w, axis=1)) ** 2
    edges = np.unique(np.geomspace(
        4, spec.shape[1] - 1, _AOF_NB + 1).astype(int))
    e = np.add.reduceat(spec, edges[:-1], axis=1)[:, :_AOF_NB]
    return np.log(e + 1e-12)


def _audio_anchors(env_log: np.ndarray, r: int = 16,
                   margin: int = 18) -> np.ndarray:
    """Content-defined anchor frames: strict local maxima of the
    ±4-frame-smoothed log envelope in a ±r window. Gain scales every
    energy equally (log shifts by a constant) so anchor positions are
    exactly gain-invariant; a head trim/pad shifts them WITH the
    content (measured jitter ≤ 1 frame through 0.6× gain + dither +
    sub-hop grid misalignment)."""
    n = len(env_log)
    if n < 2 * margin + 1:
        return np.empty(0, np.int64)
    c = np.cumsum(np.pad(env_log, (1, 0)))
    i0 = np.clip(np.arange(n) - 4, 0, n)
    i1 = np.clip(np.arange(n) + 5, 0, n)
    s = (c[i1] - c[i0]) / (i1 - i0)
    from numpy.lib.stride_tricks import sliding_window_view
    k = 2 * r + 1
    if n < k:
        return np.empty(0, np.int64)
    win = sliding_window_view(s, k)
    mx = win.max(axis=1)
    uniq = (win == mx[:, None]).sum(axis=1) == 1
    ts = np.nonzero((s[r:n - r] >= mx) & uniq)[0] + r
    return ts[(ts >= margin) & (ts < n - margin)]


def _audio_words(el: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """32-bit word per anchor: the sign of (band log-energy − frame
    mean) for the anchor frame and the frame 16 hops later — a purely
    SPECTRAL-SHAPE code, gain-invariant by construction (log gain is a
    per-frame constant, removed by the mean)."""
    words = np.zeros(len(anchors), np.uint64)
    for k, t in enumerate(anchors):
        v = 0
        for tt in (t, min(t + 16, len(el) - 1)):
            prof = el[tt]
            for b in (prof > prof.mean()).astype(int):
                v = (v << 1) | int(b)
        words[k] = v
    return words


def _wav_shift_corpus_dir(n_base: int = 36, dup_every: int = 3,
                          sr: int = 8000) -> str:
    """WAV fixture WITH PLANTED TIME-SHIFT near-dups: 3 s AM three-tone
    + broadband clips (the proven _wav_dup_corpus_dir recipe, longer);
    every dup_every-th base also appears as `<id>_s` — the SAME signal
    with its head either TRIMMED or PADDED with silence by 0.2–0.6 s
    (alternating), at 0.6× gain with fresh dither: the re-upload class
    where an intro is cut or dead air prepended, which slot-positioned
    fingerprints (wav_audio_dedup) are blind to."""
    from .. import codec

    out = f"/tmp/destor_ray_wav_shift/v1_n{n_base}_d{dup_every}_sr{sr}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    t = np.arange(3 * sr, dtype=np.float64) / sr
    rng_s = np.random.default_rng(7)
    for i in range(n_base):
        rng = np.random.Generator(np.random.Philox(key=1000 + i))
        sig = np.zeros_like(t)
        for _ in range(3):
            f = rng.uniform(80, 1800)
            a = rng.uniform(0.2, 0.5)
            sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
        sig += 0.1 * rng.normal(0, 1, len(t))
        lv = rng.uniform(0.2, 1.0, 25)
        env = np.interp(np.linspace(0, 24, len(t)), np.arange(25), lv)
        base = (sig * env / 3.0).astype(np.float64)
        d1 = np.random.Generator(np.random.Philox(key=77 + i)) \
            .normal(0, 1e-4, len(base))
        ids.append(f"sft{i:05d}")
        blobs.append(codec.wav_encode(
            (base + d1).astype(np.float32), sr))
        shift = int(rng_s.uniform(0.2, 0.6) * sr) * (1 if i % 2 else -1)
        if i % dup_every == 0:
            dup = (np.concatenate([np.zeros(shift), base]) if shift > 0
                   else base[-shift:])
            d2 = np.random.Generator(np.random.Philox(key=999 + i)) \
                .normal(0, 1e-4, len(dup))
            ids.append(f"sft{i:05d}_s")
            blobs.append(codec.wav_encode(
                (0.6 * dup + d2).astype(np.float32), sr))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _audio_offset_verify(env_a, spec_a, env_b, spec_b, df: int,
                         sweep: int = 2, min_frames: int = 60):
    """min(envelope time-corr, overlap band-profile corr), maximized
    over a ±sweep frame neighborhood of the proposed offset. BOTH arms
    are mean-centered (gain-invariant) and INDEPENDENT evidence: the
    profile arm alone fails (distinct clips share tonal band structure,
    measured FALSE max 0.9989) and the envelope arm alone is weaker
    (FALSE max 0.8583). SILENT frames are masked out of both arms
    with a gain-invariant per-clip threshold (max − 8 log units):
    without the mask, two DIFFERENT clips that both start with dead
    air align their silence heads and the silence-vs-content step
    function dominates both correlations (measured: a real false
    merge at 0.9515 between two distinct silence-padded clips).
    Masked margins: TRUE ≥ 0.9926 vs FALSE ≤ 0.8163 at the 0.95 gate.
    spec_* are 4-frame-block band means (~1.4 KB riding payload; the
    overlap profile is a mean, so block edges cost nothing
    measurable)."""
    ta, tb = len(env_a), len(env_b)
    thr_a = env_a.max() - 8.0
    thr_b = env_b.max() - 8.0
    best = -1.0
    for d in range(df - sweep, df + sweep + 1):
        a0, a1 = max(0, d), min(ta, d + tb)
        if a1 - a0 < min_frames:
            continue
        ea = env_a[a0:a1]
        eb = env_b[a0 - d:a1 - d]
        m = (ea > thr_a) & (eb > thr_b)
        if m.sum() < min_frames:
            continue
        ca = ea[m] - ea[m].mean()
        cb = eb[m] - eb[m].mean()
        den = float(np.sqrt((ca * ca).sum() * (cb * cb).sum()))
        c1 = float((ca * cb).sum()) / den if den > 0 else -1.0
        b0a, b1a = -(-a0 // 4), a1 // 4
        b0b = -(-(a0 - d) // 4)
        nblk = min(b1a - b0a, len(spec_b) - b0b)
        if nblk < min_frames // 4 - 2:
            continue
        ba = spec_a[b0a:b0a + nblk]
        bb = spec_b[b0b:b0b + nblk]
        bm = (ba.mean(axis=1) > thr_a) & (bb.mean(axis=1) > thr_b)
        if bm.sum() < min_frames // 4 - 2:
            continue
        pa_ = ba[bm].mean(axis=0)
        pb_ = bb[bm].mean(axis=0)
        pa_ = pa_ - pa_.mean()
        pb_ = pb_ - pb_.mean()
        den2 = float(np.sqrt((pa_ * pa_).sum() * (pb_ * pb_).sum()))
        c2 = float((pa_ * pb_).sum()) / den2 if den2 > 0 else -1.0
        best = max(best, min(c1, c2))
    return best


def audio_offset_dedup(sf_dir: str, n_base: int = 36, dup_every: int = 3,
                       corr_min_milli: int = 950):
    """(n_clips, n_planted, n_proposals, n_verified_pairs, n_true,
    n_false, recall_ppm) — TIME-SHIFT-invariant audio near-dup
    detection: head-trimmed or silence-padded re-uploads at altered
    gain (cut intros, prepended dead air — the offset class
    wav_audio_dedup's slot-POSITIONED fingerprint words are blind to:
    a 0.2 s shift misaligns every fixed slot). The design is Shazam's
    (Wang 2003, "An Industrial-Strength Audio Search Algorithm"):
    content-defined ANCHOR TIMES (strict local maxima of the smoothed
    log envelope — exactly gain-invariant, shift-covariant like the
    crop channel's 2D anchors; measured jitter ≤ 1 frame) carry 32-bit
    spectral-shape words banded as two 16-bit halves through one LSH
    exchange; a word collision PROPOSES the offset ta−tb, and the
    verify arm scores the proposal GLOBALLY: min(mean-centered
    envelope time-correlation, overlap band-profile correlation) over
    a ±2-frame sweep — both arms gain-invariant, independent evidence
    (measured: profile alone FALSE-max 0.9989, envelope alone 0.8583,
    min of both separates TRUE ≥ 0.9911 from FALSE ≤ 0.7846; gate
    0.95). Overlaps under 60 frames (~1 s) are rejected.

    Scale shape: one band exchange + one pair groupby; PCM never
    shuffles — each band row carries the 360 B envelope + 1.4 KB
    4-frame-block spectrogram, ~7 rows/clip (the pair-rendezvous
    topology drops that to once per pair side if riding bytes ever
    dominate, as measured for the image flagship)."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _wav_shift_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")
    n_planted = -(-n_base // dup_every)
    n_clips = n_base + n_planted

    class OffsetSignature:
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "clip_id": [], "at": [], "env": [],
                   "spec": []}
            for cid, data in zip(batch["clip_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                pcm, _sr = codec.audio_decode(data)
                el = _audio_band_log(pcm.astype(np.float64))
                env_tot = np.log(np.exp(el).sum(axis=1) + 1e-300)
                anchors = _audio_anchors(env_tot)
                words = _audio_words(el, anchors)
                nblk = len(el) // 4
                spec4 = el[:nblk * 4].reshape(nblk, 4, _AOF_NB) \
                    .mean(axis=1)
                env_b = np.round(env_tot * 1000).astype(np.int16) \
                    .tobytes()
                spec_b = np.round(spec4 * 1000).astype(np.int16) \
                    .tobytes()
                for t, wrd in zip(anchors, words):
                    for half in range(2):
                        bits = int((int(wrd) >> (16 * half)) & 0xFFFF)
                        out["bkey"].append((half << 16) | bits)
                        out["clip_id"].append(cid)
                        out["at"].append(int(t))
                        out["env"].append(env_b)
                        out["spec"].append(spec_b)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "at": pa.array(out["at"], pa.int32()),
                "env": pa.array(out["env"], pa.binary()),
                "spec": pa.array(out["spec"], pa.binary()),
            })

    bands = ds.map_batches(OffsetSignature, batch_size=16,
                           concurrency=2, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ls, rs, cs = [], [], []
        seen = set()
        for _, g in df.groupby("bkey", sort=False):
            ids_ = g["clip_id"].tolist()
            if len(ids_) < 2:
                continue
            ats = g["at"].to_numpy()
            envs = [np.frombuffer(e, np.int16).astype(np.float64) / 1000
                    for e in g["env"]]
            specs = [np.frombuffer(s, np.int16).astype(np.float64)
                     .reshape(-1, _AOF_NB) / 1000 for s in g["spec"]]
            for i in range(len(ids_)):
                for j in range(i + 1, len(ids_)):
                    if ids_[i] == ids_[j]:
                        continue
                    if ids_[i] < ids_[j]:
                        a_, b_ = i, j
                    else:
                        a_, b_ = j, i
                    dt = int(ats[a_]) - int(ats[b_])
                    key = (ids_[a_], ids_[b_], dt)
                    if key in seen:
                        continue
                    seen.add(key)
                    c = _audio_offset_verify(envs[a_], specs[a_],
                                             envs[b_], specs[b_], dt)
                    if int(round(c * 1000)) >= corr_min_milli:
                        ls.append(ids_[a_])
                        rs.append(ids_[b_])
                        cs.append(int(round(c * 1000)))
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "corr_milli": pa.array(cs, pa.int64())})

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"sft{i:05d}", f"sft{i:05d}_s")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_clips", n_clips, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Trim-invariant video dedup (shot-boundary offset voting — the video
# twin of audio_offset_dedup: content-defined anchor TIMES are shot
# cuts, which a head trim / ad prepend shifts WITH the content, so a
# keyframe-hash collision proposes the exact frame offset).

def _avi_offset_corpus_dir(n_base: int = 24, dup_every: int = 3,
                           frames_per_video: int = 24) -> str:
    """MJPEG-AVI fixture WITH PLANTED TIME-SHIFT near-dups: multi-shot
    base videos (2-4 shots, the _avi_shot_corpus_dir motion model);
    every dup_every-th base also appears as `<id>_s` — the SAME video
    with its head either TRIMMED by 3-7 frames or PREPENDED with a
    3-7-frame ad shot from a distinct source (alternating), every
    frame transcoded to q70: the re-upload class where an intro is cut
    or a bumper added, which avi_video_dedup's FRACTION-sampled frame
    slots are blind to (a 5-frame trim moves every (j*nf)//k slot)."""
    from .. import avi as avi_mod
    from .. import corpus as corpus_mod
    from .. import jpeg as jpeg_mod

    out = (f"/tmp/destor_ray_avi_offset/"
           f"v1_n{n_base}_d{dup_every}_f{frames_per_video}")
    if os.path.isdir(out):
        return out
    rng_t = np.random.default_rng(5)
    ids, blobs = [], []
    for i in range(n_base):
        n_shots = 2 + (i // dup_every + i) % 3
        cuts = [(s * frames_per_video) // n_shots
                for s in range(1, n_shots)]
        bounds = [0] + cuts + [frames_per_video]
        frames = []
        w = h = None
        for s in range(n_shots):
            px, w0, h0, _, _ = corpus_mod._base_pixels(
                seed=19, row=200 + i * 16 + s * 4)
            if w is None:
                w, h = w0, h0
            else:
                px = px[:h, :w]
                if px.shape[:2] != (h, w):
                    px = np.pad(px, ((0, h - px.shape[0]),
                                     (0, w - px.shape[1]), (0, 0)),
                                mode="edge")
            for j in range(bounds[s], bounds[s + 1]):
                fr = np.roll(px, shift=(j - bounds[s]), axis=1) \
                    .astype(np.int16)
                fr = np.clip(fr + 2 * (j - bounds[s]), 0, 255) \
                    .astype(np.uint8)
                frames.append(jpeg_mod.encode(fr, quality=85))
        ids.append(f"ov{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(frames, w=w, h=h, fps=10))
        k = int(rng_t.integers(3, 8))
        if i % dup_every != 0:
            continue
        if (i // dup_every) % 2 == 0:
            dup = [jpeg_mod.encode(jpeg_mod.decode(f), quality=70)
                   for f in frames[k:]]
        else:
            ad_px, _, _, _, _ = corpus_mod._base_pixels(
                seed=19, row=900 + i)
            ad_px = ad_px[:h, :w]
            if ad_px.shape[:2] != (h, w):
                ad_px = np.pad(ad_px, ((0, h - ad_px.shape[0]),
                                       (0, w - ad_px.shape[1]), (0, 0)),
                                mode="edge")
            ad = [jpeg_mod.encode(
                np.clip(np.roll(ad_px, j, axis=1).astype(np.int16)
                        + 2 * j, 0, 255).astype(np.uint8), quality=70)
                for j in range(k)]
            dup = ad + [jpeg_mod.encode(jpeg_mod.decode(f), quality=70)
                        for f in frames]
        ids.append(f"ov{i:05d}_s")
        blobs.append(avi_mod.encode_mjpeg(dup, w=w, h=h, fps=10))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _video_cuts(t16: np.ndarray) -> list:
    """Shot-cut frame indices from a (n_frames, 16, 16) DC-thumb
    stack — the avi_shot_stats hybrid gate (absolute floor 12 gray
    levels AND ≥3× the per-video median frame diff; margins measured
    there). Shared by the offset-dedup signature and its covariance
    test: a head trim of k frames shifts every surviving cut by
    exactly k because the diff sequence is just truncated."""
    diffs = np.abs(np.diff(t16.astype(np.int16), axis=0)) \
        .mean(axis=(1, 2))
    dcd = np.round(diffs * 100).astype(np.int64)
    med = max(float(np.median(dcd)), 1.0)
    cut_mask = (dcd >= 1200) & (dcd * 100 >= 300 * med)
    return (np.flatnonzero(cut_mask) + 1).tolist()


def video_offset_dedup(sf_dir: str, n_base: int = 24, dup_every: int = 3,
                       psnr_min_centi: int = 3000, min_overlap: int = 10):
    """(n_videos, n_planted, n_proposals, n_verified_pairs, n_true,
    n_false, recall_ppm) — TIME-SHIFT-invariant video near-dup
    detection: head-trimmed or ad-prepended re-uploads at q70
    transcode (cut intros, injected bumpers — the offset class
    avi_video_dedup's fraction-positioned frame slots are blind to:
    a 5-frame trim moves every (j*nf)//k sampled slot onto different
    content). The anchor insight is audio_offset_dedup's, one
    modality over: SHOT CUTS are content-defined anchor times — a
    trim/prepend shifts every cut index by exactly the edit length
    while a transcode leaves them fixed (the hybrid absolute+relative
    cut gate is avi_shot_stats', margins measured there). Each cut's
    keyframe (the first frame of the new shot, pixel-identical across
    the edit modulo q70) contributes dual phash+aHash 8x8-bit LSH
    bands; a band collision only PROPOSES the frame offset
    t_a − t_b, and verify scores the proposal GLOBALLY: mean 16x16
    DC-thumb PSNR over all overlapping frames at that offset with a
    ±1-frame sweep, requiring ≥ min_overlap aligned frames (measured:
    TRUE ≥ 52.9 dB vs FALSE ≤ 19.0 dB over every anchor-pair offset
    of 300 distinct pairs — the 30 dB gate has >20 dB margin both
    sides; a single shared-looking keyframe cannot merge two videos
    because the whole overlap must agree).

    Scale shape: one band exchange + one pair groupby; video payloads
    never shuffle — each band row carries cut index + the n×256 B
    frame-thumb reel (~6 KB at 24 frames; the pair-rendezvous
    topology ships it once per pair side when reels dominate, as
    measured for the image flagship). Single-shot videos emit no
    anchors and fall back to avi_video_dedup's slot channel —
    documented applicability, the same featureless-input caveat as
    crop_image_dedup's anchor recall. All frames decode DC-ONLY (no
    IDCT anywhere; destor's 'index without reading back data' stance,
    cf. containerstore.c read path, recast for video)."""
    from .. import avi as avi_mod
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _avi_offset_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")
    n_planted = -(-n_base // dup_every)
    n_videos = n_base + n_planted

    class ShotAnchorSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "video_id": [], "at": [], "reel": []}
            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = avi_mod.decode_frames(data)
                dcs = [jpeg.decode_dc_luma(f) for f in frames]
                t16 = np.stack([codec.resize_nn(g, 16, 16)
                                for g in dcs])
                cuts = _video_cuts(t16)
                if not cuts:
                    continue
                reel = t16.astype(np.uint8).tobytes()
                g32 = np.stack([codec.resize_nn(dcs[c], 32, 32)
                                for c in cuts])
                ph = codec.phash64_batch(g32).view(np.uint64)
                ah = codec.ahash64_batch(g32).view(np.uint64)
                for ki, c in enumerate(cuts):
                    for ch, hv in enumerate((ph[ki], ah[ki])):
                        for band in range(8):
                            bits = int((hv >> np.uint64(8 * band))
                                       & np.uint64(0xFF))
                            out["bkey"].append(
                                ((ch * 8 + band) << 8) | bits)
                            out["video_id"].append(vid)
                            out["at"].append(int(c))
                            out["reel"].append(reel)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "video_id": pa.array(out["video_id"], pa.string()),
                "at": pa.array(out["at"], pa.int32()),
                "reel": pa.array(out["reel"], pa.binary()),
            })

    bands = ds.map_batches(ShotAnchorSignature, batch_size=8,
                           concurrency=2, batch_format="pyarrow")

    def aligned_psnr(ra: np.ndarray, rb: np.ndarray, dt: int) -> float:
        best = -1.0
        ta, tb = len(ra), len(rb)
        for dd in (dt - 1, dt, dt + 1):
            a0, a1 = max(0, dd), min(ta, dd + tb)
            if a1 - a0 < min_overlap:
                continue
            ps = [min(codec.psnr(ra[a], rb[a - dd]), 99.0)
                  for a in range(a0, a1)]
            best = max(best, float(np.mean(ps)))
        return best

    def verify_bucket(df) -> pa.Table:
        ls, rs, ds_ = [], [], []
        seen = set()
        for _, g in df.groupby("bkey", sort=False):
            ids_ = g["video_id"].tolist()
            if len(ids_) < 2:
                continue
            ats = g["at"].to_numpy()
            reels = [np.frombuffer(r, np.uint8).reshape(-1, 16, 16)
                     for r in g["reel"]]
            for i in range(len(ids_)):
                for j in range(i + 1, len(ids_)):
                    if ids_[i] == ids_[j]:
                        continue
                    a_, b_ = (i, j) if ids_[i] < ids_[j] else (j, i)
                    dt = int(ats[a_]) - int(ats[b_])
                    key = (ids_[a_], ids_[b_], dt)
                    if key in seen:
                        continue
                    seen.add(key)
                    p = aligned_psnr(reels[a_], reels[b_], dt)
                    if int(round(p * 100)) >= psnr_min_centi:
                        ls.append(ids_[a_])
                        rs.append(ids_[b_])
                        ds_.append(dt)
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "dt": pa.array(ds_, pa.int64())})

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_prop = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"ov{i:05d}", f"ov{i:05d}_s")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    n_true = len(got & truth)
    n_false = len(got - truth)

    import pandas as pd
    return pd.DataFrame({
        "n_videos": [n_videos], "n_planted": [n_planted],
        "n_proposals": [n_prop],
        "n_verified_pairs": [len(got)],
        "n_true": [n_true], "n_false": [n_false],
        "recall_ppm": [n_true * 1_000_000 // n_planted],
    }).astype("int64")


# ---------------------------------------------------------------------------
# Rotation-invariant image dedup (small-angle straighten/deskew edits;
# polar resampling turns rotation into an EXACT cyclic roll).

_ROT_NR, _ROT_NA = 16, 128


def _rot_polar(gray: np.ndarray) -> np.ndarray:
    """(NR, NA) polar resample of the 3x3-box-smoothed luma: ring j at
    radius 0.45*min(h,w)*(j+.5)/NR, NA angles, nearest neighbor. A
    rotation about the image center becomes a CYCLIC SHIFT along the
    angle axis — exact for multiples of the 2.8125° bin, sub-bin for
    the rest (handled by fractional-shift interpolation in verify).
    The disk lives inside the central square, so aspect ratio never
    shears it (a 32x32 whole-image thumb was measured failing exactly
    there: rotation does not commute with anisotropic resize)."""
    h, w = gray.shape
    g = gray.astype(np.float64)
    p = np.pad(g, 1, mode="edge")
    sm = sum(p[dy:dy + h, dx:dx + w]
             for dy in range(3) for dx in range(3)) / 9.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rr = 0.45 * min(h, w) * (np.arange(_ROT_NR) + 0.5) / _ROT_NR
    th = 2 * np.pi * np.arange(_ROT_NA) / _ROT_NA
    yy = cy + rr[:, None] * np.sin(th)[None, :]
    xx = cx + rr[:, None] * np.cos(th)[None, :]
    yi = np.clip(np.round(yy).astype(np.int64), 0, h - 1)
    xi = np.clip(np.round(xx).astype(np.int64), 0, w - 1)
    return sm[yi, xi]


def _rot_hash(P: np.ndarray) -> int:
    """64-bit rotation-invariant hash of a polar matrix: rings 4..11,
    per ring 2 magnitude bits (|F1|,|F2| vs the ring's mean harmonic
    magnitude) + the QUADRANT of the relative phases φ_m − m·φ_1 for
    m=2,3,4 (2 bits each). Under a cyclic roll by k bins every phase
    shifts by m·2πk/NA, so the relative phase is EXACTLY invariant
    (pinned by test); magnitudes are exactly invariant too. Measured:
    true pairs (rot+q70) ≤ 13/64 bits moved, distinct mean 29.2 —
    8×8-bit bands collide 48/48 true vs 5.6% false."""
    F = np.fft.rfft(P - P.mean(axis=1, keepdims=True), axis=1)
    v = 0
    for r in range(4, 12):
        mag = np.abs(F[r, 1:6])
        mm = mag.mean()
        v = (v << 1) | int(mag[0] > mm)
        v = (v << 1) | int(mag[1] > mm)
        ph1 = np.angle(F[r, 1])
        for m in (2, 3, 4):
            rel = np.angle(F[r, m]) - m * ph1
            q = int(np.floor(((rel + 8 * np.pi) % (2 * np.pi))
                             / (np.pi / 2))) & 3
            v = (v << 2) | q
    return v & ((1 << 64) - 1)


def _rot_angle_cands(Pa: np.ndarray, Pb: np.ndarray,
                     top: int = 3) -> np.ndarray:
    """Top angle-shift candidates by per-ring mean-centered circular
    cross-correlation (one FFT product per pair)."""
    A = Pa - Pa.mean(axis=1, keepdims=True)
    B = Pb - Pb.mean(axis=1, keepdims=True)
    fa = np.fft.rfft(A, axis=1)
    fb = np.fft.rfft(B, axis=1)
    cc = np.fft.irfft(fa * np.conj(fb), n=_ROT_NA, axis=1).sum(axis=0)
    return np.argsort(cc)[::-1][:top]


def _rot_polar_psnr3(A: list, B: list) -> float:
    """max over top-3 angle candidates × 4 fractional sub-shifts of
    the MIN-over-R/G/B polar-domain PSNR. Rotation alignment is an
    exact np.roll (ZERO 2D interpolation; the aligned-32×32-thumb
    variant was measured failing at 1 dB margin from compounded NN
    resampling, and ZNCC variants at 0.87-vs-0.87 overlap on the
    smooth-gradient corpus); sub-bin misalignment is absorbed by
    linear blending of adjacent rolls. Angle candidates come from the
    LUMA correlation; all three channels must agree at the SAME
    alignment — luma-only was measured overlapping (false pair at
    31.7 dB vs true min 33.8) while luma-coincident distinct images
    have independent color structure: min-channel TRUE ≥ 29.5 dB vs
    FALSE ≤ 10.9 dB (the tone-curve channel's per-channel-min
    insight, geometric edition)."""
    la = (299 * A[0] + 587 * A[1] + 114 * A[2]) / 1000.0
    lb = (299 * B[0] + 587 * B[1] + 114 * B[2]) / 1000.0
    best = -1.0
    for k in _rot_angle_cands(la, lb):
        r0 = [np.roll(B[c], int(k), axis=1) for c in range(3)]
        r1 = [np.roll(B[c], int(k) + 1, axis=1) for c in range(3)]
        for sub in (0.0, 0.25, 0.5, 0.75):
            worst = 99.0
            for c in range(3):
                pb = (1 - sub) * r0[c] + sub * r1[c]
                mse = ((A[c] - pb) ** 2).mean()
                p = 99.0 if mse <= 0 else min(
                    10 * np.log10(255.0 * 255.0 / mse), 99.0)
                worst = min(worst, p)
            best = max(best, worst)
    return best


def _rot_corpus_dir(n_base: int = 144, quality: int = 85,
                    dup_every: int = 3, dup_quality: int = 70) -> str:
    """JFIF fixture WITH PLANTED SMALL-ANGLE ROTATION near-dups: every
    dup_every-th base also appears rotated by a cycling ±2–8° angle
    (codec.rotate_nn — the straighten/deskew edit; scanned photos and
    horizon fixes) and re-encoded at lower quality. "rtNNNNN_r"
    duplicates "rtNNNNN"."""
    from .. import corpus as corpus_mod
    from .. import jpeg

    out = (f"/tmp/destor_ray_rotdup/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    from .. import codec
    ids, blobs = [], []
    degs = [2.0, -3.0, 4.0, -5.0, 6.0, -8.0, 3.5, -2.5]
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=23, row=i)
        ids.append(f"rt{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            rot = codec.rotate_nn(px, degs[(i // dup_every) % len(degs)])
            ids.append(f"rt{i:05d}_r")
            blobs.append(jpeg.encode(rot, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def rotation_image_dedup(sf_dir: str, n_base: int = 144,
                         dup_every: int = 3,
                         psnr_min_centi: int = 2400):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — SMALL-ANGLE-ROTATION-invariant
    near-dup detection: ±2–8° straighten/deskew re-edits + re-encode
    (scanned photos, horizon fixes — the geometric class every other
    channel is blind to: plain phash was MEASURED moving 18.5 bits
    mean under these angles, past any band; the dihedral channel
    covers only 90° multiples). Both arms live in POLAR coordinates,
    where rotation about the center is a cyclic shift of the angle
    axis: candidates hash per-ring angular-FFT invariants — harmonic
    magnitudes and the relative phases φ_m − m·φ_1, both EXACTLY
    roll-invariant (the phase shift m·Δ cancels; pinned by test) —
    through one 8×8-bit band exchange; verify recovers the angle by
    luma circular cross-correlation and gates on the MIN-over-R/G/B
    polar-domain PSNR at that shared rolled alignment (np.roll is
    exact — no 2D interpolation; the measured failure ladder:
    aligned-32×32-thumb PSNR 1 dB margin from compounded NN
    resampling, ZNCC 0.87-vs-0.87 overlap, luma-only polar PSNR a
    false pair at 31.7 dB vs true min 33.8 — while luma-coincident
    DISTINCT images have independent color structure, so the
    channel-min separates TRUE ≥ 29.5 dB from FALSE ≤ 10.9 dB at the
    24 dB gate with >5 dB / >13 dB margins). Sub-bin angles are
    absorbed by fractional-shift linear blending of adjacent rolls.

    Scale shape: one band exchange (8 rows/image — half the dual-hash
    channels' 16) + one pair groupby; pixels never shuffle — each
    band row carries the 6 KB uint8 3-channel polar matrix
    (pair-rendezvous ships it once per pair side when payloads
    dominate, as measured for the flagship). APPLICABILITY: rotation
    about an off-center
    pivot or rotation composed with a crop shifts the disk center and
    needs the anchor channel; pure center rotation is the common
    deskew case."""
    from .. import jpeg
    from ..stages.grouped import bucketed_group_map

    d = _rot_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class RotSignature:
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "image_id": [], "pol": []}
            for iid, data in zip(batch["image_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                px = jpeg.decode(data)
                chans = [_rot_polar(px[:, :, c].astype(np.int32))
                         for c in range(3)]
                luma_pol = (299 * chans[0] + 587 * chans[1]
                            + 114 * chans[2]) / 1000.0
                hv = _rot_hash(luma_pol)
                blob = np.round(np.stack(chans)) \
                    .clip(0, 255).astype(np.uint8).tobytes()
                for band in range(8):
                    bits = (hv >> (8 * band)) & 0xFF
                    out["bkey"].append((band << 8) | bits)
                    out["image_id"].append(iid)
                    out["pol"].append(blob)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "image_id": pa.array(out["image_id"], pa.string()),
                "pol": pa.array(out["pol"], pa.binary()),
            })

    bands = ds.map_batches(RotSignature, batch_size=32, concurrency=2,
                           batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        raw = df["pol"].to_numpy()
        memo: dict = {}

        def pol(k):
            got = memo.get(ids_a[k])
            if got is None:
                got = memo[ids_a[k]] = np.frombuffer(
                    raw[k], np.uint8).astype(np.float64) \
                    .reshape(3, _ROT_NR, _ROT_NA)
            return got

        pc_ = np.empty(len(li), np.int64)
        for k in range(len(li)):
            a_, b_ = ((li[k], ri[k]) if ids_a[li[k]] < ids_a[ri[k]]
                      else (ri[k], li[k]))
            pc_[k] = int(round(_rot_polar_psnr3(
                list(pol(a_)), list(pol(b_))) * 100))
        return _emit_pairs(ids_a, li, ri, pc_ >= psnr_min_centi, pc_,
                           score_col="psnr_centi")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"rt{i:05d}", f"rt{i:05d}_r")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Hue-rotation / saturation (color-grade) invariant image dedup
# ---------------------------------------------------------------------------

_GRAY_AXIS = np.ones(3) / np.sqrt(3.0)


def _huesat_transform(px: np.ndarray, theta_deg: float,
                      s: float) -> np.ndarray:
    """The color-grade edit: rotate each pixel's chroma component about
    the gray axis (1,1,1)/√3 by theta (hue shift) and scale it by s
    (saturation/vibrance), leaving the gray-axis projection — the
    per-pixel RGB mean — EXACTLY unchanged (Rodrigues for c ⊥ u:
    R·c = c·cosθ + (u×c)·sinθ, and (R·c)·(1,1,1) = 0). This is the
    ideal form of every white-balance / colorize / vibrance filter;
    clipping at the gamut boundary is the only non-ideality."""
    p = px.astype(np.float64)
    m = p.mean(axis=-1, keepdims=True)
    c = p - m
    th = np.deg2rad(theta_deg)
    ux = np.cross(np.broadcast_to(_GRAY_AXIS, c.shape), c)
    return np.clip(m + s * (c * np.cos(th) + ux * np.sin(th)),
                   0, 255).astype(np.uint8)


def _mean_luma(px: np.ndarray) -> np.ndarray:
    """Per-pixel (R+G+B)//3 — the gray-axis projection, exactly
    invariant under _huesat_transform pre-clipping (unlike Rec601
    luma, whose 0.299/0.587/0.114 weights mix under hue rotation)."""
    return (px.astype(np.uint16).sum(axis=-1) // 3).astype(np.uint8)


def _chroma_mag(px: np.ndarray) -> np.ndarray:
    """Per-pixel chroma magnitude ‖p − mean(p)‖₂, float64 — exactly
    invariant under hue rotation (a rotation preserves norms) and
    scaled uniformly by s, which ZNCC then cancels."""
    p = px.astype(np.float64)
    m = p.mean(axis=-1, keepdims=True)
    return np.sqrt(((p - m) ** 2).sum(axis=-1))


def _huesat_corpus_dir(n_base: int = 144, quality: int = 85,
                       dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED COLOR-GRADE near-dups:
    every dup_every-th base image also appears hue-rotated (theta
    cycling the full circle) and saturation-scaled (s cycling
    0.6..1.3) and re-encoded at lower quality. Truth rides the
    naming: "hsNNNNN_c" duplicates "hsNNNNN"."""
    from .. import corpus as corpus_mod
    from .. import jpeg

    out = (f"/tmp/destor_ray_huesatdup/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=41, row=i)
        ids.append(f"hs{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            k = i // dup_every
            theta = -165.0 + 14.0 * (k % 24)
            s = 0.6 + 0.1 * (k % 8)
            graded = _huesat_transform(px, theta, s)
            ids.append(f"hs{i:05d}_c")
            blobs.append(jpeg.encode(graded, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def huesat_image_dedup(sf_dir: str, n_base: int = 144,
                       dup_every: int = 3, ah_max: int = 6,
                       lpsnr_min_centi: int = 2800,
                       czncc_min_ppm: int = 850_000):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — near-dup detection that survives
    HUE-ROTATION + SATURATION edits (white balance, colorize,
    vibrance — the channel-MIXING color class; the photometric and
    tone-curve channels cover only per-channel maps). Every existing
    arm was MEASURED blind: Rec601 phash moves 15.0 bits mean / 34
    max under full-circle hue shifts (7/48 planted pairs escape even
    the dual 8×8-bit bands), the flagship's Rec601-thumb PSNR rejects
    34/48 true pairs (min 15.1 dB vs the 25 dB production gate), and
    the photometric channel's gray ZNCC bottoms at 0.19 — Rec601's
    0.299/0.587/0.114 weights mix under rotation. Both arms here are
    built on the transform's EXACT invariants instead: the per-pixel
    RGB MEAN is the gray-axis projection, untouched by any rotation
    about (1,1,1) at any saturation (pinned by test) — mean-luma
    aHash measured moving ≤ 4 bits (mean 0.6), 48/48 dual-band
    collide — and the per-pixel CHROMA MAGNITUDE is rotation-exact
    and uniformly scaled by s, which ZNCC cancels. Verify gates on
    BOTH: mean-luma 16×16 thumb PSNR ≥ 28 dB (true min 34.6 vs
    distinct max 21.3 on the adversarial smooth corpus) AND
    chroma-magnitude ZNCC ≥ 0.85 (true min 0.978 vs distinct max
    0.56) — the chroma arm is load-bearing for luma-coincident
    distinct images, which differ in chroma layout precisely when
    they are not hue-rotations of one another. BOUNDARY: full
    desaturation (s=0, grayscale conversion) zeroes the chroma image
    and fails the chroma arm by construction (measured ZNCC 0.0 at
    luma PSNR 45.3) — grayscale re-uploads are a deliberate separate
    class, not a silent miss.

    Scale shape: one decode pass, dual mean-luma-hash band exchange
    (16 rows/image) with 256 B luma + 256 B chroma thumbs riding, one
    pair-dedup groupby — the flagship topology; payloads never
    shuffle (pair-rendezvous applies when thumbs dominate)."""
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _huesat_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class GradeSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            lumas, lthumbs, cthumbs = [], [], []
            for data in batch["bytes"].to_pylist():
                px = jpeg.decode(data)
                ml = _mean_luma(px)
                lumas.append(codec.resize_nn(ml, 32, 32))
                lthumbs.append(codec.resize_nn(ml, 16, 16).tobytes())
                cm = _chroma_mag(codec.resize_nn(px, 16, 16))
                cthumbs.append(np.clip(np.round(cm), 0, 255)
                               .astype(np.uint8).tobytes())
            stack = np.stack(lumas) if ids else \
                np.empty((0, 32, 32), np.uint8)
            ph = codec.phash64_batch(stack) if ids else \
                np.array([], np.int64)
            ah = codec.ahash64_batch(stack) if ids else \
                np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "lthumb": pa.array(lthumbs, pa.binary()),
                "cthumb": pa.array(cthumbs, pa.binary()),
            })

    sigs = ds.map_batches(GradeSignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("ahash", "lthumb", "cthumb"), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        from .. import codec as codec_mod
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        empty = pa.table({"l": pa.array([], pa.string()),
                          "r": pa.array([], pa.string()),
                          "lpsnr_centi": pa.array([], pa.int64())})
        if not len(li):
            return empty
        ahv = df["ahash"].to_numpy(np.int64)
        pre = codec_mod.hamming64(ahv[li], ahv[ri]) <= ah_max
        li, ri = li[pre], ri[pre]
        if not len(li):
            return empty
        lth = _thumb_matrix(df, "lthumb").astype(np.float64)
        pc_ = np.round(_psnr_db_pairs(lth[li], lth[ri]) * 100) \
            .astype(np.int64)
        ok = pc_ >= lpsnr_min_centi
        if ok.any():
            cth = _thumb_matrix(df, "cthumb").astype(np.float64)
            cz = _zncc_pairs(cth[li[ok]], cth[ri[ok]])
            ok[np.flatnonzero(ok)] = \
                np.round(cz * 1_000_000) >= czncc_min_ppm
        return _emit_pairs(ids_a, li, ri, ok, pc_,
                           score_col="lpsnr_centi")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"hs{i:05d}", f"hs{i:05d}_c")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Grayscale-conversion dedup: the s=0 class the hue/sat channel excludes
# ---------------------------------------------------------------------------

# the three linear gray converters seen in the wild: ITU-R 601 (JPEG/old
# web), ITU-R 709 (HD video frame grabs), plain RGB mean (naive tools)
_GRAY_CONVERTERS = ((0.299, 0.587, 0.114),
                    (0.2126, 0.7152, 0.0722),
                    (1.0 / 3.0, 1.0 / 3.0, 1.0 / 3.0))


def _gray_convert(px: np.ndarray, w: tuple) -> np.ndarray:
    """Linear grayscale conversion with weights w, replicated to 3
    channels (what a save-as-RGB grayscale re-upload actually ships)."""
    p = px.astype(np.float64)
    g = np.clip(np.round(p[..., 0] * w[0] + p[..., 1] * w[1]
                         + p[..., 2] * w[2]), 0, 255).astype(np.uint8)
    return np.stack([g] * 3, axis=2)


def _chan_thumb16(ch: np.ndarray) -> np.ndarray:
    """16×16 box-mean thumb of one channel (32×32 NN resize then 2×2
    box) — the exact recipe the gray-fit margins were measured on."""
    from .. import codec as codec_mod
    t = codec_mod.resize_nn(ch, 32, 32).astype(np.float64)
    return t.reshape(16, 2, 16, 2).mean(axis=(1, 3))


def _achromatic(px: np.ndarray, gate: float = 4.0) -> bool:
    """True when the image carries (almost) no chroma: mean absolute
    deviation of channels from their per-pixel mean < gate. Measured
    on the smooth corpus: colored rows ≥ 33.2, decoded gray-replicated
    re-encodes 0.0 — the detector has a 29-point margin at gate 4."""
    p = px.astype(np.float64)
    return float(np.abs(p - p.mean(axis=2, keepdims=True)).mean()) < gate


def _ls_gray_fit_psnr(cth3: np.ndarray, gthumb: np.ndarray) -> float:
    """PSNR of the best LINEAR gray-converter fit: solve
    min_w ‖[R G B]·w − gray‖ over the 256 thumb pixels, report the
    residual PSNR. Because the converter weights are solved per pair,
    this one verify covers EVERY linear grayscale converter (601, 709,
    mean, arbitrary channel weighting) — measured true ≥ 48.4 dB for
    all three wild converters vs distinct-pair max 21.8 dB (3 free
    params against 256 values can't fake a match)."""
    A = cth3.reshape(3, -1).T
    b = gthumb.reshape(-1)
    w, *_ = np.linalg.lstsq(A, b, rcond=None)
    r = A @ w - b
    mse = float((r * r).mean())
    return 99.0 if mse <= 0 else float(10.0 * np.log10(255.0 ** 2 / mse))


def _grayscale_corpus_dir(n_base: int = 144, quality: int = 85,
                          dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH PLANTED GRAYSCALE-CONVERSION
    near-dups: every dup_every-th base image also appears converted to
    grayscale (converter cycling 601 / 709 / RGB-mean) and re-encoded
    at lower quality. Truth rides the naming: "gsNNNNN_g" duplicates
    "gsNNNNN"."""
    from .. import corpus as corpus_mod
    from .. import jpeg

    out = (f"/tmp/destor_ray_graydup/"
           f"v1_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=43, row=i)
        ids.append(f"gs{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            k = i // dup_every
            g = _gray_convert(px, _GRAY_CONVERTERS[k % 3])
            ids.append(f"gs{i:05d}_g")
            blobs.append(jpeg.encode(g, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def grayscale_image_dedup(sf_dir: str, n_base: int = 144,
                          dup_every: int = 3,
                          fit_psnr_min_centi: int = 3200):
    """(n_images, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — near-dup detection for GRAYSCALE
    RE-UPLOADS (color → gray conversion + re-encode), the s=0 class
    the hue/sat channel EXCLUDES BY CONSTRUCTION (its chroma-magnitude
    ZNCC arm reads 0.0 on a gray side — documented boundary in
    huesat_image_dedup). Existing arms measured on this class: the
    Rec601 G channel covers ONLY the 601 converter (its own fixpoint,
    thumb PSNR 43.8); mean-RGB conversion drops G thumb PSNR to
    20.5-22 (below the 28 gate, ZNCC 0.66 below 0.94) and 709 sits
    between — the converter the uploader picked decides whether the
    flagship sees the pair, which is not a channel, it's luck.

    Fix: candidates hash BOTH luma projections (Rec601 dual bands +
    RGB-mean dual bands, 32 rows/image): a gray image's single gray
    equals ITS converter's luma of the source, and every wild
    converter's output band-collides with at least one of the two
    emitted projections (measured per converter: 601 20/20 via G,
    709 20/20 via G, mean 20/20 via M — union 20/20 each). Verify is
    converter-AGNOSTIC: when exactly one side is achromatic
    (_achromatic: colored ≥ 33.2 vs gray 0.0 measured), solve the
    best linear converter by least squares over the colored side's
    3×16×16 channel thumbs against the gray side's thumb and gate the
    residual PSNR ≥ 32 dB (true ≥ 48.4 for all three converters vs
    distinct max 21.8); both-achromatic pairs (gray vs gray
    re-encode) gate direct thumb PSNR ≥ 32 (distinct gray-vs-gray max
    20.0); both-chromatic pairs are SKIPPED — they belong to the
    re-encode/photometric/hue-sat channels, keeping this channel's
    false-merge surface zero on colored content.

    Scale shape: one decode pass, dual-projection band exchange (32
    rows/image) with 768 B channel thumbs riding, one pair-dedup
    groupby — the flagship topology; full pixels never shuffle."""
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _grayscale_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)
    n_images = n_base + n_planted

    class GraySignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            g32s, m32s, thumbs, achro = [], [], [], []
            for data in batch["bytes"].to_pylist():
                px = jpeg.decode(data)
                g32s.append(codec.resize_nn(codec.to_gray(px), 32, 32))
                m32s.append(codec.resize_nn(_mean_luma(px), 32, 32))
                cth = np.stack([_chan_thumb16(px[:, :, c])
                                for c in range(3)])
                thumbs.append(np.clip(np.round(cth), 0, 255)
                              .astype(np.uint8).tobytes())
                achro.append(_achromatic(px))
            if ids:
                gstack, mstack = np.stack(g32s), np.stack(m32s)
                gph = codec.phash64_batch(gstack)
                gah = codec.ahash64_batch(gstack)
                mph = codec.phash64_batch(mstack)
                mah = codec.ahash64_batch(mstack)
            else:
                gph = gah = mph = mah = np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "gph": pa.array(gph, pa.int64()),
                "gah": pa.array(gah, pa.int64()),
                "mph": pa.array(mph, pa.int64()),
                "mah": pa.array(mah, pa.int64()),
                "achro": pa.array(np.asarray(achro, np.uint8)),
                "cthumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(GraySignature, batch_size=64, concurrency=2,
                          batch_format="pyarrow")

    N_BANDS, BITS = 8, 8
    FAMS = ("gph", "gah", "mph", "mah")

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", FAMS,
                               ("achro", "cthumb"), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        empty = pa.table({"l": pa.array([], pa.string()),
                          "r": pa.array([], pa.string()),
                          "fit_psnr_centi": pa.array([], pa.int64())})
        if not len(li):
            return empty
        ach = df["achro"].to_numpy(np.uint8).astype(bool)
        keep = ach[li] | ach[ri]  # colored pairs: other channels' job
        li, ri = li[keep], ri[keep]
        if not len(li):
            return empty
        ths = _thumb_matrix(df, "cthumb") \
            .reshape(len(df), 3, 256).astype(np.float64)
        p = np.empty(len(li), np.float64)
        both = ach[li] & ach[ri]
        if both.any():
            p[both] = _psnr_db_pairs(ths[li[both], 0], ths[ri[both], 0])
        for k in np.flatnonzero(~both):
            i, j = li[k], ri[k]
            gi, ci_ = (i, j) if ach[i] else (j, i)
            p[k] = _ls_gray_fit_psnr(ths[ci_].reshape(3, 16, 16),
                                     ths[gi][0].reshape(16, 16))
        pc_ = np.round(p * 100).astype(np.int64)
        return _emit_pairs(ids_a, li, ri, pc_ >= fit_psnr_min_centi,
                           pc_, score_col="fit_psnr_centi")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"gs{i:05d}", f"gs{i:05d}_g")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_images", n_images, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Degradation-family dedup: blur / downscale / dither / noise / sharpen
# ---------------------------------------------------------------------------


def _gauss_blur(px: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur (reflect padding) — the platform
    low-pass re-encode. Vectorized via FFT-free separable convolution
    on each axis."""
    r = int(3 * sigma)
    x = np.arange(-r, r + 1)
    k = np.exp(-x * x / (2 * sigma * sigma))
    k /= k.sum()
    out = px.astype(np.float64)
    for ax in (0, 1):
        p = np.pad(out, [(r, r) if a == ax else (0, 0)
                         for a in range(out.ndim)], mode="reflect")
        acc = np.zeros_like(out)
        for t, kv in enumerate(k):
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(t, t + out.shape[ax])
            acc += kv * p[tuple(sl)]
        out = acc
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _downscale_box2(px: np.ndarray) -> np.ndarray:
    """2×2 box-mean downscale — the half-resolution re-upload."""
    h, w = px.shape[:2]
    h2, w2 = h // 2 * 2, w // 2 * 2
    p = px[:h2, :w2].astype(np.float64)
    return np.round(p.reshape(h2 // 2, 2, w2 // 2, 2, -1)
                    .mean(axis=(1, 3))).astype(np.uint8).squeeze()


_BAYER4 = (np.array([[0, 8, 2, 10],
                     [12, 4, 14, 6],
                     [3, 11, 1, 9],
                     [15, 7, 13, 5]], np.float64) + 0.5) / 16.0


def _quant_dither(px: np.ndarray, levels: int = 8) -> np.ndarray:
    """Ordered (Bayer 4×4) dithering to `levels` per channel — the
    GIF/palette re-save. Vectorized: threshold matrix tiled over the
    image decides round-up vs round-down per pixel."""
    h, w = px.shape[:2]
    step = 255.0 / (levels - 1)
    t = np.tile(_BAYER4, (-(-h // 4), -(-w // 4)))[:h, :w]
    p = px.astype(np.float64) / step
    q = np.floor(p + t[..., None])
    return np.clip(np.round(q * step), 0, 255).astype(np.uint8)


def _add_noise(px: np.ndarray, sigma: float, seed: int) -> np.ndarray:
    """Additive Gaussian grain, deterministic in seed."""
    rng = np.random.default_rng(90_000 + seed)
    return np.clip(np.round(px.astype(np.float64)
                            + rng.normal(0, sigma, px.shape)),
                   0, 255).astype(np.uint8)


def _sharpen(px: np.ndarray, amount: float = 1.2) -> np.ndarray:
    """Unsharp mask: px + amount·(px − blur(px, 1.5))."""
    bl = _gauss_blur(px, 1.5).astype(np.float64)
    p = px.astype(np.float64)
    return np.clip(np.round(p + amount * (p - bl)), 0, 255) \
        .astype(np.uint8)


def _lowpass_arm(t1: np.ndarray, t2: np.ndarray) -> bool:
    """The bandwidth-mismatch verify arm: blur σ2 and quarter-res
    re-uploads keep low-frequency structure but move enough 16×16
    thumb energy to fail PSNR-28 AND the ZNCC-0.94 arm (measured
    misses: blur 1/24, quarter-res 3/24). Joint gate on the
    low-passed comparisons — 8×8 box-thumb PSNR ≥ 25 (true blur ≥
    29.1 / quarter-res ≥ 28.1 vs distinct max 22.0) AND 3×3
    blur-matched ZNCC ≥ 0.93 (true ≥ 0.957 vs distinct max 0.886) —
    zero joint false-passes measured on the distinct background."""
    b1 = t1.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    b2 = t2.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    dlt = b1 - b2
    mse = (dlt * dlt).mean()
    p = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    if p < 25.0:
        return False

    def bx(t):
        pd = np.pad(t, 1, mode="edge")
        return sum(pd[dy:dy + 16, dx:dx + 16]
                   for dy in range(3) for dx in range(3)) / 9.0

    return _zncc(bx(t1), bx(t2)) >= 0.93


_DEGRADE_KINDS = ("bl2", "ds2", "ds4", "qz8", "ns10", "sh")


def _degrade_transform(px: np.ndarray, kind: str, k: int) -> np.ndarray:
    if kind == "bl2":
        return _gauss_blur(px, 2.0)
    if kind == "ds2":
        return _downscale_box2(px)
    if kind == "ds4":
        return _downscale_box2(_downscale_box2(px))
    if kind == "qz8":
        return _quant_dither(px, 8)
    if kind == "ns10":
        return _add_noise(px, 10.0, k)
    # "sh"
    return _sharpen(px, 1.2)


def _degrade_corpus_dir(n_base: int = 144, quality: int = 85,
                        dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH ONE PLANTED DUP PER DEGRADATION
    CLASS cycling (blur σ2, half-res, quarter-res, Bayer-dither
    8-level quantize, grain σ10, unsharp-mask) — the everyday
    recompression family every platform applies. Truth rides the
    naming: "dgNNNNN_<kind>" duplicates "dgNNNNN".

    The fixture ENFORCES its own distinctness claim: the smooth
    procedural generator occasionally draws two bases that are
    genuine near-dups of each other (rows 51/94 at seed 53 landed at
    16×16 thumb PSNR 27.5 — within 0.5 dB of the production verify
    gate, i.e. truly the same picture), which would count as "false"
    merges against a truth table that calls them distinct. Bases are
    rejection-sampled: a draw whose gray thumb reaches ≥ 26 dB PSNR
    against any accepted base is skipped (deterministic row
    scan continues), so every cross pair in the fixture is distinct
    by at least 2 dB below every verify gate."""
    from .. import codec, jpeg
    from .. import corpus as corpus_mod

    out = (f"/tmp/destor_ray_degradedup/"
           f"v2_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    thumbs = np.empty((0, 256), np.float64)
    row = -1
    for i in range(n_base):
        while True:
            row += 1
            px, _w, _h, _, _ = corpus_mod._base_pixels(seed=53, row=row)
            th = codec.resize_nn(codec.to_gray(px), 16, 16) \
                .astype(np.float64).reshape(-1)
            if len(thumbs):
                mse = ((thumbs - th) ** 2).mean(axis=1)
                if float(mse.min()) <= 255.0 ** 2 / 10 ** 2.6:
                    continue  # >= 26 dB vs an accepted base: near-dup
            thumbs = np.vstack([thumbs, th])
            break
        ids.append(f"dg{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            k = i // dup_every
            kind = _DEGRADE_KINDS[k % len(_DEGRADE_KINDS)]
            t = _degrade_transform(px, kind, k)
            ids.append(f"dg{i:05d}_{kind}")
            blobs.append(jpeg.encode(t, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def degrade_image_dedup(sf_dir: str, n_base: int = 144,
                        dup_every: int = 3):
    """(kind, n_planted, n_found, n_false, recall_ppm) per degradation
    class + "_total" — CERTIFIES the flagship G-channel arms against
    the everyday recompression family (blur, half/quarter resolution,
    palette dither, grain, sharpen: what platforms apply on every
    re-upload). Measured per class against the G arms (PSNR-28 /
    aHash≤6∧ZNCC-0.94 / trimmed-tile-32): half-res, dither, grain and
    sharpen pass arm 1 outright (thumb PSNR ≥ 29.0); blur σ2 and
    quarter-res expose the BANDWIDTH-MISMATCH gap (1/24 and 3/24
    measured misses — low-freq structure intact, thumb energy moved),
    closed by the joint low-pass arm (_lowpass_arm: 8×8 box PSNR ≥ 25
    ∧ blur-matched ZNCC ≥ 0.93 under aHash ≤ 8; zero false-passes on
    the distinct background). CLASS BOUNDARY, measured and deliberate:
    blur σ4 collapses the 8×8 margin to 0.3 dB (true min 20.98 vs
    distinct max 20.7) — a σ4-blurred 512px image is visually a
    different asset, and no thumb-scale verify can separate it without
    false merges, so it is OUT of the duplicate class.

    Scale shape: flagship topology — one decode pass, dual Rec601
    band exchange (16 rows/image, 256 B thumbs riding), one pair
    groupby."""
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _degrade_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)

    class DegradeSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            g32s, thumbs = [], []
            for data in batch["bytes"].to_pylist():
                px = jpeg.decode(data)
                g = codec.to_gray(px)
                g32s.append(codec.resize_nn(g, 32, 32))
                thumbs.append(codec.resize_nn(g, 16, 16).tobytes())
            if ids:
                stack = np.stack(g32s)
                ph = codec.phash64_batch(stack)
                ah = codec.ahash64_batch(stack)
            else:
                ph = ah = np.array([], np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(ph, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
            })

    sigs = ds.map_batches(DegradeSignature, batch_size=64,
                          concurrency=2, batch_format="pyarrow")

    N_BANDS, BITS = 8, 8

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "image_id", ("phash", "ahash"),
                               ("ahash", "thumb"), N_BANDS, BITS)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        from .. import codec as codec_mod
        ids_a, li, ri = _bucket_pairs(df, "image_id", dedupe=True)
        if not len(li):
            return pa.table({"l": pa.array([], pa.string()),
                             "r": pa.array([], pa.string())})
        ahv = df["ahash"].to_numpy(np.int64)
        ham = codec_mod.hamming64(ahv[li], ahv[ri])
        ths = _thumb_matrix(df).astype(np.float64)
        # arm 1 vectorized; the cascade's later arms loop only over
        # still-undecided pairs
        ok = _psnr_db_pairs(ths[li], ths[ri]) >= 28.0
        znc = np.zeros(len(li), bool)
        narrow = ~ok & (ham <= 6)
        if narrow.any():
            znc[narrow] = _zncc_pairs(ths[li[narrow]],
                                      ths[ri[narrow]]) >= 0.94
        ok |= znc
        for k in np.flatnonzero(~ok):
            ta = ths[li[k]].reshape(16, 16)
            tb = ths[ri[k]].reshape(16, 16)
            good = _trimmed_tile_psnr(ta, tb) >= 32.0
            if not good and ham[k] <= 8:
                good = _lowpass_arm(ta, tb)
            ok[k] = good
        return _emit_pairs(ids_a, li, ri, ok)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    pairs = pairs.drop_duplicates(["l", "r"])
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _DEGRADE_KINDS}
    for i in range(0, n_base, dup_every):
        k = i // dup_every
        kind = _DEGRADE_KINDS[k % len(_DEGRADE_KINDS)]
        truth_by_kind[kind].add((f"dg{i:05d}", f"dg{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _DEGRADE_KINDS)


# ---------------------------------------------------------------------------
# Omni-channel image dedup: one decode, one exchange, every invariance class
# ---------------------------------------------------------------------------

_OMNI_KINDS = ("re", "d4", "lb", "ph", "tc", "hs", "ov", "rt", "gy",
               "bl", "ds")


def _omni_transform(px: np.ndarray, kind: str, k: int) -> np.ndarray:
    """Apply ONE deterministic transform of the given class — the same
    parameter families the per-channel fixtures plant, keyed by the
    dup index k so every class sweeps its range."""
    from .. import codec

    if kind == "re":
        return px
    if kind == "d4":
        return codec.dihedral_apply(px, 1 + (k // 8) % 7)
    if kind == "lb":
        return _letterbox(px, k % 3, 5 + (k % 13), (0, 255, 128)[k % 3])
    if kind == "ph":
        a = 0.7 + 0.05 * (k % 13)
        b = -30 + 6 * (k % 11)
        return np.clip(px.astype(np.float64) * a + b, 0, 255) \
            .astype(np.uint8)
    if kind == "tc":
        t = px.astype(np.float64) / 255.0
        kc = k % 7
        if kc == 0:
            y = t ** 0.45
        elif kc == 1:
            y = t ** 0.6
        elif kc == 2:
            y = t ** 1.6
        elif kc == 3:
            y = t ** 2.2
        elif kc == 4:
            y = 3 * t * t - 2 * t * t * t
        elif kc == 5:
            y = np.clip((t - 0.1) / 0.75, 0, 1)
        else:
            y = 0.5 - 0.5 * np.cos(np.pi * t)
        return np.clip(np.round(y * 255), 0, 255).astype(np.uint8)
    if kind == "hs":
        return _huesat_transform(px, -165.0 + 14.0 * (k % 24),
                                 0.6 + 0.1 * (k % 8))
    if kind == "ov":
        h, w = px.shape[:2]
        rng = np.random.default_rng(3000 + k)
        oh = max(4, int(h * rng.uniform(0.18, 0.33)))
        ow = max(4, int(w * rng.uniform(0.18, 0.38)))
        y0 = int(rng.uniform(0, h - oh))
        x0 = int(rng.uniform(0, w - ow))
        ov = px.copy()
        color = np.array([255, 255, 255]) if k % 2 \
            else np.array([10, 10, 10])
        ov[y0:y0 + oh, x0:x0 + ow] = color
        ov[y0:y0 + 2, x0:x0 + ow] = 255 - color
        return ov
    if kind == "gy":
        return _gray_convert(px, _GRAY_CONVERTERS[k % 3])
    if kind == "bl":
        return _gauss_blur(px, 2.0)
    if kind == "ds":
        d = _downscale_box2(px)
        return _downscale_box2(d) if k % 2 else d
    # "rt"
    degs = (2.0, -3.0, 4.0, -5.0, 6.0, -8.0, 3.5, -2.5)
    return codec.rotate_nn(px, degs[k % 8])


def _omni_corpus_dir(n_base: int = 231, quality: int = 85,
                     dup_every: int = 3, dup_quality: int = 70) -> str:
    """Deterministic JFIF fixture WITH ONE PLANTED DUP PER CLASS
    cycling the 11 transform kinds (re-encode, dihedral, letterbox,
    photometric, tone-curve, hue/sat, overlay, rotation, grayscale,
    blur, downscale) — the mixed-reality corpus a production dedup run
    actually sees. Truth rides the naming: "omNNNNN_<kind>" duplicates
    "omNNNNN". Bases are rejection-sampled (≥ 26 dB thumb-PSNR draws
    vs any accepted base skipped) so the fixture's distinctness claim
    holds — the smooth generator was measured drawing genuine
    near-dup base pairs at 27.5 dB, within 0.5 dB of the production
    verify gate (see _degrade_corpus_dir)."""
    from .. import codec, jpeg
    from .. import corpus as corpus_mod

    out = (f"/tmp/destor_ray_omnidup/"
           f"v3_n{n_base}_q{quality}_e{dup_every}_d{dup_quality}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    thumbs = np.empty((0, 256), np.float64)
    row = -1
    for i in range(n_base):
        while True:
            row += 1
            px, _w, _h, _, _ = corpus_mod._base_pixels(seed=47, row=row)
            th = codec.resize_nn(codec.to_gray(px), 16, 16) \
                .astype(np.float64).reshape(-1)
            if len(thumbs):
                mse = ((thumbs - th) ** 2).mean(axis=1)
                if float(mse.min()) <= 255.0 ** 2 / 10 ** 2.6:
                    continue  # >= 26 dB vs an accepted base: near-dup
            thumbs = np.vstack([thumbs, th])
            break
        ids.append(f"om{i:05d}")
        blobs.append(jpeg.encode(px, quality))
        if i % dup_every == 0:
            k = i // dup_every
            kind = _OMNI_KINDS[k % len(_OMNI_KINDS)]
            t = _omni_transform(px, kind, k)
            ids.append(f"om{i:05d}_{kind}")
            blobs.append(jpeg.encode(t, dup_quality))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


# channel ids for the unified band-key namespace
(_OMNI_G, _OMNI_TC, _OMNI_HS, _OMNI_LB, _OMNI_D4, _OMNI_RT,
 _OMNI_GY) = range(7)


def omni_image_dedup(sf_dir: str, n_base: int = 231,
                     dup_every: int = 3):
    """(kind, n_planted, n_found, n_false, recall_ppm) per transform
    class + a "_total" row — the PRODUCTION COMPOSITION of the image
    near-dup channels: at 100 TB you cannot afford one decode pass per
    invariance class, so this pipeline decodes each image ONCE,
    computes every channel's signature from the same pixels, and ships
    all of them through ONE unified band exchange whose key carries a
    channel id (channel << 24 | slot << 8 | bits) — each band row
    carries only ITS channel's verify payload, and the bucket verifier
    dispatches to the channel's measured kernel:

    * G  (Rec601 dual bands): re-encode thumb PSNR ≥ 28 dB, OR
      photometric ZNCC ≥ 0.94 under aHash ≤ 6 (affine-equivariant
      candidates), OR overlay trimmed-tile PSNR ≥ 32 dB, OR the
      low-pass arm (8×8 box PSNR ≥ 25 ∧ blur-matched ZNCC ≥ 0.93
      under aHash ≤ 8 — blur σ2 / half- and quarter-res re-uploads)
      — four verify arms sharing one candidate family;
    * TC (rank-image dual bands): per-channel histogram-matched ZNCC,
      min over R/G/B ≥ 0.90 (monotone tone maps);
    * HS (RGB-mean-luma dual bands): mean-luma PSNR ≥ 28 dB AND
      chroma-magnitude ZNCC ≥ 0.85 (hue rotation + saturation);
    * LB (trimmed-luma dual bands): inset-sweep PSNR ≥ 32 dB on
      32×32 uniform-border-trimmed thumbs (letterbox/pillarbox);
    * D4 (orbit-expanded dual bands, orientation NOT in the slot so
      any relative orientation rendezvouses): dual-Hamming prefilter
      + orientation/shift-aligned thumb PSNR ≥ 35 dB;
    * RT (polar angular-FFT bands): min-over-R/G/B rolled polar
      PSNR ≥ 24 dB (small-angle rotation);
    * GY (dual luma-projection bands, Rec601 slots 0-15 + RGB-mean
      slots 16-31): achromatic-dispatch verify — one gray side ⇒
      least-squares linear-converter fit PSNR ≥ 32 dB, both gray ⇒
      direct thumb PSNR, both colored ⇒ skip (grayscale re-uploads,
      any linear converter).

    Verified edges from ALL channels union into one pair set; recall
    is accounted PER PLANTED TRANSFORM CLASS against the mixed
    fixture, false merges globally. Each gate is the standalone
    channel's measured value — this query certifies the channels
    COMPOSE (shared decode, shared exchange, no cross-channel false
    amplification), which the per-channel fixtures cannot.

    Scale shape: one decode pass (the flagship's cost), one band
    exchange of ~176 rows/image (16×4 dual-band families + 128 orbit
    + 8 polar) whose payloads stay per-channel (256 B–6 KB; the orbit
    rows dominate count, the polar rows bytes — pair-rendezvous
    verify drops payloads off band rows at corpus scale exactly as
    measured for the flagship), one pair groupby. APPLICABILITY: the
    crop channel's content-defined anchors are deliberately absent —
    this smooth corpus is its measured failure condition (2/14 anchor
    recall); on natural photos its band family joins the same
    exchange."""
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _omni_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    n_planted = -(-n_base // dup_every)

    N_BANDS, BITS = 8, 8

    class OmniSignature:
        """Every channel's candidate hash + verify payload from ONE
        decode. Emits band rows directly (the per-image row would be
        ~9 KB; going straight to band rows keeps each row at its own
        channel's payload size)."""

        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bkeys, iids, phs, ahs, payloads = [], [], [], [], []

            def emit_dual(chan, ph, ah, iid, payload, slot0=0):
                for ci, h in enumerate((int(ph), int(ah))):
                    hu = h & 0xFFFFFFFFFFFFFFFF
                    for band in range(N_BANDS):
                        bits = (hu >> (BITS * band)) & 0xFF
                        slot = slot0 + ci * N_BANDS + band
                        bkeys.append((chan << 24) | (slot << 8) | bits)
                        iids.append(iid)
                        phs.append(int(ph))
                        ahs.append(int(ah))
                        payloads.append(payload)

            for iid, data in zip(batch["image_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                px = jpeg.decode(data)
                g = codec.to_gray(px)
                g32 = codec.resize_nn(g, 32, 32)
                t601 = codec.resize_nn(g, 16, 16).tobytes()

                # G: Rec601 dual (re-encode / photometric / overlay)
                ph_g = int(codec.phash64_batch(g32[None])[0])
                ah_g = int(codec.ahash64_batch(g32[None])[0])
                emit_dual(_OMNI_G, ph_g, ah_g, iid, t601)

                # TC: rank-image dual + 3-channel box-mean thumbs
                rank = _rank_image(g32)
                ph_tc = int(codec.phash64_batch(rank[None])[0])
                ah_tc = int(codec.ahash64_batch(rank[None])[0])
                chans = []
                for c in range(3):
                    c32 = codec.resize_nn(px[:, :, c], 32, 32) \
                        .astype(np.float64)
                    chans.append(np.round(
                        c32.reshape(16, 2, 16, 2).mean(axis=(1, 3)))
                        .astype(np.uint8))
                emit_dual(_OMNI_TC, ph_tc, ah_tc, iid,
                          np.stack(chans).tobytes())

                # HS: RGB-mean-luma dual + luma/chroma thumbs
                ml = _mean_luma(px)
                ml32 = codec.resize_nn(ml, 32, 32)
                ph_hs = int(codec.phash64_batch(ml32[None])[0])
                ah_hs = int(codec.ahash64_batch(ml32[None])[0])
                cm = np.clip(np.round(
                    _chroma_mag(codec.resize_nn(px, 16, 16))),
                    0, 255).astype(np.uint8)
                emit_dual(_OMNI_HS, ph_hs, ah_hs, iid,
                          codec.resize_nn(ml, 16, 16).tobytes()
                          + cm.tobytes())

                # GY: grayscale re-uploads — the gray side's one hash
                # must rendezvous with WHICHEVER luma projection its
                # unknown converter matches, so both projections emit
                # under this channel (601 slots 0-15, mean 16-31).
                # Payload: achromatic flag + channel thumbs (768 B
                # colored — reusing the TC 3×16×16 box-means — or the
                # 256 B gray thumb when achromatic).
                achro = _achromatic(px)
                gy_payload = bytes([1]) + chans[0].tobytes() if achro \
                    else bytes([0]) + np.stack(chans).tobytes()
                emit_dual(_OMNI_GY, ph_g, ah_g, iid, gy_payload)
                emit_dual(_OMNI_GY, ph_hs, ah_hs, iid, gy_payload,
                          slot0=16)

                # LB: trimmed-luma dual + 32x32 trimmed thumb
                gt = codec.trim_uniform_border(g)
                gt32 = codec.resize_nn(gt, 32, 32)
                ph_lb = int(codec.phash64_batch(gt32[None])[0])
                ah_lb = int(codec.ahash64_batch(gt32[None])[0])
                emit_dual(_OMNI_LB, ph_lb, ah_lb, iid, gt32.tobytes())

                # D4: orbit expansion (orientation NOT in the slot).
                # Verify payload is the FULL-RES box-mean 16×16 (the
                # standalone channel's DC-thumb equivalent): NN
                # point-sample thumbs were MEASURED dropping true
                # aligned PSNR to 32.6 vs distinct max 25.8 — a 3 dB
                # margin — while true box-means restore 48.2 vs 27.4
                # at the standalone's 35 dB gate.
                orbit = np.stack([codec.dihedral_apply(g32, kk)
                                  for kk in range(8)])
                oph = codec.phash64_batch(orbit)
                oah = codec.ahash64_batch(orbit)
                tbox = _box_thumb32(g, 16).astype(np.uint8).tobytes()
                for kk in range(8):
                    emit_dual(_OMNI_D4, int(oph[kk]), int(oah[kk]),
                              iid, tbox)

                # RT: polar angular-FFT hash, 8 single bands
                pols = [_rot_polar(px[:, :, c].astype(np.int32))
                        for c in range(3)]
                luma_pol = (299 * pols[0] + 587 * pols[1]
                            + 114 * pols[2]) / 1000.0
                hv = _rot_hash(luma_pol)
                blob = np.round(np.stack(pols)).clip(0, 255) \
                    .astype(np.uint8).tobytes()
                for band in range(8):
                    bits = (hv >> (8 * band)) & 0xFF
                    bkeys.append((_OMNI_RT << 24) | (band << 8) | bits)
                    iids.append(iid)
                    phs.append(0)
                    ahs.append(0)
                    payloads.append(blob)

            return pa.table({
                "bkey": pa.array(bkeys, pa.int64()),
                "image_id": pa.array(iids, pa.string()),
                "ph": pa.array(phs, pa.int64()),
                "ah": pa.array(ahs, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            })

    # concurrency=2 like every channel: at the 4-CPU test session a
    # 4-actor pool consumes every schedulable CPU and the shuffle
    # aggregators can never start (the documented hash-shuffle hang)
    bands = ds.map_batches(OmniSignature, batch_size=32, concurrency=2,
                           batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        from .. import codec as codec_mod
        ls, rs, chs = [], [], []
        seen = set()
        for bkey, g in df.groupby("bkey", sort=False):
            ids_ = g["image_id"].tolist()
            if len(ids_) < 2:
                continue
            chan = int(bkey) >> 24
            phv = g["ph"].to_numpy(np.int64)
            ahv = g["ah"].to_numpy(np.int64)
            raw = list(g["payload"])
            for i in range(len(ids_)):
                for j in range(i + 1, len(ids_)):
                    if ids_[i] == ids_[j]:
                        continue
                    pair = tuple(sorted((ids_[i], ids_[j])))
                    # D4 buckets legitimately retry a pair at other
                    # orientations until one passes the prefilter
                    # (aligned-PSNR then searches all 8 itself); all
                    # other channels dedup per pair up front
                    if chan != _OMNI_D4 and (chan, pair) in seen:
                        continue
                    ok = False
                    if chan == _OMNI_G:
                        seen.add((chan, pair))
                        ta = np.frombuffer(raw[i], np.uint8) \
                            .reshape(16, 16)
                        tb = np.frombuffer(raw[j], np.uint8) \
                            .reshape(16, 16)
                        dlt = ta.astype(np.float64) \
                            - tb.astype(np.float64)
                        mse = (dlt * dlt).mean()
                        p = 99.0 if mse == 0 else \
                            10 * np.log10(255.0 ** 2 / mse)
                        ok = p >= 28.0
                        if not ok and codec_mod.hamming64(
                                ahv[i], ahv[j]) <= 6:
                            ok = _zncc(ta, tb) >= 0.94
                        if not ok:
                            ok = _trimmed_tile_psnr(ta, tb) >= 32.0
                        if not ok and codec_mod.hamming64(
                                ahv[i], ahv[j]) <= 8:
                            ok = _lowpass_arm(ta.astype(np.float64),
                                              tb.astype(np.float64))
                    elif chan == _OMNI_TC:
                        seen.add((chan, pair))
                        if codec_mod.hamming64(ahv[i], ahv[j]) <= 28:
                            a3 = np.frombuffer(raw[i], np.uint8) \
                                .reshape(3, 16, 16)
                            b3 = np.frombuffer(raw[j], np.uint8) \
                                .reshape(3, 16, 16)
                            ok = min(
                                max(_histmatch_zncc(a3[c], b3[c]),
                                    _histmatch_zncc(b3[c], a3[c]))
                                for c in range(3)) >= 0.90
                    elif chan == _OMNI_HS:
                        seen.add((chan, pair))
                        if codec_mod.hamming64(ahv[i], ahv[j]) <= 6:
                            la = np.frombuffer(raw[i][:256], np.uint8) \
                                .reshape(16, 16)
                            lb_ = np.frombuffer(raw[j][:256], np.uint8) \
                                .reshape(16, 16)
                            dlt = la.astype(np.float64) \
                                - lb_.astype(np.float64)
                            mse = (dlt * dlt).mean()
                            p = 99.0 if mse == 0 else \
                                10 * np.log10(255.0 ** 2 / mse)
                            if p >= 28.0:
                                ca = np.frombuffer(raw[i][256:],
                                                   np.uint8) \
                                    .reshape(16, 16)
                                cb = np.frombuffer(raw[j][256:],
                                                   np.uint8) \
                                    .reshape(16, 16)
                                ok = _zncc(ca, cb) >= 0.85
                    elif chan == _OMNI_LB:
                        seen.add((chan, pair))
                        ta = np.frombuffer(raw[i], np.uint8) \
                            .reshape(32, 32)
                        tb = np.frombuffer(raw[j], np.uint8) \
                            .reshape(32, 32)
                        ok = _inset_shift_psnr(ta, tb) >= 32.0
                    elif chan == _OMNI_D4:
                        if (codec_mod.hamming64(phv[i], phv[j]) <= 18
                                and codec_mod.hamming64(
                                    ahv[i], ahv[j]) <= 6):
                            if (chan, pair) in seen:
                                continue
                            seen.add((chan, pair))
                            ta = np.frombuffer(raw[i], np.uint8) \
                                .reshape(16, 16)
                            tb = np.frombuffer(raw[j], np.uint8) \
                                .reshape(16, 16)
                            ok = _dihedral_aligned_psnr(
                                ta, tb, None) >= 35.0
                    elif chan == _OMNI_GY:
                        seen.add((chan, pair))
                        fa, fb = raw[i][0], raw[j][0]
                        if fa or fb:
                            if fa and fb:
                                ta = np.frombuffer(
                                    raw[i][1:], np.uint8) \
                                    .reshape(16, 16).astype(np.float64)
                                tb = np.frombuffer(
                                    raw[j][1:], np.uint8) \
                                    .reshape(16, 16).astype(np.float64)
                                dlt = ta - tb
                                mse = (dlt * dlt).mean()
                                p = 99.0 if mse == 0 else \
                                    10 * np.log10(255.0 ** 2 / mse)
                            else:
                                gi, ci_ = (i, j) if fa else (j, i)
                                gth = np.frombuffer(
                                    raw[gi][1:], np.uint8) \
                                    .reshape(16, 16).astype(np.float64)
                                c3 = np.frombuffer(
                                    raw[ci_][1:], np.uint8) \
                                    .reshape(3, 16, 16) \
                                    .astype(np.float64)
                                p = _ls_gray_fit_psnr(c3, gth)
                            ok = p >= 32.0
                    else:  # _OMNI_RT
                        seen.add((chan, pair))
                        pa_ = np.frombuffer(raw[i], np.uint8) \
                            .astype(np.float64) \
                            .reshape(3, _ROT_NR, _ROT_NA)
                        pb_ = np.frombuffer(raw[j], np.uint8) \
                            .astype(np.float64) \
                            .reshape(3, _ROT_NR, _ROT_NA)
                        a_, b_ = ((i, j) if ids_[i] < ids_[j]
                                  else (j, i))
                        ra = pa_ if a_ == i else pb_
                        rb = pb_ if a_ == i else pa_
                        ok = _rot_polar_psnr3(list(ra),
                                              list(rb)) >= 24.0
                    if ok:
                        ls.append(pair[0])
                        rs.append(pair[1])
                        chs.append(chan)
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "chan": pa.array(chs, pa.int64())})

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=16).to_pandas()
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _OMNI_KINDS}
    for i in range(0, n_base, dup_every):
        k = i // dup_every
        kind = _OMNI_KINDS[k % len(_OMNI_KINDS)]
        truth_by_kind[kind].add((f"om{i:05d}", f"om{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _OMNI_KINDS)


# ---------------------------------------------------------------------------
# Time-SCALE-invariant audio dedup (speed-changed / resampled
# re-uploads): content-defined anchor times are SCALE-COVARIANT
# (t_dup ~ t_base / rho), so anchor pairs RANSAC-fit the (rho, d)
# time map and a warped dual-arm correlation decides — the tempo
# twin of audio_offset_dedup, where offset alone was the unknown.

_ASC_R = 8          # anchor local-max window (denser than offset's 16:
                    # scale perturbs which peak wins a wide window —
                    # measured matched-anchor fraction 0.91 at r=8 vs
                    # 0.89 at r=16 with ~40% more anchors to vote)
_ASC_RHO_LO, _ASC_RHO_HI = 0.78, 1.28
_ASC_ENV_MIN = 0.97     # envelope-corr gate (TRUE >= 0.993 measured)
_ASC_TRACK_MIN = 0.82   # 2-coarse-band track gate (TRUE >= 0.957)


def _audio_scale_keys(el: np.ndarray, anchors: np.ndarray) -> list:
    """Per-anchor LSH keys, 7 per anchor: the 16-bit sign profile of
    the anchor frame (band log-energy > frame mean — gain-invariant)
    emitted as SLIDING bytes at offsets 0,2,4,6,8 (tags 0-4), plus the
    two bytes of the NEXT anchor's profile (tags 5-6; the second point
    is content-defined so it re-picks at the scaled position, unlike
    audio_offset_dedup's fixed +16-hop second frame which a 10% speed
    change moves onto different content). Resampling by rho shifts
    band energies ~log(rho)/0.303 bands (fractional), flipping a few
    near-mean sign bits (measured word Hamming mean 1.6 / max 6 of
    32); sliding bytes make one clean 8-bit window survive — the
    exchange only needs ONE collision per true pair, because the
    (rho, d) proposals come from the full anchor lists riding the
    band rows, not from key-matched votes."""
    out = []
    n = len(anchors)
    for k in range(n):
        prof = el[anchors[k]]
        own = int(sum(1 << (15 - b) for b in range(16)
                      if prof[b] > prof.mean()))
        t2 = anchors[k + 1] if k + 1 < n else anchors[k]
        p2 = el[t2]
        nxt = int(sum(1 << (15 - b) for b in range(16)
                      if p2[b] > p2.mean()))
        keys = [(tag << 8) | ((own >> off) & 0xFF)
                for tag, off in enumerate((0, 2, 4, 6, 8))]
        keys.append((5 << 8) | (nxt & 0xFF))
        keys.append((6 << 8) | ((nxt >> 8) & 0xFF))
        out.append(keys)
    return out


def _audio_scale_propose(aa: np.ndarray, ab: np.ndarray,
                         cap: int = 6, max_anchors: int = 12) -> list:
    """RANSAC the time map t_a = rho * t_b + d over the FULL anchor
    cross-product (anchors are sparse: ~5 per 3 s clip, so the cross
    product is tiny and needs no key gating). Every admissible pair of
    (t_a, t_b) votes defines a hypothesis; score = number of DISTINCT
    base anchors within |t_a - rho*t_b - d| <= 3 frames; refine by
    least squares on the inliers. Returns up to `cap` well-separated
    (n_inliers, rho, d), best-supported first. Key-matched-vote
    clustering was measured and rejected: hard clips get 1-4 true
    votes that quantization scatters across bins (12/24 recall);
    all-pairs RANSAC recovers 24/24 with the same verify."""
    aa = np.asarray(aa, np.float64)[:max_anchors]
    ab = np.asarray(ab, np.float64)[:max_anchors]
    if len(aa) < 2 or len(ab) < 2:
        return []
    ta = np.repeat(aa, len(ab))
    tb = np.tile(ab, len(aa))
    nv = len(ta)
    X, Y = np.triu_indices(nv, 1)
    dta, dtb = ta[Y] - ta[X], tb[Y] - tb[X]
    ok = (np.abs(dta) >= 8) & (np.abs(dtb) >= 8)
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = np.where(ok, dta / np.where(dtb == 0, 1, dtb), 0.0)
    ok &= (rho >= _ASC_RHO_LO) & (rho <= _ASC_RHO_HI)
    if not ok.any():
        return []
    rho = rho[ok]
    d = ta[X[ok]] - rho * tb[X[ok]]
    inl = np.abs(ta[None, :] - rho[:, None] * tb[None, :]
                 - d[:, None]) <= 3                       # (H, nv)
    base_idx = np.repeat(np.arange(len(aa)), len(ab))
    n_in = np.zeros(len(rho), np.int64)
    for bi in range(len(aa)):
        n_in += inl[:, base_idx == bi].any(axis=1)
    order = np.argsort(-n_in)
    out = []
    for h in order:
        if n_in[h] < 2 or len(out) >= cap:
            break
        r0, d0 = float(rho[h]), float(d[h])
        if any(abs(np.log(r0 / r1)) < 0.01 and abs(d0 - d1) < 6
               for _, r1, d1 in out):
            continue
        m = inl[h]
        A = np.stack([tb[m], np.ones(int(m.sum()))], axis=1)
        sol, *_ = np.linalg.lstsq(A, ta[m], rcond=None)
        r2, d2 = float(sol[0]), float(sol[1])
        if _ASC_RHO_LO <= r2 <= _ASC_RHO_HI:
            out.append((int(n_in[h]), r2, d2))
    return out


def _audio_scale_verify(env_a, tr_a, env_b, tr_b, rho: float, d: float,
                        min_frames: int = 60, coarse: bool = False):
    """Best (env_corr, min 2-track corr) over a (rho, d) neighborhood
    sweep: rho*(1 + k/512) for k in -10..10 (the LS rho estimate from
    short anchor spans is good to ~2%) and d + {-2, 0, 2}; with
    coarse=True the sweep is the 5-point k in {-10,-5,0,5,10} x dd=0
    screen (1/13 the work) used to rank and prune proposals before
    the full sweep. The dup envelope/tracks are warped to the base
    time axis by linear interp and correlated under the gain-invariant
    silence mask (per-signal max - 8 log units; the mask lesson is
    audio_offset_dedup's). The second arm is the min over TWO
    coarse-band (8+8) envelope tracks: per-frame 16-band profiles
    decorrelate under resample because the log(rho) band shift moves
    tonal lines across band edges (measured spec-profile TRUE min
    0.71 even band-shift-corrected), while halved-spectrum tracks
    move <= 0.35 band and stay >= 0.957; the track arm rejects
    envelope-coincident distinct clips. Measured margins through the
    full adversarial chain (distinct pairs free to pick their best
    proposal): TRUE env >= 0.993 / tracks >= 0.957 vs DISTINCT
    env <= 0.78 at gates 0.97 / 0.82. The whole sweep is one
    vectorized gather + masked-moment pass (no per-sweep-point
    Python; measured 4x over the loop form)."""
    nfa, nfb = len(env_a), len(env_b)
    if coarse:
        ks = np.arange(-10, 11, 5)
        dds = np.array([0.0])
    else:
        ks = np.arange(-10, 11)
        dds = np.array([-2.0, 0.0, 2.0])
    R = (rho * (1 + ks / 512))[:, None, None]
    D = (d + dds)[None, :, None]
    T = ((np.arange(nfa)[None, None, :] - D) / R).reshape(-1, nfa)
    valid = (T >= 0) & (T <= nfb - 1)
    Tc = np.clip(T, 0, nfb - 1)
    i0 = np.floor(Tc).astype(np.int64)
    i1 = np.minimum(i0 + 1, nfb - 1)
    fr = Tc - i0
    sigs_a = np.concatenate([env_a[None, :], tr_a], axis=0)
    sigs_b = np.concatenate([env_b[None, :], tr_b], axis=0)
    W = sigs_b[:, i0] * (1 - fr)[None] + sigs_b[:, i1] * fr[None]
    NEG = -1e30
    Wm = np.where(valid[None], W, NEG)
    wmax = Wm.max(axis=2)
    A = sigs_a[:, None, :]
    thr_a = sigs_a.max(axis=1)
    M = (valid[None] & (A > (thr_a[:, None, None] - 8.0))
         & (Wm > (wmax[:, :, None] - 8.0)))
    cnt = M.sum(axis=2)
    c = np.maximum(cnt, 1)
    mA = np.where(M, A, 0).sum(axis=2) / c
    mW = np.where(M, Wm, 0).sum(axis=2) / c
    XA = np.where(M, A - mA[:, :, None], 0)
    XW = np.where(M, Wm - mW[:, :, None], 0)
    num = (XA * XW).sum(axis=2)
    den = np.sqrt((XA * XA).sum(axis=2) * (XW * XW).sum(axis=2))
    corr = np.where((den > 0) & (cnt >= min_frames),
                    num / np.maximum(den, 1e-30), -1.0)
    e = corr[0]
    tmin = corr[1:].min(axis=0)
    j = np.minimum((e - _ASC_ENV_MIN) / 0.03,
                   (tmin - _ASC_TRACK_MIN) / 0.18)
    h = int(np.argmax(j))
    return float(e[h]), float(tmin[h])


def _wav_scale_corpus_dir(n_base: int = 36, dup_every: int = 3,
                          sr: int = 8000) -> str:
    """WAV fixture WITH PLANTED TIME-SCALE near-dups: the proven 3 s
    AM three-tone broadband recipe; every dup_every-th base also
    appears as `<id>_r` — the SAME signal RESAMPLED by rho cycling
    {0.90, 0.93, 0.96, 1.04, 1.07, 1.10} (±4-10% speed change, the
    sped-up / slowed re-upload class), alternately also HEAD-TRIMMED
    by 0.2-0.4 s, at 0.7x gain with fresh dither. Both the slot
    channel (wav_audio_dedup) and the offset channel
    (audio_offset_dedup) are blind to this class: a 7% speed change
    moves every fixed slot AND every constant-offset alignment."""
    from .. import codec

    out = f"/tmp/destor_ray_wav_scale/v1_n{n_base}_d{dup_every}_sr{sr}"
    if os.path.isdir(out):
        return out
    rhos = [0.90, 0.93, 0.96, 1.04, 1.07, 1.10]
    ids, blobs = [], []
    t = np.arange(3 * sr, dtype=np.float64) / sr
    for i in range(n_base):
        rng = np.random.Generator(np.random.Philox(key=1000 + i))
        sig = np.zeros_like(t)
        for _ in range(3):
            f = rng.uniform(80, 1800)
            a = rng.uniform(0.2, 0.5)
            sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
        sig += 0.1 * rng.normal(0, 1, len(t))
        lv = rng.uniform(0.2, 1.0, 25)
        env = np.interp(np.linspace(0, 24, len(t)), np.arange(25), lv)
        base = (sig * env / 3.0).astype(np.float64)
        d1 = np.random.Generator(np.random.Philox(key=7 + i)) \
            .normal(0, 1e-4, len(base))
        ids.append(f"scl{i:05d}")
        blobs.append(codec.wav_encode(
            (base + d1).astype(np.float32), sr))
        if i % dup_every == 0:
            rho = rhos[(i // dup_every) % len(rhos)]
            m = int(len(base) / rho)
            dup = np.interp(np.arange(m) * rho,
                            np.arange(len(base)), base)
            if i % 2 == 1:
                dup = dup[int((0.2 + 0.2 * ((i // 2) % 2)) * sr):]
            d2 = np.random.Generator(np.random.Philox(key=77 + i)) \
                .normal(0, 1e-4, len(dup))
            ids.append(f"scl{i:05d}_r")
            blobs.append(codec.wav_encode(
                (0.7 * dup + d2).astype(np.float32), sr))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def timescale_audio_dedup(sf_dir: str, n_base: int = 36,
                          dup_every: int = 3):
    """(n_clips, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — TIME-SCALE-invariant audio near-dup
    detection: resampled (sped-up / slowed ±4-10%) re-uploads, also
    head-trimmed and gain-altered. A speed change by rho maps dup time
    t_b to base time rho*t_b + d, so no CONSTANT offset aligns the
    clips — the class audio_offset_dedup's offset voting is blind to.
    The design extends the anchor insight one transform further:
    content-defined anchor times are scale-COVARIANT, so pairs of
    anchors vote for the (rho, d) LINE instead of single anchors
    voting for an offset. Candidates: per-anchor sliding-byte
    spectral-shape keys (_audio_scale_keys) through one LSH exchange —
    a single collision brings the pair into a bucket; the anchor time
    LISTS ride the band rows (~10 B) so proposals need no second
    exchange. Propose: all-pairs RANSAC + least-squares refine
    (_audio_scale_propose). Verify: dual gate at the warped alignment
    — envelope corr >= 0.97 AND min 2-coarse-band track corr >= 0.82
    (_audio_scale_verify; measured TRUE >= 0.993/0.957 vs DISTINCT
    env <= 0.78 with distinct pairs free to pick their best
    proposal). Planted rho in {0.90..1.10} x trim x 0.7 gain:
    recall 24/24 on the measurement corpus, zero false merges.

    Scale shape: one band exchange + one pair groupby; PCM never
    shuffles — each band row carries the 360 B envelope + 720 B
    2-track payload + anchor list (~25 rows/clip after key dedup;
    the pair-rendezvous topology applies if riding bytes ever
    dominate, as measured for the image flagship)."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _wav_scale_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")
    n_planted = -(-n_base // dup_every)
    n_clips = n_base + n_planted

    class ScaleSignature:
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "clip_id": [], "anchors": [], "env": [],
                   "tracks": []}
            for cid, data in zip(batch["clip_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                pcm, _sr = codec.audio_decode(data)
                el = _audio_band_log(pcm.astype(np.float64))
                env_tot = np.log(np.exp(el).sum(axis=1) + 1e-300)
                anchors = _audio_anchors(env_tot, r=_ASC_R)
                keys = _audio_scale_keys(el, anchors)
                E = np.exp(el)
                tr = np.stack([
                    np.log(E[:, :8].sum(axis=1) + 1e-300),
                    np.log(E[:, 8:].sum(axis=1) + 1e-300)], axis=0)
                env_b = np.round(env_tot * 1000).astype(np.int16) \
                    .tobytes()
                tr_b = np.round(tr * 1000).astype(np.int16).tobytes()
                anc_b = anchors.astype(np.int16).tobytes()
                for k in sorted({k for ks in keys for k in ks}):
                    out["bkey"].append(k)
                    out["clip_id"].append(cid)
                    out["anchors"].append(anc_b)
                    out["env"].append(env_b)
                    out["tracks"].append(tr_b)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "anchors": pa.array(out["anchors"], pa.binary()),
                "env": pa.array(out["env"], pa.binary()),
                "tracks": pa.array(out["tracks"], pa.binary()),
            })

    bands = ds.map_batches(ScaleSignature, batch_size=16,
                           concurrency=2, batch_format="pyarrow")
    n_cand = 0

    def verify_bucket(df) -> pa.Table:
        ls, rs, es, ts = [], [], [], []
        seen = set()
        for _, g in df.groupby("bkey", sort=False):
            ids_ = g["clip_id"].tolist()
            if len(ids_) < 2:
                continue
            payload = {}
            for cid, ab, eb, tb in zip(ids_, g["anchors"], g["env"],
                                       g["tracks"]):
                if cid not in payload:
                    env = np.frombuffer(eb, np.int16) \
                        .astype(np.float64) / 1000
                    tr = np.frombuffer(tb, np.int16) \
                        .astype(np.float64).reshape(2, -1) / 1000
                    anc = np.frombuffer(ab, np.int16) \
                        .astype(np.float64)
                    payload[cid] = (anc, env, tr)
            u = sorted(payload)
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    if (u[i], u[j]) in seen:
                        continue
                    seen.add((u[i], u[j]))
                    aa, ea, ta_ = payload[u[i]]
                    ab_, eb_, tb_ = payload[u[j]]
                    props = _audio_scale_propose(aa, ab_)
                    scr = []
                    for _n, r, dd in props:
                        ec, _tc = _audio_scale_verify(
                            ea, ta_, eb_, tb_, r, dd, coarse=True)
                        scr.append((ec, r, dd))
                    scr.sort(key=lambda s: -s[0])
                    best = (-1.0, -1.0)
                    bj = -np.inf
                    for rank, (ec, r, dd) in enumerate(scr):
                        # coarse screen: distinct proposals bottom out
                        # well under 0.6 env (full-sweep DISTINCT max
                        # 0.78, coarse strictly lower); always give
                        # the top-ranked proposal the full sweep
                        if rank > 0 and ec < 0.6:
                            break
                        e, t = _audio_scale_verify(ea, ta_, eb_, tb_,
                                                   r, dd)
                        j2 = min((e - _ASC_ENV_MIN) / 0.03,
                                 (t - _ASC_TRACK_MIN) / 0.18)
                        if j2 > bj:
                            bj = j2
                            best = (e, t)
                        if bj >= 0:
                            break
                    if (best[0] >= _ASC_ENV_MIN
                            and best[1] >= _ASC_TRACK_MIN):
                        ls.append(u[i])
                        rs.append(u[j])
                        es.append(int(round(best[0] * 1000)))
                        ts.append(int(round(best[1] * 1000)))
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "env_milli": pa.array(es, pa.int64()),
                         "track_milli": pa.array(ts, pa.int64())})

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"scl{i:05d}", f"scl{i:05d}_r")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_clips", n_clips, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Time-SCALE-invariant video dedup (speed-changed / frame-rate-
# resampled re-uploads, also head-trimmed): shot cuts are scale-
# COVARIANT anchor times, so anchor correspondences propose the
# (rho, d) frame map and a frame-level least-squares refine + global
# warped DC-thumb PSNR decides — the video twin of
# timescale_audio_dedup (video_offset_dedup covers constant offsets;
# avi_video_dedup's FRACTION-positioned slots survive a pure speed
# change but break the moment a trim composes with it, which is the
# class planted here).


def _avi_scale_corpus_dir(n_base: int = 24, dup_every: int = 3,
                          frames_per_video: int = 32) -> str:
    """MJPEG-AVI fixture WITH PLANTED TIME-SCALE near-dups: multi-shot
    base videos (2-4 shots, the proven motion model); every
    dup_every-th base also appears as `<id>_r` — the SAME video
    temporally RESAMPLED by rho cycling {0.75, 0.85, 1.15, 1.3}
    (dup frame j = base frame round(j*rho), the NN frame-rate /
    speed-change model), HEAD-TRIMMED by 2-4 frames, every frame
    transcoded to q70: a speed change composed with a trim defeats
    both the fraction-slot channel (trim shifts every fraction) and
    the offset channel (no constant offset exists)."""
    from .. import avi as avi_mod
    from .. import corpus as corpus_mod
    from .. import jpeg as jpeg_mod

    out = (f"/tmp/destor_ray_avi_scale/"
           f"v1_n{n_base}_d{dup_every}_f{frames_per_video}")
    if os.path.isdir(out):
        return out
    rhos = [0.75, 0.85, 1.15, 1.3]
    ids, blobs = [], []
    for i in range(n_base):
        n_shots = 2 + (i + i // 3) % 3
        cuts = [(s * frames_per_video) // n_shots
                for s in range(1, n_shots)]
        bounds = [0] + cuts + [frames_per_video]
        frames = []
        w = h = None
        for s in range(n_shots):
            px, w0, h0, _, _ = corpus_mod._base_pixels(
                seed=23, row=300 + i * 16 + s * 4)
            if w is None:
                w, h = w0, h0
            else:
                px = px[:h, :w]
                if px.shape[:2] != (h, w):
                    px = np.pad(px, ((0, h - px.shape[0]),
                                     (0, w - px.shape[1]), (0, 0)),
                                mode="edge")
            for j in range(bounds[s], bounds[s + 1]):
                fr = np.roll(px, shift=(j - bounds[s]), axis=1) \
                    .astype(np.int16)
                fr = np.clip(fr + 2 * (j - bounds[s]), 0, 255) \
                    .astype(np.uint8)
                frames.append(jpeg_mod.encode(fr, quality=85))
        ids.append(f"vs{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(frames, w=w, h=h, fps=10))
        if i % dup_every == 0:
            rho = rhos[(i // dup_every) % len(rhos)]
            k = 2 + (i // 4) % 3
            m = int(len(frames) / rho)
            idx = np.minimum(np.round(np.arange(m) * rho).astype(int),
                             len(frames) - 1)
            dup = [jpeg_mod.encode(jpeg_mod.decode(frames[t]),
                                   quality=70) for t in idx[k:]]
            ids.append(f"vs{i:05d}_r")
            blobs.append(avi_mod.encode_mjpeg(dup, w=w, h=h, fps=10))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def _video_scale_proposals(cuts_a: list, nf_a: int, cuts_b: list,
                           nf_b: int, cap: int = 10) -> list:
    """Coarse (rho, d) hypotheses for the frame map t_a = rho*t_b + d
    from anchor correspondences: every pair of (cut OR clip-end)
    anchors on each side (clip END is a valid anchor because the
    planted class head-trims only; a tail-trim would drop it and lean
    on cut pairs alone). Integer cut jitter over short spans makes
    these rho estimates coarse (up to ~20%) — the frame-level LS
    refine in _video_scale_verify is what sharpens them; hypotheses
    only need to land within its ±3-frame match window."""
    anch_a = list(cuts_a) + [nf_a]
    anch_b = list(cuts_b) + [nf_b]
    out = []
    for x1 in range(len(anch_a)):
        for y1 in range(len(anch_b)):
            for x2 in range(x1 + 1, len(anch_a)):
                for y2 in range(y1 + 1, len(anch_b)):
                    da = anch_a[x2] - anch_a[x1]
                    db = anch_b[y2] - anch_b[y1]
                    if da < 4 or db < 4:
                        continue
                    rho = da / db
                    if not (0.65 <= rho <= 1.55):
                        continue
                    d = anch_a[x1] - rho * anch_b[y1]
                    if not any(abs(np.log(rho / r0)) < 0.05
                               and abs(d - d0) < 3 for r0, d0 in out):
                        out.append((rho, d))
                    if len(out) >= cap:
                        return out
    return out


def _video_scale_verify(ta: np.ndarray, tb: np.ndarray, rho0: float,
                        d0: float, min_overlap: int = 8):
    """Frame-level refine + global warped PSNR: for each dup frame j,
    the best-MSE base frame among round(rho0*j+d0)±3 (vectorized
    gather over the 16×16 DC-thumb stacks); least-squares fit of the
    (rho, d) line through those matches; score = mean per-frame PSNR
    at the fitted map with a floor/ceil/±1 per-frame sweep (temporal
    NN rounding puts the true frame at one of those). The global mean
    is the decisive arm — a distinct pair's best frames still
    disagree everywhere (measured TRUE ≥ 52.7 dB vs DISTINCT ≤ 17.8
    dB at the 35 dB gate, >17 dB margin each side, distinct pairs
    free to pick their best proposal)."""
    na, nb = len(ta), len(tb)
    A = ta.astype(np.float64).reshape(na, -1)
    B = tb.astype(np.float64).reshape(nb, -1)
    j_all = np.arange(nb)
    c0 = np.round(rho0 * j_all + d0).astype(np.int64)
    offs = np.arange(-3, 4)
    cand = c0[:, None] + offs[None, :]                    # (nb, 7)
    ok = (cand >= 0) & (cand < na)
    cc = np.clip(cand, 0, na - 1)
    mse = ((A[cc] - B[:, None, :]) ** 2).mean(axis=2)
    mse[~ok] = np.inf
    has = ok.any(axis=1)
    if has.sum() < min_overlap:
        return -1.0
    bi = cc[j_all, np.argmin(mse, axis=1)][has]
    js = j_all[has].astype(np.float64)
    M = np.stack([js, np.ones(len(js))], axis=1)
    sol, *_ = np.linalg.lstsq(M, bi.astype(np.float64), rcond=None)
    r2, d2 = float(sol[0]), float(sol[1])
    if not (0.6 <= r2 <= 1.7):
        return -1.0
    cf = r2 * j_all + d2
    cand2 = np.stack([np.floor(cf), np.ceil(cf),
                      np.round(cf) - 1, np.round(cf) + 1],
                     axis=1).astype(np.int64)              # (nb, 4)
    ok2 = (cand2 >= 0) & (cand2 < na)
    cc2 = np.clip(cand2, 0, na - 1)
    mse2 = ((A[cc2] - B[:, None, :]) ** 2).mean(axis=2)
    mse2[~ok2] = np.inf
    best = mse2.min(axis=1)
    use = np.isfinite(best)
    if use.sum() < min_overlap:
        return -1.0
    ps = np.where(best[use] <= 0, 99.0,
                  np.minimum(10.0 * np.log10(255.0 * 255.0
                                             / np.maximum(best[use],
                                                          1e-12)),
                             99.0))
    return float(ps.mean())


def timescale_video_dedup(sf_dir: str, n_base: int = 24,
                          dup_every: int = 3,
                          psnr_min_centi: int = 3500):
    """(n_videos, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — TIME-SCALE-invariant video near-dup
    detection: speed-changed / frame-rate-resampled re-uploads
    (rho 0.75-1.3), head-trimmed 2-4 frames, q70 transcode. The
    composition defeats both existing video channels: a pure speed
    change preserves FRACTION positions (avi_video_dedup's slots
    survive it — documented, not a gap), but trim+scale shifts every
    fraction AND admits no constant offset (video_offset_dedup's
    vote). Shot cuts are scale-covariant anchors (measured jitter
    ≤ 0.7 frames through resample+trim+q70, zero misses): cut
    keyframes contribute dual phash+aHash 8-bit bands through one LSH
    exchange — a single collision brings the pair into a bucket — and
    the cut-index list + frame count ride the band rows, so (rho, d)
    proposals (_video_scale_proposals: cut×cut and cut×clip-end
    correspondences) need no second exchange. Verify
    (_video_scale_verify) refines each coarse hypothesis by
    frame-level best-match least squares, then gates on global warped
    DC-thumb PSNR ≥ 35 dB (measured TRUE ≥ 52.7 vs DISTINCT ≤ 17.8).

    Scale shape: one band exchange + one pair groupby; video payloads
    never shuffle — band rows carry the n×256 B thumb reel (~8 KB at
    32 frames; pair-rendezvous applies when reels dominate). Frames
    decode DC-only (no IDCT). Single-shot videos emit no cut anchors
    and fall back to the slot channel — same documented applicability
    as video_offset_dedup."""
    from .. import avi as avi_mod
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _avi_scale_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")
    n_planted = -(-n_base // dup_every)
    n_videos = n_base + n_planted

    class ScaleAnchorSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "video_id": [], "cuts": [], "reel": []}
            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = avi_mod.decode_frames(data)
                dcs = [jpeg.decode_dc_luma(f) for f in frames]
                t16 = np.stack([codec.resize_nn(g, 16, 16)
                                for g in dcs])
                cuts = _video_cuts(t16)
                if not cuts:
                    continue
                reel = t16.astype(np.uint8).tobytes()
                cuts_b = np.asarray(cuts, np.int16).tobytes()
                g32 = np.stack([codec.resize_nn(dcs[c], 32, 32)
                                for c in cuts])
                ph = codec.phash64_batch(g32).view(np.uint64)
                ah = codec.ahash64_batch(g32).view(np.uint64)
                keys = set()
                for ki in range(len(cuts)):
                    for ch, hv in enumerate((ph[ki], ah[ki])):
                        for band in range(8):
                            bits = int((hv >> np.uint64(8 * band))
                                       & np.uint64(0xFF))
                            keys.add(((ch * 8 + band) << 8) | bits)
                for kk in sorted(keys):
                    out["bkey"].append(kk)
                    out["video_id"].append(vid)
                    out["cuts"].append(cuts_b)
                    out["reel"].append(reel)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "video_id": pa.array(out["video_id"], pa.string()),
                "cuts": pa.array(out["cuts"], pa.binary()),
                "reel": pa.array(out["reel"], pa.binary()),
            })

    bands = ds.map_batches(ScaleAnchorSignature, batch_size=8,
                           concurrency=2, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ls, rs, ps = [], [], []
        seen = set()
        for _, g in df.groupby("bkey", sort=False):
            ids_ = g["video_id"].tolist()
            if len(ids_) < 2:
                continue
            payload = {}
            for vid, cb, rb in zip(ids_, g["cuts"], g["reel"]):
                if vid not in payload:
                    payload[vid] = (
                        np.frombuffer(cb, np.int16).astype(int).tolist(),
                        np.frombuffer(rb, np.uint8).reshape(-1, 16, 16))
            u = sorted(payload)
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    if (u[i], u[j]) in seen:
                        continue
                    seen.add((u[i], u[j]))
                    ca, ra = payload[u[i]]
                    cb_, rb_ = payload[u[j]]
                    best = -1.0
                    for r0, d0 in _video_scale_proposals(
                            ca, len(ra), cb_, len(rb_)):
                        best = max(best, _video_scale_verify(
                            ra, rb_, r0, d0))
                        if best * 100 >= psnr_min_centi:
                            break
                    if int(round(best * 100)) >= psnr_min_centi:
                        ls.append(u[i])
                        rs.append(u[j])
                        ps.append(int(round(best * 100)))
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "psnr_centi": pa.array(ps, pa.int64())})

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"vs{i:05d}", f"vs{i:05d}_r")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_videos", n_videos, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Letterbox/pillarbox-invariant video dedup: uniform bars added to
# EVERY frame (TV re-broadcast, vertical repost) shift+rescale all
# content in the DC thumbs, defeating every DC-thumb video channel;
# the image letterbox channel's full-res trim is applied to the k
# SLOT frames only (bounded full decodes per video).


def _avi_letterbox_corpus_dir(n_base: int = 24, dup_every: int = 3,
                              frames_per_video: int = 24) -> str:
    """MJPEG-AVI fixture WITH PLANTED LETTERBOXED near-dups: multi-shot
    base videos; every dup_every-th base also appears as `<id>_lb` —
    the SAME video with UNIFORM BARS on every frame (letterbox 12-22
    px top+bottom or pillarbox 20-32 px left+right, alternating; bar
    gray 18) at q70: bars shift and rescale the content inside every
    DC thumb, so the slot, offset and scale channels' hashes all move
    (measured 26.2 bits mean on slot hashes)."""
    from .. import avi as avi_mod
    from .. import corpus as corpus_mod
    from .. import jpeg as jpeg_mod

    out = (f"/tmp/destor_ray_avi_lb/"
           f"v1_n{n_base}_d{dup_every}_f{frames_per_video}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        n_shots = 2 + (i + i // 3) % 3
        cuts = [(s * frames_per_video) // n_shots
                for s in range(1, n_shots)]
        bounds = [0] + cuts + [frames_per_video]
        frames = []
        w = h = None
        for s in range(n_shots):
            px, w0, h0, _, _ = corpus_mod._base_pixels(
                seed=31, row=400 + i * 16 + s * 4)
            if w is None:
                w, h = w0, h0
            else:
                px = px[:h, :w]
                if px.shape[:2] != (h, w):
                    px = np.pad(px, ((0, h - px.shape[0]),
                                     (0, w - px.shape[1]), (0, 0)),
                                mode="edge")
            for j in range(bounds[s], bounds[s + 1]):
                fr = np.roll(px, shift=(j - bounds[s]), axis=1) \
                    .astype(np.int16)
                fr = np.clip(fr + 2 * (j - bounds[s]), 0, 255) \
                    .astype(np.uint8)
                frames.append(fr)
        ids.append(f"lbv{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(
            [jpeg_mod.encode(f, quality=85) for f in frames],
            w=w, h=h, fps=10))
        if i % dup_every == 0:
            tb, lr = ((12 + (i % 3) * 5, 0) if (i // dup_every) % 2 == 0
                      else (0, 20 + (i % 3) * 6))
            boxed = []
            for fr in frames:
                canvas = np.full((h + 2 * tb, w + 2 * lr, 3), 18,
                                 np.uint8)
                canvas[tb:tb + h, lr:lr + w] = fr
                boxed.append(jpeg_mod.encode(canvas, quality=70))
            ids.append(f"lbv{i:05d}_lb")
            blobs.append(avi_mod.encode_mjpeg(
                boxed, w=w + 2 * lr, h=h + 2 * tb, fps=10))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def letterbox_video_dedup(sf_dir: str, n_base: int = 24,
                          dup_every: int = 3, k_frames: int = 8,
                          psnr_min_centi: int = 3000):
    """(n_videos, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — LETTERBOX/PILLARBOX-invariant video
    near-dup detection: uniform bars added to every frame (the TV
    re-broadcast / vertical-repost class) shift AND rescale all
    content inside the fixed-size DC thumbs, so the slot channel's
    per-slot hashes move 26.2 bits mean (measured — past any band)
    and the offset/scale channels' cut keyframes move identically.
    The normalization is the image letterbox channel's measured
    full-res trim (codec.trim_uniform_border: strict MAD≤4 ∧ ptp≤32
    per line), applied to the k SLOT frames only — each slot frame is
    fully decoded, trimmed, then hashed/thumbed exactly like
    avi_video_dedup (fraction-positioned slots, dual phash+aHash 8-bit
    bands, one LSH exchange). Verify = mean per-slot 16×16 thumb PSNR
    maximized over a {0,1} inset sweep (the trim's residual ≤1-px
    fractional-rescale shoulder, the image channel's lesson): measured
    TRUE ≥ 37.8 dB vs DISTINCT ≤ 17.7 dB at the 30 dB gate.

    Scale shape: k full decodes + trims per video (bounded — NOT per
    frame; the DC-only story holds for every other frame), one band
    exchange with the k×256 B thumb reel riding, one pair groupby."""
    from .. import avi as avi_mod
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _avi_letterbox_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")
    n_planted = -(-n_base // dup_every)
    n_videos = n_base + n_planted

    class TrimSlotSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "video_id": [], "thumbs": []}
            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = avi_mod.decode_frames(data)
                nf = len(frames)
                k = min(k_frames, nf)
                g32s, tb = [], b""
                for j in range(k):
                    fr = jpeg.decode(frames[(j * nf) // k])
                    luma = (0.299 * fr[:, :, 0] + 0.587 * fr[:, :, 1]
                            + 0.114 * fr[:, :, 2]).astype(np.uint8)
                    luma = codec.trim_uniform_border(luma)
                    g32s.append(codec.resize_nn(luma, 32, 32))
                    tb += codec.resize_nn(luma, 16, 16).tobytes()
                stack = np.stack(g32s)
                ph = codec.phash64_batch(stack).view(np.uint64)
                ah = codec.ahash64_batch(stack).view(np.uint64)
                keys = set()
                for ch, hv in enumerate((ph, ah)):
                    for fi in range(k):
                        for band in range(8):
                            bits = int((hv[fi] >> np.uint64(8 * band))
                                       & np.uint64(0xFF))
                            slot = (ch * k_frames + fi) * 8 + band
                            keys.add((slot << 8) | bits)
                for kk in sorted(keys):
                    out["bkey"].append(kk)
                    out["video_id"].append(vid)
                    out["thumbs"].append(tb)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "video_id": pa.array(out["video_id"], pa.string()),
                "thumbs": pa.array(out["thumbs"], pa.binary()),
            })

    bands = ds.map_batches(TrimSlotSignature, batch_size=8,
                           concurrency=2, batch_format="pyarrow")

    def inset_psnr(ta: np.ndarray, tb_: np.ndarray) -> float:
        best = -1.0
        for ins in (0, 1):
            a = ta[:, ins:16 - ins, ins:16 - ins].astype(np.float64)
            b = tb_[:, ins:16 - ins, ins:16 - ins].astype(np.float64)
            mse = ((a - b) ** 2).mean(axis=(1, 2))
            ps = np.where(mse <= 0, 99.0,
                          np.minimum(10.0 * np.log10(
                              255.0 * 255.0 / np.maximum(mse, 1e-12)),
                              99.0))
            best = max(best, float(ps.mean()))
        return best

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "video_id", dedupe=True)
        raw = df["thumbs"].to_numpy()
        memo: dict = {}

        def reel(k):
            got = memo.get(ids_a[k])
            if got is None:
                got = memo[ids_a[k]] = np.frombuffer(
                    raw[k], np.uint8).reshape(-1, 16, 16)
            return got

        pc_ = np.empty(len(li), np.int64)
        for k in range(len(li)):
            a_, b_ = ((li[k], ri[k]) if ids_a[li[k]] < ids_a[ri[k]]
                      else (ri[k], li[k]))
            ra, rb = reel(a_), reel(b_)
            kk = min(len(ra), len(rb))
            pc_[k] = int(round(inset_psnr(ra[:kk], rb[:kk]) * 100))
        return _emit_pairs(ids_a, li, ri, pc_ >= psnr_min_centi, pc_,
                           score_col="psnr_centi")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"lbv{i:05d}", f"lbv{i:05d}_lb")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_videos", n_videos, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Sample-rate-invariant audio dedup: the same clip re-encoded at a
# different sample rate (8k -> 16k / 11.025k transcodes) breaks every
# fixed FRAME/HOP-in-SAMPLES feature — the normalization channel
# resamples PCM to the canonical rate before the proven fingerprints.


def _wav_sr_corpus_dir(n_base: int = 36, dup_every: int = 3,
                       sr: int = 8000) -> str:
    """WAV fixture WITH PLANTED SAMPLE-RATE-CONVERTED near-dups: the
    proven 3 s AM three-tone broadband recipe at 8 kHz; every
    dup_every-th base also appears as `<id>_f` — the SAME signal
    properly resampled to 16 kHz or 11.025 kHz (alternating; duration
    preserved, grid changed) at 0.8x gain with fresh dither: the
    transcode class where every fixed frame/hop-in-samples feature
    sees different time-frequency cells (measured: 30.3/60 fingerprint
    bits move, min 21 — past any band)."""
    from .. import codec

    out = f"/tmp/destor_ray_wav_sr/v1_n{n_base}_d{dup_every}_sr{sr}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    t = np.arange(3 * sr, dtype=np.float64) / sr
    for i in range(n_base):
        rng = np.random.Generator(np.random.Philox(key=500 + i))
        sig = np.zeros_like(t)
        for _ in range(3):
            f = rng.uniform(80, 1800)
            a = rng.uniform(0.2, 0.5)
            sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
        sig += 0.1 * rng.normal(0, 1, len(t))
        lv = rng.uniform(0.2, 1.0, 25)
        env = np.interp(np.linspace(0, 24, len(t)), np.arange(25), lv)
        base = (sig * env / 3.0).astype(np.float64)
        d1 = np.random.Generator(np.random.Philox(key=5 + i)) \
            .normal(0, 1e-4, len(base))
        ids.append(f"srx{i:05d}")
        blobs.append(codec.wav_encode(
            (base + d1).astype(np.float32), sr))
        if i % dup_every == 0:
            sr2 = 16000 if (i // dup_every) % 2 == 0 else 11025
            n_out = int(len(base) * sr2 / sr)
            dup = np.interp(np.arange(n_out) * sr / sr2,
                            np.arange(len(base)), base)
            d2 = np.random.Generator(np.random.Philox(key=900 + i)) \
                .normal(0, 1e-4, len(dup))
            ids.append(f"srx{i:05d}_f")
            blobs.append(codec.wav_encode(
                (0.8 * dup + d2).astype(np.float32), sr2))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def samplerate_audio_dedup(sf_dir: str, n_base: int = 36,
                           dup_every: int = 3, canonical_sr: int = 8000,
                           corr_min_milli: int = 950):
    """(n_clips, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — SAMPLE-RATE-invariant audio near-dup
    detection: proper sample-rate conversions (8k -> 16k / 11.025k
    transcodes; duration preserved) at altered gain. Fixed
    frame/hop-in-SAMPLES features see different time-frequency cells
    at a different rate — the slot channel's Haitsma-Kalker words
    measured moving 30.3/60 bits (min 21, past any band). The channel
    is a NORMALIZATION (the EXIF-orientation pattern, one modality
    over): decode reports the rate, PCM is linearly resampled to the
    canonical rate once per clip, and the PROVEN machinery runs
    unchanged — Haitsma-Kalker delta-sign words (gain-invariant by
    construction) through the 8x8-bit band exchange, verify =
    _audio_offset_verify at offset 0 (masked envelope corr AND
    block-profile corr, both mean-centered). The slot channel's
    mean-profile-only verify was measured FAILING here (TRUE min
    0.9900 < DISTINCT max 0.9946: the interp lowpass tilts the
    long-term profile) while the offset channel's dual arm separates
    TRUE >= 0.9910 from DISTINCT <= 0.5333 at the 0.95 gate.

    Scale shape: one band exchange + one pair groupby; PCM never
    shuffles (360 B envelope + 1.4 KB block-spectrogram ride)."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _wav_sr_corpus_dir(n_base=n_base, dup_every=dup_every,
                           sr=canonical_sr)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")
    n_planted = -(-n_base // dup_every)
    n_clips = n_base + n_planted

    class SrNormFingerprint:
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "clip_id": [], "env": [], "spec": []}
            for cid, data in zip(batch["clip_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                pcm, sr = codec.audio_decode(data)
                pcm = pcm.astype(np.float64)
                if sr != canonical_sr:
                    n_out = int(len(pcm) * canonical_sr / sr)
                    pcm = np.interp(
                        np.arange(n_out) * sr / canonical_sr,
                        np.arange(len(pcm)), pcm)
                el = _audio_band_log(pcm)
                e = np.exp(el)
                d_t = np.diff(e, axis=0)
                bits = (d_t[:, :-1] - d_t[:, 1:]) > 0
                slots = [(j * (len(bits) - 1)) // 3 for j in range(4)]
                word = np.uint64(0)
                nb = bits.shape[1]
                for j, s in enumerate(slots):
                    w_ = int(np.packbits(
                        bits[s], bitorder="big")[:2].view(">u2")[0] >> 1)
                    word |= np.uint64((w_ & ((1 << nb) - 1))
                                      ) << np.uint64(j * nb)
                env_tot = np.log(e.sum(axis=1) + 1e-300)
                nblk = len(el) // 4
                spec4 = el[:nblk * 4].reshape(nblk, 4, _AOF_NB) \
                    .mean(axis=1)
                env_b = np.round(env_tot * 1000).astype(np.int16) \
                    .tobytes()
                spec_b = np.round(spec4 * 1000).astype(np.int16) \
                    .tobytes()
                for band in range(8):
                    bits8 = int((word >> np.uint64(8 * band))
                                & np.uint64(0xFF))
                    out["bkey"].append((band << 8) | bits8)
                    out["clip_id"].append(cid)
                    out["env"].append(env_b)
                    out["spec"].append(spec_b)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "env": pa.array(out["env"], pa.binary()),
                "spec": pa.array(out["spec"], pa.binary()),
            })

    bands = ds.map_batches(SrNormFingerprint, batch_size=16,
                           concurrency=2, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "clip_id", dedupe=True)
        renv = df["env"].to_numpy()
        rspec = df["spec"].to_numpy()
        memo: dict = {}

        def clip(k):
            got = memo.get(ids_a[k])
            if got is None:
                got = memo[ids_a[k]] = (
                    np.frombuffer(renv[k], np.int16).astype(np.float64)
                    / 1000,
                    np.frombuffer(rspec[k], np.int16).astype(np.float64)
                    .reshape(-1, _AOF_NB) / 1000)
            return got

        cm = np.empty(len(li), np.int64)
        for k in range(len(li)):
            a_, b_ = ((li[k], ri[k]) if ids_a[li[k]] < ids_a[ri[k]]
                      else (ri[k], li[k]))
            ea, sa = clip(a_)
            eb_, sb_ = clip(b_)
            cm[k] = int(round(_audio_offset_verify(
                ea, sa, eb_, sb_, 0) * 1000))
        return _emit_pairs(ids_a, li, ri, cm >= corr_min_milli, cm,
                           score_col="corr_milli")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"srx{i:05d}", f"srx{i:05d}_f")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_clips", n_clips, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Stereo-re-master-invariant audio dedup: a mono recording re-released
# as a stereo master (pan-law placement, Haas-delay widening,
# mid/side widening) — measured: NO single decode projection is
# invariant across the three mastering styles, so clips emit a small
# PROJECTION SET {downmix, ch0, ch1} (the grayscale dual-luma
# rendezvous pattern, one modality over) and any one collision finds
# the pair.

_STEREO_KINDS = ("pan", "haas", "ms")


def _wav_stereo_corpus_dir(n_base: int = 36, dup_every: int = 3,
                           sr: int = 8000) -> str:
    """WAV fixture WITH PLANTED STEREO RE-MASTERS: the proven 3 s AM
    three-tone broadband mono recipe at 8 kHz; every dup_every-th base
    also appears as `<id>_s` — the SAME signal mastered to 2-channel
    stereo with fresh dither, cycling the three wild mastering styles:
    `pan` = constant-power pan law (L=cos(th)x, R=sin(th)x — every
    projection is a pure gain), `haas` = precedence-effect widening
    (L=x, R=0.85x delayed 8/16 ms — the mean DOWNMIX is comb-filtered:
    measured 11.5/60 fingerprint bits move, verify corr drops to
    0.8822, but ch0 is the untouched signal), `ms` = mid/side widening
    (L=0.9(x+s), R=0.9(x-s) with band-limited side noise — ch0/ch1
    move 23-25/60 bits and verify at 0.61, but the side signal cancels
    EXACTLY in the mean downmix)."""
    from .. import codec

    out = f"/tmp/destor_ray_wav_st/v1_n{n_base}_d{dup_every}_sr{sr}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    t = np.arange(3 * sr, dtype=np.float64) / sr
    for i in range(n_base):
        rng = np.random.Generator(np.random.Philox(key=500 + i))
        sig = np.zeros_like(t)
        for _ in range(3):
            f = rng.uniform(80, 1800)
            a = rng.uniform(0.2, 0.5)
            sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
        sig += 0.1 * rng.normal(0, 1, len(t))
        lv = rng.uniform(0.2, 1.0, 25)
        env = np.interp(np.linspace(0, 24, len(t)), np.arange(25), lv)
        base = (sig * env / 3.0).astype(np.float64)
        d1 = np.random.Generator(np.random.Philox(key=5 + i)) \
            .normal(0, 1e-4, len(base))
        ids.append(f"stx{i:05d}")
        blobs.append(codec.wav_encode(
            (base + d1).astype(np.float32), sr))
        if i % dup_every == 0:
            kind = _STEREO_KINDS[(i // dup_every) % len(_STEREO_KINDS)]
            rng2 = np.random.Generator(np.random.Philox(key=900 + i))
            if kind == "pan":
                th = rng2.uniform(0.2, 1.37)
                l_, r_ = np.cos(th) * base, np.sin(th) * base
            elif kind == "haas":
                d_ms = 0.008 if (i // dup_every) % 2 == 0 else 0.016
                nd = int(sr * d_ms)
                xd = np.concatenate([np.zeros(nd), base[:-nd]])
                l_, r_ = base, 0.85 * xd
            else:  # ms
                s = 0.25 * rng2.normal(0, 1, len(base))
                s = np.convolve(s, np.ones(8) / 8, mode="same")
                l_, r_ = 0.9 * (base + s), 0.9 * (base - s)
            st = np.stack([l_, r_], axis=1)
            d2 = rng2.normal(0, 1e-4, st.shape)
            ids.append(f"stx{i:05d}_s")
            blobs.append(codec.wav_encode(
                np.clip(st + d2, -1, 1).astype(np.float32), sr))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def stereo_audio_dedup(sf_dir: str, n_base: int = 36,
                       dup_every: int = 3,
                       corr_min_milli: int = 950):
    """(kind, n_planted, n_found, n_false, recall_ppm) per stereo
    mastering class + a "_total" row — STEREO-RE-MASTER-invariant
    audio near-dup detection: the same mono recording re-released as a
    2-channel master. Measured per-projection invariants (12-clip
    design ladder): a constant-power PAN is a pure gain in every
    projection (≤1/60 HK bits move); HAAS widening (R = 0.85x delayed
    8-16 ms) comb-filters the mean downmix (11.5/60 bits mean, 3/12
    past every band, verify 0.8822 < gate) while ch0 is bit-exact
    (≤1 bit, verify 1.0); MID/SIDE widening moves ch0/ch1 by 23-25/60
    bits (verify 0.61) while the side signal cancels EXACTLY in the
    mean downmix (≤1 bit, verify 1.0). No single projection covers all
    three classes, so multi-channel clips emit the Haitsma-Kalker
    delta-sign words of THREE projections {mean downmix, ch0, ch1}
    (mono clips emit one) through the proven 8x8-bit band exchange;
    verify takes the MAX of _audio_offset_verify at offset 0 over the
    projection payload combos present in the colliding bucket (true
    invariant-projection pairs ≥ 0.99, distinct background ≤ 0.5341 at
    the 0.95 gate — the extra combos add no false-merge surface).

    Scale shape: one band exchange + one pair groupby; PCM never
    shuffles (per-projection 360 B envelope + 1.4 KB block-spectrogram
    ride the band rows; stereo clips ship 3x8 = 24 rows vs mono 8)."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _wav_stereo_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")
    n_planted = -(-n_base // dup_every)

    class StereoProjFingerprint:
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "clip_id": [], "proj": [],
                   "env": [], "spec": []}
            for cid, data in zip(batch["clip_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                ch, _sr = codec.audio_decode_channels(data)
                ch = ch.astype(np.float64)
                projs = [(0, ch.mean(axis=1))]
                if ch.shape[1] > 1:
                    projs += [(1, ch[:, 0]), (2, ch[:, 1])]
                for pj, pcm in projs:
                    el = _audio_band_log(pcm)
                    e = np.exp(el)
                    d_t = np.diff(e, axis=0)
                    bits = (d_t[:, :-1] - d_t[:, 1:]) > 0
                    slots = [(j * (len(bits) - 1)) // 3
                             for j in range(4)]
                    word = np.uint64(0)
                    nb = bits.shape[1]
                    for j, s in enumerate(slots):
                        w_ = int(np.packbits(
                            bits[s],
                            bitorder="big")[:2].view(">u2")[0] >> 1)
                        word |= np.uint64(
                            (w_ & ((1 << nb) - 1))) << np.uint64(j * nb)
                    env_tot = np.log(e.sum(axis=1) + 1e-300)
                    nblk = len(el) // 4
                    spec4 = el[:nblk * 4].reshape(nblk, 4, _AOF_NB) \
                        .mean(axis=1)
                    env_b = np.round(env_tot * 1000) \
                        .astype(np.int16).tobytes()
                    spec_b = np.round(spec4 * 1000) \
                        .astype(np.int16).tobytes()
                    for band in range(8):
                        bits8 = int((word >> np.uint64(8 * band))
                                    & np.uint64(0xFF))
                        out["bkey"].append((band << 8) | bits8)
                        out["clip_id"].append(cid)
                        out["proj"].append(pj)
                        out["env"].append(env_b)
                        out["spec"].append(spec_b)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "proj": pa.array(out["proj"], pa.int8()),
                "env": pa.array(out["env"], pa.binary()),
                "spec": pa.array(out["spec"], pa.binary()),
            })

    bands = ds.map_batches(StereoProjFingerprint, batch_size=16,
                           concurrency=2, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        # pairs from the shared harness; per-clip PROJECTION sets are
        # collected bucket-wide (the original evaluated each pair with
        # only the projections co-present in its first colliding
        # group — the bucket-wide set is the better-defined superset;
        # recall/false pins unchanged)
        ids_a, li, ri = _bucket_pairs(df, "clip_id", dedupe=True)
        empty = pa.table({"l": pa.array([], pa.string()),
                          "r": pa.array([], pa.string()),
                          "corr_milli": pa.array([], pa.int64())})
        if not len(li):
            return empty
        pay: dict = {}
        for cid, pj, eb, sb in zip(df["clip_id"], df["proj"],
                                   df["env"], df["spec"]):
            d_ = pay.setdefault(cid, {})
            if pj not in d_:
                d_[pj] = (
                    np.frombuffer(eb, np.int16).astype(np.float64)
                    / 1000,
                    np.frombuffer(sb, np.int16).astype(np.float64)
                    .reshape(-1, _AOF_NB) / 1000)
        cm = np.empty(len(li), np.int64)
        for k in range(len(li)):
            a_, b_ = sorted((ids_a[li[k]], ids_a[ri[k]]))
            best = -1.0
            for ea, sa in pay[a_].values():
                for eb_, sb_ in pay[b_].values():
                    best = max(best, _audio_offset_verify(
                        ea, sa, eb_, sb_, 0))
                    if int(round(best * 1000)) >= corr_min_milli:
                        break
                else:
                    continue
                break
            cm[k] = int(round(best * 1000))
        return _emit_pairs(ids_a, li, ri, cm >= corr_min_milli, cm,
                           score_col="corr_milli")

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    pairs = pairs.drop_duplicates(["l", "r"])
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _STEREO_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _STEREO_KINDS[(i // dup_every) % len(_STEREO_KINDS)]
        truth_by_kind[kind].add((f"stx{i:05d}", f"stx{i:05d}_s"))
    return _per_class_report(got, truth_by_kind, _STEREO_KINDS)


# ---------------------------------------------------------------------------
# Mirror/rotation-orbit-invariant video dedup: horizontally mirrored
# (and upside-down) re-uploads — the most common manual evasion edit —
# move every slot hash past any band; the image dihedral channel's
# orbit-emission pattern lifts to video with a 3-element emission set
# whose difference set covers the full Klein 4-group.


def _avi_mirror_corpus_dir(n_base: int = 24, dup_every: int = 3,
                           frames_per_video: int = 8) -> str:
    """AVI fixture WITH PLANTED MIRRORED near-dups: base MJPEG videos
    (the proven _avi_dup_corpus_dir recipe, seed 37) plus, for every
    dup_every-th base, `<id>_mr` — every frame horizontally MIRRORED
    (even planted index) or ROTATED 180 degrees (odd index) and
    re-encoded at q70: the flip re-upload class used to evade
    copyright matching (slot phash measured moving 34.8/64 bits mean,
    min 30 — past any 8-bit band)."""
    from .. import corpus as corpus_mod
    from .. import avi as avi_mod
    from .. import jpeg as jpeg_mod

    out = (f"/tmp/destor_ray_avi_mirror/"
           f"n{n_base}_d{dup_every}_f{frames_per_video}")
    if os.path.isdir(out):
        return out
    ids, blobs, nframes = [], [], []
    for i in range(n_base):
        px, w, h, _, _ = corpus_mod._base_pixels(seed=37, row=i)
        frames_px = []
        for j in range(frames_per_video):
            fr = np.roll(px, shift=3 * j, axis=1).astype(np.int16)
            frames_px.append(np.clip(fr + 4 * j, 0, 255).astype(np.uint8))
        ids.append(f"mrv{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(
            [jpeg_mod.encode(f, quality=85) for f in frames_px],
            w=w, h=h, fps=10))
        nframes.append(frames_per_video)
        if i % dup_every == 0:
            if (i // dup_every) % 2 == 0:
                tf = [np.ascontiguousarray(f[:, ::-1, :])
                      for f in frames_px]
            else:
                tf = [np.ascontiguousarray(f[::-1, ::-1, :])
                      for f in frames_px]
            ids.append(f"mrv{i:05d}_mr")
            blobs.append(avi_mod.encode_mjpeg(
                [jpeg_mod.encode(f, quality=70) for f in tf],
                w=w, h=h, fps=10))
            nframes.append(frames_per_video)
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "n_frames": pa.array(nframes, pa.int32()),
    })})


def mirror_video_dedup(sf_dir: str, n_base: int = 24, dup_every: int = 3,
                       k_frames: int = 8, psnr_min_centi: int = 3000,
                       min_slots: int = 6):
    """(n_videos, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — MIRROR/ROT180-invariant video
    near-dup detection: horizontally flipped (and upside-down)
    re-uploads, the cheapest and most common manual evasion edit.
    Every DC-thumb slot hash moves far past any band under a flip
    (measured: phash 34.8/64 bits mean, min 30), so avi/offset/
    timescale/letterbox video channels are all blind.

    The image dihedral channel's ORBIT EMISSION lifts to video with a
    group-theoretic economy: the relevant transforms form the Klein
    4-group {id, fliplr, flipud, rot180} (rot90 changes aspect and is
    not a re-upload edit for video); emitting band rows for the
    3-element set {id, fliplr, flipud} suffices because its difference
    set T.T^-1 is the WHOLE group (fliplr.flipud = rot180), so any
    transformed copy collides with its base on at least one shared
    orientation — 3x band rows instead of 4x. Slot keys carry
    (channel, slot, band) but NOT orientation, exactly so those
    cross-orientation collisions happen.

    Verify is global-orientation slot PSNR: the k identity-orientation
    16x16 DC thumbs ride the band rows; a pair passes when >=
    min_slots of k slots clear the PSNR gate under the SAME group
    element applied to one side's whole reel (max over the 4
    elements) — per-slot orientation mixing is disallowed, so a
    single coincidentally-symmetric frame cannot merge two distinct
    videos. Measured margins: true mirrored-back thumb PSNR >= 50.6 dB
    vs distinct <= ~18 dB at the 30 dB gate.

    Scale shape: one DC-only decode pass (k slot frames, no IDCT, no
    full entropy decode of the other N-k), one band exchange with the
    k x 256 B reel riding (3x rows vs the plain slot channel;
    pair-rendezvous applies unchanged when the network binds), one
    pair groupby. Payloads never shuffle."""
    from .. import avi as avi_mod
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _avi_mirror_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet",
                               columns=["video_id", "bytes"])
    n_planted = -(-n_base // dup_every)
    n_videos = n_base + n_planted

    class OrbitSlotSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "video_id": [], "thumbs": []}
            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = avi_mod.decode_frames(data)
                nf = len(frames)
                k = min(k_frames, nf)
                g32s, tb = [], b""
                for j in range(k):
                    dc = jpeg.decode_dc_luma(frames[(j * nf) // k])
                    g32s.append(codec.resize_nn(dc, 32, 32))
                    tb += codec.resize_nn(dc, 16, 16).tobytes()
                stack = np.stack(g32s)
                keys = set()
                # emission set {id, fliplr, flipud}: difference set =
                # full Klein 4-group (see docstring)
                for orient in (stack, stack[:, :, ::-1],
                               stack[:, ::-1, :]):
                    ph = codec.phash64_batch(
                        np.ascontiguousarray(orient)).view(np.uint64)
                    ah = codec.ahash64_batch(
                        np.ascontiguousarray(orient)).view(np.uint64)
                    for ch, hv in enumerate((ph, ah)):
                        for fi in range(k):
                            for band in range(8):
                                bits = int((hv[fi]
                                            >> np.uint64(8 * band))
                                           & np.uint64(0xFF))
                                slot = (ch * k_frames + fi) * 8 + band
                                keys.add((slot << 8) | bits)
                for kk in sorted(keys):
                    out["bkey"].append(kk)
                    out["video_id"].append(vid)
                    out["thumbs"].append(tb)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "video_id": pa.array(out["video_id"], pa.string()),
                "thumbs": pa.array(out["thumbs"], pa.binary()),
            })

    bands = ds.map_batches(OrbitSlotSignature, batch_size=8,
                           concurrency=2, batch_format="pyarrow")

    def orbit_slot_good(ta: np.ndarray, tb_: np.ndarray) -> int:
        """max over the 4 group elements (applied GLOBALLY to reel b)
        of the count of slots clearing the PSNR gate."""
        best = 0
        for g in (tb_, tb_[:, :, ::-1], tb_[:, ::-1, :],
                  tb_[:, ::-1, ::-1]):
            a = ta.astype(np.float64)
            b = g.astype(np.float64)
            mse = ((a - b) ** 2).mean(axis=(1, 2))
            ps = np.where(mse <= 0, 99.0,
                          10.0 * np.log10(255.0 * 255.0
                                          / np.maximum(mse, 1e-12)))
            best = max(best, int((ps * 100 >= psnr_min_centi).sum()))
        return best

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "video_id", dedupe=True)
        raw = df["thumbs"].to_numpy()
        memo: dict = {}

        def reel(k):
            got = memo.get(ids_a[k])
            if got is None:
                got = memo[ids_a[k]] = np.frombuffer(
                    raw[k], np.uint8).reshape(-1, 16, 16)
            return got

        ok = np.zeros(len(li), bool)
        for k in range(len(li)):
            a_, b_ = ((li[k], ri[k]) if ids_a[li[k]] < ids_a[ri[k]]
                      else (ri[k], li[k]))
            ra, rb = reel(a_), reel(b_)
            kk = min(len(ra), len(rb))
            ok[k] = orbit_slot_good(ra[:kk], rb[:kk]) >= min(min_slots, kk)
        return _emit_pairs(ids_a, li, ri, ok)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"mrv{i:05d}", f"mrv{i:05d}_mr")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_videos", n_videos, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Pitch-shift-invariant audio dedup: tempo-preserving transposition
# ("nightcore" / key-change re-uploads) moves every spectral feature to
# different frequency cells while leaving TIMING untouched — the exact
# complement of the timescale channel. Measured blind on
# audio_offset_dedup: 2/12 recall (most pairs get ZERO proposals — the
# 32-bit spectral words move past both 16-bit halves — and the
# band-profile verify arm fails on the survivors).


_APS_FRAME, _APS_HOP, _APS_NB = 1024, 128, 32
_APS_EDGES = np.unique(np.geomspace(8, 512, 33).astype(int))
_APS_STEP = float(np.log(512.0 / 8.0) / 32.0)  # log-band width


def _audio_pitch_feats(pcm: np.ndarray):
    """(env, prof) — log total-energy envelope per frame (EXACTLY
    pitch-invariant by Parseval: transposition permutes spectral cells
    but preserves frame energy) and the per-4-frame-block INTEGRATED
    log-band power profile (power summed over geometric bins, L1-
    normalized per block, [1,2,1]/4-smoothed). Integration — not
    log-grid SAMPLING — is load-bearing: a windowed tone has fixed
    ~4-bin width in linear frequency, so a log grid that samples power
    at grid points aliases narrow high-frequency peaks (measured: the
    sampled-grid verify arm bottomed at specZ −0.02 on TRUE pairs);
    summing bins puts every tone's full mass in its band regardless of
    width (measured: true ≥ 0.9255)."""
    nf = 1 + (len(pcm) - _APS_FRAME) // _APS_HOP
    idx = (np.arange(_APS_FRAME)[None, :]
           + _APS_HOP * np.arange(nf)[:, None])
    w = np.hanning(_APS_FRAME)
    spec = np.abs(np.fft.rfft(pcm[idx] * w, axis=1)) ** 2
    env = np.log(spec.sum(axis=1) + 1e-300)
    bb = np.add.reduceat(spec, _APS_EDGES[:-1], axis=1)[:, :_APS_NB]
    nblk = len(bb) // 4
    pw4 = bb[:nblk * 4].reshape(nblk, 4, _APS_NB).mean(axis=1)
    prof = pw4 / np.maximum(pw4.sum(axis=1, keepdims=True), 1e-30)
    sm = (np.pad(prof, ((0, 0), (1, 1)), mode="edge")[:, :-2]
          + 2.0 * prof
          + np.pad(prof, ((0, 0), (1, 1)), mode="edge")[:, 2:]) / 4.0
    return env, sm


def _audio_env_words(env: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """32-bit ENVELOPE-shape word per anchor: sign of env deltas over a
    16-offset ladder at two delta scales (4 and 12 frames) — gain-
    invariant (log-env deltas) AND pitch-invariant (the envelope is
    total energy). The offset channel's words are spectral-shape and
    move past both banding halves under transposition; these stay
    bit-identical up to dither."""
    n = len(env)
    words = np.zeros(len(anchors), np.uint64)
    offs = np.arange(-28, 36, 4)
    for k, a in enumerate(anchors):
        v = 0
        for d in (4, 12):
            for oo in offs:
                i1 = min(max(int(a) + int(oo), 0), n - 1)
                i0 = min(max(int(a) + int(oo) - d, 0), n - 1)
                v = (v << 1) | int(env[i1] > env[i0])
        words[k] = v
    return words


def _audio_pitch_verify(env_a, prof_a, env_b, prof_b,
                        smax: float = 3.0):
    """(env_zncc, spec_zncc) dual verify at offset 0 (transposition
    preserves timing): masked mean-centered envelope correlation, and
    the max over fractional log-band shifts s in [-smax, smax] (0.125
    steps, linear interp — covers alpha in [0.69, 1.45]) of the masked
    2D ZNCC between block-profile matrices with b's bands translated
    by s. Both arms are independent evidence: the envelope arm alone
    could merge two different recordings with the same beat; the
    spectral arm alone is loose on smooth profiles. Measured margins
    (5-tone independent-AM fixture, alpha 0.85-1.26, fresh noise):
    TRUE env ≥ 0.9681 / spec ≥ 0.9255 vs DISTINCT env ≤ 0.4486 /
    spec ≤ 0.7217 at the 0.95/0.85 gates."""
    n = min(len(env_a), len(env_b))
    m = (env_a[:n] > env_a.max() - 8.0) & (env_b[:n] > env_b.max() - 8.0)
    if m.sum() < 60:
        return -1.0, -1.0
    ca = env_a[:n][m] - env_a[:n][m].mean()
    cb = env_b[:n][m] - env_b[:n][m].mean()
    den = float(np.sqrt((ca * ca).sum() * (cb * cb).sum()))
    env_c = float((ca * cb).sum()) / den if den > 0 else -1.0

    nblk = min(len(prof_a), len(prof_b))
    a, b = prof_a[:nblk], prof_b[:nblk]
    ea = env_a[:(len(env_a) // 4) * 4].reshape(-1, 4).mean(axis=1)[:nblk]
    eb = env_b[:(len(env_b) // 4) * 4].reshape(-1, 4).mean(axis=1)[:nblk]
    bm = (ea > env_a.max() - 8.0) & (eb > env_b.max() - 8.0)
    if bm.sum() < 10:
        return env_c, -1.0
    best = -1.0
    for s in np.arange(-smax, smax + 1e-9, 0.125):
        i = np.arange(_APS_NB) + s
        i0 = np.clip(np.floor(i).astype(int), 0, _APS_NB - 1)
        i1 = np.clip(i0 + 1, 0, _APS_NB - 1)
        fr = i - np.floor(i)
        valid = (i >= 0) & (i <= _APS_NB - 1)
        if valid.sum() < 20:
            continue
        bs = b[:, i0] * (1 - fr) + b[:, i1] * fr
        A = a[bm][:, valid]
        B = bs[bm][:, valid]
        A = A - A.mean()
        B = B - B.mean()
        den2 = float(np.sqrt((A * A).sum() * (B * B).sum()))
        c = float((A * B).sum()) / den2 if den2 > 0 else -1.0
        best = max(best, c)
    return env_c, best


def _wav_pitch_corpus_dir(n_base: int = 36, dup_every: int = 3,
                          sr: int = 8000) -> str:
    """WAV fixture WITH PLANTED PITCH-SHIFTED near-dups: 3 s clips of
    FIVE tones, EACH with an independent 25-knot AM envelope — richer
    than the earlier three-tone/global-envelope recipe on purpose: a
    time-VARYING spectral shape is what the spectral verify arm keys
    on, and real audio always has one (a constant-tone fixture
    degenerates the arm to a 3-element band-set comparison). Every
    dup_every-th base also appears as `<id>_p` — the SAME per-tone
    envelopes with all tone frequencies multiplied by alpha in
    {0.85, 0.9, 1.12, 1.26} (±2-4 semitone transposition, tempo
    preserved) at 0.8x gain with a FRESH noise realization (a real
    pitch shifter transposes the noise too; regenerating it shares
    even less content — the harder case).

    Tone frequencies are rejection-sampled to >= 60 Hz apart: two
    NEAR-UNISON tones beat at |f1-f2|, and a pitch shift alpha-scales
    the beat RATE, so the energy envelope is genuinely NOT invariant
    for such clips (measured: a 1.4 Hz tone gap broke envelope ZNCC
    to 0.735 and every candidate word) — a physical boundary of the
    Parseval invariant, documented on the channel, not a fixture
    accident."""
    from .. import codec

    out = f"/tmp/destor_ray_wav_pitch/v2_n{n_base}_d{dup_every}_sr{sr}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    t = np.arange(3 * sr, dtype=np.float64) / sr
    alphas = [0.85, 0.9, 1.12, 1.26]

    def synth(i, alpha, noise_key):
        rng = np.random.Generator(np.random.Philox(key=3000 + i))
        sig = np.zeros_like(t)
        chosen = []
        for _ in range(5):
            f = rng.uniform(80, 1800)
            while chosen and min(abs(f - c) for c in chosen) < 60.0:
                f = rng.uniform(80, 1800)
            chosen.append(f)
            a = rng.uniform(0.2, 0.5)
            ph = rng.uniform(0, 6.28)
            lv = rng.uniform(0.05, 1.0, 25)
            env_k = np.interp(np.linspace(0, 24, len(t)),
                              np.arange(25), lv)
            sig += a * env_k * np.sin(2 * np.pi * f * alpha * t + ph)
        nrng = np.random.Generator(
            np.random.Philox(key=4000 + i * 7 + noise_key))
        sig += 0.05 * nrng.normal(0, 1, len(t))
        return sig / 3.0

    for i in range(n_base):
        ids.append(f"pit{i:05d}")
        blobs.append(codec.wav_encode(
            synth(i, 1.0, 0).astype(np.float32), sr))
        if i % dup_every == 0:
            alpha = alphas[(i // dup_every) % 4]
            ids.append(f"pit{i:05d}_p")
            blobs.append(codec.wav_encode(
                (0.8 * synth(i, alpha, 1)).astype(np.float32), sr))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def pitchshift_audio_dedup(sf_dir: str, n_base: int = 36,
                           dup_every: int = 3,
                           env_min_milli: int = 950,
                           spec_min_milli: int = 850):
    """(n_clips, n_planted, n_candidate_pairs, n_verified_pairs,
    n_true, n_false, recall_ppm) — PITCH-SHIFT-invariant audio near-dup
    detection: tempo-preserving transposition (±2-4 semitones — the
    "nightcore" / key-change re-upload class) moves every spectral
    feature to different frequency cells while leaving timing
    untouched — the exact complement of timescale_audio_dedup's class,
    and measured blind on audio_offset_dedup (2/12 recall: the 32-bit
    spectral-shape words move past both 16-bit banding halves on most
    pairs, and the band-profile verify arm fails on the survivors).

    Both arms are the transform's EXACT invariants. Candidates hash
    32-bit ENVELOPE-shape words (sign of log-total-energy deltas over
    a two-scale offset ladder) at the proven content-defined anchors —
    total frame energy is pitch-invariant by Parseval, so words stay
    bit-identical up to dither (measured: every true pair collides,
    min 1, vs 1 collision over 66 distinct pairs) — banded as two
    16-bit halves through one LSH exchange. Verify is a dual gate at
    offset 0: masked envelope ZNCC >= 0.95 AND, over a fractional
    log-band shift sweep (the pitch factor is log-translation on
    INTEGRATED geometric power bands — integration, not grid sampling,
    is load-bearing: sampled grids alias narrow tones, measured specZ
    -0.02 on true pairs), masked 2D block-profile ZNCC >= 0.85.
    Measured margins: TRUE >= 0.9681/0.9255 vs DISTINCT <=
    0.4486/0.7217 — each arm independently separates what the other
    can't (same-beat distinct recordings / smooth shared profiles).

    Class boundaries, both documented and measured: (1) NEAR-UNISON
    beating — two tones < ~8 Hz apart beat at |f1-f2| and a pitch
    shift alpha-scales the beat rate, so the energy envelope is
    genuinely not invariant (a 1.4 Hz gap broke envelope ZNCC to
    0.735 and every candidate word); real pitch shifters change beat
    rates too — such clips need the spectral channel family instead.
    (2) A pitch+trim composite needs the offset channel's
    anchor-offset votes on these pitch-invariant words — a
    composition seam, not covered here.

    Scale shape: one band exchange + one pair groupby; PCM never
    shuffles — each band row carries the ~360 B int16 envelope + 2.9 KB
    uint16 block-profile matrix, ~7 rows/clip (pair-rendezvous applies
    unchanged when riding bytes dominate)."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _wav_pitch_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")
    n_planted = -(-n_base // dup_every)
    n_clips = n_base + n_planted

    class PitchSignature:
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "clip_id": [], "env": [], "prof": []}
            for cid, data in zip(batch["clip_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                pcm, _sr = codec.audio_decode(data)
                env, prof = _audio_pitch_feats(pcm.astype(np.float64))
                anchors = _audio_anchors(env)
                words = _audio_env_words(env, anchors)
                env_b = np.round(env * 1000).astype(np.int16).tobytes()
                prof_b = np.round(prof * 10000).astype(np.uint16) \
                    .tobytes()
                for wrd in np.unique(words):
                    for half in range(2):
                        bits = int((int(wrd) >> (16 * half)) & 0xFFFF)
                        out["bkey"].append((half << 16) | bits)
                        out["clip_id"].append(cid)
                        out["env"].append(env_b)
                        out["prof"].append(prof_b)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "env": pa.array(out["env"], pa.binary()),
                "prof": pa.array(out["prof"], pa.binary()),
            })

    bands = ds.map_batches(PitchSignature, batch_size=16,
                           concurrency=2, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ids_a, li, ri = _bucket_pairs(df, "clip_id", dedupe=True)
        renv = df["env"].to_numpy()
        rprof = df["prof"].to_numpy()
        memo: dict = {}

        def clip(k):
            got = memo.get(ids_a[k])
            if got is None:
                got = memo[ids_a[k]] = (
                    np.frombuffer(renv[k], np.int16)
                    .astype(np.float64) / 1000,
                    np.frombuffer(rprof[k], np.uint16)
                    .astype(np.float64).reshape(-1, _APS_NB) / 10000)
            return got

        ok = np.zeros(len(li), bool)
        for k in range(len(li)):
            a_, b_ = ((li[k], ri[k]) if ids_a[li[k]] < ids_a[ri[k]]
                      else (ri[k], li[k]))
            ea, pa_ = clip(a_)
            eb_, pb_ = clip(b_)
            ec, sc = _audio_pitch_verify(ea, pa_, eb_, pb_)
            ok[k] = (int(round(ec * 1000)) >= env_min_milli
                     and int(round(sc * 1000)) >= spec_min_milli)
        return _emit_pairs(ids_a, li, ri, ok)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    n_cand = len(pairs)
    pairs = pairs.drop_duplicates(["l", "r"])
    truth = {(f"pit{i:05d}", f"pit{i:05d}_p")
             for i in range(0, n_base, dup_every)}
    got = set(zip(pairs["l"], pairs["r"]))
    return _pair_report("n_clips", n_clips, n_planted, n_cand, got, truth)


# ---------------------------------------------------------------------------
# Omni video dedup: the production composition of the video channels —
# one DC-only decode pass per video, one unified band exchange, per-
# channel verify dispatch (the omni_image_dedup pattern one modality
# over).

_OMNIV_SL, _OMNIV_LB, _OMNIV_AN = 1, 2, 3
_OMNIV_KINDS = ["re", "mr", "lb", "of", "ts"]


def _orbit_slot_good(ta: np.ndarray, tb_: np.ndarray,
                     psnr_min_centi: int) -> int:
    """max over the Klein-4 group elements (applied GLOBALLY to reel
    b) of the count of slots clearing the PSNR gate — the mirror
    channel's verify kernel (global orientation: per-slot mixing is
    disallowed so one coincidentally-symmetric frame cannot merge two
    videos)."""
    best = 0
    for g in (tb_, tb_[:, :, ::-1], tb_[:, ::-1, :], tb_[:, ::-1, ::-1]):
        a = ta.astype(np.float64)
        b = g.astype(np.float64)
        mse = ((a - b) ** 2).mean(axis=(1, 2))
        ps = np.where(mse <= 0, 99.0,
                      10.0 * np.log10(255.0 * 255.0
                                      / np.maximum(mse, 1e-12)))
        best = max(best, int((ps * 100 >= psnr_min_centi).sum()))
    return best


def _avi_omni_corpus_dir(n_base: int = 30, dup_every: int = 3,
                         frames_per_video: int = 24) -> str:
    """MJPEG-AVI mixed fixture: multi-shot base videos (the proven
    motion model, seed 43) with ONE planted dup per transform class,
    kinds cycling re (q70 transcode) / mr (every frame mirrored) /
    lb (uniform bars) / of (head trim 3-7) / ts (speed rho 0.75-1.3 +
    trim 2-4) — certifying the channels COMPOSE, which no per-channel
    fixture can show."""
    from .. import avi as avi_mod
    from .. import corpus as corpus_mod
    from .. import jpeg as jpeg_mod

    out = (f"/tmp/destor_ray_avi_omni/"
           f"v1_n{n_base}_d{dup_every}_f{frames_per_video}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_base):
        n_shots = 2 + (i + i // 3) % 3
        cuts = [(s * frames_per_video) // n_shots
                for s in range(1, n_shots)]
        bounds = [0] + cuts + [frames_per_video]
        frames_px = []
        w = h = None
        for s in range(n_shots):
            px, w0, h0, _, _ = corpus_mod._base_pixels(
                seed=43, row=500 + i * 16 + s * 4)
            if w is None:
                w, h = w0, h0
            else:
                px = px[:h, :w]
                if px.shape[:2] != (h, w):
                    px = np.pad(px, ((0, h - px.shape[0]),
                                     (0, w - px.shape[1]), (0, 0)),
                                mode="edge")
            for j in range(bounds[s], bounds[s + 1]):
                fr = np.roll(px, shift=(j - bounds[s]), axis=1) \
                    .astype(np.int16)
                frames_px.append(np.clip(fr + 2 * (j - bounds[s]),
                                         0, 255).astype(np.uint8))
        ids.append(f"omv{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(
            [jpeg_mod.encode(f, quality=85) for f in frames_px],
            w=w, h=h, fps=10))
        if i % dup_every != 0:
            continue
        kind = _OMNIV_KINDS[(i // dup_every) % len(_OMNIV_KINDS)]
        dw, dh = w, h
        if kind == "re":
            dup_px = frames_px
        elif kind == "mr":
            dup_px = [np.ascontiguousarray(f[:, ::-1, :])
                      for f in frames_px]
        elif kind == "lb":
            tb, lr = ((12 + (i % 3) * 5, 0) if (i // dup_every) % 2 == 0
                      else (0, 20 + (i % 3) * 6))
            dup_px = []
            for fr in frames_px:
                canvas = np.full((h + 2 * tb, w + 2 * lr, 3), 18,
                                 np.uint8)
                canvas[tb:tb + h, lr:lr + w] = fr
                dup_px.append(canvas)
            dw, dh = w + 2 * lr, h + 2 * tb
        elif kind == "of":
            dup_px = frames_px[3 + (i // dup_every) % 5:]
        else:  # ts
            rho = 0.75 if (i // dup_every) % 2 == 0 else 1.3
            k = 2 + (i // 4) % 3
            m = int(len(frames_px) / rho)
            idx = np.minimum(np.round(np.arange(m) * rho).astype(int),
                             len(frames_px) - 1)
            dup_px = [frames_px[t] for t in idx[k:]]
        ids.append(f"omv{i:05d}_{kind}")
        blobs.append(avi_mod.encode_mjpeg(
            [jpeg_mod.encode(f, quality=70) for f in dup_px],
            w=dw, h=dh, fps=10))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def omni_video_dedup(sf_dir: str, n_base: int = 30, dup_every: int = 3,
                     k_frames: int = 8):
    """(kind, n_planted, n_found, n_false, recall_ppm) per transform
    class + a "_total" row — the PRODUCTION COMPOSITION of the video
    near-dup channels: at 100 TB you cannot afford one container walk
    + DC decode pass per invariance class, so this pipeline walks each
    video ONCE, computes every channel's signature from the same
    DC-thumb reel, and ships all of them through ONE unified band
    exchange (channel << 24 | slot << 8 | bits); each band row carries
    only ITS channel's verify payload and the bucket verifier
    dispatches to the channel's measured kernel at its standalone
    gate:

    * SL (orbit slot family, orientation NOT in the key): k
      fraction-positioned slot thumbs, dual phash+aHash bands emitted
      for the Klein-4 subset {id, fliplr, flipud} (difference set =
      whole group — mirror_video_dedup's economy); verify = global-
      orientation per-slot PSNR, >=6 of 8 slots at 30 dB. Covers
      transcode (re) at identity + mirror/rot180 (mr).
    * LB (trimmed slot family): the k slot frames FULLY decoded (the
      only full decodes — bounded at k per video) and uniform-border
      trimmed before hashing; verify = mean trimmed-thumb PSNR over a
      {0,1} inset sweep at 30 dB. Covers letterbox/pillarbox (lb).
    * AN (cut-anchor family): shot-cut keyframe dual bands; the cut
      list + frame count + full reel ride the rows; verify tries the
      offset channel first (aligned overlap PSNR at the proposed
      dt +-1, >=30 dB, >=10 frames) then the timescale channel
      (_video_scale_proposals cut x cut / cut x end hypotheses,
      frame-level LS refine, warped PSNR >=35 dB). Covers head-trim
      (of), speed-change (ts), and re.

    Verified edges union into one pair set; recall is accounted PER
    PLANTED CLASS, false merges globally — certifying the channels
    COMPOSE (shared walk, shared exchange, no cross-channel false
    amplification), which the per-channel fixtures cannot.

    Scale shape: one DC-only decode pass (k full decodes for the LB
    family only), one band exchange (~176 slot-family rows + 16/cut
    anchor rows per video; anchor rows carry the n x 256 B reel —
    pair-rendezvous applies when reels dominate), one pair groupby.
    Single-shot videos emit no anchor rows and keep slot coverage —
    the standalone channels' documented applicability."""
    from .. import avi as avi_mod
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _avi_omni_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")
    n_planted = -(-n_base // dup_every)

    class OmniVideoSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "video_id": [], "at": [], "payload": []}

            def emit(chan, slot, bits, vid, at, payload):
                out["bkey"].append((chan << 24) | (slot << 8) | bits)
                out["video_id"].append(vid)
                out["at"].append(at)
                out["payload"].append(payload)

            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = avi_mod.decode_frames(data)
                nf = len(frames)
                k = min(k_frames, nf)
                dcs = [jpeg.decode_dc_luma(f) for f in frames]
                t16 = np.stack([codec.resize_nn(g, 16, 16)
                                for g in dcs]).astype(np.uint8)

                # SL: orbit slot family from the DC reel
                slots = [(j * nf) // k for j in range(k)]
                g32 = np.stack([codec.resize_nn(dcs[s], 32, 32)
                                for s in slots])
                sl_payload = t16[slots].tobytes()
                keys = set()
                for orient in (g32, g32[:, :, ::-1], g32[:, ::-1, :]):
                    ph = codec.phash64_batch(
                        np.ascontiguousarray(orient)).view(np.uint64)
                    ah = codec.ahash64_batch(
                        np.ascontiguousarray(orient)).view(np.uint64)
                    for ch, hv in enumerate((ph, ah)):
                        for fi in range(k):
                            for band in range(8):
                                bits = int((hv[fi]
                                            >> np.uint64(8 * band))
                                           & np.uint64(0xFF))
                                keys.add((ch * k_frames + fi) * 8
                                         + band << 8 | bits)
                for kk in sorted(keys):
                    emit(_OMNIV_SL, kk >> 8, kk & 0xFF, vid, 0,
                         sl_payload)

                # LB: trimmed slot family (the only full decodes)
                gt32s, lb_tb = [], b""
                for s in slots:
                    fr = jpeg.decode(frames[s])
                    luma = (0.299 * fr[:, :, 0] + 0.587 * fr[:, :, 1]
                            + 0.114 * fr[:, :, 2]).astype(np.uint8)
                    luma = codec.trim_uniform_border(luma)
                    gt32s.append(codec.resize_nn(luma, 32, 32))
                    lb_tb += codec.resize_nn(luma, 16, 16).tobytes()
                stack = np.stack(gt32s)
                ph = codec.phash64_batch(stack).view(np.uint64)
                ah = codec.ahash64_batch(stack).view(np.uint64)
                keys = set()
                for ch, hv in enumerate((ph, ah)):
                    for fi in range(k):
                        for band in range(8):
                            bits = int((hv[fi] >> np.uint64(8 * band))
                                       & np.uint64(0xFF))
                            keys.add((ch * k_frames + fi) * 8
                                     + band << 8 | bits)
                for kk in sorted(keys):
                    emit(_OMNIV_LB, kk >> 8, kk & 0xFF, vid, 0, lb_tb)

                # AN: cut-anchor family (cuts + reel ride the rows)
                cuts = _video_cuts(t16)
                if cuts:
                    reel = t16.tobytes()
                    cuts_b = np.asarray(cuts, np.int16).tobytes()
                    an_payload = (len(cuts_b)).to_bytes(4, "little") \
                        + cuts_b + reel
                    cg32 = np.stack([codec.resize_nn(dcs[c], 32, 32)
                                     for c in cuts])
                    cph = codec.phash64_batch(cg32).view(np.uint64)
                    cah = codec.ahash64_batch(cg32).view(np.uint64)
                    for ki, c in enumerate(cuts):
                        for ch, hv in enumerate((cph[ki], cah[ki])):
                            for band in range(8):
                                bits = int((hv >> np.uint64(8 * band))
                                           & np.uint64(0xFF))
                                emit(_OMNIV_AN, ch * 8 + band, bits,
                                     vid, int(c), an_payload)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "video_id": pa.array(out["video_id"], pa.string()),
                "at": pa.array(out["at"], pa.int32()),
                "payload": pa.array(out["payload"], pa.binary()),
            })

    bands = ds.map_batches(OmniVideoSignature, batch_size=8,
                           concurrency=2, batch_format="pyarrow")

    def _an_unpack(raw: bytes):
        ncb = int.from_bytes(raw[:4], "little")
        cuts = np.frombuffer(raw[4:4 + ncb], np.int16).astype(int) \
            .tolist()
        reel = np.frombuffer(raw[4 + ncb:], np.uint8).reshape(-1, 16, 16)
        return cuts, reel

    def _aligned_psnr(ra, rb, dt, min_overlap=10):
        best = -1.0
        ta_, tb_ = len(ra), len(rb)
        for dd in (dt - 1, dt, dt + 1):
            a0, a1 = max(0, dd), min(ta_, dd + tb_)
            if a1 - a0 < min_overlap:
                continue
            a = ra[a0:a1].astype(np.float64)
            b = rb[a0 - dd:a1 - dd].astype(np.float64)
            mse = ((a - b) ** 2).mean(axis=(1, 2))
            ps = np.where(mse <= 0, 99.0,
                          np.minimum(10.0 * np.log10(
                              255.0 * 255.0 / np.maximum(mse, 1e-12)),
                              99.0))
            best = max(best, float(ps.mean()))
        return best

    def _inset_mean_psnr(ta_, tb_):
        best = -1.0
        for ins in (0, 1):
            a = ta_[:, ins:16 - ins, ins:16 - ins].astype(np.float64)
            b = tb_[:, ins:16 - ins, ins:16 - ins].astype(np.float64)
            mse = ((a - b) ** 2).mean(axis=(1, 2))
            ps = np.where(mse <= 0, 99.0,
                          np.minimum(10.0 * np.log10(
                              255.0 * 255.0 / np.maximum(mse, 1e-12)),
                              99.0))
            best = max(best, float(ps.mean()))
        return best

    def verify_bucket(df) -> pa.Table:
        ls, rs, chs = [], [], []
        seen = set()
        for bkey, g in df.groupby("bkey", sort=False):
            ids_ = g["video_id"].tolist()
            if len(ids_) < 2:
                continue
            chan = int(bkey) >> 24
            ats = g["at"].to_numpy()
            raw = list(g["payload"])
            for i in range(len(ids_)):
                for j in range(i + 1, len(ids_)):
                    if ids_[i] == ids_[j]:
                        continue
                    pair = tuple(sorted((ids_[i], ids_[j])))
                    ok = False
                    if chan == _OMNIV_SL:
                        if (chan, pair) in seen:
                            continue
                        seen.add((chan, pair))
                        ta_ = np.frombuffer(raw[i], np.uint8) \
                            .reshape(-1, 16, 16)
                        tb_ = np.frombuffer(raw[j], np.uint8) \
                            .reshape(-1, 16, 16)
                        kk = min(len(ta_), len(tb_))
                        ok = _orbit_slot_good(
                            ta_[:kk], tb_[:kk], 3000) >= min(6, kk)
                    elif chan == _OMNIV_LB:
                        if (chan, pair) in seen:
                            continue
                        seen.add((chan, pair))
                        ta_ = np.frombuffer(raw[i], np.uint8) \
                            .reshape(-1, 16, 16)
                        tb_ = np.frombuffer(raw[j], np.uint8) \
                            .reshape(-1, 16, 16)
                        kk = min(len(ta_), len(tb_))
                        ok = _inset_mean_psnr(ta_[:kk], tb_[:kk]) >= 30.0
                    else:  # _OMNIV_AN
                        a_, b_ = (i, j) if ids_[i] < ids_[j] else (j, i)
                        dt = int(ats[a_]) - int(ats[b_])
                        ca, ra = _an_unpack(raw[a_])
                        cb_, rb_ = _an_unpack(raw[b_])
                        if (chan, pair, dt) not in seen:
                            seen.add((chan, pair, dt))
                            ok = _aligned_psnr(ra, rb_, dt) >= 30.0
                        if not ok and (chan, pair, "ts") not in seen:
                            seen.add((chan, pair, "ts"))
                            best = -1.0
                            for r0, d0 in _video_scale_proposals(
                                    ca, len(ra), cb_, len(rb_)):
                                best = max(best, _video_scale_verify(
                                    ra, rb_, r0, d0))
                                if best >= 35.0:
                                    break
                            ok = best >= 35.0
                    if ok:
                        ls.append(pair[0])
                        rs.append(pair[1])
                        chs.append(chan)
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "chan": pa.array(chs, pa.int64())})

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=16).to_pandas()
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _OMNIV_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _OMNIV_KINDS[(i // dup_every) % len(_OMNIV_KINDS)]
        truth_by_kind[kind].add((f"omv{i:05d}", f"omv{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _OMNIV_KINDS)


# ---------------------------------------------------------------------------
# Omni audio dedup: the production composition of the audio channels —
# one decode + ONE FFT pass per clip (sample-rate normalized at
# decode, the samplerate channel's insight applied globally), one
# unified band exchange, per-channel verify dispatch.

_OMNIA_SL, _OMNIA_OF, _OMNIA_TS, _OMNIA_PS = 1, 2, 3, 4
_OMNIA_KINDS = ["re", "of", "ts", "sr", "ps"]


def _audio_omni_feats(pcm: np.ndarray):
    """Every channel's feature set from ONE FFT pass: (env, el16,
    spec4, tracks, prof32, slot_word). el16 is the proven 16-band log
    spectrogram (FRAME 1024 / HOP 128); env is log total frame energy
    (Parseval — the pitch channel's invariant); spec4 the 4-frame-
    block 16-band means (offset verify arm); tracks the 2-coarse-band
    log tracks (timescale verify arm); prof32 the INTEGRATED 32-
    geometric-band normalized power profile per block (pitch verify
    arm); slot_word the Haitsma-Kalker 4-slot delta-sign word (the
    slot channel's candidates)."""
    nf = 1 + (len(pcm) - _AOF_FRAME) // _AOF_HOP
    idx = (np.arange(_AOF_FRAME)[None, :]
           + _AOF_HOP * np.arange(nf)[:, None])
    w = np.hanning(_AOF_FRAME)
    spec = np.abs(np.fft.rfft(pcm[idx] * w, axis=1)) ** 2
    edges16 = np.unique(np.geomspace(
        4, spec.shape[1] - 1, _AOF_NB + 1).astype(int))
    e16 = np.add.reduceat(spec, edges16[:-1], axis=1)[:, :_AOF_NB]
    el16 = np.log(e16 + 1e-12)
    env = np.log(spec.sum(axis=1) + 1e-300)
    nblk = nf // 4
    spec4 = el16[:nblk * 4].reshape(nblk, 4, _AOF_NB).mean(axis=1)
    tracks = np.stack([
        np.log(e16[:, :8].sum(axis=1) + 1e-300),
        np.log(e16[:, 8:].sum(axis=1) + 1e-300)], axis=0)
    b32 = np.add.reduceat(spec, _APS_EDGES[:-1], axis=1)[:, :_APS_NB]
    pw4 = b32[:nblk * 4].reshape(nblk, 4, _APS_NB).mean(axis=1)
    prof = pw4 / np.maximum(pw4.sum(axis=1, keepdims=True), 1e-30)
    prof32 = (np.pad(prof, ((0, 0), (1, 1)), mode="edge")[:, :-2]
              + 2.0 * prof
              + np.pad(prof, ((0, 0), (1, 1)), mode="edge")[:, 2:]) / 4.0
    d_t = np.diff(e16, axis=0)
    bits = (d_t[:, :-1] - d_t[:, 1:]) > 0
    slots = [(j * (len(bits) - 1)) // 3 for j in range(4)]
    word = np.uint64(0)
    nb = bits.shape[1]
    for j, s in enumerate(slots):
        w_ = int(np.packbits(bits[s], bitorder="big")[:2]
                 .view(">u2")[0] >> 1)
        word |= np.uint64(w_ & ((1 << nb) - 1)) << np.uint64(j * nb)
    return env, el16, spec4, tracks, prof32, word


def _wav_omni_corpus_dir(n_base: int = 30, dup_every: int = 3,
                         sr: int = 8000) -> str:
    """WAV mixed fixture: 3 s clips of five >=60-Hz-separated tones
    with independent per-tone AM envelopes (the pitch fixture's
    recipe — the richest of the family, with time-varying spectra as
    real audio has) plus broadband noise; ONE planted dup per class,
    kinds cycling re (0.6x gain re-encode) / of (head trim or silence
    pad, 0.6x) / ts (rho ±7-10% speed, 0.7x) / sr (16k or 11.025k
    conversion, 0.8x) / ps (±2-4 semitone transposition, 0.8x)."""
    from .. import codec

    out = f"/tmp/destor_ray_wav_omni/v1_n{n_base}_d{dup_every}_sr{sr}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    t = np.arange(3 * sr, dtype=np.float64) / sr

    def synth(i, alpha, noise_key):
        rng = np.random.Generator(np.random.Philox(key=6000 + i))
        sig = np.zeros_like(t)
        chosen = []
        for _ in range(5):
            f = rng.uniform(80, 1800)
            while chosen and min(abs(f - c) for c in chosen) < 60.0:
                f = rng.uniform(80, 1800)
            chosen.append(f)
            a = rng.uniform(0.2, 0.5)
            ph = rng.uniform(0, 6.28)
            lv = rng.uniform(0.05, 1.0, 25)
            env_k = np.interp(np.linspace(0, 24, len(t)),
                              np.arange(25), lv)
            sig += a * env_k * np.sin(2 * np.pi * f * alpha * t + ph)
        nrng = np.random.Generator(
            np.random.Philox(key=7000 + i * 7 + noise_key))
        sig += 0.05 * nrng.normal(0, 1, len(t))
        return sig / 3.0

    for i in range(n_base):
        base = synth(i, 1.0, 0)
        ids.append(f"oma{i:05d}")
        blobs.append(codec.wav_encode(base.astype(np.float32), sr))
        if i % dup_every != 0:
            continue
        kind = _OMNIA_KINDS[(i // dup_every) % len(_OMNIA_KINDS)]
        out_sr = sr
        if kind == "re":
            dup = 0.6 * base
        elif kind == "of":
            shift = int((0.2 + 0.1 * ((i // dup_every) % 4)) * sr)
            dup = 0.6 * (np.concatenate([np.zeros(shift), base])
                         if (i // dup_every) % 2 == 0
                         else base[shift:])
        elif kind == "ts":
            rho = 0.93 if (i // dup_every) % 2 == 0 else 1.07
            m = int(len(base) / rho)
            dup = 0.7 * np.interp(np.arange(m) * rho,
                                  np.arange(len(base)), base)
        elif kind == "sr":
            out_sr = 16000 if (i // dup_every) % 2 == 0 else 11025
            n_out = int(len(base) * out_sr / sr)
            dup = 0.8 * np.interp(np.arange(n_out) * sr / out_sr,
                                  np.arange(len(base)), base)
        else:  # ps
            alpha = [0.85, 1.26][(i // dup_every) % 2]
            dup = 0.8 * synth(i, alpha, 1)
        d2 = np.random.Generator(np.random.Philox(key=8000 + i)) \
            .normal(0, 1e-4, len(dup))
        ids.append(f"oma{i:05d}_{kind}")
        blobs.append(codec.wav_encode(
            (dup + d2).astype(np.float32), out_sr))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def omni_audio_dedup(sf_dir: str, n_base: int = 30, dup_every: int = 3,
                     canonical_sr: int = 8000):
    """(kind, n_planted, n_found, n_false, recall_ppm) per transform
    class + a "_total" row — the PRODUCTION COMPOSITION of the audio
    near-dup channels: each clip is decoded ONCE, sample-rate
    NORMALIZED once (linear resample to the canonical rate — the
    samplerate channel's normalization applied globally, so the sr
    class disappears by construction and every downstream feature is
    rate-invariant), FFT'd once, and every channel's signature comes
    from that one spectrogram (_audio_omni_feats); all families ship
    through ONE unified band exchange (channel << 24 | key), each row
    carrying only its channel's verify payload:

    * SL (Haitsma-Kalker 4-slot delta-sign words, 8x8-bit bands):
      mean-profile corr >= 0.99 — covers plain re-encode/gain (re)
      and, post-normalization, rate conversions (sr);
    * OF (32-bit spectral-shape words at content-defined anchors, two
      16-bit halves): _audio_offset_verify dual arm at the proposed
      dt >= 0.95 — covers head trim / silence pad (of) and sr at
      dt 0;
    * TS (sliding-byte spectral keys, anchor lists riding):
      _audio_scale_propose (rho, d) RANSAC + _audio_scale_verify dual
      gate (env >= 0.97, tracks >= 0.82) — covers speed changes (ts);
    * PS (envelope-shape words — Parseval-invariant): dual env ZNCC
      >= 0.95 AND shift-swept integrated-profile ZNCC >= 0.85 —
      covers transposition (ps).

    Verified edges union into one pair set; recall is accounted PER
    PLANTED CLASS, false merges globally — certifying the channels
    COMPOSE (shared decode, shared FFT, shared exchange, no
    cross-channel false amplification), which the per-channel
    fixtures cannot show.

    Scale shape: one decode+FFT pass, one band exchange (~8 SL rows +
    ~2/anchor OF+PS rows + ~25 TS rows per clip; payloads 64 B-2.9 KB
    per family; pair-rendezvous applies when riding bytes dominate),
    one pair groupby. PCM never shuffles."""
    from .. import codec
    from ..stages.grouped import bucketed_group_map

    d = _wav_omni_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")
    n_planted = -(-n_base // dup_every)

    class OmniAudioSignature:
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"bkey": [], "clip_id": [], "at": [], "payload": []}

            def emit(chan, key, cid, at, payload):
                out["bkey"].append((chan << 24) | int(key))
                out["clip_id"].append(cid)
                out["at"].append(int(at))
                out["payload"].append(payload)

            for cid, data in zip(batch["clip_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                pcm, sr = codec.audio_decode(data)
                pcm = pcm.astype(np.float64)
                if sr != canonical_sr:
                    n_out = int(len(pcm) * canonical_sr / sr)
                    pcm = np.interp(np.arange(n_out) * sr / canonical_sr,
                                    np.arange(len(pcm)), pcm)
                env, el16, spec4, tracks, prof32, word = \
                    _audio_omni_feats(pcm)
                anchors = _audio_anchors(env, r=_ASC_R)

                env_b = np.round(env * 1000).astype(np.int16).tobytes()
                spec_b = np.round(spec4 * 1000).astype(np.int16) \
                    .tobytes()
                tr_b = np.round(tracks * 1000).astype(np.int16) \
                    .tobytes()
                anc_b = anchors.astype(np.int16).tobytes()
                prof32_b = np.round(prof32 * 10000).astype(np.uint16) \
                    .tobytes()

                # SL: 8x8-bit bands of the HK word. Verify payload is
                # the OFFSET channel's (env + block spec) — the mean-
                # profile-only verify was MEASURED false-merging two
                # distinct 5-tone clips at 0.9956 (and the samplerate
                # session already measured it failing on sr-true pairs
                # at 0.9900): the dual arm at dt 0 is the proven fix.
                of_payload = (len(env_b)).to_bytes(4, "little") \
                    + env_b + spec_b
                for band in range(8):
                    bits = int((word >> np.uint64(8 * band))
                               & np.uint64(0xFF))
                    emit(_OMNIA_SL, (band << 8) | bits, cid, 0,
                         of_payload)

                # OF: anchor spectral words, two 16-bit halves
                for t_, wrd in zip(anchors,
                                   _audio_words(el16, anchors)):
                    for half in range(2):
                        bits = int((int(wrd) >> (16 * half)) & 0xFFFF)
                        emit(_OMNIA_OF, (half << 16) | bits, cid,
                             int(t_), of_payload)

                # TS: sliding-byte spectral keys, anchor list rides
                ts_keys = {k for ks in _audio_scale_keys(el16, anchors)
                           for k in ks}
                ts_payload = (len(anc_b)).to_bytes(4, "little") \
                    + anc_b + env_b + tr_b
                for k in sorted(ts_keys):
                    emit(_OMNIA_TS, k, cid, 0, ts_payload)

                # PS: envelope-shape words, two 16-bit halves
                ps_payload = (len(env_b)).to_bytes(4, "little") \
                    + env_b + prof32_b
                for wrd in np.unique(_audio_env_words(env, anchors)):
                    for half in range(2):
                        bits = int((int(wrd) >> (16 * half)) & 0xFFFF)
                        emit(_OMNIA_PS, (half << 16) | bits, cid, 0,
                             ps_payload)
            return pa.table({
                "bkey": pa.array(out["bkey"], pa.int64()),
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "at": pa.array(out["at"], pa.int32()),
                "payload": pa.array(out["payload"], pa.binary()),
            })

    bands = ds.map_batches(OmniAudioSignature, batch_size=16,
                           concurrency=2, batch_format="pyarrow")

    def _of_unpack_payload(r):
        ne = int.from_bytes(r[:4], "little")
        env_ = np.frombuffer(r[4:4 + ne], np.int16) \
            .astype(np.float64) / 1000
        sp = np.frombuffer(r[4 + ne:], np.int16) \
            .astype(np.float64) / 1000
        return env_, sp.reshape(-1, _AOF_NB)

    def verify_bucket(df) -> pa.Table:
        ls, rs, chs = [], [], []
        seen = set()
        for bkey, g in df.groupby("bkey", sort=False):
            ids_ = g["clip_id"].tolist()
            if len(ids_) < 2:
                continue
            chan = int(bkey) >> 24
            ats = g["at"].to_numpy()
            raw = list(g["payload"])
            for i in range(len(ids_)):
                for j in range(i + 1, len(ids_)):
                    if ids_[i] == ids_[j]:
                        continue
                    pair = tuple(sorted((ids_[i], ids_[j])))
                    ok = False
                    if chan == _OMNIA_SL:
                        if (chan, pair) in seen:
                            continue
                        seen.add((chan, pair))
                        ea, sa = _of_unpack_payload(raw[i])
                        eb, sb = _of_unpack_payload(raw[j])
                        ok = _audio_offset_verify(ea, sa, eb, sb,
                                                  0) >= 0.95
                    elif chan == _OMNIA_OF:
                        a_, b_ = (i, j) if ids_[i] < ids_[j] else (j, i)
                        dt = int(ats[a_]) - int(ats[b_])
                        if (chan, pair, dt) in seen:
                            continue
                        seen.add((chan, pair, dt))
                        ea, sa = _of_unpack_payload(raw[a_])
                        eb, sb = _of_unpack_payload(raw[b_])
                        c = _audio_offset_verify(ea, sa, eb, sb, dt)
                        ok = c >= 0.95
                    elif chan == _OMNIA_TS:
                        if (chan, pair) in seen:
                            continue
                        seen.add((chan, pair))
                        def _ts_unpack(r):
                            ncb = int.from_bytes(r[:4], "little")
                            anc = np.frombuffer(r[4:4 + ncb], np.int16) \
                                .astype(np.float64)
                            rest = np.frombuffer(r[4 + ncb:], np.int16) \
                                .astype(np.float64) / 1000
                            e = len(rest) // 3
                            return (anc, rest[:e],
                                    rest[e:].reshape(2, -1))
                        aa, ea, ta_ = _ts_unpack(raw[i])
                        ab_, eb, tb_ = _ts_unpack(raw[j])
                        if ids_[i] > ids_[j]:
                            aa, ea, ta_, ab_, eb, tb_ = \
                                ab_, eb, tb_, aa, ea, ta_
                        scr = []
                        for _n, r, dd in _audio_scale_propose(aa, ab_):
                            ec, _tc = _audio_scale_verify(
                                ea, ta_, eb, tb_, r, dd, coarse=True)
                            scr.append((ec, r, dd))
                        scr.sort(key=lambda s: -s[0])
                        bj = -np.inf
                        best = (-1.0, -1.0)
                        for rank, (ec, r, dd) in enumerate(scr):
                            if rank > 0 and ec < 0.6:
                                break
                            e_, t_ = _audio_scale_verify(
                                ea, ta_, eb, tb_, r, dd)
                            j2 = min((e_ - _ASC_ENV_MIN) / 0.03,
                                     (t_ - _ASC_TRACK_MIN) / 0.18)
                            if j2 > bj:
                                bj = j2
                                best = (e_, t_)
                            if bj >= 0:
                                break
                        ok = (best[0] >= _ASC_ENV_MIN
                              and best[1] >= _ASC_TRACK_MIN)
                    else:  # _OMNIA_PS
                        if (chan, pair) in seen:
                            continue
                        seen.add((chan, pair))
                        def _ps_unpack(r):
                            ne = int.from_bytes(r[:4], "little")
                            env_ = np.frombuffer(r[4:4 + ne], np.int16) \
                                .astype(np.float64) / 1000
                            prof_ = np.frombuffer(r[4 + ne:], np.uint16) \
                                .astype(np.float64) \
                                .reshape(-1, _APS_NB) / 10000
                            return env_, prof_
                        ea, pa2 = _ps_unpack(raw[i])
                        eb, pb2 = _ps_unpack(raw[j])
                        ec, sc = _audio_pitch_verify(ea, pa2, eb, pb2)
                        ok = ec >= 0.95 and sc >= 0.85
                    if ok:
                        ls.append(pair[0])
                        rs.append(pair[1])
                        chs.append(chan)
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "chan": pa.array(chs, pa.int64())})

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=16).to_pandas()
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _OMNIA_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _OMNIA_KINDS[(i // dup_every) % len(_OMNIA_KINDS)]
        truth_by_kind[kind].add((f"oma{i:05d}", f"oma{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _OMNIA_KINDS)


# ---------------------------------------------------------------------------
# Cross-modal (audio-track) video dedup: MJPEG AVI files with a real
# interleaved PCM audio stream. The re-post classes split cleanly by
# modality — same audio under NEW visuals (slideshow / lyric-video
# re-upload) is invisible to every DC-thumb video channel, and a
# re-dub (same video, new music bed) is invisible to every audio
# channel — so the production pipeline walks each container ONCE and
# runs BOTH families through one unified exchange.

_AVAT_VS, _AVAT_AT = 0, 1        # family ids in the unified key space
_AVAT_KINDS = ("re", "at", "vt")


def _avi_at_corpus_dir(n_base: int = 30, dup_every: int = 3,
                       n_frames: int = 16, fps: int = 8,
                       sr: int = 8000) -> str:
    """AVI+audio mixed fixture: each base video is n_frames of the
    rolling-brightness frame walk over a seed-23 base image plus a 2 s
    five-tone >=60-Hz-separated per-tone-AM audio track (the proven
    audio-fixture recipe). ONE planted dup per class, kinds cycling:

      re — the standard re-upload: every frame re-encoded at q70 AND
           the same audio at 0.7x gain with fresh dither;
      at — audio-track dup: the SAME audio (0.7x gain, fresh dither)
           under COMPLETELY DIFFERENT visuals (seed-29 base image —
           the slideshow / lyric-video re-post);
      vt — re-dub: the same video re-encoded at q70 under a
           DIFFERENT five-tone track (fresh Philox key).
    """
    from .. import avi as avi_mod
    from .. import corpus as corpus_mod
    from .. import jpeg as jpeg_mod

    out = (f"/tmp/destor_ray_avi_at/"
           f"v1_n{n_base}_d{dup_every}_f{n_frames}_r{fps}_s{sr}")
    if os.path.isdir(out):
        return out
    t = np.arange(2 * sr, dtype=np.float64) / sr

    def synth(key: int) -> np.ndarray:
        rng = np.random.Generator(np.random.Philox(key=key))
        sig = np.zeros_like(t)
        chosen: list[float] = []
        for _ in range(5):
            f = rng.uniform(80, 1800)
            while chosen and min(abs(f - c) for c in chosen) < 60.0:
                f = rng.uniform(80, 1800)
            chosen.append(f)
            a = rng.uniform(0.2, 0.5)
            ph = rng.uniform(0, 6.28)
            lv = rng.uniform(0.2, 1.0, 9)
            env = np.interp(np.linspace(0, 8, len(t)), np.arange(9), lv)
            sig += a * env * np.sin(2 * np.pi * f * t + ph)
        sig += 0.05 * rng.normal(0, 1, len(t))
        return sig / 4.0

    def to_i16(sig, gain, dither_key):
        rng = np.random.Generator(np.random.Philox(key=dither_key))
        x = gain * sig + rng.normal(0, 1e-4, len(sig))
        return np.round(np.clip(x, -1, 1) * 32000).astype(np.int16)

    def make_frames(seed: int, row: int, quality: int) -> list[bytes]:
        px, w, h, _, _ = corpus_mod._base_pixels(seed=seed, row=row)
        frames = []
        for j in range(n_frames):
            fr = np.roll(px, shift=3 * j, axis=1).astype(np.int16)
            fr = np.clip(fr + 4 * j, 0, 255).astype(np.uint8)
            frames.append(jpeg_mod.encode(fr, quality=quality))
        return frames, w, h

    ids, blobs = [], []
    for i in range(n_base):
        frames, w, h = make_frames(23, i, 85)
        sig = synth(8000 + i)
        ids.append(f"av{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(
            frames, w=w, h=h, fps=fps,
            audio=to_i16(sig, 1.0, 100 + i), audio_rate=sr))
        if i % dup_every == 0:
            k = i // dup_every
            kind = _AVAT_KINDS[k % len(_AVAT_KINDS)]
            if kind == "re":
                dfr = [jpeg_mod.encode(jpeg_mod.decode(f), quality=70)
                       for f in frames]
                dau = to_i16(sig, 0.7, 500 + i)
            elif kind == "at":
                dfr, w, h = make_frames(29, i, 85)
                dau = to_i16(sig, 0.7, 500 + i)
            else:  # vt
                dfr = [jpeg_mod.encode(jpeg_mod.decode(f), quality=70)
                       for f in frames]
                dau = to_i16(synth(9000 + i), 1.0, 500 + i)
            ids.append(f"av{i:05d}_{kind}")
            blobs.append(avi_mod.encode_mjpeg(
                dfr, w=w, h=h, fps=fps, audio=dau, audio_rate=sr))
    import pyarrow.parquet as pq_
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def audiotrack_video_dedup(sf_dir: str, n_base: int = 30,
                           dup_every: int = 3, k_frames: int = 4,
                           canonical_sr: int = 8000):
    """(kind, n_planted, n_found, n_false, recall_ppm, n_video,
    n_audio) per planted class + "_total" — CROSS-MODAL video dedup
    over MJPEG AVI files carrying a real interleaved PCM audio
    stream: each container is walked ONCE and BOTH modality families
    ship through ONE unified band exchange (family << 24 | key):

    * VS (video): the proven avi_video_dedup machinery — k sampled
      slot frames DC-decoded (no IDCT), dual phash+aHash 8x8-bit slot
      bands, verify = slot-aligned 16x16 thumb PSNR >= 28 dB on >= 3
      of 4 slots (one coincidentally-similar frame cannot merge two
      videos);
    * AT (audio track): avi.decode_audio -> canonical-rate resample
      -> the omni-audio SL family — Haitsma-Kalker 4-slot delta-sign
      word, 8x8-bit bands, verify = _audio_offset_verify dual arm at
      dt 0 >= 0.95 (the proven configuration; the mean-profile-only
      verify is structurally unsound and not used anywhere).

    The planted classes are the families' exact complements, and the
    output ATTRIBUTES every found pair to its families (n_video /
    n_audio): the at class (same audio, NEW visuals — slideshow /
    lyric-video re-post) must land with n_video == 0 (distinct
    visuals move every slot hash past any band by construction), and
    the vt class (re-dub: same video, new music bed) with
    n_audio == 0 (fresh five-tone tracks collide on no HK band or
    fail the dual arm — the omni-audio fixture's zero-false-merge
    margin); the re class is found by BOTH — the agreement signal a
    production pipeline uses to rank confidence. PCM and full frames
    never shuffle: AT rows ride the ~1.7 KB env+spec verify payload,
    VS rows the k x 256 B thumbs (pair-rendezvous applies at corpus
    scale, NOTES.md lever #1).

    Scale shape: one container walk + k DC decodes + one FFT per
    video; ~2x16x8 VS rows + ~8 AT rows per video; one unified
    exchange; one pair groupby."""
    from .. import avi as avi_mod
    from .. import codec, jpeg
    from ..stages.grouped import bucketed_group_map

    d = _avi_at_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/videos.parquet")
    n_planted = -(-n_base // dup_every)

    N_BANDS, BITS = 8, 8

    class CrossModalSignature:
        def __init__(self):
            codec._dct_matrix(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bkeys, vids, payloads = [], [], []

            def emit(family, key, vid, payload):
                bkeys.append((family << 24) | int(key))
                vids.append(vid)
                payloads.append(payload)

            for vid, data in zip(batch["video_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                frames = avi_mod.decode_frames(data)
                nf = len(frames)
                k = min(k_frames, nf)
                grays, tb = [], b""
                for j in range(k):
                    dc = jpeg.decode_dc_luma(frames[(j * nf) // k])
                    grays.append(codec.resize_nn(dc, 32, 32))
                    tb += codec.resize_nn(dc, 16, 16).tobytes()
                stack = np.stack(grays)
                phs = codec.phash64_batch(stack).view(np.uint64)
                ahs = codec.ahash64_batch(stack).view(np.uint64)
                mask = np.uint64((1 << BITS) - 1)
                for ch, hv in enumerate((phs, ahs)):
                    for fi in range(k):
                        for band in range(N_BANDS):
                            bits = int((hv[fi] >> np.uint64(BITS * band))
                                       & mask)
                            slot = (ch * k_frames + fi) * N_BANDS + band
                            emit(_AVAT_VS, (slot << BITS) | bits,
                                 vid, tb)

                pcm, sr = avi_mod.decode_audio(data)
                pcm = pcm.astype(np.float64) / 32768.0
                if sr != canonical_sr:
                    n_out = int(len(pcm) * canonical_sr / sr)
                    pcm = np.interp(
                        np.arange(n_out) * sr / canonical_sr,
                        np.arange(len(pcm)), pcm)
                env, el16, spec4, _tracks, _prof, word = \
                    _audio_omni_feats(pcm)
                env_b = np.round(env * 1000).astype(np.int16).tobytes()
                spec_b = np.round(spec4 * 1000).astype(np.int16) \
                    .tobytes()
                at_payload = (len(env_b)).to_bytes(4, "little") \
                    + env_b + spec_b
                for band in range(8):
                    bits = int((word >> np.uint64(8 * band))
                               & np.uint64(0xFF))
                    emit(_AVAT_AT, (band << 8) | bits, vid, at_payload)

            return pa.table({
                "bkey": pa.array(bkeys, pa.int64()),
                "video_id": pa.array(vids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            })

    bands = ds.map_batches(CrossModalSignature, batch_size=8,
                           concurrency=2, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ls, rs, fams = [], [], []
        seen = set()
        for bkey, g in df.groupby("bkey", sort=False):
            ids_ = g["video_id"].tolist()
            if len(ids_) < 2:
                continue
            fam = int(bkey) >> 24
            raw = list(g["payload"])
            for i in range(len(ids_)):
                for j in range(i + 1, len(ids_)):
                    if ids_[i] == ids_[j]:
                        continue
                    pair = tuple(sorted((ids_[i], ids_[j])))
                    if (fam, pair) in seen:
                        continue
                    seen.add((fam, pair))
                    if fam == _AVAT_VS:
                        ta = np.frombuffer(raw[i], np.uint8) \
                            .reshape(-1, 16, 16)
                        tb_ = np.frombuffer(raw[j], np.uint8) \
                            .reshape(-1, 16, 16)
                        k = min(len(ta), len(tb_))
                        good = sum(
                            1 for s in range(k)
                            if codec.psnr(ta[s], tb_[s]) >= 28.0)
                        ok = good >= min(3, k)
                    else:
                        def unpack(r):
                            ne = int.from_bytes(r[:4], "little")
                            e = np.frombuffer(r[4:4 + ne], np.int16) \
                                .astype(np.float64) / 1000
                            sp = np.frombuffer(r[4 + ne:], np.int16) \
                                .astype(np.float64) / 1000
                            return e, sp.reshape(-1, _AOF_NB)
                        ea, sa = unpack(raw[i])
                        eb, sb = unpack(raw[j])
                        ok = _audio_offset_verify(ea, sa, eb, sb,
                                                  0) >= 0.95
                    if ok:
                        ls.append(pair[0])
                        rs.append(pair[1])
                        fams.append(fam)
        return pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "fam": pa.array(fams, pa.int64())})

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas() \
        .drop_duplicates(["l", "r", "fam"])
    by_fam = {fam: set(zip(g["l"], g["r"]))
              for fam, g in pairs.groupby("fam")}
    vs_got = by_fam.get(_AVAT_VS, set())
    at_got = by_fam.get(_AVAT_AT, set())
    got = vs_got | at_got

    truth_by_kind = {kind: set() for kind in _AVAT_KINDS}
    for i in range(0, n_base, dup_every):
        k = i // dup_every
        kind = _AVAT_KINDS[k % len(_AVAT_KINDS)]
        truth_by_kind[kind].add((f"av{i:05d}", f"av{i:05d}_{kind}"))
    all_truth = set().union(*truth_by_kind.values())
    n_false = len(got - all_truth)
    fbk = _false_by_kind(got - all_truth, truth_by_kind)

    import pandas as pd
    rows = []
    for kind in _AVAT_KINDS:
        t = truth_by_kind[kind]
        rows.append({"kind": kind, "n_planted": len(t),
                     "n_found": len(got & t), "n_false": fbk[kind],
                     "recall_ppm": len(got & t) * 1_000_000
                     // max(1, len(t)),
                     "n_video": len(vs_got & t),
                     "n_audio": len(at_got & t)})
    rows.append({"kind": "_total", "n_planted": n_planted,
                 "n_found": len(got & all_truth), "n_false": n_false,
                 "recall_ppm": len(got & all_truth) * 1_000_000
                 // n_planted,
                 "n_video": len(vs_got & all_truth),
                 "n_audio": len(at_got & all_truth)})
    out = pd.DataFrame(rows)
    for c in ("n_planted", "n_found", "n_false", "recall_ppm",
              "n_video", "n_audio"):
        out[c] = out[c].astype("int64")
    return out


def webdataset_roundtrip_stats(sf_dir: str, n_rows: int = 512,
                               samples_per_shard: int = 128):
    """(shard, n_samples, img_bytes, txt_bytes) per tar shard plus a
    _total row — the WEBDATASET interchange leg: the flagship
    image+caption corpus exported as POSIX tar shards
    (sources.webdataset.write_webdataset — one file per map task,
    content-hashed names, resumable) and read back with one Ray task
    per shard (read_webdataset). The round trip is exact: pytest pins
    total samples and byte sums against the parquet source. This is
    the layout large public image+caption crawls actually ship —
    shards are sequential reads and the shard list is the partition
    plan (destor's container-as-IO-unit discipline,
    destor/src/containerstore.c, recast for training data)."""
    import glob

    from ray.data.aggregate import Count, Sum

    from .. import corpus as corpus_mod
    from ..sources import webdataset as wds_mod

    cdir = corpus_mod.ensure_corpus_parquet(n_rows, seed=42)
    out = (f"/tmp/destor_ray_wds/v1_n{n_rows}_s{samples_per_shard}_"
           f"{os.path.basename(cdir)}")
    if not os.path.isdir(out):
        # atomic publish: a crashed partial export must never be
        # mistaken for the corpus (the _commit_fixture discipline)
        tmp = f"{out}.tmp.{os.getpid()}"
        ds = ray.data.read_parquet(
            cdir, columns=["image_id", "bytes", "caption"])
        wds_mod.write_webdataset(
            ds, tmp, "image_id", {"bytes": "img", "caption": "txt"},
            samples_per_shard=samples_per_shard)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(out):  # not a lost race: surface it
                raise
    shards = sorted(glob.glob(f"{out}/*.tar"))
    wds = wds_mod.read_webdataset(shards, fields=["img", "txt"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "shard": batch["shard"],
            "img_len": pa.array(
                [len(v) for v in batch["img"].to_pylist()], pa.int64()),
            "txt_len": pa.array(
                [len(v) for v in batch["txt"].to_pylist()], pa.int64()),
        })

    agg = wds.map_batches(narrow, batch_format="pyarrow") \
        .groupby("shard").aggregate(
            Count(alias_name="n_samples"),
            Sum("img_len", alias_name="img_bytes"),
            Sum("txt_len", alias_name="txt_bytes")) \
        .to_pandas().sort_values("shard").reset_index(drop=True)
    for c in ("n_samples", "img_bytes", "txt_bytes"):
        agg[c] = agg[c].astype("int64")
    total = {
        "shard": "_total",
        "n_samples": int(agg["n_samples"].sum()),
        "img_bytes": int(agg["img_bytes"].sum()),
        "txt_bytes": int(agg["txt_bytes"].sum()),
    }
    import pandas as pd
    return pd.concat([agg, pd.DataFrame([total])], ignore_index=True)


def corpus_dedup_from_wds(sf_dir: str, n_rows: int = 2000):
    """(n_rows, n_shards, n_clusters_wds, n_clusters_pq,
    partitions_equal) — INPUT-FORMAT INDEPENDENCE certification: the
    flagship near-dup pipeline runs UNCHANGED over webdataset tar
    shards (read_webdataset → json-sidecar metadata reconstructed to
    the corpus schema) and over the parquet original, and produces
    the IDENTICAL cluster partition (compared as sets of member
    sets — labels are representative-dependent, partitions are not).
    At 100 TB this is the guarantee that a crawl delivered as tar
    shards needs no conversion pass before dedup. Rows-only driver
    check; pytest pins partitions_equal == 1."""
    import glob
    import json as json_mod

    import pandas as pd

    from .. import corpus as corpus_mod
    from ..pipelines.dedup import dedup_pipeline, dedup_pipeline_from_dir
    from ..sources import webdataset as wds_mod

    cdir = corpus_mod.ensure_corpus_parquet(n_rows, seed=42)
    out = f"/tmp/destor_ray_wds_flag/v1_n{n_rows}_{os.path.basename(cdir)}"
    if not os.path.isdir(out):
        tmp = f"{out}.tmp.{os.getpid()}"
        ds = ray.data.read_parquet(cdir)

        def add_json(batch: pa.Table) -> pa.Table:
            metas = [json_mod.dumps(
                {"w": w, "h": h, "fmt": f, "phash": p})
                for w, h, f, p in zip(
                    batch["w"].to_pylist(), batch["h"].to_pylist(),
                    batch["fmt"].to_pylist(),
                    batch["phash"].to_pylist())]
            return batch.append_column(
                "meta", pa.array(metas, pa.string()))

        wds_mod.write_webdataset(
            ds.map_batches(add_json, batch_format="pyarrow"), tmp,
            "image_id",
            {"bytes": "img", "caption": "txt", "meta": "json"},
            samples_per_shard=256)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(out):  # not a lost race: surface it
                raise
    shards = sorted(glob.glob(f"{out}/*.tar"))
    wds = wds_mod.read_webdataset(shards, fields=["img", "txt", "json"])

    def to_corpus(batch: pa.Table) -> pa.Table:
        metas = [json_mod.loads(m.decode())
                 for m in batch["json"].to_pylist()]
        return pa.table({
            "image_id": batch["sample_id"],
            "bytes": batch["img"],
            "w": pa.array([m["w"] for m in metas], pa.int32()),
            "h": pa.array([m["h"] for m in metas], pa.int32()),
            "fmt": pa.array([m["fmt"] for m in metas], pa.string()),
            "caption": pa.array(
                [t.decode() for t in batch["txt"].to_pylist()],
                pa.string()),
            "phash": pa.array([m["phash"] for m in metas], pa.int64()),
        })

    corpus_ds = wds.map_batches(to_corpus, batch_format="pyarrow")
    a_wds = dedup_pipeline(corpus_ds, n_rows_hint=n_rows).to_pandas()
    a_pq = dedup_pipeline_from_dir(cdir).to_pandas()

    def partition(df: pd.DataFrame) -> set:
        return set(frozenset(g) for _, g in
                   df.groupby("cluster_id")["image_id"])

    p_wds, p_pq = partition(a_wds), partition(a_pq)
    return pd.DataFrame({
        "n_rows": [n_rows], "n_shards": [len(shards)],
        "n_clusters_wds": [len(p_wds)], "n_clusters_pq": [len(p_pq)],
        "partitions_equal": [int(p_wds == p_pq)],
    }).astype("int64")


_SNIFF_FMTS = ("png", "jpeg", "gif", "bmp", "pnm", "tiff", "webp", "ico")


def _sniff_fmt(data: bytes) -> str:
    """Container identification from the signature bytes alone — the
    quarantine report needs the fmt even when decode cannot run.
    Delegates to the ONE magic-number table (codec.sniff_format)."""
    from .. import codec as codec_mod
    return codec_mod.sniff_format(data)


def _corrupt_mixed_corpus_dir(n_per_fmt: int = 32,
                              corrupt_every: int = 4) -> str:
    """Eight-container corpus with planted corruption in EVERY codec:
    every `corrupt_every`-th payload of each format is either
    truncated to half (headers survive — the sniffer still attributes
    the format) or, for WebP, its chunk tag is wrecked. Deterministic;
    the quarantine split is exactly pinnable."""
    from .. import bmp as bmp_mod
    from .. import codec as codec_mod
    from .. import corpus as corpus_mod
    from .. import gif as gif_mod
    from .. import jpeg as jpeg_mod
    from .. import netpbm as netpbm_mod
    from .. import tiff as tiff_mod
    from .. import webp as webp_mod

    out = f"/tmp/destor_ray_mixed_bad/v4_n{n_per_fmt}_e{corrupt_every}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    for i in range(n_per_fmt):
        px, _w, _h, _, _ = corpus_mod._base_pixels(seed=13, row=i)
        idx = ((px[:, :, 0] >> 5).astype(np.uint8) << 5
               | (px[:, :, 1] >> 5) << 2 | (px[:, :, 2] >> 6))
        row = {
            "png": codec_mod.png_encode(px),
            "jpeg": jpeg_mod.encode(px, 88),
            "gif": gif_mod.encode(idx, _PAL332),
            "bmp": bmp_mod.encode(px),
            "pnm": netpbm_mod.encode(px),
            "tiff": tiff_mod.encode(px, compression="lzw"),
            "webp": webp_mod.encode(px),
            "ico": __import__("destor_ray.ico", fromlist=["ico"]).encode([px]),
            # lossy VP8 twin (round 4): sniffs as "webp" like the
            # VP8L row, so the report folds both WebP flavors
            "webpv8": webp_mod.encode_lossy(px, qindex=6),
        }
        for fmt in (*_SNIFF_FMTS, "webpv8"):
            blob = row[fmt]
            if i % corrupt_every == 0:
                if fmt == "webp":
                    b = bytearray(blob)
                    b[12:16] = b"XXXX"  # headers survive, chunk walk fails
                    blob = bytes(b)
                elif fmt == "webpv8":
                    blob = blob[:len(blob) // 2]  # first partition cut
                else:
                    blob = blob[:len(blob) // 2]
            ids.append(f"mx{i:05d}_{fmt}")
            blobs.append(blob)
    return _commit_fixture(out, {"images": pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def decode_quarantine_mixed(sf_dir: str, n_per_fmt: int = 32,
                            corrupt_every: int = 4):
    """(fmt, status, n) — the dead-letter discipline ACROSS ALL EIGHT
    codecs: a mixed-container corpus with corruption planted in every
    format flows through the same ImageDecodeQuarantine pool; bad
    rows quarantine per-row with the container still attributed (the
    signature sniff survives truncation), good rows decode — no codec
    can fail the job. Includes the VP8L hardening this query forced:
    a truncated WebP now RAISES instead of fabricating zero bits into
    garbage pixels. Exact pytest pins the per-format split."""
    from ray.data.aggregate import Count

    d = _corrupt_mixed_corpus_dir(n_per_fmt, corrupt_every)
    ds = ray.data.read_parquet(f"{d}/images.parquet")

    def add_fmt(batch: pa.Table) -> pa.Table:
        fmts = [_sniff_fmt(b) for b in batch["bytes"].to_pylist()]
        return batch.append_column("fmt", pa.array(fmts, pa.string()))

    out = ds.map_batches(add_fmt, batch_format="pyarrow") \
        .map_batches(_QuarantineKeepFmt, batch_format="pyarrow",
                     batch_size=64, concurrency=2)
    agg = out.groupby(["fmt", "status"]).aggregate(
        Count(alias_name="n"))
    return agg.map_batches(
        lambda b: pa.table({
            "fmt": b["fmt"], "status": b["status"],
            "n": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow")


class _QuarantineKeepFmt:
    """ImageDecodeQuarantine with the sniffed fmt column riding
    through (the stage's schema is fixed; this wrapper joins fmt back
    without a shuffle — same batch, same order)."""

    def __init__(self):
        from ..stages.multimodal import ImageDecodeQuarantine
        self._inner = ImageDecodeQuarantine()

    def __call__(self, batch: pa.Table) -> pa.Table:
        res = self._inner(batch.drop_columns(["fmt"]))
        return res.append_column("fmt", batch["fmt"])


def corpus_dedup_export_wds(sf_dir: str, n_rows: int = 2000,
                            samples_per_shard: int = 256):
    """(n_rows, n_clusters, n_reps_exported, n_shards,
    rep_bytes_total, readback_equal) — the full PRODUCTION curation
    path in one composition: flagship near-dup clustering → tier
    dedup's keep-best-quality write decision (quality_rep_manifest)
    → the surviving representatives exported as webdataset tar
    shards → read back and certified (sample ids and byte totals
    equal). This is what 'dedup 100 TB and ship the training corpus'
    actually runs; every stage is the already-certified operator, the
    query certifies the COMPOSITION (ids survive three exchanges and
    a container round trip intact). Rows-only driver check; pytest
    pins readback_equal == 1 and rep count == cluster count."""
    import glob

    import pandas as pd

    from .. import corpus as corpus_mod
    from ..pipelines.dedup import (dedup_pipeline_from_dir,
                                   quality_rep_manifest)
    from ..sources import webdataset as wds_mod

    cdir = corpus_mod.ensure_corpus_parquet(n_rows, seed=42)
    assignment = dedup_pipeline_from_dir(cdir)
    manifest = quality_rep_manifest(assignment, cdir).to_pandas()
    n_clusters = len(manifest)
    rep_ids = set(manifest["rep_id"])

    # export ONLY the representatives (broadcast the rep-id set —
    # cluster-count-bounded, the keep-list every curation job ships);
    # the actor builds the Arrow value set ONCE and filters each
    # batch with the vectorized is_in kernel
    import ray as ray_mod
    rep_ref = ray_mod.put(sorted(rep_ids))

    class KeepReps:
        def __init__(self):
            self._vals = pa.array(ray_mod.get(rep_ref), pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch["image_id"], value_set=self._vals))

    out = (f"/tmp/destor_ray_wds_reps/"
           f"v1_n{n_rows}_s{samples_per_shard}")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp.{os.getpid()}"
        ds = ray.data.read_parquet(
            cdir, columns=["image_id", "bytes", "caption"]) \
            .map_batches(KeepReps, batch_format="pyarrow",
                         batch_size=512, concurrency=2)
        wds_mod.write_webdataset(
            ds, tmp, "image_id", {"bytes": "img", "caption": "txt"},
            samples_per_shard=samples_per_shard)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(out):  # not a lost race: surface it
                raise
    shards = sorted(glob.glob(f"{out}/*.tar"))
    wds = wds_mod.read_webdataset(shards, fields=["img"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "sample_id": batch["sample_id"],
            "nbytes": pa.array(
                [len(v) for v in batch["img"].to_pylist()], pa.int64()),
        })

    back = wds.map_batches(narrow, batch_format="pyarrow").to_pandas()
    back_ids = set(back["sample_id"])
    equal = int(back_ids == rep_ids)
    return pd.DataFrame({
        "n_rows": [n_rows], "n_clusters": [n_clusters],
        "n_reps_exported": [len(back_ids)], "n_shards": [len(shards)],
        "rep_bytes_total": [int(back["nbytes"].sum())],
        "readback_equal": [equal],
    }).astype("int64")


# ---------------------------------------------------------------------------
# Lossless audio container-conversion dedup (round 5, VERDICT r4 #3 —
# the audio twin of format_convert_dedup) + mixed-container stats
# ---------------------------------------------------------------------------

_AFC_KINDS = ("flac", "flacbs", "wavf32")


def _wav_f32_bytes(i16: np.ndarray, sr: int) -> bytes:
    """IEEE-float (format 3) WAV of the canonical int16 samples —
    byte-different container, PCM-identical after canonicalization."""
    import struct as _struct
    f = (i16.astype(np.float64) / 32767.0).astype("<f4")
    data = f.tobytes()
    fmt = _struct.pack("<HHIIHH", 3, 1, sr, sr * 4, 4, 32)
    riff = (b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data)
    return b"RIFF" + _struct.pack("<I", len(riff)) + riff


def _audio_fmtconv_corpus_dir(n_base: int = 60, dup_every: int = 3,
                              sr: int = 8000) -> str:
    """Deterministic fixture: Philox multi-tone int16 WAV clips; every
    dup_every-th base plants one lossless container conversion —
    `<id>_flac` (FLAC, default blocksize), `<id>_flacbs` (FLAC at
    blocksize 512: different bytes, same PCM) or `<id>_wavf32`
    (IEEE-float WAV) round-robin — byte-hash-invisible re-hosts whose
    DECODED samples are identical."""
    from .. import codec, flac

    out = f"/tmp/destor_ray_audio_fmtconv/v1_n{n_base}_d{dup_every}_sr{sr}"
    if os.path.isdir(out):
        return out
    ids, blobs = [], []
    t = np.arange(sr, dtype=np.float64) / sr
    for i in range(n_base):
        rng = np.random.Generator(np.random.Philox(key=7100 + i))
        sig = np.zeros_like(t)
        for _ in range(3):
            sig += rng.uniform(0.1, 0.28) * np.sin(
                2 * np.pi * rng.uniform(90, 1900) * t
                + rng.uniform(0, 2 * np.pi))
        i16 = np.round(32767 * sig).astype(np.int32)
        base_id = f"afc{i:05d}"
        ids.append(base_id)
        blobs.append(codec.wav_encode(i16 / 32767.0, sr))
        if i % dup_every == 0:
            kind = _AFC_KINDS[(i // dup_every) % len(_AFC_KINDS)]
            if kind == "flac":
                b = flac.encode(i16, sr)
            elif kind == "flacbs":
                b = flac.encode(i16, sr, blocksize=512)
            else:
                b = _wav_f32_bytes(i16, sr)
            ids.append(f"{base_id}_{kind}")
            blobs.append(b)
    return _commit_fixture(out, {"clips": pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sample_rate": pa.array([sr] * len(ids), pa.int32()),
    })})


def _pcm16_canonical(data: bytes) -> np.ndarray:
    """ONE canonical int16 PCM view across containers: RIFF (16-bit
    int or IEEE float) and FLAC payloads of the same recording yield
    byte-identical arrays — the exact tier the lossless conversion
    channel keys on. round(x*32767) inverts both WAV scalings
    exactly (i/32767 in float32 stays within ±0.004 of i)."""
    from .. import codec, flac

    if len(data) >= 4 and bytes(data[:4]) == b"fLaC":
        pcm, _sr, bps = flac.decode(bytes(data))
        if bps != 16:
            raise ValueError("canonical PCM expects 16-bit streams")
        return pcm.astype(np.int16).reshape(-1)
    ch, _sr = codec.audio_decode_channels(data)
    return np.round(ch.astype(np.float64) * 32767.0) \
        .astype(np.int16).reshape(-1)


def audio_format_convert_dedup(sf_dir: str, n_base: int = 60,
                               dup_every: int = 3):
    """(kind, n_planted, n_found, n_false, recall_ppm) — LOSSLESS
    AUDIO CONTAINER-CONVERSION dedup: the same recording re-hosted as
    FLAC (two blocksizes) or IEEE-float WAV. One decode pass through
    an actor-pool signature stage canonicalizes every container to
    int16 PCM (_pcm16_canonical); the leading 64 bits of the PCM
    SHA-1 band into 8 slices (the pixel-SHA exact tier of
    format_convert_dedup: identical samples collide on EVERY slice),
    one band exchange, and the verify arm compares the full PCM
    SHA-256 riding each band row — exact-equality semantics without
    shuffling PCM. Per-class recall 1.0, zero false merges
    (pytest-pinned). 100 TB shape: identical to the image channel —
    narrow signature rows, 40-byte payloads, bucketed verify."""
    import hashlib

    from ..stages.grouped import bucketed_group_map

    d = _audio_fmtconv_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")

    class AudioConvSignature:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, sha64, ver = [], [], []
            for cid, data in zip(batch["clip_id"].to_pylist(),
                                 batch["bytes"].to_pylist()):
                pcm = _pcm16_canonical(data)
                raw = pcm.astype("<i2").tobytes()
                sha64.append(np.frombuffer(
                    hashlib.sha1(raw).digest()[:8], "<i8")[0])
                ver.append(hashlib.sha256(raw).digest())
                ids.append(cid)
            return pa.table({
                "clip_id": pa.array(ids, pa.string()),
                "pcmsha": pa.array(np.asarray(sha64, np.int64),
                                   pa.int64()),
                "ver": pa.array(ver, pa.binary()),
            })

    sigs = ds.map_batches(AudioConvSignature, batch_size=32,
                          concurrency=2, batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hash_band_rows(batch, "clip_id", ("pcmsha",),
                               ("ver",), 8, 8)

    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def verify_bucket(df) -> pa.Table:
        ids, li, ri = _bucket_pairs(df, "clip_id", dedupe=True)
        if not len(li):
            return pa.table({"l": pa.array([], pa.string()),
                             "r": pa.array([], pa.string())})
        vs = df["ver"].to_numpy()
        ok = np.array([vs[a] == vs[b] for a, b in zip(li, ri)], bool)
        return _emit_pairs(ids, li, ri, ok)

    pairs = bucketed_group_map(bands, "bkey", verify_bucket,
                               num_buckets=8).to_pandas()
    got = set(zip(pairs["l"], pairs["r"]))

    truth_by_kind = {kind: set() for kind in _AFC_KINDS}
    for i in range(0, n_base, dup_every):
        kind = _AFC_KINDS[(i // dup_every) % len(_AFC_KINDS)]
        truth_by_kind[kind].add((f"afc{i:05d}", f"afc{i:05d}_{kind}"))
    return _per_class_report(got, truth_by_kind, _AFC_KINDS)


def audio_container_stats(sf_dir: str, n_base: int = 60,
                          dup_every: int = 3):
    """(container, n_clips, total_samples, rms_milli_mean) — the
    audio_wav_stats family over a MIXED wav+flac corpus: every row
    decodes through the one AudioFeatures dispatch (RIFF -> the numpy
    WAV parser, fLaC -> the round-5 pure-numpy FLAC decoder), proving
    a crawl's audio container mix needs no per-format pipelines.
    Rows-only driver check; pytest pins the per-container counts."""
    from ray.data.aggregate import Count, Sum

    from ..stages.multimodal import AudioFeatures

    d = _audio_fmtconv_corpus_dir(n_base=n_base, dup_every=dup_every)
    ds = ray.data.read_parquet(f"{d}/clips.parquet")

    # ONE fused stage: sniff the container from the payload magic and
    # decode features in the same actor pass — no id→container side
    # table ever forms (a driver dict there would be clip-count-
    # proportional; this stays map-only at any corpus size)
    class SniffedFeatures(AudioFeatures):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            containers = ["flac" if bytes(v[:4]) == b"fLaC" else "wav"
                          for v in batch["bytes"].to_pylist()]
            return out.append_column(
                "container", pa.array(containers, pa.string()))

    feats = ds.map_batches(SniffedFeatures, batch_format="pyarrow",
                           batch_size=32, concurrency=2)

    def narrow(batch: pa.Table) -> pa.Table:
        rms_milli = np.round(
            batch["rms"].to_numpy(zero_copy_only=False) * 1000) \
            .astype(np.int64)
        return pa.table({
            "container": batch["container"],
            "n_samples": batch["n_samples"],
            "rms_milli": pa.array(rms_milli, pa.int64()),
        })

    agg = feats.map_batches(narrow, batch_format="pyarrow") \
        .groupby("container").aggregate(
            Count(alias_name="n_clips"),
            Sum("n_samples", alias_name="total_samples"),
            Sum("rms_milli", alias_name="rms_milli_sum"))
    return agg.map_batches(
        lambda b: pa.table({
            "container": b["container"],
            "n_clips": pc.cast(b["n_clips"], pa.int64()),
            "total_samples": pc.cast(b["total_samples"], pa.int64()),
            "rms_milli_mean": pa.array(
                pc.cast(b["rms_milli_sum"], pa.int64()).to_numpy(
                    zero_copy_only=False)
                // pc.cast(b["n_clips"], pa.int64()).to_numpy(
                    zero_copy_only=False), pa.int64()),
        }), batch_format="pyarrow")


def audio_quarantine_stats(sf_dir: str, n_base: int = 48,
                           n_corrupt: int = 12):
    """(status, err, n) — the audio POISON-ROW path (round 5, the
    audio twin of decode_quarantine_stats): a mixed wav+flac corpus
    with planted corruption — CRC-flipped FLAC bodies, truncated FLAC,
    garbage bytes, and an unknown-container header — flows through the
    AudioDecodeQuarantine actor pool; bad rows land in a queryable
    quarantine slice carrying the error class (FLAC corruption is
    DETECTED, not mis-decoded: every frame's CRC-8/CRC-16 is checked).
    Deterministic fixture → exact pytest pins the split; rows-only
    driver check."""
    from ray.data.aggregate import Count

    from .. import codec, flac
    from ..stages.multimodal import AudioDecodeQuarantine

    out = f"/tmp/destor_ray_audio_quar/v1_n{n_base}_c{n_corrupt}"
    if not os.path.isdir(out):
        sr = 8000
        t = np.arange(sr, dtype=np.float64) / sr
        ids, blobs = [], []
        for i in range(n_base):
            pcm = 0.4 * np.sin(2 * np.pi * (150 + 17 * i) * t)
            if i % 2:
                blobs.append(flac.encode(
                    np.round(32767 * pcm).astype(np.int32), sr))
            else:
                blobs.append(codec.wav_encode(pcm, sr))
            ids.append(f"aq{i:05d}")
        for i in range(n_corrupt):
            kind = i % 4
            src = bytearray(blobs[1])  # a valid FLAC body
            if kind == 0:    # bit rot mid-frame -> CRC-16 mismatch
                src[len(src) // 2] ^= 0x20
                b = bytes(src)
            elif kind == 1:  # truncated FLAC
                b = bytes(src[: len(src) // 3])
            elif kind == 2:  # garbage
                b = bytes((np.arange(64) * (i + 3) % 251).astype(np.uint8))
            else:            # unknown container magic
                b = b"OggS" + bytes(src[4:200])
            ids.append(f"aqbad{i:05d}")
            blobs.append(b)
        _commit_fixture(out, {"clips": pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        })})

    ds = ray.data.read_parquet(f"{out}/clips.parquet")
    res = ds.map_batches(AudioDecodeQuarantine, batch_format="pyarrow",
                         batch_size=32, concurrency=2)
    agg = res.groupby(["status", "err"]).aggregate(Count(alias_name="n"))
    return agg.map_batches(
        lambda b: pa.table({
            "status": b["status"], "err": b["err"],
            "n": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Video container attribution (round 5, VERDICT r4 #4): WebM/EBML walk
# with real VP8 key-frame decode + MP4/ISO-BMFF metadata attribution
# ---------------------------------------------------------------------------

def _video_mixed_corpus_dir(n_avi: int = 12, n_webm: int = 12,
                            n_mp4: int = 8, n_bad: int = 6) -> str:
    """Deterministic mixed-container video fixture: MJPEG-AVI (full
    real decode), WebM with our-encoder VP8 key frames (real key-frame
    decode through the EBML walk), metadata-only MP4 skeletons
    (attributed seam: avc1/hev1/mp4a tracks), WebM carrying ONLY inter
    frames (the declared VP8 seam), and garbage bytes."""
    from .. import avi as avi_mod
    from .. import bmff, jpeg, mkv, vp8

    out = (f"/tmp/destor_ray_video_mixed/"
           f"v1_a{n_avi}_w{n_webm}_m{n_mp4}_b{n_bad}")
    if os.path.isdir(out):
        return out
    ids, blobs = [], []

    def frame_img(i, k):
        yy, xx = np.mgrid[0:48, 0:64].astype(np.float64)
        g = np.clip(127 + 60 * np.sin(xx / 11 + i) +
                    50 * np.cos(yy / 7 + k), 0, 255).astype(np.uint8)
        return np.stack([g] * 3, -1)

    for i in range(n_avi):
        frames = [jpeg.encode(frame_img(i, k), quality=90)
                  for k in range(4)]
        ids.append(f"vca{i:05d}")
        blobs.append(avi_mod.encode_mjpeg(frames, 64, 48, fps=10))
    for i in range(n_webm):
        frames = [vp8.encode(frame_img(100 + i, k), qindex=8)
                  for k in range(4)]
        ids.append(f"vcw{i:05d}")
        blobs.append(mkv.encode_webm(frames, 64, 48))
    for i in range(n_mp4):
        codec_4cc = (b"avc1", b"hev1", b"mp4a")[i % 3]
        handler = b"soun" if codec_4cc == b"mp4a" else b"vide"
        ids.append(f"vcm{i:05d}")
        blobs.append(bmff.encode_mp4_skeleton(
            320, 240, codec=codec_4cc, handler=handler,
            duration=1000 + 100 * i))
    for i in range(n_bad):
        if i % 2:
            # WebM whose video track is ALL inter frames: parses,
            # attributes, but key-frame decode hits the declared seam
            frames = [vp8.encode(frame_img(200 + i, k), qindex=8)
                      for k in range(3)]
            b = mkv.encode_webm(frames, 64, 48,
                                keyframes=[False] * 3)
        else:
            b = bytes((np.arange(96) * (i + 7) % 251).astype(np.uint8))
        ids.append(f"vcb{i:05d}")
        blobs.append(b)
    return _commit_fixture(out, {"videos": pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
    })})


def video_container_stats(sf_dir: str):
    """(container, codec, status, n, n_frames_decoded) — per-container
    ATTRIBUTION across the real-crawl video container mix, through ONE
    dispatch (codec.decode_frames): MJPEG-AVI decodes fully, WebM
    enumerates EBML tracks and decodes VP8 KEY frames via the round-4
    RFC 6386 codec, MP4 walks the ISO-BMFF box tree and reports brand
    + per-track codec fourcc (decode is the declared H.264/HEVC/AAC
    seam), inter-only WebM and garbage quarantine WITH attribution —
    'webm/V_VP8 seam' and 'unknown', never a blind failure. This is
    the image_format_stats analog for video (VERDICT r4 #4).
    Rows-only driver check; exact pytest pins every row."""
    from ray.data.aggregate import Count, Sum

    from .. import avi as avi_mod
    from .. import bmff, codec as codec_mod, mkv

    d = _video_mixed_corpus_dir()
    ds = ray.data.read_parquet(f"{d}/videos.parquet")

    class ContainerAttribution:
        def __call__(self, batch: pa.Table) -> pa.Table:
            containers, codecs, status, nf = [], [], [], []
            for data in batch["bytes"].to_pylist():
                data = bytes(data)
                if mkv.is_webm(data):
                    containers.append("webm")
                    try:
                        m = mkv.meta(data)
                        codecs.append(",".join(sorted(
                            {t["codec_id"] for t in m["tracks"]})))
                    except Exception:
                        codecs.append("?")
                elif bmff.is_mp4(data):
                    containers.append("mp4")
                    try:
                        m = bmff.meta(data)
                        codecs.append(",".join(sorted(
                            {t["codec"] for t in m["tracks"]})))
                    except Exception:
                        codecs.append("?")
                elif avi_mod.is_avi(data):
                    containers.append("avi")
                    codecs.append("mjpeg")
                else:
                    containers.append("unknown")
                    codecs.append("")
                try:
                    frames = codec_mod.decode_frames(data)
                    status.append("ok")
                    nf.append(len(frames))
                except NotImplementedError:
                    status.append("seam")
                    nf.append(0)
                except Exception:
                    status.append("corrupt")
                    nf.append(0)
            return pa.table({
                "container": pa.array(containers, pa.string()),
                "codec": pa.array(codecs, pa.string()),
                "status": pa.array(status, pa.string()),
                "one": pa.array(np.ones(len(nf), np.int64), pa.int64()),
                "nf": pa.array(nf, pa.int64()),
            })

    rows = ds.map_batches(ContainerAttribution, batch_format="pyarrow",
                          batch_size=16, concurrency=2)
    agg = rows.groupby(["container", "codec", "status"]).aggregate(
        Sum("one", alias_name="n"),
        Sum("nf", alias_name="n_frames_decoded"))
    return agg.map_batches(
        lambda b: pa.table({
            "container": b["container"], "codec": b["codec"],
            "status": b["status"],
            "n": pc.cast(b["n"], pa.int64()),
            "n_frames_decoded": pc.cast(b["n_frames_decoded"],
                                        pa.int64()),
        }), batch_format="pyarrow")
