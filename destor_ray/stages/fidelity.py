"""Decode-verify fidelity stage — the restore file-writer analog (T5,
/root/reference/src/do_restore.c:113-189): where destor restores files
and diffs them against the source tree, this stage decodes every row's
payload and checks it against the deterministic generator
(restore-as-oracle, SURVEY.md §5.1.4), enforcing the per-row invariant
from BASELINE.json.input_hint: decoded-pixel PSNR >= 40 dB for lossy
formats (exact for lossless) + caption equality.

Actor-pool stage: the codec tables and generator config are per-actor
state; batches stay small because rows carry full payloads here (the
only stage that must touch `bytes`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codec, corpus


class FidelityVerifier:
    """map_batches(FidelityVerifier, batch_size=64, concurrency=N)."""

    def __init__(self, seed: int = 42, psnr_min: float = 40.0):
        self.seed = seed
        self.psnr_min = psnr_min

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        captions = batch["caption"].to_pylist()
        ok, psnrs = [], []
        for i, (rid, data, cap) in enumerate(zip(ids, payloads, captions)):
            row = corpus.row_index_of(rid)
            # the invariant is vs the ORIGINAL pre-encode pixels
            # (input_hint: "decoded-pixel allclose, PSNR>=40dB for lossy"),
            # NOT a byte-level round-trip against regenerated payloads
            ref, _, exp_caption = corpus.source_pixels(self.seed, row)
            got = codec.decode(data)
            if got.shape != ref.shape:
                ok.append(False)
                psnrs.append(0.0)
                continue
            p = codec.psnr(got, ref)
            fmt, _, _, _ = codec.decode_meta(data)
            if fmt in codec.LOSSLESS_FMTS:
                good = p == float("inf")  # lossless must round-trip exactly
            else:
                good = p >= self.psnr_min
            good = good and (cap == exp_caption)
            ok.append(bool(good))
            psnrs.append(min(p, 1e9))
        return pa.table({
            "image_id": batch["image_id"],
            "fidelity_ok": pa.array(ok, pa.bool_()),
            "psnr": pa.array(psnrs, pa.float64()),
        })


def verify_fidelity(corpus_ds, seed: int = 42, concurrency: int = 4):
    return corpus_ds.map_batches(
        FidelityVerifier, fn_constructor_kwargs={"seed": seed},
        batch_format="pyarrow", batch_size=64, concurrency=concurrency)
