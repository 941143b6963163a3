"""Flagship pipeline: corpus → signatures → candidate edges → clusters.

Ray-Data-first shape (SURVEY.md §3.4):

  read_parquet(corpus)                        [S1]
   → map_batches(SignatureStage)              [C*, H1, F*]  stateless
   → explode bands → groupby(band_key)        [D3/D4]       shuffle #1
       → in-group verify (thumb PSNR)         [D5/T5]
   → union exact edges (groupby sha1)         [D2]          shuffle #2
   → hash-to-min connected components         [§7.4.1]      shuffles #3..
   → (image_id, cluster_id) assignment

All stages stream; nothing materializes the full corpus. Edges carry
only ids + a float, label propagation carries only id pairs — the wide
`bytes` column never crosses a shuffle.
"""

from __future__ import annotations

import ray.data

from ..config import EngineConfig
from ..stages import candidates, cluster, exact
from ..stages.signature import SignatureStage


def signatures_from_corpus(corpus_ds, cfg: EngineConfig | None = None):
    cfg = cfg or EngineConfig()
    return corpus_ds.map_batches(
        SignatureStage(cfg), batch_format="pyarrow",
        batch_size=256, concurrency=None)


def dedup_pipeline(corpus_ds, cfg: EngineConfig | None = None,
                   cc_rounds: int = 3):
    """corpus Dataset → cluster assignment Dataset (image_id, cluster_id).

    The signature table fans out to three consumers (LSH edges, exact
    edges, id list); without pinning it Ray Data re-executes the stage
    per consumer, so it is materialized here (it is narrow — the wide
    `bytes` column never leaves the read stage). The checkpointed job
    pipeline (pipelines/job.py) writes it to parquet instead — the path
    for corpora that exceed the object store."""
    cfg = cfg or EngineConfig()
    sigs = signatures_from_corpus(corpus_ds, cfg).materialize()
    # exact dedup rides the sha1 band channel inside candidate_edges —
    # no separate D2 shuffle in the flagship path (exact.exact_edges
    # remains the standalone operator)
    edges = candidates.candidate_edges(sigs, cfg)
    ids = sigs.select_columns(["image_id"])
    return cluster.assign_clusters(ids, edges, rounds=cc_rounds)


def dedup_pipeline_from_dir(corpus_dir: str, cfg: EngineConfig | None = None):
    ds = ray.data.read_parquet(corpus_dir)
    return dedup_pipeline(ds, cfg)
