"""Exact (physical) dedup — destor's base index path recast as a
hash-shuffle (SURVEY.md §2.5 D2: the 4-level probe hierarchy of
/root/reference/src/index/index.c:140-217 collapses to
`groupby(sha1) → keep-first`; partition-local "recent fp buffer"
semantics fall out of the per-bucket reduction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .grouped import bucketed_group_map


def _keep_first_bucket(df: pd.DataFrame) -> pa.Table:
    """Vectorized keep-first over every sha1-group in a bucket: the
    minimal image_id survives (deterministic first-copy attribution,
    mirroring FIFO value[0] semantics of kvstore_htable.c:46-54)."""
    df = df.sort_values(["sha1", "image_id"], kind="stable")
    sha = df["sha1"].to_numpy()
    ids = df["image_id"].to_numpy()
    _, starts, counts = np.unique(sha, return_index=True, return_counts=True)
    keeper = np.repeat(ids[starts], counts)
    return pa.table({
        "image_id": pa.array(list(ids), pa.string()),
        "sha1": pa.array(list(sha), pa.string()),
        "keeper_id": pa.array(list(keeper), pa.string()),
        "is_dup": pa.array(ids != keeper, pa.bool_()),
    })


def _exact_edges_bucket(df: pd.DataFrame) -> pa.Table:
    df = df.sort_values(["sha1", "image_id"], kind="stable")
    sha = df["sha1"].to_numpy()
    ids = df["image_id"].to_numpy()
    _, starts, counts = np.unique(sha, return_index=True, return_counts=True)
    keeper = np.repeat(ids[starts], counts)
    dup = ids != keeper
    return pa.table({
        "left_id": pa.array(list(keeper[dup]), pa.string()),
        "right_id": pa.array(list(ids[dup]), pa.string()),
        "psnr": pa.array(np.full(int(dup.sum()), 1e9), pa.float64()),
    })


def exact_dedup(signatures_ds, num_buckets: int = 64):
    """signatures Dataset (needs image_id, sha1) →
    Dataset (image_id, sha1, keeper_id, is_dup)."""
    ds = signatures_ds.select_columns(["image_id", "sha1"])
    return bucketed_group_map(ds, "sha1", _keep_first_bucket, num_buckets)


def exact_edges(signatures_ds, num_buckets: int = 64):
    """Byte-identical pairs as verified edges (no PSNR probe needed)."""
    ds = signatures_ds.select_columns(["image_id", "sha1"])
    return bucketed_group_map(ds, "sha1", _exact_edges_bucket, num_buckets)
