"""Exact (physical) dedup — destor's base index path recast as a
hash-shuffle (SURVEY.md §2.5 D2: the 4-level probe hierarchy of
/root/reference/src/index/index.c:140-217 collapses to
`groupby(sha1) → keep-first`; partition-local "recent fp buffer"
semantics fall out of the per-group reduction).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _keep_first(df: pd.DataFrame) -> pa.Table:
    """Per content-hash group: the minimal image_id survives (deterministic
    first-copy attribution, mirroring FIFO value[0] semantics of
    kvstore_htable.c:46-54); others are marked duplicates of it."""
    df = df.sort_values("image_id")
    keeper = df["image_id"].iloc[0]
    out = df[["image_id", "sha1"]].copy()
    out["keeper_id"] = keeper
    out["is_dup"] = out["image_id"] != keeper
    return pa.Table.from_pandas(out, preserve_index=False)


def exact_dedup(signatures_ds):
    """signatures Dataset (needs image_id, sha1) →
    Dataset (image_id, sha1, keeper_id, is_dup)."""
    return signatures_ds.select_columns(["image_id", "sha1"]) \
        .groupby("sha1").map_groups(_keep_first, batch_format="pandas")


def exact_edges(signatures_ds):
    """Byte-identical pairs as verified edges (no PSNR probe needed)."""
    def to_edges(df: pd.DataFrame) -> pa.Table:
        from .candidates import empty_edges_table
        df = df.sort_values("image_id")
        if len(df) < 2:
            return empty_edges_table()
        keeper = df["image_id"].iloc[0]
        others = list(df["image_id"].iloc[1:])
        return pa.table({"left_id": pa.array([keeper] * len(others), pa.string()),
                         "right_id": pa.array(others, pa.string()),
                         "psnr": pa.array([1e9] * len(others), pa.float64())})

    return signatures_ds.select_columns(["image_id", "sha1"]) \
        .groupby("sha1").map_groups(to_edges, batch_format="pandas")
