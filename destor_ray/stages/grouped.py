"""Bucketed grouped-map: the engine's vectorized shuffle primitive.

`ds.groupby(key).map_groups(fn)` calls a Python fn once per GROUP —
per-group overhead dominates when groups are numerous and tiny (LSH
bands, CC nodes). Instead we hash the key into `num_buckets` buckets and
group by the bucket: all rows of a key land in the same bucket (shuffle
correctness is preserved), but the Python fn now runs once per BUCKET
and processes its many groups with vectorized numpy/pandas.

This replaces the reference's single mutable kv-store probe loop
(/root/reference/src/index/kvstore_htable.c) the same way a
hash-partitioned shuffle does, with per-partition vectorized probing.

At 10^12-row scale `num_buckets` bounds reducer parallelism; size it
~4× the cluster's total cores. Hot keys still skew a bucket — bucket
fns must stay linear in group size (see candidates.py star+chain).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import mix_u64

BUCKET_COL = "__bucket"


def _add_bucket(batch: pa.Table, key: str, num_buckets: int, salt: int) -> pa.Table:
    col = batch[key]
    if pa.types.is_integer(col.type):
        k = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    else:
        # string keys: pandas hash_array (siphash, fixed key) is stable
        # across processes and vectorized
        k = pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object))
    b = (mix_u64(k, salt) % np.uint64(num_buckets)).astype(np.int64)
    return batch.append_column(BUCKET_COL, pa.array(b, pa.int64()))


def bucketed_group_map(ds, key: str, bucket_fn: Callable[[pd.DataFrame], pa.Table],
                       num_buckets: int = 64, salt: int = 0x6B):
    """Apply `bucket_fn` to each hash-bucket of rows (all rows of any
    `key` value share a bucket). `bucket_fn` receives a pandas DataFrame
    (unsorted; sort by key inside if needed, vectorized) and returns a
    pyarrow Table."""
    withb = ds.map_batches(lambda b: _add_bucket(b, key, num_buckets, salt),
                           batch_format="pyarrow")

    def wrap(df: pd.DataFrame) -> pa.Table:
        return bucket_fn(df.drop(columns=[BUCKET_COL]))

    return withb.groupby(BUCKET_COL).map_groups(wrap, batch_format="pandas")


def group_slices(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For a SORTED key array: (unique_keys, start_idx, counts)."""
    uniq, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    return uniq, starts, counts
