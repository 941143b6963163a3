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
SENTINEL_COL = "__sentinel"


def _zeros(t: pa.DataType, n: int) -> pa.Array:
    """n default-valued (NOT null) entries of type t — sentinel rows
    must stay null-free so the pandas conversion in map_groups keeps
    int64 columns int64 (a single null would float64-ify them)."""
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return pa.array(np.zeros(n), type=t)
    if pa.types.is_boolean(t):
        return pa.array([False] * n, type=t)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.array([""] * n, type=t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.array([b""] * n, type=t)
    return pa.nulls(n, type=t)


def _sentinel_domain(num_buckets: int) -> int:
    """Number of distinct sentinel __bucket values to emit under the
    HASH shuffle strategy (0 under sort — the sort path has no empty-
    partition hazard and tests/fixtures keep their exact behavior).

    Why sentinels at all: Ray 2.49's hash shuffle piggybacks its
    schema broadcast on the FIRST shuffled block (hash_shuffle.py:223
    early-returns for empty blocks while the driver marks schemas as
    broadcast anyway). An aggregator partition that then receives zero
    shards builds a zero-COLUMN table and crashes Concat.finalize's
    sort_by("__bucket") — and the poison CHAINS: an empty partition's
    map_groups task yields nothing, which materializes as a
    zero-column empty block feeding the NEXT shuffle. Typed-zero
    sentinel rows covering a value domain ≫ the partition count make
    (a) every shuffled block non-empty (schema broadcast always
    happens) and (b) every hash partition non-empty (P[some partition
    valueless] = P·(1−1/P)^K ≈ P·e^(−K/P) ≈ e^−32 at K = 32·P), so
    neither failure mode can trigger. Sentinels are filtered out
    before bucket_fn ever sees them."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    if getattr(ctx, "shuffle_strategy", None) != ShuffleStrategy.HASH_SHUFFLE:
        return 0
    parallelism = int(getattr(ctx, "default_hash_shuffle_parallelism",
                              None) or 200)
    return min(8192, max(num_buckets, 32 * parallelism))


def _add_bucket(batch: pa.Table, key: str, num_buckets: int, salt: int,
                n_sent: int):
    if key not in batch.column_names and batch.num_rows == 0:
        # degenerate zero-column empty block (a yield-nothing upstream
        # task); nothing to bucket and no schema to sentinel — skip
        return
    col = batch[key]
    if pa.types.is_integer(col.type):
        k = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    else:
        # string keys: pandas hash_array (siphash, fixed key) is stable
        # across processes and vectorized
        k = pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object))
    b = (mix_u64(k, salt) % np.uint64(num_buckets)).astype(np.int64)
    n = batch.num_rows
    out = batch.append_column(BUCKET_COL, pa.array(b, pa.int64())) \
        .append_column(SENTINEL_COL, pa.array(np.zeros(n, bool)))
    if n_sent:
        sent = pa.table(
            {f.name: _zeros(f.type, n_sent) for f in batch.schema}
            | {BUCKET_COL: pa.array(np.arange(n_sent), pa.int64()),
               SENTINEL_COL: pa.array(np.ones(n_sent, bool))})
        out = pa.concat_tables([out, sent.select(out.column_names)])
    yield out


def bucketed_group_map(ds, key: str, bucket_fn: Callable,
                       num_buckets: int = 64, salt: int = 0x6B,
                       batch_format: str = "pandas"):
    """Apply `bucket_fn` to each hash-bucket of rows (all rows of any
    `key` value share a bucket). With batch_format="pandas" (default)
    `bucket_fn` receives a pandas DataFrame (unsorted; sort by key
    inside if needed, vectorized); with "pyarrow" it receives a
    pyarrow Table — the zero-copy path for the hottest shuffles
    (flagship verify, CC), skipping the Arrow→pandas hop that
    object-boxes binary columns. Either way it returns a pyarrow
    Table. Under the hash shuffle strategy, sentinel-only buckets
    exist (see _sentinel_domain) — bucket_fn must tolerate an empty
    input (every vectorized group loop already does)."""
    n_sent = _sentinel_domain(num_buckets)
    withb = ds.map_batches(
        lambda b: _add_bucket(b, key, num_buckets, salt, n_sent),
        batch_format="pyarrow")

    if batch_format == "pyarrow":
        import pyarrow.compute as pc

        def wrap_arrow(t: pa.Table) -> pa.Table:
            real = t.filter(pc.invert(t[SENTINEL_COL]))
            if real.num_rows == 0:
                # sentinel-only bucket — see wrap() below
                return pa.table({})
            return bucket_fn(
                real.drop_columns([BUCKET_COL, SENTINEL_COL]))

        return withb.groupby(BUCKET_COL).map_groups(
            wrap_arrow, batch_format="pyarrow")

    def wrap(df: pd.DataFrame) -> pa.Table:
        real = df[~df[SENTINEL_COL]]
        if real.empty:
            # sentinel-only bucket: exactly the buckets that did not
            # exist pre-sentinel — preserve old semantics (bucket_fn
            # never sees them); the zero-column empty is tolerated by
            # the next stage's _add_bucket guard
            return pa.table({})
        return bucket_fn(real.drop(columns=[BUCKET_COL, SENTINEL_COL]))

    return withb.groupby(BUCKET_COL).map_groups(wrap, batch_format="pandas")


def group_slices(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For a SORTED key array: (unique_keys, start_idx, counts)."""
    uniq, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    return uniq, starts, counts
