"""Distribution statistics over big columns — the profiling pass every
100 TB curation pipeline runs before picking filter thresholds ("what IS
the p99 token count of this corpus?").

Two scale regimes, both shuffle-light:

  * `column_quantiles` — EXACT quantiles for low-cardinality columns
    (enums, small-int measures like TPC-H l_quantity): a value-count
    groupby reduces the dataset to |distinct| tiny rows, the driver does
    a cumulative-weight scan over those. The shuffle moves one row per
    distinct value per block — nothing else. DuckDB-oracle-checked with
    an explicit cumulative-weight SQL mirror of the same lower-quantile
    definition (no reliance on quantile_disc interpolation semantics).

  * `quantile_sketch_stats` — APPROXIMATE quantiles for continuous /
    high-cardinality columns via the mergeable deterministic MRL/KLL
    sketch (functions/sketch.py): each batch sketches locally
    (O(k·log(n/k)) float64s), partials tree-reduce through a small
    bucket groupby exactly like the HyperLogLog path, and the driver
    merges <=n_buckets tiny blobs. No data row ever crosses the wire.
    Rank-error is bounded in tests/test_sketch.py and against the DuckDB
    exact quantiles in tests/test_text_ops.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

DEFAULT_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def column_quantiles(sf_dir: str, qs: tuple[float, ...] = DEFAULT_QS):
    """(q, value): exact lower quantiles of lineitem.l_quantity —
    value = smallest v whose cumulative count reaches ceil(q * n).

    Scale shape: the groupby output is |distinct(l_quantity)| = 50 rows
    regardless of input size; only those cross to the driver.
    """
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_quantity"])
    counts = ds.groupby("l_quantity").aggregate(Count(alias_name="cnt"))
    df = counts.to_pandas().sort_values("l_quantity")
    cum = df["cnt"].cumsum().to_numpy()
    vals = df["l_quantity"].to_numpy()
    total = int(cum[-1])
    out_v = [int(vals[np.searchsorted(cum, max(1, int(np.ceil(q * total))),
                                      side="left")]) for q in qs]
    return pd.DataFrame({"q": list(qs), "value": pd.array(out_v, "int64")})


def quantile_sketch_stats(sf_dir: str, k: int = 256, num_buckets: int = 4):
    """One row (n_rows, p50, p90, p99) for lineitem.l_extendedprice via
    the mergeable quantile sketch — n_rows is exact, the quantiles carry
    the sketch's rank-error bound (<1% at k=256).

    Same reduce topology as text.distinct_token_stats: per-batch partial
    sketch -> bucketed merge -> driver merges <=num_buckets blobs.
    """
    from ..functions.sketch import QuantileSketch
    from ..stages.grouped import bucketed_group_map

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        s = QuantileSketch(k=k)
        s.add(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        bucket = int(batch["l_orderkey"][0].as_py()) % 64 if len(batch) else 0
        return pa.table({"bucket": pa.array([bucket], pa.int64()),
                         "sketch": pa.array([s.to_bytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge_bucket(df: pd.DataFrame) -> pa.Table:
        s = QuantileSketch(k=k)
        for b in df["sketch"]:
            s.merge(QuantileSketch.from_bytes(b))
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    merged = bucketed_group_map(partials, "bucket", merge_bucket,
                                num_buckets=num_buckets)
    final = QuantileSketch(k=k)
    for row in merged.take_all():  # <=num_buckets tiny blobs
        final.merge(QuantileSketch.from_bytes(row["sketch"]))
    p50, p90, p99 = final.quantiles([0.5, 0.9, 0.99])
    return pd.DataFrame({"n_rows": pd.array([final.n_items()], "int64"),
                         "p50": [p50], "p90": [p90], "p99": [p99]})


def events_type_sketch_percentiles(sf_dir: str, k: int = 256,
                                   num_buckets: int = 4):
    """(event_type, n, p50_micro, p90_micro) APPROXIMATE — the grouped
    twin of quantile_sketch_stats: per-batch per-type partial KLL
    sketches (each O(k log(n/k)) float64s regardless of group size),
    merged through a type-keyed groupby, quantiles read off the merged
    sketch. The scale path when one group's values can't co-locate for
    the exact rank-select (events_type_percentiles); rank error is
    bounded by the sketch guarantee and asserted against the exact
    reducer in tests."""
    import ray.data  # noqa: F811 (module-level import is for readers)

    from ..functions.sketch import QuantileSketch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        types, blobs, ns = [], [], []
        for t in np.unique(et):
            m = et == t
            sk = QuantileSketch(k=k)
            sk.add(v[m].astype(np.float64))
            types.append(t)
            blobs.append(sk.to_bytes())
            ns.append(int(m.sum()))
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "blob": pa.array(blobs, pa.binary()),
                         "n": pa.array(ns, pa.int64())})

    def merge_group(df: pd.DataFrame) -> pa.Table:
        types, p50, p90, ns = [], [], [], []
        for t, g in df.groupby("event_type"):
            sk = QuantileSketch(k=k)
            for blob in g["blob"]:
                sk = sk.merge(QuantileSketch.from_bytes(blob))
            q = sk.quantiles([0.5, 0.9])
            types.append(t)
            p50.append(int(q[0]))
            p90.append(int(q[1]))
            ns.append(int(g["n"].sum()))
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "p50_micro": pa.array(p50, pa.int64()),
                         "p90_micro": pa.array(p90, pa.int64())})

    from ..stages.grouped import bucketed_group_map
    return bucketed_group_map(ds.map_batches(partial, batch_format="pyarrow"),
                              "event_type", merge_group,
                              num_buckets=num_buckets)
