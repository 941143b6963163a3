"""Relational operators over the TPC-H-ish driver tables — the engine's
general aggregation/join surface (destor's per-job accounting W5 and the
§2.10 classification: grouped aggregates, partitioned hash join, top-k).

All columns are named identically in the DuckDB oracles
(__ray_entry__.oracle_sql); float sums are of integral or 2-decimal
values so round(…, 4) is hash-stable across accumulation orders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary (grouped aggregate with map-side
    pre-aggregation happening inside Ray's hash aggregate)."""
    from ray.data.aggregate import Count, Sum
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        # exact integer cents BEFORE aggregation: float sums over 10^5+
        # rows are order-dependent beyond any fixed rounding digit
        cents = np.round(batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "l_quantity": pa.array(batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()),
            "price_cents": pa.array(cents, pa.int64()),
        })

    out = ds.map_batches(to_cents, batch_format="pyarrow")         .groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("price_cents", alias_name="sum_price_cents"),
        Count(alias_name="n_items"))

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pc.cast(batch["sum_qty"], pa.int64()),
            "sum_price_cents": pc.cast(batch["sum_price_cents"], pa.int64()),
            "n_items": batch["n_items"],
        })

    return out.map_batches(normalize, batch_format="pyarrow")


def customer_order_stats(sf_dir: str, num_partitions: int = 8):
    """Orders ⋈ customer on custkey (Dataset.join — hash-partitioned),
    grouped by market segment: the engine's large-side join surface."""
    from ray.data.aggregate import Count, Sum
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, "inner", num_partitions,
                         on=("o_custkey",), right_on=("c_custkey",))
    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"c_mktsegment": batch["c_mktsegment"],
                         "price_cents": pa.array(cents, pa.int64())})

    agg = joined.map_batches(to_cents, batch_format="pyarrow")         .groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"),
        Sum("price_cents", alias_name="sum_totalprice_cents"))

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "n_orders": batch["n_orders"],
            "sum_totalprice_cents": pc.cast(batch["sum_totalprice_cents"], pa.int64()),
        })

    return agg.map_batches(normalize, batch_format="pyarrow")


def top_parts_by_quantity(sf_dir: str, k: int = 10):
    """Top-k parts by total shipped quantity (pre-aggregate → global
    sort → limit; deterministic tie-break on partkey)."""
    from ray.data.aggregate import Sum
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"])
    agg = ds.groupby("l_partkey").aggregate(Sum("l_quantity", alias_name="total_qty"))

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch["l_partkey"],
            "total_qty": pc.cast(batch["total_qty"], pa.int64()),
        })

    return agg.map_batches(normalize, batch_format="pyarrow") \
        .sort(["total_qty", "l_partkey"], descending=[True, False]).limit(k)
