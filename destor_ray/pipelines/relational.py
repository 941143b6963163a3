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


def part_type_revenue(sf_dir: str):
    """Lineitem ⋈ part on partkey, grouped by part brand — the engine's
    BROADCAST map-join surface: the part table is the small dimension
    side, shipped once via ray.put and probed per batch inside
    map_batches (no shuffle of the big fact side; SURVEY.md §2.10
    "broadcast small sides ... instead of a shuffle join")."""
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    dim = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = dim["p_partkey"].to_numpy()
    order = np.argsort(pk)
    pk_sorted = pk[order]
    brand_sorted = np.asarray(dim["p_brand"].to_pylist(), dtype=object)[order]
    ref = ray.put((pk_sorted, brand_sorted))

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"])

    def probe(batch: pa.Table) -> pa.Table:
        keys, brands = ray.get(ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, lp)
        pos = np.minimum(pos, len(keys) - 1)
        hit = keys[pos] == lp
        cents = np.round(batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "p_brand": pa.array(brands[pos[hit]], pa.string()),
            "price_cents": pa.array(cents[hit], pa.int64()),
        })

    agg = ds.map_batches(probe, batch_format="pyarrow") \
        .groupby("p_brand").aggregate(
            Count(alias_name="n_items"),
            Sum("price_cents", alias_name="sum_revenue_cents"))

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": batch["p_brand"],
            "n_items": batch["n_items"],
            "sum_revenue_cents": pc.cast(batch["sum_revenue_cents"], pa.int64()),
        })

    return agg.map_batches(normalize, batch_format="pyarrow")


def supplier_region_stats(sf_dir: str, num_partitions: int = 4):
    """Multi-way join supplier ⋈ nation ⋈ region grouped by region name:
    one hash-partitioned Dataset.join (supplier⋈nation) plus one
    broadcast probe (region — tiny) and a grouped aggregate."""
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = reg["r_regionkey"].to_numpy()
    order = np.argsort(rk)
    rk_sorted = rk[order]
    rname_sorted = np.asarray(reg["r_name"].to_pylist(), dtype=object)[order]
    ref = ray.put((rk_sorted, rname_sorted))

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    joined = sup.join(nat, "inner", num_partitions,
                      on=("s_nationkey",), right_on=("n_nationkey",))

    def probe(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(ref)
        nk = batch["n_regionkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keys, nk), len(keys) - 1)
        hit = keys[pos] == nk
        cents = np.round(batch["s_acctbal"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "r_name": pa.array(names[pos[hit]], pa.string()),
            "acctbal_cents": pa.array(cents[hit], pa.int64()),
        })

    agg = joined.map_batches(probe, batch_format="pyarrow") \
        .groupby("r_name").aggregate(
            Count(alias_name="n_suppliers"),
            Sum("acctbal_cents", alias_name="sum_acctbal_cents"))

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": batch["r_name"],
            "n_suppliers": batch["n_suppliers"],
            "sum_acctbal_cents": pc.cast(batch["sum_acctbal_cents"], pa.int64()),
        })

    return agg.map_batches(normalize, batch_format="pyarrow")
