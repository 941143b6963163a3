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


def customers_without_urgent_orders(sf_dir: str):
    """(c_custkey, c_mktsegment, acctbal_cents) for customers with NO
    '1-URGENT' order — the engine's distributed ANTI-join surface
    (destor's index reclamation X3 uses the same shape: survivors =
    left rows whose key never appears on the right,
    /root/reference/src/index/index.c delete path).

    Scale shape: tag-and-union shuffle anti-join. The right side is
    map-side reduced to DISTINCT keys per batch before the shuffle
    (orders with the same custkey collapse early), both sides hash-
    partition by key once, and each bucket resolves membership with one
    vectorized isin — no broadcast, works when BOTH sides are huge."""
    from ..stages.grouped import bucketed_group_map

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"])

    def left_rows(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return pa.table({
            "key": batch["c_custkey"].cast(pa.int64()),
            "c_mktsegment": batch["c_mktsegment"],
            "acctbal_cents": pa.array(cents, pa.int64()),
            "src": pa.array(np.zeros(len(batch), np.int8), pa.int8()),
        })

    def right_keys(batch: pa.Table) -> pa.Table:
        urgent = batch.filter(
            pc.equal(batch["o_orderpriority"], "1-URGENT"))
        keys = np.unique(urgent["o_custkey"].to_numpy(zero_copy_only=False))
        n = len(keys)
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "c_mktsegment": pa.array([None] * n, pa.string()),
            "acctbal_cents": pa.array(np.zeros(n, np.int64), pa.int64()),
            "src": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    tagged = cust.map_batches(left_rows, batch_format="pyarrow").union(
        orders.map_batches(right_keys, batch_format="pyarrow"))

    def anti(df: pd.DataFrame) -> pa.Table:
        present = df.loc[df["src"] == 1, "key"].to_numpy()
        left = df[df["src"] == 0]
        keep = ~np.isin(left["key"].to_numpy(), present)
        sub = left[keep]
        return pa.table({
            "c_custkey": pa.array(sub["key"].to_numpy(), pa.int64()),
            "c_mktsegment": pa.array(sub["c_mktsegment"].tolist(),
                                     pa.string()),
            "acctbal_cents": pa.array(sub["acctbal_cents"].to_numpy(),
                                      pa.int64()),
        })

    return bucketed_group_map(tagged, "key", anti)


def orders_running_total(sf_dir: str):
    """(o_orderkey, o_custkey, run_total_cents, order_rank): per-customer
    running order-value total and order sequence number, ordered by
    (o_orderdate, o_orderkey) — the engine's PARTITIONED WINDOW FUNCTION
    surface. Hash-partition by customer, then one lexsort + segmented
    cumsum per bucket (vectorized: the per-group reset is a subtract of
    the group-start prefix, no Python loop over groups). Keys never
    straddle buckets, so partition-local windows are exact — the same
    co-partitioning contract as events_asof_join."""
    from ..stages.grouped import bucketed_group_map

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return pa.table({
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "date_us": batch["o_orderdate"].cast(pa.timestamp("us"))
                       .cast(pa.int64()),
        })

    narrow = orders.map_batches(to_cents, batch_format="pyarrow")

    def window(df: pd.DataFrame) -> pa.Table:
        cust = df["o_custkey"].to_numpy()
        date = df["date_us"].to_numpy()
        okey = df["o_orderkey"].to_numpy()
        cents = df["cents"].to_numpy()
        order = np.lexsort((okey, date, cust))
        cust_s, cents_s = cust[order], cents[order]
        cum = np.cumsum(cents_s)
        # group starts: first row of each customer run
        new = np.empty(len(cust_s), dtype=bool)
        if len(cust_s):
            new[0] = True
            new[1:] = cust_s[1:] != cust_s[:-1]
        starts = np.flatnonzero(new)
        # prefix before each group, broadcast to its rows
        sizes = np.diff(np.append(starts, len(cust_s)))
        base = np.repeat(np.where(starts > 0, cum[starts - 1], 0), sizes)
        rank = np.arange(len(cust_s)) - np.repeat(starts, sizes) + 1
        return pa.table({
            "o_orderkey": pa.array(okey[order], pa.int64()),
            "o_custkey": pa.array(cust_s, pa.int64()),
            "run_total_cents": pa.array(cum - base, pa.int64()),
            "order_rank": pa.array(rank, pa.int64()),
        })

    return bucketed_group_map(narrow, "o_custkey", window)


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


def lineitem_rollup(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) in one output:
    (flag, status) detail rows plus (flag, 'ALL') subtotals plus the
    ('ALL', 'ALL') grand total, over exact integer cents.

    Scale shape — rollup-from-finest: the fact table is scanned and
    aggregated ONCE (map-side pre-aggregation inside Ray's hash
    aggregate); the coarser levels re-aggregate the FINEST RESULT,
    which is bounded by |returnflag|x|linestatus| rows, so the extra
    levels cost shuffles over a kilobyte-scale table instead of a
    rescan per level. Rolled-up key columns carry the sentinel 'ALL'
    (mirrored by COALESCE in the oracle) so the value hash is stable
    across pandas/DuckDB NULL renderings."""
    from ray.data.aggregate import Count, Sum
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["l_extendedprice"]
                         .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "price_cents": pa.array(cents, pa.int64()),
        })

    finest = ds.map_batches(to_cents, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("price_cents", alias_name="sum_price_cents"),
            Count(alias_name="n_items")) \
        .materialize()  # tiny (key-cardinality rows); feeds 3 levels

    # The finest level is the ONLY pass over the fact table; the coarser
    # rollup levels re-aggregate it on the driver — a key-cardinality-
    # bounded table (|flag|x|status| rows at any data scale), i.e. the
    # legitimate small-result case, not a driver loop over the input.
    fin = finest.to_pandas()
    fin["sum_price_cents"] = fin["sum_price_cents"].astype(np.int64)
    fin["n_items"] = fin["n_items"].astype(np.int64)
    lvl2 = fin.groupby("l_returnflag", as_index=False)[
        ["sum_price_cents", "n_items"]].sum()
    lvl2["l_linestatus"] = "ALL"
    lvl3 = pd.DataFrame({
        "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
        "sum_price_cents": [fin["sum_price_cents"].sum()],
        "n_items": [fin["n_items"].sum()],
    })
    cols = ["l_returnflag", "l_linestatus", "sum_price_cents", "n_items"]
    return pd.concat([fin[cols], lvl2[cols], lvl3[cols]],
                     ignore_index=True)


def lineitem_corr_stats(sf_dir: str):
    """(l_returnflag, n, sum_qty, sum_price_cents, corr_micro) — exact
    grouped Pearson correlation of quantity vs extended price via
    mergeable MOMENT partials, the one-pass distributed statistic
    (Welford/Chan parallel variance, but in exact integer arithmetic).

    The scale problem this solves: sum(y^2) of cent-quantized prices
    overflows int64 at ~10^5 rows x (10^7 cents)^2, and float partials
    are accumulation-order-dependent — neither survives a deterministic
    128-bit-exact aggregate. So each batch emits its five moment sums
    (n, Sx, Sy, Sxy, Sxx, Syy) LIMB-DECOMPOSED into (hi, lo) int64
    pairs (lo = sum mod 2^32, hi = sum >> 32; per-batch sums provably
    fit int64 at batch_size <= 8192). Ray's int64 Sum aggregate then
    reduces each limb independently — 2^31 batches before lo itself
    can overflow — and the driver recombines hi*2^32 + lo in Python
    bigints, mirroring DuckDB's HUGEINT sums bit-for-bit. The final
    corr is computed double-precision in the exact operand order the
    oracle uses, rounded half-away-from-zero to integer micros.

    Shape: ONE map-side-combined groupby whose exchange carries 13
    int64s per (batch x group) — never a data row."""
    import math

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    LIMB = np.int64(1) << np.int64(32)

    def moments(batch: pa.Table) -> pa.Table:
        flag = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)
        x = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.round(batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        order = np.argsort(flag, kind="stable")
        f_s, x_s, y_s = flag[order], x[order], y[order]
        first = np.empty(len(f_s), dtype=bool)
        if len(f_s):
            first[0] = True
            first[1:] = f_s[1:] != f_s[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(f_s))
        out = {"l_returnflag": pa.array(f_s[starts], pa.string()),
               "n": pa.array(ends - starts, pa.int64())}
        for name, v in (("sx", x_s), ("sy", y_s), ("sxy", x_s * y_s),
                        ("sxx", x_s * x_s), ("syy", y_s * y_s)):
            s = np.add.reduceat(v, starts) if len(starts) else \
                np.array([], np.int64)
            out[f"{name}_hi"] = pa.array(s >> np.int64(32), pa.int64())
            out[f"{name}_lo"] = pa.array(s & (LIMB - 1), pa.int64())
        return pa.table(out)

    aggs = [Sum("n", alias_name="n")]
    for name in ("sx", "sy", "sxy", "sxx", "syy"):
        aggs += [Sum(f"{name}_hi", alias_name=f"{name}_hi"),
                 Sum(f"{name}_lo", alias_name=f"{name}_lo")]
    part = ds.map_batches(moments, batch_format="pyarrow",
                          batch_size=8192) \
        .groupby("l_returnflag").aggregate(*aggs).to_pandas()

    rows = []
    for _, r in part.iterrows():
        n = int(r["n"])
        s = {k: (int(r[f"{k}_hi"]) << 32) + int(r[f"{k}_lo"])
             for k in ("sx", "sy", "sxy", "sxx", "syy")}
        num = n * s["sxy"] - s["sx"] * s["sy"]
        d1 = n * s["sxx"] - s["sx"] * s["sx"]
        d2 = n * s["syy"] - s["sy"] * s["sy"]
        # operand order mirrors the oracle: num->double, *1e6, /sqrt(d1*d2)
        corr = float(num) * 1_000_000.0 / math.sqrt(float(d1 * d2))
        corr_micro = math.floor(corr + 0.5) if corr >= 0 \
            else -math.floor(-corr + 0.5)  # round half away, as DuckDB
        rows.append((r["l_returnflag"], n, s["sx"], s["sy"], corr_micro))
    out = pd.DataFrame(rows, columns=[
        "l_returnflag", "n", "sum_qty", "sum_price_cents", "corr_micro"])
    return out.astype({"n": "int64", "sum_qty": "int64",
                       "sum_price_cents": "int64", "corr_micro": "int64"})


def bloom_semi_join(sf_dir: str, priority: str = "1-URGENT"):
    """(l_returnflag, n_items, sum_qty) over lineitems whose order is
    urgent — the Bloom-pruned distributed semi-join (the reference's B1
    DDFS filter, §2.5, earning its keep on the relational surface):

      1. build: each build-side block adds its urgent o_orderkeys to a
         BloomFilter sized from the build file's parquet row-count
         metadata (~10 bits/key, power-of-two, 128 MB cap — see
         BloomFilter.bits_for); the per-block filters are OR-merged in a
         log-depth TASK-SIDE tree (fan-in 16): the driver only ever
         holds object refs, never blob bytes, so 10^5 build blocks cost
         the driver 10^5 refs, not 10^5 × filter-size bytes;
      2. probe: ONE compact bit-array (vs 8 B/key for an exact set)
         ships to every prober as the tree root's object ref; the fact
         table is pruned MAP-ONLY to candidates = true matches + bounded
         false positives;
      3. exact verify: only the pruned candidates enter a tag-and-union
         rendezvous with the build keys — the shuffle is proportional to
         the MATCH volume, never the fact table — and per-bucket partial
         (flag, count, qty) aggregates reduce to a tiny final groupby.

    False positives cost only wasted verify rows, never wrong output."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..functions.bloom import BloomFilter
    from ..stages.grouped import bucketed_group_map

    import pyarrow.parquet as pq

    build = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])

    # Size from metadata, not a scan: total build rows upper-bound the
    # selected keys, and oversizing only lowers the FPR.
    n_build = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    num_bits = BloomFilter.bits_for(n_build)

    def block_filter(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        sel = np.asarray(
            pc.equal(batch["o_orderpriority"],
                     priority).to_numpy(zero_copy_only=False), bool)
        bf = BloomFilter(num_bits=num_bits)
        bf.add(keys[sel].astype(np.uint64))
        return pa.table({"blob": pa.array([bf.to_bytes()], pa.binary())})

    @_ray.remote
    def _or_leaf(*blocks) -> bytes:
        # leaf: OR every blob row of ≤FAN block tables into one blob
        out = None
        for tbl in blocks:
            for blob in tbl["blob"].to_pylist():
                arr = np.frombuffer(blob, np.uint8)
                out = arr.copy() if out is None else out.__ior__(arr)
        if out is None:  # all-empty blocks
            out = np.zeros(num_bits // 8, np.uint8)
        return out.tobytes()

    @_ray.remote
    def _or_node(*blobs: bytes) -> bytes:
        out = np.frombuffer(blobs[0], np.uint8).copy()
        for b in blobs[1:]:
            out |= np.frombuffer(b, np.uint8)
        return out.tobytes()

    FAN = 16
    mat = build.map_batches(block_filter, batch_format="pyarrow") \
        .materialize()
    refs = [r for bundle in mat.iter_internal_ref_bundles()
            for r in bundle.block_refs]
    level = ([_or_leaf.remote(*refs[i:i + FAN])
              for i in range(0, len(refs), FAN)] if refs
             else [_ray.put(BloomFilter(num_bits=num_bits).to_bytes())])
    while len(level) > 1:
        level = [_or_node.remote(*level[i:i + FAN])
                 for i in range(0, len(level), FAN)]
    bf_ref = level[0]  # ONE blob, already in the object store

    fact = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_quantity"])

    def probe(batch: pa.Table) -> pa.Table:
        bf = BloomFilter.from_bytes(_ray.get(bf_ref))
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        hit = bf.contains(keys.astype(np.uint64))
        m = pa.array(hit)
        return pa.table({
            "key": batch["l_orderkey"].filter(m),
            "l_returnflag": batch["l_returnflag"].filter(m),
            "qty": pa.array(batch["l_quantity"].to_numpy(
                zero_copy_only=False)[hit].astype(np.int64), pa.int64()),
            "is_build": pa.array(np.zeros(int(hit.sum()), np.int8), pa.int8()),
        })

    def build_rows(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].filter(pc.equal(b["o_orderpriority"],
                                               priority))
        n = len(keys)
        return pa.table({
            "key": keys,
            "l_returnflag": pa.array([""] * n, pa.string()),
            "qty": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_build": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    tagged = fact.map_batches(probe, batch_format="pyarrow") \
        .union(build.map_batches(build_rows, batch_format="pyarrow"))

    def verify(df: pd.DataFrame) -> pa.Table:
        isb = df["is_build"].to_numpy(np.int8) == 1
        good = set(df.loc[isb, "key"].to_numpy(np.int64).tolist())
        cand = df.loc[~isb]
        hit = cand["key"].isin(good).to_numpy()
        sel = cand.loc[hit]
        if not len(sel):
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "n_items": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.int64())})
        g = sel.groupby("l_returnflag", as_index=False).agg(
            n_items=("qty", "size"), sum_qty=("qty", "sum"))
        return pa.table({
            "l_returnflag": pa.array(g["l_returnflag"].tolist(), pa.string()),
            "n_items": pa.array(g["n_items"].to_numpy(np.int64), pa.int64()),
            "sum_qty": pa.array(g["sum_qty"].to_numpy(np.int64), pa.int64()),
        })

    agg = bucketed_group_map(tagged, "key", verify, num_buckets=8) \
        .groupby("l_returnflag").aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("sum_qty", alias_name="sum_qty"))
    return agg.map_batches(
        lambda b: pa.table({
            "l_returnflag": b["l_returnflag"],
            "n_items": pc.cast(b["n_items"], pa.int64()),
            "sum_qty": pc.cast(b["sum_qty"], pa.int64()),
        }), batch_format="pyarrow")


def orders_decile_stats(sf_dir: str, n_buckets: int = 10):
    """(decile, n_orders, sum_cents, min_cents, max_cents) — exact
    quantile BUCKETING (the distributed ntile): every order lands in a
    price decile, ties resolved value-stable (all rows of one value get
    the decile of that value's LAST global rank — a deterministic,
    row-order-independent rule both sides mirror).

    Shape: the classic two-pass counting-sort scheme — pass 1 reduces
    the fact table to a value-count table (bounded by the value DOMAIN,
    here distinct cent amounts, not by row count) from which the driver
    derives the <=9 bucket cutoffs; pass 2 is a MAP-ONLY searchsorted
    assignment plus a |buckets|-cardinality aggregate. No global sort,
    no row ever shuffles twice. Same skeleton as stats.column_quantiles,
    upgraded from point lookups to a full partition assignment."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({"c": pa.array(c, pa.int64())})

    vc = ds.map_batches(cents, batch_format="pyarrow") \
        .groupby("c").aggregate(Count(alias_name="cnt")).to_pandas() \
        .sort_values("c")
    cum = vc["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    vals = vc["c"].to_numpy(np.int64)
    decile_of_val = (cum - 1) * n_buckets // n
    # cutoff_d = smallest value with decile >= d, for d = 1..n_buckets-1;
    # DUPLICATES must stay (a heavy value spanning several deciles makes
    # consecutive cutoffs equal, and searchsorted must count each), so
    # decile(v) = #{d : cutoff_d <= v} = searchsorted(cutoffs, v, right)
    idx = np.searchsorted(decile_of_val, np.arange(1, n_buckets),
                          side="left")
    cutoffs = vals[idx[idx < len(vals)]]

    def assign(batch: pa.Table) -> pa.Table:
        c = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        d = np.searchsorted(cutoffs, c, side="right")
        return pa.table({"decile": pa.array(d.astype(np.int64), pa.int64()),
                         "c": pa.array(c, pa.int64())})

    agg = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("decile").aggregate(
            Count(alias_name="n_orders"), Sum("c", alias_name="sum_cents"),
            Min("c", alias_name="min_cents"), Max("c", alias_name="max_cents"))
    return agg.map_batches(
        lambda b: pa.table({
            "decile": b["decile"],
            "n_orders": pc.cast(b["n_orders"], pa.int64()),
            "sum_cents": pc.cast(b["sum_cents"], pa.int64()),
            "min_cents": pc.cast(b["min_cents"], pa.int64()),
            "max_cents": pc.cast(b["max_cents"], pa.int64()),
        }), batch_format="pyarrow")


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-06-01", k: int = 10):
    """(l_orderkey, o_orderdate, o_orderpriority, revenue_scaled) — the
    TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with per-side date
    predicates, grouped revenue, global top-k. Exercises the 3-way join
    composition: the SMALL dimension (segment customers) broadcasts as
    a key set; the two FACT sides meet in ONE tag-and-union hash
    shuffle on orderkey with the lineitem side pre-aggregated per batch
    (partial revenue per orderkey), so the exchange carries partials
    and order headers, never line items. Per-bucket top-k then a tiny
    driver merge — the k·buckets rows are all that leave the reducers.

    revenue_scaled = Σ price_cents · (100 − disc_pct): exact int64
    (≤ 10^9 per item), accumulation-order-free on both sides."""
    import pyarrow.parquet as pq_
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    cut = np.datetime64(cutoff, "us").astype(np.int64)

    cust = pq_.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"], segment))["c_custkey"] \
        .to_numpy()
    cust_ref = _ray.put(np.sort(keys))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def order_rows(batch: pa.Table) -> pa.Table:
        ck = _ray.get(cust_ref)
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        custk = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ck, custk)
        pos[pos >= len(ck)] = 0
        sel = (ck[pos] == custk) & (od < cut) if len(ck) else \
            np.zeros(len(custk), bool)
        m = pa.array(sel)
        n = int(sel.sum())
        return pa.table({
            "key": batch["o_orderkey"].filter(m),
            "o_date": pa.array(od[sel], pa.int64()),
            "o_orderpriority": batch["o_orderpriority"].filter(m),
            "rev": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_order": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_partials(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = sd > cut
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)[sel]
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[sel] * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False)[sel] * 100).astype(np.int64)
        rev = cents * (100 - disc)
        order = np.argsort(okey, kind="stable")
        ok_s, rev_s = okey[order], rev[order]
        first = np.empty(len(ok_s), dtype=bool)
        if len(ok_s):
            first[0] = True
            first[1:] = ok_s[1:] != ok_s[:-1]
        starts = np.flatnonzero(first)
        psum = np.add.reduceat(rev_s, starts) if len(starts) else \
            np.array([], np.int64)
        n = len(starts)
        return pa.table({
            "key": pa.array(ok_s[starts], pa.int64()),
            "o_date": pa.array(np.zeros(n, np.int64), pa.int64()),
            "o_orderpriority": pa.array([""] * n, pa.string()),
            "rev": pa.array(psum, pa.int64()),
            "is_order": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def bucket_topk(df: pd.DataFrame) -> pa.Table:
        iso = df["is_order"].to_numpy(np.int8) == 1
        ords = df.loc[iso].drop_duplicates("key")
        rev = df.loc[~iso].groupby("key", as_index=False)["rev"].sum()
        j = ords.merge(rev, on="key", how="inner", suffixes=("_z", ""))
        if not len(j):
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "o_date": pa.array([], pa.int64()),
                "o_orderpriority": pa.array([], pa.string()),
                "revenue_scaled": pa.array([], pa.int64())})
        j = j.sort_values(["rev", "key"], ascending=[False, True]).head(k)
        return pa.table({
            "l_orderkey": pa.array(j["key"].to_numpy(np.int64), pa.int64()),
            "o_date": pa.array(j["o_date"].to_numpy(np.int64), pa.int64()),
            "o_orderpriority": pa.array(j["o_orderpriority"].tolist(),
                                        pa.string()),
            "revenue_scaled": pa.array(j["rev"].to_numpy(np.int64),
                                       pa.int64()),
        })

    cand = bucketed_group_map(tagged, "key", bucket_topk, num_buckets=8) \
        .to_pandas()  # ≤ k × buckets rows
    cand = cand.sort_values(["revenue_scaled", "l_orderkey"],
                            ascending=[False, True]).head(k)
    out = pd.DataFrame({
        "l_orderkey": cand["l_orderkey"].to_numpy(np.int64),
        "o_orderdate": cand["o_date"].to_numpy(np.int64)
        .astype("datetime64[us]").astype("datetime64[D]").astype(str),
        "o_orderpriority": cand["o_orderpriority"].to_numpy(object),
        "revenue_scaled": cand["revenue_scaled"].to_numpy(np.int64),
    })
    return out.reset_index(drop=True)


def orders_lineitem_left_join(sf_dir: str, cutoff: str = "2001-01-01"):
    """(o_orderkey, n_late_items, late_qty) for EVERY order — LEFT OUTER
    join: orders with no lineitem shipped after the cutoff keep a
    0-count row (the join-type matrix: inner ✓ customer_order_stats,
    broadcast ✓ part_type_revenue, anti ✓ customers_without_urgent,
    semi ✓ bloom_semi_join, as-of/range ✓ events — this adds LEFT).

    Shape: the lineitem side pre-aggregates per batch to (orderkey,
    partial count, partial qty) BEFORE the exchange, the orders side
    ships bare keys; one tag-and-union hash shuffle, per-bucket
    zero-fill for keys with no fact partials. Exchange volume =
    orders + distinct-orderkey partials, never raw line items."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    cut = np.datetime64(cutoff, "us").astype(np.int64)

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey"])
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_shipdate"])

    def left_keys(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["o_orderkey"],
            "n": pa.array(np.zeros(n, np.int64), pa.int64()),
            "qty": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_left": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def fact_partials(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = sd > cut
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)[sel]
        qty = batch["l_quantity"].to_numpy(
            zero_copy_only=False)[sel].astype(np.int64)
        order = np.argsort(okey, kind="stable")
        ok_s, q_s = okey[order], qty[order]
        first = np.empty(len(ok_s), dtype=bool)
        if len(ok_s):
            first[0] = True
            first[1:] = ok_s[1:] != ok_s[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(ok_s))
        psum = np.add.reduceat(q_s, starts) if len(starts) else \
            np.array([], np.int64)
        return pa.table({
            "key": pa.array(ok_s[starts], pa.int64()),
            "n": pa.array(ends - starts, pa.int64()),
            "qty": pa.array(psum, pa.int64()),
            "is_left": pa.array(np.zeros(len(starts), np.int8), pa.int8()),
        })

    tagged = orders.map_batches(left_keys, batch_format="pyarrow") \
        .union(lineitem.map_batches(fact_partials, batch_format="pyarrow"))

    def zero_fill(df: pd.DataFrame) -> pa.Table:
        isl = df["is_left"].to_numpy(np.int8) == 1
        left = df.loc[isl, "key"].drop_duplicates()
        f = df.loc[~isl].groupby("key", as_index=False)[["n", "qty"]].sum()
        j = pd.DataFrame({"key": left}).merge(f, on="key", how="left") \
            .fillna(0)
        return pa.table({
            "o_orderkey": pa.array(j["key"].to_numpy(np.int64), pa.int64()),
            "n_late_items": pa.array(j["n"].to_numpy(np.int64), pa.int64()),
            "late_qty": pa.array(j["qty"].to_numpy(np.int64), pa.int64()),
        })

    return bucketed_group_map(tagged, "key", zero_fill, num_buckets=8)


def lineitem_cube(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping
    sets — detail, per-flag, per-status, grand total — completing the
    grouping-sets family next to lineitem_rollup. Same
    cube-from-finest shape: ONE fact-table pass produces the
    |flag|×|status|-bounded finest result; the three coarser levels
    re-aggregate that tiny table on the driver. 'ALL' sentinels keep
    the hash stable across NULL renderings (COALESCE in the oracle)."""
    from ray.data.aggregate import Count, Sum
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["l_extendedprice"]
                         .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "price_cents": pa.array(cents, pa.int64()),
        })

    fin = ds.map_batches(to_cents, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("price_cents", alias_name="sum_price_cents"),
            Count(alias_name="n_items")).to_pandas()
    fin["sum_price_cents"] = fin["sum_price_cents"].astype(np.int64)
    fin["n_items"] = fin["n_items"].astype(np.int64)
    vals = ["sum_price_cents", "n_items"]
    by_flag = fin.groupby("l_returnflag", as_index=False)[vals].sum()
    by_flag["l_linestatus"] = "ALL"
    by_status = fin.groupby("l_linestatus", as_index=False)[vals].sum()
    by_status["l_returnflag"] = "ALL"
    total = pd.DataFrame({
        "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
        "sum_price_cents": [fin["sum_price_cents"].sum()],
        "n_items": [fin["n_items"].sum()],
    })
    cols = ["l_returnflag", "l_linestatus", "sum_price_cents", "n_items"]
    return pd.concat([fin[cols], by_flag[cols], by_status[cols],
                      total[cols]], ignore_index=True)


def cust_orders_full_join(sf_dir: str, segment: str = "BUILDING",
                          priority: str = "1-URGENT"):
    """(custkey, is_building, n_urgent) — FULL OUTER join of two
    filtered key sets (segment customers ⟗ urgent-order counts): rows
    survive when EITHER side matches, missing sides zero-fill. Closes
    the join matrix (inner/broadcast/left/anti/semi/asof/range + this).

    Shape: identical single tag-and-union exchange as the left join —
    outer-ness is purely a per-bucket property (emit keys seen on
    either side), so full outer costs exactly what inner does. The
    orders side pre-reduces to per-batch (custkey, count) partials."""
    from ..stages.grouped import bucketed_group_map

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_orderpriority"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].filter(
            pc.equal(batch["c_mktsegment"], segment))
        n = len(keys)
        return pa.table({
            "key": keys,
            "n": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_cust": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def order_partials(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].filter(
            pc.equal(batch["o_orderpriority"], priority)) \
            .to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(ck, return_counts=True)
        return pa.table({
            "key": pa.array(uniq, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "is_cust": pa.array(np.zeros(len(uniq), np.int8), pa.int8()),
        })

    tagged = cust.map_batches(cust_rows, batch_format="pyarrow") \
        .union(orders.map_batches(order_partials, batch_format="pyarrow"))

    def outer_merge(df: pd.DataFrame) -> pa.Table:
        isc = df["is_cust"].to_numpy(np.int8) == 1
        ckeys = df.loc[isc, "key"].drop_duplicates()
        o = df.loc[~isc].groupby("key", as_index=False)["n"].sum()
        j = pd.DataFrame({"key": ckeys, "is_building": 1}) \
            .merge(o, on="key", how="outer").fillna(0)
        return pa.table({
            "custkey": pa.array(j["key"].to_numpy(np.int64), pa.int64()),
            "is_building": pa.array(j["is_building"].to_numpy(np.int64),
                                    pa.int64()),
            "n_urgent": pa.array(j["n"].to_numpy(np.int64), pa.int64()),
        })

    return bucketed_group_map(tagged, "key", outer_merge, num_buckets=8)


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA",
                             date_from: str = "1996-01-01",
                             date_to: str = "1997-01-01"):
    """(n_name, revenue_scaled) — the TPC-H Q5 shape: region ⋈ nation ⋈
    supplier ⋈ customer ⋈ orders ⋈ lineitem where the customer and the
    supplier must share a nation ("local supplier volume").

    Distributed plan (2 exchanges, never more, regardless of scale):
      1. region⋈nation resolved on the driver (≤ dozens of rows);
         supplier restricted to region nations becomes a broadcast
         suppkey→nationkey map (supplier is ~1000× smaller than
         lineitem in TPC-H; an int32 pair per supplier stays
         broadcastable far past 100 TB of fact data).
      2. Exchange 1 on custkey: in-region customer (custkey, nat) rows
         meet date-filtered order (custkey, orderkey) rows in one
         tag-and-union hash shuffle → (orderkey, c_nat).
      3. Exchange 2 on orderkey: those rows meet lineitem partials —
         revenue pre-aggregated per (orderkey, s_nat) inside each map
         batch, so the exchange carries partials, not line items.
         In-bucket join keeps rows with c_nat == s_nat and emits one
         (nat, rev) partial per bucket; the driver reduces ≤
         buckets × nations rows.

    revenue_scaled = Σ price_cents · (100 − disc_pct): exact int64,
    accumulation-order-free on both sides of the oracle."""
    import pyarrow.parquet as pq_
    import ray as _ray

    from ..stages.grouped import bucketed_group_map

    lo = np.datetime64(date_from, "us").astype(np.int64)
    hi = np.datetime64(date_to, "us").astype(np.int64)

    reg = pq_.read_table(f"{sf_dir}/region.parquet")
    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"][0].as_py()
    nat_in = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    nat_keys = np.sort(nat_in["n_nationkey"].to_numpy())
    nat_names = {int(k): n for k, n in zip(nat_in["n_nationkey"].to_pylist(),
                                           nat_in["n_name"].to_pylist())}

    supp = pq_.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    snat = supp["s_nationkey"].to_numpy()
    pos = np.searchsorted(nat_keys, snat)
    pos[pos >= len(nat_keys)] = 0
    m = nat_keys[pos] == snat if len(nat_keys) else np.zeros(len(snat), bool)
    sk = supp["s_suppkey"].to_numpy()[m]
    order = np.argsort(sk)
    supp_ref = _ray.put((sk[order], snat[m][order].astype(np.int64)))
    natk_ref = _ray.put(nat_keys)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        nk = _ray.get(natk_ref)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.searchsorted(nk, cn)
        p[p >= len(nk)] = 0
        sel = nk[p] == cn if len(nk) else np.zeros(len(cn), bool)
        n = int(sel.sum())
        return pa.table({
            "key": batch["c_custkey"].filter(pa.array(sel)),
            "nat": pa.array(cn[sel], pa.int64()),
            "okey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_cust": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (od >= lo) & (od < hi)
        n = int(sel.sum())
        msk = pa.array(sel)
        return pa.table({
            "key": batch["o_custkey"].filter(msk),
            "nat": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "okey": batch["o_orderkey"].filter(msk),
            "is_cust": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged1 = cust.map_batches(cust_rows, batch_format="pyarrow") \
        .union(orders.map_batches(order_rows, batch_format="pyarrow"))

    def join_cust(df: pd.DataFrame) -> pa.Table:
        isc = df["is_cust"].to_numpy(np.int8) == 1
        c = df.loc[isc, ["key", "nat"]].drop_duplicates("key")
        o = df.loc[~isc, ["key", "okey"]]
        j = o.merge(c, on="key", how="inner")
        return pa.table({
            "key": pa.array(j["okey"].to_numpy(np.int64), pa.int64()),
            "nat": pa.array(j["nat"].to_numpy(np.int64), pa.int64()),
            "rev": pa.array(np.zeros(len(j), np.int64), pa.int64()),
            "is_ord": pa.array(np.ones(len(j), np.int8), pa.int8()),
        })

    ord_nat = bucketed_group_map(tagged1, "key", join_cust, num_buckets=16)

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_partials(batch: pa.Table) -> pa.Table:
        skeys, snats = _ray.get(supp_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        p = np.searchsorted(skeys, lsk)
        p[p >= len(skeys)] = 0
        sel = skeys[p] == lsk if len(skeys) else np.zeros(len(lsk), bool)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)[sel]
        s_nat = snats[p[sel]]
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[sel] * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False)[sel] * 100).astype(np.int64)
        rev = cents * (100 - disc)
        # partial per (orderkey, s_nat): the composite packing needs
        # the GLOBAL nationkey domain < 32 (TPC-H has 25; guard it so
        # a wider fixture fails loudly instead of aliasing order keys)
        if len(s_nat) and int(s_nat.max()) >= 32:
            raise ValueError("nationkey >= 32 breaks the okey*32+nat "
                             "packing; widen the composite base")
        comp = okey * 32 + s_nat
        order_ = np.argsort(comp, kind="stable")
        comp_s, rev_s = comp[order_], rev[order_]
        first = np.empty(len(comp_s), dtype=bool)
        if len(comp_s):
            first[0] = True
            first[1:] = comp_s[1:] != comp_s[:-1]
        starts = np.flatnonzero(first)
        psum = np.add.reduceat(rev_s, starts) if len(starts) else \
            np.array([], np.int64)
        ck = comp_s[starts] if len(starts) else np.array([], np.int64)
        return pa.table({
            "key": pa.array(ck // 32, pa.int64()),
            "nat": pa.array(ck % 32, pa.int64()),
            "rev": pa.array(psum, pa.int64()),
            "is_ord": pa.array(np.zeros(len(ck), np.int8), pa.int8()),
        })

    tagged2 = ord_nat.union(
        lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def join_local(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "nat"]].drop_duplicates("key") \
            .rename(columns={"nat": "c_nat"})
        li = df.loc[~iso, ["key", "nat", "rev"]]
        j = li.merge(o, on="key", how="inner")
        j = j.loc[j["nat"].to_numpy() == j["c_nat"].to_numpy()]
        g = j.groupby("nat", as_index=False)["rev"].sum()
        return pa.table({
            "nat": pa.array(g["nat"].to_numpy(np.int64), pa.int64()),
            "rev": pa.array(g["rev"].to_numpy(np.int64), pa.int64()),
        })

    part = bucketed_group_map(tagged2, "key", join_local, num_buckets=16) \
        .to_pandas()  # ≤ buckets × nations rows
    g = part.groupby("nat", as_index=False)["rev"].sum() \
        .sort_values("rev", ascending=False)
    return pd.DataFrame({
        "n_name": [nat_names[int(k)] for k in g["nat"]],
        "revenue_scaled": g["rev"].to_numpy(np.int64),
    }).reset_index(drop=True)


def orders_monthly_stats(sf_dir: str):
    """(month, n_orders, sum_price_cents) — calendar-month resample of
    the orders table: CALENDAR bucketing (variable-length months via
    datetime64[M] truncation, matching SQL date_trunc), distinct from
    the engine's fixed-width epoch windows (events_windowed). Map-side
    partials per (batch, month) make the exchange month-cardinality-
    sized; exact integer cents."""
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        months = ts.astype("datetime64[M]").astype(str)  # "YYYY-MM"
        cents = np.round(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"month": months, "cents": cents})
        g = df.groupby("month", as_index=False).agg(
            n=("cents", "size"), s=("cents", "sum"))
        return pa.table({
            "month": pa.array(g["month"].to_numpy(object), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(g["s"].to_numpy(np.int64), pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("month").aggregate(Sum("n", alias_name="n_orders"),
                                    Sum("s", alias_name="sum_price_cents"))
    return out.map_batches(
        lambda b: pa.table({
            "month": b["month"],
            "n_orders": pc.cast(b["n_orders"], pa.int64()),
            "sum_price_cents": pc.cast(b["sum_price_cents"], pa.int64())}),
        batch_format="pyarrow")


def q6_forecast_revenue(sf_dir: str, date_from: str = "1996-01-01",
                        date_to: str = "1997-01-01"):
    """(revenue_scaled,) — TPC-H Q6: the canonical scan-filter-aggregate
    (shipdate window, discount band, quantity cap → Σ price·discount).
    Pure map-combine: the date window pushes into the parquet read as
    a filter expression (row-group pruning), the remaining predicates
    and the exact int64 partial sum are vectorized per batch, and ONE
    number per block crosses the wire."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    lo = np.datetime64(date_from, "us")
    hi = np.datetime64(date_to, "us")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)))

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        sel = (qty < 24) & (disc >= 5) & (disc <= 7)
        rev = int((cents[sel] * disc[sel]).sum())
        return pa.table({"rev": pa.array([rev], pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("rev", alias_name="revenue_scaled"))
    import pandas as pd
    return pd.DataFrame({"revenue_scaled":
                         [np.int64(out["revenue_scaled"])]})


def q10_returned_revenue(sf_dir: str, date_from: str = "1996-01-01",
                         date_to: str = "1996-07-01", k: int = 20):
    """(c_custkey, c_name, revenue_scaled) — TPC-H Q10: top-k customers
    by revenue lost to returns (returnflag = 'R') in a quarter-ish
    window. Same 2-exchange discipline as Q5: orders in the window ship
    (custkey, orderkey) through exchange 1 keyed on orderkey to meet
    per-(orderkey) lineitem revenue partials (map-side combined,
    'R'-filtered); exchange 2 keys the (custkey, rev) partials on
    custkey to meet the (broadcast-free) customer rows; per-bucket
    top-k then a tiny driver merge."""
    import pyarrow.parquet as pq_

    from ..stages.grouped import bucketed_group_map

    lo = np.datetime64(date_from, "us").astype(np.int64)
    hi = np.datetime64(date_to, "us").astype(np.int64)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = (od >= lo) & (od < hi)
        msk = pa.array(sel)
        n = int(sel.sum())
        return pa.table({
            "key": batch["o_orderkey"].filter(msk),
            "cust": batch["o_custkey"].filter(msk),
            "rev": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_ord": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])

    def li_partials(batch: pa.Table) -> pa.Table:
        sel = pc.equal(batch["l_returnflag"], "R").to_numpy(
            zero_copy_only=False)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)[sel]
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[sel] * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False)[sel] * 100).astype(np.int64)
        rev = cents * (100 - disc)
        order = np.argsort(okey, kind="stable")
        ok_s, rev_s = okey[order], rev[order]
        first = np.r_[True, ok_s[1:] != ok_s[:-1]] if len(ok_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        psum = np.add.reduceat(rev_s, starts) if len(starts) else \
            np.array([], np.int64)
        n = len(starts)
        return pa.table({
            "key": pa.array(ok_s[starts] if n else np.array([], np.int64),
                            pa.int64()),
            "cust": pa.array(np.zeros(n, np.int64), pa.int64()),
            "rev": pa.array(psum, pa.int64()),
            "is_ord": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged1 = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def join_orders(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "cust"]].drop_duplicates("key")
        li = df.loc[~iso].groupby("key", as_index=False)["rev"].sum()
        j = o.merge(li, on="key", how="inner")
        g = j.groupby("cust", as_index=False)["rev"].sum()
        return pa.table({
            "cust": pa.array(g["cust"].to_numpy(np.int64), pa.int64()),
            "rev": pa.array(g["rev"].to_numpy(np.int64), pa.int64()),
        })

    cust_rev = bucketed_group_map(tagged1, "key", join_orders,
                                  num_buckets=16)

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cust": batch["c_custkey"].cast(pa.int64()),
            "rev": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
            "c_name": batch["c_name"],
        })

    def rev_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cust": batch["cust"],
            "rev": batch["rev"],
            "c_name": pa.array([""] * batch.num_rows, pa.string()),
        })

    tagged2 = cust.map_batches(cust_rows, batch_format="pyarrow") \
        .union(cust_rev.map_batches(rev_rows, batch_format="pyarrow"))

    def bucket_topk(df: pd.DataFrame) -> pa.Table:
        isc = df["c_name"].to_numpy() != ""
        c = df.loc[isc, ["cust", "c_name"]].drop_duplicates("cust")
        r = df.loc[~isc].groupby("cust", as_index=False)["rev"].sum()
        j = r.merge(c, on="cust", how="inner")
        j = j.sort_values(["rev", "cust"], ascending=[False, True]).head(k)
        return pa.table({
            "c_custkey": pa.array(j["cust"].to_numpy(np.int64), pa.int64()),
            "c_name": pa.array(j["c_name"].to_numpy(object), pa.string()),
            "revenue_scaled": pa.array(j["rev"].to_numpy(np.int64),
                                       pa.int64()),
        })

    cand = bucketed_group_map(tagged2, "cust", bucket_topk,
                              num_buckets=8).to_pandas()
    cand = cand.sort_values(["revenue_scaled", "c_custkey"],
                            ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


def q13_order_count_distribution(sf_dir: str):
    """(c_count, custdist) — TPC-H Q13: the distribution of per-customer
    order counts INCLUDING zero-order customers (the left-join-then-
    histogram shape). One custkey exchange: customer id rows meet
    per-batch order-count partials; buckets emit per-customer counts
    (zero-filled), and the count-of-counts is a domain-sized final
    aggregate."""
    from ray.data.aggregate import Count

    from ..stages.grouped import bucketed_group_map

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["c_custkey"].cast(pa.int64()),
            "n": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_cust": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def order_partials(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(ck, return_counts=True)
        return pa.table({
            "key": pa.array(uniq, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "is_cust": pa.array(np.zeros(len(uniq), np.int8), pa.int8()),
        })

    tagged = cust.map_batches(cust_rows, batch_format="pyarrow") \
        .union(orders.map_batches(order_partials, batch_format="pyarrow"))

    def per_cust(df: pd.DataFrame) -> pa.Table:
        isc = df["is_cust"].to_numpy(np.int8) == 1
        c = df.loc[isc, ["key"]].drop_duplicates()
        o = df.loc[~isc].groupby("key", as_index=False)["n"].sum()
        j = c.merge(o, on="key", how="left").fillna(0)
        uniq, cnt = np.unique(j["n"].to_numpy(np.int64),
                              return_counts=True)
        return pa.table({
            "c_count": pa.array(uniq, pa.int64()),
            "d": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    part = bucketed_group_map(tagged, "key", per_cust, num_buckets=16)
    from ray.data.aggregate import Sum
    out = part.groupby("c_count").aggregate(Sum("d", alias_name="custdist"))
    return out.map_batches(
        lambda b: pa.table({
            "c_count": pc.cast(b["c_count"], pa.int64()),
            "custdist": pc.cast(b["custdist"], pa.int64())}),
        batch_format="pyarrow")


def q4_order_priority_check(sf_dir: str, date_from: str = "1996-01-01",
                            date_to: str = "1996-04-01", late_days: int = 90):
    """(o_orderpriority, order_count) — TPC-H Q4 shape: count orders in
    a window having AT LEAST ONE late lineitem (adapted predicate:
    shipped more than `late_days` after the order date, since the
    driver lineitem has no commit/receipt dates — the EXISTS semi-join
    is the thing being exercised). One orderkey exchange: window-order
    headers meet per-batch DISTINCT lineitem (orderkey, shipdate-max)
    partials; the bucket evaluates EXISTS vectorized, and the final
    priority aggregate is domain-sized."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    lo = np.datetime64(date_from, "us").astype(np.int64)
    hi = np.datetime64(date_to, "us").astype(np.int64)
    late_us = late_days * 86_400_000_000

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = (od >= lo) & (od < hi)
        msk = pa.array(sel)
        return pa.table({
            "key": batch["o_orderkey"].filter(msk),
            "ts": pa.array(od[sel], pa.int64()),
            "prio": batch["o_orderpriority"].filter(msk),
            "is_ord": pa.array(np.ones(int(sel.sum()), np.int8), pa.int8()),
        })

    lineitem = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                     columns=["l_orderkey", "l_shipdate"])

    def li_partials(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(okey, kind="stable")
        ok_s, sd_s = okey[order], sd[order]
        first = np.r_[True, ok_s[1:] != ok_s[:-1]] if len(ok_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        mx = np.maximum.reduceat(sd_s, starts) if len(starts) else \
            np.array([], np.int64)
        n = len(starts)
        return pa.table({
            "key": pa.array(ok_s[starts] if n else np.array([], np.int64),
                            pa.int64()),
            "ts": pa.array(mx, pa.int64()),
            "prio": pa.array([""] * n, pa.string()),
            "is_ord": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def exists_check(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "ts", "prio"]].drop_duplicates("key")
        li = df.loc[~iso].groupby("key", as_index=False)["ts"].max() \
            .rename(columns={"ts": "ship_max"})
        j = o.merge(li, on="key", how="inner")
        late = j["ship_max"].to_numpy(np.int64) > \
            j["ts"].to_numpy(np.int64) + late_us
        g = j.loc[late].groupby("prio", as_index=False).size()
        return pa.table({
            "o_orderpriority": pa.array(g["prio"].to_numpy(object),
                                        pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
        })

    part = bucketed_group_map(tagged, "key", exists_check, num_buckets=16)
    out = part.groupby("o_orderpriority").aggregate(
        Sum("n", alias_name="order_count"))
    return out.map_batches(
        lambda b: pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "order_count": pc.cast(b["order_count"], pa.int64())}),
        batch_format="pyarrow")


def q14_promo_revenue_share(sf_dir: str, date_from: str = "1996-01-01",
                            date_to: str = "1996-02-01"):
    """(promo_scaled, total_scaled) — TPC-H Q14: the promo share of a
    month's revenue as an exact int64 rational (share = promo/total;
    the float percentage is the caller's division). The part table's
    (partkey → is_promo) map broadcasts once (1 bit + key per part —
    TPC-H part is 5× smaller than orders, broadcastable to very large
    SF; past that it becomes a partkey exchange like Q5's supplier
    note); lineitem does one map-combine pass, ONE pair of numbers per
    block crosses the wire."""
    import pyarrow.parquet as pq_
    import pyarrow.dataset as pads
    import ray as _ray
    from ray.data.aggregate import Sum

    lo = np.datetime64(date_from, "us")
    hi = np.datetime64(date_to, "us")

    part = pq_.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy()
    promo = pc.equal(part["p_type"], "PROMO").to_numpy(zero_copy_only=False)
    order = np.argsort(pk)
    pref = _ray.put((pk[order], promo[order]))

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)))

    def partials(batch: pa.Table) -> pa.Table:
        keys, isp = _ray.get(pref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, lpk)
        pos[pos >= len(keys)] = 0
        hit = keys[pos] == lpk if len(keys) else np.zeros(len(lpk), bool)
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - disc)
        rev = rev[hit]
        is_promo = isp[pos[hit]]
        return pa.table({
            "p": pa.array([int(rev[is_promo].sum())], pa.int64()),
            "t": pa.array([int(rev.sum())], pa.int64()),
        })

    out = ds.map_batches(partials, batch_format="pyarrow") \
        .aggregate(Sum("p", alias_name="promo_scaled"),
                   Sum("t", alias_name="total_scaled"))
    return pd.DataFrame({
        "promo_scaled": [np.int64(out["promo_scaled"])],
        "total_scaled": [np.int64(out["total_scaled"])],
    })


def q18_large_volume_orders(sf_dir: str, min_qty: int = 300, k: int = 20):
    """(o_orderkey, o_custkey, total_qty) — TPC-H Q18: orders whose
    total lineitem quantity exceeds `min_qty` (the HAVING-over-join
    shape), top-k by quantity. One orderkey exchange of map-side
    quantity partials joined to order headers in-bucket; only
    above-threshold rows (output-scale) survive to the per-bucket
    top-k + driver merge."""
    from ..stages.grouped import bucketed_group_map

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["o_orderkey"].cast(pa.int64()),
            "cust": batch["o_custkey"].cast(pa.int64()),
            "qty": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_ord": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    lineitem = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                     columns=["l_orderkey", "l_quantity"])

    def li_partials(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(okey, kind="stable")
        ok_s, q_s = okey[order], qty[order]
        first = np.r_[True, ok_s[1:] != ok_s[:-1]] if len(ok_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        psum = np.add.reduceat(q_s, starts) if len(starts) else \
            np.array([], np.int64)
        n = len(starts)
        return pa.table({
            "key": pa.array(ok_s[starts] if n else np.array([], np.int64),
                            pa.int64()),
            "cust": pa.array(np.zeros(n, np.int64), pa.int64()),
            "qty": pa.array(psum, pa.int64()),
            "is_ord": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def having_topk(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "cust"]].drop_duplicates("key")
        q = df.loc[~iso].groupby("key", as_index=False)["qty"].sum()
        q = q.loc[q["qty"].to_numpy() > min_qty]
        j = q.merge(o, on="key", how="inner")
        j = j.sort_values(["qty", "key"], ascending=[False, True]).head(k)
        return pa.table({
            "o_orderkey": pa.array(j["key"].to_numpy(np.int64), pa.int64()),
            "o_custkey": pa.array(j["cust"].to_numpy(np.int64), pa.int64()),
            "total_qty": pa.array(j["qty"].to_numpy(np.int64), pa.int64()),
        })

    cand = bucketed_group_map(tagged, "key", having_topk,
                              num_buckets=16).to_pandas()
    cand = cand.sort_values(["total_qty", "o_orderkey"],
                            ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


def q22_global_sales_opportunity(sf_dir: str):
    """(c_nationkey, n_cust, sum_acctbal_cents) — TPC-H Q22 shape:
    customers with ABOVE-AVERAGE positive account balance and no
    URGENT order (the driver fixtures give every customer at least
    one order, so the classic never-ordered predicate is degenerate —
    the anti-join is the thing being exercised, so it anti-joins the
    urgent slice instead). Three patterns in one query: the scalar-
    subquery average (one tiny global aggregate, broadcast as two
    int64s — exact rational threshold, no float compare drift), the
    anti-join (one custkey exchange with map-side order-key dedup),
    and the final domain-sized aggregate."""
    from ray.data.aggregate import Count, Sum

    from ..stages.grouped import bucketed_group_map

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    # scalar subquery: avg(c_acctbal) over positive balances, exact
    # rational (sum_cents, n) so the comparison is integer both sides
    def bal_partials(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        pos = cents > 0
        return pa.table({"s": pa.array([int(cents[pos].sum())], pa.int64()),
                         "n": pa.array([int(pos.sum())], pa.int64())})

    agg = cust.map_batches(bal_partials, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    thr_s, thr_n = int(agg["s"]), int(agg["n"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        # cents > avg  ⇔  cents * n > sum (exact integer compare)
        sel = cents * thr_n > thr_s
        msk = pa.array(sel)
        return pa.table({
            "key": batch["c_custkey"].filter(msk),
            "nat": pc.cast(batch["c_nationkey"].filter(msk), pa.int64()),
            "bal": pa.array(cents[sel], pa.int64()),
            "is_cust": pa.array(np.ones(int(sel.sum()), np.int8), pa.int8()),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"])

    def order_keys(batch: pa.Table) -> pa.Table:
        urgent = pc.equal(batch["o_orderpriority"], "1-URGENT")
        uniq = np.unique(batch.filter(urgent)["o_custkey"]
                         .to_numpy(zero_copy_only=False))
        n = len(uniq)
        return pa.table({
            "key": pa.array(uniq, pa.int64()),
            "nat": pa.array(np.zeros(n, np.int64), pa.int64()),
            "bal": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_cust": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged = cust.map_batches(cust_rows, batch_format="pyarrow") \
        .union(orders.map_batches(order_keys, batch_format="pyarrow"))

    def anti(df: pd.DataFrame) -> pa.Table:
        isc = df["is_cust"].to_numpy(np.int8) == 1
        have = np.unique(df.loc[~isc, "key"].to_numpy(np.int64))
        c = df.loc[isc]
        keep = ~np.isin(c["key"].to_numpy(np.int64), have,
                        assume_unique=False)
        g = c.loc[keep].groupby("nat", as_index=False).agg(
            n_cust=("key", "size"), s=("bal", "sum"))
        return pa.table({
            "c_nationkey": pa.array(g["nat"].to_numpy(np.int64), pa.int64()),
            "n_cust": pa.array(g["n_cust"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(g["s"].to_numpy(np.int64), pa.int64()),
        })

    part = bucketed_group_map(tagged, "key", anti, num_buckets=16)
    out = part.groupby("c_nationkey").aggregate(
        Sum("n_cust", alias_name="n_cust"),
        Sum("s", alias_name="sum_acctbal_cents"))
    return out.map_batches(
        lambda b: pa.table({
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "n_cust": pc.cast(b["n_cust"], pa.int64()),
            "sum_acctbal_cents": pc.cast(b["sum_acctbal_cents"],
                                         pa.int64())}),
        batch_format="pyarrow")


def q17_small_quantity_revenue(sf_dir: str):
    """(n_rows, sum_price_cents) — TPC-H Q17 shape: lineitems whose
    quantity is below 20% of their PART's average quantity (the
    per-group correlated scalar subquery — each row compares against
    ITS OWN group's aggregate, vs Q22's single global scalar). One
    partkey exchange: per-batch (partkey, qty-sum, n) partials meet
    full lineitem rows; the in-bucket compare is the exact integer
    cross-multiplication 5·qty·n < Σqty (no division, no float), and
    only the tiny global (count, cents) pair leaves each bucket."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def li_rows(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        n = batch.num_rows
        return pa.table({
            "key": batch["l_partkey"].cast(pa.int64()),
            "qty": pa.array(qty, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "cnt": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_row": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def li_partials(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(pk, kind="stable")
        pk_s, q_s = pk[order], qty[order]
        first = np.r_[True, pk_s[1:] != pk_s[:-1]] if len(pk_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        qsum = np.add.reduceat(q_s, starts) if len(starts) else \
            np.array([], np.int64)
        cnt = np.diff(np.append(starts, len(pk_s))).astype(np.int64)
        n = len(starts)
        return pa.table({
            "key": pa.array(pk_s[starts] if n else np.array([], np.int64),
                            pa.int64()),
            "qty": pa.array(qsum, pa.int64()),
            "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "is_row": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged = lineitem.map_batches(li_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def threshold(df: pd.DataFrame) -> pa.Table:
        isr = df["is_row"].to_numpy(np.int8) == 1
        agg = df.loc[~isr].groupby("key", as_index=False) \
            .agg(qs=("qty", "sum"), n=("cnt", "sum"))
        rows = df.loc[isr, ["key", "qty", "cents"]]
        j = rows.merge(agg, on="key", how="inner")
        # qty < 0.2 * (qs / n)  ⇔  5·qty·n < qs  (exact integers)
        sel = 5 * j["qty"].to_numpy(np.int64) * j["n"].to_numpy(np.int64) \
            < j["qs"].to_numpy(np.int64)
        return pa.table({
            "n_rows": pa.array([int(sel.sum())], pa.int64()),
            "cents": pa.array([int(j["cents"].to_numpy(np.int64)[sel]
                                   .sum())], pa.int64()),
        })

    part = bucketed_group_map(tagged, "key", threshold, num_buckets=16)
    out = part.aggregate(Sum("n_rows", alias_name="n_rows"),
                         Sum("cents", alias_name="sum_price_cents"))
    return pd.DataFrame({
        "n_rows": [np.int64(out["n_rows"])],
        "sum_price_cents": [np.int64(out["sum_price_cents"])],
    })


def q15_top_supplier(sf_dir: str, date_from: str = "1996-01-01",
                     date_to: str = "1996-04-01"):
    """(l_suppkey, revenue_scaled) — TPC-H Q15: the supplier(s) with
    MAXIMUM revenue in a window — global argmax WITH TIES (the
    view-then-filter-equal-max shape, distinct from LIMIT-k top-k):
    per-supplier revenue partials reduce through one suppkey groupby,
    the global max is one tiny aggregate, and the equality filter is
    map-only over the (supplier-cardinality) revenue table."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Max, Sum

    lo = np.datetime64(date_from, "us")
    hi = np.datetime64(date_to, "us")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)))

    def partials(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - disc)
        order = np.argsort(sk, kind="stable")
        sk_s, rev_s = sk[order], rev[order]
        first = np.r_[True, sk_s[1:] != sk_s[:-1]] if len(sk_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        psum = np.add.reduceat(rev_s, starts) if len(starts) else \
            np.array([], np.int64)
        return pa.table({
            "l_suppkey": pa.array(sk_s[starts] if len(starts) else
                                  np.array([], np.int64), pa.int64()),
            "rev": pa.array(psum, pa.int64()),
        })

    rev = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(Sum("rev", alias_name="rev")) \
        .materialize()  # supplier-cardinality table, consumed twice
    mx = int(rev.aggregate(Max("rev", alias_name="m"))["m"])

    def keep_max(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["rev"], mx)
        return pa.table({
            "l_suppkey": batch["l_suppkey"].filter(m).cast(pa.int64()),
            "revenue_scaled": pc.cast(batch["rev"].filter(m), pa.int64()),
        })

    return rev.map_batches(keep_max, batch_format="pyarrow")


def q9_product_profit(sf_dir: str):
    """(n_name, o_year, profit_scaled) — TPC-H Q9 shape: profit
    (revenue, cost terms absent from the driver schema) grouped by the
    SUPPLIER's nation and the ORDER's year — a group key assembled
    from two different joined dimensions. supplier→nation broadcasts
    (the Q5 map); the order year reaches lineitem partials through ONE
    orderkey tag-and-union; the final aggregate is
    |nations|·|years|-sized."""
    import pyarrow.parquet as pq_
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    nat_names = {int(k): n for k, n in zip(
        nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())}
    supp = pq_.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy()
    order_ = np.argsort(sk)
    supp_ref = _ray.put((sk[order_],
                         supp["s_nationkey"].to_numpy()[order_]
                         .astype(np.int64)))

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        year = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        n = batch.num_rows
        return pa.table({
            "key": batch["o_orderkey"].cast(pa.int64()),
            "grp": pa.array(year, pa.int64()),   # year on order rows
            "rev": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_ord": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def li_partials(batch: pa.Table) -> pa.Table:
        skeys, snats = _ray.get(supp_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        p = np.searchsorted(skeys, lsk)
        p[p >= len(skeys)] = 0
        nat_ = snats[p]
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - disc)
        comp = okey * 32 + nat_
        order2 = np.argsort(comp, kind="stable")
        c_s, r_s = comp[order2], rev[order2]
        first = np.r_[True, c_s[1:] != c_s[:-1]] if len(c_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        psum = np.add.reduceat(r_s, starts) if len(starts) else \
            np.array([], np.int64)
        ck = c_s[starts] if len(starts) else np.array([], np.int64)
        return pa.table({
            "key": pa.array(ck // 32, pa.int64()),
            "grp": pa.array(ck % 32, pa.int64()),  # nation on li rows
            "rev": pa.array(psum, pa.int64()),
            "is_ord": pa.array(np.zeros(len(ck), np.int8), pa.int8()),
        })

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def join_year(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "grp"]].drop_duplicates("key") \
            .rename(columns={"grp": "year"})
        li = df.loc[~iso, ["key", "grp", "rev"]] \
            .rename(columns={"grp": "nat"})
        j = li.merge(o, on="key", how="inner")
        g = j.groupby(["nat", "year"], as_index=False)["rev"].sum()
        return pa.table({
            "nat": pa.array(g["nat"].to_numpy(np.int64), pa.int64()),
            "year": pa.array(g["year"].to_numpy(np.int64), pa.int64()),
            "rev": pa.array(g["rev"].to_numpy(np.int64), pa.int64()),
        })

    part = bucketed_group_map(tagged, "key", join_year, num_buckets=16) \
        .to_pandas()
    g = part.groupby(["nat", "year"], as_index=False)["rev"].sum()
    return pd.DataFrame({
        "n_name": [nat_names[int(k)] for k in g["nat"]],
        "o_year": g["year"].to_numpy(np.int64),
        "profit_scaled": g["rev"].to_numpy(np.int64),
    })


def q19_disjunctive_revenue(sf_dir: str):
    """(n_rows, revenue_scaled) — TPC-H Q19 shape: revenue under an
    OR-of-conjunctions predicate spanning BOTH sides of a broadcast
    join ((brand, size) from part × quantity from lineitem): the
    disjunctive multi-clause filter that defeats simple pushdown —
    each clause is evaluated vectorized against the broadcast part
    attributes inside the map, no shuffle at all."""
    import pyarrow.parquet as pq_
    import ray as _ray
    from ray.data.aggregate import Sum

    part = pq_.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy()
    order_ = np.argsort(pk)
    brands = part["p_brand"].to_numpy(zero_copy_only=False)[order_]
    sizes = part["p_size"].to_numpy()[order_].astype(np.int64)
    pref = _ray.put((pk[order_], brands, sizes))

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def partials(batch: pa.Table) -> pa.Table:
        keys, br, sz = _ray.get(pref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        p = np.searchsorted(keys, lpk)
        p[p >= len(keys)] = 0
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = br[p]
        s = sz[p]
        clause1 = (b == "Brand#1") & (s <= 10) & (qty < 20)
        clause2 = (b == "Brand#2") & (s <= 25) & (qty < 30)
        sel = clause1 | clause2
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - disc)
        return pa.table({
            "n": pa.array([int(sel.sum())], pa.int64()),
            "r": pa.array([int(rev[sel].sum())], pa.int64()),
        })

    out = ds.map_batches(partials, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n_rows"),
                   Sum("r", alias_name="revenue_scaled"))
    return pd.DataFrame({
        "n_rows": [np.int64(out["n_rows"])],
        "revenue_scaled": [np.int64(out["revenue_scaled"])],
    })


def q7_nation_volume(sf_dir: str, date_from: str = "1996-01-01",
                     date_to: str = "1997-01-01"):
    """(cust_nation, supp_nation, revenue_scaled) — TPC-H Q7 shape:
    shipping volume grouped by the PAIR (customer nation, supplier
    nation), cust_nation != supp_nation — the group key spans both
    sides of the order⋈lineitem join (Q5 filters the pair to equality;
    this keeps the full cross matrix). Same two-exchange plan as Q5
    with the in-bucket equality filter replaced by pair grouping; the
    final aggregate is |nations|²-sized."""
    import pyarrow.parquet as pq_
    import ray as _ray

    from ..stages.grouped import bucketed_group_map

    lo = np.datetime64(date_from, "us").astype(np.int64)
    hi = np.datetime64(date_to, "us").astype(np.int64)

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    nat_names = {int(k): n for k, n in zip(
        nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())}
    supp = pq_.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy()
    order_ = np.argsort(sk)
    supp_ref = _ray.put((sk[order_],
                         supp["s_nationkey"].to_numpy()[order_]
                         .astype(np.int64)))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["c_custkey"].cast(pa.int64()),
            "nat": pc.cast(batch["c_nationkey"], pa.int64()),
            "okey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_cust": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = (od >= lo) & (od < hi)
        msk = pa.array(sel)
        n = int(sel.sum())
        return pa.table({
            "key": batch["o_custkey"].filter(msk),
            "nat": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "okey": batch["o_orderkey"].filter(msk),
            "is_cust": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged1 = cust.map_batches(cust_rows, batch_format="pyarrow") \
        .union(orders.map_batches(order_rows, batch_format="pyarrow"))

    def join_cust(df: pd.DataFrame) -> pa.Table:
        isc = df["is_cust"].to_numpy(np.int8) == 1
        c = df.loc[isc, ["key", "nat"]].drop_duplicates("key")
        o = df.loc[~isc, ["key", "okey"]]
        j = o.merge(c, on="key", how="inner")
        return pa.table({
            "key": pa.array(j["okey"].to_numpy(np.int64), pa.int64()),
            "nat": pa.array(j["nat"].to_numpy(np.int64), pa.int64()),
            "rev": pa.array(np.zeros(len(j), np.int64), pa.int64()),
            "is_ord": pa.array(np.ones(len(j), np.int8), pa.int8()),
        })

    ord_nat = bucketed_group_map(tagged1, "key", join_cust, num_buckets=16)

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_partials(batch: pa.Table) -> pa.Table:
        skeys, snats = _ray.get(supp_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        p = np.searchsorted(skeys, lsk)
        p[p >= len(skeys)] = 0
        s_nat = snats[p]
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - disc)
        comp = okey * 32 + s_nat
        order2 = np.argsort(comp, kind="stable")
        c_s, r_s = comp[order2], rev[order2]
        first = np.r_[True, c_s[1:] != c_s[:-1]] if len(c_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        psum = np.add.reduceat(r_s, starts) if len(starts) else \
            np.array([], np.int64)
        ck = c_s[starts] if len(starts) else np.array([], np.int64)
        return pa.table({
            "key": pa.array(ck // 32, pa.int64()),
            "nat": pa.array(ck % 32, pa.int64()),
            "rev": pa.array(psum, pa.int64()),
            "is_ord": pa.array(np.zeros(len(ck), np.int8), pa.int8()),
        })

    tagged2 = ord_nat.union(
        lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def join_pair(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "nat"]].drop_duplicates("key") \
            .rename(columns={"nat": "c_nat"})
        li = df.loc[~iso, ["key", "nat", "rev"]] \
            .rename(columns={"nat": "s_nat"})
        j = li.merge(o, on="key", how="inner")
        j = j.loc[j["c_nat"].to_numpy() != j["s_nat"].to_numpy()]
        g = j.groupby(["c_nat", "s_nat"], as_index=False)["rev"].sum()
        return pa.table({
            "c_nat": pa.array(g["c_nat"].to_numpy(np.int64), pa.int64()),
            "s_nat": pa.array(g["s_nat"].to_numpy(np.int64), pa.int64()),
            "rev": pa.array(g["rev"].to_numpy(np.int64), pa.int64()),
        })

    part = bucketed_group_map(tagged2, "key", join_pair, num_buckets=16) \
        .to_pandas()  # <= buckets x nations² rows
    g = part.groupby(["c_nat", "s_nat"], as_index=False)["rev"].sum()
    return pd.DataFrame({
        "cust_nation": [nat_names[int(k)] for k in g["c_nat"]],
        "supp_nation": [nat_names[int(k)] for k in g["s_nat"]],
        "revenue_scaled": g["rev"].to_numpy(np.int64),
    })


def q8_market_share(sf_dir: str, region: str = "AMERICA",
                    nation: str = "NATION_6", p_type: str = "ECONOMY",
                    date_from: str = "1995-01-01",
                    date_to: str = "1997-01-01"):
    """(o_year, nation_revenue_scaled, total_revenue_scaled) — TPC-H Q8
    shape: the target nation's share of revenue per order year, over
    ECONOMY-part lineitems sold to customers of one region. Nation's
    classic Q8 plan needs part, supplier, customer, nation (twice),
    region, orders and lineitem; here the three small dimensions ride
    broadcasts (part membership set, supplier→is-target flag,
    nation→region for the customer filter) and the two big tables meet
    through the same two exchanges as Q5/Q7: custkey (orders pick up
    the region-qualified customer) then orderkey (lineitem partials
    pick up the order year). The share is emitted as the exact
    (numerator, denominator) int64 pair — no float division crosses
    the engine/oracle hash."""
    import pyarrow.parquet as pq_
    import ray as _ray

    from ..stages.grouped import bucketed_group_map

    lo = np.datetime64(date_from, "us").astype(np.int64)
    hi = np.datetime64(date_to, "us").astype(np.int64)

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    reg = pq_.read_table(f"{sf_dir}/region.parquet")
    reg_key = {n: int(k) for k, n in zip(
        reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())}[region]
    nat_keys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nat_region = np.full(int(nat_keys.max()) + 1, -1, np.int64)
    nat_region[nat_keys] = nat["n_regionkey"].to_numpy().astype(np.int64)
    target_nat = {n: int(k) for k, n in zip(
        nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())}[nation]

    part_t = pq_.read_table(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_type"])
    sel_pk = part_t["p_partkey"].to_numpy()[
        part_t["p_type"].to_numpy(zero_copy_only=False) == p_type]
    supp = pq_.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy()
    order_ = np.argsort(sk)
    bcast = _ray.put((np.sort(sel_pk), sk[order_],
                      supp["s_nationkey"].to_numpy()[order_]
                      .astype(np.int64) == target_nat))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = nat_region[cn] == reg_key
        msk = pa.array(sel)
        n = int(sel.sum())
        return pa.table({
            "key": batch["c_custkey"].filter(msk),
            "okey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "year": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_cust": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = (od >= lo) & (od < hi)
        msk = pa.array(sel)
        yr = (od[sel].astype("datetime64[us]").astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        return pa.table({
            "key": batch["o_custkey"].filter(msk),
            "okey": batch["o_orderkey"].filter(msk),
            "year": pa.array(yr, pa.int64()),
            "is_cust": pa.array(np.zeros(int(sel.sum()), np.int8),
                                pa.int8()),
        })

    tagged1 = cust.map_batches(cust_rows, batch_format="pyarrow") \
        .union(orders.map_batches(order_rows, batch_format="pyarrow"))

    def join_cust(df: pd.DataFrame) -> pa.Table:
        isc = df["is_cust"].to_numpy(np.int8) == 1
        c = df.loc[isc, ["key"]].drop_duplicates("key")
        o = df.loc[~isc, ["key", "okey", "year"]]
        j = o.merge(c, on="key", how="inner")
        n = len(j)
        return pa.table({
            "key": pa.array(j["okey"].to_numpy(np.int64), pa.int64()),
            "year": pa.array(j["year"].to_numpy(np.int64), pa.int64()),
            "rev_t": pa.array(np.zeros(n, np.int64), pa.int64()),
            "rev_a": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_ord": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    qual_orders = bucketed_group_map(tagged1, "key", join_cust,
                                     num_buckets=16)

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def li_partials(batch: pa.Table) -> pa.Table:
        pkeys, skeys, s_is_t = _ray.get(bcast)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        p = np.searchsorted(pkeys, lpk)
        p[p >= len(pkeys)] = 0
        sel = (pkeys[p] == lpk) if len(pkeys) else \
            np.zeros(len(lpk), bool)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)[sel]
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[sel]
        q = np.searchsorted(skeys, lsk)
        q[q >= len(skeys)] = 0
        is_t = s_is_t[q]
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[sel] * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False)[sel] * 100).astype(np.int64)
        rev = cents * (100 - disc)
        order2 = np.argsort(okey, kind="stable")
        k_s = okey[order2]
        first = np.r_[True, k_s[1:] != k_s[:-1]] if len(k_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        rev_a = np.add.reduceat(rev[order2], starts) if len(starts) \
            else np.array([], np.int64)
        rev_t = np.add.reduceat(
            np.where(is_t, rev, 0)[order2], starts) if len(starts) \
            else np.array([], np.int64)
        ck = k_s[starts] if len(starts) else np.array([], np.int64)
        n = len(ck)
        return pa.table({
            "key": pa.array(ck, pa.int64()),
            "year": pa.array(np.zeros(n, np.int64), pa.int64()),
            "rev_t": pa.array(rev_t, pa.int64()),
            "rev_a": pa.array(rev_a, pa.int64()),
            "is_ord": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged2 = qual_orders.union(
        lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def join_year(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "year"]].drop_duplicates("key")
        li = df.loc[~iso, ["key", "rev_t", "rev_a"]]
        j = li.merge(o, on="key", how="inner")
        g = j.groupby("year", as_index=False)[["rev_t", "rev_a"]].sum()
        return pa.table({
            "year": pa.array(g["year"].to_numpy(np.int64), pa.int64()),
            "rev_t": pa.array(g["rev_t"].to_numpy(np.int64), pa.int64()),
            "rev_a": pa.array(g["rev_a"].to_numpy(np.int64), pa.int64()),
        })

    part = bucketed_group_map(tagged2, "key", join_year, num_buckets=16) \
        .to_pandas()  # <= buckets x years rows
    g = part.groupby("year", as_index=False)[["rev_t", "rev_a"]].sum()
    return pd.DataFrame({
        "o_year": g["year"].to_numpy(np.int64),
        "nation_revenue_scaled": g["rev_t"].to_numpy(np.int64),
        "total_revenue_scaled": g["rev_a"].to_numpy(np.int64),
    })


def q12_priority_by_linestatus(sf_dir: str,
                               date_from: str = "1996-01-01",
                               date_to: str = "1997-01-01"):
    """(l_linestatus, high_line_count, low_line_count) — TPC-H Q12
    shape: a CASE-counted order attribute grouped by a lineitem
    attribute across the order⋈lineitem join (the driver schema has no
    l_shipmode, so l_linestatus plays the grouping role; high priority
    = 1-URGENT/2-HIGH exactly as in Q12). Lineitems are date-filtered
    and partial-counted per (orderkey, linestatus) map-side, so the
    single orderkey exchange carries one row per distinct pair per
    batch, and the priority CASE resolves vectorized in the bucket."""
    import ray as _ray

    from ..stages.grouped import bucketed_group_map

    lo = np.datetime64(date_from, "us").astype(np.int64)
    hi = np.datetime64(date_to, "us").astype(np.int64)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])

    def order_rows(batch: pa.Table) -> pa.Table:
        prio = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = ((prio == "1-URGENT") | (prio == "2-HIGH")) \
            .astype(np.int64)
        n = batch.num_rows
        return pa.table({
            "key": batch["o_orderkey"].cast(pa.int64()),
            "ls": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "cnt": pa.array(high, pa.int64()),  # high-flag on order rows
            "is_ord": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"])

    def li_partials(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = (sd >= lo) & (sd < hi)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)[sel]
        ls = (batch["l_linestatus"].to_numpy(zero_copy_only=False)[sel]
              == "O").astype(np.int64)  # 0='F', 1='O'
        comp = okey * 2 + ls
        order_ = np.argsort(comp, kind="stable")
        c_s = comp[order_]
        first = np.r_[True, c_s[1:] != c_s[:-1]] if len(c_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        cnt = (np.diff(np.r_[starts, len(c_s)]) if len(starts)
               else np.array([], np.int64)).astype(np.int64)
        ck = c_s[starts] if len(starts) else np.array([], np.int64)
        return pa.table({
            "key": pa.array(ck // 2, pa.int64()),
            "ls": pa.array(ck % 2, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "is_ord": pa.array(np.zeros(len(ck), np.int8), pa.int8()),
        })

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def join_count(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "cnt"]].drop_duplicates("key") \
            .rename(columns={"cnt": "high"})
        li = df.loc[~iso, ["key", "ls", "cnt"]]
        j = li.merge(o, on="key", how="inner")
        hi_ = j["cnt"].to_numpy(np.int64) * j["high"].to_numpy(np.int64)
        lo_ = j["cnt"].to_numpy(np.int64) - hi_
        g = pd.DataFrame({"ls": j["ls"], "hi": hi_, "lo": lo_}) \
            .groupby("ls", as_index=False).sum()
        return pa.table({
            "ls": pa.array(g["ls"].to_numpy(np.int64), pa.int64()),
            "hi": pa.array(g["hi"].to_numpy(np.int64), pa.int64()),
            "lo": pa.array(g["lo"].to_numpy(np.int64), pa.int64()),
        })

    part = bucketed_group_map(tagged, "key", join_count,
                              num_buckets=16).to_pandas()
    g = part.groupby("ls", as_index=False)[["hi", "lo"]].sum()
    return pd.DataFrame({
        "l_linestatus": np.where(g["ls"].to_numpy(np.int64) == 1,
                                 "O", "F"),
        "high_line_count": g["hi"].to_numpy(np.int64),
        "low_line_count": g["lo"].to_numpy(np.int64),
    })


def q21_waiting_suppliers(sf_dir: str, late_days: int = 60):
    """(s_name, numwait) — TPC-H Q21 shape: suppliers who were the
    SOLE late supplier on a finalized multi-supplier order — the
    existential/anti quantification over peers inside the same order
    group (EXISTS another supplier, NOT EXISTS another LATE supplier).
    The driver schema has no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + late_days. Lineitems pre-reduce to one
    (orderkey, suppkey, max shipdate) row per batch map-side; the
    single orderkey exchange then evaluates both quantifiers
    vectorized per order and emits per-supplier partial counts."""
    import pyarrow.parquet as pq_

    from ..stages.grouped import bucketed_group_map

    late_us = np.int64(late_days) * 86_400_000_000

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        st = batch["o_orderstatus"].to_numpy(zero_copy_only=False)
        sel = st == "F"
        msk = pa.array(sel)
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[sel]
        n = len(od)
        return pa.table({
            "key": batch["o_orderkey"].filter(msk),
            "val": pa.array(od, pa.int64()),       # orderdate (us)
            "supp": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "is_ord": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def li_partials(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        supp = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order_ = np.lexsort((supp, okey))
        k_s, s_s, sh_s = okey[order_], supp[order_], ship[order_]
        first = (np.r_[True, (k_s[1:] != k_s[:-1]) |
                       (s_s[1:] != s_s[:-1])] if len(k_s)
                 else np.array([], bool))
        starts = np.flatnonzero(first)
        mx = np.maximum.reduceat(sh_s, starts) if len(starts) else \
            np.array([], np.int64)
        n = len(starts)
        return pa.table({
            "key": pa.array(k_s[starts] if n else
                            np.array([], np.int64), pa.int64()),
            "val": pa.array(mx, pa.int64()),       # max shipdate (us)
            "supp": pa.array(s_s[starts] if n else
                             np.array([], np.int64), pa.int64()),
            "is_ord": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(li_partials, batch_format="pyarrow"))

    def quantify(df: pd.DataFrame) -> pa.Table:
        iso = df["is_ord"].to_numpy(np.int8) == 1
        o = df.loc[iso, ["key", "val"]].drop_duplicates("key") \
            .rename(columns={"val": "odate"})
        # batches may re-emit a (key, supp) pair: re-reduce the max
        li = df.loc[~iso, ["key", "supp", "val"]] \
            .groupby(["key", "supp"], as_index=False)["val"].max()
        j = li.merge(o, on="key", how="inner")
        late = (j["val"].to_numpy(np.int64)
                > j["odate"].to_numpy(np.int64) + late_us)
        per = pd.DataFrame({
            "key": j["key"], "supp": j["supp"],
            "late": late.astype(np.int64)})
        agg = per.groupby("key").agg(
            nsupp=("supp", "size"), nlate=("late", "sum"))
        per = per.merge(agg, on="key")
        hit = per.loc[(per["late"].to_numpy(np.int64) == 1)
                      & (per["nsupp"].to_numpy(np.int64) >= 2)
                      & (per["nlate"].to_numpy(np.int64) == 1)]
        g = hit.groupby("supp", as_index=False).size()
        return pa.table({
            "supp": pa.array(g["supp"].to_numpy(np.int64), pa.int64()),
            "numwait": pa.array(g["size"].to_numpy(np.int64),
                                pa.int64()),
        })

    part = bucketed_group_map(tagged, "key", quantify,
                              num_buckets=16).to_pandas()
    g = part.groupby("supp", as_index=False)["numwait"].sum()
    supp_t = pq_.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_name"])
    names = {int(k): n for k, n in zip(
        supp_t["s_suppkey"].to_pylist(), supp_t["s_name"].to_pylist())}
    return pd.DataFrame({
        "s_name": [names[int(k)] for k in g["supp"]],
        "numwait": g["numwait"].to_numpy(np.int64),
    })


def _skyline_prune(qty: np.ndarray, rev: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D Pareto frontier (maximize both).
    p is dominated iff some q has qty>= AND rev>= with one strict.
    Sweep: sort by (qty desc, rev desc); dominated iff the running max
    rev over STRICTLY greater qty >= own rev, or a same-qty point has
    strictly greater rev. O(n log n); exact ties both survive."""
    n = len(qty)
    order = np.lexsort((-rev, -qty))
    q_s, r_s = qty[order], rev[order]
    grp_start = np.r_[True, q_s[1:] != q_s[:-1]]
    # max rev within each preceding STRICTLY-greater-qty prefix:
    # cummax of rev taken at group starts, shifted one group back
    starts = np.flatnonzero(grp_start)
    grp_id = np.cumsum(grp_start) - 1
    # rev is sorted desc within a qty group, so group max = rev at start
    grp_max = r_s[starts]
    pref = np.maximum.accumulate(grp_max)
    prev_max = np.full(len(starts), np.iinfo(np.int64).min, np.int64)
    prev_max[1:] = pref[:-1]
    dom_a = prev_max[grp_id] >= r_s
    dom_b = r_s < grp_max[grp_id]
    keep_sorted = ~(dom_a | dom_b)
    keep = np.zeros(n, bool)
    keep[order] = keep_sorted
    return keep


def part_pareto_frontier(sf_dir: str):
    """(l_partkey, total_qty, revenue_scaled) — the 2-D skyline: parts
    not dominated on (total quantity, total revenue) by any other part
    (>= in both, strict in one). The classic distributed-skyline plan:
    per-part exact int64 aggregates reduce through one partkey
    exchange, each reducer bucket prunes to its LOCAL frontier
    (domination is transitive, so pruning by a later-pruned point is
    safe), and only the tiny union of local frontiers meets the final
    global prune. The oracle is the NOT EXISTS domination anti-join."""
    from ..stages.grouped import bucketed_group_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def partials(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - disc)
        order_ = np.argsort(pk, kind="stable")
        k_s = pk[order_]
        first = np.r_[True, k_s[1:] != k_s[:-1]] if len(k_s) else \
            np.array([], bool)
        starts = np.flatnonzero(first)
        qs = np.add.reduceat(qty[order_], starts) if len(starts) else \
            np.array([], np.int64)
        rs = np.add.reduceat(rev[order_], starts) if len(starts) else \
            np.array([], np.int64)
        return pa.table({
            "key": pa.array(k_s[starts] if len(starts) else
                            np.array([], np.int64), pa.int64()),
            "qty": pa.array(qs, pa.int64()),
            "rev": pa.array(rs, pa.int64()),
        })

    def bucket_frontier(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("key", as_index=False)[["qty", "rev"]].sum()
        qty = g["qty"].to_numpy(np.int64)
        rev = g["rev"].to_numpy(np.int64)
        keep = _skyline_prune(qty, rev)
        return pa.table({
            "key": pa.array(g["key"].to_numpy(np.int64)[keep],
                            pa.int64()),
            "qty": pa.array(qty[keep], pa.int64()),
            "rev": pa.array(rev[keep], pa.int64()),
        })

    cand = bucketed_group_map(
        ds.map_batches(partials, batch_format="pyarrow"),
        "key", bucket_frontier, num_buckets=16).to_pandas()
    qty = cand["qty"].to_numpy(np.int64)
    rev = cand["rev"].to_numpy(np.int64)
    keep = _skyline_prune(qty, rev)
    return pd.DataFrame({
        "l_partkey": cand["key"].to_numpy(np.int64)[keep],
        "total_qty": qty[keep],
        "revenue_scaled": rev[keep],
    })


def orders_customer_set_ops(sf_dir: str,
                            a_from: str = "1994-01-01",
                            a_to: str = "1995-01-01",
                            b_from: str = "1995-01-01",
                            b_to: str = "1996-01-01"):
    """(custkey, membership) — distributed SET OPERATIONS: the customer
    populations of two order periods classified as 'both' (INTERSECT),
    'a_only' (A EXCEPT B) or 'b_only' (B EXCEPT A) in ONE pass. The
    set-algebra shape (churn / retention overlap between two slices)
    that SQL spells with three separate set-op queries collapses to a
    single exchange here: each order row maps to (custkey, in_a, in_b)
    flags, batches pre-deduplicate per custkey map-side (OR-fold of the
    flags), one custkey-keyed hash aggregate Max()es the flags, and the
    membership label is a final map over the two bits. No driver
    materialization, no join — set membership IS a grouped boolean
    aggregate."""
    from ray.data.aggregate import Max

    a_lo = np.datetime64(a_from, "us").astype(np.int64)
    a_hi = np.datetime64(a_to, "us").astype(np.int64)
    b_lo = np.datetime64(b_from, "us").astype(np.int64)
    b_hi = np.datetime64(b_to, "us").astype(np.int64)

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])

    def flags(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        in_a = (od >= a_lo) & (od < a_hi)
        in_b = (od >= b_lo) & (od < b_hi)
        sel = in_a | in_b
        ck, in_a, in_b = ck[sel], in_a[sel], in_b[sel]
        # map-side combine: one row per (custkey) per batch, flags OR-ed
        # (np.maximum.reduceat over the custkey-sorted run boundaries)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        starts = np.flatnonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])
        a_fold = np.maximum.reduceat(in_a[order].astype(np.int64), starts) \
            if len(ck_s) else np.array([], np.int64)
        b_fold = np.maximum.reduceat(in_b[order].astype(np.int64), starts) \
            if len(ck_s) else np.array([], np.int64)
        return pa.table({
            "custkey": pa.array(ck_s[starts] if len(ck_s)
                                else np.array([], np.int64), pa.int64()),
            "a": pa.array(a_fold, pa.int64()),
            "b": pa.array(b_fold, pa.int64()),
        })

    agg = ds.map_batches(flags, batch_format="pyarrow") \
        .groupby("custkey").aggregate(Max("a", alias_name="in_a"),
                                      Max("b", alias_name="in_b"))

    def label(batch: pa.Table) -> pa.Table:
        a = batch["in_a"].to_numpy(zero_copy_only=False).astype(bool)
        b = batch["in_b"].to_numpy(zero_copy_only=False).astype(bool)
        lab = np.where(a & b, "both", np.where(a, "a_only", "b_only"))
        return pa.table({
            "custkey": pc.cast(batch["custkey"], pa.int64()),
            "membership": pa.array(lab, pa.string()),
        })

    return agg.map_batches(label, batch_format="pyarrow")


def lineitem_unpivot(sf_dir: str):
    """(measure, l_returnflag, n, sum_centi) — UNPIVOT/melt: the four
    lineitem measure columns (quantity, extendedprice, discount, tax)
    rotated from wide to long format, then aggregated per (measure,
    returnflag). The melt happens INSIDE the batch map (each Arrow
    batch emits its 4×|flags| partial rows — long format never exceeds
    the aggregate's group domain in flight, so rotating a 100 TB table
    costs no extra shuffle volume at all), followed by one tiny
    domain-sized groupby. Values are exact int64 centi-units
    (round(x*100)) so sums are accumulation-order-independent; the
    oracle mirrors with UNION ALL + the same per-row rounding."""
    from ray.data.aggregate import Sum

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag"] + cols)

    def melt_partials(batch: pa.Table) -> pa.Table:
        flags = batch["l_returnflag"].to_numpy(zero_copy_only=False)
        # per-batch group fold over the (small) flag domain, per measure
        uniq, inv = np.unique(flags, return_inverse=True)
        m_names, m_flags, m_n, m_sum = [], [], [], []
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        for c in cols:
            v = np.round(batch[c].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
            sums = np.bincount(inv, weights=v.astype(np.float64),
                               minlength=len(uniq))
            # bincount weights go through float64; re-fold exactly in
            # int64 only if the float path could have lost precision
            if np.abs(sums).max(initial=0) >= 2 ** 52:
                sums = np.zeros(len(uniq), np.int64)
                np.add.at(sums, inv, v)
            m_names.extend([c] * len(uniq))
            m_flags.extend(uniq.tolist())
            m_n.extend(counts.tolist())
            m_sum.extend(np.asarray(sums, np.int64).tolist())
        return pa.table({
            "measure": pa.array(m_names, pa.string()),
            "l_returnflag": pa.array(m_flags, pa.string()),
            "n_part": pa.array(np.array(m_n, np.int64), pa.int64()),
            "s_part": pa.array(np.array(m_sum, np.int64), pa.int64()),
        })

    agg = ds.map_batches(melt_partials, batch_format="pyarrow") \
        .groupby(["measure", "l_returnflag"]).aggregate(
            Sum("n_part", alias_name="n"),
            Sum("s_part", alias_name="sum_centi"))

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "measure": batch["measure"],
            "l_returnflag": batch["l_returnflag"],
            "n": pc.cast(batch["n"], pa.int64()),
            "sum_centi": pc.cast(batch["sum_centi"], pa.int64()),
        })

    return agg.map_batches(normalize, batch_format="pyarrow")


def shard_rebalance_audit(sf_dir: str, n_old: int = 8, n_new: int = 9):
    """(scheme, n_keys, n_moved) — what fraction of keys MIGRATE when
    the cluster grows from n_old to n_new shards, for two placement
    schemes: naive modulo (k % N — nearly every key moves) vs
    RENDEZVOUS/highest-random-weight hashing (argmax over shards of
    md5(key|shard) — only ~1/n_new of keys move, the property that
    makes incremental rebalance affordable; destor's kv-store
    partitioning faces exactly this when an index node is added).
    md5 is the hash on BOTH sides so the oracle can mirror placement
    literally (a production ring would use a cheap numeric mix).

    Scale shape: the fact table reduces to the DISTINCT key domain
    (batch-local dedup partials, one exchange); placement is map-only
    per domain row (n_old + n_new digests per key); only two counter
    rows leave each batch."""
    import hashlib

    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])

    def key_partials(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["user_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"k": pa.array(u, pa.int64())})

    keys = ds.map_batches(key_partials, batch_format="pyarrow") \
        .groupby("k").aggregate(Count(alias_name="_c"))

    def place(batch: pa.Table) -> pa.Table:
        ks = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        moved_mod = int(((ks % n_old) != (ks % n_new)).sum())

        def hrw(k: int, n: int) -> int:
            # argmax of md5 hex digest, ties to the smaller shard id —
            # ORDER BY h DESC, s in the SQL mirror
            best_s, best_h = 0, ""
            for s in range(n):
                h = hashlib.md5(f"{k}|{s}".encode()).hexdigest()
                if h > best_h:
                    best_s, best_h = s, h
            return best_s

        moved_rdv = sum(1 for k in ks
                        if hrw(int(k), n_old) != hrw(int(k), n_new))
        return pa.table({
            "scheme": pa.array(["mod", "rendezvous"], pa.string()),
            "n_keys": pa.array([len(ks)] * 2, pa.int64()),
            "n_moved": pa.array([moved_mod, moved_rdv], pa.int64()),
        })

    agg = keys.map_batches(place, batch_format="pyarrow") \
        .groupby("scheme").aggregate(Sum("n_keys", alias_name="n_keys"),
                                     Sum("n_moved", alias_name="n_moved"))
    return agg.map_batches(
        lambda b: pa.table({
            "scheme": b["scheme"],
            "n_keys": b["n_keys"].cast(pa.int64()),
            "n_moved": b["n_moved"].cast(pa.int64())}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q11 / Q16 / Q20 over a DERIVED partsupp
# ---------------------------------------------------------------------------
# The driver ships no partsupp table, so the four TPC-H queries that
# need one run over a partsupp DERIVED identically on both sides of the
# oracle: the DISTINCT (l_partkey, l_suppkey) pairs actually appearing
# in lineitem (so correlated aggregates like Q20's are non-vacuous by
# construction), with ps_availqty / ps_supplycost_cents as deterministic
# integer functions of the key pair. Money is integer cents end to end.

def _partsupp_ds(sf_dir: str, num_buckets: int = 32):
    """Dataset(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents)
    = DISTINCT (l_partkey, l_suppkey) pairs of lineitem + synthesized
    columns. One exchange: map-side local unique of packed 44/20-bit
    pair keys (suppkey < 2^20 — TPC-H suppkey is ~P/20 so this holds to
    ~10^7 parts; widen the pack before that), bucketed global unique.

    SQL mirror (oracle CTE): SELECT DISTINCT l_partkey, l_suppkey FROM
    lineitem, plus the same % expressions."""
    from ..stages.grouped import bucketed_group_map

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])

    def pack_unique(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        k = np.unique((p << np.int64(20)) | s)
        return pa.table({"k": pa.array(k, pa.int64())})

    def bucket_unique(df: pd.DataFrame) -> pa.Table:
        k = np.unique(df["k"].to_numpy(np.int64))
        p = k >> np.int64(20)
        s = k & np.int64((1 << 20) - 1)
        return pa.table({
            "ps_partkey": pa.array(p, pa.int64()),
            "ps_suppkey": pa.array(s, pa.int64()),
            "ps_availqty": pa.array((p * 17 + s * 31) % 9999 + 1,
                                    pa.int64()),
            "ps_supplycost_cents": pa.array(
                (p * 13 + s * 101) % 99001 + 100, pa.int64()),
        })

    return bucketed_group_map(ds.map_batches(pack_unique,
                                             batch_format="pyarrow"),
                              "k", bucket_unique,
                              num_buckets=num_buckets)


def _region_suppliers(sf_dir: str, region: str):
    """Driver-resolved broadcast side: suppliers whose nation is in
    `region` — (sorted s_suppkey, s_name, s_acctbal, n_name) arrays.
    supplier/nation/region are the classic broadcastable dims (q5's
    argument: an attr tuple per supplier stays shippable far past
    100 TB of fact data)."""
    import pyarrow.parquet as pq_

    reg = pq_.read_table(f"{sf_dir}/region.parquet")
    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"][0] \
        .as_py()
    nat_in = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    nnames = {int(k): v for k, v in zip(nat_in["n_nationkey"].to_pylist(),
                                        nat_in["n_name"].to_pylist())}
    supp = pq_.read_table(f"{sf_dir}/supplier.parquet")
    keep = np.isin(supp["s_nationkey"].to_numpy(),
                   np.array(sorted(nnames), np.int32))
    sk = supp["s_suppkey"].to_numpy()[keep]
    order = np.argsort(sk)
    return (sk[order].astype(np.int64),
            [supp["s_name"].to_pylist()[i]
             for i in np.flatnonzero(keep)[order]],
            supp["s_acctbal"].to_numpy()[keep][order],
            [nnames[int(n)] for n in
             supp["s_nationkey"].to_numpy()[keep][order]])


def q2_min_cost_supplier(sf_dir: str, region: str = "EUROPE",
                         p_type: str = "SMALL", max_size: int = 10):
    """(s_acctbal, s_name, n_name, p_partkey, p_brand,
    ps_supplycost_cents) — TPC-H Q2 shape (minimum-cost supplier): for
    every part with p_type = `p_type` and p_size <= max_size, the
    region supplier(s) achieving the MINIMUM supply cost for that part
    — ties kept, as in the spec's correlated-subquery semantics
    (deviations from tpch dbgen: our part has no p_mfgr and the
    LIMIT-100 presentation cut is dropped so the result is
    order-insensitive).

    Plan: region⋈nation⋈supplier resolves on the driver into a
    broadcast suppkey→(name, acctbal, nation) map; partsupp rows keep
    only region suppliers map-side; ONE partkey exchange meets the
    filtered part rows (tag-and-union) and each bucket emits the
    per-part argmin-with-ties join-back — the groupwise-argmin pattern
    (exchange 2 counting partsupp's own distinct exchange)."""
    import ray as _ray

    from ..stages.grouped import bucketed_group_map

    sk, snames, sbal, snat = _region_suppliers(sf_dir, region)
    supp_ref = _ray.put((sk, snames, sbal, snat))

    ps = _partsupp_ds(sf_dir)

    def ps_rows(batch: pa.Table) -> pa.Table:
        skk, _, _, _ = _ray.get(supp_ref)
        s = batch["ps_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skk, s)
        pos[pos >= len(skk)] = 0
        sel = (skk[pos] == s) if len(skk) else np.zeros(len(s), bool)
        n = int(sel.sum())
        return pa.table({
            "key": batch["ps_partkey"].filter(pa.array(sel)),
            "suppkey": pa.array(s[sel], pa.int64()),
            "cost": batch["ps_supplycost_cents"].filter(pa.array(sel)),
            "brand": pa.array([""] * n, pa.string()),
            "is_part": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"])

    def part_rows(batch: pa.Table) -> pa.Table:
        sel = pc.and_(pc.equal(batch["p_type"], p_type),
                      pc.less_equal(batch["p_size"], max_size))
        t = batch.filter(sel)
        n = t.num_rows
        return pa.table({
            "key": t["p_partkey"],
            "suppkey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "cost": pa.array(np.zeros(n, np.int64), pa.int64()),
            "brand": t["p_brand"],
            "is_part": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    both = ps.map_batches(ps_rows, batch_format="pyarrow") \
        .union(part.map_batches(part_rows, batch_format="pyarrow"))

    def bucket(df: pd.DataFrame) -> pa.Table:
        skk, snm, sbl, snt = _ray.get(supp_ref)
        isp = df["is_part"].to_numpy(np.int8) == 1
        parts = df.loc[isp, ["key", "brand"]]
        rows = df.loc[~isp, ["key", "suppkey", "cost"]] \
            .merge(parts, on="key", how="inner")
        if not len(rows):
            return pa.table({
                "s_acctbal": pa.array([], pa.float64()),
                "s_name": pa.array([], pa.string()),
                "n_name": pa.array([], pa.string()),
                "p_partkey": pa.array([], pa.int64()),
                "p_brand": pa.array([], pa.string()),
                "ps_supplycost_cents": pa.array([], pa.int64()),
            })
        mn = rows.groupby("key")["cost"].transform("min")
        win = rows[rows["cost"] == mn]
        pos = np.searchsorted(skk, win["suppkey"].to_numpy(np.int64))
        return pa.table({
            "s_acctbal": pa.array(sbl[pos], pa.float64()),
            "s_name": pa.array([snm[i] for i in pos], pa.string()),
            "n_name": pa.array([snt[i] for i in pos], pa.string()),
            "p_partkey": pa.array(win["key"].to_numpy(np.int64),
                                  pa.int64()),
            "p_brand": pa.array(win["brand"].tolist(), pa.string()),
            "ps_supplycost_cents": pa.array(
                win["cost"].to_numpy(np.int64), pa.int64()),
        })

    return bucketed_group_map(both, "key", bucket, num_buckets=16)


def q11_important_stock(sf_dir: str, region: str = "EUROPE"):
    """(ps_partkey, value_cents) — TPC-H Q11 shape (important stock
    identification): per-part inventory value Σ supplycost·availqty
    over region suppliers, keeping parts whose value exceeds a global
    threshold. Deviation from spec: the threshold is 2× the MEAN group
    value instead of FRACTION·total (dbgen's 0.0001/SF constant is
    meaningless against this corpus's group count), and it is
    evaluated as the cross-multiplied integer predicate
    value·n_groups > 2·total so no float share ever forms — the same
    exact-predicate discipline as lineitem_weighted_quantiles.

    Plan: broadcast region-supplier key set; map-side partial
    (partkey, value) sums; ONE partkey-domain exchange reduces groups;
    the global (total, count) pair is an O(groups) driver carry
    feeding a map-only filter."""
    import ray as _ray
    from ray.data.aggregate import Sum

    sk, _, _, _ = _region_suppliers(sf_dir, region)
    sk_ref = _ray.put(sk)

    ps = _partsupp_ds(sf_dir)

    def partials(batch: pa.Table) -> pa.Table:
        skk = _ray.get(sk_ref)
        s = batch["ps_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skk, s)
        pos[pos >= len(skk)] = 0
        sel = (skk[pos] == s) if len(skk) else np.zeros(len(s), bool)
        p = batch["ps_partkey"].to_numpy(zero_copy_only=False)[sel]
        v = (batch["ps_supplycost_cents"].to_numpy(zero_copy_only=False)
             * batch["ps_availqty"].to_numpy(zero_copy_only=False))[sel]
        # map-side combine per partkey
        uniq, inv = np.unique(p, return_inverse=True)
        return pa.table({
            "ps_partkey": pa.array(uniq, pa.int64()),
            "value_cents": pa.array(np.bincount(inv, weights=v)
                                    .astype(np.int64), pa.int64()),
        })

    grouped = ps.map_batches(partials, batch_format="pyarrow") \
        .groupby("ps_partkey").aggregate(Sum("value_cents",
                                             alias_name="value_cents"))

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "ps_partkey": batch["ps_partkey"],
            "value_cents": pc.cast(batch["value_cents"], pa.int64()),
        })

    grouped = grouped.map_batches(norm, batch_format="pyarrow") \
        .materialize()
    # O(groups) scalar carry: total + count, then a map-only filter
    tot = 0
    cnt = 0
    for b in grouped.iter_batches(batch_format="pyarrow"):
        v = b["value_cents"].to_numpy(zero_copy_only=False)
        tot += int(v.sum())
        cnt += len(v)

    def keep(batch: pa.Table) -> pa.Table:
        v = batch["value_cents"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v * cnt > 2 * tot))

    return grouped.map_batches(keep, batch_format="pyarrow")


def q16_supplier_part_counts(sf_dir: str, bad_brand: str = "Brand#13",
                             bad_type: str = "PROMO",
                             sizes: tuple = (1, 4, 7, 10, 13, 16, 19, 22)):
    """(p_brand, p_type, p_size, supplier_cnt) — TPC-H Q16 shape
    (parts/supplier relationship): COUNT(DISTINCT suppliers) able to
    supply each surviving (brand, type, size) group, excluding one
    brand, one type, sizes outside the IN-list, and a "customer
    complaints" supplier set. Deviation: our supplier has no s_comment,
    so the complaint set is the deterministic s_suppkey % 13 = 5
    (mirrored literally in SQL — the NOT IN anti-join shape is what's
    being exercised; it needs no broadcast at all since membership is
    computable from the key).

    Plan: part's filtered attribute map broadcasts (brand/type/size
    per surviving part — the dimension side); partsupp drops complaint
    suppliers map-side, attaches group attrs, and locally uniques
    (group, suppkey) pairs; ONE pair-hash exchange uniques globally —
    each distinct pair lands in exactly one bucket, so per-bucket
    group counts are disjoint partials and the final group-domain
    reduce is exact (the grouped-distinct pattern of
    distinct_tokens_exact)."""
    import pyarrow.parquet as pq_
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    part = pq_.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
    sel = pc.and_(
        pc.and_(pc.not_equal(part["p_brand"], bad_brand),
                pc.not_equal(part["p_type"], bad_type)),
        pc.is_in(part["p_size"], value_set=pa.array(sizes, pa.int32())))
    part = part.filter(sel)
    pk = part["p_partkey"].to_numpy()
    order = np.argsort(pk)
    # the DISTINCT is on (group, suppkey), NOT (part, suppkey): a
    # supplier covering two parts of the same (brand, type, size)
    # counts once — so partkeys resolve to a dense group id first
    brands = [part["p_brand"].to_pylist()[i] for i in order]
    types = [part["p_type"].to_pylist()[i] for i in order]
    sizes = part["p_size"].to_numpy()[order].astype(np.int64)
    combos = sorted({(b, t, int(z))
                     for b, t, z in zip(brands, types, sizes)})
    gid_of = {c: i for i, c in enumerate(combos)}
    gids = np.array([gid_of[(b, t, int(z))]
                     for b, t, z in zip(brands, types, sizes)], np.int64)
    part_ref = _ray.put((pk[order].astype(np.int64), gids, combos))

    ps = _partsupp_ds(sf_dir)

    def pair_rows(batch: pa.Table) -> pa.Table:
        pkk, g, _ = _ray.get(part_ref)
        p = batch["ps_partkey"].to_numpy(zero_copy_only=False)
        s = batch["ps_suppkey"].to_numpy(zero_copy_only=False)
        good = s % 13 != 5
        pos = np.searchsorted(pkk, p)
        pos[pos >= len(pkk)] = 0
        good &= (pkk[pos] == p) if len(pkk) else False
        k = np.unique((g[pos[good]] << np.int64(20)) | s[good])
        return pa.table({"k": pa.array(k, pa.int64())})

    def bucket_counts(df: pd.DataFrame) -> pa.Table:
        _, _, combos_ = _ray.get(part_ref)
        k = np.unique(df["k"].to_numpy(np.int64))
        gid = k >> np.int64(20)
        uniq, inv = np.unique(gid, return_inverse=True)
        cnt = np.bincount(inv)
        return pa.table({
            "p_brand": pa.array([combos_[i][0] for i in uniq],
                                pa.string()),
            "p_type": pa.array([combos_[i][1] for i in uniq],
                               pa.string()),
            "p_size": pa.array([combos_[i][2] for i in uniq],
                               pa.int64()),
            "supplier_cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    partials = bucketed_group_map(
        ps.map_batches(pair_rows, batch_format="pyarrow"),
        "k", bucket_counts, num_buckets=16)

    out = partials.groupby(["p_brand", "p_type", "p_size"]) \
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": batch["p_brand"],
            "p_type": batch["p_type"],
            "p_size": batch["p_size"],
            "supplier_cnt": pc.cast(batch["supplier_cnt"], pa.int64()),
        })

    return out.map_batches(norm, batch_format="pyarrow")


def q20_excess_stock_suppliers(sf_dir: str, name_prefix: str = "small",
                               date_from: str = "1996-01-01",
                               date_to: str = "1997-01-01",
                               qty_mult: int = 100):
    """(s_suppkey, s_name, n_name) — TPC-H Q20 shape (potential part
    promotion): suppliers holding EXCESS STOCK of some name-matched
    part, where excess means ps_availqty > qty_mult × that
    (part, supplier) pair's shipped quantity in the window — the
    correlated semi-join against a grouped aggregate. Deviations:
    qty_mult = 100 replaces the spec's 0.5 (synthetic availqty
    1..9999 is not calibrated to annual volume; 100× yields a genuine
    pass/fail mix at every sf) and the nation filter is dropped
    (10 suppliers at sf0.001 — a nation filter would leave ~0).

    Plan: lineitem window partials per packed (part, supp) pair
    (map-side bincount combine), tag-and-union with partsupp rows on
    ONE pair-key exchange (the as-of/join family's rendezvous shape);
    buckets emit qualifying suppkeys after the broadcast name-prefix
    part filter; a tiny suppkey-domain distinct + broadcast attr
    attach finishes."""
    import pyarrow.parquet as pq_
    import ray as _ray

    from ..stages.grouped import bucketed_group_map

    part = pq_.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name"])
    keep = pc.starts_with(part["p_name"], name_prefix)
    pk_ref = _ray.put(np.sort(part.filter(keep)["p_partkey"]
                              .to_numpy().astype(np.int64)))

    supp = pq_.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = pq_.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    nmap = {int(k): v for k, v in zip(nat["n_nationkey"].to_pylist(),
                                      nat["n_name"].to_pylist())}
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    order = np.argsort(sk)
    attr_ref = _ray.put((sk[order],
                         [supp["s_name"].to_pylist()[i] for i in order],
                         [nmap[int(n)] for n in
                          supp["s_nationkey"].to_numpy()[order]]))

    lo = np.datetime64(date_from, "us").astype(np.int64)
    hi = np.datetime64(date_to, "us").astype(np.int64)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def li_partials(batch: pa.Table) -> pa.Table:
        pkk = _ray.get(pk_ref)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        sel = (sd >= lo) & (sd < hi)
        pos = np.searchsorted(pkk, p)
        pos[pos >= len(pkk)] = 0
        sel &= (pkk[pos] == p) if len(pkk) else False
        k = ((p[sel] << np.int64(20))
             | batch["l_suppkey"].to_numpy(zero_copy_only=False)[sel])
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)[sel] \
            .astype(np.int64)
        uniq, inv = np.unique(k, return_inverse=True)
        return pa.table({
            "k": pa.array(uniq, pa.int64()),
            "qty": pa.array(np.bincount(inv, weights=q)
                            .astype(np.int64), pa.int64()),
            "avail": pa.array(np.full(len(uniq), -1, np.int64),
                              pa.int64()),
        })

    ps = _partsupp_ds(sf_dir)

    def ps_rows(batch: pa.Table) -> pa.Table:
        pkk = _ray.get(pk_ref)
        p = batch["ps_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pkk, p)
        pos[pos >= len(pkk)] = 0
        sel = (pkk[pos] == p) if len(pkk) else np.zeros(len(p), bool)
        k = ((p[sel] << np.int64(20))
             | batch["ps_suppkey"].to_numpy(zero_copy_only=False)[sel])
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "qty": pa.array(np.full(int(sel.sum()), -1, np.int64),
                            pa.int64()),
            "avail": pa.array(
                batch["ps_availqty"].to_numpy(zero_copy_only=False)[sel],
                pa.int64()),
        })

    both = li.map_batches(li_partials, batch_format="pyarrow") \
        .union(ps.map_batches(ps_rows, batch_format="pyarrow"))

    def bucket(df: pd.DataFrame) -> pa.Table:
        k = df["k"].to_numpy(np.int64)
        qty = df["qty"].to_numpy(np.int64)
        avail = df["avail"].to_numpy(np.int64)
        isq = avail < 0
        # merge lineitem partials per key, inner-join with ps rows
        qk, qinv = np.unique(k[isq], return_inverse=True)
        if len(qk) == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        qsum = np.bincount(qinv, weights=qty[isq]).astype(np.int64)
        pos_c = np.clip(np.searchsorted(qk, k[~isq]), 0, len(qk) - 1)
        hit = qk[pos_c] == k[~isq]
        ok = hit & (avail[~isq] > qty_mult * qsum[pos_c])
        winners = np.unique(k[~isq][ok] & np.int64((1 << 20) - 1))
        return pa.table({"s_suppkey": pa.array(winners, pa.int64())})

    sups = bucketed_group_map(both, "k", bucket, num_buckets=16)

    def attach(df: pd.DataFrame) -> pa.Table:
        skk, snm, snt = _ray.get(attr_ref)
        s = np.unique(df["s_suppkey"].to_numpy(np.int64))
        pos = np.searchsorted(skk, s)
        return pa.table({
            "s_suppkey": pa.array(s, pa.int64()),
            "s_name": pa.array([snm[i] for i in pos], pa.string()),
            "n_name": pa.array([snt[i] for i in pos], pa.string()),
        })

    return bucketed_group_map(sups, "s_suppkey", attach, num_buckets=4)


def orders_repeat_latency_histogram(sf_dir: str):
    """(gap_days, n_customers) — REPEAT-PURCHASE latency: for every
    customer with >= 2 orders, exact whole days between the first and
    second order (ordered by o_orderdate, ties by o_orderkey),
    histogrammed. The conversion-latency curve a retention model is
    fit on; exact integers end to end.

    Shape: narrow (custkey, date_us, orderkey) rows, ONE custkey
    exchange, per-bucket lexsort + group-start arithmetic, then a tiny
    gap-domain aggregate."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderdate",
                                        "o_orderkey"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cust": batch["o_custkey"].cast(pa.int64()),
            "d_us": batch["o_orderdate"].cast(pa.int64()),
            "okey": batch["o_orderkey"].cast(pa.int64()),
        })

    def first_two(df: pd.DataFrame) -> pa.Table:
        c = df["cust"].to_numpy(np.int64)
        d = df["d_us"].to_numpy(np.int64)
        k = df["okey"].to_numpy(np.int64)
        order = np.lexsort((k, d, c))
        c, d = c[order], d[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        counts = np.diff(np.r_[starts, len(c)])
        has2 = counts >= 2
        s = starts[has2]
        gap_days = (d[s + 1] - d[s]) // 86_400_000_000
        g = pd.DataFrame({"gap_days": gap_days, "n": 1}) \
            .groupby("gap_days", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    return bucketed_group_map(
        ds.map_batches(narrow, batch_format="pyarrow"),
        "cust", first_two, num_buckets=8) \
        .groupby("gap_days").aggregate(Sum("n", alias_name="n_customers"))


def lineitem_ship_latency_histogram(sf_dir: str):
    """(latency_days, n) — order-to-ship latency: exact whole days
    between o_orderdate and each line's l_shipdate, joined on
    orderkey with the union-tag bucketed join (both sides exchange
    ONCE on the join key; no broadcast — orders is not a small side
    at 10^12 rows), histogrammed over the tiny latency domain."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderdate"])
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])

    def o_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["o_orderkey"].cast(pa.int64()),
            "d_us": batch["o_orderdate"].cast(pa.int64()),
            "is_order": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def l_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["l_orderkey"].cast(pa.int64()),
            "d_us": batch["l_shipdate"].cast(pa.int64()),
            "is_order": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    tagged = orders.map_batches(o_rows, batch_format="pyarrow") \
        .union(li.map_batches(l_rows, batch_format="pyarrow"))

    def join_hist(df: pd.DataFrame) -> pa.Table:
        iso = df["is_order"].to_numpy(np.int8).astype(bool)
        omap = pd.Series(df["d_us"].to_numpy(np.int64)[iso],
                         index=df["key"].to_numpy(np.int64)[iso])
        lk = df["key"].to_numpy(np.int64)[~iso]
        ld = df["d_us"].to_numpy(np.int64)[~iso]
        od = omap.reindex(lk).to_numpy(np.int64)
        lat = (ld - od) // 86_400_000_000
        g = pd.DataFrame({"latency_days": lat, "n": 1}) \
            .groupby("latency_days", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    return bucketed_group_map(tagged, "key", join_hist, num_buckets=16) \
        .groupby("latency_days").aggregate(Sum("n", alias_name="n"))


def lineitem_returns_rate_by_month(sf_dir: str):
    """(ym, n, n_returned, return_ppm) — monthly return rate: ym =
    year*100 + month of l_shipdate (integer calendar key both engines
    derive identically), n_returned counts l_returnflag = 'R', ppm
    from exact integer division. Map-side combined; one tiny
    month-domain exchange."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_shipdate", "l_returnflag"])

    def part(batch: pa.Table) -> pa.Table:
        y = pc.year(batch["l_shipdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = pc.month(batch["l_shipdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ret = (np.asarray(batch["l_returnflag"].to_pylist(), object)
               == "R").astype(np.int64)
        g = pd.DataFrame({"ym": y * 100 + m, "n": 1, "r": ret}) \
            .groupby("ym", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "ym": batch["ym"].cast(pa.int64()),
            "n": pa.array(n, pa.int64()),
            "n_returned": pa.array(r, pa.int64()),
            "return_ppm": pa.array(r * 1_000_000 // n, pa.int64()),
        })

    return ds.map_batches(part, batch_format="pyarrow") \
        .groupby("ym").aggregate(Sum("n", alias_name="n"),
                                 Sum("r", alias_name="r")) \
        .map_batches(finish, batch_format="pyarrow")


def supplier_part_bipartite_degree(sf_dir: str):
    """(side, degree, n_nodes) — degree distributions of the
    supplier-part BIPARTITE graph induced by lineitem (distinct
    (suppkey, partkey) edges): how many parts each supplier ships /
    how many suppliers each part has. The relational twin of
    degree_distribution (token graph) — graph profiling over a
    distinct-edge exchange: map-side distinct partials, one edge
    exchange, two degree folds over the tiny degree domains."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_suppkey", "l_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s": batch["l_suppkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "p": batch["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    e = ds.map_batches(edges, batch_format="pyarrow") \
        .groupby(["s", "p"]).aggregate(Count(alias_name="c"))

    def deg_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s": batch["s"].to_numpy(zero_copy_only=False),
            "p": batch["p"].to_numpy(zero_copy_only=False), "n": 1})
        gs = df.groupby("s", sort=False)["n"].sum().reset_index()
        gp = df.groupby("p", sort=False)["n"].sum().reset_index()
        return pa.table({
            "side": pa.array(["supplier"] * len(gs) + ["part"] * len(gp),
                             pa.string()),
            "node": pa.array(np.concatenate([
                gs["s"].to_numpy(np.int64), gp["p"].to_numpy(np.int64)]),
                pa.int64()),
            "d": pa.array(np.concatenate([
                gs["n"].to_numpy(np.int64), gp["n"].to_numpy(np.int64)]),
                pa.int64()),
        })

    deg = e.map_batches(deg_partials, batch_format="pyarrow") \
        .groupby(["side", "node"]).aggregate(Sum("d", alias_name="degree"))
    return deg.map_batches(
        lambda b: pa.table({"side": b["side"],
                            "degree": b["degree"].cast(pa.int64()),
                            "one": pa.array(np.ones(b.num_rows, np.int64),
                                            pa.int64())}),
        batch_format="pyarrow") \
        .groupby(["side", "degree"]).aggregate(
            Sum("one", alias_name="n_nodes"))


# ---------------------------------------------------------------------------
# Round-5 oracled relational operators
# ---------------------------------------------------------------------------

def customer_order_gap_stats(sf_dir: str):
    """(c_mktsegment, n_customers_multi, n_gaps, sum_gap_days,
    max_gap_days) — per-segment INTER-ORDER gap profile: for every
    customer with >= 2 orders, day gaps between consecutive order
    dates (date-sorted; same-day repeats gap 0), summed per market
    segment. The repeat-purchase-cadence table a retention model
    trains on. Shape: orders + customer rows meet in ONE custkey-keyed
    tag-and-union rendezvous (no broadcast — the customer side ships
    only (custkey, segment)); per-customer diffs are vectorized; only
    segment-domain partials leave the bucket."""
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    from ..stages.grouped import bucketed_group_map

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])

    def o_rows(b: pa.Table) -> pa.Table:
        # o_orderdate is timestamp[us]: int64 cast -> epoch us -> days
        d = b["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "key": b["o_custkey"].cast(pa.int64()),
            "seg": pa.array([""] * b.num_rows, pa.string()),
            "day": pa.array(d // 86_400_000_000, pa.int64()),
            "is_cust": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
        })

    def c_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b["c_custkey"].cast(pa.int64()),
            "seg": b["c_mktsegment"],
            "day": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            "is_cust": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
        })

    tagged = orders.map_batches(o_rows, batch_format="pyarrow") \
        .union(cust.map_batches(c_rows, batch_format="pyarrow"))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({"seg": pa.array([], pa.string()),
                          "nc": pa.array([], pa.int64()),
                          "ng": pa.array([], pa.int64()),
                          "sg": pa.array([], pa.int64()),
                          "mg": pa.array([], pa.int64())})
        o = df[df["is_cust"] == 0]
        if len(o) < 2:
            return empty
        # fully vectorized per-customer gap fold: one lexsort, one
        # diff, boundary gaps masked, reduceat per customer run (the
        # per-key pandas-groupby loop here measured 26 s at sf0.1)
        key = o["key"].to_numpy(np.int64)
        day = o["day"].to_numpy(np.int64)
        order = np.lexsort((day, key))
        k, d = key[order], day[order]
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(k)])
        multi = counts >= 2
        if not multi.any():
            return empty
        gaps = np.diff(d)                       # len(k) - 1
        bnd = starts[1:] - 1                    # cross-customer gaps
        gsum = gaps.copy()
        gsum[bnd] = 0
        gmax = gaps.copy()
        gmax[bnd] = -1                          # real gaps are >= 0
        st = starts[multi]                      # < len(gaps) by multi
        ng = counts[multi] - 1
        sg = np.add.reduceat(gsum, st)
        mg = np.maximum.reduceat(gmax, st)
        # the reduceat segment runs to the NEXT multi start, which may
        # span single-row customers — their boundary gaps are zeroed/
        # negated above, and single-row customers contribute no gaps,
        # so sums/maxes are exact per multi customer
        segmap = pd.DataFrame({
            "key": df.loc[df["is_cust"] == 1, "key"].to_numpy(np.int64),
            "seg": df.loc[df["is_cust"] == 1, "seg"].to_numpy()})
        per = pd.DataFrame({"key": k[st], "ng": ng, "sg": sg, "mg": mg}) \
            .merge(segmap, on="key", how="left")
        per["seg"] = per["seg"].fillna("")
        per["nc"] = 1
        g = per.groupby("seg", sort=False) \
            .agg(nc=("nc", "sum"), ng=("ng", "sum"), sg=("sg", "sum"),
                 mg=("mg", "max")).reset_index()
        return pa.Table.from_pandas(
            g.astype({"nc": "int64", "ng": "int64", "sg": "int64",
                      "mg": "int64"}),
            preserve_index=False).replace_schema_metadata(None)

    agg = bucketed_group_map(tagged, "key", per_bucket, num_buckets=8) \
        .groupby("seg").aggregate(
            Sum("nc", alias_name="n_customers_multi"),
            Sum("ng", alias_name="n_gaps"),
            Sum("sg", alias_name="sum_gap_days"),
            Max("mg", alias_name="max_gap_days"))
    return agg.map_batches(
        lambda b: pa.table({
            "c_mktsegment": b["seg"],
            "n_customers_multi": pc.cast(b["n_customers_multi"],
                                         pa.int64()),
            "n_gaps": pc.cast(b["n_gaps"], pa.int64()),
            "sum_gap_days": pc.cast(b["sum_gap_days"], pa.int64()),
            "max_gap_days": pc.cast(b["max_gap_days"], pa.int64()),
        }), batch_format="pyarrow")


def supplier_revenue_pareto(sf_dir: str,
                            thresholds=(50, 80, 90, 99)):
    """(pct_threshold, n_suppliers, share_ppm) — revenue
    CONCENTRATION: the smallest supplier-count prefix (suppliers
    ranked by exact lineitem revenue cents desc, ties to smaller
    s_suppkey) whose cumulative share reaches each threshold, decided
    in EXACT integer math (cum·100 >= t·total — no float boundary).
    share_ppm reports the prefix's actual share. Shape: one
    supplier-domain groupby of map-side partial cent sums; the ranked
    scan runs on the supplier-domain table (the docstring's bound:
    suppliers, not lineitems)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({
            "l_suppkey": batch["l_suppkey"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "cents": cents})
        g = df.groupby("l_suppkey", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    per_supp = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(Sum("cents", alias_name="cents")) \
        .to_pandas()  # supplier-domain
    s = per_supp.sort_values(["cents", "l_suppkey"],
                             ascending=[False, True])["cents"] \
        .to_numpy(np.int64)
    total = int(s.sum())
    cum = np.cumsum(s)
    rows = []
    for t in thresholds:
        # smallest prefix with cum*100 >= t*total (ints exact)
        k = int(np.searchsorted(cum * 100, t * total, side="left")) + 1
        k = min(k, len(s))
        share_ppm = int(cum[k - 1]) * 1_000_000 // max(1, total)
        rows.append((t, k, share_ppm))
    return pd.DataFrame(rows, columns=["pct_threshold", "n_suppliers",
                                       "share_ppm"]) \
        .astype({"pct_threshold": "int64", "n_suppliers": "int64",
                 "share_ppm": "int64"})
