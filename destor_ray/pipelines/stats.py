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


def heavy_hitter_tokens(sf_dir: str, k: int = 10, capacity: int = 256):
    """(token, est_count, max_err) for the k most frequent corpus
    tokens — distributed Misra-Gries / Space-Saving heavy hitters, the
    frequent-items member of the engine's mergeable-sketch family
    (HyperLogLog ✓ distinct_token_stats, KLL ✓ quantile_sketch_stats;
    destor's top-k container ranking, cap_rewrite.c, is the exact
    counterpart computed exactly because container ids fit in memory).

    Each batch tokenizes, counts exactly (np.unique), and MG-compresses
    to <= `capacity` counters (functions/sketch.mg_compress), so the
    exchange carries at most capacity rows per batch no matter how
    large the vocabulary; per-batch error mass rides along as a
    sentinel row. One token-hash groupby sums the partials; per-bucket
    partial top-k rows + the tiny driver merge bound the reducer
    output at k rows per bucket.

    est_count is EXACT (max_err == 0) whenever every batch sees
    <= capacity distinct tokens — the oracle pins that regime; the
    sketch regime's bound (est in [true - Σdeltas, true]) is pinned by
    tests/test_sketch.py with capacity < vocabulary."""
    import pyarrow.compute as pc

    from ..functions.sketch import mg_compress
    from ..stages.grouped import bucketed_group_map

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        arr = toks.to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(arr, return_counts=True)
        uniq, cnt, delta = mg_compress(uniq, cnt.astype(np.int64), capacity)
        # error mass rides an EXPLICIT flag column (never an in-band
        # sentinel token — arbitrary corpora can contain any string)
        tok = np.r_[uniq, [""]]
        n = np.r_[cnt, [delta]].astype(np.int64)
        isd = np.r_[np.zeros(len(uniq), np.int8), [1]].astype(np.int8)
        return pa.table({"token": pa.array(tok, pa.string()),
                         "n": pa.array(n, pa.int64()),
                         "is_delta": pa.array(isd, pa.int8())})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def bucket_topk(df: pd.DataFrame) -> pa.Table:
        isd = df["is_delta"].to_numpy(np.int8) == 1
        dsum = int(df.loc[isd, "n"].sum())
        g = df.loc[~isd].groupby("token", as_index=False)["n"].sum()
        g = g.sort_values(["n", "token"], ascending=[False, True]).head(k)
        return pa.table({
            "token": pa.array(np.r_[g["token"].to_numpy(object), [""]],
                              pa.string()),
            "n": pa.array(np.r_[g["n"].to_numpy(np.int64),
                                [dsum]].astype(np.int64), pa.int64()),
            "is_delta": pa.array(np.r_[np.zeros(len(g), np.int8), [1]]
                                 .astype(np.int8), pa.int8()),
        })

    cand = bucketed_group_map(parts, "token", bucket_topk, num_buckets=8) \
        .to_pandas()  # <= (k+1) x buckets rows
    isd = cand["is_delta"].to_numpy(np.int8) == 1
    max_err = int(cand.loc[isd, "n"].sum())
    top = cand.loc[~isd].sort_values(["n", "token"],
                                     ascending=[False, True]).head(k)
    return pd.DataFrame({
        "token": top["token"].to_numpy(object),
        "est_count": top["n"].to_numpy(np.int64),
        "max_err": np.full(len(top), max_err, np.int64),
    }).reset_index(drop=True)


def source_length_gini(sf_dir: str):
    """(source, gini_num, gini_den) — per-source Gini coefficient of
    document lengths as an EXACT int64 rational (Gini = num/den), the
    inequality-profiling statistic for corpus balance audits ("is one
    source's length distribution dominated by a few huge docs?").

    Uses the rank formula G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) over
    ascending values; ties contribute rank-sum · value, which is
    order-invariant, so the value-count profile is sufficient — the
    exchange carries one (source, length, count) partial per batch
    (domain-bounded), never documents, and each source's bucket does a
    single sorted cumulative scan. Same two-pass shape as the quantile
    machinery; at 10^12 rows the profile stays |sources|·|length
    domain|. Overflow bound: num ≤ 2·n·max_len·n — int64-safe while
    n·max_len·n < 4.6e18 (per-source n ≤ ~10^6 at 500-char docs;
    beyond that, switch the bucket scan to the limb-decomposed (hi,lo)
    pattern used by lineitem_corr_stats)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"])

    def counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_numpy(zero_copy_only=False),
            "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["source", "n_chars"], as_index=False).size()
        return pa.table({
            "source": pa.array(g["source"].to_numpy(object), pa.string()),
            "n_chars": pa.array(g["n_chars"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    prof = ds.map_batches(counts, batch_format="pyarrow") \
        .groupby(["source", "n_chars"]).aggregate(Sum("c", alias_name="c"))

    def gini(df: pd.DataFrame) -> pa.Table:
        out_s, out_n, out_d = [], [], []
        for s, g in df.groupby("source", sort=False):
            g = g.sort_values("n_chars")
            v = g["n_chars"].to_numpy(np.int64)
            c = g["c"].to_numpy(np.int64)
            n = int(c.sum())
            total = int((v * c).sum())
            cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
            # Σ rank·x over each tie group = v · (Σ of c consecutive
            # ranks starting at cum_before+1)
            rnx = int((v * c * (2 * cum_before + c + 1) // 2).sum())
            out_s.append(s)
            out_n.append(2 * rnx - (n + 1) * total)
            out_d.append(n * total)
        return pa.table({
            "source": pa.array(out_s, pa.string()),
            "gini_num": pa.array(out_n, pa.int64()),
            "gini_den": pa.array(out_d, pa.int64())})

    def cast_cols(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"],
                         "n_chars": pc.cast(b["n_chars"], pa.int64()),
                         "c": pc.cast(b["c"], pa.int64())})

    return bucketed_group_map(prof.map_batches(cast_cols,
                                               batch_format="pyarrow"),
                              "source", gini, num_buckets=8)


def table_profile(sf_dir: str):
    """(col_name, n_nulls, n_distinct, min_str, max_str) — the ANALYZE
    pass a 100 TB ingest runs before anything else (per-column health:
    null counts, exact cardinality, value range). Shuffle budget: ONE
    exchange total — every column's batch-locally-deduped values ride
    the same tagged (col_id, value-as-string) stream, hash-bucketed for
    the global distinct count; nulls/min/max reduce map-side to one
    tiny row per (column, block) with a driver fold. Values are
    compared as strings on both sides (ASCII corpus ⇒ numpy object min
    == SQL VARCHAR min) so one long-format schema profiles
    heterogeneous column types."""
    from ..stages.grouped import bucketed_group_map

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, nulls, mins, maxs, ns = [], [], [], [], []
        for c in cols:
            col = batch[c]
            nn = col.null_count
            vals = np.asarray(
                [str(v) for v in col.to_pylist() if v is not None],
                dtype=object)
            names.append(c)
            nulls.append(nn)
            ns.append(batch.num_rows)
            # None (not ""): an all-null block must not poison the
            # global min with an empty-string sentinel — pandas min/max
            # skip missing values in the fold
            mins.append(str(vals.min()) if len(vals) else None)
            maxs.append(str(vals.max()) if len(vals) else None)
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n_nulls": pa.array(np.array(nulls, np.int64), pa.int64()),
            "min_str": pa.array(mins, pa.string()),
            "max_str": pa.array(maxs, pa.string()),
        })

    prof = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    folded = prof.groupby("col_name").agg(
        n_nulls=("n_nulls", "sum"), min_str=("min_str", "min"),
        max_str=("max_str", "max")).reset_index()

    def dvals(batch: pa.Table) -> pa.Table:
        out_c, out_v = [], []
        for i, c in enumerate(cols):
            u = {str(v) for v in batch[c].to_pylist() if v is not None}
            out_c.extend([i] * len(u))
            out_v.extend(u)
        return pa.table({
            "cid": pa.array(np.array(out_c, np.int64), pa.int64()),
            "val": pa.array(out_v, pa.string()),
        })

    def count_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.drop_duplicates(["cid", "val"]) \
            .groupby("cid", as_index=False).size()
        return pa.table({
            "cid": pa.array(g["cid"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
        })

    dist = bucketed_group_map(
        ds.map_batches(dvals, batch_format="pyarrow"), "val",
        count_bucket, num_buckets=16).to_pandas() \
        .groupby("cid", as_index=False)["n"].sum()
    nd = {int(c): int(n) for c, n in zip(dist["cid"], dist["n"])}
    folded["n_distinct"] = [nd.get(cols.index(c), 0)
                            for c in folded["col_name"]]
    return folded[["col_name", "n_nulls", "n_distinct",
                   "min_str", "max_str"]].astype(
        {"n_nulls": np.int64, "n_distinct": np.int64})


def table_digest(sf_dir: str):
    """(lang, n_rows, digest) — order-insensitive PARTITION-LEVEL table
    fingerprint: per lang partition, digest = Σ md5_60bit(canonical row
    string) mod 2^63. The cross-engine / cross-snapshot certification
    primitive — "did the copy / migration / re-encode preserve every
    row?" — computable WITHOUT sorting or co-locating the table because
    a commutative sum is order- and partitioning-invariant (the reason
    engines use it to certify 100 TB copies: any single changed,
    dropped or duplicated row changes the digest with probability
    1 - 2^-60).

    Scale shape: map-only md5 fold per batch (the md5 row loop is the
    price of oracle parity, as in minhash_lsh_oph; a production run
    would swap in a vectorized xxhash), partials carried as SPLIT
    hi/lo-32-bit int64 columns so plain int64 Sum aggregates never
    overflow (Σ p = 2^32·Σhi + Σlo, exact for < 2^31 blocks), one
    domain-sized groupby, final mod-2^63 recombine in a tiny map."""
    import hashlib

    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    MOD = 1 << 63
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_pylist()
        texts = batch["text"].to_pylist()
        acc: dict[str, list[int]] = {}
        for i, lg, tx in zip(ids, langs, texts):
            s = f"{i}|{lg}|{tx}"
            h = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
            e = acc.setdefault(lg, [0, 0])
            e[0] += h
            e[1] += 1
        ks = sorted(acc)
        tot = np.array([acc[k][0] for k in ks], object)
        return pa.table({
            "lang": pa.array(ks, pa.string()),
            "hi": pa.array([int(t >> 32) for t in tot], pa.int64()),
            "lo": pa.array([int(t & 0xFFFFFFFF) for t in tot], pa.int64()),
            "n_part": pa.array([acc[k][1] for k in ks], pa.int64()),
        })

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("hi", alias_name="hi_sum"),
                                   Sum("lo", alias_name="lo_sum"),
                                   Sum("n_part", alias_name="n_rows"))

    def recombine(batch: pa.Table) -> pa.Table:
        hi = batch["hi_sum"].to_pylist()
        lo = batch["lo_sum"].to_pylist()
        dig = [int(((h << 32) + l) % MOD) for h, l in zip(hi, lo)]
        return pa.table({
            "lang": batch["lang"],
            "n_rows": pc.cast(batch["n_rows"], pa.int64()),
            "digest": pa.array(dig, pa.int64()),
        })

    return agg.map_batches(recombine, batch_format="pyarrow")


def exact_global_quantiles(sf_dir: str,
                           qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                           n_hist: int = 1 << 16,
                           max_refine_rows: int = 5_000_000):
    """(q, value_micro) — EXACT global quantiles by MULTI-PASS
    SELECTION, the algorithm for an exact median of a column too big to
    sort and whose groups don't fit one worker (the regime where
    events_type_percentiles' co-locate-and-sort contract breaks):

      pass 1  global (n, min, max) — one scalar aggregate;
      pass 2  equal-width histogram over [min, max] (n_hist buckets):
              per-batch bincount partials, one domain-sized groupby;
              the driver's cumulative scan locates, for each rank
              k = ceil(q·n), the bucket holding the k-th value and the
              residual rank within it;
      pass 3  ONE filtered scan keeps only values in the (few) located
              buckets — expected n/n_hist rows each — and np.partition
              selects the residual rank exactly.

    Total data moved: 3 storage scans, zero sort, zero co-location;
    the only driver materialization is the refine set, asserted under
    `max_refine_rows` (a pathological single-value-bucket skew would
    need one recursion of pass 2/3 inside the bucket — not needed on
    any driver table, enforced by the assert rather than silently
    degrading). Definition matches events_type_percentiles: value at
    1-based rank ceil(q·n) of the ascending sort, on int64 micro
    units."""
    import math

    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    from .streaming import _read_events

    def narrow(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({"vmic": pa.array(vmic, pa.int64())})

    base = _read_events(sf_dir).select_columns(["value"])
    vals = base.map_batches(narrow, batch_format="pyarrow")

    # pass 1
    g = vals.aggregate(Count(alias_name="n"), Min("vmic", alias_name="lo"),
                       Max("vmic", alias_name="hi"))
    n, lo, hi = int(g["n"]), int(g["lo"]), int(g["hi"])
    width = max(1, -(-(hi - lo + 1) // n_hist))

    # pass 2
    def hist(batch: pa.Table) -> pa.Table:
        b = (batch["vmic"].to_numpy(zero_copy_only=False) - lo) // width
        cnt = np.bincount(b, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    hdf = vals.map_batches(hist, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas().sort_values("bucket")
    buckets = hdf["bucket"].to_numpy(np.int64)
    cum = hdf["cnt"].to_numpy(np.int64).cumsum()

    targets = []  # (q, bucket, residual rank within bucket)
    for q in qs:
        k = max(1, math.ceil(q * n))
        j = int(np.searchsorted(cum, k))
        before = int(cum[j - 1]) if j else 0
        targets.append((q, int(buckets[j]), k - before))
    needed = sorted({b for _, b, _ in targets})
    assert sum(int(hdf["cnt"].iloc[int(np.searchsorted(buckets, b))])
               for b in needed) <= max_refine_rows, \
        "refine set too large — recurse pass 2/3 inside the hot bucket"

    # pass 3
    need_arr = np.array(needed, np.int64)

    def keep(batch: pa.Table) -> pa.Table:
        v = batch["vmic"].to_numpy(zero_copy_only=False)
        sel = np.isin((v - lo) // width, need_arr)
        return pa.table({"vmic": pa.array(v[sel], pa.int64())})

    fine = vals.map_batches(keep, batch_format="pyarrow") \
        .to_pandas()["vmic"].to_numpy(np.int64)
    fb = (fine - lo) // width

    out_q, out_v = [], []
    for q, b, r in targets:
        inb = fine[fb == b]
        out_q.append(q)
        out_v.append(int(np.partition(inb, r - 1)[r - 1]))
    return pd.DataFrame({"q": np.array(out_q, np.float64),
                         "value_micro": np.array(out_v, np.int64)})


def table_constraints_audit(sf_dir: str):
    """(rule, violations) — a data-quality EXPECTATIONS pass (the
    Great-Expectations / dbt-test shape): every constraint a pipeline
    should assert before trusting a corpus drop, each counted exactly:

      orders_null_custkey        o_custkey IS NULL
      orders_nonpositive_total   o_totalprice <= 0
      orders_dup_orderkey        primary-key violations (n − distinct)
      orders_orphan_custkey      FK: o_custkey absent from customer
      customers_without_orders   reverse-FK coverage gap
      documents_empty_text       NULL or zero-length text
      documents_nchars_mismatch  declared n_chars ≠ length(text)
      documents_short_text       n_chars < 64 (quality floor)

    Scale shape: every row-predicate rule is a MAP-SIDE partial counter
    folded in one scan per table (never a shuffle); the uniqueness rule
    is the standard distinct exchange (batch-local dedup first, so the
    exchange carries one row per key per block); FK rules broadcast the
    DIMENSION key set (customer — the small side by construction), and
    the reverse-FK gap broadcasts the distinct-fact keyset, itself
    bounded by the dimension domain. No rule materializes fact rows."""
    import ray as _ray
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    cust_keys = np.sort(pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64))
    ckey_ref = _ray.put(cust_keys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def order_rules(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"]
        null_ck = int(ck.null_count)
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        nonpos = int((tp <= 0).sum())
        valid = ck.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        keys = _ray.get(ckey_ref)
        idx = np.searchsorted(keys, valid)
        idx[idx == len(keys)] = 0
        orphan = int((keys[idx] != valid).sum()) if len(keys) else len(valid)
        return pa.table({
            "rule": pa.array(["orders_null_custkey",
                              "orders_nonpositive_total",
                              "orders_orphan_custkey"], pa.string()),
            "violations": pa.array([null_ck, nonpos, orphan], pa.int64()),
        })

    rule_partials = [orders.map_batches(order_rules, batch_format="pyarrow")]

    # uniqueness + distinct-custkey: one tagged (kind, key) exchange,
    # batch-deduped map-side (same trick as table_profile)
    def key_partials(batch: pa.Table) -> pa.Table:
        ok = np.unique(batch["o_orderkey"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        ck = np.unique(batch["o_custkey"].drop_null()
                       .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "kind": pa.array(np.concatenate([np.zeros(len(ok), np.int8),
                                             np.ones(len(ck), np.int8)])),
            "key": pa.array(np.concatenate([ok, ck]), pa.int64()),
        })

    kdf = orders.map_batches(key_partials, batch_format="pyarrow") \
        .groupby(["kind", "key"]).aggregate(Count(alias_name="cnt")) \
        .to_pandas()
    n_orders = orders.count()
    n_distinct_okey = int((kdf["kind"] == 0).sum())
    fact_ckeys = np.sort(kdf.loc[kdf["kind"] == 1, "key"]
                         .to_numpy(np.int64))
    fkey_ref = _ray.put(fact_ckeys)

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])

    def cust_rules(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = _ray.get(fkey_ref)
        idx = np.searchsorted(keys, ck)
        idx[idx == len(keys)] = 0
        missing = int((keys[idx] != ck).sum()) if len(keys) else len(ck)
        return pa.table({
            "rule": pa.array(["customers_without_orders"], pa.string()),
            "violations": pa.array([missing], pa.int64()),
        })

    rule_partials.append(cust.map_batches(cust_rules, batch_format="pyarrow"))

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text", "n_chars"])

    def doc_rules(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        ln = pc.utf8_length(txt)
        empty = int(txt.null_count) + int(
            pc.sum(pc.equal(ln, 0)).as_py() or 0)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        lnp = ln.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        mismatch = int(((lnp != -1) & (lnp != nc)).sum())
        short = int((nc < 64).sum())
        return pa.table({
            "rule": pa.array(["documents_empty_text",
                              "documents_nchars_mismatch",
                              "documents_short_text"], pa.string()),
            "violations": pa.array([empty, mismatch, short], pa.int64()),
        })

    rule_partials.append(docs.map_batches(doc_rules, batch_format="pyarrow"))

    folded = rule_partials[0].union(*rule_partials[1:]) \
        .groupby("rule").aggregate(Sum("violations", alias_name="violations")) \
        .to_pandas()
    dup = pd.DataFrame({"rule": ["orders_dup_orderkey"],
                        "violations": [np.int64(n_orders - n_distinct_okey)]})
    out = pd.concat([folded, dup], ignore_index=True)
    out["violations"] = out["violations"].astype(np.int64)
    return out.sort_values("rule").reset_index(drop=True)


_FD_CANDIDATES = [
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
]


def fd_discovery(sf_dir: str):
    """(lhs, rhs, n_lhs_distinct, n_pairs_distinct, n_violating_lhs,
    fd_holds) — FUNCTIONAL-DEPENDENCY discovery, the schema-profiling
    pass that finds hidden keys and denormalization opportunities
    ("does A determine B?"): FD A→B holds ⟺ no A value maps to more
    than one distinct B. Candidates cover both verdicts (o_orderkey →
    o_custkey is a true key FD; o_custkey → o_orderpriority is
    violated) so the checker can't pass vacuously.

    Scale shape: per candidate, the fact table reduces MAP-SIDE to
    batch-distinct (pair_id, a, b) rows (all candidates share one
    tagged stream per table — the table_profile trick), then a chain of
    domain-sized groupbys: distinct (pair, a, b) → per-(pair, a)
    distinct-b counts → per-pair counters. Values travel as VARCHAR so
    heterogeneous column types share one long-format schema (mirrored
    with CAST in the oracle)."""
    from ray.data.aggregate import Count, Max, Sum

    streams = []
    for pid, (table, lhs, rhs) in enumerate(_FD_CANDIDATES):
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                   columns=[lhs, rhs])

        def dedup(batch: pa.Table, _pid=pid, _l=lhs, _r=rhs) -> pa.Table:
            df = pd.DataFrame({
                "a": batch[_l].cast(pa.string()).to_pylist(),
                "b": batch[_r].cast(pa.string()).to_pylist(),
            }).drop_duplicates()
            return pa.table({
                "pair_id": pa.array([_pid] * len(df), pa.int64()),
                "a": pa.array(df["a"], pa.string()),
                "b": pa.array(df["b"], pa.string()),
            })

        streams.append(ds.map_batches(dedup, batch_format="pyarrow"))

    tagged = streams[0]
    for s in streams[1:]:
        tagged = tagged.union(s)

    # distinct (pair, a, b) → per-(pair, a) distinct-b count → per-pair
    per_ab = tagged.groupby(["pair_id", "a", "b"]) \
        .aggregate(Count(alias_name="_c"))
    per_a = per_ab.groupby(["pair_id", "a"]).aggregate(
        Count(alias_name="nb"))

    def viol(batch: pa.Table) -> pa.Table:
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pair_id": batch["pair_id"].cast(pa.int64()),
            "one": pa.array(np.ones(len(nb), np.int64), pa.int64()),
            "nb": pa.array(nb, pa.int64()),
            "v": pa.array((nb > 1).astype(np.int64), pa.int64()),
        })

    per_pair = per_a.map_batches(viol, batch_format="pyarrow") \
        .groupby("pair_id").aggregate(
            Sum("one", alias_name="n_lhs_distinct"),
            Sum("nb", alias_name="n_pairs_distinct"),
            Sum("v", alias_name="n_violating_lhs")).to_pandas() \
        .sort_values("pair_id")

    lhs_names = [c[1] for c in _FD_CANDIDATES]
    rhs_names = [c[2] for c in _FD_CANDIDATES]
    pid = per_pair["pair_id"].to_numpy(np.int64)
    nviol = per_pair["n_violating_lhs"].to_numpy(np.int64)
    return pd.DataFrame({
        "lhs": [lhs_names[i] for i in pid],
        "rhs": [rhs_names[i] for i in pid],
        "n_lhs_distinct": per_pair["n_lhs_distinct"].to_numpy(np.int64),
        "n_pairs_distinct": per_pair["n_pairs_distinct"].to_numpy(np.int64),
        "n_violating_lhs": nviol,
        "fd_holds": (nviol == 0).astype(np.int64),
    })


def rle_compression_advisor(sf_dir: str, n_buckets: int = 256):
    """(column, n_rows, n_runs_natural, n_distinct) — the LAYOUT
    ADVISOR a columnar store runs before choosing encodings: how many
    RLE runs does each column have in the table's NATURAL (event_id)
    order, vs its distinct count (= its run count if the table were
    re-sorted by that column)? n_runs_natural ≈ n_rows ⇒ RLE is
    useless without a re-sort; n_runs_natural ≈ n_distinct ⇒ the
    column is already clustered (the same economics as destor's
    container locality, W3: co-located duplicates compress, scattered
    ones don't).

    Run counting is a SCAN with a cross-partition carry, the third
    member of the family (global_rank: sum carry; cusum: min carry):
    event_id range buckets count runs locally; the only coordination is
    each bucket's (first, last) VALUE pair — runs never split inside a
    bucket, and a run spanning buckets is stitched by comparing
    adjacent buckets' boundary values on the driver (O(n_buckets)).
    Distinct counts ride one batch-deduped domain exchange."""
    from ray.data.aggregate import Count, Max, Min, Sum

    cols = ["event_type", "user_id"]
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id"] + cols)

    g = ds.aggregate(Min("event_id", alias_name="lo"),
                     Max("event_id", alias_name="hi"),
                     Count(alias_name="n"))
    lo, hi, n_rows = int(g["lo"]), int(g["hi"]), int(g["n"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def add_bucket(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_id": pa.array(eid.astype(np.int64), pa.int64()),
            "bucket": pa.array((eid - lo) // width, pa.int64()),
        })
        for c in cols:
            t = t.append_column(c, batch[c].cast(pa.string()))
        return t

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_runs(df: pd.DataFrame) -> pa.Table:
        o = np.argsort(df["event_id"].to_numpy(np.int64))
        rows = []
        for ci, c in enumerate(cols):
            v = df[c].to_numpy(object)[o]
            runs = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
            rows.append((int(df["bucket"].iloc[0]), ci, runs,
                         str(v[0]), str(v[-1])))
        b, ci_, r, f, l = zip(*rows)
        return pa.table({
            "bucket": pa.array(list(b), pa.int64()),
            "col_id": pa.array(list(ci_), pa.int64()),
            "runs": pa.array(list(r), pa.int64()),
            "first_v": pa.array(list(f), pa.string()),
            "last_v": pa.array(list(l), pa.string()),
        })

    summ = keyed.groupby("bucket") \
        .map_groups(bucket_runs, batch_format="pandas").to_pandas() \
        .sort_values(["col_id", "bucket"])

    # stitch runs spanning adjacent buckets: one subtraction per seam
    runs_total = {}
    for ci in range(len(cols)):
        s = summ[summ["col_id"] == ci]
        r = int(s["runs"].sum())
        lastv = s["last_v"].to_numpy(object)
        firstv = s["first_v"].to_numpy(object)
        r -= int((lastv[:-1] == firstv[1:]).sum())
        runs_total[ci] = r

    # distinct counts: one batch-deduped domain exchange per column,
    # tagged into a single stream (the table_profile trick)
    def distinct_partials(batch: pa.Table) -> pa.Table:
        out_ci, out_v = [], []
        for ci, c in enumerate(cols):
            u = np.unique(batch[c].cast(pa.string())
                          .to_numpy(zero_copy_only=False).astype(object))
            out_ci.extend([ci] * len(u))
            out_v.extend(u.tolist())
        return pa.table({"col_id": pa.array(out_ci, pa.int64()),
                         "v": pa.array(out_v, pa.string())})

    nd = keyed.map_batches(distinct_partials, batch_format="pyarrow") \
        .groupby(["col_id", "v"]).aggregate(Count(alias_name="_c")) \
        .map_batches(lambda b: pa.table({
            "col_id": b["col_id"].cast(pa.int64()),
            "one": pa.array([1] * b.num_rows, pa.int64())}),
            batch_format="pyarrow") \
        .groupby("col_id").aggregate(Sum("one", alias_name="n_distinct")) \
        .to_pandas().set_index("col_id")["n_distinct"]

    return pd.DataFrame({
        "column": cols,
        "n_rows": np.full(len(cols), n_rows, np.int64),
        "n_runs_natural": np.array([runs_total[i] for i in
                                    range(len(cols))], np.int64),
        "n_distinct": np.array([int(nd[i]) for i in range(len(cols))],
                               np.int64),
    })


def lineitem_weighted_quantiles(
        sf_dir: str,
        qs: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4), (9, 10)),
        n_hist: int = 1 << 16, max_refine_rows: int = 5_000_000):
    """(q_num, q_den, wq_cents, total_weight) — EXACT WEIGHTED
    quantiles of lineitem price under the quantity measure: the
    weighted member of the selection family (exact_global_quantiles is
    uniform-weight, events_equidepth_bins is multi-rank uniform;
    curation constantly needs the weighted form — "the median BYTE is
    in a file of what size", "half the tokens come from docs shorter
    than X"). Quantile q = a/b is the smallest value v whose
    cumulative weight satisfies cum(v)·b ≥ a·W — the comparison stays
    cross-multiplied integer on both sides, no float rank ever forms.

    Same 3-pass selection shape: scalar (W, min, max) → WEIGHTED
    equal-width bincount partials through one domain-sized exchange
    (driver locates each target's bucket + the exclusive weight carry)
    → ONE filtered gather of the few hot buckets, exact per-value
    weight cumsum inside. Zero sort, zero co-location.

    Oracle: per-value weight sums + window cumsum + min(v) under the
    identical cross-multiplied HUGEINT predicate."""
    from ray.data.aggregate import Max, Min, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_extendedprice", "l_quantity"])

    def narrow(batch: pa.Table) -> pa.Table:
        c = np.round(batch["l_extendedprice"]
                     .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        w = np.round(batch["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        return pa.table({"c": pa.array(c, pa.int64()),
                         "w": pa.array(w, pa.int64())})

    vals = ds.map_batches(narrow, batch_format="pyarrow")

    g = vals.aggregate(Sum("w", alias_name="W"),
                       Min("c", alias_name="lo"),
                       Max("c", alias_name="hi"))
    W, lo, hi = int(g["W"]), int(g["lo"]), int(g["hi"])
    width = max(1, -(-(hi - lo + 1) // n_hist))

    def hist(batch: pa.Table) -> pa.Table:
        b = (batch["c"].to_numpy(zero_copy_only=False) - lo) // width
        wt = batch["w"].to_numpy(zero_copy_only=False)
        # float64 bincount weights are exact below 2^53 per partial
        cnt = np.bincount(b, weights=wt).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "wsum": pa.array(cnt[nz], pa.int64())})

    hdf = vals.map_batches(hist, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("wsum", alias_name="wsum")) \
        .to_pandas().sort_values("bucket")
    buckets = hdf["bucket"].to_numpy(np.int64)
    cumw = hdf["wsum"].to_numpy(np.int64).cumsum()

    targets = []  # (q_num, q_den, bucket, exclusive weight carry)
    for a, b in qs:
        # first bucket where cum·b >= a·W  (Python ints: no overflow)
        j = next(i for i, cw in enumerate(cumw)
                 if int(cw) * b >= a * W)
        before = int(cumw[j - 1]) if j else 0
        targets.append((a, b, int(buckets[j]), before))
    needed = sorted({t[2] for t in targets})
    assert sum(int(hdf["wsum"].iloc[int(np.searchsorted(buckets, bk))])
               for bk in needed) <= max_refine_rows * 64, \
        "refine set too large — recurse inside the hot bucket"

    need_arr = np.array(needed, np.int64)

    def gather(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        m = np.isin((c - lo) // width, need_arr)
        return pa.table({"c": pa.array(c[m], pa.int64()),
                         "w": pa.array(w[m], pa.int64())})

    ref = vals.map_batches(gather, batch_format="pyarrow").to_pandas()
    ref["bucket"] = (ref["c"] - lo) // width

    rows = []
    for a, b, bk, before in targets:
        sub = ref[ref["bucket"] == bk].groupby("c")["w"].sum() \
            .sort_index()
        cw = before + sub.cumsum()
        v = int(cw.index[np.searchsorted(
            cw.to_numpy() * b, a * W, side="left")])
        rows.append((a, b, v, W))
    return pd.DataFrame(rows, columns=["q_num", "q_den", "wq_cents",
                                       "total_weight"]).astype("int64")


def events_chi2_assoc(sf_dir: str):
    """(event_type, dow, o, e_micro, chi2_term_micro) — chi-square
    contingency audit of event_type × day-of-week: the categorical
    ASSOCIATION test the drift family lacks (PSI/KS/U compare one
    numeric column across time; chi² asks whether two categorical
    columns are independent — a type whose traffic concentrates on
    particular weekdays flags scheduling artifacts or bot traffic).
    The full per-cell table is emitted so an auditor reads WHERE the
    dependence lives, not just that it exists — INCLUDING zero-observed
    cells (a type that never fires on some weekday contributes
    (0−E)²/E = E, exactly the strongest concentration signal), so
    Σ chi2_term_micro / 1e6 is the statistic at (|types|−1)(|dows|−1)
    degrees of freedom over the observed type/dow domains.

    Exactness: O, N and the margins R, C are exact integers from ONE
    (type, dow)-domain exchange (map-side bincount partials; everything
    after is domain-sized on the driver). dow avoids locale/engine
    calendar conventions entirely: (epoch_us // 86400e6 + 4) % 7 with
    Monday = 0, mirrored literally in SQL. e_micro = R·C·1e6 // N is
    integer floor division on arbitrary-precision ints;
    chi2_term = (O·N − R·C)² / (N·R·C) is evaluated with the identical
    float64 expression shape on both sides, then micro-rounded per cell
    BEFORE the integer sum, so no float accumulation order exists."""
    import math

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000 + 4) % 7).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"event_type": et, "dow": dow, "n": 1})
        g = df.groupby(["event_type", "dow"], sort=False)["n"].sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "dow"]) \
        .aggregate(Sum("n", alias_name="o")).to_pandas()

    # densify to the observed type × dow cross product: O = 0 cells
    # carry chi2 mass (0−E)²/E = E and must not be dropped
    full = pd.MultiIndex.from_product(
        [sorted(cells["event_type"].unique()),
         sorted(cells["dow"].unique())], names=["event_type", "dow"])
    cells = cells.set_index(["event_type", "dow"]) \
        .reindex(full, fill_value=0).reset_index()

    n_tot = int(cells["o"].sum())
    r = cells.groupby("event_type")["o"].transform("sum").astype(object)
    c = cells.groupby("dow")["o"].transform("sum").astype(object)
    rows = []
    for (t, d, o), rr, cc in zip(
            cells[["event_type", "dow", "o"]].itertuples(index=False),
            r, c):
        o, rr, cc = int(o), int(rr), int(cc)
        e_micro = rr * cc * 1_000_000 // n_tot
        num = float(o * n_tot - rr * cc)
        term = num * num / (float(n_tot) * float(rr) * float(cc))
        rows.append((t, int(d), o, e_micro,
                     math.floor(term * 1_000_000.0 + 0.5)))
    out = pd.DataFrame(rows, columns=["event_type", "dow", "o",
                                      "e_micro", "chi2_term_micro"])
    return out.astype({"dow": "int64", "o": "int64", "e_micro": "int64",
                       "chi2_term_micro": "int64"})


def benford_audit(sf_dir: str):
    """(digit, n, benford_expected_micro) — Benford first-digit audit
    of lineitem extended prices: the fraud/synthetic-data screen that
    compares the observed leading-digit distribution of a naturally
    heavy-tailed measure against log10(1 + 1/d). The driver's synthetic
    prices are NOT Benford-distributed — the point of the query is the
    comparison table itself (an auditor reads the deviation).

    Scale shape: map-only exact first digit of the integer-cents value
    (repeated //10 until < 10 — ~6 vectorized int64 passes, no float
    log near power-of-ten boundaries), per-batch bincount partials, one
    9-row exchange."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["l_extendedprice"]
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        v = cents[cents > 0]  # cents > 0, mirrored in the oracle (a
        # sub-cent positive price would otherwise diverge)
        while (v >= 10).any():
            m = v >= 10
            v = np.where(m, v // 10, v)
        cnt = np.bincount(v, minlength=10)[1:10]
        nz = np.flatnonzero(cnt) + 1
        return pa.table({"digit": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz - 1], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n", alias_name="n")).to_pandas() \
        .sort_values("digit")
    d = agg["digit"].to_numpy(np.int64)
    exp = np.round(np.log10(1.0 + 1.0 / d) * 1_000_000).astype(np.int64)
    return pd.DataFrame({
        "digit": d,
        "n": agg["n"].to_numpy(np.int64),
        "benford_expected_micro": exp,
    })


def winsorized_stats(sf_dir: str, lo_q: float = 0.01, hi_q: float = 0.99):
    """(n, lo_micro, hi_micro, sum_clipped_micro, n_clipped_lo,
    n_clipped_hi) — WINSORIZED aggregation of the event values: clip at
    the exact p01/p99 before summing, the robust-preprocessing step
    that keeps one corrupt sensor from owning a mean. Bounds come from
    the same 3-pass exact-selection machinery as exact_global_quantiles
    (histogram-refine, zero sort); the clip + sum is then map-only with
    integer-exact micro partials.

    Oracle: row_number rank selection for the same lower-quantile
    definition + least/greatest clipping."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])

    def to_micro(batch: pa.Table) -> pa.Table:
        vm = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 1_000_000).astype(np.int64)
        return pa.table({"vm": pa.array(vm, pa.int64())})

    vals = ds.map_batches(to_micro, batch_format="pyarrow").materialize()
    g = vals.aggregate(Count(alias_name="n"), Min("vm", alias_name="lo"),
                       Max("vm", alias_name="hi"))
    n, vlo, vhi = int(g["n"]), int(g["lo"]), int(g["hi"])
    width = max(1, -(-(vhi - vlo + 1) // 65536))

    def hist(batch: pa.Table) -> pa.Table:
        b = (batch["vm"].to_numpy(zero_copy_only=False) - vlo) // width
        cnt = np.bincount(b)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    hdf = vals.map_batches(hist, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("c", alias_name="c")) \
        .to_pandas().sort_values("bucket")
    buckets = hdf["bucket"].to_numpy(np.int64)
    cum = hdf["c"].to_numpy(np.int64).cumsum()

    import math
    r_lo = max(1, math.ceil(lo_q * n))
    r_hi = max(1, math.ceil(hi_q * n))

    # both target buckets are known up front — ONE filtered pass
    # gathers the rows of both, tagged by which rank they serve
    def bucket_of(rank: int) -> tuple[int, int]:
        bi = int(np.searchsorted(cum, rank))
        return int(buckets[bi]), (int(cum[bi - 1]) if bi else 0)

    (b_lo, before_lo), (b_hi, before_hi) = bucket_of(r_lo), bucket_of(r_hi)

    def pick(batch: pa.Table) -> pa.Table:
        v = batch["vm"].to_numpy(zero_copy_only=False)
        b = (v - vlo) // width
        keep = (b == b_lo) | (b == b_hi)
        vv = v[keep]
        # tag 1 = the hi bucket; collapses to all-0 when both quantiles
        # land in the same bucket
        tag = ((((vv - vlo) // width) == b_hi) & (b_hi != b_lo)) \
            .astype(np.int64)
        return pa.table({"vm": pa.array(vv, pa.int64()),
                         "tag": pa.array(tag, pa.int64())})

    picked = vals.map_batches(pick, batch_format="pyarrow").to_pandas()

    def rank_in(tag: int, rank: int, before: int) -> int:
        inb = picked.loc[picked["tag"] == tag, "vm"].to_numpy(np.int64)
        k = rank - before - 1
        return int(np.partition(inb, k)[k])

    lo_v = rank_in(0, r_lo, before_lo)
    hi_v = rank_in(1 if b_hi != b_lo else 0, r_hi, before_hi)

    def clip_partial(batch: pa.Table) -> pa.Table:
        v = batch["vm"].to_numpy(zero_copy_only=False)
        c = np.clip(v, lo_v, hi_v)
        return pa.table({
            "s": pa.array([int(c.sum())], pa.int64()),
            "nlo": pa.array([int((v < lo_v).sum())], pa.int64()),
            "nhi": pa.array([int((v > hi_v).sum())], pa.int64()),
        })

    t = vals.map_batches(clip_partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Sum("nlo", alias_name="nlo"),
                   Sum("nhi", alias_name="nhi"))
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "lo_micro": np.array([lo_v], np.int64),
        "hi_micro": np.array([hi_v], np.int64),
        "sum_clipped_micro": np.array([int(t["s"])], np.int64),
        "n_clipped_lo": np.array([int(t["nlo"])], np.int64),
        "n_clipped_hi": np.array([int(t["nhi"])], np.int64),
    })


def events_equidepth_bins(sf_dir: str, k: int = 8):
    """(bin_id, upper_micro) — EQUI-DEPTH histogram boundaries over the
    event values: the k-quantile fence posts (rank ceil(i·n/k),
    i=1..k) an optimizer stores as column statistics and a range
    partitioner uses as splitters. All k boundaries come from ONE
    65536-bucket bincount exchange + ONE filtered gather of the (≤ k)
    buckets that hold a target rank — the multi-rank generalization of
    exact_global_quantiles' histogram-refine selection; still zero
    sort, zero co-location.

    Oracle: row_number rank selection per boundary."""
    import math

    from ray.data.aggregate import Count, Max, Min, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])

    def to_micro(batch: pa.Table) -> pa.Table:
        vm = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 1_000_000).astype(np.int64)
        return pa.table({"vm": pa.array(vm, pa.int64())})

    vals = ds.map_batches(to_micro, batch_format="pyarrow").materialize()
    g = vals.aggregate(Count(alias_name="n"), Min("vm", alias_name="lo"),
                       Max("vm", alias_name="hi"))
    n, vlo, vhi = int(g["n"]), int(g["lo"]), int(g["hi"])
    width = max(1, -(-(vhi - vlo + 1) // 65536))

    def hist(batch: pa.Table) -> pa.Table:
        b = (batch["vm"].to_numpy(zero_copy_only=False) - vlo) // width
        cnt = np.bincount(b)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    hdf = vals.map_batches(hist, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("c", alias_name="c")) \
        .to_pandas().sort_values("bucket")
    buckets = hdf["bucket"].to_numpy(np.int64)
    cum = hdf["c"].to_numpy(np.int64).cumsum()

    ranks = [max(1, math.ceil(i * n / k)) for i in range(1, k + 1)]
    info = []
    for r in ranks:
        bi = int(np.searchsorted(cum, r))
        info.append((int(buckets[bi]), int(cum[bi - 1]) if bi else 0, r))
    need = sorted({b for b, _, _ in info})
    need_arr = np.asarray(need, np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        v = batch["vm"].to_numpy(zero_copy_only=False)
        b = (v - vlo) // width
        keep = np.isin(b, need_arr)
        return pa.table({"vm": pa.array(v[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})

    picked = vals.map_batches(pick, batch_format="pyarrow").to_pandas()
    by_bucket = {b: g["vm"].to_numpy(np.int64)
                 for b, g in picked.groupby("b")}
    uppers = []
    for b, before, r in info:
        arr = by_bucket[b]
        kk = r - before - 1
        uppers.append(int(np.partition(arr, kk)[kk]))
    return pd.DataFrame({
        "bin_id": np.arange(1, k + 1, dtype=np.int64),
        "upper_micro": np.array(uppers, np.int64),
    })


def shuffle_order_audit(sf_dir: str, n_buckets: int = 256):
    """(ordering, n_rows, n_runs_source) — TRAINING-ORDER mixing audit:
    how well does each read order decorrelate the `source` column?
    Long same-source runs in training order bias gradient batches; the
    fix at 100 TB is not random_shuffle's all-to-all but reading in
    HASH order (order by md5(doc_id) — deterministic, resumable, and
    free if the layout is already hash-bucketed). This measures both:
    runs of consecutive equal sources in natural doc_id order vs in
    md5-hash order — hash order's run count approaches the n(1-1/k)
    ideal of an independent stream.

    Same boundary-value scan carry as rle_compression_advisor, run
    over TWO orderings in one exchange (the ordering id rides the
    bucket key)."""
    import hashlib

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def add_keys(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hk = np.array([int(hashlib.md5(str(int(i)).encode())
                           .hexdigest()[:15], 16) for i in did], np.int64)
        src = batch["source"].to_pylist()
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "hkey": pa.array(hk, pa.int64()),
            "source": pa.array(src, pa.string()),
        })

    keyed = ds.map_batches(add_keys, batch_format="pyarrow").materialize()

    def runs_for(order_col: str) -> int:
        # range-bucket by the ordering key
        from ray.data.aggregate import Max, Min
        gg = keyed.aggregate(Min(order_col, alias_name="lo"),
                             Max(order_col, alias_name="hi"))
        lo, hi = int(gg["lo"]), int(gg["hi"])
        width = max(1, -(-(hi - lo + 1) // n_buckets))

        def bucketize(batch: pa.Table) -> pa.Table:
            k = batch[order_col].to_numpy(zero_copy_only=False)
            return pa.table({
                "k": pa.array(k.astype(np.int64), pa.int64()),
                "source": batch["source"],
                "bucket": pa.array((k - lo) // width, pa.int64()),
            })

        def bucket_runs(df: pd.DataFrame) -> pa.Table:
            o = np.argsort(df["k"].to_numpy(np.int64))
            v = df["source"].to_numpy(object)[o]
            runs = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
            return pa.table({
                "bucket": pa.array([int(df["bucket"].iloc[0])], pa.int64()),
                "runs": pa.array([runs], pa.int64()),
                "first_v": pa.array([str(v[0])], pa.string()),
                "last_v": pa.array([str(v[-1])], pa.string()),
            })

        summ = keyed.map_batches(bucketize, batch_format="pyarrow") \
            .groupby("bucket").map_groups(bucket_runs,
                                          batch_format="pandas") \
            .to_pandas().sort_values("bucket")
        r = int(summ["runs"].sum())
        lastv = summ["last_v"].to_numpy(object)
        firstv = summ["first_v"].to_numpy(object)
        r -= int((lastv[:-1] == firstv[1:]).sum())
        return r

    n = keyed.count()
    return pd.DataFrame({
        "ordering": ["doc_id", "md5_hash"],
        "n_rows": np.array([n, n], np.int64),
        "n_runs_source": np.array([runs_for("doc_id"),
                                   runs_for("hkey")], np.int64),
    })


def lineitem_moment_stats(sf_dir: str):
    """(l_returnflag, n, s1, s2, s3, s4, skew_micro, kurt_micro) —
    HIGHER-MOMENT profile of l_quantity per return flag: exact power
    sums Σx..Σx⁴ fold map-side as (hi, lo) int64 LIMB PAIRS of each
    batch partial (the single-pass combinable form — the whole point
    at 100 TB: third/fourth moments need no second pass; the 32-bit
    lo limb keeps the cross-batch Sum exact to ~2·10¹³ rows where a
    raw int64 Σx⁴ fold would overflow near 10¹² — same scheme as
    lineitem corr), then population skewness m3/m2^1.5 and excess
    m4/m2²-3 from the exact sums, rounded to micro. The oracle
    computes the identical formula from the identical integer sums, so
    the float path is a single deterministic expression on both
    sides."""
    import pandas as pd
    from ray.data.aggregate import Sum

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])

    LIMB = 1 << 32

    def powers(batch: pa.Table) -> pa.Table:
        q = np.round(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)  # integral values
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pylist(),
            "one": np.ones(len(q), np.int64),
            "s1": q, "s2": q ** 2, "s3": q ** 3, "s4": q ** 4})
        g = df.groupby("l_returnflag", sort=False).sum().reset_index()
        out = {"l_returnflag": pa.array(g["l_returnflag"], pa.string()),
               "one": pa.array(g["one"].to_numpy(np.int64), pa.int64())}
        for c in ("s1", "s2", "s3", "s4"):  # nonneg → plain limb split
            v = g[c].to_numpy(np.int64)
            out[f"{c}_hi"] = pa.array(v >> np.int64(32), pa.int64())
            out[f"{c}_lo"] = pa.array(v & np.int64(LIMB - 1), pa.int64())
        return pa.table(out)

    aggs = [Sum("one", alias_name="n")]
    for c in ("s1", "s2", "s3", "s4"):
        aggs += [Sum(f"{c}_hi", alias_name=f"{c}_hi"),
                 Sum(f"{c}_lo", alias_name=f"{c}_lo")]
    agg = ds.map_batches(powers, batch_format="pyarrow") \
        .groupby("l_returnflag").aggregate(*aggs) \
        .to_pandas()  # one row per flag — domain-bounded
    for c in ("s1", "s2", "s3", "s4"):  # exact Python-int recombine
        agg[c] = [(int(h) << 32) + int(l) for h, l in
                  zip(agg[f"{c}_hi"], agg[f"{c}_lo"])]

    # the float path is written as the EXACT expression the oracle SQL
    # mirrors (same literals, same left-associative order, sqrt instead
    # of pow) so both engines produce bit-identical doubles from the
    # identical integer sums
    n = agg["n"].to_numpy(np.float64)
    s1 = agg["s1"].to_numpy(np.float64)
    s2 = agg["s2"].to_numpy(np.float64)
    s3 = agg["s3"].to_numpy(np.float64)
    s4 = agg["s4"].to_numpy(np.float64)
    mean = s1 / n
    r2 = s2 / n
    r3 = s3 / n
    r4 = s4 / n
    m2 = r2 - mean * mean
    m3 = r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean
    m4 = r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2 \
        - 3.0 * mean * mean * mean * mean
    skew = m3 / (m2 * np.sqrt(m2))
    kurt = m4 / (m2 * m2) - 3.0
    out = pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "n": agg["n"].astype(np.int64),
        "s1": agg["s1"].astype(np.int64), "s2": agg["s2"].astype(np.int64),
        "s3": agg["s3"].astype(np.int64), "s4": agg["s4"].astype(np.int64),
        "skew_micro": np.round(skew * 1e6).astype(np.int64),
        "kurt_micro": np.round(kurt * 1e6).astype(np.int64),
    })
    return out


def part_type_supplier_hhi(sf_dir: str):
    """(p_brand, n_suppliers, n_items, hhi_micro) — supplier
    CONCENTRATION per part brand (Herfindahl–Hirschman index over
    suppliers' lineitem shares): hhi = Σ share_i² from exact integer
    counts, micro-rounded — the supply-risk metric a sourcing audit
    reads. One lineitem pass with a broadcast partkey→brand map (part
    is the small side), per-(brand, supplier) count exchange, then a
    brand-domain fold."""
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]).to_pandas()
    bmap_ref = ray.put(dict(zip(part["p_partkey"].to_numpy(np.int64),
                                part["p_brand"])))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def tag(batch: pa.Table) -> pa.Table:
        bm = ray.get(bmap_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        brands = [bm[int(k)] for k in pk]
        df = pd.DataFrame({
            "p_brand": brands,
            "l_suppkey": batch["l_suppkey"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n": np.ones(len(pk), np.int64)})
        g = df.groupby(["p_brand", "l_suppkey"], sort=False).sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    per_supp = li.map_batches(tag, batch_format="pyarrow") \
        .groupby(["p_brand", "l_suppkey"]).aggregate(
            Sum("n", alias_name="n"))

    def hhi(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("p_brand", sort=False).agg(
            n_suppliers=("l_suppkey", "size"),
            n_items=("n", "sum"),
            sq=("n", lambda s: int((s.to_numpy(np.int64) ** 2).sum())))
        g = g.reset_index()
        hhi_micro = np.round(
            1e6 * g["sq"].to_numpy(np.float64)
            / g["n_items"].to_numpy(np.float64) ** 2).astype(np.int64)
        return pa.table({
            "p_brand": pa.array(g["p_brand"], pa.string()),
            "n_suppliers": pa.array(
                g["n_suppliers"].to_numpy(np.int64), pa.int64()),
            "n_items": pa.array(g["n_items"].to_numpy(np.int64),
                                pa.int64()),
            "hhi_micro": pa.array(hhi_micro, pa.int64()),
        })

    return bucketed_group_map(per_supp, "p_brand", hhi, num_buckets=8)


def lineitem_price_qty_ols(sf_dir: str):
    """(l_returnflag, n, slope_micro, intercept_micro) — ordinary
    least squares of extendedprice-cents on quantity per return flag,
    from SUFFICIENT STATISTICS: exact sums (n, Σx, Σy, Σxy, Σx²) fold
    map-side in one pass as (hi, lo) int64 limb pairs of each batch
    partial (the single-pass regression shape — at 100 TB there is no
    second pass; Σxy is ~5·10⁸/row so a raw int64 fold overflows past
    ~2·10¹⁰ rows, the limb fold stays exact to ~2·10¹³ — same scheme
    as lineitem corr), then slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²) and intercept = (Σy − slope·Σx)/n as ONE mirrored
    float expression each, micro-rounded. The oracle computes the
    identical formula from the identical integer sums."""
    import pandas as pd
    from ray.data.aggregate import Sum

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])

    def sums(batch: pa.Table) -> pa.Table:
        x = np.round(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        y = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pylist(),
            "one": np.ones(len(x), np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        g = df.groupby("l_returnflag", sort=False).sum().reset_index()
        out = {"l_returnflag": pa.array(g["l_returnflag"], pa.string()),
               "one": pa.array(g["one"].to_numpy(np.int64), pa.int64())}
        for c in ("sx", "sy", "sxy", "sxx"):  # nonneg → plain limb split
            v = g[c].to_numpy(np.int64)
            out[f"{c}_hi"] = pa.array(v >> np.int64(32), pa.int64())
            out[f"{c}_lo"] = pa.array(v & np.int64((1 << 32) - 1),
                                      pa.int64())
        return pa.table(out)

    aggs = [Sum("one", alias_name="n")]
    for c in ("sx", "sy", "sxy", "sxx"):
        aggs += [Sum(f"{c}_hi", alias_name=f"{c}_hi"),
                 Sum(f"{c}_lo", alias_name=f"{c}_lo")]
    agg = ds.map_batches(sums, batch_format="pyarrow") \
        .groupby("l_returnflag").aggregate(*aggs) \
        .to_pandas()  # one row per flag
    for c in ("sx", "sy", "sxy", "sxx"):  # exact Python-int recombine
        agg[c] = [(int(h) << 32) + int(l) for h, l in
                  zip(agg[f"{c}_hi"], agg[f"{c}_lo"])]

    n = agg["n"].to_numpy(np.float64)
    sx = agg["sx"].to_numpy(np.float64)
    sy = agg["sy"].to_numpy(np.float64)
    sxy = agg["sxy"].to_numpy(np.float64)
    sxx = agg["sxx"].to_numpy(np.float64)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "n": agg["n"].astype(np.int64),
        "slope_micro": np.round(slope * 1e6).astype(np.int64),
        "intercept_micro": np.round(intercept * 1e6).astype(np.int64),
    })
