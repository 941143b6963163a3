"""Stream-shaped operators over the driver `events` table
(event_id:int64, ts:timestamp[us], user_id:int64, event_type:string,
value:double, props:string).

Ray Data is a batch engine; windows are expressed as grouped aggregates
over (key, window-index) with partial per-batch pre-aggregation — the
map-side combine pattern (destor's per-phase counters W5 work the same
way). Ordering assumption: tumbling windows only need the window index,
not intra-window order, so no sort is required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _read_events(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def events_windowed(sf_dir: str, window_sec: int = 3600):
    """Tumbling-window per-user counts/sums:
    (user_id, win, n_events, sum_value). Pre-aggregates inside
    map_batches (one row per (user, win) per batch) before the global
    groupby — the shuffle moves partials, not events."""
    ds = _read_events(sf_dir).select_columns(["ts", "user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_pandas()
        win = (ts.astype("int64") // 1_000_000 // window_sec).to_numpy()
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "win": win,
            "n": 1,
            "v": batch["value"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["user_id", "win"], sort=False).agg(
            n_events=("n", "sum"), sum_value=("v", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["user_id", "win"], sort=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")).reset_index()
        g["sum_value"] = g["sum_value"].round(6)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    from ..stages.grouped import bucketed_group_map

    def add_key(batch: pa.Table) -> pa.Table:
        k = (batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64) * np.int64(1_000_003)
             + batch["win"].to_numpy(zero_copy_only=False).astype(np.int64))
        return batch.append_column("uw", pa.array(k, pa.int64()))

    keyed = partials.map_batches(add_key, batch_format="pyarrow")
    out = bucketed_group_map(keyed, "uw", lambda df: combine(df.drop(columns=["uw"])),
                             num_buckets=32)
    return out


def events_type_stats(sf_dir: str):
    """Per-event-type counters (W5 per-job accounting analog)."""
    from ray.data.aggregate import Count, Max, Min, Sum
    ds = _read_events(sf_dir).select_columns(["event_type", "value"])
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"))


def _events_ts_us(sf_dir: str):
    """(user_id, ts_us) — the narrowed event stream both session
    consumers start from."""
    ds = _read_events(sf_dir).select_columns(["ts", "user_id"])

    def to_us(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64())
        return pa.table({"user_id": batch["user_id"], "ts_us": us})

    return ds.map_batches(to_us, batch_format="pyarrow")


def _session_bounds(df: pd.DataFrame, gap_sec: int) -> pd.DataFrame:
    """Gaps-and-islands core shared by events_sessionize and
    events_max_concurrency (ONE copy of the gap rule): sort (user, ts),
    a gap > gap_sec (or a user change) opens a session; returns one row
    per session (user_id, sess, n_events, start_us, end_us)."""
    df = df.sort_values(["user_id", "ts_us"], kind="stable")
    uid = df["user_id"].to_numpy()
    ts = df["ts_us"].to_numpy()
    new_user = np.empty(len(df), dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    gap = np.empty(len(df), dtype=bool)
    gap[0] = True
    gap[1:] = (ts[1:] - ts[:-1]) > gap_sec * 1_000_000
    sess_id = np.cumsum(new_user | gap) - 1
    return pd.DataFrame({"user_id": uid, "sess": sess_id, "ts_us": ts}) \
        .groupby(["user_id", "sess"], sort=False) \
        .agg(n_events=("ts_us", "size"), start_us=("ts_us", "min"),
             end_us=("ts_us", "max")).reset_index()


def events_sessionize(sf_dir: str, gap_sec: int = 1800):
    """Session windows per user: events sorted by ts within user; a gap >
    gap_sec starts a new session. Returns (user_id, session_idx,
    n_events, start_us, end_us). Partition-local ordering inside each
    user group (the reference's total-stream-order concern scoped per
    key, SURVEY.md §2.10). Oracle: lag() gaps-and-islands SQL."""
    from ..stages.grouped import bucketed_group_map

    def sessions(df: pd.DataFrame) -> pa.Table:
        g = _session_bounds(df, gap_sec)
        g["session_idx"] = g.groupby("user_id", sort=False).cumcount()
        return pa.Table.from_pandas(
            g[["user_id", "session_idx", "n_events", "start_us", "end_us"]],
            preserve_index=False).replace_schema_metadata(None)

    return bucketed_group_map(_events_ts_us(sf_dir), "user_id", sessions,
                              num_buckets=32)


def events_rolling_median(sf_dir: str, w: int = 7, n_buckets: int = 32):
    """(event_id, event_type, med_micro) — per-type ROLLING MEDIAN of
    the value series over a ROWS w−1 PRECEDING frame in event_id order:
    the ORDER-STATISTIC window the associative family can't express
    (sliding sum/EWMA fold through prefix identities; a median has no
    prefix decomposition — robust smoothing for spike-laden telemetry
    is exactly why pipelines want it). Lower-median convention
    sorted[(n−1)//2], which is DuckDB's quantile_disc(0.5).

    Scale shape — the scan-carry family's fourth data shape (after
    sums, mins and boundary PAIRS): an order-statistic frame needs the
    w−1 preceding VALUES, so event_id-range buckets exchange only
    per-(bucket, type) boundary TAILS (the last ≤ w−1 rows), an
    O(buckets·types·w) driver set; pass 2 prepends each type's carried
    tail and computes every frame inside the bucket — full frames
    vectorized via a (rows × w) sliding view + axis-sort, the ≤ w−1
    genuinely-short frames at each type's global head by a bounded
    loop. Per-type co-locate-and-sort (the regime this avoids) would
    ship whole type partitions; this ships w−1 rows per bucket·type.

    Oracle: quantile_disc(value_micro, 0.5) OVER (PARTITION BY type
    ORDER BY event_id ROWS BETWEEN w−1 PRECEDING AND CURRENT ROW)."""
    import ray as _ray
    from ray.data.aggregate import Max, Min

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "event_type", "value"])

    g = ds.aggregate(Min("event_id", alias_name="lo"),
                     Max("event_id", alias_name="hi"))
    lo, hi = int(g["lo"]), int(g["hi"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def narrow(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({
            "eid": pa.array(eid, pa.int64()),
            "event_type": batch["event_type"],
            "vmic": pa.array(vmic, pa.int64()),
            "bucket": pa.array((eid - lo) // width, pa.int64()),
        })

    keyed = ds.map_batches(narrow, batch_format="pyarrow").materialize()

    def tails(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values("eid", kind="stable")
        parts = []
        for t, gd in df.groupby("event_type", sort=False):
            parts.append(gd.tail(w - 1))
        out = pd.concat(parts)
        return pa.table({
            "bucket": pa.array(out["bucket"].to_numpy(np.int64)),
            "event_type": pa.array(out["event_type"], pa.string()),
            "eid": pa.array(out["eid"].to_numpy(np.int64)),
            "vmic": pa.array(out["vmic"].to_numpy(np.int64)),
        })

    tl = keyed.groupby("bucket") \
        .map_groups(tails, batch_format="pandas").to_pandas() \
        .sort_values(["bucket", "eid"])

    # driver: per (bucket, type) the last <= w-1 values of ALL
    # preceding buckets — walk buckets in ascending eid-range order
    carry: dict[tuple, np.ndarray] = {}
    hist: dict[str, np.ndarray] = {}
    for b, gb in tl.groupby("bucket", sort=True):
        for t in gb["event_type"].unique():
            carry[(int(b), t)] = hist.get(t, np.empty(0, np.int64))
        for t, gt in gb.groupby("event_type", sort=False):
            prev = hist.get(t, np.empty(0, np.int64))
            hist[t] = np.concatenate(
                [prev, gt["vmic"].to_numpy(np.int64)])[-(w - 1):]
    carry_ref = _ray.put(carry)
    mid_full = (w - 1) // 2

    def medians(df: pd.DataFrame) -> pa.Table:
        car = _ray.get(carry_ref)
        b = int(df["bucket"].iloc[0])
        df = df.sort_values("eid", kind="stable")
        eids, types, meds = [], [], []
        for t, gd in df.groupby("event_type", sort=False):
            v = gd["vmic"].to_numpy(np.int64)
            pre = car.get((b, t), np.empty(0, np.int64))
            seq = np.concatenate([pre, v])
            k = len(pre)
            m = np.empty(len(v), np.int64)
            # frames ending at seq index i for i in [k, len(seq))
            first_full = max(k, w - 1)
            for i in range(k, min(first_full, len(seq))):
                fr = np.sort(seq[max(0, i - w + 1):i + 1])
                m[i - k] = fr[(len(fr) - 1) // 2]
            if len(seq) >= w:
                sw = np.lib.stride_tricks.sliding_window_view(seq, w)
                # frame ending at i = w-1+j for row j of sw
                j0 = first_full - (w - 1)
                med_full = np.sort(sw[j0:], axis=1)[:, mid_full]
                m[first_full - k:] = med_full
            eids.append(gd["eid"].to_numpy(np.int64))
            types.extend([t] * len(v))
            meds.append(m)
        return pa.table({
            "event_id": pa.array(np.concatenate(eids), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "med_micro": pa.array(np.concatenate(meds), pa.int64()),
        })

    return keyed.groupby("bucket") \
        .map_groups(medians, batch_format="pandas")


def events_max_concurrency(sf_dir: str, gap_sec: int = 1800,
                           n_buckets: int = 64):
    """(n_sessions, max_concurrent, t_at_max_us) — INTERVAL SWEEP-LINE:
    the peak number of simultaneously-open user sessions (events_
    sessionize's gap rule, closed intervals [start_us, end_us]) and the
    earliest instant it is reached — the capacity-planning read
    ("provision for peak concurrent sessions") and the one interval
    operator the window family lacks (range join matches pairs; this
    aggregates OVERLAP DEPTH over the whole timeline).

    concurrency(t) = #starts ≤ t − #ends < t, evaluated at boundary
    times only (between boundaries it is constant). The classic sweep
    is a global sort + running sum; the scale shape here is the
    scan-carry family's key observation applied to a MAX-of-prefix:
    bucket the boundary stream by TIME RANGE; inside a bucket the
    local term local_s_incl(t) − local_e_excl(t) is carry-independent,
    so each bucket emits ONE row (starts, ends, local_max,
    t_at_local_max) in a single pass; the driver folds the O(buckets)
    exclusive carry Σ(starts−ends) and takes max(carry_b +
    local_max_b), earliest bucket winning ties (buckets are ascending
    disjoint time ranges, so the earliest bucket's attainment time is
    globally earliest). One user-keyed exchange builds sessions + one
    bucket exchange sweeps — no global sort ever forms.

    Oracle: the sessionize CTE → per-time boundary aggregate → window
    cumsum (ends exclusive via 1-PRECEDING frame) → max + arg-min-t."""
    from ray.data.aggregate import Max, Min

    from ..stages.grouped import bucketed_group_map

    def sessions(df: pd.DataFrame) -> pa.Table:
        g = _session_bounds(df, gap_sec)
        return pa.table({
            "start_us": pa.array(g["start_us"].to_numpy(np.int64),
                                 pa.int64()),
            "end_us": pa.array(g["end_us"].to_numpy(np.int64),
                               pa.int64()),
        })

    sess = bucketed_group_map(_events_ts_us(sf_dir), "user_id", sessions,
                              num_buckets=32).materialize()

    g = sess.aggregate(Min("start_us", alias_name="lo"),
                       Max("end_us", alias_name="hi"))
    lo, hi = int(g["lo"]), int(g["hi"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def boundaries(batch: pa.Table) -> pa.Table:
        s = batch["start_us"].to_numpy(zero_copy_only=False)
        e = batch["end_us"].to_numpy(zero_copy_only=False)
        t = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), np.int64),
                            -np.ones(len(e), np.int64)])
        return pa.table({
            "t": pa.array(t, pa.int64()),
            "d": pa.array(d, pa.int64()),
            "bucket": pa.array((t - lo) // width, pa.int64()),
        })

    bounds = sess.map_batches(boundaries, batch_format="pyarrow")

    def bucket_partial(df: pd.DataFrame) -> pa.Table:
        t = df["t"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        o = np.argsort(t, kind="stable")
        t_s, d_s = t[o], d[o]
        last = np.r_[t_s[1:] != t_s[:-1], True]
        ut = t_s[last]
        s_incl = np.cumsum(d_s == 1)[last]
        e_incl = np.cumsum(d_s == -1)[last]
        e_excl = e_incl - np.diff(np.r_[0, e_incl])
        local = s_incl - e_excl
        k = int(local.argmax())            # first index of the max
        return pa.table({
            "bucket": pa.array([int(df["bucket"].iloc[0])], pa.int64()),
            "starts": pa.array([int((d == 1).sum())], pa.int64()),
            "ends": pa.array([int((d == -1).sum())], pa.int64()),
            "local_max": pa.array([int(local[k])], pa.int64()),
            "t_local": pa.array([int(ut[k])], pa.int64()),
        })

    summ = bounds.groupby("bucket") \
        .map_groups(bucket_partial, batch_format="pandas").to_pandas() \
        .sort_values("bucket")
    st = summ["starts"].to_numpy(np.int64)
    en = summ["ends"].to_numpy(np.int64)
    carry = np.concatenate(([0], np.cumsum(st - en)[:-1]))
    cand = carry + summ["local_max"].to_numpy(np.int64)
    k = int(cand.argmax())                 # earliest bucket wins ties
    return pd.DataFrame({
        "n_sessions": [int(st.sum())],
        "max_concurrent": [int(cand[k])],
        "t_at_max_us": [int(summ["t_local"].iloc[k])],
    }).astype("int64")


def events_asof_join(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click"):
    """AS-OF join — a custom operator Ray Data lacks natively: for every
    `left_type` event, attach the user's most recent STRICTLY-PRECEDING
    `right_type` event time (NULL when none). Expressed as a composition
    the Dataset API allows: filter both sides at the read, bucket by
    user_id (co-partitioning key), sort inside the bucket by
    (ts_us, event_id), and forward-scan with a vectorized running
    maximum over the right side's times — no driver state, volume
    proportional to the two filtered sides. Deterministic tie rule:
    same-timestamp rows order by event_id, so a right event with ts
    equal to the left's counts only if its event_id is smaller (both
    the Ray scan and the SQL window use the identical (ts_us, event_id)
    ROWS-preceding frame). Returns
    (event_id, user_id, ts_us, last_right_us nullable)."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_id", "ts", "user_id",
                                              "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        sub = batch.filter(keep)
        return pa.table({
            "event_id": sub["event_id"],
            "user_id": sub["user_id"],
            "ts_us": sub["ts"].cast(pa.int64()),
            "is_left": pc.equal(sub["event_type"], left_type),
        })

    keyed = ds.map_batches(prep, batch_format="pyarrow")

    def asof(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "ts_us": pa.array([], pa.int64()),
                          "last_right_us": pa.array([], pa.int64())})
        if not len(df):
            return empty
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        left = df["is_left"].to_numpy()
        # right-side times (else a sentinel), shifted one row forward so a
        # row never sees itself, then a segmented running max that resets
        # at user boundaries (pandas groupby cummax — vectorized C)
        SENT = np.iinfo(np.int64).min
        rt = np.where(~left, ts, SENT)
        prev = np.empty(len(df), dtype=np.int64)
        prev[0] = SENT
        prev[1:] = rt[:-1]
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        prev[new_user] = SENT
        seg = np.cumsum(new_user) - 1
        run = pd.Series(prev).groupby(seg).cummax().to_numpy()
        out = df[left]
        sel = left.nonzero()[0]
        last = run[sel]
        valid = last != SENT
        last_col = pd.array(last, dtype="Int64")
        last_col[~valid] = pd.NA
        return pa.table({
            "event_id": pa.array(out["event_id"].to_numpy().astype(np.int64), pa.int64()),
            "user_id": pa.array(out["user_id"].to_numpy().astype(np.int64), pa.int64()),
            "ts_us": pa.array(out["ts_us"].to_numpy().astype(np.int64), pa.int64()),
            "last_right_us": pa.array(last_col, pa.int64()),
        })

    return bucketed_group_map(keyed, "user_id", asof, num_buckets=32)


def events_range_join(sf_dir: str, left_type: str = "purchase",
                      right_type: str = "click", window_sec: int = 3600):
    """RANGE join: for every `left_type` event, the count of the user's
    `right_type` events in the half-open window [ts - window, ts) —
    same co-partitioning topology as events_asof_join (filter at the
    read, bucket by user_id), with the in-bucket probe vectorized as
    two binary searches per left row over the user's sorted right-side
    times (searchsorted(t) - searchsorted(t - window)). Strictly-
    preceding semantics: right events at the exact left timestamp are
    excluded (mirrors the SQL RANGE ... 1 PRECEDING frame). Returns
    (event_id, user_id, ts_us, n_right)."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_id", "ts", "user_id",
                                              "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        sub = batch.filter(keep)
        return pa.table({
            "event_id": sub["event_id"],
            "user_id": sub["user_id"],
            "ts_us": sub["ts"].cast(pa.int64()),
            "is_left": pc.equal(sub["event_type"], left_type),
        })

    keyed = ds.map_batches(prep, batch_format="pyarrow")
    win_us = np.int64(window_sec) * 1_000_000

    def probe(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "ts_us": pa.array([], pa.int64()),
                          "n_right": pa.array([], pa.int64())})
        if not len(df):
            return empty
        out_e, out_u, out_t, out_n = [], [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            lf = g[g["is_left"]]
            if not len(lf):
                continue
            rts = np.sort(g.loc[~g["is_left"], "ts_us"].to_numpy())
            lt = lf["ts_us"].to_numpy()
            # window is OPEN at both ends: (t - win, t) — matches the SQL
            # frame RANGE BETWEEN win-1us PRECEDING AND 1 PRECEDING
            n = (np.searchsorted(rts, lt, side="left")
                 - np.searchsorted(rts, lt - win_us, side="right"))
            out_e.append(lf["event_id"].to_numpy().astype(np.int64))
            out_u.append(np.full(len(lf), uid, dtype=np.int64))
            out_t.append(lt.astype(np.int64))
            out_n.append(n.astype(np.int64))
        if not out_e:
            return empty
        return pa.table({
            "event_id": pa.array(np.concatenate(out_e), pa.int64()),
            "user_id": pa.array(np.concatenate(out_u), pa.int64()),
            "ts_us": pa.array(np.concatenate(out_t), pa.int64()),
            "n_right": pa.array(np.concatenate(out_n), pa.int64()),
        })

    return bucketed_group_map(keyed, "user_id", probe, num_buckets=32)


def events_user_daily_topk(sf_dir: str, k: int = 3):
    """Ranked-window shape: per DAY, the top-k users by event count with
    their rank (1-based; ties broken by smaller user_id — deterministic).
    Map-side pre-aggregation per (day, user) partials, then one bucketed
    groupby(day) with a vectorized per-day partial sort. Oracle: SQL
    row_number() OVER (PARTITION BY day ORDER BY cnt DESC, user_id)."""
    import pandas as pd

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_pandas()
        day = (ts.astype("int64") // 1_000_000 // 86400).to_numpy()
        df = pd.DataFrame({"day": day,
                           "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                           "n": 1})
        g = df.groupby(["day", "user_id"], sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def topk_per_day(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["day", "user_id"], sort=False)["n"].sum().reset_index()
        g = g.sort_values(["day", "n", "user_id"],
                          ascending=[True, False, True], kind="stable")
        g["rnk"] = g.groupby("day", sort=False).cumcount() + 1
        g = g[g["rnk"] <= k]
        return pa.table({
            "day": pa.array(g["day"].to_numpy().astype(np.int64), pa.int64()),
            "rnk": pa.array(g["rnk"].to_numpy().astype(np.int64), pa.int64()),
            "user_id": pa.array(g["user_id"].to_numpy().astype(np.int64), pa.int64()),
            "n_events": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
        })

    return bucketed_group_map(partials, "day", topk_per_day, num_buckets=16)


def events_grouped_sample(sf_dir: str, k: int = 20):
    """(event_type, sample_rank, event_id): a deterministic uniform
    sample of k events PER event_type — distributed reservoir sampling
    via min-wise hashing. Each event's priority is the first 8 hex
    digits of md5(event_id); the k smallest priorities per group win
    (same idiom as curation.dataset_split: hash-derived, never RNG, so
    the sample is stable across runs, partitions, and cluster sizes,
    and any shard can be recomputed independently — what a resumable
    100 TB sampling job needs).

    Scale shape: map-side partial top-k per batch (a batch contributes
    at most k rows per group to the shuffle), then one tiny bucketed
    reduce per group. Shuffle volume is O(k * n_groups * n_batches),
    independent of corpus size."""
    import hashlib

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_id", "event_type"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        prio = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        df = pd.DataFrame({"event_type": etype, "event_id": ids,
                           "prio": prio})
        df = df.sort_values(["event_type", "prio", "event_id"],
                            kind="stable")
        keep = df.groupby("event_type", sort=False).cumcount() < k
        sub = df[keep]
        return pa.table({
            "event_type": pa.array(sub["event_type"].tolist(), pa.string()),
            "event_id": pa.array(sub["event_id"].to_numpy(), pa.int64()),
            "prio": pa.array(sub["prio"].to_numpy(), pa.int64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["event_type", "prio", "event_id"],
                            kind="stable")
        rnk = df.groupby("event_type", sort=False).cumcount() + 1
        sub = df[rnk <= k]
        return pa.table({
            "event_type": pa.array(sub["event_type"].tolist(), pa.string()),
            "sample_rank": pa.array(rnk[rnk <= k].to_numpy(), pa.int64()),
            "event_id": pa.array(sub["event_id"].to_numpy(), pa.int64()),
        })

    return bucketed_group_map(partials, "event_type", final_topk,
                              num_buckets=8)


def segmented_rolling_sum(keys_sorted: np.ndarray, vals: np.ndarray,
                          w: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-key sliding sums over the last `w` rows (ROWS frame), for
    arrays already sorted by key then frame order. Returns (roll_sum,
    roll_n). One prefix sum; the frame is cum[i] - cum[lo-1] with
    lo = max(i-w+1, key_run_start) — fully vectorized."""
    n = len(keys_sorted)
    if not n:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    cum = np.cumsum(vals)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = keys_sorted[1:] != keys_sorted[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    gstart = np.repeat(starts, sizes)
    lo = np.maximum(np.arange(n) - w + 1, gstart)
    # cum[lo-1] is the prefix BEFORE the frame; lo==0 means the frame
    # starts at the global first row (prefix 0)
    roll_sum = cum - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
    roll_n = np.arange(n) - lo + 1
    return roll_sum, roll_n


def events_sliding_window(sf_dir: str, w: int = 5):
    """(event_id, user_id, roll_sum_micro, roll_n): sliding-window
    aggregate — per user, the sum/count of `value` over the last `w`
    events (ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW frame, ordered
    by ts then event_id). Values are converted to exact integer
    micro-units BEFORE summing so Ray and SQL agree bit-for-bit.

    Scale shape: hash-partition by user once; per bucket one lexsort +
    prefix-sum, with the frame resolved as cum[i] - cum[lo-1] where
    lo = max(i-w+1, group_start) — fully vectorized, no per-row or
    per-group Python loop."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "value"])

    def narrow(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "vmic": pa.array(vmic, pa.int64()),
        })

    def roll(df: pd.DataFrame) -> pa.Table:
        user = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        eid = df["event_id"].to_numpy()
        vmic = df["vmic"].to_numpy()
        order = np.lexsort((eid, ts, user))
        user_s = user[order]
        roll_sum, roll_n = segmented_rolling_sum(user_s, vmic[order], w)
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(user_s, pa.int64()),
            "roll_sum_micro": pa.array(roll_sum, pa.int64()),
            "roll_n": pa.array(roll_n, pa.int64()),
        })

    return bucketed_group_map(ds.map_batches(narrow, batch_format="pyarrow"),
                              "user_id", roll)


def events_type_percentiles(sf_dir: str):
    """(event_type, n, p50_micro, p90_micro): EXACT per-group
    percentiles by rank — the value at 1-based rank ceil(q*n) of the
    ascending sort (a deterministic, tie-stable definition both engines
    express identically; the mergeable-sketch variant for when a group
    exceeds one worker is quantile_sketch_stats). All values of a group
    co-locate (inherent to exact percentiles); the shuffle ships the
    narrow (event_type, vmic) projection only."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_type", "value"])

    def narrow(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "vmic": pa.array(vmic, pa.int64())})

    def pct(df: pd.DataFrame) -> pa.Table:
        etype = np.asarray(df["event_type"].tolist(), dtype=object)
        vmic = df["vmic"].to_numpy()
        order = np.lexsort((vmic, etype))
        et_s, v_s = etype[order], vmic[order]
        n = len(et_s)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = et_s[1:] != et_s[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        p50 = v_s[starts + np.ceil(0.5 * sizes).astype(np.int64) - 1]
        p90 = v_s[starts + np.ceil(0.9 * sizes).astype(np.int64) - 1]
        return pa.table({
            "event_type": pa.array(et_s[starts], pa.string()),
            "n": pa.array(sizes.astype(np.int64), pa.int64()),
            "p50_micro": pa.array(p50, pa.int64()),
            "p90_micro": pa.array(p90, pa.int64()),
        })

    return bucketed_group_map(ds.map_batches(narrow, batch_format="pyarrow"),
                              "event_type", pct, num_buckets=8)


def events_value_histogram(sf_dir: str, bin_micro: int = 50_000_000):
    """(bin, n, sum_micro): fixed-width histogram of `value` (bins of
    `bin_micro` exact integer micro-units, i.e. 50.0 per bin). Map-only
    binning + one tiny hash aggregate over ~10 bins — Ray's groupby
    combines partials map-side, so the shuffle is O(bins × batches)."""
    from ray.data.aggregate import Count, Sum

    ds = _read_events(sf_dir).select_columns(["value"])

    def binit(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({"bin": pa.array(vmic // bin_micro, pa.int64()),
                         "vmic": pa.array(vmic, pa.int64())})

    agg = ds.map_batches(binit, batch_format="pyarrow").groupby("bin") \
        .aggregate(Count(alias_name="n"), Sum("vmic", alias_name="sum_micro"))

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table({"bin": batch["bin"], "n": batch["n"],
                         "sum_micro": pc.cast(batch["sum_micro"],
                                              pa.int64())})

    return agg.map_batches(normalize, batch_format="pyarrow")


def user_event_pivot(sf_dir: str):
    """(user_id, n_view, n_click, n_purchase, n_signup, n_error): pivot
    / crosstab — event-type counts widened into one column per type.
    Map-only conditional projection + one hash aggregate (Ray's
    groupby.aggregate already combines partials map-side), so the
    shuffle moves one short row per (user, batch)."""
    from ray.data.aggregate import Sum

    types = ["view", "click", "purchase", "signup", "error"]
    ds = _read_events(sf_dir).select_columns(["user_id", "event_type"])

    def onehot(batch: pa.Table) -> pa.Table:
        cols = {"user_id": batch["user_id"].cast(pa.int64())}
        for t in types:
            cols[f"n_{t}"] = pc.cast(
                pc.equal(batch["event_type"], t), pa.int64())
        return pa.table(cols)

    agg = ds.map_batches(onehot, batch_format="pyarrow").groupby("user_id") \
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types])

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": batch["user_id"]}
            | {f"n_{t}": pc.cast(batch[f"n_{t}"], pa.int64())
               for t in types})

    return agg.map_batches(normalize, batch_format="pyarrow")


def events_funnel(sf_dir: str, steps: tuple = ("view", "click", "purchase")):
    """Ordered funnel analysis — for each user, the strict progression
    step1 < step2 < step3 by timestamp: t1 = first `view`, t2 = first
    `click` AFTER t1, t3 = first `purchase` AFTER t2 (strict `>` on ts;
    a same-microsecond event does not advance the funnel). Returns
    (funnel_step, n_users) = how many users reach at least each step.

    Scale shape: events filter to the step types at the map, users
    hash-bucket once (the same co-partitioning key every per-user op
    here uses), the per-bucket progression is three vectorized pandas
    merge+min passes, and only per-bucket COUNTS leave the bucket — the
    final groupby sums ~3 rows per bucket. User cardinality never hits
    the driver."""
    import pyarrow.compute as pc

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["ts", "user_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"], value_set=pa.array(list(steps)))
        sub = batch.filter(keep)
        return pa.table({
            "user_id": sub["user_id"],
            "ts_us": sub["ts"].cast(pa.int64()),
            "step": pc.index_in(sub["event_type"],
                                value_set=pa.array(list(steps))).cast(pa.int64()),
        })

    keyed = ds.map_batches(prep, batch_format="pyarrow")

    def funnel_counts(df: pd.DataFrame) -> pa.Table:
        counts = []
        cur = None  # (user_id, t_prev) frontier for users still in the funnel
        for s in range(len(steps)):
            ev = df[df["step"] == s]
            if cur is None:
                cur = ev.groupby("user_id")["ts_us"].min().reset_index(name="t")
            else:
                m = ev.merge(cur, on="user_id")
                m = m[m["ts_us"] > m["t"]]
                cur = m.groupby("user_id")["ts_us"].min().reset_index(name="t")
            counts.append(len(cur))
        return pa.table({
            "funnel_step": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
            "n_users": pa.array(counts, pa.int64()),
        })

    partials = bucketed_group_map(keyed, "user_id", funnel_counts,
                                  num_buckets=32)
    from ray.data.aggregate import Sum
    return partials.groupby("funnel_step").aggregate(
        Sum("n_users", alias_name="n_users"))


def events_type_mad(sf_dir: str):
    """(event_type, n, median_micro, mad_micro) — robust per-group
    location/scale: median and median-absolute-deviation, both EXACT
    by-rank (value at 1-based rank ceil(0.5*n) of the ascending sort,
    in integer micros — the events_type_percentiles definition, immune
    to interpolation/float drift). The canonical two-pass broadcast-back
    statistic: pass 1 reuses the exact-percentile reducer for the
    medians; that table is group-cardinality tiny so it rides into
    pass 2 as a closure, where |v - median| deviations are computed
    map-side and reduced by the same exact rank-select. Only narrow
    (event_type, int64) projections ever shuffle."""
    from ..stages.grouped import bucketed_group_map

    med_df = events_type_percentiles(sf_dir).to_pandas()
    med = dict(zip(med_df["event_type"], med_df["p50_micro"].astype(np.int64)))

    ds = _read_events(sf_dir).select_columns(["event_type", "value"])

    def dev(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        et = batch["event_type"].to_pylist()
        m = np.fromiter((med[e] for e in et), dtype=np.int64, count=len(et))
        return pa.table({"event_type": batch["event_type"],
                         "adev": pa.array(np.abs(vmic - m), pa.int64())})

    def mad(df: pd.DataFrame) -> pa.Table:
        etype = np.asarray(df["event_type"].tolist(), dtype=object)
        adev = df["adev"].to_numpy()
        order = np.lexsort((adev, etype))
        et_s, d_s = etype[order], adev[order]
        n = len(et_s)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = et_s[1:] != et_s[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        m50 = d_s[starts + np.ceil(0.5 * sizes).astype(np.int64) - 1]
        types = et_s[starts]
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "n": pa.array(sizes.astype(np.int64), pa.int64()),
            "median_micro": pa.array(
                np.fromiter((med[t] for t in types), dtype=np.int64,
                            count=len(types)), pa.int64()),
            "mad_micro": pa.array(m50, pa.int64()),
        })

    return bucketed_group_map(ds.map_batches(dev, batch_format="pyarrow"),
                              "event_type", mad, num_buckets=8)


def events_user_mode(sf_dir: str):
    """(user_id, mode_event_type, n) — most frequent event type per
    user, ties to the lexicographically smaller type: grouped argmax.
    Shape: ONE hash-aggregated groupby over (user_id, event_type) —
    map-side combined, so the exchange carries one row per distinct
    pair, not per event — then the per-user top-1 is a vectorized
    rank-select over that already-tiny pair table."""
    from ray.data.aggregate import Count

    from ..stages.grouped import bucketed_group_map

    pairs = _read_events(sf_dir).select_columns(["user_id", "event_type"]) \
        .groupby(["user_id", "event_type"]).aggregate(Count(alias_name="n"))

    def top1(df: pd.DataFrame) -> pa.Table:
        uid = df["user_id"].to_numpy(np.int64)
        et = np.asarray(df["event_type"].tolist(), dtype=object)
        n = df["n"].to_numpy(np.int64)
        order = np.lexsort((et, -n, uid))  # per user: n DESC, type ASC
        u_s, e_s, n_s = uid[order], et[order], n[order]
        first = np.empty(len(u_s), dtype=bool)
        if len(u_s):
            first[0] = True
            first[1:] = u_s[1:] != u_s[:-1]
        return pa.table({
            "user_id": pa.array(u_s[first], pa.int64()),
            "mode_event_type": pa.array(e_s[first], pa.string()),
            "n": pa.array(n_s[first], pa.int64()),
        })

    return bucketed_group_map(pairs, "user_id", top1, num_buckets=8)


def user_retention_cohorts(sf_dir: str):
    """(cohort_day, day_offset, n_users) — classic cohort-retention
    matrix: each user's cohort is their first active day; cell
    (c, k) counts users from cohort c active again k days later.

    Scale shape (the analytics pass every event warehouse runs):
      1. map-side: project events to (user_id, day) and DEDUP inside
         each batch, so the exchange carries at most one 16-byte row
         per (user, day) per batch — never one per event;
      2. ONE user-keyed hash shuffle (bucketed_group_map) completes the
         global (user, day) dedup, takes each user's min day as the
         cohort, and emits per-bucket PARTIAL (cohort, offset) counts
         (users' histories never leave their bucket);
      3. a final tiny (cohort_day, day_offset) aggregate over
         |cohorts| x |offsets| partial rows.
    No broadcast; bucket fn is linear in bucket size. At 10^12 events
    the only large exchange is step 2, proportional to distinct
    user-days, and user_id hash-partitions evenly by construction."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["ts", "user_id"])

    def user_days(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False)
        day = us.astype("datetime64[D]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        packed = np.unique(uid.astype(np.int64) << np.int64(20) | day)
        return pa.table({
            "user_id": pa.array(packed >> np.int64(20), pa.int64()),
            "day": pa.array(packed & np.int64((1 << 20) - 1), pa.int64()),
        })

    def cohort_partials(df: pd.DataFrame) -> pa.Table:
        uid = df["user_id"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        order = np.lexsort((day, uid))
        u_s, d_s = uid[order], day[order]
        keep = np.empty(len(u_s), dtype=bool)  # global (user, day) dedup
        if len(u_s):
            keep[0] = True
            keep[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
        u_s, d_s = u_s[keep], d_s[keep]
        first = np.empty(len(u_s), dtype=bool)
        if len(u_s):
            first[0] = True
            first[1:] = u_s[1:] != u_s[:-1]
        seg = np.cumsum(first) - 1
        cohort = d_s[np.flatnonzero(first)][seg]  # each user's min day
        pairs = np.stack([cohort, d_s - cohort], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({
            "cohort": pa.array(uniq[:, 0], pa.int64()),
            "day_offset": pa.array(uniq[:, 1], pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = bucketed_group_map(ds.map_batches(user_days, batch_format="pyarrow"),
                             "user_id", cohort_partials, num_buckets=8) \
        .groupby(["cohort", "day_offset"]).aggregate(Sum("n", alias_name="n_users"))

    def normalize(batch: pa.Table) -> pa.Table:
        days = batch["cohort"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        return pa.table({
            "cohort_day": pa.array(days.astype(str), pa.string()),
            "day_offset": batch["day_offset"],
            "n_users": pc.cast(batch["n_users"], pa.int64()),
        })

    return agg.map_batches(normalize, batch_format="pyarrow")


def events_upsert_latest(sf_dir: str):
    """(user_id, event_type, ts_us, event_id, value_micro, src) — SCD /
    upsert merge compaction: a base snapshot (even event_ids) is merged
    with an arriving delta (odd event_ids); per (user_id, event_type)
    key the DELTA row wins if any exists (upsert priority), latest
    (ts, event_id) breaks ties within a side.

    Shape: narrow 5-column projection map-side, then ONE hash shuffle
    on the merge key (bucketed_group_map over a packed key column) and
    a vectorized per-bucket rank-select — the same single-exchange
    compaction a log-structured table (Iceberg/Delta MERGE, destor's
    index-update U1 analog) performs per partition at scale. No state
    is broadcast; bucket work is sort + boundary scan, linear-log in
    bucket size."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "event_type", "value"])

    def narrow(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        key = pc.binary_join_element_wise(
            pc.cast(batch["user_id"], pa.string()), batch["event_type"], "|")
        return pa.table({
            "key": key,
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "ts_us": pa.array(ts_us, pa.int64()),
            "event_id": batch["event_id"],
            "value_micro": pa.array(vmic, pa.int64()),
            "is_delta": pa.array((eid % 2).astype(np.int8), pa.int8()),
        })

    def latest(df: pd.DataFrame) -> pa.Table:
        key = np.asarray(df["key"].tolist(), dtype=object)
        isd = df["is_delta"].to_numpy(np.int8)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        # per key: delta-first, then ts DESC, then event_id DESC
        order = np.lexsort((-eid, -ts, -isd, key))
        first = np.empty(len(key), dtype=bool)
        if len(key):
            first[0] = True
            first[1:] = key[order][1:] != key[order][:-1]
        idx = order[first]
        sel = df.iloc[idx]
        return pa.table({
            "user_id": pa.array(sel["user_id"].to_numpy(np.int64), pa.int64()),
            "event_type": pa.array(sel["event_type"].tolist(), pa.string()),
            "ts_us": pa.array(sel["ts_us"].to_numpy(np.int64), pa.int64()),
            "event_id": pa.array(sel["event_id"].to_numpy(np.int64), pa.int64()),
            "value_micro": pa.array(sel["value_micro"].to_numpy(np.int64), pa.int64()),
            "src": pa.array(np.where(sel["is_delta"].to_numpy(np.int8) == 1,
                                     "delta", "base"), pa.string()),
        })

    return bucketed_group_map(ds.map_batches(narrow, batch_format="pyarrow"),
                              "key", latest, num_buckets=8)


def events_zscore_outliers(sf_dir: str, k_sigma: int = 3):
    """(event_id, event_type, value_micro, dev_scaled) — EXACT
    distributed outlier detection: rows whose value deviates from their
    group mean by more than k_sigma population standard deviations,
    decided in integer arithmetic (no float mean/std, no accumulation-
    order drift): |n·v − S| > isqrt(k²·(n·Sxx − S²)) over integer
    micros, which is exactly (v − S/n)² > k²·var without ever forming
    a fraction (a² > K ⇔ a > isqrt(K) for integer a ≥ 0).

    Shape: pass 1 is a tiny per-type moment aggregate (n, S, Sxx
    limb-decomposed as in lineitem_corr_stats — Sxx of micro values
    overflows int64 at ~10^4 rows); the |types|-bounded constants ride
    into pass 2 as a closure; pass 2 is MAP-ONLY. int64 guard: n·v
    stays below 2^63 up to ~1.8·10^10 rows per group at value ≤ 490 —
    beyond that, rescale to millis or split the group key."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "event_type", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        order = np.argsort(et, kind="stable")
        e_s, v_s = et[order], v[order]
        first = np.empty(len(e_s), dtype=bool)
        if len(e_s):
            first[0] = True
            first[1:] = e_s[1:] != e_s[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(e_s))
        s = np.add.reduceat(v_s, starts) if len(starts) else \
            np.array([], np.int64)
        # per-row squares fit int64 (< 2.5e17) but an 8192-row batch sum
        # does not — split each SQUARE into (hi, lo) limbs and reduceat
        # the limbs independently; limbs need not stay canonical (< 2^32)
        # because recombination is just Σhi·2^32 + Σlo on the driver
        LIMB = np.int64(1) << np.int64(32)
        sq = v_s * v_s
        if len(starts):
            hi_acc = np.add.reduceat(sq >> np.int64(32), starts)
            lo_acc = np.add.reduceat(sq & (LIMB - 1), starts)
        else:
            hi_acc = lo_acc = np.array([], np.int64)
        return pa.table({
            "event_type": pa.array(e_s[starts], pa.string()),
            "n": pa.array(ends - starts, pa.int64()),
            "s_hi": pa.array(s >> np.int64(32), pa.int64()),
            "s_lo": pa.array(s & (LIMB - 1), pa.int64()),
            "sxx_hi": pa.array(hi_acc, pa.int64()),
            "sxx_lo": pa.array(lo_acc, pa.int64()),
        })

    import math

    part = ds.map_batches(moments, batch_format="pyarrow",
                          batch_size=8192) \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("s_hi", alias_name="s_hi"), Sum("s_lo", alias_name="s_lo"),
            Sum("sxx_hi", alias_name="sxx_hi"),
            Sum("sxx_lo", alias_name="sxx_lo")).to_pandas()
    const = {}
    for _, r in part.iterrows():
        n = int(r["n"])
        s = (int(r["s_hi"]) << 32) + int(r["s_lo"])
        sxx = (int(r["sxx_hi"]) << 32) + int(r["sxx_lo"])
        t = math.isqrt(k_sigma * k_sigma * (n * sxx - s * s))
        const[r["event_type"]] = (n, s, t)

    def flag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        n = np.fromiter((const[e][0] for e in et), np.int64, count=len(et))
        s = np.fromiter((const[e][1] for e in et), np.int64, count=len(et))
        t = np.fromiter((const[e][2] for e in et), np.int64, count=len(et))
        dev = n * v - s
        keep = np.abs(dev) > t
        return pa.table({
            "event_id": batch["event_id"].filter(pa.array(keep)),
            "event_type": batch["event_type"].filter(pa.array(keep)),
            "value_micro": pa.array(v[keep], pa.int64()),
            "dev_scaled": pa.array(dev[keep], pa.int64()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def events_value_rank(sf_dir: str):
    """(event_id, event_type, value_micro, n_le) — ties-inclusive
    cumulative rank within group (the cume_dist numerator: how many
    events of this type have value <= mine), the per-row window
    statistic behind percentile-rank features.

    Distributed WITHOUT a per-group sort of the fact table: pass 1
    reduces events to the per-type VALUE-COUNT table (domain-bounded,
    like orders_decile_stats); the driver turns it into per-type
    (sorted values, inclusive cumulative counts); pass 2 is MAP-ONLY —
    one searchsorted per batch against the broadcast tables. At an
    unbounded value domain, swap pass 1 for the KLL sketch and emit
    approximate ranks instead."""
    import ray as _ray
    from ray.data.aggregate import Count

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "event_type", "value"])

    def vmic(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "v": pa.array(v, pa.int64())})

    vc = ds.map_batches(vmic, batch_format="pyarrow") \
        .groupby(["event_type", "v"]).aggregate(Count(alias_name="cnt")) \
        .to_pandas()
    tables = {}
    for et, g in vc.groupby("event_type"):
        g = g.sort_values("v")
        tables[et] = (g["v"].to_numpy(np.int64),
                      g["cnt"].to_numpy(np.int64).cumsum())
    ref = _ray.put(tables)

    def rank(batch: pa.Table) -> pa.Table:
        tb = _ray.get(ref)
        et = batch["event_type"].to_pylist()
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        n_le = np.empty(len(v), np.int64)
        # group rows by type within the batch, one searchsorted per type
        et_arr = np.asarray(et, dtype=object)
        for t in np.unique(et_arr):
            m = et_arr == t
            vals, cum = tb[t]
            n_le[m] = cum[np.searchsorted(vals, v[m], side="left")]
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "value_micro": pa.array(v, pa.int64()),
            "n_le": pa.array(n_le, pa.int64()),
        })

    return ds.map_batches(rank, batch_format="pyarrow")


def events_value_delta(sf_dir: str):
    """(event_id, user_id, value_micro, delta_micro nullable) — lag
    window: each event's value minus the same user's PREVIOUS event
    value in (ts, event_id) order; a user's first event gets NULL.
    Completes the window surface (running total ✓, sliding frame ✓,
    rank ✓, cume ✓ — this adds lag/lead).

    Shape: narrow projection, ONE user-keyed shuffle, per-bucket
    lexsort + shifted vectorized difference with user-boundary masking
    — the same segmented-scan skeleton as events_sessionize."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "value"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "vmic": pa.array(np.round(batch["value"].to_numpy(
                zero_copy_only=False) * 1_000_000).astype(np.int64),
                pa.int64()),
        })

    def delta(df: pd.DataFrame) -> pa.Table:
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["vmic"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        u_s, v_s = uid[order], v[order]
        d = np.empty(len(v_s), np.int64)
        valid = np.empty(len(v_s), bool)
        if len(v_s):
            d[0] = 0
            valid[0] = False
            d[1:] = v_s[1:] - v_s[:-1]
            valid[1:] = u_s[1:] == u_s[:-1]
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(u_s, pa.int64()),
            "value_micro": pa.array(v_s, pa.int64()),
            "delta_micro": pa.array(d, pa.int64(), mask=~valid),
        })

    return bucketed_group_map(ds.map_batches(narrow, batch_format="pyarrow"),
                              "user_id", delta, num_buckets=8)


def events_props_stats(sf_dir: str):
    """(event_type, n, sum_k, max_k) — semi-structured extraction: the
    JSON `props` payload is parsed MAP-ONLY with a compiled vectorized
    regex (pyarrow extract_regex — C, no per-row Python json.loads),
    then the usual map-side-combined aggregate. The shape every
    log-ingest pipeline needs: schema-on-read over a string column
    without a row loop. Rows whose props lack the key drop out (none
    in this corpus; the oracle mirrors with json_extract)."""
    from ray.data.aggregate import Count, Max, Sum

    ds = _read_events(sf_dir).select_columns(["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        valid = pc.is_valid(m)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({
            "event_type": pc.filter(batch["event_type"], valid),
            "k": pc.filter(k, valid),
        })

    agg = ds.map_batches(extract, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="n"), Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": pc.cast(b["n"], pa.int64()),
            "sum_k": pc.cast(b["sum_k"], pa.int64()),
            "max_k": pc.cast(b["max_k"], pa.int64()),
        }), batch_format="pyarrow")


def events_weighted_sample(sf_dir: str, k: int = 10):
    """(event_type, event_id, rank_micro) — deterministic WEIGHTED
    sampling without replacement, k per group: the A-ExpJ / exponential-
    rank scheme (Efraimidis–Spirakis) with a hash-derived uniform
    instead of an RNG, so the sample is stable across runs, partitions
    and cluster sizes. rank = −ln(u)/w with w = value; the k smallest
    ranks per group are the weighted sample (P(selection) ∝ weight).

    u is md5-derived EXACTLY as the oracle computes it (first 13 hex
    digits = 52 bits / 2^52, exactly representable in a double), and
    ranks are quantized to integer micros before the per-group
    rank-select so both sides order identically. Shape: map-only rank
    computation, per-batch partial top-k per group, one small keyed
    exchange — the grouped-sample skeleton with weights."""
    import hashlib

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "event_type", "value"])

    def ranks(batch: pa.Table) -> pa.Table:
        # weights must be strictly positive (P ∝ w); drop w <= 0 rows,
        # mirrored by WHERE value > 0 in the oracle
        batch = batch.filter(pc.greater(batch["value"], 0.0))
        ids = batch["event_id"].to_pylist()
        u = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
             for i in ids), dtype=np.int64, count=len(ids)) / float(1 << 52)
        w = batch["value"].to_numpy(zero_copy_only=False)
        rank = -np.log(u) / w
        rmic = np.round(rank * 1e6).astype(np.int64)
        df = pa.table({
            "event_type": batch["event_type"],
            "event_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "rank_micro": pa.array(rmic, pa.int64()),
        })
        # per-batch partial top-k per group: only candidates travel
        pdf = df.to_pandas()
        pdf = pdf.sort_values(["event_type", "rank_micro", "event_id"]) \
            .groupby("event_type", sort=False).head(k)
        return pa.Table.from_pandas(pdf, preserve_index=False) \
            .replace_schema_metadata(None)

    def final_topk(df: pd.DataFrame) -> pa.Table:
        g = df.sort_values(["event_type", "rank_micro", "event_id"]) \
            .groupby("event_type", sort=False).head(k)
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    return bucketed_group_map(ds.map_batches(ranks, batch_format="pyarrow"),
                              "event_type", final_topk, num_buckets=4)


def events_version_diff(sf_dir: str):
    """(event_id, status) — dataset-VERSION diff, the reconciliation /
    audit op every versioned table store runs between two snapshots:
    per key, 'added' (current only), 'removed' (base only), 'changed'
    (both, payload differs), 'same'. Snapshots are carved
    deterministically from events so all four statuses occur:
      base    = event_id % 3 != 0, with value bumped +1 when
                event_id % 5 == 0 (the "stale" rows)
      current = event_id % 7 != 0, true values
    Shape: both sides project to (key, value_micro) map-side, ONE
    key-hash tag-and-union exchange, per-bucket vectorized classify —
    the diff of two 10^12-row snapshots costs exactly one co-partition
    pass, no broadcast, no driver state."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_id", "value"])

    def sides(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        in_base = eid % 3 != 0
        bv = np.where(eid % 5 == 0, vmic + 1_000_000, vmic)
        in_cur = eid % 7 != 0
        return pa.table({
            "key": pa.array(np.concatenate([eid[in_base], eid[in_cur]]),
                            pa.int64()),
            "vmic": pa.array(np.concatenate([bv[in_base], vmic[in_cur]]),
                             pa.int64()),
            "is_base": pa.array(np.concatenate(
                [np.ones(int(in_base.sum()), np.int8),
                 np.zeros(int(in_cur.sum()), np.int8)]), pa.int8()),
        })

    def classify(df: pd.DataFrame) -> pa.Table:
        key = df["key"].to_numpy(np.int64)
        v = df["vmic"].to_numpy(np.int64)
        isb = df["is_base"].to_numpy(np.int8)
        order = np.lexsort((isb, key))
        k_s, v_s, b_s = key[order], v[order], isb[order]
        first = np.empty(len(k_s), dtype=bool)
        if len(k_s):
            first[0] = True
            first[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(k_s)))
        # sizes is 1 (one side) or 2 (both; cur sorts first, base second)
        status = np.empty(len(starts), dtype=object)
        single = sizes == 1
        status[single & (b_s[starts] == 1)] = "removed"
        status[single & (b_s[starts] == 0)] = "added"
        both = ~single
        same = both & (v_s[starts] == v_s[np.minimum(starts + 1,
                                                     len(k_s) - 1)])
        status[both & same] = "same"
        status[both & ~same] = "changed"
        return pa.table({
            "event_id": pa.array(k_s[starts], pa.int64()),
            "status": pa.array(status, pa.string()),
        })

    return bucketed_group_map(ds.map_batches(sides, batch_format="pyarrow"),
                              "key", classify, num_buckets=8)


def user_event_paths(sf_dir: str, max_steps: int = 20):
    """(user_id, path, n_steps) — grouped ORDERED string aggregation:
    each user's first max_steps event types concatenated in (ts,
    event_id) order with '>' — the "user journey" sequence feature
    (and the engine's string_agg/collect_list aggregate family).

    Shape: narrow 3-column projection, ONE user-keyed shuffle, per-
    bucket lexsort + segmented head-N + a C-level join (pandas agg) —
    order-dependent aggregation co-locates a group by definition, the
    same contract as events_sessionize. max_steps bounds the output
    row width, so a 10^9-event user cannot produce an unbounded
    string."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "event_type"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    def paths(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="stable")
        head = df.groupby("user_id", sort=False).head(max_steps)
        g = head.groupby("user_id", sort=False)["event_type"] \
            .agg(lambda s: ">".join(s))
        n = head.groupby("user_id", sort=False)["event_type"].size()
        return pa.table({
            "user_id": pa.array(g.index.to_numpy(np.int64), pa.int64()),
            "path": pa.array(g.to_numpy(object), pa.string()),
            "n_steps": pa.array(n.to_numpy(np.int64), pa.int64()),
        })

    return bucketed_group_map(ds.map_batches(narrow, batch_format="pyarrow"),
                              "user_id", paths, num_buckets=8)


def events_user_hour_ohlc(sf_dir: str):
    """(user_id, hour_id, n, open_micro, high_micro, low_micro,
    close_micro) — OHLC bars per user per hour: first/last value by
    (ts, event_id) order plus min/max, the canonical ORDERED mergeable
    aggregate (destor's per-container first/last chunk accounting,
    job.c counters, is the same fold).

    Map-side partial: each batch is lexsorted by (key, ts, event_id)
    once; reduceat gives n/min/max and the group edges give open/close
    candidates — one partial row per (user, hour) per batch, so the
    exchange carries bars, not events. The bucket merge repeats the
    identical fold over partials (open = candidate with min
    (ts, event_id); the fold is associative, so any merge tree gives
    the same bar). Values are quantized to integer micros before
    aggregation — bars hash-match the SQL oracle exactly."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "value"])

    def fold(uh, ots, oeid, ov, cts, ceid, cv, vmin, vmax, n):
        """Associative OHLC fold over (possibly partial) bar rows."""
        order = np.lexsort((oeid, ots, uh))
        uh_s = uh[order]
        first = np.empty(len(uh_s), dtype=bool)
        first[0] = True
        first[1:] = uh_s[1:] != uh_s[:-1]
        starts = np.flatnonzero(first)
        # open: min (ts, event_id) per group = first row in this order
        o_ts, o_eid, o_v = ots[order][starts], oeid[order][starts], ov[order][starts]
        # close: max (ts, event_id) per group = last row of each group
        # in (uh, cts, ceid) order
        order2 = np.lexsort((ceid, cts, uh))
        ends = np.r_[starts[1:], len(uh_s)] - 1
        c_ts, c_eid, c_v = cts[order2][ends], ceid[order2][ends], cv[order2][ends]
        lo = np.minimum.reduceat(vmin[order], starts)
        hi = np.maximum.reduceat(vmax[order], starts)
        cnt = np.add.reduceat(n[order], starts)
        return uh_s[starts], o_ts, o_eid, o_v, c_ts, c_eid, c_v, lo, hi, cnt

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ["uh", "ots", "oeid", "ov", "cts", "ceid",
                              "cv", "vmin", "vmax", "n"]})
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        hour = ts // 3_600_000_000
        uh = uid * (1 << 24) + hour
        r = fold(uh, ts, eid, vmic, ts, eid, vmic, vmic, vmic,
                 np.ones(len(uh), np.int64))
        names = ["uh", "ots", "oeid", "ov", "cts", "ceid", "cv",
                 "vmin", "vmax", "n"]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in zip(names, r)})

    def merge(df: pd.DataFrame) -> pa.Table:
        r = fold(*(df[c].to_numpy(np.int64) for c in
                   ["uh", "ots", "oeid", "ov", "cts", "ceid", "cv",
                    "vmin", "vmax", "n"]))
        uh, _, _, ov, _, _, cv, lo, hi, cnt = r
        return pa.table({
            "user_id": pa.array(uh >> 24, pa.int64()),
            "hour_id": pa.array(uh & ((1 << 24) - 1), pa.int64()),
            "n": pa.array(cnt, pa.int64()),
            "open_micro": pa.array(ov, pa.int64()),
            "high_micro": pa.array(hi, pa.int64()),
            "low_micro": pa.array(lo, pa.int64()),
            "close_micro": pa.array(cv, pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_map(parts, "uh", merge, num_buckets=16)


def events_ewma(sf_dir: str, K: int = 4):
    """(event_id, user_id, ewma_num, ewma_den) — exponentially-weighted
    moving average of each user's value series (α = 1/2, truncated at
    `K` terms): the EWMA-family sequential fold expressed as a bounded
    weighted ROWS frame, destor's restore-cache hit-ratio smoothing
    (restore.c LRU statistics) generalized per key.

    Dyadic weights make it EXACT: term j back gets weight 2^(K-1-j), so
    (ewma_num, ewma_den) is an int64 rational (the EWMA is num/den)
    that is bit-stable across any execution order — it hash-matches an
    explicit lag-term SQL mirror with no float or integer-division
    semantics in play.

    One user-hash shuffle; inside each bucket one lexsort by
    (user, ts, event_id) and K shifted-array multiplies with the
    cross-user boundary masked — no per-row loop, no iteration, and
    state never exceeds the bucket (users are never split across
    buckets, the partitioning assumption this op relies on)."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "value"])

    def to_rows(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts": pa.array(batch["ts"].to_numpy(zero_copy_only=False)
                           .astype(np.int64), pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "vmic": pa.array(vmic, pa.int64()),
        })

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def smooth(df: pd.DataFrame) -> pa.Table:
        eid = df["event_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        v = df["vmic"].to_numpy(np.int64)
        if not len(eid):
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "ewma_num": pa.array([], pa.int64()),
                             "ewma_den": pa.array([], pa.int64())})
        order = np.lexsort((eid, ts, uid))
        uid_s, v_s = uid[order], v[order]
        num = np.zeros(len(v_s), np.int64)
        den = np.zeros(len(v_s), np.int64)
        for j in range(K):
            w = 1 << (K - 1 - j)
            if j == 0:
                num += w * v_s
                den += w
                continue
            valid = np.zeros(len(v_s), bool)
            valid[j:] = uid_s[j:] == uid_s[:-j]  # same user j rows back
            num[valid] += w * np.roll(v_s, j)[valid]
            den += np.where(valid, w, 0)
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(uid_s, pa.int64()),
            "ewma_num": pa.array(num, pa.int64()),
            "ewma_den": pa.array(den, pa.int64()),
        })

    return bucketed_group_map(rows, "user_id", smooth, num_buckets=16)


def events_time_weighted_avg(sf_dir: str):
    """(user_id, twa_num, twa_den) — time-weighted average of each
    user's value over their irregular event timeline: every event's
    value holds until the user's next event (last-observation-carried-
    forward), so the average weights values by holding DURATION, not by
    sample count — the canonical sensor/telemetry aggregate that plain
    mean gets wrong on irregular sampling.

    Exact rational output (num = Σ value_micro · duration_sec,
    den = Σ duration_sec, both int64; per-term magnitude ≤ 1e6·1e8 so
    no overflow until ~10^4 years of per-user span): hash-stable with
    no float or division semantics crossing engines. One user-hash
    shuffle; per bucket one lexsort + shifted-diff for durations with
    the cross-user boundary masked (each user's LAST event has no
    duration and drops, mirroring the SQL lead())."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "value"])

    def to_rows(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts_sec": pa.array(batch["ts"].to_numpy(zero_copy_only=False)
                               .astype(np.int64) // 1_000_000, pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "vmic": pa.array(vmic, pa.int64()),
        })

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def twa(df: pd.DataFrame) -> pa.Table:
        eid = df["event_id"].to_numpy(np.int64)
        ts = df["ts_sec"].to_numpy(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        v = df["vmic"].to_numpy(np.int64)
        if not len(eid):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "twa_num": pa.array([], pa.int64()),
                             "twa_den": pa.array([], pa.int64())})
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s, v_s = uid[order], ts[order], v[order]
        same = np.zeros(len(uid_s), bool)
        same[:-1] = uid_s[1:] == uid_s[:-1]  # row has a successor
        dur = np.zeros(len(uid_s), np.int64)
        dur[:-1] = ts_s[1:] - ts_s[:-1]
        num = v_s * dur * same
        den = dur * same
        first = np.r_[True, uid_s[1:] != uid_s[:-1]]
        starts = np.flatnonzero(first)
        return pa.table({
            "user_id": pa.array(uid_s[starts], pa.int64()),
            "twa_num": pa.array(np.add.reduceat(num, starts), pa.int64()),
            "twa_den": pa.array(np.add.reduceat(den, starts), pa.int64()),
        })

    return bucketed_group_map(rows, "user_id", twa, num_buckets=16)


def events_type_top_values(sf_dir: str, k: int = 3):
    """(event_id, event_type, value_micro) — all rows whose value is
    among their event type's `k` largest DISTINCT values (dense-rank
    <= k semantics: ties are INCLUDED, completing the ranked-window
    family next to row_number-based topk and cume_dist).

    Two passes, no per-type sort of the data: (1) the same
    (type, value) value-count profile as the percentile machinery —
    the k-th largest distinct value per type falls out of a tiny
    driver scan; (2) cutoffs broadcast, the filter is map-only. The
    exchange carries one row per distinct (type, value) per batch,
    never events."""
    import ray as _ray
    from ray.data.aggregate import Count

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "event_type", "value"])

    def vc(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        df = pd.DataFrame({"event_type":
                           batch["event_type"].to_numpy(zero_copy_only=False),
                           "vmic": vmic})
        g = df.groupby(["event_type", "vmic"], as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"].to_numpy(object),
                                   pa.string()),
            "vmic": pa.array(g["vmic"].to_numpy(np.int64), pa.int64())})

    prof = ds.map_batches(vc, batch_format="pyarrow") \
        .groupby(["event_type", "vmic"]).aggregate(Count(alias_name="n")) \
        .to_pandas()  # |types| x |distinct values| rows
    cut: dict[str, int] = {}
    for t, g in prof.groupby("event_type"):
        vals = np.sort(g["vmic"].to_numpy(np.int64))[::-1]
        cut[t] = int(vals[min(k, len(vals)) - 1])
    cut_ref = _ray.put(cut)

    def keep(batch: pa.Table) -> pa.Table:
        c = _ray.get(cut_ref)
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        th = np.array([c[t] for t in types], np.int64)
        m = pa.array(vmic >= th)
        return pa.table({
            "event_id": batch["event_id"].filter(m).cast(pa.int64()),
            "event_type": batch["event_type"].filter(m),
            "value_micro": pa.array(vmic[vmic >= th], pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow")


def event_type_cooccurrence(sf_dir: str):
    """(type_a, type_b, n_users) with type_a < type_b — market-basket
    co-occurrence: for every unordered pair of event types, how many
    users performed BOTH (the association-mining support count; the
    basket is the user's distinct type set).

    One user-keyed exchange carrying per-batch-DISTINCT (user, type)
    pairs only (local dedup before the shuffle, the same discipline as
    the exact distinct-token count); each bucket dedups its users
    globally, expands each user's k types into k(k-1)/2 pairs (k is
    bounded by the type vocabulary, so expansion is O(|types|²) per
    user worst case — a domain constant, not data-scale), and emits
    map-side pair partials; a tiny final pair-keyed aggregate sums
    them. Type pairs are domain-bounded, so the last exchange is
    metadata-sized."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["user_id", "event_type"])

    def local_distinct(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy(np.int64), pa.int64()),
            "event_type": pa.array(df["event_type"].to_numpy(object),
                                   pa.string())})

    rows = ds.map_batches(local_distinct, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates()
        # vectorized basket expansion: the type DOMAIN is small (≤ 64),
        # so each user's basket is a bitmask — one bitwise_or.reduceat
        # per bucket, then |types|²/2 vectorized popcount passes over
        # the user-mask array (domain² work, never a per-user loop)
        vocab, tcode = np.unique(df["event_type"].to_numpy(object),
                                 return_inverse=True)
        if len(vocab) > 64:
            raise ValueError("type domain exceeds the 64-bit basket mask")
        uid = df["user_id"].to_numpy(np.int64)
        order = np.argsort(uid, kind="stable")
        uid_s = uid[order]
        bits = (np.uint64(1) << tcode[order].astype(np.uint64))
        starts = np.flatnonzero(np.r_[True, uid_s[1:] != uid_s[:-1]])
        masks = np.bitwise_or.reduceat(bits, starts)
        out_a, out_b, out_n = [], [], []
        for i in range(len(vocab)):
            mi = (masks >> np.uint64(i)) & np.uint64(1)
            for j in range(i + 1, len(vocab)):
                n = int((mi & ((masks >> np.uint64(j))
                               & np.uint64(1))).sum())
                if n:
                    out_a.append(vocab[i])
                    out_b.append(vocab[j])
                    out_n.append(n)
        return pa.table({
            "type_a": pa.array(out_a, pa.string()),
            "type_b": pa.array(out_b, pa.string()),
            "n": pa.array(out_n, pa.int64())})

    part = bucketed_group_map(rows, "user_id", pairs, num_buckets=16)
    out = part.groupby(["type_a", "type_b"]).aggregate(
        Sum("n", alias_name="n_users"))
    return out.map_batches(
        lambda b: pa.table({
            "type_a": b["type_a"], "type_b": b["type_b"],
            "n_users": pc.cast(b["n_users"], pa.int64())}),
        batch_format="pyarrow")


def events_recent_stats(sf_dir: str, cutoff: str = "2001-06-01"):
    """(event_type, n, sum_value_micro) over events at or after
    `cutoff` — with the predicate pushed INTO the parquet read
    (ray.data.read_parquet filter expression): row groups whose ts
    max falls before the cutoff never leave storage, the read-layer
    twin of column pruning ("prune at the read"). The aggregate is
    the standard map-side-combined groupby; the oracle is a plain
    WHERE mirror, so the pushdown's correctness is hash-certified."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Count, Sum

    cut = np.datetime64(cutoff, "us")
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"],
        filter=(pads.field("ts") >= cut))

    def partial(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "vmic": pa.array(vmic, pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="n"),
            Sum("vmic", alias_name="sum_value_micro"))
    return out.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": pc.cast(b["n"], pa.int64()),
            "sum_value_micro": pc.cast(b["sum_value_micro"], pa.int64())}),
        batch_format="pyarrow")


def events_hourly_active_users(sf_dir: str):
    """(hour_id, n_active) — EXACT windowed distinct count (hourly
    active users), the windowed twin of the global distinct-token
    count: batch-local (hour, user) dedup means only batch-distinct
    pairs enter the ONE hour-keyed exchange, and each bucket finishes
    the dedup + count. Output is window-cardinality-sized; the
    approximate path at extreme user cardinality is the same topology
    with an HLL register set per window (functions/sketch.HyperLogLog
    is mergeable through exactly this shuffle)."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["ts", "user_id"])

    def local_pairs(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        hour = ts // 3_600_000_000
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        if len(uid) and int(uid.max()) >= (1 << 22):
            # composite packing only fits 22-bit user ids; beyond that
            # dedup on the 2-column pair directly (same semantics,
            # slightly larger partials)
            df = pd.DataFrame({"hour_id": hour, "user_id": uid}) \
                .drop_duplicates()
            return pa.table({
                "hour_id": pa.array(df["hour_id"].to_numpy(np.int64),
                                    pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(np.int64),
                                    pa.int64())})
        comp = np.unique(hour * (1 << 22) + uid)
        return pa.table({
            "hour_id": pa.array(comp >> 22, pa.int64()),
            "user_id": pa.array(comp & ((1 << 22) - 1), pa.int64()),
        })

    rows = ds.map_batches(local_pairs, batch_format="pyarrow")

    def count_distinct(df: pd.DataFrame) -> pa.Table:
        g = df.drop_duplicates().groupby("hour_id", as_index=False).size()
        return pa.table({
            "hour_id": pa.array(g["hour_id"].to_numpy(np.int64), pa.int64()),
            "n_active": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
        })

    return bucketed_group_map(rows, "hour_id", count_distinct,
                              num_buckets=16)


def event_transitions(sf_dir: str):
    """(from_type, to_type, n) — first-order Markov transition counts
    over each user's (ts, event_id)-ordered event sequence: the
    sequence-model feature extraction behind next-event prediction and
    bot detection. One user-keyed exchange; per bucket one lexsort +
    boundary-masked shift produces (prev, cur) pairs, which reduce to
    domain-sized (|types|²) partials before the tiny final aggregate."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "event_type"])

    def to_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts": pa.array(batch["ts"].to_numpy(zero_copy_only=False)
                           .astype(np.int64), pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
        })

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def transitions(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        eid = df["event_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid_s, et_s = uid[order], et[order]
        same = uid_s[1:] == uid_s[:-1]
        g = pd.DataFrame({"from_type": et_s[:-1][same],
                          "to_type": et_s[1:][same]}) \
            .groupby(["from_type", "to_type"], as_index=False).size()
        return pa.table({
            "from_type": pa.array(g["from_type"].to_numpy(object),
                                  pa.string()),
            "to_type": pa.array(g["to_type"].to_numpy(object), pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
        })

    part = bucketed_group_map(rows, "user_id", transitions, num_buckets=16)
    out = part.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n"))
    return out.map_batches(
        lambda b: pa.table({
            "from_type": b["from_type"], "to_type": b["to_type"],
            "n": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow")


def zorder_layout_stats(sf_dir: str):
    """(tile, n, n_users, n_hours) — Z-ORDER (Morton) layout audit:
    events keyed by the bit-interleave of (user_id & 255, hour & 255)
    and tiled by the top 8 interleaved bits. Each tile then covers a
    compact 16×16 rectangle in (user, hour) space — BOTH dimensions
    stay bounded per tile (n_users <= 16 AND n_hours <= 16), which no
    single-key range partitioning can achieve; this is the layout
    trick (Delta/Iceberg Z-ordering) that makes two-dimensional
    predicate pruning work, expressed as a queryable audit with the
    interleave mirrored bit-for-bit in SQL.

    One tile-keyed exchange of batch-locally deduped (tile, u, h,
    cnt) partials; per-bucket nunique + sum."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["ts", "user_id"])

    def zrows(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        hour = (ts // 3_600_000_000) & 0xFF
        u = batch["user_id"].to_numpy(zero_copy_only=False) & 0xFF
        z = np.zeros(len(u), np.int64)
        for b in range(8):
            z |= ((u >> b) & 1) << (2 * b + 1)
            z |= ((hour >> b) & 1) << (2 * b)
        df = pd.DataFrame({"tile": z >> 8, "u": u, "h": hour})
        g = df.groupby(["tile", "u", "h"], as_index=False).size()
        return pa.table({
            "tile": pa.array(g["tile"].to_numpy(np.int64), pa.int64()),
            "u": pa.array(g["u"].to_numpy(np.int64), pa.int64()),
            "h": pa.array(g["h"].to_numpy(np.int64), pa.int64()),
            "cnt": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
        })

    rows = ds.map_batches(zrows, batch_format="pyarrow")

    def per_tile(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("tile").agg(
            n=("cnt", "sum"), n_users=("u", "nunique"),
            n_hours=("h", "nunique")).reset_index()
        return pa.table({
            "tile": pa.array(g["tile"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "n_users": pa.array(g["n_users"].to_numpy(np.int64), pa.int64()),
            "n_hours": pa.array(g["n_hours"].to_numpy(np.int64), pa.int64()),
        })

    return bucketed_group_map(rows, "tile", per_tile, num_buckets=8)


def events_incremental_stats(sf_dir: str, mod: int = 10):
    """(event_type, n, sum_value_micro) — INCREMENTAL AGGREGATE
    MAINTENANCE: the base slice's aggregate (event_id % mod != 0,
    standing in for yesterday's materialized state) is computed once
    and CACHED as parquet; the arriving delta slice (event_id % mod ==
    0) contributes only its partials, and the merge of stored state +
    delta is returned. The oracle aggregates the FULL table, so the
    hash match certifies merge(state, delta) == full recompute — the
    contract that lets a 100 TB daily pipeline process only the new
    day. Commutative-monoid partials (count, sum) make the merge a
    tiny groupby; the base never re-reads its events."""
    import os

    import pyarrow.parquet as pq_
    from ray.data.aggregate import Count, Sum

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "event_type", "value"])

    def partials(keep_mod_zero: bool):
        def fn(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy(zero_copy_only=False)
            sel = (eid % mod == 0) if keep_mod_zero else (eid % mod != 0)
            vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                            * 1_000_000).astype(np.int64)[sel]
            df = pd.DataFrame({
                "event_type": batch["event_type"].to_numpy(
                    zero_copy_only=False)[sel],
                "vmic": vmic})
            g = df.groupby("event_type", as_index=False).agg(
                n=("vmic", "size"), s=("vmic", "sum"))
            return pa.table({
                "event_type": pa.array(g["event_type"].to_numpy(object),
                                       pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
                "s": pa.array(g["s"].to_numpy(np.int64), pa.int64())})
        return fn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    state = f"/tmp/destor_ray_incr/{tag}_m{mod}"
    if not os.path.isdir(state):
        base = ds.map_batches(partials(False), batch_format="pyarrow") \
            .groupby("event_type").aggregate(Sum("n", alias_name="n"),
                                             Sum("s", alias_name="s"))
        tmp = f"{state}.tmp.{os.getpid()}"
        os.makedirs(os.path.dirname(state), exist_ok=True)
        base.map_batches(
            lambda b: pa.table({"event_type": b["event_type"],
                                "n": pc.cast(b["n"], pa.int64()),
                                "s": pc.cast(b["s"], pa.int64())}),
            batch_format="pyarrow").write_parquet(tmp)
        try:
            os.rename(tmp, state)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    stored = ray.data.read_parquet(state)
    delta = ds.map_batches(partials(True), batch_format="pyarrow")
    merged = stored.union(delta) \
        .groupby("event_type").aggregate(Sum("n", alias_name="n"),
                                         Sum("s", alias_name="s"))
    return merged.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": pc.cast(b["n"], pa.int64()),
            "sum_value_micro": pc.cast(b["s"], pa.int64())}),
        batch_format="pyarrow")


def events_dedup_window(sf_dir: str, window_sec: int = 600):
    """(event_id, is_dup) — at-least-once delivery dedup: an event is a
    duplicate when the SAME (user_id, event_type, value) occurred within
    the preceding `window_sec` (lag semantics — each occurrence compares
    to the previous occurrence, dropped or not; deterministic and
    SQL-mirrorable as lag() OVER (PARTITION BY identity ORDER BY ts,
    event_id)). The ingestion-side twin of content dedup: retries and
    redeliveries produce byte-identical events shifted by seconds.

    Shape: narrow projection, ONE identity-keyed exchange, per-bucket
    lexsort + shifted vectorized compare with identity-boundary masking
    — the events_value_delta skeleton with the partition key widened to
    the full identity."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "ts", "user_id", "event_type", "value"])

    def narrow(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "vmic": pa.array(vmic, pa.int64()),
        })

    def flag(df: pd.DataFrame) -> pa.Table:
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["vmic"].to_numpy(np.int64)
        et = df["event_type"].to_numpy(object)
        tcode, _ = pd.factorize(et)
        order = np.lexsort((eid, ts, v, tcode, uid))
        u_s, t_s, v_s, ts_s = (uid[order], tcode[order], v[order],
                               ts[order])
        same = np.zeros(len(u_s), bool)
        if len(u_s) > 1:
            same[1:] = ((u_s[1:] == u_s[:-1]) & (t_s[1:] == t_s[:-1])
                        & (v_s[1:] == v_s[:-1])
                        & (ts_s[1:] - ts_s[:-1]
                           <= window_sec * 1_000_000))
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "is_dup": pa.array(same, pa.bool_()),
        })

    rows = ds.map_batches(narrow, batch_format="pyarrow")
    return bucketed_group_map(rows, "user_id", flag, num_buckets=16)


def events_global_rank(sf_dir: str, n_hist: int = 4096, stride: int = 100):
    """(event_id, value_micro, rnk) at every `stride`-th global rank —
    exact `row_number() OVER (ORDER BY value DESC, event_id)` over the
    WHOLE fact table, the distributed GLOBAL-ORDER prefix scan (TeraSort
    rank assignment) done without a global sort:

      pass 1  global (n, min, max) of the sort key — scalar aggregate;
      pass 2  equal-width histogram of the key (n_hist buckets, the
              same range-partition trick as exact_global_quantiles);
              the driver's exclusive DESC prefix sum over bucket counts
              is every bucket's global rank OFFSET — the cross-partition
              carry of the scan, exchanged as one domain-sized table;
      pass 3  ONE bucket-keyed exchange; each bucket sorts only its own
              ~n/n_hist rows (independent, bounded) and adds its offset.

    Total: zero all-to-all sort; the only coordination is the tiny
    bucket-count table. Rank ties are impossible (event_id tie-break).
    Output thinned to every `stride`-th rank so the certified result
    stays bounded while still spanning the full global order."""
    import ray as _ray
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_id", "value"])

    def narrow(batch: pa.Table) -> pa.Table:
        vmic = np.round(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "vmic": pa.array(vmic, pa.int64()),
        })

    vals = ds.map_batches(narrow, batch_format="pyarrow")

    # pass 1: key range
    g = vals.aggregate(Count(alias_name="n"), Min("vmic", alias_name="lo"),
                       Max("vmic", alias_name="hi"))
    lo, hi = int(g["lo"]), int(g["hi"])
    width = max(1, -(-(hi - lo + 1) // n_hist))

    # pass 2: histogram → per-bucket DESC rank offsets (exclusive scan)
    def hist(batch: pa.Table) -> pa.Table:
        b = (batch["vmic"].to_numpy(zero_copy_only=False) - lo) // width
        cnt = np.bincount(b)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    hdf = vals.map_batches(hist, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas().sort_values("bucket", ascending=False)
    bkt_desc = hdf["bucket"].to_numpy(np.int64)
    offs_desc = np.concatenate(([0], hdf["cnt"].to_numpy(np.int64).cumsum()[:-1]))
    # searchsorted needs ascending order
    asc = np.argsort(bkt_desc)
    ref = _ray.put((bkt_desc[asc], offs_desc[asc]))

    # pass 3: per-bucket local sort + offset, thin to the stride grid
    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["vmic"].to_numpy(zero_copy_only=False) - lo) // width
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    keyed = vals.map_batches(add_bucket, batch_format="pyarrow")

    def rank_bucket(df: pd.DataFrame) -> pa.Table:
        bkt_asc, off_asc = _ray.get(ref)
        b = df["bucket"].to_numpy(np.int64)
        v = df["vmic"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        # global order inside this physical bucket: histogram bucket DESC,
        # value DESC, event_id ASC — then per-histogram-bucket segments
        # are contiguous and each starts at its broadcast offset.
        order = np.lexsort((e, -v, -b))
        b_s, v_s, e_s = b[order], v[order], e[order]
        seg_start = np.zeros(len(b_s), bool)
        if len(b_s):
            seg_start[0] = True
            seg_start[1:] = b_s[1:] != b_s[:-1]
        starts = np.flatnonzero(seg_start)
        sizes = np.diff(np.append(starts, len(b_s)))
        local = np.arange(len(b_s)) - np.repeat(starts, sizes)
        offs = off_asc[np.searchsorted(bkt_asc, b_s[starts])]
        rnk = np.repeat(offs, sizes) + local + 1
        keep = (rnk - 1) % stride == 0
        return pa.table({
            "event_id": pa.array(e_s[keep], pa.int64()),
            "value_micro": pa.array(v_s[keep], pa.int64()),
            "rnk": pa.array(rnk[keep], pa.int64()),
        })

    return bucketed_group_map(keyed, "bucket", rank_bucket, num_buckets=32)


def events_cumulative_users(sf_dir: str, checkpoint: int = 500):
    """(checkpoint_eid, distinct_users) — the unique-users GROWTH CURVE:
    after each `checkpoint`-th event (in event_id order), how many
    distinct users have appeared so far. A cumulative COUNT(DISTINCT)
    window — the prefix monoid is SET UNION, which no mergeable counter
    expresses directly; the scalable reformulation is FIRST-OCCURRENCE:
    a user contributes to every prefix at/after its MIN event_id, so

      pass 1  per-user min(event_id) — batch-local min partials, one
              user-keyed exchange, output bounded by the USER domain
              (at an unbounded user domain, replace the driver sort
              with the events_global_rank histogram over first_eids);
      pass 2  map-side collection of the checkpoint grid (event_ids
              ≡ -1 mod `checkpoint`, n/checkpoint values);
      driver  curve[e] = #(first_eid <= e), one searchsorted.

    The fact table is never sorted and never co-located; the only
    exchange carries one row per (batch, user)."""
    from ray.data.aggregate import Min

    ds = _read_events(sf_dir).select_columns(["event_id", "user_id"])

    def first_partials(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, uid))
        u_s, e_s = uid[order], eid[order]
        first = np.zeros(len(u_s), bool)
        if len(u_s):
            first[0] = True
            first[1:] = u_s[1:] != u_s[:-1]
        return pa.table({"user_id": pa.array(u_s[first], pa.int64()),
                         "eid": pa.array(e_s[first], pa.int64())})

    firsts = ds.map_batches(first_partials, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("eid", alias_name="first_eid")) \
        .to_pandas()["first_eid"].to_numpy(np.int64)
    firsts.sort()

    def grid(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"eid": pa.array(
            eid[eid % checkpoint == checkpoint - 1], pa.int64())})

    cps = np.sort(ds.map_batches(grid, batch_format="pyarrow")
                  .to_pandas()["eid"].to_numpy(np.int64))
    n_users = np.searchsorted(firsts, cps, side="right")
    return pd.DataFrame({"checkpoint_eid": cps,
                         "distinct_users": n_users.astype(np.int64)})


def events_hourly_gapfill(sf_dir: str):
    """(event_type, hour_bucket, n_events) DENSIFIED over the full
    [min, max] hour range — every (type, hour) cell present, zero-filled
    where no event landed (the gap-fill / resample step a time-series
    feature pipeline needs before windowed models; SQL's
    generate_series ⨯ dimension LEFT JOIN).

    Scale shape: the fact table contributes only map-side (type, hour)
    count partials through one domain-bounded exchange; the DENSE grid
    (types × hours — domain-sized, not data-sized) is constructed and
    zero-filled on the tiny aggregate, never by exploding the corpus."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir).select_columns(["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        hr = (batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
              // 1_000_000 // 3600)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pylist(),
                           "hour_bucket": hr, "n": 1})
        g = df.groupby(["event_type", "hour_bucket"], sort=False)["n"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour_bucket"]) \
        .aggregate(Sum("n", alias_name="n_events")).to_pandas()
    lo, hi = int(counts["hour_bucket"].min()), int(counts["hour_bucket"].max())
    types = np.sort(counts["event_type"].unique())
    hours = np.arange(lo, hi + 1, dtype=np.int64)
    grid = pd.DataFrame({
        "event_type": np.repeat(types, len(hours)),
        "hour_bucket": np.tile(hours, len(types)),
    })
    out = grid.merge(counts, on=["event_type", "hour_bucket"], how="left")
    out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
    return out


def events_rolling_active_users(sf_dir: str, window_days: int = 7):
    """(day, wau) — ROLLING 7-day distinct active users per day (the
    WAU curve), the SLIDING-window COUNT(DISTINCT) that tumbling-window
    machinery (events_hourly_active_users) can't express: a user seen
    on day d is active for every window day in [d, d+window_days-1].

    Scale shape: the fact table reduces FIRST to the distinct
    (user, day) table — batch-local pair dedup, one exchange, output
    bounded by users × days (domain, not data); the window EXPANSION
    (each pair → its `window_days` covered window-days) happens on that
    domain table only, followed by a second domain-bounded distinct on
    (user, window_day) — so the 7× blowup applies to the deduped
    domain, never the corpus. Window days are clipped to the observed
    day range so every reported day aggregates a full-size window
    population."""
    from ray.data.aggregate import Count

    ds = _read_events(sf_dir).select_columns(["ts", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        day = (batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 1_000_000 // 86400)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # 20-bit day pack holds until year 4840; guard like the
        # events_hourly_active_users wide-fallback seam
        assert len(uid) == 0 or (uid.max() < (1 << 42) and day.max() < (1 << 20))
        key = np.unique(uid * np.int64(1 << 20) + day)
        return pa.table({"user_id": pa.array(key >> 20, pa.int64()),
                         "day": pa.array(key & ((1 << 20) - 1), pa.int64())})

    ud = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"]) \
        .map_batches(pairs, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(Count(alias_name="c")) \
        .materialize()  # domain-sized; consumed by range pass + expansion

    # observed day range (tiny aggregate over the domain table)
    from ray.data.aggregate import Max, Min
    rng = ud.aggregate(Min("day", alias_name="lo"), Max("day", alias_name="hi"))
    lo, hi = int(rng["lo"]), int(rng["hi"])

    def expand(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = batch["day"].to_numpy(zero_copy_only=False)
        n = len(uid)
        wd = (np.repeat(day, window_days)
              + np.tile(np.arange(window_days, dtype=np.int64), n))
        uu = np.repeat(uid, window_days)
        keep = wd <= hi
        # batch-local dedup of (user, window_day) before the exchange
        key = np.unique(uu[keep] * np.int64(1 << 20) + wd[keep])
        return pa.table({"user_id": pa.array(key >> 20, pa.int64()),
                         "wd": pa.array(key & ((1 << 20) - 1), pa.int64())})

    wau = ud.map_batches(expand, batch_format="pyarrow") \
        .groupby(["user_id", "wd"]).aggregate(Count(alias_name="c"))

    def day_partials(batch: pa.Table) -> pa.Table:
        wd = batch["wd"].to_numpy(zero_copy_only=False)
        days, cnt = np.unique(wd, return_counts=True)
        return pa.table({"day": pa.array(days, pa.int64()),
                         "wau": pa.array(cnt, pa.int64())})

    from ray.data.aggregate import Sum
    out = wau.map_batches(day_partials, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("wau", alias_name="wau")).to_pandas()
    # report only days whose trailing window fits the observed range
    out = out[out["day"] >= lo + window_days - 1].reset_index(drop=True)
    out["wau"] = out["wau"].astype(np.int64)
    return out.sort_values("day").reset_index(drop=True)


def events_type_trend(sf_dir: str):
    """(event_type, n, sum_y_micro, slope_num, slope_den) — per-group
    ORDINARY LEAST SQUARES trend of value against time (hours since the
    corpus min hour): the per-key trend-fitting pass a monitoring /
    drift-detection pipeline runs over every key. EXACT integer output:
    the OLS slope is reported as the cross-multiplied pair

        slope_num = n·Σxy − Σx·Σy      slope_den = n·Σx² − (Σx)²

    (slope = num/den), sidestepping float accumulation-order drift the
    same way q8_market_share ships revenue shares. One scalar pass
    pins the x origin (rebasing keeps every product well inside int64 —
    the raw epoch-hour would overflow n·Σx²); the moment partials
    (n, Σx, Σy, Σxy, Σx²) fold map-side per (type, batch) and merge
    through one domain-sized exchange, lineitem_corr_stats-style; the
    final cross-multiplication runs on the tiny per-type aggregate in
    arbitrary-precision Python ints with an int64-range assert."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read_events(sf_dir).select_columns(["ts", "event_type", "value"])

    def hours(batch: pa.Table) -> pa.Table:
        h = (batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 1_000_000 // 3600)
        return pa.table({"h": pa.array(h, pa.int64())})

    g = ds.map_batches(hours, batch_format="pyarrow") \
        .aggregate(Min("h", alias_name="lo"))
    lo = int(g["lo"])

    def partials(batch: pa.Table) -> pa.Table:
        x = (batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 1_000_000 // 3600) - lo
        y = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        codes, uniq = pd.factorize(et, sort=True)
        order = np.argsort(codes, kind="stable")
        c_s = codes[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]]) \
            if len(c_s) else np.empty(0, np.int64)
        ends = np.append(starts[1:], len(c_s))

        def seg_sum(v: np.ndarray) -> np.ndarray:  # int64-exact fold
            return (np.add.reduceat(v[order], starts)
                    if len(starts) else v[:0])

        return pa.table({
            "event_type": pa.array(uniq[c_s[starts]].tolist()
                                   if len(starts) else [], pa.string()),
            "n": pa.array(ends - starts, pa.int64()),
            "sx": pa.array(seg_sum(x), pa.int64()),
            "sy": pa.array(seg_sum(y), pa.int64()),
            "sxy": pa.array(seg_sum(x * y), pa.int64()),
            "sxx": pa.array(seg_sum(x * x), pa.int64()),
        })

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx")).to_pandas()

    num, den = [], []
    for _, r in agg.iterrows():
        nn = int(r["n"]) * int(r["sxy"]) - int(r["sx"]) * int(r["sy"])
        dd = int(r["n"]) * int(r["sxx"]) - int(r["sx"]) ** 2
        assert abs(nn) < 2 ** 63 and abs(dd) < 2 ** 63, \
            "trend cross-products exceed int64 — widen to (hi, lo) limbs"
        num.append(nn)
        den.append(dd)
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype(np.int64),
        "sum_y_micro": agg["sy"].astype(np.int64),
        "slope_num": np.array(num, np.int64),
        "slope_den": np.array(den, np.int64),
    }).sort_values("event_type").reset_index(drop=True)


def events_drift_psi(sf_dir: str, n_bins: int = 10):
    """(bin, n_a, n_b, psi_term) — DATA-DRIFT detection between the
    first and second half of the event stream (split at max(event_id)/2)
    via the Population Stability Index: equal-width bins over the
    global value range, psi_term = (p_a - p_b) * ln(p_a / p_b) per bin
    with +1 Laplace smoothing (so an empty side never produces ±inf);
    Σ psi_term is the monitoring scalar a training pipeline alerts on
    (PSI > 0.2 ⇒ retrain/investigate). Both the bin edges and the
    period split are pure functions of two scalar aggregates, so the
    whole check is SQL-mirrorable.

    Scale shape: one scalar aggregate (lo, hi, max_eid), then ONE pass
    of map-side (period, bin) bincount partials into a bin-domain
    exchange (≤ 2·n_bins rows); the PSI arithmetic runs on the tiny
    aggregate. The fact table is read twice, column-pruned, never
    co-located."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read_events(sf_dir).select_columns(["event_id", "value"])

    g = ds.aggregate(Min("value", alias_name="lo"),
                     Max("value", alias_name="hi"),
                     Max("event_id", alias_name="me"))
    lo, hi, me = float(g["lo"]), float(g["hi"]), int(g["me"])
    # zero-width guard: a constant column puts every row in bin 0 (the
    # SQL mirror assumes hi > lo, which holds for any real value stream)
    width = (hi - lo) / float(n_bins) or 1.0

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        b = np.minimum(np.floor((v - lo) / width).astype(np.int64),
                       n_bins - 1)
        period = (eid * 2 > me).astype(np.int64)
        key = period * n_bins + b
        cnt = np.bincount(key, minlength=2 * n_bins)
        nz = np.flatnonzero(cnt)
        return pa.table({"key": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    cdf = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("c", alias_name="c")).to_pandas()
    cnt = np.zeros(2 * n_bins, np.int64)
    cnt[cdf["key"].to_numpy(np.int64)] = cdf["c"].to_numpy(np.int64)
    na, nb = cnt[:n_bins], cnt[n_bins:]
    present = (na + nb) > 0
    ta, tb = float(na.sum()), float(nb.sum())
    pa_ = (na + 1.0) / (ta + n_bins)
    pb_ = (nb + 1.0) / (tb + n_bins)
    psi = (pa_ - pb_) * np.log(pa_ / pb_)
    bins = np.flatnonzero(present)
    return pd.DataFrame({
        "bin": bins.astype(np.int64),
        "n_a": na[bins],
        "n_b": nb[bins],
        "psi_term": psi[bins],
    })


def events_cusum(sf_dir: str, k_micro: int = 50_000_000,
                 n_buckets: int = 256, stride: int = 100):
    """(event_id, cusum_micro) at every `stride`-th event — the CUSUM
    change-point statistic S_i = max(0, S_{i-1} + x_i - k) over the
    event stream in event_id order (the classic upward-shift detector a
    monitoring pipeline runs on a metric stream; k is the configured
    reference drift, here 50.0 in micro units ≈ the stream mean).

    The recurrence looks inherently sequential, but the closed form
      S_i = P_i - min(0, min_{j<=i} P_j),   P = prefix sums of (x - k)
    turns it into two ASSOCIATIVE scans (sum + min), distributable with
    one cross-partition carry — the same TeraSort-bucket topology as
    events_global_rank:

      pass A  event_id range buckets; each bucket locally sorts and
              emits (total, min_prefix) — two numbers;
      driver  exclusive scan over ordered buckets: carry_total and
              carry_min (the min of all prefix values BEFORE this
              bucket, empty prefix = 0) — the O(n_buckets) carry;
      pass B  same exchange re-executed per bucket: local prefix +
              carry_total = global P_i; min(carry_min, running local
              min + carry_total) = global running min; emit the
              thinned (event_id, S_i) rows.

    Oracle: window sum + running min OVER (ORDER BY event_id) —
    integer-exact in micro units on both sides."""
    import ray as _ray
    from ray.data.aggregate import Max, Min

    ds = _read_events(sf_dir).select_columns(["event_id", "value"])

    g = ds.aggregate(Min("event_id", alias_name="lo"),
                     Max("event_id", alias_name="hi"))
    lo, hi = int(g["lo"]), int(g["hi"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def narrow(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        d = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64) - k_micro
        return pa.table({
            "eid": pa.array(eid.astype(np.int64), pa.int64()),
            "d": pa.array(d, pa.int64()),
            "bucket": pa.array((eid - lo) // width, pa.int64()),
        })

    keyed = ds.map_batches(narrow, batch_format="pyarrow").materialize()

    # pass A: per-bucket (total, min over local prefixes)
    def bucket_summary(df: pd.DataFrame) -> pa.Table:
        o = np.argsort(df["eid"].to_numpy(np.int64))
        d = df["d"].to_numpy(np.int64)[o]
        p = np.cumsum(d)
        return pa.table({
            "bucket": pa.array([int(df["bucket"].iloc[0])], pa.int64()),
            "total": pa.array([int(p[-1])], pa.int64()),
            "minp": pa.array([int(p.min())], pa.int64()),
        })

    summ = keyed.groupby("bucket") \
        .map_groups(bucket_summary, batch_format="pandas").to_pandas() \
        .sort_values("bucket")
    b_ids = summ["bucket"].to_numpy(np.int64)
    totals = summ["total"].to_numpy(np.int64)
    minps = summ["minp"].to_numpy(np.int64)
    carry_total = np.concatenate(([0], np.cumsum(totals)[:-1]))
    # min over all global prefix values strictly before each bucket,
    # including the empty prefix (0)
    global_minp = carry_total + minps
    carry_min = np.minimum.accumulate(
        np.concatenate(([0], global_minp[:-1])))
    carry_ref = _ray.put((b_ids, carry_total, carry_min))

    # pass B: emit thinned global CUSUM rows per bucket
    def emit(df: pd.DataFrame) -> pa.Table:
        bs, cts, cms = _ray.get(carry_ref)
        o = np.argsort(df["eid"].to_numpy(np.int64))
        eid = df["eid"].to_numpy(np.int64)[o]
        d = df["d"].to_numpy(np.int64)[o]
        i = int(np.searchsorted(bs, int(df["bucket"].iloc[0])))
        p = np.cumsum(d) + cts[i]
        runmin = np.minimum(np.minimum.accumulate(p), cms[i])
        s = p - np.minimum(runmin, 0)
        keep = eid % stride == 0
        return pa.table({
            "event_id": pa.array(eid[keep], pa.int64()),
            "cusum_micro": pa.array(s[keep], pa.int64()),
        })

    return keyed.groupby("bucket").map_groups(emit, batch_format="pandas")


def events_type_hll_users(sf_dir: str, p: int = 12):
    """(event_type, n_events, hll_users, exact_users) — GROUPED
    approximate COUNT(DISTINCT): per event type, distinct users via a
    per-group HyperLogLog (2^p registers each) merged register-wise
    through one type-keyed exchange. Completes the grouped-sketch
    matrix (global HLL ✓, grouped KLL ✓, grouped exact-distinct ✓):
    at an unbounded user domain the exact path's per-group distinct
    exchange grows with the DATA, the sketch path stays 2^p bytes per
    (batch, group) partial. The exact column rides along here purely
    as the verification baseline (rel. error ~1.04/√2^p, asserted in
    the test and visible in the output)."""
    from ray.data.aggregate import Sum

    from ..functions.sketch import HyperLogLog
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        types, blobs, ns, uniq_u = [], [], [], []
        for t in np.unique(et):
            m = et == t
            hll = HyperLogLog(p=p)
            hll.add_hashes(pd.util.hash_array(uid[m]))
            types.append(t)
            blobs.append(hll.to_bytes())
            ns.append(int(m.sum()))
            uniq_u.append(np.unique(uid[m]))
        # exact-side partials: batch-deduped (type, user) rows
        ex_t = np.repeat(np.asarray(types, object),
                         [len(u) for u in uniq_u])
        ex_u = np.concatenate(uniq_u) if uniq_u else np.array([], np.int64)
        k = len(types)
        return pa.table({
            "event_type": pa.array(list(types) + ex_t.tolist(),
                                   pa.string()),
            "blob": pa.array(blobs + [b""] * len(ex_u), pa.binary()),
            "n": pa.array(ns + [0] * len(ex_u), pa.int64()),
            "user_id": pa.array([-1] * k + ex_u.tolist(), pa.int64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow")

    def merge_group(df: pd.DataFrame) -> pa.Table:
        types, ns, hll_c, ex_c = [], [], [], []
        for t, g in df.groupby("event_type", sort=False):
            sk = g[g["user_id"] == -1]
            hll = HyperLogLog(p=p)
            for blob in sk["blob"]:
                hll.merge(HyperLogLog.from_bytes(blob))
            ex = g.loc[g["user_id"] != -1, "user_id"].nunique()
            types.append(t)
            ns.append(int(sk["n"].sum()))
            hll_c.append(int(round(hll.estimate())))
            ex_c.append(int(ex))
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array(ns, pa.int64()),
            "hll_users": pa.array(hll_c, pa.int64()),
            "exact_users": pa.array(ex_c, pa.int64()),
        })

    return bucketed_group_map(rows, "event_type", merge_group,
                              num_buckets=4)


def events_autocorr(sf_dir: str, k_max: int = 3, n_buckets: int = 64):
    """(event_type, lag, n_pairs, sum_x, sum_y, corr_micro) — EXACT
    per-type lag-k AUTOCORRELATION (k = 1..k_max) of the value series
    in event_id order: Pearson r over the pair set (x_i, x_{i+k}) of
    each type's sequence — the serial-dependence read a monitoring /
    feature-engineering pipeline runs before fitting AR models or
    choosing a shuffle granularity (high lag-1 ACF ⇒ consecutive rows
    are redundant ⇒ sample, don't stream, the metric).

    Lag pairs look like they need a per-type global sort; the scale
    shape is the boundary-set scan-carry family (events_global_rank /
    rle_compression_advisor): event_id RANGE buckets preserve per-type
    order, so each type's global sequence is the concatenation of its
    per-bucket subsequences. One bucket-keyed exchange; each bucket
    locally sorts and emits (a) per-(type, k) moment partials over its
    IN-BUCKET pairs, with per-term (hi, lo) limb splits for the three
    product sums exactly as events_zscore_outliers (a micro value can
    reach 5.6e8, its square 3.1e17 — an 8192-term batch sum overflows
    int64), and (b) its per-type head/tail k_max boundary rows + the
    subsequence length. Any pair that SPANS buckets has ≤ k-1 elements
    after its left endpoint in that bucket (so the left endpoint is in
    the tail-k_max set) and ≤ k-1 before its right endpoint (head-k_max
    set) — the driver reconstructs every spanning pair from the
    O(n_buckets · types · k_max) boundary set using global ranks from
    the exclusive length prefix, filters to bucket-crossing pairs only
    (in-bucket pairs were counted locally), and folds them into the
    bigint moment totals. Final Pearson r per (type, lag) is computed
    double-precision in the oracle's exact operand order, rounded
    half-away-from-zero to integer micros (lineitem_corr_stats
    convention).

    Oracle: UNION ALL of k fixed-offset lag() windows per type with
    HUGEINT moment sums — integer-exact on both sides."""
    import math

    from ray.data.aggregate import Max, Min

    ds = _read_events(sf_dir).select_columns(
        ["event_id", "event_type", "value"])

    g = ds.aggregate(Min("event_id", alias_name="lo"),
                     Max("event_id", alias_name="hi"))
    lo, hi = int(g["lo"]), int(g["hi"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def narrow(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        return pa.table({
            "eid": pa.array(eid, pa.int64()),
            "event_type": batch["event_type"],
            "v": pa.array(v, pa.int64()),
            "bucket": pa.array((eid - lo) // width, pa.int64()),
        })

    keyed = ds.map_batches(narrow, batch_format="pyarrow")

    LIMB_MASK = np.int64((1 << 32) - 1)

    def bucket_local(df: pd.DataFrame) -> pa.Table:
        o = np.argsort(df["eid"].to_numpy(np.int64))
        et = df["event_type"].to_numpy(dtype=object)[o]
        v = df["v"].to_numpy(np.int64)[o]
        b = int(df["bucket"].iloc[0])
        codes, uniq = pd.factorize(et, sort=True)
        # rows: kind 0 = per-(type, k) in-bucket moment partials;
        #       kind 1 = per-type boundary rows (rank within the
        #                bucket's type-subsequence, value, length)
        cols = {k: [] for k in (
            "kind", "event_type", "k", "n", "sx", "sy",
            "sxy_hi", "sxy_lo", "sxx_hi", "sxx_lo", "syy_hi", "syy_lo",
            "bucket", "rank", "val", "tlen")}

        def emit(kind, t, **kw):
            base = dict(kind=kind, event_type=t, k=0, n=0, sx=0, sy=0,
                        sxy_hi=0, sxy_lo=0, sxx_hi=0, sxx_lo=0,
                        syy_hi=0, syy_lo=0, bucket=b, rank=0, val=0,
                        tlen=0)
            base.update(kw)
            for c, val in base.items():
                cols[c].append(val)

        for ti, t in enumerate(uniq):
            tv = v[codes == ti]
            m = len(tv)
            for k in range(1, k_max + 1):
                if m <= k:
                    continue
                x, y = tv[:-k], tv[k:]
                xy, xx, yy = x * y, x * x, y * y
                emit(0, t, k=k, n=m - k,
                     sx=int(x.sum()), sy=int(y.sum()),
                     sxy_hi=int((xy >> np.int64(32)).sum()),
                     sxy_lo=int((xy & LIMB_MASK).sum()),
                     sxx_hi=int((xx >> np.int64(32)).sum()),
                     sxx_lo=int((xx & LIMB_MASK).sum()),
                     syy_hi=int((yy >> np.int64(32)).sum()),
                     syy_lo=int((yy & LIMB_MASK).sum()))
            ranks = set(range(min(k_max, m))) \
                | set(range(max(0, m - k_max), m))
            for r in sorted(ranks):
                emit(1, t, rank=r, val=int(tv[r]), tlen=m)

        return pa.table({c: pa.array(cols[c], pa.string()
                                     if c == "event_type" else pa.int64())
                         for c in cols})

    small = keyed.groupby("bucket") \
        .map_groups(bucket_local, batch_format="pandas").to_pandas()

    # fold in-bucket moment partials to bigint totals per (type, k)
    mom: dict[tuple, dict] = {}
    for _, r in small[small["kind"] == 0].iterrows():
        key = (r["event_type"], int(r["k"]))
        m = mom.setdefault(key, dict(n=0, sx=0, sy=0, sxy=0, sxx=0,
                                     syy=0))
        m["n"] += int(r["n"])
        m["sx"] += int(r["sx"])
        m["sy"] += int(r["sy"])
        m["sxy"] += (int(r["sxy_hi"]) << 32) + int(r["sxy_lo"])
        m["sxx"] += (int(r["sxx_hi"]) << 32) + int(r["sxx_lo"])
        m["syy"] += (int(r["syy_hi"]) << 32) + int(r["syy_lo"])

    # stitch spanning pairs from the boundary set
    bnd = small[small["kind"] == 1]
    for t, gdf in bnd.groupby("event_type", sort=False):
        gdf = gdf.sort_values(["bucket", "rank"])
        # exclusive prefix of per-bucket subsequence lengths
        lens = gdf.groupby("bucket", sort=True)["tlen"].first()
        offsets = lens.cumsum().shift(fill_value=0)
        gpos = (gdf["bucket"].map(offsets)
                + gdf["rank"]).to_numpy(np.int64)
        vals = gdf["val"].to_numpy(np.int64)
        bkts = gdf["bucket"].to_numpy(np.int64)
        pos_ix = {int(p): i for i, p in enumerate(gpos)}
        for i, p in enumerate(gpos):
            for k in range(1, k_max + 1):
                j = pos_ix.get(int(p) + k)
                if j is None or bkts[j] == bkts[i]:
                    continue  # in-bucket pairs were counted locally
                m = mom.setdefault((t, k), dict(n=0, sx=0, sy=0, sxy=0,
                                                sxx=0, syy=0))
                x, y = int(vals[i]), int(vals[j])
                m["n"] += 1
                m["sx"] += x
                m["sy"] += y
                m["sxy"] += x * y
                m["sxx"] += x * x
                m["syy"] += y * y

    rows = []
    for (t, k), m in sorted(mom.items()):
        n = m["n"]
        num = n * m["sxy"] - m["sx"] * m["sy"]
        d1 = n * m["sxx"] - m["sx"] * m["sx"]
        d2 = n * m["syy"] - m["sy"] * m["sy"]
        # d1 * d2 can exceed INT128 — the oracle multiplies as doubles,
        # so mirror float(d1) * float(d2), not float(d1 * d2)
        corr = float(num) * 1_000_000.0 / math.sqrt(float(d1) * float(d2))
        corr_micro = math.floor(corr + 0.5) if corr >= 0 \
            else -math.floor(-corr + 0.5)
        rows.append((t, k, n, m["sx"], m["sy"], corr_micro))
    out = pd.DataFrame(rows, columns=[
        "event_type", "lag", "n_pairs", "sum_x", "sum_y", "corr_micro"])
    return out.astype({"lag": "int64", "n_pairs": "int64",
                       "sum_x": "int64", "sum_y": "int64",
                       "corr_micro": "int64"})


def events_ks_drift(sf_dir: str, n_buckets: int = 64):
    """(n_a, n_b, ks_num, ks_den, ks_micro) — EXACT two-sample
    Kolmogorov–Smirnov statistic between the first and second half of
    the event stream (split at max(event_id)/2, the events_drift_psi
    periods): D = max over distinct values v of |F_a(v) − F_b(v)|,
    reported as the exact integer pair
        ks_num = max |cum_a(v)·n_b − cum_b(v)·n_a|,   ks_den = n_a·n_b
    (no floats until the convenience ks_micro column, which divides
    the exact pair). KS complements PSI: binning-free, sensitive to
    any CDF shift, and the standard pre-retrain drift gate.

    The CDF looks like a global sort; the scale shape is the
    events_global_rank family: value-RANGE buckets, each bucket sorts
    its own slice and emits per-side counts; the driver computes
    O(n_buckets) exclusive (cum_a, cum_b) carries; the same exchange
    re-executed finds each bucket's local max of the cross-multiplied
    gap (vectorized over its distinct values), and the driver takes
    the max of bucket maxima. Products stay in int64: cum ≤ n ≤ 2³¹
    and n_a·n_b ≤ 2⁶² at 2³¹ rows per side (beyond that, limb-split).

    Oracle: per-distinct-value grouped counts + window cumsums +
    HUGEINT cross-multiplied max — integer-exact on both sides."""
    import ray as _ray
    from ray.data.aggregate import Max, Min, Sum

    ds = _read_events(sf_dir).select_columns(["event_id", "value"])

    g = ds.aggregate(Min("value", alias_name="lo"),
                     Max("value", alias_name="hi"),
                     Max("event_id", alias_name="me"))
    me = int(g["me"])
    lo = int(np.floor(float(g["lo"]) * 1_000_000))
    hi = int(np.ceil(float(g["hi"]) * 1_000_000))
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def narrow(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        period = (eid * 2 > me).astype(np.int64)
        return pa.table({
            "v": pa.array(v, pa.int64()),
            "p": pa.array(period, pa.int64()),
            "bucket": pa.array((v - lo) // width, pa.int64()),
        })

    keyed = ds.map_batches(narrow, batch_format="pyarrow").materialize()

    def bucket_counts(df: pd.DataFrame) -> pa.Table:
        p = df["p"].to_numpy(np.int64)
        return pa.table({
            "bucket": pa.array([int(df["bucket"].iloc[0])], pa.int64()),
            "ca": pa.array([int((p == 0).sum())], pa.int64()),
            "cb": pa.array([int((p == 1).sum())], pa.int64()),
        })

    summ = keyed.groupby("bucket") \
        .map_groups(bucket_counts, batch_format="pandas").to_pandas() \
        .sort_values("bucket")
    b_ids = summ["bucket"].to_numpy(np.int64)
    ca = summ["ca"].to_numpy(np.int64)
    cb = summ["cb"].to_numpy(np.int64)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    carry_a = np.concatenate(([0], np.cumsum(ca)[:-1]))
    carry_b = np.concatenate(([0], np.cumsum(cb)[:-1]))
    carry_ref = _ray.put((b_ids, carry_a, carry_b))

    def bucket_max(df: pd.DataFrame) -> pa.Table:
        bs, cas, cbs = _ray.get(carry_ref)
        i = int(np.searchsorted(bs, int(df["bucket"].iloc[0])))
        v = df["v"].to_numpy(np.int64)
        p = df["p"].to_numpy(np.int64)
        o = np.argsort(v, kind="stable")
        v_s, p_s = v[o], p[o]
        # per distinct value: cumulative per-side counts at that value
        last = np.r_[v_s[1:] != v_s[:-1], True]
        cum_a = np.cumsum(p_s == 0)[last] + cas[i]
        cum_b = np.cumsum(p_s == 1)[last] + cbs[i]
        gap = np.abs(cum_a * n_b - cum_b * n_a)
        return pa.table({"m": pa.array([int(gap.max())], pa.int64())})

    mx = keyed.groupby("bucket") \
        .map_groups(bucket_max, batch_format="pandas").to_pandas()
    ks_num = int(mx["m"].max())
    ks_den = n_a * n_b
    return pd.DataFrame({
        "n_a": [n_a], "n_b": [n_b],
        "ks_num": [ks_num], "ks_den": [ks_den],
        "ks_micro": [int(round(ks_num * 1_000_000.0 / ks_den))],
    }).astype("int64")


def events_mannwhitney_drift(sf_dir: str, n_buckets: int = 64):
    """(n_a, n_b, u2_a, tie_cube, auc_micro) — EXACT Mann–Whitney U
    (Wilcoxon rank-sum) statistic between the first and second half of
    the event stream (the events_ks_drift / events_drift_psi split):
    the rank-based member of the drift family. KS asks "did the CDF
    shift anywhere"; U asks "does one half stochastically dominate" —
    U_a / (n_a·n_b) IS the exact AUC / common-language effect size, the
    number an A/B or model-score drift gate thresholds on.

    No float ranks ever form. With per-distinct-value side counts
    ca(v), cb(v) and cb_below(v) = Σ_{w<v} cb(w):

        2·U_a  = Σ_v ca(v) · (2·cb_below(v) + cb(v))        (u2_a)
        tie_cube = Σ_v t³ − t,  t = ca(v)+cb(v)   (the tie-correction
                   term of the normal-approximation variance, exact)

    both integer-exact. Scale shape: value-RANGE buckets (ties cannot
    span buckets, so tie_cube folds locally), each bucket sorts its own
    slice once and emits ONE partial row (ca_sum, cb_sum, local u2 from
    its exclusive in-bucket cumsum, tie_cube); the cross-bucket term is
    the O(n_buckets) driver carry Σ 2·carry_cb(bucket)·ca_sum(bucket).
    One exchange total — cheaper than KS's two. Products stay in int64
    below ~2³¹ rows per side; beyond that, limb-split like the moment
    sums (events_autocorr).

    Oracle: grouped per-value side counts + window cumsum + HUGEINT
    fold of the same identity — integer-exact on both sides."""
    import math

    from ray.data.aggregate import Max, Min

    ds = _read_events(sf_dir).select_columns(["event_id", "value"])

    g = ds.aggregate(Min("value", alias_name="lo"),
                     Max("value", alias_name="hi"),
                     Max("event_id", alias_name="me"))
    me = int(g["me"])
    lo = int(np.floor(float(g["lo"]) * 1_000_000))
    hi = int(np.ceil(float(g["hi"]) * 1_000_000))
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def narrow(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        period = (eid * 2 > me).astype(np.int64)
        return pa.table({
            "v": pa.array(v, pa.int64()),
            "p": pa.array(period, pa.int64()),
            "bucket": pa.array((v - lo) // width, pa.int64()),
        })

    keyed = ds.map_batches(narrow, batch_format="pyarrow")

    def bucket_partial(df: pd.DataFrame) -> pa.Table:
        v = df["v"].to_numpy(np.int64)
        p = df["p"].to_numpy(np.int64)
        o = np.argsort(v, kind="stable")
        v_s, p_s = v[o], p[o]
        last = np.r_[v_s[1:] != v_s[:-1], True]
        cum_a = np.cumsum(p_s == 0)[last]   # inclusive per-distinct
        cum_b = np.cumsum(p_s == 1)[last]
        ca = np.diff(np.r_[0, cum_a])
        cb = np.diff(np.r_[0, cum_b])
        cb_below = cum_b - cb               # exclusive in-bucket cumsum
        t = ca + cb
        return pa.table({
            "bucket": pa.array([int(df["bucket"].iloc[0])], pa.int64()),
            "ca_sum": pa.array([int(ca.sum())], pa.int64()),
            "cb_sum": pa.array([int(cb.sum())], pa.int64()),
            "u2_local": pa.array(
                [int((ca * (2 * cb_below + cb)).sum())], pa.int64()),
            "tie": pa.array([int((t * t * t - t).sum())], pa.int64()),
        })

    summ = keyed.groupby("bucket") \
        .map_groups(bucket_partial, batch_format="pandas").to_pandas() \
        .sort_values("bucket")
    ca_s = summ["ca_sum"].to_numpy(np.int64)
    cb_s = summ["cb_sum"].to_numpy(np.int64)
    n_a, n_b = int(ca_s.sum()), int(cb_s.sum())
    carry_cb = np.concatenate(([0], np.cumsum(cb_s)[:-1]))
    u2 = int(summ["u2_local"].sum()) + int((2 * carry_cb * ca_s).sum())
    tie_cube = int(summ["tie"].sum())
    auc_micro = math.floor(u2 * 1_000_000.0 / (2.0 * n_a * n_b) + 0.5)
    return pd.DataFrame({
        "n_a": [n_a], "n_b": [n_b], "u2_a": [u2],
        "tie_cube": [tie_cube], "auc_micro": [auc_micro],
    }).astype("int64")


def events_inter_arrival_stats(sf_dir: str):
    """(digits, n, sum_gap_us) — per-user INTER-ARRIVAL time profile:
    consecutive same-user event gaps in (ts, event_id) order, bucketed
    by the gap's DECIMAL DIGIT COUNT in microseconds (an exact
    integer log-scale both engines compute identically — float log2
    would round differently at bucket edges). The arrival-process
    profile a sessionizer reads before choosing its timeout.

    Shape: narrow projection, ONE user-keyed shuffle, per-bucket
    lexsort + shifted diff with user-boundary masking (the
    events_value_delta skeleton), then a digits-domain aggregate."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_id", "ts", "user_id"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    _P10 = np.power(10, np.arange(1, 19), dtype=np.int64)

    def gaps(df: pd.DataFrame) -> pa.Table:
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        u_s, t_s = uid[order], ts[order]
        gap = t_s[1:] - t_s[:-1]
        same = u_s[1:] == u_s[:-1]
        gap = gap[same]
        # digit count: exact integer compare against powers of 10
        digits = np.searchsorted(_P10, gap, side="right") + 1
        g = pd.DataFrame({"digits": digits, "n": 1, "s": gap}) \
            .groupby("digits", sort=False).sum().reset_index()
        return pa.table({
            "digits": pa.array(g["digits"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(g["s"].to_numpy(np.int64), pa.int64()),
        })

    return bucketed_group_map(
        ds.map_batches(narrow, batch_format="pyarrow"),
        "user_id", gaps, num_buckets=8) \
        .groupby("digits").aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="sum_gap_us"))


def events_user_daily_streaks(sf_dir: str):
    """(user_id, n_active_days, n_streaks, max_streak_days) — the
    GAPS-AND-ISLANDS primitive: per user, runs of consecutive active
    DAYS (integer day = epoch_us // 86.4e9, mirrored by the oracle's
    row_number anchor trick). The engagement-streak shape every
    activity dashboard computes.

    Shape: distinct (user, day) partials fold map-side, ONE user-keyed
    exchange, per-bucket vectorized island detection (sort + boundary
    diff — no per-user Python)."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["ts", "user_id"])

    def days(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    uday = ds.map_batches(days, batch_format="pyarrow")

    def islands(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["user_id", "day"])
        uid = df["user_id"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        n = len(uid)
        new_seg = np.ones(n, bool)
        new_seg[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        seg = np.cumsum(new_seg) - 1
        seg_len = np.bincount(seg)
        seg_user = uid[np.flatnonzero(new_seg)]
        g = pd.DataFrame({"user_id": seg_user, "len": seg_len}) \
            .groupby("user_id", sort=False).agg(
                n_active_days=("len", "sum"), n_streaks=("len", "size"),
                max_streak_days=("len", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    return bucketed_group_map(uday, "user_id", islands, num_buckets=8)


def events_session_count_sweep(sf_dir: str, timeouts=(60, 300, 1800)):
    """(timeout_s, n_users, n_sessions) — session-count sensitivity
    sweep: for each candidate inactivity timeout, n_sessions =
    n_users + #(same-user gaps > timeout) — all exact integers from
    ONE gap computation (the events_inter_arrival_stats skeleton);
    the sweep a sessionizer runs before fixing its timeout."""
    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(["event_id", "ts", "user_id"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    touts = tuple(int(t) for t in timeouts)

    def gaps(df: pd.DataFrame) -> pa.Table:
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        u_s, t_s = uid[order], ts[order]
        gap = t_s[1:] - t_s[:-1]
        same = u_s[1:] == u_s[:-1]
        gap = gap[same]
        cols = {"n_users": pa.array([len(np.unique(uid))], pa.int64())}
        for t in touts:
            cols[f"b{t}"] = pa.array(
                [int((gap > t * 1_000_000).sum())], pa.int64())
        return pa.table(cols)

    agg = bucketed_group_map(
        ds.map_batches(narrow, batch_format="pyarrow"),
        "user_id", gaps, num_buckets=8) \
        .sum(["n_users"] + [f"b{t}" for t in touts])
    n_users = int(agg["sum(n_users)"])
    return pd.DataFrame({
        "timeout_s": np.array(touts, np.int64),
        "n_users": np.full(len(touts), n_users, np.int64),
        "n_sessions": np.array(
            [n_users + int(agg[f"sum(b{t})"]) for t in touts], np.int64),
    })


def events_value_benford(sf_dir: str):
    """(digit, n, share_ppm) — Benford first-significant-digit census
    of |value| in exact cents (zero-cent rows excluded): the
    data-quality screen fabricated numeric columns fail. First digit
    comes from exact integer arithmetic (power-of-ten searchsorted
    here, VARCHAR substr in the oracle — identical for positive
    ints); share_ppm = n * 1e6 // total."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir).select_columns(["value"])
    p10 = np.power(10, np.arange(1, 19), dtype=np.int64)

    def digits(batch: pa.Table) -> pa.Table:
        cents = np.abs(np.round(batch["value"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64))
        cents = cents[cents > 0]
        nd = np.searchsorted(p10, cents, side="right")
        div = np.where(nd == 0, 1, p10[np.maximum(nd, 1) - 1])
        first = cents // div
        g = pd.DataFrame({"digit": first, "n": 1}) \
            .groupby("digit", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    agg = ds.map_batches(digits, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()  # digit domain: 9 rows
    total = int(agg["n"].sum())
    return pd.DataFrame({
        "digit": agg["digit"].to_numpy(np.int64),
        "n": agg["n"].to_numpy(np.int64),
        "share_ppm": (agg["n"].to_numpy(np.int64) * 1_000_000 // total),
    })


def events_weekend_contrast(sf_dir: str):
    """(event_type, n_weekday, n_weekend, cents_weekday, cents_weekend)
    — weekday/weekend activity contrast per event type (the simplest
    seasonality decomposition a capacity planner reads): dow from the
    engine-agnostic (epoch_us // 86.4e9 + 4) % 7 convention (Monday=0,
    weekend = 5/6), value in exact cents. Map-side combined, one
    type-domain exchange."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir).select_columns(["ts", "event_type",
                                              "value"])

    def part(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        wk = (((us // 86_400_000_000 + 4) % 7) >= 5).astype(np.int64)
        cents = np.round(batch["value"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "n_weekday": 1 - wk, "n_weekend": wk,
            "cents_weekday": cents * (1 - wk),
            "cents_weekend": cents * wk})
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    return ds.map_batches(part, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n_weekday", alias_name="n_weekday"),
            Sum("n_weekend", alias_name="n_weekend"),
            Sum("cents_weekday", alias_name="cents_weekday"),
            Sum("cents_weekend", alias_name="cents_weekend"))


# ---------------------------------------------------------------------------
# Round-5 oracled behavioral operators
# ---------------------------------------------------------------------------

def events_funnel_conversion(sf_dir: str,
                             steps=("view", "click", "purchase")):
    """(step, step_name, n_users, conversion_ppm) — the STRICTLY
    ORDERED funnel: a user converts step k iff an event of step k's
    type occurs AFTER their step-(k-1) conversion time (earliest
    qualifying event chains forward — the standard product-analytics
    funnel, not mere set intersection). conversion_ppm is vs the
    step-1 population. One user-keyed exchange; per-user the chain is
    a vectorized min-after-cursor over its (type, ts) rows; partial
    step counts reduce to a three-row table."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["user_id", "event_type", "ts"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    rows = ds.map_batches(narrow, batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pa.Table:
        counts = np.zeros(len(steps), np.int64)
        for _, g in df.groupby("user_id", sort=False):
            cursor = -1
            for k, st in enumerate(steps):
                cand = g.loc[(g["event_type"] == st)
                             & (g["ts_us"] > cursor), "ts_us"]
                if not len(cand):
                    break
                cursor = int(cand.min())
                counts[k] += 1
        return pa.table({
            "step": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
            "n_users": pa.array(counts, pa.int64())})

    agg = bucketed_group_map(rows, "user_id", per_user, num_buckets=8) \
        .groupby("step").aggregate(Sum("n_users", alias_name="n_users")) \
        .to_pandas().sort_values("step")
    n1 = max(1, int(agg.loc[agg["step"] == 1, "n_users"].sum()))
    nu = agg["n_users"].to_numpy(np.int64)
    return pd.DataFrame({
        "step": agg["step"].to_numpy(np.int64),
        "step_name": [steps[int(s) - 1] for s in agg["step"]],
        "n_users": nu,
        "conversion_ppm": nu * 1_000_000 // n1,
    })


def events_daily_anomaly(sf_dir: str):
    """(event_type, n_days, n_anomalous) — per-type daily-volume
    anomaly screen: a day is anomalous when its event count sits more
    than 2 population standard deviations from that type's mean daily
    count, decided in EXACT integer arithmetic ((cnt·n − s1)² >
    4·n·(n·s2 − s1²) avoids the float boundary entirely — the
    monitoring rule a 100 TB ingest runs nightly). Shape: (type, day)
    partial counts map-side → one domain-bounded groupby → per-type
    day table is days-domain-bounded."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch["ts"].to_pandas()
        day = t.dt.strftime("%Y-%m-%d")
        df = pd.DataFrame({"event_type": batch["event_type"].to_pylist(),
                           "day": day, "n": 1})
        g = df.groupby(["event_type", "day"], sort=False).sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    daily = _read_events(sf_dir).select_columns(["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(
            Sum("n", alias_name="n")).to_pandas()

    rows = []
    for et, g in daily.groupby("event_type", sort=False):
        c = g["n"].to_numpy(np.int64)
        n = len(c)
        s1 = int(c.sum())
        s2 = int((c * c).sum())
        dev2 = (c.astype(object) * n - s1) ** 2  # exact python ints
        bound = 4 * n * (n * s2 - s1 * s1)
        rows.append((et, n, int(sum(1 for d in dev2 if d > bound))))
    out = pd.DataFrame(rows, columns=["event_type", "n_days",
                                      "n_anomalous"])
    return out.astype({"n_days": "int64", "n_anomalous": "int64"})


def events_bounce_rate(sf_dir: str, gap_sec: int = 1800):
    """(first_type, n_sessions, n_bounce, bounce_ppm) — session
    BOUNCE analysis on top of the engine's sessionization rule (same
    gap as events_sessionize): sessions grouped by their FIRST event's
    type ((ts, event_id)-ordered — fully deterministic), a bounce is a
    single-event session. One user-keyed exchange; per-user the gap
    cut and first-event pick are vectorized; only (first_type, n,
    bounce) partials shuffle."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_events(sf_dir).select_columns(
        ["user_id", "event_type", "ts", "event_id"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    rows = ds.map_batches(narrow, batch_format="pyarrow")
    gap_us = gap_sec * 1_000_000

    def per_user(df: pd.DataFrame) -> pa.Table:
        parts = []
        for _, g in df.groupby("user_id", sort=False):
            g = g.sort_values(["ts_us", "event_id"], kind="stable")
            t = g["ts_us"].to_numpy(np.int64)
            new = np.ones(len(t), bool)
            new[1:] = (t[1:] - t[:-1]) > gap_us
            sid = np.cumsum(new) - 1
            et = g["event_type"].to_numpy()
            firsts = np.flatnonzero(new)
            sizes = np.diff(np.r_[firsts, len(t)])
            parts.append(pd.DataFrame({
                "first_type": et[firsts],
                "one": np.ones(len(firsts), np.int64),
                "bounce": (sizes == 1).astype(np.int64)}))
        if not parts:
            return pa.table({"first_type": pa.array([], pa.string()),
                             "one": pa.array([], pa.int64()),
                             "bounce": pa.array([], pa.int64())})
        g = pd.concat(parts).groupby("first_type", sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    agg = bucketed_group_map(rows, "user_id", per_user, num_buckets=8) \
        .groupby("first_type").aggregate(
            Sum("one", alias_name="n_sessions"),
            Sum("bounce", alias_name="n_bounce")).to_pandas()
    ns = agg["n_sessions"].to_numpy(np.int64)
    nb = agg["n_bounce"].to_numpy(np.int64)
    return pd.DataFrame({
        "first_type": agg["first_type"],
        "n_sessions": ns, "n_bounce": nb,
        "bounce_ppm": nb * 1_000_000 // np.maximum(ns, 1),
    })


def events_props_field_stats(sf_dir: str):
    """(event_type, n, sum_k, min_k, max_k, n_distinct_k) — the
    SEMI-STRUCTURED column leg: the `props` JSON payload's "k" field
    extracted with the vectorized RE2 kernel (pc.extract_regex — no
    per-row json.loads in the hot path; both engines are RE2 so the
    oracle's regexp_extract matches byte-for-byte), then exact grouped
    aggregates incl. a distinct count via map-side (type, k) dedup.
    The pattern a 100 TB log ingest uses to avoid a JSON-parse stage
    for single-field pulls."""
    import pandas as pd

    from ray.data.aggregate import Max, Min, Sum

    ds = _read_events(sf_dir).select_columns(["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["props"], r'"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(), "k": k})
        g = df.groupby(["event_type", "k"], sort=False) \
            .size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    # (type, k)-domain partials: n per distinct pair — the distinct
    # count falls out of the same exchange the aggregates ride
    pairs = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "k"]).aggregate(Sum("n", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.cast(batch["n"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "n": pa.array(n, pa.int64()),
            "sum_k": pa.array(n * k, pa.int64()),
            "min_k": pa.array(k, pa.int64()),
            "max_k": pa.array(k, pa.int64()),
            "one": pa.array(np.ones(len(k), np.int64), pa.int64()),
        })

    agg = pairs.map_batches(finish, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
            Sum("one", alias_name="n_distinct_k"))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": pc.cast(b["n"], pa.int64()),
            "sum_k": pc.cast(b["sum_k"], pa.int64()),
            "min_k": pc.cast(b["min_k"], pa.int64()),
            "max_k": pc.cast(b["max_k"], pa.int64()),
            "n_distinct_k": pc.cast(b["n_distinct_k"], pa.int64()),
        }), batch_format="pyarrow")


def events_type_hll_users_md5(sf_dir: str, p: int = 12):
    """(event_type, n_events, hll_users) — the ORACLE-VERIFIED
    HyperLogLog: same grouped sketch as events_type_hll_users but with
    an md5-derived 64-bit hash (first 16 hex of md5(str(user_id))) so
    DuckDB can reproduce the REGISTERS bit-for-bit in SQL — register
    index = top p hash bits, rank = (64-p) − bit_length(w) + 1 via the
    exact bin()-length form (no float log2 on either side), grouped
    max, then the identical Flajolet estimator expression. The sketch
    itself is thereby hash-verified, not just error-bounded — the same
    md5-parity trade minhash_lsh_oph makes for its splitmix twin (the
    fast production path stays events_type_hll_users).

    Scale shape: per-batch (type, register, rank) partials from
    BATCH-DISTINCT users (the md5 loop runs once per distinct user per
    batch), one (type, idx)-domain groupby-max (≤ types × 2^p rows),
    driver finish on the register table."""
    import hashlib

    import pandas as pd

    from ray.data.aggregate import Max, Sum

    ds = _read_events(sf_dir).select_columns(["event_type", "user_id"])
    wbits = 64 - p
    wmask = np.uint64((1 << wbits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pair = pd.DataFrame({"t": et, "u": uid})
        counts = pair.groupby("t", sort=False).size()
        uniq = pair.drop_duplicates()
        # md5 per batch-distinct user — user-domain-bounded per batch
        hv = np.fromiter(
            (int(hashlib.md5(str(u).encode()).hexdigest()[:16], 16)
             for u in uniq["u"]),
            dtype=np.uint64, count=len(uniq))
        idx = (hv >> np.uint64(64 - p)).astype(np.int64)
        from ..functions.sketch import bit_length_u64
        w = hv & wmask
        rank = (wbits - bit_length_u64(w) + 1).astype(np.int64)
        reg = pd.DataFrame({"event_type": uniq["t"].to_numpy(),
                            "idx": idx, "rank": rank}) \
            .groupby(["event_type", "idx"], sort=False)["rank"] \
            .max().reset_index()
        reg["n"] = 0
        cnt = pd.DataFrame({"event_type": counts.index,
                            "idx": -1, "rank": 0,
                            "n": counts.to_numpy(np.int64)})
        out = pd.concat([reg, cnt], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "idx"]).aggregate(
            Max("rank", alias_name="rank"), Sum("n", alias_name="n")) \
        .to_pandas()  # ≤ types × (2^p + 1) rows

    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    rows = []
    for et, g in agg.groupby("event_type", sort=False):
        n_events = int(g.loc[g["idx"] == -1, "n"].sum())
        regs = g.loc[g["idx"] >= 0, "rank"].to_numpy(np.int64)
        zeros = (1 << p) - len(regs) + int((regs == 0).sum())
        denom = float(np.exp2(-regs.astype(np.float64)).sum()) \
            + ((1 << p) - len(regs)) * 1.0
        e = alpha * m * m / denom
        if e <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        else:
            est = e
        rows.append((et, n_events, int(np.round(est))))
    out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                      "hll_users"])
    return out.astype({"n_events": "int64", "hll_users": "int64"})
