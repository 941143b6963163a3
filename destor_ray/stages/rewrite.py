"""Rewrite (anti-fragmentation) scoring — ports of the reference's four
rewriting algorithms (SURVEY.md §2.6) as pure stream kernels, applied
partition-locally by the Ray stage below.

A "chunk stream" here is the ordered sequence of records in one output
partition: (container_id, size, is_dup). container_id == -1 stands for
TEMPORARY_ID (a unique chunk being written fresh); duplicates reference
the container holding their cluster representative.

Kernels (each cites its reference source):
  cfl_rewrite_flags   /root/reference/src/cfl_rewrite.c:19-93
  cbr_rewrite_flags   /root/reference/src/cbr_rewrite.c:9-150
  cap_rewrite_flags   /root/reference/src/cap_rewrite.c:10-107
  har_utilization     /root/reference/src/har_rewrite.c:61-168
  cfl_monitor         /root/reference/src/restore_aware.c:32-68

Windows are partition-local (the reference's single totally-ordered
stream maps to per-partition order, SURVEY.md §2.10).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

CONTAINER_SIZE = 4 << 20                  # containerstore.h:13
CONTAINER_META_SIZE = 32 << 10            # containerstore.h:14
CONTAINER_PAYLOAD = CONTAINER_SIZE - CONTAINER_META_SIZE
CONTAINER_META_ENTRY = 28                 # containerstore.h:16
TEMPORARY_ID = -1


def cfl_rewrite_flags(ids: np.ndarray, sizes: np.ndarray,
                      usage_threshold: float = 0.03,
                      buffer_size: int = 1024) -> np.ndarray:
    """CFL selective dedup (cfl_rewrite.c): chunks are buffered in runs of
    one container id (a unique chunk never breaks a run); when the run
    ends (or the buffer fills), every duplicate in it is marked
    out-of-order iff the run's byte size is below
    usage_threshold × container payload."""
    n = len(ids)
    flags = np.zeros(n, dtype=bool)
    buf: list[int] = []
    buf_bytes = 0
    last_id = TEMPORARY_ID
    full = False

    def judge() -> None:
        nonlocal buf, buf_bytes
        ooo = buf_bytes < usage_threshold * CONTAINER_PAYLOAD
        if ooo:
            for j in buf:
                if ids[j] != TEMPORARY_ID:
                    flags[j] = True
        buf = []
        buf_bytes = 0

    for i in range(n):
        if (last_id != TEMPORARY_ID and last_id != ids[i]) or full:
            judge()
            full = False
        last_id = int(ids[i])
        buf.append(i)
        buf_bytes += int(sizes[i])
        if len(buf) >= buffer_size:
            full = True
    if buf:
        judge()
    return flags


def cbr_rewrite_flags(ids: np.ndarray, sizes: np.ndarray,
                      window: int = 1024,
                      minimal_utility: float = 0.5,
                      rewrite_limit: float = 0.05) -> np.ndarray:
    """CBR context-based rewrite (cbr_rewrite.c): per decision chunk,
    utility = 1 − container coverage in the window; rewrite if utility
    clears both the static minimal utility and the adaptive threshold
    maintained by a 10000-bucket histogram targeting `rewrite_limit`."""
    n = len(ids)
    flags = np.zeros(n, dtype=bool)
    # container record state for the sliding window
    rec_size: dict[int, int] = {}
    rec_ooo: dict[int, bool] = {}
    buckets = np.zeros(10000, dtype=np.int64)
    chunk_num = 0
    min_index = 9999 if minimal_utility == 1 else int(minimal_utility * 10000)
    cur_threshold = minimal_utility

    def push(i: int) -> None:
        cid = int(ids[i])
        if cid != TEMPORARY_ID:
            if cid not in rec_size:
                rec_size[cid] = 0
                rec_ooo[cid] = True
            rec_size[cid] += int(sizes[i])

    def pop(i: int) -> None:
        cid = int(ids[i])
        if cid != TEMPORARY_ID:
            rec_size[cid] -= int(sizes[i])
            if rec_size[cid] == 0:
                del rec_size[cid]
                del rec_ooo[cid]

    def update_buckets(u: float) -> None:
        nonlocal chunk_num, cur_threshold
        chunk_num += 1
        idx = 9999 if u >= 1 else int(u * 10000)
        buckets[idx] += 1
        if chunk_num >= 100:
            best_num = chunk_num * rewrite_limit
            count = 0
            ci = 9999
            while ci >= min_index:
                count += buckets[ci]
                if count >= best_num:
                    break
                ci -= 1
            cur_threshold = (ci + 1) / 10000.0

    head = 0
    for i in range(n):
        push(i)
        if i - head + 1 < window:
            continue
        # buffer full: judge the head (decision chunk)
        d = head
        utility = 0.0
        cid = int(ids[d])
        if cid != TEMPORARY_ID:
            if rec_ooo[cid]:
                coverage = (rec_size[cid] + int(sizes[d])) / CONTAINER_PAYLOAD
                utility = 0.0 if coverage >= 1 else 1.0 - coverage
                if utility < minimal_utility or utility < cur_threshold:
                    rec_ooo[cid] = False
                else:
                    flags[d] = True
            else:
                utility = 0.0
        update_buckets(utility)
        pop(d)
        head += 1
    # remaining chunks pass through unjudged (cbr_rewrite.c:143-146)
    return flags


def cap_rewrite_flags(ids: np.ndarray, sizes: np.ndarray,
                      window: int = 1024, capping_level: int = 16) -> np.ndarray:
    """CAP capping (cap_rewrite.c): per disjoint window, rank containers
    by referenced bytes (desc; ties by insertion via stable container-id
    order) and mark duplicates of all but the top `capping_level`.

    Documented deviations from the C reference (benign for the emitted
    metrics, noted because this module advertises ports):
      * ties in the ranking resolve deterministically to the SMALLER
        container id (stable lexsort); the reference's g_sequence_sort
        makes no stability guarantee, so its tie order is unspecified;
      * the reference's end-of-stream drain (cap_rewrite.c final-buffer
        path) judges a short tail window that can also mark non-duplicate
        chunks OUT_OF_ORDER; here the tail window only ever flags
        duplicates, like every full window."""
    n = len(ids)
    flags = np.zeros(n, dtype=bool)
    for s in range(0, n, window):
        e = min(s + window, n)
        wid = ids[s:e]
        wsz = sizes[s:e]
        dup = wid != TEMPORARY_ID
        if not dup.any():
            continue
        uniq, inv = np.unique(wid[dup], return_inverse=True)
        tot = np.bincount(inv, weights=wsz[dup]).astype(np.int64)
        k = min(capping_level, len(uniq))
        # descending by size; the C g_sequence keeps ids ascending pre-sort,
        # and the sort is stable → ties resolve to smaller container id
        order = np.lexsort((uniq, -tot))
        top = set(uniq[order[:k]].tolist())
        mask = dup & ~np.isin(wid, list(top))
        flags[s:e][mask] = True
    return flags


def har_utilization(ids: np.ndarray, sizes: np.ndarray,
                    utilization_threshold: float = 0.5,
                    rewrite_limit: float = 0.05,
                    data_size: int | None = None):
    """HAR monitor + close (har_rewrite.c:61-168): per-container
    referenced bytes; containers under the utilization threshold are
    sparse. If sparse_size / total_monitored_size exceeds the rewrite
    limit, the LARGEST sparse containers are trimmed until it fits
    (close_har:139-150 pops from the end of the size-ascending seq).

    Returns ((container_ids, referenced_bytes, utilization, is_selected),
    sparse_ids). `data_size` is ignored (kept for API compat) — the C
    denominator is the sum of monitored container sizes."""
    dup = ids != TEMPORARY_ID
    if not dup.any():
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), np.empty(0, bool)), []
    uniq, inv = np.unique(ids[dup], return_inverse=True)
    tot = np.bincount(inv, weights=sizes[dup]).astype(np.int64)
    return har_select_sparse(uniq, tot, utilization_threshold, rewrite_limit)


def har_select_sparse(uniq: np.ndarray, tot: np.ndarray,
                      utilization_threshold: float = 0.5,
                      rewrite_limit: float = 0.05):
    """Sparse-container selection over an aggregated (container, bytes)
    table — the close_har core, reusable for the cross-run global pass."""
    uniq = np.asarray(uniq, dtype=np.int64)
    tot = np.asarray(tot, dtype=np.int64)
    util = tot / CONTAINER_PAYLOAD
    total_size = int(tot.sum())
    sel = util < utilization_threshold
    sparse_size = int(tot[sel].sum())
    if rewrite_limit < 1:
        # trim largest sparse first; deterministic tie-break on (size, cid)
        sparse_idx = np.flatnonzero(sel)
        order = sparse_idx[np.lexsort((uniq[sparse_idx], tot[sparse_idx]))]
        k = len(order)
        while k > 0 and total_size > 0 and sparse_size / total_size > rewrite_limit:
            j = order[k - 1]
            sel[j] = False
            sparse_size -= int(tot[j])
            k -= 1
    return (uniq, tot, util, sel), uniq[sel].tolist()


def har_check_flags(ids: np.ndarray, inherited_sparse: set[int]) -> np.ndarray:
    """Next-run marking (har_rewrite.c:170-180): duplicates whose container
    was sparse in the previous run get CHUNK_SPARSE (rewrite)."""
    return np.isin(ids, list(inherited_sparse)) if inherited_sparse else np.zeros(len(ids), bool)


def cfl_monitor(ids: np.ndarray, sizes: np.ndarray, cache_size: int = 30):
    """restore_aware CFL monitor (restore_aware.c:32-68): LRU of container
    ids; CFL = optimal containers / actual container fetches, capped at 1.
    Returns (cfl, ocf, ccf)."""
    cache: OrderedDict[int, None] = OrderedDict()
    total = 0
    ccf = 0
    for i in range(len(ids)):
        cid = int(ids[i])
        total += int(sizes[i]) + CONTAINER_META_ENTRY
        if cid in cache:
            cache.move_to_end(cid)
        else:
            cache[cid] = None
            if len(cache) > cache_size:
                cache.popitem(last=False)
            ccf += 1
    ocf = (total + CONTAINER_SIZE - 1) // CONTAINER_SIZE
    cfl = 1.0 if ccf == 0 else min(1.0, ocf / ccf)
    return cfl, ocf, ccf
