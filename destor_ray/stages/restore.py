"""Restore-side cost simulation — ports of the reference's three restore
caches (SURVEY.md §2.8), producing the read_container_num / speed-factor
metrics that destor logs per restore job (do_restore.c:255-283).

A "recipe stream" is the ordered (container_id, size) sequence of one
partition. All three simulators return the number of container reads:

  lru_restore_sim   do_restore.c:11-66 + utils/lru_cache.c
  opt_restore_sim   optimal_restore.c (windowed Belady: evict the cached
                    container whose next access is farthest in the
                    look-ahead window of the .records access sequence)
  asm_restore_sim   assembly_restore.c:13-116 (forward assembly area)

speed_factor = data_size / (1 MB × reads)   (do_restore.c:255-256)
"""

from __future__ import annotations

from collections import OrderedDict, deque

import numpy as np

CONTAINER_SIZE = 4 << 20


def lru_restore_sim(ids: np.ndarray, cache_size: int = 30) -> int:
    """Container reads under an LRU cache of `cache_size` containers."""
    cache: OrderedDict[int, None] = OrderedDict()
    reads = 0
    for cid in ids:
        cid = int(cid)
        if cid in cache:
            cache.move_to_end(cid)
        else:
            reads += 1
            cache[cid] = None
            if len(cache) > cache_size:
                cache.popitem(last=False)
    return reads


def opt_restore_sim(ids: np.ndarray, cache_size: int = 30,
                    window: int = 1024) -> int:
    """Windowed Belady (optimal_restore.c): the access sequence is the
    run-length-collapsed container order (the .records file,
    recipestore.c); on a miss with a full cache, evict the cached
    container whose next access is farthest (unknown within the
    look-ahead window ⇒ +inf, matching records with empty seqno queues
    sorting last)."""
    # collapse consecutive duplicates → access sequence
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) == 0:
        return 0
    keep = np.empty(len(ids), dtype=bool)
    keep[0] = True
    keep[1:] = ids[1:] != ids[:-1]
    acc = ids[keep]
    n = len(acc)
    # next-occurrence linked list within the whole sequence; the window
    # bound is applied at eviction time
    next_use = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    last_pos: dict[int, int] = {}
    for i in range(n - 1, -1, -1):
        cid = int(acc[i])
        next_use[i] = last_pos.get(cid, np.iinfo(np.int64).max)
        last_pos[cid] = i
    cache: dict[int, int] = {}  # cid → next access position (or +inf)
    reads = 0
    for i in range(n):
        cid = int(acc[i])
        nxt = int(next_use[i])
        horizon = i + window
        nxt_eff = nxt if nxt <= horizon else np.iinfo(np.int64).max
        if cid in cache:
            cache[cid] = nxt_eff
            continue
        reads += 1
        if len(cache) >= cache_size:
            victim = max(cache.items(), key=lambda kv: (kv[1], kv[0]))[0]
            del cache[victim]
        cache[cid] = nxt_eff
    return reads


def asm_restore_sim(ids: np.ndarray, sizes: np.ndarray,
                    cache_size: int = 30) -> int:
    """Forward assembly (assembly_restore.c): fill an
    (cache_size-1)×CONTAINER_SIZE area with recipe chunks; each assembly
    pass reads the first unready chunk's container once and marks every
    area chunk of that container ready; the ready prefix drains."""
    area_size = (cache_size - 1) * CONTAINER_SIZE
    items: deque[list] = deque()  # [cid, size, ready]
    area_bytes = 0
    reads = 0

    def assemble_once() -> None:
        nonlocal area_bytes, reads
        # find first unready
        while items and items[0][2]:
            area_bytes -= items[0][1]
            items.popleft()
        if not items:
            return
        cid = items[0][0]
        reads += 1
        for it in items:
            if it[0] == cid:
                it[2] = True
        while items and items[0][2]:
            area_bytes -= items[0][1]
            items.popleft()

    for cid, sz in zip(ids, sizes):
        items.append([int(cid), int(sz), False])
        area_bytes += int(sz)
        if area_bytes >= area_size:
            assemble_once()
    while items:
        assemble_once()
    return reads


def speed_factor(data_size: int, reads: int) -> float:
    """do_restore.c:255-256: data amount restored per container read."""
    if reads == 0:
        return float("inf")
    return data_size / (1024.0 * 1024.0 * reads)
