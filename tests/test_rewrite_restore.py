"""Hand-computed conformance cases for the rewrite/restore stream
kernels (ports of cfl/cbr/cap/har_rewrite.c, restore_aware.c,
do_restore.c, optimal_restore.c, assembly_restore.c)."""

import numpy as np

from destor_ray.stages import restore, rewrite

T = rewrite.TEMPORARY_ID
PAYLOAD = rewrite.CONTAINER_PAYLOAD


def test_cfl_marks_small_runs():
    # run of container 1 smaller than threshold*payload → both dups marked
    ids = np.array([1, 1, 2, 2], dtype=np.int64)
    sizes = np.array([100, 100, PAYLOAD // 2, PAYLOAD // 2], dtype=np.int64)
    flags = rewrite.cfl_rewrite_flags(ids, sizes, usage_threshold=0.03)
    assert list(flags) == [True, True, False, False]


def test_cfl_unique_does_not_break_run():
    # TEMPORARY chunks join the current run (last_id semantics,
    # cfl_rewrite.c:40: boundary only when last_id != TEMP and changes)
    ids = np.array([1, T, 1, 2], dtype=np.int64)
    sizes = np.full(4, PAYLOAD, dtype=np.int64)
    flags = rewrite.cfl_rewrite_flags(ids, sizes, usage_threshold=0.5)
    # first run [1,T,1] has 3*PAYLOAD bytes -> not sparse
    assert not flags[:3].any()


def test_cap_top_k():
    # window of 6: container 1 has 300 bytes, container 2 has 100 →
    # capping_level=1 keeps container 1, marks dups of container 2
    ids = np.array([1, 2, 1, T, 2, 1], dtype=np.int64)
    sizes = np.array([100, 50, 100, 10, 50, 100], dtype=np.int64)
    flags = rewrite.cap_rewrite_flags(ids, sizes, window=6, capping_level=1)
    assert list(flags) == [False, True, False, False, True, False]


def test_cap_windows_are_disjoint():
    ids = np.array([1, 1, 2, 2], dtype=np.int64)
    sizes = np.array([10, 10, 1000, 1000], dtype=np.int64)
    flags = rewrite.cap_rewrite_flags(ids, sizes, window=2, capping_level=1)
    # each window has one container → always in top-1 → no rewrites
    assert not flags.any()


def test_cbr_low_coverage_rewrites():
    # duplicates of a container covering almost nothing of the payload →
    # utility ≈ 1 → above every threshold → rewritten
    n = 200
    ids = np.array([i % 50 + 1 for i in range(n)], dtype=np.int64)
    sizes = np.full(n, 10, dtype=np.int64)
    flags = rewrite.cbr_rewrite_flags(ids, sizes, window=100,
                                      minimal_utility=0.5, rewrite_limit=1.0)
    # with limit=1.0 every judged dup qualifies
    assert flags[:100].all()


def test_cbr_full_coverage_no_rewrite():
    # one container covering the whole payload → utility 0 → no rewrite
    ids = np.array([1] * 64, dtype=np.int64)
    sizes = np.full(64, PAYLOAD // 32, dtype=np.int64)
    flags = rewrite.cbr_rewrite_flags(ids, sizes, window=32)
    assert not flags.any()


def test_har_utilization_sparse():
    ids = np.array([1, 2, 2], dtype=np.int64)
    sizes = np.array([100, PAYLOAD // 2, PAYLOAD // 2], dtype=np.int64)
    (uniq, tot, util, sel), sparse = rewrite.har_utilization(
        ids, sizes, utilization_threshold=0.5, rewrite_limit=1.0)
    assert list(uniq) == [1, 2]
    assert sparse == [1]          # container 1 is sparse, 2 is full


def test_cfl_monitor():
    ids = np.array([1, 1, 2, 1], dtype=np.int64)
    sizes = np.full(4, 1000, dtype=np.int64)
    cfl, ocf, ccf = rewrite.cfl_monitor(ids, sizes, cache_size=10)
    assert ccf == 2               # containers 1 and 2 fetched once each
    assert ocf == 1
    assert cfl == 0.5


def test_lru_restore():
    ids = np.array([1, 2, 1, 3, 1], dtype=np.int64)
    assert restore.lru_restore_sim(ids, cache_size=10) == 3
    # cache of 1: every switch is a read
    assert restore.lru_restore_sim(ids, cache_size=1) == 5


def test_opt_beats_lru():
    # access pattern where Belady wins: A B C A B C ... with cache 2
    ids = np.array([1, 2, 3] * 10, dtype=np.int64)
    lru = restore.lru_restore_sim(ids, cache_size=2)
    opt = restore.opt_restore_sim(ids, cache_size=2, window=100)
    assert opt <= lru


def test_opt_exact_small_case():
    # classic: 1 2 3 1 2, cache 2 → Belady: read 1,2,3(evict 2? next uses:
    # 1@3, 2@4 → evict the farther=2? no: farthest next use is 2@4 vs 1@3 →
    # evict 2), read 1 hit, 2 miss → 4 reads... verify algorithmically vs
    # brute expectations
    ids = np.array([1, 2, 3, 1, 2], dtype=np.int64)
    assert restore.opt_restore_sim(ids, cache_size=2, window=10) == 4
    assert restore.lru_restore_sim(ids, cache_size=2) == 5


def test_asm_reads_each_container_once_per_area():
    # area big enough for everything → one read per distinct container
    ids = np.array([1, 2, 1, 2, 3], dtype=np.int64)
    sizes = np.full(5, 100, dtype=np.int64)
    assert restore.asm_restore_sim(ids, sizes, cache_size=30) == 3


def test_asm_small_area_rereads():
    # area of one container size → interleaved pattern forces re-reads
    ids = np.array([1, 2] * 8, dtype=np.int64)
    big = rewrite.CONTAINER_SIZE // 2
    sizes = np.full(16, big, dtype=np.int64)
    reads = restore.asm_restore_sim(ids, sizes, cache_size=2)
    assert reads > 3


def test_speed_factor():
    assert restore.speed_factor(10 * 1024 * 1024, 5) == 2.0
