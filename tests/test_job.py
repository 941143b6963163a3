"""End-to-end checkpointed job: run → metrics sane; re-run → every stage
resumes from lineage without recompute; config change → recompute."""

import json
import os
import shutil

import pytest

from destor_ray import corpus
from destor_ray.config import EngineConfig, LSHConfig

N = 400
WORKDIR = "/tmp/destor_ray_test_job"


@pytest.fixture(scope="module")
def job_result(ray_session):
    from destor_ray.pipelines.job import run_backup_job
    cdir = corpus.ensure_corpus_parquet(N, seed=42)
    if os.path.exists(WORKDIR):
        shutil.rmtree(WORKDIR)
    res = run_backup_job(cdir, WORKDIR)
    return cdir, res


def test_job_metrics_shape(job_result):
    _, res = job_result
    m = res["metrics"]
    assert m["n_rows"] == N
    # planted dups: exact + caption_para are byte-identical; reencode/
    # resize/crop near-dups also cluster → dup_rows = 5 slots per
    # 20-row block
    assert m["dup_rows"] == sum(
        1 for i in range(N) if corpus.plan_for_row(i)[0]
        in ("exact", "reencode", "resize", "crop", "caption_para"))
    assert 0 < m["dedup_ratio"] < 1
    assert m["restore"]["lru"]["read_container_num"] >= 1
    assert m["restore"]["opt"]["read_container_num"] <= m["restore"]["lru"]["read_container_num"]


def test_job_resumes_without_recompute(job_result):
    cdir, _ = job_result
    from destor_ray.pipelines.job import run_backup_job

    def snapshot():
        out = {}
        for stage in ["signatures", "edges", "clusters", "manifest"]:
            d = os.path.join(WORKDIR, stage)
            out[stage] = sorted((f, os.stat(os.path.join(d, f)).st_mtime_ns)
                                for f in os.listdir(d))
        return out

    before = snapshot()
    res2 = run_backup_job(cdir, WORKDIR)
    assert all(res2["resumed"].values()), res2["resumed"]
    assert snapshot() == before  # zero files rewritten


def test_config_change_invalidates(job_result):
    cdir, _ = job_result
    from destor_ray.pipelines.job import run_backup_job
    cfg = EngineConfig(lsh=LSHConfig(num_bands=16))
    res3 = run_backup_job(cdir, WORKDIR, cfg)
    assert not res3["resumed"]["signatures"] or not res3["resumed"]["edges"]


def test_lineage_files_written(job_result):
    _, res = job_result
    for stage in ["signatures", "edges", "clusters", "manifest"]:
        lin_path = os.path.join(WORKDIR, stage, "_lineage.json")
        # config_change test may have rewritten with a different hash; the
        # file must exist and parse either way
        with open(lin_path) as f:
            lin = json.load(f)
        assert lin["stage"] == stage


def test_har_cross_run_state(ray_session, job_result):
    """Second job inherits the first job's sparse container list."""
    cdir, _ = job_result
    import shutil
    from destor_ray.pipelines.job import run_backup_job
    wd = "/tmp/destor_ray_test_job_har"
    if os.path.exists(wd):
        shutil.rmtree(wd)
    r1 = run_backup_job(cdir, wd, job_id=0)
    assert "har" in r1["metrics"]
    assert r1["metrics"]["har"]["total_container_num"] >= 1
    assert os.path.exists(os.path.join(wd, "har", "bv0.sparse.json"))
    # same corpus again as job 1 (forced recompute) → inherits job 0's list
    r2 = run_backup_job(cdir, wd, job_id=1, force=True)
    h2 = r2["metrics"]["har"]
    if r1["metrics"]["har"]["sparse_container_num"] > 0:
        assert h2["sparse_chunk_hits"] >= 0
        assert h2["inherited_sparse_num"] >= 0
    assert os.path.exists(os.path.join(wd, "har", "bv1.sparse.json"))


def test_partial_job_resume(ray_session, job_result):
    """Simulated mid-job kill: later stages' lineage missing → only they
    recompute; the signatures stage is reused untouched."""
    cdir, _ = job_result
    import shutil
    from destor_ray.pipelines.job import run_backup_job
    wd = "/tmp/destor_ray_test_job_partial"
    if os.path.exists(wd):
        shutil.rmtree(wd)
    run_backup_job(cdir, wd)
    # "kill" after signatures: drop everything downstream
    for stage in ["edges", "clusters", "manifest", "metrics"]:
        shutil.rmtree(os.path.join(wd, stage))
    os.remove(os.path.join(wd, "metrics.json"))
    sig_dir = os.path.join(wd, "signatures")
    before = sorted((f, os.stat(os.path.join(sig_dir, f)).st_mtime_ns)
                    for f in os.listdir(sig_dir))
    res = run_backup_job(cdir, wd)
    after = sorted((f, os.stat(os.path.join(sig_dir, f)).st_mtime_ns)
                   for f in os.listdir(sig_dir))
    assert res["resumed"]["signatures"] is True
    assert res["resumed"]["edges"] is False
    assert before == after
    assert res["metrics"]["n_rows"] == 400


def test_restore_corpus_fidelity(ray_session, tmp_path):
    """Real restore path: every row reconstructs from its cluster
    representative; exact-dup members restore BIT-identically (their rep
    has identical bytes); near-dup members restore within the PSNR
    consolidation bound; no row is lost."""
    import numpy as np
    from destor_ray import corpus
    from destor_ray.pipelines.job import (restore_corpus,
                                          restore_fidelity_stats,
                                          run_backup_job)
    N = 200
    cdir = corpus.ensure_corpus_parquet(N, seed=42)
    wd = str(tmp_path / "job")
    run_backup_job(cdir, wd)
    out = restore_fidelity_stats(restore_corpus(cdir, wd), seed=42).to_pandas()
    assert len(out) == N
    assert out.image_id.is_unique
    assert out.ok.all(), out[~out.ok].head()
    psnr = dict(zip(out.image_id, out.psnr))
    for i in range(N):
        kind, src = corpus.plan_for_row(i)
        me = psnr[f"img{i:010d}"]
        if kind in ("exact", "caption_para"):
            # byte-identical members restore to EXACTLY the representative
            # payload, so their fidelity equals the representative row's
            # own (bounded only by the rep's encode loss; inf for PNG)
            assert me == psnr[f"img{src:010d}"], (i, kind, me)
        if kind in ("original", "distractor_near_miss"):
            # self-representative: restored bytes are the row's own, so
            # PSNR vs source = pure encode loss: inf (PNG) or >= 40
            # (lossy at generator quality >= 80)
            assert me >= 40.0, (i, kind, me)


def test_incremental_job_matches_full(ray_session):
    """Second-backup topology: base job on rows [0, K), incremental job
    on rows [K, N) against the base's persisted signature index —
    combined assignment equals a from-scratch job over all N rows, base
    ids preserved, and a re-run resumes every stage."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data
    from destor_ray.pipelines.dedup import dedup_pipeline_from_dir
    from destor_ray.pipelines.job import run_backup_job, run_incremental_job

    N_ALL, K = 1000, 610  # split mid-block: block 30's dups land in the
    # delta while their source row 600 is in the base
    full_dir = corpus.ensure_corpus_parquet(N_ALL, seed=42)
    t = pq.ParquetDataset(full_dir).read()
    nid = np.array([int(s[3:]) for s in t["image_id"].to_pylist()])
    root = "/tmp/destor_ray_test_incr"
    if os.path.exists(root):
        shutil.rmtree(root)
    base_dir = os.path.join(root, "base_corpus")
    delta_dir = os.path.join(root, "delta_corpus")
    os.makedirs(base_dir)
    os.makedirs(delta_dir)
    order = np.argsort(nid)
    t = t.take(order)
    pq.write_table(t.slice(0, K), os.path.join(base_dir, "part.parquet"))
    pq.write_table(t.slice(K), os.path.join(delta_dir, "part.parquet"))

    run_backup_job(base_dir, os.path.join(root, "base_wd"))
    inc = run_incremental_job(delta_dir, os.path.join(root, "inc_wd"),
                              os.path.join(root, "base_wd"))
    m = inc["metrics"]
    assert m["n_delta"] == N_ALL - K
    assert m["joined_existing"] >= 3  # 611/615/619 → source 600 in base

    combined = inc["assignment"].to_pandas()
    assert len(combined) == N_ALL
    full = dedup_pipeline_from_dir(full_dir).to_pandas()
    want = dict(zip(full.image_id, full.cluster_id))
    got = dict(zip(combined.image_id, combined.cluster_id))
    assert got == want

    # base assignments preserved verbatim (no merges in the planted plan)
    base_assign = ray.data.read_parquet(
        os.path.join(root, "base_wd", "clusters")).to_pandas()
    for iid, cid in zip(base_assign.image_id, base_assign.cluster_id):
        assert got[iid] == cid
    assert m["base_cluster_merges"] == 0

    # resume: second invocation recomputes nothing
    inc2 = run_incremental_job(delta_dir, os.path.join(root, "inc_wd"),
                               os.path.join(root, "base_wd"))
    assert all(inc2["resumed"].values()), inc2["resumed"]


def test_incremental_bloom_prefilter_identical_edges(ray_session):
    """The Bloom semi-join pre-filter (base >> delta configuration)
    drops most base band rows before the exchange yet produces the
    IDENTICAL verified edge set (no false negatives by construction)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages import candidates

    n, k = 400, 210
    full_dir = corpus.ensure_corpus_parquet(n, seed=42)
    t = pq.ParquetDataset(full_dir).read()
    nid = np.array([int(s[3:]) for s in t["image_id"].to_pylist()])
    t = t.take(np.argsort(nid))
    root = "/tmp/destor_ray_test_incr_bloom"
    if os.path.exists(root):
        shutil.rmtree(root)
    for name, tbl in (("b", t.slice(0, k)), ("d", t.slice(k))):
        os.makedirs(os.path.join(root, name))
        pq.write_table(tbl, os.path.join(root, name, "p.parquet"))
    cfg = EngineConfig()
    base = signatures_from_corpus(
        ray.data.read_parquet(os.path.join(root, "b")), cfg).materialize()
    delta = signatures_from_corpus(
        ray.data.read_parquet(os.path.join(root, "d")), cfg).materialize()

    def pairs(ds):
        df = ds.to_pandas()
        return set(zip(df.left_id, df.right_id))

    plain = pairs(candidates.candidate_edges_incremental(base, delta, cfg))
    bloomed = pairs(candidates.candidate_edges_incremental(
        base, delta, cfg, bloom_prefilter=True))
    assert plain == bloomed
    assert len(plain) > 0
    # the filter must actually prune: count surviving base band rows
    from destor_ray.stages.candidates import delta_band_bloom, explode_bands
    bf = delta_band_bloom(delta, cfg)
    import pyarrow as pa
    kept = tot = 0
    for b in base.map_batches(
            lambda x: explode_bands(x, cfg),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        keys = b["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)
        kept += int(bf.contains(keys).sum())
        tot += len(keys)
    assert kept < tot * 0.5, (kept, tot)
