"""GC pass (X1-X3) and config presets (D7)."""

import numpy as np
import pyarrow as pa
import pytest

from destor_ray.config import PRESETS, EngineConfig


def test_presets_exist_and_hash_distinctly():
    assert set(PRESETS) == {"default", "ddfs", "extreme_binning", "champion",
                            "sparse_index", "silo", "substring",
                            "rendezvous"}
    hashes = {name: cfg.config_hash() for name, cfg in PRESETS.items()}
    assert len(set(hashes.values())) == len(hashes)


def test_preset_sampling_methods():
    assert PRESETS["ddfs"].sampling.method == "uniform"
    assert PRESETS["ddfs"].sampling.ratio == 1        # index.c:103-109
    assert PRESETS["sparse_index"].sampling.method == "random"
    assert PRESETS["silo"].sampling.method == "min"


@pytest.fixture(scope="module")
def manifest_ds(ray_session):
    import ray.data
    # synthetic manifest: 3 containers; container 2 only referenced by job 0
    tbl = pa.table({
        "container_id": pa.array([0, 0, 1, 2, 1, 0], pa.int64()),
        "nbytes": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
        "job_id": pa.array([1, 1, 1, 0, 0, 1], pa.int64()),
    })
    return ray.data.from_arrow(tbl)


def test_container_refcounts(ray_session, manifest_ds):
    from destor_ray.stages.gc import container_refcounts
    df = container_refcounts(manifest_ds).to_pandas().set_index("container_id")
    assert df.loc[0, "refs"] == 3
    assert df.loc[0, "ref_bytes"] == 90
    assert df.loc[2, "last_job"] == 0


def test_gc_invalid_and_purge(ray_session, manifest_ds):
    import ray.data
    from destor_ray.stages.gc import (container_refcounts, invalid_containers,
                                      purge_registry)
    rc = container_refcounts(manifest_ds)
    invalid = invalid_containers(rc, delete_job_id=0).to_pandas()
    assert list(invalid.container_id) == [2]   # only container 2's last ref is job 0
    purged = purge_registry(manifest_ds, invalid.container_id.tolist()).to_pandas()
    assert 2 not in set(purged.container_id)
    assert len(purged) == 5


def test_pipeline_recall_under_presets(ray_session):
    """Flagship recall holds under the sampling-method presets (the CDC
    channel changes; phash/caption/sha1 channels keep recall)."""
    import ray.data
    from destor_ray import corpus
    from destor_ray.pipelines.dedup import dedup_pipeline
    d = corpus.ensure_corpus_parquet(200, seed=42)
    for preset in ["sparse_index", "silo", "substring"]:
        out = dedup_pipeline(ray.data.read_parquet(d), PRESETS[preset]).to_pandas()
        pred = dict(zip(out.image_id, out.cluster_id))
        truth = {f"img{i:010d}": f"img{corpus.truth_cluster(i):010d}" for i in range(200)}
        assert pred == truth, preset


def test_champion_preset_recall(ray_session):
    """Champion top-k preset (destor-parity candidate counts): flagship
    recall stays >= 0.99 with per-row verification bounded to k champions
    per bucket, and no distractor merges."""
    import ray.data
    from destor_ray import corpus
    from destor_ray.config import PRESETS
    from destor_ray.pipelines.dedup import dedup_pipeline
    N = 400
    d = corpus.ensure_corpus_parquet(N, seed=42)
    out = dedup_pipeline(ray.data.read_parquet(d), PRESETS["champion"],
                         n_rows_hint=N).to_pandas()
    pred = dict(zip(out.image_id, out.cluster_id))
    hits = total = joined = 0
    for i in range(N):
        kind, src = corpus.plan_for_row(i)
        if kind == "original":
            continue
        same = pred[f"img{i:010d}"] == pred[f"img{src:010d}"]
        if kind == "distractor_near_miss":
            joined += int(same)
        else:
            total += 1
            hits += int(same)
    assert joined == 0
    assert hits / total >= 0.99, hits / total
