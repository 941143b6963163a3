"""Hot-band salting: with max_band_group forced tiny, every band group
is 'hot', gets split into sub-keys, and the linker level restores
connectivity — the final clusters must still match ground truth."""

import dataclasses

import pytest

from destor_ray import corpus
from destor_ray.config import EngineConfig, LSHConfig

N = 200


def test_salted_edges_preserve_clusters(ray_session):
    import ray.data
    from destor_ray.pipelines.dedup import (_assign_clusters_driver,
                                            signatures_from_corpus)
    from destor_ray.stages import candidates

    d = corpus.ensure_corpus_parquet(N, seed=42)
    # force everything hot: any group > 4 members gets salted
    cfg = EngineConfig(lsh=LSHConfig(max_band_group=4))
    ds = ray.data.read_parquet(d)
    sigs = signatures_from_corpus(ds, cfg).materialize()
    edges = candidates.candidate_edges(sigs, cfg, salt_hot_bands=True)
    ids = sigs.select_columns(["image_id"])
    out = _assign_clusters_driver(ids, edges.materialize()).to_pandas()
    pred = dict(zip(out.image_id, out.cluster_id))
    truth = {f"img{i:010d}": f"img{corpus.truth_cluster(i):010d}" for i in range(N)}
    assert pred == truth


def test_salting_noop_when_no_hot_bands(ray_session):
    import ray.data
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages import candidates

    d = corpus.ensure_corpus_parquet(N, seed=42)
    cfg = EngineConfig()  # default max_band_group=256 → nothing hot at N=200
    ds = ray.data.read_parquet(d)
    sigs = signatures_from_corpus(ds, cfg).materialize()
    plain = candidates.candidate_edges(sigs, cfg).to_pandas()
    salted = candidates.candidate_edges(sigs, cfg, salt_hot_bands=True).to_pandas()
    assert set(zip(plain.left_id, plain.right_id)) == \
        set(zip(salted.left_id, salted.right_id))


def test_joinverify_matches_thumb_carrying(ray_session):
    import ray.data
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages import candidates
    d = corpus.ensure_corpus_parquet(N, seed=42)
    sigs = signatures_from_corpus(ray.data.read_parquet(d)).materialize()
    a = candidates.candidate_edges(sigs).to_pandas()
    b = candidates.candidate_edges_joinverify(sigs, join_partitions=4).to_pandas()
    assert set(zip(a.left_id, a.right_id)) == set(zip(b.left_id, b.right_id))
