"""Property tests (SURVEY.md §5.2): cluster assignment is invariant to
input row order and to the shuffle-bucket salt; retries reproduce
identical signatures (hash-derived determinism)."""

import numpy as np
import pytest

from destor_ray import corpus

N = 200


@pytest.fixture(scope="module")
def base_assignment(ray_session):
    from destor_ray.pipelines.dedup import dedup_pipeline_from_dir
    d = corpus.ensure_corpus_parquet(N, seed=42)
    df = dedup_pipeline_from_dir(d).to_pandas()
    return dict(zip(df.image_id, df.cluster_id))


def test_permutation_invariance(ray_session, base_assignment):
    import ray.data
    from destor_ray.pipelines.dedup import dedup_pipeline
    d = corpus.ensure_corpus_parquet(N, seed=42)
    ds = ray.data.read_parquet(d).random_shuffle(seed=7)
    df = dedup_pipeline(ds).to_pandas()
    assert dict(zip(df.image_id, df.cluster_id)) == base_assignment


def test_salt_invariance(ray_session, base_assignment):
    import ray.data
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages import candidates, cluster
    from destor_ray.stages.grouped import bucketed_group_map
    d = corpus.ensure_corpus_parquet(N, seed=42)
    cfg = EngineConfig()
    sigs = signatures_from_corpus(ray.data.read_parquet(d), cfg).materialize()
    bands = sigs.map_batches(lambda b: candidates.explode_bands(b, cfg),
                             batch_format="pyarrow")
    # different bucket salt + different bucket count → same verified edges
    e1 = bucketed_group_map(bands, "band_key",
                            lambda df: candidates.verify_bucket(df, cfg),
                            num_buckets=64, salt=0x6B).to_pandas()
    e2 = bucketed_group_map(bands, "band_key",
                            lambda df: candidates.verify_bucket(df, cfg),
                            num_buckets=17, salt=0x1234).to_pandas()
    k1 = set(zip(e1.left_id, e1.right_id))
    k2 = set(zip(e2.left_id, e2.right_id))
    assert k1 == k2


def test_signature_retry_determinism():
    from destor_ray.stages.signature import compute_signatures
    tbl = corpus.generate_batch(42, np.arange(50))
    a = compute_signatures(tbl)
    b = compute_signatures(tbl)
    assert a.equals(b)


def test_task_retry_reexecution_determinism(ray_session, tmp_path):
    """North-rule resilience bullet (SURVEY §4.1 stragglers/retries):
    kill the FIRST attempt of every signature task and assert Ray's
    lineage re-execution reproduces the clean run bit-for-bit — the
    property that makes retries free is that every stage is a pure
    hash-derived function of its input (no RNG, no wall clock)."""
    import os

    import pyarrow as pa
    import ray.data

    from destor_ray.config import EngineConfig
    from destor_ray.stages.signature import compute_signatures

    d = corpus.ensure_corpus_parquet(200, seed=42)
    cfg = EngineConfig()
    marker_dir = str(tmp_path / "chaos")
    os.makedirs(marker_dir, exist_ok=True)

    def flaky_sigs(batch: pa.Table) -> pa.Table:
        key = batch["image_id"].to_pylist()[0]
        m = os.path.join(marker_dir, key)
        if not os.path.exists(m):
            open(m, "w").close()
            raise RuntimeError(f"injected failure at {key}")
        return compute_signatures(batch, cfg)

    chaotic = ray.data.read_parquet(d).map_batches(
        flaky_sigs, batch_format="pyarrow", batch_size=64,
        retry_exceptions=True, max_retries=4
    ).to_pandas().sort_values("image_id").reset_index(drop=True)
    assert len(os.listdir(marker_dir)) > 0  # failures really happened

    clean = ray.data.read_parquet(d).map_batches(
        lambda b: compute_signatures(b, cfg), batch_format="pyarrow",
        batch_size=64).to_pandas().sort_values("image_id") \
        .reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(chaotic, clean)
