"""T5 decode-verify: every corpus row decodes to >=40 dB PSNR vs its
generated pixels with caption equality; a corrupted payload is caught."""

import numpy as np
import pyarrow as pa
import pytest

from destor_ray import corpus


@pytest.fixture(scope="module")
def corpus_dir(ray_session):
    return corpus.ensure_corpus_parquet(200, seed=42)


def test_fidelity_all_rows_pass(ray_session, corpus_dir):
    import ray.data
    from destor_ray.stages.fidelity import verify_fidelity
    out = verify_fidelity(ray.data.read_parquet(corpus_dir), seed=42,
                          concurrency=2).to_pandas()
    assert len(out) == 200
    bad = out[~out.fidelity_ok]
    assert bad.empty, bad.head()


def test_fidelity_catches_corruption(ray_session):
    from destor_ray.stages.fidelity import FidelityVerifier
    row = corpus.generate_row(42, 0)
    v = FidelityVerifier(seed=42)
    good = v(pa.table({"image_id": [row["image_id"]], "bytes": [row["bytes"]],
                       "caption": [row["caption"]]}))
    assert good["fidelity_ok"].to_pylist() == [True]
    # wrong caption
    bad = v(pa.table({"image_id": [row["image_id"]], "bytes": [row["bytes"]],
                      "caption": ["tampered"]}))
    assert bad["fidelity_ok"].to_pylist() == [False]
    # payload swapped with another row's
    other = corpus.generate_row(42, 20)["bytes"]
    bad2 = v(pa.table({"image_id": [row["image_id"]], "bytes": [other],
                       "caption": [row["caption"]]}))
    assert bad2["fidelity_ok"].to_pylist() == [False]
