import numpy as np
import pyarrow as pa
import pytest

from destor_ray.stages import multimodal as mm


def _audio_batch(n=4):
    return pa.table({
        "clip_id": [f"c{i}" for i in range(n)],
        "bytes": [bytes([i]) * 100 for i in range(n)],
        "sample_rate": pa.array([16000] * n, pa.int32()),
    })


def _video_batch(n=3):
    return pa.table({
        "video_id": [f"v{i}" for i in range(n)],
        "bytes": [bytes([i]) * 50 for i in range(n)],
        "n_frames": pa.array([30, 1, 10], pa.int32()),
    })


def test_audio_fake_decoder_deterministic():
    st = mm.AudioFeatures(decoder="fake")
    a = st(_audio_batch())
    b = st(_audio_batch())
    assert a.equals(b)
    assert a.column_names == ["clip_id", "n_samples", "rms", "mfcc_like"]
    assert all(len(f) == 13 for f in a["mfcc_like"].to_pylist())


def test_audio_real_decoder_is_explicit_stub():
    st = mm.AudioFeatures(decoder="real")
    with pytest.raises(NotImplementedError):
        st(_audio_batch())


def test_video_frame_sampling_layout():
    st = mm.VideoFrameSample(decoder="fake", samples_per_video=3)
    out = st(_video_batch())
    # 3 frames for 30-frame video, 1 for single-frame, 3 for 10-frame
    assert out.num_rows == 3 + 1 + 3
    assert all(len(t) == 16 * 16 for t in out["frame_thumb"].to_pylist())
    idx = out.filter(pa.compute.equal(out["video_id"], "v0"))["frame_idx"].to_pylist()
    assert idx == [0, 10, 20]


def test_video_real_decoder_is_explicit_stub():
    st = mm.VideoFrameSample(decoder="real")
    with pytest.raises(NotImplementedError):
        st(_video_batch())


def test_image_decode_resize_real(ray_session):
    import ray.data
    from destor_ray import corpus
    d = corpus.ensure_corpus_parquet(40, seed=42)
    out = ray.data.read_parquet(d).map_batches(
        mm.ImageDecodeResize, batch_format="pyarrow", batch_size=16,
        concurrency=2).to_pandas()
    assert len(out) == 40
    assert all(len(t) == 32 * 32 for t in out.thumb)


def test_audio_stage_in_ray(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_audio_batch(32))
    out = mm.audio_features(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 32
