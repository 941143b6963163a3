import numpy as np
import pytest

from destor_ray import codec


def _img(seed=0, h=64, w=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_lossless_roundtrip():
    img = _img(1)
    data = codec.encode(img, "png")
    out = codec.decode(data)
    assert np.array_equal(img, out)
    assert codec.psnr(img, out) == float("inf")


@pytest.mark.parametrize("q", [70, 85, 92, 95])
def test_lossy_psnr_at_least_40(q):
    img = _img(2)
    out = codec.decode(codec.encode(img, "jpeg", q))
    assert codec.psnr(img, out) >= 40.0


def test_decode_meta():
    img = _img(3, 32, 32)
    data = codec.encode(img, "jpeg", 85)
    fmt, q, w, h = codec.decode_meta(data)
    assert (fmt, q, w, h) == ("jpeg", 85, 32, 32)


def test_reencode_changes_bytes_not_pixels_much():
    img = _img(4)
    a = codec.encode(img, "jpeg", 85)
    b = codec.encode(img, "jpeg", 95)
    assert a != b
    assert codec.psnr(codec.decode(a), codec.decode(b)) >= 35.0


def test_phash_batch_matches_single():
    imgs = [_img(i, 64, 64) for i in range(5)]
    singles = [codec.phash64(im) for im in imgs]
    grays = np.stack([codec.to_gray(codec.resize_nn(im, 32, 32)) for im in imgs])
    batch = codec.phash64_batch(grays)
    assert list(batch) == [int(s) for s in singles]


def test_phash_robust_to_reencode_sensitive_to_content():
    img = _img(5)
    re_enc = codec.decode(codec.encode(img, "jpeg", 80))
    d_same = int(codec.hamming64(np.int64(codec.phash64(img)), np.int64(codec.phash64(re_enc))))
    other = _img(6)
    d_diff = int(codec.hamming64(np.int64(codec.phash64(img)), np.int64(codec.phash64(other))))
    assert d_same <= 8
    assert d_diff > 12


def test_hamming64_vectorized():
    a = np.array([0, -1, 5], dtype=np.int64)
    b = np.array([0, 0, 4], dtype=np.int64)
    assert list(codec.hamming64(a, b)) == [0, 64, 1]


def test_thumbnail_and_thumb_psnr():
    img = _img(7)
    t = codec.thumbnail(img)
    assert len(t) == 256
    assert codec.thumb_psnr(t, t) == float("inf")
