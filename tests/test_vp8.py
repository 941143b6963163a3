"""VP8 key-frame codec (destor_ray/vp8.py, RFC 6386) ground truth:
bool-coder fuzz round-trip, integer transform consistency, full
encode->decode PSNR across dimensions and quantizers, bitstream
determinism, the inter-frame seam, and a hand-built B_PRED stream
exercising the 4x4 decode path our encoder never emits."""

import numpy as np
import pytest

from destor_ray import vp8
from destor_ray import vp8_tables as T

RNG = np.random.default_rng(0xD5)


def _smooth(h, w, phase=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), np.uint8)
    for c in range(3):
        img[..., c] = np.clip(
            127 + 60 * np.sin(xx / 13 + c + phase)
            + 50 * np.cos(yy / 9 - c), 0, 255)
    return img


def _psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)


def test_bool_coder_fuzz_roundtrip():
    for trial in range(25):
        n = int(RNG.integers(1, 3000))
        bits = RNG.integers(0, 2, n)
        probs = RNG.integers(1, 255, n)
        be = vp8.BoolEncoder()
        for b, p in zip(bits, probs):
            be.bit(int(b), int(p))
        bd = vp8.BoolDecoder(be.finish())
        got = [bd.bit(int(p)) for p in probs]
        assert got == list(bits), f"trial {trial}"


def test_bool_coder_literals():
    be = vp8.BoolEncoder()
    vals = [(0, 1), (127, 7), (255, 8), (9, 4), (16383, 14)]
    for v, n in vals:
        be.literal(v, n)
    be.signed_literal(-13, 6)
    bd = vp8.BoolDecoder(be.finish())
    for v, n in vals:
        assert bd.literal(n) == v
    assert bd.signed_literal(6) == -13


def test_transforms_inverse():
    res = RNG.integers(-255, 256, (64, 4, 4))
    assert np.abs(vp8.idct4x4(vp8.fdct4x4(res)) - res).max() <= 1
    dcs = RNG.integers(-2000, 2000, (16, 4, 4))
    for d in dcs:
        rt = vp8.iwht4x4(vp8.fwht4x4(d).astype(np.int64)).reshape(4, 4)
        assert np.abs(rt - d).max() <= 2


def test_idct_dc_only():
    # a DC-only block reconstructs to the flat value (dc*4 gain /16 + round)
    blk = np.zeros((1, 4, 4), np.int64)
    blk[0, 0, 0] = 17
    out = vp8.idct4x4(blk)
    assert (out == out[0, 0, 0]).all()


@pytest.mark.parametrize("hw", [(16, 16), (17, 31), (1, 1), (3, 200),
                                (64, 48), (15, 15)])
def test_roundtrip_dims(hw):
    h, w = hw
    img = _smooth(h, w)
    data = vp8.encode(img, qindex=0)
    out = vp8.decode(data)
    assert out.shape == img.shape
    assert _psnr(out, img) >= 40
    assert vp8.meta(data) == (w, h)
    # noise payload also survives (tokens exercise every category)
    noisy = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for qi in (0, 40, 110):
        assert vp8.decode(vp8.encode(noisy, qindex=qi)).shape == noisy.shape


def test_quality_ladder_monotone():
    img = _smooth(48, 64)
    sizes, psnrs = [], []
    for qi in (0, 20, 60, 110):
        d = vp8.encode(img, qindex=qi)
        sizes.append(len(d))
        psnrs.append(_psnr(vp8.decode(d), img))
    assert sizes == sorted(sizes, reverse=True)
    assert psnrs == sorted(psnrs, reverse=True)
    assert psnrs[0] >= 40


def test_deterministic_bytes():
    img = RNG.integers(0, 256, (33, 49, 3), dtype=np.uint8)
    assert vp8.encode(img, 12) == vp8.encode(img, 12)


def test_interframe_raises():
    img = _smooth(16, 16)
    data = bytearray(vp8.encode(img, 6))
    data[0] |= 1  # flip frame_type to inter
    with pytest.raises(NotImplementedError):
        vp8.decode(bytes(data))


def test_truncation_raises():
    data = vp8.encode(_smooth(32, 32), 6)
    with pytest.raises(ValueError):
        vp8.meta(data[:8])
    with pytest.raises(ValueError):
        vp8.decode(data[:12])  # first partition cut


def test_bpred_stream_decodes():
    """Hand-build a key frame whose single MB is B_PRED (all-skip, all
    B_DC submodes): exercises the 4x4 prediction decode path. With no
    neighbors the edge fill is 127 above / 129 left, so block (0,0)
    reconstructs to (4*127 + 4*129 + 4) >> 3 = 128 and later blocks
    re-average reconstructed 128s with the 129 left fill — every
    pixel lands in {128, 129} deterministically."""
    be = vp8.BoolEncoder()
    be.literal(0, 1)  # color space
    be.literal(0, 1)  # clamping
    be.bit(0)         # segmentation
    be.literal(0, 1)  # filter type
    be.literal(0, 6)  # filter level
    be.literal(0, 3)  # sharpness
    be.bit(0)         # lf adjust
    be.literal(0, 2)  # one token partition
    be.literal(6, 7)  # qindex
    for _ in range(5):
        be.bit(0)     # quant deltas
    be.bit(1)         # refresh entropy
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for n in range(11):
                    be.bit(0, int(T.COEF_UPDATE_PROBS[t, b, c, n]))
    be.bit(1)         # mb_no_coeff_skip
    be.literal(128, 8)
    # one MB: skip=1, ymode=B_PRED, 16 x B_DC submodes, uv DC
    be.bit(1, 128)    # skip
    vp8.tree_write(be, vp8._KF_YMODE_PATHS, T.KF_YMODE_PROB, T.B_PRED)
    sub_paths = vp8.tree_paths(T.BMODE_TREE)
    for _ in range(16):
        vp8.tree_write(be, sub_paths, T.B_MODE_PROB_FALLBACK, T.B_DC_PRED)
    vp8.tree_write(be, vp8._UV_MODE_PATHS, T.KF_UV_MODE_PROB, T.DC_PRED)
    part1 = be.finish()
    w = h = 16
    tag = (1 << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                  0x9D, 0x01, 0x2A, w, 0, h, 0])
    y, u, v = vp8.decode_frame(head + part1)
    assert y.shape == (16, 16)
    assert y[0, 0] == 128
    assert set(np.unique(y)) <= {128, 129}
    assert (u == 128).all() and (v == 128).all()


def test_b4_prediction_modes_shapes():
    a = RNG.integers(0, 256, 4)
    l = RNG.integers(0, 256, 4)
    ar = RNG.integers(0, 256, 4)
    p = 100
    for mode in range(10):
        out = vp8.predict_b4(mode, a, l, p, ar)
        assert out.shape == (4, 4)
        assert out.min() >= 0 and out.max() <= 255


def test_loop_filter_improves_coarse_quant_psnr():
    """The RFC 6386 deblocking filter is a DISPLAY-side improvement:
    at coarse quantizers the filtered decode must beat the unfiltered
    one on PSNR (it removes block edges), and a flat image must be a
    fixed point (all adjustments cancel on equal pixels)."""
    img = _smooth(48, 64)
    for qi in (40, 80):
        d0 = vp8.encode(img, qindex=qi, filter_level=0)
        d1 = vp8.encode(img, qindex=qi, filter_level=20)
        p0 = _psnr(vp8.decode(d0), img)
        p1 = _psnr(vp8.decode(d1), img)
        assert p1 > p0, (qi, p0, p1)
    flat = np.full((32, 32, 3), 77, np.uint8)
    df = vp8.encode(flat, qindex=0, filter_level=30)
    assert np.array_equal(vp8.decode(df), flat)


def test_loop_filter_simple_mode_smooths_block_edge():
    """filter_type=1 (simple filter, luma only): a hard step at a
    block edge is softened; pixels far from edges are untouched."""
    Y = np.empty((33, 37), np.uint8)
    Y[:] = 60
    Y[:, 17:] = 80  # step exactly at the x=16 MB edge (data offset 1)
    U = np.full((17, 17), 90, np.uint8)
    V = np.full((17, 17), 90, np.uint8)
    before = Y.copy()
    inner = np.ones((2, 2), bool)
    vp8._loop_filter(Y, U, V, 2, 2, 1, 30, 0, inner)
    assert (Y[1:, 16] != before[1:, 16]).any()  # edge softened
    assert (Y[1:, 5] == before[1:, 5]).all()    # interior untouched
    assert (U == 90).all() and (V == 90).all()  # simple = luma only


def test_segmentation_roundtrip_and_quality_ordering():
    """Segment maps with per-segment quantizers (RFC 6386 sections
    9.3/10): a two-segment stream (qindex 0 and 80, checkerboard MB
    assignment) decodes, and its PSNR lands strictly between the
    all-q0 and all-q80 streams; four segments + loop filter decode
    too; the unsegmented default stream bytes are unchanged."""
    img = _smooth(48, 64)
    d_seg = vp8.encode(img, segments=[0, 80])
    p_seg = _psnr(vp8.decode(d_seg), img)
    p0 = _psnr(vp8.decode(vp8.encode(img, qindex=0)), img)
    p80 = _psnr(vp8.decode(vp8.encode(img, qindex=80)), img)
    assert p80 < p_seg < p0
    d4 = vp8.encode(img, segments=[0, 30, 60, 100], filter_level=15)
    assert vp8.decode(d4).shape == img.shape
    with pytest.raises(ValueError):
        vp8.encode(img, segments=[1, 2, 3, 4, 5])
    # filter_level must stay LIVE for segmented streams: abs-mode
    # feature data replaces frame-level values, so the encoder writes
    # the lf level per active segment — all-zero features would
    # silently deblock nothing (round-5 fix, ADVICE r4)
    seg_lf0 = vp8.decode(vp8.encode(img, qindex=40, segments=[40, 60],
                                    filter_level=0))
    seg_lf40 = vp8.decode(vp8.encode(img, qindex=40, segments=[40, 60],
                                     filter_level=40))
    assert not np.array_equal(seg_lf0, seg_lf40)


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_multi_token_partitions_decode_identically(tp):
    """Residual tokens split across 2/4/8 partitions (MB row modulo —
    the parallel-entropy layout) decode pixel-identically to the
    single-partition stream; the partition size table parses."""
    img = _smooth(80, 64)
    base = vp8.decode(vp8.encode(img, qindex=6))
    out = vp8.decode(vp8.encode(img, qindex=6, token_partitions=tp))
    assert np.array_equal(out, base)


def test_foreign_stream_gate():
    """ADVICE r4 HIGH: streams with header features our encoder never
    writes (here: color space = 1, the first bool-coded header bit)
    are REJECTED with Vp8ForeignStreamError instead of risking a
    silent bool-decoder desync on the memory-transcribed entropy
    tables; allow_foreign=True bypasses the gate (the conformance-test
    escape hatch) and internal streams decode exactly as before."""
    img = _smooth(32, 32)
    data = bytearray(vp8.encode(img, qindex=10))
    base = vp8.decode(bytes(data))
    # part1 starts at byte 10 (3B frame tag + 3B start code + 2+2 dims);
    # the first prob-128 bool bit reads 1 iff the first byte >= 0x80
    data[10] |= 0x80
    with pytest.raises(vp8.Vp8ForeignStreamError):
        vp8.decode(bytes(data))
    # the escape hatch skips the shape gate (decode may still trip the
    # overrun tripwire or error on the corrupted stream, but must not
    # raise the foreign-shape rejection from the header gate)
    try:
        vp8.decode(bytes(data), allow_foreign=True)
    except vp8.Vp8ForeignStreamError as e:
        assert "overran" in str(e)  # tripwire, not the shape gate
    except Exception:
        pass
    assert base.shape == img.shape
