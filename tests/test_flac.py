"""FLAC codec (destor_ray/flac.py, RFC 9639) ground truth: exact-PCM
round trips across shapes/blocksizes, CRC + truncation rejection,
UTF-8 frame numbers past one byte, and hand-built streams exercising
the decoder paths our subset encoder never emits (LPC subframes,
left/right/mid-side channel assignments, partition order > 0, wasted
bits, escape partitions) — the codec analog of test_vp8's B_PRED
stream."""

import struct

import numpy as np
import pytest

from destor_ray import flac

RNG = np.random.default_rng(0xF1AC)


def _sine(n, sr=8000, f=440, amp=0.5):
    t = np.arange(n) / sr
    return np.round(32767 * amp * np.sin(2 * np.pi * f * t)).astype(np.int32)


@pytest.mark.parametrize("shape", [(1,), (100,), (4096,), (4097,),
                                   (9000,), (100, 2), (5000, 3)])
def test_roundtrip_shapes(shape):
    if len(shape) == 1:
        pcm = _sine(shape[0])
    else:
        pcm = np.stack([_sine(shape[0], f=300 + 50 * c)
                        for c in range(shape[1])], 1)
    data = flac.encode(pcm, 8000)
    out, sr, bps = flac.decode(data)
    assert sr == 8000 and bps == 16
    want = pcm[:, None] if pcm.ndim == 1 else pcm
    assert np.array_equal(out, want)


def test_roundtrip_exact_and_deterministic():
    noise = RNG.integers(-32767, 32767, (7000, 2)).astype(np.int32)
    d1 = flac.encode(noise, 44100)
    d2 = flac.encode(noise, 44100)
    assert d1 == d2
    out, sr, _ = flac.decode(d1)
    assert sr == 44100 and np.array_equal(out, noise)


def test_small_blocksize_many_frames_utf8_numbers():
    # >128 frames exercises the 2-byte coded frame number
    pcm = _sine(140 * 64)
    data = flac.encode(pcm, 8000, blocksize=64)
    out, _, _ = flac.decode(data)
    assert np.array_equal(out[:, 0], pcm)


def test_meta_and_md5():
    pcm = _sine(2000)
    data = flac.encode(pcm, 16000)
    m = flac.meta(data)
    assert m == {"sample_rate": 16000, "channels": 1,
                 "bits_per_sample": 16, "total_samples": 2000}
    # MD5 is real: flipping a payload bit must be caught by CRC first,
    # and zeroing the MD5 field disables the check (spec: unset)
    blank = bytearray(data)
    blank[8 + 18:8 + 34] = b"\x00" * 16  # streaminfo md5 at offset 26
    out, _, _ = flac.decode(bytes(blank))
    assert np.array_equal(out[:, 0], pcm)


def test_truncation_and_corruption_raise():
    data = flac.encode(_sine(5000), 8000)
    for cut in (2, 10, 40, len(data) // 2, len(data) - 1):
        with pytest.raises(ValueError):
            flac.decode(data[:cut])
    bad = bytearray(data)
    bad[-20] ^= 0x10
    with pytest.raises(ValueError):
        flac.decode(bytes(bad))
    with pytest.raises(ValueError):
        flac.decode(b"NOPE" + data[4:])


def _frame_bytes(subframes_fn, n, sr, nch, ch_code):
    """Hand-assemble one frame: header for `ch_code`, then
    `subframes_fn(bw)` writes the subframe bits."""
    bw = flac.BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)           # 16-bit blocksize follows
    bw.write(13, 4)          # 16-bit Hz follows
    bw.write(ch_code, 4)
    bw.write(4, 3)           # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)           # frame 0 (utf8)
    bw.write(n - 1, 16)
    bw.write(sr, 16)
    hdr = bw.tobytes()
    body = flac.BitWriter()
    subframes_fn(body)
    frame = hdr + bytes([flac.crc8(hdr)]) + body.tobytes()
    return frame + struct.pack(">H", flac.crc16(frame))


def _stream(frame, n, sr, nch):
    si = flac.BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(nch - 1, 3)
    si.write(15, 5)          # 16 bps
    si.write(n, 36)
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
            + si.tobytes() + b"\x00" * 16 + frame)


def _write_verbatim(bw, samples, bits=16):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for s in samples:
        bw.write_signed(int(s), bits)


def test_lpc_subframe_decodes():
    """Hand-built order-2 LPC subframe: x[i] = (2*x[i-1]*q - x[i-2]*q)
    >> shift + res with coefs [3, -1], shift 1 — decoded output must
    match the directly-computed recurrence."""
    n = 32
    res = RNG.integers(-5, 6, n - 2).astype(np.int64)
    warm = np.array([100, 103], np.int64)
    coef = np.array([3, -1], np.int64)  # c[0] multiplies x[i-1]
    shift = 1
    want = np.empty(n, np.int64)
    want[:2] = warm
    for i in range(2, n):
        want[i] = ((coef[0] * want[i - 1] + coef[1] * want[i - 2])
                   >> shift) + res[i - 2]

    def sub(bw):
        bw.write(0, 1)
        bw.write(32 + 1, 6)   # LPC order 2 (100001 -> order-1=1)
        bw.write(0, 1)        # no wasted bits
        for w in warm:
            bw.write_signed(int(w), 16)
        bw.write(4, 4)        # precision-1 -> 5 bits
        bw.write_signed(shift, 5)
        for c in coef:
            bw.write_signed(int(c), 5)
        flac._rice_encode(bw, res)

    frame = _frame_bytes(sub, n, 8000, 1, 0)
    out, sr, bps = flac.decode(_stream(frame, n, 8000, 1),
                               verify_md5=False)
    assert np.array_equal(out[:, 0], want)


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_side_channel_assignments(ch_code):
    """left/side, right/side, mid/side streams reconstruct the exact
    stereo pair (side channel carries its extra bit)."""
    n = 64
    left = RNG.integers(-2000, 2000, n).astype(np.int64)
    right = RNG.integers(-2000, 2000, n).astype(np.int64)
    side = left - right
    mid = (left + right) >> 1

    def sub(bw):
        if ch_code == 8:      # left + side
            _write_verbatim(bw, left, 16)
            _write_verbatim(bw, side, 17)
        elif ch_code == 9:    # side + right
            _write_verbatim(bw, side, 17)
            _write_verbatim(bw, right, 16)
        else:                 # mid + side
            _write_verbatim(bw, mid, 16)
            _write_verbatim(bw, side, 17)

    frame = _frame_bytes(sub, n, 8000, 2, ch_code)
    out, _, _ = flac.decode(_stream(frame, n, 8000, 2),
                            verify_md5=False)
    assert np.array_equal(out[:, 0], left)
    assert np.array_equal(out[:, 1], right)


def test_partition_order_and_wasted_bits():
    """Partition order 2 (four Rice partitions, first short by the
    predictor order) + a wasted-bits subframe (samples share a low
    zero bit that the decoder must restore by shifting)."""
    n = 64
    base = RNG.integers(-500, 500, n).astype(np.int64)
    samples = base << 1      # one wasted bit

    def sub(bw):
        bw.write(0, 1)
        bw.write(8 + 1, 6)    # FIXED order 1
        bw.write(1, 1)        # wasted bits present
        bw.write(1, 1)        # unary 0 -> count = 1
        bw.write_signed(int(base[0]), 15)   # eff bps = 16 - 1
        res = np.diff(base)
        # residual split across 4 partitions, order 2
        bw.write(0, 2)
        bw.write(2, 4)
        per = n >> 2
        chunks = [res[:per - 1]]
        for i in range(1, 4):
            chunks.append(res[per * i - 1: per * (i + 1) - 1])
        for ch in chunks:
            z = (np.abs(ch) << 1) - (ch < 0)
            p = 3
            bw.write(p, 4)
            for zz in z:
                q = int(zz) >> p
                for _ in range(q):
                    bw.write(0, 1)
                bw.write(1, 1)
                bw.write(int(zz) & ((1 << p) - 1), p)

    frame = _frame_bytes(sub, n, 8000, 1, 0)
    out, _, _ = flac.decode(_stream(frame, n, 8000, 1),
                            verify_md5=False)
    assert np.array_equal(out[:, 0], samples)


def test_escape_partition_roundtrip():
    """Residuals too wide for any Rice parameter take the raw-escape
    partition in our encoder and decode exactly."""
    pcm = np.zeros(600, np.int32)
    pcm[::2] = 32767
    pcm[1::2] = -32767      # order-0/1/2 residuals all huge
    data = flac.encode(pcm, 8000)
    out, _, _ = flac.decode(data)
    assert np.array_equal(out[:, 0], pcm)


def test_encoder_range_and_rate_guards():
    with pytest.raises(ValueError):
        flac.encode(np.array([40000], np.int64), 8000)
    with pytest.raises(ValueError):
        flac.encode(_sine(10), 100000)
    with pytest.raises(ValueError):
        flac.encode(_sine(10), 8000, bps=24)


def test_audio_decode_dispatch_container_agnostic():
    """codec.audio_decode / audio_decode_channels give BIT-IDENTICAL
    float PCM for WAV- and FLAC-hosted copies of one recording — the
    guarantee that lets every audio dedup channel (gain, offset,
    timescale, samplerate, stereo, pitch, omni) accept either
    container without a per-format pipeline (round 5: the channels'
    call sites moved from codec.wav_decode to this dispatch)."""
    from destor_ray import codec

    sr = 8000
    t = np.arange(2 * sr) / sr
    pcm = np.round(32767 * 0.4 * (np.sin(2 * np.pi * 310 * t)
                                  + 0.2 * np.sin(2 * np.pi * 77 * t))) \
        .astype(np.int32)
    wav = codec.wav_encode(pcm / 32767.0, sr)
    fl = flac.encode(pcm, sr)
    mw, sw = codec.audio_decode(wav)
    mf, sf_ = codec.audio_decode(fl)
    assert sw == sf_ == sr
    assert np.array_equal(mw, mf)
    cw, _ = codec.audio_decode_channels(wav)
    cf, _ = codec.audio_decode_channels(fl)
    assert cw.shape == cf.shape == (2 * sr, 1)
    assert np.array_equal(cw, cf)
