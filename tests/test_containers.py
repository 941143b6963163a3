"""WebM/EBML (destor_ray/mkv.py, RFC 9559) and MP4/ISO-BMFF
(destor_ray/bmff.py, ISO 14496-12) container-walk ground truth:
writer→parser round trips, lacing modes, unknown-size elements,
largesize boxes, truncation rejection, VP8 key-frame decode through
the EBML walk, and the mixed-container attribution query."""

import struct

import numpy as np
import pytest

from destor_ray import bmff, mkv, vp8


def _img(i, k=0):
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float64)
    g = np.clip(127 + 60 * np.sin(xx / 11 + i)
                + 50 * np.cos(yy / 7 + k), 0, 255).astype(np.uint8)
    return np.stack([g] * 3, -1)


def _webm(n=4, keyframes=None, qindex=8):
    frames = [vp8.encode(_img(0, k), qindex=qindex) for k in range(n)]
    return mkv.encode_webm(frames, 64, 48, keyframes=keyframes), frames


def test_webm_meta_and_blocks():
    data, frames = _webm(5)
    m = mkv.meta(data)
    assert m["doctype"] == "webm"
    assert m["timestamp_scale"] == 1_000_000
    assert m["duration_ms"] == 200
    assert m["tracks"] == [{"number": 1, "type": 1,
                            "codec_id": "V_VP8", "w": 64, "h": 48,
                            "sampling_rate": 0.0, "channels": 0}]
    blocks = list(mkv.iter_blocks(data))
    assert [(t, ts, kf) for t, ts, kf, _ in blocks] == \
        [(1, 40 * i, True) for i in range(5)]
    assert [f for _, _, _, f in blocks] == frames


def test_webm_keyframe_decode_fidelity():
    data, _ = _webm(3, qindex=4)
    kfs = mkv.decode_keyframes(data)
    assert len(kfs) == 3
    for k, (ts, px) in enumerate(kfs):
        assert ts == 40 * k
        d = px.astype(np.float64) - _img(0, k).astype(np.float64)
        psnr = 10 * np.log10(255 ** 2 / max((d * d).mean(), 1e-9))
        assert psnr > 35


def test_webm_inter_frames_are_attributed_seam():
    data, _ = _webm(3, keyframes=[False, False, False])
    with pytest.raises(NotImplementedError):
        mkv.decode_keyframes(data)
    mixed, _ = _webm(3, keyframes=[True, False, True])
    assert len(mkv.decode_keyframes(mixed)) == 2


def test_webm_multi_cluster_and_unknown_size_segment():
    frames = [vp8.encode(_img(1, k), qindex=10) for k in range(40)]
    data = mkv.encode_webm(frames, 64, 48, frames_per_cluster=16)
    blocks = list(mkv.iter_blocks(data))
    assert len(blocks) == 40
    assert blocks[17][1] == 17 * 40  # cluster-relative ts rebased
    # rewrite the Segment size as the unknown-size vint (all ones):
    # the spec's streaming form — parser must walk to EOF
    seg_at = data.index(b"\x18\x53\x80\x67")
    sz0 = data[seg_at + 4]
    n = 1
    m = 0x80
    while not (sz0 & m):
        m >>= 1
        n += 1
    unk = bytes([0xFF >> (n - 1) | (0x80 >> (n - 1))]) \
        + b"\xff" * (n - 1)
    data2 = data[:seg_at + 4] + unk + data[seg_at + 4 + n:]
    assert len(list(mkv.iter_blocks(data2))) == 40
    assert mkv.meta(data2)["tracks"][0]["codec_id"] == "V_VP8"


def test_webm_lacing_modes():
    """Hand-built SimpleBlocks in Xiph, fixed and EBML lacing all
    yield the same frame list."""
    frames = [b"A" * 7, b"B" * 300, b"C" * 5]

    def blk(lacing_bits, lace_body):
        return (b"\x81" + struct.pack(">h", 0)
                + bytes([0x80 | (lacing_bits << 1)]) + lace_body)

    # Xiph: sizes 7, 300 (255+45), last implicit
    xiph = blk(1, bytes([2, 7, 255, 45]) + b"".join(frames))
    # fixed: equal sizes
    eq = [b"x" * 9, b"y" * 9, b"z" * 9]
    fixed = blk(2, bytes([2]) + b"".join(eq))
    # EBML: first absolute vint(7)=0x87, delta +293 -> 293+8191=8484
    delta = 293 + 8191
    ebml_l = blk(3, bytes([2, 0x87])
                 + bytes([0x60 | (delta >> 8), delta & 0xFF])
                 + b"".join(frames))
    for body, want in ((xiph, frames), (fixed, eq), (ebml_l, frames)):
        got = mkv._parse_block(body, 0, len(body), 0)
        assert got[3] == want, (want[0][:1], got[3])


def test_webm_truncation_raises():
    data, _ = _webm(2)
    for cut in (2, 10, 50, len(data) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            mkv.decode_keyframes(data[:cut])
    with pytest.raises(ValueError):
        mkv.meta(b"\x00\x01\x02\x03")


def test_mp4_meta_walk():
    d = bmff.encode_mp4_skeleton(320, 240, codec=b"avc1",
                                 timescale=1000, duration=2400)
    m = bmff.meta(d)
    assert m["brand"] == "isom"
    assert m["timescale"] == 1000 and m["duration_ms"] == 2400
    assert m["tracks"] == [{"handler": "vide", "codec": "avc1",
                            "w": 320, "h": 240}]
    with pytest.raises(NotImplementedError) as ei:
        bmff.decode_frames(d)
    assert "avc1" in str(ei.value)


def test_mp4_largesize_and_size0_boxes():
    d = bmff.encode_mp4_skeleton(64, 48, codec=b"hev1")
    # wrap the ftyp in a 64-bit largesize header: same parse result
    (sz,) = struct.unpack_from(">I", d, 0)
    big = (struct.pack(">I", 1) + d[4:8] + struct.pack(">Q", sz + 8)
           + d[8:sz]) + d[sz:]
    assert bmff.meta(big)["tracks"][0]["codec"] == "hev1"
    # size-0 final box (runs to EOF) parses
    trail = d + struct.pack(">I", 0) + b"free" + b"\x00" * 5
    assert bmff.meta(trail)["brand"] == "isom"


def test_mp4_truncation_raises():
    d = bmff.encode_mp4_skeleton(64, 48)
    for cut in (6, 30, len(d) // 2):
        with pytest.raises(ValueError):
            bmff.meta(d[:cut])


def test_video_container_stats_pins(ray_session):
    """The mixed-container attribution query: every container/codec/
    status row exact — MJPEG-AVI and WebM-VP8 decode fully (4 frames
    each), MP4 attributes its codec fourcc at the seam, inter-only
    WebM is an attributed seam (not corrupt), garbage is corrupt."""
    import __ray_entry__ as em

    df = em.queries()["video_container_stats"]("/root/testdata/sf0.001") \
        .to_pandas()
    rows = {(r.container, r.codec, r.status): (int(r.n),
                                               int(r.n_frames_decoded))
            for r in df.itertuples()}
    assert rows[("avi", "mjpeg", "ok")] == (12, 48)
    assert rows[("webm", "V_VP8", "ok")] == (12, 48)
    assert rows[("webm", "V_VP8", "seam")] == (3, 0)
    assert rows[("mp4", "avc1", "seam")] == (3, 0)
    assert rows[("mp4", "hev1", "seam")] == (3, 0)
    assert rows[("mp4", "mp4a", "seam")] == (2, 0)
    assert rows[("unknown", "", "corrupt")] == (3, 0)
    assert len(rows) == 7


def test_webm_pcm_audio_track_roundtrip():
    """A_PCM/INT/LIT muxing: a WebM with video + 16-bit PCM audio
    round-trips the exact samples through the EBML walk (blocks
    cluster-aligned, tail samples past the video duration kept), the
    track table reports both tracks, video key frames still decode,
    and compressed-audio codec ids raise as attributed seams."""
    n_frames = 5
    frames = [vp8.encode(_img(3, k), qindex=10) for k in range(n_frames)]
    sr = 8000
    t = np.arange(sr // 2) / sr   # outlasts the 200 ms video
    pcm = np.round(20000 * np.sin(2 * np.pi * 200 * t)).astype(np.int16)
    data = mkv.encode_webm(frames, 64, 48, audio_pcm=pcm, audio_sr=sr)
    m = mkv.meta(data)
    assert [tr["type"] for tr in m["tracks"]] == [1, 2]
    assert m["tracks"][1]["codec_id"] == "A_PCM/INT/LIT"
    assert m["tracks"][1]["sampling_rate"] == sr
    out, osr = mkv.decode_audio(data)
    assert osr == sr
    assert np.array_equal(out, pcm)
    assert len(mkv.decode_keyframes(data)) == n_frames
    # no audio track -> ValueError; compressed codec id -> seam
    video_only = mkv.encode_webm(frames, 64, 48)
    with pytest.raises(ValueError):
        mkv.decode_audio(video_only)
    vorbis = data.replace(b"A_PCM/INT/LIT", b"A_VORBIS\x00\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError):
        mkv.decode_audio(vorbis)
