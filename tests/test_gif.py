"""GIF87a/GIF89a codec (destor_ray.gif) — LZW round trips, interlace,
animation composition, codec dispatch."""

import struct

import numpy as np

from destor_ray import codec, gif


def test_roundtrip_palette_sizes_and_interlace():
    rng = np.random.default_rng(1)
    for (h, w) in [(13, 9), (16, 16), (1, 1), (7, 31)]:
        for npal in (2, 5, 16, 256):
            pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
            for kind in range(2):
                if kind == 0:   # noisy: dense dictionary churn
                    idx = rng.integers(0, npal, (h, w)).astype(np.uint8)
                else:           # runs: deep chains + KwKwK sequences
                    idx = (np.add.outer(np.arange(h) // 4,
                                        np.arange(w) // 4)
                           % npal).astype(np.uint8)
                for il in (False, True):
                    data = gif.encode(idx, pal, interlace=il)
                    assert np.array_equal(gif.decode(data), pal[idx]), \
                        (h, w, npal, kind, il)
                    assert gif.meta(data) == (w, h)


def test_lzw_width_growth_and_clear_reset():
    """A large noisy frame drives the code width to 12 bits and forces
    a mid-stream CLEAR + table reset — decoded exactly."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, (200, 200)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    assert np.array_equal(gif.decode(gif.encode(idx, pal)), pal[idx])


def test_codec_dispatch_gif():
    pal = (np.arange(48, dtype=np.uint8).reshape(16, 3) * 5)
    idx = (np.add.outer(np.arange(8), np.arange(12)) % 16) \
        .astype(np.uint8)
    d = gif.encode(idx, pal)
    assert np.array_equal(codec.decode(d), pal[idx])


def test_animation_composition_disposal_transparency():
    """Handcrafted 2-frame animation: frame 2 draws a sub-rect with a
    transparent index over frame 1; decode_frames composites like a
    viewer (transparent pixels keep the prior screen)."""
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]],
                   np.uint8)
    f1 = np.zeros((6, 8), np.uint8)            # all color 0
    f2 = np.full((3, 4), 1, np.uint8)
    f2[1, 1] = 3                               # transparent index
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 8, 6)
    out += bytes([0x80 | (1 << 4) | 1, 0, 0])  # 4-entry GCT
    out += pal.tobytes()
    # frame 1: full screen
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 8, 6) + b"\x00"
    out += bytes([2])
    d1 = gif._lzw_compress(f1.reshape(-1), 2)
    out += bytes([len(d1)]) + d1 + b"\x00"
    # graphic control: transparency on index 3, no disposal
    out += b"\x21\xf9" + bytes([4, 0x01, 0, 0, 3]) + b"\x00"
    # frame 2: sub-rect at (2, 1)
    out += b"\x2c" + struct.pack("<HHHH", 2, 1, 4, 3) + b"\x00"
    out += bytes([2])
    d2 = gif._lzw_compress(f2.reshape(-1), 2)
    out += bytes([len(d2)]) + d2 + b"\x00"
    out += b"\x3b"
    frames = gif.decode_frames(bytes(out))
    assert len(frames) == 2
    assert (frames[0] == pal[0]).all()
    want = np.tile(pal[0], (6, 8, 1))
    want[1:4, 2:6] = pal[1]
    want[2, 3] = pal[0]                        # transparent pixel
    assert np.array_equal(frames[1], want)


def test_gif_decode_stats_query(ray_session):
    """The GIF fixture flows through the flagship decode actor pool;
    decoded pixels equal the palette-quantized generator pixels
    exactly (GIF is lossless past quantization)."""
    import pyarrow.parquet as pq

    import __ray_entry__ as em
    from destor_ray import corpus as corpus_mod
    from destor_ray.pipelines.ingest import _gif_corpus_dir

    out = em.queries()["gif_decode_stats"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert int(df["n_images"].sum()) == 192
    # exactness spot-check on a few rows incl. interlaced ones
    t = pq.read_table(f"{_gif_corpus_dir(192)}/images.parquet")
    for i in (0, 1, 3, 6):      # 0/3/6 interlaced
        px, w, h, _, _ = corpus_mod._base_pixels(seed=11, row=i)
        idx = ((px[:, :, 0] >> 5).astype(np.uint8) << 5
               | (px[:, :, 1] >> 5) << 2 | (px[:, :, 2] >> 6))
        rr, gg = (idx >> 5) & 7, (idx >> 2) & 7
        want = np.stack([rr * 36, gg * 36, (idx & 3) * 85],
                        axis=-1).astype(np.uint8)
        got = codec.decode(t["bytes"][i].as_py())
        assert np.array_equal(got, want), i


def test_gif_palette_dedup_per_class_full_recall(ray_session):
    """All three GIF re-save classes (palette permutation, 2-2-2 depth
    reduction, interlace re-layout) detect with per-class recall 1.0
    and zero false merges; the measured gate margins (depth true pairs
    >= 23.6 dB vs distinct <= 19.2, gate 21) hold."""
    import __ray_entry__ as em

    out = em.queries()["gif_palette_dedup"]("/root/testdata/sf0.001")
    df = out.set_index("kind")
    assert int(df.loc["_total", "n_planted"]) == 32
    for kind in ("perm", "depth", "inter", "_total"):
        assert int(df.loc[kind, "recall_ppm"]) == 1_000_000, kind
        assert int(df.loc[kind, "n_false"]) == 0, kind


def test_gif_animation_dedup_per_class_full_recall(ray_session):
    """The three animated-GIF re-upload classes (depth re-quantize,
    frame-drop halving, palette permutation) detect with per-class
    recall 1.0 and zero false merges via k-slot relative-position
    sampling — slot j of an N-frame animation and of its N/2-frame
    drop copy land on the SAME content frame by construction."""
    import __ray_entry__ as em

    out = em.queries()["gif_animation_dedup"]("/root/testdata/sf0.001")
    df = out.set_index("kind")
    assert int(df.loc["_total", "n_planted"]) == 12
    for kind in ("depth", "drop", "perm", "_total"):
        assert int(df.loc[kind, "recall_ppm"]) == 1_000_000, kind
        assert int(df.loc[kind, "n_false"]) == 0, kind
