"""Real baseline JFIF JPEG codec (destor_ray.jpeg) — round-trip
fidelity, interchange-format structure, and codec-dispatch tests."""

import numpy as np
import pytest

from destor_ray import codec, jpeg


def _smooth(seed: int = 3, h: int = 32, w: int = 32) -> np.ndarray:
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(4):
        cx, cy, r = rng.uniform(0, w), rng.uniform(0, h), rng.uniform(4, 10)
        amp = rng.uniform(-60, 60, 3)
        m = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
        img += m[..., None] * amp
    return np.clip(img + 128, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("q,minpsnr", [(95, 45), (90, 42), (75, 38),
                                       (50, 34)])
def test_roundtrip_psnr_smooth(q, minpsnr):
    img = _smooth()
    out = jpeg.decode(jpeg.encode(img, q))
    assert out.shape == img.shape
    assert _psnr(img, out) >= minpsnr


def test_roundtrip_edge_cases():
    rng = np.random.RandomState(0)
    cases = [
        rng.randint(0, 256, (24, 40, 3), dtype=np.uint8),  # noise/ZRL
        np.zeros((16, 16, 3), np.uint8),
        np.full((16, 16, 3), 255, np.uint8),
        rng.randint(0, 256, (3, 5, 3), dtype=np.uint8),    # tiny, padded
        _smooth(9, 27, 29),                                # odd dims
    ]
    for img in cases:
        out = jpeg.decode(jpeg.encode(img, 90))
        assert out.shape == img.shape
        assert _psnr(img, out) >= 15


def test_interchange_structure():
    """Every marker a baseline decoder requires, in a legal order."""
    data = jpeg.encode(_smooth(), 85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data
    # 4 Huffman tables (DC/AC x luma/chroma), 2 quant tables
    assert data.count(b"\xff\xc4") >= 4
    assert data.count(b"\xff\xdb") >= 2
    w, h = jpeg.meta(data)
    assert (w, h) == (32, 32)


def test_quality_monotonic_size_and_fidelity():
    img = _smooth(5)
    sizes, psnrs = [], []
    for q in (30, 60, 90):
        d = jpeg.encode(img, q)
        sizes.append(len(d))
        psnrs.append(_psnr(img, jpeg.decode(d)))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


def test_codec_dispatch():
    img = _smooth(7)
    d = codec.encode(img, "jfif", 90)
    assert codec.decode_meta(d) == ("jpeg", 0, 32, 32)
    out = codec.decode(d)
    assert _psnr(img, out) >= 40
    # DRI1 and PNG dispatch unchanged
    assert codec.decode_meta(codec.encode(img, "jpeg", 90))[0] == "jpeg"
    assert codec.decode_meta(codec.encode(img, "png"))[0] == "png"


def test_decoder_rejects_malformed_progressive():
    """A sequential stream whose SOF marker merely CLAIMS progressive
    is malformed (single full-band scan, no valid progressive scan
    script) — the progressive dispatch must fail loudly, not return
    garbage pixels. A REAL progressive stream decodes (tests below)."""
    data = bytearray(jpeg.encode(_smooth(), 90))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # claim progressive
    with pytest.raises((ValueError, IndexError)):
        jpeg.decode(bytes(data))


def test_progressive_matches_sequential_bit_exact():
    """encode_progressive codes the same quantized coefficients as the
    sequential encoder, so decode() output is BIT-IDENTICAL between
    the two — across subsampling modes, qualities, awkward sizes, the
    standard-table script AND the custom-table EOBn-run script. The
    DC-luma thumbnail matches too (and reads only the leading DC
    scans of the progressive stream)."""
    for (h, w) in [(24, 32), (17, 23), (40, 56), (9, 25), (8, 8)]:
        yy, xx = np.mgrid[0:h, 0:w]
        for img in (
            np.clip(np.stack([yy // 4 + 100, xx // 4 + 90,
                              (yy + xx) // 8 + 80], -1),
                    0, 255).astype(np.uint8),      # smooth: EOB runs
            np.clip(np.stack([(yy * 2 + xx) % 200 + 20,
                              (yy + xx * 3) % 200 + 20,
                              (yy * 5 + xx * 7) % 200 + 20], -1),
                    0, 255).astype(np.uint8),      # busy: dense ACs
        ):
            for sub in ("444", "420"):
                for er in (False, True):
                    bs = jpeg.encode(img, 88, subsampling=sub)
                    bp = jpeg.encode_progressive(
                        img, 88, subsampling=sub, eob_runs=er)
                    assert np.array_equal(jpeg.decode(bs),
                                          jpeg.decode(bp)), (h, w, sub, er)
                    assert np.array_equal(jpeg.decode_dc_luma(bs),
                                          jpeg.decode_dc_luma(bp)), \
                        (h, w, sub, er)
                    # header-only reads work unchanged on SOF2
                    assert jpeg.meta(bp) == (w, h)
                    assert jpeg.estimate_quality(bp) == (88, 0)


def test_jfif_corpus_psnr_vs_generator():
    """Every fixture image decodes within lossy tolerance of the
    procedural source pixels (the fidelity bound jfif_decode_stats
    relies on)."""
    from destor_ray import corpus as corpus_mod
    from destor_ray.pipelines.ingest import _jfif_corpus_dir
    import pyarrow.parquet as pq

    d = _jfif_corpus_dir(n_images=32)
    t = pq.read_table(f"{d}/images.parquet")
    subs = t["subsampling"].to_pylist()
    assert {"444", "420", "422"} <= {s.rstrip("p") for s in subs}
    assert any(s.endswith("p") for s in subs)   # progressive rows mixed
    for i, (data, sub) in enumerate(zip(t["bytes"].to_pylist(), subs)):
        px, w, h, _, _ = corpus_mod._base_pixels(seed=7, row=i)
        out = codec.decode(data)
        assert out.shape == (h, w, 3)
        # chroma decimation is lossy by design: the fixture pixels have
        # sharp chroma edges, so subsampled rows bound at ~28 dB while
        # 4:4:4 holds the original 35 dB bar
        assert _psnr(px, out) >= (35 if sub.rstrip("p") == "444"
                                  else 27), (i, sub)


def test_jpeg_hypothesis_roundtrip():
    """Property: any uint8 RGB image of any small odd/even size at any
    quality round-trips without error, preserving shape; flat regions
    reconstruct near-exactly."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20), w=st.integers(1, 20),
        q=st.integers(1, 100), seed=st.integers(0, 2 ** 16),
        flat=st.booleans(),
    )
    def prop(h, w, q, seed, flat):
        rng = np.random.RandomState(seed)
        if flat:
            img = np.full((h, w, 3), rng.randint(0, 256), np.uint8)
        else:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        out = jpeg.decode(jpeg.encode(img, q))
        assert out.shape == img.shape
        if flat and q >= 50:
            assert _psnr(img, out) >= 30

    prop()


def test_decode_dc_luma_matches_box_mean():
    """DC-only decode == 8x8 box mean of the full decode's luma (AC
    basis functions integrate to zero over a block): near-exact on a
    gradient, exact on a flat image, correct ceil-shape on non-multiple
    dimensions."""
    import numpy as np
    from destor_ray import jpeg

    flat = np.full((32, 24, 3), 99, np.uint8)
    t = jpeg.decode_dc_luma(jpeg.encode(flat, quality=90))
    assert t.shape == (4, 3)
    assert np.abs(t.astype(int) - 99).max() <= 1

    grad = (np.indices((41, 50)).sum(0) * 2 % 256).astype(np.uint8)
    grad = np.repeat(grad[:, :, None], 3, axis=2)
    data = jpeg.encode(grad, quality=90)
    dc = jpeg.decode_dc_luma(data)
    assert dc.shape == (6, 7)  # ceil(41/8), ceil(50/8)
    full = jpeg.decode(data).astype(np.float64)
    y = 0.299 * full[..., 0] + 0.587 * full[..., 1] + 0.114 * full[..., 2]
    y = np.pad(y, ((0, 48 - 41), (0, 56 - 50)), mode="edge")
    box = y.reshape(6, 8, 7, 8).mean(axis=(1, 3))
    # edge padding differs from the encoder's interior-block content on
    # partial blocks; interior blocks must agree to ~1 gray level
    err = np.abs(box[:5, :6] - dc[:5, :6].astype(np.float64))
    assert err.max() <= 1.0, err.max()


def test_subsampled_roundtrip_all_modes():
    """4:2:0 / 4:2:2 / 4:4:0-shaped streams round-trip at every
    awkward size (odd dims, partial MCUs): shape-exact, luma
    near-lossless, full-RGB within chroma-decimation tolerance."""
    for (h, w) in [(16, 16), (17, 23), (37, 53), (40, 56), (9, 25),
                   (8, 8), (1, 1), (15, 16), (16, 15)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(np.stack([(yy * 2 + xx) % 200 + 20,
                                (yy + xx * 3) % 200 + 20,
                                (yy * 5 + xx * 7) % 200 + 20],
                               axis=-1), 0, 255).astype(np.uint8)
        for sub in ("420", "422"):
            data = jpeg.encode(img, 92, subsampling=sub)
            out = jpeg.decode(data)
            assert out.shape == img.shape, (h, w, sub)
            # luma is full-resolution under every mode
            ly = 0.299 * img[..., 0] + 0.587 * img[..., 1] \
                + 0.114 * img[..., 2]
            lo = 0.299 * out[..., 0] + 0.587 * out[..., 1] \
                + 0.114 * out[..., 2]
            assert _psnr(ly.astype(np.uint8), lo.astype(np.uint8)) >= 30, \
                (h, w, sub)
            assert jpeg.meta(data) == (w, h)
            # quality estimate is DQT-only: unaffected by subsampling
            assert jpeg.estimate_quality(data) == (92, 0)


def test_subsampled_dc_luma_grid_and_exactness():
    """decode_dc_luma returns the TRUE luma block grid (ceil/8) under
    4:2:0 — the MCU padding row/col is cropped — and stays within one
    gray level of the decoded image's 8x box means."""
    for (h, w) in [(40, 56), (17, 23), (24, 24), (25, 24)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(np.stack([(yy * 3 + xx) % 200 + 20,
                                (yy + xx * 2) % 200 + 20,
                                (yy + xx) % 200 + 20], -1),
                      0, 255).astype(np.uint8)
        for sub in ("444", "420", "422"):
            data = jpeg.encode(img, 92, subsampling=sub)
            th = jpeg.decode_dc_luma(data)
            assert th.shape == (-(-h // 8), -(-w // 8)), (h, w, sub)
            full = jpeg.decode(data)
            ycc = (0.299 * full[..., 0] + 0.587 * full[..., 1]
                   + 0.114 * full[..., 2])
            H, W = -(-h // 8) * 8, -(-w // 8) * 8
            g = np.pad(ycc, ((0, H - h), (0, W - w)), mode="edge")
            bm = g.reshape(H // 8, 8, W // 8, 8).mean((1, 3))
            assert np.abs(th.astype(float) - bm).max() <= 1.5, (h, w, sub)


def test_16bit_dqt_decodes_identically():
    """A Pq=1 (16-bit big-endian) DQT stream decodes bit-identically
    to its 8-bit twin — full decode, DC thumbnail, and the DQT-based
    quality estimate all read through the precision flag (T.81
    B.2.4.1; archival/high-quality encoders emit these)."""
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(np.stack([(yy * 2 + xx) % 200 + 20,
                            (yy + xx * 3) % 200 + 20,
                            (yy + xx) % 200 + 20], -1),
                  0, 255).astype(np.uint8)
    data = jpeg.encode(img, 90)
    buf = bytearray(data)
    out = bytearray(buf[:2])
    i = 2
    while i < len(buf):
        m = buf[i + 1]
        if m == 0xDA:
            out += buf[i:]
            break
        ln = (buf[i + 2] << 8) | buf[i + 3]
        seg = buf[i + 4:i + 2 + ln]
        if m == 0xDB:           # widen payload to 16-bit entries
            pay = bytes([0x10 | (seg[0] & 0x0F)]) + b"".join(
                int(v).to_bytes(2, "big") for v in seg[1:65])
            out += b"\xff\xdb" + (len(pay) + 2).to_bytes(2, "big") + pay
        else:
            out += buf[i:i + 2 + ln]
        i += 2 + ln
    data16 = bytes(out)
    assert np.array_equal(jpeg.decode(data), jpeg.decode(data16))
    assert np.array_equal(jpeg.decode_dc_luma(data),
                          jpeg.decode_dc_luma(data16))
    assert jpeg.estimate_quality(data16) == (90, 0)


def test_restart_markers_decode_identically():
    """A DRI/RSTn stream (restart_interval MCUs per segment, cycling
    D0..D7 markers, DC predictors reset per segment — the
    error-resilience layout camera firmwares enable) decodes to
    EXACTLY the pixels of its marker-free twin; the DC thumbnail path
    handles the segments too; restart_interval=0 stays byte-identical
    to the historical encoder."""
    for (h, w) in [(24, 32), (40, 56), (17, 23)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(np.stack([(yy * 2 + xx) % 200 + 20,
                                (yy + xx * 3) % 200 + 20,
                                (yy + xx) % 200 + 20], -1),
                      0, 255).astype(np.uint8)
        for sub in ("444", "420"):
            b0 = jpeg.encode(img, 88, subsampling=sub)
            for ri in (1, 3, 7):
                br = jpeg.encode(img, 88, subsampling=sub,
                                 restart_interval=ri)
                assert b"\xff\xdd" in br and br != b0
                assert np.array_equal(jpeg.decode(b0), jpeg.decode(br))
                assert np.array_equal(jpeg.decode_dc_luma(b0),
                                      jpeg.decode_dc_luma(br))


def test_jfif_dc_thumbnail_stats_query(ray_session):
    import __ray_entry__ as em
    out = em.queries()["jfif_dc_thumbnail_stats"](
        "/root/testdata/sf0.001")
    row = out.iloc[0]
    assert int(row["n_images"]) == 256
    # near-lossless vs the box-mean reference across the whole fixture
    assert int(row["min_psnr_centi"]) >= 4000   # >= 40 dB
    assert int(row["mean_psnr_centi"]) >= 4500


def test_jfif_dc_dedup_full_recall_no_false_merges(ray_session):
    """the DC-thumb-signature dedup finds every planted re-encode pair
    (recall 1.0) with zero false merges, never running a full decode."""
    from destor_ray.pipelines.ingest import jfif_dc_dedup

    out = jfif_dc_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 256 and out.n_planted == 64
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 64


def test_estimate_quality_inverts_encoder():
    """estimate_quality recovers the exact IJG quality factor (zero
    DQT distance) for our own encoder across the scaling's two
    regimes (q<50 → 5000/q, q>=50 → 200−2q), and reports a nonzero
    distance for a file with perturbed (non-standard) tables."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 24, 3), np.uint8)
    for q in (35, 50, 70, 85, 92, 97):
        data = jpeg.encode(px, quality=q)
        est, dist = jpeg.estimate_quality(data)
        assert (est, dist) == (q, 0), q
    # perturb one DQT byte (a mid-table coefficient, keep it valid)
    data = bytearray(jpeg.encode(px, quality=85))
    i = data.index(b"\xff\xdb") + 5 + 30
    data[i] = max(1, (data[i] + 7) % 255)
    est, dist = jpeg.estimate_quality(bytes(data))
    assert dist > 0 and 1 <= est <= 100


def test_jfif_quality_estimate_query(ray_session):
    """the mixed-quality corpus query recovers every file's encoder
    quality exactly, with bit-standard IJG tables throughout."""
    from destor_ray.pipelines.ingest import jfif_quality_estimate

    out = jfif_quality_estimate("/root/testdata/sf0.001", n_images=32)
    assert list(out["true_q"]) == [70, 85, 92]
    assert (out["n_error"] == 0).all()
    assert (out["n_exact"] == out["n"]).all()
    assert (out["n_zero_dist"] == out["n"]).all()
    assert (out["min_est_q"] == out["true_q"]).all()
    assert (out["max_est_q"] == out["true_q"]).all()


def test_dihedral_apply_group_properties():
    """the 8 orientations are distinct, each is an involution-or-
    cycle member of D4 (applying the right inverse restores), and the
    orbit of a transformed image equals the orbit of the source —
    the group-closure fact orbit-expansion banding relies on."""
    import numpy as np
    from destor_ray import codec

    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    orbit = {codec.dihedral_apply(a, k).tobytes() for k in range(8)}
    assert len(orbit) == 8  # generic image: all orientations distinct
    for t in range(8):
        b = np.ascontiguousarray(codec.dihedral_apply(a, t))
        orbit_b = {codec.dihedral_apply(b, k).tobytes()
                   for k in range(8)}
        assert orbit_b == orbit


def test_dihedral_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted mirrored/rotated + re-encoded copy is found
    (recall 1.0) with zero false merges; the plain-phash channel is
    blind to this class (flip moves ~31/64 bits), so a pass proves the
    orbit-expansion banding + aligned-PSNR verify do the work."""
    from destor_ray.pipelines.ingest import dihedral_image_dedup

    out = dihedral_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0


def test_exif_roundtrip_and_absent():
    """build_exif → encode → parse_exif recovers the written subset;
    files without APP1 parse as None; the big-endian (MM) byte order
    parses too; decode() is unaffected by the APP1 insert."""
    import numpy as np

    px = (np.arange(24 * 24 * 3, dtype=np.uint64) * 37 % 251) \
        .astype(np.uint8).reshape(24, 24, 3)
    meta = {"make": "ACME", "model": "CamX-9", "orientation": 6,
            "datetime": "2026:08:19 10:00:00"}
    data = jpeg.encode(px, 85, exif=meta)
    assert jpeg.parse_exif(data) == meta
    assert jpeg.parse_exif(jpeg.encode(px, 85)) is None
    assert np.array_equal(jpeg.decode(data), jpeg.decode(jpeg.encode(px, 85)))
    # hand-built big-endian TIFF: orientation 7
    t = (b"MM" + (42).to_bytes(2, "big") + (8).to_bytes(4, "big")
         + (1).to_bytes(2, "big")
         + (0x0112).to_bytes(2, "big") + (3).to_bytes(2, "big")
         + (1).to_bytes(4, "big") + (7).to_bytes(2, "big") + b"\0\0"
         + b"\0\0\0\0")
    app1 = b"Exif\x00\x00" + t
    seg = bytes([0xFF, 0xE1]) + (len(app1) + 2).to_bytes(2, "big") + app1
    assert jpeg.parse_exif(b"\xff\xd8" + seg + b"\xff\xd9") == \
        {"orientation": 7}


def test_exif_orientation_maps_are_inverse():
    """EXIF_ORIENT_FIX undoes EXIF_ORIENT_STORE for every tag value —
    fixing a camera-stored array recovers the upright scene exactly."""
    import numpy as np
    from destor_ray import codec

    rng = np.random.default_rng(5)
    a = rng.integers(0, 255, (16, 24), dtype=np.uint8)  # non-square
    for o in range(1, 9):
        stored = codec.dihedral_apply(a, jpeg.EXIF_ORIENT_STORE[o])
        fixed = codec.dihedral_apply(stored, jpeg.EXIF_ORIENT_FIX[o])
        assert np.array_equal(fixed, a), o


def test_jfif_exif_stats_query(ray_session):
    """provenance extraction pins the planted camera distribution:
    144 base rows cycle 4 cameras with every 7th row EXIF-less, plus
    48 rotated dups (12/camera) whose orientation tag > 1."""
    from destor_ray.pipelines.ingest import jfif_exif_stats

    out = jfif_exif_stats("/root/testdata/sf0.001")
    assert list(out["make"]) == ["(none)", "ACME", "ACME", "Borealis",
                                 "Cetus"]
    none_row = out.iloc[0]
    assert none_row.n == none_row.n_no_exif == 20
    assert none_row.dt_min_key == none_row.dt_max_key == -1
    cams = out.iloc[1:]
    assert (cams["n"] == 43).all()   # 36 base − 5 EXIF-less + 12 dups
    assert (cams["n_no_exif"] == 0).all()
    assert (cams["n_oriented"] == 12).all()   # 48 rotated dups / 4 cameras
    assert int(out["n"].sum()) == 192


def test_exif_orientation_dedup_full_recall_no_false_merges(ray_session):
    """every planted camera-rotated + re-encoded copy is found via the
    EXIF-guided fix at 1× signature cost (recall 1.0, zero false
    merges); MEASURED on this fixture: unnormalized phash moves >= 22
    bits on the planted pairs (blind), fixed-thumb PSNR >= 51.4 dB vs
    distinct-pair max 23.4 dB."""
    from destor_ray.pipelines.ingest import exif_orientation_dedup

    out = exif_orientation_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48


def test_letterbox_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted letterbox/pillarbox/frame + re-encoded copy is
    found (recall 1.0, zero false merges); MEASURED on this fixture:
    true-pair inset-PSNR >= 37.2 dB vs distinct-colliding max 27.4 dB,
    and all 48 pairs collide in >= 1 of 16 bands after the trim."""
    from destor_ray.pipelines.ingest import letterbox_image_dedup

    out = letterbox_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48


def test_photometric_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted brightness/contrast-adjusted + re-encoded copy is
    found (recall 1.0, zero false merges). MEASURED: tint pairs move
    <= 2 aHash bits (mean-threshold hash is affine-equivariant) but
    bottom at 11 dB thumb PSNR — a PSNR verify would reject every one;
    the ZNCC verify (invariant under y'=a*y+b by construction)
    separates true >= 0.9705 from distinct <= 0.9075 on this
    deliberately adversarial smooth-gradient corpus."""
    from destor_ray.pipelines.ingest import photometric_image_dedup

    out = photometric_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48


def test_zncc_affine_invariance():
    """_zncc(a*y+b, y) == 1 exactly (no clipping), and ZNCC is
    symmetric and bounded."""
    import numpy as np
    from destor_ray.pipelines.ingest import _zncc

    rng = np.random.default_rng(2)
    y = rng.integers(40, 200, (16, 16)).astype(np.uint8)
    t = np.clip(1.2 * y.astype(np.float64) - 10, 0, 255)
    assert abs(_zncc(y, t) - 1.0) < 1e-12
    other = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    z = _zncc(y, other)
    assert -1.0 <= z <= 1.0
    assert abs(z - _zncc(other, y)) < 1e-12
    flat = np.full((16, 16), 7, np.uint8)
    assert _zncc(flat, flat) == 1.0
    assert _zncc(flat, y) == 0.0


def test_tonecurve_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted gamma/S-curve/histogram-stretch + re-encoded copy
    is found (recall 1.0, zero false merges). MEASURED: plain aHash
    moves up to 20 bits under the curves but the rank-image aHash only
    2.0 mean (order statistics are tone-invariant); gray hist-match
    ZNCC overlaps two genuinely rank-coincident base gradients (true
    0.9436 vs distinct 0.9241) while the per-channel min separates at
    0.9967 vs 0.6576 — channels are curved monotonically but their
    structures are independent."""
    from destor_ray.pipelines.ingest import tonecurve_image_dedup

    out = tonecurve_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48


def test_histmatch_zncc_monotone_invariance():
    """_histmatch_zncc(T(y), y) == 1 exactly for any strictly monotone
    T with no value collisions (transport recovers T), stays 1 under
    gamma on a distinct-valued grid, and drops for structurally
    different images; _rank_image is exactly invariant under strictly
    monotone maps."""
    import numpy as np
    from destor_ray.pipelines.ingest import _histmatch_zncc, _rank_image

    rng = np.random.default_rng(5)
    # distinct values guarantee a collision-free transport
    y = rng.permutation(256).reshape(16, 16).astype(np.float64)
    for T in (lambda v: (v / 255.0) ** 2.2 * 255,
              lambda v: np.sqrt(v / 255.0) * 255,
              lambda v: 3 * (v / 255) ** 2 - 2 * (v / 255) ** 3):
        assert abs(_histmatch_zncc(T(y), y) - 1.0) < 1e-12
        assert np.allclose(_rank_image(T(y)), _rank_image(y))
    other = rng.permutation(256).reshape(16, 16).astype(np.float64)
    assert _histmatch_zncc(other, y) < 0.5


def test_overlay_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted logo/timestamp-overlay + re-encoded copy is found
    (recall 1.0, zero false merges). MEASURED: overlays move 6.6 aHash
    bits mean (few 8x8 blocks touched; 48/48 dual-band collide) but
    global thumb PSNR bottoms at 13.6 dB — a plain gate rejects every
    planted pair; trimmed-tile PSNR (drop worst 4/16) separates true
    >= 41.5 dB from distinct <= 24.7 dB."""
    from destor_ray.pipelines.ingest import overlay_image_dedup

    out = overlay_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48


def test_trimmed_tile_psnr_occlusion_robustness():
    """a synthetic occlusion confined to <= drop tiles leaves trimmed
    PSNR at 99 (exact agreement elsewhere), while the SAME energy
    spread across all tiles tanks it — the property that makes the
    verify occlusion-robust rather than just lenient."""
    import numpy as np
    from destor_ray.pipelines.ingest import _trimmed_tile_psnr

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    occluded = base.copy()
    occluded[0:8, 0:8] = 255          # exactly 4 tiles of 4x4
    assert _trimmed_tile_psnr(base, occluded) == 99.0
    # same total squared error, spread uniformly over every tile
    err = (base.astype(np.float64) - occluded.astype(np.float64))
    per_px = np.sqrt((err ** 2).sum() / 256)
    spread = np.clip(base.astype(np.float64) + per_px, 0, 255)
    assert _trimmed_tile_psnr(base, spread) < 35.0


def test_crop_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted aggressive-crop (55-80%-per-dim window, arbitrary
    offset, q70 re-encode) copy is found — recall 1.0, zero false
    merges. MEASURED design ladder: global hashes move >=20 bits
    (every band blind past ~2% trims); content-defined 2D anchors
    re-pick the same pixels at any offset; patch votes alone CANNOT
    decide (distinct smooth patches hit 40.8 dB and 4 consistent
    votes vs true pairs with 1 matching anchor) so the decisive gate
    is overlap-window PSNR: true >=30.7 dB vs false <=23.6 dB."""
    from destor_ray.pipelines.ingest import crop_image_dedup

    out = crop_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48


def test_crop_anchor_translation_covariance():
    """anchors are content-defined: every anchor of the full image
    that lies well inside a crop window reappears in the crop's own
    anchor set at exactly the shifted position (±1 px for centroid
    rounding) — the property that makes crop candidates meet at a
    shared band key without any grid alignment assumption (the 2D
    analog of CDC boundary resynchronization, ref src/chunking.c)."""
    import numpy as np
    from destor_ray.pipelines.ingest import (_anchor_points,
                                             _box_smooth3,
                                             _crop_base_pixels)

    for i in range(6):
        g = _crop_base_pixels(i)[..., 1]
        h, w = g.shape
        pts = _anchor_points(_box_smooth3(g))
        rng = np.random.default_rng(i)
        y0, x0 = int(rng.integers(5, 20)), int(rng.integers(5, 20))
        ch = h - y0 - int(rng.integers(5, 20))
        cw = w - x0 - int(rng.integers(5, 20))
        setc = {tuple(p) for p in
                _anchor_points(_box_smooth3(g[y0:y0 + ch, x0:x0 + cw]))}
        inner = [(y, x) for y, x in pts
                 if y0 + 10 <= y < y0 + ch - 10
                 and x0 + 10 <= x < x0 + cw - 10]
        assert inner, "fixture must yield interior anchors"
        for y, x in inner:
            assert any((y - y0 + a, x - x0 + b) in setc
                       for a in (-1, 0, 1) for b in (-1, 0, 1))


def test_crop_overlap_sweep_invariants():
    """the overlap verify's contract: (a) the ±2 sweep dominates every
    fixed offset in its neighborhood (so a ±2 anchor-centroid error
    can never score below the exact alignment — the rescue property;
    note thumb-grid quantization means a ±2 offset can even score
    HIGHER than the exact one, which is why the test pins domination,
    not a fixed ordering), (b) a true crop at its planted offset
    clears the 27 dB production gate while the same pair against an
    unrelated image stays far below it, and (c) sub-min_frac corner
    overlaps are rejected outright (score -1)."""
    import numpy as np
    from destor_ray.pipelines.ingest import (_box_thumb32,
                                             _crop_base_pixels,
                                             _overlap_psnr_sweep)

    g = _crop_base_pixels(3)[..., 1].astype(np.uint8)
    h, w = g.shape
    y0, x0, ch, cw = 17, 23, h - 30, w - 40
    crop = g[y0:y0 + ch, x0:x0 + cw]
    ta = _box_thumb32(g).astype(np.float32)
    tb = _box_thumb32(crop).astype(np.float32)
    swept = _overlap_psnr_sweep(ta, h, w, tb, ch, cw, y0, x0, sweep=2)
    for ey in (-2, 0, 2):
        for ex in (-2, 0, 2):
            fixed = _overlap_psnr_sweep(ta, h, w, tb, ch, cw,
                                        y0 + ey, x0 + ex, sweep=0)
            assert swept >= fixed - 1e-6
    assert swept >= 27.0
    other = _box_thumb32(
        _crop_base_pixels(9)[..., 1].astype(np.uint8)).astype(np.float32)
    oh, ow = _crop_base_pixels(9).shape[:2]
    assert _overlap_psnr_sweep(other, oh, ow, tb, ch, cw, y0, x0,
                               sweep=2) < 27.0
    # corner overlap below min_frac -> rejected
    assert _overlap_psnr_sweep(ta, h, w, tb, ch, cw, h - 10, w - 10,
                               sweep=0) == -1.0


def test_rotation_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted ±2-8° rotation + q70 re-encode is found — recall
    1.0, zero false merges. Plain phash was measured moving 18.5 bits
    mean under these angles (blind past any band); here both arms are
    polar: roll-invariant FFT hash candidates, min-over-R/G/B rolled
    PSNR verify."""
    from destor_ray.pipelines.ingest import rotation_image_dedup

    out = rotation_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48
    assert out.n_candidate_pairs > out.n_verified_pairs


def test_rot_hash_exactly_roll_invariant():
    """the candidate hash is EXACTLY invariant under any integer
    cyclic roll of the angle axis: harmonic magnitudes are unchanged
    and every relative phase φ_m − m·φ_1 shifts by m·Δ − m·Δ = 0.
    This is the mathematical property that makes a rotated re-upload
    band-collide with its source regardless of angle."""
    import numpy as np

    from destor_ray import corpus as corpus_mod
    from destor_ray.pipelines.ingest import _rot_hash, _rot_polar

    for row in (0, 7, 31):
        px, _, _, _, _ = corpus_mod._base_pixels(seed=23, row=row)
        g = (299 * px[:, :, 0].astype(np.int32)
             + 587 * px[:, :, 1].astype(np.int32)
             + 114 * px[:, :, 2].astype(np.int32)) // 1000
        P = _rot_polar(g)
        h0 = _rot_hash(P)
        for k in (1, 5, 17, 64, 127):
            assert _rot_hash(np.roll(P, k, axis=1)) == h0


def test_rotate_nn_identity_and_quarter_turn():
    """rotate_nn(px, 0) is the identity, and on a SQUARE image a 90°
    rotation is exactly a np.rot90 (the NN inverse map hits integer
    grid points) — pins the rotation convention the fixture and any
    augmentation user rely on."""
    import numpy as np

    from destor_ray import codec

    rng = np.random.default_rng(3)
    sq = rng.integers(0, 256, (33, 33, 3), dtype=np.uint8)
    assert np.array_equal(codec.rotate_nn(sq, 0.0), sq)
    q = codec.rotate_nn(sq, 90.0)
    assert (np.array_equal(q, np.rot90(sq, k=1, axes=(0, 1)))
            or np.array_equal(q, np.rot90(sq, k=3, axes=(0, 1))))
    # non-square identity still exact
    rect = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    assert np.array_equal(codec.rotate_nn(rect, 0.0), rect)


def test_huesat_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted hue-rotation + saturation-scale + q70 re-encode
    is found — recall 1.0, zero false merges. The flagship's Rec601
    arms were measured blind (thumb PSNR rejects 34/48 true pairs);
    here candidates hash the RGB-mean luma (gray-axis projection,
    exactly invariant) and verify gates on mean-luma PSNR AND
    rotation-exact chroma-magnitude ZNCC."""
    from destor_ray.pipelines.ingest import huesat_image_dedup

    out = huesat_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48
    assert out.n_candidate_pairs > out.n_verified_pairs


def test_huesat_mean_luma_exactly_invariant():
    """the per-pixel RGB-mean is the gray-axis projection: ANY
    rotation about (1,1,1) at ANY saturation leaves the channel-SUM
    of each pixel exactly unchanged (R·c ⊥ (1,1,1) so it sums to 0)
    — up to ±1 gray level from per-channel uint8 rounding, with zero
    clipping when the pixel stays in gamut. This is the mathematical
    property that makes a color-graded re-upload band-collide with
    its source at any hue angle."""
    import numpy as np

    from destor_ray.pipelines.ingest import _huesat_transform, _mean_luma

    rng = np.random.default_rng(11)
    # mid-gamut pixels: |chroma| <= ~73 so any rotation stays in range
    px = rng.integers(70, 186, (40, 56, 3), dtype=np.uint8)
    base = _mean_luma(px)
    for theta, s in ((17.0, 1.0), (-123.0, 0.8), (94.0, 0.6),
                     (180.0, 1.0), (45.5, 0.3)):
        t = _huesat_transform(px, theta, s)
        d = np.abs(base.astype(np.int16) - _mean_luma(t).astype(np.int16))
        assert d.max() <= 1


def test_huesat_chroma_mag_rotation_exact_scale_linear():
    """‖R(θ)·c‖ = ‖c‖ exactly (rotations preserve norms) and
    saturation scales it linearly — so the chroma-magnitude image is
    hue-invariant and ZNCC cancels s. Full desaturation (s=0) zeroes
    the chroma image and its ZNCC against any non-gray original is 0:
    grayscale conversions are EXCLUDED from this duplicate class by
    construction, not silently merged."""
    import numpy as np

    from destor_ray.pipelines.ingest import (_chroma_mag,
                                             _huesat_transform, _zncc)

    rng = np.random.default_rng(13)
    px = rng.integers(70, 186, (32, 32, 3), dtype=np.uint8)
    cm0 = _chroma_mag(px)
    # pure rotation: magnitudes equal up to uint8 channel rounding
    for theta in (33.0, -140.0, 211.0):
        cm1 = _chroma_mag(_huesat_transform(px, theta, 1.0))
        assert np.abs(cm0 - cm1).max() <= 2.0
    # saturation: scaled ~linearly, ZNCC ~1
    cm_s = _chroma_mag(_huesat_transform(px, 60.0, 0.5))
    assert _zncc(cm0, cm_s) > 0.99
    # s=0 boundary: zero chroma, ZNCC exactly 0 vs structured chroma
    cm_gray = _chroma_mag(_huesat_transform(px, 0.0, 0.0))
    assert float(cm_gray.max()) <= 1.0
    assert _zncc(cm0, np.zeros_like(cm0)) == 0.0


def test_grayscale_image_dedup_full_recall_no_false_merges(ray_session):
    """every planted grayscale conversion (converter cycling Rec601 /
    Rec709 / RGB-mean) + q70 re-encode is found — recall 1.0, zero
    false merges. The hue/sat channel excludes s=0 by construction and
    the G channel covers only the 601 converter; here candidates hash
    BOTH luma projections and verify solves the converter by least
    squares, so ANY linear grayscale converter lands."""
    from destor_ray.pipelines.ingest import grayscale_image_dedup

    out = grayscale_image_dedup("/root/testdata/sf0.001").iloc[0]
    assert out.n_images == 192 and out.n_planted == 48
    assert out.recall_ppm == 1_000_000
    assert out.n_false == 0
    assert out.n_true == out.n_verified_pairs == 48


def test_grayscale_ls_fit_margins():
    """kernel pins for the grayscale channel: (a) the LS converter fit
    recovers ANY linear converter — residual PSNR ≥ 45 dB for 601, 709,
    mean AND an exotic (0.5,0.3,0.2) converter on jpeg'd thumbs, while
    a DISTINCT colored image fits a gray thumb at ≤ 30 dB (3 free
    params cannot fake 256 values); (b) the achromatic detector
    separates decoded gray re-encodes (0.0) from colored rows (≥ 33)."""
    import numpy as np

    from destor_ray import codec, jpeg
    from destor_ray import corpus as corpus_mod
    from destor_ray.pipelines.ingest import (_achromatic, _chan_thumb16,
                                             _gray_convert,
                                             _ls_gray_fit_psnr)

    pxs = [corpus_mod._base_pixels(seed=43, row=i)[0] for i in range(6)]
    deco = [jpeg.decode(jpeg.encode(px, 85)) for px in pxs]
    cths = [np.stack([_chan_thumb16(d[:, :, c]) for c in range(3)])
            for d in deco]
    for w in ((0.299, 0.587, 0.114), (0.2126, 0.7152, 0.0722),
              (1 / 3, 1 / 3, 1 / 3), (0.5, 0.3, 0.2)):
        for i, px in enumerate(pxs):
            gd = jpeg.decode(jpeg.encode(_gray_convert(px, w), 70))
            assert _achromatic(gd)
            gth = _chan_thumb16(codec.to_gray(gd))
            assert _ls_gray_fit_psnr(cths[i], gth) >= 45.0
            # distinct colored image cannot fit this gray thumb
            other = cths[(i + 1) % len(pxs)]
            assert _ls_gray_fit_psnr(other, gth) <= 30.0
    for d in deco:
        assert not _achromatic(d)


def test_degrade_image_dedup_per_class_full_recall(ray_session):
    """every planted recompression-family dup (blur σ2, half-res,
    quarter-res, Bayer dither, grain σ10, unsharp mask) is found with
    zero false merges — the low-pass arm closes the measured blur /
    quarter-res gaps without opening a false surface (the fixture's
    rejection sampling guarantees cross pairs sit ≥2 dB below every
    gate)."""
    from destor_ray.pipelines.ingest import (_DEGRADE_KINDS,
                                             degrade_image_dedup)

    out = degrade_image_dedup("/root/testdata/sf0.001")
    assert list(out["kind"]) == list(_DEGRADE_KINDS) + ["_total"]
    per = out[out.kind != "_total"]
    assert (per.n_planted == 8).all()
    assert (per.recall_ppm == 1_000_000).all()
    tot = out[out.kind == "_total"].iloc[0]
    assert tot.n_planted == tot.n_found == 48
    assert tot.n_false == 0


def test_degrade_lowpass_arm_margins_and_sigma4_boundary():
    """kernel pins for the low-pass verify arm: (a) blur σ2 and
    quarter-res true pairs pass the joint gate while σ4 blur FAILS it
    (the documented class boundary — its 8×8 margin vs distinct
    content collapses to 0.3 dB, so accepting it would mean false
    merges); (b) distinct base pairs never pass the joint gate."""
    import numpy as np

    from destor_ray import codec, jpeg
    from destor_ray import corpus as corpus_mod
    from destor_ray.pipelines.ingest import (_downscale_box2,
                                             _gauss_blur, _lowpass_arm)

    def thumb(px):
        d = jpeg.decode(jpeg.encode(px, 70)) if px.ndim == 3 else px
        return codec.resize_nn(codec.to_gray(d), 16, 16) \
            .astype(np.float64)

    base, thumbs = [], []
    for i in range(8):
        px, _, _, _, _ = corpus_mod._base_pixels(seed=53, row=i)
        base.append(px)
        d = jpeg.decode(jpeg.encode(px, 85))
        thumbs.append(codec.resize_nn(codec.to_gray(d), 16, 16)
                      .astype(np.float64))
    n_bl2 = sum(_lowpass_arm(thumbs[i], thumb(_gauss_blur(base[i], 2.0)))
                for i in range(8))
    n_ds4 = sum(_lowpass_arm(
        thumbs[i], thumb(_downscale_box2(_downscale_box2(base[i]))))
        for i in range(8))
    assert n_bl2 == 8 and n_ds4 == 8
    # σ4 boundary: most pairs must FAIL the joint gate
    n_bl4 = sum(_lowpass_arm(thumbs[i], thumb(_gauss_blur(base[i], 4.0)))
                for i in range(8))
    assert n_bl4 < 8
    # distinct pairs never pass
    for i in range(8):
        for j in range(i + 1, 8):
            assert not _lowpass_arm(thumbs[i], thumbs[j])


def test_omni_image_dedup_per_class_full_recall(ray_session):
    """the production composition: one decode, one unified band
    exchange, per-channel verify dispatch — on a mixed corpus planting
    one dup per transform class, EVERY class reaches recall 1.0 with
    zero false merges (the per-channel fixtures cannot certify that
    the channels compose without cross-channel false amplification;
    this pins it)."""
    from destor_ray.pipelines.ingest import _OMNI_KINDS, omni_image_dedup

    out = omni_image_dedup("/root/testdata/sf0.001")
    assert list(out["kind"]) == list(_OMNI_KINDS) + ["_total"]
    per = out[out.kind != "_total"]
    assert (per.n_planted == 7).all()
    assert (per.recall_ppm == 1_000_000).all()
    tot = out[out.kind == "_total"].iloc[0]
    assert tot.n_planted == tot.n_found == 77
    assert tot.n_false == 0


def test_omni_transform_kinds_deterministic_and_distinct():
    """each omni transform actually changes the pixels (except the
    pure re-encode kind, which changes only the encoding) and is
    deterministic in (kind, k) — the fixture's truth labels depend on
    this."""
    import numpy as np

    from destor_ray import corpus as corpus_mod
    from destor_ray.pipelines.ingest import _OMNI_KINDS, _omni_transform

    px, _, _, _, _ = corpus_mod._base_pixels(seed=47, row=12)
    for kind in _OMNI_KINDS:
        t1 = _omni_transform(px, kind, 5)
        t2 = _omni_transform(px, kind, 5)
        assert np.array_equal(t1, t2)
        if kind == "re":
            assert np.array_equal(t1, px)
        elif kind in ("d4", "lb", "rt", "ds"):
            assert t1.shape != px.shape or not np.array_equal(t1, px)
        else:
            assert t1.shape == px.shape and not np.array_equal(t1, px)


def test_jfif_scan_mode_stats_query(ray_session):
    """Progressive rows Huffman-walk only their leading DC scans on
    the thumbnail path; sequential rows walk 100% of entropy bytes."""
    import __ray_entry__ as em

    out = em.queries()["jfif_scan_mode_stats"](
        "/root/testdata/sf0.001").to_pandas()
    assert int(out["n"].sum()) == 256
    prog = out[out["mode"].str.endswith("p")]
    seq = out[~out["mode"].str.endswith("p")]
    assert len(prog) and len(seq)
    assert (seq["dc_walk_ppm"] == 1_000_000).all()
    assert (prog["dc_walk_ppm"] < 600_000).all()


def test_grayscale_1component_roundtrip():
    """Single-component (grayscale) streams — common in scanned/archival
    corpora — encode and decode in BOTH scan modes: output replicates
    luma into RGB, DC thumbnails keep the ceil/8 grid, and the
    progressive twin is bit-identical to the sequential one."""
    for (h, w) in [(24, 32), (17, 23), (8, 8)]:
        yy, xx = np.mgrid[0:h, 0:w]
        g = np.clip((yy * 3 + xx * 2) % 200 + 20, 0, 255).astype(np.uint8)
        for q in (70, 92):
            bs = jpeg.encode(g, q)
            out = jpeg.decode(bs)
            assert out.shape == (h, w, 3)
            assert (out[..., 0] == out[..., 1]).all()
            assert (out[..., 0] == out[..., 2]).all()
            assert _psnr(g, out[..., 0]) >= 30
            assert jpeg.meta(bs) == (w, h)
            assert jpeg.decode_dc_luma(bs).shape == (-(-h // 8),
                                                     -(-w // 8))
            for er in (False, True):
                bp = jpeg.encode_progressive(g, q, eob_runs=er)
                assert np.array_equal(out, jpeg.decode(bp))
                assert np.array_equal(jpeg.decode_dc_luma(bs),
                                      jpeg.decode_dc_luma(bp))
            # restart-marked gray stream decodes identically too
            assert np.array_equal(out, jpeg.decode(
                jpeg.encode(g, q, restart_interval=3)))
