"""VP8 bitstream constant tables (RFC 6386, "VP8 Data Format and
Decoding Guide") for the pure-numpy key-frame codec in `vp8.py`.

PROVENANCE / VERIFICATION STATUS — read before trusting interop:
  * Structure (tree shapes, band map, zigzag, category bases/probs,
    quantizer lookup tables, header layout) is transcribed from RFC
    6386 and is exercised bit-for-bit by the encode→decode round-trip
    tests (tests/test_vp8.py).
  * DEFAULT_COEF_PROBS and COEF_UPDATE_PROBS are transcribed from the
    RFC's reference tables FROM MEMORY in an offline sandbox (no spec
    text, no libvpx source, no reference vectors available). Block
    type 0 is high-confidence; the remaining blocks are best-effort.
    Our own encoder/decoder pair shares this module, so every stream
    WE produce round-trips exactly regardless — but a stream from a
    REAL encoder (libvpx) is decoded with these tables as the arith-
    coder priors, so any mis-transcribed entry desynchronizes decode
    of real files. Swapping in a verified transcription is a
    data-only change; nothing in vp8.py depends on the values.
  * KF_B_MODE_PROBS (the 10x10x9 context table for B_PRED submodes)
    is NOT transcribed: all contexts fall back to the (recalled)
    context-free inter-frame submode distribution. Our encoder never
    emits B_PRED, so this only affects real-stream interop (same
    caveat as above).

Round-5 gating (ADVICE r4 HIGH): a wrong arithmetic-coder prior does
NOT raise — the bool decoder silently desynchronizes — so "decode
failures quarantine" alone was insufficient for foreign streams.
vp8.decode_frame now REJECTS (Vp8ForeignStreamError) any stream whose
header shows features our own encoder never writes (coef-prob
updates, lf adjustments, quant deltas, foreign segmentation shape,
simple filter, missing skip prob) and additionally trips on bool-
decoder overrun past the partition end, so externally-produced VP8
lands on the quarantine path WITH attribution instead of yielding
plausible-but-garbage pixels. The escape hatch (allow_foreign=True)
exists for the cross-verification test
tests/test_optional_deps.py::test_vp8_conformance_vs_libvpx, which
runs whenever PyAV/libvpx is installed and checks BOTH directions
(libvpx streams through our tables, our streams through libvpx);
passing it upgrades this module's provenance from "recalled" to
"cross-verified" — until then these tables remain unverified.
"""

from __future__ import annotations

import numpy as np

# --- quantizer lookups (RFC 6386 section 14.1) -------------------------
DC_QLOOKUP = np.array([
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
], dtype=np.int32)

AC_QLOOKUP = np.array([
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
], dtype=np.int32)

# --- coefficient scan / bands (RFC 6386 section 13.3) ------------------
ZIGZAG = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15],
                  dtype=np.int64)
COEF_BANDS = np.array([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7],
                      dtype=np.int64)

# --- token alphabet (RFC 6386 section 13.2) ----------------------------
# tokens: 0..3 literal, 4=cat1, 5=cat2, 6=cat3, 7=cat4, 8=cat5, 9=cat6,
# 10=EOB (we use our own ordering constants; the TREE below defines the
# bitstream mapping and matches the RFC's coef tree shape)
TOK_ZERO, TOK_ONE, TOK_TWO, TOK_THREE, TOK_FOUR = 0, 1, 2, 3, 4
TOK_CAT1, TOK_CAT2, TOK_CAT3, TOK_CAT4, TOK_CAT5, TOK_CAT6 = 5, 6, 7, 8, 9, 10
TOK_EOB = 11

# RFC coef tree: leaves are -token, internal nodes are child indices.
COEF_TREE = np.array([
    -TOK_EOB, 2,
    -TOK_ZERO, 4,
    -TOK_ONE, 6,
    8, 12,
    -TOK_TWO, 10,
    -TOK_THREE, -TOK_FOUR,
    14, 16,
    -TOK_CAT1, -TOK_CAT2,
    18, 20,
    -TOK_CAT3, -TOK_CAT4,
    -TOK_CAT5, -TOK_CAT6,
], dtype=np.int64)

# extra-bit probabilities and base values per category (RFC 13.2)
CAT_PROBS = {
    TOK_CAT1: (159,),
    TOK_CAT2: (165, 145),
    TOK_CAT3: (173, 148, 140),
    TOK_CAT4: (176, 155, 140, 135),
    TOK_CAT5: (180, 157, 141, 134, 130),
    TOK_CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}
CAT_BASE = {TOK_CAT1: 5, TOK_CAT2: 7, TOK_CAT3: 11, TOK_CAT4: 19,
            TOK_CAT5: 35, TOK_CAT6: 67}

# token value for magnitudes 0..4 map to themselves; categories cover
# 5.. upward.  EOB terminates the block.

# --- intra mode alphabets (RFC 6386 sections 11.2-11.4) ----------------
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# key-frame luma mode tree + probs
KF_YMODE_TREE = np.array([-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED,
                          -H_PRED, -TM_PRED], dtype=np.int64)
KF_YMODE_PROB = (145, 156, 163, 128)
# chroma mode tree + key-frame probs
UV_MODE_TREE = np.array([-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED],
                        dtype=np.int64)
KF_UV_MODE_PROB = (142, 114, 183)

# 4x4 submodes
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED, B_RD_PRED,
 B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)
BMODE_TREE = np.array([
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
], dtype=np.int64)
# context-free submode distribution (used as the fallback for ALL
# key-frame contexts — see module docstring; real kf decoding uses a
# 10x10 context table we do not transcribe here)
B_MODE_PROB_FALLBACK = (120, 90, 79, 133, 87, 85, 80, 111, 151)

# 16x16 mode -> implied submode for B_PRED above/left context
MODE_TO_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                 H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

# --- default coefficient probabilities (RFC 6386 section 13.5) ---------
# [block_type 4][band 8][context 3][node 11]; block types: 0 = luma
# after Y2, 1 = Y2, 2 = chroma, 3 = luma with DC (no Y2).
# See module docstring for transcription-confidence caveats.
DEFAULT_COEF_PROBS = np.array([
    [  # block type 0: luma after Y2
        [[198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62],
         [131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1],
         [68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128]],
        [[1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128],
         [184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128],
         [81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128]],
        [[1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128],
         [99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128],
         [23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128]],
        [[1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128],
         [109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128],
         [44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128]],
        [[1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128],
         [94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128],
         [22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128]],
        [[1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128],
         [124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128],
         [35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128]],
        [[1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128],
         [121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128],
         [45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128]],
        [[1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128],
         [203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128]],
    ],
    [  # block type 1: Y2
        [[253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128],
         [189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128],
         [106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128]],
        [[1, 207, 246, 255, 245, 255, 128, 128, 128, 128, 128],
         [175, 187, 250, 255, 250, 250, 128, 128, 128, 128, 128],
         [120, 185, 251, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 232, 251, 255, 255, 128, 128, 128, 128, 128, 128],
         [181, 217, 251, 255, 255, 128, 128, 128, 128, 128, 128],
         [160, 204, 249, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 245, 253, 255, 255, 128, 128, 128, 128, 128, 128],
         [203, 232, 251, 255, 255, 128, 128, 128, 128, 128, 128],
         [189, 219, 251, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 246, 254, 255, 255, 128, 128, 128, 128, 128, 128],
         [226, 234, 252, 255, 255, 128, 128, 128, 128, 128, 128],
         [211, 228, 251, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 248, 254, 255, 255, 128, 128, 128, 128, 128, 128],
         [232, 239, 253, 255, 255, 128, 128, 128, 128, 128, 128],
         [220, 234, 252, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 251, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [238, 245, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [229, 241, 254, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
         [245, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
         [238, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
    [  # block type 2: chroma
        [[213, 49, 238, 242, 202, 190, 235, 168, 244, 220, 95],
         [140, 70, 203, 236, 187, 185, 236, 171, 255, 233, 128],
         [83, 61, 157, 220, 164, 174, 228, 170, 249, 223, 128]],
        [[1, 168, 238, 249, 211, 201, 255, 255, 128, 128, 128],
         [169, 160, 231, 249, 211, 203, 255, 222, 128, 128, 128],
         [88, 119, 188, 243, 185, 190, 251, 210, 255, 255, 128]],
        [[1, 148, 235, 250, 211, 203, 255, 255, 128, 128, 128],
         [120, 132, 218, 249, 206, 199, 255, 255, 128, 128, 128],
         [47, 103, 180, 245, 185, 192, 255, 235, 128, 128, 128]],
        [[1, 196, 244, 254, 226, 255, 128, 128, 128, 128, 128],
         [131, 175, 239, 254, 224, 255, 128, 128, 128, 128, 128],
         [63, 134, 207, 252, 201, 227, 255, 255, 128, 128, 128]],
        [[1, 157, 241, 253, 220, 233, 128, 128, 128, 128, 128],
         [110, 144, 230, 252, 214, 219, 255, 255, 128, 128, 128],
         [39, 108, 188, 248, 192, 207, 255, 255, 128, 128, 128]],
        [[1, 188, 248, 255, 233, 255, 128, 128, 128, 128, 128],
         [133, 160, 242, 255, 230, 255, 128, 128, 128, 128, 128],
         [55, 113, 200, 252, 202, 229, 255, 255, 128, 128, 128]],
        [[1, 172, 245, 255, 230, 255, 128, 128, 128, 128, 128],
         [129, 152, 238, 255, 227, 255, 128, 128, 128, 128, 128],
         [53, 108, 195, 252, 198, 226, 255, 255, 128, 128, 128]],
        [[1, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [244, 1, 250, 255, 255, 128, 128, 128, 128, 128, 128],
         [238, 1, 246, 255, 255, 128, 128, 128, 128, 128, 128]],
    ],
    [  # block type 3: luma with DC (B_PRED)
        [[202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255],
         [126, 38, 166, 203, 165, 181, 195, 155, 236, 161, 255],
         [61, 46, 138, 188, 134, 174, 196, 147, 247, 162, 255]],
        [[1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128],
         [166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128],
         [39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128]],
        [[1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128],
         [124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128],
         [24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128]],
        [[1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128],
         [149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128],
         [28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128]],
        [[1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128],
         [123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128],
         [20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128]],
        [[1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128],
         [168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128],
         [47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128]],
        [[1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128],
         [141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128],
         [42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128]],
        [[1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
], dtype=np.uint8)

# probabilities that each coefficient prob is UPDATED in the frame
# header (RFC 6386 section 13.4).  Dominated by 255 ("almost never");
# the handful of lower-valued early-band entries are best-effort (see
# module docstring).  Only coding efficiency of OUR streams and real-
# stream interop depend on exactness — round-trip correctness does not.
COEF_UPDATE_PROBS = np.full((4, 8, 3, 11), 255, dtype=np.uint8)
_CUP_KNOWN = [
    # (block, band, ctx, [11 probs])
    (0, 1, 0, [176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255]),
    (0, 1, 1, [223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255]),
    (0, 1, 2, [249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255]),
    (0, 2, 0, [255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255]),
    (0, 2, 1, [234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255]),
    (0, 2, 2, [253, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255]),
]
for _b, _bd, _c, _p in _CUP_KNOWN:
    COEF_UPDATE_PROBS[_b, _bd, _c] = _p
del _CUP_KNOWN
