"""MP4 / ISO Base Media File Format box walk — metadata level.

Round-5 companion to the WebM walk (VERDICT r4 #4): an MP4 payload
yields per-container ATTRIBUTION (brand, timescale/duration, per-track
handler + sample-entry codec fourcc + dimensions) instead of blind
quarantine; sample DECODE stays a declared seam (H.264/HEVC/AAC are
not implementable here — softcodecs handles them when PyAV exists),
so `meta()` is the whole supported surface and decode attempts raise
NotImplementedError carrying the codec fourcc.

Coverage: 32-bit and 64-bit (largesize) box sizes, size-0
runs-to-EOF, the ftyp brand, moov/mvhd (v0+v1), trak/tkhd (v0+v1,
16.16 fixed dims), mdia/mdhd + hdlr, minf/stbl/stsd sample entries.
A fixture-grade writer emits a minimal valid box tree so the parser
is exercised end-to-end.

Public spec: ISO/IEC 14496-12. Reference parity note: destor treats
payloads as opaque chunk streams; container awareness is this repo's
multimodal extension (SURVEY §6), not a port.
"""

from __future__ import annotations

import struct


def is_mp4(data) -> bool:
    return len(data) >= 12 and bytes(data[4:8]) == b"ftyp"


def iter_boxes(data, pos, end):
    """Yield (fourcc, body_start, body_end) at one level."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = bytes(data[pos + 4:pos + 8])
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("MP4 box overruns its parent")
        yield fourcc, body, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing bytes after last MP4 box")


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def meta(data) -> dict:
    """{"brand", "timescale", "duration_ms", "tracks":
    [{"handler", "codec", "w", "h"}]} — the attribution surface."""
    data = bytes(data)
    if not is_mp4(data):
        raise ValueError("not an ISO-BMFF (MP4) stream")
    out = {"brand": "", "timescale": 0, "duration_ms": 0, "tracks": []}

    def walk(pos, end, track=None):
        for fourcc, s, e in iter_boxes(data, pos, end):
            if fourcc == b"ftyp":
                out["brand"] = data[s:s + 4].decode("ascii", "replace")
            elif fourcc == b"mvhd":
                ver = data[s]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, s + 20)
                else:
                    ts, dur = struct.unpack_from(">II", data, s + 12)
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
            elif fourcc == b"trak":
                tr = {"handler": "", "codec": "", "w": 0, "h": 0}
                out["tracks"].append(tr)
                walk(s, e, tr)
            elif fourcc == b"tkhd" and track is not None:
                ver = data[s]
                off = s + (96 if ver == 1 else 84)
                w16, h16 = struct.unpack_from(">II", data, off - 8)
                track["w"] = w16 >> 16
                track["h"] = h16 >> 16
            elif fourcc == b"hdlr" and track is not None:
                track["handler"] = data[s + 8:s + 12] \
                    .decode("ascii", "replace")
            elif fourcc == b"stsd" and track is not None:
                (cnt,) = struct.unpack_from(">I", data, s + 4)
                if cnt:
                    for cf, _cs, _ce in iter_boxes(data, s + 8, e):
                        track["codec"] = cf.decode("ascii", "replace")
                        break
            elif fourcc in _CONTAINERS:
                walk(s, e, track)

    walk(0, len(data))
    return out


def decode_frames(data):
    """Declared seam: BMFF sample decode needs H.264/HEVC/AAC — raise
    with full attribution so the quarantine slice records container
    AND codec (the 'not blind quarantine' contract)."""
    m = meta(data)
    codecs = sorted({t["codec"] for t in m["tracks"] if t["codec"]})
    raise NotImplementedError(
        f"MP4 ({m['brand']}) sample decode is a declared seam — "
        f"tracks carry {codecs or ['<none>']}; metadata attribution "
        "available via bmff.meta")


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def encode_mp4_skeleton(w: int, h: int, codec: bytes = b"avc1",
                        handler: bytes = b"vide",
                        timescale: int = 1000,
                        duration: int = 2000) -> bytes:
    """Minimal valid metadata-only MP4 (ftyp + moov tree + empty
    mdat): enough for meta() — and for any standards-following box
    walker — to report brand, duration, handler, codec and dims."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomiso2mp41")
    mvhd = _box(b"mvhd", bytes(1) + bytes(3)           # v0 + flags
                + struct.pack(">II", 0, 0)             # times
                + struct.pack(">II", timescale, duration)
                + struct.pack(">I", 0x00010000)        # rate
                + struct.pack(">H", 0x0100) + bytes(10)  # volume+rsv
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)        # matrix
                + bytes(24)                            # predefined
                + struct.pack(">I", 2))                # next track
    tkhd = _box(b"tkhd", bytes(1) + b"\x00\x00\x07"    # v0, enabled
                + struct.pack(">II", 0, 0)
                + struct.pack(">I", 1) + bytes(4)      # track id
                + struct.pack(">I", duration) + bytes(8)
                + struct.pack(">HH", 0, 0)
                + struct.pack(">H", 0) + bytes(2)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + struct.pack(">II", w << 16, h << 16))
    mdhd = _box(b"mdhd", bytes(1) + bytes(3)
                + struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, duration)
                + struct.pack(">HH", 0x55C4, 0))
    hdlr = _box(b"hdlr", bytes(4) + bytes(4) + handler
                + bytes(12) + b"destor_ray\x00")
    entry = _box(codec, bytes(6) + struct.pack(">H", 1)
                 + bytes(16)
                 + struct.pack(">HH", w, h)
                 + struct.pack(">II", 0x480000, 0x480000)
                 + bytes(4) + struct.pack(">H", 1)
                 + bytes(32)
                 + struct.pack(">Hh", 0x18, -1))
    stsd = _box(b"stsd", bytes(1) + bytes(3)
                + struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd
                + _box(b"stts", bytes(4) + struct.pack(">I", 0))
                + _box(b"stsc", bytes(4) + struct.pack(">I", 0))
                + _box(b"stsz", bytes(4) + struct.pack(">II", 0, 0))
                + _box(b"stco", bytes(4) + struct.pack(">I", 0)))
    minf = _box(b"minf", _box(b"vmhd", bytes(1) + b"\x00\x00\x01"
                              + bytes(8)) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov + _box(b"mdat", b"")
