"""WebM / Matroska (EBML) container walk — pure Python/numpy.

Round-5 closure of the dominant real-crawl video-container gap
(VERDICT r4 #4): track enumeration, block timestamps, and VP8
KEY-FRAME decode through the round-4 RFC 6386 codec (vp8.py), so a
WebM payload yields per-container attribution rows instead of blind
quarantine. Inter (P-) frames and non-VP8 codecs raise with
attribution — the quarantine path downstream records WHY.

Coverage: EBML header (DocType), Segment walk incl. unknown-size
elements, Info (TimestampScale, Duration), Tracks (TrackEntry:
number, type, CodecID, Video PixelWidth/Height, Audio
SamplingFrequency/Channels), Cluster → Timestamp + SimpleBlock /
BlockGroup(Block) with all four lacing modes (none, Xiph, fixed,
EBML). A fixture-grade writer emits minimal valid WebM (EBML header,
Info, one video TrackEntry, clusters of keyframe SimpleBlocks) so the
parser is exercised by real files our own tools produce; foreign
(libvpx) WebM key frames remain gated by vp8.Vp8ForeignStreamError
until the entropy tables are cross-verified.

Public spec: RFC 9559 (Matroska), WebM container guidelines. Element
IDs below are the spec's class IDs. Reference parity note: destor
treats payloads as opaque chunk streams
(/root/reference/src/storage/containerstore.c); container awareness
is this repo's multimodal extension (SURVEY §6), not a port.
"""

from __future__ import annotations

import struct

import numpy as np

EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element IDs (RFC 9559), kept as the raw marker-included bytes
_ID = {
    "EBML": b"\x1a\x45\xdf\xa3",
    "EBMLVersion": b"\x42\x86",
    "EBMLReadVersion": b"\x42\xf7",
    "EBMLMaxIDLength": b"\x42\xf2",
    "EBMLMaxSizeLength": b"\x42\xf3",
    "DocType": b"\x42\x82",
    "DocTypeVersion": b"\x42\x87",
    "DocTypeReadVersion": b"\x42\x85",
    "Segment": b"\x18\x53\x80\x67",
    "Info": b"\x15\x49\xa9\x66",
    "TimestampScale": b"\x2a\xd7\xb1",
    "Duration": b"\x44\x89",
    "MuxingApp": b"\x4d\x80",
    "WritingApp": b"\x57\x41",
    "Tracks": b"\x16\x54\xae\x6b",
    "TrackEntry": b"\xae",
    "TrackNumber": b"\xd7",
    "TrackUID": b"\x73\xc5",
    "TrackType": b"\x83",
    "CodecID": b"\x86",
    "Video": b"\xe0",
    "PixelWidth": b"\xb0",
    "PixelHeight": b"\xba",
    "Audio": b"\xe1",
    "SamplingFrequency": b"\xb5",
    "Channels": b"\x9f",
    "Cluster": b"\x1f\x43\xb6\x75",
    "Timestamp": b"\xe7",
    "SimpleBlock": b"\xa3",
    "BlockGroup": b"\xa0",
    "Block": b"\xa1",
}

_CONTAINERS = {_ID[k] for k in
               ("Segment", "Info", "Tracks", "TrackEntry", "Video",
                "Audio", "Cluster", "BlockGroup", "EBML")}


def is_webm(data) -> bool:
    return bytes(data[:4]) == EBML_MAGIC


# ---------------------------------------------------------------------------
# EBML primitives
# ---------------------------------------------------------------------------

def _read_vint(data, pos, strip_marker: bool):
    """(value, new_pos); strip_marker for sizes/track numbers, keep it
    for element IDs (IDs compare as raw bytes). Returns value None for
    the all-ones 'unknown size'."""
    if pos >= len(data):
        raise ValueError("truncated EBML (vint)")
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("invalid EBML vint")
    n = 1
    mask = 0x80
    while not (b0 & mask):
        mask >>= 1
        n += 1
    if pos + n > len(data):
        raise ValueError("truncated EBML (vint body)")
    v = b0 & (mask - 1) if strip_marker else b0
    unknown = strip_marker and (b0 & (mask - 1)) == mask - 1
    for i in range(1, n):
        c = data[pos + i]
        v = (v << 8) | c
        unknown = unknown and c == 0xFF
    if strip_marker and unknown:
        return None, pos + n
    return v, pos + n


def _read_id(data, pos):
    """Element ID as raw bytes (marker kept)."""
    if pos >= len(data):
        raise ValueError("truncated EBML (id)")
    b0 = data[pos]
    n = 1
    mask = 0x80
    while not (b0 & mask):
        mask >>= 1
        n += 1
        if n > 4:
            raise ValueError("invalid EBML id")
    if pos + n > len(data):
        raise ValueError("truncated EBML (id body)")
    return bytes(data[pos:pos + n]), pos + n


def _uint(body: bytes) -> int:
    v = 0
    for b in body:
        v = (v << 8) | b
    return v


def _float(body: bytes) -> float:
    if len(body) == 4:
        return struct.unpack(">f", body)[0]
    if len(body) == 8:
        return struct.unpack(">d", body)[0]
    if len(body) == 0:
        return 0.0
    raise ValueError("bad EBML float width")


def iter_elements(data, pos, end):
    """Yield (id_bytes, body_start, body_end) walking one level.
    Unknown-size elements (only master elements per spec) extend to
    `end` — the caller recurses into them."""
    while pos < end:
        eid, pos = _read_id(data, pos)
        size, pos = _read_vint(data, pos, strip_marker=True)
        if size is None:
            yield eid, pos, end
            return
        if pos + size > end:
            raise ValueError("EBML element overruns its parent")
        yield eid, pos, pos + size
        pos += size


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def meta(data) -> dict:
    """{"doctype", "timestamp_scale", "duration_ms", "tracks":
    [{"number","type","codec_id","w","h","sampling_rate","channels"}]}
    — the attribution surface the ingestion stats query reports."""
    data = bytes(data)
    if not is_webm(data):
        raise ValueError("not an EBML/WebM stream")
    out = {"doctype": "", "timestamp_scale": 1_000_000,
           "duration_ms": 0, "tracks": []}
    dur_raw = None
    for eid, s, e in iter_elements(data, 0, len(data)):
        if eid == _ID["EBML"]:
            for cid, cs, ce in iter_elements(data, s, e):
                if cid == _ID["DocType"]:
                    out["doctype"] = data[cs:ce].rstrip(b"\x00") \
                        .decode("ascii", "replace")
        elif eid == _ID["Segment"]:
            for cid, cs, ce in iter_elements(data, s, e):
                if cid == _ID["Info"]:
                    for gid, gs, ge in iter_elements(data, cs, ce):
                        if gid == _ID["TimestampScale"]:
                            out["timestamp_scale"] = _uint(data[gs:ge])
                        elif gid == _ID["Duration"]:
                            dur_raw = _float(data[gs:ge])
                elif cid == _ID["Tracks"]:
                    for gid, gs, ge in iter_elements(data, cs, ce):
                        if gid != _ID["TrackEntry"]:
                            continue
                        tr = {"number": 0, "type": 0, "codec_id": "",
                              "w": 0, "h": 0, "sampling_rate": 0.0,
                              "channels": 0}
                        for tid, ts, te in iter_elements(data, gs, ge):
                            if tid == _ID["TrackNumber"]:
                                tr["number"] = _uint(data[ts:te])
                            elif tid == _ID["TrackType"]:
                                tr["type"] = _uint(data[ts:te])
                            elif tid == _ID["CodecID"]:
                                tr["codec_id"] = data[ts:te] \
                                    .rstrip(b"\x00") \
                                    .decode("ascii", "replace")
                            elif tid == _ID["Video"]:
                                for vid, vs, ve in iter_elements(
                                        data, ts, te):
                                    if vid == _ID["PixelWidth"]:
                                        tr["w"] = _uint(data[vs:ve])
                                    elif vid == _ID["PixelHeight"]:
                                        tr["h"] = _uint(data[vs:ve])
                            elif tid == _ID["Audio"]:
                                for aid, as_, ae in iter_elements(
                                        data, ts, te):
                                    if aid == _ID["SamplingFrequency"]:
                                        tr["sampling_rate"] = \
                                            _float(data[as_:ae])
                                    elif aid == _ID["Channels"]:
                                        tr["channels"] = \
                                            _uint(data[as_:ae])
                        out["tracks"].append(tr)
    if dur_raw is not None:
        out["duration_ms"] = int(round(
            dur_raw * out["timestamp_scale"] / 1_000_000))
    return out


def _parse_block(data, s, e, cluster_ts):
    """(track, timestamp_raw, keyframe, [frame bytes]) from one
    SimpleBlock/Block body — all four lacing modes."""
    track, pos = _read_vint(data, s, strip_marker=True)
    if track is None:
        raise ValueError("unknown-size block track number")
    if pos + 3 > e:
        raise ValueError("truncated block header")
    (rel,) = struct.unpack(">h", data[pos:pos + 2])
    flags = data[pos + 2]
    pos += 3
    keyframe = bool(flags & 0x80)
    lacing = (flags >> 1) & 0x03
    if lacing == 0:
        frames = [bytes(data[pos:e])]
    else:
        if pos >= e:
            raise ValueError("truncated lace header")
        nlaced = data[pos] + 1
        pos += 1
        sizes = []
        if lacing == 2:  # fixed
            total = e - pos
            if total % nlaced:
                raise ValueError("fixed lacing does not divide")
            sizes = [total // nlaced] * nlaced
        elif lacing == 1:  # Xiph
            for _ in range(nlaced - 1):
                v = 0
                while True:
                    if pos >= e:
                        raise ValueError("truncated Xiph lace")
                    b = data[pos]
                    pos += 1
                    v += b
                    if b != 255:
                        break
                sizes.append(v)
            sizes.append(e - pos - sum(sizes))
        else:  # EBML lacing: first absolute, rest signed deltas
            first, pos = _read_vint(data, pos, strip_marker=True)
            sizes.append(first)
            prev = first
            for _ in range(nlaced - 2):
                raw, npos = _read_vint(data, pos, strip_marker=True)
                nbits = (npos - pos) * 7
                prev += raw - ((1 << (nbits - 1)) - 1)
                sizes.append(prev)
                pos = npos
            sizes.append(e - pos - sum(sizes))
        frames = []
        for sz in sizes:
            if sz < 0 or pos + sz > e:
                raise ValueError("lace sizes overrun block")
            frames.append(bytes(data[pos:pos + sz]))
            pos += sz
    return track, cluster_ts + rel, keyframe, frames


def iter_blocks(data):
    """Yield (track, timestamp_raw, keyframe, frame_bytes) across all
    clusters (BlockGroup Blocks report keyframe=None — reference-frame
    bookkeeping lives in sibling elements we don't need)."""
    data = bytes(data)
    if not is_webm(data):
        raise ValueError("not an EBML/WebM stream")
    for eid, s, e in iter_elements(data, 0, len(data)):
        if eid != _ID["Segment"]:
            continue
        for cid, cs, ce in iter_elements(data, s, e):
            if cid != _ID["Cluster"]:
                continue
            ts = 0
            for gid, gs, ge in iter_elements(data, cs, ce):
                if gid == _ID["Timestamp"]:
                    ts = _uint(data[gs:ge])
                elif gid == _ID["SimpleBlock"]:
                    tr, t, kf, frames = _parse_block(data, gs, ge, ts)
                    for f in frames:
                        yield tr, t, kf, f
                elif gid == _ID["BlockGroup"]:
                    for bid, bs, be in iter_elements(data, gs, ge):
                        if bid == _ID["Block"]:
                            tr, t, _kf, frames = _parse_block(
                                data, bs, be, ts)
                            for f in frames:
                                yield tr, t, None, f


def decode_keyframes(data) -> list:
    """[(timestamp_raw, (h, w, 3) uint8)] for the VP8 video track's
    KEY frames; inter frames and non-VP8 codecs raise
    NotImplementedError with attribution (→ quarantine downstream).
    This is the k-slot/cut-anchor feed: in crawl WebM, keyframes sit
    at cuts, which is exactly where those channels sample."""
    from . import vp8 as _vp8
    m = meta(data)
    vtracks = {t["number"]: t for t in m["tracks"] if t["type"] == 1}
    if not vtracks:
        raise ValueError("WebM has no video track")
    for t in vtracks.values():
        if t["codec_id"] != "V_VP8":
            raise NotImplementedError(
                f"WebM video codec {t['codec_id']!r} not supported "
                "(VP8 key frames only)")
    out = []
    saw_inter = 0
    for tr, ts, kf, frame in iter_blocks(data):
        if tr not in vtracks:
            continue
        if kf is False or (kf is None and (not frame or frame[0] & 1)):
            saw_inter += 1
            continue
        out.append((ts, _vp8.decode(frame)))
    if not out and saw_inter:
        raise NotImplementedError(
            f"WebM video track has only inter frames ({saw_inter}) — "
            "VP8 inter prediction is a declared seam")
    return out


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _vint_size(v: int) -> bytes:
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            out = v | (1 << (7 * n))
            return out.to_bytes(n, "big")
    raise ValueError("size too large")


def _el(name: str, body: bytes) -> bytes:
    return _ID[name] + _vint_size(len(body)) + body


def _el_uint(name: str, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(name, v.to_bytes(n, "big"))


def decode_audio(data) -> tuple:
    """(int16 mono/interleaved PCM array, sample_rate) from the first
    A_PCM/INT/LIT audio track (the uncompressed-PCM codec id Matroska
    defines) — the avi.decode_audio contract for WebM containers.
    Raises ValueError when no audio track exists and
    NotImplementedError (→ quarantine with attribution) for
    compressed audio codecs (Vorbis/Opus are declared seams)."""
    m = meta(data)
    atracks = {t["number"]: t for t in m["tracks"] if t["type"] == 2}
    if not atracks:
        raise ValueError("WebM has no audio track")
    for t in atracks.values():
        if t["codec_id"] != "A_PCM/INT/LIT":
            raise NotImplementedError(
                f"WebM audio codec {t['codec_id']!r} is a declared "
                "seam (A_PCM/INT/LIT only)")
    tno = min(atracks)
    sr = int(atracks[tno]["sampling_rate"]) or 8000
    pieces = [f for tr, _ts, _kf, f in iter_blocks(data) if tr == tno]
    if not pieces:
        raise ValueError("WebM audio track has no blocks")
    import numpy as _np
    return _np.frombuffer(b"".join(pieces), dtype="<i2"), sr


def encode_webm(vp8_frames: list, w: int, h: int,
                frame_ms: int = 40, frames_per_cluster: int = 16,
                keyframes=None, audio_pcm=None,
                audio_sr: int = 8000) -> bytes:
    """Minimal valid WebM: each element of `vp8_frames` is an encoded
    VP8 payload placed in its own SimpleBlock (keyframe flag from
    `keyframes`, default all-key); clusters of `frames_per_cluster`.
    With `audio_pcm` (int16 samples) an A_PCM/INT/LIT track 2 is
    muxed: each cluster carries the PCM spanning its time range,
    interleaved after the video blocks. Fixture-grade: explicit sizes
    throughout."""
    if keyframes is None:
        keyframes = [True] * len(vp8_frames)
    ebml = _el("EBML", b"".join([
        _el_uint("EBMLVersion", 1),
        _el_uint("EBMLReadVersion", 1),
        _el_uint("EBMLMaxIDLength", 4),
        _el_uint("EBMLMaxSizeLength", 8),
        _el("DocType", b"webm"),
        _el_uint("DocTypeVersion", 2),
        _el_uint("DocTypeReadVersion", 2),
    ]))
    info = _el("Info", b"".join([
        _el_uint("TimestampScale", 1_000_000),
        _el("Duration", struct.pack(
            ">d", float(len(vp8_frames) * frame_ms))),
        _el("MuxingApp", b"destor_ray"),
        _el("WritingApp", b"destor_ray"),
    ]))
    ventry = _el("TrackEntry", b"".join([
        _el_uint("TrackNumber", 1),
        _el_uint("TrackUID", 1),
        _el_uint("TrackType", 1),
        _el("CodecID", b"V_VP8"),
        _el("Video", _el_uint("PixelWidth", w)
            + _el_uint("PixelHeight", h)),
    ]))
    aentry = b""
    if audio_pcm is not None:
        import numpy as _np
        audio_pcm = _np.asarray(audio_pcm, "<i2")
        aentry = _el("TrackEntry", b"".join([
            _el_uint("TrackNumber", 2),
            _el_uint("TrackUID", 2),
            _el_uint("TrackType", 2),
            _el("CodecID", b"A_PCM/INT/LIT"),
            _el("Audio", _el("SamplingFrequency",
                             struct.pack(">d", float(audio_sr)))
                + _el_uint("Channels", 1)),
        ]))
    tracks = _el("Tracks", ventry + aentry)
    clusters = []
    for c0 in range(0, len(vp8_frames), frames_per_cluster):
        cts = c0 * frame_ms
        body = [_el_uint("Timestamp", cts)]
        for i in range(c0, min(c0 + frames_per_cluster,
                               len(vp8_frames))):
            rel = i * frame_ms - cts
            flags = 0x80 if keyframes[i] else 0x00
            blk = (b"\x81" + struct.pack(">h", rel)
                   + bytes([flags]) + bytes(vp8_frames[i]))
            body.append(_el("SimpleBlock", blk))
        if audio_pcm is not None:
            # the PCM samples spanning this cluster's time range
            end_ms = min(c0 + frames_per_cluster,
                         len(vp8_frames)) * frame_ms
            s0 = cts * audio_sr // 1000
            s1 = end_ms * audio_sr // 1000
            chunk = audio_pcm[s0:s1]
            if len(chunk):
                ab = (b"\x82" + struct.pack(">h", 0)
                      + bytes([0x80]) + chunk.tobytes())
                body.append(_el("SimpleBlock", ab))
        clusters.append(_el("Cluster", b"".join(body)))
    if audio_pcm is not None:
        covered = len(vp8_frames) * frame_ms * audio_sr // 1000
        if covered < len(audio_pcm):  # audio outlasting the video
            cts = len(vp8_frames) * frame_ms
            ab = (b"\x82" + struct.pack(">h", 0) + bytes([0x80])
                  + audio_pcm[covered:].tobytes())
            clusters.append(_el("Cluster",
                                _el_uint("Timestamp", cts)
                                + _el("SimpleBlock", ab)))
    segment = _el("Segment", info + tracks + b"".join(clusters))
    return ebml + segment
