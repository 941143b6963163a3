"""FLAC codec — pure numpy/Python decoder + subset encoder.

The audio twin of the image-codec program (VERDICT r4 #3): FLAC is the
dominant losslessly-compressed crawl audio container and is fully
implementable offline from the public spec (RFC 9639 / xiph.org FLAC
format): fixed + LPC linear prediction, Rice/escape residual coding,
UTF-8-style frame numbers, CRC-8 header / CRC-16 frame checksums.

Decoder coverage: STREAMINFO walk (remaining metadata blocks skipped),
fixed + variable blocking, all blocksize/samplerate/samplesize header
codes, CONSTANT / VERBATIM / FIXED 0-4 / LPC 1-32 subframes, wasted
bits, 4- and 5-bit Rice methods with escape partitions, and all four
channel assignments (independent, left/side, right/side, mid/side).
Both CRCs are VERIFIED per frame (truncation or bit rot raises, it
never returns wrong samples) and the STREAMINFO MD5 is checked when
present. Rice decoding is vectorized over a numpy bit array (the
terminator walk is an amortized-O(ones) pointer loop; remainders
gather in one fancy-index op).

Encoder (fixture-grade, valid FLAC): 16-bit, independent channels,
fixed blocking, best-of FIXED order 0-2 per subframe chosen by exact
cost, single-partition Rice with escape fallback, CONSTANT
short-circuit, STREAMINFO with the spec MD5 — enough that any
conforming decoder reads our files and our decoder round-trips them
bit-exactly.

Reference parity note: destor treats payloads as opaque chunk streams
(/root/reference/src/storage/containerstore.c); audio-format awareness
is this repo's multimodal extension (SURVEY §6), not a port.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110

# frame-header blocksize code -> samples (None = coded separately)
_BS_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
             8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
             13: 8192, 14: 16384, 15: 32768}
_SR_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
             6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
             11: 96000}
_SS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEF = [np.array([], np.int64),
               np.array([1], np.int64),
               np.array([2, -1], np.int64),
               np.array([3, -3, 1], np.int64),
               np.array([4, -6, 4, -1], np.int64)]


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.empty(256, np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TBL[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit IO (MSB-first, as FLAC frames are)
# ---------------------------------------------------------------------------

class BitReader:
    """MSB-first reader over a numpy bit array; tracks the byte span so
    frame CRC-16 can be verified over the exact consumed bytes."""

    __slots__ = ("bits", "pos", "nbits")

    def __init__(self, data: bytes, start_byte: int = 0):
        buf = np.frombuffer(data, np.uint8)[start_byte:]
        self.bits = np.unpackbits(buf)
        self.nbits = len(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("truncated FLAC stream")
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        ones = np.flatnonzero(self.bits[self.pos:])
        if not len(ones):
            raise ValueError("truncated FLAC stream (unary)")
        q = int(ones[0])
        self.pos += q + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_signed_vec(self, n: int, count: int) -> np.ndarray:
        """`count` n-bit signed big-endian values, vectorized."""
        if n == 0:
            return np.zeros(count, np.int64)
        end = self.pos + n * count
        if end > self.nbits:
            raise ValueError("truncated FLAC stream")
        m = self.bits[self.pos:end].reshape(count, n).astype(np.int64)
        self.pos = end
        w = (np.int64(1) << np.arange(n - 1, -1, -1, dtype=np.int64))
        v = m @ w
        sign = np.int64(1) << (n - 1)
        return v - ((v & sign) << 1)

    def rice_vec(self, p: int, count: int) -> np.ndarray:
        """`count` Rice(p) codes: unary quotient (q zeros, then a 1)
        + p-bit remainder, zigzag-unmapped. The terminator walk is an
        amortized-O(#ones) pointer loop (remainder bits may contain
        1s, so terminators can't be taken positionally); remainders
        gather in one fancy-index matmul."""
        if count == 0:
            return np.zeros(0, np.int64)
        bits = self.bits
        ones = np.flatnonzero(bits[self.pos:])
        term = np.empty(count, np.int64)
        start = 0  # relative to self.pos
        j = 0
        nones = len(ones)
        for i in range(count):
            while j < nones and ones[j] < start:
                j += 1
            if j >= nones:
                raise ValueError("truncated FLAC stream (rice)")
            t = int(ones[j])
            term[i] = t
            start = t + 1 + p
            j += 1
        starts = np.empty(count, np.int64)
        starts[0] = 0
        starts[1:] = term[:-1] + 1 + p
        q = term - starts
        if p:
            idx = self.pos + term[:, None] + 1 + np.arange(p)
            if int(idx.max()) >= self.nbits:
                raise ValueError("truncated FLAC stream (rice tail)")
            w = (np.int64(1) << np.arange(p - 1, -1, -1, dtype=np.int64))
            rem = bits[idx].astype(np.int64) @ w
        else:
            rem = np.zeros(count, np.int64)
        self.pos += int(term[-1]) + 1 + p
        z = (q << p) | rem
        return (z >> 1) ^ -(z & 1)  # zigzag unmap


class BitWriter:
    __slots__ = ("chunks",)

    def __init__(self):
        self.chunks: list[np.ndarray] = []

    def write(self, v: int, n: int) -> None:
        if n:
            arr = (v >> np.arange(n - 1, -1, -1, dtype=np.int64)) & 1
            self.chunks.append(arr.astype(np.uint8))

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_bits(self, arr: np.ndarray) -> None:
        self.chunks.append(arr.astype(np.uint8))

    def tobytes(self) -> bytes:
        if not self.chunks:
            return b""
        bits = np.concatenate(self.chunks)
        pad = (-len(bits)) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
        return np.packbits(bits).tobytes()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _utf8_number(br: BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise ValueError("bad FLAC coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def parse_streaminfo(data: bytes) -> dict:
    """Walk the metadata blocks; return the STREAMINFO fields plus the
    byte offset of the first audio frame."""
    if bytes(data[:4]) != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + bytes(data[pos + 1:pos + 4]))
        body = bytes(data[pos + 4:pos + 4 + ln])
        if btype == 0:
            if len(body) != 34:
                raise ValueError("bad STREAMINFO length")
            bits = int.from_bytes(body, "big")

            def f(off, width, total=34 * 8):
                return (bits >> (total - off - width)) & ((1 << width) - 1)

            info = {
                "min_blocksize": f(0, 16), "max_blocksize": f(16, 16),
                "min_framesize": f(32, 24), "max_framesize": f(56, 24),
                "sample_rate": f(80, 20), "channels": f(100, 3) + 1,
                "bits_per_sample": f(103, 5) + 1,
                "total_samples": f(108, 36),
                "md5": body[18:34],
            }
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    info["frames_offset"] = pos
    return info


def _decode_subframe(br: BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad subframe padding bit")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        out = np.full(n, br.read_signed(eff), np.int64)
    elif t == 1:  # VERBATIM
        out = br.read_signed_vec(eff, n)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = br.read_signed_vec(eff, order)
        res = _decode_residual(br, n, order)
        out = _reconstruct_fixed(warm, res, order)
    elif t >= 32:  # LPC
        order = t - 31
        warm = br.read_signed_vec(eff, order)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coef = br.read_signed_vec(prec, order)
        res = _decode_residual(br, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        c = coef  # c[0] multiplies x[i-1]
        for i in range(order, n):  # inherently sequential
            acc = int(np.dot(c, out[i - 1::-1][:order]))
            out[i] = (acc >> shift) + int(res[i - order])
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted


def _decode_residual(br: BitReader, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if n % nparts:
        raise ValueError("partition order does not divide blocksize")
    out = []
    for part in range(nparts):
        cnt = (n >> po) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        p = br.read(pbits)
        if p == escape:
            raw = br.read(5)
            out.append(br.read_signed_vec(raw, cnt))
        else:
            out.append(br.rice_vec(p, cnt))
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def _reconstruct_fixed(warm: np.ndarray, res: np.ndarray,
                       order: int) -> np.ndarray:
    """Residual = order-th finite difference; invert by `order`
    cumulative sums seeded from the warmup's difference pyramid."""
    if order == 0:
        return res.copy() if not len(warm) else \
            np.concatenate([warm, res])
    levels = [warm.astype(np.int64)]
    for _ in range(order):
        levels.append(np.diff(levels[-1]))
    seq = res
    for j in range(order - 1, -1, -1):
        seq = levels[j][-1] + np.cumsum(seq)
    return np.concatenate([warm, seq])


def decode_frames(data: bytes, verify_md5: bool = True):
    """Generator of per-frame (samples int64 (n, ch), sample_rate,
    bps) tuples; CRCs verified per frame."""
    info = parse_streaminfo(data)
    pos = info["frames_offset"]
    total = info["total_samples"]
    done = 0
    while pos < len(data) and (not total or done < total):
        br = BitReader(data, pos)
        if br.read(14) != _SYNC:
            raise ValueError("lost FLAC frame sync")
        if br.read(1):
            raise ValueError("reserved frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved frame bit set")
        _utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = _BS_TABLE[bs_code]
        if sr_code == 0:
            sr = info["sample_rate"]
        elif sr_code == 12:
            sr = br.read(8) * 1000
        elif sr_code == 13:
            sr = br.read(16)
        elif sr_code == 14:
            sr = br.read(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        else:
            sr = _SR_TABLE[sr_code]
        bps = info["bits_per_sample"] if ss_code == 0 else _SS_TABLE.get(ss_code)
        if bps is None:
            raise ValueError("reserved sample size code")
        hdr_bytes = (br.pos + 7) // 8
        if crc8(bytes(data[pos:pos + hdr_bytes])) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            chans = [_decode_subframe(br, n, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            # the SIDE channel carries one extra bit
            if ch_code == 8:    # left/side
                left = _decode_subframe(br, n, bps)
                side = _decode_subframe(br, n, bps + 1)
                chans = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, n, bps + 1)
                right = _decode_subframe(br, n, bps)
                chans = [side + right, right]
            else:               # mid/side
                mid = _decode_subframe(br, n, bps)
                side = _decode_subframe(br, n, bps + 1)
                m2 = (mid << 1) | (side & 1)
                chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        body_bytes = br.pos // 8
        want = br.read(16)
        if crc16(bytes(data[pos:pos + body_bytes])) != want:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos += body_bytes + 2
        done += n
        yield np.stack(chans, axis=1), sr, bps
    if total and done != total:
        raise ValueError(
            f"truncated FLAC stream: {done}/{total} samples")


def decode(data: bytes, verify_md5: bool = True
           ) -> tuple[np.ndarray, int, int]:
    """FLAC stream -> (samples int32 (n_frames, n_channels),
    sample_rate, bits_per_sample). Exact integer PCM — the lossless
    contract the wav<->flac conversion-dedup channel relies on."""
    info = parse_streaminfo(data)
    parts, sr, bps = [], info["sample_rate"], info["bits_per_sample"]
    for samples, fsr, fbps in decode_frames(data, verify_md5=False):
        parts.append(samples)
        sr, bps = fsr, fbps
    if not parts:
        return np.zeros((0, info["channels"]), np.int32), sr, bps
    pcm = np.concatenate(parts).astype(np.int32)
    md5 = info["md5"]
    if verify_md5 and md5 != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(pcm, bps)).digest() != md5:
            raise ValueError("FLAC STREAMINFO MD5 mismatch")
    return pcm, sr, bps


def decode_float_mono(data: bytes) -> tuple[np.ndarray, int]:
    """Convenience for the audio-features path: float32 mono in
    [-1, 1] (channel mean), matching codec.wav_decode's contract."""
    pcm, sr, bps = decode(data)
    scale = float((1 << (bps - 1)) - 1)
    return (pcm.mean(axis=1) / scale).astype(np.float32), sr


def meta(data: bytes) -> dict:
    info = parse_streaminfo(data)
    return {"sample_rate": info["sample_rate"],
            "channels": info["channels"],
            "bits_per_sample": info["bits_per_sample"],
            "total_samples": info["total_samples"]}


def _pcm_bytes(pcm: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian signed samples, bps/8 bytes each (the
    STREAMINFO MD5 input per the spec)."""
    if bps == 16:
        return pcm.astype("<i2").tobytes()
    if bps == 8:
        return pcm.astype("<i1").tobytes()
    if bps == 32:
        return pcm.astype("<i4").tobytes()
    if bps == 24:
        b = pcm.astype("<i4").tobytes()
        a = np.frombuffer(b, np.uint8).reshape(-1, 4)
        return a[:, :3].tobytes()
    raise ValueError(f"unsupported bps {bps} for MD5")


# ---------------------------------------------------------------------------
# encoder (fixture-grade valid subset)
# ---------------------------------------------------------------------------

def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    n = 1
    while v >= (1 << (6 * n + (6 - n))):
        n += 1
    first_mask = (0xFF00 >> (n + 1)) & 0xFF
    body = []
    for _ in range(n):
        body.append(0x80 | (v & 0x3F))
        v >>= 6
    out = [first_mask | v] + body[::-1]
    return bytes(out)


def _best_fixed(x: np.ndarray) -> tuple[int, np.ndarray]:
    """Pick the FIXED order 0-2 minimizing a sum|residual| proxy for
    the Rice cost (plus the 16-bit-warmup overhead per order)."""
    x = x.astype(np.int64)
    best_o, best_r, best_c = 0, x, int(np.abs(x).sum())
    d = x
    for o in (1, 2):
        if len(x) <= o:
            break
        d = np.diff(d)
        c = int(np.abs(d).sum()) + o * 16
        if c < best_c:
            best_o, best_r, best_c = o, d, c
    return best_o, best_r


def _rice_encode(bw: BitWriter, res: np.ndarray, pbits: int = 4) -> None:
    """Single-partition residual: zigzag, pick the cheapest Rice
    parameter (or the raw escape), emit vectorized."""
    n = len(res)
    z = (np.abs(res) << 1) - (res < 0).astype(np.int64)
    escape = (1 << pbits) - 1
    best_p, best_cost = 0, None
    for p in range(escape):
        cost = int((z >> p).sum()) + n * (1 + p)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    raw_bits = max(1, int(z.max()).bit_length() + 1) if n else 1
    raw_cost = 5 + n * raw_bits
    bw.write(0, 2)   # method: 4-bit Rice
    bw.write(0, 4)   # partition order 0
    if best_cost is None or raw_cost < best_cost:
        bw.write(escape, pbits)
        bw.write(raw_bits, 5)
        if n:
            m = ((res[:, None] >> np.arange(raw_bits - 1, -1, -1)) & 1)
            bw.write_bits(m.reshape(-1))
        return
    p = best_p
    bw.write(p, pbits)
    if not n:
        return
    q = z >> p
    total = int(q.sum()) + n * (1 + p)
    bits = np.zeros(total, np.uint8)
    ends = np.cumsum(q + 1 + p)
    term = ends - 1 - p
    bits[term] = 1
    if p:
        idx = term[:, None] + 1 + np.arange(p)
        vals = (z[:, None] >> np.arange(p - 1, -1, -1)) & 1
        bits[idx.reshape(-1)] = vals.reshape(-1).astype(np.uint8)
    bw.write_bits(bits)


def encode(pcm: np.ndarray, sample_rate: int, bps: int = 16,
           blocksize: int = 4096) -> bytes:
    """(n, ch) or (n,) integer samples -> FLAC bytes. 16-bit only
    (the fixture grade); channels coded independently; fixed blocking
    with explicit 16-bit blocksize headers (valid for any size)."""
    x = np.asarray(pcm, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n_total, nch = x.shape
    if bps != 16:
        raise ValueError("subset encoder writes 16-bit only")
    if not (1 <= nch <= 8):
        raise ValueError("1..8 channels")
    if np.abs(x).max(initial=0) > 32767:
        raise ValueError("samples exceed 16-bit range")
    if not 0 < sample_rate < 65536:
        raise ValueError("subset encoder: sample_rate must fit 16 bits")

    frames = bytearray()
    fno = 0
    for st in range(0, n_total, blocksize):
        blk = x[st:st + blocksize]
        n = len(blk)
        bw = BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 1)
        bw.write(0, 1)          # fixed blocking
        bw.write(7, 4)          # blocksize: 16-bit follows
        bw.write(13, 4)         # sample rate: 16-bit Hz follows
        bw.write(nch - 1, 4)    # independent channels
        bw.write(4, 3)          # 16-bit samples
        bw.write(0, 1)
        for b in _utf8_encode(fno):
            bw.write(b, 8)
        bw.write(n - 1, 16)
        bw.write(sample_rate, 16)
        hdr = bw.tobytes()
        bw2 = BitWriter()
        for ch in range(nch):
            col = blk[:, ch]
            if n and (col == col[0]).all():
                bw2.write(0, 1)
                bw2.write(0, 6)   # CONSTANT
                bw2.write(0, 1)
                bw2.write_signed(int(col[0]), 16)
                continue
            order, res = _best_fixed(col)
            bw2.write(0, 1)
            bw2.write(8 + order, 6)  # FIXED
            bw2.write(0, 1)          # no wasted bits
            for w in col[:order]:
                bw2.write_signed(int(w), 16)
            _rice_encode(bw2, res)
        frame = hdr + bytes([crc8(hdr)]) + bw2.tobytes()
        frame += struct.pack(">H", crc16(frame))
        frames += frame
        fno += 1

    md5 = hashlib.md5(_pcm_bytes(x.astype(np.int32), bps)).digest()
    last_n = (n_total % blocksize) or blocksize
    min_bs = min(blocksize, last_n) if n_total else blocksize
    si = BitWriter()
    si.write(min_bs, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total & ((1 << 36) - 1), 36)
    body = si.tobytes() + md5
    assert len(body) == 34
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
            + body + bytes(frames))
