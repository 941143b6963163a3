"""FSL hashfile trace reader/writer (SURVEY.md §2.1 S4).

Parses Stony Brook FSL chunk traces — the binary "hashfile" format of
/root/reference/src/fsl/libhashfile.{h,c} (struct layouts verified
byte-for-byte against the C headers: header 4176 B, header_v3 8288 B,
header_v4 8296 B; file_header 4112/20/88/96 B for v1/v2/v4/v5-7) — and
emits the same record stream destor's read_fsl_trace builds
(read_fsl_trace.c:50-163): per file a (path, size) marker, per chunk a
20-byte zero-padded fingerprint + chunk size.

Versions 1-7 are supported read-side with the exact per-version chunk
layout of hashfile_next_chunk (libhashfile.c:863-935):
  v7 VARIABLE: u32 size + hash [+ u8 cratio (v>=6)]
  v3-6 VARIABLE: u64 size + hash [+ u8 cratio]
  FIXED: size derived from fixed chunk_size (tail = remainder)
  v1/2 VARIABLE: no stored size (reported 0)

The writer emits v7 traces for fixtures/round-trip tests. Ingest for
the engine is `fsl_to_parquet` — the trace becomes partitioned parquet
(the engine's S2/S3 signature-trace form), after which every normal
pipeline applies.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

HASH_FILE_MAGIC = 0xDEADDEAD
MAX_PATH_SIZE = 4096
MAX_SYSID_LEN = 4096

FIXED, VARIABLE = 1, 2
HASH_METHODS = {1: "md5", 2: "sha256", 3: "md5-48", 4: "murmur",
                5: "md5-64", 6: "sha1"}

# packed-struct sizes (verified with gcc against libhashfile.h)
_CHNK_PARAMS_UNION = 44          # union{fixed u32, var_chnking_params 44}
_HDR_V12 = 4176
_HDR_V34 = 8288
_HDR_V567 = 8296
_FH_V1 = 4112
_FH_V2 = 20                      # + pathlen path bytes
_FH_V4 = 88                      # file_header_v3 (used by trace v4) + paths
_FH_V567 = 96                    # file_header_v4 (trace v5-7) + paths
FINGERPRINT_LEN = 20             # destor fingerprint width (destor.h:285)


class FslHeader:
    __slots__ = ("version", "files", "path_root", "chunks", "chnk_method",
                 "fixed_chunk_size", "hsh_method", "hash_size_bits",
                 "sysid", "start_time", "end_time", "bytes")


def _read_exact(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise EOFError(f"truncated hashfile (wanted {n} bytes, got {len(b)})")
    return b


def read_header(f) -> FslHeader:
    raw = _read_exact(f, _HDR_V12)
    magic, version = struct.unpack_from("<II", raw, 0)
    if magic != HASH_FILE_MAGIC:
        raise ValueError(f"bad hashfile magic {magic:#x}")
    if not 1 <= version <= 7:
        raise ValueError(f"unsupported hashfile version {version}")
    h = FslHeader()
    h.version = version
    (h.files,) = struct.unpack_from("<Q", raw, 8)
    h.path_root = raw[16:16 + MAX_PATH_SIZE].split(b"\0", 1)[0].decode(
        "utf-8", "replace")
    off = 16 + MAX_PATH_SIZE
    (h.chunks,) = struct.unpack_from("<Q", raw, off)
    (h.chnk_method,) = struct.unpack_from("<i", raw, off + 8)
    # first member of the params union is the fixed chunk_size u32
    (h.fixed_chunk_size,) = struct.unpack_from("<I", raw, off + 12)
    (h.hsh_method,) = struct.unpack_from("<i", raw, off + 12 + _CHNK_PARAMS_UNION)
    (h.hash_size_bits,) = struct.unpack_from("<I", raw, off + 16 + _CHNK_PARAMS_UNION)
    h.sysid = ""
    h.start_time = h.end_time = h.bytes = 0
    if version >= 3:
        raw2 = _read_exact(f, _HDR_V34 - _HDR_V12)
        h.sysid = raw2[:MAX_SYSID_LEN].split(b"\0", 1)[0].decode("utf-8", "replace")
        h.start_time, h.end_time = struct.unpack_from("<QQ", raw2, MAX_SYSID_LEN)
    if version >= 5:
        (h.bytes,) = struct.unpack("<Q", _read_exact(f, 8))
    return h


def _read_file_header(f, version: int) -> tuple[str, int, int]:
    """→ (path, file_size, n_chunks); mirrors hashfile_next_file."""
    if version == 1:
        raw = _read_exact(f, _FH_V1)
        path = raw[:MAX_PATH_SIZE].split(b"\0", 1)[0].decode("utf-8", "replace")
        size, chunks = struct.unpack_from("<QQ", raw, MAX_PATH_SIZE)
        return path, size, chunks
    if version in (2, 3):
        raw = _read_exact(f, _FH_V2)
        size, chunks, pathlen = struct.unpack("<QQI", raw)
        path = _read_exact(f, pathlen).decode("utf-8", "replace")
        return path, size, chunks
    if version == 4:
        raw = _read_exact(f, _FH_V4)
        size = struct.unpack_from("<Q", raw, 0)[0]
        chunks = struct.unpack_from("<Q", raw, 72)[0]
        pathlen, tlen = struct.unpack_from("<II", raw, 80)
    else:  # 5-7
        raw = _read_exact(f, _FH_V567)
        size = struct.unpack_from("<Q", raw, 0)[0]
        chunks = struct.unpack_from("<Q", raw, 80)[0]
        pathlen, tlen = struct.unpack_from("<II", raw, 88)
    path = _read_exact(f, pathlen).decode("utf-8", "replace")
    if tlen:
        _read_exact(f, tlen)  # symlink target path — skipped like the C reader
    return path, size, chunks


def iter_fsl_records(path: str):
    """Yield (file_path, file_size, chunk_idx, fingerprint20, chunk_size)
    per chunk — destor's trace stream with FILE markers flattened into
    the rows (read_fsl_trace.c:123-150 semantics: fp zero-padded to 20)."""
    with open(path, "rb") as f:
        h = read_header(f)
        hash_bytes = h.hash_size_bits // 8
        has_cratio = h.version >= 6
        for _ in range(h.files):
            fpath, fsize, nchunks = _read_file_header(f, h.version)
            for ci in range(nchunks):
                if h.chnk_method == VARIABLE and h.version >= 7:
                    (csize,) = struct.unpack("<I", _read_exact(f, 4))
                elif h.chnk_method == VARIABLE and h.version >= 3:
                    (csize,) = struct.unpack("<Q", _read_exact(f, 8))
                elif h.chnk_method == FIXED:
                    if ci == nchunks - 1:
                        tail = fsize - (nchunks - 1) * h.fixed_chunk_size
                        csize = min(tail, h.fixed_chunk_size)
                    else:
                        csize = h.fixed_chunk_size
                else:
                    csize = 0  # v1/2 variable: size not stored
                fp = _read_exact(f, hash_bytes)
                if has_cratio:
                    _read_exact(f, 1)
                yield (fpath, fsize, ci,
                       fp.ljust(FINGERPRINT_LEN, b"\0"), int(csize))


FSL_SCHEMA = pa.schema([
    ("file_path", pa.string()),
    ("file_size", pa.int64()),
    ("chunk_idx", pa.int64()),
    ("fp", pa.binary()),
    ("size", pa.int64()),
])


def fsl_to_parquet(src: str, out_dir: str, rows_per_file: int = 100_000) -> str:
    """Convert an FSL hashfile into partitioned parquet (the engine's
    native trace form, S2/S3) — streaming, bounded memory, resumable
    consumers downstream. The hashfile itself is a single sequential
    binary stream (record sizes are data-dependent), so the parse is
    one pass; everything after is Ray-parallel over the parts."""
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    buf = {k: [] for k in FSL_SCHEMA.names}
    part = 0

    def flush():
        nonlocal part
        if not buf["fp"]:
            return
        tbl = pa.table({k: pa.array(v, FSL_SCHEMA.field(k).type)
                        for k, v in buf.items()})
        path = os.path.join(out_dir, f"part-{part:06d}.parquet")
        pq.write_table(tbl, path + ".tmp")
        os.rename(path + ".tmp", path)
        part += 1
        for v in buf.values():
            v.clear()

    for fpath, fsize, ci, fp, csize in iter_fsl_records(src):
        buf["file_path"].append(fpath)
        buf["file_size"].append(fsize)
        buf["chunk_idx"].append(ci)
        buf["fp"].append(fp)
        buf["size"].append(csize)
        if len(buf["fp"]) >= rows_per_file:
            flush()
    flush()
    return out_dir


def write_fsl_hashfile(path: str, files: list[tuple[str, list[tuple[bytes, int]]]],
                       hash_bits: int = 48, hsh_method: int = 3,
                       sysid: str = "destor_ray", start_time: int = 0,
                       end_time: int = 0) -> str:
    """Write a version-7 VARIABLE-chunking hashfile (fixture/round-trip
    writer). `files` = [(path, [(hash_bytes, chunk_size), ...]), ...];
    hashes must be hash_bits//8 long."""
    hash_bytes = hash_bits // 8
    n_chunks = sum(len(cs) for _, cs in files)
    n_bytes = sum(sz for _, cs in files for _, sz in cs)
    with open(path, "wb") as f:
        hdr = bytearray(_HDR_V567)
        struct.pack_into("<II", hdr, 0, HASH_FILE_MAGIC, 7)
        struct.pack_into("<Q", hdr, 8, len(files))
        root = b"/fsl"
        hdr[16:16 + len(root)] = root
        off = 16 + MAX_PATH_SIZE
        struct.pack_into("<Q", hdr, off, n_chunks)
        struct.pack_into("<i", hdr, off + 8, VARIABLE)
        # var_chnking_params: algo=RABIN(3); bounds at union tail
        struct.pack_into("<i", hdr, off + 12, 3)
        struct.pack_into("<II", hdr, off + 12 + 36, 512, 65536)  # min,max csize
        struct.pack_into("<i", hdr, off + 12 + _CHNK_PARAMS_UNION, hsh_method)
        struct.pack_into("<I", hdr, off + 16 + _CHNK_PARAMS_UNION, hash_bits)
        sid = sysid.encode()[:MAX_SYSID_LEN]
        base = off + 20 + _CHNK_PARAMS_UNION
        hdr[base:base + len(sid)] = sid
        struct.pack_into("<QQQ", hdr, base + MAX_SYSID_LEN,
                         start_time, end_time, n_bytes)
        f.write(hdr)
        for fpath, chunks in files:
            pb = fpath.encode()
            fh = bytearray(_FH_V567)
            fsize = sum(sz for _, sz in chunks)
            struct.pack_into("<Q", fh, 0, fsize)
            struct.pack_into("<Q", fh, 80, len(chunks))
            struct.pack_into("<II", fh, 88, len(pb), 0)
            f.write(fh)
            f.write(pb)
            for hsh, sz in chunks:
                if len(hsh) != hash_bytes:
                    raise ValueError(f"hash must be {hash_bytes} bytes")
                f.write(struct.pack("<I", sz))
                f.write(hsh)
                f.write(b"\x01")  # cratio (v>=6)
    return path
