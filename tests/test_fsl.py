"""FSL hashfile reader (S4) — round-trip + conformance tests.

tests/data/conformance_v7.hashfile was produced by the REFERENCE
writer (libhashfile.c hashfile_open4write/add_file/add_chunk compiled
from /root/reference/src/fsl) with a deterministic plan: 5 files, file
f has 3+f chunks, chunk (f,c) has size 1000+37*(f*8+c) and 6-byte
MD5-48 hash bytes (f*41+c*7+k). The parser must reproduce that stream
exactly (fingerprints zero-padded to 20 bytes per read_fsl_trace.c).
"""

import os

import numpy as np
import pytest

from destor_ray.sources import fsl

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "conformance_v7.hashfile")


def _expected_records():
    exp = []
    for f in range(5):
        nch = 3 + f
        fsize = sum(1000 + 37 * (f * 8 + c) for c in range(nch))
        for c in range(nch):
            h = bytes((f * 41 + c * 7 + k) & 0xFF for k in range(6)).ljust(20, b"\0")
            exp.append((f"/conformance/file{f:02d}.bin", fsize, c, h,
                        1000 + 37 * (f * 8 + c)))
    return exp


def test_conformance_vs_reference_writer():
    recs = list(fsl.iter_fsl_records(FIXTURE))
    assert recs == _expected_records()


def test_header_fields():
    with open(FIXTURE, "rb") as f:
        h = fsl.read_header(f)
    assert h.version == 7
    assert h.files == 5
    assert h.chunks == sum(3 + i for i in range(5))
    assert h.chnk_method == fsl.VARIABLE
    assert h.hash_size_bits == 48
    assert h.path_root == "/conformance"


def test_python_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    files = []
    for i in range(4):
        chunks = [(bytes(rng.integers(0, 256, 6, dtype=np.uint8)),
                   int(rng.integers(600, 60000))) for _ in range(1 + i * 3)]
        files.append((f"/r/f{i}", chunks))
    p = fsl.write_fsl_hashfile(str(tmp_path / "t.hashfile"), files)
    recs = list(fsl.iter_fsl_records(p))
    assert len(recs) == sum(len(c) for _, c in files)
    j = 0
    for fpath, chunks in files:
        fsize = sum(sz for _, sz in chunks)
        for ci, (h, sz) in enumerate(chunks):
            assert recs[j] == (fpath, fsize, ci, h.ljust(20, b"\0"), sz)
            j += 1


def test_fsl_to_parquet_and_dedup(ray_session, tmp_path):
    """Ingest path: hashfile → partitioned parquet → Ray exact-dedup
    over fingerprints (the S3/S4 trace-consumption route)."""
    import ray.data
    out = fsl.fsl_to_parquet(FIXTURE, str(tmp_path / "trace"), rows_per_file=7)
    ds = ray.data.read_parquet(out)
    assert ds.count() == 25
    from ray.data.aggregate import Count, Sum
    per_file = ds.groupby("file_path").aggregate(
        Count(alias_name="n_chunks"), Sum("size", alias_name="bytes"))
    df = per_file.to_pandas().sort_values("file_path").reset_index(drop=True)
    assert list(df.n_chunks) == [3, 4, 5, 6, 7]
    # unique fingerprints = dedup over the fp column
    uniq = ds.groupby("fp").aggregate(Count(alias_name="n")).count()
    assert uniq == 25  # all planted hashes distinct in this fixture


def test_truncated_raises(tmp_path):
    data = open(FIXTURE, "rb").read()
    p = tmp_path / "trunc.hashfile"
    p.write_bytes(data[: len(data) // 2])
    with pytest.raises(EOFError):
        list(fsl.iter_fsl_records(str(p)))


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.hashfile"
    p.write_bytes(b"\x00" * 9000)
    with pytest.raises(ValueError):
        list(fsl.iter_fsl_records(str(p)))
