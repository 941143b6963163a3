"""WebDataset-style tar-shard source and sink (SURVEY.md §2.1 S1/S5
recast for training-data interchange).

WebDataset shards are plain POSIX tar files whose members group into
samples by path-up-to-the-first-dot (directories kept):
`00/000123.jpg` + `00/000123.txt` + `00/000123.json` is one sample
with three fields keyed by extension. It is the standard
sharded layout for image+caption training corpora (used by the
open-source webdataset library and the large public crawls), chosen
precisely because a shard is a sequential read and shards parallelize
trivially — the same properties destor exploits with its container
files (destor/src/containerstore.c: fixed-size sequential containers
as the unit of IO).

Source: `read_webdataset(paths)` — one Ray task per shard (flat_map
over the shard list), stdlib tarfile streaming parse, rows
(sample_id, shard, <ext>: binary ...). At 100 TB the shard list IS
the partition plan: shards are read sequentially exactly once, no
byte-range seeks, and a failed task re-reads only its shard.

Sink: `write_webdataset(ds, out_dir, ...)` — map_batches writes one
`shard-<NNNNN>-<block>.tar` per batch (deterministic member order,
512-byte tar framing via stdlib), so output sharding follows block
structure, each task writes its own file (no cross-task append), and
a resumed run can skip finished shards — the resumable-output
discipline the brief requires.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pyarrow as pa


def iter_tar_samples(data: bytes):
    """Yield (sample_id, {ext: bytes}) groups from one tar shard's
    bytes, grouping consecutive members by basename prefix (the
    webdataset convention: extension = everything after the FIRST
    dot, so `a.seg.png` keys as field `seg.png`)."""
    tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
    cur_key = None
    fields: dict[str, bytes] = {}
    for member in tf:
        if not member.isfile():
            continue
        dirn, name = os.path.split(member.name)
        if "." not in name:
            stem, ext = name, ""
        else:
            stem, ext = name.split(".", 1)
        key = f"{dirn}/{stem}" if dirn else stem
        if key != cur_key and cur_key is not None:
            yield cur_key, fields
            fields = {}
        cur_key = key
        fields[ext] = tf.extractfile(member).read()
    if cur_key is not None:
        yield cur_key, fields


def read_webdataset(shard_paths: list[str], fields: list[str],
                    parallelism: int = -1):
    """Dataset over webdataset tar shards: one row per sample with
    columns (sample_id: string, shard: string, <field>: binary ...).
    Missing fields decode as empty bytes. One task per shard — the
    shard list is the partition plan."""
    import ray.data

    shards = ray.data.from_items(
        [{"path": p} for p in shard_paths],
        override_num_blocks=(len(shard_paths) if parallelism == -1
                             else parallelism))

    def parse(row: dict):
        path = row["path"]
        with open(path, "rb") as f:
            data = f.read()
        shard = os.path.basename(path)
        for key, fmap in iter_tar_samples(data):
            out = {"sample_id": key, "shard": shard}
            for fld in fields:
                out[fld] = fmap.get(fld, b"")
            yield out

    return shards.flat_map(parse)


def _tar_bytes(names_blobs: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:",
                      format=tarfile.USTAR_FORMAT) as tf:
        for name, blob in names_blobs:
            info = tarfile.TarInfo(name=name)
            info.size = len(blob)
            info.mtime = 0  # deterministic bytes
            tf.addfile(info, io.BytesIO(blob))
    return buf.getvalue()


def write_webdataset(ds, out_dir: str, id_col: str,
                     field_cols: dict[str, str],
                     samples_per_shard: int = 1024) -> list[str]:
    """Write a Dataset as webdataset tar shards: `field_cols` maps
    column → member extension (e.g. {"bytes": "png", "caption":
    "txt"}). Each map task writes its own `shard-<taskid>-<n>.tar`
    files of <= samples_per_shard samples — no cross-task appends, so
    a re-run of one failed block rewrites only that block's shards.
    Returns the shard paths (driver-side list of file names only)."""
    import ray.data  # noqa: F401

    os.makedirs(out_dir, exist_ok=True)
    cols = [id_col] + list(field_cols)

    def write_block(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        blobs = {c: batch[c].to_pylist() for c in field_cols}
        paths = []
        for s0 in range(0, len(ids), samples_per_shard):
            members = []
            for i in range(s0, min(s0 + samples_per_shard, len(ids))):
                for col, ext in field_cols.items():
                    v = blobs[col][i]
                    if isinstance(v, str):
                        v = v.encode()
                    members.append((f"{ids[i]}.{ext}", v))
            data = _tar_bytes(members)
            # deterministic per-content shard name: no cross-task
            # coordination, identical bytes on retry. CONTENT-ADDRESSED
            # semantics: byte-identical shards coalesce to one file
            # (the dedup-engine convention — destor's containers are
            # fingerprint-keyed the same way); a same-name shard with
            # DIFFERING bytes (a 64-bit hash-prefix collision) would
            # silently lose data, so it errors instead.
            tag = hashlib.sha1(data).hexdigest()[:16]
            path = os.path.join(out_dir, f"shard-{tag}.tar")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    if f.read() != data:
                        raise ValueError(
                            f"shard name collision with differing "
                            f"content at {path}")
                paths.append(path)
                continue
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            paths.append(path)
        return pa.table({"shard_path": pa.array(paths, pa.string())})

    out = ds.select_columns(cols).map_batches(
        write_block, batch_format="pyarrow",
        batch_size=samples_per_shard)
    # coalesced (byte-identical) shards appear once
    return sorted(set(out.to_pandas()["shard_path"].tolist()))
