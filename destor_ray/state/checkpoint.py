"""Per-stage checkpoint + lineage for resumable jobs.

Each stage writes its output as partitioned parquet under
<workdir>/<stage>/ and, on success, a `_lineage.json` recording the
config hash, input identity, row count and wall time. A re-run with the
same config hash skips the stage and reads the parquet back
(BASELINE.json north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

This is the engine's analog of destor's trace files (-t,
/root/reference/src/trace_phase.c:96-142 — re-run dedup without
re-chunking) and of its kv-store/stat persistence
(kvstore_htable.c:102-153, destor.c:183-215), but written per stage,
atomically, and safe to resume mid-job.
"""

from __future__ import annotations

import json
import os
import time

LINEAGE = "_lineage.json"


def stage_dir(workdir: str, stage: str) -> str:
    return os.path.join(workdir, stage)


def load_lineage(workdir: str, stage: str) -> dict | None:
    path = os.path.join(stage_dir(workdir, stage), LINEAGE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def stage_complete(workdir: str, stage: str, config_hash: str,
                   input_id: str) -> bool:
    lin = load_lineage(workdir, stage)
    return (lin is not None and lin.get("config_hash") == config_hash
            and lin.get("input_id") == input_id)


def run_stage(workdir: str, stage: str, config_hash: str, input_id: str,
              producer, reader=None, force: bool = False):
    """Run (or resume) one stage.

    producer(out_dir) → writes parquet into out_dir, returns row count
    (or None). reader(out_dir) → Dataset (default: read_parquet).
    Returns (dataset, resumed: bool).
    """
    import ray.data

    out = stage_dir(workdir, stage)
    if reader is None:
        reader = ray.data.read_parquet
    if not force and stage_complete(workdir, stage, config_hash, input_id):
        return reader(out), True
    # clean partial output, rerun
    if os.path.exists(out):
        import shutil
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    t0 = time.time()
    rows = producer(out)
    lineage = {
        "stage": stage,
        "config_hash": config_hash,
        "input_id": input_id,
        "rows": rows,
        "wall_sec": round(time.time() - t0, 3),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    tmp = os.path.join(out, LINEAGE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(lineage, f, indent=1)
    os.replace(tmp, os.path.join(out, LINEAGE))
    return reader(out), False


def input_identity(path: str) -> str:
    """Cheap input fingerprint: globally sorted (root-relative path, size,
    mtime_ns) of every parquet part. Including the relative path and the
    mtime means a file rewritten in place with unchanged size, or parts
    rearranged across subdirectories, produces a DIFFERENT identity, so a
    resumed job recomputes instead of silently reading stale parquet."""
    import hashlib
    entries = []
    for root, _, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                full = os.path.join(root, fn)
                st = os.stat(full)
                rel = os.path.relpath(full, path)
                entries.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    entries.sort()  # os.walk order must not perturb the hash
    return hashlib.sha1(";".join(entries).encode()).hexdigest()[:16]
