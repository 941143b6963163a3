"""Reference-counted cluster GC — destor's CMA + delete recast as
groupby passes (SURVEY.md §2.9 X1-X3).

  X1 update_manifest (cma.c:17-75): container → last-referencing-job
     table  ⇒ groupby(container_id) max(job_id) aggregate.
  X2 trunc_manifest (cma.c:83-139): containers whose last reference
     <= deleted job are invalid  ⇒ filter on the aggregate.
  X3 do_delete (do_delete.c:23-112): remove invalid containers'
     fingerprints from the index  ⇒ anti-join of the registry against
     the invalid container set (broadcast — the invalid set is small).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def container_refcounts(manifest_ds):
    """(container_id → refs, ref_bytes, max_job) — the CMA manifest."""
    from ray.data.aggregate import Count, Max, Sum
    cols = manifest_ds.select_columns(
        [c for c in ["container_id", "nbytes", "job_id"]
         if c in manifest_ds.schema().names])
    aggs = [Count(alias_name="refs"), Sum("nbytes", alias_name="ref_bytes")]
    if "job_id" in cols.schema().names:
        aggs.append(Max("job_id", alias_name="last_job"))
    return cols.groupby("container_id").aggregate(*aggs)


def invalid_containers(refcounts_ds, delete_job_id: int):
    """X2: containers whose last referencing job <= delete_job_id."""
    return refcounts_ds.filter(
        lambda row: row["last_job"] <= delete_job_id)


def purge_registry(registry_ds, invalid_ids, key: str = "container_id"):
    """X3: anti-join — drop registry rows referencing invalid containers.
    The invalid set is broadcast once (ray.put) and each batch filters
    against it; no shuffle."""
    ids_ref = ray.put(np.asarray(sorted(int(i) for i in invalid_ids), dtype=np.int64))

    def drop(batch: pa.Table) -> pa.Table:
        dead = ray.get(ids_ref)
        col = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isin(col, dead)
        return batch.filter(pa.array(keep))

    return registry_ds.map_batches(drop, batch_format="pyarrow")
