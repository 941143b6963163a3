"""Flagship pipeline: corpus → signatures → candidate edges → clusters.

Ray-Data-first shape (SURVEY.md §3.4):

  read_parquet(corpus)                        [S1]
   → map_batches(SignatureStage)              [C*, H1, F*]  stateless
   → explode bands → groupby(band_key)        [D3/D4]       shuffle #1
       → in-group verify (thumb PSNR)         [D5/T5]
   → union exact edges (groupby sha1)         [D2]          shuffle #2
   → hash-to-min connected components         [§7.4.1]      shuffles #3..
   → (image_id, cluster_id) assignment

All stages stream; nothing materializes the full corpus. Edges carry
only ids + a float, label propagation carries only id pairs — the wide
`bytes` column never crosses a shuffle.
"""

from __future__ import annotations

import ray.data

from ..config import EngineConfig
from ..stages import candidates, cluster, exact
from ..stages.signature import SignatureStage


def signatures_from_corpus(corpus_ds, cfg: EngineConfig | None = None):
    cfg = cfg or EngineConfig()
    return corpus_ds.map_batches(
        SignatureStage(cfg), batch_format="pyarrow",
        batch_size=256, concurrency=None)


def buckets_for(n_rows: int) -> int:
    """Band-shuffle bucket count (the band table is ~18 rows per corpus
    row). Too few buckets makes per-bucket pandas work superlinear; too
    many pays per-group scheduling."""
    return max(64, min(4096, n_rows // 200))


def cc_buckets_for(n_rows: int) -> int:
    """Connected-components bucket count — pair tables are far smaller
    than the band table; oversharding costs more than it saves."""
    return max(64, min(512, n_rows // 1000))


def dedup_pipeline(corpus_ds, cfg: EngineConfig | None = None,
                   cc_rounds: int = 2, n_rows_hint: int | None = None,
                   driver_cc_threshold: int = 10_000_000, ids_ds=None,
                   stage_times: dict | None = None):
    """corpus Dataset → cluster assignment Dataset (image_id, cluster_id).

    When `ids_ds` (a Dataset with just the `image_id` column, e.g. a
    column-pruned re-read of the corpus) is supplied, the signature
    stage has a SINGLE consumer — the band shuffle — so the whole
    read → signature → bands → verify path fuses into one streaming
    execution with no signature materialization (the scale path; saves
    an object-store round trip of the signature table). Without it the
    signature table fans out to two consumers (LSH edges, id list) and
    must be pinned, or Ray Data re-executes the stage per consumer.
    The checkpointed job pipeline (pipelines/job.py) writes signatures
    to parquet instead — the path for corpora that exceed the object
    store."""
    import pyarrow as pa

    cfg = cfg or EngineConfig()
    sigs = signatures_from_corpus(corpus_ds, cfg)
    rendezvous = cfg.lsh.verify_mode == "rendezvous"
    if ids_ds is None or rendezvous:
        # rendezvous consumes the signature table three times (bands +
        # both endpoint exchanges) — it must be pinned regardless of
        # ids_ds; the checkpointed job's parquet signatures serve the
        # same role at corpus sizes beyond the object store
        sigs = sigs.materialize()
        ids = (ids_ds if ids_ds is not None
               else sigs.select_columns(["image_id"]))
        n_rows = n_rows_hint if n_rows_hint is not None else sigs.count()
    else:
        ids = ids_ds
        n_rows = n_rows_hint if n_rows_hint is not None else corpus_ds.count()
    nb = buckets_for(n_rows)
    nb_cc = cc_buckets_for(n_rows)
    # exact dedup rides the sha1 band channel inside candidate_edges —
    # no separate D2 shuffle in the flagship path (exact.exact_edges
    # remains the standalone operator)
    edges = (candidates.candidate_edges_rendezvous(sigs, cfg, num_buckets=nb)
             if rendezvous
             else candidates.candidate_edges(sigs, cfg, num_buckets=nb))
    if driver_cc_threshold <= 0:
        # caller opted into the distributed route up front (the 10^12-row
        # configuration): materialize edges once, run hash-to-min CC
        return assign_clusters_strings(ids, edges.materialize(),
                                       rounds=cc_rounds, num_buckets=nb_cc)
    # optimistic single pass: STREAM edge batches to the driver (no
    # materialize barrier — blocks arrive as the verify buckets finish)
    # until the threshold is exceeded. 10M edges ≈ 240 MB, driver-safe.
    # Only past-threshold edge sets pay the fallback re-execution + the
    # distributed hash-to-min shuffles (tested equal).
    import time as _time
    t0 = _time.time()
    pulled: list = []
    n_edges = 0
    for b in edges.iter_batches(batch_format="pyarrow"):
        pulled.append(b)
        n_edges += b.num_rows
        if n_edges > driver_cc_threshold:
            pulled = None
            break
    if stage_times is not None:  # per-stage wall times (bench reporting)
        stage_times["sig_bands_verify_pull"] = round(_time.time() - t0, 3)
        stage_times["n_edges"] = n_edges
    if pulled is not None:
        t1 = _time.time()
        out = _assign_clusters_driver(ids, pulled)
        if stage_times is not None:
            stage_times["driver_cc"] = round(_time.time() - t1, 3)
        return out
    return assign_clusters_strings(ids, edges.materialize(),
                                   rounds=cc_rounds, num_buckets=nb_cc)


def _assign_clusters_driver(image_ids_ds, edges):
    """`edges` is either a Dataset or a pre-pulled list of pyarrow batches
    (dedup_pipeline's single-pass route decision)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..stages.cluster import connected_components_numpy
    batches = (edges if isinstance(edges, list)
               else edges.iter_batches(batch_format="pyarrow"))
    ls, rs = [], []
    for b in batches:
        ls.append(b["left_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        rs.append(b["right_id"].to_numpy(zero_copy_only=False).astype(np.int64))
    if ls:
        nodes, labels = connected_components_numpy(
            np.concatenate(ls), np.concatenate(rs))
    else:
        nodes = np.empty(0, dtype=np.int64)
        labels = np.empty(0, dtype=np.int64)
    ref = ray.put((nodes, labels))  # broadcast once; looked up per batch

    def assign(batch: pa.Table) -> pa.Table:
        nd, lb = ray.get(ref)
        nids = candidates.parse_nid(batch["image_id"].to_pylist())
        out = nids.copy()
        if len(nd):
            pos = np.searchsorted(nd, nids)
            pos = np.minimum(pos, len(nd) - 1)
            hit = nd[pos] == nids
            out[hit] = lb[pos[hit]]
        return pa.table({
            "image_id": batch["image_id"],
            "cluster_id": candidates.format_nid(out),
        })

    return image_ids_ds.map_batches(assign, batch_format="pyarrow")


def assign_clusters_strings(image_ids_ds, edges_int_ds, rounds: int = 2,
                            num_buckets: int = 64):
    """Cluster assignment keyed by image_id strings: converts to int64
    node ids at the boundary, runs the int-keyed CC, formats back."""
    import pyarrow as pa

    def to_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(
            candidates.parse_nid(batch["image_id"].to_pylist()), pa.int64())})

    ids = image_ids_ds.map_batches(to_nodes, batch_format="pyarrow")
    assign = cluster.assign_clusters(ids, edges_int_ds, rounds=rounds,
                                     num_buckets=num_buckets)

    def to_strings(batch: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": candidates.format_nid(
                batch["node"].to_numpy(zero_copy_only=False)),
            "cluster_id": candidates.format_nid(
                batch["cluster"].to_numpy(zero_copy_only=False)),
        })

    return assign.map_batches(to_strings, batch_format="pyarrow")


def dedup_pipeline_from_dir(corpus_dir: str, cfg: EngineConfig | None = None,
                            stage_times: dict | None = None):
    import pyarrow.dataset as pads
    ds = ray.data.read_parquet(corpus_dir)
    n_rows = pads.dataset(corpus_dir).count_rows()  # metadata-only
    # column-pruned id read → single-consumer signature stage (fused,
    # never materialized); the id list itself is a cheap 1-column scan
    ids = ray.data.read_parquet(corpus_dir, columns=["image_id"])
    return dedup_pipeline(ds, cfg, n_rows_hint=n_rows, ids_ds=ids,
                          stage_times=stage_times)


def quality_rep_manifest(assignment_ds, corpus_dir: str,
                         num_buckets: int = 64):
    """(cluster_id, rep_id, n_members, total_bytes, stored_bytes,
    saved_bytes) — TIER DEDUP's write decision: per near-dup cluster,
    keep the BEST-QUALITY member (max pixel area w×h, ties to the
    lexicographically-smallest image_id — deterministic, so retries and
    partitionings agree) and account the storage the tier saves. This is
    destor's filter-phase unique/duplicate accounting (W2/W5,
    /root/reference/src/filter_phase.c:119-135, do_backup.c:108-114)
    recast for a training corpus where the keeper is chosen by QUALITY
    rather than arrival order (CC-Net keep-best, as curation.
    keep_best_dedup does for text).

    Scale shape: one corpus scan emits 24-byte (id, area, nbytes)
    metadata rows (at ingest these would ride the signature stage's
    existing scan); one id-keyed tag-and-union exchange attaches
    cluster ids; one cluster-keyed exchange picks winners vectorized
    (sort + segment-first, no Python loop over clusters). The payload
    bytes column never crosses a shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.grouped import bucketed_group_map

    def meta_rows(batch: pa.Table) -> pa.Table:
        area = (batch["w"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                * batch["h"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        nbytes = pc.binary_length(batch["bytes"]).cast(pa.int64())
        n = len(batch)
        return pa.table({
            "image_id": batch["image_id"],
            "cluster_id": pa.array([""] * n, pa.string()),
            "area": pa.array(area, pa.int64()),
            "nbytes": nbytes,
        })

    def assign_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        z = pa.array(np.full(n, -1), pa.int64())
        return pa.table({
            "image_id": batch["image_id"],
            "cluster_id": batch["cluster_id"].cast(pa.string()),
            "area": z,
            "nbytes": z,
        })

    meta = ray.data.read_parquet(
        corpus_dir, columns=["image_id", "w", "h", "bytes"]
    ).map_batches(meta_rows, batch_format="pyarrow")
    tagged = meta.union(assignment_ds.map_batches(
        assign_rows, batch_format="pyarrow"))

    def merge_by_id(df: pd.DataFrame) -> pa.Table:
        is_meta = df["area"].to_numpy() >= 0
        m = df[is_meta]
        a = df[~is_meta]
        j = m.merge(a[["image_id", "cluster_id"]], on="image_id",
                    how="inner", suffixes=("_x", ""))
        return pa.table({
            "cluster_id": pa.array(j["cluster_id"].tolist(), pa.string()),
            "image_id": pa.array(j["image_id"].tolist(), pa.string()),
            "area": pa.array(j["area"].to_numpy(np.int64)),
            "nbytes": pa.array(j["nbytes"].to_numpy(np.int64)),
        })

    members = bucketed_group_map(tagged, "image_id", merge_by_id,
                                 num_buckets=num_buckets)

    def pick_reps(df: pd.DataFrame) -> pa.Table:
        cid_obj = np.asarray(df["cluster_id"].tolist(), dtype=object)
        # factorize-by-sort so equal cluster ids share a code and codes
        # sort like the ids (determinism only needs grouping, not order)
        cid = np.searchsorted(np.unique(cid_obj), cid_obj)
        area = df["area"].to_numpy(np.int64)
        ids = np.asarray(df["image_id"].tolist(), dtype=object)
        nb = df["nbytes"].to_numpy(np.int64)
        # zero-padded ids sort lexicographically == numerically
        id_rank = np.argsort(np.argsort(ids, kind="stable"), kind="stable")
        order = np.lexsort((id_rank, -area, cid))
        cid_s, nb_s = cid[order], nb[order]
        first = np.zeros(len(cid_s), bool)
        if len(cid_s):
            first[0] = True
            first[1:] = cid_s[1:] != cid_s[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(cid_s))
        total = np.add.reduceat(nb_s, starts) if len(starts) else nb_s[:0]
        stored = nb_s[starts]
        return pa.table({
            "cluster_id": pa.array(cid_obj[order][starts].tolist(),
                                   pa.string()),
            "rep_id": pa.array(ids[order][starts].tolist(), pa.string()),
            "n_members": pa.array(ends - starts, pa.int64()),
            "total_bytes": pa.array(total, pa.int64()),
            "stored_bytes": pa.array(stored, pa.int64()),
            "saved_bytes": pa.array(total - stored, pa.int64()),
        })

    return bucketed_group_map(members, "cluster_id", pick_reps,
                              num_buckets=max(16, num_buckets // 4))
