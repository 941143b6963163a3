"""The full backup-job pipeline with per-stage checkpointing — the
engine analog of `destor /path` (SURVEY.md §3.1/§3.4):

  signatures → edges → clusters → manifest → metrics

Each stage persists partitioned parquet + lineage under a workdir and
resumes without recompute (state/checkpoint.py). The manifest is the
recipe analog (row → cluster, container, order); metrics reproduce
destor's backup.log / restore.log numbers (do_backup.c:177-207,
do_restore.c:267-283): dedup ratio, rewrite ratios per algorithm, CFL,
container reads + speed factor per restore cache.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import EngineConfig
from ..stages import candidates, cluster, exact, restore, rewrite
from ..stages.signature import SignatureStage
from ..state import checkpoint as ckpt


def _write_parquet(ds, out_dir: str) -> int:
    ds.write_parquet(out_dir)
    return None  # row count not cheaply available without a second pass


def run_backup_job(corpus_dir: str, workdir: str,
                   cfg: EngineConfig | None = None,
                   force: bool = False, job_id: int = 0) -> dict:
    """Run (or resume) the full job; returns {stage: (path, resumed)} plus
    the metrics dict.

    `job_id` models destor's backup sequence: the HAR pass persists this
    job's sparse-container list and inherits job_id-1's
    (har_rewrite.c:17-59 cross-run state)."""
    cfg = cfg or EngineConfig()
    chash = cfg.config_hash()
    input_id = ckpt.input_identity(corpus_dir)
    os.makedirs(workdir, exist_ok=True)
    status: dict = {"workdir": workdir, "resumed": {}}

    # ---- stage 1: signatures (the "trace" checkpoint, S2/S3 analog) ----
    def produce_sigs(out: str):
        ds = ray.data.read_parquet(corpus_dir)
        sigs = ds.map_batches(SignatureStage(cfg), batch_format="pyarrow",
                              batch_size=256)
        return _write_parquet(sigs, out)

    sigs, resumed = ckpt.run_stage(workdir, "signatures", chash, input_id,
                                   produce_sigs, force=force)
    status["resumed"]["signatures"] = resumed

    # ---- stage 2: verified edges ----
    def produce_edges(out: str):
        # exact pairs ride the sha1 band channel inside candidate_edges
        return _write_parquet(candidates.candidate_edges(sigs, cfg), out)

    edges, resumed = ckpt.run_stage(workdir, "edges", chash, input_id,
                                    produce_edges, force=force)
    status["resumed"]["edges"] = resumed

    # ---- stage 3: cluster assignment ----
    def produce_clusters(out: str):
        from .dedup import _assign_clusters_driver, assign_clusters_strings
        ids = sigs.select_columns(["image_id"])
        if edges.count() <= 10_000_000:
            assign = _assign_clusters_driver(ids, edges)
        else:
            assign = assign_clusters_strings(ids, edges)
        return _write_parquet(assign, out)

    assign, resumed = ckpt.run_stage(workdir, "clusters", chash, input_id,
                                     produce_clusters, force=force)
    status["resumed"]["clusters"] = resumed

    # ---- stage 4: manifest (recipe analog, W4) ----
    def produce_manifest(out: str):
        man = build_manifest(assign, sigs, cfg)
        return _write_parquet(man, out)

    manifest, resumed = ckpt.run_stage(workdir, "manifest", chash, input_id,
                                       produce_manifest, force=force)
    status["resumed"]["manifest"] = resumed

    # ---- stage 5: metrics (backup.log / restore.log analog) ----
    metrics_path = os.path.join(workdir, "metrics.json")
    if force or not ckpt.stage_complete(workdir, "metrics", chash, input_id):
        metrics = job_metrics(manifest, cfg)
        metrics["har"] = har_cross_run_pass(manifest, workdir, job_id, cfg)
        mdir = ckpt.stage_dir(workdir, "metrics")
        os.makedirs(mdir, exist_ok=True)
        with open(metrics_path, "w") as f:
            json.dump(metrics, f, indent=1)
        with open(os.path.join(mdir, ckpt.LINEAGE), "w") as f:
            json.dump({"stage": "metrics", "config_hash": chash,
                       "input_id": input_id}, f)
        status["resumed"]["metrics"] = False
    else:
        with open(metrics_path) as f:
            metrics = json.load(f)
        status["resumed"]["metrics"] = True

    # per-stage wall times from lineage (destor's per-phase throughput,
    # do_backup.c:136-153) + backup throughput MB/s (do_backup.c:116-117)
    stage_wall = {}
    for stage in ["signatures", "edges", "clusters", "manifest"]:
        lin = ckpt.load_lineage(workdir, stage)
        if lin and lin.get("wall_sec") is not None:
            stage_wall[stage] = lin["wall_sec"]
    metrics["stage_wall_sec"] = stage_wall
    total_wall = sum(stage_wall.values()) or None
    if total_wall and metrics.get("data_size"):
        metrics["backup_throughput_mb_s"] = round(
            metrics["data_size"] / (1024 * 1024 * total_wall), 3)
    with open(metrics_path, "w") as f:
        json.dump(metrics, f, indent=1)

    status["metrics"] = metrics
    return status


def build_manifest(assign_ds, sigs_ds, cfg: EngineConfig | None = None):
    """Join cluster assignment with per-row sizes; derive container ids.

    container_id = representative-row-index // container_rows — the
    physical locality unit (a container holds `container_rows`
    consecutive representatives, mirroring destor's append-order 4 MB
    containers, containerstore.c:397-421). Pure function of the
    cluster id — no extra shuffle.
    """
    cfg = cfg or EngineConfig()
    rows_per = cfg.container_rows
    sizes = sigs_ds.select_columns(["image_id", "nbytes"])
    # join partitions sized to the cluster (clamped below schedulable
    # CPUs — hash-shuffle aggregator actors can't start otherwise, see
    # NOTES.md) and to the data (≥1 partition per ~64k rows)
    import ray as _ray
    cpus = int(_ray.cluster_resources().get("CPU", 8))
    nparts = max(4, min(max(cpus * 3 // 4, 4), 64))
    joined = assign_ds.join(sizes, "inner", num_partitions=nparts,
                            on=("image_id",))

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        cl = batch["cluster_id"].to_pylist()
        ridx = np.array([int(i[3:]) for i in ids], dtype=np.int64)
        cidx = np.array([int(c[3:]) for c in cl], dtype=np.int64)
        is_dup = ridx != cidx
        container = cidx // rows_per
        return pa.table({
            "image_id": batch["image_id"],
            "cluster_id": batch["cluster_id"],
            "nbytes": batch["nbytes"],
            "row_idx": pa.array(ridx, pa.int64()),
            "is_dup": pa.array(is_dup, pa.bool_()),
            "container_id": pa.array(container, pa.int64()),
        })

    return joined.map_batches(derive, batch_format="pyarrow")


def _partition_metrics(df: pd.DataFrame, cfg: EngineConfig) -> pa.Table:
    """Per-partition rewrite + restore metrics over the ordered stream."""
    df = df.sort_values("row_idx", kind="stable")
    sizes = df["nbytes"].to_numpy().astype(np.int64)
    is_dup = df["is_dup"].to_numpy()
    containers = df["container_id"].to_numpy().astype(np.int64)
    # rewrite-phase view: duplicates reference their container; uniques are
    # TEMPORARY (written fresh)
    rw_ids = np.where(is_dup, containers, rewrite.TEMPORARY_ID)
    # restore view: every chunk is read from its container
    rs_ids = containers
    data_size = int(sizes.sum())
    stored = int(sizes[~is_dup].sum())
    rcfg = cfg.rewrite
    cfl_flags = rewrite.cfl_rewrite_flags(rw_ids, sizes,
                                          usage_threshold=rcfg.cfl_usage_threshold,
                                          buffer_size=rcfg.window)
    cbr_flags = rewrite.cbr_rewrite_flags(rw_ids, sizes, window=rcfg.window,
                                          rewrite_limit=rcfg.cbr_limit)
    cap_flags = rewrite.cap_rewrite_flags(rw_ids, sizes, window=rcfg.window,
                                          capping_level=rcfg.cap_level)
    (_, _, _, har_sparse), sparse_ids = rewrite.har_utilization(
        rw_ids, sizes, rcfg.har_utilization, rcfg.har_rewrite_limit, data_size)
    cfl, ocf, ccf = rewrite.cfl_monitor(rs_ids, sizes, cfg.restore.cache_size)
    reads_lru = restore.lru_restore_sim(rs_ids, cfg.restore.cache_size)
    reads_opt = restore.opt_restore_sim(rs_ids, cfg.restore.cache_size,
                                        cfg.restore.opt_window)
    reads_asm = restore.asm_restore_sim(rs_ids, sizes, cfg.restore.cache_size)
    part = int(df["part"].iloc[0])
    return pa.table({
        "part": pa.array([part], pa.int64()),
        "n_rows": pa.array([len(df)], pa.int64()),
        "data_size": pa.array([data_size], pa.int64()),
        "stored_size": pa.array([stored], pa.int64()),
        "dup_rows": pa.array([int(is_dup.sum())], pa.int64()),
        "cfl_rewrites": pa.array([int(cfl_flags.sum())], pa.int64()),
        "cbr_rewrites": pa.array([int(cbr_flags.sum())], pa.int64()),
        "cap_rewrites": pa.array([int(cap_flags.sum())], pa.int64()),
        "har_sparse_containers": pa.array([len(sparse_ids)], pa.int64()),
        "cfl_monitor": pa.array([cfl], pa.float64()),
        "reads_lru": pa.array([reads_lru], pa.int64()),
        "reads_opt": pa.array([reads_opt], pa.int64()),
        "reads_asm": pa.array([reads_asm], pa.int64()),
    })


def partition_metrics(manifest_ds, cfg: EngineConfig | None = None,
                      partition_rows: int = 4096):
    """(part → rewrite/restore metrics) Dataset; partitions are contiguous
    row-index ranges (the restore order)."""
    cfg = cfg or EngineConfig()

    def add_part(batch: pa.Table) -> pa.Table:
        part = pa.array(
            np.asarray(batch["row_idx"].to_numpy(zero_copy_only=False)) // partition_rows,
            pa.int64())
        return batch.append_column("part", part)

    withp = manifest_ds.map_batches(add_part, batch_format="pyarrow")
    return withp.groupby("part").map_groups(
        lambda df: _partition_metrics(df, cfg), batch_format="pandas")


def job_metrics(manifest_ds, cfg: EngineConfig | None = None) -> dict:
    """Aggregate to destor's backup.log/restore.log shape
    (do_backup.c:99-209, do_restore.c:247-283)."""
    cfg = cfg or EngineConfig()
    pm = partition_metrics(manifest_ds, cfg).to_pandas()
    data = int(pm.data_size.sum())
    stored = int(pm.stored_size.sum())
    out = {
        "n_rows": int(pm.n_rows.sum()),
        "data_size": data,
        "stored_size": stored,
        "dedup_ratio": round((data - stored) / data, 6) if data else 0.0,
        "dup_rows": int(pm.dup_rows.sum()),
        "rewrite": {
            "cfl": int(pm.cfl_rewrites.sum()),
            "cbr": int(pm.cbr_rewrites.sum()),
            "cap": int(pm.cap_rewrites.sum()),
            "har_sparse_containers": int(pm.har_sparse_containers.sum()),
        },
        "cfl_monitor_mean": round(float(pm.cfl_monitor.mean()), 6),
        "restore": {},
        "partitions": len(pm),
    }
    for algo in ["lru", "opt", "asm"]:
        reads = int(pm[f"reads_{algo}"].sum())
        out["restore"][algo] = {
            "read_container_num": reads,
            "speed_factor": round(restore.speed_factor(data, reads), 4),
        }
    return out


def har_cross_run_pass(manifest_ds, workdir: str, job_id: int,
                       cfg: EngineConfig | None = None) -> dict:
    """Global HAR state across jobs (har_rewrite.c:17-59, close_har +
    har_check): aggregate container utilization over the whole manifest
    (one vectorized groupby), select sparse containers with the close_har
    trim, persist them for job_id, and count this job's duplicate
    references into the PREVIOUS job's sparse set (the chunks destor
    would flag CHUNK_SPARSE)."""
    import pyarrow.compute as pc

    cfg = cfg or EngineConfig()
    from ray.data.aggregate import Sum
    agg = manifest_ds.groupby("container_id").aggregate(
        Sum("nbytes", alias_name="ref_bytes")).to_pandas()
    (uniq, tot, util, sel), sparse_ids = rewrite.har_select_sparse(
        agg.container_id.to_numpy(), agg.ref_bytes.to_numpy(),
        cfg.rewrite.har_utilization, cfg.rewrite.har_rewrite_limit)

    har_dir = os.path.join(workdir, "har")
    os.makedirs(har_dir, exist_ok=True)
    prev_path = os.path.join(har_dir, f"bv{job_id - 1}.sparse.json")
    inherited: set[int] = set()
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            inherited = set(json.load(f)["sparse_containers"])

    # har_check analog: duplicate rows referencing inherited sparse containers
    sparse_hits = 0
    if inherited:
        import numpy as _np
        dead = _np.asarray(sorted(inherited), dtype=_np.int64)

        def count_hits(batch: pa.Table) -> pa.Table:
            cid = batch["container_id"].to_numpy(zero_copy_only=False)
            dup = batch["is_dup"].to_numpy(zero_copy_only=False)
            n = int((_np.isin(cid, dead) & dup).sum())
            return pa.table({"hits": pa.array([n], pa.int64())})

        hits_ds = manifest_ds.map_batches(count_hits, batch_format="pyarrow")
        sparse_hits = int(hits_ds.to_pandas()["hits"].sum())

    cur_path = os.path.join(har_dir, f"bv{job_id}.sparse.json")
    tmp = cur_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"job_id": job_id,
                   "sparse_containers": [int(i) for i in sparse_ids]}, f)
    os.replace(tmp, cur_path)

    inherited_sparse_num = len(inherited & set(int(i) for i in uniq[sel]))
    return {
        "total_container_num": int(len(uniq)),
        "sparse_container_num": int(sel.sum()),
        "inherited_sparse_num": inherited_sparse_num,
        "sparse_chunk_hits": sparse_hits,
    }


def restore_corpus(corpus_dir: str, workdir: str,
                   cfg: EngineConfig | None = None,
                   num_partitions: int | None = None):
    """The RESTORE data path (T1-T5, do_restore.c:191-287) as a real
    payload-moving pipeline, not a cache simulation: read the manifest
    (recipe analog) in restore order, gather each row's payload from its
    cluster REPRESENTATIVE (the stored unique — near-dup consolidation
    stores one payload per cluster, so members restore to their
    representative's bytes), and emit (image_id, cluster_id, is_dup,
    bytes). The gather is a hash-partitioned Dataset.join of the
    manifest against the representatives' payload table — the analog of
    container reads, and the only stage in the engine where payload
    bytes legitimately cross a shuffle.

    Returns the restored Dataset; fidelity of the result vs the
    original source pixels is measured by restore_fidelity_stats."""
    import ray as _ray
    cfg = cfg or EngineConfig()
    manifest = ray.data.read_parquet(os.path.join(workdir, "manifest"))
    corpus_ds = ray.data.read_parquet(corpus_dir)

    if num_partitions is None:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        num_partitions = max(4, min(max(cpus * 3 // 4, 4), 64))

    # representatives' payloads: rows whose id is a cluster id.
    # rep set == keys of the manifest's cluster_id column; an inner join
    # against it prunes non-representative payloads before the gather.
    def rep_payloads(batch: pa.Table) -> pa.Table:
        return pa.table({"rep_id": batch["image_id"], "bytes": batch["bytes"]})

    reps = corpus_ds.map_batches(rep_payloads, batch_format="pyarrow")
    joined = manifest.select_columns(["image_id", "cluster_id", "is_dup"]) \
        .join(reps, "inner", num_partitions,
              on=("cluster_id",), right_on=("rep_id",))
    return joined


def restore_fidelity_stats(restored_ds, seed: int = 42,
                           psnr_lossy_min: float = 25.0,
                           concurrency: int = 2):
    """Decode-verify of a restored corpus vs the ORIGINAL source pixels
    (restore-as-oracle, do_restore write path + diff): exact-cluster
    members must round-trip bit-identically through their representative
    (PSNR inf); near-dup members restore to their representative's
    pixels, whose PSNR vs their own source quantifies the consolidation
    loss. Returns per-row (image_id, is_dup, psnr, ok)."""
    from .. import codec
    from .. import corpus as corpus_mod

    def verify(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        dups = batch["is_dup"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        psnrs, oks = [], []
        for rid, data in zip(ids, payloads):
            row = corpus_mod.row_index_of(rid)
            ref, _, _ = corpus_mod.source_pixels(seed, row)
            got = codec.decode(data)
            if got.shape != ref.shape:
                # representative has different dims (e.g. crop member):
                # compare on the representative's grid via NN resize
                got = codec.resize_nn(got, ref.shape[0], ref.shape[1])
            p = codec.psnr(got, ref)
            psnrs.append(min(p, 1e9))
            oks.append(bool(p >= psnr_lossy_min))
        return pa.table({
            "image_id": batch["image_id"],
            "is_dup": batch["is_dup"],
            "psnr": pa.array(psnrs, pa.float64()),
            "ok": pa.array(oks, pa.bool_()),
        })

    return restored_ds.map_batches(verify, batch_format="pyarrow",
                                   batch_size=64, concurrency=concurrency)


def run_incremental_job(delta_corpus_dir: str, workdir: str,
                        base_workdir: str,
                        cfg: EngineConfig | None = None,
                        force: bool = False,
                        bloom_prefilter: bool = False) -> dict:
    """Incremental ingest — destor's SECOND backup: the arriving shard
    dedups against the signature index PERSISTED by a prior
    run_backup_job (base_workdir), base cluster ids are preserved, and
    only delta rows get new assignments (index update, D8, at corpus
    scale; /root/reference/src/index/index.c, do_backup.c's reuse of
    the kv-store across jobs).

    Stages (each checkpointed in `workdir`):
      1. delta signatures (the arriving shard only),
      2. incremental edges — base + delta band rows share the exchange,
         base-base pairs masked (candidates.candidate_edges_incremental),
      3. merged assignment — mixed edges anchor delta rows to base
         CLUSTER ids through one nid-keyed exchange (the base
         assignment table is partitioned, never broadcast), then
         DISTRIBUTED min-label CC over (delta-delta ∪ delta-anchor)
         edges (stages/cluster.assign_clusters — anchors sort below
         delta nids, so the component min IS the surviving base id).
         A delta bridge can merge two base clusters; the survivor is
         the smaller cluster id and the base side is re-pointed through
         the (tiny, touched-cluster-bounded) merge map — the only
         driver-side state on the delta path.

    Invariant (tested): combined assignment == a from-scratch job over
    base+delta, except on hot bands past full_pair_cap where the
    star+chain pair choice is membership-dependent (connectivity, not
    assignment, is guaranteed there).

    Returns {workdir, resumed, metrics} with metrics: n_delta,
    joined_existing (delta rows absorbed into base clusters),
    new_originals, base_cluster_merges."""
    from .dedup import buckets_for
    from ..stages.grouped import bucketed_group_map

    cfg = cfg or EngineConfig()
    chash = cfg.config_hash()
    input_id = (ckpt.input_identity(delta_corpus_dir) + ":" +
                ckpt.input_identity(base_workdir))
    os.makedirs(workdir, exist_ok=True)
    status: dict = {"workdir": workdir, "resumed": {}}

    base_sigs = ray.data.read_parquet(
        ckpt.stage_dir(base_workdir, "signatures"))
    base_assign = ray.data.read_parquet(
        ckpt.stage_dir(base_workdir, "clusters"))

    def produce_sigs(out: str):
        ds = ray.data.read_parquet(delta_corpus_dir)
        sigs = ds.map_batches(SignatureStage(cfg), batch_format="pyarrow",
                              batch_size=256)
        return _write_parquet(sigs, out)

    sigs, resumed = ckpt.run_stage(workdir, "signatures", chash, input_id,
                                   produce_sigs, force=force)
    status["resumed"]["signatures"] = resumed

    def produce_edges(out: str):
        nb = buckets_for(base_sigs.count() + sigs.count())
        return _write_parquet(candidates.candidate_edges_incremental(
            base_sigs, sigs, cfg, num_buckets=nb,
            bloom_prefilter=bloom_prefilter), out)

    edges, resumed = ckpt.run_stage(workdir, "edges", chash, input_id,
                                    produce_edges, force=force)
    status["resumed"]["edges"] = resumed

    def produce_assign(out: str):
        # anchor mixed edges to base CLUSTER ids: one nid-keyed exchange
        # (base assignment rows + edge rows keyed by their base endpoint)
        def edge_rows(batch: pa.Table) -> pa.Table:
            l = batch["left_id"].to_numpy(zero_copy_only=False)
            r = batch["right_id"].to_numpy(zero_copy_only=False)
            lb, rb = l < _nbase, r < _nbase
            mixed = lb ^ rb
            bkey = np.where(lb[mixed], l[mixed], r[mixed])
            dnode = np.where(lb[mixed], r[mixed], l[mixed])
            # delta-delta edges bypass the exchange untouched
            dd = ~lb & ~rb
            return pa.table({
                "key": pa.array(np.concatenate([bkey, l[dd]]), pa.int64()),
                "dnode": pa.array(np.concatenate([dnode, r[dd]]),
                                  pa.int64()),
                "cid": pa.array(np.full(int(mixed.sum() + dd.sum()), -1,
                                        np.int64), pa.int64()),
                "is_a": pa.array(np.r_[np.zeros(int(mixed.sum()), np.int8),
                                       np.full(int(dd.sum()), 2, np.int8)],
                                 pa.int8()),
            })

        def assign_rows(batch: pa.Table) -> pa.Table:
            nid = candidates.parse_nid(batch["image_id"].to_pylist())
            cid = candidates.parse_nid(batch["cluster_id"].to_pylist())
            n = len(nid)
            return pa.table({
                "key": pa.array(nid, pa.int64()),
                "dnode": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "cid": pa.array(cid, pa.int64()),
                "is_a": pa.array(np.ones(n, np.int8), pa.int8()),
            })

        # base ids end where delta ids begin: delta nids are global row
        # indices >= base row count (the shard layout contract)
        _nbase = base_assign.count()

        def anchor(df: pd.DataFrame) -> pa.Table:
            isa = df["is_a"].to_numpy(np.int8)
            a = df.loc[isa == 1, ["key", "cid"]].drop_duplicates("key")
            mixed = df.loc[isa == 0, ["key", "dnode"]]
            dd = df.loc[isa == 2, ["key", "dnode"]]
            j = mixed.merge(a, on="key", how="inner")
            return pa.table({
                "left_id": pa.array(np.concatenate([
                    j["dnode"].to_numpy(np.int64),
                    dd["key"].to_numpy(np.int64)]), pa.int64()),
                "right_id": pa.array(np.concatenate([
                    j["cid"].to_numpy(np.int64),
                    dd["dnode"].to_numpy(np.int64)]), pa.int64()),
            })

        tagged = base_assign.map_batches(assign_rows,
                                         batch_format="pyarrow") \
            .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
        anchored = bucketed_group_map(tagged, "key", anchor,
                                      num_buckets=16)
        # distributed min-label CC over the anchored edge set (round 3:
        # no take_all / per-row Python on the delta path).  Anchors are
        # base CLUSTER ids (< _nbase) and delta nids are >= _nbase, so a
        # component's min label IS its min base anchor when one exists —
        # exactly the incremental survivor rule — else the min delta nid.
        def nid_rows(batch: pa.Table) -> pa.Table:
            return pa.table({"node": pa.array(candidates.parse_nid(
                batch["image_id"].to_pylist()), pa.int64())})

        delta_nodes = sigs.select_columns(["image_id"]).map_batches(
            nid_rows, batch_format="pyarrow")
        # materialized: consumed by the merge pull, the delta output and
        # the metrics aggregate (delta-bounded, stays in the object store)
        assign_pairs = cluster.assign_clusters(
            delta_nodes, anchored, rounds=2, num_buckets=16).materialize()

        # the ONLY driver pull: base anchors whose component rep differs
        # — bounded by the number of base clusters a delta edge touches
        def merge_rows(batch: pa.Table) -> pa.Table:
            nd = batch["node"].to_numpy(zero_copy_only=False)
            cl = batch["cluster"].to_numpy(zero_copy_only=False)
            m = (nd < _nbase) & (nd != cl)
            return pa.table({"node": pa.array(nd[m], pa.int64()),
                             "cluster": pa.array(cl[m], pa.int64())})

        merge_map: dict[int, int] = {
            int(r["node"]): int(r["cluster"])
            for r in assign_pairs.map_batches(
                merge_rows, batch_format="pyarrow").take_all()}
        mm_ref = ray.put(merge_map)

        def repoint(batch: pa.Table) -> pa.Table:
            mm = ray.get(mm_ref)
            if not mm:
                return batch.select(["image_id", "cluster_id"])
            cid = candidates.parse_nid(batch["cluster_id"].to_pylist())
            ks = np.array(sorted(mm), np.int64)
            vs = np.array([mm[k] for k in ks], np.int64)
            p = np.searchsorted(ks, cid)
            p[p >= len(ks)] = 0
            hit = ks[p] == cid
            cid[hit] = vs[p[hit]]
            return pa.table({
                "image_id": batch["image_id"],
                "cluster_id": candidates.format_nid(cid),
            })

        def delta_out(batch: pa.Table) -> pa.Table:
            nd = batch["node"].to_numpy(zero_copy_only=False)
            cl = batch["cluster"].to_numpy(zero_copy_only=False)
            m = nd >= _nbase
            return pa.table({
                "image_id": candidates.format_nid(nd[m].astype(np.int64)),
                "cluster_id": candidates.format_nid(cl[m].astype(np.int64)),
            })

        def delta_metrics(batch: pa.Table) -> pa.Table:
            nd = batch["node"].to_numpy(zero_copy_only=False)
            cl = batch["cluster"].to_numpy(zero_copy_only=False)
            m = nd >= _nbase
            return pa.table({
                "n_delta": pa.array([int(m.sum())], pa.int64()),
                "joined": pa.array([int((cl[m] < _nbase).sum())],
                                   pa.int64()),
                "orig": pa.array([int((cl[m] == nd[m]).sum())],
                                 pa.int64()),
            })

        msum = assign_pairs.map_batches(
            delta_metrics, batch_format="pyarrow") \
            .sum(["n_delta", "joined", "orig"])
        combined = base_assign.map_batches(
            repoint, batch_format="pyarrow") \
            .union(assign_pairs.map_batches(delta_out,
                                            batch_format="pyarrow"))
        n_out = _write_parquet(combined, out)
        meta = {
            "n_delta": int(msum["sum(n_delta)"] or 0),
            "joined_existing": int(msum["sum(joined)"] or 0),
            "new_originals": int(msum["sum(orig)"] or 0),
            "base_cluster_merges": int(len(merge_map)),
        }
        with open(os.path.join(out, "_metrics.json"), "w") as f:
            json.dump(meta, f)
        return n_out

    assign, resumed = ckpt.run_stage(workdir, "assignment", chash,
                                     input_id, produce_assign, force=force)
    status["resumed"]["assignment"] = resumed
    mpath = os.path.join(ckpt.stage_dir(workdir, "assignment"),
                         "_metrics.json")
    with open(mpath) as f:
        status["metrics"] = json.load(f)
    status["assignment"] = assign
    return status
