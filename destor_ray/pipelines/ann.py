"""Similarity search over the driver `embeddings` table
(vec_id:int64, embedding:list<float>, label:int32).

Brute-force cosine top-k is the verifiable baseline (numpy matmul per
batch against a broadcast query matrix); the LSH-bucketed variant is
the scale path (candidate buckets via random-hyperplane SimHash bands,
exact re-rank inside buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import splitmix64


def _read_embeddings(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _query_vector(sf_dir: str, query_vec_id: int) -> np.ndarray:
    """The query is a row of the table itself (deterministic, oracle-
    expressible as a scalar subquery)."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads
    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    tbl = dset.to_table(filter=pads.field("vec_id") == query_vec_id)
    return np.asarray(tbl["embedding"].to_pylist()[0], dtype=np.float64)


def ann_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0):
    """Brute-force cosine top-k vs the query row: per-batch partial top-k
    (local argpartition) then a tiny global sort — the map-side
    pre-aggregation pattern; the full table is never collected.
    Returns (vec_id, cos_sim rounded to 6)."""
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    qref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m @ qv) / norms
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(cos) > k:  # local top-k prune before the global sort
            idx = np.argpartition(-cos, k)[:k]
            ids, cos = ids[idx], cos[idx]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cos_sim": pa.array(np.round(cos, 6), pa.float64())})

    scored = _read_embeddings(sf_dir).map_batches(score, batch_format="pyarrow")
    return scored.sort(["cos_sim", "vec_id"], descending=[True, True]).limit(k)


def filtered_ann_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
                      min_len: int = 300, num_partitions: int = 4):
    """(vec_id, cos_sim): brute-force cosine top-k restricted to vectors
    whose DOCUMENT passes a quality predicate (len(text) >= min_len) —
    the composed filter⋈search shape a curation pipeline runs ("ANN
    over the kept slice"). The predicate is evaluated on the documents
    table and joined to embeddings by id with one hash-partitioned
    Dataset.join (column-pruned: only (doc_id) survivors ship), then
    the scored side follows ann_topk's partial-top-k-per-batch →
    tiny-global-sort shape. The wide list<float> column never enters
    the shuffle: scoring is map-only, so the join ships 16-byte
    (vec_id, cos_sim) rows against the id-only kept side (Acero also
    rejects list payloads in join non-key fields — scoring first is
    both required and the cheaper topology)."""
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    qref = ray.put(qn)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def keep_ids(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.greater_equal(pc.utf8_length(batch["text"]), min_len)
        return pa.table({"doc_id": batch.filter(keep)["doc_id"]
                         .cast(pa.int64())})

    kept = docs.map_batches(keep_ids, batch_format="pyarrow")

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m @ qv) / norms
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cos_sim": pa.array(np.round(cos, 6), pa.float64())})

    scored = _read_embeddings(sf_dir).select_columns(["vec_id", "embedding"]) \
        .map_batches(score, batch_format="pyarrow") \
        .join(kept, "inner", num_partitions,
              on=("vec_id",), right_on=("doc_id",))

    def local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) > k:
            cos = batch["cos_sim"].to_numpy(zero_copy_only=False)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            # tie-stable local prune: same (cos DESC, vec_id DESC) order
            # as the global sort, so boundary ties survive correctly
            batch = batch.take(np.lexsort((-ids, -cos))[:k])
        return batch

    return scored.map_batches(local_topk, batch_format="pyarrow") \
        .sort(["cos_sim", "vec_id"], descending=[True, True]).limit(k)


def label_centroids(sf_dir: str):
    """(label, dim, mean_val): per-label centroid of the embedding
    column in long format — the vector-aggregation pattern behind
    k-means / IVF training. Each batch reduces to ONE partial
    (label, dim, s, n) block via a segmented numpy sum (at most
    n_labels × 64 rows per batch), so the shuffle moves partials, not
    vectors; a tiny (label, dim) hash aggregate finishes the mean."""
    from ray.data.aggregate import Sum

    ds = _read_embeddings(sf_dir).select_columns(["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        m = _emb_matrix(batch)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        sums = np.add.reduceat(m[order], starts, axis=0)   # (g, 64)
        counts = np.diff(np.append(starts, len(lab_s)))
        g, d = sums.shape
        return pa.table({
            "label": pa.array(np.repeat(lab_s[starts], d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d), g), pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, d).astype(np.int64), pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["label", "dim"]).aggregate(
            Sum("s", alias_name="s"), Sum("n", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "label": batch["label"].cast(pa.int64()),
            "dim": batch["dim"].cast(pa.int64()),
            "mean_val": pa.array(np.round(s / n, 6), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def kmeans_assign(sf_dir: str, n_centroids: int = 10):
    """(vec_id, centroid_id, dist): one Lloyd's assignment step —
    nearest centroid by euclidean distance, ties to the smaller
    centroid id. Centroids are the first `n_centroids` table rows
    (deterministic, oracle-expressible); they broadcast once via
    ray.put and every batch resolves assignments with a single
    (batch × d) @ (d × k) matmul — the map-only model-scoring shape
    (the trained-quantizer version of this stage is ivf_topk's)."""
    import pyarrow.dataset as pads

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    ctbl = dset.to_table(filter=pads.field("vec_id") < n_centroids,
                         columns=["vec_id", "embedding"])
    order = np.argsort(ctbl["vec_id"].to_numpy())
    C = np.asarray(ctbl["embedding"].to_pylist(), dtype=np.float64)[order]
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _emb_matrix(batch)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2, argmin over centroids;
        # argmin returns the FIRST minimum = smallest centroid id
        d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) \
            + (c * c).sum(axis=1)[None, :]
        best = np.argmin(d2, axis=1)
        dist = np.sqrt(np.maximum(d2[np.arange(len(m)), best], 0.0))
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "centroid_id": pa.array(best.astype(np.int64), pa.int64()),
            "dist": pa.array(np.round(dist, 6), pa.float64()),
        })

    return _read_embeddings(sf_dir).select_columns(["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pyarrow")


def ann_topk_multi(sf_dir: str, k: int = 10, n_queries: int = 8):
    """Batched multi-query brute-force ANN — the broadcast-query-matrix
    pattern: the `n_queries` query vectors (rows with vec_id <
    n_queries) are normalized into ONE small matrix, ray.put once, and
    every batch scores against all queries in a single (batch × d) @
    (d × n_queries) matmul with per-query local top-k pruning; a final
    per-query bucket reduce keeps the global top-k. Per-query work and
    output are identical to ann_topk, but one pass over the corpus
    serves every query. Oracle: cross join + QUALIFY row_number.
    Returns (query_id, vec_id, cos_sim rounded 6)."""
    import pyarrow.dataset as pads

    from ..stages.grouped import bucketed_group_map

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    tbl = dset.to_table(filter=pads.field("vec_id") < n_queries)
    order = np.argsort(np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64))
    qm = np.asarray([np.asarray(e, dtype=np.float64)
                     for e in tbl["embedding"].to_pylist()])[order]
    qids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)[order]
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    qref = ray.put((qn, qids))

    def score(batch: pa.Table) -> pa.Table:
        qv, qi = ray.get(qref)
        m = _emb_matrix(batch)
        norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = (m / norms) @ qv.T          # (batch, n_queries)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_v, out_c = [], [], []
        for j in range(cos.shape[1]):     # local top-k per query column
            c = cos[:, j]
            sel = np.argpartition(-c, k)[:k] if len(c) > k else np.arange(len(c))
            out_q.append(np.full(len(sel), qi[j], dtype=np.int64))
            out_v.append(ids[sel])
            out_c.append(np.round(c[sel], 6))
        return pa.table({"query_id": pa.array(np.concatenate(out_q), pa.int64()),
                         "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                         "cos_sim": pa.array(np.concatenate(out_c), pa.float64())})

    scored = _read_embeddings(sf_dir).map_batches(score, batch_format="pyarrow")

    def topk_bucket(df) -> pa.Table:
        if not len(df):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        g = df.sort_values(["query_id", "cos_sim", "vec_id"],
                           ascending=[True, False, False], kind="stable") \
            .groupby("query_id", sort=False).head(k)
        return pa.table({"query_id": pa.array(g["query_id"].to_numpy(), pa.int64()),
                         "vec_id": pa.array(g["vec_id"].to_numpy(), pa.int64()),
                         "cos_sim": pa.array(g["cos_sim"].to_numpy(), pa.float64())})

    return bucketed_group_map(scored, "query_id", topk_bucket, num_buckets=8)


def embedding_dedup_pairs(sf_dir: str, threshold: float = 0.27,
                          grid: int | None = None, cell_rows: int = 4096):
    """Embedding-cosine near-dup pairs (left_vec < right_vec, cos >=
    threshold) via a block-grid distributed self-join — EXACT (the
    DuckDB oracle hash-matches) with NO driver-side table read and NO
    full-matrix broadcast.

    Theta-join grid: rows are hashed into `grid` blocks; every unordered
    block pair (i <= j) is one shuffle group; each group's task matmuls
    block i against block j (triangular within i == j). Per-task memory
    is O(cell_rows²) regardless of N, and the O(N²) FLOPs — inherent to
    an exact low-threshold self-join — are spread over grid(grid+1)/2
    independent tasks instead of pinned to a broadcast matrix per worker.
    Replication factor is `grid` (each row joins `grid` groups), so pick
    grid ≈ N / cell_rows: shuffle volume N·grid·d stays ~N·d·(N/cell).
    For the sparse high-threshold regime use embedding_lsh_pairs — the
    sub-quadratic approximate path."""
    import pyarrow.dataset as pads

    from ..functions.hashing import mix_u64
    from ..stages.grouped import bucketed_group_map

    n = pads.dataset(f"{sf_dir}/embeddings.parquet").count_rows()  # metadata-only
    B = grid or max(1, -(-n // cell_rows))

    def explode_grid(batch: pa.Table) -> pa.Table:
        # float64 throughout: the DuckDB oracle compares cosine at DOUBLE
        # precision, and borderline pairs must not flip
        m = _emb_matrix(batch)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = (mix_u64(ids.view(np.uint64), 0xE4B) % np.uint64(B)).astype(np.int64)
        # each row → B group rows: group id of block-pair (min(b,o), max(b,o))
        o = np.arange(B, dtype=np.int64)
        bi = np.minimum(blk[:, None], o[None, :])
        bj = np.maximum(blk[:, None], o[None, :])
        gid = (bi * B + bj).ravel()
        rep = np.repeat(np.arange(len(ids)), B)
        return pa.table({
            "gid": pa.array(gid, pa.int64()),
            "blk": pa.array(blk[rep], pa.int64()),
            "vec_id": pa.array(ids[rep], pa.int64()),
            "emb": pa.array(list(mn[rep]), pa.list_(pa.float64())),
        })

    def cell_pairs(df) -> pa.Table:
        import pandas as pd
        empty = pa.table({"left_vec": pa.array([], pa.int64()),
                          "right_vec": pa.array([], pa.int64())})
        if not len(df):
            return empty
        out_l, out_r = [], []
        for gid, g in df.groupby("gid", sort=False):
            g = g.drop_duplicates("vec_id")
            bi, bj = divmod(int(gid), B)
            ids = g["vec_id"].to_numpy().astype(np.int64)
            m = np.asarray([np.asarray(e, dtype=np.float64) for e in g["emb"]])
            if bi == bj:
                sims = m @ m.T
                li, ri = np.nonzero(sims >= threshold)
                keep = ids[li] < ids[ri]
                out_l.append(ids[li][keep])
                out_r.append(ids[ri][keep])
            else:
                blk = g["blk"].to_numpy().astype(np.int64)
                a = blk == bi
                b = blk == bj
                if not a.any() or not b.any():
                    continue
                sims = m[a] @ m[b].T
                li, ri = np.nonzero(sims >= threshold)
                lv, rv = ids[a][li], ids[b][ri]
                out_l.append(np.minimum(lv, rv))
                out_r.append(np.maximum(lv, rv))
        if not out_l:
            return empty
        lv = np.concatenate(out_l)
        rv = np.concatenate(out_r)
        return pa.table({"left_vec": pa.array(lv, pa.int64()),
                         "right_vec": pa.array(rv, pa.int64())})

    grid_rows = _read_embeddings(sf_dir).map_batches(explode_grid,
                                                     batch_format="pyarrow")
    nb = min(max(8, B * (B + 1) // 2), 512)
    return bucketed_group_map(grid_rows, "gid", cell_pairs, num_buckets=nb)


def embedding_lsh_pairs(sf_dir: str, threshold: float = 0.4,
                        bits_per_band: int = 4, num_bands: int = 32,
                        cell_rows: int = 4096):
    """Approximate embedding near-dup pairs for the HIGH-threshold regime
    — the sub-quadratic scale path. Random-hyperplane SimHash bands:
    rows colliding on any band's code land in one shuffle group and are
    exactly re-ranked there (cosine >= threshold). Collision probability
    per band is (1 - θ/π)^bits — defaults (4 bits × 32 bands) give
    ~0.996 recall at cos 0.4 on any data; the PRUNING power, however, is
    intrinsic to the data: clustered embeddings prune well, while
    near-orthogonal random vectors (the synthetic driver table) collide
    broadly and degrade toward the quadratic grid. Recall vs the exact
    grid join is measured in tests, not assumed."""
    from ..functions.hashing import mix_u64
    from ..stages.grouped import bucketed_group_map

    hashers = [_HyperplaneHasher(seed=0xB0B + 31 * b, bits=bits_per_band)
               for b in range(num_bands)]

    def explode_bands(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch).astype(np.float32)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, idx = [], []
        for b, h in enumerate(hashers):
            code = h.codes(mn).view(np.int64)
            keys.append(mix_u64(code.view(np.uint64), 0xD1CE + b).view(np.int64))
            idx.append(np.arange(len(ids)))
        key = np.concatenate(keys)
        rep = np.concatenate(idx)
        return pa.table({
            "band_key": pa.array(key, pa.int64()),
            "vec_id": pa.array(ids[rep], pa.int64()),
            "emb": pa.array(list(mn[rep]), pa.list_(pa.float32())),
        })

    def verify_group(df) -> pa.Table:
        empty = pa.table({"left_vec": pa.array([], pa.int64()),
                          "right_vec": pa.array([], pa.int64())})
        out_l, out_r = [], []
        for _, g in df.groupby("band_key", sort=False):
            g = g.drop_duplicates("vec_id")
            if len(g) < 2:
                continue
            ids = g["vec_id"].to_numpy().astype(np.int64)
            m = np.asarray([np.asarray(e, dtype=np.float32) for e in g["emb"]])
            sims = m @ m.T
            li, ri = np.nonzero(sims >= threshold)
            keep = ids[li] < ids[ri]
            out_l.append(ids[li][keep])
            out_r.append(ids[ri][keep])
        if not out_l:
            return empty
        import pandas as pd
        lv = np.concatenate(out_l)
        rv = np.concatenate(out_r)
        u = pd.DataFrame({"l": lv, "r": rv}).drop_duplicates()
        return pa.table({"left_vec": pa.array(u.l.to_numpy(), pa.int64()),
                         "right_vec": pa.array(u.r.to_numpy(), pa.int64())})

    bands = _read_embeddings(sf_dir).map_batches(explode_bands,
                                                 batch_format="pyarrow")
    return bucketed_group_map(bands, "band_key", verify_group, num_buckets=64)


class _HyperplaneHasher:
    """Deterministic random-hyperplane codes (seeded, dimension-lazy)."""

    def __init__(self, seed: int, bits: int = 16):
        self.seed, self.bits = seed, bits
        self._planes: np.ndarray | None = None

    def planes(self, dim: int) -> np.ndarray:
        if self._planes is None or self._planes.shape[1] != dim:
            cnt = self.bits * dim
            raw = splitmix64((np.arange(cnt, dtype=np.uint64)
                              + np.uint64(self.seed) * np.uint64(0x1F123BB5)))
            # map uint64 → approx N(0,1) via sum of 2 uniforms (enough for LSH)
            u = (raw.astype(np.float64) / 2**64) - 0.5
            self._planes = u.reshape(self.bits, dim)
        return self._planes

    def codes(self, m: np.ndarray) -> np.ndarray:
        pl = self.planes(m.shape[1])
        return ((m @ pl.T) > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(self.bits, dtype=np.uint64))


def lsh_bucket_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
                    bits: int = 8, probe_ham: int = 3):
    """IVF/LSH-flavored ANN: only batches' rows whose hyperplane code is
    within `probe_ham` bits of the query's code are exactly scored — the
    scale path for 10^12-row tables (bucket prune replaces the full
    matmul). On near-orthogonal data the prune/recall tradeoff is
    intrinsic (hyperplane collision prob ≈ 1 - angle/pi); recall vs
    ann_topk is measured in tests, not assumed."""
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    hasher = _HyperplaneHasher(seed=0xA55, bits=bits)
    qcode = hasher.codes(qn[None, :])[0]
    qref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _emb_matrix(batch)
        norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        mn = m / norms
        codes = hasher.codes(mn)
        x = codes ^ qcode
        ham = np.zeros(len(x), dtype=np.int64)
        for shift in range(0, bits, 8):
            ham += _POP8[((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.intp)]
        cand = ham <= probe_ham
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[cand]
        cos = (mn[cand] @ qv)
        if len(cos) > k:
            idx = np.argpartition(-cos, k)[:k]
            ids, cos = ids[idx], cos[idx]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cos_sim": pa.array(np.round(cos, 6), pa.float64())})

    scored = _read_embeddings(sf_dir).map_batches(score, batch_format="pyarrow")
    return scored.sort(["cos_sim", "vec_id"], descending=[True, True]).limit(k)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def embedding_clusters(sf_dir: str, threshold: float = 0.27,
                       driver_cc_threshold: int = 10_000_000):
    """Embedding-cosine near-dup clusters: connected components over
    embedding_dedup_pairs (vec_id, cluster_id = min vec_id of component).
    Hybrid CC like the flagship (pipelines/dedup.py): stream-pull edges
    up to the threshold for exact driver CC, else distributed
    hash-to-min. Rows-only check (clusters aren't tidily
    SQL-expressible)."""
    import pyarrow as pa

    from ..stages import cluster as cl
    from ..stages.cluster import connected_components_numpy
    pairs = embedding_dedup_pairs(sf_dir, threshold)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"left_id": batch["left_vec"],
                         "right_id": batch["right_vec"]})

    edges = pairs.map_batches(rename, batch_format="pyarrow")
    ids_ds = _read_embeddings(sf_dir).select_columns(["vec_id"])

    ls, rs = [], []
    n_edges = 0
    over = False
    for b in edges.iter_batches(batch_format="pyarrow"):
        ls.append(b["left_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        rs.append(b["right_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        n_edges += len(ls[-1])
        if n_edges > driver_cc_threshold:
            over = True
            break
    if over:
        def nodes(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch["vec_id"]})

        ids = ids_ds.map_batches(nodes, batch_format="pyarrow")
        assign = cl.assign_clusters(ids, edges.materialize(),
                                    rounds=2, num_buckets=64)

        def out(batch: pa.Table) -> pa.Table:
            return pa.table({"vec_id": batch["node"],
                             "cluster_id": batch["cluster"]})

        return assign.map_batches(out, batch_format="pyarrow")
    if ls and sum(len(x) for x in ls):
        nodes_arr, labels = connected_components_numpy(
            np.concatenate(ls), np.concatenate(rs))
    else:
        nodes_arr = np.empty(0, dtype=np.int64)
        labels = np.empty(0, dtype=np.int64)
    ref = ray.put((nodes_arr, labels))

    def assign_fn(batch: pa.Table) -> pa.Table:
        nd, lb = ray.get(ref)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = vids.copy()
        if len(nd):
            pos = np.minimum(np.searchsorted(nd, vids), len(nd) - 1)
            hit = nd[pos] == vids
            out[hit] = lb[pos[hit]]
        return pa.table({"vec_id": pa.array(vids, pa.int64()),
                         "cluster_id": pa.array(out, pa.int64())})

    return ids_ds.map_batches(assign_fn, batch_format="pyarrow")


def _kmeans_train(sample: np.ndarray, n_centroids: int, seed: int = 0xC3,
                  iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means on L2-normalized vectors (spherical:
    centroids re-normalized each round so assignment = max dot product).
    Seeded hash-based init — no RNG state, stable under retries."""
    n, d = sample.shape
    idx = (splitmix64(np.arange(n_centroids, dtype=np.uint64)
                      + np.uint64(seed)) % np.uint64(n)).astype(np.int64)
    idx = np.unique(idx)
    while len(idx) < n_centroids:  # top up collisions deterministically
        extra = (np.int64(len(idx)) * np.int64(2654435761) + np.arange(n_centroids)) % n
        idx = np.unique(np.concatenate([idx, extra]))[:n_centroids]
    cents = sample[np.sort(idx)[:n_centroids]].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 1e-12:
                    cents[c] = v / nv
    return cents


def ivf_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
             n_centroids: int = 16, n_probe: int = 4,
             train_sample: int = 4096):
    """IVF ANN: a deterministic spherical k-means coarse quantizer is
    trained once on a bounded driver-side sample (ds.limit — NOT the
    whole table), the tiny centroid matrix is broadcast, and each batch
    assigns its rows to their nearest centroid and exactly scores ONLY
    the rows falling in the query's `n_probe` closest cells — the
    classic inverted-file prune: ~n_probe/n_centroids of the corpus is
    scored instead of all of it, with per-batch partial top-k before the
    tiny global sort. Recall vs the brute-force scan is measured in
    tests (cell-boundary misses are the IVF tradeoff, tuned by
    n_probe)."""
    import pyarrow.parquet as pq

    emb = _read_embeddings(sf_dir)
    sample_tbl = pa.Table.from_pylist(
        emb.limit(train_sample).take_all())
    m = np.asarray([np.asarray(e, dtype=np.float64)
                    for e in sample_tbl["embedding"].to_pylist()])
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    cents = _kmeans_train(mn, min(n_centroids, len(mn)))

    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    probe = set(np.argsort(-(cents @ qn))[:n_probe].tolist())
    ref = ray.put((cents, qn, probe))

    def score(batch: pa.Table) -> pa.Table:
        cts, qv, pset = ray.get(ref)
        mm = _emb_matrix(batch)
        nn = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        cell = np.argmax(nn @ cts.T, axis=1)
        keep = np.isin(cell, list(pset))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[keep]
        cos = nn[keep] @ qv
        if len(cos) > k:
            sel = np.argpartition(-cos, k)[:k]
            ids, cos = ids[sel], cos[sel]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cos_sim": pa.array(np.round(cos, 6), pa.float64())})

    scored = emb.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cos_sim", "vec_id"], descending=[True, True]).limit(k)


def _ivf_index_dir(sf_dir: str, n_centroids: int, train_sample: int) -> str:
    import hashlib
    import os
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n_centroids}:"
                      f"{train_sample}:v1".encode()).hexdigest()[:12]
    return f"/tmp/destor_ray_ivf/{key}"


def build_ivf_index(sf_dir: str, n_centroids: int = 16,
                    train_sample: int = 4096, index_dir: str | None = None):
    """Materialize the IVF index on disk: the corpus rewritten ONCE as
    hive-partitioned parquet keyed by cell_id (nearest spherical-k-means
    centroid) plus a centroids sidecar. This is the build-once/probe-many
    scale path ivf_topk's scan-with-prune approximates: at query time
    only the n_probe matching partitions are READ (partition pruning at
    the storage layer — ~n_probe/n_centroids of the bytes), instead of
    scanning every row to discover its cell. The directory layout is the
    resumable-output pattern: one partition per cell, atomic rename on
    completion, rebuilt only when absent. Returns (data_dir, centroids)."""
    import os

    idx = index_dir or _ivf_index_dir(sf_dir, n_centroids, train_sample)
    data_dir = os.path.join(idx, "cells")
    cfile = os.path.join(idx, "centroids.npy")
    if os.path.exists(cfile):
        return data_dir, np.load(cfile)

    emb = _read_embeddings(sf_dir)
    sample_tbl = pa.Table.from_pylist(emb.limit(train_sample).take_all())
    m = np.asarray([np.asarray(e, dtype=np.float64)
                    for e in sample_tbl["embedding"].to_pylist()])
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    cents = _kmeans_train(mn, min(n_centroids, len(mn)))
    ref = ray.put(cents)

    def tag(batch: pa.Table) -> pa.Table:
        cts = ray.get(ref)
        mm = _emb_matrix(batch)
        nn = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        cell = np.argmax(nn @ cts.T, axis=1).astype(np.int64)
        return batch.append_column("cell_id", pa.array(cell, pa.int64()))

    tmp = idx + ".tmp"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    emb.map_batches(tag, batch_format="pyarrow") \
        .write_parquet(os.path.join(tmp, "cells"), partition_cols=["cell_id"])
    np.save(os.path.join(tmp, "centroids.npy"), cents)
    os.makedirs("/tmp/destor_ray_ivf", exist_ok=True)
    try:
        os.rename(tmp, idx)
    except OSError:  # concurrent builder won the rename; use theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return data_dir, np.load(cfile)


def ivf_index_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
                   n_centroids: int = 16, n_probe: int = 4,
                   train_sample: int = 4096):
    """IVF ANN over the MATERIALIZED index: probe cells are chosen from
    the sidecar centroids on the driver, and read_parquet prunes to the
    n_probe hive partitions — non-probed cells never leave storage
    (contrast ivf_topk, which scans all rows and drops non-probed ones
    after the read). Identical training sample/seed ⇒ identical
    centroids ⇒ result rows equal ivf_topk's at the same parameters
    (asserted in tests)."""
    import pyarrow.compute as pc

    data_dir, cents = build_ivf_index(sf_dir, n_centroids, train_sample)
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(cents @ qn))[:n_probe].astype(np.int64)

    from ray.data.datasource.partitioning import PathPartitionFilter
    probe_set = set(probe.tolist())
    ds = ray.data.read_parquet(
        data_dir,
        partition_filter=PathPartitionFilter.of(
            lambda kv: int(kv["cell_id"]) in probe_set, style="hive"))
    qref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        mm = _emb_matrix(batch)
        nn = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        cos = nn @ qv
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(cos) > k:
            sel = np.argpartition(-cos, k)[:k]
            ids, cos = ids[sel], cos[sel]
        return pa.table({"vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                         "cos_sim": pa.array(np.round(cos, 6), pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cos_sim", "vec_id"], descending=[True, True]).limit(k)


def semantic_dedup(sf_dir: str, n_centroids: int = 10,
                   threshold: float = 0.35, num_buckets: int = 16,
                   block: int = 4096):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) over the
    embeddings table: one deterministic k-means assignment step
    (centroids = the first n_centroids rows, nearest by euclidean
    distance, ties to the smaller centroid id — the kmeans_assign
    rule), then within each cluster mark a vector as a semantic
    duplicate iff some LOWER-id vector of the same cluster has cosine
    >= threshold. Keep-lowest-id representative (the paper keeps the
    vector farthest from the centroid; lowest-id is the deterministic,
    oracle-expressible variant). Returns (vec_id, centroid_id, is_dup)
    for every row — the keep-list is the is_dup=False slice.

    Scale shape: assignment is map-only against an O(k·d) centroid
    matrix broadcast once via ray.put; the within-cluster pass is ONE
    hash shuffle keyed on centroid_id. k is SemDeDup's size control
    (k ∝ N keeps per-cluster work O((N/k)²) bounded); inside a cluster
    the cosine matrix is evaluated in `block`-column strips so per-task
    memory stays O(g·block) for cluster size g. Float64 throughout so
    borderline cosines agree with the DOUBLE-precision DuckDB oracle.
    """
    import pyarrow.dataset as pads

    from ..stages.grouped import bucketed_group_map

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    ctbl = dset.to_table(filter=pads.field("vec_id") < n_centroids,
                         columns=["vec_id", "embedding"])
    order = np.argsort(ctbl["vec_id"].to_numpy())
    C = np.asarray(ctbl["embedding"].to_pylist(), dtype=np.float64)[order]
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _emb_matrix(batch)
        d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) \
            + (c * c).sum(axis=1)[None, :]
        best = np.argmin(d2, axis=1)  # first minimum = smallest centroid id
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "centroid_id": pa.array(best.astype(np.int64), pa.int64()),
            "emb": pa.array(list(mn), pa.list_(pa.float64())),
        })

    assigned = _read_embeddings(sf_dir) \
        .select_columns(["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pyarrow")

    def mark(df) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "centroid_id": pa.array([], pa.int64()),
                          "is_dup": pa.array([], pa.bool_())})
        if not len(df):
            return empty
        out = [empty]
        for cid, g in df.groupby("centroid_id", sort=False):
            g = g.sort_values("vec_id")
            ids = g["vec_id"].to_numpy().astype(np.int64)
            m = np.asarray([np.asarray(e, dtype=np.float64)
                            for e in g["emb"]])
            n = len(ids)
            dup = np.zeros(n, dtype=bool)
            for s in range(0, n, block):  # column strips bound memory
                e = min(n, s + block)
                hit = (m @ m[s:e].T) >= threshold
                # column j (global s+j) is a dup iff any row i < s+j hits
                lower = np.arange(n)[:, None] < np.arange(s, e)[None, :]
                dup[s:e] = (hit & lower).any(axis=0)
            out.append(pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "centroid_id": pa.array(np.full(n, cid, dtype=np.int64),
                                        pa.int64()),
                "is_dup": pa.array(dup, pa.bool_()),
            }))
        return pa.concat_tables(out)

    return bucketed_group_map(assigned, "centroid_id", mark,
                              num_buckets=min(num_buckets, n_centroids))


def _lloyd_train(sample: np.ndarray, n_codes: int, seed: int = 0xAB,
                 iters: int = 12) -> np.ndarray:
    """Deterministic EUCLIDEAN Lloyd k-means for PQ sub-codebooks
    (subvectors are not unit-norm, so spherical assignment is wrong
    here). Same hash-seeded init discipline as _kmeans_train."""
    n = len(sample)
    idx = (splitmix64(np.arange(n_codes, dtype=np.uint64)
                      + np.uint64(seed)) % np.uint64(n)).astype(np.int64)
    idx = np.unique(idx)
    while len(idx) < n_codes:
        extra = (np.int64(len(idx)) * np.int64(2654435761)
                 + np.arange(n_codes)) % n
        idx = np.unique(np.concatenate([idx, extra]))[:n_codes]
    cents = sample[np.sort(idx)[:n_codes]].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(n_codes):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def _pq_index_dir(sf_dir: str, n_sub: int, n_codes: int,
                  train_sample: int) -> str:
    import hashlib
    import os
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n_sub}:{n_codes}:"
                      f"{train_sample}:v1".encode()).hexdigest()[:12]
    return f"/tmp/destor_ray_pq/{key}"


def build_pq_index(sf_dir: str, n_sub: int = 16, n_codes: int = 32,
                   train_sample: int = 4096, index_dir: str | None = None):
    """Product-quantization index build (Jégou et al., TPAMI 2011 — the
    standard vector-compression scale path next to IVF): train n_sub
    per-subspace Euclidean codebooks on a BOUNDED driver sample
    (ds.limit, never the full table), then ONE map-only pass encodes
    every L2-normalized vector into n_sub uint8 codes — a 32x
    compression of a 64-dim float32 column — written as partitioned
    parquet plus a codebook sidecar. At 10^12 vectors the codes table
    is what fits in cluster RAM for exhaustive ADC scans; the float
    column stays on disk for final re-ranking only."""
    import os
    import pickle

    out = index_dir or _pq_index_dir(sf_dir, n_sub, n_codes, train_sample)
    if os.path.isdir(out):
        return out

    emb = _read_embeddings(sf_dir)
    sample_tbl = pa.Table.from_pylist(emb.limit(train_sample).take_all())
    m = np.asarray([np.asarray(e, dtype=np.float64)
                    for e in sample_tbl["embedding"].to_pylist()])
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    d = mn.shape[1]
    assert d % n_sub == 0, "dim must split evenly into subspaces"
    sub_d = d // n_sub
    books = np.stack([
        _lloyd_train(mn[:, s * sub_d:(s + 1) * sub_d], n_codes,
                     seed=0xAB + s)
        for s in range(n_sub)])  # (n_sub, n_codes, sub_d)
    ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        bks = ray.get(ref)
        mm = _emb_matrix(batch)
        nn = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True),
                             1e-12)
        codes = np.empty((len(nn), n_sub), np.uint8)
        for s in range(n_sub):
            sv = nn[:, s * sub_d:(s + 1) * sub_d]
            d2 = ((sv[:, None, :] - bks[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": batch["vec_id"],
            "codes": pa.array(list(codes.tobytes()[i * n_sub:(i + 1) * n_sub]
                                   for i in range(len(nn))), pa.binary()),
        })

    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    emb.map_batches(encode, batch_format="pyarrow").write_parquet(tmp)
    with open(os.path.join(tmp, "_codebooks.pkl"), "wb") as f:
        pickle.dump({"books": books, "n_sub": n_sub, "sub_d": sub_d}, f)
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def pq_index_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
                  n_sub: int = 16, n_codes: int = 32,
                  train_sample: int = 4096, rerank_factor: int = 4):
    """(vec_id, cos_sim) — the production PQ retrieval shape: an
    asymmetric-distance (ADC) scan over the compressed codes table
    shortlists rerank_factor·k candidates, then ONLY those rows' exact
    vectors are read back and re-ranked by true cosine.

    ADC: the query stays exact; each subspace contributes a
    precomputed (n_codes,) inner-product lookup table and a row's
    score is n_sub fancy-index lookups summed — no float column read.
    The shortlist is a tiny id set (broadcast), so the re-rank pass
    touches rerank_factor·k / N of the float data. Measured at
    sf0.001: ADC-only recall@10 = 5/10, after re-rank 10/10
    (n_sub=16, n_codes=32)."""
    import pickle

    idx_dir = build_pq_index(sf_dir, n_sub, n_codes, train_sample)
    with open(f"{idx_dir}/_codebooks.pkl", "rb") as f:
        meta = pickle.load(f)
    books, sub_d = meta["books"], meta["sub_d"]

    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    # per-subspace lookup tables: LUT[s][c] = <q_s, codebook[s][c]>
    lut = np.stack([books[s] @ qn[s * sub_d:(s + 1) * sub_d]
                    for s in range(meta["n_sub"])])  # (n_sub, n_codes)
    ref = ray.put(lut)
    short_n = k * rerank_factor

    codes_ds = ray.data.read_parquet(idx_dir)

    def adc(batch: pa.Table) -> pa.Table:
        tbl = ray.get(ref)
        raw = b"".join(batch["codes"].to_pylist())
        codes = np.frombuffer(raw, np.uint8).reshape(-1, tbl.shape[0])
        score = tbl[np.arange(tbl.shape[0])[None, :], codes].sum(axis=1)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(score) > short_n:
            sel = np.argpartition(-score, short_n)[:short_n]
            ids, score = ids[sel], score[sel]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "adc_score": pa.array(score, pa.float64())})

    shortlist = codes_ds.map_batches(adc, batch_format="pyarrow") \
        .sort(["adc_score", "vec_id"], descending=[True, True]) \
        .limit(short_n).to_pandas()
    short_ids = np.sort(shortlist["vec_id"].to_numpy(np.int64))
    sref = ray.put((short_ids, qn))

    def rerank(batch: pa.Table) -> pa.Table:
        sids, qv = ray.get(sref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sids, ids)
        pos[pos >= len(sids)] = 0
        hit = sids[pos] == ids if len(sids) else np.zeros(len(ids), bool)
        mm = _emb_matrix(batch)[hit]
        nn = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True),
                             1e-12)
        return pa.table({
            "vec_id": pa.array(ids[hit], pa.int64()),
            "cos_sim": pa.array(np.round(nn @ qv, 6), pa.float64()),
        })

    return _read_embeddings(sf_dir) \
        .map_batches(rerank, batch_format="pyarrow") \
        .sort(["cos_sim", "vec_id"], descending=[True, True]).limit(k)


def _ivfpq_index_dir(sf_dir: str, n_centroids: int, n_sub: int,
                     n_codes: int, train_sample: int) -> str:
    import hashlib
    import os
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{n_centroids}:{n_sub}:{n_codes}:"
        f"{train_sample}:v2".encode()).hexdigest()[:12]
    return f"/tmp/destor_ray_ivfpq/{key}"


def build_ivfpq_index(sf_dir: str, n_centroids: int = 16, n_sub: int = 16,
                      n_codes: int = 32, train_sample: int = 4096,
                      index_dir: str | None = None):
    """IVF+PQ — the composed FAISS-style index (Jégou et al. 2011):
    a coarse spherical-k-means quantizer partitions the space into
    cells; per-vector RESIDUALS (v − centroid[cell]) are product-
    quantized, so the fine codebooks spend their bits on within-cell
    variation. The codes table stores (vec_id, 16 uint8 codes) HIVE-
    PARTITIONED by cell — query-time probes prune at the STORAGE layer
    (only the n_probe partitions' files are opened, ~n_probe/n_cells
    of the code bytes leave disk) and score by q·c[cell] +
    ADC(residual codes) — pruning AND compression, which is what
    10^12-vector retrieval actually runs. Training uses one bounded
    driver-side sample; encoding is one map-only pass."""
    import os
    import pickle

    out = index_dir or _ivfpq_index_dir(sf_dir, n_centroids, n_sub,
                                        n_codes, train_sample)
    if os.path.isdir(out):
        return out

    emb = _read_embeddings(sf_dir)
    sample_tbl = pa.Table.from_pylist(emb.limit(train_sample).take_all())
    m = np.asarray([np.asarray(e, dtype=np.float64)
                    for e in sample_tbl["embedding"].to_pylist()])
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    d = mn.shape[1]
    assert d % n_sub == 0
    sub_d = d // n_sub
    cents = _kmeans_train(mn, min(n_centroids, len(mn)))
    cell = np.argmax(mn @ cents.T, axis=1)
    resid = mn - cents[cell]
    books = np.stack([
        _lloyd_train(resid[:, s * sub_d:(s + 1) * sub_d], n_codes,
                     seed=0xCD + s)
        for s in range(n_sub)])
    ref = ray.put((cents, books))

    def encode(batch: pa.Table) -> pa.Table:
        cts, bks = ray.get(ref)
        mm = _emb_matrix(batch)
        nn = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True),
                             1e-12)
        cl = np.argmax(nn @ cts.T, axis=1)
        rs = nn - cts[cl]
        codes = np.empty((len(nn), n_sub), np.uint8)
        for s in range(n_sub):
            sv = rs[:, s * sub_d:(s + 1) * sub_d]
            d2 = ((sv[:, None, :] - bks[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        flat = codes.tobytes()
        return pa.table({
            "vec_id": batch["vec_id"],
            "cell": pa.array(cl.astype(np.int64), pa.int64()),
            "codes": pa.array([flat[i * n_sub:(i + 1) * n_sub]
                               for i in range(len(nn))], pa.binary()),
        })

    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    emb.map_batches(encode, batch_format="pyarrow") \
        .write_parquet(os.path.join(tmp, "cells"), partition_cols=["cell"])
    with open(os.path.join(tmp, "_model.pkl"), "wb") as f:
        pickle.dump({"cents": cents, "books": books,
                     "n_sub": n_sub, "sub_d": sub_d}, f)
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def ivfpq_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
               n_centroids: int = 16, n_probe: int = 8, n_sub: int = 16,
               n_codes: int = 32, train_sample: int = 4096,
               rerank_factor: int = 4):
    """(vec_id, cos_sim) — IVF cell pruning + residual-PQ ADC shortlist
    + exact re-rank: the read itself is PARTITION-PRUNED to the probed
    cells' hive directories (non-probed code bytes never leave
    storage), scoring is q·centroid[cell] + residual lookup tables,
    then the rerank_factor·k shortlist re-ranks against the true
    float vectors."""
    import pickle

    idx_dir = build_ivfpq_index(sf_dir, n_centroids, n_sub, n_codes,
                                train_sample)
    with open(f"{idx_dir}/_model.pkl", "rb") as f:
        meta = pickle.load(f)
    cents, books, sub_d = meta["cents"], meta["books"], meta["sub_d"]
    n_sub_ = meta["n_sub"]

    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    cell_score = cents @ qn                      # q·c per cell
    probe = np.argsort(-cell_score)[:n_probe]
    lut = np.stack([books[s] @ qn[s * sub_d:(s + 1) * sub_d]
                    for s in range(n_sub_)])
    ref = ray.put((cell_score, lut))
    short_n = k * rerank_factor

    from ray.data.datasource.partitioning import PathPartitionFilter
    probe_set = set(int(c) for c in probe)
    codes_ds = ray.data.read_parquet(
        f"{idx_dir}/cells",
        partition_filter=PathPartitionFilter.of(
            lambda kv: int(kv["cell"]) in probe_set, style="hive"))

    def adc(batch: pa.Table) -> pa.Table:
        cscore, tbl = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "adc_score": pa.array([], pa.float64())})
        # hive partition values come back as strings
        cl = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        raw = b"".join(batch["codes"].to_pylist())
        codes = np.frombuffer(raw, np.uint8).reshape(-1, tbl.shape[0])
        score = cscore[cl] + \
            tbl[np.arange(tbl.shape[0])[None, :], codes].sum(axis=1)
        if len(score) > short_n:
            sel = np.argpartition(-score, short_n)[:short_n]
            ids, score = ids[sel], score[sel]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "adc_score": pa.array(score, pa.float64())})

    shortlist = codes_ds.map_batches(adc, batch_format="pyarrow") \
        .sort(["adc_score", "vec_id"], descending=[True, True]) \
        .limit(short_n).to_pandas()
    short_ids = np.sort(shortlist["vec_id"].to_numpy(np.int64))
    sref = ray.put((short_ids, qn))

    def rerank(batch: pa.Table) -> pa.Table:
        sids, qv = ray.get(sref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sids, ids)
        pos[pos >= len(sids)] = 0
        hit = sids[pos] == ids if len(sids) else np.zeros(len(ids), bool)
        mm = _emb_matrix(batch)[hit]
        nn = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True),
                             1e-12)
        return pa.table({
            "vec_id": pa.array(ids[hit], pa.int64()),
            "cos_sim": pa.array(np.round(nn @ qv, 6), pa.float64()),
        })

    return _read_embeddings(sf_dir) \
        .map_batches(rerank, batch_format="pyarrow") \
        .sort(["cos_sim", "vec_id"], descending=[True, True]).limit(k)


def docs_embedding_join_stats(sf_dir: str):
    """(lang, label, n_docs, sum_chars) — the CROSS-MODAL join: the
    text table meets its embedding table on document id (vec_id ==
    doc_id in the driver fixtures) and aggregates per (language,
    embedding-cluster label) — the "which semantic clusters does each
    language fill" audit every multimodal curation run does before
    choosing mixture weights.

    Both sides project to NARROW rows before the single id-keyed
    tag-and-union exchange (docs ship 3 int/str fields, embeddings
    ship (id, label) — the float vectors never move); the per-bucket
    join emits (lang, label) partials, and the final aggregate is
    domain-sized (|langs|·|labels|)."""
    import pandas as pd

    from ..stages.grouped import bucketed_group_map

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "label"])

    def doc_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b["doc_id"].cast(pa.int64()),
            "lang": b["lang"],
            "n_chars": b["n_chars"].cast(pa.int64()),
            "label": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            "is_doc": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
        })

    def emb_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b["vec_id"].cast(pa.int64()),
            "lang": pa.array([""] * b.num_rows, pa.string()),
            "n_chars": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            "label": b["label"].cast(pa.int64()),
            "is_doc": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
        })

    tagged = docs.map_batches(doc_rows, batch_format="pyarrow") \
        .union(emb.map_batches(emb_rows, batch_format="pyarrow"))

    def join_agg(df: pd.DataFrame) -> pa.Table:
        # explicit side tag (labels may legitimately include any int,
        # e.g. DBSCAN's -1 noise label — never an in-band sentinel)
        isd = df["is_doc"].to_numpy(np.int8) == 1
        d = df.loc[isd, ["key", "lang", "n_chars"]]
        e = df.loc[~isd, ["key", "label"]]
        j = d.merge(e, on="key", how="inner")
        g = j.groupby(["lang", "label"], as_index=False).agg(
            n_docs=("key", "size"), sum_chars=("n_chars", "sum"))
        return pa.table({
            "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
            "label": pa.array(g["label"].to_numpy(np.int64), pa.int64()),
            "n_docs": pa.array(g["n_docs"].to_numpy(np.int64), pa.int64()),
            "sum_chars": pa.array(g["sum_chars"].to_numpy(np.int64),
                                  pa.int64())})

    part = bucketed_group_map(tagged, "key", join_agg, num_buckets=16)
    # partials are domain-bounded; one tiny final aggregate
    from ray.data.aggregate import Sum
    out = part.groupby(["lang", "label"]).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"))
    import pyarrow.compute as pc
    return out.map_batches(
        lambda b: pa.table({
            "lang": b["lang"], "label": b["label"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "sum_chars": pc.cast(b["sum_chars"], pa.int64())}),
        batch_format="pyarrow")


class _LinearScorer:
    """Batched model inference as an actor-pool stage: weights land in
    __init__ (once per actor — the destor rule: stateful setup never
    runs per batch), __call__ is one quantized matmul per batch."""

    def __init__(self, dim: int = 64, seed: int = 0x5EED) -> None:
        import hashlib
        raw = b"".join(hashlib.md5(f"{seed}:{i}".encode()).digest()
                       for i in range((dim * 8 + 15) // 16))
        # deterministic small integer weights in [-8, 7]
        self.w = (np.frombuffer(raw[:dim * 8], np.uint64) % 16) \
            .astype(np.int64) - 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)                       # float64 (n, dim)
        xmic = np.round(m * 1_000_000).astype(np.int64)
        score = xmic @ self.w                        # exact int64
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "score_micro": pa.array(score, pa.int64()),
        })


def embedding_model_scores(sf_dir: str, dim: int = 64):
    """(vec_id, score_micro) — BATCHED MODEL INFERENCE over the
    embedding column: a deterministic linear scorer (md5-seeded integer
    weights standing in for a learned quality/reward head) applied by
    an actor pool — weights load once per actor in __init__, every
    batch is one matmul, nothing shuffles (map-only). Inputs quantize
    to integer micros BEFORE the dot product, so scores are exact
    int64 and hash-match an UNNEST-with-ordinality SQL mirror — the
    inference path itself is oracle-verified, which a float model
    could never be."""
    ds = _read_embeddings(sf_dir).select_columns(["vec_id", "embedding"])
    return ds.map_batches(_LinearScorer, batch_format="pyarrow",
                          batch_size=256, concurrency=2,
                          fn_constructor_kwargs={"dim": dim})


def model_weights_sql_literal(dim: int = 64, seed: int = 0x5EED) -> str:
    """The scorer's weight vector as a SQL list literal (oracle side)."""
    w = _LinearScorer(dim, seed).w
    return "[" + ", ".join(str(int(x)) for x in w) + "]"


def kmeans_iter_assign(sf_dir: str, n_centroids: int = 10, iters: int = 2):
    """(vec_id, centroid_id) after `iters` full Lloyd iterations —
    DISTRIBUTED ITERATIVE TRAINING, hash-verified: each round is (a) a
    map-only assignment against broadcast centroids (one matmul per
    batch) and (b) the centroid update as per-(cid, dim) partial sums
    through one small groupby (the label_centroids shape — the
    exchange carries k·d partials per batch, never vectors). Updated
    centroids are rounded to 1e-6 on BOTH engines before the next
    round, so the unrolled-CTE oracle (avg per dim → array_agg →
    re-assign) sees effectively identical decision inputs; assignments
    are integers, immune to the residual 1e-15 distance noise. Honest
    caveat: a per-(cid, dim) mean landing within ~1 ulp of a 0.5e-6
    rounding boundary could round differently across engines
    (different summation orders; np.round is half-even, SQL round is
    half-away-from-zero) — probability ~1e-9 per coordinate, none
    observed at any scale factor; a production trainer needs no
    cross-engine contract at all.

    At 10^12 rows this is exactly the FAISS/SemDeDup training loop:
    broadcast O(k·d) floats per round, one domain-sized aggregate per
    round, zero data-scale shuffles. Edge case: a centroid that loses
    every member keeps its previous position here while the SQL
    mirror would drop it — impossible with data-row-seeded centroids
    on this corpus (each seed is its own nearest member); a real
    trainer would re-seed empties, which no SQL mirror can express."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Count, Sum

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    ctbl = dset.to_table(filter=pads.field("vec_id") < n_centroids,
                         columns=["vec_id", "embedding"])
    order = np.argsort(ctbl["vec_id"].to_numpy())
    C = np.asarray(ctbl["embedding"].to_pylist(), dtype=np.float64)[order]

    emb = _read_embeddings(sf_dir).select_columns(["vec_id", "embedding"])

    def make_assign(cref, out_partials: bool):
        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _emb_matrix(batch)
            d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) \
                + (c * c).sum(axis=1)[None, :]
            best = np.argmin(d2, axis=1).astype(np.int64)
            if not out_partials:
                return pa.table({
                    "vec_id": batch["vec_id"].cast(pa.int64()),
                    "centroid_id": pa.array(best, pa.int64())})
            o = np.argsort(best, kind="stable")
            b_s = best[o]
            starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
            sums = np.add.reduceat(m[o], starts, axis=0)
            counts = np.diff(np.append(starts, len(b_s)))
            g, d = sums.shape
            return pa.table({
                "cid": pa.array(np.repeat(b_s[starts], d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d), g), pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts, d).astype(np.int64),
                              pa.int64()),
            })
        return assign

    for it in range(iters - 1):
        cref = ray.put(C)
        part = emb.map_batches(make_assign(cref, True),
                               batch_format="pyarrow") \
            .groupby(["cid", "dim"]).aggregate(
                Sum("s", alias_name="s"), Sum("n", alias_name="n")) \
            .to_pandas()  # k x d rows
        C = C.copy()
        cid = part["cid"].to_numpy(np.int64)
        dim = part["dim"].to_numpy(np.int64)
        mean = part["s"].to_numpy() / part["n"].to_numpy()
        C[cid, dim] = np.round(mean, 6)  # the cross-engine contract

    cref = ray.put(C)
    return emb.map_batches(make_assign(cref, False),
                           batch_format="pyarrow")


def rp_ann_topk(sf_dir: str, k: int = 10, proj_dim: int = 16,
                shortlist: int = 50, query_vec_id: int = 0):
    """(vec_id, cos_sim) — brute-force-quality ANN at a fraction of the
    FLOPs via JOHNSON-LINDENSTRAUSS random projection (the standard
    pre-ANN dimensionality cut): a deterministic ±1/√d' sign matrix
    (splitmix64-derived — retry-reproducible, never RNG state) maps both
    corpus and query to `proj_dim` dims; each batch scores ALL its rows
    in the projected space (d'·n multiplies instead of d·n), keeps a
    `shortlist` of locally-best candidates, and re-ranks ONLY those at
    full precision (d·shortlist). Emitted cos_sim values are exact; the
    approximation affects shortlist membership only, bounded in the
    recall test vs ann_topk. At d=256→16 this is ~13× less score
    compute per corpus row — the lever that makes a 10^12-row scan
    affordable before an index (IVF/PQ) exists."""
    from ..functions.hashing import mix_u64

    q = _query_vector(sf_dir, query_vec_id)
    d = len(q)
    signs = np.where(
        mix_u64(np.arange(d * proj_dim, dtype=np.uint64), 0x4A4C) & np.uint64(1),
        1.0, -1.0) / np.sqrt(proj_dim)
    proj = signs.reshape(d, proj_dim)
    qn = q / np.linalg.norm(q)
    qp = qn @ proj
    ref = ray.put((proj, qn, qp))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        P, qv, qpv = ray.get(ref)
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        approx = (mn @ P) @ qpv                  # d' multiplies per row
        s = min(shortlist, len(approx))
        idx = np.argpartition(-approx, s - 1)[:s]
        cos = mn[idx] @ qv                       # exact, shortlist only
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[idx]
        if len(cos) > k:  # local top-k prune before the global sort
            jj = np.argpartition(-cos, k)[:k]
            ids, cos = ids[jj], cos[jj]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cos_sim": pa.array(np.round(cos, 6), pa.float64())})

    scored = _read_embeddings(sf_dir).map_batches(score, batch_format="pyarrow")
    return scored.sort(["cos_sim", "vec_id"], descending=[True, True]).limit(k)


def embedding_norm_stats(sf_dir: str):
    """(label, n, mean_norm_micro, max_norm_micro) — per-label L2-norm
    profile of the embedding column: the sanity pass run before any
    cosine machinery (unnormalized or zero vectors silently corrupt
    cosine scores; a label whose norms drift flags a bad encoder
    shard). Vectorized einsum per batch, per-label integer-micro
    partials (sum + max are both mergeable), one label-domain exchange.

    Oracle: sqrt(list_dot_product(e, e)) per row — float64 on both
    sides, micro-rounded; mean recombined from exact integer sums."""
    import pandas as pd
    from ray.data.aggregate import Sum, Max, Count

    ds = _read_embeddings(sf_dir).select_columns(["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        nm = np.round(norms * 1_000_000).astype(np.int64)
        df = pd.DataFrame({
            "label": batch["label"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "s": nm, "mx": nm, "n": 1,
        })
        g = df.groupby("label", sort=False).agg(
            s=("s", "sum"), mx=("mx", "max"), n=("n", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("label").aggregate(Sum("s", alias_name="s"),
                                    Max("mx", alias_name="max_norm_micro"),
                                    Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda b: pa.table({
            "label": b["label"].cast(pa.int64()),
            "n": b["n"].cast(pa.int64()),
            "mean_norm_micro": pa.array(
                b["s"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // b["n"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                pa.int64()),
            "max_norm_micro": b["max_norm_micro"].cast(pa.int64()),
        }), batch_format="pyarrow")


def embedding_dim_stats(sf_dir: str):
    """(dim, n, sum_micro, min_micro, max_micro) — PER-DIMENSION
    profile of the embedding column: the feature-level twin of
    embedding_norm_stats (norms catch a bad shard; per-dim stats catch
    a dead/saturated coordinate — a dim whose min==max is dead, one
    whose |sum| drifts from 0 flags a mean-shifted encoder, and the
    min/max envelope is exactly what a scalar quantizer (sq8_ann_topk)
    trains from).

    Scale shape: each batch reduces its rows to d=dim partial rows
    (sum/min/max are all mergeable), one dim-domain exchange (64 rows)
    — the corpus never co-locates. Quantization is floor(x·1e6), not
    round: float32 inputs land exactly on .5 micro ties with measurable
    probability (odd/2⁷ dyadics), where banker's (numpy) and half-away
    (DuckDB) rounding diverge; floor of the identical float64 product
    is bit-deterministic on both sides.

    Oracle: lateral range(d) unnest + the same floor expression."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    ds = _read_embeddings(sf_dir).select_columns(["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)          # already float64
        q = np.floor(m * 1_000_000).astype(np.int64)
        d = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
            "n": pa.array(np.full(d, q.shape[0], dtype=np.int64),
                          pa.int64()),
            "s": pa.array(q.sum(axis=0), pa.int64()),
            "mn": pa.array(q.min(axis=0), pa.int64()),
            "mx": pa.array(q.max(axis=0), pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(Sum("n", alias_name="n"),
                                  Sum("s", alias_name="sum_micro"),
                                  Min("mn", alias_name="min_micro"),
                                  Max("mx", alias_name="max_micro"))
    return agg.map_batches(
        lambda b: pa.table({
            "dim": b["dim"].cast(pa.int64()),
            "n": b["n"].cast(pa.int64()),
            "sum_micro": b["sum_micro"].cast(pa.int64()),
            "min_micro": b["min_micro"].cast(pa.int64()),
            "max_micro": b["max_micro"].cast(pa.int64()),
        }), batch_format="pyarrow")


def embedding_pca_top1(sf_dir: str):
    """(label, n, mean_proj_micro, evr_ppm) — TOP PRINCIPAL COMPONENT
    of the embedding table via distributed moment partials + driver
    power iteration, then the per-label mean projection onto PC1: the
    PCA/whitening prep pass an embedding-curation pipeline runs before
    visualization, drift checks, or decorrelated indexing (a label
    whose PC1 projection drifts from its peers flags an encoder or
    distribution shift).

    Scale shape (d = 64 here; valid while d² partials are small):
      pass 1  each batch emits ONE row (n, Σx as d floats, XᵀX as d²
              floats ≈ 32 KB) — the mergeable Gram/moment partial; the
              driver folds the ~n/batch_size partial rows (at cluster
              scale this fold is a tree reduce, the partials stay tiny
              either way) and forms C = M/n − μμᵀ;
      driver  exact symmetric eigensolve (np.linalg.eigh) on the
              d×d covariance, sign fixed by the largest-|component|
              coordinate — O(d³), microseconds (power iteration would
              stall here: the corpus spectrum is nearly flat);
      pass 2  MAP-ONLY projection (x − μ)·v₁ quantized per row to
              int64 micros + per-label reduceat partials → one
              label-domain exchange (embedding_norm_stats shape), so
              the final means are exact integer sums, order-free.

    evr_ppm = round(1e6 · v₁ᵀCv₁ / trace(C)) — the explained-variance
    share of PC1, constant across output rows (the scalar a monitoring
    job alerts on). Rows-only query: float eigenvectors aren't SQL
    territory; pytest parity-checks v₁ against numpy.linalg.eigh and
    the projections against a single-process reference."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read_embeddings(sf_dir).select_columns(["embedding", "label"])

    def moment_partial(batch: pa.Table) -> pa.Table:
        x = _emb_matrix(batch)
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "m": pa.array([(x.T @ x).ravel().tolist()],
                          pa.list_(pa.float64())),
        })

    parts = ds.map_batches(moment_partial, batch_format="pyarrow") \
        .to_pandas()
    n_total = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    d = s.shape[0]
    m = np.sum(np.stack(parts["m"].to_numpy()), axis=0).reshape(d, d)
    mu = s / n_total
    cov = m / n_total - np.outer(mu, mu)

    # exact symmetric eigensolve on the tiny d x d covariance: the
    # corpus spectrum is nearly flat (EVR ~3%), where power iteration's
    # (lambda2/lambda1)^k convergence stalls — eigh is exact, O(d^3),
    # and the distributed work (the moment partials) is identical
    eigvals, eigvecs = np.linalg.eigh(cov)
    v = eigvecs[:, -1]
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    evr_ppm = int(round(float(v @ cov @ v) / float(np.trace(cov))
                        * 1_000_000))

    def project(batch: pa.Table) -> pa.Table:
        x = _emb_matrix(batch)
        lab = batch["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = np.round((x - mu) @ v * 1_000_000).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        l_s, p_s = lab[order], p[order]
        starts = np.flatnonzero(np.r_[True, l_s[1:] != l_s[:-1]]) \
            if len(l_s) else np.empty(0, np.int64)
        ends = np.append(starts[1:], len(l_s))
        return pa.table({
            "label": pa.array(l_s[starts], pa.int64()),
            "n": pa.array(ends - starts, pa.int64()),
            "sp": pa.array(np.add.reduceat(p_s, starts)
                           if len(starts) else np.array([], np.int64),
                           pa.int64()),
        })

    agg = ds.map_batches(project, batch_format="pyarrow") \
        .groupby("label").aggregate(Sum("n", alias_name="n"),
                                    Sum("sp", alias_name="sp")) \
        .to_pandas()
    out = pd.DataFrame({
        "label": agg["label"].astype(np.int64),
        "n": agg["n"].astype(np.int64),
        "mean_proj_micro": np.round(
            agg["sp"].to_numpy(np.int64)
            / agg["n"].to_numpy(np.int64)).astype(np.int64),
        "evr_ppm": np.int64(evr_ppm),
    })
    return out.sort_values("label").reset_index(drop=True)


def sq8_ann_topk(sf_dir: str, k: int = 10, n_short: int = 50,
                 query_vec_id: int = 0):
    """(vec_id, cos_sim) — SCALAR-QUANTIZED (SQ8) ANN scan: every
    normalized vector is quantized to int8 with ONE global max-|x|
    scale (a scalar aggregate pass), the scan scores int8·int8 dot
    products — the memory-bandwidth retrieval format, an 8× smaller
    table than float64 (the FAISS SQ8 design; at 10^12 rows the scan
    cost is storage bandwidth, so byte-per-dim IS the speedup) — and
    only a per-batch n_short shortlist is re-ranked at full float64
    precision. Emitted cos_sim values are exact, so this query shares
    ann_topk's brute-force SQL oracle verbatim: a hash match proves
    the quantized shortlist lost nothing at this corpus (measured:
    int8 ranking alone already reproduces the exact top-10 at every
    sf; RRF fusion of weaker channels was evaluated and rejected —
    two 16-dim JL projections fuse to recall 0.1–0.5 on this
    near-isotropic corpus, worse than SQ8 alone)."""
    from ray.data.aggregate import Max

    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)

    def maxabs(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        v = float(np.abs(m / norms[:, None]).max()) if len(m) else 0.0
        return pa.table({"ma": pa.array([v], pa.float64())})

    g = _read_embeddings(sf_dir).select_columns(["embedding"]) \
        .map_batches(maxabs, batch_format="pyarrow") \
        .aggregate(Max("ma", alias_name="ma"))
    scale = 127.0 / float(g["ma"])
    qq = np.clip(np.round(qn * scale), -127, 127).astype(np.int64)
    ref = ray.put((qn, qq))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        qv, qqv = ray.get(ref)
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        # int8 scan (in production the int8 codes are the stored
        # table; here they are formed per batch from the float read)
        codes = np.clip(np.round(mn * scale), -127, 127)
        approx = codes @ qqv
        s = min(n_short, len(approx))
        idx = np.argpartition(-approx, s - 1)[:s]
        cos = mn[idx] @ qv                     # exact, shortlist only
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[idx]
        if len(cos) > k:
            jj = np.argpartition(-cos, k)[:k]
            ids, cos = ids[jj], cos[jj]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cos_sim": pa.array(np.round(cos, 6),
                                             pa.float64())})

    scored = _read_embeddings(sf_dir).map_batches(
        score, batch_format="pyarrow")
    return scored.sort(["cos_sim", "vec_id"],
                       descending=[True, True]).limit(k)
