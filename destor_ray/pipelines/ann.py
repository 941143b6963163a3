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


def embedding_dedup_pairs(sf_dir: str, threshold: float = 0.27):
    """Embedding-cosine near-dup pairs (left_vec < right_vec, cos >=
    threshold). Block-wise: each batch is scored against a broadcast
    normalized matrix of the whole (small-side) table — the broadcast-
    join pattern; for two large sides this becomes an LSH-bucketed
    self-join (see lsh_bucket_topk)."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    full = _emb_matrix(tbl)
    fnorm = full / np.maximum(np.linalg.norm(full, axis=1, keepdims=True), 1e-12)
    full_ids = tbl["vec_id"].to_numpy()
    ref = ray.put((fnorm, full_ids))

    def pairs(batch: pa.Table) -> pa.Table:
        fn_mat, fids = ray.get(ref)
        m = _emb_matrix(batch)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = mn @ fn_mat.T
        li, ri = np.nonzero(sims >= threshold)
        lv, rv = ids[li], fids[ri]
        keep = lv < rv
        return pa.table({"left_vec": pa.array(lv[keep], pa.int64()),
                         "right_vec": pa.array(rv[keep], pa.int64())})

    return _read_embeddings(sf_dir).map_batches(pairs, batch_format="pyarrow")


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


def embedding_clusters(sf_dir: str, threshold: float = 0.27):
    """Embedding-cosine near-dup clusters: connected components over
    embedding_dedup_pairs (vec_id, cluster_id = min vec_id of component).
    Rows-only check (clusters aren't tidily SQL-expressible)."""
    import pyarrow as pa

    from ..stages import cluster as cl
    pairs = embedding_dedup_pairs(sf_dir, threshold)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"left_id": batch["left_vec"],
                         "right_id": batch["right_vec"]})

    edges = pairs.map_batches(rename, batch_format="pyarrow")

    def nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["vec_id"]})

    ids = _read_embeddings(sf_dir).select_columns(["vec_id"]) \
        .map_batches(nodes, batch_format="pyarrow")
    assign = cl.assign_clusters(ids, edges, rounds=2, num_buckets=16)

    def out(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_id": batch["node"], "cluster_id": batch["cluster"]})

    return assign.map_batches(out, batch_format="pyarrow")
