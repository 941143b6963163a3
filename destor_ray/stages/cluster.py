"""Connected-components clustering of verified edges (int64 node ids).

Default path: hash-to-min label propagation (Rastogi et al., "Finding
Connected Components in Map-Reduce") over bucketed groupby shuffles —
no driver state, no global mutable index, every bucket processed with
vectorized numpy (grouped.py). Star-shaped dup clusters converge in 2
rounds; each round is one shuffle keyed by node id. This replaces
destor's single-threaded mutable kv-store (SURVEY.md §7.4.1) and scales
with the shuffle, not the driver.

All keys are int64 (compact shuffle rows); callers that use string ids
convert at the boundary (candidates.parse_nid / format_nid).

`union_find_driver` is the exact DSU oracle used by tests and for tiny
edge sets. Cluster id := min node id of the component — the
deterministic representative rule (SURVEY.md §4.1 "ordering").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .grouped import bucketed_group_map


def _pairs_from_edges(batch: pa.Table) -> pa.Table:
    l = batch["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = batch["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "node": pa.array(np.concatenate([l, r]), pa.int64()),
        "member": pa.array(np.concatenate([r, l]), pa.int64()),
    })


def _sorted_node_member(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(node, member) int64 arrays of an Arrow bucket, (node, member)-
    lexsorted and deduped — the shared arrow-native front half of the
    CC bucket fns (round 3: these shuffles skip the pandas hop)."""
    nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    members = t["member"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((members, nodes))
    nodes = nodes[order]
    members = members[order]
    if len(nodes):
        keep = np.ones(len(nodes), bool)
        keep[1:] = (nodes[1:] != nodes[:-1]) | (members[1:] != members[:-1])
        nodes, members = nodes[keep], members[keep]
    return nodes, members


def _hash_to_min_bucket(t: pa.Table) -> pa.Table:
    """One vectorized hash-to-min round over every node-group in a bucket:
    for each node v with neighbor-set M and m = min(M ∪ {v}), emit
    (m, u) and (u, m) for all u ∈ M ∪ {v}. Fully vectorized — no
    per-group Python."""
    nodes, members = _sorted_node_member(t)
    _, starts, counts = np.unique(nodes, return_index=True, return_counts=True)
    m_g = np.minimum(members[starts], nodes[starts])  # min(neighbors ∪ self)
    m_rep = np.repeat(m_g, counts)
    out_node = np.concatenate([m_rep, members, m_rep, nodes])
    out_member = np.concatenate([members, m_rep, nodes, m_rep])
    return pa.table({"node": pa.array(out_node, pa.int64()),
                     "member": pa.array(out_member, pa.int64())})


def _min_member_bucket(t: pa.Table) -> pa.Table:
    nodes, members = _sorted_node_member(t)
    _, starts, _ = np.unique(nodes, return_index=True, return_counts=True)
    return pa.table({"node": pa.array(nodes[starts], pa.int64()),
                     "cluster": pa.array(members[starts], pa.int64())})


def connected_components_distributed(edges_ds, rounds: int = 2,
                                     num_buckets: int = 64):
    """edges Dataset (left_id, right_id int64) → pair Dataset
    (node, member) such that min(member) per node is the component id
    after the final min-reduce (assign_clusters applies it — together
    they perform rounds+1 propagation steps)."""
    pairs = edges_ds.map_batches(_pairs_from_edges, batch_format="pyarrow")
    for _ in range(rounds):
        pairs = bucketed_group_map(pairs, "node", _hash_to_min_bucket,
                                   num_buckets=num_buckets,
                                   batch_format="pyarrow")
    return pairs


def assign_clusters(node_ids_ds, edges_ds, rounds: int = 2,
                    num_buckets: int = 64):
    """Every node (Dataset with int64 column `node`) → (node, cluster);
    singletons keep their own id. The final bucketed min-reduce doubles
    as one more propagation step, so total steps = rounds + 1."""
    labels = connected_components_distributed(edges_ds, rounds, num_buckets)

    def self_pairs(batch: pa.Table) -> pa.Table:
        ids = batch["node"]
        return pa.table({"node": ids, "member": ids})

    allp = node_ids_ds.map_batches(self_pairs, batch_format="pyarrow").union(labels)
    return bucketed_group_map(allp, "node", _min_member_bucket,
                              num_buckets=num_buckets,
                              batch_format="pyarrow")


def connected_components_numpy(left: np.ndarray, right: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized driver-side connected components over int64 edge arrays:
    min-label propagation with pointer jumping. Returns (nodes, labels)
    where labels are the component-min node ids. O(E × iterations) with
    all work in numpy kernels — handles multi-million-edge sets in
    well under a second."""
    nodes, inv = np.unique(np.concatenate([left, right]), return_inverse=True)
    li = inv[: len(left)]
    ri = inv[len(left):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = lab.copy()
        # propagate min label across edges (both directions)
        np.minimum.at(lab, li, lab[ri])
        np.minimum.at(lab, ri, lab[li])
        # pointer jumping: lab[i] ← lab[lab[i]] until fixpoint
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, before):
            break
    return nodes, nodes[lab]


class DSU:
    """Classic union-find with path compression (driver-side oracle)."""

    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        root = x
        while p != root:
            root, p = p, self.parent.setdefault(p, p)
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def components(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}


def union_find_driver(edges_iter) -> DSU:
    """Build a DSU from an iterable of (left, right) pairs or pyarrow
    batches with left_id/right_id columns."""
    dsu = DSU()
    for item in edges_iter:
        if isinstance(item, pa.Table):
            for l, r in zip(item["left_id"].to_pylist(), item["right_id"].to_pylist()):
                dsu.union(l, r)
        else:
            dsu.union(item[0], item[1])
    return dsu


def clusters_from_dsu(dsu: DSU, all_ids) -> pd.DataFrame:
    comp = {x: dsu.find(x) for x in list(dsu.parent)}
    rep: dict = {}
    for x, r in comp.items():
        rep[r] = min(rep.get(r, x), x)
    rows = [(i, rep.get(comp.get(i, i), comp.get(i, i)) if i in comp else i)
            for i in all_ids]
    return pd.DataFrame(rows, columns=["node", "cluster"])
