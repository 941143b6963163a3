"""Connected-components clustering of verified edges.

Two implementations:

  * `connected_components_distributed` — hash-to-min label propagation
    (Rastogi et al., "Finding Connected Components in Map-Reduce") built
    only from `groupby().map_groups` shuffles: no driver state, no joins,
    no global mutable index. Star-shaped dup clusters converge in 2
    rounds; each round is one shuffle keyed by node id. This replaces
    destor's single-threaded mutable kv-store (SURVEY.md §7.4.1) and
    scales with the shuffle, not the driver.

  * `union_find_driver` — exact DSU over streamed edge batches; used by
    tests as the oracle and as a fallback when the edge set is tiny.

Cluster id := lexicographic-min image_id of the component — the
deterministic representative rule (SURVEY.md §4.1 "ordering").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _emit_hash_to_min(df: pd.DataFrame) -> pa.Table:
    node = df["node"].iloc[0]
    members = pd.unique(pd.concat([df["member"], pd.Series([node])], ignore_index=True))
    m = members.min()
    outn, outm = [], []
    for u in members:
        outn.append(m)
        outm.append(u)
        if u != m:
            outn.append(u)
            outm.append(m)
    return pa.table({"node": pa.array(outn, pa.string()),
                     "member": pa.array(outm, pa.string())})


def connected_components_distributed(edges_ds, rounds: int = 4):
    """edges Dataset (left_id, right_id) → labels Dataset (node, member)
    where after convergence min(member) per node is the component id."""
    import ray.data  # noqa: F401  (Dataset methods)

    def seed_pairs(batch: pa.Table) -> pa.Table:
        l = batch["left_id"].to_pylist()
        r = batch["right_id"].to_pylist()
        return pa.table({
            "node": pa.array(l + r, pa.string()),
            "member": pa.array(r + l, pa.string()),
        })

    pairs = edges_ds.map_batches(seed_pairs, batch_format="pyarrow")
    for _ in range(rounds):
        pairs = pairs.groupby("node").map_groups(_emit_hash_to_min, batch_format="pandas")
    return pairs


def assign_clusters(corpus_ids_ds, edges_ds, rounds: int = 4):
    """Full assignment: every corpus row gets a cluster_id (= min member of
    its component; singletons keep their own id).

    corpus_ids_ds: Dataset with column image_id.
    Returns Dataset (image_id, cluster_id).
    """
    labels = connected_components_distributed(edges_ds, rounds)

    def self_pairs(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"]
        return pa.table({"node": ids, "member": ids})

    allp = corpus_ids_ds.map_batches(self_pairs, batch_format="pyarrow").union(labels)

    def reduce_min(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "image_id": pa.array([df["node"].iloc[0]], pa.string()),
            "cluster_id": pa.array([df["member"].min()], pa.string()),
        })

    return allp.groupby("node").map_groups(reduce_min, batch_format="pandas")


class DSU:
    """Classic union-find with path compression (driver-side oracle)."""

    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        root = x
        while p != root:
            root, p = p, self.parent.setdefault(p, p)
        # path compress
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller id wins as root
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
    # representative = min id in component
    rep: dict = {}
    for x, r in comp.items():
        rep[r] = min(rep.get(r, x), x)
    rows = [(i, rep.get(comp.get(i, i), comp.get(i, i)) if i in comp else i)
            for i in all_ids]
    return pd.DataFrame(rows, columns=["image_id", "cluster_id"])


def pair_recall(predicted_pairs: set[tuple], truth_pairs: set[tuple]) -> float:
    """Dup-pair recall: fraction of ground-truth pairs whose endpoints land
    in the same predicted cluster. `predicted_pairs` is a set of
    (id → cluster) tuples expressed as a dict upstream; see tests."""
    if not truth_pairs:
        return 1.0
    hit = sum(1 for p in truth_pairs if p in predicted_pairs)
    return hit / len(truth_pairs)
