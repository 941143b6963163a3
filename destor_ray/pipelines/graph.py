"""Iterative graph computation over the driver tables: weighted
PageRank on the token co-occurrence digraph (nodes = tokens, edge
u→v weighted by bigram count across all documents).

The iteration topology is the real distributed PageRank shape —
per iteration, ranks co-locate with their out-edges via ONE
tag-and-union hash shuffle (no broadcast of the rank vector, which at
web scale doesn't fit anywhere), contributions reduce with a second
keyed aggregate — exercised here at vocabulary size and verified
bit-for-bit (round 9) against an unrolled-CTE DuckDB oracle. The
edge-extraction stage (bigram counts across the corpus) is the
data-scale part and uses the same map-side-combine shape as
text.top_ngrams.

Semantics fixed on both sides: damping d = 0.85, uniform init 1/N,
contributions only from nodes with out-degree > 0 (no dangling-mass
redistribution), 3 iterations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.grouped import bucketed_group_map


def _bigram_edges(sf_dir: str):
    """(src, dst, w): bigram counts — map-side partial counts per batch,
    one (src, dst) hash aggregate."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        off = np.asarray(toks.offsets).astype(np.int64)
        counts = np.diff(off)
        nbi = np.maximum(counts - 1, 0)
        total = int(nbi.sum())
        if total == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64())})
        doc_rep = np.repeat(np.arange(len(counts)), nbi)
        first = np.concatenate(([0], np.cumsum(nbi)[:-1]))
        within = np.arange(total) - np.repeat(first, nbi)
        pos = off[doc_rep] + within
        src = pc.take(toks.values, pa.array(pos))
        dst = pc.take(toks.values, pa.array(pos + 1))
        g = pa.table({"src": src, "dst": dst}) \
            .group_by(["src", "dst"]).aggregate([([], "count_all")])
        return g.rename_columns(["src", "dst", "w"])

    edges = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(Sum("w", alias_name="w"))
    return edges.map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                            "w": pc.cast(b["w"], pa.float64())}),
        batch_format="pyarrow")


def pagerank_tokens(sf_dir: str, d: float = 0.85, iters: int = 3):
    """(tok, rank): weighted PageRank after `iters` synchronous
    iterations. Each iteration is two shuffles:

      1. tag-and-union by src token: out-edges (src, dst, p=w/outw)
         and the current rank row of src meet in one hash bucket; the
         bucket emits contribution rows (dst, r·p) — the rank vector
         is PARTITIONED, never broadcast;
      2. (dst) aggregate + the damping affine map, with zero-rows for
         every node so sinks keep their (1-d)/N floor.

    The edge normalization (p = w / out-weight) is itself one
    tag-and-union pass. Verified against an unrolled-CTE oracle."""
    from ray.data.aggregate import Sum

    edges = _bigram_edges(sf_dir)

    # normalize: p(u,v) = w / Σ_v w — co-locate each src's edges once
    def normalize_bucket(df: pd.DataFrame) -> pa.Table:
        src = df["src"].to_numpy()
        order = np.argsort(src, kind="stable")
        src_s = src[order]
        dst_s = df["dst"].to_numpy()[order]
        w_s = df["w"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, src_s[1:] != src_s[:-1]])
        sizes = np.diff(np.append(starts, len(src_s)))
        ow = np.repeat(np.add.reduceat(w_s, starts), sizes)
        return pa.table({"src": pa.array(src_s.tolist(), pa.string()),
                         "dst": pa.array(dst_s.tolist(), pa.string()),
                         "p": pa.array(w_s / ow, pa.float64())})

    edges_p = bucketed_group_map(edges, "src", normalize_bucket,
                                 num_buckets=16).materialize()

    # node set = distinct src ∪ dst (every token appears in a bigram
    # unless the whole corpus is single-token docs)
    def node_rows(b: pa.Table) -> pa.Table:
        toks = np.unique(np.concatenate([
            np.asarray(b["src"].to_pylist(), dtype=object),
            np.asarray(b["dst"].to_pylist(), dtype=object)]))
        return pa.table({"tok": pa.array(toks.tolist(), pa.string())})

    nodes = edges_p.map_batches(node_rows, batch_format="pyarrow") \
        .groupby("tok").count().drop_columns(["count()"]).materialize()
    n = nodes.count()

    ranks = nodes.map_batches(
        lambda b: pa.table({"tok": b["tok"],
                            "r": pa.array(np.full(len(b), 1.0 / n),
                                          pa.float64())}),
        batch_format="pyarrow")

    def contrib_bucket(df: pd.DataFrame) -> pa.Table:
        key = df["key"].to_numpy()
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        dst_s = df["dst"].to_numpy()[order]
        p_s = df["p"].to_numpy()[order]
        r_s = df["r"].to_numpy()[order]
        isr = df["is_rank"].to_numpy()[order].astype(bool)
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        sizes = np.diff(np.append(starts, len(key_s)))
        seg = np.repeat(np.arange(len(starts)), sizes)
        # exactly one rank row per key (ranks are keyed by tok)
        rank_per_seg = np.zeros(len(starts))
        rank_per_seg[seg[isr]] = r_s[isr]
        edge = ~isr
        return pa.table({
            "tok": pa.array(dst_s[edge].tolist(), pa.string()),
            "c": pa.array(p_s[edge] * rank_per_seg[seg[edge]], pa.float64()),
        })

    zero = nodes.map_batches(
        lambda b: pa.table({"tok": b["tok"],
                            "c": pa.array(np.zeros(len(b)), pa.float64())}),
        batch_format="pyarrow")

    for _ in range(iters):
        tagged = edges_p.map_batches(
            lambda b: pa.table({
                "key": b["src"], "dst": b["dst"], "p": b["p"],
                "r": pa.array(np.zeros(len(b)), pa.float64()),
                "is_rank": pa.array(np.zeros(len(b), np.int8), pa.int8()),
            }), batch_format="pyarrow").union(
            ranks.map_batches(
                lambda b: pa.table({
                    "key": b["tok"],
                    "dst": pa.array([""] * len(b), pa.string()),
                    "p": pa.array(np.zeros(len(b)), pa.float64()),
                    "r": b["r"],
                    "is_rank": pa.array(np.ones(len(b), np.int8), pa.int8()),
                }), batch_format="pyarrow"))
        contrib = bucketed_group_map(tagged, "key", contrib_bucket,
                                     num_buckets=16)
        summed = contrib.union(zero).groupby("tok").aggregate(
            Sum("c", alias_name="c"))
        base = (1.0 - d) / n
        ranks = summed.map_batches(
            lambda b, base=base: pa.table({
                "tok": b["tok"],
                "r": pa.array(base + d * b["c"].to_numpy(
                    zero_copy_only=False), pa.float64()),
            }), batch_format="pyarrow")

    return ranks.map_batches(
        lambda b: pa.table({
            "tok": b["tok"],
            "rank": pa.array(np.round(
                b["r"].to_numpy(zero_copy_only=False), 9), pa.float64()),
        }), batch_format="pyarrow")


def triangle_count(sf_dir: str):
    """One row (n_nodes, n_edges, n_triangles): exact triangle count of
    the undirected token co-occurrence graph — the standard distributed
    scheme (degree-ordered orientation + wedge⋈edge join, Cohen 2009 /
    Suri-Vassilvitskii 2011):

      1. distinct undirected edges: batch-local dedup map-side, then one
         (a, b) hash aggregate — the only pass over the corpus;
      2. degrees from the edge table (|V|-bounded, like bigram_pmi's
         vocab broadcast) are shipped once via ray.put;
      3. every edge is oriented low→high by (degree, token) — a total
         order, so each triangle is counted exactly once, from its
         lowest vertex — bounding every oriented out-degree by
         O(sqrt(|E|)), which is what keeps wedge generation from
         exploding on hub tokens (a plain src-grouped expansion is
         quadratic in the hub's degree; the oriented one is not);
      4. wedges (v, w) expand per src-bucket with the cached-triu
         template (one vectorized expansion per distinct group size),
         pre-counted per bucket;
      5. a tag-and-union rendezvous on the wedge key counts wedges whose
         closing edge exists — no edge set is ever broadcast.
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.candidates import _triu_cached
    from ..stages.grouped import bucketed_group_map

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def edge_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        off = np.asarray(toks.offsets).astype(np.int64)
        counts = np.diff(off)
        nbi = np.maximum(counts - 1, 0)
        total = int(nbi.sum())
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if total == 0:
            return empty
        doc_rep = np.repeat(np.arange(len(counts)), nbi)
        first = np.concatenate(([0], np.cumsum(nbi)[:-1]))
        within = np.arange(total) - np.repeat(first, nbi)
        pos = off[doc_rep] + within
        u = pc.take(toks.values, pa.array(pos))
        v = pc.take(toks.values, pa.array(pos + 1))
        ne = pc.not_equal(u, v)
        u, v = u.filter(ne), v.filter(ne)
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        if len(lo) == 0:
            return empty
        return pa.table({"a": lo, "b": hi}).group_by(["a", "b"]) \
            .aggregate([]).select(["a", "b"])

    edges = ds.map_batches(edge_partial, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Count(alias_name="_c")) \
        .select_columns(["a", "b"]).materialize()  # narrow 2-col reuse

    deg_ds = edges.map_batches(
        lambda b: pa.concat_tables(
            [b.select(["a"]).rename_columns(["tok"]),
             b.select(["b"]).rename_columns(["tok"])]),
        batch_format="pyarrow").groupby("tok") \
        .aggregate(Count(alias_name="deg"))
    deg_df = deg_ds.to_pandas()  # |V|-bounded, as in bigram_pmi
    n_nodes = len(deg_df)
    n_edges = edges.count()
    import ray as _ray
    vocab_arr = pa.array(deg_df["tok"].tolist(), pa.string())
    deg_arr = deg_df["deg"].to_numpy(np.int64)
    deg_ref = _ray.put((vocab_arr, deg_arr))

    def orient(batch: pa.Table) -> pa.Table:
        vocab, degs = _ray.get(deg_ref)
        # vectorized degree lookup via Arrow hash join (pc.index_in) —
        # endpoints never round-trip through Python string objects
        # (every edge endpoint is in the degree table by construction)
        ia = pc.index_in(batch["a"].combine_chunks(), value_set=vocab) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ib = pc.index_in(batch["b"].combine_chunks(), value_set=vocab) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        da = degs[ia]
        db = degs[ib]
        # low→high by (degree, token); (a, b) is already token-ordered,
        # so a degree tie keeps (a, b) — a total order overall
        a_first = pa.array(da <= db)
        return pa.table({
            "src": pc.if_else(a_first, batch["a"], batch["b"]),
            "dst": pc.if_else(a_first, batch["b"], batch["a"]),
            "ddeg": pa.array(np.where(da <= db, db, da), pa.int64())})

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    def wedges(df: pd.DataFrame) -> pa.Table:
        src = np.asarray(df["src"].tolist(), dtype=object)
        dst = np.asarray(df["dst"].tolist(), dtype=object)
        ddeg = df["ddeg"].to_numpy(np.int64)
        order = np.lexsort((dst, ddeg, src))  # per src: (deg, tok) asc
        src_s, dst_s = src[order], dst[order]
        n = len(src_s)
        if n == 0:
            return pa.table({"wkey": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        firsts = np.empty(n, dtype=bool)
        firsts[0] = True
        firsts[1:] = src_s[1:] != src_s[:-1]
        starts = np.flatnonzero(firsts)
        counts = np.diff(np.append(starts, n))
        li_parts, ri_parts = [], []
        for c in np.unique(counts[counts >= 2]):
            gl, gr = _triu_cached(int(c))
            st = starts[counts == c]
            li_parts.append((st[:, None] + gl[None, :]).ravel())
            ri_parts.append((st[:, None] + gr[None, :]).ravel())
        if not li_parts:
            return pa.table({"wkey": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        li = np.concatenate(li_parts)
        ri = np.concatenate(ri_parts)
        # wedge endpoints inherit the (deg, tok) order → canonical key
        key = np.char.add(np.char.add(dst_s[li].astype(str), "|"),
                          dst_s[ri].astype(str))
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"wkey": pa.array(uniq, pa.string()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    wedge_counts = bucketed_group_map(oriented, "src", wedges, num_buckets=8)

    edge_keys = oriented.map_batches(
        lambda b: pa.table({
            "wkey": pc.binary_join_element_wise(b["src"], b["dst"], "|"),
            "n": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            "is_edge": pa.array(np.ones(len(b), np.int8), pa.int8()),
        }), batch_format="pyarrow")
    tagged = wedge_counts.map_batches(
        lambda b: b.append_column(
            "is_edge", pa.array(np.zeros(len(b), np.int8), pa.int8())),
        batch_format="pyarrow").union(edge_keys)

    def close_count(df: pd.DataFrame) -> pa.Table:
        isw = df["is_edge"].to_numpy(np.int8) == 0
        closed = set(df.loc[~isw, "wkey"])
        wk = df.loc[isw]
        hit = wk["wkey"].isin(closed).to_numpy()
        return pa.table({"tri": pa.array(
            [int(wk["n"].to_numpy(np.int64)[hit].sum())], pa.int64())})

    tri = bucketed_group_map(tagged, "wkey", close_count, num_buckets=8) \
        .aggregate(Sum("tri", alias_name="n_triangles"))

    return pd.DataFrame({"n_nodes": pd.array([n_nodes], "int64"),
                         "n_edges": pd.array([n_edges], "int64"),
                         "n_triangles": pd.array(
                             [int(tri["n_triangles"])], "int64")})


def degree_distribution(sf_dir: str):
    """(out_degree, n_tokens) — distribution of distinct-successor
    out-degrees in the token co-occurrence digraph: the profiling
    pass run before any iterative graph job to find skewed hubs
    (whether a PageRank/triangle shuffle needs salting is read
    straight off this table; destor's container-utilization histogram,
    har_rewrite.c, is the same shape over containers).

    Reuses the bigram edge aggregate, then two tiny groupbys: distinct
    (src, dst) pairs → per-src degree count → per-degree counts. Each
    stage's output is vocabulary-bounded, so everything after the
    map-side-combined edge extraction is negligible."""
    from ray.data.aggregate import Count

    edges = _bigram_edges(sf_dir)
    deg = edges.groupby("src").aggregate(Count(alias_name="out_degree"))

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "out_degree": pc.cast(batch["out_degree"], pa.int64())})

    return deg.map_batches(shape, batch_format="pyarrow") \
        .groupby("out_degree").aggregate(Count(alias_name="n_tokens")) \
        .map_batches(lambda b: pa.table({
            "out_degree": pc.cast(b["out_degree"], pa.int64()),
            "n_tokens": pc.cast(b["n_tokens"], pa.int64())}),
            batch_format="pyarrow")


def token_communities(sf_dir: str, iters: int = 3):
    """(tok, label) — synchronous min-label propagation (hash-to-min
    connected components) over the UNDIRECTED token co-occurrence
    graph, `iters` rounds: label(v) ← min over (neighbors ∪ self) of
    the previous labels, labels initialized to the token itself
    (string min = lexicographic, identical in numpy and SQL).

    This is the HASH-VERIFIED twin of the flagship's distributed CC
    (stages/cluster.py hash-to-min, Rastogi et al.) — same per-round
    topology, two exchanges per iteration (tag-and-union co-locating
    each src's label with its out-edges, then a min-reduce keyed by
    dst), rank/label vector partitioned, never broadcast — but over a
    vocabulary-sized graph where an unrolled-CTE DuckDB oracle can pin
    every label exactly. After `iters` rounds labels equal true
    components out to radius `iters`; the oracle mirrors the SAME
    round count, so the hash match is exact regardless of diameter."""
    from ..stages.grouped import bucketed_group_map

    edges = _bigram_edges(sf_dir)

    # symmetrize + dedup: one groupby on the (tiny) vocab-bounded pairs
    def both_dirs(b: pa.Table) -> pa.Table:
        src = np.asarray(b["src"].to_pylist(), dtype=object)
        dst = np.asarray(b["dst"].to_pylist(), dtype=object)
        return pa.table({
            "src": pa.array(np.concatenate([src, dst]).tolist(), pa.string()),
            "dst": pa.array(np.concatenate([dst, src]).tolist(), pa.string()),
        })

    sym = edges.map_batches(both_dirs, batch_format="pyarrow") \
        .groupby(["src", "dst"]).count().drop_columns(["count()"]) \
        .materialize()

    def node_rows(b: pa.Table) -> pa.Table:
        toks = np.unique(np.asarray(b["src"].to_pylist(), dtype=object))
        return pa.table({"tok": pa.array(toks.tolist(), pa.string())})

    nodes = sym.map_batches(node_rows, batch_format="pyarrow") \
        .groupby("tok").count().drop_columns(["count()"]).materialize()

    labels = nodes.map_batches(
        lambda b: pa.table({"tok": b["tok"], "lab": b["tok"]}),
        batch_format="pyarrow")

    def spread_bucket(df: pd.DataFrame) -> pa.Table:
        key = df["key"].to_numpy()
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        dst_s = df["dst"].to_numpy()[order]
        lab_s = df["lab"].to_numpy()[order]
        isl = df["is_lab"].to_numpy()[order].astype(bool)
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        sizes = np.diff(np.append(starts, len(key_s)))
        seg = np.repeat(np.arange(len(starts)), sizes)
        lab_per_seg = np.empty(len(starts), dtype=object)
        lab_per_seg[seg[isl]] = lab_s[isl]  # exactly one label row per key
        edge = ~isl
        # contributions to each neighbor + the self row
        out_tok = np.concatenate([dst_s[edge], key_s[starts]])
        out_lab = np.concatenate([lab_per_seg[seg[edge]],
                                  lab_per_seg])
        return pa.table({"tok": pa.array(out_tok.tolist(), pa.string()),
                         "lab": pa.array(out_lab.tolist(), pa.string())})

    def min_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("tok", as_index=False)["lab"].min()
        return pa.table({"tok": pa.array(g["tok"].to_numpy(object),
                                         pa.string()),
                         "lab": pa.array(g["lab"].to_numpy(object),
                                         pa.string())})

    for _ in range(iters):
        tagged = sym.map_batches(
            lambda b: pa.table({
                "key": b["src"], "dst": b["dst"],
                "lab": pa.array([""] * b.num_rows, pa.string()),
                "is_lab": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }), batch_format="pyarrow") \
            .union(labels.map_batches(
                lambda b: pa.table({
                    "key": b["tok"], "dst": b["tok"], "lab": b["lab"],
                    "is_lab": pa.array(np.ones(b.num_rows, np.int8),
                                       pa.int8()),
                }), batch_format="pyarrow"))
        contrib = bucketed_group_map(tagged, "key", spread_bucket,
                                     num_buckets=8)
        labels = bucketed_group_map(contrib, "tok", min_bucket,
                                    num_buckets=8).materialize()

    return labels.map_batches(
        lambda b: pa.table({"tok": b["tok"], "label": b["lab"]}),
        batch_format="pyarrow")


def bfs_token_distances(sf_dir: str, source: str = "customer",
                        max_depth: int = 3):
    """(token, dist) — single-source BFS hop distances over the
    DIRECTED token bigram graph, `max_depth` synchronous frontier
    rounds. Each round is the same two-exchange topology as
    pagerank/token_communities: a tag-and-union exchange co-locates
    the current distance vector with the out-edges keyed by src
    (the distance vector is partitioned, never broadcast), proposals
    (dst, d+1) then min-reduce keyed by token against the previous
    distances. Proposing from ALL known nodes each round (not just the
    newest frontier) costs nothing at vocabulary scale and makes the
    min-merge idempotent. The DuckDB oracle unrolls the SAME rounds as
    per-level frontier SETS (d0..dK) — set semantics, not path
    enumeration, keep the SQL mirror polynomial on cyclic graphs."""
    from ..stages.grouped import bucketed_group_map

    edges = _bigram_edges(sf_dir).drop_columns(["w"]).materialize()
    dist = ray.data.from_arrow(pa.table({
        "tok": pa.array([source], pa.string()),
        "d": pa.array([0], pa.int64()),
    }))

    def relax_bucket(df: pd.DataFrame) -> pa.Table:
        isd = df["is_d"].to_numpy(np.int8) == 1
        known = df.loc[isd].groupby("key", as_index=False)["d"].min()
        ed = df.loc[~isd, ["key", "dst"]]
        j = ed.merge(known, on="key", how="inner")
        return pa.table({
            "tok": pa.array(j["dst"].to_numpy(object).tolist(),
                            pa.string()),
            "d": pa.array(j["d"].to_numpy(np.int64) + 1, pa.int64()),
        })

    def min_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("tok", as_index=False)["d"].min()
        return pa.table({
            "tok": pa.array(g["tok"].to_numpy(object).tolist(),
                            pa.string()),
            "d": pa.array(g["d"].to_numpy(np.int64), pa.int64()),
        })

    for _ in range(max_depth):
        tagged = edges.map_batches(
            lambda b: pa.table({
                "key": b["src"], "dst": b["dst"],
                "d": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "is_d": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }), batch_format="pyarrow") \
            .union(dist.map_batches(
                lambda b: pa.table({
                    "key": b["tok"],
                    "dst": pa.array([""] * b.num_rows, pa.string()),
                    "d": b["d"],
                    "is_d": pa.array(np.ones(b.num_rows, np.int8),
                                     pa.int8()),
                }), batch_format="pyarrow"))
        props = bucketed_group_map(tagged, "key", relax_bucket,
                                   num_buckets=8)
        dist = bucketed_group_map(dist.union(props), "tok", min_bucket,
                                  num_buckets=8).materialize()

    return dist.map_batches(
        lambda b: pa.table({"token": b["tok"], "dist": b["d"]}),
        batch_format="pyarrow")


def kcore_tokens(sf_dir: str, k: int = 22, rounds: int = 3):
    """(tok, deg) — k-CORE PEELING over the undirected token
    co-occurrence graph, `rounds` SYNCHRONOUS peel rounds: each round
    recomputes degrees over the surviving edge set and removes every
    node with degree < k (the spam/noise-pruning pass community
    pipelines run before expensive clustering; the fixpoint of this
    iteration is the classic k-core). A FIXED round count keeps the
    operator hash-verifiable against an unrolled-CTE oracle — same
    contract as pagerank_tokens/token_communities; at the driver graph
    3 rounds reach the fixpoint anyway (asserted in the test).

    Scale shape per round: one degree aggregate (node-domain) + TWO
    endpoint-keyed semi-join exchanges restricting the edge set to
    surviving nodes — the alive set is node-domain-sized and is NEVER
    broadcast (it rides the same bucketed exchange as the edges,
    tag-and-union style, like bfs_token_distances' distance vector)."""
    from ray.data.aggregate import Count

    # distinct undirected edge set (both directions materialized so a
    # single groupby(src) IS the degree): one exchange
    base = _bigram_edges(sf_dir)

    def both_dirs(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(batch["src"], batch["dst"]))
        t = batch.filter(keep)
        return pa.table({
            "src": pa.concat_arrays([t["src"].combine_chunks(),
                                     t["dst"].combine_chunks()]),
            "dst": pa.concat_arrays([t["dst"].combine_chunks(),
                                     t["src"].combine_chunks()]),
        })

    und = base.map_batches(both_dirs, batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_c")) \
        .select_columns(["src", "dst"]).materialize()

    def _semi(edges, alive, key: str):
        """edges rows whose `key` endpoint appears in `alive` (tok) —
        one bucketed exchange, alive rides tagged rows (no broadcast)."""
        def tag_edge(b: pa.Table) -> pa.Table:
            other = "dst" if key == "src" else "src"
            return pa.table({"k": b[key], "other": b[other],
                             "is_edge": pa.array([1] * b.num_rows,
                                                 pa.int64())})

        def tag_alive(b: pa.Table) -> pa.Table:
            return pa.table({"k": b["tok"],
                             "other": pa.array([""] * b.num_rows,
                                               pa.string()),
                             "is_edge": pa.array([0] * b.num_rows,
                                                 pa.int64())})

        tagged = edges.map_batches(tag_edge, batch_format="pyarrow") \
            .union(alive.map_batches(tag_alive, batch_format="pyarrow"))

        def bucket(df: pd.DataFrame) -> pa.Table:
            ok = set(df.loc[df["is_edge"] == 0, "k"])
            e = df[df["is_edge"] == 1]
            e = e[e["k"].isin(ok)]
            if key == "src":
                return pa.table({"src": pa.array(e["k"], pa.string()),
                                 "dst": pa.array(e["other"], pa.string())})
            return pa.table({"src": pa.array(e["other"], pa.string()),
                             "dst": pa.array(e["k"], pa.string())})

        return bucketed_group_map(tagged, "k", bucket, num_buckets=16)

    deg = None
    for r in range(rounds):
        deg = und.groupby("src").aggregate(Count(alias_name="deg")) \
            .map_batches(lambda b: pa.table({
                "tok": b["src"], "deg": pc.cast(b["deg"], pa.int64())}),
                batch_format="pyarrow").materialize()
        alive = deg.map_batches(
            lambda b: b.filter(pc.greater_equal(b["deg"], k))
            .select(["tok"]), batch_format="pyarrow").materialize()
        if r == rounds - 1:
            return deg.map_batches(
                lambda b: b.filter(pc.greater_equal(b["deg"], k)),
                batch_format="pyarrow")
        und = _semi(_semi(und, alive, "src"), alive, "dst").materialize()
    return deg


def sssp_weighted(sf_dir: str, source: str = "customer",
                  rounds: int = 3):
    """(token, dist) — single-source WEIGHTED shortest paths
    (Bellman-Ford, `rounds` synchronous relaxation rounds) over the
    directed token bigram graph with integer edge cost
    1_000_000 // bigram_count (rarer transitions cost more — the
    inverse-popularity metric a query-suggestion graph walks). BFS
    (bfs_token_distances) counts hops; this relaxes COSTS, so a
    2-hop path through common bigrams can beat a 1-hop rare edge —
    the oracle corpus exhibits that (asserted in the test).

    Same two-exchange round topology as BFS: tag-and-union co-locates
    the partitioned distance vector with out-edges by src, proposals
    (dst, d + wgt) min-reduce keyed by token against the previous
    vector. min is idempotent, so proposing from all known nodes each
    round is safe. Oracle: unrolled d0..dK CTEs with the identical
    integer weight — Bellman-Ford after k rounds is exactly the
    min over paths of <= k edges, a well-defined (hash-stable)
    intermediate even when longer paths would still improve."""
    from ..stages.grouped import bucketed_group_map

    base = _bigram_edges(sf_dir)

    def weight(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "wgt": pa.array(1_000_000 // w, pa.int64())})

    edges = base.map_batches(weight, batch_format="pyarrow").materialize()
    dist = ray.data.from_arrow(pa.table({
        "tok": pa.array([source], pa.string()),
        "d": pa.array([0], pa.int64()),
    }))

    def relax_bucket(df: pd.DataFrame) -> pa.Table:
        isd = df["is_d"].to_numpy(np.int8) == 1
        known = df.loc[isd].groupby("key", as_index=False)["d"].min()
        ed = df.loc[~isd, ["key", "dst", "wgt"]]
        j = ed.merge(known, on="key", how="inner")
        return pa.table({
            "tok": pa.array(j["dst"].to_numpy(object).tolist(), pa.string()),
            "d": pa.array(j["d"].to_numpy(np.int64)
                          + j["wgt"].to_numpy(np.int64), pa.int64()),
        })

    def min_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("tok", as_index=False)["d"].min()
        return pa.table({
            "tok": pa.array(g["tok"].to_numpy(object).tolist(), pa.string()),
            "d": pa.array(g["d"].to_numpy(np.int64), pa.int64()),
        })

    for _ in range(rounds):
        tagged = edges.map_batches(
            lambda b: pa.table({
                "key": b["src"], "dst": b["dst"], "wgt": b["wgt"],
                "d": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "is_d": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }), batch_format="pyarrow") \
            .union(dist.map_batches(
                lambda b: pa.table({
                    "key": b["tok"],
                    "dst": pa.array([""] * b.num_rows, pa.string()),
                    "wgt": pa.array(np.zeros(b.num_rows, np.int64),
                                    pa.int64()),
                    "d": b["d"],
                    "is_d": pa.array(np.ones(b.num_rows, np.int8),
                                     pa.int8()),
                }), batch_format="pyarrow"))
        props = bucketed_group_map(tagged, "key", relax_bucket,
                                   num_buckets=8)
        dist = bucketed_group_map(dist.union(props), "tok", min_bucket,
                                  num_buckets=8).materialize()

    return dist.map_batches(
        lambda b: pa.table({"token": b["tok"], "dist": b["d"]}),
        batch_format="pyarrow")
