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
