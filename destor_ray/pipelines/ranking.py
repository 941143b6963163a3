"""Corpus-statistics ranking operators over `documents`: TF-IDF top
terms per document and BM25 scoring against a fixed query — the
relevance/importance passes a training-data pipeline runs for data
selection and retrieval-based filtering.

Scale shapes (both single-text-pass):

  * `tfidf_top_terms` — postings (doc_id, term, tf) are emitted
    map-side (one row per DISTINCT term per doc, never one per token),
    document frequency is a groupby over those, the DF join reuses the
    SAME term hash partitioning (Dataset.join), and the per-doc top-k is
    a second keyed reduce. Two shuffles total, both over the narrow
    postings table — the text column never crosses the wire.

  * `bm25_scores` — the query side is tiny by construction, so the job
    reduces the corpus to a NARROW per-doc feature table (dl + one tf
    per query term) in one map pass, takes global stats (N, avgdl, df)
    with a shuffle-free global aggregate, and scores map-only with the
    stats as broadcast constants. Zero keyed shuffles.

Tokenization is single-space split — identical to text.token_count and
exactly DuckDB's string_split(text, ' '), so the oracles share
semantics bit-for-bit; scores are rounded to 6 decimals on BOTH sides
before the top-k rank so fp ulp noise cannot flip an ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _read_documents(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def tfidf_top_terms(sf_dir: str, k: int = 3, num_partitions: int = 8):
    """(doc_id, term, tf, df, score): top-k terms per document by
    TF-IDF, score = round(tf * ln(N / df), 6), ties broken by term asc.
    """
    from ray.data.aggregate import Count

    ds = _read_documents(sf_dir)
    n_docs = float(ds.count())  # parquet metadata, no scan

    def postings(batch: pa.Table) -> pa.Table:
        # vectorized: one Arrow split over the whole batch, doc ids
        # repeated by token-list length, then a single C-level groupby
        # over (doc_id, term) — no per-row Python loop
        toks = pc.split_pattern(batch["text"], " ").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        did = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), lens)
        flat = pc.list_flatten(toks)
        g = pa.table({"doc_id": pa.array(did, pa.int64()), "term": flat}) \
            .group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "term", "tf"])

    posts = ds.map_batches(postings, batch_format="pyarrow")
    df = posts.groupby("term").aggregate(Count(alias_name="df"))
    joined = posts.join(df, "inner", num_partitions, on=("term",))

    def topk(g: pd.DataFrame) -> pa.Table:
        score = np.round(g["tf"].to_numpy(np.float64)
                         * np.log(n_docs / g["df"].to_numpy(np.float64)), 6)
        g = g.assign(score=score).sort_values(
            ["score", "term"], ascending=[False, True], kind="stable").head(k)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "term": pa.array(g["term"].tolist(), pa.string()),
            "tf": pa.array(g["tf"].to_numpy(np.int64), pa.int64()),
            "df": pa.array(g["df"].to_numpy(np.int64), pa.int64()),
            "score": pa.array(g["score"].to_numpy(np.float64), pa.float64()),
        })

    return joined.groupby("doc_id").map_groups(topk, batch_format="pandas")


DEFAULT_BM25_QUERY = ("table", "data", "system")


def bm25_scores(sf_dir: str, query: tuple[str, ...] = DEFAULT_BM25_QUERY,
                k1: float = 1.2, b: float = 0.75):
    """(doc_id, bm25) for every document containing >= 1 query term:
    Okapi BM25 with idf = ln((N - df + 0.5) / (df + 0.5) + 1).
    Per-term contributions are summed in query order on both sides."""
    from ray.data.aggregate import Count, Sum

    ds = _read_documents(sf_dir)
    q = list(query)

    def featurize(batch: pa.Table) -> pa.Table:
        # vectorized: dl = spaces+1 (== len(split(' '))); per-term tf via
        # one list-equality reduce per query term — no Python tokenizing
        toks = pc.split_pattern(batch["text"], " ").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        row = np.repeat(np.arange(len(batch)), lens)
        cols = {"doc_id": batch["doc_id"],
                "dl": pa.array(lens.astype(np.int64), pa.int64())}
        for j, term in enumerate(q):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(row[hit], minlength=len(batch)).astype(np.int64)
            cols[f"tf{j}"] = pa.array(tf, pa.int64())
            cols[f"hit{j}"] = pa.array((tf > 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    # narrow per-doc feature table: 2 + 2*len(q) int64s per doc — the
    # deliberate-materialize pattern (one text pass serves stats + score)
    narrow = ds.map_batches(featurize, batch_format="pyarrow").materialize()
    aggs = [Count(alias_name="n_docs"), Sum("dl", alias_name="sum_dl")]
    aggs += [Sum(f"hit{j}", alias_name=f"df{j}") for j in range(len(q))]
    st = narrow.aggregate(*aggs)
    n, avgdl = float(st["n_docs"]), float(st["sum_dl"]) / float(st["n_docs"])
    idf = [float(np.log((n - float(st[f"df{j}"]) + 0.5)
                        / (float(st[f"df{j}"]) + 0.5) + 1.0))
           for j in range(len(q))]

    def score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        total = np.zeros(len(batch), dtype=np.float64)
        for j in range(len(q)):
            tf = batch[f"tf{j}"].to_numpy(zero_copy_only=False).astype(np.float64)
            total += idf[j] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        keep = total > 0
        return pa.table({
            "doc_id": pa.array(
                batch["doc_id"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
            "bm25": pa.array(np.round(total[keep], 6), pa.float64()),
        })

    return narrow.map_batches(score, batch_format="pyarrow")
