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
        ids, terms, tfs = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            uniq, cnt = np.unique(np.asarray(t.split(" "), dtype=object),
                                  return_counts=True)
            ids.extend([d] * len(uniq))
            terms.extend(uniq.tolist())
            tfs.extend(cnt.tolist())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "term": pa.array(terms, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

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
        texts = batch["text"].to_pylist()
        dl = np.empty(len(texts), dtype=np.int64)
        tf = np.zeros((len(q), len(texts)), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = t.split(" ")
            dl[i] = len(toks)
            for j, term in enumerate(q):
                tf[j, i] = toks.count(term)
        cols = {"doc_id": batch["doc_id"],
                "dl": pa.array(dl, pa.int64())}
        for j in range(len(q)):
            cols[f"tf{j}"] = pa.array(tf[j], pa.int64())
            cols[f"hit{j}"] = pa.array((tf[j] > 0).astype(np.int64), pa.int64())
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
