"""Suffix-array / winnowing substring-fingerprint dedup over `documents`.

The third signature channel from the north-star inventory (MinHash,
SimHash, suffix-array substring fingerprints): documents sharing long
exact substrings — near-verbatim quotation, boilerplate, template
reuse — which Jaccard-style set similarity under-weights (a long quote
inside an otherwise-different document barely moves shingle Jaccard).

Topology (same scale shape as text.ngram_jaccard_pairs):
  1. map_batches → (fp, doc_id) winnowing fingerprint rows. Winnowing
     (functions/suffixes.py) ships O(n/window) keys per doc and
     GUARANTEES a shared fingerprint for any pair with a common
     substring of length >= gram + window - 1, so candidate recall for
     the `min_len` predicate is exactly 1.
  2. bucketed groupby(fp) → candidate pairs (output-scale), globally
     deduped by a canonical-pair-hash exchange (slim: 24 B/pair).
  3. doc-keyed rendezvous: endpoint routing rows meet the (doc_id,
     text) table — the one corpus-proportional exchange — then each
     pair's two texts meet in a pair-hash bucket that computes the
     EXACT answer: distinct shared min_len-grams (SQL-parity,
     oracle-checked) or the exact longest-common-substring length via
     generalized suffix array + Kasai LCP (not SQL-expressible; pytest
     vs DP brute force).

Nothing is materialized on the driver (round 3 removed the pair pull +
routing broadcast); the verify exchange ships exactly 2 texts per
unique candidate pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions import suffixes
from ..stages.grouped import bucketed_group_map


def _read_documents(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _winnow_params(min_len: int) -> tuple[int, int]:
    """gram/window split for a detection threshold: gram + window - 1 =
    min_len, gram as large as possible (fewer spurious gram collisions)
    while keeping a window >= 4 for density ~2/(w+1)."""
    window = max(4, min_len // 3)
    gram = min_len - window + 1
    return gram, window


def _pair_text_rendezvous(ds, gram: int, window: int,
                          num_buckets: int = 32):
    """Distributed candidate channel + text rendezvous (no driver
    materialization anywhere — round 3 removed the pair pull + routing
    broadcast this module used to share with text.ngram_jaccard_pairs):

      1. fp shuffle: winnow (fp, doc_id) rows → per-bucket candidate
         (l < r) pairs (cross-bucket duplicates possible);
      2. pair-dedup exchange keyed by the canonical pair hash — every
         duplicate of a pair lands in one bucket and survives once;
         the bucket emits TWO endpoint routing rows per unique pair;
      3. doc rendezvous: routing rows tag-and-union with the slim
         (doc_id, text) table bucketed by doc_id; each participating
         doc's text is attached to every routing row.  The single
         corpus-proportional exchange; the verify exchange that
         follows is candidate-proportional (2 texts per unique pair).

    Returns a Dataset of (pkey, left_id, right_id, doc_id, text) —
    group by pkey and verify by (left_id, right_id) inside the bucket
    (pkey hash collisions are harmless: it only routes)."""
    from ..functions.hashing import mix_u64

    def _pkey(l: np.ndarray, r: np.ndarray) -> np.ndarray:
        return mix_u64(mix_u64(l.astype(np.uint64), 0x9E37)
                       ^ r.astype(np.uint64), 0x85EB).view(np.int64)

    def fp_rows(batch: pa.Table) -> pa.Table:
        out_f, out_d = [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            fps = suffixes.winnow_fingerprints(t, gram, window)
            if not len(fps):
                continue
            out_f.append(fps.view(np.int64))
            out_d.append(np.full(len(fps), did, dtype=np.int64))
        if not out_f:
            return pa.table({"fp": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({"fp": pa.array(np.concatenate(out_f), pa.int64()),
                         "doc_id": pa.array(np.concatenate(out_d), pa.int64())})

    fps = ds.map_batches(fp_rows, batch_format="pyarrow")

    def pairs_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["fp", "doc_id"]).sort_values(
            ["fp", "doc_id"], kind="stable")
        keys = df["fp"].to_numpy()
        docs = df["doc_id"].to_numpy()
        _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
        coll = counts >= 2
        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64())})
        if not coll.any():
            return empty
        li_p, ri_p = [], []
        starts_c, counts_c = starts[coll], counts[coll]
        for csz in np.unique(counts_c):
            gl, gr = np.triu_indices(int(csz), k=1)
            st = starts_c[counts_c == csz]
            li_p.append((st[:, None] + gl[None, :]).ravel())
            ri_p.append((st[:, None] + gr[None, :]).ravel())
        li = np.concatenate(li_p)
        ri = np.concatenate(ri_p)
        out = pd.DataFrame({"left_id": docs[li], "right_id": docs[ri]}) \
            .drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    cand = bucketed_group_map(fps, "fp", pairs_bucket,
                              num_buckets=num_buckets)

    def add_pkey(batch: pa.Table) -> pa.Table:
        if "left_id" not in batch.column_names:
            # zero-column empty block from a sentinel-only bucket
            # (hash-shuffle strategy) — same guard as _add_bucket
            return pa.table({"pkey": pa.array([], pa.int64()),
                             "left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64())})
        l = batch["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pkey": pa.array(_pkey(l, r), pa.int64()),
                         "left_id": pa.array(l, pa.int64()),
                         "right_id": pa.array(r, pa.int64())})

    def route_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["left_id", "right_id"])
        l = df["left_id"].to_numpy(np.int64)
        r = df["right_id"].to_numpy(np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([l, r]), pa.int64()),
            "left": pa.array(np.concatenate([l, l]), pa.int64()),
            "right": pa.array(np.concatenate([r, r]), pa.int64()),
            "text": pa.array([""] * (2 * len(df)), pa.string()),
        })

    routes = bucketed_group_map(cand.map_batches(add_pkey,
                                                 batch_format="pyarrow"),
                                "pkey", route_bucket,
                                num_buckets=num_buckets)

    def text_rows(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "left": pa.array(np.full(m, -1, np.int64), pa.int64()),
            "right": pa.array(np.full(m, -1, np.int64), pa.int64()),
            "text": batch["text"].cast(pa.string()),
        })

    tagged = ds.map_batches(text_rows, batch_format="pyarrow").union(routes)
    empty_sh = pa.table({"pkey": pa.array([], pa.int64()),
                         "left_id": pa.array([], pa.int64()),
                         "right_id": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "text": pa.array([], pa.string())})

    def rendezvous_bucket(df: pd.DataFrame) -> pa.Table:
        is_route = df["left"].to_numpy(np.int64) >= 0
        routes_df = df[is_route]
        if routes_df.empty:
            return empty_sh
        texts = df[~is_route].drop_duplicates("doc_id") \
            .set_index("doc_id")["text"]
        keep = routes_df["doc_id"].isin(texts.index)
        routes_df = routes_df[keep]
        l = routes_df["left"].to_numpy(np.int64)
        r = routes_df["right"].to_numpy(np.int64)
        return pa.table({
            "pkey": pa.array(_pkey(l, r), pa.int64()),
            "left_id": pa.array(l, pa.int64()),
            "right_id": pa.array(r, pa.int64()),
            "doc_id": pa.array(routes_df["doc_id"].to_numpy(np.int64),
                               pa.int64()),
            "text": pa.array(texts[routes_df["doc_id"]].tolist(),
                             pa.string()),
        })

    return bucketed_group_map(tagged, "doc_id", rendezvous_bucket,
                              num_buckets=num_buckets)


def common_substring_pairs(sf_dir: str, min_len: int = 24,
                           max_driver_pairs: int | None = None):
    """EXACT pairs of documents sharing >= 1 common substring of length
    `min_len`, with the count of DISTINCT shared min_len-char grams —
    DuckDB-oracle-checked (gram-unnest self-join SQL). Candidates come
    from winnowing fingerprints (recall 1 for this predicate, see module
    docstring); the verify intersects the pair's actual char-gram STRING
    sets, so the output is hash-exact vs the SQL regardless of any
    fingerprint hash collisions. `max_driver_pairs` is retained for API
    compatibility but ignored (no driver materialization remains).
    Returns (left_id, right_id, n_shared)."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])
    gram, window = _winnow_params(min_len)
    shards = _pair_text_rendezvous(ds, gram, window)
    empty_out = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "n_shared": pa.array([], pa.int64())})

    def verify_bucket(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty_out
        out_l, out_r, out_n = [], [], []
        for (l, r), g in df.groupby(["left_id", "right_id"], sort=False):
            g = g.drop_duplicates("doc_id")
            if len(g) != 2:
                continue
            a = g["text"].iloc[0]
            b = g["text"].iloc[1]
            ga = {a[i:i + min_len] for i in range(len(a) - min_len + 1)}
            gb = {b[i:i + min_len] for i in range(len(b) - min_len + 1)}
            n_sh = len(ga & gb)
            if n_sh:
                out_l.append(int(l))
                out_r.append(int(r))
                out_n.append(n_sh)
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "n_shared": pa.array(out_n, pa.int64())})

    return bucketed_group_map(shards, "pkey", verify_bucket, num_buckets=32)


def lcs_pairs(sf_dir: str, min_len: int = 24,
              max_driver_pairs: int | None = None):
    """Pairs with longest-common-substring length >= min_len, with the
    EXACT LCS length computed by a generalized suffix array + Kasai LCP
    over the concatenated pair (functions/suffixes.py). Same candidate
    channel (recall 1: lcs >= min_len implies a shared min_len-gram
    implies a shared winnow fingerprint). Not SQL-expressible — pytest
    verifies vs the O(n*m) DP brute force. `max_driver_pairs` is
    retained for API compatibility but ignored. Returns
    (left_id, right_id, lcs_len)."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])
    gram, window = _winnow_params(min_len)
    shards = _pair_text_rendezvous(ds, gram, window)
    empty_out = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "lcs_len": pa.array([], pa.int64())})

    def verify_bucket(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty_out
        out_l, out_r, out_n = [], [], []
        for (l, r), g in df.groupby(["left_id", "right_id"], sort=False):
            g = g.drop_duplicates("doc_id")
            if len(g) != 2:
                continue
            # texts are compared as UTF-8 bytes; a char LCS of length k
            # is a byte LCS of length >= k, and for the ASCII corpus the
            # two are identical (the oracle-checked sibling query pins
            # char semantics; this one reports byte-exact LCS)
            n_lcs = suffixes.longest_common_substring_len(
                g["text"].iloc[0].encode("utf-8"),
                g["text"].iloc[1].encode("utf-8"))
            if n_lcs >= min_len:
                out_l.append(int(l))
                out_r.append(int(r))
                out_n.append(n_lcs)
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "lcs_len": pa.array(out_n, pa.int64())})

    return bucketed_group_map(shards, "pkey", verify_bucket, num_buckets=32)


def edit_distance_pairs(sf_dir: str, k: int = 4, max_dist: int = 10):
    """(left_id, right_id, edit_dist) — near-duplicate pairs by EXACT
    Levenshtein distance <= max_dist among documents sharing a
    first-`k`-token content prefix: the edit-distance dedup channel
    (the fourth signature family next to MinHash/SimHash/substring
    fingerprints — catches small in-place edits that shift every
    downstream shingle).

    One fp-hash shuffle ships (fp, doc_id, text); inside a bucket every
    prefix-collision pair runs the VECTORIZED two-row DP
    (functions/suffixes.levenshtein_rowdp — numpy scan per character,
    no Python inner loop). Work is O(pairs · len²) and pairs are
    bounded by the prefix banding (same candidate discipline the
    reference's similarity detection applies before verify,
    similarity_detection.c D3); the SQL oracle mirrors the banding so
    the match is exact, not sampled."""
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def fp_rows(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        fp = pc.binary_join(pc.list_slice(toks, 0, k), " ")
        return pa.table({"fp": fp, "doc_id": batch["doc_id"].cast(pa.int64()),
                         "text": batch["text"]})

    rows = ds.map_batches(fp_rows, batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pa.Table:
        out_l, out_r, out_d = [], [], []
        for _, g in df.groupby("fp", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy(np.int64)
            texts = [t.encode() for t in g["text"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if abs(len(texts[i]) - len(texts[j])) > max_dist:
                        continue  # length bound: dist >= len gap
                    d = suffixes.levenshtein_rowdp(texts[i], texts[j])
                    if d <= max_dist:
                        out_l.append(ids[i])
                        out_r.append(ids[j])
                        out_d.append(d)
        return pa.table({
            "left_id": pa.array(out_l, pa.int64()),
            "right_id": pa.array(out_r, pa.int64()),
            "edit_dist": pa.array(out_d, pa.int64()),
        })

    return bucketed_group_map(rows, "fp", verify, num_buckets=16)
