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
  2. bucketed groupby(fp) → candidate pairs (output-scale).
  3. rendezvous-by-pair verify: each participating doc ships its text
     to its pair ids; the pair bucket computes the EXACT answer —
     distinct shared min_len-grams (SQL-parity, oracle-checked) or the
     exact longest-common-substring length via generalized suffix
     array + Kasai LCP (not SQL-expressible; pytest vs DP brute force).

The shuffles are proportional to corpus fingerprints (step 2) and to
candidate pairs × text size (step 3) — the corpus text never crosses a
shuffle unpaired and is never read on the driver.
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


def _candidate_pairs(ds, gram: int, window: int,
                     max_driver_pairs: int) -> tuple[list[int], list[int]]:
    """Winnow-fingerprint LSH: fp rows → bucketed groupby(fp) → deduped
    candidate (l<r) pair list, pulled to the driver (output-scale, same
    gate as text.ngram_jaccard_pairs)."""

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

    cand = bucketed_group_map(fps, "fp", pairs_bucket, num_buckets=32)

    seen: set[tuple[int, int]] = set()
    pl: list[int] = []
    pr: list[int] = []
    for b in cand.iter_batches(batch_format="pyarrow"):
        for l, r in zip(b["left_id"].to_pylist(), b["right_id"].to_pylist()):
            key = (l, r) if l < r else (r, l)
            if key not in seen:
                seen.add(key)
                pl.append(key[0])
                pr.append(key[1])
        if len(seen) > max_driver_pairs:
            raise ValueError(
                f"candidate pairs exceed max_driver_pairs={max_driver_pairs}; "
                "raise min_len (longer fingerprint grams) for this corpus")
    return pl, pr


def _pair_text_shards(ds, pl: list[int], pr: list[int]):
    """Rendezvous shuffle: (pid, doc_id, text) rows, one per (pair, side)."""
    import ray

    routing: dict[int, list[int]] = {}
    for pid, (l, r) in enumerate(zip(pl, pr)):
        routing.setdefault(l, []).append(pid)
        routing.setdefault(r, []).append(pid)
    rref = ray.put(routing)

    def ship_text(batch: pa.Table) -> pa.Table:
        rmap = ray.get(rref)
        out_pid, out_did, out_t = [], [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            pids = rmap.get(did)
            if not pids:
                continue
            for pid in pids:
                out_pid.append(pid)
                out_did.append(did)
                out_t.append(t)
        return pa.table({"pid": pa.array(out_pid, pa.int64()),
                         "doc_id": pa.array(out_did, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    return ds.map_batches(ship_text, batch_format="pyarrow")


def common_substring_pairs(sf_dir: str, min_len: int = 24,
                           max_driver_pairs: int = 50_000_000):
    """EXACT pairs of documents sharing >= 1 common substring of length
    `min_len`, with the count of DISTINCT shared min_len-char grams —
    DuckDB-oracle-checked (gram-unnest self-join SQL). Candidates come
    from winnowing fingerprints (recall 1 for this predicate, see module
    docstring); the verify intersects the pair's actual char-gram STRING
    sets, so the output is hash-exact vs the SQL regardless of any
    fingerprint hash collisions. Returns (left_id, right_id, n_shared)."""
    import ray

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])
    gram, window = _winnow_params(min_len)
    pl, pr = _candidate_pairs(ds, gram, window, max_driver_pairs)
    empty_out = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "n_shared": pa.array([], pa.int64())})
    if not pl:
        return ray.data.from_arrow(empty_out)
    shards = _pair_text_shards(ds, pl, pr)
    lref = ray.put((np.asarray(pl, dtype=np.int64), np.asarray(pr, dtype=np.int64)))

    def verify_bucket(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty_out
        apl, apr = ray.get(lref)
        out_l, out_r, out_n = [], [], []
        for pid, g in df.groupby("pid", sort=False):
            g = g.drop_duplicates("doc_id")
            if len(g) != 2:
                continue
            a = g["text"].iloc[0]
            b = g["text"].iloc[1]
            ga = {a[i:i + min_len] for i in range(len(a) - min_len + 1)}
            gb = {b[i:i + min_len] for i in range(len(b) - min_len + 1)}
            n_sh = len(ga & gb)
            if n_sh:
                out_l.append(int(apl[pid]))
                out_r.append(int(apr[pid]))
                out_n.append(n_sh)
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "n_shared": pa.array(out_n, pa.int64())})

    return bucketed_group_map(shards, "pid", verify_bucket, num_buckets=32)


def lcs_pairs(sf_dir: str, min_len: int = 24,
              max_driver_pairs: int = 50_000_000):
    """Pairs with longest-common-substring length >= min_len, with the
    EXACT LCS length computed by a generalized suffix array + Kasai LCP
    over the concatenated pair (functions/suffixes.py). Same candidate
    channel (recall 1: lcs >= min_len implies a shared min_len-gram
    implies a shared winnow fingerprint). Not SQL-expressible — pytest
    verifies vs the O(n*m) DP brute force. Returns
    (left_id, right_id, lcs_len)."""
    import ray

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])
    gram, window = _winnow_params(min_len)
    pl, pr = _candidate_pairs(ds, gram, window, max_driver_pairs)
    empty_out = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "lcs_len": pa.array([], pa.int64())})
    if not pl:
        return ray.data.from_arrow(empty_out)
    shards = _pair_text_shards(ds, pl, pr)
    lref = ray.put((np.asarray(pl, dtype=np.int64), np.asarray(pr, dtype=np.int64)))

    def verify_bucket(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty_out
        apl, apr = ray.get(lref)
        out_l, out_r, out_n = [], [], []
        for pid, g in df.groupby("pid", sort=False):
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
                out_l.append(int(apl[pid]))
                out_r.append(int(apr[pid]))
                out_n.append(n_lcs)
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "lcs_len": pa.array(out_n, pa.int64())})

    return bucketed_group_map(shards, "pid", verify_bucket, num_buckets=32)


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
