"""Text-analysis + dedup operators over the driver `documents` table
(doc_id:int64, text:string, lang:string, source:string, n_chars:int64).

These re-express destor's dedup machinery on a text corpus (the
reference operates on byte streams; the semantics — exact dedup by
content hash, similarity via sampled features, container utilization,
top-k by referenced bytes — are identical) plus the text-analysis
operators a large-scale training-data pipeline needs (language id,
quality scoring, token counting, fingerprinting).

Every SQL-expressible op has a DuckDB oracle in __ray_entry__.oracle_sql
with IDENTICAL column names. Keep both sides in sync.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import EngineConfig
from ..functions import hashing, minhash


def _read_documents(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# D2 analog: exact dedup by content hash (groupby keep-first)
# ---------------------------------------------------------------------------

def exact_dedup_docs(sf_dir: str):
    """md5(text) → (h, keeper_id, n_copies). Oracle: GROUP BY md5(text)."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "h": pa.array(hs, pa.string())})

    from ray.data.aggregate import Count, Min
    out = ds.map_batches(add_hash, batch_format="pyarrow") \
        .groupby("h").aggregate(Min("doc_id", alias_name="keeper_id"),
                                Count(alias_name="n_copies"))
    return out


# ---------------------------------------------------------------------------
# Text analysis: token counting / quality / language id / fingerprint
# ---------------------------------------------------------------------------

def token_count(sf_dir: str):
    """(doc_id, n_tokens) where n_tokens counts single-space splits —
    semantics chosen to be oracle-expressible (len(string_split(text,' '')))."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        n = [len(t.split(" ")) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": pa.array(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


_PUNCT_RE = re.compile(r"[^\w\s]")
_ALPHA_RE = re.compile(r"[A-Za-z]")


def quality_score(sf_dir: str):
    """(doc_id, text_len, n_punct, n_alpha) — length/punctuation/alpha
    counts (quality-scoring features; all integer so the oracle hash is
    exact)."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "text_len": pa.array([len(t) for t in texts], pa.int64()),
            "n_punct": pa.array([len(_PUNCT_RE.findall(t)) for t in texts], pa.int64()),
            "n_alpha": pa.array([len(_ALPHA_RE.findall(t)) for t in texts], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class LangIdStage:
    """Language-ID heuristic as an actor-pool stage: stopword-hit ratios
    per language, tables built once per actor (__init__), vectorized-ish
    scoring per batch. No SQL oracle (rows-only check)."""

    STOPWORDS = {
        "en": {"the", "and", "of", "a", "to", "in", "is", "for", "on", "with"},
        "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"},
        "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"},
        "es": {"el", "la", "los", "y", "es", "un", "una", "de", "en", "por"},
    }

    def __init__(self) -> None:
        self.tables = {lang: frozenset(ws) for lang, ws in self.STOPWORDS.items()}
        self.word_re = re.compile(r"[a-zA-Z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            toks = [w.lower() for w in self.word_re.findall(t)]
            if not toks:
                preds.append("unknown")
                continue
            scores = {lang: sum(w in tbl for w in toks) for lang, tbl in self.tables.items()}
            best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            preds.append(best[0] if best[1] > 0 else "unknown")
        return pa.table({"doc_id": batch["doc_id"],
                         "pred_lang": pa.array(preds, pa.string())})


def lang_id(sf_dir: str):
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          batch_size=2048, concurrency=2)


def doc_fingerprint(sf_dir: str):
    """(doc_id, simhash, minhash_min) — 64-bit SimHash over word-3-gram
    shingles + the minimum MinHash slot (document fingerprinting).
    Deterministic; rows-only check (no SQL equivalent)."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        sims, mins = [], []
        for t in batch["text"].to_pylist():
            sh = hashing.char_shingles_u64(t, 5)
            sims.append(np.int64(np.uint64(minhash.simhash64(sh)).view(np.int64)) if len(sh) else 0)
            mins.append(np.int64(minhash.bottomk_signature(sh, 1)[0].view(np.int64)) if len(sh) else 0)
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(np.asarray(sims, dtype=np.int64), pa.int64()),
                         "minhash_min": pa.array(np.asarray(mins, dtype=np.int64), pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Near-dup dedup over documents (MinHash-LSH / SimHash / n-gram Jaccard)
# ---------------------------------------------------------------------------

def minhash_lsh_docs(sf_dir: str, threshold: float = 0.6):
    """Near-dup clusters over document text via MinHash-LSH + verified
    n-gram Jaccard + connected components. Returns (doc_id, cluster_id)
    for every doc. Rows-only check (clusters are not SQL-expressible)."""
    from ..stages import cluster as cl
    cfg = EngineConfig()
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def sig_fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        parts = [hashing.char_shingles_u64(t, cfg.lsh.shingle_k) for t in texts]
        offs = np.zeros(len(parts) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in parts], out=offs[1:])
        flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
        sig = minhash.minhash_signatures_flat(flat, offs, cfg.lsh.num_perms, cfg.seed)
        bands = minhash.band_keys(sig, cfg.lsh.num_bands, cfg.lsh.rows_per_band, cfg.seed)
        ids = batch["doc_id"].to_pylist()
        n = len(ids)
        key = bands.reshape(-1).view(np.int64)
        rep_ids = np.repeat(np.asarray(ids, dtype=np.int64), cfg.lsh.num_bands)
        sigl = np.repeat(sig.view(np.int64)[:, None, :], cfg.lsh.num_bands, axis=1).reshape(n * cfg.lsh.num_bands, -1)
        return pa.table({
            "band_key": pa.array(key, pa.int64()),
            "doc_id": pa.array(rep_ids, pa.int64()),
            "sig": pa.array(list(sigl), pa.list_(pa.int64())),
        })

    bands = ds.map_batches(sig_fn, batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates("doc_id").sort_values("doc_id")
        g = len(df)
        if g < 2:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64())})
        sigs = np.asarray([np.asarray(s) for s in df["sig"]], dtype=np.int64)
        ids = df["doc_id"].to_numpy()
        li, ri = np.triu_indices(g, k=1)
        est = (sigs[li] == sigs[ri]).mean(axis=1)
        ok = est >= threshold
        return pa.table({"left_id": pa.array(ids[li[ok]], pa.int64()),
                         "right_id": pa.array(ids[ri[ok]], pa.int64())})

    from ..stages.grouped import bucketed_group_map

    def verify_bucket_docs(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["band_key", "doc_id"]).sort_values(
            ["band_key", "doc_id"], kind="stable")
        keys = df["band_key"].to_numpy()
        n = len(df)
        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64())})
        if n < 2:
            return empty
        _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
        coll = counts >= 2
        if not coll.any():
            return empty
        li_p, ri_p = [], []
        for s0, c0 in zip(starts[coll], counts[coll]):
            gl, gr = np.triu_indices(int(c0), k=1)
            li_p.append(gl + s0)
            ri_p.append(gr + s0)
        li = np.concatenate(li_p)
        ri = np.concatenate(ri_p)
        sigs = np.asarray([np.asarray(x) for x in df["sig"]], dtype=np.int64)
        ids = df["doc_id"].to_numpy()
        est = (sigs[li] == sigs[ri]).mean(axis=1)
        ok = est >= threshold
        return pa.table({"left_id": pa.array(ids[li[ok]], pa.int64()),
                         "right_id": pa.array(ids[ri[ok]], pa.int64())})

    edges = bucketed_group_map(bands, "band_key", verify_bucket_docs, num_buckets=64)

    # doc tables are small-side: exact driver CC (vectorized min-label
    # propagation) + broadcast assignment — same hybrid as the flagship
    import ray

    from ..stages.cluster import connected_components_numpy
    ls, rs = [], []
    for b in edges.iter_batches(batch_format="pyarrow"):
        ls.append(np.asarray(b["left_id"].to_numpy(zero_copy_only=False), dtype=np.int64))
        rs.append(np.asarray(b["right_id"].to_numpy(zero_copy_only=False), dtype=np.int64))
    if ls and sum(len(x) for x in ls):
        nodes, labels = connected_components_numpy(np.concatenate(ls), np.concatenate(rs))
    else:
        nodes = np.empty(0, dtype=np.int64)
        labels = np.empty(0, dtype=np.int64)
    ref = ray.put((nodes, labels))

    def assign(batch: pa.Table) -> pa.Table:
        nd, lb = ray.get(ref)
        dids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        out = dids.copy()
        if len(nd):
            pos = np.minimum(np.searchsorted(nd, dids), len(nd) - 1)
            hit = nd[pos] == dids
            out[hit] = lb[pos[hit]]
        return pa.table({"doc_id": pa.array(dids, pa.int64()),
                         "cluster_id": pa.array(out, pa.int64())})

    return ds.select_columns(["doc_id"]).map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Aggregation analogs of destor's container metrics (HAR / CAP / stats)
# ---------------------------------------------------------------------------

def container_refs(sf_dir: str):
    """HAR utilization analog (har_rewrite.c:61-81): treating `source` as
    the container id, count references and bytes per container."""
    from ray.data.aggregate import Count, Sum
    ds = _read_documents(sf_dir).select_columns(["source", "n_chars"])
    return ds.groupby("source").aggregate(
        Count(alias_name="refs"), Sum("n_chars", alias_name="ref_bytes"))


def cap_top_containers(sf_dir: str, k: int = 10):
    """CAP analog (cap_rewrite.c:10-35): top-k containers by referenced
    bytes, deterministic tie-break on container id."""
    from ray.data.aggregate import Sum
    ds = _read_documents(sf_dir).select_columns(["source", "n_chars"])
    agg = ds.groupby("source").aggregate(Sum("n_chars", alias_name="ref_bytes"))
    return agg.sort(["ref_bytes", "source"], descending=[True, False]).limit(k)


def docs_stats_by_lang(sf_dir: str):
    """Per-job accounting analog (do_backup.c:99-209): grouped counters."""
    from ray.data.aggregate import Count, Max, Min, Sum
    ds = _read_documents(sf_dir).select_columns(["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"))


# ---------------------------------------------------------------------------
# D3 parity: similarity-sampled segment routing with champion selection
# ---------------------------------------------------------------------------

def segment_routing(sf_dir: str, top_k: int = 2, ratio: int = 16,
                    value_len: int = 8):
    """Extreme-Binning/SiLo-style segment routing (SURVEY.md §2.5 D3):
    doc = segment, features = min-sampled shingle fingerprints
    (sampling_method.c:12-75), feature → last `value_len` segment ids
    (the kv-store FIFO, kvstore_htable.c:46-54, here min-ids for
    determinism), and per query segment the greedy champion top-k with
    feature trim ported from top_segment_select
    (similarity_detection.c:49-126). Returns
    (doc_id, champion_rank, champion_doc_id); rows-only check."""
    from ..functions import sampling
    from ..stages.grouped import bucketed_group_map

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def features_fn(batch: pa.Table) -> pa.Table:
        ids, feats = [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = hashing.char_shingles_u64(t, 5)
            fs = sampling.sample_min(sh, ratio)
            ids.append(np.full(len(fs), did, dtype=np.int64))
            feats.append(fs.view(np.int64))
        return pa.table({
            "feature": pa.array(np.concatenate(feats), pa.int64()),
            "doc_id": pa.array(np.concatenate(ids), pa.int64()),
        })

    feat_rows = ds.map_batches(features_fn, batch_format="pyarrow")

    def postings_bucket(df: pd.DataFrame) -> pa.Table:
        # feature → candidate pairs (query_doc, cand_doc, feature), with the
        # posting list truncated to `value_len` ids (kv-store value length)
        df = df.drop_duplicates(["feature", "doc_id"]).sort_values(
            ["feature", "doc_id"], kind="stable")
        feats = df["feature"].to_numpy()
        docs = df["doc_id"].to_numpy()
        _, starts, counts = np.unique(feats, return_index=True, return_counts=True)
        q, c, f = [], [], []
        for s0, cnt in zip(starts, counts):
            if cnt < 2:
                continue
            members = docs[s0:s0 + min(cnt, value_len)]
            for a in members:
                for b in members:
                    if a != b:
                        q.append(a)
                        c.append(b)
                        f.append(feats[s0])
        return pa.table({"query_doc": pa.array(q, pa.int64()),
                         "cand_doc": pa.array(c, pa.int64()),
                         "feature": pa.array(f, pa.int64())})

    pairs = bucketed_group_map(feat_rows, "feature", postings_bucket,
                               num_buckets=32)

    def champions_bucket(df: pd.DataFrame) -> pa.Table:
        from ..functions.sampling import select_champions
        out_q, out_r, out_c = [], [], []
        for qd, g in df.groupby("query_doc", sort=False):
            cands: dict[int, set] = {}
            for cd, ft in zip(g["cand_doc"], g["feature"]):
                cands.setdefault(int(cd), set()).add(int(ft))
            champs = select_champions(cands, top_k)
            for rank, ch in enumerate(champs):
                out_q.append(int(qd))
                out_r.append(rank)
                out_c.append(ch)
        return pa.table({"doc_id": pa.array(out_q, pa.int64()),
                         "champion_rank": pa.array(out_r, pa.int64()),
                         "champion_doc_id": pa.array(out_c, pa.int64())})

    return bucketed_group_map(pairs, "query_doc", champions_bucket,
                              num_buckets=32)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, n: int = 5):
    """Exact n-gram Jaccard near-dup pairs: LSH candidates verified by the
    TRUE shingle-set Jaccard (not the MinHash estimate). The text table is
    the small side and broadcast once (ray.put); candidate generation is
    the same salted band shuffle. Returns (left_id, right_id, jaccard
    rounded 6); rows-only check."""
    import ray

    from ..stages.grouped import bucketed_group_map
    cfg = EngineConfig()
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    tref = ray.put(texts)

    def sig_fn(batch: pa.Table) -> pa.Table:
        txts = batch["text"].to_pylist()
        parts = [hashing.char_shingles_u64(t, n) for t in txts]
        offs = np.zeros(len(parts) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in parts], out=offs[1:])
        flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
        sig = minhash.minhash_signatures_flat(flat, offs, cfg.lsh.num_perms, cfg.seed)
        bands = minhash.band_keys(sig, cfg.lsh.num_bands, cfg.lsh.rows_per_band, cfg.seed)
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        return pa.table({
            "band_key": pa.array(bands.reshape(-1).view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, cfg.lsh.num_bands), pa.int64()),
        })

    bands = ds.map_batches(sig_fn, batch_format="pyarrow")

    def pairs_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["band_key", "doc_id"]).sort_values(
            ["band_key", "doc_id"], kind="stable")
        keys = df["band_key"].to_numpy()
        _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
        docs = df["doc_id"].to_numpy()
        li, ri = [], []
        for s0, c0 in zip(starts[counts >= 2], counts[counts >= 2]):
            gl, gr = np.triu_indices(int(c0), k=1)
            li.append(docs[gl + s0])
            ri.append(docs[gr + s0])
        if not li:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        lv = np.concatenate(li)
        rv = np.concatenate(ri)
        uniq = pd.DataFrame({"l": lv, "r": rv}).drop_duplicates()
        txts = ray.get(tref)
        out_l, out_r, out_j = [], [], []
        for l, r in zip(uniq.l, uniq.r):
            j = minhash.jaccard(hashing.char_shingles_u64(txts[int(l)], n),
                                hashing.char_shingles_u64(txts[int(r)], n))
            if j >= threshold:
                out_l.append(int(l))
                out_r.append(int(r))
                out_j.append(round(j, 6))
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    return bucketed_group_map(bands, "band_key", pairs_bucket, num_buckets=32)
