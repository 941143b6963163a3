"""Training-data curation operators over the `documents` table: text
normalization (stop-phrase scrub), deterministic dataset splitting, and
benchmark decontamination — the standard curation passes a 100 TB
text-corpus pipeline runs besides dedup.

Every operator here is DuckDB-oracle-checked (identical column names
and, for the regex ops, the identical RE2 pattern on both sides).

Scale shapes:
  * scrub/split are embarrassingly parallel map_batches (no shuffle);
  * decontamination broadcasts the BENCHMARK gram set (test sets are
    small by construction — the canonical GPT-3/Llama-style n-gram
    decontamination topology: tiny contaminant side replicated, corpus
    side streamed) and never shuffles the corpus at all.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _read_documents(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


# RE2-safe pattern shared verbatim with the DuckDB oracle. The stoplist
# is this corpus's highest-frequency boilerplate tokens (the operator
# models stop-phrase / boilerplate removal; swap the alternation for a
# real deployment's list).
SCRUB_PATTERN = r"\b(table|row|data)\b"


def stopword_scrub(sf_dir: str):
    """(doc_id, clean_text, n_removed): boilerplate stop-phrase removal
    with the vectorized re2 kernels — replace_substring_regex for the
    scrub, count_substring_regex for the removal count. The oracle runs
    the same pattern through DuckDB's regexp_replace(..., 'g')."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        return pa.table({
            "doc_id": batch["doc_id"],
            "clean_text": pc.replace_substring_regex(texts, SCRUB_PATTERN, ""),
            "n_removed": pc.cast(pc.count_substring_regex(texts, SCRUB_PATTERN),
                                 pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dataset_split(sf_dir: str, val_pct: int = 10):
    """(doc_id, bucket, split): deterministic hash split — bucket =
    first-8-hex-digits of md5(str(doc_id)) mod 100, split = 'val' for
    bucket < val_pct else 'train'. Hash-derived (never RNG), so the
    assignment is stable across runs, partitions, and cluster sizes —
    the property a resumable 100 TB split needs. Oracle: DuckDB md5()
    over the same string input."""
    ds = _read_documents(sf_dir).select_columns(["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        buckets = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids), dtype=np.int64, count=len(ids))
        split = np.where(buckets < val_pct, "val", "train")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(buckets, pa.int64()),
                         "split": pa.array(split.tolist(), pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def curation_pipeline(sf_dir: str, min_len: int = 200,
                      alpha_pct: int = 78, val_pct: int = 10):
    """The composed end-to-end curation pass — what a real 100 TB text
    pipeline chains in ONE streaming job:

      1. scrub   — stop-phrase removal (re2, vectorized);
      2. quality — features on the CLEANED text; drop docs with
                   len < min_len or alpha-ratio < alpha_pct% (the ratio
                   test is integer-exact: n_alpha*100 >= alpha_pct*len,
                   so Ray and the SQL oracle agree bit-for-bit at the
                   boundary — no float division on either side);
      3. dedup   — exact near-zero-cost keep-first on md5(clean_text):
                   the ONLY shuffle in the job (hash-partition by
                   content hash, min(doc_id) wins);
      4. split   — deterministic md5 train/val bucketing of survivors.

    Returns one row per SURVIVING document: (doc_id, split, text_len,
    n_copies). Steps 1/2/4 are map-only and fuse into a single
    map_batches stage ahead of the one groupby — per-doc features never
    cross the wire for dropped docs, and the shuffle carries only
    (hash, doc_id, text_len) for the ~2/3 that survive the filter."""
    from ray.data.aggregate import Count, Min

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def scrub_filter_hash(batch: pa.Table) -> pa.Table:
        clean = pc.replace_substring_regex(batch["text"], SCRUB_PATTERN, "")
        tlen = pc.cast(pc.utf8_length(clean), pa.int64())
        nalpha = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(clean, "[^A-Za-z]", "")), pa.int64())
        keep = pc.and_(
            pc.greater_equal(tlen, min_len),
            pc.greater_equal(pc.multiply(nalpha, 100),
                             pc.multiply(tlen, alpha_pct)))
        sub = pa.table({"doc_id": batch["doc_id"], "clean": clean,
                        "text_len": tlen}).filter(keep)
        h = [hashlib.md5(t.encode()).hexdigest()
             for t in sub["clean"].to_pylist()]
        return pa.table({"doc_id": sub["doc_id"],
                         "h": pa.array(h, pa.string()),
                         "text_len": sub["text_len"]})

    hashed = ds.map_batches(scrub_filter_hash, batch_format="pyarrow")
    groups = hashed.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("text_len", alias_name="text_len"),
        Count(alias_name="n_copies"))

    def assign_split(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        buckets = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids), dtype=np.int64, count=len(ids))
        split = np.where(buckets < val_pct, "val", "train")
        return pa.table({"doc_id": batch["doc_id"],
                         "split": pa.array(split.tolist(), pa.string()),
                         "text_len": batch["text_len"],
                         "n_copies": batch["n_copies"]})

    return groups.map_batches(assign_split, batch_format="pyarrow")


def decontaminate(sf_dir: str, benchmark_source: str = "src0",
                  gram: int = 24):
    """(doc_id, contaminated) for every NON-benchmark document: flagged
    when it shares any exact `gram`-char substring with a benchmark
    document (docs with source == benchmark_source play the held-out
    eval set). Exact n-gram decontamination:

      pass 1: stream ONLY the benchmark slice (predicate-filtered read)
              and collect its distinct gram set — the small side;
      pass 2: ray.put the gram set once; every corpus batch probes it
              with a per-doc set intersection — no shuffle, no join.

    The oracle is the equivalent gram-unnest anti-join SQL. Flagged
    rows keep contaminated=true; clean rows false (full outer row set,
    so removal ratios are computable downstream)."""
    import ray

    ds = _read_documents(sf_dir).select_columns(["doc_id", "source", "text"])

    bench_grams: set[str] = set()
    bench = ds.filter(expr=f"source == '{benchmark_source}'")
    for b in bench.iter_batches(batch_format="pyarrow"):
        for t in b["text"].to_pylist():
            bench_grams.update(t[i:i + gram] for i in range(len(t) - gram + 1))
    gref = ray.put(bench_grams)

    def probe(batch: pa.Table) -> pa.Table:
        gs = ray.get(gref)
        mask = pc.invert(pc.equal(batch["source"], benchmark_source))
        sub = batch.filter(mask)
        flags = []
        for t in sub["text"].to_pylist():
            flags.append(any(t[i:i + gram] in gs
                             for i in range(len(t) - gram + 1)))
        return pa.table({"doc_id": sub["doc_id"],
                         "contaminated": pa.array(flags, pa.bool_())})

    return ds.map_batches(probe, batch_format="pyarrow")
