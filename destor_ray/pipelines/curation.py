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
