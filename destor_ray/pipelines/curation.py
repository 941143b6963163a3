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


def normalize_text(sf_dir: str):
    """(doc_id, norm_text, n_chars_norm): canonical text normalization —
    the first map of every dedup/curation pipeline (case-fold +
    whitespace-run collapse + trim), because exact/shingle dedup over
    UN-normalized text silently misses case/spacing variants. Map-only,
    fully vectorized re2/utf8 kernels (utf8_lower,
    replace_substring_regex, utf8_trim_whitespace); the oracle runs
    lower + regexp_replace(..., 'g') + trim — both engines are RE2, so
    bytes match exactly."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({
            "doc_id": batch["doc_id"],
            "norm_text": t,
            "n_chars_norm": pc.cast(pc.utf8_length(t), pa.int64()),
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
    hashed = ds.map_batches(_scrub_filter_hash_fn(min_len, alpha_pct),
                            batch_format="pyarrow")
    groups = hashed.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("text_len", alias_name="text_len"),
        Count(alias_name="n_copies"))
    return groups.map_batches(_assign_split_fn(val_pct),
                              batch_format="pyarrow")


def _scrub_filter_hash_fn(min_len: int, alpha_pct: int):
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
    return scrub_filter_hash


def _assign_split_fn(val_pct: int):
    def assign_split(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        buckets = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids), dtype=np.int64, count=len(ids))
        split = np.where(buckets < val_pct, "val", "train")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "split": pa.array(split.tolist(), pa.string()),
                         "text_len": batch["text_len"],
                         "n_copies": pc.cast(batch["n_copies"], pa.int64())})
    return assign_split


def token_window_segments(text_arr: pa.Array, k: int):
    """Vectorized k-token non-overlapping window extraction: for an
    Arrow string array of whitespace-joined docs, returns (seg, doc_rep,
    seg_idx) where seg[j] is the space-joined window, doc_rep[j] the
    source row index, seg_idx[j] the within-doc window number. One
    split_pattern + numpy offset arithmetic + one C-level binary_join —
    no per-row Python."""
    if len(text_arr) == 0:
        return (pa.array([], pa.string()), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    toks = pc.split_pattern(text_arr, " ")
    off = np.asarray(toks.offsets)
    counts = np.diff(off)
    nseg = -(-counts // k)
    ndocs = len(counts)
    doc_rep = np.repeat(np.arange(ndocs), nseg)
    first = np.concatenate(([0], np.cumsum(nseg)[:-1]))
    seg_idx = np.arange(nseg.sum()) - np.repeat(first, nseg)
    starts = off[doc_rep] + seg_idx * k
    # segments tile each doc contiguously, so each segment's end is
    # the next segment's start and the final end is off[-1]
    seg_offsets = np.append(starts, off[-1]).astype(np.int64)
    seg_list = pa.LargeListArray.from_arrays(
        seg_offsets, toks.values.cast(pa.large_string()))
    seg = pc.binary_join(seg_list, pa.scalar(" ", pa.large_string()))
    return seg.cast(pa.string()), doc_rep, seg_idx


def segment_dedup(sf_dir: str, k: int = 8):
    """(doc_id, n_segs, n_kept): line-level dedup (C4/RefinedWeb style)
    recast for this corpus — documents have no newlines, so a "line" is
    a non-overlapping window of `k` whitespace tokens. An occurrence of
    a segment is KEPT iff it is the globally first occurrence (ordered
    by doc_id, then position); later repeats would be removed when
    rebuilding the doc. Reports per-doc segment totals and survivors.

    Shape (2 shuffles, both narrow):
      1. map      — Arrow split_pattern + numpy offset arithmetic build
                    the per-doc k-token segment strings with a single
                    C-level binary_join (no per-row Python);
      2. shuffle  — hash-partition by segment content; keep-first
                    resolved per bucket with one lexsort (first row of
                    each segment run wins);
      3. reduce   — per-doc Count/Sum aggregate.

    The shuffle ships the segment STRINGS (like line-dedup must ship
    lines) so equality semantics match the SQL oracle exactly; at
    10^12 rows ship a 128-bit hash of the segment instead and accept
    the collision odds. Mirrors destor's chunk-level exact dedup (D2,
    /root/reference/src/dedup_phase.c) one level up: segments are the
    "chunks" of a text corpus."""
    from ray.data.aggregate import Count, Sum

    from ..stages.grouped import bucketed_group_map

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def segs(batch: pa.Table) -> pa.Table:
        seg, doc_rep, seg_idx = token_window_segments(
            batch["text"].combine_chunks(), k)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "seg": seg,
            "doc_id": pa.array(ids[doc_rep], pa.int64()),
            "seg_idx": pa.array(seg_idx, pa.int64()),
        })

    occurrences = ds.map_batches(segs, batch_format="pyarrow")

    def keep_first(df) -> pa.Table:
        seg = df["seg"].to_numpy()
        doc = df["doc_id"].to_numpy()
        idx = df["seg_idx"].to_numpy()
        order = np.lexsort((idx, doc, seg))
        seg_s = seg[order]
        kept = np.empty(len(seg_s), dtype=np.int64)
        if len(seg_s):
            kept[0] = 1
            kept[1:] = (seg_s[1:] != seg_s[:-1]).astype(np.int64)
        return pa.table({"doc_id": pa.array(doc[order], pa.int64()),
                         "kept": pa.array(kept, pa.int64())})

    marked = bucketed_group_map(occurrences, "seg", keep_first)
    return marked.groupby("doc_id").aggregate(
        Count(alias_name="n_segs"), Sum("kept", alias_name="n_kept"))


def run_curation_job(sf_dir: str, workdir: str, min_len: int = 200,
                     alpha_pct: int = 78, val_pct: int = 10,
                     force: bool = False) -> dict:
    """Checkpointed, resumable version of `curation_pipeline` — the text
    pipeline run as a destor-style job (S2/S3 trace analog, same
    machinery as pipelines/job.run_backup_job): each stage writes
    partitioned parquet + `_lineage.json`; a re-run with unchanged
    config and input resumes every finished stage without recompute.

      stage 1 `hashed`    scrub → integer-exact quality filter →
                          content hash (map-only; the corpus never
                          crosses a shuffle);
      stage 2 `survivors` keep-first dedup on the content hash (the
                          job's ONE shuffle);
      stage 3 `final`     deterministic md5 train/val split;
      metrics.json        per-job accounting (survivor/copy counts,
                          split sizes) — destor's backup.log analog.

    Returns {"resumed": {stage: bool}, "metrics": {...},
    "final_dir": path}."""
    import hashlib as _hl
    import json
    import os

    import ray.data
    from ray.data.aggregate import Count, Min

    from ..state import checkpoint as ckpt

    cfg_hash = _hl.sha1(
        f"curation:v1:{min_len}:{alpha_pct}:{val_pct}".encode()
    ).hexdigest()[:12]
    doc_path = f"{sf_dir}/documents.parquet"
    st = os.stat(doc_path)
    input_id = f"{os.path.basename(doc_path)}:{st.st_size}:{st.st_mtime_ns}"
    os.makedirs(workdir, exist_ok=True)
    status: dict = {"resumed": {}}

    def produce_hashed(out: str):
        ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])
        ds.map_batches(_scrub_filter_hash_fn(min_len, alpha_pct),
                       batch_format="pyarrow").write_parquet(out)
        return None

    hashed, resumed = ckpt.run_stage(workdir, "hashed", cfg_hash, input_id,
                                     produce_hashed, force=force)
    status["resumed"]["hashed"] = resumed

    def produce_survivors(out: str):
        groups = hashed.groupby("h").aggregate(
            Min("doc_id", alias_name="doc_id"),
            Min("text_len", alias_name="text_len"),
            Count(alias_name="n_copies"))
        groups.write_parquet(out)
        return None

    survivors, resumed = ckpt.run_stage(workdir, "survivors", cfg_hash,
                                        input_id, produce_survivors,
                                        force=force)
    status["resumed"]["survivors"] = resumed

    def produce_final(out: str):
        survivors.map_batches(_assign_split_fn(val_pct),
                              batch_format="pyarrow").write_parquet(out)
        return None

    final, resumed = ckpt.run_stage(workdir, "final", cfg_hash, input_id,
                                    produce_final, force=force)
    status["resumed"]["final"] = resumed

    metrics_path = os.path.join(workdir, "metrics.json")
    if force or not ckpt.stage_complete(workdir, "metrics", cfg_hash,
                                        input_id):
        from ray.data.aggregate import Sum
        mrow = final.map_batches(
            lambda b: pa.table({
                "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "copies": b["n_copies"].cast(pa.int64()),
                "is_val": pc.cast(pc.equal(b["split"], "val"), pa.int64()),
            }), batch_format="pyarrow").aggregate(
                Sum("one", alias_name="survivors"),
                Sum("copies", alias_name="kept_docs"),
                Sum("is_val", alias_name="n_val"))
        metrics = {
            "survivors": int(mrow["survivors"]),
            "kept_docs_after_filter": int(mrow["kept_docs"]),
            "duplicates_removed": int(mrow["kept_docs"] - mrow["survivors"]),
            "n_val": int(mrow["n_val"]),
            "n_train": int(mrow["survivors"] - mrow["n_val"]),
        }
        mdir = ckpt.stage_dir(workdir, "metrics")
        os.makedirs(mdir, exist_ok=True)
        with open(metrics_path, "w") as f:
            json.dump(metrics, f, indent=1)
        lineage = {"stage": "metrics", "config_hash": cfg_hash,
                   "input_id": input_id, "rows": 1}
        with open(os.path.join(mdir, ckpt.LINEAGE), "w") as f:
            json.dump(lineage, f, indent=1)
        status["resumed"]["metrics"] = False
    else:
        with open(metrics_path) as f:
            metrics = json.load(f)
        status["resumed"]["metrics"] = True

    status["metrics"] = metrics
    status["final_dir"] = ckpt.stage_dir(workdir, "final")
    return status


def incremental_dedup(sf_dir: str, k: int = 8, index_source: str = "src0"):
    """(doc_id, status) for every NEW document — incremental dedup
    against an already-ingested index, the production destor topology
    (D2 exact lookup: new chunks probe the fingerprint kv-store built
    by prior jobs, /root/reference/src/index/kvstore_htable.c). Docs
    with source == index_source play the prior ingest; everything else
    is the arriving batch. Fingerprint = the doc's first `k` tokens
    (a content-prefix fingerprint; the corpus has no full-text dups).

      status = 'dup_index'  fingerprint already in the index;
               'dup_new'    first seen earlier (lower doc_id) in THIS
                            arriving batch;
               'unique'     first occurrence anywhere.

    One shuffle: both sides hash-partition by fingerprint (the index
    side ships (fp, flag) only), and each bucket resolves all three
    states with segmented numpy reductions — no broadcast of the index,
    so it scales when the index side is 10^12 rows."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_documents(sf_dir).select_columns(["doc_id", "source", "text"])

    def fingerprint(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        fp = pc.binary_join(pc.list_slice(toks, 0, k), " ")
        is_index = pc.cast(pc.equal(batch["source"], index_source),
                           pa.int8())
        return pa.table({"fp": fp, "doc_id": batch["doc_id"].cast(pa.int64()),
                         "is_index": is_index})

    rows = ds.map_batches(fingerprint, batch_format="pyarrow")

    def resolve(df: pd.DataFrame) -> pa.Table:
        fp = df["fp"].to_numpy()
        doc = df["doc_id"].to_numpy()
        isx = df["is_index"].to_numpy().astype(bool)
        order = np.lexsort((doc, fp))
        fp_s, doc_s, isx_s = fp[order], doc[order], isx[order]
        n = len(fp_s)
        if not n:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "status": pa.array([], pa.string())})
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = fp_s[1:] != fp_s[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        seg = np.repeat(np.arange(len(starts)), sizes)
        has_index = np.maximum.reduceat(isx_s.astype(np.int8), starts) > 0
        # min doc_id among NEW rows per segment: mask index rows to +inf
        doc_new = np.where(isx_s, np.iinfo(np.int64).max, doc_s)
        first_new = np.minimum.reduceat(doc_new, starts)
        is_new_row = ~isx_s
        status = np.where(
            has_index[seg], "dup_index",
            np.where(doc_s == first_new[seg], "unique", "dup_new"))
        return pa.table({
            "doc_id": pa.array(doc_s[is_new_row], pa.int64()),
            "status": pa.array(status[is_new_row].tolist(), pa.string()),
        })

    return bucketed_group_map(rows, "fp", resolve)


# RE2 patterns shared verbatim with the DuckDB oracle (both engines use
# RE2 semantics). Replacement order is fixed: email, phone, ip.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(sf_dir: str):
    """(doc_id, clean_text, n_email, n_phone, n_ip): PII redaction —
    email / phone / IPv4 regex replacement with per-category counts.

    The synthetic corpus text contains no PII, so the query plants
    deterministic PII derived from doc_id (an email, a phone, an IP,
    and for every third doc a second email) into each document on BOTH
    the Ray side and the SQL oracle side, then scrubs it; the
    hash-verified clean_text proves the patterns and replacement
    semantics match RE2-for-RE2. Map-only: no shuffle, streams at
    corpus bandwidth."""
    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64())
        idn = ids.to_numpy(zero_copy_only=False)
        sid = pc.cast(ids, pa.string())
        alt = pa.array(np.where(idn % 3 == 0, " alt admin@test.org", ""),
                       pa.string())
        aug = pc.binary_join_element_wise(
            batch["text"].cast(pa.string()),
            " contact user", sid, "@example.com call ",
            pc.cast(pa.array(idn % 900 + 100, pa.int64()), pa.string()),
            "-555-",
            pc.cast(pa.array(idn % 9000 + 1000, pa.int64()), pa.string()),
            " from 10.",
            pc.cast(pa.array(idn % 256, pa.int64()), pa.string()),
            ".0.",
            pc.cast(pa.array(idn % 100 + 1, pa.int64()), pa.string()),
            alt, "")
        n_email = pc.cast(pc.count_substring_regex(aug, PII_EMAIL), pa.int64())
        clean = pc.replace_substring_regex(aug, PII_EMAIL, "[EMAIL]")
        n_phone = pc.cast(pc.count_substring_regex(clean, PII_PHONE),
                          pa.int64())
        clean = pc.replace_substring_regex(clean, PII_PHONE, "[PHONE]")
        n_ip = pc.cast(pc.count_substring_regex(clean, PII_IP), pa.int64())
        clean = pc.replace_substring_regex(clean, PII_IP, "[IP]")
        return pa.table({"doc_id": ids, "clean_text": clean,
                         "n_email": n_email, "n_phone": n_phone,
                         "n_ip": n_ip})

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


def training_mix_sample(sf_dir: str, target: int = 200, mod: int = 4):
    """(doc_id, source, rk) — training-mixture construction: sample a
    deterministic subset of documents per source so the output matches
    target mixture weights (the mix-building pass that precedes
    tokenization in an LLM data pipeline). Source s gets quota
    floor(target * w_s / Σw) rows where w_s = (int(s[3:]) % mod) + 1 (a
    deterministic stand-in for editorial per-source weights); within a
    source, rows are ranked by md5(str(doc_id)) — hash-derived, never
    RNG, so the sample is stable across runs, partitions, and cluster
    sizes, and under-quota sources simply contribute everything.

    Scale shape: the weight/quota table is |sources| rows (one tiny
    count groupby → driver → closure); ranking keys are computed
    map-only; the ONLY data shuffle is one source-keyed exchange of
    (source, doc_id, h) triples — 40 bytes/row, never the text — and
    each bucket's top-quota selection is a vectorized per-group sort.
    The md5 loop is the price of oracle parity (cf. minhash_lsh_oph)."""
    import pandas as pd

    from ..stages.grouped import bucketed_group_map

    srcs = sorted(_read_documents(sf_dir)
                  .select_columns(["source"]).unique("source"))
    wts = {s: (int(s[3:]) % mod) + 1 for s in srcs}
    sumw = sum(wts.values())
    quota = {s: (target * w) // sumw for s, w in wts.items()}

    ds = _read_documents(sf_dir).select_columns(["doc_id", "source"])

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "source": batch["source"],
                         "h": pa.array(hs, pa.string())})

    def take_quota(df: pd.DataFrame) -> pa.Table:
        out = []
        for s, g in df.groupby("source", sort=False):
            g = g.sort_values(["h", "doc_id"]).head(quota.get(s, 0))
            out.append(pa.table({
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64),
                                   pa.int64()),
                "source": pa.array(g["source"].to_numpy(dtype=object),
                                   pa.string()),
                "rk": pa.array(np.arange(1, len(g) + 1, dtype=np.int64),
                               pa.int64()),
            }))
        if not out:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string()),
                             "rk": pa.array([], pa.int64())})
        return pa.concat_tables(out)

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    return bucketed_group_map(keyed_ds, "source", take_quota,
                              num_buckets=16)


def _keep_best_order_starts(fp, doc, nch):
    """Winner-pick kernel shared by keep_best_dedup and the capstone
    pipeline: sort (fp asc, n_chars desc, doc_id asc); the first row of
    each fp group is the kept champion. Returns (order, starts)."""
    order = np.lexsort((doc, -nch, fp))
    fp_s = fp[order]
    first = np.empty(len(fp_s), dtype=bool)
    first[0] = True
    first[1:] = fp_s[1:] != fp_s[:-1]
    return order, np.flatnonzero(first)


def _lang_length_cutoffs(sf_dir: str, pct: float) -> dict:
    """Per-language exact lower-quantile length cutoffs via the
    value-count profile pass (shared by quality_percentile_filter and
    the capstone pipeline): |langs|·|distinct lengths| rows reach the
    driver, nothing else."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir).select_columns(["lang", "n_chars"])

    def counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch["lang"].to_numpy(zero_copy_only=False),
            "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return pa.table({
            "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
            "n_chars": pa.array(g["n_chars"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    vc = ds.map_batches(counts, batch_format="pyarrow") \
        .groupby(["lang", "n_chars"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    thr: dict = {}
    for lang, g in vc.groupby("lang"):
        g = g.sort_values("n_chars")
        cum = g["n"].cumsum().to_numpy()
        rank = int(np.ceil(pct * int(cum[-1])))  # 1-indexed target rank
        thr[lang] = int(g["n_chars"].to_numpy()[np.searchsorted(cum, rank)])
    return thr


def _empty_partials() -> pa.Table:
    return pa.table({"seq_id": pa.array([], pa.int64()),
                     "doc_id": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())})


def _seq_partials(batch: pa.Table, st: np.ndarray, seq_len: int) -> pa.Table:
    """Sequence-packing partials kernel shared by sequence_pack and the
    capstone pipeline: given each doc's global token-start offset `st`
    (aligned to `batch` rows), tokens map arithmetically to sequence
    ids; emits one (seq_id, doc_id, n) partial per (sequence, doc) per
    batch so the final seq-keyed exchange is output-bounded."""
    toks = pc.split_pattern(batch["text"], " ")
    n = pc.list_value_length(toks).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    total = int(n.sum())
    if total == 0:
        return _empty_partials()
    doc_rep = np.repeat(np.arange(len(docs)), n)
    first = np.concatenate(([0], np.cumsum(n)[:-1]))
    within = np.arange(total) - np.repeat(first, n)
    gp = np.repeat(st, n) + within
    seq = gp // seq_len
    comp = seq * (1 << 22) + doc_rep  # docs-per-batch < 2^22
    uniq, cnt = np.unique(comp, return_counts=True)
    return pa.table({
        "seq_id": pa.array(uniq >> 22, pa.int64()),
        "doc_id": pa.array(docs[(uniq & ((1 << 22) - 1))], pa.int64()),
        "n": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def _doc_offsets_sidecar(counts, num_buckets: int = 64):
    """HIERARCHICAL global prefix sum over (doc_id, n_toks) rows in
    doc_id order — no corpus-row-proportional driver materialization:

      1. doc_ids range-bucket into `num_buckets` contiguous id ranges
         (width from one Min/Max aggregate);
      2. per-bucket token SUBTOTALS via one groupby whose driver table
         is O(num_buckets) rows — the only thing the driver ever sees;
      3. a tiny exclusive scan over bucket subtotals → per-bucket base
         offsets (broadcast, O(num_buckets));
      4. one bucket-keyed map_groups cumsums each bucket's rows locally
         and rebases by its base — per-doc offsets never co-locate
         anywhere, and the result is WRITTEN as hive-partitioned
         parquet (b=<bucket>/) so the pack pass can partition-prune its
         side reads (destor's recipe store role,
         /root/reference/src/recipestore.c — sequential metadata
         sidecar keyed for the restore path).

    Returns (off_dir, lo, width): the sidecar directory plus the range
    bucketing parameters the pack stage re-derives bucket ids from.
    At 10^12 rows size num_buckets ~4× total cores; driver state stays
    O(num_buckets) regardless of corpus row count.

    The sidecar lives at `_sidecar_root()` — set DESTOR_SIDECAR_DIR to
    a shared filesystem on a multi-node cluster (the tempfile fallback
    is node-local and guarded by a single-node assert)."""
    import pandas as pd
    import ray as _ray
    from ray.data.aggregate import Max, Min, Sum

    counts = counts.materialize()  # one int64 pair per doc, distributed
    mm = counts.aggregate(Min("doc_id"), Max("doc_id"))
    lo = mm.get("min(doc_id)")
    hi = mm.get("max(doc_id)")
    lo = 0 if lo is None else int(lo)
    hi = lo if hi is None else int(hi)
    width = max(1, -(-(hi - lo + 1) // num_buckets))

    def add_b(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "b", pa.array((d - lo) // width, pa.int64()))

    keyed = counts.map_batches(add_b, batch_format="pyarrow")
    subs = keyed.groupby("b").aggregate(
        Sum("n_toks", alias_name="sub")).to_pandas()  # O(num_buckets)
    sub_arr = np.zeros(num_buckets, np.int64)
    if len(subs):
        sub_arr[subs["b"].to_numpy(np.int64)] = \
            subs["sub"].to_numpy(np.int64)
    base = np.zeros(num_buckets, np.int64)
    base[1:] = np.cumsum(sub_arr)[:-1]  # exclusive scan, O(num_buckets)
    base_ref = _ray.put(base)

    def rebase(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.table({})
        bs = _ray.get(base_ref)
        d = df["doc_id"].to_numpy(np.int64)
        n = df["n_toks"].to_numpy(np.int64)
        b = int(df["b"].iloc[0])
        o = np.argsort(d, kind="stable")
        d, n = d[o], n[o]
        st = np.zeros(len(d), np.int64)
        st[1:] = np.cumsum(n)[:-1]
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "start": pa.array(st + bs[b], pa.int64()),
                         "b": pa.array(np.full(len(d), b), pa.int64())})

    off_dir = _sidecar_root()
    keyed.groupby("b").map_groups(rebase, batch_format="pandas") \
        .write_parquet(off_dir, partition_cols=["b"])
    return off_dir, lo, width


def _sidecar_root() -> str:
    """Allocate a fresh sidecar directory.

    Multi-node: set DESTOR_SIDECAR_DIR to a path on a SHARED filesystem
    (NFS / fuse-mounted bucket) reachable by every node — write tasks
    and `_PackPartials` actors land on different nodes and must see the
    same files. Without it the fallback is node-local tempfile, which is
    only correct single-node, so a >1-node cluster without the env var
    is a hard error, not silent wrong reads. Fallback dirs are removed
    at interpreter exit (the pack Datasets are lazy, so eager per-call
    deletion would race their consumption)."""
    import os
    import tempfile

    import ray as _ray

    shared = os.environ.get("DESTOR_SIDECAR_DIR")
    if shared:
        os.makedirs(shared, exist_ok=True)
        return tempfile.mkdtemp(prefix="destor_pack_off_", dir=shared)
    if _ray.is_initialized() and \
            sum(1 for n in _ray.nodes() if n.get("Alive", False)) > 1:
        raise RuntimeError(
            "multi-node cluster detected: set DESTOR_SIDECAR_DIR to a "
            "shared filesystem path for the pack offsets sidecar "
            "(node-local /tmp is not visible to remote pack actors)")
    d = tempfile.mkdtemp(prefix="destor_pack_off_")
    _FALLBACK_SIDECARS.append(d)
    return d


_FALLBACK_SIDECARS: list = []


def _cleanup_sidecars() -> None:
    import shutil
    while _FALLBACK_SIDECARS:
        shutil.rmtree(_FALLBACK_SIDECARS.pop(), ignore_errors=True)


import atexit as _atexit  # noqa: E402

_atexit.register(_cleanup_sidecars)


class _PackPartials:
    """Actor-pool pack stage: per-doc start offsets come from the
    hive-partitioned sidecar written by `_doc_offsets_sidecar` — each
    batch loads ONLY the offset partitions its doc_ids touch (a small
    LRU of range-bucket arrays; with doc-clustered input blocks that's
    1-2 partitions per batch), so no corpus-row-proportional object is
    ever broadcast to tasks or pulled to the driver. With `restrict`,
    docs absent from the sidecar are dropped (the capstone packs only
    dedup survivors); without it a missing doc is a hard error."""

    def __init__(self, off_dir: str, lo: int, width: int, num_buckets: int,
                 seq_len: int, restrict: bool, cache_max: int = 16):
        self.off_dir, self.lo, self.width = off_dir, lo, width
        self.nb, self.seq_len = num_buckets, seq_len
        self.restrict, self.cache_max = restrict, cache_max
        self._cache: dict = {}  # b -> (sorted doc_ids, starts); LRU

    def _bucket(self, b: int):
        got = self._cache.pop(b, None)
        if got is None:
            import os

            import pyarrow.parquet as pq
            path = os.path.join(self.off_dir, f"b={b}")
            if os.path.isdir(path):
                t = pq.read_table(path, columns=["doc_id", "start"])
                k = t["doc_id"].to_numpy().astype(np.int64)
                s = t["start"].to_numpy().astype(np.int64)
                o = np.argsort(k, kind="stable")
                got = (k[o], s[o])
            else:  # bucket range held no (kept) docs
                got = (np.array([], np.int64), np.array([], np.int64))
        self._cache[b] = got
        while len(self._cache) > self.cache_max:
            self._cache.pop(next(iter(self._cache)))
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(docs):
            return _empty_partials()
        inr = (docs >= self.lo) & (docs < self.lo + self.width * self.nb)
        if not inr.all():
            if not self.restrict:
                raise ValueError("doc_id outside the offsets-sidecar domain")
            batch = batch.filter(pa.array(inr))
            docs = docs[inr]
            if not len(docs):
                return _empty_partials()
        parts = [self._bucket(int(b))
                 for b in np.unique((docs - self.lo) // self.width)]
        # buckets are contiguous doc_id ranges → concatenating them in
        # ascending bucket order is globally doc_id-sorted
        keys = np.concatenate([p[0] for p in parts])
        starts = np.concatenate([p[1] for p in parts])
        pos = np.minimum(np.searchsorted(keys, docs),
                         max(len(keys) - 1, 0))
        hit = keys[pos] == docs if len(keys) else np.zeros(len(docs), bool)
        if not hit.all():
            if not self.restrict:
                raise ValueError("doc_id missing from the offsets sidecar")
            batch = batch.filter(pa.array(hit))
            pos = pos[hit]
            if batch.num_rows == 0:
                return _empty_partials()
        return _seq_partials(batch, starts[pos], self.seq_len)


def _reduce_seq(df) -> pa.Table:
    """Shared per-sequence reducer: token sum + distinct-doc count."""
    g = df.groupby("seq_id").agg(
        n_tokens=("n", "sum"), n_docs=("doc_id", "nunique")).reset_index()
    return pa.table({
        "seq_id": pa.array(g["seq_id"].to_numpy(np.int64), pa.int64()),
        "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64), pa.int64()),
        "n_docs": pa.array(g["n_docs"].to_numpy(np.int64), pa.int64()),
    })


def keep_best_dedup(sf_dir: str, k: int = 4):
    """(doc_id, n_dups) for every KEPT document — dedup with a
    keep-BEST policy: docs sharing a content-prefix fingerprint (first
    `k` tokens) collapse to the highest-quality member (here: max
    n_chars, ties to the smaller doc_id), the CC-Net-style "keep the
    best variant" rule, vs exact_dedup_docs' keep-first rule (destor's
    D2 keeps the first-seen chunk, similarity_detection keeps the
    champion — this is the champion policy applied to whole docs).

    One fp-hash shuffle carrying (fp, doc_id, n_chars) only — ~30 B/row
    regardless of document size; the winner per group falls out of one
    lexsort + group-edge pick per bucket."""
    import pandas as pd

    from ..stages.grouped import bucketed_group_map

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text", "n_chars"])

    def fingerprint(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        fp = pc.binary_join(pc.list_slice(toks, 0, k), " ")
        return pa.table({"fp": fp,
                         "doc_id": batch["doc_id"].cast(pa.int64()),
                         "n_chars": batch["n_chars"].cast(pa.int64())})

    rows = ds.map_batches(fingerprint, batch_format="pyarrow")

    def best(df: pd.DataFrame) -> pa.Table:
        fp = df["fp"].to_numpy()
        doc = df["doc_id"].to_numpy(np.int64)
        nch = df["n_chars"].to_numpy(np.int64)
        if not len(fp):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_dups": pa.array([], pa.int64())})
        order, starts = _keep_best_order_starts(fp, doc, nch)
        counts = np.diff(np.r_[starts, len(fp)])
        return pa.table({
            "doc_id": pa.array(doc[order][starts], pa.int64()),
            "n_dups": pa.array(counts.astype(np.int64), pa.int64()),
        })

    return bucketed_group_map(rows, "fp", best, num_buckets=16)


def quality_percentile_filter(sf_dir: str, pct: float = 0.75):
    """(doc_id, lang, n_chars) for documents at or above their
    language's `pct` length quantile — the learned-threshold filter
    composition every curation pipeline runs (profile the corpus,
    pick per-group cutoffs, filter): CC-Net's per-language perplexity
    buckets with length standing in for the score.

    Two passes, both shuffle-light: (1) a (lang, n_chars) value-count
    groupby reduces the corpus to |langs|·|distinct lengths| tiny rows
    and the driver scans cumulative weights for each language's exact
    lower-quantile cutoff (the column_quantiles rule); (2) the cutoff
    dict broadcasts via ray.put and the filter is map-only — document
    text never shuffles anywhere."""
    import ray as _ray

    ds = _read_documents(sf_dir).select_columns(["doc_id", "lang", "n_chars"])
    thr_ref = _ray.put(_lang_length_cutoffs(sf_dir, pct))

    def keep(batch: pa.Table) -> pa.Table:
        t = _ray.get(thr_ref)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        cut = np.array([t[l] for l in langs], np.int64)
        m = pa.array(nch >= cut)
        return pa.table({
            "doc_id": batch["doc_id"].filter(m).cast(pa.int64()),
            "lang": batch["lang"].filter(m),
            "n_chars": batch["n_chars"].filter(m).cast(pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow")


def sequence_pack(sf_dir: str, seq_len: int = 128):
    """(seq_id, n_tokens, n_docs) — fixed-length training-sequence
    packing: the corpus token stream in (doc_id, position) order is cut
    into back-to-back `seq_len` windows (GPT-style pretraining packing,
    documents concatenated, sequences spanning doc boundaries), and
    each sequence reports its token count (== seq_len except the tail)
    and how many documents it spans.

    The primitive being exercised is the GLOBAL PREFIX SUM, run
    HIERARCHICALLY (see `_doc_offsets_sidecar`): pass 1 is a map-only
    per-doc token count; per-range-bucket subtotals reach the driver
    (O(num_buckets) rows — the only driver table), a tiny exclusive
    scan produces per-bucket bases, and a bucket-local cumsum rebases
    each range into a hive-partitioned offsets sidecar. Pass 2 is
    map-only over an actor pool: each task partition-prunes its side
    reads to the offset buckets its doc_ids touch, tokens' sequence
    ids are arithmetic from there, and per-(seq, doc) partials make
    the final seq-keyed exchange output-bounded."""
    from ..stages.grouped import bucketed_group_map

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"])

    def doc_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        n = pc.list_value_length(toks).cast(pa.int64())
        return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                         "n_toks": n})

    counts = ds.map_batches(doc_counts, batch_format="pyarrow")
    off_dir, lo, width = _doc_offsets_sidecar(counts, num_buckets=64)

    rows = ds.map_batches(
        _PackPartials,
        fn_constructor_args=(off_dir, lo, width, 64, seq_len, False),
        batch_format="pyarrow", concurrency=(1, 8))
    return bucketed_group_map(rows, "seq_id", _reduce_seq, num_buckets=8)


def pretraining_pipeline(sf_dir: str, pct: float = 0.5, fp_k: int = 4,
                         seq_len: int = 128):
    """(seq_id, n_tokens, n_docs) — the CAPSTONE composition: quality
    filter (per-language length >= the pct quantile) → keep-best
    near-dup collapse (prefix-fp groups keep max n_chars, tie smaller
    doc_id) → GPT-style fixed-length sequence packing over the
    survivors in doc_id order. Every stage is individually
    hash-verified elsewhere (quality_percentile_filter,
    keep_best_dedup, sequence_pack); this query certifies their
    COMPOSITION against one four-CTE oracle — the end-to-end
    "raw corpus in, training sequences out" contract.

    Scale shape: the filter is profile-pass + broadcast cutoffs
    (map-only), the dedup is one 30 B/row fp exchange, and packing is
    the HIERARCHICAL global-prefix-sum primitive over the kept rows
    (see `_doc_offsets_sidecar` / sequence_pack) — the driver sees
    only O(num_buckets) subtotals; kept-doc offsets live in the
    hive-partitioned sidecar and the pack actors partition-prune
    their side reads. Docs dropped by filter/dedup are absent from
    the sidecar, so the pack stage's `restrict` lookup drops them."""
    import pandas as pd
    import ray as _ray

    from ..stages.grouped import bucketed_group_map

    ds = _read_documents(sf_dir).select_columns(
        ["doc_id", "lang", "text", "n_chars"])

    # ---- stage 1: per-lang quantile cutoffs (shared profile kernel) ----
    thr_ref = _ray.put(_lang_length_cutoffs(sf_dir, pct))

    # ---- stage 2: filter + fingerprint (map-only) → keep-best ----
    def fp_rows(batch: pa.Table) -> pa.Table:
        t = _ray.get(thr_ref)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        cut = np.array([t[l] for l in langs], np.int64)
        m = pa.array(nch >= cut)
        kept = batch.filter(m)
        toks = pc.split_pattern(kept["text"], " ")
        fp = pc.binary_join(pc.list_slice(toks, 0, fp_k), " ")
        return pa.table({
            "fp": fp,
            "doc_id": kept["doc_id"].cast(pa.int64()),
            "n_chars": kept["n_chars"].cast(pa.int64()),
            "n_toks": pc.list_value_length(toks).cast(pa.int64())})

    rows = ds.map_batches(fp_rows, batch_format="pyarrow")

    def best(df: pd.DataFrame) -> pa.Table:
        fp = df["fp"].to_numpy()
        doc = df["doc_id"].to_numpy(np.int64)
        nch = df["n_chars"].to_numpy(np.int64)
        ntk = df["n_toks"].to_numpy(np.int64)
        if not len(fp):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_toks": pa.array([], pa.int64())})
        order, starts = _keep_best_order_starts(fp, doc, nch)
        return pa.table({
            "doc_id": pa.array(doc[order][starts], pa.int64()),
            "n_toks": pa.array(ntk[order][starts], pa.int64())})

    kept = bucketed_group_map(rows, "fp", best, num_buckets=16)

    # ---- stage 3: pack (hierarchical prefix sum over kept docs) ----
    off_dir, lo, width = _doc_offsets_sidecar(kept, num_buckets=64)

    packed = ds.select_columns(["doc_id", "text"]).map_batches(
        _PackPartials,
        fn_constructor_args=(off_dir, lo, width, 64, seq_len, True),
        batch_format="pyarrow", concurrency=(1, 8))
    return bucketed_group_map(packed, "seq_id", _reduce_seq, num_buckets=8)


def events_k_anonymity(sf_dir: str, ks=(2, 5, 10, 20)):
    """(k, n_groups, n_groups_below_k, rows_at_risk,
    n_groups_l_below_k) — k-anonymity / l-diversity release audit over
    the events table treated as a pseudonymized dataset: quasi-
    identifiers = (event_type, day-of-week, value decile-bucket) — the
    columns an attacker can match against side knowledge — and
    user_id as the sensitive attribute. A QI group with fewer than k
    rows re-identifies its members (k-anonymity, Sweeney 2002); a
    group whose rows all belong to < l distinct users leaks the
    user→behavior link even when k holds (l-diversity, Machanavajjhala
    2007). The sweep reports, per k (with l = k): total groups, groups
    below k, rows at risk in those groups, and groups below
    l-diversity — the table a release gate reads before publishing.

    Scale shape: the corpus never co-locates — batches fold to
    distinct (QI, user_id) partials with counts map-side, ONE
    domain-sized exchange merges them, and a second exchange over the
    (much smaller) QI domain folds (n_rows, n_distinct_users); the
    k-sweep runs on the QI-domain table. dow uses the engine-agnostic
    (epoch_us // 86400e6 + 4) % 7 convention (Monday = 0) and the
    value bucket is CAST(floor(value/10) AS BIGINT) — single IEEE ops
    mirrored literally in the oracle."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value",
                                        "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000 + 4) % 7).astype(np.int64)
        vb = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) / 10.0) \
            .astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "dow": dow, "vb": vb,
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "n": 1})
        g = df.groupby(["event_type", "dow", "vb", "user_id"],
                       sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    qi_user = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "dow", "vb", "user_id"]) \
        .aggregate(Sum("n", alias_name="n"))
    qi = qi_user.groupby(["event_type", "dow", "vb"]).aggregate(
        Sum("n", alias_name="n"),
        Count(alias_name="ndu")).to_pandas()

    n = qi["n"].to_numpy(np.int64)
    ndu = qi["ndu"].to_numpy(np.int64)
    rows = []
    for k in ks:
        below = n < k
        rows.append((int(k), len(qi), int(below.sum()),
                     int(n[below].sum()), int((ndu < k).sum())))
    return pd.DataFrame(rows, columns=[
        "k", "n_groups", "n_groups_below_k", "rows_at_risk",
        "n_groups_l_below_k"]).astype("int64")
