"""Multi-format ingest surface (SURVEY.md §2.1 S1 — destor reads its
corpus from trace files and raw directories; a Ray-native engine must
ingest whatever serialization the corpus arrives in and converge on the
same Dataset downstream).

`docs_jsonl_stats` proves the JSONL path end-to-end: the documents
table is exported to line-delimited JSON (a deterministic, cached
export — the fixture stands in for a crawler's native output), read
back through sources.read_table's format dispatch, and aggregated.
The DuckDB oracle runs over the ORIGINAL parquet, so a hash match
certifies the export→read_json→Dataset round trip loses nothing.

Scale shape: the export is a streaming map_batches → write_json (one
shard per input block, resumable layout); the stats pass is the same
map-side-combined groupby as docs_stats_by_lang. JSON reads are
CPU-heavier than parquet and have no column pushdown — the read
immediately select_columns()s down, and the docstring is the warning.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources import read_table


def _jsonl_export_dir(sf_dir: str) -> str:
    """Deterministic cached JSONL export of the documents table."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/destor_ray_jsonl/{tag}"
    if os.path.isdir(out):
        return out
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    # one shard per block (partitioned, resumable layout), staged in a
    # private dir and atomically renamed so a concurrent exporter can
    # never double the shards
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    ds.write_json(tmp)
    try:
        os.rename(tmp, out)
    except OSError:  # lost the race; the winner's export is identical
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def docs_jsonl_stats(sf_dir: str):
    """(lang, n_docs, sum_chars) aggregated from the JSONL round trip."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(_jsonl_export_dir(sf_dir),
                    columns=["doc_id", "lang", "text"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch["lang"],
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        })

    agg = ds.map_batches(narrow, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"))
    return agg.map_batches(
        lambda b: pa.table({
            "lang": b["lang"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "sum_chars": pc.cast(b["sum_chars"], pa.int64()),
        }), batch_format="pyarrow")
