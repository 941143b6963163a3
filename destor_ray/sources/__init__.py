"""Input-source dispatch (SURVEY.md §2.1 S1).

The north_rule input is a Lance table; this sandbox does not ship the
`lance` package (NOTES.md pin), so the reader dispatches on what is
available and on the path's format:

  read_table("x.lance" | dir with .lance)  → ray.data.read_lance
  read_table("x.jsonl" | dir with .jsonl)  → ray.data.read_json
  read_table("x.csv"   | dir with .csv)    → ray.data.read_csv
  read_table(dir with parquet | x.parquet) → ray.data.read_parquet

Everything downstream consumes a ray.data.Dataset either way — swapping
storage formats touches only this module.
"""

from __future__ import annotations

import os


def have_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def is_lance_path(path: str) -> bool:
    if path.endswith(".lance"):
        return True
    return os.path.isdir(path) and any(
        name.endswith(".lance") or name == "_versions"
        for name in os.listdir(path)) if os.path.isdir(path) else False


def is_jsonl_path(path: str) -> bool:
    if path.endswith((".jsonl", ".json")):
        return True
    return os.path.isdir(path) and any(
        name.endswith((".jsonl", ".json")) for name in os.listdir(path))


def is_csv_path(path: str) -> bool:
    if path.endswith(".csv"):
        return True
    return os.path.isdir(path) and any(
        name.endswith(".csv") for name in os.listdir(path))


def read_table(path: str, columns: list[str] | None = None):
    """Dataset over a Lance, JSONL, CSV, or parquet table (column-
    pruned when asked; JSON/CSV have no column pushdown — prune with a
    select_columns immediately after the read)."""
    import ray.data

    if is_lance_path(path):
        if not have_lance():
            raise ImportError(
                "path looks like a Lance dataset but the `lance` package "
                "is not installed in this environment (see NOTES.md)")
        return ray.data.read_lance(path, columns=columns)
    if is_jsonl_path(path):
        ds = ray.data.read_json(path)
        return ds.select_columns(columns) if columns else ds
    if is_csv_path(path):
        ds = ray.data.read_csv(path)
        return ds.select_columns(columns) if columns else ds
    return ray.data.read_parquet(path, columns=columns)
