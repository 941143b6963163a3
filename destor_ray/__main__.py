"""CLI — the `destor` binary's job surface (destor.c:302-358: backup /
restore / make-trace / delete) recast for the Ray engine:

  python -m destor_ray backup  <corpus_dir> <workdir> [--simulation] [--job-id N]
  python -m destor_ray restore <corpus_dir> <workdir> <out_dir>   # destor -r analog
  python -m destor_ray metrics <workdir>
  python -m destor_ray gen     <n_rows> [--seed S]
  python -m destor_ray stat    <workdir>        # destor -s analog

Owns its Ray session (guarded init; the driver-facing __ray_entry__
module never initializes Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(128 << 20))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(256 << 20))


def _ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="destor_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("backup", help="run the checkpointed dedup job")
    b.add_argument("corpus_dir")
    b.add_argument("workdir")
    b.add_argument("--simulation", action="store_true",
                   help="metadata-only dry run (no payload decode)")
    b.add_argument("--job-id", type=int, default=0)

    r = sub.add_parser("restore", help="restore rows from cluster "
                       "representatives + write restored parquet "
                       "(destor -rN analog)")
    r.add_argument("corpus_dir")
    r.add_argument("workdir")
    r.add_argument("out_dir")
    r.add_argument("--seed", type=int, default=42,
                   help="generator seed for the fidelity check")

    m = sub.add_parser("metrics", help="print a finished job's metrics")
    m.add_argument("workdir")

    g = sub.add_parser("gen", help="generate the synthetic corpus")
    g.add_argument("n_rows", type=int)
    g.add_argument("--seed", type=int, default=42)

    st = sub.add_parser("stat", help="summary line (destor -s analog)")
    st.add_argument("workdir")

    args = p.parse_args(argv)

    if args.cmd == "gen":
        ray = _ray_session()
        from destor_ray import corpus
        d = corpus.ensure_corpus_parquet(args.n_rows, seed=args.seed)
        print(d)
        ray.shutdown()
        return 0

    if args.cmd == "backup":
        ray = _ray_session()
        from destor_ray.config import EngineConfig
        from destor_ray.pipelines.job import run_backup_job
        cfg = EngineConfig(simulation=args.simulation)
        res = run_backup_job(args.corpus_dir, args.workdir, cfg,
                             job_id=args.job_id)
        print(json.dumps({"resumed": res["resumed"],
                          "metrics": res["metrics"]}, indent=1))
        ray.shutdown()
        return 0

    if args.cmd == "restore":
        ray = _ray_session()
        from destor_ray.pipelines.job import (restore_corpus,
                                              restore_fidelity_stats)
        restored = restore_corpus(args.corpus_dir, args.workdir)
        restored.write_parquet(args.out_dir)
        import ray.data as rd
        stats = restore_fidelity_stats(
            rd.read_parquet(args.out_dir), seed=args.seed).to_pandas()
        n = len(stats)
        n_ok = int(stats.ok.sum())
        finite = stats.psnr[stats.psnr < 1e9]
        print(json.dumps({
            "rows_restored": n,
            "fidelity_ok": n_ok,
            "exact_rows": int((stats.psnr >= 1e9).sum()),
            "min_psnr": round(float(finite.min()), 2) if len(finite) else None,
            "mean_psnr": round(float(finite.mean()), 2) if len(finite) else None,
        }))
        ray.shutdown()
        return 0 if n_ok == n else 1

    if args.cmd in ("metrics", "stat"):
        path = os.path.join(args.workdir, "metrics.json")
        if not os.path.exists(path):
            print(f"no metrics at {path}", file=sys.stderr)
            return 1
        with open(path) as f:
            metrics = json.load(f)
        if args.cmd == "metrics":
            print(json.dumps(metrics, indent=1))
        else:
            # destor -s one-liner (destor.c:235-238)
            d, s = metrics["data_size"], metrics["stored_size"]
            print(f"data_size={d} stored_size={s} "
                  f"dedup_ratio={(d - s) / d:.4f} ({d / max(1, s):.2f}:1) "
                  f"rows={metrics['n_rows']} dup_rows={metrics['dup_rows']}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
