"""CLI smoke (python -m destor_ray …) — runs in a subprocess so the CLI
owns its own Ray session, as the destor binary owns its process."""

import json
import os
import shutil
import subprocess
import sys

WD = "/tmp/destor_ray_cli_pytest"


def _run(*args):
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    return subprocess.run([sys.executable, "-m", "destor_ray", *args],
                          capture_output=True, text=True, env=env,
                          cwd="/root/repo", timeout=500)


def test_cli_backup_and_stat(ray_session):
    from destor_ray import corpus
    cdir = corpus.ensure_corpus_parquet(200, seed=42)
    if os.path.exists(WD):
        shutil.rmtree(WD)
    r = _run("backup", cdir, WD)
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout[r.stdout.index('{\n "resumed"'):])
    assert out["metrics"]["n_rows"] == 200
    r2 = _run("stat", WD)
    assert r2.returncode == 0
    assert "dedup_ratio=" in r2.stdout


def test_cli_metrics_missing_dir():
    r = _run("metrics", "/tmp/definitely_not_a_workdir_xyz")
    assert r.returncode == 1
