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


def test_cli_restore(ray_session):
    """destor -rN analog: restore rows from cluster representatives into
    parquet; all rows pass the fidelity bound."""
    from destor_ray import corpus
    cdir = corpus.ensure_corpus_parquet(200, seed=42)
    if not os.path.exists(os.path.join(WD, "manifest")):
        r0 = _run("backup", cdir, WD)
        assert r0.returncode == 0, r0.stderr[-500:]
    out_dir = "/tmp/destor_ray_cli_restore"
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    r = _run("restore", cdir, WD, out_dir)
    assert r.returncode == 0, r.stderr[-500:]
    rep = json.loads(r.stdout[r.stdout.rindex("{"):])
    assert rep["rows_restored"] == 200
    assert rep["fidelity_ok"] == 200
    import pyarrow.dataset as pads
    assert pads.dataset(out_dir).count_rows() == 200
