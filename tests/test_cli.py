"""CLI smoke tests (python -m tpunmf ...)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # skip the TPU-tunnel sitecustomize registration in subprocesses
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "tpunmf", *args],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=240,
    )


@pytest.fixture
def data_file(tmp_path, rng):
    path = tmp_path / "data.npy"
    np.save(path, (rng.random((60, 40)) ** 2).astype(np.float32))
    return str(path)


def test_factorize_command(tmp_path, data_file):
    r = _run_cli(
        ["factorize", data_file, "-k", "4", "-m", "mur", "--distance-type",
         "eu", "--min-iter", "3", "--max-iter", "20", "--tol1", "1e-6",
         "--tol2", "1e-6", "--nndsvd", "zero", "--save-dir", str(tmp_path / "out")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][0]
    )
    assert payload["iterations"] == 19
    saved = os.listdir(tmp_path / "out")
    assert saved and saved[0].startswith("nmf_mur_4_eu")


def test_grid_command(tmp_path, data_file):
    r = _run_cli(
        ["grid", data_file, "-k", "4", "-m", "mur", "--features", "3,4",
         "--lambda-w", "0,0.1", "--distance-type", "eu", "--min-iter", "2",
         "--max-iter", "8", "--no-save"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(rows) == 4
    assert {row["k"] for row in rows} == {3, 4}


def test_unknown_command(tmp_path, data_file):
    r = _run_cli(["explode"], tmp_path)
    assert r.returncode != 0
