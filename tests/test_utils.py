"""Metrics logger, determinism check, experiments grid search."""
import numpy as np

from tpunmf.experiments import grid_search
from tpunmf.solvers import mur
from tpunmf.utils import MetricsLogger, determinism_check


def test_metrics_logger_collects(lowrank_data):
    logger = MetricsLogger(flops_per_iter=6 * 60 * 48 * 5)
    mur(lowrank_data, 5, distance_type="eu", min_iter=5, max_iter=40,
        tol1=1e-12, tol2=1e-12, nndsvd_init=(True, "zero"),
        block_size=10, on_block_end=logger)
    assert len(logger.records) == 4
    assert logger.records[-1]["iteration"] == 40
    s = logger.summary()
    assert s["iterations"] == 40 and s["final_objective"] > 0


def test_determinism_same_seed(lowrank_data):
    """Same-seed runs must be bitwise identical (SURVEY §5 race-detection
    analog)."""

    def run():
        r = mur(lowrank_data, 5, distance_type="eu", min_iter=2, max_iter=15,
                tol1=1e-12, tol2=1e-12, nndsvd_init=(True, "zero"))
        return (r.w, r.h)

    assert determinism_check(run, runs=2)


def test_grid_search(lowrank_data, tmp_path):
    import contextlib, io

    with contextlib.redirect_stdout(io.StringIO()):
        out = grid_search(
            lowrank_data,
            method="mur",
            features=(3, 5),
            lambda_w=(0.0, 0.1),
            lambda_h=(0.0,),
            distance_type="eu",
            min_iter=2,
            max_iter=10,
            tol1=1e-9,
            tol2=1e-9,
            save_dir=str(tmp_path),
        )
    assert len(out) == 4
    ks = sorted({p["k"] for p, _ in out})
    assert ks == [3, 5]
    import os

    assert len(os.listdir(tmp_path)) == 4


def test_metrics_logger_stream_jsonl(lowrank_data):
    import io as _io
    import json

    from tpunmf.utils import MetricsLogger

    buf = _io.StringIO()
    logger = MetricsLogger(stream=buf)
    mur(lowrank_data, 5, distance_type="eu", min_iter=2, max_iter=20,
        tol1=1e-12, tol2=1e-12, nndsvd_init=(True, "zero"),
        block_size=5, on_block_end=logger)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert len(lines) == 4 and lines[-1]["iteration"] == 20


def test_profiler_trace_writes(tmp_path, lowrank_data):
    from tpunmf.utils import trace

    with trace(str(tmp_path / "prof")):
        mur(lowrank_data, 4, distance_type="eu", min_iter=2, max_iter=5,
            tol1=1e-12, tol2=1e-12, nndsvd_init=(True, "zero"))
    import os

    found = []
    for root, _, files in os.walk(tmp_path / "prof"):
        found.extend(files)
    assert found  # a trace artifact was written
