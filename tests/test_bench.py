"""bench.py smoke test on small CPU shapes (the driver runs it full-size
on TPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_small_shapes():
    import bench

    r = bench.bench_mur_eu(m=128, n=128, k=8, iters=4)
    assert r["iters_per_sec"] > 0
    assert r["gflops_per_chip"] > 0
    assert 0 < r["roofline_fraction"]
    import numpy as np

    assert np.isfinite(r["final_obj"])


def test_bench_solver_rates_small():
    import bench

    rates = bench.bench_solver_rates(m=96, n=64, k=6, iters=3)
    for name in ("mur_kl", "anls", "admm", "ao_admm", "ao_admm_local_l1inf"):
        assert rates[name] > 0
