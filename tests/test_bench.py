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


def test_bandwidth_tracker_interleaved_best(tmp_path, monkeypatch):
    """The ceiling is the best PROBE across interleaved samples plus the
    persisted best-ever — never derived from the solver."""
    import json

    import bench

    import jax as _jax

    kind = _jax.devices()[0].device_kind
    store = tmp_path / "bw_probe_best.json"

    # a prior from a DIFFERENT chip kind must be rejected outright
    store.write_text(json.dumps({"bw_best": 3.21e11, "device": "TPU v6e"}))
    monkeypatch.setattr(bench, "_PROBE_STORE", str(store))
    assert bench.BandwidthTracker(mb=1, gemm_shape=(64, 64, 8)).best_prior == 0.0

    # a prior above the chip's nominal HBM spec is capped (anomalous probe)
    store.write_text(json.dumps({"bw_best": 9e15, "device": kind}))
    tr_cap = bench.BandwidthTracker(mb=1, gemm_shape=(64, 64, 8))
    assert tr_cap.best_prior <= bench._chip_limits()[1]

    store.write_text(json.dumps({"bw_best": 3.21e11, "device": kind}))
    tr = bench.BandwidthTracker(mb=1, gemm_shape=(64, 64, 8))
    assert tr.best_prior == 3.21e11
    tr.sample(iters=2)
    tr.sample(iters=2)
    assert len(tr.samples_stream) == 2 and len(tr.samples_gemm) == 2
    assert tr.bw_ceiling >= max(tr.bw_probe_best, 3.21e11)
    tr.save()
    saved = json.loads(store.read_text())
    assert saved["bw_best"] == tr.bw_ceiling  # ratchets up only
    s = tr.summary()
    assert len(s["stream_rw_samples"]) == 2
    assert s["used"] >= s["best_this_run"]


def test_bench_solver_rates_small():
    import bench

    rates = bench.bench_solver_rates(m=96, n=64, k=6, iters=3)
    for name in ("mur_kl", "anls", "admm", "ao_admm", "ao_admm_local_l1inf"):
        assert rates[name] > 0
