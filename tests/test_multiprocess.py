"""Two-process jax.distributed CPU test (VERDICT round-1 item 7).

Spawns 2 worker processes (4 emulated devices each -> 8 global) that
bring up jax.distributed over localhost, run the multi-host ingestion +
sharded streaming solver, and cross-check collective consistency.  The
parent asserts both workers agree AND that their objective matches a
single-process in-core run of the same problem.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"
        assert "WORKER_OK" in out, out

    # both workers reached the same objective
    objs = [
        float(line.split()[1])
        for rc, out, _ in outs
        for line in out.splitlines()
        if line.startswith("FINAL_OBJ")
    ]
    assert len(objs) == 2
    assert objs[0] == objs[1]

    # the two hosts ingested disjoint, covering column ranges
    ranges = sorted(
        tuple(map(int, line.split()[1:3]))
        for rc, out, _ in outs
        for line in out.splitlines()
        if line.startswith("RANGE")
    )
    assert ranges == [(0, 48), (48, 96)]

    # and the distributed objective matches the single-process in-core run
    from tpunmf.solvers import mur

    m, n, k = 40, 96, 4
    rng = np.random.default_rng(0)
    dense = rng.random((m, n))
    dense[dense < 0.5] = 0.0
    w0 = np.random.default_rng(1).random((m, k)) + 0.1
    h0 = np.random.default_rng(2).random((k, n)) + 0.1
    incore = mur(dense, k, distance_type="eu", w_init=w0, h_init=h0,
                 objective="gram", min_iter=2, max_iter=5, tol1=0.0, tol2=0.0)
    np.testing.assert_allclose(objs[0], incore.obj_history[-1], rtol=1e-8)

    def _tagged(tag):
        vals = [
            float(line.split()[1])
            for rc, out, _ in outs
            for line in out.splitlines()
            if line.startswith(tag)
        ]
        assert len(vals) == 2 and vals[0] == vals[1], (tag, vals)
        return vals[0]

    # mesh_2d with the process boundary crossing 'rows' (round 4):
    # the GSPMD solver run over 2 hosts x 4 devices must match in-core
    np.testing.assert_allclose(_tagged("MESH2D_OBJ"),
                               incore.obj_history[-1], rtol=1e-8)
    # the weak-scaling model's rows-psum byte inventory was validated
    # against the compiled collectives inside the workers
    for rc, out, _ in outs:
        assert "MESH2D_BYTES_OK" in out, out

    # a non-MUR solver's host_array Results tail (round 4): anls over
    # the 2-process mesh must finish AND match the in-core run
    from tpunmf.solvers import anls as _anls

    anls_single = _anls(dense, k, w_init=w0, h_init=h0,
                        min_iter=2, max_iter=4, tol1=0.0, tol2=0.0)
    np.testing.assert_allclose(_tagged("ANLS_OBJ"),
                               anls_single.obj_history[-1], rtol=1e-8)

    # sharded NTF across the process boundary == single-process ntf
    from tpunmf.solvers import ntf

    rng3 = np.random.default_rng(7)
    shape3 = (16, 12, 10)
    f_init = [rng3.random((s, 3)) + 0.1 for s in shape3]
    x3 = np.einsum("ir,jr,kr->ijk", *f_init) + 0.01 * rng3.random(shape3)
    single = ntf(x3, 3, distance_type="eu", update="mur", min_iter=3,
                 max_iter=6, tol1=0.0, tol2=0.0, factors_init=f_init,
                 normalize=False)  # ntf_sharded semantics
    np.testing.assert_allclose(_tagged("NTF_OBJ"),
                               single.obj_history[-1], rtol=1e-8)
