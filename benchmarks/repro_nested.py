"""Minimal repros for the TPU-runtime pathologies documented in
docs/PERF.md (round 1): run each case in a subprocess so a TPU worker
crash doesn't kill the harness, and report which still reproduce on the
current jax/libtpu.

  case A: Pallas objective kernel inside a solver while_loop that also
          contains a nested while_loop (ANLS/AO-ADMM shape) — round 1:
          TPU worker crash ("kernel fault").
  case B: batched Cholesky (vmapped cho_factor) in 3-deep while nesting —
          round 1: fault after a few iterations.
  case C: GEMM-shaped CG inside 4-deep loop nesting (AO-ADMM + CG shape)
          — round 1: compilation stall.

Usage: python repro_nested.py            # run all in subprocesses
       python repro_nested.py A C        # run a subset (still subprocessed)
       python repro_nested.py --inline B # run one case in THIS process
                                         # (full crash output, attachable)
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def case_a():
    import jax
    import jax.numpy as jnp

    from tpunmf.ops.fused import eu_residual_obj

    m, n, k = 1024, 1024, 32
    x = jax.random.uniform(jax.random.PRNGKey(0), (m, n))
    w = jax.random.uniform(jax.random.PRNGKey(1), (m, k))
    h = jax.random.uniform(jax.random.PRNGKey(2), (k, n))

    @jax.jit
    def run(x, w, h):
        def outer_cond(c):
            return c[0] < 5

        def outer(c):
            i, w, h, obj = c

            def inner_cond(d):
                return d[0] < 3

            def inner(d):
                j, h = d
                return j + 1, h * 0.999 + 0.001

            _, h = jax.lax.while_loop(inner_cond, inner, (0, h))
            obj = eu_residual_obj(x, w, h, use_pallas=True)
            return i + 1, w, h, obj

        _, w, h, obj = jax.lax.while_loop(
            outer_cond, outer, (0, w, h, jnp.float32(0)))
        return obj

    print("A:", float(run(x, w, h)))


def case_b():
    import jax
    import jax.numpy as jnp

    b, k = 512, 32
    a = jax.random.uniform(jax.random.PRNGKey(0), (b, k, k))
    a = a @ jnp.swapaxes(a, 1, 2) + 3.0 * jnp.eye(k)
    rhs = jax.random.uniform(jax.random.PRNGKey(1), (b, k))

    @jax.jit
    def run(a, rhs):
        def outer(c):
            i, acc = c

            def mid(d):
                j, acc = d

                def solve(a1, r1):
                    cho = jax.scipy.linalg.cho_factor(a1)
                    return jax.scipy.linalg.cho_solve(cho, r1)

                x = jax.vmap(solve)(a, rhs + acc * 1e-6)
                return j + 1, acc + jnp.sum(x)

            _, acc = jax.lax.while_loop(lambda d: d[0] < 3, mid, (0, acc))
            return i + 1, acc

        _, acc = jax.lax.while_loop(lambda c: c[0] < 4, outer,
                                    (0, jnp.float32(0)))
        return acc

    print("B:", float(run(a, rhs)))


def case_c():
    import jax
    import jax.numpy as jnp

    from tpunmf.core.linalg import spd_solve

    k, p = 32, 256
    g = jax.random.uniform(jax.random.PRNGKey(0), (k, k))
    g = g @ g.T + 2.0 * jnp.eye(k)
    b0 = jax.random.uniform(jax.random.PRNGKey(1), (k, p))

    @jax.jit
    def run(g, b0):
        # 4-deep: outer while -> mid while -> CG fori -> (CG body)
        def outer(c):
            i, b = c

            def mid(d):
                j, b = d
                x = spd_solve(g, b, method="cg")  # fori_loop inside
                return j + 1, b * 0.5 + x * 0.5

            _, b = jax.lax.while_loop(lambda d: d[0] < 3, mid, (0, b))
            return i + 1, b

        _, b = jax.lax.while_loop(lambda c: c[0] < 4, outer, (0, b0))
        return jnp.sum(b)

    print("C:", float(run(g, b0)))


def case_c2():
    """Case C with the mid while restructured to the masked fori of
    solvers/common.inner_loop — the AO-ADMM round-3 shape.  If this
    compiles and runs quickly, tpu_defaults.ao_admm_spd_solver can take
    CG on TPU."""
    import jax
    import jax.numpy as jnp

    from tpunmf.core.linalg import spd_solve
    from tpunmf.solvers.common import inner_loop

    k, p = 32, 256
    g = jax.random.uniform(jax.random.PRNGKey(0), (k, k))
    g = g @ g.T + 2.0 * jnp.eye(k)
    b0 = jax.random.uniform(jax.random.PRNGKey(1), (k, p))

    @jax.jit
    def run(g, b0):
        def outer(c):
            i, b = c

            def mid(b):
                x = spd_solve(g, b, method="cg")  # fori_loop inside
                b = b * 0.5 + x * 0.5
                return b, jnp.linalg.norm(x - b) < 1e-12

            b = inner_loop(mid, b, 3, "fori_masked")
            return i + 1, b

        _, b = jax.lax.while_loop(lambda c: c[0] < 4, outer, (0, b0))
        return jnp.sum(b)

    print("C2:", float(run(g, b0)))


CASES = {"A": case_a, "B": case_b, "C": case_c, "C2": case_c2}

if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--inline":
        CASES[sys.argv[2]]()
        sys.exit(0)
    names = sys.argv[1:] if len(sys.argv) > 1 else list(CASES)
    for name in names:
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inline", name],
                capture_output=True, text=True, timeout=420,
            )
            status = "OK" if p.returncode == 0 else f"FAILED rc={p.returncode}"
            tail = (p.stdout + p.stderr).strip().splitlines()
            detail = tail[-1][:140] if tail else ""
        except subprocess.TimeoutExpired:
            status, detail = "TIMEOUT", "compile/run stalled >420s"
        print(f"case {name}: {status} | {detail}", flush=True)
