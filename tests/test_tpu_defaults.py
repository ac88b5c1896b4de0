"""Guard tests for the TPU-runtime workaround defaults.

The nested-while pathologies (cases A/B/C, benchmarks/repro_nested.py)
keep several fast paths fenced OFF on TPU backends.  These tests pin the
default-selection functions so any future flip is deliberate and
test-visible, and check the MUR solver (no nested whiles) keeps its
Pallas fast path.
"""
from tpunmf.solvers import tpu_defaults as td


def test_mur_keeps_pallas_on_tpu():
    assert td.mur_use_pallas("tpu") is True
    assert td.mur_use_pallas("cpu") is False


def test_hals_uses_pallas_objective_on_tpu():
    # HALS has the MUR loop shape (no nested whiles) — fused objective on
    assert td.hals_use_pallas("tpu") is True
    assert td.hals_use_pallas("cpu") is False


def test_anls_defaults_fence_case_a_and_b():
    # case B: batched Cholesky must not sit in 3-deep device nesting
    assert td.anls_masked_solver("tpu") == "cg"
    assert td.anls_masked_solver("cpu") == "chol"
    assert td.anls_device_loop("tpu", "cg") is True
    assert td.anls_device_loop("tpu", "chol") is False  # host loop instead
    assert td.anls_device_loop("cpu", "chol") is True
    # case A: no Pallas objective inside the NNLS-bearing loop
    assert td.anls_use_pallas("tpu") is False
    # CG step count: reduced on TPU (k0 warm starts, measured sweep);
    # CPU keeps the exact l+8 bound — parity tests live there
    assert td.anls_cg_iters("cpu") == 0
    assert td.anls_cg_iters("tpu") > 0
    # duals/CG internals at 3-pass f32 on TPU (bf16-noise duals cycle)
    assert td.anls_nnls_precision("cpu") is None
    assert td.anls_nnls_precision("tpu") == "highest"


def test_ao_admm_defaults_fence_case_c():
    # case C restructured: masked-fori inner loop on TPU (identical
    # iterates, one less data-dependent nesting level)
    assert td.ao_admm_inner_loop("tpu") == "fori_masked"
    assert td.ao_admm_inner_loop("cpu") == "while"
    assert td.ao_admm_spd_solver("tpu") == "chol"  # flips after C2 TPU test
    assert td.ao_admm_spd_solver("cpu") == "chol"
    # case A re-tested fixed in round 2: Pallas objective re-enabled
    assert td.ao_admm_use_pallas("tpu") is True
    assert td.ao_admm_use_pallas("cpu") is False


def test_admm_uses_cg_on_tpu():
    # flat ADMM is only 2-deep; CG is safe and faster
    assert td.admm_spd_solver("tpu") == "cg"
    assert td.admm_spd_solver("cpu") == "chol"


def test_repro_script_lists_all_cases():
    import benchmarks.repro_nested as rn

    assert set(rn.CASES) == {"A", "B", "C", "C2"}
