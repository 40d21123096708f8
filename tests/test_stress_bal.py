"""Ill-conditioned stress-BA regression: trajectory parity with the
reference (Huber-patched bal_example, baseline_measured.json bal_stress)
on the identical file, free gauge."""
import hashlib
import io

import jax.numpy as jnp
import pytest

import g2o_tpu.types  # noqa: F401
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
from g2o_tpu.io.bal import load_bal_problem, stress_bal_cached

REF_CHI2_10 = 13_338_682.04        # reference PCG, 10 LM iterations
# fingerprint of the committed data/bal_cache gzip (seed 0) — fail fast on
# cache loss / generator drift before the expensive optimize below
CACHE_SHA16 = "98046b2e57fe876a"


@pytest.mark.slow
def test_stress_scene_reference_parity():
    text = stress_bal_cached()
    assert text.splitlines()[0] == "120 30000 179961"
    assert hashlib.sha256(text.encode()).hexdigest()[:16] == CACHE_SHA16
    p = load_bal_problem(io.StringIO(text), huber=1.0,
                         bucket_landmarks=True, fix_first_camera=False,
                         dtype=jnp.float32)
    assert p.num_edges >= 179_961          # padded bucketed rows >= obs
    res = optimize_fused(
        p, ImplicitSchurSolver(max_iter=100, tol=1e-2,
                               precond="schur_jacobi",
                               matvec_precision="highest"), 10)
    # chi2 after 10 iterations within 0.05% of the reference trajectory
    assert abs(res["chi2_final"] - REF_CHI2_10) <= 5e-4 * REF_CHI2_10
    # the conditioning actually bites: CG counts must GROW (the easy
    # scenes stay at 3-9 per solve)
    cg = res["cg_per_iteration"]
    assert max(cg) >= 3 * max(cg[0], 1)
