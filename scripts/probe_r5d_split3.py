"""Round-5 probe d: split3 one-hot products (3 bf16 MXU passes, exact
f32) vs HIGHEST at venice scale — whole fused-LM iteration A/B in one
process (same-day control), plus chi2@10 parity."""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = {}


def run(tag, split3, deflate=True):
    import jax.numpy as jnp
    import numpy as np

    import g2o_tpu.ops.onehot as onehot_mod
    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
    from g2o_tpu.io.bal import load_bal_problem, synthetic_bal_cached
    from g2o_tpu.types.bal import bal_gauge_basis

    onehot_mod._USE_SPLIT3 = split3
    text = synthetic_bal_cached(n_cameras=800, n_points=150_000,
                                n_obs_per_point=6, pixel_noise=1.0, seed=0)
    p = load_bal_problem(io.StringIO(text), huber=0.0,
                         bucket_landmarks=True, fix_first_camera=False,
                         dtype=jnp.float32)
    kw = dict(max_iter=100, tol=1e-2, precond="jacobi")
    if deflate:
        kw["deflate_basis"] = bal_gauge_basis(p)
    solver = ImplicitSchurSolver(**kw)
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    optimize_fused(p, solver, 2)
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est0.items()})
    solver._host_state = None
    t0 = time.perf_counter()
    res = optimize_fused(p, solver, 10)
    wall = time.perf_counter() - t0
    OUT[tag] = {
        "sec_per_iter": round(wall / res["iterations"], 5),
        "chi2_final": res["chi2_final"],
        "cg_per_iteration": [int(x) for x in res["cg_per_iteration"]],
    }
    print(json.dumps({tag: OUT[tag]}), flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.setrecursionlimit(100_000)

    run("venice_highest", False)
    run("venice_split3", True)

    with open("/tmp/probe_r5d.json", "w") as fh:
        json.dump(OUT, fh, indent=1)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
