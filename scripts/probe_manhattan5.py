"""Probe 5: frozen chunk2 preconditioner on manhattan3500 (batch mode).

Builds the two-level preconditioner ONCE per refresh block and runs K
fused LM iterations against it (refresh_every), vs the per-trial rebuild.
Staleness trades build cost against CG-iteration growth.

Usage: python scripts/probe_manhattan5.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import g2o_tpu.types  # noqa: F401
    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=3500, seed=0)
    p = g.compile()
    est0 = {t: np.array(v) for t, v in p.estimates.items()}

    def reset():
        p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                         for t, v in est0.items()})

    for refresh_every in (5, 10, 20):
        solver = PCGSolver(max_iter=32, tol=1e-2, precond="chunk2",
                           chunk_size=16, precond_mode="frozen")
        reset()
        optimize_fused(p, solver, 2)            # warm-up/compile
        reset()
        solver._host_state = None
        t0 = time.perf_counter()
        chis, cgs, iters = [], [], 0
        lam_carry = None
        while iters < 60:
            k = min(refresh_every, 60 - iters)
            solver.refresh_precond(p, lam=lam_carry)
            res = optimize_fused(p, solver, k,
                                 initial_lambda=lam_carry or 0.0)
            chis += res["chi2_per_iteration"]
            cgs += res["cg_per_iteration"]
            iters += res["iterations"]
            lam_carry = res["lambda_final"]
            if res["iterations"] < k:
                break
        wall = time.perf_counter() - t0
        sec_per_iter = wall / max(iters, 1)
        chis.append(res["chi2_final"])
        tt = next((round(i * sec_per_iter, 4)
                   for i, c in enumerate(chis) if c <= 9146.503719 * 1.01),
                  None)
        print(json.dumps({
            "config": f"frozen_chunk2_16_cap32_refresh{refresh_every}",
            "sec_per_iter": round(sec_per_iter, 6),
            "iters": iters,
            "chi2_final": chis[-1],
            "chi2_at_30": chis[30] if len(chis) > 30 else None,
            "time_to_ref_lm_chi2_s": tt,
            "cg_total": int(sum(cgs)),
        }), flush=True)


if __name__ == "__main__":
    main()
