"""Probe 3: manhattan3500 cost split + CG-cap sweep.

skeleton (max_iter=1) isolates the per-LM-iteration fixed cost
(linearize + precond build + 1 CG iter + apply + chi2); cap sweeps bound
the spiky solves seen at tol=1e-2.

Usage: python scripts/probe_manhattan3.py
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

    configs = [
        ("skeleton_chunk2_16_cap1", dict(max_iter=1, tol=1e-2,
                                         precond="chunk2", chunk_size=16)),
        ("skeleton_jacobi_cap1", dict(max_iter=1, tol=1e-2,
                                      precond="jacobi")),
        ("chunk2_16_cap16", dict(max_iter=16, tol=1e-2, precond="chunk2",
                                 chunk_size=16)),
        ("chunk2_16_cap24", dict(max_iter=24, tol=1e-2, precond="chunk2",
                                 chunk_size=16)),
        ("chunk2_16_cap32", dict(max_iter=32, tol=1e-2, precond="chunk2",
                                 chunk_size=16)),
        ("jacobi_cap32", dict(max_iter=32, tol=1e-2, precond="jacobi")),
    ]
    for name, kw in configs:
        solver = PCGSolver(**kw)
        reset()
        t0 = time.perf_counter()
        optimize_fused(p, solver, 2)   # warm-up/compile
        compile_s = time.perf_counter() - t0
        reset()
        res = optimize_fused(p, solver, 60)
        sec_per_iter = res["wall_s"] / max(res["iterations"], 1)
        chis = res["chi2_per_iteration"] + [res["chi2_final"]]
        tt = next((round(i * sec_per_iter, 4)
                   for i, c in enumerate(chis) if c <= 9146.503719 * 1.01),
                  None)
        cg = res.get("cg_per_iteration", [])
        print(json.dumps({
            "config": name,
            "sec_per_iter": round(sec_per_iter, 6),
            "chi2_final": res["chi2_final"],
            "chi2_at_30": chis[30] if len(chis) > 30 else None,
            "time_to_ref_lm_chi2_s": tt,
            "cg_total": int(sum(cg)),
            "trials_total": int(sum(res["trials_per_iteration"])),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
