"""Probe: manhattan gn_var fixed point via the host native sparse
Cholesky (f64 GN tail) vs the round-4 f64 deep-CG phase.

Pipeline under test (candidate bench phase 3):
  fast fused-LM chunk2 (f32)  ->  host-loop f64 GN + HostCholSolver

Reports per-phase walls, per-iteration chi2, and the cumulative wall at
the gn_var crossing (target: reference 0.067 s, round-4 ours 5.0 s).

Run to completion in background (never kill a TPU-attached process).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.setrecursionlimit(100_000)
    import jax.numpy as jnp
    import numpy as np

    import g2o_tpu.types  # noqa: F401
    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.optimizer import GaussNewton, SparseOptimizer
    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.core.solvers.host_chol import HostCholSolver
    from g2o_tpu.sim.generators import create_manhattan

    out = {"device": str(jax.devices()[0])}

    t0 = time.perf_counter()
    g = create_manhattan(n_poses=3500, seed=0)
    p = g.compile(dtype=jnp.float32)
    out["build_s"] = round(time.perf_counter() - t0, 3)

    # ---- fast phase (same config as bench) --------------------------- #
    solver = PCGSolver(max_iter=32, tol=1e-2, precond="chunk2",
                       chunk_size=16)
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    optimize_fused(p, solver, 2)                    # warm-up/compile
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est0.items()})
    solver._host_state = None
    for n_fast in (60, 40, 30):
        p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                         for t, v in est0.items()})
        solver._host_state = None
        t1 = time.perf_counter()
        res = optimize_fused(p, solver, n_fast)
        fast_wall = time.perf_counter() - t1
        plateau = {t: np.array(v) for t, v in p.estimates.items()}

        # ---- exact phase: host-loop f64 GN + host Cholesky ----------- #
        p64 = g.compile(dtype=jnp.float64)
        p64.set_estimates({t: jnp.asarray(v, dtype=jnp.float64)
                           for t, v in plateau.items()})
        opt = SparseOptimizer(p64, algorithm=GaussNewton(),
                              solver=HostCholSolver())
        # warm-up compile of linearize/assemble/apply/chi2 jits
        t2 = time.perf_counter()
        opt.optimize(1)
        warm_s = time.perf_counter() - t2
        p64.set_estimates({t: jnp.asarray(v, dtype=jnp.float64)
                           for t, v in plateau.items()})
        opt2 = SparseOptimizer(p64, algorithm=GaussNewton(),
                               solver=opt.solver)   # reuse setup
        t3 = time.perf_counter()
        opt2.optimize(6)
        gn_wall = time.perf_counter() - t3
        chis = [s.chi2 for s in opt2.batch_statistics] + [opt2.chi2()]
        iter_walls = [round(s.time_iteration, 4)
                      for s in opt2.batch_statistics]
        target = 9116.756453 + 0.25
        cross = next((i for i, c in enumerate(chis) if c <= target), None)
        spi = gn_wall / max(len(opt2.batch_statistics), 1)
        tt = (round(fast_wall + cross * spi, 3)
              if cross is not None else None)
        out[f"fast{n_fast}"] = {
            "fast_wall_s": round(fast_wall, 3),
            "fast_iters": res["iterations"],
            "fast_chi2": res["chi2_final"],
            "gn_warm_s": round(warm_s, 3),
            "gn_wall_s": round(gn_wall, 3),
            "gn_sec_per_iter": round(spi, 4),
            "gn_iter_walls": iter_walls,
            "gn_chi2": [round(float(c), 4) for c in chis],
            "cross_iter": cross,
            "time_to_gn_var_chi2_s": tt,
        }
        print(json.dumps({f"fast{n_fast}": out[f"fast{n_fast}"]}),
              flush=True)

    with open("/tmp/probe_hostchol_tpu.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
