"""Probe 2: manhattan gn_var via optimize_gn_host (1 fetch + 1 push per
iteration).  Variants: GN-from-scratch (the reference gn_var trajectory)
vs fast-phase + GN tail.  Run to completion in background."""

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
    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.core.solvers.host_chol import (HostCholSolver,
                                                optimize_gn_host)
    from g2o_tpu.sim.generators import create_manhattan

    out = {"device": str(jax.devices()[0])}
    target = 9116.756453 + 0.25

    g = create_manhattan(n_poses=3500, seed=0)
    p64 = g.compile(dtype=jnp.float64)
    est0 = {t: np.array(v) for t, v in p64.estimates.items()}
    solver = HostCholSolver().setup(p64)

    # ---- variant A: GN from scratch (reference gn_var trajectory) ----- #
    optimize_gn_host(p64, solver, 2)              # warm-up/compile
    p64.set_estimates({t: jnp.asarray(v, dtype=jnp.float64)
                       for t, v in est0.items()})
    res = optimize_gn_host(p64, solver, 8)
    chis = res["chi2_per_iteration"] + [res["chi2_final"]]
    cross = next((i for i, c in enumerate(chis) if c <= target), None)
    walls = res["iter_walls"]
    tt = round(sum(walls[:cross]), 3) if cross is not None else None
    out["gn_scratch"] = {
        "chi2": [round(c, 4) for c in chis],
        "iter_walls": [round(w, 4) for w in walls],
        "cross_iter": cross, "time_to_gn_var_chi2_s": tt,
    }
    print(json.dumps(out["gn_scratch"]), flush=True)

    # ---- variant B: fast fused phase + GN tail ------------------------ #
    p32 = g.compile(dtype=jnp.float32)
    fast = PCGSolver(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16)
    est32 = {t: np.array(v) for t, v in p32.estimates.items()}
    optimize_fused(p32, fast, 2)
    for n_fast in (20, 30):
        p32.set_estimates({t: jnp.asarray(v, dtype=jnp.float32)
                           for t, v in est32.items()})
        fast._host_state = None
        t1 = time.perf_counter()
        rfast = optimize_fused(p32, fast, n_fast)
        fast_wall = time.perf_counter() - t1
        p64.set_estimates({t: jnp.asarray(np.array(v), dtype=jnp.float64)
                           for t, v in p32.estimates.items()})
        res = optimize_gn_host(p64, solver, 6)
        chis = res["chi2_per_iteration"] + [res["chi2_final"]]
        cross = next((i for i, c in enumerate(chis) if c <= target), None)
        walls = res["iter_walls"]
        tt = (round(fast_wall + sum(walls[:cross]), 3)
              if cross is not None else None)
        out[f"fast{n_fast}_gn"] = {
            "fast_wall_s": round(fast_wall, 3),
            "fast_chi2": rfast["chi2_final"],
            "chi2": [round(c, 4) for c in chis],
            "iter_walls": [round(w, 4) for w in walls],
            "cross_iter": cross, "time_to_gn_var_chi2_s": tt,
        }
        print(json.dumps(out[f"fast{n_fast}_gn"]), flush=True)

    with open("/tmp/probe_hostchol_tpu2.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
