"""Round-5 probe b: (1) manhattan fast phase with every_k preconditioner
refresh (lax.cond-gated rebuild inside the fused loop) vs per-solve;
(2) same-process A/B of gauge deflation on ladybug/stress (probe_r5_perf
ran deflate-only — no base control on the same tunnel day)."""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = {}


def run_bal(tag, n_cams, n_pts, opp, stress=False, deflate=False,
            matvec="auto"):
    import jax.numpy as jnp
    import numpy as np

    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
    from g2o_tpu.io.bal import (load_bal_problem, stress_bal_cached,
                                synthetic_bal_cached)
    from g2o_tpu.types.bal import bal_gauge_basis

    if stress:
        text = stress_bal_cached()
        huber = 1.0
    else:
        text = synthetic_bal_cached(n_cameras=n_cams, n_points=n_pts,
                                    n_obs_per_point=opp, pixel_noise=1.0,
                                    seed=0)
        huber = 0.0
    p = load_bal_problem(io.StringIO(text), huber=huber,
                         bucket_landmarks=True, fix_first_camera=False,
                         dtype=jnp.float32)
    kw = dict(max_iter=100, tol=1e-2,
              precond="schur_jacobi" if stress else "jacobi",
              matvec_precision=matvec)
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


def run_manhattan():
    import jax.numpy as jnp
    import numpy as np

    import g2o_tpu.types  # noqa: F401
    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=3500, seed=0)
    p = g.compile(dtype=jnp.float32)
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    target = 9146.503719 * 1.01

    def reset():
        p.set_estimates({t: jnp.asarray(v, dtype=jnp.float32)
                         for t, v in est0.items()})

    def run(tag, solver):
        solver.setup(p)
        optimize_fused(p, solver, 2)
        reset()
        solver._host_state = None
        t0 = time.perf_counter()
        r = optimize_fused(p, solver, 60)
        w = time.perf_counter() - t0
        spi = w / r["iterations"]
        chis = r["chi2_per_iteration"] + [r["chi2_final"]]
        cross = next((i for i, c in enumerate(chis) if c <= target), None)
        OUT[tag] = {
            "sec_per_iter": round(spi, 5), "iters": r["iterations"],
            "chi2": float(r["chi2_final"]),
            "cg_total": int(sum(r["cg_per_iteration"])),
            "tt_band_s": round(cross * spi, 4) if cross is not None
            else None}
        print(json.dumps({tag: OUT[tag]}), flush=True)

    run("mh_per_solve", PCGSolver(max_iter=32, tol=1e-2, precond="chunk2",
                                  chunk_size=16))
    for K in (8, 16):
        run(f"mh_every{K}",
            PCGSolver(max_iter=32, tol=1e-2, precond="chunk2",
                      chunk_size=16, precond_mode="every_k",
                      precond_refresh_every=K))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.setrecursionlimit(100_000)

    run_manhattan()
    run_bal("ladybug_base", 49, 7000, 5, matvec="highest")
    run_bal("ladybug_deflate", 49, 7000, 5, deflate=True, matvec="highest")
    run_bal("stress_base", 0, 0, 0, stress=True, matvec="highest")
    run_bal("stress_deflate", 0, 0, 0, stress=True, deflate=True,
            matvec="highest")

    with open("/tmp/probe_r5b.json", "w") as fh:
        json.dump(OUT, fh, indent=1)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
