"""Round-5 perf probe: (1) free-gauge deflation on venice/ladybug/stress
(sec/iter + chi2@10 parity + CG counts), (2) manhattan fast-phase with
frozen chunk2 preconditioner.  Run to completion in background."""

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

    def reset():
        p.set_estimates({t: jnp.asarray(v, dtype=jnp.float32)
                         for t, v in est0.items()})

    # A: per-solve chunk2 (current bench config)
    sA = PCGSolver(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16)
    optimize_fused(p, sA, 2)
    reset()
    sA._host_state = None
    t0 = time.perf_counter()
    rA = optimize_fused(p, sA, 60)
    wA = time.perf_counter() - t0
    OUT["mh_per_solve"] = {
        "sec_per_iter": round(wA / rA["iterations"], 5),
        "iters": rA["iterations"], "chi2": rA["chi2_final"],
        "cg_total": int(sum(rA["cg_per_iteration"]))}
    print(json.dumps({"mh_per_solve": OUT["mh_per_solve"]}), flush=True)

    # B: frozen precond, refreshed every R iterations (chunked fused runs)
    for R in (60, 10):
        sB = PCGSolver(max_iter=32, tol=1e-2, precond="chunk2",
                       chunk_size=16, precond_mode="frozen")
        reset()
        sB.setup(p)
        optimize_fused(p, sB, 2)       # warm-up compile of frozen path
        reset()
        sB._host_state = None
        sB.refresh_precond(p)
        t0 = time.perf_counter()
        done, chis, cgs = 0, [], []
        while done < 60:
            k = min(R, 60 - done)
            r = optimize_fused(p, sB, k)
            chis += r["chi2_per_iteration"]
            cgs += [int(x) for x in r["cg_per_iteration"]]
            done += r["iterations"]
            if r["iterations"] < k:
                break
            if done < 60:
                sB.refresh_precond(p)
        wB = time.perf_counter() - t0
        OUT[f"mh_frozen_r{R}"] = {
            "sec_per_iter": round(wB / max(done, 1), 5),
            "iters": done, "chi2": float(r["chi2_final"]),
            "cg_total": int(sum(cgs))}
        print(json.dumps({f"mh_frozen_r{R}": OUT[f"mh_frozen_r{R}"]}),
              flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.setrecursionlimit(100_000)

    run_manhattan()
    run_bal("venice_base", 800, 150_000, 6)
    run_bal("venice_deflate", 800, 150_000, 6, deflate=True)
    run_bal("ladybug_deflate", 49, 7000, 5, deflate=True, matvec="highest")
    run_bal("stress_deflate", 0, 0, 0, stress=True, deflate=True,
            matvec="highest")

    with open("/tmp/probe_r5_perf.json", "w") as fh:
        json.dump(OUT, fh, indent=1)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
