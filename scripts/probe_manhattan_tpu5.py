"""Two-phase manhattan closure probe on the NEW code (HIGHEST assembly
einsums + jacrev): fast chunk2 to the plateau, then a deep-CG polish
phase that must reach the reference lm_var chi2 9146.5 WITHOUT a band.

Variants: deep polish at (cap128 tol1e-6) and (cap64 tol1e-4), plus a
fused-GN polish (no trust region, deep solves).
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.core.lm_fused import optimize_fused, optimize_fused_gn

TARGET = 9146.503719
BAND = TARGET * 1.01
g = create = None
from g2o_tpu.sim.generators import create_manhattan
g = create_manhattan(n_poses=3500, seed=0)
p = g.compile(dtype=jnp.float32)
est0 = {t: np.array(v) for t, v in p.estimates.items()}


def reset():
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est0.items()})


def report(name, res, wall):
    traj = [float(c) for c in res["chi2_per_iteration"]] + \
        [float(res["chi2_final"])]
    spi = wall / max(res["iterations"], 1)
    cross = next((i for i, c in enumerate(traj) if c <= TARGET), None)
    crossb = next((i for i, c in enumerate(traj) if c <= BAND), None)
    print(name, json.dumps({
        "chi2_final": traj[-1], "sec_per_iter": round(spi, 5),
        "iters": res["iterations"],
        "cross_iter": cross, "cross_band_iter": crossb,
        "cg_total": int(sum(res.get("cg_per_iteration", []))),
        "wall_s": round(wall, 3)}), flush=True)
    return traj[-1], spi


fast = PCGSolver(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16)
deepA = PCGSolver(max_iter=128, tol=1e-6, precond="chunk2", chunk_size=16,
                  carry_factor=0.01, matvec_precision="highest")
deepB = PCGSolver(max_iter=64, tol=1e-4, precond="chunk2", chunk_size=16,
                  carry_factor=0.01, matvec_precision="highest")
gnS = PCGSolver(max_iter=128, tol=1e-6, precond="chunk2", chunk_size=16,
                carry_factor=0.01, matvec_precision="highest")

# ---- phase 1: fast config (targeted HIGHEST assembly is now built in) ----
optimize_fused(p, fast, 2)            # compile
reset(); fast._host_state = None
t0 = time.perf_counter(); res = optimize_fused(p, fast, 60)
report("fast60", res, time.perf_counter() - t0)
est_plateau = {t: np.array(v) for t, v in p.estimates.items()}

# ---- phase 2 variants, each continuing from the plateau -------------------
def phase2(name, run_fn, solver, iters):
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est_plateau.items()})
    solver._host_state = None
    run_fn(p, solver, 2)              # compile (mutates estimates; reset)
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est_plateau.items()})
    solver._host_state = None
    t0 = time.perf_counter(); res = run_fn(p, solver, iters)
    report(name, res, time.perf_counter() - t0)

phase2("deepA40", optimize_fused, deepA, 40)
phase2("deepB40", optimize_fused, deepB, 40)
phase2("gn10", optimize_fused_gn, gnS, 10)
print("DONE", flush=True)
