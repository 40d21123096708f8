"""TPU probe: what does the manhattan gn_var fixed point (chi2 9116.756)
cost on TPU?  CPU bisection (2026-08-21) showed:
  - f64 + EXACT solve (dense/supernodal): 9116.756 at GN iter 4  (the
    reference gn_var fixed point, optimization_algorithm_gauss_newton.cpp:50)
  - f64 deep-CG (tol 1e-10 cap 512): oscillates ~9300 — GN needs direct
  - f32 compute + f64 state: stalls ~9134 — J/assembly precision matters
Here: time full-f64 GN+supernodal and GN+dense on the real chip.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.solvers import DenseSolver
from g2o_tpu.core.solvers.supernodal import SupernodalCholeskySolver
from g2o_tpu.core.lm_fused import optimize_fused_gn
from g2o_tpu.sim.generators import create_manhattan

print("devices:", jax.devices(), flush=True)
TARGET = 9117.0
g = create_manhattan(n_poses=3500, seed=0)


def probe(label, mk_solver, iters=6, dtype=jnp.float64, state_dtype=None):
    p = g.compile(dtype=dtype, state_dtype=state_dtype)
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    solver = mk_solver()
    t0 = time.perf_counter()
    optimize_fused_gn(p, solver, 2)   # warm-up/compile
    print(label, "compile+2it wall", round(time.perf_counter() - t0, 1),
          flush=True)
    p.set_estimates({t: jnp.asarray(v, dtype=p.state_dtype)
                     for t, v in est0.items()})
    t0 = time.perf_counter()
    res = optimize_fused_gn(p, solver, iters)
    w = time.perf_counter() - t0
    traj = [float(c) for c in res["chi2_per_iteration"]] + \
        [float(res["chi2_final"])]
    cross = next((i for i, c in enumerate(traj) if c <= TARGET), None)
    spi = w / max(res["iterations"], 1)
    print(label, json.dumps({
        "chi2_final": round(traj[-1], 3), "cross": cross,
        "sec_per_iter": round(spi, 4),
        "t_to_9117": round(cross * spi, 3) if cross is not None else None,
        "traj": [round(c, 1) for c in traj],
        "wall": round(w, 2)}), flush=True)


probe("tpu_f64_supernodal_gn", lambda: SupernodalCholeskySolver())
probe("tpu_f64_dense_gn", lambda: DenseSolver())
print("DONE", flush=True)
