"""TPU manhattan_exact probe v2: f32 fast phase -> f64 GN deep-CG polish.

CPU-established facts (round 4):
  - the gn_var fixed point 9116.756 needs an f64-quality SOLVE (the
    Jacobi-scaled Hessian has kappa ~2e9: f32 direct factorization AND
    f32 CG both floor ~9135-9155);
  - f64 GN + chunk2-preconditioned deep CG (cap 4096, tol 1e-6, carry 0)
    from the f32 fast-phase plateau converges to 9116.76 by GN iter 3-4
    (~1000 CG iters/solve at cs16, ~580 at cs4);
  - f64 supernodal factorization on THIS TPU is pathological (>1 h for a
    2-iteration warm-up) — CG's vector ops are the viable f64 path.
This probe prices the f64 CG polish on the real chip.
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
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.core.lm_fused import optimize_fused, optimize_fused_gn
from g2o_tpu.sim.generators import create_manhattan

print("devices:", jax.devices(), flush=True)
TARGET = 9117.0
g = create_manhattan(n_poses=3500, seed=0)

# ---- phase 1: f32 fast descent (the existing bench fast phase) -------- #
p32 = g.compile(dtype=jnp.float32)
est0 = {t: np.array(v) for t, v in p32.estimates.items()}
fast = PCGSolver(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16)
optimize_fused(p32, fast, 2)                      # warm-up/compile
p32.set_estimates({t: jnp.asarray(v, dtype=jnp.float32)
                   for t, v in est0.items()})
fast._host_state = None
t0 = time.perf_counter()
res1 = optimize_fused(p32, fast, 60)
fast_wall = time.perf_counter() - t0
print("fast60", json.dumps({"chi2": res1["chi2_final"],
                            "wall": round(fast_wall, 3)}), flush=True)

# ---- phase 2: f64 GN polish with deep chunk2 CG ----------------------- #
est_pl = {t: np.array(v) for t, v in p32.estimates.items()}
for cs, cap in [(16, 4096)]:
    p64 = g.compile(dtype=jnp.float64)
    p64.set_estimates({t: jnp.asarray(v, dtype=jnp.float64)
                       for t, v in est_pl.items()})
    deep = PCGSolver(max_iter=cap, tol=1e-6, precond="chunk2",
                     chunk_size=cs, carry_factor=0.0,
                     precond_dtype=jnp.float32)
    t0 = time.perf_counter()
    res2 = optimize_fused_gn(p64, deep, 1)        # compile + 1 iter
    c_wall = time.perf_counter() - t0
    print(f"polish_cs{cs} compile+1it", round(c_wall, 1),
          "chi2", res2["chi2_final"], "cg", res2.get("cg_per_iteration"),
          flush=True)
    p64.set_estimates({t: jnp.asarray(v, dtype=jnp.float64)
                       for t, v in est_pl.items()})
    deep._host_state = None
    t0 = time.perf_counter()
    res3 = optimize_fused_gn(p64, deep, 5)
    w = time.perf_counter() - t0
    traj = [float(c) for c in res3["chi2_per_iteration"]] + \
        [float(res3["chi2_final"])]
    cross = next((i for i, c in enumerate(traj) if c <= TARGET), None)
    spi = w / max(res3["iterations"], 1)
    print(f"polish_cs{cs}", json.dumps({
        "traj": [round(c, 2) for c in traj],
        "cg": res3.get("cg_per_iteration"),
        "sec_per_iter": round(spi, 3), "wall": round(w, 2),
        "cross_iter": cross,
        "t_total_to_9117": (round(fast_wall + cross * spi, 3)
                            if cross is not None else None)}), flush=True)
print("DONE", flush=True)
