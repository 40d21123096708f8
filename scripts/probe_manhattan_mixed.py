"""Does MIXED precision (f32 compute + f64 state/residual/chi2/oplus)
reach the reference gn_var fixed point chi2 9116.756 on manhattan3500?

CPU first (fast, algorithmic answer), then the TPU run gives timing.
Run: python scripts/probe_manhattan_mixed.py [cpu|tpu]
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.core.lm_fused import optimize_fused, optimize_fused_gn
from g2o_tpu.sim.generators import create_manhattan

TARGET_GN = 9116.756272   # reference gn_var converged chi2 (iter 5)
TARGET_LM = 9146.503719   # reference lm_var chi2@30

g = create_manhattan(n_poses=3500, seed=0)


def run_config(p, label, use_gn, solver_kw, iters, fast_first=None):
    est0 = {t: np.array(v) for t, v in p.estimates.items()}

    def reset():
        p.set_estimates({t: jnp.asarray(v, dtype=p.state_dtype)
                         for t, v in est0.items()})

    pre_wall = 0.0
    if fast_first is not None:
        fs = PCGSolver(**fast_first[0])
        optimize_fused(p, fs, 2); reset(); fs._host_state = None
        t0 = time.perf_counter()
        optimize_fused(p, fs, fast_first[1])
        pre_wall = time.perf_counter() - t0

    s = PCGSolver(**solver_kw)
    opt = optimize_fused_gn if use_gn else optimize_fused
    est_mid = {t: np.array(v) for t, v in p.estimates.items()}
    opt(p, s, 2)
    p.set_estimates({t: jnp.asarray(v, dtype=p.state_dtype)
                     for t, v in est_mid.items()})
    s._host_state = None
    t0 = time.perf_counter()
    res = opt(p, s, iters)
    w = time.perf_counter() - t0
    traj = [float(c) for c in res["chi2_per_iteration"]] + \
        [float(res["chi2_final"])]
    spi = w / max(res["iterations"], 1)
    crossG = next((i for i, c in enumerate(traj) if c <= TARGET_GN), None)
    crossL = next((i for i, c in enumerate(traj) if c <= TARGET_LM), None)
    print(label, json.dumps({
        "chi2_final": round(traj[-1], 3),
        "sec_per_iter": round(spi, 5),
        "pre_wall": round(pre_wall, 3),
        "cross_gn_iter": crossG, "cross_lm_iter": crossL,
        "t_to_gn": (round(pre_wall + crossG * spi, 3)
                    if crossG is not None else None),
        "traj_tail": [round(c, 2) for c in traj[-5:]],
        "wall_s": round(w, 2)}), flush=True)


dtype = jnp.float32
for label, kw in [
    ("mixed_gn_deep", dict(max_iter=128, tol=1e-6, precond="chunk2",
                           chunk_size=16, carry_factor=0.01,
                           matvec_precision="highest")),
]:
    p = g.compile(dtype=dtype, state_dtype=jnp.float64)
    run_config(p, label, True, kw, 10)

# same but starting from the fast-phase plateau (the bench shape)
p = g.compile(dtype=dtype, state_dtype=jnp.float64)
run_config(p, "mixed_fast60_then_gn", True,
           dict(max_iter=128, tol=1e-6, precond="chunk2", chunk_size=16,
                carry_factor=0.01, matvec_precision="highest"), 8,
           fast_first=(dict(max_iter=32, tol=1e-2, precond="chunk2",
                            chunk_size=16), 60))
print("DONE", flush=True)
