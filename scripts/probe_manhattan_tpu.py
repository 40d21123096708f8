"""TPU timing for manhattan chi2-closure candidates (VERDICT r2 item 1)."""
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
from g2o_tpu.sim.generators import create_manhattan

TARGET = 9146.503719
g = create_manhattan(n_poses=3500, seed=0)
p = g.compile()
est0 = {t: np.array(v) for t, v in p.estimates.items()}

def reset():
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype) for t, v in est0.items()})

def report(name, res, wall):
    traj = [float(c) for c in res["chi2_per_iteration"]] + [float(res["chi2_final"])]
    spi = wall / max(res["iterations"], 1)
    cross = next((i for i, c in enumerate(traj) if c <= TARGET), None)
    print(name, json.dumps({
        "chi2_final": traj[-1], "iters": res["iterations"],
        "sec_per_iter": round(spi, 5), "wall_s": round(wall, 3),
        "cross_iter": cross,
        "t_to_target": round(cross * spi, 3) if cross is not None else None,
        "cg_total": int(sum(res.get("cg_per_iteration", [])))}), flush=True)

# A: current bench config
sA = PCGSolver(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16)
optimize_fused(p, sA, 2); reset(); sA._host_state = None
t0 = time.perf_counter(); resA = optimize_fused(p, sA, 60); wA = time.perf_counter() - t0
report("A_fast60", resA, wA)

# B: deep solves throughout
sB = PCGSolver(max_iter=128, tol=1e-6, precond="chunk2", chunk_size=16,
               carry_factor=0.01)
reset(); optimize_fused(p, sB, 2); reset(); sB._host_state = None
t0 = time.perf_counter(); resB = optimize_fused(p, sB, 60); wB = time.perf_counter() - t0
report("B_deep60", resB, wB)

# C: two-phase fast + polish
reset(); sA._host_state = None; sB._host_state = None
t0 = time.perf_counter()
resC1 = optimize_fused(p, sA, 60)
resC2 = optimize_fused(p, sB, 25)
wC = time.perf_counter() - t0
print("C_two_phase", json.dumps({
    "chi2_final": float(resC2["chi2_final"]),
    "wall_s": round(wC, 3),
    "phase2_last": [float(c) for c in resC2["chi2_per_iteration"][-3:]]}), flush=True)

# D: fused GN with deep CG
sD = PCGSolver(max_iter=256, tol=1e-8, precond="chunk2", chunk_size=16,
               absolute_tolerance=False)
reset(); optimize_fused_gn(p, sD, 2); reset()
t0 = time.perf_counter(); resD = optimize_fused_gn(p, sD, 8); wD = time.perf_counter() - t0
report("D_gn8", resD, wD)
print("DONE", flush=True)
