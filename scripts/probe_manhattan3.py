"""Sweep CG depth/continuation configs for the manhattan bench config
(CPU f64): find one that reaches chi2 <= 9146.5 by iter <= 60 at minimal
total CG work."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import g2o_tpu.types  # noqa
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.sim.generators import create_manhattan

g = create_manhattan(n_poses=3500, seed=0)
TARGET = 9146.503719

configs = [
    ("cap64_tol1e4_cf.05", dict(max_iter=64, tol=1e-4, carry_factor=0.05)),
    ("cap64_tol1e4_cf.5", dict(max_iter=64, tol=1e-4, carry_factor=0.5)),
    ("cap48_tol1e3_cf.05", dict(max_iter=48, tol=1e-3, carry_factor=0.05)),
    ("cap32_tol1e3_cf.1", dict(max_iter=32, tol=1e-3, carry_factor=0.1)),
    ("cap128_tol1e6_cf.01", dict(max_iter=128, tol=1e-6, carry_factor=0.01)),
    ("cap48_tol1e2_cf.02", dict(max_iter=48, tol=1e-2, carry_factor=0.02)),
]
for name, kw in configs:
    p = g.compile()
    solver = PCGSolver(precond="chunk2", chunk_size=16, **kw)
    t0 = time.time()
    res = optimize_fused(p, solver, 60)
    traj = [float(c) for c in res["chi2_per_iteration"]] + [float(res["chi2_final"])]
    cross = next((i for i, c in enumerate(traj) if c <= TARGET), None)
    cg = res.get("cg_per_iteration", [])
    print(name, json.dumps({
        "chi2_final": traj[-1],
        "chi2_at_30": traj[30],
        "cross_iter": cross,
        "cg_total": int(sum(cg)),
        "cg_to_cross": int(sum(cg[:cross])) if cross and cg else None,
        "wall_s": round(time.time() - t0, 1)}), flush=True)
print("DONE")
