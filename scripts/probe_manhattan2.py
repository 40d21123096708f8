"""Plateau diagnosis round 2: is the LM trajectory exact-solve-limited?"""
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

# near-exact CG solves, carry disabled
for name, kw, iters in [
    ("chunk2_exact_nocarry", dict(max_iter=500, tol=1e-10, precond="chunk2",
                                  chunk_size=16, absolute_tolerance=False), 40),
    ("chunk2_deep_nocarry", dict(max_iter=64, tol=1e-4, precond="chunk2",
                                 chunk_size=16, absolute_tolerance=False), 60),
]:
    p = g.compile()
    solver = PCGSolver(**kw)
    t0 = time.time()
    res = optimize_fused(p, solver, iters)
    traj = [float(c) for c in res["chi2_per_iteration"]]
    print(name, json.dumps({
        "chi2_final": float(res["chi2_final"]),
        "chi2_at_10": traj[10] if len(traj) > 10 else None,
        "chi2_at_20": traj[20] if len(traj) > 20 else None,
        "chi2_at_30": traj[30] if len(traj) > 30 else None,
        "cg_total": int(sum(res.get("cg_per_iteration", []))),
        "wall_s": round(time.time() - t0, 1)}), flush=True)

# host-loop LM with the direct supernodal solver: the reference-formula
# trajectory with EXACT solves
import g2o_tpu
from g2o_tpu.core.solvers import SparseCholeskySolver
p = g.compile()
opt = g2o_tpu.SparseOptimizer(p, algorithm=g2o_tpu.LevenbergMarquardt(),
                              solver=SparseCholeskySolver(), verbose=False)
t0 = time.time()
stats = opt.optimize(40)
chis = [s.chi2 for s in opt.batch_statistics] if hasattr(opt, "batch_statistics") else []
print("host_lm_direct", json.dumps({
    "chi2_final": float(opt.chi2()),
    "wall_s": round(time.time() - t0, 1),
    "chis_10_20_30": [float(chis[i]) if len(chis) > i else None for i in (10, 20, 30)],
}), flush=True)
print("DONE")
