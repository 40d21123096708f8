"""Diagnose the manhattan3500 chi2 plateau (VERDICT r2 weak #1): run the
exact bench config (fused LM + chunk2(16) cap 32 tol 1e-2) on CPU float64
and sweep CG depth/tolerance — separates f32 floor from CG-cap from
chunk2-coarse accuracy.  Reference targets: lm_var 30-iter 9146.50,
gn_var converged 9116.76 (baseline_measured.json)."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.sim.generators import create_manhattan

g = create_manhattan(n_poses=3500, seed=0)

results = {}
configs = [
    ("bench_exact_f64", dict(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16), 60),
    ("deep_cg_f64", dict(max_iter=200, tol=1e-6, precond="chunk2", chunk_size=16), 60),
    ("jacobi_deep_f64", dict(max_iter=500, tol=1e-8, precond="jacobi"), 60),
]
for name, kw, iters in configs:
    p = g.compile()
    solver = PCGSolver(**kw)
    t0 = time.time()
    res = optimize_fused(p, solver, iters)
    results[name] = {
        "chi2_final": float(res["chi2_final"]),
        "chi2_last5": [float(c) for c in res["chi2_per_iteration"][-5:]],
        "chi2_at_30": float(res["chi2_per_iteration"][30]) if len(res["chi2_per_iteration"]) > 30 else None,
        "cg_total": int(sum(res.get("cg_per_iteration", []))),
        "wall_s": round(time.time() - t0, 1),
    }
    print(name, json.dumps(results[name]), flush=True)

with open("/tmp/manhattan_plateau.json", "w") as fh:
    json.dump(results, fh, indent=1)
print("DONE")
