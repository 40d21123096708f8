"""Validate HIGHEST-precision CG matvec on TPU manhattan."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.sim.generators import create_manhattan

TARGET = 9146.503719
BAND = TARGET * 1.01
g = create_manhattan(n_poses=3500, seed=0)
p = g.compile()
est0 = {t: np.array(v) for t, v in p.estimates.items()}

def reset():
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype) for t, v in est0.items()})

def report(name, res, wall):
    traj = [float(c) for c in res["chi2_per_iteration"]] + [float(res["chi2_final"])]
    spi = wall / max(res["iterations"], 1)
    cross = next((i for i, c in enumerate(traj) if c <= TARGET), None)
    crossb = next((i for i, c in enumerate(traj) if c <= BAND), None)
    print(name, json.dumps({
        "chi2_final": traj[-1], "sec_per_iter": round(spi, 5),
        "cross_iter": cross, "cross_band_iter": crossb,
        "t_to_target": round(cross * spi, 3) if cross is not None else None,
        "t_to_band": round(crossb * spi, 3) if crossb is not None else None,
        "cg_total": int(sum(res.get("cg_per_iteration", []))),
        "wall_s": round(wall, 2)}), flush=True)

for name, kw, iters in [
    ("fast_hi", dict(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16,
                     matvec_precision="highest"), 60),
    ("deep_hi", dict(max_iter=128, tol=1e-6, precond="chunk2", chunk_size=16,
                     carry_factor=0.01, matvec_precision="highest"), 60),
]:
    s = PCGSolver(**kw)
    optimize_fused(p, s, 2); reset(); s._host_state = None
    t0 = time.perf_counter()
    res = optimize_fused(p, s, iters)
    report(name, res, time.perf_counter() - t0)
print("DONE", flush=True)
