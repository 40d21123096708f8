"""Bisect the remaining TPU bf16 chi2 floor: global HIGHEST matmuls and
the mixed-precision (f64-state) compile."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)   # for the mixed config
import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.sim.generators import create_manhattan

TARGET = 9146.503719
BAND = TARGET * 1.01
g = create_manhattan(n_poses=3500, seed=0)

def run(name, p, skw, iters, ctx=None):
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    def reset():
        p.set_estimates({t: jnp.asarray(v, dtype=p.dtype) for t, v in est0.items()})
    s = PCGSolver(**skw)
    import contextlib
    cm = jax.default_matmul_precision(ctx) if ctx else contextlib.nullcontext()
    with cm:
        optimize_fused(p, s, 2); reset(); s._host_state = None
        t0 = time.perf_counter()
        res = optimize_fused(p, s, iters)
        w = time.perf_counter() - t0
    traj = [float(c) for c in res["chi2_per_iteration"]] + [float(res["chi2_final"])]
    spi = w / max(res["iterations"], 1)
    cross = next((i for i, c in enumerate(traj) if c <= TARGET), None)
    crossb = next((i for i, c in enumerate(traj) if c <= BAND), None)
    print(name, json.dumps({
        "chi2_final": traj[-1], "sec_per_iter": round(spi, 5),
        "cross_iter": cross, "cross_band_iter": crossb,
        "t_to_target": round(cross * spi, 3) if cross is not None else None,
        "t_to_band": round(crossb * spi, 3) if crossb is not None else None,
        "cg_total": int(sum(res.get("cg_per_iteration", []))),
        "wall_s": round(w, 2)}), flush=True)

deep = dict(max_iter=128, tol=1e-6, precond="chunk2", chunk_size=16,
            carry_factor=0.01)
fast = dict(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16)

p32 = g.compile(dtype=jnp.float32)
run("fast_globalhi", p32, fast, 60, ctx="highest")
run("deep_globalhi", p32, deep, 60, ctx="highest")

pmx = g.compile(dtype=jnp.float32, state_dtype=jnp.float64)
run("deep_mixed", pmx, dict(**deep, matvec_precision="highest"), 60)
print("DONE", flush=True)
