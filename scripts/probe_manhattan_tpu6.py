"""Find the production manhattan schedule: bf16-assembly fast phase
(jacrev vs jacfwd), GN-from-scratch, and short-fast + GN-polish hybrids.
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
from g2o_tpu.sim.generators import create_manhattan

TARGET = 9146.503719
BAND = TARGET * 1.01
g = create_manhattan(n_poses=3500, seed=0)

p_fast = g.compile(dtype=jnp.float32, assembly_precision="default")
os.environ["G2O_TPU_JACREV"] = "0"
p_fwd = g.compile(dtype=jnp.float32, assembly_precision="default")
del os.environ["G2O_TPU_JACREV"]
p_hi = g.compile(dtype=jnp.float32)

est0 = {t: np.array(v) for t, v in p_fast.estimates.items()}


def setest(p, est):
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype) for t, v in est.items()})


def report(name, res, wall):
    traj = [float(c) for c in res["chi2_per_iteration"]] + \
        [float(res["chi2_final"])]
    spi = wall / max(res["iterations"], 1)
    cross = next((i for i, c in enumerate(traj) if c <= TARGET), None)
    crossb = next((i for i, c in enumerate(traj) if c <= BAND), None)
    print(name, json.dumps({
        "chi2_final": traj[-1], "sec_per_iter": round(spi, 5),
        "iters": res["iterations"], "cross_iter": cross,
        "cross_band_iter": crossb,
        "cg_total": int(sum(res.get("cg_per_iteration", []))),
        "wall_s": round(wall, 3)}), flush=True)
    return traj[-1]


def run(name, p, run_fn, solver, iters, est):
    setest(p, est); solver._host_state = None
    run_fn(p, solver, 2)
    setest(p, est); solver._host_state = None
    t0 = time.perf_counter(); res = run_fn(p, solver, iters)
    report(name, res, time.perf_counter() - t0)
    return {t: np.array(v) for t, v in p.estimates.items()}


fastkw = dict(max_iter=32, tol=1e-2, precond="chunk2", chunk_size=16)
deepkw = dict(max_iter=128, tol=1e-6, precond="chunk2", chunk_size=16,
              carry_factor=0.01, matvec_precision="highest")

# 1/2: fast-phase cost, jacrev vs jacfwd, bf16 assembly
est_f = run("fastD_rev60", p_fast, optimize_fused, PCGSolver(**fastkw), 60,
            est0)
run("fastD_fwd60", p_fwd, optimize_fused, PCGSolver(**fastkw), 60, est0)

# 3: GN deep from scratch
run("gn_scratch10", p_hi, optimize_fused_gn, PCGSolver(**deepkw), 10, est0)

# 4: short fast + GN polish
est25 = run("fastD25", p_fast, optimize_fused, PCGSolver(**fastkw), 25, est0)
run("gn_after25", p_hi, optimize_fused_gn, PCGSolver(**deepkw), 8, est25)

# 5: GN polish from the full fast plateau (production candidate)
run("gn_after60", p_hi, optimize_fused_gn, PCGSolver(**deepkw), 6, est_f)
print("DONE", flush=True)
