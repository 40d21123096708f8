"""TPU: does matvec_precision="highest" close the ladybug/stress chi2 gap
(bf16 S·v passes under 'auto' at tol>=1e-3), and what does it cost?
Also: manhattan build_s under x64 (7.16 s vs 0.53 r03) phase split."""
import sys, os, io, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
from g2o_tpu.io.bal import load_bal_problem, synthetic_bal_cached, \
    stress_bal_cached

print("devices:", jax.devices(), flush=True)

# manhattan build split under x64
from g2o_tpu.sim.generators import create_manhattan
t0 = time.perf_counter()
g = create_manhattan(n_poses=3500, seed=0)
t1 = time.perf_counter()
p = g.compile(dtype=jnp.float32)
t2 = time.perf_counter()
print("manhattan build: generate", round(t1 - t0, 2),
      "compile+transfer", round(t2 - t1, 2), flush=True)

def run(label, text, huber, mk):
    p = load_bal_problem(io.StringIO(text), huber=huber,
                         bucket_landmarks=True, fix_first_camera=False,
                         dtype=jnp.float32)
    s = mk()
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    optimize_fused(p, s, 2)
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est0.items()})
    s._host_state = None
    t0 = time.perf_counter()
    res = optimize_fused(p, s, 10)
    w = time.perf_counter() - t0
    print(label, json.dumps({
        "chi2_10": res["chi2_final"],
        "sec_per_iter": round(w / max(res["iterations"], 1), 5),
        "cg": res["cg_per_iteration"]}), flush=True)

lady = synthetic_bal_cached(n_cameras=49, n_points=7000, n_obs_per_point=5,
                            pixel_noise=1.0, seed=0)
stress = stress_bal_cached()
run("ladybug_auto", lady, 0.0,
    lambda: ImplicitSchurSolver(max_iter=100, tol=1e-2, precond="jacobi"))
run("ladybug_highest", lady, 0.0,
    lambda: ImplicitSchurSolver(max_iter=100, tol=1e-2, precond="jacobi",
                                matvec_precision="highest"))
run("stress_auto", stress, 1.0,
    lambda: ImplicitSchurSolver(max_iter=100, tol=1e-2,
                                precond="schur_jacobi"))
run("stress_highest", stress, 1.0,
    lambda: ImplicitSchurSolver(max_iter=100, tol=1e-2,
                                precond="schur_jacobi",
                                matvec_precision="highest"))
print("DONE", flush=True)
