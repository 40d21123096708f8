"""TPU Venice iteration accounting (VERDICT r3 item 6): fused-loop
marginal per-iteration wall vs the sum of component costs, same process
same day.  Components: linearize, solve (setup + CG), apply."""
import sys, os, io, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
from g2o_tpu.io.bal import load_bal_problem, synthetic_bal_cached

print("devices:", jax.devices(), flush=True)
text = synthetic_bal_cached(n_cameras=800, n_points=150_000,
                            n_obs_per_point=6, pixel_noise=1.0, seed=0)
p = load_bal_problem(io.StringIO(text), huber=0.0, bucket_landmarks=True,
                     fix_first_camera=False, dtype=jnp.float32)
est0 = {t: np.array(v) for t, v in p.estimates.items()}
s = ImplicitSchurSolver(max_iter=100, tol=1e-2, precond="jacobi")


def reset():
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est0.items()})
    s._host_state = None


# fused marginal: 10 vs 40 iterations
optimize_fused(p, s, 2)
reset()
t0 = time.perf_counter(); r10 = optimize_fused(p, s, 10)
w10 = time.perf_counter() - t0
reset()
t0 = time.perf_counter(); r40 = optimize_fused(p, s, 40)
w40 = time.perf_counter() - t0
marg = (w40 - w10) / (r40["iterations"] - r10["iterations"])
print("fused", json.dumps({
    "w10": round(w10, 2), "w40": round(w40, 2),
    "marginal_ms_per_iter": round(marg * 1e3, 2),
    "cg10": r10["cg_per_iteration"], "cg40_tail": r40["cg_per_iteration"][-5:],
}), flush=True)

# components at the 10-iter state (same-day, same process)
lin = p.linearize_jit(p.data, p.estimates)
jax.block_until_ready(lin.b)


def wall(f, reps=10):
    out = f(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(); jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


t_lin = wall(lambda: p.linearize_jit(p.data, p.estimates))
lam = jnp.asarray(1e-3, p.dtype)
sstate = s.state0
solve_jit = jax.jit(s._solve_state_fn)
t_solve = wall(lambda: solve_jit(p.data, lin, lam, s.aux, sstate))
dx, _, st = solve_jit(p.data, lin, lam, s.aux, sstate)
t_apply = wall(lambda: p.apply_jit(p.data, p.estimates, dx))
print("components", json.dumps({
    "linearize_ms": round(t_lin * 1e3, 2),
    "solve_ms": round(t_solve * 1e3, 2),
    "solve_cg_iters": int(st["cg_iterations"]),
    "apply_ms": round(t_apply * 1e3, 2),
    "sum_ms": round((t_lin + t_solve + t_apply) * 1e3, 2),
    "fused_marginal_ms": round(marg * 1e3, 2)}), flush=True)
print("DONE", flush=True)
