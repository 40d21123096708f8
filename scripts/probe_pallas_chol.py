"""TPU: pallas chol/trisolve kernels vs XLA expanders at workload shapes."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import numpy as np
import jax.numpy as jnp
from g2o_tpu.ops.pallas_chol import chol_batched, solve_lower_batched, \
    solve_upper_batched

print("devices:", jax.devices(), flush=True)


def wall(f, *a, reps=20):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


xla_chol = jax.jit(jnp.linalg.cholesky)
xla_tri = jax.jit(lambda L, B: jax.scipy.linalg.solve_triangular(
    L, B, lower=True))

rng = np.random.default_rng(0)
for S, n, m in [(2048, 16, 1), (219, 48, 48), (55, 144, 128),
                (64, 96, 768), (8, 672, 672)]:
    A = rng.standard_normal((S, n, n)).astype(np.float32)
    D = jnp.asarray(A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))
    B = jnp.asarray(rng.standard_normal((S, n, m)).astype(np.float32))
    t_p = wall(chol_batched, D)
    t_x = wall(xla_chol, D)
    L = chol_batched(D)
    Lx = xla_chol(D)
    err = float(jnp.abs(L - Lx).max() / jnp.abs(Lx).max())
    t_ps = wall(solve_lower_batched, L, B)
    t_xs = wall(xla_tri, Lx, B)
    t_pu = wall(solve_upper_batched, L, B)
    print(f"S{S} n{n} m{m}", json.dumps({
        "chol_pallas_ms": round(t_p * 1e3, 3),
        "chol_xla_ms": round(t_x * 1e3, 3),
        "fwd_pallas_ms": round(t_ps * 1e3, 3),
        "fwd_xla_ms": round(t_xs * 1e3, 3),
        "bwd_pallas_ms": round(t_pu * 1e3, 3),
        "err_vs_xla": f"{err:.1e}"}), flush=True)
print("DONE", flush=True)
