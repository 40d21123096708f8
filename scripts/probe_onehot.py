"""Trustworthy (while-loop marginal) timing of the camera one-hot
gather/scatter at Venice shapes, vs row-level gather/scatter.

Usage: python scripts/probe_onehot.py [E] [N] [REPS]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loop_time(fn, x, k, reps=5):
    """Marginal per-application cost via fori_loop with data dependence."""
    import jax

    @partial(jax.jit, static_argnums=(1,))
    def run(x, k):
        def body(i, c):
            return fn(c) * 0.5 + c * 0.5
        return jax.lax.fori_loop(0, k, body, x)

    out = run(x, k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x, k)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from g2o_tpu.ops.onehot import onehot_gather_t, onehot_scatter_add_t

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    D = jax.lax.Precision.DEFAULT
    H = jax.lax.Precision.HIGHEST

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    table = jnp.asarray(rng.standard_normal((N, 9)), dtype=jnp.float32)
    rows_t = jnp.asarray(rng.standard_normal((9, E)), dtype=jnp.float32)

    # consume via sum-of-squares: slices/zero-multiplies of a dot get
    # narrowed or folded by the algebraic simplifier, timing nothing
    def sq(y):
        return (y * y).sum() * 1e-30

    for label, fn, x in [
        ("gather_t DEFAULT ", lambda t: t + sq(onehot_gather_t(idx, t, D)),
         table),
        ("gather_t HIGHEST ", lambda t: t + sq(onehot_gather_t(idx, t, H)),
         table),
        ("row gather       ", lambda t: t + sq(t[idx]), table),
        ("scatter_t DEFAULT", lambda r: r + sq(
            onehot_scatter_add_t(idx, r, N, D)), rows_t),
        ("scatter_t HIGHEST", lambda r: r + sq(
            onehot_scatter_add_t(idx, r, N, H)), rows_t),
        ("row scatter      ", lambda r: r + sq(
            jnp.zeros((N, 9), r.dtype).at[idx].add(r.T)), rows_t),
    ]:
        t10 = loop_time(fn, x, 10, reps)
        t40 = loop_time(fn, x, 40, reps)
        print(f"{label}: marginal {(t40 - t10) / 30 * 1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
