"""Micro-probe: TPU f64 (emulated) primitive costs vs f32.

Manhattan-exact needs an f64-quality SOLVE (kappa of the Jacobi-scaled
Hessian ~2e9, beyond f32 — measured round 4); this decides between plain
XLA f64 emulation and a hand-built double-single (two-float) path.
Costs measured as fori_loop marginals (x10 vs x40), per CLAUDE.md timing
rules.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)


def marginal(f, x, n1=10, n2=40):
    """Cost per application of f via fori_loop length difference."""
    def loop(n, x):
        def body(i, c):
            y = f(c)
            return y + (c * 1e-30)
        return jax.lax.fori_loop(0, n, body, x)

    l1 = jax.jit(loop, static_argnums=0)
    for n in (n1, n2):
        jax.block_until_ready(l1(n, x))   # compile both
    t = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(l1(n, x))
        t[n] = (time.perf_counter() - t0) / 3
    return (t[n2] - t[n1]) / (n2 - n1)


E, r, d = 8192, 3, 3
for dt in (jnp.float32, jnp.float64):
    name = "f32" if dt == jnp.float32 else "f64"
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.standard_normal((E, r, d)), dt)
    W = jnp.asarray(rng.standard_normal((E, r, r)), dt)
    v = jnp.asarray(rng.standard_normal((E, d)), dt)
    M = jnp.asarray(rng.standard_normal((1024, 128, 128)), dt)
    Mb = jnp.asarray(rng.standard_normal((2048, 16, 16)), dt)
    big = jnp.asarray(rng.standard_normal((4096, 1024)), dt)
    out = {}
    out["elemwise_4Mmul"] = marginal(lambda x: x * 1.0000001 + 0.1, big)
    out["einsum_erd_ed"] = marginal(
        lambda x: (jnp.einsum("erd,ed->er", J, x[:, :d],
                              precision=jax.lax.Precision.HIGHEST)
                   .sum(axis=1, keepdims=True) + x[:, :1]) * 1e-20 + x,
        v)
    out["tiny_chol16"] = marginal(
        lambda x: jnp.linalg.cholesky(
            jnp.einsum("eij,ekj->eik", x, x,
                       precision=jax.lax.Precision.HIGHEST)
            + 16 * jnp.eye(16, dtype=dt)) * 1e-20 + x, Mb)
    out["dot_1024"] = marginal(
        lambda x: jnp.einsum("ab,cb->ac", x, x,
                             precision=jax.lax.Precision.HIGHEST)[:, :1024]
        * 1e-20 + x, big)
    print(name, json.dumps({k: round(v * 1e3, 4) for k, v in out.items()}),
          "ms", flush=True)
print("DONE", flush=True)
