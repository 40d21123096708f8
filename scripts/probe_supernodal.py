"""TPU: where do supernodal's 75 ms/solve at sphere2500 go?
Phase timings (factor vs fwd/back solve), schedule shape stats, and smax
sweep.  fori_loop marginals per CLAUDE.md timing rules."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import numpy as np
import jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.io import g2o_format
from g2o_tpu.core.solvers.supernodal import SupernodalCholeskySolver

print("devices:", jax.devices(), flush=True)
g = g2o_format.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "sphere2500.g2o"))
g.set_robust_kernel("Huber", 1.0)
p = g.compile()
lin = p.linearize_jit(p.data, p.estimates)
jax.block_until_ready(lin.b)


def wall(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


for smax in (24, 16, 32, 48):
    s = SupernodalCholeskySolver(smax=smax)
    t0 = time.perf_counter()
    s.setup(p)
    setup_s = time.perf_counter() - t0
    lv = s.aux["levels"]
    stats = [(len(bl), [tuple(bk["diag"].shape) + (bk["panel"].shape[1],)
                        for bk in bl]) for bl in lv]
    n_buckets = sum(len(bl) for bl in lv)
    lam = jnp.asarray(1e-3, p.dtype)

    t_full, _ = wall(lambda: s._solve_jit(p.data, lin, lam, s.aux))
    factor_jit = jax.jit(lambda data, lin, lam, aux:
                         s._factor_fn(data, lin, lam, aux))
    t_factor, blocks = wall(lambda: factor_jit(p.data, lin, lam, s.aux))
    from g2o_tpu.core.solvers.supernodal import solve_supernodal
    (tname,) = p.vertex_types
    bblk = p.split_tangent(lin.b)[tname]
    d = p.vertex_types[tname].tangent_dim
    solve_jit = jax.jit(lambda blocks, b:
                        solve_supernodal(blocks, b, s.aux["levels"], d))
    t_solve, _ = wall(lambda: solve_jit(blocks, bblk))
    print(f"smax{smax}", json.dumps({
        "setup_s": round(setup_s, 2),
        "levels": len(lv), "buckets": n_buckets,
        "full_ms": round(t_full * 1e3, 2),
        "factor_ms": round(t_factor * 1e3, 2),
        "triangular_ms": round(t_solve * 1e3, 2)}), flush=True)
    if smax == 24:
        print("  schedule:", json.dumps(stats), flush=True)
print("DONE", flush=True)
