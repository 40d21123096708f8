"""Round-5 probe c: multifrontal supernodal factor+solve wall at
sphere2500 (VERDICT r4 task 2: <= 30 ms/solve, was ~75-100 ms), via
fori-marginal (difference two loop lengths — single-op reps are served
from a cache on this tunnel, CLAUDE.md)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.setrecursionlimit(100_000)
    import jax.numpy as jnp

    import g2o_tpu.types  # noqa: F401
    from g2o_tpu.core.solvers.supernodal import SupernodalCholeskySolver
    from g2o_tpu.sim.generators import create_sphere

    g = create_sphere(nodes_per_level=50, laps=50, radius=100, seed=0)
    p = g.compile(dtype=jnp.float32)
    lin = p.linearize_jit(p.data, p.estimates)
    lam = jnp.asarray(1e-3, p.dtype)

    s = SupernodalCholeskySolver().setup(p)

    def loop(k):
        def body(_, c):
            x = s._solve_fn(p.data, lin, lam + c * 1e-30, s.aux)
            return (x * x).sum() * 1e-30 + c
        return jax.lax.fori_loop(0, k, body, jnp.asarray(0.0, p.dtype))

    run = jax.jit(loop, static_argnums=0)
    out = {}
    for k in (2, 12):
        r = run(k)
        r.block_until_ready()           # compile+warm
        t0 = time.perf_counter()
        r = run(k)
        r.block_until_ready()
        out[f"wall_{k}"] = time.perf_counter() - t0
    per = (out["wall_12"] - out["wall_2"]) / 10
    out["ms_per_solve"] = round(per * 1e3, 2)

    # exactness spot check vs dense
    from g2o_tpu.core.solvers import DenseSolver
    import numpy as np

    dx_s = np.asarray(s.solve(p.data, lin, lam))
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, lam))
    out["rel_err_vs_dense"] = float(
        np.linalg.norm(dx_s - dx_d) / np.linalg.norm(dx_d))
    print(json.dumps(out))
    with open("/tmp/probe_r5c.json", "w") as fh:
        json.dump(out, fh)


if __name__ == "__main__":
    main()
