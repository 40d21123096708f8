"""Probe 4: manhattan3500 chunk2 build-cost breakdown on the TPU.

Times the preconditioner build paths (jacobi / chunk-chain / chunk2) and
the chunk2 sub-components (intra-chunk scatter, coarse assembly, coarse
factor+inverse) in isolation.

Usage: python scripts/probe_manhattan4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, reps=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import g2o_tpu.types  # noqa: F401
    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.core.solvers.supernodal import (
        _chol_batched, _solve_lower_batched, _solve_upper_batched)
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=3500, seed=0)
    p = g.compile()
    lin = p.linearize_jit(p.data, p.estimates)
    lam = jnp.asarray(1e-3, p.dtype)
    out = {}

    for name, kw in [("jacobi", dict(precond="jacobi")),
                     ("chunk16", dict(precond="chunk", chunk_size=16)),
                     ("chunk2_16", dict(precond="chunk2", chunk_size=16)),
                     ("chunk2_32", dict(precond="chunk2", chunk_size=32))]:
        s = PCGSolver(max_iter=1, **kw)
        s.setup(p)
        # reach the build/apply closures through a fresh setup-scoped jit
        build = s._dbg_build if hasattr(s, "_dbg_build") else None
        if build is None:
            continue
        t_build = bench(jax.jit(build), p.data, lin, lam)
        minv = jax.jit(build)(p.data, lin, lam)
        rb = p.split_tangent(lin.b)
        t_apply = bench(jax.jit(lambda m, r: s._dbg_apply(p.data, m, r)),
                        minv, rb)
        out[name] = {"build_ms": round(t_build * 1e3, 3),
                     "apply_ms": round(t_apply * 1e3, 3)}

    # chunk2 sub-components at chunk_size=16
    s = PCGSolver(max_iter=1, precond="chunk2", chunk_size=16)
    s.setup(p)
    if hasattr(s, "_dbg_parts"):
        for pname, fn in s._dbg_parts.items():
            out[f"part_{pname}"] = round(bench(jax.jit(fn), p.data, lin, lam)
                                         * 1e3, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
