"""Probe formulations of the dims-major tiny-block contractions.

Compares, at Venice scale (E=900k, r=2, dp=9, dl=3):
  A. einsum "rse,sfe->rfe" / "rde,rfe->dfe"  (batched-dot lowering?)
  B. broadcast-multiply-reduce (forced elementwise VPU form)
for the linearize assembly block (WJ, Hss, brows for both slots) and the
solver's B production.

Usage: python scripts/probe_assembly.py [E] [REPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=20, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    r, dp, dl = 2, 9, 3

    rng = np.random.default_rng(0)
    Jp = jnp.asarray(rng.standard_normal((r, dp, E)), dtype=jnp.float32)
    Jl = jnp.asarray(rng.standard_normal((r, dl, E)), dtype=jnp.float32)
    W = jnp.asarray(rng.standard_normal((r, r, E)), dtype=jnp.float32)
    We = jnp.asarray(rng.standard_normal((r, E)), dtype=jnp.float32)

    def asm_einsum(Jp, Jl, W, We):
        outs = []
        for Jt, d in ((Jp, dp), (Jl, dl)):
            WJ = jnp.einsum("rse,sfe->rfe", W, Jt)
            Hss = jnp.einsum("rde,rfe->dfe", Jt, WJ).reshape(d * d, E)
            brows = -jnp.einsum("rde,re->de", Jt, We)
            outs.append((Hss, brows))
        return outs

    def asm_bcast(Jp, Jl, W, We):
        outs = []
        for Jt, d in ((Jp, dp), (Jl, dl)):
            # WJ[r,f,e] = sum_s W[r,s,e] * Jt[s,f,e]
            WJ = jnp.sum(W[:, :, None, :] * Jt[None, :, :, :], axis=1)
            # Hss[d,f,e] = sum_r Jt[r,d,e] * WJ[r,f,e]
            Hss = jnp.sum(Jt[:, :, None, :] * WJ[:, None, :, :],
                          axis=0).reshape(d * d, E)
            brows = -jnp.sum(Jt * We[:, None, :], axis=0)
            outs.append((Hss, brows))
        return outs

    def B_einsum(Jp, Jl, W):
        WJl = jnp.einsum("rse,sfe->rfe", W, Jl)
        return jnp.einsum("rde,rfe->dfe", Jp, WJl)

    def B_bcast(Jp, Jl, W):
        WJl = jnp.sum(W[:, :, None, :] * Jl[None, :, :, :], axis=1)
        return jnp.sum(Jp[:, :, None, :] * WJl[:, None, :, :], axis=0)

    ja, jb = jax.jit(asm_einsum), jax.jit(asm_bcast)
    t, oa = timeit(ja, Jp, Jl, W, We, reps=reps)
    print(f"assembly einsum:   {t*1e3:8.2f} ms", flush=True)
    t, ob = timeit(jb, Jp, Jl, W, We, reps=reps)
    print(f"assembly bcast:    {t*1e3:8.2f} ms", flush=True)
    err = max(float(jnp.abs(a - b).max())
              for (a1, a2), (b1, b2) in zip(oa, ob)
              for a, b in ((a1, b1), (a2, b2)))
    print(f"max abs diff:      {err:g}", flush=True)

    ja, jb = jax.jit(B_einsum), jax.jit(B_bcast)
    t, Ba = timeit(ja, Jp, Jl, W, reps=reps)
    print(f"B einsum:          {t*1e3:8.2f} ms", flush=True)
    t, Bb = timeit(jb, Jp, Jl, W, reps=reps)
    print(f"B bcast:           {t*1e3:8.2f} ms", flush=True)
    print(f"max abs diff:      {float(jnp.abs(Ba - Bb).max()):g}", flush=True)


if __name__ == "__main__":
    main()
