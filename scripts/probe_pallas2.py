"""Probe: v2 Pallas one-hot kernels (in-kernel DMA loop) vs the XLA dot
form and the round-1 gridded kernels, at Venice shapes.

Measurement: while-loop marginal cost (chained ops inside fori_loop,
difference two loop lengths) — isolated reps under-report by dispatch
pipelining and profiler traces are inflated on this platform
(CLAUDE.md measurement traps).

Usage: python scripts/probe_pallas2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    # NOTE edge-major v2 kernels don't compile on this Mosaic: an HBM
    # memref slice along the 9-wide lane dim must be 128-aligned (and the
    # padded layout would 14x the bandwidth) — only the dims-major (D, N)
    # variants are measurable/useful, which is also what the production
    # bucketed path uses (onehot_*_t).
    from g2o_tpu.ops.onehot import onehot_gather_t, onehot_scatter_add_t
    from pallas_onehot_experimental import (  # noqa: E501
        gather_t_mxu, gather_t_mxu2, segment_sum_t_mxu, segment_sum_t_mxu2)

    HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    N, S = 900_000, 800

    def marginal(fn, args, k1=3, k2=9, reps=3):
        """Chained-op cost: (loop(k2) - loop(k1)) / (k2 - k1).  Consumer is
        (out*out).sum()*1e-30 — non-foldable AND non-narrowing (a [:k]
        slice lets the algebraic simplifier narrow the dot; measured as a
        fake 0.035 ms for the XLA one-hot form)."""
        def chain(k):
            def body(i, c):
                out = fn(*args)
                return c + (out * out).sum() * 1e-30
            return jax.jit(lambda z: jax.lax.fori_loop(0, k, body, z))
        c1, c2 = chain(k1), chain(k2)
        z = jnp.zeros((), jnp.float32)
        jax.block_until_ready(c1(z)); jax.block_until_ready(c2(z))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); jax.block_until_ready(c1(z))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); jax.block_until_ready(c2(z))
            tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / (k2 - k1))
        return best

    def safe(res, key, fn, args):
        try:
            res[key] = round(marginal(fn, args) * 1e3, 3)
        except Exception as e:              # noqa: BLE001 — record, go on
            res[key] = f"FAILED: {type(e).__name__}: {str(e)[:120]}"

    for d in (9, 81):
        idx = jnp.asarray(rng.integers(0, S, N), jnp.int32)
        rows_t = jnp.asarray(rng.normal(size=(d, N)), jnp.float32)
        table = jnp.asarray(rng.normal(size=(S, d)), jnp.float32)

        res = {"shape": f"N={N} S={S} d={d} (dims-major)"}
        safe(res, "scatter_xla_dot_ms",
             lambda i, r: onehot_scatter_add_t(i, r, S, precision=HI),
             (idx, rows_t))
        safe(res, "scatter_pallas_v1_ms",
             lambda i, r: segment_sum_t_mxu(i, r, S, precision=HI),
             (idx, rows_t))
        safe(res, "scatter_pallas_v2_ms",
             lambda i, r: segment_sum_t_mxu2(i, r, S, precision=HI),
             (idx, rows_t))
        safe(res, "gather_xla_dot_ms",
             lambda i, t: onehot_gather_t(i, t, precision=HI),
             (idx, table))
        safe(res, "gather_pallas_v1_ms",
             lambda i, t: gather_t_mxu(i, t, precision=HI), (idx, table))
        safe(res, "gather_pallas_v2_ms",
             lambda i, t: gather_t_mxu2(i, t, precision=HI), (idx, table))
        # correctness spot-check on device
        a = segment_sum_t_mxu2(idx, rows_t, S, precision=HI)
        b = onehot_scatter_add_t(idx, rows_t, S, precision=HI)
        res["v2_max_abs_diff"] = float(jnp.max(jnp.abs(a - b)))
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
