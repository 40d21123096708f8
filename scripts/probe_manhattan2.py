"""Probe 2: manhattan3500 preconditioner study on the TPU.

(a) supernodal numeric factorize vs triangular-solve cost in isolation and
    by while-loop marginal (the trustworthy TPU measurement);
(b) fused-LM trajectory with the chunk2 (two-level Schwarz) preconditioner.

Usage: python scripts/probe_manhattan2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, reps=20):
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
    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.core.solvers.supernodal import (
        SupernodalCholeskySolver, factorize_supernodal, solve_supernodal)
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=3500, seed=0)
    p = g.compile()
    est0 = {t: np.array(v) for t, v in p.estimates.items()}

    def reset():
        p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                         for t, v in est0.items()})

    # ---------------- (a) supernodal cost split ---------------- #
    sn = SupernodalCholeskySolver(refine=0)
    sn.setup(p)
    lin = p.linearize_jit(p.data, p.estimates)
    lam = jnp.asarray(1e-3, p.dtype)
    d = p.vertex_types[next(iter(p.vertex_types))].tangent_dim
    nlev = len(sn.aux["levels"])
    nbuckets = sum(len(lv) for lv in sn.aux["levels"])

    factor_jit = jax.jit(lambda data, lin, lam: sn._factor_fn(
        data, lin, lam, sn.aux))
    blocks = factor_jit(p.data, lin, lam)
    t_factor = bench(factor_jit, p.data, lin, lam)

    tname = next(iter(p.vertex_types))
    bblk = p.split_tangent(lin.b)[tname]
    perm = sn.aux["perm"]
    solve_jit = jax.jit(lambda blocks, b: solve_supernodal(
        blocks, b[perm], sn.aux["levels"], d))
    t_solve = bench(solve_jit, blocks, bblk)

    # while-loop marginal for the triangular solve (dispatch pipelining can
    # hide isolated-op latency): chained solves, x10 vs x30 lengths
    def chain(k):
        def body(i, b):
            out = solve_supernodal(blocks, b, sn.aux["levels"], d)
            return b + out * 1e-20
        return jax.jit(lambda b: jax.lax.fori_loop(0, k, body, b))

    c10, c30 = chain(10), chain(30)
    t10 = bench(c10, bblk, reps=5)
    t30 = bench(c30, bblk, reps=5)
    t_solve_marginal = (t30 - t10) / 20.0

    print(json.dumps({
        "probe": "supernodal_split",
        "levels": nlev, "buckets": nbuckets,
        "factorize_s": round(t_factor, 5),
        "solve_isolated_s": round(t_solve, 5),
        "solve_marginal_s": round(t_solve_marginal, 5),
    }), flush=True)

    # ---------------- (b) chunk2 fused trajectory ---------------- #
    configs = [
        ("chunk2_16_tol1e-2", dict(max_iter=100, tol=1e-2, precond="chunk2",
                                   chunk_size=16)),
        ("chunk2_32_tol1e-2", dict(max_iter=100, tol=1e-2, precond="chunk2",
                                   chunk_size=32)),
        ("chunk2_32_tol3e-2", dict(max_iter=100, tol=3e-2, precond="chunk2",
                                   chunk_size=32)),
        ("chunk2_64_tol1e-2", dict(max_iter=100, tol=1e-2, precond="chunk2",
                                   chunk_size=64)),
    ]
    for name, kw in configs:
        solver = PCGSolver(**kw)
        reset()
        t0 = time.perf_counter()
        optimize_fused(p, solver, 2)   # warm-up/compile
        compile_s = time.perf_counter() - t0
        reset()
        res = optimize_fused(p, solver, 60)
        sec_per_iter = res["wall_s"] / max(res["iterations"], 1)
        chis = res["chi2_per_iteration"] + [res["chi2_final"]]
        tt = next((round(i * sec_per_iter, 4)
                   for i, c in enumerate(chis) if c <= 9146.503719 * 1.01),
                  None)
        cg = res.get("cg_per_iteration", [])
        print(json.dumps({
            "config": name,
            "sec_per_iter": round(sec_per_iter, 6),
            "chi2_final": res["chi2_final"],
            "chi2_at_30": chis[30] if len(chis) > 30 else None,
            "time_to_ref_lm_chi2_s": tt,
            "cg_total": int(sum(cg)),
            "cg_first10": cg[:10],
            "trials_total": int(sum(res["trials_per_iteration"])),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
