"""Probe: fused LM + PCG on manhattan3500 (the round-1 perf loss).

Round-1 config was LM + supernodal direct Cholesky = 42.7 ms/iter (host
round-trip per iteration).  The sphere2500 headline runs the whole LM
optimization fused on device with carried-residual PCG at 12.8 ms/iter on a
larger graph — this probe measures the same path on manhattan and checks the
chi2 trajectory against the reference lm_var numbers
(baseline_measured.json: 10 ms/iter, chi2 9146.5 after 30 iters, GN fixed
point 9116.756).

Usage: python scripts/probe_manhattan_pcg.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import g2o_tpu.types  # noqa: F401
    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=3500, seed=0)
    p = g.compile()
    est0 = {t: np.array(v) for t, v in p.estimates.items()}

    def reset():
        p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                         for t, v in est0.items()})

    configs = [
        ("chunk32_tol1e-2", dict(max_iter=100, tol=1e-2, precond="chunk",
                                 chunk_size=32)),
        ("chunk64_tol1e-2", dict(max_iter=100, tol=1e-2, precond="chunk",
                                 chunk_size=64)),
        ("chunk64_tol1e-3", dict(max_iter=200, tol=1e-3, precond="chunk",
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
        # time to reference lm_var chi2 (+1%)
        tt = next((round(i * sec_per_iter, 4)
                   for i, c in enumerate(chis) if c <= 9146.503719 * 1.01),
                  None)
        out = {
            "config": name,
            "sec_per_iter": round(sec_per_iter, 6),
            "iters": res["iterations"],
            "chi2_final": res["chi2_final"],
            "chi2_at_10": chis[10] if len(chis) > 10 else None,
            "chi2_at_30": chis[30] if len(chis) > 30 else None,
            "time_to_ref_lm_chi2_s": tt,
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
