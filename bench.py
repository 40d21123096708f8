"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline config (BASELINE.json): LM iterations/sec on the sphere2500 SE3
pose graph (50 nodes/lap x 50 laps, the reference ``create_sphere`` dataset)
with robust Huber kernels.  ``vs_baseline`` compares against the reference
g2o's measured per-LM-iteration wall time on this machine's CPU when a
measurement file exists (``baseline_measured.json``, produced by
``scripts/measure_reference.py``); otherwise it is reported as 0.
"""

import json
import os
import sys
import time


def main():
    import jax

    # persistent compilation cache: the expensive first compile of the fused
    # runner is reused across bench invocations on this machine
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.sim.generators import create_sphere

    t0 = time.perf_counter()
    # prefer the dataset produced by the REFERENCE's own create_sphere
    # binary (vendored in data/) so chi2 values compare 1:1 with the
    # measured baseline; fall back to our generator
    ref_sphere = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "data", "sphere2500.g2o")
    if os.path.exists(ref_sphere):
        import g2o_tpu.types  # register tags
        from g2o_tpu.io import g2o_format

        g = g2o_format.load(ref_sphere)
        dataset = "sphere2500 (reference create_sphere)"
    else:
        g = create_sphere(nodes_per_level=50, laps=50, radius=100.0, seed=0)
        dataset = "sphere2500 (synthetic)"
    g.set_robust_kernel("Huber", 1.0)
    build_s = time.perf_counter() - t0

    from g2o_tpu.core.lm_fused import optimize_fused

    p = g.compile()
    # chunked block-tridiagonal preconditioner: captures the trajectory
    # chain, and with the invert-once formulation its per-CG-iteration
    # apply is a single batched einsum — measured best time-to-target on
    # 1x v5e (0.52 s vs 0.74 s block-Jacobi).  tol=0.1 is eta-forcing: LM
    # only needs a descent direction, not an exact solve; the sweep at
    # tol in {1e-6, 3e-2, 1e-1} reaches the identical final chi2 with
    # time-to-reference-chi2 0.51 -> 0.47 s at tol=0.1.
    solver = PCGSolver(max_iter=50, tol=1e-1, precond="chunk", chunk_size=16)

    # warm-up run (compiles the fused device loop)
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    res = optimize_fused(p, solver, 2)   # warm-up/compile
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est0.items()})
    chi0 = res["chi2_per_iteration"][0]

    n_iter = 50
    res = optimize_fused(p, solver, n_iter)
    wall = res["wall_s"]
    chi1 = res["chi2_final"]

    iters_per_sec = res["iterations"] / wall
    sec_per_iter = wall / res["iterations"]

    vs_baseline = 0.0
    time_to_ref_chi2 = None
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline_measured.json")
    if os.path.exists(ref_path):
        with open(ref_path) as fh:
            ref = json.load(fh)
        ref_sec = ref.get("sphere2500", {}).get("sec_per_lm_iter")
        if ref_sec:
            vs_baseline = ref_sec / sec_per_iter  # >1 == faster than reference
        # time-to-chi2-convergence: first iteration at or below the
        # reference's 50-iteration chi2 (+1%), in our wall-clock
        ref_chi2 = ref.get("sphere2500", {}).get("chi2_after_50_iters")
        if ref_chi2 and "reference" in dataset:
            target = ref_chi2 * 1.01
            chis = res["chi2_per_iteration"] + [chi1]
            for i, c in enumerate(chis):
                if c <= target:
                    time_to_ref_chi2 = round(i * sec_per_iter, 3)
                    break

    result = {
        "metric": f"LM iterations/sec, {dataset} (SE3+Huber, PCG)",
        "value": round(iters_per_sec, 4),
        "unit": "iter/s",
        "vs_baseline": round(vs_baseline, 4),
        "extra": {
            "sec_per_iter": round(sec_per_iter, 6),
            "chi2_initial": float(chi0),
            "chi2_final": float(chi1),
            "time_to_reference_chi2_s": time_to_ref_chi2,
            "build_s": round(build_s, 3),
            "device": str(jax.devices()[0]),
            "dtype": str(jnp.asarray(p.estimates[next(iter(p.estimates))]).dtype),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
