"""Capture a TPU profiler trace of the fused Venice LM run and print the
top HLO ops by self time (tensorboard_plugin_profile offline conversion).

Usage: python scripts/trace_venice.py [N_CAMS] [N_PTS] [N_ITERS]
"""

import glob
import gzip
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/venice_trace"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
    from g2o_tpu.io.bal import load_bal_problem, make_synthetic_bal

    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    text = make_synthetic_bal(n_cameras=n_cams, n_points=n_pts,
                              n_obs_per_point=6, pixel_noise=1.0, seed=0)
    p = load_bal_problem(io.StringIO(text), huber=0.0, bucket_landmarks=True)
    solver = ImplicitSchurSolver(max_iter=100, tol=1e-2, precond="jacobi")
    optimize_fused(p, solver, 2)     # warm-up/compile

    with jax.profiler.trace(TRACE_DIR):
        optimize_fused(p, solver, n_iters)

    xplanes = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    print("xplane:", xplanes[-1], flush=True)

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplanes[-1]], tool, {})
        except Exception as e:
            print(f"{tool}: FAILED {e}", flush=True)
            continue
        out = f"/tmp/venice_{tool}.out"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as fh:
            fh.write(data)
        print(f"{tool}: wrote {out} ({len(data)} bytes)", flush=True)


if __name__ == "__main__":
    main()
