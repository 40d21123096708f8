"""Measure BA build phases on the real TPU (VERDICT r2 item 2)."""
import sys, os, io, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("device:", jax.devices()[0], flush=True)
from g2o_tpu.io.bal import load_bal_problem, synthetic_bal_cached

for label, kw in [("ladybug", dict(n_cameras=49, n_points=7000, n_obs_per_point=5)),
                  ("venice", dict(n_cameras=800, n_points=150_000, n_obs_per_point=6))]:
    t0 = time.perf_counter()
    text = synthetic_bal_cached(pixel_noise=1.0, seed=0, **kw)
    t1 = time.perf_counter()
    p = load_bal_problem(io.StringIO(text), huber=0.0, bucket_landmarks=True)
    jax.block_until_ready(p.data.edges[next(iter(p.data.edges))].meas)
    t2 = time.perf_counter()
    print(f"{label}: text={t1-t0:.2f}s load+build={t2-t1:.2f}s total={t2-t0:.2f}s", flush=True)
print("DONE", flush=True)
