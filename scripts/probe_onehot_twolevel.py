"""(a) ladybug tol sweep for the last 0.01 chi2; (b) VERDICT r3 item 9:
two-level one-hot probe — (E,S) one-hot MXU product vs E->sqrt(S)->S."""
import sys, os, io, json, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import numpy as np, jax.numpy as jnp
import g2o_tpu.types  # noqa
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
from g2o_tpu.io.bal import load_bal_problem, synthetic_bal_cached
print("devices:", jax.devices(), flush=True)

text = synthetic_bal_cached(n_cameras=49, n_points=7000, n_obs_per_point=5, pixel_noise=1.0, seed=0)
for label, kw in [("tol1e-2h", dict(tol=1e-2)), ("tol3e-3h", dict(tol=3e-3))]:
    p = load_bal_problem(io.StringIO(text), huber=0.0, bucket_landmarks=True,
                         fix_first_camera=False, dtype=jnp.float32)
    s = ImplicitSchurSolver(max_iter=100, precond="jacobi", matvec_precision="highest", **kw)
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    optimize_fused(p, s, 2)
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype) for t, v in est0.items()})
    s._host_state = None
    t0 = time.perf_counter(); r = optimize_fused(p, s, 10); w = time.perf_counter()-t0
    print("lady", label, json.dumps({"chi2_10": r["chi2_final"],
        "sec_per_iter": round(w/10, 5), "cg": int(sum(r["cg_per_iteration"]))}), flush=True)

# (b) two-level one-hot: y[s] += sum_{e in seg s} x[e] — compare
# direct (E,S) one-hot vs two-level E->(G groups)->S with G ~ sqrt-ish split.
E, S, D = 900_000, 800, 9
rng = np.random.default_rng(0)
seg = np.sort(rng.integers(0, S, E)).astype(np.int32)
x = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
segj = jnp.asarray(seg)
HI = jax.lax.Precision.HIGHEST

def direct(x, segj):
    oh = jax.nn.one_hot(segj, S, dtype=x.dtype)
    return jax.lax.dot_general(oh, x, (((0,), (0,)), ((), ())), precision=HI,
                               preferred_element_type=x.dtype)

G = 128  # groups of segments: two-level split S = G x ceil(S/G)
S2 = -(-S // G)
def twolevel(x, segj):
    # level 1: scatter rows into (G, S2) sub-buckets via one-hot over S2
    sub = segj % S2
    grp = segj // S2
    oh2 = jax.nn.one_hot(sub, S2, dtype=x.dtype)          # (E, S2)
    ohg = jax.nn.one_hot(grp, G, dtype=x.dtype)           # (E, G)
    # y[g, s2, d] = sum_e ohg[e,g] * oh2[e,s2] * x[e,d] — as one dot over
    # the combined (G*S2) one-hot? that's the direct form again; instead:
    # per-group partial sums via (E, G) dot with (S2-expanded) payload
    spread = oh2[:, :, None] * x[:, None, :]              # (E, S2, D)
    y = jax.lax.dot_general(ohg, spread.reshape(E, S2 * D),
                            (((0,), (0,)), ((), ())), precision=HI,
                            preferred_element_type=x.dtype)
    return y.reshape(G * S2, D)[:S]

d_jit, t_jit = jax.jit(direct), jax.jit(twolevel)
ref = d_jit(x, segj); jax.block_until_ready(ref)
two = t_jit(x, segj); jax.block_until_ready(two)
err = float(jnp.abs(ref - two).max())
def wall(f, reps=20):
    out = f(x, segj); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = f(x, segj)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/reps
print("onehot", json.dumps({"direct_ms": round(wall(d_jit)*1e3, 3),
      "twolevel_ms": round(wall(t_jit)*1e3, 3), "err": err}), flush=True)
print("DONE", flush=True)
