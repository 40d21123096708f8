"""Bisect the Venice linearize + implicit-Schur setup cost into sub-jits.

Usage: python scripts/probe_linearize.py [N_CAMS] [N_PTS] [REPS]
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10, **kw):
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

    from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
    from g2o_tpu.io.bal import load_bal_problem, synthetic_bal_cached
    from g2o_tpu.ops import robust as robust_mod

    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    text = synthetic_bal_cached(n_cameras=n_cams, n_points=n_pts,
                              n_obs_per_point=6, pixel_noise=1.0, seed=0)
    p = load_bal_problem(io.StringIO(text), huber=0.0, bucket_landmarks=True)
    print(f"edges={p.num_edges}", flush=True)
    (name, et), = p.edge_types.items()
    dtype = p.dtype

    def f_res(data, estimates):
        states, e = p._edge_residuals(et, data.edges[name], estimates, name,
                                      data.plans)
        return e

    def f_jacs(data, estimates):
        batch = data.edges[name]
        states, e = p._edge_residuals(et, batch, estimates, name, data.plans)
        Js = jax.vmap(p._edge_jac_fns[name])(states, batch.meas, batch.param)
        return e, Js

    def f_w(data, estimates):
        batch = data.edges[name]
        states, e = p._edge_residuals(et, batch, estimates, name, data.plans)
        Js = jax.vmap(p._edge_jac_fns[name])(states, batch.meas, batch.param)
        Js = tuple(
            J * (1.0 - data.fixed[vt.name][batch.vidx[:, s]]
                 .astype(dtype))[:, None, None]
            for s, (J, vt) in enumerate(zip(Js, et.vertex_types)))
        e2 = jnp.einsum("er,ers,es->e", e, batch.info, e)
        rho = robust_mod.robustify_batch(batch.kernel, e2, batch.delta)
        act = batch.active.astype(dtype)
        W = batch.info * (rho[:, 1] * act)[:, None, None]
        We = jnp.einsum("ers,es->er", W, e)
        return e, Js, W, We

    def f_transposes(data, estimates):
        e, Js, W, We = f_w(data, estimates)
        Jt = tuple(J.transpose(1, 2, 0) for J in Js)
        Wt = W.transpose(1, 2, 0)
        Wet = We.T
        return Jt, Wt, Wet

    t, _ = timeit(jax.jit(f_res), p.data, p.estimates, reps=reps)
    print(f"residuals only:        {t*1e3:8.1f} ms", flush=True)
    t, _ = timeit(jax.jit(f_jacs), p.data, p.estimates, reps=reps)
    print(f"+ jacfwd:              {t*1e3:8.1f} ms", flush=True)
    t, _ = timeit(jax.jit(f_w), p.data, p.estimates, reps=reps)
    print(f"+ robust W/We:         {t*1e3:8.1f} ms", flush=True)
    t, _ = timeit(jax.jit(f_transposes), p.data, p.estimates, reps=reps)
    print(f"+ J/W transposes:      {t*1e3:8.1f} ms", flush=True)
    t, lin = timeit(p.linearize_jit, p.data, p.estimates, reps=reps)
    print(f"full linearize:        {t*1e3:8.1f} ms", flush=True)

    # solver-side B production from lin (what solve_full pays per trial)
    def f_B(lin):
        Js, W = lin.jacs[name], lin.weights[name]
        Jpt = Js[0].transpose(1, 2, 0)
        Jlt = Js[1].transpose(1, 2, 0)
        Wt = W.transpose(1, 2, 0)
        WJl = jnp.einsum("rse,sfe->rfe", Wt, Jlt)
        Bt = jnp.einsum("rde,rfe->dfe", Jpt, WJl)
        return Bt, Bt.transpose(2, 0, 1)

    t, _ = timeit(jax.jit(f_B), lin, reps=reps)
    print(f"solver B production:   {t*1e3:8.1f} ms", flush=True)

    # solve with zero CG budget = setup + precond + backsub only
    s0 = ImplicitSchurSolver(max_iter=0, tol=1e-2, precond="jacobi").setup(p)
    lam = jnp.asarray(1e-3, dtype)
    t, _ = timeit(s0._solve_jit, p.data, lin, lam, s0.aux, reps=reps)
    print(f"solve max_iter=0:      {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
