"""Fully-fused Levenberg-Marquardt iteration — one device program per outer
iteration.

The host-loop LM (``g2o_tpu.core.optimizer.LevenbergMarquardt``) dispatches
solve/apply/chi2 separately per trust-region trial, paying a host round-trip
each time (the reference pays the same structural cost in its inner loop,
``optimization_algorithm_levenberg.cpp:96-145``).  Here the entire iteration
— linearize, then the λ-retry loop (solve → oplus → chi2 → gain ratio → λ/ν
update) — runs inside one jitted program with ``lax.while_loop``; only the
per-iteration verbose scalars return to the host.  The reference's
``push()/pop()`` estimate backups (``sparse_optimizer.cpp:441``,
``base_vertex.h:93-96``) reduce to keeping the old pytree in the loop carry.

Semantics match the reference LM exactly: gain ratio
``rho = (chi0 - chi)/ (dx^T(λ dx + b) + 1e-3)`` (``:124-127``), accept =>
``λ *= max(1/3, 1-(2ρ-1)^3); ν = 2``, reject => ``λ *= ν; ν *= 2``
(``:128-142``), ``maxTrialsAfterFailure`` cap (``:49``), λ-init
``τ · max|H_jj|`` (``:152``).
"""

from __future__ import annotations

import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

# per-solver-object cache token: ``id(solver)`` is NOT a safe cache key —
# CPython reuses the id of a collected solver for the next allocation, so a
# problem's runner cache could silently replay a DIFFERENT solver's compiled
# program (observed: sequentially-created PCGSolvers sharing one problem)
_SOLVER_TOKENS = itertools.count()


def _solver_token(solver):
    tok = solver.__dict__.get("_runner_token")
    if tok is None:
        tok = next(_SOLVER_TOKENS)
        solver.__dict__["_runner_token"] = tok
    return tok


def _cap_cache(cache, limit: int = 8):
    """Evict oldest entries so per-problem runner caches stay bounded —
    each cached runner closes over a solver's whole setup environment
    (preconditioner builders, chunk maps), so a config sweep would
    otherwise grow memory linearly with solvers created."""
    while len(cache) >= limit:
        cache.pop(next(iter(cache)))

from g2o_tpu.core.optimizer import (
    BatchStatistics,
    OptimizationAlgorithm,
    _max_abs_diag,
)


def make_lm_iteration(problem, solve_fn, max_trials: int, *,
                      solve_state_fn=None):
    """Build the single fused LM iteration function (unjitted).  Solver-owned
    index arrays travel via ``aux`` (a pytree argument, not baked constants).

    When the solver exposes the STATEFUL protocol
    (``solve_state_fn(data, lin, lam, aux, state) -> (dx, state', stats)``),
    the solver state — e.g. the reference PCG's carried residual floor
    (``solvers/pcg/linear_solver_pcg.hpp:124-127``) — is threaded through
    every trial and returned for the next iteration.

    The candidate chi2 is evaluated by LINEARIZING the candidate (the
    residuals come with the jacfwd pass anyway), and the accepted
    candidate's linearization is RETURNED so the next iteration starts
    from it — eliminating the duplicate residual pass per accepted trial
    (the reference pays it too: computeActiveErrors after update,
    ``optimization_algorithm_levenberg.cpp:114``, then linearizeOplus
    again in the next buildSystem).  A rejected trial wastes its
    Jacobians, but LM trial acceptance is the common case."""
    p = problem
    dtype = p.dtype

    def one_iteration(data, estimates, lam, ni, aux, sstate, lin):
        chi0 = lin.chi2_robust

        def cond(carry):
            good, trials = carry[0], carry[1]
            return jnp.logical_and(jnp.logical_not(good), trials < max_trials)

        def body(carry):
            good, trials, lam, ni, est_out, lin_out, chi_out, sstate, cg = \
                carry
            if solve_state_fn is not None:
                dx, sstate, st = solve_state_fn(data, lin, lam, aux, sstate)
                cg = cg + jnp.asarray(st.get("cg_iterations", 0), jnp.int32)
            else:
                dx = solve_fn(data, lin, lam, aux)
            cand = p.apply_update_fn(data, estimates, dx)
            lin_cand = p.linearize_fn(data, cand)
            chi_new = lin_cand.chi2_robust
            # multiply+sum: exact f32 for the gain-ratio denominator
            scale = jnp.sum(dx * (lam * dx + lin.b)) \
                + jnp.asarray(1e-3, dtype)
            rho = (chi0 - chi_new) / scale
            ok = jnp.logical_and(
                jnp.isfinite(chi_new),
                jnp.logical_and(rho > 0, chi_new < chi0))
            factor = jnp.maximum(
                jnp.asarray(1.0 / 3.0, dtype),
                1.0 - (2.0 * rho - 1.0) ** 3).astype(dtype)
            lam_next = jnp.where(ok, lam * factor, lam * ni)
            ni_next = jnp.where(ok, jnp.asarray(2.0, dtype), ni * 2.0)
            est_sel = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), cand, est_out)
            chi_sel = jnp.where(ok, chi_new, chi_out)
            # no where-select on lin_cand: the loop EXITS on accept, so the
            # carried value is the accepted candidate's linearization; on a
            # fully-failed iteration ``good`` is False and the caller must
            # not reuse it (the run loop stops)
            return (ok, trials + 1, lam_next, ni_next, est_sel, lin_cand,
                    chi_sel, sstate, cg)

        init = (jnp.asarray(False), jnp.asarray(0, jnp.int32),
                lam, ni, estimates, lin, chi0, sstate,
                jnp.asarray(0, jnp.int32))
        (good, trials, lam_f, ni_f, est_f, lin_f, chi_f, sstate,
         cg_total) = jax.lax.while_loop(cond, body, init)
        return (est_f, chi0, chi_f, lam_f, ni_f, good, trials, sstate,
                cg_total, lin_f)

    return one_iteration


def make_lm_run(problem, solver, *, max_trials: int = 10,
                max_iters: int = 512, gain_threshold: float = 0.0):
    """Whole-optimization device loop: N fused LM iterations inside ONE
    jitted program (no host round-trips between iterations — essential when
    device dispatch has high latency).  Returns a jitted
    ``run(data, estimates, lam, ni, n_iters)`` producing
    ``(estimates, lam, ni, iters_done, chi_hist, trial_hist, chi_final)``
    with histories padded to the static ``max_iters``."""
    one_iteration = make_lm_iteration(
        problem, solver._solve_fn, max_trials,
        solve_state_fn=getattr(solver, "_solve_state_fn", None))
    dtype = problem.dtype
    gt = float(gain_threshold)

    sdtype = getattr(problem, "state_dtype", dtype)

    def run(data, estimates, lam, ni, n_iters, aux, sstate):
        chi_hist = jnp.full((max_iters,), jnp.nan, dtype=sdtype)
        trial_hist = jnp.zeros((max_iters,), dtype=jnp.int32)
        cg_hist = jnp.zeros((max_iters,), dtype=jnp.int32)
        lin0 = problem.linearize_fn(data, estimates)
        # λ < 0 sentinel carries -τ: init λ = τ·max|H_jj| from lin0 INSIDE
        # the program (``optimization_algorithm_levenberg.cpp:152-176``) —
        # the host-side default previously ran a SEPARATE full linearize
        # per optimize_fused call just to read the diagonal
        m = jnp.asarray(-jnp.inf, dtype)
        for t in problem.vertex_types:
            de = jnp.abs(jnp.diagonal(lin0.diag[t], axis1=-2, axis2=-1))
            mask = 1.0 - data.fixed[t].astype(dtype)
            m = jnp.maximum(m, jnp.max(de * mask[:, None]))
        lam = jnp.where(lam < 0, -lam * m, lam)

        def cond(carry):
            it, stop = carry[0], carry[1]
            return jnp.logical_and(it < jnp.minimum(n_iters, max_iters),
                                   jnp.logical_not(stop))

        def body(carry):
            (it, stop, est, lam, ni, chi_prev, chi_hist, trial_hist,
             cg_hist, sstate, lin) = carry
            (est2, chi0, chi_f, lam2, ni2, good, trials, sstate,
             cg_total, lin2) = one_iteration(data, est, lam, ni, aux,
                                             sstate, lin)
            chi_hist = chi_hist.at[it].set(chi0)
            trial_hist = trial_hist.at[it].set(trials)
            cg_hist = cg_hist.at[it].set(cg_total)
            # stop on failed iteration or sub-threshold relative gain
            gain = (chi_prev - chi_f) / jnp.maximum(chi_prev, 1e-30)
            stop2 = jnp.logical_or(
                jnp.logical_not(good),
                jnp.logical_and(it > 0, gain < gt) if gt > 0
                else jnp.asarray(False))
            return (it + 1, stop2, est2, lam2, ni2, chi_f,
                    chi_hist, trial_hist, cg_hist, sstate, lin2)

        init = (jnp.asarray(0, jnp.int32), jnp.asarray(False), estimates,
                lam, ni, jnp.asarray(jnp.inf, sdtype), chi_hist, trial_hist,
                cg_hist, sstate, lin0)
        (it, stop, est, lam_f, ni_f, chi_f, chi_hist, trial_hist, cg_hist,
         sstate, _) = jax.lax.while_loop(cond, body, init)
        return est, lam_f, ni_f, it, chi_hist, trial_hist, cg_hist, chi_f

    return jax.jit(run, donate_argnums=(1,))


def optimize_fused(problem, solver, max_iterations: int, *,
                   initial_lambda: float = 0.0, tau: float = 1e-5,
                   max_trials: int = 10, gain_threshold: float = 0.0,
                   history_cap: int = 512):
    """Run a whole LM optimization in one device program.  Mutates
    ``problem.estimates``; returns a dict with iteration histories.

    The jitted runner is cached on the problem (keyed by solver identity and
    static knobs) so repeated calls — e.g. warm-up then timed benchmark —
    reuse one compiled executable.  ``max_iterations`` is clamped to
    ``history_cap`` (the static history length)."""
    solver.setup(problem)
    # λ<0 sentinel = -τ: the runner derives λ0 = τ·max|H_jj| from its own
    # lin0 (no separate host-side linearize per call)
    lam0 = initial_lambda if initial_lambda > 0 else -tau
    max_iterations = min(int(max_iterations), history_cap)
    cache = problem.__dict__.setdefault("_lm_runner_cache", {})
    key = (_solver_token(solver), max_trials, float(gain_threshold),
           history_cap)
    run = cache.get(key)
    if run is None:
        run = make_lm_run(problem, solver, max_trials=max_trials,
                          max_iters=history_cap,
                          gain_threshold=gain_threshold)
        _cap_cache(cache)
        cache[key] = run
    sstate = getattr(solver, "state0", None)
    if sstate is None or not hasattr(solver, "_solve_state_fn"):
        sstate = jnp.zeros((), problem.dtype)   # placeholder (unused)
    t0 = time.perf_counter()
    est, lam, ni, iters, chi_hist, trial_hist, cg_hist, chi_f = run(
        problem.data, problem.estimates,
        jnp.asarray(lam0, problem.dtype),
        jnp.asarray(2.0, problem.dtype),
        jnp.asarray(max_iterations, jnp.int32),
        solver.aux,
        sstate,
    )
    jax.block_until_ready(est)
    wall = time.perf_counter() - t0
    problem.set_estimates(est)
    n = int(iters)
    return {
        "iterations": n,
        "wall_s": wall,
        "chi2_per_iteration": np.asarray(chi_hist)[:n].tolist(),
        "trials_per_iteration": np.asarray(trial_hist)[:n].tolist(),
        "cg_per_iteration": np.asarray(cg_hist)[:n].tolist(),
        "chi2_final": float(chi_f),
        "lambda_final": float(lam),
    }


def make_gn_run(problem, solver, *, max_iters: int = 512):
    """Whole-run Gauss-Newton device loop (reference
    ``optimization_algorithm_gauss_newton.cpp:50``): linearize → solve(0) →
    oplus, no trust region.  Stops early on non-finite chi2.  Solvers with
    the stateful protocol (reference-PCG residual carry) thread their state
    across iterations exactly as in :func:`make_lm_run`."""
    solve_fn = solver._solve_fn
    solve_state_fn = getattr(solver, "_solve_state_fn", None)
    p = problem
    dtype = p.dtype

    sdtype = getattr(p, "state_dtype", dtype)

    def run(data, estimates, n_iters, aux, sstate):
        chi_hist = jnp.full((max_iters,), jnp.nan, dtype=sdtype)
        cg_hist = jnp.zeros((max_iters,), dtype=jnp.int32)
        lin0 = p.linearize_fn(data, estimates)

        def cond(carry):
            it, stop = carry[0], carry[1]
            return jnp.logical_and(it < jnp.minimum(n_iters, max_iters),
                                   jnp.logical_not(stop))

        def body(carry):
            it, stop, est, chi_hist, cg_hist, sstate, lin = carry
            if solve_state_fn is not None:
                dx, sstate, st = solve_state_fn(
                    data, lin, jnp.asarray(0.0, dtype), aux, sstate)
                cg_hist = cg_hist.at[it].add(
                    jnp.asarray(st.get("cg_iterations", 0), jnp.int32))
            else:
                dx = solve_fn(data, lin, jnp.asarray(0.0, dtype), aux)
            new = p.apply_update_fn(data, est, dx)
            # chi2 of the step comes with the NEXT linearization (carried)
            lin_new = p.linearize_fn(data, new)
            chi_new = lin_new.chi2_robust
            ok = jnp.isfinite(chi_new)
            est2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, est)
            lin2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), lin_new, lin)
            chi_hist = chi_hist.at[it].set(lin.chi2_robust)
            return (it + 1, jnp.logical_not(ok), est2, chi_hist, cg_hist,
                    sstate, lin2)

        init = (jnp.asarray(0, jnp.int32), jnp.asarray(False), estimates,
                chi_hist, cg_hist, sstate, lin0)
        it, stop, est, chi_hist, cg_hist, sstate, lin_f = jax.lax.while_loop(
            cond, body, init)
        return est, it, chi_hist, cg_hist, lin_f.chi2_robust

    return jax.jit(run, donate_argnums=(1,))


def optimize_fused_gn(problem, solver, max_iterations: int, *,
                      history_cap: int = 512):
    """Whole-run GN in one device program (see :func:`optimize_fused`)."""
    solver.setup(problem)
    max_iterations = min(int(max_iterations), history_cap)
    cache = problem.__dict__.setdefault("_gn_runner_cache", {})
    key = (_solver_token(solver), history_cap)
    run = cache.get(key)
    if run is None:
        run = make_gn_run(problem, solver, max_iters=history_cap)
        _cap_cache(cache)
        cache[key] = run
    sstate = getattr(solver, "state0", None)
    if sstate is None or not hasattr(solver, "_solve_state_fn"):
        sstate = jnp.zeros((), problem.dtype)   # placeholder (unused)
    t0 = time.perf_counter()
    est, iters, chi_hist, cg_hist, chi_f = run(
        problem.data, problem.estimates,
        jnp.asarray(max_iterations, jnp.int32), solver.aux, sstate)
    jax.block_until_ready(est)
    wall = time.perf_counter() - t0
    problem.set_estimates(est)
    n = int(iters)
    return {
        "iterations": n,
        "wall_s": wall,
        "chi2_per_iteration": np.asarray(chi_hist)[:n].tolist(),
        "cg_per_iteration": np.asarray(cg_hist)[:n].tolist(),
        "chi2_final": float(chi_f),
    }


class FusedLevenbergMarquardt(OptimizationAlgorithm):
    """LM with the trust-region retry loop fused on device."""

    def __init__(self, initial_lambda: float = 0.0,
                 max_trials_after_failure: int = 10, tau: float = 1e-5):
        self.initial_lambda = float(initial_lambda)
        self.max_trials = int(max_trials_after_failure)
        self.tau = tau
        self._lambda = None
        self._ni = None
        self._iter_jit = None
        self._levenberg_iters = 0

    def init(self, optimizer):
        self._lambda = None
        self._ni = 2.0
        # cache the jitted iteration per (problem, solver, trials): init()
        # runs at the top of EVERY optimize() call, and a fresh jax.jit
        # wrapper re-traces each time (~1 s per block for block-wise
        # drivers like incremental mode)
        key = (_solver_token(optimizer.solver), self.max_trials)
        cache = optimizer.problem.__dict__.setdefault(
            "_lm_step_cache", {})
        iter_jit = cache.get(key)
        if iter_jit is None:
            one_iteration = make_lm_iteration(
                optimizer.problem, optimizer.solver._solve_fn,
                self.max_trials,
                solve_state_fn=getattr(optimizer.solver, "_solve_state_fn",
                                       None))
            iter_jit = jax.jit(one_iteration)
            _cap_cache(cache)
            cache[key] = iter_jit
        self._iter_jit = iter_jit
        self._solver = optimizer.solver
        self._lin = None       # carried linearization (device pytree)
        self._sstate = getattr(optimizer.solver, "state0", None)
        if self._sstate is None or not hasattr(optimizer.solver,
                                               "_solve_state_fn"):
            self._sstate = jnp.zeros((), optimizer.problem.dtype)

    def step(self, optimizer, iteration, stats):
        p = optimizer.problem
        if self._lin is None:
            self._lin = p.linearize_jit(p.data, p.estimates)
        if self._lambda is None:
            if self.initial_lambda > 0:
                self._lambda = float(self.initial_lambda)
            else:
                self._lambda = float(
                    self.tau * _max_abs_diag(p, self._lin))

        (est, chi0, chi_f, lam, ni, good, trials, self._sstate,
         cg_total, self._lin) = self._iter_jit(
                p.data, p.estimates,
                jnp.asarray(self._lambda, p.dtype),
                jnp.asarray(self._ni, p.dtype),
                self._solver.aux,
                self._sstate,
                self._lin,
            )
        jax.block_until_ready(est)
        # the fused step is ONE device program — per-phase walls don't
        # exist; the driver's stats.time_iteration carries the whole wall
        # (booking it into time_linearize skewed MFU/hotspot attribution)
        stats.chi2 = float(chi0)
        self._lambda = float(lam)
        self._ni = float(ni)
        stats.lambda_value = self._lambda
        stats.levenberg_iterations = int(trials)
        stats.iterations_linear_solver = int(cg_total)
        self._levenberg_iters = int(trials)
        if not bool(good):
            # the carried lin is the REJECTED candidate's — drop it so a
            # retried step relinearizes the (unchanged) estimates
            self._lin = None
            return False
        p.set_estimates(est)
        optimizer.current_chi2 = float(chi_f)
        return True

    def print_verbose_suffix(self):
        return (f"\t lambda= {self._lambda:.6g}"
                f"\t levenbergIter= {self._levenberg_iters}")
