"""Implicit (matrix-free) Schur-complement solver for large BA.

The explicit :class:`~g2o_tpu.core.solvers.schur.SchurSolver` enumerates all
observation pairs sharing a landmark (Σ deg² entries) to materialise the
reduced camera matrix — prohibitive at Venice scale.  Here the reduced
system

    S x = (Hpp − Hpl Dinv Hpl^T) x = bschur

is solved by preconditioned CG where S·v is applied *implicitly* from the
per-observation blocks:

    u_e = v[cam_e];  t_j = Σ_{e∈obs(j)} B_e^T u_e;  s_j = Dinv_j t_j;
    S v = Hpp v − Σ_e B_e s_{lm_e}

— two segment reductions and three batched einsums per CG iteration, O(Eo)
memory.  Landmarks back-substitute exactly as in the explicit path.  This
is the scalable counterpart of the reference's Schur loop
(``block_solver.hpp:339-393``) for graphs where the pair clique expansion
explodes, and complements the square-root CGLS path (which iterates on the
FULL system rather than the reduced one).

The CG recurrence runs in BLOCK LAYOUT (``{type: (N_t, d_t)}``): all
gathers/scatters are row-level through each edge batch's own ``vidx``
columns (which already travel inside ``data``), so the solver owns no index
arrays at all and supports mixed landmark/pose dimensions."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from g2o_tpu.ops.smallblocks import inv_small


class ImplicitSchurSolver:
    name = "schur_implicit"

    def __init__(self, max_iter: int = 100, tol: float = 1e-8):
        self.max_iter = int(max_iter)
        self.tol = float(tol)
        self.aux = ()
        self._solve_fn = None
        self._solve_jit = None

    def setup(self, problem):
        p = problem
        marg = {t: bool(m.all()) for t, m in p.marginalized.items()}
        for t, m in p.marginalized.items():
            if m.any() and not m.all():
                raise NotImplementedError(
                    f"ImplicitSchurSolver: type {t} partially marginalized")
        lm_types = [t for t, v in marg.items() if v]
        pose_types = [t for t, v in marg.items() if not v]
        if not lm_types:
            raise ValueError("ImplicitSchurSolver: no marginalized vertices")

        # classify edges: observations (one pose slot + one landmark slot)
        # vs pose-only edges
        obs_specs, pose_edge_types = [], []
        for name, et in p.edge_types.items():
            slots_marg = [marg[vt.name] for vt in et.vertex_types]
            if not any(slots_marg):
                pose_edge_types.append(name)
                continue
            if len(slots_marg) != 2 or all(slots_marg):
                raise NotImplementedError(
                    f"unsupported landmark edge pattern in {name}")
            lm_slot = slots_marg.index(True)
            obs_specs.append((name, 1 - lm_slot, lm_slot))

        dtype = p.dtype
        max_iter, tol = self.max_iter, self.tol
        tmap = jax.tree_util.tree_map

        def damped_diag(data, lin, lam, types):
            out = {}
            for t in types:
                d = p.vertex_types[t].tangent_dim
                eye = jnp.eye(d, dtype=dtype)
                blocks = lin.diag[t] + lam * eye
                fx = data.fixed[t].astype(dtype)[:, None, None]
                out[t] = blocks * (1.0 - fx) + eye * fx
            return out

        def pdot(a, b):
            return sum(jnp.vdot(a[t], b[t]) for t in pose_types)

        def solve(data, lin, lam, aux=()):
            # per-landmark-type Dinv (batched closed-form inverses)
            Dinv = {t: inv_small(D)
                    for t, D in damped_diag(data, lin, lam, lm_types).items()}
            # per-observation off-diagonal blocks B = Jp^T W Jl
            B = {}
            for name, ps, ls in obs_specs:
                Js, W = lin.jacs[name], lin.weights[name]
                B[name] = jnp.einsum("erd,ers,esf->edf", Js[ps], W, Js[ls])

            ball = p.split_tangent(lin.b)
            bp = {t: ball[t] for t in pose_types}
            bl = {t: ball[t] for t in lm_types}
            y = {t: jnp.einsum("nij,nj->ni", Dinv[t], bl[t])
                 for t in lm_types}

            # bschur = bp - B * (Dinv bl)
            bschur = dict(bp)
            for name, ps, ls in obs_specs:
                et = p.edge_types[name]
                vidx = data.edges[name].vidx
                pt = et.vertex_types[ps].name
                lt = et.vertex_types[ls].name
                bschur[pt] = bschur[pt].at[vidx[:, ps]].add(
                    -jnp.einsum("edl,el->ed", B[name], y[lt][vidx[:, ls]]))

            diag_blocks = damped_diag(data, lin, lam, pose_types)
            minv = {t: inv_small(diag_blocks[t]) for t in pose_types}

            def S_vec(vb):
                # Hpp v: diagonal blocks (pure einsum) + pose-pose couplings
                out = {t: jnp.einsum("nij,nj->ni", diag_blocks[t], vb[t])
                       for t in pose_types}
                for name in pose_edge_types:
                    et = p.edge_types[name]
                    vidx = data.edges[name].vidx
                    Js, W = lin.jacs[name], lin.weights[name]
                    k = len(Js)
                    for i in range(k):
                        ti = et.vertex_types[i].name
                        acc = None
                        for j in range(k):
                            if i == j:
                                continue
                            tj = et.vertex_types[j].name
                            h = jnp.einsum(
                                "erd,ers,esf,ef->ed", Js[i], W, Js[j],
                                vb[tj][vidx[:, j]])
                            acc = h if acc is None else acc + h
                        if acc is not None:
                            out[ti] = out[ti].at[vidx[:, i]].add(acc)
                # Schur term: − B Dinv B^T v via two segment reductions
                tl = {t: jnp.zeros((p.counts[t],
                                    p.vertex_types[t].tangent_dim),
                                   dtype=dtype) for t in lm_types}
                for name, ps, ls in obs_specs:
                    et = p.edge_types[name]
                    vidx = data.edges[name].vidx
                    pt = et.vertex_types[ps].name
                    lt = et.vertex_types[ls].name
                    u = vb[pt][vidx[:, ps]]
                    tl[lt] = tl[lt].at[vidx[:, ls]].add(
                        jnp.einsum("edl,ed->el", B[name], u))
                s_ = {t: jnp.einsum("nij,nj->ni", Dinv[t], tl[t])
                      for t in lm_types}
                for name, ps, ls in obs_specs:
                    et = p.edge_types[name]
                    vidx = data.edges[name].vidx
                    pt = et.vertex_types[ps].name
                    lt = et.vertex_types[ls].name
                    out[pt] = out[pt].at[vidx[:, ps]].add(
                        -jnp.einsum("edl,el->ed", B[name],
                                    s_[lt][vidx[:, ls]]))
                return out

            def precond(rb):
                return {t: jnp.einsum("nij,nj->ni", minv[t], rb[t])
                        for t in pose_types}

            x0 = tmap(jnp.zeros_like, bschur)
            r0 = bschur
            z0 = precond(r0)
            rz0 = pdot(r0, z0)
            thresh = tol * tol * pdot(bschur, bschur)

            def cond(c):
                return jnp.logical_and(c[5] < max_iter,
                                       pdot(c[1], c[1]) > thresh)

            def body(c):
                x, r, z, pv, rz, it = c
                Ap = S_vec(pv)
                alpha = rz / pdot(pv, Ap)
                x = tmap(lambda a, b_: a + alpha * b_, x, pv)
                r = tmap(lambda a, b_: a - alpha * b_, r, Ap)
                z = precond(r)
                rz2 = pdot(r, z)
                pv = tmap(lambda a, b_: a + (rz2 / rz) * b_, z, pv)
                return (x, r, z, pv, rz2, it + 1)

            dxp, *_ = jax.lax.while_loop(cond, body,
                                         (x0, r0, z0, z0, rz0, 0))

            # back-substitute landmarks: dxl = Dinv (bl - B^T dxp)
            wl = {t: jnp.zeros_like(bl[t]) for t in lm_types}
            for name, ps, ls in obs_specs:
                et = p.edge_types[name]
                vidx = data.edges[name].vidx
                pt = et.vertex_types[ps].name
                lt = et.vertex_types[ls].name
                wl[lt] = wl[lt].at[vidx[:, ls]].add(
                    jnp.einsum("edl,ed->el", B[name], dxp[pt][vidx[:, ps]]))
            dxl = {t: jnp.einsum("nij,nj->ni", Dinv[t], bl[t] - wl[t])
                   for t in lm_types}

            return p.join_tangent({**dxp, **dxl})

        self._solve_fn = solve
        self._solve_jit = jax.jit(solve)
        return self

    def solve(self, data, lin, lam=0.0):
        return self._solve_jit(data, lin, lam, self.aux)
