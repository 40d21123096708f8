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
FULL system rather than the reduced one)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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
        # reuse the explicit solver's classification/layout machinery by
        # building it without the pair lists
        from g2o_tpu.core.solvers.schur import SchurSolver

        helper = SchurSolver()
        # --- reproduce the layout portion of SchurSolver.setup ---
        marg = {t: bool(m.all()) for t, m in problem.marginalized.items()}
        for t, m in problem.marginalized.items():
            if m.any() and not m.all():
                raise NotImplementedError(
                    f"ImplicitSchurSolver: type {t} partially marginalized")
        lm_types = [t for t, v in marg.items() if v]
        pose_types = [t for t, v in marg.items() if not v]
        if not lm_types:
            raise ValueError("ImplicitSchurSolver: no marginalized vertices")
        lm_dims = {problem.vertex_types[t].tangent_dim for t in lm_types}
        if len(lm_dims) != 1:
            raise NotImplementedError("mixed landmark tangent dims")
        (dl,) = lm_dims

        pose_base, base = {}, 0
        for t in pose_types:
            pose_base[t] = base
            base += problem.counts[t] * problem.vertex_types[t].tangent_dim
        Tp = base
        lm_base, nl = {}, 0
        for t in lm_types:
            lm_base[t] = nl
            nl += problem.counts[t]
        NL = nl

        pose_off = {
            t: np.asarray(pose_base[t]
                          + np.arange(problem.counts[t], dtype=np.int32)
                          * problem.vertex_types[t].tangent_dim)
            for t in pose_types
        }
        pose_fixed_flat = np.zeros(Tp)
        for t in pose_types:
            d = problem.vertex_types[t].tangent_dim
            fx = np.asarray(problem.data.fixed[t])
            for i in np.nonzero(fx)[0]:
                o = pose_base[t] + i * d
                pose_fixed_flat[o:o + d] = 1.0

        obs_specs, pose_edge_types, obs_pose_dims = [], [], set()
        for name, et in problem.edge_types.items():
            slots_marg = [marg[vt.name] for vt in et.vertex_types]
            if not any(slots_marg):
                pose_edge_types.append(name)
                continue
            if len(slots_marg) != 2 or all(slots_marg):
                raise NotImplementedError(
                    f"unsupported landmark edge pattern in {name}")
            lm_slot = slots_marg.index(True)
            obs_specs.append((name, 1 - lm_slot, lm_slot))
            obs_pose_dims.add(et.vertex_types[1 - lm_slot].tangent_dim)
        if len(obs_pose_dims) > 1:
            raise NotImplementedError("mixed pose dims in observations")
        dp = obs_pose_dims.pop() if obs_pose_dims else 0

        obs_cam_np, obs_lm_np = [], []
        for name, pose_slot, lm_slot in obs_specs:
            et = problem.edge_types[name]
            vidx = np.asarray(problem.data.edges[name].vidx)
            pt = et.vertex_types[pose_slot].name
            lt = et.vertex_types[lm_slot].name
            obs_cam_np.append(pose_off[pt][vidx[:, pose_slot]])
            obs_lm_np.append(lm_base[lt] + vidx[:, lm_slot])
        obs_cam = np.concatenate(obs_cam_np).astype(np.int32)
        obs_lm = np.concatenate(obs_lm_np).astype(np.int32)

        lm_goff_np = np.zeros(NL, dtype=np.int32)
        lm_fixed_np = np.zeros(NL, dtype=bool)
        for t in lm_types:
            lm_goff_np[lm_base[t]:lm_base[t] + problem.counts[t]] = \
                np.asarray(problem.data.offsets[t])
            lm_fixed_np[lm_base[t]:lm_base[t] + problem.counts[t]] = \
                np.asarray(problem.data.fixed[t])

        pose_to_global = np.zeros(Tp, dtype=np.int32)
        for t in pose_types:
            d = problem.vertex_types[t].tangent_dim
            offs = np.asarray(problem.data.offsets[t])
            for i in range(problem.counts[t]):
                po = pose_base[t] + i * d
                pose_to_global[po:po + d] = np.arange(offs[i], offs[i] + d)

        self.aux = dict(
            obs_cam=jnp.asarray(obs_cam), obs_lm=jnp.asarray(obs_lm),
            lm_goff=jnp.asarray(lm_goff_np),
            lm_fixed=jnp.asarray(lm_fixed_np),
            pose_to_global=jnp.asarray(pose_to_global),
            pose_fixed_flat=jnp.asarray(pose_fixed_flat,
                                        dtype=problem.dtype),
            pose_off={t: jnp.asarray(o) for t, o in pose_off.items()},
        )

        dtype = problem.dtype
        eye_l = jnp.eye(dl, dtype=dtype)
        max_iter, tol = self.max_iter, self.tol
        p = problem

        def build_B(lin):
            Bs = []
            for name, pose_slot, lm_slot in obs_specs:
                Js, W = lin.jacs[name], lin.weights[name]
                Bs.append(jnp.einsum("erd,ers,esf->edf",
                                     Js[pose_slot], W, Js[lm_slot]))
            return jnp.concatenate(Bs, axis=0) if Bs else \
                jnp.zeros((0, dp, dl), dtype=dtype)

        def pose_diag(lin, lam, aux):
            """Dense-free Hpp·v pieces: diag blocks per pose type."""
            out = {}
            for t in pose_types:
                d = p.vertex_types[t].tangent_dim
                eye = jnp.eye(d, dtype=dtype)
                blocks = lin.diag[t] + lam * eye
                fx = p.data.fixed[t].astype(dtype)[:, None, None]
                out[t] = blocks * (1.0 - fx) + eye * fx
            return out

        def hpp_vec(lin, lam, aux, diag_blocks, v):
            """Hpp v on the pose-only flat vector (diag + pose-pose edges)."""
            out = jnp.zeros_like(v)
            for t in pose_types:
                d = p.vertex_types[t].tangent_dim
                idx = aux["pose_off"][t][:, None] + jnp.arange(d)[None, :]
                out = out.at[idx].set(
                    jnp.einsum("nij,nj->ni", diag_blocks[t], v[idx]))
            for name in pose_edge_types:
                et = p.edge_types[name]
                batch = p.data.edges[name]
                Js, W = lin.jacs[name], lin.weights[name]
                idxs = [aux["pose_off"][vt.name][batch.vidx[:, s]][:, None]
                        + jnp.arange(vt.tangent_dim)[None, :]
                        for s, vt in enumerate(et.vertex_types)]
                k = len(Js)
                # off-diagonal coupling only (diag already counted)
                for i in range(k):
                    for j in range(k):
                        if i == j:
                            continue
                        Hij_v = jnp.einsum(
                            "erd,ers,esf,ef->ed", Js[i], W, Js[j], v[idxs[j]])
                        out = out.at[idxs[i]].add(Hij_v)
            return out

        def solve(data, lin, lam, aux):
            B = build_B(lin)                                   # (Eo, dp, dl)
            Dl = jnp.concatenate([lin.diag[t] for t in lm_types], axis=0) \
                + lam * eye_l
            fx = aux["lm_fixed"].astype(dtype)[:, None, None]
            Dinv = inv_small(Dl * (1.0 - fx) + eye_l * fx)

            bp = lin.b[aux["pose_to_global"]]
            lm_idx2 = aux["lm_goff"][:, None] + jnp.arange(dl)[None, :]
            bl = lin.b[lm_idx2]
            y = jnp.einsum("nij,nj->ni", Dinv, bl)
            cam_idx2 = aux["obs_cam"][:, None] + jnp.arange(dp)[None, :]
            bschur = bp.at[cam_idx2].add(
                -jnp.einsum("edl,el->ed", B, y[aux["obs_lm"]]))

            diag_blocks = pose_diag(lin, lam, aux)
            minv = {t: inv_small(diag_blocks[t]) for t in pose_types}

            def S_vec(v):
                u = v[cam_idx2]                                # (Eo, dp)
                t_ = jnp.zeros((NL, dl), dtype=dtype).at[aux["obs_lm"]].add(
                    jnp.einsum("edl,ed->el", B, u))
                s_ = jnp.einsum("nij,nj->ni", Dinv, t_)
                out = hpp_vec(lin, lam, aux, diag_blocks, v)
                out = out.at[cam_idx2].add(
                    -jnp.einsum("edl,el->ed", B, s_[aux["obs_lm"]]))
                return out

            def precond(r):
                out = jnp.zeros_like(r)
                for t in pose_types:
                    d = p.vertex_types[t].tangent_dim
                    idx = (aux["pose_off"][t][:, None]
                           + jnp.arange(d)[None, :])
                    out = out.at[idx].set(
                        jnp.einsum("nij,nj->ni", minv[t], r[idx]))
                return out

            x0 = jnp.zeros_like(bschur)
            r0 = bschur
            z0 = precond(r0)
            rz0 = jnp.dot(r0, z0)
            thresh = tol * tol * jnp.dot(bschur, bschur)

            def cond(c):
                return jnp.logical_and(c[5] < max_iter,
                                       jnp.dot(c[1], c[1]) > thresh)

            def body(c):
                x, r, z, pv, rz, it = c
                Ap = S_vec(pv)
                alpha = rz / jnp.dot(pv, Ap)
                x = x + alpha * pv
                r = r - alpha * Ap
                z = precond(r)
                rz2 = jnp.dot(r, z)
                return (x, r, z, z + (rz2 / rz) * pv, rz2, it + 1)

            dxp, *_ = jax.lax.while_loop(cond, body,
                                         (x0, r0, z0, z0, rz0, 0))

            # back-substitute landmarks
            w = jnp.einsum("edl,ed->el", B, dxp[cam_idx2])
            wl = jnp.zeros_like(bl).at[aux["obs_lm"]].add(w)
            dxl = jnp.einsum("nij,nj->ni", Dinv, bl - wl)

            dx = jnp.zeros_like(lin.b)
            dx = dx.at[aux["pose_to_global"]].set(dxp)
            dx = dx.at[lm_idx2].set(dxl)
            return dx

        self._solve_fn = solve
        self._solve_jit = jax.jit(solve)
        return self

    def solve(self, data, lin, lam=0.0):
        return self._solve_jit(data, lin, lam, self.aux)
