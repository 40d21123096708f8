"""Supernodal block-sparse Cholesky — the TPU formulation of the
reference's CHOLMOD supernodal mode (``g2o/solvers/cholmod``,
``linear_solver_cholmod.h:76``; SURVEY.md §7.3 "supernodal blocking is the
Pallas-friendly formulation").

The plain level-scheduled solver (``sparse_chol.py``) factors one block
*column* at a time: the elimination tree of a pose graph is ~200+ levels
deep with a median of 2 columns per level — almost fully serial and every
step is a tiny (d, d) op.  Supernodal factorization amalgamates contiguous
columns with (nearly) identical structure into *supernodes* and processes
each as one dense panel:

* **host symbolic phase** (numpy, once per graph pattern):
  - fill-reducing ordering + elimination tree + exact column structure
    (reused from ``sparse_chol.symbolic_factorization``, native C++ path);
  - fundamental supernode detection (maximal chains with
    ``struct(j) == struct(j-1) \\ {j}``);
  - CHOLMOD-style *relaxed amalgamation*: adjacent child/parent supernodes
    merge when the zero-padding this introduces stays below a fill
    tolerance — trading a few explicit zeros for much larger dense blocks
    (the MXU trade);
  - quotient (supernodal) elimination-tree rowset propagation — making the
    amalgamated pattern closed under the update rule;
  - level schedule over the supernode etree, each level bucketed by padded
    panel shape.

* **device numeric phase**: per level/bucket, gather the supernodes'
  (s·d, s·d) diagonal grids and (m·d, s·d) sub-diagonal panels from the
  global block-slot array, run *batched dense* ``cholesky`` /
  ``solve_triangular`` / panel·panelᵀ matmuls (MXU-shaped), and
  scatter-add the outer-product updates into the ancestors' slots.
  Levels drop from ~etree-height to ~supernode-tree-height (4-10x fewer)
  and every op is a large batched matmul instead of a (d, d) one.

The LM damping contract (``g2o/core/solver.h:80-93``) is the same as the
plain solver: the numeric phase re-runs with ``lam`` on the diagonal; the
symbolic phase is reused across iterations (the analogue of the
reference's symbolic-analysis reuse, ``linear_solver_cholmod.h:248+``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from g2o_tpu.core.solvers.sparse_chol import symbolic_factorization


# --------------------------------------------------------------------- #
# host symbolic machinery
# --------------------------------------------------------------------- #

def supernode_partition(sym, *, smax: int = 24, zeta: float = 0.35):
    """Partition the (permuted) columns into supernodes.

    1. fundamental supernodes: maximal chains where column j extends the
       dense diagonal of j-1 (``parent[j-1] == j`` and
       ``struct(j) == struct(j-1) \\ {j}``);
    2. relaxed amalgamation: merge supernode s into the NEXT supernode p
       when p is its quotient-etree parent (``parent[last(s)] == first(p)``),
       the merged width stays <= ``smax`` and the fraction of explicit
       zeros introduced stays <= ``zeta`` (CHOLMOD's relaxation rule).

    Returns ``(starts, rowsets)`` — supernode k spans permuted columns
    ``[starts[k], starts[k+1])`` and has below-panel block rows
    ``rowsets[k]`` (sorted np.int64, all > last member column; closure
    under the quotient etree is applied by the caller)."""
    n = len(sym["rows"])
    if n == 0:
        return np.zeros(1, dtype=np.int64), []
    parent = sym["parent"]
    rows = sym["rows"]

    # --- fundamental partition ---
    starts = [0]
    for j in range(1, n):
        prev = rows[j - 1]
        fund = (parent[j - 1] == j
                and len(rows[j]) == len(prev) - 1
                and (j - starts[-1]) < smax
                and np.array_equal(rows[j], prev[prev != j]))
        if not fund:
            starts.append(j)
    starts.append(n)
    starts = np.asarray(starts, dtype=np.int64)

    # member rowsets (union of original structs minus members)
    def sn_rows(c0, c1):
        u = np.unique(np.concatenate([rows[j] for j in range(c0, c1)])) \
            if c1 > c0 else np.empty(0, dtype=np.int64)
        return u[u >= c1].astype(np.int64)

    sN = len(starts) - 1
    c0s = starts[:-1]
    c1s = starts[1:]
    rsets = [sn_rows(int(a), int(b)) for a, b in zip(c0s, c1s)]

    # --- relaxed amalgamation (greedy, left to right) ---
    # merge supernode k into k+1 when k+1 is the etree parent and the
    # padding cost is acceptable
    out_starts = [0]
    out_rows = []
    k = 0
    cur0, cur1 = int(c0s[0]), int(c1s[0])
    curR = rsets[0]
    while k + 1 < sN:
        n0, n1 = int(c0s[k + 1]), int(c1s[k + 1])
        nR = rsets[k + 1]
        is_parent = (len(curR) > 0 and n0 <= int(curR[0]) < n1)
        if is_parent:
            s_a, s_b = cur1 - cur0, n1 - n0
            m_a, m_b = len(curR), len(nR)
            mergedR = np.union1d(curR[curR >= n1], nR)
            s_m = s_a + s_b
            m_m = len(mergedR)
            nnz_before = (s_a * (s_a + 1) // 2 + s_a * m_a
                          + s_b * (s_b + 1) // 2 + s_b * m_b)
            nnz_after = s_m * (s_m + 1) // 2 + s_m * m_m
            ok_fill = (nnz_after - nnz_before) <= zeta * nnz_after
            if s_m <= smax and ok_fill:
                cur1 = n1
                curR = mergedR
                k += 1
                continue
        out_starts.append(cur1)
        out_rows.append(curR)
        cur0, cur1, curR = n0, n1, nR
        k += 1
    out_starts.append(cur1)
    out_rows.append(curR)
    return np.asarray(out_starts, dtype=np.int64), out_rows


def propagate_rowsets(starts: np.ndarray, rowsets: list):
    """Quotient-etree fill propagation: R(S) flows into the parent
    supernode P = supernode(min R(S)) as ``R(S) \\ cols(P)`` — after this
    the pattern is closed under the supernodal update rule (every pair of
    rows of a panel maps to an existing ancestor slot)."""
    sN = len(rowsets)
    if sN == 0:
        return rowsets, np.full(0, -1, dtype=np.int64)
    n = int(starts[-1])
    sn_of_col = np.empty(n, dtype=np.int64)
    for k in range(sN):
        sn_of_col[starts[k]:starts[k + 1]] = k
    parent_sn = np.full(sN, -1, dtype=np.int64)
    rowsets = [r.copy() for r in rowsets]
    for k in range(sN):
        R = rowsets[k]
        if len(R) == 0:
            continue
        p = int(sn_of_col[int(R[0])])
        parent_sn[k] = p
        passup = R[R >= int(starts[p + 1])]
        if len(passup):
            rowsets[p] = np.union1d(rowsets[p], passup)
    return rowsets, parent_sn


def _pattern_from_supernodes(starts, rowsets):
    """Global block pattern of L: column j in supernode S has struct
    ``{members of S > j} ∪ R(S)``.  Returns (colptr, rows_flat)."""
    n = int(starts[-1])
    cols = []
    for k in range(len(rowsets)):
        c0, c1 = int(starts[k]), int(starts[k + 1])
        R = rowsets[k]
        for j in range(c0, c1):
            internal = np.arange(j + 1, c1, dtype=np.int64)
            cols.append(np.concatenate([internal, R]))
    colptr = np.zeros(n + 1, dtype=np.int64)
    for j in range(n):
        colptr[j + 1] = colptr[j] + len(cols[j])
    rows_flat = (np.concatenate(cols) if n else
                 np.empty(0, dtype=np.int64)).astype(np.int64)
    return colptr, rows_flat


def _bucket(x: int, buckets):
    for b in buckets:
        if x <= b:
            return b
    return buckets[-1]


def build_supernodal_schedule(sym, *, d: int, smax: int = 24,
                              zeta: float = 0.35,
                              bucket_merge: str = "size"):
    """Full symbolic pipeline: partition, closure, pattern, level schedule.

    Returns ``(sched_aux, off_slot_v, meta)`` where ``sched_aux`` is the
    pytree of device index arrays (travels through ``solver.aux``),
    ``off_slot_v`` maps (row, col) block pairs to slots in the global
    array, and ``meta`` carries host-side facts (n, nnz, level count)."""
    n = len(sym["rows"])
    starts, rowsets = supernode_partition(sym, smax=smax, zeta=zeta)
    rowsets, parent_sn = propagate_rowsets(starts, rowsets)
    colptr, rows_flat = _pattern_from_supernodes(starts, rowsets)
    nnz = int(colptr[-1])
    sN = len(rowsets)

    # slot layout identical to sparse_chol: [0, n) diagonal blocks,
    # [n, n+nnz) off-diagonal blocks column-major
    lens = colptr[1:] - colptr[:-1]
    col_of_off = np.repeat(np.arange(n, dtype=np.int64), lens)
    key_all = col_of_off * (n + 1) + rows_flat

    def off_slot_v(i, j):
        return n + np.searchsorted(key_all, np.asarray(j) * (n + 1) + i)

    # supernode depths over the quotient etree
    depth = np.zeros(sN, dtype=np.int64)
    for k in range(sN):
        p = parent_sn[k]
        if p >= 0:
            depth[p] = max(depth[p], depth[k] + 1)
    L = int(depth.max()) + 1 if sN else 0

    s_buckets = sorted({_bucket(int(starts[k + 1] - starts[k]),
                                [1, 2, 4, 8, 16, smax])
                        for k in range(sN)})
    levels: list[dict] = []
    for li in range(L):
        sns = np.nonzero(depth == li)[0]
        buckets: dict = {}
        if bucket_merge == "level":
            # ONE padded bucket per level (invalid slots are -1, already
            # masked by the gather/scatter/unit-diag machinery).  Measured
            # at sphere2500: NO win over size buckets (108 vs 103 ms
            # same-day) — the factor phase is dominated by the row-serial
            # grid scatter-adds (sum of S*mp^2 block rows), not per-call
            # overhead, and merging inflates the padded upd grids.  Kept
            # as an option for narrower-spread schedules.
            sp_max = max(int(starts[k + 1] - starts[k]) for k in sns)
            mp_max = max((len(rowsets[k]) for k in sns), default=0)
            buckets[(sp_max, mp_max)] = list(sns)
        else:
            for k in sns:
                c0, c1 = int(starts[k]), int(starts[k + 1])
                s = c1 - c0
                m = len(rowsets[k])
                key = (_bucket(s, s_buckets),
                       _bucket(m, [0, 4, 8, 16, 32, 64, 128, 256, 512,
                                   1024, 4096, 1 << 20]))
                buckets.setdefault(key, []).append(k)

        blevel = []
        for (sp, mp), ks in sorted(buckets.items()):
            S = len(ks)
            cols_g = np.full((S, sp), -1, dtype=np.int64)
            diag_g = np.full((S, sp, sp), -1, dtype=np.int64)
            panel_g = np.full((S, mp, sp), -1, dtype=np.int64)
            rows_g = np.full((S, mp), -1, dtype=np.int64)
            upd_g = np.full((S, mp, mp), -1, dtype=np.int64)
            for si, k in enumerate(ks):
                c0, c1 = int(starts[k]), int(starts[k + 1])
                s = c1 - c0
                R = rowsets[k]
                m = len(R)
                cs = np.arange(c0, c1, dtype=np.int64)
                cols_g[si, :s] = cs
                # diagonal grid: block (a, b) for a >= b; a == b -> diag
                # slot, a > b -> off slot (row cs[a], col cs[b])
                a, b = np.tril_indices(s)
                dslots = np.where(a == b, cs[a], 0)
                offm = a > b
                if offm.any():
                    dslots = np.where(
                        offm, off_slot_v(cs[a], cs[b]), dslots)
                diag_g[si, a, b] = dslots
                if m:
                    rows_g[si, :m] = R
                    rr = np.repeat(R, s).reshape(m, s)
                    cc = np.tile(cs, m).reshape(m, s)
                    panel_g[si, :m, :s] = off_slot_v(rr, cc)
                    # update dst: pair (R[x] row, R[y] col) for x >= y
                    x, y = np.tril_indices(m)
                    ud = np.where(x == y, R[x], 0)
                    offu = x > y
                    if offu.any():
                        ud = np.where(offu, off_slot_v(R[x], R[y]), ud)
                    upd_g[si, x, y] = ud
            # NOTE: only jnp arrays here — this pytree travels as a jit
            # ARGUMENT (solver-aux protocol); static facts (sp, mp) are
            # recovered from the array shapes inside the traced code.
            blevel.append(dict(
                cols=jnp.asarray(cols_g), diag=jnp.asarray(diag_g),
                panel=jnp.asarray(panel_g), rows=jnp.asarray(rows_g),
                upd=jnp.asarray(upd_g),
            ))
        levels.append(blevel)

    meta = dict(n=n, d=d, nnz=nnz, n_levels=L, n_supernodes=sN,
                starts=starts, rowsets=rowsets,
                colptr=colptr, rows_flat=rows_flat)
    return levels, off_slot_v, meta


# --------------------------------------------------------------------- #
# device numeric phase
# --------------------------------------------------------------------- #

def _gather_grid(blocks, grid, d):
    """(S, P, Q) slot grid -> (S, P*d, Q*d) dense panels (invalid slots
    read slot 0 and are masked to zero)."""
    S, P, Q = grid.shape
    safe = jnp.maximum(grid, 0)
    g = blocks[safe.reshape(-1)].reshape(S, P, Q, d, d)
    g = g * (grid >= 0).astype(blocks.dtype)[..., None, None]
    return jnp.transpose(g, (0, 1, 3, 2, 4)).reshape(S, P * d, Q * d)


def _scatter_grid(blocks, grid, dense, d, *, add=False):
    """Inverse of :func:`_gather_grid`: write (S, P*d, Q*d) back into the
    slot array (invalid slots redirect to a dump row)."""
    S, P, Q = grid.shape
    vals = dense.reshape(S, P, d, Q, d).transpose(0, 1, 3, 2, 4)
    vals = vals.reshape(-1, d, d)
    mask = (grid >= 0).reshape(-1)
    n_total = blocks.shape[0]
    # invalid entries go to a phantom row past the end (dropped by XLA's
    # out-of-bounds scatter clamp would corrupt; mask values instead and
    # send them to slot 0 with zero contribution for add, or skip via
    # where for set)
    safe = jnp.where(mask, grid.reshape(-1), n_total)  # OOB -> dropped
    if add:
        return blocks.at[safe].add(vals, mode="drop")
    return blocks.at[safe].set(vals, mode="drop")


def _strict_lower_block_mask(sp: int, d: int, dtype):
    """(sp*d, sp*d) scalar mask of the strictly-lower BLOCK triangle."""
    m = np.kron(np.tril(np.ones((sp, sp)), -1), np.ones((d, d)))
    return jnp.asarray(m, dtype=dtype)


# XLA's TPU cholesky/triangular-solve *expanders* are full-f32 only up to
# their internal base-case size (~128 columns); above it they switch to a
# blocked path whose inner dots run at DEFAULT (bf16 MXU) precision —
# measured: clean 1e-7 factors at 96, NaN factors at 144 on sphere2500.
# Above this threshold we run our own d-block-granular blocked kernels
# with Precision.HIGHEST trailing updates.
_SAFE_XLA_DIM = 96
_HI = jax.lax.Precision.HIGHEST


def _use_pallas_chol(dtype, n: int = 0, m: int = 0) -> bool:
    from g2o_tpu.ops.pallas_chol import use_pallas

    return use_pallas(dtype, n, m)


def _chol_batched(D, d: int):
    """Batched lower Cholesky of (S, sd, sd), d-blocked when sd is past
    the XLA expander's full-precision range."""
    sd = D.shape[-1]
    if sd <= _SAFE_XLA_DIM or sd % d:
        return jnp.linalg.cholesky(D)
    if _use_pallas_chol(D.dtype, sd):
        # past the XLA expander's full-precision range the in-kernel
        # per-column pallas recurrence is both exact f32 AND faster than
        # the d-blocked emulation (ops/pallas_chol.py)
        from g2o_tpu.ops.pallas_chol import chol_batched

        return chol_batched(D)
    sp = sd // d
    L = jnp.zeros_like(D)
    for k in range(sp):
        a = k * d
        Lkk = jnp.linalg.cholesky(D[:, a:a + d, a:a + d])
        L = L.at[:, a:a + d, a:a + d].set(Lkk)
        if k + 1 == sp:
            break
        B = D[:, a + d:, a:a + d]                       # (S, r, d)
        X = jnp.swapaxes(jax.scipy.linalg.solve_triangular(
            Lkk, jnp.swapaxes(B, -1, -2), lower=True), -1, -2)
        L = L.at[:, a + d:, a:a + d].set(X)
        D = D.at[:, a + d:, a + d:].add(
            -jnp.einsum("sik,sjk->sij", X, X, precision=_HI))
    return L


def _solve_lower_batched(L, B, d: int):
    """Solve L Y = B (L (S, sd, sd) lower, B (S, sd, m)), d-blocked past
    the XLA expander's full-precision range."""
    sd = L.shape[-1]
    if sd <= _SAFE_XLA_DIM or sd % d:
        return jax.scipy.linalg.solve_triangular(L, B, lower=True)
    if _use_pallas_chol(L.dtype, sd, B.shape[-1]):
        from g2o_tpu.ops.pallas_chol import solve_lower_batched

        return solve_lower_batched(L, B)
    sp = sd // d
    for k in range(sp):
        a = k * d
        Yk = jax.scipy.linalg.solve_triangular(
            L[:, a:a + d, a:a + d], B[:, a:a + d, :], lower=True)
        B = B.at[:, a:a + d, :].set(Yk)
        if k + 1 < sp:
            B = B.at[:, a + d:, :].add(-jnp.einsum(
                "sij,sjm->sim", L[:, a + d:, a:a + d], Yk, precision=_HI))
    return B


def _solve_upper_batched(L, B, d: int):
    """Solve L^T Y = B with L lower — the backward sweep, d-blocked past
    the XLA expander's full-precision range."""
    sd = L.shape[-1]
    if sd <= _SAFE_XLA_DIM or sd % d:
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), B, lower=False)
    if _use_pallas_chol(L.dtype, sd, B.shape[-1]):
        from g2o_tpu.ops.pallas_chol import solve_upper_batched

        return solve_upper_batched(L, B)
    sp = sd // d
    for k in reversed(range(sp)):
        a = k * d
        Yk = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L[:, a:a + d, a:a + d], -1, -2),
            B[:, a:a + d, :], lower=False)
        B = B.at[:, a:a + d, :].set(Yk)
        if k > 0:
            # (L^T)_{i,k} Y_k = L_{k,i}^T Y_k for i < k
            B = B.at[:, :a, :].add(-jnp.einsum(
                "sji,sjm->sim", L[:, a:a + d, :a], Yk, precision=_HI))
    return B


def factorize_supernodal(blocks, levels, d: int):
    """Numeric supernodal factorization over the level/bucket schedule.
    ``blocks``: (n + nnz, d, d) slot array (same layout as
    ``sparse_chol.factorize``).  Returns the factor in the same layout."""
    dtype = blocks.dtype
    for blevel in levels:
        for bk in blevel:
            grid_d, grid_p, grid_u = bk["diag"], bk["panel"], bk["upd"]
            S, sp, _ = grid_d.shape
            mp = grid_p.shape[1]
            sd = sp * d
            # gathered D holds the block-diagonal (full d x d blocks) plus
            # the strictly-lower block triangle; mirror ONLY the latter
            D = _gather_grid(blocks, grid_d, d)          # (S, sd, sd)
            low = _strict_lower_block_mask(sp, d, dtype)
            D = D + (D * low).swapaxes(-1, -2)
            # padded columns get unit diagonal so cholesky stays SPD
            colmask = (bk["cols"] >= 0)                  # (S, sp)
            cm = jnp.repeat(colmask, d, axis=1).astype(dtype)  # (S, sd)
            eye = jnp.eye(sd, dtype=dtype)
            D = D * cm[:, :, None] * cm[:, None, :] \
                + eye[None] * (1.0 - cm)[:, :, None]
            Ld = _chol_batched(D, d)
            blocks = _scatter_grid(blocks, grid_d,
                                   jnp.tril(Ld) * cm[:, :, None]
                                   * cm[:, None, :], d)
            if mp == 0:
                continue
            Pm = _gather_grid(blocks, grid_p, d)         # (S, md, sd)
            # P <- P Ld^{-T}
            Pt = _solve_lower_batched(Ld, jnp.swapaxes(Pm, -1, -2), d)
            Pm = jnp.swapaxes(Pt, -1, -2) * cm[:, None, :]
            rowmask = jnp.repeat((bk["rows"] >= 0), d, axis=1).astype(dtype)
            Pm = Pm * rowmask[:, :, None]
            blocks = _scatter_grid(blocks, grid_p, Pm, d)
            # trailing update: ancestors -= P P^T (lower triangle only)
            # HIGHEST: TPU einsum defaults to bf16 MXU passes (~1e-3
            # relative error), which accumulates over levels and breaks
            # the SPD-ness of trailing diagonal blocks (NaN cholesky);
            # XLA's cholesky/solve_triangular are full-f32 already
            U = jnp.einsum("sik,sjk->sij", Pm, Pm,
                           precision=jax.lax.Precision.HIGHEST)
            blocks = _scatter_grid(blocks, grid_u, -U, d, add=True)
    return blocks


def solve_supernodal(blocks, b, levels, d: int):
    """L L^T x = b with the supernodal schedule. ``b``: (n, d)."""
    dtype = b.dtype
    n = b.shape[0]

    def gather_rhs(grid):                   # (S, P) block ids -> (S, P*d)
        S, P = grid.shape
        safe = jnp.maximum(grid, 0)
        g = b[safe.reshape(-1)].reshape(S, P, d)
        g = g * (grid >= 0).astype(dtype)[..., None]
        return g.reshape(S, P * d)

    def scatter_rhs(b, grid, dense, *, add=False):
        S, P = grid.shape
        vals = dense.reshape(-1, d)
        safe = jnp.where((grid >= 0).reshape(-1), grid.reshape(-1), n)
        return (b.at[safe].add(vals, mode="drop") if add
                else b.at[safe].set(vals, mode="drop"))

    def padded_diag(bk):
        Ld = _gather_grid(blocks, bk["diag"], d)
        cm = jnp.repeat(bk["cols"] >= 0, d, axis=1).astype(dtype)
        sd = Ld.shape[-1]
        eye = jnp.eye(sd, dtype=dtype)
        return Ld + eye[None] * (1.0 - cm)[:, :, None], cm

    # forward: per level ascending — y_S = L_SS^{-1} b_S; b_R -= P y_S
    for blevel in levels:
        for bk in blevel:
            Ld, cm = padded_diag(bk)
            rhs = gather_rhs(bk["cols"])
            y = _solve_lower_batched(Ld, rhs[..., None], d)[..., 0] * cm
            b = scatter_rhs(b, bk["cols"], y)
            if bk["panel"].shape[1]:
                Pm = _gather_grid(blocks, bk["panel"], d)
                contrib = jnp.einsum("smk,sk->sm", Pm, y,
                                     precision=jax.lax.Precision.HIGHEST)
                b = scatter_rhs(b, bk["rows"], -contrib, add=True)

    # backward: per level descending — x_S = L_SS^{-T}(y_S - P^T x_R)
    for blevel in reversed(levels):
        for bk in blevel:
            Ld, cm = padded_diag(bk)
            rhs = gather_rhs(bk["cols"])
            if bk["panel"].shape[1]:
                Pm = _gather_grid(blocks, bk["panel"], d)
                xr = gather_rhs(bk["rows"])
                rhs = rhs - jnp.einsum(
                    "smk,sm->sk", Pm, xr,
                    precision=jax.lax.Precision.HIGHEST)
            x = _solve_upper_batched(Ld, rhs[..., None], d)[..., 0] * cm
            b = scatter_rhs(b, bk["cols"], x)
    return b


# --------------------------------------------------------------------- #
# solver class
# --------------------------------------------------------------------- #

class SupernodalCholeskySolver:
    """Direct supernodal block-Cholesky solver — the CHOLMOD-class direct
    solver.  Symbolic analysis + amalgamation run once at setup; each
    ``solve`` re-runs the batched dense numeric phase with the current
    lambda.  Mixed vertex types ride global block ids with top-left
    padding to the max tangent dim (CHOLMOD covers this with variable
    block sizes, ``linear_solver_cholmod.h:76``); n-ary edges contribute
    one H block per slot pair (``block_solver.hpp:142-214``)."""

    name = "supernodal"

    def __init__(self, *, smax: int = 24, zeta: float = 0.35,
                 min_separator_size: int = 32, refine: int = 1,
                 bucket_merge: str = "size"):
        self.smax = int(smax)
        self.zeta = float(zeta)
        self.bucket_merge = bucket_merge
        self.min_size = int(min_separator_size)
        # mixed-precision iterative-refinement sweeps: in f32 (the TPU
        # default) the factorization of an ill-conditioned pose-graph
        # Hessian carries a ~1e-2 relative solve error; each sweep reuses
        # the factor plus one matrix-free H·v to shrink it (the classic
        # refinement loop; residual cost << factorization cost)
        self.refine = int(refine)
        self.aux = ()
        self._solve_fn = None
        self._solve_jit = None

    def setup(self, problem):
        p = problem
        tnames = list(p.vertex_types)
        dims = {t: p.vertex_types[t].tangent_dim for t in tnames}
        d = max(dims.values())               # padded uniform block dim
        base = {}
        acc = 0
        for t in tnames:
            base[t] = acc
            acc += p.counts[t]
        n = acc

        # block pattern: ALL vertex pairs of every edge (n-ary included) on
        # global block ids across types — mixed types ride the uniform
        # batched schedule via top-left padding (the same scheme
        # ``SparseCholeskySolver`` uses; the reference covers this with
        # CHOLMOD's variable block sizes, ``linear_solver_cholmod.h:76``)
        pair_set = set()
        slot_pairs = {name: [(a, b)
                             for a in range(et.num_slots)
                             for b in range(a + 1, et.num_slots)]
                      for name, et in p.edge_types.items()}
        for name, et in p.edge_types.items():
            vidx = np.asarray(p.data.edges[name].vidx)
            for a, b in slot_pairs[name]:
                ga = base[et.vertex_types[a].name] + vidx[:, a]
                gb = base[et.vertex_types[b].name] + vidx[:, b]
                lo = np.minimum(ga, gb)
                hi = np.maximum(ga, gb)
                m = lo != hi
                pair_set.update(zip(lo[m].tolist(), hi[m].tolist()))
        pairs = np.asarray(sorted(pair_set), dtype=np.int64).reshape(-1, 2)

        sym = symbolic_factorization(n, pairs, min_size=self.min_size)
        levels, off_slot_v, meta = build_supernodal_schedule(
            sym, d=d, smax=self.smax, zeta=self.zeta,
            bucket_merge=self.bucket_merge)
        self.meta = meta
        inv = sym["inv"].astype(np.int64)

        edge_maps = {}
        for name, et in p.edge_types.items():
            vidx = np.asarray(p.data.edges[name].vidx)
            for a, b in slot_pairs[name]:
                ga = base[et.vertex_types[a].name] + vidx[:, a]
                gb = base[et.vertex_types[b].name] + vidx[:, b]
                i = inv[ga]
                j = inv[gb]
                valid = ga != gb
                lo = np.where(valid, np.minimum(i, j), 0)
                hi = np.where(valid, np.maximum(i, j), 1)
                slots = np.where(valid, off_slot_v(hi, lo), 0)
                transpose = i < j
                edge_maps[(name, a, b)] = (jnp.asarray(slots),
                                           jnp.asarray(transpose),
                                           jnp.asarray(valid))

        # global fixed mask + per-slot validity (padding slots off)
        fixed_np = np.zeros(n, dtype=bool)
        valid_np = np.zeros((n, d), dtype=np.float64)
        for t in tnames:
            fixed_np[base[t]:base[t] + p.counts[t]] = \
                np.asarray(p.data.fixed[t])
            valid_np[base[t]:base[t] + p.counts[t], :dims[t]] = 1.0

        perm = jnp.asarray(sym["perm"])
        dtype = p.dtype
        n_total = n + meta["nnz"]
        self.aux = dict(levels=levels, perm=perm, edge_maps=edge_maps,
                        gfixed=jnp.asarray(fixed_np),
                        gvalid=jnp.asarray(valid_np, dtype=dtype))
        eye = jnp.eye(d, dtype=dtype)

        def _pad_block(M):
            a, b = M.shape[-2], M.shape[-1]
            if a == d and b == d:
                return M
            return jnp.pad(M, ((0, 0), (0, d - a), (0, d - b)))

        def assemble_and_factor(data, lin, lam, aux):
            # every H einsum at HIGHEST: on TPU the default is bf16 MXU
            # passes (~1e-3 relative) — enough to make trailing blocks of
            # an ill-conditioned pose-graph Hessian indefinite after the
            # supernodal updates (NaN factors).  The diagonal is rebuilt
            # here rather than taken from lin.diag (which is assembled at
            # the iterative solvers' default precision).
            blocks = jnp.zeros((n_total, d, d), dtype=dtype)
            diag = jnp.zeros((n, d, d), dtype=dtype)
            for name, et in p.edge_types.items():
                Js = p.edge_jacs(lin, name)
                W = p.edge_weights(lin, name)
                vidx = data.edges[name].vidx
                for s in range(et.num_slots):
                    t = et.vertex_types[s].name
                    Hss = jnp.einsum("erd,ers,esf->edf", Js[s], W, Js[s],
                                     precision=_HI)
                    diag = diag.at[base[t] + vidx[:, s]].add(
                        _pad_block(Hss))
            vmask = aux["gvalid"]                      # (n, d)
            diag = diag + jnp.einsum("nd,de->nde", vmask, eye) * lam \
                + jnp.einsum("nd,de->nde", 1.0 - vmask, eye)
            fx = aux["gfixed"].astype(dtype)[:, None, None]
            diag = diag * (1.0 - fx) + eye * fx
            blocks = blocks.at[:n].set(diag[aux["perm"]])
            for name, et in p.edge_types.items():
                if not slot_pairs[name]:
                    continue
                Js = p.edge_jacs(lin, name)
                W = p.edge_weights(lin, name)
                for a, b in slot_pairs[name]:
                    Hab = _pad_block(jnp.einsum("erd,ers,esf->edf", Js[a],
                                                W, Js[b], precision=_HI))
                    slots, transpose, valid = aux["edge_maps"][(name, a, b)]
                    Hab = jnp.where(transpose[:, None, None],
                                    jnp.swapaxes(Hab, -1, -2), Hab)
                    Hab = Hab * valid[:, None, None].astype(dtype)
                    blocks = blocks.at[slots].add(Hab)
            return factorize_supernodal(blocks, aux["levels"], d)

        n_refine = self.refine

        def solve(data, lin, lam, aux):
            blocks = assemble_and_factor(data, lin, lam, aux)
            bb = p.split_tangent(lin.b)
            bfull = jnp.zeros((n, d), dtype=dtype)
            for t in tnames:
                bfull = bfull.at[base[t]:base[t] + p.counts[t],
                                 :dims[t]].set(bb[t])
            xperm = solve_supernodal(blocks, bfull[aux["perm"]],
                                     aux["levels"], d)
            x = jnp.zeros_like(xperm).at[aux["perm"]].set(xperm)
            if n_refine:
                # exact-f32 H·v for the refinement residual: at DEFAULT
                # precision TPU einsums run bf16 MXU passes (~1e-3
                # relative), turning the correction into bf16 noise
                hvp = p.hvp_operator(data, lin, precision=_HI)
                for _ in range(n_refine):
                    xb = {t: x[base[t]:base[t] + p.counts[t], :dims[t]]
                          for t in tnames}
                    hv = hvp(xb)
                    # padding slots: unit diagonal, b = 0, x = 0 -> r = 0
                    rfull = jnp.zeros_like(bfull)
                    for t in tnames:
                        fxt = data.fixed[t].astype(dtype)[:, None]
                        # r = b - (H + lam I) x (identity rows on fixed)
                        Ax = hv[t] + lam * xb[t] * (1.0 - fxt) + xb[t] * fxt
                        rfull = rfull.at[base[t]:base[t] + p.counts[t],
                                         :dims[t]].set(bb[t] - Ax)
                    dperm = solve_supernodal(blocks, rfull[aux["perm"]],
                                             aux["levels"], d)
                    x = x + jnp.zeros_like(x).at[aux["perm"]].set(dperm)
            return p.join_tangent(
                {t: x[base[t]:base[t] + p.counts[t], :dims[t]]
                 for t in tnames})

        self._factor_fn = assemble_and_factor
        self._solve_fn = solve
        self._solve_jit = jax.jit(solve)
        return self

    def solve(self, data, lin, lam=0.0):
        return self._solve_jit(data, lin, lam, self.aux)
