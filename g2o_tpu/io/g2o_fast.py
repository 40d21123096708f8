"""Array-direct ``.g2o`` loading: native C++ tokenizer → numpy blocks →
:func:`~g2o_tpu.core.problem.build_problem`, bypassing per-record Python
objects entirely.  This is the production path for city/Venice-scale files
(~20x faster than the pure-Python loader); it falls back to
:mod:`g2o_tpu.io.g2o_format` when the native library cannot be built."""

from __future__ import annotations

import numpy as np

from g2o_tpu.core.problem import build_problem
from g2o_tpu.core.types import REGISTRY
from g2o_tpu.io.g2o_format import DATA_TAGS, PARAM_TAGS
from g2o_tpu.ops import robust as robust_mod


def _tri_indices(r):
    iu = np.triu_indices(r)
    return iu


def load_problem(path, *, registry=None, dtype=None, kernel=None,
                 delta: float = 1.0, marginalize: bool = False,
                 fix_first_if_free: bool = True,
                 pad_edges_to_multiple: int = 1):
    """Load a .g2o file straight into a compiled Problem.

    Returns ``(problem, aux)`` where aux carries the parameter dict and the
    block stats.  Robust kernels are applied uniformly via ``kernel=`` (the
    CLI flow); per-edge kernels need the object loader."""
    from g2o_tpu import native

    registry = registry or REGISTRY
    blocks = native.parse_blocks(path)
    if blocks is None:  # no compiler: fall back to the object loader
        from g2o_tpu.io import g2o_format

        g = g2o_format.load(path, registry=registry)
        if kernel:
            g.set_robust_kernel(kernel, delta)
        if marginalize:
            max_dim = max(r.vtype.tangent_dim for r in g.vertices().values())
            for vid, r in g.vertices().items():
                if r.vtype.tangent_dim != max_dim:
                    g.set_marginalized(vid, True)
        if fix_first_if_free and not any(
                r.fixed for r in g.vertices().values()):
            g.set_fixed(min(g.vertices()), True)
        return g.compile(dtype=dtype,
                         pad_edges_to_multiple=pad_edges_to_multiple), {}

    params = {}
    fixed_ids = np.zeros(0, dtype=np.int64)
    vertex_blocks = {}
    edge_blocks = {}
    kid = robust_mod.KERNEL_IDS[kernel] if isinstance(kernel, str) else \
        (kernel or robust_mod.NONE)

    for tag, (vals, ncols) in blocks.items():
        if tag == "FIX":
            fixed_ids = vals[np.isfinite(vals)].astype(np.int64).ravel()
            continue
        if tag in DATA_TAGS:
            continue  # sensor payloads are dropped on the array-direct path
        if tag in PARAM_TAGS or tag.startswith("PARAMS_"):
            for row, n in zip(vals, ncols):
                params[int(row[0])] = row[1:n].copy()
            continue
        vt = registry.vertex_for_tag(tag)
        if vt is not None:
            ids = vals[:, 0].astype(np.int64)
            est = vals[:, 1:1 + vt.serialized_dim]
            if vt.from_vector is not None:
                est = np.stack([np.asarray(vt.from_vector(row))
                                for row in est])
            prev = vertex_blocks.get(vt)
            if prev is None:
                vertex_blocks[vt] = [ids, est]
            else:
                vertex_blocks[vt] = [np.concatenate([prev[0], ids]),
                                     np.concatenate([prev[1], est])]
            continue
        et = registry.edge_for_tag(tag)
        if et is not None:
            k = et.num_slots
            pos = 0
            vids = vals[:, pos:pos + k].astype(np.int64)
            pos += k
            if et.param_dim:
                pids = vals[:, pos:pos + et.num_params].astype(np.int64)
                pos += et.num_params
            else:
                pids = None
            m = et.serialized_meas_dim
            meas = vals[:, pos:pos + m]
            pos += m
            if et.meas_from_vector is not None:
                meas = np.stack([np.asarray(et.meas_from_vector(row))
                                 for row in meas])
            r = et.residual_dim
            ntri = r * (r + 1) // 2
            tri = vals[:, pos:pos + ntri]
            iu = _tri_indices(r)
            info = np.zeros((len(vals), r, r))
            info[:, iu[0], iu[1]] = tri
            info[:, iu[1], iu[0]] = tri
            if et.info_from_io is not None:
                # serialized-basis -> residual-basis conversion (e.g. the
                # Euler EDGE3 J^T I J transform) — the object loader
                # applies it per line (g2o_format), the fast path must too
                info = np.stack([np.asarray(et.info_from_io(I, mm))
                                 for I, mm in zip(info, meas)])
            prev_e = edge_blocks.get(et)
            if prev_e is None:
                edge_blocks[et] = (vids, meas, info, pids)
            else:
                # two on-disk tags resolving to one EdgeType (modern +
                # deprecated aliases): CONCATENATE, as the vertex path does
                pv, pm, pi, pp = prev_e
                pids2 = (np.concatenate([pp, pids]) if pp is not None
                         else None)
                edge_blocks[et] = (np.concatenate([pv, vids]),
                                   np.concatenate([pm, meas]),
                                   np.concatenate([pi, info]), pids2)
            continue
        raise ValueError(f"unknown tag {tag!r} in {path}")

    # resolve params + finalize edge blocks
    final_edges = {}
    for et, (vids, meas, info, pids) in edge_blocks.items():
        E = len(vids)
        if et.param_dim:
            pvals = np.zeros((E, et.param_dim))
            # params are few; loop over unique id tuples
            keys = [tuple(row) for row in pids]
            uniq = sorted(set(keys))
            lut = {u: np.concatenate([params[int(p)] for p in u])
                   for u in uniq}
            for i, kk in enumerate(keys):
                pvals[i] = lut[kk]
        else:
            pvals = np.zeros((E, 0))
        final_edges[et] = (
            vids, meas, info,
            np.full(E, kid, dtype=np.int32),
            np.full(E, float(delta)),
            np.ones(E, dtype=bool),
            pvals,
        )

    final_vertices = {}
    fixed_set = set(int(x) for x in fixed_ids)
    any_fixed = bool(fixed_set)
    first_vid = None
    all_ids = [ids for ids, _ in vertex_blocks.values()]
    if all_ids and fix_first_if_free and not any_fixed:
        # gauge pick: lowest id of the LARGEST-tangent-dim type — fixing a
        # 3-dof landmark would leave rotational gauge freedom (the
        # reference findGauge selects a pose-dimension vertex)
        dmax_g = max(vt.tangent_dim for vt in vertex_blocks)
        first_vid = int(min(
            int(ids.min()) for vt, (ids, _) in vertex_blocks.items()
            if vt.tangent_dim == dmax_g and len(ids)))
    max_dim = max((vt.tangent_dim for vt in vertex_blocks), default=0)
    for vt, (ids, est) in vertex_blocks.items():
        fx = np.array([int(i) in fixed_set for i in ids], dtype=bool)
        if first_vid is not None:
            fx |= (ids == first_vid)
        mg = np.full(len(ids),
                     marginalize and vt.tangent_dim != max_dim, dtype=bool)
        final_vertices[vt] = (ids, est, fx, mg)

    problem = build_problem(final_vertices, final_edges, dtype=dtype,
                            pad_edges_to_multiple=pad_edges_to_multiple)
    return problem, {"params": params}
