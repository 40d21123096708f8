"""Initial-guess computation — analogue of the reference
``EstimatePropagator`` spanning-tree propagation
(``g2o/core/estimate_propagator.cpp:86-137``) and the CLI's odometry guess
(``apps/g2o_cli/g2o.cpp`` ``-guessOdometry``).

Host-side, runs once before compilation: starting from fixed vertices (the
gauge), pop the minimum-cost frontier vertex and initialise its neighbours
through each edge type's ``initial_estimate`` rule (the analogue of
``Edge::initialEstimate``, ``g2o/core/optimizable_graph.h:452``).  Cost is
hop count (uniform edge cost), matching the common
``EstimatePropagatorCostOdometry`` usage.
"""

from __future__ import annotations

import heapq

import numpy as np

from g2o_tpu.ops import lie

import jax.numpy as jnp


def _se2_compose_np(a, b):
    return np.asarray(lie.se2_compose(jnp.asarray(a), jnp.asarray(b)))


def _se2_inv_np(a):
    return np.asarray(lie.se2_inverse(jnp.asarray(a)))


def _se3_compose_np(a, b):
    return np.asarray(lie.se3_compose(jnp.asarray(a), jnp.asarray(b)))


def _se3_inv_np(a):
    return np.asarray(lie.se3_inverse(jnp.asarray(a)))


def _propagate_rule(etype_name):
    """Returns fn(states, meas, param, to_slot) -> new state or None."""
    if etype_name == "EDGE_SE2":
        def rule(states, meas, param, to_slot):
            if to_slot == 1:
                return _se2_compose_np(states[0], meas)
            return _se2_compose_np(states[1], _se2_inv_np(meas))
        return rule
    if etype_name == "EDGE_SE3:QUAT":
        def rule(states, meas, param, to_slot):
            if to_slot == 1:
                return _se3_compose_np(states[0], meas)
            return _se3_compose_np(states[1], _se3_inv_np(meas))
        return rule
    if etype_name in ("EDGE_SE2_XY", "EDGE_SE2_POINT_XY"):
        def rule(states, meas, param, to_slot):
            if to_slot == 1:
                return np.asarray(
                    lie.se2_act(jnp.asarray(states[0]), jnp.asarray(meas)))
            return None
        return rule
    if etype_name == "EDGE_SE3_TRACKXYZ":
        def rule(states, meas, param, to_slot):
            if to_slot == 1:
                sensor = _se3_compose_np(states[0], param)
                return np.asarray(
                    lie.se3_act(jnp.asarray(sensor), jnp.asarray(meas)))
            return None
        return rule
    if etype_name == "EDGE_PRIOR_SE2":
        return lambda states, meas, param, to_slot: np.asarray(meas)
    if etype_name == "EDGE_SE3:EXPMAP":
        # error = (X2^-1 Z X1).log() => X2 = Z X1
        def rule(states, meas, param, to_slot):
            if to_slot == 1:
                return _se3_compose_np(meas, states[0])
            return _se3_compose_np(_se3_inv_np(meas), states[1])
        return rule
    return None


def hyper_dijkstra(graph, roots, *, cost=None, max_distance=float("inf"),
                   level=0):
    """Shortest-path traversal over the hyper-graph with a pluggable edge
    cost — the analogue of ``HyperDijkstra::shortestPaths``
    (``g2o/core/hyper_dijkstra.h:77-88``) with the
    ``EstimatePropagatorCost`` functor family
    (``g2o/core/estimate_propagator.h:46-61``).

    ``cost(edge_rec, from_vid, to_vid) -> float`` (default: uniform 1.0;
    return ``inf``/``None`` to forbid an edge).  Returns ``(dist, parent)``
    dicts: ``dist[vid]`` = accumulated cost, ``parent[vid]`` =
    ``(edge_rec, from_vid)`` for the spanning-tree edge (roots map to
    ``None``)."""
    if cost is None:
        cost = lambda e, frm, to: 1.0  # noqa: E731

    adj: dict[int, list] = {}
    for e in graph.edges():
        if not e.active or e.level != level:
            continue
        for s, vid in enumerate(e.vids):
            adj.setdefault(vid, []).append((e, s))

    dist = {vid: 0.0 for vid in roots}
    parent: dict[int, object] = {vid: None for vid in roots}
    visited = set()
    heap = [(0.0, vid) for vid in roots]
    heapq.heapify(heap)
    while heap:
        d, vid = heapq.heappop(heap)
        if vid in visited or d > dist.get(vid, float("inf")):
            continue
        visited.add(vid)
        for e, my_slot in adj.get(vid, ()):
            for to_slot, to_vid in enumerate(e.vids):
                if to_slot == my_slot or to_vid in visited:
                    continue
                c = cost(e, vid, to_vid)
                if c is None or not np.isfinite(c):
                    continue
                nd = d + float(c)
                if nd > max_distance or nd >= dist.get(to_vid, float("inf")):
                    continue
                dist[to_vid] = nd
                parent[to_vid] = (e, vid)
                heapq.heappush(heap, (nd, to_vid))
    return dist, parent


def compute_initial_guess(graph, *, roots=None, cost=None) -> int:
    """Propagate estimates over a Dijkstra spanning tree from the fixed
    vertices (or explicit root ids) — the reference's
    ``EstimatePropagator::propagate`` (``estimate_propagator.cpp:86-137``).
    ``cost`` is an optional ``(edge_rec, from_vid, to_vid) -> float``
    functor (default: uniform hop count, the common
    ``EstimatePropagatorCostOdometry`` usage).  Mutates the graph's vertex
    estimates in place; returns the number of vertices initialised."""
    verts = graph.vertices()
    if roots is None:
        roots = [vid for vid, r in verts.items() if r.fixed]
    if not roots:
        # fall back to the lowest id (reference findGauge-ish behaviour)
        roots = [min(verts)] if verts else []
    if cost is None:
        cost = lambda e, frm, to: 1.0  # noqa: E731

    # adjacency: vid -> list of (edge_rec, my_slot)
    adj: dict[int, list] = {}
    for e in graph.edges():
        if not e.active:
            continue
        for s, vid in enumerate(e.vids):
            adj.setdefault(vid, []).append((e, s))

    dist = {vid: 0.0 for vid in roots}
    visited = set()
    heap = [(0.0, vid) for vid in roots]
    heapq.heapify(heap)
    n_init = 0

    while heap:
        d, vid = heapq.heappop(heap)
        if vid in visited:
            continue
        visited.add(vid)
        for e, my_slot in adj.get(vid, ()):  # propagate outward
            rule = _propagate_rule(e.etype.name)
            if rule is None:
                continue
            for to_slot, to_vid in enumerate(e.vids):
                if to_slot == my_slot or to_vid in visited or to_vid in dist:
                    continue
                if verts[to_vid].fixed:
                    continue
                c = cost(e, vid, to_vid)
                if c is None or not np.isfinite(c):
                    continue
                states = [verts[v].estimate for v in e.vids]
                param = (np.concatenate([graph.parameter(p)
                                         for p in e.param_id])
                         if e.param_id is not None else None)
                new = rule(states, e.measurement, param, to_slot)
                if new is None:
                    continue
                verts[to_vid].estimate = np.asarray(new, dtype=np.float64)
                dist[to_vid] = d + float(c)
                n_init += 1
                heapq.heappush(heap, (d + float(c), to_vid))
    return n_init
