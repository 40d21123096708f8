"""``.g2o`` text-format reader/writer.

Format compatibility with the reference loader/saver
(``g2o/core/optimizable_graph.cpp:397,681``):

* ``<VERTEX_TAG> id <rep_dim floats>``
* ``<EDGE_TAG> id... [param_id] <meas floats> <upper-triangular info floats>``
* ``FIX id`` — pin the vertex (gauge)
* ``PARAMS_* id <floats>`` — shared parameter blocks

The information matrix is serialised as the row-major upper triangle, as in
the reference ``BaseEdge::read/write`` implementations.
"""

from __future__ import annotations

import io as _io

import numpy as np

from g2o_tpu.core.graph import Graph
from g2o_tpu.core.types import (
    REGISTRY,
    full_to_upper_triangular,
    upper_triangular_to_full,
)

# parameter tags understood by the loader: tag -> value length
PARAM_TAGS = {
    "PARAMS_SE3OFFSET": 7,
    "PARAMS_SE2OFFSET": 3,
    "PARAMS_CAMERACALIB": 7 + 4,       # offset + fx fy cx cy
    # offset + fx fy cx cy + baseline (ParameterStereoCamera,
    # ``types/slam3d/parameter_stereo_camera.cpp:43-69``, tag registration
    # ``types/slam3d/types_slam3d.cpp:48``)
    "PARAMS_STEREOCAMERACALIB": 7 + 4 + 1,
    "PARAMS_CAMERAPARAMETERS": 4,      # focal_length cx cy baseline (sba)
}
# the deprecated slam3d library's prefixed param spellings
# (``types/deprecated/slam3d/types_slam3d.cpp:43,49``)
PARAM_TAGS["DEPRECATED_PARAMS_SE3OFFSET"] = PARAM_TAGS["PARAMS_SE3OFFSET"]
PARAM_TAGS["DEPRECATED_PARAMS_CAMERACALIB"] = PARAM_TAGS["PARAMS_CAMERACALIB"]

# sensor-data payload tags attached verbatim to the preceding vertex
# (reference ``g2o/types/data``: RobotLaser / RawLaser readings)
DATA_TAGS = ("ROBOTLASER1", "ROBOTLASER2", "RAWLASER1", "RAWLASER2",
             "VERTEX_TAG", "VERTEX_ELLIPSE")


def load(path_or_file, graph: Graph | None = None, registry=None,
         default_fixed: set | None = None,
         rename: dict | None = None) -> Graph:
    """``rename`` maps on-disk tags to registered tags before lookup — the
    analogue of the reference CLI's ``-renameTypes`` handling
    (``apps/g2o_cli/g2o.cpp`` type-renaming flag)."""
    registry = registry or REGISTRY
    g = graph or Graph(registry)
    fix_ids = []

    if hasattr(path_or_file, "read"):
        fh = path_or_file
        close = False
    else:
        fh = open(path_or_file, "r")
        close = True
    last_vid = None
    try:
        for lineno, line in enumerate(fh, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if rename and tag in rename:
                tag = rename[tag]
            try:
                _parse_line(g, registry, parts, tag, line, lineno, fix_ids,
                            last_vid)
            except _ParsedVertex as pv:
                last_vid = pv.vid
            except ValueError as e:
                # line-numbered diagnostics for EVERY malformed line (the
                # reference prints the same via its per-type read methods)
                if str(e).startswith("line "):
                    raise
                raise ValueError(f"line {lineno}: {e}") from e
    finally:
        if close:
            fh.close()

    for vid in fix_ids:
        g.set_fixed(vid, True)
    if not fix_ids and default_fixed:
        # gauge fallback for datasets without FIX lines (sphere2500-style
        # files): pin the requested vids — matching the reference apps'
        # "fix the first vertex if nothing is fixed" convention
        # (``apps/g2o_cli/g2o.cpp`` gauge handling)
        for vid in default_fixed:
            if g.has_vertex(int(vid)):
                g.set_fixed(int(vid), True)
    return g


class _ParsedVertex(Exception):
    """Control-flow signal: the line defined vertex ``vid`` (data lines
    that follow attach to it)."""

    def __init__(self, vid):
        self.vid = vid


def _parse_line(g, registry, parts, tag, line, lineno, fix_ids, last_vid):
    if tag == "FIX":
        fix_ids.extend(int(p) for p in parts[1:])
        return
    if tag in DATA_TAGS:
        if last_vid is not None:
            g.add_vertex_data(last_vid, line)
        return
    if tag in PARAM_TAGS or tag.startswith("PARAMS_"):
        pid = int(parts[1])
        g.add_parameter(pid, [float(x) for x in parts[2:]])
        return
    vt = registry.vertex_for_tag(tag)
    if vt is not None:
        vid = int(parts[1])
        vals = np.array([float(x) for x in parts[2:2 + vt.serialized_dim]])
        if vals.shape[0] != vt.serialized_dim:
            raise ValueError(
                f"{tag}: expected {vt.serialized_dim} state entries")
        if vt.from_vector is not None:
            vals = np.asarray(vt.from_vector(vals))
        g.add_vertex(vid, vt, vals)
        raise _ParsedVertex(vid)
    dyn = registry.dynamic_edge_for_tag(tag)
    if dyn is not None:
        # 'TAG id... || count meas upper-tri-info' (reference
        # ``optimizable_graph.cpp:575-590`` + per-edge read)
        try:
            sep = parts.index("||")
        except ValueError:
            raise ValueError(
                f"line {lineno}: {tag} missing '||' separator")
        vids = [int(x) for x in parts[1:sep]]
        et = dyn(len(vids) - 1)
        pos = sep + 1
        count = int(parts[pos])
        pos += 1
        if count != len(vids) - 1:
            raise ValueError(
                f"line {lineno}: {tag} count {count} != "
                f"{len(vids) - 1} observed vertices")
        m = et.serialized_meas_dim
        meas = np.array([float(x) for x in parts[pos:pos + m]])
        pos += m
        r = et.residual_dim
        ninfo = r * (r + 1) // 2
        vals = [float(x) for x in parts[pos:pos + ninfo]]
        if len(vals) != ninfo:
            raise ValueError(
                f"line {lineno}: expected {ninfo} information entries")
        info = upper_triangular_to_full(vals, r)
        g.add_edge(et, vids, meas, info)
        return
    et = registry.edge_for_tag(tag)
    if et is not None:
        k = et.num_slots
        vids = [int(p) for p in parts[1:1 + k]]
        pos = 1 + k
        param_id = None
        if et.param_dim:
            param_id = tuple(
                int(parts[pos + i]) for i in range(et.num_params))
            pos += et.num_params
        m = et.serialized_meas_dim
        meas = np.array([float(x) for x in parts[pos:pos + m]])
        pos += m
        if et.meas_from_vector is not None:
            meas = np.asarray(et.meas_from_vector(meas))
        r = et.residual_dim
        ninfo = r * (r + 1) // 2
        vals = [float(x) for x in parts[pos:pos + ninfo]]
        if len(vals) != ninfo:
            raise ValueError(
                f"line {lineno}: expected {ninfo} information entries"
            )
        info = upper_triangular_to_full(vals, r)
        if et.info_from_io is not None:
            info = np.asarray(et.info_from_io(info, meas))
        g.add_edge(et, vids, meas, info, param_id=param_id)
        return
    raise ValueError(f"line {lineno}: unknown tag {tag!r}")


def loads(text: str, **kw) -> Graph:
    return load(_io.StringIO(text), **kw)


def _fmt(vals) -> str:
    return " ".join(f"{float(v):.10g}" for v in np.asarray(vals).reshape(-1))


def save(g: Graph, path_or_file, estimates_by_vid=None,
         vertex_subset=None, edge_subset=None, level=None):
    """Write the graph (optionally with updated estimates) — order matches
    the reference saver: params, vertices (+FIX), edges.

    Subset variants (reference ``OptimizableGraph::saveSubset``,
    ``g2o/core/optimizable_graph.cpp:719,749``):

    * ``vertex_subset`` (iterable of vids): write only these vertices and
      the edges at ``level`` whose vertices ALL lie in the subset
      (vset overload, ``:719``).
    * ``edge_subset`` (iterable of edge records from ``g.edges()``): write
      these edges and exactly the vertices they touch
      (eset overload, ``:749``).
    * ``level``: when given (and no edge_subset), only edges at this level
      are written (``save`` overload's level filter, ``:681``).
    """
    if edge_subset is not None:
        edges = list(edge_subset)
        vset = {v for e in edges for v in e.vids}
    else:
        edges = [e for e in g.edges()
                 if level is None or e.level == level]
        vset = None
        if vertex_subset is not None:
            vset = set(int(v) for v in vertex_subset)
            edges = [e for e in edges if all(v in vset for v in e.vids)]
    if hasattr(path_or_file, "write"):
        fh = path_or_file
        close = False
    else:
        fh = open(path_or_file, "w")
        close = True
    try:
        for pid in sorted(g._parameters):
            # best-effort tag recovery: length-based
            vals = g._parameters[pid]
            tag = {7: "PARAMS_SE3OFFSET", 3: "PARAMS_SE2OFFSET",
                   11: "PARAMS_CAMERACALIB",
                   12: "PARAMS_STEREOCAMERACALIB",
                   4: "PARAMS_CAMERAPARAMETERS"}.get(len(vals),
                                                     "PARAMS_UNKNOWN")
            fh.write(f"{tag} {pid} {_fmt(vals)}\n")
        for vid in sorted(g.vertices()):
            if vset is not None and vid not in vset:
                continue
            rec = g.vertices()[vid]
            est = rec.estimate if estimates_by_vid is None else estimates_by_vid[vid]
            if rec.vtype.to_vector is not None:
                est = rec.vtype.to_vector(est)
            fh.write(f"{rec.vtype.io_tags[0]} {vid} {_fmt(est)}\n")
            for raw in g.vertex_data(vid):
                fh.write(raw + "\n")
            if rec.fixed:
                fh.write(f"FIX {vid}\n")
        for e in edges:
            meas = e.measurement
            if e.etype.meas_to_vector is not None:
                meas = e.etype.meas_to_vector(meas)
            if e.etype.dynamic_tag:
                fh.write(" ".join([
                    e.etype.dynamic_tag,
                    " ".join(str(v) for v in e.vids),
                    "||", str(len(e.vids) - 1), _fmt(meas),
                    _fmt(full_to_upper_triangular(np.asarray(e.information))),
                ]) + "\n")
                continue
            parts = [e.etype.io_tags[0], " ".join(str(v) for v in e.vids)]
            if e.etype.param_dim:
                parts.append(" ".join(str(p) for p in e.param_id))
            parts.append(_fmt(meas))
            info = np.asarray(e.information)
            if e.etype.info_to_io is not None:
                info = np.asarray(e.etype.info_to_io(info, e.measurement))
            parts.append(_fmt(full_to_upper_triangular(info)))
            fh.write(" ".join(parts) + "\n")
    finally:
        if close:
            fh.close()


def dumps(g: Graph, **kw) -> str:
    buf = _io.StringIO()
    save(g, buf, **kw)
    return buf.getvalue()
