"""BAL dataset reader/writer (http://grail.cs.washington.edu/projects/bal/).

Format (as parsed by the reference ``bal_example.cpp:300-360``):

    num_cameras num_points num_observations
    <cam_idx point_idx u v>            x num_observations
    <9 camera params, one per line>    x num_cameras
    <3 point coords, one per line>     x num_points

Cameras get vertex ids [0, C); points [C, C+P) and are marked marginalized
for the Schur path (as the reference marks them, ``bal_example.cpp:420``).
"""

from __future__ import annotations

import numpy as np

from g2o_tpu.core.graph import Graph


def load_bal(path_or_file, *, fix_first_camera: bool = True,
             huber: float = 0.0) -> Graph:
    from g2o_tpu.types.bal import EdgeObservationBAL, VertexCameraBAL
    from g2o_tpu.types.slam3d import VertexPointXYZ

    if hasattr(path_or_file, "read"):
        tokens = path_or_file.read().split()
    else:
        with open(path_or_file) as fh:
            tokens = fh.read().split()
    it = iter(tokens)

    def nxt():
        return next(it)

    C = int(nxt())
    P = int(nxt())
    O = int(nxt())
    obs = np.empty((O, 4))
    for i in range(O):
        obs[i] = (float(nxt()), float(nxt()), float(nxt()), float(nxt()))
    cams = np.empty((C, 9))
    for i in range(C):
        cams[i] = [float(nxt()) for _ in range(9)]
    pts = np.empty((P, 3))
    for i in range(P):
        pts[i] = [float(nxt()) for _ in range(3)]

    g = Graph()
    for i in range(C):
        g.add_vertex(i, VertexCameraBAL, cams[i],
                     fixed=(fix_first_camera and i == 0))
    for j in range(P):
        g.add_vertex(C + j, VertexPointXYZ, pts[j], marginalized=True)
    info = np.eye(2)
    kernel = "Huber" if huber > 0 else None
    for i in range(O):
        ci, pi = int(obs[i, 0]), int(obs[i, 1])
        g.add_edge(EdgeObservationBAL, [ci, C + pi], obs[i, 2:4], info,
                   kernel=kernel, delta=huber if huber > 0 else 1.0)
    return g


def save_bal(g: Graph, path, estimates_by_vid=None):
    """Write the graph back in BAL format (cameras/points recovered by
    type)."""
    from g2o_tpu.types.bal import VertexCameraBAL

    est = estimates_by_vid or {vid: r.estimate
                               for vid, r in g.vertices().items()}
    cams = sorted(vid for vid, r in g.vertices().items()
                  if r.vtype is VertexCameraBAL)
    pts = sorted(vid for vid, r in g.vertices().items()
                 if r.vtype is not VertexCameraBAL)
    cam_index = {vid: i for i, vid in enumerate(cams)}
    pt_index = {vid: i for i, vid in enumerate(pts)}
    lines = [f"{len(cams)} {len(pts)} {len(g.edges())}"]
    for e in g.edges():
        ci, pi = e.vids
        lines.append(f"{cam_index[ci]} {pt_index[pi]} "
                     f"{e.measurement[0]:.12g} {e.measurement[1]:.12g}")
    for vid in cams:
        lines.extend(f"{v:.16g}" for v in np.asarray(est[vid]))
    for vid in pts:
        lines.extend(f"{v:.16g}" for v in np.asarray(est[vid]))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def make_synthetic_bal(n_cameras=49, n_points=7000, n_obs_per_point=6,
                       pixel_noise=1.0, seed=0):
    """Ladybug-like synthetic BAL problem (no dataset download in this
    environment): cameras on an arc looking inward at a point cloud."""
    from g2o_tpu.types.bal import bal_project
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    cams = np.zeros((n_cameras, 9))
    for i in range(n_cameras):
        ang = 0.6 * (i / max(n_cameras - 1, 1) - 0.5)
        # camera at radius 10 on an arc in the x-z plane, looking at origin:
        # rotation about y by -ang maps world to camera (approximately)
        cams[i, :3] = [0.0, -ang, 0.0]
        cams[i, 3:6] = [10 * np.sin(ang) * 0.2, 0.0, -10.0 + np.cos(ang)]
        cams[i, 6] = 800.0 + rng.normal() * 5
        cams[i, 7] = -1e-7
        cams[i, 8] = 1e-13
    pts = np.stack([
        rng.uniform(-4, 4, n_points),
        rng.uniform(-3, 3, n_points),
        rng.uniform(-2, 2, n_points),
    ], axis=1)

    obs = []
    cam_j = jnp.asarray(cams)
    for j in range(n_points):
        sel = rng.choice(n_cameras, size=min(n_obs_per_point, n_cameras),
                         replace=False)
        for c in sel:
            uv = np.asarray(bal_project(cam_j[c], jnp.asarray(pts[j])))
            obs.append((c, j, uv[0] + rng.normal(scale=pixel_noise),
                        uv[1] + rng.normal(scale=pixel_noise)))

    lines = [f"{n_cameras} {n_points} {len(obs)}"]
    lines += [f"{c} {j} {u:.6f} {v:.6f}" for c, j, u, v in obs]
    for i in range(n_cameras):
        lines += [f"{v:.16g}" for v in cams[i]]
    for j in range(n_points):
        lines += [f"{v:.16g}" for v in pts[j]]
    return "\n".join(lines) + "\n"
