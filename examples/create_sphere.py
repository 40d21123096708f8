"""Generate a sphere pose-graph dataset — analogue of the reference
``examples/sphere/create_sphere.cpp``: poses on a sphere connected by
odometry and level-crossing loop closures, written as a ``.g2o`` file.

Run: python examples/create_sphere.py out.g2o [nodes_per_level] [laps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "sphere.g2o"
    npl = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    laps = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import g2o_tpu.types  # register tags
    from g2o_tpu.io import g2o_format
    from g2o_tpu.sim.generators import create_sphere

    g = create_sphere(nodes_per_level=npl, laps=laps, radius=100.0, seed=0)
    g2o_format.save(g, out)
    print(f"wrote {out}: {len(g.vertices())} vertices, "
          f"{len(g.edges())} edges")
    return 0


if __name__ == "__main__":
    sys.exit(main())
