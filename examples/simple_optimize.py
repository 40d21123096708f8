"""Minimal load-and-optimize — analogue of the reference
``examples/simple_optimize.cpp``.

Run: python examples/simple_optimize.py graph.g2o [iterations]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 2:
        print("usage: simple_optimize.py graph.g2o [iterations]")
        return 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import g2o_tpu
    import g2o_tpu.types  # register tags
    from g2o_tpu.core.solvers import PCGSolver
    from g2o_tpu.io import g2o_format

    g = g2o_format.load(sys.argv[1])
    if not any(r.fixed for r in g.vertices().values()):
        g.set_fixed(min(g.vertices()), True)
    p = g.compile()
    opt = g2o_tpu.SparseOptimizer(p, algorithm=g2o_tpu.LevenbergMarquardt(),
                                  solver=PCGSolver(), verbose=True)
    opt.optimize(iters)
    out = sys.argv[1] + ".optimized"
    g2o_format.save(g, out, estimates_by_vid=p.estimates_by_vid())
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
