"""Interactive SLAM protocol server (protocol.txt examples)."""

import numpy as np
import pytest

from g2o_tpu.apps.interactive import InteractiveSlam


def run_script(srv, script):
    out = []
    for line in script.strip().splitlines():
        r = srv.handle_line(line)
        if r is not None:
            out.append(r)
    return out


def test_protocol_2d_example():
    srv = InteractiveSlam(iterations=10)
    out = run_script(srv, """
        ADD VERTEX_XYT 0;
        ADD VERTEX_XYT 1;
        ADD EDGE_XYT 0 0 1 .1 .2 .3 1 0 0 1 0 1;
        FIX 0;
        SOLVE_STATE;
        QUERY_STATE;
    """)
    assert len(out) == 1
    lines = out[0].splitlines()
    assert lines[0] == "BEGIN" and lines[-1] == "END"
    v1 = [float(x) for x in lines[2].split()[2:]]
    np.testing.assert_allclose(v1, [0.1, 0.2, 0.3], atol=1e-6)

    out = run_script(srv, """
        ADD VERTEX_XYT 2;
        ADD EDGE_XYT 1 1 2 .1 .2 .3 1 0 0 1 0 1;
        SOLVE_STATE;
        QUERY_STATE 1 2;
    """)
    lines = out[0].splitlines()
    assert len(lines) == 4  # BEGIN, two vertices, END
    assert lines[1].startswith("VERTEX_XYT 1")
    assert lines[2].startswith("VERTEX_XYT 2")


def test_protocol_3d_example():
    srv = InteractiveSlam(iterations=20)
    out = run_script(srv, """
        ADD VERTEX_XYZRPY 0;
        ADD VERTEX_XYZRPY 1;
        ADD EDGE_XYZRPY 0 0 1 .1 .2 .3 .01 .02 .03 1 0 0 0 0 0 1 0 0 0 0 1 0 0 0 1 0 0 1 0 1;
        FIX 0;
        SOLVE_STATE;
        QUERY_STATE;
    """)
    lines = out[0].splitlines()
    assert lines[1].startswith("VERTEX_XYZRPY 0")
    v1 = [float(x) for x in lines[2].split()[2:]]
    np.testing.assert_allclose(v1[:3], [0.1, 0.2, 0.3], atol=1e-5)
    np.testing.assert_allclose(v1[3:], [0.01, 0.02, 0.03], atol=1e-4)


def test_unknown_command():
    srv = InteractiveSlam()
    assert "error" in srv.handle_line("FROBNICATE 1;")
    assert "error" in srv.handle_line("ADD VERTEX_MARS 0;")
