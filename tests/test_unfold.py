"""Cost-bounded edge region growing (examples/g2o_unfold) + per-edge chi2."""

import os
import sys

import numpy as np

from g2o_tpu.sim.generators import create_manhattan
import g2o_tpu.types  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from examples.g2o_unfold import (  # noqa: E402
    edge_costs_inv_chi2,
    find_connected_edges_with_cost_limit,
)


def test_edge_chi2_matches_total():
    g = create_manhattan(n_poses=40, seed=3)
    p = g.compile()
    per_edge = p.edge_chi2_fn(p.data, p.estimates)
    total = sum(float(np.sum(np.asarray(v))) for v in per_edge.values())
    chi_r, _ = p.chi2_fn(p.data, p.estimates)
    assert abs(total - float(chi_r)) < 1e-9 * max(1.0, abs(float(chi_r)))


def test_region_growing_partitions_reachable_edges():
    g = create_manhattan(n_poses=40, seed=3)
    p = g.compile()
    costs = edge_costs_inv_chi2(g, p)
    # grow with an infinite budget: every reachable edge is selected
    sel, border = find_connected_edges_with_cost_limit(
        g, 0, costs, float("inf"))
    assert border == set()
    assert len(sel) == g.num_edges  # manhattan graphs are connected

    # finite budget: selected edges all within cost, border edges past it
    cut = float(np.median(costs))
    sel, border = find_connected_edges_with_cost_limit(g, 0, costs, cut)
    assert all(costs[i] <= cut for i in sel)
    assert all(costs[i] > cut for i in border)
    # the start edge is classified too
    assert 0 in sel or 0 in border


def test_unfold_example_main(tmp_path, monkeypatch, capsys):
    from g2o_tpu.io import g2o_format
    import examples.g2o_unfold as unfold

    g = create_manhattan(n_poses=30, seed=4)
    path = tmp_path / "m.g2o"
    g2o_format.save(g, str(path))
    dump = tmp_path / "dump.dat"
    monkeypatch.setattr(sys, "argv", [
        "g2o_unfold.py", str(path), "-i", "3", "-maxCost", "1e9",
        "-gnudump", str(dump), "-o", str(tmp_path / "out.g2o"),
    ])
    assert unfold.main() == 0
    out = capsys.readouterr().out
    assert "selected" in out
    assert (tmp_path / "dump_selected.dat").exists()
    assert (tmp_path / "out.g2o").exists()
