"""Native (C++) graph-builder parity: the ctypes topology compiler must
agree exactly with the NumPy fallback on every shape, and reject the same
invalid topologies (reference semantics: lqr.cpp:563-631)."""

import numpy as np
import pytest

from sip_optimal_control_tpu import Topology, compile_topology
from sip_optimal_control_tpu.types import TopologyError
from sip_optimal_control_tpu import native


requires_native = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable (no g++?)")


def _shapes():
    yield "chain", Topology.chain(7)
    yield "single_node", Topology.chain(0)
    yield "shallow_wide", Topology.tree(0, [0, 0, 0, 0], [1, 2, 3, 4])
    yield "binary", Topology.tree(0, [(k - 1) // 2 for k in range(1, 8)],
                                  list(range(1, 8)))
    yield "nonzero_root", Topology.tree(2, [2, 2, 1], [1, 0, 3])
    yield "shuffled_edges", Topology.tree(0, [1, 0, 1, 3], [2, 1, 3, 4])


@requires_native
def test_native_matches_numpy_on_all_shapes():
    for name, topo in _shapes():
        s_native = compile_topology(topo, use_native=True)
        s_numpy = compile_topology(topo, use_native=False)
        for field in ("child_offsets", "child_edges", "preorder",
                      "postorder", "depth", "parent_edge", "parent_node"):
            np.testing.assert_array_equal(
                getattr(s_native, field), getattr(s_numpy, field),
                err_msg=f"{name}:{field}")
        assert len(s_native.levels_nodes) == len(s_numpy.levels_nodes), name
        for a, b in zip(s_native.levels_nodes, s_numpy.levels_nodes):
            np.testing.assert_array_equal(a, b, err_msg=name)


@requires_native
def test_native_rejects_invalid_topologies():
    bad = [
        Topology.tree(5, [0], [1]),                      # root out of range
        Topology.tree(0, [0], [0]),                      # self loop
        Topology.tree(0, [0, 1], [1, 1]),                # in-degree 2
        Topology.tree(0, [0, 2], [1, 2]),                # self-referential
        Topology.tree(1, [1, 2], [2, 1]),                # root has parent
        Topology.tree(0, [0, 3], [1, 2]),                # edge out of range
    ]
    for topo in bad:
        with pytest.raises(TopologyError):
            compile_topology(topo, use_native=True)
        with pytest.raises(TopologyError):
            compile_topology(topo, use_native=False)


@requires_native
def test_large_random_trees_agree():
    rng = np.random.default_rng(0)
    for trial in range(5):
        n_edges = 200
        parents = [0]
        for k in range(1, n_edges):
            parents.append(int(rng.integers(0, k + 1)))
        topo = Topology.tree(0, parents, list(range(1, n_edges + 1)))
        s_n = compile_topology(topo, use_native=True)
        s_p = compile_topology(topo, use_native=False)
        np.testing.assert_array_equal(s_n.preorder, s_p.preorder)
        np.testing.assert_array_equal(s_n.depth, s_p.depth)
