"""Topology/dimension validation and schedule-compilation tests
(reference: tests/lqr_test.cpp:931-980, tests/variable_dimensions_test.cpp:183-224)."""

import numpy as np
import pytest

from sip_optimal_control_tpu import (Dimensions, InputValidationStatus,
                                     Topology, TopologyError, compile_topology,
                                     try_compile_topology, validate_input)
from sip_optimal_control_tpu.types import FactorStatus


def test_chain_schedule():
    sched = compile_topology(Topology.chain(3))
    np.testing.assert_array_equal(sched.preorder, [0, 1, 2, 3])
    np.testing.assert_array_equal(sched.postorder, [3, 2, 1, 0])
    np.testing.assert_array_equal(sched.depth, [0, 1, 2, 3])
    assert sched.topology.is_chain


def test_multi_child_schedule():
    """White-box CSR/order check (reference: lqr_test.cpp:931-953)."""
    topo = Topology.tree(0, [0, 0, 1], [1, 2, 3])
    sched = compile_topology(topo)
    np.testing.assert_array_equal(sched.child_offsets, [0, 2, 3, 3, 3])
    np.testing.assert_array_equal(sched.child_edges, [0, 1, 2])
    np.testing.assert_array_equal(sched.preorder, [0, 1, 3, 2])
    np.testing.assert_array_equal(sched.postorder, [2, 3, 1, 0])
    assert [list(l) for l in sched.levels_nodes] == [[0], [1, 2], [3]]


def test_invalid_topologies():
    with pytest.raises(TopologyError):
        compile_topology(Topology.tree(0, [0, 1], [2, 2]))  # in-degree 2
    with pytest.raises(TopologyError):
        compile_topology(Topology.tree(0, [1], [1]))  # self loop
    with pytest.raises(TopologyError):
        compile_topology(Topology.tree(0, [2], [1]))  # disconnected/cycle
    sched, status = try_compile_topology(Topology.tree(0, [0, 1], [2, 2]))
    assert sched is None and status == FactorStatus.INVALID_TOPOLOGY


def test_validate_input():
    dims = Dimensions(theta_dim=2, state_dims=(2, 1, 3),
                      control_dims=(1, 2), node_c_dims=(0, 1, 0),
                      node_g_dims=(1, 0, 2), edge_c_dims=(2, 1),
                      edge_g_dims=(1, 3))
    chain = Topology.chain(2)
    assert validate_input(dims, chain) == InputValidationStatus.SUCCESS
    tree = Topology.tree(0, [0, 0], [1, 2])
    assert validate_input(dims, tree) == InputValidationStatus.SUCCESS
    dag = Topology.tree(0, [0, 1], [2, 2])
    assert validate_input(dims, dag) == InputValidationStatus.INVALID_TOPOLOGY
    bad_dims = Dimensions(theta_dim=2, state_dims=(2, 1, 3),
                          control_dims=(1, 2), node_c_dims=(0, 1, 0),
                          node_g_dims=(1, 0, 2), edge_c_dims=(-1, 1),
                          edge_g_dims=(1, 3))
    assert (validate_input(bad_dims, tree)
            == InputValidationStatus.INVALID_DIMENSIONS)


def test_dimension_aggregates():
    dims = Dimensions.uniform(num_edges=2, state_dim=2, control_dim=1,
                              node_c_dim=1, node_g_dim=2, edge_c_dim=3,
                              edge_g_dim=1, theta_dim=2)
    assert dims.stagewise_x_dim == 2 * (2 + 1) + 2
    assert dims.x_dim == dims.stagewise_x_dim + 2
    assert dims.y_dim == 3 * 2 + 3 * 1 + 2 * 3
    assert dims.z_dim == 3 * 2 + 2 * 1
    assert dims.stagewise_kkt_dim == dims.stagewise_x_dim + dims.y_dim \
        + dims.z_dim
    assert dims.is_uniform
