"""Flat-vector interop tests: offsets match the reference layout, round
trips are exact, and the dense flat-coordinate KKT oracle agrees with the
stagewise condensed solve (the reference's dense cross-check pattern,
reference: tests/lqr_test.cpp:859-929 and types.cpp:24-64)."""

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import Dimensions, Topology, compile_topology
from sip_optimal_control_tpu.ops.kkt import (ConstraintMasks, kkt_factor,
                                             kkt_solve)
from sip_optimal_control_tpu.ops.flatten import (build_flat_layout,
                                                 dense_kkt_matrix,
                                                 flatten_kkt, flatten_primal,
                                                 unflatten_kkt,
                                                 unflatten_primal)
from test_kkt import make_regs, random_rhs, synthetic_model

VD = Dimensions(theta_dim=2, state_dims=(2, 1, 3), control_dims=(1, 2),
                node_c_dims=(1, 0, 2), node_g_dims=(0, 2, 1),
                edge_c_dims=(1, 2), edge_g_dims=(2, 1))
VT = Topology.tree(0, [0, 0], [1, 2])


def test_offsets_match_reference_layout():
    # Hand-computed against populate_workspace_metadata
    # (reference: types.cpp:33-63) for VD.
    layout = build_flat_layout(VD)
    # primal: [x0(2), u0(1), x1(1), u1(2), x2(3), theta(2)]
    assert layout.x_state_offsets.tolist() == [0, 3, 6]
    assert layout.x_control_offsets.tolist() == [2, 4]
    assert layout.theta_offset == 9
    assert layout.x_dim == 11
    # y: [dyn0(2), nc0(1), dyn1(1), nc1(0), dyn2(3), nc2(2), ec0(1), ec1(2)]
    assert layout.y_dyn_offsets.tolist() == [0, 3, 4]
    assert layout.y_node_c_offsets.tolist() == [2, 4, 7]
    assert layout.y_edge_c_offsets.tolist() == [9, 10]
    assert layout.y_dim == 12
    # z: [ng0(0), ng1(2), ng2(1), eg0(2), eg1(1)]
    assert layout.z_node_offsets.tolist() == [0, 0, 2]
    assert layout.z_edge_offsets.tolist() == [3, 5]
    assert layout.z_dim == 6


def test_primal_roundtrip_variable_dims():
    rng = np.random.default_rng(0)
    layout = build_flat_layout(VD)
    masks = ConstraintMasks.build(VD)
    x = jnp.asarray(rng.standard_normal((3, 3)) * masks.state)
    u = jnp.asarray(rng.standard_normal((2, 2)) * masks.control)
    th = jnp.asarray(rng.standard_normal(2))
    flat = flatten_primal(layout, x, u, th)
    assert flat.shape == (11,)
    x2, u2, th2 = unflatten_primal(layout, flat)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x))
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u))
    np.testing.assert_allclose(np.asarray(th2), np.asarray(th))


def test_kkt_roundtrip_and_batching():
    rng = np.random.default_rng(1)
    layout = build_flat_layout(VD)
    masks = ConstraintMasks.build(VD)
    v = random_rhs(VD, masks, rng)
    flat = flatten_kkt(layout, v)
    assert flat.shape == (layout.kkt_dim,)
    v2 = unflatten_kkt(layout, flat)
    for name in ("x", "u", "theta", "y_dyn", "y_nc", "y_ec", "z_n", "z_e"):
        np.testing.assert_allclose(np.asarray(getattr(v2, name)),
                                   np.asarray(getattr(v, name)))
    # vmaps over a leading batch axis
    batch = jax.vmap(lambda vv: flatten_kkt(layout, vv))(
        jax.tree.map(lambda a: jnp.stack([a, 2 * a]), v))
    np.testing.assert_allclose(np.asarray(batch[1]), 2 * np.asarray(flat))


def test_dense_flat_kkt_matches_stagewise_solve():
    """Materialize K in flat coordinates, solve densely, compare with the
    condensed stagewise kkt_solve — including the theta Schur path."""
    rng = np.random.default_rng(2)
    sched = compile_topology(VT)
    masks = ConstraintMasks.build(VD)
    layout = build_flat_layout(VD)
    model = synthetic_model(VD, VT, rng)
    regs = make_regs(VD, masks, rng)
    rhs = random_rhs(VD, masks, rng)

    K = np.asarray(dense_kkt_matrix(layout, model, regs, sched))
    np.testing.assert_allclose(K, K.T, atol=1e-12)

    flat_rhs = np.asarray(flatten_kkt(layout, rhs))
    dense_sol = np.linalg.solve(K, flat_rhs)

    fact, sol = jax.jit(lambda mo, rg, rh: (lambda f: (
        f, kkt_solve(f, mo, rh, sched)))(
            kkt_factor(mo, rg, masks, sched)))(model, regs, rhs)
    assert int(fact.status) == 0
    np.testing.assert_allclose(np.asarray(flatten_kkt(layout, sol)),
                               dense_sol, atol=1e-9)
