"""Newton-KKT condensation round-trip tests.

Mirrors the reference's integration oracle (reference:
tests/variable_dimensions_test.cpp:135-181): fill a synthetic model, factor
with randomized positive (w, r1, r2, r3), solve a random RHS, and verify
apply_K(solution) ~= rhs — covering chains, sibling-edge constraints,
zero-dimensional root states, and theta/Schur variables.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import (Dimensions, FactorStatus, Topology,
                                     compile_topology)
from sip_optimal_control_tpu.ops.kkt import (ConstraintMasks, KKTVector,
                                             Regularizations, StageModelData,
                                             apply_K, kkt_factor, kkt_solve,
                                             zero_kkt_vector)


def synthetic_model(dims: Dimensions, topo: Topology, rng,
                    theta_diag=6.0) -> StageModelData:
    """Random-but-well-posed stage data in the spirit of initialize_model
    (reference: variable_dimensions_test.cpp:77-133): SPD-dominant Hessians,
    small dense Jacobians, all padded entries zero."""
    masks = ConstraintMasks.build(dims)
    N, E = topo.num_nodes, topo.num_edges
    n = max(dims.max_state_dim, 1)
    m = max(dims.max_control_dim, 1)
    p = dims.theta_dim
    cn, ce = dims.max_node_c_dim, dims.max_edge_c_dim
    gn, ge = dims.max_node_g_dim, dims.max_edge_g_dim
    sm = masks.state.astype(float)
    cm = masks.control.astype(float)
    parent = np.asarray(topo.edge_parents)
    child = np.asarray(topo.edge_children)
    sm_par, sm_child = sm[parent], sm[child]

    def rand(shape, scale=1.0):
        return scale * rng.standard_normal(shape)

    def mask2(a, mr, mc):
        return a * mr[..., :, None] * mc[..., None, :]

    def spd(count, d, base):
        out = np.zeros((count, d, d))
        for i in range(count):
            s = 0.1 * rng.standard_normal((d, d))
            out[i] = s @ s.T + (base + 0.2 * i) * np.eye(d)
        return out

    Hxx_node = mask2(spd(N, n, 2.5), sm, sm)
    Hxx_edge = mask2(spd(E, n, 0.3), sm_par, sm_par)
    Huu_edge = mask2(spd(E, m, 3.0), cm, cm)
    Hthth_node = spd(N, p, theta_diag) if p else np.zeros((N, 0, 0))
    Hthth_edge = spd(E, p, theta_diag) if p else np.zeros((E, 0, 0))

    model = StageModelData(
        f_node=jnp.zeros(N), f_edge=jnp.zeros(E),
        df_dx_node=jnp.zeros((N, n)), df_dx_edge=jnp.zeros((E, n)),
        df_du=jnp.zeros((E, m)),
        dyn_res=jnp.zeros((E, n)),
        A=jnp.asarray(mask2(rand((E, n, n), 0.3), sm_child, sm_par)),
        B=jnp.asarray(mask2(rand((E, n, m), 0.4), sm_child, cm)),
        c_node=jnp.zeros((N, cn)),
        Jc_x_node=jnp.asarray(mask2(rand((N, cn, n), 0.2),
                                    masks.nc.astype(float), sm)),
        c_edge=jnp.zeros((E, ce)),
        Jc_x_edge=jnp.asarray(mask2(rand((E, ce, n), 0.2),
                                    masks.ec.astype(float), sm_par)),
        Jc_u_edge=jnp.asarray(mask2(rand((E, ce, m), 0.2),
                                    masks.ec.astype(float), cm)),
        g_node=jnp.zeros((N, gn)),
        Jg_x_node=jnp.asarray(mask2(rand((N, gn, n), 0.2),
                                    masks.ng.astype(float), sm)),
        g_edge=jnp.zeros((E, ge)),
        Jg_x_edge=jnp.asarray(mask2(rand((E, ge, n), 0.2),
                                    masks.eg.astype(float), sm_par)),
        Jg_u_edge=jnp.asarray(mask2(rand((E, ge, m), 0.2),
                                    masks.eg.astype(float), cm)),
        Hxx_node=jnp.asarray(Hxx_node), Hxx_edge=jnp.asarray(Hxx_edge),
        Hxu_edge=jnp.asarray(mask2(rand((E, n, m), 0.05), sm_par, cm)),
        Huu_edge=jnp.asarray(Huu_edge),
        df_dtheta_node=jnp.zeros((N, p)), df_dtheta_edge=jnp.zeros((E, p)),
        ddyn_dtheta=jnp.asarray(rand((E, n, p), 0.01) * sm_child[:, :, None]),
        Jc_th_node=jnp.asarray(
            rand((N, cn, p), 0.01) * masks.nc[:, :, None]),
        Jc_th_edge=jnp.asarray(
            rand((E, ce, p), 0.01) * masks.ec[:, :, None]),
        Jg_th_node=jnp.asarray(
            rand((N, gn, p), 0.01) * masks.ng[:, :, None]),
        Jg_th_edge=jnp.asarray(
            rand((E, ge, p), 0.01) * masks.eg[:, :, None]),
        Hxth_node=jnp.asarray(rand((N, n, p), 0.01) * sm[:, :, None]),
        Hxth_edge=jnp.asarray(rand((E, n, p), 0.01) * sm_par[:, :, None]),
        Huth_edge=jnp.asarray(rand((E, m, p), 0.01) * cm[:, :, None]),
        Hthth_node=jnp.asarray(Hthth_node),
        Hthth_edge=jnp.asarray(Hthth_edge),
    )
    return model


def make_regs(dims: Dimensions, masks: ConstraintMasks, rng,
              dtype=jnp.float64) -> Regularizations:
    """Randomized positive regularizations (cf. reference values w=1.3,
    r2=0.9, r3=0.4, r1 in [0.23, ...], variable_dimensions_test.cpp:143-150)."""
    N, E = dims.num_nodes, dims.num_edges

    def pos(shape, mask=None, lo=0.3, hi=1.5):
        v = lo + (hi - lo) * rng.random(shape)
        if mask is not None:
            v = v * mask
        return jnp.asarray(v, dtype)

    return Regularizations(
        w_n=pos((N, dims.max_node_g_dim), masks.ng),
        w_e=pos((E, dims.max_edge_g_dim), masks.eg),
        r1_x=pos((N, max(dims.max_state_dim, 1)), masks.state),
        r1_u=pos((E, max(dims.max_control_dim, 1)), masks.control),
        r1_th=pos((dims.theta_dim,)),
        r2_dyn=pos((N, max(dims.max_state_dim, 1)), masks.state),
        r2_nc=pos((N, dims.max_node_c_dim), masks.nc),
        r2_ec=pos((E, dims.max_edge_c_dim), masks.ec),
        r3_n=pos((N, dims.max_node_g_dim), masks.ng),
        r3_e=pos((E, dims.max_edge_g_dim), masks.eg),
    )


def random_rhs(dims: Dimensions, masks: ConstraintMasks, rng) -> KKTVector:
    v = zero_kkt_vector(dims)
    fields = dict(
        x=rng.standard_normal(v.x.shape) * masks.state,
        u=rng.standard_normal(v.u.shape) * masks.control,
        theta=rng.standard_normal(v.theta.shape),
        y_dyn=rng.standard_normal(v.y_dyn.shape) * masks.state,
        y_nc=rng.standard_normal(v.y_nc.shape) * masks.nc,
        y_ec=rng.standard_normal(v.y_ec.shape) * masks.ec,
        z_n=rng.standard_normal(v.z_n.shape) * masks.ng,
        z_e=rng.standard_normal(v.z_e.shape) * masks.eg,
    )
    return KKTVector(**{k: jnp.asarray(a) for k, a in fields.items()})


def expect_kkt_roundtrip(dims, topo, rng, tol=1e-9, theta_diag=6.0):
    sched = compile_topology(topo)
    masks = ConstraintMasks.build(dims)
    model = synthetic_model(dims, topo, rng, theta_diag)
    regs = make_regs(dims, masks, rng)
    rhs = random_rhs(dims, masks, rng)

    @jax.jit
    def run(model, regs, rhs):
        fact = kkt_factor(model, regs, masks, sched)
        sol = kkt_solve(fact, model, rhs, sched)
        product = apply_K(model, regs, sol, sched)
        return fact.status, (product - rhs).norm()

    status, err = run(model, regs, rhs)
    assert int(status) == FactorStatus.SUCCESS
    assert float(err) < tol, float(err)


def test_chain_with_node_and_edge_constraints():
    # reference: variable_dimensions_test.cpp:265-290
    dims = Dimensions(theta_dim=0, state_dims=(2, 1, 3),
                      control_dims=(1, 2), node_c_dims=(1, 0, 2),
                      node_g_dims=(0, 2, 1), edge_c_dims=(1, 2),
                      edge_g_dims=(2, 1))
    expect_kkt_roundtrip(dims, Topology.chain(2),
                         np.random.default_rng(10))


def test_sibling_edge_constraints():
    # reference: variable_dimensions_test.cpp:292-314
    dims = Dimensions(theta_dim=0, state_dims=(2, 1, 3),
                      control_dims=(1, 2), node_c_dims=(1, 0, 1),
                      node_g_dims=(1, 1, 0), edge_c_dims=(2, 1),
                      edge_g_dims=(1, 2))
    expect_kkt_roundtrip(dims, Topology.tree(0, [0, 0], [1, 2]),
                         np.random.default_rng(11))


def test_zero_dimensional_root():
    # reference: variable_dimensions_test.cpp:316-336
    dims = Dimensions(theta_dim=0, state_dims=(0, 1, 3),
                      control_dims=(1, 2), node_c_dims=(0, 0, 0),
                      node_g_dims=(0, 0, 0), edge_c_dims=(0, 0),
                      edge_g_dims=(0, 0))
    expect_kkt_roundtrip(dims, Topology.tree(0, [0, 0], [1, 2]),
                         np.random.default_rng(12))


def test_schur_theta_variables():
    # reference: variable_dimensions_test.cpp:338-363
    dims = Dimensions(theta_dim=2, state_dims=(2, 1, 3),
                      control_dims=(1, 2), node_c_dims=(1, 0, 1),
                      node_g_dims=(0, 1, 1), edge_c_dims=(1, 2),
                      edge_g_dims=(2, 1))
    expect_kkt_roundtrip(dims, Topology.tree(0, [0, 0], [1, 2]),
                         np.random.default_rng(13), tol=1e-8)


def test_uniform_chain_longer_horizon():
    dims = Dimensions.uniform(num_edges=10, state_dim=4, control_dim=2,
                              node_c_dim=2, node_g_dim=2, edge_c_dim=1,
                              edge_g_dim=3)
    expect_kkt_roundtrip(dims, Topology.chain(10), np.random.default_rng(14))


def test_theta_on_chain():
    dims = Dimensions.uniform(num_edges=5, state_dim=3, control_dim=2,
                              node_c_dim=1, node_g_dim=1, edge_c_dim=1,
                              edge_g_dim=1, theta_dim=3)
    expect_kkt_roundtrip(dims, Topology.chain(5), np.random.default_rng(15),
                         tol=1e-8)
