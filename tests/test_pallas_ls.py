"""Fused Pallas line-search probe tests (interpret mode on CPU).

The kernel evaluates all chunk candidates of the LS probe with the
scenario batch on the vector lanes (ops/pallas_ls.py); these tests check
it against the pure-JAX reference probe on every eligible bench model,
the eligibility gate itself, and (in an f32 subprocess, since this suite
runs x64) the end-to-end solver parity fused-vs-standard.
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import build_problem
from sip_optimal_control_tpu.models import (cartpole_swingup,
                                            planar_quadrotor,
                                            robust_scenario_tree,
                                            synthetic_chain)
from sip_optimal_control_tpu.ops.pallas_ls import (_probe_pallas_batched,
                                                   _probe_reference)


def _random_probe_inputs(rng, dims, B=8, chunk=6):
    N, E = dims.num_nodes, dims.num_edges
    n, m = dims.max_state_dim, dims.max_control_dim
    f32 = np.float32
    return (jnp.asarray(rng.standard_normal((B, N, n)), f32),
            jnp.asarray(0.1 * rng.standard_normal((B, N, n)), f32),
            jnp.asarray(rng.standard_normal((B, E, m)), f32),
            jnp.asarray(0.1 * rng.standard_normal((B, E, m)), f32),
            jnp.asarray(rng.standard_normal((B, n)), f32),
            jnp.asarray(np.abs(rng.random((B, chunk))) * 0.3, f32))


def test_probe_kernel_matches_reference_all_models():
    """Kernel vs pure-JAX probe on every eligible chain model, including
    the matmul-carrying chain16 dynamics and the quadrotor's asymmetric
    control bounds (f32 relative tolerance)."""
    rng = np.random.default_rng(0)
    for model in (cartpole_swingup, planar_quadrotor, synthetic_chain):
        spec, dims, topo, lower, upper, x0 = model(horizon=8)
        prob = build_problem(spec, dims, topo, initial_state=x0,
                             lower=lower, upper=upper)
        assert prob.fused_ls is not None, model.__name__
        fspec, fbounds, _ = prob.fused_ls
        args = _random_probe_inputs(rng, dims)
        out_k = _probe_pallas_batched(fspec, fbounds, *args,
                                      interpret=True)
        out_r = jax.vmap(lambda *a: _probe_reference(
            fspec, fbounds, *a))(*args)
        for name, a, b in zip(("f", "theta", "logb"), out_k, out_r):
            a, b = np.asarray(a), np.asarray(b)
            # random probe points violate bounds on some candidates: both
            # paths emit -inf there (ADVICE r4 parity) — require the inf
            # patterns to MATCH, compare finite entries numerically
            assert np.array_equal(np.isneginf(a), np.isneginf(b)), \
                (model.__name__, name)
            fin = np.isfinite(b)
            err = np.max(np.abs(a[fin] - b[fin]) / (1.0 + np.abs(b[fin])),
                         initial=0.0)
            assert err < 2e-5, (model.__name__, name, err)


def test_probe_handles_nonuniform_batch_padding():
    """Batch sizes that are not a multiple of the 1024-lane block are
    padded with inert alpha=0 lanes; outputs match the reference."""
    spec, dims, topo, lower, upper, x0 = cartpole_swingup(horizon=5)
    prob = build_problem(spec, dims, topo, initial_state=x0,
                         lower=lower, upper=upper)
    fspec, fbounds, _ = prob.fused_ls
    rng = np.random.default_rng(1)
    args = _random_probe_inputs(rng, dims, B=5, chunk=3)
    out_k = _probe_pallas_batched(fspec, fbounds, *args, interpret=True)
    out_r = jax.vmap(lambda *a: _probe_reference(
        fspec, fbounds, *a))(*args)
    for a, b in zip(out_k, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_eligibility_gate():
    """Constraint-bearing models are ineligible; chain models get the
    chain spec, trees the per-stage baked-index tree spec (r5)."""
    from sip_optimal_control_tpu import Dimensions, ModelSpec, Topology
    from sip_optimal_control_tpu.ops.pallas_ls import TreeLSSpec

    # tree -> eligible via TreeLSSpec (stage fns index closures by i,
    # which the baked-index tracing folds away)
    spec, dims, topo, lower, upper, x0 = robust_scenario_tree(
        t_shared=1, n_branches=2, t_branch=2)
    prob = build_problem(spec, dims, topo, initial_state=x0,
                         lower=lower, upper=upper)
    assert prob.fused_ls is not None
    assert isinstance(prob.fused_ls[0], TreeLSSpec)

    # inequality constraints -> ineligible
    dims2 = Dimensions(theta_dim=0, state_dims=(1, 1), control_dims=(1,),
                       node_c_dims=(0, 0), node_g_dims=(0, 0),
                       edge_c_dims=(0,), edge_g_dims=(1,))
    spec2 = ModelSpec(dynamics=lambda x, u, th, i: x + u,
                      edge_ineq=lambda x, u, th, i: u - 1.0)
    prob2 = build_problem(spec2, dims2, Topology.chain(1),
                          initial_state=jnp.asarray([1.0]))
    assert prob2.fused_ls is None

    # nonzero DECLARED inequality dims with default zero-fns still carry
    # slack rows the fused probe cannot represent -> ineligible
    dims2b = Dimensions(theta_dim=0, state_dims=(1, 1), control_dims=(1,),
                        node_c_dims=(0, 0), node_g_dims=(1, 1),
                        edge_c_dims=(0,), edge_g_dims=(0,))
    spec2b = ModelSpec(dynamics=lambda x, u, th, i: x + u)
    prob2b = build_problem(spec2b, dims2b, Topology.chain(1),
                           initial_state=jnp.asarray([1.0]))
    assert prob2b.fused_ls is None

    # plain chain -> eligible
    spec3, dims3, topo3, lo3, up3, x03 = cartpole_swingup(horizon=3)
    prob3 = build_problem(spec3, dims3, topo3, initial_state=x03,
                          lower=lo3, upper=up3)
    assert prob3.fused_ls is not None


_E2E_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import bench
from sip_optimal_control_tpu import Settings
from sip_optimal_control_tpu.solver.settings import LineSearchSettings
from sip_optimal_control_tpu.solver.sip import Primal, YVec

spec, dims, topo, lower, upper, x0 = bench.get_model("cartpole", 10)
def settings(fused):
    return Settings(max_iterations=3, fixed_iterations=True, mu_init=3e-3,
                    tol=1e-3, mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5,
                    riccati_backend="scan",
                    line_search=LineSearchSettings(max_steps=6, chunk=6,
                                                   fused_probe=fused))
B, N, E = 8, dims.num_nodes, dims.num_edges
n, m = dims.max_state_dim, dims.max_control_dim
rng = np.random.default_rng(0)
x0s = jnp.asarray(np.tile(np.asarray(x0, np.float32), (B, 1))
                  + 0.1 * rng.standard_normal((B, n)).astype(np.float32))
wv = Primal(x=jnp.tile(x0s[:, None, :], (1, N, 1)),
            u=jnp.zeros((B, E, m), jnp.float32),
            theta=jnp.zeros((B, 0), jnp.float32))
wy = YVec(dyn=jnp.zeros((B, N, n), jnp.float32),
          nc=jnp.zeros((B, N, 0), jnp.float32),
          ec=jnp.zeros((B, E, 0), jnp.float32))
outs = {}
for fused in (False, True):
    step = bench.build_mpc_scan(spec, dims, topo, lower, upper,
                                settings(fused), "gauss_newton",
                                steps_per_call=3, noise=0.05, batch=B)
    outs[fused] = jax.block_until_ready(step(x0s, wv, wy))
for i, (a, b) in enumerate(zip(jax.tree.leaves(outs[False]),
                               jax.tree.leaves(outs[True]))):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=3e-4, atol=3e-4, err_msg=str(i))
print("E2E-PARITY-OK")
"""


def test_e2e_fused_probe_matches_standard_f32():
    """Full RTI MPC scan, fused vs standard probe, in an f32 subprocess
    (this suite runs x64, where the fused path deliberately disengages)."""
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run([sys.executable, "-c", _E2E_SCRIPT],
                            capture_output=True, text=True, timeout=900,
                            env=env, cwd=repo)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "E2E-PARITY-OK" in result.stdout


def test_tree_probe_kernel_matches_reference():
    """Tree-topology probe kernel (baked-index per-stage jaxprs, static
    parent/child unrolling) vs the pure-JAX tree reference on the robust
    scenario tree."""
    from sip_optimal_control_tpu.ops.pallas_ls import (
        _probe_pallas_batched_tree, _probe_reference_tree)

    spec, dims, topo, lower, upper, x0 = robust_scenario_tree(
        t_shared=2, n_branches=3, t_branch=3)
    prob = build_problem(spec, dims, topo, initial_state=x0,
                         lower=lower, upper=upper)
    tspec, tbounds, _ = prob.fused_ls
    rng = np.random.default_rng(3)
    args = _random_probe_inputs(rng, dims, B=8, chunk=5)
    out_k = _probe_pallas_batched_tree(tspec, tbounds, *args,
                                       interpret=True)
    out_r = jax.vmap(lambda *a: _probe_reference_tree(
        tspec, tbounds, *a))(*args)
    for name, a, b in zip(("f", "theta", "logb"), out_k, out_r):
        a, b = np.asarray(a), np.asarray(b)
        assert np.array_equal(np.isneginf(a), np.isneginf(b)), name
        fin = np.isfinite(b)
        err = np.max(np.abs(a[fin] - b[fin]) / (1.0 + np.abs(b[fin])),
                     initial=0.0)
        assert err < 2e-5, (name, err)
