"""Whole-iteration fusion tests (ops/fused_iter.py + solver/fused_chain.py).

Kernel-level parity runs the Pallas kernels in interpret mode against the
pure-JAX reference implementations on every eligible bench model
(explicit-W n<8, Gram n=16, Gauss-Newton and exact Hessians); the
end-to-end test runs the full fused-iteration RTI MPC scan against the
standard solver in an f32 subprocess (this suite is x64, where the fused
path deliberately disengages).
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
from sip_optimal_control_tpu.ops import fused_iter as FI


def _spec_for(model, T, mode):
    spec_m, dims, topo, lower, upper, x0 = model(horizon=T)
    n, m = dims.max_state_dim, dims.max_control_dim
    spec = FI.build_fused_iter_spec(spec_m.dynamics, spec_m.node_cost,
                                    spec_m.edge_cost, T, n, m, mode)
    return spec, n, m


def _rand_iterates(rng, B, T, n, m):
    f32 = np.float32
    return (jnp.asarray(0.5 * rng.standard_normal((B, T + 1, n)), f32),
            jnp.asarray(0.5 * rng.standard_normal((B, T, m)), f32),
            jnp.asarray(0.1 * rng.standard_normal((B, T + 1, n)), f32))


def test_eval_kernel_matches_reference():
    rng = np.random.default_rng(0)
    for model, mode in ((cartpole_swingup, "gauss_newton"),
                        (planar_quadrotor, "exact")):
        T = 6
        spec_m, dims, topo, lower, upper, _x0 = model(horizon=T)
        n, m = dims.max_state_dim, dims.max_control_dim
        spec = FI.build_fused_iter_spec(
            spec_m.dynamics, spec_m.node_cost, spec_m.edge_cost, T, n, m,
            mode)
        assert spec is not None, model.__name__
        bounds = (np.asarray(lower.u)[0], np.asarray(upper.u)[0],
                  np.asarray(lower.x)[0], np.asarray(upper.x)[0])
        B = 8
        f32 = np.float32
        x, u, y = _rand_iterates(rng, B, T, n, m)
        x0 = jnp.asarray(rng.standard_normal((B, n)), f32)
        zlx = jnp.asarray(rng.random((B, T + 1, n)), f32)
        zlu = jnp.asarray(rng.random((B, T, m)), f32)
        zux = jnp.asarray(rng.random((B, T + 1, n)), f32)
        zuu = jnp.asarray(rng.random((B, T, m)), f32)
        out_k = FI._eval_batched(spec, bounds, x, u, y, x0, zlx, zlu,
                                 zux, zuu, interpret=True)
        out_r = jax.vmap(lambda *a: FI._eval_reference(
            spec, bounds, *a))(x, u, y, x0, zlx, zlu, zux, zuu)
        for name, a, b in zip(("f", "gx", "gu", "ctx", "ctu", "cdyn",
                               "res"), out_k, out_r):
            a, b = np.asarray(a), np.asarray(b)
            fin = np.isfinite(b)
            assert np.array_equal(np.isfinite(a), fin), (name,)
            err = np.max(np.abs(a[fin] - b[fin]) / (1.0 + np.abs(b[fin])),
                         initial=0.0)
            assert err < 2e-5, (model.__name__, name, err)


def test_factor_solve_kernels_match_reference():
    """The fused factor+solve chain vs autodiff + the scan backend, on
    the explicit-W (n=4, n=6) and Gram (n=16) kernel variants and both
    Hessian modes."""
    rng = np.random.default_rng(1)
    for model, mode, tol in ((cartpole_swingup, "gauss_newton", 2e-5),
                             (planar_quadrotor, "exact", 5e-5),
                             (synthetic_chain, "gauss_newton", 2e-4)):
        T = 4
        spec, n, m = _spec_for(model, T, mode)
        assert spec is not None, model.__name__
        B = 8
        f32 = np.float32
        x, u, y = _rand_iterates(rng, B, T, n, m)
        r1x = jnp.asarray(0.5 + rng.random((B, T + 1, n)), f32)
        r1u = jnp.asarray(0.5 + rng.random((B, T, m)), f32)
        delta = jnp.asarray(np.full(B, 0.01), f32)
        q = jnp.asarray(rng.standard_normal((B, T + 1, n)), f32)
        r = jnp.asarray(rng.standard_normal((B, T, m)), f32)
        c = jnp.asarray(rng.standard_normal((B, T + 1, n)), f32)
        sk = FI._factor_solve_batched(spec, x, u, y, r1x, r1u, delta,
                                      q, r, c, interpret=True)
        sr = jax.vmap(lambda *a: FI._factor_solve_reference(spec, *a))(
            x, u, y, r1x, r1u, delta, q, r, c)
        for name, a, b in zip(("dx", "du", "dy"), sk[:3], sr[:3]):
            a, b = np.asarray(a), np.asarray(b)
            err = np.max(np.abs(a - b) / (1.0 + np.abs(b)))
            assert err < tol, (model.__name__, name, err)
        assert np.array_equal(np.asarray(sk[3]), np.asarray(sr[3]))
        assert np.all(np.asarray(sr[3]) == 0)  # well-conditioned inputs


def test_eligibility_and_dispatch():
    """Trees / constraint problems / x64 fall back to the standard
    solver; the fused payload exists exactly for the fused-LS class."""
    from sip_optimal_control_tpu import Settings
    from sip_optimal_control_tpu.solver.fused_chain import _eligible

    spec, dims, topo, lower, upper, x0 = cartpole_swingup(horizon=5)
    prob = build_problem(spec, dims, topo, initial_state=x0, lower=lower,
                         upper=upper)
    assert prob.fused_iter is not None
    st = Settings(fused_iteration=True)
    # this suite runs x64 -> ineligible (f32 only)
    assert not _eligible(prob, st, None)
    # tree -> no payload
    rspec, rdims, rtopo, rlo, rup, rx0 = robust_scenario_tree(
        t_shared=1, n_branches=2, t_branch=2)
    rprob = build_problem(rspec, rdims, rtopo, initial_state=rx0,
                          lower=rlo, upper=rup)
    assert rprob.fused_iter is None
    # solve() with the flag on an ineligible problem still works
    res = jax.jit(lambda: __import__(
        "sip_optimal_control_tpu").solve(rprob, Settings(
            max_iterations=3, fused_iteration=True)))()
    assert np.asarray(res.status).shape == ()


_E2E_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import bench
import sip_optimal_control_tpu.ops.fused_iter as FI
FI.INTERPRET_OVERRIDE = True
from sip_optimal_control_tpu import Settings
from sip_optimal_control_tpu.solver.settings import LineSearchSettings
from sip_optimal_control_tpu.solver.sip import Primal, YVec

spec, dims, topo, lower, upper, x0 = bench.get_model("cartpole", 10)
def settings(fused):
    return Settings(max_iterations=3, fixed_iterations=True, mu_init=3e-3,
                    tol=1e-3, mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5,
                    max_factor_retries=0, fused_iteration=fused,
                    riccati_backend="scan",
                    line_search=LineSearchSettings(
                        max_steps=6, chunk=6, fused_probe=True,
                        use_filter_line_search=True))
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
for hess in ("gauss_newton", "exact"):
    outs = {}
    for fused in (False, True):
        step = bench.build_mpc_scan(spec, dims, topo, lower, upper,
                                    settings(fused), hess,
                                    steps_per_call=3, noise=0.05, batch=B)
        outs[fused] = jax.block_until_ready(step(x0s, wv, wy))
    # statuses identical; iterates within compounded f32 drift
    np.testing.assert_array_equal(np.asarray(outs[False][3]),
                                  np.asarray(outs[True][3]),
                                  err_msg=hess)
    for i, (a, b) in enumerate(zip(jax.tree.leaves(outs[False][:3]),
                                   jax.tree.leaves(outs[True][:3]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"{hess}:{i}")
print("FUSED-ITER-E2E-OK")
"""


def test_e2e_fused_iteration_matches_standard_f32():
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(repo, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.3"
    result = subprocess.run([sys.executable, "-c", _E2E_SCRIPT],
                            capture_output=True, text=True, timeout=900,
                            env=env, cwd=repo)
    assert result.returncode == 0, result.stderr[-3000:]
    assert "FUSED-ITER-E2E-OK" in result.stdout
