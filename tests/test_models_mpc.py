"""Model-library and MPC-loop tests (BASELINE configs 3 and 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import (Settings, SIPStatus, build_problem,
                                     solve)
from sip_optimal_control_tpu.models import (cartpole_swingup,
                                            double_integrator,
                                            planar_quadrotor)
from sip_optimal_control_tpu.mpc import run_mpc, run_mpc_timed


def test_cartpole_swingup_solves():
    """BASELINE config 3: cartpole swing-up, horizon 50, box inputs."""
    spec, dims, topo, lower, upper, x0 = cartpole_swingup()
    problem = build_problem(spec, dims, topo, initial_state=x0,
                            lower=lower, upper=upper)
    res = jax.jit(lambda: solve(problem, Settings(max_iterations=200)))()
    assert int(res.status) == SIPStatus.SOLVED
    xf = np.asarray(res.vars.x[-1])
    assert abs(xf[2]) < 0.05          # pole upright
    u = np.asarray(res.vars.u)
    assert np.all(np.abs(u) <= 10.0 + 1e-7)
    assert np.any(np.abs(u) > 9.0)    # saturates during the swing


def test_quadrotor_mpc_tracks_target():
    """BASELINE config 4 (reduced steps for CI): receding-horizon quadrotor
    MPC with warm starting."""
    spec, dims, topo, lower, upper, hover = planar_quadrotor(
        horizon=15, target=jnp.asarray([1.0, 1.0]))
    x0 = jnp.zeros(6)
    trace = jax.jit(lambda: run_mpc(
        spec, dims, topo, x0, n_steps=40,
        settings=Settings(max_iterations=30, tol=1e-6),
        lower=lower, upper=upper))()
    assert np.all(np.asarray(trace.statuses) == SIPStatus.SOLVED)
    final = np.asarray(trace.states[-1])
    assert abs(final[0] - 1.0) < 0.05 and abs(final[1] - 1.0) < 0.05
    # warm starting keeps late-loop iteration counts low
    iters = np.asarray(trace.iterations)
    assert iters[-10:].mean() <= iters[0]


def test_mpc_timed_wall_clock_budget():
    """run_mpc_timed: the dispatch-level `timeout_callback` equivalent
    (reference: sip_optimal_control/types.hpp:139-140).  A zero budget
    issues no steps beyond the first deadline check; a generous budget
    completes all steps and matches run_mpc's closed loop."""
    spec, dims, topo, lower, upper, _ = planar_quadrotor(horizon=10)
    x0 = jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.0, 0.0])
    settings = Settings(max_iterations=25, tol=1e-6)

    full = run_mpc_timed(spec, dims, topo, x0, max_steps=6,
                         time_budget_s=600.0, settings=settings,
                         lower=lower, upper=upper)
    assert full.controls.shape[0] == 6
    assert np.all(np.asarray(full.statuses) == SIPStatus.SOLVED)
    ref = run_mpc(spec, dims, topo, x0, n_steps=6, settings=settings,
                  lower=lower, upper=upper)
    np.testing.assert_allclose(np.asarray(full.states),
                               np.asarray(ref.states), atol=1e-8)

    cut = run_mpc_timed(spec, dims, topo, x0, max_steps=6,
                        time_budget_s=0.0, settings=settings,
                        lower=lower, upper=upper)
    assert cut.controls.shape[0] == 0


def test_mpc_batched_scenarios():
    spec, dims, topo, lower, upper, _ = planar_quadrotor(horizon=10)
    x0s = jnp.asarray([
        [0.5, 0.0, 0.0, 0.0, 0.0, 0.0],
        [-0.5, 0.3, 0.1, 0.0, 0.0, 0.0],
    ])
    trace = jax.jit(jax.vmap(lambda x0: run_mpc(
        spec, dims, topo, x0, n_steps=10,
        settings=Settings(max_iterations=25, tol=1e-6),
        lower=lower, upper=upper)))(x0s)
    assert np.all(np.asarray(trace.statuses) == SIPStatus.SOLVED)
    # both scenarios move toward the origin
    finals = np.asarray(trace.states[:, -1])
    starts = np.asarray(x0s)
    assert np.all(np.linalg.norm(finals[:, :2], axis=1)
                  < np.linalg.norm(starts[:, :2], axis=1))
