"""Coupled shared-parameter solve: S scenarios jointly optimizing one
global theta (SURVEY 2.10(c); the distributed form of the reference's
theta/Schur path, helpers.cpp:376-407).

Each scenario is a double-integrator chain from its own initial state;
every node cost pulls toward the SHARED setpoint theta, so the joint
optimum balances theta across all scenarios — a consensus/estimation
pattern (e.g. fitting one physical parameter against many trajectories).
The scenarios live on vmap lanes (and mesh shards when a mesh is given):
the theta Schur complement and every scalar coupling psum-reduce across
them inside each interior-point iteration.

Run: JAX_PLATFORMS=cpu python examples/joint_theta_estimation.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

# the example asks for tol=1e-10, which needs fp64 (f32 stalls at ~1e-6
# and the SOLVED assertion below would fail)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import sip_optimal_control_tpu as soc
from sip_optimal_control_tpu.models import shared_theta_chain
from sip_optimal_control_tpu.parallel import solve_joint_theta


def main():
    spec, dims, topo, lower, upper = shared_theta_chain(horizon=20)
    S = 8
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.standard_normal((S, 2)))

    res = jax.jit(lambda b: solve_joint_theta(
        spec, dims, topo, b,
        settings=soc.Settings(max_iterations=60, tol=1e-10),
        lower=lower, upper=upper))(x0s)

    statuses = np.asarray(res.status)
    theta = np.asarray(res.vars.theta)
    print(f"statuses: {statuses} (0 = SOLVED)")
    print(f"shared theta* = {theta[0, 0]:.6f} "
          f"(bit-identical on every lane: {bool(np.all(theta == theta[0]))})")
    # each scenario alone would prefer a different theta — the joint
    # solve is a genuine compromise
    for s in range(3):
        solo = soc.solve(
            soc.build_problem(spec, dims, topo, initial_state=x0s[s],
                              lower=lower, upper=upper),
            soc.Settings(max_iterations=60, tol=1e-10))
        print(f"  scenario {s} alone would pick theta = "
              f"{float(solo.vars.theta[0]):.6f}")
    assert np.all(statuses == 0)


if __name__ == "__main__":
    main()
