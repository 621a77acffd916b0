"""Receding-horizon quadrotor MPC with warm starting, 100 re-solves
(BASELINE config 4).  The whole closed loop — solver included — is one
jitted lax.scan.

Run: JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python examples/quadrotor_mpc.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

import sip_optimal_control_tpu as soc
from sip_optimal_control_tpu.models import planar_quadrotor
from sip_optimal_control_tpu.mpc import run_mpc


def main():
    spec, dims, topo, lower, upper, hover = planar_quadrotor(
        horizon=20, target=[1.0, 1.5])
    x0 = jnp.zeros(6).at[0].set(-0.5)       # start displaced, at rest

    f64 = jnp.result_type(float) == jnp.float64
    settings = (soc.Settings(max_iterations=25, tol=1e-6) if f64 else
                soc.Settings(max_iterations=25, tol=1e-3, mu_min=1e-5,
                             reg_floor=1e-5, prox_reg=1e-5))
    trace = run_mpc(spec, dims, topo, x0, n_steps=100, settings=settings,
                    lower=lower, upper=upper)

    states = np.asarray(trace.states)
    iters = np.asarray(trace.iterations)
    print(f"100 warm-started re-solves: all solved = "
          f"{bool(np.all(np.asarray(trace.statuses) == 0))}")
    print(f"mean iterations/solve {iters.mean():.2f} "
          f"(first solve {iters[0]}, steady-state {iters[20:].mean():.2f} "
          f"— warm starting pays)")
    err = np.linalg.norm(states[-1, :2] - np.array([1.0, 1.5]))
    print(f"final position error {err:.4f} m; "
          f"max |phi| {np.abs(states[:, 2]).max():.3f} rad")


if __name__ == "__main__":
    main()
