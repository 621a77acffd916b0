"""Diagnose warm-re-solve failures under plant disturbance (bench workload).

Runs the bench MPC step on CPU/f32 with a small batch, one step per
dispatch, and prints per-step status counts plus details of stuck
scenarios.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sip_optimal_control_tpu import Settings, build_problem, solve
from sip_optimal_control_tpu.models import cartpole_swingup
from sip_optimal_control_tpu.mpc import _shift_warm_start
from sip_optimal_control_tpu.solver.sip import Primal

BATCH = int(os.environ.get("DIAG_BATCH", 64))
STEPS = int(os.environ.get("DIAG_STEPS", 30))
NOISE = float(os.environ.get("DIAG_NOISE", 0.05))
WARM_ITERS = int(os.environ.get("DIAG_WARM_ITERS", 12))
WARM_MU = float(os.environ.get("DIAG_WARM_MU", 1e-4))

spec, dims, topo, lower, upper, x0 = cartpole_swingup(horizon=50)
f32 = dict(tol=1e-3, mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5)
cold_settings = Settings(max_iterations=100, **f32)
warm_settings = Settings(max_iterations=WARM_ITERS, mu_init=WARM_MU,
                         warm_bound_push=float(
                             os.environ.get("DIAG_WPUSH", 1e-6)),
                         reg_boost_scale=float(
                             os.environ.get("DIAG_BOOST", 100.0)),
                         **f32)
theta0 = jnp.zeros((dims.theta_dim,), jnp.float32)
N = dims.num_nodes


HESS = os.environ.get("DIAG_HESS", "exact")


def make_step(settings):
    def one(x0_i, warm_vars, warm_y):
        problem = build_problem(spec, dims, topo, initial_state=x0_i,
                                lower=lower, upper=upper,
                                hessian_mode=HESS)
        res = solve(problem, settings, init_vars=warm_vars, init_y=warm_y)
        usable = ((res.status == 0)
                  | ((res.status == 1) & (res.kkt_error < 1e2))) \
            & jnp.isfinite(res.kkt_error) \
            & jnp.all(jnp.isfinite(res.vars.x)) \
            & jnp.all(jnp.isfinite(res.vars.u))
        u0 = jnp.where(usable, res.vars.u[0], jnp.zeros_like(res.vars.u[0]))
        x_next = spec.dynamics(x0_i, u0, theta0, 0)
        sh_vars, sh_y = _shift_warm_start(res.vars, res.y)
        reset_vars = Primal(x=jnp.tile(x_next[None], (N, 1)),
                            u=jnp.zeros_like(sh_vars.u),
                            theta=sh_vars.theta * 0)
        next_vars = jax.tree.map(lambda a, b: jnp.where(usable, a, b),
                                 sh_vars, reset_vars)
        next_y = jax.tree.map(
            lambda a: jnp.where(usable, a, jnp.zeros_like(a)), sh_y)
        return (x_next, next_vars, next_y, res.status, res.iterations,
                res.kkt_error)
    return jax.jit(jax.vmap(one))


rng = np.random.default_rng(0)
x0s = np.tile(np.asarray(x0, np.float32), (BATCH, 1))
x0s += 0.1 * rng.standard_normal((BATCH, 4)).astype(np.float32)
x0s = jnp.asarray(x0s)

cold = make_step(cold_settings)
warm = make_step(warm_settings)
x, wv, wy, st, it, kk = jax.block_until_ready(cold(x0s, None, None))
print(f"cold: solved {int(np.sum(np.asarray(st) == 0))}/{BATCH} "
      f"mean_iters {float(np.mean(np.asarray(it))):.1f}")

drng = np.random.default_rng(12345)
hist = np.zeros((STEPS, BATCH), np.int32)
iters_h = np.zeros((STEPS, BATCH), np.int32)
kkt_h = np.zeros((STEPS, BATCH), np.float64)
states_h = np.zeros((STEPS, BATCH, 4), np.float64)
for t in range(STEPS):
    x, wv, wy, st, it, kk = jax.block_until_ready(warm(x, wv, wy))
    d = NOISE * drng.standard_normal((BATCH, 4)).astype(np.float32)
    x = x + jnp.asarray(d)
    hist[t] = np.asarray(st)
    iters_h[t] = np.asarray(it)
    kkt_h[t] = np.asarray(kk)
    states_h[t] = np.asarray(x)
    counts = {int(v): int(c) for v, c in
              zip(*np.unique(hist[t], return_counts=True))}
    print(f"step {t:3d}: statuses {counts} max_iter_batch "
          f"{int(np.max(iters_h[t]))}")

solved_frac = float(np.mean(hist == 0))
late = hist[-30:]
print(f"\nsolved_frac {solved_frac:.4f}  "
      f"late30_solved {float(np.mean(late == 0)):.4f}  "
      f"late30_status_counts "
      f"{ {int(v): int(c) for v, c in zip(*np.unique(late, return_counts=True))} }  "
      f"late30_mean_iters {float(np.mean(iters_h[-30:])):.2f}")
bad = np.where(np.any(hist != 0, axis=0))[0]
print(f"scenarios ever-unsolved: {bad[:20]} (n={len(bad)})")
for b in bad[:5]:
    steps_bad = np.where(hist[:, b] != 0)[0]
    print(f"  scn {b}: bad at steps {steps_bad[:12]} "
          f"statuses {hist[steps_bad[:12], b]} "
          f"kkt {kkt_h[steps_bad[:12], b]}")
    t0 = int(steps_bad[0])
    print(f"    state at first failure: {states_h[t0, b]}")
