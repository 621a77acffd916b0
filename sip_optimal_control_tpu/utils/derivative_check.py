"""Finite-difference derivative checker.

The reference's SIP core has a built-in derivative-check mode
(settings.logging.print_derivative_check_logs,
reference: tests/variable_dimensions_test.cpp:432); this is the equivalent
for autodiff or hand-supplied models: compare eval_model's first-order
operators (gradient, C, G, Lagrangian-Hessian H) against central finite
differences of the residual-only evaluation along random directions.
Run in float64 for meaningful tolerances.

The whole multi-direction check is one jitted program (directions vmapped),
so the checker costs a single compile + dispatch rather than dozens of
eager op-by-op dispatches.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kkt import (apply_C, apply_CT, apply_G, apply_GT, apply_H,
                       zero_kkt_vector)
from ..solver.sip import OCProblem, Primal, YVec, ZVec, _kkt_from_duals


def _dot(a, b):
    return sum(jnp.sum(x * y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _max_abs(*arrs) -> jax.Array:
    return jnp.max(jnp.stack(
        [jnp.max(jnp.abs(a), initial=0.0) for a in arrs]))


def check_derivatives(problem: OCProblem, vars: Primal, y: YVec, z: ZVec,
                      eps: float = 1e-6, num_directions: int = 3,
                      seed: int = 0) -> Dict[str, float]:
    """Returns max abs errors for {gradient, jacobian_c, jacobian_g,
    hessian}."""
    rng = np.random.default_rng(seed)
    dirs = Primal(
        x=jnp.asarray(rng.standard_normal(
            (num_directions,) + vars.x.shape), vars.x.dtype),
        u=jnp.asarray(rng.standard_normal(
            (num_directions,) + vars.u.shape), vars.u.dtype),
        theta=jnp.asarray(rng.standard_normal(
            (num_directions,) + vars.theta.shape), vars.theta.dtype))
    sched = problem.sched

    @jax.jit
    def run(vars, y, z, dirs):
        ev = problem.eval_model(vars, y, z)
        template = zero_kkt_vector(problem.dims, ev.grad.x.dtype)
        zero_y = YVec(dyn=jnp.zeros_like(template.y_dyn),
                      nc=jnp.zeros_like(template.y_nc),
                      ec=jnp.zeros_like(template.y_ec))
        zero_z = ZVec(n=jnp.zeros_like(template.z_n),
                      e=jnp.zeros_like(template.z_e))

        def lag_grad_full(e):
            duals = _kkt_from_duals(template, y, z)
            ct = apply_CT(e.stage, duals, sched)
            gt = apply_GT(e.stage, duals, sched)
            return Primal(x=e.grad.x + ct.x + gt.x,
                          u=e.grad.u + ct.u + gt.u,
                          theta=e.grad.theta + ct.theta + gt.theta)

        def one(d):
            vp = jax.tree.map(lambda a, b: a + eps * b, vars, d)
            vm = jax.tree.map(lambda a, b: a - eps * b, vars, d)
            fp, cp, gp = problem.eval_fcg(vp)
            fm, cm, gm = problem.eval_fcg(vm)

            # gradient . d  vs  (f(v+) - f(v-)) / 2eps
            fd_grad = (fp - fm) / (2 * eps)
            e_grad = jnp.abs(_dot(ev.grad, d) - fd_grad)

            # C d / G d  vs  central differences of the residuals
            dkkt = _kkt_from_duals(template, zero_y, zero_z)
            dkkt = dataclasses.replace(dkkt, x=d.x, u=d.u, theta=d.theta)
            cd = apply_C(ev.stage, dkkt, sched)
            fd_c = jax.tree.map(lambda a, b: (a - b) / (2 * eps), cp, cm)
            e_c = _max_abs(cd.y_dyn - fd_c.dyn, cd.y_nc - fd_c.nc,
                           cd.y_ec - fd_c.ec)

            gd = apply_G(ev.stage, dkkt, sched)
            fd_g = jax.tree.map(lambda a, b: (a - b) / (2 * eps), gp, gm)
            e_g = _max_abs(gd.z_n - fd_g.n, gd.z_e - fd_g.e)

            # H d  vs  FD of the Lagrangian gradient (G^T z included)
            evp = problem.eval_model(vp, y, z)
            evm = problem.eval_model(vm, y, z)
            hd = apply_H(ev.stage, dkkt, sched)
            fd_h = jax.tree.map(lambda a, b: (a - b) / (2 * eps),
                                lag_grad_full(evp), lag_grad_full(evm))
            e_h = _max_abs(hd.x - fd_h.x, hd.u - fd_h.u,
                           hd.theta - fd_h.theta)
            return jnp.stack([e_grad, e_c, e_g, e_h])

        return jnp.max(jax.vmap(one)(dirs), axis=0)

    out = np.asarray(run(vars, y, z, dirs))
    return {"gradient": float(out[0]), "jacobian_c": float(out[1]),
            "jacobian_g": float(out[2]), "hessian": float(out[3])}
