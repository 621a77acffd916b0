"""Finite-difference derivative checker.

The reference's SIP core has a built-in derivative-check mode
(settings.logging.print_derivative_check_logs,
reference: tests/variable_dimensions_test.cpp:432); this is the equivalent
for autodiff or hand-supplied models: compare eval_model's first-order
operators (gradient, C, G, Lagrangian-Hessian H) against central finite
differences of the residual-only evaluation along random directions.
Run in float64 for meaningful tolerances.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kkt import apply_C, apply_CT, apply_G, apply_H
from ..solver.sip import OCProblem, Primal, YVec, ZVec, _kkt_from_duals
from ..ops.kkt import zero_kkt_vector


def _rand_primal(like: Primal, rng) -> Primal:
    return Primal(
        x=jnp.asarray(rng.standard_normal(like.x.shape)),
        u=jnp.asarray(rng.standard_normal(like.u.shape)),
        theta=jnp.asarray(rng.standard_normal(like.theta.shape)))


def _dot(a, b):
    return sum(jnp.sum(x * y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def check_derivatives(problem: OCProblem, vars: Primal, y: YVec, z: ZVec,
                      eps: float = 1e-6, num_directions: int = 3,
                      seed: int = 0) -> Dict[str, float]:
    """Returns max abs errors for {gradient, jacobian_c, jacobian_g,
    hessian}."""
    rng = np.random.default_rng(seed)
    ev = problem.eval_model(vars, y, z)
    sched = problem.sched
    template = zero_kkt_vector(problem.dims, ev.grad.x.dtype)

    def fcg(v):
        return problem.eval_fcg(v)

    errs = {"gradient": 0.0, "jacobian_c": 0.0, "jacobian_g": 0.0,
            "hessian": 0.0}
    for _ in range(num_directions):
        d = _rand_primal(vars, rng)
        vp = jax.tree.map(lambda a, b: a + eps * b, vars, d)
        vm = jax.tree.map(lambda a, b: a - eps * b, vars, d)
        fp, cp, gp = fcg(vp)
        fm, cm, gm = fcg(vm)

        # gradient . d  vs  (f(v+) - f(v-)) / 2eps
        fd_grad = (fp - fm) / (2 * eps)
        errs["gradient"] = max(errs["gradient"],
                               abs(float(_dot(ev.grad, d) - fd_grad)))

        # C d  vs  (c(v+) - c(v-)) / 2eps
        dkkt = _kkt_from_duals(template, YVec(
            dyn=jnp.zeros_like(template.y_dyn),
            nc=jnp.zeros_like(template.y_nc),
            ec=jnp.zeros_like(template.y_ec)),
            ZVec(n=jnp.zeros_like(template.z_n),
                 e=jnp.zeros_like(template.z_e)))
        import dataclasses
        dkkt = dataclasses.replace(dkkt, x=d.x, u=d.u, theta=d.theta)
        cd = apply_C(ev.stage, dkkt, sched)
        fd_c = jax.tree.map(lambda a, b: (a - b) / (2 * eps), cp, cm)
        errs["jacobian_c"] = max(
            errs["jacobian_c"],
            float(max(jnp.max(jnp.abs(cd.y_dyn - fd_c.dyn), initial=0.0),
                      jnp.max(jnp.abs(cd.y_nc - fd_c.nc), initial=0.0),
                      jnp.max(jnp.abs(cd.y_ec - fd_c.ec), initial=0.0))))

        gd = apply_G(ev.stage, dkkt, sched)
        fd_g = jax.tree.map(lambda a, b: (a - b) / (2 * eps), gp, gm)
        errs["jacobian_g"] = max(
            errs["jacobian_g"],
            float(max(jnp.max(jnp.abs(gd.z_n - fd_g.n), initial=0.0),
                      jnp.max(jnp.abs(gd.z_e - fd_g.e), initial=0.0))))

        # H d  vs  FD of the Lagrangian gradient
        evp = problem.eval_model(vp, y, z)
        evm = problem.eval_model(vm, y, z)

        def lag_grad(e):
            duals = _kkt_from_duals(template, y, z)
            ct = apply_CT(e.stage, duals, sched)
            return Primal(x=e.grad.x + ct.x, u=e.grad.u + ct.u,
                          theta=e.grad.theta + ct.theta)
        # (inequality contributions via G^T z are linear in the Jacobian;
        #  include them for completeness)
        from ..ops.kkt import apply_GT

        def lag_grad_full(e):
            duals = _kkt_from_duals(template, y, z)
            ct = apply_CT(e.stage, duals, sched)
            gt = apply_GT(e.stage, duals, sched)
            return Primal(x=e.grad.x + ct.x + gt.x,
                          u=e.grad.u + ct.u + gt.u,
                          theta=e.grad.theta + ct.theta + gt.theta)

        hd = apply_H(ev.stage, dkkt, sched)
        fd_h = jax.tree.map(lambda a, b: (a - b) / (2 * eps),
                            lag_grad_full(evp), lag_grad_full(evm))
        errs["hessian"] = max(
            errs["hessian"],
            float(max(jnp.max(jnp.abs(hd.x - fd_h.x), initial=0.0),
                      jnp.max(jnp.abs(hd.u - fd_h.u), initial=0.0),
                      jnp.max(jnp.abs(hd.theta - fd_h.theta), initial=0.0))))
    return errs
