"""Fused-iteration IPM for the eligible chain class (whole-iteration
fusion, ops/fused_iter.py).

Semantically this is solver/sip.py's interior-point loop specialized to
the fused-eligible problem class (chain topology, uniform dims, float32,
no theta, box bounds only — i.e. no slack rows, no constraint
multipliers), with three structural changes that remove the r4 traces'
dominant costs:

  1. The model evaluation carried between iterations is a handful of
     O(n)-per-stage VECTORS (_VecEval: objective, cost gradients, C^T y
     products, dynamics residuals) produced by one Pallas kernel — the
     [B, T, n, n] StageModelData blocks of the standard path never exist,
     so the RTI freeze-select and the scan carry stop streaming matrix
     blocks through HBM.
  2. Stage derivative evaluation, condensation and the Riccati
     factor/solve run as one fused kernel chain
     (fused_iter.make_fused_factor_solve) whose intermediates stay in
     tile layout.
  3. The line-search probe is the fused Pallas probe (ops/pallas_ls.py),
     as on the standard path.

Per-scenario results match the standard path to f32 roundoff (different
summation orders inside the kernels); tests/test_fused_iter.py pins the
end-to-end parity.  solver.sip.solve dispatches here when
Settings.fused_iteration is set and the problem/settings are eligible
(see _eligible below).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.fused_iter import make_fused_eval, make_fused_factor_solve
from ..ops.pallas_ls import make_fused_probe
from .settings import Settings, SIPStatus
from .sip import (OCProblem, Primal, SolveResult, YVec, ZVec, _EPS, _tdot,
                  _tmap, _tsum)


class _VecEval(NamedTuple):
    """The carried model evaluation: vectors only (cf. ModelEval)."""

    f: jax.Array       # scalar objective
    gx: jax.Array      # [N, n] objective gradient wrt states
    gu: jax.Array      # [E, m] objective gradient wrt controls
    ctx: jax.Array     # [N, n] C^T y rows (dual dynamics products)
    ctu: jax.Array     # [E, m]
    cdyn: jax.Array    # [N, n] equality residuals (root row at node 0)
    res: jax.Array     # [6] packed KKT reductions: max|stat|, max|c|,
                       #     min/max d*z (lower), min/max d*z (upper)


class _FState(NamedTuple):
    vars: Primal
    y: jax.Array               # [N, n] dynamics multipliers
    zl: Primal
    zu: Primal
    mu: jax.Array
    nu: jax.Array
    it: jax.Array
    status: jax.Array
    kkt_error: jax.Array
    reg_boost: jax.Array
    consec_rej: jax.Array
    ev: _VecEval
    filt_th: jax.Array
    filt_ph: jax.Array


def _eligible(problem: OCProblem, settings: Settings, coupled) -> bool:
    """Trace-time gate for the fused path; every miss silently uses the
    standard solver (same results, standard performance)."""
    def scalar(s):
        return isinstance(s, (int, float)) or (
            hasattr(s, "ndim") and s.ndim == 0)
    logging = settings.logging
    return (settings.fused_iteration
            and problem.fused_iter is not None
            and problem.fused_ls is not None
            # the fused iteration's line search IS the fused probe; a
            # user disabling it (e.g. to A/B against the standard probe)
            # gets the standard solver path, which honors the flag
            and settings.line_search.fused_probe
            and not coupled
            and jnp.result_type(float) == jnp.float32
            and settings.iterative_refinement_steps == 0
            and scalar(problem.scale_dual)
            and scalar(problem.scale_equality)
            and scalar(problem.scale_bound)
            and not settings.debug_check_finite
            and not (logging.print_logs or logging.print_line_search_logs
                     or logging.print_search_direction_logs
                     or logging.print_derivative_check_logs))


def solve_fused(problem: OCProblem, settings: Settings,
                init_vars=None, init_y=None, init_z=None,
                init_zl=None, init_zu=None) -> SolveResult:
    """Fused-iteration solve; call through solver.sip.solve (which also
    applies the matmul-precision context and the eligibility gate)."""
    dims = problem.dims
    sched = problem.sched
    dtype = jnp.float32
    N, E = dims.num_nodes, dims.num_edges
    n = max(dims.max_state_dim, 1)
    m = max(dims.max_control_dim, 1)
    ispec, _ibounds, x0 = problem.fused_iter
    fspec, fbounds, fused_x0 = problem.fused_ls
    ls = settings.line_search

    fused_eval = make_fused_eval(ispec, _ibounds)
    fused_factor_solve = make_fused_factor_solve(ispec)
    fused_probe_fn = make_fused_probe(fspec, fbounds)

    lower, upper = problem.lower, problem.upper
    has_lb = _tmap(jnp.isfinite, lower)
    has_ub = _tmap(jnp.isfinite, upper)

    def dist_l(vars):
        return _tmap(lambda v, lb, h: jnp.where(h, v - lb, 1.0),
                     vars, lower, has_lb)

    def dist_u(vars):
        return _tmap(lambda v, ub, h: jnp.where(h, ub - v, 1.0),
                     vars, upper, has_ub)

    # ----- initialization (identical to sip.py's) --------------------------
    push_eps = (settings.warm_bound_push if init_vars is not None
                else settings.bound_push)
    if init_vars is None:
        init_vars = problem.default_init
    if init_vars is None:
        init_vars = Primal(x=jnp.zeros((N, n), dtype),
                           u=jnp.zeros((E, m), dtype),
                           theta=jnp.zeros((0,), dtype))

    def push(v, lb, ub, hl, hu):
        lo = jnp.where(hl, lb + push_eps *
                       jnp.maximum(1.0, jnp.abs(lb)), -jnp.inf)
        hi = jnp.where(hu, ub - push_eps *
                       jnp.maximum(1.0, jnp.abs(ub)), jnp.inf)
        mid = jnp.where(hl & hu, 0.5 * (lb + ub), 0.0)
        return jnp.where(lo <= hi, jnp.clip(v, lo, hi), mid)

    vars0 = _tmap(push, init_vars, lower, upper, has_lb, has_ub)
    y0 = init_y.dyn if init_y is not None else jnp.zeros((N, n), dtype)

    # a zero derived from traced data (keeps carries device-varying
    # under shard_map; cf. sip.py's vzero note)
    vzero = jnp.sum(vars0.x) * 0.0
    mu0 = jnp.asarray(settings.mu_init, dtype) + vzero
    kappa_s = settings.kappa_sigma

    def bound_dual_init(warm, dists, has):
        if warm is None:
            return _tmap(lambda d, h: jnp.where(h, mu0 / d, 0.0), dists,
                         has)
        return _tmap(
            lambda zw, d, h: jnp.where(
                h, jnp.clip(zw, mu0 / (kappa_s * jnp.maximum(d, _EPS)),
                            kappa_s * mu0 / jnp.maximum(d, _EPS)), 0.0),
            warm, dists, has)

    zl0 = bound_dual_init(init_zl, dist_l(vars0), has_lb)
    zu0 = bound_dual_init(init_zu, dist_u(vars0), has_ub)

    sd_, se_, sb_ = (problem.scale_dual, problem.scale_equality,
                     problem.scale_bound)

    def eval_at(vars, y, zl, zu):
        return _VecEval(*fused_eval(vars.x, vars.u, y, x0,
                                    zl.x, zl.u, zu.x, zu.u))

    # ----- residuals (from kernel E's packed reductions) -------------------
    # ev.res = [max|stat|, max|c|, min/max d*zl, min/max d*zu]; the
    # bound-complementarity inf-norm at ANY barrier value m follows from
    # the min/max pair: max_i |v_i - m| = max(vmax - m, m - vmin), with
    # the standard path's masked-entry zero floor
    def kkt_err(ev: _VecEval):
        r = ev.res

        def err(m_mu):
            comp = jnp.maximum(jnp.maximum(
                jnp.maximum(r[3] - m_mu, m_mu - r[2]),
                jnp.maximum(r[5] - m_mu, m_mu - r[4])), 0.0)
            return jnp.max(jnp.stack([
                sd_ * r[0], se_ * r[1], sb_ * comp]))

        return err

    ev0 = eval_at(vars0, y0, zl0, zu0)
    err0 = kkt_err(ev0)(0.0)
    status_init = jnp.where(
        err0 <= settings.tol, jnp.int32(SIPStatus.SOLVED),
        jnp.where(~jnp.isfinite(err0) | (err0 > settings.diverged_kkt),
                  jnp.int32(SIPStatus.DIVERGED),
                  jnp.int32(SIPStatus.RUNNING)))

    state0 = _FState(
        vars=vars0, y=y0, zl=zl0, zu=zu0, mu=mu0,
        nu=jnp.asarray(ls.nu_min, dtype) + vzero,
        it=jnp.int32(0) + vzero.astype(jnp.int32),
        status=status_init, kkt_error=err0,
        reg_boost=jnp.asarray(1.0, dtype) + vzero,
        consec_rej=jnp.int32(0) + vzero.astype(jnp.int32),
        ev=ev0,
        filt_th=jnp.full((settings.max_iterations,), jnp.inf, dtype),
        filt_ph=jnp.full((settings.max_iterations,), jnp.inf, dtype))
    state0 = jax.tree.map(lambda a: a + vzero.astype(a.dtype), state0)

    # ----- merit helpers ---------------------------------------------------
    def log_barrier(vars):
        return (_tsum(_tmap(
            lambda d, h: jnp.where(h, jnp.log(jnp.maximum(d, _EPS)), 0.0),
            dist_l(vars), has_lb))
            + _tsum(_tmap(
                lambda d, h: jnp.where(h, jnp.log(jnp.maximum(d, _EPS)),
                                       0.0), dist_u(vars), has_ub)))

    # ----- one IPM iteration ----------------------------------------------
    def body(st: _FState) -> _FState:
        vars, y, zl, zu, mu, ev = st.vars, st.y, st.zl, st.zu, st.mu, st.ev
        err_fn = kkt_err(ev)
        e_mu = err_fn(mu)
        shrink = e_mu <= settings.kappa_eps * mu
        mu = jnp.where(
            shrink,
            jnp.maximum(settings.mu_min,
                        jnp.minimum(settings.kappa_mu * mu,
                                    mu ** settings.theta_mu)),
            mu)

        dl, du = dist_l(vars), dist_u(vars)
        reg_d = settings.gamma_reg * mu + settings.reg_floor
        bound_diag = _tmap(
            lambda d1, l, h1, d2, u_, h2: jnp.where(h1, l / d1, 0.0)
            + jnp.where(h2, u_ / d2, 0.0),
            dl, zl, has_lb, du, zu, has_ub)
        r1 = _tmap(lambda b_: settings.prox_reg * st.reg_boost + b_,
                   bound_diag)
        bound_grad = _tmap(
            lambda d1, h1, d2, h2: -jnp.where(h1, mu / d1, 0.0)
            + jnp.where(h2, mu / d2, 0.0), dl, has_lb, du, has_ub)
        # q_mod = -b_x = grad + C^T y + bound_grad (helpers.cpp:752-812
        # collapsed to the unconstrained case); c_mod = -b_y = c
        q_v = ev.gx + ev.ctx + bound_grad.x
        r_v = ev.gu + ev.ctu + bound_grad.u
        c_v = ev.cdyn

        def try_factor(r1_):
            return fused_factor_solve(vars.x, vars.u, y, r1_.x, r1_.u,
                                      reg_d, q_v, r_v, c_v)

        out0 = try_factor(r1)

        if settings.max_factor_retries > 0:
            def retry_cond(carry):
                r1c, out, k = carry
                return (out[3] != 0) & (k < settings.max_factor_retries)

            def retry_body(carry):
                r1c, out, k = carry
                r1n = _tmap(
                    lambda a: a * settings.retry_scale
                    + settings.retry_scale * settings.prox_reg, r1c)
                return (r1n, try_factor(r1n), k + 1)

            _, out, _ = lax.while_loop(
                retry_cond, retry_body,
                (r1, out0, jnp.int32(0) + 0 * out0[3]))
        else:
            out = out0
        dx, du_, dy, fstatus = out
        factor_failed = fstatus != 0

        dv = Primal(x=dx, u=du_, theta=vars.theta * 0)
        dzl = _tmap(lambda d, l, dx_, h: jnp.where(
            h, mu / d - l - (l / d) * dx_, 0.0), dl, zl, dv, has_lb)
        dzu = _tmap(lambda d, u_, dx_, h: jnp.where(
            h, mu / d - u_ + (u_ / d) * dx_, 0.0), du, zu, dv, has_ub)

        def _scrub(t):
            return _tmap(lambda a: jnp.where(factor_failed,
                                             jnp.zeros_like(a), a), t)
        dv, dy = _scrub(dv), _scrub(dy)
        dzl, dzu = _scrub(dzl), _scrub(dzu)

        # fraction-to-boundary (identical to sip.py)
        tau = jnp.maximum(settings.tau_min, 1.0 - mu)

        def max_step(val, dval, mask):
            bad = mask & (dval < 0)
            a = jnp.where(bad, -tau * val / jnp.where(bad, dval, -1.0), 1.0)
            return jnp.min(a, initial=1.0)

        alpha_p = jnp.minimum(
            jnp.min(jnp.stack(
                [max_step(d, dd, h) for d, dd, h in zip(
                    jax.tree.leaves(dl), jax.tree.leaves(dv),
                    jax.tree.leaves(has_lb))]), initial=1.0),
            jnp.min(jnp.stack(
                [max_step(d, -dd, h) for d, dd, h in zip(
                    jax.tree.leaves(du), jax.tree.leaves(dv),
                    jax.tree.leaves(has_ub))]), initial=1.0))
        alpha_d = jnp.min(jnp.stack(
            [max_step(a, b_, h) for a, b_, h in zip(
                jax.tree.leaves(zl) + jax.tree.leaves(zu),
                jax.tree.leaves(dzl) + jax.tree.leaves(dzu),
                jax.tree.leaves(has_lb) + jax.tree.leaves(has_ub))]),
            initial=1.0)

        # ----- line search (fused probe; same scalars as sip.py) ----------
        theta0 = jnp.sum(jnp.abs(ev.cdyn))
        phi_bar0 = ev.f - mu * log_barrier(vars)
        d_phi = (_tdot(Primal(x=ev.gx, u=ev.gu, theta=vars.theta * 0), dv)
                 - mu * _tsum(_tmap(
                     lambda dx_, d, h: jnp.where(h, dx_ / d, 0.0), dv, dl,
                     has_lb))
                 + mu * _tsum(_tmap(
                     lambda dx_, d, h: jnp.where(h, dx_ / d, 0.0), dv, du,
                     has_ub)))
        nu = jnp.maximum(st.nu, jnp.where(
            theta0 > 1e-14, d_phi / ((1.0 - ls.nu_rho)
                                     * jnp.maximum(theta0, 1e-14)),
            ls.nu_min))
        nu = jnp.maximum(nu, ls.nu_min)
        slope = d_phi - nu * theta0
        phi0 = phi_bar0 + nu * theta0

        chunk = max(1, int(ls.chunk))
        bt = jnp.asarray(ls.backtrack, dtype)

        def _chunked(alpha, k, acceptable):
            cands = [alpha]
            for _ in range(chunk - 1):
                cands.append(cands[-1] * bt)
            alphas = jnp.stack(cands)
            oks = acceptable(alphas) & ((k + jnp.arange(chunk))
                                        < ls.max_steps)
            any_ok = jnp.any(oks)
            sel = alphas[jnp.argmax(oks)]
            return jnp.where(any_ok, sel, alphas[-1] * bt), any_ok

        def ls_cond(carry):
            alpha, k, accepted = carry
            return (~accepted) & (k < ls.max_steps)

        if ls.use_filter_line_search:
            def filter_probe(alphas):
                fv, thv, lbv = fused_probe_fn(
                    vars.x, dv.x, vars.u, dv.u, fused_x0, alphas)
                phi_t = fv - mu * lbv
                not_dom = jnp.all(
                    (thv[:, None]
                     <= (1.0 - ls.gamma_theta) * st.filt_th[None, :])
                    | (phi_t[:, None]
                       <= st.filt_ph[None, :]
                       - ls.gamma_phi * st.filt_th[None, :]), axis=-1)
                progress = (
                    (thv <= (1.0 - ls.gamma_theta) * theta0)
                    | (phi_t <= phi_bar0 - ls.gamma_phi * theta0))
                armijo = phi_t <= phi_bar0 + ls.eta * alphas * d_phi
                return not_dom & (progress | armijo)

            def fls_body(carry):
                alpha, k, _ = carry
                alpha_n, ok = _chunked(alpha, k, filter_probe)
                return (alpha_n, k + chunk, ok)

            ls_init = (alpha_p + 0.0 * phi0, jnp.int32(0), phi0 != phi0)
            if chunk >= ls.max_steps:
                alpha_b, _, acc_b = fls_body(ls_init)
                nan0 = phi0 != phi0
                alpha = jnp.where(nan0, ls_init[0], alpha_b)
                accepted = nan0 | acc_b
            else:
                alpha, _, accepted = lax.while_loop(ls_cond, fls_body,
                                                    ls_init)
            filt_th_n = jnp.where(
                accepted,
                st.filt_th.at[st.it].set((1.0 - ls.gamma_theta) * theta0),
                st.filt_th)
            filt_ph_n = jnp.where(
                accepted,
                st.filt_ph.at[st.it].set(phi_bar0 - ls.gamma_phi * theta0),
                st.filt_ph)
        else:
            def armijo_ok(alphas):
                fv, thv, lbv = fused_probe_fn(
                    vars.x, dv.x, vars.u, dv.u, fused_x0, alphas)
                phis = fv - mu * lbv + nu * thv
                return phis <= phi0 + ls.eta * alphas * slope

            def ls_body(carry):
                alpha, k, _ = carry
                alpha_n, ok = _chunked(alpha, k, armijo_ok)
                return (alpha_n, k + chunk, ok)

            ls_init = (alpha_p + 0.0 * phi0, jnp.int32(0), phi0 != phi0)
            if chunk >= ls.max_steps:
                alpha_b, _, acc_b = ls_body(ls_init)
                nan0 = phi0 != phi0
                alpha = jnp.where(nan0, ls_init[0], alpha_b)
                accepted = nan0 | acc_b
            else:
                alpha, _, accepted = lax.while_loop(ls_cond, ls_body,
                                                    ls_init)
            filt_th_n, filt_ph_n = st.filt_th, st.filt_ph

        alpha = jnp.where(accepted, alpha, jnp.zeros_like(alpha))
        step_rejected = factor_failed | ~accepted
        reg_boost_n = jnp.where(
            step_rejected,
            jnp.minimum(st.reg_boost * settings.reg_boost_scale,
                        settings.reg_boost_max),
            jnp.maximum(st.reg_boost * settings.reg_boost_decay, 1.0))
        consec_rej_n = jnp.where(step_rejected, st.consec_rej + 1,
                                 jnp.zeros_like(st.consec_rej))

        vars_n = _tmap(lambda v_, d_: v_ + alpha * d_, vars, dv)
        y_n = y + alpha_d * dy
        zl_n = _tmap(lambda a, d_, h: jnp.where(h, a + alpha_d * d_, 0.0),
                     zl, dzl, has_lb)
        zu_n = _tmap(lambda a, d_, h: jnp.where(h, a + alpha_d * d_, 0.0),
                     zu, dzu, has_ub)

        it_n = st.it + 1
        ev_n = eval_at(vars_n, y_n, zl_n, zu_n)
        ev_n = jax.tree.map(lambda a: a + vzero.astype(a.dtype), ev_n)
        e_new = kkt_err(ev_n)(0.0)
        blew_up = ~jnp.isfinite(e_new) | (e_new > settings.diverged_kkt)
        gave_up = factor_failed & (st.reg_boost >= settings.reg_boost_max)
        stalled = consec_rej_n >= settings.max_consecutive_rejections
        new_status = jnp.where(
            e_new <= settings.tol, jnp.int32(SIPStatus.SOLVED),
            jnp.where(gave_up,
                      jnp.int32(SIPStatus.FACTORIZATION_FAILURE),
                      jnp.where(blew_up, jnp.int32(SIPStatus.DIVERGED),
                                jnp.where(
                                    stalled, jnp.int32(SIPStatus.STALLED),
                                    jnp.where(
                                        it_n >= settings.max_iterations,
                                        jnp.int32(SIPStatus.MAX_ITERATIONS),
                                        jnp.int32(SIPStatus.RUNNING))))))

        return _FState(
            vars=vars_n, y=y_n, zl=zl_n, zu=zu_n, mu=mu, nu=nu, it=it_n,
            status=new_status, kkt_error=e_new, reg_boost=reg_boost_n,
            consec_rej=consec_rej_n, ev=ev_n,
            filt_th=filt_th_n, filt_ph=filt_ph_n)

    def cond(st: _FState):
        return st.status == SIPStatus.RUNNING

    if settings.fixed_iterations:
        def scan_body(st, _):
            new = body(st)
            keep = cond(st)
            st_n = _tmap(lambda a, b: jnp.where(keep, a, b), new, st)
            return st_n, None

        final, _ = lax.scan(scan_body, state0, None,
                            length=settings.max_iterations)
    else:
        final = lax.while_loop(cond, body, state0)

    status = jnp.where(final.status == SIPStatus.RUNNING,
                       jnp.int32(SIPStatus.MAX_ITERATIONS), final.status)

    zero_zn = jnp.zeros((N, dims.max_node_g_dim), dtype)
    zero_ze = jnp.zeros((E, dims.max_edge_g_dim), dtype)
    return SolveResult(
        vars=final.vars,
        s=ZVec(n=zero_zn, e=zero_ze),
        y=YVec(dyn=final.y,
               nc=jnp.zeros((N, dims.max_node_c_dim), dtype),
               ec=jnp.zeros((E, dims.max_edge_c_dim), dtype)),
        z=ZVec(n=zero_zn, e=zero_ze),
        zl=final.zl, zu=final.zu,
        f=final.ev.f, status=status, iterations=final.it,
        kkt_error=final.kkt_error, mu=final.mu)
