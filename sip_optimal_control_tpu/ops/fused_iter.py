"""Whole-iteration fusion for chain problems: model eval + condensation +
Riccati factor/solve as one Pallas TPU kernel chain.

The r4 device traces showed each IPM trip spending ~75% of its time in a
tail of ~40 small XLA fusions (autodiff model evaluation, condensation,
RHS condense/recover, residuals, updates) streaming [B, T, n, n] stage
blocks through HBM — 210 MB per block at chain16 — plus the RTI
freeze-select over the carried StageModelData.  This module removes the
stage blocks from HBM entirely for the eligible class:

  - The user's stage functions AND their autodiff derivatives (jacfwd of
    the dynamics, grads/Hessians of the costs) run INSIDE the kernels
    through the tile-scalar jaxpr interpreter (ops/tile_interp.py), one
    [8, 128] vector-register tile per logical scalar, scenario batch on
    the lanes — the same code shape as ops/pallas_ls.py.
  - `_factor_kernel` fuses, per backward step: stage derivative
    evaluation -> condensation (Q_mod = Hxx + diag(r1), reference:
    helpers.cpp:297-354 collapsed to its unconstrained case) -> the
    dual-regularized Riccati edge factorization (reference:
    lqr.cpp:645-731), carrying the cost-to-go in VMEM.  Only the factor
    PRODUCTS (V_child, K, G_chol, F_chol, A, B per edge) are written to
    HBM, already in tile layout.
  - `_solve_bwd_kernel`/`_solve_fwd_kernel` (reference: lqr.cpp:735-871)
    consume those products WITHOUT leaving tile layout — the `_to_tiles`
    transposes between factor and solve disappear.
  - `_eval_kernel` fuses the per-edge residual/gradient evaluation the
    IPM needs at the accepted iterate (objective, cost gradients,
    C^T y products, dynamics residuals — the reference's new_x=true
    model_callback path, sip_optimal_control.cpp:55-125) into one pass;
    the solver then carries only O(n)-vectors per stage, so the RTI
    freeze-select never touches a matrix block again.

Scope (a subset of the fused-line-search class, model.py:333-354): chain
topology, uniform dims, float32, theta_dim 0, no constraint functions
(box bounds only), stage functions within the interpreter's primitive
set.  Everything else uses the standard solver path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from .tile_interp import eval_jaxpr_tiles, supports

_SUB, _LANE = 8, 128
_BLK = _SUB * _LANE

# Tests set this to route the batched custom_vmap rules into the kernels
# in Pallas interpret mode on CPU (production CPU falls back to the pure
# JAX reference implementations instead — Pallas interpret mode is orders
# of magnitude slower; cf. ADVICE r4 on the fused LS probe).
INTERPRET_OVERRIDE = False

# At n >= _GRAM_N the explicit-W edge factorization spills the vector
# register file; the Gram formulation (see ops/pallas_riccati.py:183-195)
# eliminates F_inv/W/WA.  Same threshold as the standalone factor kernel.
_GRAM_N = 8


def _use_kernels() -> bool:
    return INTERPRET_OVERRIDE or jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class FusedIterSpec(NamedTuple):
    """Static model payload: stage-function jaxprs (closure constants
    concrete) for in-kernel evaluation plus the original closures for the
    reference/fallback paths."""

    dyn: object          # (x, u, th, i) -> [n]
    ncost: object        # (x, th, i) -> scalar
    ecost: object        # (x, u, th, i) -> scalar
    dyn_jac: object      # (x, u, th, i) -> (A [n,n], B [n,m])
    dyn_vjp: object      # (x, u, th, i, yc) -> (A^T yc [n], B^T yc [m])
    ncost_grad: object   # (x, th, i) -> [n]
    ecost_grad: object   # (x, u, th, i) -> ([n], [m])
    nhess: object        # (x, th, i) -> [n, n]
    ehess: object        # GN: (x, u, th, i) -> (Hxx, Hxu, Huu)
                         # exact: (x, u, th, i, yc) -> (Hxx, Hxu, Huu)
    exact: bool
    dyn_orig: object
    ncost_orig: object
    ecost_orig: object
    horizon: int
    n: int
    m: int


def build_fused_iter_spec(dynamics, node_cost, edge_cost, horizon, n, m,
                          hessian_mode: str) -> Optional[FusedIterSpec]:
    """Trace every stage function and derivative the kernels need; None
    when any closure constant is traced (per-solve values) or any
    primitive is unsupported by the tile interpreter."""
    th0 = jnp.zeros((0,), jnp.float32)
    ex_x = jnp.zeros((n,), jnp.float32)
    ex_u = jnp.zeros((m,), jnp.float32)
    ex_i = jnp.zeros((), jnp.int32)
    ex_y = jnp.zeros((n,), jnp.float32)
    exact = hessian_mode == "exact"

    def edge_lag(x, u, th, i, yc):
        return edge_cost(x, u, th, i) + jnp.dot(yc, dynamics(x, u, th, i))

    try:
        dyn_j = jax.make_jaxpr(dynamics)(ex_x, ex_u, th0, ex_i)
        nco_j = jax.make_jaxpr(node_cost)(ex_x, th0, ex_i)
        eco_j = jax.make_jaxpr(edge_cost)(ex_x, ex_u, th0, ex_i)
        djac_j = jax.make_jaxpr(
            jax.jacfwd(dynamics, argnums=(0, 1)))(ex_x, ex_u, th0, ex_i)
        dvjp_j = jax.make_jaxpr(
            lambda x, u, th, i, yc: jax.grad(
                lambda x_, u_: jnp.dot(yc, dynamics(x_, u_, th, i)),
                argnums=(0, 1))(x, u))(ex_x, ex_u, th0, ex_i, ex_y)
        ngrad_j = jax.make_jaxpr(
            jax.grad(node_cost, argnums=0))(ex_x, th0, ex_i)
        egrad_j = jax.make_jaxpr(
            jax.grad(edge_cost, argnums=(0, 1)))(ex_x, ex_u, th0, ex_i)
        nhess_j = jax.make_jaxpr(
            jax.hessian(node_cost, argnums=0))(ex_x, th0, ex_i)
        if exact:
            def eh(x, u, th, i, yc):
                h = jax.hessian(edge_lag, argnums=(0, 1))(x, u, th, i, yc)
                return h[0][0], h[0][1], h[1][1]
            ehess_j = jax.make_jaxpr(eh)(ex_x, ex_u, th0, ex_i, ex_y)
        else:
            def eh(x, u, th, i):
                h = jax.hessian(edge_cost, argnums=(0, 1))(x, u, th, i)
                return h[0][0], h[0][1], h[1][1]
            ehess_j = jax.make_jaxpr(eh)(ex_x, ex_u, th0, ex_i)
    except Exception:
        return None
    for cj in (dyn_j, nco_j, eco_j, djac_j, dvjp_j, ngrad_j, egrad_j,
               nhess_j, ehess_j):
        for c in cj.consts:
            if isinstance(c, jax.core.Tracer):
                return None
        if not supports(cj.jaxpr):
            return None
    return FusedIterSpec(
        dyn=dyn_j, ncost=nco_j, ecost=eco_j, dyn_jac=djac_j,
        dyn_vjp=dvjp_j, ncost_grad=ngrad_j, ecost_grad=egrad_j,
        nhess=nhess_j, ehess=ehess_j, exact=exact,
        dyn_orig=dynamics, ncost_orig=node_cost, ecost_orig=edge_cost,
        horizon=horizon, n=n, m=m)


# ---------------------------------------------------------------------------
# object-array plumbing between tile_interp and the entry-unrolled algebra
# ---------------------------------------------------------------------------

def _vec_obj(tiles):
    out = np.empty(len(tiles), dtype=object)
    for i, t in enumerate(tiles):
        out[i] = t
    return out


def _scalar_obj(v):
    out = np.empty((), dtype=object)
    out[()] = v
    return out


def _calls(cj, *args):
    """Evaluate a ClosedJaxpr on object-array args; returns the list of
    outputs (object arrays)."""
    return eval_jaxpr_tiles(cj.jaxpr, cj.consts, *args)


def _as_mat(o):
    """[r, c] object array -> list-of-lists of tiles."""
    return [[o[i, j] for j in range(o.shape[1])] for i in range(o.shape[0])]


def _as_vec(o):
    return [o[i] for i in range(o.shape[0])]


_TH0 = np.empty((0,), dtype=object)


def _t(v):
    """Coerce a kernel value to a full [8, 128] tile: closure constants of
    the stage jaxprs fold to SCALAR literals in the tile interpreter
    (e.g. constant Jacobian entries of a linear system), which cannot be
    stored to a tile ref directly."""
    if hasattr(v, "shape") and getattr(v, "shape", ()) == (_SUB, _LANE):
        # jaxpr results keep their traced dtype (f64 when the model's
        # closure constants were built under an x64 test env); refs are f32
        return v if v.dtype == jnp.float32 else v.astype(jnp.float32)
    return jnp.full((_SUB, _LANE), v, jnp.float32)


def _store_m(ref, mat):
    cols = len(mat[0])
    for i, row in enumerate(mat):
        for j, v in enumerate(row):
            ref[0, 0, i * cols + j] = _t(v)


def _store_v(ref, vec):
    for i, v in enumerate(vec):
        ref[0, 0, i] = _t(v)


def _tri_idx(i, j):
    return (i * (i + 1)) // 2 + j            # j <= i


def _store_m_packed(ref, mat):
    """Store only the lower triangle (n(n+1)/2 rows): at n >= _GRAM_N the
    V (symmetric) and F_chol (lower-triangular) streams are the dominant
    HBM traffic and their upper halves carry no information the solve
    kernels read."""
    for i in range(len(mat)):
        for j in range(i + 1):
            ref[0, 0, _tri_idx(i, j)] = _t(mat[i][j])


def _mat_packed(ref, n):
    """Full list-of-lists view of a lower-packed block.  Entry (i, j)
    reads the packed (max, min) slot: exact for symmetric matrices, and
    safe for lower-triangular Cholesky factors because the triangular
    solves only ever reference lower entries (l[i][k], k<i and l[k][i],
    k>i)."""
    return [[ref[0, 0, _tri_idx(max(i, j), min(i, j))] for j in range(n)]
            for i in range(n)]


# ---------------------------------------------------------------------------
# tiny-matrix algebra on tile scalars (shared with ops/pallas_riccati.py)
# ---------------------------------------------------------------------------

from .pallas_riccati import (_add, _chol, _cho_solve_mat, _cho_solve_vec,  # noqa: E402
                             _gram_core, _mat, _matmul, _matvec,
                             _transpose, _vec)
from .pallas_ls import _from_tiles as _vuntiles  # noqa: E402
from .pallas_riccati import _to_tiles as _stiles  # noqa: E402  [B,S,rows] form


# ---------------------------------------------------------------------------
# kernel F: fused model-eval + condensation + Riccati backward factor
# ---------------------------------------------------------------------------

def _factor_kernel(spec: FusedIterSpec, pack,
                   qt_ref, x_ref, u_ref, y_ref, r1x_ref, r1u_ref, d_ref,
                   vc_out, k_out, g_out, fc_out, a_out, b_out, vroot_out,
                   v_scr):
    """One backward grid step t (edge e = T-1-t): evaluate the stage
    derivatives at (x_e, u_e), condense with r1/delta, run the Riccati
    edge recursion with the cost-to-go carried in VMEM.

    All per-stage operands arrive as index-mapped blocks (static in-kernel
    addressing — dynamic VMEM slices measured ~5x slower per grid step);
    the terminal Q_mod[T] carry init is precomputed outside and arrives
    via qt_ref.

    Condensation here is the unconstrained case of the reference's
    factor() (helpers.cpp:297-354): Q_mod = Hxx + diag(r1_x), R_mod =
    Huu + diag(r1_u), M_mod = Hxu.  Edge recursion: lqr.cpp:645-731 with
    uniform scalar delta."""
    T, n, m = spec.horizon, spec.n, spec.m
    t = pl.program_id(1)
    e = T - 1 - t

    d = d_ref[0, 0, 0]                 # scalar delta tile (r2 of dyn rows)
    ei = _scalar_obj(e.astype(jnp.int32))

    @pl.when(t == 0)
    def _():
        # carry init: terminal V = Q_mod[T] (no edge term at the leaf)
        for i in range(n * n):
            v_scr[i] = qt_ref[0, 0, i]

    # ----- stage derivative evaluation (tile-interp of autodiff jaxprs) ----
    xp = _vec_obj(_vec(x_ref, n))
    ue = _vec_obj(_vec(u_ref, m))
    AB = _calls(spec.dyn_jac, xp, ue, _TH0, ei)
    A = _as_mat(AB[0])
    B = _as_mat(AB[1])
    Hn = _as_mat(_calls(spec.nhess, xp, _TH0, ei)[0])
    if spec.exact:
        yc = _vec_obj(_vec(y_ref, n))
        Hxx, Hxu, Huu = _calls(spec.ehess, xp, ue, _TH0, ei, yc)
    else:
        Hxx, Hxu, Huu = _calls(spec.ehess, xp, ue, _TH0, ei)
    Hxx, Hxu, Huu = _as_mat(Hxx), _as_mat(Hxu), _as_mat(Huu)

    # ----- condensation --------------------------------------------------
    r1x = _vec(r1x_ref, n)
    r1u = _vec(r1u_ref, m)
    Qp = [[Hn[i][j] + Hxx[i][j] + (r1x[i] if i == j else 0.0)
           for j in range(n)] for i in range(n)]
    R = [[Huu[i][j] + (r1u[i] if i == j else 0.0)
          for j in range(m)] for i in range(m)]
    M = Hxu

    # ----- Riccati edge step (carry = V_child in v_scr) ------------------
    Vc = [[v_scr[i * n + j] for j in range(n)] for i in range(n)]
    one = jnp.ones_like(d)
    zero = jnp.zeros_like(d)
    # F = I + sqrt(d) Vc sqrt(d) = I + d*Vc for the IPM's uniform scalar
    # delta (reference general form: lqr.cpp:487-529)
    F = [[d * Vc[i][j] + (one if i == j else zero) for j in range(n)]
         for i in range(n)]
    Lf = _chol(F)

    if n >= _GRAM_N:
        # Gram form: the shared edge step in ops/pallas_riccati.py
        # (_gram_core — never builds F_inv/W/WA; symmetrized triangular
        # reads); the IPM's uniform scalar delta broadcasts to the
        # per-row scaling list
        sdi = jax.lax.rsqrt(d)
        Lg, K, Vp = _gram_core(Lf, A, B, M, R, Qp, [sdi] * n, n, m)
    else:
        eye = [[one if i == j else zero for j in range(n)]
               for i in range(n)]
        F_inv = _cho_solve_mat(Lf, eye)
        inv_d = 1.0 / d
        W = [[inv_d * ((one if i == j else zero) - F_inv[i][j])
              for j in range(n)] for i in range(n)]
        Bt = _transpose(B)
        BtW = _matmul(Bt, W)
        G = _add(R, _matmul(BtW, B))
        Lg = _chol(G)
        WA = _matmul(W, A)
        H = _add(_transpose(M), _matmul(Bt, WA))
        Kneg = _cho_solve_mat(Lg, H)
        K = [[-Kneg[i][j] for j in range(n)] for i in range(m)]
        Vp = _add(Qp, _add(_matmul(_transpose(A), WA),
                           _matmul(_transpose(K), H)))

    store_sym = _store_m_packed if pack else _store_m
    store_sym(vc_out, Vc)       # V of the CHILD node (carry before update)
    _store_m(k_out, K)
    _store_m(g_out, Lg)
    store_sym(fc_out, Lf)
    if a_out is not None:       # large-n path recomputes A/B in the solve
        _store_m(a_out, A)      # kernels instead of streaming them
        _store_m(b_out, B)
    store_sym(vroot_out, Vp)    # t-constant block: final flush = V[root]
    for i in range(n):
        for j in range(n):
            v_scr[i * n + j] = _t(Vp[i][j])


# ---------------------------------------------------------------------------
# solve kernels consuming tiled factor products (reference: lqr.cpp:735-871)
# ---------------------------------------------------------------------------

def _solve_bwd_kernel(n, m, T, spec, pack,
                      qp_ref, qc_ref, r_ref, cc_ref, c0_ref, d_ref,
                      vr_ref, fc_ref, g_ref, kg_ref, a_ref, b_ref,
                      k_out, vc_out, xr_out, yr_out, v_scr):
    """Backward vector pass per edge e = T-1-t; carry v in VMEM.  Emits
    the CHILD's v per edge (carry before update); at the last step it
    also performs the ROOT solve in-kernel (reference: lqr.cpp:798-819)
    — a batched [B, n, n] XLA Cholesky here measured 1.7 ms/trip (the
    tiny-batched-LAPACK lane-padding poison, cf. r4's W-recovery
    finding), vs ~n^3/6 tile ops in-kernel.  Per-stage operands are
    index-mapped blocks (static addressing)."""
    t = pl.program_id(1)
    d = d_ref[0, 0, 0]

    @pl.when(t == 0)
    def _():
        for i in range(n):
            v_scr[i] = qc_ref[0, 0, i]      # q at node T-t = T

    v_c = [v_scr[i] for i in range(n)]
    c_c = _vec(cc_ref, n)
    Lf = _mat_packed(fc_ref, n) if pack else _mat(fc_ref, n, n)
    Lg = _mat(g_ref, m, m)
    Kg = _mat(kg_ref, m, n)
    if spec is None:
        A = _mat(a_ref, n, n)
        B = _mat(b_ref, n, m)
    else:
        # recompute the dynamics Jacobians in-kernel instead of streaming
        # them from HBM (engaged for the large-n models, whose A/B blocks
        # fold mostly to constants and whose streams dominate the trip);
        # a_ref/b_ref carry the stage iterate (x_e, u_e) instead
        e = T - 1 - t
        AB = _calls(spec.dyn_jac, _vec_obj(_vec(a_ref, n)),
                    _vec_obj(_vec(b_ref, m)), _TH0,
                    _scalar_obj(e.astype(jnp.int32)))
        A, B = _as_mat(AB[0]), _as_mat(AB[1])
    r = _vec(r_ref, m)
    q_p = _vec(qp_ref, n)

    sdi = jax.lax.rsqrt(d)
    f = [d * v_c[i] - c_c[i] for i in range(n)]
    fh = [sdi * f[i] for i in range(n)]
    finv_fh = _cho_solve_vec(Lf, fh)
    Wf = [sdi * (fh[i] - finv_fh[i]) for i in range(n)]
    g = [v_c[i] - Wf[i] for i in range(n)]
    h = [r[i] + functools.reduce(lambda p, q: p + q,
                                 [B[k][i] * g[k] for k in range(n)])
         for i in range(m)]
    k_vec = [-x for x in _cho_solve_vec(Lg, h)]
    Atg = _matvec(_transpose(A), g)
    Kth = _matvec(_transpose(Kg), h)
    v_p = [q_p[i] + Atg[i] + Kth[i] for i in range(n)]

    _store_v(k_out, k_vec)
    for i in range(n):
        vc_out[0, 0, i] = _t(v_c[i])
        v_scr[i] = _t(v_p[i])

    @pl.when(t == T - 1)
    def _():
        # root: x_0 = -(I + d V_0)^{-1} (d v_0 - c_0); with a scalar delta
        # the sqrt(d) scalings commute away.  y_0 = v_0 + V_0 x_0.
        one = jnp.ones_like(d)
        zero = jnp.zeros_like(d)
        Vr = _mat_packed(vr_ref, n) if pack else _mat(vr_ref, n, n)
        c0 = _vec(c0_ref, n)
        Fr = [[d * Vr[i][j] + (one if i == j else zero) for j in range(n)]
              for i in range(n)]
        Lfr = _chol(Fr)
        fr = [d * v_p[i] - c0[i] for i in range(n)]
        xr = [-v for v in _cho_solve_vec(Lfr, fr)]
        yr = [v_p[i] + _matvec(Vr, xr)[i] for i in range(n)]
        _store_v(xr_out, xr)
        _store_v(yr_out, yr)


def _solve_fwd_kernel(n, m, T, spec, pack,
                      xr_ref, k_ref, kg_ref, a_ref, b_ref,
                      cc_ref, d_ref, vvec_ref, vmat_ref, fc_ref,
                      u_out, x_out, y_out, x_scr):
    """Forward rollout per edge e = t; carry x in VMEM.  All per-edge
    inputs are edge-indexed tiled blocks (child quantities emitted by the
    backward kernels)."""
    t = pl.program_id(1)
    d = d_ref[0, 0, 0]

    @pl.when(t == 0)
    def _():
        for i in range(n):
            x_scr[i] = xr_ref[0, 0, i]

    x_p = [x_scr[i] for i in range(n)]
    k_vec = _vec(k_ref, m)
    Kg = _mat(kg_ref, m, n)
    if spec is None:
        A = _mat(a_ref, n, n)
        B = _mat(b_ref, n, m)
    else:
        # in-kernel Jacobian recompute (see _solve_bwd_kernel); a_ref/
        # b_ref carry (x_e, u_e) for edge e = t
        AB = _calls(spec.dyn_jac, _vec_obj(_vec(a_ref, n)),
                    _vec_obj(_vec(b_ref, m)), _TH0,
                    _scalar_obj(t.astype(jnp.int32)))
        A, B = _as_mat(AB[0]), _as_mat(AB[1])
    c_c = _vec(cc_ref, n)
    v_c = _vec(vvec_ref, n)
    Vc = _mat_packed(vmat_ref, n) if pack else _mat(vmat_ref, n, n)
    Lf = _mat_packed(fc_ref, n) if pack else _mat(fc_ref, n, n)

    u = [k_vec[i] + _matvec(Kg, x_p)[i] for i in range(m)]
    Ax = _matvec(A, x_p)
    Bu = _matvec(B, u)
    rhs = [c_c[i] - d * v_c[i] + Ax[i] + Bu[i] for i in range(n)]
    sd = jnp.sqrt(d)
    sdi = 1.0 / sd
    x_c_scaled = _cho_solve_vec(Lf, [sdi * rhs[i] for i in range(n)])
    x_c = [sd * x_c_scaled[i] for i in range(n)]
    y_c = [v_c[i] + _matvec(Vc, x_c)[i] for i in range(n)]

    _store_v(u_out, u)
    _store_v(x_out, x_c)
    _store_v(y_out, y_c)
    for i in range(n):
        x_scr[i] = _t(x_c[i])


# ---------------------------------------------------------------------------
# kernel E: fused per-edge residual / gradient evaluation
# ---------------------------------------------------------------------------

def _eval_kernel(spec: FusedIterSpec, lb_u, ub_u, lb_x, ub_x,
                 xp_ref, xc_ref, u_ref, ye_ref, yc_ref,
                 zlx_ref, zlu_ref, zux_ref, zuu_ref,
                 gx_out, gu_out, ctx_out, ctu_out, cd_out, f_out, res_out,
                 f_scr, r_scr):
    """Forward grid step t = edge e: objective contribution, cost
    gradients, C^T y rows and the dynamics residual for stage e
    (reference model_callback new_x path, sip_optimal_control.cpp:55-125;
    C^T structure: helpers.cpp:1161-1250), PLUS the KKT-residual
    reductions the IPM needs (stationarity/equality inf-norms and the
    bound-complementarity min/max — emitting min/max of d*z lets the
    caller evaluate max|d*z - mu| for ANY mu from two scalars).
    Terminal-node and root-row pieces are tiny [B, n] XLA ops outside.
    Per-stage operands are index-mapped blocks (static addressing);
    bounds are trace-time scalars like the LS probe's."""
    T, n, m = spec.horizon, spec.n, spec.m
    e = pl.program_id(1)
    ei = _scalar_obj(e.astype(jnp.int32))

    xp = _vec_obj(_vec(xp_ref, n))
    ue = _vec_obj(_vec(u_ref, m))
    xc = _vec(xc_ref, n)
    ye = _vec(ye_ref, n)
    yc = _vec_obj(_vec(yc_ref, n))
    zlx = _vec(zlx_ref, n)
    zlu = _vec(zlu_ref, m)
    zux = _vec(zux_ref, n)
    zuu = _vec(zuu_ref, m)

    gx_n = _as_vec(_calls(spec.ncost_grad, xp, _TH0, ei)[0])
    ge = _calls(spec.ecost_grad, xp, ue, _TH0, ei)
    gex, geu = _as_vec(ge[0]), _as_vec(ge[1])
    vjp = _calls(spec.dyn_vjp, xp, ue, _TH0, ei, yc)
    aty, bty = _as_vec(vjp[0]), _as_vec(vjp[1])
    pred = _as_vec(_calls(spec.dyn, xp, ue, _TH0, ei)[0])
    f_e = (_calls(spec.ncost, xp, _TH0, ei)[0][()]
           + _calls(spec.ecost, xp, ue, _TH0, ei)[0][()])

    @pl.when(e == 0)
    def _():
        zero = jnp.zeros_like(f_scr[0])
        f_scr[0] = zero
        r_scr[0] = zero                       # max |stat|
        r_scr[1] = zero                       # max |c_dyn|
        r_scr[2] = zero + jnp.inf             # min d*z (lower bounds)
        r_scr[3] = zero - jnp.inf             # max d*z (lower bounds)
        r_scr[4] = zero + jnp.inf             # min d*z (upper bounds)
        r_scr[5] = zero - jnp.inf             # max d*z (upper bounds)

    f_scr[0] = f_scr[0] + _t(f_e)
    f_out[0, 0, 0] = f_scr[0]

    stat_mx = r_scr[0]
    cd_mx = r_scr[1]
    for i in range(n):
        gx_i = _t(gx_n[i] + gex[i])
        ctx_i = _t(aty[i] - ye[i])
        cd_i = _t(pred[i] - xc[i])
        gx_out[0, 0, i] = gx_i
        ctx_out[0, 0, i] = ctx_i
        cd_out[0, 0, i] = cd_i
        stat_mx = jnp.maximum(stat_mx,
                              jnp.abs(gx_i + ctx_i + zux[i] - zlx[i]))
        cd_mx = jnp.maximum(cd_mx, jnp.abs(cd_i))
    for i in range(m):
        gu_i = _t(geu[i])
        ctu_i = _t(bty[i])
        gu_out[0, 0, i] = gu_i
        ctu_out[0, 0, i] = ctu_i
        stat_mx = jnp.maximum(stat_mx,
                              jnp.abs(gu_i + ctu_i + zuu[i] - zlu[i]))
    r_scr[0] = stat_mx
    r_scr[1] = cd_mx

    # bound complementarity d*z over the finite-bound entries of this
    # stage's state (node e) and control (edge e)
    cl_mn, cl_mx = r_scr[2], r_scr[3]
    cu_mn, cu_mx = r_scr[4], r_scr[5]
    xp_t = [_t(v) for v in _as_vec(xp)]
    ue_t = [_t(v) for v in _as_vec(ue)]
    # bounds enter as PYTHON floats (weak-typed) so x64 test envs do not
    # promote the f32 tiles
    for j in range(n):
        if np.isfinite(lb_x[j]):
            v = (xp_t[j] - float(lb_x[j])) * zlx[j]
            cl_mn, cl_mx = jnp.minimum(cl_mn, v), jnp.maximum(cl_mx, v)
        if np.isfinite(ub_x[j]):
            v = (float(ub_x[j]) - xp_t[j]) * zux[j]
            cu_mn, cu_mx = jnp.minimum(cu_mn, v), jnp.maximum(cu_mx, v)
    for j in range(m):
        if np.isfinite(lb_u[j]):
            v = (ue_t[j] - float(lb_u[j])) * zlu[j]
            cl_mn, cl_mx = jnp.minimum(cl_mn, v), jnp.maximum(cl_mx, v)
        if np.isfinite(ub_u[j]):
            v = (float(ub_u[j]) - ue_t[j]) * zuu[j]
            cu_mn, cu_mx = jnp.minimum(cu_mn, v), jnp.maximum(cu_mx, v)
    r_scr[2], r_scr[3] = cl_mn, cl_mx
    r_scr[4], r_scr[5] = cu_mn, cu_mx
    for i in range(6):
        res_out[0, 0, i] = r_scr[i]


# ---------------------------------------------------------------------------
# batched wrappers (tile plumbing + pallas_call)
# ---------------------------------------------------------------------------

def _edge_bwd_spec(rows, T):
    # edge e = T-1-t; on a chain this same map reads node e (the parent)
    # from a node-indexed [T+1] array
    return pl.BlockSpec((1, 1, rows, _SUB, _LANE),
                        lambda b, t: (b, T - 1 - t, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _child_bwd_spec(rows, T):
    # child node e+1 = T-t of the backward step's edge
    return pl.BlockSpec((1, 1, rows, _SUB, _LANE),
                        lambda b, t: (b, T - t, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _edge_fwd_spec(rows):
    return pl.BlockSpec((1, 1, rows, _SUB, _LANE),
                        lambda b, t: (b, t, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _child_fwd_spec(rows):
    return pl.BlockSpec((1, 1, rows, _SUB, _LANE),
                        lambda b, t: (b, t + 1, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(rows):
    return pl.BlockSpec((1, 1, rows, _SUB, _LANE),
                        lambda b, t: (b, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _edge_shape(bb, T, rows, dtype):
    return jax.ShapeDtypeStruct((bb, T, rows, _SUB, _LANE), dtype)


def _factor_solve_batched(spec: FusedIterSpec, x, u, y, r1x, r1u, delta,
                          q, r, c, interpret=False):
    """The full fused Newton step on a batch: factor kernel -> backward
    solve kernel -> root solve -> forward rollout kernel, with every
    stage-block intermediate staying in tile layout.

    Inputs  (standard layout): x [B, N, n], u [B, E, m], y [B, N, n],
    r1x [B, N, n], r1u [B, E, m], delta [B] (uniform r2 scalar),
    q [B, N, n], r [B, E, m], c [B, N, n].
    Returns (dx [B, N, n], du [B, E, m], dy [B, N, n], status [B])."""
    from ..types import FactorStatus

    T, n, m = spec.horizon, spec.n, spec.m
    B = x.shape[0]
    dtype = jnp.float32

    pad = (-B) % _BLK
    if pad:
        def pz(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        def po(a):
            return jnp.concatenate(
                [a, jnp.ones((pad,) + a.shape[1:], a.dtype)], axis=0)
        x, u, y, q, r, c = map(pz, (x, u, y, q, r, c))
        r1x, r1u, delta = po(r1x), po(r1u), po(delta)
    Bp = B + pad
    bb = Bp // _BLK

    xt = _stiles(x, n)                 # [bb, T+1, n, 8, 128]
    ut = _stiles(u, m)
    yt = _stiles(y, n)
    r1xt = _stiles(r1x, n)
    r1ut = _stiles(r1u, m)
    dt = _stiles(delta.reshape(Bp, 1, 1), 1)
    qt = _stiles(q, n)
    rt = _stiles(r, m)
    ct = _stiles(c, n)

    # terminal carry init Q_mod[T] = d2 node_cost / dx2 + diag(r1_x[T]),
    # precomputed outside (one [B, n, n] XLA op)
    th0 = jnp.zeros((0,), dtype)
    Ti = jnp.asarray(T, jnp.int32)
    HnT = jax.vmap(lambda xv: jax.hessian(spec.ncost_orig, argnums=0)(
        xv, th0, Ti))(x[:, T]).astype(dtype)
    QT = HnT + jax.vmap(jnp.diag)(r1x[:, T])
    qTt = _stiles(QT.reshape(Bp, 1, n * n), n * n)

    grid = (bb, T)
    # Large-n models: never materialize A/B — the factor kernel skips the
    # two output streams and the solve kernels recompute the Jacobians
    # in-kernel from (x, u) (their entries mostly constant-fold for the
    # benchmark class; the streams were ~35% of chain16's HBM traffic).
    recompute_ab = n >= _GRAM_N
    # At the same threshold, the symmetric V and lower-triangular F_chol
    # streams are stored lower-packed (n(n+1)/2 rows, ~45% less traffic
    # on the dominant chain16 streams); the solve kernels read them
    # through the packed accessor.
    # n >= 6 measured: quadrotor +11% (913 -> 1017k), chain16 +15%;
    # n = 4 (cartpole, not stream-bound) measured within run noise and
    # keeps the full layout
    pack = n >= 6
    nsym = (n * (n + 1)) // 2 if pack else n * n
    base_outs = [_edge_bwd_spec(nsym, T), _edge_bwd_spec(m * n, T),
                 _edge_bwd_spec(m * m, T), _edge_bwd_spec(nsym, T)]
    base_shapes = [_edge_shape(bb, T, nsym, dtype),
                   _edge_shape(bb, T, m * n, dtype),
                   _edge_shape(bb, T, m * m, dtype),
                   _edge_shape(bb, T, nsym, dtype)]
    if recompute_ab:
        def kernel(*refs):
            ins, outs = refs[:7], refs[7:]
            _factor_kernel(spec, pack, *ins, *outs[:4], None, None,
                           *outs[4:])
        ab_outs, ab_shapes = [], []
    else:
        kernel = functools.partial(_factor_kernel, spec, pack)
        ab_outs = [_edge_bwd_spec(n * n, T), _edge_bwd_spec(n * m, T)]
        ab_shapes = [_edge_shape(bb, T, n * n, dtype),
                     _edge_shape(bb, T, n * m, dtype)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec(n * n), _edge_bwd_spec(n, T),
                  _edge_bwd_spec(m, T), _child_bwd_spec(n, T),
                  _edge_bwd_spec(n, T), _edge_bwd_spec(m, T),
                  _const_spec(1)],
        out_specs=base_outs + ab_outs + [_const_spec(nsym)],
        out_shape=base_shapes + ab_shapes
        + [_edge_shape(bb, 1, nsym, dtype)],
        scratch_shapes=[pltpu.VMEM((n * n, _SUB, _LANE), dtype)],
        interpret=interpret,
    )(qTt, xt, ut, yt, r1xt, r1ut, dt)
    vc_t, k_t, g_t, fc_t = outs[:4]
    vroot_t = outs[-1]
    if recompute_ab:
        # the solve kernels take the stage iterate where A/B blocks went
        a_bwd, b_bwd = xt, ut            # read via the same edge specs
        a_spec_bwd = _edge_bwd_spec(n, T)
        b_spec_bwd = _edge_bwd_spec(m, T)
        a_fwd_spec = _edge_fwd_spec(n)
        b_fwd_spec = _edge_fwd_spec(m)
        solve_spec = spec
    else:
        a_bwd, b_bwd = outs[4], outs[5]
        a_spec_bwd = _edge_bwd_spec(n * n, T)
        b_spec_bwd = _edge_bwd_spec(n * m, T)
        a_fwd_spec = _edge_fwd_spec(n * n)
        b_fwd_spec = _edge_fwd_spec(n * m)
        solve_spec = None

    # ----- statuses from the tiled Cholesky diagonals ---------------------
    def diag_ok(tiled, idx):
        dg = tiled[:, :, idx]                # diagonal rows
        ok = jnp.isfinite(dg) & (dg > 0)
        return jnp.all(ok, axis=(1, 2))      # [bb, 8, 128]

    if pack:
        f_diag_idx = np.asarray([(i * (i + 3)) // 2 for i in range(n)])
    else:
        f_diag_idx = np.arange(n) * (n + 1)
    f_ok = diag_ok(fc_t, f_diag_idx)
    g_ok = diag_ok(g_t, np.arange(m) * (m + 1))

    # ----- backward vector pass (root solve fused at its last step) ------
    kvec_t, vvec_t, xr_t, yr_t = pl.pallas_call(
        functools.partial(_solve_bwd_kernel, n, m, T, solve_spec, pack),
        grid=grid,
        in_specs=[_edge_bwd_spec(n, T), _child_bwd_spec(n, T),
                  _edge_bwd_spec(m, T), _child_bwd_spec(n, T),
                  _const_spec(n), _const_spec(1), _const_spec(nsym),
                  _edge_bwd_spec(nsym, T), _edge_bwd_spec(m * m, T),
                  _edge_bwd_spec(m * n, T), a_spec_bwd, b_spec_bwd],
        out_specs=[_edge_bwd_spec(m, T), _edge_bwd_spec(n, T),
                   _const_spec(n), _const_spec(n)],
        out_shape=[_edge_shape(bb, T, m, dtype),
                   _edge_shape(bb, T, n, dtype),
                   _edge_shape(bb, 1, n, dtype),
                   _edge_shape(bb, 1, n, dtype)],
        scratch_shapes=[pltpu.VMEM((n, _SUB, _LANE), dtype)],
        interpret=interpret,
    )(qt, qt, rt, ct, ct, dt, vroot_t, fc_t, g_t, k_t, a_bwd, b_bwd)

    x_root = _vuntiles(xr_t[:, 0])                       # [Bp, n]
    y_root = _vuntiles(yr_t[:, 0])

    # a failed root Cholesky surfaces as NaN in x_root (negative pivot ->
    # sqrt -> NaN), so finiteness doubles as the root F status check
    status = jnp.where(
        f_ok & g_ok
        & _unvec_flag(jnp.all(jnp.isfinite(x_root), axis=-1), bb),
        FactorStatus.SUCCESS, FactorStatus.F_FACTORIZATION_FAILURE
    ).astype(jnp.int32)
    # refine: G failures reported distinctly when F side was fine
    status = jnp.where((status != 0) & f_ok & ~g_ok,
                       jnp.int32(FactorStatus.G_FACTORIZATION_FAILURE),
                       status)
    status = status.reshape(Bp)

    u_t, x_t, y_t = pl.pallas_call(
        functools.partial(_solve_fwd_kernel, n, m, T, solve_spec, pack),
        grid=grid,
        in_specs=[_const_spec(n), _edge_fwd_spec(m), _edge_fwd_spec(m * n),
                  a_fwd_spec, b_fwd_spec,
                  _child_fwd_spec(n), _const_spec(1),
                  _edge_fwd_spec(n), _edge_fwd_spec(nsym),
                  _edge_fwd_spec(nsym)],
        out_specs=[_edge_fwd_spec(m), _edge_fwd_spec(n), _edge_fwd_spec(n)],
        out_shape=[_edge_shape(bb, T, m, dtype),
                   _edge_shape(bb, T, n, dtype),
                   _edge_shape(bb, T, n, dtype)],
        scratch_shapes=[pltpu.VMEM((n, _SUB, _LANE), dtype)],
        interpret=interpret,
    )(xr_t, kvec_t, k_t, a_bwd, b_bwd, ct, dt, vvec_t, vc_t, fc_t)

    dx = jnp.concatenate(
        [x_root[:, None], _untile_edges(x_t, n)], axis=1)
    dy = jnp.concatenate(
        [y_root[:, None], _untile_edges(y_t, n)], axis=1)
    du = _untile_edges(u_t, m)
    if pad:
        dx, du, dy, status = dx[:B], du[:B], dy[:B], status[:B]
    return dx, du, dy, status


def _untile_edges(t, rows):
    """[bb, T, rows, 8, 128] -> [B, T, rows]."""
    bb, T = t.shape[:2]
    out = jnp.transpose(t, (0, 3, 4, 1, 2))
    return out.reshape(bb * _BLK, T, rows)


def _unvec_flag(flag, bb):
    """[Bp] bool -> [bb, 8, 128] to combine with tiled flags."""
    return flag.reshape(bb, _SUB, _LANE)


def _eval_batched(spec: FusedIterSpec, bounds, x, u, y, x0, zlx, zlu,
                  zux, zuu, interpret=False):
    """Batched kernel E + the tiny terminal/root XLA pieces.

    Returns (f [B], gx [B,N,n], gu [B,E,m], ctx [B,N,n], ctu [B,E,m],
    cdyn [B,N,n], res [B,6]) where res packs the KKT-residual reductions
    [max|stat|, max|c|, min/max d*z (lower), min/max d*z (upper)]."""
    lb_u, ub_u, lb_x, ub_x = bounds
    T, n, m = spec.horizon, spec.n, spec.m
    B = x.shape[0]
    dtype = jnp.float32

    pad = (-B) % _BLK
    if pad:
        def pz(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        x, u, y, x0 = map(pz, (x, u, y, x0))
        zlx, zlu, zux, zuu = map(pz, (zlx, zlu, zux, zuu))
    Bp = B + pad
    bb = Bp // _BLK

    xt = _stiles(x, n)
    ut = _stiles(u, m)
    yt = _stiles(y, n)
    zlxt = _stiles(zlx, n)
    zlut = _stiles(zlu, m)
    zuxt = _stiles(zux, n)
    zuut = _stiles(zuu, m)

    gx_t, gu_t, ctx_t, ctu_t, cd_t, f_t, res_t = pl.pallas_call(
        functools.partial(_eval_kernel, spec, lb_u, ub_u, lb_x, ub_x),
        grid=(bb, T),
        in_specs=[_edge_fwd_spec(n), _child_fwd_spec(n), _edge_fwd_spec(m),
                  _edge_fwd_spec(n), _child_fwd_spec(n),
                  _edge_fwd_spec(n), _edge_fwd_spec(m),
                  _edge_fwd_spec(n), _edge_fwd_spec(m)],
        out_specs=[_edge_fwd_spec(n), _edge_fwd_spec(m), _edge_fwd_spec(n),
                   _edge_fwd_spec(m), _edge_fwd_spec(n), _const_spec(1),
                   _const_spec(6)],
        out_shape=[_edge_shape(bb, T, n, dtype),
                   _edge_shape(bb, T, m, dtype),
                   _edge_shape(bb, T, n, dtype),
                   _edge_shape(bb, T, m, dtype),
                   _edge_shape(bb, T, n, dtype),
                   _edge_shape(bb, 1, 1, dtype),
                   _edge_shape(bb, 1, 6, dtype)],
        scratch_shapes=[pltpu.VMEM((1, _SUB, _LANE), dtype),
                        pltpu.VMEM((6, _SUB, _LANE), dtype)],
        interpret=interpret,
    )(xt, xt, ut, yt, yt, zlxt, zlut, zuxt, zuut)

    # terminal node + root row, tiny [B, n] XLA ops on the originals
    th0 = jnp.zeros((0,), dtype)
    Ti = jnp.asarray(T, jnp.int32)
    xT = x[:, T]
    gT = jax.vmap(lambda xv: jax.grad(spec.ncost_orig, argnums=0)(
        xv, th0, Ti))(xT).astype(dtype)
    fT = jax.vmap(lambda xv: spec.ncost_orig(xv, th0, Ti))(xT).astype(dtype)

    f = _vuntiles(f_t[:, 0])[:, 0] + fT
    gx = jnp.concatenate([_untile_edges(gx_t, n), gT[:, None]], axis=1)
    ctx = jnp.concatenate([_untile_edges(ctx_t, n), -y[:, T][:, None]],
                          axis=1)
    cdyn = jnp.concatenate([(x0 - x[:, 0])[:, None],
                            _untile_edges(cd_t, n)], axis=1)
    gu = _untile_edges(gu_t, m)
    ctu = _untile_edges(ctu_t, m)

    # merge the terminal node's rows into the kernel's reductions
    res = _vuntiles(res_t[:, 0])                         # [Bp, 6]
    statT = gT - y[:, T] + zux[:, T] - zlx[:, T]
    stat_mx = jnp.maximum(res[:, 0], jnp.max(jnp.abs(statT), axis=-1))
    cd_mx = jnp.maximum(res[:, 1],
                        jnp.max(jnp.abs(x0 - x[:, 0]), axis=-1))
    cl_mn, cl_mx = res[:, 2], res[:, 3]
    cu_mn, cu_mx = res[:, 4], res[:, 5]
    for j in range(n):
        if np.isfinite(lb_x[j]):
            v = (xT[:, j] - float(lb_x[j])) * zlx[:, T, j]
            cl_mn, cl_mx = jnp.minimum(cl_mn, v), jnp.maximum(cl_mx, v)
        if np.isfinite(ub_x[j]):
            v = (float(ub_x[j]) - xT[:, j]) * zux[:, T, j]
            cu_mn, cu_mx = jnp.minimum(cu_mn, v), jnp.maximum(cu_mx, v)
    res = jnp.stack([stat_mx, cd_mx, cl_mn, cl_mx, cu_mn, cu_mx],
                    axis=-1).astype(dtype)

    if pad:
        f, gx, gu = f[:B], gx[:B], gu[:B]
        ctx, ctu, cdyn, res = ctx[:B], ctu[:B], cdyn[:B], res[:B]
    return f, gx, gu, ctx, ctu, cdyn, res


# ---------------------------------------------------------------------------
# pure-JAX reference implementations (unbatched path, CPU fallback, and
# the parity oracle for the kernels)
# ---------------------------------------------------------------------------

def _eval_reference(spec: FusedIterSpec, bounds, x, u, y, x0,
                    zlx, zlu, zux, zuu):
    """Per-scenario pure-JAX equivalent of kernel E (same math as
    model.py's eval path restricted to the unconstrained chain),
    including the packed KKT-residual reductions."""
    lb_u, ub_u, lb_x, ub_x = bounds
    T, n, m = spec.horizon, spec.n, spec.m
    th0 = jnp.zeros((0,), x.dtype)
    ts = jnp.arange(T)
    xp, xc = x[:-1], x[1:]
    yc = y[1:]

    pred = jax.vmap(spec.dyn_orig, (0, 0, None, 0))(xp, u, th0, ts)
    cdyn = jnp.concatenate([(x0 - x[0])[None], pred - xc], axis=0)
    f = (jnp.sum(jax.vmap(spec.ncost_orig, (0, None, 0))(
        x, th0, jnp.arange(T + 1)))
        + jnp.sum(jax.vmap(spec.ecost_orig, (0, 0, None, 0))(
            xp, u, th0, ts)))
    gx = jax.vmap(jax.grad(spec.ncost_orig, argnums=0),
                  (0, None, 0))(x, th0, jnp.arange(T + 1))
    ge = jax.vmap(jax.grad(spec.ecost_orig, argnums=(0, 1)),
                  (0, 0, None, 0))(xp, u, th0, ts)
    gx = gx.at[:-1].add(ge[0])
    gu = ge[1]
    vjp = jax.vmap(
        lambda xv, uv, i, yv: jax.grad(
            lambda a, b_: jnp.dot(yv, spec.dyn_orig(a, b_, th0, i)),
            argnums=(0, 1))(xv, uv), (0, 0, 0, 0))(xp, u, ts, yc)
    ctx = jnp.concatenate([vjp[0], jnp.zeros((1, n), x.dtype)],
                          axis=0) - y
    ctu = vjp[1]

    stat_mx = jnp.maximum(
        jnp.max(jnp.abs(gx + ctx + zux - zlx), initial=0.0),
        jnp.max(jnp.abs(gu + ctu + zuu - zlu), initial=0.0))
    cd_mx = jnp.max(jnp.abs(cdyn), initial=0.0)
    inf = jnp.asarray(jnp.inf, x.dtype)
    cl_mn, cl_mx, cu_mn, cu_mx = inf, -inf, inf, -inf
    for j in range(n):
        if np.isfinite(lb_x[j]):
            v = (x[:, j] - lb_x[j]) * zlx[:, j]
            cl_mn = jnp.minimum(cl_mn, jnp.min(v))
            cl_mx = jnp.maximum(cl_mx, jnp.max(v))
        if np.isfinite(ub_x[j]):
            v = (ub_x[j] - x[:, j]) * zux[:, j]
            cu_mn = jnp.minimum(cu_mn, jnp.min(v))
            cu_mx = jnp.maximum(cu_mx, jnp.max(v))
    for j in range(m):
        if np.isfinite(lb_u[j]):
            v = (u[:, j] - lb_u[j]) * zlu[:, j]
            cl_mn = jnp.minimum(cl_mn, jnp.min(v))
            cl_mx = jnp.maximum(cl_mx, jnp.max(v))
        if np.isfinite(ub_u[j]):
            v = (ub_u[j] - u[:, j]) * zuu[:, j]
            cu_mn = jnp.minimum(cu_mn, jnp.min(v))
            cu_mx = jnp.maximum(cu_mx, jnp.max(v))
    res = jnp.stack([stat_mx, cd_mx, cl_mn, cl_mx, cu_mn, cu_mx])
    return f, gx, gu, ctx, ctu, cdyn, res.astype(x.dtype)


def _stage_lqr_data(spec: FusedIterSpec, x, u, y, r1x, r1u, delta, q, r, c):
    """Per-scenario LQRData via plain autodiff — the reference
    implementation the fused factor/solve kernels are tested against
    (identical math to kkt_factor's condensation restricted to the
    unconstrained chain, helpers.cpp:297-354)."""
    from .lqr import LQRData

    T, n, m = spec.horizon, spec.n, spec.m
    th0 = jnp.zeros((0,), x.dtype)
    ts = jnp.arange(T)
    xp = x[:-1]

    AB = jax.vmap(jax.jacfwd(spec.dyn_orig, argnums=(0, 1)),
                  (0, 0, None, 0))(xp, u, th0, ts)
    Hn = jax.vmap(jax.hessian(spec.ncost_orig, argnums=0),
                  (0, None, 0))(x, th0, jnp.arange(T + 1))
    if spec.exact:
        def elag(xv, uv, i, yv):
            return (spec.ecost_orig(xv, uv, th0, i)
                    + jnp.dot(yv, spec.dyn_orig(xv, uv, th0, i)))
        He = jax.vmap(jax.hessian(elag, argnums=(0, 1)),
                      (0, 0, 0, 0))(xp, u, ts, y[1:])
    else:
        He = jax.vmap(jax.hessian(spec.ecost_orig, argnums=(0, 1)),
                      (0, 0, None, 0))(xp, u, th0, ts)
    Q = Hn.at[:-1].add(He[0][0])
    Q = Q + jax.vmap(jnp.diag)(r1x)
    R = He[1][1] + jax.vmap(jnp.diag)(r1u)
    M = He[0][1]
    dvec = jnp.full((T + 1, n), delta, x.dtype)
    data = LQRData(Q=Q, q=q, c=c, delta=dvec, A=AB[0], B=AB[1], M=M, R=R,
                   r=r)
    # model closure constants built under an x64 env promote the autodiff
    # blocks to f64; keep the reference path in the iterate's dtype
    return jax.tree.map(lambda a: a.astype(x.dtype), data)


def _factor_solve_reference(spec: FusedIterSpec, x, u, y, r1x, r1u, delta,
                            q, r, c):
    from .lqr import _factor_chain, _solve_chain

    data = _stage_lqr_data(spec, x, u, y, r1x, r1u, delta, q, r, c)
    fact = _factor_chain(data)
    sol = _solve_chain(data, fact)
    return sol.x, sol.u, sol.y, fact.status


# ---------------------------------------------------------------------------
# custom_vmap entry points
# ---------------------------------------------------------------------------

def make_fused_eval(spec: FusedIterSpec, bounds):
    @custom_vmap
    def fused_eval(x, u, y, x0, zlx, zlu, zux, zuu):
        return _eval_reference(spec, bounds, x, u, y, x0, zlx, zlu,
                               zux, zuu)

    @fused_eval.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(a, b):
            return a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        args = tuple(map(bcast, args, in_batched))
        if (args[0].dtype != jnp.float32 or axis_size < 2
                or not _use_kernels()):
            out = jax.vmap(
                lambda *a: _eval_reference(spec, bounds, *a))(*args)
        else:
            out = _eval_batched(spec, bounds, *args,
                                interpret=_interpret())
        return out, (True,) * 7

    return fused_eval


def make_fused_factor_solve(spec: FusedIterSpec):
    @custom_vmap
    def fused_factor_solve(x, u, y, r1x, r1u, delta, q, r, c):
        return _factor_solve_reference(spec, x, u, y, r1x, r1u, delta,
                                       q, r, c)

    @fused_factor_solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(a, b):
            return a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        args = tuple(map(bcast, args, in_batched))
        if (args[0].dtype != jnp.float32 or axis_size < 2
                or not _use_kernels()):
            out = jax.vmap(
                lambda *a: _factor_solve_reference(spec, *a))(*args)
        else:
            out = _factor_solve_batched(spec, *args,
                                        interpret=_interpret())
        return out, (True,) * 4

    return fused_factor_solve
