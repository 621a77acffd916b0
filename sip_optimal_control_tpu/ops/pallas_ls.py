"""Fused Pallas TPU kernel for the line-search probe (chain topologies).

The interior-point line search evaluates the merit function at `chunk`
candidate step sizes per trip — the reference's `new_x=false` model_callback
path (reference: sip_optimal_control.cpp:47-53: objective/residuals only, no
derivatives).  Under `vmap` the pure-XLA probe materializes
[batch, chunk, T, m]-shaped fusions whose layouts lane-pad the small minor
dims (T=50 -> 128 lanes), sustaining 40-50 GB/s against an 819 GB/s roof;
the r3/r4 device traces attribute ~45% of every IPM trip to them.

This kernel instead packs the scenario batch onto the vector unit
(8 sublanes x 128 lanes per block, like ops/pallas_riccati.py), keeps the
whole trial state VMEM-resident, and evaluates ALL chunk candidates in one
pass over the horizon.  The user's stage functions (dynamics, node/edge
cost) run inside the kernel through the tile-scalar jaxpr interpreter
(ops/tile_interp.py): every logical vector element is one [8, 128] tile,
all small-vector ops unroll at trace time, and closure constants fold in
as scalar literals.  (The obvious alternative — double-`vmap` over the
tile axes — measured ~300x slower in-kernel: 27 ms vs 89 us per probe.)

Scope (checked by `build_fused_spec`): chain topology, uniform dims,
float32, no global theta, no equality/inequality constraint functions
(box bounds only — the kernel handles the bound log-barrier terms, baked
as trace-time scalars), stage functions within the interpreter's
primitive set.  Everything else falls back to the pure-JAX probe; results
match the fallback to f32 roundoff (accumulation order differs).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tile_interp import eval_jaxpr_tiles, supports

_SUB, _LANE = 8, 128
_BLK = _SUB * _LANE
_EPS = 1e-30


class FusedLSSpec(NamedTuple):
    """Static model payload for the fused probe (built by
    build_fused_spec): stage-function jaxprs (with concrete closure
    consts) for the kernel, original closures for the pure-JAX fallback,
    and shapes."""

    dyn_jaxpr: object       # ClosedJaxpr of (x, u, th, i) -> [n]
    ncost_jaxpr: object     # ClosedJaxpr of (x, th, i) -> scalar
    ecost_jaxpr: object     # ClosedJaxpr of (x, u, th, i) -> scalar
    dyn_orig: object
    ncost_orig: object
    ecost_orig: object
    horizon: int
    n: int
    m: int


def build_fused_spec(dynamics, node_cost, edge_cost, horizon, n, m):
    """Trace each stage function to a jaxpr and verify (a) every closure
    constant is concrete (a closure over a per-solve traced value is out
    of scope) and (b) every primitive is supported by the tile
    interpreter.  Returns None when ineligible."""
    th0 = jnp.zeros((0,), jnp.float32)
    ex_x = jnp.zeros((n,), jnp.float32)
    ex_u = jnp.zeros((m,), jnp.float32)
    ex_i = jnp.zeros((), jnp.int32)

    try:
        dj = jax.make_jaxpr(
            lambda x, u, th, i: dynamics(x, u, th, i))(ex_x, ex_u, th0,
                                                       ex_i)
        nj = jax.make_jaxpr(
            lambda x, th, i: node_cost(x, th, i))(ex_x, th0, ex_i)
        ej = jax.make_jaxpr(
            lambda x, u, th, i: edge_cost(x, u, th, i))(ex_x, ex_u, th0,
                                                        ex_i)
    except Exception:
        return None
    for cj in (dj, nj, ej):
        for c in cj.consts:
            if isinstance(c, jax.core.Tracer):
                return None
        if not supports(cj.jaxpr):
            return None
    return FusedLSSpec(dyn_jaxpr=dj, ncost_jaxpr=nj, ecost_jaxpr=ej,
                       dyn_orig=dynamics, ncost_orig=node_cost,
                       ecost_orig=edge_cost, horizon=horizon, n=n, m=m)


class TreeLSSpec(NamedTuple):
    """Static payload for the TREE-topology fused probe: per-stage jaxprs
    with the stage index BAKED IN at trace time (so stage functions that
    index closed-over arrays by i — e.g. the scenario tree's per-edge
    probabilities/disturbances — constant-fold instead of tracing to an
    unsupported gather), plus the topology as static ints."""

    node_jaxprs: tuple    # N of (x, th) -> scalar
    ecost_jaxprs: tuple   # E of (xp, u, th) -> scalar
    dyn_jaxprs: tuple     # E of (xp, u, th) -> [n]
    dyn_orig: object
    ncost_orig: object
    ecost_orig: object
    parents: tuple
    children: tuple
    root: int
    num_nodes: int
    n: int
    m: int


def build_fused_tree_spec(dynamics, node_cost, edge_cost, topology, n, m):
    """Tree analogue of build_fused_spec: traces one tiny jaxpr per node
    cost / edge cost / edge dynamics with the index baked as a literal.
    Returns None when ineligible (traced closure consts or unsupported
    primitives)."""
    th0 = jnp.zeros((0,), jnp.float32)
    ex_x = jnp.zeros((n,), jnp.float32)
    ex_u = jnp.zeros((m,), jnp.float32)
    parents = tuple(int(p) for p in topology.edge_parents)
    children = tuple(int(c) for c in topology.edge_children)
    N = topology.num_edges + 1

    def trace(fn, *args):
        cj = jax.make_jaxpr(fn)(*args)
        for c in cj.consts:
            if isinstance(c, jax.core.Tracer):
                raise ValueError
        if not supports(cj.jaxpr):
            raise ValueError
        return cj

    try:
        # the index is baked as a PYTHON int so closed-over-array
        # indexing folds to a static slice at trace time (a concrete jnp
        # index still traces to dynamic_slice)
        node_j = tuple(
            trace(lambda x, th, i=i: node_cost(x, th, i), ex_x, th0)
            for i in range(N))
        ecost_j = tuple(
            trace(lambda xp, u, th, e=e: edge_cost(xp, u, th, e),
                  ex_x, ex_u, th0)
            for e in range(topology.num_edges))
        dyn_j = tuple(
            trace(lambda xp, u, th, e=e: dynamics(xp, u, th, e),
                  ex_x, ex_u, th0)
            for e in range(topology.num_edges))
    except Exception:
        return None
    return TreeLSSpec(node_jaxprs=node_j, ecost_jaxprs=ecost_j,
                      dyn_jaxprs=dyn_j, dyn_orig=dynamics,
                      ncost_orig=node_cost, ecost_orig=edge_cost,
                      parents=parents, children=children,
                      root=topology.root, num_nodes=N, n=n, m=m)


def _vec_obj(tiles):
    out = np.empty(len(tiles), dtype=object)
    for i, t in enumerate(tiles):
        out[i] = t
    return out


def _scalar_obj(v):
    out = np.empty((), dtype=object)
    out[()] = v
    return out


def _call(cj, *args):
    return eval_jaxpr_tiles(cj.jaxpr, cj.consts, *args)[0]


def _probe_kernel(spec: FusedLSSpec, chunk: int,
                  lb_u, ub_u, lb_x, ub_x,
                  x_ref, dx_ref, u_ref, du_ref, x0_ref, al_ref,
                  f_out, th_out, lb_out):
    """One batch block: accumulate objective, |c| infeasibility and bound
    log-barrier over the whole chain for every candidate alpha.

    Bound values are trace-time scalars: the log-barrier terms unroll
    only over the finite-bound entries."""
    T, n, m = spec.horizon, spec.n, spec.m
    th0 = np.empty((0,), dtype=object)

    alphas = [al_ref[k] for k in range(chunk)]

    def logb_terms(v, lb, ub):
        # -inf for non-positive bound distances so infeasible candidates
        # are rejected exactly like the standard probe (whose f32
        # _EPS=1e-300 clamp underflows to 0 -> log(0) = -inf); ADVICE r4.
        def safe_log(d):
            return jnp.where(d > 0, jnp.log(jnp.maximum(d, _EPS)),
                             -jnp.inf)
        out = None
        if np.isfinite(lb):
            out = safe_log(v - lb)
        if np.isfinite(ub):
            t = safe_log(ub - v)
            out = t if out is None else out + t
        return out

    def body(t, carry):
        f_acc, th_acc, lb_acc = carry
        ti = _scalar_obj(jnp.asarray(t, jnp.int32))
        xp = x_ref[pl.ds(t * n, n)]          # [n, 8, 128]
        dxp = dx_ref[pl.ds(t * n, n)]
        xc = x_ref[pl.ds((t + 1) * n, n)]
        dxc = dx_ref[pl.ds((t + 1) * n, n)]
        ue = u_ref[pl.ds(t * m, m)]
        due = du_ref[pl.ds(t * m, m)]
        f_n, th_n, lb_n = [], [], []
        for k in range(chunk):
            a = alphas[k]
            xpa = [xp[j] + a * dxp[j] for j in range(n)]
            xca = [xc[j] + a * dxc[j] for j in range(n)]
            uea = [ue[j] + a * due[j] for j in range(m)]
            xpa_o = _vec_obj(xpa)
            uea_o = _vec_obj(uea)
            pred = _call(spec.dyn_jaxpr, xpa_o, uea_o, th0, ti)
            th_k = functools.reduce(
                lambda p, q: p + q,
                [jnp.abs(pred[j] - xca[j]) for j in range(n)])
            f_k = (_call(spec.ncost_jaxpr, xpa_o, th0, ti)[()]
                   + _call(spec.ecost_jaxpr, xpa_o, uea_o, th0, ti)[()])
            lb_k = None
            for j in range(m):
                t_ = logb_terms(uea[j], lb_u[j], ub_u[j])
                if t_ is not None:
                    lb_k = t_ if lb_k is None else lb_k + t_
            for j in range(n):
                t_ = logb_terms(xpa[j], lb_x[j], ub_x[j])
                if t_ is not None:
                    lb_k = t_ if lb_k is None else lb_k + t_
            if lb_k is None:
                lb_k = jnp.zeros((_SUB, _LANE), jnp.float32)
            # stage results keep the jaxpr's traced dtype (f64 under an
            # x64 test env); the accumulators are always f32
            f_n.append(f_acc[k] + f_k.astype(jnp.float32))
            th_n.append(th_acc[k] + th_k.astype(jnp.float32))
            lb_n.append(lb_acc[k] + lb_k.astype(jnp.float32))
        return (f_n, th_n, lb_n)

    zero = jnp.zeros((_SUB, _LANE), jnp.float32)
    init = ([zero] * chunk, [zero] * chunk, [zero] * chunk)
    f_acc, th_acc, lb_acc = jax.lax.fori_loop(0, T, body, init)

    # terminal node (i = T) + root row |x0 - x_root(alpha)|
    xT = x_ref[pl.ds(T * n, n)]
    dxT = dx_ref[pl.ds(T * n, n)]
    x0v = x0_ref[...]
    xr = x_ref[pl.ds(0, n)]
    dxr = dx_ref[pl.ds(0, n)]
    iT = _scalar_obj(jnp.asarray(T, jnp.int32))
    for k in range(chunk):
        a = alphas[k]
        xTa = [xT[j] + a * dxT[j] for j in range(n)]
        f_k = f_acc[k] + _call(spec.ncost_jaxpr, _vec_obj(xTa), th0,
                               iT)[()]
        th_k = th_acc[k] + functools.reduce(
            lambda p, q: p + q,
            [jnp.abs(x0v[j] - (xr[j] + a * dxr[j])) for j in range(n)])
        lb_k = lb_acc[k]
        for j in range(n):
            t_ = logb_terms(xTa[j], lb_x[j], ub_x[j])
            if t_ is not None:
                lb_k = lb_k + t_
        # user-fn results keep their traced dtype (f64 under an x64 test
        # env); outputs are always f32
        f_out[k] = f_k.astype(jnp.float32)
        th_out[k] = th_k.astype(jnp.float32)
        lb_out[k] = lb_k.astype(jnp.float32)


def _to_tiles(x, rows):
    """[B, rows] -> [bb, rows, 8, 128] (batch onto the vector unit)."""
    B = x.shape[0]
    bb = B // _BLK
    t = x.reshape(bb, _SUB, _LANE, rows)
    return jnp.transpose(t, (0, 3, 1, 2))


def _from_tiles(x):
    """[bb, rows, 8, 128] -> [B, rows]."""
    bb, rows = x.shape[:2]
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(bb * _BLK, rows)


def _probe_pallas_batched(spec: FusedLSSpec, bounds, x, dx, u, du, x0,
                          alphas, interpret=False):
    """Batched fused probe: returns (f, theta, logb), each [B, chunk]."""
    lb_u, ub_u, lb_x, ub_x = bounds
    B = x.shape[0]
    chunk = alphas.shape[-1]
    T, n, m = spec.horizon, spec.n, spec.m
    dtype = jnp.float32

    pad = (-B) % _BLK
    if pad:
        def pad0(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        # inert alphas=0 keep padded lanes at the (finite zero) base point
        x, dx, u, du, x0, alphas = map(pad0, (x, dx, u, du, x0, alphas))
    Bp = B + pad
    bb = Bp // _BLK

    xt = _to_tiles(x.reshape(Bp, -1), (T + 1) * n)
    dxt = _to_tiles(dx.reshape(Bp, -1), (T + 1) * n)
    ut = _to_tiles(u.reshape(Bp, -1), T * m)
    dut = _to_tiles(du.reshape(Bp, -1), T * m)
    x0t = _to_tiles(x0.reshape(Bp, -1), n)
    alt = _to_tiles(alphas, chunk)

    def spec_row(rows):
        return pl.BlockSpec((1, rows, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, chunk, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bb, chunk, _SUB, _LANE), dtype)

    kernel = functools.partial(_probe_kernel, spec, chunk,
                               lb_u, ub_u, lb_x, ub_x)

    def kernel_wrap(*refs):
        # drop the leading block dim of each ref via views
        kernel(*[r.at[0] for r in refs])

    f_t, th_t, lb_t = pl.pallas_call(
        kernel_wrap,
        grid=(bb,),
        in_specs=[spec_row((T + 1) * n), spec_row((T + 1) * n),
                  spec_row(T * m), spec_row(T * m), spec_row(n),
                  spec_row(chunk)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(xt, dxt, ut, dut, x0t, alt)

    f = _from_tiles(f_t)
    th = _from_tiles(th_t)
    lb = _from_tiles(lb_t)
    if pad:
        f, th, lb = f[:B], th[:B], lb[:B]
    return f, th, lb


def _probe_reference(spec: FusedLSSpec, bounds, x, dx, u, du, x0, alphas):
    """Pure-JAX probe (unbatched / fallback): same outputs, same math,
    using the original stage closures."""
    lb_u, ub_u, lb_x, ub_x = bounds
    T, n, m = spec.horizon, spec.n, spec.m
    th0 = jnp.zeros((0,), x.dtype)
    ts = jnp.arange(T)

    def one(a):
        xa = x + a * dx
        ua = u + a * du
        xp = xa[:-1]
        pred = jax.vmap(spec.dyn_orig, (0, 0, None, 0))(xp, ua, th0, ts)
        th = (jnp.sum(jnp.abs(pred - xa[1:]))
              + jnp.sum(jnp.abs(x0 - xa[0])))
        f = (jnp.sum(jax.vmap(spec.ncost_orig, (0, None, 0))(
            xa, th0, jnp.arange(T + 1)))
            + jnp.sum(jax.vmap(spec.ecost_orig, (0, 0, None, 0))(
                xp, ua, th0, ts)))

        def logb(v, lb, ub):
            # same -inf-on-violation semantics as the kernel (ADVICE r4)
            def safe_log(d):
                return jnp.where(d > 0, jnp.log(jnp.maximum(d, _EPS)),
                                 -jnp.inf)
            out = jnp.zeros((), x.dtype)
            for j in range(v.shape[-1]):
                if np.isfinite(lb[j]):
                    out = out + jnp.sum(safe_log(v[..., j] - lb[j]))
                if np.isfinite(ub[j]):
                    out = out + jnp.sum(safe_log(ub[j] - v[..., j]))
            return out

        lb_sum = logb(ua, lb_u, ub_u) + logb(xa, lb_x, ub_x)
        return f, th, lb_sum

    return jax.vmap(one, 0, 0)(alphas)


def _probe_kernel_tree(spec: TreeLSSpec, chunk,
                       lb_u, ub_u, lb_x, ub_x,
                       x_ref, dx_ref, u_ref, du_ref, x0_ref, al_ref,
                       f_out, th_out, lb_out):
    """Tree-topology probe: the node/edge loops unroll with STATIC parent/
    child indices (any rooted tree), one baked-index jaxpr per stage."""
    N, E = spec.num_nodes, len(spec.parents)
    n, m = spec.n, spec.m
    th0 = np.empty((0,), dtype=object)
    alphas = [al_ref[k] for k in range(chunk)]

    def safe_log(d):
        return jnp.where(d > 0, jnp.log(jnp.maximum(d, _EPS)), -jnp.inf)

    def logb_terms(v, lb, ub):
        out = None
        if np.isfinite(lb):
            out = safe_log(v - lb)
        if np.isfinite(ub):
            t = safe_log(ub - v)
            out = t if out is None else out + t
        return out

    x0v = x0_ref[...]
    for k in range(chunk):
        a = alphas[k]

        def xa(i):
            return [x_ref[i * n + j] + a * dx_ref[i * n + j]
                    for j in range(n)]

        f_k = None
        lb_k = None
        for i in range(N):
            xi = xa(i)
            c = eval_jaxpr_tiles(spec.node_jaxprs[i].jaxpr,
                                 spec.node_jaxprs[i].consts,
                                 _vec_obj(xi), th0)[0][()]
            f_k = c if f_k is None else f_k + c
            for j in range(n):
                t_ = logb_terms(xi[j], lb_x[j], ub_x[j])
                if t_ is not None:
                    lb_k = t_ if lb_k is None else lb_k + t_
        th_k = None
        for e in range(E):
            xp = xa(spec.parents[e])
            xc = xa(spec.children[e])
            ue = [u_ref[e * m + j] + a * du_ref[e * m + j]
                  for j in range(m)]
            xp_o, ue_o = _vec_obj(xp), _vec_obj(ue)
            f_k = f_k + eval_jaxpr_tiles(
                spec.ecost_jaxprs[e].jaxpr, spec.ecost_jaxprs[e].consts,
                xp_o, ue_o, th0)[0][()]
            pred = eval_jaxpr_tiles(
                spec.dyn_jaxprs[e].jaxpr, spec.dyn_jaxprs[e].consts,
                xp_o, ue_o, th0)[0]
            t_ = functools.reduce(
                lambda p, q: p + q,
                [jnp.abs(pred[j] - xc[j]) for j in range(n)])
            th_k = t_ if th_k is None else th_k + t_
            for j in range(m):
                t2 = logb_terms(ue[j], lb_u[j], ub_u[j])
                if t2 is not None:
                    lb_k = t2 if lb_k is None else lb_k + t2
        xr = xa(spec.root)
        th_k = th_k + functools.reduce(
            lambda p, q: p + q,
            [jnp.abs(x0v[j] - xr[j]) for j in range(n)])
        zero = jnp.zeros((_SUB, _LANE), jnp.float32)
        if lb_k is None:
            lb_k = zero
        f_out[k] = (f_k + zero).astype(jnp.float32)
        th_out[k] = (th_k + zero).astype(jnp.float32)
        lb_out[k] = (lb_k + zero).astype(jnp.float32)


def _probe_pallas_batched_tree(spec: TreeLSSpec, bounds, x, dx, u, du, x0,
                               alphas, interpret=False):
    """Batched tree probe: same tiling/layout as the chain probe, node
    and edge axes flattened to rows."""
    lb_u, ub_u, lb_x, ub_x = bounds
    B = x.shape[0]
    chunk = alphas.shape[-1]
    N, E, n, m = spec.num_nodes, len(spec.parents), spec.n, spec.m
    dtype = jnp.float32

    pad = (-B) % _BLK
    if pad:
        def pad0(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        x, dx, u, du, x0, alphas = map(pad0, (x, dx, u, du, x0, alphas))
    Bp = B + pad
    bb = Bp // _BLK

    xt = _to_tiles(x.reshape(Bp, -1), N * n)
    dxt = _to_tiles(dx.reshape(Bp, -1), N * n)
    ut = _to_tiles(u.reshape(Bp, -1), E * m)
    dut = _to_tiles(du.reshape(Bp, -1), E * m)
    x0t = _to_tiles(x0.reshape(Bp, -1), n)
    alt = _to_tiles(alphas, chunk)

    def spec_row(rows):
        return pl.BlockSpec((1, rows, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, chunk, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bb, chunk, _SUB, _LANE), dtype)

    kernel = functools.partial(_probe_kernel_tree, spec, chunk,
                               lb_u, ub_u, lb_x, ub_x)

    def kernel_wrap(*refs):
        kernel(*[r.at[0] for r in refs])

    f_t, th_t, lb_t = pl.pallas_call(
        kernel_wrap,
        grid=(bb,),
        in_specs=[spec_row(N * n), spec_row(N * n),
                  spec_row(E * m), spec_row(E * m), spec_row(n),
                  spec_row(chunk)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(xt, dxt, ut, dut, x0t, alt)

    f = _from_tiles(f_t)
    th = _from_tiles(th_t)
    lb = _from_tiles(lb_t)
    if pad:
        f, th, lb = f[:B], th[:B], lb[:B]
    return f, th, lb


def _probe_reference_tree(spec: TreeLSSpec, bounds, x, dx, u, du, x0,
                          alphas):
    """Pure-JAX tree probe (unbatched / fallback): same outputs via the
    original stage closures with concrete stage indices."""
    lb_u, ub_u, lb_x, ub_x = bounds
    N, E, n, m = spec.num_nodes, len(spec.parents), spec.n, spec.m
    th0 = jnp.zeros((0,), x.dtype)
    par = np.asarray(spec.parents)
    chl = np.asarray(spec.children)

    def one(a):
        xa = x + a * dx
        ua = u + a * du
        ids = jnp.arange(N)
        f = jnp.sum(jax.vmap(spec.ncost_orig, (0, None, 0))(xa, th0, ids))
        eids = jnp.arange(E)
        xp = xa[par]
        f = f + jnp.sum(jax.vmap(spec.ecost_orig, (0, 0, None, 0))(
            xp, ua, th0, eids))
        pred = jax.vmap(spec.dyn_orig, (0, 0, None, 0))(xp, ua, th0, eids)
        th = (jnp.sum(jnp.abs(pred - xa[chl]))
              + jnp.sum(jnp.abs(x0 - xa[spec.root])))

        def safe_log(d):
            return jnp.where(d > 0, jnp.log(jnp.maximum(d, _EPS)),
                             -jnp.inf)

        def logb(v, lb, ub):
            out = jnp.zeros((), x.dtype)
            for j in range(v.shape[-1]):
                if np.isfinite(lb[j]):
                    out = out + jnp.sum(safe_log(v[..., j] - lb[j]))
                if np.isfinite(ub[j]):
                    out = out + jnp.sum(safe_log(ub[j] - v[..., j]))
            return out

        lb_sum = logb(ua, lb_u, ub_u) + logb(xa, lb_x, ub_x)
        return f, th, lb_sum

    return jax.vmap(one, 0, 0)(alphas)


def make_fused_probe(spec, bounds):
    """Build the custom_vmap probe for either topology class: chain
    (FusedLSSpec) or general tree (TreeLSSpec)."""
    if isinstance(spec, TreeLSSpec):
        return _make_tree_probe(spec, bounds)
    return _make_chain_probe(spec, bounds)


def _make_tree_probe(spec: TreeLSSpec, bounds):
    @custom_vmap
    def probe(x, dx, u, du, x0, alphas):
        return _probe_reference_tree(spec, bounds, x, dx, u, du, x0,
                                     alphas)

    @probe.def_vmap
    def _rule(axis_size, in_batched, x, dx, u, du, x0, alphas):
        def bcast(a, b):
            return a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)

        x, dx, u, du, x0, alphas = map(
            bcast, (x, dx, u, du, x0, alphas), in_batched)
        if (x.dtype != jnp.float32 or axis_size < 2
                or jax.default_backend() != "tpu"):
            out = jax.vmap(lambda *a: _probe_reference_tree(
                spec, bounds, *a))(x, dx, u, du, x0, alphas)
        else:
            out = _probe_pallas_batched_tree(spec, bounds, x, dx, u, du,
                                             x0, alphas)
        return out, (True, True, True)

    return probe


def _make_chain_probe(spec: FusedLSSpec, bounds):
    """Build the custom_vmap probe: (x, dx, u, du, x0, alphas[chunk]) ->
    (f, theta, logb) per candidate.  Unbatched calls use the pure-JAX
    path; under the solver's scenario vmap the whole batch enters the
    kernel."""

    @custom_vmap
    def probe(x, dx, u, du, x0, alphas):
        return _probe_reference(spec, bounds, x, dx, u, du, x0, alphas)

    @probe.def_vmap
    def _rule(axis_size, in_batched, x, dx, u, du, x0, alphas):
        def bcast(a, b):
            return a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)

        x, dx, u, du, x0, alphas = map(
            bcast, (x, dx, u, du, x0, alphas), in_batched)
        # Non-TPU backends use the vmapped pure-JAX probe: Pallas interpret
        # mode is orders of magnitude slower than the XLA probe it replaces
        # (ADVICE r4); the kernel's interpret path stays reachable for the
        # test suite via _probe_pallas_batched(..., interpret=True).
        if (x.dtype != jnp.float32 or axis_size < 2
                or jax.default_backend() != "tpu"):
            out = jax.vmap(lambda *a: _probe_reference(
                spec, bounds, *a))(x, dx, u, du, x0, alphas)
        else:
            out = _probe_pallas_batched(spec, bounds, x, dx, u, du, x0,
                                        alphas)
        return out, (True, True, True)

    return probe
