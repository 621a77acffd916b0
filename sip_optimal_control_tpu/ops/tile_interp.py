"""Tile-scalar jaxpr interpreter for Pallas TPU kernels.

Evaluates a (small) jaxpr in which every logical array is represented as a
numpy OBJECT array of the same logical shape whose elements are [8, 128]
vector-register tiles (or Python/numpy scalars).  Each primitive unrolls at
trace time into per-element full-tile VPU ops — the code shape that Mosaic
compiles well for batched-small-vector math (cf. ops/pallas_riccati.py's
entry-unrolled matrices).  The alternative — double-`vmap`ing the user
function over the tile axes — produces ops on [d, 8, 128] values, which
measured ~300x slower in-kernel (r4 microbenchmark: 27 ms vs 89 us per
line-search probe).

Closure constants of the jaxpr are concrete numpy arrays; their elements
enter the ops as scalar literals, so no constant plumbing into the kernel
is needed.

Only the primitive set used by trajectory-model stage functions is
implemented; `supports()` pre-checks a jaxpr so callers can fall back.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.extend import core as jcore


def _obj(x):
    """Normalize to a numpy object array (0-d for scalars/tiles)."""
    if isinstance(x, np.ndarray) and x.dtype == object:
        return x
    if isinstance(x, (np.ndarray, int, float, bool, np.generic)) and \
            not hasattr(x, "aval"):
        a = np.asarray(x)
        out = np.empty(a.shape, dtype=object)
        if a.shape == ():
            out[()] = a[()]
        else:
            out[...] = a
        return out
    out = np.empty((), dtype=object)
    out[()] = x
    return out


def _unary(fn):
    ufn = np.frompyfunc(fn, 1, 1)
    return lambda eqn, a: ufn(_obj(a))


def _binary(fn):
    bfn = np.frompyfunc(fn, 2, 1)
    return lambda eqn, a, b: bfn(_obj(a), _obj(b))


def _broadcast_in_dim(eqn, a):
    a = _obj(a)
    shape = eqn.params["shape"]
    bdims = eqn.params["broadcast_dimensions"]
    view_shape = [1] * len(shape)
    for i, d in enumerate(bdims):
        view_shape[d] = a.shape[i]
    return np.broadcast_to(a.reshape(view_shape), shape).copy()


def _reshape(eqn, a):
    return _obj(a).reshape(eqn.params["new_sizes"])


def _transpose(eqn, a):
    return np.transpose(_obj(a), eqn.params["permutation"])


def _squeeze(eqn, a):
    return np.squeeze(_obj(a), axis=tuple(eqn.params["dimensions"]))


def _slice(eqn, a):
    starts = eqn.params["start_indices"]
    limits = eqn.params["limit_indices"]
    strides = eqn.params["strides"] or (1,) * len(starts)
    return _obj(a)[tuple(slice(s, l, st)
                         for s, l, st in zip(starts, limits, strides))]


def _concatenate(eqn, *args):
    return np.concatenate([_obj(a) for a in args],
                          axis=eqn.params["dimension"])


def _reduce(npfn):
    def rule(eqn, a):
        axes = tuple(eqn.params["axes"])
        return _obj(npfn(_obj(a), axis=axes))
    return rule


def _dot_general(eqn, a, b):
    (ac, bc), (ab, bb) = eqn.params["dimension_numbers"]
    letters = "abcdefghijklmnopqrstuvwxyz"
    ra, rb = np.ndim(_obj(a)), np.ndim(_obj(b))
    names_a = [None] * ra
    names_b = [None] * rb
    it = iter(letters)
    for i, j in zip(ab, bb):
        c = next(it)
        names_a[i] = c
        names_b[j] = c
    for i, j in zip(ac, bc):
        c = next(it)
        names_a[i] = c
        names_b[j] = c
    for i in range(ra):
        if names_a[i] is None:
            names_a[i] = next(it)
    for j in range(rb):
        if names_b[j] is None:
            names_b[j] = next(it)
    out = ([names_a[i] for i in ab]
           + [names_a[i] for i in range(ra) if i not in ab + ac]
           + [names_b[j] for j in range(rb) if j not in bb + bc])
    expr = f"{''.join(names_a)},{''.join(names_b)}->{''.join(out)}"
    return _obj(np.einsum(expr, _obj(a), _obj(b)))


def _convert(eqn, a):
    nd = eqn.params["new_dtype"]

    def conv(t):
        if hasattr(t, "astype"):
            return t.astype(nd)
        return np.asarray(t, nd)[()]

    return np.frompyfunc(conv, 1, 1)(_obj(a))


def _select_n(eqn, which, *cases):
    def sel(p, *cs):
        if len(cs) == 2:
            return jnp.where(p, cs[1], cs[0])
        out = cs[0]
        for i in range(1, len(cs)):
            out = jnp.where(p == i, cs[i], out)
        return out
    return np.frompyfunc(sel, 1 + len(cases), 1)(_obj(which),
                                                 *[_obj(c) for c in cases])


def _split(eqn, a):
    a = _obj(a)
    sizes = eqn.params["sizes"]
    axis = eqn.params["axis"]
    outs, off = [], 0
    for s in sizes:
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(off, off + s)
        outs.append(a[tuple(sl)])
        off += s
    return tuple(outs)


def _pad(eqn, a, pv):
    """lax.pad with arbitrary low/high/interior config (appears in
    autodiff transposes of slice/concatenate)."""
    a = _obj(a)
    pval = _obj(pv)[()]
    cfg = eqn.params["padding_config"]
    lo0 = [max(lo, 0) for lo, _, _ in cfg]
    hi0 = [max(hi, 0) for _, hi, _ in cfg]
    shape = []
    for s, (lo, hi, inter) in zip(a.shape, cfg):
        core = s + (s - 1) * inter if s > 0 else 0
        shape.append(core + lo0[len(shape)] + hi0[len(shape)])
    out = np.empty(tuple(shape), dtype=object)
    out[...] = pval
    place = tuple(
        slice(l0, l0 + (s + (s - 1) * inter if s > 0 else 0), inter + 1)
        for s, l0, (_, _, inter) in zip(a.shape, lo0, cfg))
    out[place] = a
    # negative lo/hi crop the result
    crop = tuple(slice(-min(lo, 0), d - (-min(hi, 0)))
                 for d, (lo, hi, _) in zip(out.shape, cfg))
    return out[crop]


def _iota(eqn):
    shape = eqn.params["shape"]
    d = eqn.params["dimension"]
    dt = eqn.params["dtype"]
    base = np.arange(shape[d], dtype=dt)
    view = [1] * len(shape)
    view[d] = shape[d]
    return _obj(np.broadcast_to(base.reshape(view), shape).copy())


def _call_rule(eqn, *args):
    sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
    if isinstance(sub, jcore.ClosedJaxpr):
        return tuple(eval_jaxpr_tiles(sub.jaxpr, sub.consts, *args))
    return tuple(eval_jaxpr_tiles(sub, (), *args))


_RULES = {
    "add": _binary(lambda a, b: a + b),
    "add_any": _binary(lambda a, b: a + b),
    "split": _split,
    "pad": _pad,
    "sub": _binary(lambda a, b: a - b),
    "mul": _binary(lambda a, b: a * b),
    "div": _binary(lambda a, b: a / b),
    "pow": _binary(lambda a, b: a ** b),
    "max": _binary(jnp.maximum),
    "min": _binary(jnp.minimum),
    "atan2": _binary(jnp.arctan2),
    "rem": _binary(jnp.remainder),
    "eq": _binary(lambda a, b: a == b),
    "ne": _binary(lambda a, b: a != b),
    "lt": _binary(lambda a, b: a < b),
    "le": _binary(lambda a, b: a <= b),
    "gt": _binary(lambda a, b: a > b),
    "ge": _binary(lambda a, b: a >= b),
    "and": _binary(jnp.logical_and),
    "or": _binary(jnp.logical_or),
    "neg": _unary(lambda a: -a),
    "sign": _unary(jnp.sign),
    "abs": _unary(jnp.abs),
    "sin": _unary(jnp.sin),
    "cos": _unary(jnp.cos),
    "tan": _unary(jnp.tan),
    "tanh": _unary(jnp.tanh),
    "exp": _unary(jnp.exp),
    "log": _unary(jnp.log),
    "log1p": _unary(jnp.log1p),
    "expm1": _unary(jnp.expm1),
    "sqrt": _unary(jnp.sqrt),
    "rsqrt": _unary(lambda a: 1.0 / jnp.sqrt(a)),
    "logistic": _unary(jax.nn.sigmoid),
    "floor": _unary(jnp.floor),
    "ceil": _unary(jnp.ceil),
    "round": _unary(jnp.round),
    "not": _unary(jnp.logical_not),
    "is_finite": _unary(jnp.isfinite),
    "stop_gradient": lambda eqn, a: _obj(a),
    "copy": lambda eqn, a: _obj(a),
    "integer_pow": lambda eqn, a: np.frompyfunc(
        lambda t: t ** eqn.params["y"], 1, 1)(_obj(a)),
    "broadcast_in_dim": _broadcast_in_dim,
    "reshape": _reshape,
    "transpose": _transpose,
    "squeeze": _squeeze,
    "slice": _slice,
    "concatenate": _concatenate,
    "reduce_sum": _reduce(np.sum),
    "reduce_max": _reduce(np.max),
    "reduce_min": _reduce(np.min),
    "reduce_prod": _reduce(np.prod),
    "dot_general": _dot_general,
    "convert_element_type": _convert,
    "select_n": _select_n,
    "iota": lambda eqn: _iota(eqn),
    "jit": _call_rule,
    "pjit": _call_rule,
    "closed_call": _call_rule,
    "custom_jvp_call": _call_rule,
    "custom_vjp_call": _call_rule,
    "remat": _call_rule,
    "checkpoint": _call_rule,
}


def supports(jaxpr) -> bool:
    """True when every primitive in the (nested) jaxpr has a rule."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("jit", "pjit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            subj = sub.jaxpr if isinstance(sub, jcore.ClosedJaxpr) else sub
            if not supports(subj):
                return False
        elif name not in _RULES:
            return False
    return True


def eval_jaxpr_tiles(jaxpr, consts, *args):
    """Evaluate `jaxpr` with object-array/tile semantics.

    `consts` are concrete arrays (their elements become scalar literals);
    `args` are object arrays of tiles (or raw scalars/tracers)."""
    env = {}

    def read(v):
        if isinstance(v, jcore.Literal):
            return _obj(np.asarray(v.val))
        return env[v]

    def write(v, val):
        env[v] = _obj(val)

    for cv, c in zip(jaxpr.constvars, consts):
        write(cv, np.asarray(c))
    for iv, a in zip(jaxpr.invars, args):
        write(iv, a)
    for eqn in jaxpr.eqns:
        rule = _RULES.get(eqn.primitive.name)
        if rule is None:
            raise NotImplementedError(
                f"tile_interp: primitive {eqn.primitive.name!r}")
        invals = [read(v) for v in eqn.invars]
        out = rule(eqn, *invals)
        if eqn.primitive.multiple_results:
            for ov, o in zip(eqn.outvars, out):
                write(ov, o)
        else:
            write(eqn.outvars[0], out)
    return [read(v) for v in jaxpr.outvars]
