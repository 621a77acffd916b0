"""Small dense linear-algebra primitives for the Riccati recursion.

These are the TPU-native equivalents of the reference's Eigen LLT +
triangular-solve kernels (reference: sip_optimal_control/lqr.cpp:473-549).
Shapes are tiny (n, m <= ~32) and *static*; throughput comes from vmapping
thousands of scenarios over the leading batch axis, which XLA lowers to
lane-parallel VPU code.  Failure is reported as data (bool), never as an
exception — a batched solver cannot abort on one bad scenario.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def cholesky_with_ok(a: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Lower Cholesky factor plus a validity flag.

    jnp.linalg.cholesky yields NaNs for non-PD inputs; we detect failure from
    the factor diagonal, mirroring the reference's Eigen::LLT info() check
    (reference: lqr.cpp:505-508, 697-700).
    """
    l = jnp.linalg.cholesky(a)
    diag = jnp.diagonal(l, axis1=-2, axis2=-1)
    ok = jnp.all(jnp.isfinite(diag) & (diag > 0), axis=-1)
    return l, ok


def cho_solve(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b given lower factor L.  b: [..., n] or [..., n, k]."""
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    x = lax.linalg.triangular_solve(l, b, left_side=True, lower=True)
    x = lax.linalg.triangular_solve(l, x, left_side=True, lower=True,
                                    transpose_a=True)
    return x[..., 0] if vec else x


def cho_inverse(l: jax.Array) -> jax.Array:
    """(L L^T)^{-1} via two triangular solves against identity."""
    n = l.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=l.dtype), l.shape)
    return cho_solve(l, eye)


def sym(a: jax.Array) -> jax.Array:
    """Symmetrize; the recursion only guarantees the lower triangle
    analytically (reference mirrors lower->upper, helpers.cpp:155-158)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))
