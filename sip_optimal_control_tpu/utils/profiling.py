"""Profiling helpers (the reference measures performance only through its
google_benchmark binaries; on TPU the native tool is jax.profiler —
SURVEY section 5)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_solve(log_dir: str = "/tmp/sip_oc_trace"):
    """Capture a jax.profiler trace around a solve; view with XProf or
    tensorboard-plugin-profile."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def timed_block_until_ready(fn, *args, reps: int = 5):
    """Best/median wall time of a jitted callable (compile excluded)."""
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    times.sort()
    return out, {"best_s": times[0], "p50_s": times[len(times) // 2]}
