"""Device-trace profile of one benchmark dispatch: top TPU kernels.

`jax.profiler.trace` works through the remote-TPU tunnel (verified r3);
this traces ONE warm MPC-step dispatch of the bench default and prints
the top device kernels by total time, with execution counts.  This is the
ground-truth attribution tool — the per-stage dispatch profiler
(profile_iteration.py) under-reports in-program costs because XLA
overlap/DCE hides most of an isolated stage's cost (see COVERAGE.md,
"K-slope methodology").

This is how the r3 line-search finding was made: four
[batch, chunk, T, m] fusions inside the LS while_loop accounted for ~60%
of every IPM trip, which motivated the profile-guided LS budget that took
the headline from 113k to 142k solves/s.

Usage (on the TPU):  python scripts/profile_trace.py [--rti 7]
    [--ls-steps 6 --ls-chunk 6] [--model cartpole] [--top 25]
The trace is also left in /tmp/soc_trace for TensorBoard.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="cartpole")
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rti", type=int, default=5)
    ap.add_argument("--ls-steps", type=int, default=6)
    ap.add_argument("--ls-chunk", type=int, default=6)
    ap.add_argument("--steps-per-call", type=int, default=25)
    ap.add_argument("--batch-axis", default="lead",
                    choices=["lead", "minor"])
    ap.add_argument("--fused-ls", type=int, default=1)
    ap.add_argument("--filter-ls", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--outdir", default="/tmp/soc_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import get_model, build_mpc_scan
    from sip_optimal_control_tpu import Settings
    from sip_optimal_control_tpu.solver.settings import LineSearchSettings
    from sip_optimal_control_tpu.solver.sip import Primal, YVec

    spec, dims, topo, lower, upper, x0 = get_model(args.model, args.horizon)
    B = args.batch
    settings = Settings(
        max_iterations=args.rti, fixed_iterations=True, mu_init=3e-3,
        tol=1e-3, mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5,
        riccati_backend="pallas",
        line_search=LineSearchSettings(
            max_steps=args.ls_steps, chunk=args.ls_chunk,
            fused_probe=bool(args.fused_ls),
            use_filter_line_search=bool(args.filter_ls)))
    rng = np.random.default_rng(0)
    n = dims.max_state_dim
    x0s = jnp.asarray(np.tile(np.asarray(x0, np.float32), (B, 1))
                      + 0.1 * rng.standard_normal((B, n)).astype(np.float32))
    N, E = dims.num_nodes, dims.num_edges
    wv = Primal(x=jnp.tile(x0s[:, None, :], (1, N, 1)),
                u=jnp.zeros((B, E, dims.max_control_dim), jnp.float32),
                theta=jnp.zeros((B, dims.theta_dim), jnp.float32))
    wy = YVec(dyn=jnp.zeros((B, N, n), jnp.float32),
              nc=jnp.zeros((B, N, dims.max_node_c_dim), jnp.float32),
              ec=jnp.zeros((B, E, dims.max_edge_c_dim), jnp.float32))
    step = build_mpc_scan(spec, dims, topo, lower, upper, settings,
                          "gauss_newton",
                          steps_per_call=args.steps_per_call,
                          noise=0.05, batch=B, batch_axis=args.batch_axis)
    st = jax.block_until_ready(step(x0s, wv, wy))[:3]   # compile + settle
    st = jax.block_until_ready(step(*st))[:3]
    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(step(*st))

    f = sorted(glob.glob(os.path.join(
        args.outdir, "plugins/profile/*/*.trace.json.gz")))[-1]
    ev = json.load(gzip.open(f))["traceEvents"]
    names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in names.get(e.get("pid", -1), ""):
            dur[e.get("name", "?")] += e.get("dur", 0)
            cnt[e.get("name", "?")] += 1
    trips = args.steps_per_call * args.rti
    print(f"# one dispatch = {args.steps_per_call} MPC steps x "
          f"{args.rti} IPM trips = {trips} trips; device lanes: "
          f"{sorted(set(names.values()))}")
    print(f"{'total ms':>10} {'per-trip us':>12} {'count':>7}  kernel")
    for nm, d in dur.most_common(args.top):
        print(f"{d / 1e3:10.2f} {d / trips:12.1f} {cnt[nm]:7d}  {nm[:80]}")


if __name__ == "__main__":
    main()
