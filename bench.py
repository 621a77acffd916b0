"""Benchmark harness: batched MPC solves/s/chip at horizon 50.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline target (BASELINE.md): >= 10,000 batched MPC solves/s/chip.

Runs on whatever backend the ambient environment provides (the driver runs
it on one real TPU chip).  float32: the throughput configuration; parity
configurations run in float64 under tests/.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--horizon", type=int, default=50)
    parser.add_argument("--iters", type=int, default=20,
                        help="IPM iteration budget per solve (MPC-style "
                        "warm-budgeted re-solve)")
    parser.add_argument("--tol", type=float, default=1e-4)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax

    from __graft_entry__ import _flagship

    fn, (x0s,) = _flagship(batch=args.batch, horizon=args.horizon,
                           max_iterations=args.iters, tol=args.tol)
    jfn = jax.jit(fn)

    # warmup / compile
    t0 = time.time()
    out = jfn(x0s)
    jax.block_until_ready(out)
    compile_time = time.time() - t0

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        out = jfn(x0s)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    t_best = min(times)
    t_p50 = float(np.median(times))
    solves_per_sec = args.batch / t_best

    u, statuses, iterations, kkt = out
    solved = int(np.sum(np.asarray(statuses) == 0))

    if args.verbose:
        print(f"# backend={jax.default_backend()} "
              f"devices={jax.devices()} compile={compile_time:.1f}s "
              f"p50_batch_time={t_p50 * 1e3:.1f}ms "
              f"solved={solved}/{args.batch} "
              f"mean_iters={float(np.mean(np.asarray(iterations))):.1f} "
              f"max_kkt={float(np.max(np.asarray(kkt))):.2e}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "batched_mpc_solves_per_sec_per_chip_h{}".format(
            args.horizon),
        "value": round(solves_per_sec, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_sec / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
