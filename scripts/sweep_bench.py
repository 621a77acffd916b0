"""Run several bench.py configs IN ONE PROCESS.

The remote-TPU tunnel serializes client sessions and a fresh process can
stall minutes waiting for the previous client's session to clear (see
bench.py session_acquire_s); running a sweep as one process pays that
cost at most once.  Each config prints bench.py's usual JSON line.

Usage:  python scripts/sweep_bench.py "--rti 8" "--rti 10" "--warm-iters 30"
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    configs = sys.argv[1:] or ["", "--rti 8"]
    for cfg in configs:
        print(f"=== bench.py {cfg} ===", file=sys.stderr, flush=True)
        sys.argv = ["bench.py"] + ([a for a in cfg.split() if a])
        try:
            bench.main()
        except SystemExit as e:
            if e.code:
                print(f"config {cfg!r} exited {e.code}", file=sys.stderr)


if __name__ == "__main__":
    main()
