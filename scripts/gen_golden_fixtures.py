"""(Re)generate tests/golden/lqr_golden.bin from the REAL C++ reference.

Compiles the unmodified reference LQR translation unit
(/root/reference/sip_optimal_control/lqr.cpp — its Bazel target depends
only on Eigen) against the minimal Eigen-subset shim in
sip_optimal_control_tpu/native/eigen_shim/, runs the fixture generator
(native/lqr_fixture_gen.cpp) and writes the golden stream that
tests/test_golden_lqr.py pins ops/lqr.py against at 1e-12 (measured
agreement ~1e-15 — f64 machine precision).

Requires g++ and a readable reference checkout; the committed fixture
means the test itself needs neither.

Usage: python scripts/gen_golden_fixtures.py [reference_dir]
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "sip_optimal_control_tpu", "native")
OUT = os.path.join(REPO, "tests", "golden", "lqr_golden.bin")


def main():
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    lqr_cpp = os.path.join(ref, "sip_optimal_control", "lqr.cpp")
    if not os.path.exists(lqr_cpp):
        sys.exit(f"reference lqr.cpp not found at {lqr_cpp}")
    with tempfile.TemporaryDirectory() as td:
        exe = os.path.join(td, "gen")
        subprocess.check_call([
            "g++", "-O2", "-std=c++20",
            "-I", os.path.join(NATIVE, "eigen_shim"),
            "-I", ref,
            "-o", exe,
            os.path.join(NATIVE, "lqr_fixture_gen.cpp"),
            lqr_cpp,
        ])
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        subprocess.check_call([exe, OUT])
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
