"""Solver settings and statuses.

The reference's sip::Settings is only visible through its call sites
(reference: tests/variable_dimensions_test.cpp:18-25, 428-432:
max_iterations, line_search.use_filter_line_search, logging.print_*); the
solver itself is external, so this is a from-scratch design: a slack-based,
dual-regularized (proximal) barrier interior-point method whose Newton-KKT
matrix is exactly the operator of ops/kkt.py:

    K = [[H + r1, C^T, G^T], [C, -r2, 0], [G, 0, -(w + r3)]],  w = s/z.

All fields are static at trace time (frozen dataclass hashed into the jit
key).
"""

from __future__ import annotations

import dataclasses
import enum


class SIPStatus(enum.IntEnum):
    SOLVED = 0
    MAX_ITERATIONS = 1
    FACTORIZATION_FAILURE = 2
    # KKT error exceeded Settings.diverged_kkt: the iterates are running
    # away, typically an infeasible problem (equality multipliers blow up
    # while primal steps collapse)
    DIVERGED = 3
    # Settings.max_consecutive_rejections successive steps were rejected
    # (failed factorization or exhausted line search even under inflated
    # regularization): the iterate cannot make progress from its current
    # point — callers should re-initialize rather than re-warm-start
    STALLED = 4
    # internal sentinel while iterating
    RUNNING = 99


@dataclasses.dataclass(frozen=True)
class LineSearchSettings:
    # Merit (Armijo on the nu-penalized barrier merit) by default; the
    # filter option mirrors the reference's
    # line_search.use_filter_line_search flag
    # (reference: tests/variable_dimensions_test.cpp:21-22).
    use_filter_line_search: bool = False
    # Backtracking depth cap.  Under vmap the LS while_loop runs every
    # iteration to the BATCH's deepest backtracker at ~1 eval_fcg per trip,
    # so depth is the dominant per-iteration cost at large batches
    # (measured 8.8 ms/iter at 25 vs 4.5 at 4, TPU v5e batch 4096); depth
    # 10 measured no quality loss vs 25 (cold cartpole solved_frac 0.94 vs
    # 0.88, warm MPC equal) — an exhausted search rejects the step and
    # inflates the carried regularization instead (Settings.reg_boost_*).
    max_steps: int = 10
    backtrack: float = 0.5
    # Candidate alphas evaluated PER while-loop trip (vectorized over a
    # chunk axis: one widened eval_fcg instead of `chunk` sequential
    # probes).  Under vmap the LS loop runs to the batch's deepest
    # backtracker, so trips fall from max-depth to ceil(depth/chunk); the
    # accepted alpha is identical to the sequential search (the largest
    # in-budget candidate passing the test).  TRADEOFF: every trip pays
    # chunk x the eval_fcg FLOPs/memory even when the first candidate is
    # accepted (the common case near convergence) — whether the widened
    # probe is cheaper than extra trips is workload-dependent, which is
    # why the default stays 1 (classic backtracking).  Measured on the
    # disturbance-MPC bench (TPU v5e, batch 4096, while-loop solver):
    # chunk 10 -> +6% solves/s, chunk 5 -> +3%, chunk 3 -> -5%.  In
    # fixed-trip RTI mode chunk = max_steps makes the whole LS a single
    # vectorized trip (what bench.py --rti uses).
    chunk: int = 1
    # Fused Pallas line-search probe (ops/pallas_ls.py): evaluates every
    # chunk candidate from VMEM-resident trial state with the scenario
    # batch packed onto the vector lanes, replacing the lane-padded
    # [batch, chunk, T, m] XLA probe fusions (~45% of every IPM trip on
    # the r4 device trace).  Engages only when the problem is eligible
    # (chain topology, uniform dims, float32, theta_dim 0, box bounds
    # only — build_problem records eligibility in OCProblem.fused_ls);
    # everything else silently uses the standard probe.  Off by default
    # (results match the standard probe to f32 roundoff, not bitwise:
    # accumulation order differs).
    fused_probe: bool = False
    eta: float = 1e-6          # Armijo slope fraction
    nu_min: float = 1.0        # merit penalty floor
    nu_rho: float = 0.1        # penalty margin: nu >= D/((1-rho) theta)
    # filter parameters (Waechter-Biegler style margins)
    gamma_theta: float = 1e-5
    gamma_phi: float = 1e-5


@dataclasses.dataclass(frozen=True)
class LoggingSettings:
    print_logs: bool = False
    print_line_search_logs: bool = False
    print_search_direction_logs: bool = False
    print_derivative_check_logs: bool = False


@dataclasses.dataclass(frozen=True)
class Settings:
    max_iterations: int = 60
    tol: float = 1e-8
    # Fixed-trip (real-time-iteration) outer loop: run EXACTLY
    # max_iterations trips as a `lax.scan` instead of a convergence-tested
    # `lax.while_loop`.  Per-scenario semantics are identical to the
    # while_loop (a scenario's state freezes once its status leaves
    # RUNNING — the same select-masking vmap applies to while_loop lanes),
    # but the batch no longer runs every dispatch to its slowest member:
    # the cost is a deterministic K trips rather than the batch-max
    # iteration count (VERDICT r2 item 2: batch_efficiency 0.23 means the
    # while_loop wasted 77% of its trips on stragglers).  Intended for
    # warm-started MPC re-solves with small max_iterations; truncated
    # scenarios report MAX_ITERATIONS and carry their warm state to the
    # next re-solve (the classic RTI contract).
    fixed_iterations: bool = False
    # barrier schedule (monotone Fiacco-McCormick)
    mu_init: float = 1e-1
    mu_min: float = 1e-13
    kappa_mu: float = 0.2      # linear decrease factor
    theta_mu: float = 1.5      # superlinear decrease power
    kappa_eps: float = 10.0    # barrier subproblem tolerance = kappa_eps*mu
    tau_min: float = 0.99      # fraction-to-boundary floor
    # regularization: r2 = r3 = gamma_reg*mu + reg_floor (dual prox);
    # r1 = prox_reg + bound weights (primal prox).  Kept small: the step's
    # linearized infeasibility is r2*|dy|, and the merit line search rejects
    # directions whose infeasibility rivals the residual decrease.
    gamma_reg: float = 1e-6
    reg_floor: float = 1e-8
    prox_reg: float = 1e-8
    max_factor_retries: int = 3
    retry_scale: float = 100.0
    # Step-rejection safeguard (Levenberg-style): when the factorization
    # still fails after the in-iteration retries, or the line search
    # exhausts its backtracking budget, the step is REJECTED (alpha = 0 —
    # the iterate does not move) and a carried multiplier on the primal
    # proximal regularization is inflated for the next iteration; it decays
    # back toward 1 after accepted steps.  FACTORIZATION_FAILURE is only
    # declared once the boost is saturated at reg_boost_max — i.e. the
    # system is unfactorizable even under maximal regularization.
    reg_boost_scale: float = 100.0
    reg_boost_decay: float = 0.1
    reg_boost_max: float = 1e12
    # consecutive rejected steps before declaring STALLED
    max_consecutive_rejections: int = 8
    # safeguards
    diverged_kkt: float = 1e10  # declare DIVERGED above this KKT error
    kappa_sigma: float = 1e10  # z-reset corridor around mu/s
    bound_push: float = 1e-2   # initial interior push for bounded variables
    # Interior push applied to EXPLICIT warm starts (solve(init_vars=...)).
    # Kept tiny so a saturated control is not dragged off its bound every
    # MPC re-solve (which costs a fraction of an iteration per step
    # re-approaching it); cold starts keep the standard kappa_1-style push.
    warm_bound_push: float = 1e-6
    # Absolute slack floor.  0 disables: the fraction-to-boundary rule keeps
    # s > 0, and any positive floor puts a floor under the g+s residual.
    slack_min: float = 0.0
    # Sanitizer-style debug mode (the TPU-side analogue of the reference's
    # asan/msan/ubsan build configs, reference: .bazelrc:38-59): after every
    # accepted iterate, check the primal variables, model evaluation and KKT
    # error for non-finite values and print a diagnostic line identifying
    # the iteration when any appear.  Debug-only cost; off by default.
    debug_check_finite: bool = False
    # extra rounds of K-residual correction per Newton solve, using the
    # apply_K operator (the reference exposes its matvec oracles to the SIP
    # core for exactly this, helpers.cpp:953-977)
    iterative_refinement_steps: int = 0
    # Matmul precision for every op traced inside solve().  TPU matmuls
    # default to bf16 passes, which caps the reachable KKT error around
    # 1e-1..1e-3 on badly-scaled problems: the robust_tree model measured
    # solved 0/4096 at tol 1e-3 under the default vs 64/64 at "highest"
    # (full f32), identical to CPU.  "highest" costs extra MXU passes but
    # the correctness bar wins; set "default" to reclaim speed on problems
    # known to tolerate bf16.
    matmul_precision: str = "highest"
    # Chain-Riccati backend: "scan" (sequential lax.scan; default),
    # "assoc" (associative-scan, O(log T) depth — ~5x faster at horizon
    # 1024 with small batches on one chip; SURVEY 2.10(d)), or "pallas"
    # (fused TPU kernel for large scenario batches).  Trees always use the
    # level-synchronous recursion.
    riccati_backend: str = "scan"
    # Whole-iteration fusion (ops/fused_iter.py + solver/fused_chain.py):
    # model evaluation, condensation and the Riccati factor/solve run as
    # one Pallas kernel chain, and the solver carries only per-stage
    # VECTORS between iterations (no [B, T, n, n] stage blocks in the RTI
    # scan state).  Engages only for the fused-eligible class (chain,
    # uniform dims, float32, no theta, box bounds only, scalar residual
    # scalings, no iterative refinement, logging off) — every other
    # problem/settings combination silently uses the standard path with
    # identical results.  Per-scenario results match the standard path to
    # f32 roundoff (kernel summation order differs).
    fused_iteration: bool = False
    # Fixed-trip mode only: include the carried model evaluation in the
    # per-trip freeze-select (the default, exactly equal to the
    # while_loop's vmap semantics).  False excludes it: frozen lanes'
    # iterates/duals/statuses/kkt_error still freeze exactly, but the
    # carried ev keeps advancing, so SolveResult.f on a lane frozen
    # before the last trip reports a post-freeze iterate's objective.
    # Exists because the select over StageModelData blocks is pure HBM
    # traffic on the standard (non-fused) path; measured: cartpole
    # REGRESSED ~27% with the r3 variant of this (kept the default), the
    # tree workload is where it could pay (r5 re-measure).
    rti_freeze_ev: bool = True
    line_search: LineSearchSettings = LineSearchSettings()
    logging: LoggingSettings = LoggingSettings()
