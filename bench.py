"""Benchmark harness: batched MPC solves/s/chip at horizon 50.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus auditable quality stats (solved_frac, mean_iterations, max_kkt_error)
and an analytic FLOP/utilization estimate.
Baseline target (BASELINE.md): >= 10,000 batched MPC solves/s/chip.

Workload: a batch of receding-horizon controllers (default: cartpole
swing-up, horizon 50, box input constraints, float32) driven by a fixed-seed
plant disturbance (--noise, DEFAULT ON at 0.05) so every timed re-solve does
real Newton work off the steady state.  The warm program itself (started
from constant trajectories) performs the untimed cold phase; the timed
region scans --steps-per-call MPC steps on device (the reference's
warm-start contract: tests/variable_dimensions_test.cpp:437-446).

Default solver mode is fixed-trip REAL-TIME ITERATION with the filter
line search and the fused Pallas probe (model-default budgets: cartpole
K=5, quadrotor K=4, chain16 K=2, robust_tree K=2, others K=7; soft 3e-3
barrier restart): every
re-solve runs exactly K IPM iterations as a lax.scan, so the batch never
waits on its slowest member.  Truncated re-solves carry their warm state
to the next step; closed-loop quality is gated by `final_state_rms`
against 1.25x the measured converged-controller floor plus
`usable_frac >= 0.99` (quality_ok in the JSON).  --rti 0 restores the
convergence-tested while-loop mode; --filter-ls 0 the Armijo search.

Modes:
  mpc      (default) steady-state warm-started throughput
  cold     cold-start throughput
  latency  p50 single-solve latency (batch 1)
  scaling  multi-device scaling efficiency over an N-device mesh
           (runs on N virtual CPU devices here; on a pod slice unchanged)
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_WORKER_ENV = "_SOC_SCALING_WORKER"
_MP_WORKER_ENV = "_SOC_SCALING_MP_WORKER"
# persistent XLA executable cache, relative to the repo (ADVICE r2)
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")


def flops_per_newton_iteration(dims) -> float:
    """Analytic FLOP count of the linear-algebra core of ONE interior-point
    iteration of ONE scenario (condensation + Riccati factor/solve +
    multiplier recovery + KKT residual).  A deliberate LOWER bound: the
    autodiff model evaluation and line-search probes are model-dependent and
    excluded.  Counts follow the recursion in ops/lqr.py (the math box of
    SURVEY.md: F-trick Cholesky factor, gain, cost-to-go update)."""
    T = dims.num_edges
    n = float(max(dims.max_state_dim, 1))
    m = float(max(dims.max_control_dim, 1))
    cn, ce = float(dims.max_node_c_dim), float(dims.max_edge_c_dim)
    gn, ge = float(dims.max_node_g_dim), float(dims.max_edge_g_dim)
    # J^T diag(w) J condensation accumulations (ops/kkt.py::kkt_factor)
    cond = 2 * n * n * (cn + gn) + 2 * (ce + ge) * (n * n + 2 * n * m
                                                    + m * m)
    # Riccati factor per edge: chol(F) n^3/3, F^{-1} formation 2n^3,
    # WA 2n^3, WB 2n^2m, B^T WB 2nm^2, chol(G) m^3/3, K = -G^{-1}H 2m^2n,
    # V update A^T WA 2n^3 + K^T H 2n^2 m
    factor = (n ** 3 / 3 + 2 * n ** 3 + 2 * n ** 3 + 2 * n * n * m
              + 2 * n * m * m + m ** 3 / 3 + 2 * m * m * n
              + 2 * n ** 3 + 2 * n * n * m)
    # backward + forward vector passes (matvecs)
    solve = 12 * n * n + 8 * n * m
    recover = 4 * n * (cn + gn) + 4 * (n + m) * (ce + ge)
    resid = 8 * n * n + 8 * n * m + 4 * n * (cn + ce + gn + ge)
    return T * (cond + factor + solve + recover + resid)


def peak_flops_bf16(device) -> float:
    """Per-chip bf16 peak by device kind (public figures); 0.0 if unknown."""
    kind = getattr(device, "device_kind", "").lower()
    table = [("v6", 918e12), ("v5p", 459e12), ("v5 lite", 197e12),
             ("v5e", 197e12), ("v5", 459e12), ("v4", 275e12)]
    for key, peak in table:
        if key in kind:
            return peak
    return 0.0


def peak_hbm_bytes(device) -> float:
    """Per-chip HBM bandwidth (public figures, bytes/s); 0.0 if unknown."""
    kind = getattr(device, "device_kind", "").lower()
    table = [("v6", 1640e9), ("v5p", 2765e9), ("v5 lite", 819e9),
             ("v5e", 819e9), ("v5", 2765e9), ("v4", 1228e9)]
    for key, peak in table:
        if key in kind:
            return peak
    return 0.0


def bytes_per_newton_iteration(dims, itemsize=4) -> float:
    """Analytic HBM traffic of ONE interior-point iteration of ONE scenario,
    assuming NO fusion credit: every stacked stage array is read (and
    written where produced) once per pass it participates in.  This is the
    roofline denominator that MATTERS for this workload: per-stage matrices
    are tiny (n,m <= 16), so the MXU is idle and the kernel is
    bandwidth-bound — `pct_peak_hbm` rooflines against the right ceiling
    where `pct_peak_bf16` rooflines against the wrong one (VERDICT r2
    item 3/4).  An upper bound on optimality, a lower bound on traffic:
    XLA fusion can only reduce the real traffic below this count."""
    T = dims.num_edges
    n = float(max(dims.max_state_dim, 1))
    m = float(max(dims.max_control_dim, 1))
    cn, ce = float(dims.max_node_c_dim), float(dims.max_edge_c_dim)
    gn, ge = float(dims.max_node_g_dim), float(dims.max_edge_g_dim)
    nn, nm, mm = n * n, n * m, m * m
    # model eval (autodiff outputs): A, B, Hessian blocks, Jacobians,
    # gradients, residuals — written once, read once by condensation
    jac = (cn + gn) * n + (ce + ge) * (n + m)
    model_out = (nn + nm) + (nn + 2 * nm + mm) + jac + (n + m) + (
        cn + ce + gn + ge)
    # condensation: writes Q_mod/R_mod/M_mod, reads Jacobians + weights
    cond = (nn + mm + nm) + jac + (cn + ce + gn + ge)
    # Riccati factor: read Q,R,M,A,B,delta; write F_chol,W,G_chol,K,V
    factor = (nn + mm + nm) + (nn + nm + n) + (2 * nn + mm + nm + nn)
    # backward+forward vector passes: read K,A,B,W-ish + rhs; write x,u,y
    solve = (2 * nn + nm) + 3 * n + m + (2 * n + m)
    # multiplier recovery + KKT residual oracle: re-read Jacobians
    rec = 2 * jac + (cn + ce + gn + ge)
    # line search: ~2 merit probes re-evaluating f,c,g (reads iterate+dirs)
    ls = 2 * (2 * (n + m) + cn + ce + gn + ge)
    return itemsize * T * (model_out + cond + factor + solve + rec + ls)


def get_model(name: str, horizon: int):
    from sip_optimal_control_tpu.models import (cartpole_swingup,
                                                planar_quadrotor,
                                                robust_scenario_tree,
                                                synthetic_chain)
    if name == "cartpole":
        return cartpole_swingup(horizon=horizon)
    if name == "quadrotor":
        return planar_quadrotor(horizon=horizon)
    if name == "chain16":
        return synthetic_chain(horizon=horizon, state_dim=16, control_dim=4)
    if name == "robust_tree":
        # scenario-tree robust MPC (BASELINE config 5's problem class);
        # total edges ~ horizon: 2 shared + 4 branches x (horizon-2)/4
        return robust_scenario_tree(t_shared=2, n_branches=4,
                                    t_branch=max(1, (horizon - 2) // 4))
    raise ValueError(f"unknown model {name!r}")


def build_mpc_scan(spec, dims, topo, lower, upper, settings,
                   hessian_mode="exact", steps_per_call=1, noise=0.0,
                   batch=1, batch_axis="lead"):
    """One dispatch = `steps_per_call` receding-horizon steps scanned on
    device (amortizes fixed per-dispatch cost — essential through the
    remote-TPU tunnel, whose ~20 ms RPC otherwise dominates).  Returns
    stacked per-step (statuses, iterations, kkt_errors) of shape
    [steps, batch] so the timed region's quality is fully auditable.

    ``batch_axis="minor"`` vmaps the scenario axis at position -1 instead
    of 0: every per-scenario intermediate then carries the batch on its
    MINOR axis, which XLA lays out on the 128-wide vector lanes — small
    stage dims (T=50, n=4, m=1) stop being lane-padded (the measured
    2.6-16x HBM traffic waste behind the r3 trace's 40-50 GB/s probe
    fusions).  Inputs/outputs stay batch-leading; the transpose happens
    once per dispatch."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from sip_optimal_control_tpu import build_problem, solve
    from sip_optimal_control_tpu.mpc import _shift_warm_start
    from sip_optimal_control_tpu.solver.sip import Primal

    theta0 = jnp.zeros((dims.theta_dim,), jnp.float32)
    N = dims.num_nodes

    def one(x0, warm_vars, warm_y):
        problem = build_problem(spec, dims, topo, initial_state=x0,
                                lower=lower, upper=upper,
                                hessian_mode=hessian_mode)
        res = solve(problem, settings, init_vars=warm_vars, init_y=warm_y)
        # Divergence failsafe (production-MPC standard): SOLVED iterates,
        # and MAX_ITERATIONS iterates that are still in a sane neighborhood
        # (KKT error bounded), are usable (real-time-iteration contract).
        # STALLED / DIVERGED / FACTORIZATION_FAILURE / non-finite scenarios
        # apply zero control and restart next step from the constant
        # trajectory at the new plant state, instead of carrying a
        # pathological warm state forever.
        usable = ((res.status == 0)
                  | ((res.status == 1) & (res.kkt_error < 1e2))) \
            & jnp.isfinite(res.kkt_error) \
            & jnp.all(jnp.isfinite(res.vars.x)) \
            & jnp.all(jnp.isfinite(res.vars.u))
        u0 = jnp.where(usable, res.vars.u[0], jnp.zeros_like(res.vars.u[0]))
        x_next = spec.dynamics(x0, u0, theta0, 0)
        sh_vars, sh_y = _shift_warm_start(res.vars, res.y, topo)
        reset_vars = Primal(x=jnp.tile(x_next[None], (N, 1)),
                            u=jnp.zeros_like(sh_vars.u),
                            theta=sh_vars.theta * 0)
        next_vars = jax.tree.map(
            lambda a, b: jnp.where(usable, a, b), sh_vars, reset_vars)
        next_y = jax.tree.map(
            lambda a: jnp.where(usable, a, jnp.zeros_like(a)), sh_y)
        return (x_next, next_vars, next_y, res.status, res.iterations,
                res.kkt_error)

    if steps_per_call == 1:
        # direct vmap (accepts None warm state for cold starts); per-step
        # stats have shape [batch]
        return jax.jit(jax.vmap(one))

    # Fixed-seed plant disturbance: keeps the fleet off the equilibrium
    # where shifted warm starts make re-solves trivial, while the workload
    # stays deterministic and repeatable.
    n = dims.max_state_dim
    if noise > 0.0:
        rng = np.random.default_rng(12345)
        dist = jnp.asarray(noise * rng.standard_normal(
            (steps_per_call, batch, n)).astype(np.float32))
    else:
        dist = jnp.zeros((steps_per_call, 1, n), jnp.float32)

    minor = batch_axis == "minor"
    bvmap = (lambda f: jax.vmap(f, in_axes=-1, out_axes=-1)) if minor \
        else jax.vmap
    if minor:
        dist = jnp.moveaxis(dist, 1, -1)    # [steps, n, batch(1)]

    def many(x0, warm_vars, warm_y):
        if minor:
            x0, warm_vars, warm_y = jax.tree.map(
                lambda a: jnp.moveaxis(a, 0, -1), (x0, warm_vars, warm_y))

        def body(carry, dstep):
            x, wv, wy = carry
            out = bvmap(one)(x, wv, wy)
            return (out[0] + dstep, out[1], out[2]), out[3:]

        (x, wv, wy), (statuses, iters, kkts) = lax.scan(
            body, (x0, warm_vars, warm_y), dist)
        if minor:
            x, wv, wy = jax.tree.map(
                lambda a: jnp.moveaxis(a, -1, 0), (x, wv, wy))
            statuses, iters, kkts = (jnp.moveaxis(statuses, -1, 1),
                                     jnp.moveaxis(iters, -1, 1),
                                     jnp.moveaxis(kkts, -1, 1))
        return x, wv, wy, statuses, iters, kkts

    return jax.jit(many)


def run_scaling(args):
    """Multi-device scaling efficiency (VERDICT r1 item 5; BASELINE tracks
    >=80% at >=2 hosts).  Weak scaling: fixed batch per device, mesh sizes
    1 and N, efficiency = thr_N / (N * thr_1).  Outside the worker process
    we re-exec with N virtual CPU devices (jax is already imported by
    sitecustomize, so env must be set before the interpreter starts); on a
    real pod slice the worker path runs directly on the ambient devices."""
    import jax

    if os.environ.get(_WORKER_ENV) == "1":
        # env-level JAX_PLATFORMS is overridden by the ambient PJRT-plugin
        # sitecustomize; the config-level switch wins (cf. tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    if os.environ.get(_WORKER_ENV) != "1" and (
            len(jax.devices()) < args.devices):
        env = dict(os.environ)
        env[_WORKER_ENV] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        # CPU-only worker: skip axon registration so it cannot hold the
        # TPU tunnel's serialized client session (cf. tests/conftest.py)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count="
                            f"{args.devices}")
        proc = subprocess.run([sys.executable] + sys.argv, env=env)
        sys.exit(proc.returncode)

    import jax.numpy as jnp
    from sip_optimal_control_tpu import Settings
    from sip_optimal_control_tpu.parallel import (scenario_mesh,
                                                  shard_scenarios,
                                                  solve_batch_sharded)

    spec, dims, topo, lower, upper, x0 = get_model(args.model, args.horizon)
    settings = Settings(max_iterations=args.cold_iters, tol=args.tol,
                        mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5)
    devices = jax.devices()[:args.devices]
    assert len(devices) == args.devices, (
        f"need {args.devices} devices, found {len(devices)}")
    bpd = args.batch  # batch per device (weak scaling)
    rng = np.random.default_rng(0)

    def throughput(k):
        mesh = scenario_mesh(devices[:k])
        B = bpd * k
        x0s = np.tile(np.asarray(x0, np.float32), (B, 1))
        x0s += 0.05 * rng.standard_normal(x0s.shape).astype(np.float32)
        x0s = shard_scenarios(jnp.asarray(x0s), mesh)
        fn = jax.jit(lambda b: solve_batch_sharded(
            spec, dims, topo, b, settings=settings, mesh=mesh,
            lower=lower, upper=upper))
        out = jax.block_until_ready(fn(x0s))  # compile + warm
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            out = jax.block_until_ready(fn(x0s))
            times.append(time.time() - t0)
        _, statuses, stats = out
        return B / min(times), int(stats.total_solved), B

    thr_1, solved_1, b_1 = throughput(1)
    thr_n, solved_n, b_n = throughput(args.devices)
    eff = thr_n / (args.devices * thr_1)
    print(json.dumps({
        "metric": f"scaling_efficiency_{args.devices}dev",
        "value": round(eff, 4),
        "unit": "ratio",
        "vs_baseline": round(eff / 0.80, 4),
        "throughput_1dev": round(thr_1, 1),
        f"throughput_{args.devices}dev": round(thr_n, 1),
        "per_device_batch": bpd,
        "solved_frac_1dev": round(solved_1 / b_1, 4),
        f"solved_frac_{args.devices}dev": round(solved_n / b_n, 4),
        "platform": jax.default_backend(),
    }))


def run_joint_theta(args):
    """Coupled shared-theta solve throughput on one chip (SURVEY 2.10(c)).

    All `--batch` scenarios form ONE joint NLP sharing a global theta:
    scalar couplings (merit, residual norms, line search) and the theta
    Schur complement reduce across the scenario vmap axis inside every
    IPM iteration, so this measures the *coupled* solve — not data-
    parallel throughput.  The solution is checked live: theta must be
    bit-identical on every lane and every scenario SOLVED."""
    import jax
    import jax.numpy as jnp
    from sip_optimal_control_tpu import Settings
    from sip_optimal_control_tpu.models.shared_theta import \
        shared_theta_chain
    from sip_optimal_control_tpu.parallel import solve_joint_theta

    spec, dims, topo, lower, upper = shared_theta_chain(
        horizon=args.horizon)
    settings = Settings(max_iterations=args.cold_iters, tol=args.tol,
                        mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5)
    rng = np.random.default_rng(0)
    S = args.batch
    x0s = jnp.asarray(
        rng.standard_normal((S, 2)).astype(np.float32))

    fn = jax.jit(lambda b: solve_joint_theta(
        spec, dims, topo, b, settings=settings, lower=lower, upper=upper))
    res = jax.block_until_ready(fn(x0s))
    times = []
    for _ in range(5):
        t0 = time.time()
        res = jax.block_until_ready(fn(x0s))
        times.append(time.time() - t0)
    th = np.asarray(res.vars.theta)
    statuses = np.asarray(res.status)
    t_best = min(times)
    print(json.dumps({
        "metric": "joint_theta_coupled_scenarios_per_sec_per_chip",
        "value": round(S / t_best, 1),
        "unit": "scenarios/s/chip",
        "vs_baseline": round(S / t_best / 10000.0, 4),
        "scenarios": S,
        "horizon": args.horizon,
        "t_joint_solve_ms": round(t_best * 1e3, 2),
        "solved_frac": round(float(np.mean(statuses == 0)), 4),
        "iterations": int(np.max(np.asarray(res.iterations))),
        "theta": float(th[0, 0]),
        "theta_replicated_exactly": bool(np.all(th == th[0])),
        "platform": jax.default_backend(),
    }))


def _scaling_mp_worker(args):
    """One OS process of the multi-process scaling measurement.  Joins the
    2-"host" SPMD program via jax.distributed (the same initialization a
    multi-host TPU pod uses, cf. tests/test_multiprocess_sharding.py),
    solves its addressable shard of the global batch, and prints its timed
    region (process 0 only)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    proc_id = int(os.environ["_SOC_MP_PROC_ID"])
    num_procs = int(os.environ["_SOC_MP_NUM_PROCS"])
    if num_procs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{os.environ['_SOC_MP_PORT']}",
            num_processes=num_procs, process_id=proc_id)
    # DISTINCT cache dir for the CPU workers: the shared .jax_cache can
    # hold CPU executables produced by the tunnel's remote-compile service
    # on a different machine type; XLA loads such AOT results with a
    # machine-feature-mismatch warning and degraded (or unsafe) code,
    # which serialized this measurement (observed: proc 0 pegged at 100%
    # on a mismatched executable while proc 1 idled at the collective).
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR + "_mp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sip_optimal_control_tpu import Settings
    from sip_optimal_control_tpu.parallel import (scenario_mesh,
                                                  solve_batch_sharded,
                                                  solve_joint_theta)

    settings = Settings(max_iterations=args.cold_iters, tol=args.tol,
                        mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5)
    mesh = scenario_mesh()          # all global devices, one per process
    B = args.batch * num_procs      # weak scaling: fixed batch per process
    rng = np.random.default_rng(0)  # same seed in every process
    if args.joint_theta:
        from sip_optimal_control_tpu.models.shared_theta import \
            shared_theta_chain
        spec, dims, topo, lower, upper = shared_theta_chain(
            horizon=args.horizon)
        x0s_np = rng.standard_normal((B, 2)).astype(np.float32)
    else:
        spec, dims, topo, lower, upper, x0 = get_model(args.model,
                                                       args.horizon)
        x0s_np = np.tile(np.asarray(x0, np.float32), (B, 1))
        x0s_np += 0.05 * rng.standard_normal(
            x0s_np.shape).astype(np.float32)
    sharding = NamedSharding(mesh, P("scenario"))
    x0s = jax.make_array_from_callback(
        x0s_np.shape, sharding, lambda idx: x0s_np[idx])

    if args.joint_theta:
        # ONE coupled NLP: the theta Schur psums cross the process
        # boundary inside every IPM iteration (SURVEY 2.10(c))
        fn = jax.jit(lambda b: solve_joint_theta(
            spec, dims, topo, b, settings=settings, mesh=mesh,
            lower=lower, upper=upper))
    else:
        fn = jax.jit(lambda b: solve_batch_sharded(
            spec, dims, topo, b, settings=settings, mesh=mesh,
            lower=lower, upper=upper,
            stats_collectives=bool(args.stats_collectives)))
    out = jax.block_until_ready(fn(x0s))  # compile + warm
    import resource
    times = []
    cpu0 = resource.getrusage(resource.RUSAGE_SELF)
    wall0 = time.time()
    for _ in range(args.reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(x0s))
        times.append(time.time() - t0)
    cpu1 = resource.getrusage(resource.RUSAGE_SELF)
    # process CPU seconds over the timed region: on the coordinator-hosting
    # process this includes the distributed-service thread's spin, on the
    # other workers it is (nearly) pure compute — the DIFFERENCE measures
    # the coordinator overhead directly (VERDICT r3 item 7)
    cpu_s = (cpu1.ru_utime - cpu0.ru_utime) + (cpu1.ru_stime - cpu0.ru_stime)
    if args.joint_theta:
        # SolveResult batch; count SOLVED over this process's shards
        solved = int(sum(np.sum(np.asarray(s.data) == 0)
                         for s in out.status.addressable_shards))
        solved *= num_procs   # statuses identical across lanes by design
    else:
        _, statuses, stats = out
        # addressable shards only (multi-process arrays cannot be
        # np.asarray'd whole): with stats collectives the value is the
        # replicated global count; without, it is this process's local
        # count (reported as-is — the efficiency math never uses it)
        solved = int(sum(np.sum(np.asarray(s.data))
                         for s in stats.total_solved.addressable_shards))
    # every process prints; the parent reads each worker's last line
    print(json.dumps({"t_best": min(times),
                      "t_timed_wall": time.time() - wall0,
                      "cpu_s": cpu_s,
                      "proc_id": proc_id,
                      "solved": solved,
                      "batch": B}), flush=True)


def run_scaling_mp(args):
    """Multi-PROCESS weak-scaling efficiency: the honest 2-host analog.

    The in-process `--mode scaling` number shares all host cores between
    its virtual devices, so it UNDER-reports efficiency (the N-device run
    gets the same silicon as the 1-device run).  Here per-"host" resources
    are held constant instead: each OS process is pinned (taskset) to its
    own disjoint core set, the baseline is one process on one such set,
    and the 2-process run is joined by jax.distributed with collectives
    crossing the process boundary — exactly a 2-host pod slice with
    localhost playing the DCN.  efficiency = thr_2p / (2 * thr_1p)."""
    import socket
    import multiprocessing

    ncores = multiprocessing.cpu_count()
    if ncores < 2:
        sys.exit("--mode scaling-mp needs >= 2 CPU cores to pin two "
                 "disjoint core sets")
    per = max(1, ncores // 2)
    cores = [f"0-{per - 1}" if per > 1 else "0",
             f"{per}-{2 * per - 1}" if per > 1 else "1"]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    _STRESS = ("import numpy as np\n"
               "a = np.ones(32 * 1024 * 1024); b = np.ones_like(a)\n"
               "while True:\n"
               "    b[:] = a; a += 1.0\n")

    def spawn(num_procs, mem_stress=False, independent=False):
        """independent=True: launch `num_procs` UNCOUPLED single-process
        workers simultaneously (no jax.distributed, no collectives) —
        the shared-hardware scaling limit; the delta between this and
        the joined run isolates the collective/coordination cost."""
        env_base = dict(os.environ)
        env_base[_MP_WORKER_ENV] = "1"
        env_base["JAX_PLATFORMS"] = "cpu"
        # CPU-only workers must not hold the TPU tunnel session
        env_base["PALLAS_AXON_POOL_IPS"] = ""
        # one compute thread per pinned core: XLA:CPU's pool is sized to
        # ALL visible cores and its idle workers spin-wait, so a 2-thread
        # pool pinned to 1 core halves itself with context switches
        # (observed: a persistent ~99% spinner thread next to the real
        # compute thread)
        env_base["XLA_FLAGS"] = (env_base.get("XLA_FLAGS", "")
                                 + " --xla_cpu_multi_thread_eigen=false"
                                 " intra_op_parallelism_threads=1").strip()
        env_base["_SOC_MP_NUM_PROCS"] = str(num_procs)
        env_base["_SOC_MP_PORT"] = port
        procs = []
        for i in range(num_procs):
            env = dict(env_base)
            env["_SOC_MP_PROC_ID"] = str(0 if independent else i)
            if independent:
                env["_SOC_MP_NUM_PROCS"] = "1"
            procs.append(subprocess.Popen(
                ["taskset", "-c", cores[i], sys.executable] + sys.argv,
                env=env, stdout=subprocess.PIPE, text=True))
        stress = None
        if mem_stress:
            # saturate the OTHER core with DRAM-streaming work: measures
            # the 1-process throughput under the same shared-memory-
            # bandwidth load the 2-process run experiences
            stress = subprocess.Popen(
                ["taskset", "-c", cores[1], sys.executable, "-c", _STRESS])
        try:
            outs = [p.communicate(timeout=1800)[0] for p in procs]
        finally:
            if stress is not None:
                stress.kill()
                stress.wait()
        for i, p in enumerate(procs):
            assert p.returncode == 0, f"worker {i} failed"
        recs = [json.loads(o.strip().splitlines()[-1]) for o in outs]
        if independent:
            thr = sum(r["batch"] / r["t_best"] for r in recs)
            return thr, sum(r["solved"] for r in recs), \
                sum(r["batch"] for r in recs), recs
        rec = recs[0]
        return (rec["batch"] / rec["t_best"], rec["solved"], rec["batch"],
                recs)

    thr_1, solved_1, b_1, _ = spawn(1)
    thr_1c, _, _, _ = spawn(1, mem_stress=True)
    thr_2i, _, _, _ = spawn(2, independent=True)
    thr_2, solved_2, b_2, recs_2 = spawn(2)
    eff = thr_2 / (2.0 * thr_1)
    # decomposition: eff = eff_hardware x eff_collectives, where
    # eff_hardware = thr_2_independent / (2 thr_1) is the shared-silicon
    # limit of two uncoupled workers, and eff_collectives = thr_2 /
    # thr_2_independent isolates the jax.distributed/gloo coupling cost
    eff_hw = thr_2i / (2.0 * thr_1)
    eff_coll = thr_2 / max(thr_2i, 1e-9)
    # efficiency against the CONTENDED single-process baseline: what one
    # core actually delivers when the box's shared DRAM bandwidth carries
    # a second streaming workload — the honest per-host denominator for
    # weak scaling on a 2-core testbed (a real TPU host has dozens of
    # cores per memory domain, so this contention amortizes there)
    eff_contended = thr_2 / (2.0 * max(thr_1c, 1e-9))
    # Compute-only efficiency (VERDICT r3 item 7), MEASURED: both workers
    # run identical compute pinned to one core each, so the coordinator
    # host's extra process-CPU over the other worker IS the distributed
    # service thread's utilization.  Subtract it from the silicon
    # denominator: of the 2*wall core-seconds the 2-process run occupied,
    # coord_cpu_s were the coordinator service, not solver compute.
    wall_2 = max(r["t_timed_wall"] for r in recs_2)
    cpu_by_proc = {r["proc_id"]: r["cpu_s"] for r in recs_2}
    coord_cpu = max(0.0, cpu_by_proc.get(0, 0.0) - cpu_by_proc.get(1, 0.0))
    denom_frac = max(1e-9, 1.0 - coord_cpu / (2.0 * wall_2))
    eff_compute = eff / denom_frac
    variant = ("_joint_theta" if args.joint_theta
               else "" if args.stats_collectives else "_nostats")
    print(json.dumps({
        "metric": "scaling_efficiency_2proc_pinned" + variant,
        "value": round(eff, 4),
        "unit": "ratio",
        "vs_baseline": round(eff / 0.80, 4),
        "throughput_1proc": round(thr_1, 1),
        "throughput_1proc_contended": round(thr_1c, 1),
        "throughput_2proc_independent": round(thr_2i, 1),
        "throughput_2proc": round(thr_2, 1),
        "contended_baseline_efficiency": round(eff_contended, 4),
        "hardware_efficiency": round(eff_hw, 4),
        "collective_efficiency": round(eff_coll, 4),
        # measured coordinator-service share of the 2-proc run's silicon,
        # and the efficiency with that share removed from the denominator
        "coordinator_cpu_frac": round(coord_cpu / (2.0 * wall_2), 4),
        "compute_only_efficiency": round(eff_compute, 4),
        "cores_per_proc": per,
        "per_proc_batch": args.batch,
        "solved_frac_1proc": round(solved_1 / b_1, 4),
        "solved_frac_2proc": round(solved_2 / b_2, 4),
    }))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--horizon", type=int, default=50)
    parser.add_argument("--model",
                        choices=["cartpole", "quadrotor", "chain16",
                                 "robust_tree"],
                        default="cartpole",
                        help="robust_tree (scenario-tree robust MPC) runs "
                        "all modes; its warm start is the tree shift "
                        "(first-child successor map, mpc._shift_warm_"
                        "start_tree)")
    parser.add_argument("--mode",
                        choices=["mpc", "cold", "latency", "scaling",
                                 "scaling-mp", "joint-theta"],
                        default="mpc")
    parser.add_argument("--joint-theta", type=int, default=0,
                        help="scaling-mp only: 1 = the workers solve ONE "
                        "coupled NLP sharing a global theta across all "
                        "processes (theta-Schur psums cross the process "
                        "boundary inside every IPM iteration) instead of "
                        "independent per-scenario solves")
    parser.add_argument("--stats-collectives", type=int, default=1,
                        help="scaling-mp only: 0 = drop the per-dispatch "
                        "psum/pmax/pmean metric aggregates from the "
                        "compiled program (pure-DP joined scaling; "
                        "VERDICT r4 weak #2)")
    parser.add_argument("--warm-iters", type=int, default=16)
    parser.add_argument("--warm-mu", type=float, default=None,
                        help="barrier restart for warm-started re-solves "
                        "(default: 3e-3 in RTI mode, 1e-4 in while-loop "
                        "mode — the soft restart is what lets a fixed "
                        "7-iteration budget recenter disturbed scenarios: "
                        "measured rms 0.843 at 3e-3 vs 3.4+ at 1e-4 for "
                        "K<=7)")
    parser.add_argument("--cold-iters", type=int, default=100)
    parser.add_argument("--warmup-steps", type=int, default=100,
                        help="untimed MPC steps before the timed region "
                        "(long enough to clear the swing-up transient, so "
                        "the timed region measures steady-state regulation "
                        "under disturbance)")
    parser.add_argument("--steps-per-call", type=int, default=25,
                        help="MPC steps scanned inside one dispatch (mpc "
                        "mode): amortizes fixed per-dispatch cost")
    parser.add_argument("--noise", type=float, default=0.05,
                        help="plant disturbance std (fixed seed; DEFAULT "
                        "ON). Scenarios that exhaust the warm iteration "
                        "budget truncate with MAX_ITERATIONS and re-enter "
                        "warm next step, so stragglers cannot stall the "
                        "batch; their fraction is 1 - solved_frac")
    parser.add_argument("--tol", type=float, default=1e-3)
    parser.add_argument("--ls-steps", type=int, default=None,
                        help="line-search backtracking depth cap (the "
                        "vmapped LS while_loop runs to the batch max, "
                        "~0.2 ms per trip — the dominant per-iteration "
                        "cost at the default 25)")
    parser.add_argument("--backtrack", type=float, default=None,
                        help="line-search backtracking factor")
    parser.add_argument("--ls-chunk", type=int, default=None,
                        help="candidate alphas per LS while-loop trip "
                        "(vectorized probe; cuts batch-max LS trips to "
                        "ceil(depth/chunk))")
    parser.add_argument("--backend", choices=["scan", "assoc", "pallas"],
                        default="pallas", help="chain-Riccati backend")
    parser.add_argument("--precision",
                        choices=["highest", "float32", "default"],
                        default=None,
                        help="matmul precision inside the solve (library "
                        "default 'highest' = full-f32 passes; 'default' = "
                        "bf16 MXU passes, faster but quality-bar-gated)")
    parser.add_argument("--hessian", choices=["exact", "gauss_newton"],
                        default="gauss_newton",
                        help="Gauss-Newton is the bench default (the "
                        "real-time-MPC standard): measured BOTH more robust "
                        "on the disturbance workload (PSD Hessian blocks -> "
                        "no indefiniteness failures; solved_frac 0.997 vs "
                        "0.984 at B=64/CPU) and ~5x cheaper to evaluate "
                        "(no second-order autodiff through the RK4 "
                        "dynamics, which is 88%% of an exact-mode "
                        "iteration). The library default stays 'exact' "
                        "(reference-parity semantics); SOLVED means the "
                        "same thing in both modes (the convergence test "
                        "uses the exact KKT residual)")
    parser.add_argument("--devices", type=int, default=8,
                        help="mesh size for --mode scaling")
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--pipeline", type=int, default=1,
                        help="1 (default): keep the dispatch queue "
                        "non-empty during the timed region and measure "
                        "completion-to-completion gaps, overlapping the "
                        "remote tunnel's per-dispatch RPC with device "
                        "compute (how a production MPC loop dispatches); "
                        "0: block on every dispatch (pre-r5 behavior)")
    parser.add_argument("--time-budget", type=float, default=210.0,
                        help="soft wall-clock budget (s): the timed-rep "
                        "loop stops early (>= 2 reps) once total elapsed "
                        "time exceeds this, so the JSON line is always "
                        "delivered inside the driver's measurement window "
                        "even when the TPU tunnel stalls session acquire "
                        "(VERDICT r2 item 1)")
    parser.add_argument("--rti", type=int, default=None, metavar="K",
                        help="real-time-iteration mode (DEFAULT; model-default budgets — see the docstring): "
                        "warm re-solves run EXACTLY K fixed IPM "
                        "iterations (lax.scan, no while_loop) — removes "
                        "the batch-straggler waste of running every "
                        "dispatch to the slowest scenario (the r2 "
                        "headline's batch_efficiency was 0.23); truncated "
                        "solves carry warm state to the next step (their "
                        "fraction is 1 - solved_frac) and closed-loop "
                        "quality is gated by the final_state_rms bar + "
                        "usable_frac instead of solved_frac. (K, warm_mu) "
                        "= (7, 3e-3) is the fastest sweep point passing "
                        "the bar (TPU v5e: 113.3k solves/s rms 0.843 "
                        "PASS; K=6 130.5k rms >= 1.17 at every tried mu, "
                        "FAIL vs bar 0.988). 0 = off (convergence-tested "
                        "while_loop; the --warm-iters cap applies)")
    parser.add_argument("--factor-retries", type=int, default=None,
                        help="in-iteration factorization retries (library "
                        "default 3); 0 skips the retry while_loop wrapper "
                        "entirely — failures become rejected steps with a "
                        "reg boost, retried next IPM iteration")
    parser.add_argument("--filter-ls", type=int, default=None,
                        help="1: Waechter-Biegler filter line search "
                        "(the reference's canonical settings enable it, "
                        "tests/variable_dimensions_test.cpp:18-25); 0: "
                        "Armijo merit search. Default is MODE-DEPENDENT: "
                        "filter in fixed-trip RTI mode (strictly better "
                        "acceptance under a truncation budget — cartpole "
                        "solved_frac 0.99 vs 0.84, unlocks K=5: 337.4k vs "
                        "262.0k), Armijo in --rti 0 while-loop mode (the "
                        "filter's nonmonotone acceptance under persistent "
                        "disturbance lets warm re-solves wander: solved "
                        "0.55/diverged 0.10 vs Armijo 0.992/0.0)")
    parser.add_argument("--fused-ls", type=int, default=1,
                        help="1 (default): fused Pallas line-search probe "
                        "(ops/pallas_ls.py) when the model is eligible "
                        "(chain, f32, box bounds); 0: standard XLA probe")
    parser.add_argument("--freeze-ev", type=int, default=None,
                        help="0: exclude the carried ModelEval from the "
                        "RTI freeze-select (Settings.rti_freeze_ev). "
                        "Model default: 0 for robust_tree (the select "
                        "over its StageModelData was ~60%% of every trip "
                        "on the non-fused tree path: 231.2k -> 606.5k "
                        "solves/s at identical quality), 1 elsewhere "
                        "(cartpole measured a ~27%% REGRESSION from the "
                        "r3 variant of this; the fused path has no "
                        "ModelEval in its carry at all)")
    parser.add_argument("--fused-iter", type=int, default=1,
                        help="1 (default): whole-iteration fusion (model "
                        "eval + condensation + Riccati as one Pallas "
                        "kernel chain, solver/fused_chain.py) when the "
                        "model is eligible; 0: standard iteration")
    parser.add_argument("--batch-axis", choices=["lead", "minor"],
                        default="lead",
                        help="scenario-batch vmap axis inside the MPC "
                        "step: 'minor' (axis -1) puts the batch on the "
                        "TPU vector lanes so small stage dims stop being "
                        "lane-padded (see build_mpc_scan)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    if args.mode == "scaling":
        run_scaling(args)
        return

    if args.mode == "scaling-mp":
        if os.environ.get(_MP_WORKER_ENV) == "1":
            _scaling_mp_worker(args)
        else:
            run_scaling_mp(args)
        return

    if args.mode == "joint-theta":
        run_joint_theta(args)
        return

    _T0 = time.time()
    phases = {}
    import jax
    import jax.numpy as jnp
    from sip_optimal_control_tpu import Settings, build_problem, solve

    # Honor JAX_PLATFORMS at config level: the ambient sitecustomize
    # registers the TPU plugin and imports jax before this script runs,
    # which silently overrides the env var (cf. benchmarks/common.py).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # persistent executable cache: repeated harness invocations skip the
    # 30-60 s XLA compile of the jitted MPC scan
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Time the first trivial device op separately: the remote-TPU tunnel
    # serializes client sessions, and a new process can block here for
    # MINUTES waiting for a previous client's session to clear (measured
    # 157-335 s on this box).  Surfacing it as `session_acquire_s` keeps
    # that environmental stall out of the compile/run numbers.
    t0 = time.time()
    jax.block_until_ready(jnp.ones((8,)) + 1.0)
    phases["session_acquire_s"] = round(time.time() - t0, 1)

    def mark(name):
        phases[name] = round(time.time() - _T0, 1)
        if args.verbose:
            print(f"# [{phases[name]:7.1f}s] {name}", file=sys.stderr,
                  flush=True)

    spec, dims, topo, lower, upper, x0 = get_model(args.model, args.horizon)
    mark("t_model")
    if args.rti is None:
        # model-default RTI budgets: cartpole's disturbance regime needs
        # K=7 (see --rti help); robust_tree's scenarios converge in ~2
        # iterations (mean_iterations 2.04), and K=3 passes every quality
        # gate at 3.3x the cold-solve throughput (130.4k vs 39.4k, TPU
        # v5e) — the tree warm start carries the fleet
        # Model-default budgets = each model's measured floor under the
        # quality gates (filter LS): cartpole 5 (K=4 fails the rms bar at
        # every tried warm_mu; Armijo needs 7); chain16 2 = its exact
        # convergence budget (solved_frac 1.0); robust_tree 2 (solved
        # 1.0; K=1 still regulates but truncates everything); quadrotor 4
        # — its closed-loop rms is disturbance-dominated (identical
        # 0.3586 for every K in 3..7), so the budget is chosen by
        # solved_frac health (0.76 at K=4 vs 0.56 at K=3) rather than
        # the saturated rms gate
        args.rti = {"robust_tree": 2, "cartpole": 5, "quadrotor": 4,
                    "chain16": 2}.get(args.model, 7)
    if args.rti is not None and args.rti <= 0:
        args.rti = None         # --rti 0: classic while-loop mode
    if args.mode != "mpc":
        args.rti = None         # RTI is a warm-re-solve (mpc-mode) concept
    if args.freeze_ev is None:
        args.freeze_ev = 0 if args.model == "robust_tree" else 1
    if args.filter_ls is None:
        # mode-dependent default (see --filter-ls help): Armijo for the
        # convergence-tested warm re-solve loop (mpc --rti 0), filter LS
        # everywhere else (RTI budgets, cold solves, scaling modes — all
        # measured healthy with the filter)
        args.filter_ls = 0 if (args.mode == "mpc"
                               and args.rti is None) else 1
    f32 = dict(tol=args.tol, mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5,
               riccati_backend=args.backend,
               fused_iteration=bool(args.fused_iter),
               rti_freeze_ev=bool(args.freeze_ev))
    warm_only = {}
    if args.factor_retries is None and args.rti is not None \
            and args.rti > 0 and args.mode == "mpc":
        # RTI default: no in-iteration retries — GN + reg floor makes
        # factor failures rare, a failure still becomes a rejected step
        # with a reg boost, and skipping the retry while_loop wrapper
        # measured +13% headline (262.0k vs 231.8k, same quality bars).
        # Applied to the WARM settings only: cold starts (constant-
        # trajectory inits, where ill-conditioned factors actually occur)
        # keep the library's retry loop.
        warm_only["max_factor_retries"] = 0
    if args.factor_retries is not None:
        f32["max_factor_retries"] = args.factor_retries
    if args.precision is not None:
        f32["matmul_precision"] = args.precision
    if (args.ls_steps is not None or args.backtrack is not None
            or args.ls_chunk is not None or args.fused_ls
            or args.filter_ls):
        from sip_optimal_control_tpu.solver.settings import LineSearchSettings
        ls_kw = {"fused_probe": bool(args.fused_ls),
                 "use_filter_line_search": bool(args.filter_ls)}
        if args.ls_steps is not None:
            ls_kw["max_steps"] = args.ls_steps
        if args.backtrack is not None:
            ls_kw["backtrack"] = args.backtrack
        if args.ls_chunk is not None:
            ls_kw["chunk"] = args.ls_chunk
        f32["line_search"] = LineSearchSettings(**ls_kw)
    if args.warm_mu is None:
        args.warm_mu = 3e-3 if args.rti is not None else 1e-4
    cold_settings = Settings(max_iterations=args.cold_iters, **f32)
    if args.rti is not None:
        # fixed-trip RTI: K iterations for everyone, no while_loop; LS
        # probes fully vectorized (chunk = depth -> a single trip) unless
        # the user asked for a specific chunk.  Depth 6 (not the library's
        # 10): the profiler showed the chunk-wide probe is ~60% of the
        # trip cost, and depth 6 is the shallowest budget that keeps
        # usable_frac >= 0.99 on the disturbance workload (TPU v5e sweep:
        # 6 -> 143.2k solves/s usable 0.9966 PASS; 5 -> 152.4k usable
        # 0.983 FAIL; deeper budgets only add probe bytes)
        import dataclasses as _dc
        from sip_optimal_control_tpu.solver.settings import \
            LineSearchSettings
        base_ls = f32.get("line_search",
                          LineSearchSettings(fused_probe=bool(args.fused_ls)))
        rti_ls = {}
        if args.ls_steps is None:
            rti_ls["max_steps"] = 6
        if args.ls_chunk is None:
            rti_ls["chunk"] = args.ls_steps if args.ls_steps is not None \
                else 6
        f32["line_search"] = _dc.replace(base_ls, **rti_ls)
        warm_settings = Settings(max_iterations=args.rti,
                                 fixed_iterations=True,
                                 mu_init=args.warm_mu, **f32, **warm_only)
    else:
        warm_settings = Settings(max_iterations=args.warm_iters,
                                 mu_init=args.warm_mu, **f32, **warm_only)

    rng = np.random.default_rng(0)
    n = dims.max_state_dim
    x0s = np.tile(np.asarray(x0, np.float32), (args.batch, 1))
    x0s += 0.1 * rng.standard_normal((args.batch, n)).astype(np.float32)
    x0s = jnp.asarray(x0s)

    if args.mode == "latency":
        # p50 single-solve latency (batch 1, warm-started steady state) —
        # the real-time-MPC number BASELINE also tracks.  NOTE: through the
        # remote-TPU tunnel each dispatch carries ~20 ms fixed RPC latency;
        # on a locally attached chip this is dominated by compute instead.
        warm_step = build_mpc_scan(spec, dims, topo, lower, upper,
                                   warm_settings, args.hessian)
        cold_step = build_mpc_scan(spec, dims, topo, lower, upper,
                                   cold_settings, args.hessian)
        x1 = x0s[:1]
        state = jax.block_until_ready(cold_step(x1, None, None))[:3]
        for _ in range(args.warmup_steps):
            state = jax.block_until_ready(warm_step(*state))[:3]
        times = []
        for _ in range(max(args.reps, 21)):
            t0 = time.time()
            out = jax.block_until_ready(warm_step(*state))
            times.append(time.time() - t0)
        p50_ms = float(np.median(times) * 1e3)
        print(json.dumps({
            "metric": f"p50_warm_solve_latency_ms_h{args.horizon}",
            "value": round(p50_ms, 3),
            "unit": "ms",
            # budget: a 100 Hz real-time MPC loop (10 ms per solve)
            "vs_baseline": round(10.0 / max(p50_ms, 1e-9), 4),
            "best_ms": round(min(times) * 1e3, 3),
            "model": args.model,
            "platform": jax.default_backend(),
            # VERDICT r4 weak #5: on this rig every dispatch crosses the
            # remote-TPU tunnel (~20 ms RPC), so single-solve latency is
            # ENVIRONMENT-BOUND here; compute-side latency is bounded by
            # the batch path's per-step time instead
            "environment_bound": jax.default_backend() == "tpu",
            "note": "each dispatch carries ~20 ms remote-TPU tunnel RPC "
                    "on this rig; see COVERAGE.md",
        }))
        return

    if args.mode == "cold":
        def cold_one(x0_i):
            problem = build_problem(spec, dims, topo, initial_state=x0_i,
                                    lower=lower, upper=upper,
                                    hessian_mode=args.hessian)
            res = solve(problem, cold_settings)
            return res.vars.u, res.status, res.iterations, res.kkt_error
        jfn = jax.jit(jax.vmap(cold_one))
        t0 = time.time()
        out = jax.block_until_ready(jfn(x0s))
        phases["compile_s"] = round(time.time() - t0, 1)
        times = []
        if args.pipeline:
            # same completion-gap pipelining as the mpc timed loop
            depth = max(2, min(args.reps, 8))
            handles = [jfn(x0s) for _ in range(depth)]
            t_prev = time.time()
            gaps = []
            for h in handles:
                jax.block_until_ready(h)
                now = time.time()
                gaps.append(now - t_prev)
                t_prev = now
            out = handles[-1]
            times = gaps[1:] if len(gaps) > 1 else gaps
        else:
            for _ in range(args.reps):
                t0 = time.time()
                out = jax.block_until_ready(jfn(x0s))
                times.append(time.time() - t0)
                if time.time() - _T0 > args.time_budget and len(times) >= 2:
                    break
        statuses, iters, kkt = (np.asarray(out[1])[None],
                                np.asarray(out[2])[None],
                                np.asarray(out[3])[None])
        solves_per_call = args.batch
        metric = f"batched_cold_solves_per_sec_per_chip_h{args.horizon}"
    else:
        # ONE compiled program serves cold-start, warmup and the timed
        # region (VERDICT r2 item 1: the old separate cold-start program
        # roughly doubled XLA compile time and the persistent-cache
        # footprint).  The cold start is the warm program itself, started
        # from constant trajectories at each scenario's x0: full-workspace
        # warm starts carry solver state across dispatches, so the
        # warmup dispatches converge the fleet exactly like the old
        # dedicated 100-iteration cold program did, at zero extra compile.
        from sip_optimal_control_tpu.solver.sip import Primal, YVec
        warm_step = build_mpc_scan(spec, dims, topo, lower, upper,
                                   warm_settings, args.hessian,
                                   steps_per_call=args.steps_per_call,
                                   noise=args.noise, batch=args.batch,
                                   batch_axis=args.batch_axis)
        B, N, E = args.batch, dims.num_nodes, dims.num_edges
        n, m = dims.max_state_dim, dims.max_control_dim
        wv = Primal(x=jnp.tile(x0s[:, None, :], (1, N, 1)),
                    u=jnp.zeros((B, E, m), jnp.float32),
                    theta=jnp.zeros((B, dims.theta_dim), jnp.float32))
        wy = YVec(dyn=jnp.zeros((B, N, n), jnp.float32),
                  nc=jnp.zeros((B, N, dims.max_node_c_dim), jnp.float32),
                  ec=jnp.zeros((B, E, dims.max_edge_c_dim), jnp.float32))
        jax.block_until_ready((x0s, wv, wy))
        mark("t_inputs_on_device")
        t0 = time.time()
        lowered = warm_step.lower(x0s, wv, wy)
        phases["trace_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        compiled = lowered.compile()
        phases["compile_s"] = round(time.time() - t0, 1)
        mark("t_compiled")
        warm_step = compiled
        t0 = time.time()
        out = jax.block_until_ready(warm_step(x0s, wv, wy))
        phases["first_run_s"] = round(time.time() - t0, 1)
        # advance the receding horizon (untimed) to a representative state
        # (warmup_steps counts MPC steps, not dispatches; the first
        # dispatch above already did steps_per_call of them)
        state = out[:3]
        t0 = time.time()
        for _ in range(-(-args.warmup_steps // args.steps_per_call) - 1):
            out = jax.block_until_ready(warm_step(*state))
            state = out[:3]
        phases["warmup_s"] = round(time.time() - t0, 1)

        # time the SAME warm step repeatedly (deterministic workload)
        x_c, wv, wy = state
        times = []
        rep_states = []
        if args.pipeline:
            # Pipelined dispatch: enqueue every rep up front (JAX dispatch
            # is asynchronous), then time completion-to-completion gaps.
            # Through the remote-TPU tunnel each BLOCKING dispatch pays a
            # ~20 ms RPC round trip serially with compute; the r5
            # step-level trace put that transport share at ~18% of the
            # blocking-mode headline.  With the queue kept non-empty the
            # RPC overlaps device compute, so the gaps measure device
            # throughput — which is how a production MPC loop would run
            # (dispatch step k+1 while step k computes).  Inputs are
            # identical per rep and already on device; held outputs are a
            # few MB/rep (depth is capped to bound that and the budget).
            depth = max(2, min(args.reps, 8))
            handles = [warm_step(x_c, wv, wy) for _ in range(depth)]
            t_prev = time.time()
            gaps = []
            for h in handles:
                jax.block_until_ready(h)
                now = time.time()
                gaps.append(now - t_prev)
                t_prev = now
            out = handles[-1]
            # the first gap is a start-up transient (it absorbs whatever
            # part of rep 1 ran before/after the dispatch loop finished);
            # drop it when there are enough reps to spare
            times = gaps[1:] if len(gaps) > 1 else gaps
            # final plant states ([batch, n], 64KB each): pooled below
            # into the closed-loop quality metric (fetched after timing
            # so the transfers don't pollute the gaps)
            rep_states = [np.asarray(h[0]) for h in handles]
        else:
            for _ in range(args.reps):
                t0 = time.time()
                out = jax.block_until_ready(warm_step(x_c, wv, wy))
                times.append(time.time() - t0)
                # final plant states of this rep ([batch, n], 64KB):
                # pooled below into the closed-loop quality metric so it
                # averages over reps x batch samples of the stationary
                # distribution instead of one snapshot (sampling spread
                # ~ +-0.15 rms)
                rep_states.append(np.asarray(out[0]))
                el = time.time() - _T0
                # budget guard: prefer >=2 reps, but deliver the JSON
                # line on a single rep rather than blow the measurement
                # window when the tunnel stalled this process for minutes
                if (el > args.time_budget and len(times) >= 2) or (
                        el > args.time_budget + 60 and len(times) >= 1):
                    break
        mark("t_timed_done")
        # [steps, batch] quality stats over the WHOLE timed region
        statuses, iters, kkt = (
            np.asarray(out[3]).reshape(-1, args.batch),
            np.asarray(out[4]).reshape(-1, args.batch),
            np.asarray(out[5]).reshape(-1, args.batch))
        mark("t_fetched")
        # closed-loop CONTROL quality: RMS plant state over the timed
        # region (the real-time-iteration question is whether truncated
        # re-solves still regulate, not whether each one reached tol)
        final_state_rms = float(np.sqrt(np.mean(
            np.concatenate(rep_states, axis=0) ** 2)))
        solves_per_call = args.batch * args.steps_per_call
        metric = f"batched_mpc_solves_per_sec_per_chip_h{args.horizon}"

    # Median, not best-of: the remote tunnel's block_until_ready can
    # glitch-return in <1 ms (observed once in ~60 runs), and a poisoned
    # min() would report a nonsense headline.  Reps faster than 10% of the
    # median are discarded as transport glitches.
    med = float(np.median(times))
    times = [t for t in times if t > 0.1 * med] or [med]
    t_best = float(np.median(times))
    solves_per_sec = solves_per_call / t_best
    solved_frac = float(np.mean(statuses == 0))
    diverged_frac = float(np.mean(statuses >= 2))
    mean_iters = float(np.mean(iters))
    finite_kkt = kkt[np.isfinite(kkt)]
    max_kkt = float(np.max(finite_kkt)) if finite_kkt.size else -1.0
    p50_kkt = float(np.percentile(finite_kkt, 50)) if finite_kkt.size \
        else -1.0
    p99_kkt = float(np.percentile(finite_kkt, 99)) if finite_kkt.size \
        else -1.0

    # Utilization: the vmapped while_loop executes each scan step to the
    # batch's slowest scenario, so hardware trips = sum over steps of the
    # per-step batch max; useful trips = every scenario's own count.  In
    # --rti mode the trip count is the fixed budget K instead.
    fpi = flops_per_newton_iteration(dims)
    if args.rti is not None and args.mode == "mpc":
        hw_iters = float(args.rti * statuses.shape[0]) * args.batch
    else:
        hw_iters = float(np.sum(np.max(iters, axis=1))) * args.batch
    useful_iters = float(np.sum(iters))
    hw_flops_per_sec = hw_iters * fpi / t_best
    dev = jax.devices()[0]
    peak = peak_flops_bf16(dev)

    # ----- quality bars (VERDICT r2 item 3) ------------------------------
    # `usable` mirrors the failsafe inside the MPC step: SOLVED, or
    # truncated (MAX_ITERATIONS) but still in a sane KKT neighborhood.
    usable_frac = float(np.mean(
        (statuses == 0) | ((statuses == 1) & (kkt < 1e2))))
    quality = {"usable_frac": round(usable_frac, 4)}
    quality_ok = usable_frac >= 0.99
    if args.mode == "mpc":
        # Closed-loop bar: the fully-converged controller on this exact
        # noise seed regulates to final_state_rms ~= RMS_FLOOR (measured
        # 0.790 with --warm-iters 30, solved_frac 0.996, TPU v5e,
        # 2026-08-21; see COVERAGE.md); an RTI/truncated config must stay
        # within 25% of that floor to count as "regulating".
        # converged-controller closed-loop floors, measured per model on
        # this exact noise seed at fully-converged settings (cartpole
        # r3; quadrotor/chain16/robust_tree r4 — their RTI-default rms
        # values are identical to their converged values)
        RMS_FLOOR = {"cartpole": 0.79, "quadrotor": 0.359,
                     "chain16": 0.0734, "robust_tree": 0.152}.get(
                         args.model)
        if RMS_FLOOR is not None and args.noise == 0.05:
            quality["final_state_rms_bar"] = round(1.25 * RMS_FLOOR, 3)
            quality_ok &= final_state_rms <= 1.25 * RMS_FLOOR

    record = {
        "metric": metric,
        "value": round(solves_per_sec, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_sec / 10000.0, 4),
        # auditable quality stats over the timed region
        "solved_frac": round(solved_frac, 4),
        "diverged_frac": round(diverged_frac, 5),
        "mean_iterations": round(mean_iters, 2),
        "max_kkt_error": float(f"{max_kkt:.3e}"),
        "p50_kkt_error": float(f"{p50_kkt:.3e}"),
        "p99_kkt_error": float(f"{p99_kkt:.3e}"),
        **quality,
        "quality_ok": bool(quality_ok),
        **({"rti_iters": args.rti} if args.rti is not None else {}),
        "tol": args.tol,
        "noise": args.noise,
        "batch": args.batch,
        "model": args.model,
        "hessian": args.hessian,
        "p50_batch_ms": round(float(np.median(times)) * 1e3, 2),
        **({"pipelined_dispatch": True} if (
            args.pipeline and args.mode in ("mpc", "cold")) else {}),
        **({"final_state_rms": round(final_state_rms, 4)}
           if args.mode == "mpc" else {}),
        # analytic linear-algebra-core FLOPs (lower bound; model autodiff
        # and line-search probes excluded)
        "flops_per_iteration": float(f"{fpi:.4g}"),
        "achieved_tflops": round(hw_flops_per_sec / 1e12, 4),
        # fraction of executed while_loop trips doing useful work (the
        # vmapped loop runs every scenario to the batch's slowest)
        "batch_efficiency": round(useful_iters / max(hw_iters, 1.0), 4),
        "platform": jax.default_backend(),
        # phase breakdown (session_acquire_s is the remote tunnel waiting
        # for a previous client's session to clear — environmental, not
        # this program's work)
        **phases,
        "total_wall_s": round(time.time() - _T0, 1),
        "timed_reps": len(times),
    }
    if peak > 0:
        record["pct_peak_bf16"] = round(100.0 * hw_flops_per_sec / peak, 3)
    # bandwidth roofline: analytic stage-array traffic per executed
    # iteration / measured time, vs the chip's HBM peak (the binding
    # ceiling for tiny-matrix batched workloads)
    bpi = bytes_per_newton_iteration(dims)
    peak_bw = peak_hbm_bytes(dev)
    record["bytes_per_iteration"] = float(f"{bpi:.4g}")
    record["achieved_hbm_gbps"] = round(hw_iters * bpi / t_best / 1e9, 1)
    if peak_bw > 0:
        record["pct_peak_hbm"] = round(
            100.0 * hw_iters * bpi / t_best / peak_bw, 2)
        if record["pct_peak_hbm"] > 100.0:
            # the analytic count gives NO fusion credit (full-matrix
            # streams, A/B materialized); the fused kernels stream packed
            # triangles and recompute A/B in-kernel at n >= 8, so real
            # traffic sits below the analytic count and the ratio can
            # legitimately exceed 100% — it is a roofline the kernels
            # BEAT, not a measurement error
            record["hbm_roofline_note"] = (
                "above the no-fusion-credit analytic roof: fused kernels "
                "stream packed triangles / recompute A,B in-kernel")
    if args.verbose:
        print(f"# backend={jax.default_backend()} "
              f"device={getattr(dev, 'device_kind', '?')} "
              f"phases={phases} "
              f"best_batch_time={t_best * 1e3:.2f}ms", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
