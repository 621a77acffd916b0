"""Root-cause one max-KKT tail lane of the headline bench (VERDICT r4
weak #3 / item 4).

The headline records max_kkt_error ~1e3 on ~1-in-1e5 warm re-solves
(p99 is 0.08; the usable-frac failsafe zeroes those lanes).  The timed
dispatch is DETERMINISTIC (fixed seeds, same warm state every rep), so
the event is exactly reproducible: this script replays the bench flow,
finds the argmax (step, lane), replays that lane's MPC history in a
1024-copy batch (every vector lane computes identically, so the fused
kernels follow the exact headline code path), and then dissects the bad
re-solve: per-iteration KKT/status/alpha trajectory via truncated
re-solves, the warm-state magnitudes feeding it, and cross-checks
(standard-path solve, retries enabled, smaller warm mu, f64 ground
truth on CPU is left to the caller).

Usage (on the TPU):  python scripts/diag_tail.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses
    from bench import build_mpc_scan, get_model
    from sip_optimal_control_tpu import Settings, build_problem, solve
    from sip_optimal_control_tpu.solver.settings import LineSearchSettings
    from sip_optimal_control_tpu.solver.sip import Primal, YVec

    B, T, K, SPC = 4096, 50, 5, 25
    spec, dims, topo, lower, upper, x0 = get_model("cartpole", T)
    n, m = dims.max_state_dim, dims.max_control_dim
    N, E = dims.num_nodes, dims.num_edges

    def settings(fused=True, iters=K, retries=0, mu=3e-3):
        return Settings(
            max_iterations=iters, fixed_iterations=True, mu_init=mu,
            tol=1e-3, mu_min=1e-5, reg_floor=1e-5, prox_reg=1e-5,
            riccati_backend="pallas", fused_iteration=fused,
            max_factor_retries=retries,
            line_search=LineSearchSettings(
                max_steps=6, chunk=6, fused_probe=True,
                use_filter_line_search=True))

    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(x0, np.float32), (B, 1))
    x0s += 0.1 * rng.standard_normal((B, n)).astype(np.float32)
    x0s = jnp.asarray(x0s)
    wv = Primal(x=jnp.tile(x0s[:, None, :], (1, N, 1)),
                u=jnp.zeros((B, E, m), jnp.float32),
                theta=jnp.zeros((B, 0), jnp.float32))
    wy = YVec(dyn=jnp.zeros((B, N, n), jnp.float32),
              nc=jnp.zeros((B, N, 0), jnp.float32),
              ec=jnp.zeros((B, E, 0), jnp.float32))

    step = build_mpc_scan(spec, dims, topo, lower, upper, settings(),
                          "gauss_newton", steps_per_call=SPC, noise=0.05,
                          batch=B)
    state = (x0s, wv, wy)
    for _ in range(4):                      # 100 warmup MPC steps
        out = jax.block_until_ready(step(*state))
        state = out[:3]
    out = jax.block_until_ready(step(*state))   # THE timed dispatch
    kkt = np.asarray(out[5])                    # [SPC, B]
    statuses = np.asarray(out[3])
    fin = np.where(np.isfinite(kkt), kkt, -1.0)
    s_bad, l_bad = np.unravel_index(np.argmax(fin), fin.shape)
    print(f"argmax kkt {fin[s_bad, l_bad]:.4g} at step {s_bad} "
          f"lane {l_bad} status {statuses[s_bad, l_bad]}; "
          f"lane's kkt across the dispatch: "
          f"{np.array2string(kkt[:, l_bad], precision=2)}")

    # ---- replay the lane: 1024 copies follow the identical kernel path --
    dist = np.asarray(0.05 * np.random.default_rng(12345).standard_normal(
        (SPC, B, n)).astype(np.float32))[:, l_bad]      # [SPC, n]
    R = 1024

    def rep(a):
        a = np.asarray(a)[l_bad]
        return jnp.asarray(np.tile(a[None], (R,) + (1,) * a.ndim))

    x_c = rep(state[0])
    lv = jax.tree.map(rep, state[1])
    ly = jax.tree.map(rep, state[2])

    step1 = build_mpc_scan(spec, dims, topo, lower, upper, settings(),
                           "gauss_newton", steps_per_call=1, noise=0.0,
                           batch=R)
    for s in range(s_bad):
        o = jax.block_until_ready(step1(x_c, lv, ly))
        x_c, lv, ly = o[0] + dist[s][None], o[1], o[2]
    # state now feeds the bad re-solve
    if s_bad > 0:
        print(f"replay check: kkt at step {s_bad - 1} was "
              f"{float(np.asarray(o[5])[0]):.4g} "
              f"(bench recorded {kkt[s_bad - 1, l_bad]:.4g})")
    print("warm-state magnitudes feeding the bad step: "
          f"|x0|inf={float(jnp.max(jnp.abs(x_c))):.3g} "
          f"|wv.u|inf={float(jnp.max(jnp.abs(lv.u))):.3g} "
          f"|wy|inf={float(jnp.max(jnp.abs(ly.dyn))):.3g}")

    # ---- dissect the bad re-solve ---------------------------------------
    def solve_variant(name, st):
        def one(x0_i, iv, iy):
            problem = build_problem(spec, dims, topo, initial_state=x0_i,
                                    lower=lower, upper=upper,
                                    hessian_mode="gauss_newton")
            r = solve(problem, st, init_vars=iv, init_y=iy)
            return r.status, r.kkt_error, r.mu, r.f
        o = jax.jit(jax.vmap(one))(x_c, lv, ly)
        print(f"  {name:34s} status={int(np.asarray(o[0])[0])} "
              f"kkt={float(np.asarray(o[1])[0]):.4g} "
              f"mu={float(np.asarray(o[2])[0]):.2e} "
              f"f={float(np.asarray(o[3])[0]):.4g}")
        return o

    print(f"per-iteration trajectory of the bad re-solve (truncations):")
    for k in range(1, K + 1):
        solve_variant(f"fused K={k}", settings(iters=k))
    print("cross-checks:")
    solve_variant("standard path K=5", settings(fused=False))
    solve_variant("fused K=5 retries=3", settings(retries=3))
    solve_variant("fused K=5 warm_mu=1e-4", settings(mu=1e-4))
    solve_variant("fused K=12", settings(iters=12))
    solve_variant("fused K=40 while-loop", dataclasses.replace(
        settings(iters=40), fixed_iterations=False))


if __name__ == "__main__":
    main()
