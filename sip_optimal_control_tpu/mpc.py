"""Receding-horizon MPC driver with warm starting (BASELINE config 4).

The domain equivalent of checkpoint/resume: the solver state is an explicit
pytree the caller threads between re-solves (the reference exposes
sip_workspace.vars.{x,y} for the same purpose,
reference: tests/variable_dimensions_test.cpp:437-446).  The whole MPC loop
is one `lax.scan`, so an entire closed-loop rollout — plant included — jits
and vmaps as a unit.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .model import ModelSpec, build_problem
from .solver.settings import Settings
from .solver.sip import Primal, YVec, solve
from .types import Dimensions, Topology


class MPCTrace(NamedTuple):
    states: jax.Array       # [steps+1, n] closed-loop plant states
    controls: jax.Array     # [steps, m] applied controls
    iterations: jax.Array   # [steps] solver iterations per re-solve
    statuses: jax.Array     # [steps]
    kkt_errors: jax.Array   # [steps]


def _shift_warm_start(vars: Primal, y: YVec, topology=None):
    """Shift the predicted trajectory one stage forward — the classic MPC
    warm start (duplicate the terminal stage).  With a non-chain
    `topology`, dispatches to the tree generalization."""
    if topology is not None and not topology.is_chain:
        return _shift_warm_start_tree(vars, y, topology)

    def shift_nodes(a):
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    return (Primal(x=shift_nodes(vars.x), u=shift_nodes(vars.u),
                   theta=vars.theta),
            YVec(dyn=shift_nodes(y.dyn), nc=shift_nodes(y.nc),
                 ec=shift_nodes(y.ec)))


def _tree_successor_maps(topology):
    """Static first-child successor maps for the tree shift warm start.

    node_succ[i] = first child of node i (itself for leaves);
    edge_succ[e] = first outgoing edge of child(e) (e itself when child(e)
    is a leaf).  "First" = lowest edge index, which for the scenario-tree
    constructions used here is the lowest-numbered branch — so the shared
    prefix of a receding-horizon robust MPC tree shifts into branch 0's
    trajectory, and every branch shifts along itself (branches are chains
    past the branch point).  Reference context: receding-horizon warm
    starting via persisted vars (tests/variable_dimensions_test.cpp:437-446)
    generalized to the tree topologies of lqr.hpp:5-22."""
    import numpy as np
    E = topology.num_edges
    N = E + 1
    parents = np.asarray(topology.edge_parents)
    children = np.asarray(topology.edge_children)
    first_edge = np.full(N, -1, dtype=np.int64)
    for e in range(E - 1, -1, -1):      # lowest edge index wins
        first_edge[parents[e]] = e
    node_succ = np.arange(N)
    has_child = first_edge >= 0
    node_succ[has_child] = children[first_edge[has_child]]
    edge_succ = np.arange(E)
    child_first = first_edge[children]
    edge_succ[child_first >= 0] = child_first[child_first >= 0]
    return node_succ, edge_succ


def _shift_warm_start_tree(vars: Primal, y: YVec, topology):
    """Tree shift warm start: every node/edge takes its first-child
    successor's value (leaves repeat) — on a chain this reduces exactly to
    the one-stage shift.  The shared prefix of a scenario tree is
    well-defined under the receding horizon (those stages are common to
    all futures); branch stages shift along their own branch."""
    node_succ, edge_succ = _tree_successor_maps(topology)
    return (Primal(x=vars.x[node_succ], u=vars.u[edge_succ],
                   theta=vars.theta),
            YVec(dyn=y.dyn[node_succ], nc=y.nc[node_succ],
                 ec=y.ec[edge_succ]))


def run_mpc(spec: ModelSpec, dims: Dimensions, topology: Topology,
            x0, n_steps: int, settings: Optional[Settings] = None,
            lower=None, upper=None,
            plant: Optional[Callable] = None,
            warm_start: bool = True,
            reset_on_failure: bool = True,
            kkt_reset_threshold: float = 1e2) -> MPCTrace:
    """Closed-loop MPC: at each step solve the horizon problem from the
    current plant state, apply u[0], advance the plant, warm start the next
    solve from the shifted solution.

    `plant(x, u) -> x_next` defaults to the model dynamics (edge 0).

    `reset_on_failure` (production failsafe): SOLVED iterates, and
    MAX_ITERATIONS iterates whose KKT error is still below
    `kkt_reset_threshold` (real-time-iteration contract), warm-start the
    next re-solve; a STALLED / DIVERGED / FACTORIZATION_FAILURE or
    non-finite scenario instead applies zero control this step and
    restarts next step from the cold default init, so one bad re-solve
    cannot poison the loop's warm state forever."""
    settings = settings or Settings()
    theta0 = jnp.zeros((dims.theta_dim,))
    if plant is None:
        def plant(x, u):
            return spec.dynamics(x, u, theta0, 0)

    def step(carry, _):
        x, warm_vars, warm_y, have_warm = carry
        problem = build_problem(spec, dims, topology, initial_state=x,
                                lower=lower, upper=upper)
        if warm_start:
            init_vars = jax.tree.map(
                lambda w, d: jnp.where(have_warm, w, d), warm_vars,
                problem.default_init)
            result = solve(problem, settings, init_vars=init_vars,
                           init_y=warm_y)
        else:
            result = solve(problem, settings)
        u0 = result.vars.u[0]
        if reset_on_failure:
            usable = (((result.status == 0)
                       | ((result.status == 1)
                          & (result.kkt_error < kkt_reset_threshold)))
                      & jnp.isfinite(result.kkt_error)
                      & jnp.all(jnp.isfinite(result.vars.x))
                      & jnp.all(jnp.isfinite(result.vars.u)))
            u0 = jnp.where(usable, u0, jnp.zeros_like(u0))
        else:
            usable = jnp.asarray(True)
        x_next = plant(x, u0)
        next_vars, next_y = _shift_warm_start(result.vars, result.y, topology)
        # unusable -> have_warm=False selects default_init next step; the
        # dual warm start must be scrubbed too (it is passed regardless)
        next_y = jax.tree.map(
            lambda a: jnp.where(usable, a, jnp.zeros_like(a)), next_y)
        out = (x_next, u0, result.iterations, result.status,
               result.kkt_error)
        return (x_next, next_vars, next_y, usable), out

    n = dims.max_state_dim
    m = dims.max_control_dim
    N, E = dims.num_nodes, dims.num_edges
    zero_vars = Primal(x=jnp.zeros((N, n)), u=jnp.zeros((E, m)),
                       theta=theta0)
    zero_y = YVec(dyn=jnp.zeros((N, n)),
                  nc=jnp.zeros((N, dims.max_node_c_dim)),
                  ec=jnp.zeros((E, dims.max_edge_c_dim)))
    x0 = jnp.asarray(x0)
    (xf, _, _, _), (xs, us, iters, statuses, errs) = lax.scan(
        step, (x0, zero_vars, zero_y, jnp.asarray(False)), None,
        length=n_steps)
    states = jnp.concatenate([x0[None], xs], axis=0)
    return MPCTrace(states=states, controls=us, iterations=iters,
                    statuses=statuses, kkt_errors=errs)


def run_mpc_timed(spec: ModelSpec, dims: Dimensions, topology: Topology,
                  x0, max_steps: int, time_budget_s: float,
                  settings: Optional[Settings] = None,
                  lower=None, upper=None,
                  plant: Optional[Callable] = None,
                  warm_start: bool = True,
                  reset_on_failure: bool = True,
                  kkt_reset_threshold: float = 1e2) -> MPCTrace:
    """Wall-clock-budgeted MPC loop: the dispatch-level equivalent of the
    reference's user-supplied `timeout_callback`
    (reference: sip_optimal_control/types.hpp:139-140, threaded through at
    sip_optimal_control.cpp:196).  Inside a jitted solve there is no host
    clock, so the budget is enforced at the dispatch boundary instead: each
    MPC step is its own device dispatch, and the loop stops issuing new
    steps once `time_budget_s` has elapsed (never mid-solve — the iterate
    is never abandoned in an inconsistent state).  Returns the completed
    prefix, so `len(trace.controls) <= max_steps`."""
    settings = settings or Settings()
    theta0 = jnp.zeros((dims.theta_dim,))
    if plant is None:
        def plant(x, u):
            return spec.dynamics(x, u, theta0, 0)

    @jax.jit
    def step(x, warm_vars, warm_y, have_warm):
        problem = build_problem(spec, dims, topology, initial_state=x,
                                lower=lower, upper=upper)
        if warm_start:
            init_vars = jax.tree.map(
                lambda w, d: jnp.where(have_warm, w, d), warm_vars,
                problem.default_init)
            result = solve(problem, settings, init_vars=init_vars,
                           init_y=warm_y)
        else:
            result = solve(problem, settings)
        u0 = result.vars.u[0]
        if reset_on_failure:
            usable = (((result.status == 0)
                       | ((result.status == 1)
                          & (result.kkt_error < kkt_reset_threshold)))
                      & jnp.isfinite(result.kkt_error)
                      & jnp.all(jnp.isfinite(result.vars.x))
                      & jnp.all(jnp.isfinite(result.vars.u)))
            u0 = jnp.where(usable, u0, jnp.zeros_like(u0))
        else:
            usable = jnp.asarray(True)
        x_next = plant(x, u0)
        next_vars, next_y = _shift_warm_start(result.vars, result.y, topology)
        next_y = jax.tree.map(
            lambda a: jnp.where(usable, a, jnp.zeros_like(a)), next_y)
        return (x_next, next_vars, next_y, usable, u0,
                result.iterations, result.status, result.kkt_error)

    n = dims.max_state_dim
    m = dims.max_control_dim
    N, E = dims.num_nodes, dims.num_edges
    warm_vars = Primal(x=jnp.zeros((N, n)), u=jnp.zeros((E, m)),
                       theta=theta0)
    warm_y = YVec(dyn=jnp.zeros((N, n)),
                  nc=jnp.zeros((N, dims.max_node_c_dim)),
                  ec=jnp.zeros((E, dims.max_edge_c_dim)))
    x = jnp.asarray(x0)
    have_warm = jnp.asarray(False)

    deadline = time.monotonic() + time_budget_s
    xs, us, iters, statuses, errs = [x], [], [], [], []
    for _ in range(max_steps):
        if time.monotonic() >= deadline:
            break
        out = jax.block_until_ready(step(x, warm_vars, warm_y, have_warm))
        x, warm_vars, warm_y, have_warm = out[:4]
        xs.append(x)
        us.append(out[4])
        iters.append(out[5])
        statuses.append(out[6])
        errs.append(out[7])
    if not us:  # budget elapsed before the first step
        return MPCTrace(states=jnp.stack(xs),
                        controls=jnp.zeros((0, m)),
                        iterations=jnp.zeros((0,), jnp.int32),
                        statuses=jnp.zeros((0,), jnp.int32),
                        kkt_errors=jnp.zeros((0,)))
    return MPCTrace(states=jnp.stack(xs), controls=jnp.stack(us),
                    iterations=jnp.stack(iters),
                    statuses=jnp.stack(statuses),
                    kkt_errors=jnp.stack(errs))
