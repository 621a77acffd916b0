"""Planar quadrotor tracking model (BASELINE config 4: receding-horizon MPC
with warm starting).

State [x, z, phi, vx, vz, phidot]; controls are the two rotor thrusts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..model import ModelSpec, box_bounds
from ..types import Dimensions, Topology


def planar_quadrotor(horizon: int = 20, dt: float = 0.05, mass: float = 0.5,
                     inertia: float = 0.01, arm: float = 0.17,
                     gravity: float = 9.81, thrust_max: float = 5.0,
                     q_pos: float = 4.0, q_att: float = 1.0,
                     q_vel: float = 0.2, r_thrust: float = 0.05,
                     qf: float = 10.0, target=None):
    """Returns (spec, dims, topology, lower, upper, hover_state).

    `target` is the tracked setpoint [x*, z*] (default origin hover)."""
    target = jnp.zeros(2) if target is None else jnp.asarray(target)
    hover = 0.5 * mass * gravity

    def dynamics(s, u, th, i):
        x, z, phi, vx, vz, phidot = (s[0], s[1], s[2], s[3], s[4], s[5])
        u1, u2 = u[0] + hover, u[1] + hover   # controls are delta from hover
        thrust = u1 + u2
        acc_x = -thrust * jnp.sin(phi) / mass
        acc_z = thrust * jnp.cos(phi) / mass - gravity
        acc_phi = arm * (u1 - u2) / inertia
        ds = jnp.stack([vx, vz, phidot, acc_x, acc_z, acc_phi])
        return s + dt * ds

    w = jnp.asarray([q_pos, q_pos, q_att, q_vel, q_vel, q_vel])

    def node_cost(s, th, i):
        err = s - jnp.concatenate([target, jnp.zeros(4)])
        scale = jnp.where(i == horizon, qf, 1.0)
        return 0.5 * scale * jnp.sum(w * err ** 2)

    def edge_cost(s, u, th, i):
        return 0.5 * r_thrust * jnp.sum(u ** 2)

    spec = ModelSpec(dynamics=dynamics, node_cost=node_cost,
                     edge_cost=edge_cost)
    dims = Dimensions.uniform(num_edges=horizon, state_dim=6, control_dim=2)
    lower, upper = box_bounds(dims, u_lower=-hover,
                              u_upper=thrust_max - hover)
    hover_state = jnp.zeros(6)
    return spec, dims, Topology.chain(horizon), lower, upper, hover_state
