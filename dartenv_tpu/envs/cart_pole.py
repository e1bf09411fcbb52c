"""DartCartPole: continuous-torque cartpole.

Reference: `gym/envs/dart/cart_pole.py:~1-80` † (SURVEY.md §2.2):
1-dim action, control_bounds +-1, force scale x100 ‡, frame_skip 2 ‡,
obs = [q, dq] (4,), reward 1.0/step, done when |theta|>0.2 or |x|>2.4 or
non-finite ‡, reset perturb uniform +-0.01 ‡.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dartenv_tpu.envs.base import DartEnv, Task, with_solver
from dartenv_tpu.model.skel_parser import asset_path, parse_skel
from dartenv_tpu.utils.ezpickle import EzPickle


class CartPoleTask(Task):
    name = "DartCartPole"
    frame_skip = 2
    obs_size = 4
    control_bounds = np.array([[1.0], [-1.0]])
    action_scale = 100.0
    reset_noise = 0.01

    def action_to_tau(self, a, aux):
        tau = jnp.zeros(self.model.n, dtype=a.dtype)
        return tau.at[0].set(a[0] * self.action_scale)

    def obs(self, sim, aux):
        return jnp.concatenate([sim.q, sim.dq])

    def reward(self, sim_prev, sim, a, contacts, aux):
        return jnp.asarray(1.0, dtype=sim.q.dtype)

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        finite = jnp.all(jnp.isfinite(s))
        return ~(
            finite
            & (jnp.abs(sim.q[1]) <= 0.2)
            & (jnp.abs(sim.q[0]) <= 2.4)
        )


def make_cartpole_task(dtype=jnp.float32, lcp_solver=None,
                       **solver_kw) -> CartPoleTask:
    world = parse_skel(asset_path("cartpole.skel"), dtype=dtype)
    return CartPoleTask(with_solver(world.robot, lcp_solver, **solver_kw))


class DartCartPoleEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_cartpole_task())


class CartPoleSwingUpTask(CartPoleTask):
    """Swing-up variant (`cart_pole_swingup.py` †): pole starts hanging
    down, cos-based reward ‡ (reconstruction — exact constants unverified)."""

    name = "DartCartPoleSwingUp"
    action_scale = 40.0

    def reset_sim(self, key):
        sim = super().reset_sim(key)
        return type(sim)(
            q=sim.q.at[1].add(jnp.pi), dq=sim.dq, time=sim.time,
            lam=sim.lam,
        )

    def np_reset_sim(self, np_random):
        q, dq = super().np_reset_sim(np_random)
        q[1] += np.pi
        return q, dq

    def reward(self, sim_prev, sim, a, contacts, aux):
        return jnp.cos(sim.q[1]) - 1e-3 * jnp.sum(a * a)

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        finite = jnp.all(jnp.isfinite(s))
        return ~(finite & (jnp.abs(sim.q[0]) <= 2.4))


def make_cartpole_swingup_task(dtype=jnp.float32, lcp_solver=None,
                               **solver_kw) -> CartPoleSwingUpTask:
    world = parse_skel(asset_path("cartpole.skel"), dtype=dtype)
    return CartPoleSwingUpTask(
        with_solver(world.robot, lcp_solver, **solver_kw))


class DartCartPoleSwingUpEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_cartpole_swingup_task())
