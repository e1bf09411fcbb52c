"""DartSnake7Link: planar 7-link snake slithering on the ground.

Reference: `gym/envs/dart/snake_7link.py` † (SURVEY.md §2.2 "Other envs").
Planar zx root (ground-plane translation + yaw, passive) + 6 actuated yaw
joints; reward = forward velocity + small alive bonus - energy penalty ‡;
done only on non-finite state (a snake cannot fall) ‡.  Constants marked ‡
pending reference availability.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dartenv_tpu.envs.base import DartEnv, Task, with_solver
from dartenv_tpu.model.skel_parser import asset_path, parse_skel
from dartenv_tpu.utils.ezpickle import EzPickle


class Snake7LinkTask(Task):
    name = "DartSnake7Link"
    frame_skip = 4
    obs_size = 16
    control_bounds = np.array([[1.0] * 6, [-1.0] * 6])
    action_scale = 10.0
    reset_noise = 0.005
    # planar zx root: q = [z, x, yaw] (skel_parser._PLANES["zx"]); forward
    # progress is the x translation, dof 1
    forward_dof = 1

    def action_to_tau(self, a, aux):
        tau = jnp.zeros(self.model.n, dtype=a.dtype)
        return tau.at[3:].set(a * self.action_scale)

    def obs(self, sim, aux):
        # drop the root translations (x, z); keep yaw + joint angles
        return jnp.concatenate([sim.q[2:], jnp.clip(sim.dq, -10.0, 10.0)])

    def reward(self, sim_prev, sim, a, contacts, aux):
        d = self.forward_dof
        vel = (sim.q[d] - sim_prev.q[d]) / self.dt
        return vel + 0.1 - 1e-3 * jnp.sum(a * a)

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        return ~(jnp.all(jnp.isfinite(s)) & jnp.all(jnp.abs(s[3:]) < 100.0))


def make_snake7link_task(dtype=jnp.float32, lcp_solver=None,
                         **solver_kw) -> Snake7LinkTask:
    world = parse_skel(asset_path("snake_7link.skel"), dtype=dtype)
    return Snake7LinkTask(with_solver(world.robot, lcp_solver, pgs_iters=10,
                                      **solver_kw))


class DartSnake7LinkEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_snake7link_task())
