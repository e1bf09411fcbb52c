"""DartDoubleInvertedPendulum: cart with a two-link pole.

Reference: the `double_pendulum` env listed among the dart envs
(`gym/envs/dart/` †, SURVEY.md §2.2 "Other envs", ‡ — reconstruction in
the mujoco InvertedDoublePendulum style until the reference is mountable):
1-dim action scaled x40, frame_skip 2; obs (8,) =
[x, sin th1, sin th2, cos th1, cos th2, dq]; reward = 10 alive bonus
- tip-distance penalty - velocity penalty; done when the tip drops below
half its upright height or state goes non-finite.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dartenv_tpu.dynamics.algorithms import body_point_world
from dartenv_tpu.envs.base import DartEnv, Task, with_solver
from dartenv_tpu.model.skel_parser import asset_path, parse_skel
from dartenv_tpu.utils.ezpickle import EzPickle

# pole half-length: tip is this far above pole2's origin (see asset)
_TIP_OFFSET = (0.0, 0.3, 0.0)
_UPRIGHT_TIP_Y = 1.2  # world tip height with both links upright (see asset)


class DoubleInvertedPendulumTask(Task):
    name = "DartDoubleInvertedPendulum"
    frame_skip = 2
    obs_size = 8
    control_bounds = np.array([[1.0], [-1.0]])
    action_scale = 40.0
    reset_noise = 0.01

    def action_to_tau(self, a, aux):
        tau = jnp.zeros(self.model.n, dtype=a.dtype)
        return tau.at[0].set(a[0] * self.action_scale)

    def _tip(self, sim):
        return body_point_world(
            self.model, sim.q, self.model.nb - 1,
            jnp.asarray(_TIP_OFFSET, dtype=sim.q.dtype),
        )

    def obs(self, sim, aux):
        q, dq = sim.q, sim.dq
        return jnp.concatenate([
            q[:1], jnp.sin(q[1:]), jnp.cos(q[1:]), dq,
        ])

    def reward(self, sim_prev, sim, a, contacts, aux):
        tip = self._tip(sim)
        dist2 = tip[0] ** 2 + (tip[1] - _UPRIGHT_TIP_Y) ** 2
        v1, v2 = sim.dq[1], sim.dq[2]
        return (
            jnp.asarray(10.0, dtype=sim.q.dtype)
            - 0.01 * dist2
            - 1e-3 * v1 * v1
            - 5e-3 * v2 * v2
        )

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        finite = jnp.all(jnp.isfinite(s))
        tip_y = self._tip(sim)[1]
        return ~(finite & (tip_y > 0.5 * _UPRIGHT_TIP_Y))


def make_double_pendulum_task(dtype=jnp.float32, lcp_solver=None,
                              **solver_kw) -> DoubleInvertedPendulumTask:
    world = parse_skel(asset_path("doublependulum.skel"), dtype=dtype)
    return DoubleInvertedPendulumTask(with_solver(world.robot, lcp_solver, **solver_kw))


class DartDoubleInvertedPendulumEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_double_pendulum_task())
