"""DartReacher2d: planar 2-link arm reaching a target in the x-y plane.

Reference: `gym/envs/dart/reacher2d.py` † (SURVEY.md §2.2 "Other envs") —
same pattern as the 3D reacher: fully actuated, torque scale ~10 ‡,
frame_skip 4 ‡, obs = [cos q, sin q, target xy, dq, fingertip - target xy],
reward = -||vec|| - 0.1*||a||^2 ‡, target resampled in a reachable annulus
on reset ‡; episodes end only via TimeLimit.  Constants marked ‡ pending
reference availability (SURVEY.md provenance warning).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dartenv_tpu.dynamics.algorithms import body_point_world
from dartenv_tpu.envs.base import DartEnv, Task, with_solver
from dartenv_tpu.model.skel_parser import asset_path, parse_skel
from dartenv_tpu.utils.ezpickle import EzPickle

_FINGERTIP_OFFSET = (0.2, 0.0, 0.0)  # in link2 body frame
_TARGET_R_MIN = 0.25
_TARGET_R_MAX = 0.75


class Reacher2dTask(Task):
    name = "DartReacher2d"
    frame_skip = 4
    obs_size = 10
    control_bounds = np.array([[1.0] * 2, [-1.0] * 2])
    action_scale = 10.0
    reset_noise = 0.01

    def fingertip(self, q):
        return body_point_world(self.model, q, 1, _FINGERTIP_OFFSET)[:2]

    def action_to_tau(self, a, aux):
        return a * self.action_scale

    def aux_init(self):
        return {"target": jnp.zeros(2, dtype=self.model.q_init.dtype)}

    def aux_reset(self, key, aux):
        k1, k2 = jax.random.split(key)
        dtype = self.model.q_init.dtype
        angle = jax.random.uniform(k1, (), dtype=dtype,
                                   minval=-np.pi, maxval=np.pi)
        r = jax.random.uniform(k2, (), dtype=dtype,
                               minval=_TARGET_R_MIN, maxval=_TARGET_R_MAX)
        return {"target": r * jnp.stack([jnp.cos(angle), jnp.sin(angle)])}

    def np_reset_aux(self, np_random, aux):
        # reference reset_model rejection loop order †
        while True:
            t = np_random.uniform(low=-_TARGET_R_MAX, high=_TARGET_R_MAX,
                                  size=2)
            r = np.linalg.norm(t)
            if _TARGET_R_MIN <= r <= _TARGET_R_MAX:
                break
        return {"target": jnp.asarray(t, dtype=self.model.q_init.dtype)}

    def obs(self, sim, aux):
        target = aux["target"]
        vec = self.fingertip(sim.q) - target
        return jnp.concatenate([
            jnp.cos(sim.q), jnp.sin(sim.q), target, sim.dq, vec
        ])

    def reward(self, sim_prev, sim, a, contacts, aux):
        vec = self.fingertip(sim.q) - aux["target"]
        return -jnp.linalg.norm(vec) - 0.1 * jnp.sum(a * a)

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        return ~jnp.all(jnp.isfinite(s))


def make_reacher2d_task(dtype=jnp.float32, lcp_solver=None,
                        **solver_kw) -> Reacher2dTask:
    world = parse_skel(asset_path("reacher2d.skel"), dtype=dtype)
    return Reacher2dTask(with_solver(world.robot, lcp_solver, pgs_iters=10,
                                     **solver_kw))


class DartReacher2dEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_reacher2d_task())
