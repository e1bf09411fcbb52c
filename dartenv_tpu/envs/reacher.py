"""DartReacher: 3D 5-dof arm reaching a target sphere.

Reference: `gym/envs/dart/reacher.py:~1-90` † (SURVEY.md §2.2):
fully-actuated, action scale ~10/joint ‡, frame_skip 4 ‡,
obs (21,) = [cos q, sin q, target xyz, dq, fingertip - target] ‡,
reward = -||vec|| - 0.1*||a||^2 ‡, target resampled uniformly in a
reachable ball on reset ‡, episodes end only via TimeLimit (mujoco-lineage
reacher semantics ‡).
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


class ReacherTask(Task):
    name = "DartReacher"
    frame_skip = 4
    obs_size = 21
    control_bounds = np.array([[1.0] * 5, [-1.0] * 5])
    action_scale = 10.0
    reset_noise = 0.01

    def fingertip(self, q):
        return body_point_world(self.model, q, 1, _FINGERTIP_OFFSET)

    def action_to_tau(self, a, aux):
        return a * self.action_scale  # fully actuated, n == action dim

    def aux_init(self):
        return {"target": jnp.zeros(3, dtype=self.model.q_init.dtype)}

    def aux_reset(self, key, aux):
        k1, k2 = jax.random.split(key)
        dtype = self.model.q_init.dtype
        direction = jax.random.normal(k1, (3,), dtype=dtype)
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction), 1e-9
        )
        r = jax.random.uniform(k2, (), dtype=dtype,
                               minval=_TARGET_R_MIN, maxval=_TARGET_R_MAX)
        return {"target": direction * r}

    def np_reset_aux(self, np_random, aux):
        # same call order as the reference's reset_model target loop †:
        # rejection-sample a point in the reachable shell
        while True:
            t = np_random.uniform(low=-_TARGET_R_MAX, high=_TARGET_R_MAX,
                                  size=3)
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
        reward_dist = -jnp.linalg.norm(vec)
        reward_ctrl = -0.1 * jnp.sum(a * a)
        return reward_dist + reward_ctrl

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        return ~jnp.all(jnp.isfinite(s))


def make_reacher_task(dtype=jnp.float32, lcp_solver=None,
                      **solver_kw) -> ReacherTask:
    world = parse_skel(asset_path("reacher.skel"), dtype=dtype)
    # LCP = 5 joint-limit rows, no friction coupling: PGS on the small
    # SPD operator converges in a few sweeps; 10 matches the 30-sweep
    # result to solver precision (tests/test_constraints limit tests)
    # and removes 2/3 of the solve's serial row updates
    return ReacherTask(with_solver(world.robot, lcp_solver, pgs_iters=10,
                                   **solver_kw))


class DartReacherEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_reacher_task())
