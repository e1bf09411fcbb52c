"""DartDog: quadruped (free-root torso + 4x three-dof legs).

Reference: `gym/envs/dart/dog.py` † (SURVEY.md §2.2 "Other envs").
12 actuated dofs (tau[6:] = a*60 ‡, free root passive), frame_skip 4 ‡;
reward = dx/dt + 1.0 alive - 1e-3*||a||^2 ‡; done unless the torso stays
within height bounds and upright ‡.  Constants marked ‡ pending reference
availability.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dartenv_tpu.dynamics.algorithms import fk_positions
from dartenv_tpu.envs.base import DartEnv, Task, with_solver
from dartenv_tpu.model.skel_parser import asset_path, parse_skel
from dartenv_tpu.utils.ezpickle import EzPickle


class DogTask(Task):
    name = "DartDog"
    frame_skip = 4
    obs_size = 35
    control_bounds = np.array([[1.0] * 12, [-1.0] * 12])
    action_scale = 60.0
    reset_noise = 0.005
    torso_body = 0
    forward_dof = 3   # free-root q = [so3(3), xyz(3)]: x translation

    def action_to_tau(self, a, aux):
        tau = jnp.zeros(self.model.n, dtype=a.dtype)
        return tau.at[6:].set(a * self.action_scale)

    def obs(self, sim, aux):
        q = jnp.concatenate([sim.q[:3], sim.q[4:]])
        return jnp.concatenate([q, jnp.clip(sim.dq, -10.0, 10.0)])

    def _torso_pose(self, sim):
        R_w, p_w = fk_positions(self.model, sim.q)
        b = self.torso_body
        return R_w[b], p_w[b] + R_w[b] @ self.model.com[b]

    def reward(self, sim_prev, sim, a, contacts, aux):
        d = self.forward_dof
        vel = (sim.q[d] - sim_prev.q[d]) / self.dt
        return vel + 1.0 - 1e-3 * jnp.sum(a * a)

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        R, p = self._torso_pose(sim)
        upright = R[1, 1]
        ok = (
            jnp.all(jnp.isfinite(s))
            & jnp.all(jnp.abs(s[6:]) < 100.0)
            & (p[1] > 0.25) & (p[1] < 1.0)
            & (upright > 0.5)
        )
        return ~ok


def make_dog_task(dtype=jnp.float32, lcp_solver=None,
                  **solver_kw) -> DogTask:
    world = parse_skel(asset_path("dog.skel"), dtype=dtype)
    # LCP active-set cap (see SolverConfig.contact_cap): at most
    # 8 simultaneously active contact slots for this morphology
    # r4 escalation budget: 32 damped + 2 refine pivots.  Counter-
    # intuitively BETTER than the legacy 32+10: the long undamped
    # refinement re-oscillates the quadruped's 4-foot friction fixed
    # point, while 2 refine pivots + polish land max 9.9e-6 (vs 1.55e-3)
    # — dog now meets the PLANAR residual envelope (docs/SOLVERS.md)
    kw = dict(contact_cap=8, pgs_iters=20, escalate_frac=1.0 / 32,
              escalate_tol=1e-5, escalate_iters=32, escalate_refine=2)
    kw.update(solver_kw)           # caller overrides beat the task defaults
    return DogTask(with_solver(world.robot, lcp_solver, **kw))


class DartDogEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_dog_task())
