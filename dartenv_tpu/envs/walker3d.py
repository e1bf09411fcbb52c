"""DartWalker3d: 3D biped walker (free-root pelvis + 2x six-dof legs).

Reference: `gym/envs/dart/walker3d.py` † (SURVEY.md §2.2 "Other envs").
12 actuated dofs (tau[6:] = a*100 ‡, free root passive), frame_skip 4 ‡;
obs = [root orientation, root height/z, joint q, clip(dq, +-10)] (x dropped);
reward = dx/dt + 1.0 alive - 1e-3*||a||^2 ‡; done unless the pelvis stays
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


class Walker3dTask(Task):
    name = "DartWalker3d"
    frame_skip = 4
    obs_size = 35
    control_bounds = np.array([[1.0] * 12, [-1.0] * 12])
    action_scale = 100.0
    reset_noise = 0.005
    pelvis_body = 0
    forward_dof = 3   # free-root q = [so3(3), xyz(3)]: x translation

    def action_to_tau(self, a, aux):
        tau = jnp.zeros(self.model.n, dtype=a.dtype)
        return tau.at[6:].set(a * self.action_scale)

    def obs(self, sim, aux):
        # drop the root world-x (forward position is not observable ‡)
        q = jnp.concatenate([sim.q[:3], sim.q[4:]])
        return jnp.concatenate([q, jnp.clip(sim.dq, -10.0, 10.0)])

    def _pelvis_pose(self, sim):
        R_w, p_w = fk_positions(self.model, sim.q)
        b = self.pelvis_body
        return R_w[b], p_w[b] + R_w[b] @ self.model.com[b]

    def reward(self, sim_prev, sim, a, contacts, aux):
        d = self.forward_dof
        vel = (sim.q[d] - sim_prev.q[d]) / self.dt
        return vel + 1.0 - 1e-3 * jnp.sum(a * a)

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        R, p = self._pelvis_pose(sim)
        upright = R[1, 1]   # world-y component of the pelvis y axis
        ok = (
            jnp.all(jnp.isfinite(s))
            & jnp.all(jnp.abs(s[6:]) < 100.0)
            & (p[1] > 0.8) & (p[1] < 2.0)
            & (upright > 0.5)
        )
        return ~ok


def make_walker3d_task(dtype=jnp.float32, lcp_solver=None,
                       **solver_kw) -> Walker3dTask:
    world = parse_skel(asset_path("walker3d.skel"), dtype=dtype)
    # LCP active-set cap (see SolverConfig.contact_cap): at most
    # 8 simultaneously active contact slots for this morphology
    # r4 escalation budget: 8+2 pivots — study max 2.3e-3 vs 1.9e-3 at
    # the legacy 20+6 (both golden-adjudicated degenerate; bound 5e-3),
    # at ~40% of the BPP serial chain (docs/SOLVERS.md)
    kw = dict(contact_cap=8, pgs_iters=20, escalate_frac=1.0 / 32,
              escalate_tol=1e-5, escalate_iters=8, escalate_refine=2)
    kw.update(solver_kw)           # caller overrides beat the task defaults
    return Walker3dTask(with_solver(world.robot, lcp_solver, **kw))


class DartWalker3dEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_walker3d_task())
