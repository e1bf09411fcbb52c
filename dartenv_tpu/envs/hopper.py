"""DartHopper: planar one-leg hopper with ground contact.

Reference: `gym/envs/dart/hopper.py:~1-110` † (SURVEY.md §2.2):
3 actuated dofs (tau[3:] = a*200 ‡, root passive), frame_skip 4, sim dt
0.002 ‡; obs (11,) = [q[1:], clip(dq, +-10)] ‡;
reward = dx/dt + 1.0 alive - 1e-3*||a||^2 - 0.5*joint_limit_penalty
(penalty 1.5 per side when the knee dof is within 0.05 of a limit ‡);
done unless all finite, |s[2:]|<100, height>0.7, |pitch|<0.2 ‡;
reset perturb uniform +-0.005 on q, dq ‡.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dartenv_tpu.dynamics.algorithms import fk_positions
from dartenv_tpu.envs.base import DartEnv, Task, with_solver
from dartenv_tpu.model.skel_parser import asset_path, parse_skel
from dartenv_tpu.utils.ezpickle import EzPickle


class HopperTask(Task):
    name = "DartHopper"
    frame_skip = 4
    obs_size = 11
    control_bounds = np.array([[1.0] * 3, [-1.0] * 3])
    action_scale = 200.0
    reset_noise = 0.005
    torso_body = 0
    knee_dof = -2  # second-to-last dof ‡

    def action_to_tau(self, a, aux):
        tau = jnp.zeros(self.model.n, dtype=a.dtype)
        return tau.at[3:].set(a * self.action_scale)

    def obs(self, sim, aux):
        return jnp.concatenate([
            sim.q[1:], jnp.clip(sim.dq, -10.0, 10.0)
        ])

    def height_pitch(self, sim):
        R_w, p_w = fk_positions(self.model, sim.q)
        com_t = p_w[self.torso_body] + R_w[self.torso_body] @ \
            self.model.com[self.torso_body]
        return com_t[1], sim.q[2]

    def reward(self, sim_prev, sim, a, contacts, aux):
        dtype = sim.q.dtype
        posbefore = sim_prev.q[0]
        posafter = sim.q[0]
        alive_bonus = jnp.asarray(1.0, dtype=dtype)
        r = (posafter - posbefore) / self.dt
        r = r + alive_bonus
        r = r - 1e-3 * jnp.sum(a * a)
        # joint-limit proximity penalty on the knee ‡
        d = self.knee_dof % self.model.n
        near_lo = (sim.q[d] - self.model.q_lower[d]) < 0.05
        near_hi = (self.model.q_upper[d] - sim.q[d]) < 0.05
        penalty = 1.5 * (near_lo.astype(dtype) + near_hi.astype(dtype))
        return r - 0.5 * penalty

    def done(self, sim, aux):
        s = jnp.concatenate([sim.q, sim.dq])
        height, pitch = self.height_pitch(sim)
        ok = (
            jnp.all(jnp.isfinite(s))
            & jnp.all(jnp.abs(s[2:]) < 100.0)
            & (height > 0.7)
            & (jnp.abs(pitch) < 0.2)
        )
        return ~ok


def make_hopper_task(dtype=jnp.float32, lcp_solver=None,
                     **solver_kw) -> HopperTask:
    world = parse_skel(asset_path("hopper_capsule.skel"), dtype=dtype)
    # LCP active-set cap (see SolverConfig.contact_cap): at most
    # 4 simultaneously active contact slots for this morphology
    # pgs_iters/escalate: warm-started PGS with exact-solver escalation of
    # the worst 1/32 of envs per substep (docs/SOLVERS.md residual study —
    # hopper's degenerate two-point landings are the motivating case)
    # escalation budget (r4): 4+2 pivots — study-identical envelope to
    # the legacy 8+6 on hopper (max 5.9e-6 both; docs/SOLVERS.md)
    kw = dict(contact_cap=4, pgs_iters=10, escalate_frac=1.0 / 32,
              escalate_tol=1e-5, escalate_iters=4, escalate_refine=2)
    kw.update(solver_kw)           # caller overrides beat the task defaults
    return HopperTask(with_solver(world.robot, lcp_solver, **kw))


class DartHopperEnv(DartEnv, EzPickle):
    def __init__(self):
        EzPickle.__init__(self)
        super().__init__(make_hopper_task())
