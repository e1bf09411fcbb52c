"""On-device rollouts: `lax.scan` over env steps, fully inside one XLA
program (SURVEY.md §5.7: episode horizon is the scan axis; O(1) memory for
stepping, O(T) only when recording trajectories).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from dartenv_tpu.parallel.vec_env import VecEnv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EpisodeStats:
    """On-device episode statistics (the Monitor/StatsRecorder analogue for
    the batched path — SURVEY.md §5.5)."""

    returns_sum: Any      # sum of completed-episode returns
    lengths_sum: Any      # sum of completed-episode lengths
    episodes: Any         # number of completed episodes
    running_return: Any   # (B,) current-episode return accumulator
    running_length: Any   # (B,)

    @staticmethod
    def init(num_envs: int, dtype=jnp.float32):
        z = jnp.zeros((), dtype=dtype)
        return EpisodeStats(
            returns_sum=z, lengths_sum=z, episodes=z,
            running_return=jnp.zeros(num_envs, dtype=dtype),
            running_length=jnp.zeros(num_envs, dtype=dtype),
        )

    def update(self, reward, done):
        d = done.astype(reward.dtype)
        rr = self.running_return + reward
        rl = self.running_length + 1.0
        return EpisodeStats(
            returns_sum=self.returns_sum + jnp.sum(rr * d),
            lengths_sum=self.lengths_sum + jnp.sum(rl * d),
            episodes=self.episodes + jnp.sum(d),
            running_return=rr * (1.0 - d),
            running_length=rl * (1.0 - d),
        )

    def mean_return(self):
        return self.returns_sum / jnp.maximum(self.episodes, 1.0)

    def mean_length(self):
        return self.lengths_sum / jnp.maximum(self.episodes, 1.0)


def make_rollout(vec_env: VecEnv,
                 policy_fn: Callable,
                 horizon: int,
                 collect: bool = False):
    """Build rollout(params, state, key) -> (state, stats[, traj]).

    policy_fn(params, obs, key) -> actions, pure.  With collect=True the
    per-step (obs, action, reward, done) stack is also returned (O(T)
    memory, for learners); otherwise only running stats (O(1)).
    """

    def rollout(params, state, key):
        stats0 = EpisodeStats.init(
            vec_env.num_envs, dtype=vec_env.task.model.q_init.dtype
        )
        obs0 = jax.vmap(lambda s: vec_env.task.obs(s.sim, s.aux))(state)

        def step_fn(carry, _):
            state, obs, stats, key = carry
            key, k_act = jax.random.split(key)
            actions = policy_fn(params, obs, k_act)
            state, next_obs, reward, done, info = vec_env.step(
                state, actions
            )
            stats = stats.update(reward, done)
            out = (
                (obs, actions, reward, done) if collect else None
            )
            return (state, next_obs, stats, key), out

        (state, obs, stats, _), traj = jax.lax.scan(
            step_fn, (state, obs0, stats0, key), None, length=horizon
        )
        if collect:
            return state, stats, traj
        return state, stats

    return rollout
