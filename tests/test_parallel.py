"""Batched/sharded env tests on the virtual 8-device CPU mesh
(SURVEY.md §4 rebuild strategy (4): multi-device tests the reference
never had)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.envs.cart_pole import make_cartpole_task
from dartenv_tpu.envs.base import make_env_step, make_env_reset
from dartenv_tpu.parallel.vec_env import VecEnv
from dartenv_tpu.parallel.rollout import EpisodeStats, make_rollout
from dartenv_tpu.parallel.sharding import (
    env_mesh, make_sharded_rollout, shard_env_batch, sharded_reset,
)


@pytest.fixture(scope="module")
def task():
    return make_cartpole_task(dtype=jnp.float64)


def zero_policy(params, obs, key):
    del params, key
    return jnp.zeros(obs.shape[:-1] + (1,), dtype=obs.dtype)


class TestVecEnv:
    def test_shapes(self, task):
        env = VecEnv(task, num_envs=16)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (16, 4)
        actions = jnp.zeros((16, 1))
        state, obs, rew, done, info = env.step(state, actions)
        assert obs.shape == (16, 4)
        assert rew.shape == (16,)
        assert done.shape == (16,)
        assert state.sim.q.shape == (16, 2)

    def test_batched_matches_single(self, task):
        """vmap path must agree with single-env step bit-for-bit."""
        env = VecEnv(task, num_envs=4, auto_reset=False)
        state, obs = env.reset(jax.random.PRNGKey(1))
        actions = jnp.asarray([[0.3], [-0.5], [1.0], [0.0]],
                              dtype=jnp.float64)
        new_state, obs_b, rew_b, done_b, _ = env.step(state, actions)
        step1 = make_env_step(task)
        for i in range(4):
            s_i = jax.tree_util.tree_map(lambda x: x[i], state)
            s2, o, r, d, _ = step1(s_i, actions[i])
            np.testing.assert_array_equal(np.asarray(o),
                                          np.asarray(obs_b[i]))
            np.testing.assert_array_equal(np.asarray(s2.sim.q),
                                          np.asarray(new_state.sim.q[i]))

    def test_auto_reset(self, task):
        env = VecEnv(task, num_envs=8, max_episode_steps=5)
        state, obs = env.reset(jax.random.PRNGKey(2))
        for i in range(5):
            state, obs, rew, done, info = env.step(
                state, jnp.zeros((8, 1), dtype=jnp.float64)
            )
        # TimeLimit fired for all envs on step 5; counters must be reset
        assert bool(jnp.all(done))
        assert bool(jnp.all(state.steps == 0))
        # fresh episodes step normally afterwards
        state, obs, rew, done, info = env.step(
            state, jnp.zeros((8, 1), dtype=jnp.float64)
        )
        assert bool(jnp.all(state.steps == 1))
        assert not bool(jnp.any(done))

    def test_auto_reset_diversifies_keys(self, task):
        """Resets must not produce identical states across envs/episodes."""
        env = VecEnv(task, num_envs=4, max_episode_steps=3)
        state, _ = env.reset(jax.random.PRNGKey(3))
        for _ in range(3):
            state, obs, _, done, _ = env.step(
                state, jnp.zeros((4, 1), dtype=jnp.float64)
            )
        assert bool(jnp.all(done))
        q = np.asarray(state.sim.q)
        # all 4 fresh episodes distinct
        assert len({tuple(np.round(row, 12)) for row in q}) == 4


class TestRollout:
    def test_stats_accumulate(self, task):
        env = VecEnv(task, num_envs=8, max_episode_steps=10)
        rollout = jax.jit(make_rollout(env, zero_policy, horizon=25))
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, stats = rollout(None, state, jax.random.PRNGKey(1))
        # 25 steps with 10-step cap: exactly 2 completed episodes per env
        assert float(stats.episodes) == 16.0
        assert float(stats.mean_length()) == 10.0
        # cartpole reward = 1/step while alive
        assert abs(float(stats.mean_return()) - 10.0) < 1e-9

    def test_collect_shapes(self, task):
        env = VecEnv(task, num_envs=4, max_episode_steps=50)
        rollout = jax.jit(make_rollout(env, zero_policy, horizon=7,
                                       collect=True))
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, stats, (obs, act, rew, done) = rollout(
            None, state, jax.random.PRNGKey(1)
        )
        assert obs.shape == (7, 4, 4)
        assert act.shape == (7, 4, 1)
        assert rew.shape == (7, 4)
        assert done.shape == (7, 4)


class TestSharded:
    def test_eight_device_mesh(self, task):
        assert jax.device_count() >= 8, "conftest must force 8 cpu devices"
        mesh = env_mesh(jax.devices()[:8])
        env = VecEnv(task, num_envs=32, max_episode_steps=10)
        rollout = make_sharded_rollout(env, zero_policy, horizon=12, mesh=mesh)
        state, obs = sharded_reset(env, mesh, jax.random.PRNGKey(0))
        state, stats = jax.jit(rollout)(None, state, jax.random.PRNGKey(1))
        # every env finished exactly one episode in 12 steps (cap 10)
        assert float(stats.episodes) == 32.0
        assert float(stats.mean_length()) == 10.0
        # state stays sharded over the mesh
        shard_devs = {d for d in state.sim.q.devices()}
        assert len(shard_devs) == 8

    def test_sharded_matches_unsharded(self, task):
        mesh = env_mesh(jax.devices()[:8])
        env = VecEnv(task, num_envs=16, max_episode_steps=20)
        state, _ = env.reset(jax.random.PRNGKey(5))
        r_plain = jax.jit(make_rollout(env, zero_policy, horizon=6))
        _, stats_plain = r_plain(None, state, jax.random.PRNGKey(7))

        r_shard = jax.jit(make_sharded_rollout(env, zero_policy, horizon=6,
                                               mesh=mesh))
        state_s = shard_env_batch(state, mesh)
        # NOTE: per-device rollout keys differ from the unsharded path, but
        # a zero policy makes trajectories key-independent
        _, stats_shard = r_shard(None, state_s, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(stats_plain.returns_sum),
                                   float(stats_shard.returns_sum),
                                   rtol=1e-12)
        np.testing.assert_allclose(float(stats_plain.episodes),
                                   float(stats_shard.episodes))
