"""Reference learner: sharded policy-gradient training step.

The learner boundary the north star requires (SURVEY.md §2.5 "Learner
gather", §2.6): rollouts stay sharded over the 1-D env mesh; the policy-
gradient loss reduces over the sharded batch, so under jit XLA inserts the
cross-device collectives (mean/psum) automatically — they ride ICI within a
slice, DCN across slices.  Multi-host: `jax.distributed.initialize()` then
this exact code (SPMD).

The parallelism inventory for this workload, stated explicitly
(SURVEY.md §2.5): DP = env-axis sharding (this module); TP/PP/SP/EP are
n/a — there is no large model to shard (the policy net is KBs); the physics
state is embarrassingly parallel over envs.  Scaling is therefore pure DP
with near-linear expected efficiency, which is what the benchmarks measure.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from dartenv_tpu.parallel.sharding import (
    env_mesh, make_sharded_rollout, replicate_model, shard_env_batch,
)
from dartenv_tpu.parallel.vec_env import VecEnv


# ---------------------------------------------------------------------------
# tiny pure-jnp gaussian MLP policy
# ---------------------------------------------------------------------------

def init_policy(key, obs_size: int, act_size: int, hidden: int = 64,
                dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    s = lambda k, a, b: jax.random.normal(k, (a, b), dtype) / jnp.sqrt(a)
    return {
        "w1": s(k1, obs_size, hidden),
        "b1": jnp.zeros((hidden,), dtype),
        "w2": s(k2, hidden, hidden),
        "b2": jnp.zeros((hidden,), dtype),
        "w3": s(k3, hidden, act_size) * 0.01,
        "b3": jnp.zeros((act_size,), dtype),
        "log_std": jnp.zeros((act_size,), dtype),
    }


def policy_mean(params, obs):
    h = jnp.tanh(obs @ params["w1"] + params["b1"])
    h = jnp.tanh(h @ params["w2"] + params["b2"])
    return jnp.tanh(h @ params["w3"] + params["b3"])


def policy_sample(params, obs, key):
    mu = policy_mean(params, obs)
    std = jnp.exp(params["log_std"])
    return mu + std * jax.random.normal(key, mu.shape, mu.dtype)


def policy_logp(params, obs, act):
    mu = policy_mean(params, obs)
    log_std = params["log_std"]
    z = (act - mu) * jnp.exp(-log_std)
    return jnp.sum(-0.5 * z * z - log_std, axis=-1)


# ---------------------------------------------------------------------------
# training step
# ---------------------------------------------------------------------------

def discounted_returns(rewards, dones, gamma: float):
    """(T, B) rewards/dones -> (T, B) reward-to-go, episode-aware."""

    def body(carry, x):
        r, d = x
        ret = r + gamma * carry * (1.0 - d.astype(r.dtype))
        return ret, ret

    _, rets = jax.lax.scan(
        body, jnp.zeros_like(rewards[0]), (rewards, dones), reverse=True
    )
    return rets


def make_train_step(task, num_envs: int, horizon: int, mesh=None,
                    max_episode_steps: int = 1000, lr: float = 3e-4,
                    gamma: float = 0.99):
    """Returns (init_fn(key) -> (params, state), train_step(params, state,
    key) -> (params, state, stats)) — one REINFORCE-style update over a
    sharded on-device rollout.  Used by the multi-chip dry-run and the
    example trainer."""
    mesh = mesh or env_mesh()
    vec = VecEnv(task, num_envs, max_episode_steps=max_episode_steps)
    rollout = make_sharded_rollout(
        vec, policy_sample, horizon, mesh, collect=True
    )

    def init_fn(key):
        kp, ks = jax.random.split(key)
        params = init_policy(
            kp, task.obs_size, task.action_size,
            dtype=task.model.q_init.dtype,
        )
        params = replicate_model(params, mesh)
        state, _obs = vec.reset(ks)
        state = shard_env_batch(state, mesh)
        return params, state

    def train_step(params, state, key):
        state, stats, (obs, act, rew, done) = rollout(params, state, key)
        rets = discounted_returns(rew, done, gamma)
        adv = rets - jnp.mean(rets)

        def loss_fn(p):
            logp = policy_logp(p, obs, act)
            return -jnp.mean(logp * jax.lax.stop_gradient(adv))

        grads = jax.grad(loss_fn)(params)
        params = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, params, grads
        )
        return params, state, stats

    return init_fn, train_step
