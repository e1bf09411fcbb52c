"""Checkpoint/resume tests (SURVEY.md §5.4: resumed rollouts must be
bit-identical, RNG keys included)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.envs.cart_pole import make_cartpole_task
from dartenv_tpu.parallel.vec_env import VecEnv
from dartenv_tpu.utils import checkpoint as ckpt


def test_npz_roundtrip_pytree(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": (jnp.zeros(4), jnp.ones((), jnp.int32)),
    }
    path = os.path.join(tmp_path, "state")
    ckpt.save_pytree(path, tree)
    out = ckpt.load_pytree(path, tree)
    for x, y in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_shape_mismatch_rejected(tmp_path):
    path = os.path.join(tmp_path, "state")
    ckpt.save_pytree(path, {"a": jnp.zeros(3)})
    with pytest.raises(ValueError):
        ckpt.load_pytree(path, {"a": jnp.zeros(4)})


def test_resume_bit_identical(tmp_path):
    """Save mid-rollout, resume, and require identical trajectories."""
    task = make_cartpole_task(dtype=jnp.float64)
    env = VecEnv(task, num_envs=4, max_episode_steps=20)
    step = jax.jit(env.step)
    state, obs = env.reset(jax.random.PRNGKey(0))
    acts = jnp.ones((4, 1), dtype=jnp.float64) * 0.3
    for _ in range(5):
        state, obs, r, d, _ = step(state, acts)

    path = os.path.join(tmp_path, "mid")
    ckpt.save_pytree(path, state)

    # continue 5 more steps from live state
    s_live = state
    live = []
    for _ in range(5):
        s_live, obs, r, d, _ = step(s_live, acts)
        live.append(np.asarray(obs))

    # resume from checkpoint
    s_resumed = ckpt.load_pytree(path, state)
    resumed = []
    for _ in range(5):
        s_resumed, obs, r, d, _ = step(s_resumed, acts)
        resumed.append(np.asarray(obs))

    np.testing.assert_array_equal(np.stack(live), np.stack(resumed))


@pytest.mark.skipif(not ckpt.have_orbax(), reason="orbax not installed")
def test_orbax_roundtrip(tmp_path):
    tree = {"q": jnp.arange(8.0), "key": jax.random.PRNGKey(3)}
    ckpt.save_orbax(str(tmp_path), tree, step=1)
    out = ckpt.load_orbax(str(tmp_path), tree, step=1)
    for x, y in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
