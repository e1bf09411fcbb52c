"""Env smoke + determinism tests over the registry
(reference: `gym/envs/tests/test_envs.py` †, `test_determinism.py` ‡ —
SURVEY.md §4)."""
import numpy as np
import pytest

import dartenv_tpu as gym

from spec_list import spec_list


@pytest.mark.parametrize("spec", spec_list, ids=[s.id for s in spec_list])
def test_env_smoke(spec):
    env = spec.make()
    env.seed(0)
    ob_space = env.observation_space
    act_space = env.action_space
    ob = env.reset()
    assert ob_space.contains(ob), (
        "Reset observation: {!r} not in space".format(ob)
    )
    from dartenv_tpu.api import spaces as sp

    sp.seed(0)
    for _ in range(8):
        a = act_space.sample()
        observation, reward, done, _info = env.step(a)
        assert ob_space.contains(observation)
        assert np.isscalar(reward) or np.asarray(reward).shape == ()
        assert isinstance(done, bool)
        if done:
            env.reset()
    env.close()


@pytest.mark.parametrize("spec", spec_list, ids=[s.id for s in spec_list])
def test_env_determinism(spec):
    """Two same-seed rollouts must be bit-identical."""

    def rollout(seed, n=10):
        env = spec.make()
        env.seed(seed)
        from dartenv_tpu.api import spaces as sp

        sp.seed(seed)
        obs = [env.reset()]
        rews = []
        for _ in range(n):
            a = env.action_space.sample()
            o, r, d, _ = env.step(a)
            obs.append(o)
            rews.append(r)
            if d:
                break
        env.close()
        return np.concatenate([o.ravel() for o in obs]), np.asarray(rews)

    o1, r1 = rollout(123)
    o2, r2 = rollout(123)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(r1, r2)


@pytest.mark.parametrize("env_id,expect_contact", [
    ("DartWalker3d-v1", True),
    ("DartDog-v1", True),
    # the snake's planar root pins it AT the ground plane (depth 0, never
    # penetrating), so its regime check is finiteness/space only
    ("DartSnake7Link-v1", False),
])
def test_contact_rich_regime_3d(env_id, expect_contact):
    """Drive the 3D contact envs through an actual landing/stumble regime
    (VERDICT.md r1 weak #10: these families only had 8-step smoke
    coverage, so the contact-heavy code paths — multi-point manifolds,
    friction rows, cap compaction — went unexercised for them).  Under
    zero action the robot falls onto the ground and settles; every state
    along the way must stay finite and inside the observation space, and
    the facade must report actual contacts."""
    env = gym.make(env_id)
    env.seed(0)
    env.reset()
    raw = env.unwrapped
    a0 = np.zeros(raw.action_space.shape, dtype=np.float64)
    saw_contact = False
    for k in range(60):
        obs, rew, done, info = env.step(a0)
        assert np.all(np.isfinite(obs)), f"step {k}: non-finite obs"
        assert np.isfinite(rew)
        if raw.world.collision_result.num_contacts() > 0:
            saw_contact = True
        if done:
            env.reset()
    if expect_contact:
        assert saw_contact, "60 zero-torque steps never produced a contact"
    env.close()
