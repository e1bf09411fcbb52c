"""Reference-style custom env subclassing (SURVEY.md §2.2 DartEnv base).

Reproduces, against this framework, exactly what a dart-env user writes:
subclass DartEnv with the reference constructor signature, override _step
(calling do_simulation) / reset_model / _get_obs, and code against
robot_skeleton — the hopper pattern from `gym/envs/dart/hopper.py` †.
"""
import numpy as np
import pytest

from dartenv_tpu.envs import DartEnv
from dartenv_tpu.api import spaces


class MyHopper(DartEnv):
    """User-written env in the reference idiom."""

    def __init__(self):
        control_bounds = np.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0]])
        DartEnv.__init__(
            self, "hopper_capsule.skel", 4, 11, control_bounds,
            disableViewer=True,
        )

    def _step(self, a):
        a = np.clip(a, -1.0, 1.0)
        posbefore = self.robot_skeleton.q[0]
        tau = np.zeros(self.robot_skeleton.ndofs)
        tau[3:] = a * 200.0
        self.do_simulation(tau, self.frame_skip)
        posafter = self.robot_skeleton.q[0]
        alive_bonus = 1.0
        reward = (posafter - posbefore) / self.dt + alive_bonus
        reward -= 1e-3 * np.square(a).sum()
        s = self.state_vector()
        height = self.robot_skeleton.bodynodes[0].com()[1]
        done = not (
            np.isfinite(s).all() and (np.abs(s[2:]) < 100).all()
            and height > -0.3
        )
        return self._get_obs(), reward, done, {}

    def _get_obs(self):
        skel = self.robot_skeleton
        return np.concatenate([skel.q[1:], np.clip(skel.dq, -10, 10)])

    def reset_model(self):
        qpos = np.asarray(self.model.q_init) + self.np_random.uniform(
            low=-0.005, high=0.005, size=self.robot_skeleton.ndofs
        )
        qvel = self.np_random.uniform(
            low=-0.005, high=0.005, size=self.robot_skeleton.ndofs
        )
        self.set_state(qpos, qvel)
        return self._get_obs()


@pytest.fixture(scope="module")
def env():
    return MyHopper()


def test_constructor_reference_signature(env):
    assert env.frame_skip == 4
    assert env.observation_space.shape == (11,)
    assert isinstance(env.action_space, spaces.Box)
    assert env.action_space.shape == (3,)
    assert env.dt == pytest.approx(4 * 0.002)


def test_reset_and_step(env):
    env.seed(0)
    obs = env.reset()
    assert obs.shape == (11,)
    total = 0.0
    for _ in range(50):
        obs, r, done, _ = env.step(env.action_space.sample())
        total += r
        assert obs.shape == (11,)
        if done:
            break
    assert np.isfinite(total)


def test_seeded_determinism(env):
    env.seed(123)
    o1 = env.reset()
    env.seed(123)
    o2 = env.reset()
    np.testing.assert_array_equal(o1, o2)
    a = np.array([0.3, -0.2, 0.5])
    r1 = env.step(a)
    env.seed(123)
    env.reset()
    r2 = env.step(a)
    np.testing.assert_allclose(r1[0], r2[0])
    assert r1[1] == pytest.approx(r2[1])


def test_dt_override():
    class Tiny(DartEnv):
        def __init__(self):
            DartEnv.__init__(self, "hopper_capsule.skel", 2, 4,
                             np.array([[1.0], [-1.0]]), dt=0.001)

    e = Tiny()
    assert float(e.model.dt) == 0.001
    assert e.dt == pytest.approx(0.002)
