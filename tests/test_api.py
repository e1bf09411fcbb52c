"""API-layer tests (reference test strategy, SURVEY.md §4: registration,
spaces, seeding, TimeLimit/Monitor)."""
import json
import os

import numpy as np
import pytest

import dartenv_tpu as gym
from dartenv_tpu.api import error, seeding, spaces
from dartenv_tpu.api.registration import EnvSpec, env_id_re


class TestSeeding:
    def test_np_random_deterministic(self):
        rng1, seed1 = seeding.np_random(42)
        rng2, seed2 = seeding.np_random(42)
        assert seed1 == seed2 == 42
        np.testing.assert_array_equal(rng1.uniform(size=10),
                                      rng2.uniform(size=10))

    def test_different_seeds_different_streams(self):
        rng1, _ = seeding.np_random(1)
        rng2, _ = seeding.np_random(2)
        assert not np.allclose(rng1.uniform(size=10), rng2.uniform(size=10))

    def test_hash_seed_stable(self):
        # pin the SHA-based algorithm (seed-for-seed repro contract)
        assert seeding.hash_seed(0) == seeding.hash_seed(0)
        assert seeding.hash_seed(0) != seeding.hash_seed(1)

    def test_invalid_seed_raises(self):
        with pytest.raises(error.Error):
            seeding.np_random(-1)
        with pytest.raises(error.Error):
            seeding.np_random("bad")


class TestSpaces:
    @pytest.mark.parametrize("space", [
        spaces.Box(-1.0, 1.0, shape=(3,)),
        spaces.Box(np.array([-10.0, 0.0]), np.array([10.0, 5.0])),
        spaces.Discrete(8),
        spaces.MultiBinary(6),
        spaces.Tuple([spaces.Discrete(3), spaces.Box(-1.0, 1.0, shape=(2,))]),
    ])
    def test_sample_contains(self, space):
        spaces.seed(0)
        for _ in range(10):
            assert space.contains(space.sample())

    def test_box_jsonable_roundtrip(self):
        space = spaces.Box(-1.0, 1.0, shape=(4,))
        spaces.seed(0)
        samples = [space.sample() for _ in range(3)]
        round_tripped = space.from_jsonable(space.to_jsonable(samples))
        for a, b in zip(samples, round_tripped):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_multidiscrete(self):
        space = spaces.MultiDiscrete([[0, 4], [0, 1], [2, 5]])
        spaces.seed(1)
        for _ in range(10):
            assert space.contains(space.sample())


class TestRegistration:
    def test_id_grammar(self):
        assert env_id_re.search("DartCartPole-v1")
        assert env_id_re.search("user/Thing-v0")
        assert not env_id_re.search("no version here")

    def test_malformed_id_raises(self):
        with pytest.raises(error.Error):
            gym.spec("NotAnId")

    def test_unregistered_raises(self):
        with pytest.raises(error.UnregisteredEnv):
            gym.spec("DoesNotExist-v0")

    def test_deprecated_version_raises(self):
        with pytest.raises(error.DeprecatedEnv):
            gym.spec("DartCartPole-v99")

    def test_spec_fields(self):
        s = gym.spec("DartCartPole-v1")
        assert s.id == "DartCartPole-v1"
        assert s.max_episode_steps == 1000
        assert s.timestep_limit == 1000

    def test_double_register_raises(self):
        with pytest.raises(error.Error):
            gym.register(id="DartCartPole-v1", entry_point="x:y")

    def test_make_wraps_timelimit(self):
        env = gym.make("DartCartPole-v1")
        from dartenv_tpu.api.wrappers import TimeLimit

        assert isinstance(env, TimeLimit)
        assert env.spec.id == "DartCartPole-v1"


class TestTimeLimit:
    def test_truncates(self):
        env = gym.make("DartCartPole-v1")
        env.seed(0)
        env.reset()
        done_at = None
        for i in range(1100):
            _, _, done, _ = env.step(np.array([0.0]))
            # keep the pole from terminating early: overwrite is not
            # possible, so just count until done
            if done:
                done_at = i + 1
                break
        assert done_at is not None and done_at <= 1000

    def test_step_before_reset_raises(self):
        env = gym.make("DartCartPole-v1")
        with pytest.raises(AssertionError):
            env.step(np.array([0.0]))


class TestMonitor:
    def test_records_stats(self, tmp_path):
        from dartenv_tpu.api.wrappers import Monitor

        env = Monitor(gym.make("DartCartPole-v1"), str(tmp_path), force=True)
        env.seed(0)
        for _ in range(2):
            env.reset()
            for _ in range(5):
                _, _, done, _ = env.step(np.array([1.0]))
                if done:
                    break
        env.close()
        stats_files = [f for f in os.listdir(tmp_path)
                       if f.endswith(".stats.json")]
        assert len(stats_files) == 1
        with open(os.path.join(tmp_path, stats_files[0])) as f:
            stats = json.load(f)
        assert stats["env_id"] == "DartCartPole-v1"
        assert len(stats["episode_rewards"]) >= 1
        manifests = [f for f in os.listdir(tmp_path)
                     if f.endswith(".manifest.json")]
        assert len(manifests) == 1
