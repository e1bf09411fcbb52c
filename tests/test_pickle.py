"""EzPickle round-trips for every registered dart env (reference: every
dart env inherits `gym.utils.EzPickle` † — SURVEY.md §2.1 Utils row)."""
import pickle

import numpy as np
import pytest

import dartenv_tpu
from dartenv_tpu.api.registration import registry

DART_IDS = sorted(
    s.id for s in registry.all() if s.id.startswith("Dart")
)

# envs cheap enough to also step after unpickling
_STEP_IDS = ["DartCartPole-v1", "DartHopper-v1"]


@pytest.mark.parametrize("env_id", DART_IDS)
def test_pickle_roundtrip(env_id):
    env = dartenv_tpu.make(env_id)
    raw = env.unwrapped if hasattr(env, "unwrapped") else env
    data = pickle.dumps(raw)
    clone = pickle.loads(data)
    assert type(clone) is type(raw)
    assert clone.observation_space.shape == raw.observation_space.shape
    assert clone.action_space.shape == raw.action_space.shape


@pytest.mark.parametrize("env_id", _STEP_IDS)
def test_pickle_clone_steps(env_id):
    env = dartenv_tpu.make(env_id)
    raw = env.unwrapped if hasattr(env, "unwrapped") else env
    clone = pickle.loads(pickle.dumps(raw))
    clone._seed(0)
    obs = clone.reset()
    assert np.all(np.isfinite(obs))
    obs, r, d, _ = clone.step(np.zeros(clone.action_space.shape))
    assert np.isfinite(r)
