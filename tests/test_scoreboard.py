"""Local scoreboard packaging/scoring tests (reference:
`gym/scoreboard/api.py` † upload path — SURVEY.md §2.1; network upload is
out of scope by recorded decision, results are scored locally)."""
import json
import os

import numpy as np

import dartenv_tpu as gym
from dartenv_tpu.api import scoreboard
from dartenv_tpu.api.benchmarks import ClipTo01ThenAverage, register_benchmark


def _run_monitored(tmpdir, episodes=3):
    env = gym.make("DartCartPole-v1")
    env = gym.Monitor(env, str(tmpdir), force=True,
                      video_callable=False)
    env.seed(0)
    for _ in range(episodes):
        env.reset()
        done = False
        steps = 0
        while not done and steps < 500:
            # drive hard to one side so the pole tips and the episode ends
            _o, _r, done, _ = env.step(env.action_space.high)
            steps += 1
        assert done, "episode did not terminate"
    env.close()


def test_upload_packages_and_scores(tmp_path):
    _run_monitored(tmp_path)
    register_benchmark(
        id="TestCartPole-v0",
        scorer=ClipTo01ThenAverage(),
        tasks=[dict(env_id="DartCartPole-v1", trials=3,
                    reward_floor=0.0, reward_ceiling=1000.0)],
    )
    ev = scoreboard.upload(str(tmp_path), algorithm_id="random",
                           benchmark_id="TestCartPole-v0",
                           api_key="ignored-no-network")
    assert "DartCartPole-v1" in ev["envs"]
    entry = ev["envs"]["DartCartPole-v1"]
    assert entry["episodes"] == 3
    assert 0.0 <= entry["benchmark_score"] <= 1.0
    out = os.path.join(str(tmp_path), "scoreboard_upload.json")
    assert os.path.exists(out)
    with open(out) as f:
        loaded = json.load(f)
    assert loaded["benchmark_id"] == "TestCartPole-v0"
    assert loaded["algorithm_id"] == "random"


def test_upload_requires_monitor_results(tmp_path):
    import pytest

    from dartenv_tpu.api import error

    with pytest.raises(error.Error):
        scoreboard.upload(str(tmp_path))


def test_logger_setup_roundtrip():
    import logging

    lg = gym.logger_setup(logging.DEBUG)
    assert lg.level == logging.DEBUG and lg.handlers
    gym.undo_logger_setup()
    assert not lg.handlers
