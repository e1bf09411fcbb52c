"""Monitor video / benchmark scoring / utils tests (reference:
`gym/monitoring/tests/test_monitor.py` †, `gym/benchmarks/tests/` † —
SURVEY.md §4)."""
import json
import os
import pickle

import numpy as np
import pytest

import dartenv_tpu as gym
from dartenv_tpu.api.benchmarks import ClipTo01ThenAverage, benchmark_spec
from dartenv_tpu.api.wrappers import Monitor, capped_cubic_video_schedule
from dartenv_tpu.utils.closer import Closer
from dartenv_tpu.utils.colorize import colorize
from dartenv_tpu.utils.ezpickle import EzPickle


class TestVideoSchedule:
    def test_cubes(self):
        recorded = [i for i in range(80) if capped_cubic_video_schedule(i)]
        assert recorded == [0, 1, 8, 27, 64]


class TestMonitorVideo:
    def test_records_video_artifacts(self, tmp_path):
        env = Monitor(gym.make("DartCartPole-v1"), str(tmp_path),
                      force=True, video_callable=lambda e: e == 0)
        env.seed(0)
        env.reset()
        for _ in range(3):
            env.step(np.array([0.0]))
        env.close()
        files = os.listdir(tmp_path)
        vids = [f for f in files if ".video" in f
                and (f.endswith(".mp4") or f.endswith(".npy"))]
        metas = [f for f in files if f.endswith(".meta.json")]
        assert len(vids) == 1, files
        assert len(metas) == 1
        manifest = [f for f in files if f.endswith(".manifest.json")][0]
        with open(os.path.join(tmp_path, manifest)) as f:
            m = json.load(f)
        assert m["videos"] == vids

    def test_video_disabled(self, tmp_path):
        env = Monitor(gym.make("DartCartPole-v1"), str(tmp_path),
                      force=True, video_callable=False)
        env.seed(0)
        env.reset()
        env.step(np.array([0.0]))
        env.close()
        assert not [f for f in os.listdir(tmp_path) if ".video" in f]


class TestBenchmarks:
    def test_spec_lookup(self):
        spec = benchmark_spec("DartControl-v0")
        ids = [t.env_id for t in spec.tasks]
        assert "DartWalker2d-v1" in ids

    def test_scoring_clips_and_averages(self):
        spec = benchmark_spec("DartControl-v0")
        scorer = ClipTo01ThenAverage()
        # cartpole: floor 0, ceiling 1000, trials 3
        s = scorer.score_evaluation(
            spec, "DartCartPole-v1",
            episode_lengths=[1000, 1000, 1000],
            episode_rewards=[1000.0, 500.0, 2000.0],
        )
        assert abs(s - (1.0 + 0.5 + 1.0) / 3.0) < 1e-9

    def test_scoring_missing_episodes(self):
        spec = benchmark_spec("DartControl-v0")
        scorer = ClipTo01ThenAverage()
        s = scorer.score_evaluation(
            spec, "DartCartPole-v1",
            episode_lengths=[1000],
            episode_rewards=[1000.0],
        )
        assert abs(s - 1.0 / 3.0) < 1e-9

    def test_unknown_env_raises(self):
        from dartenv_tpu.api import error

        spec = benchmark_spec("DartControl-v0")
        with pytest.raises(error.Error):
            spec.task_specs("NotAnEnv-v0")


class _Pickleable(EzPickle):
    def __init__(self, a, b=2):
        EzPickle.__init__(self, a, b=b)
        self.derived = a * b  # something not directly picklable-derived


class TestUtils:
    def test_ezpickle_roundtrip(self):
        obj = _Pickleable(3, b=4)
        obj2 = pickle.loads(pickle.dumps(obj))
        assert obj2.derived == 12

    def test_closer(self):
        closed = []

        class Thing:
            def close(self):
                closed.append(True)

        c = Closer(atexit_register=False)
        t = Thing()
        cid = c.register(t)
        c.close()
        assert closed == [True]
        c.unregister(cid)

    def test_colorize(self):
        s = colorize("hi", "green", bold=True)
        assert "hi" in s and s.startswith("\x1b[")
