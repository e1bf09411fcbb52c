"""Camera-parity software renderer (VERDICT.md r1 missing #6): perspective
projection + COM tracking, usable for 3D envs."""
import jax
import numpy as np
import pytest

import dartenv_tpu as gym
from dartenv_tpu.envs.render import Camera, render_frame

_SKY = np.array([235, 241, 250])


def _robot_pixels(frame):
    nonbg = (~np.all(frame == _SKY, -1)) & (frame[..., 0] != frame[..., 1])
    return nonbg


@pytest.mark.parametrize("env_id", [
    "DartWalker2d-v1", "DartWalker3d-v1", "DartHumanWalker-v1"])
def test_tracked_render_shows_robot(env_id):
    env = gym.make(env_id)
    env.reset()
    for _ in range(2):
        env.step(env.action_space.sample())
    frame = env.render(mode="rgb_array")
    assert frame.shape == (240, 320, 3) and frame.dtype == np.uint8
    nonbg = _robot_pixels(frame)
    assert nonbg.sum() > 100, f"{env_id}: robot not visible"
    ys, xs = np.nonzero(nonbg)
    # tracked: the robot centroid stays near the frame center
    assert abs(xs.mean() - 160) < 60, xs.mean()
    assert abs(ys.mean() - 120) < 80, ys.mean()
    env.close()


def test_camera_tracks_moving_robot():
    """Teleport the walker 5 m forward: with COM tracking the rendered
    silhouette stays centered (the old orthographic view lost the robot)."""
    env = gym.make("DartWalker2d-v1").unwrapped
    env.reset()
    f0 = env.render(mode="rgb_array")
    q = np.asarray(env._state.sim.q).copy()
    q[0] += 5.0
    env.set_state(q, np.asarray(env._state.sim.dq))
    f1 = env.render(mode="rgb_array")
    for f in (f0, f1):
        nb = _robot_pixels(f)
        ys, xs = np.nonzero(nb)
        assert nb.sum() > 100
        assert abs(xs.mean() - 160) < 60
    env.close()


def test_camera_azimuth_changes_view():
    env = gym.make("DartWalker3d-v1").unwrapped
    env.reset()
    env.camera = Camera(azimuth=0.0)
    side = env.render(mode="rgb_array")
    env.camera = Camera(azimuth=90.0)
    front = env.render(mode="rgb_array")
    assert (side != front).any()
    env.close()


def test_ground_checkerboard_present():
    env = gym.make("DartHopper-v1").unwrapped
    env.reset()
    frame = env.render(mode="rgb_array")
    flat = frame.reshape(-1, 3)
    has_a = (flat == np.array([205, 205, 205])).all(-1).any()
    has_b = (flat == np.array([175, 175, 175])).all(-1).any()
    assert has_a and has_b, "ground checkerboard missing"
    env.close()


def test_image_observation_path():
    """obs_type='image' (VERDICT.md r3 weak #6, zero coverage before):
    reset AND step return (screen_height, screen_width, 3) uint8 frames at
    the ctor's screen size, shape-stable across resets, and the plain
    rgb_array render keeps its own resolution."""
    from dartenv_tpu.envs.base import DartEnv
    from dartenv_tpu.envs.cart_pole import make_cartpole_task

    env = DartEnv(make_cartpole_task(), obs_type="image",
                  screen_width=80, screen_height=45)
    obs0 = env.reset()
    assert obs0.shape == (45, 80, 3) and obs0.dtype == np.uint8
    obs, reward, done, info = env.step(env.action_space.sample())
    assert obs.shape == (45, 80, 3) and obs.dtype == np.uint8
    assert np.isfinite(reward)
    # shape-stable under reset
    assert env.reset().shape == (45, 80, 3)
    # Monitor/video path unaffected: full-resolution frames
    frame = env.render(mode="rgb_array")
    assert frame.shape == (240, 320, 3) and frame.dtype == np.uint8
    env.close()


@pytest.mark.parametrize("env_id", [
    "DartCartPole-v1", "DartReacher-v1"])
def test_geomless_stick_figure(env_id):
    """Pure-dynamics tasks have no shapes; the reference still draws them
    (its .skel visualization shapes feed the GL scene †) — parity is the
    renderer's stick-figure fallback, which must show the robot."""
    env = gym.make(env_id).unwrapped
    env.reset()
    frame = env.render(mode="rgb_array")
    nonbg = ~np.all(frame == _SKY, -1)
    assert nonbg.sum() > 50, f"{env_id}: stick figure not visible"
    env.close()
