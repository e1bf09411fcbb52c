"""Warm-started LCP impulse carry on the production path (VERDICT r1 #2).

The engine carries the previous substep's impulses in SimState.lam and
seeds PGS with them (engine/world.py, constraints.py).  These tests pin:

* every production reset path (Task.reset_sim, DartEnv._reset,
  VecEnv.reset) initializes the carry, so the bench actually warm-starts;
* warm-started trajectories agree with cold-started ones to solver
  tolerance (same physics, fewer effective sweeps needed);
* the validation tracer stays cold-start (reference parity unchanged).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dartenv_tpu.engine.constraints import build_layout
from dartenv_tpu.engine.world import SimState, make_do_simulation
from dartenv_tpu.envs.walker2d import make_walker2d_task
from dartenv_tpu.parallel.vec_env import VecEnv


def test_reset_sim_initializes_lam():
    task = make_walker2d_task(dtype=jnp.float64)
    sim = task.reset_sim(jax.random.PRNGKey(0))
    m = build_layout(task.model).m
    assert sim.lam is not None and sim.lam.shape == (m,)
    assert float(jnp.abs(sim.lam).max()) == 0.0


def test_dart_env_reset_initializes_lam():
    import dartenv_tpu

    env = dartenv_tpu.make("DartWalker2d-v1")
    raw = env.unwrapped if hasattr(env, "unwrapped") else env
    raw.reset()
    assert raw._state.sim.lam is not None
    # a step must keep carrying (non-None) impulses
    raw.step(np.zeros(raw.action_space.shape))
    assert raw._state.sim.lam is not None


def test_vec_env_carries_lam():
    task = make_walker2d_task(dtype=jnp.float64)
    vec = VecEnv(task, num_envs=3, max_episode_steps=100)
    state, _ = vec.reset(jax.random.PRNGKey(0))
    assert state.sim.lam is not None and state.sim.lam.shape[0] == 3
    a = jnp.zeros((3, task.action_size), dtype=jnp.float64)
    state, *_ = jax.jit(vec.step)(state, a)
    assert state.sim.lam is not None


def test_warm_equals_cold_to_solver_tolerance():
    """Drop the walker onto the ground for 80 substeps: warm- and
    cold-started runs must agree to LCP solver tolerance (the warm start
    changes the PGS seed, not the fixed point)."""
    task = make_walker2d_task(dtype=jnp.float64)
    model = task.model
    do_sim = jax.jit(make_do_simulation(model, 1))
    m = build_layout(model).m

    q0 = model.q_init
    dq0 = model.dq_init
    tau = jnp.zeros(model.n, dtype=jnp.float64)

    def rollout(lam0):
        sim = SimState(q=q0, dq=dq0,
                       time=jnp.zeros((), dtype=jnp.float64), lam=lam0)
        qs = []
        for _ in range(80):
            sim, _ = do_sim(sim, tau)
            qs.append(np.asarray(sim.q))
        return np.stack(qs)

    q_cold = rollout(None)
    q_warm = rollout(jnp.zeros((m,), dtype=jnp.float64))
    # PGS truncation error differs slightly between seeds; trajectories
    # must stay close through the landing
    np.testing.assert_allclose(q_warm, q_cold, atol=5e-4)


def test_validation_tracer_stays_cold():
    from dartenv_tpu.validation.trace import capture_trace

    task = make_walker2d_task(dtype=jnp.float64)
    model = task.model
    T = 10
    tau = np.zeros((T, model.n))
    t1 = capture_trace(model, np.asarray(model.q_init),
                       np.asarray(model.dq_init), tau)
    t2 = capture_trace(model, np.asarray(model.q_init),
                       np.asarray(model.dq_init), tau)
    assert (t1.q == t2.q).all() and (t1.lam == t2.lam).all()
