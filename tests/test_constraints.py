"""Constraint/LCP tests (SURVEY.md §4: LCP complementarity residuals,
joint-limit semantics — `testConstraint.cpp` † analogue)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.lcp.pgs import pgs_solve
from dartenv_tpu.model.builder import ModelBuilder, box_inertia
from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.engine.world import init_state, make_sim_step


def test_pgs_complementarity_random():
    """Random SPD boxed LCPs: check w = A lam + b satisfies the boxed
    complementarity conditions at the solution."""
    rng = np.random.RandomState(0)
    for trial in range(10):
        m = 8
        G = rng.randn(m, m)
        A = jnp.asarray(G @ G.T + np.eye(m) * 0.5)
        b = jnp.asarray(rng.randn(m))
        lo = jnp.asarray(np.where(rng.rand(m) < 0.5, 0.0, -1.0))
        hi = jnp.asarray(np.where(rng.rand(m) < 0.5, 1e20, 2.0))
        findex = -np.ones(m, dtype=np.int64)
        mu = jnp.zeros(m)
        active = jnp.ones(m)
        lam = pgs_solve(A, b, lo, hi, findex, mu, active, iters=300)
        w = A @ lam + b
        for i in range(m):
            li, hi_i, wi = float(lam[i]), float(hi[i]), float(w[i])
            lo_i = float(lo[i])
            if abs(li - lo_i) < 1e-5:
                assert wi > -1e-4  # at lower bound: w >= 0
            elif hi_i < 1e19 and abs(li - hi_i) < 1e-5:
                assert wi < 1e-4   # at upper bound: w <= 0
            else:
                assert abs(wi) < 1e-4  # interior: w == 0


def test_pgs_friction_findex():
    """Friction rows must be boxed by mu * normal impulse."""
    # 2 rows: normal with b<0 (approaching), friction coupled
    A = jnp.eye(2)
    b = jnp.asarray([-2.0, 1.5])
    lo = jnp.asarray([0.0, -1e20])
    hi = jnp.asarray([1e20, 1e20])
    findex = np.asarray([-1, 0])
    mu = jnp.asarray([0.0, 0.5])
    active = jnp.ones(2)
    lam = pgs_solve(A, b, lo, hi, findex, mu, active, iters=100)
    assert abs(float(lam[0]) - 2.0) < 1e-5
    # unbounded would want -1.5; boxed at -mu*lam_n = -1.0
    assert abs(float(lam[1]) + 1.0) < 1e-5


def _boxed_problem(seed, m=9):
    rng = np.random.RandomState(seed)
    G = rng.randn(m, m)
    A = jnp.asarray(G @ G.T + np.eye(m) * 0.5)
    b = jnp.asarray(rng.randn(m))
    lo = jnp.asarray(np.where(rng.rand(m) < 0.5, 0.0, -1.0))
    hi = jnp.asarray(np.where(rng.rand(m) < 0.5, 1e20, 2.0))
    findex = -np.ones(m, dtype=np.int64)
    mu = jnp.zeros(m)
    active = jnp.ones(m)
    return A, b, lo, hi, findex, mu, active


def test_dantzig_complementarity_and_pgs_agreement():
    """The pivoting solver must reach the same complementarity point PGS
    converges to (unique for SPD A)."""
    from dartenv_tpu.lcp.dantzig import dantzig_solve

    for seed in range(8):
        A, b, lo, hi, findex, mu, active = _boxed_problem(seed)
        lam_d = dantzig_solve(A, b, lo, hi, findex, mu, active,
                              polish_iters=0)
        lam_p = pgs_solve(A, b, lo, hi, findex, mu, active, iters=500)
        np.testing.assert_allclose(np.asarray(lam_d), np.asarray(lam_p),
                                   atol=1e-6)
        w = np.asarray(A @ lam_d + b)
        lam = np.asarray(lam_d)
        for i in range(len(lam)):
            if abs(lam[i] - float(lo[i])) < 1e-8:
                assert w[i] > -1e-6
            elif float(hi[i]) < 1e19 and abs(lam[i] - float(hi[i])) < 1e-8:
                assert w[i] < 1e-6
            else:
                assert abs(w[i]) < 1e-6


def test_dantzig_friction_findex():
    from dartenv_tpu.lcp.dantzig import dantzig_solve

    A = jnp.eye(2)
    b = jnp.asarray([-2.0, 1.5])
    lo = jnp.asarray([0.0, -1e20])
    hi = jnp.asarray([1e20, 1e20])
    findex = np.asarray([-1, 0])
    mu = jnp.asarray([0.0, 0.5])
    active = jnp.ones(2)
    lam = dantzig_solve(A, b, lo, hi, findex, mu, active)
    assert abs(float(lam[0]) - 2.0) < 1e-5
    assert abs(float(lam[1]) + 1.0) < 1e-5


def test_hopper_runs_with_dantzig_solver():
    """Engine-level: hopper drop with solver='dantzig' stays finite and
    rests on its foot like the PGS path."""
    import jax.numpy as jnp
    from dartenv_tpu.model.skel_model import SolverConfig
    from dartenv_tpu.model.skel_parser import asset_path, parse_skel

    world = parse_skel(asset_path("hopper_capsule.skel"),
                       dtype=jnp.float64,
                       solver=SolverConfig(solver="dantzig"))
    model = world.robot
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    for _ in range(300):
        state, c = step(state, jnp.zeros(model.n))
    assert np.all(np.isfinite(np.asarray(state.q)))
    assert abs(float(state.q[1]) + 0.04) < 0.01   # resting drop ~4 cm
    assert float(jnp.sum(c.active)) >= 1.0


def _limited_pendulum():
    b = ModelBuilder(dt=0.002)
    b.add_body(
        "arm", None, sm.REVOLUTE, axes=[(0, 0, 1)],
        cj_pos=(0, 0.5, 0), mass=1.0,
        inertia=box_inertia(1.0, (0.05, 0.5, 0.05)),
        q_lower=[-0.5], q_upper=[0.5],
    )
    return b.finalize(dtype=jnp.float64)


def test_joint_limit_stop():
    """Gravity torque pushes the pendulum against its limit: q must settle
    at the stop (velocity-level limit with ERP recovery)."""
    model = _limited_pendulum()
    step = jax.jit(make_sim_step(model))
    state = dataclasses.replace(
        init_state(model), q=jnp.asarray([0.3]), dq=jnp.asarray([2.0])
    )
    tau = jnp.asarray([5.0])  # constant push toward +
    qs = []
    for _ in range(1500):
        state, _ = step(state, tau)
        qs.append(float(state.q[0]))
    assert max(qs) < 0.6          # never far past the stop
    assert abs(qs[-1] - 0.5) < 0.01   # settles at the limit


def test_joint_limit_inactive_inside_range():
    """Away from the limits the constraint must not alter dynamics."""
    model = _limited_pendulum()
    free = model.replace(limited=jnp.zeros(1, dtype=jnp.float64))
    s0 = dataclasses.replace(init_state(model), q=jnp.asarray([0.1]))
    step_a = jax.jit(make_sim_step(model))
    step_b = jax.jit(make_sim_step(free))
    sa, sb = s0, s0
    for _ in range(100):
        sa, _ = step_a(sa, jnp.zeros(1))
        sb, _ = step_b(sb, jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(sa.q), np.asarray(sb.q),
                               atol=1e-12)


def test_reacher_limits_hold_under_saturation():
    from dartenv_tpu.envs.reacher import make_reacher_task
    from dartenv_tpu.envs.base import make_env_step, make_env_reset

    task = make_reacher_task(dtype=jnp.float64)
    stepf = jax.jit(make_env_step(task))
    resetf = jax.jit(make_env_reset(task))
    state, obs = resetf(jax.random.PRNGKey(0))
    a = jnp.asarray([1.0, 0.5, -0.5, 1.0, 0.7])
    maxq = np.zeros(5)
    for _ in range(300):
        state, obs, r, d, _ = stepf(state, a)
        maxq = np.maximum(maxq, np.abs(np.asarray(state.sim.q)))
    limits = np.asarray(task.model.q_upper)
    assert np.all(maxq < limits + 0.05), (maxq, limits)
