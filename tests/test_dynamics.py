"""Dynamics internal-consistency tests (SURVEY.md §4 rebuild strategy (3):
CRBA-vs-ABA agreement, energy conservation, momentum conservation, analytic
pendulum — the DART-native `unittests/testDynamics.cpp` † analogue)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.model.builder import ModelBuilder, box_inertia
from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.dynamics.algorithms import (
    aba, crba, fk, forward_dynamics_crb, rnea_bias,
)
from dartenv_tpu.engine.world import init_state, make_sim_step


def pendulum_model(dtype=jnp.float64):
    """Point-mass pendulum: revolute about z, arm length 1 along -y."""
    b = ModelBuilder(dt=0.001)
    b.add_body(
        "arm", None, sm.REVOLUTE,
        axes=[(0, 0, 1)],
        pj_pos=(0, 0, 0), cj_pos=(0, 1.0, 0),  # joint 1m above body origin
        mass=2.0, com=(0, 0, 0), inertia=np.eye(3) * 1e-6,
    )
    return b.finalize(dtype=dtype)


def double_pendulum_model(dtype=jnp.float64):
    b = ModelBuilder(dt=0.001)
    b.add_body(
        "l1", None, sm.REVOLUTE, axes=[(0, 0, 1)],
        cj_pos=(0, 0.5, 0), mass=1.0,
        inertia=box_inertia(1.0, (0.05, 0.5, 0.05)),
    )
    b.add_body(
        "l2", "l1", sm.REVOLUTE, axes=[(0, 0, 1)],
        pj_pos=(0, -0.5, 0), cj_pos=(0, 0.5, 0), mass=1.5,
        inertia=box_inertia(1.5, (0.05, 0.5, 0.05)),
    )
    return b.finalize(dtype=dtype)


def chain_3d_model(dtype=jnp.float64):
    """Free base + euler + universal + revolute + prismatic chain: exercises
    every q-dependent subspace path."""
    b = ModelBuilder(dt=0.001)
    b.add_body("base", None, sm.FREE, mass=2.0,
               inertia=box_inertia(2.0, (0.1, 0.2, 0.15)), com=(0.02, 0.01, -0.03))
    b.add_body("e", "base", sm.EULER, pj_pos=(0.1, -0.2, 0.05),
               cj_pos=(0, 0.3, 0), mass=1.0,
               inertia=box_inertia(1.0, (0.05, 0.3, 0.05)), com=(0, -0.1, 0))
    b.add_body("u", "e", sm.UNIVERSAL,
               axes=[(1, 0, 0), (0, 0, 1)], pj_pos=(0, -0.3, 0),
               cj_pos=(0, 0.25, 0), mass=0.8,
               inertia=box_inertia(0.8, (0.04, 0.25, 0.04)))
    b.add_body("r", "u", sm.REVOLUTE, axes=[(0, 1, 0)],
               pj_pos=(0, -0.25, 0), cj_pos=(0, 0.2, 0), mass=0.5,
               inertia=box_inertia(0.5, (0.03, 0.2, 0.03)))
    b.add_body("p", "r", sm.PRISMATIC, axes=[(0, 1, 0)],
               pj_pos=(0, -0.2, 0), mass=0.3,
               inertia=box_inertia(0.3, (0.02, 0.1, 0.02)))
    return b.finalize(dtype=dtype)


def total_energy(model, q, dq):
    kin = fk(model, q, dq)
    M = crba(model, kin)
    ke = 0.5 * dq @ M @ dq
    # potential: sum m g . com_world
    from dartenv_tpu.math import spatial as sp
    com_w = kin.p_w + jnp.einsum("bij,bj->bi", kin.R_w, model.com)
    pe = -jnp.sum(model.mass * (com_w @ model.gravity))
    return ke + pe


MODELS = {
    "pendulum": pendulum_model,
    "double_pendulum": double_pendulum_model,
    "chain3d": chain_3d_model,
}


@pytest.mark.parametrize("name", list(MODELS))
def test_crba_vs_aba(name):
    """M^-1 (tau - C) must equal ABA's ddq for random states."""
    model = MODELS[name]()
    rng = np.random.RandomState(3)
    for _ in range(5):
        q = jnp.asarray(rng.randn(model.n) * 0.5)
        dq = jnp.asarray(rng.randn(model.n))
        tau = jnp.asarray(rng.randn(model.n))
        kin = fk(model, q, dq)
        M = crba(model, kin)
        C = rnea_bias(model, kin, dq)
        ddq_crb = jnp.linalg.solve(M, tau - C)
        ddq_aba = aba(model, kin, q, dq, tau, model.dt)
        np.testing.assert_allclose(ddq_aba, ddq_crb, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("name", list(MODELS))
def test_mass_matrix_spd(name):
    model = MODELS[name]()
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(model.n) * 0.3)
    kin = fk(model, q, jnp.zeros(model.n))
    M = np.asarray(crba(model, kin))
    np.testing.assert_allclose(M, M.T, atol=1e-9)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_pendulum_analytic():
    """ddq = -(g/L) sin(theta) for a point-mass pendulum."""
    model = pendulum_model()
    for theta in [0.0, 0.3, -1.2, 2.0]:
        q = jnp.asarray([theta])
        dq = jnp.zeros(1)
        kin = fk(model, q, dq)
        ddq, _ = forward_dynamics_crb(
            model, kin, q, dq, jnp.zeros(1), model.dt
        )
        # pendulum hangs along -y; theta measured from straight down
        expected = -9.81 / 1.0 * np.sin(theta)
        np.testing.assert_allclose(float(ddq[0]), expected, rtol=1e-5,
                                   atol=1e-7)


def test_energy_conservation_double_pendulum():
    model = double_pendulum_model()
    step = jax.jit(make_sim_step(model))
    import dataclasses
    state = dataclasses.replace(init_state(model), q=jnp.asarray([0.8, -0.4]))
    e0 = float(total_energy(model, state.q, state.dq))
    tau = jnp.zeros(model.n)
    for _ in range(2000):  # 2 s at dt=1e-3
        state, _ = step(state, tau)
    e1 = float(total_energy(model, state.q, state.dq))
    # semi-implicit Euler: bounded drift, not exact
    assert abs(e1 - e0) < 0.05 * max(abs(e0), 1.0), (e0, e1)


def test_momentum_conservation_free_fall():
    """Free body, no gravity: spatial momentum constant; with gravity:
    linear momentum follows m g t, angular about origin drifts consistently."""
    model = chain_3d_model()
    model = model.replace(gravity=jnp.zeros(3, dtype=model.gravity.dtype))
    step = jax.jit(make_sim_step(model))
    rng = np.random.RandomState(5)
    import dataclasses
    state = init_state(model)
    state = dataclasses.replace(
        state,
        q=jnp.asarray(rng.randn(model.n) * 0.2),
        dq=jnp.asarray(rng.randn(model.n) * 0.5),
    )

    def momentum(q, dq):
        kin = fk(model, q, dq)
        from dartenv_tpu.math import spatial as sp
        h = jnp.zeros(6, dtype=q.dtype)
        I = sp.spatial_inertia(model.mass, model.com, model.inertia)
        for i in range(model.nb):
            hb = sp.inertia_mul(I[i], kin.v[i])
            # to world frame at world origin (force-type transform inverse)
            h = h + sp.xforce_inv_apply(
                kin.R_w[i].T, kin.p_w[i], hb
            )
        return h

    h0 = momentum(state.q, state.dq)
    tau = jnp.zeros(model.n)

    def drift(dt_scale, nsteps):
        m2 = model.replace(dt=model.dt * dt_scale)
        st = state
        s2 = jax.jit(make_sim_step(m2))
        for _ in range(nsteps):
            st, _ = s2(st, tau)
        return float(jnp.linalg.norm(momentum(st.q, st.dq) - h0))

    # momentum is conserved by the continuous dynamics; the joint-space
    # semi-implicit Euler introduces O(dt) drift — check small + 1st-order
    e_dt = drift(1.0, 500)
    e_half = drift(0.5, 1000)
    h0n = float(jnp.linalg.norm(h0))
    assert e_dt < 0.02 * h0n, (e_dt, h0n)
    assert e_half < 0.7 * e_dt, (e_half, e_dt)


def test_damping_dissipates():
    model = double_pendulum_model()
    model = model.replace(damping=jnp.asarray([2.0, 2.0], dtype=jnp.float64))
    step = jax.jit(make_sim_step(model))
    import dataclasses
    state = dataclasses.replace(init_state(model), q=jnp.asarray([1.0, 0.5]))
    e0 = float(total_energy(model, state.q, state.dq))
    for _ in range(6000):
        state, _ = step(state, jnp.zeros(model.n))
    e1 = float(total_energy(model, state.q, state.dq))
    # most of the mechanical energy must be dissipated by the dampers
    e_min = float(total_energy(model, jnp.zeros(2), jnp.zeros(2)))
    assert (e1 - e_min) < 0.3 * (e0 - e_min), (e0, e1, e_min)


def test_spring_equilibrium():
    """Strong spring pulls dof to rest position."""
    model = double_pendulum_model()
    model = model.replace(
        spring_stiff=jnp.asarray([200.0, 200.0], dtype=jnp.float64),
        damping=jnp.asarray([15.0, 15.0], dtype=jnp.float64),
        rest_pos=jnp.asarray([0.3, -0.2], dtype=jnp.float64),
    )
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    for _ in range(8000):
        state, _ = step(state, jnp.zeros(model.n))
    # equilibrium: spring torque balances gravity, so near rest_pos
    assert abs(float(state.q[0]) - 0.3) < 0.15
    assert float(jnp.abs(state.dq).max()) < 1e-2
