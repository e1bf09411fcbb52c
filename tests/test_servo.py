"""Servo-motor constraint rows (reference:
`dart/constraint/ServoMotorConstraint.cpp` † — SURVEY.md §2.4 row
"JointLimit/Servo/Friction").

A dof with servo_flimit > 0 gets an LCP row driving its velocity to the
commanded value, with the impulse boxed to +-force_limit * dt.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dartenv_tpu.engine.world import init_state, make_sim_step
from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.model.builder import ModelBuilder, box_inertia


def _servo_pendulum(flimit, dtype=jnp.float64):
    b = ModelBuilder(dt=0.002, gravity=(0.0, -9.81, 0.0))
    b.add_body(
        "l1", None, sm.REVOLUTE, axes=[(0, 0, 1)],
        cj_pos=(0, 0.5, 0), mass=1.0,
        inertia=box_inertia(1.0, (0.05, 0.5, 0.05)),
        servo_flimit=flimit,
    )
    return b.finalize(dtype=dtype)


def test_servo_tracks_command():
    """With ample force authority the servo row pins dq to the command in
    one substep (velocity-level constraint, like DART's servo motor)."""
    model = _servo_pendulum(flimit=1e4)
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    cmd = jnp.asarray([1.7])
    tau = jnp.zeros(1, dtype=jnp.float64)
    for _ in range(5):
        state, _ = step(state, tau, None, cmd)
    np.testing.assert_allclose(float(state.dq[0]), 1.7, atol=1e-8)


def test_servo_force_limit_clamps():
    """A weak servo saturates: per-substep velocity change is bounded by
    flimit * dt / I (impulse box), so it cannot reach the command."""
    flimit = 0.5
    model = _servo_pendulum(flimit=flimit)
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    cmd = jnp.asarray([50.0])
    tau = jnp.zeros(1, dtype=jnp.float64)
    # moment of inertia about the hinge (rod pivoting at its end)
    I_hinge = float(model.inertia[0, 2, 2] + model.mass[0] * 0.5 ** 2)
    dv_max = flimit * model.dt / I_hinge
    prev = float(state.dq[0])
    for _ in range(3):
        state, _ = step(state, tau, None, cmd)
        dv = float(state.dq[0]) - prev
        assert dv <= dv_max * 1.01 + 1e-10
        prev = float(state.dq[0])
    assert float(state.dq[0]) < 49.0       # saturated, not at the command


def test_servo_holds_against_gravity():
    """Command 0 (position hold): the servo cancels gravity torque each
    substep from a displaced pose — the pendulum stops falling."""
    model = _servo_pendulum(flimit=1e4)
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    state = type(state)(q=jnp.asarray([0.7]), dq=jnp.asarray([0.0]),
                        time=state.time, lam=state.lam)
    cmd = jnp.zeros(1, dtype=jnp.float64)
    tau = jnp.zeros(1, dtype=jnp.float64)
    for _ in range(50):
        state, _ = step(state, tau, None, cmd)
    # velocity pinned each substep -> q barely moves (CFM regularization
    # leaves a ~1e-7 residual velocity, like DART's CFM does)
    np.testing.assert_allclose(float(state.dq[0]), 0.0, atol=1e-6)
    assert abs(float(state.q[0]) - 0.7) < 1e-3


def test_servo_absent_without_flimit():
    from dartenv_tpu.engine.constraints import build_layout

    model = _servo_pendulum(flimit=0.0)
    assert len(build_layout(model).servo_dofs) == 0
    model2 = _servo_pendulum(flimit=2.0)
    assert build_layout(model2).servo_dofs == (0,)
