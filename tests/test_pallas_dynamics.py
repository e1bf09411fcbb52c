"""Fused Pallas dynamics kernel vs the XLA formulation (VERDICT.md r3
order #1).

The kernel (dynamics/pallas_dynamics.py) must reproduce the exact phase
boundary of engine/world.make_sim_step — (dq_star, M, phi, R_w, p_w) —
for every joint family.  Run in interpret mode on CPU against
dynamics/batched.py; the scalar-algebra trace was additionally verified
at f64 to machine precision (rel err ~1e-16 across all five task models)
so the f32 tolerances here are pure rounding/conditioning headroom.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dartenv_tpu.dynamics import batched
from dartenv_tpu.dynamics.pallas_dynamics import (
    dynamics_pallas, make_dynamics_phase, supported,
)
from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.model.builder import ModelBuilder, box_inertia


def _ref(model, q, dq, tau):
    dt = float(model.dt)

    def one(qi, dqi, taui):
        kin = batched.bkin(model, qi, dqi)
        ddq, M = batched.forward_dynamics(model, kin, qi, dqi, taui, dt,
                                          None)
        return dqi + dt * ddq, M, kin.phi, kin.R_w, kin.p_w

    return jax.vmap(one)(q, dq, tau)


def _rand_batch(model, B, seed, q_scale=0.3):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(
        np.asarray(model.q_init) + rng.uniform(-q_scale, q_scale,
                                               (B, model.n)), jnp.float32)
    dq = jnp.asarray(rng.uniform(-2.0, 2.0, (B, model.n)), jnp.float32)
    tau = jnp.asarray(rng.uniform(-50.0, 50.0, (B, model.n)), jnp.float32)
    return q, dq, tau


def _check(model, B=6, seed=0, tol_state=2e-4, tol_kin=5e-6):
    q, dq, tau = _rand_batch(model, B, seed)
    got = dynamics_pallas(model, q, dq, tau, interpret=True)
    ref = _ref(model, q, dq, tau)
    names = ["dq_star", "M", "phi", "R_w", "p_w"]
    for name, a, b in zip(names, got, ref):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        err = float(jnp.max(jnp.abs(a - b))) / scale
        # dq_star goes through the n x n solve, whose conditioning
        # amplifies f32 assembly-order differences; the kinematic
        # quantities must agree at f32 roundoff
        tol = tol_state if name == "dq_star" else tol_kin
        assert err < tol, f"{name}: rel err {err:.2e} (tol {tol:.0e})"


def test_walker2d_planar_revolute():
    from dartenv_tpu.envs.walker2d import make_walker2d_task

    model = make_walker2d_task().model
    assert supported(model)
    _check(model)


def test_humanwalker_free_euler_universal_damped():
    """29-dof humanoid: FREE root, EULER/UNIVERSAL/REVOLUTE joints, joint
    damping through the implicit scheme."""
    from dartenv_tpu.envs.human_walker import make_humanwalker_task

    model = make_humanwalker_task().model
    assert supported(model)
    _check(model, B=4, tol_state=2e-3)


def test_builder_ball_screw_translational():
    """Remaining joint families on a synthetic chain: TRANSLATIONAL root,
    BALL mid-joint, SCREW end joint, with spring/damping on the screw."""
    b = ModelBuilder(dt=0.002)
    b.add_body("base", None, sm.TRANSLATIONAL, mass=2.0,
               inertia=box_inertia(2.0, (0.1, 0.1, 0.1)))
    b.add_body("mid", "base", sm.BALL, mass=1.0,
               inertia=box_inertia(1.0, (0.05, 0.2, 0.05)),
               pj_pos=(0.0, 0.3, 0.0), cj_pos=(0.0, -0.2, 0.0))
    b.add_body("tip", "mid", sm.SCREW, mass=0.5,
               inertia=box_inertia(0.5, (0.05, 0.05, 0.05)),
               axes=[(0.0, 0.0, 1.0), (0.0, 0.0, 0.1 / (2 * np.pi))],
               pj_pos=(0.0, 0.25, 0.0), damping=0.5, spring=2.0)
    model = b.finalize(dtype=jnp.float32)
    assert supported(model)
    _check(model, B=4)


def test_prismatic_universal_offset_frames():
    """PRISMATIC + UNIVERSAL with non-identity joint frames and a
    non-unit rotation axis (so3_exp(axis*q) angle-scaling semantics)."""
    c, s = np.cos(0.4), np.sin(0.4)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    b = ModelBuilder(dt=0.002)
    b.add_body("slide", None, sm.PRISMATIC, mass=1.5,
               inertia=box_inertia(1.5, (0.1, 0.1, 0.1)),
               axes=[(0.6, 0.8, 0.0)], pj_rot=rot)
    b.add_body("u", "slide", sm.UNIVERSAL, mass=0.8,
               inertia=box_inertia(0.8, (0.05, 0.15, 0.05)),
               axes=[(1.0, 0.0, 0.0), (0.0, 0.0, 2.0)],
               pj_pos=(0.0, 0.2, 0.0), cj_pos=(0.02, -0.1, 0.0),
               cj_rot=rot)
    model = b.finalize(dtype=jnp.float32)
    assert supported(model)
    _check(model, B=4)


def test_custom_vmap_phase_matches_inline():
    """make_dynamics_phase's single-env path is bit-identical to the
    inline XLA phase (CPU fallback semantics unchanged), and its vmapped
    CPU path matches vmap of the single path."""
    from dartenv_tpu.envs.hopper import make_hopper_task

    model = make_hopper_task().model
    dt = float(model.dt)
    phase = make_dynamics_phase(model, dt)
    assert phase is not None
    q, dq, tau = _rand_batch(model, 3, seed=1)

    # single env: exact equality with the inline formulation
    kin = batched.bkin(model, q[0], dq[0])
    ddq, M = batched.forward_dynamics(model, kin, q[0], dq[0], tau[0], dt,
                                      None)
    out = phase(q[0], dq[0], tau[0])
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  np.asarray(dq[0] + dt * ddq))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(M))

    # vmapped on CPU: the batching rule's XLA branch (jit both sides —
    # jit-vs-eager XLA:CPU fusion reassociates f32 sums at ~1e-4)
    outs = jax.jit(jax.vmap(phase))(q, dq, tau)
    refs = jax.jit(lambda a, b, c: _ref(model, a, b, c))(q, dq, tau)
    for a, b in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
