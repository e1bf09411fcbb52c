"""Cross-check: production body-batched dynamics core (dynamics/batched.py)
against the readable per-body reference implementation
(dynamics/algorithms.py) on every joint-type combination."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.dynamics import algorithms as ref
from dartenv_tpu.dynamics import batched as bat
from dartenv_tpu.dynamics.joints import integrate_joint_position

from test_dynamics import MODELS


def _task_models():
    out = dict(MODELS)

    def hopper():
        from dartenv_tpu.envs.hopper import make_hopper_task
        return make_hopper_task(dtype=jnp.float64).model

    def walker():
        from dartenv_tpu.envs.walker2d import make_walker2d_task
        return make_walker2d_task(dtype=jnp.float64).model

    def human():
        from dartenv_tpu.envs.human_walker import make_humanwalker_task
        return make_humanwalker_task(dtype=jnp.float64).model

    out["hopper"] = hopper
    out["walker2d"] = walker
    out["humanwalker"] = human
    return out


ALL_MODELS = _task_models()


@pytest.mark.parametrize("name", list(ALL_MODELS))
def test_batched_matches_reference(name):
    model = ALL_MODELS[name]()
    rng = np.random.RandomState(11)
    for trial in range(3):
        q = jnp.asarray(rng.randn(model.n) * 0.4)
        dq = jnp.asarray(rng.randn(model.n) * 0.8)
        tau = jnp.asarray(rng.randn(model.n))

        kin_r = ref.fk(model, q, dq)
        kin_b = bat.bkin(model, q, dq)

        np.testing.assert_allclose(kin_b.R_w, kin_r.R_w, atol=1e-10)
        np.testing.assert_allclose(kin_b.p_w, kin_r.p_w, atol=1e-10)
        np.testing.assert_allclose(kin_b.v, kin_r.v, atol=1e-9)
        np.testing.assert_allclose(kin_b.S, kin_r.S, atol=1e-10)
        np.testing.assert_allclose(kin_b.Sdot, kin_r.Sdot, atol=1e-9)

        M_r = ref.crba(model, kin_r)
        M_b = bat.mass_matrix(model, kin_b)
        np.testing.assert_allclose(M_b, M_r, atol=1e-8)

        C_r = ref.rnea_bias(model, kin_r, dq)
        C_b = bat.bias_forces(model, kin_b)
        np.testing.assert_allclose(C_b, C_r, atol=1e-8)

        ddq_r, _ = ref.forward_dynamics_crb(model, kin_r, q, dq, tau,
                                            model.dt)
        ddq_b, _ = bat.forward_dynamics(model, kin_b, q, dq, tau, model.dt)
        np.testing.assert_allclose(ddq_b, ddq_r, atol=1e-7, rtol=1e-7)


@pytest.mark.parametrize("name", list(ALL_MODELS))
def test_batched_integration_matches_reference(name):
    model = ALL_MODELS[name]()
    rng = np.random.RandomState(12)
    q = jnp.asarray(rng.randn(model.n) * 0.3)
    dq = jnp.asarray(rng.randn(model.n))
    dt = 0.002
    out_b = bat.integrate_positions(model, q, dq, dt)
    ref_parts = []
    for i in range(model.nb):
        a, b = model.q_start[i], model.q_start[i] + model.ndof[i]
        if b > a:
            ref_parts.append(
                integrate_joint_position(model.joint_type[i],
                                         q[a:b], dq[a:b], dt)
            )
    out_r = jnp.concatenate(ref_parts)
    np.testing.assert_allclose(out_b, out_r, atol=1e-12)


def test_batched_phi_is_point_velocity_map():
    """J dq must reproduce FK body point velocities (world frame)."""
    model = ALL_MODELS["walker2d"]()
    rng = np.random.RandomState(13)
    q = jnp.asarray(rng.randn(model.n) * 0.3)
    dq = jnp.asarray(rng.randn(model.n))
    kin = bat.bkin(model, q, dq)
    Jm = bat.world_jacobians(model, kin)       # (nb, n, 6)
    for b in range(model.nb):
        v_w_from_J = Jm[b].T @ dq              # (6,) world at origin
        # body-frame velocity -> world spatial at origin
        from dartenv_tpu.math import spatial as sp
        v_w_ref = sp.xmotion_inv_apply(
            kin.R_w[b].T, kin.p_w[b], kin.v[b]
        )
        np.testing.assert_allclose(np.asarray(v_w_from_J),
                                   np.asarray(v_w_ref), atol=1e-9)
