"""Unit tests for the spatial-algebra core (SURVEY.md §4: DART-style
internal-consistency tests, `unittests/testDynamics.cpp` † analogue)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.math import spatial as sp


RNG = np.random.RandomState(0)


def rand_vec(n=3):
    return jnp.asarray(RNG.randn(n), dtype=jnp.float32)


def rand_rot():
    return sp.so3_exp(rand_vec())


class TestQuat:
    def test_mul_identity(self):
        q = sp.quat_normalize(jnp.asarray(RNG.randn(4), dtype=jnp.float32))
        e = sp.quat_identity()
        np.testing.assert_allclose(sp.quat_mul(q, e), q, atol=1e-6)
        np.testing.assert_allclose(sp.quat_mul(e, q), q, atol=1e-6)

    def test_rotate_matches_matrix(self):
        q = sp.quat_normalize(jnp.asarray(RNG.randn(4), dtype=jnp.float32))
        v = rand_vec()
        R = sp.quat_to_mat(q)
        np.testing.assert_allclose(sp.quat_rotate(q, v), R @ v, atol=1e-5)

    def test_mat_quat_roundtrip(self):
        for _ in range(20):
            R = rand_rot()
            q = sp.mat_to_quat(R)
            np.testing.assert_allclose(sp.quat_to_mat(q), R, atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self):
        for scale in [1e-8, 1e-4, 0.1, 1.0, 3.0]:
            w = rand_vec()
            w = w / jnp.linalg.norm(w) * scale  # stay inside the pi-ball
            R = sp.so3_exp(w)
            np.testing.assert_allclose(sp.so3_log(R), w, atol=1e-4)

    def test_exp_quat_matches_exp(self):
        w = rand_vec()
        np.testing.assert_allclose(
            sp.quat_to_mat(sp.so3_exp_quat(w)), sp.so3_exp(w), atol=1e-5
        )

    def test_exp_small_angle(self):
        w = jnp.array([1e-10, 0.0, 0.0])
        R = sp.so3_exp(w)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
        assert np.all(np.isfinite(np.asarray(sp.so3_log(R))))


class TestPluecker:
    def test_motion_roundtrip(self):
        E, r, v = rand_rot(), rand_vec(), rand_vec(6)
        out = sp.xmotion_inv_apply(E, r, sp.xmotion_apply(E, r, v))
        np.testing.assert_allclose(out, v, atol=1e-5)

    def test_force_roundtrip(self):
        E, r, f = rand_rot(), rand_vec(), rand_vec(6)
        out = sp.xforce_inv_apply(E, r, sp.xforce_apply(E, r, f))
        np.testing.assert_allclose(out, f, atol=1e-5)

    def test_dense_matches_structural(self):
        E, r = rand_rot(), rand_vec()
        v, f = rand_vec(6), rand_vec(6)
        np.testing.assert_allclose(
            sp.xmotion_mat(E, r) @ v, sp.xmotion_apply(E, r, v), atol=1e-5
        )
        np.testing.assert_allclose(
            sp.xforce_mat(E, r) @ f, sp.xforce_apply(E, r, f), atol=1e-5
        )

    def test_force_is_inverse_transpose(self):
        E, r = rand_rot(), rand_vec()
        X = sp.xmotion_mat(E, r)
        Xs = sp.xforce_mat(E, r)
        np.testing.assert_allclose(
            Xs, jnp.linalg.inv(X).T, atol=1e-5
        )

    def test_power_invariance(self):
        # f . v is frame independent
        E, r = rand_rot(), rand_vec()
        v, f = rand_vec(6), rand_vec(6)
        p1 = jnp.dot(f, v)
        p2 = jnp.dot(sp.xforce_apply(E, r, f), sp.xmotion_apply(E, r, v))
        np.testing.assert_allclose(p1, p2, atol=1e-4)


class TestCross:
    def test_crf_is_neg_crm_transpose(self):
        v = rand_vec(6)
        m = jnp.eye(6, dtype=jnp.float32)
        crm_mat = jnp.stack([sp.crm(v, m[i]) for i in range(6)], axis=-1)
        crf_mat = jnp.stack([sp.crf(v, m[i]) for i in range(6)], axis=-1)
        np.testing.assert_allclose(crf_mat, -crm_mat.T, atol=1e-5)


class TestInertia:
    def test_kinetic_energy_positive(self):
        I = sp.spatial_inertia(
            jnp.asarray(2.0), rand_vec() * 0.1,
            jnp.asarray(np.diag([0.1, 0.2, 0.3]), dtype=jnp.float32),
        )
        for _ in range(10):
            v = rand_vec(6)
            assert float(v @ I @ v) > 0.0

    def test_com_shift(self):
        # point mass at com: momentum = m * v for pure translation
        m = 3.0
        com = jnp.array([0.5, -0.2, 0.1])
        I = sp.spatial_inertia(
            jnp.asarray(m), com, jnp.zeros((3, 3), dtype=jnp.float32)
        )
        v = jnp.array([0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
        h = I @ v
        np.testing.assert_allclose(h[3:], m * v[3:], atol=1e-5)
        np.testing.assert_allclose(h[:3], m * jnp.cross(com, v[3:]), atol=1e-5)
