"""pydart2-parity facade tests (reference surface: SURVEY.md §2.3)."""
import numpy as np
import pytest

import dartenv_tpu as gym


@pytest.fixture(scope="module")
def env():
    e = gym.make("DartHopper-v1")
    e.reset()
    return e.unwrapped if hasattr(e, "unwrapped") else e


def test_skeleton_state_views(env):
    skel = env.robot_skeleton
    assert skel.ndofs == env.model.n
    q = skel.q
    assert q.shape == (skel.ndofs,)
    np.testing.assert_allclose(q, env.state_vector()[:skel.ndofs])
    # setter round-trips through env.set_state
    q2 = q + 0.01
    skel.set_positions(q2)
    np.testing.assert_allclose(skel.q, q2, atol=1e-12)
    assert skel.q_lower.shape == (skel.ndofs,)
    assert (skel.q_lower <= skel.q_upper).all()


def test_bodynodes_and_com(env):
    skel = env.robot_skeleton
    assert len(skel.bodynodes) == env.model.nb
    com = skel.com()
    assert com.shape == (3,)
    # whole-body COM is the mass-weighted mean of body COMs
    coms = np.stack([b.com() for b in skel.bodynodes])
    mass = np.array([b.mass() for b in skel.bodynodes])
    np.testing.assert_allclose(
        com, (mass[:, None] * coms).sum(0) / mass.sum(), rtol=1e-5, atol=1e-7
    )
    # named lookup
    assert skel.bodynode(skel.bodynodes[0].name) is skel.bodynodes[0]


def test_mass_matrix_and_coriolis(env):
    skel = env.robot_skeleton
    M = skel.M
    n = skel.ndofs
    assert M.shape == (n, n)
    np.testing.assert_allclose(M, M.T, atol=1e-5)
    assert np.linalg.eigvalsh(M).min() > 0
    c = skel.c
    assert c.shape == (n,)


def test_world_step_and_collision_result(env):
    env.reset()
    world = env.world
    assert world.dt == float(env.model.dt)
    skel = env.robot_skeleton
    skel.set_forces(np.zeros(skel.ndofs))
    # free fall until the hopper touches down; then contacts appear with
    # upward normal forces
    touched = False
    for _ in range(600):
        world.step()
        cr = world.collision_result
        if cr.num_contacts() > 0:
            touched = True
            f_up = sum(c.force[1] for c in cr.contacts)
            assert f_up > 0.0  # ground pushes up
            for c in cr.contacts:
                assert c.penetration_depth >= 0.0
                assert c.normal.shape == (3,)
            break
    assert touched


def test_add_ext_force(env):
    env.reset()
    skel = env.robot_skeleton
    # sideways force on the ROOT body (forces on distal bodies mostly fold
    # the leg joints rather than translate the root)
    v_before = skel.dq.copy()
    skel.bodynodes[0].add_ext_force([500.0, 0.0, 0.0])
    env.do_simulation(np.zeros(skel.ndofs), 1)
    dvx = skel.dq[0] - v_before[0]
    assert dvx > 0.02  # pushed along +x
    # force is cleared after the step (pydart2 semantics)
    v_mid = skel.dq.copy()
    env.do_simulation(np.zeros(skel.ndofs), 1)
    assert abs(skel.dq[0] - v_mid[0]) < abs(dvx)
