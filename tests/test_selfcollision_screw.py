"""Screw joint + self-collision pair tests.

Reference coverage: `dart/dynamics/ScrewJoint.cpp` † (SURVEY.md §2.4 "Joint
hierarchy") and the primitive-pair narrowphase row of §2.4 "collision"
(capsule-capsule / sphere-sphere analytic pairs).
"""
import numpy as np
import jax
import jax.numpy as jnp

from dartenv_tpu.dynamics import batched
from dartenv_tpu.engine.world import init_state, make_sim_step
from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.model.builder import ModelBuilder, sphere_inertia


def _screw_model(pitch):
    b = ModelBuilder(dt=0.002, gravity=(0.0, 0.0, 0.0))
    b.add_body(
        "nut", None, sm.SCREW, axes=((0, 0, 1),), pitch=pitch,
        mass=1.0, inertia=np.eye(3) * 0.01,
    )
    return b.finalize(dtype=jnp.float64)


def test_screw_kinematics_pitch_coupling():
    """One full turn advances exactly `pitch` along the axis."""
    pitch = 0.04
    model = _screw_model(pitch)
    q = jnp.asarray([2.0 * np.pi])          # one revolution
    kin = batched.bkin(model, q, jnp.zeros(1, dtype=q.dtype))
    p = np.asarray(kin.p_w[0])
    np.testing.assert_allclose(p, [0.0, 0.0, pitch], atol=1e-12)
    # rotation back to identity after a full turn
    np.testing.assert_allclose(np.asarray(kin.R_w[0]), np.eye(3), atol=1e-12)


def test_screw_dynamics_energy():
    """Torque-free screw with initial rate conserves kinetic energy and the
    translation rate stays locked to pitch/(2*pi) * qdot."""
    import dataclasses

    model = _screw_model(0.1)
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    state = dataclasses.replace(state, dq=jnp.asarray([3.0]))
    tau = jnp.zeros(1)
    for _ in range(200):
        state, _ = step(state, tau)
    # S = [a; (pitch/2pi) a]: effective inertia = Izz + m*(pitch/2pi)^2,
    # no external forces -> qdot constant
    assert abs(float(state.dq[0]) - 3.0) < 1e-10
    np.testing.assert_allclose(
        float(state.q[0]), 3.0 * 200 * model.dt, rtol=1e-12
    )


def _two_sphere_model(gap=1.0, r=0.3):
    """Body A welded at origin, body B on a prismatic x joint; spheres of
    radius r on both; one self pair."""
    b = ModelBuilder(dt=0.002, gravity=(0.0, 0.0, 0.0))
    b.add_body("a", None, sm.WELD, mass=1.0,
               inertia=sphere_inertia(1.0, r))
    b.add_body("bb", None, sm.PRISMATIC, axes=((1, 0, 0),), mass=1.0,
               inertia=sphere_inertia(1.0, r), pj_pos=(gap, 0.0, 0.0))
    ga = b.add_geom("a", sm.GEOM_SPHERE, (r,))
    gb = b.add_geom("bb", sm.GEOM_SPHERE, (r,))
    b.add_self_pair(gb, ga)
    return b.finalize(dtype=jnp.float64)


def test_self_pair_sphere_sphere_stops_penetration():
    import dataclasses

    r = 0.3
    model = _two_sphere_model(gap=1.0, r=r)
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    # body B moving toward A at 5 m/s
    state = dataclasses.replace(state, dq=jnp.asarray([-5.0]))
    tau = jnp.zeros(1)
    hit = False
    for _ in range(400):
        state, contacts = step(state, tau)
        hit = hit or bool(np.any(np.asarray(contacts.active) > 0.5))
    # center distance must never drop (much) below 2r: contact held
    dist = 1.0 + float(state.q[0])
    assert hit
    assert dist >= 2 * r - 5e-3, dist
    # inelastic contact: the approach is killed; only the small ERP
    # pushout velocity may remain (separating, bounded by max_erv)
    dq = float(state.dq[0])
    assert -1e-6 < dq < 0.2, dq


def test_self_pair_capsule_capsule_contact_geometry():
    """Two crossed capsules: contact normal/depth from the segment-segment
    closest points."""
    from dartenv_tpu.collision.narrowphase import collide

    b = ModelBuilder(dt=0.002, gravity=(0.0, 0.0, 0.0))
    # capsule A along z at origin
    b.add_body("a", None, sm.WELD, mass=1.0)
    # capsule B along x (rot y by 90deg maps z->x), above A by 0.35
    b.add_body("bb", None, sm.TRANSLATIONAL, mass=1.0,
               pj_pos=(0.0, 0.35, 0.0))
    ga = b.add_geom("a", sm.GEOM_CAPSULE, (0.2, 0.5))
    Ry = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
    gb = b.add_geom("bb", sm.GEOM_CAPSULE, (0.2, 0.5), rot=Ry)
    b.add_self_pair(gb, ga)
    model = b.finalize(dtype=jnp.float64)

    kin = batched.bkin(model, model.q_init, model.dq_init)
    contacts = collide(model, kin.R_w, kin.p_w)
    # world slots: none (no ground); 1 self slot
    assert contacts.depth.shape[0] == 1
    # segment distance = 0.35, radii sum 0.4 -> depth 0.05
    np.testing.assert_allclose(float(contacts.depth[0]), 0.05, atol=1e-12)
    # normal points from A toward B's body (body_a of the pair = bb): +y
    np.testing.assert_allclose(
        np.asarray(contacts.normal[0]), [0.0, 1.0, 0.0], atol=1e-12
    )


def test_self_pair_common_ancestor_cancels():
    """Dofs upstream of BOTH bodies of a self pair get zero Jacobian rows
    (the signed slot mask): the base joint feels no net contact impulse
    torque component from an internal contact along its motion direction."""
    from dartenv_tpu.engine.constraints import build_layout

    b = ModelBuilder(dt=0.002, gravity=(0.0, 0.0, 0.0))
    b.add_body("root", None, sm.PRISMATIC, axes=((1, 0, 0),), mass=1.0)
    b.add_body("c1", "root", sm.PRISMATIC, axes=((0, 1, 0),), mass=1.0)
    b.add_body("c2", "root", sm.PRISMATIC, axes=((0, 1, 0),), mass=1.0)
    g1 = b.add_geom("c1", sm.GEOM_SPHERE, (0.1,))
    g2 = b.add_geom("c2", sm.GEOM_SPHERE, (0.1,))
    b.add_self_pair(g1, g2)
    model = b.finalize(dtype=jnp.float64)
    layout = build_layout(model)
    # slot 0: bodies c1 (dofs 0,1) vs c2 (dofs 0,2) -> root dof 0 cancels
    np.testing.assert_allclose(layout.slot_mask[0], [0.0, 1.0, -1.0])
