"""Collision-matrix closure: box-box / box-capsule / box-sphere self pairs
and cylinder/ellipsoid-vs-halfspace (VERDICT.md r1 missing #2 / next #6).

Reference: `dart/collision/dart/DARTCollide.cpp` † (ODE-derived box-box SAT
with face clipping), FCL convex pairs (SURVEY.md §2.4 "collision").
Engine-level scenarios check statics: bodies dropped onto each other come
to rest in the analytically-correct pose.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dartenv_tpu.engine.world import init_state, make_sim_step
from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.model.builder import (
    ModelBuilder, box_inertia, capsule_inertia, cylinder_inertia,
    ellipsoid_inertia, sphere_inertia,
)


def _settle(model, n_steps=600):
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    tau = jnp.zeros(model.n, dtype=jnp.float64)
    for _ in range(n_steps):
        state, contacts = step(state, tau)
    return state, contacts


# ---------------------------------------------------------------------------
# primitive-vs-halfspace: cylinder and ellipsoid
# ---------------------------------------------------------------------------

def _drop_model(gtype, size, inertia, q_init_y, rot=None):
    b = ModelBuilder(dt=0.002)
    b.add_body("b", None, sm.TRANSLATIONAL, mass=1.0, inertia=inertia,
               q_init=[0.0, q_init_y, 0.0])
    b.add_geom("b", gtype, size, rot=rot, friction=1.0)
    b.add_ground()
    return b.finalize(dtype=jnp.float64)


def test_cylinder_rests_on_side():
    # axis = local z = world z -> lying on its side; rest height = radius
    model = _drop_model(sm.GEOM_CYLINDER, (0.3, 0.5),
                        cylinder_inertia(1.0, 0.3, 1.0), 0.6)
    state, contacts = _settle(model)
    assert abs(float(state.q[1]) - 0.3) < 5e-3         # rests at y = r
    assert float(jnp.sum(contacts.active)) >= 2        # line contact


def test_cylinder_rests_on_end():
    # rotate axis to world y -> standing on an end cap; rest height = half_h
    rot = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])  # z -> y
    model = _drop_model(sm.GEOM_CYLINDER, (0.3, 0.5),
                        cylinder_inertia(1.0, 0.3, 1.0), 0.7, rot=rot)
    state, contacts = _settle(model)
    assert abs(float(state.q[1]) - 0.5) < 5e-3         # rests at y = half_h
    assert float(jnp.sum(contacts.active)) >= 3        # disc manifold


def test_ellipsoid_rests_on_halfspace():
    radii = (0.1, 0.3, 0.2)
    model = _drop_model(sm.GEOM_ELLIPSOID, radii,
                        ellipsoid_inertia(1.0, radii), 0.5)
    state, _ = _settle(model)
    assert abs(float(state.q[1]) - 0.3) < 5e-3         # rests on y semi-axis


# ---------------------------------------------------------------------------
# self pairs involving boxes
# ---------------------------------------------------------------------------

def _two_body_model(top_gtype, top_size, top_inertia, drop_h,
                    bottom_half=(0.5, 0.2, 0.5), rot=None):
    """Fixed bottom box + free-falling top geom with a self pair."""
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=box_inertia(10.0, bottom_half))
    g0 = b.add_geom("bottom", sm.GEOM_BOX, bottom_half)
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=top_inertia, q_init=[0.0, drop_h, 0.0])
    g1 = b.add_geom("top", top_gtype, top_size, rot=rot, friction=1.0)
    b.add_self_pair(g1, g0)
    return b.finalize(dtype=jnp.float64)


def test_box_rests_on_box():
    """The VERDICT 'box feet on box' scenario: a box dropped on a fixed box
    settles face-on-face at the exact stacking height, multi-point
    manifold, no jitter."""
    half = (0.15, 0.1, 0.15)
    model = _two_body_model(sm.GEOM_BOX, half, box_inertia(1.0, half), 0.5)
    state, contacts = _settle(model)
    # rest: top box center at bottom_top(0.2) + 0.1 = 0.3
    assert abs(float(state.q[1]) - 0.3) < 5e-3
    assert float(jnp.sum(contacts.active)) >= 3       # face manifold
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2   # at rest


def test_box_box_offset_stack():
    """Partial overlap: the manifold covers the overlap region and the box
    still settles at stack height (no fall-through, no explosion)."""
    half = (0.15, 0.1, 0.15)
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=box_inertia(10.0, (0.5, 0.2, 0.5)))
    g0 = b.add_geom("bottom", sm.GEOM_BOX, (0.5, 0.2, 0.5))
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=box_inertia(1.0, half),
               q_init=[0.4, 0.5, 0.0])     # hangs over the edge by 0.05
    g1 = b.add_geom("top", sm.GEOM_BOX, half)
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)
    state, contacts = _settle(model)
    assert abs(float(state.q[1]) - 0.3) < 5e-3
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_capsule_rests_on_box():
    # capsule axis local z = world z, lying flat on the box top
    model = _two_body_model(
        sm.GEOM_CAPSULE, (0.1, 0.25), capsule_inertia(1.0, 0.1, 0.25), 0.5)
    state, contacts = _settle(model)
    assert abs(float(state.q[1]) - 0.3) < 5e-3         # 0.2 + r
    assert float(jnp.sum(contacts.active)) >= 2        # both endpoints
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_sphere_rests_on_box():
    model = _two_body_model(
        sm.GEOM_SPHERE, (0.12,), sphere_inertia(1.0, 0.12), 0.5)
    state, contacts = _settle(model)
    assert abs(float(state.q[1]) - 0.32) < 5e-3        # 0.2 + r
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_box_box_edge_contact():
    """45-degree rotated box dropping an edge onto the flat box: the
    contact normal is the exact face normal (+y) and the box settles with
    its lowest EDGE exactly on the face (VERDICT.md r3 weak #3: the old
    assertion was only 'doesn't fall through')."""
    half = (0.15, 0.15, 0.15)
    th = np.pi / 4
    rot = np.array([[1, 0, 0],
                    [0, np.cos(th), -np.sin(th)],
                    [0, np.sin(th), np.cos(th)]])
    model = _two_body_model(sm.GEOM_BOX, half, box_inertia(1.0, half),
                            0.6, rot=rot)
    state, contacts = _settle(model, n_steps=600)
    # analytic rest pose: the rotated box's lowest edge sits on the face;
    # half-extent along y at 45 deg = 0.15*(cos+sin) = 0.15*sqrt(2)
    rest_y = 0.2 + 0.15 * np.sqrt(2.0)
    assert abs(float(state.q[1]) - rest_y) < 5e-3, float(state.q[1])
    assert float(jnp.sum(contacts.active)) >= 1
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2
    # active contact normals are exactly +y (edge-on-face MTV)
    act = np.asarray(contacts.active) > 0.5
    nrm = np.asarray(contacts.normal)[act]
    np.testing.assert_allclose(
        nrm, np.broadcast_to([0.0, 1.0, 0.0], nrm.shape), atol=1e-6)


def test_capsule_rests_on_box_edge():
    """Capsule lying across a box's top EDGE (axis ⟂ the edge): the
    contact resolves along +y with the capsule resting exactly radius
    above the edge line (VERDICT.md r3 order #5 capsule-on-box-edge)."""
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=box_inertia(10.0, (0.5, 0.2, 0.5)))
    g0 = b.add_geom("bottom", sm.GEOM_BOX, (0.5, 0.2, 0.5))
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=capsule_inertia(1.0, 0.1, 0.25),
               # centered over the box's +x top edge (x = 0.5, y = 0.2,
               # edge line along z); capsule axis local z -> world z is
               # PARALLEL to that edge, so rotate axis to world x
               q_init=[0.5, 0.5, 0.0])
    rot = np.array([[0.0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]])  # z -> x
    g1 = b.add_geom("top", sm.GEOM_CAPSULE, (0.1, 0.25), rot=rot,
                    friction=1.0)
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)
    state, contacts = _settle(model)
    # rest: edge height 0.2 + radius 0.1; x stays pinned over the edge
    assert abs(float(state.q[1]) - 0.3) < 5e-3, float(state.q[1])
    assert abs(float(state.q[0]) - 0.5) < 2e-2, float(state.q[0])
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2
    act = np.asarray(contacts.active) > 0.5
    nrm = np.asarray(contacts.normal)[act]
    assert act.any()
    # every active normal points essentially straight up
    assert (nrm @ np.array([0.0, 1.0, 0.0]) > 0.99).all(), nrm


# ---------------------------------------------------------------------------
# contact_cap overflow surfacing
# ---------------------------------------------------------------------------

def test_contact_cap_overflow_reported():
    """Two boxes flat on the ground = 8 active slots; cap=2 must (a) still
    simulate without NaNs and (b) report overflow = active - cap via
    Contacts.overflow / step info (VERDICT.md r1 weak #3)."""
    import dataclasses

    b = ModelBuilder(dt=0.002)
    b.add_body("b", None, sm.TRANSLATIONAL, mass=1.0,
               inertia=box_inertia(1.0, (0.1, 0.1, 0.1)),
               q_init=[0.0, 0.05, 0.0])
    b.add_geom("b", sm.GEOM_BOX, (0.1, 0.1, 0.1), pos=(-0.3, 0, 0))
    b.add_geom("b", sm.GEOM_BOX, (0.1, 0.1, 0.1), pos=(0.3, 0, 0))
    b.add_ground()
    model = b.finalize(dtype=jnp.float64)
    model = model.replace(
        solver=dataclasses.replace(model.solver, contact_cap=2))

    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    tau = jnp.zeros(model.n, dtype=jnp.float64)
    max_overflow = 0.0
    for _ in range(50):
        state, contacts = step(state, tau)
        max_overflow = max(max_overflow, float(contacts.overflow))
    assert max_overflow >= 6.0              # 8 active - cap 2
    assert bool(jnp.all(jnp.isfinite(state.q)))

    # the same field reaches env users through step info
    from dartenv_tpu.envs.base import Task, make_env_reset, make_env_step

    class _T(Task):
        frame_skip = 2
        obs_size = 6
        control_bounds = np.array([[1.0] * 3, [-1.0] * 3])

        def action_to_tau(self, a, aux):
            return jnp.zeros(self.model.n, dtype=a.dtype)

        def obs(self, sim, aux):
            return sim.state_vector()

        def reward(self, sim_prev, sim, a, contacts, aux):
            return jnp.asarray(0.0, dtype=sim.q.dtype)

        def done(self, sim, aux):
            return jnp.asarray(False)

    task = _T(model)
    st, _ = make_env_reset(task)(jax.random.PRNGKey(0))
    st, _, _, _, info = jax.jit(make_env_step(task))(
        st, jnp.zeros(3, dtype=jnp.float64))
    assert float(info["contact_overflow"]) >= 6.0


# ---------------------------------------------------------------------------
# general convex pairs: swept-cloud direction-set SAT (collision/support.py)
# VERDICT.md r2 order #6 — the walls at mesh-vs-primitive / mesh-mesh and
# cylinder/ellipsoid self pairs are gone; reference: FCL GJK convex pairs
# (`dart/collision/**` †).
# ---------------------------------------------------------------------------

def _mesh_box_verts(half):
    hx, hy, hz = half
    return np.array([[sx * hx, sy * hy, sz * hz]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])


def test_mesh_rests_on_box():
    """Mesh feet on a box: a box-shaped convex vertex cloud dropped onto a
    fixed box settles at exact stack height (the r2 hard-raise scenario)."""
    half = (0.15, 0.1, 0.15)
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=box_inertia(10.0, (0.5, 0.2, 0.5)))
    g0 = b.add_geom("bottom", sm.GEOM_BOX, (0.5, 0.2, 0.5))
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=box_inertia(1.0, half), q_init=[0.0, 0.5, 0.0])
    g1 = b.add_mesh_geom("top", _mesh_box_verts(half), friction=1.0)
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)
    state, contacts = _settle(model)
    assert abs(float(state.q[1]) - 0.3) < 5e-3
    assert float(jnp.sum(contacts.active)) >= 3       # face manifold
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_mesh_rests_on_mesh():
    half = (0.15, 0.1, 0.15)
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=box_inertia(10.0, (0.5, 0.2, 0.5)))
    g0 = b.add_mesh_geom("bottom", _mesh_box_verts((0.5, 0.2, 0.5)))
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=box_inertia(1.0, half), q_init=[0.0, 0.5, 0.0])
    g1 = b.add_mesh_geom("top", _mesh_box_verts(half), friction=1.0)
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)
    state, contacts = _settle(model)
    assert abs(float(state.q[1]) - 0.3) < 5e-3
    assert float(jnp.sum(contacts.active)) >= 3
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_capsule_rests_on_mesh():
    """Capsule (sphere-swept 2-point cloud) on a mesh box top face."""
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=box_inertia(10.0, (0.5, 0.2, 0.5)))
    g0 = b.add_mesh_geom("bottom", _mesh_box_verts((0.5, 0.2, 0.5)))
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=capsule_inertia(1.0, 0.1, 0.3),
               q_init=[0.0, 0.6, 0.0])
    # axis = local z = world z: capsule lies horizontally on the face
    g1 = b.add_geom("top", sm.GEOM_CAPSULE, (0.1, 0.15), friction=1.0)
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)
    state, contacts = _settle(model)
    # rest: box top (0.2) + capsule radius 0.1 = 0.3
    assert abs(float(state.q[1]) - 0.3) < 5e-3
    assert float(jnp.sum(contacts.active)) >= 1
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_cylinder_rests_on_cylinder():
    """Cylinder-cylinder self pair (r2 hard-raise): crossed cylinders
    settle at r_top + r_bottom above the bottom axis."""
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=cylinder_inertia(10.0, 0.2, 1.0))
    # bottom axis along world x
    rotx = np.array([[0.0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]])
    g0 = b.add_geom("bottom", sm.GEOM_CYLINDER, (0.2, 0.5), rot=rotx)
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=cylinder_inertia(1.0, 0.15, 1.0),
               q_init=[0.0, 0.6, 0.0])
    # top axis along world z -> crossed
    g1 = b.add_geom("top", sm.GEOM_CYLINDER, (0.15, 0.5), friction=1.0)
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)
    state, contacts = _settle(model)
    # rim-polygon clouds under-estimate the radius by ~(1 - cos(pi/12)) r;
    # allow 2% of the stack height
    assert abs(float(state.q[1]) - 0.35) < 1.5e-2
    assert float(jnp.sum(contacts.active)) >= 1
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_ellipsoid_rests_on_box():
    """Ellipsoid-box self pair via the icosphere shell cloud."""
    radii = (0.15, 0.25, 0.2)
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=box_inertia(10.0, (0.5, 0.2, 0.5)))
    g0 = b.add_geom("bottom", sm.GEOM_BOX, (0.5, 0.2, 0.5))
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=ellipsoid_inertia(1.0, radii),
               q_init=[0.0, 0.7, 0.0])
    g1 = b.add_geom("top", sm.GEOM_ELLIPSOID, radii, friction=1.0)
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)
    state, contacts = _settle(model)
    # icosahedron shell under-estimates the 0.25 semi-axis by up to ~5%
    assert abs(float(state.q[1]) - 0.45) < 2.5e-2
    assert float(jnp.sum(contacts.active)) >= 1
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_sat_edge_edge_normal_exact():
    """Generic edge-edge crossing of two box clouds: the swept-cloud SAT
    returns the exact MTV from its frame-axis cross products — the true
    minimal axis here is ~7 degrees away from EVERY grid/frame-axis
    candidate, so this fails without the cross-product axes
    (VERDICT.md r3 missing #3 / order #5)."""
    from dartenv_tpu.collision.support import sat_pair

    def _Rx(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def _Rz(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    corners = np.array([[sx, sy, sz] for sx in (-1, 1)
                        for sy in (-1, 1) for sz in (-1, 1)], float)
    RB = np.eye(3)
    ptsB = corners * 0.5                       # axis-aligned half-0.5 box
    RA = _Rx(0.2) @ _Rz(0.15)
    pA = np.array([0.5, 0.0, 0.5]) + 0.12 * np.array([1, 0, 1]) / np.sqrt(2)
    ptsA = pA + (corners * 0.1) @ RA.T         # tilted half-0.1 box

    # analytic MTV: A's near-vertical edge (RA @ y) crossing B's vertical
    # edge (y) -> normal = cross of the edge directions (pointing B -> A)
    n_ref = np.cross(RA @ np.array([0.0, 1.0, 0.0]),
                     np.array([0.0, 1.0, 0.0]))
    n_ref = -n_ref / np.linalg.norm(n_ref)     # orient toward A (+x, +z)
    pen_ref = (ptsB @ n_ref).max() - (ptsA @ n_ref).min()
    assert pen_ref > 0.01                      # genuinely penetrating

    one = jnp.ones((8,), jnp.float64)
    zero = jnp.zeros((), jnp.float64)
    pos, n, dep = sat_pair(
        jnp.asarray(ptsA), zero, one, jnp.asarray(ptsB), zero, one,
        jnp.asarray(RA), jnp.asarray(RB))
    n = np.asarray(n)
    # exact MTV direction (within f64 roundoff), exact penetration
    assert float(n @ n_ref) > 0.99996, (n, n_ref)   # < 0.5 deg
    np.testing.assert_allclose(float(dep[0]), pen_ref, atol=1e-9)


def test_mesh_rests_on_box_rotated():
    """SAT pair under a 45-degree yaw: the contact normal comes from the
    frame-axis candidate set, so rotated face contacts stay exact."""
    import math
    half = (0.15, 0.1, 0.15)
    yaw = math.pi / 4
    Ry = np.array([[math.cos(yaw), 0, math.sin(yaw)],
                   [0, 1.0, 0],
                   [-math.sin(yaw), 0, math.cos(yaw)]])
    b = ModelBuilder(dt=0.002)
    b.add_body("bottom", None, sm.WELD, mass=10.0,
               inertia=box_inertia(10.0, (0.5, 0.2, 0.5)))
    g0 = b.add_geom("bottom", sm.GEOM_BOX, (0.5, 0.2, 0.5))
    b.add_body("top", "bottom", sm.TRANSLATIONAL, mass=1.0,
               inertia=box_inertia(1.0, half), q_init=[0.0, 0.5, 0.0])
    # yawed mesh box: vertical faces no longer world-axis aligned
    verts = _mesh_box_verts(half) @ Ry.T
    g1 = b.add_mesh_geom("top", verts, friction=1.0)
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)
    state, contacts = _settle(model)
    assert abs(float(state.q[1]) - 0.3) < 5e-3
    assert float(jnp.sum(contacts.active)) >= 3
    assert float(jnp.max(jnp.abs(state.dq))) < 1e-2


def test_sat_cylinder_rim_rim_exact():
    """Rim-rim crossing of two tilted cylinders: the true MTV lies
    BETWEEN the grid/frame-axis candidates (old SAT under/over-estimates
    penetration by >10% and snaps the normal), and the per-geom polytope
    feature axes (feature_dirs: 12-gon prism face normals + rim-edge
    tangent cross products) recover it exactly for the cloud geometry
    (VERDICT r4 missing #3).  Reference: dense 400k-direction sampling
    of the same clouds in f64."""
    from dartenv_tpu.collision.support import (
        feature_dirs, sat_pair, swept_cloud,
    )
    from dartenv_tpu.model.builder import ModelBuilder, cylinder_inertia

    b = ModelBuilder(dt=0.002)
    b.add_body("a", None, sm.WELD, mass=1.0,
               inertia=cylinder_inertia(1.0, 0.3, 1.0))
    g0 = b.add_geom("a", sm.GEOM_CYLINDER, (0.3, 0.5))
    b.add_body("c", "a", sm.TRANSLATIONAL, mass=1.0,
               inertia=cylinder_inertia(1.0, 0.3, 1.0))
    g1 = b.add_geom("c", sm.GEOM_CYLINDER, (0.3, 0.5))
    b.add_self_pair(g1, g0)
    model = b.finalize(dtype=jnp.float64)

    def _Rx(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def _Rz(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    RA = jnp.asarray(_Rx(0.7) @ _Rz(0.4))
    pA = jnp.asarray([0.25, 0.72, 0.1])
    RB = jnp.asarray(np.eye(3))
    ptsA, rA, mA = swept_cloud(model, g1, RA, pA)
    ptsB, rB, mB = swept_cloud(model, g0, RB, jnp.zeros(3))

    # dense reference MTV over the actual clouds
    N = 400000
    i = np.arange(N) + 0.5
    ph = np.arccos(1 - 2 * i / N)
    th = np.pi * (1 + 5 ** 0.5) * i
    D = np.stack([np.cos(th) * np.sin(ph), np.sin(th) * np.sin(ph),
                  np.cos(ph)], 1)
    pa_, pb_ = np.asarray(ptsA), np.asarray(ptsB)
    pen = pb_.dot(D.T).max(0) - pa_.dot(D.T).min(0)
    j = int(pen.argmin())
    pen_ref, n_ref = float(pen[j]), D[j]
    assert pen_ref > 0.02, "pose not penetrating — test is vacuous"

    pos, n, dep = sat_pair(ptsA, rA, mA, ptsB, rB, mB, RA, RB,
                           featA=feature_dirs(model, g1),
                           featB=feature_dirs(model, g0))
    n = np.asarray(n)
    # the polytope-SAT axis set contains the exact MTV: penetration can
    # only be <= the dense estimate (which quantizes at ~0.3 deg)
    assert float(dep[0]) <= pen_ref * 1.0001, (float(dep[0]), pen_ref)
    assert float(dep[0]) >= pen_ref * 0.98
    assert abs(float(n @ n_ref)) > 0.9999, (n, n_ref)

    # non-vacuous: without the feature axes the old candidate set
    # misses the MTV by far more than the dense-sampling tolerance
    _, _, dep_old = sat_pair(ptsA, rA, mA, ptsB, rB, mB, RA, RB)
    assert abs(float(dep_old[0]) - pen_ref) > 0.02 * pen_ref
