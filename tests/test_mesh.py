"""Convex-mesh collision geoms (GEOM_MESH).

The reference collides mesh shapes through assimp + FCL BVH models
(`dart/dynamics/MeshShape.cpp` †, SURVEY.md §2.4 "Shapes"); here a mesh is
a convex vertex cloud baked into the SkelModel and collided against
halfspaces with the same deepest-k manifold rule as boxes.  A cube given
as an 8-vertex mesh must therefore behave identically to the same cube
given as GEOM_BOX.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.model.builder import (
    ModelBuilder, box_inertia, mesh_inertia,
)
from dartenv_tpu.model.skel_model import FREE, GEOM_BOX
from dartenv_tpu.engine.world import init_state, make_sim_step


CUBE_HALF = 0.1


def _cube_verts(half=CUBE_HALF):
    return np.array([[sx, sy, sz] for sx in (-1.0, 1.0)
                     for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]) * half


def _falling_model(use_mesh: bool, extra_interior_vert=False):
    b = ModelBuilder(dt=0.002)
    b.add_body("cube", parent=None, joint_type=FREE, mass=1.0,
               inertia=box_inertia(1.0, np.full(3, CUBE_HALF)),
               q_init=[0, 0, 0, 0, 0.5, 0])   # drop from y = 0.5
    if use_mesh:
        verts = _cube_verts()
        if extra_interior_vert:
            verts = np.concatenate([verts, np.zeros((1, 3))])
        b.add_mesh_geom("cube", verts)
    else:
        b.add_geom("cube", GEOM_BOX, np.full(3, CUBE_HALF))
    b.add_ground()
    return b.finalize(dtype=jnp.float64)


def _drop(model, substeps=400):
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    tau = jnp.zeros(model.n, dtype=jnp.float64)
    qs = []
    for _ in range(substeps):
        state, contacts = step(state, tau)
        qs.append(np.asarray(state.q))
    return np.stack(qs), state


def test_mesh_cube_matches_box_cube():
    """An 8-vertex cube mesh falls and settles exactly like GEOM_BOX (the
    box corner manifold IS the mesh vertex manifold for a cube)."""
    q_box, _ = _drop(_falling_model(use_mesh=False))
    q_mesh, _ = _drop(_falling_model(use_mesh=True))
    np.testing.assert_allclose(q_mesh, q_box, atol=1e-12)


def test_mesh_interior_vertices_are_inert():
    """Padding/interior vertices never enter the manifold."""
    q_plain, _ = _drop(_falling_model(use_mesh=True))
    q_extra, _ = _drop(_falling_model(use_mesh=True,
                                      extra_interior_vert=True))
    np.testing.assert_allclose(q_extra, q_plain, atol=1e-12)


def test_mesh_cube_settles_on_ground():
    model = _falling_model(use_mesh=True)
    _, state = _drop(model, substeps=600)
    q = np.asarray(state.q)
    dq = np.asarray(state.dq)
    # resting height = half extent (contact allowance ~ 0)
    assert abs(q[4] - CUBE_HALF) < 5e-3, f"rest height {q[4]}"
    assert np.abs(dq).max() < 1e-2


def test_mesh_inertia_of_cube_is_box_inertia():
    got = mesh_inertia(2.0, _cube_verts())
    want = box_inertia(2.0, np.full(3, CUBE_HALF))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_obj_and_stl_loaders(tmp_path):
    from dartenv_tpu.model.mesh_loader import load_mesh

    verts = _cube_verts()
    obj = "\n".join("v {} {} {}".format(*v) for v in verts) + "\nf 1 2 3\n"
    p_obj = tmp_path / "cube.obj"
    p_obj.write_text(obj)
    got = load_mesh(p_obj)
    np.testing.assert_allclose(np.sort(got, axis=0),
                               np.sort(verts, axis=0), atol=0)

    # binary STL with one triangle
    import struct
    tri = verts[:3]
    blob = b"\0" * 80 + struct.pack("<I", 1)
    blob += struct.pack("<3f", 0, 0, 1)
    for v in tri:
        blob += struct.pack("<3f", *v)
    blob += struct.pack("<H", 0)
    p_stl = tmp_path / "tri.stl"
    p_stl.write_bytes(blob)
    got = load_mesh(p_stl)
    np.testing.assert_allclose(np.sort(got, axis=0),
                               np.sort(np.asarray(tri, np.float64), axis=0),
                               atol=1e-6)

    # scale flows through
    got2 = load_mesh(p_obj, scale=2.0)
    assert np.allclose(np.abs(got2), 2 * CUBE_HALF)


def test_urdf_mesh_geom(tmp_path):
    from dartenv_tpu.model.urdf_loader import parse_urdf
    from dartenv_tpu.model.skel_model import GEOM_MESH

    p_obj = tmp_path / "cube.obj"
    p_obj.write_text("\n".join(
        "v {} {} {}".format(*v) for v in _cube_verts()))
    urdf = f"""
    <robot name="meshbot">
      <link name="base">
        <inertial><mass value="1.0"/>
          <inertia ixx="0.01" iyy="0.01" izz="0.01"
                   ixy="0" ixz="0" iyz="0"/></inertial>
        <collision><geometry><mesh filename="{p_obj}"/></geometry></collision>
      </link>
    </robot>"""
    model = parse_urdf(urdf, ground=True, dtype=jnp.float64)
    gt = np.asarray(model.geom_type)
    assert (gt == GEOM_MESH).sum() == 1
    assert model.mesh_verts.shape == (1, 8, 3)
    # it simulates: drops and stays finite
    step = jax.jit(make_sim_step(model))
    state = init_state(model)
    tau = jnp.zeros(model.n, dtype=jnp.float64)
    for _ in range(50):
        state, _ = step(state, tau)
    assert bool(jnp.all(jnp.isfinite(state.q)))


def test_skel_mesh_geom(tmp_path):
    from dartenv_tpu.model.skel_parser import parse_skel
    from dartenv_tpu.model.skel_model import GEOM_MESH

    p_obj = tmp_path / "cube.obj"
    p_obj.write_text("\n".join(
        "v {} {} {}".format(*v) for v in _cube_verts()))
    skel = f"""
    <skel><world name="w">
      <physics><time_step>0.002</time_step>
        <gravity>0 -9.81 0</gravity></physics>
      <skeleton name="robot">
        <body name="b1">
          <inertia><mass>1.0</mass></inertia>
          <collision_shape>
            <geometry><mesh><file_name>cube.obj</file_name></mesh></geometry>
          </collision_shape>
        </body>
        <joint type="free" name="root"><parent>world</parent>
          <child>b1</child></joint>
      </skeleton>
    </world></skel>"""
    p_skel = tmp_path / "mesh.skel"
    p_skel.write_text(skel)
    world = parse_skel(str(p_skel), dtype=jnp.float64)
    model = world.robot
    gt = np.asarray(model.geom_type)
    assert (gt == GEOM_MESH).sum() == 1
    assert model.mesh_verts.shape[0] == 1


def test_mesh_vmapped():
    """Mesh collision under vmap (the production batching path)."""
    model = _falling_model(use_mesh=True)
    step = make_sim_step(model)
    B = 8
    state = init_state(model)
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), state)
    tau = jnp.zeros((B, model.n), dtype=jnp.float64)
    vstep = jax.jit(jax.vmap(step))
    for _ in range(100):
        bstate, _ = vstep(bstate, tau)
    assert bool(jnp.all(jnp.isfinite(bstate.q)))
    # all identical envs agree
    np.testing.assert_allclose(np.asarray(bstate.q[0]),
                               np.asarray(bstate.q[-1]), atol=0)
