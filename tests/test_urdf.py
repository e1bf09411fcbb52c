"""URDF loader tests (reference: `dart/utils/urdf/DartLoader.cpp` † —
SURVEY.md §2.4 "utils: parsers")."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.dynamics import batched
from dartenv_tpu.engine.world import init_state, make_sim_step
from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.model.urdf_loader import parse_urdf

PENDULUM = """
<robot name="double_pendulum">
  <link name="base">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="upper">
    <inertial><origin xyz="0 -0.5 0"/><mass value="2.0"/>
      <inertia ixx="0.1" iyy="0.01" izz="0.1" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><origin xyz="0 -0.5 0"/>
      <geometry><sphere radius="0.05"/></geometry>
    </collision>
  </link>
  <link name="lower">
    <inertial><origin xyz="0 -0.4 0"/><mass value="1.0"/>
      <inertia ixx="0.05" iyy="0.01" izz="0.05" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="shoulder" type="continuous">
    <origin xyz="0 2.0 0"/>
    <parent link="base"/><child link="upper"/>
    <axis xyz="0 0 1"/>
    <dynamics damping="0.1"/>
  </joint>
  <joint name="elbow" type="revolute">
    <origin xyz="0 -1.0 0"/>
    <parent link="base_dummy_never"/><child link="lower"/>
    <axis xyz="0 0 1"/>
    <limit lower="-2.0" upper="2.0" effort="10" velocity="5"/>
  </joint>
</robot>
"""
# fix the elbow's parent (kept wrong above to exercise the cycle check in a
# second test)
PENDULUM_OK = PENDULUM.replace("base_dummy_never", "upper")


def test_urdf_parse_topology_limits():
    m = parse_urdf(PENDULUM_OK, dtype=jnp.float64, root_joint=sm.WELD)
    assert m.nb == 3 and m.n == 2
    assert m.joint_type == (sm.WELD, sm.REVOLUTE, sm.REVOLUTE)
    # continuous joint: unlimited; revolute: [-2, 2]
    np.testing.assert_allclose(np.asarray(m.limited), [0.0, 1.0])
    assert float(m.q_lower[1]) == -2.0 and float(m.q_upper[1]) == 2.0
    assert float(m.damping[0]) == 0.1
    # joint origins -> pj translation
    kin = batched.bkin(m, m.q_init, m.dq_init)
    p = np.asarray(kin.p_w)
    np.testing.assert_allclose(p[1], [0.0, 2.0, 0.0], atol=1e-15)
    np.testing.assert_allclose(p[2], [0.0, 1.0, 0.0], atol=1e-15)


def test_urdf_bad_tree_rejected():
    with pytest.raises(ValueError):
        parse_urdf(PENDULUM, dtype=jnp.float64, root_joint=sm.WELD)


def test_urdf_pendulum_energy_conservation():
    """Undamped URDF pendulum conserves energy through the engine."""
    import dataclasses

    m = parse_urdf(
        PENDULUM_OK.replace('damping="0.1"', 'damping="0.0"'),
        dtype=jnp.float64, root_joint=sm.WELD,
    )
    step = jax.jit(make_sim_step(m))
    state = init_state(m)
    state = dataclasses.replace(state, q=jnp.asarray([1.2, 0.5]))

    def energy(q, dq):
        kin = batched.bkin(m, q, dq)
        M = batched.mass_matrix(m, kin)
        ke = 0.5 * dq @ M @ dq
        # potential: sum m g . com_world
        R_w, p_w = kin.R_w, kin.p_w
        pe = 0.0
        for i in range(m.nb):
            com_w = p_w[i] + R_w[i] @ m.com[i]
            pe = pe - m.mass[i] * jnp.dot(m.gravity, com_w)
        return float(ke + pe)

    e0 = energy(state.q, state.dq)
    tau = jnp.zeros(2)
    for _ in range(1000):
        state, _ = step(state, tau)
    e1 = energy(state.q, state.dq)
    # semi-implicit Euler: energy oscillates bounded (~O(dt) amplitude at
    # this swing size); assert no secular blow-up
    assert abs(e1 - e0) / abs(e0) < 2e-2, (e0, e1)


def test_urdf_floating_root_and_cylinder():
    """floating root -> FREE joint; cylinder -> capsule geom; unsupported
    mesh format -> error (OBJ/STL load — tests/test_mesh.py)."""
    URDF = """
    <robot name="block">
      <link name="body">
        <inertial><mass value="3.0"/>
          <inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/>
        </inertial>
        <collision><geometry><cylinder radius="0.1" length="0.6"/></geometry>
        </collision>
      </link>
    </robot>
    """
    m = parse_urdf(URDF, dtype=jnp.float64, ground=True)
    assert m.joint_type == (sm.FREE,)
    assert int(m.geom_type[0]) == sm.GEOM_CAPSULE
    np.testing.assert_allclose(np.asarray(m.geom_size[0, :2]), [0.1, 0.3])
    assert len(m.world_pairs) == 1

    with pytest.raises(NotImplementedError):
        parse_urdf("""
        <robot name="meshy"><link name="l">
          <collision><geometry><mesh filename="x.dae"/></geometry></collision>
        </link></robot>""", root_joint=sm.WELD)
