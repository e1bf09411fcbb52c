"""SDF world loader (SURVEY.md §2.4 parsers; reference
`dart/utils/sdf/SdfParser.cpp` † parses SDF alongside .skel/URDF)."""
import jax
import jax.numpy as jnp
import numpy as np

from dartenv_tpu.engine.world import init_state, make_sim_step
from dartenv_tpu.model.sdf_loader import parse_sdf

_SDF = """<?xml version="1.0" ?>
<sdf version="1.6">
  <world name="default">
    <physics><max_step_size>0.002</max_step_size>
      <gravity>0 -9.81 0</gravity></physics>
    <model name="ground_plane">
      <static>true</static>
      <link name="ground">
        <pose>0 -0.05 0 0 0 0</pose>
        <collision name="c">
          <geometry><box><size>10 0.1 10</size></box></geometry>
          <surface><friction><ode><mu>0.9</mu></ode></friction></surface>
        </collision>
      </link>
    </model>
    <model name="pendulum">
      <link name="base">
        <pose>0 1.0 0 0 0 0</pose>
        <inertial><mass>2.0</mass>
          <inertia><ixx>0.02</ixx><iyy>0.02</iyy><izz>0.02</izz></inertia>
        </inertial>
        <collision name="c">
          <geometry><sphere><radius>0.05</radius></sphere></geometry>
        </collision>
      </link>
      <link name="bob">
        <pose>0 0.6 0 0 0 0</pose>
        <inertial><mass>1.0</mass>
          <inertia><ixx>0.01</ixx><iyy>0.01</iyy><izz>0.01</izz></inertia>
        </inertial>
        <collision name="c">
          <geometry><sphere><radius>0.08</radius></sphere></geometry>
        </collision>
      </link>
      <joint name="anchor" type="fixed">
        <parent>world</parent><child>base</child>
      </joint>
      <joint name="swing" type="revolute">
        <pose>0 0.4 0 0 0 0</pose>
        <parent>base</parent><child>bob</child>
        <axis><xyz>0 0 1</xyz>
          <limit><lower>-2.5</lower><upper>2.5</upper></limit>
          <dynamics><damping>0.05</damping></dynamics>
        </axis>
      </joint>
    </model>
    <model name="crate">
      <link name="box">
        <pose>0.6 0.101 0 0 0 0</pose>
        <inertial><mass>0.5</mass>
          <inertia><ixx>0.003</ixx><iyy>0.003</iyy><izz>0.003</izz></inertia>
        </inertial>
        <collision name="c">
          <geometry><box><size>0.2 0.2 0.2</size></box></geometry>
        </collision>
      </link>
    </model>
  </world>
</sdf>
"""


def _world(tmp_path):
    p = tmp_path / "world.sdf"
    p.write_text(_SDF)
    return parse_sdf(str(p), dtype=jnp.float64)


def test_parse_sdf_structure(tmp_path):
    w = _world(tmp_path)
    assert w.dt == 0.002
    assert len(w.skeletons) == 2          # pendulum + crate (ground static)
    pend, crate = w.skeletons
    # pendulum: weld base + revolute bob with limits and damping
    assert pend.n == 1
    np.testing.assert_allclose(np.asarray(pend.q_lower), [-2.5])
    np.testing.assert_allclose(np.asarray(pend.q_upper), [2.5])
    assert float(np.asarray(pend.damping)[0]) == 0.05
    # free crate: 6 dofs, initial pose from the link <pose>
    assert crate.n == 6
    np.testing.assert_allclose(np.asarray(crate.q_init)[3:],
                               [0.6, 0.101, 0.0], atol=1e-12)
    # ground halfspace attached to both with the SDF friction
    assert crate.wg_offset.shape == (1,)
    assert abs(float(crate.wg_offset[0]) - 0.0) < 1e-12
    assert float(crate.wg_friction[0]) == 0.9


def test_sdf_pose_rotation_is_fixed_axis_zyx(tmp_path):
    """SDF rpy composes Rz(yaw)@Ry(pitch)@Rx(roll) (fixed-axis RPY, the
    reference SdfParser order †) — NOT the .skel Rx@Ry@Rz.  A pose with
    two nonzero angles distinguishes the orders (advisor r4 medium)."""
    from dartenv_tpu.model.skel_parser import (euler_xyz_to_mat,
                                               euler_zyx_to_mat)

    roll, yaw = 0.4, 0.3
    sdf = """<?xml version="1.0" ?>
<sdf version="1.6">
  <model name="tilted">
    <link name="box">
      <pose>0.1 0.8 -0.2 {r} 0 {y}</pose>
      <inertial><mass>0.5</mass>
        <inertia><ixx>0.003</ixx><iyy>0.003</iyy><izz>0.003</izz></inertia>
      </inertial>
      <collision name="c">
        <geometry><box><size>0.2 0.2 0.2</size></box></geometry>
      </collision>
    </link>
  </model>
</sdf>
""".format(r=roll, y=yaw)
    p = tmp_path / "tilted.sdf"
    p.write_text(sdf)
    w = parse_sdf(str(p), dtype=jnp.float64)
    (mdl,) = w.skeletons
    from dartenv_tpu.math import spatial as sp

    R_expect = euler_zyx_to_mat(roll, 0.0, yaw)
    R_wrong = euler_xyz_to_mat(roll, 0.0, yaw)
    # the two compositions genuinely differ for this pose
    assert np.abs(R_expect - R_wrong).max() > 1e-2
    R_got = np.asarray(sp.so3_exp(jnp.asarray(np.asarray(mdl.q_init)[:3])))
    np.testing.assert_allclose(R_got, R_expect, atol=1e-9)
    np.testing.assert_allclose(np.asarray(mdl.q_init)[3:],
                               [0.1, 0.8, -0.2], atol=1e-12)


def test_sdf_empty_static_element(tmp_path):
    """An empty <static/> (text=None) must parse without crashing and
    fall back to the sdformat element default (false)."""
    sdf = """<?xml version="1.0" ?>
<sdf version="1.6">
  <model name="maybe_static">
    <static/>
    <link name="box">
      <inertial><mass>0.5</mass>
        <inertia><ixx>0.003</ixx><iyy>0.003</iyy><izz>0.003</izz></inertia>
      </inertial>
      <collision name="c">
        <geometry><box><size>0.2 0.2 0.2</size></box></geometry>
      </collision>
    </link>
  </model>
</sdf>
"""
    p = tmp_path / "s.sdf"
    p.write_text(sdf)
    w = parse_sdf(str(p), dtype=jnp.float64)
    assert len(w.skeletons) == 1          # parsed as a MOBILE model


def test_sdf_pendulum_swings_and_crate_rests(tmp_path):
    """Physics end-to-end: the pendulum bob swings about the SDF joint
    anchor (0, 1.4, 0... anchor at base+0.4 -> world y=1.4); the free
    crate rests on the ground halfspace."""
    w = _world(tmp_path)
    pend, crate = w.skeletons
    # pendulum: displace and step; energy stays bounded, joint swings
    step = jax.jit(make_sim_step(pend))
    import dataclasses
    st = init_state(pend)
    st = dataclasses.replace(st, q=jnp.asarray([1.0]))
    qs = []
    for _ in range(600):
        st, _ = step(st, jnp.zeros(1))
        qs.append(float(st.q[0]))
    qs = np.asarray(qs)
    assert qs.min() < -0.2                 # swung through
    assert np.abs(qs).max() <= 1.05        # damped, no energy blow-up
    # crate: settles at rest height 0.1 on the halfspace
    step_c = jax.jit(make_sim_step(crate))
    st = init_state(crate)
    for _ in range(400):
        st, contacts = step_c(st, jnp.zeros(6))
    assert abs(float(st.q[4]) - 0.1) < 5e-3
    assert float(jnp.sum(contacts.active)) >= 1
