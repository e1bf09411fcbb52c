"""SDF world loader (closes SURVEY.md §2.4 parsers / VERDICT r3 missing
#5: the reference DART parses SDF alongside .skel and URDF
(`dart/utils/sdf/SdfParser.cpp` †); no dart-env task ships SDF assets,
so this is a pragmatic subset for parity):

  <sdf><world>
    <physics><max_step_size/><gravity/></physics>
    <model name=...>
      <static>true|false</static>
      <pose>x y z r p y</pose>
      <link name=...>
        <pose/> <inertial><mass/><inertia><ixx/>...</inertia></inertial>
        <collision><geometry><box|sphere|cylinder|capsule/></geometry>
          <surface><friction><ode><mu/></ode></friction></surface>
        </collision>
      </link>
      <joint name=... type="revolute|prismatic|ball|fixed|universal">
        <pose/> <parent>link</parent> <child>link</child>
        <axis><xyz/><limit><lower/><upper/></limit>
              <dynamics><damping/></dynamics></axis>
        <axis2><xyz/></axis2>
      </joint>
    </model>
  </world></sdf>

Semantics mapped to the engine's SkelModel conventions:
  * link/joint <pose> values are local to their parent element (SDF 1.5+
    convention: link pose in the model frame, joint pose in the CHILD
    link frame); joint axes are in the joint frame;
  * a floating link (no joint naming it as child) gets a FREE joint;
  * static models' boxes become world halfspaces via their top face
    (matching skel_parser's ground handling);
  * SDF <cylinder>/<capsule> <length> is the full length, <box><size>
    the full extents (halved here); SDF axes default to local z.

Returns the same ParsedWorld surface as model/skel_parser.parse_skel.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.model.builder import ModelBuilder
from dartenv_tpu.model.skel_parser import ParsedWorld, euler_zyx_to_mat

_JOINT_TYPES = {
    "revolute": sm.REVOLUTE,
    "prismatic": sm.PRISMATIC,
    "ball": sm.BALL,
    "fixed": sm.WELD,
    "universal": sm.UNIVERSAL,
    "screw": sm.SCREW,
    "free": sm.FREE,
}


def _floats(text) -> np.ndarray:
    return np.asarray([float(x) for x in text.split()], dtype=np.float64)


def _pose(el) -> tuple:
    """(R, p) of an element's <pose> child (identity if absent).

    SDF rpy is FIXED-AXIS roll-pitch-yaw: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    (the reference SdfParser composes ZYX †) — NOT the .skel XYZ order."""
    p = el.find("pose") if el is not None else None
    if p is None or p.text is None:
        return np.eye(3), np.zeros(3)
    v = _floats(p.text)
    return euler_zyx_to_mat(v[3], v[4], v[5]), v[:3]


def _t_mul(a, b):
    Ra, pa = a
    Rb, pb = b
    return Ra @ Rb, pa + Ra @ pb


def _t_inv(t):
    R, p = t
    return R.T, -(R.T @ p)


def _parse_geometry(geom):
    """(gtype, size) from an SDF <geometry> element, or None."""
    b = geom.find("box")
    if b is not None:
        return sm.GEOM_BOX, _floats(b.find("size").text) / 2.0
    s = geom.find("sphere")
    if s is not None:
        return sm.GEOM_SPHERE, np.array(
            [float(s.find("radius").text), 0.0, 0.0])
    c = geom.find("cylinder")
    if c is not None:
        return sm.GEOM_CYLINDER, np.array(
            [float(c.find("radius").text),
             float(c.find("length").text) / 2.0, 0.0])
    c = geom.find("capsule")
    if c is not None:
        return sm.GEOM_CAPSULE, np.array(
            [float(c.find("radius").text),
             float(c.find("length").text) / 2.0, 0.0])
    return None


def _surface_friction(coll) -> float:
    mu = coll.find("surface/friction/ode/mu")
    return float(mu.text) if mu is not None else 1.0


def parse_sdf(path: str, dtype=jnp.float32) -> ParsedWorld:
    root = ET.parse(path).getroot()
    world = root.find("world") if root.tag != "world" else root
    if world is None:                      # bare <sdf><model> file
        world = root

    dt = 0.002
    gravity = np.array([0.0, -9.81, 0.0])
    phys = world.find("physics")
    if phys is not None:
        ts = phys.find("max_step_size")
        if ts is not None:
            dt = float(ts.text)
        gr = phys.find("gravity")
        if gr is not None and gr.text:
            gravity = _floats(gr.text)
    up = -gravity / max(np.linalg.norm(gravity), 1e-9)

    halfspaces: List[tuple] = []
    skeletons: List[sm.SkelModel] = []

    for model in world.findall("model"):
        static_el = model.find("static")
        # an empty <static/> has text=None; sdformat falls back to the
        # element default (false), so only an explicit true/1 is static
        is_static = (static_el is not None
                     and (static_el.text or "").strip().lower()
                     in ("true", "1"))
        T_model = _pose(model)
        links = model.findall("link")
        link_T: Dict[str, tuple] = {}
        for link in links:
            link_T[link.get("name")] = _t_mul(T_model, _pose(link))

        if is_static:
            # world geometry: top-face halfspaces from boxes (same rule
            # as skel_parser's static ground handling)
            for link in links:
                for coll in link.findall("collision"):
                    g = _parse_geometry(coll.find("geometry"))
                    if g is None:
                        continue
                    gtype, size = g
                    T_g = _t_mul(link_T[link.get("name")], _pose(coll))
                    if gtype == sm.GEOM_BOX:
                        Rg, pg = T_g
                        off = float(up @ pg + np.abs(up @ Rg) @ size)
                        halfspaces.append(
                            (up.copy(), off, _surface_friction(coll)))
            continue

        # ---- mobile model: joints define the tree ----------------------
        joints = model.findall("joint")
        child_joint: Dict[str, ET.Element] = {}
        for j in joints:
            child_joint[j.find("child").text.strip()] = j

        b = ModelBuilder(dt=dt, gravity=tuple(gravity))
        order: List[str] = []
        placed: Dict[str, bool] = {}

        def _ready(link) -> bool:
            j = child_joint.get(link.get("name"))
            if j is None:
                return True
            parent = j.find("parent").text.strip()
            return parent in ("world",) or placed.get(parent, False)

        remaining = list(links)
        while remaining:
            progress = False
            for link in list(remaining):
                if not _ready(link):
                    continue
                name = link.get("name")
                T_child = link_T[name]
                j = child_joint.get(name)
                if j is None:
                    jt = sm.FREE
                    parent_name = None
                    T_joint = T_child
                    axes = None
                    lower = upper = None
                    damping = 0.0
                    Rw, pw = T_child
                    from dartenv_tpu.math import spatial as _sp
                    rotvec = np.asarray(_sp.so3_log(jnp.asarray(Rw)))
                    q_init = list(rotvec) + list(pw)
                else:
                    jt = _JOINT_TYPES[j.get("type", "revolute")]
                    parent_name = j.find("parent").text.strip()
                    if parent_name == "world":
                        parent_name = None
                    # SDF: joint pose is relative to the CHILD link
                    T_joint = _t_mul(T_child, _pose(j))
                    axes = []
                    lower = upper = None
                    damping = 0.0
                    for ax_tag in ("axis", "axis2"):
                        ax = j.find(ax_tag)
                        if ax is None:
                            continue
                        xyz = ax.find("xyz")
                        axes.append(_floats(xyz.text) if xyz is not None
                                    else np.array([0.0, 0.0, 1.0]))
                        lim = ax.find("limit")
                        if lim is not None and ax_tag == "axis":
                            lo = lim.find("lower")
                            hi_ = lim.find("upper")
                            if lo is not None and hi_ is not None:
                                lower, upper = (float(lo.text),
                                                float(hi_.text))
                        dyn = ax.find("dynamics")
                        if dyn is not None and ax_tag == "axis":
                            dp = dyn.find("damping")
                            if dp is not None:
                                damping = float(dp.text)
                    q_init = 0.0

                # frames: pj = joint in parent body, cj = joint in child
                T_parent = (link_T.get(parent_name, (np.eye(3),
                                                     np.zeros(3)))
                            if parent_name else (np.eye(3), np.zeros(3)))
                pjR, pjp = _t_mul(_t_inv(T_parent), T_joint)
                cjR, cjp = _t_mul(_t_inv(T_child), T_joint)
                if jt == sm.FREE:
                    # free-link convention: joint at the world origin,
                    # pose carried by q_init (exp coords are zero at the
                    # reference orientation)
                    pjR, pjp = np.eye(3), np.zeros(3)
                    cjR, cjp = np.eye(3), np.zeros(3)

                mass, com, inertia = 1.0, (0, 0, 0), None
                inert = link.find("inertial")
                if inert is not None:
                    m_el = inert.find("mass")
                    if m_el is not None:
                        mass = float(m_el.text)
                    Rc, pc = _pose(inert)
                    com = tuple(pc)
                    I = inert.find("inertia")
                    if I is not None:
                        def gv(tag):
                            el = I.find(tag)
                            return float(el.text) if el is not None else 0.0
                        inertia = np.array(
                            [[gv("ixx"), gv("ixy"), gv("ixz")],
                             [gv("ixy"), gv("iyy"), gv("iyz")],
                             [gv("ixz"), gv("iyz"), gv("izz")]])
                        inertia = Rc @ inertia @ Rc.T

                kw = dict(mass=mass, com=com, inertia=inertia,
                          pj_pos=tuple(pjp), pj_rot=pjR,
                          cj_pos=tuple(cjp), cj_rot=cjR,
                          damping=damping, q_init=q_init)
                if axes:
                    ax3 = np.zeros((3, 3))
                    for k, a in enumerate(axes[:3]):
                        ax3[k] = a / max(np.linalg.norm(a), 1e-12)
                    kw["axes"] = ax3[: max(1, len(axes))]
                if lower is not None:
                    kw["q_lower"], kw["q_upper"] = lower, upper
                b.add_body(name, parent_name, jt, **kw)
                placed[name] = True
                order.append(name)
                remaining.remove(link)
                progress = True

                for coll in link.findall("collision"):
                    g = _parse_geometry(coll.find("geometry"))
                    if g is None:
                        continue
                    gtype, size = g
                    Rg, pg = _pose(coll)
                    b.add_geom(name, gtype, tuple(size), pos=tuple(pg),
                               rot=Rg, friction=_surface_friction(coll))
            if not progress:
                raise ValueError(
                    f"SDF joint graph has a cycle or dangling parent "
                    f"among {[l.get('name') for l in remaining]}")
        skeletons.append(b.finalize(dtype=dtype))

    # attach world halfspaces to every mobile skeleton (skel_parser rule)
    if halfspaces:
        out = []
        for mdl in skeletons:
            n_arr = jnp.asarray(np.stack([h[0] for h in halfspaces]),
                                dtype=dtype)
            off_arr = jnp.asarray(np.asarray([h[1] for h in halfspaces]),
                                  dtype=dtype)
            fr_arr = jnp.asarray(np.asarray([h[2] for h in halfspaces]),
                                 dtype=dtype)
            pairs = tuple((g, w) for g in range(mdl.ng)
                          for w in range(len(halfspaces)))
            out.append(mdl.replace(
                wg_normal=n_arr, wg_offset=off_arr, wg_friction=fr_arr,
                wg_restitution=jnp.zeros((len(halfspaces),), dtype=dtype),
                world_pairs=pairs))
        skeletons = out

    if not skeletons:
        raise ValueError(f"SDF world {path!r} has no mobile models")
    return ParsedWorld(dt, gravity, skeletons)
