"""Analytic primitive collision (fixed contact slots, masked).

TPU-native replacement of the reference collision stack
(`dart/collision/**` †: FCL/dart-native narrowphase + manifold generation —
SURVEY.md §2.4 "collision").  The five tasks only need primitive-vs-halfspace
(and optionally primitive-vs-primitive self pairs), so instead of a general
GJK engine we use closed-form pair tests with a *static* contact-slot layout:
every (geom, world-geom) pair contributes a fixed number of slots
(sphere: 1, capsule: 2, box: 4), each slot permanently tied to one body.
Inactive slots are masked — shapes never change under jit.

Determinism: slot order is the static pair order; within a pair, capsule
endpoints are ordered (end0, end1) and box corners are ranked by depth with
`top_k` (stable) — contact ordering feeds the LCP row order and therefore
matters for reproducibility (SURVEY.md §7 hard parts).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dartenv_tpu.model.skel_model import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, SkelModel,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Contacts:
    """Fixed-capacity contact set for one env.  Slot body indices are static
    (`slot_body` lives on the layout, not here)."""

    pos: Any        # (nc, 3) world contact position
    normal: Any     # (nc, 3) world normal, pointing toward the robot body
    depth: Any      # (nc,)  penetration depth (>=0 when active)
    active: Any     # (nc,)  {0., 1.}
    friction: Any   # (nc,)
    restitution: Any  # (nc,)


def slot_layout(
    model: SkelModel,
) -> Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, ...]]:
    """Static slot metadata: (slot_body_a, slot_body_b, slot_geom) per
    contact slot.  body_b == -1 for world (halfspace) slots; self pairs
    (robot-geom vs robot-geom) carry both body indices so the constraint
    layer builds relative-velocity Jacobian rows (J_a - J_b)."""
    geom_body = np.asarray(model.geom_body)
    geom_type = np.asarray(model.geom_type)
    bodies_a: List[int] = []
    bodies_b: List[int] = []
    geoms: List[int] = []
    per_type = {GEOM_SPHERE: 1, GEOM_CAPSULE: 2, GEOM_BOX: 4}
    for gi, _ in model.world_pairs:
        npts = per_type[int(geom_type[gi])]
        bodies_a += [int(geom_body[gi])] * npts
        bodies_b += [-1] * npts
        geoms += [int(gi)] * npts
    for ga, gb in model.self_pairs:
        for g in (ga, gb):
            if int(geom_type[g]) not in (GEOM_SPHERE, GEOM_CAPSULE):
                raise NotImplementedError(
                    f"self pair ({ga},{gb}): geom {g} has type "
                    f"{int(geom_type[g])}; self pairs support sphere/capsule "
                    "only (box-box narrowphase is ODE-derived in DART † and "
                    "out of scope — SURVEY.md §2.4 collision row)")
        bodies_a.append(int(geom_body[ga]))
        bodies_b.append(int(geom_body[gb]))
        geoms.append(int(ga))
    return tuple(bodies_a), tuple(bodies_b), tuple(geoms)


def num_slots(model: SkelModel) -> int:
    return len(slot_layout(model)[0])


def _closest_on_segment(p, a, hl, u):
    """Closest point to p on segment {a + t*u, |t| <= hl} (u unit)."""
    t = jnp.clip(jnp.dot(p - a, u), -hl, hl)
    return a + t * u


def _segment_segment(pa, ua, ha, pb, ub, hb):
    """Closest points between two segments (centers p, unit dirs u,
    half-lengths h).  Standard clamped-parameter solve (Ericson RTCD 5.1.9
    structure), branch-free for jit."""
    r = pa - pb
    a = 1.0
    e = 1.0
    b = jnp.dot(ua, ub)
    c = jnp.dot(ua, r)
    f = jnp.dot(ub, r)
    denom = a * e - b * b      # = 1 - b^2 >= 0
    # non-parallel closest params on the infinite lines, clamped
    s = jnp.where(denom > 1e-9, (b * f - c * e) / jnp.maximum(denom, 1e-9),
                  0.0)
    s = jnp.clip(s, -ha, ha)
    t = jnp.clip(b * s + f, -hb, hb)
    s = jnp.clip(b * t - c, -ha, ha)
    return pa + s * ua, pb + t * ub


def _pair_points(model, gi, R, p):
    """(center, radius, axis, half_len) of a sphere/capsule geom in world."""
    gt = int(np.asarray(model.geom_type)[gi])
    r = model.geom_size[gi, 0]
    if gt == GEOM_SPHERE:
        return p, r, None, None
    if gt == GEOM_CAPSULE:
        return p, r, R[:, 2], model.geom_size[gi, 1]
    raise NotImplementedError(
        "self pairs support sphere/capsule geoms only (the reference tasks "
        "never self-collide boxes; box-box is ODE-derived in DART † and "
        "deliberately out of scope — SURVEY.md §2.4 collision row)")


def collide_self_pair(model: SkelModel, ga: int, gb: int, Ra, pa, Rb, pb):
    """One contact for a sphere/capsule self pair.  Normal points from geom
    b toward geom a (matching the world-pair convention: toward body_a)."""
    ca, ra, ua, ha = _pair_points(model, ga, Ra, pa)
    cb, rb, ub, hb = _pair_points(model, gb, Rb, pb)
    if ua is None and ub is None:
        qa, qb = ca, cb
    elif ua is None:
        qb = _closest_on_segment(ca, cb, hb, ub)
        qa = ca
    elif ub is None:
        qa = _closest_on_segment(cb, ca, ha, ua)
        qb = cb
    else:
        qa, qb = _segment_segment(ca, ua, ha, cb, ub, hb)
    d = qa - qb
    dist = jnp.linalg.norm(d)
    # jit-safe normal for the coincident case (masked out by depth anyway)
    n = d / jnp.maximum(dist, 1e-9)
    depth = (ra + rb) - dist
    # contact point: midpoint of the two surface points
    pos = 0.5 * ((qa - n * ra) + (qb + n * rb))
    return pos, n, depth


def _halfspace_point(p, r, normal, offset):
    """Sphere of radius r centered at p vs halfspace {x: n.x >= offset}."""
    dist = jnp.dot(normal, p) - offset
    depth = r - dist
    pos = p - normal * dist
    return pos, depth


def collide(model: SkelModel, R_w, p_w) -> Contacts:
    """All world pairs, single env.  R_w: (nb,3,3), p_w: (nb,3)."""
    geom_type = np.asarray(model.geom_type)
    pos_l, nrm_l, dep_l, fr_l, re_l = [], [], [], [], []
    for gi, wi in model.world_pairs:
        gt = int(geom_type[gi])
        b = None  # resolved below via model arrays (static index ok)
        bidx = int(np.asarray(model.geom_body)[gi])
        Rg = R_w[bidx] @ model.geom_rot[gi]
        pg = p_w[bidx] + R_w[bidx] @ model.geom_pos[gi]
        n = model.wg_normal[wi]
        off = model.wg_offset[wi]
        fric = jnp.minimum(model.geom_friction[gi], model.wg_friction[wi])
        rest = jnp.maximum(model.geom_restitution[gi],
                           model.wg_restitution[wi])
        if gt == GEOM_SPHERE:
            r = model.geom_size[gi, 0]
            cpos, cdep = _halfspace_point(pg, r, n, off)
            pos_l.append(cpos[None])
            nrm_l.append(n[None])
            dep_l.append(cdep[None])
            fr_l.append(fric[None])
            re_l.append(rest[None])
        elif gt == GEOM_CAPSULE:
            r, hl = model.geom_size[gi, 0], model.geom_size[gi, 1]
            axis = Rg[:, 2]
            ends = jnp.stack([pg + axis * hl, pg - axis * hl])
            cpos, cdep = jax.vmap(
                lambda e: _halfspace_point(e, r, n, off)
            )(ends)
            pos_l.append(cpos)
            nrm_l.append(jnp.broadcast_to(n, (2, 3)))
            dep_l.append(cdep)
            fr_l.append(jnp.broadcast_to(fric, (2,)))
            re_l.append(jnp.broadcast_to(rest, (2,)))
        elif gt == GEOM_BOX:
            h = model.geom_size[gi]
            corners = jnp.asarray(
                np.array([[sx, sy, sz] for sx in (-1.0, 1.0)
                          for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]),
                dtype=p_w.dtype,
            ) * h
            cw = pg + corners @ Rg.T
            dist = cw @ n - off
            depth = -dist
            top_d, top_i = jax.lax.top_k(depth, 4)
            cpos = cw[top_i] - jnp.outer(dist[top_i], n)
            pos_l.append(cpos)
            nrm_l.append(jnp.broadcast_to(n, (4, 3)))
            dep_l.append(top_d)
            fr_l.append(jnp.broadcast_to(fric, (4,)))
            re_l.append(jnp.broadcast_to(rest, (4,)))
        else:
            raise NotImplementedError(f"geom type {gt} vs halfspace")
    for ga, gb in model.self_pairs:
        ba = int(np.asarray(model.geom_body)[ga])
        bb = int(np.asarray(model.geom_body)[gb])
        Ra = R_w[ba] @ model.geom_rot[ga]
        pa = p_w[ba] + R_w[ba] @ model.geom_pos[ga]
        Rb = R_w[bb] @ model.geom_rot[gb]
        pb = p_w[bb] + R_w[bb] @ model.geom_pos[gb]
        cpos, n, cdep = collide_self_pair(model, ga, gb, Ra, pa, Rb, pb)
        fric = jnp.minimum(model.geom_friction[ga], model.geom_friction[gb])
        rest = jnp.maximum(model.geom_restitution[ga],
                           model.geom_restitution[gb])
        pos_l.append(cpos[None])
        nrm_l.append(n[None])
        dep_l.append(cdep[None])
        fr_l.append(fric[None])
        re_l.append(rest[None])
    if not pos_l:
        z3 = jnp.zeros((0, 3), dtype=p_w.dtype)
        z = jnp.zeros((0,), dtype=p_w.dtype)
        return Contacts(pos=z3, normal=z3, depth=z, active=z,
                        friction=z, restitution=z)
    depth = jnp.concatenate(dep_l)
    eps = model.solver.contact_eps
    return Contacts(
        pos=jnp.concatenate(pos_l),
        normal=jnp.concatenate(nrm_l),
        depth=depth,
        active=(depth > eps).astype(p_w.dtype),
        friction=jnp.concatenate(fr_l),
        restitution=jnp.concatenate(re_l),
    )
