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


def slot_layout(model: SkelModel) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Static slot metadata: (slot_body, slot_geom) per contact slot."""
    geom_body = np.asarray(model.geom_body)
    geom_type = np.asarray(model.geom_type)
    bodies: List[int] = []
    geoms: List[int] = []
    per_type = {GEOM_SPHERE: 1, GEOM_CAPSULE: 2, GEOM_BOX: 4}
    for gi, _ in model.world_pairs:
        npts = per_type[int(geom_type[gi])]
        bodies += [int(geom_body[gi])] * npts
        geoms += [int(gi)] * npts
    return tuple(bodies), tuple(geoms)


def num_slots(model: SkelModel) -> int:
    return len(slot_layout(model)[0])


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
