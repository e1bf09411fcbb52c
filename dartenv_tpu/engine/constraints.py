"""Constraint assembly: contacts + joint limits + joint Coulomb friction
-> one boxed LCP per env.

TPU-native replacement of the reference's constraint layer
(`dart/constraint/ConstraintSolver.cpp` †, `ContactConstraint.cpp` †,
`JointLimitConstraint.cpp` †, `JointCoulombFrictionConstraint` † —
SURVEY.md §2.4).  Differences from the reference's architecture, by design:

* no constrained-island grouping — each env is one robot, the LCP covers all
  rows, inactive ones masked (SURVEY.md §2.4: "islands unnecessary");
* A = J M^-1 J^T is assembled densely from the CRBA mass matrix instead of
  DART's per-column unit-impulse tests — identical operator, but expressed
  as small dense matmuls that batch onto the TPU under vmap.

Row semantics mirror the reference's ODE-style rows:
* contact normal row: lam >= 0, target velocity =
    max(restitution * (-v_n), erp * max(depth - allowance, 0)/dt capped at
    max_erv) (ContactConstraint ERP/CFM/allowance semantics ‡);
* two friction rows per contact with findex coupling (friction pyramid),
  first tangent from a deterministic basis of the normal
  (getTangentBasisMatrixODE † analogue);
* joint-limit row per limited dof, sign-flipped so it is always a
  ">=0, lam>=0" row (JointLimitConstraint †, activated on violation);
* Coulomb joint-friction row per dof with dof_friction > 0:
  |impulse| <= friction_force * dt.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from dartenv_tpu.collision.narrowphase import Contacts, slot_layout
from dartenv_tpu.math.linalg import chol, chol_solve
from dartenv_tpu.model.skel_model import SkelModel
from dartenv_tpu.dynamics.algorithms import Kin
from dartenv_tpu.lcp.pgs import pgs_solve
from dartenv_tpu.lcp.dantzig import dantzig_solve


def tangent_basis(n):
    """Deterministic tangent frame for a unit normal (single env, (3,))."""
    ex = jnp.asarray([1.0, 0.0, 0.0], dtype=n.dtype)
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype=n.dtype)
    ref = jnp.where(jnp.abs(n[0]) < 0.9, ex, ez)
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.linalg.norm(t1)
    t2 = jnp.cross(n, t1)
    return t1, t2


def world_dof_columns(model: SkelModel, kin: Kin):
    """Per-dof world-frame spatial columns at the world origin: (n, 6).

    Column d (owned by body b_d): w = R_w S_w, v = R_w S_v + p_w x w.
    Together with the static ancestor mask this gives any body-point
    Jacobian in two fused ops.
    """
    dof_body = np.asarray(model.dof_body_index())
    Rb = kin.R_w[dof_body]            # (n, 3, 3)
    pb = kin.p_w[dof_body]            # (n, 3)
    Sw = kin.S[:, :3]
    Sv = kin.S[:, 3:]
    w = jnp.einsum("dij,dj->di", Rb, Sw)
    v = jnp.einsum("dij,dj->di", Rb, Sv) + jnp.cross(pb, w)
    return jnp.concatenate([w, v], axis=-1)


def point_jacobian(model: SkelModel, phi, body: int, p):
    """(3, n) linear point Jacobian for a world point p on `body`
    (static index)."""
    w, v = phi[:, :3], phi[:, 3:]
    cols = v + jnp.cross(w, jnp.broadcast_to(p, w.shape))
    mask = model.ancestor_mask[body][:, None]
    return (cols * mask).T


@dataclasses.dataclass(frozen=True)
class RowLayout:
    """Static structure of the LCP (host-side, built once per model)."""

    m: int
    contact_slots: int
    # per contact slot: row indices (normal, t1, t2) are 3*s + (0,1,2)
    limit_dofs: tuple      # dof indices with limits
    friction_dofs: tuple   # dof indices with Coulomb joint friction
    findex: np.ndarray     # (m,) int
    slot_body: tuple


def build_layout(model: SkelModel) -> RowLayout:
    slot_body, _ = slot_layout(model)
    ns = len(slot_body)
    limited = np.asarray(model.limited) > 0.5
    limit_dofs = tuple(int(d) for d in np.nonzero(limited)[0])
    fr = np.asarray(model.dof_friction) > 0.0
    friction_dofs = tuple(int(d) for d in np.nonzero(fr)[0])
    m = 3 * ns + len(limit_dofs) + len(friction_dofs)
    findex = -np.ones(m, dtype=np.int64)
    for s in range(ns):
        findex[3 * s + 1] = 3 * s
        findex[3 * s + 2] = 3 * s
    return RowLayout(
        m=m, contact_slots=ns, limit_dofs=limit_dofs,
        friction_dofs=friction_dofs, findex=findex, slot_body=slot_body,
    )


def solve_constraints(model: SkelModel, layout: RowLayout, kin: Kin,
                      M, q, dq_before, dq_star, contacts: Contacts, dt):
    """Assemble + solve the per-env boxed LCP; returns (dq_plus, lam).

    dq_before: velocities at collision time (for restitution),
    dq_star:   post-smooth-dynamics predicted velocities.
    """
    n = model.n
    m = layout.m
    dtype = dq_star.dtype
    if m == 0:
        return dq_star, jnp.zeros((0,), dtype=dtype)

    cfg = model.solver
    phi = world_dof_columns(model, kin)

    J_rows: List[Any] = []
    b_rows: List[Any] = []
    lo_rows: List[Any] = []
    hi_rows: List[Any] = []
    act_rows: List[Any] = []
    mu_rows: List[Any] = []
    big = jnp.asarray(1e20, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)

    # ---- contact rows ----
    for s in range(layout.contact_slots):
        body = layout.slot_body[s]
        p = contacts.pos[s]
        nrm = contacts.normal[s]
        t1, t2 = tangent_basis(nrm)
        Jp = point_jacobian(model, phi, body, p)      # (3, n)
        Jn = nrm @ Jp
        Jt1 = t1 @ Jp
        Jt2 = t2 @ Jp
        v_n_before = Jn @ dq_before
        bounce = contacts.restitution[s] * jnp.maximum(-v_n_before, 0.0)
        erp_push = jnp.minimum(
            cfg.erp * jnp.maximum(contacts.depth[s] - cfg.allowance, 0.0)
            / dt,
            cfg.max_erv,
        )
        desired = jnp.maximum(bounce, erp_push)
        act = contacts.active[s]
        J_rows += [Jn, Jt1, Jt2]
        b_rows += [Jn @ dq_star - desired, Jt1 @ dq_star, Jt2 @ dq_star]
        lo_rows += [zero, -big, -big]
        hi_rows += [big, big, big]
        act_rows += [act, act, act]
        mu_rows += [zero, contacts.friction[s], contacts.friction[s]]

    # ---- joint limit rows ----
    for d in layout.limit_dofs:
        e = jnp.zeros(n, dtype=dtype).at[d].set(1.0)
        lo_viol = model.q_lower[d] - q[d]
        hi_viol = q[d] - model.q_upper[d]
        low_active = lo_viol > 0.0
        high_active = hi_viol > 0.0
        sign = jnp.where(high_active, -1.0, 1.0)
        viol = jnp.maximum(jnp.maximum(lo_viol, hi_viol), 0.0)
        target = jnp.minimum(cfg.joint_erp * viol / dt, cfg.max_erv)
        Jd = sign * e
        J_rows.append(Jd)
        b_rows.append(Jd @ dq_star - target)
        lo_rows.append(zero)
        hi_rows.append(big)
        act_rows.append((low_active | high_active).astype(dtype)
                        * model.limited[d])
        mu_rows.append(zero)

    # ---- joint Coulomb friction rows ----
    for d in layout.friction_dofs:
        e = jnp.zeros(n, dtype=dtype).at[d].set(1.0)
        bound = model.dof_friction[d] * dt
        J_rows.append(e)
        b_rows.append(e @ dq_star)
        lo_rows.append(-bound)
        hi_rows.append(bound)
        act_rows.append(jnp.asarray(1.0, dtype=dtype))
        mu_rows.append(zero)

    J = jnp.stack(J_rows)                  # (m, n)
    b = jnp.stack(b_rows)
    lo = jnp.stack(lo_rows)
    hi = jnp.stack(hi_rows)
    active = jnp.stack(act_rows)
    mu = jnp.stack(mu_rows)

    L = chol(M, eps=1e-10)
    MinvJt = chol_solve(L, J.T)            # (n, m)
    A = J @ MinvJt
    A = A + cfg.cfm * jnp.eye(m, dtype=dtype)
    # mask inactive rows out of the operator so they can't pollute pivots
    A = A * active[:, None] * active[None, :] + jnp.diag(1.0 - active)

    if cfg.solver == "pgs":
        lam = pgs_solve(A, b, lo, hi, layout.findex, mu, active,
                        iters=cfg.pgs_iters)
    else:
        lam = dantzig_solve(A, b, lo, hi, layout.findex, mu, active)
    dq_plus = dq_star + MinvJt @ lam
    return dq_plus, lam
