"""Pallas TPU kernel: the FULL physics substep (minus escalation).

After round 4's fused dynamics kernel, the LCP stack — constraint
assembly, the A = J M^-1 J^T build, and the PGS solve — became 75% of
the walker2d substep (docs/BENCH.md phase table), much of it layout
cost: the dynamics kernel's lane-major outputs transpose to B-first for
the XLA assembly einsums, whose (m, n)-trailing shapes underuse lanes,
and A then transposes BACK to lane-major for the PGS kernel.

This kernel runs the whole substep in ONE pass per 1024-env tile with
every per-env scalar a full (8, 128) f32 register (the layout of
dynamics/pallas_dynamics.py, whose scalar-block algebra and dynamics
trace it reuses):

  dynamics -> halfspace collision (sphere/capsule/box slots) ->
  active-set compaction (rank-select over slots, replicating the XLA
  top_k-then-sort semantics) -> contact/limit/dof-friction rows ->
  A build (unrolled Cholesky) -> warm-started PGS sweeps + fused
  normalized residual -> dq_plus.

Hybrid exact escalation stays OUTSIDE (it is a cross-env top_k +
BPP-kernel re-solve of the worst K; engine/world.py drives it on the
kernel's outputs and patches the K escalated envs), as does position
integration (so escalated envs integrate exactly once).

Scope: models whose world pairs are sphere/capsule/box vs halfspace,
no self pairs, no servo rows — i.e. every shipped contact task; other
models keep the 3-kernel path.  Row semantics replicate
engine/constraints.py (same reference citations) to f32 rounding.
"""
from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dartenv_tpu.dynamics.pallas_dynamics import (
    DR_FIELDS_DYN, LANE, SUB, TBE, _DR_SPEC, _Static, _add, _apply_dr,
    _blk, _chol_solve_env, _cross, _dot, _m3m, _m3v, _mul, _neg, _npv,
    _sc, _st, _sub, _trace_env, _vadd, _vsub, _x64_safe_kernel,
    supported as dyn_supported,
)
from dartenv_tpu.model.skel_model import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, SkelModel,
)

_BIG = 1e20


def _fgt(a, b):
    """a > b as a float mask, tolerating fully-static operands (a flat
    snake's capsule heights constant-fold: depth becomes a Python float
    even with runtime q)."""
    if _st(a) and _st(b):
        return 1.0 if a > b else 0.0
    return (a > b).astype(jnp.float32)


def _fge(a, b):
    if _st(a) and _st(b):
        return 1.0 if a >= b else 0.0
    return (a >= b).astype(jnp.float32)


def _flt(a, b):
    if _st(a) and _st(b):
        return 1.0 if a < b else 0.0
    return (a < b).astype(jnp.float32)


def _feq(a, b):
    if _st(a) and _st(b):
        return 1.0 if a == b else 0.0
    return (a == b).astype(jnp.float32)


_CORNERS8 = [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
             for sz in (-1.0, 1.0)]


def _fmin(a, b):
    if _st(a) and _st(b):
        return min(a, b)
    return jnp.minimum(a, b)


def _fmax(a, b):
    if _st(a) and _st(b):
        return max(a, b)
    return jnp.maximum(a, b)


# DR leaves the FUSED SUBSTEP kernel accepts as per-env inputs: the
# dynamics set plus the contact-value leaves its collision/row stages
# consume (VERDICT r4 order #2).  Layout leaves (geom_type/geom_body/
# dof_friction/limited/...) stay static by domain_rand contract.
DR_FIELDS_SUB = DR_FIELDS_DYN + (
    "geom_friction", "geom_restitution", "wg_friction", "wg_restitution",
    "geom_size",
)

# substep-only field -> flattened per-env length fn (over _SubStatic)
_DR_SPEC_SUB = {
    "geom_friction": lambda st: st.ng,
    "geom_restitution": lambda st: st.ng,
    "wg_friction": lambda st: st.nw,
    "wg_restitution": lambda st: st.nw,
    "geom_size": lambda st: 3 * st.ng,
}


def _dr_len(st: "_SubStatic", f: str) -> int:
    if f in _DR_SPEC:
        return _DR_SPEC[f][1](st.dyn)
    return _DR_SPEC_SUB[f](st)


def _apply_dr_sub(st: "_SubStatic", dr) -> "_SubStatic":
    """Copy of the substep digest with DR leaves replaced by per-env
    blocks: dynamics leaves via pallas_dynamics._apply_dr, contact-value
    leaves re-derived per slot (fric = min(geom, wg), rest = max,
    size = the 3 geom_size entries) with static sides still folding."""
    import copy

    st2 = copy.copy(st)
    dyn_dr = {f: v for f, v in dr.items() if f in _DR_SPEC}
    if dyn_dr:
        st2.dyn = _apply_dr(st.dyn, dyn_dr)
    con = {f: v for f, v in dr.items() if f not in _DR_SPEC}
    if con:
        slots2 = []
        for d in st.slots:
            d = dict(d)
            gi, wi = d["gi"], d["wi"]
            gf = (con["geom_friction"][gi] if "geom_friction" in con
                  else d["fric_g"])
            wf = (con["wg_friction"][wi] if "wg_friction" in con
                  else d["fric_w"])
            d["fric"] = _fmin(gf, wf)
            gr = (con["geom_restitution"][gi] if "geom_restitution" in con
                  else d["rest_g"])
            wr = (con["wg_restitution"][wi] if "wg_restitution" in con
                  else d["rest_w"])
            d["rest"] = _fmax(gr, wr)
            if "geom_size" in con:
                d["size"] = [con["geom_size"][gi * 3 + k]
                             for k in range(3)]
            slots2.append(d)
        st2.slots = slots2
    return st2


def substep_supported(model: SkelModel) -> bool:
    """Can the fused substep kernel serve this model?  (Caller must have
    ruled out traced model leaves first — this reads them host-side.)"""
    from dartenv_tpu.engine.constraints import build_layout

    if not dyn_supported(model):
        return False
    if model.self_pairs:
        return False
    if build_layout(model).m == 0:
        # no constraint rows: the dynamics-kernel path already covers the
        # whole substep optimally (cartpole-class models)
        return False
    if model.servo_flimit is not None and \
            float(np.max(np.asarray(model.servo_flimit))) > 0.0:
        return False
    gt = np.asarray(model.geom_type)
    for gi, _ in model.world_pairs:
        if int(gt[gi]) not in (GEOM_SPHERE, GEOM_CAPSULE, GEOM_BOX):
            return False
    return True


class _SubStatic:
    """Static constraint-layout digest on top of the dynamics _Static."""

    def __init__(self, model: SkelModel):
        from dartenv_tpu.engine.constraints import build_layout

        self.dyn = _Static(model)
        self.layout = build_layout(model)
        self.cfg = model.solver
        self.dt = float(model.dt)
        gt = np.asarray(model.geom_type)
        gb = np.asarray(model.geom_body)
        self.ng = model.ng
        self.nw = (0 if model.wg_offset is None
                   else int(np.asarray(model.wg_offset).shape[-1]))
        # per-slot static data, in slot_layout order (world pairs only).
        # gi/wi + the raw per-side fric/rest are kept so _apply_dr_sub
        # can re-derive fric/rest/size with per-env runtime leaves.
        self.slots: List[dict] = []
        for gi, wi in model.world_pairs:
            t = int(gt[gi])
            fric_g = float(np.asarray(model.geom_friction)[gi])
            fric_w = float(np.asarray(model.wg_friction)[wi])
            rest_g = float(np.asarray(model.geom_restitution)[gi])
            rest_w = float(np.asarray(model.wg_restitution)[wi])
            d = dict(
                gtype=t,
                body=int(gb[gi]),
                gi=int(gi), wi=int(wi),
                rot=[[float(np.asarray(model.geom_rot)[gi][i, j])
                      for j in range(3)] for i in range(3)],
                pos=_npv(np.asarray(model.geom_pos)[gi]),
                size=_npv(np.asarray(model.geom_size)[gi]),
                n=_npv(np.asarray(model.wg_normal)[wi]),
                off=float(np.asarray(model.wg_offset)[wi]),
                fric_g=fric_g, fric_w=fric_w,
                rest_g=rest_g, rest_w=rest_w,
                fric=min(fric_g, fric_w),
                rest=max(rest_g, rest_w),
            )
            # static tangent basis of the (static) halfspace normal —
            # engine/constraints.tangent_basis formula
            n = np.asarray(d["n"], dtype=np.float64)
            ref = (np.array([1.0, 0, 0]) if abs(n[0]) < 0.9
                   else np.array([0.0, 0, 1.0]))
            t1 = np.cross(n, ref)
            t1 = t1 / np.linalg.norm(t1)
            d["t1"], d["t2"] = _npv(t1), _npv(np.cross(n, t1))
            d["nslots"] = {GEOM_SPHERE: 1, GEOM_CAPSULE: 2, GEOM_BOX: 4}[t]
            self.slots.append(d)
        self.ns = sum(d["nslots"] for d in self.slots)
        assert self.ns == self.layout.contact_slots
        self.cap = int(self.cfg.contact_cap)
        if not (0 < self.cap < self.ns):
            self.cap = self.ns            # no compaction
        self.m_c = 3 * self.cap + (self.layout.m - 3 * self.ns)
        # compacted findex (assemble_lcp's compacted branch)
        n_tail = self.layout.m - 3 * self.ns
        self.findex_c = np.concatenate([
            np.stack([-np.ones(self.cap, np.int64),
                      3 * np.arange(self.cap),
                      3 * np.arange(self.cap)], axis=1).reshape(-1),
            -np.ones(n_tail, np.int64),
        ]) if self.ns else np.asarray(self.layout.findex)
        # limit / dof-friction static data
        m = model
        self.limit_dofs = list(self.layout.limit_dofs)
        self.q_lower = _npv(np.asarray(m.q_lower))
        self.q_upper = _npv(np.asarray(m.q_upper))
        self.limited = _npv(np.asarray(m.limited))
        self.friction_dofs = list(self.layout.friction_dofs)
        self.dof_friction = (_npv(np.asarray(m.dof_friction))
                             if m.dof_friction is not None else None)
        # per-slot ancestor mask over dofs (signed masks are all +1 here:
        # world slots only)
        am = np.asarray(m.ancestor_mask)
        self.slot_dofs: List[List[int]] = []
        for d in self.slots:
            dofs = [i for i in range(m.n) if am[d["body"], i] > 0.5]
            for _ in range(d["nslots"]):
                self.slot_dofs.append(dofs)


def _rank_blocks(scores, strict_first: bool):
    """rank[s] = #{s2 < s: score[s2] >= score[s]} +
    #{s2 > s: score[s2] > score[s]}  — replicates jax.lax.top_k's
    value-descending, ties-to-lower-index order."""
    ns = len(scores)
    ranks = []
    for s in range(ns):
        r = 0.0
        for s2 in range(ns):
            if s2 == s:
                continue
            c = _fge(scores[s2], scores[s]) if s2 < s \
                else _fgt(scores[s2], scores[s])
            r = _add(r, c)
        ranks.append(r)
    return ranks


def _topk_rank_onehot(scores, k):
    """W[r][s] = 1 if slot s has rank r (< k): rank-ordered selection
    (the box-corner top_k order)."""
    ranks = _rank_blocks(scores, True)
    return [[_feq(ranks[s], float(r))
             for s in range(len(scores))] for r in range(k)]


def _topk_ordered_onehot(scores, k):
    """W[r][s] = 1 if s is the r-th SELECTED slot in ORIGINAL order
    (top-k then index-sort — the contact compaction semantics)."""
    ns = len(scores)
    ranks = _rank_blocks(scores, True)
    sel = [_flt(ranks[s], float(k)) for s in range(ns)]
    sel_rank = []
    acc = 0.0
    for s in range(ns):
        sel_rank.append(acc)
        acc = _add(acc, sel[s])
    W = [[_mul(sel[s], _feq(sel_rank[s], float(r)))
          for s in range(ns)] for r in range(k)]
    return W, sel


def _trace_substep(st: _SubStatic, q, dq, tau, lam_prev):
    """One env's full substep on scalar blocks.  Returns a dict of
    outputs (lists of blocks / floats)."""
    dyn = st.dyn
    n = dyn.n
    cfg = st.cfg
    dt = st.dt
    dq_star, M, phi, R_w, p_w = _trace_env(dyn, dt, q, dq, tau)
    Mfull = [[M[min(i, j)][max(i, j)] for j in range(n)] for i in range(n)]

    # ---- collision: halfspace slots (narrowphase.collide semantics) ----
    slot_pos: List[Any] = []      # per slot vec3
    slot_depth: List[Any] = []
    slot_rest: List[float] = []
    slot_fric: List[float] = []
    for d in st.slots:
        b = d["body"]
        Rg = _m3m(R_w[b], d["rot"])
        pg = _vadd(p_w[b], _m3v(R_w[b], d["pos"]))
        nrm, off = d["n"], d["off"]
        if d["gtype"] == GEOM_SPHERE:
            r = d["size"][0]
            dist = _sub(_dot(nrm, pg), off)
            slot_pos.append(_vsub(pg, _sc(nrm, dist)))
            slot_depth.append(_sub(r, dist))
            slot_rest.append(d["rest"])
            slot_fric.append(d["fric"])
        elif d["gtype"] == GEOM_CAPSULE:
            r, hl = d["size"][0], d["size"][1]
            axis = [Rg[0][2], Rg[1][2], Rg[2][2]]
            for sgn in (1.0, -1.0):
                e = _vadd(pg, _sc(axis, _mul(sgn, hl)))
                dist = _sub(_dot(nrm, e), off)
                slot_pos.append(_vsub(e, _sc(nrm, dist)))
                slot_depth.append(_sub(r, dist))
                slot_rest.append(d["rest"])
                slot_fric.append(d["fric"])
        else:                      # GEOM_BOX: deepest 4 of 8 corners
            h = d["size"]
            corners = []
            depths = []
            for c8 in _CORNERS8:
                local = [c8[k] * h[k] for k in range(3)]
                cw = _vadd(pg, _m3v(Rg, local))
                dist = _sub(_dot(nrm, cw), off)
                corners.append(_vsub(cw, _sc(nrm, dist)))
                depths.append(_neg(dist))
            W = _topk_rank_onehot(depths, 4)
            for r4 in range(4):
                p_r = [0.0, 0.0, 0.0]
                d_r = 0.0
                for s8 in range(8):
                    w = W[r4][s8]
                    p_r = _vadd(p_r, _sc(corners[s8], w))
                    d_r = _add(d_r, _mul(w, depths[s8]))
                slot_pos.append(p_r)
                slot_depth.append(d_r)
                slot_rest.append(d["rest"])
                slot_fric.append(d["fric"])

    ns = st.ns
    eps = float(cfg.contact_eps)
    slot_active = [_fgt(slot_depth[s], eps) for s in range(ns)]
    n_active = 0.0
    for a in slot_active:
        n_active = _add(n_active, a)
    cap = st.cap
    # narrowphase.collide: overflow only reported when a real cap binds
    if 0 < int(st.cfg.contact_cap) < ns:
        overflow = jnp.maximum(n_active - float(cap), 0.0)
    else:
        overflow = 0.0

    # ---- per-slot contact rows (engine/constraints.assemble_rows) ------
    # cols[s][i] = (v_col_i + w_col_i x p_s) over the slot body's
    # ancestor dofs; rows = D . cols with the STATIC tangent frame
    w_cols = [phi[i][:3] for i in range(n)]
    v_cols = [phi[i][3:] for i in range(n)]
    slot_J: List[List[List[Any]]] = []    # [slot][3 rows][n dofs]
    slot_vstar: List[List[Any]] = []      # [slot][3]
    slot_vnb: List[Any] = []              # normal . dq_before
    si = 0
    for d in st.slots:
        for _ in range(d["nslots"]):
            dofs = st.slot_dofs[si]
            D = [d["n"], d["t1"], d["t2"]]
            rows = [[0.0] * n for _ in range(3)]
            for i in dofs:
                col = _vadd(v_cols[i], _cross(w_cols[i], slot_pos[si]))
                for r3 in range(3):
                    rows[r3][i] = _dot(D[r3], col)
            slot_J.append(rows)
            vs = []
            for r3 in range(3):
                acc = 0.0
                for i in dofs:
                    acc = _add(acc, _mul(rows[r3][i], dq_star[i]))
                vs.append(acc)
            slot_vstar.append(vs)
            acc = 0.0
            for i in dofs:
                acc = _add(acc, _mul(rows[0][i], dq[i]))
            slot_vnb.append(acc)
            si += 1

    # per-slot b rows
    slot_b: List[List[Any]] = []
    for s in range(ns):
        bounce = _mul(slot_rest[s], jnp.maximum(_neg(slot_vnb[s]), 0.0))
        erp_push = jnp.minimum(
            _mul(float(cfg.erp) / dt,
                 jnp.maximum(_sub(slot_depth[s], float(cfg.allowance)),
                             0.0)),
            float(cfg.max_erv))
        desired = jnp.maximum(bounce, erp_push)
        slot_b.append([_sub(slot_vstar[s][0], desired),
                       slot_vstar[s][1], slot_vstar[s][2]])

    # ---- active-set compaction (score, top-cap, original order) --------
    if cap < ns:
        scores = [_add(_mul(slot_active[s], 1e4), slot_depth[s])
                  for s in range(ns)]
        W, _sel = _topk_ordered_onehot(scores, cap)
    else:
        W = [[1.0 if s == r else 0.0 for s in range(ns)]
             for r in range(cap)]

    def mix(vals):
        """Compact per-slot values (list over slots) with W."""
        out = []
        for r in range(cap):
            acc = 0.0
            for s in range(ns):
                acc = _add(acc, _mul(W[r][s], vals[s]))
            out.append(acc)
        return out

    c_active = mix(slot_active)
    c_fric = mix(slot_fric)
    sel_slots = mix([float(s) for s in range(ns)])

    # compacted rows
    m_c = st.m_c
    Jc = [[0.0] * n for _ in range(m_c)]
    bv = [0.0] * m_c
    lov = [0.0] * m_c
    hiv = [0.0] * m_c
    muv = [0.0] * m_c
    act = [0.0] * m_c
    for r in range(cap):
        for r3 in range(3):
            row = 3 * r + r3
            for i in range(n):
                acc = 0.0
                for s in range(ns):
                    if _st(slot_J[s][r3][i]) and slot_J[s][r3][i] == 0.0:
                        continue
                    acc = _add(acc, _mul(W[r][s], slot_J[s][r3][i]))
                Jc[row][i] = acc
            acc = 0.0
            for s in range(ns):
                acc = _add(acc, _mul(W[r][s], slot_b[s][r3]))
            bv[row] = acc
            lov[row] = 0.0 if r3 == 0 else -_BIG
            hiv[row] = _BIG
            muv[row] = 0.0 if r3 == 0 else c_fric[r]
            act[row] = c_active[r]

    # ---- limit rows -----------------------------------------------------
    row = 3 * cap
    for d_ in st.limit_dofs:
        lo_v = _sub(st.q_lower[d_], q[d_])
        hi_v = _sub(q[d_], st.q_upper[d_])
        high_active = hi_v > 0.0
        active_l = _mul(((lo_v > 0.0) | high_active).astype(jnp.float32),
                        st.limited[d_])
        sign = jnp.where(high_active, -1.0, 1.0)
        viol = jnp.maximum(jnp.maximum(lo_v, hi_v), 0.0)
        target = jnp.minimum(_mul(float(cfg.joint_erp) / dt, viol),
                             float(cfg.max_erv))
        Jc[row][d_] = sign
        bv[row] = _sub(_mul(sign, dq_star[d_]), target)
        lov[row] = 0.0
        hiv[row] = _BIG
        muv[row] = 0.0
        act[row] = active_l
        row += 1

    # ---- dof Coulomb friction rows -------------------------------------
    for d_ in st.friction_dofs:
        bound = st.dof_friction[d_] * dt
        Jc[row][d_] = 1.0
        bv[row] = dq_star[d_]
        lov[row] = -bound
        hiv[row] = bound
        muv[row] = 0.0
        act[row] = 1.0
        row += 1
    assert row == m_c

    # ---- A = J M^-1 J^T + cfm I, masked --------------------------------
    MinvJt = _chol_solve_env_multi(Mfull, Jc, n, eps=1e-10)
    A = [[None] * m_c for _ in range(m_c)]
    for i in range(m_c):
        for j in range(i + 1):
            aij = 0.0
            for k in range(n):
                aij = _add(aij, _mul(Jc[i][k], MinvJt[k][j]))
            if i == j:
                aij = _add(aij, float(cfg.cfm))
            A[i][j] = aij
            A[j][i] = aij
    for i in range(m_c):
        for j in range(m_c):
            A[i][j] = _mul(A[i][j], _mul(act[i], act[j]))
        A[i][i] = _add(A[i][i], _sub(1.0, act[i]))

    # ---- warm start: compact lam_prev, mask by active ------------------
    lam0 = [0.0] * m_c
    if lam_prev is not None:
        for r in range(cap):
            for r3 in range(3):
                acc = 0.0
                for s in range(ns):
                    acc = _add(acc, _mul(W[r][s], lam_prev[3 * s + r3]))
                lam0[3 * r + r3] = acc
        for t_ in range(m_c - 3 * cap):
            lam0[3 * cap + t_] = lam_prev[3 * ns + t_]
        lam0 = [_mul(lam0[i], act[i]) for i in range(m_c)]

    # ---- PGS sweeps (lcp/pgs row updates, SOR omega) -------------------
    findex = st.findex_c
    fidx = np.maximum(findex, 0)
    has_f = findex >= 0
    omega = float(cfg.pgs_omega)
    inv_d = []
    for i in range(m_c):
        di = A[i][i]
        inv_d.append(jnp.where(di > 1e-12,
                               omega / jnp.maximum(di, 1e-12), 0.0))
    lam = list(lam0)
    for _ in range(int(cfg.pgs_iters)):
        for i in range(m_c):
            w = bv[i]
            for j in range(m_c):
                w = _add(w, _mul(A[i][j], lam[j]))
            new = _sub(lam[i], _mul(w, inv_d[i]))
            if has_f[i]:
                bound = _mul(muv[i], lam[int(fidx[i])])
                lo_i = jnp.maximum(lov[i], -bound)
                hi_i = jnp.minimum(hiv[i], bound)
            else:
                lo_i, hi_i = lov[i], hiv[i]
            lam[i] = _mul(jnp.clip(new, lo_i, hi_i), act[i])

    # ---- fused normalized residual (lcp/hybrid.comp_residual) ----------
    scale = 1.0
    for i in range(m_c):
        scale = jnp.maximum(scale, jnp.abs(lam[i]))
    epsr = 1e-6 * scale + 1e-9
    res = 0.0
    for i in range(m_c):
        w = bv[i]
        for j in range(m_c):
            w = _add(w, _mul(A[i][j], lam[j]))
        if has_f[i]:
            bound = _mul(muv[i], jnp.abs(lam[int(fidx[i])]))
            lo_e = jnp.maximum(lov[i], -bound)
            hi_e = jnp.minimum(hiv[i], bound)
        else:
            lo_e = jnp.asarray(lov[i], jnp.float32)
            hi_e = jnp.asarray(hiv[i], jnp.float32)
        li = lam[i]
        at_lo = li <= lo_e + epsr
        at_hi = li >= hi_e - epsr
        r_i = jnp.where(at_lo & at_hi, 0.0,
                        jnp.where(at_lo, -w, jnp.where(at_hi, w,
                                                       jnp.abs(w))))
        r_i = jnp.maximum(r_i, jnp.maximum(lo_e - li, li - hi_e))
        act_i = jnp.asarray(act[i], jnp.float32) if _st(act[i]) else act[i]
        res = jnp.maximum(res, jnp.where(act_i > 0.5, r_i, 0.0))
    res = res / scale

    # ---- dq_plus + lam scatter back to the full row stack --------------
    dq_plus = []
    for k in range(n):
        acc = dq_star[k]
        for i in range(m_c):
            acc = _add(acc, _mul(MinvJt[k][i], lam[i]))
        dq_plus.append(acc)
    lam_full = [0.0] * st.layout.m
    for s in range(ns):
        for r3 in range(3):
            acc = 0.0
            for r in range(cap):
                acc = _add(acc, _mul(W[r][s], lam[3 * r + r3]))
            lam_full[3 * s + r3] = acc
    for t_ in range(st.layout.m - 3 * ns):
        lam_full[3 * ns + t_] = lam[3 * cap + t_]

    # the escalation driver's inputs are PACKED into one flat output:
    # the driver then gathers its worst-K envs with ONE jnp.take.  With
    # separate same-shaped outputs, the duplicate-gather pattern (several
    # takes with identical indices over identically-shaped pallas
    # outputs, fused into arithmetic + scatter) miscompiled on the
    # tunneled TPU backend — gather(dq_star) evaluated as
    # gather(dq_plus); forcing distinct buffer shapes via packing
    # sidesteps the fusion entirely (round-4 forensics).
    # (dq_star is NOT packed: the delta-form patches in escalate_batch
    # never read it — advisor r4 finding, saves n blocks/env of output)
    esc = (bv + lov + hiv + muv + act + lam
           + sel_slots
           + [Mfull[i][j] for i in range(n) for j in range(n)]
           + [Jc[i][k] for i in range(m_c) for k in range(n)])
    return dict(
        dq_star=dq_star, dq_plus=dq_plus, lam_c=lam, lam_full=lam_full,
        res=[res], b=bv, lo=lov, hi=hiv, mu=muv, act=act,
        Jc=[Jc[i][k] for i in range(m_c) for k in range(n)],
        M=[Mfull[i][j] for i in range(n) for j in range(n)],
        sel_slots=sel_slots, overflow=[overflow],
        con_pos=[slot_pos[s][k] for s in range(ns) for k in range(3)],
        con_depth=slot_depth,
        con_active=slot_active,
        esc=esc,
    )


def _chol_solve_env_multi(A, B_cols, n, eps):
    """Solve A X = B^T for m RHS given B as rows (m, n): returns
    X (n, m) lists — the same unrolled Cholesky as _chol_solve_env."""
    m = len(B_cols)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i][j]
            if j == i:
                s = _add(s, eps)
            for k in range(j):
                s = _sub(s, _mul(L[i][k], L[j][k]))
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    X = [[None] * m for _ in range(n)]
    for c in range(m):
        y = [None] * n
        for i in range(n):
            s = B_cols[c][i]
            for k in range(i):
                s = _sub(s, _mul(L[i][k], y[k]))
            y[i] = s / L[i][i]
        for i in range(n - 1, -1, -1):
            s = y[i]
            for k in range(i + 1, n):
                s = _sub(s, _mul(L[k][i], X[k][c]))
            X[i][c] = s / L[i][i]
    return X


# ---------------------------------------------------------------------------
# kernel + wrapper
# ---------------------------------------------------------------------------

# kernel outputs: the hot-path quantities plus ONE packed `esc` buffer
# holding everything the escalation driver needs (see _trace_substep's
# packing note; _esc_offsets gives the slice table)
_OUT_FIELDS = ("dq_plus", "lam_full", "res", "overflow", "con_pos",
               "con_depth", "con_active", "esc")


def _esc_layout(st: _SubStatic):
    n, m_c, cap = st.dyn.n, st.m_c, st.cap
    sizes = (("b", m_c), ("lo", m_c), ("hi", m_c), ("mu", m_c),
             ("act", m_c), ("lam_c", m_c),
             ("sel_slots", cap), ("M", n * n), ("Jc", m_c * n))
    off, table = 0, {}
    for name, k in sizes:
        table[name] = (off, off + k)
        off += k
    return table, off


def _out_sizes(st: _SubStatic):
    n, m_c, m, ns, cap = (st.dyn.n, st.m_c, st.layout.m, st.ns, st.cap)
    return dict(dq_plus=n, lam_full=m, res=1, overflow=1,
                con_pos=3 * ns, con_depth=ns, con_active=ns,
                esc=_esc_layout(st)[1])


def _substep_kernel(q_ref, dq_ref, tau_ref, lam_ref, *refs,
                    st: _SubStatic, fields,
                    dr_fields: Tuple[str, ...] = ()):
    n = st.dyn.n
    dtype = q_ref.dtype
    n_dr = len(dr_fields)
    dr_refs, out_refs = refs[:n_dr], refs[n_dr:]
    if dr_fields:
        dr = {f: [ref[0, i] for i in range(_dr_len(st, f))]
              for f, ref in zip(dr_fields, dr_refs)}
        st = _apply_dr_sub(st, dr)
    q = [q_ref[0, d] for d in range(n)]
    dq = [dq_ref[0, d] for d in range(n)]
    tau = [tau_ref[0, d] for d in range(n)]
    lam_prev = [lam_ref[0, d] for d in range(st.layout.m)]
    outs = _trace_substep(st, q, dq, tau, lam_prev)
    for ref, name in zip(out_refs, fields):
        vals = outs[name]
        for k, v in enumerate(vals):
            ref[0, k] = _blk(v, dtype)


def substep_pallas(model: SkelModel, q, dq, tau, lam_prev,
                   st: Optional[_SubStatic] = None,
                   interpret: bool = False,
                   dr_fields: Tuple[str, ...] = (), dr_vals=()):
    """Batched fused substep.  q/dq/tau: (B, n); lam_prev: (B, m).

    Returns a dict of (B, k) arrays for every _OUT_FIELDS entry.

    dr_fields / dr_vals: domain-randomized leaves as per-env runtime
    inputs (subset of DR_FIELDS_SUB); dr_vals[i] is (B,) + leaf.shape,
    flattened to (B, k) and fed as one more lane-major block input."""
    if st is None:
        st = _SubStatic(model)
    n = st.dyn.n
    B = q.shape[0]
    dtype = q.dtype
    G = -(-B // TBE)
    Bp = G * TBE
    pad = Bp - B

    def to_blocks(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
        return jnp.transpose(
            x.reshape(G, SUB, LANE, x.shape[-1]), (0, 3, 1, 2))

    args = [to_blocks(v) for v in (q, dq, tau, lam_prev)]
    args += [to_blocks(jnp.asarray(v, dtype).reshape(B, -1))
             for v in dr_vals]

    def spec(k):
        return pl.BlockSpec((1, k, SUB, LANE), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                            memory_space=pltpu.VMEM)

    sizes = _out_sizes(st)
    # zero-size outputs (contact-free models have no con_* slots) are
    # synthesized outside the kernel — pallas rejects empty blocks
    fields = tuple(f for f in _OUT_FIELDS if sizes[f] > 0)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((G, sizes[f], SUB, LANE), dtype)
        for f in fields)
    kernel = functools.partial(_substep_kernel, st=st, fields=fields,
                               dr_fields=tuple(dr_fields))
    kernel = _x64_safe_kernel(kernel, dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec(a.shape[1]) for a in args],
        out_specs=tuple(spec(s.shape[1]) for s in out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)

    def from_blocks(y):
        return jnp.transpose(y, (0, 2, 3, 1)).reshape(Bp, y.shape[1])[:B]

    result = {f: from_blocks(o) for f, o in zip(fields, outs)}
    for f in _OUT_FIELDS:
        if f not in result:
            result[f] = jnp.zeros((B, 0), dtype=dtype)
    return result


# ---------------------------------------------------------------------------
# engine integration: custom_vmap substep phase + escalation driver
# ---------------------------------------------------------------------------


def escalate_batch(st: _SubStatic, cfg, outs, dq_plus, lam_full,
                   exact1, exact2, dtype, ref64_passes: int = 0,
                   refc_passes: int = 0,
                   with_diag: bool = False):
    """The hybrid exact-escalation driver over the kernel's outputs:
    top-K by residual, ONE gather of the packed `esc` buffer, operator
    rebuild, warm tier-1 (+ optional cold tier-2) BPP re-solve, an
    optional mixed-precision f64-residual refinement (ref64_passes > 0,
    requires x64 — lcp/dantzig.refine_mixed), and DELTA-form
    scatter-add patches (never a second gather — see the packing note
    in _trace_substep).  Module-level so the TPU-only driver logic is
    unit-testable on CPU against XLA-built outs
    (tests/test_pallas_substep.py)."""
    from dartenv_tpu.lcp.hybrid import comp_residual
    from dartenv_tpu.math.linalg import chol, chol_solve, inv_psd, \
        _pmm, _UNROLL_MAX

    n, m_c, ns, cap = st.dyn.n, st.m_c, st.ns, st.cap
    B = dq_plus.shape[0]
    res = outs["res"][:, 0]
    K = min(B, int(cfg.escalate_kmax),
            max(1, int(np.ceil(B * cfg.escalate_frac))))
    worst, idx = jax.lax.top_k(res, K)
    esc_k = jnp.take(outs["esc"], idx, axis=0)
    tab, _ = _esc_layout(st)
    cut = lambda name: esc_k[:, tab[name][0]: tab[name][1]]
    bk, lok, hik = cut("b"), cut("lo"), cut("hi")
    muk, actk, lamk = cut("mu"), cut("act"), cut("lam_c")
    sel_k = cut("sel_slots")
    Mk = cut("M").reshape(K, n, n)
    Jk = cut("Jc").reshape(K, m_c, n)
    if n > _UNROLL_MAX:
        MinvJt_k = _pmm(inv_psd(Mk, eps=1e-10),
                        jnp.swapaxes(Jk, -1, -2))
    else:
        Lk = chol(Mk, eps=1e-10)
        MinvJt_k = chol_solve(Lk, jnp.swapaxes(Jk, -1, -2))
    # precision-safe mul+reduce (a default einsum runs bf16 MXU passes)
    Ak = _pmm(Jk, MinvJt_k) + cfg.cfm * jnp.eye(m_c, dtype=dtype)
    Ak = (Ak * actk[:, :, None] * actk[:, None, :]
          + jnp.eye(m_c, dtype=dtype) * (1.0 - actk)[:, None, :])
    lam_ex = jax.vmap(exact1)(Ak, bk, lok, hik, muk, actk, lamk)
    res_ex = comp_residual(Ak, bk, lam_ex, lok, hik, st.findex_c,
                           muk, actk)
    take = (worst > cfg.escalate_tol) & (res_ex < worst)
    lam_new = jnp.where(take[:, None], lam_ex, lamk)
    if exact2 is not None:
        res_kept = jnp.where(take, res_ex, worst)
        lam_c2 = jax.vmap(exact2)(Ak, bk, lok, hik, muk, actk,
                                  jnp.zeros_like(bk))
        res_c2 = comp_residual(Ak, bk, lam_c2, lok, hik,
                               st.findex_c, muk, actk)
        take2 = (res_kept > cfg.escalate_tol) & (res_c2 < res_kept)
        lam_new = jnp.where(take2[:, None], lam_c2, lam_new)
        take = take | take2
    if ref64_passes > 0 or refc_passes > 0:
        from dartenv_tpu.lcp.dantzig import (
            refine_compensated, refine_mixed)

        rf, rp = ((refine_mixed, ref64_passes) if ref64_passes > 0
                  else (refine_compensated, refc_passes))
        res_cur = jnp.where(
            take, comp_residual(Ak, bk, lam_new, lok, hik, st.findex_c,
                                muk, actk), worst)
        lam_ref = rf(Ak, bk, lok, hik, st.findex_c, muk, actk,
                     lam_new, passes=rp)
        res_ref = comp_residual(Ak, bk, lam_ref, lok, hik, st.findex_c,
                                muk, actk)
        takeR = (res_cur > cfg.escalate_tol) & (res_ref < res_cur)
        lam_new = jnp.where(takeR[:, None], lam_ref, lam_new)
        take = take | takeR
    dlam = jnp.where(take[:, None], lam_new - lamk, 0.0)
    dqp_delta = jnp.sum(MinvJt_k * dlam[:, None, :], axis=-1)
    Wk = (sel_k[:, :, None]
          == jnp.arange(ns, dtype=dtype)[None, None, :]).astype(dtype)
    dlam_con = dlam[:, : 3 * cap].reshape(K, cap, 3)
    scat = jnp.sum(
        Wk[:, :, :, None] * dlam_con[:, :, None, :], axis=1
    ).reshape(K, 3 * ns)
    lamf_delta = jnp.concatenate([scat, dlam[:, 3 * cap:]], axis=1)
    out = (dq_plus.at[idx].add(dqp_delta),
           lam_full.at[idx].add(lamf_delta))
    if with_diag:
        # post-escalation residual envelope over the FULL batch: every
        # env's pre-escalation kernel residual, with the escalated K
        # overwritten by their kept points' residual
        # (scripts/residual_envelope.py — VERDICT r4 weak #5)
        res_k = comp_residual(Ak, bk, lam_new, lok, hik, st.findex_c,
                              muk, actk)
        res_final = jnp.where(take, res_k, worst)
        envelope = res.at[idx].set(res_final)
        out = out + (dict(res_pre=res, idx=idx, envelope=envelope),)
    return out


def make_substep_phase(model: SkelModel, interpret: bool = False,
                       dr_fields: Tuple[str, ...] = ()):
    """(q, dq, lam_prev, tau, *dr_vals) -> (q_new, dq_plus, lam_full,
    Contacts) with TPU batch redirection to the fused substep kernel +
    the hybrid exact-escalation driver.  Single-env / CPU / f64 paths run
    the exact XLA composition of engine/world.make_sim_step.  None when
    the model is unsupported (caller keeps the phase-wise path).

    interpret=True forces the kernel path in Pallas interpret mode on
    any backend — the test hook that exercises the full kernel AND the
    escalation driver on CPU.

    dr_fields: domain-randomized leaves (subset of DR_FIELDS_SUB) passed
    as EXPLICIT per-env arguments after tau — `model` must then be the
    CONCRETE base model; its values for those fields are ignored
    (VERDICT r4 order #2; engine/world.make_dr_sim_step is the caller)."""
    import os

    if any(isinstance(leaf, jax.core.Tracer)
           for leaf in jax.tree_util.tree_leaves(model)):
        return None    # traced model without the explicit-dr route
        #                (checked FIRST: the support test below reads
        #                model leaves host-side)
    dr_fields = tuple(dr_fields)
    if any(f not in DR_FIELDS_SUB for f in dr_fields):
        return None
    if not substep_supported(model) or \
            os.environ.get("DARTENV_NO_SUBSTEP_KERNEL"):
        return None
    if model.solver.solver == "dantzig":
        return None                      # exact-everywhere mode: XLA path
    from dartenv_tpu.collision.narrowphase import Contacts, collide
    from dartenv_tpu.dynamics import batched
    from dartenv_tpu.engine.constraints import solve_constraints
    from dartenv_tpu.lcp.hybrid import comp_residual
    from dartenv_tpu.lcp.pgs import _on_tpu
    from dartenv_tpu.math.linalg import chol, chol_solve, inv_psd, \
        _pmm, _UNROLL_MAX

    st = _SubStatic(model)
    layout = st.layout
    cfg = model.solver
    dt = float(model.dt)
    n, m_c, ns, cap = st.dyn.n, st.m_c, st.ns, st.cap

    # static per-slot contact attributes for the kernel-path Contacts
    slot_normal = np.zeros((ns, 3))
    slot_fric = np.zeros(ns)
    slot_rest = np.zeros(ns)
    slot_gi = np.zeros(ns, dtype=np.int64)
    slot_wi = np.zeros(ns, dtype=np.int64)
    si = 0
    for d in st.slots:
        for _ in range(d["nslots"]):
            slot_normal[si] = np.asarray(d["n"])
            slot_fric[si] = d["fric"]
            slot_rest[si] = d["rest"]
            slot_gi[si] = d["gi"]
            slot_wi[si] = d["wi"]
            si += 1

    def _xla_single(q, dq, lam_prev, tau, *dr_vals):
        m = (model.replace(**dict(zip(dr_fields, dr_vals)))
             if dr_fields else model)
        kin = batched.bkin(m, q, dq)
        ddq, M = batched.forward_dynamics(m, kin, q, dq, tau, dt, None)
        dq_star = dq + dt * ddq
        contacts = collide(m, kin.R_w, kin.p_w)
        dq_plus, lam = solve_constraints(
            m, layout, kin.phi, M, q, dq, dq_star, contacts, dt,
            lam_prev=lam_prev)
        q_new = batched.integrate_positions(m, q, dq_plus, dt)
        return q_new, dq_plus, lam, contacts

    _exact1 = None
    _exact2 = None
    # mixed-precision refinement needs f64 ARRAYS to exist — read the
    # x64 switch at construction (it is process-global and set before
    # env/bench setup); silently inert when x64 is off
    _ref64 = (int(cfg.escalate_ref64)
              if jax.config.jax_enable_x64 else 0)
    # compensated double-float tier: no x64 needed (production default);
    # ref64 wins when both are configured and x64 is on
    _refc = 0 if _ref64 > 0 else int(cfg.escalate_ref)
    if cfg.escalate_frac > 0.0 and m_c > 0:
        from dartenv_tpu.lcp.dantzig import make_exact_solver

        _exact1 = make_exact_solver(
            st.findex_c, iters=cfg.escalate_iters, polish_iters=3,
            refine_iters=(None if cfg.escalate_refine < 0
                          else cfg.escalate_refine))
        if cfg.escalate_iters2 > 0:
            _exact2 = make_exact_solver(st.findex_c,
                                        iters=cfg.escalate_iters2,
                                        polish_iters=6)

    def _slot_attr(dr, g_field, w_field, static_arr, g_idx, w_idx,
                   combine, B, dtype):
        """Per-env (B, ns) slot friction/restitution when either side is
        domain-randomized; static broadcast otherwise."""
        if g_field not in dr and w_field not in dr:
            return jnp.broadcast_to(jnp.asarray(static_arr, dtype),
                                    (B, len(g_idx)))
        gv = (dr[g_field] if g_field in dr
              else jnp.broadcast_to(jnp.asarray(
                  np.asarray(getattr(model, g_field)), dtype),
                  (B, st.ng)))
        wv = (dr[w_field] if w_field in dr
              else jnp.broadcast_to(jnp.asarray(
                  np.asarray(getattr(model, w_field)), dtype),
                  (B, st.nw)))
        return combine(gv[:, g_idx], wv[:, w_idx])

    def _kernel_path(q, dq, lam_prev, tau, dr_vals):
        B = q.shape[0]
        dtype = q.dtype
        outs = substep_pallas(model, q, dq, tau, lam_prev, st=st,
                              interpret=interpret, dr_fields=dr_fields,
                              dr_vals=dr_vals)
        dq_plus, lam_full = outs["dq_plus"], outs["lam_full"]

        if _exact1 is not None:
            dq_plus, lam_full = escalate_batch(
                st, cfg, outs, dq_plus, lam_full, _exact1, _exact2,
                dtype, ref64_passes=_ref64, refc_passes=_refc)

        q_new = jax.vmap(
            lambda qq, dd: batched.integrate_positions(model, qq, dd, dt)
        )(q, dq_plus)
        dr = dict(zip(dr_fields, dr_vals))
        contacts = Contacts(
            pos=outs["con_pos"].reshape(B, ns, 3),
            normal=jnp.broadcast_to(
                jnp.asarray(slot_normal, dtype), (B, ns, 3)),
            depth=outs["con_depth"],
            active=outs["con_active"],
            friction=_slot_attr(dr, "geom_friction", "wg_friction",
                                slot_fric, slot_gi, slot_wi,
                                jnp.minimum, B, dtype),
            restitution=_slot_attr(dr, "geom_restitution",
                                   "wg_restitution", slot_rest,
                                   slot_gi, slot_wi, jnp.maximum, B,
                                   dtype),
            overflow=outs["overflow"][:, 0],
        )
        return q_new, dq_plus, lam_full, contacts

    @jax.custom_batching.custom_vmap
    def sub(q, dq, lam_prev, tau, *dr_vals):
        return _xla_single(q, dq, lam_prev, tau, *dr_vals)

    @sub.def_vmap
    def _batched_rule(axis_size, in_batched, *args):
        args = [
            a if bat else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, bat in zip(args, in_batched)
        ]
        q, dq, lam_prev, tau = args[:4]
        dr_vals = tuple(args[4:])
        if (interpret or _on_tpu()) and q.dtype == jnp.float32:
            out = _kernel_path(q, dq, lam_prev, tau, dr_vals)
        else:
            out = jax.vmap(_xla_single)(q, dq, lam_prev, tau, *dr_vals)
        flags = jax.tree_util.tree_map(lambda _: True, out)
        return out, flags

    return sub
