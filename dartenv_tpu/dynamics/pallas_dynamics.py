"""Pallas TPU kernel: the fused smooth-dynamics phase.

VERDICT.md r3 order #1: the dynamics block is 57% of the walker2d substep
(246 of 433 ns/env-substep) and was the only hot phase with no kernel.
The XLA formulation (dynamics/batched.py) is correct but layout-hostile:
per-env quantities are (nb, 3, 3) / (n, 6) arrays whose tiny trailing
dims occupy 3-6 of 128 lanes, and every phase boundary materializes
intermediates through HBM.

This kernel computes the ENTIRE phase — joint transforms, the kinematic
tree recursion, world Jacobian columns, mass matrix, bias forces, and the
implicit-scheme forward-dynamics solve — for a tile of 1024 envs with the
env batch laid out as full (8, 128) float32 registers:

  * every per-env scalar is one (sublane, lane) = (8, 128) block — 100%
    VPU occupancy for every op (the XLA layout uses ~4%);
  * ALL model data (topology, joint frames, axes, inertias) is static and
    baked into the kernel as Python floats, through a tiny constant-
    folding scalar algebra (`_mul`/`_add` below) that eliminates every
    multiply-by-0/1 at trace time — identity joint frames, axis-aligned
    axes and zero COMs cost nothing;
  * the tree recursion is a static unroll over bodies with STATIC parent
    indices (the lax.scan + dynamic-gather formulation that wins in XLA
    loses here: in-kernel, values live in vector registers and the unroll
    is free — this is the fused-substep design BENCH.md round 3 named as
    the next lever after scan unrolling lost at the XLA level);
  * the mass matrix uses the world-origin composite form
    M[i,j] = sum_b phi_i^T I_w(b) phi_j over STATIC ancestor-pair
    sparsity, with I_w built structurally from (m, d, R Ic R^T)
    (d = world COM) instead of a dense 6x6 congruence;
  * the n x n SPD solve is the same unrolled Cholesky as math/linalg.chol
    (eps=1e-10, sqrt(max(s, 1e-30)) — numerics-identical policy).

Boundary contract (identical quantities to the XLA phase in
engine/world.make_sim_step): (q, dq, tau) -> (dq_star, M, phi, R_w, p_w).
Collision, constraint assembly, the PGS/hybrid LCP kernels and position
integration stay outside, unchanged.

Joint coverage: REVOLUTE, PRISMATIC, PLANAR, TRANSLATIONAL, WELD, FREE,
BALL, UNIVERSAL, EULER, SCREW — every type the engine supports.
`make_dynamics_phase` returns a custom_vmap'd callable whose single-env /
CPU / f64 paths run the exact dynamics/batched.py code (so validation
semantics are untouched); only a vmapped f32 batch on TPU dispatches to
the kernel (the same redirect pattern as lcp/pallas_pgs.py).

Reference parity: same quantities as `Skeleton::computeForwardDynamics` /
`updateMassMatrix` † (SURVEY.md §2.4) with DART's implicit joint
spring/damping scheme ‡, matching dynamics/batched.forward_dynamics.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dartenv_tpu.model.skel_model import (
    BALL, EULER, FREE, PLANAR, PRISMATIC, REVOLUTE, SCREW, SkelModel,
    TRANSLATIONAL, UNIVERSAL, WELD,
)

SUB, LANE = 8, 128
TBE = SUB * LANE        # envs per tile


def _x64_safe_kernel(kernel, dtype):
    """Trace `kernel` with x64 disabled when the process has it on.

    With jax_enable_x64, Python float literals inside the trace are
    weak-f64, so `jnp.where(c, -1.0, 1.0)` / `jnp.clip(x, 0.0, 1e20)`
    materialize f64 scalars INSIDE the Pallas kernel — Mosaic has no f64
    and its convert-lowering recurses to a RecursionError.  Production
    blocks are f32; re-tracing the body under `jax.enable_x64(False)`
    keeps every literal weak-f32 without touching the direct
    `_trace_substep` / `_trace_env` f64 validation paths (which never go
    through pallas_call).  x64 stays available OUTSIDE the kernel for
    the mixed-precision escalation tier (lcp/dantzig.refine_mixed)."""
    if not jax.config.jax_enable_x64 or dtype == jnp.float64:
        return kernel

    def wrapped(*refs):
        with jax.enable_x64(False):
            kernel(*refs)

    return wrapped


# ---------------------------------------------------------------------------
# constant-folding scalar algebra: values are Python floats (static model
# constants) or (8, 128) jnp blocks (per-env runtime values).  Multiplies
# by static 0/1 and additions of static 0 vanish at trace time, so
# identity joint frames / sparse axes / zero COMs generate no ops.
# ---------------------------------------------------------------------------

def _st(x) -> bool:
    return isinstance(x, (int, float))


def _mul(a, b):
    if _st(a) and _st(b):
        return a * b
    if _st(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
    if _st(b):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def _add(a, b):
    if _st(a) and _st(b):
        return a + b
    if _st(a) and a == 0.0:
        return b
    if _st(b) and b == 0.0:
        return a
    return a + b


def _sub(a, b):
    if _st(a) and _st(b):
        return a - b
    if _st(b) and b == 0.0:
        return a
    if _st(a) and a == 0.0:
        return _neg(b)
    return a - b


def _neg(a):
    if _st(a):
        return -a
    return -a


def _dot(u, v):
    s = 0.0
    for a, b in zip(u, v):
        s = _add(s, _mul(a, b))
    return s


def _sc(v, s):
    return [_mul(x, s) for x in v]


def _vadd(u, v):
    return [_add(a, b) for a, b in zip(u, v)]


def _vsub(u, v):
    return [_sub(a, b) for a, b in zip(u, v)]


def _cross(u, v):
    return [
        _sub(_mul(u[1], v[2]), _mul(u[2], v[1])),
        _sub(_mul(u[2], v[0]), _mul(u[0], v[2])),
        _sub(_mul(u[0], v[1]), _mul(u[1], v[0])),
    ]


def _m3v(M, v):
    return [_dot(row, v) for row in M]


def _m3tv(M, v):
    """M^T v."""
    return [_dot([M[0][j], M[1][j], M[2][j]], v) for j in range(3)]


def _m3m(A, B):
    return [[_dot(A[i], [B[0][j], B[1][j], B[2][j]]) for j in range(3)]
            for i in range(3)]


def _m3t(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def _np3(a) -> List[List[float]]:
    return [[float(a[i, j]) for j in range(3)] for i in range(3)]


def _npv(a) -> List[float]:
    return [float(x) for x in a]


_EYE3 = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def _unitize(u: List[float]) -> Tuple[List[float], float]:
    """Split a static axis into (unit axis, norm); batched._rod uses
    so3_exp(axis * q), so a non-unit axis scales the angle."""
    nrm = float(np.sqrt(sum(x * x for x in u)))
    if nrm < 1e-12:
        return [0.0, 0.0, 0.0], 0.0
    return [x / nrm for x in u], nrm


def _rod_static_axis(u: List[float], s, c):
    """Rodrigues for a STATIC unit axis u and runtime sin/cos blocks:
    R = I + s K + (1-c) K^2, K = skew(u) — entries affine in (s, 1-c)."""
    K = [[0.0, -u[2], u[1]], [u[2], 0.0, -u[0]], [-u[1], u[0], 0.0]]
    K2 = [[sum(K[i][k] * K[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]
    omc = _sub(1.0, c)
    return [[_add(_add(_EYE3[i][j], _mul(K[i][j], s)),
                  _mul(K2[i][j], omc)) for j in range(3)] for i in range(3)]


def _rot_static_vec(u: List[float], a: List[float], s, c):
    """rod(u, theta) @ a for STATIC unit axis u and static vector a:
    c*a + s*(u x a) + (1-c)*(u.a)*u   (exact, no orthogonality assumed)."""
    w = _cross(u, a)          # static floats
    d = sum(ui * ai for ui, ai in zip(u, a))
    return [
        _add(_add(_mul(c, a[k]), _mul(s, w[k])),
             _mul(_sub(1.0, c), d * u[k]))
        for k in range(3)
    ]


def _rot_static_vec_dot(u: List[float], a: List[float], s, c, thdot):
    """d/dt of _rot_static_vec at theta(t): thdot * (-s*a + c*(u x a) +
    s*(u.a)*u)."""
    w = _cross(u, a)
    d = sum(ui * ai for ui, ai in zip(u, a))
    return [
        _mul(thdot,
             _add(_add(_mul(_neg(s), a[k]), _mul(c, w[k])),
                  _mul(s, d * u[k])))
        for k in range(3)
    ]


def _rot_runtime_vec(u: List[float], g, s, c):
    """rod(u, theta) @ g for STATIC axis u, RUNTIME vector g."""
    w = _cross(u, g)
    d = _dot([u[0], u[1], u[2]], g)
    return [
        _add(_add(_mul(c, g[k]), _mul(s, w[k])),
             _mul(_sub(1.0, c), _mul(d, u[k])))
        for k in range(3)
    ]


def _so3_exp_runtime(w):
    """Rodrigues for a RUNTIME rotation vector (FREE/BALL joints),
    Taylor-safe at 0 — mirrors math/spatial.so3_exp."""
    t2 = _add(_add(_mul(w[0], w[0]), _mul(w[1], w[1])), _mul(w[2], w[2]))
    theta = jnp.sqrt(t2 + 1e-18)
    small = t2 < 1e-12
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2)
    K = [[0.0, _neg(w[2]), w[1]], [w[2], 0.0, _neg(w[0])],
         [_neg(w[1]), w[0], 0.0]]
    K2 = _m3m(K, K)
    return [[_add(_add(_EYE3[i][j], _mul(a, K[i][j])), _mul(b, K2[i][j]))
             for j in range(3)] for i in range(3)]


# ---------------------------------------------------------------------------
# spatial helpers on [w(3); v(3)] 6-vectors of blocks
# ---------------------------------------------------------------------------

def _xmotion_apply(E, r, v6):
    """[E,0; -E r^, E] v — math/spatial.xmotion_apply."""
    w, vl = v6[:3], v6[3:]
    wE = _m3v(E, w)
    vE = _m3v(E, _vsub(vl, _cross(r, w)))
    return wE + vE


def _crm(v6, m6):
    w, vl = v6[:3], v6[3:]
    mw, ml = m6[:3], m6[3:]
    return _cross(w, mw) + _vadd(_cross(w, ml), _cross(vl, mw))


def _crf(v6, f6):
    w, vl = v6[:3], v6[3:]
    n, fl = f6[:3], f6[3:]
    return _vadd(_cross(w, n), _cross(vl, fl)) + _cross(w, fl)


# ---------------------------------------------------------------------------
# static model digest
# ---------------------------------------------------------------------------

_SUPPORTED = {WELD, REVOLUTE, PRISMATIC, UNIVERSAL, EULER, BALL,
              TRANSLATIONAL, PLANAR, FREE, SCREW}

# Model leaves the kernel can take as PER-ENV runtime inputs instead of
# baked Python floats (VERDICT r4 order #2: domain randomization must not
# forfeit the kernels).  Each listed leaf is pure VALUE data consumed by
# the scalar-block trace — substituting an (8, 128) block for the float
# simply disables constant folding on the terms it touches.  Leaves that
# shape the STATIC structure (topology, joint axes/frames, layout masks)
# are intentionally absent.
DR_FIELDS_DYN = ("mass", "com", "inertia", "damping", "spring_stiff",
                 "rest_pos", "gravity")

# model field -> (st attribute, flattened per-env length fn)
_DR_SPEC = {
    "mass": ("mass", lambda st: st.nb),
    "com": ("com", lambda st: 3 * st.nb),
    "inertia": ("inertia", lambda st: 9 * st.nb),
    "damping": ("damping", lambda st: st.n),
    "spring_stiff": ("spring", lambda st: st.n),
    "rest_pos": ("rest", lambda st: st.n),
    "gravity": ("gravity", lambda st: 3),
}


def _apply_dr(st: "_Static", dr: Dict[str, List[Any]]) -> "_Static":
    """Shallow copy of the static digest with the given leaves replaced
    by per-env runtime blocks (flattened lists, row-major like the model
    arrays).  The trace code is value-agnostic: blocks flow through the
    same `_mul`/`_add` algebra, just without folding."""
    import copy

    st2 = copy.copy(st)
    nb = st.nb
    for f, v in dr.items():
        if f == "mass":
            st2.mass = list(v)
        elif f == "com":
            st2.com = [[v[b * 3 + k] for k in range(3)] for b in range(nb)]
        elif f == "inertia":
            st2.inertia = [[[v[b * 9 + i * 3 + j] for j in range(3)]
                            for i in range(3)] for b in range(nb)]
        elif f == "damping":
            st2.damping = list(v)
        elif f == "spring_stiff":
            st2.spring = list(v)
        elif f == "rest_pos":
            st2.rest = list(v)
        elif f == "gravity":
            st2.gravity = list(v)
        else:
            raise KeyError(f"unsupported DR field {f!r}")
    return st2


def supported(model: SkelModel) -> bool:
    return (set(model.joint_type) <= _SUPPORTED
            and model.nb >= 1)


class _Static:
    """Per-model static data as plain floats (hashable per model id)."""

    def __init__(self, model: SkelModel):
        self.nb, self.n = model.nb, model.n
        self.parent = [int(p) for p in model.parent]
        self.jt = [int(t) for t in model.joint_type]
        self.q_start = [int(q) for q in model.q_start]
        self.ndof = [int(d) for d in model.ndof]
        self.pj_rot = [_np3(np.asarray(model.pj_rot[b])) for b in range(self.nb)]
        self.pj_pos = [_npv(np.asarray(model.pj_pos[b])) for b in range(self.nb)]
        cj_rot = [np.asarray(model.cj_rot[b], dtype=np.float64)
                  for b in range(self.nb)]
        cj_pos = [np.asarray(model.cj_pos[b], dtype=np.float64)
                  for b in range(self.nb)]
        self.cj_rot = [_np3(R) for R in cj_rot]
        self.cj_pos = [_npv(p) for p in cj_pos]
        # inv(T_cj) applied on the right: R_rel = R1 @ cj_rot^T,
        # p_rel = p1 + R1 @ (-cj_rot^T cj_pos)
        self.cji_rot = [_np3(R.T) for R in cj_rot]
        self.cji_pos = [_npv(-(R.T @ p)) for R, p in zip(cj_rot, cj_pos)]
        self.axes = [np.asarray(model.axes[b], dtype=np.float64)
                     for b in range(self.nb)]
        self.mass = [float(np.asarray(model.mass)[b]) for b in range(self.nb)]
        self.com = [_npv(np.asarray(model.com[b])) for b in range(self.nb)]
        self.inertia = [_np3(np.asarray(model.inertia[b]))
                        for b in range(self.nb)]
        self.gravity = _npv(np.asarray(model.gravity))
        self.damping = _npv(np.asarray(model.damping))
        self.spring = _npv(np.asarray(model.spring_stiff))
        self.rest = _npv(np.asarray(model.rest_pos))
        # children lists for subtree force accumulation (leaf -> root)
        self.children: List[List[int]] = [[] for _ in range(self.nb)]
        for b, p in enumerate(self.parent):
            if p >= 0:
                self.children[p].append(b)
        # ancestor dof lists per body (for the Jacobian/M sparsity)
        self.body_dofs: List[List[int]] = []
        for b in range(self.nb):
            dofs: List[int] = []
            bb = b
            while bb >= 0:
                dofs = list(range(self.q_start[bb],
                                  self.q_start[bb] + self.ndof[bb])) + dofs
                bb = self.parent[bb]
            self.body_dofs.append(dofs)
        self.dof_body = [0] * self.n
        for b in range(self.nb):
            for d in range(self.q_start[b], self.q_start[b] + self.ndof[b]):
                self.dof_body[d] = b


def _ad_cj(st: _Static, b: int, row6):
    """Ad_{T_cj}: joint-frame S column -> child-body frame
    (dynamics/batched.dof_S_child's `ad`)."""
    cjR, cjp = st.cj_rot[b], st.cj_pos[b]
    w, v = row6[:3], row6[3:]
    wb = _m3v(cjR, w)
    vb = _vadd(_m3v(cjR, v), _cross(cjp, wb))
    return wb + vb


def _joint_kin(st: _Static, b: int, q, dq):
    """Joint b's (R_j, p_j, S_rows, Sdot_rows) in the JOINT frame.

    q, dq: full dof lists of blocks.  S rows follow dof order (ndof rows
    of 6 entries); static rows come out as float lists (folded later).
    Mirrors dynamics/batched.joint_S / joint_transforms exactly, with the
    jvp-derived S-dot rows written out analytically.
    """
    t = st.jt[b]
    qs = st.q_start[b]
    ax = st.axes[b]
    z3 = [0.0, 0.0, 0.0]
    eye = _EYE3

    def sincos(row: int, d: int):
        """(unit axis, sin, cos, scaled rate) for rotation so3_exp(ax*q):
        a non-unit static axis scales the effective angle (batched._rod)."""
        u, nrm = _unitize(_npv(ax[row]))
        th = _mul(nrm, q[d])
        return u, jnp.sin(th), jnp.cos(th), _mul(nrm, dq[d])

    if t == WELD:
        return eye, list(z3), [], []
    if t == REVOLUTE:
        u, s, c, _ = sincos(0, qs)
        R = _rod_static_axis(u, s, c)
        return R, list(z3), [_npv(ax[0]) + z3], [[0.0] * 6]
    if t == PRISMATIC:
        u = _npv(ax[0])
        return eye, _sc(u, q[qs]), [z3 + u], [[0.0] * 6]
    if t == SCREW:
        u, s, c, _ = sincos(0, qs)
        pu = _npv(ax[1])
        R = _rod_static_axis(u, s, c)
        return R, _sc(pu, q[qs]), [_npv(ax[0]) + pu], [[0.0] * 6]
    if t == UNIVERSAL:
        a0, a1 = _npv(ax[0]), _npv(ax[1])
        u0, s0, c0, _ = sincos(0, qs)
        u1, s1, c1, r1 = sincos(1, qs + 1)
        R = _m3m(_rod_static_axis(u0, s0, c0), _rod_static_axis(u1, s1, c1))
        # S (batched.joint_S): s_a = R2^T a0 (rotate a0 by -q1 about u1),
        # s_b = a1
        sa = _rot_static_vec(u1, a0, _neg(s1), c1)
        sa_d = _rot_static_vec_dot(u1, a0, _neg(s1), c1, _neg(r1))
        return R, list(z3), [sa + z3, a1 + z3], [sa_d + z3, [0.0] * 6]
    if t == EULER:
        a0, a1, a2 = _npv(ax[0]), _npv(ax[1]), _npv(ax[2])
        u0, s0, c0, _ = sincos(0, qs)
        u1, s1, c1, r1 = sincos(1, qs + 1)
        u2, s2, c2, r2 = sincos(2, qs + 2)
        R = _m3m(_rod_static_axis(u0, s0, c0),
                 _m3m(_rod_static_axis(u1, s1, c1),
                      _rod_static_axis(u2, s2, c2)))
        # S rows (batched.joint_S): s1 = R3^T R2^T a0, s2 = R3^T a1,
        # s3 = a2  (R2 = rod(a1, q1), R3 = rod(a2, q2))
        g = _rot_static_vec(u1, a0, _neg(s1), c1)          # R2^T a0
        gd = _rot_static_vec_dot(u1, a0, _neg(s1), c1, _neg(r1))
        h = _rot_runtime_vec(u2, g, _neg(s2), c2)          # R3^T g
        # dh = R3^T gd + q2dot * (-u2 x h)
        hd = _vadd(_rot_runtime_vec(u2, gd, _neg(s2), c2),
                   _sc(_cross([_neg(x) for x in u2], h), r2))
        sb = _rot_static_vec(u2, a1, _neg(s2), c2)         # R3^T a1
        sbd = _rot_static_vec_dot(u2, a1, _neg(s2), c2, _neg(r2))
        return (R, list(z3),
                [h + z3, sb + z3, a2 + z3],
                [hd + z3, sbd + z3, [0.0] * 6])
    if t == BALL:
        w = [q[qs], q[qs + 1], q[qs + 2]]
        R = _so3_exp_runtime(w)
        S = [[1.0, 0.0, 0.0] + z3, [0.0, 1.0, 0.0] + z3,
             [0.0, 0.0, 1.0] + z3]
        return R, list(z3), S, [[0.0] * 6] * 3
    if t == TRANSLATIONAL:
        p = [q[qs], q[qs + 1], q[qs + 2]]
        S = [z3 + [1.0, 0.0, 0.0], z3 + [0.0, 1.0, 0.0],
             z3 + [0.0, 0.0, 1.0]]
        return eye, p, S, [[0.0] * 6] * 3
    if t == PLANAR:
        a0, a1, a2 = _npv(ax[0]), _npv(ax[1]), _npv(ax[2])
        u2, s, c, r2 = sincos(2, qs + 2)
        R = _rod_static_axis(u2, s, c)
        p = _vadd(_sc(a0, q[qs]), _sc(a1, q[qs + 1]))
        # S (batched.joint_S): s1 = [0, R^T a0], s2 = [0, R^T a1],
        # s3 = [a2, 0]
        r0 = _rot_static_vec(u2, a0, _neg(s), c)
        r1 = _rot_static_vec(u2, a1, _neg(s), c)
        r0d = _rot_static_vec_dot(u2, a0, _neg(s), c, _neg(r2))
        r1d = _rot_static_vec_dot(u2, a1, _neg(s), c, _neg(r2))
        return (R, p,
                [z3 + r0, z3 + r1, a2 + z3],
                [z3 + r0d, z3 + r1d, [0.0] * 6])
    if t == FREE:
        w = [q[qs], q[qs + 1], q[qs + 2]]
        p = [q[qs + 3], q[qs + 4], q[qs + 5]]
        R = _so3_exp_runtime(w)
        S = []
        for k in range(6):
            row = [0.0] * 6
            row[k] = 1.0
            S.append(row)
        return R, p, S, [[0.0] * 6] * 6
    raise NotImplementedError(t)


def _trace_env(st: _Static, dt: float, q, dq, tau):
    """The full dynamics phase for one env (all values are blocks or
    static floats).  Returns (dq_star[n], M[n][n], phi[n][6],
    R_w[nb]3x3, p_w[nb][3])."""
    nb, n = st.nb, st.n

    # ---- joint transforms + child-frame S rows -------------------------
    R_rel: List[Any] = [None] * nb
    p_rel: List[Any] = [None] * nb
    S: List[Any] = [None] * n          # child-frame rows (6 entries)
    Sd: List[Any] = [None] * n
    for b in range(nb):
        Rj, pj, Sj, Sdj = _joint_kin(st, b, q, dq)
        R1 = _m3m(st.pj_rot[b], Rj)
        p1 = _vadd(st.pj_pos[b], _m3v(st.pj_rot[b], pj))
        R_rel[b] = _m3m(R1, st.cji_rot[b])
        p_rel[b] = _vadd(p1, _m3v(R1, st.cji_pos[b]))
        for k in range(st.ndof[b]):
            d = st.q_start[b] + k
            S[d] = _ad_cj(st, b, Sj[k])
            Sd[d] = _ad_cj(st, b, Sdj[k])

    # ---- tree recursion (static unroll, static parents) ----------------
    g = st.gravity
    a_base = [0.0, 0.0, 0.0, -g[0], -g[1], -g[2]]
    R_w: List[Any] = [None] * nb
    p_w: List[Any] = [None] * nb
    v: List[Any] = [None] * nb
    a_bias: List[Any] = [None] * nb
    for b in range(nb):
        E = _m3t(R_rel[b])
        r = p_rel[b]
        vJ = [0.0] * 6
        cJ = [0.0] * 6
        for k in range(st.ndof[b]):
            d = st.q_start[b] + k
            vJ = _vadd(vJ, _sc(S[d], dq[d]))
            cJ = _vadd(cJ, _sc(Sd[d], dq[d]))
        par = st.parent[b]
        if par < 0:
            R_w[b] = R_rel[b]
            p_w[b] = r
            v[b] = vJ
            a_bias[b] = _vadd(_xmotion_apply(E, r, a_base),
                              _vadd(_crm(v[b], vJ), cJ))
        else:
            R_w[b] = _m3m(R_w[par], R_rel[b])
            p_w[b] = _vadd(p_w[par], _m3v(R_w[par], r))
            v[b] = _vadd(_xmotion_apply(E, r, v[par]), vJ)
            a_bias[b] = _vadd(_xmotion_apply(E, r, a_bias[par]),
                              _vadd(_crm(v[b], vJ), cJ))

    # ---- world-frame dof columns at the world origin -------------------
    phi: List[Any] = [None] * n
    for d in range(n):
        b = st.dof_body[d]
        w = _m3v(R_w[b], S[d][:3])
        vl = _vadd(_m3v(R_w[b], S[d][3:]), _cross(p_w[b], w))
        phi[d] = w + vl

    # ---- mass matrix: M[i,j] = sum_b phi_i . (I_w(b) phi_j) ------------
    # I_w(b) about the world origin, built structurally from the world COM
    # d_b = p_w + R_w c and Ic_w = R_w Ic R_w^T:
    #   I_w phi = [Ic_w w + m d x u ; m u],  u = v - d x w
    # (identical operator to batched.mass_matrix's X^T I X assembly).
    M = [[0.0] * n for _ in range(n)]
    f_grav_acc: List[Any] = [None] * nb
    for b in range(nb):
        m_b = st.mass[b]
        d_w = _vadd(p_w[b], _m3v(R_w[b], st.com[b]))
        IcR = _m3m(R_w[b], st.inertia[b])
        Ic_w = _m3m(IcR, _m3t(R_w[b]))
        dofs = st.body_dofs[b]
        F = {}
        for j in dofs:
            wj, vj = phi[j][:3], phi[j][3:]
            u = _vsub(vj, _cross(d_w, wj))
            Fang = _vadd(_m3v(Ic_w, wj), _sc(_cross(d_w, u), m_b))
            Flin = _sc(u, m_b)
            F[j] = Fang + Flin
        for ji, j in enumerate(dofs):
            for i in dofs[: ji + 1]:
                M[i][j] = _add(M[i][j], _dot(phi[i], F[j]))

    # ---- bias forces ----------------------------------------------------
    # body-frame Newton-Euler f = I_b a_bias + v x* (I_b v), then to world
    # via the inverse force transform, accumulated leaf -> root; then
    # C[i] = phi_i . f_subtree(body_i)  (== J^T f of batched.bias_forces).
    f_w: List[Any] = [None] * nb

    def _I_mul(b, v6):
        # body-frame spatial inertia times motion vector (structural):
        # [Ic w - m c x (c x w) + m c x v ; m v - m c x w]
        m_b, c = st.mass[b], st.com[b]
        w, vl = v6[:3], v6[3:]
        Icw = _m3v(st.inertia[b], w)
        cxw = _cross(c, w)
        top = _vadd(Icw,
                    _sc(_cross(c, _vsub(vl, cxw)), m_b))
        bot = _sc(_vsub(vl, cxw), m_b)
        return top + bot

    for b in range(nb):
        f_body = _vadd(_I_mul(b, a_bias[b]), _crf(v[b], _I_mul(b, v[b])))
        # inverse force transform with (E = R_w^T, r = p_w):
        # fP = R_w f_l ; nP = R_w n + p_w x fP
        fl = _m3v(R_w[b], f_body[3:])
        nl = _vadd(_m3v(R_w[b], f_body[:3]), _cross(p_w[b], fl))
        f_w[b] = nl + fl
    f_sub = [None] * nb
    for b in range(nb - 1, -1, -1):
        acc = f_w[b]
        for ch in st.children[b]:
            acc = _vadd(acc, f_sub[ch])
        f_sub[b] = acc
    C = [0.0] * n
    for d in range(n):
        C[d] = _dot(phi[d], f_sub[st.dof_body[d]])

    # ---- implicit-scheme forward dynamics ------------------------------
    # tau_total = tau - d dq - k (q - rest + dt dq) - C;
    # (M + diag(dt d + dt^2 k)) ddq = tau_total   (batched.forward_dynamics)
    rhs = [None] * n
    Mi = [[M[min(i, j)][max(i, j)] for j in range(n)] for i in range(n)]
    for d in range(n):
        # fold-safe forms (no `!= 0.0` guards): damping/spring may be
        # per-env BLOCKS under domain randomization; static zeros still
        # vanish through _mul/_add folding exactly as before
        t_d = _sub(tau[d], C[d])
        t_d = _sub(t_d, _mul(st.damping[d], dq[d]))
        t_d = _sub(t_d, _mul(st.spring[d],
                             _add(_sub(q[d], st.rest[d]),
                                  _mul(dt, dq[d]))))
        rhs[d] = t_d
        Mi[d][d] = _add(Mi[d][d],
                        _add(_mul(dt, st.damping[d]),
                             _mul(dt * dt, st.spring[d])))

    ddq = _chol_solve_env(Mi, rhs, n, eps=1e-10)
    dq_star = [_add(dq[d], _mul(dt, ddq[d])) for d in range(n)]
    return dq_star, M, phi, R_w, p_w


def _chol_solve_env(A, b, n, eps):
    """Unrolled Cholesky + substitution over scalar blocks — the same
    recurrence (and eps / max(s, 1e-30) guards) as math/linalg.chol."""
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
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = _sub(s, _mul(L[i][k], y[k]))
        y[i] = s / L[i][i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = _sub(s, _mul(L[k][i], x[k]))
        x[i] = s / L[i][i]
    return x


# ---------------------------------------------------------------------------
# the kernel + pallas_call wrapper
# ---------------------------------------------------------------------------

def _blk(x, dtype):
    """Materialize a scalar-or-block value as an (8, 128) block.

    Constant folding can also leave 0-d jnp arrays (e.g. jnp.maximum of
    two static floats in a flat-snake contact row) — broadcast those
    too, or the kernel ref write rejects the () shape."""
    if _st(x):
        return jnp.full((SUB, LANE), x, dtype=dtype)
    if getattr(x, "ndim", 2) == 0:
        return jnp.broadcast_to(jnp.asarray(x, dtype), (SUB, LANE))
    return x


def _read_dr_refs(st, dr_fields, dr_refs):
    """field -> flat block list, from the extra kernel input refs."""
    dr = {}
    for f, ref in zip(dr_fields, dr_refs):
        k = _DR_SPEC[f][1](st if isinstance(st, _Static) else st.dyn)
        dr[f] = [ref[0, i] for i in range(k)]
    return dr


def _dyn_kernel(q_ref, dq_ref, tau_ref, *refs, st: _Static, dt: float,
                dr_fields: Tuple[str, ...] = ()):
    n, nb = st.n, st.nb
    dtype = q_ref.dtype
    n_dr = len(dr_fields)
    dr_refs, (dqs_ref, M_ref, phi_ref, Rw_ref, pw_ref) = \
        refs[:n_dr], refs[n_dr:]
    if dr_fields:
        st = _apply_dr(st, _read_dr_refs(st, dr_fields, dr_refs))
    q = [q_ref[0, d] for d in range(n)]
    dq = [dq_ref[0, d] for d in range(n)]
    tau = [tau_ref[0, d] for d in range(n)]
    dq_star, M, phi, R_w, p_w = _trace_env(st, dt, q, dq, tau)
    for d in range(n):
        dqs_ref[0, d] = _blk(dq_star[d], dtype)
    for i in range(n):
        for j in range(n):
            # full symmetric write (upper entries computed; mirror lower)
            M_ref[0, i * n + j] = _blk(M[min(i, j)][max(i, j)], dtype)
    for d in range(n):
        for k in range(6):
            phi_ref[0, d * 6 + k] = _blk(phi[d][k], dtype)
    for b in range(nb):
        for i in range(3):
            for j in range(3):
                Rw_ref[0, b * 9 + i * 3 + j] = _blk(R_w[b][i][j], dtype)
        for i in range(3):
            pw_ref[0, b * 3 + i] = _blk(p_w[b][i], dtype)


def dynamics_pallas(model: SkelModel, q, dq, tau, interpret: bool = False,
                    st: Optional["_Static"] = None,
                    dr_fields: Tuple[str, ...] = (), dr_vals=()):
    """Batched fused dynamics phase.  q/dq/tau: (B, n) f32.

    Returns (dq_star (B, n), M (B, n, n), phi (B, n, 6),
    R_w (B, nb, 3, 3), p_w (B, nb, 3)) — the exact boundary quantities of
    the XLA phase in engine/world.make_sim_step.

    `st` must be prebuilt (outside any trace) when calling from traced
    code: _Static reads the model arrays host-side, which is illegal on
    tracers (make_dynamics_phase builds it at construction time).

    dr_fields / dr_vals: domain-randomized leaves as per-env runtime
    inputs — dr_vals[i] is a (B,) + leaf.shape array for DR_FIELDS_DYN
    member dr_fields[i]; each is flattened to (B, k) and fed to the
    kernel as one more lane-major block input.
    """
    if st is None:
        st = _Static(model)
    n, nb = st.n, st.nb
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

    qb, dqb, taub = to_blocks(q), to_blocks(dq), to_blocks(tau)
    drb = [to_blocks(jnp.asarray(v, dtype).reshape(B, -1))
           for v in dr_vals]

    def spec(k):
        return pl.BlockSpec((1, k, SUB, LANE), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                            memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((G, n, SUB, LANE), dtype),        # dq_star
        jax.ShapeDtypeStruct((G, n * n, SUB, LANE), dtype),    # M
        jax.ShapeDtypeStruct((G, n * 6, SUB, LANE), dtype),    # phi
        jax.ShapeDtypeStruct((G, nb * 9, SUB, LANE), dtype),   # R_w
        jax.ShapeDtypeStruct((G, nb * 3, SUB, LANE), dtype),   # p_w
    ]
    kernel = functools.partial(_dyn_kernel, st=st, dt=float(model.dt),
                               dr_fields=tuple(dr_fields))
    kernel = _x64_safe_kernel(kernel, dtype)
    dqs, M, phi, Rw, pw = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec(n)] * 3 + [spec(b.shape[1]) for b in drb],
        out_specs=tuple(spec(s.shape[1]) for s in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(qb, dqb, taub, *drb)

    def from_blocks(y, shape):
        flat = jnp.transpose(y, (0, 2, 3, 1)).reshape(Bp, y.shape[1])
        return flat[:B].reshape((B,) + shape)

    return (from_blocks(dqs, (n,)), from_blocks(M, (n, n)),
            from_blocks(phi, (n, 6)), from_blocks(Rw, (nb, 3, 3)),
            from_blocks(pw, (nb, 3)))




# ---------------------------------------------------------------------------
# engine integration: custom_vmap redirect (pattern of lcp/pallas_pgs)
# ---------------------------------------------------------------------------

def make_dynamics_phase(model: SkelModel, dt: float,
                        dr_fields: Tuple[str, ...] = (),
                        interpret: bool = False):
    """(q, dq, tau, *dr_vals) -> (dq_star, M, phi, R_w, p_w) with TPU
    batch redirection.  Single-env / CPU / f64 calls run the exact
    dynamics/batched.py path; a vmapped f32 batch on TPU runs the fused
    Pallas kernel.  Returns None for unsupported models (caller keeps the
    XLA phase).

    dr_fields: domain-randomized leaves (subset of DR_FIELDS_DYN) passed
    as EXPLICIT per-env arguments after tau — `model` must then be the
    CONCRETE base model; its values for those fields are ignored
    (VERDICT r4 order #2: DR batches keep the kernel path)."""
    import os

    if not supported(model) or os.environ.get("DARTENV_NO_DYN_KERNEL"):
        # DARTENV_NO_DYN_KERNEL=1: ablation/debug escape hatch — keep the
        # inline XLA phase (scripts/profile_step.py uses it to attribute
        # the kernel's contribution)
        return None
    if any(isinstance(leaf, jax.core.Tracer)
           for leaf in jax.tree_util.tree_leaves(model)):
        # traced / per-env-batched model WITHOUT the explicit-dr route
        # (legacy callers): the kernel bakes model VALUES as static
        # constants, so it cannot serve this path — keep XLA.  DR callers
        # go through engine/world.make_dr_sim_step, which passes the
        # concrete base model plus dr_fields instead.
        return None
    dr_fields = tuple(dr_fields)
    if any(f not in DR_FIELDS_DYN for f in dr_fields):
        return None

    from dartenv_tpu.dynamics import batched
    from dartenv_tpu.lcp.pgs import _on_tpu

    # host-side read of the model arrays — must happen HERE, outside any
    # trace (make_sim_step runs at env-construction time)
    st = _Static(model)

    def _xla_single(q, dq, tau, *dr_vals):
        m = (model.replace(**dict(zip(dr_fields, dr_vals)))
             if dr_fields else model)
        kin = batched.bkin(m, q, dq)
        ddq, M = batched.forward_dynamics(m, kin, q, dq, tau, dt, None)
        return dq + dt * ddq, M, kin.phi, kin.R_w, kin.p_w

    @jax.custom_batching.custom_vmap
    def dyn(q, dq, tau, *dr_vals):
        return _xla_single(q, dq, tau, *dr_vals)

    @dyn.def_vmap
    def _batched_rule(axis_size, in_batched, *args):
        args = [
            a if bat else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, bat in zip(args, in_batched)
        ]
        q, dq, tau = args[:3]
        dr_vals = args[3:]
        if (interpret or _on_tpu()) and q.dtype == jnp.float32:
            out = dynamics_pallas(model, q, dq, tau, st=st,
                                  dr_fields=dr_fields, dr_vals=dr_vals,
                                  interpret=interpret)
        else:
            out = jax.vmap(_xla_single)(q, dq, tau, *dr_vals)
        return out, (True,) * 5

    return dyn
