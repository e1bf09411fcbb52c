"""Pallas TPU kernel: batched boxed-LCP block principal pivoting.

SURVEY.md §7's "hardest port": the reference's default contact solver is
ODE's Dantzig (`dart/external/odelcpsolver/lcp.cpp` †) — data-dependent
pivoting with dynamic index sets, hostile to fixed-shape SPMD.  The XLA
formulation (lcp/dantzig.py) expresses each pivot iteration as a masked
SPD solve, but for n > ~12 those lower to deep Schur-recursion graphs of
tiny ops whose serial dispatch latency dominates (measured: ~40 masked
solves halve walker2d B=4096 throughput when run for 1/64 of envs).

This kernel runs the SAME algorithm entirely in VMEM with the env batch
on the lane axis, like lcp/pallas_pgs.py:

  * the masked system solve is **lane-major Gaussian elimination**: for
    each pivot column k (static unroll), one fused (m-k, m, TB)
    multiply-subtract eliminates the column across the whole tile — m
    statements per factorization instead of a Schur graph, all VPU;
  * set transitions, friction bounds (static `findex`), the damped
    impulse source, and the PGS polish sweeps are (m, TB) elementwise
    ops, identical in structure to the XLA path (lcp/dantzig.py), so the
    two paths stay numerically comparable;
  * iteration structure mirrors dantzig_solve: `iters` damped pivots,
    then `max(iters // 3, 6)` undamped refinement pivots, then
    `polish_iters` PGS sweeps.

No pivoting is needed inside the elimination: the operator is SPD + cfm
regularization on the free block and exactly 1.0 on masked diagonal
entries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dartenv_tpu.dynamics.pallas_dynamics import _x64_safe_kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128  # envs per tile (lane width)

_FREE, _AT_LO, _AT_HI = 0, 1, 2


def _bpp_kernel(A_ref, b_ref, lo_ref, hi_ref, mu_ref, act_ref, lam0_ref,
                lam_ref, Am_ref, *, findex, iters: int, refine: int,
                polish: int):
    m = b_ref.shape[0]
    dtype = b_ref.dtype
    fidx = np.maximum(np.asarray(findex), 0)
    has_f = np.asarray(findex) >= 0
    big = jnp.asarray(1e20, dtype)

    A = A_ref[...]            # (m, m, TB)
    b = b_ref[...]            # (m, TB)
    act = act_ref[...]
    mu = mu_ref[...]

    def bounds(x):
        rows = [
            (jnp.maximum(lo_ref[i], -(mu[i] * jnp.abs(x[fidx[i]])))
             if has_f[i] else jnp.maximum(lo_ref[i], -big))
            for i in range(m)
        ]
        lo_i = jnp.stack(rows)
        rows = [
            (jnp.minimum(hi_ref[i], mu[i] * jnp.abs(x[fidx[i]]))
             if has_f[i] else jnp.minimum(hi_ref[i], big))
            for i in range(m)
        ]
        return lo_i, jnp.stack(rows)

    # static row-index masks for the elimination, built IN-kernel (Pallas
    # forbids closure-captured device constants)
    _row_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    _rows_gt = [( _row_idx > k).astype(dtype) for k in range(m)]
    _rows_lt = [( _row_idx < k).astype(dtype) for k in range(m)]
    _eye2 = (jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)).astype(dtype)

    def masked_solve(fmask, rhs):
        """Solve (A*f*f + diag(1-f)) x = rhs per lane via Gaussian
        elimination; fmask, rhs: (m, TB).

        Every update is a FULL (m, m, TB) fused multiply-add with a
        static row mask — shrinking `[k+1:, k:]` slices leave the
        sublane dimension unaligned and Mosaic relayouts every op
        (measured ~50x slower)."""
        Am_ref[...] = (A * fmask[:, None, :] * fmask[None, :, :]
                       + _eye2[:, :, None] * (1.0 - fmask)[None, :, :])
        r = rhs
        # forward elimination (static unroll over pivot columns); factors
        # for rows <= k are masked to zero so the full-slab update leaves
        # them unchanged
        for k in range(m):
            col = Am_ref[:, k]                       # (m, TB)
            f = (col / Am_ref[k, k][None, :]) * _rows_gt[k]
            Am_ref[...] = Am_ref[...] - f[:, None, :] * Am_ref[k][None]
            r = r - f * r[k][None, :]
        # back substitution, column-oriented: after solving x_i, subtract
        # its column contribution from every row above (static row mask)
        # — m full-width FMAs, no shrinking slices
        x = [None] * m
        racc = r
        for i in range(m - 1, -1, -1):
            xi = racc[i] / Am_ref[i, i]
            x[i] = xi
            if i:
                racc = racc - Am_ref[:, i] * xi[None, :] * _rows_lt[i]
        return jnp.stack(x)

    def pivot_body(x, xb, state):
        lo_i, hi_i = bounds(xb)
        free = jnp.logical_and(state == _FREE, act > 0.5)
        fmask = free.astype(dtype)
        x_fixed = jnp.where(state == _AT_LO, lo_i,
                            jnp.where(state == _AT_HI, hi_i, 0.0))
        x_fixed = x_fixed * act * (1.0 - fmask)
        Axf = jnp.sum(A * x_fixed[None, :, :], axis=1)      # (m, TB)
        rhs = -(b + Axf) * fmask
        x_free = masked_solve(fmask, rhs) * fmask
        x_new = x_free + x_fixed
        w = jnp.sum(A * x_new[None, :, :], axis=1) + b
        state = jnp.where(jnp.logical_and(free, x_new < lo_i - 1e-12),
                          _AT_LO, state)
        state = jnp.where(jnp.logical_and(free, x_new > hi_i + 1e-12),
                          _AT_HI, state)
        state = jnp.where(
            jnp.logical_and(state == _AT_LO, w < -1e-10), _FREE, state)
        state = jnp.where(
            jnp.logical_and(state == _AT_HI, w > 1e-10), _FREE, state)
        x_new = jnp.clip(x_new, lo_i, hi_i)
        return x_new, state

    def damped_iter(_, carry):
        x, xb, state = carry
        x, state = pivot_body(x, xb, state)
        xb = 0.5 * (xb + x)
        return (x, xb, state)

    def exact_iter(_, carry):
        x, _, state = carry
        x2, state = pivot_body(x, x, state)
        return (x2, x2, state)

    # ---- initial partition (mirrors dantzig_solve's warm start) --------
    x0 = lam0_ref[...]
    lo_w, hi_w = bounds(x0)
    x0 = jnp.clip(x0, lo_w, hi_w)
    at_lo = x0 <= lo_w + 1e-12
    at_hi = x0 >= hi_w - 1e-12
    state0 = jnp.where(at_hi, _AT_HI,
                       jnp.where(at_lo, _AT_LO, _FREE)).astype(jnp.int32)
    w0 = jnp.sum(A * x0[None, :, :], axis=1) + b
    state0 = jnp.where(
        jnp.logical_and(state0 == _AT_LO, w0 < 0.0), _FREE, state0)
    state0 = jnp.where(
        jnp.logical_and(state0 == _AT_HI, w0 > 0.0), _FREE, state0)

    x, xb, state = jax.lax.fori_loop(
        0, iters, damped_iter, (x0, x0, state0))
    x, xb, state = jax.lax.fori_loop(
        0, refine, exact_iter, (x, x, state))

    # ---- PGS polish (same row updates as pallas_pgs) -------------------
    if polish > 0:
        diag = jnp.stack([A_ref[i, i] for i in range(m)])
        inv_diag = jnp.where(diag > 1e-12,
                             1.0 / jnp.maximum(diag, 1e-12), 0.0)
        lam_ref[...] = x

        def sweep(_, carry):
            for i in range(m):
                lam = lam_ref[...]
                w_i = jnp.sum(A_ref[i] * lam, axis=0) + b_ref[i]
                new = lam_ref[i] - w_i * inv_diag[i]
                if has_f[i]:
                    bound = mu_ref[i] * jnp.abs(lam_ref[fidx[i]])
                    lo_i = jnp.maximum(lo_ref[i], -bound)
                    hi_i = jnp.minimum(hi_ref[i], bound)
                else:
                    lo_i = lo_ref[i]
                    hi_i = hi_ref[i]
                lam_ref[i] = jnp.clip(new, lo_i, hi_i) * act_ref[i]
            return carry

        jax.lax.fori_loop(0, polish, sweep, 0)
    else:
        lam_ref[...] = x * act


def bpp_solve_pallas(A, b, lo, hi, findex, mu, active, iters: int = 24,
                     polish_iters: int = 10, lam0=None,
                     interpret: bool = False, refine_iters=None):
    """Batched exact boxed-LCP solve.  A: (B, m, m); b/lo/hi/mu/active:
    (B, m); findex static numpy (m,).  Returns lam (B, m).

    Same contract and iteration structure as lcp.dantzig.dantzig_solve,
    solved entirely in one Pallas kernel per TB-env tile.
    """
    B, m = b.shape
    dtype = A.dtype
    if m == 0:
        return jnp.zeros((B, 0), dtype=dtype)
    if lam0 is None:
        lam0 = jnp.zeros_like(b)
    Bp = ((B + TB - 1) // TB) * TB
    pad = Bp - B

    def to_lanes(x):
        if pad:
            x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        return jnp.moveaxis(x, 0, -1)

    A_t = to_lanes(A)
    args = [to_lanes(v) for v in (b, lo, hi, mu, active, lam0)]

    grid = (Bp // TB,)
    block3 = pl.BlockSpec((m, m, TB), lambda i: (np.int32(0), np.int32(0), i),
                          memory_space=pltpu.VMEM)
    block2 = pl.BlockSpec((m, TB), lambda i: (np.int32(0), i),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bpp_kernel, findex=np.asarray(findex), iters=iters,
        refine=(max(iters // 3, 6) if refine_iters is None
                else refine_iters),
        polish=polish_iters,
    )
    kernel = _x64_safe_kernel(kernel, dtype)
    lam_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block3] + [block2] * 6,
        out_specs=block2,
        out_shape=jax.ShapeDtypeStruct((m, Bp), dtype),
        scratch_shapes=[pltpu.VMEM((m, m, TB), dtype)],
        interpret=interpret,
    )(A_t, *args)
    lam = jnp.moveaxis(lam_t, -1, 0)
    return lam[:B] if pad else lam
