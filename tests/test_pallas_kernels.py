"""Pallas kernel equivalence in interpret mode (CPU).

The two TPU kernels — lane-axis PGS (lcp/pallas_pgs.py) and the
block-principal-pivoting exact solver (lcp/pallas_bpp.py, SURVEY.md §7's
"batched dense boxed-LCP Dantzig in Pallas") — must match their XLA
reference formulations on the same problems.  `interpret=True` runs the
kernel logic on CPU so CI covers the kernels without a chip; the live
chip runs the compiled versions through the same call sites
(make_pgs_solver / make_exact_solver batch rules).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dartenv_tpu.lcp.dantzig import dantzig_solve
from dartenv_tpu.lcp.hybrid import comp_residual
from dartenv_tpu.lcp.pallas_bpp import bpp_solve_pallas
from dartenv_tpu.lcp.pallas_pgs import pgs_solve_pallas
from dartenv_tpu.lcp.pgs import pgs_solve


def _problems(B=8, nc=4, nl=5, seed=0):
    rng = np.random.default_rng(seed)
    m = 3 * nc + nl
    findex = -np.ones(m, dtype=np.int64)
    for s in range(nc):
        findex[3 * s + 1] = 3 * s
        findex[3 * s + 2] = 3 * s
    As, bs, los, his, mus, acts = [], [], [], [], [], []
    for _ in range(B):
        G = rng.normal(size=(m, m + 4))
        As.append(G @ G.T / (m + 4) + 1e-5 * np.eye(m))
        bs.append(rng.normal(size=m))
        lo = np.zeros(m)
        hi = np.full(m, 1e20)
        for s in range(nc):
            lo[3 * s + 1:3 * s + 3] = -1e20
        los.append(lo)
        his.append(hi)
        mu = np.zeros(m)
        for s in range(nc):
            mu[3 * s + 1:3 * s + 3] = 0.8
        mus.append(mu)
        acts.append((rng.uniform(size=m) > 0.2).astype(np.float64))
    f32 = lambda x: jnp.asarray(np.stack(x), jnp.float32)
    return (f32(As), f32(bs), f32(los), f32(his), f32(mus), f32(acts),
            findex)


def test_pallas_pgs_matches_xla_sweeps():
    A, b, lo, hi, mu, act, findex = _problems(seed=1)
    lam_ref = jax.vmap(
        lambda *a: pgs_solve(a[0], a[1], a[2], a[3], findex, a[4], a[5],
                             iters=20)
    )(A, b, lo, hi, mu, act)
    lam_pal = pgs_solve_pallas(A, b, lo, hi, findex, mu, act, iters=20,
                               interpret=True)
    # identical sweep order => near-bitwise agreement
    np.testing.assert_allclose(np.asarray(lam_pal), np.asarray(lam_ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_bpp_matches_xla_exact():
    A, b, lo, hi, mu, act, findex = _problems(seed=2)
    lam_ref = jax.vmap(
        lambda *a: dantzig_solve(a[0], a[1], a[2], a[3], findex, a[4],
                                 a[5])
    )(A, b, lo, hi, mu, act)
    lam_pal = bpp_solve_pallas(A, b, lo, hi, findex, mu, act,
                               interpret=True)
    r_ref = np.asarray(comp_residual(A, b, lam_ref, lo, hi, findex, mu,
                                     act))
    r_pal = np.asarray(comp_residual(A, b, lam_pal, lo, hi, findex, mu,
                                     act))
    # both are exact solvers: every problem at solver precision; impulses
    # may differ at friction-multiplicity points, so compare residuals
    assert r_pal.max() < 1e-4, f"pallas residuals {r_pal}"
    assert r_ref.max() < 1e-4
    np.testing.assert_allclose(np.asarray(lam_pal), np.asarray(lam_ref),
                               rtol=5e-3, atol=5e-3)


def test_pallas_bpp_warm_start_refinement():
    """Warm-started short-budget BPP (the escalation configuration)
    refines a PGS point to solver precision."""
    A, b, lo, hi, mu, act, findex = _problems(seed=3)
    lam_pgs = jax.vmap(
        lambda *a: pgs_solve(a[0], a[1], a[2], a[3], findex, a[4], a[5],
                             iters=10)
    )(A, b, lo, hi, mu, act)
    lam = bpp_solve_pallas(A, b, lo, hi, findex, mu, act, iters=8,
                           polish_iters=3, lam0=lam_pgs, interpret=True)
    r = np.asarray(comp_residual(A, b, lam, lo, hi, findex, mu, act))
    assert r.max() < 1e-4, f"refined residuals {r}"


def test_pallas_pgs_fused_residual_matches_metric():
    """The kernel's fused residual output equals the reference metric
    (lcp.hybrid.comp_residual) on the kernel's own solution."""
    from dartenv_tpu.lcp.hybrid import comp_residual

    A, b, lo, hi, mu, act, findex = _problems(seed=4)
    lam, res = pgs_solve_pallas(A, b, lo, hi, findex, mu, act, iters=10,
                                interpret=True, return_residual=True)
    res_ref = comp_residual(A, b, lam, lo, hi, findex, mu, act)
    np.testing.assert_allclose(np.asarray(res), np.asarray(res_ref),
                               rtol=1e-4, atol=1e-7)


def test_hybrid_escalate_kmax_caps_batch():
    """escalate_kmax bounds the escalation batch without breaking the
    solve: with kmax=2 on an 8-problem batch, results remain valid LCP
    points and the worst offenders still improve across repeated solves
    (the ranking-persistence property)."""
    from dartenv_tpu.lcp.hybrid import comp_residual, make_hybrid_solver

    A, b, lo, hi, mu, act, findex = _problems(seed=6)
    solver = make_hybrid_solver(findex, iters=3, escalate_frac=1.0,
                                escalate_tol=1e-6, escalate_iters=12,
                                escalate_kmax=2)
    lam0 = jnp.zeros_like(b)
    lam = jax.vmap(solver)(A, b, lo, hi, mu, act, lam0)
    r1 = np.asarray(comp_residual(A, b, lam, lo, hi, findex, mu, act))
    # second pass warm-started from the first: the next-worst offenders
    # get escalated now
    lam2 = jax.vmap(solver)(A, b, lo, hi, mu, act, lam)
    r2 = np.asarray(comp_residual(A, b, lam2, lo, hi, findex, mu, act))
    assert np.isfinite(np.asarray(lam2)).all()
    assert np.sort(r2)[-1] <= np.sort(r1)[-1] + 1e-7   # tail not worse
    assert (np.sort(r2)[:4] < 1e-4).all()              # escalated ones clean
