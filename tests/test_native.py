"""Cross-validation of the on-device solvers against the native C++ tier.

The C++ engine (native/{aba,lcp_dantzig}.cpp, loaded via ctypes) is an
independent implementation of the same published algorithms the reference's
native layer implements (DART Featherstone dynamics †, ODE dSolveLCP † —
SURVEY.md §2.4).  Agreement between the JAX f64 path and the C++ f64 path
is the strongest internal-consistency check available while /root/reference
is unmounted (SURVEY.md provenance warning).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


# ---------------------------------------------------------------------------
# LCP: C++ Dantzig vs JAX PGS / block-pivoting on random boxed problems
# ---------------------------------------------------------------------------

def _random_boxed_lcp(rng, m, friction=False):
    G = rng.standard_normal((m, max(m, 6)))
    A = G @ G.T + 0.5 * np.eye(m)
    b = rng.standard_normal(m)
    lo = np.zeros(m)
    hi = np.full(m, 1e20)
    findex = -np.ones(m, dtype=np.int32)
    mu = np.ones(m)
    if friction:
        # rows [3k] normal, [3k+1], [3k+2] friction coupled to it
        for k in range(m // 3):
            n_row = 3 * k
            for t in (1, 2):
                i = n_row + t
                findex[i] = n_row
                lo[i], hi[i] = -1e20, 1e20
                mu[i] = 0.8
    return A, b, lo, hi, findex, mu


def _comp_residual(A, b, x, lo, hi):
    w = A @ x + b
    res = 0.0
    for i in range(len(b)):
        at_lo = x[i] <= lo[i] + 1e-9
        at_hi = x[i] >= hi[i] - 1e-9
        if at_lo and at_hi:
            pass  # pinned row (lo == hi): any w is complementary
        elif at_lo:
            res = max(res, -w[i])
        elif at_hi:
            res = max(res, w[i])
        else:
            res = max(res, abs(w[i]))
        res = max(res, lo[i] - x[i], x[i] - hi[i])
    return res


@pytest.mark.parametrize("m", [1, 3, 8, 17])
def test_cpp_lcp_complementarity(m):
    rng = np.random.default_rng(0)
    for trial in range(20):
        A, b, lo, hi, findex, mu = _random_boxed_lcp(rng, m)
        x, w, bad = native.lcp_solve(A, b, lo, hi, findex, mu)
        assert bad == 0
        scale = max(1.0, np.abs(b).max())
        assert _comp_residual(A, b, x, lo, hi) < 1e-8 * scale
        np.testing.assert_allclose(w, A @ x + b, atol=1e-9 * scale)


@pytest.mark.parametrize("m", [4, 9, 16])
def test_cpp_lcp_matches_jax_pgs(m):
    """No-friction boxed LCP with SPD A has a unique solution: the C++
    Dantzig pivoting and the JAX PGS sweep must agree."""
    from dartenv_tpu.lcp.pgs import pgs_solve

    rng = np.random.default_rng(1)
    for trial in range(10):
        A, b, lo, hi, findex, mu = _random_boxed_lcp(rng, m)
        x_cpp, _, _ = native.lcp_solve(A, b, lo, hi, findex, mu)
        x_jax = pgs_solve(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi),
            findex, jnp.asarray(mu), jnp.ones(m), iters=600,
        )
        np.testing.assert_allclose(
            np.asarray(x_jax), x_cpp, atol=2e-5, rtol=2e-5
        )


@pytest.mark.parametrize("m", [6, 9])
def test_cpp_lcp_matches_jax_dantzig_friction(m):
    """Contact-style problems with findex coupling: both solvers must reach
    a complementarity point; with the same friction-bound fixed point they
    agree to solver tolerance."""
    from dartenv_tpu.lcp.dantzig import dantzig_solve

    rng = np.random.default_rng(2)
    agree = 0
    for trial in range(12):
        A, b, lo, hi, findex, mu = _random_boxed_lcp(rng, m, friction=True)
        x_cpp, _, bad = native.lcp_solve(A, b, lo, hi, findex, mu)
        assert bad == 0
        x_jax = np.asarray(dantzig_solve(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi),
            findex, jnp.asarray(mu), jnp.ones(m), iters=25, polish_iters=60,
        ))
        # both are complementarity points of their own friction fixed point
        fb_lo, fb_hi = lo.copy(), hi.copy()
        for i in range(m):
            if findex[i] >= 0:
                bound = mu[i] * abs(x_jax[findex[i]])
                fb_lo[i], fb_hi[i] = max(lo[i], -bound), min(hi[i], bound)
        assert _comp_residual(A, b, x_jax, fb_lo, fb_hi) < 5e-4
        if np.allclose(x_jax, x_cpp, atol=1e-4, rtol=1e-3):
            agree += 1
    # friction LCPs can have multiple solutions; most should still agree
    assert agree >= 8


# ---------------------------------------------------------------------------
# ABA: C++ Featherstone vs JAX on every joint-type path and on real assets
# ---------------------------------------------------------------------------

def _cross_check_aba(model, seed, dt=0.002, atol=1e-8):
    from dartenv_tpu.dynamics.algorithms import aba, fk

    rng = np.random.default_rng(seed)
    n = model.n
    q = rng.uniform(-0.7, 0.7, n)
    dq = rng.uniform(-2.0, 2.0, n)
    tau = rng.uniform(-5.0, 5.0, n)
    kin = fk(model, jnp.asarray(q), jnp.asarray(dq))
    ddq_jax = np.asarray(
        aba(model, kin, jnp.asarray(q), jnp.asarray(dq), jnp.asarray(tau),
            dt)
    )
    ddq_cpp = native.aba(model, q, dq, tau, dt)
    scale = max(1.0, np.abs(ddq_cpp).max())
    np.testing.assert_allclose(ddq_jax, ddq_cpp, atol=atol * scale,
                               rtol=1e-7)


def test_aba_chain_all_joint_types():
    from test_dynamics import chain_3d_model

    model = chain_3d_model(dtype=jnp.float64)
    for seed in range(5):
        _cross_check_aba(model, seed)


def test_aba_with_damping_and_springs():
    import dataclasses

    from test_dynamics import double_pendulum_model

    model = double_pendulum_model(dtype=jnp.float64)
    model = dataclasses.replace(
        model,
        damping=jnp.asarray([0.5, 1.2]),
        spring_stiff=jnp.asarray([3.0, 0.7]),
        rest_pos=jnp.asarray([0.2, -0.1]),
    )
    for seed in range(3):
        _cross_check_aba(model, seed, dt=0.01)


@pytest.mark.parametrize("asset", ["walker2d.skel", "hopper_capsule.skel",
                                   "kima_humanwalker.skel"])
def test_aba_on_env_assets(asset):
    from dartenv_tpu.model.skel_parser import asset_path, parse_skel

    world = parse_skel(asset_path(asset), dtype=jnp.float64)
    model = world.skeletons[-1]
    for seed in range(3):
        _cross_check_aba(model, seed)


def test_aba_external_forces():
    from test_dynamics import chain_3d_model
    from dartenv_tpu.dynamics.algorithms import aba, fk

    model = chain_3d_model(dtype=jnp.float64)
    rng = np.random.default_rng(7)
    n, nb = model.n, model.nb
    q = rng.uniform(-0.5, 0.5, n)
    dq = rng.uniform(-1.0, 1.0, n)
    tau = np.zeros(n)
    fext = rng.uniform(-10.0, 10.0, (nb, 6))
    kin = fk(model, jnp.asarray(q), jnp.asarray(dq))
    ddq_jax = np.asarray(
        aba(model, kin, jnp.asarray(q), jnp.asarray(dq), jnp.asarray(tau),
            0.002, f_ext_world=jnp.asarray(fext))
    )
    ddq_cpp = native.aba(model, q, dq, tau, 0.002, f_ext_world=fext)
    scale = max(1.0, np.abs(ddq_cpp).max())
    np.testing.assert_allclose(ddq_jax, ddq_cpp, atol=1e-8 * scale)
